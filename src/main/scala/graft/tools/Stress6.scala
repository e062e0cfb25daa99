// scratch scaling-slope probe (not part of the library)
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Graph, Intervals, Layout, Profile, Segmentation, Sessionize, TableDiff}
import graft.sources.Tables

/** Scaling slopes for the round-6 operator families (same k×-key-shifted
  * methodology as [[Stress]]): triangle counting, sweep-line concurrency,
  * encoding-report run counting, sequence gaps, weighted median, RFM
  * segmentation, Merkle table diff.
  *
  * Key-shifted copies grow the GRAPH/KEY SPACE k×, which is what a bigger
  * corpus does — per-key structure is preserved, so a slope of ~1.0 means
  * cost tracks data size (no superlinear blowup), and the degree-ordered
  * triangle join must show it (the naive orientation would square).
  *
  * Usage: runMain graft.tools.Stress6 [sfDir] [k]
  */
object Stress6 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[stress6] $label%-28s $s%7.2f s")
      s
    }
    def slope(label: String, r1: Double, rK: Double): Unit =
      println(f"[stress6] SLOPE $label%-22s ${rK / r1 / k}%5.2f (1.0 = linear)")

    def copies(df: DataFrame, shifts: Map[String, Long]): DataFrame =
      (0 until k).map { i =>
        shifts.foldLeft(df) { case (d, (c, s)) =>
          d.withColumn(c, col(c) + lit(i * s))
        }
      }.reduce(_ unionByName _)

    val li1 = Tables.spread(spark, Tables.read(spark, sfDir, "lineitem"))
      .localCheckpoint()
    val liK = copies(li1, Map("l_orderkey" -> 100000000L,
                              "l_partkey" -> 10000000L)).localCheckpoint()
    val ev1 = Tables.events(spark, sfDir).localCheckpoint()
    val evK = copies(ev1, Map("user_id" -> 1000000L,
                              "event_id" -> 10000000L)).localCheckpoint()
    val or1 = Tables.spread(spark, Tables.read(spark, sfDir, "orders"))
      .localCheckpoint()
    val orK = copies(or1, Map("o_orderkey" -> 100000000L,
                              "o_custkey" -> 1000000L)).localCheckpoint()

    // warm codegen
    time("warmup triangles 1x")(
      Graph.triangleStats(Graph.coOccurrenceEdges(li1, "l_orderkey",
                                                  "l_partkey")))

    val t1 = time("triangles 1x")(
      Graph.triangleStats(Graph.coOccurrenceEdges(li1, "l_orderkey",
                                                  "l_partkey")))
    val tK = time(s"triangles ${k}x")(
      Graph.triangleStats(Graph.coOccurrenceEdges(liK, "l_orderkey",
                                                  "l_partkey")))
    slope("triangles", t1, tK)

    def conc(ev: DataFrame) = Intervals.concurrency(
      Sessionize.sessions(ev, "user_id", "ts", "event_type", 30),
      "session_start", "session_end")
    val c1 = time("concurrency 1x")(conc(ev1))
    val cK = time(s"concurrency ${k}x")(conc(evK))
    slope("concurrency", c1, cK)

    def enc(ev: DataFrame) = Layout.encodingReport(
      ev, "event_id", Seq("event_type", "user_id", "value"), 4096L)
    val e1 = time("encodingReport 1x")(enc(ev1))
    val eK = time(s"encodingReport ${k}x")(enc(evK))
    slope("encodingReport", e1, eK)

    def gaps(ev: DataFrame) = Intervals.sequenceGaps(
      ev.filter(col("event_type") === "click"), "event_id", 1024L)
    val g1 = time("sequenceGaps 1x")(gaps(ev1))
    val gK = time(s"sequenceGaps ${k}x")(gaps(evK))
    slope("sequenceGaps", g1, gK)

    def wmed(li: DataFrame) = Profile.weightedMedian(
      li.select(col("l_returnflag"),
                expr("CAST(floor(l_extendedprice * 100) AS BIGINT)")
                  .as("cents"),
                expr("CAST(floor(l_quantity * 1000000) AS BIGINT)").as("qm")),
      "l_returnflag", "cents", "qm")
    val w1 = time("weightedMedian 1x")(wmed(li1))
    val wK = time(s"weightedMedian ${k}x")(wmed(liK))
    slope("weightedMedian", w1, wK)

    def rfm(o: DataFrame) =
      Segmentation.rfm(o, "o_custkey", "o_orderdate", "o_totalprice")
    val r1 = time("rfm 1x")(rfm(or1))
    val rK = time(s"rfm ${k}x")(rfm(orK))
    slope("rfm", r1, rK)

    def mdiff(o: DataFrame) = {
      val v1 = o.withColumn("cents",
        expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
      val v2 = v1.filter(col("o_orderkey") % 97 =!= 0)
      TableDiff.merkleDiff(v1, v2, "o_orderkey", 256,
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "cents"))
    }
    val m1 = time("merkleDiff 1x")(mdiff(or1))
    val mK = time(s"merkleDiff ${k}x")(mdiff(orK))
    slope("merkleDiff", m1, mK)

    spark.stop()
  }
}
