package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Graph, Intervals}
import graft.sources.Tables

/** Round-6b scaling probe: key-shifted k× copies of the base tables (key
  * cardinality grows with volume — the honest scale-up, no artificial key
  * collisions), 1× vs k× wall-clock per operator, slope 1.0 = linear.
  * Usage: runMain graft.tools.Stress6b [sfDir] [k]
  */
object Stress6b {
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
      println(f"[stress6b] $label%-28s $s%7.2f s")
      s
    }
    def slope(label: String, r1: Double, rK: Double): Unit =
      println(f"[stress6b] SLOPE $label%-22s ${rK / r1 / k}%5.2f (1.0 = linear)")

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

    def prank(li: DataFrame) = {
      val p = Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey")
      Graph.pagerank(
        p.unionAll(p.select(col("dst").as("src"), col("src").as("dst"))),
        iters = 3)
    }
    time("warmup pagerank 1x")(prank(li1))
    val p1 = time("pagerank 1x")(prank(li1))
    val pK = time(s"pagerank ${k}x")(prank(liK))
    slope("pagerank", p1, pK)

    def band(ev: DataFrame) = Intervals.pointBandSelfJoin(
      ev.filter(col("event_type") === "purchase"),
      Seq("user_id"), "event_id", "ts", 600000000L)
    val b1 = time("bandjoin 1x")(band(ev1))
    val bK = time(s"bandjoin ${k}x")(band(evK))
    slope("bandjoin", b1, bK)

    def lanes(li: DataFrame, or: DataFrame) =
      li.join(or.select(col("o_orderkey"), col("o_custkey")),
              col("l_orderkey") === col("o_orderkey"))
        .groupBy((col("o_custkey") % 25).as("lane"),
                 year(col("l_shipdate")).as("y"))
        .agg(count(lit(1)).as("n"),
             sum(expr("CAST(floor(l_extendedprice * 100) AS BIGINT)"))
               .as("cents"))
    val f1 = time("factjoin 1x")(lanes(li1, or1))
    val fK = time(s"factjoin ${k}x")(lanes(liK, orK))
    slope("factjoin", f1, fK)

    spark.stop()
  }
}
