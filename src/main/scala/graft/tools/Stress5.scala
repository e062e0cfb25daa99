// scratch scaling-slope probe (not part of the library)
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ScdConfig
import graft.operators.{Compaction, Ivm, JoinPlanner, Scd2, Sketches, TextAnalysis}
import graft.sources.Tables

/** Scaling slopes for the round-5 operator families (same k×-key-shifted
  * methodology as [[Stress]]): join pre-flight, CMS build, BPE tokenizer
  * application, compaction planning, IVM delta joins, duration-weighted
  * history.
  *
  * Usage: runMain graft.tools.Stress5 [sfDir] [k]
  */
object Stress5 {
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
      println(f"[stress5] $label%-28s $s%7.2f s")
      s
    }

    def copies(df: DataFrame, keyCol: String, idCol: String, shift: Long): DataFrame =
      (0 until k).map { i =>
        df.withColumn(keyCol, col(keyCol) + lit(i * shift))
          .withColumn(idCol, col(idCol) + lit(i * shift))
      }.reduce(_ unionByName _)

    val ev1 = Tables.events(spark, sfDir).localCheckpoint()
    val evK = copies(ev1, "user_id", "event_id", 1000000L).localCheckpoint()
    val or1 = Tables.spread(spark, Tables.read(spark, sfDir, "orders"))
      .localCheckpoint()
    val orK = copies(or1, "o_custkey", "o_orderkey", 1000000L).localCheckpoint()
    val d1 = Tables.spread(spark, Tables.read(spark, sfDir, "documents"))
      .localCheckpoint()
    val dK = copies(d1, "doc_id", "doc_id", 1000000L).localCheckpoint()

    time("warmup preflight 1x")(
      JoinPlanner.preflight(ev1.select("user_id"),
                            or1.select(col("o_custkey").as("user_id")),
                            "user_id", "user_id"))

    def slope(label: String, r1: Double, rK: Double): Unit =
      println(f"[stress5] SLOPE $label%-22s ${rK / r1 / k}%5.2f (1.0 = linear)")

    val p1 = time("preflight 1x")(
      JoinPlanner.preflight(ev1.select("user_id"),
                            or1.select(col("o_custkey").as("user_id")),
                            "user_id", "user_id"))
    val pK = time(s"preflight ${k}x")(
      JoinPlanner.preflight(evK.select("user_id"),
                            orK.select(col("o_custkey").as("user_id")),
                            "user_id", "user_id"))
    slope("preflight", p1, pK)

    val c1 = time("cms heavy 1x")(Sketches.heavyHitters(ev1, "user_id", 20))
    val cK = time(s"cms heavy ${k}x")(Sketches.heavyHitters(evK, "user_id", 20))
    slope("cms_heavy", c1, cK)

    val merges = Seq("t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n",
                     "e" -> "r", "o" -> "n", "r" -> "e", "in" -> "g")
    val b1 = time("bpe apply 1x")(
      TextAnalysis.bpeCompressionStats(d1, "text", "lang", merges))
    val bK = time(s"bpe apply ${k}x")(
      TextAnalysis.bpeCompressionStats(dK, "text", "lang", merges))
    slope("bpe_apply", b1, bK)

    val bp1 = time("bpe pairs 1x")(TextAnalysis.bpePairCounts(d1, "text", 30))
    val bpK = time(s"bpe pairs ${k}x")(TextAnalysis.bpePairCounts(dK, "text", 30))
    slope("bpe_pairs", bp1, bpK)

    def inv(ev: DataFrame) = ev
      .groupBy(col("event_type").as("part"),
               date_trunc("DAY", col("ts")).as("file"))
      .agg((sum(length(col("props"))) + count(lit(1)) * lit(16L)).as("bytes"))
    val cp1 = time("compaction plan 1x")(
      Compaction.plan(inv(ev1), "part", "file", "bytes", "file", 65536L))
    val cpK = time(s"compaction plan ${k}x")(
      Compaction.plan(inv(evK), "part", "file", "bytes", "file", 65536L))
    slope("compaction", cp1, cpK)

    def li(spark: SparkSession) = Tables.spread(spark,
      Tables.read(spark, sfDir, "lineitem"))
    val l1 = li(spark).withColumnRenamed("l_orderkey", "o_orderkey")
      .localCheckpoint()
    val lK = copies(l1, "o_orderkey", "l_partkey", 1000000L).localCheckpoint()
    def ivmBatches(o: DataFrame, l: DataFrame) = (0 to 2).map(i =>
      (o.filter(col("o_orderkey") % 3 === i),
       l.filter(col("l_linenumber") % 3 === i)))
    val v1 = time("ivm 3 rounds 1x")(
      Ivm.maintain(ivmBatches(or1, l1), Seq("o_orderkey"))
        .groupBy("o_orderpriority", "l_returnflag").count())
    val vK = time(s"ivm 3 rounds ${k}x")(
      Ivm.maintain(ivmBatches(orK, lK), Seq("o_orderkey"))
        .groupBy("o_orderpriority", "l_returnflag").count())
    slope("ivm", v1, vK)

    val evCfg = ScdConfig(uniqueKey = Seq("user_id"), updatedAtCol = "ts",
                          changeExclude = Seq("event_id"))
    def twa(ev: DataFrame) = Scd2.durationWeighted(
      Scd2.initialLoad(ev, evCfg), evCfg, floor(col("value") * 1000),
      ev.agg(max(col("ts")).as("_horizon")))
    val t1 = time("history twa 1x")(twa(ev1))
    val tK = time(s"history twa ${k}x")(twa(evK))
    slope("history_twa", t1, tK)

    spark.stop()
  }
}
