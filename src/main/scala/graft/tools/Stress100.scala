// scratch scaling-slope probe, one decade above Stress (not part of the library)
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ScdConfig
import graft.operators.{Dedup, Profile, Scd2}
import graft.sources.Tables

/** ×100 scaling probe for the flagship pipelines (SCD2 merge, MinHash
  * family, cellRank): Stress proves slopes at sf0.1×10/×20; this pushes one
  * decade further (~10 M events / ~500 k docs from sf0.1) to confirm no
  * cliff appears when shuffle data finally exceeds comfortable memory.
  * Slope = t(k×) / t(1×) / k; ≤1.0 is linear-or-better.
  *
  * Usage: SPARK_DRIVER_MEM=48g sbt "runMain graft.tools.Stress100 [sfDir] [k]"
  */
object Stress100 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(100)
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
      println(f"[stress100] $label%-28s $s%8.2f s")
      s
    }

    /** k copies with shifted keys/ids — same per-key chain shape, k× keys.
      * Copies are built from a RANGE join against the checkpointed base (one
      * wide copy of the data, k expressed as a generator) instead of a
      * k-way union: a 100-branch union plan compiles slowly and re-reads the
      * base 100 times.
      */
    def copies(df: DataFrame, keyCol: String, idCol: String, shift: Long): DataFrame =
      df.crossJoin(spark.range(k).select(col("id").as("_copy")))
        .withColumn(keyCol, col(keyCol) + col("_copy") * lit(shift))
        .withColumn(idCol, col(idCol) + col("_copy") * lit(shift))
        .drop("_copy")

    val evCfg = ScdConfig(uniqueKey = Seq("user_id"), updatedAtCol = "ts",
                          changeExclude = Seq("event_id"))
    val ev1 = Tables.events(spark, sfDir).localCheckpoint()
    val evK = copies(ev1, "user_id", "event_id", 1000000L).localCheckpoint()
    println(s"[stress100] events 1x=${ev1.count()} ${k}x=${evK.count()}")

    // JIT/codegen warm
    time("warmup scd2 1x")(Scd2.initialLoad(ev1, evCfg))

    val i1 = time("scd2 initial 1x")(Scd2.initialLoad(ev1, evCfg))
    val iK = time(s"scd2 initial ${k}x")(Scd2.initialLoad(evK, evCfg))

    def half(df: DataFrame, rem: Int) = df.filter(col("event_id") % 2 === rem)
    val t1 = Scd2.initialLoad(half(ev1, 0), evCfg).localCheckpoint()
    val tK = Scd2.initialLoad(half(evK, 0), evCfg).localCheckpoint()
    val m1 = time("scd2 incremental 1x")(Scd2.incremental(t1, half(ev1, 1), evCfg))
    val mK = time(s"scd2 incremental ${k}x")(Scd2.incremental(tK, half(evK, 1), evCfg))
    tK.unpersist()

    val d1 = Tables.spread(spark, Tables.read(spark, sfDir, "documents"))
      .localCheckpoint()
    val dK = copies(d1, "doc_id", "doc_id", 1000000L).localCheckpoint()
    println(s"[stress100] docs 1x=${d1.count()} ${k}x=${dK.count()}")
    val x1 = time("minhash lsh pairs 1x")(
      Dedup.minhashLshPairs(d1, "doc_id", "text"))
    val xK = time(s"minhash lsh pairs ${k}x")(
      Dedup.minhashLshPairs(dK, "doc_id", "text"))

    val cp1 = time("cluster pairs 1x")(
      Dedup.clusterPairs(Dedup.minhashLshPairs(d1, "doc_id", "text")))
    val cpK = time(s"cluster pairs ${k}x")(
      Dedup.clusterPairs(Dedup.minhashLshPairs(dK, "doc_id", "text")))

    // cellRank via its three oracle-backed faces: winsorize bounds ride the
    // micro-cell rank selection (Profile.cellRank), never a whole-group sort
    val wz1 = time("winsorize/cellRank 1x")(
      Profile.winsorize(ev1.select(col("event_id"), col("event_type"),
        floor(col("value") * lit(1000000.0)).cast("long").as("vm")),
        "event_type", "vm", 5, 95))
    val wzK = time(s"winsorize/cellRank ${k}x")(
      Profile.winsorize(evK.select(col("event_id"), col("event_type"),
        floor(col("value") * lit(1000000.0)).cast("long").as("vm")),
        "event_type", "vm", 5, 95))

    println(f"[stress100] slopes at k=$k (1.0 = linear): " +
      f"scd2_initial ${iK / i1 / k}%.2f, scd2_incremental ${mK / m1 / k}%.2f, " +
      f"minhash ${xK / x1 / k}%.2f, clusters ${cpK / cp1 / k}%.2f, " +
      f"winsorize_cellrank ${wzK / wz1 / k}%.2f")
    spark.stop()
  }
}
