// scratch scaling-slope probe (not part of the library)
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{ScdConfig, ScdEngine, VersionedTable}

/** Round-8 stress: one decade up on the LAKEHOUSE path, which Stress9
  * did not cover — (a) the VersionedTable deletion-vector READ (base
  * snapshot anti-join DV key list, broadcast under 256 MB) at 1% key
  * coverage, against the plain snapshot read as the floor; (b) the
  * key-bucketed SCD2 incremental merge (1000 buckets) with a delta
  * confined to 10 buckets, against table size — the claim under test is
  * that incremental cost tracks BATCH size, not table size.
  *
  * Dimensions 6M / 20M / 60M rows, synthetic via `spark.range`.
  * Usage: runMain graft.tools.Stress10
  */
object Stress10 {

  private def time[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    println(f"STRESS10 $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def dim(n: Long): DataFrame = spark.range(n).select(
      col("id").as("event_id"),
      (col("id") % 997L).as("grp"),
      (col("id") * 7919L % 1000003L).as("val"),
      concat(lit("payload_"), col("id") % 1000L).as("tag"))

    val root = java.nio.file.Files.createTempDirectory("stress10").toString

    // --- (a) deletion-vector MOR read, 1% coverage ----------------------
    for (n <- Seq(6000000L, 20000000L, 60000000L)) {
      val t = s"$root/dv_$n"
      time(f"dv publish      n=$n") {
        VersionedTable.publish(spark, dim(n), t)
      }
      time(f"dv delete1pct   n=$n") {
        VersionedTable.publishDelete(
          spark, dim(n).filter(col("event_id") % 100L === 0L)
            .select(col("event_id")), t)
      }
      time(f"dv morRead      n=$n") { noop(VersionedTable.read(spark, t)) }
      time(f"dv baseRead     n=$n") {
        noop(VersionedTable.readVersion(spark, t, 1L))
      }
    }

    // --- (b) bucketed SCD2 incremental merge, delta in 10/1000 buckets --
    val cfg = ScdConfig(uniqueKey = Seq("event_id"), updatedAtCol = "ts")
    for (n <- Seq(6000000L, 20000000L, 60000000L)) {
      val t = s"$root/scd_$n"
      val base = dim(n)
        .withColumn("ts", lit("2025-01-01 00:00:00").cast("timestamp"))
      time(f"scd initial     n=$n") {
        ScdEngine.run(spark, base, t, cfg, numBuckets = Some(1000))
      }
      // delta: keys confined to buckets 0-9 (the engine's own hash), one
      // in ~100 of those -> ~n/10000 changed rows in 10/1000 buckets
      val delta = dim(n)
        .filter(ScdEngine.bucketOf(Seq("event_id"), 1000) < 10 &&
                col("event_id") % 100L === 0L)
        .withColumn("val", col("val") + 1L)
        .withColumn("ts", lit("2025-02-01 00:00:00").cast("timestamp"))
        .localCheckpoint(false)
      println(s"STRESS10 scd deltaRows  n=$n rows=${delta.count()}")
      time(f"scd incremental n=$n") {
        ScdEngine.run(spark, delta, t, cfg, numBuckets = Some(1000))
      }
    }

    // cleanup
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(root))
    spark.stop()
  }
}
