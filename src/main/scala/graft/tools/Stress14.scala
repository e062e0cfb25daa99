// scratch decade-up probe (not part of the library)
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{ScdConfig, ScdEngine}

/** Round-12 stress: SCD bucketed-merge decade-up AFTER the manifest-routed
  * bucket listing (Stress13c follow-up, r11 verdict task 5).
  *
  * Stress13c measured the 100 M / 800-bucket local batch at 19.5 s vs
  * 3.0 s at 10 M / 80 — all metadata: (a) a full-table partition discovery
  * for the widens probe, (b) another for the pruned scan (discovery THEN
  * partition-filter), and (c) a third for run()'s post-run read-back.
  * The manifest removes (a) and (b) — every internal read now addresses
  * touched bucket directories by name — and `merge()` makes (c) the
  * caller's choice. This probe times, per decade:
  *   - initial load (unchanged cost: writes the whole history),
  *   - `merge()` local batch — the honest maintenance cost, expected
  *     ~flat per touched data across decades,
  *   - `run()` local batch — merge + full read-back, expected to carry
  *     the one remaining discovery,
  * at 10 M/80 and 100 M/800 with fixed 10k-row batches confined to
  * buckets 0..7 (the Stress13 shapes, verbatim).
  */
object Stress14 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stress14] $label%-46s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val base = "/tmp/stress14_scd"
    val cfg = ScdConfig(uniqueKey = Seq("id"), updatedAtCol = "updated_at")

    def history(h: Long): DataFrame =
      spark.range(h).select(col("id"),
        concat(lit("name"), pmod(col("id"), lit(97L))).as("name"),
        (col("id") % 1000L).as("v"),
        lit("2025-01-01 00:00:00").cast("timestamp").as("updated_at"))

    def localBatch(h: Long, n: Int, k: Long, stamp: String): DataFrame =
      spark.range(h)
        .filter(ScdEngine.bucketOf(Seq("id"), n) < lit(8))
        .limit(k.toInt)
        .select(col("id"),
          concat(lit("renamed"), col("id")).as("name"),
          (col("id") % 1000L + 1L).as("v"),
          lit(stamp).cast("timestamp").as("updated_at"))
        .localCheckpoint(false)

    for ((h, n) <- Seq((10000000L, 80), (100000000L, 800))) {
      val path = s"$base/h$h"
      new java.io.File(path).getParentFile.mkdirs()
      time(f"initial            h=$h buckets=$n") {
        ScdEngine.merge(spark, history(h), path, cfg, numBuckets = Some(n))
      }
      val lb1 = localBatch(h, n, 10000L, "2025-02-01 00:00:00"); lb1.count()
      time(f"merge local-batch  h=$h buckets=$n batch=10k") {
        ScdEngine.merge(spark, lb1, path, cfg, numBuckets = Some(n))
      }
      val lb2 = localBatch(h, n, 10000L, "2025-03-01 00:00:00"); lb2.count()
      time(f"run   local-batch  h=$h buckets=$n batch=10k (incl read-back)") {
        ScdEngine.run(spark, lb2, path, cfg, numBuckets = Some(n))
      }
    }
    spark.stop()
  }
}
