package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated testdata tables (`/root/repo/TESTDATA.md`). */
object Tables {

  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The testdata files are single-row-group parquet, which Spark cannot
    * split: every scan is one partition, so CPU-heavy NARROW transforms
    * (regex tokenization, shingling, hashing) run on one core. Round-robin
    * the rows across the session's parallelism when the scan under-splits.
    * Apply this ONLY where expensive narrow work follows the scan — an
    * operator whose first step is a hash shuffle (SCD windows, pair joins)
    * gets repartitioned by Spark anyway, and a prepended round-robin
    * exchange is pure overhead. On a real multi-file/multi-row-group lake
    * layout `rdd.getNumPartitions` already exceeds the threshold and this
    * is a no-op — the production plan keeps its shuffle-free scan.
    */
  def spread(spark: SparkSession, df: DataFrame): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    // Partition count from the FILE layout, not df.rdd.getNumPartitions:
    // the rdd conversion forces a full plan translation per call — pure
    // driver-side work, but it runs inside timed query bodies. The scan's
    // split count is (file size / maxPartitionBytes) rounded up per file,
    // which the input file listing gives directly.
    val maxSplit =
      org.apache.spark.sql.internal.SQLConf.get.filesMaxPartitionBytes
    val files = df.inputFiles
    val est =
      if (files.isEmpty) target // not file-backed: leave the plan alone
      else {
        val fs = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(files.head),
          spark.sparkContext.hadoopConfiguration)
        files.map { f =>
          val len = fs.getFileStatus(new org.apache.hadoop.fs.Path(f)).getLen
          ((len + maxSplit - 1) / maxSplit).toInt.max(1)
        }.sum
      }
    if (est * 2 <= target) df.repartition(target) else df
  }

  /** `events.parquet` has shipped in two encodings across driver testdata
    * generations, so sniff the decoded type instead of assuming one:
    *
    *  - INT64 TIMESTAMP(NANOS): Spark's parquet reader rejects it outright
    *    ([PARQUET_TYPE_ILLEGAL]); the documented escape hatch
    *    (`spark.sql.legacy.parquet.nanosAsLong`) surfaces it as LONG, which
    *    we floor to microseconds with integer arithmetic — `ts div 1000` —
    *    NOT double division (loses precision above 2^53). DuckDB floors
    *    ns->us identically when casting to TIMESTAMP.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): decodes as
    *    TIMESTAMP_NTZ; the session is pinned UTC, so casting to the
    *    session-zoned TIMESTAMP keeps every wall-clock value bit-identical
    *    while restoring the type the downstream operators (and the
    *    `CAST(ts AS TIMESTAMP)` oracle CTE) expect.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = read(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
}
