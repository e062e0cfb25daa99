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
    if (df.rdd.getNumPartitions * 2 <= target) df.repartition(target) else df
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
