package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated testdata tables (`/root/repo/TESTDATA.md`). */
object Tables {

  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.parquet` carries INT64 TIMESTAMP(NANOS) which Spark's parquet
    * reader rejects outright ([PARQUET_TYPE_ILLEGAL]). Read it via the
    * documented escape hatch (`spark.sql.legacy.parquet.nanosAsLong`) and
    * floor to microseconds with integer arithmetic — `ts div 1000` — NOT
    * double division, which loses precision above 2^53. DuckDB floors
    * ns->us identically when casting to TIMESTAMP, so oracle comparisons
    * agree exactly.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(spark, dir, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
}
