package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Checksum-bucket ("Merkle") table comparison: find WHERE two versions of
  * a huge table differ without ever joining them row-for-row.
  *
  * Each side collapses to one row per key bucket — row count plus an
  * order-independent checksum (sum of a 32-bit md5 prefix per row; commutes
  * with any partitioning, so the aggregate is combine-enabled and the
  * exchange is bucket-count-sized). Comparing two 100 TB tables then costs
  * two columnar scans and a KB-scale join of bucket summaries; only the
  * buckets that differ need row-level reconciliation (the anti-entropy
  * pattern from Dynamo-style replica repair, applied to lake tables).
  *
  * The checksum is md5-based and engine-exact, so an external system (or
  * the DuckDB oracle) computes the identical bucket digests.
  */
object TableDiff {

  /** Per-bucket (count, checksum) summary. `hashCols` must stringify
    * identically on any engine (avoid raw floats; cast/floor upstream).
    */
  def bucketChecksums(df: DataFrame, bucketCol: String, nBuckets: Int,
                      hashCols: Seq[String]): DataFrame =
    df.withColumn("_bkt", pmod(col(bucketCol), lit(nBuckets)).cast("long"))
      .withColumn("_h",
        conv(substring(md5(concat_ws("|",
          hashCols.map(c => coalesce(col(c).cast("string"), lit(""))): _*)),
          1, 8), 16, 10).cast("long"))
      .groupBy(col("_bkt"))
      .agg(count(lit(1)).as("n_rows"), sum(col("_h")).as("checksum"))

  /** Full-outer compare of two bucket summaries: every bucket that is not
    * bit-identical, tagged with why. `match` buckets are dropped — at scale
    * that is almost all of them, and the survivors ARE the sync plan.
    */
  def merkleDiff(v1: DataFrame, v2: DataFrame, bucketCol: String,
                 nBuckets: Int, hashCols: Seq[String]): DataFrame = {
    val a = bucketChecksums(v1, bucketCol, nBuckets, hashCols)
      .withColumnRenamed("n_rows", "n_rows_v1")
      .withColumnRenamed("checksum", "_ck1")
    val b = bucketChecksums(v2, bucketCol, nBuckets, hashCols)
      .withColumnRenamed("n_rows", "n_rows_v2")
      .withColumnRenamed("checksum", "_ck2")
    a.join(b, Seq("_bkt"), "full_outer")
      .filter(!(col("_ck1") <=> col("_ck2")))
      .select(col("_bkt").as("bucket"),
              coalesce(col("n_rows_v1"), lit(0L)).as("n_rows_v1"),
              coalesce(col("n_rows_v2"), lit(0L)).as("n_rows_v2"),
              when(col("_ck1").isNull, lit("only_v2"))
                .when(col("_ck2").isNull, lit("only_v1"))
                .otherwise(lit("differs")).as("status"))
  }
}
