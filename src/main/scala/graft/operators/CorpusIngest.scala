package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.VersionedTable

/** Idempotent batched corpus ingestion: exact dedup against everything ever
  * ingested, published through the versioned snapshot layout — the batch
  * face of `streaming.DedupStream` and the ingest path a training corpus
  * actually runs.
  *
  * Within a batch the minimum doc_id per content fingerprint wins; against
  * the table an anti-join on the fingerprint drops re-ingested content, so
  * replaying a batch (pipeline retry, at-least-once upstream) never grows
  * the corpus. At 100 TB the anti-join is one shuffle on the md5 key, and
  * the rewrite-per-publish is the plain-Parquet price the SCD writer
  * already pays (VersionedTable makes it race-free + time-travelable).
  */
object CorpusIngest {

  /** Ingest `batch(doc_id, text)` into the corpus at `root`; returns the new
    * committed version. Table schema: (doc_id, text, fingerprint).
    */
  def ingest(spark: SparkSession, batch: DataFrame, root: String): Long = {
    val fp = batch
      .select(col("doc_id"), col("text"),
              TextAnalysis.fingerprint(col("text")).as("fingerprint"))
    val batchFirst = fp
      .withColumn("_rn",
                  row_number().over(
                    org.apache.spark.sql.expressions.Window
                      .partitionBy("fingerprint").orderBy("doc_id")))
      .filter(col("_rn") === 1).drop("_rn")
    val next = VersionedTable.latestVersion(spark, root) match {
      case None => batchFirst
      case Some(v) =>
        val existing = VersionedTable.readVersion(spark, root, v)
        existing.unionByName(
          batchFirst.join(existing.select("fingerprint"),
                          Seq("fingerprint"), "left_anti")
            .select(existing.columns.map(col).toSeq: _*))
    }
    VersionedTable.publish(spark, next, root)
  }
}
