package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.TextAnalysis

/** Streaming exact deduplication: emit each content fingerprint's first
  * document, suppress every later arrival — the streaming face of
  * `Dedup.exact` (X1).
  *
  * State is one boolean per fingerprint, partitioned by the fingerprint key —
  * the same hash-distribution the batch groupBy uses, so a 1000-executor
  * cluster shards the seen-set naturally. Within a micro-batch the winner is
  * the minimum doc_id (deterministic under batch-internal reordering);
  * across batches the first batch wins. No timeout: the seen-set is
  * append-only by design (bound it operationally with watermark-scoped state
  * stores or periodic full refresh if fingerprint cardinality demands).
  */
object DedupStream {

  case class Doc(doc_id: Long, fingerprint: String)

  /** docs(doc_id, text) stream -> first-arrival (doc_id, fingerprint) rows. */
  def distinctDocs(docs: DataFrame): Dataset[Doc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long").as("doc_id"),
              TextAnalysis.fingerprint(col("text")).as("fingerprint"))
      .as[Doc]
      .groupByKey(_.fingerprint)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        keepFirst)
  }

  private[streaming] def keepFirst(
      fp: String,
      rows: Iterator[Doc],
      state: GroupState[Boolean]): Iterator[Doc] = {
    if (state.exists) Iterator.empty
    else {
      state.update(true)
      Iterator(rows.minBy(_.doc_id))
    }
  }
}
