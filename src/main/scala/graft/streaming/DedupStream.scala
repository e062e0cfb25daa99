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
  * across batches the first batch wins. By default there is no timeout: the
  * seen-set is append-only. At corpus-lifetime fingerprint cardinalities
  * that state grows without bound, so [[distinctDocsTtl]] opts into
  * EVENT-TIME expiry — a fingerprint quiet for the TTL (in stream time, so
  * the behavior is replay-deterministic, unlike wall-clock timers) is
  * forgotten and its next arrival re-admitted: exact dedup within any TTL
  * window, at-most-once-per-window beyond it. Expired keys leave the store,
  * so state size tracks one window's distinct fingerprints, not history.
  */
object DedupStream {

  case class Doc(doc_id: Long, fingerprint: String)

  private[streaming] case class DocT(doc_id: Long, fingerprint: String,
                                     event_ts: java.sql.Timestamp)

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

  /** [[distinctDocs]] with bounded state: a fingerprint expires once the
    * watermark on `eventTimeCol` passes its last arrival + `ttl`. A key's
    * timer refreshes on every arrival, so content still flowing stays
    * deduplicated; only fully-quiet keys age out.
    */
  def distinctDocsTtl(docs: DataFrame,
                      eventTimeCol: String,
                      ttl: java.time.Duration,
                      watermarkDelay: String = "0 seconds"): Dataset[Doc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .withWatermark(eventTimeCol, watermarkDelay)
      // plain alias, no cast: Cast would strip the watermark metadata the
      // EventTimeTimeout analysis rule looks for
      .select(col("doc_id").cast("long").as("doc_id"),
              TextAnalysis.fingerprint(col("text")).as("fingerprint"),
              col(eventTimeCol).as("event_ts"))
      .as[DocT]
      .groupByKey(_.fingerprint)
      .flatMapGroupsWithState(OutputMode.Append(),
                              GroupStateTimeout.EventTimeTimeout)(
        keepFirstTtl(ttl.toMillis))
  }

  private def keepFirstTtl(ttlMs: Long)(
      fp: String,
      rows: Iterator[DocT],
      state: GroupState[Long]): Iterator[Doc] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val batch = rows.toSeq
      val latest = batch.map(_.event_ts.getTime).max
      val deadline =
        math.max(latest + ttlMs,
                 state.getCurrentWatermarkMs() + 1) // timers must lead the wm
      if (state.exists) {
        state.update(math.max(state.get, latest))
        state.setTimeoutTimestamp(deadline)
        Iterator.empty
      } else {
        state.update(latest)
        state.setTimeoutTimestamp(deadline)
        Iterator(Doc(batch.minBy(_.doc_id).doc_id, fp))
      }
    }
  }
}
