package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.operators.CorpusIngest

/** Streaming corpus ingestion: every micro-batch runs one
  * [[CorpusIngest.ingestNearDup]] (or the exact-only [[CorpusIngest.ingest]])
  * against the versioned corpus — the streaming face of dedup-on-ingest.
  * At-least-once upstream delivery is safe because a replayed batch matches
  * its own previously-ingested copies (fingerprint/near-dup), so the corpus
  * never grows on retry; the versioned layout keeps concurrent readers on
  * the previous committed snapshot during a publish.
  */
object IngestStream {

  /** Attach a near-dup-rejecting ingest sink to a `(doc_id, text)` stream.
    * Caller starts/stops the returned writer.
    */
  def nearDupSink(stream: DataFrame,
                  root: String,
                  checkpointLocation: String,
                  n: Int = 3,
                  bands: Int = 4,
                  rows: Int = 3,
                  tauNum: Int = 1,
                  tauDen: Int = 2,
                  trigger: Trigger = Trigger.ProcessingTime(0)): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty)
          CorpusIngest.ingestNearDup(batch.sparkSession, batch.toDF(), root,
                                     n, bands, rows, tauNum, tauDen)
        ()
      }
}
