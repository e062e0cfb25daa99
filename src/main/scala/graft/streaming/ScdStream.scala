package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.{ScdConfig, ScdEngine}

/** Structured Streaming front-end for SCD maintenance.
  *
  * The reference's execution model is *repeated incremental batch* — each
  * `dbt run` reconciles newly-arrived rows into the dimension
  * (`/root/reference/README.md:162-178`); it has no streaming operators
  * (SURVEY.md §2.10). The streaming-native equivalent is therefore exact:
  * every micro-batch is one `ScdEngine.run`. Out-of-order and late events
  * need no watermark handling — re-slotting history on late arrival is what
  * the SCD2 merge itself does (`update_all_previous_records` +
  * `collapse_redundant_versions`), so correctness is independent of trigger
  * timing and batch boundaries.
  *
  * At scale the same properties hold as for batch runs: per-micro-batch cost
  * is ∝ batch size via affected-key pruning, and with `numBuckets` set only
  * touched bucket partitions are rewritten.
  */
object ScdStream {

  /** Attach an SCD sink to a streaming DataFrame. Caller starts/stops the
    * returned writer (`.start()`).
    */
  def scdSink(stream: DataFrame,
              targetPath: String,
              cfg: ScdConfig,
              checkpointLocation: String,
              numBuckets: Option[Int] = None,
              trigger: Trigger = Trigger.ProcessingTime(0)): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty)
          ScdEngine.run(batch.sparkSession, batch.toDF(), targetPath, cfg,
                        numBuckets = numBuckets)
        ()
      }
}
