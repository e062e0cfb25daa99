package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked tumbling-window rollup: the streaming counterpart of the
  * batch per-(event_type, day) rollup (X27), via the built-in windowed
  * aggregation — watermark-scoped state, append-mode emission when the
  * event-time watermark passes a window's end.
  *
  * At scale: state is O(open windows x event types), partial-aggregated
  * map-side per micro-batch before the one exchange on the grouping key —
  * the same combine-enabled shuffle the batch rollup plans. Sums are over
  * floor(value*1e6) longs (order-independent across arrival order, so a
  * replay from a different offset checkpoint produces identical rows).
  */
object RollupStream {

  /** events(ts, event_type, value) stream -> closed (event_type, day) rows.
    *
    * @param delay watermark delay: how long to admit late events before a
    *              window is sealed and emitted
    */
  def tumbling(events: DataFrame,
               tsCol: String = "ts",
               delay: String = "1 hour",
               width: String = "1 day"): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .groupBy(col("event_type"), window(col(tsCol), width).as("w"))
      .agg(count(lit(1)).as("n_events"),
           sum(floor(col("value") * lit(1000000.0)).cast("long"))
             .as("value_micro_sum"))
      .select(col("event_type"), col("w").getField("start").as("day"),
              col("n_events"), col("value_micro_sum"))
}
