package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling event-time aggregates per key: a RANGE frame over integer event
  * microseconds, so the window bound is exact (no calendar arithmetic in the
  * hot path) and same-instant events are frame peers in every engine.
  *
  * One exchange + one sort on (key, ts) — the same distribution every other
  * per-key timeline operator here uses; a hot key serializes only its own
  * chain. Sums are over floor(value*1e6) longs (order-independent).
  */
object Rolling {

  /** Per row: count and value-sum of the key's events in the trailing
    * `windowMicros` (inclusive of the current instant).
    */
  def trailing(df: DataFrame,
               keyCol: String,
               tsCol: String,
               valueCol: String,
               windowMicros: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(unix_micros(col(tsCol)))
      .rangeBetween(-windowMicros, 0)
    df.withColumn("n_window", count(lit(1)).over(w))
      .withColumn("value_micro_sum_window",
                  sum(floor(col(valueCol) * lit(1000000.0)).cast("long")).over(w))
  }
}
