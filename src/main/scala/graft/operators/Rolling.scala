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

  /** Inter-arrival gap statistics: per-key event-time gaps (lag over the
    * (ts, tiebreak) order — the tiebreak makes same-instant neighbors
    * deterministic in every engine), aggregated per group of the ARRIVING
    * event. All-integer outputs: gaps in micros, mean as `sum div n` — no
    * float accumulation order to disagree on.
    *
    * One exchange + sort on (key, ts) — the standard per-key timeline
    * distribution — then a combine-enabled aggregate onto the group key.
    * The capacity-planning / anomaly primitive (a collapsing gap under load
    * or a dead producer shows up here first).
    */
  def interArrival(df: DataFrame,
                   keyCol: String,
                   tsCol: String,
                   tiebreakCol: String,
                   groupCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tiebreakCol))
    df.withColumn("_gap", unix_micros(col(tsCol)) - lag(unix_micros(col(tsCol)), 1).over(w))
      .filter(col("_gap").isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_gaps"),
           sum(col("_gap")).as("sum_gap_micros"),
           max(col("_gap")).as("max_gap_micros"))
      .withColumn("avg_gap_micros", expr("sum_gap_micros DIV n_gaps"))
  }
}
