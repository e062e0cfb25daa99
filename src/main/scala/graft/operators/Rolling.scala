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

  /** Linear interpolation of interior gaps in a per-key integer series:
    * given a DENSE index spine (`idxCol`, one row per step) with a nullable
    * observed `valCol`, fill each missing step from its surrounding
    * observations — `prev + (next − prev) · (i − i_prev)/(i_next − i_prev)`.
    * Observed steps pass through exactly. No extrapolation: callers build
    * the spine between each key's first and last observation, so prev/next
    * always exist for interior nulls.
    *
    * One (key)-exchange, two framed window passes (running last-non-null
    * forward, first-non-null backward) — the same ignore-nulls fill shape
    * as X151, plus the weighted combine. Fill values are doubles derived
    * from exact integers with a fixed expression tree, so any engine
    * reproduces them bit-for-bit (rounded to 6).
    */
  def linearFill(spine: DataFrame, keys: Seq[String], idxCol: String,
                 valCol: String): DataFrame = {
    val wp = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(idxCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wn = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(idxCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val v = col(valCol)
    val obsIdx = when(v.isNotNull, col(idxCol))
    spine
      .withColumn("_pv", last(v, ignoreNulls = true).over(wp))
      .withColumn("_pd", last(obsIdx, ignoreNulls = true).over(wp))
      .withColumn("_nv", first(v, ignoreNulls = true).over(wn))
      .withColumn("_nd", first(obsIdx, ignoreNulls = true).over(wn))
      .withColumn(s"${valCol}_filled",
        when(v.isNotNull, v.cast("double"))
          .otherwise(round(
            col("_pv") + (col("_nv") - col("_pv")) *
              ((col(idxCol) - col("_pd")) /
                 (col("_nd") - col("_pd")).cast("double")), 6)))
      .drop("_pv", "_pd", "_nv", "_nd")
  }

  /** Recency-decayed engagement: each event's integer micro-value halved
    * once per elapsed half-life (`value >> floor(age/halflife)` — the
    * INTEGER-EXACT exponential decay: no float `exp`, so partial sums are
    * order-independent and any engine agrees to the last bit), summed per
    * key against a broadcast single-row horizon. The standard "recent
    * activity outweighs old" score with none of the usual float drift.
    */
  def decayedScore(df: DataFrame, keys: Seq[String], tsCol: String,
                   valueMicro: org.apache.spark.sql.Column,
                   horizon: DataFrame, halflifeSec: Long): DataFrame =
    df.join(broadcast(horizon))
      .withColumn("_vm", valueMicro.cast("long"))
      .withColumn("_age_s",
        expr(s"(unix_micros(_horizon) - unix_micros($tsCol)) DIV 1000000"))
      .withColumn("_halvings", expr(s"_age_s DIV $halflifeSec"))
      .withColumn("_dm", expr("shiftright(_vm, cast(_halvings AS INT))"))
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_events"),
           sum(col("_vm")).as("raw_micro"),
           sum(col("_dm")).as("decayed_micro"))

  /** Clamped-at-zero running balance: the "inventory can't go negative"
    * recurrence S_t = max(0, S_{t-1} + Δ_t), which looks sequential (and
    * is usually dismissed as not-window-expressible) but has the closed
    * form
    *
    *   S_t = P_t − least(0, min_{k≤t} P_k)      (P = plain prefix sums)
    *
    * — every clamp event resets the baseline to the running minimum of
    * the unclamped walk. Two stacked windows on the SAME partition/order
    * spec (one sort, one exchange per partition key), no iteration, no
    * UDF; the recurrence identity is spec-checked against direct
    * simulation. Appends `outCol` holding S_t per row.
    */
  def clampedRunningSum(df: DataFrame, partCols: Seq[String],
                        orderCols: Seq[String], deltaCol: String,
                        outCol: String = "bal"): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_p", sum(col(deltaCol)).over(w))
      .withColumn("_floor", least(min(col("_p")).over(w), lit(0L)))
      .withColumn(outCol, col("_p") - col("_floor"))
      .drop("_p", "_floor")
  }
}
