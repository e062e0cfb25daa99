package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ScdConfig

/** SCD types 3 and 6 — the remaining Kimball variants around the engine's
  * 0/1/2 core (`Scd01`, `Scd2`).
  *
  * Type 3 keeps ONE previous value beside the current one (the classic
  * "previous_region" reorg column): no history rows, just (current,
  * previous, changed_at) per key. Type 6 (= 1+2+3 hybrid) keeps the full
  * type-2 history AND stamps every historical row with the key's CURRENT
  * value of the tracked column, so "group history by today's taxonomy"
  * joins nothing at query time.
  *
  * Both derive from the same change-collapsed timeline `Scd2.initialLoad`
  * produces, so change detection, dedup, and late-data semantics are
  * identical to the engine core by construction: one extra bounded window
  * per key on top of the SCD2 plan, no additional shuffle of the raw feed.
  */
object Scd3 {

  /** Type 3 snapshot: one row per key — current tracked value, the
    * previous DISTINCT tracked value (null for never-changed keys), when
    * the current value took effect, and the key's total change count.
    */
  def snapshot(delta: DataFrame, cfg: ScdConfig, trackCol: String): DataFrame = {
    val hist = Scd2.initialLoad(delta, cfg)
    val keyCols = cfg.uniqueKey.map(col)
    // One ascending sort serves all three windows (last-row test is
    // rn == n_versions, no descending rank needed).
    val w = Window.partitionBy(keyCols: _*).orderBy(col(cfg.validFromCol))
    hist
      .withColumn("_prev_track", lag(col(trackCol), 1).over(w))
      .withColumn("_rn", row_number().over(w))
      .withColumn("_n_versions",
        count(lit(1)).over(Window.partitionBy(keyCols: _*)))
      .filter(col("_rn") === col("_n_versions"))
      .select(keyCols ++ Seq(
        col(trackCol).as(s"${trackCol}_current"),
        col("_prev_track").as(s"${trackCol}_previous"),
        col(cfg.validFromCol).as("changed_at"),
        (col("_n_versions") - 1).as("n_changes")): _*)
  }

  /** Type 6 history: the full SCD2 timeline with every row additionally
    * carrying the key's CURRENT tracked value (`<col>_current`) — the
    * hybrid that answers "all history, bucketed by today's attribute"
    * without a self-join at read time.
    */
  def history(delta: DataFrame, cfg: ScdConfig, trackCol: String): DataFrame = {
    val hist = Scd2.initialLoad(delta, cfg)
    val keyCols = cfg.uniqueKey.map(col)
    // Full ASCENDING frame (same sort the SCD2 windows already use — no
    // second per-key sort): last() of the whole frame is the key's
    // current value on every row.
    val wAll = Window.partitionBy(keyCols: _*)
      .orderBy(col(cfg.validFromCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    hist.withColumn(s"${trackCol}_current",
      last(col(trackCol)).over(wAll))
  }
}
