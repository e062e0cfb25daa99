package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate materialization — the non-SCD face of dbt's
  * `incremental` materialization (the reference package ships the SCD side;
  * a warehouse project pairs it with incremental rollup models rebuilt from
  * a watermark-scanned source, `/root/reference/macros/builtin_overrides/
  * source.sql:33-58`).
  *
  * The stored rollup keeps MERGEABLE partials only — count, long sum,
  * min, max — so refreshing with a new batch is `merge(existing,
  * rollup(batch))`: cost is O(batch + touched keys), never O(history).
  * That is the whole point at 100 TB: the fact history is unbounded, the
  * rollup is dimension-sized, and a refresh must not rescan the history.
  * Derived metrics (averages, rates) are computed AT READ TIME from the
  * partials (`avg = sum div count`) — storing an average would make the
  * rollup non-mergeable.
  *
  * Value sums are over caller-supplied integer (micro) columns so the merge
  * is order- and batching-independent: merging batches in any grouping
  * yields bit-identical partials to one full recompute (spec + oracle
  * assert exactly this).
  */
object IncrementalAgg {

  /** Metric column names the rollup/merge pair agrees on. */
  private val Metrics = Seq("n_rows", "value_micro", "min_micro", "max_micro")

  /** Base rollup of a (batch of a) fact table: mergeable partials per key.
    * One combine-enabled exchange on the keys.
    */
  def rollup(df: DataFrame, keys: Seq[String], valueMicro: Column): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
           sum(valueMicro).as("value_micro"),
           min(valueMicro).as("min_micro"),
           max(valueMicro).as("max_micro"))

  /** Merge an existing materialized rollup with a new batch's rollup.
    * Union + one combine-enabled re-aggregate over the touched keys:
    * count/sum add, min/max combine — the classic aggregate-merge algebra.
    * Both inputs are dimension-sized, so at scale this is the cheap step;
    * the fact history is never rescanned.
    */
  def merge(existing: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame = {
    val cols = keys ++ Metrics
    existing.select(cols.map(col): _*)
      .unionByName(delta.select(cols.map(col): _*))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n_rows")).as("n_rows"),
           sum(col("value_micro")).as("value_micro"),
           min(col("min_micro")).as("min_micro"),
           max(col("max_micro")).as("max_micro"))
  }

  /** Retraction-capable rollup of a CDC batch: rows tagged `opCol` ('I' or
    * 'D') contribute SIGNED count/sum partials. The retractable algebra is
    * deliberately count/sum ONLY — min/max are not retraction-mergeable
    * (deleting the current minimum needs the runner-up, which the partials
    * discarded; recovering it means rescanning history, exactly what an
    * incremental rollup exists to avoid). A pipeline needing min/max under
    * deletes keeps the insert-only [[rollup]]/[[merge]] pair and re-derives
    * those per TOUCHED key — this operator is the honest upsert-sink face.
    */
  def retractRollup(batch: DataFrame, keys: Seq[String], valueMicro: Column,
                    opCol: String): DataFrame = {
    val sign = when(col(opCol) === "D", -1L).otherwise(1L)
    batch.groupBy(keys.map(col): _*)
      .agg(sum(sign).as("n_rows"),
           sum(sign * valueMicro).as("value_micro"))
  }

  /** Merge a retractable rollup with a CDC batch's signed partials; keys
    * whose live count reaches zero leave the store (a later re-insert
    * recreates them — no tombstone residue).
    */
  def retractMerge(existing: DataFrame, delta: DataFrame, keys: Seq[String])
      : DataFrame = {
    val cols = keys ++ Seq("n_rows", "value_micro")
    existing.select(cols.map(col): _*)
      .unionByName(delta.select(cols.map(col): _*))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n_rows")).as("n_rows"),
           sum(col("value_micro")).as("value_micro"))
      .filter(col("n_rows") =!= 0L)
  }
}
