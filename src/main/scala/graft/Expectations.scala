package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic table expectations — the Spark counterpart of dbt's built-in
  * generic tests (`not_null`, `unique`, `accepted_values`, `relationships`),
  * which the reference's integration project applies via its seed schema
  * YML alongside the SCD-specific suite ([[ScdInvariants]] covers those).
  *
  * Each check is a violation-set DataFrame; [[report]] unions their counts
  * into one queryable relation so a whole table's contract runs as ONE
  * Spark job. Scale shape per check: not_null/accepted_values are
  * scan-only filters; unique is a map-side-combined count per key;
  * relationships is a LEFT ANTI join against the (broadcastable) parent
  * key set.
  */
object Expectations {

  /** Rows where `c` is NULL (dbt `not_null`). */
  def notNull(df: DataFrame, c: String): DataFrame =
    df.filter(col(c).isNull)

  /** Keys appearing more than once (dbt `unique`); NULLs are exempt like
    * SQL UNIQUE (dbt counts them via not_null instead).
    */
  def unique(df: DataFrame, cols: Seq[String]): DataFrame =
    df.filter(cols.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > 1)

  /** Non-NULL values outside the accepted list (dbt `accepted_values`). */
  def acceptedValues(df: DataFrame, c: String, values: Seq[String]): DataFrame =
    df.filter(col(c).isNotNull && !col(c).isin(values: _*))

  /** Child rows whose non-NULL foreign key has no parent (dbt
    * `relationships`). The parent key set is distinct-projected and, being
    * dimension-sized, broadcast by Catalyst.
    */
  def relationships(child: DataFrame, fk: String,
                    parent: DataFrame, pk: String): DataFrame =
    child.filter(col(fk).isNotNull)
      .join(parent.select(col(pk).as("_pk")).distinct(),
            col(fk) === col("_pk"), "left_anti")

  /** Rows where the SQL predicate is NOT satisfied (dbt_utils
    * `expression_is_true`); NULL results count as violations, matching the
    * dbt test's `where not (expr)` ... NULL-is-not-true semantics.
    */
  def expressionIsTrue(df: DataFrame, expression: String): DataFrame =
    df.filter(!coalesce(expr(expression), lit(false)))

  /** One violation row (the two counts) when the relations' row counts
    * differ (dbt_utils `equal_rowcount`); empty when equal.
    */
  def equalRowcount(a: DataFrame, b: DataFrame): DataFrame =
    a.agg(count(lit(1)).as("n_a"))
      .crossJoin(b.agg(count(lit(1)).as("n_b")))
      .filter(col("n_a") =!= col("n_b"))

  /** One row per named check with its violation count — the table's whole
    * contract as a single query (mirrors [[ScdInvariants.report]]).
    */
  def report(checks: Seq[(String, DataFrame)]): DataFrame = {
    require(checks.nonEmpty, "report needs at least one check")
    checks.map { case (name, v) =>
      v.agg(count(lit(1)).as("violations"))
        .select(lit(name).as("check"), col("violations"))
    }.reduce(_ unionByName _)
  }

  /** Quarantine routing: tag every row with the (possibly empty) list of
    * row-level rules it violates — the dead-letter pattern: clean rows flow
    * to the target, violating rows route to a quarantine table WITH their
    * reasons, nothing is silently dropped. One narrow projection (each rule
    * is a codegen'd predicate over the row), zero shuffles: at 100 TB this
    * is a free rider on the ingest scan. `report`-style aggregation of the
    * result is [[quarantineSummary]].
    */
  def quarantine(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "quarantine needs at least one rule")
    df.withColumn("_violations",
      filter(array(rules.map { case (name, pred) =>
               when(!coalesce(pred, lit(false)), lit(name))
             }: _*),
             v => v.isNotNull))
  }

  /** Per-rule violation counts plus the `_clean` row-through count — the
    * routing report an ingest operator alarms on. One combine-enabled pass
    * over [[quarantine]]'s output.
    */
  def quarantineSummary(df: DataFrame, rules: Seq[(String, Column)])
      : DataFrame =
    quarantine(df, rules)
      .select(explode(
        when(size(col("_violations")) === 0, array(lit("_clean")))
          .otherwise(col("_violations"))).as("rule"))
      .groupBy("rule").agg(count(lit(1)).as("n_rows"))
}
