package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Enforced output contracts — the Spark counterpart of dbt's
  * `contract: enforced` on an SCD model
  * (`/root/reference/integration_tests/models/scd2_materialization/schema.yml:159-192`):
  * the FINAL relation must match a declared (name, type, nullability) set,
  * while the temp delta relation is exempt
  * (`/root/reference/macros/materializations/scd/create_temp_table_as.sql:1-5`
  * deliberately bypasses enforcement — the temp holds raw business columns,
  * audit columns are added downstream). The engine mirrors that split: the
  * check runs against the post-merge snapshot schema immediately BEFORE the
  * swap (a violating snapshot is never published), and never against the
  * cached batch.
  *
  * Name/type/undeclared checks are schema-only (Catalyst `StructType`
  * metadata — free at any scale):
  *   - every declared column exists (case-insensitive, like the engine's
  *     column resolution everywhere else);
  *   - its Catalyst `DataType` matches exactly;
  *   - no undeclared columns exist in the output.
  * Declared NOT NULL is a DATA constraint (warehouse DML semantics): a
  * plan-provably non-nullable column passes free; a plan-nullable one costs
  * ONE narrow combine-enabled null-count aggregate over just those columns
  * before publish — the parquet read-back in the incremental path erases
  * plan nullability, so a metadata-only check would reject every merged
  * snapshot.
  */
object Contracts {

  /** One contract breach: `kind` is one of `missing_column`,
    * `undeclared_column`, `type_mismatch`, `nullability`.
    */
  final case class Violation(column: String, expected: String,
                             actual: String, kind: String)

  final class ContractViolationException(val violations: Seq[Violation])
    extends IllegalArgumentException(
      "output contract violated:\n" + violations.map(v =>
        s"  - ${v.kind}: ${v.column} (expected ${v.expected}, got ${v.actual})")
        .mkString("\n"))

  /** All breaches of `contract` by `actual` (empty = conforming). */
  def violations(actual: StructType, contract: StructType): Seq[Violation] = {
    val byName = actual.fields.map(f => f.name.toLowerCase -> f).toMap
    val declared = contract.fields.map(_.name.toLowerCase).toSet
    val missing = contract.fields.toSeq
      .filterNot(f => byName.contains(f.name.toLowerCase))
      .map(f => Violation(f.name, f.dataType.simpleString, "<missing>",
                          "missing_column"))
    val extra = actual.fields.toSeq
      .filterNot(f => declared.contains(f.name.toLowerCase))
      .map(f => Violation(f.name, "<undeclared>", f.dataType.simpleString,
                          "undeclared_column"))
    val mismatched = contract.fields.toSeq.flatMap { f =>
      byName.get(f.name.toLowerCase).toSeq.flatMap { a =>
        val types =
          if (a.dataType != f.dataType)
            Seq(Violation(f.name, f.dataType.simpleString,
                          a.dataType.simpleString, "type_mismatch"))
          else Nil
        val nulls =
          if (!f.nullable && a.nullable)
            Seq(Violation(f.name, "not null", "nullable", "nullability"))
          else Nil
        types ++ nulls
      }
    }
    missing ++ extra ++ mismatched
  }

  /** Throw [[ContractViolationException]] unless `actual` conforms
    * (schema-metadata check only — nullability judged from the plan).
    */
  def enforce(actual: StructType, contract: StructType): Unit = {
    val v = violations(actual, contract)
    if (v.nonEmpty) throw new ContractViolationException(v)
  }

  /** Schema-only enforcement of the STRUCTURAL clauses (missing/undeclared/
    * type): throws off `StructType` metadata alone, ignoring nullability.
    * Free at any scale — run this against the plan schema BEFORE paying for
    * the snapshot write, so a structurally-broken snapshot never even
    * reaches disk.
    */
  def enforceStructural(actual: StructType, contract: StructType): Unit = {
    val structural =
      violations(actual, contract).filterNot(_.kind == "nullability")
    if (structural.nonEmpty) throw new ContractViolationException(structural)
  }

  /** Data-level enforcement of the declared-NOT-NULL clauses only: one
    * narrow combine-enabled null-count aggregate over just those declared
    * NOT NULL columns the plan cannot prove non-nullable (no shuffle beyond
    * the final 1-row reduce). Extra columns in `df` are ignored — pair with
    * [[enforceStructural]] for the full contract. Intended to run against
    * the ALREADY-WRITTEN tmp output (a parquet column scan), so the
    * snapshot plan is never executed twice just to validate it.
    */
  def enforceNotNull(df: DataFrame, contract: StructType): Unit = {
    import org.apache.spark.sql.functions.{col, lit, sum, when}
    val nullable = df.schema.fields
      .map(f => f.name.toLowerCase -> f.nullable).toMap
    val cols = contract.fields.toSeq
      .filter(f => !f.nullable && nullable.getOrElse(f.name.toLowerCase, false))
      .map(_.name)
    if (cols.isEmpty) return
    val counts = df.select(cols.map(c =>
      sum(when(col(c).isNull, lit(1L)).otherwise(lit(0L))).as(c)): _*).head()
    val confirmed = cols.zipWithIndex.flatMap { case (c, i) =>
      val n = if (counts.isNullAt(i)) 0L else counts.getLong(i) // empty => 0
      if (n > 0) Some(Violation(c, "not null", s"$n null values",
                                "nullability"))
      else None
    }
    if (confirmed.nonEmpty) throw new ContractViolationException(confirmed)
  }

  /** Data-aware enforcement of `contract` on a computed relation: structural
    * breaches (missing/undeclared/type) throw immediately off the schema; a
    * declared-NOT-NULL column the plan cannot prove non-nullable is then
    * settled by one narrow null-count aggregate over `df`. NOTE this
    * executes `df`'s plan — callers that subsequently write the same
    * relation should prefer [[enforceStructural]] pre-write +
    * [[enforceNotNull]] on the written output, which validates the parquet
    * bytes instead of re-running the pipeline.
    */
  def enforce(df: DataFrame, contract: StructType): Unit = {
    enforceStructural(df.schema, contract)
    enforceNotNull(df, contract)
  }

  /** Per-column conformance report — the driver-checkable face of
    * [[violations]]: one row per DECLARED column (column, expected_type,
    * ok), plus one `ok=false` row per UNDECLARED actual column
    * (expected_type=`<undeclared>`) so the report agrees with [[enforce]] —
    * a relation carrying extra columns must not render all-green.
    */
  def report(spark: SparkSession, actual: StructType,
             contract: StructType): DataFrame = {
    import spark.implicits._
    val broken = violations(actual, contract).map(_.column.toLowerCase).toSet
    val declared = contract.fields.map(_.name.toLowerCase).toSet
    val declaredRows = contract.fields.toSeq
      .map(f => (f.name, f.dataType.simpleString,
                 !broken.contains(f.name.toLowerCase)))
    val undeclaredRows = actual.fields.toSeq
      .filterNot(f => declared.contains(f.name.toLowerCase))
      .map(f => (f.name, "<undeclared>", false))
    (declaredRows ++ undeclaredRows).toDF("column", "expected_type", "ok")
  }
}
