package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ScdConfig
import graft.functions.ScdFunctions._

/** Temporal (as-of) join across N SCD2 tables.
  *
  * Builds a spine of every change point per key across all relations, then for
  * each relation left-joins the version whose validity window CONTAINS the
  * spine window (`spine._valid_from >= r._valid_from AND
  * spine._valid_to <= r._valid_to`), and drops zero-width spine windows.
  * Mirrors `/root/reference/macros/joins/scd2_join.sql:21-66`.
  *
  * Each relation is passed with an alias used to prefix its payload columns in
  * the output (the reference prefixes with the relation name implicitly via
  * SQL scoping; we must rename to keep output columns unambiguous).
  *
  * Scale note: the join is equi-on-keys plus a range containment — Catalyst
  * runs it as a sort-merge join on the keys with the range as a post-filter,
  * so all N joins co-partition on the same key hash and AQE coalesces the
  * exchanges between them.
  */
object Scd2Join {

  private val spineAudit =
    Seq("_VALID_FROM", "_VALID_TO", "_IS_CURRENT", "_UPDATED_AT", "_CHANGE_TYPE")

  def apply(relations: Seq[(String, DataFrame)],
            joinKeys: Seq[String],
            cfg: ScdConfig = ScdConfig(uniqueKey = Seq("_unused_"))): DataFrame = {
    require(relations.nonEmpty, "scd2_join needs at least one relation")
    val vf = cfg.validFromCol
    val vt = cfg.validToCol
    val cur = cfg.isCurrentCol

    // distinct_updates (:27-32): all change points per key (UNION = distinct).
    val updates = relations
      .map { case (_, r) =>
        val cols = r.columns.toSeq
        r.select(
          joinKeys.map(k => col(resolveCi(cols, k)).as(k)) :+
            col(resolveCi(cols, vf)).cast("timestamp").as("_updated_at"): _*)
      }
      .reduce(_ unionByName _)
      .distinct()

    // temporal_spine (:35-42): recompute windows with the shared column
    // macros. Change points are DISTINCT per key, so `_is_current` =
    // `lead(_updated_at) IS NULL` — same value as row_number() DESC = 1 but
    // on the one ascending window validTo already sorts.
    val spineW = versionWindow(joinKeys, "_updated_at")
    val spine = updates
      .withColumn(cur, lead(col("_updated_at"), 1).over(spineW).isNull)
      .withColumn(vf, validFrom(joinKeys, "_updated_at"))
      .withColumn(vt, validTo(joinKeys, "_updated_at", cfg.defaultValidTo))
      .as("spine")

    // N containment joins (:58-63), payload columns prefixed per relation.
    val (joined, payload) = relations.foldLeft((spine: DataFrame, Seq.empty[String])) {
      case ((acc, outCols), (alias, r)) =>
        val keyUpper = joinKeys.map(_.toUpperCase).toSet
        val cols = r.columns.toSeq
        val payloadCols = cols.filterNot(c =>
          keyUpper.contains(c.toUpperCase) || spineAudit.contains(c.toUpperCase))
        val renamed = r.select(
          joinKeys.map(k => col(resolveCi(cols, k)).as(s"${alias}__$k")) ++
            Seq(col(resolveCi(cols, vf)).as(s"${alias}__$vf"),
                col(resolveCi(cols, vt)).as(s"${alias}__$vt")) ++
            payloadCols.map(c => col(c).as(s"${alias}_$c")): _*)
        val cond = joinKeys
          .map(k => col(s"spine.$k") === col(s"${alias}__$k"))
          .reduce(_ && _) &&
          col(s"spine.$vf") >= col(s"${alias}__$vf") &&
          col(s"spine.$vt") <= col(s"${alias}__$vt")
        (acc.join(renamed, cond, "left"),
         outCols ++ payloadCols.map(c => s"${alias}_$c"))
    }

    joined
      .filter(col(s"spine.$vf") < col(s"spine.$vt")) // P4: zero-width windows
      .select(joinKeys.map(k => col(s"spine.$k")) ++ payload.map(col) ++
        Seq(col(s"spine.$cur"), col(s"spine.$vf"), col(s"spine.$vt")): _*)
  }
}
