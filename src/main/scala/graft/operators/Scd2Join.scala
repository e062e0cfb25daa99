package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Align two SCD2 timelines of the SAME key space into the piecewise
    * segments where one version of EACH is valid — the dimension-to-
    * dimension face of the temporal join (this object's `apply` joins
    * facts to dimensions): the result is itself a valid SCD2 timeline
    * whose change points are the union of both inputs', the canonical
    * "stitch two attribute histories into one" operation (interval
    * intersection per key).
    *
    * One equi-join exchange on the business key; the overlap predicate
    * (`greatest(vf) < least(vt)`, half-open intervals so touching
    * versions produce no zero-width segment) filters the per-key version
    * cross product, which is bounded by |A_k|+|B_k|-1 surviving segments
    * per key — never quadratic output. The 2999 open-version sentinel
    * flows through greatest/least as +infinity, no special case.
    */
  def alignTimelines(a: DataFrame, b: DataFrame, cfg: ScdConfig,
                     aPayload: Seq[String], bPayload: Seq[String])
      : DataFrame = {
    val keys = cfg.uniqueKey
    val vf = cfg.validFromCol
    val vt = cfg.validToCol
    val aa = a.select(keys.map(col) ++ aPayload.map(col)
                        :+ col(vf).as("_vf_a") :+ col(vt).as("_vt_a"): _*)
    val bb = b.select(keys.map(col) ++ bPayload.map(col)
                        :+ col(vf).as("_vf_b") :+ col(vt).as("_vt_b"): _*)
    aa.join(bb, keys)
      .withColumn("seg_from", greatest(col("_vf_a"), col("_vf_b")))
      .withColumn("seg_to", least(col("_vt_a"), col("_vt_b")))
      .filter(col("seg_from") < col("seg_to"))
      .select(keys.map(col) ++ Seq(col("seg_from"), col("seg_to"))
                ++ aPayload.map(col) ++ bPayload.map(col): _*)
  }

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

  /** Scale-path temporal join: same output as `apply` whenever every input
    * satisfies the SCD2 invariants this engine's own outputs guarantee
    * (continuous validity windows per key, open-ended final version — the
    * `continuous_validity_windows` / `valid_window_well_formed` invariant
    * tests). Under continuity, "the version whose window CONTAINS the spine
    * window" is exactly "the last version starting at or before the spine
    * point", so the N containment joins collapse to last-non-null window
    * fills over the unioned change points.
    *
    * Cost: ONE exchange + sort on the business key for the whole join,
    * linear in Σ|relations| — versus N sort-merge joins whose per-key
    * intermediate is |spine| × |versions| (quadratic in version-chain length)
    * before the range filter prunes. At 100 TB version chains this is the
    * difference between a shuffle-bound pass and a blowup.
    *
    * NULL business keys mirror the reference join's null-hostile `=`:
    * payloads stay NULL for NULL-key spine rows (asserted in Scd2JoinSpec).
    */
  def asOfFill(relations: Seq[(String, DataFrame)],
               joinKeys: Seq[String],
               cfg: ScdConfig = ScdConfig(uniqueKey = Seq("_unused_"))): DataFrame = {
    require(relations.nonEmpty, "scd2_join needs at least one relation")
    val vf = cfg.validFromCol
    val vt = cfg.validToCol
    val cur = cfg.isCurrentCol

    // One struct column per relation holding its payload; each relation
    // contributes rows with its own struct set and the others NULL.
    val keyUpper = joinKeys.map(_.toUpperCase).toSet
    val payloadsByAlias = relations.map { case (alias, r) =>
      alias -> r.columns.toSeq.filterNot(c =>
        keyUpper.contains(c.toUpperCase) || spineAudit.contains(c.toUpperCase))
    }.toMap
    val structTypeByAlias = relations.map { case (alias, r) =>
      alias -> org.apache.spark.sql.types.StructType(
        payloadsByAlias(alias).map(c => r.schema(c)))
    }.toMap
    val tagged = relations.map { case (alias, r) =>
      val cols = r.columns.toSeq
      val structs = relations.map { case (other, _) =>
        if (other == alias)
          struct(payloadsByAlias(alias).map(col): _*).as(s"_p_$other")
        else
          lit(null).cast(structTypeByAlias(other)).as(s"_p_$other")
      }
      r.select(
        joinKeys.map(k => col(resolveCi(cols, k)).as(k)) ++
          Seq(col(resolveCi(cols, vf)).cast("timestamp").as("_t")) ++ structs: _*)
    }.reduce(_ unionByName _)

    // Last version at or before each change point, per relation. RANGE frame:
    // rows sharing a change point must see each other's structs.
    val fillW = versionWindow(joinKeys, "_t")
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val keysNonNull = joinKeys.map(col(_).isNotNull).reduce(_ && _)
    val filled = relations.foldLeft(tagged) { case (df, (alias, _)) =>
      df.withColumn(
        s"_f_$alias",
        when(keysNonNull,
             last(col(s"_p_$alias"), ignoreNulls = true).over(fillW)))
    }.dropDuplicates(joinKeys :+ "_t")

    // Spine audit columns over the distinct change points (same macros as
    // `apply`'s spine), then expand the structs to alias-prefixed columns.
    val spineW = versionWindow(joinKeys, "_t")
    val payload = relations.flatMap { case (alias, _) =>
      payloadsByAlias(alias).map(c =>
        col(s"_f_$alias.$c").as(s"${alias}_$c"))
    }
    filled
      .withColumn(cur, lead(col("_t"), 1).over(spineW).isNull)
      .withColumn(vf, col("_t"))
      .withColumn(vt, coalesce(lead(col("_t"), 1).over(spineW),
                               to_timestamp(lit(cfg.defaultValidTo))))
      .filter(col(vf) < col(vt))
      .select(joinKeys.map(col) ++ payload ++
        Seq(col(cur), col(vf), col(vt)): _*)
  }

  /** Fact-to-dimension as-of enrichment: attach to each fact row the
    * dimension version valid at the fact's timestamp — THE production
    * consumption query for an SCD2 table (point-in-time join).
    *
    * Same plan shape as [[asOfFill]]: union the dimension's change points
    * with the fact rows, one exchange + sort on (key, ts), last-non-null
    * RANGE fill. A fact at a version's exact `_valid_from` is a frame PEER
    * of that change point, so it sees the new version (the window is
    * [valid_from, valid_to)); facts before the key's first version keep NULL
    * payload (left-join semantics); NULL keys stay NULL (the join's
    * null-hostile `=`). Never |facts| x |versions| intermediate rows — the
    * containment join's blowup on hot keys — and the fact table is never
    * shuffled more than once.
    */
  def enrich(facts: DataFrame,
             factTsCol: String,
             dim: DataFrame,
             joinKeys: Seq[String],
             cfg: ScdConfig = ScdConfig(uniqueKey = Seq("_unused_"))): DataFrame = {
    val vf = cfg.validFromCol
    val keyUpper = joinKeys.map(_.toUpperCase).toSet
    val dimCols = dim.columns.toSeq
    val payloadCols = dimCols.filterNot(c =>
      keyUpper.contains(c.toUpperCase) || spineAudit.contains(c.toUpperCase))
    val pType = org.apache.spark.sql.types.StructType(
      payloadCols.map(c => dim.schema(c)))
    val factCols = facts.columns.toSeq
    val fType = org.apache.spark.sql.types.StructType(
      factCols.map(c => facts.schema(c)))

    val dimRows = dim.select(
      joinKeys.map(k => col(resolveCi(dimCols, k)).as(k)) ++ Seq(
        col(resolveCi(dimCols, vf)).cast("timestamp").as("_t"),
        struct(payloadCols.map(col): _*).as("_p"),
        lit(null).cast(fType).as("_f")): _*)
    val factRows = facts.select(
      joinKeys.map(k => col(resolveCi(factCols, k)).as(k)) ++ Seq(
        col(resolveCi(factCols, factTsCol)).cast("timestamp").as("_t"),
        lit(null).cast(pType).as("_p"),
        struct(factCols.map(col): _*).as("_f")): _*)

    val fillW = versionWindow(joinKeys, "_t")
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val keysNonNull = joinKeys.map(col(_).isNotNull).reduce(_ && _)
    dimRows.unionByName(factRows)
      .withColumn("_fill",
                  when(keysNonNull,
                       last(col("_p"), ignoreNulls = true).over(fillW)))
      .filter(col("_f").isNotNull)
      .select(factCols.map(c => col(s"_f.$c").as(c)) ++
        payloadCols.map(c => col(s"_fill.$c").as(s"dim_$c")): _*)
  }
}
