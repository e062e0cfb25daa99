package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ScdFunctions.resolveCi

/** The reference package's 10 generic invariant tests as DataFrame checks.
  *
  * Each returns the VIOLATING rows (pass == empty), exactly like the dbt
  * generic tests at `/root/reference/tests/generic/<any>.sql` — they double as the
  * correctness oracle for every SCD operator (SURVEY.md §2.11).
  */
object ScdInvariants {

  /** Exactly one `is_current` row per key (`test_one_current_per_key.sql:3-9`). */
  def oneCurrentPerKey(df: DataFrame, cfg: ScdConfig): DataFrame =
    df.filter(col(cfg.isCurrentCol) === true)
      .groupBy(cfg.uniqueKey.map(col): _*)
      .agg(count(lit(1)).as("current_count"))
      .filter(col("current_count") =!= 1)

  /** No overlapping validity windows per key
    * (`test_no_validity_overlaps.sql:10-17`): self theta join on keys with
    * interval overlap and distinct valid_from.
    */
  def noValidityOverlaps(df: DataFrame, cfg: ScdConfig): DataFrame = {
    val cols = Seq(cfg.validFromCol, cfg.validToCol) ++ cfg.uniqueKey
    val a = df.select(cols.map(col): _*).as("a")
    val b = df.select(cols.map(col): _*).as("b")
    val keysEqual = cfg.uniqueKey
      .map(k => col(s"a.$k") <=> col(s"b.$k"))
      .reduce(_ && _)
    a.join(b,
           keysEqual &&
             col(s"a.${cfg.validFromCol}") =!= col(s"b.${cfg.validFromCol}") &&
             col(s"a.${cfg.validFromCol}") < col(s"b.${cfg.validToCol}") &&
             col(s"b.${cfg.validFromCol}") < col(s"a.${cfg.validToCol}"))
      .select(cfg.uniqueKey.map(k => col(s"a.$k")) ++
        Seq(col(s"a.${cfg.validFromCol}"), col(s"a.${cfg.validToCol}"),
            col(s"b.${cfg.validFromCol}").as("b_valid_from"),
            col(s"b.${cfg.validToCol}").as("b_valid_to")): _*)
  }

  /** `valid_to` must equal the next version's `valid_from`
    * (`test_continuous_validity_windows.sql:8-21`).
    */
  def continuousValidityWindows(df: DataFrame, cfg: ScdConfig): DataFrame = {
    val w = Window
      .partitionBy(cfg.uniqueKey.map(col): _*)
      .orderBy(col(cfg.validFromCol))
    df.withColumn("next_valid_from", lead(col(cfg.validFromCol), 1).over(w))
      .filter(col("next_valid_from").isNotNull &&
        col(cfg.validToCol) =!= col("next_valid_from"))
      .select((cfg.uniqueKey :+ cfg.validFromCol :+ cfg.validToCol :+
        "next_valid_from").map(col): _*)
  }

  /** The latest row (by valid_from) per key must be current
    * (`test_latest_row_is_current.sql:3-18`).
    */
  def latestRowIsCurrent(df: DataFrame, cfg: ScdConfig): DataFrame = {
    val w = Window
      .partitionBy(cfg.uniqueKey.map(col): _*)
      .orderBy(col(cfg.validFromCol).desc)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && col(cfg.isCurrentCol) =!= true)
      .select((cfg.uniqueKey :+ cfg.isCurrentCol).map(col): _*)
  }

  /** A key's first record must be 'I' or 'D', never 'U'
    * (`test_first_record_not_update.sql:14-28`).
    */
  def firstRecordNotUpdate(df: DataFrame, cfg: ScdConfig): DataFrame = {
    val w = Window
      .partitionBy(cfg.uniqueKey.map(col): _*)
      .orderBy(col(cfg.validFromCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && col(cfg.changeTypeCol) === "U")
      .select((cfg.uniqueKey :+ cfg.changeTypeCol).map(col): _*)
  }

  /** After a 'D', the next record may only be 'I' (resurrection) or 'D'
    * (`test_insert_follows_delete.sql:33-53`).
    */
  def insertFollowsDelete(df: DataFrame, cfg: ScdConfig): DataFrame =
    invalidSequences(df, cfg, Seq("D" -> "U"))

  /** No I->I and no D->U sequences
    * (`test_no_consecutive_inserts_or_deletes.sql:27-58`).
    */
  def noConsecutiveInsertsOrDeletes(df: DataFrame, cfg: ScdConfig): DataFrame =
    invalidSequences(df, cfg, Seq("I" -> "I", "D" -> "U"))

  private def invalidSequences(df: DataFrame,
                               cfg: ScdConfig,
                               invalid: Seq[(String, String)]): DataFrame = {
    val w = Window
      .partitionBy(cfg.uniqueKey.map(col): _*)
      .orderBy(col(cfg.validFromCol))
    val seqd = df
      .withColumn("prev_change_type", lag(col(cfg.changeTypeCol), 1).over(w))
    val bad = invalid
      .map { case (p, c) =>
        col("prev_change_type") === p && col(cfg.changeTypeCol) === c
      }
      .reduce(_ || _)
    seqd
      .filter(bad)
      .select((cfg.uniqueKey :+ cfg.changeTypeCol :+ "prev_change_type" :+
        cfg.validFromCol).map(col): _*)
  }

  /** Soft-deleted rows must have `valid_from = deleted_at`
    * (`test_no_records_after_deletion.sql:26-37`).
    */
  def noRecordsAfterDeletion(df: DataFrame, cfg: ScdConfig): DataFrame = {
    val d = cfg.deletedAtCol.getOrElse(
      throw new IllegalArgumentException("deletedAtCol not configured"))
    df.filter(col(d).isNotNull && col(cfg.validFromCol) =!= col(d))
      .select((cfg.uniqueKey :+ d :+ cfg.validFromCol).map(col): _*)
  }

  /** (Types 0/1) every row is current (`test_all_records_current.sql:8-15`). */
  def allRecordsCurrent(df: DataFrame, cfg: ScdConfig): DataFrame =
    df.filter(col(cfg.isCurrentCol) =!= true || col(cfg.isCurrentCol).isNull)

  /** Both window bounds non-null and `from < to`
    * (`test_valid_window_well_formed.sql:10-17`).
    */
  def validWindowWellFormed(df: DataFrame, cfg: ScdConfig): DataFrame =
    df.filter(
      col(cfg.validFromCol).isNull || col(cfg.validToCol).isNull ||
        col(cfg.validFromCol) >= col(cfg.validToCol))

  /** Symmetric set-difference vs an expected golden
    * (`test_matches_expected_seed.sql:11-37`).
    */
  def matchesExpected(actual: DataFrame, expected: DataFrame): DataFrame = {
    val cols = expected.columns.toSeq
    val act = actual.select(cols.map(c => col(resolveCi(actual.columns.toSeq, c)).as(c)): _*)
    act.except(expected).withColumn("_diff_side", lit("actual_not_expected"))
      .unionByName(
        expected.except(act).withColumn("_diff_side", lit("expected_not_actual")))
  }

  /** Every applicable SCD2 invariant paired with its violating-rows frame. */
  def all(df: DataFrame, cfg: ScdConfig): Seq[(String, DataFrame)] = {
    val base = Seq(
      "one_current_per_key" -> oneCurrentPerKey(df, cfg),
      "no_validity_overlaps" -> noValidityOverlaps(df, cfg),
      "continuous_validity_windows" -> continuousValidityWindows(df, cfg),
      "latest_row_is_current" -> latestRowIsCurrent(df, cfg),
      "first_record_not_update" -> firstRecordNotUpdate(df, cfg),
      "insert_follows_delete" -> insertFollowsDelete(df, cfg),
      "no_consecutive_inserts_or_deletes" -> noConsecutiveInsertsOrDeletes(df, cfg),
      "valid_window_well_formed" -> validWindowWellFormed(df, cfg)
    )
    base ++ cfg.deletedAtCol.map(_ =>
      "no_records_after_deletion" -> noRecordsAfterDeletion(df, cfg))
  }

  /** One row per applicable invariant with its violation count — the suite as
    * a single distributed query (all scans plan together; share a cached
    * input). Pass == every `violations` is 0.
    */
  def report(df: DataFrame, cfg: ScdConfig): DataFrame =
    all(df, cfg).map { case (name, v) =>
      v.agg(count(lit(1)).as("violations"))
        .select(lit(name).as("invariant"), col("violations"))
    }.reduce(_ unionByName _)

  /** Run every applicable invariant; returns (name -> violation count).
    * Useful as a one-call gate in tests and pipelines.
    */
  def checkAll(df: DataFrame, cfg: ScdConfig): Map[String, Long] =
    all(df, cfg).map { case (k, v) => k -> v.count() }.toMap
}
