package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy record linkage: candidate pairs via an equi-join on
  * caller-chosen blocking keys, verified with an exact edit-distance bound.
  *
  * The classic linkage decomposition — an all-pairs edit-distance comparison
  * is quadratic in the corpus and unrunnable at 100 TB, so the quadratic term
  * is confined to within-block pairs: one shuffle on the block key, and the
  * comparison cost is sum(|block|^2), which the CALLER controls by picking
  * blocking keys whose fibers stay small (same move as the LSH band join in
  * [[Dedup.minHashNearDupPairs]] — blocking IS locality-sensitive hashing
  * with a hand-built hash). `levenshtein` is a codegen'd built-in in Spark
  * and exists verbatim in ANSI-ish engines, so verification is portable.
  */
object Linkage {

  /** Within-block id-ordered pairs with `levenshtein(text) <= maxDist`.
    *
    * Output: blocking cols, `id_a`, `id_b`, `text_a`, `text_b`, `dist`.
    * Self-pairs and symmetric duplicates are excluded by `id_a < id_b`.
    */
  def fuzzyPairs(df: DataFrame,
                 idCol: String,
                 textCol: String,
                 blockCols: Seq[String],
                 maxDist: Int): DataFrame = {
    def side(tag: String) =
      df.select(blockCols.map(col) ++ Seq(
        col(idCol).as(s"id_$tag"), col(textCol).as(s"text_$tag")): _*)
    side("a")
      .join(side("b"), blockCols)
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("text_a"), col("text_b")))
      .filter(col("dist") <= maxDist)
  }

  /** All edit-distance-≤1 pairs of distinct values of `textCol` via the
    * SymSpell deletion neighborhood — no hand-chosen blocking key, and
    * COMPLETE for distance 1 (unlike [[fuzzyPairs]], which misses pairs
    * that differ inside the blocking key): two distinct strings are within
    * one edit iff deleting at most one character from each makes them
    * equal (substitution = same-position deletes; insert/delete =
    * one-sided). Each value explodes to length+1 variants, pairs come from
    * ONE equi-join on the variant (vocab-sized input, never the fact
    * table), are deduped, then verified with `levenshtein` — the variant
    * join is candidate generation only, so false positives (two deletes
    * landing on the same string at distance 2) are filtered exactly.
    *
    * Output: `value_a` < `value_b`, `dist` (1), plus each value's source
    * row count (the dedup/merge decision inputs).
    */
  def symspellPairs(df: DataFrame, textCol: String): DataFrame = {
    val counts = df.select(lower(col(textCol)).as("w"))
      .filter(col("w").isNotNull && length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
    val variants = counts.select(col("w"),
      explode(array_distinct(concat(array(col("w")),
        expr("transform(sequence(1, length(w)), i -> " +
             "concat(substring(w, 1, i - 1), substring(w, i + 1, 1000000)))"))))
        .as("v"))
    variants.as("_a")
      .join(variants.as("_b"), col("_a.v") === col("_b.v"))
      .filter(col("_a.w") < col("_b.w"))
      .select(col("_a.w").as("value_a"), col("_b.w").as("value_b"))
      .distinct()
      .withColumn("dist", levenshtein(col("value_a"), col("value_b")))
      .filter(col("dist") <= 1)
      .join(counts.withColumnRenamed("w", "value_a")
              .withColumnRenamed("n", "n_a"), Seq("value_a"))
      .join(counts.withColumnRenamed("w", "value_b")
              .withColumnRenamed("n", "n_b"), Seq("value_b"))
      .select(col("value_a"), col("value_b"), col("dist"),
              col("n_a"), col("n_b"))
  }
}
