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
}
