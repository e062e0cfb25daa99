package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Customer/entity segmentation from fact rollups.
  *
  * Beyond-reference tier: the audience-building queries a warehouse team
  * runs daily. Everything is integer-exact (cents, day counts, ranks) so
  * any engine reproduces the same segments.
  */
object Segmentation {

  /** RFM (recency / frequency / monetary) quartile segmentation: one
    * fact-sized combine aggregate to per-key (last date, order count, spend
    * cents), recency in whole days against the broadcast fact horizon,
    * then a quartile score per metric.
    *
    * The scale trap is the scoring, not the rollup: `ntile(4) over (order
    * by metric)` sorts every entity in ONE partition. Here each metric's
    * rank comes from [[Profile.cellRank]] (micro-cell decomposition — the
    * biggest sort is ~1/microBins of the entities), and the quartile is
    * arithmetic on the exact rank: `(rank-1)*4 DIV n + 1`. Ties break by
    * the entity key, so the scores are bit-reproducible in any engine (the
    * oracle uses plain `row_number`).
    *
    * Quartiles are ascending on each metric (r_q=1 ⇒ most recent buyers,
    * f_q=4 ⇒ most frequent, m_q=4 ⇒ biggest spenders).
    */
  def rfm(orders: DataFrame, keyCol: String, dateCol: String,
          amountCol: String): DataFrame = {
    val cents = expr(s"CAST(floor($amountCol * 100) AS BIGINT)")
    val rolled = orders.groupBy(col(keyCol)).agg(
      max(col(dateCol)).as("_last"),
      count(lit(1)).as("f"),
      sum(cents).as("m_cents"))
    val horizon = orders.agg(max(col(dateCol)).as("_h"))
    val base = rolled.crossJoin(broadcast(horizon))
      .withColumn("r_days", datediff(col("_h"), col("_last")).cast("long"))
      .select(col(keyCol), col("r_days"), col("f"), col("m_cents"))
      .withColumn("_all", graft.functions.DimKey.one)
    val scored = Seq("r_days" -> "r_q", "f" -> "f_q", "m_cents" -> "m_q")
      .foldLeft(base) { case (df, (metric, score)) =>
        Profile.cellRank(df, Seq("_all"), metric, Seq(keyCol))
          .withColumn(score, expr("(_rank - 1) * 4 DIV _n + 1"))
          .drop("_rank", "_n")
      }
    scored
      .withColumn("segment",
                  concat_ws("-", col("r_q"), col("f_q"), col("m_q")))
      .drop("_all")
  }
}
