package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    // All three metrics rank in ONE cellRank pass: stack (metric, value)
    // rows (3× the entity count — still dimension-sized) and rank with
    // group = (_all, metric), then pivot the quartiles back per entity.
    // Sequentially folding three cellRank calls re-exchanged the same
    // rollup three times (q229 spent 5 s on a 15 k-row relation in pure
    // stage overhead); per-metric bounds come from cellRank's per-group
    // bounds, so cents (1e7 range) and day counts (1e2) each use their
    // own micro-cell grid.
    val stacked = base.select(col(keyCol), col("_all"), explode(array(
        struct(lit("r").as("_m"), col("r_days").as("_v")),
        struct(lit("f").as("_m"), col("f").as("_v")),
        struct(lit("m").as("_m"), col("m_cents").as("_v")))).as("_mv"))
      .select(col(keyCol), col("_all"),
              col("_mv._m").as("_m"), col("_mv._v").as("_v"))
    val ranked = Profile
      .cellRank(stacked, Seq("_all", "_m"), "_v", Seq(keyCol))
      .withColumn("_q", expr("(_rank - 1) * 4 DIV _n + 1"))
    def pick(m: String, as: String)(c: Column) =
      max(when(col("_m") === m, c)).as(as)
    ranked.groupBy(col(keyCol))
      .agg(pick("r", "r_days")(col("_v")), pick("f", "f")(col("_v")),
           pick("m", "m_cents")(col("_v")), pick("r", "r_q")(col("_q")),
           pick("f", "f_q")(col("_q")), pick("m", "m_q")(col("_q")))
      .withColumn("segment",
                  concat_ws("-", col("r_q"), col("f_q"), col("m_q")))
  }
}
