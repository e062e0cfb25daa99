package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association mining: support / confidence / lift for
  * (antecedent → consequent) item-pair rules over per-entity item sets —
  * the classic co-occurrence statistic behind "users who X also Y",
  * feature co-activation audits, and event-type affinity reports.
  *
  * All three metrics are EXACT integer parts-per-million (cross-multiplied
  * counts, no float division), so every engine reproduces them bit-for-bit:
  *
  *   support_ppm(a→b)    = n_both · 1e6 DIV n_baskets
  *   confidence_ppm(a→b) = n_both · 1e6 DIV n_a
  *   lift_ppm(a→b)       = n_both · n_baskets · 1e6 DIV (n_a · n_b)
  *
  * The lift numerator is DECIMAL(38,0)-guarded: at corpus scale
  * n_both · n_baskets · 1e6 overflows BIGINT (1e9 pairs × 1e9 baskets × 1e6
  * ≈ 1e24), and Spark's IntegralDivide on decimals returns the exact BIGINT
  * quotient.
  *
  * Scale design (100 TB): the only fact-sized work is the (basket, item)
  * distinct — one hash exchange. The per-basket self-join runs inside each
  * basket's (small) item set; item counts and the basket total are
  * vocabulary-sized / single-row and explicitly broadcast. Nothing sorts.
  */
object Association {

  /** Directional rules for every unordered item pair that co-occurs in at
    * least one basket, both directions emitted. `minBaskets` drops
    * singleton noise pairs before the metric join.
    */
  def rules(df: DataFrame,
            basketCol: String,
            itemCol: String,
            minBaskets: Long = 1L): DataFrame = {
    val items = df.select(col(basketCol).as("_b"), col(itemCol).as("_i")).distinct()
    val itemCounts = items.groupBy(col("_i")).agg(count(lit(1)).as("_cnt"))
    val total = items.agg(count_distinct(col("_b")).as("_nb"))
    val pairs = items.as("a")
      .join(items.as("b"),
            col("a._b") === col("b._b") && col("a._i") < col("b._i"))
      .groupBy(col("a._i").as("_x"), col("b._i").as("_y"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= minBaskets)
    val directed = pairs
      .select(col("_x").as("antecedent"), col("_y").as("consequent"), col("n_both"))
      .unionAll(pairs.select(col("_y").as("antecedent"),
                             col("_x").as("consequent"), col("n_both")))
    directed
      .join(broadcast(itemCounts.select(col("_i").as("antecedent"),
                                        col("_cnt").as("_na"))), "antecedent")
      .join(broadcast(itemCounts.select(col("_i").as("consequent"),
                                        col("_cnt").as("_nc"))), "consequent")
      .join(broadcast(total))
      .withColumn("support_ppm", expr("n_both * 1000000L DIV _nb"))
      .withColumn("confidence_ppm", expr("n_both * 1000000L DIV _na"))
      .withColumn("lift_ppm", expr(
        "CAST(CAST(n_both AS DECIMAL(38,0)) * _nb * 1000000" +
          " DIV (CAST(_na AS DECIMAL(38,0)) * _nc) AS BIGINT)"))
      .select("antecedent", "consequent", "n_both",
              "support_ppm", "confidence_ppm", "lift_ppm")
  }
}
