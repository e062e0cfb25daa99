package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.Tables

/** Round-7 session-3 queries (q506+). Separate object: SparkEntry's,
  * R7Queries' and R8Queries' map builders sit near the JVM 64 KB
  * method-bytecode ceiling, so new surface accretes here and chains into
  * `SparkEntry.queries` / `oracleSql`.
  */
object R9Queries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q506_mann_whitney" -> ((s, dir) => {
      // Mann–Whitney U: the nonparametric two-arm readout (arm = hash
      // split, metric = user activity count — deliberately coarse so tie
      // groups are real). Integer double-ranks (2·min_rank + ties − 1)
      // make U exact: 2U_arm = Σdr_arm − 2·(n(n+1)/2) folds to
      // S − n(n+1), never negative, so every DIV is on non-negative
      // operands. Emits both arms' 2U (they must sum to 2·n_a·n_b — a
      // built-in self-check), the common-language effect size
      // P(A>B)+½P(=) in ppm (the statistic q442 meets as AUC, here in
      // its experiment-analysis role), and Σ(t³−t) — the tie term a
      // z-approximation needs, exact here where a float variance would
      // be partition-order-dependent. Rank windows are user-dimension-
      // sized (DimKey.one over the aggregated grain).
      val u = SparkEntry.ev(s, dir).groupBy(col("user_id"))
        .agg(count(lit(1)).as("v"))
        .withColumn("arm", col("user_id") % 2)
      val dr = (rank().over(Window.partitionBy(graft.functions.DimKey.one)
                   .orderBy(col("v"))) * 2 +
                 count(lit(1)).over(Window.partitionBy(col("v"))) - 1)
        .cast("long")
      val ties = u.groupBy(col("v")).agg(count(lit(1)).as("tt"))
        .agg(coalesce(sum(expr("tt * tt * tt - tt")), lit(0L))
               .as("tie_cubes"))
      u.withColumn("dr", dr)
        .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
             sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"),
             sum(when(col("arm") === 0, col("dr")).otherwise(0L)).as("_s_a"),
             sum(when(col("arm") === 1, col("dr")).otherwise(0L)).as("_s_b"))
        .crossJoin(broadcast(ties))
        .withColumn("u2_a", expr("_s_a - n_a * (n_a + 1)"))
        .withColumn("u2_b", expr("_s_b - n_b * (n_b + 1)"))
        .withColumn("cle_a_ppm",
          expr("(_s_a - n_a * (n_a + 1)) * 1000000L DIV (2L * n_a * n_b)"))
        .select("n_a", "n_b", "u2_a", "u2_b", "cle_a_ppm", "tie_cubes")
    }),
    "q507_kruskal_wallis" -> ((s, dir) => {
      // Kruskal–Wallis H: does event type explain daily volume? The
      // rank-based one-way ANOVA (η²'s nonparametric sibling, q502) over
      // the (type × day) cell relation — bounded by calendar × type, so
      // the pooled rank window is dimension-sized by construction.
      // Integer double-ranks again: 12·R_j² = 3·S_j², so
      // H·1000 = 3000·Σ(S_j² DIV n_j) DIV (n(n+1)) − 3000(n+1), floored
      // at 0 against truncation jitter (every DIV operand non-negative),
      // then the exact tie correction ×(n³−n)/(n³−n−Σ(t³−t)). S_j ≤
      // 2n·n_j keeps S² under 64 bits to ~40k cells — decades above any
      // calendar×type grid.
      val d = SparkEntry.ev(s, dir)
        .groupBy(col("event_type"),
                 expr("CAST(datediff(CAST(ts AS DATE)," +
                      " DATE '2024-01-01') AS BIGINT)").as("dd"))
        .agg(count(lit(1)).as("y"))
      val dr = (rank().over(Window.partitionBy(graft.functions.DimKey.one)
                   .orderBy(col("y"))) * 2 +
                 count(lit(1)).over(Window.partitionBy(col("y"))) - 1)
        .cast("long")
      val ties = d.groupBy(col("y")).agg(count(lit(1)).as("tt"))
        .agg(coalesce(sum(expr("tt * tt * tt - tt")), lit(0L))
               .as("tie_cubes"))
      d.withColumn("dr", dr)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_j"), sum(col("dr")).as("s_j"))
        .agg(sum(col("n_j")).as("n_cells"),
             sum(expr("s_j * s_j DIV n_j")).as("qsum"))
        .crossJoin(broadcast(ties))
        .withColumn("h_milli", expr(
          "greatest(3000L * qsum DIV (n_cells * (n_cells + 1))" +
            " - 3000L * (n_cells + 1), 0L)"))
        .withColumn("h_corr_milli", expr(
          """h_milli * (n_cells * n_cells * n_cells - n_cells)
            | DIV greatest(
            |   n_cells * n_cells * n_cells - n_cells - tie_cubes, 1L)"""
            .stripMargin))
        .select("n_cells", "qsum", "h_milli", "h_corr_milli", "tie_cubes")
    }),
    "q508_kendall_tau" -> ((s, dir) => {
      // Kendall τ-b between daily click and purchase volume: the
      // concordance-based correlation (Spearman q503's robust sibling —
      // τ counts pair inversions instead of squaring rank gaps, so one
      // wild day moves it by at most its pair count). The O(n²) pair
      // join is at DAY grain — n = calendar days, never corpus-sized, a
      // few hundred rows joined against themselves; the corpus only
      // flows through ONE combine-enabled daily rollup. τ² in ppm with
      // the exact τ-b tie denominators (pairs − ties_x)(pairs − ties_y)
      // plus the sign; (nc−nd)² keeps every DIV non-negative.
      val daily = SparkEntry.ev(s, dir)
        .groupBy(expr("CAST(datediff(CAST(ts AS DATE)," +
                      " DATE '2024-01-01') AS BIGINT)").as("d"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
               .as("x"),
             sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
               .as("y"))
        .localCheckpoint()
      val a = daily.select(col("d").as("da"), col("x").as("xa"),
                           col("y").as("ya"))
      val b = daily.select(col("d").as("db"), col("x").as("xb"),
                           col("y").as("yb"))
      val pairs = a.join(b, col("da") < col("db"))
        .agg(sum(when(expr("(xa - xb) * (ya - yb) > 0"), 1L).otherwise(0L))
               .as("nc"),
             sum(when(expr("(xa - xb) * (ya - yb) < 0"), 1L).otherwise(0L))
               .as("nd"))
      val base = daily.agg(count(lit(1)).as("n_days"),
                           expr("count(1) * (count(1) - 1) DIV 2")
                             .as("pairs"))
      val tx = daily.groupBy(col("x")).agg(count(lit(1)).as("tt"))
        .agg(coalesce(sum(expr("tt * (tt - 1) DIV 2")), lit(0L))
               .as("ties_x"))
      val ty = daily.groupBy(col("y")).agg(count(lit(1)).as("tt"))
        .agg(coalesce(sum(expr("tt * (tt - 1) DIV 2")), lit(0L))
               .as("ties_y"))
      pairs.crossJoin(broadcast(base)).crossJoin(broadcast(tx))
        .crossJoin(broadcast(ty))
        .withColumn("taub2_ppm", expr(
          """(nc - nd) * (nc - nd) * 1000000L
            | DIV greatest((pairs - ties_x) * (pairs - ties_y), 1L)"""
            .stripMargin))
        .withColumn("tau_sign", signum(col("nc") - col("nd")).cast("int"))
        .select("n_days", "nc", "nd", "pairs", "ties_x", "ties_y",
                "taub2_ppm", "tau_sign")
    }),
    "q509_mcnemar" -> ((s, dir) => {
      // McNemar paired-classifier audit: two return-risk heuristics
      // (price threshold vs priority class) scored on the SAME orders —
      // the test that knows paired predictions share their easy cases,
      // so only the DISCORDANT cells b (A right, B wrong) and c (A
      // wrong, B right) carry signal; accuracy deltas alone overstate
      // certainty. Label = order has a returned lineitem (one
      // combine-enabled max per orderkey, then an equi-join — never a
      // per-order subquery). χ²_McNemar·1000 = 1000(b−c)²/(b+c), exact
      // integer, plus both marginal accuracies in ppm.
      val ret = Tables.read(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(max(when(col("l_returnflag") === "R", 1L).otherwise(0L))
               .as("y0"))
      val lab = Tables.read(s, dir, "orders")
        .join(ret, col("o_orderkey") === col("l_orderkey"), "left")
        .withColumn("y", coalesce(col("y0"), lit(0L)))
        .withColumn("pa",
          when(expr("CAST(floor(o_totalprice * 100) AS BIGINT)") >=
                 15000000L, 1L).otherwise(0L))
        .withColumn("pb",
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L))
      lab.agg(
          sum(when(col("pa") === col("y") && col("pb") === col("y"), 1L)
                .otherwise(0L)).as("both_right"),
          sum(when(col("pa") === col("y") && col("pb") =!= col("y"), 1L)
                .otherwise(0L)).as("b_only_a"),
          sum(when(col("pa") =!= col("y") && col("pb") === col("y"), 1L)
                .otherwise(0L)).as("c_only_b"),
          sum(when(col("pa") =!= col("y") && col("pb") =!= col("y"), 1L)
                .otherwise(0L)).as("both_wrong"),
          count(lit(1)).as("_n"))
        .withColumn("chi2_milli", expr(
          """1000L * (b_only_a - c_only_b) * (b_only_a - c_only_b)
            | DIV greatest(b_only_a + c_only_b, 1L)""".stripMargin))
        .withColumn("acc_a_ppm",
          expr("(both_right + b_only_a) * 1000000L DIV _n"))
        .withColumn("acc_b_ppm",
          expr("(both_right + c_only_b) * 1000000L DIV _n"))
        .select("both_right", "b_only_a", "c_only_b", "both_wrong",
                "chi2_milli", "acc_a_ppm", "acc_b_ppm")
    }),
    "q510_odds_ratio" -> ((s, dir) => {
      // Odds ratio + relative risk in ppm: does the BUILDING segment
      // place urgent orders disproportionately? The 2×2 epidemiology
      // pair (OR = ad/bc, RR = [a/(a+b)]/[c/(c+d)]) that every
      // cohort-vs-exposure readout reports — exact integers, a·d ≤
      // orders² bounded to 64 bits past 10⁹ orders with the ×1e6 fold.
      // Customer dim broadcast onto the fact: one pass, no shuffle on
      // the orders side beyond the final scalar aggregate.
      val cust = Tables.read(s, dir, "customer")
        .select(col("c_custkey"),
                when(col("c_mktsegment") === "BUILDING", 1L).otherwise(0L)
                  .as("ex"))
      Tables.read(s, dir, "orders")
        .select(col("o_custkey"),
                when(col("o_orderpriority") === "1-URGENT", 1L)
                  .otherwise(0L).as("oc"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .agg(sum(when(col("ex") === 1 && col("oc") === 1, 1L)
                   .otherwise(0L)).as("a"),
             sum(when(col("ex") === 1 && col("oc") === 0, 1L)
                   .otherwise(0L)).as("b"),
             sum(when(col("ex") === 0 && col("oc") === 1, 1L)
                   .otherwise(0L)).as("c"),
             sum(when(col("ex") === 0 && col("oc") === 0, 1L)
                   .otherwise(0L)).as("d"))
        .withColumn("odds_ratio_ppm",
          expr("a * d * 1000000L DIV greatest(b * c, 1L)"))
        .withColumn("rel_risk_ppm",
          expr("a * (c + d) * 1000000L DIV greatest(c * (a + b), 1L)"))
        .select("a", "b", "c", "d", "odds_ratio_ppm", "rel_risk_ppm")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q506_mann_whitney" ->
      s"""WITH ${SparkEntry.SrcCte},
         |u AS (SELECT user_id, user_id % 2 AS arm,
         |    CAST(count(*) AS BIGINT) AS v FROM src GROUP BY 1, 2),
         |r AS (SELECT arm, CAST(2 * rank() OVER (ORDER BY v)
         |      + count(*) OVER (PARTITION BY v) - 1 AS BIGINT) AS dr
         |  FROM u),
         |t AS (SELECT CAST(coalesce(sum(tt * tt * tt - tt), 0) AS BIGINT)
         |    AS tie_cubes
         |  FROM (SELECT count(*) AS tt FROM u GROUP BY v)),
         |g AS (SELECT
         |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_a,
         |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_b,
         |    CAST(sum(CASE WHEN arm = 0 THEN dr ELSE 0 END) AS BIGINT)
         |      AS s_a,
         |    CAST(sum(CASE WHEN arm = 1 THEN dr ELSE 0 END) AS BIGINT)
         |      AS s_b
         |  FROM r)
         |SELECT n_a, n_b,
         |  CAST(s_a - n_a * (n_a + 1) AS BIGINT) AS u2_a,
         |  CAST(s_b - n_b * (n_b + 1) AS BIGINT) AS u2_b,
         |  CAST((s_a - n_a * (n_a + 1)) * 1000000 // (2 * n_a * n_b)
         |    AS BIGINT) AS cle_a_ppm,
         |  t.tie_cubes
         |FROM g, t""".stripMargin,
    "q507_kruskal_wallis" ->
      s"""WITH ${SparkEntry.SrcCte},
         |d AS (SELECT event_type,
         |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
         |      AS BIGINT) AS dd,
         |    CAST(count(*) AS BIGINT) AS y FROM src GROUP BY 1, 2),
         |r AS (SELECT event_type, CAST(2 * rank() OVER (ORDER BY y)
         |      + count(*) OVER (PARTITION BY y) - 1 AS BIGINT) AS dr
         |  FROM d),
         |t AS (SELECT CAST(coalesce(sum(tt * tt * tt - tt), 0) AS BIGINT)
         |    AS tie_cubes
         |  FROM (SELECT count(*) AS tt FROM d GROUP BY y)),
         |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_j,
         |    CAST(sum(dr) AS BIGINT) AS s_j FROM r GROUP BY 1),
         |a AS (SELECT CAST(sum(n_j) AS BIGINT) AS n_cells,
         |    CAST(sum(s_j * s_j // n_j) AS BIGINT) AS qsum FROM g),
         |h AS (SELECT n_cells, qsum,
         |    greatest(3000 * qsum // (n_cells * (n_cells + 1))
         |      - 3000 * (n_cells + 1), 0) AS h_milli FROM a)
         |SELECT h.n_cells, h.qsum, CAST(h.h_milli AS BIGINT) AS h_milli,
         |  CAST(h.h_milli * (h.n_cells * h.n_cells * h.n_cells - h.n_cells)
         |    // greatest(h.n_cells * h.n_cells * h.n_cells - h.n_cells
         |      - t.tie_cubes, 1) AS BIGINT) AS h_corr_milli,
         |  t.tie_cubes
         |FROM h, t""".stripMargin,
    "q508_kendall_tau" ->
      s"""WITH ${SparkEntry.SrcCte},
         |daily AS MATERIALIZED (SELECT
         |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
         |      AS BIGINT) AS d,
         |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS x,
         |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS y
         |  FROM src GROUP BY 1),
         |p AS (SELECT
         |    CAST(sum(CASE WHEN (a.x - b.x) * (a.y - b.y) > 0
         |      THEN 1 ELSE 0 END) AS BIGINT) AS nc,
         |    CAST(sum(CASE WHEN (a.x - b.x) * (a.y - b.y) < 0
         |      THEN 1 ELSE 0 END) AS BIGINT) AS nd
         |  FROM daily a JOIN daily b ON a.d < b.d),
         |n0 AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
         |    CAST(count(*) * (count(*) - 1) // 2 AS BIGINT) AS pairs
         |  FROM daily),
         |tx AS (SELECT CAST(coalesce(sum(tt * (tt - 1) // 2), 0) AS BIGINT)
         |    AS ties_x FROM (SELECT count(*) AS tt FROM daily GROUP BY x)),
         |ty AS (SELECT CAST(coalesce(sum(tt * (tt - 1) // 2), 0) AS BIGINT)
         |    AS ties_y FROM (SELECT count(*) AS tt FROM daily GROUP BY y))
         |SELECT n0.n_days, p.nc, p.nd, n0.pairs, tx.ties_x, ty.ties_y,
         |  CAST((p.nc - p.nd) * (p.nc - p.nd) * 1000000
         |    // greatest((n0.pairs - tx.ties_x) * (n0.pairs - ty.ties_y),
         |         1) AS BIGINT) AS taub2_ppm,
         |  CAST(sign(p.nc - p.nd) AS INT) AS tau_sign
         |FROM p, n0, tx, ty""".stripMargin,
    "q509_mcnemar" ->
      """WITH ret AS (SELECT l_orderkey,
        |    max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS y0
        |  FROM lineitem GROUP BY 1),
        |lab AS (SELECT
        |    CAST(coalesce(r.y0, 0) AS BIGINT) AS y,
        |    CASE WHEN CAST(floor(o.o_totalprice * 100) AS BIGINT)
        |      >= 15000000 THEN 1 ELSE 0 END AS pa,
        |    CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END AS pb
        |  FROM orders o LEFT JOIN ret r ON o.o_orderkey = r.l_orderkey),
        |g AS (SELECT
        |    CAST(sum(CASE WHEN pa = y AND pb = y THEN 1 ELSE 0 END)
        |      AS BIGINT) AS both_right,
        |    CAST(sum(CASE WHEN pa = y AND pb <> y THEN 1 ELSE 0 END)
        |      AS BIGINT) AS b_only_a,
        |    CAST(sum(CASE WHEN pa <> y AND pb = y THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c_only_b,
        |    CAST(sum(CASE WHEN pa <> y AND pb <> y THEN 1 ELSE 0 END)
        |      AS BIGINT) AS both_wrong,
        |    CAST(count(*) AS BIGINT) AS n FROM lab)
        |SELECT both_right, b_only_a, c_only_b, both_wrong,
        |  CAST(1000 * (b_only_a - c_only_b) * (b_only_a - c_only_b)
        |    // greatest(b_only_a + c_only_b, 1) AS BIGINT) AS chi2_milli,
        |  CAST((both_right + b_only_a) * 1000000 // n AS BIGINT)
        |    AS acc_a_ppm,
        |  CAST((both_right + c_only_b) * 1000000 // n AS BIGINT)
        |    AS acc_b_ppm
        |FROM g""".stripMargin,
    "q510_odds_ratio" ->
      """WITH j AS (SELECT
        |    CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS ex,
        |    CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
        |      AS oc
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |g AS (SELECT
        |    CAST(sum(CASE WHEN ex = 1 AND oc = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN ex = 1 AND oc = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN ex = 0 AND oc = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN ex = 0 AND oc = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS d FROM j)
        |SELECT a, b, c, d,
        |  CAST(a * d * 1000000 // greatest(b * c, 1) AS BIGINT)
        |    AS odds_ratio_ppm,
        |  CAST(a * (c + d) * 1000000 // greatest(c * (a + b), 1)
        |    AS BIGINT) AS rel_risk_ppm
        |FROM g""".stripMargin
  )
}
