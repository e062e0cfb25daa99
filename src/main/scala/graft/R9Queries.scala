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
    }),
    "q511_moods_median" -> ((s, dir) => {
      // Mood's median test: split per-user activity at the EXACT global
      // median (k-th order statistic via cellRank, no float percentile)
      // and χ²-test the above/at-or-below counts across the two hash
      // arms — the median-based sibling of Mann-Whitney (q506), robust
      // to the heavy right tail activity counts always have. χ²·1000 as
      // ONE division with a DECIMAL(38,0) numerator (DuckDB HUGEINT on
      // the oracle side): (ad−bc)²·n·1000 caps at ~62·n⁵, inside 38
      // digits to ~4·10⁷ users; the previous int64 interleave wrapped
      // silently at ~10⁵ (round-8 advice). Non-negative throughout, so
      // floor (//) and truncate (DIV) agree.
      val u = SparkEntry.ev(s, dir).groupBy(col("user_id"))
        .agg(count(lit(1)).as("v"))
      val ranked = Profile.cellRank(
        u.withColumn("_all", graft.functions.DimKey.one),
        Seq("_all"), "v", Seq("user_id"))
      val med = ranked.filter(col("_rank") === expr("(_n + 1) DIV 2"))
        .select(col("v").as("med_v"))
      u.crossJoin(broadcast(med))
        .agg(first(col("med_v")).as("med_v"),
             sum(when(col("user_id") % 2 === 0 && col("v") > col("med_v"),
                      1L).otherwise(0L)).as("a"),
             sum(when(col("user_id") % 2 === 0 && col("v") <= col("med_v"),
                      1L).otherwise(0L)).as("b"),
             sum(when(col("user_id") % 2 === 1 && col("v") > col("med_v"),
                      1L).otherwise(0L)).as("c"),
             sum(when(col("user_id") % 2 === 1 && col("v") <= col("med_v"),
                      1L).otherwise(0L)).as("d"),
             count(lit(1)).as("n"))
        .withColumn("chi2_milli", expr(
          "CAST((CAST(a AS DECIMAL(38,0))*d - CAST(b AS DECIMAL(38,0))*c)" +
            " * (CAST(a AS DECIMAL(38,0))*d - CAST(b AS DECIMAL(38,0))*c)" +
            " * n * 1000" +
            " DIV (CAST(a+b AS DECIMAL(38,0)) * (c+d) * (a+c) * (b+d))" +
            " AS BIGINT)"))
        .select("med_v", "a", "b", "c", "d", "chi2_milli")
    }),
    "q512_lorenz" -> ((s, dir) => {
      // Lorenz curve by spend decile: the distribution behind q181's
      // Gini scalar — per-decile customer spend share and the cumulative
      // curve, all exact (deciles from cellRank's exact ranks, shares as
      // cents·1e6 DIV total so both engines truncate identically; the
      // cumulative is summed in CENTS first, one DIV at the end — summing
      // truncated ppm terms would drift). Rank window decomposed by
      // micro-cell; everything after the rollup is decile-sized.
      val spend = Tables.spread(s, Tables.read(s, dir, "orders"))
        .groupBy(col("o_custkey"))
        .agg(sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
               .as("cents"))
      val ranked = Profile.cellRank(
        spend.withColumn("_all", graft.functions.DimKey.one),
        Seq("_all"), "cents", Seq("o_custkey"))
      val tot = spend.agg(sum(col("cents")).as("_total"))
      val wCum = org.apache.spark.sql.expressions.Window
        .partitionBy(graft.functions.DimKey.one).orderBy(col("decile"))
      ranked
        .withColumn("decile", expr("(_rank - 1) * 10 DIV _n"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_cust"), sum(col("cents")).as("sum_cents"))
        .crossJoin(broadcast(tot))
        .withColumn("share_ppm", expr("sum_cents * 1000000L DIV _total"))
        .withColumn("cum_cents", sum(col("sum_cents")).over(wCum))
        .withColumn("cum_share_ppm", expr("cum_cents * 1000000L DIV _total"))
        .select("decile", "n_cust", "sum_cents", "share_ppm",
                "cum_share_ppm")
    }),
    "q513_cramers_v" -> ((s, dir) => {
      // Cramér's V² for (market segment × region): the normalized
      // association strength that makes χ² comparable across table
      // shapes — V² = χ²/(n·min(r−1,c−1)), here both emitted as pinned
      // integers (per-cell (o·n − row·col)²·1000 DIV (n·row·col), summed;
      // margins broadcast onto the 25-cell relation). The per-cell
      // numerator runs in DECIMAL(38,0)/HUGEINT — (o·n − rn·cn)² ≤ n⁴, so
      // 38 digits hold to ~3·10⁸ customers where int64 wrapped at ~10⁵
      // (round-8 advice). Completes the categorical tier beside kappa
      // (q492) and the 2×2 tests.
      val j = Tables.read(s, dir, "customer")
        .join(broadcast(Tables.read(s, dir, "nation")),
              col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.read(s, dir, "region")),
              col("n_regionkey") === col("r_regionkey"))
        .select(col("c_mktsegment").as("seg"), col("r_name").as("reg"))
      val o = j.groupBy(col("seg"), col("reg"))
        .agg(count(lit(1)).as("o"))
      val mr = o.groupBy(col("seg")).agg(sum(col("o")).as("rn"))
      val mc = o.groupBy(col("reg")).agg(sum(col("o")).as("cn"))
      val t = o.agg(sum(col("o")).as("n"))
      o.join(broadcast(mr), Seq("seg")).join(broadcast(mc), Seq("reg"))
        .crossJoin(broadcast(t))
        .withColumn("term_milli", expr(
          "CAST((CAST(o AS DECIMAL(38,0)) * n - CAST(rn AS DECIMAL(38,0)) * cn)" +
            " * (CAST(o AS DECIMAL(38,0)) * n - CAST(rn AS DECIMAL(38,0)) * cn)" +
            " * 1000 DIV (CAST(n AS DECIMAL(38,0)) * rn * cn) AS BIGINT)"))
        .agg(first(col("n")).as("n"),
             sum(col("term_milli")).as("chi2_milli"))
        .withColumn("v2_ppm", expr("chi2_milli * 1000 DIV (n * 4)"))
        .select("n", "chi2_milli", "v2_ppm")
    }),
    "q514_cochran_armitage" -> ((s, dir) => {
      // Cochran-Armitage trend test: does the high-value-order rate move
      // MONOTONICALLY with priority level (ordered 0..4)? T = Σw(x_k·N −
      // n_k·X) with the exact median-cents outcome split; z²·1000 as ONE
      // division with a DECIMAL(38,0)/HUGEINT numerator — |T|²·1000 ≤
      // 1.6·10⁴·n⁴ holds 38 digits to ~5·10⁸ orders (the previous
      // (|T| DIV 1000)² prescale wrapped at ~10⁶-10⁷ orders and shed
      // three digits of precision; round-8 advice). abs BEFORE the
      // square so both engines see the same non-negative operands, and
      // interleaved variance divisors E1 = X(N−X) DIV N,
      // E2 = (NΣw²n − (Σwn)²) DIV N stay int64 (≤ 16n each). The ordered
      // complement of the unordered χ² tests — catches dose-response the
      // 2×k χ² dilutes.
      val o = Tables.spread(s, Tables.read(s, dir, "orders"))
        .select((substring(col("o_orderpriority"), 1, 1).cast("long") - 1)
                  .as("w"),
                expr("CAST(floor(o_totalprice * 100) AS BIGINT)")
                  .as("cents"),
                col("o_orderkey"))
      val ranked = Profile.cellRank(
        o.withColumn("_all", graft.functions.DimKey.one),
        Seq("_all"), "cents", Seq("o_orderkey"))
      val med = ranked.filter(col("_rank") === expr("(_n + 1) DIV 2"))
        .select(col("cents").as("med"))
      val lv = o.crossJoin(broadcast(med))
        .groupBy(col("w"))
        .agg(count(lit(1)).as("n_k"),
             sum(when(col("cents") > col("med"), 1L).otherwise(0L))
               .as("x_k"))
      lv.agg(sum(col("n_k")).as("n"), sum(col("x_k")).as("x"),
             sum(col("w") * col("n_k")).as("swn"),
             sum(col("w") * col("w") * col("n_k")).as("sw2n"),
             sum(col("w") * col("x_k")).as("swx"))
        .withColumn("t_abs", abs(col("swx") * col("n") -
                                 col("swn") * col("x")))
        .withColumn("t_sign",
                    when(col("swx") * col("n") - col("swn") * col("x")
                           >= 0, 1L).otherwise(-1L))
        .withColumn("e1", expr("x * (n - x) DIV n"))
        .withColumn("e2", expr("(n * sw2n - swn * swn) DIV n"))
        .withColumn("z2_milli", expr(
          "CAST(CAST(t_abs AS DECIMAL(38,0)) * t_abs * 1000" +
            " DIV (CAST(e1 AS DECIMAL(38,0)) * e2) AS BIGINT)"))
        .select("n", "x", "t_abs", "t_sign", "e1", "e2", "z2_milli")
    }),
    "q515_nelson_aalen" -> ((s, dir) => {
      // Nelson-Aalen cumulative hazard for days-to-first-purchase, with
      // non-purchasers right-censored at the horizon. Each term
      // d_t·1e6 DIV n_risk(t) is pinned individually and the cumulative
      // is a SUM of those integers — the estimator whose per-term
      // truncation both engines reproduce exactly, where Kaplan-Meier's
      // survival PRODUCT would compound truncation unpredictably. The
      // risk set is a suffix count over the (dimension-sized) distinct
      // follow-up times — no per-user window, no correlated subquery.
      val ev = SparkEntry.ev(s, dir)
      val epoch = lit("1970-01-01").cast("date")
      val u = ev.groupBy(col("user_id"))
        .agg(datediff(to_date(min(col("ts"))), epoch).cast("long").as("f"),
             datediff(to_date(min(when(col("event_type") === "purchase",
                                       col("ts")))), epoch).cast("long")
               .as("p"))
      val h = ev.agg(datediff(to_date(max(col("ts"))), epoch).cast("long")
                       .as("maxd"))
      val tt = u.crossJoin(broadcast(h))
        .withColumn("tau", coalesce(col("p") - col("f"),
                                    col("maxd") - col("f")))
        .withColumn("is_event", col("p").isNotNull)
      val wSuffix = org.apache.spark.sql.expressions.Window
        .partitionBy(graft.functions.DimKey.one)
        .orderBy(col("tau").desc)
        .rowsBetween(org.apache.spark.sql.expressions.Window
                       .unboundedPreceding, 0)
      val wCum = org.apache.spark.sql.expressions.Window
        .partitionBy(graft.functions.DimKey.one).orderBy(col("t"))
      tt.groupBy(col("tau"))
        .agg(count(lit(1)).as("_all_cnt"),
             sum(when(col("is_event"), 1L).otherwise(0L)).as("d"))
        .withColumn("n_risk", sum(col("_all_cnt")).over(wSuffix))
        .filter(col("d") > 0)
        .select(col("tau").as("t"), col("d"), col("n_risk"))
        .withColumn("h_term_ppm", expr("d * 1000000L DIV n_risk"))
        .withColumn("h_cum_ppm", sum(col("h_term_ppm")).over(wCum))
    }),
    "q516_dow_seasonality" -> ((s, dir) => {
      // Day-of-week seasonal index: per-weekday mean daily volume over
      // the all-days mean, in ppm. Weekday id = days-since-epoch mod 7
      // (0 = Thursday) — pure integer arithmetic both engines share,
      // instead of dayofweek() whose numbering differs across engines.
      // One fact-sized daily rollup; everything after is 7 rows.
      val dly = SparkEntry.ev(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("dow_id",
          (datediff(col("day"), lit("1970-01-01").cast("date")) % 7)
            .cast("long"))
      val tot = dly.agg(sum(col("cnt")).as("total"),
                        count(lit(1)).as("n_days"))
      dly.groupBy(col("dow_id"))
        .agg(count(lit(1)).as("n_days_dow"), sum(col("cnt")).as("n_events"))
        .crossJoin(broadcast(tot))
        .withColumn("index_ppm",
          expr("n_events * n_days * 1000000L DIV (n_days_dow * total)"))
        .select("dow_id", "n_days_dow", "n_events", "index_ppm")
    }),
    "q517_schema_evolution" -> ((s, dir) => {
      // Schema evolution across snapshot versions: v2 adds a column v1
      // never had, and the cross-version history read resolves by NAME
      // with missing columns null-filled (unionByName allowMissing — the
      // mergeSchema discipline), so old snapshots stay readable after
      // the table grows columns. The lakehouse complement of the SCD
      // engine's onSchemaChange contract.
      val tmp = java.nio.file.Files.createTempDirectory("q517_evo")
        .toString + "/t"
      def roll(yr: Int) = Tables.read(s, dir, "orders")
        .filter(year(col("o_orderdate")) === yr)
        .groupBy(col("o_orderpriority").as("prio"))
        .agg(sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
               .as("cents"))
      VersionedTable.publish(s, roll(1996), tmp)
      VersionedTable.publish(
        s, Tables.read(s, dir, "orders")
          .filter(year(col("o_orderdate")) === 1997)
          .groupBy(col("o_orderpriority").as("prio"))
          .agg(sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
                 .as("cents"),
               count(lit(1)).as("n_orders")), tmp)
      val v1 = VersionedTable.readVersion(s, tmp, 1L)
        .withColumn("version", lit(1L))
      val v2 = VersionedTable.readVersion(s, tmp, 2L)
        .withColumn("version", lit(2L))
      v1.unionByName(v2, allowMissingColumns = true)
        .select("version", "prio", "cents", "n_orders")
    }),
    "q518_table_history" -> ((s, dir) => {
      // Table history as a relation (the DESCRIBE HISTORY analog): two
      // stamped snapshot publishes, then a STAMPED deletion-vector
      // commit — history must show the DV's own stamp AND full versions'
      // effective stamps, plus each version's physical row count
      // (key-list rows for the DV, snapshot rows otherwise). Exercises
      // the crash-safe stamp-before-commit path and DV stamp visibility
      // end-to-end against literal expectations.
      val tmp = java.nio.file.Files.createTempDirectory("q518_hist")
        .toString + "/t"
      def roll(maxYear: Int) = Tables.read(s, dir, "orders")
        .filter(year(col("o_orderdate")) < maxYear)
        .groupBy(col("o_orderpriority").as("prio"))
        .agg(sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
               .as("cents"))
      VersionedTable.publishStamped(s, roll(1997), tmp, 1000L)
      VersionedTable.publishStamped(s, roll(1999), tmp, 2000L)
      VersionedTable.publishDelete(
        s, VersionedTable.read(s, tmp)
          .filter(col("prio") === "5-LOW").select(col("prio")),
        tmp, stampMillis = Some(2500L))
      VersionedTable.history(s, tmp)
    }),
    "q519_union_pushdown" -> ((s, dir) => {
      // Filter pushdown THROUGH a union, pinned in the gate: a predicate
      // over unionByName of two parquet scans must reach BOTH scans'
      // PushedFilters (Catalyst's PushDownPredicates through Union) —
      // the property that keeps a multi-source read from scanning either
      // side fully at 100 TB. Values + the plan boolean driver-checked.
      val base = java.nio.file.Files.createTempDirectory("q519_up")
        .toString
      val o = Tables.read(s, dir, "orders")
      o.filter(year(col("o_orderdate")) < 1997)
        .write.mode("overwrite").parquet(s"$base/p1")
      o.filter(year(col("o_orderdate")) >= 1997)
        .write.mode("overwrite").parquet(s"$base/p2")
      val u = s.read.parquet(s"$base/p1")
        .unionByName(s.read.parquet(s"$base/p2"))
        .filter(col("o_orderpriority") === "1-URGENT")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
             sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
               .as("cents"))
      val ps = graft.plans.PlanContract.planString(u)
      val pushedBoth =
        "EqualTo\\(o_orderpriority,1-URGENT\\)".r
          .findAllMatchIn(ps).length >= 2
      u.withColumn("pushed_both_scans", lit(pushedBoth))
    }),
    "q520_bucketed_join" -> ((s, dir) => {
      // Spark-native bucketed tables (bucketBy + saveAsTable): both sides
      // bucketed 8-way on the join key, so the SMJ reads co-located
      // buckets and the join plans with ZERO Exchange — the storage-level
      // co-location lever (the engine's own _scd2_bucket layout is the
      // same discipline on plain parquet; this pins Spark's catalog
      // variant). Broadcast disabled inside the probe so the contract
      // tests the bucketed SMJ, not a broadcast bailout; conf + tables
      // restored/dropped in finally.
      import graft.plans.PlanContract
      val tag = java.util.UUID.randomUUID.toString.replace("-", "")
      val ct = s"q520_c_$tag"
      val ot = s"q520_o_$tag"
      val oldThresh = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        Tables.read(s, dir, "customer")
          .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
          .saveAsTable(ct)
        Tables.read(s, dir, "orders")
          .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
          .saveAsTable(ot)
        val j = s.table(ot).join(s.table(ct),
                                 col("o_custkey") === col("c_custkey"))
        val colocated = PlanContract.count(j, "Exchange") == 0 &&
          PlanContract.count(j, "SortMergeJoin") == 1
        // eager checkpoint: the result must materialize BEFORE finally
        // drops the catalog tables it reads (queries return lazily)
        j.groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_orders"),
               sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
                 .as("cents"))
          .withColumn("join_no_shuffle", lit(colocated))
          .localCheckpoint()
      } finally {
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThresh)
        s.sql(s"DROP TABLE IF EXISTS $ct")
        s.sql(s"DROP TABLE IF EXISTS $ot")
      }
    }),
    "q521_kmv_sketch" -> ((s, dir) => {
      // KMV distinct sketches with EXACT cross-engine arithmetic: per
      // event type the k=64 smallest md5-prefix user hashes (both
      // engines hash identically, so unlike HLL the sketch itself
      // hash-compares), estimate (k−1)·2³² DIV h_k; pairwise UNION
      // sketches merge as k-min of the union and intersections follow by
      // inclusion-exclusion — the mergeable distinct-counting algebra
      // that replaces global COUNT(DISTINCT) at 100 TB. Sets = customers
      // per order priority (~86% pairwise overlap — real intersection
      // structure); pair spine is 10 rows broadcast onto the distinct
      // (priority, customer) relation; rank selection via cellRank (no
      // whole-set sort).
      val uh = Tables.spread(s, Tables.read(s, dir, "orders"))
        .select(col("o_orderpriority").as("set_id"),
                col("o_custkey").as("elem")).distinct()
        .localCheckpoint(false)
      val per = Sketches.kmvSketch(uh, Seq("set_id"), "elem", 64)
      val types = uh.select(col("set_id")).distinct()
      val pr = types.select(col("set_id").as("t1"))
        .join(types.select(col("set_id").as("t2")),
              col("t1") < col("t2"))
      val u2 = broadcast(pr)
        .join(uh, col("set_id") === col("t1") ||
                  col("set_id") === col("t2"))
        .select(col("t1"), col("t2"), col("elem")).distinct()
      val un = Sketches.kmvSketch(u2, Seq("t1", "t2"), "elem", 64)
        .select(col("t1"), col("t2"), col("est_distinct").as("est_union"))
      un.join(broadcast(per.select(col("set_id").as("t1"),
                                   col("est_distinct").as("est_a"))),
              Seq("t1"))
        .join(broadcast(per.select(col("set_id").as("t2"),
                                   col("est_distinct").as("est_b"))),
              Seq("t2"))
        .withColumn("est_intersect",
                    col("est_a") + col("est_b") - col("est_union"))
        .select("t1", "t2", "est_a", "est_b", "est_union", "est_intersect")
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
        |FROM g""".stripMargin,
    "q511_moods_median" ->
      s"""WITH ${SparkEntry.SrcCte},
         |u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS v
         |  FROM src GROUP BY 1),
         |r AS (SELECT *, row_number() OVER (ORDER BY v, user_id) AS rk,
         |        count(*) OVER () AS n FROM u),
         |m AS (SELECT v AS med_v FROM r WHERE rk = (n + 1) // 2),
         |g AS (SELECT
         |  CAST(sum(CASE WHEN user_id % 2 = 0 AND v > med_v
         |    THEN 1 ELSE 0 END) AS BIGINT) AS a,
         |  CAST(sum(CASE WHEN user_id % 2 = 0 AND v <= med_v
         |    THEN 1 ELSE 0 END) AS BIGINT) AS b,
         |  CAST(sum(CASE WHEN user_id % 2 = 1 AND v > med_v
         |    THEN 1 ELSE 0 END) AS BIGINT) AS c,
         |  CAST(sum(CASE WHEN user_id % 2 = 1 AND v <= med_v
         |    THEN 1 ELSE 0 END) AS BIGINT) AS d,
         |  CAST(count(*) AS BIGINT) AS n FROM u, m)
         |SELECT (SELECT med_v FROM m) AS med_v, a, b, c, d,
         |  CAST((CAST(a AS HUGEINT)*d - CAST(b AS HUGEINT)*c)
         |     * (CAST(a AS HUGEINT)*d - CAST(b AS HUGEINT)*c) * n * 1000
         |     // (CAST(a+b AS HUGEINT) * (c+d) * (a+c) * (b+d))
         |     AS BIGINT) AS chi2_milli
         |FROM g""".stripMargin,
    "q512_lorenz" ->
      """WITH s AS (SELECT o_custkey,
        |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |r AS (SELECT *, row_number() OVER (ORDER BY cents, o_custkey)
        |        AS rk, count(*) OVER () AS n,
        |        CAST(sum(cents) OVER () AS BIGINT) AS total FROM s),
        |d AS (SELECT (rk - 1) * 10 // n AS decile,
        |        CAST(count(*) AS BIGINT) AS n_cust,
        |        CAST(sum(cents) AS BIGINT) AS sum_cents,
        |        max(total) AS total FROM r GROUP BY 1)
        |SELECT decile, n_cust, sum_cents,
        |  CAST(sum_cents * 1000000 // total AS BIGINT) AS share_ppm,
        |  CAST(sum(sum_cents) OVER (ORDER BY decile) * 1000000 // total
        |    AS BIGINT) AS cum_share_ppm
        |FROM d""".stripMargin,
    "q513_cramers_v" ->
      """WITH j AS (SELECT c.c_mktsegment AS seg, r.r_name AS reg
        |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey),
        |o AS (SELECT seg, reg, CAST(count(*) AS BIGINT) AS o
        |  FROM j GROUP BY 1, 2),
        |mr AS (SELECT seg, CAST(sum(o) AS BIGINT) AS rn FROM o GROUP BY 1),
        |mc AS (SELECT reg, CAST(sum(o) AS BIGINT) AS cn FROM o GROUP BY 1),
        |t AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM o),
        |cell AS (SELECT
        |    CAST((CAST(o.o AS HUGEINT) * t.n - CAST(mr.rn AS HUGEINT) * mc.cn)
        |      * (CAST(o.o AS HUGEINT) * t.n - CAST(mr.rn AS HUGEINT) * mc.cn)
        |      * 1000 // (CAST(t.n AS HUGEINT) * mr.rn * mc.cn)
        |      AS BIGINT) AS term_milli
        |  FROM o JOIN mr USING (seg) JOIN mc USING (reg), t)
        |SELECT (SELECT n FROM t) AS n,
        |  CAST(sum(term_milli) AS BIGINT) AS chi2_milli,
        |  CAST(sum(term_milli) * 1000 // ((SELECT n FROM t) * 4)
        |    AS BIGINT) AS v2_ppm
        |FROM cell""".stripMargin,
    "q514_cochran_armitage" ->
      """WITH o AS (SELECT
        |    CAST(substr(o_orderpriority, 1, 1) AS BIGINT) - 1 AS w,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
        |    o_orderkey
        |  FROM orders),
        |r AS (SELECT *, row_number() OVER (ORDER BY cents, o_orderkey)
        |        AS rk, count(*) OVER () AS nn FROM o),
        |m AS (SELECT cents AS med FROM r WHERE rk = (nn + 1) // 2),
        |lv AS (SELECT w, CAST(count(*) AS BIGINT) AS n_k,
        |    CAST(sum(CASE WHEN cents > (SELECT med FROM m)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS x_k
        |  FROM o GROUP BY 1),
        |s AS (SELECT CAST(sum(n_k) AS BIGINT) AS n,
        |    CAST(sum(x_k) AS BIGINT) AS x,
        |    CAST(sum(w * n_k) AS BIGINT) AS swn,
        |    CAST(sum(w * w * n_k) AS BIGINT) AS sw2n,
        |    CAST(sum(w * x_k) AS BIGINT) AS swx FROM lv),
        |t AS (SELECT n, x,
        |    abs(swx * n - swn * x) AS t_abs,
        |    CASE WHEN swx * n - swn * x >= 0 THEN CAST(1 AS BIGINT)
        |         ELSE CAST(-1 AS BIGINT) END AS t_sign,
        |    x * (n - x) // n AS e1,
        |    (n * sw2n - swn * swn) // n AS e2 FROM s)
        |SELECT n, x, t_abs, t_sign, e1, e2,
        |  CAST(CAST(t_abs AS HUGEINT) * t_abs * 1000
        |    // (CAST(e1 AS HUGEINT) * e2) AS BIGINT) AS z2_milli
        |FROM t""".stripMargin,
    "q515_nelson_aalen" ->
      s"""WITH ${SparkEntry.SrcCte},
         |u AS (SELECT user_id,
         |    CAST(date_diff('day', DATE '1970-01-01',
         |      CAST(min(ts) AS DATE)) AS BIGINT) AS f,
         |    CAST(date_diff('day', DATE '1970-01-01',
         |      CAST(min(CASE WHEN event_type = 'purchase' THEN ts END)
         |        AS DATE)) AS BIGINT) AS p
         |  FROM src GROUP BY 1),
         |h AS (SELECT CAST(date_diff('day', DATE '1970-01-01',
         |    CAST(max(ts) AS DATE)) AS BIGINT) AS maxd FROM src),
         |tt AS (SELECT user_id, coalesce(p - f, maxd - f) AS tau,
         |    p IS NOT NULL AS is_event FROM u, h),
         |g AS (SELECT tau, CAST(count(*) AS BIGINT) AS all_cnt,
         |    CAST(sum(CASE WHEN is_event THEN 1 ELSE 0 END) AS BIGINT)
         |      AS d
         |  FROM tt GROUP BY 1),
         |rk AS (SELECT *, CAST(sum(all_cnt) OVER (ORDER BY tau DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    AS BIGINT) AS n_risk FROM g)
         |SELECT tau AS t, d, n_risk,
         |  CAST(d * 1000000 // n_risk AS BIGINT) AS h_term_ppm,
         |  CAST(sum(d * 1000000 // n_risk) OVER (ORDER BY tau)
         |    AS BIGINT) AS h_cum_ppm
         |FROM rk WHERE d > 0""".stripMargin,
    "q516_dow_seasonality" ->
      s"""WITH ${SparkEntry.SrcCte},
         |dly AS (SELECT CAST(ts AS DATE) AS day,
         |    CAST(count(*) AS BIGINT) AS cnt FROM src GROUP BY 1),
         |w AS (SELECT CAST(date_diff('day', DATE '1970-01-01', day) % 7
         |    AS BIGINT) AS dow_id, cnt FROM dly),
         |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total,
         |    CAST(count(*) AS BIGINT) AS n_days FROM w)
         |SELECT dow_id, CAST(count(*) AS BIGINT) AS n_days_dow,
         |  CAST(sum(cnt) AS BIGINT) AS n_events,
         |  CAST(sum(cnt) * (SELECT n_days FROM tot) * 1000000
         |    // (count(*) * (SELECT total FROM tot)) AS BIGINT)
         |    AS index_ppm
         |FROM w GROUP BY 1""".stripMargin,
    "q517_schema_evolution" ->
      """WITH r96 AS (SELECT o_orderpriority AS prio,
        |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders WHERE year(o_orderdate) = 1996 GROUP BY 1),
        |r97 AS (SELECT o_orderpriority AS prio,
        |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
        |      AS BIGINT) AS cents,
        |    CAST(count(*) AS BIGINT) AS n_orders
        |  FROM orders WHERE year(o_orderdate) = 1997 GROUP BY 1)
        |SELECT CAST(1 AS BIGINT) AS version, prio, cents,
        |  CAST(NULL AS BIGINT) AS n_orders FROM r96
        |UNION ALL
        |SELECT CAST(2 AS BIGINT) AS version, prio, cents, n_orders
        |FROM r97""".stripMargin,
    "q518_table_history" ->
      """WITH r97 AS (SELECT CAST(count(DISTINCT o_orderpriority)
        |    AS BIGINT) AS n FROM orders WHERE year(o_orderdate) < 1997),
        |r99 AS (SELECT CAST(count(DISTINCT o_orderpriority) AS BIGINT)
        |    AS n FROM orders WHERE year(o_orderdate) < 1999)
        |SELECT CAST(1 AS BIGINT) AS version, FALSE AS is_dv,
        |  CAST(1000 AS BIGINT) AS own_stamp,
        |  CAST(1000 AS BIGINT) AS effective_stamp,
        |  (SELECT n FROM r97) AS n_rows
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), FALSE, CAST(2000 AS BIGINT),
        |  CAST(2000 AS BIGINT), (SELECT n FROM r99)
        |UNION ALL
        |SELECT CAST(3 AS BIGINT), TRUE, CAST(2500 AS BIGINT),
        |  CAST(2500 AS BIGINT), CAST(1 AS BIGINT)""".stripMargin,
    "q519_union_pushdown" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS cents,
        |  TRUE AS pushed_both_scans
        |FROM orders WHERE o_orderpriority = '1-URGENT'
        |GROUP BY 1""".stripMargin,
    "q520_bucketed_join" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS cents,
        |  TRUE AS join_no_shuffle
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY 1""".stripMargin,
    "q521_kmv_sketch" ->
      """WITH uh AS MATERIALIZED (SELECT DISTINCT
        |    o_orderpriority AS set_id, o_custkey AS elem,
        |    CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8))
        |      ::UBIGINT AS BIGINT) AS h
        |  FROM orders),
        |per AS (SELECT set_id, max(h) AS h_k,
        |    CAST(count(*) AS BIGINT) AS n_le_k
        |  FROM (SELECT *, row_number() OVER (PARTITION BY set_id
        |          ORDER BY h, elem) AS rk FROM uh)
        |  WHERE rk <= 64 GROUP BY 1),
        |pe AS (SELECT set_id,
        |    CASE WHEN n_le_k < 64 THEN n_le_k
        |         ELSE 63 * 4294967296 // greatest(h_k, 1) END AS est
        |  FROM per),
        |ty AS (SELECT DISTINCT set_id FROM uh),
        |pr AS (SELECT a.set_id AS t1, b.set_id AS t2
        |  FROM ty a JOIN ty b ON a.set_id < b.set_id),
        |u2 AS (SELECT DISTINCT pr.t1, pr.t2, uh.elem, uh.h
        |  FROM pr JOIN uh ON uh.set_id = pr.t1 OR uh.set_id = pr.t2),
        |unr AS (SELECT t1, t2, max(h) AS h_k,
        |    CAST(count(*) AS BIGINT) AS n_le_k
        |  FROM (SELECT *, row_number() OVER (PARTITION BY t1, t2
        |          ORDER BY h, elem) AS rk FROM u2)
        |  WHERE rk <= 64 GROUP BY 1, 2),
        |ue AS (SELECT t1, t2,
        |    CASE WHEN n_le_k < 64 THEN n_le_k
        |         ELSE 63 * 4294967296 // greatest(h_k, 1) END AS est_union
        |  FROM unr)
        |SELECT t1, t2, CAST(pa.est AS BIGINT) AS est_a,
        |  CAST(pb.est AS BIGINT) AS est_b,
        |  CAST(est_union AS BIGINT) AS est_union,
        |  CAST(pa.est + pb.est - est_union AS BIGINT) AS est_intersect
        |FROM ue JOIN pe pa ON pa.set_id = t1
        |        JOIN pe pb ON pb.set_id = t2""".stripMargin
  )
}
