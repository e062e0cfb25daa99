package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.DimKey
import graft.operators.Profile
import graft.sources.Tables

/** Round-8 session-4 queries (q552+). Separate object: the earlier query
  * objects' map builders sit near the JVM 64 KB method-bytecode ceiling,
  * so new surface accretes here and chains into `SparkEntry.queries` /
  * `oracleSql`.
  *
  * This tier: the classical nonparametric / reliability statistics the
  * reference's dbt test layer implies but cannot express (paired and
  * k-sample rank tests, effect sizes, probabilistic-forecast scoring,
  * robust location/scale estimation) — every statistic exact-integer or
  * pinned-DIV rational so Spark and the DuckDB oracle agree bitwise.
  */
object R12Queries {

  private def rd(s: SparkSession, dir: String, t: String): DataFrame =
    Tables.read(s, dir, t)

  /** Exact line-revenue in cent·percent units: both engines quantize the
    * DOUBLE columns identically (IEEE-754 floor at cents / whole-percent
    * discount) BEFORE any arithmetic, so every downstream sum is int64.
    */
  private val revUnit: Column =
    expr("CAST(floor(l_extendedprice * 100) AS BIGINT)" +
         " * (100 - CAST(floor(l_discount * 100) AS BIGINT))")

  /** Monthly revenue per customer nation — the dimension-grain rollup
    * (≤ 25 nations × ~80 months) every rank statistic below rides: the
    * fact scan collapses in ONE combine-enabled aggregate before any
    * window or pair expansion, so 100 TB of lineitem feeds ≤ 2 000 rows
    * of downstream work.
    */
  private def nationMonthRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = rd(s, dir, "lineitem").select(col("l_orderkey"), revUnit.as("r"))
    val o = rd(s, dir, "orders").select("o_orderkey", "o_custkey",
                                        "o_orderdate")
    val c = rd(s, dir, "customer").select("c_custkey", "c_nationkey")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").cast("long").as("nk"),
               expr("CAST(year(o_orderdate) AS BIGINT)").as("yr"),
               expr("CAST(month(o_orderdate) AS BIGINT)").as("mo"))
      .agg(sum(col("r")).as("rev"))
  }

  /** Tie-averaged rank doubled to stay integral: 2·rank + |ties| − 1
    * (= twice the average of the tied positions). `order` must be the
    * ranking value column; emitted as `rank_x2`.
    */
  private def rankX2(df: DataFrame, part: Seq[Column],
                     order: Column): DataFrame = {
    val wRank =
      if (part.isEmpty) Window.partitionBy(DimKey.one).orderBy(order)
      else Window.partitionBy(part: _*).orderBy(order)
    val wTies =
      if (part.isEmpty) Window.partitionBy(order)
      else Window.partitionBy(part :+ order: _*)
    df.withColumn("rank_x2",
      lit(2) * rank().over(wRank) + count(lit(1)).over(wTies) - 1)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q552_wilcoxon_signed_rank" -> ((s, dir) => {
      // Paired-sample Wilcoxon signed-rank over (nation, month) revenue,
      // 1996 vs 1997: d = rev97 − rev96, zero diffs dropped, |d| ranked
      // with doubled tie-average ranks (exact ints), W+/W− as rank sums.
      // The pair table is dimension-grain (≤ 300 rows) — the sanctioned
      // DimKey.one single-partition window; all fact work happens in the
      // one revenue rollup.
      val rev = nationMonthRevenue(s, dir)
        .filter(col("yr").isin(1996L, 1997L))
      val d = rev.as("a").join(rev.as("b"),
          col("b.nk") === col("a.nk") && col("b.mo") === col("a.mo") &&
          col("a.yr") === 1996L && col("b.yr") === 1997L)
        .select((col("b.rev") - col("a.rev")).as("d"))
        .filter(col("d") =!= 0L)
      rankX2(d, Seq.empty, abs(col("d")))
        .agg(count(lit(1)).cast("long").as("n_eff"),
             sum(when(col("d") > 0L, col("rank_x2")).otherwise(0L))
               .cast("long").as("w_plus_x2"),
             sum(when(col("d") < 0L, col("rank_x2")).otherwise(0L))
               .cast("long").as("w_minus_x2"))
    }),
    "q553_friedman" -> ((s, dir) => {
      // Friedman k-treatment rank test: blocks = 1996 months, treatments
      // = the 5 order priorities, value = order count. Within-block
      // doubled tie-average ranks; Q in ppm from the closed form
      // 3·(ΣR²_x2 − n²k(k+1)²) / (n·k·(k+1)) with a sign-folded DIV
      // (tie-averaged ranks can push Q slightly negative). One fact
      // rollup to the 60-cell (month × priority) grid, then dimension
      // windows.
      val v = rd(s, dir, "orders")
        .filter(expr("year(o_orderdate) = 1996"))
        .groupBy(expr("CAST(month(o_orderdate) AS BIGINT)").as("blk"),
                 col("o_orderpriority").as("trt"))
        .agg(count(lit(1)).cast("long").as("y"))
      val rs = rankX2(v, Seq(col("blk")), col("y"))
        .groupBy(col("trt"))
        .agg(sum(col("rank_x2")).cast("long").as("r_sum_x2"))
      val nBlocks = v.select(col("blk")).distinct()
        .agg(count(lit(1)).cast("long").as("nb"))
      val g = rs.agg(count(lit(1)).cast("long").as("k"),
                     sum(col("r_sum_x2") * col("r_sum_x2")).cast("long")
                       .as("ss"))
        .crossJoin(broadcast(nBlocks))
      rs.crossJoin(broadcast(g))
        .withColumn("q_ppm", expr(
          """CASE WHEN 3 * (ss - nb*nb*k*(k+1)*(k+1)) >= 0
            | THEN (1000000L * 3 * (ss - nb*nb*k*(k+1)*(k+1)))
            |   DIV (nb*k*(k+1))
            | ELSE -((1000000L * 3 * (nb*nb*k*(k+1)*(k+1) - ss))
            |   DIV (nb*k*(k+1))) END""".stripMargin))
        .select("trt", "r_sum_x2", "q_ppm")
    }),
    "q554_cliffs_delta" -> ((s, dir) => {
      // Cliff's delta (ordinal effect size) URGENT vs LOW on whole-dollar
      // order value — pairwise dominance counts WITHOUT the n1·n2 pair
      // expansion: both groups collapse to their value-grain histograms,
      // a full-outer merge aligns the grids, and cumSumByValue's
      // two-phase prefix sum turns #(a>b) into Σ na·cum_nb_lt. Scales as
      // the distinct-value count, never the row count.
      val o = rd(s, dir, "orders")
      def hist(p: String, as: String) = o
        .filter(col("o_orderpriority") === p)
        .groupBy(expr("CAST(floor(o_totalprice) AS BIGINT)").as("v"))
        .agg(count(lit(1)).cast("long").as(as))
      val merged = hist("1-URGENT", "na")
        .join(hist("5-LOW", "nb"), Seq("v"), "full_outer")
        .na.fill(0L, Seq("na", "nb"))
      val cum = Profile.cumSumByValue(merged, "v", Seq("nb"))
      val sz = merged.agg(sum(col("na")).cast("long").as("n1"),
                          sum(col("nb")).cast("long").as("n2"))
      cum.crossJoin(broadcast(sz))
        .agg(sum(col("na") * (col("cum_nb") - col("nb"))).cast("long")
               .as("n_gt"),
             sum(col("na") * (col("n2") - col("cum_nb")))
               .cast("long").as("n_lt"),
             sum(col("na") * col("nb")).cast("long").as("n_eq"),
             max(col("n1")).as("n1"), max(col("n2")).as("n2"))
        .withColumn("delta_ppm", expr(
          """CASE WHEN n_gt >= n_lt
            | THEN (1000000L * (n_gt - n_lt)) DIV (n1 * n2)
            | ELSE -((1000000L * (n_lt - n_gt)) DIV (n1 * n2)) END"""
            .stripMargin))
        .select("n_gt", "n_lt", "n_eq", "n1", "n2", "delta_ppm")
    }),
    "q555_brier_decomposition" -> ((s, dir) => {
      // Murphy decomposition of the Brier score for a frequency
      // forecaster: p(return) per part brand fit on 1995–96 (permille
      // DIV), scored on 1997. Everything exact-integer: the row-level
      // Brier sum in permille² units, reliability / resolution as
      // per-bin pinned DIVs (deterministic — a sum of per-bin ints),
      // uncertainty from the permille base rate. Two fact passes
      // (fit + score), bins = distinct permille values.
      val li = rd(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"),
                when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
      val o = rd(s, dir, "orders")
        .select(col("o_orderkey"), expr("year(o_orderdate)").as("yr"))
      val p = rd(s, dir, "part").select("p_partkey", "p_brand")
      val joined = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      val fit = joined.filter(col("yr").isin(1995, 1996))
        .groupBy(col("p_brand"))
        .agg(expr("(1000 * sum(y)) DIV count(1)").as("p"))
      val te = joined.filter(col("yr") === 1997)
        .join(broadcast(fit), Seq("p_brand"))
        .select("p", "y")
      val bins = te.groupBy(col("p"))
        .agg(count(lit(1)).cast("long").as("n_k"),
             sum(col("y")).cast("long").as("y_k"))
        .localCheckpoint(false)
      val tot = bins.agg(sum(col("n_k")).cast("long").as("n"),
                         sum(col("y_k")).cast("long").as("y"),
                         expr("(1000 * sum(y_k)) DIV sum(n_k)")
                           .as("ybar_pm"))
      val brier = te.agg(
        sum((col("p") - lit(1000L) * col("y")) *
            (col("p") - lit(1000L) * col("y"))).cast("long")
          .as("brier_sum_pm2"))
      val parts = bins.crossJoin(broadcast(tot)).agg(
        sum(expr("((p*n_k - 1000*y_k) * (p*n_k - 1000*y_k)) DIV n_k"))
          .cast("long").as("rel_sum_pm2"),
        sum(expr("n_k * ((1000*y_k) DIV n_k - ybar_pm)" +
                 " * ((1000*y_k) DIV n_k - ybar_pm)"))
          .cast("long").as("res_sum_pm2"))
      tot.crossJoin(broadcast(brier)).crossJoin(broadcast(parts))
        .withColumn("unc_sum_pm2",
                    expr("n * ybar_pm * (1000 - ybar_pm)"))
        .select("n", "y", "brier_sum_pm2", "rel_sum_pm2", "res_sum_pm2",
                "unc_sum_pm2")
    }),
    "q556_brown_forsythe" -> ((s, dir) => {
      // Brown–Forsythe variance-equality test across the 5 priorities:
      // z = |x − group median| in half-cents (medians from the
      // value-grain histogram so the per-group sort touches distinct
      // prices, not rows), group means quantized once (half-cent DIV) so
      // SSW = Σ(z − z̄_c)² is exact, F in ppm via one DECIMAL(38)
      // sign-safe DIV (sums of z² overflow int64 — DECIMAL(38) here,
      // HUGEINT in the oracle).
      val x = rd(s, dir, "orders")
        .select(col("o_orderpriority").as("g"),
                expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("x"))
      val hist = x.groupBy(col("g"), col("x"))
        .agg(count(lit(1)).cast("long").as("n"))
      val wCum = Window.partitionBy(col("g")).orderBy(col("x"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wTot = Window.partitionBy(col("g"))
      val cum = hist
        .withColumn("cum", sum(col("n")).over(wCum))
        .withColumn("cnt", sum(col("n")).over(wTot))
      def orderStat(posExpr: String) = cum
        .filter(col("cum") - col("n") < expr(posExpr) &&
                expr(posExpr) <= col("cum"))
        .select(col("g"), col("x"))
      val med = orderStat("(cnt + 1) DIV 2").as("lo")
        .join(orderStat("(cnt + 2) DIV 2").as("hi"),
              col("lo.g") === col("hi.g"))
        .select(col("lo.g").as("g"),
                (col("lo.x") + col("hi.x")).as("med_x2"))
      val z = x.join(broadcast(med), Seq("g"))
        .select(col("g"), abs(lit(2L) * col("x") - col("med_x2")).as("z2"))
      val gs = z.groupBy(col("g"))
        .agg(count(lit(1)).cast("long").as("n_g"),
             sum(col("z2").cast("decimal(38,0)")).as("s1"),
             sum((col("z2") * col("z2")).cast("decimal(38,0)")).as("s2"))
        .withColumn("zbar_c", expr("CAST(s1 DIV n_g AS BIGINT)"))
      val tot = gs.agg(sum(col("n_g")).cast("long").as("n"),
                       count(lit(1)).cast("long").as("k"),
                       expr("CAST(sum(s1) DIV sum(n_g) AS BIGINT)")
                         .as("zbar_all"))
      val f = gs.crossJoin(broadcast(tot)).agg(
        sum(col("n_g") *
            (col("zbar_c") - col("zbar_all")).cast("decimal(38,0)") *
            (col("zbar_c") - col("zbar_all")))
          .as("ssb"),
        sum(col("s2") - lit(2L) * col("zbar_c") * col("s1") +
            (col("n_g") * col("zbar_c")).cast("decimal(38,0)") *
            col("zbar_c")).as("ssw"),
        max(col("n")).as("n"), max(col("k")).as("k"))
      gs.crossJoin(broadcast(f))
        .withColumn("f_ppm", expr(
          "CAST((CAST(1000000 AS DECIMAL(38,0)) * (n - k) * ssb)" +
          " DIV ((k - 1) * ssw) AS BIGINT)"))
        .select(col("g"), col("n_g"),
                col("zbar_c").as("mad_halfcents"), col("f_ppm"))
    }),
    "q557_hodges_lehmann" -> ((s, dir) => {
      // Hodges–Lehmann pseudomedian of monthly revenue per nation: the
      // median of all Walsh averages (x_i + x_j)/2, i ≤ j, emitted ×4 to
      // stay integral through both halvings. The pair expansion is
      // bounded per key (~80 months → ~3.2 k pairs) and runs inside each
      // nation's shuffle lane — the robust location estimator dual to
      // the signed-rank test.
      val rev = nationMonthRevenue(s, dir)
        .select(col("nk"), (col("yr") * 12 + col("mo")).as("mi"),
                col("rev"))
      val pairs = rev.as("a").join(rev.as("b"),
          col("b.nk") === col("a.nk") && col("b.mi") >= col("a.mi"))
        .select(col("a.nk").as("nk"),
                (col("a.rev") + col("b.rev")).as("w"))
      val wRn = Window.partitionBy(col("nk")).orderBy(col("w"))
      val wCnt = Window.partitionBy(col("nk"))
      pairs
        .withColumn("rn", row_number().over(wRn))
        .withColumn("cnt", count(lit(1)).over(wCnt))
        .filter(col("rn") === expr("(cnt + 1) DIV 2") ||
                col("rn") === expr("(cnt + 2) DIV 2"))
        .groupBy(col("nk").as("nationkey"))
        .agg(max(col("cnt")).cast("long").as("n_pairs"),
             (min(col("w")) + max(col("w"))).cast("long").as("hl_x4"))
    }))

  def oracleSql: Map[String, String] = Map(
    "q552_wilcoxon_signed_rank" ->
      """WITH rev AS MATERIALIZED (
        |  SELECT c.c_nationkey AS nk, year(o.o_orderdate) AS yr,
        |    month(o.o_orderdate) AS mo,
        |    CAST(sum(CAST(floor(l.l_extendedprice*100) AS BIGINT)
        |      * (100 - CAST(floor(l.l_discount*100) AS BIGINT)))
        |      AS BIGINT) AS rev
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE year(o.o_orderdate) IN (1996, 1997)
        |  GROUP BY 1, 2, 3),
        |d AS (
        |  SELECT b.rev - a.rev AS d
        |  FROM rev a JOIN rev b ON b.nk = a.nk AND b.mo = a.mo
        |    AND a.yr = 1996 AND b.yr = 1997
        |  WHERE b.rev <> a.rev),
        |r AS (
        |  SELECT d, 2*rank() OVER (ORDER BY abs(d))
        |    + count(*) OVER (PARTITION BY abs(d)) - 1 AS rank_x2
        |  FROM d)
        |SELECT CAST(count(*) AS BIGINT) AS n_eff,
        |  CAST(sum(CASE WHEN d > 0 THEN rank_x2 ELSE 0 END) AS BIGINT)
        |    AS w_plus_x2,
        |  CAST(sum(CASE WHEN d < 0 THEN rank_x2 ELSE 0 END) AS BIGINT)
        |    AS w_minus_x2
        |FROM r""".stripMargin,
    "q553_friedman" ->
      """WITH v AS MATERIALIZED (
        |  SELECT CAST(month(o_orderdate) AS BIGINT) AS blk,
        |    o_orderpriority AS trt, CAST(count(*) AS BIGINT) AS y
        |  FROM orders WHERE year(o_orderdate) = 1996
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT blk, trt, 2*rank() OVER (PARTITION BY blk ORDER BY y)
        |    + count(*) OVER (PARTITION BY blk, y) - 1 AS rank_x2
        |  FROM v),
        |rs AS MATERIALIZED (
        |  SELECT trt, CAST(sum(rank_x2) AS BIGINT) AS r_sum_x2
        |  FROM r GROUP BY 1),
        |g AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(r_sum_x2*r_sum_x2) AS BIGINT) AS ss,
        |    (SELECT CAST(count(DISTINCT blk) AS BIGINT) FROM v) AS nb
        |  FROM rs)
        |SELECT rs.trt, rs.r_sum_x2,
        |  CAST(CASE WHEN 3*(g.ss - g.nb*g.nb*g.k*(g.k+1)*(g.k+1)) >= 0
        |    THEN (1000000 * 3 * (g.ss - g.nb*g.nb*g.k*(g.k+1)*(g.k+1)))
        |      // (g.nb*g.k*(g.k+1))
        |    ELSE -((1000000 * 3 * (g.nb*g.nb*g.k*(g.k+1)*(g.k+1) - g.ss))
        |      // (g.nb*g.k*(g.k+1))) END AS BIGINT) AS q_ppm
        |FROM rs CROSS JOIN g""".stripMargin,
    "q554_cliffs_delta" ->
      """WITH a AS MATERIALIZED (
        |  SELECT CAST(floor(o_totalprice) AS BIGINT) AS v,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1),
        |b AS MATERIALIZED (
        |  SELECT CAST(floor(o_totalprice) AS BIGINT) AS v,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM orders WHERE o_orderpriority = '5-LOW' GROUP BY 1),
        |m AS MATERIALIZED (
        |  SELECT coalesce(a.v, b.v) AS v, coalesce(a.n, 0) AS na,
        |    coalesce(b.n, 0) AS nb
        |  FROM a FULL OUTER JOIN b ON a.v = b.v),
        |c AS (
        |  SELECT v, na, nb,
        |    CAST(sum(nb) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS nb_le
        |  FROM m),
        |sz AS (SELECT CAST(sum(na) AS BIGINT) AS n1,
        |       CAST(sum(nb) AS BIGINT) AS n2 FROM m),
        |dom AS (
        |  SELECT CAST(sum(na*(nb_le - nb)) AS BIGINT) AS n_gt,
        |    CAST(sum(na*(s.n2 - nb_le)) AS BIGINT) AS n_lt,
        |    CAST(sum(na*nb) AS BIGINT) AS n_eq
        |  FROM c CROSS JOIN sz s)
        |SELECT d.n_gt, d.n_lt, d.n_eq, s.n1, s.n2,
        |  CAST(CASE WHEN d.n_gt >= d.n_lt
        |    THEN (1000000*(d.n_gt - d.n_lt)) // (s.n1*s.n2)
        |    ELSE -((1000000*(d.n_lt - d.n_gt)) // (s.n1*s.n2)) END
        |    AS BIGINT) AS delta_ppm
        |FROM dom d CROSS JOIN sz s""".stripMargin,
    "q555_brier_decomposition" ->
      """WITH fit AS MATERIALIZED (
        |  SELECT p.p_brand AS brand,
        |    CAST((1000 * sum(CASE WHEN l.l_returnflag = 'R' THEN 1
        |      ELSE 0 END)) // count(*) AS BIGINT) AS p
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE year(o.o_orderdate) IN (1995, 1996)
        |  GROUP BY 1),
        |te AS MATERIALIZED (
        |  SELECT fit.p,
        |    CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  JOIN fit ON fit.brand = p.p_brand
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE year(o.o_orderdate) = 1997),
        |bins AS MATERIALIZED (
        |  SELECT p, CAST(count(*) AS BIGINT) AS n_k,
        |    CAST(sum(y) AS BIGINT) AS y_k
        |  FROM te GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_k) AS BIGINT) AS n,
        |  CAST(sum(y_k) AS BIGINT) AS y,
        |  CAST((1000*sum(y_k)) // sum(n_k) AS BIGINT) AS ybar_pm
        |  FROM bins)
        |SELECT t.n, t.y,
        |  (SELECT CAST(sum((p - 1000*y)*(p - 1000*y)) AS BIGINT) FROM te)
        |    AS brier_sum_pm2,
        |  (SELECT CAST(sum(((p*n_k - 1000*y_k)*(p*n_k - 1000*y_k)) // n_k)
        |    AS BIGINT) FROM bins) AS rel_sum_pm2,
        |  (SELECT CAST(sum(n_k * ((1000*y_k) // n_k - t.ybar_pm)
        |    * ((1000*y_k) // n_k - t.ybar_pm)) AS BIGINT) FROM bins)
        |    AS res_sum_pm2,
        |  CAST(t.n * t.ybar_pm * (1000 - t.ybar_pm) AS BIGINT)
        |    AS unc_sum_pm2
        |FROM tot t""".stripMargin,
    "q556_brown_forsythe" ->
      """WITH x AS MATERIALIZED (
        |  SELECT o_orderpriority AS g,
        |    CAST(floor(o_totalprice*100) AS BIGINT) AS x
        |  FROM orders),
        |hist AS MATERIALIZED (
        |  SELECT g, x, CAST(count(*) AS BIGINT) AS n FROM x GROUP BY 1, 2),
        |cum AS (
        |  SELECT g, x, n,
        |    CAST(sum(n) OVER (PARTITION BY g ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum,
        |    CAST(sum(n) OVER (PARTITION BY g) AS BIGINT) AS cnt
        |  FROM hist),
        |med AS MATERIALIZED (
        |  SELECT lo.g, lo.x + hi.x AS med_x2 FROM
        |    (SELECT g, x FROM cum
        |     WHERE cum - n < (cnt+1)//2 AND (cnt+1)//2 <= cum) lo
        |  JOIN
        |    (SELECT g, x FROM cum
        |     WHERE cum - n < (cnt+2)//2 AND (cnt+2)//2 <= cum) hi
        |  ON lo.g = hi.g),
        |z AS MATERIALIZED (
        |  SELECT x.g, abs(2*x.x - m.med_x2) AS z2
        |  FROM x JOIN med m ON m.g = x.g),
        |gs AS MATERIALIZED (
        |  SELECT g, CAST(count(*) AS BIGINT) AS n_g,
        |    CAST(sum(z2) AS HUGEINT) AS s1,
        |    CAST(sum(CAST(z2 AS HUGEINT)*z2) AS HUGEINT) AS s2
        |  FROM z GROUP BY 1),
        |q AS MATERIALIZED (
        |  SELECT g, n_g, s1, s2, CAST(s1 // n_g AS BIGINT) AS zbar_c
        |  FROM gs),
        |tot AS (
        |  SELECT CAST(sum(n_g) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(s1) // sum(n_g) AS BIGINT) AS zbar_all FROM q),
        |f AS (
        |  SELECT
        |    CAST(sum(q.n_g*(CAST(q.zbar_c AS HUGEINT)-t.zbar_all)
        |      *(q.zbar_c-t.zbar_all)) AS HUGEINT) AS ssb,
        |    CAST(sum(q.s2 - 2*CAST(q.zbar_c AS HUGEINT)*q.s1
        |      + CAST(q.n_g AS HUGEINT)*q.zbar_c*q.zbar_c) AS HUGEINT)
        |      AS ssw,
        |    max(t.n) AS n, max(t.k) AS k
        |  FROM q CROSS JOIN tot t)
        |SELECT q.g, q.n_g, CAST(q.zbar_c AS BIGINT) AS mad_halfcents,
        |  CAST((1000000 * CAST(f.n - f.k AS HUGEINT) * f.ssb)
        |    // (CAST(f.k - 1 AS HUGEINT) * f.ssw) AS BIGINT) AS f_ppm
        |FROM q CROSS JOIN f""".stripMargin,
    "q557_hodges_lehmann" ->
      """WITH rev AS MATERIALIZED (
        |  SELECT c.c_nationkey AS nk,
        |    year(o.o_orderdate)*12 + month(o.o_orderdate) AS mi,
        |    CAST(sum(CAST(floor(l.l_extendedprice*100) AS BIGINT)
        |      * (100 - CAST(floor(l.l_discount*100) AS BIGINT)))
        |      AS BIGINT) AS rev
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2),
        |pairs AS MATERIALIZED (
        |  SELECT a.nk, a.rev + b.rev AS w
        |  FROM rev a JOIN rev b ON b.nk = a.nk AND b.mi >= a.mi),
        |rk AS (
        |  SELECT nk, w, row_number() OVER (PARTITION BY nk ORDER BY w)
        |    AS rn, count(*) OVER (PARTITION BY nk) AS cnt
        |  FROM pairs)
        |SELECT CAST(nk AS BIGINT) AS nationkey,
        |  CAST(max(cnt) AS BIGINT) AS n_pairs,
        |  CAST(min(w) + max(w) AS BIGINT) AS hl_x4
        |FROM rk WHERE rn IN ((cnt+1)//2, (cnt+2)//2)
        |GROUP BY 1""".stripMargin)
}
