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

  /** Undirected nation-trade edges (canonical src < dst) with the fact
    * rollup done FIRST — same contract as the R11 graph tier: 100 TB of
    * lineitem collapses to ≤ |V|² edges before any graph work.
    */
  private def tradeEdges(s: SparkSession, dir: String,
                         minCount: Long): DataFrame = {
    val li = rd(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
    val o = rd(s, dir, "orders").select("o_orderkey", "o_custkey")
    val c = rd(s, dir, "customer").select("c_custkey", "c_nationkey")
    val su = rd(s, dir, "supplier").select("s_suppkey", "s_nationkey")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") =!= col("s_nationkey"))
      .groupBy(
        least(col("c_nationkey"), col("s_nationkey")).cast("long")
          .as("src"),
        greatest(col("c_nationkey"), col("s_nationkey")).cast("long")
          .as("dst"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  }

  /** Canonical co-purchase item graph (x < y, ≥ 2 shared orders) — the
    * same edge contract as the triangle/truss tier: the fact table
    * collapses to per-order item pairs (items-per-order is bounded, so
    * the expansion is linear in lineitem), then one count rollup. All
    * graph statistics below run on this dimension-sized edge list.
    */
  private def copurchaseEdges(s: SparkSession, dir: String): DataFrame =
    // r15: the strong co-purchase relation IS coOccurrenceEdges(minCount=2)
    // over the same (order, part) projection — route it through the
    // suite's shared ResultCache (the r11-blessed materialized-view
    // discipline) so q558/q559/q560/q585 stop re-running the fact-scale
    // pair build the co-purchase tier already materializes once per
    // session. Identical rows: same distinct → self-join → count → filter.
    graft.operators.Graph.coOccurrenceEdgesCached(
        Tables.spread(s, rd(s, dir, "lineitem")),
        groupCol = "l_orderkey", itemCol = "l_partkey", minCount = 2)
      .select(col("src").as("x"), col("dst").as("y"))

  private def symEdges(e0: DataFrame): DataFrame =
    e0.select(col("x").as("src"), col("y").as("dst"))
      .unionByName(e0.select(col("y").as("src"), col("x").as("dst")))

  /** Monthly order-count series keyed by month index (1995-01 = 0) —
    * the ≤ 80-row rollup the time-series statistics below ride.
    */
  private def monthlySeries(s: SparkSession, dir: String): DataFrame =
    rd(s, dir, "orders")
      .groupBy(expr("CAST((year(o_orderdate) - 1995) * 12" +
                    " + month(o_orderdate) - 1 AS BIGINT)").as("mi"))
      .agg(count(lit(1)).cast("long").as("y"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q558_local_clustering" -> ((s, dir) => {
      // Local clustering coefficient per node: edges among neighbors /
      // C(deg, 2), in ppm. Wedges enumerate per center (a.dst < b.dst),
      // close against the canonical x<y edge list — the per-node version
      // of the q224 triangle count; wedge volume is Σ C(deg, 2), bounded
      // by the co-purchase graph's order-size cap.
      val e0 = copurchaseEdges(s, dir).localCheckpoint(false)
      val sym = symEdges(e0)
      val deg = sym.groupBy(col("src").as("v"))
        .agg(count(lit(1)).cast("long").as("deg"))
      val tri = sym.as("a").join(sym.as("b"),
          col("b.src") === col("a.src") && col("b.dst") > col("a.dst"))
        .join(e0, col("x") === col("a.dst") && col("y") === col("b.dst"))
        .groupBy(col("a.src").as("v"))
        .agg(count(lit(1)).cast("long").as("tri"))
      deg.join(tri, Seq("v"), "left").na.fill(0L, Seq("tri"))
        .filter(col("deg") >= 2L)
        .select(col("v").cast("long").as("node"), col("deg"), col("tri"),
                expr("(2000000 * tri) DIV (deg * (deg - 1))").as("cc_ppm"))
    }),
    "q559_resource_allocation" -> ((s, dir) => {
      // Resource-allocation link-prediction index over NON-adjacent item
      // pairs with ≥ 2 common neighbors: RA = Σ_z 1/deg(z) in ppm as a
      // sum of per-z pinned DIVs (order-free exact ints). Candidates
      // come from the wedge expansion, the anti-join strips existing
      // edges — the degree-penalized common-neighbor scorer.
      val e0 = copurchaseEdges(s, dir).localCheckpoint(false)
      val sym = symEdges(e0)
      val deg = sym.groupBy(col("src").as("z"))
        .agg(count(lit(1)).cast("long").as("deg"))
      val cand = sym.as("a").join(sym.as("b"),
          col("b.src") === col("a.src") && col("a.dst") < col("b.dst"))
        .select(col("a.dst").as("u"), col("b.dst").as("w"),
                col("a.src").as("z"))
      cand.join(e0, col("x") === col("u") && col("y") === col("w"),
                "left_anti")
        .join(deg, Seq("z"))
        .groupBy(col("u").cast("long").as("u"),
                 col("w").cast("long").as("w"))
        .agg(count(lit(1)).cast("long").as("n_common"),
             sum(expr("1000000 DIV deg")).cast("long").as("ra_ppm"))
        .filter(col("n_common") >= 2L)
    }),
    "q560_square_count" -> ((s, dir) => {
      // Global 4-cycle census: squares = Σ_{u<w} C(codeg(u,w), 2) / 2
      // (each square is counted by both of its opposite pairs). One
      // wedge expansion + one rollup — the codegree decomposition that
      // never materializes a cycle; wedge volume Σ C(deg,2) is the
      // scale bound, same as the triangle tier.
      val sym = symEdges(copurchaseEdges(s, dir))
      sym.as("a").join(sym.as("b"),
          col("b.src") === col("a.src") && col("a.dst") < col("b.dst"))
        .groupBy(col("a.dst").as("u"), col("b.dst").as("w"))
        .agg(count(lit(1)).cast("long").as("cd"))
        .agg(count(lit(1)).cast("long").as("n_pairs"),
             sum(col("cd")).cast("long").as("n_wedges"),
             expr("sum(cd * (cd - 1)) DIV 4").as("n_squares"),
             max(col("cd")).cast("long").as("max_codeg"))
    }),
    "q561_matrix_profile_sad" -> ((s, dir) => {
      // SAD matrix profile (discord/motif primitive) over the monthly
      // order-count series, window 6, exclusion zone |i−j| ≥ 6: for each
      // complete window, the nearest other window by sum-of-absolute-
      // differences, tie-broken by start index. The series is an 80-row
      // rollup, so the all-pairs window join is dimension-grain; exact
      // integer distances end-to-end.
      val m = monthlySeries(s, dir).localCheckpoint(false)
      val win = m.as("a").join(m.as("b"),
          col("b.mi") >= col("a.mi") && col("b.mi") <= col("a.mi") + 5)
        .select(col("a.mi").as("i"), (col("b.mi") - col("a.mi")).as("t"),
                col("b.y").as("y"))
      val full = win.groupBy(col("i")).agg(count(lit(1)).as("nt"))
        .filter(col("nt") === 6L).select("i")
      val sad = win.as("a").join(win.as("b"),
          col("b.t") === col("a.t") &&
          abs(col("b.i") - col("a.i")) >= 6)
        .join(full.as("fa"), col("fa.i") === col("a.i"))
        .join(full.as("fb"), col("fb.i") === col("b.i"))
        .groupBy(col("a.i").as("i"), col("b.i").as("j"))
        .agg(sum(abs(col("a.y") - col("b.y"))).cast("long").as("sad"))
      val w = Window.partitionBy(col("i")).orderBy(col("sad"), col("j"))
      sad.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("i").cast("long").as("win_start"),
                col("j").cast("long").as("nn_start"),
                col("sad").as("nn_sad"))
    }),
    "q562_seasonal_decompose" -> ((s, dir) => {
      // Classical additive decomposition of the monthly series, period
      // 12: centered MA(12) trend ×24 (half-weight end lags keep it
      // integral), detrended ×24, seasonal index = per-calendar-month
      // sign-folded mean DIV, residual by subtraction. One fact rollup,
      // then a 13-offset self-join on the 80-row series.
      val m = monthlySeries(s, dir).localCheckpoint(false)
      val tr = m.as("a").join(m.as("b"),
          col("b.mi") >= col("a.mi") - 6 && col("b.mi") <= col("a.mi") + 6)
        .groupBy(col("a.mi").as("mi"))
        .agg(sum(when(abs(col("b.mi") - col("a.mi")) === 6, col("b.y"))
                   .otherwise(lit(2L) * col("b.y"))).cast("long")
               .as("trend_x24"),
             count(lit(1)).as("nw"))
        .filter(col("nw") === 13L)
      val det = tr.join(m, Seq("mi"))
        .select(col("mi"), col("trend_x24"),
                (lit(24L) * col("y") - col("trend_x24")).as("detr_x24"),
                expr("mi % 12").as("mo"))
      val seas = det.groupBy(col("mo"))
        .agg(expr("""CASE WHEN sum(detr_x24) >= 0
                    | THEN sum(detr_x24) DIV count(1)
                    | ELSE -((-sum(detr_x24)) DIV count(1)) END"""
               .stripMargin).as("seas_x24"))
      det.join(broadcast(seas), Seq("mo"))
        .select(col("mi"), col("trend_x24"), col("detr_x24"),
                col("seas_x24"),
                (col("detr_x24") - col("seas_x24")).cast("long")
                  .as("resid_x24"))
    }),
    "q563_ljung_box" -> ((s, dir) => {
      // Ljung–Box serial-correlation audit, lags 1–12, on n-scaled
      // deviations e = n·y − Σy (exact ints, no mean division): per-lag
      // ACF in sign-folded ppm and the LB term 1e6·n(n+2)·num²/(den²·
      // (n−k)) via DECIMAL(38) (num² overflows int64). The cumulative Q
      // runs over the 12-row lag table — a DimKey.one dimension window.
      val m = monthlySeries(s, dir)
      val g = m.agg(count(lit(1)).cast("long").as("n"),
                    sum(col("y")).cast("long").as("sy"))
      val e = m.crossJoin(broadcast(g))
        .select(col("mi"), (col("n") * col("y") - col("sy")).as("e"),
                col("n")).localCheckpoint(false)
      val den = e.agg(sum((col("e") * col("e")).cast("decimal(38,0)"))
                        .as("d2"))
      val lags = s.range(1, 13).select(col("id").as("k"))
      val num = lags.join(
          e.as("a").join(e.as("b"), lit(true))
            .select((col("b.mi") - col("a.mi")).as("k"),
                    (col("a.e") * col("b.e")).as("p")),
          Seq("k"), "left")
        .groupBy(col("k"))
        .agg(coalesce(sum(col("p")), lit(0L)).cast("long").as("num"))
      val r = num.crossJoin(broadcast(den)).crossJoin(broadcast(g))
        .select(col("k").as("lag"), col("num").as("acf_num"),
          expr("""CAST(CASE WHEN num >= 0
                 | THEN (1000000 * CAST(num AS DECIMAL(38,0))) DIV d2
                 | ELSE -((1000000 * CAST(-num AS DECIMAL(38,0))) DIV d2)
                 | END AS BIGINT)""".stripMargin).as("acf_ppm"),
          expr("""CAST((1000000 * n * (n+2)
                 |  * CAST(num AS DECIMAL(38,0)) * num)
                 | DIV (d2 * d2 * (n - k)) AS BIGINT)""".stripMargin)
            .as("lb_term_ppm"))
      val w = Window.partitionBy(DimKey.one).orderBy(col("lag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      r.withColumn("lb_q_ppm", sum(col("lb_term_ppm")).over(w)
          .cast("long"))
        .select("lag", "acf_num", "acf_ppm", "lb_term_ppm", "lb_q_ppm")
    }),
    "q629_binary_segmentation" -> ((s, dir) => {
      // Binary-segmentation changepoint scan: for every split point of
      // the monthly series, total two-segment SSE from PREFIX SUMS
      // (len·Σx² − (Σx)², milli-quantized per side — no per-candidate
      // rescans), top-3 candidate splits emitted. The segmentation
      // primitive under PELT-style detectors, next to CUSUM (q245) and
      // Page–Hinkley (q599).
      val m = monthlySeries(s, dir)
      val w = Window.partitionBy(DimKey.one).orderBy(col("mi"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(DimKey.one)
      val c = m
        .withColumn("cs", sum(col("y")).over(w))
        .withColumn("cs2", sum(col("y") * col("y")).over(w))
        .withColumn("t", row_number().over(
          Window.partitionBy(DimKey.one).orderBy(col("mi"))).cast("long"))
        .withColumn("n", count(lit(1)).over(wAll).cast("long"))
        .withColumn("ts", sum(col("y")).over(wAll))
        .withColumn("ts2", sum(col("y") * col("y")).over(wAll))
      val cand = c.filter(col("t") < col("n"))
        .withColumn("sse_milli", expr(
          """(1000 * (t * cs2 - cs*cs)) DIV t
            | + (1000 * ((n - t) * (ts2 - cs2) - (ts - cs)*(ts - cs)))
            |   DIV (n - t)""".stripMargin))
      val wRank = Window.partitionBy(DimKey.one)
        .orderBy(col("sse_milli"), col("mi"))
      cand.withColumn("split_rank", row_number().over(wRank))
        .filter(col("split_rank") <= 3)
        .select(col("split_rank").cast("long").as("split_rank"),
                col("mi").as("split_mi"),
                col("sse_milli").cast("long").as("sse_milli"))
    }),
    "q630_matching_att" -> ((s, dir) => {
      // 1:1 nearest-value matching estimator (propensity-free synthetic
      // control): every URGENT order matches its value-nearest LOW
      // order (below/above candidates via cumSumByValue's cumulative
      // control count + cellRank — equijoins only, never a range join),
      // ATT on the order-status outcome in ppm. The causal-matching
      // companion to CUPED (q494) and uplift (q251).
      val o = rd(s, dir, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select(col("o_orderkey").as("k"),
                expr("CAST(floor(o_totalprice * 100) AS BIGINT)")
                  .as("v"),
                when(col("o_orderstatus") === "F", 1L).otherwise(0L)
                  .as("yout"),
                when(col("o_orderpriority") === "1-URGENT", 1L)
                  .otherwise(0L).as("treated"))
        .localCheckpoint(false)
      val ctl = o.filter(col("treated") === 0L)
      val ranked = Profile.cellRank(ctl, Seq.empty, "v", Seq("k"))
        .select(col("k").as("ck"), col("v").as("cv"),
                col("yout").as("cy"), col("_rank").as("r"))
        .localCheckpoint(false)
      val grid = o.groupBy(col("v"))
        .agg(sum(lit(1L) - col("treated")).as("nc"))
      val cum = Profile.cumSumByValue(grid, "v", Seq("nc"))
        .select(col("v"), col("cum_nc").as("rb"))
      val t = o.filter(col("treated") === 1L)
        .join(cum, Seq("v"))
      val below = t.join(ranked, col("r") === col("rb"), "left")
        .select(col("k"), col("v"), col("yout"), col("ck"), col("cy"),
                abs(col("cv") - col("v")).as("dist"))
      val above = t.join(ranked, col("r") === col("rb") + 1, "left")
        .select(col("k"), col("v"), col("yout"), col("ck"), col("cy"),
                abs(col("cv") - col("v")).as("dist"))
      val wPick = Window.partitionBy(col("k"))
        .orderBy(col("dist").asc_nulls_last, col("ck"))
      below.unionByName(above)
        .filter(col("ck").isNotNull)
        .withColumn("rn", row_number().over(wPick))
        .filter(col("rn") === 1)
        .agg(count(lit(1)).cast("long").as("n_matched"),
             sum(col("yout")).cast("long").as("treated_f"),
             sum(col("cy")).cast("long").as("control_f"))
        .withColumn("att_ppm", expr(
          """CASE WHEN treated_f >= control_f
            | THEN (1000000 * (treated_f - control_f)) DIV n_matched
            | ELSE -((1000000 * (control_f - treated_f))
            |   DIV n_matched) END""".stripMargin))
    }),
    "q625_kendall_distance" -> ((s, dir) => {
      // Kendall distance between two RANKINGS of the same items (brand
      // by revenue vs by volume): discordant pairs / all pairs in ppm —
      // the bubble-sort distance between lists, complementing q508's
      // data-level τ-b and q620's top-weighted RBO. The pair compare
      // runs on the |brands|² dimension grid.
      val br = rd(s, dir, "lineitem")
        .join(broadcast(rd(s, dir, "part").select("p_partkey", "p_brand")),
              col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand").as("brand"))
        .agg(sum(expr("CAST(floor(l_extendedprice * 100) AS BIGINT)"))
               .cast("long").as("rev"),
             count(lit(1)).cast("long").as("cnt"))
      val wA = Window.partitionBy(DimKey.one)
        .orderBy(col("rev").desc, col("brand"))
      val wB = Window.partitionBy(DimKey.one)
        .orderBy(col("cnt").desc, col("brand"))
      val rk = br.withColumn("ra", row_number().over(wA))
        .withColumn("rb", row_number().over(wB))
        .select("brand", "ra", "rb").localCheckpoint(false)
      rk.as("a").join(rk.as("b"), col("b.brand") > col("a.brand"))
        .agg(count(lit(1)).cast("long").as("n_pairs"),
             sum(when((col("a.ra") < col("b.ra")) =!=
                      (col("a.rb") < col("b.rb")), 1L).otherwise(0L))
               .cast("long").as("discordant"))
        .withColumn("kendall_distance_ppm",
                    expr("(1000000 * discordant) DIV n_pairs"))
    }),
    "q626_qn_scale" -> ((s, dir) => {
      // Rousseeuw–Croux Qn robust scale estimator (raw): the k-th order
      // statistic of all pairwise |yᵢ−yⱼ| with k = C(⌊n/2⌋+1, 2) — 50%
      // breakdown WITHOUT a location estimate, the robust-scale
      // companion to MAD (q155). Pairs are bounded by the 80-row series
      // (~3.2k); the k-th value comes off cellRank, not a global sort.
      val m = monthlySeries(s, dir).localCheckpoint(false)
      val g = m.agg(count(lit(1)).cast("long").as("n"))
      val pd = m.as("a").join(m.as("b"), col("b.mi") > col("a.mi"))
        .select(abs(col("a.y") - col("b.y")).as("d"),
                (col("a.mi") * 1000 + col("b.mi")).as("pid"))
      val rk = Profile.cellRank(pd, Seq.empty, "d", Seq("pid"))
      rk.crossJoin(broadcast(g))
        .agg(max(col("n")).as("n_points"),
             max(col("_n")).cast("long").as("n_pairs"),
             max(expr("((n DIV 2 + 1) * (n DIV 2)) DIV 2")).as("k"),
             max(when(col("_rank") ===
                 expr("((n DIV 2 + 1) * (n DIV 2)) DIV 2"), col("d")))
               .cast("long").as("qn_raw"))
    }),
    "q627_seasonal_mann_kendall" -> ((s, dir) => {
      // Seasonal Mann–Kendall trend test: S = Σ sign(y_j − y_i) over
      // same-calendar-month year pairs (1995–2000), plus the exact ×18
      // no-ties variance Σ n(n−1)(2n+5) — the environmental-statistics
      // monotone-trend test that ignores seasonality by construction
      // (the hypothesis-test companion to Theil–Sen's q445 slope).
      val m = rd(s, dir, "orders")
        .filter(expr("year(o_orderdate) BETWEEN 1995 AND 2000"))
        .groupBy(expr("CAST(month(o_orderdate) AS BIGINT)").as("mo"),
                 expr("CAST(year(o_orderdate) AS BIGINT)").as("yr"))
        .agg(count(lit(1)).cast("long").as("y"))
        .localCheckpoint(false)
      val sStat = m.as("a").join(m.as("b"),
          col("b.mo") === col("a.mo") && col("b.yr") > col("a.yr"))
        .agg(sum(when(col("b.y") > col("a.y"), 1L)
                   .when(col("b.y") < col("a.y"), -1L).otherwise(0L))
               .cast("long").as("s_stat"),
             count(lit(1)).cast("long").as("n_pairs"))
      val v = m.groupBy(col("mo")).agg(count(lit(1)).as("cnt"))
        .agg(sum(expr("cnt * (cnt-1) * (2*cnt+5)")).cast("long")
               .as("var_x18"))
      sStat.crossJoin(broadcast(v))
        .select("s_stat", "n_pairs", "var_x18")
    }),
    "q628_simpson_diversity" -> ((s, dir) => {
      // Simpson concentration / Gini–Simpson diversity of the trigram
      // vocabulary per source: Σc(c−1)/(N(N−1)) exact in ppm — the
      // probability two random trigrams collide, the lexical-diversity
      // telemetry next to q369's lexical Gini and q624's richness.
      val grams = rd(s, dir, "documents")
        .select(col("source"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 3)
        .select(col("source"), explode(expr(
          """transform(sequence(0, size(w) - 3),
            |  i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"""
            .stripMargin)).as("t"))
      grams.groupBy(col("source"), col("t"))
        .agg(count(lit(1)).cast("long").as("c"))
        .groupBy(col("source"))
        .agg(count(lit(1)).cast("long").as("vocab"),
             sum(col("c")).cast("long").as("n"),
             expr("""CAST((1000000 * sum(c*(c-1)))
                    | DIV (sum(c) * (sum(c)-1)) AS BIGINT)"""
               .stripMargin).as("simpson_conc_ppm"))
        .withColumn("gini_simpson_ppm",
                    (lit(1000000L) - col("simpson_conc_ppm")))
    }),
    "q619_two_way_anova" -> ((s, dir) => {
      // Two-way ANOVA decomposition (region × priority on order cents):
      // main-effect, interaction and within sums of squares against the
      // quantized cell/margin means (every mean one pinned DIV, SSW
      // exact against the quantized cell mean — q556's identity), the
      // four variance shares in ppm. One fact pass to the 25-cell
      // sufficient statistics.
      val cell = rd(s, dir, "orders")
        .join(broadcast(rd(s, dir, "customer")
                .select("c_custkey", "c_nationkey")),
              col("o_custkey") === col("c_custkey"))
        .join(broadcast(rd(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(rd(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .select(col("r_name").as("a"), col("o_orderpriority").as("b"),
                expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("y"))
        .groupBy(col("a"), col("b"))
        .agg(count(lit(1)).cast("long").as("n"),
             sum(col("y")).cast("long").as("s"),
             sum((col("y") * col("y")).cast("decimal(38,0)")).as("s2"))
        .localCheckpoint(false)
      val g = cell.agg(sum(col("n")).cast("long").as("gn"),
                       sum(col("s")).cast("long").as("gs"))
        .withColumn("gm", expr("gs DIV gn"))
      val am = cell.groupBy(col("a"))
        .agg(expr("sum(s) DIV sum(n)").as("am"),
             sum(col("n")).cast("long").as("an"))
      val bmr = cell.groupBy(col("b"))
        .agg(expr("sum(s) DIV sum(n)").as("bm"),
             sum(col("n")).cast("long").as("bn"))
      val ssa = am.crossJoin(broadcast(g))
        .agg(sum(expr("CAST(an * (am - gm) * (am - gm)" +
                      " AS DECIMAL(38,0))")).as("ssa"))
      val ssb = bmr.crossJoin(broadcast(g))
        .agg(sum(expr("CAST(bn * (bm - gm) * (bm - gm)" +
                      " AS DECIMAL(38,0))")).as("ssb"))
      val ssab = cell.join(broadcast(am), Seq("a"))
        .join(broadcast(bmr), Seq("b")).crossJoin(broadcast(g))
        .agg(sum(expr(
          """CAST(n * (s DIV n - am - bm + gm)
            |  * (s DIV n - am - bm + gm) AS DECIMAL(38,0))"""
            .stripMargin)).as("ssab"))
      val ssw = cell.agg(sum(expr(
          """s2 - 2 * CAST(s DIV n AS DECIMAL(38,0)) * s
            | + CAST(n AS DECIMAL(38,0)) * (s DIV n) * (s DIV n)"""
            .stripMargin)).as("ssw"))
      ssa.crossJoin(broadcast(ssb)).crossJoin(broadcast(ssab))
        .crossJoin(broadcast(ssw))
        .select(
          expr("CAST((1000000 * ssa) DIV (ssa+ssb+ssab+ssw) AS BIGINT)")
            .as("region_share_ppm"),
          expr("CAST((1000000 * ssb) DIV (ssa+ssb+ssab+ssw) AS BIGINT)")
            .as("priority_share_ppm"),
          expr("CAST((1000000 * ssab) DIV (ssa+ssb+ssab+ssw) AS BIGINT)")
            .as("interaction_share_ppm"),
          expr("CAST((1000000 * ssw) DIV (ssa+ssb+ssab+ssw) AS BIGINT)")
            .as("within_share_ppm"))
    }),
    "q620_rbo" -> ((s, dir) => {
      // Rank-biased overlap (p = 9/10, depth 10) between the brand
      // ranking by revenue and by volume: p^(d−1) is RATIONAL with
      // denominator 10^(d−1), so every term is one pinned ppb DIV
      // (9^9·1e9·10 < 2^63 — documented bound). The top-weighted
      // rank-similarity IR metric next to footrule (q335).
      val br = rd(s, dir, "lineitem")
        .join(broadcast(rd(s, dir, "part").select("p_partkey", "p_brand")),
              col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand").as("brand"))
        .agg(sum(expr("CAST(floor(l_extendedprice * 100) AS BIGINT)"))
               .cast("long").as("rev"),
             count(lit(1)).cast("long").as("cnt"))
        .localCheckpoint(false)
      val wA = Window.partitionBy(DimKey.one)
        .orderBy(col("rev").desc, col("brand"))
      val wB = Window.partitionBy(DimKey.one)
        .orderBy(col("cnt").desc, col("brand"))
      val ra = br.withColumn("r", row_number().over(wA))
        .select(col("brand"), col("r").as("ra"))
      val rb = br.withColumn("r", row_number().over(wB))
        .select(col("brand"), col("r").as("rb"))
      val ov = s.range(1, 11).select(col("id").as("d"))
        .join(ra.join(rb, Seq("brand")), col("ra") <= col("d") &&
                                         col("rb") <= col("d"))
        .groupBy(col("d"))
        .agg(count(lit(1)).cast("long").as("inter"))
      ov.select(col("d"), col("inter"),
          expr("""CAST((1000000000 * CAST(pow(9, d-1) AS BIGINT)
                 |  * inter)
                 | DIV (CAST(pow(10, d) AS BIGINT) * d) AS BIGINT)"""
            .stripMargin).as("term_ppb"))
        .agg(sum(col("term_ppb")).cast("long").as("rbo10_ppb"),
             max(when(col("d") === 10, col("inter"))).cast("long")
               .as("inter_at_10"))
    }),
    "q621_state_store_reader" -> ((s, dir) => {
      // Spark 4's STATE STORE DATA SOURCE: after an update-mode
      // streaming aggregation drains, `spark.read.format("statestore")`
      // opens the checkpoint and returns the operator's live state as a
      // DataFrame — the ops/debugging surface for stateful pipelines.
      // The state rows (running per-type counts) must equal the batch
      // rollup of the same feed, re-derived by the oracle.
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val rows = Tables.events(s, dir).filter(col("user_id") % 5 === 4)
        .select(col("event_id"), col("event_type"))
        .as[(Long, String)].collect().toSeq
      val src = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)]
      src.addData(rows.filter(_._1 % 2 == 0): _*)
      src.addData(rows.filter(_._1 % 2 == 1): _*)
      val ckpt = java.nio.file.Files
        .createTempDirectory("q621_ssr").toString
      val tbl = "q621_ss_" + java.util.UUID.randomUUID.toString
        .replace("-", "")
      SparkEntry.withStreamShuffle(s) {
        val q = src.toDF().toDF("event_id", "event_type")
          .groupBy(col("event_type")).count()
          .writeStream.format("memory").queryName(tbl)
          .outputMode("update")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      s.read.format("statestore").load(ckpt)
        .select(col("key.event_type").as("event_type"),
                col("value.count").cast("long").as("n"))
    }),
    "q622_median_polish" -> ((s, dir) => {
      // Tukey median polish (2 full row+column sweeps) of the
      // month-of-year × year order-count matrix — the OUTLIER-ROBUST
      // decomposition next to the mean-based q562: each sweep subtracts
      // doubled medians (min+max of the two middle order stats keeps
      // everything integral; residuals ×16 after four halvings).
      val m = rd(s, dir, "orders")
        .filter(expr("year(o_orderdate) BETWEEN 1995 AND 2000"))
        .groupBy(expr("CAST(month(o_orderdate) AS BIGINT)").as("mo"),
                 expr("CAST(year(o_orderdate) AS BIGINT)").as("yr"))
        .agg(count(lit(1)).cast("long").as("y"))
        .localCheckpoint(false)
      def sweep(df: DataFrame, part: String): DataFrame = {
        val w = Window.partitionBy(col(part)).orderBy(col("y"))
        val wc = Window.partitionBy(col(part))
        val med = df
          .withColumn("rn", row_number().over(w))
          .withColumn("cnt", count(lit(1)).over(wc))
          .filter(col("rn") === expr("(cnt + 1) DIV 2") ||
                  col("rn") === expr("(cnt + 2) DIV 2"))
          .groupBy(col(part))
          .agg((min(col("y")) + max(col("y"))).as("m2"))
        df.join(broadcast(med), Seq(part))
          .select(col("mo"), col("yr"),
                  (lit(2L) * col("y") - col("m2")).as("y"))
      }
      val out = sweep(sweep(sweep(sweep(m, "mo"), "yr"), "mo"), "yr")
      out.select(col("mo"), col("yr"), col("y").as("residual_x16"))
    }),
    "q623_capture_recapture" -> ((s, dir) => {
      // Lincoln–Petersen / Chapman capture-recapture population
      // estimate: samples = customers active in 1996 and in 1997,
      // overlap = recaptures — the mark-recapture estimator for "how
      // many active customers exist beyond what either year saw".
      // Two distinct sets + one join; estimators as pinned DIVs.
      val o = rd(s, dir, "orders")
      def yr(y: Int) = o.filter(expr(s"year(o_orderdate) = $y"))
        .select(col("o_custkey").as("ck")).distinct()
      val a = yr(1996).localCheckpoint(false)
      val b = yr(1997).localCheckpoint(false)
      val n1 = a.agg(count(lit(1)).cast("long").as("n1"))
      val n2 = b.agg(count(lit(1)).cast("long").as("n2"))
      val mm = a.join(b, Seq("ck"))
        .agg(count(lit(1)).cast("long").as("m"))
      n1.crossJoin(broadcast(n2)).crossJoin(broadcast(mm))
        .withColumn("lincoln_petersen", expr("(n1 * n2) DIV m"))
        .withColumn("chapman",
                    expr("((n1+1) * (n2+1)) DIV (m+1) - 1"))
    }),
    "q624_chao1_richness" -> ((s, dir) => {
      // Chao1 species-richness and Good–Turing coverage of the corpus
      // TRIGRAM vocabulary: richness = V + f1²/(2·f2) from the
      // frequency-of-frequencies, coverage = 1 − f1/N — the "how much
      // vocabulary have we NOT seen yet" estimators that size a corpus
      // crawl; one token pass + two rollups.
      val grams = rd(s, dir, "documents")
        .select(split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 3)
        .select(explode(expr(
          """transform(sequence(0, size(w) - 3),
            |  i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"""
            .stripMargin)).as("t"))
      val vc = grams.groupBy(col("t"))
        .agg(count(lit(1)).cast("long").as("c"))
      vc.agg(count(lit(1)).cast("long").as("vocab"),
             sum(col("c")).cast("long").as("tokens"),
             sum(when(col("c") === 1L, 1L).otherwise(0L)).cast("long")
               .as("f1"),
             sum(when(col("c") === 2L, 1L).otherwise(0L)).cast("long")
               .as("f2"))
        .withColumn("chao1_richness",
                    expr("vocab + (f1 * f1) DIV (2 * f2)"))
        .withColumn("good_turing_coverage_ppm",
                    expr("1000000 - (1000000 * f1) DIV tokens"))
    }),
    "q615_graph_evolution" -> ((s, dir) => {
      // Temporal graph evolution: the 1996 vs 1997 co-trade edge sets
      // (≥20 shipments per year) — stable / removed / added edges and
      // the edge-set Jaccard in ppm. One year-partitioned rollup, two
      // anti-joins; the drift telemetry for any periodically-rebuilt
      // graph artifact.
      val li = rd(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
      val o = rd(s, dir, "orders").select("o_orderkey", "o_custkey",
                                          "o_orderdate")
      val c = rd(s, dir, "customer").select("c_custkey", "c_nationkey")
      val su = rd(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val e = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .filter(col("c_nationkey") =!= col("s_nationkey") &&
                expr("year(o_orderdate) IN (1996, 1997)"))
        .groupBy(expr("year(o_orderdate)").as("yr"),
                 least(col("c_nationkey"), col("s_nationkey")).as("x"),
                 greatest(col("c_nationkey"), col("s_nationkey"))
                   .as("y"))
        .agg(count(lit(1)).as("_n"))
        .filter(col("_n") >= 20L)
        .select("yr", "x", "y").localCheckpoint(false)
      val a = e.filter(col("yr") === 1996).select("x", "y")
      val b = e.filter(col("yr") === 1997).select("x", "y")
      val stable = a.join(b, Seq("x", "y"))
        .agg(count(lit(1)).cast("long").as("stable"))
      val removed = a.join(b, Seq("x", "y"), "left_anti")
        .agg(count(lit(1)).cast("long").as("removed"))
      val added = b.join(a, Seq("x", "y"), "left_anti")
        .agg(count(lit(1)).cast("long").as("added"))
      stable.crossJoin(broadcast(removed)).crossJoin(broadcast(added))
        .withColumn("edge_jaccard_ppm", expr(
          "(1000000 * stable) DIV (stable + removed + added)"))
    }),
    "q616_preferential_attachment" -> ((s, dir) => {
      // Preferential-attachment ("rich get richer") audit: Spearman
      // rank correlation between a node's 1996 degree and its 1997
      // degree GAIN — doubled tie-average ranks (exact ints), signed r²
      // via the two-pinned-DIV product (q574's sqrt-free form). Over
      // the ≤25-node dimension graph after one year-keyed rollup.
      val li = rd(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
      val o = rd(s, dir, "orders").select("o_orderkey", "o_custkey",
                                          "o_orderdate")
      val c = rd(s, dir, "customer").select("c_custkey", "c_nationkey")
      val su = rd(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val e = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .filter(col("c_nationkey") =!= col("s_nationkey") &&
                expr("year(o_orderdate) IN (1996, 1997)"))
        .groupBy(expr("year(o_orderdate)").as("yr"),
                 least(col("c_nationkey"), col("s_nationkey")).as("x"),
                 greatest(col("c_nationkey"), col("s_nationkey"))
                   .as("y"))
        .agg(count(lit(1)).cast("long").as("_n"))
        .filter(col("_n") >= 20L)
      val deg = e.select(col("yr"), col("x").as("v"), col("_n"))
        .unionByName(e.select(col("yr"), col("y").as("v"), col("_n")))
        .groupBy(col("v"))
        .agg(sum(when(col("yr") === 1996, col("_n")).otherwise(0L))
               .cast("long").as("d96"),
             sum(when(col("yr") === 1997, col("_n")).otherwise(0L))
               .cast("long").as("d97"))
      val rk = rankX2(
        rankX2(deg.withColumn("gain", col("d97") - col("d96")),
               Seq.empty, col("d96"))
          .withColumnRenamed("rank_x2", "r1"),
        Seq.empty, col("gain"))
        .withColumnRenamed("rank_x2", "r2")
      rk.agg(count(lit(1)).cast("long").as("n"),
             sum(col("r1")).cast("decimal(38,0)").as("s1"),
             sum(col("r2")).cast("decimal(38,0)").as("s2"),
             sum(col("r1") * col("r1")).cast("decimal(38,0)").as("s11"),
             sum(col("r2") * col("r2")).cast("decimal(38,0)").as("s22"),
             sum(col("r1") * col("r2")).cast("decimal(38,0)").as("s12"))
        .select(col("n").as("n_nodes"),
          expr("""CAST(CASE
                 | WHEN n*s11 - s1*s1 = 0 OR n*s22 - s2*s2 = 0 THEN 0
                 | WHEN n*s12 - s1*s2 >= 0
                 | THEN (((1000000 * (n*s12 - s1*s2))
                 |     DIV (n*s11 - s1*s1))
                 |   * ((1000000 * (n*s12 - s1*s2))
                 |     DIV (n*s22 - s2*s2))) DIV 1000000
                 | ELSE -((((1000000 * (s1*s2 - n*s12))
                 |     DIV (n*s11 - s1*s1))
                 |   * ((1000000 * (s1*s2 - n*s12))
                 |     DIV (n*s22 - s2*s2))) DIV 1000000)
                 | END AS BIGINT)""".stripMargin)
            .as("spearman_r2_signed_ppm"))
    }),
    "q617_triplet_mining" -> ((s, dir) => {
      // Metric-learning triplet mining: per anchor its HARDEST positive
      // (least-similar same-label vector) and HARDEST negative (most-
      // similar different-label vector), plus the margin-violation flag
      // (neg + 0.05 > pos) — the batch-hard sampler contrastive/triplet
      // training uses; one broadcast of the anchors, two ranked passes.
      import graft.operators.Similarity
      val e = rd(s, dir, "embeddings")
      val anchors = e.filter(col("vec_id") < 24)
        .select(col("vec_id").as("aid"), col("label").as("alab"),
                col("embedding").as("av"))
      val scored = e.select(col("vec_id").as("cid"),
                            col("label").as("clab"),
                            col("embedding").as("cv"))
        .join(broadcast(anchors), col("cid") =!= col("aid"))
        .withColumn("c", Similarity.cosine(col("av"), col("cv")))
        .localCheckpoint(false)
      val wPos = Window.partitionBy(col("aid"))
        .orderBy(col("c").asc, col("cid"))
      val pos = scored.filter(col("clab") === col("alab"))
        .withColumn("rn", row_number().over(wPos))
        .filter(col("rn") === 1)
        .select(col("aid"), col("cid").as("pos_id"), col("c").as("pc"))
      val wNeg = Window.partitionBy(col("aid"))
        .orderBy(col("c").desc, col("cid"))
      val neg = scored.filter(col("clab") =!= col("alab"))
        .withColumn("rn", row_number().over(wNeg))
        .filter(col("rn") === 1)
        .select(col("aid"), col("cid").as("neg_id"), col("c").as("nc"))
      pos.join(neg, Seq("aid"))
        .select(col("aid").cast("long").as("anchor_id"),
                col("pos_id").cast("long").as("hardest_positive_id"),
                round(col("pc"), 4).as("pos_cosine"),
                col("neg_id").cast("long").as("hardest_negative_id"),
                round(col("nc"), 4).as("neg_cosine"),
                when(col("nc") + 0.05 > col("pc"), 1L).otherwise(0L)
                  .as("margin_violation"))
    }),
    "q618_trading_day_adjust" -> ((s, dir) => {
      // Trading-day adjustment (X-11 style calendar correction): the
      // expected monthly volume from each month's weekday composition ×
      // the global per-weekday daily rate (pinned milli DIVs), and the
      // calendar-corrected residual. One daily rollup feeds both the
      // weekday rates and the month profile.
      val days = rd(s, dir, "orders")
        .groupBy(expr("CAST(o_orderdate AS DATE)").as("d"))
        .agg(count(lit(1)).cast("long").as("n"))
        .localCheckpoint(false)
      val dow = days.groupBy(expr("dayofweek(d)").as("dw"))
        .agg(sum(col("n")).cast("long").as("tot"),
             count(lit(1)).cast("long").as("ndays"))
      val mo = days.groupBy(
          expr("CAST((year(d) - 1995) * 12 + month(d) - 1 AS BIGINT)")
            .as("mi"),
          expr("dayofweek(d)").as("dw"))
        .agg(count(lit(1)).cast("long").as("ndw"),
             sum(col("n")).cast("long").as("actual_part"))
      mo.join(broadcast(dow), Seq("dw"))
        .groupBy(col("mi"))
        .agg(sum(col("actual_part")).cast("long").as("actual"),
             sum(expr("(1000 * ndw * tot) DIV ndays")).cast("long")
               .as("expected_milli"))
        .withColumn("residual_milli",
                    expr("1000 * actual - expected_milli"))
    }),
    "q610_shift_share" -> ((s, dir) => {
      // Shift-share decomposition of 1996→1997 order growth per
      // (region, priority): national-growth, industry-mix and local-
      // competitiveness components, each a pinned milli-unit DIV with
      // cross-multiplied sign folds (no rational subtraction ever
      // materializes). The BI growth-attribution standard; one fact
      // rollup feeds the 25-cell grid.
      val cell = rd(s, dir, "orders")
        .filter(expr("year(o_orderdate) IN (1996, 1997)"))
        .join(broadcast(rd(s, dir, "customer")
                .select("c_custkey", "c_nationkey")),
              col("o_custkey") === col("c_custkey"))
        .join(broadcast(rd(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(rd(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name").as("reg"), col("o_orderpriority").as("pri"))
        .agg(sum(expr("CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END"))
               .cast("long").as("n96"),
             sum(expr("CASE WHEN year(o_orderdate) = 1997 THEN 1 ELSE 0 END"))
               .cast("long").as("n97"))
        .localCheckpoint(false)
      val nat = cell.agg(sum(col("n96")).cast("long").as("t96"),
                         sum(col("n97")).cast("long").as("t97"))
      val ind = cell.groupBy(col("pri"))
        .agg(sum(col("n96")).cast("long").as("i96"),
             sum(col("n97")).cast("long").as("i97"))
      cell.crossJoin(broadcast(nat)).join(broadcast(ind), Seq("pri"))
        .select(col("reg"), col("pri"), col("n96"), col("n97"),
          (col("n97") - col("n96")).as("actual_change_x1"),
          expr("""CAST(CASE WHEN t97 >= t96
                 | THEN (1000 * n96 * (t97 - t96)) DIV t96
                 | ELSE -((1000 * n96 * (t96 - t97)) DIV t96)
                 | END AS BIGINT)""".stripMargin).as("national_milli"),
          expr("""CAST(CASE WHEN i97*t96 >= i96*t97
                 | THEN (1000 * n96 * (i97*t96 - i96*t97))
                 |   DIV (i96*t96)
                 | ELSE -((1000 * n96 * (i96*t97 - i97*t96))
                 |   DIV (i96*t96)) END AS BIGINT)""".stripMargin)
            .as("mix_milli"),
          expr("""CAST(CASE WHEN n97*i96 >= n96*i97
                 | THEN (1000 * (n97*i96 - n96*i97)) DIV i96
                 | ELSE -((1000 * (n96*i97 - n97*i96)) DIV i96)
                 | END AS BIGINT)""".stripMargin).as("local_milli"))
    }),
    "q611_concentration_index" -> ((s, dir) => {
      // Concentration index: revenue concentration ranked by a
      // DIFFERENT variable (order frequency — the tenure proxy), the
      // health-economics generalization of Gini (q181): C = 2·Σ r·rev /
      // (n·total) − (n+1)/n, one sign-folded DIV over exact ints; ranks
      // from cellRank, never a global sort.
      val cust = rd(s, dir, "orders")
        .groupBy(col("o_custkey").as("ck"))
        .agg(count(lit(1)).cast("long").as("freq"),
             sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
               .cast("long").as("rev"))
      Profile.cellRank(cust, Seq.empty, "freq", Seq("ck"))
        .agg(count(lit(1)).cast("long").as("n"),
             sum(col("_rank") * col("rev")).cast("decimal(38,0)")
               .as("srr"),
             sum(col("rev")).cast("long").as("tot"))
        .select(col("n").as("n_customers"),
          expr("""CAST(CASE
                 | WHEN 2*srr - CAST((n+1) AS DECIMAL(38,0))*tot >= 0
                 | THEN (1000000 * (2*srr
                 |     - CAST((n+1) AS DECIMAL(38,0))*tot))
                 |   DIV (CAST(n AS DECIMAL(38,0))*tot)
                 | ELSE -((1000000 * (CAST((n+1) AS DECIMAL(38,0))*tot
                 |     - 2*srr))
                 |   DIV (CAST(n AS DECIMAL(38,0))*tot))
                 | END AS BIGINT)""".stripMargin)
            .as("concentration_ppm"))
    }),
    "q612_design_effect" -> ((s, dir) => {
      // Survey design effect for customer-clustered order values:
      // ICC-proxy = SSB/(SSB+SSW) from the per-cluster sufficient
      // statistics (s1, s2) with one pinned per-cluster DIV, DEFF =
      // 1 + (m̄−1)·ICC in ppm — what cluster sampling costs versus SRS.
      // One combine-enabled aggregate per cluster, then a 5-number
      // rollup; DECIMAL(38)/HUGEINT for the squared sums.
      val g = rd(s, dir, "orders")
        .select(col("o_custkey").as("ck"),
                expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("y"))
        .groupBy(col("ck"))
        .agg(count(lit(1)).cast("long").as("m"),
             sum(col("y")).cast("long").as("s1"),
             sum((col("y") * col("y")).cast("decimal(38,0)")).as("s2"))
      g.agg(sum(col("m")).cast("long").as("n"),
            count(lit(1)).cast("long").as("k"),
            sum(col("s1")).cast("decimal(38,0)").as("st"),
            sum(col("s2")).as("s2t"),
            sum(expr("CAST((s1 * s1) DIV m AS DECIMAL(38,0))"))
              .as("ssb_q"))
        // st²/n exceeds int64, and Spark's DIV returns LONG — do the
        // floor division in DECIMAL as (x − x % n) / n (exact; operands
        // non-negative so truncation == floor, matching HUGEINT //)
        .select(col("n").as("n_orders"), col("k").as("n_clusters"),
                expr("""ssb_q - CAST((st*st - (st*st) % n) / n
                       | AS DECIMAL(38,0))""".stripMargin).as("ssb"),
                expr("s2t - ssb_q").as("ssw"), col("n"), col("k"))
        .select(col("n_orders"), col("n_clusters"),
          expr("CAST((1000000 * ssb) DIV (ssb + ssw) AS BIGINT)")
            .as("icc_proxy_ppm"),
          expr("CAST((1000 * n) DIV k AS BIGINT)").as("mbar_milli"),
          expr("""CAST(1000000 + (((1000 * n) DIV k - 1000)
                 |  * ((1000000 * ssb) DIV (ssb + ssw))) DIV 1000
                 | AS BIGINT)""".stripMargin).as("deff_ppm"))
    }),
    "q613_xmr_chart" -> ((s, dir) => {
      // XmR (individuals + moving range) control chart over the monthly
      // order-count series — the canonical SPC chart: CL = x̄, limits
      // x̄ ± 2.66·M̄R, the out-of-control test cross-multiplied so no
      // rational ever materializes (|1000·n·nm·y − 1000·Σy·nm| >
      // 2660·ΣMR·n). Emits the flag per month plus the milli-unit
      // center and half-width.
      val m = monthlySeries(s, dir).localCheckpoint(false)
      val mr = m.as("a").join(m.as("b"), col("b.mi") === col("a.mi") - 1)
        .select(abs(col("a.y") - col("b.y")).as("mr"))
      val gg = m.agg(count(lit(1)).cast("long").as("n"),
                     sum(col("y")).cast("long").as("sy"))
      val gm = mr.agg(count(lit(1)).cast("long").as("nm"),
                      sum(col("mr")).cast("long").as("smr"))
      m.crossJoin(broadcast(gg)).crossJoin(broadcast(gm))
        .select(col("mi"), col("y"),
          expr("""CAST(CASE WHEN abs(1000 * n * nm * y
                 |    - 1000 * sy * nm) > 2660 * smr * n
                 | THEN 1 ELSE 0 END AS BIGINT)""".stripMargin)
            .as("out_of_control"),
          expr("CAST((1000 * sy) DIV n AS BIGINT)").as("center_milli"),
          expr("CAST((2660 * smr) DIV nm AS BIGINT)")
            .as("limit_halfwidth_milli"))
    }),
    "q614_data_vault_load" -> ((s, dir) => {
      // Data-vault modeling load (the dbt-world warehouse pattern the
      // reference package lives next to): hub keys, link keys, and a
      // satellite HASHDIFF computed for two loads (pre-1997 state vs
      // full) — changed vs unchanged satellite rows are exactly the
      // delta the vault's insert-only satellite appends. md5 business
      // keys match the engine's surrogate-hash convention.
      val c = rd(s, dir, "customer").select(col("c_custkey"))
        .localCheckpoint(false)
      val o = rd(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
                col("o_orderpriority"))
        .localCheckpoint(false)
      def sat(filtered: DataFrame) = c
        .join(filtered, col("o_custkey") === col("c_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(md5(concat_ws("|",
               count(col("o_orderkey")).cast("string"),
               coalesce(max(col("o_orderpriority")), lit(""))))
             .as("hashdiff"))
      val s1 = sat(o.filter(
        col("o_orderdate") < lit("1997-01-01").cast("timestamp")))
      val s2 = sat(o)
      val hub = c.select(md5(col("c_custkey").cast("string")).as("hk"))
        .distinct().agg(count(lit(1)).cast("long").as("hub_rows"))
      val link = o.select(md5(concat_ws("|",
          col("o_orderkey").cast("string"),
          col("o_custkey").cast("string"))).as("lk"))
        .distinct().agg(count(lit(1)).cast("long").as("link_rows"))
      val satDelta = s1.as("s1").join(s2.as("s2"), Seq("c_custkey"))
        .agg(sum(when(col("s1.hashdiff") =!= col("s2.hashdiff"), 1L)
                   .otherwise(0L)).cast("long").as("sat_changed"),
             sum(when(col("s1.hashdiff") === col("s2.hashdiff"), 1L)
                   .otherwise(0L)).cast("long").as("sat_unchanged"))
      hub.crossJoin(broadcast(link)).crossJoin(broadcast(satDelta))
    }),
    "q607_semantic_chunking" -> ((s, dir) => {
      // Semantic chunk-boundary detection (TextTiling shape): 20-token
      // blocks per document, adjacent-block distinct-token Jaccard in
      // pinned ppm, boundary where cohesion < 0.15 — the
      // topic-boundary chunker that replaces fixed-length splitting
      // (q118) for RAG corpora. Everything runs at (doc, block) grain.
      val toks = rd(s, dir, "documents").filter(col("doc_id") < 60)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
      val bt = toks
        .select(col("doc_id"), posexplode(col("w")).as(Seq("i", "tok")))
        .select(col("doc_id"), expr("i DIV 20").as("b"), col("tok"))
        .distinct()
      val sizes = bt.groupBy(col("doc_id"), col("b"))
        .agg(count(lit(1)).cast("long").as("n"))
        .localCheckpoint(false)
      val inter = bt.as("a").join(bt.as("b2"),
          col("b2.doc_id") === col("a.doc_id") &&
          col("b2.b") === col("a.b") + 1 &&
          col("b2.tok") === col("a.tok"))
        .groupBy(col("a.doc_id").as("doc_id"), col("a.b").as("b"))
        .agg(count(lit(1)).cast("long").as("i"))
      sizes.as("sa").join(sizes.as("sb"),
          col("sb.doc_id") === col("sa.doc_id") &&
          col("sb.b") === col("sa.b") + 1)
        .join(inter.as("inter"),
              col("inter.doc_id") === col("sa.doc_id") &&
              col("inter.b") === col("sa.b"), "left")
        .na.fill(0L, Seq("i"))
        .select(col("sa.doc_id").cast("long").as("doc_id"),
                (col("sa.b") + 1).cast("long").as("boundary_block"),
                expr("(1000000 * i) DIV (sa.n + sb.n - i)")
                  .as("jaccard_ppm"))
        .filter(col("jaccard_ppm") < 150000L)
    }),
    "q608_count_distinct_expand" -> ((s, dir) => {
      // Multiple count(DISTINCT) in one aggregate as an engine
      // contract: Spark must plan the Expand decomposition (one scan,
      // grouping-id replicated rows, partial aggregation) instead of N
      // self-joins — asserted on the physical plan, values re-derived
      // by the oracle. Monthly distinct customers / clerks-proxy /
      // price points over orders.
      val out = rd(s, dir, "orders")
        .groupBy(expr("CAST(year(o_orderdate) AS BIGINT)").as("yr"))
        .agg(countDistinct(col("o_custkey")).as("n_custs"),
             countDistinct(col("o_orderpriority")).as("n_prios"),
             countDistinct(expr("CAST(floor(o_totalprice) AS BIGINT)"))
               .as("n_prices"))
      val plan = out.queryExecution.executedPlan
      def hasExpand(p: org.apache.spark.sql.execution.SparkPlan)
          : Boolean =
        p.isInstanceOf[org.apache.spark.sql.execution.ExpandExec] ||
          p.children.exists(hasExpand) ||
          (p match {
            case a: org.apache.spark.sql.execution.adaptive
                     .AdaptiveSparkPlanExec => hasExpand(a.executedPlan)
            case _ => false
          })
      require(hasExpand(plan),
              "multi-distinct did not plan the Expand decomposition")
      out
    }),
    "q609_knn_label_propagation" -> ((s, dir) => {
      // Semi-supervised kNN label propagation: top-3 cosine neighbors
      // per vector (one ranked pass), seeds keep their labels
      // (vec_id < 100), two majority-vote rounds (ties → smaller
      // label), then the coverage/accuracy audit against ground truth.
      // The transductive labeling pass that bootstraps classifier
      // training data from a small seed set.
      import graft.operators.Similarity
      val e = rd(s, dir, "embeddings")
        .select(col("vec_id"), col("label").cast("long").as("label"),
                col("embedding"))
        .localCheckpoint(false)
      // norms precomputed per vector: one fold per PAIR instead of
      // three (float-identical — same trick as bruteForceTopK)
      val scored = e.select(col("vec_id").as("i"),
                            col("embedding").as("qv"),
                            Similarity.norm2(col("embedding")).as("qn"))
        .join(e.select(col("vec_id").as("j"),
                       col("embedding").as("cv"),
                       Similarity.norm2(col("embedding")).as("cn")),
              col("j") =!= col("i"))
        .withColumn("c", Similarity.dot(col("qv"), col("cv")) /
                         sqrt(col("qn") * col("cn")))
      val w = Window.partitionBy(col("i"))
        .orderBy(col("c").desc, col("j"))
      val knn = scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3).select("i", "j")
        .localCheckpoint(false)
      var l = e.select(col("vec_id").as("v"),
        when(col("vec_id") < 100, col("label")).as("lab"))
        .localCheckpoint(false)
      for (_ <- 1 to 2) {
        val wVote = Window.partitionBy(col("i"))
          .orderBy(col("cnt").desc, col("lab"))
        val m = knn.join(l.select(col("v").as("j"),
                                  col("lab").as("nlab")), Seq("j"))
          .filter(col("nlab").isNotNull)
          .groupBy(col("i"), col("nlab").as("lab"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("rn", row_number().over(wVote))
          .filter(col("rn") === 1)
          .select(col("i").as("v"), col("lab").as("mlab"))
        l = l.join(m, Seq("v"), "left")
          .select(col("v"), coalesce(col("lab"), col("mlab")).as("lab"))
          .localCheckpoint(false)
      }
      l.join(e.select(col("vec_id").as("v"), col("label")), Seq("v"))
        .agg(sum(when(col("lab").isNotNull, 1L).otherwise(0L))
               .cast("long").as("n_labeled"),
             sum(when(col("lab").isNull, 1L).otherwise(0L))
               .cast("long").as("n_unlabeled"),
             sum(when(col("v") >= 100 && col("lab") === col("label"),
                      1L).otherwise(0L)).cast("long").as("n_correct"),
             sum(when(col("v") >= 100 && col("lab").isNotNull, 1L)
                   .otherwise(0L)).cast("long").as("n_predicted"))
    }),
    "q601_transitive_reduction" -> ((s, dir) => {
      // Transitive reduction of the low-to-high nation trade DAG (arcs
      // src < dst by construction, so acyclic): an arc is redundant iff
      // a ≥2-hop path connects its endpoints — closure via 5 doubling
      // rounds (2⁵ = 32 ≥ the longest possible chain on 25 ranked
      // nations — provably exact) composed once with the arcs. The
      // dependency-minimization pass a scheduler runs before
      // materializing a DAG.
      val li = rd(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
      val o = rd(s, dir, "orders").select("o_orderkey", "o_custkey")
      val c = rd(s, dir, "customer").select("c_custkey", "c_nationkey")
      val su = rd(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val arcs = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .filter(col("c_nationkey") < col("s_nationkey"))
        .groupBy(col("c_nationkey").cast("long").as("src"),
                 col("s_nationkey").cast("long").as("dst"))
        .agg(count(lit(1)).as("_n"))
        .filter(col("_n") >= 150L)
        .select("src", "dst").localCheckpoint(false)
      val r5 = (1 to 5).foldLeft(arcs) { (r, _) =>
        r.as("a").join(r.as("b"), col("b.src") === col("a.dst"))
          .select(col("a.src").as("src"), col("b.dst").as("dst"))
          .unionByName(r).distinct().localCheckpoint(false)
      }
      val ge2 = arcs.as("a")
        .join(r5.as("b"), col("b.src") === col("a.dst"))
        .select(col("a.src").as("src"), col("b.dst").as("dst"))
        .distinct()
      arcs.join(ge2.withColumn("_hit", lit(1)), Seq("src", "dst"), "left")
        .select(col("src"), col("dst"),
                when(col("_hit").isNull, 1L).otherwise(0L)
                  .as("in_reduction"))
    }),
    "q602_girth" -> ((s, dir) => {
      // Girth audit: for each edge of the thresholded trade graph, the
      // shortest ALTERNATIVE path between its endpoints (BFS in G∖{e});
      // cycle length through the edge = 1 + that distance, graph girth
      // = the minimum. Schema-bounded nation graph → gated driver BFS
      // after the one rollup (union-find precedent), degrading past the
      // gate to one labeled level-synchronous BFS over all edges at once
      // (Graph.girthPerEdge) instead of throwing; the oracle recomputes
      // via min-plus doubling (provably exact in 5 rounds).
      graft.operators.Graph.girthPerEdge(
        tradeEdges(s, dir, 300L).select(col("src"), col("dst")))
    }),
    "q603_percolation_sweep" -> ((s, dir) => {
      // Percolation / connectivity phase sweep: connected-component
      // structure of the trade graph across a threshold ladder — nodes,
      // edges, component count, and giant-component size per threshold.
      // One weighted rollup feeds every threshold; the CC runs gated on
      // the driver (schema-bounded graph), degrading past the gate to
      // per-threshold Dedup.clusterPairs (Graph.percolationSweep) instead
      // of throwing; the oracle via per-threshold doubling closure. The
      // robustness curve behind "at what volume does the trade network
      // fragment?".
      graft.operators.Graph.percolationSweep(
        tradeEdges(s, dir, 110L).select(col("src"), col("dst"), col("n")),
        Seq(110L, 150L, 200L, 250L, 300L, 350L))
    }),
    "q604_decorrelation_parity" -> ((s, dir) => {
      // Correlated-subquery decorrelation as an engine contract: an
      // EXISTS predicate plus two correlated scalar subqueries (per-
      // customer max/min order cents) rolled up by nation — Spark must
      // rewrite all three into joins/aggregates; the plan is asserted
      // free of nested-loop/cartesian operators, and the values match
      // DuckDB running the IDENTICAL correlated SQL.
      rd(s, dir, "customer").createOrReplaceTempView("q604_c")
      rd(s, dir, "orders").createOrReplaceTempView("q604_o")
      val out = s.sql(
        """SELECT CAST(c.c_nationkey AS BIGINT) AS nationkey,
          |  CAST(count(*) AS BIGINT) AS n_customers
          |FROM q604_c c
          |WHERE EXISTS (SELECT 1 FROM q604_o o
          |              WHERE o.o_custkey = c.c_custkey)
          |  AND (SELECT max(CAST(floor(o_totalprice * 100) AS BIGINT))
          |       FROM q604_o o WHERE o.o_custkey = c.c_custkey)
          |    > 3 * (SELECT min(CAST(floor(o_totalprice * 100)
          |                      AS BIGINT))
          |           FROM q604_o o WHERE o.o_custkey = c.c_custkey)
          |GROUP BY 1""".stripMargin)
      val plan = out.queryExecution.executedPlan
      def bad(p: org.apache.spark.sql.execution.SparkPlan): Boolean = {
        val self = p match {
          case _: org.apache.spark.sql.execution.joins
                   .BroadcastNestedLoopJoinExec => true
          case _: org.apache.spark.sql.execution.joins
                   .CartesianProductExec => true
          case _ => false
        }
        self || p.children.exists(bad)
      }
      require(!bad(plan),
              "correlated subqueries did not decorrelate: " + plan)
      out
    }),
    "q605_self_similarity" -> ((s, dir) => {
      // Corpus diversity audit (self-BLEU flavor): mean pairwise 3-gram
      // Jaccard over a deterministic 40-doc sample, per-pair pinned ppm
      // DIVs — generation-health telemetry: a corpus drifting toward
      // itself pushes this up long before exact dedup fires. Distinct
      // grams collapse each doc before the pair intersection.
      val grams = rd(s, dir, "documents").filter(col("doc_id") < 40)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 3) // sequence() descends on stop<start
        .select(col("doc_id"), explode(expr(
          """transform(sequence(0, size(w) - 3),
            |  i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"""
            .stripMargin)).as("g"))
        .distinct().localCheckpoint(false)
      val sizes = grams.groupBy(col("doc_id"))
        .agg(count(lit(1)).cast("long").as("n"))
      val inter = grams.as("a").join(grams.as("b"),
          col("b.g") === col("a.g") && col("b.doc_id") > col("a.doc_id"))
        .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .agg(count(lit(1)).cast("long").as("i"))
      sizes.as("sa").join(sizes.as("sb"),
          col("sb.doc_id") > col("sa.doc_id"))
        .join(inter, col("da") === col("sa.doc_id") &&
                     col("db") === col("sb.doc_id"), "left")
        .na.fill(0L, Seq("i"))
        .select(col("i"),
                (col("sa.n") + col("sb.n") - col("i")).as("u"))
        .agg(count(lit(1)).cast("long").as("n_pairs"),
             sum(expr("(1000000 * i) DIV u")).cast("long")
               .as("jaccard_ppm_sum"))
        .withColumn("mean_jaccard_ppm",
                    expr("jaccard_ppm_sum DIV n_pairs"))
    }),
    "q606_mmd_linear" -> ((s, dir) => {
      // Linear-kernel maximum mean discrepancy between two embedding
      // groups: MMD² = ‖μ_a − μ_b‖², exact in milli-int space via the
      // per-group SUM VECTORS (q593's identity — no pair join, one
      // per-dim rollup); counts-scaled numerator in DECIMAL(38). The
      // embedding-space distribution-shift detector.
      val e = rd(s, dir, "embeddings")
        .filter(col("label").isin(0, 1))
        .select(col("label").cast("long").as("lab"),
          expr("transform(embedding, x -> CAST(floor(x * 1000) AS BIGINT))")
            .as("q"))
      val dims = e.select(col("lab"), posexplode(col("q"))
                            .as(Seq("dim", "qv")))
        .groupBy(col("lab"), col("dim"))
        .agg(sum(col("qv")).cast("long").as("sv"))
      val cnt = e.groupBy(col("lab"))
        .agg(count(lit(1)).cast("long").as("n"))
      val wide = dims.filter(col("lab") === 0L)
        .select(col("dim"), col("sv").as("sa"))
        .join(dims.filter(col("lab") === 1L)
                .select(col("dim"), col("sv").as("sb")), Seq("dim"))
        .crossJoin(broadcast(
          cnt.filter(col("lab") === 0L).select(col("n").as("na"))))
        .crossJoin(broadcast(
          cnt.filter(col("lab") === 1L).select(col("n").as("nb"))))
      wide.agg(max(col("na")).as("na"), max(col("nb")).as("nb"),
          sum(expr("(CAST(nb AS DECIMAL(38,0))*sa - CAST(na AS " +
                   "DECIMAL(38,0))*sb) * (CAST(nb AS DECIMAL(38,0))*sa" +
                   " - CAST(na AS DECIMAL(38,0))*sb)")).as("num"))
        .select(col("na"), col("nb"),
                expr("CAST(num AS DECIMAL(38,0))").cast("string")
                  .as("mmd2_num_str"),
                expr("CAST(num DIV (CAST(na AS DECIMAL(38,0))*na*nb*nb)" +
                     " AS BIGINT)").as("mmd2_milli2"))
    }),
    "q598_qte_deciles" -> ((s, dir) => {
      // Quantile treatment effect: exact deciles of order value, URGENT
      // vs LOW, from the value-grain histogram's cumulative counts
      // (decile d = smallest v with cum ≥ ⌈d·n/10⌉) — per-quantile
      // group differences, the distributional-effect view a mean-only
      // uplift (q251) hides. Cumulatives run per group over distinct
      // prices, never rows.
      val x = rd(s, dir, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select(when(col("o_orderpriority") === "1-URGENT", "a")
                  .otherwise("b").as("g"),
                expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("v"))
      val h = x.groupBy(col("g"), col("v"))
        .agg(count(lit(1)).cast("long").as("n"))
      val wCum = Window.partitionBy(col("g")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wTot = Window.partitionBy(col("g"))
      val c = h.withColumn("cum", sum(col("n")).over(wCum))
        .withColumn("cnt", sum(col("n")).over(wTot))
      val dec = s.range(1, 10).select(col("id").as("d"))
      val qv = c.join(broadcast(dec),
          col("cum") >= expr("(d * cnt + 9) DIV 10"))
        .groupBy(col("g"), col("d"))
        .agg(min(col("v")).as("qv"))
      qv.filter(col("g") === "a").as("a")
        .join(qv.filter(col("g") === "b").as("b"),
              col("b.d") === col("a.d"))
        .select(col("a.d").as("decile"),
                col("a.qv").as("urgent_cents"),
                col("b.qv").as("low_cents"),
                (col("a.qv") - col("b.qv")).cast("long").as("qte_cents"))
    }),
    "q599_page_hinkley" -> ((s, dir) => {
      // Page–Hinkley drift detector over the monthly order-count series:
      // per-step n-scaled deviation (t·yₜ − Σy) quantized by one pinned
      // sign-folded DIV, cumulated, and the PH statistic = cumdev −
      // running min — the streaming-ML change detector next to CUSUM
      // (q245). The series is the 80-row rollup; windows are DimKey.
      val m = monthlySeries(s, dir)
      val w = Window.partitionBy(DimKey.one).orderBy(col("mi"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val c = m.withColumn("sy", sum(col("y")).over(w))
        .withColumn("t", row_number().over(
          Window.partitionBy(DimKey.one).orderBy(col("mi"))).cast("long"))
      val d = c.select(col("mi"),
        expr("""CAST(CASE WHEN t*y - sy >= 0 THEN (t*y - sy) DIV t
               | ELSE -((sy - t*y) DIV t) END AS BIGINT)"""
          .stripMargin).as("dev"))
      d.withColumn("cumdev", sum(col("dev")).over(w).cast("long"))
        .withColumn("ph_stat",
          (col("cumdev") - min(col("cumdev")).over(w)).cast("long"))
    }),
    "q600_v_pattern" -> ((s, dir) => {
      // Row-pattern matching (MATCH_RECOGNIZE-style) without the SQL
      // feature: V-shape detection in the monthly series — direction
      // runs via change-event run ids, adjacent (down, up) run pairs
      // become V events with trough month, depth, recovery, and
      // v_score = min(depth, recovery). The declarative RLE
      // decomposition that replaces per-row pattern automata.
      val m = monthlySeries(s, dir)
      val wOrd = Window.partitionBy(DimKey.one).orderBy(col("mi"))
      val wCum = wOrd.rowsBetween(Window.unboundedPreceding,
                                  Window.currentRow)
      val diff = m.withColumn("d", col("y") - lag(col("y"), 1).over(wOrd))
        .filter(col("d").isNotNull && col("d") =!= 0L)
        .withColumn("dir", signum(col("d")).cast("long"))
      val runs = diff
        .withColumn("chg", when(lag(col("dir"), 1).over(wOrd).isNull ||
            lag(col("dir"), 1).over(wOrd) =!= col("dir"), 1L)
          .otherwise(0L))
        .withColumn("run_id", sum(col("chg")).over(wCum))
        .groupBy(col("run_id"), col("dir"))
        .agg(max(col("mi")).cast("long").as("end_mi"),
             sum(col("d")).cast("long").as("move"))
      runs.as("a").join(runs.as("b"),
          col("b.run_id") === col("a.run_id") + 1 &&
          col("a.dir") === -1L && col("b.dir") === 1L)
        .select(col("a.end_mi").as("trough_mi"),
                (-col("a.move")).as("depth"),
                col("b.move").as("recovery"),
                least(-col("a.move"), col("b.move")).as("v_score"))
    }),
    "q594_recursive_cte_native" -> ((s, dir) => {
      // Spark 4's NATIVE recursive CTE (UnionLoop plan): hop-bounded
      // reachability from nation 0 over the ≥150 directed trade arcs,
      // written as WITH RECURSIVE ... UNION ALL and resolved by the
      // engine's loop operator instead of the hand-unrolled rounds the
      // older graph tier uses. min(hop) per destination; bound 4 keeps
      // the recursion finite on the cyclic graph.
      // Anchor pinned through plans.RecursiveCte (round-8 verdict ask):
      // a CTE referenced from the recursive term is re-planned per
      // iteration, so an un-pinned anchor re-scans lineitem every round
      // (4.6 s → sub-second pinned); the helper checkpoints the arc
      // rollup and asserts from the analyzed plan that the loop's
      // recursive branch carries no live file scan.
      val li = rd(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
      val o = rd(s, dir, "orders").select("o_orderkey", "o_custkey")
      val c = rd(s, dir, "customer").select("c_custkey", "c_nationkey")
      val su = rd(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val arcs = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .filter(col("c_nationkey") =!= col("s_nationkey"))
        .groupBy(col("c_nationkey").cast("long").as("src"),
                 col("s_nationkey").cast("long").as("dst"))
        .agg(count(lit(1)).as("_n"))
        .filter(col("_n") >= 110L)
        .select("src", "dst")
      graft.plans.RecursiveCte.run(s,
        """WITH RECURSIVE reach(dst, hop) AS (
          |  SELECT dst, CAST(1 AS BIGINT) AS hop FROM q594_arcs
          |  WHERE src = 0
          |  UNION ALL
          |  SELECT a.dst, r.hop + 1 FROM reach r
          |  JOIN q594_arcs a ON a.src = r.dst
          |  WHERE r.hop < 4)
          |SELECT dst AS nationkey, CAST(min(hop) AS BIGINT) AS min_hops
          |FROM reach GROUP BY 1""".stripMargin,
        "q594_arcs" -> arcs)
    }),
    "q595_hard_negatives" -> ((s, dir) => {
      // Hard-negative mining for contrastive training: per query vector
      // the most-similar corpus vector with a DIFFERENT label — the
      // pair a random negative sampler (q305) would almost never find.
      // One broadcast of the queries, top-1 per query by (cosine desc,
      // id); the standard retrieval-training data op.
      import graft.operators.Similarity
      val e = rd(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("qid"), col("label").as("qlab"),
                col("embedding").as("qv"))
      val scored = e.select(col("vec_id").as("nid"),
                            col("label").as("nlab"),
                            col("embedding").as("cv"))
        .join(broadcast(q), col("nlab") =!= col("qlab"))
        .withColumn("cosine", Similarity.cosine(col("qv"), col("cv")))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cosine").desc, col("nid"))
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("qid").cast("long").as("query_id"),
                col("qlab").cast("long").as("query_label"),
                col("nid").cast("long").as("hard_negative_id"),
                col("nlab").cast("long").as("negative_label"),
                round(col("cosine"), 4).as("cosine"))
    }),
    "q596_length_batching" -> ((s, dir) => {
      // Length-grouped batching (the LLM training sampler): documents
      // ranked by token count via cellRank (no global sort), chunked
      // into batches of 25 consecutive lengths, padding waste per batch
      // = Σ(max−len)/(25·max) in ppm. Emits the packing-efficiency
      // audit that justifies length bucketing over random batching.
      val d = rd(s, dir, "documents").select(col("doc_id"),
        expr("length(text) - length(replace(text, ' ', '')) + 1")
          .cast("long").as("toks"))
      val rk = Profile.cellRank(d, Seq.empty, "toks", Seq("doc_id"))
        .withColumn("batch", expr("(_rank - 1) DIV 25"))
      rk.groupBy(col("batch"))
        .agg(count(lit(1)).cast("long").as("n"),
             max(col("toks")).cast("long").as("max_toks"),
             sum(col("toks")).cast("long").as("sum_toks"))
        .filter(col("n") === 25L)
        .withColumn("waste_ppm", expr(
          "(1000000 * (n * max_toks - sum_toks)) DIV (n * max_toks)"))
        .select("batch", "n", "max_toks", "waste_ppm")
    }),
    "q597_cascade_delete_plan" -> ((s, dir) => {
      // GDPR cascade-delete planning across the FK graph: a seed
      // customer predicate (nation 3, negative balance) propagates
      // customer → orders → lineitem, emitting the per-table delete
      // footprint BEFORE any mutation — each hop one semi-join down the
      // key chain, the dry-run the deletion-vector writer (q463/q499)
      // consumes.
      val seed = rd(s, dir, "customer")
        .filter(col("c_nationkey") === 3 && col("c_acctbal") < 0)
        .select(col("c_custkey"))
        .localCheckpoint(false)
      val ords = rd(s, dir, "orders")
        .join(broadcast(seed), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"))
        .localCheckpoint(false)
      val lis = rd(s, dir, "lineitem")
        .join(broadcast(ords.select(col("o_orderkey").as("ok"))),
              col("l_orderkey") === col("ok"))
      val a = seed.agg(count(lit(1)).cast("long").as("n"))
        .select(lit("customer").as("table_name"), col("n"))
      val b = ords.agg(count(lit(1)).cast("long").as("n"))
        .select(lit("orders").as("table_name"), col("n"))
      val cnt = lis.agg(count(lit(1)).cast("long").as("n"))
        .select(lit("lineitem").as("table_name"), col("n"))
      a.unionByName(b).unionByName(cnt)
        .withColumnRenamed("n", "n_rows_to_delete")
    }),
    "q589_greedy_matching" -> ((s, dir) => {
      // Greedy locally-heaviest matching (the ½-approx distributed
      // matching primitive): each round an edge that is the heaviest
      // incident edge of BOTH endpoints (ties by (x,y)) enters the
      // matching and its endpoints leave — 6 fixed rounds (this graph
      // matches maximally in 6; fixed-sweep determinism contract). The
      // edge relation is dimension-sized and kept single-partition so
      // the rounds cost scheduling, not shuffles.
      // The nation graph is SCHEMA-bounded (≤ 25² edges whatever the
      // fact volume), so after the one distributed rollup the 6 rounds
      // run on the driver — the same gated-bounded pattern as the
      // ≤1M-edge union-find; a 6-round DataFrame fold spent ~5 s on
      // scheduling alone. Graph.greedyMatching counts the edge list
      // first and degrades to a distributed round fold past the gate
      // (round-8 verdict: denser-than-expected inputs must slow down,
      // not throw). Semantics identical to the oracle's unrolled rounds.
      graft.operators.Graph.greedyMatching(
        tradeEdges(s, dir, 300L)
          .select(col("src").as("x"), col("dst").as("y"),
                  col("n").as("w")),
        rounds = 6)
    }),
    "q590_articulation_points" -> ((s, dir) => {
      // Articulation (cut) vertices of the thresholded trade graph: for
      // each removed node, all-pairs reachability of the residual graph
      // via 5 path-DOUBLING rounds (2⁵ = 32 ≥ any simple path on ≤ 25
      // nations — provably exact), then "articulation" iff some
      // neighbor is unreachable from the removed node's smallest
      // neighbor. Node-cut robustness, the vertex dual of q570's
      // bridges; state ≤ |V|·|V|² rows, dimension-grain.
      // Schema-bounded nation graph (≤ 25² edges) — after the one
      // distributed rollup, the per-node removal BFS runs gated on the
      // driver (union-find precedent), degrading past the gate to one
      // labeled BFS over all removals at once (Graph.articulationPoints)
      // instead of throwing; exact, same answer as the oracle's
      // provably-complete 5 doubling rounds.
      graft.operators.Graph.articulationPoints(
        tradeEdges(s, dir, 300L).select(col("src"), col("dst")))
    }),
    "q591_dyad_census" -> ((s, dir) => {
      // Directed dyad census of the nation-trade network (arcs = ≥150
      // shipments cust-nation → supp-nation): mutual / asymmetric /
      // null dyad counts and the reciprocity ratio in ppm — the
      // directed-structure audit under the SCC/condensation tier. One
      // fact rollup + one self-join on the arc table.
      val li = rd(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
      val o = rd(s, dir, "orders").select("o_orderkey", "o_custkey")
      val c = rd(s, dir, "customer").select("c_custkey", "c_nationkey")
      val su = rd(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val d0 = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .filter(col("c_nationkey") =!= col("s_nationkey"))
        .groupBy(col("c_nationkey").cast("long").as("src"),
                 col("s_nationkey").cast("long").as("dst"))
        .agg(count(lit(1)).as("_n"))
        .filter(col("_n") >= 150L)
        .select("src", "dst").localCheckpoint(false)
      val nn = d0.select(col("src").as("v"))
        .unionByName(d0.select(col("dst").as("v"))).distinct()
        .agg(count(lit(1)).cast("long").as("n"))
      val pairs = d0.as("f").join(d0.as("r"),
          col("r.src") === col("f.dst") && col("r.dst") === col("f.src"),
          "left")
        .agg(sum(when(col("r.src").isNotNull, 1L).otherwise(0L))
               .cast("long").as("m2"),
             count(lit(1)).cast("long").as("arcs"))
      pairs.crossJoin(broadcast(nn))
        .select(col("n").as("n_nodes"), col("arcs"),
                expr("m2 DIV 2").as("mutual"),
                (col("arcs") - col("m2")).as("asymmetric"),
                expr("n*(n-1) DIV 2 - m2 DIV 2 - (arcs - m2)")
                  .as("null_dyads"),
                expr("(1000000 * m2) DIV arcs").as("reciprocity_ppm"))
    }),
    "q592_kcenter_greedy" -> ((s, dir) => {
      // Gonzalez farthest-point (k-center) seeding, k = 4, on the
      // milli-quantized embedding space (exact int64 squared L2): each
      // round picks the point farthest from the chosen set (ties by
      // vec_id) and tightens every point's min-distance — the
      // 2-approximation k-center seeder that replaces random k-means++
      // initialization with a deterministic scan. Each round is ONE
      // broadcast of the new center + one map-side min.
      val e = rd(s, dir, "embeddings").select(col("vec_id"),
        expr("transform(embedding, x -> CAST(floor(x * 1000) AS BIGINT))")
          .as("q"))
      val d2 = expr("aggregate(zip_with(q, cq, (x, y) -> (x-y)*(x-y))," +
                    " 0L, (acc, v) -> acc + v)")
      val c1 = e.orderBy(col("vec_id")).limit(1)
        .select(col("vec_id").as("cid"), col("q").as("cq"))
      var d = e.crossJoin(broadcast(c1)).select(col("vec_id"), col("q"),
                                                d2.as("dmin"))
        .localCheckpoint(false)
      var centers = c1.select(lit(1L).as("pick_order"),
                              col("cid").as("center_id"))
      for (k <- 2 to 4) {
        val w = Window.partitionBy(DimKey.one)
          .orderBy(col("dmin").desc, col("vec_id"))
        val ck = d.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("vec_id").as("cid"), col("q").as("cq"))
          .localCheckpoint(false)
        centers = centers.unionByName(
          ck.select(lit(k.toLong).as("pick_order"),
                    col("cid").as("center_id")))
        d = d.crossJoin(broadcast(ck))
          .select(col("vec_id"), col("q"),
                  least(col("dmin"), d2).as("dmin"))
          .localCheckpoint(false)
      }
      val radius = d.agg(max(col("dmin")).cast("long")
                           .as("covering_radius_sq"))
      centers.crossJoin(broadcast(radius))
        .select(col("pick_order"), col("center_id").cast("long")
                  .as("center_id"), col("covering_radius_sq"))
    }),
    "q593_silhouette" -> ((s, dir) => {
      // Exact silhouette audit of the labeled embedding space (sampled
      // vec_id % 2 = 0): a(i) = quantized mean intra-label squared-L2,
      // b(i) = min over other labels, s in sign-folded ppm, rolled up
      // per label. NO pair join: Σⱼ‖a−bⱼ‖² = cntₗ·‖a‖² + Σⱼ‖bⱼ‖² −
      // 2·a·(Σⱼbⱼ) — exact integer algebra, so the per-(point, label)
      // distance sums come from ONE per-label sum-vector (O(n·L), not
      // O(n²); the all-pairs form was 10 s at sf0.1, this is sub-second
      // and bit-identical).
      val e = rd(s, dir, "embeddings")
        .filter(col("vec_id") % 2 === 0)
        .select(col("vec_id"), col("label").cast("long").as("lab"),
          expr("transform(embedding, x -> CAST(floor(x * 1000) AS BIGINT))")
            .as("q"))
        .withColumn("n2",
          expr("aggregate(q, 0L, (acc, v) -> acc + v * v)"))
        .localCheckpoint(false)
      val dims = e.select(col("lab"), posexplode(col("q"))
                            .as(Seq("dim", "qv")))
      val sv = dims.groupBy(col("lab"), col("dim"))
        .agg(sum(col("qv")).as("sq"))
        .groupBy(col("lab"))
        .agg(expr("transform(array_sort(collect_list(struct(dim, sq)))," +
                  " p -> p.sq)").as("sv"))
      val stats = e.groupBy(col("lab"))
        .agg(count(lit(1)).cast("long").as("cnt"),
             sum(col("n2")).cast("long").as("s2"))
        .join(sv, Seq("lab"))
        .withColumnRenamed("lab", "lj")
      val pd = e.crossJoin(broadcast(stats))
        .withColumn("dotsv",
          expr("aggregate(zip_with(q, sv, (x, y) -> x * y), 0L," +
               " (acc, v) -> acc + v)"))
        .select(col("vec_id").as("i"), col("lab").as("li"), col("lj"),
          // the self term contributes 0 to the sum, so sd needs no
          // correction — only the divisor drops the self pair
          (col("cnt") * col("n2") + col("s2") -
           lit(2L) * col("dotsv")).as("sd"),
          when(col("lj") === col("lab"), col("cnt") - 1L)
            .otherwise(col("cnt")).as("cnt"))
      val ab = pd.groupBy(col("i"), col("li"))
        .agg(max(when(col("lj") === col("li"), expr("sd DIV cnt")))
               .as("a"),
             min(when(col("lj") =!= col("li"), expr("sd DIV cnt")))
               .as("b"))
        .filter(col("a").isNotNull && col("b").isNotNull)
      ab.select(col("li"),
          expr("""CASE WHEN b >= a
                 | THEN (1000000 * (b - a)) DIV greatest(a, b)
                 | ELSE -((1000000 * (a - b)) DIV greatest(a, b))
                 | END""".stripMargin).as("s_ppm"))
        .groupBy(col("li").as("label"))
        .agg(count(lit(1)).cast("long").as("n"),
             expr("""CAST(CASE WHEN sum(s_ppm) >= 0
                    | THEN sum(s_ppm) DIV count(1)
                    | ELSE -((-sum(s_ppm)) DIV count(1)) END AS BIGINT)"""
               .stripMargin).as("mean_silhouette_ppm"))
    }),
    "q585_luby_mis" -> ((s, dir) => {
      // Luby's maximal independent set with DETERMINISTIC md5 priorities
      // (60-bit, collision-free over item ids): each round every
      // undecided node beating all undecided neighbors joins the MIS and
      // knocks its neighbors out — 4 fixed rounds (the fixed-sweep
      // determinism contract; this graph fully decides in 4). The
      // O(log n)-round symmetric-breaking primitive behind distributed
      // scheduling and graph coloring.
      val sym = symEdges(copurchaseEdges(s, dir)).localCheckpoint(false)
      val prio = expr("CAST(conv(substring(md5(CAST(v AS STRING)), 1, " +
                      "15), 16, 10) AS BIGINT)")
      var u = sym.select(col("src").as("v")).distinct()
        .withColumn("pr", prio).localCheckpoint(false)
      var mis = u.filter(lit(false)).select(col("v"))
      for (_ <- 1 to 4) {
        val nbmax = sym.join(u.select(col("v").as("dst"),
                                      col("pr").as("npr")), Seq("dst"))
          .join(u.select(col("v").as("src")), Seq("src"))
          .groupBy(col("src").as("v"))
          .agg(max(col("npr")).as("mx"))
        val win = u.join(nbmax, Seq("v"), "left")
          .filter(col("mx").isNull || col("pr") > col("mx"))
          .select("v").localCheckpoint(false)
        mis = mis.unionByName(win).distinct()
        val knocked = sym.join(win.select(col("v").as("dst")), Seq("dst"))
          .select(col("src").as("v")).distinct()
        u = u.join(win, Seq("v"), "left_anti")
          .join(knocked, Seq("v"), "left_anti")
          .localCheckpoint(false)
      }
      mis.select(col("v").cast("long").as("node"), lit(1L).as("in_mis"))
        .unionByName(u.select(col("v").cast("long").as("node"),
                              lit(0L).as("in_mis")))
    }),
    "q586_sorted_neighborhood" -> ((s, dir) => {
      // Sorted-neighborhood entity-resolution blocking: rank part names
      // lexicographically (order-preserving 8-byte ascii pack feeds
      // cellRank — no single-partition sort), pair each record with its
      // 3 successors, verify candidates with the native jaro_winkler.
      // Emits the blocking-efficiency audit: candidates vs all pairs
      // (reduction ratio) and survivors — the window-blocking
      // alternative to LSH (q18) and prefix filtering (q488).
      val packed = (1 to 8).map(i =>
        s"ascii(substr(nm, $i, 1)) * ${math.pow(256.0, 8 - i).toLong}L")
        .mkString(" + ")
      val e = rd(s, dir, "part")
        .select(col("p_partkey").as("id"), col("p_name").as("nm"))
        .withColumn("packed", expr(packed))
      val rk = Profile.cellRank(e, Seq.empty, "packed", Seq("nm", "id"))
        .select(col("id"), col("nm"), col("_rank").as("rk"))
        .localCheckpoint(false)
      val tot = rk.agg(count(lit(1)).cast("long").as("n"))
      // b.rk BETWEEN a.rk+1 AND a.rk+3 is a non-equi join Spark plans as
      // a nested loop (20k × 20k comparisons at sf0.1) — explode the 3
      // offsets instead so each successor resolves through one hash
      // equi-join on the rank.
      rk.as("a")
        .crossJoin(s.range(1, 4).select(col("id").as("off")))
        .withColumn("brk", col("a.rk") + col("off"))
        .join(rk.as("b"), col("b.rk") === col("brk"))
        .select(graft.functions.JaroWinkler(col("a.nm"), col("b.nm"))
                  .as("jw"))
        .crossJoin(broadcast(tot))
        .agg(count(lit(1)).cast("long").as("n_candidates"),
             sum(when(col("jw") >= 0.94, 1L).otherwise(0L)).cast("long")
               .as("n_matches"),
             expr("CAST(1000000 - (1000000 * count(1) * 2)" +
                  " DIV (max(n) * (max(n) - 1)) AS BIGINT)")
               .as("reduction_ratio_ppm"))
    }),
    "q587_consistent_hash" -> ((s, dir) => {
      // Consistent-hashing ring audit: 8 servers × 32 md5-placed virtual
      // nodes, every customer key routed to its clockwise successor
      // (wraparound = global min vnode). The ring is dimension-sized and
      // BROADCAST — each key's successor resolves map-side with a
      // partial-agg min, no shuffle of the key×vnode product. Emits the
      // per-server load and share — the balance proof V virtual nodes
      // are supposed to buy.
      import s.implicits._
      def h(sqlExpr: String) = expr(
        s"CAST(conv(substring(md5($sqlExpr), 1, 15), 16, 10) AS BIGINT)")
      val vn = (0 until 8).flatMap(si => (0 until 32).map(vi =>
          (s"s$si", s"s$si-$vi"))).toDF("server", "vkey")
        .withColumn("vh", h("vkey")).drop("vkey")
        .localCheckpoint(false)
      val wrap = vn.agg(min(col("vh")).as("wrap"))
      val keys = rd(s, dir, "customer")
        .select(col("c_custkey").as("k"))
        .withColumn("kh", h("CAST(k AS STRING)"))
      val asg = keys.join(broadcast(vn), col("vh") >= col("kh"), "left")
        .groupBy(col("k"))
        .agg(min(col("vh")).as("tvh"))
        .crossJoin(broadcast(wrap))
        .select(col("k"), coalesce(col("tvh"), col("wrap")).as("tvh"))
      val byServer = asg.join(broadcast(vn), col("vh") === col("tvh"))
        .groupBy(col("server"))
        .agg(count(lit(1)).cast("long").as("n_keys"))
      val tot = byServer.agg(sum(col("n_keys")).cast("long").as("n"))
      byServer.crossJoin(broadcast(tot))
        .select(col("server"), col("n_keys"),
                expr("(1000000 * n_keys) DIV n").as("share_ppm"))
    }),
    "q588_bradley_terry" -> ((s, dir) => {
      // Bradley–Terry strength from pairwise monthly-revenue wins across
      // regions (the arena-style ranking-from-comparisons model): the MM
      // update p'ᵢ = wᵢ / Σⱼ nᵢⱼ/(pᵢ+pⱼ) run 3 fixed rounds with pinned
      // 1e12 DIVs and a 5e6-sum renormalization per round. Comparisons
      // collapse to the |items|² table before any iteration.
      val li = rd(s, dir, "lineitem").select(col("l_orderkey"),
                                             revUnit.as("r"))
      val rev = li
        .join(rd(s, dir, "orders").select("o_orderkey", "o_custkey",
                                          "o_orderdate"),
              col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(rd(s, dir, "customer")
                .select("c_custkey", "c_nationkey")),
              col("o_custkey") === col("c_custkey"))
        .join(broadcast(rd(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(rd(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name").as("item"),
                 expr("year(o_orderdate) * 12 + month(o_orderdate)")
                   .as("mi"))
        .agg(sum(col("r")).as("v"))
      val comp = rev.as("a").join(rev.as("b"),
          col("b.mi") === col("a.mi") && col("b.item") =!= col("a.item"))
        .groupBy(col("a.item").as("i"), col("b.item").as("j"))
        .agg(count(lit(1)).cast("long").as("n_ij"),
             sum(when(col("a.v") > col("b.v") ||
                      (col("a.v") === col("b.v") &&
                       col("a.item") < col("b.item")), 1L).otherwise(0L))
               .cast("long").as("w_ij"))
        .localCheckpoint(false)
      val wins = comp.groupBy(col("i").as("item"))
        .agg(sum(col("w_ij")).cast("long").as("w"))
        .localCheckpoint(false)
      var p = wins.select(col("item"), lit(1000000L).as("p"))
      for (_ <- 1 to 3) {
        val d = comp
          .join(p.select(col("item").as("i"), col("p").as("pi")),
                Seq("i"))
          .join(p.select(col("item").as("j"), col("p").as("pj")),
                Seq("j"))
          .groupBy(col("i").as("item"))
          .agg(sum(expr("(n_ij * 1000000000000L) DIV (pi + pj)"))
                 .cast("long").as("d"))
        val praw = wins.join(d, Seq("item"))
          .select(col("item"), expr("(w * 1000000000000L) DIV d")
                    .as("praw"))
        val tot = praw.agg(sum(col("praw")).cast("long").as("tp"))
        p = praw.crossJoin(broadcast(tot))
          .select(col("item"), expr("(praw * 5000000) DIV tp").as("p"))
          .localCheckpoint(false)
      }
      p.join(wins, Seq("item"))
        .select(col("item"), col("w").as("wins"),
                col("p").as("bt_strength_ppm"))
    }),
    "q579_dhondt" -> ((s, dir) => {
      // D'Hondt highest-averages apportionment: 20 slots across regions
      // by order volume. Quotients v/d are compared through one pinned
      // 1e12-quantization (deterministic; ties then break by party, d).
      // Votes collapse in one rollup; the quotient lattice is
      // |parties|·|slots| ≤ 100 rows — the divisor-method counterpart to
      // q489's largest-remainder.
      val votes = rd(s, dir, "orders")
        .join(broadcast(rd(s, dir, "customer")
                .select("c_custkey", "c_nationkey")),
              col("o_custkey") === col("c_custkey"))
        .join(broadcast(rd(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(rd(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name").as("party"))
        .agg(count(lit(1)).cast("long").as("v"))
      val quo = votes.crossJoin(s.range(1, 21).select(col("id").as("d")))
        .withColumn("q", expr("(v * 1000000000000L) DIV d"))
      val w = Window.partitionBy(DimKey.one)
        .orderBy(col("q").desc, col("party"), col("d"))
      quo.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 20)
        .groupBy(col("party"))
        .agg(max(col("v")).cast("long").as("votes"),
             count(lit(1)).cast("long").as("seats"))
    }),
    "q580_ipf_raking" -> ((s, dir) => {
      // Iterative proportional fitting (raking): calibrate the 1996
      // (region × priority) cell counts to the 1997 row and column
      // margins — two row+column sweeps, each a pinned micro-weight DIV
      // (the product needs DECIMAL(38); weights stay int64). The survey-
      // reweighting primitive; every sweep is one margin rollup + one
      // broadcast join over the 25-cell grid.
      val cell = rd(s, dir, "orders")
        .filter(expr("year(o_orderdate) IN (1996, 1997)"))
        .join(broadcast(rd(s, dir, "customer")
                .select("c_custkey", "c_nationkey")),
              col("o_custkey") === col("c_custkey"))
        .join(broadcast(rd(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(rd(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name").as("reg"), col("o_orderpriority").as("pri"))
        .agg(sum(expr("CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END"))
               .cast("long").as("n96"),
             sum(expr("CASE WHEN year(o_orderdate) = 1997 THEN 1 ELSE 0 END"))
               .cast("long").as("n97"))
        .localCheckpoint(false)
      val rt = cell.groupBy(col("reg")).agg(sum(col("n97")).cast("long").as("rt"))
      val ct = cell.groupBy(col("pri")).agg(sum(col("n97")).cast("long").as("ct"))
      def rowSweep(w: DataFrame): DataFrame = {
        val rs = w.groupBy(col("reg")).agg(sum(col("w")).cast("long").as("rs"))
        w.join(broadcast(rt), Seq("reg")).join(broadcast(rs), Seq("reg"))
          .withColumn("w", expr(
            "CAST((CAST(w AS DECIMAL(38,0)) * rt * 1000000) DIV rs AS BIGINT)"))
          .drop("rt", "rs")
      }
      def colSweep(w: DataFrame): DataFrame = {
        val cs = w.groupBy(col("pri")).agg(sum(col("w")).cast("long").as("cs"))
        w.join(broadcast(ct), Seq("pri")).join(broadcast(cs), Seq("pri"))
          .withColumn("w", expr(
            "CAST((CAST(w AS DECIMAL(38,0)) * ct * 1000000) DIV cs AS BIGINT)"))
          .drop("ct", "cs")
      }
      val w0 = cell.select(col("reg"), col("pri"),
                           (col("n96") * 1000000L).as("w"))
      val w4 = colSweep(rowSweep(colSweep(rowSweep(w0))))
      w4.join(broadcast(rt), Seq("reg"))
        .select(col("reg"), col("pri"), col("w").as("weight_micro"),
                col("rt").as("row_target"))
    }),
    "q581_delong_auc" -> ((s, dir) => {
      // DeLong AUC with its variance components: placements of positives
      // among negatives (and vice versa) per DISTINCT score value via
      // cumSumByValue (tie-aware ×2), then the n²-scaled placement
      // variances S10/S01 in ppb — the machinery behind AUC confidence
      // intervals, exact to the quantization. Score = brand return-rate
      // permille fit on 1995–96, outcomes 1997.
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
        .agg(expr("(1000 * sum(y)) DIV count(1)").as("v"))
      val h = joined.filter(col("yr") === 1997)
        .join(broadcast(fit), Seq("p_brand"))
        .groupBy(col("v"))
        .agg(sum(col("y")).as("hp"),
             sum(lit(1L) - col("y")).as("hn"))
      val c = Profile.cumSumByValue(h, "v", Seq("hp", "hn"))
        .withColumn("cn_lt", col("cum_hn") - col("hn"))
        .withColumn("cp_lt", col("cum_hp") - col("hp"))
      val tot = h.agg(sum(col("hp")).cast("long").as("np"),
                      sum(col("hn")).cast("long").as("nn"))
      val pl = c.crossJoin(broadcast(tot))
        .withColumn("plp_x2", lit(2L) * col("cn_lt") + col("hn"))
        .withColumn("pln_x2",
          lit(2L) * (col("np") - col("cp_lt") - col("hp")) + col("hp"))
      pl.agg(
          sum((col("hp") * col("plp_x2")).cast("decimal(38,0)")).as("sp1"),
          sum(col("hp") * col("plp_x2").cast("decimal(38,0)")
              * col("plp_x2")).as("sp2"),
          sum((col("hn") * col("pln_x2")).cast("decimal(38,0)")).as("sn1"),
          sum(col("hn") * col("pln_x2").cast("decimal(38,0)")
              * col("pln_x2")).as("sn2"),
          max(col("np")).as("np"), max(col("nn")).as("nn"))
        .select(col("np"), col("nn"),
          expr("CAST((1000000 * sp1) DIV (2 * np * nn) AS BIGINT)")
            .as("auc_ppm"),
          expr("""CAST((1000000000 * (np * sp2 - sp1 * sp1))
                 | DIV (CAST(np AS DECIMAL(38,0)) * np * (np - 1)
                 |      * 4 * nn * nn) AS BIGINT)""".stripMargin)
            .as("s10_ppb"),
          expr("""CAST((1000000000 * (nn * sn2 - sn1 * sn1))
                 | DIV (CAST(nn AS DECIMAL(38,0)) * nn * (nn - 1)
                 |      * 4 * np * np) AS BIGINT)""".stripMargin)
            .as("s01_ppb"))
    }),
    "q582_mantel_haenszel" -> ((s, dir) => {
      // Mantel–Haenszel pooled odds ratio across region strata (exposure
      // = URGENT priority, outcome = returned): per-stratum ad/n and
      // bc/n as pinned ppm DIVs, pooled as the ratio of their sums —
      // the confounding-safe pooling that q371's Simpson check motivates.
      // One fact pass to the 5-stratum 2×2 table.
      val strata = rd(s, dir, "lineitem")
        .select(col("l_orderkey"),
                when(col("l_returnflag") === "R", 1L).otherwise(0L).as("ret"))
        .join(rd(s, dir, "orders")
                .select(col("o_orderkey"), col("o_custkey"),
                        when(col("o_orderpriority") === "1-URGENT", 1L)
                          .otherwise(0L).as("exp")),
              col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(rd(s, dir, "customer")
                .select("c_custkey", "c_nationkey")),
              col("o_custkey") === col("c_custkey"))
        .join(broadcast(rd(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(rd(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name").as("stratum"))
        .agg(sum(when(col("exp") === 1L && col("ret") === 1L, 1L)
                   .otherwise(0L)).cast("long").as("a"),
             sum(when(col("exp") === 1L && col("ret") === 0L, 1L)
                   .otherwise(0L)).cast("long").as("b"),
             sum(when(col("exp") === 0L && col("ret") === 1L, 1L)
                   .otherwise(0L)).cast("long").as("c"),
             sum(when(col("exp") === 0L && col("ret") === 0L, 1L)
                   .otherwise(0L)).cast("long").as("d"))
        .withColumn("num_ppm", expr("(1000000 * a * d) DIV (a+b+c+d)"))
        .withColumn("den_ppm", expr("(1000000 * b * c) DIV (a+b+c+d)"))
        .localCheckpoint(false)
      val pooled = strata.agg(
        expr("CAST((1000000 * sum(num_ppm)) DIV sum(den_ppm) AS BIGINT)")
          .as("mh_or_ppm"))
      strata.crossJoin(broadcast(pooled))
        .select("stratum", "a", "b", "c", "d", "num_ppm", "den_ppm",
                "mh_or_ppm")
    }),
    "q583_cochran_q" -> ((s, dir) => {
      // Cochran's Q for the 3 correlated binary raters of q567: marginal
      // homogeneity over matched documents — Q = 2·Σ(3C_j − S)² /
      // (3·(3S − ΣR²)) in ppm, all from ONE aggregate over the votes
      // (the k=3 closed form; blocks never materialize beyond their
      // row sums).
      val votes = rd(s, dir, "documents").select(
        when(col("n_chars") >= 250L, 1L).otherwise(0L).as("r1"),
        when(expr("length(text) - length(replace(text, ' ', '')) + 1")
               >= 40L, 1L).otherwise(0L).as("r2"),
        when(expr("length(text) - length(replace(text, 'e', ''))")
               >= 20L, 1L).otherwise(0L).as("r3"))
      votes.agg(count(lit(1)).cast("long").as("n"),
                sum(col("r1")).cast("long").as("c1"),
                sum(col("r2")).cast("long").as("c2"),
                sum(col("r3")).cast("long").as("c3"),
                sum(col("r1") + col("r2") + col("r3")).cast("long")
                  .as("sr"),
                sum((col("r1") + col("r2") + col("r3")) *
                    (col("r1") + col("r2") + col("r3"))).cast("long")
                  .as("sr2"))
        .select(col("n"), col("c1"), col("c2"), col("c3"),
          expr("""CAST((1000000 * 2 * ((3*c1-sr)*(3*c1-sr)
                 |  + (3*c2-sr)*(3*c2-sr) + (3*c3-sr)*(3*c3-sr)))
                 | DIV (3 * (3*sr - sr2)) AS BIGINT)""".stripMargin)
            .as("q_ppm"))
    }),
    "q584_wasserstein" -> ((s, dir) => {
      // Wasserstein-1 (earth mover's) distance between the URGENT and
      // LOW order-value distributions: W1 = ∫|F_A − F_B| dx on the
      // dollar grid, scaled ×n1·n2 to stay integral — cumulative counts
      // via cumSumByValue, consecutive-value gaps via cellRank + a
      // rank+1 self-join (no single-partition sort anywhere). The
      // actual-transport-cost companion to TVD (q338) and KS (q447).
      val x = rd(s, dir, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .groupBy(expr("CAST(floor(o_totalprice) AS BIGINT)").as("v"))
        .agg(sum(when(col("o_orderpriority") === "1-URGENT", 1L)
                   .otherwise(0L)).as("na"),
             sum(when(col("o_orderpriority") === "5-LOW", 1L)
                   .otherwise(0L)).as("nb"))
      val c = Profile.cellRank(
          Profile.cumSumByValue(x, "v", Seq("na", "nb")),
          Seq.empty, "v", Seq.empty)
        .select(col("v"), col("_rank").as("rk"),
                col("cum_na").as("ca"), col("cum_nb").as("cb"))
        .localCheckpoint(false)
      val tot = x.agg(sum(col("na")).cast("long").as("n1"),
                      sum(col("nb")).cast("long").as("n2"))
      c.as("a").join(c.as("b"), col("b.rk") === col("a.rk") + 1)
        .select(col("a.ca").as("ca"), col("a.cb").as("cb"),
                (col("b.v") - col("a.v")).as("dv"))
        .crossJoin(broadcast(tot))
        .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
             sum(abs(col("n2") * col("ca") - col("n1") * col("cb"))
                 * col("dv")).cast("long").as("w1_scaled"))
        .withColumn("w1_milli_dollars",
                    expr("(1000 * w1_scaled) DIV (n1 * n2)"))
    }),
    "q575_anderson_darling" -> ((s, dir) => {
      // Tie-adjusted (midrank) two-sample Anderson–Darling A²akN on
      // whole-dollar order value, URGENT vs LOW: both samples collapse to
      // ONE value-grain histogram, cumulative counts via cumSumByValue's
      // two-phase prefix (no global single-partition sort), and each
      // distinct value contributes one pinned HUGEINT/DECIMAL(38) DIV
      // term (num² overflows int64; bound ≤ 1e33 documented). The
      // tail-sensitive EDF distance — heavier tails than KS (q447).
      val x = rd(s, dir, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .groupBy(expr("CAST(floor(o_totalprice) AS BIGINT)").as("v"))
        .agg(sum(when(col("o_orderpriority") === "1-URGENT", 1L)
                   .otherwise(0L)).as("na"),
             sum(when(col("o_orderpriority") === "5-LOW", 1L)
                   .otherwise(0L)).as("nb"))
      val c = Profile.cumSumByValue(x, "v", Seq("na", "nb"))
        .withColumnRenamed("cum_na", "ha").withColumnRenamed("cum_nb", "hb")
        .withColumn("h", col("na") + col("nb"))
      val tot = x.agg(sum(col("na")).cast("long").as("n1"),
                      sum(col("nb")).cast("long").as("n2"),
                      (sum(col("na")) + sum(col("nb"))).cast("long")
                        .as("nn"),
                      count(lit(1)).cast("long").as("n_distinct"))
      def termSql(hi: String, ni: String, gi: String) =
        s"""(1000000 * CAST(nn - 1 AS DECIMAL(38,0)) * h
           |  * (CAST(nn AS DECIMAL(38,0))*(2*$hi - $ni)
           |     - CAST($gi AS DECIMAL(38,0))*(2*(ha+hb) - h))
           |  * (CAST(nn AS DECIMAL(38,0))*(2*$hi - $ni)
           |     - CAST($gi AS DECIMAL(38,0))*(2*(ha+hb) - h)))
           | DIV (CAST(nn AS DECIMAL(38,0)) * nn * $gi
           |  * (CAST(2*(ha+hb) - h AS DECIMAL(38,0))
           |      * (2*nn - 2*(ha+hb) + h)
           |     - CAST(nn AS DECIMAL(38,0)) * h))""".stripMargin
      c.crossJoin(broadcast(tot))
        .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
             max(col("n_distinct")).as("n_distinct"),
             (sum(expr(termSql("ha", "na", "n1"))) +
              sum(expr(termSql("hb", "nb", "n2")))).cast("long")
               .as("ad_a2akn_ppm"))
    }),
    "q576_mmr_retrieval" -> ((s, dir) => {
      // Maximal-marginal-relevance diversified retrieval: per query the
      // greedy pick maximizing 0.7·cos(q,d) − 0.3·max cos(d, selected),
      // 4 unrolled rounds over a top-12 relevance prefetch. The prefetch
      // is the only corpus-wide pass; the MMR lattice (≤ 12² pairs per
      // query) is dimension-grain. Ties break by neighbor id — engine-
      // exact under the shared float-fold convention (FloatVecDot).
      import graft.operators.Similarity
      val e = rd(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val scored = e.select(col("vec_id").as("nid"),
                            col("embedding").as("cv"))
        .join(broadcast(q), col("nid") =!= col("qid"))
        .withColumn("rel", Similarity.cosine(col("qv"), col("cv")))
      val wPre = Window.partitionBy(col("qid"))
        .orderBy(col("rel").desc, col("nid"))
      val pre = scored.withColumn("rn", row_number().over(wPre))
        .filter(col("rn") <= 12).drop("rn", "qv")
        .localCheckpoint(false)
      val pairs = pre.as("a").join(pre.as("b"),
          col("b.qid") === col("a.qid") && col("b.nid") =!= col("a.nid"))
        .select(col("a.qid").as("qid"), col("a.nid").as("a"),
                col("b.nid").as("b"),
                Similarity.cosine(col("a.cv"), col("b.cv")).as("sim"))
        .localCheckpoint(false)
      val cand = pre.select("qid", "nid", "rel")
      val w1 = Window.partitionBy(col("qid"))
        .orderBy(col("rel").desc, col("nid"))
      var sel = cand.withColumn("rn", row_number().over(w1))
        .filter(col("rn") === 1)
        .select(col("qid"), col("nid"), lit(1L).as("pick_rank"),
                col("rel").as("mmr"))
      for (r <- 2 to 4) {
        val remaining = cand.join(sel.select("qid", "nid"),
                                  Seq("qid", "nid"), "left_anti")
        val wr = Window.partitionBy(col("qid"))
          .orderBy(col("mmr").desc, col("nid"))
        val next = remaining.as("p")
          .join(sel.select(col("qid"), col("nid").as("snid")), Seq("qid"))
          .join(pairs.as("pp"), col("pp.qid") === col("p.qid") &&
              col("pp.a") === col("p.nid") &&
              col("pp.b") === col("snid"))
          .groupBy(col("p.qid").as("qid"), col("p.nid").as("nid"),
                   col("p.rel").as("rel"))
          .agg(max(col("sim")).as("msim"))
          .withColumn("mmr", lit(0.7) * col("rel") -
                             lit(0.3) * col("msim"))
          .withColumn("rn", row_number().over(wr))
          .filter(col("rn") === 1)
          .select(col("qid"), col("nid"), lit(r.toLong).as("pick_rank"),
                  col("mmr"))
        sel = sel.unionByName(next).localCheckpoint(false)
      }
      sel.select(col("qid").cast("long").as("query_id"),
                 col("pick_rank"), col("nid").cast("long")
                   .as("neighbor_id"),
                 round(col("mmr"), 4).as("mmr_score"))
    }),
    "q577_stream_chained_stateful" -> ((s, dir) => {
      // CHAINED stateful streaming — dropDuplicatesWithinWatermark
      // followed by a windowed aggregation in ONE streaming query (two
      // state stores, event-time propagated through the dedup): in-batch
      // duplicate sends are suppressed by the first operator, the second
      // rolls up daily counts, a far-future sentinel row drives the final
      // watermark past every real window so append mode flushes them all.
      // Equal to the batch distinct→rollup, re-derived by the oracle.
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val rows = Tables.events(s, dir).filter(col("user_id") % 5 === 2)
        .select(col("event_id"), col("ts"), col("event_type"))
        .as[(Long, java.sql.Timestamp, String)].collect().toSeq
      val sentinel = (-1L,
        java.sql.Timestamp.valueOf("2030-01-01 00:00:00"), "__wm__")
      val src = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, java.sql.Timestamp, String)]
      // All real rows (plus in-batch duplicates of the even half) land in
      // ONE batch: a stateful operator drops input older than the
      // watermark, so a second data batch would lose rows behind the
      // first batch's high-water mark. Batch 2 carries only the sentinel
      // that flushes the windows.
      val b1 = rows.filter(_._1 % 2 == 0)
      src.addData(b1 ++ rows ++ b1: _*)
      src.addData(sentinel)
      val out = src.toDF().toDF("event_id", "ts", "event_type")
        .withWatermark("ts", "2 days")
        .dropDuplicatesWithinWatermark("event_id")
        .filter(col("event_type") =!= "__wm__")
        .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
        .count()
      val tbl = "q577_ch_" + java.util.UUID.randomUUID.toString
        .replace("-", "")
      SparkEntry.withStreamShuffle(s) {
        val q = out.writeStream.format("memory").queryName(tbl)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      s.table(tbl).select(col("w.start").as("day"), col("event_type"),
                          col("count").cast("long").as("n"))
    }),
    "q578_partition_evolution" -> ((s, dir) => {
      // Partition-spec evolution: the table's history half lives under
      // the LEGACY spec (unpartitioned, 4 files) and the current half
      // under the EVOLVED spec (one directory per month); one logical
      // read unions both, and a month-range predicate prunes the evolved
      // half to its 6 matching directories while the legacy half must
      // scan all its files — the migration-without-rewrite contract,
      // with the scanned-file counts emitted as proof.
      val base = java.nio.file.Files
        .createTempDirectory("q578_pe").toString
      val o = rd(s, dir, "orders")
        .withColumn("m", date_format(col("o_orderdate"), "yyyy-MM"))
      o.filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .drop("m").repartition(4)
        .write.mode("overwrite").parquet(s"$base/v1")
      o.filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
        .repartition(col("m"))
        .write.mode("overwrite").partitionBy("m").parquet(s"$base/v2")
      val lo = "1996-07"
      val hi = "1997-06"
      val v1 = s.read.parquet(s"$base/v1")
        .withColumn("m", date_format(col("o_orderdate"), "yyyy-MM"))
        .filter(col("m") >= lo && col("m") <= hi)
      val v2 = s.read.parquet(s"$base/v2")
        .filter(col("m") >= lo && col("m") <= hi)
        .select(v1.columns.map(col): _*)
      val v1Files = v1.select(input_file_name()).distinct().count()
      val v2Files = v2.select(input_file_name()).distinct().count()
      v1.unionByName(v2)
        .groupBy(col("m"))
        .agg(count(lit(1)).cast("long").as("n"))
        .withColumn("v1_files_read", lit(v1Files))
        .withColumn("v2_files_read", lit(v2Files))
    }),
    "q570_bridges" -> ((s, dir) => {
      // Cut edges (bridges) of the thresholded nation-trade graph: for
      // every edge, reachability in G∖{e} via 5 path-DOUBLING rounds —
      // 2⁵ = 32 hops covers any simple path on ≤ 25 nations, so the
      // result is provably exact (not a fixed-sweep approximation). The
      // per-edge state is (edge, a, b) over a ≤ |E|·|V|² relation —
      // dimension-grain after the one fact rollup. Connectivity
      // robustness: which trade lanes have no alternative route.
      val e0 = tradeEdges(s, dir, 300L)
        .select(col("src").as("x"), col("dst").as("y"),
                col("n").as("w"))
        .localCheckpoint(false)
      val eid = e0.withColumn("e", col("x") * 100 + col("y"))
      val sym = e0.select(col("x").as("src"), col("y").as("dst"))
        .unionByName(e0.select(col("y").as("src"), col("x").as("dst")))
      val adj = eid.select("e", "x", "y").crossJoin(sym)
        .filter(!((col("src") === col("x") && col("dst") === col("y")) ||
                  (col("src") === col("y") && col("dst") === col("x"))))
        .select(col("e"), col("src"), col("dst"))
      // Only x(e) → y(e) reachability is asked, so the state is the
      // SINGLE-SOURCE reachable set per removed edge — ≤ |E|·|V| rows,
      // not the |E|·|V|² all-pairs closure. BFS to the FIXPOINT (row
      // count is monotone; equal counts == exact reachability, ≤ |V|
      // rounds always terminates — no fixed-round approximation). Joins
      // stay hash-partitioned on the edge id, so every round is one
      // co-partitioned dimension-sized shuffle.
      val adjC = adj.select(col("e").as("ae"), col("src").as("asrc"),
          col("dst").as("adst"))
        .repartition(col("ae")).localCheckpoint(false)
      var reach = eid.select(col("e"), col("x").as("b")).distinct()
        .localCheckpoint(false)
      var prev = -1L
      var grown = reach.count()
      while (grown != prev) {
        prev = grown
        val nxt = reach.join(adjC, col("e") === col("ae") &&
            col("b") === col("asrc"))
          .select(col("e"), col("adst").as("b"))
        reach = reach.unionByName(nxt).distinct()
          .localCheckpoint(false)
        grown = reach.count()
      }
      eid.as("d").join(reach.as("r"),
          col("r.e") === col("d.e") && col("r.b") === col("d.y"), "left")
        .select(col("d.x").cast("long").as("src"),
                col("d.y").cast("long").as("dst"),
                col("d.w").as("weight"),
                when(col("r.b").isNull, 1L).otherwise(0L).as("is_bridge"))
    }),
    "q571_shapley_attribution" -> ((s, dir) => {
      // Exact Shapley-value channel attribution over the 3 touch
      // channels (view/click/signup, counted strictly before the user's
      // first purchase): users collapse to their touch-subset masks, the
      // 8-subset coalition table v(S) = conversions reachable within S,
      // and φ comes from the closed 3-player form (weights 2/1/2, ×6 to
      // stay integral; Σφ_x6 = 6·v(full) — the efficiency axiom as a
      // built-in check). One fact pass, then 8-row lattice joins.
      val ev = Tables.events(s, dir)
      val fp = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(min(col("ts")).as("first_purchase"))
      def touch(t: String) = max(
        when(col("event_type") === t &&
             (col("first_purchase").isNull ||
              col("ts") < col("first_purchase")), 1L).otherwise(0L))
      val u = ev.join(fp, Seq("user_id"), "left")
        .groupBy(col("user_id"))
        .agg(touch("view").as("cv"), touch("click").as("cc"),
             touch("signup").as("cs"),
             max(when(col("event_type") === "purchase", 1L)
                   .otherwise(0L)).as("conv"))
      val sub = u.filter(col("cv") + col("cc") + col("cs") > 0L)
        .groupBy("cv", "cc", "cs")
        .agg(sum(col("conv")).cast("long").as("conv"))
      val masks = s.range(0, 8).select(col("id").as("m"))
      val vs = masks.crossJoin(broadcast(sub))
        .groupBy(col("m"))
        .agg(coalesce(sum(when(
            (col("cv") === 0L || expr("m % 2 = 1")) &&
            (col("cc") === 0L || expr("(m DIV 2) % 2 = 1")) &&
            (col("cs") === 0L || expr("(m DIV 4) % 2 = 1")),
            col("conv")).otherwise(0L)), lit(0L)).cast("long").as("v"))
        .localCheckpoint(false)
      val bits = {
        import s.implicits._
        Seq(("view", 1L), ("click", 2L), ("signup", 4L))
          .toDF("channel", "bit")
      }
      val phi = broadcast(bits).join(vs.as("s"),
          expr("(s.m DIV bit) % 2 = 0"))
        .join(vs.as("t"), col("t.m") === col("s.m") + col("bit"))
        .groupBy(col("channel"))
        .agg(sum(expr("""CASE (s.m % 2) + ((s.m DIV 2) % 2)
                        |  + ((s.m DIV 4) % 2)
                        | WHEN 0 THEN 2 WHEN 1 THEN 1 ELSE 2 END"""
                   .stripMargin) * (col("t.v") - col("s.v")))
               .cast("long").as("phi_x6"))
      val tot = phi.agg(sum(col("phi_x6")).cast("long").as("total_x6"))
      phi.crossJoin(broadcast(tot))
        .select(col("channel"), col("phi_x6"),
                expr("(1000000 * phi_x6) DIV total_x6").as("share_ppm"))
    }),
    "q572_youden_threshold" -> ((s, dir) => {
      // Youden-J-optimal decision threshold for the brand return-rate
      // forecaster (fit 1995–96, scored 1997): candidate thresholds are
      // the ≤ |brands| distinct permille scores, the confusion counts
      // come from one threshold×score-bin grid join (never a per-row
      // scan per threshold), TPR/FPR as pinned DIVs, argmax tie-broken
      // by the smaller threshold.
      val li = rd(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"),
                when(col("l_returnflag") === "R", 1L).otherwise(0L)
                  .as("y"))
      val o = rd(s, dir, "orders")
        .select(col("o_orderkey"), expr("year(o_orderdate)").as("yr"))
      val p = rd(s, dir, "part").select("p_partkey", "p_brand")
      val joined = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      val fit = joined.filter(col("yr").isin(1995, 1996))
        .groupBy(col("p_brand"))
        .agg(expr("(1000 * sum(y)) DIV count(1)").as("p"))
      val bins = joined.filter(col("yr") === 1997)
        .join(broadcast(fit), Seq("p_brand"))
        .groupBy(col("p"))
        .agg(count(lit(1)).cast("long").as("n"),
             sum(col("y")).cast("long").as("pos"))
        .localCheckpoint(false)
      val tot = bins.agg(sum(col("pos")).cast("long").as("pos"),
                         (sum(col("n")) - sum(col("pos"))).cast("long")
                           .as("neg"))
      val th = bins.select(col("p").as("t")).distinct()
      val conf = th.crossJoin(bins)
        .groupBy(col("t"))
        .agg(sum(when(col("p") >= col("t"), col("pos")).otherwise(0L))
               .cast("long").as("tp"),
             sum(when(col("p") >= col("t"), col("n") - col("pos"))
                   .otherwise(0L)).cast("long").as("fp"))
      val j = conf.crossJoin(broadcast(tot))
        .select(col("t"),
                expr("(1000000 * tp) DIV pos").as("tpr_ppm"),
                expr("(1000000 * fp) DIV neg").as("fpr_ppm"))
        .withColumn("j_ppm", col("tpr_ppm") - col("fpr_ppm"))
      val w = Window.partitionBy(DimKey.one)
        .orderBy(col("j_ppm").desc, col("t"))
      j.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("t").cast("long").as("threshold_pm"),
                col("tpr_ppm").cast("long").as("tpr_ppm"),
                col("fpr_ppm").cast("long").as("fpr_ppm"),
                col("j_ppm").cast("long").as("j_ppm"))
    }),
    "q573_page_trend" -> ((s, dir) => {
      // Page's L trend test — the ordered-alternative companion to q553:
      // same Friedman rank layout (blocks = 1996 months, treatments =
      // the NATURALLY ORDERED priorities 1..5), L = Σ j·R_j with doubled
      // tie-average ranks, alongside its null expectation n·k(k+1)²/2
      // (×2 scale matched). A monotone priority→volume trend pushes
      // L_x2 above e_l_x2_x2.
      val v = rd(s, dir, "orders")
        .filter(expr("year(o_orderdate) = 1996"))
        .groupBy(expr("CAST(month(o_orderdate) AS BIGINT)").as("blk"),
                 col("o_orderpriority").as("trt"))
        .agg(count(lit(1)).cast("long").as("y"))
      val rs = rankX2(v, Seq(col("blk")), col("y"))
        .groupBy(col("trt"))
        .agg(sum(col("rank_x2")).cast("long").as("r_sum_x2"))
        .withColumn("j", expr("CAST(substr(trt, 1, 1) AS BIGINT)"))
      val nBlocks = v.select(col("blk")).distinct()
        .agg(count(lit(1)).cast("long").as("nb"))
      rs.agg(count(lit(1)).cast("long").as("k"),
             sum(col("j") * col("r_sum_x2")).cast("long").as("l_x2"))
        .crossJoin(broadcast(nBlocks))
        .select(col("l_x2"), col("nb").as("n_blocks"),
                col("k").as("n_treatments"),
                expr("nb * k * (k+1) * (k+1)").as("e_l_x2_x2"))
    }),
    "q574_partial_correlation" -> ((s, dir) => {
      // First-order partial correlation r²(quantity, price | discount),
      // signed, from the nine n²-scaled moment sums: the sqrt-free form
      // r² = (num/dx)·(num/dy) evaluated as two pinned ppm DIVs whose
      // product is re-quantized once — every intermediate bounded by
      // 1e36 (documented), DECIMAL(38) here / HUGEINT in the oracle.
      // One combine-enabled aggregate over the fact table; no shuffle
      // beyond the 10-sum rollup.
      val d = rd(s, dir, "lineitem").select(
        expr("CAST(l_quantity AS BIGINT)").as("x"),
        expr("CAST(floor(l_extendedprice * 100) AS BIGINT) DIV 1000")
          .as("y"),
        expr("CAST(floor(l_discount * 100) AS BIGINT)").as("z"))
      val sums = d.agg(
        count(lit(1)).cast("long").as("n"),
        sum(col("x")).cast("long").as("sx"),
        sum(col("y")).cast("long").as("sy"),
        sum(col("z")).cast("long").as("sz"),
        sum(col("x") * col("x")).cast("long").as("sxx"),
        sum(col("y") * col("y")).cast("long").as("syy"),
        sum(col("z") * col("z")).cast("long").as("szz"),
        sum(col("x") * col("y")).cast("long").as("sxy"),
        sum(col("x") * col("z")).cast("long").as("sxz"),
        sum(col("y") * col("z")).cast("long").as("syz"))
      val c = sums.select(
        expr("CAST(n AS DECIMAL(38,0))*sxy - CAST(sx AS DECIMAL(38,0))*sy")
          .as("cxy"),
        expr("CAST(n AS DECIMAL(38,0))*sxz - CAST(sx AS DECIMAL(38,0))*sz")
          .as("cxz"),
        expr("CAST(n AS DECIMAL(38,0))*syz - CAST(sy AS DECIMAL(38,0))*sz")
          .as("cyz"),
        expr("CAST(n AS DECIMAL(38,0))*sxx - CAST(sx AS DECIMAL(38,0))*sx")
          .as("vx"),
        expr("CAST(n AS DECIMAL(38,0))*syy - CAST(sy AS DECIMAL(38,0))*sy")
          .as("vy"),
        expr("CAST(n AS DECIMAL(38,0))*szz - CAST(sz AS DECIMAL(38,0))*sz")
          .as("vz"))
      c.select(
        expr("""CAST(CASE WHEN cxy*vz - cxz*cyz >= 0
               | THEN (((1000000 * (cxy*vz - cxz*cyz))
               |         DIV (vx*vz - cxz*cxz))
               |      * ((1000000 * (cxy*vz - cxz*cyz))
               |         DIV (vy*vz - cyz*cyz))) DIV 1000000
               | ELSE -((((1000000 * (cxz*cyz - cxy*vz))
               |         DIV (vx*vz - cxz*cxz))
               |      * ((1000000 * (cxz*cyz - cxy*vz))
               |         DIV (vy*vz - cyz*cyz))) DIV 1000000)
               | END AS BIGINT)""".stripMargin)
          .as("partial_r2_signed_ppm"),
        expr("""CAST(CASE WHEN cxy >= 0
               | THEN (((1000000 * cxy) DIV vx)
               |      * ((1000000 * cxy) DIV vy)) DIV 1000000
               | ELSE -((((1000000 * (-cxy)) DIV vx)
               |      * ((1000000 * (-cxy)) DIV vy)) DIV 1000000)
               | END AS BIGINT)""".stripMargin)
          .as("marginal_r2_signed_ppm"))
    }),
    "q564_goodman_kruskal_gamma" -> ((s, dir) => {
      // Goodman–Kruskal gamma between two ordinal lineitem attributes
      // (quantity, discount band) via the contingency-grid decomposition:
      // concordant/discordant pair counts come from the ≤ 550-cell grid
      // cross join, never the O(n²) row pairs — the fact table feeds one
      // rollup. Counts are doubled (both pair orders); the ratio is
      // invariant.
      val cells = rd(s, dir, "lineitem")
        .groupBy(expr("CAST(l_quantity AS BIGINT)").as("xi"),
                 expr("CAST(floor(l_discount * 100) AS BIGINT)").as("yi"))
        .agg(count(lit(1)).cast("long").as("n"))
      cells.as("a").crossJoin(cells.as("b"))
        .agg(sum(when(col("b.xi") > col("a.xi") &&
                      col("b.yi") > col("a.yi"),
                      col("a.n") * col("b.n")).otherwise(0L))
               .cast("long").as("conc2"),
             sum(when(col("b.xi") > col("a.xi") &&
                      col("b.yi") < col("a.yi"),
                      col("a.n") * col("b.n")).otherwise(0L))
               .cast("long").as("disc2"))
        .select(expr("conc2 DIV 2").as("conc"),
                expr("disc2 DIV 2").as("disc"),
                expr("""CASE WHEN conc2 >= disc2
                       | THEN (1000000 * (conc2 - disc2))
                       |   DIV (conc2 + disc2)
                       | ELSE -((1000000 * (disc2 - conc2))
                       |   DIV (conc2 + disc2)) END""".stripMargin)
                  .as("gamma_ppm"))
    }),
    "q565_somers_d" -> ((s, dir) => {
      // Somers' D in both directions from the same contingency grid as
      // q564: (C − D) over the pairs untied on the conditioning
      // variable, N² − Σ marginal² (doubled counts cancel). The
      // asymmetric ordinal-association measure — d_yx treats quantity
      // as predictor, d_xy discount.
      val cells = rd(s, dir, "lineitem")
        .groupBy(expr("CAST(l_quantity AS BIGINT)").as("xi"),
                 expr("CAST(floor(l_discount * 100) AS BIGINT)").as("yi"))
        .agg(count(lit(1)).cast("long").as("n"))
        .localCheckpoint(false)
      val cd = cells.as("a").crossJoin(cells.as("b"))
        .agg(sum(when(col("b.xi") > col("a.xi") &&
                      col("b.yi") > col("a.yi"),
                      col("a.n") * col("b.n")).otherwise(0L))
               .cast("long").as("conc2"),
             sum(when(col("b.xi") > col("a.xi") &&
                      col("b.yi") < col("a.yi"),
                      col("a.n") * col("b.n")).otherwise(0L))
               .cast("long").as("disc2"))
      val rowsq = cells.groupBy(col("xi"))
        .agg(sum(col("n")).as("rn"))
        .agg(sum(col("rn") * col("rn")).cast("long").as("rowsq"))
      val colsq = cells.groupBy(col("yi"))
        .agg(sum(col("n")).as("cn"))
        .agg(sum(col("cn") * col("cn")).cast("long").as("colsq"))
      val nn = cells.agg(sum(col("n")).cast("long").as("nn"))
      cd.crossJoin(broadcast(nn)).crossJoin(broadcast(rowsq))
        .crossJoin(broadcast(colsq))
        .select(
          expr("""CASE WHEN conc2 >= disc2
                 | THEN (1000000 * (conc2 - disc2))
                 |   DIV (nn * nn - rowsq)
                 | ELSE -((1000000 * (disc2 - conc2))
                 |   DIV (nn * nn - rowsq)) END""".stripMargin)
            .as("somers_d_yx_ppm"),
          expr("""CASE WHEN conc2 >= disc2
                 | THEN (1000000 * (conc2 - disc2))
                 |   DIV (nn * nn - colsq)
                 | ELSE -((1000000 * (disc2 - conc2))
                 |   DIV (nn * nn - colsq)) END""".stripMargin)
            .as("somers_d_xy_ppm"))
    }),
    "q566_cronbach_alpha" -> ((s, dir) => {
      // Cronbach's alpha over the three RFM sub-scores: deterministic
      // quintile scores 1..5 via row_number over (value, custkey) — no
      // ntile tie ambiguity — then the n²-scaled variance identity
      // n·Σx² − (Σx)² keeps every term integral; alpha in one
      // sign-folded DIV. Internal-consistency reliability of the
      // customer-value scorecard.
      val base = rd(s, dir, "orders")
        .groupBy(col("o_custkey").as("ck"))
        .agg(max(unix_millis(col("o_orderdate").cast("timestamp")))
               .cast("long").as("rec"),
             count(lit(1)).cast("long").as("freq"),
             sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
               .cast("long").as("mon"))
        .localCheckpoint(false)
      def score(df: DataFrame, c: String, as: String) =
        Profile.cellRank(df, Seq.empty, c, Seq("ck"))
          .withColumn(as, expr("1 + (5 * (_rank - 1)) DIV _n"))
          .drop("_rank", "_n")
      val sc = score(score(score(base, "rec", "r"), "freq", "f"),
                     "mon", "m")
        .select("r", "f", "m")
      sc.agg(count(lit(1)).cast("long").as("n"),
             expr("CAST(count(1)*sum(r*r) - sum(r)*sum(r) AS BIGINT)")
               .as("var_r_n2"),
             expr("CAST(count(1)*sum(f*f) - sum(f)*sum(f) AS BIGINT)")
               .as("var_f_n2"),
             expr("CAST(count(1)*sum(m*m) - sum(m)*sum(m) AS BIGINT)")
               .as("var_m_n2"),
             expr("CAST(count(1)*sum((r+f+m)*(r+f+m))" +
                  " - sum(r+f+m)*sum(r+f+m) AS BIGINT)").as("var_tot_n2"))
        .withColumn("alpha_ppm", expr(
          """CASE WHEN var_tot_n2 - var_r_n2 - var_f_n2 - var_m_n2 >= 0
            | THEN (1000000 * 3
            |   * (var_tot_n2 - var_r_n2 - var_f_n2 - var_m_n2))
            |   DIV (2 * var_tot_n2)
            | ELSE -((1000000 * 3
            |   * (var_r_n2 + var_f_n2 + var_m_n2 - var_tot_n2))
            |   DIV (2 * var_tot_n2)) END""".stripMargin))
    }),
    "q567_fleiss_kappa" -> ((s, dir) => {
      // Fleiss' kappa for 3 deterministic document-quality "raters"
      // (char length, word count, 'e'-frequency thresholds), binary
      // categories: the closed form collapses to two global sums
      // (pairwise-agreement Σ nᵢⱼ² and the good-vote total), so kappa is
      // one sign-folded DIV over exact ints — inter-rater reliability
      // with zero shuffles beyond a single aggregate.
      val votes = rd(s, dir, "documents").select(
        (when(col("n_chars") >= 250L, 1L).otherwise(0L) +
         when(expr("length(text) - length(replace(text, ' ', '')) + 1")
                >= 40L, 1L).otherwise(0L) +
         when(expr("length(text) - length(replace(text, 'e', ''))")
                >= 20L, 1L).otherwise(0L)).as("ng"))
      votes.agg(count(lit(1)).cast("long").as("nn"),
                sum(expr("ng*ng + (3-ng)*(3-ng) - 3")).cast("long")
                  .as("s1"),
                sum(col("ng")).cast("long").as("g"))
        .select(col("nn").as("n_docs"), col("g").as("n_good_votes"),
          expr("""CAST(CASE
                 | WHEN 3*nn*s1 - 2*(g*g + (3*nn-g)*(3*nn-g)) >= 0
                 | THEN (1000000*(3*nn*s1 - 2*(g*g + (3*nn-g)*(3*nn-g))))
                 |   DIV (2*(9*nn*nn - g*g - (3*nn-g)*(3*nn-g)))
                 | ELSE -((1000000*(2*(g*g + (3*nn-g)*(3*nn-g))
                 |     - 3*nn*s1))
                 |   DIV (2*(9*nn*nn - g*g - (3*nn-g)*(3*nn-g))))
                 | END AS BIGINT)""".stripMargin).as("kappa_ppm"))
    }),
    "q568_lin_ccc" -> ((s, dir) => {
      // Lin's concordance correlation between paired 1996/1997 monthly
      // nation revenue (unit: cent·pct DIV 1e6): CCC = 2·cov / (var_x +
      // var_y + (x̄−ȳ)²), all terms on the shared n² scale so one
      // DECIMAL(38) sign-folded DIV finishes it. Agreement (not just
      // correlation) between consecutive-year revenue profiles.
      val rev = nationMonthRevenue(s, dir)
        .filter(col("yr").isin(1996L, 1997L))
        .select(col("nk"), col("yr"), col("mo"),
                expr("rev DIV 1000000").as("v"))
      val p = rev.as("a").join(rev.as("b"),
          col("b.nk") === col("a.nk") && col("b.mo") === col("a.mo") &&
          col("a.yr") === 1996L && col("b.yr") === 1997L)
        .select(col("a.v").as("x"), col("b.v").as("y"))
      p.agg(count(lit(1)).cast("long").as("n"),
            sum(col("x")).cast("long").as("sx"),
            sum(col("y")).cast("long").as("sy"),
            sum(col("x") * col("x")).cast("long").as("sxx"),
            sum(col("y") * col("y")).cast("long").as("syy"),
            sum(col("x") * col("y")).cast("long").as("sxy"))
        .select(col("n"), col("sx"), col("sy"),
          expr("CAST(n*sxy - sx*sy AS BIGINT)").as("cov_n2"),
          expr("""CAST(CASE WHEN n*sxy - sx*sy >= 0
                 | THEN (2000000 * (CAST(n AS DECIMAL(38,0))*sxy
                 |     - CAST(sx AS DECIMAL(38,0))*sy))
                 |   DIV ((CAST(n AS DECIMAL(38,0))*sxx
                 |     - CAST(sx AS DECIMAL(38,0))*sx)
                 |    + (CAST(n AS DECIMAL(38,0))*syy
                 |     - CAST(sy AS DECIMAL(38,0))*sy)
                 |    + CAST(sx-sy AS DECIMAL(38,0))*(sx-sy))
                 | ELSE -((2000000 * (CAST(sx AS DECIMAL(38,0))*sy
                 |     - CAST(n AS DECIMAL(38,0))*sxy))
                 |   DIV ((CAST(n AS DECIMAL(38,0))*sxx
                 |     - CAST(sx AS DECIMAL(38,0))*sx)
                 |    + (CAST(n AS DECIMAL(38,0))*syy
                 |     - CAST(sy AS DECIMAL(38,0))*sy)
                 |    + CAST(sx-sy AS DECIMAL(38,0))*(sx-sy)))
                 | END AS BIGINT)""".stripMargin).as("ccc_ppm"))
    }),
    "q569_jonckheere_terpstra" -> ((s, dir) => {
      // Jonckheere–Terpstra ordered-alternative test: does quantity
      // trend across ordered discount bands? JT doubled (2·gt + eq per
      // ordered band pair) stays integral through the tie convention;
      // computed on the ≤ 550-cell (band, quantity) grid — all ordered
      // band-pair products, never row pairs.
      val cells = rd(s, dir, "lineitem")
        .groupBy(expr("CAST(floor(l_discount * 100) AS BIGINT)")
                   .as("band"),
                 expr("CAST(l_quantity AS BIGINT)").as("q"))
        .agg(count(lit(1)).cast("long").as("n"))
      cells.as("a").join(cells.as("b"), col("b.band") > col("a.band"))
        .agg(sum(when(col("b.q") > col("a.q"),
                      lit(2L) * col("a.n") * col("b.n"))
               .when(col("b.q") === col("a.q"), col("a.n") * col("b.n"))
               .otherwise(0L)).cast("long").as("jt_x2"),
             sum(col("a.n") * col("b.n")).cast("long").as("n_pairs"))
        .withColumn("jt_norm_ppm",
                    expr("(1000000 * jt_x2) DIV (2 * n_pairs)"))
    }),
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

  /** Shared oracle fragment: the canonical co-purchase item graph
    * (x < y, ≥ 2 shared orders) + its symmetric adjacency — mirrors
    * [[copurchaseEdges]]/[[symEdges]].
    */
  private val CopurchaseCte: String =
    """e0 AS MATERIALIZED (
      |  SELECT a.i AS x, b.i AS y FROM
      |    (SELECT DISTINCT l_orderkey AS g, l_partkey AS i
      |     FROM lineitem) a
      |  JOIN (SELECT DISTINCT l_orderkey AS g, l_partkey AS i
      |        FROM lineitem) b
      |    ON a.g = b.g AND a.i < b.i
      |  GROUP BY 1, 2 HAVING count(*) >= 2),
      |sym AS MATERIALIZED (
      |  SELECT x AS src, y AS dst FROM e0
      |  UNION ALL SELECT y, x FROM e0)""".stripMargin

  /** Shared oracle fragment: the monthly order-count series
    * (mi 0-based from 1995-01) — mirrors [[monthlySeries]].
    */
  private val MonthlyCte: String =
    """m AS MATERIALIZED (
      |  SELECT CAST((year(o_orderdate)-1995)*12 + month(o_orderdate)-1
      |    AS BIGINT) AS mi, CAST(count(*) AS BIGINT) AS y
      |  FROM orders GROUP BY 1)""".stripMargin

  /** Shared oracle fragment: the ordinal (quantity × discount-band)
    * contingency grid (q564/q565).
    */
  private val OrdinalCellsCte: String =
    """cells AS MATERIALIZED (
      |  SELECT CAST(l_quantity AS BIGINT) AS xi,
      |    CAST(floor(l_discount*100) AS BIGINT) AS yi,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM lineitem GROUP BY 1, 2),
      |cd AS (
      |  SELECT
      |    CAST(coalesce(sum(a.n * b.n) FILTER (WHERE b.xi > a.xi
      |      AND b.yi > a.yi), 0) AS BIGINT) AS conc2,
      |    CAST(coalesce(sum(a.n * b.n) FILTER (WHERE b.xi > a.xi
      |      AND b.yi < a.yi), 0) AS BIGINT) AS disc2
      |  FROM cells a CROSS JOIN cells b)""".stripMargin

  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(generate_series(1, len($a)), i -> " +
      s"CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  private def cosSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / sqrt(${dotSql(a, a)} * ${dotSql(b, b)}))"

  /** One unrolled MMR greedy round (q576): pick r from the remaining
    * prefetch candidates by 0.7·rel − 0.3·max(sim to selected).
    */
  private def mmrRound(r: Int): String =
    s"""s$r AS MATERIALIZED (
       |  SELECT * FROM s${r - 1}
       |  UNION ALL
       |  SELECT qid, nid, $r AS pick_rank, mmr FROM (
       |    SELECT p.qid, p.nid,
       |      0.7 * p.rel - 0.3 * max(pp.sim) AS mmr,
       |      row_number() OVER (PARTITION BY p.qid
       |        ORDER BY 0.7 * p.rel - 0.3 * max(pp.sim) DESC, p.nid)
       |        AS rn
       |    FROM pre p
       |    JOIN s${r - 1} s ON s.qid = p.qid
       |    JOIN pairs pp ON pp.qid = p.qid AND pp.a = p.nid
       |      AND pp.b = s.nid
       |    WHERE p.nid NOT IN (SELECT nid FROM s${r - 1} x
       |                        WHERE x.qid = p.qid)
       |    GROUP BY p.qid, p.nid, p.rel)
       |  WHERE rn = 1)""".stripMargin

  /** Shared oracle fragment: orders joined to their customer's region
    * name (q579/q580/q582).
    */
  private val OrdersRegionCte: String =
    """oreg AS MATERIALIZED (
      |  SELECT o.*, r.r_name AS reg
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  JOIN region r ON n.n_regionkey = r.r_regionkey)""".stripMargin

  /** One Luby round (q585): undecided beating all undecided neighbors
    * joins the MIS; winners and their neighbors leave the undecided set.
    */
  private def lubyRound(r: Int): String =
    s"""nbmax$r AS MATERIALIZED (
       |  SELECT a.src AS v, CAST(max(b.pr) AS BIGINT) AS mx
       |  FROM sym a JOIN u${r - 1} b ON b.v = a.dst
       |  WHERE a.src IN (SELECT v FROM u${r - 1})
       |  GROUP BY 1),
       |win$r AS MATERIALIZED (
       |  SELECT u.v FROM u${r - 1} u LEFT JOIN nbmax$r nb ON nb.v = u.v
       |  WHERE nb.v IS NULL OR u.pr > nb.mx),
       |s$r AS MATERIALIZED (
       |  SELECT v FROM s${r - 1} UNION SELECT v FROM win$r),
       |u$r AS MATERIALIZED (
       |  SELECT u.v, u.pr FROM u${r - 1} u
       |  WHERE u.v NOT IN (SELECT v FROM win$r)
       |    AND u.v NOT IN (SELECT a.src FROM sym a
       |                    JOIN win$r w ON w.v = a.dst))""".stripMargin

  /** One Bradley–Terry MM round (q588): p' = w / Σ n/(p_i+p_j), pinned
    * 1e12 DIVs, renormalized to sum 5e6.
    */
  private def btRound(r: Int): String =
    s"""praw$r AS MATERIALIZED (
       |  SELECT w.item, CAST((w.w * 1000000000000) // d.d AS BIGINT)
       |    AS praw
       |  FROM wins w JOIN (
       |    SELECT c.i AS item,
       |      CAST(sum((c.n_ij * 1000000000000) // (pa.p + pb.p))
       |        AS BIGINT) AS d
       |    FROM comp c JOIN p${r - 1} pa ON pa.item = c.i
       |    JOIN p${r - 1} pb ON pb.item = c.j
       |    GROUP BY 1) d ON d.item = w.item),
       |p$r AS MATERIALIZED (
       |  SELECT item, CAST((praw * 5000000)
       |    // (SELECT sum(praw) FROM praw$r) AS BIGINT) AS p
       |  FROM praw$r)""".stripMargin

  /** md5-derived 60-bit deterministic hash (q585/q587), DuckDB-side. */
  private def mdHashSql(e: String): String =
    s"(('0x' || substr(md5($e), 1, 15))::UBIGINT::BIGINT)"

  /** Shared oracle fragment: thresholded (≥300) undirected weighted
    * trade edges (q589/q590).
    */
  private val Trade300Cte: String =
    """e0 AS MATERIALIZED (
      |  SELECT least(c.c_nationkey, s.s_nationkey) AS x,
      |    greatest(c.c_nationkey, s.s_nationkey) AS y,
      |    CAST(count(*) AS BIGINT) AS w
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  WHERE c.c_nationkey <> s.s_nationkey
      |  GROUP BY 1, 2 HAVING count(*) >= 300)""".stripMargin

  /** One greedy locally-heaviest matching round (q589). */
  private def matchRound(r: Int): String =
    s"""best$r AS MATERIALIZED (
       |  SELECT v, x, y FROM (
       |    SELECT s.v, s.x, s.y,
       |      row_number() OVER (PARTITION BY s.v
       |        ORDER BY s.w DESC, s.x, s.y) AS rn
       |    FROM (SELECT x AS v, x, y, w FROM e${r - 1}
       |          UNION ALL SELECT y, x, y, w FROM e${r - 1}) s)
       |  WHERE rn = 1),
       |pick$r AS MATERIALIZED (
       |  SELECT a.x, a.y FROM best$r a JOIN best$r b
       |  ON a.x = b.x AND a.y = b.y AND a.v = a.x AND b.v = a.y),
       |m$r AS MATERIALIZED (
       |  SELECT x, y, w FROM m${r - 1}
       |  UNION ALL SELECT e.x, e.y, e.w FROM e${r - 1} e
       |  JOIN pick$r p ON p.x = e.x AND p.y = e.y),
       |e$r AS MATERIALIZED (
       |  SELECT e.x, e.y, e.w FROM e${r - 1} e
       |  WHERE e.x NOT IN (SELECT x FROM pick$r UNION
       |                    SELECT y FROM pick$r)
       |    AND e.y NOT IN (SELECT x FROM pick$r UNION
       |                    SELECT y FROM pick$r))""".stripMargin

  /** One per-removed-node path-doubling round (q590). */
  private def rmDoubleRound(r: Int): String =
    s"""r$r AS MATERIALIZED (
       |  SELECT DISTINCT rm, a, b FROM (
       |    SELECT rm, a, b FROM r${r - 1} UNION ALL
       |    SELECT p.rm, p.a, q.b FROM r${r - 1} p
       |    JOIN r${r - 1} q ON q.rm = p.rm AND q.a = p.b))""".stripMargin

  /** Integer milli-space squared L2 over quantized lists (q592/q593). */
  private def sqDistSql(a: String, b: String): String =
    s"list_sum(list_transform(generate_series(1, len($a)), i -> " +
      s"CAST(($a[i]-$b[i])*($a[i]-$b[i]) AS BIGINT)))"

  /** One Gonzalez farthest-point round (q592). */
  private def kcenterRound(k: Int): String =
    s"""c$k AS MATERIALIZED (
       |  SELECT vec_id, q FROM d${k - 1}
       |  QUALIFY row_number() OVER (ORDER BY dmin DESC, vec_id) = 1),
       |d$k AS MATERIALIZED (
       |  SELECT a.vec_id, a.q,
       |    least(a.dmin, ${sqDistSql("a.q", "b.q")}) AS dmin
       |  FROM d${k - 1} a CROSS JOIN c$k b)""".stripMargin

  /** One undirected-closure doubling round keyed by threshold (q603). */
  private def thDoubleRound(r: Int): String =
    s"""t$r AS MATERIALIZED (
       |  SELECT DISTINCT th, a, b FROM (
       |    SELECT th, a, b FROM t${r - 1} UNION ALL
       |    SELECT p.th, p.a, q.b FROM t${r - 1} p
       |    JOIN t${r - 1} q ON q.th = p.th AND q.a = p.b))""".stripMargin

  /** One min-plus doubling round over per-edge residual distances
    * (q602): d₂ₖ(a,b) = min(dₖ(a,b), min over m of dₖ(a,m)+dₖ(m,b)).
    */
  private def minPlusRound(r: Int): String =
    s"""d$r AS MATERIALIZED (
       |  SELECT e, a, b, CAST(min(d) AS BIGINT) AS d FROM (
       |    SELECT e, a, b, d FROM d${r - 1} UNION ALL
       |    SELECT p.e, p.a, q.b, p.d + q.d FROM d${r - 1} p
       |    JOIN d${r - 1} q ON q.e = p.e AND q.a = p.b)
       |  GROUP BY 1, 2, 3)""".stripMargin

  /** One kNN majority-vote propagation round (q609). */
  private def propRound(r: Int): String =
    s"""l$r AS MATERIALIZED (
       |  SELECT l${r - 1}.v, coalesce(l${r - 1}.lab, m.lab) AS lab
       |  FROM l${r - 1}
       |  LEFT JOIN (
       |    SELECT i AS v, lab FROM (
       |      SELECT k.i, n.lab, count(*) AS cnt,
       |        row_number() OVER (PARTITION BY k.i
       |          ORDER BY count(*) DESC, n.lab) AS rn
       |      FROM knn k JOIN l${r - 1} n ON n.v = k.j
       |      WHERE n.lab IS NOT NULL
       |      GROUP BY k.i, n.lab)
       |    WHERE rn = 1) m ON m.v = l${r - 1}.v)""".stripMargin

  /** Shared oracle fragment: year-keyed ≥20-shipment trade edges for
    * 1996/1997 (q615/q616).
    */
  private val YearEdgeCte: String =
    """e AS MATERIALIZED (
      |  SELECT year(o.o_orderdate) AS yr,
      |    least(c.c_nationkey, s.s_nationkey) AS x,
      |    greatest(c.c_nationkey, s.s_nationkey) AS y,
      |    CAST(count(*) AS BIGINT) AS w
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  WHERE c.c_nationkey <> s.s_nationkey
      |    AND year(o.o_orderdate) IN (1996, 1997)
      |  GROUP BY 1, 2, 3 HAVING count(*) >= 20)""".stripMargin

  /** One median-polish sweep, DuckDB-side (q622): doubled median of `v`
    * per `part`, subtracted.
    */
  private def polishSweep(part: String, src: String,
                          out: String): String =
    s"""${out}_m AS MATERIALIZED (
       |  SELECT $part, CAST(min(x) + max(x) AS BIGINT) AS m2 FROM (
       |    SELECT $part, y AS x,
       |      row_number() OVER (PARTITION BY $part ORDER BY y) AS rn,
       |      count(*) OVER (PARTITION BY $part) AS cnt FROM $src) t
       |  WHERE rn IN ((cnt+1)//2, (cnt+2)//2) GROUP BY $part),
       |$out AS MATERIALIZED (
       |  SELECT $src.mo, $src.yr, 2*$src.y - ${out}_m.m2 AS y
       |  FROM $src JOIN ${out}_m ON ${out}_m.$part = $src.$part)"""
      .stripMargin

  def oracleSql: Map[String, String] = Map(
    "q629_binary_segmentation" ->
      s"""WITH $MonthlyCte,
        |c AS MATERIALIZED (
        |  SELECT mi, y,
        |    CAST(sum(y) OVER w AS BIGINT) AS cs,
        |    CAST(sum(y*y) OVER w AS BIGINT) AS cs2,
        |    CAST(row_number() OVER (ORDER BY mi) AS BIGINT) AS t,
        |    CAST(count(*) OVER () AS BIGINT) AS n,
        |    CAST(sum(y) OVER () AS BIGINT) AS ts,
        |    CAST(sum(y*y) OVER () AS BIGINT) AS ts2
        |  FROM m WINDOW w AS (ORDER BY mi ROWS BETWEEN UNBOUNDED
        |    PRECEDING AND CURRENT ROW)),
        |cand AS (
        |  SELECT mi,
        |    (1000 * (t * cs2 - cs*cs)) // t
        |    + (1000 * ((n - t) * (ts2 - cs2) - (ts - cs)*(ts - cs)))
        |      // (n - t) AS sse_milli
        |  FROM c WHERE t < n)
        |SELECT CAST(row_number() OVER (ORDER BY sse_milli, mi)
        |    AS BIGINT) AS split_rank,
        |  mi AS split_mi, CAST(sse_milli AS BIGINT) AS sse_milli
        |FROM cand QUALIFY split_rank <= 3""".stripMargin,
    "q630_matching_att" ->
      """WITH o AS MATERIALIZED (
        |  SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice*100) AS BIGINT) AS v,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS yout,
        |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
        |      AS treated
        |  FROM orders
        |  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
        |ranked AS MATERIALIZED (
        |  SELECT k AS ck, v AS cv, yout AS cy,
        |    CAST(row_number() OVER (ORDER BY v, k) AS BIGINT) AS r
        |  FROM o WHERE treated = 0),
        |grid AS MATERIALIZED (
        |  SELECT v, CAST(sum(1 - treated) AS BIGINT) AS nc
        |  FROM o GROUP BY 1),
        |cum AS MATERIALIZED (
        |  SELECT v, CAST(sum(nc) OVER (ORDER BY v ROWS BETWEEN
        |    UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS rb
        |  FROM grid),
        |t AS MATERIALIZED (
        |  SELECT o.k, o.v, o.yout, cum.rb FROM o
        |  JOIN cum ON cum.v = o.v WHERE o.treated = 1),
        |cand AS (
        |  SELECT t.k, t.yout, r.ck, r.cy, abs(r.cv - t.v) AS dist
        |  FROM t JOIN ranked r ON r.r = t.rb
        |  UNION ALL
        |  SELECT t.k, t.yout, r.ck, r.cy, abs(r.cv - t.v)
        |  FROM t JOIN ranked r ON r.r = t.rb + 1),
        |pick AS (
        |  SELECT k, yout, cy FROM (
        |    SELECT *, row_number() OVER (PARTITION BY k
        |      ORDER BY dist, ck) AS rn FROM cand)
        |  WHERE rn = 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_matched,
        |  CAST(sum(yout) AS BIGINT) AS treated_f,
        |  CAST(sum(cy) AS BIGINT) AS control_f,
        |  CAST(CASE WHEN sum(yout) >= sum(cy)
        |    THEN (1000000 * (sum(yout) - sum(cy))) // count(*)
        |    ELSE -((1000000 * (sum(cy) - sum(yout))) // count(*)) END
        |    AS BIGINT) AS att_ppm
        |FROM pick""".stripMargin,
    "q625_kendall_distance" ->
      """WITH br AS MATERIALIZED (
        |  SELECT p.p_brand AS brand,
        |    CAST(sum(CAST(floor(l.l_extendedprice*100) AS BIGINT))
        |      AS BIGINT) AS rev,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1),
        |rk AS MATERIALIZED (
        |  SELECT brand, row_number() OVER (ORDER BY rev DESC, brand)
        |    AS ra,
        |    row_number() OVER (ORDER BY cnt DESC, brand) AS rb
        |  FROM br),
        |pairs AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(sum(CASE WHEN (a.ra < b.ra) <> (a.rb < b.rb) THEN 1
        |      ELSE 0 END) AS BIGINT) AS discordant
        |  FROM rk a JOIN rk b ON b.brand > a.brand)
        |SELECT n_pairs, discordant,
        |  CAST((1000000 * discordant) // n_pairs AS BIGINT)
        |    AS kendall_distance_ppm
        |FROM pairs""".stripMargin,
    "q626_qn_scale" ->
      s"""WITH $MonthlyCte,
        |g AS (SELECT CAST(count(*) AS BIGINT) AS n FROM m),
        |pd AS MATERIALIZED (
        |  SELECT abs(a.y - b.y) AS d FROM m a JOIN m b ON b.mi > a.mi),
        |rk AS (
        |  SELECT d, row_number() OVER (ORDER BY d) AS r,
        |    count(*) OVER () AS np
        |  FROM pd)
        |SELECT g.n AS n_points, CAST(max(rk.np) AS BIGINT) AS n_pairs,
        |  CAST(((g.n // 2 + 1) * (g.n // 2)) // 2 AS BIGINT) AS k,
        |  CAST(max(CASE WHEN rk.r = ((g.n // 2 + 1) * (g.n // 2)) // 2
        |    THEN rk.d END) AS BIGINT) AS qn_raw
        |FROM rk CROSS JOIN g GROUP BY g.n""".stripMargin,
    "q627_seasonal_mann_kendall" ->
      """WITH m AS MATERIALIZED (
        |  SELECT CAST(month(o_orderdate) AS BIGINT) AS mo,
        |    CAST(year(o_orderdate) AS BIGINT) AS yr,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM orders WHERE year(o_orderdate) BETWEEN 1995 AND 2000
        |  GROUP BY 1, 2),
        |s AS (
        |  SELECT CAST(sum(CASE WHEN b.y > a.y THEN 1
        |    WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s_stat,
        |    CAST(count(*) AS BIGINT) AS n_pairs
        |  FROM m a JOIN m b ON b.mo = a.mo AND b.yr > a.yr),
        |v AS (
        |  SELECT CAST(sum(cnt*(cnt-1)*(2*cnt+5)) AS BIGINT) AS var_x18
        |  FROM (SELECT mo, count(*) AS cnt FROM m GROUP BY 1))
        |SELECT s.s_stat, s.n_pairs, v.var_x18
        |FROM s CROSS JOIN v""".stripMargin,
    "q628_simpson_diversity" ->
      """WITH toks AS MATERIALIZED (
        |  SELECT source, string_split(text, ' ') AS w FROM documents),
        |g AS MATERIALIZED (
        |  SELECT source, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS t
        |  FROM toks CROSS JOIN (SELECT unnest(generate_series(1,
        |    (SELECT CAST(max(len(w)) AS BIGINT) FROM toks))) AS i) s
        |  WHERE i + 2 <= len(w)),
        |vc AS MATERIALIZED (
        |  SELECT source, t, CAST(count(*) AS BIGINT) AS c
        |  FROM g GROUP BY 1, 2)
        |SELECT source, CAST(count(*) AS BIGINT) AS vocab,
        |  CAST(sum(c) AS BIGINT) AS n,
        |  CAST((1000000 * sum(c*(c-1))) // (sum(c) * (sum(c)-1))
        |    AS BIGINT) AS simpson_conc_ppm,
        |  CAST(1000000 - (1000000 * sum(c*(c-1)))
        |    // (sum(c) * (sum(c)-1)) AS BIGINT) AS gini_simpson_ppm
        |FROM vc GROUP BY 1""".stripMargin,
    "q619_two_way_anova" ->
      s"""WITH $OrdersRegionCte,
        |cell AS MATERIALIZED (
        |  SELECT reg AS a, o_orderpriority AS b,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(floor(o_totalprice*100) AS BIGINT)) AS BIGINT)
        |      AS s,
        |    CAST(sum(CAST(floor(o_totalprice*100) AS BIGINT)
        |      * CAST(floor(o_totalprice*100) AS BIGINT)) AS HUGEINT)
        |      AS s2
        |  FROM oreg GROUP BY 1, 2),
        |g AS (SELECT CAST(sum(n) AS BIGINT) AS gn,
        |  CAST(sum(s) AS BIGINT) AS gs,
        |  CAST(sum(s) // sum(n) AS BIGINT) AS gm FROM cell),
        |am AS MATERIALIZED (SELECT a,
        |  CAST(sum(s) // sum(n) AS BIGINT) AS am,
        |  CAST(sum(n) AS BIGINT) AS an FROM cell GROUP BY 1),
        |bm AS MATERIALIZED (SELECT b,
        |  CAST(sum(s) // sum(n) AS BIGINT) AS bm,
        |  CAST(sum(n) AS BIGINT) AS bn FROM cell GROUP BY 1),
        |ss AS (SELECT
        |  (SELECT CAST(sum(an * (am.am - g.gm) * (am.am - g.gm))
        |     AS HUGEINT) FROM am CROSS JOIN g) AS ssa,
        |  (SELECT CAST(sum(bn * (bm.bm - g.gm) * (bm.bm - g.gm))
        |     AS HUGEINT) FROM bm CROSS JOIN g) AS ssb,
        |  (SELECT CAST(sum(cell.n
        |      * (cell.s // cell.n - am.am - bm.bm + g.gm)
        |      * (cell.s // cell.n - am.am - bm.bm + g.gm)) AS HUGEINT)
        |   FROM cell JOIN am ON am.a = cell.a
        |   JOIN bm ON bm.b = cell.b CROSS JOIN g) AS ssab,
        |  (SELECT CAST(sum(cell.s2
        |      - 2*CAST(cell.s // cell.n AS HUGEINT)*cell.s
        |      + CAST(cell.n AS HUGEINT)*(cell.s // cell.n)
        |        *(cell.s // cell.n)) AS HUGEINT) FROM cell) AS ssw)
        |SELECT
        |  CAST((1000000 * ssa) // (ssa+ssb+ssab+ssw) AS BIGINT)
        |    AS region_share_ppm,
        |  CAST((1000000 * ssb) // (ssa+ssb+ssab+ssw) AS BIGINT)
        |    AS priority_share_ppm,
        |  CAST((1000000 * ssab) // (ssa+ssb+ssab+ssw) AS BIGINT)
        |    AS interaction_share_ppm,
        |  CAST((1000000 * ssw) // (ssa+ssb+ssab+ssw) AS BIGINT)
        |    AS within_share_ppm
        |FROM ss""".stripMargin,
    "q620_rbo" ->
      """WITH br AS MATERIALIZED (
        |  SELECT p.p_brand AS brand,
        |    CAST(sum(CAST(floor(l.l_extendedprice*100) AS BIGINT))
        |      AS BIGINT) AS rev,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1),
        |ra AS MATERIALIZED (SELECT brand,
        |  row_number() OVER (ORDER BY rev DESC, brand) AS r FROM br),
        |rb AS MATERIALIZED (SELECT brand,
        |  row_number() OVER (ORDER BY cnt DESC, brand) AS r FROM br),
        |depths AS (SELECT unnest(range(1, 11)) AS d),
        |ov AS MATERIALIZED (
        |  SELECT d.d, CAST(count(*) AS BIGINT) AS inter
        |  FROM depths d JOIN ra ON ra.r <= d.d
        |  JOIN rb ON rb.brand = ra.brand AND rb.r <= d.d
        |  GROUP BY 1),
        |t AS (
        |  SELECT d, inter,
        |    CAST((1000000000 * CAST(POW(9, d-1) AS BIGINT) * inter)
        |      // (CAST(POW(10, d) AS BIGINT) * d) AS BIGINT) AS term_ppb
        |  FROM ov)
        |SELECT CAST(sum(term_ppb) AS BIGINT) AS rbo10_ppb,
        |  CAST(max(CASE WHEN d = 10 THEN inter END) AS BIGINT)
        |    AS inter_at_10
        |FROM t""".stripMargin,
    "q621_state_store_reader" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n
        |FROM events WHERE user_id % 5 = 4
        |GROUP BY 1""".stripMargin,
    "q622_median_polish" ->
      s"""WITH m AS MATERIALIZED (
        |  SELECT CAST(month(o_orderdate) AS BIGINT) AS mo,
        |    CAST(year(o_orderdate) AS BIGINT) AS yr,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM orders WHERE year(o_orderdate) BETWEEN 1995 AND 2000
        |  GROUP BY 1, 2),
        |${polishSweep("mo", "m", "d1")},
        |${polishSweep("yr", "d1", "d2")},
        |${polishSweep("mo", "d2", "d3")},
        |${polishSweep("yr", "d3", "d4")}
        |SELECT mo, yr, CAST(y AS BIGINT) AS residual_x16
        |FROM d4""".stripMargin,
    "q623_capture_recapture" ->
      """WITH a AS (SELECT DISTINCT o_custkey AS ck FROM orders
        |  WHERE year(o_orderdate) = 1996),
        |b AS (SELECT DISTINCT o_custkey AS ck FROM orders
        |  WHERE year(o_orderdate) = 1997),
        |s AS (SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM a) AS n1,
        |  (SELECT CAST(count(*) AS BIGINT) FROM b) AS n2,
        |  (SELECT CAST(count(*) AS BIGINT) FROM a JOIN b USING (ck))
        |    AS m)
        |SELECT n1, n2, m,
        |  CAST((n1 * n2) // m AS BIGINT) AS lincoln_petersen,
        |  CAST(((n1+1) * (n2+1)) // (m+1) - 1 AS BIGINT) AS chapman
        |FROM s""".stripMargin,
    "q624_chao1_richness" ->
      """WITH toks AS MATERIALIZED (
        |  SELECT string_split(text, ' ') AS w FROM documents),
        |g AS MATERIALIZED (
        |  SELECT w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS t
        |  FROM toks CROSS JOIN (SELECT unnest(generate_series(1,
        |    (SELECT CAST(max(len(w)) AS BIGINT) FROM toks))) AS i) s
        |  WHERE i + 2 <= len(w)),
        |vc AS MATERIALIZED (
        |  SELECT t, CAST(count(*) AS BIGINT) AS c FROM g GROUP BY 1),
        |ff AS (
        |  SELECT CAST(count(*) AS BIGINT) AS vocab,
        |    CAST(sum(c) AS BIGINT) AS tokens,
        |    CAST(count(*) FILTER (WHERE c = 1) AS BIGINT) AS f1,
        |    CAST(count(*) FILTER (WHERE c = 2) AS BIGINT) AS f2
        |  FROM vc)
        |SELECT vocab, tokens, f1, f2,
        |  CAST(vocab + (f1*f1) // (2*f2) AS BIGINT) AS chao1_richness,
        |  CAST(1000000 - (1000000 * f1) // tokens AS BIGINT)
        |    AS good_turing_coverage_ppm
        |FROM ff""".stripMargin,
    "q615_graph_evolution" ->
      s"""WITH $YearEdgeCte,
        |a AS (SELECT x, y FROM e WHERE yr = 1996),
        |b AS (SELECT x, y FROM e WHERE yr = 1997),
        |j AS (SELECT
        |  CAST((SELECT count(*) FROM a JOIN b USING (x, y)) AS BIGINT)
        |    AS stable,
        |  CAST((SELECT count(*) FROM a ANTI JOIN b USING (x, y))
        |    AS BIGINT) AS removed,
        |  CAST((SELECT count(*) FROM b ANTI JOIN a USING (x, y))
        |    AS BIGINT) AS added)
        |SELECT stable, removed, added,
        |  CAST((1000000 * stable) // (stable + removed + added)
        |    AS BIGINT) AS edge_jaccard_ppm
        |FROM j""".stripMargin,
    "q616_preferential_attachment" ->
      s"""WITH $YearEdgeCte,
        |deg AS MATERIALIZED (
        |  SELECT v,
        |    CAST(coalesce(sum(w) FILTER (WHERE yr = 1996), 0)
        |      AS BIGINT) AS d96,
        |    CAST(coalesce(sum(w) FILTER (WHERE yr = 1997), 0)
        |      AS BIGINT) AS d97
        |  FROM (SELECT yr, x AS v, w FROM e
        |        UNION ALL SELECT yr, y, w FROM e) s
        |  GROUP BY 1),
        |rk AS (
        |  SELECT
        |    2*rank() OVER (ORDER BY d96)
        |      + count(*) OVER (PARTITION BY d96) - 1 AS r1,
        |    2*rank() OVER (ORDER BY d97 - d96)
        |      + count(*) OVER (PARTITION BY d97 - d96) - 1 AS r2
        |  FROM deg),
        |st AS (
        |  SELECT CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(r1) AS HUGEINT) AS s1,
        |    CAST(sum(r2) AS HUGEINT) AS s2,
        |    CAST(sum(r1*r1) AS HUGEINT) AS s11,
        |    CAST(sum(r2*r2) AS HUGEINT) AS s22,
        |    CAST(sum(r1*r2) AS HUGEINT) AS s12
        |  FROM rk)
        |SELECT CAST(n AS BIGINT) AS n_nodes,
        |  CAST(CASE
        |    WHEN n*s11 - s1*s1 = 0 OR n*s22 - s2*s2 = 0 THEN 0
        |    WHEN n*s12 - s1*s2 >= 0
        |    THEN (((1000000 * (n*s12 - s1*s2)) // (n*s11 - s1*s1))
        |      * ((1000000 * (n*s12 - s1*s2)) // (n*s22 - s2*s2)))
        |      // 1000000
        |    ELSE -((((1000000 * (s1*s2 - n*s12)) // (n*s11 - s1*s1))
        |      * ((1000000 * (s1*s2 - n*s12)) // (n*s22 - s2*s2)))
        |      // 1000000) END AS BIGINT) AS spearman_r2_signed_ppm
        |FROM st""".stripMargin,
    "q617_triplet_mining" ->
      s"""WITH anchors AS MATERIALIZED (
        |  SELECT vec_id AS aid, label AS alab, embedding AS av
        |  FROM embeddings WHERE vec_id < 24),
        |scored AS MATERIALIZED (
        |  SELECT a.aid, a.alab, c.vec_id AS cid, c.label AS clab,
        |    ${cosSql("a.av", "c.embedding")} AS c
        |  FROM embeddings c JOIN anchors a ON c.vec_id <> a.aid),
        |pos AS (
        |  SELECT aid, cid AS pos_id, c AS pc FROM scored
        |  WHERE clab = alab
        |  QUALIFY row_number() OVER (PARTITION BY aid
        |    ORDER BY c ASC, cid) = 1),
        |neg AS (
        |  SELECT aid, cid AS neg_id, c AS nc FROM scored
        |  WHERE clab <> alab
        |  QUALIFY row_number() OVER (PARTITION BY aid
        |    ORDER BY c DESC, cid) = 1)
        |SELECT CAST(p.aid AS BIGINT) AS anchor_id,
        |  CAST(p.pos_id AS BIGINT) AS hardest_positive_id,
        |  round(p.pc, 4) AS pos_cosine,
        |  CAST(n.neg_id AS BIGINT) AS hardest_negative_id,
        |  round(n.nc, 4) AS neg_cosine,
        |  CAST(CASE WHEN n.nc + 0.05 > p.pc THEN 1 ELSE 0 END
        |    AS BIGINT) AS margin_violation
        |FROM pos p JOIN neg n ON n.aid = p.aid""".stripMargin,
    "q618_trading_day_adjust" ->
      """WITH days AS MATERIALIZED (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM orders GROUP BY 1),
        |dow AS MATERIALIZED (
        |  SELECT dayofweek(d) AS dw, CAST(sum(n) AS BIGINT) AS tot,
        |    CAST(count(*) AS BIGINT) AS ndays
        |  FROM days GROUP BY 1),
        |mo AS MATERIALIZED (
        |  SELECT CAST((year(d)-1995)*12 + month(d)-1 AS BIGINT) AS mi,
        |    dayofweek(d) AS dw,
        |    CAST(count(*) AS BIGINT) AS ndw,
        |    CAST(sum(n) AS BIGINT) AS actual_part
        |  FROM days GROUP BY 1, 2)
        |SELECT mo.mi,
        |  CAST(sum(mo.actual_part) AS BIGINT) AS actual,
        |  CAST(sum((1000 * mo.ndw * dow.tot) // dow.ndays) AS BIGINT)
        |    AS expected_milli,
        |  CAST(1000 * sum(mo.actual_part)
        |    - sum((1000 * mo.ndw * dow.tot) // dow.ndays) AS BIGINT)
        |    AS residual_milli
        |FROM mo JOIN dow ON dow.dw = mo.dw
        |GROUP BY 1""".stripMargin,
    "q610_shift_share" ->
      s"""WITH $OrdersRegionCte,
        |cell AS MATERIALIZED (
        |  SELECT reg, o_orderpriority AS pri,
        |    CAST(count(*) FILTER (WHERE year(o_orderdate) = 1996)
        |      AS BIGINT) AS n96,
        |    CAST(count(*) FILTER (WHERE year(o_orderdate) = 1997)
        |      AS BIGINT) AS n97
        |  FROM oreg WHERE year(o_orderdate) IN (1996, 1997)
        |  GROUP BY 1, 2),
        |nat AS (SELECT CAST(sum(n96) AS BIGINT) AS t96,
        |  CAST(sum(n97) AS BIGINT) AS t97 FROM cell),
        |ind AS MATERIALIZED (
        |  SELECT pri, CAST(sum(n96) AS BIGINT) AS i96,
        |    CAST(sum(n97) AS BIGINT) AS i97 FROM cell GROUP BY 1)
        |SELECT cell.reg, cell.pri, cell.n96, cell.n97,
        |  CAST(cell.n97 - cell.n96 AS BIGINT) AS actual_change_x1,
        |  CAST(CASE WHEN nat.t97 >= nat.t96
        |    THEN (1000 * cell.n96 * (nat.t97 - nat.t96)) // nat.t96
        |    ELSE -((1000 * cell.n96 * (nat.t96 - nat.t97)) // nat.t96)
        |    END AS BIGINT) AS national_milli,
        |  CAST(CASE WHEN ind.i97*nat.t96 >= ind.i96*nat.t97
        |    THEN (1000 * cell.n96 * (ind.i97*nat.t96 - ind.i96*nat.t97))
        |      // (ind.i96*nat.t96)
        |    ELSE -((1000 * cell.n96
        |        * (ind.i96*nat.t97 - ind.i97*nat.t96))
        |      // (ind.i96*nat.t96)) END AS BIGINT) AS mix_milli,
        |  CAST(CASE WHEN cell.n97*ind.i96 >= cell.n96*ind.i97
        |    THEN (1000 * (cell.n97*ind.i96 - cell.n96*ind.i97))
        |      // ind.i96
        |    ELSE -((1000 * (cell.n96*ind.i97 - cell.n97*ind.i96))
        |      // ind.i96) END AS BIGINT) AS local_milli
        |FROM cell CROSS JOIN nat JOIN ind ON ind.pri = cell.pri"""
        .stripMargin,
    "q611_concentration_index" ->
      """WITH cust AS MATERIALIZED (
        |  SELECT o_custkey AS ck, CAST(count(*) AS BIGINT) AS freq,
        |    CAST(sum(CAST(floor(o_totalprice*100) AS BIGINT)) AS BIGINT)
        |      AS rev
        |  FROM orders GROUP BY 1),
        |rk AS (
        |  SELECT rev, CAST(row_number() OVER (ORDER BY freq, ck)
        |    AS HUGEINT) AS r
        |  FROM cust),
        |agg AS (SELECT CAST(count(*) AS HUGEINT) AS n,
        |  CAST(sum(r*rev) AS HUGEINT) AS srr,
        |  CAST(sum(rev) AS HUGEINT) AS tot FROM rk)
        |SELECT CAST(n AS BIGINT) AS n_customers,
        |  CAST(CASE WHEN 2*srr - (n+1)*tot >= 0
        |    THEN (1000000 * (2*srr - (n+1)*tot)) // (n*tot)
        |    ELSE -((1000000 * ((n+1)*tot - 2*srr)) // (n*tot)) END
        |    AS BIGINT) AS concentration_ppm
        |FROM agg""".stripMargin,
    "q612_design_effect" ->
      """WITH g AS MATERIALIZED (
        |  SELECT o_custkey AS ck, CAST(count(*) AS BIGINT) AS m,
        |    CAST(sum(CAST(floor(o_totalprice*100) AS BIGINT)) AS BIGINT)
        |      AS s1,
        |    CAST(sum(CAST(floor(o_totalprice*100) AS BIGINT)
        |      * CAST(floor(o_totalprice*100) AS BIGINT)) AS HUGEINT)
        |      AS s2
        |  FROM orders GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(m) AS HUGEINT) AS n,
        |    CAST(count(*) AS HUGEINT) AS k,
        |    CAST(sum(s1) AS HUGEINT) AS st,
        |    CAST(sum(s2) AS HUGEINT) AS s2t,
        |    CAST(sum((s1*s1) // m) AS HUGEINT) AS ssb_q
        |  FROM g),
        |ms AS (
        |  SELECT n, k, ssb_q - (st*st) // n AS ssb, s2t - ssb_q AS ssw
        |  FROM tot)
        |SELECT CAST(n AS BIGINT) AS n_orders,
        |  CAST(k AS BIGINT) AS n_clusters,
        |  CAST((1000000 * ssb) // (ssb + ssw) AS BIGINT)
        |    AS icc_proxy_ppm,
        |  CAST((1000 * n) // k AS BIGINT) AS mbar_milli,
        |  CAST(1000000 + (((1000 * n) // k - 1000)
        |    * ((1000000 * ssb) // (ssb + ssw))) // 1000 AS BIGINT)
        |    AS deff_ppm
        |FROM ms""".stripMargin,
    "q613_xmr_chart" ->
      s"""WITH $MonthlyCte,
        |mr AS MATERIALIZED (
        |  SELECT abs(a.y - b.y) AS mr
        |  FROM m a JOIN m b ON b.mi = a.mi - 1),
        |g AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(y) AS BIGINT) AS sy FROM m),
        |gm AS (SELECT CAST(count(*) AS BIGINT) AS nm,
        |  CAST(sum(mr) AS BIGINT) AS smr FROM mr)
        |SELECT m.mi, m.y,
        |  CAST(CASE WHEN abs(1000 * g.n * gm.nm * m.y
        |      - 1000 * g.sy * gm.nm) > 2660 * gm.smr * g.n
        |    THEN 1 ELSE 0 END AS BIGINT) AS out_of_control,
        |  CAST((1000 * g.sy) // g.n AS BIGINT) AS center_milli,
        |  CAST((2660 * gm.smr) // gm.nm AS BIGINT)
        |    AS limit_halfwidth_milli
        |FROM m CROSS JOIN g CROSS JOIN gm""".stripMargin,
    "q614_data_vault_load" ->
      """WITH hub AS MATERIALIZED (
        |  SELECT md5(CAST(c_custkey AS VARCHAR)) AS hk FROM customer),
        |link AS MATERIALIZED (
        |  SELECT md5(CAST(o_orderkey AS VARCHAR) || '|'
        |    || CAST(o_custkey AS VARCHAR)) AS lk FROM orders),
        |sat1 AS MATERIALIZED (
        |  SELECT c.c_custkey,
        |    md5(CAST(count(o.o_orderkey) AS VARCHAR) || '|'
        |      || coalesce(max(o.o_orderpriority), '')) AS hashdiff
        |  FROM customer c LEFT JOIN orders o
        |    ON o.o_custkey = c.c_custkey
        |    AND o.o_orderdate < '1997-01-01'
        |  GROUP BY 1),
        |sat2 AS MATERIALIZED (
        |  SELECT c.c_custkey,
        |    md5(CAST(count(o.o_orderkey) AS VARCHAR) || '|'
        |      || coalesce(max(o.o_orderpriority), '')) AS hashdiff
        |  FROM customer c LEFT JOIN orders o
        |    ON o.o_custkey = c.c_custkey
        |  GROUP BY 1)
        |SELECT
        |  (SELECT CAST(count(DISTINCT hk) AS BIGINT) FROM hub)
        |    AS hub_rows,
        |  (SELECT CAST(count(DISTINCT lk) AS BIGINT) FROM link)
        |    AS link_rows,
        |  (SELECT CAST(count(*) AS BIGINT) FROM sat1 s1
        |   JOIN sat2 s2 ON s2.c_custkey = s1.c_custkey
        |   WHERE s2.hashdiff <> s1.hashdiff) AS sat_changed,
        |  (SELECT CAST(count(*) AS BIGINT) FROM sat1 s1
        |   JOIN sat2 s2 ON s2.c_custkey = s1.c_custkey
        |   WHERE s2.hashdiff = s1.hashdiff) AS sat_unchanged"""
        .stripMargin,
    "q607_semantic_chunking" ->
      """WITH toks AS MATERIALIZED (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE doc_id < 60),
        |blk AS MATERIALIZED (
        |  SELECT doc_id, (i-1) // 20 AS b, w[i] AS tok
        |  FROM toks CROSS JOIN (SELECT unnest(generate_series(1,
        |    (SELECT CAST(max(len(w)) AS BIGINT) FROM toks))) AS i) s
        |  WHERE i <= len(w)),
        |bt AS MATERIALIZED (SELECT DISTINCT doc_id, b, tok FROM blk),
        |sizes AS MATERIALIZED (
        |  SELECT doc_id, b, CAST(count(*) AS BIGINT) AS n
        |  FROM bt GROUP BY 1, 2),
        |inter AS MATERIALIZED (
        |  SELECT a.doc_id, a.b AS b, CAST(count(*) AS BIGINT) AS i
        |  FROM bt a JOIN bt b2 ON b2.doc_id = a.doc_id
        |    AND b2.b = a.b + 1 AND b2.tok = a.tok
        |  GROUP BY 1, 2),
        |adj AS (
        |  SELECT sa.doc_id, sa.b, coalesce(i.i, 0) AS i,
        |    sa.n + sb.n - coalesce(i.i, 0) AS u
        |  FROM sizes sa JOIN sizes sb ON sb.doc_id = sa.doc_id
        |    AND sb.b = sa.b + 1
        |  LEFT JOIN inter i ON i.doc_id = sa.doc_id AND i.b = sa.b)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(b + 1 AS BIGINT) AS boundary_block,
        |  CAST((1000000 * i) // u AS BIGINT) AS jaccard_ppm
        |FROM adj WHERE (1000000 * i) // u < 150000""".stripMargin,
    "q608_count_distinct_expand" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs,
        |  CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_prios,
        |  CAST(count(DISTINCT CAST(floor(o_totalprice) AS BIGINT))
        |    AS BIGINT) AS n_prices
        |FROM orders GROUP BY 1""".stripMargin,
    "q609_knn_label_propagation" ->
      s"""WITH scored AS MATERIALIZED (
        |  SELECT a.vec_id AS i, b.vec_id AS j,
        |    row_number() OVER (PARTITION BY a.vec_id
        |      ORDER BY ${cosSql("a.embedding", "b.embedding")} DESC,
        |        b.vec_id) AS rn
        |  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id),
        |knn AS MATERIALIZED (SELECT i, j FROM scored WHERE rn <= 3),
        |l0 AS MATERIALIZED (
        |  SELECT vec_id AS v, CASE WHEN vec_id < 100
        |    THEN CAST(label AS BIGINT) END AS lab
        |  FROM embeddings),
        |${(1 to 2).map(propRound).mkString(",\n")}
        |SELECT
        |  CAST(count(*) FILTER (WHERE l2.lab IS NOT NULL) AS BIGINT)
        |    AS n_labeled,
        |  CAST(count(*) FILTER (WHERE l2.lab IS NULL) AS BIGINT)
        |    AS n_unlabeled,
        |  CAST(count(*) FILTER (WHERE l2.v >= 100 AND l2.lab = e.label)
        |    AS BIGINT) AS n_correct,
        |  CAST(count(*) FILTER (WHERE l2.v >= 100
        |    AND l2.lab IS NOT NULL) AS BIGINT) AS n_predicted
        |FROM l2 JOIN embeddings e ON e.vec_id = l2.v""".stripMargin,
    "q601_transitive_reduction" ->
      s"""WITH arcs AS MATERIALIZED (
        |  SELECT CAST(c.c_nationkey AS BIGINT) AS src,
        |    CAST(s.s_nationkey AS BIGINT) AS dst
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE c.c_nationkey < s.s_nationkey
        |  GROUP BY 1, 2 HAVING count(*) >= 150),
        |r0 AS MATERIALIZED (SELECT src, dst FROM arcs),
        |${(1 to 5).map(r =>
           s"""r$r AS MATERIALIZED (
              |  SELECT DISTINCT a.src, b.dst FROM r${r - 1} a
              |  JOIN r${r - 1} b ON b.src = a.dst
              |  UNION SELECT src, dst FROM r${r - 1})""".stripMargin)
          .mkString(",\n")},
        |ge2 AS (SELECT DISTINCT a.src, b.dst FROM arcs a
        |  JOIN r5 b ON b.src = a.dst)
        |SELECT a.src, a.dst,
        |  CAST(CASE WHEN g.src IS NULL THEN 1 ELSE 0 END AS BIGINT)
        |    AS in_reduction
        |FROM arcs a LEFT JOIN ge2 g
        |  ON g.src = a.src AND g.dst = a.dst""".stripMargin,
    "q602_girth" ->
      s"""WITH $Trade300Cte,
        |eid AS MATERIALIZED (SELECT x, y, x*100 + y AS e FROM e0),
        |adj AS MATERIALIZED (
        |  SELECT r.e, s.src, s.dst FROM eid r
        |  CROSS JOIN (SELECT x AS src, y AS dst FROM e0
        |              UNION ALL SELECT y, x FROM e0) s
        |  WHERE NOT ((s.src = r.x AND s.dst = r.y)
        |          OR (s.src = r.y AND s.dst = r.x))),
        |d0 AS MATERIALIZED (
        |  SELECT e, src AS a, dst AS b, CAST(1 AS BIGINT) AS d FROM adj),
        |${(1 to 5).map(minPlusRound).mkString(",\n")}
        |SELECT CAST(t.x AS BIGINT) AS src, CAST(t.y AS BIGINT) AS dst,
        |  CAST(coalesce(d.d, 0) AS BIGINT) AS alt_dist,
        |  CAST(CASE WHEN d.d IS NULL THEN 0 ELSE d.d + 1 END AS BIGINT)
        |    AS cycle_len
        |FROM eid t LEFT JOIN d5 d
        |  ON d.e = t.e AND d.a = t.x AND d.b = t.y""".stripMargin,
    "q603_percolation_sweep" ->
      s"""WITH base AS MATERIALIZED (
        |  SELECT least(c.c_nationkey, s.s_nationkey) AS x,
        |    greatest(c.c_nationkey, s.s_nationkey) AS y,
        |    CAST(count(*) AS BIGINT) AS w
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE c.c_nationkey <> s.s_nationkey
        |  GROUP BY 1, 2 HAVING count(*) >= 110),
        |ths AS (SELECT unnest([110, 150, 200, 250, 300, 350]) AS th),
        |e AS MATERIALIZED (
        |  SELECT t.th, b.x, b.y FROM ths t JOIN base b ON b.w >= t.th),
        |t0 AS MATERIALIZED (
        |  SELECT th, src AS a, dst AS b FROM (
        |    SELECT th, x AS src, y AS dst FROM e
        |    UNION ALL SELECT th, y, x FROM e) s
        |  UNION SELECT th, src, src FROM (
        |    SELECT th, x AS src FROM e UNION ALL SELECT th, y FROM e) n),
        |${(1 to 5).map(thDoubleRound).mkString(",\n")},
        |comp AS MATERIALIZED (
        |  SELECT th, a AS v, min(b) AS cid FROM t5 GROUP BY 1, 2),
        |sizes AS MATERIALIZED (
        |  SELECT th, cid, CAST(count(*) AS BIGINT) AS sz
        |  FROM comp GROUP BY 1, 2),
        |stats AS (
        |  SELECT th, CAST(count(*) AS BIGINT) AS n_components,
        |    CAST(max(sz) AS BIGINT) AS giant_size,
        |    CAST(sum(sz) AS BIGINT) AS n_nodes
        |  FROM sizes GROUP BY 1),
        |ecnt AS (SELECT th, CAST(count(*) AS BIGINT) AS n_edges
        |  FROM e GROUP BY 1)
        |SELECT CAST(s.th AS BIGINT) AS threshold, s.n_nodes, ec.n_edges,
        |  s.n_components, s.giant_size
        |FROM stats s JOIN ecnt ec ON ec.th = s.th""".stripMargin,
    "q604_decorrelation_parity" ->
      """SELECT CAST(c.c_nationkey AS BIGINT) AS nationkey,
        |  CAST(count(*) AS BIGINT) AS n_customers
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey)
        |  AND (SELECT max(CAST(floor(o_totalprice * 100) AS BIGINT))
        |       FROM orders o WHERE o.o_custkey = c.c_custkey)
        |    > 3 * (SELECT min(CAST(floor(o_totalprice * 100) AS BIGINT))
        |           FROM orders o WHERE o.o_custkey = c.c_custkey)
        |GROUP BY 1""".stripMargin,
    "q605_self_similarity" ->
      """WITH toks AS MATERIALIZED (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE doc_id < 40),
        |grams AS MATERIALIZED (
        |  SELECT DISTINCT doc_id,
        |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
        |  FROM toks CROSS JOIN (SELECT unnest(generate_series(1,
        |    (SELECT CAST(max(len(w)) AS BIGINT) FROM toks))) AS i) s
        |  WHERE i + 2 <= len(w)),
        |sizes AS MATERIALIZED (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n
        |  FROM grams GROUP BY 1),
        |inter AS MATERIALIZED (
        |  SELECT a.doc_id AS da, b.doc_id AS db,
        |    CAST(count(*) AS BIGINT) AS i
        |  FROM grams a JOIN grams b ON b.g = a.g
        |    AND b.doc_id > a.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT coalesce(i.i, 0) AS i,
        |    sa.n + sb.n - coalesce(i.i, 0) AS u
        |  FROM sizes sa JOIN sizes sb ON sb.doc_id > sa.doc_id
        |  LEFT JOIN inter i ON i.da = sa.doc_id AND i.db = sb.doc_id)
        |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum((1000000 * i) // u) AS BIGINT) AS jaccard_ppm_sum,
        |  CAST(sum((1000000 * i) // u) // count(*) AS BIGINT)
        |    AS mean_jaccard_ppm
        |FROM pairs""".stripMargin,
    "q606_mmd_linear" ->
      """WITH e AS MATERIALIZED (
        |  SELECT label, list_transform(embedding,
        |    x -> CAST(floor(x*1000) AS BIGINT)) AS q
        |  FROM embeddings WHERE label IN (0, 1)),
        |dims AS MATERIALIZED (
        |  SELECT label, i.i AS dim, CAST(sum(q[i.i]) AS BIGINT) AS sv
        |  FROM e CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i)
        |    i
        |  GROUP BY 1, 2),
        |cnt AS (SELECT
        |  CAST(count(*) FILTER (WHERE label = 0) AS BIGINT) AS na,
        |  CAST(count(*) FILTER (WHERE label = 1) AS BIGINT) AS nb
        |  FROM e),
        |dd AS (
        |  SELECT a.sv AS sa, b.sv AS sb
        |  FROM dims a JOIN dims b ON b.dim = a.dim
        |    AND a.label = 0 AND b.label = 1)
        |SELECT c.na, c.nb,
        |  CAST(sum((CAST(c.nb AS HUGEINT)*d.sa
        |      - CAST(c.na AS HUGEINT)*d.sb)
        |    * (CAST(c.nb AS HUGEINT)*d.sa - CAST(c.na AS HUGEINT)*d.sb))
        |    AS VARCHAR) AS mmd2_num_str,
        |  CAST(sum((CAST(c.nb AS HUGEINT)*d.sa
        |      - CAST(c.na AS HUGEINT)*d.sb)
        |    * (CAST(c.nb AS HUGEINT)*d.sa - CAST(c.na AS HUGEINT)*d.sb))
        |    // (CAST(c.na AS HUGEINT)*c.na*c.nb*c.nb) AS BIGINT)
        |    AS mmd2_milli2
        |FROM dd d CROSS JOIN cnt c GROUP BY c.na, c.nb""".stripMargin,
    "q598_qte_deciles" ->
      """WITH x AS MATERIALIZED (
        |  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'a'
        |    ELSE 'b' END AS g,
        |    CAST(floor(o_totalprice*100) AS BIGINT) AS v
        |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
        |h AS MATERIALIZED (
        |  SELECT g, v, CAST(count(*) AS BIGINT) AS n FROM x
        |  GROUP BY 1, 2),
        |c AS MATERIALIZED (
        |  SELECT g, v, n,
        |    CAST(sum(n) OVER (PARTITION BY g ORDER BY v ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |    CAST(sum(n) OVER (PARTITION BY g) AS BIGINT) AS cnt
        |  FROM h),
        |dec AS (SELECT unnest(range(1, 10)) AS d),
        |qv AS MATERIALIZED (
        |  SELECT c.g, dec.d, min(c.v) AS qv
        |  FROM c JOIN dec ON c.cum >= (dec.d * c.cnt + 9) // 10
        |  GROUP BY 1, 2)
        |SELECT CAST(a.d AS BIGINT) AS decile, a.qv AS urgent_cents,
        |  b.qv AS low_cents, CAST(a.qv - b.qv AS BIGINT) AS qte_cents
        |FROM qv a JOIN qv b ON b.d = a.d AND a.g = 'a' AND b.g = 'b'"""
        .stripMargin,
    "q599_page_hinkley" ->
      """WITH m AS MATERIALIZED (
        |  SELECT CAST((year(o_orderdate)-1995)*12 + month(o_orderdate)-1
        |    AS BIGINT) AS mi, CAST(count(*) AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |c AS MATERIALIZED (
        |  SELECT mi, y,
        |    CAST(sum(y) OVER (ORDER BY mi ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS sy,
        |    CAST(row_number() OVER (ORDER BY mi) AS BIGINT) AS t
        |  FROM m),
        |d AS MATERIALIZED (
        |  SELECT mi, CAST(CASE WHEN t*y - sy >= 0 THEN (t*y - sy) // t
        |    ELSE -((sy - t*y) // t) END AS BIGINT) AS dev
        |  FROM c),
        |ph AS (
        |  SELECT mi, dev,
        |    CAST(sum(dev) OVER (ORDER BY mi ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cumdev
        |  FROM d)
        |SELECT mi, dev, cumdev,
        |  CAST(cumdev - min(cumdev) OVER (ORDER BY mi ROWS BETWEEN
        |    UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ph_stat
        |FROM ph""".stripMargin,
    "q600_v_pattern" ->
      """WITH m AS MATERIALIZED (
        |  SELECT CAST((year(o_orderdate)-1995)*12 + month(o_orderdate)-1
        |    AS BIGINT) AS mi, CAST(count(*) AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |diff AS MATERIALIZED (
        |  SELECT mi, d, CAST(CASE WHEN d > 0 THEN 1 ELSE -1 END
        |    AS BIGINT) AS dir
        |  FROM (SELECT mi, y - lag(y) OVER (ORDER BY mi) AS d FROM m)
        |  WHERE d IS NOT NULL AND d <> 0),
        |runs AS MATERIALIZED (
        |  SELECT run_id, dir, CAST(max(mi) AS BIGINT) AS end_mi,
        |    CAST(sum(d) AS BIGINT) AS move
        |  FROM (
        |    SELECT mi, d, dir,
        |      CAST(sum(CASE WHEN pd IS NULL OR pd <> dir THEN 1 ELSE 0
        |        END) OVER (ORDER BY mi ROWS BETWEEN UNBOUNDED PRECEDING
        |        AND CURRENT ROW) AS BIGINT) AS run_id
        |    FROM (SELECT mi, d, dir, lag(dir) OVER (ORDER BY mi) AS pd
        |          FROM diff))
        |  GROUP BY 1, 2)
        |SELECT a.end_mi AS trough_mi, -a.move AS depth,
        |  b.move AS recovery, least(-a.move, b.move) AS v_score
        |FROM runs a JOIN runs b ON b.run_id = a.run_id + 1
        |  AND a.dir = -1 AND b.dir = 1""".stripMargin,
    "q594_recursive_cte_native" ->
      """WITH RECURSIVE arcs AS (
        |  SELECT CAST(c.c_nationkey AS BIGINT) AS src,
        |    CAST(su.s_nationkey AS BIGINT) AS dst
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier su ON l.l_suppkey = su.s_suppkey
        |  WHERE c.c_nationkey <> su.s_nationkey
        |  GROUP BY 1, 2 HAVING count(*) >= 110),
        |reach(dst, hop) AS (
        |  SELECT dst, CAST(1 AS BIGINT) AS hop FROM arcs WHERE src = 0
        |  UNION ALL
        |  SELECT a.dst, r.hop + 1 FROM reach r
        |  JOIN arcs a ON a.src = r.dst
        |  WHERE r.hop < 4)
        |SELECT dst AS nationkey, CAST(min(hop) AS BIGINT) AS min_hops
        |FROM reach GROUP BY 1""".stripMargin,
    "q595_hard_negatives" ->
      s"""WITH q AS MATERIALIZED (
        |  SELECT vec_id AS qid, label AS qlab, embedding AS qv
        |  FROM embeddings WHERE vec_id < 16),
        |scored AS (
        |  SELECT q.qid, q.qlab, c.vec_id AS nid, c.label AS nlab,
        |    ${cosSql("q.qv", "c.embedding")} AS cosine
        |  FROM embeddings c JOIN q ON c.label <> q.qlab)
        |SELECT CAST(qid AS BIGINT) AS query_id,
        |  CAST(qlab AS BIGINT) AS query_label,
        |  CAST(nid AS BIGINT) AS hard_negative_id,
        |  CAST(nlab AS BIGINT) AS negative_label,
        |  round(cosine, 4) AS cosine
        |FROM scored
        |QUALIFY row_number() OVER (PARTITION BY qid
        |  ORDER BY cosine DESC, nid) = 1""".stripMargin,
    "q596_length_batching" ->
      """WITH d AS MATERIALIZED (
        |  SELECT doc_id,
        |    CAST(length(text) - length(replace(text, ' ', '')) + 1
        |      AS BIGINT) AS toks
        |  FROM documents),
        |rk AS (
        |  SELECT toks,
        |    (row_number() OVER (ORDER BY toks, doc_id) - 1) // 25
        |      AS batch
        |  FROM d)
        |SELECT CAST(batch AS BIGINT) AS batch,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(max(toks) AS BIGINT) AS max_toks,
        |  CAST((1000000 * (count(*) * max(toks) - sum(toks)))
        |    // (count(*) * max(toks)) AS BIGINT) AS waste_ppm
        |FROM rk GROUP BY 1 HAVING count(*) = 25""".stripMargin,
    "q597_cascade_delete_plan" ->
      """WITH seed AS MATERIALIZED (
        |  SELECT c_custkey FROM customer
        |  WHERE c_nationkey = 3 AND c_acctbal < 0),
        |ords AS MATERIALIZED (
        |  SELECT o_orderkey FROM orders
        |  WHERE o_custkey IN (SELECT c_custkey FROM seed)),
        |lis AS (
        |  SELECT 1 FROM lineitem
        |  WHERE l_orderkey IN (SELECT o_orderkey FROM ords))
        |SELECT 'customer' AS table_name,
        |  (SELECT CAST(count(*) AS BIGINT) FROM seed)
        |    AS n_rows_to_delete
        |UNION ALL
        |SELECT 'orders', (SELECT CAST(count(*) AS BIGINT) FROM ords)
        |UNION ALL
        |SELECT 'lineitem', (SELECT CAST(count(*) AS BIGINT) FROM lis)"""
        .stripMargin,
    "q589_greedy_matching" ->
      s"""WITH $Trade300Cte,
        |m0 AS MATERIALIZED (SELECT x, y, w FROM e0 WHERE 1 = 0),
        |${(1 to 6).map(matchRound).mkString(",\n")}
        |SELECT CAST(x AS BIGINT) AS src, CAST(y AS BIGINT) AS dst,
        |  w AS weight
        |FROM m6""".stripMargin,
    "q590_articulation_points" ->
      s"""WITH $Trade300Cte,
        |sym AS MATERIALIZED (
        |  SELECT x AS src, y AS dst FROM e0
        |  UNION ALL SELECT y, x FROM e0),
        |deg AS MATERIALIZED (
        |  SELECT src AS v, CAST(count(*) AS BIGINT) AS deg
        |  FROM sym GROUP BY 1),
        |adj AS MATERIALIZED (
        |  SELECT d.v AS rm, s.src, s.dst FROM deg d CROSS JOIN sym s
        |  WHERE s.src <> d.v AND s.dst <> d.v),
        |r0 AS MATERIALIZED (
        |  SELECT DISTINCT rm, src AS a, dst AS b FROM adj
        |  UNION SELECT rm, src, src FROM adj),
        |${(1 to 5).map(rmDoubleRound).mkString(",\n")},
        |seed AS MATERIALIZED (
        |  SELECT src AS rm, min(dst) AS a0 FROM sym GROUP BY 1),
        |miss AS (
        |  SELECT n.rm, count(*) AS n_unreached
        |  FROM (SELECT src AS rm, dst AS nbv FROM sym) n
        |  JOIN seed sd ON sd.rm = n.rm
        |  LEFT JOIN r5 r ON r.rm = n.rm AND r.a = sd.a0 AND r.b = n.nbv
        |  WHERE r.b IS NULL GROUP BY 1)
        |SELECT CAST(d.v AS BIGINT) AS node,
        |  CAST(d.deg AS BIGINT) AS degree,
        |  CAST(CASE WHEN m.rm IS NULL THEN 0 ELSE 1 END AS BIGINT)
        |    AS is_articulation
        |FROM deg d LEFT JOIN miss m ON m.rm = d.v""".stripMargin,
    "q591_dyad_census" ->
      """WITH d0 AS MATERIALIZED (
        |  SELECT CAST(c.c_nationkey AS BIGINT) AS src,
        |    CAST(s.s_nationkey AS BIGINT) AS dst
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE c.c_nationkey <> s.s_nationkey
        |  GROUP BY 1, 2 HAVING count(*) >= 150),
        |nodes AS (SELECT src AS v FROM d0 UNION SELECT dst FROM d0),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
        |pairs AS (
        |  SELECT CAST(sum(CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0
        |    END) AS BIGINT) AS m2,
        |    CAST(count(*) AS BIGINT) AS arcs
        |  FROM d0 f LEFT JOIN d0 r
        |    ON r.src = f.dst AND r.dst = f.src)
        |SELECT nn.n AS n_nodes, p.arcs,
        |  CAST(p.m2 // 2 AS BIGINT) AS mutual,
        |  CAST(p.arcs - p.m2 AS BIGINT) AS asymmetric,
        |  CAST(nn.n*(nn.n-1)//2 - p.m2//2 - (p.arcs - p.m2) AS BIGINT)
        |    AS null_dyads,
        |  CAST((1000000 * p.m2) // p.arcs AS BIGINT) AS reciprocity_ppm
        |FROM pairs p CROSS JOIN nn""".stripMargin,
    "q592_kcenter_greedy" ->
      s"""WITH e AS MATERIALIZED (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(floor(x*1000) AS BIGINT)) AS q
        |  FROM embeddings),
        |c1 AS MATERIALIZED (SELECT vec_id, q FROM e ORDER BY vec_id
        |  LIMIT 1),
        |d1 AS MATERIALIZED (
        |  SELECT a.vec_id, a.q, ${sqDistSql("a.q", "b.q")} AS dmin
        |  FROM e a CROSS JOIN c1 b),
        |${(2 to 4).map(kcenterRound).mkString(",\n")}
        |SELECT CAST(c.k AS BIGINT) AS pick_order,
        |  CAST(c.vec_id AS BIGINT) AS center_id,
        |  (SELECT CAST(max(dmin) AS BIGINT) FROM d4)
        |    AS covering_radius_sq
        |FROM (SELECT 1 AS k, vec_id FROM c1
        |      UNION ALL SELECT 2, vec_id FROM c2
        |      UNION ALL SELECT 3, vec_id FROM c3
        |      UNION ALL SELECT 4, vec_id FROM c4) c""".stripMargin,
    "q593_silhouette" ->
      s"""WITH e AS MATERIALIZED (
        |  SELECT vec_id, label, list_transform(embedding,
        |    x -> CAST(floor(x*1000) AS BIGINT)) AS q
        |  FROM embeddings WHERE vec_id % 2 = 0),
        |pd AS MATERIALIZED (
        |  SELECT a.vec_id AS i, a.label AS li, b.label AS lj,
        |    CAST(sum(${sqDistSql("a.q", "b.q")}) AS BIGINT) AS sd,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM e a JOIN e b ON b.vec_id <> a.vec_id
        |  GROUP BY 1, 2, 3),
        |ab AS MATERIALIZED (
        |  SELECT i, li,
        |    CAST(max(CASE WHEN lj = li THEN sd // cnt END) AS BIGINT)
        |      AS a,
        |    CAST(min(CASE WHEN lj <> li THEN sd // cnt END) AS BIGINT)
        |      AS b
        |  FROM pd GROUP BY 1, 2),
        |s AS (
        |  SELECT li,
        |    CAST(CASE WHEN b >= a
        |      THEN (1000000 * (b - a)) // greatest(a, b)
        |      ELSE -((1000000 * (a - b)) // greatest(a, b)) END
        |      AS BIGINT) AS s_ppm
        |  FROM ab WHERE a IS NOT NULL AND b IS NOT NULL)
        |SELECT CAST(li AS BIGINT) AS label,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(CASE WHEN sum(s_ppm) >= 0 THEN sum(s_ppm) // count(*)
        |    ELSE -((-sum(s_ppm)) // count(*)) END AS BIGINT)
        |    AS mean_silhouette_ppm
        |FROM s GROUP BY 1""".stripMargin,
    "q585_luby_mis" ->
      s"""WITH $CopurchaseCte,
        |nodes AS MATERIALIZED (
        |  SELECT src AS v, ${mdHashSql("CAST(src AS VARCHAR)")} AS pr
        |  FROM (SELECT DISTINCT src FROM sym)),
        |u0 AS MATERIALIZED (SELECT v, pr FROM nodes),
        |s0 AS MATERIALIZED (SELECT v FROM nodes WHERE 1 = 0),
        |${(1 to 4).map(lubyRound).mkString(",\n")}
        |SELECT CAST(v AS BIGINT) AS node, CAST(1 AS BIGINT) AS in_mis
        |FROM s4
        |UNION ALL
        |SELECT CAST(v AS BIGINT), 0 FROM u4""".stripMargin,
    "q586_sorted_neighborhood" ->
      """WITH e AS MATERIALIZED (
        |  SELECT p_partkey AS id, p_name AS nm,
        |    row_number() OVER (ORDER BY p_name, p_partkey) AS rk
        |  FROM part),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e),
        |cand AS (
        |  SELECT a.nm AS nm_a, b.nm AS nm_b
        |  FROM e a JOIN e b ON b.rk > a.rk AND b.rk <= a.rk + 3)
        |SELECT CAST(count(*) AS BIGINT) AS n_candidates,
        |  CAST(sum(CASE WHEN jaro_winkler_similarity(nm_a, nm_b) >= 0.94
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_matches,
        |  CAST(1000000 - (1000000 * count(*) * 2)
        |    // (t.n * (t.n - 1)) AS BIGINT) AS reduction_ratio_ppm
        |FROM cand CROSS JOIN tot t GROUP BY t.n""".stripMargin,
    "q587_consistent_hash" ->
      s"""WITH servers AS (SELECT 's' || CAST(si AS VARCHAR) AS server
        |  FROM (SELECT unnest(range(0, 8)) AS si)),
        |vn AS MATERIALIZED (
        |  SELECT server,
        |    ${mdHashSql("server || '-' || CAST(vi AS VARCHAR)")} AS vh
        |  FROM servers CROSS JOIN (SELECT unnest(range(0, 32)) AS vi) v),
        |mn AS (SELECT min(vh) AS wrap FROM vn),
        |keys AS MATERIALIZED (
        |  SELECT c_custkey AS k,
        |    ${mdHashSql("CAST(c_custkey AS VARCHAR)")} AS kh
        |  FROM customer),
        |asg AS MATERIALIZED (
        |  SELECT k.k, coalesce(min(vn.vh) FILTER (WHERE vn.vh >= k.kh),
        |    (SELECT wrap FROM mn)) AS tvh
        |  FROM keys k CROSS JOIN vn GROUP BY k.k),
        |byserver AS (
        |  SELECT v.server, CAST(count(*) AS BIGINT) AS n_keys
        |  FROM asg a JOIN vn v ON v.vh = a.tvh GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_keys) AS BIGINT) AS n FROM byserver)
        |SELECT b.server, b.n_keys,
        |  CAST((1000000 * b.n_keys) // t.n AS BIGINT) AS share_ppm
        |FROM byserver b CROSS JOIN tot t""".stripMargin,
    "q588_bradley_terry" ->
      s"""WITH $OrdersRegionCte,
        |rev AS MATERIALIZED (
        |  SELECT o.reg AS item,
        |    year(o.o_orderdate)*12 + month(o.o_orderdate) AS mi,
        |    CAST(sum(CAST(floor(l.l_extendedprice*100) AS BIGINT)
        |      * (100 - CAST(floor(l.l_discount*100) AS BIGINT)))
        |      AS BIGINT) AS v
        |  FROM lineitem l JOIN oreg o ON l.l_orderkey = o.o_orderkey
        |  GROUP BY 1, 2),
        |comp AS MATERIALIZED (
        |  SELECT a.item AS i, b.item AS j,
        |    CAST(count(*) AS BIGINT) AS n_ij,
        |    CAST(sum(CASE WHEN a.v > b.v
        |      OR (a.v = b.v AND a.item < b.item) THEN 1 ELSE 0 END)
        |      AS BIGINT) AS w_ij
        |  FROM rev a JOIN rev b ON b.mi = a.mi AND b.item <> a.item
        |  GROUP BY 1, 2),
        |wins AS MATERIALIZED (
        |  SELECT i AS item, CAST(sum(w_ij) AS BIGINT) AS w
        |  FROM comp GROUP BY 1),
        |p0 AS MATERIALIZED (
        |  SELECT item, CAST(1000000 AS BIGINT) AS p FROM wins),
        |${(1 to 3).map(btRound).mkString(",\n")}
        |SELECT p3.item, w.w AS wins, p3.p AS bt_strength_ppm
        |FROM p3 JOIN wins w ON w.item = p3.item""".stripMargin,
    "q579_dhondt" ->
      s"""WITH $OrdersRegionCte,
        |votes AS MATERIALIZED (
        |  SELECT reg AS party, CAST(count(*) AS BIGINT) AS v
        |  FROM oreg GROUP BY 1),
        |quo AS (
        |  SELECT party, v, d.d,
        |    CAST((v * 1000000000000) // d.d AS BIGINT) AS q
        |  FROM votes CROSS JOIN (SELECT unnest(range(1, 21)) AS d) d),
        |top AS (SELECT *, row_number() OVER (ORDER BY q DESC, party, d)
        |  AS rn FROM quo)
        |SELECT party, CAST(max(v) AS BIGINT) AS votes,
        |  CAST(count(*) AS BIGINT) AS seats
        |FROM top WHERE rn <= 20 GROUP BY 1""".stripMargin,
    "q580_ipf_raking" ->
      s"""WITH $OrdersRegionCte,
        |cell AS MATERIALIZED (
        |  SELECT reg, o_orderpriority AS pri,
        |    CAST(count(*) FILTER (WHERE year(o_orderdate) = 1996)
        |      AS BIGINT) AS n96,
        |    CAST(count(*) FILTER (WHERE year(o_orderdate) = 1997)
        |      AS BIGINT) AS n97
        |  FROM oreg WHERE year(o_orderdate) IN (1996, 1997)
        |  GROUP BY 1, 2),
        |rt AS MATERIALIZED (SELECT reg, CAST(sum(n97) AS BIGINT) AS t
        |  FROM cell GROUP BY 1),
        |ct AS MATERIALIZED (SELECT pri, CAST(sum(n97) AS BIGINT) AS t
        |  FROM cell GROUP BY 1),
        |w0 AS MATERIALIZED (SELECT reg, pri,
        |  CAST(n96 * 1000000 AS BIGINT) AS w FROM cell),
        |w1 AS MATERIALIZED (
        |  SELECT w0.reg, w0.pri,
        |    CAST((CAST(w0.w AS HUGEINT) * rt.t * 1000000) // rs.s
        |      AS BIGINT) AS w
        |  FROM w0 JOIN rt ON rt.reg = w0.reg
        |  JOIN (SELECT reg, CAST(sum(w) AS BIGINT) AS s FROM w0
        |        GROUP BY 1) rs ON rs.reg = w0.reg),
        |w2 AS MATERIALIZED (
        |  SELECT w1.reg, w1.pri,
        |    CAST((CAST(w1.w AS HUGEINT) * ct.t * 1000000) // cs.s
        |      AS BIGINT) AS w
        |  FROM w1 JOIN ct ON ct.pri = w1.pri
        |  JOIN (SELECT pri, CAST(sum(w) AS BIGINT) AS s FROM w1
        |        GROUP BY 1) cs ON cs.pri = w1.pri),
        |w3 AS MATERIALIZED (
        |  SELECT w2.reg, w2.pri,
        |    CAST((CAST(w2.w AS HUGEINT) * rt.t * 1000000) // rs.s
        |      AS BIGINT) AS w
        |  FROM w2 JOIN rt ON rt.reg = w2.reg
        |  JOIN (SELECT reg, CAST(sum(w) AS BIGINT) AS s FROM w2
        |        GROUP BY 1) rs ON rs.reg = w2.reg),
        |w4 AS MATERIALIZED (
        |  SELECT w3.reg, w3.pri,
        |    CAST((CAST(w3.w AS HUGEINT) * ct.t * 1000000) // cs.s
        |      AS BIGINT) AS w
        |  FROM w3 JOIN ct ON ct.pri = w3.pri
        |  JOIN (SELECT pri, CAST(sum(w) AS BIGINT) AS s FROM w3
        |        GROUP BY 1) cs ON cs.pri = w3.pri)
        |SELECT w4.reg, w4.pri, w4.w AS weight_micro,
        |  CAST(rt.t AS BIGINT) AS row_target
        |FROM w4 JOIN rt ON rt.reg = w4.reg""".stripMargin,
    "q581_delong_auc" ->
      """WITH fit AS MATERIALIZED (
        |  SELECT p.p_brand AS brand,
        |    CAST((1000 * sum(CASE WHEN l.l_returnflag = 'R' THEN 1
        |      ELSE 0 END)) // count(*) AS BIGINT) AS v
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE year(o.o_orderdate) IN (1995, 1996) GROUP BY 1),
        |h AS MATERIALIZED (
        |  SELECT fit.v,
        |    CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS hp,
        |    CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 0 ELSE 1 END)
        |      AS BIGINT) AS hn
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  JOIN fit ON fit.brand = p.p_brand
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE year(o.o_orderdate) = 1997 GROUP BY 1),
        |c AS MATERIALIZED (
        |  SELECT v, hp, hn,
        |    CAST(coalesce(sum(hn) OVER (ORDER BY v ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS cn_lt,
        |    CAST(coalesce(sum(hp) OVER (ORDER BY v ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS cp_lt
        |  FROM h),
        |tot AS (SELECT CAST(sum(hp) AS BIGINT) AS np,
        |  CAST(sum(hn) AS BIGINT) AS nn FROM h),
        |pl AS (
        |  SELECT c.hp, c.hn,
        |    2*c.cn_lt + c.hn AS plp_x2,
        |    2*(t.np - c.cp_lt - c.hp) + c.hp AS pln_x2
        |  FROM c CROSS JOIN tot t),
        |agg AS (
        |  SELECT
        |    CAST(sum(hp * plp_x2) AS HUGEINT) AS sp1,
        |    CAST(sum(hp * CAST(plp_x2 AS HUGEINT) * plp_x2) AS HUGEINT)
        |      AS sp2,
        |    CAST(sum(hn * pln_x2) AS HUGEINT) AS sn1,
        |    CAST(sum(hn * CAST(pln_x2 AS HUGEINT) * pln_x2) AS HUGEINT)
        |      AS sn2
        |  FROM pl)
        |SELECT t.np, t.nn,
        |  CAST((1000000 * a.sp1) // (2 * t.np * t.nn) AS BIGINT)
        |    AS auc_ppm,
        |  CAST((1000000000 * (t.np * a.sp2 - a.sp1*a.sp1))
        |    // (CAST(t.np AS HUGEINT)*t.np*(t.np-1)*4*t.nn*t.nn)
        |    AS BIGINT) AS s10_ppb,
        |  CAST((1000000000 * (t.nn * a.sn2 - a.sn1*a.sn1))
        |    // (CAST(t.nn AS HUGEINT)*t.nn*(t.nn-1)*4*t.np*t.np)
        |    AS BIGINT) AS s01_ppb
        |FROM agg a CROSS JOIN tot t""".stripMargin,
    "q582_mantel_haenszel" ->
      s"""WITH $OrdersRegionCte,
        |st AS MATERIALIZED (
        |  SELECT o.reg AS stratum,
        |    CAST(sum(CASE WHEN o.o_orderpriority = '1-URGENT'
        |      AND l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS a,
        |    CAST(sum(CASE WHEN o.o_orderpriority = '1-URGENT'
        |      AND l.l_returnflag <> 'R' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS b,
        |    CAST(sum(CASE WHEN o.o_orderpriority <> '1-URGENT'
        |      AND l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c,
        |    CAST(sum(CASE WHEN o.o_orderpriority <> '1-URGENT'
        |      AND l.l_returnflag <> 'R' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS d
        |  FROM lineitem l JOIN oreg o ON l.l_orderkey = o.o_orderkey
        |  GROUP BY 1),
        |t AS MATERIALIZED (
        |  SELECT stratum, a, b, c, d,
        |    CAST((1000000 * a * d) // (a+b+c+d) AS BIGINT) AS num_ppm,
        |    CAST((1000000 * b * c) // (a+b+c+d) AS BIGINT) AS den_ppm
        |  FROM st),
        |pooled AS (SELECT CAST((1000000 * sum(num_ppm)) // sum(den_ppm)
        |  AS BIGINT) AS mh_or_ppm FROM t)
        |SELECT t.stratum, t.a, t.b, t.c, t.d, t.num_ppm, t.den_ppm,
        |  p.mh_or_ppm
        |FROM t CROSS JOIN pooled p""".stripMargin,
    "q583_cochran_q" ->
      """WITH votes AS MATERIALIZED (
        |  SELECT
        |    CASE WHEN n_chars >= 250 THEN 1 ELSE 0 END AS r1,
        |    CASE WHEN length(text) - length(replace(text, ' ', '')) + 1
        |      >= 40 THEN 1 ELSE 0 END AS r2,
        |    CASE WHEN length(text) - length(replace(text, 'e', ''))
        |      >= 20 THEN 1 ELSE 0 END AS r3
        |  FROM documents),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(r1) AS BIGINT) AS c1, CAST(sum(r2) AS BIGINT) AS c2,
        |    CAST(sum(r3) AS BIGINT) AS c3,
        |    CAST(sum(r1+r2+r3) AS BIGINT) AS sr,
        |    CAST(sum((r1+r2+r3)*(r1+r2+r3)) AS BIGINT) AS sr2
        |  FROM votes)
        |SELECT n, c1, c2, c3,
        |  CAST((1000000 * 2 * ((3*c1-sr)*(3*c1-sr)
        |    + (3*c2-sr)*(3*c2-sr) + (3*c3-sr)*(3*c3-sr)))
        |    // (3 * (3*sr - sr2)) AS BIGINT) AS q_ppm
        |FROM agg""".stripMargin,
    "q584_wasserstein" ->
      """WITH x AS MATERIALIZED (
        |  SELECT CAST(floor(o_totalprice) AS BIGINT) AS v,
        |    CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT')
        |      AS BIGINT) AS na,
        |    CAST(count(*) FILTER (WHERE o_orderpriority = '5-LOW')
        |      AS BIGINT) AS nb
        |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
        |  GROUP BY 1),
        |c AS MATERIALIZED (
        |  SELECT v, row_number() OVER (ORDER BY v) AS rk,
        |    CAST(sum(na) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS ca,
        |    CAST(sum(nb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cb
        |  FROM x),
        |tot AS (SELECT CAST(sum(na) AS BIGINT) AS n1,
        |  CAST(sum(nb) AS BIGINT) AS n2 FROM x),
        |seg AS (
        |  SELECT b.v - a.v AS dv, a.ca, a.cb
        |  FROM c a JOIN c b ON b.rk = a.rk + 1)
        |SELECT t.n1, t.n2,
        |  CAST(sum(abs(t.n2 * s.ca - t.n1 * s.cb) * s.dv) AS BIGINT)
        |    AS w1_scaled,
        |  CAST((1000 * sum(abs(t.n2 * s.ca - t.n1 * s.cb) * s.dv))
        |    // (t.n1 * t.n2) AS BIGINT) AS w1_milli_dollars
        |FROM seg s CROSS JOIN tot t GROUP BY t.n1, t.n2""".stripMargin,
    "q575_anderson_darling" ->
      """WITH x AS MATERIALIZED (
        |  SELECT CAST(floor(o_totalprice) AS BIGINT) AS v,
        |    CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT')
        |      AS BIGINT) AS na,
        |    CAST(count(*) FILTER (WHERE o_orderpriority = '5-LOW')
        |      AS BIGINT) AS nb
        |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
        |  GROUP BY 1),
        |c AS MATERIALIZED (
        |  SELECT v, na, nb, na + nb AS h,
        |    CAST(sum(na) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS ha,
        |    CAST(sum(nb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS hb
        |  FROM x),
        |tot AS (SELECT CAST(sum(na) AS BIGINT) AS n1,
        |  CAST(sum(nb) AS BIGINT) AS n2,
        |  CAST(sum(na + nb) AS BIGINT) AS nn,
        |  CAST(count(*) AS BIGINT) AS n_distinct FROM x)
        |SELECT t.n1, t.n2, t.n_distinct,
        |  CAST((SELECT
        |    sum((1000000 * CAST(t.nn - 1 AS HUGEINT) * c.h
        |      * (CAST(t.nn AS HUGEINT)*(2*c.ha - c.na)
        |         - CAST(t.n1 AS HUGEINT)*(2*(c.ha+c.hb) - c.h))
        |      * (CAST(t.nn AS HUGEINT)*(2*c.ha - c.na)
        |         - CAST(t.n1 AS HUGEINT)*(2*(c.ha+c.hb) - c.h)))
        |     // (CAST(t.nn AS HUGEINT) * t.nn * t.n1
        |      * (CAST(2*(c.ha+c.hb) - c.h AS HUGEINT)
        |          * (2*t.nn - 2*(c.ha+c.hb) + c.h)
        |         - CAST(t.nn AS HUGEINT) * c.h)))
        |    + sum((1000000 * CAST(t.nn - 1 AS HUGEINT) * c.h
        |      * (CAST(t.nn AS HUGEINT)*(2*c.hb - c.nb)
        |         - CAST(t.n2 AS HUGEINT)*(2*(c.ha+c.hb) - c.h))
        |      * (CAST(t.nn AS HUGEINT)*(2*c.hb - c.nb)
        |         - CAST(t.n2 AS HUGEINT)*(2*(c.ha+c.hb) - c.h)))
        |     // (CAST(t.nn AS HUGEINT) * t.nn * t.n2
        |      * (CAST(2*(c.ha+c.hb) - c.h AS HUGEINT)
        |          * (2*t.nn - 2*(c.ha+c.hb) + c.h)
        |         - CAST(t.nn AS HUGEINT) * c.h)))
        |    FROM c) AS BIGINT) AS ad_a2akn_ppm
        |FROM tot t""".stripMargin,
    "q576_mmr_retrieval" ->
      s"""WITH q AS MATERIALIZED (
        |  SELECT vec_id AS qid, embedding AS qv FROM embeddings
        |  WHERE vec_id < 16),
        |scored AS MATERIALIZED (
        |  SELECT q.qid, c.vec_id AS nid, c.embedding AS cv,
        |    ${cosSql("q.qv", "c.embedding")} AS rel
        |  FROM embeddings c CROSS JOIN q WHERE c.vec_id <> q.qid),
        |pre AS MATERIALIZED (
        |  SELECT qid, nid, cv, rel FROM (
        |    SELECT *, row_number() OVER (PARTITION BY qid
        |      ORDER BY rel DESC, nid) AS rn FROM scored)
        |  WHERE rn <= 12),
        |pairs AS MATERIALIZED (
        |  SELECT a.qid, a.nid AS a, b.nid AS b,
        |    ${cosSql("a.cv", "b.cv")} AS sim
        |  FROM pre a JOIN pre b ON b.qid = a.qid AND b.nid <> a.nid),
        |s1 AS MATERIALIZED (
        |  SELECT qid, nid, 1 AS pick_rank, rel AS mmr FROM (
        |    SELECT qid, nid, rel, row_number() OVER (PARTITION BY qid
        |      ORDER BY rel DESC, nid) AS rn FROM pre)
        |  WHERE rn = 1),
        |${(2 to 4).map(mmrRound).mkString(",\n")}
        |SELECT CAST(qid AS BIGINT) AS query_id,
        |  CAST(pick_rank AS BIGINT) AS pick_rank,
        |  CAST(nid AS BIGINT) AS neighbor_id,
        |  round(mmr, 4) AS mmr_score
        |FROM s4""".stripMargin,
    "q577_stream_chained_stateful" ->
      """WITH src AS (
        |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
        |  FROM events WHERE user_id % 5 = 2),
        |d AS (SELECT DISTINCT event_id, ts, event_type FROM src)
        |SELECT date_trunc('day', ts) AS day, event_type,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM d GROUP BY 1, 2""".stripMargin,
    "q578_partition_evolution" ->
      """WITH mr AS (
        |  SELECT strftime(o_orderdate, '%Y-%m') AS m,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM orders
        |  WHERE o_orderdate >= '1996-07-01' AND o_orderdate < '1997-07-01'
        |  GROUP BY 1),
        |v2f AS (
        |  SELECT CAST(count(DISTINCT strftime(o_orderdate, '%Y-%m'))
        |    AS BIGINT) AS v2_files_read
        |  FROM orders
        |  WHERE o_orderdate >= '1997-01-01' AND o_orderdate < '1997-07-01')
        |SELECT mr.m, mr.n, CAST(4 AS BIGINT) AS v1_files_read,
        |  v2f.v2_files_read
        |FROM mr CROSS JOIN v2f""".stripMargin,
    "q570_bridges" ->
      """WITH e0 AS MATERIALIZED (
        |  SELECT least(c.c_nationkey, s.s_nationkey) AS x,
        |    greatest(c.c_nationkey, s.s_nationkey) AS y,
        |    CAST(count(*) AS BIGINT) AS w
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE c.c_nationkey <> s.s_nationkey
        |  GROUP BY 1, 2 HAVING count(*) >= 300),
        |eid AS MATERIALIZED (SELECT x, y, w, x*100 + y AS e FROM e0),
        |adj AS MATERIALIZED (
        |  SELECT r.e, s.src, s.dst FROM eid r
        |  CROSS JOIN (SELECT x AS src, y AS dst FROM e0
        |              UNION ALL SELECT y, x FROM e0) s
        |  WHERE NOT ((s.src = r.x AND s.dst = r.y)
        |          OR (s.src = r.y AND s.dst = r.x))),
        |r0 AS MATERIALIZED (
        |  SELECT e, src AS a, dst AS b FROM adj
        |  UNION SELECT e, src, src FROM adj),
        |r1 AS MATERIALIZED (
        |  SELECT DISTINCT e, a, b FROM (
        |    SELECT e, a, b FROM r0 UNION ALL
        |    SELECT p.e, p.a, q.b FROM r0 p
        |    JOIN r0 q ON q.e = p.e AND q.a = p.b)),
        |r2 AS MATERIALIZED (
        |  SELECT DISTINCT e, a, b FROM (
        |    SELECT e, a, b FROM r1 UNION ALL
        |    SELECT p.e, p.a, q.b FROM r1 p
        |    JOIN r1 q ON q.e = p.e AND q.a = p.b)),
        |r3 AS MATERIALIZED (
        |  SELECT DISTINCT e, a, b FROM (
        |    SELECT e, a, b FROM r2 UNION ALL
        |    SELECT p.e, p.a, q.b FROM r2 p
        |    JOIN r2 q ON q.e = p.e AND q.a = p.b)),
        |r4 AS MATERIALIZED (
        |  SELECT DISTINCT e, a, b FROM (
        |    SELECT e, a, b FROM r3 UNION ALL
        |    SELECT p.e, p.a, q.b FROM r3 p
        |    JOIN r3 q ON q.e = p.e AND q.a = p.b)),
        |r5 AS MATERIALIZED (
        |  SELECT DISTINCT e, a, b FROM (
        |    SELECT e, a, b FROM r4 UNION ALL
        |    SELECT p.e, p.a, q.b FROM r4 p
        |    JOIN r4 q ON q.e = p.e AND q.a = p.b))
        |SELECT CAST(d.x AS BIGINT) AS src, CAST(d.y AS BIGINT) AS dst,
        |  d.w AS weight,
        |  CAST(CASE WHEN r.a IS NULL THEN 1 ELSE 0 END AS BIGINT)
        |    AS is_bridge
        |FROM eid d LEFT JOIN r5 r
        |  ON r.e = d.e AND r.a = d.x AND r.b = d.y""".stripMargin,
    "q571_shapley_attribution" ->
      """WITH fp AS MATERIALIZED (
        |  SELECT user_id, min(ts) AS first_purchase FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1),
        |u AS MATERIALIZED (
        |  SELECT e.user_id,
        |    CAST(max(CASE WHEN event_type = 'view'
        |      AND (f.first_purchase IS NULL OR e.ts < f.first_purchase)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS cv,
        |    CAST(max(CASE WHEN event_type = 'click'
        |      AND (f.first_purchase IS NULL OR e.ts < f.first_purchase)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS cc,
        |    CAST(max(CASE WHEN event_type = 'signup'
        |      AND (f.first_purchase IS NULL OR e.ts < f.first_purchase)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS cs,
        |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
        |      END) AS BIGINT) AS conv
        |  FROM events e LEFT JOIN fp f ON f.user_id = e.user_id
        |  GROUP BY 1),
        |sub AS MATERIALIZED (
        |  SELECT cv, cc, cs, CAST(sum(conv) AS BIGINT) AS conv
        |  FROM u WHERE cv + cc + cs > 0 GROUP BY 1, 2, 3),
        |masks AS (SELECT unnest(range(0, 8)) AS m),
        |vs AS MATERIALIZED (
        |  SELECT g.m,
        |    CAST(coalesce(sum(s.conv) FILTER (WHERE
        |      (s.cv = 0 OR g.m % 2 = 1)
        |      AND (s.cc = 0 OR (g.m // 2) % 2 = 1)
        |      AND (s.cs = 0 OR (g.m // 4) % 2 = 1)), 0) AS BIGINT) AS v
        |  FROM masks g LEFT JOIN sub s ON TRUE
        |  GROUP BY 1),
        |bits AS (SELECT * FROM (VALUES ('view', 1), ('click', 2),
        |  ('signup', 4)) AS t(channel, bit)),
        |phi AS MATERIALIZED (
        |  SELECT b.channel,
        |    CAST(sum((CASE (s.m % 2) + ((s.m // 2) % 2)
        |        + ((s.m // 4) % 2)
        |      WHEN 0 THEN 2 WHEN 1 THEN 1 ELSE 2 END)
        |      * (t.v - s.v)) AS BIGINT) AS phi_x6
        |  FROM bits b
        |  JOIN vs s ON (s.m // b.bit) % 2 = 0
        |  JOIN vs t ON t.m = s.m + b.bit
        |  GROUP BY 1),
        |tot AS (SELECT CAST(sum(phi_x6) AS BIGINT) AS total_x6 FROM phi)
        |SELECT p.channel, p.phi_x6,
        |  CAST((1000000 * p.phi_x6) // t.total_x6 AS BIGINT)
        |    AS share_ppm
        |FROM phi p CROSS JOIN tot t""".stripMargin,
    "q572_youden_threshold" ->
      """WITH fit AS MATERIALIZED (
        |  SELECT p.p_brand AS brand,
        |    CAST((1000 * sum(CASE WHEN l.l_returnflag = 'R' THEN 1
        |      ELSE 0 END)) // count(*) AS BIGINT) AS p
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE year(o.o_orderdate) IN (1995, 1996) GROUP BY 1),
        |bins AS MATERIALIZED (
        |  SELECT fit.p, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS pos
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  JOIN fit ON fit.brand = p.p_brand
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE year(o.o_orderdate) = 1997
        |  GROUP BY 1),
        |tot AS (SELECT CAST(sum(pos) AS BIGINT) AS pos,
        |  CAST(sum(n) - sum(pos) AS BIGINT) AS neg FROM bins),
        |th AS (SELECT DISTINCT p AS t FROM bins),
        |conf AS MATERIALIZED (
        |  SELECT th.t,
        |    CAST(sum(CASE WHEN b.p >= th.t THEN b.pos ELSE 0 END)
        |      AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN b.p >= th.t THEN b.n - b.pos ELSE 0 END)
        |      AS BIGINT) AS fp
        |  FROM th CROSS JOIN bins b GROUP BY 1),
        |j AS (
        |  SELECT c.t, (1000000*c.tp) // o.pos AS tpr_ppm,
        |    (1000000*c.fp) // o.neg AS fpr_ppm,
        |    (1000000*c.tp) // o.pos - (1000000*c.fp) // o.neg AS j_ppm
        |  FROM conf c CROSS JOIN tot o)
        |SELECT CAST(t AS BIGINT) AS threshold_pm,
        |  CAST(tpr_ppm AS BIGINT) AS tpr_ppm,
        |  CAST(fpr_ppm AS BIGINT) AS fpr_ppm,
        |  CAST(j_ppm AS BIGINT) AS j_ppm
        |FROM j QUALIFY row_number() OVER (ORDER BY j_ppm DESC, t) = 1"""
        .stripMargin,
    "q573_page_trend" ->
      """WITH v AS MATERIALIZED (
        |  SELECT CAST(month(o_orderdate) AS BIGINT) AS blk,
        |    o_orderpriority AS trt, CAST(count(*) AS BIGINT) AS y
        |  FROM orders WHERE year(o_orderdate) = 1996 GROUP BY 1, 2),
        |r AS (
        |  SELECT blk, trt, 2*rank() OVER (PARTITION BY blk ORDER BY y)
        |    + count(*) OVER (PARTITION BY blk, y) - 1 AS rank_x2
        |  FROM v),
        |rs AS MATERIALIZED (
        |  SELECT trt, CAST(substr(trt, 1, 1) AS BIGINT) AS j,
        |    CAST(sum(rank_x2) AS BIGINT) AS r_sum_x2
        |  FROM r GROUP BY 1, 2),
        |g AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |  (SELECT CAST(count(DISTINCT blk) AS BIGINT) FROM v) AS nb,
        |  CAST(sum(j * r_sum_x2) AS BIGINT) AS l_x2 FROM rs)
        |SELECT l_x2, nb AS n_blocks, k AS n_treatments,
        |  CAST(nb*k*(k+1)*(k+1) AS BIGINT) AS e_l_x2_x2
        |FROM g""".stripMargin,
    "q574_partial_correlation" ->
      """WITH d AS MATERIALIZED (
        |  SELECT CAST(l_quantity AS BIGINT) AS x,
        |    CAST(floor(l_extendedprice*100) AS BIGINT) // 1000 AS y,
        |    CAST(floor(l_discount*100) AS BIGINT) AS z
        |  FROM lineitem),
        |s AS (
        |  SELECT CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
        |    CAST(sum(z) AS HUGEINT) AS sz,
        |    CAST(sum(x*x) AS HUGEINT) AS sxx,
        |    CAST(sum(y*y) AS HUGEINT) AS syy,
        |    CAST(sum(z*z) AS HUGEINT) AS szz,
        |    CAST(sum(x*y) AS HUGEINT) AS sxy,
        |    CAST(sum(x*z) AS HUGEINT) AS sxz,
        |    CAST(sum(y*z) AS HUGEINT) AS syz
        |  FROM d),
        |c AS (
        |  SELECT n*sxy - sx*sy AS cxy, n*sxz - sx*sz AS cxz,
        |    n*syz - sy*sz AS cyz, n*sxx - sx*sx AS vx,
        |    n*syy - sy*sy AS vy, n*szz - sz*sz AS vz
        |  FROM s)
        |SELECT CAST(CASE WHEN cxy*vz - cxz*cyz >= 0
        |  THEN (((1000000 * (cxy*vz - cxz*cyz))
        |          // (vx*vz - cxz*cxz))
        |       * ((1000000 * (cxy*vz - cxz*cyz))
        |          // (vy*vz - cyz*cyz))) // 1000000
        |  ELSE -((((1000000 * (cxz*cyz - cxy*vz))
        |          // (vx*vz - cxz*cxz))
        |       * ((1000000 * (cxz*cyz - cxy*vz))
        |          // (vy*vz - cyz*cyz))) // 1000000)
        |  END AS BIGINT) AS partial_r2_signed_ppm,
        |  CAST(CASE WHEN cxy >= 0
        |    THEN (((1000000 * cxy) // vx) * ((1000000 * cxy) // vy))
        |      // 1000000
        |    ELSE -((((1000000 * (-cxy)) // vx)
        |      * ((1000000 * (-cxy)) // vy)) // 1000000)
        |    END AS BIGINT) AS marginal_r2_signed_ppm
        |FROM c""".stripMargin,
    "q564_goodman_kruskal_gamma" ->
      s"""WITH $OrdinalCellsCte
        |SELECT conc2 // 2 AS conc, disc2 // 2 AS disc,
        |  CAST(CASE WHEN conc2 >= disc2
        |    THEN (1000000*(conc2 - disc2)) // (conc2 + disc2)
        |    ELSE -((1000000*(disc2 - conc2)) // (conc2 + disc2)) END
        |    AS BIGINT) AS gamma_ppm
        |FROM cd""".stripMargin,
    "q565_somers_d" ->
      s"""WITH $OrdinalCellsCte,
        |tot AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS nn,
        |    (SELECT CAST(sum(rn*rn) AS BIGINT) FROM
        |      (SELECT sum(n) AS rn FROM cells GROUP BY xi)) AS rowsq,
        |    (SELECT CAST(sum(cn*cn) AS BIGINT) FROM
        |      (SELECT sum(n) AS cn FROM cells GROUP BY yi)) AS colsq
        |  FROM cells)
        |SELECT
        |  CAST(CASE WHEN c.conc2 >= c.disc2
        |    THEN (1000000*(c.conc2 - c.disc2)) // (t.nn*t.nn - t.rowsq)
        |    ELSE -((1000000*(c.disc2 - c.conc2))
        |      // (t.nn*t.nn - t.rowsq)) END AS BIGINT)
        |    AS somers_d_yx_ppm,
        |  CAST(CASE WHEN c.conc2 >= c.disc2
        |    THEN (1000000*(c.conc2 - c.disc2)) // (t.nn*t.nn - t.colsq)
        |    ELSE -((1000000*(c.disc2 - c.conc2))
        |      // (t.nn*t.nn - t.colsq)) END AS BIGINT)
        |    AS somers_d_xy_ppm
        |FROM cd c CROSS JOIN tot t""".stripMargin,
    "q566_cronbach_alpha" ->
      """WITH base AS MATERIALIZED (
        |  SELECT o_custkey AS ck,
        |    CAST(max(epoch_ms(o_orderdate)) AS BIGINT) AS rec,
        |    CAST(count(*) AS BIGINT) AS freq,
        |    CAST(sum(CAST(floor(o_totalprice*100) AS BIGINT)) AS BIGINT)
        |      AS mon
        |  FROM orders GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
        |sc AS MATERIALIZED (
        |  SELECT
        |    1 + (5*(row_number() OVER (ORDER BY rec, ck) - 1)) // n.n
        |      AS r,
        |    1 + (5*(row_number() OVER (ORDER BY freq, ck) - 1)) // n.n
        |      AS f,
        |    1 + (5*(row_number() OVER (ORDER BY mon, ck) - 1)) // n.n
        |      AS m
        |  FROM base CROSS JOIN n),
        |v AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(*)*sum(r*r) - sum(r)*sum(r) AS BIGINT)
        |      AS var_r_n2,
        |    CAST(count(*)*sum(f*f) - sum(f)*sum(f) AS BIGINT)
        |      AS var_f_n2,
        |    CAST(count(*)*sum(m*m) - sum(m)*sum(m) AS BIGINT)
        |      AS var_m_n2,
        |    CAST(count(*)*sum((r+f+m)*(r+f+m))
        |      - sum(r+f+m)*sum(r+f+m) AS BIGINT) AS var_tot_n2
        |  FROM sc)
        |SELECT n, var_r_n2, var_f_n2, var_m_n2, var_tot_n2,
        |  CAST(CASE WHEN var_tot_n2 - var_r_n2 - var_f_n2 - var_m_n2 >= 0
        |    THEN (1000000 * 3
        |      * (var_tot_n2 - var_r_n2 - var_f_n2 - var_m_n2))
        |      // (2 * var_tot_n2)
        |    ELSE -((1000000 * 3
        |      * (var_r_n2 + var_f_n2 + var_m_n2 - var_tot_n2))
        |      // (2 * var_tot_n2)) END AS BIGINT) AS alpha_ppm
        |FROM v""".stripMargin,
    "q567_fleiss_kappa" ->
      """WITH votes AS MATERIALIZED (
        |  SELECT CAST(CASE WHEN n_chars >= 250 THEN 1 ELSE 0 END
        |    + CASE WHEN length(text) - length(replace(text, ' ', ''))
        |        + 1 >= 40 THEN 1 ELSE 0 END
        |    + CASE WHEN length(text) - length(replace(text, 'e', ''))
        |        >= 20 THEN 1 ELSE 0 END AS BIGINT) AS ng
        |  FROM documents),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS nn,
        |    CAST(sum(ng*ng + (3-ng)*(3-ng) - 3) AS BIGINT) AS s1,
        |    CAST(sum(ng) AS BIGINT) AS g
        |  FROM votes)
        |SELECT nn AS n_docs, g AS n_good_votes,
        |  CAST(CASE WHEN 3*nn*s1 - 2*(g*g + (3*nn-g)*(3*nn-g)) >= 0
        |    THEN (1000000*(3*nn*s1 - 2*(g*g + (3*nn-g)*(3*nn-g))))
        |      // (2*(9*nn*nn - g*g - (3*nn-g)*(3*nn-g)))
        |    ELSE -((1000000*(2*(g*g + (3*nn-g)*(3*nn-g)) - 3*nn*s1))
        |      // (2*(9*nn*nn - g*g - (3*nn-g)*(3*nn-g)))) END AS BIGINT)
        |    AS kappa_ppm
        |FROM agg""".stripMargin,
    "q568_lin_ccc" ->
      """WITH rev AS MATERIALIZED (
        |  SELECT c.c_nationkey AS nk, year(o.o_orderdate) AS yr,
        |    month(o.o_orderdate) AS mo,
        |    CAST(sum(CAST(floor(l.l_extendedprice*100) AS BIGINT)
        |      * (100 - CAST(floor(l.l_discount*100) AS BIGINT)))
        |      // 1000000 AS BIGINT) AS v
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE year(o.o_orderdate) IN (1996, 1997)
        |  GROUP BY 1, 2, 3),
        |p AS MATERIALIZED (
        |  SELECT a.v AS x, b.v AS y
        |  FROM rev a JOIN rev b ON b.nk = a.nk AND b.mo = a.mo
        |    AND a.yr = 1996 AND b.yr = 1997),
        |s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x*x) AS BIGINT) AS sxx,
        |    CAST(sum(y*y) AS BIGINT) AS syy,
        |    CAST(sum(x*y) AS BIGINT) AS sxy
        |  FROM p)
        |SELECT n, sx, sy,
        |  CAST(n*sxy - sx*sy AS BIGINT) AS cov_n2,
        |  CAST(CASE WHEN n*sxy - sx*sy >= 0
        |    THEN (2000000 * (CAST(n AS HUGEINT)*sxy
        |        - CAST(sx AS HUGEINT)*sy))
        |      // ((CAST(n AS HUGEINT)*sxx - CAST(sx AS HUGEINT)*sx)
        |       + (CAST(n AS HUGEINT)*syy - CAST(sy AS HUGEINT)*sy)
        |       + CAST(sx-sy AS HUGEINT)*(sx-sy))
        |    ELSE -((2000000 * (CAST(sx AS HUGEINT)*sy
        |        - CAST(n AS HUGEINT)*sxy))
        |      // ((CAST(n AS HUGEINT)*sxx - CAST(sx AS HUGEINT)*sx)
        |       + (CAST(n AS HUGEINT)*syy - CAST(sy AS HUGEINT)*sy)
        |       + CAST(sx-sy AS HUGEINT)*(sx-sy))) END AS BIGINT)
        |    AS ccc_ppm
        |FROM s""".stripMargin,
    "q569_jonckheere_terpstra" ->
      """WITH cells AS MATERIALIZED (
        |  SELECT CAST(floor(l_discount*100) AS BIGINT) AS band,
        |    CAST(l_quantity AS BIGINT) AS q,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM lineitem GROUP BY 1, 2),
        |jt AS (
        |  SELECT
        |    CAST(sum(CASE WHEN b.q > a.q THEN 2*a.n*b.n
        |      WHEN b.q = a.q THEN a.n*b.n ELSE 0 END) AS BIGINT)
        |      AS jt_x2,
        |    CAST(sum(a.n*b.n) AS BIGINT) AS n_pairs
        |  FROM cells a JOIN cells b ON b.band > a.band)
        |SELECT jt_x2, n_pairs,
        |  CAST((1000000 * jt_x2) // (2 * n_pairs) AS BIGINT)
        |    AS jt_norm_ppm
        |FROM jt""".stripMargin,
    "q558_local_clustering" ->
      s"""WITH $CopurchaseCte,
        |deg AS (SELECT src AS v, CAST(count(*) AS BIGINT) AS deg
        |  FROM sym GROUP BY 1),
        |tri AS (
        |  SELECT a.src AS v, CAST(count(*) AS BIGINT) AS tri
        |  FROM sym a JOIN sym b ON b.src = a.src AND b.dst > a.dst
        |  JOIN e0 e ON e.x = a.dst AND e.y = b.dst
        |  GROUP BY 1)
        |SELECT CAST(d.v AS BIGINT) AS node, d.deg,
        |  coalesce(t.tri, 0) AS tri,
        |  CAST((2000000 * coalesce(t.tri, 0)) // (d.deg * (d.deg - 1))
        |    AS BIGINT) AS cc_ppm
        |FROM deg d LEFT JOIN tri t ON t.v = d.v
        |WHERE d.deg >= 2""".stripMargin,
    "q559_resource_allocation" ->
      s"""WITH $CopurchaseCte,
        |deg AS (SELECT src AS z, CAST(count(*) AS BIGINT) AS deg
        |  FROM sym GROUP BY 1),
        |cand AS (
        |  SELECT a.dst AS u, b.dst AS w, a.src AS z
        |  FROM sym a JOIN sym b ON b.src = a.src AND a.dst < b.dst),
        |ne AS (
        |  SELECT c.u, c.w, c.z FROM cand c
        |  LEFT JOIN e0 e ON e.x = c.u AND e.y = c.w
        |  WHERE e.x IS NULL)
        |SELECT CAST(ne.u AS BIGINT) AS u, CAST(ne.w AS BIGINT) AS w,
        |  CAST(count(*) AS BIGINT) AS n_common,
        |  CAST(sum(1000000 // d.deg) AS BIGINT) AS ra_ppm
        |FROM ne JOIN deg d ON d.z = ne.z
        |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin,
    "q560_square_count" ->
      s"""WITH $CopurchaseCte,
        |codeg AS (
        |  SELECT a.dst AS u, b.dst AS w, CAST(count(*) AS BIGINT) AS cd
        |  FROM sym a JOIN sym b ON b.src = a.src AND a.dst < b.dst
        |  GROUP BY 1, 2)
        |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(cd) AS BIGINT) AS n_wedges,
        |  CAST(sum(cd*(cd-1)) // 4 AS BIGINT) AS n_squares,
        |  CAST(max(cd) AS BIGINT) AS max_codeg
        |FROM codeg""".stripMargin,
    "q561_matrix_profile_sad" ->
      s"""WITH $MonthlyCte,
        |win AS MATERIALIZED (
        |  SELECT a.mi AS i, b.mi - a.mi AS t, b.y
        |  FROM m a JOIN m b ON b.mi BETWEEN a.mi AND a.mi + 5),
        |full_w AS MATERIALIZED (
        |  SELECT i FROM win GROUP BY 1 HAVING count(*) = 6),
        |sad AS MATERIALIZED (
        |  SELECT a.i AS i, b.i AS j,
        |    CAST(sum(abs(a.y - b.y)) AS BIGINT) AS sad
        |  FROM win a JOIN win b ON b.t = a.t AND abs(b.i - a.i) >= 6
        |  JOIN full_w fa ON fa.i = a.i JOIN full_w fb ON fb.i = b.i
        |  GROUP BY 1, 2),
        |best AS (
        |  SELECT i, j, sad,
        |    row_number() OVER (PARTITION BY i ORDER BY sad, j) AS rn
        |  FROM sad)
        |SELECT CAST(i AS BIGINT) AS win_start,
        |  CAST(j AS BIGINT) AS nn_start, sad AS nn_sad
        |FROM best WHERE rn = 1""".stripMargin,
    "q562_seasonal_decompose" ->
      s"""WITH $MonthlyCte,
        |tr AS MATERIALIZED (
        |  SELECT a.mi,
        |    CAST(sum(CASE WHEN abs(b.mi - a.mi) = 6 THEN b.y
        |      ELSE 2*b.y END) AS BIGINT) AS trend_x24,
        |    count(*) AS nw
        |  FROM m a JOIN m b ON b.mi BETWEEN a.mi - 6 AND a.mi + 6
        |  GROUP BY 1 HAVING count(*) = 13),
        |det AS MATERIALIZED (
        |  SELECT t.mi, t.trend_x24, 24*m.y - t.trend_x24 AS detr_x24,
        |    m.mi % 12 AS mo
        |  FROM tr t JOIN m ON m.mi = t.mi),
        |seas AS MATERIALIZED (
        |  SELECT mo, CAST(CASE WHEN sum(detr_x24) >= 0
        |    THEN sum(detr_x24) // count(*)
        |    ELSE -((-sum(detr_x24)) // count(*)) END AS BIGINT)
        |    AS seas_x24
        |  FROM det GROUP BY 1)
        |SELECT d.mi, d.trend_x24, d.detr_x24, s.seas_x24,
        |  CAST(d.detr_x24 - s.seas_x24 AS BIGINT) AS resid_x24
        |FROM det d JOIN seas s ON s.mo = d.mo""".stripMargin,
    "q563_ljung_box" ->
      s"""WITH $MonthlyCte,
        |g AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(y) AS BIGINT) AS sy FROM m),
        |e AS MATERIALIZED (
        |  SELECT mi, CAST(g.n * m.y - g.sy AS BIGINT) AS e
        |  FROM m CROSS JOIN g),
        |den AS (SELECT CAST(sum(CAST(e AS HUGEINT)*e) AS HUGEINT) AS d2
        |  FROM e),
        |lags AS (SELECT unnest(range(1, 13)) AS k),
        |num AS MATERIALIZED (
        |  SELECT l.k, CAST(coalesce(sum(a.e * b.e), 0) AS BIGINT) AS num
        |  FROM lags l LEFT JOIN e a ON TRUE
        |  LEFT JOIN e b ON b.mi = a.mi + l.k
        |  GROUP BY 1),
        |r AS (
        |  SELECT n.k AS lag, n.num AS acf_num,
        |    CAST(CASE WHEN n.num >= 0
        |      THEN (1000000 * CAST(n.num AS HUGEINT)) // d.d2
        |      ELSE -((1000000 * CAST(-n.num AS HUGEINT)) // d.d2) END
        |      AS BIGINT) AS acf_ppm,
        |    CAST((1000000 * g.n * (g.n+2) * CAST(n.num AS HUGEINT)
        |      * n.num) // (d.d2 * d.d2 * (g.n - n.k)) AS BIGINT)
        |      AS lb_term_ppm
        |  FROM num n CROSS JOIN den d CROSS JOIN g)
        |SELECT lag, acf_num, acf_ppm, lb_term_ppm,
        |  CAST(sum(lb_term_ppm) OVER (ORDER BY lag) AS BIGINT)
        |    AS lb_q_ppm
        |FROM r""".stripMargin,
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
