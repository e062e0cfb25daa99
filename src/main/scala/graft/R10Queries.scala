package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.Tables

/** Round-8 session-2 queries (q522+). Separate object: the earlier query
  * objects' map builders sit near the JVM 64 KB method-bytecode ceiling,
  * so new surface accretes here and chains into `SparkEntry.queries` /
  * `oracleSql`.
  */
object R10Queries {

  /** Phrase dictionary for q522 — chosen to exercise failure links
    * (shared prefixes/suffixes: "fast"/"fast table", "ast " inside
    * "fast table") and overlapping matches.
    */
  private val AhoPats = Seq(
    "row scan", "scan slow", "fast table", "table value", "value table",
    "a row", "fast", "ast ", "value part", "w sc", "join small", "the part")

  private def rd(s: SparkSession, dir: String, t: String): DataFrame =
    Tables.read(s, dir, t)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q522_multi_pattern" -> ((s, dir) => {
      // Aho-Corasick blocklist/phrase-dictionary scan: ONE automaton pass
      // per document, cost independent of |patterns| — at 100 TB the
      // alternative is |patterns| LIKE scans over the corpus. The BUILT
      // automaton (arrays, not the trie maps) is broadcast; overlapping
      // occurrences count (all end positions), the standard AC semantics.
      MultiPattern.matchCounts(
        s, Tables.spread(s, rd(s, dir, "documents")), "text", AhoPats)
    }),
    "q523_ewma_user" -> ((s, dir) => {
      // Per-user EWMA (α = ½) over each user's last 20 events, exact in
      // scaled integers: weight 2^(20−rn) for recency rank rn, so
      // ewma = Σ v·w / Σ w needs no float. Quantized cents keep both
      // engines on identical int64 arithmetic (bound: 49e3 cents · 2^19
      // · 20 terms ≈ 5e11 ≪ 2^63). One user-keyed window + one groupBy —
      // a single shuffle on user_id at any scale.
      val e = SparkEntry.ev(s, dir)
        .withColumn("vc", expr("CAST(floor(value * 100) AS BIGINT)"))
      val rn = row_number().over(Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc))
      e.withColumn("rn", rn).filter(col("rn") <= 20)
        .withColumn("w", expr("shiftleft(CAST(1 AS BIGINT), 20 - rn)"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_terms"),
             sum(col("w")).as("wsum"),
             sum(col("vc") * col("w")).as("ewma_num"))
        .withColumn("ewma_cents", expr("ewma_num DIV wsum"))
    }),
    "q524_isotonic_trend" -> ((s, dir) => {
      // Isotonic (monotone nondecreasing) fit of monthly order volume via
      // the exact minimax formula fit_i = max_{j≤i} min_{k≥i} avg(y[j..k])
      // — the closed form of pool-adjacent-violators, expressible as two
      // grouped reductions over (i,j,k) triples instead of a sequential
      // stack. Averages are compared in floor-micro units (all operands
      // non-negative, so DIV is engine-exact); the minimax structure
      // guarantees monotonicity regardless of quantization. Triples are
      // CALENDAR-cubed (80³/6 ≈ 90k rows) — dimension-sized forever; the
      // fact table only ever feeds the monthly rollup.
      val m = rd(s, dir, "orders")
        .groupBy(expr("CAST((year(o_orderdate) - 1992) * 12" +
                      " + month(o_orderdate) - 1 AS BIGINT)").as("mi"))
        .agg(count(lit(1)).cast("long").as("y"))
      val p = m.withColumn("pre",
        sum(col("y")).over(Window.partitionBy(graft.functions.DimKey.one)
          .orderBy(col("mi"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .localCheckpoint(false)
      val i = p.select(col("mi").as("i"))
      val j = p.select(col("mi").as("j"), col("pre").as("jpre"),
                       col("y").as("jy"))
      val k = p.select(col("mi").as("k"), col("pre").as("kpre"))
      val triple = i.join(j, col("j") <= col("i"))
        .join(k, col("k") >= col("i"))
        .withColumn("avq", expr(
          "(kpre - jpre + jy) * 1000000 DIV (k - j + 1)"))
      triple.groupBy(col("i"), col("j")).agg(min(col("avq")).as("mn"))
        .groupBy(col("i").as("month_idx"))
        .agg(max(col("mn")).as("fit_micro"))
    }),
    "q525_landmark_closeness" -> ((s, dir) => {
      // Landmark distance estimation: exact BFS hop distances from k=8
      // landmark nodes over the strong co-purchase graph, rolled up to
      // per-landmark closeness (reach count + hop sum within 4 hops).
      // The 100 TB shape: k·|V| state, never all-pairs — the published
      // landmark/sketch approach to closeness at scale. Frontier carries
      // its root so all k BFS trees advance in ONE synchronized sweep
      // (4 joins total, not 4·k).
      val edges = Graph.coOccurrenceEdgesCached(
        rd(s, dir, "lineitem"), "l_orderkey", "l_partkey", minCount = 2)
      val landmarks = edges.select(col("src").as("n"))
        .union(edges.select(col("dst").as("n")))
        .distinct().orderBy(col("n")).limit(8)
      Graph.multiSourceHops(edges, landmarks, maxHops = 4)
        .groupBy(col("root"))
        .agg(count(lit(1)).as("n_reached"), sum(col("hop")).as("sum_hops"))
    }),
    "q526_scc_trade" -> ((s, dir) => {
      // Strongly connected components of the directed nation-trade graph
      // (customer nation → supplier nation, edges with ≥100 lineitems).
      // Facts collapse to ≤ 625 edges BEFORE the graph algorithm — the
      // dimension-grain contract that makes closure-based SCC exact and
      // O(1) at any fact scale. 5 doubling rounds cover 32-edge paths ≥
      // any simple path on 25 nodes, so the closure is complete and the
      // mutual-reachability SCC ids match the unbounded oracle recursion.
      val li = rd(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
      val o = rd(s, dir, "orders").select("o_orderkey", "o_custkey")
      val c = rd(s, dir, "customer").select("c_custkey", "c_nationkey")
      val su = rd(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val edges = li
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("c_nationkey").cast("long").as("src"),
                 col("s_nationkey").cast("long").as("dst"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 100 && col("src") =!= col("dst"))
        .select("src", "dst")
      Graph.sccMutualReach(edges, doublingRounds = 5)
    }),
    "q527_linkage_patterns" -> ((s, dir) => {
      // Fellegi-Sunter-style record-linkage profiling: block candidate
      // pairs on p_brand, compare three fields (first type word, size,
      // 10-dollar price band), and count each agreement pattern — the
      // u-probability table (ppm) that calibrates match weights. Blocking
      // bounds pairs at Σ|block|² — the lever that keeps linkage off the
      // |table|² cliff at scale; the comparison itself is one blocked
      // self-join + a 8-row rollup.
      val f = rd(s, dir, "part").select(
        col("p_partkey"), col("p_brand"),
        split(col("p_type"), " ").getItem(0).as("tw"), col("p_size"),
        expr("CAST(floor(p_retailprice * 100) AS BIGINT) DIV 1000").as("pb"))
      val pairs = f.as("a").join(f.as("b"),
          col("a.p_brand") === col("b.p_brand") &&
          col("a.p_partkey") < col("b.p_partkey"))
        .select((when(col("a.tw") === col("b.tw"), 4).otherwise(0)
          + when(col("a.p_size") === col("b.p_size"), 2).otherwise(0)
          + when(col("a.pb") === col("b.pb"), 1).otherwise(0))
          .cast("long").as("pattern"))
      val g = pairs.groupBy(col("pattern"))
        .agg(count(lit(1)).as("n_pairs"))
      val tot = g.agg(sum(col("n_pairs")).as("t"))
      g.crossJoin(broadcast(tot))
        .withColumn("u_ppm", expr("n_pairs * 1000000 DIV t"))
        .select("pattern", "n_pairs", "u_ppm")
    }),
    "q528_holt_trend" -> ((s, dir) => {
      // Holt double-exponential smoothing (α = β = ½) over the last 12
      // complete months of order volume, EXACT in integers: level and
      // trend carried at scale 4^t (A_t = L_t·4^t, B_t = T_t·4^t), whose
      // recurrences A ← y·2^(2t−1) + 2A + 2B, B ← y·2^(2t−2) − A + 3B
      // stay integral — no float smoothing, so both engines agree to the
      // bit. The fold runs over a 12-element array collected from the
      // monthly rollup (calendar-sized); the 64-bit bound is y·4^12·3^12
      // ≈ 1e15 at sf0.1-scale monthly counts, documented here.
      val m = rd(s, dir, "orders")
        .groupBy(expr("CAST((year(o_orderdate) - 1992) * 12" +
                      " + month(o_orderdate) - 1 AS BIGINT)").as("mi"))
        .agg(count(lit(1)).cast("long").as("y"))
      val mx = m.agg(max(col("mi")).as("mx"))
      val last12 = m.crossJoin(broadcast(mx)).filter(col("mi") < col("mx"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(graft.functions.DimKey.one)
            .orderBy(col("mi").desc)))
        .filter(col("rn") <= 12)
      last12.agg(sort_array(collect_list(struct(col("mi"), col("y"))))
          .as("arr"))
        .select(expr(
          """aggregate(arr,
            |  named_struct('a', CAST(0 AS BIGINT), 'b', CAST(0 AS BIGINT),
            |               't', CAST(0 AS BIGINT)),
            |  (acc, x) -> CASE WHEN acc.t = 0
            |    THEN named_struct('a', x.y * 4, 'b', CAST(0 AS BIGINT),
            |                      't', CAST(1 AS BIGINT))
            |    ELSE named_struct(
            |      'a', x.y * shiftleft(CAST(2 AS BIGINT),
            |             CAST(2 * acc.t AS INT)) + 2 * acc.a + 2 * acc.b,
            |      'b', x.y * shiftleft(CAST(1 AS BIGINT),
            |             CAST(2 * acc.t AS INT)) - acc.a + 3 * acc.b,
            |      't', acc.t + 1) END)""".stripMargin).as("f"))
        .select(col("f.t").as("n_months"), col("f.a").as("level_num"),
                col("f.b").as("trend_num"),
                (col("f.a") + col("f.b")).as("forecast_num"))
    }),
    "q529_jaro_winkler" -> ((s, dir) => {
      // Fuzzy-name linkage with the native jaro_winkler comparator
      // (codegen'd, bit-identical to the oracle's comparator — validated
      // over the full blocked-pair corpus, incl. the >0.7 prefix-boost
      // threshold). Brand blocking + key-mod thinning bound the pair set
      // (the anti-|T|² lever); scores land as floor-micro ints so the
      // driver's string compare is byte-stable.
      val f = rd(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_name"))
      val pairs = f.as("a").join(f.as("b"),
          col("a.p_brand") === col("b.p_brand") &&
          col("a.p_partkey") < col("b.p_partkey") &&
          col("a.p_partkey") % 17 === 0 && col("b.p_partkey") % 13 === 0)
        .select(col("a.p_brand").as("brand"),
          floor(graft.functions.JaroWinkler(
              col("a.p_name"), col("b.p_name")) * lit(1000000))
            .cast("long").as("jwm"))
      pairs.groupBy(col("brand"))
        .agg(count(lit(1)).as("n_pairs"),
             max(col("jwm")).as("max_jw_micro"),
             sum(col("jwm")).as("sum_jw_micro"),
             sum(when(col("jwm") >= 850000, 1L).otherwise(0L)).as("n_sim"))
    }),
    "q530_sliding_median" -> ((s, dir) => {
      // Sliding-window median (last 21 events) per user, exact: sort the
      // bounded frame array and index the lower median — no approximate
      // percentile. The frame is a constant 21 rows, so the per-row cost
      // is O(21 log 21) regardless of history length; everything
      // partitions by user_id (one shuffle).
      val v = SparkEntry.ev(s, dir)
        .withColumn("vc", expr("CAST(floor(value * 100) AS BIGINT)"))
      val wFrame = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id")).rowsBetween(-20, 0)
      val wDesc = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      v.withColumn("lst", sort_array(collect_list(col("vc")).over(wFrame)))
        .withColumn("rdesc", row_number().over(wDesc))
        .withColumn("med", expr(
          "element_at(lst, CAST((size(lst) + 1) DIV 2 AS INT))"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
             max(when(col("rdesc") === 1, col("med"))).as("med_last"),
             min(col("med")).as("med_min"),
             max(col("med")).as("med_max"))
    }),
    "q531_mad_outliers" -> ((s, dir) => {
      // Robust outlier detection per event type: median, MAD (median of
      // absolute deviations), and the |x − med| > 5·MAD count — the
      // robust-z screen that doesn't let the outliers it hunts poison the
      // scale estimate (unlike stddev). Medians are exact rank
      // selections (position ⌈n/2⌉ with deterministic event_id
      // tiebreak), two passes, each one type-keyed window.
      val v = SparkEntry.ev(s, dir).select(col("event_type"),
          col("event_id"), expr("CAST(floor(value * 100) AS BIGINT)").as("vc"))
        .localCheckpoint(false)
      def lowerMedian(df: DataFrame, valCol: String): DataFrame = {
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col(valCol), col("event_id"))
        val wn = Window.partitionBy(col("event_type"))
        df.withColumn("_rn", row_number().over(w))
          .withColumn("_n", count(lit(1)).over(wn))
          .filter(col("_rn") === expr("(_n + 1) DIV 2"))
          .select(col("event_type"), col(valCol).as("_m"), col("_n"))
      }
      val med = lowerMedian(v, "vc")
        .select(col("event_type"), col("_m").as("med"), col("_n").as("n"))
      val d = v.join(broadcast(med), Seq("event_type"))
        .withColumn("ad", abs(col("vc") - col("med")))
      val mad = lowerMedian(d, "ad")
        .select(col("event_type"), col("_m").as("mad"))
      d.join(broadcast(mad), Seq("event_type"))
        .groupBy(col("event_type"), col("n"), col("med"), col("mad"))
        .agg(sum(when(col("ad") > lit(5) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
        .select("event_type", "n", "med", "mad", "n_outliers")
    }),
    "q532_gini_stump" -> ((s, dir) => {
      // Best decision-stump split (Gini impurity) on $1000 price bands
      // predicting returns: candidates = distinct bands below the max,
      // per-side impurity numerators exact in int64 (n² ≤ 3.3e11 at
      // sf0.1 before the ppm scale — bound documented), objective =
      // left ppm + right ppm with the DIV-quantized value DEFINED as the
      // statistic, argmin tiebroken by threshold. One fact-scan rollup
      // to ≤101 bands, then candidate evaluation is dimension-sized.
      val b = rd(s, dir, "lineitem").select(
        expr("CAST(floor(l_extendedprice * 100) AS BIGINT) DIV 100000")
          .as("x"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
      val agg = b.groupBy(col("x"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
        .localCheckpoint(false)
      val tot = agg.agg(sum(col("n")).as("nt"), sum(col("pos")).as("post"),
                        max(col("x")).as("xmax"))
      val cand = agg.as("c").crossJoin(broadcast(tot))
        .filter(col("c.x") < col("xmax"))
        .join(agg.as("a"), col("a.x") <= col("c.x"))
        .groupBy(col("c.x").as("c"), col("nt"), col("post"))
        .agg(sum(col("a.n")).as("nl"), sum(col("a.pos")).as("posl"))
      cand
        .withColumn("negl", col("nl") - col("posl"))
        .withColumn("nr", col("nt") - col("nl"))
        .withColumn("posr", col("post") - col("posl"))
        .withColumn("negr", col("nr") - col("posr"))
        .withColumn("g_ppm", expr(
          "(nl * nl - posl * posl - negl * negl) * 1000000 DIV nl" +
          " + (nr * nr - posr * posr - negr * negr) * 1000000 DIV nr"))
        .orderBy(col("g_ppm"), col("c")).limit(1)
        .select(col("c").as("best_c"), col("g_ppm"),
                col("nl").as("n_left"), col("nr").as("n_right"),
                col("posl").as("pos_left"), col("posr").as("pos_right"))
    }),
    "q533_quantile_norm" -> ((s, dir) => {
      // Quantile normalization: map each language's n_chars distribution
      // onto the GLOBAL distribution by rank position (target index
      // ⌈rn·N/ns⌉ via integer ceil-div) — the classic cross-cohort
      // feature-alignment op. Ranks come from cellRank (two-phase
      // micro-cell ranking), so no single-partition global sort even
      // though the reference distribution is corpus-wide.
      val docs = Tables.spread(s, rd(s, dir, "documents"))
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val sRank = Profile.cellRank(docs, Seq("lang"), "n_chars",
          Seq("doc_id")).withColumnRenamed("_rank", "rn")
      val ns = docs.groupBy(col("lang")).agg(count(lit(1)).as("ns"))
      val gRank = Profile.cellRank(docs, Seq(), "n_chars", Seq("doc_id"))
        .select(col("n_chars").as("gv"), col("_rank").as("gr"))
      val nn = docs.agg(count(lit(1)).as("n"))
      sRank.join(broadcast(ns), Seq("lang")).crossJoin(broadcast(nn))
        .withColumn("gr", expr("(rn * n + ns - 1) DIV ns"))
        .join(gRank, Seq("gr"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("gv")).as("sum_norm"),
             min(col("gv")).as("min_norm"), max(col("gv")).as("max_norm"))
    }),
    "q534_weighted_jaccard" -> ((s, dir) => {
      // EXACT multiset (weighted) Jaccard Σmin/Σmax between sampled doc
      // pairs on token-count vectors — the containment-grade dedup
      // comparator where repeated tokens matter (plain Jaccard q17 sees
      // sets). Σmax folds to |a|+|b|−Σmin, so only the intersection join
      // runs; pair set bounded by key-mod sampling (the blocked-join
      // contract), rolled up to source×source cells.
      val docs = Tables.spread(s, rd(s, dir, "documents"))
      val tok = docs
        .select(col("doc_id"), col("source"),
                explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("doc_id"), col("source"), col("tok"))
        .agg(count(lit(1)).as("c")).localCheckpoint(false)
      val tot = tok.groupBy(col("doc_id")).agg(sum(col("c")).as("tc"))
      val ids = docs.select(col("doc_id"), col("source")).distinct()
      val pairs = ids.filter(col("doc_id") % 7 === 0)
        .select(col("doc_id").as("da"), col("source").as("sa"))
        .join(ids.filter(col("doc_id") % 11 === 0)
          .select(col("doc_id").as("db"), col("source").as("sb")),
          col("da") < col("db"))
        .localCheckpoint(false)
      val inter = pairs
        .join(tok.select(col("doc_id").as("da"), col("tok"),
                         col("c").as("ca")), Seq("da"))
        .join(tok.select(col("doc_id").as("db"), col("tok"),
                         col("c").as("cb")), Seq("db", "tok"))
        .groupBy(col("da"), col("db"))
        .agg(sum(least(col("ca"), col("cb"))).as("smin"))
      pairs
        .join(inter, Seq("da", "db"), "left_outer")
        .join(tot.select(col("doc_id").as("da"), col("tc").as("ta")),
              Seq("da"))
        .join(tot.select(col("doc_id").as("db"), col("tc").as("tb")),
              Seq("db"))
        .withColumn("jppm", expr(
          "coalesce(smin, 0) * 1000000 DIV (ta + tb - coalesce(smin, 0))"))
        .groupBy(col("sa"), col("sb"))
        .agg(count(lit(1)).as("n_pairs"), sum(col("jppm")).as("sum_jppm"),
             max(col("jppm")).as("max_jppm"))
    }))

  def oracleSql: Map[String, String] = Map(
    "q522_multi_pattern" ->
      """WITH pats(pat) AS (VALUES ('row scan'), ('scan slow'),
        |  ('fast table'), ('table value'), ('value table'), ('a row'),
        |  ('fast'), ('ast '), ('value part'), ('w sc'), ('join small'),
        |  ('the part')),
        |hits AS (
        |  SELECT p.pat, d.doc_id, count(*) AS c
        |  FROM documents d
        |  JOIN pats p ON length(d.text) >= length(p.pat)
        |  CROSS JOIN LATERAL (
        |    SELECT unnest(range(1, length(d.text) - length(p.pat) + 2))
        |      AS i) r
        |  WHERE substr(d.text, CAST(r.i AS INT), length(p.pat)) = p.pat
        |  GROUP BY 1, 2)
        |SELECT p.pat,
        |  CAST(coalesce(count(h.doc_id), 0) AS BIGINT) AS n_docs,
        |  CAST(coalesce(sum(h.c), 0) AS BIGINT) AS n_matches
        |FROM pats p LEFT JOIN hits h ON p.pat = h.pat
        |GROUP BY 1""".stripMargin,
    "q523_ewma_user" ->
      s"""WITH ${SparkEntry.SrcCte},
         |v AS (SELECT user_id, event_id, ts,
         |    CAST(floor(value * 100) AS BIGINT) AS vc FROM src),
         |r AS (SELECT user_id, vc, row_number() OVER (
         |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
         |  FROM v)
         |SELECT user_id, CAST(count(*) AS BIGINT) AS n_terms,
         |  CAST(sum(CAST(1 AS BIGINT) << (20 - rn)) AS BIGINT) AS wsum,
         |  CAST(sum(vc * (CAST(1 AS BIGINT) << (20 - rn))) AS BIGINT)
         |    AS ewma_num,
         |  CAST(sum(vc * (CAST(1 AS BIGINT) << (20 - rn)))
         |    // sum(CAST(1 AS BIGINT) << (20 - rn)) AS BIGINT)
         |    AS ewma_cents
         |FROM r WHERE rn <= 20 GROUP BY 1""".stripMargin,
    "q524_isotonic_trend" ->
      """WITH m AS MATERIALIZED (
        |  SELECT CAST((year(o_orderdate) - 1992) * 12
        |      + month(o_orderdate) - 1 AS BIGINT) AS mi,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |p AS MATERIALIZED (
        |  SELECT a.mi, a.y, CAST(sum(b.y) AS BIGINT) AS pre
        |  FROM m a JOIN m b ON b.mi <= a.mi GROUP BY 1, 2),
        |triple AS (
        |  SELECT i.mi AS i, j.mi AS j,
        |    (k.pre - j.pre + j.y) * 1000000
        |      // (CAST(k.mi - j.mi AS BIGINT) + 1) AS avq
        |  FROM p i JOIN p j ON j.mi <= i.mi JOIN p k ON k.mi >= i.mi),
        |inner_min AS (
        |  SELECT i, j, min(avq) AS mn FROM triple GROUP BY 1, 2)
        |SELECT i AS month_idx, CAST(max(mn) AS BIGINT) AS fit_micro
        |FROM inner_min GROUP BY 1""".stripMargin,
    "q525_landmark_closeness" ->
      """WITH RECURSIVE gi AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
        |e0 AS MATERIALIZED (
        |  SELECT a.i AS src, b.i AS dst FROM gi a
        |  JOIN gi b ON a.g = b.g AND a.i < b.i
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |sym AS MATERIALIZED (
        |  SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
        |lm AS MATERIALIZED (
        |  SELECT DISTINCT src AS n FROM sym ORDER BY 1 LIMIT 8),
        |bfs(root, node, hop) AS (
        |  SELECT n, n, 0 FROM lm
        |  UNION
        |  SELECT b.root, s.dst, b.hop + 1 FROM bfs b
        |  JOIN sym s ON b.node = s.src WHERE b.hop < 4),
        |d AS (SELECT root, node, min(hop) AS hop FROM bfs GROUP BY 1, 2)
        |SELECT CAST(root AS BIGINT) AS root,
        |  CAST(count(*) AS BIGINT) AS n_reached,
        |  CAST(sum(hop) AS BIGINT) AS sum_hops
        |FROM d GROUP BY 1""".stripMargin,
    "q526_scc_trade" ->
      """WITH RECURSIVE e AS MATERIALIZED (
        |  SELECT CAST(c.c_nationkey AS BIGINT) AS src,
        |    CAST(s.s_nationkey AS BIGINT) AS dst
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |    JOIN customer c ON o.o_custkey = c.c_custkey
        |    JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE c.c_nationkey <> s.s_nationkey
        |  GROUP BY 1, 2 HAVING count(*) >= 100),
        |r(src, dst) AS (SELECT src, dst FROM e
        |  UNION SELECT r.src, e.dst FROM r JOIN e ON r.dst = e.src),
        |m AS (SELECT f.src AS node, f.dst AS peer FROM r f
        |  JOIN r g ON f.src = g.dst AND f.dst = g.src),
        |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |sid AS (SELECT n.node,
        |    least(coalesce(min(m.peer), n.node), n.node) AS scc_id
        |  FROM nodes n LEFT JOIN m ON n.node = m.node GROUP BY n.node),
        |sz AS (SELECT scc_id, CAST(count(*) AS BIGINT) AS scc_size
        |  FROM sid GROUP BY 1)
        |SELECT sid.node, sid.scc_id, sz.scc_size
        |FROM sid JOIN sz USING (scc_id)""".stripMargin,
    "q527_linkage_patterns" ->
      """WITH f AS MATERIALIZED (
        |  SELECT p_partkey, p_brand, split_part(p_type, ' ', 1) AS tw,
        |    p_size,
        |    CAST(floor(p_retailprice * 100) AS BIGINT) // 1000 AS pb
        |  FROM part),
        |pr AS (SELECT
        |    (CASE WHEN a.tw = b.tw THEN 4 ELSE 0 END
        |     + CASE WHEN a.p_size = b.p_size THEN 2 ELSE 0 END
        |     + CASE WHEN a.pb = b.pb THEN 1 ELSE 0 END) AS pattern
        |  FROM f a JOIN f b
        |    ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey),
        |g AS (SELECT CAST(pattern AS BIGINT) AS pattern,
        |    CAST(count(*) AS BIGINT) AS n_pairs FROM pr GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_pairs) AS BIGINT) AS t FROM g)
        |SELECT g.pattern, g.n_pairs,
        |  CAST(g.n_pairs * 1000000 // tot.t AS BIGINT) AS u_ppm
        |FROM g, tot""".stripMargin,
    "q528_holt_trend" ->
      """WITH RECURSIVE m AS MATERIALIZED (
        |  SELECT CAST((year(o_orderdate) - 1992) * 12
        |      + month(o_orderdate) - 1 AS BIGINT) AS mi,
        |    CAST(count(*) AS BIGINT) AS y FROM orders GROUP BY 1),
        |mm AS (SELECT max(mi) AS mx FROM m),
        |l12 AS MATERIALIZED (
        |  SELECT CAST(row_number() OVER (ORDER BY mi) AS BIGINT) AS t, y
        |  FROM (SELECT m.mi, m.y FROM m, mm WHERE m.mi < mm.mx
        |        ORDER BY m.mi DESC LIMIT 12)),
        |rec(t, a, b) AS (
        |  SELECT CAST(1 AS BIGINT), (SELECT y * 4 FROM l12 WHERE t = 1),
        |    CAST(0 AS BIGINT)
        |  UNION ALL
        |  SELECT rec.t + 1,
        |    x.y * (CAST(2 AS BIGINT) << CAST(2 * rec.t AS INT))
        |      + 2 * rec.a + 2 * rec.b,
        |    x.y * (CAST(1 AS BIGINT) << CAST(2 * rec.t AS INT))
        |      - rec.a + 3 * rec.b
        |  FROM rec JOIN l12 x ON x.t = rec.t + 1 WHERE rec.t < 12)
        |SELECT t AS n_months, a AS level_num, b AS trend_num,
        |  a + b AS forecast_num
        |FROM rec WHERE t = 12""".stripMargin,
    "q529_jaro_winkler" ->
      """WITH f AS MATERIALIZED (
        |  SELECT p_partkey, p_brand, p_name FROM part),
        |pr AS (SELECT a.p_brand AS brand,
        |    CAST(floor(jaro_winkler_similarity(a.p_name, b.p_name)
        |      * 1000000) AS BIGINT) AS jwm
        |  FROM f a JOIN f b ON a.p_brand = b.p_brand
        |    AND a.p_partkey < b.p_partkey
        |    AND a.p_partkey % 17 = 0 AND b.p_partkey % 13 = 0)
        |SELECT brand, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(max(jwm) AS BIGINT) AS max_jw_micro,
        |  CAST(sum(jwm) AS BIGINT) AS sum_jw_micro,
        |  CAST(sum(CASE WHEN jwm >= 850000 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_sim
        |FROM pr GROUP BY 1""".stripMargin,
    "q530_sliding_median" ->
      s"""WITH ${SparkEntry.SrcCte},
         |v AS (SELECT user_id, event_id, ts,
         |    CAST(floor(value * 100) AS BIGINT) AS vc FROM src),
         |w AS (SELECT user_id, event_id, ts,
         |    list_sort(list(vc) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id
         |      ROWS BETWEEN 20 PRECEDING AND CURRENT ROW)) AS lst,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts DESC, event_id DESC) AS rdesc
         |  FROM v),
         |med AS (SELECT user_id, rdesc,
         |    lst[CAST((len(lst) + 1) // 2 AS INT)] AS med FROM w)
         |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(max(CASE WHEN rdesc = 1 THEN med END) AS BIGINT)
         |    AS med_last,
         |  CAST(min(med) AS BIGINT) AS med_min,
         |  CAST(max(med) AS BIGINT) AS med_max
         |FROM med GROUP BY 1""".stripMargin,
    "q531_mad_outliers" ->
      s"""WITH ${SparkEntry.SrcCte},
         |v AS (SELECT event_type, event_id,
         |    CAST(floor(value * 100) AS BIGINT) AS vc FROM src),
         |r1 AS (SELECT event_type, vc, row_number() OVER (
         |      PARTITION BY event_type ORDER BY vc, event_id) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS n FROM v),
         |med AS (SELECT event_type, vc AS med, n FROM r1
         |  WHERE rn = (n + 1) // 2),
         |d AS (SELECT v.event_type, abs(v.vc - m.med) AS ad, v.event_id,
         |    m.med, m.n
         |  FROM v JOIN med m ON v.event_type = m.event_type),
         |r2 AS (SELECT event_type, ad, med, n, row_number() OVER (
         |    PARTITION BY event_type ORDER BY ad, event_id) AS rn FROM d),
         |mad AS (SELECT event_type, med, n, ad AS mad FROM r2
         |  WHERE rn = (n + 1) // 2)
         |SELECT d.event_type, CAST(mad.n AS BIGINT) AS n,
         |  CAST(mad.med AS BIGINT) AS med, CAST(mad.mad AS BIGINT) AS mad,
         |  CAST(sum(CASE WHEN d.ad > 5 * mad.mad THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_outliers
         |FROM d JOIN mad ON d.event_type = mad.event_type
         |GROUP BY 1, 2, 3, 4""".stripMargin,
    "q532_gini_stump" ->
      """WITH b AS MATERIALIZED (
        |  SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) // 100000
        |      AS x,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        |  FROM lineitem),
        |agg AS MATERIALIZED (SELECT x, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS pos FROM b GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt,
        |    CAST(sum(pos) AS BIGINT) AS post, max(x) AS xmax FROM agg),
        |cand AS (
        |  SELECT c.x AS c, sum(a.n) AS nl, sum(a.pos) AS posl
        |  FROM agg c JOIN agg a ON a.x <= c.x, tot
        |  WHERE c.x < tot.xmax GROUP BY 1),
        |sc AS (SELECT c, nl, posl, (nl - posl) AS negl, tot.nt - nl AS nr,
        |    tot.post - posl AS posr,
        |    (tot.nt - nl) - (tot.post - posl) AS negr FROM cand, tot),
        |g AS (SELECT c,
        |    ((nl * nl - posl * posl - negl * negl) * 1000000 // nl
        |     + (nr * nr - posr * posr - negr * negr) * 1000000 // nr)
        |      AS g_ppm,
        |    nl, nr, posl, posr FROM sc)
        |SELECT CAST(c AS BIGINT) AS best_c, CAST(g_ppm AS BIGINT) AS g_ppm,
        |  CAST(nl AS BIGINT) AS n_left, CAST(nr AS BIGINT) AS n_right,
        |  CAST(posl AS BIGINT) AS pos_left, CAST(posr AS BIGINT)
        |    AS pos_right
        |FROM g ORDER BY g_ppm, c LIMIT 1""".stripMargin,
    "q533_quantile_norm" ->
      """WITH s AS MATERIALIZED (
        |  SELECT doc_id, lang, n_chars,
        |    row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id)
        |      AS rn,
        |    count(*) OVER (PARTITION BY lang) AS ns FROM documents),
        |g AS MATERIALIZED (
        |  SELECT n_chars AS gv, row_number() OVER (ORDER BY n_chars,
        |    doc_id) AS gr FROM documents),
        |nn AS (SELECT count(*) AS n FROM documents),
        |mapped AS (SELECT s.lang, g.gv
        |  FROM s, nn JOIN g ON g.gr = (s.rn * nn.n + s.ns - 1) // s.ns)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(gv) AS BIGINT) AS sum_norm,
        |  CAST(min(gv) AS BIGINT) AS min_norm,
        |  CAST(max(gv) AS BIGINT) AS max_norm
        |FROM mapped GROUP BY 1""".stripMargin,
    "q534_weighted_jaccard" ->
      """WITH tok AS MATERIALIZED (
        |  SELECT doc_id, source, t AS tok, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT doc_id, source,
        |      unnest(string_split(text, ' ')) AS t FROM documents)
        |  WHERE t <> '' GROUP BY 1, 2, 3),
        |tot AS MATERIALIZED (SELECT doc_id, CAST(sum(c) AS BIGINT) AS tc
        |  FROM tok GROUP BY 1),
        |pairs AS MATERIALIZED (
        |  SELECT a.doc_id AS da, a.source AS sa, b.doc_id AS db,
        |    b.source AS sb
        |  FROM (SELECT DISTINCT doc_id, source FROM documents
        |        WHERE doc_id % 7 = 0) a
        |  JOIN (SELECT DISTINCT doc_id, source FROM documents
        |        WHERE doc_id % 11 = 0) b
        |    ON a.doc_id < b.doc_id),
        |inter AS (
        |  SELECT p.da, p.db, CAST(sum(least(ta.c, tb.c)) AS BIGINT)
        |    AS smin
        |  FROM pairs p JOIN tok ta ON ta.doc_id = p.da
        |  JOIN tok tb ON tb.doc_id = p.db AND ta.tok = tb.tok
        |  GROUP BY 1, 2),
        |j AS (SELECT p.sa, p.sb,
        |    coalesce(i.smin, 0) * 1000000
        |      // (xa.tc + xb.tc - coalesce(i.smin, 0)) AS jppm
        |  FROM pairs p LEFT JOIN inter i ON i.da = p.da AND i.db = p.db
        |  JOIN tot xa ON xa.doc_id = p.da
        |  JOIN tot xb ON xb.doc_id = p.db)
        |SELECT sa, sb, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(jppm) AS BIGINT) AS sum_jppm,
        |  CAST(max(jppm) AS BIGINT) AS max_jppm
        |FROM j GROUP BY 1, 2""".stripMargin)
}
