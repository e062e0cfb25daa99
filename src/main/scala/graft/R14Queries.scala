package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.DimKey
import graft.sources.Tables

/** Round-10 queries (q680+). Separate object: the earlier query objects'
  * map builders sit near the JVM 64 KB method-bytecode ceiling, so new
  * surface accretes here and chains into `SparkEntry.queries` /
  * `oracleSql`.
  */
object R14Queries {

  private def rd(s: SparkSession, dir: String, t: String): DataFrame =
    Tables.read(s, dir, t)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q680_betweenness_sampled" -> ((s, dir) => {
      // Sampled-pivot betweenness (Graph.betweennessSampled) — the scale
      // path the round-9 verdict asked for past q659's |V|³ exact pair
      // join: 6 md5-drawn pivots on the SAME ≥300-shipment trade graph,
      // σ-BFS from the pivots only (state k·|V|), pair sum over S×S via
      // the undirected σ_vt = σ_tv symmetry, rescaled n(n−1) DIV k(k−1)
      // in DECIMAL(38,0). A REAL sampled case (k < |V|), hash-pinned:
      // the oracle replays the identical pivot draw (md5 rank), walk
      // enumeration, per-pair truncation, and rescale.
      // oracleHopCap = 6: the oracle's walk recursion stops at hop 6
      // (`w.hop < 6` extends to 6) — the operator asserts every pivot
      // distance fits under it, so a deeper graph at another SF fails
      // LOUD instead of hash-mismatching (round-11 ADVICE fix).
      graft.operators.Graph.betweennessSampled(
        R13Queries.tradeArcs(s, dir, 300L).select("src", "dst"), k = 6,
        oracleHopCap = Some(6))
    }),
    "q682_stream_versioned_sink" -> ((s, dir) => {
      // scdSinkVersioned's batch-token idempotence under the gate: three
      // time-prefix micro-batches of the bounded user slice merge into a
      // VersionedTable through the streaming sink, then the LAST batch is
      // RE-DELIVERED with its own recorded token (foreachBatch's
      // documented at-least-once window) and must be SKIPPED — no merge,
      // no new version. A replay that re-merged would surface here as
      // extra_versions_from_replay=1. History counts recomputed by the
      // full-refresh oracle (time-prefix batches converge exactly —
      // ScdStreamSpec pins it).
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val feed = SparkEntry.ev(s, dir).filter(col("user_id") < 40)
        .select(col("event_id"), col("ts"), col("user_id"),
                col("event_type"), col("value"), col("props"))
        .as[(Long, java.sql.Timestamp, Long, String,
             Option[Double], Option[String])]
        .collect().toSeq.sortBy(e => (e._2.getTime, e._1))
      // strict-ts cuts: no (key, ts) tie ever spans a batch boundary
      def cutAt(i0: Int): Int = {
        var i = i0
        while (i > 0 && i < feed.size && feed(i)._2 == feed(i - 1)._2) i += 1
        i
      }
      val c1 = cutAt(feed.size / 3)
      val c2 = cutAt(2 * feed.size / 3)
      val batches = Seq(feed.take(c1), feed.slice(c1, c2), feed.drop(c2))
        .filter(_.nonEmpty)
      val base = java.nio.file.Files
        .createTempDirectory("graft-q682").toString
      val root = s"$base/dim"
      val src = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, java.sql.Timestamp, Long, String,
                       Option[Double], Option[String])]
      SparkEntry.withStreamShuffle(s) {
        val q = graft.streaming.ScdStream.scdSinkVersioned(
          src.toDF().toDF("event_id", "ts", "user_id", "event_type",
                          "value", "props"),
          root, SparkEntry.evCfg, s"$base/ckpt").start()
        try batches.foreach { b => src.addData(b: _*); q.processAllAvailable() }
        finally q.stop()
      }
      val vBefore = VersionedTable.latestVersion(s, root).get
      val token = VersionedTable.latestAppliedBatchToken(s, root).get
      val merged = graft.streaming.ScdStream.applyVersionedBatch(
        s, batches.last.toDF("event_id", "ts", "user_id", "event_type",
                             "value", "props"),
        root, SparkEntry.evCfg, token)
      val vAfter = VersionedTable.latestVersion(s, root).get
      VersionedTable.read(s, root).agg(
        lit(if (merged) 0L else 1L).as("replay_skipped"),
        lit(vAfter - vBefore).as("extra_versions_from_replay"),
        count(lit(1)).as("n_history_rows"),
        countDistinct(col("user_id")).as("n_keys"),
        sum(when(col("_is_current"), 1L).otherwise(0L)).as("n_current"))
    }),
    "q683_kaplan_meier" -> ((s, dir) => {
      // Kaplan–Meier product-limit survival (Survival.kaplanMeier): time
      // from a user's first event to their first qualifying incident
      // (error with event_id % 13 = 0 — the deterministic subsample that
      // keeps a real censored fraction at every SF); users with no
      // incident are right-censored at their last event. One fact rollup
      // to per-user (duration, censored), a days-sized ladder, then the
      // sequential truncated product BOTH engines replay step-for-step
      // (the q650 fold discipline; oracle = recursive-CTE fold). The
      // product-limit completion of the hazard tier (q285 discrete
      // hazard, q515 Nelson–Aalen).
      val life = SparkEntry.ev(s, dir)
        .groupBy(col("user_id"))
        .agg(min(col("ts")).cast("date").as("first_day"),
             min(when(col("event_type") === "error" &&
                        col("event_id") % 13 === 0, col("ts")))
               .cast("date").as("err_day"),
             max(col("ts")).cast("date").as("last_day"))
      val subj = life.select(
        datediff(coalesce(col("err_day"), col("last_day")),
                 col("first_day")).cast("long").as("dur"),
        when(col("err_day").isNull, 1).otherwise(0).as("censored"))
      graft.operators.Survival.kaplanMeier(subj, "dur", "censored")
    }),
    "q684_l_diversity" -> ((s, dir) => {
      // Distinct l-diversity audit (Privacy.lDiversity) over the
      // (nation, market segment) quasi-identifier with the $2000
      // account-balance band as the sensitive value — the homogeneity-
      // attack check between k-anonymity (q81) and t-closeness: a class
      // where everyone shares one balance band leaks it regardless of k.
      // Two combine-enabled rollups; output is class-count-sized.
      graft.operators.Privacy.lDiversity(
        rd(s, dir, "customer").select(
          col("c_nationkey").cast("long").as("nationkey"),
          col("c_mktsegment").as("mktsegment"),
          col("c_acctbal")),
        Seq("nationkey", "mktsegment"),
        expr("CAST(floor(c_acctbal / 2000) AS BIGINT)"), l = 5L)
    }),
    "q685_fd_strength" -> ((s, dir) => {
      // Functional-dependency error mining (Profile.fdStrength): the g3
      // measure (min rows to delete for the FD to hold) in exact ppm for
      // four candidate FDs — l_orderkey→o_orderdate HOLDS on the
      // denormalized lineitem⋈orders relation (the normalization rule FD
      // discovery exists to find: order-grain attributes repeated at
      // line grain), the other three are violated and ranked by their
      // violation mass. The schema-discovery complement of
      // inclusion-dependency profiling (q538): INDs propose foreign
      // keys, FDs propose normalization/defect rules. One two-column
      // rollup per candidate.
      import graft.operators.Profile
      val denorm = rd(s, dir, "lineitem").select("l_orderkey", "l_tax")
        .join(rd(s, dir, "orders").select("o_orderkey", "o_orderdate"),
              col("l_orderkey") === col("o_orderkey"))
      Profile.fdStrength(denorm,
                         Seq(("l_orderkey", "o_orderdate"),
                             ("l_orderkey", "l_tax")))
        .unionByName(Profile.fdStrength(rd(s, dir, "part"),
                                        Seq(("p_type", "p_size"))))
        .unionByName(Profile.fdStrength(rd(s, dir, "customer"),
                                        Seq(("c_nationkey", "c_mktsegment"))))
    }),
    "q686_jl_distortion" -> ((s, dir) => {
      // Johnson–Lindenstrauss distortion audit, EXACT-integer form:
      // Achlioptas ±1 projections (sign = md5 parity per (plane, dim) —
      // both engines replay the draw) over milli-quantized embeddings;
      // per sampled pair, ‖proj(a−b)‖² against k·‖a−b‖² in truncated
      // ppm. E[‖Px‖²] = k‖x‖² for ±1 rows, so distortion_ppm ≈ 1e6 —
      // the audit a random-projection index (or a JL-based dedup
      // prefilter) needs before trusting projected distances. All-int:
      // ≤ 6.5e16 documented, no float drift. Pair set bounded (vec_id
      // < 48), never corpus².
      val signTerm = (p: Int) =>
        s"(1 - 2 * (CAST(conv(substring(md5(concat('$p-', CAST(i AS STRING))), 1, 8), 16, 10) AS BIGINT) % 2))"
      val projs = (0 until 4).map(p =>
        expr(s"aggregate(sequence(0, 63), 0L, (acc, i) -> acc + " +
             s"${signTerm(p)} * element_at(qv, i + 1))").as(s"p$p"))
      val q = rd(s, dir, "embeddings").filter(col("vec_id") < 48)
        .select(col("vec_id"),
                expr("transform(embedding, x -> " +
                     "CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))")
                  .as("qv"))
        .select(Seq(col("vec_id"), col("qv")) ++ projs: _*)
      val pd = (0 until 4).map(p =>
        s"(a.p$p - b.p$p) * (a.p$p - b.p$p)").mkString(" + ")
      q.as("a").join(q.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
                expr("CAST(aggregate(zip_with(a.qv, b.qv, (x, y) -> " +
                     "(x - y) * (x - y)), 0L, (acc, v) -> acc + v) " +
                     "AS BIGINT)").as("dist2"),
                expr(s"CAST($pd AS BIGINT)").as("proj_dist2"))
        .withColumn("distortion_ppm",
                    expr("proj_dist2 * 1000000 DIV (4 * greatest(dist2, 1L))"))
    }),
    "q687_edge_betweenness" -> ((s, dir) => {
      // Sampled-pivot EDGE betweenness (Graph.edgeBetweennessSampled) —
      // the Girvan–Newman bridge score on the ≥300 trade graph with the
      // q680 pivot draw: arc (u,v) on an s→t geodesic iff d(s,u)+1+d(v,t)
      // = d(s,t), σ-weighted, S×S pair sum, n(n−1) DIV k(k−1) rescale.
      // k BFS sweeps + one |E|·k² join — never |V|³.
      // oracleHopCap mirrors the q680 diameter contract (ADVICE fix)
      graft.operators.Graph.edgeBetweennessSampled(
        R13Queries.tradeArcs(s, dir, 300L).select("src", "dst"), k = 6,
        oracleHopCap = Some(6))
    }),
    "q688_conductance" -> ((s, dir) => {
      // Community conductance of the region partition over the ≥110
      // trade graph: φ(S) = cut(S) / min(vol(S), vol(V∖S)) in exact ppm,
      // arc-count formulation (each undirected edge = two arcs, numerator
      // and denominator consistently doubled). The community-quality
      // sibling of modularity (q547) — low φ = well-separated region
      // blocks. Everything after the edge rollup is region-sized.
      val e = R13Queries.tradeArcs(s, dir, 110L).select("src", "dst")
      val sym = e.unionByName(
          e.select(col("dst").as("src"), col("src").as("dst")))
        .distinct().localCheckpoint(false)
      val reg = rd(s, dir, "nation")
        .join(broadcast(rd(s, dir, "region")),
              col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").cast("long").as("node"), col("r_name"))
      val arcs = sym
        .join(broadcast(reg.select(col("node").as("src"),
                                   col("r_name").as("r_src"))), Seq("src"))
        .join(broadcast(reg.select(col("node").as("dst"),
                                   col("r_name").as("r_dst"))), Seq("dst"))
        .localCheckpoint(false)
      val m = arcs.agg(count(lit(1)).as("m_arcs"))
      val nn = sym.select(col("src")).distinct()
        .join(broadcast(reg.select(col("node").as("src"), col("r_name"))),
              Seq("src"))
        .groupBy(col("r_name")).agg(count(lit(1)).as("n_nodes"))
      arcs.groupBy(col("r_src").as("r_name"))
        .agg(count(lit(1)).as("vol"),
             sum(when(col("r_src") =!= col("r_dst"), 1L).otherwise(0L))
               .as("cut"))
        .join(nn, Seq("r_name"))
        .crossJoin(broadcast(m))
        .withColumn("conductance_ppm",
          expr("cut * 1000000 DIV greatest(least(vol, m_arcs - vol), 1L)"))
        .select("r_name", "n_nodes", "vol", "cut", "conductance_ppm")
    }),
    "q689_encoding_advisor" -> ((s, dir) => {
      // Physical-encoding advisor (Profile.encodingAdvisor): per column,
      // NDV (dictionary size) and the RLE run count under the table's
      // clustered write order — runs counted WITHIN l_orderkey ordered by
      // l_linenumber, so run boundaries never cross a cluster key and no
      // global sort exists (the distributed formulation a 100 TB writer
      // needs). dict_ppm/rle_ppm are the encoding chooser's exact inputs
      // — the column-level companion of the layout advisor (q132/q651).
      graft.operators.Profile.encodingAdvisor(
        rd(s, dir, "lineitem"), "l_orderkey", "l_linenumber",
        Seq("l_returnflag", "l_linestatus", "l_tax"))
    }),
    "q690_prefix_compress" -> ((s, dir) => {
      // Sorted-run prefix compressibility: within each brand's
      // (p_name, p_partkey)-sorted run, the LCP of adjacent names —
      // Σlcp/Σlen ppm is exactly the byte fraction a prefix-compressed
      // (front-coded) dictionary page saves. Per-brand windows (no
      // global sort); the LCP is an O(len²) position fold on ≤55-char
      // names, identical in both engines.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("p_brand")).orderBy(col("p_name"), col("p_partkey"))
      rd(s, dir, "part")
        .select(col("p_brand"), col("p_name"), col("p_partkey"))
        .withColumn("_prev", lag(col("p_name"), 1).over(w))
        .withColumn("lcp", expr(
          "CASE WHEN _prev IS NULL THEN 0L ELSE " +
            "aggregate(sequence(1, least(length(_prev), length(p_name))), " +
            "0L, (acc, k) -> acc + IF(substring(_prev, 1, k) = " +
            "substring(p_name, 1, k), 1L, 0L)) END"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_names"),
             sum(col("lcp")).as("sum_lcp"),
             sum(length(col("p_name")).cast("long")).as("sum_len"))
        .withColumn("lcp_ppm", expr("sum_lcp * 1000000 DIV sum_len"))
    }),
    "q691_jackknife_ratio" -> ((s, dir) => {
      // Delete-a-group jackknife of the ratio estimator R = Σrev/Σqty
      // (rev = cents × (100−disc), exact ints): leave-one-NATION-out
      // ratios, pseudo-values n·R − (n−1)·R₋ᵢ in truncated ppm — the
      // resampling-free variance/bias machinery for a NONLINEAR statistic
      // (the linear-mean jackknife collapses to s²/n and teaches nothing).
      // One fact rollup to 25 nation groups; totals broadcast back — the
      // jackknife is free at any scale because R₋ᵢ needs only (Σ−gᵢ).
      // r_tot·1e6 ~ 5e20 > int64 → DECIMAL(38,0) (HUGEINT oracle-side).
      val li = rd(s, dir, "lineitem")
        .join(rd(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(rd(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey").cast("long").as("nationkey"),
                expr("CAST(floor(l_extendedprice * 100) AS BIGINT) * " +
                     "(100 - CAST(round(l_discount * 100) AS BIGINT))")
                  .as("rev"),
                expr("CAST(l_quantity AS BIGINT)").as("qty"))
      val g = li.groupBy(col("nationkey"))
        .agg(sum(col("rev")).as("r_i"), sum(col("qty")).as("q_i"),
             count(lit(1)).as("n_rows"))
      val tot = g.agg(
        sum(col("r_i")).cast("decimal(38,0)").as("_r_tot"),
        sum(col("q_i")).cast("decimal(38,0)").as("_q_tot"),
        count(lit(1)).as("_n_g"))
      g.crossJoin(broadcast(tot))
        .select(col("nationkey"), col("n_rows"),
          expr("CAST(_r_tot * 1000000 DIV _q_tot AS BIGINT)")
            .as("full_ratio_ppm"),
          expr("CAST((_r_tot - r_i) * 1000000 DIV (_q_tot - q_i) AS BIGINT)")
            .as("loo_ratio_ppm"),
          expr("CAST(_n_g * (_r_tot * 1000000 DIV _q_tot) - (_n_g - 1) * " +
               "((_r_tot - r_i) * 1000000 DIV (_q_tot - q_i)) AS BIGINT)")
            .as("pseudo_ppm"))
    }),
    "q692_allen_relations" -> ((s, dir) => {
      // Allen's interval algebra census: all 13 temporal relations between
      // line-interval pairs WITHIN an order ([shipdate, shipdate +
      // (1 + qty % 14) days] — deterministic durations both engines
      // derive). The temporal-reasoning vocabulary under every as-of join
      // and SCD2 overlap invariant, made first-class. Self-join
      // co-partitioned on the order key (≤ 7 lines ⇒ ≤ 21 pairs per
      // order) — per-key bounded fan-out, never a global product.
      val iv = rd(s, dir, "lineitem").select(
        col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
        col("l_shipdate").as("s"),
        expr("date_add(l_shipdate, CAST(1 + CAST(l_quantity AS BIGINT) % 14 AS INT))")
          .as("e"))
      iv.as("a").join(iv.as("b"),
          col("a.ok") === col("b.ok") && col("a.ln") < col("b.ln"))
        .select(col("a.s").as("s1"), col("a.e").as("e1"),
                col("b.s").as("s2"), col("b.e").as("e2"))
        .select(expr("""CASE
            WHEN e1 < s2 THEN 'precedes' WHEN e1 = s2 THEN 'meets'
            WHEN s1 = s2 AND e1 = e2 THEN 'equals'
            WHEN s1 = s2 AND e1 < e2 THEN 'starts'
            WHEN s1 = s2 AND e1 > e2 THEN 'started_by'
            WHEN e1 = e2 AND s1 < s2 THEN 'finished_by'
            WHEN e1 = e2 AND s1 > s2 THEN 'finishes'
            WHEN s1 < s2 AND e1 > e2 THEN 'contains'
            WHEN s1 > s2 AND e1 < e2 THEN 'during'
            WHEN s1 < s2 AND e1 > s2 AND e1 < e2 THEN 'overlaps'
            WHEN s2 < s1 AND e2 > s1 AND e2 < e1 THEN 'overlapped_by'
            WHEN e2 < s1 THEN 'preceded_by' ELSE 'met_by' END""")
          .as("relation"))
        .groupBy(col("relation")).agg(count(lit(1)).as("n_pairs"))
    }),
    "q693_interval_stabbing" -> ((s, dir) => {
      // Interval stabbing via the SWEEP-LINE (the distributed answer to
      // "build a segment tree"): ±1 events at interval ends, one
      // date-grain rollup (~2.5k rows — dimension-sized, DimKey.one
      // declared), prefix-sum = open-interval count at every change day;
      // per month: max concurrency + count at the first change day. The
      // capacity-planning primitive (how many shipments in flight).
      val iv = rd(s, dir, "lineitem").select(
        col("l_shipdate").as("st"),
        expr("date_add(l_shipdate, CAST(1 + CAST(l_quantity AS BIGINT) % 14 AS INT))")
          .as("en"))
      val ev = iv.select(col("st").as("d"), lit(1L).as("delta"))
        .unionByName(iv.select(expr("date_add(en, 1)").as("d"),
                               lit(-1L).as("delta")))
      ev.groupBy(col("d")).agg(sum(col("delta")).as("dl"))
        .withColumn("open_n", sum(col("dl")).over(
          Window.partitionBy(DimKey.one).orderBy(col("d"))))
        .groupBy(date_trunc("month", col("d")).cast("date").as("month"))
        .agg(max(col("open_n")).as("max_open"),
             expr("CAST(min_by(open_n, d) AS BIGINT)")
               .as("open_at_first_change"),
             count(lit(1)).as("n_change_days"))
    }),
    "q694_arc_elasticity" -> ((s, dir) => {
      // Arc price elasticity per brand, month-over-month, EXACT: with
      // p = a/q rational unit prices, the midpoint formula collapses to
      // (q₁−q₀)(a₁q₀+a₀q₁)·1e6 / ((q₁+q₀)(a₁q₀−a₀q₁)) — all integer,
      // ~1e22 numerators → DECIMAL(38,0) both sides; oracle sign-folds
      // its floor-// to match Spark's truncate-toward-zero DIV. The
      // demand-curve op beside the forecast tier (Holt q286, Croston).
      val bm = rd(s, dir, "lineitem")
        .join(rd(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"),
                 date_trunc("month", col("l_shipdate")).cast("date")
                   .as("month"))
        .agg(sum(expr("CAST(floor(l_extendedprice * 100) AS BIGINT)"))
               .as("a1"),
             sum(expr("CAST(l_quantity AS BIGINT)")).as("q1"))
      val w = Window.partitionBy(col("p_brand")).orderBy(col("month"))
      bm.withColumn("a0", lag(col("a1"), 1).over(w))
        .withColumn("q0", lag(col("q1"), 1).over(w))
        .filter(col("a0").isNotNull)
        .withColumn("_num",
          expr("CAST(CAST(q1 - q0 AS DECIMAL(38,0)) * " +
               "(CAST(a1 AS DECIMAL(38,0)) * q0 + CAST(a0 AS DECIMAL(38,0)) * q1) " +
               "* 1000000 AS DECIMAL(38,0))"))
        .withColumn("_den",
          expr("CAST(CAST(q1 + q0 AS DECIMAL(38,0)) * " +
               "(CAST(a1 AS DECIMAL(38,0)) * q0 - CAST(a0 AS DECIMAL(38,0)) * q1) " +
               "AS DECIMAL(38,0))"))
        .select(col("p_brand"), col("month"), col("q0"), col("q1"),
                expr("CASE WHEN _den = 0 THEN 0L " +
                     "ELSE CAST(_num DIV _den AS BIGINT) END")
                  .as("elasticity_ppm"))
    }),
    "q695_topo_levels" -> ((s, dir) => {
      // Topological longest-path levels (Graph.longestPathLevels) of the
      // ≥40 trade DAG (monotone src<dst orientation = acyclic by
      // construction): 24 relaxation sweeps ≥ the longest possible path
      // (|V|−1 = 24) ⇒ exact Kahn-layer depth. Relaxation, NEVER path
      // enumeration — this dense monotone DAG has exponentially many
      // increasing paths; the oracle unrolls the same 24 sweeps. Depth =
      // the critical-path schedule of dependency-ordered work.
      val e = R13Queries.tradeArcs(s, dir, 40L).select("src", "dst")
        .localCheckpoint(false)
      val deg = e.select(col("src").as("node"), lit(1L).as("o"),
                         lit(0L).as("i"))
        .unionByName(e.select(col("dst").as("node"), lit(0L).as("o"),
                              lit(1L).as("i")))
        .groupBy(col("node"))
        .agg(sum(col("i")).as("in_deg"), sum(col("o")).as("out_deg"))
      graft.operators.Graph.longestPathLevels(e, sweeps = 24)
        .join(deg, Seq("node"))
        .select(col("node"), col("lvl").as("level"), col("in_deg"),
                col("out_deg"))
    }),
    "q696_eulerian_census" -> ((s, dir) => {
      // Eulerian classification ladder: at four density thresholds of the
      // SAME one-pass trade rollup (12/40/110/300 shipments), per
      // connected component (star-contraction min-label): node/edge
      // counts, odd-degree count, and the Euler verdict (circuit iff no
      // odd-degree node, path iff exactly two) — the route-feasibility
      // audit (can one tour traverse every lane exactly once). Everything
      // after the single fact rollup is nation-grain.
      val arcs = R13Queries.tradeArcs(s, dir, 12L).localCheckpoint(false)
      Seq(12L, 40L, 110L, 300L).map { t =>
        val e = arcs.filter(col("n") >= t).select("src", "dst")
        val comp = graft.operators.Graph.connectedComponentsStar(e)
        val deg = e.select(col("src").as("node"))
          .unionByName(e.select(col("dst").as("node")))
          .groupBy(col("node")).agg(count(lit(1)).as("d"))
        comp.join(deg, col("doc_id") === col("node"))
          .groupBy(lit(t).as("threshold"), col("cluster_id").as("component"))
          .agg(count(lit(1)).as("n_nodes"),
               (sum(col("d")) / 2).cast("long").as("n_edges"),
               sum(when(col("d") % 2 === 1, 1L).otherwise(0L)).as("n_odd"))
          .withColumn("euler_class",
            expr("CASE WHEN n_odd = 0 THEN 'circuit' " +
                 "WHEN n_odd = 2 THEN 'path' ELSE 'none' END"))
      }.reduce(_ unionByName _)
    }),
    "q697_soundex_blocking" -> ((s, dir) => {
      // Phonetic blocking for entity resolution: hand-rolled Soundex
      // (classic digit classes; variant documented: the first letter's own
      // code is not collapse-tracked) folded over the char sequence with a
      // 1-char-prev-code + digits string state — the SAME fold, seeded
      // with the first char, runs in both engines (Spark aggregate() over
      // slice(chars, 2, n−1); DuckDB list_reduce's first-element seed).
      // Blocking = the candidate-pair budget of fuzzy entity matching:
      // only same-code tokens ever get compared. Vocabulary-sized after
      // the distinct (p_name's ~100 words); corpus never reaches the fold.
      val code = (x: String) =>
        s"CASE WHEN $x IN ('B','F','P','V') THEN '1' " +
          s"WHEN $x IN ('C','G','J','K','Q','S','X','Z') THEN '2' " +
          s"WHEN $x IN ('D','T') THEN '3' WHEN $x = 'L' THEN '4' " +
          s"WHEN $x IN ('M','N') THEN '5' WHEN $x = 'R' THEN '6' " +
          s"ELSE '0' END"
      rd(s, dir, "part")
        .select(explode(split(col("p_name"), " ")).as("t"))
        .filter(length(col("t")) > 0).distinct()
        .withColumn("u", upper(col("t")))
        .withColumn("_enc", expr(
          // sequence() DESCENDS when stop < start — guard 1-char tokens
          "aggregate(IF(length(u) < 2, array(), " +
            "transform(sequence(2, length(u)), i -> substring(u, i, 1))), " +
            "substring(u, 1, 1), " +
            s"(st, ch) -> concat(${code("ch")}, " +
            s"CASE WHEN ${code("ch")} = substring(st, 1, 1) " +
            "THEN substring(st, 2) " +
            s"ELSE concat(substring(st, 2), ${code("ch")}) END))"))
        .withColumn("code", expr(
          "concat(substring(u, 1, 1), " +
            "substring(rpad(replace(substring(_enc, 2), '0', ''), 3, '0'), 1, 3))"))
        .groupBy(col("code"))
        .agg(count(lit(1)).as("n_tokens"), min(col("t")).as("sample_token"))
    }),
    "q698_apriori_triples" -> ((s, dir) => {
      // Frequent 3-itemsets of brands per order basket, the A-PRIORI way:
      // L2 (frequent pairs, support·250 ≥ n_orders cross-multiplied) →
      // candidate triples ONLY from two L2 pairs sharing their head PLUS
      // the third-sub-pair prune — the candidate space collapses to
      // dimension size BEFORE the 3-way basket join (the whole point of
      // Apriori at 100 TB: never count what a sub-pattern already
      // refuted). Basket joins co-partitioned on the order key.
      // r15 optimization (guide §2.3 "aggregate before you shuffle"): the
      // r14 shape shuffled the 500k-row (order, brand) relation FIVE
      // times (L2 self-join both sides + the 3-way basket join) — with
      // ≤ 25 distinct brands, the basket fits an array, so ONE groupBy
      // builds per-order brand sets and the pair/triple supports come
      // from in-basket combination explodes whose partial (map-side)
      // aggregation collapses to ≤ C(25,3) rows BEFORE any exchange.
      // Support counts are combinatorially identical (collect_set dedups
      // exactly like the old distinct; sort_array gives the same b1<b2<b3
      // string order as the old `<` join conditions); the candidate
      // lattice (two L2 pairs sharing the head + third-sub-pair prune)
      // is unchanged.
      val baskets = rd(s, dir, "lineitem")
        .join(rd(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("p_brand"))).as("bs"))
        .localCheckpoint(false)
      val n = baskets.agg(count(lit(1)).as("_n_orders"))
      val l2 = baskets.select(explode(expr(
          // sequence() DESCENDS when stop < start — guard 1-brand baskets
          "IF(size(bs) < 2, array(), flatten(transform(" +
            "sequence(1, size(bs) - 1), i -> transform(" +
            "sequence(i + 1, size(bs)), j -> struct(" +
            "element_at(bs, i) AS b1, element_at(bs, j) AS b2)))))"))
          .as("p"))
        .groupBy(col("p.b1").as("b1"), col("p.b2").as("b2"))
        .agg(count(lit(1)).as("sup"))
        .crossJoin(broadcast(n))
        .filter(col("sup") * 250 >= col("_n_orders"))
        .select(col("b1"), col("b2")).localCheckpoint(false)
      val cand = l2.as("p")
        .join(l2.as("q"),
              col("p.b1") === col("q.b1") && col("p.b2") < col("q.b2"))
        .select(col("p.b1").as("b1"), col("p.b2").as("b2"),
                col("q.b2").as("b3"))
        .join(l2.select(col("b1").as("_rb1"), col("b2").as("_rb2")),
              col("b2") === col("_rb1") && col("b3") === col("_rb2"),
              "left_semi")
      baskets.select(explode(expr(
          "IF(size(bs) < 3, array(), flatten(flatten(transform(" +
            "sequence(1, size(bs) - 2), i -> transform(" +
            "sequence(i + 1, size(bs) - 1), j -> transform(" +
            "sequence(j + 1, size(bs)), k -> struct(" +
            "element_at(bs, i) AS b1, element_at(bs, j) AS b2, " +
            "element_at(bs, k) AS b3)))))))"))
          .as("t"))
        .select(col("t.b1").as("b1"), col("t.b2").as("b2"),
                col("t.b3").as("b3"))
        .join(broadcast(cand), Seq("b1", "b2", "b3"), "left_semi")
        .groupBy(col("b1"), col("b2"), col("b3"))
        .agg(count(lit(1)).as("support"))
        .crossJoin(broadcast(n))
        .filter(col("support") * 250 >= col("_n_orders"))
        .select(col("b1"), col("b2"), col("b3"), col("support"),
                expr("support * 1000000 DIV _n_orders").as("support_ppm"))
    }),
    "q699_croston" -> ((s, dir) => {
      // Croston's method for INTERMITTENT demand (the op SES/Holt get
      // wrong on zero-heavy series): per brand over the %97-sampled part
      // slice, α=1/10 exponential updates of demand level z and
      // inter-demand interval p — only on demand months — in exact milli
      // ints (truncating DIV both engines; oracle sign-folds). One fold
      // per series via aggregate() over the calendar-dense array:
      // distributed ACROSS series, sequential only within (the q650 fold
      // discipline; oracle = per-series recursive-CTE fold).
      val d0 = rd(s, dir, "lineitem")
        .join(rd(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .filter(col("p_partkey") % 97 === 0)
        .groupBy(col("p_brand").as("ctr"),
                 expr("CAST((year(l_shipdate) - 1995) * 12 + " +
                      "month(l_shipdate) AS INT)").as("mi"))
        .agg(sum(expr("CAST(l_quantity AS BIGINT)")).as("d"))
      val mts = rd(s, dir, "lineitem")
        .agg(expr("CAST((year(min(l_shipdate)) - 1995) * 12 + " +
                  "month(min(l_shipdate)) AS INT)").as("lo"),
             expr("CAST((year(max(l_shipdate)) - 1995) * 12 + " +
                  "month(max(l_shipdate)) AS INT)").as("hi"))
        .select(explode(expr("sequence(lo, hi)")).as("mi"))
      d0.select(col("ctr")).distinct()
        .crossJoin(broadcast(mts))
        .join(d0, Seq("ctr", "mi"), "left")
        .na.fill(0L, Seq("d"))
        .groupBy(col("ctr"))
        .agg(expr("array_sort(collect_list(struct(mi, d)))").as("seq"),
             count(lit(1)).as("n_months"),
             sum(when(col("d") > 0, 1L).otherwise(0L)).as("n_demand"))
        .withColumn("fin", expr(
          "aggregate(seq, array(0L, 0L, 0L, 0L), (st, x) -> " +
            "CASE WHEN x.d > 0 AND st[0] = 0L " +
            "THEN array(1L, x.d * 1000L, (st[3] + 1L) * 1000L, 0L) " +
            "WHEN x.d > 0 " +
            "THEN array(1L, st[1] + (x.d * 1000L - st[1]) DIV 10L, " +
            "st[2] + ((st[3] + 1L) * 1000L - st[2]) DIV 10L, 0L) " +
            "ELSE array(st[0], st[1], st[2], st[3] + 1L) END)"))
        .select(col("ctr").as("brand"),
                expr("fin[1]").as("z_milli"), expr("fin[2]").as("p_milli"),
                expr("CASE WHEN fin[2] > 0 THEN fin[1] * 1000 DIV fin[2] " +
                     "ELSE 0L END").as("forecast_milli"),
                col("n_months"), col("n_demand"))
    }),
    "q700_knapsack_budget" -> ((s, dir) => {
      // 0/1 knapsack document selection under a token budget: 24 md5-drawn
      // docs (w = 1 + n_chars % 8 budget units, v = 1 + doc_id % 97
      // value), exact DP over capacities 0..40 as ONE aggregate() fold —
      // each item step is a pure transform over the 41-wide dp row (no
      // intra-row dependency), so the per-item work vectorizes and the
      // oracle replays the identical recursion. The
      // selection-under-budget op of training-data curation; python-sim
      // validated.
      rd(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
                expr("md5(concat('ks-', CAST(doc_id AS STRING)))").as("rk"))
        .orderBy(col("rk"), col("doc_id")).limit(24)
        .select(col("rk"), col("doc_id"),
                expr("CAST(1 + n_chars % 8 AS BIGINT)").as("w"),
                expr("CAST(1 + doc_id % 97 AS BIGINT)").as("v"))
        .agg(expr("array_sort(collect_list(struct(rk, doc_id, w, v)))")
               .as("items"))
        .select(posexplode(expr(
          "aggregate(items, transform(sequence(0, 40), x -> 0L), " +
            "(dp, it) -> transform(sequence(0, 40), j -> " +
            "IF(j >= it.w, greatest(element_at(dp, j + 1), " +
            "element_at(dp, CAST(j - it.w + 1 AS INT)) + it.v), " +
            "element_at(dp, j + 1))))")).as(Seq("cap", "best_value")))
        .select(col("cap").cast("long").as("capacity"), col("best_value"))
    }),
    "q701_dtw_regions" -> ((s, dir) => {
      // Dynamic time warping between region revenue curves (1995 months,
      // $1000-unit ints), WAVEFRONT form: anti-diagonal k depends only on
      // diagonals k−1/k−2, so each of the 23 steps is a pure transform —
      // the parallel DP schedule (a banded 100 TB variant tiles the same
      // wavefront), never a 144-cell sequential scan. Both engines fold
      // the identical two-diagonal state (python O(n²)-DP validated);
      // out-of-range neighbors read as +INF via explicit bounds guards
      // (element_at/list index would WRAP on negatives). Lockstep Σ|aᵢ−bᵢ|
      // published beside it — warping ≤ lockstep by construction.
      val rm = rd(s, dir, "lineitem")
        .join(rd(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(rd(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(rd(s, dir, "nation")),
              col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(rd(s, dir, "region")),
              col("n_regionkey") === col("r_regionkey"))
        .filter(expr("year(l_shipdate) = 1995"))
        .groupBy(col("r_name"), expr("CAST(month(l_shipdate) AS INT)").as("m"))
        .agg(expr("CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) " +
                  "DIV 100000 AS BIGINT)").as("v"))
      val arr = rm.select(col("r_name")).distinct()
        .crossJoin(broadcast(
          s.range(1, 13).select(col("id").cast("int").as("m"))))
        .join(rm, Seq("r_name", "m"), "left")
        .na.fill(0L, Seq("v"))
        .groupBy(col("r_name"))
        .agg(expr("transform(array_sort(collect_list(struct(m, v))), x -> x.v)")
               .as("a"))
      val inf = "1000000000000L"
      arr.as("x").join(arr.as("y"), col("x.r_name") < col("y.r_name"))
        .select(col("x.r_name").as("r1"), col("y.r_name").as("r2"),
                col("x.a").as("a"), col("y.a").as("b"))
        .withColumn("fin", expr(
          "aggregate(sequence(3, 24), " +
            "named_struct('prev', array(abs(element_at(a, 1) - element_at(b, 1))), " +
            "'prev2', CAST(array() AS ARRAY<BIGINT>)), " +
            "(st, k) -> named_struct(" +
            "'prev', transform(sequence(greatest(1, k - 12), least(12, k - 1)), i -> " +
            "abs(element_at(a, i) - element_at(b, k - i)) + least(" +
            s"IF(i - greatest(1, k - 13) >= 1 AND i - greatest(1, k - 13) <= size(st.prev), " +
            s"element_at(st.prev, i - greatest(1, k - 13)), $inf), " +
            s"IF(i - greatest(1, k - 13) + 1 >= 1 AND i - greatest(1, k - 13) + 1 <= size(st.prev), " +
            s"element_at(st.prev, i - greatest(1, k - 13) + 1), $inf), " +
            s"IF(i - greatest(1, k - 14) >= 1 AND i - greatest(1, k - 14) <= size(st.prev2), " +
            s"element_at(st.prev2, i - greatest(1, k - 14)), $inf))), " +
            "'prev2', st.prev))"))
        .select(col("r1"), col("r2"),
                expr("element_at(fin.prev, 1)").as("dtw_units"),
                expr("aggregate(zip_with(a, b, (x, y) -> abs(x - y)), 0L, " +
                     "(acc, v2) -> acc + v2)").as("lockstep_units"))
    }),
    "q702_window_funnel" -> ((s, dir) => {
      // ClickHouse-style windowFunnel: per user the deepest
      // view→click→purchase chain whose EACH step extends a chain started
      // ≤ 7 days earlier — state = per-level earliest chain-start micros
      // (the classic funnel DP), one aggregate() fold per user over the
      // time-sorted event array; oracle replays it as a per-user
      // recursive-CTE fold (python-sim validated). The conversion-depth
      // op behind every product funnel dashboard.
      val inf = "4102444800000000L"
      SparkEntry.ev(s, dir)
        .filter(col("event_type").isin("view", "click", "purchase"))
        .select(col("user_id"), expr("unix_micros(ts)").as("us"),
                col("event_id"),
                expr("CASE event_type WHEN 'view' THEN 1L WHEN 'click' " +
                     "THEN 2L ELSE 3L END").as("stp"))
        .groupBy(col("user_id"))
        .agg(expr("array_sort(collect_list(struct(us, event_id, stp)))")
               .as("seq"),
             count(lit(1)).as("n_events"))
        .withColumn("fin", expr(
          s"aggregate(seq, array($inf, $inf, $inf), (st, e) -> array(" +
            "IF(e.stp = 1L, least(st[0], e.us), st[0]), " +
            s"IF(e.stp = 2L AND st[0] < $inf AND e.us - st[0] <= 604800000000L, " +
            "least(st[1], st[0]), st[1]), " +
            s"IF(e.stp = 3L AND st[1] < $inf AND e.us - st[1] <= 604800000000L, " +
            "least(st[2], st[1]), st[2])))"))
        .select(col("user_id"),
                expr(s"CASE WHEN fin[2] < $inf THEN 3L WHEN fin[1] < $inf " +
                     s"THEN 2L WHEN fin[0] < $inf THEN 1L ELSE 0L END")
                  .as("funnel_level"),
                col("n_events"))
    }),
    "q703_vopt_histogram" -> ((s, dir) => {
      // V-optimal histogram construction (the optimizer-stats DP): order
      // totals on a 24-cell value grid, dp[b][i] = min split of cells 1..i
      // into ≤ b buckets minimizing the n-SCALED SSE (n·Σx² − (Σx)² per
      // segment — cross-multiplied, division-free, deterministic); the
      // corpus collapses to 24 sufficient-stat cells BEFORE the DP, so
      // the cubic-in-cells recursion is free at any scale. Emitted for
      // b = 1..4 as the error-vs-buckets ladder; > int64 → DECIMAL(38,0),
      // VARCHAR on the wire. python-sim validated.
      val g = rd(s, dir, "orders")
        .select(expr("CAST(floor(o_totalprice * 100) AS BIGINT) DIV 1000")
                  .as("v"))
      val b = g.agg(min(col("v")).as("_lo"), max(col("v")).as("_hi"))
      val cellAgg = g.crossJoin(broadcast(b))
        .select(expr("least(CAST(((v - _lo) * 24) DIV " +
                     "greatest(_hi - _lo + 1, 1L) AS INT), 23)").as("cell"),
                col("v"))
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
             sum(col("v") * col("v")).as("ssv"))
      val pre = s.range(0, 24).select(col("id").cast("int").as("cell"))
        .join(cellAgg, Seq("cell"), "left")
        .na.fill(0L, Seq("n", "sv", "ssv"))
        .select(col("cell"),
                sum(col("n")).over(Window.partitionBy(DimKey.one)
                  .orderBy(col("cell"))).as("cn"),
                sum(col("sv")).over(Window.partitionBy(DimKey.one)
                  .orderBy(col("cell"))).as("cs"),
                sum(col("ssv")).over(Window.partitionBy(DimKey.one)
                  .orderBy(col("cell"))).as("css"))
      val seg = (i: String, j: String) =>
        s"CAST(element_at(cn, $i) - element_at(cn, $j) AS DECIMAL(38,0)) * " +
          s"(element_at(css, $i) - element_at(css, $j)) - " +
          s"CAST(element_at(cs, $i) - element_at(cs, $j) AS DECIMAL(38,0)) * " +
          s"(element_at(cs, $i) - element_at(cs, $j))"
      val step = (prev: String) =>
        s"transform(sequence(1, 24), i -> array_min(transform(sequence(1, i), " +
          s"j -> IF(j < i, element_at($prev, j) + (${seg("i", "j")}), " +
          s"element_at($prev, i)))))"
      pre.agg(
          expr("transform(array_sort(collect_list(struct(cell, cn))), x -> x.cn)")
            .as("cn"),
          expr("transform(array_sort(collect_list(struct(cell, cs))), x -> x.cs)")
            .as("cs"),
          expr("transform(array_sort(collect_list(struct(cell, css))), x -> x.css)")
            .as("css"))
        .withColumn("dp1", expr(
          "transform(sequence(1, 24), i -> " +
            "CAST(element_at(cn, i) AS DECIMAL(38,0)) * element_at(css, i) - " +
            "CAST(element_at(cs, i) AS DECIMAL(38,0)) * element_at(cs, i))"))
        .withColumn("dp2", expr(step("dp1")))
        .withColumn("dp3", expr(step("dp2")))
        .withColumn("dp4", expr(step("dp3")))
        .select(explode(expr(
          "array(named_struct('n_buckets', 1L, 'nscaled_sse', CAST(element_at(dp1, 24) AS STRING)), " +
            "named_struct('n_buckets', 2L, 'nscaled_sse', CAST(element_at(dp2, 24) AS STRING)), " +
            "named_struct('n_buckets', 3L, 'nscaled_sse', CAST(element_at(dp3, 24) AS STRING)), " +
            "named_struct('n_buckets', 4L, 'nscaled_sse', CAST(element_at(dp4, 24) AS STRING)))"))
          .as("r"))
        .select(col("r.n_buckets").as("n_buckets"),
                col("r.nscaled_sse").as("nscaled_sse"))
    }),
    "q704_compaction_ffd" -> ((s, dir) => {
      // Small-file compaction planning: first-fit-decreasing bin packing
      // of (brand, month) file sizes into 3×max-size target files — the
      // lakehouse OPTIMIZE planner. The file LIST is metadata-sized (the
      // corpus only produces the sizes), so the sequential FFD fold is a
      // driver-free single-row aggregate() both engines replay; first-fit
      // search is an index filter over current bin loads. python-sim
      // validated; Spark guards sequence(1,0) descent on the empty state.
      val f = rd(s, dir, "lineitem")
        .join(rd(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .groupBy(expr("concat(p_brand, '/', CAST(date_trunc('month', " +
                      "l_shipdate) AS DATE))").as("fk"))
        .agg(count(lit(1)).as("sz"))
      f.crossJoin(broadcast(f.agg((lit(3L) * max(col("sz"))).as("_cap"))))
        .agg(expr("array_sort(collect_list(named_struct(" +
               "'negsz', -sz, 'fk', fk, 'sz', sz, '_cap', _cap)))")
               .as("items"),
             max(col("_cap")).as("_cap"))
        .withColumn("bins", expr(
          // the first-fit index is let-bound via a 1-element transform so
          // the bin scan runs ONCE per item, not once for the emptiness
          // probe and again for the index (bench: 27.3 s -> ~half)
          "aggregate(items, CAST(array() AS ARRAY<BIGINT>), (bins, it) -> " +
            "IF(size(bins) = 0, array(it.sz), " +
            "element_at(transform(array(element_at(concat(" +
            "filter(sequence(1, size(bins)), x -> " +
            "element_at(bins, x) + it.sz <= it._cap), array(-1)), 1)), j0 -> " +
            "IF(j0 = -1, concat(bins, array(it.sz)), " +
            "transform(sequence(1, size(bins)), x -> " +
            "IF(x = j0, element_at(bins, x) + it.sz, " +
            "element_at(bins, x))))), 1)))"))
        .select(col("_cap"), posexplode(col("bins")).as(Seq("p", "bin_load")))
        .select((col("p") + 1L).cast("long").as("bin_id"), col("bin_load"),
                expr("bin_load * 1000000 DIV _cap").as("fill_ppm"))
    }),
    "q705_feature_hash_audit" -> ((s, dir) => {
      // Feature-hashing collision audit: the uni+bigram type space hashed
      // to 256 buckets (md5 — both engines replay the draw); census by
      // bucket load k: how many buckets hold k types and how much token
      // MASS sits in colliding buckets — the exact signal for sizing a
      // hashing-trick feature space. Vocabulary-sized after one rollup.
      val ws = Tables.spread(s, rd(s, dir, "documents"))
        .select(split(lower(col("text")), " ").as("ws"))
      val uni = ws.select(explode(col("ws")).as("t"))
        .filter(length(col("t")) > 0)
      val bi = ws.select(explode(expr(
          "IF(size(ws) < 2, array(), transform(sequence(1, size(ws) - 1), " +
            "i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1))))"))
          .as("t"))
        .filter(expr("t NOT LIKE ' %' AND t NOT LIKE '% ' AND length(t) > 1"))
      val tf = uni.unionByName(bi)
        .groupBy(col("t")).agg(count(lit(1)).as("freq"))
        .withColumn("bkt", expr(
          "CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT) % 256"))
      val bkts = tf.groupBy(col("bkt"))
        .agg(count(lit(1)).as("n_types"), sum(col("freq")).as("mass"))
      bkts.crossJoin(broadcast(bkts.agg(sum(col("mass")).as("_tot"))))
        .groupBy(col("n_types").as("bucket_load"))
        .agg(count(lit(1)).as("n_buckets"),
             expr("CAST(sum(mass) * 1000000 DIV max(_tot) AS BIGINT)")
               .as("mass_ppm"))
    }),
    "q706_shuffle_skew" -> ((s, dir) => {
      // Shuffle-skew advisor: simulate the 32-way hash partitioning (md5
      // residue — engine-portable, replayed by the oracle) for three
      // candidate shuffle keys and publish max/min partition load and the
      // max/mean skew ratio in ppm — the pre-flight check that tells a
      // 100 TB join whether its key needs salting BEFORE the straggler
      // materializes. One pass per key over the fact table, 32-row state.
      val li = rd(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
        .localCheckpoint(false)
      Seq("l_orderkey", "l_partkey", "l_suppkey").map { k =>
        li.select(lit(k).as("key_col"),
                  expr(s"CAST(conv(substring(md5(CAST($k AS STRING)), 1, 8), " +
                       "16, 10) AS BIGINT) % 32").as("bkt"))
          .groupBy(col("key_col"), col("bkt"))
          .agg(count(lit(1)).as("n"))
          .groupBy(col("key_col"))
          .agg(count(lit(1)).as("n_buckets"), sum(col("n")).as("n_rows"),
               max(col("n")).as("max_load"), min(col("n")).as("min_load"))
          .withColumn("skew_ppm",
            expr("max_load * n_buckets * 1000000 DIV n_rows"))
      }.reduce(_ unionByName _)
    }),
    "q707_shannon_code" -> ((s, dir) => {
      // Shannon code lengths WITHOUT logs: ℓ(s) = min k with cnt·2^k ≥ N
      // (= ⌈log₂ N/cnt⌉, found by integer shift comparison — no float
      // log), per p_type symbol; Kraft mass 1e6/2^ℓ and per-symbol bit
      // contribution published — the entropy-coding sizing op beside the
      // encoding advisor (q689), exact in both engines.
      val sym = rd(s, dir, "part").groupBy(col("p_type").as("symbol"))
        .agg(count(lit(1)).as("cnt"))
      sym.crossJoin(broadcast(sym.agg(sum(col("cnt")).as("_n"))))
        .withColumn("code_len", expr(
          "element_at(filter(sequence(1, 40), k -> " +
            "cnt * shiftleft(1L, k) >= _n), 1)").cast("long"))
        .select(col("symbol"), col("cnt"), col("code_len"),
                expr("cnt * code_len").as("bits_contrib"),
                expr("1000000 DIV shiftleft(1L, CAST(code_len AS INT))")
                  .as("kraft_ppm"))
    }),
    "q708_good_turing" -> ((s, dir) => {
      // Good–Turing discounts from the bigram frequency-of-frequencies:
      // r* = (r+1)·N_{r+1}/N_r in milli plus the raw mass share per count
      // class — the smoothing table an n-gram LM derives before assigning
      // unseen mass (sibling of Chao1 q624, which sizes the unseen
      // VOCABULARY; this prices unseen PROBABILITY). fof is count-grain.
      val ws = Tables.spread(s, rd(s, dir, "documents"))
        .select(split(lower(col("text")), " ").as("ws"))
      val tf = ws.select(explode(expr(
          "IF(size(ws) < 2, array(), transform(sequence(1, size(ws) - 1), " +
            "i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1))))"))
          .as("t"))
        .filter(expr("t NOT LIKE ' %' AND t NOT LIKE '% ' AND length(t) > 1"))
        .groupBy(col("t")).agg(count(lit(1)).as("r"))
      val fof = tf.groupBy(col("r")).agg(count(lit(1)).as("nr"))
        .localCheckpoint(false)
      fof.as("f")
        .join(fof.select(col("r").as("_r2"), col("nr").as("_nr2")).as("f2"),
              col("_r2") === col("r") + 1, "left")
        .crossJoin(broadcast(
          fof.agg(sum(col("r") * col("nr")).as("_ntok"))))
        .filter(col("r") <= 10)
        .select(col("r"), col("nr"),
                expr("coalesce((r + 1) * _nr2 * 1000 DIV nr, 0L)")
                  .as("r_star_milli"),
                expr("r * nr * 1000000 DIV _ntok").as("mass_ppm"))
    }),
    "q709_kanon_ladder" -> ((s, dir) => {
      // k-anonymity generalization ladder: the SAME customer table under
      // three quasi-identifier coarsenings (exact nation + $500 band →
      // nation%5 + $2000 band → suppress + $5000 band); per level: class
      // count, worst k, and the row mass violating k ≥ 5 — the
      // generalization-lattice walk an anonymization pipeline automates
      // (q81 k-anon / q684 l-diversity are single rungs of this ladder).
      val cust = rd(s, dir, "customer")
        .select(col("c_nationkey"), col("c_acctbal")).localCheckpoint(false)
      Seq(
        (0, "CAST(c_nationkey AS STRING)",
         "CAST(CAST(floor(c_acctbal / 500) AS BIGINT) AS STRING)"),
        (1, "CAST(c_nationkey % 5 AS STRING)",
         "CAST(CAST(floor(c_acctbal / 2000) AS BIGINT) AS STRING)"),
        (2, "'any'",
         "CAST(CAST(floor(c_acctbal / 5000) AS BIGINT) AS STRING)")
      ).map { case (lvl, q1, q2) =>
        cust.groupBy(expr(q1).as("qi1"), expr(q2).as("qi2"))
          .agg(count(lit(1)).as("k"))
          .groupBy(lit(lvl.toLong).as("level"))
          .agg(count(lit(1)).as("n_classes"), min(col("k")).as("min_k"),
               sum(when(col("k") < 5, col("k")).otherwise(0L))
                 .as("n_rows_violating_k5"),
               expr("CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) * 1000000 " +
                    "DIV sum(k) AS BIGINT)").as("violation_ppm"))
      }.reduce(_ unionByName _)
    }),
    "q710_int8_quant_audit" -> ((s, dir) => {
      // Int8 symmetric quantization audit for the vector index: per
      // embedding, max-abs scale over milli-quantized dims, truncating
      // int8 codes (Spark DIV == sign-folded oracle //), then the EXACT
      // reconstruction bound max|qv·127 − iv·s| ≤ s, the int-code norm
      // and saturation — the drift audit before an index serves int8
      // distances. Bounded to 64 vectors; all-integer.
      rd(s, dir, "embeddings").filter(col("vec_id") < 64)
        .select(col("vec_id"),
                expr("transform(embedding, x -> " +
                     "CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))")
                  .as("qv"))
        .withColumn("sc", expr(
          "greatest(array_max(transform(qv, x -> abs(x))), 1L)"))
        .withColumn("iv", expr("transform(qv, x -> (x * 127) DIV sc)"))
        .select(col("vec_id"), col("sc").as("scale_milli"),
                expr("array_max(transform(sequence(1, size(qv)), i -> " +
                     "abs(element_at(qv, i) * 127 - element_at(iv, i) * sc)))")
                  .as("max_err_127milli"),
                expr("aggregate(transform(iv, x -> x * x), 0L, " +
                     "(a, b) -> a + b)").as("inorm2"),
                expr("array_max(transform(iv, x -> abs(x)))").as("imax"))
    }),
    "q711_jaro_winkler" -> ((s, dir) => {
      // Jaro–Winkler string similarity, EXACT: the match pass packs both
      // used-bitmasks into one BIGINT (mask1·2²⁰ + mask2) so the
      // sequential greedy matching is a single-value fold both engines
      // replay bit-for-bit (the oracle's list_reduce is only safe on
      // scalar states — the packed encoding exists FOR that constraint);
      // transpositions from the unpacked masks, Jaro as one cross-
      // multiplied ppm, Winkler prefix boost ℓ·(1e6−J)/10. Classic
      // vectors (MARTHA/MARHTA 961110 ppm) pinned in the python
      // reference; vocabulary-sized pair grid, ≥ 0.6 emitted — the ER
      // similarity stage AFTER q697's phonetic blocking.
      // length <= 20 ENFORCED, not assumed: the packed-BIGINT encoding is
      // only valid for tokens up to 20 chars (bit j >= 21 of mask2 would
      // land in mask1's low bits and corrupt both masks IDENTICALLY in
      // both engines — a green gate over a statistically wrong value).
      // TPC-H p_name words satisfy it today; the filter (mirrored in the
      // oracle) turns the assumption into a contract, and the fold itself
      // (round 11: shared with Linkage.jaroWinklerPairs via
      // Linkage.withJaroWinklerPpm) re-asserts it row-level.
      val v = rd(s, dir, "part")
        .select(explode(split(col("p_name"), " ")).as("t"))
        .filter(length(col("t")) > 0 && length(col("t")) <= 20)
        .distinct().localCheckpoint(false)
      val pairs = v.as("a").join(v.as("b"), col("a.t") < col("b.t"))
        .select(col("a.t").as("t1"), col("b.t").as("t2"))
      graft.operators.Linkage.withJaroWinklerPpm(pairs, "t1", "t2")
        .filter(col("m") > 0 && col("jw_ppm") >= 600000)
        .select(col("t1"), col("t2"), col("m"), col("transpositions"),
                col("jaro_ppm"), col("jw_ppm"))
    }),
    "q712_lsh_band_sweep" -> ((s, dir) => {
      // LSH banding-curve sweep: the SAME 12 minhash components re-banded
      // as (2×6, 4×3, 6×2) — the s-curve tuning table (strict→loose) an
      // index operator consults before committing a (b, r) choice at
      // corpus scale. One signature pipeline per config
      // (Dedup.minhashLshBandingStats: candidates + τ=1/2-verified +
      // precision from ONE pass); precision 0-guarded for the strict
      // config's empty candidate set at tiny SFs.
      val docs = Tables.spread(s, rd(s, dir, "documents"))
      Seq((2, 6), (4, 3), (6, 2)).map { case (b, r) =>
        graft.operators.Dedup
          .minhashLshBandingStats(docs, "doc_id", "text", 3, b, r)
          .select(lit(s"b${b}r$r").as("config"), col("n_candidates"),
                  col("n_verified"),
                  expr("CASE WHEN n_candidates = 0 THEN 0L " +
                       "ELSE precision_ppm END").as("precision_ppm"))
      }.reduce(_ unionByName _)
    }),
    "q713_pack_ladder" -> ((s, dir) => {
      // Context-length efficiency ladder: the SAME corpus packed at 512 /
      // 1024 / 2048 token budgets (Packing.packBins, one cumsum window per
      // lang shard each) → bins, packed mass, waste ppm, ≥95%-full bin
      // count per budget — the sizing table behind a training run's
      // context-length choice. Waste can go NEGATIVE (a crossing doc
      // overfills its bin), so the oracle sign-folds its floor-// to match
      // DIV; everything after the per-bin rollup is budget-grain.
      val docs = Tables.spread(s, rd(s, dir, "documents"))
      Seq(512L, 1024L, 2048L).map { b =>
        graft.operators.Packing.packBins(docs, "doc_id", "text", b,
                                         Seq("lang"))
          .agg(count(lit(1)).as("n_bins"),
               sum(col("n_docs")).as("n_docs"),
               sum(col("n_tokens")).as("n_tokens"),
               sum(when(col("fill_ppm") >= 950000, 1L).otherwise(0L))
                 .as("n_full_bins"))
          .select(lit(b).as("budget"), col("n_bins"), col("n_docs"),
                  col("n_tokens"),
                  expr(s"CAST((n_bins * $b - n_tokens) * 1000000 DIV " +
                       s"(n_bins * $b) AS BIGINT)").as("waste_ppm"),
                  col("n_full_bins"))
      }.reduce(_ unionByName _)
    }),
    "q681_container_sniff" -> ((s, dir) => {
      // Mixed-corpus container sniffing (round-9 verdict ask): doc_id%5
      // rotates PNG / JPEG / WAV / MP4 / raw-text blobs, every 31st media
      // row truncated to 12 bytes (magic intact, header gone). The
      // batched mapPartitions pass dispatches on MAGIC BYTES ONLY;
      // unknown and corrupt rows DEGRADE to parse_ok=0 metadata rows —
      // one bad blob in a 100 TB corpus must not kill the scan. The
      // oracle recomputes format, ok-flag, and every header field from
      // the text-derived build formulas independently.
      graft.operators.Multimodal.sniffFeaturesFromMixedDocs(
        Tables.spread(s, rd(s, dir, "documents")))
    }))

  private val JlSignSql = (p: Int) =>
    s"(1 - 2 * CAST(('0x' || substr(md5('$p-' || CAST(i AS VARCHAR)), 1, 8))::UBIGINT % 2 AS BIGINT))"

  /** Trade-arc CTE (canonical src<dst nation pairs with shipment count ≥
    * `thr`), the DuckDB mirror of [[R13Queries.tradeArcs]].
    */
  private def tradeCte(name: String, thr: Long): String =
    s"""$name AS MATERIALIZED (
       |  SELECT CAST(least(c.c_nationkey, s.s_nationkey) AS BIGINT) AS src,
       |    CAST(greatest(c.c_nationkey, s.s_nationkey) AS BIGINT) AS dst,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |  WHERE c.c_nationkey <> s.s_nationkey
       |  GROUP BY 1, 2 HAVING count(*) >= $thr)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q682_stream_versioned_sink" ->
      s"""WITH ${SparkEntry.SrcCte},
         |slice AS (SELECT * FROM src WHERE user_id < 40),
         |hist AS (
         |  WITH ${SparkEntry.scd2FullSql(SparkEntry.AllCheck,
                                          deletes = false, from = "slice")}
         |)
         |SELECT CAST(1 AS BIGINT) AS replay_skipped,
         |  CAST(0 AS BIGINT) AS extra_versions_from_replay,
         |  CAST(count(*) AS BIGINT) AS n_history_rows,
         |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_keys,
         |  CAST(sum(CASE WHEN _is_current THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_current
         |FROM hist""".stripMargin,
    "q683_kaplan_meier" ->
      s"""WITH RECURSIVE ${SparkEntry.SrcCte},
         |life AS (SELECT user_id,
         |    CAST(min(ts) AS DATE) AS first_day,
         |    CAST(min(CASE WHEN event_type = 'error' AND event_id % 13 = 0
         |             THEN ts END) AS DATE) AS err_day,
         |    CAST(max(ts) AS DATE) AS last_day
         |  FROM src GROUP BY 1),
         |subj AS (SELECT
         |    CAST(date_diff('day', first_day, coalesce(err_day, last_day))
         |      AS BIGINT) AS dur,
         |    CASE WHEN err_day IS NULL THEN 1 ELSE 0 END AS censored
         |  FROM life),
         |perT AS (SELECT dur AS t, CAST(count(*) AS BIGINT) AS n_all,
         |    CAST(sum(CASE WHEN censored = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS d
         |  FROM subj GROUP BY 1),
         |tot AS (SELECT CAST(sum(n_all) AS BIGINT) AS total FROM perT),
         |ladder AS (SELECT t, CAST(total - coalesce(sum(n_all) OVER (ORDER BY t
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS n_at_risk, d
         |  FROM perT, tot),
         |rk AS (SELECT t, n_at_risk, d, row_number() OVER (ORDER BY t) AS i
         |  FROM ladder WHERE d > 0),
         |fold(i, s) AS (
         |  SELECT 0, CAST(1000000 AS BIGINT)
         |  UNION ALL
         |  SELECT r.i, f.s * (r.n_at_risk - r.d) // r.n_at_risk
         |  FROM fold f JOIN rk r ON r.i = f.i + 1)
         |SELECT r.t, r.n_at_risk, r.d AS n_events, f.s AS s_ppm
         |FROM rk r JOIN fold f ON f.i = r.i""".stripMargin,
    "q684_l_diversity" ->
      """WITH c AS (SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
        |    c_mktsegment AS mktsegment,
        |    CAST(floor(c_acctbal / 2000) AS BIGINT) AS sv
        |  FROM customer),
        |cell AS (SELECT nationkey, mktsegment, sv,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM c GROUP BY 1, 2, 3)
        |SELECT nationkey, mktsegment,
        |  CAST(sum(n) AS BIGINT) AS class_size,
        |  CAST(count(*) AS BIGINT) AS n_distinct_sensitive,
        |  count(*) >= 5 AS meets_l
        |FROM cell GROUP BY 1, 2""".stripMargin,
    "q685_fd_strength" ->
      Seq(("lineitem JOIN orders ON l_orderkey = o_orderkey",
           "l_orderkey", "o_orderdate"),
          ("lineitem JOIN orders ON l_orderkey = o_orderkey",
           "l_orderkey", "l_tax"),
          ("part", "p_type", "p_size"),
          ("customer", "c_nationkey", "c_mktsegment")).map {
        case (t, a, b) =>
          s"""SELECT '$a->$b' AS fd, CAST(sum(ng) AS BIGINT) AS n_rows,
             |  CAST(count(*) AS BIGINT) AS n_lhs_groups,
             |  CAST(sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_violating_groups,
             |  CAST(sum(ng) - sum(maj) AS BIGINT) AS g3_rows,
             |  CAST((sum(ng) - sum(maj)) * 1000000 // sum(ng) AS BIGINT)
             |    AS g3_ppm
             |FROM (SELECT a, sum(n) AS ng, max(n) AS maj, count(*) AS nb
             |  FROM (SELECT $a AS a, $b AS b, CAST(count(*) AS BIGINT) AS n
             |        FROM $t GROUP BY 1, 2) GROUP BY 1)""".stripMargin
      }.mkString("\nUNION ALL\n"),
    "q686_jl_distortion" ->
      s"""WITH q AS (SELECT vec_id,
         |    list_transform(embedding, x ->
         |      CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
         |  FROM embeddings WHERE vec_id < 48),
         |proj AS (SELECT vec_id, qv,
         |${(0 until 4).map(p =>
            s"  list_sum(list_transform(generate_series(0, 63), i ->\n" +
            s"    ${JlSignSql(p)} * qv[i + 1])) AS p$p").mkString(",\n")}
         |FROM q)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  CAST(list_sum(list_transform(generate_series(1, 64), i ->
         |    (a.qv[i] - b.qv[i]) * (a.qv[i] - b.qv[i]))) AS BIGINT) AS dist2,
         |  CAST(${(0 until 4).map(p =>
              s"(a.p$p - b.p$p) * (a.p$p - b.p$p)").mkString(" + ")}
         |    AS BIGINT) AS proj_dist2,
         |  CAST((${(0 until 4).map(p =>
              s"(a.p$p - b.p$p) * (a.p$p - b.p$p)").mkString(" + ")})
         |    * 1000000 // (4 * greatest(list_sum(list_transform(
         |        generate_series(1, 64), i ->
         |        (a.qv[i] - b.qv[i]) * (a.qv[i] - b.qv[i]))), 1))
         |    AS BIGINT) AS distortion_ppm
         |FROM proj a JOIN proj b ON a.vec_id < b.vec_id""".stripMargin,
    "q687_edge_betweenness" ->
      """WITH RECURSIVE e0 AS MATERIALIZED (
        |  SELECT CAST(least(c.c_nationkey, s.s_nationkey) AS BIGINT)
        |      AS src,
        |    CAST(greatest(c.c_nationkey, s.s_nationkey) AS BIGINT) AS dst
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE c.c_nationkey <> s.s_nationkey
        |  GROUP BY 1, 2 HAVING count(*) >= 300),
        |sym AS MATERIALIZED (SELECT src, dst FROM e0
        |  UNION ALL SELECT dst, src FROM e0),
        |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM sym),
        |roots AS MATERIALIZED (SELECT node AS root FROM nodes
        |  ORDER BY md5('bc-root-' || CAST(node AS VARCHAR)), node LIMIT 6),
        |walks(root, node, hop) AS (
        |  SELECT root, root, 0 FROM roots
        |  UNION ALL
        |  SELECT w.root, s.dst, w.hop + 1 FROM walks w
        |  JOIN sym s ON w.node = s.src WHERE w.hop < 6),
        |dmin AS (SELECT root, node, min(hop) AS d FROM walks GROUP BY 1, 2),
        |sig AS MATERIALIZED (SELECT w.root, w.node, d.d,
        |    CAST(count(*) AS BIGINT) AS sigma
        |  FROM walks w JOIN dmin d ON d.root = w.root AND d.node = w.node
        |    AND w.hop = d.d
        |  GROUP BY 1, 2, 3),
        |nk AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM nodes) AS nt,
        |           (SELECT CAST(count(*) AS BIGINT) FROM roots) AS np),
        |part AS (SELECT least(e.src, e.dst) AS u, greatest(e.src, e.dst) AS v,
        |    CAST(sum(CAST(a.sigma AS HUGEINT) * b.sigma * 1000000
        |             // st.sigma) AS HUGEINT) AS partial,
        |    CAST(count(*) AS BIGINT) AS n_pairs_routed
        |  FROM sym e
        |  JOIN sig a ON a.node = e.src
        |  JOIN sig b ON b.node = e.dst AND b.root <> a.root
        |  JOIN sig st ON st.root = a.root AND st.node = b.root
        |  WHERE a.d + 1 = st.d - b.d
        |  GROUP BY 1, 2)
        |SELECT u AS src, v AS dst,
        |  CAST(partial * (nt * (nt - 1)) // (np * (np - 1)) AS BIGINT)
        |    AS eb_est_ppm,
        |  n_pairs_routed
        |FROM part, nk""".stripMargin,
    "q688_conductance" ->
      """WITH e0 AS (
        |  SELECT CAST(least(c.c_nationkey, s.s_nationkey) AS BIGINT)
        |      AS src,
        |    CAST(greatest(c.c_nationkey, s.s_nationkey) AS BIGINT) AS dst
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE c.c_nationkey <> s.s_nationkey
        |  GROUP BY 1, 2 HAVING count(*) >= 110),
        |sym AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
        |reg AS (SELECT CAST(n_nationkey AS BIGINT) AS node, r_name
        |  FROM nation JOIN region ON n_regionkey = r_regionkey),
        |arcs AS (SELECT s.src, s.dst, rs.r_name AS r_src, rd.r_name AS r_dst
        |  FROM sym s JOIN reg rs ON rs.node = s.src
        |  JOIN reg rd ON rd.node = s.dst),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS m_arcs FROM arcs),
        |byr AS (SELECT r_src AS r_name, CAST(count(*) AS BIGINT) AS vol,
        |    CAST(sum(CASE WHEN r_src <> r_dst THEN 1 ELSE 0 END) AS BIGINT)
        |      AS cut
        |  FROM arcs GROUP BY 1),
        |nn AS (SELECT rs.r_name, CAST(count(*) AS BIGINT) AS n_nodes
        |  FROM (SELECT DISTINCT src FROM sym) s
        |  JOIN reg rs ON rs.node = s.src GROUP BY 1)
        |SELECT b.r_name, nn.n_nodes, b.vol, b.cut,
        |  CAST(b.cut * 1000000 // greatest(least(b.vol, m.m_arcs - b.vol), 1)
        |    AS BIGINT) AS conductance_ppm
        |FROM byr b JOIN nn ON nn.r_name = b.r_name, m""".stripMargin,
    "q689_encoding_advisor" ->
      Seq("l_returnflag", "l_linestatus", "l_tax").map { c =>
        s"""SELECT '$c' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS ndv,
           |  CAST(sum(brk) AS BIGINT) AS n_runs,
           |  CAST(count(DISTINCT $c) * 1000000 // count(*) AS BIGINT)
           |    AS dict_ppm,
           |  CAST(sum(brk) * 1000000 // count(*) AS BIGINT) AS rle_ppm
           |FROM (SELECT $c, CASE WHEN lag($c) OVER (
           |    PARTITION BY l_orderkey ORDER BY l_linenumber, $c)
           |    IS DISTINCT FROM $c THEN 1 ELSE 0 END AS brk
           |  FROM lineitem)""".stripMargin
      }.mkString("\nUNION ALL\n"),
    "q690_prefix_compress" ->
      """WITH s AS (SELECT p_brand, p_name,
        |    lag(p_name) OVER (PARTITION BY p_brand
        |      ORDER BY p_name, p_partkey) AS prev
        |  FROM part),
        |l AS (SELECT p_brand, length(p_name) AS ln,
        |    CASE WHEN prev IS NULL THEN 0
        |         ELSE coalesce(list_sum(list_transform(
        |            generate_series(1, least(length(prev), length(p_name))),
        |            k -> CASE WHEN substr(prev, 1, k) = substr(p_name, 1, k)
        |                 THEN 1 ELSE 0 END)), 0) END AS lcp
        |  FROM s)
        |SELECT p_brand, CAST(count(*) AS BIGINT) AS n_names,
        |  CAST(sum(lcp) AS BIGINT) AS sum_lcp,
        |  CAST(sum(ln) AS BIGINT) AS sum_len,
        |  CAST(sum(lcp) * 1000000 // sum(ln) AS BIGINT) AS lcp_ppm
        |FROM l GROUP BY 1""".stripMargin,
    "q680_betweenness_sampled" ->
      """WITH RECURSIVE e0 AS MATERIALIZED (
        |  SELECT CAST(least(c.c_nationkey, s.s_nationkey) AS BIGINT)
        |      AS src,
        |    CAST(greatest(c.c_nationkey, s.s_nationkey) AS BIGINT) AS dst
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE c.c_nationkey <> s.s_nationkey
        |  GROUP BY 1, 2 HAVING count(*) >= 300),
        |sym AS MATERIALIZED (SELECT src, dst FROM e0
        |  UNION ALL SELECT dst, src FROM e0),
        |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM sym),
        |roots AS MATERIALIZED (SELECT node AS root FROM nodes
        |  ORDER BY md5('bc-root-' || CAST(node AS VARCHAR)), node LIMIT 6),
        |walks(root, node, hop) AS (
        |  SELECT root, root, 0 FROM roots
        |  UNION ALL
        |  SELECT w.root, s.dst, w.hop + 1 FROM walks w
        |  JOIN sym s ON w.node = s.src WHERE w.hop < 6),
        |dmin AS (SELECT root, node, min(hop) AS d FROM walks GROUP BY 1, 2),
        |sig AS MATERIALIZED (SELECT w.root, w.node, d.d,
        |    CAST(count(*) AS BIGINT) AS sigma
        |  FROM walks w JOIN dmin d ON d.root = w.root AND d.node = w.node
        |    AND w.hop = d.d
        |  GROUP BY 1, 2, 3),
        |nk AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM nodes) AS nt,
        |           (SELECT CAST(count(*) AS BIGINT) FROM roots) AS np),
        |part AS (SELECT a.node AS node,
        |    CAST(sum(CAST(a.sigma AS HUGEINT) * b.sigma * 1000000
        |             // st.sigma) AS HUGEINT) AS partial,
        |    CAST(count(*) AS BIGINT) AS n_pairs_routed
        |  FROM sig a
        |  JOIN sig b ON b.node = a.node AND b.root <> a.root
        |  JOIN sig st ON st.root = a.root AND st.node = b.root
        |  WHERE a.node <> a.root AND a.node <> b.root AND a.d + b.d = st.d
        |  GROUP BY 1)
        |SELECT node,
        |  CAST(partial * (nt * (nt - 1)) // (np * (np - 1)) AS BIGINT)
        |    AS bc_est_ppm,
        |  n_pairs_routed
        |FROM part, nk""".stripMargin,
    "q691_jackknife_ratio" ->
      """WITH li AS (
        |  SELECT c.c_nationkey AS nk,
        |    CAST(floor(l_extendedprice * 100) AS BIGINT)
        |      * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev,
        |    CAST(l_quantity AS BIGINT) AS qty
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey),
        |g AS (SELECT CAST(nk AS BIGINT) AS nationkey,
        |    CAST(sum(rev) AS BIGINT) AS r_i, CAST(sum(qty) AS BIGINT) AS q_i,
        |    CAST(count(*) AS BIGINT) AS n_rows
        |  FROM li GROUP BY 1),
        |tot AS (SELECT CAST(sum(r_i) AS HUGEINT) AS r_tot,
        |    CAST(sum(q_i) AS HUGEINT) AS q_tot,
        |    CAST(count(*) AS BIGINT) AS n_g FROM g)
        |SELECT nationkey, n_rows,
        |  CAST(r_tot * 1000000 // q_tot AS BIGINT) AS full_ratio_ppm,
        |  CAST((r_tot - r_i) * 1000000 // (q_tot - q_i) AS BIGINT)
        |    AS loo_ratio_ppm,
        |  CAST(n_g * (r_tot * 1000000 // q_tot)
        |       - (n_g - 1) * ((r_tot - r_i) * 1000000 // (q_tot - q_i))
        |       AS BIGINT) AS pseudo_ppm
        |FROM g, tot""".stripMargin,
    "q692_allen_relations" ->
      """WITH iv AS (
        |  SELECT l_orderkey AS ok, l_linenumber AS ln, l_shipdate AS s,
        |    CAST(l_shipdate
        |         + INTERVAL (1 + CAST(l_quantity AS BIGINT) % 14) DAY
        |         AS DATE) AS e
        |  FROM lineitem),
        |pr AS (SELECT a.s AS s1, a.e AS e1, b.s AS s2, b.e AS e2
        |  FROM iv a JOIN iv b ON a.ok = b.ok AND a.ln < b.ln)
        |SELECT CASE
        |    WHEN e1 < s2 THEN 'precedes' WHEN e1 = s2 THEN 'meets'
        |    WHEN s1 = s2 AND e1 = e2 THEN 'equals'
        |    WHEN s1 = s2 AND e1 < e2 THEN 'starts'
        |    WHEN s1 = s2 AND e1 > e2 THEN 'started_by'
        |    WHEN e1 = e2 AND s1 < s2 THEN 'finished_by'
        |    WHEN e1 = e2 AND s1 > s2 THEN 'finishes'
        |    WHEN s1 < s2 AND e1 > e2 THEN 'contains'
        |    WHEN s1 > s2 AND e1 < e2 THEN 'during'
        |    WHEN s1 < s2 AND e1 > s2 AND e1 < e2 THEN 'overlaps'
        |    WHEN s2 < s1 AND e2 > s1 AND e2 < e1 THEN 'overlapped_by'
        |    WHEN e2 < s1 THEN 'preceded_by' ELSE 'met_by' END AS relation,
        |  CAST(count(*) AS BIGINT) AS n_pairs
        |FROM pr GROUP BY 1""".stripMargin,
    "q693_interval_stabbing" ->
      """WITH iv AS (
        |  SELECT l_shipdate AS st,
        |    CAST(l_shipdate
        |         + INTERVAL (1 + CAST(l_quantity AS BIGINT) % 14) DAY
        |         AS DATE) AS en
        |  FROM lineitem),
        |ev AS (
        |  SELECT st AS d, 1 AS delta FROM iv
        |  UNION ALL SELECT en + 1, -1 FROM iv),
        |byd AS (SELECT d, sum(delta) AS dl FROM ev GROUP BY 1),
        |run AS (SELECT d, CAST(sum(dl) OVER (ORDER BY d) AS BIGINT) AS open_n
        |  FROM byd)
        |SELECT CAST(date_trunc('month', d) AS DATE) AS month,
        |  CAST(max(open_n) AS BIGINT) AS max_open,
        |  CAST(arg_min(open_n, d) AS BIGINT) AS open_at_first_change,
        |  CAST(count(*) AS BIGINT) AS n_change_days
        |FROM run GROUP BY 1""".stripMargin,
    "q694_arc_elasticity" ->
      """WITH bm AS (
        |  SELECT p.p_brand, CAST(date_trunc('month', l_shipdate) AS DATE)
        |      AS month,
        |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
        |      AS BIGINT) AS a1,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q1
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1, 2),
        |lagd AS (SELECT p_brand, month, a1, q1,
        |    lag(a1) OVER (PARTITION BY p_brand ORDER BY month) AS a0,
        |    lag(q1) OVER (PARTITION BY p_brand ORDER BY month) AS q0
        |  FROM bm),
        |nd AS (SELECT p_brand, month, q0, q1,
        |    CAST(q1 - q0 AS HUGEINT)
        |      * (CAST(a1 AS HUGEINT) * q0 + CAST(a0 AS HUGEINT) * q1)
        |      * 1000000 AS num,
        |    CAST(q1 + q0 AS HUGEINT)
        |      * (CAST(a1 AS HUGEINT) * q0 - CAST(a0 AS HUGEINT) * q1) AS den
        |  FROM lagd WHERE a0 IS NOT NULL)
        |SELECT p_brand, month, q0, q1,
        |  CASE WHEN den = 0 THEN CAST(0 AS BIGINT)
        |       WHEN (num < 0) <> (den < 0)
        |         THEN CAST(-(abs(num) // abs(den)) AS BIGINT)
        |       ELSE CAST(abs(num) // abs(den) AS BIGINT) END
        |    AS elasticity_ppm
        |FROM nd""".stripMargin,
    "q695_topo_levels" -> {
      val sweeps = (0 until 24).map { k =>
        s"""lvl${k + 1} AS MATERIALIZED (
           |  SELECT n.node, greatest(n.lvl, coalesce(p.m, 0)) AS lvl
           |  FROM lvl$k n LEFT JOIN (
           |    SELECT e.dst AS node, max(u.lvl + 1) AS m
           |    FROM e0 e JOIN lvl$k u ON u.node = e.src GROUP BY 1) p
           |  ON p.node = n.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${tradeCte("e0", 40L)},
         |lvl0 AS MATERIALIZED (SELECT src AS node, 0 AS lvl FROM e0
         |  UNION SELECT dst, 0 FROM e0),
         |$sweeps,
         |deg AS (SELECT node, CAST(sum(i) AS BIGINT) AS in_deg,
         |    CAST(sum(o) AS BIGINT) AS out_deg
         |  FROM (SELECT src AS node, 1 AS o, 0 AS i FROM e0
         |        UNION ALL SELECT dst, 0, 1 FROM e0) GROUP BY 1)
         |SELECT l.node, CAST(l.lvl AS BIGINT) AS level, d.in_deg, d.out_deg
         |FROM lvl24 l JOIN deg d ON d.node = l.node""".stripMargin
    },
    "q696_eulerian_census" ->
      Seq(12L, 40L, 110L, 300L).map { t =>
        val sweeps = (0 until 24).map { k =>
          s"""lb${k + 1} AS MATERIALIZED (
             |  SELECT n.node, least(n.lbl, coalesce(p.m, n.lbl)) AS lbl
             |  FROM lb$k n LEFT JOIN (
             |    SELECT s2.dst AS node, min(u.lbl) AS m
             |    FROM sym s2 JOIN lb$k u ON u.node = s2.src GROUP BY 1) p
             |  ON p.node = n.node)""".stripMargin
        }.mkString(",\n")
        s"""SELECT * FROM (WITH ${tradeCte("e0", t)},
           |sym AS MATERIALIZED (SELECT src, dst FROM e0
           |  UNION ALL SELECT dst, src FROM e0),
           |lb0 AS MATERIALIZED (SELECT src AS node, src AS lbl FROM e0
           |  UNION SELECT dst, dst FROM e0),
           |$sweeps,
           |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS d
           |  FROM sym GROUP BY 1)
           |SELECT CAST($t AS BIGINT) AS threshold, l.lbl AS component,
           |  CAST(count(*) AS BIGINT) AS n_nodes,
           |  CAST(sum(d.d) / 2 AS BIGINT) AS n_edges,
           |  CAST(sum(CASE WHEN d.d % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_odd,
           |  CASE WHEN sum(CASE WHEN d.d % 2 = 1 THEN 1 ELSE 0 END) = 0
           |       THEN 'circuit'
           |       WHEN sum(CASE WHEN d.d % 2 = 1 THEN 1 ELSE 0 END) = 2
           |       THEN 'path' ELSE 'none' END AS euler_class
           |FROM lb24 l JOIN deg d ON d.node = l.node GROUP BY 1, 2)""".stripMargin
      }.mkString("\nUNION ALL\n"),
    "q697_soundex_blocking" -> {
      val code = (x: String) =>
        s"CASE WHEN $x IN ('B','F','P','V') THEN '1' " +
          s"WHEN $x IN ('C','G','J','K','Q','S','X','Z') THEN '2' " +
          s"WHEN $x IN ('D','T') THEN '3' WHEN $x = 'L' THEN '4' " +
          s"WHEN $x IN ('M','N') THEN '5' WHEN $x = 'R' THEN '6' " +
          s"ELSE '0' END"
      s"""WITH tok AS (SELECT DISTINCT unnest(string_split(p_name, ' ')) AS t
         |  FROM part),
         |ch AS (SELECT t, upper(t) AS u FROM tok WHERE length(t) > 0),
         |folded AS (SELECT t, u,
         |  list_reduce(
         |    list_transform(generate_series(1, length(u)), i -> substr(u, i, 1)),
         |    (st, c) -> ${code("c")} ||
         |      CASE WHEN ${code("c")} = substr(st, 1, 1) THEN substr(st, 2)
         |           ELSE substr(st, 2) || ${code("c")} END) AS enc
         |  FROM ch)
         |SELECT substr(u, 1, 1) ||
         |    substr(rpad(replace(substr(enc, 2), '0', ''), 3, '0'), 1, 3)
         |    AS code,
         |  CAST(count(*) AS BIGINT) AS n_tokens, min(t) AS sample_token
         |FROM folded GROUP BY 1""".stripMargin
    },
    "q698_apriori_triples" ->
      """WITH bk AS (SELECT DISTINCT l_orderkey AS ok, p_brand AS b
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |n AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_orders FROM bk),
        |l2 AS (SELECT a.b AS b1, b.b AS b2
        |  FROM bk a JOIN bk b ON a.ok = b.ok AND a.b < b.b
        |  GROUP BY 1, 2
        |  HAVING count(*) * 250 >= (SELECT n_orders FROM n)),
        |cand AS (SELECT p.b1, p.b2, q.b2 AS b3
        |  FROM l2 p JOIN l2 q ON p.b1 = q.b1 AND p.b2 < q.b2
        |  JOIN l2 r2 ON r2.b1 = p.b2 AND r2.b2 = q.b2)
        |SELECT c3.b1, c3.b2, c3.b3, CAST(count(*) AS BIGINT) AS support,
        |  CAST(count(*) * 1000000 // (SELECT n_orders FROM n) AS BIGINT)
        |    AS support_ppm
        |FROM cand c3
        |JOIN bk x ON x.b = c3.b1
        |JOIN bk y ON y.ok = x.ok AND y.b = c3.b2
        |JOIN bk z ON z.ok = x.ok AND z.b = c3.b3
        |GROUP BY 1, 2, 3
        |HAVING count(*) * 250 >= (SELECT n_orders FROM n)""".stripMargin,
    "q699_croston" ->
      """WITH RECURSIVE d0 AS (
        |  SELECT pt.p_brand AS ctr,
        |    CAST((year(l_shipdate) - 1995) * 12 + month(l_shipdate) AS INT)
        |      AS mi,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS d
        |  FROM lineitem l JOIN part pt ON l.l_partkey = pt.p_partkey
        |  WHERE pt.p_partkey % 97 = 0
        |  GROUP BY 1, 2),
        |mts AS (SELECT unnest(generate_series(
        |    CAST((year(min(l_shipdate)) - 1995) * 12 + month(min(l_shipdate))
        |      AS INT),
        |    CAST((year(max(l_shipdate)) - 1995) * 12 + month(max(l_shipdate))
        |      AS INT))) AS mi
        |  FROM lineitem),
        |ctrs AS (SELECT DISTINCT ctr FROM d0),
        |cal AS (SELECT c2.ctr, m.mi,
        |    row_number() OVER (PARTITION BY c2.ctr ORDER BY m.mi) AS i,
        |    coalesce(d0.d, 0) AS d
        |  FROM ctrs c2 CROSS JOIN mts m
        |  LEFT JOIN d0 ON d0.ctr = c2.ctr AND d0.mi = m.mi),
        |n AS (SELECT max(i) AS nmax FROM cal),
        |st(ctr, i, init, z, zp, q) AS (
        |  SELECT ctr, 0, 0, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
        |    CAST(0 AS BIGINT) FROM ctrs
        |  UNION ALL
        |  SELECT s.ctr, r.i,
        |    CASE WHEN r.d > 0 THEN 1 ELSE s.init END,
        |    CASE WHEN r.d > 0 AND s.init = 0 THEN r.d * 1000
        |         WHEN r.d > 0 THEN s.z + (CASE WHEN r.d * 1000 - s.z >= 0
        |              THEN (r.d * 1000 - s.z) // 10
        |              ELSE -((s.z - r.d * 1000) // 10) END)
        |         ELSE s.z END,
        |    CASE WHEN r.d > 0 AND s.init = 0 THEN (s.q + 1) * 1000
        |         WHEN r.d > 0 THEN s.zp + (CASE WHEN (s.q + 1) * 1000 - s.zp >= 0
        |              THEN ((s.q + 1) * 1000 - s.zp) // 10
        |              ELSE -((s.zp - (s.q + 1) * 1000) // 10) END)
        |         ELSE s.zp END,
        |    CASE WHEN r.d > 0 THEN 0 ELSE s.q + 1 END
        |  FROM st s JOIN cal r ON r.ctr = s.ctr AND r.i = s.i + 1)
        |SELECT s.ctr AS brand, s.z AS z_milli, s.zp AS p_milli,
        |  CASE WHEN s.zp > 0 THEN s.z * 1000 // s.zp ELSE CAST(0 AS BIGINT)
        |    END AS forecast_milli,
        |  agg.n_months, agg.n_demand
        |FROM st s
        |JOIN (SELECT ctr, CAST(count(*) AS BIGINT) AS n_months,
        |      CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |        AS n_demand
        |      FROM cal GROUP BY 1) agg ON agg.ctr = s.ctr
        |WHERE s.i = (SELECT nmax FROM n)""".stripMargin,
    "q700_knapsack_budget" ->
      """WITH RECURSIVE it0 AS (SELECT doc_id, n_chars,
        |    md5('ks-' || CAST(doc_id AS VARCHAR)) AS rk
        |  FROM documents ORDER BY rk, doc_id LIMIT 24),
        |it AS MATERIALIZED (SELECT
        |    row_number() OVER (ORDER BY rk, doc_id) AS i,
        |    CAST(1 + n_chars % 8 AS BIGINT) AS w,
        |    CAST(1 + doc_id % 97 AS BIGINT) AS v FROM it0),
        |st(i, dp) AS (
        |  SELECT 0, list_transform(generate_series(0, 40),
        |    x -> CAST(0 AS BIGINT))
        |  UNION ALL
        |  SELECT r.i, list_transform(generate_series(0, 40), j ->
        |    CASE WHEN j >= r.w
        |         THEN greatest(f.dp[j + 1], f.dp[j - CAST(r.w AS INT) + 1] + r.v)
        |         ELSE f.dp[j + 1] END)
        |  FROM st f JOIN it r ON r.i = f.i + 1)
        |SELECT CAST(g.j AS BIGINT) AS capacity,
        |  CAST(dp[g.j + 1] AS BIGINT) AS best_value
        |FROM st, generate_series(0, 40) AS g(j)
        |WHERE i = (SELECT max(i) FROM it)""".stripMargin,
    "q701_dtw_regions" ->
      """WITH RECURSIVE rm AS (
        |  SELECT r.r_name, CAST(month(l_shipdate) AS INT) AS m,
        |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) // 100000
        |      AS BIGINT) AS val
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer cu ON o.o_custkey = cu.c_custkey
        |  JOIN nation n ON cu.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  WHERE year(l_shipdate) = 1995
        |  GROUP BY 1, 2),
        |cal AS (SELECT r_name, g.m
        |  FROM (SELECT DISTINCT r_name FROM rm), generate_series(1, 12)
        |    AS g(m)),
        |dense AS (SELECT c2.r_name, c2.m, coalesce(rm.val, 0) AS val
        |  FROM cal c2 LEFT JOIN rm ON rm.r_name = c2.r_name AND rm.m = c2.m),
        |arr AS (SELECT r_name, list(val ORDER BY m) AS a FROM dense
        |  GROUP BY 1),
        |pairs AS MATERIALIZED (SELECT x.r_name AS r1, y.r_name AS r2,
        |    x.a AS a, y.a AS b
        |  FROM arr x JOIN arr y ON x.r_name < y.r_name),
        |st(r1, r2, k, prev, prev2) AS (
        |  SELECT r1, r2, 2, [abs(a[1] - b[1])], CAST([] AS BIGINT[])
        |  FROM pairs
        |  UNION ALL
        |  SELECT s.r1, s.r2, s.k + 1,
        |    list_transform(generate_series(greatest(1, s.k + 1 - 12),
        |                                   least(12, s.k)), i ->
        |      abs(p.a[i] - p.b[s.k + 1 - i]) + least(
        |        CASE WHEN i - 1 - greatest(1, s.k - 12) + 1
        |               BETWEEN 1 AND len(s.prev)
        |             THEN s.prev[i - 1 - greatest(1, s.k - 12) + 1]
        |             ELSE 1000000000000 END,
        |        CASE WHEN i - greatest(1, s.k - 12) + 1
        |               BETWEEN 1 AND len(s.prev)
        |             THEN s.prev[i - greatest(1, s.k - 12) + 1]
        |             ELSE 1000000000000 END,
        |        CASE WHEN i - 1 - greatest(1, s.k - 1 - 12) + 1
        |               BETWEEN 1 AND len(s.prev2)
        |             THEN s.prev2[i - 1 - greatest(1, s.k - 1 - 12) + 1]
        |             ELSE 1000000000000 END)),
        |    s.prev
        |  FROM st s JOIN pairs p ON p.r1 = s.r1 AND p.r2 = s.r2
        |  WHERE s.k < 24)
        |SELECT s.r1, s.r2, CAST(s.prev[1] AS BIGINT) AS dtw_units,
        |  CAST(list_sum(list_transform(generate_series(1, 12), i ->
        |    abs(p.a[i] - p.b[i]))) AS BIGINT) AS lockstep_units
        |FROM st s JOIN pairs p ON p.r1 = s.r1 AND p.r2 = s.r2
        |WHERE s.k = 24""".stripMargin,
    "q702_window_funnel" ->
      s"""WITH RECURSIVE ${SparkEntry.SrcCte},
         |ev AS (
         |  SELECT user_id, epoch_us(ts) AS us,
         |    CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
         |         WHEN 'purchase' THEN 3 ELSE 0 END AS stp,
         |    event_id
         |  FROM src
         |  WHERE event_type IN ('view', 'click', 'purchase')),
         |rk AS MATERIALIZED (SELECT user_id, us, stp,
         |    row_number() OVER (PARTITION BY user_id ORDER BY us, event_id)
         |      AS i
         |  FROM ev),
         |users AS (SELECT DISTINCT user_id FROM rk),
         |st(user_id, i, s1, s2, s3) AS (
         |  SELECT user_id, 0, CAST(4102444800000000 AS BIGINT),
         |    CAST(4102444800000000 AS BIGINT), CAST(4102444800000000 AS BIGINT)
         |  FROM users
         |  UNION ALL
         |  SELECT s.user_id, r.i,
         |    CASE WHEN r.stp = 1 THEN least(s.s1, r.us) ELSE s.s1 END,
         |    CASE WHEN r.stp = 2 AND s.s1 < 4102444800000000
         |              AND r.us - s.s1 <= 604800000000
         |         THEN least(s.s2, s.s1) ELSE s.s2 END,
         |    CASE WHEN r.stp = 3 AND s.s2 < 4102444800000000
         |              AND r.us - s.s2 <= 604800000000
         |         THEN least(s.s3, s.s2) ELSE s.s3 END
         |  FROM st s JOIN rk r ON r.user_id = s.user_id AND r.i = s.i + 1)
         |SELECT s.user_id,
         |  CAST(CASE WHEN s.s3 < 4102444800000000 THEN 3
         |       WHEN s.s2 < 4102444800000000 THEN 2
         |       WHEN s.s1 < 4102444800000000 THEN 1 ELSE 0 END AS BIGINT)
         |    AS funnel_level,
         |  agg.n_events
         |FROM st s
         |JOIN (SELECT user_id, max(i) AS mi, CAST(count(*) AS BIGINT)
         |        AS n_events
         |      FROM rk GROUP BY 1) agg
         |  ON agg.user_id = s.user_id AND agg.mi = s.i""".stripMargin,
    "q703_vopt_histogram" ->
      """WITH RECURSIVE g AS (
        |  SELECT CAST(floor(o_totalprice * 100) AS BIGINT) // 1000 AS v
        |  FROM orders),
        |b AS (SELECT min(v) AS lo, max(v) AS hi FROM g),
        |mb AS (SELECT least(CAST(((v - lo) * 24) //
        |    greatest(hi - lo + 1, 1) AS INT), 23) AS cell, v FROM g, b),
        |cells AS (SELECT g2.i AS cell, coalesce(n, 0) AS n,
        |    coalesce(s, 0) AS s, coalesce(ss, 0) AS ss
        |  FROM generate_series(0, 23) AS g2(i)
        |  LEFT JOIN (SELECT cell, CAST(count(*) AS BIGINT) AS n,
        |      CAST(sum(v) AS BIGINT) AS s, CAST(sum(v * v) AS BIGINT) AS ss
        |    FROM mb GROUP BY 1) q2 ON q2.cell = g2.i),
        |pre AS (SELECT cell,
        |  sum(n) OVER (ORDER BY cell) AS cn,
        |  sum(s) OVER (ORDER BY cell) AS cs,
        |  sum(ss) OVER (ORDER BY cell) AS css FROM cells),
        |parr AS MATERIALIZED (SELECT list(cn ORDER BY cell) AS cn,
        |  list(cs ORDER BY cell) AS cs, list(css ORDER BY cell) AS css
        |  FROM pre),
        |st(b2, dp) AS (
        |  SELECT 1, list_transform(generate_series(1, 24), i ->
        |     CAST((cn[i]) * (css[i]) - (cs[i]) * (cs[i]) AS HUGEINT))
        |  FROM parr
        |  UNION ALL
        |  SELECT s2.b2 + 1,
        |    list_transform(generate_series(1, 24), i ->
        |      list_min(list_transform(generate_series(1, i), j ->
        |        CASE WHEN j < i THEN s2.dp[j] +
        |          CAST((p.cn[i] - p.cn[j]) * (p.css[i] - p.css[j])
        |               - (p.cs[i] - p.cs[j]) * (p.cs[i] - p.cs[j]) AS HUGEINT)
        |        ELSE s2.dp[i] END)))
        |  FROM st s2, parr p WHERE s2.b2 < 4)
        |SELECT CAST(b2 AS BIGINT) AS n_buckets,
        |  CAST(dp[24] AS VARCHAR) AS nscaled_sse
        |FROM st""".stripMargin,
    "q704_compaction_ffd" ->
      """WITH RECURSIVE f AS (
        |  SELECT p_brand || '/' ||
        |      CAST(CAST(date_trunc('month', l_shipdate) AS DATE) AS VARCHAR)
        |      AS fk,
        |    CAST(count(*) AS BIGINT) AS sz
        |  FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1),
        |rk AS MATERIALIZED (SELECT row_number() OVER (ORDER BY sz DESC, fk)
        |    AS i, fk, sz,
        |    (SELECT CAST(3 * max(sz) AS BIGINT) FROM f) AS cap
        |  FROM f),
        |st(i, bins) AS (
        |  SELECT 0, CAST([] AS BIGINT[])
        |  UNION ALL
        |  SELECT r.i,
        |    CASE WHEN len(list_filter(generate_series(1, len(s.bins)),
        |            x -> s.bins[x] + r.sz <= r.cap)) = 0
        |         THEN list_append(s.bins, r.sz)
        |         ELSE list_transform(generate_series(1, len(s.bins)), x ->
        |           CASE WHEN x = list_filter(generate_series(1, len(s.bins)),
        |                  y -> s.bins[y] + r.sz <= r.cap)[1]
        |                THEN s.bins[x] + r.sz ELSE s.bins[x] END)
        |    END
        |  FROM st s JOIN rk r ON r.i = s.i + 1)
        |SELECT CAST(b.x AS BIGINT) AS bin_id, CAST(b.load AS BIGINT)
        |    AS bin_load,
        |  CAST(b.load * 1000000 // (SELECT cap FROM rk LIMIT 1) AS BIGINT)
        |    AS fill_ppm
        |FROM (SELECT unnest(generate_series(1, len(bins))) AS x,
        |        unnest(bins) AS load
        |      FROM st WHERE i = (SELECT max(i) FROM rk)) b""".stripMargin,
    "q705_feature_hash_audit" ->
      """WITH w AS (SELECT string_split(lower(text), ' ') AS ws
        |  FROM documents),
        |uni AS (SELECT unnest(ws) AS t FROM w),
        |bi AS (SELECT ws[i] || ' ' || ws[i + 1] AS t
        |  FROM w, unnest(generate_series(1, len(ws) - 1)) AS g(i)),
        |tf AS (SELECT t, CAST(count(*) AS BIGINT) AS freq FROM (
        |    SELECT t FROM uni WHERE length(t) > 0
        |    UNION ALL
        |    SELECT t FROM bi WHERE t NOT LIKE ' %' AND t NOT LIKE '% '
        |      AND length(t) > 1)
        |  GROUP BY 1),
        |hb AS (SELECT t, freq,
        |    CAST(('0x' || substr(md5(t), 1, 8))::UBIGINT % 256 AS BIGINT)
        |      AS bkt
        |  FROM tf),
        |bkts AS (SELECT bkt, CAST(count(*) AS BIGINT) AS n_types,
        |    CAST(sum(freq) AS BIGINT) AS mass FROM hb GROUP BY 1),
        |tot AS (SELECT CAST(sum(mass) AS BIGINT) AS t2 FROM bkts)
        |SELECT n_types AS bucket_load, CAST(count(*) AS BIGINT) AS n_buckets,
        |  CAST(sum(mass) * 1000000 // (SELECT t2 FROM tot) AS BIGINT)
        |    AS mass_ppm
        |FROM bkts GROUP BY 1""".stripMargin,
    "q706_shuffle_skew" ->
      Seq("l_orderkey", "l_partkey", "l_suppkey").map { k =>
        s"""SELECT key_col, CAST(count(*) AS BIGINT) AS n_buckets,
           |  CAST(sum(n) AS BIGINT) AS n_rows, CAST(max(n) AS BIGINT)
           |    AS max_load,
           |  CAST(min(n) AS BIGINT) AS min_load,
           |  CAST(max(n) * count(*) * 1000000 // sum(n) AS BIGINT)
           |    AS skew_ppm
           |FROM (SELECT '$k' AS key_col,
           |    CAST(('0x' || substr(md5(CAST($k AS VARCHAR)), 1, 8))::UBIGINT
           |      % 32 AS BIGINT) AS bkt,
           |    CAST(count(*) AS BIGINT) AS n
           |  FROM lineitem GROUP BY 1, 2)
           |GROUP BY 1""".stripMargin
      }.mkString("\nUNION ALL\n"),
    "q707_shannon_code" ->
      """WITH sym AS (SELECT p_type AS symbol, CAST(count(*) AS BIGINT)
        |    AS cnt FROM part GROUP BY 1),
        |s2 AS (SELECT symbol, cnt,
        |    (SELECT CAST(sum(cnt) AS BIGINT) FROM sym) AS n FROM sym),
        |cl AS (SELECT symbol, cnt,
        |    CAST(list_min(list_filter(generate_series(1, 40),
        |      k -> cnt * (1::BIGINT << k) >= n)) AS BIGINT) AS code_len
        |  FROM s2)
        |SELECT symbol, cnt, code_len,
        |  CAST(cnt * code_len AS BIGINT) AS bits_contrib,
        |  CAST(1000000 // (1::BIGINT << code_len) AS BIGINT) AS kraft_ppm
        |FROM cl""".stripMargin,
    "q708_good_turing" ->
      """WITH w AS (SELECT string_split(lower(text), ' ') AS ws
        |  FROM documents),
        |bg AS (SELECT ws[i] || ' ' || ws[i + 1] AS t
        |  FROM w, unnest(generate_series(1, len(ws) - 1)) AS g(i)),
        |tf AS (SELECT t, CAST(count(*) AS BIGINT) AS r FROM bg
        |  WHERE t NOT LIKE ' %' AND t NOT LIKE '% ' AND length(t) > 1
        |  GROUP BY 1),
        |fof AS (SELECT r, CAST(count(*) AS BIGINT) AS nr FROM tf GROUP BY 1),
        |tot AS (SELECT CAST(sum(r * nr) AS BIGINT) AS n FROM fof)
        |SELECT f.r, f.nr,
        |  CAST(coalesce((f.r + 1) * f2.nr * 1000 // f.nr, 0) AS BIGINT)
        |    AS r_star_milli,
        |  CAST(f.r * f.nr * 1000000 // (SELECT n FROM tot) AS BIGINT)
        |    AS mass_ppm
        |FROM fof f LEFT JOIN fof f2 ON f2.r = f.r + 1
        |WHERE f.r <= 10""".stripMargin,
    "q709_kanon_ladder" ->
      """WITH lv AS (
        |  SELECT 0 AS lvl, CAST(c_nationkey AS VARCHAR) AS qi1,
        |    CAST(CAST(floor(c_acctbal / 500) AS BIGINT) AS VARCHAR) AS qi2
        |  FROM customer
        |  UNION ALL
        |  SELECT 1, CAST(c_nationkey % 5 AS VARCHAR),
        |    CAST(CAST(floor(c_acctbal / 2000) AS BIGINT) AS VARCHAR)
        |  FROM customer
        |  UNION ALL
        |  SELECT 2, 'any',
        |    CAST(CAST(floor(c_acctbal / 5000) AS BIGINT) AS VARCHAR)
        |  FROM customer),
        |cls AS (SELECT lvl, qi1, qi2, CAST(count(*) AS BIGINT) AS k
        |  FROM lv GROUP BY 1, 2, 3)
        |SELECT CAST(lvl AS BIGINT) AS level, CAST(count(*) AS BIGINT)
        |    AS n_classes,
        |  CAST(min(k) AS BIGINT) AS min_k,
        |  CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)
        |    AS n_rows_violating_k5,
        |  CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) * 1000000 // sum(k)
        |    AS BIGINT) AS violation_ppm
        |FROM cls GROUP BY 1""".stripMargin,
    "q710_int8_quant_audit" ->
      """WITH q AS (SELECT vec_id,
        |    list_transform(embedding, x ->
        |      CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings WHERE vec_id < 64),
        |sc AS (SELECT vec_id, qv,
        |    greatest(list_max(list_transform(qv, x -> abs(x))), 1) AS s
        |  FROM q),
        |qi AS (SELECT vec_id, qv, s,
        |    list_transform(qv, x -> CASE WHEN x * 127 >= 0
        |        THEN (x * 127) // s ELSE -((-(x * 127)) // s) END) AS iv
        |  FROM sc)
        |SELECT vec_id, CAST(s AS BIGINT) AS scale_milli,
        |  CAST(list_max(list_transform(generate_series(1, len(qv)), i ->
        |    abs(qv[i] * 127 - iv[i] * s))) AS BIGINT) AS max_err_127milli,
        |  CAST(list_sum(list_transform(iv, x -> x * x)) AS BIGINT)
        |    AS inorm2,
        |  CAST(list_max(list_transform(iv, x -> abs(x))) AS BIGINT) AS imax
        |FROM qi""".stripMargin,
    "q711_jaro_winkler" ->
      """WITH tok AS (SELECT DISTINCT unnest(string_split(p_name, ' ')) AS t
        |  FROM part),
        |v AS (SELECT t FROM tok WHERE length(t) > 0 AND length(t) <= 20),
        |pr AS (SELECT a.t AS t1, b.t AS t2, length(a.t) AS l1,
        |    length(b.t) AS l2,
        |    greatest(greatest(length(a.t), length(b.t)) // 2 - 1, 0) AS w
        |  FROM v a JOIN v b ON a.t < b.t),
        |fold AS (SELECT t1, t2, l1, l2, w,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(
        |      generate_series(1, l1), i -> CAST(i AS BIGINT))),
        |    (st, i) -> CASE WHEN len(list_filter(
        |          generate_series(greatest(1, CAST(i AS INT) - w),
        |                          least(l2, CAST(i AS INT) + w)),
        |          j -> ((st % 1048576) // (1::BIGINT << (j - 1))) % 2 = 0
        |               AND substr(t2, j, 1) = substr(t1, CAST(i AS INT), 1)))
        |        = 0
        |      THEN st
        |      ELSE st + (1::BIGINT << (CAST(i AS INT) - 1)) * 1048576
        |              + (1::BIGINT << (list_filter(
        |          generate_series(greatest(1, CAST(i AS INT) - w),
        |                          least(l2, CAST(i AS INT) + w)),
        |          j -> ((st % 1048576) // (1::BIGINT << (j - 1))) % 2 = 0
        |               AND substr(t2, j, 1) = substr(t1, CAST(i AS INT), 1))[1]
        |          - 1))
        |      END) AS st
        |  FROM pr),
        |parts AS (SELECT t1, t2, l1, l2,
        |    st // 1048576 AS mask1, st % 1048576 AS mask2,
        |    bit_count(CAST(st // 1048576 AS BIGINT)) AS m
        |  FROM fold),
        |tr AS (SELECT t1, t2, l1, l2, m,
        |    CASE WHEN m = 0 THEN 0
        |      ELSE CAST(len(list_filter(generate_series(1, m), k ->
        |      substr(t1, list_filter(generate_series(1, l1),
        |        i -> (mask1 // (1::BIGINT << (i - 1))) % 2 = 1)[k], 1) <>
        |      substr(t2, list_filter(generate_series(1, l2),
        |        j -> (mask2 // (1::BIGINT << (j - 1))) % 2 = 1)[k], 1)))
        |      AS BIGINT) END AS t_raw
        |  FROM parts WHERE m > 0),
        |jr AS (SELECT t1, t2, m, t_raw // 2 AS tt, l1, l2,
        |    (m * m * l2 + m * m * l1 + (m - t_raw // 2) * l1 * l2) * 1000000
        |         // (3 * l1 * l2 * m) AS jaro_ppm,
        |    (SELECT coalesce(min(k2) - 1, least(4, least(l1, l2)))
        |     FROM unnest(generate_series(1, least(4, least(l1, l2))))
        |       AS u(k2)
        |     WHERE substr(t1, k2, 1) <> substr(t2, k2, 1)) AS pl
        |  FROM tr)
        |SELECT t1, t2, CAST(m AS BIGINT) AS m,
        |  CAST(tt AS BIGINT) AS transpositions,
        |  CAST(jaro_ppm AS BIGINT) AS jaro_ppm,
        |  CAST(jaro_ppm + pl * (1000000 - jaro_ppm) // 10 AS BIGINT)
        |    AS jw_ppm
        |FROM jr WHERE jaro_ppm + pl * (1000000 - jaro_ppm) // 10
        |  >= 600000""".stripMargin,
    "q712_lsh_band_sweep" -> {
      val mins = (0 until 12).map(i =>
        s"  list_min(list_transform(shs, s -> md5('$i-' || s))) AS m$i")
        .mkString(",\n")
      val cfg = (tag: String, b: Int, r: Int) => {
        val bandExprs = (0 until b).map { bb =>
          val parts = (0 until r).map(j => s"m${bb * r + j}").mkString(" || '|' || ")
          s"  '$bb:' || md5($parts)"
        }.mkString(",\n")
        // guards + spanning-path degrade mirrored from
        // Dedup.candidatesWithOverlap (round 11) — one relation per config
        val z0 =
          s"""SELECT doc_id, bk, count(*) OVER (PARTITION BY bk) AS bsz,
             |          lag(doc_id) OVER (PARTITION BY bk ORDER BY doc_id)
             |            AS prev
             |        FROM (SELECT doc_id, unnest([
             |$bandExprs
             |          ]) AS bk FROM mh) z0""".stripMargin
        val okCond =
          s"z.bsz <= ${graft.operators.Dedup.DefaultMaxBucket} " +
            s"AND z.bsz * z.bsz <= ${graft.operators.Dedup.PairBudgetFactor}" +
            " * (SELECT count(*) FROM sh3)"
        s"""SELECT '$tag' AS config,
           |  CAST(count(*) AS BIGINT) AS n_candidates,
           |  CAST(sum(CASE WHEN overlap * 2 >= (na + nb - overlap)
           |      THEN 1 ELSE 0 END) AS BIGINT) AS n_verified,
           |  CAST(CASE WHEN count(*) = 0 THEN 0
           |    ELSE sum(CASE WHEN overlap * 2 >= (na + nb - overlap)
           |        THEN 1 ELSE 0 END) * 1000000 // count(*) END AS BIGINT)
           |    AS precision_ppm
           |FROM (
           |  SELECT c.doc_a, c.doc_b, count(*) AS overlap,
           |    any_value(sx.n) AS na, any_value(sy.n) AS nb
           |  FROM (
           |    SELECT DISTINCT doc_a, doc_b FROM (
           |      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
           |      FROM (SELECT doc_id, bk FROM (
           |        $z0) z
           |        WHERE $okCond) a
           |      JOIN (SELECT doc_id, bk FROM (
           |        $z0) z
           |        WHERE $okCond) b
           |      ON a.bk = b.bk AND a.doc_id < b.doc_id
           |      UNION ALL
           |      SELECT z.prev AS doc_a, z.doc_id AS doc_b FROM (
           |        $z0) z
           |      WHERE NOT ($okCond) AND z.prev IS NOT NULL) cu) c
           |  JOIN shx x ON x.doc_id = c.doc_a
           |  JOIN shx y ON y.doc_id = c.doc_b AND y.s = x.s
           |  JOIN sizes sx ON sx.doc_id = c.doc_a
           |  JOIN sizes sy ON sy.doc_id = c.doc_b
           |  GROUP BY 1, 2)""".stripMargin
      }
      s"""WITH ${SparkEntry.ToksCte},
         |${SparkEntry.shingleCteFor("sh3", 3)},
         |shx AS (SELECT doc_id, unnest(shs) AS s FROM sh3),
         |sizes AS (SELECT doc_id, count(*) AS n FROM shx GROUP BY 1),
         |mh AS MATERIALIZED (SELECT doc_id,
         |$mins
         |FROM sh3)
         |${cfg("b2r6", 2, 6)}
         |UNION ALL
         |${cfg("b4r3", 4, 3)}
         |UNION ALL
         |${cfg("b6r2", 6, 2)}""".stripMargin
    },
    "q713_pack_ladder" ->
      Seq(512L, 1024L, 2048L).map { b =>
        s"""SELECT * FROM (
           |WITH sized AS (SELECT lang, doc_id,
           |  CASE WHEN length(trim(text)) = 0 THEN 0
           |       ELSE len(regexp_split_to_array(lower(trim(text)), '\\s+'))
           |       END AS nt
           |  FROM documents),
           |cum AS (SELECT lang, doc_id, nt,
           |  CAST(sum(nt) OVER (PARTITION BY lang ORDER BY doc_id
           |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c FROM sized),
           |per_bin AS (SELECT lang, (c - nt) // $b AS bin_id,
           |    CAST(count(*) AS BIGINT) AS n_docs,
           |    CAST(sum(nt) AS BIGINT) AS n_tokens
           |  FROM cum GROUP BY 1, 2),
           |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_bins,
           |    CAST(sum(n_docs) AS BIGINT) AS n_docs,
           |    CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           |    CAST(sum(CASE WHEN n_tokens * 1000000 >= 950000 * $b
           |        THEN 1 ELSE 0 END) AS BIGINT) AS n_full_bins
           |  FROM per_bin)
           |SELECT CAST($b AS BIGINT) AS budget, n_bins, n_docs, n_tokens,
           |  CASE WHEN n_bins * $b - n_tokens >= 0
           |    THEN CAST((n_bins * $b - n_tokens) * 1000000
           |         // (n_bins * $b) AS BIGINT)
           |    ELSE CAST(-((n_tokens - n_bins * $b) * 1000000
           |         // (n_bins * $b)) AS BIGINT) END AS waste_ppm,
           |  n_full_bins
           |FROM agg)""".stripMargin
      }.mkString("\nUNION ALL\n"),
    "q681_container_sniff" ->
      """WITH m AS (SELECT doc_id, length(text) AS chars,
        |    octet_length(encode(text)) AS nb,
        |    1 + (length(text) % 2) AS ch FROM documents),
        |f AS (SELECT *,
        |    CASE doc_id % 5 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
        |      WHEN 2 THEN 'wav' WHEN 3 THEN 'mp4' ELSE 'unknown' END
        |      AS format,
        |    CASE WHEN doc_id % 5 = 4 OR doc_id % 31 = 0 THEN 0 ELSE 1 END
        |      AS ok
        |  FROM m)
        |SELECT doc_id, format, CAST(ok AS BIGINT) AS parse_ok,
        |  (CASE WHEN ok = 1 AND format IN ('png', 'jpeg')
        |        THEN 16 + chars % 64 ELSE 0 END)::INT AS hdr_width,
        |  (CASE WHEN ok = 1 AND format IN ('png', 'jpeg')
        |        THEN 16 + chars % 48 ELSE 0 END)::INT AS hdr_height,
        |  (CASE WHEN ok = 1 AND format IN ('png', 'jpeg', 'wav')
        |        THEN 8 ELSE 0 END)::INT AS hdr_bit_depth,
        |  (CASE WHEN ok = 1 AND format = 'wav' THEN ch ELSE 0 END)::INT
        |    AS hdr_channels,
        |  (CASE WHEN ok = 1 AND format = 'wav'
        |        THEN 8000 + (chars % 8) * 1000 ELSE 0 END)::INT
        |    AS hdr_sample_rate,
        |  CAST(CASE WHEN ok = 1 AND format = 'wav'
        |       THEN (nb + ch - 1) // ch ELSE 0 END AS BIGINT)
        |    AS hdr_n_samples,
        |  CAST(CASE WHEN ok = 1 AND format = 'mp4'
        |       THEN chars * 1000 // 8000 ELSE 0 END AS BIGINT)
        |    AS hdr_duration_ms,
        |  (CASE WHEN ok = 1 AND format = 'jpeg' THEN 1 + chars % 8
        |        ELSE 0 END)::INT AS hdr_orientation
        |FROM f""".stripMargin)
}
