package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.{Dedup, Graph, TextAnalysis}

/** Round-13 queries (q793+). Separate object: the earlier query objects'
  * map builders sit near the JVM 64 KB method-bytecode ceiling, so new
  * surface accretes here and chains into `SparkEntry.queries` /
  * `oracleSql`.
  */
object R17Queries {

  private def rd(s: SparkSession, dir: String, t: String): DataFrame =
    Tables.read(s, dir, t)

  /** q793's probe sources: corpus docs whose text is re-submitted under a
    * remapped id (+10⁶) as the probe delta — a KNOWN-CONTENT probe, so at
    * least one exact-match pair exists at every scale factor, and the
    * delta's ≤12 distinct band keys stay under
    * [[Dedup.SigPushdownKeyCap]] so the pushed point filter actually
    * fires. All three ids satisfy the corpus predicate (% 3 ≠ 0, < 3000).
    */
  private val ProbeSrcIds: Seq[Long] = Seq(1L, 2L, 4L)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q793_point_probe_dedup" -> ((s, dir) => {
      // The streaming-ingest POINT PROBE against a persisted signature
      // store (round-13 lever b): "is this document already in the
      // corpus?" for three known-content probes — corpus docs re-submitted
      // under remapped ids (+10⁶), so ≥3 exact-match pairs exist at every
      // SF. The store is published with the `sortByBandKey` layout and the
      // probes' ≤12 distinct band keys ride into the parquet scan as a
      // pushed equality-OR filter — on a multi-row-group store the probe
      // reads a few row groups instead of every touched bucket. Corpus
      // capped at doc_id < 3000 (mirrored in the oracle) so the one-off
      // publish stays probe-proportionate at gate scale; pairs are
      // bit-identical to the q739 recompute arithmetic over
      // corpus ∪ probes.
      // filter FIRST, spread after: spreading the whole fat documents
      // relation twice (corpus + delta reads) cost more than the probe
      // itself; the <3000-doc corpus repartitions in one cheap shuffle
      val d = rd(s, dir, "documents")
      val corpus = d.filter(col("doc_id") % 3 =!= 0 && col("doc_id") < 3000)
        .repartition(16)
      val delta = d.filter(col("doc_id").isin(ProbeSrcIds: _*))
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      // per-(user × corpus-dir) root (ADVICE r13): concurrent runs at
      // different SFs must not interleave publish/vacuum on one store
      val root = Dedup.sigRoot("q793", dir)
      // 16 buckets, not 64: a <3000-doc store is directory-churn-bound at
      // publish (Stress16 file-count trade-off) and the probe's pruning
      // ratio is unchanged; the read side takes the count from the stored
      // marker either way.
      Dedup.signatureTable(s, corpus, "doc_id", "text", root,
                           numBuckets = 16, sortByBandKey = true)
      Dedup.incrementalPairs(s, delta, root, "doc_id", "text")
    }),
    "q794_matthews_mcc" -> ((s, dir) => {
      // Matthews correlation between two deterministic quality filters
      // (char-length vs token-count) — the balanced single-number
      // association the accuracy/kappa/McNemar tier lacks: MCC uses all
      // four confusion cells symmetrically, so a filter that rubber-stamps
      // the majority class scores ~0 here while accuracy flatters it.
      // sqrt-free-ish: the denominator is the PINNED product of two exact
      // integer square roots (isqrt via floor(sqrt(double)), exact for
      // int-valued doubles ≤ 2^53 — the q732 convention), sign-folded DIV.
      // int64 envelope: |tp·tn − fp·fn| ≤ n²/4, so num·10⁶ fits to
      // n ≲ 6·10⁶ docs; the marginal products under isqrt stay ≤ 2^53 to
      // n ≲ 9·10⁷. Past that, prescale the cells to kilodocs first.
      val d = Tables.spread(s, rd(s, dir, "documents"))
      d.select((col("n_chars") >= 300).as("f1"),
               (size(TextAnalysis.tokens(col("text"))) >= 50).as("f2"))
        .agg(sum(when(col("f1") && col("f2"), 1L).otherwise(0L)).as("tp"),
             sum(when(col("f1") && !col("f2"), 1L).otherwise(0L)).as("fp"),
             sum(when(!col("f1") && col("f2"), 1L).otherwise(0L)).as("fn"),
             sum(when(!col("f1") && !col("f2"), 1L).otherwise(0L)).as("tn"))
        .withColumn("mcc_num", expr("tp * tn - fp * fn"))
        .withColumn("mcc_ppm", expr(
          // zero marginals checked factor-by-factor: the 4-way product
          // itself would overflow int64 from ~55k docs
          """CAST(CASE WHEN tp+fp = 0 OR tp+fn = 0 OR tn+fp = 0
            |  OR tn+fn = 0 THEN 0
            |WHEN mcc_num >= 0 THEN mcc_num * 1000000L DIV
            |  (CAST(floor(sqrt(CAST((tp+fp)*(tp+fn) AS DOUBLE))) AS BIGINT)
            |   * CAST(floor(sqrt(CAST((tn+fp)*(tn+fn) AS DOUBLE))) AS BIGINT))
            |ELSE -((-mcc_num) * 1000000L DIV
            |  (CAST(floor(sqrt(CAST((tp+fp)*(tp+fn) AS DOUBLE))) AS BIGINT)
            |   * CAST(floor(sqrt(CAST((tn+fp)*(tn+fn) AS DOUBLE))) AS BIGINT)))
            |END AS BIGINT)""".stripMargin))
    }),
    "q795_yules_k" -> ((s, dir) => {
      // Yule's characteristic K per source — the repeat-rate vocabulary
      // richness constant (K = 10⁴·(Σtf² − N)/N², length-invariant where
      // raw TTR is not) — plus the hapax share of the vocabulary. The
      // template-feed smell test beside lexical Gini (q369) and Zipf/Heaps
      // fits: boilerplate sources repeat tokens (high K, low hapax).
      // int64 envelope: N²·10⁴ needs N ≲ 9.6·10⁸ tokens per source and
      // Σtf²·10⁴ ≲ int64 holds while max tf ≲ 10⁵·√source-share; past
      // that, rescale tf to kilocounts before squaring.
      val tf = Tables.spread(s, rd(s, dir, "documents"))
        .select(col("source"),
                explode(TextAnalysis.tokens(col("text"))).as("w"))
        .groupBy(col("source"), col("w"))
        .agg(count(lit(1)).as("tf"))
      tf.groupBy(col("source"))
        .agg(sum(col("tf")).as("n_tokens"),
             count(lit(1)).as("vocab"),
             sum(expr("tf * tf")).as("s2"),
             sum(when(col("tf") === 1, 1L).otherwise(0L)).as("hapax"))
        .withColumn("hapax_ppm", expr("hapax * 1000000L DIV vocab"))
        .withColumn("yules_k_e4",
                    expr("(s2 - n_tokens) * 10000L DIV (n_tokens * n_tokens)"))
        .select("source", "n_tokens", "vocab", "hapax", "hapax_ppm",
                "yules_k_e4")
    }),
    "q796_link_prediction" -> ((s, dir) => {
      // Link prediction over the strong co-purchase graph: for the top-10
      // NON-adjacent part pairs sharing neighbors, common-neighbor count,
      // Jaccard over neighborhoods, and Adamic–Adar with the float-free
      // weight 10⁶ DIV bitlength(deg z) (bin() string length = ⌊log₂d⌋+1
      // in BOTH engines — the q707 code-length discipline: rare shared
      // neighbors count more, log quantized to the bit). One wedge join on
      // the middle node + one anti-join against the edge list; degrees
      // broadcast.
      val p = Graph.coOccurrenceEdgesCached(
        Tables.spread(s, rd(s, dir, "lineitem")),
        groupCol = "l_orderkey", itemCol = "l_partkey", minCount = 2)
      val sym = p.unionAll(
        p.select(col("dst").as("src"), col("src").as("dst")))
        .localCheckpoint(false)
      val deg = sym.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("deg"))
      val wedges = sym.as("x")
        .join(sym.as("y"),
              col("x.src") === col("y.src") && col("x.dst") < col("y.dst"))
        .select(col("x.dst").as("u"), col("y.dst").as("v"),
                col("x.src").as("z"))
        .join(p.select(col("src").as("u"), col("dst").as("v")),
              Seq("u", "v"), "left_anti")
      wedges
        .join(broadcast(deg.select(col("node").as("z"),
                                   col("deg").as("dz"))), Seq("z"))
        .groupBy(col("u"), col("v"))
        .agg(count(lit(1)).as("cn"),
             sum(expr("1000000 DIV length(bin(dz))")).as("aa_q"))
        .join(broadcast(deg.select(col("node").as("u"),
                                   col("deg").as("du"))), Seq("u"))
        .join(broadcast(deg.select(col("node").as("v"),
                                   col("deg").as("dv"))), Seq("v"))
        .withColumn("jaccard_ppm",
                    expr("cn * 1000000L DIV (du + dv - cn)"))
        .orderBy(col("aa_q").desc, col("cn").desc, col("u"), col("v"))
        .limit(10)
        .select("u", "v", "cn", "aa_q", "jaccard_ppm")
    }),
    "q797_two_proportion_z" -> ((s, dir) => {
      // Pooled two-proportion z test — THE A/B readout (does arm split by
      // order-key parity convert to status F at different rates?): z² in
      // exact milli via one cross-multiplied formula, the squared numerator
      // in 128-bit (Spark DECIMAL(38) / oracle HUGEINT — the q546
      // convention; (x₁n₂−x₂n₁)² overflows int64 from ~3·10⁹ order-arm
      // products). All terms non-negative so truncating DIV is floor in
      // both engines.
      rd(s, dir, "orders")
        .select((col("o_orderkey") % 2).cast("long").as("arm"),
                when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("c"))
        .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n1"),
             sum(when(col("arm") === 0, col("c")).otherwise(0L)).as("x1"),
             sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n2"),
             sum(when(col("arm") === 1, col("c")).otherwise(0L)).as("x2"))
        .withColumn("p1_ppm", expr("x1 * 1000000L DIV n1"))
        .withColumn("p2_ppm", expr("x2 * 1000000L DIV n2"))
        .withColumn("z2_milli", expr(
          """CAST(CASE WHEN x1 + x2 = 0 OR x1 + x2 = n1 + n2 THEN 0
            |ELSE CAST(x1 * n2 - x2 * n1 AS DECIMAL(38,0))
            |  * (x1 * n2 - x2 * n1) * (n1 + n2) * 1000
            |  DIV (CAST(n1 AS DECIMAL(38,0)) * n2 * (x1 + x2)
            |       * (n1 + n2 - x1 - x2))
            |END AS BIGINT)""".stripMargin))
    }),
    "q798_rule_conviction" -> ((s, dir) => {
      // Association-rule strength beyond lift: CONVICTION ((1−supp(B)) /
      // (1−conf(A→B)) — how much more often A appears without B than
      // independence predicts; directional, unlike lift) and LEVERAGE
      // (supp(AB) − supp(A)·supp(B), additive independence gap), for both
      // directions of the top-10 co-purchase pairs. Exact cross-multiplied
      // ppm; a confidence-1 rule reports conviction −1 with an explicit
      // flag instead of a NULL (the X743 sentinel discipline). Leverage's
      // two pinned DIVs (each share to ppm, then the product) are mirrored
      // verbatim in the oracle.
      val li = Tables.spread(s, rd(s, dir, "lineitem"))
        .select(col("l_orderkey").as("o"), col("l_partkey").as("i"))
        .distinct()
        .localCheckpoint(false)
      val nOrders = broadcast(
        li.select(col("o")).distinct().agg(count(lit(1)).as("nb")))
      val ia = li.groupBy(col("i")).agg(count(lit(1)).as("ci"))
      val top = li.as("a")
        .join(li.as("b"), col("a.o") === col("b.o") && col("a.i") < col("b.i"))
        .groupBy(col("a.i").as("x"), col("b.i").as("y"))
        .agg(count(lit(1)).as("cab"))
        .orderBy(col("cab").desc, col("x"), col("y"))
        .limit(10)
      val rules = top.select(col("x").as("ante"), col("y").as("cons"),
                             col("cab"))
        .unionByName(top.select(col("y").as("ante"), col("x").as("cons"),
                                col("cab")))
      rules
        .join(broadcast(ia.select(col("i").as("ante"), col("ci").as("ca"))),
              Seq("ante"))
        .join(broadcast(ia.select(col("i").as("cons"), col("ci").as("cb"))),
              Seq("cons"))
        .crossJoin(nOrders)
        .withColumn("conf_ppm", expr("cab * 1000000L DIV ca"))
        .withColumn("lift_ppm", expr("cab * nb * 1000000L DIV (ca * cb)"))
        .withColumn("conv_inf", (col("ca") === col("cab")).cast("long"))
        .withColumn("conviction_ppm", expr(
          "CASE WHEN ca = cab THEN -1L ELSE " +
            "(nb - cb) * ca * 1000000L DIV ((ca - cab) * nb) END"))
        .withColumn("leverage_ppm", expr(
          "cab * 1000000L DIV nb - " +
            "(ca * 1000000L DIV nb) * (cb * 1000000L DIV nb) DIV 1000000L"))
        .select("ante", "cons", "cab", "ca", "cb", "conf_ppm", "lift_ppm",
                "conv_inf", "conviction_ppm", "leverage_ppm")
    }),
    "q799_dup_cluster_sizes" -> ((s, dir) => {
      // Near-dup CLUSTER-SIZE distribution off the production pipeline
      // (minhashLshPairs → clusterPairs): how many clusters of each size,
      // how many documents they hold — the shape a data lead reads to
      // choose between keep-canonical (long tail of pairs) and
      // investigate-template (a few giant clusters). Exercises the sealed
      // operators end-to-end in the gate; the oracle recomputes the
      // closure with the q38 recursive CTE and rolls it up.
      val d = Tables.spread(s, rd(s, dir, "documents"))
      Dedup.clusterPairs(Dedup.minhashLshPairs(d, "doc_id", "text"))
        .groupBy(col("cluster_size"))
        .agg(countDistinct(col("cluster_id")).as("n_clusters"),
             count(lit(1)).as("n_docs"))
    }),
    "q801_log_rank" -> ((s, dir) => {
      // Log-rank test — the survival-tier hypothesis test the KM curve
      // (q683) and hazards (q285/q515) describe but never compare: do
      // urgent-priority orders ship FASTER than the rest? Durations =
      // days from order date to first ship, right-censored at 60; at each
      // of the ≤61 event days the hypergeometric O/E/V terms are pinned
      // integer DIVs (V's numerator is n³-scale, so 128-bit per term —
      // the q546 convention) summed over the dimension-bounded day
      // ladder; z² in exact milli. At-risk counts are suffix sums over
      // the per-day rollup — the whole test is two windows on a 61-row
      // grid after one fact aggregate.
      import org.apache.spark.sql.expressions.Window
      val firstShip = Tables.spread(s, rd(s, dir, "lineitem"))
        .groupBy(col("l_orderkey")).agg(min(col("l_shipdate")).as("fs"))
      val dur = rd(s, dir, "orders")
        .join(firstShip, col("o_orderkey") === col("l_orderkey"))
        .select(
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L).as("g1"),
          least(datediff(col("fs"), col("o_orderdate")), lit(60))
            .cast("long").as("day"))
        .withColumn("ev", (col("day") < 60).cast("long"))
      val cells = dur.groupBy(col("day"))
        .agg(sum(when(col("g1") === 1, 1L).otherwise(0L)).as("a1"),
             count(lit(1)).as("a"),
             sum(when(col("g1") === 1, col("ev")).otherwise(0L)).as("d1"),
             sum(col("ev")).as("d"))
      val wSuf = Window.partitionBy(graft.functions.DimKey.one)
        .orderBy(col("day").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cells
        .withColumn("n1", sum(col("a1")).over(wSuf))
        .withColumn("n", sum(col("a")).over(wSuf))
        .filter(col("d") > 0)
        .withColumn("e1_ppm_t", expr("d * n1 * 1000000L DIV n"))
        .withColumn("v_ppm_t", expr(
          """CAST(CASE WHEN n <= 1 THEN 0 ELSE
            |  CAST(d AS DECIMAL(38,0)) * n1 * (n - n1) * (n - d) * 1000000
            |  DIV (CAST(n AS DECIMAL(38,0)) * n * (n - 1)) END
            |  AS BIGINT)""".stripMargin))
        .agg(count(lit(1)).as("n_event_days"),
             sum(col("d1")).as("o1"),
             sum(col("e1_ppm_t")).as("e1_ppm"),
             sum(col("v_ppm_t")).as("v_ppm"))
        .withColumn("z2_milli", expr(
          """CAST(CASE WHEN v_ppm = 0 THEN 0 ELSE
            |  CAST(o1 * 1000000 - e1_ppm AS DECIMAL(38,0))
            |    * (o1 * 1000000 - e1_ppm) * 1000
            |  DIV (CAST(v_ppm AS DECIMAL(38,0)) * 1000000) END
            |  AS BIGINT)""".stripMargin))
    }),
    "q802_wilson_interval" -> ((s, dir) => {
      // Wilson 95% score interval for per-brand return rates — the
      // small-sample-honest leaderboard bound beside q757's EB shrinkage
      // (a 2-line brand shows a wide interval instead of a shrunk point).
      // z = 1.96 pinned as z²·10⁴ = 38416; the radicand is prescaled so
      // isqrt stays in the exact ≤2^53 regime (q732 convention) to
      // n ≲ 10⁹ rows per brand; every DIV pinned identically in both
      // engines.
      val r = Tables.spread(s, rd(s, dir, "lineitem"))
        .join(rd(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand").as("brand"))
        .agg(count(lit(1)).as("n"),
             sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
               .as("x"))
      r.withColumn("raw_ppm", expr("x * 1000000L DIV n"))
        .withColumn("rad", expr(
          "(x * (n - x) * 10000L DIV n + 9604L) * 38416L"))
        .withColumn("half_ppm", expr(
          """CAST(floor(sqrt(CAST(rad AS DOUBLE))) AS BIGINT) * 1000000L
            | DIV (n * 10000L + 38416L)""".stripMargin))
        .withColumn("center_ppm", expr(
          "(x * 10000L + 19208L) * 1000000L DIV (n * 10000L + 38416L)"))
        .withColumn("lo_ppm", expr("greatest(center_ppm - half_ppm, 0L)"))
        .withColumn("hi_ppm", expr(
          "least(center_ppm + half_ppm, 1000000L)"))
        .select("brand", "n", "x", "raw_ppm", "lo_ppm", "hi_ppm")
    }),
    "q803_mde_power" -> ((s, dir) => {
      // Experiment-planning readout: minimum detectable effect at
      // α = 0.05 / power 0.8 for the observed base rate (share of 'F'
      // orders) across candidate per-arm sizes — MDE = 2.8016·√(2p(1−p)/n)
      // with the z-sum pinned as 28016·10⁻⁴ and the radicand in
      // ppm²-per-row units so isqrt is exact (≤2^53 to any n ≥ 250).
      // The "how long must this test run" table, exact in both engines.
      import s.implicits._
      val p0 = rd(s, dir, "orders")
        .agg(expr("sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)" +
          " * 1000000L DIV count(1)").as("p_ppm"))
      val sizes = Seq(1000L, 10000L, 100000L, 1000000L).toDF("n_per_arm")
      sizes.crossJoin(broadcast(p0))
        .withColumn("rad",
                    expr("2 * p_ppm * (1000000L - p_ppm) DIV n_per_arm"))
        .withColumn("mde_ppm", expr(
          "28016L * CAST(floor(sqrt(CAST(rad AS DOUBLE))) AS BIGINT)" +
            " DIV 10000L"))
        .withColumn("mde_rel_ppm", expr("mde_ppm * 1000000L DIV p_ppm"))
        .select("n_per_arm", "p_ppm", "rad", "mde_ppm", "mde_rel_ppm")
    }),
    "q804_srm_check" -> ((s, dir) => {
      // Sample-ratio-mismatch guard — the first A/B sanity check before
      // any effect readout: customer-key-parity arms against the expected
      // 50/50, global χ² = (a−b)²/N in exact milli (the 2-cell equal-
      // expectation collapse), plus the 5 worst order-months by absolute
      // arm-share deviation (WHERE the randomizer drifted, not just
      // whether). Month grain keeps every relation calendar-bounded.
      import org.apache.spark.sql.expressions.Window
      val o = rd(s, dir, "orders")
        .select((col("o_custkey") % 2).cast("long").as("arm"),
                ((year(col("o_orderdate")) - 1992) * 12 +
                  month(col("o_orderdate"))).cast("long").as("mi"))
      val g = o.agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("a"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("b"))
        .withColumn("chi2_milli",
                    expr("(a - b) * (a - b) * 1000L DIV (a + b)"))
      val monthly = o.groupBy(col("mi"))
        .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("ma"),
             count(lit(1)).as("mn"))
        .withColumn("share_ppm", expr("ma * 1000000L DIV mn"))
        .withColumn("dev_ppm", expr("abs(share_ppm - 500000L)"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(graft.functions.DimKey.one)
            .orderBy(col("dev_ppm").desc, col("mi"))))
        .filter(col("rk") <= 5)
      monthly.crossJoin(broadcast(g))
        .select(col("mi"), col("ma"), col("mn"), col("share_ppm"),
                col("dev_ppm"), col("rk"), col("a"), col("b"),
                col("chi2_milli"))
    }),
    "q805_collation_contract" -> ((s, dir) => {
      // String-ordering contract: BINARY (codepoint) sort order pinned on
      // a case/digit/punctuation/space/empty gauntlet — both engines must
      // produce the identical rank sequence or the hash compare fails.
      // Locale-collated engines (or an ICU default creeping in) would
      // reorder 'B' vs 'a' and space-vs-underscore; every ORDER BY and
      // min/max string tie-break in the surface silently relies on this.
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val gauntlet = Seq("", " leading", "-dash", "0digit", "9digit",
                         "A", "B2", "Z", "_under", "a", "b1", "z",
                         "zz", "~tilde")
      gauntlet.toDF("s")
        .withColumn("rk", row_number().over(
          Window.partitionBy(graft.functions.DimKey.one).orderBy(col("s"))))
        .select(col("rk"), col("s"))
    }),
    "q806_dedup_percolation" -> ((s, dir) => {
      // Dedup PERCOLATION sweep: how the near-dup cluster structure
      // coarsens as τ drops — pairs, clustered docs, cluster count, and
      // the largest component at τ ∈ {70, 60, 50}% off ONE τ=1/2 verified
      // pair relation (the sealed checkpoint re-filters; thresholds above
      // the base τ are subsets, so the expensive signature stage runs
      // once). The STRUCTURE companion to q774's yield curve: a τ where
      // max_size jumps is a merge-cascade warning before keep-canonical
      // deletes half a template family. Empty thresholds report zeros
      // (coalesce — the X743 sentinel discipline).
      val d = Tables.spread(s, rd(s, dir, "documents"))
      val base = Dedup.minhashLshPairs(d, "doc_id", "text")
      Seq((1, 2, 50L), (3, 5, 60L), (7, 10, 70L)).map { case (tn, td, pct) =>
        val pairs = base.filter(col("overlap") * td >= col("union_size") * tn)
        val cl = Dedup.clusterPairs(pairs)
        val cs = cl.agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("cluster_id")).as("n_clusters"),
          coalesce(max(col("cluster_size")), lit(0L)).as("max_size"))
        pairs.agg(count(lit(1)).as("n_pairs")).crossJoin(cs)
          .select(lit(pct).as("tau_pct"), col("n_pairs"), col("n_docs"),
                  col("n_clusters"), col("max_size"))
      }.reduce(_.unionByName(_))
    }),
    "q807_variance_ratio" -> ((s, dir) => {
      // Lo–MacKinlay variance-ratio test on the daily-revenue series:
      // VR(q) = Var(q-step differences) / (q · Var(1-step)), the named
      // random-walk diagnostic (VR ≈ 1 under iid steps; >1 = momentum,
      // <1 = mean reversion). Index-aligned lags (q775's convention),
      // drift μ pinned in milli-cents, deviations squared into 128-bit
      // sums (milli-cents² passes int64 immediately), one ratio DIV per
      // q ∈ {2, 4, 8}. Day-grain relation end-to-end after one rollup.
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val daily = Tables.spread(s, rd(s, dir, "lineitem"))
        .groupBy(col("l_shipdate").as("d"))
        .agg(sum(expr("CAST(floor(l_extendedprice * 100) AS BIGINT)"))
          .as("y"))
      val idx = daily
        .withColumn("i", row_number().over(
          Window.partitionBy(graft.functions.DimKey.one).orderBy(col("d")))
          .cast("long"))
        .select("i", "y")
        .localCheckpoint(false) // read by the bounds agg + both join sides
      // per-step drift in milli-cents off the series endpoints (unique i
      // makes max_by/arg_max deterministic)
      val bounds = broadcast(idx.agg(
        max(col("i")).as("nn"),
        expr("min_by(y, i)").as("y0"),
        expr("max_by(y, i)").as("yn"))
        // sign-folded (ADVICE r13): yn (last day) can sit BELOW y0, and a
        // negative numerator truncates toward zero in Spark DIV but floors
        // in DuckDB // — the q760 signed-DIV contract applies to the drift
        // term exactly as it does to cxy4 in q810
        .withColumn("mu_milli", expr(
          """CASE WHEN yn >= y0 THEN (yn - y0) * 1000L DIV (nn - 1)
            |ELSE -((y0 - yn) * 1000L DIV (nn - 1)) END""".stripMargin)))
      // q = 1 rides the same grid as the report lags: one join computes
      // every difference series
      val qs = Seq(1L, 2L, 4L, 8L).toDF("q")
      val diffs = idx.crossJoin(broadcast(qs))
        .join(idx.select(col("i").as("i2"), col("y").as("y2")),
              col("i2") === col("i") + col("q"))
        .crossJoin(bounds)
        .select(col("q"),
                expr("(y2 - y) * 1000L - q * mu_milli").as("dev"))
      val stats = diffs.groupBy(col("q"))
        .agg(count(lit(1)).as("n_q"),
             sum(expr("CAST(dev AS DECIMAL(38,0)) * dev")).as("s_q"))
        .localCheckpoint() // tiny; read as base AND as the q=1 reference
      val ref = broadcast(stats.filter(col("q") === 1)
        .select(col("n_q").as("n1"), col("s_q").as("s1")))
      stats.filter(col("q") =!= 1).crossJoin(ref)
        .withColumn("vr_ppm", expr(
          "CAST(s_q * n1 * 1000000 DIV (q * s1 * n_q) AS BIGINT)"))
        .select("q", "n_q", "vr_ppm")
    }),
    "q808_holm_stepdown" -> ((s, dir) => {
      // Holm step-down FWER control over the SAME Chebyshev-bound
      // p-surrogates as q768's BH step-up — the stricter family-wise
      // guarantee next to BH's FDR: reject ranks sequentially while
      // p_(r)·(m−r+1)·20 ≤ 10⁶ and STOP at the first failure (step-down:
      // everything after the first survivor survives). Emitting both
      // rules' flags on one ranked relation makes the FWER ⊆ FDR
      // containment directly visible per supplier. Same two aggregates +
      // one rank window as q768; cross-multiplied integers throughout.
      import org.apache.spark.sql.expressions.Window
      val dem = Tables.spread(s, rd(s, dir, "lineitem"))
        .groupBy(col("l_suppkey").as("k"),
                 ((year(col("l_shipdate")) - 1992) * 12 +
                   month(col("l_shipdate"))).cast("long").as("mi"))
        .agg(sum(expr("CAST(l_quantity AS BIGINT)")).as("x"))
        .localCheckpoint(false)
      val glob = broadcast(dem.agg(
        count(lit(1)).as("nn"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx")))
      val per = dem.groupBy(col("k"))
        .agg(count(lit(1)).as("n_k"), sum(col("x")).as("s_k"))
        .crossJoin(glob)
        .withColumn("g", expr("sx DIV nn"))
        .withColumn("v0", expr("sxx DIV nn - g * g"))
        .withColumn("t", abs(expr("s_k DIV n_k") - col("g")))
        // int64 envelope (q768's audited site, cloned): v0·10⁶ needs the
        // global variance v0 ≲ 9.2·10¹² (quantity units; holds to ~10⁹
        // rows at TPC-H quantities), and n_k·t² ≲ int64 likewise — past
        // that, rescale t to kilounits before squaring (the q782 move)
        .withColumn("p_ppm", expr(
          "CASE WHEN t = 0 THEN 1000000" +
            " ELSE least(1000000L, v0 * 1000000L DIV (n_k * t * t)) END"))
      val m = Window.partitionBy(graft.functions.DimKey.one)
      val ranked = per
        .withColumn("r", row_number().over(
          Window.partitionBy(graft.functions.DimKey.one)
            .orderBy(col("p_ppm"), col("k"))).cast("long"))
        .withColumn("m", count(lit(1)).over(m))
        .withColumn("okr",
          when(col("p_ppm") * col("m") * 20L <= lit(1000000L) * col("r"),
               col("r")))
        .withColumn("badh",
          when(col("p_ppm") * (col("m") - col("r") + 1L) * 20L >
            lit(1000000L), col("r")))
      ranked
        .withColumn("bh_k", max(col("okr")).over(m))
        .withColumn("holm_ff", min(col("badh")).over(m))
        .select(col("k"), col("p_ppm"), col("r"),
                when(col("r") <= coalesce(col("bh_k"), lit(0L)), 1L)
                  .otherwise(0L).as("bh_rejected"),
                when(col("r") <
                  coalesce(col("holm_ff"), col("m") + 1L), 1L)
                  .otherwise(0L).as("holm_rejected"))
    }),
    "q809_token_coverage" -> ((s, dir) => {
      // Stopword-list sizing curve: cumulative corpus-token mass covered
      // by the top-k vocabulary types at k ∈ {5, 10, 25} — "how big a
      // stopword/function-word list buys how much of the stream" (the
      // type-mass complement of Heaps' vocabulary growth q678 and the
      // Zipf head check q270). One vocabulary rollup; the rank window
      // sees only the vocabulary relation. Checkpoints sized to the
      // synthetic corpus's compact vocabulary (~50 types at every SF).
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val tf = Tables.spread(s, rd(s, dir, "documents"))
        .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("tf"))
      val wTot = Window.partitionBy(graft.functions.DimKey.one)
      val ranked = tf
        .withColumn("r", row_number().over(
          Window.partitionBy(graft.functions.DimKey.one)
            .orderBy(col("tf").desc, col("w"))))
        .withColumn("total", sum(col("tf")).over(wTot))
        .withColumn("cum", sum(col("tf")).over(
          Window.partitionBy(graft.functions.DimKey.one)
            .orderBy(col("tf").desc, col("w"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val ks = Seq(5L, 10L, 25L).toDF("k")
      ranked.join(broadcast(ks), col("r") === col("k"))
        .select(col("k"), col("cum").as("cum_tokens"),
                expr("cum * 1000000L DIV total").as("coverage_ppm"))
    }),
    "q810_mahalanobis_outliers" -> ((s, dir) => {
      // Bivariate Mahalanobis outlier screen on (price-dollars, quantity):
      // the correlation-aware distance that flags cheap-but-huge and
      // expensive-but-tiny lines a per-axis z-score never sees. Integer
      // sufficient statistics at N²-scale (v_ab = N·Σab − Σa·Σb = N²·cov),
      // per-row quadratic form and determinant in 128-bit — the full
      // chain peaks at ~3·10³⁷, inside DECIMAL(38)/HUGEINT with the
      // envelope commented — top-10 by exact d²·10³. One broadcast of six
      // moments + one narrow scan; never a covariance "fit" pass per row.
      val li = Tables.spread(s, rd(s, dir, "lineitem"))
        .select(col("l_orderkey"), col("l_linenumber").cast("long")
                  .as("l_linenumber"),
                expr("CAST(floor(l_extendedprice) AS BIGINT)").as("x"),
                expr("CAST(l_quantity AS BIGINT)").as("y"))
      // Scale discipline (Spark's DIV always RETURNS LONG, so every
      // division's RESULT must fit int64 at any corpus size — the first
      // cut divided a 10³⁴-scale determinant down in two steps and the
      // intermediate silently overflowed): work in SCALE-INVARIANT
      // cov·10⁴ units. c_ab = (N·Σab − Σa·Σb)·10⁴ DIV N² ≈ cov·10⁴ is
      // magnitude-stable in N (≈10¹³ at dollar² variances), the
      // per-row quadratic form and determinant stay ≤10²³ in 128-bit,
      // and the two LONG-returning DIVs (c_ab itself, final d²·10³) are
      // both provably small. Signed c_xy is sign-folded (q760 contract);
      // the PSD quadratic form is zero-floored against truncation jitter.
      val mom = broadcast(li.agg(
        count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"))
        .withColumn("cxx4", expr(
          "(n * sxx - CAST(sx AS DECIMAL(38,0)) * sx) * 10000 DIV (n * n)"))
        .withColumn("cyy4", expr(
          "(n * syy - CAST(sy AS DECIMAL(38,0)) * sy) * 10000 DIV (n * n)"))
        .withColumn("cxy4", expr(
          """CASE WHEN n * sxy - CAST(sx AS DECIMAL(38,0)) * sy >= 0 THEN
            |  (n * sxy - CAST(sx AS DECIMAL(38,0)) * sy) * 10000
            |    DIV (n * n)
            |ELSE -((-(n * sxy - CAST(sx AS DECIMAL(38,0)) * sy)) * 10000
            |    DIV (n * n)) END""".stripMargin))
        .withColumn("det4", expr(
          "CAST(cxx4 AS DECIMAL(38,0)) * cyy4" +
            " - CAST(cxy4 AS DECIMAL(38,0)) * cxy4"))
        .withColumn("mx", expr("sx DIV n"))
        .withColumn("my", expr("sy DIV n")))
      li.crossJoin(mom)
        .withColumn("qf4", expr(
          """CAST(x - mx AS DECIMAL(38,0)) * (x - mx) * cyy4
            | - 2 * (CAST(x - mx AS DECIMAL(38,0)) * (y - my)) * cxy4
            | + CAST(y - my AS DECIMAL(38,0)) * (y - my) * cxx4""".stripMargin))
        .withColumn("d2_milli", expr(
          """CAST(CASE WHEN det4 <= 0 OR qf4 <= 0 THEN 0
            |ELSE qf4 * 10000000 DIV det4 END AS BIGINT)""".stripMargin))
        .orderBy(col("d2_milli").desc, col("l_orderkey"),
                 col("l_linenumber"))
        .limit(10)
        .select("l_orderkey", "l_linenumber", "x", "y", "d2_milli")
    }),
    "q811_records_test" -> ((s, dir) => {
      // Records process stationarity check: under ANY iid (exchangeable)
      // daily-revenue series the expected number of running-maximum
      // records in n days is the harmonic number H_n — observed counts
      // far above it are trend evidence with zero distributional
      // assumptions. H_n pinned as the truncating Σ 10⁶ DIV i (identical
      // literals-free arithmetic both engines); records via one running-
      // max window over the day-grain rollup.
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.spread(s, rd(s, dir, "lineitem"))
        .groupBy(col("l_shipdate").as("d"))
        .agg(sum(expr("CAST(floor(l_extendedprice * 100) AS BIGINT)"))
          .as("y"))
      val w = Window.partitionBy(graft.functions.DimKey.one)
        .orderBy(col("d"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val rec = daily
        .withColumn("prevmax", max(col("y")).over(w))
        .agg(count(lit(1)).as("n_days"),
             sum(when(col("prevmax").isNull ||
               col("y") > col("prevmax"), 1L).otherwise(0L))
               .as("n_records"))
      rec
        .withColumn("h_n_ppm", expr(
          "aggregate(sequence(1L, n_days), 0L, (acc, i) -> acc + 1000000L DIV i)"))
        .withColumn("excess_ppm",
                    expr("n_records * 1000000L - h_n_ppm"))
        .select("n_days", "n_records", "h_n_ppm", "excess_ppm")
    }),
    "q812_kendall_tau" -> ((s, dir) => {
      // Kendall rank correlation of daily revenue against TIME — the
      // distribution-free monotone-trend readout next to the records test
      // (q811) and the variance ratio (q807): every concordant pair is a
      // day-pair where later = higher. Exact pair counts over the
      // calendar-bounded day grid (≤ ~2.5k rows at ANY fact SF — the pair
      // join is |days|², never |facts|²); tau in sign-folded ppm over ALL
      // pairs (tau-a; y-ties counted, i-ties impossible on an index).
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.spread(s, rd(s, dir, "lineitem"))
        .groupBy(col("l_shipdate").as("d"))
        .agg(sum(expr("CAST(floor(l_extendedprice * 100) AS BIGINT)"))
          .as("y"))
      val idx = daily
        .withColumn("i", row_number().over(
          Window.partitionBy(graft.functions.DimKey.one).orderBy(col("d")))
          .cast("long"))
        .select("i", "y")
        .localCheckpoint(false)
      idx.as("a")
        .join(broadcast(idx.as("b")), col("b.i") > col("a.i"))
        .agg(count(lit(1)).as("n_pairs"),
             sum(when(col("b.y") > col("a.y"), 1L).otherwise(0L))
               .as("concordant"),
             sum(when(col("b.y") < col("a.y"), 1L).otherwise(0L))
               .as("discordant"),
             sum(when(col("b.y") === col("a.y"), 1L).otherwise(0L))
               .as("ties"))
        // sign-folded (q760 contract): C−D is signed, and n_pairs·1e6
        // ≤ ~3.2e12 at the 2.5k-day grid — int64 forever (calendar-bounded)
        .withColumn("tau_ppm", expr(
          """CASE WHEN concordant >= discordant
            |  THEN (concordant - discordant) * 1000000L DIV n_pairs
            |ELSE -((discordant - concordant) * 1000000L DIV n_pairs)
            |END""".stripMargin))
    }),
    "q813_theil_sen" -> ((s, dir) => {
      // Theil–Sen slope of daily revenue: the MEDIAN of all pairwise
      // slopes — the robust trend line (29% breakdown point) whose point
      // estimate the OLS fit (q751-style) can't give when outlier days
      // exist. Slopes in sign-folded milli-cents/day; median = the
      // ceil(n/2) order statistic (the quantile_disc convention, q732
      // tier) under the total order (slope, i, j). |days|² pairs on the
      // calendar-bounded grid; the one global window ranks pair-grain
      // rows, never fact rows.
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.spread(s, rd(s, dir, "lineitem"))
        .groupBy(col("l_shipdate").as("d"))
        .agg(sum(expr("CAST(floor(l_extendedprice * 100) AS BIGINT)"))
          .as("y"))
      val idx = daily
        .withColumn("i", row_number().over(
          Window.partitionBy(graft.functions.DimKey.one).orderBy(col("d")))
          .cast("long"))
        .select("i", "y")
        .localCheckpoint(false)
      // DISTRIBUTED exact order statistic (the |days|² slope multiset is
      // millions of near-unique values — a fact-grain global rank window
      // billed 8.1 s and a single-partition cell window no better): the
      // global cumulative splits into (a) one DIMENSION-sized window over
      // ~2k coarse buckets and (b) per-BUCKET cumulative windows that run
      // in parallel; global cum = bucket prefix + within-bucket prefix.
      // Truncating DIV bucketing is monotone in the slope, so bucket
      // order extends value order. The oracle keeps its one-window form —
      // only the median VALUE and pair count must agree.
      val cells = idx.as("a")
        .join(broadcast(idx.as("b")), col("b.i") > col("a.i"))
        .select(expr(
          // first arm guards the divisor: this plan's aggregate pushdown
          // evaluates the projection before the BNL condition filters
          // i-ties (ANSI mode makes that a hard DIVIDE_BY_ZERO); the join
          // condition still drops those rows, so results are unchanged
          """CASE WHEN b.i <= a.i THEN 0L
            |WHEN b.y >= a.y
            |  THEN (b.y - a.y) * 1000L DIV (b.i - a.i)
            |ELSE -((a.y - b.y) * 1000L DIV (b.i - a.i)) END""".stripMargin)
                  .as("slope_milli"))
        .groupBy(col("slope_milli")).agg(count(lit(1)).as("cnt"))
        .withColumn("bkt", expr("slope_milli DIV 1000000L"))
      val wb = Window.partitionBy(graft.functions.DimKey.one)
        .orderBy(col("bkt"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val bktTot = cells.groupBy(col("bkt")).agg(sum(col("cnt")).as("btot"))
        .withColumn("cum_b", sum(col("btot")).over(wb))
        .withColumn("before", col("cum_b") - col("btot"))
        .withColumn("n_pairs", sum(col("btot")).over(
          Window.partitionBy(graft.functions.DimKey.one)))
        .select("bkt", "before", "n_pairs")
      val ww = Window.partitionBy(col("bkt")).orderBy(col("slope_milli"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cells.join(broadcast(bktTot), Seq("bkt"))
        .withColumn("cum", col("before") + sum(col("cnt")).over(ww))
        .filter(expr("cum >= (n_pairs + 1L) DIV 2L AND " +
                     "cum - cnt < (n_pairs + 1L) DIV 2L"))
        .select(col("n_pairs"), col("slope_milli").as("median_slope_milli"))
    }),
    "q814_runs_test" -> ((s, dir) => {
      // Wald–Wolfowitz runs test on daily revenue vs its own median:
      // too FEW runs of above/below-median days = clustering/trend, too
      // MANY = oscillation — the randomness check that sees what the
      // records test (monotone trend only) cannot. Median = ceil(n/2)
      // order stat (quantile_disc convention); expected runs
      // E[R]·1e6 = 1e6 + 2·n1·n2·1e6 DIV n, all terms non-negative.
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.spread(s, rd(s, dir, "lineitem"))
        .groupBy(col("l_shipdate").as("d"))
        .agg(sum(expr("CAST(floor(l_extendedprice * 100) AS BIGINT)"))
          .as("y"))
        .localCheckpoint(false) // day-grain; read by the median AND flags
      val med = broadcast(daily
        .withColumn("r", row_number().over(
          Window.partitionBy(graft.functions.DimKey.one)
            .orderBy(col("y"), col("d"))).cast("long"))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy(graft.functions.DimKey.one)))
        .filter(expr("r = (n + 1L) DIV 2L"))
        .select(col("y").as("med")))
      val flagged = daily.crossJoin(med)
        .select(col("d"), (col("y") > col("med")).cast("long").as("f"))
      val wd = Window.partitionBy(graft.functions.DimKey.one)
        .orderBy(col("d"))
      flagged
        .withColumn("pf", lag(col("f"), 1).over(wd))
        .agg(count(lit(1)).as("n_days"),
             sum(col("f")).as("n1"),
             sum(lit(1L) - col("f")).as("n2"),
             sum(when(col("pf").isNull || col("pf") =!= col("f"), 1L)
               .otherwise(0L)).as("n_runs"))
        .withColumn("e_runs_ppm",
                    expr("1000000L + 2L * n1 * n2 * 1000000L DIV n_days"))
        .withColumn("excess_ppm",
                    expr("n_runs * 1000000L - e_runs_ppm"))
    }),
    "q815_cusum" -> ((s, dir) => {
      // CUSUM level-shift scan on daily revenue: the maximum |cumulative
      // deviation from the global mean| and the day it peaks — WHERE the
      // regime changed, not just whether (the changepoint companion to
      // q807/q811/q814). Exact integers: cum_k(n·y − Σy) = n·Σ_{≤k}y −
      // k·Σy avoids the truncated mean entirely. Envelope: n·Σy ≤
      // 2.5e3 · 2e14 cents ≈ 5e17 at 100× sf0.1 — int64 holds (day grid
      // is calendar-bounded).
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.spread(s, rd(s, dir, "lineitem"))
        .groupBy(col("l_shipdate").as("d"))
        .agg(sum(expr("CAST(floor(l_extendedprice * 100) AS BIGINT)"))
          .as("y"))
      val tot = broadcast(daily.agg(count(lit(1)).as("n"),
                                    sum(col("y")).as("sy")))
      val wd = Window.partitionBy(graft.functions.DimKey.one)
        .orderBy(col("d"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.crossJoin(tot)
        .withColumn("k", row_number().over(
          Window.partitionBy(graft.functions.DimKey.one).orderBy(col("d")))
          .cast("long"))
        .withColumn("cum", sum(col("y")).over(wd))
        .withColumn("dev", expr("abs(n * cum - k * sy)"))
        .orderBy(col("dev").desc, col("d"))
        .limit(1)
        .select(col("n").as("n_days"), col("dev").as("max_abs_cusum"),
                col("d").as("argmax_day"))
    }),
    "q816_benford" -> ((s, dir) => {
      // Benford first-digit screen on line prices — the bookkeeping
      // anomaly detector: fabricated or unit-mangled prices drift from
      // the log distribution. Expected shares pinned as the NINE exact
      // ppm literals (they sum to exactly 1e6), identical text in both
      // engines — no log() at query time; χ² in ppm units via
      // (obs−exp)² DIV exp summed over digits (squared → non-negative,
      // ≤ (1e6)² = 1e12 per term — int64 with room).
      import s.implicits._
      val exp = Seq(1L -> 301030L, 2L -> 176091L, 3L -> 124939L,
                    4L -> 96910L, 5L -> 79181L, 6L -> 66947L,
                    7L -> 57992L, 8L -> 51153L, 9L -> 45757L)
        .toDF("digit", "exp_ppm")
      val obs = Tables.spread(s, rd(s, dir, "lineitem"))
        .select(expr(
          "CAST(left(CAST(CAST(floor(l_extendedprice) AS BIGINT)" +
            " AS STRING), 1) AS BIGINT)").as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n_d"))
      val cells = broadcast(exp).join(obs, Seq("digit"), "left")
        .crossJoin(broadcast(obs.agg(sum(col("n_d")).as("n"))))
        .select(col("digit"), coalesce(col("n_d"), lit(0L)).as("n_d"),
                expr("coalesce(n_d, 0L) * 1000000L DIV n").as("obs_ppm"),
                col("exp_ppm"))
        .localCheckpoint() // 9 rows; read per digit AND by the chi2 rollup
      val chi2 = broadcast(cells.agg(
        sum(expr("(obs_ppm - exp_ppm) * (obs_ppm - exp_ppm) DIV exp_ppm"))
          .as("chi2_q")))
      cells.crossJoin(chi2)
        .select("digit", "n_d", "obs_ppm", "exp_ppm", "chi2_q")
    }),
    "q817_mood_median" -> ((s, dir) => {
      // Mood's median test between returned (R) and delivered (N) line
      // prices: the 2×2 above/below-grand-median table and its χ² — the
      // nonparametric location test that, unlike Mann–Whitney U (q765),
      // stays calibrated under unequal spreads. Grand median via the
      // CELL rollup (distinct cents values), never a fact-grain sort;
      // χ²·1000 = N·(ad−bc)²·1000 DIV (margins product) in DECIMAL(38)
      // ((ad−bc)² ≤ ~8e21 at sf0.1 — int64 dies, 128-bit holds to ~1e38).
      import org.apache.spark.sql.expressions.Window
      val x = Tables.spread(s, rd(s, dir, "lineitem"))
        .filter(col("l_returnflag").isin("R", "N"))
        .select((col("l_returnflag") === "R").cast("long").as("isr"),
                expr("CAST(floor(l_extendedprice * 100) AS BIGINT)")
                  .as("cents"))
        .localCheckpoint(false) // read by the median cells AND the 2x2
      val cells = x.groupBy(col("cents")).agg(count(lit(1)).as("cnt"))
      val wc = Window.partitionBy(graft.functions.DimKey.one)
        .orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val med = broadcast(cells
        .withColumn("cum", sum(col("cnt")).over(wc))
        .crossJoin(broadcast(cells.agg(sum(col("cnt")).as("nn"))))
        .filter(expr("cum >= (nn + 1L) DIV 2L"))
        .orderBy(col("cents")).limit(1)
        .select(col("cents").as("med")))
      x.crossJoin(med)
        .agg(sum(when(col("isr") === 1L && col("cents") > col("med"), 1L)
               .otherwise(0L)).as("a"),
             sum(when(col("isr") === 1L && col("cents") <= col("med"), 1L)
               .otherwise(0L)).as("b"),
             sum(when(col("isr") === 0L && col("cents") > col("med"), 1L)
               .otherwise(0L)).as("c"),
             sum(when(col("isr") === 0L && col("cents") <= col("med"), 1L)
               .otherwise(0L)).as("dd"))
        .withColumn("chi2_milli", expr(
          """CAST(CASE WHEN (a+b) = 0 OR (c+dd) = 0 OR (a+c) = 0
            |  OR (b+dd) = 0 THEN 0
            |ELSE (a + b + c + dd)
            |  * (CAST(a AS DECIMAL(38,0)) * dd - CAST(b AS DECIMAL(38,0)) * c)
            |  * (CAST(a AS DECIMAL(38,0)) * dd - CAST(b AS DECIMAL(38,0)) * c)
            |  * 1000
            |  DIV (CAST(a + b AS DECIMAL(38,0)) * (c + dd) * (a + c)
            |       * (b + dd))
            |END AS BIGINT)""".stripMargin))
    }),
    "q818_dup_jaccard_deciles" -> ((s, dir) => {
      // Similarity HISTOGRAM of the verified near-dup pairs: pair count +
      // exact ppm bounds per Jaccard decile — the curve a data lead reads
      // to pick the deletion threshold (a mass bump just above τ says the
      // corpus has a template family right at the boundary). One sealed
      // pair relation; deciles are jaccard_ppm DIV 100000 (τ = 1/2 floor
      // ⇒ buckets 5..10).
      val d = Tables.spread(s, rd(s, dir, "documents"))
      Dedup.minhashLshPairs(d, "doc_id", "text")
        .withColumn("jaccard_ppm",
                    expr("overlap * 1000000L DIV union_size"))
        .withColumn("decile", expr("jaccard_ppm DIV 100000L"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_pairs"),
             min(col("jaccard_ppm")).as("min_ppm"),
             max(col("jaccard_ppm")).as("max_ppm"))
    }),
    "q819_sign_test" -> ((s, dir) => {
      // Month-over-month SIGN test on total revenue: ups vs downs against
      // the fair-coin null, z²·1000 = (ups−downs)²·1000 DIV (ups+downs)
      // (squared → non-negative; ties excluded from the denominator, the
      // standard treatment). The coarsest, assumption-freest trend check —
      // reads straight off the month-grain rollup with one lag.
      import org.apache.spark.sql.expressions.Window
      val monthly = Tables.spread(s, rd(s, dir, "lineitem"))
        .groupBy(((year(col("l_shipdate")) - 1992) * 12 +
                   month(col("l_shipdate"))).cast("long").as("mi"))
        .agg(sum(expr("CAST(floor(l_extendedprice * 100) AS BIGINT)"))
          .as("y"))
      val wd = Window.partitionBy(graft.functions.DimKey.one)
        .orderBy(col("mi"))
      monthly
        .withColumn("py", lag(col("y"), 1).over(wd))
        .filter(col("py").isNotNull)
        .agg(count(lit(1)).as("n_steps"),
             sum(when(col("y") > col("py"), 1L).otherwise(0L)).as("ups"),
             sum(when(col("y") < col("py"), 1L).otherwise(0L)).as("downs"),
             sum(when(col("y") === col("py"), 1L).otherwise(0L)).as("ties"))
        .withColumn("z2_milli", expr(
          """CASE WHEN ups + downs = 0 THEN 0
            |ELSE (ups - downs) * (ups - downs) * 1000L DIV (ups + downs)
            |END""".stripMargin))
    }),
    "q820_bigram_bits" -> ((s, dir) => {
      // Corpus bigram PREDICTABILITY in float-free bits: per bigram type,
      // the integer log2 quantization bitlen(c1 DIV c12) of 1/p(w2|w1)
      // (bin() string length = ⌊log2⌋+1 in BOTH engines — the q796/q707
      // code-length discipline), token-weighted into a bits-per-token
      // rate. Boilerplate-heavy corpora read LOW (next token predictable);
      // the cross-entropy smell test beside Yule's K (q795) and the
      // template detectors, with zero float logs anywhere.
      val toks = Tables.spread(s, rd(s, dir, "documents"))
        .select(filter(TextAnalysis.tokens(col("text")), t => t =!= "")
          .as("t"))
        .filter(size(col("t")) >= 2)
      val c12 = toks
        .select(explode(expr(
          """transform(sequence(1, size(t) - 1),
            |  i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"""
            .stripMargin)).as("bg"))
        .groupBy(col("bg")).agg(count(lit(1)).as("c12"))
        .withColumn("w1", expr("split_part(bg, ' ', 1)"))
      val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
      c12.join(c1, Seq("w1"))
        .withColumn("bits", expr("CAST(length(bin(c1 DIV c12)) AS BIGINT)"))
        .agg(count(lit(1)).as("n_bigram_types"),
             sum(col("c12")).as("n_bigram_tokens"),
             sum(expr("c12 * bits")).as("total_bits"))
        .withColumn("bits_per_token_milli",
                    expr("total_bits * 1000L DIV n_bigram_tokens"))
    }),
    "q821_embedding_norms" -> ((s, dir) => {
      // Embedding-norm outlier screen: top-10 vectors by EXACT quantized
      // L2² — truncated/zero-padded or scale-corrupted vectors surface at
      // the extremes before any ANN index is built over them. Components
      // quantized floor(CAST(x AS DOUBLE)·1000) (the widen-then-floor
      // both engines reproduce bit-identically on the same float32
      // input); norm² ≤ dims·(10³·|x|max)² — int64 to |x| ~ 10⁶ at 128
      // dims. One narrow scan + one fold per vector, never a join.
      rd(s, dir, "embeddings")
        .select(col("vec_id"), col("label").cast("long").as("label"),
                expr(
          """aggregate(transform(embedding,
            |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0D) AS BIGINT)),
            |  0L, (acc, v) -> acc + v * v)""".stripMargin).as("norm2_e6"))
        .orderBy(col("norm2_e6").desc, col("vec_id"))
        .limit(10)
    }),
    "q822_iqr_fences" -> ((s, dir) => {
      // Tukey IQR fence screen per brand: exact q1/q3 (quantile_disc
      // ceil-order-stat convention, q732 tier) off the per-brand cell
      // rollup, fences at ±1.5·IQR in cents (×2 to stay integer:
      // fence·2 = 2·q3 + 3·IQR), and the count outside them — the boxplot
      // outlier census, exact in both engines. Never a fact-grain sort:
      // ranks ride the (brand, cents) cells.
      import org.apache.spark.sql.expressions.Window
      val x = Tables.spread(s, rd(s, dir, "lineitem"))
        .join(rd(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .select(col("p_brand").as("brand"),
                expr("CAST(floor(l_extendedprice * 100) AS BIGINT)")
                  .as("cents"))
        .localCheckpoint(false) // read by the quartile cells AND the census
      val cells = x.groupBy(col("brand"), col("cents"))
        .agg(count(lit(1)).as("cnt"))
      val wb = Window.partitionBy(col("brand")).orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ranked = cells
        .withColumn("cum", sum(col("cnt")).over(wb))
        .withColumn("n", sum(col("cnt")).over(
          Window.partitionBy(col("brand"))))
      val q1 = ranked.filter(expr("cum - cnt < (n + 3L) DIV 4L AND" +
          " cum >= (n + 3L) DIV 4L"))
        .select(col("brand"), col("cents").as("q1"))
      val q3 = ranked.filter(expr("cum - cnt < (3L * n + 3L) DIV 4L AND" +
          " cum >= (3L * n + 3L) DIV 4L"))
        .select(col("brand"), col("cents").as("q3"))
      x.join(broadcast(q1), Seq("brand")).join(broadcast(q3), Seq("brand"))
        .groupBy(col("brand"), col("q1"), col("q3"))
        .agg(count(lit(1)).as("n"),
             sum(when(col("cents") * 2L >
                 col("q3") * 2L + (col("q3") - col("q1")) * 3L, 1L)
               .otherwise(0L)).as("n_above"),
             sum(when(col("cents") * 2L <
                 col("q1") * 2L - (col("q3") - col("q1")) * 3L, 1L)
               .otherwise(0L)).as("n_below"))
        .select("brand", "q1", "q3", "n", "n_above", "n_below")
    }),
    "q823_supplier_gini" -> ((s, dir) => {
      // Revenue-concentration Gini across suppliers, EXACT: with revenues
      // sorted ascending and ranked 1..n, G·10⁶ = (2·Σk·y_k − (n+1)·Σy)
      // ·10⁶ DIV (n·Σy) — the closed form that needs one rank window over
      // the DIMENSION-sized supplier rollup, no pair join. Numerator
      // non-negative by the rearrangement inequality (ascending order
      // maximizes Σk·y_k ≥ (n+1)/2·Σy), so the DIV is floor in both
      // engines. Envelope: n·Σy ≲ 10⁴·2e14 = 2e18 at 100× sf0.1 — int64.
      val rev = Tables.spread(s, rd(s, dir, "lineitem"))
        .groupBy(col("l_suppkey").as("k"))
        .agg(sum(expr("CAST(floor(l_extendedprice * 100) AS BIGINT)"))
          .as("y"))
      // r15 optimization (r14 verdict task 3): supplier count scales with
      // SF — rank via Profile.cellRank (coarse-cell prefix + per-cell
      // parallel windows) instead of a single-task DimKey.one window;
      // identical ranks under the same (y, k) order.
      graft.operators.Profile.cellRank(rev, Seq.empty, "y", Seq("k"))
        .agg(count(lit(1)).as("n_suppliers"),
             sum(col("y")).as("total_cents"),
             sum(expr("_rank * y")).as("rank_weighted"))
        .withColumn("gini_ppm", expr(
          "(2L * rank_weighted - (n_suppliers + 1L) * total_cents)" +
            " * 1000000L DIV (n_suppliers * total_cents)"))
    }),
    "q824_lorenz_deciles" -> ((s, dir) => {
      // Lorenz curve of supplier revenue at the ten decile points:
      // cumulative revenue share (ppm) held by the bottom k·n DIV 10
      // suppliers — the curve behind q823's Gini scalar, read for "the
      // bottom half of suppliers carries X% of revenue". Rank window over
      // the dimension-sized rollup; decile membership by rank threshold,
      // shares cross-multiplied exact.
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val rev = Tables.spread(s, rd(s, dir, "lineitem"))
        .groupBy(col("l_suppkey").as("k"))
        .agg(sum(expr("CAST(floor(l_extendedprice * 100) AS BIGINT)"))
          .as("y"))
      val ranked = rev
        .withColumn("r", row_number().over(
          Window.partitionBy(graft.functions.DimKey.one)
            .orderBy(col("y"), col("k"))).cast("long"))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy(graft.functions.DimKey.one)))
        .withColumn("tot", sum(col("y")).over(
          Window.partitionBy(graft.functions.DimKey.one)))
      val ds = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L).toDF("decile")
      ranked.crossJoin(broadcast(ds))
        .filter(expr("r <= n * decile DIV 10L"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_suppliers"),
             expr("sum(y)").as("cum_cents"),
             max(col("tot")).as("tot"))
        .withColumn("cum_share_ppm",
                    expr("cum_cents * 1000000L DIV tot"))
        .select("decile", "n_suppliers", "cum_cents", "cum_share_ppm")
    }),
    "q825_priority_chi2" -> ((s, dir) => {
      // Order-priority × order-status independence χ²: per cell the
      // cross-multiplied term (o·N − rm·cm)²·10³ DIV (N·rm·cm) — a
      // priority lane whose status mix drifts from the marginals lights
      // up here before any per-lane drill-down. Cell/margin tables are
      // category-sized (≤ 5×3); the per-cell numerator (o·N ≈ 2e10 at
      // sf0.1, squared ≈ 5e20) rides DECIMAL(38)/HUGEINT — the q546
      // convention.
      val x = rd(s, dir, "orders")
        .select(col("o_orderpriority").as("m"), col("o_orderstatus").as("f"))
        .localCheckpoint(false) // cells + margins read it
      val cells = x.groupBy(col("m"), col("f")).agg(count(lit(1)).as("o"))
      val rm = x.groupBy(col("m")).agg(count(lit(1)).as("rm"))
      val cm = x.groupBy(col("f")).agg(count(lit(1)).as("cm"))
      val nn = broadcast(x.agg(count(lit(1)).as("nn")))
      cells.join(broadcast(rm), Seq("m")).join(broadcast(cm), Seq("f"))
        .crossJoin(nn)
        .withColumn("term_milli", expr(
          """CAST((CAST(o AS DECIMAL(38,0)) * nn - CAST(rm AS DECIMAL(38,0)) * cm)
            | * (CAST(o AS DECIMAL(38,0)) * nn - CAST(rm AS DECIMAL(38,0)) * cm)
            | * 1000 DIV (CAST(nn AS DECIMAL(38,0)) * rm * cm)
            | AS BIGINT)""".stripMargin))
        .agg(count(lit(1)).as("n_cells"),
             sum(col("term_milli")).as("chi2_milli"))
    }),
    "q826_ttr_by_length" -> ((s, dir) => {
      // Type-token ratio by document-length bucket — the template smell
      // read at DOC grain (q795's Yule's K reads it at source grain):
      // natural text's TTR falls with length; template families show
      // anomalously LOW TTR at every length. Per-doc exact ppm ratio,
      // averaged per bucket with one more pinned DIV; bucket = tokens
      // DIV 10.
      val t = Tables.spread(s, rd(s, dir, "documents"))
        .select(filter(TextAnalysis.tokens(col("text")), x => x =!= "")
          .as("t"))
        .filter(size(col("t")) > 0)
        .select(size(col("t")).cast("long").as("toks"),
                size(array_distinct(col("t"))).cast("long").as("types"))
      t.withColumn("ttr_ppm", expr("types * 1000000L DIV toks"))
        .groupBy(expr("toks DIV 10L").as("len_bucket"))
        .agg(count(lit(1)).as("n_docs"),
             sum(col("toks")).as("n_tokens"),
             sum(col("ttr_ppm")).as("ttr_sum"))
        .withColumn("mean_ttr_ppm", expr("ttr_sum DIV n_docs"))
        .select("len_bucket", "n_docs", "n_tokens", "mean_ttr_ppm")
    }),
    "q827_interarrival_expcheck" -> ((s, dir) => {
      // Exponential-interarrival check on the global order stream: for an
      // exponential process mean/median = 1/ln2 ≈ 1.4427, so the exact
      // mean·10³ DIV median of day gaps between consecutive orders is a
      // one-number burstiness diagnostic (heavy clustering reads HIGH).
      // Gaps via one lag over the day-grain order counts; median = the
      // ceil(n/2) order stat on the gap cells.
      import org.apache.spark.sql.expressions.Window
      val days = rd(s, dir, "orders")
        .select(col("o_orderdate").as("d")).distinct()
      val gaps = days
        .withColumn("pd", lag(col("d"), 1).over(
          Window.partitionBy(graft.functions.DimKey.one).orderBy(col("d"))))
        .filter(col("pd").isNotNull)
        .select(datediff(col("d"), col("pd")).cast("long").as("g"))
        .localCheckpoint(false) // read by the mean agg AND the median cells
      val cells = gaps.groupBy(col("g")).agg(count(lit(1)).as("cnt"))
      val wc = Window.partitionBy(graft.functions.DimKey.one)
        .orderBy(col("g"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val med = broadcast(cells
        .withColumn("cum", sum(col("cnt")).over(wc))
        .crossJoin(broadcast(cells.agg(sum(col("cnt")).as("nn"))))
        .filter(expr("cum >= (nn + 1L) DIV 2L"))
        .orderBy(col("g")).limit(1)
        .select(col("g").as("med")))
      gaps.crossJoin(med)
        .agg(count(lit(1)).as("n_gaps"),
             sum(col("g")).as("sum_gaps"),
             max(col("med")).as("median_gap"))
        .withColumn("mean_milli", expr("sum_gaps * 1000L DIV n_gaps"))
        .withColumn("mean_over_median_milli", expr(
          "sum_gaps * 1000L DIV (n_gaps * median_gap)"))
        .select("n_gaps", "sum_gaps", "median_gap", "mean_milli",
                "mean_over_median_milli")
    }),
    "q828_label_centroid_spread" -> ((s, dir) => {
      // Embedding cluster tightness by LABEL: exact integer centroid
      // (component mean in the quantized grid, truncating DIV) and the
      // mean squared distance to it — labels whose members scatter widely
      // are mislabeled or heterogeneous, read BEFORE training a probe on
      // them. Two narrow passes (moments, then distances), centroids
      // broadcast; components quantized floor(double-widened ·10³) like
      // q821. ssd envelope: dims·(2·10³)²·n ≈ 1e13 at sf0.1 — int64.
      val q = rd(s, dir, "embeddings")
        .select(col("vec_id"), col("label").cast("long").as("label"),
                posexplode(expr(
          """transform(embedding,
            |  x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0D) AS BIGINT))"""
            .stripMargin)).as(Seq("dim", "qx")))
        .localCheckpoint(false) // moments AND distances read it
      // sign-folded (q760 contract): component sums go negative, and
      // Spark DIV truncates toward zero while DuckDB // floors
      val cent = q.groupBy(col("label"), col("dim"))
        .agg(expr(
          """CASE WHEN sum(qx) >= 0 THEN sum(qx) DIV count(1)
            |ELSE -((-sum(qx)) DIV count(1)) END""".stripMargin).as("c"))
      q.join(broadcast(cent), Seq("label", "dim"))
        .groupBy(col("label"))
        .agg(countDistinct(col("vec_id")).as("n_vecs"),
             sum(expr("(qx - c) * (qx - c)")).as("ssd"))
        .withColumn("mean_d2", expr("ssd DIV n_vecs"))
        .select("label", "n_vecs", "ssd", "mean_d2")
    }),
    "q829_dup_cross_source" -> ((s, dir) => {
      // Near-dup pair provenance: how many verified pairs stay WITHIN one
      // source vs cross two — the leakage direction matters (cross-source
      // dups mean scrapers copied each other; within-source dups mean
      // re-crawls). Sealed pair relation joined twice to the doc→source
      // map (broadcast — dimension-sized at any corpus scale).
      val d = Tables.spread(s, rd(s, dir, "documents"))
      val src = d.select(col("doc_id"), col("source"))
      Dedup.minhashLshPairs(d, "doc_id", "text")
        .join(broadcast(src.select(col("doc_id").as("doc_a"),
                                   col("source").as("sa"))), Seq("doc_a"))
        .join(broadcast(src.select(col("doc_id").as("doc_b"),
                                   col("source").as("sb"))), Seq("doc_b"))
        .groupBy(least(col("sa"), col("sb")).as("source_lo"),
                 greatest(col("sa"), col("sb")).as("source_hi"))
        .agg(count(lit(1)).as("n_pairs"),
             sum(when(col("sa") === col("sb"), 1L).otherwise(0L))
               .as("n_within"))
    }),
    "q830_quantity_autocorr" -> ((s, dir) => {
      // Lag-k autocorrelation of daily total quantity at k ∈ {1, 7, 30}
      // in exact ppm: r_k = Σ(n·y_t − S)(n·y_{t+k} − S) / Σ(n·y_t − S)² —
      // deviations in the n-scaled integer form (no truncated mean), the
      // 128-bit product sums the q546 convention, one index self-join per
      // lag on the calendar-bounded day grid. The weekly/monthly
      // seasonality readout (r_7 high = weekday structure) beside q807's
      // variance ratio.
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val daily = Tables.spread(s, rd(s, dir, "lineitem"))
        .groupBy(col("l_shipdate").as("d"))
        .agg(sum(expr("CAST(l_quantity AS BIGINT)")).as("y"))
      val idx = daily
        .withColumn("i", row_number().over(
          Window.partitionBy(graft.functions.DimKey.one).orderBy(col("d")))
          .cast("long"))
        .select("i", "y")
        .localCheckpoint(false) // totals + both join sides read it
      val tot = broadcast(idx.agg(count(lit(1)).as("n"),
                                  sum(col("y")).as("sy")))
      val den = broadcast(idx.crossJoin(tot)
        .agg(sum(expr(
          "CAST(n * y - sy AS DECIMAL(38,0)) * (n * y - sy)")).as("den")))
      val ks = Seq(1L, 7L, 30L).toDF("k")
      idx.crossJoin(broadcast(ks))
        .join(idx.select(col("i").as("i2"), col("y").as("y2")),
              col("i2") === col("i") + col("k"))
        .crossJoin(tot)
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n_terms"),
             sum(expr(
               "CAST(n * y - sy AS DECIMAL(38,0)) * (n * y2 - sy)"))
               .as("num"))
        .crossJoin(den)
        .withColumn("r_ppm", expr(
          """CAST(CASE WHEN num >= 0 THEN num * 1000000 DIV den
            |ELSE -((-num) * 1000000 DIV den) END AS BIGINT)"""
            .stripMargin))
        .select("k", "n_terms", "r_ppm")
    }),
    "q831_revenue_tail_ladder" -> ((s, dir) => {
      // Pareto-tail doubling ladder of supplier revenue: per bit-length
      // rung k (= ⌊log₂y⌋+1, the q796/q707 float-free log), the supplier
      // count at the rung, the survivor count at ≥2^(k−1), and the
      // survivor RATIO to the next rung (a flat ratio across rungs = a
      // power-law tail; a collapsing one = exponential). Suffix-sum
      // window over the ≤40-rung ladder — dimension-sized by
      // construction.
      import org.apache.spark.sql.expressions.Window
      val rev = Tables.spread(s, rd(s, dir, "lineitem"))
        .groupBy(col("l_suppkey").as("k"))
        .agg(sum(expr("CAST(floor(l_extendedprice * 100) AS BIGINT)"))
          .as("y"))
      val rungs = rev
        .groupBy(expr("CAST(length(bin(y)) AS BIGINT)").as("rung"))
        .agg(count(lit(1)).as("n_at"))
      val wSuf = Window.partitionBy(graft.functions.DimKey.one)
        .orderBy(col("rung").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      rungs
        .withColumn("n_ge", sum(col("n_at")).over(wSuf))
        .withColumn("next_ge", lag(col("n_ge"), 1).over(
          Window.partitionBy(graft.functions.DimKey.one)
            .orderBy(col("rung").desc)))
        .withColumn("next_ratio_ppm",
                    expr("coalesce(next_ge * 1000000L DIV n_ge, 0L)"))
        .select("rung", "n_at", "n_ge", "next_ratio_ppm")
    }),
    "q832_basket_entropy_bits" -> ((s, dir) => {
      // Basket-size entropy in float-free bits (the q820 bitlen-log
      // discipline): H ≈ Σ n_c·bitlen(N DIV n_c)·10³ DIV N milli-bits
      // over the items-per-order distribution — one number for "how
      // predictable is basket size" (a template/synthetic order stream
      // reads LOW). Cell rollup first; the entropy fold sees only
      // distinct sizes.
      val sizes = Tables.spread(s, rd(s, dir, "lineitem"))
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("c"))
      val cells = sizes.groupBy(col("c")).agg(count(lit(1)).as("n_c"))
      cells
        .crossJoin(broadcast(cells.agg(sum(col("n_c")).as("n"))))
        .agg(max(col("n")).as("n_orders"),
             count(lit(1)).as("n_sizes"),
             sum(expr("n_c * CAST(length(bin(n DIV n_c)) AS BIGINT)"))
               .as("total_bits"))
        .withColumn("h_milli_bits",
                    expr("total_bits * 1000L DIV n_orders"))
    }),
    "q833_lsh_exact_confusion" -> ((s, dir) => {
      // MinHash-LSH vs the exact n-gram Jaccard baseline at the SAME
      // τ = 1/2: verified-pair counts, the misses (exact pairs the
      // banding never collided), and the spurious count PINNED at zero —
      // LSH candidates pass the exact verification, so lsh ⊆ exact is an
      // invariant either engine would fail loudly if the pipelines ever
      // diverged. The measured-recall companion to q282's estimate and
      // q762's analytic curve.
      val d = Tables.spread(s, rd(s, dir, "documents"))
      val exact = Dedup.ngramJaccardPairs(d, "doc_id", "text")
        .select("doc_a", "doc_b")
      val lsh = Dedup.minhashLshPairs(d, "doc_id", "text")
        .select("doc_a", "doc_b")
      val nE = exact.agg(count(lit(1)).as("n_exact"))
      val nL = lsh.agg(count(lit(1)).as("n_lsh"))
      val miss = exact.join(lsh, Seq("doc_a", "doc_b"), "left_anti")
        .agg(count(lit(1)).as("n_missed"))
      val spur = lsh.join(exact, Seq("doc_a", "doc_b"), "left_anti")
        .agg(count(lit(1)).as("n_spurious"))
      nE.crossJoin(broadcast(nL)).crossJoin(broadcast(miss))
        .crossJoin(broadcast(spur))
        .withColumn("recall_ppm", expr(
          "CASE WHEN n_exact = 0 THEN 1000000L" +
            " ELSE n_lsh * 1000000L DIV n_exact END"))
    }),
    "q834_seasonality_strength" -> ((s, dir) => {
      // Month-of-year seasonality strength of daily revenue: between-
      // group share of total variance in pinned ppm — the "is there a
      // calendar signal worth modeling" scalar beside q830's
      // autocorrelation. The statistic is DEFINED on milli-cent
      // TRUNCATED means (dmu = sm·10³ DIV nm − sy·10³ DIV n, both DIVs
      // over non-negative sums so floor == truncate in both engines):
      // the fully n-scaled deviation form looked exact but its
      // dm² DIV nm term silently demanded a >int64 LONG (the q810
      // DIV-returns-LONG contract — first caught by ANSI overflow here).
      // ssb·10⁶ = Σ nm·dmu² and n·SST = n·syy − sy² both ride
      // DECIMAL(38); strength_ppm = ssb_k2·n DIV sst2 with a provably
      // ≤10⁶ LONG result. Envelope: ssb_k2·n ≈ 5e30 at sf0.1, inside
      // DECIMAL(38) to ~100× day-grain revenue.
      val daily = Tables.spread(s, rd(s, dir, "lineitem"))
        .groupBy(col("l_shipdate").as("d"))
        .agg(sum(expr("CAST(floor(l_extendedprice * 100) AS BIGINT)"))
          .as("y"))
        .withColumn("m", month(col("d")).cast("long"))
        .localCheckpoint(false) // totals + month cells read it
      val tot = broadcast(daily.agg(
        count(lit(1)).as("n"), sum(col("y")).as("sy"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy")))
      val months = daily.groupBy(col("m"))
        .agg(count(lit(1)).as("nm"), sum(col("y")).as("sm"))
      months.crossJoin(tot)
        .withColumn("dmu", expr("sm * 1000L DIV nm - sy * 1000L DIV n"))
        .agg(max(col("n")).as("n_days"),
             count(lit(1)).as("n_months"),
             sum(expr("nm * CAST(dmu AS DECIMAL(38,0)) * dmu"))
               .as("ssb_k2"),
             max(expr(
               "CAST(n AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy"))
               .as("sst2"))
        // ssb_k2 = SSB·10⁶ and sst2 = n·SST, so the ppm ratio is ONE DIV:
        // (SSB·10⁶)·n / (n·SST) = ssb_k2·n DIV sst2
        .withColumn("strength_ppm", expr(
          """CAST(CASE WHEN sst2 = 0 THEN 0
            |ELSE ssb_k2 * n_days DIV sst2 END AS BIGINT)""".stripMargin))
        .select("n_days", "n_months", "strength_ppm")
    }),
    "q835_spearman_midrank" -> ((s, dir) => {
      // Spearman rank correlation between line price and quantity, EXACT
      // with ties via doubled midranks (the q765 convention:
      // midrank2(v) = 2·cnt(<v) + cnt(=v) + 1 keeps everything integer):
      // ρ·10⁶ = 10⁶ − 6·Σd²·10⁶ DIV (4·n·(n²−1)) with d = the doubled
      // rank difference. Ranks ride the value-CELL rollups (one prefix
      // window over each variable's distinct values, never a fact-grain
      // sort); facts join the two broadcast rank maps. Σd² ≈ 9e17 at
      // sf0.1 and the ppm numerator needs 128-bit — the q546 convention.
      import org.apache.spark.sql.expressions.Window
      val x = Tables.spread(s, rd(s, dir, "lineitem"))
        .select(expr("CAST(floor(l_extendedprice * 100) AS BIGINT)")
                  .as("px"),
                expr("CAST(l_quantity AS BIGINT)").as("qy"))
        .localCheckpoint(false) // two rank maps + the fact join read it
      def rankMap(c: String) = {
        val cells = x.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy(graft.functions.DimKey.one)
          .orderBy(col(c))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        cells.withColumn("cum", sum(col("cnt")).over(w))
          .select(col(c),
                  (lit(2L) * (col("cum") - col("cnt")) + col("cnt") + 1L)
                    .as(s"r_$c"))
      }
      x.join(broadcast(rankMap("px")), Seq("px"))
        .join(broadcast(rankMap("qy")), Seq("qy"))
        .agg(count(lit(1)).as("n"),
             sum(expr(
               "CAST(r_px - r_qy AS DECIMAL(38,0)) * (r_px - r_qy)"))
               .as("sum_d2"))
        .withColumn("rho_ppm", expr(
          """CAST(1000000 - 6 * sum_d2 * 1000000
            | DIV (4 * CAST(n AS DECIMAL(38,0)) * (n * n - 1))
            | AS BIGINT)""".stripMargin))
        // sum_d2 stays internal (≈4n³ passes int64 only to ~10⁶ rows;
        // the 128-bit value would stringify differently per engine)
        .select(col("n"), col("rho_ppm"))
    }),
    "q800_cohens_d" -> ((s, dir) => {
      // Cohen's d standardized effect size between returned (R) and
      // delivered (N) line prices — the "is the significant difference
      // LARGE?" companion the test tier (t/z/U/KS) lacks. Pooled SD via
      // exact integer sums-of-squares in 128-bit (per-row cents² ≈ 10¹⁴
      // sums past int64 at sf0.1's 6·10⁵ rows), variance VALUE back in
      // int64 (≤ ~10¹¹ cents²) so isqrt is the exact q732 floor; d in
      // signed milli with the mean difference cross-multiplied, never
      // per-group truncated means.
      val x = Tables.spread(s, rd(s, dir, "lineitem"))
        .filter(col("l_returnflag").isin("R", "N"))
        .select(col("l_returnflag").as("g"),
                expr("CAST(floor(l_extendedprice * 100) AS BIGINT)")
                  .as("cents"))
      x.agg(
          sum(when(col("g") === "R", 1L).otherwise(0L)).as("nr"),
          sum(when(col("g") === "R", col("cents")).otherwise(0L)).as("sr"),
          sum(when(col("g") === "R",
                   expr("CAST(cents AS DECIMAL(38,0)) * cents"))
            .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("ssr"),
          sum(when(col("g") === "N", 1L).otherwise(0L)).as("nn"),
          sum(when(col("g") === "N", col("cents")).otherwise(0L)).as("sn"),
          sum(when(col("g") === "N",
                   expr("CAST(cents AS DECIMAL(38,0)) * cents"))
            .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("ssn"))
        .withColumn("pooled_var_c2", expr(
          """CAST((ssr - CAST(sr AS DECIMAL(38,0)) * sr DIV nr
            |  + ssn - CAST(sn AS DECIMAL(38,0)) * sn DIV nn)
            |  DIV (nr + nn - 2) AS BIGINT)""".stripMargin))
        .withColumn("sd_cents", expr(
          "CAST(floor(sqrt(CAST(pooled_var_c2 AS DOUBLE))) AS BIGINT)"))
        .withColumn("d_milli", expr(
          // each per-group term is non-negative (cents sums), so the two
          // truncating DIV chains are floor in both engines and the signed
          // DIFFERENCE is exact-defined without a sign fold
          """CAST(CASE WHEN sd_cents = 0 THEN 0
            |ELSE
            |  CAST(sr AS DECIMAL(38,0)) * nn * 1000 DIV (nr * nn)
            |    DIV sd_cents
            |  - CAST(sn AS DECIMAL(38,0)) * nr * 1000 DIV (nr * nn)
            |    DIV sd_cents
            |END AS BIGINT)""".stripMargin))
        .select("nr", "nn", "pooled_var_c2", "sd_cents", "d_milli")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q793_point_probe_dedup" ->
      s"""WITH probe AS (SELECT doc_id + 1000000 AS doc_id, text
         |  FROM documents WHERE doc_id IN (${ProbeSrcIds.mkString(", ")})),
         |docs2 AS (SELECT doc_id, text FROM documents
         |    WHERE doc_id % 3 <> 0 AND doc_id < 3000
         |  UNION ALL SELECT doc_id, text FROM probe),
         |toks AS (SELECT doc_id, text,
         |  regexp_split_to_array(lower(trim(text)), '\\s+') AS t FROM docs2),
         |${SparkEntry.shingleCteFor("sh3", 3)},
         |shx AS (SELECT doc_id, unnest(shs) AS s FROM sh3),
         |sizes AS (SELECT doc_id, count(*) AS n FROM shx GROUP BY 1),
         |mh AS (SELECT doc_id,
         |${(0 until 12).map(i =>
            s"  list_min(list_transform(shs, s -> md5('$i-' || s))) AS m$i")
            .mkString(",\n")}
         |FROM sh3),
         |bands AS (SELECT doc_id, unnest([
         |${(0 until 4).map(b =>
            s"  '$b:' || md5(m${3 * b} || '|' || m${3 * b + 1} || '|' || m${3 * b + 2})")
            .mkString(",\n")}
         |]) AS bk FROM mh),
         |obs AS (SELECT doc_id, bk FROM bands WHERE doc_id < 1000000),
         |nbs AS (SELECT doc_id, bk FROM bands WHERE doc_id >= 1000000),
         |nd AS (SELECT count(*) AS ndocs FROM docs2),
         |sz AS (SELECT o.bk, o.omin,
         |    (o.bo <= ${Dedup.DefaultMaxBucket}
         |     AND nn.bn <= ${Dedup.DefaultMaxBucket}
         |     AND o.bo * nn.bn <= ${Dedup.PairBudgetFactor}
         |       * (SELECT ndocs FROM nd)) AS ok
         |  FROM (SELECT bk, count(*) AS bo, min(doc_id) AS omin
         |        FROM obs GROUP BY 1) o
         |  JOIN (SELECT bk, count(*) AS bn FROM nbs GROUP BY 1) nn
         |    ON nn.bk = o.bk),
         |cand AS (SELECT DISTINCT new_id, old_id FROM (
         |  SELECT n2.doc_id AS new_id, o2.doc_id AS old_id
         |  FROM nbs n2 JOIN sz ON sz.bk = n2.bk AND sz.ok
         |    JOIN obs o2 ON o2.bk = n2.bk
         |  UNION ALL
         |  SELECT n2.doc_id, sz.omin
         |  FROM nbs n2 JOIN sz ON sz.bk = n2.bk AND NOT sz.ok) cu),
         |pairs AS (SELECT c.new_id, c.old_id, count(*) AS overlap
         |  FROM cand c JOIN shx x ON x.doc_id = c.new_id
         |    JOIN shx y ON y.doc_id = c.old_id AND y.s = x.s
         |  GROUP BY 1, 2)
         |SELECT new_id, old_id, CAST(overlap AS BIGINT) AS overlap,
         |  CAST(sx.n + sy.n - overlap AS BIGINT) AS union_size
         |FROM pairs JOIN sizes sx ON sx.doc_id = new_id
         |  JOIN sizes sy ON sy.doc_id = old_id
         |WHERE overlap * 2 >= (sx.n + sy.n - overlap) * 1""".stripMargin,
    "q794_matthews_mcc" ->
      s"""WITH ${SparkEntry.ToksCte},
         |fl AS (SELECT (d.n_chars >= 300) AS f1, (len(tk.t) >= 50) AS f2
         |       FROM toks tk JOIN documents d USING (doc_id)),
         |cells AS (SELECT
         |  CAST(sum(CASE WHEN f1 AND f2 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |  CAST(sum(CASE WHEN f1 AND NOT f2 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |  CAST(sum(CASE WHEN NOT f1 AND f2 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         |  CAST(sum(CASE WHEN NOT f1 AND NOT f2 THEN 1 ELSE 0 END) AS BIGINT) AS tn
         |  FROM fl),
         |nm AS (SELECT tp, fp, fn, tn,
         |  CAST(tp * tn - fp * fn AS BIGINT) AS mcc_num FROM cells)
         |SELECT tp, fp, fn, tn, mcc_num,
         |  CAST(CASE WHEN tp+fp = 0 OR tp+fn = 0 OR tn+fp = 0
         |    OR tn+fn = 0 THEN 0
         |  WHEN mcc_num >= 0 THEN mcc_num * 1000000 //
         |    (CAST(floor(sqrt(CAST((tp+fp)*(tp+fn) AS DOUBLE))) AS BIGINT)
         |     * CAST(floor(sqrt(CAST((tn+fp)*(tn+fn) AS DOUBLE))) AS BIGINT))
         |  ELSE -((-mcc_num) * 1000000 //
         |    (CAST(floor(sqrt(CAST((tp+fp)*(tp+fn) AS DOUBLE))) AS BIGINT)
         |     * CAST(floor(sqrt(CAST((tn+fp)*(tn+fn) AS DOUBLE))) AS BIGINT)))
         |  END AS BIGINT) AS mcc_ppm
         |FROM nm""".stripMargin,
    "q795_yules_k" ->
      s"""WITH ${SparkEntry.ToksCte},
         |tfq AS (SELECT d.source, u.w, count(*) AS tf
         |  FROM toks tk JOIN documents d USING (doc_id),
         |    unnest(tk.t) AS u(w)
         |  GROUP BY 1, 2),
         |agg AS (SELECT source,
         |  CAST(sum(tf) AS BIGINT) AS n_tokens,
         |  CAST(count(*) AS BIGINT) AS vocab,
         |  CAST(sum(tf * tf) AS BIGINT) AS s2,
         |  CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax
         |  FROM tfq GROUP BY 1)
         |SELECT source, n_tokens, vocab, hapax,
         |  CAST(hapax * 1000000 // vocab AS BIGINT) AS hapax_ppm,
         |  CAST((s2 - n_tokens) * 10000 // (n_tokens * n_tokens) AS BIGINT)
         |    AS yules_k_e4
         |FROM agg""".stripMargin,
    "q796_link_prediction" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
        |               FROM lineitem),
        |p AS MATERIALIZED (SELECT a.i AS x, c.i AS y
        |      FROM items a JOIN items c ON a.b = c.b AND a.i < c.i
        |      GROUP BY 1, 2 HAVING count(*) >= 2),
        |sym AS MATERIALIZED (SELECT x AS src, y AS dst FROM p
        |        UNION ALL SELECT y, x FROM p),
        |deg AS MATERIALIZED (SELECT src AS node,
        |  CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY 1),
        |w AS (SELECT e1.dst AS u, e2.dst AS v, e1.src AS z
        |  FROM sym e1 JOIN sym e2
        |    ON e1.src = e2.src AND e1.dst < e2.dst
        |  WHERE NOT EXISTS (SELECT 1 FROM p
        |    WHERE p.x = e1.dst AND p.y = e2.dst)),
        |ag AS (SELECT u, v, CAST(count(*) AS BIGINT) AS cn,
        |    CAST(sum(1000000 // length(bin(dz.deg))) AS BIGINT) AS aa_q
        |  FROM w JOIN deg dz ON dz.node = w.z GROUP BY 1, 2)
        |SELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v, cn, aa_q,
        |  CAST(cn * 1000000 // (du.deg + dv.deg - cn) AS BIGINT)
        |    AS jaccard_ppm
        |FROM ag JOIN deg du ON du.node = ag.u
        |  JOIN deg dv ON dv.node = ag.v
        |ORDER BY aa_q DESC, cn DESC, u, v LIMIT 10""".stripMargin,
    "q797_two_proportion_z" ->
      """WITH cells AS (SELECT
        |  CAST(sum(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n1,
        |  CAST(sum(CASE WHEN o_orderkey % 2 = 0 AND o_orderstatus = 'F'
        |    THEN 1 ELSE 0 END) AS BIGINT) AS x1,
        |  CAST(sum(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n2,
        |  CAST(sum(CASE WHEN o_orderkey % 2 = 1 AND o_orderstatus = 'F'
        |    THEN 1 ELSE 0 END) AS BIGINT) AS x2
        |  FROM orders)
        |SELECT n1, x1, n2, x2,
        |  CAST(x1 * 1000000 // n1 AS BIGINT) AS p1_ppm,
        |  CAST(x2 * 1000000 // n2 AS BIGINT) AS p2_ppm,
        |  CAST(CASE WHEN x1 + x2 = 0 OR x1 + x2 = n1 + n2 THEN 0
        |  ELSE CAST(x1 * n2 - x2 * n1 AS HUGEINT)
        |    * (x1 * n2 - x2 * n1) * (n1 + n2) * 1000
        |    // (CAST(n1 AS HUGEINT) * n2 * (x1 + x2)
        |        * (n1 + n2 - x1 - x2))
        |  END AS BIGINT) AS z2_milli
        |FROM cells""".stripMargin,
    "q798_rule_conviction" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS i
        |               FROM lineitem),
        |nb0 AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS nb FROM items),
        |ia AS (SELECT i, CAST(count(*) AS BIGINT) AS ci
        |       FROM items GROUP BY 1),
        |top AS (SELECT a.i AS x, c.i AS y, CAST(count(*) AS BIGINT) AS cab
        |  FROM items a JOIN items c ON a.o = c.o AND a.i < c.i
        |  GROUP BY 1, 2 ORDER BY cab DESC, x, y LIMIT 10),
        |rules AS (SELECT x AS ante, y AS cons, cab FROM top
        |  UNION ALL SELECT y, x, cab FROM top)
        |SELECT CAST(ante AS BIGINT) AS ante, CAST(cons AS BIGINT) AS cons,
        |  cab, ca.ci AS ca, cb.ci AS cb,
        |  CAST(cab * 1000000 // ca.ci AS BIGINT) AS conf_ppm,
        |  CAST(cab * nb * 1000000 // (ca.ci * cb.ci) AS BIGINT) AS lift_ppm,
        |  CAST(CASE WHEN ca.ci = cab THEN 1 ELSE 0 END AS BIGINT)
        |    AS conv_inf,
        |  CAST(CASE WHEN ca.ci = cab THEN -1 ELSE
        |    (nb - cb.ci) * ca.ci * 1000000 // ((ca.ci - cab) * nb) END
        |    AS BIGINT) AS conviction_ppm,
        |  CAST(cab * 1000000 // nb
        |    - (ca.ci * 1000000 // nb) * (cb.ci * 1000000 // nb) // 1000000
        |    AS BIGINT) AS leverage_ppm
        |FROM rules JOIN ia ca ON ca.i = rules.ante
        |  JOIN ia cb ON cb.i = rules.cons
        |  CROSS JOIN nb0""".stripMargin,
    "q799_dup_cluster_sizes" ->
      s"""WITH RECURSIVE ${SparkEntry.MinhashPairsCtes},
         |vp AS (${SparkEntry.JaccardTailSql}),
         |e AS (SELECT doc_a AS src, doc_b AS dst FROM vp
         |      UNION SELECT doc_b, doc_a FROM vp),
         |reach AS (
         |  SELECT src AS node, src AS lab FROM e
         |  UNION
         |  SELECT e.dst, r.lab FROM reach r JOIN e ON e.src = r.node
         |),
         |cc AS (SELECT node AS doc_id, min(lab) AS cluster_id
         |       FROM reach GROUP BY node),
         |sized AS (SELECT doc_id, cluster_id,
         |    count(*) OVER (PARTITION BY cluster_id) AS cluster_size
         |  FROM cc)
         |SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
         |  CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
         |  CAST(count(*) AS BIGINT) AS n_docs
         |FROM sized GROUP BY 1""".stripMargin,
    "q806_dedup_percolation" ->
      s"""WITH RECURSIVE ${SparkEntry.MinhashPairsCtes},
         |vp AS (${SparkEntry.JaccardTailSql}),
         |e50 AS (SELECT doc_a AS src, doc_b AS dst FROM vp
         |        UNION SELECT doc_b, doc_a FROM vp),
         |r50 AS (SELECT src AS node, src AS lab FROM e50
         |  UNION SELECT e50.dst, r50.lab FROM r50
         |    JOIN e50 ON e50.src = r50.node),
         |c50 AS (SELECT cid, count(*) AS cnt FROM (
         |  SELECT node, min(lab) AS cid FROM r50 GROUP BY 1) GROUP BY 1),
         |v60 AS (SELECT doc_a, doc_b FROM vp
         |        WHERE overlap * 5 >= union_size * 3),
         |e60 AS (SELECT doc_a AS src, doc_b AS dst FROM v60
         |        UNION SELECT doc_b, doc_a FROM v60),
         |r60 AS (SELECT src AS node, src AS lab FROM e60
         |  UNION SELECT e60.dst, r60.lab FROM r60
         |    JOIN e60 ON e60.src = r60.node),
         |c60 AS (SELECT cid, count(*) AS cnt FROM (
         |  SELECT node, min(lab) AS cid FROM r60 GROUP BY 1) GROUP BY 1),
         |v70 AS (SELECT doc_a, doc_b FROM vp
         |        WHERE overlap * 10 >= union_size * 7),
         |e70 AS (SELECT doc_a AS src, doc_b AS dst FROM v70
         |        UNION SELECT doc_b, doc_a FROM v70),
         |r70 AS (SELECT src AS node, src AS lab FROM e70
         |  UNION SELECT e70.dst, r70.lab FROM r70
         |    JOIN e70 ON e70.src = r70.node),
         |c70 AS (SELECT cid, count(*) AS cnt FROM (
         |  SELECT node, min(lab) AS cid FROM r70 GROUP BY 1) GROUP BY 1)
         |SELECT CAST(50 AS BIGINT) AS tau_pct,
         |  (SELECT CAST(count(*) AS BIGINT) FROM vp) AS n_pairs,
         |  CAST(coalesce(sum(cnt), 0) AS BIGINT) AS n_docs,
         |  CAST(count(*) AS BIGINT) AS n_clusters,
         |  CAST(coalesce(max(cnt), 0) AS BIGINT) AS max_size FROM c50
         |UNION ALL
         |SELECT CAST(60 AS BIGINT),
         |  (SELECT CAST(count(*) AS BIGINT) FROM v60),
         |  CAST(coalesce(sum(cnt), 0) AS BIGINT),
         |  CAST(count(*) AS BIGINT),
         |  CAST(coalesce(max(cnt), 0) AS BIGINT) FROM c60
         |UNION ALL
         |SELECT CAST(70 AS BIGINT),
         |  (SELECT CAST(count(*) AS BIGINT) FROM v70),
         |  CAST(coalesce(sum(cnt), 0) AS BIGINT),
         |  CAST(count(*) AS BIGINT),
         |  CAST(coalesce(max(cnt), 0) AS BIGINT) FROM c70""".stripMargin,
    "q807_variance_ratio" ->
      """WITH daily AS (SELECT l_shipdate AS d,
        |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
        |      AS BIGINT) AS y
        |  FROM lineitem GROUP BY 1),
        |idx AS (SELECT CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i,
        |  y FROM daily),
        |b AS (SELECT max(i) AS nn, arg_min(y, i) AS y0,
        |  arg_max(y, i) AS yn FROM idx),
        |mu AS (SELECT CASE WHEN yn >= y0 THEN (yn - y0) * 1000 // (nn - 1)
        |  ELSE -((y0 - yn) * 1000 // (nn - 1)) END AS mu_milli FROM b),
        |qs AS (SELECT CAST(unnest([1, 2, 4, 8]) AS BIGINT) AS q),
        |diffs AS (SELECT q,
        |    (b2.y - a.y) * 1000 - q * (SELECT mu_milli FROM mu) AS dev
        |  FROM idx a CROSS JOIN qs JOIN idx b2 ON b2.i = a.i + q),
        |stats AS (SELECT q, CAST(count(*) AS BIGINT) AS n_q,
        |    sum(CAST(dev AS HUGEINT) * dev) AS s_q FROM diffs GROUP BY 1),
        |ref AS (SELECT n_q AS n1, s_q AS s1 FROM stats WHERE q = 1)
        |SELECT q, n_q,
        |  CAST(s_q * n1 * 1000000 // (q * s1 * n_q) AS BIGINT) AS vr_ppm
        |FROM stats CROSS JOIN ref WHERE q <> 1""".stripMargin,
    "q808_holm_stepdown" ->
      s"""WITH dem AS (SELECT l_suppkey AS k,
         |    CAST((year(l_shipdate) - 1992) * 12 + month(l_shipdate)
         |      AS BIGINT) AS mi,
         |    sum(CAST(l_quantity AS BIGINT)) AS x
         |  FROM lineitem GROUP BY 1, 2),
         |gstat AS (SELECT count(*) AS nn, sum(x) AS sx, sum(x * x) AS sxx
         |  FROM dem),
         |per AS (SELECT k, count(*) AS n_k, sum(x) AS s_k
         |  FROM dem GROUP BY 1),
         |p0 AS (SELECT k, n_k,
         |    abs(s_k // n_k - (SELECT sx // nn FROM gstat)) AS t,
         |    (SELECT sxx // nn - (sx // nn) * (sx // nn) FROM gstat) AS v0
         |  FROM per),
         |p1 AS (SELECT k, CASE WHEN t = 0 THEN 1000000
         |    ELSE least(1000000, v0 * 1000000 // (n_k * t * t)) END AS p_ppm
         |  FROM p0),
         |rk AS (SELECT k, p_ppm, row_number() OVER (ORDER BY p_ppm, k) AS r,
         |    count(*) OVER () AS m FROM p1),
         |bh AS (SELECT max(CASE WHEN p_ppm * m * 20
         |    <= CAST(1000000 AS BIGINT) * r THEN r END) AS kk FROM rk),
         |hf AS (SELECT min(CASE WHEN p_ppm * (m - r + 1) * 20
         |    > CAST(1000000 AS BIGINT) THEN r END) AS ff,
         |    max(m) AS mm FROM rk)
         |SELECT CAST(k AS BIGINT) AS k, CAST(p_ppm AS BIGINT) AS p_ppm,
         |  CAST(r AS BIGINT) AS r,
         |  CAST(CASE WHEN r <= coalesce((SELECT kk FROM bh), 0) THEN 1
         |    ELSE 0 END AS BIGINT) AS bh_rejected,
         |  CAST(CASE WHEN r < coalesce((SELECT ff FROM hf),
         |      (SELECT mm FROM hf) + 1) THEN 1
         |    ELSE 0 END AS BIGINT) AS holm_rejected
         |FROM rk""".stripMargin,
    "q809_token_coverage" ->
      s"""WITH ${SparkEntry.ToksCte},
         |tfq AS (SELECT u.w, count(*) AS tf
         |  FROM toks tk, unnest(tk.t) AS u(w) GROUP BY 1),
         |rk0 AS (SELECT w, tf,
         |    row_number() OVER (ORDER BY tf DESC, w) AS r,
         |    sum(tf) OVER () AS total,
         |    sum(tf) OVER (ORDER BY tf DESC, w
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM tfq),
         |ks AS (SELECT CAST(unnest([5, 10, 25]) AS BIGINT) AS k)
         |SELECT k, CAST(cum AS BIGINT) AS cum_tokens,
         |  CAST(cum * 1000000 // total AS BIGINT) AS coverage_ppm
         |FROM rk0 JOIN ks ON r = k""".stripMargin,
    "q801_log_rank" ->
      """WITH fs0 AS (SELECT l_orderkey AS ok, min(l_shipdate) AS fs
        |  FROM lineitem GROUP BY 1),
        |dur AS (SELECT
        |    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END AS g1,
        |    least(date_diff('day', o_orderdate, fs), 60) AS day
        |  FROM orders JOIN fs0 ON ok = o_orderkey),
        |d2 AS (SELECT g1, day,
        |    CASE WHEN day < 60 THEN 1 ELSE 0 END AS ev FROM dur),
        |cells AS (SELECT day,
        |    sum(CASE WHEN g1 = 1 THEN 1 ELSE 0 END) AS a1, count(*) AS a,
        |    sum(CASE WHEN g1 = 1 THEN ev ELSE 0 END) AS d1, sum(ev) AS d
        |  FROM d2 GROUP BY 1),
        |suf AS (SELECT day, d1, d,
        |    sum(a1) OVER (ORDER BY day DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n1,
        |    sum(a) OVER (ORDER BY day DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n
        |  FROM cells),
        |terms AS (SELECT d1, d, n1, n,
        |    d * n1 * 1000000 // n AS e1_ppm_t,
        |    CASE WHEN n <= 1 THEN 0 ELSE
        |      CAST(CAST(d AS HUGEINT) * n1 * (n - n1) * (n - d) * 1000000
        |        // (CAST(n AS HUGEINT) * n * (n - 1)) AS BIGINT) END
        |      AS v_ppm_t
        |  FROM suf WHERE d > 0),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_event_days,
        |    CAST(sum(d1) AS BIGINT) AS o1,
        |    CAST(sum(e1_ppm_t) AS BIGINT) AS e1_ppm,
        |    CAST(sum(v_ppm_t) AS BIGINT) AS v_ppm FROM terms)
        |SELECT n_event_days, o1, e1_ppm, v_ppm,
        |  CAST(CASE WHEN v_ppm = 0 THEN 0 ELSE
        |    CAST(o1 * 1000000 - e1_ppm AS HUGEINT)
        |      * (o1 * 1000000 - e1_ppm) * 1000
        |      // (CAST(v_ppm AS HUGEINT) * 1000000) END AS BIGINT)
        |    AS z2_milli
        |FROM agg""".stripMargin,
    "q802_wilson_interval" ->
      """WITH r AS (SELECT p_brand AS brand, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x
        |  FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1),
        |w AS (SELECT brand, n, x,
        |    (x * (n - x) * 10000 // n + 9604) * 38416 AS rad FROM r),
        |h AS (SELECT brand, n, x,
        |    (x * 10000 + 19208) * 1000000 // (n * 10000 + 38416) AS c_ppm,
        |    CAST(floor(sqrt(CAST(rad AS DOUBLE))) AS BIGINT) * 1000000
        |      // (n * 10000 + 38416) AS half_ppm
        |  FROM w)
        |SELECT brand, n, x, CAST(x * 1000000 // n AS BIGINT) AS raw_ppm,
        |  CAST(greatest(c_ppm - half_ppm, 0) AS BIGINT) AS lo_ppm,
        |  CAST(least(c_ppm + half_ppm, 1000000) AS BIGINT) AS hi_ppm
        |FROM h""".stripMargin,
    "q803_mde_power" ->
      """WITH p0 AS (SELECT
        |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |      * 1000000 // count(*) AS BIGINT) AS p_ppm FROM orders),
        |sizes AS (SELECT CAST(unnest([1000, 10000, 100000, 1000000])
        |  AS BIGINT) AS n_per_arm)
        |SELECT n_per_arm, p_ppm,
        |  CAST(2 * p_ppm * (1000000 - p_ppm) // n_per_arm AS BIGINT) AS rad,
        |  CAST(28016 * CAST(floor(sqrt(CAST(
        |      2 * p_ppm * (1000000 - p_ppm) // n_per_arm AS DOUBLE)))
        |    AS BIGINT) // 10000 AS BIGINT) AS mde_ppm,
        |  CAST((28016 * CAST(floor(sqrt(CAST(
        |      2 * p_ppm * (1000000 - p_ppm) // n_per_arm AS DOUBLE)))
        |    AS BIGINT) // 10000) * 1000000 // p_ppm AS BIGINT)
        |    AS mde_rel_ppm
        |FROM sizes CROSS JOIN p0""".stripMargin,
    "q804_srm_check" ->
      """WITH o AS (SELECT o_custkey % 2 AS arm,
        |    (year(o_orderdate) - 1992) * 12 + month(o_orderdate) AS mi
        |  FROM orders),
        |g AS (SELECT
        |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b
        |  FROM o),
        |g2 AS (SELECT a, b,
        |    (a - b) * (a - b) * 1000 // (a + b) AS chi2_milli FROM g),
        |m AS (SELECT CAST(mi AS BIGINT) AS mi,
        |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ma,
        |    CAST(count(*) AS BIGINT) AS mn FROM o GROUP BY 1),
        |mm AS (SELECT mi, ma, mn, ma * 1000000 // mn AS share_ppm FROM m),
        |rnk AS (SELECT mi, ma, mn, share_ppm,
        |    abs(share_ppm - 500000) AS dev_ppm,
        |    row_number() OVER (ORDER BY abs(share_ppm - 500000) DESC, mi)
        |      AS rk
        |  FROM mm)
        |SELECT mi, ma, mn, CAST(share_ppm AS BIGINT) AS share_ppm,
        |  CAST(dev_ppm AS BIGINT) AS dev_ppm, CAST(rk AS BIGINT) AS rk,
        |  a, b, CAST(chi2_milli AS BIGINT) AS chi2_milli
        |FROM rnk CROSS JOIN g2 WHERE rk <= 5""".stripMargin,
    "q805_collation_contract" ->
      """WITH g AS (SELECT unnest(['', ' leading', '-dash', '0digit',
        |    '9digit', 'A', 'B2', 'Z', '_under', 'a', 'b1', 'z', 'zz',
        |    '~tilde']) AS s)
        |SELECT CAST(row_number() OVER (ORDER BY s) AS BIGINT) AS rk, s
        |FROM g""".stripMargin,
    "q810_mahalanobis_outliers" ->
      """WITH li AS (SELECT l_orderkey,
        |    CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |    CAST(floor(l_extendedprice) AS BIGINT) AS x,
        |    CAST(l_quantity AS BIGINT) AS y FROM lineitem),
        |mom AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy,
        |    sum(CAST(y AS HUGEINT) * y) AS syy FROM li),
        |v AS (SELECT n, sx, sy,
        |    (n * sxx - CAST(sx AS HUGEINT) * sx) * 10000 // (n * n)
        |      AS cxx4,
        |    (n * syy - CAST(sy AS HUGEINT) * sy) * 10000 // (n * n)
        |      AS cyy4,
        |    CASE WHEN n * sxy - CAST(sx AS HUGEINT) * sy >= 0 THEN
        |      (n * sxy - CAST(sx AS HUGEINT) * sy) * 10000 // (n * n)
        |    ELSE -((-(n * sxy - CAST(sx AS HUGEINT) * sy)) * 10000
        |      // (n * n)) END AS cxy4,
        |    sx // n AS mx, sy // n AS my FROM mom),
        |v2 AS (SELECT n, sx, sy, cxx4, cyy4, cxy4, mx, my,
        |    CAST(cxx4 AS HUGEINT) * cyy4 - CAST(cxy4 AS HUGEINT) * cxy4
        |      AS det4 FROM v),
        |q AS (SELECT l_orderkey, l_linenumber, x, y, det4,
        |    CAST(x - mx AS HUGEINT) * (x - mx) * cyy4
        |     - 2 * (CAST(x - mx AS HUGEINT) * (y - my)) * cxy4
        |     + CAST(y - my AS HUGEINT) * (y - my) * cxx4 AS qf4
        |  FROM li CROSS JOIN v2)
        |SELECT l_orderkey, l_linenumber, x, y,
        |  CAST(CASE WHEN det4 <= 0 OR qf4 <= 0 THEN 0
        |    ELSE qf4 * 10000000 // det4 END AS BIGINT) AS d2_milli
        |FROM q ORDER BY d2_milli DESC, l_orderkey, l_linenumber
        |LIMIT 10""".stripMargin,
    "q811_records_test" ->
      """WITH daily AS (SELECT l_shipdate AS d,
        |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
        |      AS BIGINT) AS y
        |  FROM lineitem GROUP BY 1),
        |rec AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(CASE WHEN pm IS NULL OR y > pm THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_records
        |  FROM (SELECT y, max(y) OVER (ORDER BY d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |    FROM daily)),
        |h AS (SELECT CAST(sum(1000000 // i) AS BIGINT) AS h_n_ppm
        |  FROM (SELECT unnest(generate_series(1, n_days)) AS i FROM rec))
        |SELECT n_days, n_records, h_n_ppm,
        |  CAST(n_records * 1000000 - h_n_ppm AS BIGINT) AS excess_ppm
        |FROM rec CROSS JOIN h""".stripMargin,
    "q812_kendall_tau" ->
      """WITH daily AS (SELECT l_shipdate AS d,
        |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
        |      AS BIGINT) AS y
        |  FROM lineitem GROUP BY 1),
        |idx AS (SELECT CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i,
        |  y FROM daily),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(sum(CASE WHEN b.y > a.y THEN 1 ELSE 0 END) AS BIGINT)
        |      AS concordant,
        |    CAST(sum(CASE WHEN b.y < a.y THEN 1 ELSE 0 END) AS BIGINT)
        |      AS discordant,
        |    CAST(sum(CASE WHEN b.y = a.y THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ties
        |  FROM idx a JOIN idx b ON b.i > a.i)
        |SELECT n_pairs, concordant, discordant, ties,
        |  CAST(CASE WHEN concordant >= discordant
        |    THEN (concordant - discordant) * 1000000 // n_pairs
        |  ELSE -((discordant - concordant) * 1000000 // n_pairs)
        |  END AS BIGINT) AS tau_ppm
        |FROM agg""".stripMargin,
    "q813_theil_sen" ->
      """WITH daily AS (SELECT l_shipdate AS d,
        |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
        |      AS BIGINT) AS y
        |  FROM lineitem GROUP BY 1),
        |idx AS (SELECT CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i,
        |  y FROM daily),
        |cells AS (SELECT
        |    CASE WHEN b.y >= a.y THEN (b.y - a.y) * 1000 // (b.i - a.i)
        |    ELSE -((a.y - b.y) * 1000 // (b.i - a.i)) END AS slope_milli,
        |    count(*) AS cnt
        |  FROM idx a JOIN idx b ON b.i > a.i GROUP BY 1),
        |cc AS (SELECT slope_milli, cnt,
        |    sum(cnt) OVER (ORDER BY slope_milli
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER () AS n_pairs FROM cells)
        |SELECT CAST(n_pairs AS BIGINT) AS n_pairs,
        |  slope_milli AS median_slope_milli
        |FROM cc WHERE cum >= (n_pairs + 1) // 2
        |  AND cum - cnt < (n_pairs + 1) // 2""".stripMargin,
    "q814_runs_test" ->
      """WITH daily AS (SELECT l_shipdate AS d,
        |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
        |      AS BIGINT) AS y
        |  FROM lineitem GROUP BY 1),
        |rk AS (SELECT d, y,
        |    row_number() OVER (ORDER BY y, d) AS r,
        |    count(*) OVER () AS n FROM daily),
        |med AS (SELECT y AS med FROM rk WHERE r = (n + 1) // 2),
        |fl AS (SELECT d,
        |    CASE WHEN y > (SELECT med FROM med) THEN 1 ELSE 0 END AS f
        |  FROM daily),
        |lg AS (SELECT f, lag(f) OVER (ORDER BY d) AS pf FROM fl),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(f) AS BIGINT) AS n1,
        |    CAST(sum(1 - f) AS BIGINT) AS n2,
        |    CAST(sum(CASE WHEN pf IS NULL OR pf <> f THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_runs
        |  FROM lg)
        |SELECT n_days, n1, n2, n_runs,
        |  CAST(1000000 + 2 * n1 * n2 * 1000000 // n_days AS BIGINT)
        |    AS e_runs_ppm,
        |  CAST(n_runs * 1000000
        |    - (1000000 + 2 * n1 * n2 * 1000000 // n_days) AS BIGINT)
        |    AS excess_ppm
        |FROM agg""".stripMargin,
    "q815_cusum" ->
      """WITH daily AS (SELECT l_shipdate AS d,
        |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
        |      AS BIGINT) AS y
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS sy FROM daily),
        |cum AS (SELECT d,
        |    CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS k,
        |    sum(y) OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM daily)
        |SELECT n AS n_days,
        |  CAST(abs(n * cum - k * sy) AS BIGINT) AS max_abs_cusum,
        |  d AS argmax_day
        |FROM cum CROSS JOIN tot
        |ORDER BY abs(n * cum - k * sy) DESC, d LIMIT 1""".stripMargin,
    "q816_benford" ->
      """WITH expv(digit, exp_ppm) AS (VALUES
        |  (1, 301030), (2, 176091), (3, 124939), (4, 96910), (5, 79181),
        |  (6, 66947), (7, 57992), (8, 51153), (9, 45757)),
        |obs AS (SELECT CAST(left(CAST(CAST(floor(l_extendedprice)
        |      AS BIGINT) AS VARCHAR), 1) AS BIGINT) AS digit,
        |    CAST(count(*) AS BIGINT) AS n_d
        |  FROM lineitem GROUP BY 1),
        |n0 AS (SELECT CAST(sum(n_d) AS BIGINT) AS n FROM obs),
        |cells AS (SELECT CAST(e.digit AS BIGINT) AS digit,
        |    CAST(coalesce(o.n_d, 0) AS BIGINT) AS n_d,
        |    CAST(coalesce(o.n_d, 0) * 1000000 // (SELECT n FROM n0)
        |      AS BIGINT) AS obs_ppm,
        |    CAST(e.exp_ppm AS BIGINT) AS exp_ppm
        |  FROM expv e LEFT JOIN obs o ON o.digit = e.digit),
        |chi AS (SELECT CAST(sum((obs_ppm - exp_ppm) * (obs_ppm - exp_ppm)
        |    // exp_ppm) AS BIGINT) AS chi2_q FROM cells)
        |SELECT digit, n_d, obs_ppm, exp_ppm, chi2_q
        |FROM cells CROSS JOIN chi""".stripMargin,
    "q817_mood_median" ->
      """WITH x AS (SELECT
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS isr,
        |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem WHERE l_returnflag IN ('R', 'N')),
        |cells AS (SELECT cents, count(*) AS cnt FROM x GROUP BY 1),
        |cc AS (SELECT cents,
        |    sum(cnt) OVER (ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER () AS nn
        |  FROM cells),
        |med AS (SELECT min(cents) AS med FROM cc
        |  WHERE cum >= (nn + 1) // 2),
        |t AS (SELECT
        |    CAST(sum(CASE WHEN isr = 1 AND cents > (SELECT med FROM med)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN isr = 1 AND cents <= (SELECT med FROM med)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN isr = 0 AND cents > (SELECT med FROM med)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN isr = 0 AND cents <= (SELECT med FROM med)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS dd
        |  FROM x)
        |SELECT a, b, c, dd,
        |  CAST(CASE WHEN (a+b) = 0 OR (c+dd) = 0 OR (a+c) = 0
        |    OR (b+dd) = 0 THEN 0
        |  ELSE (a + b + c + dd)
        |    * (CAST(a AS HUGEINT) * dd - CAST(b AS HUGEINT) * c)
        |    * (CAST(a AS HUGEINT) * dd - CAST(b AS HUGEINT) * c)
        |    * 1000
        |    // (CAST(a + b AS HUGEINT) * (c + dd) * (a + c) * (b + dd))
        |  END AS BIGINT) AS chi2_milli
        |FROM t""".stripMargin,
    "q818_dup_jaccard_deciles" ->
      s"""WITH ${SparkEntry.MinhashPairsCtes},
         |vp AS (${SparkEntry.JaccardTailSql}),
         |j AS (SELECT overlap * 1000000 // union_size AS jaccard_ppm
         |  FROM vp)
         |SELECT CAST(jaccard_ppm // 100000 AS BIGINT) AS decile,
         |  CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(min(jaccard_ppm) AS BIGINT) AS min_ppm,
         |  CAST(max(jaccard_ppm) AS BIGINT) AS max_ppm
         |FROM j GROUP BY 1""".stripMargin,
    "q819_sign_test" ->
      """WITH monthly AS (SELECT
        |    CAST((year(l_shipdate) - 1992) * 12 + month(l_shipdate)
        |      AS BIGINT) AS mi,
        |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
        |      AS BIGINT) AS y
        |  FROM lineitem GROUP BY 1),
        |lg AS (SELECT y, lag(y) OVER (ORDER BY mi) AS py FROM monthly),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_steps,
        |    CAST(sum(CASE WHEN y > py THEN 1 ELSE 0 END) AS BIGINT) AS ups,
        |    CAST(sum(CASE WHEN y < py THEN 1 ELSE 0 END) AS BIGINT)
        |      AS downs,
        |    CAST(sum(CASE WHEN y = py THEN 1 ELSE 0 END) AS BIGINT) AS ties
        |  FROM lg WHERE py IS NOT NULL)
        |SELECT n_steps, ups, downs, ties,
        |  CAST(CASE WHEN ups + downs = 0 THEN 0
        |    ELSE (ups - downs) * (ups - downs) * 1000 // (ups + downs)
        |  END AS BIGINT) AS z2_milli
        |FROM agg""".stripMargin,
    "q820_bigram_bits" ->
      s"""WITH ${SparkEntry.ToksCte},
         |t2 AS (SELECT list_filter(t, x -> x <> '') AS t FROM toks),
         |bg0 AS (SELECT t[i] || ' ' || t[i + 1] AS bg
         |  FROM t2, unnest(generate_series(1, len(t) - 1)) AS u(i)
         |  WHERE len(t) >= 2),
         |c12 AS (SELECT bg, CAST(count(*) AS BIGINT) AS c12,
         |    split_part(bg, ' ', 1) AS w1
         |  FROM bg0 GROUP BY 1),
         |c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1
         |  FROM c12 GROUP BY 1),
         |b AS (SELECT c12.c12,
         |    CAST(length(bin(c1.c1 // c12.c12)) AS BIGINT) AS bits
         |  FROM c12 JOIN c1 USING (w1)),
         |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_bigram_types,
         |    CAST(sum(c12) AS BIGINT) AS n_bigram_tokens,
         |    CAST(sum(c12 * bits) AS BIGINT) AS total_bits FROM b)
         |SELECT n_bigram_types, n_bigram_tokens, total_bits,
         |  CAST(total_bits * 1000 // n_bigram_tokens AS BIGINT)
         |    AS bits_per_token_milli
         |FROM agg""".stripMargin,
    "q821_embedding_norms" ->
      """WITH q AS (SELECT vec_id,
        |    CAST(floor(CAST(u.x AS DOUBLE) * 1000.0) AS BIGINT) AS qx
        |  FROM embeddings, unnest(embedding) AS u(x)),
        |n2 AS (SELECT vec_id, CAST(sum(qx * qx) AS BIGINT) AS norm2_e6
        |  FROM q GROUP BY 1)
        |SELECT e.vec_id, CAST(e.label AS BIGINT) AS label, n2.norm2_e6
        |FROM embeddings e JOIN n2 USING (vec_id)
        |ORDER BY norm2_e6 DESC, vec_id LIMIT 10""".stripMargin,
    "q822_iqr_fences" ->
      """WITH x AS (SELECT p_brand AS brand,
        |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |cells AS (SELECT brand, cents, count(*) AS cnt
        |  FROM x GROUP BY 1, 2),
        |rk AS (SELECT brand, cents, cnt,
        |    sum(cnt) OVER (PARTITION BY brand ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER (PARTITION BY brand) AS n FROM cells),
        |q1 AS (SELECT brand, cents AS q1 FROM rk
        |  WHERE cum - cnt < (n + 3) // 4 AND cum >= (n + 3) // 4),
        |q3 AS (SELECT brand, cents AS q3 FROM rk
        |  WHERE cum - cnt < (3 * n + 3) // 4 AND cum >= (3 * n + 3) // 4)
        |SELECT x.brand, CAST(q1 AS BIGINT) AS q1, CAST(q3 AS BIGINT) AS q3,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN cents * 2 > q3 * 2 + (q3 - q1) * 3
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
        |  CAST(sum(CASE WHEN cents * 2 < q1 * 2 - (q3 - q1) * 3
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_below
        |FROM x JOIN q1 ON q1.brand = x.brand JOIN q3 ON q3.brand = x.brand
        |GROUP BY 1, 2, 3""".stripMargin,
    "q823_supplier_gini" ->
      """WITH rev AS (SELECT l_suppkey AS k,
        |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
        |      AS BIGINT) AS y
        |  FROM lineitem GROUP BY 1),
        |rk AS (SELECT y,
        |    CAST(row_number() OVER (ORDER BY y, k) AS BIGINT) AS r
        |  FROM rev),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_suppliers,
        |    CAST(sum(y) AS BIGINT) AS total_cents,
        |    CAST(sum(r * y) AS BIGINT) AS rank_weighted FROM rk)
        |SELECT n_suppliers, total_cents, rank_weighted,
        |  CAST((2 * rank_weighted - (n_suppliers + 1) * total_cents)
        |    * 1000000 // (n_suppliers * total_cents) AS BIGINT) AS gini_ppm
        |FROM agg""".stripMargin,
    "q824_lorenz_deciles" ->
      """WITH rev AS (SELECT l_suppkey AS k,
        |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
        |      AS BIGINT) AS y
        |  FROM lineitem GROUP BY 1),
        |rk AS (SELECT y,
        |    CAST(row_number() OVER (ORDER BY y, k) AS BIGINT) AS r,
        |    CAST(count(*) OVER () AS BIGINT) AS n,
        |    CAST(sum(y) OVER () AS BIGINT) AS tot
        |  FROM rev),
        |ds AS (SELECT CAST(unnest([1, 2, 3, 4, 5, 6, 7, 8, 9, 10])
        |  AS BIGINT) AS decile)
        |SELECT decile, CAST(count(*) AS BIGINT) AS n_suppliers,
        |  CAST(sum(y) AS BIGINT) AS cum_cents,
        |  CAST(sum(y) * 1000000 // max(tot) AS BIGINT) AS cum_share_ppm
        |FROM rk CROSS JOIN ds WHERE r <= n * decile // 10
        |GROUP BY 1""".stripMargin,
    "q825_priority_chi2" ->
      """WITH x AS (SELECT o_orderpriority AS m, o_orderstatus AS f
        |  FROM orders),
        |cells AS (SELECT m, f, CAST(count(*) AS BIGINT) AS o
        |  FROM x GROUP BY 1, 2),
        |rmt AS (SELECT m, CAST(count(*) AS BIGINT) AS rm
        |  FROM x GROUP BY 1),
        |cmt AS (SELECT f, CAST(count(*) AS BIGINT) AS cm
        |  FROM x GROUP BY 1),
        |n0 AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM x),
        |terms AS (SELECT
        |    CAST((CAST(o AS HUGEINT) * nn - CAST(rm AS HUGEINT) * cm)
        |      * (CAST(o AS HUGEINT) * nn - CAST(rm AS HUGEINT) * cm)
        |      * 1000 // (CAST(nn AS HUGEINT) * rm * cm) AS BIGINT)
        |      AS term_milli
        |  FROM cells JOIN rmt USING (m) JOIN cmt USING (f) CROSS JOIN n0)
        |SELECT CAST(count(*) AS BIGINT) AS n_cells,
        |  CAST(sum(term_milli) AS BIGINT) AS chi2_milli
        |FROM terms""".stripMargin,
    "q826_ttr_by_length" ->
      s"""WITH ${SparkEntry.ToksCte},
         |t2 AS (SELECT list_filter(t, x -> x <> '') AS t FROM toks),
         |st AS (SELECT CAST(len(t) AS BIGINT) AS toks,
         |    CAST(len(list_distinct(t)) AS BIGINT) AS types
         |  FROM t2 WHERE len(t) > 0),
         |pd AS (SELECT toks, types * 1000000 // toks AS ttr_ppm FROM st)
         |SELECT CAST(toks // 10 AS BIGINT) AS len_bucket,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(toks) AS BIGINT) AS n_tokens,
         |  CAST(sum(ttr_ppm) // count(*) AS BIGINT) AS mean_ttr_ppm
         |FROM pd GROUP BY 1""".stripMargin,
    "q827_interarrival_expcheck" ->
      """WITH days AS (SELECT DISTINCT o_orderdate AS d FROM orders),
        |gaps AS (SELECT CAST(date_diff('day', pd, d) AS BIGINT) AS g
        |  FROM (SELECT d, lag(d) OVER (ORDER BY d) AS pd FROM days)
        |  WHERE pd IS NOT NULL),
        |cells AS (SELECT g, count(*) AS cnt FROM gaps GROUP BY 1),
        |cc AS (SELECT g,
        |    sum(cnt) OVER (ORDER BY g
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER () AS nn FROM cells),
        |med AS (SELECT min(g) AS med FROM cc WHERE cum >= (nn + 1) // 2),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_gaps,
        |    CAST(sum(g) AS BIGINT) AS sum_gaps,
        |    CAST((SELECT med FROM med) AS BIGINT) AS median_gap
        |  FROM gaps)
        |SELECT n_gaps, sum_gaps, median_gap,
        |  CAST(sum_gaps * 1000 // n_gaps AS BIGINT) AS mean_milli,
        |  CAST(sum_gaps * 1000 // (n_gaps * median_gap) AS BIGINT)
        |    AS mean_over_median_milli
        |FROM agg""".stripMargin,
    "q828_label_centroid_spread" ->
      """WITH q AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
        |    CAST(i AS BIGINT) AS dim,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000.0) AS BIGINT)
        |      AS qx
        |  FROM embeddings,
        |    unnest(generate_series(1, len(embedding))) AS u(i)),
        |cent AS (SELECT label, dim,
        |    CAST(CASE WHEN sum(qx) >= 0 THEN sum(qx) // count(*)
        |      ELSE -((-sum(qx)) // count(*)) END AS BIGINT) AS c
        |  FROM q GROUP BY 1, 2)
        |SELECT label, CAST(count(DISTINCT vec_id) AS BIGINT) AS n_vecs,
        |  CAST(sum((qx - c) * (qx - c)) AS BIGINT) AS ssd,
        |  CAST(sum((qx - c) * (qx - c)) // count(DISTINCT vec_id)
        |    AS BIGINT) AS mean_d2
        |FROM q JOIN cent USING (label, dim)
        |GROUP BY 1""".stripMargin,
    "q829_dup_cross_source" ->
      s"""WITH ${SparkEntry.MinhashPairsCtes},
         |vp AS (${SparkEntry.JaccardTailSql}),
         |lab AS (SELECT vp.doc_a, vp.doc_b, da.source AS sa,
         |    db.source AS sb
         |  FROM vp JOIN documents da ON da.doc_id = vp.doc_a
         |    JOIN documents db ON db.doc_id = vp.doc_b)
         |SELECT least(sa, sb) AS source_lo, greatest(sa, sb) AS source_hi,
         |  CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(sum(CASE WHEN sa = sb THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_within
         |FROM lab GROUP BY 1, 2""".stripMargin,
    "q830_quantity_autocorr" ->
      """WITH daily AS (SELECT l_shipdate AS d,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS y
        |  FROM lineitem GROUP BY 1),
        |idx AS (SELECT CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i,
        |  y FROM daily),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS sy FROM idx),
        |den AS (SELECT sum(CAST(n * y - sy AS HUGEINT) * (n * y - sy))
        |    AS den FROM idx CROSS JOIN tot),
        |ks AS (SELECT CAST(unnest([1, 7, 30]) AS BIGINT) AS k),
        |nums AS (SELECT k, CAST(count(*) AS BIGINT) AS n_terms,
        |    sum(CAST(n * a.y - sy AS HUGEINT) * (n * b.y - sy)) AS num
        |  FROM idx a CROSS JOIN ks JOIN idx b ON b.i = a.i + k
        |    CROSS JOIN tot
        |  GROUP BY 1)
        |SELECT k, n_terms,
        |  CAST(CASE WHEN num >= 0 THEN num * 1000000 // (SELECT den FROM den)
        |  ELSE -((-num) * 1000000 // (SELECT den FROM den)) END AS BIGINT)
        |    AS r_ppm
        |FROM nums""".stripMargin,
    "q831_revenue_tail_ladder" ->
      """WITH rev AS (SELECT l_suppkey AS k,
        |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
        |      AS BIGINT) AS y
        |  FROM lineitem GROUP BY 1),
        |rungs AS (SELECT CAST(length(bin(y)) AS BIGINT) AS rung,
        |    CAST(count(*) AS BIGINT) AS n_at FROM rev GROUP BY 1),
        |suf AS (SELECT rung, n_at,
        |    CAST(sum(n_at) OVER (ORDER BY rung DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS n_ge
        |  FROM rungs)
        |SELECT rung, n_at, n_ge,
        |  CAST(coalesce(lag(n_ge) OVER (ORDER BY rung DESC) * 1000000
        |    // n_ge, 0) AS BIGINT) AS next_ratio_ppm
        |FROM suf""".stripMargin,
    "q832_basket_entropy_bits" ->
      """WITH sizes AS (SELECT l_orderkey, count(*) AS c
        |  FROM lineitem GROUP BY 1),
        |cells AS (SELECT c, CAST(count(*) AS BIGINT) AS n_c
        |  FROM sizes GROUP BY 1),
        |n0 AS (SELECT CAST(sum(n_c) AS BIGINT) AS n FROM cells),
        |agg AS (SELECT CAST(max(n) AS BIGINT) AS n_orders,
        |    CAST(count(*) AS BIGINT) AS n_sizes,
        |    CAST(sum(n_c * length(bin(n // n_c))) AS BIGINT) AS total_bits
        |  FROM cells CROSS JOIN n0)
        |SELECT n_orders, n_sizes, total_bits,
        |  CAST(total_bits * 1000 // n_orders AS BIGINT) AS h_milli_bits
        |FROM agg""".stripMargin,
    "q833_lsh_exact_confusion" ->
      s"""WITH ${SparkEntry.MinhashPairsCtes},
         |vp AS (${SparkEntry.JaccardTailSql}),
         |xp0 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    count(*) AS overlap
         |  FROM shx a JOIN shx b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |xp AS (SELECT doc_a, doc_b FROM xp0
         |  JOIN sizes sx ON sx.doc_id = doc_a
         |  JOIN sizes sy ON sy.doc_id = doc_b
         |  WHERE overlap * 2 >= (sx.n + sy.n - overlap) * 1),
         |ne AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM xp),
         |nl AS (SELECT CAST(count(*) AS BIGINT) AS n_lsh FROM vp),
         |ms AS (SELECT CAST(count(*) AS BIGINT) AS n_missed FROM xp
         |  WHERE NOT EXISTS (SELECT 1 FROM vp
         |    WHERE vp.doc_a = xp.doc_a AND vp.doc_b = xp.doc_b)),
         |sp AS (SELECT CAST(count(*) AS BIGINT) AS n_spurious FROM vp
         |  WHERE NOT EXISTS (SELECT 1 FROM xp
         |    WHERE xp.doc_a = vp.doc_a AND xp.doc_b = vp.doc_b))
         |SELECT n_exact, n_lsh, n_missed, n_spurious,
         |  CAST(CASE WHEN n_exact = 0 THEN 1000000
         |    ELSE n_lsh * 1000000 // n_exact END AS BIGINT) AS recall_ppm
         |FROM ne CROSS JOIN nl CROSS JOIN ms CROSS JOIN sp""".stripMargin,
    "q834_seasonality_strength" ->
      """WITH daily AS (SELECT l_shipdate AS d,
        |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
        |      AS BIGINT) AS y, month(l_shipdate) AS m
        |  FROM lineitem GROUP BY 1, 3),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS sy,
        |    sum(CAST(y AS HUGEINT) * y) AS syy FROM daily),
        |months AS (SELECT m, CAST(count(*) AS BIGINT) AS nm,
        |    CAST(sum(y) AS BIGINT) AS sm FROM daily GROUP BY 1),
        |t AS (SELECT nm,
        |    sm * 1000 // nm - sy * 1000 // n AS dmu,
        |    n, sy, syy FROM months CROSS JOIN tot),
        |agg AS (SELECT CAST(max(n) AS BIGINT) AS n_days,
        |    CAST(count(*) AS BIGINT) AS n_months,
        |    sum(nm * CAST(dmu AS HUGEINT) * dmu) AS ssb_k2,
        |    max(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy)
        |      AS sst2
        |  FROM t)
        |SELECT n_days, n_months,
        |  CAST(CASE WHEN sst2 = 0 THEN 0
        |    ELSE ssb_k2 * n_days // sst2 END AS BIGINT) AS strength_ppm
        |FROM agg""".stripMargin,
    "q835_spearman_midrank" ->
      """WITH x AS (SELECT
        |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS px,
        |    CAST(l_quantity AS BIGINT) AS qy FROM lineitem),
        |cpx AS (SELECT px, count(*) AS cnt FROM x GROUP BY 1),
        |rpx AS (SELECT px,
        |    2 * (sum(cnt) OVER (ORDER BY px
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt)
        |      + cnt + 1 AS r_px
        |  FROM cpx),
        |cqy AS (SELECT qy, count(*) AS cnt FROM x GROUP BY 1),
        |rqy AS (SELECT qy,
        |    2 * (sum(cnt) OVER (ORDER BY qy
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt)
        |      + cnt + 1 AS r_qy
        |  FROM cqy),
        |j AS (SELECT r_px, r_qy FROM x
        |  JOIN rpx USING (px) JOIN rqy USING (qy)),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(r_px - r_qy AS HUGEINT) * (r_px - r_qy)) AS sum_d2
        |  FROM j)
        |SELECT n,
        |  CAST(1000000 - 6 * sum_d2 * 1000000
        |    // (4 * CAST(n AS HUGEINT) * (n * n - 1)) AS BIGINT) AS rho_ppm
        |FROM agg""".stripMargin,
    "q800_cohens_d" ->
      """WITH x AS (SELECT l_returnflag AS g,
        |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem WHERE l_returnflag IN ('R', 'N')),
        |agg AS (SELECT
        |  CAST(sum(CASE WHEN g = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS nr,
        |  CAST(sum(CASE WHEN g = 'R' THEN cents ELSE 0 END) AS BIGINT) AS sr,
        |  sum(CASE WHEN g = 'R' THEN CAST(cents AS HUGEINT) * cents
        |      ELSE CAST(0 AS HUGEINT) END) AS ssr,
        |  CAST(sum(CASE WHEN g = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS nn,
        |  CAST(sum(CASE WHEN g = 'N' THEN cents ELSE 0 END) AS BIGINT) AS sn,
        |  sum(CASE WHEN g = 'N' THEN CAST(cents AS HUGEINT) * cents
        |      ELSE CAST(0 AS HUGEINT) END) AS ssn
        |  FROM x),
        |pv AS (SELECT nr, nn,
        |  CAST((ssr - CAST(sr AS HUGEINT) * sr // nr
        |    + ssn - CAST(sn AS HUGEINT) * sn // nn)
        |    // (nr + nn - 2) AS BIGINT) AS pooled_var_c2,
        |  sr, sn FROM agg),
        |sd AS (SELECT nr, nn, pooled_var_c2, sr, sn,
        |  CAST(floor(sqrt(CAST(pooled_var_c2 AS DOUBLE))) AS BIGINT)
        |    AS sd_cents FROM pv)
        |SELECT nr, nn, pooled_var_c2, sd_cents,
        |  CAST(CASE WHEN sd_cents = 0 THEN 0
        |  ELSE CAST(sr AS HUGEINT) * nn * 1000 // (nr * nn) // sd_cents
        |    - CAST(sn AS HUGEINT) * nr * 1000 // (nr * nn) // sd_cents
        |  END AS BIGINT) AS d_milli
        |FROM sd""".stripMargin
  )
}
