package graft

/** Round-14 harness/operator contracts. Starts with the NOISE-aware
  * `moved` detector (round-13 verdict task 3): median drift normalization
  * corrects uniform box delta, but a noisy box (r13 driver canary spread
  * 0.5–2.4) inflates heavy-IO queries specifically — invisible to the
  * subsecond-dominated median — and r12 + r13 each manufactured a manual
  * quiet-box protocol session out of exactly that shape. The detector now
  * self-adjudicates: on a wide-canary run each would-be mover is re-timed
  * once at the run's tail and only reproducing movers stay flagged.
  */
class Round19OpsSpec extends SparkTestBase {

  private def base(n: Int, f: Int => Double): String =
    (1 to n).map(i => "\"" + i + "\":" + f(i)).mkString(
      """{"queries":{""", ",", "}}")

  test("adjudicateMoved: wide-spread cold-cache outlier retimes clean and emits no flag") {
    val n = 30
    val prior = base(n, _ => 2.0)
    // q7 looks 3x on the noisy pass; everything else flat
    val current = (1 to n).map(i =>
      i.toString -> (if (i == 7) 6.0 else 2.0))
    var retimed = List.empty[String]
    val (ks, drift, ups) = Bench.adjudicateMoved(
      prior, current, wideSpread = true,
      retime = { k => retimed ::= k; Some(2.1) }) // true warm cost: flat
    assert(retimed === List("7"), "only the candidate is re-timed")
    assert(ks.isEmpty, "a noise outlier that retimes at base must not flag")
    assert(ups === Map("7" -> 2.1), "the retimed min folds into the report")
    assert(math.abs(drift - 1.0) < 0.01)
  }

  test("adjudicateMoved: a genuine 3x structural mover reproduces and still flags") {
    val n = 30
    val prior = base(n, _ => 2.0)
    val current = (1 to n).map(i =>
      i.toString -> (if (i == 7) 6.0 else 2.0))
    val (ks, _, _) = Bench.adjudicateMoved(
      prior, current, wideSpread = true, retime = _ => Some(6.2))
    assert(ks === Seq("7"), "a reproducing mover survives self-adjudication")
  }

  test("adjudicateMoved: quiet box never re-times — the candidate list is final") {
    val n = 30
    val prior = base(n, _ => 2.0)
    val current = (1 to n).map(i =>
      i.toString -> (if (i == 7) 6.0 else 2.0))
    var calls = 0
    val (ks, _, ups) = Bench.adjudicateMoved(
      prior, current, wideSpread = false,
      retime = { _ => calls += 1; Some(2.0) })
    assert(calls === 0 && ups.isEmpty)
    assert(ks === Seq("7"))
  }

  test("adjudicateMoved: a failed retime (None) keeps the flag rather than dropping it") {
    val n = 30
    val prior = base(n, _ => 2.0)
    val current = (1 to n).map(i =>
      i.toString -> (if (i == 7) 6.0 else 2.0))
    val (ks, _, _) = Bench.adjudicateMoved(
      prior, current, wideSpread = true, retime = _ => None)
    assert(ks === Seq("7"), "no evidence of noise => the flag stands")
  }

  test("drift alert bound: uniform 1.4x slowdown would alert, 1.05 box drift would not") {
    // The ADVICE r13 hole: a uniform whole-suite regression reports
    // moved:[] (by design) — the drift VALUE is the only signal, so the
    // bound must sit above routine box drift (r12 measured +5.5%) and
    // below any regression worth a round of adjudication.
    assert(Bench.DriftAlertBound > 1.05 && Bench.DriftAlertBound < 1.4)
    val n = 30
    val prior = base(n, _ => 2.0)
    val uniform = (1 to n).map(i => i.toString -> 2.0 * 1.4)
    val (ks, drift) = Bench.movedKeys(prior, uniform)
    assert(ks.isEmpty, "uniform shift stays out of moved (that is the hole)")
    assert(drift > Bench.DriftAlertBound, "…so the drift value must alert")
  }

  test("movedKeys: a prior base at a DIFFERENT scale factor is never compared") {
    // A dev full run at sf0.01 must not poison the sf0.1 regression base:
    // cross-SF ratios are dominated by data size, not code.
    val n = 30
    val prior = (1 to n).map(i => "\"" + i + "\":0.2").mkString(
      """{"sf":"sf0.01","queries":{""", ",", "}}")
    val current = (1 to n).map(i => i.toString -> 2.0)
    val (ks, drift) = Bench.movedKeys(prior, current, curSf = Some("sf0.1"))
    assert(ks.isEmpty && drift === 1.0)
    // same sf still compares: one genuine outlier over a flat cohort flags
    val oneMover = (1 to n).map(i =>
      i.toString -> (if (i == 7) 2.0 else 0.25))
    val (ks2, _) = Bench.movedKeys(prior, oneMover, curSf = Some("sf0.01"))
    assert(ks2 === Seq("7"))
  }

  // ---- library-wide cache/checkpoint lifecycle (r13 verdict task 2) ----
  // Dedup got the sealOp discipline in r13; r13's verdict found Graph.katz
  // pinning iters+2 RDDs per CALL and ~100 more unreleased localCheckpoint
  // sites across the operator files. Every public operator below must now
  // leave at most ONE persisted RDD — its own sealed result.

  test("sealed graph/text/similarity operators leave at most one persisted RDD") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators._
    val sc = spark.sparkContext
    sc.getPersistentRDDs.values.foreach(_.unpersist(false))
    def persisted = sc.getPersistentRDDs.keySet
    // two triangles sharing an edge + a pendant: enough structure for
    // every graph statistic to return rows
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (2L, 4L),
                    (4L, 5L)).toDF("src", "dst")
    val wEdges = edges.withColumn("w", col("src") + col("dst"))
    val rankedSym = wEdges.select(col("src"), col("dst"),
                                  (col("src") + col("dst")).as("r"))
      .unionByName(wEdges.select(col("dst").as("src"), col("src").as("dst"),
                                 (col("src") + col("dst")).as("r")))
    val nEdges = wEdges.select(col("src"), col("dst"), col("w").as("n"))
    val seeds = Seq(1L).toDF("node")
    val docs = Seq(
      (1L, "alpha beta gamma delta alpha beta gamma"),
      (2L, "alpha beta gamma delta alpha beta epsilon"),
      (3L, "totally different words entirely here now")
    ).toDF("doc_id", "text")
    val vecs = Seq(
      (1L, Array(0.1f, 0.9f)), (2L, Array(0.2f, 0.8f)),
      (3L, Array(0.9f, 0.1f)), (4L, Array(0.8f, 0.2f))
    ).toDF("vec_id", "vec")
    val events = Seq(
      (1L, 1L, 10L, "view"), (1L, 2L, 20L, "cart"), (1L, 3L, 30L, "buy"),
      (2L, 4L, 10L, "view"), (2L, 5L, 20L, "view")
    ).toDF("user_id", "event_id", "ts", "etype")
      .withColumn("ts", timestamp_micros(col("ts") * 1000000L))
    val ops: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "Graph.triangleStats" -> (() => Graph.triangleStats(edges)),
      "Graph.fourCliqueStats" -> (() => Graph.fourCliqueStats(edges)),
      "Graph.katz" -> (() => Graph.katz(edges, iters = 3)),
      "Graph.pagerank" -> (() => Graph.pagerank(rankedSym.drop("r"))),
      "Graph.personalizedPagerank" ->
        (() => Graph.personalizedPagerank(rankedSym.drop("r"), seeds)),
      "Graph.labelPropagation" ->
        (() => Graph.labelPropagation(rankedSym.drop("r"))),
      "Graph.connectedComponentsStar" ->
        (() => Graph.connectedComponentsStar(edges)),
      "Graph.bfsHops" -> (() => Graph.bfsHops(edges, seeds, 3)),
      "Graph.ssspRelax" ->
        (() => Graph.ssspRelax(
          wEdges.withColumnRenamed("w", "cost"), seeds, 3)),
      "Graph.longestPathLevels" -> (() => Graph.longestPathLevels(edges, 4)),
      "Graph.kcore" -> (() => Graph.kcore(edges, 2, 4)),
      "Graph.hits" -> (() => Graph.hits(edges, 2)),
      "Graph.multiSourceHops" -> (() => Graph.multiSourceHops(edges, seeds, 3)),
      "Graph.sccMutualReach" -> (() => Graph.sccMutualReach(edges, 2)),
      "Graph.minimaxClosure" -> (() => Graph.minimaxClosure(rankedSym, 2)),
      "Graph.mstBottleneck" -> (() => Graph.mstBottleneck(wEdges, 3)),
      "Graph.greedyMatching(driver)" -> (() => Graph.greedyMatching(
        wEdges.select(col("src").as("x"), col("dst").as("y"), col("w")), 2)),
      "Graph.greedyMatching(dist)" -> (() => Graph.greedyMatching(
        wEdges.select(col("src").as("x"), col("dst").as("y"), col("w")), 2,
        gateEdges = 0L)),
      "Graph.girthPerEdge(driver)" -> (() => Graph.girthPerEdge(edges)),
      "Graph.girthPerEdge(dist)" ->
        (() => Graph.girthPerEdge(edges, gateEdges = 0L)),
      "Graph.articulationPoints(driver)" ->
        (() => Graph.articulationPoints(edges)),
      "Graph.articulationPoints(dist)" ->
        (() => Graph.articulationPoints(edges, gateEdges = 0L)),
      "Graph.betweennessExact" -> (() => Graph.betweennessExact(edges)),
      "Graph.betweennessSampled" -> (() => Graph.betweennessSampled(edges, 3)),
      "Graph.edgeBetweennessSampled" ->
        (() => Graph.edgeBetweennessSampled(edges, 3)),
      "Graph.percolationSweep(driver)" ->
        (() => Graph.percolationSweep(nEdges, Seq(3L, 7L))),
      "Graph.percolationSweep(dist)" ->
        (() => Graph.percolationSweep(nEdges, Seq(3L, 7L), gateEdges = 0L)),
      "Similarity.kmeansLloyd" ->
        (() => Similarity.kmeansLloyd(vecs, "vec_id", "vec", 2, 2, 2)),
      "Similarity.powerIteration" ->
        (() => Similarity.powerIteration(
          Similarity.gramMatrix(vecs, "vec", 2), 2)),
      "Similarity.covarianceMatrix" ->
        (() => Similarity.covarianceMatrix(vecs, "vec", 2)),
      "TextAnalysis.collocations" ->
        (() => TextAnalysis.collocations(docs, "doc_id", "text",
                                         minCount = 1L)),
      "TextAnalysis.bigramLmKn" ->
        (() => TextAnalysis.bigramLmKn(docs, "doc_id", "text")),
      "TextAnalysis.bpeLearn" -> (() => TextAnalysis.bpeLearn(docs, "text", 2)),
      "TextAnalysis.rakeKeyphrases" ->
        (() => TextAnalysis.rakeKeyphrases(docs, "doc_id", "text")),
      "Funnel.markovAbsorption" ->
        (() => Funnel.markovAbsorption(events, "user_id", "ts", "event_id",
                                       "etype", "buy", 3)),
      "Intervals.pointBandSelfJoin" ->
        (() => Intervals.pointBandSelfJoin(events, Seq("user_id"),
                                           "event_id", "ts", 15000000L)),
      "Sketches.heavyHitters" ->
        (() => Sketches.heavyHitters(events, "etype", 2)),
      "JoinPlanner.preflight" ->
        (() => JoinPlanner.preflight(edges, edges, "src", "src")),
      "JoinPlanner.starJoinOrders" ->
        (() => JoinPlanner.starJoinOrders(Seq(
          ("a", edges, "src"), ("b", edges, "src"), ("c", edges, "dst"))))
    )
    for ((name, op) <- ops) {
      val before = persisted
      val out = op()
      val fresh = persisted -- before
      assert(fresh.size <= 1,
        s"$name left ${fresh.size} persisted RDDs (cap 1): caches leaked")
      assert(out.count() >= 0L, s"$name result must be consumable")
      sc.getPersistentRDDs
        .filter { case (id, _) => fresh.contains(id) }
        .values.foreach(_.unpersist(false))
    }
    assert(persisted.isEmpty)
    // CorpusIngest.ingestNearDup returns a version number, not a frame:
    // it must leave NOTHING persisted behind
    val root = java.nio.file.Files.createTempDirectory("seal_ing").toString
    CorpusIngest.ingestNearDup(spark, docs, root)
    CorpusIngest.ingestNearDup(spark,
      docs.withColumn("doc_id", col("doc_id") + 10L), root)
    assert(persisted.isEmpty,
      "ingestNearDup must release its pair/canonical checkpoints")
  }

  // ---- signature-store root isolation (ADVICE r13) ----

  test("planBuckets reproduces the Stress16 grid ordering") {
    import graft.operators.Dedup
    // @10M docs: homogeneous deltas keep paying to 512; diverse deltas cap
    // at 64 (every bucket touched — more buckets = pure dir-open overhead)
    assert(Dedup.planBuckets(10000000L, diverseDeltas = false) === 512)
    assert(Dedup.planBuckets(10000000L, diverseDeltas = true) === 64)
    // small corpora are publish-bound: q793's <3k-doc store plans ONE
    // bucket (the 16-bucket gate store spent ~80% of wall in commit
    // machinery), and the floor is ≥2000 docs per bucket throughout
    assert(Dedup.planBuckets(2700L) === 1)
    assert(Dedup.planBuckets(100000L) === 32)
    // monotone in corpus size, always a power of two, never zero
    val sizes = Seq(0L, 1L, 5000L, 64000L, 1000000L, 100000000L)
    val plans = sizes.map(Dedup.planBuckets(_))
    assert(plans === plans.sorted)
    plans.foreach(p => assert(p >= 1 && (p & (p - 1)) === 0))
  }

  test("sigRoot: distinct corpora get distinct roots; same corpus is stable") {
    val a = graft.operators.Dedup.sigRoot("q763", "/data/sf0.01")
    val b = graft.operators.Dedup.sigRoot("q763", "/data/sf0.1")
    val a2 = graft.operators.Dedup.sigRoot("q763", "/data/sf0.01")
    assert(a !== b, "different SF dirs must not share a publish/vacuum root")
    assert(a === a2, "same corpus re-runs reuse (and vacuum) one store")
    assert(a.contains("graft_q763_sig_"), "name stays greppable for cleanup")
    val c = graft.operators.Dedup.sigRoot("q793", "/data/sf0.01")
    assert(a !== c, "different gate queries never share a root")
  }
}
