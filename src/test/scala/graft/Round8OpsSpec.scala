package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Graph, Skyline, TextAnalysis}

/** Round-8 operators: large-star/small-star connected components,
  * multi-source BFS, integer readability.
  */
class Round8OpsSpec extends SparkTestBase {

  import spark.implicits._

  private def sym(edges: Seq[(Long, Long)]) =
    (edges ++ edges.map(_.swap)).toDF("src", "dst")

  test("Graph.connectedComponentsStar == Dedup.clusterPairs on random graphs") {
    // The star contraction must produce bit-identical (node, min-label,
    // size) rows to the reference min-label propagation, whatever the
    // topology: chains (worst case for propagation), random sparse, and a
    // clique with satellites.
    val rnd = new scala.util.Random(42)
    val graphs = Seq(
      (0L until 40L).sliding(2).map(s => (s(0), s(1))).toSeq, // chain
      Seq.fill(60)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
        .filter(p => p._1 != p._2),                           // random
      (for (a <- 0L to 5L; b <- (a + 1) to 5L) yield (a, b)) ++
        Seq((5L, 90L), (90L, 91L), (200L, 201L))              // clique+tail
    )
    for (es <- graphs) {
      val pairs = es.toDF("doc_a", "doc_b")
      val expected = Dedup.clusterPairs(pairs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val got = Graph.connectedComponentsStar(pairs, "doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === expected)
    }
  }

  test("Graph.connectedComponentsStar: chain converges in few rounds") {
    // A 64-node chain has diameter 63 — plain propagation needs ~63
    // rounds; the star contraction must land well under the maxRounds cap
    // (O(log² n)), which is the whole point of the operator.
    val pairs = (0L until 64L).sliding(2).map(s => (s(0), s(1))).toSeq
      .toDF("doc_a", "doc_b")
    val out = Graph.connectedComponentsStar(pairs, "doc_a", "doc_b",
                                            maxRounds = 12)
    assert(out.select("cluster_id").distinct().count() === 1L)
    assert(out.agg(max("cluster_size")).head().getLong(0) === 64L)
  }

  test("Graph.bfsHops: hand-computed hop distances") {
    // 0-1-2-3-4 path plus branch 1-10; seeds {0}: hops are path distance,
    // truncated at maxHops.
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (1L, 10L))
      .toDF("src", "dst")
    val seeds = Seq(0L).toDF("node")
    val got = Graph.bfsHops(edges, seeds, maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(0L -> 0, 1L -> 1, 2L -> 2, 10L -> 2, 3L -> 3))
  }

  test("Graph.bfsHops: min hop over multiple seeds, early exhaustion") {
    // Two seeds on a 4-cycle: every node within 1 hop; a disconnected
    // node never appears; the frontier dies before the hop budget.
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (7L, 8L))
      .toDF("src", "dst")
    val seeds = Seq(0L, 2L).toDF("node")
    val got = Graph.bfsHops(edges, seeds, maxHops = 5)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(0L -> 0, 2L -> 0, 1L -> 1, 3L -> 1))
  }

  test("Graph.personalizedPagerank: teleport mass stays near the seed") {
    // Path 1-2-3-4-5, seed {1}: synchronous point-mass rank travels in
    // waves (node 4 receives its first mass exactly at iteration 3), so
    // the spec pins the EXACT hand-computed integer fixed-point after 3
    // rounds rather than a monotonicity that sync updates don't promise:
    // i1: (150000, 850000, 0, 0, 0)
    // i2: (511250, 127500, 361250, 0, 0)
    // i3: (204187, 588093, 54187, 153531, 0)
    val edges = sym(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    val pr = Graph.personalizedPagerank(edges, Seq(1L).toDF("node"),
                                        iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr === Map(1L -> 204187L, 2L -> 588093L, 3L -> 54187L,
                      4L -> 153531L, 5L -> 0L))
    // Determinism: a second run is bit-identical.
    val pr2 = Graph.personalizedPagerank(edges, Seq(1L).toDF("node"),
                                         iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr === pr2)
  }

  test("Graph.personalizedPagerank: hand-computed 1-iteration star") {
    // Star: center 1 — leaves 2,3; seed {1}. outdeg(1)=2, outdeg(leaf)=1.
    // contrib(1) = 1e6/2 = 500000 to each leaf; leaves contribute 0.
    // pr(1) = 150000*1 + 850000*0//1e6 = 150000
    // pr(leaf) = 0 + 850000*500000//1e6 = 425000
    val edges = sym(Seq((1L, 2L), (1L, 3L)))
    val pr = Graph.personalizedPagerank(edges, Seq(1L).toDF("node"),
                                        iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr === Map(1L -> 150000L, 2L -> 425000L, 3L -> 425000L))
  }

  test("Dedup.semanticDedupReport: pairs confined to bins, counts add up") {
    // 6 vectors in 2 obvious bins (axis-aligned): centroids are the two
    // smallest ids (c=2). Within-bin duplicates must be flagged; the
    // cross-bin near-identical pair must NOT (bin scoping is the point).
    val vecs = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0f, 1f)),   // centroids
      (2L, Array(0.99f, 0.01f)), (3L, Array(0.98f, 0.02f)),
      (4L, Array(0.01f, 0.99f)), (5L, Array(1f, 0.02f))
    ).toDF("vec_id", "embedding")
    val rep = Dedup.semanticDedupReport(vecs, "vec_id", "embedding",
                                        c = 2, tau = 0.9)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // bin 0: {0,2,3,5} all mutually cosine>0.9 -> 6 pairs, removed {2,3,5}.
    assert(rep(0L) === ((4L, 6L, 3L, 1L)))
    // bin 1: {1,4} near-dup pair -> removed {4}.
    assert(rep(1L) === ((2L, 1L, 1L, 1L)))
    // members total = input size; kept = members - removed.
    assert(rep.values.map(_._1).sum === 6L)
  }

  test("Layout.writeBucketed: equi-join on the bucket key plans zero Exchange") {
    val base = java.nio.file.Files.createTempDirectory("bkt_spec").toString
    val a = graft.operators.Layout.writeBucketed(
      Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "va"),
      s"$base/a", "bkt_spec_a", nBuckets = 4, key = "k")
    val b = graft.operators.Layout.writeBucketed(
      Seq((1L, 10L), (2L, 20L), (4L, 40L)).toDF("k", "vb"),
      s"$base/b", "bkt_spec_b", nBuckets = 4, key = "k")
    val joined = a.hint("merge").join(b, Seq("k"))
    val plan = joined.queryExecution.executedPlan.toString
    // The whole point of the bucketed layout: bucket specs match, so the
    // sort-merge join runs with NO shuffle on either side.
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
    assert(plan.contains("SortMergeJoin"))
    assert(joined.collect().map(r => (r.getLong(0), r.getString(1),
                                      r.getLong(2))).toSet ===
      Set((1L, "x", 10L), (2L, "y", 20L)))
  }

  test("top-k-per-group rank filter plans WindowGroupLimit") {
    // Spark 4 pushes rank()<=k through the window as a per-partition
    // group-limit (partial top-k before the shuffle) — the optimization
    // every keep-last-k / top-k query here leans on. Pin that it fires.
    import org.apache.spark.sql.expressions.Window
    val df = Seq((1L, 3L), (1L, 5L), (1L, 1L), (2L, 9L), (2L, 4L))
      .toDF("k", "v")
    val top = df.withColumn("rn",
        row_number().over(Window.partitionBy("k").orderBy(col("v").desc)))
      .filter(col("rn") <= 1)
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"missing group limit:\n$plan")
    assert(top.select("k", "v").collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSet === Set((1L, 5L), (2L, 9L)))
  }

  test("SummaryRewrite: matching aggregate reads the summary, not the base") {
    val base = java.nio.file.Files.createTempDirectory("mv_spec").toString
    Seq(("a", "x", 1L), ("a", "x", 2L), ("a", "y", 10L), ("b", "y", 5L))
      .toDF("g1", "g2", "m").write.mode("overwrite").parquet(s"$base/fact")
    val fact = spark.read.parquet(s"$base/fact")
    graft.plans.SummaryRewrite.publish(fact, Seq("g1", "g2"), Seq("m"),
                                       s"$base/sum")
    graft.plans.SummaryRewrite.register(spark, s"$base/fact", s"$base/sum",
                                        Seq("g1", "g2"), Seq("m"))
    try {
      def q = spark.read.parquet(s"$base/fact")
        .groupBy(col("g1"), col("g2"))
        .agg(count(lit(1)).as("n"), sum(col("m")).as("ms"),
             min(col("m")).as("mn"), max(col("m")).as("mx"))
      // The relation's columns tell which table the plan reads: only the
      // summary carries cnt/m_sum (plan strings don't show file paths).
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("m_sum#"), s"summary not used:\n$plan")
      assert(!plan.contains("(m#"), s"base still scanned:\n$plan")
      assert(q.collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toSet ===
        Set(("a", "x", 2L, 3L, 1L, 2L), ("a", "y", 1L, 10L, 10L, 10L),
            ("b", "y", 1L, 5L, 5L, 5L)))

      // Sub-grouping re-aggregates the summary (self-decomposable fns).
      val sub = spark.read.parquet(s"$base/fact")
        .groupBy(col("g1"))
        .agg(count(lit(1)).as("n"), max(col("m")).as("mx"))
      assert(sub.queryExecution.optimizedPlan.toString.contains("m_max#"))
      assert(sub.collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2))).toSet === Set(("a", 3L, 10L), ("b", 1L, 5L)))

      // Non-decomposable aggregate falls through to the base scan.
      val avgQ = spark.read.parquet(s"$base/fact")
        .groupBy(col("g1")).agg(avg(col("m")).as("a"))
      assert(avgQ.queryExecution.optimizedPlan.toString.contains("(m#"))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(
          _.isInstanceOf[graft.plans.SummaryRewrite])
    }
  }

  test("Scd3.snapshot/history: hand-computed type-3 and type-6 views") {
    import graft.operators.Scd3
    val cfg = ScdConfig(uniqueKey = Seq("k"), updatedAtCol = "ts",
                        changeInclude = Some(Seq("v")))
    val delta = Seq(
      (1L, "a", ts("2025-01-01 00:00:00")),
      (1L, "a", ts("2025-01-02 00:00:00")), // no change — collapses
      (1L, "b", ts("2025-01-03 00:00:00")),
      (1L, "c", ts("2025-01-04 00:00:00")),
      (2L, "x", ts("2025-01-01 00:00:00"))
    ).toDF("k", "v", "ts")
    val snap = Scd3.snapshot(delta, cfg, "v")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), Option(r.getString(2)), r.getLong(4))).toMap
    // key 1: current c, previous b, 2 changes; key 2: never changed.
    assert(snap(1L) === (("c", Some("b"), 2L)))
    assert(snap(2L) === (("x", None, 0L)))

    val hist = Scd3.history(delta, cfg, "v")
      .select("k", "v", "v_current")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSet
    // every historical row of key 1 carries today's value 'c'.
    assert(hist === Set((1L, "a", "c"), (1L, "b", "c"), (1L, "c", "c"),
                        (2L, "x", "x")))
  }

  test("TextAnalysis.readability: hand-computed integer score") {
    // "The cat sat. It ran!" — 2 sentences, 5 words, 5 vowel groups.
    // wps_milli = 2500, spw_milli = 1000;
    // flesch_milli = 206835 - 1015*2500/1000 - 84600*1000/1000 = 119698.
    val df = Seq((1L, "The cat sat. It ran!")).toDF("doc_id", "text")
    val r = TextAnalysis.readability(df).head()
    assert(r.getAs[Int]("n_sents") === 2)
    assert(r.getAs[Int]("n_words") === 5)
    assert(r.getAs[Int]("n_vgroups") === 5)
    assert(r.getAs[Long]("wps_milli") === 2500L)
    assert(r.getAs[Long]("spw_milli") === 1000L)
    assert(r.getAs[Long]("flesch_milli") === 119698L)
  }

  test("TextAnalysis.readability: blank text floors at one sentence") {
    val df = Seq((1L, ""), (2L, "zzz pfft")).toDF("doc_id", "text")
    val rows = TextAnalysis.readability(df).orderBy("doc_id").collect()
    assert(rows(0).getAs[Int]("n_sents") === 1)
    assert(rows(0).getAs[Int]("n_words") === 0)
    assert(rows(0).getAs[Long]("flesch_milli") === 206835L)
    // no-vowel words: spw = 0, wps = 2000.
    assert(rows(1).getAs[Long]("spw_milli") === 0L)
    assert(rows(1).getAs[Long]("flesch_milli") === 206835L - 2030L)
  }

  test("Skyline.skyline == naive quadratic dominance filter (seeded trials)") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 4) {
      val d = 2 + trial % 2 // alternate 2-D and 3-D
      val n = 150 + rnd.nextInt(100)
      // duplicates + negatives on purpose
      val pts = (1 to n).map(_ => Seq.fill(d)(rnd.nextInt(21).toLong - 10))
      val names = (0 until d).map(i => s"c$i")
      val maxCols = names.take(d - 1)
      val minCols = names.drop(d - 1) // last column minimized
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(pts.map(p =>
          org.apache.spark.sql.Row.fromSeq(p)), 5),
        org.apache.spark.sql.types.StructType(names.map(nm =>
          org.apache.spark.sql.types.StructField(
            nm, org.apache.spark.sql.types.LongType))))
      val got = Skyline.skyline(df, maxCols, minCols)
        .collect().map(_.toSeq.map(_.asInstanceOf[Long])).toSet
      // naive: normalize to all-maximize, dedup, quadratic filter
      val norm = pts.map(p => p.init ++ Seq(-p.last)).distinct
      def dom(a: Seq[Long], b: Seq[Long]) =
        a.zip(b).forall { case (x, y) => x >= y } && a != b
      val want = norm.filter(p => !norm.exists(q => dom(q, p)))
        .map(p => p.init ++ Seq(-p.last)).toSet
      assert(got === want, s"trial $trial d=$d n=$n")
    }
  }

  test("bucketed table: point predicate on the bucket key prunes buckets") {
    // Complement to the zero-Exchange join pin above: a point filter on
    // the bucket key must read ONE bucket, not the whole table — the scan
    // advertises SelectedBucketsCount. This is the read-side payoff of
    // Layout.writeBucketed at 100 TB: key lookups touch 1/N of the files.
    val base = java.nio.file.Files.createTempDirectory("bkt_prune").toString
    val t = graft.operators.Layout.writeBucketed(
      (1L to 64L).map(k => (k, s"v$k")).toDF("k", "v"),
      s"$base/t", "bkt_prune_t", nBuckets = 8, key = "k")
    // Spark's DisableUnnecessaryBucketedScan heuristic only values the
    // OUTPUT partitioning (joins/aggs) and would flip this single-table
    // scan back to unbucketed, losing pruning; pin it on for the probe.
    val conf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(conf)
    try {
      spark.conf.set(conf, "false")
      val q = t.filter(col("k") === 7L)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
             s"bucket pruning did not fire:\n$plan")
      assert(q.collect().map(_.getString(1)).toSeq === Seq("v7"))
    } finally spark.conf.set(conf, prev)
  }

  test("Graph.ssspRelax == local Bellman-Ford at every round budget") {
    val rnd = new scala.util.Random(11)
    val nodes = 0L until 25L
    val edges = (1 to 120).map { _ =>
      (nodes(rnd.nextInt(25)), nodes(rnd.nextInt(25)), rnd.nextInt(9).toLong + 1)
    }.filter { case (s0, d0, _) => s0 != d0 }.distinct
    val edf = edges.toDF("src", "dst", "cost")
    val seedDf = Seq(0L).toDF("node")
    for (rounds <- 1 to 4) {
      // independent local reference: dist over exactly <= rounds edges
      var dist = Map(0L -> 0L)
      for (_ <- 1 to rounds) {
        val relaxed = edges.flatMap { case (s0, d0, c) =>
          dist.get(s0).map(x => d0 -> (x + c))
        }
        dist = (dist.toSeq ++ relaxed).groupBy(_._1)
          .map { case (k, vs) => k -> vs.map(_._2).min }
      }
      val got = graft.operators.Graph.ssspRelax(edf, seedDf, rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === dist, s"rounds=$rounds")
    }
  }
}
