package graft

import org.apache.spark.sql.functions._

import graft.operators.{Association, Funnel, Graph, Intervals, Layout, Linkage, Profile, Segmentation, TableDiff, TextAnalysis}

/** Round-6 operators: graph statistics (co-occurrence edges, degree-ordered
  * triangle counting), inverted-index postings, the column-encoding
  * advisor's distributed run counting, and sweep-line interval concurrency.
  */
class Round6OpsSpec extends SparkTestBase {

  import spark.implicits._

  test("Graph.coOccurrenceEdges: distinct pairs, repeats collapse") {
    // group 10 holds {1,2,3} (2 twice — must not duplicate the pair),
    // group 20 holds {2,3} (pair repeats across groups — still one edge),
    // group 30 holds {4} alone — no edges.
    val df = Seq((10, 1), (10, 2), (10, 2), (10, 3), (20, 2), (20, 3),
                 (30, 4)).toDF("g", "i")
    val edges = Graph.coOccurrenceEdges(df, "g", "i")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(edges === Set((1, 2), (1, 3), (2, 3)))
  }

  test("Graph.triangleStats: K4 has 4 triangles, closure 1") {
    // complete graph on 4 nodes: 6 edges, 12 wedges, 4 triangles,
    // clustering coefficient exactly 1.
    val edges = Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4))
      .toDF("src", "dst")
    val r = Graph.triangleStats(edges).collect()(0)
    assert(r.getAs[Long]("n_nodes") === 4L)
    assert(r.getAs[Long]("n_edges") === 6L)
    assert(r.getAs[Long]("n_wedges") === 12L)
    assert(r.getAs[Long]("n_triangles") === 4L)
    assert(r.getAs[Long]("closure_ppm") === 1000000L)
  }

  test("Graph.triangleStats: path graph has wedges but no triangles") {
    val edges = Seq((1, 2), (2, 3), (3, 4)).toDF("src", "dst")
    val r = Graph.triangleStats(edges).collect()(0)
    assert(r.getAs[Long]("n_wedges") === 2L)
    assert(r.getAs[Long]("n_triangles") === 0L)
    assert(r.getAs[Long]("closure_ppm") === 0L)
  }

  test("Graph.triangleStats: hub star plus one closing edge") {
    // star center 1 with leaves 2..5, plus edge (2,3): exactly 1 triangle.
    // Degree orientation points both (1,x) edges away from the leaf side
    // consistently; the count must still be exact.
    val edges = Seq((1, 2), (1, 3), (1, 4), (1, 5), (2, 3))
      .toDF("src", "dst")
    val r = Graph.triangleStats(edges).collect()(0)
    assert(r.getAs[Long]("n_triangles") === 1L)
  }

  test("TextAnalysis.invertedIndex: gaps, df/cf, minDf pruning") {
    val df = Seq(
      (7L, "alpha beta alpha"),
      (10L, "beta gamma"),
      (22L, "alpha beta")).toDF("doc_id", "text")
    val idx = TextAnalysis.invertedIndex(df, "doc_id", "text", minDf = 2)
      .collect().map(r => (r.getAs[String]("term"), r.getAs[Long]("df"),
                           r.getAs[Long]("cf"),
                           r.getAs[String]("postings_gaps"))).toSet
    // alpha in docs 7,22 (3 occurrences): gaps 7,15; beta in all three.
    // gamma df=1 is pruned by minDf=2.
    assert(idx === Set(("alpha", 2L, 3L, "7,15"),
                       ("beta", 3L, 3L, "7,3,12")))
  }

  test("Layout.encodingReport: bucket stitching matches a flat run count") {
    // Order 1..9, bucketSize 3 => buckets {1,2},{3,4,5},{6,7,8},{9} (DIV
    // semantics) with runs crossing every boundary, plus nulls that must
    // merge with nulls (null-safe compare) and split from values.
    val df = Seq(
      (1L, "a"), (2L, "a"), (3L, "a"),           // one run across b0/b1
      (4L, null), (5L, null), (6L, null),        // null run across b1/b2
      (7L, "b"), (8L, "c"), (9L, "c")            // b,c runs across b2/b3
    ).toDF("o", "v")
    val r = Layout.encodingReport(df, "o", Seq("v"), bucketSize = 3L)
      .collect()(0)
    assert(r.getAs[Long]("n_rows") === 9L)
    assert(r.getAs[Long]("n_runs") === 4L)   // a, null, b, c
    assert(r.getAs[Long]("ndv") === 4L)      // a, b, c, NULL
  }

  test("Layout.encodingReport: suggestion thresholds") {
    // 100 rows constant => 1 run => RLE; 100 distinct => PLAIN (ndv too
    // high for DICT); 100 rows alternating over 2 values => DICT (runs
    // 100%, ndv 2%).
    val const = (1L to 100L).map(i => (i, "k")).toDF("o", "v")
    val uniq = (1L to 100L).map(i => (i, s"u$i")).toDF("o", "v")
    val alt = (1L to 100L).map(i => (i, if (i % 2 == 0) "x" else "y"))
      .toDF("o", "v")
    def sug(df: org.apache.spark.sql.DataFrame) =
      Layout.encodingReport(df, "o", Seq("v"), 16L)
        .collect()(0).getAs[String]("suggestion")
    assert(sug(const) === "RLE")
    assert(sug(uniq) === "PLAIN")
    assert(sug(alt) === "DICT")
  }

  test("Intervals.concurrency: carry across midnight and tie semantics") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      // day 1: two overlapping + one back-to-back (end == next start:
      // must NOT overlap under end-before-start tie order)
      (ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")),
      (ts("2024-01-01 11:00:00"), ts("2024-01-01 13:00:00")),
      (ts("2024-01-01 13:00:00"), ts("2024-01-01 14:00:00")),
      // one interval spanning into day 2, where nothing else happens
      // before it ends: day 2's peak is the midnight carry (1).
      (ts("2024-01-01 23:00:00"), ts("2024-01-02 01:00:00"))
    ).toDF("st", "en")
    val r = Intervals.concurrency(df, "st", "en")
      .collect().map(x => (x.getTimestamp(0).toString.take(10),
                           x.getAs[Long]("peak_concurrency"))).toMap
    assert(r("2024-01-01") === 2L)
    assert(r("2024-01-02") === 1L)
  }

  test("Segmentation.rfm: quartiles from exact ranks, key tiebreak") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    // 4 customers, clearly ordered on every metric.
    val orders = Seq(
      (1L, ts("2024-01-10"), 100.0), (1L, ts("2024-01-20"), 100.0),
      (1L, ts("2024-02-01"), 100.0), (1L, ts("2024-02-10"), 100.0),
      (2L, ts("2024-02-05"), 50.0), (2L, ts("2024-02-07"), 50.0),
      (2L, ts("2024-02-08"), 50.0),
      (3L, ts("2024-01-15"), 30.0), (3L, ts("2024-01-25"), 30.0),
      (4L, ts("2024-01-05"), 10.0)
    ).toDF("k", "d", "amt")
    val r = Segmentation.rfm(orders, "k", "d", "amt")
      .collect().map(x => x.getAs[Long]("k") ->
        (x.getAs[Long]("r_days"), x.getAs[Long]("f"),
         x.getAs[Long]("m_cents"), x.getAs[String]("segment"))).toMap
    // horizon = 2024-02-10. recency: c1=0d, c2=2d, c3=16d, c4=36d.
    // frequency asc: c4=1, c3=2, c2=3, c1=4. monetary asc: c4 1000,
    // c3 6000, c2 15000, c1 40000. With n=4 each rank is its own quartile.
    assert(r(1L) === ((0L, 4L, 40000L, "1-4-4")))
    assert(r(2L) === ((2L, 3L, 15000L, "2-3-3")))
    assert(r(3L) === ((16L, 2L, 6000L, "3-2-2")))
    assert(r(4L) === ((36L, 1L, 1000L, "4-1-1")))
  }

  test("TableDiff.merkleDiff: identical buckets vanish, changes classify") {
    val v1 = Seq((0L, "a"), (1L, "b"), (2L, "c"), (10L, "d"))
      .toDF("k", "v")   // buckets mod 10: 0 -> {0,10}, 1 -> {1}, 2 -> {2}
    val v2 = Seq((0L, "a"), (1L, "B"), (10L, "d"), (25L, "e"))
      .toDF("k", "v")   // bucket 1 differs, 2 only_v1, 5 only_v2, 0 equal
    val d = TableDiff.merkleDiff(v1, v2, "k", 10, Seq("k", "v"))
      .collect().map(x => x.getAs[Long]("bucket") ->
        (x.getAs[Long]("n_rows_v1"), x.getAs[Long]("n_rows_v2"),
         x.getAs[String]("status"))).toMap
    assert(d === Map(1L -> ((1L, 1L, "differs")),
                     2L -> ((1L, 0L, "only_v1")),
                     5L -> ((0L, 1L, "only_v2"))))
  }

  test("Profile.fdViolations: holds, violated, fan-out, null rhs ignored") {
    val df = Seq(
      (1L, "a", "x"), (1L, "a", "x"),       // k=1 consistent
      (2L, "b", "x"), (2L, "c", "x"),       // k=2 violates k->v (fanout 2)
      (3L, "d", "y"), (3L, null, "y")       // null rhs can't witness
    ).toDF("k", "v", "z")
    val r = Profile.fdViolations(df, Seq("k" -> "v", "k" -> "z"))
      .collect().map(x => x.getAs[String]("fd") ->
        (x.getAs[Long]("n_lhs"), x.getAs[Long]("n_violating"),
         x.getAs[Long]("max_fanout"))).toMap
    assert(r("k->v") === ((3L, 1L, 2L)))
    assert(r("k->z") === ((3L, 0L, 1L)))
  }

  test("Linkage.symspellPairs: substitution, insert/delete, not distance 2") {
    val df = Seq("cold", "cold", "bold", "colds", "cavld", "zzzz")
      .toDF("name")
    val pairs = Linkage.symspellPairs(df, "name")
      .collect().map(r => (r.getAs[String]("value_a"),
                           r.getAs[String]("value_b"),
                           r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))).toSet
    // cold~bold (substitution), cold~colds (insertion); cavld is distance
    // 2 from cold (shares the deletion variant "cld" with... it doesn't —
    // but shares "cvld"? cold deletes to {old,cld,cod,col,cold}; cavld
    // deletes to {avld,cvld,cald,cavd,cavl,cavld}: disjoint, and even a
    // shared variant would be rejected by the levenshtein verify).
    assert(pairs === Set(("bold", "cold", 1L, 2L),
                         ("cold", "colds", 2L, 1L)))
  }

  test("Association.rules: support/confidence/lift on a known basket set") {
    // 4 baskets: {1,2} {1,2} {1,3} {2}; duplicate items within a basket
    // must collapse before counting.
    val df = Seq((10, 1), (10, 2), (10, 2), (20, 1), (20, 2), (30, 1),
                 (30, 3), (40, 2)).toDF("b", "i")
    val r = Association.rules(df, "b", "i", minBaskets = 2L)
      .collect().map(x => (x.getAs[Int]("antecedent"),
                           x.getAs[Int]("consequent")) ->
        (x.getAs[Long]("n_both"), x.getAs[Long]("support_ppm"),
         x.getAs[Long]("confidence_ppm"), x.getAs[Long]("lift_ppm"))).toMap
    // pair {1,2}: 2 baskets of 4; n(1)=3, n(2)=3.
    // support 500000; conf 1->2 = 2/3 = 666666; lift = 2*4/(3*3) = 888888.
    assert(r((1, 2)) === ((2L, 500000L, 666666L, 888888L)))
    assert(r((2, 1)) === ((2L, 500000L, 666666L, 888888L)))
    assert(!r.contains((1, 3))) // only 1 shared basket < minBaskets
  }

  test("Intervals.sequenceGaps: in-bucket and cross-bucket gaps") {
    // bucketSize 10: ids 1,2,5 | 17 | 23,24. Gaps: 3-4 (in-bucket),
    // 6-16 (cross: bucket 0 last=5 -> bucket 1 first=17), 18-22 (cross).
    val df = Seq(1L, 2L, 5L, 17L, 23L, 24L, 24L).toDF("id")
    val gaps = Intervals.sequenceGaps(df, "id", bucketSize = 10L)
      .collect().map(r => (r.getAs[Long]("gap_start"),
                           r.getAs[Long]("gap_end"),
                           r.getAs[Long]("gap_len"))).toSet
    assert(gaps === Set((3L, 4L, 2L), (6L, 16L, 11L), (18L, 22L, 5L)))
  }

  test("Intervals.sequenceGaps: dense sequence has none") {
    val df = (100L to 120L).toDF("id")
    assert(Intervals.sequenceGaps(df, "id", 7L).count() === 0L)
  }

  test("Profile.weightedMedian: lower weighted median, exact crossings") {
    val df = Seq(
      // g1: values 1(w3), 2(w1), 3(w2): W=6, cum(1)=3 -> 2*3 >= 6 => 1
      ("g1", 1L, 3L), ("g1", 2L, 1L), ("g1", 3L, 2L),
      // g2: values 10(w1), 20(w2): W=3, cum(10)=1 (2<3), cum(20)=3 => 20
      ("g2", 10L, 1L), ("g2", 20L, 2L),
      // g3: single value
      ("g3", 7L, 5L)
    ).toDF("g", "v", "wt")
    val r = Profile.weightedMedian(df, "g", "v", "wt", microBins = 4)
      .collect().map(x => x.getAs[String]("g") ->
        (x.getAs[Long]("w_median"), x.getAs[Long]("total_weight"))).toMap
    assert(r === Map("g1" -> ((1L, 6L)), "g2" -> ((20L, 3L)),
                     "g3" -> ((7L, 5L))))
  }

  test("Profile.weightedMedian: agrees with unweighted median at weight 1") {
    val vals = Seq(5L, 1L, 9L, 3L, 7L, 11L, 13L) // median 7
    val df = vals.map(v => ("g", v, 1L)).toDF("g", "v", "wt")
    val r = Profile.weightedMedian(df, "g", "v", "wt").collect()(0)
    assert(r.getAs[Long]("w_median") === 7L)
  }

  test("Funnel.positionAttribution: 40/20/40 splits, direct, invariant") {
    def ts(i: Int) = new java.sql.Timestamp(1700000000000L + i * 60000L)
    val df = Seq(
      // u1: 4 touches then buy: a=400k, b,c middles of 200k (100k each),
      // d=400k
      (1L, ts(1), 1L, "a"), (1L, ts(2), 2L, "b"), (1L, ts(3), 3L, "c"),
      (1L, ts(4), 4L, "d"), (1L, ts(5), 5L, "purchase"),
      // u2: single touch takes all
      (2L, ts(1), 6L, "a"), (2L, ts(2), 7L, "purchase"),
      // u3: bare purchase -> direct; trailing touch earns nothing
      (3L, ts(1), 8L, "purchase"), (3L, ts(2), 9L, "b")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val r = Funnel.positionAttribution(df, "user_id", "ts", "event_id",
                                       "event_type", "purchase")
      .collect().map(x => x.getAs[String]("channel") ->
        x.getAs[Long]("credit_ppm")).toMap
    assert(r === Map("a" -> 1400000L, "b" -> 100000L, "c" -> 100000L,
                     "d" -> 400000L, "direct" -> 1000000L))
    assert(r.values.sum === 3000000L) // 1M per conversion
  }

  test("Funnel.positionAttribution: 3 touches, remainder to early middle") {
    def ts(i: Int) = new java.sql.Timestamp(1700000000000L + i * 60000L)
    // middles m=1: the single middle takes the whole 200k.
    val df = Seq(
      (1L, ts(1), 1L, "a"), (1L, ts(2), 2L, "b"), (1L, ts(3), 3L, "c"),
      (1L, ts(4), 4L, "purchase")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val r = Funnel.positionAttribution(df, "user_id", "ts", "event_id",
                                       "event_type", "purchase")
      .collect().map(x => x.getAs[String]("channel") ->
        x.getAs[Long]("credit_ppm")).toMap
    assert(r === Map("a" -> 400000L, "b" -> 200000L, "c" -> 400000L))
  }

  test("Graph.coOccurrenceEdges: minCount keeps only repeated pairs") {
    // pair (1,2) appears in groups 10 and 20; (1,3) only in group 10.
    val df = Seq((10, 1), (10, 2), (10, 3), (20, 1), (20, 2))
      .toDF("g", "i")
    val strong = Graph.coOccurrenceEdges(df, "g", "i", minCount = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(strong === Set((1, 2)))
  }

  test("Graph.pagerank: 3 integer iterations on the path graph 1-2-3") {
    // Symmetric path edges; hand-unrolled fixed-point arithmetic:
    //   it1: pr = (575000, 1850000, 575000)
    //   it2: pr = (936250, 1127500, 936250)
    //   it3: pr = (629187, 1741625, 629187)
    val p = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val edges = p.unionAll(p.select(col("dst").as("src"),
                                    col("src").as("dst")))
    val r = Graph.pagerank(edges, iters = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(r === Set((1L, 629187L, 1L), (2L, 1741625L, 2L),
                     (3L, 629187L, 1L)))
  }

  test("Intervals.pointBandSelfJoin: cross-chunk pairs found, band respected, ties ordered") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // band 600 s. Chunks: id1@100s, id3@100s -> chunk 0; id2@650s,
    // id4@800s -> chunk 1. Expected pairs: (1,3) tie gap 0 (same chunk),
    // (1,2) 550 s and (3,2) 550 s (adjacent chunk), (2,4) 150 s.
    // (1,4)/(3,4) at 700 s exceed the band.
    val df = Seq((7L, 1L, ts(100)), (7L, 2L, ts(650)), (7L, 3L, ts(100)),
                 (7L, 4L, ts(800)), (8L, 5L, ts(100)))
      .toDF("k", "id", "ts")
    val r = Intervals.pointBandSelfJoin(df, Seq("k"), "id", "ts",
                                        600000000L)
      .collect()
      .map(x => (x.getAs[Long]("k"), x.getAs[Long]("id_a"),
                 x.getAs[Long]("id_b"), x.getAs[Long]("gap_us"))).toSet
    assert(r === Set((7L, 1L, 3L, 0L), (7L, 1L, 2L, 550000000L),
                     (7L, 3L, 2L, 550000000L), (7L, 2L, 4L, 150000000L)))
  }
}
