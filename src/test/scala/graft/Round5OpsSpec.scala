package graft

import org.apache.spark.sql.functions._

import graft.operators.{Compaction, Funnel, IncrementalAgg, Ivm, JoinPlanner, Layout, Profile, Rolling, Scd2, Scd2Join, Sketches, TextAnalysis, Trend}
import graft.{Expectations, ScdConfig}

/** Round-5 operators: join pre-flight, OLS trends, compaction planning,
  * BPE pair induction, skipping reports, incremental join maintenance.
  */
class Round5OpsSpec extends SparkTestBase {

  import spark.implicits._

  test("JoinPlanner.preflight: exact output cardinality and skew shares") {
    // many-to-many: key 1 is 3x2, key 2 is 1x4, key 3 left-only, 4 right-only
    val left = Seq(1, 1, 1, 2, 3).toDF("k")
    val right = Seq(1, 1, 2, 2, 2, 2, 4).toDF("r")
    val pf = JoinPlanner.preflight(left, right, "k", "r", topK = 10)
      .collect().map(r => (r.getAs[Any]("key").toString.toLong,
                           r.getAs[Long]("n_left"), r.getAs[Long]("n_right"),
                           r.getAs[Long]("out_rows"),
                           r.getAs[Long]("total_out_rows"),
                           r.getAs[Long]("share_micro")))
    assert(pf.toSeq === Seq((1L, 3L, 2L, 6L, 10L, 600000L),
                            (2L, 1L, 4L, 4L, 10L, 400000L)))
    // the prediction equals the actual join's cardinality
    val actual = left.join(right, col("k") === col("r")).count()
    assert(pf.map(_._4).sum === actual)
  }

  test("Trend.fit: perfect line is exact; degenerate groups are NULL") {
    val df = Seq(
      // g1: y = 3x + 7 exactly
      ("g1", 0L, 7L), ("g1", 1L, 10L), ("g1", 2L, 13L), ("g1", 3L, 16L),
      // g2: single point - no slope
      ("g2", 5L, 11L),
      // g3: constant y, varying x - slope 0, r2 NULL (zero y-variance)
      ("g3", 1L, 4L), ("g3", 2L, 4L), ("g3", 3L, 4L))
      .toDF("g", "x", "y")
    val m = Trend.fit(df, Seq("g"), col("x"), col("y"))
      .collect().map(r => r.getAs[String]("g") ->
        ((r.getAs[Any]("slope"), r.getAs[Any]("intercept"),
          r.getAs[Any]("r2"), r.getAs[Long]("n")))).toMap
    assert(m("g1") === ((3.0, 7.0, 1.0, 4L)))
    assert(m("g2") === ((null, null, null, 1L)))
    assert(m("g3") === ((0.0, 4.0, null, 3L)))
  }

  test("Compaction.plan: greedy sequential packing; oversized files isolate") {
    val inv = Seq(
      // partition p: four 30-byte files then one 90-byte (big), then 30
      ("p", "f1", 30L, 1), ("p", "f2", 30L, 2), ("p", "f3", 30L, 3),
      ("p", "f4", 30L, 4), ("p", "f5", 90L, 5), ("p", "f6", 30L, 6),
      // partition q: single small file
      ("q", "g1", 10L, 1))
      .toDF("part", "file", "bytes", "ord")
    val plan = Compaction.plan(inv, "part", "file", "bytes", "ord",
                               targetBytes = 64L)
    val rows = plan.collect().map(r =>
      (r.getAs[String]("part"), r.getAs[Long]("bin"),
       r.getAs[Long]("n_files"), r.getAs[Long]("bytes"))).toSet
    // smalls pack [f1,f2,f3] (cum-before 0,30,60 -> bin 0 after 64 cut at
    // f3? cum-before f3 = 60 < 64 -> bin 0; f4 cum 90 -> bin 1; f6 cum 120
    // -> bin 1), big f5 isolates at -pos=-5
    assert(rows === Set(("p", 0L, 3L, 90L), ("p", 1L, 2L, 60L),
                        ("p", -5L, 1L, 90L), ("q", 0L, 1L, 10L)))
    val sum = Compaction.summary(plan, "part").collect()
      .map(r => (r.getAs[String]("part"), r.getAs[Long]("files_before"),
                 r.getAs[Long]("files_after"))).toSet
    assert(sum === Set(("p", 6L, 3L), ("q", 1L, 1L)))
  }

  test("bpePairCounts: weighted adjacent pairs, deterministic ties") {
    val docs = Seq((1L, "aba aba cd"), (2L, "aba x")).toDF("doc_id", "text")
    // words: aba(x3), cd(x1); x dropped (length 1)
    // aba -> ab, ba each weight 3; cd -> cd weight 1
    val top = TextAnalysis.bpePairCounts(docs, "text", topK = 10)
      .collect().map(r => (r.getString(0), r.getAs[Long](1))).toSeq
    assert(top === Seq(("ab", 3L), ("ba", 3L), ("cd", 1L)))
  }

  test("skippingReport: z-order bounds both dims, linear only its own") {
    // full 32x32 grid: every (x, y) in [0, 32)^2
    val grid = (for { x <- 0 until 32; y <- 0 until 32 } yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val rep = Layout.skippingReport(
      grid,
      layouts = Seq(
        // 16 z-cells: top 2 bits of each dim -> 4x4 macro-grid
        "z" -> shiftright(Layout.zValue("x", "y", 5), 6),
        // 16 x-range cells
        "lx" -> shiftright(col("x"), 1)),
      predicates = Seq(("px", "x", 8L, 15L), ("py", "y", 8L, 15L)))
      .collect().map(r => (r.getString(0), r.getString(1),
                           r.getAs[Long]("n_cells"),
                           r.getAs[Long]("scan_cells"))).toSet
    // z: each band covers one macro-row/column = 4 of 16 cells
    // lx: x-band = 4 of 16 cells, y-band = all 16 (no y locality)
    assert(rep === Set(("z", "px", 16L, 4L), ("z", "py", 16L, 4L),
                       ("lx", "px", 16L, 4L), ("lx", "py", 16L, 16L)))
  }

  test("durationWeighted: held-time weighting, horizon closes the open version") {
    val cfg = ScdConfig(uniqueKey = Seq("k"), updatedAtCol = "u")
    // k=1: v=10 for 10s, then v=40 for 30s (closed by horizon)
    //      twa = (10*10 + 40*30) / 40 = 32.5 -> 32500 milli
    // k=2: single version v=7 held 40s (horizon)
    val rows = Seq(
      (1L, "2024-01-01 00:00:00", 10.0),
      (1L, "2024-01-01 00:00:10", 40.0),
      (2L, "2024-01-01 00:00:00", 7.0))
      .toDF("k", "u", "v").withColumn("u", to_timestamp(col("u")))
    val horizon = Seq("2024-01-01 00:00:40").toDF("h")
      .select(to_timestamp(col("h")).as("_horizon"))
    val hist = Scd2.initialLoad(rows, cfg)
    val out = Scd2.durationWeighted(hist, cfg, floor(col("v") * 1000), horizon)
      .collect().map(r => r.getAs[Long]("k") ->
        ((r.getAs[Long]("n_versions"), r.getAs[Long]("dur_sec_total"),
          r.getAs[Long]("wsum_milli_sec"), r.getAs[Any]("twa_milli")))).toMap
    assert(out(1L) === ((2L, 40L, 10000L * 10 + 40000L * 30, 32500.0)))
    assert(out(2L) === ((1L, 40L, 7000L * 40, 7000.0)))
  }

  test("CMS: estimates never underestimate; exact when collision-free") {
    val df = (1 to 40).flatMap(k => Seq.fill(k)(k.toLong)).toDF("key")
    val exact = df.groupBy("key").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // wide sketch: 40 keys in 65536 buckets -> collision-free w.h.p., so
    // the min-of-rows estimate is EXACTLY the true count
    val cms = Sketches.cmsTable(df, "key", depth = 4, width = 65536)
    assert(cms.agg(sum("cnt")).head.getLong(0) === 4L * df.count())
    val est = Sketches.cmsEstimate(cms, df.select("key").distinct(),
                                   "key", 4, 65536)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est === exact)
    // narrow sketch: collisions force overestimates, never underestimates
    val est8 = Sketches.cmsEstimate(
      Sketches.cmsTable(df, "key", depth = 2, width = 8),
      df.select("key").distinct(), "key", 2, 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) => assert(est8(k) >= n, s"key $k under") }
    // heavy hitters: top-5 by count with green bound verdicts
    val hh = Sketches.heavyHitters(df, "key", topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(hh.map(_._1).toSet === Set(40L, 39L, 38L, 37L, 36L))
    assert(hh.forall(_._3), "CMS bound verdict must hold")
  }

  test("bpeCompressionStats: merge chain builds multi-char symbols in order") {
    val docs = Seq(("g", "the thin cat"), ("g", "ththth")).toDF("lang", "text")
    val out = TextAnalysis.bpeCompressionStats(
      docs, "text", "lang",
      merges = Seq("t" -> "h", "th" -> "e", "i" -> "n"))
      .collect().map(r => (r.getAs[Long]("n_words"),
                           r.getAs[Long]("sym_before"),
                           r.getAs[Long]("sym_after"),
                           r.getAs[Long]("saved_ppm")))
    // the: t h e -> th e -> the (1 sym, was 3)
    // thin: t h i n -> th in (2, was 4);  cat: 3, was 3
    // ththth: " t h t h t h " non-overlapping -> "th t h th" (4, was 6):
    // the second " t h " occurrence shares its leading space with the
    // first match's consumed region, so the single pass skips it — the
    // greedy-single-pass semantics both engines share
    assert(out.toSeq === Seq((4L, 16L, 10L, 375000L)))
  }

  test("retractRollup/retractMerge: signed partials; zeroed keys leave") {
    val keys = Seq("k")
    def cdc(rows: (String, Long, String)*) =
      rows.toSeq.toDF("k", "vm", "_op")
    val b1 = IncrementalAgg.retractRollup(
      cdc(("a", 10L, "I"), ("a", 20L, "I"), ("b", 5L, "I")), keys, col("vm"), "_op")
    // delete one 'a' row; delete ALL of 'b' -> b leaves the store
    val b2 = IncrementalAgg.retractRollup(
      cdc(("a", 10L, "D"), ("b", 5L, "D")), keys, col("vm"), "_op")
    val s2 = IncrementalAgg.retractMerge(b1, b2, keys)
    assert(s2.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
             .toSet === Set(("a", 1L, 20L)))
    // re-insert after zero: key reappears with fresh partials
    val b3 = IncrementalAgg.retractRollup(cdc(("b", 7L, "I")), keys, col("vm"), "_op")
    val s3 = IncrementalAgg.retractMerge(s2, b3, keys)
    assert(s3.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
             .toSet === Set(("a", 1L, 20L), ("b", 1L, 7L)))
  }

  test("Profile.drift: null-rate movement and range shifts per column") {
    val ref = Seq(("x", Some(1L)), ("y", Some(2L)), ("z", Some(3L)))
      .toDF("s", "v")
    val cur = Seq(("x", Some(5L)), ("y", None), ("w", Some(1L)))
      .toDF("s", "v")
    val d = Profile.drift(ref, cur, Seq("s", "v")).collect()
      .map(r => r.getAs[String]("column") ->
        ((r.getAs[Long]("null_ppm_ref"), r.getAs[Long]("null_ppm_cur"),
          r.getAs[Long]("null_ppm_delta"), r.getAs[Boolean]("min_moved"),
          r.getAs[Boolean]("max_moved")))).toMap
    assert(d("v") === ((0L, 333333L, 333333L, false, true))) // max 3 -> 5
    assert(d("s") === ((0L, 0L, 0L, true, true)))            // x..z -> w..y
  }

  test("starJoinOrders: exact intermediates per first-pair choice") {
    // key 1: e=2,o=1,c=1 ; key 2: e=1,o=3,c=1 ; key 3: o=1 only
    val e = Seq(1, 1, 2).toDF("ek")
    val o = Seq(1, 2, 2, 2, 3).toDF("ok")
    val c = Seq(1, 2).toDF("ck")
    val rows = JoinPlanner.starJoinOrders(Seq(
      ("e", e, "ek"), ("o", o, "ok"), ("c", c, "ck")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // e*o: 2*1 + 1*3 = 5 ; e*c: 2+1 = 3 ; o*c: 1+3 = 4 ; final: 2+3 = 5
    assert(rows === Set(("e*o", 5L, 5L), ("e*c", 3L, 5L), ("o*c", 4L, 5L)))
  }

  test("alignTimelines: segment boundaries are the union of change points") {
    val cfg = ScdConfig(uniqueKey = Seq("k"), updatedAtCol = "u")
    def hist(rows: Seq[(Long, String, String)], payload: String) =
      Scd2.initialLoad(
        rows.toDF("k", "u", payload).withColumn("u", to_timestamp(col("u"))),
        cfg.copy(changeInclude = Some(Seq(payload))))
    // A changes at 00, 20; B changes at 00, 10, 30
    val a = hist(Seq((1L, "2024-01-01 00:00:00", "a1"),
                     (1L, "2024-01-01 00:00:20", "a2")), "pa")
    val b = hist(Seq((1L, "2024-01-01 00:00:00", "b1"),
                     (1L, "2024-01-01 00:00:10", "b2"),
                     (1L, "2024-01-01 00:00:30", "b3")), "pb")
    val segs = Scd2Join.alignTimelines(a, b, cfg, Seq("pa"), Seq("pb"))
      .orderBy("seg_from")
      .collect().map(r => (r.getTimestamp(1).toString.substring(17, 19),
                           r.getAs[String]("pa"), r.getAs[String]("pb")))
    // expected segments: [00,10)a1b1 [10,20)a1b2 [20,30)a2b2 [30,inf)a2b3
    assert(segs.toSeq === Seq(("00", "a1", "b1"), ("10", "a1", "b2"),
                              ("20", "a2", "b2"), ("30", "a2", "b3")))
  }

  test("quarantine: rows tagged with ALL violated rules; summary adds _clean") {
    val df = Seq((1L, 10.0), (2L, -1.0), (3L, 1000.0), (4L, -5.0))
      .toDF("id", "v")
    val rules = Seq(("nonneg", col("v") >= 0.0), ("lt100", col("v") < 100.0))
    val tagged = Expectations.quarantine(df, rules)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](2).toList).toMap
    assert(tagged(1L) === Nil)
    assert(tagged(2L) === List("nonneg"))
    assert(tagged(3L) === List("lt100"))
    assert(tagged(4L) === List("nonneg")) // -5 < 100: only one rule fails
    val sum = Expectations.quarantineSummary(df, rules)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sum === Map("_clean" -> 1L, "nonneg" -> 2L, "lt100" -> 1L))
  }

  test("linearFill: interior gaps interpolate, observations pass through") {
    val spine = Seq(
      ("a", 0, Some(100L)), ("a", 1, None), ("a", 2, None),
      ("a", 3, Some(400L)), ("a", 4, Some(50L)),
      ("b", 7, Some(9L)))
      .toDF("k", "d", "vm")
    val f = Rolling.linearFill(spine, Seq("k"), "d", "vm")
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        r.getAs[Double]("vm_filled")).toMap
    assert(f(("a", 0)) === 100.0)
    assert(f(("a", 1)) === 200.0) // 100 + 300 * 1/3
    assert(f(("a", 2)) === 300.0)
    assert(f(("a", 3)) === 400.0)
    assert(f(("a", 4)) === 50.0)
    assert(f(("b", 7)) === 9.0)
  }

  test("decayedScore: integer halvings per elapsed half-life") {
    val df = Seq(
      (1L, "2024-01-01 00:00:00", 1000L), // age 20s -> 2 halvings -> 250
      (1L, "2024-01-01 00:00:15", 1000L), // age  5s -> 0 halvings -> 1000
      (2L, "2024-01-01 00:00:05", 999L))  // age 15s -> 1 halving  -> 499
      .toDF("k", "u", "vm").withColumn("u", to_timestamp(col("u")))
    val horizon = Seq("2024-01-01 00:00:20").toDF("h")
      .select(to_timestamp(col("h")).as("_horizon"))
    val out = Rolling.decayedScore(df, Seq("k"), "u", col("vm"),
                                   horizon, halflifeSec = 10L)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("raw_micro"), r.getAs[Long]("decayed_micro")))).toMap
    assert(out(1L) === ((2000L, 1250L)))
    assert(out(2L) === ((999L, 499L)))
  }

  test("motifs: n-grams stay within one key's timeline, deterministic ties") {
    val df = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"), (1L, 4L, "a"),
      (2L, 5L, "a"), (2L, 6L, "b"), (2L, 7L, "c"),
      (3L, 8L, "x"), (3L, 9L, "y")) // too short for a trigram
      .toDF("k", "id", "t")
      .withColumn("ts", to_timestamp(lit("2024-01-01")) + expr("make_interval(0,0,0,0,0,0,id)"))
    val m = Funnel.motifs(df, "k", "ts", "id", "t", n = 3, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // a>b>c occurs for k=1 and k=2; b>c>a only k=1; no cross-key grams
    assert(m === Seq(("a>b>c", 2L), ("b>c>a", 1L)))
  }

  test("Ivm.maintain: every intermediate state equals the recomputed join") {
    val a = Seq((1, "a1"), (2, "a2"), (2, "a2b"), (3, "a3"), (5, "a5"))
      .toDF("k", "av").withColumn("i", monotonically_increasing_id())
    val b = Seq((1, "b1"), (1, "b1b"), (2, "b2"), (4, "b4"), (5, "b5"))
      .toDF("k", "bv").withColumn("j", monotonically_increasing_id())
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select("k", "av", "bv").collect().map(_.toString).sorted.toSeq

    val da = (0 until 3).map(i => a.filter(pmod(col("i"), lit(3)) === i).drop("i"))
    val db = (0 until 3).map(i => b.filter(pmod(col("j"), lit(3)) === i).drop("j"))
    // fold manually so intermediates are visible
    var (ao, bo, m) = (da.head.limit(0), db.head.limit(0),
                       da.head.join(db.head, Seq("k")).limit(0))
    (0 until 3).foreach { i =>
      m = m.unionByName(Ivm.joinDelta(ao, da(i), bo, db(i), Seq("k")))
      ao = ao.unionByName(da(i)); bo = bo.unionByName(db(i))
      assert(rows(m) === rows(ao.join(bo, Seq("k"))),
             s"maintained state diverged after batch $i")
    }
    // the one-call API agrees
    assert(rows(Ivm.maintain(da.zip(db), Seq("k"))) ===
             rows(a.drop("i").join(b.drop("j"), Seq("k"))))
  }
}
