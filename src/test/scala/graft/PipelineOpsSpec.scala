package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal, Sampling, Similarity, TextAnalysis}

/** Unit coverage for the training-data pipeline operators (text analysis,
  * dedup, similarity, multimodal). The DuckDB oracle (q13-q26) is the
  * cross-engine check; these specs pin the *semantics* on crafted rows.
  */
class PipelineOpsSpec extends SparkTestBase {

  import spark.implicits._

  private def docsDf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("bigramLmScore: ppm conditionals over hits, OOV occurrences counted") {
    // LM corpus: "a b" x2, "a c" x1 => P(b|a)=2/3 (666666 ppm),
    // P(c|a)=1/3 (333333 ppm); "b z" => P(z|b)=1 (1000000 ppm)
    val lm = docsDf((100L, "a b z"), (101L, "a b"), (102L, "a c"))
    // doc 1: bigrams "a b"(hit 666666), "b q"(OOV) ; doc 2: all OOV
    val scored = TextAnalysis
      .bigramLmScore(docsDf((1L, "a b q"), (2L, "x y")), lm, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(scored(1L) === ((2L, 1L, 666666L, 666666L)))
    assert(scored(2L) === ((1L, 1L, 0L, 0L))) // all-OOV => avg 0, not div0
    // single-token / blank docs don't emit rows
    assert(TextAnalysis.bigramLmScore(
      docsDf((3L, "solo"), (4L, "  ")), lm, "doc_id", "text").count() === 0)
  }

  test("termHits is token-exact; containsPhrase needs consecutive tokens") {
    val df = docsDf(
      (1L, "the class has Ass and ass twice"),
      (2L, "fast table wins"),
      (3L, "fast red table"))
    val out = df.select(
      col("doc_id"),
      TextAnalysis.termHits(col("text"), Seq("ass")).as("h"),
      TextAnalysis.containsPhrase(col("text"), "Fast  Table").as("p"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap
    assert(out(1L) === ((2, false))) // "class" never hits "ass"
    assert(out(2L) === ((0, true)))
    assert(out(3L) === ((0, false))) // non-adjacent tokens don't match
  }

  test("remixRates: binding stratum keeps all, others cut to proportion") {
    // mass a=100, b=50; 50/50 target => F* = min(100/0.5, 50/0.5) = 100
    // => rate_a = 0.5*100/100 = 500000 ppm, rate_b = 0.5*100/50 = 1e6 (capped)
    val df = Seq(
      (1L, "a", 60L), (2L, "a", 40L),
      (3L, "b", 50L),
      (4L, "c", 999L) // unlisted stratum: no rate row, dropped by apply
    ).toDF("id", "s", "w")
    val rates = Sampling.remixRates(df, "s", col("w"),
                                    Seq("a" -> 500000L, "b" -> 500000L))
    val r = rates.collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2), x.getLong(3)))
      .toMap
    assert(r === Map("a" -> ((100L, 500000L, 500000L)),
                     "b" -> ((50L, 500000L, 1000000L))))
    val kept = Sampling.remixApply(df, "id", "s", rates)
    // b's rate is 1e6: every b row survives; c never does
    assert(kept.filter($"s" === "b").count() === 1)
    assert(kept.filter($"s" === "c").count() === 0)
    // the kept set is the deterministic hash draw under each stratum's rate
    val expected = df.filter($"s".isin("a", "b"))
      .filter(Sampling.hashBucket(col("id"), 1000000) <
        when($"s" === "a", 500000L).otherwise(1000000L))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept.select("id").collect().map(_.getLong(0)).toSet === expected)
  }

  test("dupSpanStats: corpus-global span counts, within-doc repeats count") {
    val df = docsDf(
      (1L, "a b c d e"),     // spans abc, bcd, cde -> abc shared with doc 2
      (2L, "x a b c y"),     // spans xab, abc, bcy
      (3L, "p q r s"),       // all unique
      (4L, "m m m m m"),     // mmm x3: self-duplication is duplication
      (5L, "just two"))      // < n tokens -> no row
    val out = Dedup.dupSpanStats(df, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out === Map(
      1L -> ((3L, 1L, 333333L)),
      2L -> ((3L, 1L, 333333L)),
      3L -> ((2L, 0L, 0L)),
      4L -> ((3L, 3L, 1000000L))))
  }

  test("urlDomains: host extraction, per-domain doc and url counts") {
    val df = docsDf(
      (1L, "see https://a.example.com/x and https://a.example.com/y"),
      (2L, "http://b.org/z then https://a.example.com"),
      (3L, "no links at all"))
    val out = TextAnalysis.urlDomains(df, "doc_id", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out === Map("a.example.com" -> ((2L, 3L)), "b.org" -> ((1L, 1L))))
  }

  test("stripMarkup/markupStats: tags out, whitespace squeezed, ppm ratio") {
    val df = docsDf(
      (1L, "<p>hello <b>world</b></p>"),
      (2L, "plain text"))
    val out = TextAnalysis.markupStats(df, "text")
      .select("doc_id", "text_clean", "markup_ratio_ppm")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L)._1 === "hello world")
    // 25 raw chars -> 11 clean = 14 removed = 560000 ppm
    assert(out(1L)._2 === 560000L)
    assert(out(2L) === (("plain text", 0L)))
  }

  test("fingerprint: whitespace/case-insensitive content identity") {
    val df = docsDf(
      1L -> "Hello  World",
      2L -> "hello world",
      3L -> "hello worlds")
    val fps = df.select(TextAnalysis.fingerprint($"text")).as[String].collect()
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
  }

  test("exact dedup groups identical content, smallest id is canonical") {
    val out = Dedup.exact(
      docsDf(5L -> "a b c", 2L -> "A  B C", 9L -> "x y"), "doc_id", "text")
      .orderBy("canonical_id").collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq === Seq((2L, 2L), (9L, 1L)))
  }

  test("clusterPairs: transitive closure, min-id labels, component sizes") {
    // path 1-2-3 (1~3 only via transitivity), separate pair 10-20,
    // duplicate/reversed edges must not double-count
    val pairs = Seq((2L, 1L), (2L, 3L), (10L, 20L), (20L, 10L))
      .toDF("doc_a", "doc_b")
    // both the adaptive (driver union-find) and the forced-distributed
    // (min-label propagation) paths must produce identical labels
    for (threshold <- Seq(1000000L, 0L)) {
      val out = Dedup.clusterPairs(pairs, smallGraphEdges = threshold)
        .orderBy("doc_id")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(out.toSeq === Seq(
        (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
        (10L, 10L, 2L), (20L, 10L, 2L)), s"threshold $threshold")
    }
  }

  test("clusterPairs == driver-side union-find on random graphs") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 5) {
      val n = 30 + rnd.nextInt(40)
      val edges = (1 to n / 2 + rnd.nextInt(n))
        .map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
        .distinct
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      // always link the larger root under the smaller -> root == component min
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = parent.keys.map(x => x -> find(x)).toMap
      val expectedSizes =
        expected.groupBy(_._2).map { case (c, m) => c -> m.size.toLong }
      // smallGraphEdges = 0 forces the distributed min-label rounds — the
      // adaptive default would route these tiny graphs to union-find and
      // make the comparison self-confirming
      val out = Dedup.clusterPairs(edges.toDF("doc_a", "doc_b"),
                                   smallGraphEdges = 0L).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(out.map(t => t._1 -> t._2).toMap === expected, s"trial $trial labels")
      assert(out.map(t => t._2 -> t._3).toMap === expectedSizes, s"trial $trial sizes")
      val adaptive = Dedup.clusterPairs(edges.toDF("doc_a", "doc_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(adaptive.sorted.toSeq === out.sorted.toSeq, s"trial $trial paths agree")
    }
  }

  test("sessionize: gap splits, boundary gap stays, per-session aggregates") {
    import java.sql.Timestamp
    def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val ev = Seq(
      (1L, ts(0), "view"), (1L, ts(10), "click"), // same session
      (1L, ts(40), "view"), // exactly 30 min since :10 -> NOT a new session
      (1L, ts(59), "buy"), // 19 min gap, still session 1
      (2L, ts(5), "view")
    ).toDF("user_id", "ts", "event_type")
    val out = graft.operators.Sessionize
      .sessions(ev, "user_id", "ts", "event_type")
      .orderBy("user_id", "session_start")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
                 r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq(
      (1L, ts(0), ts(59), 4L, 3L),
      (2L, ts(5), ts(5), 1L, 1L)))

    // a 31-minute gap DOES split
    val split = graft.operators.Sessionize
      .sessions(Seq((3L, ts(0), "a"), (3L, ts(31), "b"))
                  .toDF("user_id", "ts", "event_type"),
                "user_id", "ts", "event_type")
    assert(split.count() === 2)
  }

  test("token counts: whitespace vs BPE-ish; quality gate") {
    val m = TextAnalysis.qualityMetrics(docsDf(1L -> "Don't stop, believing!"))
      .select("n_tokens", "n_bpe_tokens", "n_punct").head()
    assert(m.getInt(0) === 3) // whitespace tokens
    // Don ' t stop , believing !  -> 7 BPE-ish pieces
    assert(m.getInt(1) === 7)
    assert(m.getInt(2) === 3) // ' , !
  }

  test("repetitionMetrics: dup-token/top-bigram counts and the integer gate") {
    val out = TextAnalysis.repetitionMetrics(docsDf(
      1L -> "spam spam spam spam",       // one token repeated: fully repetitive
      2L -> "a b c d e f g h",           // all distinct: clean
      3L -> "x"))                        // single token: no bigrams
      .orderBy("doc_id").collect()
    val r1 = out(0)
    assert(r1.getAs[Int]("token_count") === 4)
    assert(r1.getAs[Int]("distinct_tokens") === 1)
    assert(r1.getAs[Int]("dup_tokens") === 3)
    assert(r1.getAs[Int]("top_token_count") === 4)
    assert(r1.getAs[Int]("bigram_count") === 3)   // "spam spam" x3
    assert(r1.getAs[Int]("top_bigram_count") === 3)
    assert(r1.getAs[Boolean]("is_repetitive"))
    val r2 = out(1)
    assert(r2.getAs[Int]("dup_tokens") === 0)
    assert(r2.getAs[Int]("top_bigram_count") === 1)
    assert(!r2.getAs[Boolean]("is_repetitive"))
    val r3 = out(2)
    assert(r3.getAs[Int]("bigram_count") === 0)
    assert(r3.getAs[Int]("top_bigram_count") === 0)
    assert(!r3.getAs[Boolean]("is_repetitive"))
  }

  test("topTokensByLang: per-language tf ranking with (tf desc, token) ties") {
    val out = TextAnalysis.topTokensByLang(docsDf(
      1L -> "the cat and the dog",
      2L -> "der hund ist nicht hier",
      3L -> "zzz qqq zzz"), k = 2)
      .orderBy("lang_pred", "rank")
      .as[(String, String, Long, Int)].collect()
    assert(out.count(_._1 == "en") === 2)
    assert(out.filter(_._1 == "en").head === (("en", "the", 2L, 1)))
    assert(out.filter(_._1 == "und").map(_._2).toSeq === Seq("zzz", "qqq"))
  }

  test("ivfTopK nprobe=2 probes a superset of nprobe=1's lists") {
    val vecs = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(8)(d => ((i * 7 + d * 13) % 19 - 9) / 9.0f))
    }.toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" < 4)
    val p1 = Similarity.ivfTopK(q, vecs, "vec_id", "embedding", k = 5, c = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val p2 = Similarity.ivfTopK(q, vecs, "vec_id", "embedding", k = 5, c = 8,
                                nprobe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // every rank-1-list candidate that survived top-k under nprobe=1 is still
    // scored under nprobe=2; top-k can only improve (more candidates)
    assert(p2.size >= p1.size)
    val scored1 = Similarity.ivfTopK(q, vecs, "vec_id", "embedding",
                                     k = 1000, c = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val scored2 = Similarity.ivfTopK(q, vecs, "vec_id", "embedding",
                                     k = 1000, c = 8, nprobe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(scored1.subsetOf(scored2))
  }

  test("keepCanonical: cluster losers dropped, canonical + singletons kept") {
    val pairs = Seq((1L, 2L), (2L, 5L), (7L, 8L)).toDF("doc_a", "doc_b")
    val corpus = (1L to 9L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val kept = Dedup.keepCanonical(corpus, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    // clusters {1,2,5} -> keep 1; {7,8} -> keep 7; singletons untouched
    assert(kept === Set(1L, 3L, 4L, 6L, 7L, 9L))
  }

  test("profile: one row per column with null/distinct/min/max") {
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("a")))
      .toDF("id", "tag")
    val p = graft.operators.Profile.profile(df, Seq("id", "tag"))
      .orderBy("column").collect()
    val id = p(0)
    assert(id.getAs[String]("column") === "id")
    assert(id.getAs[Long]("n_rows") === 3 && id.getAs[Long]("n_nulls") === 0)
    assert(id.getAs[Long]("n_distinct") === 3)
    assert(id.getAs[String]("min_str") === "1" && id.getAs[String]("max_str") === "3")
    val tag = p(1)
    assert(tag.getAs[Long]("n_nulls") === 1)
    assert(tag.getAs[Long]("n_distinct") === 1)
    assert(tag.getAs[String]("max_str") === "a")
  }

  test("hash split: deterministic md5 buckets, exhaustive + stable labels") {
    val df = (0L until 200L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val s1 = graft.operators.Sampling
      .split(df, "doc_id", Seq("train" -> 900, "val" -> 50, "test" -> 50))
    val byLabel = s1.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(byLabel.values.sum === 200L)
    // md5("1") = c4ca4238... -> 0xc4ca4238 % 1000 = 416 -> train
    val d1 = s1.filter($"doc_id" === 1).select("split").as[String].head()
    assert(d1 === "train")
    // sample(1, 5) keeps exactly the bucket<1 rows of den=5 and is stable
    val kept = graft.operators.Sampling.sample(df, "doc_id", 1, 5)
      .select("doc_id").as[Long].collect().toSet
    val again = graft.operators.Sampling.sample(df, "doc_id", 1, 5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === again && kept.nonEmpty && kept.size < 200)
  }

  test("histogram: clamped fixed-width bins with exact edges") {
    val df = Seq(-5.0, 0.0, 9.9, 10.0, 55.0, 99.9, 150.0, Double.NaN)
      .toDF("x").filter(!isnan($"x"))
    val h = graft.operators.Profile.histogram(df, "x", 0.0, 100.0, 10)
      .orderBy("bin").as[(Long, Long, Double)].collect()
    // -5 clamps into bin 0; 150 clamps into bin 9; 10.0 starts bin 1
    assert(h.toSeq === Seq((0L, 3L, 0.0), (1L, 1L, 10.0), (5L, 1L, 50.0),
                           (9L, 2L, 90.0)))
  }

  test("profileApprox: HLL distincts track the exact profiler within rsd") {
    val df = (1L to 2000L).map(i => (i, (i % 97).toString)).toDF("id", "tag")
    val exact = graft.operators.Profile.profile(df, Seq("id", "tag"))
      .select("column", "n_distinct").as[(String, Long)].collect().toMap
    val approx = graft.operators.Profile.profileApprox(df, Seq("id", "tag"))
      .select("column", "n_distinct").as[(String, Long)].collect().toMap
    for ((c, ex) <- exact) {
      assert(math.abs(approx(c) - ex) <= math.max(2L, (ex * 0.15).toLong),
             s"$c: approx ${approx(c)} vs exact $ex")
    }
  }

  test("funnel: stages count only in order") {
    import java.sql.Timestamp
    def ts(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, ts(1), "signup"), (1L, ts(2), "click"), (1L, ts(3), "purchase"),
      // user 2: click BEFORE signup -> click/purchase don't count
      (2L, ts(1), "click"), (2L, ts(2), "signup"), (2L, ts(3), "view"),
      // user 3: no signup at all
      (3L, ts(1), "click"), (3L, ts(2), "purchase"),
      // user 4: signup and click same instant (>= counts), no purchase
      (4L, ts(5), "signup"), (4L, ts(5), "click"))
      .toDF("user_id", "ts", "event_type")
    val r = graft.operators.Funnel
      .stages(ev, "user_id", "ts", "event_type",
              Seq("signup", "click", "purchase")).head()
    assert((r.getAs[Long]("n_users"), r.getAs[Long]("n_signup"),
            r.getAs[Long]("n_click"), r.getAs[Long]("n_purchase")) ===
      ((4L, 3L, 2L, 1L)))
  }

  test("lastTouchAttribution: nearest preceding touch, direct fallback") {
    import java.sql.Timestamp
    def ts(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val ev = Seq(
      (1L, ts(1), 1L, "click"), (1L, ts(2), 2L, "view"),
      (1L, ts(3), 3L, "purchase"),                        // view gets credit
      (1L, ts(4), 4L, "purchase"),                        // still view (purchases skip)
      (2L, ts(1), 5L, "purchase"),                        // nothing precedes: direct
      (3L, ts(6), 6L, "click"), (3L, ts(6), 7L, "purchase")) // same instant: id order
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = graft.operators.Funnel
      .lastTouchAttribution(ev, "user_id", "ts", "event_id", "event_type",
                            "purchase")
      .as[(String, Long)].collect().toMap
    assert(out === Map("view" -> 2L, "direct" -> 1L, "click" -> 1L))
  }

  test("cohortRetention: Monday cohorts, offset weeks, pre-signup ignored") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    // 2024-01-01 is a Monday
    val ev = Seq(
      (1L, ts("2024-01-02 10:00:00"), "signup"),  // cohort wk0
      (1L, ts("2024-01-09 10:00:00"), "click"),   // active wk1
      (1L, ts("2024-01-17 10:00:00"), "view"),    // active wk2
      (2L, ts("2024-01-03 10:00:00"), "signup"),  // cohort wk0
      (2L, ts("2023-12-28 10:00:00"), "click"),   // BEFORE cohort: ignored
      (3L, ts("2024-01-10 10:00:00"), "signup"))  // cohort wk1
      .toDF("user_id", "ts", "event_type")
    val out = graft.operators.Funnel
      .cohortRetention(ev, "user_id", "ts", "event_type", "signup")
      .orderBy("cohort_week", "week_offset")
      .collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getLong(1),
                 r.getLong(2)))
    assert(out.toSeq === Seq(
      ("2024-01-01", 0L, 2L),   // users 1+2 active in their signup week
      ("2024-01-01", 1L, 1L),   // user 1 week+1
      ("2024-01-01", 2L, 1L),   // user 1 week+2
      ("2024-01-08", 0L, 1L)))  // user 3's cohort
  }

  test("discreteQuantiles: selection at ceil(q% * n), null-safe") {
    val df = ((1 to 10).map(i => ("a", i.toDouble)) :+ ("a", Double.NaN))
      .filter(!_._2.isNaN)
      .toDF("g", "v")
      .unionByName(Seq(("b", 5.0), ("b", 1.0), ("b", 9.0)).toDF("g", "v"))
    val out = graft.operators.Profile
      .discreteQuantiles(df, "g", "v", Seq(50, 90, 100))
      .orderBy("g", "q").as[(String, Int, Double)].collect()
    // a: n=10 -> ranks 5, 9, 10; b: n=3 -> ranks 2, 3, 3
    assert(out.toSeq === Seq(("a", 50, 5.0), ("a", 90, 9.0), ("a", 100, 10.0),
                             ("b", 50, 5.0), ("b", 90, 9.0), ("b", 100, 9.0)))
  }

  test("rolling trailing window: range frame over micros, sums as longs") {
    val t0 = java.sql.Timestamp.valueOf("2025-01-01 00:00:00")
    def plusDays(d: Int) =
      new java.sql.Timestamp(t0.getTime + d * 86400000L)
    val df = Seq((1L, t0, 1.5), (1L, plusDays(3), 2.25), (1L, plusDays(8), 4.0),
                 (2L, plusDays(8), 8.0))
      .toDF("user_id", "ts", "value")
    val out = graft.operators.Rolling
      .trailing(df, "user_id", "ts", "value", 7L * 86400 * 1000000)
      .orderBy("user_id", "ts")
      .select("n_window", "value_micro_sum_window")
      .as[(Long, Long)].collect()
    // user 1: [t0]=1; [t0,3d]=2; [3d,8d]=2 (t0 out of range); user 2: 1
    assert(out.toSeq === Seq((1L, 1500000L), (2L, 3750000L),
                             (2L, 6250000L), (1L, 8000000L)))
  }

  test("kmeansStep: quantized per-(centroid, dim) sums over assignments") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(1.0f, 0.1f)), (3L, Array(0.1f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.kmeansStep(vecs, "vec_id", "embedding", c = 2)
      .orderBy("centroid_id", "dim")
      .as[(Long, Int, Long, Long)].collect()
    // centroids = vecs 0,1; vec2 -> c0, vec3 -> c1; floor(0.1f*1e6) = 100000
    assert(out.toSeq === Seq(
      (0L, 1, 2L, 2000000L), (0L, 2, 2L, 100000L),
      (1L, 1, 2L, 100000L), (1L, 2, 2L, 2000000L)))
  }

  test("langId: stopword vote with priority tie-break, und fallback") {
    val out = docsDf(
      1L -> "the cat and the dog",
      2L -> "der hund ist nicht hier",
      3L -> "zzz qqq www")
      .select($"doc_id", TextAnalysis.langId($"text").as("l"))
      .orderBy("doc_id").as[(Long, String)].collect().map(_._2)
    assert(out.toSeq === Seq("en", "de", "und"))
  }

  test("ngram jaccard: near-identical docs pair up, distinct docs do not") {
    val df = docsDf(
      1L -> "a b c d e f g h",
      2L -> "a b c d e f g x", // shares most 3-gram shingles
      3L -> "p q r s t u v w")
    val pairs = Dedup.ngramJaccardPairs(df, "doc_id", "text", n = 3,
                                        tauNum = 1, tauDen = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(pairs.toSeq === Seq((1L, 2L)))
  }

  test("minhash LSH finds planted near-duplicates and verifies exactly") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val df = docsDf(
      1L -> base,
      2L -> (base + " extra"),
      3L -> "completely different content with no shared shingles at all")
    val lsh = Dedup.minhashLshPairs(df, "doc_id", "text", n = 3,
                                    bands = 4, rows = 3, tauNum = 1, tauDen = 2)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(lsh.toSeq === Seq((1L, 2L)))
  }

  test("simhash: identical token sets hash identically; hamming filter works") {
    val df = docsDf(1L -> "alpha beta gamma", 2L -> "gamma beta alpha alpha",
                    3L -> "one two three four five six seven")
    val sigs = df.select($"doc_id",
                         Dedup.simhash32(TextAnalysis.tokens($"text")).as("s"))
      .orderBy("doc_id").as[(Long, Long)].collect().map(_._2)
    assert(sigs(0) === sigs(1)) // same distinct token set
    val pairs = Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(pairs.contains((1L, 2L)))
  }

  test("cosine: exact on known vectors; brute-force top-k ranks correctly") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(1.0f, 0.1f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val c = vecs.filter($"vec_id" === 0)
      .crossJoin(vecs.filter($"vec_id" === 2).select($"embedding".as("e2")))
      .select(Similarity.cosine($"embedding", $"e2")).as[Double].head()
    assert(math.abs(c) < 1e-12) // orthogonal
    val top = Similarity.bruteForceTopK(
      vecs.filter($"vec_id" === 0), vecs, "vec_id", "embedding", k = 3)
      .orderBy("rank").select("neighbor_id").as[Long].collect()
    assert(top.toSeq === Seq(1L, 2L, 3L)) // by descending cosine
  }

  test("lsh/ivf ANN: self-consistent and non-empty on clustered vectors") {
    val vecs = (0 until 64).map { i =>
      val base = if (i % 2 == 0) Array(1.0f, 0.0f, 0.0f) else Array(0.0f, 1.0f, 0.0f)
      (i.toLong, base.zipWithIndex.map { case (v, d) => v + (i * (d + 1) % 7) * 0.01f })
    }.toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" < 4)
    val lsh = Similarity.lshTopK(q, vecs, "vec_id", "embedding", k = 5, planes = 4)
    val ivf = Similarity.ivfTopK(q, vecs, "vec_id", "embedding", k = 5, c = 4)
    assert(lsh.count() > 0 && ivf.count() > 0)
    // every returned neighbor of an even query should be even (same cluster)
    val parity = ivf.filter($"query_id" % 2 === 0)
      .select("neighbor_id").as[Long].collect()
    assert(parity.forall(_ % 2 == 0))
  }

  test("multimodal: batched feature extraction matches direct computation") {
    val docs = docsDf(
      0L -> "abc",
      1L -> "",
      2L -> ("x" * 300)) // > width cap when resized
    val feats = Multimodal.featuresFromDocuments(docs)
      .orderBy("doc_id").collect()
    val r0 = feats(0)
    assert(r0.getAs[String]("modality") === "image")
    assert(r0.getAs[Int]("n_bytes") === 3)
    assert(r0.getAs[Long]("byte_sum") === ('a' + 'b' + 'c').toLong)
    assert(r0.getAs[Int]("n_distinct_bytes") === 3)
    val r1 = feats(1)
    assert(r1.getAs[Long]("byte_sum") === 0L && r1.getAs[Long]("mean_byte_e4") === 0L)
    val r2 = feats(2)
    assert(r2.getAs[Int]("n_distinct_bytes") === 1)
    assert(r2.getAs[Int]("resized_width") <= 224)
    // frame sampling: first/middle/last, deduped when they coincide
    assert(Multimodal.sampleFrameIndices(1) === Seq(0))
    assert(Multimodal.sampleFrameIndices(30) === Seq(0, 15, 29))
    // header round-trip through the REAL containers: doc 0 is image (PNG),
    // doc 1 audio (WAV, empty payload), doc 2 video (MP4)
    assert(r0.getAs[Int]("hdr_width") === 16 + 3 % 64)
    assert(r0.getAs[Int]("hdr_height") === 16 + 3 % 48)
    assert(r0.getAs[Int]("hdr_bit_depth") === 8)
    assert(feats(1).getAs[Int]("hdr_channels") === 1) // chars=0 -> mono
    assert(feats(1).getAs[Int]("hdr_sample_rate") === 8000)
    assert(feats(1).getAs[Long]("hdr_n_samples") === 0L)
    assert(feats(2).getAs[Long]("hdr_duration_ms") === 300L * 1000 / 8000)
  }

  test("multimodal containers: byte-level parse round-trip and corruption detection") {
    val payload = "the quick brown fox".getBytes("UTF-8")
    // PNG: exact header fields back, CRC verified
    val png = Multimodal.buildPng(640, 480, 8, 2, payload)
    assert(Multimodal.parsePng(png) ===
      Multimodal.PngHeader(640, 480, 8, 2))
    // corrupting one IHDR byte must fail the CRC, not return garbage
    val bad = png.clone(); bad(17) = (bad(17) ^ 0x01).toByte
    intercept[IllegalArgumentException](Multimodal.parsePng(bad))
    // WAV: stereo 8-bit, odd payload pads to a whole frame
    val wav = Multimodal.buildWav(2, 44100, 8, payload)
    assert(Multimodal.parseWav(wav) ===
      Multimodal.WavHeader(2, 44100, 8, (payload.length + 1) / 2))
    // MP4: mvhd v0 timescale/duration -> milliseconds
    val mp4 = Multimodal.buildMp4(600, 1800L, payload)
    assert(Multimodal.parseMp4(mp4) === Multimodal.Mp4Header(600, 3000L))
    // sniffing dispatches on magic bytes and rejects junk
    assert(Multimodal.decode(png).isInstanceOf[Multimodal.PngHeader])
    assert(Multimodal.decode(wav).isInstanceOf[Multimodal.WavHeader])
    assert(Multimodal.decode(mp4).isInstanceOf[Multimodal.Mp4Header])
    intercept[IllegalArgumentException](Multimodal.decode(payload))
  }

  test("jpeg: marker walk round-trip, progressive flag, EXIF endianness, truncation") {
    // payload deliberately contains 0xFF bytes: the builder must stuff
    // them (FF 00) or the walk would misparse entropy data as markers
    val payload =
      Array[Byte](1, 2, 0xff.toByte, 3, 0xff.toByte, 0xff.toByte, 4)
    val base = Multimodal.buildJpeg(800, 600, orientation = 6,
                                    progressive = false, payload)
    assert(Multimodal.parseJpeg(base) ===
      Multimodal.JpegHeader(800, 600, 8, 3, 0, 6))
    val prog = Multimodal.buildJpeg(320, 200, orientation = 1,
                                    progressive = true, payload)
    assert(Multimodal.parseJpeg(prog) ===
      Multimodal.JpegHeader(320, 200, 8, 3, 1, 1))
    // sniffing dispatches FFD8 to the JPEG walk
    assert(Multimodal.decode(base) ===
      Multimodal.JpegHeader(800, 600, 8, 3, 0, 6))

    // little-endian (II) EXIF: hand-build the APP1 with an Intel TIFF —
    // value bytes land in the LOW half of the value slot
    def be16(v: Int) = Array((v >>> 8).toByte, (v & 0xff).toByte)
    def le16(v: Int) = Array((v & 0xff).toByte, (v >>> 8).toByte)
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
                             ((v >>> 16) & 0xff).toByte, (v >>> 24).toByte)
    val tiffLe = "II".getBytes("US-ASCII") ++ le16(42) ++ le32(8) ++
      le16(1) ++ le16(0x0112) ++ le16(3) ++ le32(1) ++
      le16(8) ++ le16(0) ++ le32(0)
    val app1Body = "Exif".getBytes("US-ASCII") ++
      Array(0.toByte, 0.toByte) ++ tiffLe
    val app1 = Array(0xff.toByte, 0xe1.toByte) ++
      be16(app1Body.length + 2) ++ app1Body
    val sof = Array(0xff.toByte, 0xc0.toByte) ++ be16(11) ++
      Array(8.toByte) ++ be16(10) ++ be16(20) ++
      Array[Byte](1) ++ Array[Byte](1, 0x11, 0) // ncomp=1, comp spec
    val eoi = Array(0xff.toByte, 0xd9.toByte)
    val soi = Array(0xff.toByte, 0xd8.toByte)
    assert(Multimodal.parseJpeg(soi ++ app1 ++ sof ++ eoi) ===
      Multimodal.JpegHeader(20, 10, 8, 1, 0, 8))

    // truncation anywhere before SOF fails loudly, never a partial header
    val cutInSegment = base.take(12) // mid-APP1
    intercept[IllegalArgumentException](Multimodal.parseJpeg(cutInSegment))
    val cutBeforeSof = soi ++ app1 // walk runs off the end
    intercept[IllegalArgumentException](Multimodal.parseJpeg(cutBeforeSof))
    // SOS before any SOF: loud failure, not orientation-only output
    val sosOnly = soi ++ (Array(0xff.toByte, 0xda.toByte) ++ be16(4) ++
      Array[Byte](0, 0))
    intercept[IllegalArgumentException](Multimodal.parseJpeg(sosOnly))
    // declared segment length running past the buffer = truncated body
    val badLen = soi ++ (Array(0xff.toByte, 0xe1.toByte) ++ be16(9999))
    intercept[IllegalArgumentException](Multimodal.parseJpeg(badLen))
  }

  test("contaminationStats: shingle overlap with the eval slice, 20% gate") {
    // doc 10 is the eval doc; doc 1 copies it verbatim (full overlap),
    // doc 2 shares nothing, doc 3 shares a prefix
    val df = docsDf(
      10L -> "alpha beta gamma delta epsilon",
      1L -> "alpha beta gamma delta epsilon",
      2L -> "one two three four five",
      3L -> "alpha beta gamma zeta eta")
    val out = Dedup.contaminationStats(df, "doc_id", "text",
                                       isEval = $"doc_id" % 10 === 0, n = 3)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L)) // train rows only
    val byId = out.map(r => r.getLong(0) ->
      (r.getInt(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(byId(1L) === ((3, 3L, true)))  // all 3 shingles shared
    assert(byId(2L) === ((3, 0L, false)))
    assert(byId(3L) === ((3, 1L, true))) // 1/3 >= 20%
  }

  test("packBins: greedy contiguous fill, bin boundary at the budget") {
    // 4 docs of 3 tokens each, budget 6 => docs 1,2 -> bin 0; 3,4 -> bin 1
    val df = Seq((1L, "a b c", "en"), (2L, "d e f", "en"),
                 (3L, "g h i", "en"), (4L, "j k l", "en"),
                 (5L, "x y", "fr")).toDF("doc_id", "text", "lang")
    val out = operators.Packing
      .packBins(df, "doc_id", "text", binTokens = 6L, partCols = Seq("lang"))
      .orderBy("lang", "bin_id").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
                         r.getLong(3))).toSeq ===
      Seq(("en", 0L, 2L, 6L), ("en", 1L, 2L, 6L), ("fr", 0L, 1L, 2L)))
    // full bins fill to exactly 1e6 ppm
    assert(out.filter(_.getString(0) == "en").forall(_.getLong(4) == 1000000L))
  }

  test("bm25TopK: more query-term mass ranks higher; no-hit docs absent") {
    val df = docsDf(
      1L -> "spark spark merge window other words here",
      2L -> "spark alone in a long document with many other words",
      3L -> "nothing relevant at all")
    val out = TextAnalysis
      .bm25TopK(df, "doc_id", "text", Seq("spark", "merge", "window"), k = 10)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(1L, 2L)) // doc 3 filtered out
    assert(out(0).getLong(2) > out(1).getLong(2))       // score_ppm ordered
    assert(out(0).getLong(3) === 3L && out(1).getLong(3) === 1L) // n_terms
  }

  test("stratifiedCap: per-stratum cap, deterministic md5 draw order") {
    val df = (1L to 100L).map(i => (i, if (i % 2 == 0) "en" else "fr"))
      .toDF("doc_id", "lang")
    val out = Sampling.stratifiedCap(df, "doc_id", Seq("lang"), cap = 7)
    val counts = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts === Map("en" -> 7L, "fr" -> 7L))
    // re-running yields the identical draw (pure function of ids)
    val again = Sampling.stratifiedCap(df, "doc_id", Seq("lang"), cap = 7)
    assert(out.exceptAll(again).count() === 0)
    // rank 1 is the minimal md5 within the stratum
    val en1 = out.filter($"lang" === "en" && $"sample_rank" === 1)
      .select("doc_id").as[Long].head()
    val minByHash = df.filter($"lang" === "en")
      .select($"doc_id", md5($"doc_id".cast("string")).as("h"))
      .orderBy("h").select("doc_id").as[Long].head()
    assert(en1 === minByHash)
  }

  test("corpusMix: per-(source, lang) mass; ppm shares bounded by the total") {
    val df = Seq((1L, "the and of to a in is that it for", "s0"),
                 (2L, "el los las y un una es por para como", "s0"),
                 (3L, "the and of to a in is that it for", "s1"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.corpusMix(df).orderBy("source", "lang_pred").collect()
    assert(out.map(r => (r.getString(0), r.getString(1), r.getLong(2),
                         r.getLong(3))).toSeq ===
      Seq(("s0", "en", 1L, 10L), ("s0", "es", 1L, 10L), ("s1", "en", 1L, 10L)))
    // each share is floor(n/3 * 1e6) = 333333
    assert(out.forall(_.getLong(4) == 333333L))
  }

  test("pqAssign: m codes per vector, codebook-exact and deterministic") {
    val dim = 8
    val df = Seq(
      (1L, Array.tabulate(dim)(i => 0.1f * i)),
      (2L, Array.tabulate(dim)(i => 0.1f * i)),   // identical -> same codes
      (3L, Array.tabulate(dim)(i => -0.3f * i))
    ).toDF("vec_id", "embedding")
    val out = Similarity.pqAssign(df, "vec_id", "embedding",
                                  dim = dim, m = 2, k = 4)
      .orderBy("vec_id", "sub").collect()
    assert(out.length === 6) // m rows per vector
    assert(out.forall(r => r.getInt(2) >= 0 && r.getInt(2) < 4))
    assert(out.forall(_.getLong(3) >= 0L))
    val codes = out.map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(codes.filter(_._1 == 1L).map(c => (c._2, c._3)).toSeq ===
      codes.filter(_._1 == 2L).map(c => (c._2, c._3)).toSeq)
    // codes are the true argmin over the driver-side codebook
    val q1 = Array.tabulate(dim)(i => math.floor(0.1f * i * 1000.0).toLong)
    for (s <- 0 until 2) {
      val dists = (0 until 4).map { kk =>
        (0 until 4).map { j =>
          val d = q1(s * 4 + j) - Similarity.pqCentroid(s, kk, j)
          d * d
        }.sum
      }
      val expect = dists.indexOf(dists.min)
      assert(codes.find(c => c._1 == 1L && c._2 == s).get._3 === expect)
    }
  }

  test("ivfPqTopK: ADC to an identical vector equals the query's own PQ residual") {
    val dim = 8
    val mk = (f: Int => Float) => Array.tabulate(dim)(f)
    val df = Seq(
      (0L, mk(i => 0.1f * i)),          // query
      (1L, mk(i => 0.1f * i)),          // identical twin -> same codes
      (2L, mk(i => -0.5f + 0.07f * i)),
      (3L, mk(i => 0.9f - 0.2f * i))
    ).toDF("vec_id", "embedding")
    val out = Similarity.ivfPqTopK(df.filter($"vec_id" === 0), df,
                                   "vec_id", "embedding",
                                   dim = dim, m = 2, k = 4, topK = 10)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(2)).length === 3)            // self excluded
    // the twin shares every code, so its ADC distance is exactly the sum of
    // the query's own per-sub argmin distances (pqAssign dist2)
    val selfResidual = Similarity
      .pqAssign(df.filter($"vec_id" === 0), "vec_id", "embedding",
                dim = dim, m = 2, k = 4)
      .agg(sum($"dist2")).as[Long].head()
    val twin = out.find(_.getLong(2) == 1L).get
    assert(twin.getLong(3) === selfResidual)
    assert(twin.getInt(1) === 1) // nothing can score below the shared code
    // every pair aggregates exactly m sub-distances: adc >= selfResidual
    assert(out.forall(_.getLong(3) >= selfResidual))
  }

  test("oovStats: corpus-derived vocab, OOV mass in ppm") {
    val df = docsDf(
      1L -> "a a a b b c",
      2L -> "a b x y")
    // vocabSize=2 -> vocab = {a, b} (tf 4 and 3)
    val out = TextAnalysis.oovStats(df, "doc_id", "text", vocabSize = 2)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((1L, 6L, 1L), (2L, 4L, 2L)))
    assert(out.map(_.getLong(3)).toSeq === Seq(166666L, 500000L))
  }
}
