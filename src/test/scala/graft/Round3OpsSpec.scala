package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Funnel, Intervals, Linkage, Privacy, Profile, Scd2, Similarity, SkewJoin, TextAnalysis}

/** Round-3 sweep operators: interval joins, salted joins, k-anonymity,
  * snapshot CDC, winnowing, bigram LM.
  */
class Round3OpsSpec extends SparkTestBase {

  import spark.implicits._

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toString).sorted.toSeq

  test("overlapJoin: intersection bounds, empty and disjoint intervals drop") {
    val left = Seq(
      (1, "s1", ts("2025-01-01 00:00:00"), ts("2025-01-01 02:00:00")),
      (1, "s2", ts("2025-01-01 05:00:00"), ts("2025-01-01 05:00:00")), // empty
      (2, "s3", ts("2025-01-01 00:00:00"), ts("2025-01-01 01:00:00"))
    ).toDF("k", "lname", "ls", "le")
    val right = Seq(
      (1, "d1", ts("2025-01-01 01:00:00"), ts("2025-01-01 03:00:00")),
      (1, "d2", ts("2025-01-01 02:00:00"), ts("2025-01-01 04:00:00")), // abuts s1
      (2, "d3", ts("2025-01-01 01:00:00"), ts("2025-01-01 02:00:00"))  // abuts s3
    ).toDF("k", "rname", "rs", "re")
    val out = Intervals.overlapJoin(left, right, Seq("k"), "ls", "le", "rs", "re")
      .select("k", "lname", "rname", "overlap_from", "overlap_to").collect()
    assert(out.length === 1)
    assert(out.head.getString(1) === "s1" && out.head.getString(2) === "d1")
    assert(out.head.getTimestamp(3) === ts("2025-01-01 01:00:00"))
    assert(out.head.getTimestamp(4) === ts("2025-01-01 02:00:00"))
    // the bucketed strategy agrees, including on the empty s2 interval
    // (whose chunk list must be empty, not a descending sequence)
    val bk = Intervals.overlapJoinBucketed(left, right, Seq("k"),
      "ls", "le", "rs", "re", chunkMicros = 1800000000L)
      .select("k", "lname", "rname", "overlap_from", "overlap_to").collect()
    assert(bk.toSeq.map(_.toString) === out.toSeq.map(_.toString))
  }

  test("overlapJoinBucketed is result-identical to overlapJoin across chunk widths") {
    // Pseudo-random but deterministic interval soup with shared keys,
    // boundary-aligned starts/ends, and multi-chunk spans.
    val mk = (n: Int, salt: Int) =>
      spark.range(n).select(
        (col("id") % 7).as("k"),
        concat(lit(s"r$salt-"), col("id")).as(s"name$salt"),
        timestamp_micros(col("id") * 1700000L % 86400000000L + salt * 3600000000L).as(s"s$salt"),
        timestamp_micros(col("id") * 1700000L % 86400000000L + salt * 3600000000L
          + (col("id") % 5 + 1) * 2100000000L).as(s"e$salt"))
    val l = mk(80, 1)
    val r = mk(90, 2)
    val base = Intervals.overlapJoin(l, r, Seq("k"), "s1", "e1", "s2", "e2")
    assert(base.count() > 50) // the probe is non-trivial
    for (chunk <- Seq(1000000L, 3600000000L, 86400000000L)) {
      val bucketed = Intervals.overlapJoinBucketed(
        l, r, Seq("k"), "s1", "e1", "s2", "e2", chunkMicros = chunk)
      assert(sortedRows(bucketed.select(base.columns.map(col): _*)) ===
        sortedRows(base), s"chunk=$chunk")
    }
  }

  test("salted join equals the plain join and replicates only the small side") {
    val large = spark.range(1000).select(
      col("id").as("event_id"), (col("id") % 13).as("k"),
      (col("id") * 7 % 101).as("v"))
    val small = Seq.tabulate(13)(i => (i.toLong, s"dim$i")).toDF("k", "label")
    val salted = SkewJoin.salted(large, small, Seq("k"),
                                 pmod(hash(col("event_id")), lit(8)), 8)
    val plain = large.join(small, Seq("k"))
    assert(sortedRows(salted.select(plain.columns.map(col): _*)) ===
      sortedRows(plain))
  }

  test("kAnonymize: class sizes, suppression nulls quasi values only") {
    val df = Seq(
      (1, 10, "A"), (2, 10, "A"), (3, 10, "A"),
      (4, 20, "B"), (5, 20, "B"),
      (6, 30, "C")
    ).toDF("id", "age", "seg")
    val out = Privacy.kAnonymize(df, Seq(
      "age_band" -> (col("age") / 10).cast("int"),
      "seg" -> col("seg")), k = 3)
    val rows = out.select("id", "age_band", "seg", "class_size", "suppressed")
      .collect().map(r => r.getInt(0) ->
        (r.get(1), r.get(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(rows(1) === ((1, "A", 3L, false)))
    assert(rows(4) === ((null, null, 2L, true)))
    assert(rows(6) === ((null, null, 1L, true)))
    // ids (non-quasi payload) survive suppression
    assert(rows.keySet === Set(1, 2, 3, 4, 5, 6))
  }

  test("piiStats counts and scrubPii redacts email/phone/ipv4") {
    val df = Seq(
      (1, "reach me at jo.doe+spam@mail-host.co or +4915123456789 from 192.168.0.1"),
      (2, "no pii here, just 42 and v1.2 notes"),
      (3, "two mails: a@b.io c@d.org")
    ).toDF("id", "text")
    val stats = Privacy.piiStats(df, "text")
      .select("id", "n_emails", "n_phones", "n_ipv4", "has_pii")
      .collect().map(r => r.getInt(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getBoolean(4))).toMap
    assert(stats(1) === ((1, 1, 1, true)))
    assert(stats(2) === ((0, 0, 0, false)))
    assert(stats(3) === ((2, 0, 0, true)))
    val scrubbed = Privacy.scrubPii(df, "text")
      .select("id", "text_scrubbed")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(scrubbed(1) ===
      "reach me at <EMAIL> or <PHONE> from <IP>")
    assert(scrubbed(2) === "no pii here, just 42 and v1.2 notes")
    assert(scrubbed(3) === "two mails: <EMAIL> <EMAIL>")
  }

  test("scrubPii redacts the email before its inner digits can match phone") {
    // `+1234567` inside the local part would match PhonePattern on raw text;
    // email-first ordering must consume it as part of the address.
    val df = Seq((1, "ping user+1234567@corp.example please")).toDF("id", "text")
    val out = Privacy.scrubPii(df, "text").select("text_scrubbed")
      .collect().head.getString(0)
    assert(out === "ping <EMAIL> please")
  }

  test("source freshness: pass/warn/error per group, strict thresholds") {
    import graft.sources.IncrementalSource
    val asOf = ts("2025-01-01 01:00:00")
    val df = Seq(
      ("a", ts("2025-01-01 00:50:00")),              // age 600  -> pass (not >)
      ("b", ts("2025-01-01 00:30:00")),              // age 1800 -> warn
      ("c", ts("2025-01-01 00:00:00")),              // age 3600 -> error
      ("d", null.asInstanceOf[Timestamp])            // never loaded -> error
    ).toDF("src", "loaded_at")
    val out = IncrementalSource.freshness(df, "loaded_at", asOf,
                                          warnAfterSec = 600L,
                                          errorAfterSec = 1800L,
                                          groupBy = Seq("src"))
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(out === Map("a" -> "pass", "b" -> "warn",
                       "c" -> "error", "d" -> "error"))
  }

  test("historyProfile: version-depth distribution with deleted-key counts") {
    val cfg = ScdConfig(uniqueKey = Seq("k"), updatedAtCol = "ts_",
                        deletedAtCol = Some("del"))
    val src = Seq(
      (1, "a", ts("2025-01-01 00:00:00"), null.asInstanceOf[Timestamp]),
      (1, "b", ts("2025-01-02 00:00:00"), null.asInstanceOf[Timestamp]),
      (1, "c", ts("2025-01-03 00:00:00"), ts("2025-01-03 00:00:00")),
      (2, "x", ts("2025-01-01 00:00:00"), null.asInstanceOf[Timestamp])
    ).toDF("k", "v", "ts_", "del")
    val hist = Scd2.initialLoad(src, cfg)
    val prof = Scd2.historyProfile(hist, cfg.copy(deletedAtCol = None))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(prof === Map(3L -> ((1L, 1L)), 1L -> ((1L, 0L))))
  }

  test("snapshotDelta classifies inserts/updates/deletes against except-diff") {
    val cfg = ScdConfig(uniqueKey = Seq("k"), updatedAtCol = "ts_")
    val b0 = Seq((1, "a", ts("2025-01-01 00:00:00")),
                 (1, "b", ts("2025-01-03 00:00:00")),
                 (2, "x", ts("2025-01-01 00:00:00"))).toDF("k", "v", "ts_")
    // batch: new current version for k=1 (update of the old current's
    // audit cols + an insert); k=2 gets a redundant version (collapsed
    // away -> no rows for k=2); k=3 born (insert)
    val b1 = Seq((1, "c", ts("2025-01-05 00:00:00")),
                 (2, "x", ts("2025-01-02 00:00:00")),
                 (3, "n", ts("2025-01-04 00:00:00"))).toDF("k", "v", "ts_")
    val old = Scd2.initialLoad(b0, cfg).localCheckpoint()
    val neu = Scd2.incremental(old, b1, cfg).localCheckpoint()
    val delta = Scd2.snapshotDelta(old, neu, cfg).cache()

    val kinds = delta.groupBy("change_kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // except-based ground truth on the version key
    val oldKeys = old.select("k", "ts_")
    val newKeys = neu.select("k", "ts_")
    assert(kinds.getOrElse("insert", 0L) === newKeys.except(oldKeys).count())
    assert(kinds.getOrElse("delete", 0L) === oldKeys.except(newKeys).count())
    val changedBoth = old.select("k", "v", "ts_", "_is_current", "_valid_to")
      .except(neu.select("k", "v", "ts_", "_is_current", "_valid_to"))
      .select("k", "ts_").intersect(newKeys)
    assert(kinds.getOrElse("update", 0L) === changedBoth.count())
    // the k=1 old current flipped: _is_current true -> false
    val upd = delta.filter($"change_kind" === "update" && $"k" === 1).collect()
    assert(upd.exists(r => r.getAs[Boolean]("old_is_current") &&
      !r.getAs[Boolean]("new_is_current")))
  }

  test("winnowing: shared >= n+w-1 token run yields a shared fingerprint") {
    val n = 3; val w = 4
    val docs = Seq(
      (1L, "aa bb cc dd ee ff gg hh ii jj"),
      (2L, "zz yy cc dd ee ff gg hh xx ww"), // shares the 6-token run cc..hh
      (3L, "one two three")                  // short doc -> single fingerprint
    ).toDF("doc_id", "text")
    val fps = docs.select(col("doc_id"),
      explode(TextAnalysis.winnowFingerprints(col("text"), n, w)).as("fp"))
    val byDoc = fps.collect().groupBy(_.getLong(0))
      .map { case (d, rs) => d -> rs.map(_.getString(1)).toSet }
    assert(byDoc(1L).intersect(byDoc(2L)).nonEmpty)
    assert(byDoc(3L).size === 1)
    // every fingerprint is one of the doc's shingle hashes
    val shingleHashes = docs.select(col("doc_id"),
      explode(transform(TextAnalysis.orderedShingles(
        TextAnalysis.tokens(col("text")), n), s => md5(s))).as("h"))
      .collect().groupBy(_.getLong(0))
      .map { case (d, rs) => d -> rs.map(_.getString(1)).toSet }
    byDoc.foreach { case (d, set) => assert(set.subsetOf(shingleHashes(d))) }
  }

  test("bigramLm: MLE conditional counts on a tiny corpus") {
    val docs = Seq((1L, "a b a b c"), (2L, "a b"), (3L, ""), (4L, "solo"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramLm(docs, "doc_id", "text", k = 10)
      .collect().map(r => r.getAs[String]("bigram") ->
        (r.getAs[Long]("tf"), r.getAs[Long]("first_tf"), r.getAs[Long]("cond_ppm")))
      .toMap
    // bigrams: doc1 = a b, b a, a b, b c; doc2 = a b
    assert(out("a b") === ((3L, 3L, 1000000L)))  // P(b|a) = 1
    assert(out("b a") === ((1L, 2L, 500000L)))   // b continues to a half the time
    assert(out("b c") === ((1L, 2L, 500000L)))
    assert(out.size === 3) // blank + 1-token docs contribute nothing
  }

  test("equiDepthBins: equal-mass cut at micro resolution, total preserved") {
    // 100 rows uniform on [0, 100): micro-cells are exact, so deciles are 10
    // rows each starting at micro boundaries.
    val df = spark.range(100).select((col("id") + 0.5).as("v"))
    val out = Profile.equiDepthBins(df, "v", lo = 0.0, hi = 100.0,
                                    bins = 10, microBins = 100)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.size === 10)
    assert(out.values.map(_._1).sum === 100L)
    assert(out(0L) === ((10L, 0L, 9L)))
    assert(out(9L) === ((10L, 90L, 99L)))
    // skewed mass: 91 rows in one cell dominate; bins can't split a cell
    val skew = spark.range(100).select(
      when(col("id") < 91, lit(5.5)).otherwise(col("id") + 0.5).as("v"))
    val sk = Profile.equiDepthBins(skew, "v", 0.0, 100.0, 10, 100)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sk(0L) === 91L) // the hot cell lands whole in bin 0
    assert(sk.values.sum === 100L)
  }

  test("transitions: Markov counts with same-instant tiebreak") {
    val df = Seq(
      (1L, ts("2025-01-01 00:00:00"), 1L, "a"),
      (1L, ts("2025-01-01 00:00:01"), 2L, "b"),
      (1L, ts("2025-01-01 00:00:01"), 3L, "c"), // same instant: id orders b->c
      (2L, ts("2025-01-01 00:00:00"), 4L, "a")  // single event: no transition
    ).toDF("user_id", "ts_", "event_id", "event_type")
    val out = Funnel.transitions(df, "user_id", "ts_", "event_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out === Map(("a", "b") -> 1L, ("b", "c") -> 1L))
  }

  test("int8Quantize: extremes hit ±127, zero vector codes to zeros") {
    val df = Seq(
      (1L, Seq(2.0f, -2.0f, 1.0f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.int8Quantize(df, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(out((1L, 0)) === 127)
    assert(out((1L, 1)) === -127)
    assert(out((1L, 2)) === 63) // floor(1*127/2)
    assert(out((1L, 3)) === 0)
    assert((0 to 3).forall(i => out((2L, i)) === 0))
  }

  test("filterBlocklist drops exact-content matches modulo case/spacing") {
    val corpus = Seq((1L, "Hello  World"), (2L, "unique text"), (3L, "other"))
      .toDF("doc_id", "text")
    val block = Seq("hello world").toDF("t")
      .select(TextAnalysis.fingerprint(col("t")).as("fingerprint"))
    val kept = Dedup.filterBlocklist(corpus, "text", block)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L, 3L))
  }

  test("minMaxScale: ppm range ends, constant column guards to 0") {
    val df = Seq((1, 0.0, 7.0), (2, 50.0, 7.0), (3, 100.0, 7.0))
      .toDF("id", "a", "c")
    val out = Profile.minMaxScale(df, Seq("id"), Seq("a", "c"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1) === ((0L, 0L)))
    assert(out(2) === ((500000L, 0L)))
    assert(out(3) === ((1000000L, 0L))) // max lands exactly on 1e6
  }

  test("paths: ordered, truncated, counted across users") {
    val df = Seq(
      (1L, ts("2025-01-01 00:00:02"), 3L, "c"),
      (1L, ts("2025-01-01 00:00:00"), 1L, "a"), // out of collect order
      (1L, ts("2025-01-01 00:00:01"), 2L, "b"),
      (2L, ts("2025-01-01 00:00:00"), 4L, "a"),
      (2L, ts("2025-01-01 00:00:01"), 5L, "b"),
      (2L, ts("2025-01-01 00:00:02"), 6L, "c"),
      (3L, ts("2025-01-01 00:00:00"), 7L, "x"),
      (3L, ts("2025-01-01 00:00:01"), 8L, "y")
    ).toDF("user_id", "ts_", "event_id", "event_type")
    val out = Funnel.paths(df, "user_id", "ts_", "event_id", "event_type",
                           maxLen = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("a>b" -> 2L, "x>y" -> 1L)) // truncated at 2, ordered
  }

  test("asOf/expireVersions/forgetKeys: history lifecycle invariants") {
    val cfg = ScdConfig(uniqueKey = Seq("k"), updatedAtCol = "ts_")
    val snap = Scd2.initialLoad(Seq(
      (1, "a", ts("2025-01-01 00:00:00")),
      (1, "b", ts("2025-01-03 00:00:00")),
      (2, "x", ts("2025-01-02 00:00:00")),
      (3, "z", ts("2025-01-05 00:00:00"))
    ).toDF("k", "v", "ts_"), cfg).localCheckpoint()

    // at Jan 2 12:00: key 1 shows 'a', key 2 shows 'x', key 3 not yet born
    val at = Scd2.asOf(snap, ts("2025-01-02 12:00:00"), cfg)
      .select("k", "v", "_is_current").collect()
      .map(r => r.getInt(0) -> (r.getString(1), r.getBoolean(2))).toMap
    assert(at === Map(1 -> (("a", true)), 2 -> (("x", true))))

    // retention at Jan 4: key 1's 'a' window ([Jan1, Jan3)) expires; all
    // current rows survive regardless of age
    val trimmed = Scd2.expireVersions(snap, ts("2025-01-04 00:00:00"), cfg)
    assert(trimmed.count() === 3)
    assert(trimmed.filter($"k" === 1 && $"v" === "a").count() === 0)
    assert(trimmed.filter($"_is_current").count() ===
      snap.filter($"_is_current").count())

    // forgetting key 1 removes BOTH its versions, others untouched
    val forgotten = Scd2.forgetKeys(snap, Seq(1).toDF("k"), cfg)
    assert(forgotten.filter($"k" === 1).count() === 0)
    assert(forgotten.count() === 2)
  }

  test("fuzzyPairs: symmetric dedup, block confinement, distance bound") {
    val df = Seq((1, "red ring", "ring", 1), (2, "blue ring", "ring", 1),
                 (3, "red ring", "ring", 2),  // other block: no pair with 1
                 (4, "crimson ring", "ring", 1))
      .toDF("id", "name", "noun", "size")
    val out = Linkage.fuzzyPairs(df, "id", "name", Seq("noun", "size"), maxDist = 4)
      .select("id_a", "id_b", "dist").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    assert(out === Set((1, 2, 4))) // red~blue=4; crimson is 6+ away; block 2 isolated
  }
}
