package graft

import org.apache.spark.sql.functions._

import graft.operators.{Graph, Profile}

/** Round-11 operator tier: bench movement disclosure, manifest temp-file
  * vacuum, oracle hop-cap assertion, empty-input contracts.
  */
class Round15OpsSpec extends SparkTestBase {

  // ---------------------------------------------------------------
  // Bench.movedList — the r-over-r movement disclosure
  // ---------------------------------------------------------------

  test("movedList: flags >1.3x AND >0.5s growth against a raw one-line prior") {
    val prior =
      """{"metric":"total","value":10,"unit":"sec","queries":{"1":0.3,"424":2.6,"38":3.1,"698":10.5},"sf":"sf0.1"}"""
    // 424: 2.6 -> 4.8 is 1.85x and +2.2s -> moved; 38: 3.1 -> 3.6 is
    // 1.16x -> not moved; 1: 0.3 -> 0.9 is 3x but +0.6s... IS moved
    // (both thresholds crossed); 698: shrank -> not moved.
    val moved = Bench.movedList(
      prior,
      Seq("1" -> 0.9, "424" -> 4.8, "38" -> 3.6, "698" -> 9.0))
    assert(moved === """["1","424"]""")
  }

  test("movedList: sub-second jitter below 0.5s absolute is NOT movement") {
    val prior = """{"queries":{"7":0.1,"9":0.2}}"""
    // 0.1 -> 0.4 is 4x but only +0.3s: jitter, not a mover
    assert(Bench.movedList(prior, Seq("7" -> 0.4, "9" -> 0.25)) === "[]")
  }

  test("movedList: tolerates the driver's pretty-printed re-serialization and unknown keys") {
    val prior =
      "{\n  \"parsed\": {\n    \"queries\": {\n      \"224\": 7,\n      \"712\": 6.5\n    },\n    \"sf\": \"sf0.1\"\n  }\n}"
    assert(Bench.movedList(prior, Seq("224" -> 14.0, "999" -> 50.0)) ===
      """["224"]""")
    assert(Bench.movedList("not json at all", Seq("224" -> 14.0)) === "[]")
  }

  test("movedList: caps the disclosure at 40 ids") {
    // 41 of 100 queries move 5x while the cohort majority stays flat —
    // under the round-13 drift normalization (median ratio = 1.0 here) all
    // 41 are genuine relative movers, overflowing the 40-id disclosure cap.
    // (A FULLY uniform 5x run would instead normalize to [] by design: a
    // whole-suite shift is box drift, not 60 regressions — Round18OpsSpec.)
    val prior = (1 to 100).map(i => s""""$i":1""").mkString(
      """{"queries":{""", ",", "}}")
    val cur = (1 to 100).map(i => i.toString -> (if (i <= 41) 5.0 else 1.0))
    assert(Bench.movedList(prior, cur) === "\"n>40\"")
  }

  // ---------------------------------------------------------------
  // VersionedTable.vacuum — orphan manifest temp reclaim
  // ---------------------------------------------------------------

  test("vacuum deletes orphan ._MANIFEST_tmp_* files but never _MANIFEST") {
    val session = spark
    import session.implicits._
    val root = java.nio.file.Files.createTempDirectory("vt_tmp_vacuum")
      .toString
    VersionedTable.publish(spark, Seq((1L, "a")).toDF("k", "v"), root)
    VersionedTable.publish(spark, Seq((2L, "b")).toDF("k", "v"), root)
    // simulate a crash between temp-create and rename
    val orphan = new java.io.File(
      root, "._MANIFEST_tmp_deadbeef-0000-0000-0000-000000000000")
    assert(orphan.createNewFile())
    VersionedTable.vacuum(spark, root, keep = 2)
    assert(!orphan.exists(), "orphan manifest temp must be reclaimed")
    assert(new java.io.File(root, "_MANIFEST").exists(),
           "the real manifest must survive vacuum")
    // both committed versions kept, table still reads
    assert(VersionedTable.read(spark, root).count() === 1L)
  }

  // ---------------------------------------------------------------
  // Graph oracle hop-cap assertion
  // ---------------------------------------------------------------

  test("betweennessSampled: adequate oracleHopCap is a no-op; too-small cap fails LOUD") {
    val session = spark
    import session.implicits._
    // path graph 1-2-3-4-5: max pivot distance is 4
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val unchecked = Graph.betweennessSampled(edges, k = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val checked = Graph.betweennessSampled(edges, k = 100,
        oracleHopCap = Some(4))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(checked === unchecked)
    val e = intercept[Exception] {
      Graph.betweennessSampled(edges, k = 100, oracleHopCap = Some(3))
        .collect()
    }
    assert(e.getMessage != null &&
      e.getMessage.contains("oracle walk cap"),
      s"expected the hop-cap assertion message, got: ${e.getMessage}")
  }

  test("edgeBetweennessSampled: hop cap guard matches the node variant") {
    val session = spark
    import session.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val ok = Graph.edgeBetweennessSampled(edges, k = 100,
        oracleHopCap = Some(3)).count()
    assert(ok === 3L)
    intercept[Exception] {
      Graph.edgeBetweennessSampled(edges, k = 100, oracleHopCap = Some(2))
        .collect()
    }
  }

  // ---------------------------------------------------------------
  // Linkage: Jaro–Winkler verifier
  // ---------------------------------------------------------------

  test("withJaroWinklerPpm: classic vectors pin the exact integer fold") {
    val session = spark
    import session.implicits._
    val pairs = Seq(
      ("MARTHA", "MARHTA"), // m=6 t=1 jaro 944444, pl=3 -> 961110
      ("DWAYNE", "DUANE"),  // m=4 t=0 jaro 822222, pl=1 -> 839999
      ("CRATE", "TRACE"),   // m=3 t=0 jaro 733333, pl=0 -> 733333
      ("ABCD", "DCBA")      // window w=1: only B,C match, both transposed
    ).toDF("t1", "t2")
    val got = graft.operators.Linkage.withJaroWinklerPpm(pairs, "t1", "t2")
      .select("t1", "m", "transpositions", "jaro_ppm", "jw_ppm")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("MARTHA") === ((6L, 1L, 944444L, 961110L)))
    assert(got("DWAYNE") === ((4L, 0L, 822222L, 839999L)))
    assert(got("CRATE") === ((3L, 0L, 733333L, 733333L)))
    assert(got("ABCD")._1 === 2L) // m: only the in-window matches
  }

  test("withJaroWinklerPpm: >20-char input fails LOUD (packed-mask contract)") {
    val session = spark
    import session.implicits._
    val bad = Seq(("abcdefghijklmnopqrstu", "abc")).toDF("t1", "t2")
    val e = intercept[Exception] {
      graft.operators.Linkage.withJaroWinklerPpm(bad, "t1", "t2").collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("1..20"))
  }

  test("jaroWinklerPairs: blocked candidates, both-verifier disagreement surfaces") {
    val session = spark
    import session.implicits._
    val df = Seq(
      (1L, "largebolt"), (2L, "largeplate"), (3L, "hotbolt"),
      (4L, "hotrod"), (5L, "zzz")
    ).toDF("id", "name").withColumn("blk", substring(col("name"), 1, 1))
    val jw = graft.operators.Linkage
      .jaroWinklerPairs(df, "id", "name", Seq("blk"), minJwPpm = 0L)
      .withColumn("lev", levenshtein(col("text_a"), col("text_b")))
      .collect().map(r => (r.getAs[String]("text_a"),
        r.getAs[String]("text_b"), r.getAs[Long]("jw_ppm"),
        r.getAs[Int]("lev"))).toList
    // same block only: (largebolt, largeplate) and (hotbolt, hotrod);
    // zzz has no partner
    assert(jw.size === 2)
    val lg = jw.find(_._1 == "largebolt").get
    val hot = jw.find(_._1 == "hotbolt").get
    // jw-only acceptance: largebolt/largeplate jw 895555 >= 840000, lev 4 > 3
    // (integer DIV truncation: float JW is 0.8955_5recurring)
    assert(lg._3 === 895555L && lg._4 === 4)
    // lev-only acceptance: hotbolt/hotrod jw 822221 < 840000, lev 3 <= 3
    assert(hot._3 === 822221L && hot._4 === 3)
  }

  // ---------------------------------------------------------------
  // Profile empty-input contracts
  // ---------------------------------------------------------------

  test("fdStrength/encodingAdvisor/fdViolations reject empty spec lists with a named error") {
    val session = spark
    import session.implicits._
    val df = Seq((1L, "a")).toDF("k", "v")
    val e1 = intercept[IllegalArgumentException] {
      Profile.fdStrength(df, Seq.empty)
    }
    assert(e1.getMessage.contains("fdStrength"))
    val e2 = intercept[IllegalArgumentException] {
      Profile.encodingAdvisor(df, "k", "k", Seq.empty)
    }
    assert(e2.getMessage.contains("encodingAdvisor"))
    val e3 = intercept[IllegalArgumentException] {
      Profile.fdViolations(df, Seq.empty)
    }
    assert(e3.getMessage.contains("fdViolations"))
  }
}
