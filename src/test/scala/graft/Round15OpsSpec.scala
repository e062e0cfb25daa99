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
    val prior = (1 to 60).map(i => s""""$i":1""").mkString(
      """{"queries":{""", ",", "}}")
    val cur = (1 to 60).map(i => i.toString -> 5.0)
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
