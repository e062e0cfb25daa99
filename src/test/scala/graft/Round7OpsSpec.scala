package graft

import org.apache.spark.sql.functions._

import graft.operators.{Graph, TextAnalysis}

/** Round-7 operators: deterministic label-propagation communities and
  * positional proximity search.
  */
class Round7OpsSpec extends SparkTestBase {

  import spark.implicits._

  private def sym(edges: Seq[(Long, Long)]) =
    (edges ++ edges.map(_.swap)).toDF("src", "dst")

  test("Graph.labelPropagation: two triangles joined by a bridge split") {
    // 1-2-3 triangle, 4-5-6 triangle, bridge 3-4: one connected
    // component, but LPA's neighbor-mode keeps each triangle on its own
    // minimum label (the bridge is outvoted by the two triangle edges).
    val edges = sym(Seq((1L, 2L), (1L, 3L), (2L, 3L),
                        (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)))
    val labs = Graph.labelPropagation(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labs(1L) === labs(2L) && labs(2L) === labs(3L))
    assert(labs(4L) === labs(5L) && labs(5L) === labs(6L))
    assert(labs(1L) !== labs(4L))
  }

  test("Graph.labelPropagation: deterministic min-label tie-break") {
    // A single edge 7-9: each node's only neighbor label is the other's,
    // so labels swap each round — after any fixed iteration count both
    // runs agree (determinism), and a triangle {1,2,3} settles on 1.
    val tri = sym(Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    val a = Graph.labelPropagation(tri, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Graph.labelPropagation(tri, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
    assert(a.values.toSet === Set(1L))
  }

  test("TopKStream.misraGries: hand-computed two-batch state") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("mg_spec").toString
    val source = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long]
    val q = graft.streaming.TopKStream.misraGriesSink(
      source.toDF().toDF("k"), s"$base/store", "k",
      buckets = 1, m = 2, checkpoint = s"$base/ckpt")
    try {
      // batch 1: {1:3, 2:2, 3:1} -> d = 3rd largest = 1 -> {1:2, 2:1}, e=1
      source.addData(1L, 1L, 1L, 2L, 2L, 3L); q.processAllAvailable()
      // batch 2: +{3:3} -> {1:2, 2:1, 3:3} -> d=1 -> {3:2, 1:1}, e=2, n=9
      source.addData(3L, 3L, 3L); q.processAllAvailable()
    } finally q.stop()
    val rows = graft.streaming.TopKStream.readSummary(spark, s"$base/store")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("est"),
                           r.getAs[Long]("err"), r.getAs[Long]("n_b"))).toSet
    assert(rows === Set((3L, 2L, 2L, 9L), (1L, 1L, 2L, 9L)))
  }

  test("TopKStream.misraGries: replayed batch token is a no-op") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("mg_replay").toString
    val source = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long]
    def run() = graft.streaming.TopKStream.misraGriesSink(
      source.toDF().toDF("k"), s"$base/store", "k",
      buckets = 1, m = 2, checkpoint = s"$base/ckpt")
    val q1 = run()
    try { source.addData(1L, 1L, 2L); q1.processAllAvailable() }
    finally q1.stop()
    // restarting the SAME checkpoint replays nothing new: the summary is
    // unchanged (the additive merge would double-count without the guard)
    val before = graft.streaming.TopKStream.readSummary(spark, s"$base/store")
      .collect().map(_.toString).sorted.toSeq
    val q2 = run()
    try q2.processAllAvailable() finally q2.stop()
    val after = graft.streaming.TopKStream.readSummary(spark, s"$base/store")
      .collect().map(_.toString).sorted.toSeq
    assert(after === before)
  }

  test("Privacy.tCloseness: hand-computed TVD and breach flag") {
    // class A: {c1 x3, c2 x1}; class B: {c1 x1, c2 x3}; global 4/4 of 8.
    // TVD = (|3*8-4*4| + |1*8-4*4|) / (2*4*8) = 16/64 = 250000 ppm.
    val df = (Seq.fill(3)(("A", 1)) ++ Seq(("A", 2)) ++
              Seq(("B", 1)) ++ Seq.fill(3)(("B", 2))).toDF("g", "c")
    val out = graft.operators.Privacy
      .tCloseness(df, Seq("g"), col("c"), tPpm = 200000L)
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Long]("class_size"),
                           r.getAs[Long]("tvd_ppm"),
                           r.getAs[Boolean]("breach"))).toSet
    assert(out === Set(("A", 4L, 250000L, true), ("B", 4L, 250000L, true)))
  }

  test("Privacy.tCloseness: absent cells count full mass") {
    // class A holds only c1, class B only c2 — each class's distribution
    // is a point mass: TVD = 1/2 vs the 50/50 global = 500000 ppm.
    val df = Seq(("A", 1), ("A", 1), ("B", 2), ("B", 2)).toDF("g", "c")
    val out = graft.operators.Privacy
      .tCloseness(df, Seq("g"), col("c"), tPpm = 600000L)
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Long]("tvd_ppm"),
                           r.getAs[Boolean]("breach"))).toSet
    assert(out === Set(("A", 500000L, false), ("B", 500000L, false)))
  }

  test("Profile.weightedQuantiles: permille denominator selects the tail") {
    val df = (1 to 1000).map(i => ("g", i.toLong, 1L)).toDF("g", "v", "w")
    val out = graft.operators.Profile
      .weightedQuantiles(df, "g", "v", "w", Seq(500, 999), denom = 1000)
      .collect().map(r => r.getAs[Int]("q") -> r.getAs[Long]("q_value"))
      .toMap
    assert(out === Map(500 -> 500L, 999 -> 999L))
  }

  test("TextAnalysis.proximityHits: distance filter and tf counts") {
    val docs = Seq(
      (1L, "spark shuffle window"),         // dist 2 -> hit
      (2L, "spark a b c d e f window"),     // dist 7 -> miss
      (3L, "window spark window"),          // dist 1, tf_b = 2 -> hit
      (4L, "spark only here"),              // no window -> miss
      (5L, "no terms at all")
    ).toDF("doc_id", "text")
    val hits = TextAnalysis
      .proximityHits(docs, "doc_id", "text", "spark", "window", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                           r.getInt(3))).toSet
    assert(hits === Set((1L, 1L, 1L, 2), (3L, 1L, 2L, 1)))
  }
}
