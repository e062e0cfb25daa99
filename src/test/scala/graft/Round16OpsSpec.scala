package graft

import org.apache.spark.sql.functions._

import graft.operators.{Graph, Survival}

/** Round-11 operator contracts: 4-clique census, restricted mean survival
  * time, and integer Katz centrality — hand-computed fixtures, exact
  * integer expectations.
  */
class Round16OpsSpec extends SparkTestBase {

  import spark.implicits._

  test("fourCliqueStats: K5 has C(5,3)=10 triangles and C(5,4)=5 four-cliques") {
    val k5 = (for {
      a <- 1L to 5L; b <- (a + 1) to 5L
    } yield (a, b)).toDF("src", "dst")
    val r = Graph.fourCliqueStats(k5).collect().head
    assert(r.getAs[Long]("n_triangles") === 10L)
    assert(r.getAs[Long]("n_four_cliques") === 5L)
    assert(r.getAs[Long]("cliques_per_triangle_ppm") === 500000L)
  }

  test("fourCliqueStats: a triangle with a pendant edge has no 4-clique") {
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    val r = Graph.fourCliqueStats(g).collect().head
    assert(r.getAs[Long]("n_triangles") === 1L)
    assert(r.getAs[Long]("n_four_cliques") === 0L)
  }

  test("rmst: step-curve area with tail clamp, hand-computed") {
    // subjects: durations 2 and 4, both events. KM: s(2) = 1/2, s(4) = 0.
    // RMST@5 = 1.0*(2-0) + 0.5*(4-2) + 0*(5-4) = 3.0 days = 3e6 ppm·days.
    val d = Seq((2L, 0), (4L, 0)).toDF("dur", "censored")
    val r = Survival.rmst(d, "dur", "censored", tau = 5L).collect().head
    assert(r.getAs[Long]("tau") === 5L)
    assert(r.getAs[Long]("rmst_ppm") === 3000000L)
  }

  test("rmst: tau before the first event is pure head segment") {
    val d = Seq((10L, 0)).toDF("dur", "censored")
    val r = Survival.rmst(d, "dur", "censored", tau = 4L).collect().head
    assert(r.getAs[Long]("rmst_ppm") === 4000000L) // S=1 on [0,4)
  }

  test("rmst: all-censored cohort survives the whole horizon") {
    val d = Seq((3L, 1), (7L, 1)).toDF("dur", "censored")
    val r = Survival.rmst(d, "dur", "censored", tau = 6L).collect().head
    assert(r.getAs[Long]("rmst_ppm") === 6000000L) // empty ladder, S ≡ 1
  }

  test("minhashLshPairsAgainst: delta near-dups pair with the corpus, corpus never self-pairs") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"), // exact dup INSIDE corpus
      (3L, "entirely different words about databases and query engines"))
      .toDF("doc_id", "text")
    val delta = Seq(
      (10L, "the quick brown fox jumps over the lazy dog tonight extra"),
      (11L, "nothing in common with anything else whatsoever here now"))
      .toDF("doc_id", "text")
    val pairs = operators.Dedup
      .minhashLshPairsAgainst(corpus, delta, "doc_id", "text")
      .collect()
    // 10 matches BOTH corpus copies; 11 matches nothing; (1,2) never emitted
    val found = pairs.map(r => (r.getAs[Long]("new_id"),
                                r.getAs[Long]("old_id"))).toSet
    assert(found === Set((10L, 1L), (10L, 2L)))
    assert(pairs.forall(_.getAs[Long]("overlap") > 0))
  }

  test("rouge_l building block: max-plus doubling LCS matches a hand case") {
    // cand: a b c d e f ; ref: a b d f  -> LCS = 4 (a b d f)
    val cand = "a b c d e f".split(" ").zipWithIndex
      .map { case (w, i) => (1L, w, (i + 1).toLong) }
    val ref = "a b d f".split(" ").zipWithIndex
      .map { case (w, i) => (2L, w, (i + 1).toLong) }
    val seq = (cand ++ ref).toSeq.toDF("doc_id", "w", "i")
    val m = seq.filter(col("doc_id") === 1L)
      .select(col("w"), col("i").as("ic"))
      .join(seq.filter(col("doc_id") === 2L)
        .select(col("w"), col("i").as("ir")), Seq("w"))
      .select(col("ic"), col("ir")).localCheckpoint()
    var p = m.as("a").join(m.as("b"),
        col("a.ic") < col("b.ic") && col("a.ir") < col("b.ir"))
      .select(col("a.ic").as("i"), col("b.ic").as("j"))
      .withColumn("len", lit(1L)).localCheckpoint()
    for (_ <- 1 to 4) {
      val comp = p.select(col("i"), col("j").as("mid"), col("len").as("la"))
        .join(p.select(col("i").as("mid"), col("j"), col("len").as("lb")),
              Seq("mid"))
        .select(col("i"), col("j"), (col("la") + col("lb")).as("len"))
      p = p.union(comp).groupBy(col("i"), col("j"))
        .agg(max(col("len")).as("len")).localCheckpoint()
    }
    assert(p.agg(max(col("len"))).collect().head.getLong(0) + 1L === 4L)
  }

  test("katz: one round on the symmetric path a-b-c, alpha=100 permille") {
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val r = Graph.katz(e, iters = 1, alphaPermille = 100L)
      .collect().map(x => x.getAs[Long]("node") ->
        (x.getAs[Long]("katz_micro"), x.getAs[Long]("indeg"))).toMap
    // x1(end) = 1e6 + 100*1e6/1000 = 1.1e6; x1(middle) = 1e6 + 100*2e6/1000
    assert(r(1L) === ((1100000L, 1L)))
    assert(r(2L) === ((1200000L, 2L)))
    assert(r(3L) === ((1100000L, 1L)))
  }
}
