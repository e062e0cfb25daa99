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
