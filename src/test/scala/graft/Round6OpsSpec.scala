package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Round-6 operators: graph statistics (co-occurrence edges, degree-ordered
  * triangle counting).
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
}
