package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Round-15 optimization contracts: every iterative Graph operator that
  * gained a small-graph DRIVER path (gate: edge count ≤ `gateEdges`,
  * endpoint types long where the op does not cast itself) must produce
  * BIT-IDENTICAL rows to its distributed fold — same node universe, same
  * edge multiplicity, same truncating integer arithmetic, same
  * fixed-round semantics. Each test runs the op twice on the same input:
  * once with the gate forced OPEN (huge threshold → driver path) and once
  * forced SHUT (gateEdges = 0 → distributed fold), and compares the full
  * sorted row sets.
  */
class GraphLocalGateSpec extends SparkTestBase {

  // A messy deterministic directed multigraph: hubs, cycles, dangling
  // nodes, parallel arcs (i, 2i) twice, self-referential shapes — enough
  // structure that a mirror that drops multiplicity, shrinks the node
  // universe, or breaks a tie differently WILL diverge.
  private def edges: DataFrame = {
    import spark.implicits._
    val base = (0L until 40L).flatMap { i =>
      Seq((i, (i * 7 + 3) % 40), (i, (i * 13 + 1) % 23),
          (i % 23, (i * 5) % 40)) ++
        (if (i % 4 == 0L) Seq((i, (i * 2) % 40), (i, (i * 2) % 40))
         else Seq.empty)
    }
    base.toDF("src", "dst")
  }

  private def sym: DataFrame = {
    val e = edges
    e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toVector).toSeq
      .sortBy(_.mkString("|"))

  private def assertGateIdentity(f: Long => DataFrame): Unit = {
    val local = rows(f(1000000L))
    val dist = rows(f(0L))
    assert(local.nonEmpty)
    assert(local === dist)
  }

  test("katz: driver mirror == distributed fold") {
    assertGateIdentity(g => Graph.katz(edges, iters = 4, gateEdges = g))
  }

  test("pagerank: driver mirror == distributed fold") {
    assertGateIdentity(g => Graph.pagerank(sym, iters = 3, gateEdges = g))
  }

  test("personalizedPagerank: driver mirror == distributed fold") {
    import spark.implicits._
    val seeds = Seq(0L, 3L, 17L, 999L).toDF("node") // 999 not in the graph
    assertGateIdentity(g =>
      Graph.personalizedPagerank(sym, seeds, iters = 3, gateEdges = g))
  }

  test("labelPropagation: driver mirror == distributed fold") {
    assertGateIdentity(g =>
      Graph.labelPropagation(sym, iters = 3, gateEdges = g))
  }

  test("connectedComponentsStar: driver union-find == star contraction") {
    assertGateIdentity(g =>
      Graph.connectedComponentsStar(edges, gateEdges = g))
  }

  test("bfsHops: driver BFS == level-synchronous fold") {
    import spark.implicits._
    val seeds = Seq(0L, 25L).toDF("node")
    assertGateIdentity(g => Graph.bfsHops(edges, seeds, maxHops = 3,
                                          gateEdges = g))
  }

  test("ssspRelax: driver Bellman-Ford == synchronous relaxation") {
    import spark.implicits._
    val weighted = edges.withColumn(
      "cost", pmod(col("src") * 7 + col("dst") * 3, lit(11)) + lit(1))
    val seed = Seq(0L).toDF("node")
    assertGateIdentity(g => Graph.ssspRelax(weighted, seed, rounds = 4,
                                            gateEdges = g))
  }

  test("longestPathLevels: driver relaxation == distributed sweeps") {
    // monotone src<dst orientation = acyclic by construction
    val dag = edges.filter(col("src") < col("dst"))
    assertGateIdentity(g => Graph.longestPathLevels(dag, sweeps = 8,
                                                    gateEdges = g))
  }

  test("kcore: driver peel == incremental distributed peel") {
    assertGateIdentity(g => Graph.kcore(edges, k = 3, sweeps = 6,
                                        gateEdges = g))
    // partial peel (budget smaller than the peel depth) must also match
    assertGateIdentity(g => Graph.kcore(edges, k = 4, sweeps = 2,
                                        gateEdges = g))
  }

  test("hits: driver mirror == distributed double-sweeps") {
    assertGateIdentity(g => Graph.hits(edges, iters = 2, gateEdges = g))
  }

  test("multiSourceHops: driver per-root BFS == synchronized sweep") {
    import spark.implicits._
    val seeds = Seq(0L, 7L, 11L).toDF("node")
    assertGateIdentity(g => Graph.multiSourceHops(edges, seeds, maxHops = 3,
                                                  gateEdges = g))
  }

  test("sccMutualReach: driver doubling == distributed doubling") {
    assertGateIdentity(g => Graph.sccMutualReach(edges, doublingRounds = 4,
                                                 gateEdges = g))
  }

  test("minimaxClosure: driver semiring doubling == distributed") {
    val ranked = sym.withColumn(
      "r", pmod(col("src") * 11 + col("dst") * 5, lit(17)) + lit(1))
    assertGateIdentity(g => Graph.minimaxClosure(ranked, rounds = 3,
                                                 gateEdges = g))
  }

  test("triangleStats: broadcast adjacency-intersect == wedge join") {
    val und = edges.filter(col("src") < col("dst")).distinct()
    val viaIntersect = Graph.triangleStats(und)
    assert(viaIntersect.select("n_triangles").head().getLong(0) > 0L,
      "fixture must actually contain triangles")
    assert(rows(viaIntersect) ===
      rows(Graph.triangleStats(und, intersectEdgeCap = 0L)))
  }

  test("non-long endpoint types take the distributed path unchanged") {
    // INT edges through the gated ops that do NOT cast internally: the
    // local mirrors would widen the schema to long, so the gate must
    // refuse and the distributed fold keeps the int-typed output.
    val intEdges = edges.select(col("src").cast("int").as("src"),
                                col("dst").cast("int").as("dst"))
    val out = Graph.pagerank(intEdges, iters = 2)
    assert(out.schema("node").dataType ===
      org.apache.spark.sql.types.IntegerType)
  }
}
