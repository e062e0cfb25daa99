package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Round-12 operators: unrestricted Damerau-Levenshtein native expression,
  * minimax-closure spanning forest.
  */
class Round12OpsSpec extends SparkTestBase {

  import spark.implicits._

  test("DamerauLevenshtein: bit-exact against oracle-engine values, " +
       "unrestricted semantics") {
    import org.apache.spark.unsafe.types.UTF8String
    def dl(a: String, b: String): Int =
      graft.functions.DamerauLevenshtein.dl(
        UTF8String.fromString(a), UTF8String.fromString(b))
    // values from the oracle engine's damerau_levenshtein
    assert(dl("martha", "marhta") === 1)
    // UNRESTRICTED: transpose then edit through the pair (OSA says 3)
    assert(dl("ca", "abc") === 2)
    assert(dl("abcdef", "abdcfe") === 2)
    assert(dl("kitten", "sitting") === 3)
    assert(dl("a cat", "an act") === 2)
    assert(dl("STANDARD BRUSHED", "STANDARD POLISHED") === 4)
    assert(dl("", "") === 0)
    assert(dl("x", "") === 1)
    assert(dl("same", "same") === 0)
    graft.functions.GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT damerau_levenshtein('ca', 'abc') AS d").as[Int].head()
    assert(viaSql === 2)
  }

  test("mstBottleneck: cycle property picks the light spanning tree, " +
       "forests stay forests") {
    // square 1-2-3-4 with heavy closing edges; expected MST = the 3
    // lightest edges; separate 2-node island keeps its only edge
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 3L),
                    (1L, 4L, 4L), (1L, 3L, 5L), (6L, 7L, 9L))
      .toDF("src", "dst", "w")
    val got = Graph.mstBottleneck(edges, doublingRounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got === Set((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 3L),
                       (6L, 7L, 9L)))
  }

  test("mstBottleneck: equal weights resolve by the (w, src, dst) " +
       "total order") {
    // triangle with all weights equal: the tiebreak keeps (1,2) and
    // (1,3), drops (2,3) — rank order is deterministic
    val edges = Seq((1L, 2L, 5L), (1L, 3L, 5L), (2L, 3L, 5L))
      .toDF("src", "dst", "w")
    val got = Graph.mstBottleneck(edges, doublingRounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L), (1L, 3L)))
  }

  test("minimaxClosure: bottleneck rank over all paths") {
    // path 1-2-3 with ranks 1,2 plus direct 1-3 rank 3: minimax(1,3)=2
    val sym0 = Seq((1L, 2L, 1L), (2L, 3L, 2L), (1L, 3L, 3L))
      .toDF("src", "dst", "r")
    val sym = sym0.union(
      sym0.select(col("dst").as("src"), col("src").as("dst"), col("r")))
    val mm = Graph.minimaxClosure(sym, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(mm((1L, 3L)) === 2L)
    assert(mm((1L, 2L)) === 1L)
    assert(mm((2L, 3L)) === 2L)
  }
}
