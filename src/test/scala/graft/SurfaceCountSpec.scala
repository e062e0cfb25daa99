package graft

/** The round-6 postmortem lesson as a test: the correctness gate's query
  * COUNT must never silently shrink (a reader regression once dropped 117
  * events-backed queries and nobody noticed for a round). The floor is
  * the current surface; raise it when queries land, never lower it.
  * Also pins that every query has an oracle and every oracle a query —
  * a one-sided entry is a typo that would silently weaken the gate.
  */
class SurfaceCountSpec extends SparkTestBase {

  private val Floor = 838

  test(s"query surface has at least $Floor oracle-checked entries") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q.size >= Floor, s"queries shrank to ${q.size}")
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted.take(5)}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted.take(5)}")
  }
}
