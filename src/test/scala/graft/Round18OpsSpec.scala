package graft

/** Round-13 harness/operator contracts. Starts with the drift-aware
  * `moved` detector (round-12 verdict task 2): the comparison base and the
  * current run can sit on different-quality boxes (r12 measured a uniform
  * +5.5% on untouched code), and with an absolute 1.3x/0.5 s gate that
  * uniform delta manufactures mover candidates — r12's three flags all
  * adjudicated to environment. The detector now scales the prior base by
  * the shared-set median ratio, so only queries moving RELATIVE TO THEIR
  * COHORT get flagged.
  */
class Round18OpsSpec extends SparkTestBase {

  private def base(n: Int, f: Int => Double): String =
    (1 to n).map(i => "\"" + i + "\":" + f(i)).mkString(
      """{"queries":{""", ",", "}}")

  test("movedList: a uniformly-1.5x-slower current run flags nothing") {
    val n = 30
    val prior = base(n, i => 1.0 + (i % 5) * 0.5) // 1.0..3.0 s spread
    val prev = (1 to n).map(i => 1.0 + (i % 5) * 0.5)
    val current = (1 to n).map(i => i.toString -> prev(i - 1) * 1.5)
    // every query is >1.3x and (for the >=1.67s ones) >0.5s absolute —
    // the pre-drift detector would flag most of the suite
    assert(Bench.movedList(prior, current) === "[]",
      "uniform box drift must not manufacture movers")
  }

  test("movedList: a single genuine 3x mover still flags through 1.2x drift") {
    val n = 30
    val prior = base(n, _ => 2.0)
    val current = (1 to n).map { i =>
      i.toString -> (if (i == 7) 6.0 else 2.0 * 1.2)
    }
    // median ratio = 1.2 (the one outlier cannot drag the median), so the
    // drift-scaled base for q7 is 2.4 and 6.0 is 2.5x/+3.6s over it
    assert(Bench.movedList(prior, current) === """["7"]""")
  }

  test("movedList: under MinSharedForDrift shared keys the absolute gate holds") {
    // 5 shared keys (a dev subset): no cohort to estimate drift from, so
    // the old absolute behavior applies — uniform 2x on 1s queries flags.
    val prior = base(5, _ => 1.0)
    val current = (1 to 5).map(i => i.toString -> 2.0)
    assert(Bench.movedList(prior, current) === """["1","2","3","4","5"]""")
    assert(Bench.MinSharedForDrift > 5)
  }

  test("movedList: faster-box drift (median < 1) exposes a masked regression") {
    val n = 30
    val prior = base(n, _ => 2.0)
    // box got 2x FASTER for everyone except q3, which stayed flat: flat on
    // a 2x-faster box is a 2x relative regression even though the absolute
    // gate (2.0 -> 2.0) sees nothing.
    val current = (1 to n).map(i => i.toString -> (if (i == 3) 2.0 else 1.0))
    assert(Bench.movedList(prior, current) === """["3"]""")
  }
}
