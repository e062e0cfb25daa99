package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.{NativeAsOf, PlanContract}

/** Native as-of join (custom LogicalPlan + strategy + BinaryExecNode)
  * against the naive theta-join + window-rank reference, including null
  * keys, ties, before-first misses, and the plan shape.
  */
class NativeAsOfSpec extends SparkTestBase {

  import spark.implicits._

  private def naive(l: DataFrame, r: DataFrame): Set[(Long, Option[Long])] = {
    val w = Window.partitionBy(col("lid")).orderBy(col("rts").desc)
    l.join(r, col("lk") <=> col("rk") && col("rts") <= col("lts"), "left")
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 || col("rts").isNull)
      .select(col("lid"), col("rv"))
      .collect().map(x => (x.getLong(0),
        if (x.isNullAt(1)) None else Some(x.getLong(1)))).toSet
  }

  private def native(l: DataFrame, r: DataFrame): Set[(Long, Option[Long])] =
    NativeAsOf.join(l, r, Seq("lk" -> "rk"), "lts", "rts")
      .select(col("lid"), col("rv"))
      .collect().map(x => (x.getLong(0),
        if (x.isNullAt(1)) None else Some(x.getLong(1)))).toSet

  test("matches the naive as-of on random keyed version streams") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val l = (1 to 300).map { i =>
        (i.toLong, if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(6).toLong),
         rnd.nextInt(50).toLong)
      }.toDF("lid", "lk", "lts")
      val r = (1 to 120).map { j =>
        (if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(6).toLong),
         rnd.nextInt(50).toLong, 1000L + j)
      }.toDF("rk", "rts", "rv")
        // dedup (rk, rts) so "the" latest version is well-defined
        .groupBy("rk", "rts").agg(max(col("rv")).as("rv"))
      assert(native(l, r) === naive(l, r), s"trial $trial")
    }
  }

  test("hand-computed: ties, before-first, null keys, O(1) state path") {
    val l = Seq((1L, Some(1L), 10L), (2L, Some(1L), 15L), (3L, Some(1L), 5L),
                (4L, Some(2L), 10L), (5L, None: Option[Long], 10L))
      .toDF("lid", "lk", "lts")
    val r = Seq((Some(1L), 10L, 100L), (Some(1L), 12L, 101L),
                (Some(3L), 1L, 300L), (None: Option[Long], 8L, 900L))
      .toDF("rk", "rts", "rv")
    // lid 1: ts 10 → version at 10 (tie inclusive). lid 2: ts 15 → 12.
    // lid 3: ts 5 → before first → null. lid 4: key 2 has no versions.
    // lid 5: null key matches the null-key version (the <=> convention).
    assert(native(l, r) === Set(
      (1L, Some(100L)), (2L, Some(101L)), (3L, None), (4L, None),
      (5L, Some(900L))))
  }

  test("plans AsOfJoinExec with the SMJ exchange layout, no Window") {
    val l = Seq((1L, Some(1L), 10L)).toDF("lid", "lk", "lts")
    val r = Seq((Some(1L), 5L, 7L)).toDF("rk", "rts", "rv")
    val df = NativeAsOf.join(l, r, Seq("lk" -> "rk"), "lts", "rts")
    val plan = PlanContract.planString(df)
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("rejects colliding column names") {
    val l = Seq((1L, 2L)).toDF("k", "ts")
    intercept[IllegalArgumentException] {
      NativeAsOf.join(l, l, Seq("k" -> "k"), "ts", "ts")
    }
  }

  test("composite keys: both must match; ordering is key-major") {
    val l = Seq((1L, "a", "x", 10L), (2L, "a", "y", 10L),
                (3L, "b", "x", 10L))
      .toDF("lid", "k1", "k2", "lts")
    val r = Seq(("a", "x", 5L, 100L), ("a", "y", 7L, 101L),
                ("b", "x", 11L, 102L))
      .toDF("rk1", "rk2", "rts", "rv")
    val got = NativeAsOf.join(l, r, Seq("k1" -> "rk1", "k2" -> "rk2"),
                              "lts", "rts")
      .select(col("lid"), col("rv"))
      .collect().map(x => (x.getLong(0),
        if (x.isNullAt(1)) None else Some(x.getLong(1)))).toSet
    // (b, x)'s only version starts at 11 > 10 → no match.
    assert(got === Set((1L, Some(100L)), (2L, Some(101L)), (3L, None)))
  }
}
