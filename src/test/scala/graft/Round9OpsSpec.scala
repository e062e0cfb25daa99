package graft

import java.time.{DayOfWeek, LocalDate}

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.DateArith
import graft.operators.Profile

/** Round-9 operators: scale-safe cumulative sums, business-day interval
  * arithmetic.
  */
class Round9OpsSpec extends SparkTestBase {

  import spark.implicits._

  test("Profile.cumSumByValue == naive global-order running sum") {
    // Random distinct values across several micro-bin regimes, two
    // measures; the two-phase cell plan must be bit-identical to the
    // single-partition window it replaces.
    val rnd = new scala.util.Random(7)
    val rows = rnd.shuffle((0 until 500).toList)
      .map(v => (v.toLong * 3 + 1, rnd.nextInt(100).toLong,
                 rnd.nextInt(10).toLong))
    val df = rows.toDF("v", "m1", "m2")
    val naiveW = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = df
      .withColumn("cum_m1", sum(col("m1")).over(naiveW))
      .withColumn("cum_m2", sum(col("m2")).over(naiveW))
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSet
    for (bins <- Seq(1, 2, 16, 10000)) {
      val got = Profile.cumSumByValue(df, "v", Seq("m1", "m2"), bins)
        .select(col("v"), col("cum_m1"), col("cum_m2"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === naive, s"microBins=$bins")
    }
  }

  test("cumSumByValue: constant value column (degenerate single cell)") {
    val df = Seq((5L, 2L), (5L, 3L)).toDF("v", "m")
    // Distinct-value contract violated intentionally? No — both rows share
    // v, so collapse first as the contract requires.
    val byV = df.groupBy("v").agg(sum(col("m")).as("m"))
    val out = Profile.cumSumByValue(byV, "v", Seq("m"))
      .select("cum_m").as[Long].collect()
    assert(out.toSeq === Seq(5L))
  }

  test("DateArith.businessDaysBetween == day-iterating reference") {
    // Every (start, end) pair in a 30-day window spanning month and
    // weekend boundaries, plus reversed intervals (negative counts).
    def naive(a: LocalDate, b: LocalDate): Long =
      if (b.isBefore(a)) -naive(b, a)
      else Iterator.iterate(a)(_.plusDays(1)).takeWhile(_.isBefore(b))
        .count(d => d.getDayOfWeek != DayOfWeek.SATURDAY &&
                 d.getDayOfWeek != DayOfWeek.SUNDAY).toLong
    val base = LocalDate.of(1995, 12, 20)
    val dates = (0 until 30).map(base.plusDays(_))
    val pairs = for (a <- dates; b <- dates) yield (a.toString, b.toString)
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
              DateArith.businessDaysBetween(to_date(col("a")),
                                            to_date(col("b"))).as("bd"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    for ((a, b) <- pairs) {
      val want = naive(LocalDate.parse(a), LocalDate.parse(b))
      assert(got((a, b)) === want, s"[$a, $b)")
    }
  }

  test("businessDaysBetween: known anchors") {
    // Mon 1995-12-25 → Mon 1996-01-01 is exactly 5 business days;
    // same-day is 0; Sat→Mon crosses zero business days.
    val df = Seq(
      ("1995-12-25", "1996-01-01"),
      ("1995-12-25", "1995-12-25"),
      ("1995-12-23", "1995-12-25")
    ).toDF("a", "b")
      .select(DateArith.businessDaysBetween(to_date(col("a")),
                                            to_date(col("b"))).as("bd"))
      .as[Long].collect().toSeq
    assert(df === Seq(5L, 0L, 0L))
  }
}
