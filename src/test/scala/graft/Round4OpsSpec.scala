package graft

import org.apache.spark.sql.functions._

import graft.operators.{IncrementalAgg, Rolling}

/** Round-4 sweep operators: incremental aggregate maintenance,
  * inter-arrival statistics.
  */
class Round4OpsSpec extends SparkTestBase {

  import spark.implicits._

  test("IncrementalAgg: merge of any batch grouping equals the full rollup") {
    val df = Seq(
      ("a", 1, 10L), ("a", 1, 20L), ("a", 2, -5L),
      ("b", 1, 7L), ("b", 1, 3L), ("b", 2, 100L), ("a", 2, 0L))
      .toDF("k1", "k2", "vm").withColumn("id", monotonically_increasing_id())
    val keys = Seq("k1", "k2")
    val full = IncrementalAgg.rollup(df, keys, col("vm"))

    // three uneven batches, merged two different ways
    val b = (0 until 3).map(i => df.filter(pmod(col("id"), lit(3)) === i))
    val r = b.map(IncrementalAgg.rollup(_, keys, col("vm")))
    val leftFold = IncrementalAgg.merge(IncrementalAgg.merge(r(0), r(1), keys), r(2), keys)
    val skewed = IncrementalAgg.merge(r(0), IncrementalAgg.merge(r(1), r(2), keys), keys)

    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toString).sorted.toSeq
    assert(rows(leftFold) === rows(full))
    assert(rows(skewed) === rows(full))

    // empty delta is the merge identity
    val empty = IncrementalAgg.rollup(df.limit(0), keys, col("vm"))
    assert(rows(IncrementalAgg.merge(full, empty, keys)) === rows(full))
  }

  test("interArrival: gaps per key, tiebreak on same-instant, group by arriving type") {
    val df = Seq(
      (1, "2024-01-01 00:00:00", 1L, "x"),
      (1, "2024-01-01 00:00:10", 2L, "y"),   // gap 10s, arrives as y
      (1, "2024-01-01 00:00:10", 3L, "x"),   // same instant: gap 0, after id 2
      (2, "2024-01-01 00:01:00", 4L, "x"),   // first event of key 2: no gap
      (2, "2024-01-01 00:01:30", 5L, "x"))   // gap 30s
      .toDF("k", "tss", "id", "typ")
      .withColumn("t", to_timestamp(col("tss")))
    val out = Rolling.interArrival(df, "k", "t", "id", "typ")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // x: gaps {0 (id3 after id2), 30s (id5 after id4)}
    assert(out("x") === ((2L, 30000000L, 30000000L, 15000000L)))
    // y: one 10s gap
    assert(out("y") === ((1L, 10000000L, 10000000L, 10000000L)))
  }
}
