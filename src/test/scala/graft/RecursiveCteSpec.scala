package graft

import org.apache.spark.sql.functions._

import graft.plans.RecursiveCte

/** Anchor pinning for native recursive CTEs: the pinned anchor's upstream
  * plan must execute ONCE no matter how many loop iterations reference it,
  * and the helper must reject a loop whose recursive term still carries a
  * live file scan.
  */
class RecursiveCteSpec extends SparkTestBase {

  import spark.implicits._

  test("pinned anchor executes once across loop iterations") {
    // instrument the anchor with an accumulator-bumping UDF: if the loop
    // re-executed the anchor per iteration, the count would be a multiple
    // of the row count
    val acc = spark.sparkContext.longAccumulator("anchor_rows")
    val bump = udf { (x: Long) => acc.add(1L); x }
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val anchor = edges.withColumn("src", bump(col("src")))

    val out = RecursiveCte.run(spark,
      """WITH RECURSIVE reach(dst, hop) AS (
        |  SELECT dst, CAST(1 AS BIGINT) AS hop FROM pinned_edges
        |  WHERE src = 0
        |  UNION ALL
        |  SELECT e.dst, r.hop + 1 FROM reach r
        |  JOIN pinned_edges e ON e.src = r.dst
        |  WHERE r.hop < 10)
        |SELECT dst, CAST(min(hop) AS BIGINT) AS min_hops
        |FROM reach GROUP BY 1""".stripMargin,
      "pinned_edges" -> anchor)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(out === Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L, 5L -> 5L))
    // 5 anchor rows; the chain recursion runs 5+ iterations, each one
    // joining the anchor — an unpinned anchor would re-run the UDF every
    // iteration (≥ 25 bumps)
    assert(acc.value === 5L,
      s"anchor executed ${acc.value / 5.0} times, expected once")
  }

  test("assertPinned rejects a recursive term with a live file scan") {
    val dir = java.nio.file.Files.createTempDirectory("rcte").toString
    Seq((0L, 1L), (1L, 2L)).toDF("src", "dst").write.parquet(s"$dir/e")
    spark.read.parquet(s"$dir/e").createOrReplaceTempView("unpinned_edges")
    val df = spark.sql(
      """WITH RECURSIVE reach(dst, hop) AS (
        |  SELECT dst, CAST(1 AS BIGINT) AS hop FROM unpinned_edges
        |  WHERE src = 0
        |  UNION ALL
        |  SELECT e.dst, r.hop + 1 FROM reach r
        |  JOIN unpinned_edges e ON e.src = r.dst
        |  WHERE r.hop < 3)
        |SELECT dst FROM reach""".stripMargin)
    intercept[IllegalArgumentException](RecursiveCte.assertPinned(df))
  }
}
