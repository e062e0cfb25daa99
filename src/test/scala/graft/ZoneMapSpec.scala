package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Zone-map secondary index: pruned reads equal the plain filter, skip
  * files on clustered layouts, and stay correct on hostile (unclustered)
  * layouts where nothing can prune.
  */
class ZoneMapSpec extends SparkTestBase {

  import spark.implicits._

  private def mkRows = (1 to 1000).map(i => (i.toLong, i % 7, s"p$i"))

  test("clustered layout prunes files; result equals plain filter") {
    val dir = java.nio.file.Files.createTempDirectory("zm1").toString + "/t"
    mkRows.toDF("k", "g", "p").repartitionByRange(10, col("k"))
      .write.parquet(dir)
    val idx = Layout.zoneMapIndex(spark.read.parquet(dir), "k")
    val (pruned, scanned, total) =
      Layout.zoneMapRead(spark, idx, "k", lit(150L), lit(250L))
    assert(total === 10L)
    assert(scanned < total)
    val want = mkRows.filter(r => r._1 >= 150 && r._1 <= 250)
    assert(pruned.count() === want.size)
    assert(pruned.agg(sum(col("k"))).as[Long].head() ===
      want.map(_._1).sum)
  }

  test("unclustered layout cannot prune but stays correct") {
    val dir = java.nio.file.Files.createTempDirectory("zm2").toString + "/t"
    // hash layout: every file spans ~the full key range
    mkRows.toDF("k", "g", "p").repartition(6, col("g"))
      .write.parquet(dir)
    val idx = Layout.zoneMapIndex(spark.read.parquet(dir), "k")
    val (pruned, scanned, total) =
      Layout.zoneMapRead(spark, idx, "k", lit(150L), lit(250L))
    assert(scanned === total)
    assert(pruned.count() === 101L)
  }
}
