package graft

import org.apache.spark.sql.functions._

/** Merge-on-read deletion vectors: a delete publishes a key list, never
  * touches base data files; reads resolve base minus stacked DVs; compact
  * folds; vacuum keeps referenced bases alive.
  */
class DeletionVectorSpec extends SparkTestBase {

  private def dataFiles(dir: String): Map[String, (Long, Long)] = {
    val d = new java.io.File(dir)
    d.listFiles().filter(f => f.getName.endsWith(".parquet"))
      .map(f => f.getName -> ((f.length(), f.lastModified()))).toMap
  }

  test("publishDelete subtracts without rewriting base files; time travel intact") {
    val session = spark
    import session.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-dv").toString + "/t"
    val base = (1 to 100).map(i => (i.toLong, i % 7, s"row$i"))
      .toDF("id", "grp", "payload")
    val v1 = VersionedTable.publish(spark, base, root)
    val before = dataFiles(s"$root/v=$v1")

    val v2 = VersionedTable.deleteWhere(spark, root, col("grp") === 3, Seq("id"))
    val v3 = VersionedTable.publishDelete(
      spark, Seq(1L, 2L, 17L).toDF("id"), root)
    assert((v2, v3) === ((2L, 3L)))

    // base data files are byte-identical: merge-on-read wrote only key lists
    assert(dataFiles(s"$root/v=$v1") === before)

    val expected = base.filter(col("grp") =!= 3 && !col("id").isin(1L, 2L, 17L))
    val got = VersionedTable.read(spark, root)
    assert(got.count() === expected.count())
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)

    // time travel to the pre-delete version still sees every row
    assert(VersionedTable.readVersion(spark, root, v1).count() === 100)
    // mid-stack resolution: v2 applies only the first DV
    assert(VersionedTable.readVersion(spark, root, v2).count() ===
      base.filter(col("grp") =!= 3).count())
  }

  test("compact folds DVs; vacuum keeps the base a kept DV resolves through") {
    val session = spark
    import session.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-dv2").toString + "/t"
    val base = (1 to 50).map(i => (i.toLong, s"p$i")).toDF("id", "payload")
    VersionedTable.publish(spark, base, root)                      // v1 base
    VersionedTable.publishDelete(spark, Seq(5L, 6L).toDF("id"), root) // v2 DV
    VersionedTable.publishDelete(spark, Seq(7L).toDF("id"), root)     // v3 DV

    // vacuum keep=2 would naively keep {v2, v3} and drop base v1 — the
    // resolution closure must pin v1
    VersionedTable.vacuum(spark, root, keep = 2)
    assert(VersionedTable.read(spark, root).count() === 47)

    val v4 = VersionedTable.compact(spark, root)                   // full again
    assert(v4 === 4L)
    assert(VersionedTable.read(spark, root).count() === 47)
    // post-compact the snapshot stands alone: vacuum to just it and read
    VersionedTable.vacuum(spark, root, keep = 1)
    assert(VersionedTable.read(spark, root).count() === 47)
    intercept[IllegalArgumentException] {
      VersionedTable.readVersion(spark, root, 1L)
    }
  }

  test("guard rails: no delete on empty table; DV key schema fixed by first DV") {
    val session = spark
    import session.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-dv3").toString + "/t"
    intercept[IllegalStateException] {
      VersionedTable.publishDelete(spark, Seq(1L).toDF("id"), root)
    }
    VersionedTable.publish(spark, Seq((1L, "a")).toDF("id", "x"), root)
    VersionedTable.publishDelete(spark, Seq(9L).toDF("id"), root)
    intercept[IllegalArgumentException] {
      VersionedTable.publishDelete(spark, Seq("a").toDF("x"), root)
    }
  }
}
