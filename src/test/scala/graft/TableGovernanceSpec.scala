package graft

import org.apache.spark.sql.functions._

/** Timestamp time travel (data-time stamps) and CHECK-constrained
  * publish on the versioned table.
  */
class TableGovernanceSpec extends SparkTestBase {

  import spark.implicits._

  test("readAsOf resolves the newest stamp <= asOf; stamps cannot regress") {
    val root = java.nio.file.Files.createTempDirectory("tg1").toString + "/t"
    VersionedTable.publishStamped(spark, Seq((1L, "a")).toDF("id", "x"),
                                  root, 100L)
    VersionedTable.publishStamped(spark, Seq((1L, "b")).toDF("id", "x"),
                                  root, 200L)
    VersionedTable.publishStamped(spark, Seq((1L, "c")).toDF("id", "x"),
                                  root, 200L) // equal stamp allowed
    def at(ts: Long) = VersionedTable.readAsOf(spark, root, ts)
      .select("x").as[String].head()
    assert(at(100L) === "a")
    assert(at(150L) === "a")
    assert(at(200L) === "c") // newest version wins among equal stamps
    assert(at(9999L) === "c")
    intercept[IllegalStateException] { VersionedTable.readAsOf(spark, root, 50L) }
    intercept[IllegalArgumentException] {
      VersionedTable.publishStamped(spark, Seq((1L, "d")).toDF("id", "x"),
                                    root, 150L)
    }
  }

  test("publishChecked rejects whole snapshots and reports per-check counts") {
    val root = java.nio.file.Files.createTempDirectory("tg2").toString + "/t"
    val checks = Seq("pos" -> (col("v") > 0L),
                     "named" -> col("x").isNotNull)
    val bad = Seq((1L, "a"), (-2L, "b"), (-3L, null))
      .toDF("v", "x")
    val res = VersionedTable.publishChecked(spark, bad, root, checks)
    assert(res === Left(Seq("pos" -> 2L, "named" -> 1L)))
    assert(VersionedTable.latestVersion(spark, root).isEmpty)

    val ok = Seq((1L, "a"), (2L, "b")).toDF("v", "x")
    assert(VersionedTable.publishChecked(spark, ok, root, checks)
      === Right(1L))
    assert(VersionedTable.read(spark, root).count() === 2L)
    // NULL check results count as violations, not passes
    val nully = Seq((1L, "a")).toDF("v", "x")
      .withColumn("v", lit(null).cast("long"))
    assert(VersionedTable.publishChecked(spark, nully, root, checks)
      === Left(Seq("pos" -> 1L)))
  }
}
