package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._


/** Re-creation of the reference's sequential incremental driver
  * (`integration_tests/test_scd2_sequence.sh:133-155`): full refresh on
  * iteration 1, then incremental runs with `customers_raw_2..6`, asserting
  * every generic invariant after each step plus the documented edge cases.
  */
class Scd2SequenceSpec extends SparkTestBase {

  /** Each iteration round-trips through the engine's parquet write+swap — the
    * production path (lineage is truncated at every table write, exactly as a
    * warehouse table would).
    */
  private def runSequence(upTo: Int, numBuckets: Option[Int] = None): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft-seq").toString
    val path = s"$dir/customers_scd2"
    var table: DataFrame = null
    for (i <- 1 to upTo)
      table = ScdEngine.run(spark, customersScd2Model(i), path, customersCfg,
                            numBuckets = numBuckets)
    table.drop(ScdEngine.BucketCol).cache()
  }

  test("iteration 1: initial load dedups, slots lifecycle, keeps invariants") {
    val t1 = runSequence(1)
    assertInvariantsGreen(t1, customersCfg)

    // 16 exact-duplicate rows for key 2 collapse to one version
    assert(rowsFor(t1, 2).length === 1)

    // key 9 full lifecycle in one batch: I -> U -> D -> I (resurrection)
    val k9 = rowsFor(t1, 9)
    assert(k9.map(_.getAs[String]("_change_type")).toSeq === Seq("I", "U", "D", "I"))
    assert(k9.last.getAs[Boolean]("_is_current"))
    // delete record valid_from = deleted_at
    val del = k9(2)
    assert(del.getAs[java.sql.Timestamp]("_valid_from") ===
      del.getAs[java.sql.Timestamp]("deleted_at"))
  }

  test("iterations 2-3: out-of-order delete re-slots; repeated deletes allowed") {
    val t3 = runSequence(3)
    assertInvariantsGreen(t3, customersCfg)

    // raw_3 delivered key 1's delete at 01-03, BETWEEN raw_2's 01-02 and
    // 01-04 versions: the 01-04 row must flip from U to I (resurrection).
    val k1 = rowsFor(t3, 1)
    assert(k1.map(_.getAs[String]("_change_type")).toSeq ===
      Seq("I", "U", "U", "D", "I"))

    // key 10: delete events in raw_2 and raw_3 -> I, D, D (consecutive
    // deletes are legal; D->U is not)
    val k10 = rowsFor(t3, 10)
    assert(k10.map(_.getAs[String]("_change_type")).toSeq === Seq("I", "D", "D"))
  }

  test("iterations 4-5: duplicate flood + retroactive updates re-slot history") {
    val t5 = runSequence(5)
    assertInvariantsGreen(t5, customersCfg)

    // key 1 after all five batches: raw_4's 29 duplicates -> one 01-04 09:00
    // version; raw_5's late 01-03 10:00:01 row lands right after the delete,
    // turning it into the resurrection insert.
    val k1 = rowsFor(t5, 1)
    assert(k1.map(_.getAs[String]("_change_type")).toSeq ===
      Seq("I", "U", "U", "D", "I", "U", "U"))
    assert(k1.count(_.getAs[Boolean]("_is_current")) === 1)
  }

  test("bucketed layout: sequence through partial-partition rewrites matches flat") {
    val flat = runSequence(6)
    val bucketed = runSequence(6, numBuckets = Some(8))
    assertInvariantsGreen(bucketed, customersCfg)
    assert(bucketed.exceptAll(flat).count() === 0)
    assert(flat.exceptAll(bucketed).count() === 0)
  }

  test("iteration 6: full backfill earlier than all history stays consistent") {
    val t6 = runSequence(6)
    assertInvariantsGreen(t6, customersCfg)
    // one current row per key, nothing lost
    val keys = t6.select("customer_id").distinct().count()
    val current = t6.filter(col("_is_current")).count()
    assert(keys === current)
  }
}
