package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Scd2

/** The reference's named regression fixtures: born-deleted records,
  * NULL-bearing composite keys, out-of-order backfill collapse
  * (SURVEY.md §5.4, FIXTURES.md §2-4).
  */
class Scd2EdgeCaseSpec extends SparkTestBase {

  private def bornDeleted(i: Int): DataFrame =
    seed(s"scd2_materialization/born_deleted_raw_$i.csv")
      .select(
        col("customer_id").cast("int"),
        col("customer_name"), col("email"), col("status"),
        tsCol("deleted_at"), tsCol("_created_at"), tsCol("_updated_at"))

  private val bdCfg = ScdConfig(
    uniqueKey = Seq("customer_id"),
    createdAtCol = Some("_created_at"),
    deletedAtCol = Some("deleted_at"))

  test("born-deleted record: 'D', valid_from = deleted_at, current") {
    // assert_born_deleted_record.sql:3-15 + the 2026-06-09 design doc
    val t1 = Scd2.initialLoad(bornDeleted(1), bdCfg).cache()
    assertInvariantsGreen(t1, bdCfg)

    val k100 = rowsFor(t1, 100)
    assert(k100.length === 1)
    assert(k100.head.getAs[String]("_change_type") === "D")
    assert(k100.head.getAs[java.sql.Timestamp]("_valid_from") === ts("2024-02-01 00:00:00"))
    assert(k100.head.getAs[Boolean]("_is_current"))

    // key 102: deleted then resurrected; first version starts at deleted_at,
    // resurrection at its own updated_at
    val k102 = rowsFor(t1, 102)
    assert(k102.map(_.getAs[String]("_change_type")).toSeq === Seq("D", "I"))
    assert(k102.head.getAs[java.sql.Timestamp]("_valid_from") === ts("2024-02-10 00:00:00"))
    assert(k102.last.getAs[java.sql.Timestamp]("_valid_from") === ts("2024-04-10 00:00:00"))
  }

  test("born-deleted incremental: re-sent identical rows collapse, new key lands") {
    val t1 = Scd2.initialLoad(bornDeleted(1), bdCfg)
    val t2 = Scd2.incremental(t1, bornDeleted(2), bdCfg).cache()
    assertInvariantsGreen(t2, bdCfg)
    assert(rowsFor(t2, 100).length === 1) // unchanged re-send collapsed
    assert(rowsFor(t2, 102).length === 2)
    val k101 = rowsFor(t2, 101) // new born-deleted key via incremental path
    assert(k101.length === 1)
    assert(k101.head.getAs[String]("_change_type") === "D")
    assert(k101.head.getAs[java.sql.Timestamp]("_valid_from") === ts("2024-05-01 00:00:00"))
    assert(k101.head.getAs[Boolean]("_is_current"))
  }

  private def nullKey(i: Int): DataFrame =
    seed(s"scd2_materialization/null_key_raw_$i.csv")
      .select(
        col("customer_id").cast("int"),
        col("region"), col("status"), tsCol("_updated_at"))

  private val nkCfg = ScdConfig(uniqueKey = Seq("customer_id", "region"))

  test("NULL-bearing composite key matches itself null-safely") {
    // null_key_scd2.sql:8-25: without the md5-hash key match, (1, NULL)'s
    // prior version is never pulled and its current row never expired.
    val t1 = Scd2.initialLoad(nullKey(1), nkCfg)
    val t2 = Scd2.incremental(t1, nullKey(2), nkCfg).cache()
    assertInvariantsGreen(t2, nkCfg)

    val k1 = t2.filter(col("customer_id") === 1 && col("region").isNull)
      .orderBy("_valid_from").collect()
    assert(k1.length === 2, "NULL-key history must gain the new version")
    assert(k1.map(_.getAs[Boolean]("_is_current")).toSeq === Seq(false, true))
    assert(k1.last.getAs[String]("status") === "suspended")

    // unchanged key (2, US) re-sent identically: still exactly one row
    assert(t2.filter(col("customer_id") === 2).count() === 1)
  }

  private def ooo(i: Int): DataFrame =
    seed(s"scd2_materialization/ooo_backfill_raw_$i.csv")
      .select(
        col("customer_id").cast("int"),
        col("customer_name"), col("email"), col("status"),
        tsCol("deleted_at"), tsCol("_created_at"), tsCol("_updated_at"))

  // the reference's ooo model excludes _created_at from change detection
  // (`ooo_backfill_scd2.sql:5-9`) — the backfilled row differs ONLY there
  private val oooCfg = bdCfg.copy(changeExclude = Seq("_created_at"))

  test("out-of-order backfill with identical content collapses to one version") {
    // ooo_backfill_scd2.sql:14-23: identical content, EARLIER updated_at,
    // arriving later. The run collapses to its earliest row; the persisted
    // 01-10 version is deleted as redundant. Exactly one current row remains.
    val t1 = Scd2.initialLoad(ooo(1), oooCfg)
    val t2 = Scd2.incremental(t1, ooo(2), oooCfg).cache()
    assertInvariantsGreen(t2, oooCfg)

    val k99 = rowsFor(t2, 99)
    assert(k99.length === 1)
    assert(k99.head.getAs[Boolean]("_is_current"))
    assert(k99.head.getAs[java.sql.Timestamp]("_updated_at") === ts("2024-01-05 10:00:00"))
  }

  test("non-collapse mode retains already-persisted versions") {
    val cfg = oooCfg.copy(collapseRedundantVersions = false)
    val t1 = Scd2.initialLoad(ooo(1), cfg)
    val t2 = Scd2.incremental(t1, ooo(2), cfg).cache()
    // both versions survive (the backfilled run opener + the persisted row),
    // re-expired into a consistent timeline
    val k99 = rowsFor(t2, 99)
    assert(k99.length === 2)
    assert(k99.count(_.getAs[Boolean]("_is_current")) === 1)
    assertInvariantsGreen(t2, cfg)
  }
}
