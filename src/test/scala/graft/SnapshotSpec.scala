package graft

import org.apache.spark.sql.functions._

import graft.operators.Snapshot

/** dbt snapshot strategies: check-strategy change detection at run time,
  * hard-delete invalidation, and resurrection across three runs.
  */
class SnapshotSpec extends SparkTestBase {

  import spark.implicits._

  private val cfg = ScdConfig(
    uniqueKey = Seq("id"),
    updatedAtCol = "_snapshot_at",
    changeInclude = Some(Seq("status")),
    deletedAtCol = Some("deleted_at"))

  test("check strategy: change/unchanged/delete/born/resurrect across runs") {
    val run1 = Seq((1, "new"), (2, "new"), (3, "new")).toDF("id", "status")
    val run2 = Seq((1, "active"), (2, "new"), (4, "new")).toDF("id", "status")
    val run3 = Seq((1, "active"), (2, "new"), (3, "back"), (4, "new"))
      .toDF("id", "status")

    val t1 = Snapshot.run(None, run1, ts("2025-01-01 00:00:00"), cfg,
                          invalidateHardDeletes = true)
    val t2 = Snapshot.run(Some(t1), run2, ts("2025-01-02 00:00:00"), cfg,
                          invalidateHardDeletes = true)
    val t3 = Snapshot.run(Some(t2), run3, ts("2025-01-03 00:00:00"), cfg,
                          invalidateHardDeletes = true)

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "status", "_change_type", "_is_current")
        .collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getBoolean(3)))
        .toSet

    // run 2: id 1 changed (I+U), id 2 unchanged (single current I),
    // id 3 hard-deleted (I closed + current D), id 4 born
    assert(rows(t2) === Set(
      (1, "new", "I", false), (1, "active", "U", true),
      (2, "new", "I", true),
      (3, "new", "I", false), (3, "new", "D", true),
      (4, "new", "I", true)))

    // run 3: id 3 resurrects with new payload; everything else unchanged
    assert(rows(t3) === Set(
      (1, "new", "I", false), (1, "active", "U", true),
      (2, "new", "I", true),
      (3, "new", "I", false), (3, "new", "D", false), (3, "back", "I", true),
      (4, "new", "I", true)))

    // windows: id 3's delete window closed at the resurrection instant
    val d3 = t3.filter($"id" === 3 && $"_change_type" === "D")
      .select("_valid_from", "_valid_to").collect()(0)
    assert(d3.getTimestamp(0) === ts("2025-01-02 00:00:00"))
    assert(d3.getTimestamp(1) === ts("2025-01-03 00:00:00"))

    // re-running an identical snapshot is a no-op (idempotent refresh)
    val t4 = Snapshot.run(Some(t3), run3, ts("2025-01-04 00:00:00"), cfg,
                          invalidateHardDeletes = true)
    assert(rows(t4) === rows(t3))
  }

  test("fail-fast: colliding run-time column and missing deletedAtCol") {
    val snap = Seq((1, "new")).toDF("id", "status")
    // snapshot input must not already carry the engine's run-time column
    intercept[IllegalArgumentException] {
      Snapshot.run(None, snap.withColumn("_snapshot_at", lit("x")),
                   ts("2025-01-01 00:00:00"), cfg)
    }
    // invalidateHardDeletes without a configured delete marker is an error
    intercept[IllegalArgumentException] {
      Snapshot.run(None, snap, ts("2025-01-01 00:00:00"),
                   cfg.copy(deletedAtCol = None), invalidateHardDeletes = true)
    }
  }
}
