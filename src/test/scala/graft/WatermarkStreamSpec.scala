package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.WatermarkStream

/** Late-drop accounting sink: rows older than (committed max event time −
  * delay) at their arrival batch are dropped AND counted; batch 0 never
  * drops; replayed batch ids are skipped.
  */
class WatermarkStreamSpec extends SparkTestBase {

  test("late rows beyond the delay are dropped and counted; fresh rows merge") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = session.sqlContext

    val base = java.nio.file.Files.createTempDirectory("wm_store").toString
    val source = MemoryStream[(Timestamp, String, Double)]
    // delay = 600 s
    val q = WatermarkStream.lateDropSink(
      source.toDF().toDF("ts", "event_type", "value"),
      s"$base/store", 600000000L, s"$base/ckpt")
    try {
      // batch 0: nothing can be late, even wildly old rows
      source.addData(Seq(
        (ts("2025-03-01 10:00:00"), "click", 1.5),
        (ts("2025-03-01 09:00:00"), "view", 2.0)))
      q.processAllAvailable()
      // batch 1: watermark = 10:00:00 − 10 min = 09:50:00.
      //  - 09:30 click  -> late, dropped
      //  - 09:55 click  -> inside the delay, kept
      //  - 10:30 view   -> fresh, kept; advances the max to 10:30
      source.addData(Seq(
        (ts("2025-03-01 09:30:00"), "click", 100.0),
        (ts("2025-03-01 09:55:00"), "click", 4.25),
        (ts("2025-03-01 10:30:00"), "view", 8.0)))
      q.processAllAvailable()
      // batch 2: watermark = 10:30 − 10 min = 10:20 — 10:10 is now late
      source.addData(Seq((ts("2025-03-01 10:10:00"), "view", 50.0)))
      q.processAllAvailable()
    } finally q.stop()

    val got = VersionedTable.read(session, s"$base/store")
      .select("event_type", "n_kept", "n_dropped", "value_micro_kept")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("click", 2L, 1L, 5750000L),
      ("view", 2L, 1L, 10000000L)))
  }

  test("replayed batch token is skipped (at-least-once merge stays exact)") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = session.sqlContext

    val base = java.nio.file.Files.createTempDirectory("wm_replay").toString
    val rows = Seq((ts("2025-03-01 10:00:00"), "click", 1.0))
    def run(): Unit = {
      val source = MemoryStream[(Timestamp, String, Double)]
      val q = WatermarkStream.lateDropSink(
        source.toDF().toDF("ts", "event_type", "value"),
        s"$base/store", 600000000L, s"$base/ckpt")
      try { source.addData(rows); q.processAllAvailable() } finally q.stop()
    }
    run()
    val v1 = VersionedTable.read(session, s"$base/store")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // restarting on the SAME checkpoint replays nothing new: the store must
    // not double-count even if the engine re-offers batch 0
    run()
    val v2 = VersionedTable.read(session, s"$base/store")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(v1 === v2)
    assert(v1 === Seq(("click", 1L, 0L, 1000000L, 1740823200000000L)))
  }
}
