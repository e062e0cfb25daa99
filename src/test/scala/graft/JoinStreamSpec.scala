package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.JoinStream

/** Stream-stream event-time join: in-window pairs emit, out-of-window and
  * unmatched rows don't, and the result equals the identical batch join.
  */
class JoinStreamSpec extends SparkTestBase {

  test("clicks join impressions within the attribution window only") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = session.sqlContext

    val imps = MemoryStream[(Long, Long, Timestamp)]
    val clks = MemoryStream[(Long, Long, Timestamp)]
    val out = JoinStream.clickThrough(
      imps.toDF().toDF("imp_id", "user_id", "imp_ts"),
      clks.toDF().toDF("click_id", "user_id", "click_ts"),
      Seq("user_id"), "imp_ts", "click_ts", windowSec = 60L)
      .select("imp_id", "click_id")
    val query = out.writeStream.format("memory").queryName("ct_out")
      .outputMode(OutputMode.Append()).start()
    try {
      imps.addData(
        (1L, 7L, ts("2025-01-01 00:00:00")),
        (2L, 7L, ts("2025-01-01 01:00:00")),
        (3L, 8L, ts("2025-01-01 00:00:00")))
      clks.addData(
        (10L, 7L, ts("2025-01-01 00:00:30")),  // in window of imp 1
        (11L, 7L, ts("2025-01-01 00:05:00")),  // >60s after imp 1: no match
        (12L, 9L, ts("2025-01-01 00:00:10")))  // unknown user: no match
      query.processAllAvailable()
    } finally query.stop()

    val got = session.table("ct_out")
      .as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L)))

    // the batch join over the same rows agrees
    val bImps = Seq((1L, 7L, ts("2025-01-01 00:00:00")),
                    (2L, 7L, ts("2025-01-01 01:00:00")),
                    (3L, 8L, ts("2025-01-01 00:00:00")))
      .toDF("imp_id", "user_id", "imp_ts")
    val bClks = Seq((10L, 7L, ts("2025-01-01 00:00:30")),
                    (11L, 7L, ts("2025-01-01 00:05:00")),
                    (12L, 9L, ts("2025-01-01 00:00:10")))
      .toDF("click_id", "user_id", "click_ts")
    val batch = bImps.join(bClks,
        bImps("user_id") === bClks("user_id") &&
          bClks("click_ts") >= bImps("imp_ts") &&
          bClks("click_ts") <= bImps("imp_ts") + org.apache.spark.sql.functions.expr("INTERVAL 60 SECONDS"))
      .select("imp_id", "click_id")
      .as[(Long, Long)].collect().toSet
    assert(batch === got)
  }

  test("left_outer emits unmatched impressions null-padded after watermark") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = session.sqlContext

    val imps = MemoryStream[(Long, Long, Timestamp)]
    val clks = MemoryStream[(Long, Long, Timestamp)]
    val out = JoinStream.clickThrough(
      imps.toDF().toDF("imp_id", "user_id", "imp_ts"),
      clks.toDF().toDF("click_id", "user_id", "click_ts"),
      Seq("user_id"), "imp_ts", "click_ts", windowSec = 60L,
      watermarkDelay = "1 minutes", joinType = "left_outer")
      .select("imp_id", "click_id")
    val query = out.writeStream.format("memory").queryName("cto_out")
      .outputMode(OutputMode.Append()).start()
    try {
      imps.addData((1L, 7L, ts("2025-01-01 00:00:00")),
                   (2L, 8L, ts("2025-01-01 00:00:00")))
      clks.addData((10L, 7L, ts("2025-01-01 00:00:30")))
      query.processAllAvailable()
      // push both watermarks far past imp_ts + window + delay
      imps.addData((99L, 1L, ts("2025-01-01 06:00:00")))
      clks.addData((98L, 1L, ts("2025-01-01 06:00:00")))
      query.processAllAvailable()
    } finally query.stop()

    val got = session.table("cto_out")
      .as[(Long, Option[Long])].collect().toSet
    // imp 1 matched; imp 2 expired unmatched -> null click
    assert(got.contains((1L, Some(10L))))
    assert(got.contains((2L, None)))
  }
}
