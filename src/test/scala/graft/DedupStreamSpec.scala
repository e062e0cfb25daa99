package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.DedupStream

/** Streaming exact dedup: first arrival per content fingerprint survives,
  * later arrivals are suppressed across micro-batches; within one batch the
  * minimum doc_id wins (deterministic under batch-internal reordering).
  */
class DedupStreamSpec extends SparkTestBase {

  test("cross-batch duplicates suppressed; min doc_id wins within a batch") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = session.sqlContext

    val source = MemoryStream[(Long, String)]
    val out = DedupStream.distinctDocs(
      source.toDF().toDF("doc_id", "text"))
    val query = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: docs 5 and 2 share content (same tokens) -> 2 wins
      source.addData((5L, "hello world"), (2L, "Hello   WORLD"), (3L, "other"))
      query.processAllAvailable()
      // batch 2: doc 9 repeats batch-1 content -> suppressed; doc 4 is new
      source.addData((9L, "hello world"), (4L, "brand new"))
      query.processAllAvailable()
    } finally query.stop()

    val got = session.table("dedup_out")
      .select("doc_id").as[Long].collect().toSet
    assert(got === Set(2L, 3L, 4L))
  }

  test("event-time TTL: a quiet fingerprint expires, next arrival re-admits") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = session.sqlContext

    val source = MemoryStream[(Long, String, java.sql.Timestamp)]
    val out = DedupStream.distinctDocsTtl(
      source.toDF().toDF("doc_id", "text", "ts"),
      eventTimeCol = "ts", ttl = java.time.Duration.ofHours(1))
    val query = out.writeStream.format("memory").queryName("dedup_ttl_out")
      .outputMode(OutputMode.Append()).start()
    def feed(rows: (Long, String, java.sql.Timestamp)*): Unit = {
      source.addData(rows); query.processAllAvailable()
    }
    try {
      feed((1L, "hello world", ts("2025-01-01 10:00:00")))
      // duplicate inside the TTL window: suppressed, timer refreshed
      feed((2L, "hello world", ts("2025-01-01 10:30:00")))
      // advances the watermark past 11:30 (the refreshed deadline)...
      feed((8L, "unrelated", ts("2025-01-01 13:00:00")))
      // ...so this batch fires the expired timer and clears the key
      feed((10L, "another", ts("2025-01-01 13:05:00")))
      // the same content is now a first arrival again
      feed((9L, "hello world", ts("2025-01-01 13:10:00")))
    } finally query.stop()

    val got = session.table("dedup_ttl_out")
      .select("doc_id").as[Long].collect().toSet
    assert(got === Set(1L, 8L, 10L, 9L))
  }
}
