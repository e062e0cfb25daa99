package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{SessionStream, SessionStreamTws}
import graft.streaming.SessionStream.SessionEvent

/** transformWithState sessionization: the v2-API implementation must emit
  * exactly what the flatMapGroupsWithState one does — in-stream closure,
  * timer-driven closure after watermark, late-event session extension.
  */
class SessionStreamTwsSpec extends SparkTestBase {

  private def se(user: Long, t: String, et: String) =
    SessionEvent(user, ts(t), et)

  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, SessionStreamTws.RocksDbProvider)
    try body
    finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("in-stream + timer closure and late extension match the v1 operator") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = session.sqlContext

    val batches: Seq[Seq[SessionEvent]] = Seq(
      Seq(se(1, "2025-01-01 10:00:00", "view"),
          se(1, "2025-01-01 10:10:00", "click"),
          se(2, "2025-01-01 10:05:00", "view")),
      // late event within watermark extends user 1's open session tail
      Seq(se(1, "2025-01-01 10:20:00", "purchase")),
      // far-future event closes user 1 in-stream and advances watermark
      Seq(se(1, "2025-01-01 12:00:00", "view")),
      // extra batch so the advanced watermark's timers fire (user 2)
      Seq(se(3, "2025-01-01 12:30:00", "view")))

    def run(name: String,
            mk: org.apache.spark.sql.DataFrame =>
              org.apache.spark.sql.Dataset[SessionStream.Session]) = {
      val src = MemoryStream[SessionEvent]
      val q = mk(src.toDF()).writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try batches.foreach { b => src.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
      spark.table(name).orderBy("user_id", "session_start").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
                   r.getLong(3), r.getLong(4))).toSeq
    }

    val v2 = withRocksDb {
      run("tws_sessions",
          df => SessionStreamTws.sessions(df, 30, "10 minutes"))
    }
    val v1 = run("v1_sessions",
                 df => SessionStream.sessions(df, 30, "10 minutes"))
    assert(v2 === v1)
    assert(v2 === Seq(
      (1L, ts("2025-01-01 10:00:00"), ts("2025-01-01 10:20:00"), 3L, 3L),
      (2L, ts("2025-01-01 10:05:00"), ts("2025-01-01 10:05:00"), 1L, 1L)))
  }
}
