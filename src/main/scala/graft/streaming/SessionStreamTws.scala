package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Sessionization on `transformWithState` — Spark 4's arbitrary-state v2
  * streaming API (SPARK-46815), the successor to `flatMapGroupsWithState`.
  * Semantics are identical to [[SessionStream]] (same transition, same
  * closure rules), so the two implementations are mutually checking; what
  * changes is the state machinery:
  *
  *  - explicit named `ValueState` from the processor handle instead of
  *    GroupState's single implicit slot (the v2 API composes several typed
  *    states per key — value/list/map — and supports per-state TTL);
  *  - explicit named TIMERS (`registerTimer`/`deleteTimer`/`listTimers`)
  *    instead of the one `setTimeoutTimestamp` slot: the session-closure
  *    timer is re-armed by deleting the stale timer on every extension;
  *  - `handleExpiredTimer` as a separate callback from `handleInputRows`,
  *    rather than a `hasTimedOut` branch.
  *
  * Requires the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass` =
  * `...state.RocksDBStateStoreProvider`) — the HDFS-backed store does not
  * implement the v2 per-state schema. At 100 TB the RocksDB store is also
  * the operational choice: state spills to local SSD and snapshots to the
  * checkpoint incrementally instead of living on-heap.
  */
object SessionStreamTws extends Serializable {

  import SessionStream.{micros, summarize, OpenSession, Session, SessionEvent}

  val RocksDbProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private class Proc(gapMicros: Long, gapMs: Long)
      extends StatefulProcessor[Long, SessionEvent, Session] {

    @transient private var open: ValueState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState(
        "open", Encoders.product[OpenSession], TTLConfig.NONE)

    override def handleInputRows(user: Long,
                                 it: Iterator[SessionEvent],
                                 tv: TimerValues): Iterator[Session] = {
      val (closed, cur) = SessionStream.foldSorted(
        user, if (open.exists()) Some(open.get()) else None,
        it.toArray, gapMicros)
      cur.foreach { s =>
        open.update(s)
        // re-arm the closure timer: drop whatever was armed for the older
        // session end, then arm end+gap (never at/before the watermark —
        // such a timer would be dropped instead of firing next batch)
        val h = getHandle
        h.listTimers().foreach(h.deleteTimer)
        h.registerTimer(math.max(s.endMicros / 1000L + gapMs,
                                 tv.getCurrentWatermarkInMs + 1L))
      }
      closed.iterator
    }

    override def handleExpiredTimer(user: Long,
                                    tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[Session] =
      if (open.exists()) {
        val s = open.get()
        // stale-timer guard (shouldn't fire given the delete-on-extend,
        // but a timer that predates the session's current end must not
        // close it early)
        if (info.getExpiryTimeInMs >= s.endMicros / 1000L + gapMs) {
          open.clear()
          Iterator.single(summarize(user, s))
        } else Iterator.empty
      } else Iterator.empty
  }

  /** `events` needs columns (user_id: long, ts: timestamp, event_type:
    * string). Returns completed sessions (append mode).
    */
  def sessions(events: DataFrame,
               gapMinutes: Int = 30,
               watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id"), col("ts"), col("event_type"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .transformWithState(new Proc(gapMinutes * 60L * 1000000L,
                                   gapMinutes * 60L * 1000L),
                          TimeMode.EventTime(), OutputMode.Append())
  }
}
