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

  import SessionStream.{summarize, Held, Session, SessionEvent}

  val RocksDbProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private class Proc(gapMicros: Long, gapMs: Long)
      extends StatefulProcessor[Long, SessionEvent, Session] {

    @transient private var held: ValueState[Held] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      held = getHandle.getValueState(
        "held", Encoders.product[Held], TTLConfig.NONE)

    /** Emit every held session the watermark has finalized
      * (`end + gap ≤ watermark` — same rule as [[SessionStream]]), keep
      * the rest, and re-arm ONE timer at the earliest pending finality
      * (never at/before the watermark — such a timer would be dropped
      * instead of firing next batch).
      */
    private def flushFinal(user: Long, merged: List[SessionStream.OpenSession],
                           wmMs: Long,
                           expiredMs: Long = Long.MinValue): Iterator[Session] = {
      val (fin, keep) =
        merged.partition(s => s.endMicros / 1000L + gapMs <= wmMs)
      val h = getHandle
      // the runtime already removed the timer that just fired — deleting
      // it again only logs a spurious warning
      h.listTimers().filter(_ != expiredMs).foreach(h.deleteTimer)
      if (keep.isEmpty) held.clear()
      else {
        held.update(Held(keep))
        h.registerTimer(
          math.max(keep.map(_.endMicros / 1000L + gapMs).min, wmMs + 1L))
      }
      fin.map(summarize(user, _)).iterator
    }

    override def handleInputRows(user: Long,
                                 it: Iterator[SessionEvent],
                                 tv: TimerValues): Iterator[Session] =
      flushFinal(
        user,
        SessionStream.mergeSorted(
          if (held.exists()) held.get().open else Nil, it.toArray, gapMicros),
        tv.getCurrentWatermarkInMs)

    override def handleExpiredTimer(user: Long,
                                    tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[Session] =
      if (held.exists())
        flushFinal(user, held.get().open, tv.getCurrentWatermarkInMs,
                   info.getExpiryTimeInMs)
      else Iterator.empty
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
