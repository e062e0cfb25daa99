package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization: the stateful-streaming counterpart of
  * `operators.Sessionize`, built on `flatMapGroupsWithState` — the Spark
  * primitive for custom keyed state.
  *
  * State is ONE open session per user (bounded, tiny); a closed session is
  * emitted the moment it is known final, either because a later event opened
  * the next session (in-stream closure) or because the event-time watermark
  * passed `session_end + gap` (GroupState event-time timeout). Late events
  * inside the watermark re-open nothing — they extend or prepend to the open
  * session, mirroring how the batch operator treats out-of-order rows within
  * a partition sort.
  *
  * At scale: state size is O(active users), shuffled once on the user key per
  * micro-batch — the same partitioning the batch operator uses, maintained
  * incrementally.
  */
object SessionStream extends Serializable {

  case class SessionEvent(user_id: Long, ts: Timestamp, event_type: String)

  case class OpenSession(startMicros: Long,
                         endMicros: Long,
                         nEvents: Long,
                         types: Set[String])

  case class Session(user_id: Long,
                     session_start: Timestamp,
                     session_end: Timestamp,
                     n_events: Long,
                     n_event_types: Long)

  private[streaming] def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  private[streaming] def toTs(us: Long): Timestamp =
    Timestamp.from(java.time.Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))

  private[streaming] def summarize(u: Long, s: OpenSession): Session =
    Session(u, toTs(s.startMicros), toTs(s.endMicros), s.nEvents,
            s.types.size.toLong)

  /** Fold the prior open session and a batch's events into closed sessions
    * plus the new open session, as one start-sorted INTERVAL merge (merge
    * when `next.start − cur.end ≤ gap`). This reproduces the sorted-batch
    * sessionization exactly for any within-watermark arrival order — in
    * particular a late event arriving more than `gap` BEFORE the open
    * session closes as its own earlier session instead of gluing across an
    * arbitrarily large backward gap (the naive `em − end ≤ gap` merge test
    * is vacuously true for any older event, a divergence time-sorted feeds
    * never exercise).
    */
  private[streaming] def foldSorted(user: Long, prior: Option[OpenSession],
                                    evs: Array[SessionEvent],
                                    gapMicros: Long)
      : (List[Session], Option[OpenSession]) = {
    val entities = (prior.toList ++ evs.toList.map { e =>
        val em = micros(e.ts)
        OpenSession(em, em, 1L, Set(e.event_type))
      }).sortBy(s => (s.startMicros, s.endMicros))
    var closed = List.empty[Session]
    var open: Option[OpenSession] = None
    for (s2 <- entities) {
      open = open match {
        case Some(s1) if s2.startMicros - s1.endMicros <= gapMicros =>
          Some(OpenSession(s1.startMicros,
                           math.max(s1.endMicros, s2.endMicros),
                           s1.nEvents + s2.nEvents, s1.types ++ s2.types))
        case Some(s1) =>
          closed ::= summarize(user, s1)
          Some(s2)
        case None => Some(s2)
      }
    }
    (closed.reverse, open)
  }

  /** The keyed state transition; partially applied below so the executor
    * closure captures only this (serializable) object and two longs.
    */
  private def stateFn(gapMicros: Long, gapMs: Long)(
      user: Long,
      it: Iterator[SessionEvent],
      state: GroupState[OpenSession]): Iterator[Session] =
    if (state.hasTimedOut) {
      // watermark passed session_end + gap: no event can extend it
      val out = state.getOption.map(summarize(user, _)).iterator
      state.remove()
      out
    } else {
      val (closed, cur) =
        foldSorted(user, state.getOption, it.toArray, gapMicros)
      cur.foreach { s =>
        state.update(s)
        // never set a timeout at/before the current watermark
        state.setTimeoutTimestamp(
          math.max(s.endMicros / 1000L + gapMs,
                   state.getCurrentWatermarkMs + 1L))
      }
      closed.iterator
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
      .flatMapGroupsWithState(OutputMode.Append,
                              GroupStateTimeout.EventTimeTimeout)(
        stateFn(gapMinutes * 60L * 1000000L, gapMinutes * 60L * 1000L) _)
  }
}
