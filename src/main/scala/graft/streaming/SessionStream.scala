package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization: the stateful-streaming counterpart of
  * `operators.Sessionize`, built on `flatMapGroupsWithState` — the Spark
  * primitive for custom keyed state.
  *
  * State holds EVERY session that is not yet watermark-final for the user —
  * the open tail session plus any earlier sessions whose `end + gap` the
  * event-time watermark has not passed. A session is emitted exactly when
  * the watermark passes `session_end + gap` (batch progress or GroupState
  * event-time timeout): only then can no within-watermark late event merge
  * with it. Emitting earlier — e.g. the moment a later event opened the
  * next session — looks tempting but breaks batch parity ACROSS
  * micro-batches: a session closed-and-emitted in batch N can still receive
  * a within-watermark late event in batch N+1 that batch semantics would
  * glue to it (this was round-8 advice; the fix is the same finality rule
  * Spark's built-in session windows use). Within-watermark late events
  * therefore merge correctly no matter which batch they land in, at the
  * cost of emission latency = the watermark delay.
  *
  * At scale: state size is O(active users × sessions inside one watermark
  * delay) — bounded by the same delay that bounds every watermarked op —
  * shuffled once on the user key per micro-batch, the same partitioning the
  * batch operator uses, maintained incrementally.
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

  /** Per-user non-final session state: the open tail plus any earlier
    * sessions still inside the watermark horizon, kept start-sorted and
    * pairwise more-than-gap apart (the merge invariant).
    */
  case class Held(open: List[OpenSession])

  /** Fold the prior held sessions and a batch's events into the new
    * disjoint session list, as one start-sorted INTERVAL merge (merge when
    * `next.start − cur.end ≤ gap`). Reproduces the sorted-batch
    * sessionization for any within-watermark arrival order — in particular
    * a late event arriving more than `gap` BEFORE the open session forms
    * its own earlier session instead of gluing across an arbitrarily large
    * backward gap (the naive `em − end ≤ gap` merge test is vacuously true
    * for any older event), and a late event landing between two held
    * sessions can bridge them back into one.
    */
  private[streaming] def mergeSorted(prior: List[OpenSession],
                                     evs: Array[SessionEvent],
                                     gapMicros: Long): List[OpenSession] = {
    val entities = (prior ++ evs.toList.map { e =>
        val em = micros(e.ts)
        OpenSession(em, em, 1L, Set(e.event_type))
      }).sortBy(s => (s.startMicros, s.endMicros))
    var out = List.empty[OpenSession]
    for (s2 <- entities) {
      out = out match {
        case s1 :: rest if s2.startMicros - s1.endMicros <= gapMicros =>
          OpenSession(s1.startMicros,
                      math.max(s1.endMicros, s2.endMicros),
                      s1.nEvents + s2.nEvents, s1.types ++ s2.types) :: rest
        case _ => s2 :: out
      }
    }
    out.reverse
  }

  /** The keyed state transition; partially applied below so the executor
    * closure captures only this (serializable) object and two longs.
    * Finality is watermark-only: a session is emitted exactly when
    * `end + gap ≤ watermark` (no within-watermark event can merge with it
    * any more — such an event would start at `≤ end + gap ≤ watermark` and
    * is by definition outside the allowed lateness).
    */
  private def stateFn(gapMicros: Long, gapMs: Long)(
      user: Long,
      it: Iterator[SessionEvent],
      state: GroupState[Held]): Iterator[Session] = {
    val prior = state.getOption.map(_.open).getOrElse(Nil)
    val merged =
      if (state.hasTimedOut) prior // no new events, just re-check finality
      else mergeSorted(prior, it.toArray, gapMicros)
    val wmMs = state.getCurrentWatermarkMs
    val (fin, held) =
      merged.partition(s => s.endMicros / 1000L + gapMs <= wmMs)
    if (held.isEmpty) state.remove()
    else {
      state.update(Held(held))
      // earliest pending finality; never at/before the current watermark
      state.setTimeoutTimestamp(
        math.max(held.map(_.endMicros / 1000L + gapMs).min, wmMs + 1L))
    }
    fin.map(summarize(user, _)).iterator
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
