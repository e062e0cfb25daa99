package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming token-bucket rate limiter: the per-event admission decision an
  * ingestion edge makes, as keyed state over `flatMapGroupsWithState` — the
  * streaming face of the batch replay fold (q650), same integer state
  * machine: milli-token bucket, continuous refill of 1 milli-token per
  * `refillUsPerMilli` microseconds (integer division — engine-exact), cost
  * `costMilli` per event, capacity `capMilli`.
  *
  * Decisions are emitted per EVENT as they arrive (append mode) — unlike
  * sessions there is nothing to hold back: an admission decision is final
  * the moment it is made; late events get the state as of their arrival
  * ORDER (admission control is an arrival-time policy by nature, so batch
  * parity holds exactly for time-ordered feeds and is not a goal for
  * out-of-order ones).
  *
  * At scale: state is two longs per active user; one shuffle on the user
  * key per micro-batch.
  */
object RateLimitStream extends Serializable {

  case class Ev(user_id: Long, ts: Timestamp, event_id: Long)
  case class Bucket(p: Long, tk: Long)
  case class Decision(user_id: Long, event_id: Long, accepted: Boolean)

  private def stateFn(capMilli: Long, costMilli: Long, refillUs: Long)(
      user: Long,
      it: Iterator[Ev],
      state: GroupState[Bucket]): Iterator[Decision] = {
    var st = state.getOption.getOrElse(Bucket(-1L, capMilli))
    val out = it.toArray
      .sortBy(e => (SessionStream.micros(e.ts), e.event_id))
      .map { e =>
        val p = SessionStream.micros(e.ts)
        // Cross-batch out-of-order guard: an event older than the stored
        // bucket clock must not produce a NEGATIVE refill (draining tokens
        // without an admission) nor rewind st.p (the next in-order event
        // would then double-count the elapsed interval and mint tokens no
        // ordering of the feed would grant). Clamp the refill at zero and
        // keep the clock monotone — the stale event is charged against
        // current state, which is the documented arrival-order policy.
        val refill =
          if (st.p < 0) 0L else math.max(0L, (p - st.p) / refillUs)
        val tk = math.min(capMilli, st.tk + refill)
        val accepted = tk >= costMilli
        st = Bucket(math.max(st.p, p), if (accepted) tk - costMilli else tk)
        Decision(user, e.event_id, accepted)
      }
    state.update(st)
    out.iterator
  }

  /** `events` needs columns (user_id: long, ts: timestamp, event_id: long).
    * Returns per-event admission decisions (append mode).
    */
  def decisions(events: DataFrame,
                capMilli: Long = 2000L,
                costMilli: Long = 1000L,
                refillUsPerMilli: Long = 7200000L): Dataset[Decision] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("ts"), col("event_id"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
                              GroupStateTimeout.NoTimeout)(
        stateFn(capMilli, costMilli, refillUsPerMilli) _)
  }
}
