package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Per-key running top-k values on `transformWithState` ListState — the
  * v2 API's ordered-collection tier (with [[SessionStreamTws]]'s
  * ValueState+timers and [[DistinctStream]]'s MapState this completes the
  * state-type surface). The state is the k-element sorted multiset —
  * bounded per key, merged against each batch's values with one linear
  * pass.
  *
  * Emissions are CHANGES only, and — for the REQUIRED non-negative
  * inputs (enforced with `require`; a negative value entering a
  * not-yet-full list would change state while decreasing the sum) — the
  * top-k sum strictly increases on
  * every change (an element is only ever replaced by a larger one), so
  * `max(struct(sum, set))` per key over the sink is the final top-k for
  * ANY batch slicing — the same monotone-recovery contract as
  * [[DistinctStream]], which is what lets an order-free batch oracle
  * check a streaming operator.
  */
object TopValuesStream extends Serializable {

  case class KV(user_id: Long, v: Long)
  case class TopK(user_id: Long, top_sum: Long, top_str: String)

  private class Proc(k: Int)
      extends StatefulProcessor[Long, KV, TopK] {

    @transient private var top: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      top = getHandle.getListState("top", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(user: Long, it: Iterator[KV],
                                 tv: TimerValues): Iterator[TopK] = {
      val cur = top.get().toSeq
      // The monotone-recovery contract (top-k sum strictly increases on
      // every change) holds ONLY for non-negative values: a negative v
      // entering a not-yet-full list would change state while DECREASING
      // top_sum, making max(struct(sum, set)) recover a stale answer.
      // Enforce the precondition rather than ship the silent divergence.
      val vs = it.map(_.v).toArray
      require(vs.forall(_ >= 0L),
        s"topValues monotone recovery requires non-negative values; got ${vs.filter(_ < 0L).head} for key $user")
      val merged = (cur ++ vs).sorted(Ordering[Long].reverse)
        .take(k)
      if (merged == cur) Iterator.empty
      else {
        top.clear()
        top.appendList(merged.toArray)
        Iterator.single(TopK(user, merged.sum, merged.mkString(",")))
      }
    }
  }

  /** `events` needs (user_id: long, v: long). Append-mode change stream;
    * `max(struct(top_sum, top_str))` per user recovers the final top-k.
    */
  def topValues(events: DataFrame, k: Int): Dataset[TopK] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("v")).as[KV]
      .groupByKey(_.user_id)
      .transformWithState(new Proc(k), TimeMode.None(), OutputMode.Append())
  }

  /** [[topValues]] warm-started from a BATCH state table
    * (`StatefulProcessorWithInitialState` — the state-migration /
    * bootstrap path: yesterday's batch aggregate becomes today's stream
    * state without replaying history). `handleInitialState` fires once
    * per initial ROW before any input batch, folding each seed value
    * into the ListState exactly like a streamed value, so the recovered
    * final top-k equals batch top-k over (seed ∪ streamed) — which is
    * what lets one order-free oracle check the warm start really
    * happened.
    */
  private class ProcInit(k: Int)
      extends org.apache.spark.sql.streaming
        .StatefulProcessorWithInitialState[Long, KV, TopK, KV] {

    @transient private var top: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      top = getHandle.getListState("top", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInitialState(user: Long, seed: KV,
                                    tv: TimerValues): Unit = {
      val merged = (top.get().toSeq :+ seed.v)
        .sorted(Ordering[Long].reverse).take(k)
      top.clear()
      top.appendList(merged.toArray)
    }

    override def handleInputRows(user: Long, it: Iterator[KV],
                                 tv: TimerValues): Iterator[TopK] = {
      val cur = top.get().toSeq
      val merged = (cur ++ it.map(_.v)).sorted(Ordering[Long].reverse)
        .take(k)
      top.clear()
      top.appendList(merged.toArray)
      // emit unconditionally: the warm-started state must surface even
      // for users whose streamed rows change nothing
      Iterator.single(TopK(user, merged.sum, merged.mkString(",")))
    }
  }

  /** `init` and `events` both need (user_id: long, v: long). */
  def topValuesWithInit(events: DataFrame, init: DataFrame,
                        k: Int): Dataset[TopK] = {
    val spark = events.sparkSession
    import spark.implicits._
    val initState = init.select(col("user_id"), col("v")).as[KV]
      .groupByKey(_.user_id)
    events.select(col("user_id"), col("v")).as[KV]
      .groupByKey(_.user_id)
      .transformWithState(new ProcInit(k), TimeMode.None(),
                          OutputMode.Append(), initState)
  }
}
