package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, MapState}

/** Per-key exact running distinct counting on `transformWithState`
  * MapState — the v2 API's keyed-map tier (a set per user that the state
  * store indexes by map key, so membership tests never deserialize the
  * whole set the way a ValueState[Set] would; at 100 TB of users ×
  * high-cardinality values that indexing IS the operator).
  *
  * Emits (user, n_distinct) after each batch that CHANGED the user's set;
  * the count is monotone, so the final value per user is `max` over the
  * emitted rows — order-independent and replay-deterministic, which is
  * what lets a DuckDB COUNT(DISTINCT) oracle check the stream.
  */
object DistinctStream extends Serializable {

  case class KV(user_id: Long, value: String)
  case class DistinctCount(user_id: Long, n_distinct: Long)

  private class Proc
      extends StatefulProcessor[Long, KV, DistinctCount] {

    @transient private var seen: MapState[String, Boolean] = _
    @transient private var n: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      seen = getHandle.getMapState("seen", Encoders.STRING,
                                   Encoders.scalaBoolean, TTLConfig.NONE)
      n = getHandle.getValueState("n", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(user: Long, it: Iterator[KV],
                                 tv: TimerValues): Iterator[DistinctCount] = {
      var count = if (n.exists()) n.get() else 0L
      var changed = false
      it.foreach { kv =>
        if (!seen.containsKey(kv.value)) {
          seen.updateValue(kv.value, true)
          count += 1L
          changed = true
        }
      }
      if (changed) {
        n.update(count)
        Iterator.single(DistinctCount(user, count))
      } else Iterator.empty
    }
  }

  /** `events` needs (user_id: long, value: string). Append-mode stream of
    * monotone per-user distinct counts; `groupBy(user).max(n_distinct)`
    * of the sink is the exact distinct count.
    */
  def distinctCounts(events: DataFrame): Dataset[DistinctCount] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("value")).as[KV]
      .groupByKey(_.user_id)
      .transformWithState(new Proc, TimeMode.None(), OutputMode.Append())
  }
}
