package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream event-time join: attribute each click to the impression it
  * followed within an attribution window — the canonical two-stream join
  * Structured Streaming state-stores on both sides.
  *
  * Both inputs are watermarked; the join condition bounds click time to
  * `[impression time, impression time + windowSec]`, which is what lets the
  * engine EXPIRE state: an impression older than the watermark minus the
  * window can never match a future click and is evicted, so state size
  * tracks the window's event volume, not the stream's history. Without the
  * time bound the state is unbounded and the join is rejected in append
  * mode — the bound is the scalability contract, not an optimization.
  *
  * Inner join ⇒ unmatched impressions/clicks emit nothing (last-touch
  * attribution of the matched pairs is a downstream batch aggregate).
  * Result equals the identical batch join over the same data (spec-
  * asserted), because event-time logic is replay-deterministic.
  */
object JoinStream {

  /** `joinType` "inner" emits matched pairs only; "left_outer" additionally
    * emits each unmatched impression once — null-padded — after the
    * watermark proves no in-window click can still arrive (the
    * view-without-click row the funnel needs). Outer rows are inherently
    * watermark-delayed; that latency is the price of a correct "no match"
    * claim on an unbounded stream.
    */
  def clickThrough(impressions: DataFrame,
                   clicks: DataFrame,
                   keyCols: Seq[String],
                   impTsCol: String,
                   clickTsCol: String,
                   windowSec: Long,
                   watermarkDelay: String = "10 minutes",
                   joinType: String = "inner"): DataFrame = {
    val imp = impressions.withWatermark(impTsCol, watermarkDelay)
    val clk = clicks.withWatermark(clickTsCol, watermarkDelay)
    val cond = keyCols.map(k => imp(k) === clk(k)).reduce(_ && _) &&
      clk(clickTsCol) >= imp(impTsCol) &&
      clk(clickTsCol) <= imp(impTsCol) + expr(s"INTERVAL $windowSec SECONDS")
    keyCols.foldLeft(imp.join(clk, cond, joinType))((d, k) => d.drop(clk(k)))
  }
}
