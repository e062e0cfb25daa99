package graft.operators

import org.apache.spark.sql.DataFrame

/** Cache/checkpoint lifecycle seal for public operators (round-12 verdict
  * task 4, extended library-wide in round 14 per the round-13 verdict):
  * eagerly materialize an operator's result via `localCheckpoint` — while
  * its internal caches/checkpoints are still hot — then release those
  * internals (CacheManager-aware `unpersist` for `.cache()` sites,
  * RDD-level release for `.localCheckpoint(…)` sites). The caller gets a
  * self-contained plan and executor storage stays FLAT across repeated
  * operator invocations; the ONE persisted RDD left behind is the
  * result's own checkpoint, which the caller owns (the bench harness
  * releases it between queries; a long-lived session releases it when
  * done with the result). Round18OpsSpec/Round19OpsSpec pin "≤ 1 new
  * persisted RDD per public operator".
  *
  * Without the seal, a library user composing operators accumulates
  * executor storage: every internal `localCheckpoint` RDD persists until
  * the session dies (r13 measured `Graph.katz` pinning iters+2 RDDs per
  * CALL), and the GC pressure from the pile-up showed up as 5-10x
  * latency outliers on late queries in long suites.
  */
private[graft] object Seal {

  /** Release the local-checkpoint RDD backing `df` (no-op for plans that
    * are not checkpoint-backed). `Dataset.unpersist` only clears
    * CacheManager entries, so lazily/eagerly checkpointed INTERNAL
    * relations need this RDD-level release. Only call once nothing will
    * read `df` again — a local checkpoint has no lineage to recompute
    * from.
    */
  def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }

  /** Release EVERY checkpoint-backed leaf anywhere in `df`'s analyzed
    * plan — for operators whose composed helpers bake a sealed internal
    * checkpoint into a LAZY result plan (e.g. [[Dedup.keepCanonical]]'s
    * loser set inside its returned anti-join), where the top-level-only
    * [[releaseCheckpoint]] can't reach it. Only call once the WHOLE plan
    * is owned by the caller and fully materialized elsewhere: unlike a
    * session-wide `getPersistentRDDs` snapshot diff (ADVICE r14 — which
    * could unpersist a concurrent thread's lineage-free checkpoint), this
    * walk touches exactly the RDDs reachable from this one plan.
    */
  def releaseCheckpoints(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }

  def apply(result: DataFrame,
            cached: Seq[DataFrame] = Nil,
            ckpts: Seq[DataFrame] = Nil): DataFrame = {
    val out = result.localCheckpoint()
    cached.foreach(_.unpersist(false))
    ckpts.foreach(releaseCheckpoint)
    out
  }

  /** Checkpoint tracker for operators with loops or helper-built internal
    * state: `track` registers (and passes through) each internal
    * checkpoint as it is created; `seal` materializes the result and
    * releases everything tracked. One tracker per operator CALL — never
    * shared or stored.
    */
  final class Tracker {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def track(df: DataFrame): DataFrame = { buf += df; df }
    def seal(result: DataFrame, cached: Seq[DataFrame] = Nil): DataFrame =
      Seal(result, cached, buf.toSeq)
  }
}
