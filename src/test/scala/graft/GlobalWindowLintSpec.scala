package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Regression lint: no query in the driver surface may plan a window with an
  * EMPTY partition spec — the single-partition scale-killer that funnels the
  * whole relation through one task (rounds 3's q94/q192 would have failed
  * this). Deliberate dimension-sized windows declare
  * [[graft.functions.DimKey.one]] as their partition key, which keeps the
  * plan shape (one hash partition over a provably bounded relation) while
  * making the intent explicit — and non-empty, so this lint stays clean.
  * Plan-based, so SQL-text and expr() windows are caught too.
  *
  * DimKey.one is for relations BOUNDED regardless of scale factor
  * (day-grain calendars, decile grids, ≤ microBins cell rollups — e.g.
  * the coarse-cell prefix inside `Profile.cellRank`); a DimKey.one rank
  * over a relation that GROWS with SF (customers, suppliers) is a
  * latent single-task scale-killer the lint cannot see, and belongs on
  * `Profile.cellRank` instead (r14 verdict task 3 — q813/q823/q836 now
  * all rank through the two-level cell shape).
  */
class GlobalWindowLintSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def scan(p: SparkPlan): Seq[String] = {
    val self = p match {
      case w: WindowExec if w.partitionSpec.isEmpty =>
        Seq("WindowExec: " + w.windowExpression.mkString(", ").take(120))
      case w: WindowGroupLimitExec if w.partitionSpec.isEmpty =>
        Seq("WindowGroupLimitExec: " + w.orderSpec.mkString(", ").take(120))
      case a: AdaptiveSparkPlanExec => scan(a.executedPlan)
      case _ => Nil
    }
    self ++ p.children.flatMap(scan) ++ p.subqueries.flatMap(scan)
  }

  test("no driver query plans a window without partition keys") {
    assume(new java.io.File(sfDir).exists(), s"$sfDir not present")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        // building the plan is enough — the lint never executes the query
        // (q197-q199 DO run their engine/stream harnesses while constructing
        // their result, which is inherent to what they return)
        val hits =
          try scan(fn(spark, sfDir).queryExecution.executedPlan)
          catch { case e: Throwable => Seq(s"PLAN FAILED: ${e.getMessage}") }
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        hits.map(h => s"$name :: $h")
    }
    assert(offenders.isEmpty,
           "global (unpartitioned) windows found:\n" + offenders.mkString("\n"))
  }
}
