package graft.plans

import org.apache.spark.sql.DataFrame

/** Physical-plan contracts: count operator occurrences in the
  * pre-execution plan string so scale-critical plan shapes (broadcast
  * joins stayed broadcast, the top-k stayed TakeOrderedAndProject, no
  * extra shuffle crept in) can be pinned INSIDE the correctness gate — a
  * plan regression then fails the driver hash compare like any wrong
  * answer, instead of surfacing rounds later as a bench anomaly.
  *
  * Counting is word-bounded over `executedPlan.toString` (with AQE this
  * prints the initial plan — deterministic for a fixed Spark version and
  * session conf, which the harness pins).
  */
object PlanContract {

  def planString(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** Occurrences of `op` as a whole word in the plan ("Exchange" does NOT
    * match inside "BroadcastExchange").
    */
  def count(df: DataFrame, op: String): Int =
    ("\\b" + java.util.regex.Pattern.quote(op) + "\\b").r
      .findAllMatchIn(planString(df)).length

  def contains(df: DataFrame, fragment: String): Boolean =
    planString(df).contains(fragment)
}
