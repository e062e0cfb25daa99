package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry
import graft.plans.PlanContract

/** Dev tool: operator-count probe for plan contracts.
  * Usage: runMain graft.tools.PlanProbe <sfDir> <query> ...
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ops = Seq("Exchange", "BroadcastHashJoin", "SortMergeJoin",
                  "TakeOrderedAndProject", "Sort", "Window")
    for (sf <- args.head.split(","); q <- args.drop(1)) {
      val df = SparkEntry.queries(q)(spark, sf)
      println(s"PROBE $sf $q " +
        ops.map(o => s"$o=${PlanContract.count(df, o)}").mkString(" ") +
        " pushed=" + PlanContract.contains(df, "PushedFilters: [Is"))
    }
    spark.stop()
  }
}
