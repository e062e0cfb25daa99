package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Dev-only scanner: reports every SparkEntry query whose physical plan
  * contains a window operator with an EMPTY partition spec (the
  * single-partition scale-killer WindowExec warns about). Plan-based, so it
  * catches SQL-text and expr() windows that a source grep misses.
  */
object FindGlobalWindows {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def scan(p: SparkPlan): Seq[String] = {
      val self = p match {
        case w: WindowExec if w.partitionSpec.isEmpty =>
          Seq("WindowExec: " + w.windowExpression.mkString(", ").take(120))
        case w: WindowGroupLimitExec if w.partitionSpec.isEmpty =>
          Seq("WindowGroupLimitExec: " + w.orderSpec.mkString(", ").take(120))
        case a: AdaptiveSparkPlanExec => scan(a.executedPlan)
        case _ => Nil
      }
      self ++ p.children.flatMap(scan) ++
        p.subqueries.flatMap(scan)
    }
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val hits = scan(fn(spark, sfDir).queryExecution.executedPlan)
        if (hits.nonEmpty) println(s"GLOBALWIN $name :: ${hits.mkString(" | ")}")
      } catch { case e: Throwable =>
        println(s"ERR $name: ${e.getMessage.linesIterator.next()}")
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    println("SCAN DONE")
    spark.stop()
  }
}
