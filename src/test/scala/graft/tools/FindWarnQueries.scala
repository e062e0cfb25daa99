package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off diagnostic: build (analyze only) every SparkEntry query with a
  * stderr marker between each, so log lines (e.g. Column's trivially-true
  * equals warning, emitted at Column CONSTRUCTION time) can be attributed to
  * the query that produced them: `grep -B1 'trivially' | grep MARKER`.
  */
object FindWarnQueries {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      System.err.println(s"QMARKER $name"); System.err.flush()
      try { fn(spark, dir).queryExecution.analyzed; () }
      catch { case _: Throwable => () }
    }
    spark.stop()
  }
}
