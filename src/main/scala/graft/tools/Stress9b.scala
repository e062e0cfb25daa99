// scratch scaling-slope probe (not part of the library)
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Re-measure kcore after the incremental-peel rewrite (vs Stress9's
  * full-recompute numbers). Usage: runMain graft.tools.Stress9b
  */
object Stress9b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (e <- Seq(1000000L, 4000000L, 16000000L)) {
      val edges = spark.range(e).select(
        (col("id") % (e / 8L)).as("src"),
        ((col("id") * 31L + col("id") % 97L) % (e / 8L)).as("dst"))
        .filter(col("src") =!= col("dst"))
      val t0 = System.nanoTime()
      noop(Graph.kcore(edges, k = 8, sweeps = 6))
      println(f"STRESS9B kcore6 e=$e ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
