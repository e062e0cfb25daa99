// scratch scaling-slope probe (not part of the library)
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Re-measure gramMatrix after the Aggregator rewrite.
  * Usage: runMain graft.tools.Stress9c
  */
object Stress9c {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- Seq(250000L, 1000000L, 4000000L, 16000000L)) {
      val vecs = spark.range(n).select(expr(
        """transform(sequence(1, 16),
          |  i -> CAST(CAST((id * i * 2654435761) % 2000 - 1000 AS DOUBLE)
          |       / 1000.0D AS FLOAT))""".stripMargin).as("embedding"))
      val t0 = System.nanoTime()
      Similarity.gramMatrix(vecs, "embedding", dims = 16)
        .write.format("noop").mode("overwrite").save()
      println(f"STRESS9C gramMatrix n=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
