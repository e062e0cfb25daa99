// scratch scaling-slope probe (not part of the library)
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TopKAgg
import graft.operators.{Graph, Layout, Similarity}

/** Round-7 session-2 stress: scale slopes for the top-k Aggregator (vs
  * the window-rank formulation), the Gram-matrix one-pass accumulate,
  * k-core sweeps on a synthetic power-law-ish graph, and zone-map pruned
  * reads vs full scans. Synthetic via `spark.range`.
  *
  * Usage: runMain graft.tools.Stress9
  */
object Stress9 {

  private def time[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    println(f"STRESS9 $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // --- topK Aggregator vs window rank: 100 hot groups ----------------
    for (n <- Seq(2000000L, 20000000L, 80000000L)) {
      val df = spark.range(n).select(
        (col("id") % 100L).as("g"),
        (col("id") * 7919L % 1000003L).as("v"),
        col("id").as("rid"))
      time(f"topKAgg      n=$n") {
        noop(df.groupBy(col("g"))
          .agg(TopKAgg.topK(5)(col("v"), col("rid")).as("top")))
      }
      if (n <= 20000000L) time(f"windowRank   n=$n") {
        noop(df.withColumn("r", row_number().over(
            Window.partitionBy(col("g"))
              .orderBy(col("v").desc, col("rid"))))
          .filter(col("r") <= 5))
      }
    }

    // --- gramMatrix: one-pass d=16 accumulate ---------------------------
    for (n <- Seq(250000L, 1000000L, 4000000L)) {
      val vecs = spark.range(n).select(expr(
        """transform(sequence(1, 16),
          |  i -> CAST((id * i * 2654435761) % 2000 - 1000 AS DOUBLE)
          |       / 1000.0D)""".stripMargin).as("embedding"))
      time(f"gramMatrix   n=$n")(
        noop(Similarity.gramMatrix(vecs, "embedding", dims = 16)))
    }

    // --- kcore: 6 sweeps on ~E edges, skewed degrees --------------------
    for (e <- Seq(1000000L, 4000000L, 16000000L)) {
      val edges = spark.range(e).select(
        (col("id") % (e / 8L)).as("src"),
        ((col("id") * 31L + col("id") % 97L) % (e / 8L)).as("dst"))
        .filter(col("src") =!= col("dst"))
      time(f"kcore6       e=$e")(
        noop(Graph.kcore(edges, k = 8, sweeps = 6)))
    }

    // --- zone map: pruned read vs full scan -----------------------------
    val dir = java.nio.file.Files.createTempDirectory("stress9_zm")
      .toString + "/t"
    spark.range(40000000L).select(col("id").as("k"),
        (col("id") % 1000L).as("g"))
      .repartitionByRange(64, col("k")).write.parquet(dir)
    val idx = Layout.zoneMapIndex(spark.read.parquet(dir), "k")
      .localCheckpoint()
    time("zonePruned   n=40M") {
      val (pruned, scanned, total) = Layout.zoneMapRead(
        spark, idx, "k", lit(1000000L), lit(1500000L))
      noop(pruned.groupBy(col("g")).agg(count(lit(1)).as("n")))
      println(s"STRESS9 zoneFiles scanned=$scanned total=$total")
    }
    time("fullScan     n=40M") {
      noop(spark.read.parquet(dir)
        .filter(col("k") >= 1000000L && col("k") <= 1500000L)
        .groupBy(col("g")).agg(count(lit(1)).as("n")))
    }

    spark.stop()
  }
}
