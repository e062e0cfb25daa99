// scratch publish-cost split probe (not part of the library)
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Round-14 probe (r13 verdict task 5): WHERE do q793's publish seconds
  * go for a tiny (<3k-doc) signature store? r13's instrumented split said
  * 3.7 s of 4.6 is "partitioned-write commit machinery" — this splits it
  * further: signature COMPUTE (tokenize→minhash→band explode),
  * per-publish fixed cost across bucket counts (1/4/16), the vacuum, and
  * the probe itself, so the fast-path lever (fewer buckets? fewer write
  * partitions? skip the sort?) is chosen from measurement, not guess.
  */
object Stress17 {
  private def time[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    println(f"STRESS17 $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
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
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text"))
    val corpus = d.filter(col("doc_id") % 3 =!= 0 && col("doc_id") < 3000)
      .repartition(16)
    val delta = d.filter(col("doc_id").isin(1L, 2L, 4L))
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    // signature compute alone (no write): the corpus pipeline the publish
    // must run regardless of layout
    time("compute-only corpus signatures") {
      val toks = corpus.select(col("doc_id"),
        Dedup.shingles(graft.operators.TextAnalysis.tokens(col("text")), 3)
          .as("_shs"))
      toks.select(col("doc_id"),
        graft.functions.MinHashBands(col("_shs"), 4, 3).as("_bands"))
        .write.format("noop").mode("overwrite").save()
    }
    for (rep <- 1 to 2; nb <- Seq(16, 4, 1); sorted <- Seq(true, false)) {
      val root = s"/tmp/stress17/nb${nb}_s$sorted"
      new java.io.File(root).getParentFile.mkdirs()
      time(f"publish rep=$rep nb=$nb sorted=$sorted") {
        Dedup.signatureTable(spark, corpus, "doc_id", "text", root,
                             numBuckets = nb, sortByBandKey = sorted)
      }
      time(f"probe   rep=$rep nb=$nb sorted=$sorted") {
        val n = Dedup.incrementalPairs(spark, delta, root, "doc_id", "text")
          .count()
        println(s"STRESS17 pairs nb=$nb sorted=$sorted found=$n")
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
