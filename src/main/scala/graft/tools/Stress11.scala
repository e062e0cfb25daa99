// scratch scaling-slope probe (not part of the library)
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Round-9 stress: one decade up on the ANN family, which Stress10 did
  * not cover — (a) MinHash-LSH banded near-dup pair generation over
  * synthetic documents with 1% planted near-duplicates AND a boilerplate
  * fraction (the band-key-skew suspect from q124's fat-tail audit);
  * (b) IVF-PQ asymmetric-distance top-k over synthetic 64-dim embeddings
  * (64 queries, corpus scales).
  *
  * Docs 100k / 300k / 1M rows, embeddings 100k / 300k / 1M vectors.
  * Usage: runMain graft.tools.Stress11
  */
object Stress11 {

  private def time[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    println(f"STRESS11 $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
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

    // synthetic corpus: ~12 words from a 5k vocab; doc ids ending in 9
    // copy their predecessor with one word changed (planted near-dups);
    // 5% of docs share ONE boilerplate sentence (band-key skew pressure)
    def docs(n: Long): DataFrame = {
      val word = (j: Int) =>
        concat(lit("w"), pmod(xxhash64(col("base"), lit(j)), lit(5000L)))
      val body = concat_ws(" ", (0 until 12).map(word): _*)
      spark.range(n).select(
        col("id").as("doc_id"),
        when(col("id") % 20L === 0L,
             lit("the quick brown fox jumps over the lazy dog again and again"))
          .otherwise(lit(null)).as("boiler"),
        when(col("id") % 10L === 9L, col("id") - 1L).otherwise(col("id"))
          .as("base"))
        .select(col("doc_id"),
                concat_ws(" ",
                  coalesce(col("boiler"), lit("")),
                  body,
                  when(col("doc_id") % 10L === 9L,
                       concat(lit("x"), col("doc_id"))).otherwise(lit("")))
                  .as("text"))
        .localCheckpoint(false)
    }

    for (n <- Seq(100000L, 300000L, 1000000L)) {
      val d = time(f"docs build        n=$n") { val x = docs(n); x.count(); x }
      time(f"minhashLshPairs   n=$n") {
        noop(Dedup.minhashLshPairs(d, "doc_id", "text"))
      }
      time(f"minhashBandStats  n=$n") {
        noop(Dedup.minhashLshBandingStats(d, "doc_id", "text"))
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    // fat-bucket probe: 20% of docs are literally IDENTICAL text, so all
    // their band keys agree — at n=1M that is a 200k-doc bucket per band,
    // 2e10 candidate pairs without the maxBucket guard (job death); with
    // it the bucket is dropped before the self-join and the planted
    // near-dups still pair through their own bands.
    def boilerDocs(n: Long): DataFrame = {
      val word = (j: Int) =>
        concat(lit("w"), pmod(xxhash64(col("id"), lit(j)), lit(5000L)))
      val body = concat_ws(" ", (0 until 12).map(word): _*)
      spark.range(n).select(
        col("id").as("doc_id"),
        when(col("id") % 5L === 0L,
             lit("lorem ipsum dolor sit amet the same page template " +
                 "every single time"))
          .otherwise(body).as("text"))
        .localCheckpoint(false)
    }
    for (n <- Seq(1000000L)) {
      val d = time(f"boilerDocs build  n=$n") {
        val x = boilerDocs(n); x.count(); x
      }
      time(f"minhashBoiler     n=$n") {
        noop(Dedup.minhashLshPairs(d, "doc_id", "text"))
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    // synthetic embeddings: 64-dim floats in [-1, 1), deterministic
    def embs(n: Long): DataFrame =
      spark.range(n).select(
        col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)),
          i => (pmod(xxhash64(col("id"), i), lit(2000L)).cast("double")
                  / 1000.0 - 1.0).cast("float")).as("embedding"))
        .localCheckpoint(false)

    for (n <- Seq(100000L, 300000L, 1000000L)) {
      val e = time(f"embs build        n=$n") { val x = embs(n); x.count(); x }
      val q = e.filter(col("vec_id") < 64L)
      time(f"ivfPqTopK         n=$n") {
        noop(Similarity.ivfPqTopK(q, e, "vec_id", "embedding"))
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    spark.stop()
  }
}
