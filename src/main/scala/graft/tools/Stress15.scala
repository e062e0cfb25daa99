// scratch scaling-slope probe (not part of the library)
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Round-12 stress: delta-run cost of the PERSISTED-signature incremental
  * dedup path (q763, r11 verdict task 4) across a corpus decade.
  *
  * Claim under test: with the corpus MinHash signatures stored as a
  * `_sig_bucket`-partitioned VersionedTable, an incoming delta's dedup
  * cost depends on the DELTA (its band keys name the partitions probed),
  * not on the corpus size — the property that makes daily ingest at
  * 100 TB affordable. Probe: build signature tables over the Stress11/12
  * planted-near-dup corpus at 1 M and 10 M docs (publish cost reported —
  * it is the one-off corpus pass), then run the SAME 10k-doc delta
  * against both and compare delta-run wall time and found-pair counts
  * (the planted pairs make the expected matches known: delta doc i with
  * i%10==9 copies corpus doc i−1).
  */
object Stress15 {

  private def time[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    println(f"STRESS15 $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("all")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Stress11/12 corpus recipe, verbatim (see Stress13).
    def docs(n: Long, idOffset: Long = 0L): DataFrame = {
      val word = (j: Int) =>
        concat(lit("w"), pmod(xxhash64(col("base"), lit(j)), lit(5000L)))
      val body = concat_ws(" ", (0 until 12).map(word): _*)
      spark.range(n).select(
        (col("id") + idOffset).as("doc_id"),
        when(col("id") % 20L === 0L,
             lit("the quick brown fox jumps over the lazy dog again and again"))
          .otherwise(lit(null)).as("boiler"),
        when(col("id") % 10L === 9L, col("id") - 1L).otherwise(col("id"))
          .as("base"))
        .select(col("doc_id"),
                concat_ws(" ",
                  coalesce(col("boiler"), lit("")),
                  body,
                  when(pmod(col("doc_id"), lit(10L)) === 9L,
                       concat(lit("x"), col("doc_id"))).otherwise(lit("")))
                  .as("text"))
        .localCheckpoint(false)
    }

    // The delta: 10k fresh docs, 10% of which copy a corpus doc's body
    // (base = i-1 with i%10==9 lands on a corpus doc for i < 1M) — same
    // generator, ids offset far above any corpus id so the pair counts
    // are delta-vs-corpus only.
    def delta(k: Long): DataFrame = docs(k, idOffset = 1000000000L)

    // Standalone reference point: the q739-shape full recompute at 10 M
    // (what the stored table must beat for a diverse delta).
    if (which == "recompute10m") {
      time(f"delta RECOMPUTE    corpus=10000000 delta=10k (q739 shape)") {
        val found = Dedup
          .minhashLshPairsAgainst(docs(10000000L), delta(10000L),
                                  "doc_id", "text").count()
        println(s"STRESS15 recompute pairs corpus=10000000 found=$found")
      }
      spark.stop()
      return
    }

    for (n <- Seq(1000000L, 10000000L)) {
      val root = s"/tmp/stress15_sig/n$n"
      new java.io.File(root).getParentFile.mkdirs()
      val d = docs(n)
      time(f"signature publish  corpus=$n") {
        Dedup.signatureTable(spark, d, "doc_id", "text", root)
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      val dl = delta(10000L); dl.count()
      time(f"delta incremental  corpus=$n delta=10k") {
        val pairs = Dedup.incrementalPairs(spark, dl, root, "doc_id", "text")
        val found = pairs.count()
        println(s"STRESS15 pairs corpus=$n delta=10k found=$found")
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      // reference: the self-contained recompute path (q739 shape) pays
      // the full corpus signature pipeline per run — the cost the stored
      // table amortizes away; run at 1M only (10M recompute is the known
      // 227 s Stress13 decade point). FRESH relations: the global
      // unpersist above released the prior localCheckpoint blocks.
      if (n == 1000000L)
        time(f"delta RECOMPUTE    corpus=$n delta=10k (q739 shape)") {
          val found = Dedup
            .minhashLshPairsAgainst(docs(n), delta(10000L),
                                    "doc_id", "text").count()
          println(s"STRESS15 recompute pairs corpus=$n found=$found")
        }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
