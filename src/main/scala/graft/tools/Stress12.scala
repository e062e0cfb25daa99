// scratch scaling-slope probe (not part of the library)
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Graph}

/** Round-10 stress, the two slopes the round-9 verdict asked for:
  *
  *  (a) MinHash-LSH ONE MORE DECADE (1M → 3M → 10M docs): Stress11's
  *      300k→1M marginal slope was 4.3× time for 3.3× data — super-linear
  *      from candidate-pair growth. This decade tells whether the
  *      maxBucket guard bends it back toward linear or a candidate-pair
  *      budget is needed.
  *
  *  (b) betweennessSampled: cost must scale with the PIVOT count k, not
  *      |V| — k sweep at fixed |V|, then |V| sweep at fixed k (the
  *      sampled estimator's whole point vs q659's |V|³ exact join).
  *
  * Usage: runMain graft.tools.Stress12 [minhash|bc]
  */
object Stress12 {

  private def time[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    println(f"STRESS12 $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
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

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // same corpus recipe as Stress11 (1% planted near-dups via
    // predecessor copy, 5% boilerplate sentence) so the decades chain
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

    if (which == "all" || which == "minhash") {
      val sizes = args.drop(1).headOption
        .map(_.split(",").toSeq.map(_.trim.toLong))
        .getOrElse(Seq(1000000L, 3000000L, 10000000L))
      for (n <- sizes) {
        val d = time(f"docs build       n=$n") { val x = docs(n); x.count(); x }
        time(f"minhashLshPairs  n=$n") {
          noop(Dedup.minhashLshPairs(d, "doc_id", "text"))
        }
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
    }

    if (which == "all" || which == "bc") {
      // random graph, mean undirected degree ~8 (xxhash64 endpoints);
      // diameter ~ log |V|, so the BFS sweep count barely moves with |V|
      def graph(v: Long): DataFrame =
        spark.range(v * 4)
          .select(pmod(col("id"), lit(v)).as("src"),
                  pmod(xxhash64(col("id"), lit(42)), lit(v)).as("dst"))
          .filter(col("src") =!= col("dst"))
          .localCheckpoint(false)

      for (k <- Seq(4, 8, 16)) {
        val g = graph(30000L)
        time(f"bcSampled |V|=30k   k=$k%2d") {
          noop(Graph.betweennessSampled(g, k))
        }
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
      for (v <- Seq(10000L, 30000L, 100000L)) {
        val g = graph(v)
        time(f"bcSampled k=8  |V|=$v") {
          noop(Graph.betweennessSampled(g, 8))
        }
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
    }

    spark.stop()
  }
}
