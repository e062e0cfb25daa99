package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Graph}
import graft.sources.Tables

/** Round-6 CC-algorithm probe: large-star/small-star contraction vs plain
  * min-label propagation on CHAIN graphs — the worst case for propagation
  * (rounds = diameter) and the motivating case for the star algorithm
  * (rounds = O(log² n)). Also times both on the real co-purchase graph.
  * Usage: runMain graft.tools.Stress7 [sfDir]
  */
object Stress7 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(label: String)(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      val n = df.count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[stress7] $label%-34s $s%8.2f s  ($n rows)")
      s
    }

    def chain(n: Long): DataFrame =
      spark.range(0, n - 1).select(col("id").as("doc_a"),
                                   (col("id") + 1).as("doc_b"))

    // Chain 256: propagation needs ~256 rounds, star ~log²(256).
    val c256 = chain(256).localCheckpoint()
    time("star  CC chain n=256")(
      Graph.connectedComponentsStar(c256, "doc_a", "doc_b", maxRounds = 30))
    time("label CC chain n=256 (diameter rounds)")(
      Dedup.clusterPairs(c256, smallGraphEdges = 0))

    // Chain 100k: label propagation is infeasible (1e5 shuffle rounds);
    // the star contraction must still converge in ~a dozen rounds.
    val c100k = chain(100000).localCheckpoint()
    time("star  CC chain n=100000")(
      Graph.connectedComponentsStar(c100k, "doc_a", "doc_b", maxRounds = 40))

    // Real graph: strong co-purchase edges at this SF — shallow diameter,
    // both algorithms converge fast; star must not be pathologically
    // slower on the EASY case.
    val p = Graph.coOccurrenceEdges(
      Tables.spread(spark, Tables.read(spark, sfDir, "lineitem")),
      groupCol = "l_orderkey", itemCol = "l_partkey", minCount = 2)
      .localCheckpoint()
    time("star  CC co-purchase")(
      Graph.connectedComponentsStar(p, "src", "dst"))
    time("label CC co-purchase (forced distributed)")(
      Dedup.clusterPairs(p, "src", "dst", smallGraphEdges = 0))

    spark.stop()
  }
}
