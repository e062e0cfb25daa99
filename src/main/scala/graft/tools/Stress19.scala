// scratch A/B probe for the r15 split-store publish (not part of the library)
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Times ONE 10M-doc signature-store publish (Stress16 corpus recipe)
  * plus a diverse 10k-delta probe against it — run on both sides of the
  * split-layout change for the same-box A/B the 1M grid cannot settle.
  * Usage: runMain graft.tools.Stress19 [n]
  */
object Stress19 {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def docs(nn: Long, idOffset: Long = 0L): DataFrame = {
      val word = (j: Int) =>
        concat(lit("w"), pmod(xxhash64(col("base"), lit(j)), lit(5000L)))
      val body = concat_ws(" ", (0 until 12).map(word): _*)
      spark.range(nn).select(
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
    val root = s"/tmp/stress19_sig/n$n"
    new java.io.File(root).getParentFile.mkdirs()
    def rmrf(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmrf)); f.delete(); ()
    }
    rmrf(new java.io.File(root))
    val d = docs(n)
    val t0 = System.nanoTime()
    Dedup.signatureTable(spark, d, "doc_id", "text", root)
    println(f"STRESS19 publish n=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    val delta = docs(10000L, idOffset = 1000000000L)
    delta.count()
    val t1 = System.nanoTime()
    val found = Dedup.incrementalPairs(spark, delta, root, "doc_id", "text")
      .count()
    println(f"STRESS19 delta n=$n pairs=$found ${(System.nanoTime() - t1) / 1e9}%.2f s")
    def du(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).map(_.map(du).sum).getOrElse(0L)
    println(s"STRESS19 bytes total=${du(new java.io.File(root))}")
    spark.stop()
  }
}
