package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r15 split-store diagnosis: time the signature-store PUBLISH and the
  * delta PROBE separately at the q763 gate shape (sf0.1 documents,
  * corpus = 2/3, delta = 1/3), so the split layout's publish machinery
  * and its thin-index probe can be attributed independently.
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.Stress18 [reps]
  */
object Stress18 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = graft.sources.Tables.read(spark, sfDir, "documents")
    val corpus = d.filter(col("doc_id") % 3 =!= 0)
    val delta = d.filter(col("doc_id") % 3 === 0)
    val root = graft.operators.Dedup.sigRoot("stress18", sfDir)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[s18] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    for (rep <- 1 to reps) {
      println(s"[s18] --- rep $rep ---")
      t("publish")(graft.operators.Dedup.signatureTable(
        spark, corpus, "doc_id", "text", root))
      t("probe") {
        graft.operators.Dedup.incrementalPairs(
          spark, delta, root, "doc_id", "text")
          .write.format("noop").mode("overwrite").save()
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
