package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Profile
import graft.plans.NativeAsOf

/** Round-7 stress: scale slopes for cumSumByValue (vs the naive global
  * window it replaces) and the native as-of join (vs the quadratic
  * containment join it replaces). Synthetic inputs via `spark.range` so
  * sizes decade up without new test data.
  *
  * Usage: runMain graft.tools.Stress8
  */
object Stress8 {

  private def time[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    println(f"STRESS8 $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
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

    // --- cumSumByValue: two-phase cell plan vs single-partition window ---
    for (n <- Seq(1000000L, 10000000L, 40000000L)) {
      val vals = spark.range(n).select(
        (col("id") * 7L % (n * 13L)).as("v"),
        (col("id") % 1000L).as("m"))
        .groupBy("v").agg(sum(col("m")).as("m")) // distinct-value contract
      time(f"cumSumByValue n=$n")(
        noop(Profile.cumSumByValue(vals, "v", Seq("m"))))
      if (n <= 10000000L) {
        val w = Window.orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        time(f"naiveGlobalWindow n=$n")(
          noop(vals.withColumn("cum_m", sum(col("m")).over(w))))
      }
    }

    // --- native as-of: linear merge vs containment theta join ----------
    def dim(keys: Long, versions: Long) = spark.range(keys * versions)
      .select((col("id") % keys).as("dk"),
              (col("id") / keys * 100L).as("dts"),
              (col("id") * 31L % 997L).as("dv"))
    def fact(rows: Long, keys: Long) = spark.range(rows)
      .select((col("id") % keys).as("fk"),
              (col("id") * 17L % 2000L).as("fts"))
    for (rows <- Seq(1000000L, 5000000L, 20000000L)) {
      val keys = 10000L
      val f = fact(rows, keys)
      val d = dim(keys, 20L)
      time(f"nativeAsOf facts=$rows")(
        noop(NativeAsOf.join(f, d, Seq("fk" -> "dk"), "fts", "dts")))
      if (rows <= 5000000L) {
        // the reference formulation: containment join + pick max dts
        val w = Window.partitionBy(col("fk"), col("fts"), col("_fid"))
          .orderBy(col("dts").desc)
        time(f"containmentJoin facts=$rows")(
          noop(f.withColumn("_fid", monotonically_increasing_id())
            .join(d, col("fk") === col("dk") && col("dts") <= col("fts"),
                  "left")
            .withColumn("_rn", row_number().over(w))
            .filter(col("_rn") === 1)))
      }
    }
    spark.stop()
  }
}
