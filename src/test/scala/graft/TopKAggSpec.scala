package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TopKAgg

/** Typed top-k Aggregator: partition-layout-independent equality with the
  * window-rank formulation it replaces, short-group and tie handling.
  */
class TopKAggSpec extends SparkTestBase {

  import spark.implicits._

  test("topK == window rank under several partition layouts, incl. ties") {
    val rnd = new scala.util.Random(41)
    val rows = (1 to 400).map { i =>
      (s"g${rnd.nextInt(5)}", rnd.nextInt(20).toLong, i.toLong)
    }
    for (parts <- Seq(1, 3, 13); k <- Seq(1, 4, 1000)) {
      val df = rows.toDF("g", "v", "id").repartition(parts)
      val got = df.groupBy(col("g"))
        .agg(TopKAgg.topK(k)(col("v"), col("id")).as("top"))
        .select(col("g"), posexplode(col("top")).as(Seq("idx", "e")))
        .select(col("g"), (col("idx") + 1).as("rank"),
                col("e._1").as("v"), col("e._2").as("id"))
        .collect().map(r => (r.getString(0), r.getInt(1),
                             r.getLong(2), r.getLong(3))).toSet
      val want = df
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("g"))
            .orderBy(col("v").desc, col("id"))))
        .filter(col("rank") <= k)
        .select("g", "rank", "v", "id")
        .collect().map(r => (r.getString(0), r.getInt(1),
                             r.getLong(2), r.getLong(3))).toSet
      assert(got === want, s"parts=$parts k=$k")
    }
  }

  test("reduce keeps the buffer bounded and sorted") {
    val agg = new graft.functions.TopKAgg(2)
    val b = Seq((10L, 1L), (9L, 2L), (9L, 3L), (11L, 4L))
      .foldLeft(agg.zero)(agg.reduce)
    assert(b === Seq((11L, 4L), (10L, 1L)))
    val m = agg.merge(b, Seq((12L, 9L), (1L, 0L)))
    assert(m === Seq((12L, 9L), (11L, 4L)))
  }
}
