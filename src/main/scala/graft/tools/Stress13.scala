// scratch scaling-slope probe (not part of the library)
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{ScdConfig, ScdEngine}
import graft.operators.Dedup

/** Round-11 stress, the three slopes the round-10 verdict asked for:
  *
  *  (a) RECALL cost of the LSH candidate-pair budget: Stress12's corpus
  *      plants ground-truth near-dup pairs (doc i copies doc i-1 when
  *      i%10==9), so planted-pair recall is measurable budget-ON vs
  *      budget-OFF at 1M/3M (OFF at 10M is the documented r9 ENOSPC
  *      death — not re-run). ON now degrades over-budget buckets to a
  *      spanning path instead of dropping them.
  *
  *  (b) Apriori (q698 shape) decade-up at 10x/100x basket volume: cost
  *      must track surviving-candidates x baskets, not baskets² — the L2
  *      prune is the scale design; disclose candidate counts per decade.
  *
  *  (c) SCD bucketed merge decade-up: fixed-size bucket-local batch vs
  *      1M/10M/100M-row histories (buckets sized ~constant rows, so the
  *      touched-bucket rewrite cost is flat); one uniform-key batch per
  *      decade to disclose the other regime (touches every bucket →
  *      cost ∝ history); one widening merge (deliberate full rewrite).
  *
  * Usage: runMain graft.tools.Stress13 [recall|apriori|scd]
  */
object Stress13 {

  private def time[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    println(f"STRESS13 $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
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

    // Stress11/12 corpus recipe, verbatim: 1% planted near-dups via
    // predecessor copy (i%10==9 → body(i-1) + distinct suffix), 5%
    // boilerplate sentence — the planted pairs ARE the ground truth.
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

    if (which == "all" || which == "recall") {
      // planted truth: (i-1, i) for i % 10 == 9
      def truth(n: Long): DataFrame =
        spark.range(n).filter(col("id") % 10L === 9L)
          .select((col("id") - 1L).as("doc_a"), col("id").as("doc_b"))

      def verified(d: DataFrame, factor: Long): DataFrame =
        Dedup.candidatesWithOverlap(d, "doc_id", "text", 3, 4, 3,
                                    Dedup.DefaultMaxBucket, factor)
          .filter(col("overlap") * 2 >= col("union_size")) // τ = 1/2
          .select("doc_a", "doc_b")

      def recallRow(n: Long, label: String, factor: Long): Unit = {
        val d = docs(n)
        val t = truth(n).cache(); val nTruth = t.count()
        time(f"recall $label n=$n") {
          val found = verified(d, factor).join(t, Seq("doc_a", "doc_b"),
                                               "left_semi").count()
          println(s"STRESS13 recall $label n=$n planted=$nTruth " +
            s"found=$found recall_ppm=${found * 1000000L / nTruth}")
        }
        t.unpersist()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }

      val off = 1L << 32
      for (n <- Seq(1000000L, 3000000L)) {
        recallRow(n, "budget_on ", Dedup.PairBudgetFactor.toLong)
        recallRow(n, "budget_off", off)
      }
      // 10M budget-off is the documented r9 death (80 GB spill → ENOSPC);
      // budget-on only.
      recallRow(10000000L, "budget_on ", Dedup.PairBudgetFactor.toLong)
    }

    if (which == "all" || which == "apriori") {
      // q698-shaped baskets: ~6 draws per basket over a 25-item vocabulary
      // with a triangular skew (item b has weight ∝ 2b+1) so the support
      // threshold splits the pair space exactly like the gate query's
      // brand distribution does.
      def baskets(nOrders: Long): DataFrame =
        spark.range(nOrders).select(col("id").as("ok"),
          explode(array((0 until 6).map(j =>
            floor(sqrt(pmod(xxhash64(col("id"), lit(j)), lit(625L))
              .cast("double"))).cast("bigint")): _*)).as("b"))
          .distinct()
          .localCheckpoint(false)

      def apriori(bk: DataFrame): DataFrame = {
        val n = bk.agg(countDistinct(col("ok")).as("_n_orders"))
        val l2 = bk.as("a")
          .join(bk.as("b"), col("a.ok") === col("b.ok") && col("a.b") < col("b.b"))
          .groupBy(col("a.b").as("b1"), col("b.b").as("b2"))
          .agg(count(lit(1)).as("sup"))
          .crossJoin(broadcast(n))
          .filter(col("sup") * 250 >= col("_n_orders"))
          .select(col("b1"), col("b2")).localCheckpoint(false)
        val cand = l2.as("p")
          .join(l2.as("q"),
                col("p.b1") === col("q.b1") && col("p.b2") < col("q.b2"))
          .select(col("p.b1").as("b1"), col("p.b2").as("b2"),
                  col("q.b2").as("b3"))
          .join(l2.select(col("b1").as("_rb1"), col("b2").as("_rb2")),
                col("b2") === col("_rb1") && col("b3") === col("_rb2"),
                "left_semi")
          .localCheckpoint(false)
        println(s"STRESS13 apriori l2=${l2.count()} cand_triples=${cand.count()}")
        bk.as("x").join(broadcast(cand), col("x.b") === col("b1"))
          .join(bk.as("y"),
                col("x.ok") === col("y.ok") && col("y.b") === col("b2"))
          .join(bk.as("z"),
                col("x.ok") === col("z.ok") && col("z.b") === col("b3"))
          .groupBy(col("b1"), col("b2"), col("b3"))
          .agg(count(lit(1)).as("support"))
          .crossJoin(broadcast(n))
          .filter(col("support") * 250 >= col("_n_orders"))
      }

      for (nOrders <- Seq(150000L, 1500000L, 15000000L)) {
        val bk = time(f"apriori baskets build n=$nOrders") {
          val x = baskets(nOrders); x.count(); x
        }
        time(f"apriori triples  n=$nOrders") { noop(apriori(bk)) }
      }
    }

    if (which == "all" || which == "scd") {
      val base = "/tmp/stress13_scd"
      val cfg = ScdConfig(uniqueKey = Seq("id"), updatedAtCol = "updated_at")
      val cfgWiden = cfg.copy(onSchemaChange = "append_new_columns")

      def history(h: Long): DataFrame =
        spark.range(h).select(col("id"),
          concat(lit("name"), pmod(col("id"), lit(97L))).as("name"),
          (col("id") % 1000L).as("v"),
          lit("2025-01-01 00:00:00").cast("timestamp").as("updated_at"))

      // batch of `k` keys confined to buckets 0..7 of an n-bucket table —
      // the bucket-LOCAL regime the pruned rewrite is built for
      def localBatch(h: Long, n: Int, k: Long): DataFrame =
        spark.range(h)
          .filter(ScdEngine.bucketOf(Seq("id"), n) < lit(8))
          .limit(k.toInt)
          .select(col("id"),
            concat(lit("renamed"), col("id")).as("name"),
            (col("id") % 1000L + 1L).as("v"),
            lit("2025-02-01 00:00:00").cast("timestamp").as("updated_at"))
          .localCheckpoint(false)

      // uniform-key batch: touches every bucket (the disclosed other regime)
      def uniformBatch(h: Long, k: Long): DataFrame =
        spark.range(k).select((col("id") * (h / k)).as("id"),
          concat(lit("moved"), col("id")).as("name"),
          (col("id") % 1000L + 2L).as("v"),
          lit("2025-03-01 00:00:00").cast("timestamp").as("updated_at"))
          .localCheckpoint(false)

      for ((h, n) <- Seq((1000000L, 8), (10000000L, 80), (100000000L, 800))) {
        val path = s"$base/h$h"
        new java.io.File(path).getParentFile.mkdirs()
        time(f"scd initial       h=$h buckets=$n") {
          ScdEngine.run(spark, history(h), path, cfg, numBuckets = Some(n))
        }
        val lb = localBatch(h, n, 10000L); lb.count()
        time(f"scd local-batch   h=$h buckets=$n batch=10k") {
          ScdEngine.run(spark, lb, path, cfg, numBuckets = Some(n))
        }
        val ub = uniformBatch(h, 10000L); ub.count()
        time(f"scd uniform-batch h=$h buckets=$n batch=10k") {
          ScdEngine.run(spark, ub, path, cfg, numBuckets = Some(n))
        }
        if (h == 10000000L) {
          val wb = lb.withColumn("extra", lit("w"))
            .withColumn("updated_at",
              lit("2025-04-01 00:00:00").cast("timestamp"))
          time(f"scd widening      h=$h buckets=$n batch=10k (full rewrite)") {
            ScdEngine.run(spark, wb, path, cfgWiden, numBuckets = Some(n))
          }
        }
      }
    }

    spark.stop()
  }
}
