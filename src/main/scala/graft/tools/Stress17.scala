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
    // signature compute alone (no write), broken down stage by stage: the
    // corpus pipeline the publish must run regardless of layout
    time("stage scan+filter+repartition") {
      corpus.write.format("noop").mode("overwrite").save()
    }
    time("stage +tokenize+shingles") {
      corpus.select(col("doc_id"),
        Dedup.shingles(graft.operators.TextAnalysis.tokens(col("text")), 3)
          .as("_shs"))
        .write.format("noop").mode("overwrite").save()
    }
    time("compute-only corpus signatures") {
      val toks = corpus.select(col("doc_id"),
        Dedup.shingles(graft.operators.TextAnalysis.tokens(col("text")), 3)
          .as("_shs"))
      toks.select(col("doc_id"),
        graft.functions.MinHashBands(col("_shs"), 4, 3).as("_bands"))
        .write.format("noop").mode("overwrite").save()
    }
    time("compute rep2") {
      val toks = corpus.select(col("doc_id"),
        Dedup.shingles(graft.operators.TextAnalysis.tokens(col("text")), 3)
          .as("_shs"))
      toks.select(col("doc_id"),
        graft.functions.MinHashBands(col("_shs"), 4, 3).as("_bands"))
        .write.format("noop").mode("overwrite").save()
    }
    // the FULL publish row relation (band-exploded, shingles riding every
    // row), written raw to plain parquet vs just materialized — separates
    // "parquet-encoding the fat rows" from "VersionedTable machinery"
    locally {
      val withSh = corpus.select(col("doc_id").as("_id"),
        Dedup.shingles(graft.operators.TextAnalysis.tokens(col("text")), 3)
          .as("_shs"))
      val rowsDf = withSh
        .select(col("_id"), col("_shs"),
                graft.functions.MinHashBands(col("_shs"), 4, 3).as("_bands"))
        .select(col("_id"), col("_shs"),
                posexplode(col("_bands")).as(Seq("_pos", "_band")))
        .select(col("_id"), col("_shs"),
                concat(col("_pos").cast("string"), lit(":"), col("_band"))
                  .as("_bk"))
        .withColumn("_n", size(col("_shs")).cast("long"))
        .crossJoin(broadcast(
          corpus.select(col("doc_id")).agg(count(lit(1)).as("_ndocs"))))
        .withColumn("_sig_bucket", pmod(hash(col("_bk")), lit(16)))
      for (rep <- 1 to 2) {
        time(f"full rows noop rep=$rep") {
          rowsDf.write.format("noop").mode("overwrite").save()
        }
        time(f"full rows raw parquet rep=$rep") {
          rowsDf.repartition(col("_sig_bucket")).write
            .mode("overwrite").parquet(s"/tmp/stress17/raw_$rep")
        }
      }
      // how many times does the shingle pipeline appear in the plan?
      val plan = rowsDf.queryExecution.executedPlan.toString
      println(s"STRESS17 plan minhash_bands refs=" +
        "minhash_bands".r.findAllIn(plan).size +
        " shingle-transform refs=" + "transform\\(".r.findAllIn(plan).size)
      // barrier variant: exchange between the shingle projection and the
      // band projection prevents CollapseProject from duplicating the
      // shingle pipeline per consumer
      val withShB = corpus.select(col("doc_id").as("_id"),
        Dedup.shingles(graft.operators.TextAnalysis.tokens(col("text")), 3)
          .as("_shs"))
        .repartition(16, col("_id"))
      val rowsB = withShB
        .select(col("_id"), col("_shs"),
                graft.functions.MinHashBands(col("_shs"), 4, 3).as("_bands"))
        .select(col("_id"), col("_shs"),
                posexplode(col("_bands")).as(Seq("_pos", "_band")))
        .select(col("_id"), col("_shs"),
                concat(col("_pos").cast("string"), lit(":"), col("_band"))
                  .as("_bk"))
        .withColumn("_n", size(col("_shs")).cast("long"))
        .crossJoin(broadcast(
          corpus.select(col("doc_id")).agg(count(lit(1)).as("_ndocs"))))
        .withColumn("_sig_bucket", pmod(hash(col("_bk")), lit(16)))
      for (rep <- 1 to 2)
        time(f"BARRIER rows noop rep=$rep") {
          rowsB.write.format("noop").mode("overwrite").save()
        }
      // stringify BEFORE the explode: one flat string rides the x4 band
      // duplication instead of a 300-element string array
      val rowsS = withSh
        .select(col("_id"),
                concat_ws("\n", col("_shs")).as("_shs_str"),
                size(col("_shs")).cast("long").as("_n"),
                graft.functions.MinHashBands(col("_shs"), 4, 3).as("_bands"))
        .select(col("_id"), col("_shs_str"), col("_n"),
                posexplode(col("_bands")).as(Seq("_pos", "_band")))
        .select(col("_id"), col("_shs_str"), col("_n"),
                concat(col("_pos").cast("string"), lit(":"), col("_band"))
                  .as("_bk"))
        .crossJoin(broadcast(
          corpus.select(col("doc_id")).agg(count(lit(1)).as("_ndocs"))))
        .withColumn("_sig_bucket", pmod(hash(col("_bk")), lit(16)))
      for (rep <- 1 to 2) {
        time(f"PRE-STRINGIFIED rows noop rep=$rep") {
          rowsS.write.format("noop").mode("overwrite").save()
        }
        time(f"PRE-STRINGIFIED raw parquet rep=$rep") {
          rowsS.repartition(col("_sig_bucket")).write
            .mode("overwrite").parquet(s"/tmp/stress17/rawpre_$rep")
        }
      }
      // isolate the cost of OUTPUTTING the shingle array itself
      for (rep <- 1 to 2) {
        time(f"withSh array-out noop rep=$rep") {
          withSh.write.format("noop").mode("overwrite").save()
        }
        time(f"withSh id-only noop rep=$rep") {
          withSh.select(col("_id")).write.format("noop")
            .mode("overwrite").save()
        }
        time(f"shingle ROWS noop rep=$rep") {
          corpus.select(col("doc_id").as("_id"),
            explode(Dedup.shingles(
              graft.operators.TextAnalysis.tokens(col("text")), 3))
              .as("_sh"))
            .write.format("noop").mode("overwrite").save()
        }
        time(f"withSh strjoin-out noop rep=$rep") {
          withSh.select(col("_id"), concat_ws("\n", col("_shs")).as("_s"))
            .write.format("noop").mode("overwrite").save()
        }
        val stepA = withSh.select(col("_id"), col("_shs"),
          graft.functions.MinHashBands(col("_shs"), 4, 3).as("_bands"))
        time(f"stepA shs+bands noop rep=$rep") {
          stepA.write.format("noop").mode("overwrite").save()
        }
        val stepB = stepA.select(col("_id"), col("_shs"),
          posexplode(col("_bands")).as(Seq("_pos", "_band")))
        time(f"stepB +explode noop rep=$rep") {
          stepB.write.format("noop").mode("overwrite").save()
        }
        val stepC = stepB.select(col("_id"), col("_shs"),
            concat(col("_pos").cast("string"), lit(":"), col("_band"))
              .as("_bk"))
          .withColumn("_n", size(col("_shs")).cast("long"))
        time(f"stepC +bk+n noop rep=$rep") {
          stepC.write.format("noop").mode("overwrite").save()
        }
        val stepD = stepC.crossJoin(broadcast(
          corpus.select(col("doc_id")).agg(count(lit(1)).as("_ndocs"))))
        time(f"stepD +crossjoin noop rep=$rep") {
          stepD.write.format("noop").mode("overwrite").save()
        }
        time(f"stepB3 explode id-only noop rep=$rep") {
          stepA.select(col("_id"),
            posexplode(col("_bands")).as(Seq("_pos", "_band")))
            .write.format("noop").mode("overwrite").save()
        }
        time(f"stepB4 explode from checkpoint rep=$rep") {
          val pinned = stepA.localCheckpoint()
          pinned.select(col("_id"), col("_shs"),
            posexplode(col("_bands")).as(Seq("_pos", "_band")))
            .write.format("noop").mode("overwrite").save()
          org.apache.spark.sql.graftshim.ColumnShim // keep import usage stable
          pinned.unpersist(false)
        }
      }
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
