// scratch scaling-slope probe (not part of the library)
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Round-13 stress (r12 verdict task 3): the DIVERSE-delta corner of
  * persisted-signature incremental dedup, and the two levers:
  *
  *  (a) `numBuckets` 64 → 512 — the directory-pruning denominator: a
  *      homogeneous delta's read fraction is touched/numBuckets, so 8×
  *      more buckets is 8× less read for low-diversity deltas and no
  *      worse for diverse ones; cost = 8× the file count (disclosed).
  *  (b) within-bucket `_bk` sort at publish + pushed equality-OR filter
  *      at read (≤ [[Dedup.SigPushdownKeyCap]] distinct delta keys).
  *      NOTE (r14 point-mode bytesRead): the filter's win is ROW-dropping
  *      at the scan, not byte skipping (ratio exactly 1.0 across
  *      sorted/unsorted × cap on/off); and since r15 large corpora
  *      publish the SPLIT layout (thin band index, doc-bucketed shingle
  *      side table), so grid-scale scans no longer carry shingle pages
  *      at all.
  *
  * Deltas: DIVERSE = Stress15's 10k fresh docs (≈40k distinct band keys,
  * touches everything); HOMOGENEOUS = 10k docs that are copies of 50
  * corpus documents (≈200 distinct band keys — one domain's re-crawl).
  *
  * Modes: `all` (default) = the 1M/10M grid; `probe` = the q763-shape
  * split at sf0.1 (publish sorted/unsorted × delta pushdown on/off) used
  * to adjudicate the gate query's cost.
  */
object Stress16 {

  private def time[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    println(f"STRESS16 $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
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
    def clear(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))

    // Stress11/12/15 corpus recipe, verbatim.
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
    def diverseDelta(k: Long): DataFrame = docs(k, idOffset = 1000000000L)
    // Homogeneous delta: k docs, each an exact body-copy of one of 50
    // corpus documents (bases 10j+1: never the boiler rows, never the
    // x-suffixed near-dup rows) — one domain's re-crawl, ≈ 50 distinct
    // texts ⇒ ≈ 200 distinct band keys.
    def homogDelta(k: Long): DataFrame = {
      val word = (j: Int) =>
        concat(lit("w"), pmod(xxhash64(col("base"), lit(j)), lit(5000L)))
      val body = concat_ws(" ", (0 until 12).map(word): _*)
      spark.range(k).select(
        (col("id") + 2000000000L).as("doc_id"),
        (col("id") % 50L * 10L + 1L).as("base"))
        .select(col("doc_id"), concat_ws(" ", lit(""), body, lit("")).as("text"))
        .localCheckpoint(false)
    }

    if (which == "probe") {
      // q763 shape at sf0.1: corpus = documents with doc_id % 3 != 0,
      // delta = the % 3 == 0 third.
      // plain reads (NOT checkpointed): the probe clear()s persisted RDDs
      // between steps, which would orphan a shared lazy checkpoint
      val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .select(col("doc_id"), col("text"))
      val corpus = d.filter(col("doc_id") % 3 =!= 0)
      val delta = d.filter(col("doc_id") % 3 === 0)
      for (sorted <- Seq(true, false)) {
        val root = s"/tmp/stress16_probe/sorted_$sorted"
        new java.io.File(root).getParentFile.mkdirs()
        // three reps into ONE root: rep1 = cold, rep2+ = warm and paying
        // vacuum-of-predecessor — isolates the republish steady state
        for (rep <- 1 to 3)
          time(f"probe publish sorted=$sorted rep=$rep") {
            Dedup.signatureTable(spark, corpus, "doc_id", "text", root,
                                 sortByBandKey = sorted)
          }
        clear()
        for (cap <- Seq(Dedup.SigPushdownKeyCap, 0)) {
          time(f"probe delta sorted=$sorted cap=$cap") {
            val n = Dedup.incrementalPairs(spark, delta, root, "doc_id",
                                           "text", pushdownKeyCap = cap).count()
            println(s"STRESS16 probe pairs=$n")
          }
          clear()
        }
      }
      time("probe RECOMPUTE (q739 shape)") {
        val n = Dedup.minhashLshPairsAgainst(corpus, delta, "doc_id", "text")
          .count()
        println(s"STRESS16 probe recompute pairs=$n")
      }
      spark.stop()
      return
    }

    if (which == "point") {
      // Lever b's REAL regime: a known-content point probe (3 docs, ≤12
      // band keys) against a 10M-doc store whose bucket files span many
      // row groups — sorted layout + pushed equality-OR vs the unsorted
      // grid store. Run AFTER the grid (reuses its unsorted
      // /tmp/stress16_sig/n10000000_b64).
      //
      // BYTES READ per config (round-13 verdict task 4): wall time showed
      // no sorted-layout win on page-cached local NVMe, but the scaladoc
      // claims the payoff is COLD object-store reads — prove/refute it by
      // the scan's own bytesRead: skipped row groups show up as bytes even
      // when the page cache hides the latency. Counted via a TaskEnd
      // listener (listener delivery is async — the 1 s settle after each
      // run bounds undercount to ~0 at these job sizes).
      val bytesRead = new java.util.concurrent.atomic.AtomicLong(0L)
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(
              te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
            if (te.taskMetrics != null)
              bytesRead.addAndGet(te.taskMetrics.inputMetrics.bytesRead)
        })
      val rootU = "/tmp/stress16_sig/n10000000_b64"
      val rootS = "/tmp/stress16_sig/n10000000_b64_sorted"
      val d = docs(10000000L)
      if (!new java.io.File(rootU).exists())
        time("point publish unsorted corpus=10000000") {
          Dedup.signatureTable(spark, d, "doc_id", "text", rootU)
        }
      if (!new java.io.File(rootS).exists())
        time("point publish SORTED corpus=10000000") {
          Dedup.signatureTable(spark, d, "doc_id", "text", rootS,
                               sortByBandKey = true)
        }
      clear()
      for (rep <- 1 to 2; (lbl, root) <- Seq("sorted" -> rootS,
                                             "unsorted" -> rootU);
           cap <- Seq(Dedup.SigPushdownKeyCap, 0)) {
        val probe = docs(10000000L)
          .filter(col("doc_id").isin(11L, 21L, 31L))
          .select((col("doc_id") + 3000000000L).as("doc_id"), col("text"))
        probe.count() // materialize the (tracked) probe OUTSIDE the meter
        bytesRead.set(0L)
        time(f"point probe rep=$rep layout=$lbl cap=$cap") {
          val found = Dedup.incrementalPairs(spark, probe, root, "doc_id",
                                             "text", pushdownKeyCap = cap)
            .count()
          println(s"STRESS16 point pairs layout=$lbl cap=$cap found=$found")
        }
        Thread.sleep(1000) // drain async listener delivery
        println(f"STRESS16 point bytes layout=$lbl cap=$cap " +
          f"mb_read=${bytesRead.get() / 1048576.0}%.1f")
        clear()
      }
      spark.stop()
      return
    }

    val sizes: Seq[Long] =
      if (which == "1m") Seq(1000000L)
      else if (which == "10m") Seq(10000000L)
      else Seq(1000000L, 10000000L)
    for (n <- sizes; nb <- Seq(64, 512)) {
      val root = s"/tmp/stress16_sig/n${n}_b$nb"
      new java.io.File(root).getParentFile.mkdirs()
      val d = docs(n)
      time(f"publish sorted corpus=$n buckets=$nb") {
        Dedup.signatureTable(spark, d, "doc_id", "text", root, numBuckets = nb)
      }
      // file-count trade-off of lever (a), disclosed
      val files = spark.read.parquet(
        s"$root/v=${graft.VersionedTable.latestVersion(spark, root).get}")
        .inputFiles.length
      println(s"STRESS16 files corpus=$n buckets=$nb n_files=$files")
      clear()
      for (dname <- Seq("diverse", "homog");
           cap <- Seq(Dedup.SigPushdownKeyCap, 0)) {
        // fresh delta per timed run: clear() between runs would orphan a
        // shared lazy checkpoint (generation is a cheap range+hash scan)
        val dl = if (dname == "diverse") diverseDelta(10000L)
                 else homogDelta(10000L)
        dl.count()
        time(f"delta $dname corpus=$n buckets=$nb cap=$cap") {
          val found = Dedup.incrementalPairs(spark, dl, root, "doc_id",
                                             "text", pushdownKeyCap = cap)
            .count()
          println(s"STRESS16 pairs $dname corpus=$n buckets=$nb cap=$cap found=$found")
        }
        clear()
      }
    }
    spark.stop()
  }
}
