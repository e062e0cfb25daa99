package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Round-15 optimization contracts for the SPLIT signature store (r14
  * verdict task 2): the band index is THIN (no `_shs` riding every band
  * row — that was bands× the shingle volume in storage AND publish I/O),
  * the shingles live once per doc in the `_shingles` side table, the
  * pairing marker names the exact shingle version, and a PRE-SPLIT store
  * (fat band rows, no marker) still verifies through the legacy in-row
  * read with identical pairs.
  */
class Round21OpsSpec extends SparkTestBase {

  private def sigFixture = {
    import spark.implicits._
    (0L until 30L).map { i =>
      val fam = i / 3
      val text = (i % 3) match {
        case 0 | 1 => s"alpha beta gamma delta epsilon fam$fam shared body " +
          s"of text tail${i % 3}"
        case _ => s"unique filler document number $i with its own words " +
          s"w${i}a w${i}b w${i}c"
      }
      (i, text)
    }.toDF("doc_id", "text")
  }

  test("small corpus publishes the FAT layout (adaptive crossover)") {
    val d = sigFixture
    val corpus = d.filter(col("doc_id") % 3 =!= 0)
    val root = java.nio.file.Files.createTempDirectory("sigfat").toString
    Dedup.signatureTable(spark, corpus, "doc_id", "text", root,
                         numBuckets = 8) // default splitMinDocs ≫ 20 docs
    assert(Dedup.storedSigShinglesVersion(spark, root).isEmpty,
      "a gate-scale corpus must keep the one-table fat layout")
    assert(graft.VersionedTable.read(spark, root).columns.contains("_shs"))
  }

  test("split layout: thin band index + one shingle row per doc, paired by marker") {
    val d = sigFixture
    val corpus = d.filter(col("doc_id") % 3 =!= 0)
    val root = java.nio.file.Files.createTempDirectory("sigsplit").toString
    Dedup.signatureTable(spark, corpus, "doc_id", "text", root,
                         numBuckets = 8, splitMinDocs = 0L)
    val band = graft.VersionedTable.read(spark, root)
    assert(!band.columns.contains("_shs"),
      "band index must not carry the shingle arrays")
    assert(band.columns.toSet === Set("_id", "_bk", "_ndocs", "_sig_bucket"))
    val shv = Dedup.storedSigShinglesVersion(spark, root)
    assert(shv.nonEmpty, "band index must name its shingle version")
    val sh = graft.VersionedTable.readVersion(
      spark, Dedup.sigShingleRoot(root), shv.get)
    assert(sh.groupBy(col("_id")).count().filter(col("count") > 1).isEmpty,
      "one shingle row per doc")
    assert(sh.count() === corpus.count())
    // republish pairs a FRESH shingle version — the marker must move
    Dedup.signatureTable(spark, corpus, "doc_id", "text", root,
                         numBuckets = 8, splitMinDocs = 0L)
    assert(Dedup.storedSigShinglesVersion(spark, root).get > shv.get)
    // and a split store probes pair-identically to the recompute
    val delta = d.filter(col("doc_id") % 3 === 0)
    val stored = Dedup.incrementalPairs(spark, delta, root, "doc_id", "text")
      .orderBy("new_id", "old_id").collect().map(_.toSeq).toSeq
    val direct = Dedup
      .minhashLshPairsAgainst(corpus, delta, "doc_id", "text")
      .orderBy("new_id", "old_id").collect().map(_.toSeq).toSeq
    assert(stored.nonEmpty && stored === direct)
  }

  test("pre-split store (fat band rows, no marker) verifies via the legacy in-row read") {
    val d = sigFixture
    val corpus = d.filter(col("doc_id") % 3 =!= 0)
    val delta = d.filter(col("doc_id") % 3 === 0)
    // hand-publish the r14 layout: _shs/_n on every band row, bucket
    // marker only
    val legacyRoot =
      java.nio.file.Files.createTempDirectory("siglegacy").toString
    val nb = 8
    val fat = corpus
      .select(col("doc_id").as("_id"),
              Dedup.shingles(
                graft.operators.TextAnalysis.tokens(col("text")), 3)
                .as("_shs"))
      .withColumn("_bands",
                  graft.functions.MinHashBands(col("_shs"), 4, 3))
      .select(col("_id"), col("_shs"),
              posexplode(col("_bands")).as(Seq("_pos", "_band")))
      .select(col("_id"), col("_shs"),
              concat(col("_pos").cast("string"), lit(":"), col("_band"))
                .as("_bk"))
      .withColumn("_n", size(col("_shs")).cast("long"))
      .crossJoin(broadcast(corpus.agg(count(lit(1)).as("_ndocs"))))
      .withColumn("_sig_bucket", pmod(hash(col("_bk")), lit(nb)))
    graft.VersionedTable.publishPartitioned(
      spark, fat, legacyRoot, "_sig_bucket", sortCol = None,
      markers = Seq(s"${Dedup.SigNumBucketsPrefix}$nb"))
    val splitRoot =
      java.nio.file.Files.createTempDirectory("sigsplit2").toString
    Dedup.signatureTable(spark, corpus, "doc_id", "text", splitRoot,
                         numBuckets = nb, splitMinDocs = 0L)
    val viaLegacy = Dedup
      .incrementalPairs(spark, delta, legacyRoot, "doc_id", "text")
      .orderBy("new_id", "old_id").collect().map(_.toSeq).toSeq
    val viaSplit = Dedup
      .incrementalPairs(spark, delta, splitRoot, "doc_id", "text")
      .orderBy("new_id", "old_id").collect().map(_.toSeq).toSeq
    assert(viaSplit.nonEmpty)
    assert(viaLegacy === viaSplit)
  }
}
