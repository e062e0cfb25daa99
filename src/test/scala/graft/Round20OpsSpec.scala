package graft

import org.apache.spark.sql.functions._

import graft.operators.{CorpusIngest, Dedup}

/** Round-15 contracts. Opens with the collision-semi-join broadcast GATE
  * (round-14 verdict task 1): `Dedup.incrementalPairs` broadcasts the
  * delta's distinct band keys only below [[Dedup.SigBroadcastKeyCap]] —
  * a bulk delta degrades to a shuffle left_semi instead of an unbounded
  * broadcast hint — and the two paths must be pair-identical. Then the
  * ADVICE r14 closures: signatureTable's empty-corpus publish, and
  * CorpusIngest releasing ONLY its own internals (never a concurrent
  * thread's lineage-free checkpoint).
  */
class Round20OpsSpec extends SparkTestBase {

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

  test("incrementalPairs: shuffle-gated collision semi-join is pair-identical to broadcast") {
    val d = sigFixture
    val corpus = d.filter(col("doc_id") % 3 =!= 0)
    val delta = d.filter(col("doc_id") % 3 === 0)
    val root = java.nio.file.Files.createTempDirectory("siggate").toString
    Dedup.signatureTable(spark, corpus, "doc_id", "text", root, numBuckets = 8)
    // default cap: every key of this delta broadcasts (the measured regime)
    val viaBroadcast = Dedup.incrementalPairs(spark, delta, root, "doc_id",
        "text", numBuckets = 8)
      .orderBy("new_id", "old_id").collect().map(_.toSeq)
    // cap 0: any non-empty delta exceeds it — the bulk-delta shuffle path
    val viaShuffle = Dedup.incrementalPairs(spark, delta, root, "doc_id",
        "text", numBuckets = 8, broadcastKeyCap = 0L)
      .orderBy("new_id", "old_id").collect().map(_.toSeq)
    assert(viaBroadcast.nonEmpty, "fixture must produce at least one pair")
    assert(viaShuffle.toSeq === viaBroadcast.toSeq,
      "the broadcast gate must never change which pairs are found")
  }

  test("signatureTable publishes an empty corpus as an empty committed table") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val root = java.nio.file.Files.createTempDirectory("sigempty").toString
    // ADVICE r14: the temp-parquet build barrier writes zero part files on
    // an empty corpus; schema inference would reject the read-back. The
    // publish must still commit an empty table, like the old lazy pipeline.
    val v = Dedup.signatureTable(spark, empty, "doc_id", "text", root,
                                 numBuckets = 4)
    assert(VersionedTable.latestVersion(spark, root) === Some(v))
    assert(VersionedTable.read(spark, root).count() === 0L)
    // and a delta probed against the empty store finds nothing, typed
    val delta = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val none = Dedup.incrementalPairs(spark, delta, root, "doc_id", "text")
    assert(none.columns.toSeq ===
      Seq("new_id", "old_id", "overlap", "union_size"))
    assert(none.count() === 0L)
  }

  test("ingestNearDup releases only its own internals, never a foreign checkpoint") {
    import spark.implicits._
    val sc = spark.sparkContext
    // a concurrent thread's lineage-free relation: localCheckpoint has no
    // recompute path, so an over-broad release breaks every later read
    val foreign = Seq((1L, "x"), (2L, "y")).toDF("k", "v").localCheckpoint()
    val foreignIds = sc.getPersistentRDDs.keySet
    val docs = sigFixture.withColumnRenamed("id", "doc_id")
    val root = java.nio.file.Files.createTempDirectory("ingforeign").toString
    CorpusIngest.ingestNearDup(spark, docs, root)
    // its own internals are gone ...
    assert(sc.getPersistentRDDs.keySet.subsetOf(foreignIds),
      "ingestNearDup must leave none of its own RDDs persisted")
    // ... but the foreign checkpoint survives and still reads (ADVICE r14:
    // the old session-wide snapshot diff unpersisted it)
    assert(sc.getPersistentRDDs.nonEmpty,
      "the foreign localCheckpoint must still be persisted")
    assert(foreign.count() === 2L)
    foreign.unpersist(false)
  }
}
