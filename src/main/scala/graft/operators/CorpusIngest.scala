package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.VersionedTable

/** Idempotent batched corpus ingestion: exact dedup against everything ever
  * ingested, published through the versioned snapshot layout — the batch
  * face of `streaming.DedupStream` and the ingest path a training corpus
  * actually runs.
  *
  * Within a batch the minimum doc_id per content fingerprint wins; against
  * the table an anti-join on the fingerprint drops re-ingested content, so
  * replaying a batch (pipeline retry, at-least-once upstream) never grows
  * the corpus. At 100 TB the anti-join is one shuffle on the md5 key, and
  * the rewrite-per-publish is the plain-Parquet price the SCD writer
  * already pays (VersionedTable makes it race-free + time-travelable).
  */
object CorpusIngest {

  /** Ingest `batch(doc_id, text)` into the corpus at `root`; returns the new
    * committed version. Table schema: (doc_id, text, fingerprint).
    */
  def ingest(spark: SparkSession, batch: DataFrame, root: String): Long = {
    val fp = batch
      .select(col("doc_id"), col("text"),
              TextAnalysis.fingerprint(col("text")).as("fingerprint"))
    val batchFirst = fp
      .withColumn("_rn",
                  row_number().over(
                    org.apache.spark.sql.expressions.Window
                      .partitionBy("fingerprint").orderBy("doc_id")))
      .filter(col("_rn") === 1).drop("_rn")
    val next = VersionedTable.latestVersion(spark, root) match {
      case None => batchFirst
      case Some(v) =>
        val existing = VersionedTable.readVersion(spark, root, v)
        existing.unionByName(
          batchFirst.join(existing.select("fingerprint"),
                          Seq("fingerprint"), "left_anti")
            .select(existing.columns.map(col).toSeq: _*))
    }
    VersionedTable.publish(spark, next, root)
  }

  /** [[ingest]] hardened to NEAR-duplicate rejection: a batch doc is dropped
    * when it is an exact copy of anything ever ingested (fingerprint
    * anti-join), a MinHash near-dup of an already-ingested doc, or a
    * within-batch near-dup cluster loser (min doc_id is canonical). Table
    * schema: (doc_id, text, fingerprint, _shs) — the distinct shingle array
    * is persisted so ingested docs are NEVER re-tokenized: candidate band
    * keys recompute from `_shs` via the native [[graft.functions.MinHashBands]]
    * expression, and verification intersects the stored arrays.
    *
    * Scale shape per batch: within-batch LSH as [[Dedup.minhashLshPairs]];
    * vs-corpus work is one band-key equi-join (batch keys × stored keys,
    * shuffled on the band key whose fiber sizes LSH bounds) + per-candidate
    * array intersects. Cost tracks batch size, not corpus size, except the
    * stored-key scan — at 100 TB the band keys would live bucketed by key
    * so that scan prunes too. Replay-idempotent like [[ingest]]: a re-sent
    * batch matches its own previously-ingested copy by fingerprint.
    */
  def ingestNearDup(spark: SparkSession,
                    batch: DataFrame,
                    root: String,
                    n: Int = 3,
                    bands: Int = 4,
                    rows: Int = 3,
                    tauNum: Int = 1,
                    tauDen: Int = 2): Long = {
    val prepped = batch.select(
      col("doc_id"), col("text"),
      TextAnalysis.fingerprint(col("text")).as("fingerprint"),
      Dedup.shingles(TextAnalysis.tokens(col("text")), n).as("_shs"))
    val batchExact = prepped
      .withColumn("_rn",
                  row_number().over(
                    org.apache.spark.sql.expressions.Window
                      .partitionBy("fingerprint").orderBy("doc_id")))
      .filter(col("_rn") === 1).drop("_rn")
    // Lifecycle: this operator returns a VERSION NUMBER — after the final
    // publish action nothing of its internal state is ever read again, so
    // it releases its OWN internals explicitly (ADVICE r14: the previous
    // session-wide getPersistentRDDs snapshot diff could unpersist a
    // concurrent thread's lineage-free localCheckpoint — a public library
    // operator must only ever touch RDDs it created). Zero left behind.
    // within-batch near-dup clusters: min-id canonical survives
    val pairs = Dedup.minhashLshPairs(batchExact, "doc_id", "text", n, bands,
                                      rows, tauNum, tauDen)
    // keepCanonical returns a LAZY anti-join owning one sealed loser-set
    // checkpoint inside the plan; `pairs` is fully consumed by it
    val kept = Dedup.keepCanonical(batchExact, "doc_id", pairs)
    val batchKept = kept.localCheckpoint()
    Seal.releaseCheckpoint(pairs)
    Seal.releaseCheckpoints(kept) // the loser set baked into kept's plan

    def bandKeys(df: DataFrame) = df
      .select(col("doc_id"),
              posexplode(graft.functions.MinHashBands(col("_shs"), bands, rows))
                .as(Seq("_pos", "_band")))
      .select(col("doc_id"),
              concat(col("_pos").cast("string"), lit(":"), col("_band"))
                .as("_bk"))

    val next = VersionedTable.latestVersion(spark, root) match {
      case None => batchKept
      case Some(v) =>
        val existing = VersionedTable.readVersion(spark, root, v)
        val fresh = batchKept.join(existing.select("fingerprint"),
                                   Seq("fingerprint"), "left_anti")
        val cand = bandKeys(fresh).as("b")
          .join(bandKeys(existing).as("e"), col("b._bk") === col("e._bk"))
          .select(col("b.doc_id").as("_bid"), col("e.doc_id").as("_eid"))
          .distinct()
        val nearExisting = cand
          .join(fresh.select(col("doc_id").as("_bid"), col("_shs").as("_sa"),
                             size(col("_shs")).cast("long").as("_na")), "_bid")
          .join(existing.select(col("doc_id").as("_eid"),
                                col("_shs").as("_sb"),
                                size(col("_shs")).cast("long").as("_nb")),
                "_eid")
          .withColumn("overlap",
                      size(array_intersect(col("_sa"), col("_sb"))).cast("long"))
          .filter(col("overlap") * tauDen >=
            (col("_na") + col("_nb") - col("overlap")) * tauNum)
          .select(col("_bid").as("doc_id")).distinct()
        existing.unionByName(
          fresh.join(nearExisting, Seq("doc_id"), "left_anti")
            .select(existing.columns.map(col).toSeq: _*))
    }
    val v = VersionedTable.publish(spark, next, root)
    Seal.releaseCheckpoint(batchKept)
    v
  }
}
