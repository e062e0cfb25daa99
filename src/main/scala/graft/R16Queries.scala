package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-12 queries (q762+). Separate object: the earlier query objects'
  * map builders sit near the JVM 64 KB method-bytecode ceiling, so new
  * surface accretes here and chains into `SparkEntry.queries` /
  * `oracleSql`.
  */
object R16Queries {

  private def rd(s: SparkSession, dir: String, t: String): DataFrame =
    Tables.read(s, dir, t)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q762_planned_lsh" -> ((s, dir) => {
      // LSH banding AUTOTUNING as an operator (r11 verdict task 3):
      // Dedup.planBands picks the 12-component banding whose analytic
      // collision probability at the target Jaccard (τ = 0.5) clears the
      // recall floor (800k ppm) with the fewest bands — here (6, 2),
      // because the default (4, 3) knees at only 413,820 ppm — and
      // bandingRecallCompare DISCLOSES the measured recall delta between
      // the two: verified-pair counts plus each config's pairs the other
      // misses, computed from ONE shared shingle cache (the expensive
      // stage never runs twice). The oracle recomputes the S-curve with
      // its own truncating-DIV arithmetic and re-derives the planner's
      // argmin independently — a cross-engine check of the Scala planner
      // itself, not just the pair pipelines.
      graft.operators.Dedup.bandingRecallCompare(
        rd(s, dir, "documents"), "doc_id", "text")
    }),
    "q763_incremental_dedup_table" -> ((s, dir) => {
      // Incremental dedup against PERSISTED signature state (r11 verdict
      // task 4): the standing corpus's MinHash signatures are published
      // once as a VersionedTable partitioned on _sig_bucket =
      // pmod(hash(band_key), 64); the delta run derives its own band
      // keys, probes ONLY the touched bucket directories (the file
      // LISTING is pruned, not just the scan — the cost q739 pays to
      // recompute the corpus pipeline per run disappears), and verifies
      // candidates from shingles riding the pruned rows. Output is
      // row-identical to q739's self-contained delta-vs-corpus join —
      // the oracle IS q739's oracle.
      val d = rd(s, dir, "documents")
      val root = java.nio.file.Files.createTempDirectory("q763_sig").toString
      graft.operators.Dedup.signatureTable(
        s, d.filter(col("doc_id") % 3 =!= 0), "doc_id", "text", root)
      graft.operators.Dedup.incrementalPairs(
        s, d.filter(col("doc_id") % 3 === 0), root, "doc_id", "text")
    })
  )

  // ---- oracle fragments ----

  /** Exact ppm integer power with truncating `//` after each multiply —
    * the q749 planner arithmetic with a constant base.
    */
  private def ipowSql(e: String, k: Int): String =
    (2 to k).foldLeft(e)((acc, _) => s"(($acc) * ($e) // 1000000)")

  private def collisionSql(sPpm: Long, b: Int, r: Int): String =
    // BIGINT base: DuckDB's bare 500000 literal is INT32 and the first
    // ppm multiply overflows it
    s"(1000000 - ${ipowSql(s"(1000000 - ${ipowSql(s"CAST($sPpm AS BIGINT)", r)})", b)})"

  /** The banded candidate + exact-verify pipeline for a (bands, rows)
    * split of the shared 12-component signature (`mh`), guards mirroring
    * `Dedup.verifiedPairsFor` verbatim: fat-bucket ceiling, corpus-scaled
    * pair budget, spanning-path degrade. Emits `<p>pairs(doc_a, doc_b)`
    * (τ-verified, τ = 1/2).
    */
  private def bandedPairsCtes(p: String, bands: Int, rows: Int): String = {
    val keys = (0 until bands).map { b =>
      val ms = (0 until rows).map(i => s"m${rows * b + i}").mkString(" || '|' || ")
      s"'$b:' || md5($ms)"
    }.mkString(",\n  ")
    s"""${p}bands AS (SELECT doc_id, unnest([
       |  $keys
       |]) AS bk FROM mh),
       |${p}bsz0 AS (
       |    SELECT doc_id, bk, lag(doc_id) OVER (PARTITION BY bk ORDER BY doc_id) AS prev,
       |      (count(*) OVER (PARTITION BY bk)
       |         <= ${graft.operators.Dedup.DefaultMaxBucket}
       |       AND count(*) OVER (PARTITION BY bk)
       |         * count(*) OVER (PARTITION BY bk)
       |         <= ${graft.operators.Dedup.PairBudgetFactor}
       |         * (SELECT count(*) FROM sh3)) AS ok
       |    FROM ${p}bands),
       |${p}bok AS (SELECT doc_id, bk FROM ${p}bsz0 WHERE ok),
       |${p}cand AS (SELECT DISTINCT doc_a, doc_b FROM (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM ${p}bok a JOIN ${p}bok b ON a.bk = b.bk AND a.doc_id < b.doc_id
       |  UNION ALL
       |  SELECT prev, doc_id FROM ${p}bsz0
       |  WHERE NOT ok AND prev IS NOT NULL) cu),
       |${p}pairs AS (
       |  SELECT ov.doc_a, ov.doc_b
       |  FROM (SELECT c.doc_a, c.doc_b, count(*) AS overlap
       |        FROM ${p}cand c JOIN shx x ON x.doc_id = c.doc_a
       |                        JOIN shx y ON y.doc_id = c.doc_b AND y.s = x.s
       |        GROUP BY 1, 2) ov
       |  JOIN sizes sx ON sx.doc_id = ov.doc_a
       |  JOIN sizes sy ON sy.doc_id = ov.doc_b
       |  WHERE ov.overlap * 2 >= (sx.n + sy.n - ov.overlap) * 1)""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q762_planned_lsh" ->
      s"""WITH ${SparkEntry.ToksCte}, ${SparkEntry.shingleCteFor("sh3", 3)},
         |shx AS (SELECT doc_id, unnest(shs) AS s FROM sh3),
         |sizes AS (SELECT doc_id, count(*) AS n FROM shx GROUP BY 1),
         |mh AS (SELECT doc_id,
         |${(0 until 12).map(i =>
            s"  list_min(list_transform(shs, s -> md5('$i-' || s))) AS m$i")
            .mkString(",\n")}
         |FROM sh3),
         |${bandedPairsCtes("a", 4, 3)},
         |${bandedPairsCtes("b", 6, 2)},
         |curve AS (
         |  SELECT * FROM (VALUES
         |    (2, 6, ${collisionSql(500000L, 2, 6)}),
         |    (3, 4, ${collisionSql(500000L, 3, 4)}),
         |    (4, 3, ${collisionSql(500000L, 4, 3)}),
         |    (6, 2, ${collisionSql(500000L, 6, 2)})) v(b, r, coll)),
         |plan AS (SELECT b, r FROM curve WHERE coll >= 800000
         |  ORDER BY b ASC, coll DESC LIMIT 1),
         |na AS (SELECT count(*) AS n FROM apairs),
         |nb AS (SELECT count(*) AS n FROM bpairs),
         |xa AS (SELECT count(*) AS n FROM apairs p WHERE NOT EXISTS (
         |  SELECT 1 FROM bpairs q
         |  WHERE q.doc_a = p.doc_a AND q.doc_b = p.doc_b)),
         |xb AS (SELECT count(*) AS n FROM bpairs p WHERE NOT EXISTS (
         |  SELECT 1 FROM apairs q
         |  WHERE q.doc_a = p.doc_a AND q.doc_b = p.doc_b))
         |SELECT 'b4r3' AS config, CAST(4 AS BIGINT) AS bands,
         |  CAST(3 AS BIGINT) AS rpb,
         |  CAST((SELECT coll FROM curve WHERE b = 4) AS BIGINT)
         |    AS collision_ppm,
         |  CAST(CASE WHEN EXISTS (SELECT 1 FROM plan WHERE b = 4 AND r = 3)
         |    THEN 1 ELSE 0 END AS BIGINT) AS is_planned,
         |  CAST((SELECT n FROM na) AS BIGINT) AS n_pairs,
         |  CAST((SELECT n FROM xa) AS BIGINT) AS n_extra
         |UNION ALL
         |SELECT 'b6r2', CAST(6 AS BIGINT), CAST(2 AS BIGINT),
         |  CAST((SELECT coll FROM curve WHERE b = 6) AS BIGINT),
         |  CAST(CASE WHEN EXISTS (SELECT 1 FROM plan WHERE b = 6 AND r = 2)
         |    THEN 1 ELSE 0 END AS BIGINT),
         |  CAST((SELECT n FROM nb) AS BIGINT),
         |  CAST((SELECT n FROM xb) AS BIGINT)""".stripMargin,
    // Same relation as q739 by construction (stored-signature path vs
    // self-contained recompute) — one oracle text, two engine paths.
    "q763_incremental_dedup_table" ->
      R15Queries.oracleSql("q739_incremental_dedup")
  )
}
