package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.DimKey
import graft.sources.Tables

/** Round-11 queries (q714+). Separate object: the earlier query objects'
  * map builders sit near the JVM 64 KB method-bytecode ceiling, so new
  * surface accretes here and chains into `SparkEntry.queries` /
  * `oracleSql`.
  */
object R15Queries {

  private def rd(s: SparkSession, dir: String, t: String): DataFrame =
    Tables.read(s, dir, t)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q714_dual_verifier_linkage" -> ((s, dir) => {
      // ER dual-verifier adjudication: ONE blocking pass (first letter)
      // feeds BOTH verifier lenses — Levenshtein (typo lens: counts
      // mutations anywhere) and exact integer Jaro–Winkler (name lens:
      // prefix-weighted, transposition-tolerant) — and the result is
      // every blocked pair at least one verifier accepts, with
      // per-verifier verdicts. The verifiers genuinely DISAGREE on this
      // vocabulary (58 jw-only, 4 lev-only, 12 both at the gate SF):
      // compound color-bigram names share long prefixes, which JW
      // up-weights and edit distance charges in full — exactly why the
      // ER tier offers both behind one blocking interface
      // (Linkage.fuzzyPairs / Linkage.jaroWinklerPairs). Vocabulary is
      // the adjacent-word bigrams of p_name (compound-name shape,
      // SF-stable at 64 values); everything past the distinct is
      // vocabulary-sized.
      val bg = rd(s, dir, "part")
        .select(split(col("p_name"), " ").as("ws"))
        .select(explode(expr(
          // sequence() DESCENDS when stop < start — guard 1-word names
          "IF(size(ws) < 2, array(), transform(sequence(1, size(ws) - 1)," +
            " i -> concat(element_at(ws, i), element_at(ws, i + 1))))"))
          .as("t"))
        .filter(length(col("t")).between(3, 20))
        .distinct()
        .withColumn("blk", substring(col("t"), 1, 1))
      graft.operators.Linkage
        .jaroWinklerPairs(bg, "t", "t", Seq("blk"), minJwPpm = 0L)
        .withColumn("lev",
          levenshtein(col("text_a"), col("text_b")).cast("bigint"))
        .withColumn("jw_accepts",
          when(col("jw_ppm") >= 840000L, 1L).otherwise(0L))
        .withColumn("lev_accepts",
          when(col("lev") <= 3L, 1L).otherwise(0L))
        .filter(col("jw_accepts") === 1L || col("lev_accepts") === 1L)
        .select(col("id_a").as("value_a"), col("id_b").as("value_b"),
                col("lev"), col("jw_ppm"),
                col("jw_accepts"), col("lev_accepts"))
    })
  )

  /** The q711 packed-bitmask Jaro–Winkler fold as reusable oracle CTEs:
    * given a `v(t)` vocabulary CTE body and a pair predicate, yields
    * `fin(value_a, value_b, lev, jw_ppm)`. list_reduce is only safe on
    * SCALAR states (DuckDB 1.0 miscompiles multi-field struct lambdas),
    * hence the mask1·2²⁰+mask2 packing — see `OracleDialectSpec`.
    */
  private def jwFoldSql(vocabCte: String, pairJoin: String): String =
    s"""WITH $vocabCte,
       |pr AS (SELECT a.t AS t1, b.t AS t2, length(a.t) AS l1,
       |    length(b.t) AS l2,
       |    greatest(greatest(length(a.t), length(b.t)) // 2 - 1, 0) AS w
       |  FROM v a JOIN v b ON $pairJoin),
       |fold AS (SELECT t1, t2, l1, l2, w,
       |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(
       |      generate_series(1, l1), i -> CAST(i AS BIGINT))),
       |    (st, i) -> CASE WHEN len(list_filter(
       |          generate_series(greatest(1, CAST(i AS INT) - w),
       |                          least(l2, CAST(i AS INT) + w)),
       |          j -> ((st % 1048576) // (1::BIGINT << (j - 1))) % 2 = 0
       |               AND substr(t2, j, 1) = substr(t1, CAST(i AS INT), 1)))
       |        = 0
       |      THEN st
       |      ELSE st + (1::BIGINT << (CAST(i AS INT) - 1)) * 1048576
       |              + (1::BIGINT << (list_filter(
       |          generate_series(greatest(1, CAST(i AS INT) - w),
       |                          least(l2, CAST(i AS INT) + w)),
       |          j -> ((st % 1048576) // (1::BIGINT << (j - 1))) % 2 = 0
       |               AND substr(t2, j, 1) = substr(t1, CAST(i AS INT), 1))[1]
       |          - 1))
       |      END) AS st
       |  FROM pr),
       |parts AS (SELECT t1, t2, l1, l2,
       |    st // 1048576 AS mask1, st % 1048576 AS mask2,
       |    bit_count(CAST(st // 1048576 AS BIGINT)) AS m
       |  FROM fold),
       |tr AS (SELECT t1, t2, l1, l2, m,
       |    CASE WHEN m = 0 THEN 0
       |      ELSE CAST(len(list_filter(generate_series(1, m), k ->
       |      substr(t1, list_filter(generate_series(1, l1),
       |        i -> (mask1 // (1::BIGINT << (i - 1))) % 2 = 1)[k], 1) <>
       |      substr(t2, list_filter(generate_series(1, l2),
       |        j -> (mask2 // (1::BIGINT << (j - 1))) % 2 = 1)[k], 1)))
       |      AS BIGINT) END AS t_raw
       |  FROM parts),
       |jr AS (SELECT t1, t2, m, l1, l2,
       |    CASE WHEN m = 0 THEN 0 ELSE
       |    (m * m * l2 + m * m * l1 + (m - t_raw // 2) * l1 * l2) * 1000000
       |         // (3 * l1 * l2 * m) END AS jaro_ppm,
       |    (SELECT coalesce(min(k2) - 1, least(4, least(l1, l2)))
       |     FROM unnest(generate_series(1, least(4, least(l1, l2))))
       |       AS u(k2)
       |     WHERE substr(t1, k2, 1) <> substr(t2, k2, 1)) AS pl
       |  FROM tr),
       |fin AS (SELECT t1 AS value_a, t2 AS value_b,
       |    CAST(levenshtein(t1, t2) AS BIGINT) AS lev,
       |    CAST(CASE WHEN m = 0 THEN 0
       |         ELSE jaro_ppm + pl * (1000000 - jaro_ppm) // 10 END
       |      AS BIGINT) AS jw_ppm
       |  FROM jr)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q714_dual_verifier_linkage" ->
      (jwFoldSql(
        """w0 AS (SELECT string_split(p_name, ' ') AS ws FROM part),
          |bg AS (SELECT DISTINCT ws[i] || ws[i + 1] AS t
          |  FROM w0, unnest(generate_series(1, len(ws) - 1)) AS u(i)),
          |v AS (SELECT t FROM bg WHERE length(t) BETWEEN 3 AND 20)""".stripMargin,
        "a.t < b.t AND substr(a.t, 1, 1) = substr(b.t, 1, 1)") +
        """
          |SELECT value_a, value_b, lev, jw_ppm,
          |  CAST(CASE WHEN jw_ppm >= 840000 THEN 1 ELSE 0 END AS BIGINT)
          |    AS jw_accepts,
          |  CAST(CASE WHEN lev <= 3 THEN 1 ELSE 0 END AS BIGINT)
          |    AS lev_accepts
          |FROM fin WHERE jw_ppm >= 840000 OR lev <= 3""".stripMargin)
  )
}
