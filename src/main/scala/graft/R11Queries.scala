package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.Tables

/** Round-8 session-3 queries (q535+). Separate object: the earlier query
  * objects' map builders sit near the JVM 64 KB method-bytecode ceiling,
  * so new surface accretes here and chains into `SparkEntry.queries` /
  * `oracleSql`.
  */
object R11Queries {

  private def rd(s: SparkSession, dir: String, t: String): DataFrame =
    Tables.read(s, dir, t)

  /** One functional-dependency profile row: g3 error of lhs → rhs
    * (minimum rows to delete so the FD holds = n − Σ_lhs max_rhs count).
    * One shuffle on (lhs, rhs) then a map-side-combined rollup on lhs —
    * profiling cost is one aggregate pass per candidate at any scale.
    */
  private def fdProfile(df: DataFrame, label: String,
                        lhs: String, rhs: String): DataFrame =
    df.groupBy(col(lhs).as("_l"), col(rhs).as("_r"))
      .agg(count(lit(1)).as("_n"))
      .groupBy(col("_l"))
      .agg(sum(col("_n")).as("_rows"), max(col("_n")).as("_mx"))
      .agg(lit(label).as("fd"),
           sum(col("_rows")).as("n_rows"),
           count(lit(1)).as("n_groups"),
           (sum(col("_rows")) - sum(col("_mx"))).as("n_violations"),
           when(sum(col("_rows")) === sum(col("_mx")), 1L).otherwise(0L)
             .as("holds"))

  /** One inclusion-dependency profile row: how much of distinct(a) is
    * contained in distinct(b). Two distinct aggregates + one join on the
    * value — the FK-discovery primitive; at 100 TB both sides collapse
    * to their key cardinality before the join.
    */
  private def indProfile(a: DataFrame, aCol: String,
                         b: DataFrame, bCol: String,
                         label: String): DataFrame = {
    val av = a.select(col(aCol).cast("long").as("v")).distinct()
    val bv = b.select(col(bCol).cast("long").as("v")).distinct()
      .withColumn("_hit", lit(1))
    av.join(bv, Seq("v"), "left")
      .agg(lit(label).as("ind"),
           count(lit(1)).as("n_distinct"),
           sum(when(col("_hit").isNull, 1L).otherwise(0L)).as("n_missing"))
      .withColumn("containment_ppm",
        expr("(n_distinct - n_missing) * 1000000 DIV n_distinct"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q535_damerau_blocked" -> ((s, dir) => {
      // Fuzzy-key linkage with the native UNRESTRICTED Damerau-
      // Levenshtein comparator (codegen'd integer DP, bit-identical to
      // the oracle's damerau_levenshtein by construction — validated
      // here over every blocked pair). Brand blocking + key-mod thinning
      // bound the pair set (the anti-|T|² lever); the comparator is the
      // verify step, never the candidate generator.
      val f = rd(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_name"))
      f.as("a").join(f.as("b"),
          col("a.p_brand") === col("b.p_brand") &&
          col("a.p_partkey") < col("b.p_partkey") &&
          col("a.p_partkey") % 19 === 0 && col("b.p_partkey") % 11 === 0)
        .select(col("a.p_brand").as("brand"),
          graft.functions.DamerauLevenshtein(
            col("a.p_name"), col("b.p_name")).cast("long").as("dl"))
        .groupBy(col("brand"))
        .agg(count(lit(1)).as("n_pairs"),
             min(col("dl")).as("min_dl"),
             sum(col("dl")).as("sum_dl"),
             sum(when(col("dl") <= 12, 1L).otherwise(0L)).as("n_close"))
    }),
    "q536_grid_density" -> ((s, dir) => {
      // Grid-density clustering (the scalable DBSCAN preprocessing):
      // quantize the first two embedding dims to a 0.04 grid, keep cells
      // with ≥ 5 points (density), merge ADJACENT dense cells
      // (Chebyshev ≤ 1) into clusters via the large-star/small-star CC.
      // The 100 TB shape: the corpus collapses to grid-cell rollups
      // (bounded by the grid, not the data) before any pairwise work —
      // the cell-adjacency join and the CC run on metadata-scale input.
      // Sparse cells are the noise tier, reported as cluster −1.
      val cells = Tables.spread(s, rd(s, dir, "embeddings"))
        .select(
          expr("CAST(floor(CAST(element_at(embedding, 1) AS DOUBLE) * 25)"
               + " AS BIGINT)").as("gx"),
          expr("CAST(floor(CAST(element_at(embedding, 2) AS DOUBLE) * 25)"
               + " AS BIGINT)").as("gy"))
        .groupBy(col("gx"), col("gy")).agg(count(lit(1)).as("c"))
        .localCheckpoint(false)
      val dense = cells.filter(col("c") >= 5)
        .withColumn("cell", (col("gx") + 64) * 1024 + (col("gy") + 64))
      val adj = dense.as("a").join(dense.as("b"),
          abs(col("a.gx") - col("b.gx")) <= 1 &&
          abs(col("a.gy") - col("b.gy")) <= 1 &&
          col("a.cell") < col("b.cell"))
        .select(col("a.cell").as("src"), col("b.cell").as("dst"))
      val cc = Graph.connectedComponentsStar(adj)
        .select(col("doc_id").as("cell"), col("cluster_id").as("_cc"))
      // isolated dense cells never enter the CC edge set: their label is
      // themselves
      val clusters = dense.join(cc, Seq("cell"), "left")
        .withColumn("cid", coalesce(col("_cc"), col("cell")))
        .groupBy(col("cid").as("cluster_id"))
        .agg(count(lit(1)).as("n_cells"), sum(col("c")).as("n_points"))
      val noise = cells.filter(col("c") < 5)
        .agg(lit(-1L).as("cluster_id"),
             count(lit(1)).as("n_cells"),
             coalesce(sum(col("c")), lit(0L)).as("n_points"))
      clusters.unionByName(noise)
    }),
    "q537_fd_profile" -> ((s, dir) => {
      // Functional-dependency discovery (schema profiling): the g3 error
      // of five candidate FDs — the minimum number of rows whose deletion
      // makes lhs → rhs hold. One (lhs, rhs) aggregate + one lhs rollup
      // per candidate; every candidate is one partial-aggregated shuffle
      // regardless of fact scale, and candidates run independently.
      fdProfile(rd(s, dir, "customer"), "c_nationkey->c_mktsegment",
                "c_nationkey", "c_mktsegment")
        .unionByName(fdProfile(rd(s, dir, "part"), "p_name->p_brand",
                               "p_name", "p_brand"))
        .unionByName(fdProfile(rd(s, dir, "orders"),
                               "o_custkey->o_orderpriority",
                               "o_custkey", "o_orderpriority"))
        .unionByName(fdProfile(Tables.spread(s, rd(s, dir, "lineitem")),
                               "l_partkey->l_suppkey",
                               "l_partkey", "l_suppkey"))
        .unionByName(fdProfile(rd(s, dir, "nation"), "n_regionkey->n_name",
                               "n_regionkey", "n_name"))
    }),
    "q538_inclusion_deps" -> ((s, dir) => {
      // Inclusion-dependency discovery (FK-candidate detection): for five
      // column pairs, the fraction of distinct lhs values contained in
      // the rhs column — containment_ppm = 1e6 exact integer parts-per-
      // million. Both sides collapse to distinct keys before the join;
      // the referenced side broadcasts when dimension-sized.
      val c = rd(s, dir, "customer"); val o = rd(s, dir, "orders")
      val l = Tables.spread(s, rd(s, dir, "lineitem"))
      val p = rd(s, dir, "part"); val su = rd(s, dir, "supplier")
      val n = rd(s, dir, "nation")
      indProfile(o, "o_custkey", c, "c_custkey", "o_custkey<=c_custkey")
        .unionByName(indProfile(l, "l_partkey", p, "p_partkey",
                                "l_partkey<=p_partkey"))
        .unionByName(indProfile(c, "c_custkey", o, "o_custkey",
                                "c_custkey<=o_custkey"))
        .unionByName(indProfile(su, "s_nationkey", n, "n_nationkey",
                                "s_nationkey<=n_nationkey"))
        .unionByName(indProfile(p, "p_size", su, "s_suppkey",
                                "p_size<=s_suppkey"))
    }),
    "q539_set_cover" -> ((s, dir) => {
      // Greedy maximum-coverage selection (submodular data curation):
      // pick 6 documents that together cover the most distinct word
      // BIGRAMS (the unigram vocabulary here is too small to need more
      // than two picks), one greedy round each — the (1 − 1/e)-
      // approximate coreset / representative-sample selector. Per round:
      // one anti-join against the covered set + one doc rollup; ONLY the
      // single argmax row (gain desc, doc_id tiebreak) is collected per
      // round — k driver-sized picks total, the corpus never leaves
      // executors.
      val tok = Tables.spread(s, rd(s, dir, "documents"))
        .filter(col("doc_id") % 3 === 0)
        .withColumn("a", expr("filter(split(text, ' '), x -> x <> '')"))
        .select(col("doc_id"), explode(expr(
          """CASE WHEN size(a) >= 2 THEN
            |  transform(sequence(1, size(a) - 1),
            |            i -> concat(element_at(a, i), ' ',
            |                        element_at(a, i + 1)))
            |ELSE array() END""".stripMargin)).as("t"))
        .distinct()
        .localCheckpoint(false)
      var covered = tok.select("t").limit(0).localCheckpoint(false)
      val picks = scala.collection.mutable.ListBuffer
        .empty[(Long, Long, Long, Long)]
      var round = 1L
      var exhausted = false
      while (round <= 6L && !exhausted) {
        val best = tok.join(covered, Seq("t"), "left_anti")
          .groupBy(col("doc_id")).agg(count(lit(1)).as("g"))
          .orderBy(col("g").desc, col("doc_id")).limit(1).collect()
        if (best.isEmpty) exhausted = true
        else {
          val docId = best(0).getLong(0)
          val gain = best(0).getLong(1)
          covered = covered
            .union(tok.filter(col("doc_id") === docId).select("t"))
            .distinct().localCheckpoint(false)
          picks += ((round, docId, gain, covered.count()))
          round += 1L
        }
      }
      import s.implicits._
      picks.toSeq.toDF("round", "doc_id", "gain", "covered_total")
    }),
    "q540_mst_trade" -> ((s, dir) => {
      // Maximum spanning backbone of the undirected nation-trade graph
      // (edge weight = lineitem count between the nations): the classic
      // network-backbone extraction, via the cycle property over a total
      // edge order — an edge survives iff no path of strictly heavier
      // edges connects its endpoints, decided by ONE minimax path-doubling
      // closure instead of union-find's sequential merges. Dimension-
      // grain contract (facts collapse to ≤ 300 undirected edges before
      // the algorithm); 5 doubling rounds cover 32-edge paths ≥ any
      // simple path on 25 nodes, so the closure is complete.
      val li = rd(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
      val o = rd(s, dir, "orders").select("o_orderkey", "o_custkey")
      val c = rd(s, dir, "customer").select("c_custkey", "c_nationkey")
      val su = rd(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val edges = li
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .filter(col("c_nationkey") =!= col("s_nationkey"))
        .groupBy(
          least(col("c_nationkey"), col("s_nationkey")).cast("long")
            .as("src"),
          greatest(col("c_nationkey"), col("s_nationkey")).cast("long")
            .as("dst"))
        .agg(count(lit(1)).as("n"))
      Graph.mstBottleneck(
          edges.select(col("src"), col("dst"), (-col("n")).as("w")),
          doublingRounds = 5)
        .select(col("src"), col("dst"), (-col("w")).as("n_items"))
    }))

  def oracleSql: Map[String, String] = Map(
    "q535_damerau_blocked" ->
      """SELECT a.p_brand AS brand,
        |  CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(min(damerau_levenshtein(a.p_name, b.p_name)) AS BIGINT)
        |    AS min_dl,
        |  CAST(sum(damerau_levenshtein(a.p_name, b.p_name)) AS BIGINT)
        |    AS sum_dl,
        |  CAST(sum(CASE WHEN damerau_levenshtein(a.p_name, b.p_name) <= 12
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_close
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        | AND a.p_partkey % 19 = 0 AND b.p_partkey % 11 = 0
        |GROUP BY 1""".stripMargin,
    "q536_grid_density" ->
      """WITH RECURSIVE cells AS MATERIALIZED (
        |  SELECT CAST(floor(CAST(embedding[1] AS DOUBLE) * 25) AS BIGINT)
        |           AS gx,
        |         CAST(floor(CAST(embedding[2] AS DOUBLE) * 25) AS BIGINT)
        |           AS gy,
        |         count(*) AS c
        |  FROM embeddings GROUP BY 1, 2),
        |dense AS MATERIALIZED (
        |  SELECT (gx + 64) * 1024 + (gy + 64) AS cell, gx, gy, c
        |  FROM cells WHERE c >= 5),
        |adj AS MATERIALIZED (
        |  SELECT a.cell AS src, b.cell AS dst FROM dense a JOIN dense b
        |    ON abs(a.gx - b.gx) <= 1 AND abs(a.gy - b.gy) <= 1),
        |reach(a, b) AS (
        |  SELECT cell, cell FROM dense
        |  UNION
        |  SELECT r.a, e.dst FROM reach r JOIN adj e ON r.b = e.src),
        |lbl AS (SELECT a AS cell, min(b) AS cid FROM reach GROUP BY 1),
        |cl AS (SELECT l.cid AS cluster_id,
        |         CAST(count(*) AS BIGINT) AS n_cells,
        |         CAST(sum(d.c) AS BIGINT) AS n_points
        |       FROM lbl l JOIN dense d ON d.cell = l.cell GROUP BY 1)
        |SELECT cluster_id, n_cells, n_points FROM cl
        |UNION ALL
        |SELECT CAST(-1 AS BIGINT), CAST(count(*) AS BIGINT),
        |       CAST(coalesce(sum(c), 0) AS BIGINT)
        |FROM cells WHERE c < 5""".stripMargin,
    "q537_fd_profile" ->
      """WITH f1 AS (SELECT c_nationkey AS l, c_mktsegment AS r
        |            FROM customer),
        |f2 AS (SELECT p_name AS l, p_brand AS r FROM part),
        |f3 AS (SELECT o_custkey AS l, o_orderpriority AS r FROM orders),
        |f4 AS (SELECT l_partkey AS l, l_suppkey AS r FROM lineitem),
        |f5 AS (SELECT n_regionkey AS l, n_name AS r FROM nation),
        |prof AS (
        |  SELECT 'c_nationkey->c_mktsegment' AS fd, l, r,
        |    count(*) AS n FROM f1 GROUP BY 1, 2, 3
        |  UNION ALL SELECT 'p_name->p_brand', l, r, count(*)
        |    FROM f2 GROUP BY 1, 2, 3
        |  UNION ALL SELECT 'o_custkey->o_orderpriority', l, r, count(*)
        |    FROM f3 GROUP BY 1, 2, 3
        |  UNION ALL SELECT 'l_partkey->l_suppkey', l, r, count(*)
        |    FROM f4 GROUP BY 1, 2, 3
        |  UNION ALL SELECT 'n_regionkey->n_name', l, r, count(*)
        |    FROM f5 GROUP BY 1, 2, 3),
        |g AS (SELECT fd, l, sum(n) AS rows_, max(n) AS mx
        |      FROM prof GROUP BY 1, 2)
        |SELECT fd, CAST(sum(rows_) AS BIGINT) AS n_rows,
        |  CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(sum(rows_) - sum(mx) AS BIGINT) AS n_violations,
        |  CAST(CASE WHEN sum(rows_) = sum(mx) THEN 1 ELSE 0 END AS BIGINT)
        |    AS holds
        |FROM g GROUP BY 1""".stripMargin,
    "q538_inclusion_deps" ->
      """WITH pair AS (
        |  SELECT 'o_custkey<=c_custkey' AS ind, a.v, b.v AS bv
        |  FROM (SELECT DISTINCT CAST(o_custkey AS BIGINT) v FROM orders) a
        |  LEFT JOIN (SELECT DISTINCT CAST(c_custkey AS BIGINT) v
        |             FROM customer) b ON a.v = b.v
        |  UNION ALL
        |  SELECT 'l_partkey<=p_partkey', a.v, b.v
        |  FROM (SELECT DISTINCT CAST(l_partkey AS BIGINT) v
        |        FROM lineitem) a
        |  LEFT JOIN (SELECT DISTINCT CAST(p_partkey AS BIGINT) v
        |             FROM part) b ON a.v = b.v
        |  UNION ALL
        |  SELECT 'c_custkey<=o_custkey', a.v, b.v
        |  FROM (SELECT DISTINCT CAST(c_custkey AS BIGINT) v
        |        FROM customer) a
        |  LEFT JOIN (SELECT DISTINCT CAST(o_custkey AS BIGINT) v
        |             FROM orders) b ON a.v = b.v
        |  UNION ALL
        |  SELECT 's_nationkey<=n_nationkey', a.v, b.v
        |  FROM (SELECT DISTINCT CAST(s_nationkey AS BIGINT) v
        |        FROM supplier) a
        |  LEFT JOIN (SELECT DISTINCT CAST(n_nationkey AS BIGINT) v
        |             FROM nation) b ON a.v = b.v
        |  UNION ALL
        |  SELECT 'p_size<=s_suppkey', a.v, b.v
        |  FROM (SELECT DISTINCT CAST(p_size AS BIGINT) v FROM part) a
        |  LEFT JOIN (SELECT DISTINCT CAST(s_suppkey AS BIGINT) v
        |             FROM supplier) b ON a.v = b.v)
        |SELECT ind, CAST(count(*) AS BIGINT) AS n_distinct,
        |  CAST(sum(CASE WHEN bv IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_missing,
        |  CAST((count(*) - sum(CASE WHEN bv IS NULL THEN 1 ELSE 0 END))
        |    * 1000000 // count(*) AS BIGINT) AS containment_ppm
        |FROM pair GROUP BY 1""".stripMargin,
    "q539_set_cover" ->
      """WITH tok AS MATERIALIZED (
        |  SELECT DISTINCT doc_id, t FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(a)),
        |      i -> a[i] || ' ' || a[i + 1])) AS t
        |    FROM (SELECT doc_id,
        |            list_filter(string_split(text, ' '), x -> x <> '')
        |              AS a
        |          FROM documents WHERE doc_id % 3 = 0))),
        |p1 AS MATERIALIZED (SELECT doc_id, count(*) AS g FROM tok
        |  GROUP BY 1 ORDER BY g DESC, doc_id LIMIT 1),
        |c1 AS MATERIALIZED (SELECT DISTINCT t FROM tok
        |  JOIN p1 USING (doc_id)),
        |p2 AS MATERIALIZED (SELECT doc_id, count(*) AS g FROM tok
        |  WHERE NOT EXISTS (SELECT 1 FROM c1 WHERE c1.t = tok.t)
        |  GROUP BY 1 ORDER BY g DESC, doc_id LIMIT 1),
        |c2 AS MATERIALIZED (SELECT t FROM c1 UNION
        |  SELECT t FROM tok JOIN p2 USING (doc_id)),
        |p3 AS MATERIALIZED (SELECT doc_id, count(*) AS g FROM tok
        |  WHERE NOT EXISTS (SELECT 1 FROM c2 WHERE c2.t = tok.t)
        |  GROUP BY 1 ORDER BY g DESC, doc_id LIMIT 1),
        |c3 AS MATERIALIZED (SELECT t FROM c2 UNION
        |  SELECT t FROM tok JOIN p3 USING (doc_id)),
        |p4 AS MATERIALIZED (SELECT doc_id, count(*) AS g FROM tok
        |  WHERE NOT EXISTS (SELECT 1 FROM c3 WHERE c3.t = tok.t)
        |  GROUP BY 1 ORDER BY g DESC, doc_id LIMIT 1),
        |c4 AS MATERIALIZED (SELECT t FROM c3 UNION
        |  SELECT t FROM tok JOIN p4 USING (doc_id)),
        |p5 AS MATERIALIZED (SELECT doc_id, count(*) AS g FROM tok
        |  WHERE NOT EXISTS (SELECT 1 FROM c4 WHERE c4.t = tok.t)
        |  GROUP BY 1 ORDER BY g DESC, doc_id LIMIT 1),
        |c5 AS MATERIALIZED (SELECT t FROM c4 UNION
        |  SELECT t FROM tok JOIN p5 USING (doc_id)),
        |p6 AS MATERIALIZED (SELECT doc_id, count(*) AS g FROM tok
        |  WHERE NOT EXISTS (SELECT 1 FROM c5 WHERE c5.t = tok.t)
        |  GROUP BY 1 ORDER BY g DESC, doc_id LIMIT 1),
        |c6 AS MATERIALIZED (SELECT t FROM c5 UNION
        |  SELECT t FROM tok JOIN p6 USING (doc_id))
        |SELECT CAST(1 AS BIGINT) AS round, CAST(doc_id AS BIGINT)
        |    AS doc_id, CAST(g AS BIGINT) AS gain,
        |  (SELECT CAST(count(*) AS BIGINT) FROM c1) AS covered_total
        |  FROM p1
        |UNION ALL SELECT 2, doc_id, g,
        |  (SELECT count(*) FROM c2) FROM p2
        |UNION ALL SELECT 3, doc_id, g,
        |  (SELECT count(*) FROM c3) FROM p3
        |UNION ALL SELECT 4, doc_id, g,
        |  (SELECT count(*) FROM c4) FROM p4
        |UNION ALL SELECT 5, doc_id, g,
        |  (SELECT count(*) FROM c5) FROM p5
        |UNION ALL SELECT 6, doc_id, g,
        |  (SELECT count(*) FROM c6) FROM p6""".stripMargin,
    "q540_mst_trade" ->
      """WITH e0 AS MATERIALIZED (
        |  SELECT least(c.c_nationkey, s.s_nationkey) AS src,
        |         greatest(c.c_nationkey, s.s_nationkey) AS dst,
        |         count(*) AS n
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE c.c_nationkey <> s.s_nationkey
        |  GROUP BY 1, 2),
        |rk AS MATERIALIZED (
        |  SELECT src, dst, n,
        |    row_number() OVER (ORDER BY n DESC, src, dst) AS r FROM e0),
        |m0 AS MATERIALIZED (
        |  SELECT src, dst, min(r) AS r FROM (
        |    SELECT src, dst, r FROM rk
        |    UNION ALL SELECT dst, src, r FROM rk)
        |  WHERE src <> dst GROUP BY 1, 2),
        |m1 AS MATERIALIZED (
        |  SELECT src, dst, min(r) AS r FROM (
        |    SELECT src, dst, r FROM m0
        |    UNION ALL
        |    SELECT a.src, b.dst, greatest(a.r, b.r) FROM m0 a
        |    JOIN m0 b ON a.dst = b.src WHERE a.src <> b.dst)
        |  GROUP BY 1, 2),
        |m2 AS MATERIALIZED (
        |  SELECT src, dst, min(r) AS r FROM (
        |    SELECT src, dst, r FROM m1
        |    UNION ALL
        |    SELECT a.src, b.dst, greatest(a.r, b.r) FROM m1 a
        |    JOIN m1 b ON a.dst = b.src WHERE a.src <> b.dst)
        |  GROUP BY 1, 2),
        |m3 AS MATERIALIZED (
        |  SELECT src, dst, min(r) AS r FROM (
        |    SELECT src, dst, r FROM m2
        |    UNION ALL
        |    SELECT a.src, b.dst, greatest(a.r, b.r) FROM m2 a
        |    JOIN m2 b ON a.dst = b.src WHERE a.src <> b.dst)
        |  GROUP BY 1, 2),
        |m4 AS MATERIALIZED (
        |  SELECT src, dst, min(r) AS r FROM (
        |    SELECT src, dst, r FROM m3
        |    UNION ALL
        |    SELECT a.src, b.dst, greatest(a.r, b.r) FROM m3 a
        |    JOIN m3 b ON a.dst = b.src WHERE a.src <> b.dst)
        |  GROUP BY 1, 2),
        |m5 AS MATERIALIZED (
        |  SELECT src, dst, min(r) AS r FROM (
        |    SELECT src, dst, r FROM m4
        |    UNION ALL
        |    SELECT a.src, b.dst, greatest(a.r, b.r) FROM m4 a
        |    JOIN m4 b ON a.dst = b.src WHERE a.src <> b.dst)
        |  GROUP BY 1, 2)
        |SELECT CAST(e.src AS BIGINT) AS src, CAST(e.dst AS BIGINT) AS dst,
        |  CAST(e.n AS BIGINT) AS n_items
        |FROM rk e JOIN m5 c
        |  ON c.src = e.src AND c.dst = e.dst AND c.r = e.r""".stripMargin)
}
