package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch: mergeable point-frequency estimation in d×w integers —
  * the frequency-sketch member of the approximate tier (X79 holds the
  * distinct-count HLL and rank GK members).
  *
  * Structure: d hash rows × w buckets of counters. Every key increments one
  * bucket per row; a key's estimate is the MIN of its d buckets — always an
  * OVERestimate (collisions only add), within eps·N (eps ≈ e/w) with
  * probability 1−(1/2)^d (Cormode & Muthukrishnan 2005). The sketch is a
  * sum-mergeable integer grid, so at 100 TB it builds as ONE combine-enabled
  * aggregate (map-side partials shrink each partition to ≤ d·w cells before
  * the exchange), ships in kilobytes, and merges across days/streams by
  * cell-wise addition — the reason CMS backs every production heavy-hitter/
  * rate-limit pipeline where exact per-key counts would be a full shuffle
  * of the fact table.
  */
object Sketches {

  /** The d×w counter grid of `keyCol` occurrences: rows (row, bucket, cnt).
    * Bucket assignment is xxhash64(row-index, key) mod w — deterministic
    * across partitionings and retries.
    */
  def cmsTable(df: DataFrame, keyCol: String, depth: Int, width: Int)
      : DataFrame =
    df.select(explode(expr(
        s"transform(sequence(0, ${depth - 1}), i ->" +
          s" named_struct('row', i," +
          s" 'bucket', pmod(xxhash64(i, $keyCol), $width)))")).as("c"))
      .groupBy(col("c.row").as("row"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** CMS estimates for a (small, broadcast) candidate key set: min over the
    * d probed cells. Candidates absent from the sketch estimate 0 (their
    * buckets may still exist via collisions — still an overestimate).
    */
  def cmsEstimate(cms: DataFrame, candidates: DataFrame, keyCol: String,
                  depth: Int, width: Int): DataFrame = {
    val probes = candidates
      .select(col(keyCol),
              explode(expr(
                s"transform(sequence(0, ${depth - 1}), i ->" +
                  s" named_struct('row', i," +
                  s" 'bucket', pmod(xxhash64(i, $keyCol), $width)))")).as("p"))
      .select(col(keyCol), col("p.row").as("row"), col("p.bucket").as("bucket"))
    cms.join(broadcast(probes), Seq("row", "bucket"))
      .groupBy(col(keyCol))
      .agg(min(col("cnt")).as("cms_estimate"))
  }

  /** Heavy hitters with a driver-visible error contract: exact top-`k` keys
    * by count (the ground truth a verifier can recompute), each carrying a
    * verdict that the CMS estimate respects both CMS bounds — never below
    * the true count, and over by at most `4·N/width` (four times the
    * expected collision mass per bucket; with depth rows taking the min,
    * the probability of all rows exceeding 4× their mean is (1/4)^depth by
    * Markov — negligible, so the verdict is deterministic-green in
    * practice). The raw estimate stays out of the output (engine-specific,
    * like the sketch tier's HLL registers); the bound check IS the result.
    */
  def heavyHitters(df: DataFrame, keyCol: String, topK: Int,
                   depth: Int = 4, width: Int = 8192): DataFrame = {
    val keyed = df.select(col(keyCol)).localCheckpoint(false)
    val exact = keyed.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(col("n_rows").desc, col(keyCol).asc)
      .limit(topK)
    val cms = cmsTable(keyed, keyCol, depth, width)
    val total = keyed.agg(count(lit(1)).as("_n"))
    Seal(cmsEstimate(cms, exact, keyCol, depth, width)
      .join(broadcast(exact), Seq(keyCol))
      .join(broadcast(total))
      .withColumn("cms_ok",
                  col("cms_estimate") >= col("n_rows") &&
                    (col("cms_estimate") - col("n_rows")) * width <=
                      col("_n") * 4L)
      .select(col(keyCol), col("n_rows"), col("cms_ok")),
      ckpts = Seq(keyed))
  }

  /** KMV (k-minimum-values) distinct-count sketch per set: keep each
    * set's k smallest DETERMINISTIC element hashes (md5 prefix — both
    * engines hash identically, so unlike HLL the whole sketch is
    * exact-arithmetic and hash-compares across engines); the estimate is
    * the classic (k−1)·|hash space| DIV h_k. Sketches of different sets
    * MERGE by taking the k smallest of the union — the property that
    * makes distinct counting mergeable across partitions/days at 100 TB
    * without a global distinct — and set INTERSECTION estimates by
    * inclusion-exclusion over merged sketches (the query-side composition
    * this function leaves to callers).
    *
    * `df` must already be (setCols, element)-distinct. Rank selection of
    * the k-th minimum runs through [[Profile.cellRank]] — no whole-set
    * sort even when one set holds most of the corpus. Returns one row per
    * set: (setCols..., h_k, n_le_k, est_distinct) where n_le_k < k flags
    * a set smaller than k (estimate = exact count then).
    */
  def kmvSketch(df: DataFrame, setCols: Seq[String], elemCol: String,
                k: Int): DataFrame = {
    val hashed = df.withColumn("_h", expr(
      s"CAST(conv(substring(md5(CAST($elemCol AS STRING)), 1, 8), 16, 10)" +
        " AS BIGINT)"))
    Profile.cellRank(hashed, setCols, "_h", Seq(elemCol))
      .filter(col("_rank") <= k)
      .groupBy(setCols.map(col): _*)
      .agg(max(col("_h")).as("h_k"), count(lit(1)).as("n_le_k"))
      .withColumn("est_distinct",
        when(col("n_le_k") < k, col("n_le_k")) // exact below k
          .otherwise(expr(
            s"(${k - 1}) * 4294967296L DIV greatest(h_k, 1L)")))
  }
}
