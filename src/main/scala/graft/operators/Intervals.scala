package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic temporal interval (overlap) joins: pair up left and right rows on
  * equal keys whose half-open validity windows `[start, end)` intersect, and
  * emit the intersection bounds.
  *
  * This generalizes the SCD2 containment join ([[graft.operators.Scd2Join]])
  * from point-in-window lookup to window-x-window algebra — "which dimension
  * versions were live during this session", "which promotions overlapped this
  * order's fulfillment window".
  *
  * Two physical strategies, same result:
  *   - [[overlapJoin]]: equi-join on the keys with the range predicate as a
  *     post-join filter. One shuffle; per-key cost is |left fiber| x |right
  *     fiber| — fine when per-key version counts are bounded (the SCD case),
  *     quadratic for hot keys.
  *   - [[overlapJoinBucketed]]: quantize time into fixed chunks, explode each
  *     interval to the chunks it covers, equi-join on (keys, chunk), keep a
  *     pair only in the chunk containing its overlap start (so no distinct
  *     pass is needed), then verify the exact predicate. Per-key cost drops
  *     to sum over chunks of |left ∩ chunk| x |right ∩ chunk| — the standard
  *     spatial-grid decomposition, and the 100 TB path when fibers are long
  *     but locally sparse. Chunk width trades replication (long intervals
  *     span many chunks) against fiber size.
  */
object Intervals {

  private def overlapCond(lStart: Column, lEnd: Column,
                          rStart: Column, rEnd: Column): Column =
    lStart < rEnd && rStart < lEnd

  /** Key-equal overlap join; output = left cols + right cols (keys once) +
    * `overlap_from`/`overlap_to`. Column names (besides `keys`) must be
    * disjoint between the two sides. Empty intervals (start >= end) never
    * match, mirroring half-open window semantics.
    *
    * Both sides are explicitly aliased and the condition resolves by
    * qualified name: with `Dataset.apply` columns, a left/right pair sharing
    * lineage (the common self-join-ish case — session spine and dimension
    * both derived from one fact scan) hands the SAME attribute to both sides
    * of `===`, and Spark's self-join rescue rewrites it with a "trivially
    * true predicate" warning — the exact pattern that silently degrades to a
    * cross join when a refactor moves the rescue out of reach.
    */
  def overlapJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                  lStart: String, lEnd: String,
                  rStart: String, rEnd: String): DataFrame = {
    val (l, r) = (left.alias("_ovl_l"), right.alias("_ovl_r"))
    def lc(c: String) = col(s"_ovl_l.$c")
    def rc(c: String) = col(s"_ovl_r.$c")
    l.join(r,
           keys.map(k => lc(k) === rc(k)).reduce(_ && _) &&
             overlapCond(lc(lStart), lc(lEnd), rc(rStart), rc(rEnd)))
      .drop(rc(keys.head), keys.tail.map(rc): _*)
      .withColumn("overlap_from", greatest(col(lStart), col(rStart)))
      .withColumn("overlap_to", least(col(lEnd), col(rEnd)))
  }

  /** Chunk-decomposed overlap join, result-identical to [[overlapJoin]].
    * `chunkMicros` is the grid width in event-time microseconds.
    */
  def overlapJoinBucketed(left: DataFrame, right: DataFrame, keys: Seq[String],
                          lStart: String, lEnd: String,
                          rStart: String, rEnd: String,
                          chunkMicros: Long): DataFrame = {
    require(chunkMicros > 0, "chunkMicros must be positive")
    def chunksOf(start: Column, end: Column): Column =
      // Empty/inverted intervals get NO chunks: Spark's sequence() DESCENDS
      // when hi < lo, which would fabricate a (possibly huge) chunk list for
      // malformed rows only to have the overlap predicate drop every pair.
      when(start < end,
           sequence(floor(unix_micros(start) / chunkMicros),
                    // end is exclusive: an interval ending exactly on a chunk
                    // boundary does not enter the next chunk.
                    floor((unix_micros(end) - 1) / chunkMicros)))
    // Aliased for the same shared-lineage reason as [[overlapJoin]].
    val l = left.withColumn("_chunk", explode(chunksOf(col(lStart), col(lEnd))))
      .alias("_ovl_l")
    val r = right.withColumn("_chunk", explode(chunksOf(col(rStart), col(rEnd))))
      .alias("_ovl_r")
    def lc(c: String) = col(s"_ovl_l.$c")
    def rc(c: String) = col(s"_ovl_r.$c")
    l.join(r,
           (keys :+ "_chunk").map(k => lc(k) === rc(k)).reduce(_ && _) &&
             overlapCond(lc(lStart), lc(lEnd), rc(rStart), rc(rEnd)))
      .withColumn("overlap_from", greatest(col(lStart), col(rStart)))
      .withColumn("overlap_to", least(col(lEnd), col(rEnd)))
      // Each pair appears once per shared chunk; keep only the chunk that
      // contains the overlap start — a filter, not a distinct shuffle.
      .filter(lc("_chunk") === floor(unix_micros(col("overlap_from")) / chunkMicros))
      .drop(rc(keys.head), (keys.tail :+ "_chunk").map(rc): _*)
      .drop("_chunk")
  }

  /** Gaps-and-islands: coalesce each key's intervals into maximal connected
    * stretches — abutting (`from == prev to`, the SCD window case) and
    * overlapping intervals merge; a strict gap starts a new island. The
    * classic running-max formulation: an interval opens a new island iff its
    * start exceeds the max end seen so far, island id = running count of
    * openers. Output: one row per island with its bounds and member count.
    *
    * One exchange + sort on (keys, from, to); the island aggregate reuses
    * that distribution (no second shuffle). Applied to an SCD2 history's
    * alive versions this yields each key's continuous-existence periods —
    * the complement of its deletion gaps.
    */
  def islands(df: DataFrame,
              keys: Seq[String],
              fromCol: String,
              toCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(fromCol), col(toCol))
    val prevMax = max(col(toCol)).over(
      w.rowsBetween(Window.unboundedPreceding, -1))
    df.withColumn("_new",
                  when(prevMax.isNull || col(fromCol) > prevMax, 1L)
                    .otherwise(0L))
      .withColumn("island_id",
                  sum(col("_new")).over(
                    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy((keys.map(col) :+ col("island_id")): _*)
      .agg(min(col(fromCol)).as("island_from"),
           max(col(toCol)).as("island_to"),
           count(lit(1)).as("n_intervals"))
  }

  /** Per-day peak concurrency of `[start, end)` intervals — the sweep-line
    * (+1 at start, -1 at end) made distributed: the classic formulation is
    * ONE running sum over every boundary in time order, a single-partition
    * scale-killer. Here each day computes its local running sum and its
    * net delta in parallel (one exchange on the day key), then the
    * carry-in offset per day is a prefix sum over the bounded day
    * dimension ([[graft.functions.DimKey.one]] window over ~#days rows) —
    * the textbook two-phase parallel prefix sum.
    *
    * A day's peak is `carry + max(0, max local running sum)`: the max(0,_)
    * floor makes the midnight carry-in itself a peak candidate (a day that
    * only closes intervals peaks at its first instant). Boundary ties sort
    * ends (-1) before starts (+1), so back-to-back intervals never count
    * as overlapping. Days with no boundaries don't appear (their
    * concurrency is constant and visible from the neighbors).
    */
  def concurrency(df: DataFrame, startCol: String, endCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.DimKey
    val b = df.select(col(startCol).as("_ts"), lit(1L).as("_d"))
      .unionAll(df.select(col(endCol).as("_ts"), lit(-1L).as("_d")))
      .withColumn("_day", date_trunc("DAY", col("_ts")))
    val wl = Window.partitionBy(col("_day")).orderBy(col("_ts"), col("_d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dayAgg = b.withColumn("_run", sum(col("_d")).over(wl))
      .groupBy(col("_day"))
      .agg(greatest(max(col("_run")), lit(0L)).as("_local_peak"),
           sum(col("_d")).as("_tot"),
           count(lit(1)).as("n_boundaries"))
    val wd = Window.partitionBy(DimKey.one).orderBy(col("_day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    dayAgg
      .withColumn("_carry", coalesce(sum(col("_tot")).over(wd), lit(0L)))
      .select(col("_day").as("day"),
              (col("_carry") + col("_local_peak")).as("peak_concurrency"),
              col("n_boundaries"))
  }

  /** Missing ranges in an integer id sequence — the backfill/audit query
    * ("which event ids never arrived") whose textbook form is the
    * `id - row_number()` islands trick over ONE global sort. Distributed:
    * ids bucket by `id DIV bucketSize`, in-bucket gaps come from parallel
    * `lead` windows, and cross-bucket gaps from facing (last, next-first)
    * pairs over the bounded bucket dimension — the encodingReport stitch,
    * applied to sequence topology. Gaps interior to the observed range
    * only (nothing before the min or after the max id).
    */
  def sequenceGaps(df: DataFrame, idCol: String,
                   bucketSize: Long = 65536L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.DimKey
    val ids = df.select(col(idCol).cast("long").as("_id")).distinct()
      .withColumn("_b", expr(s"_id DIV $bucketSize"))
    val wl = Window.partitionBy(col("_b")).orderBy(col("_id"))
    val inner = ids.withColumn("_next", lead(col("_id"), 1).over(wl))
      .filter(col("_next").isNotNull && col("_next") - col("_id") > 1)
      .select((col("_id") + 1).as("gap_start"),
              (col("_next") - 1).as("gap_end"))
    val bounds = ids.groupBy(col("_b"))
      .agg(min(col("_id")).as("_first"), max(col("_id")).as("_last"))
    val wd = Window.partitionBy(DimKey.one).orderBy(col("_b"))
    val cross = bounds
      .withColumn("_nextFirst", lead(col("_first"), 1).over(wd))
      .filter(col("_nextFirst").isNotNull &&
                col("_nextFirst") - col("_last") > 1)
      .select((col("_last") + 1).as("gap_start"),
              (col("_nextFirst") - 1).as("gap_end"))
    inner.unionByName(cross)
      .withColumn("gap_len", col("gap_end") - col("gap_start") + 1L)
  }

  /** Point-event band self-join: every ordered pair of events sharing
    * `keys` whose timestamps are within `bandUs` microseconds — the
    * "two purchases within 10 minutes" shape. The naive form is an
    * inequality self-join (quadratic per key); here each point lands in
    * ONE chunk of width `bandUs`, and candidates come from exactly two
    * equi-joins — same chunk and adjacent chunk — so the shuffle key is
    * (keys, chunk), every qualifying pair appears in exactly one
    * candidate stream, and no range join ever runs. Pairs order by
    * (timestamp, id), ties broken on id, so each unordered pair emits
    * once.
    *
    * Output: keys ++ (id_a, id_b, gap_us).
    */
  def pointBandSelfJoin(df: DataFrame, keys: Seq[String], idCol: String,
                        tsCol: String, bandUs: Long): DataFrame = {
    require(bandUs > 0, "bandUs must be positive")
    val p = df.select(keys.map(col) ++ Seq(
        col(idCol).as("_id"), unix_micros(col(tsCol)).as("_us")): _*)
      .withColumn("_bkt", expr(s"_us DIV ${bandUs}L"))
      .localCheckpoint()
    val a = p.select(keys.map(col) ++ Seq(col("_id").as("_ida"),
      col("_us").as("_ua"), col("_bkt")): _*)
    val b = p.select(keys.map(col) ++ Seq(col("_id").as("_idb"),
      col("_us").as("_ub"), col("_bkt")): _*)
    val jk = keys :+ "_bkt"
    graft.operators.Seal(a.join(b, jk)
      .filter((col("_ua") < col("_ub")) ||
              (col("_ua") === col("_ub") && col("_ida") < col("_idb")))
      .unionAll(a.withColumn("_bkt", col("_bkt") + 1L).join(b, jk))
      .filter(col("_ub") - col("_ua") <= bandUs)
      .select(keys.map(col) ++ Seq(col("_ida").as("id_a"),
        col("_idb").as("id_b"),
        (col("_ub") - col("_ua")).as("gap_us")): _*),
      ckpts = Seq(p))
  }
}
