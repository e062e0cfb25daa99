package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional layout optimization: Z-order (Morton) keys for
  * data-skipping writes.
  *
  * A 100 TB table range-partitioned and sorted by ONE column skips files
  * only for predicates on that column. Interleaving the bits of two (or
  * more) columns into one sort key gives every participating column
  * locality: a file's min/max on EACH dimension spans ~a grid cell, so
  * point/range predicates on any dimension prune most files. This is what
  * `OPTIMIZE ... ZORDER BY` does in lakehouse table formats; here it is an
  * explicit, engine-exact integer expression + `repartitionByRange` write.
  *
  * The key is pure per-row bit arithmetic (shift/mask folded over a bit
  * index sequence — no floats), so any engine computes the identical key
  * and the layout is reproducible anywhere.
  */
object Layout {

  /** Morton-interleave two non-negative integer columns' low `bits` bits:
    * x's bit b lands at position 2b, y's at 2b+1. Columns must fit in
    * `bits` bits for full fidelity (clamp/scale upstream).
    */
  def zValue(xCol: String, yCol: String, bits: Int): Column = {
    require(bits > 0 && bits <= 31, "bits in (0, 31]")
    expr(
      s"""aggregate(sequence(0, ${bits - 1}), CAST(0 AS BIGINT),
         |  (acc, b) -> acc
         |    + shiftleft(shiftright(CAST($xCol AS BIGINT), b) % 2, 2 * b)
         |    + shiftleft(shiftright(CAST($yCol AS BIGINT), b) % 2, 2 * b + 1))
         |""".stripMargin)
  }

  /** Data-skipping effectiveness report: for each candidate layout, how many
    * layout cells (≈ files after a range-partitioned write) a predicate must
    * scan, judged by the per-cell min/max stats the parquet footer would
    * carry.
    *
    * This is the measurement that justifies a 100 TB re-layout BEFORE paying
    * for it: group rows by the cell id each layout would assign, collect
    * min/max per predicate column per cell (one combine-enabled aggregate
    * per layout over the candidate key expression — no write, no shuffle of
    * payload columns), then count the cells whose [min, max] intersects each
    * predicate's range. A cell a predicate's range misses is a file the scan
    * skips. Single-column sort layouts ace their own column and fail the
    * other; Z-order (zValue) bounds BOTH dimensions per cell — the report
    * quantifies that trade exactly, in integers.
    *
    * @param layouts    (name, cell-id expression) candidates
    * @param predicates (name, column, lo, hi) closed-range probes
    * @return one row per (layout, predicate): `layout, predicate, n_cells,
    *         scan_cells, scan_ppm` (ppm = parts-per-million of cells read)
    */
  def skippingReport(df: DataFrame,
                     layouts: Seq[(String, Column)],
                     predicates: Seq[(String, String, Long, Long)])
      : DataFrame = {
    val predCols = predicates.map(_._2).distinct
    layouts.map { case (layoutName, cell) =>
      val mmCols = predCols.flatMap(c => Seq(min(col(c)).as(s"_min_$c"),
                                             max(col(c)).as(s"_max_$c")))
      val stats = df.withColumn("_cell", cell)
        .groupBy("_cell")
        .agg(mmCols.head, mmCols.tail: _*)
      predicates.map { case (predName, c, lo, hi) =>
        stats.agg(
          count(lit(1)).as("n_cells"),
          sum(when(col(s"_max_$c") >= lo && col(s"_min_$c") <= hi, 1L)
                .otherwise(0L)).as("scan_cells"))
          .select(lit(layoutName).as("layout"),
                  lit(predName).as("predicate"),
                  col("n_cells"), col("scan_cells"))
      }.reduce(_ unionByName _)
    }.reduce(_ unionByName _)
      .withColumn("scan_ppm", expr("scan_cells * 1000000L DIV n_cells"))
  }

  /** Range-partition by the z key and sort within partitions — the write
    * path that makes parquet min/max stats selective on BOTH dimensions
    * (numFiles ≈ target file count; each output file covers ~one z range =
    * one grid cell per dimension).
    */
  def zorderWrite(df: DataFrame, x: String, y: String, bits: Int,
                  numFiles: Int): DataFrame =
    df.withColumn("_z", zValue(x, y, bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
}
