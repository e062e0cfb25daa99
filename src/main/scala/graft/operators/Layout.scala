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
