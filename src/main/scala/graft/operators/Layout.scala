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

  /** Write `df` as a CATALOG-bucketed table (hash-bucketed by `key` into
    * `nBuckets` files, sorted within buckets): the layout that makes every
    * later equi-join/aggregation on `key` SHUFFLE-FREE — Spark matches the
    * two sides' bucket specs and plans a sort-merge join with zero
    * Exchange, the single biggest lever for a repeatedly-joined 100 TB
    * fact table (pay one shuffle at write time, never again). External
    * table at `path`; in-memory catalog, `overwrite` for idempotent
    * re-publish.
    */
  def writeBucketed(df: DataFrame, path: String, table: String,
                    nBuckets: Int, key: String): DataFrame = {
    df.write.mode("overwrite")
      .bucketBy(nBuckets, key).sortBy(key)
      .option("path", path)
      .saveAsTable(table)
    df.sparkSession.table(table)
  }

  /** Per-column encoding advisor: run-length and cardinality statistics of
    * each column under the table's physical sort order, plus the encoding
    * a columnar writer should pick (RLE when runs are long, dictionary
    * when the value set is small, plain otherwise) — the report that
    * decides parquet encodings / sort-key choices before a 100 TB rewrite.
    *
    * Run counting under a GLOBAL order is the scale trap (one window over
    * everything = one partition). Distributed formulation: bucket rows by
    * `orderCol DIV bucketSize`, count value changes inside each bucket
    * (one exchange, parallel windows), then stitch bucket boundaries over
    * the bounded bucket dimension ([[graft.functions.DimKey.one]] window):
    * total runs = Σ(in-bucket runs) − Σ(adjacent buckets whose facing
    * values are equal). NDV counts NULL as one dictionary entry. All
    * values compare as strings (injective per type either side), so the
    * statistics are engine-exact integers.
    */
  def encodingReport(df: DataFrame, orderCol: String, cols: Seq[String],
                     bucketSize: Long = 65536L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.DimKey
    cols.map { c =>
      val base = df.select(col(orderCol).as("_o"),
                           col(c).cast("string").as("_v"))
        .withColumn("_b", expr(s"_o DIV $bucketSize"))
      val wl = Window.partitionBy(col("_b")).orderBy(col("_o"))
      val marked = base
        .withColumn("_rn", row_number().over(wl))
        .withColumn("_chg",
          when(col("_rn") === 1, lit(0L))
            .otherwise((!(col("_v") <=> lag(col("_v"), 1).over(wl)))
                         .cast("long")))
      val buckets = marked.groupBy(col("_b")).agg(
        count(lit(1)).as("_n"),
        sum(col("_chg")).as("_c"),
        expr("min_by(_v, _o)").as("_first"),
        expr("max_by(_v, _o)").as("_last"))
      val wd = Window.partitionBy(DimKey.one).orderBy(col("_b"))
      val stitched = buckets
        .withColumn("_bn", row_number().over(wd))
        .withColumn("_merge",
          when(col("_bn") === 1, lit(0L))
            .otherwise((col("_first") <=> lag(col("_last"), 1).over(wd))
                         .cast("long")))
      // NDV needs a global distinct, not a per-bucket sum — one flat
      // combine-enabled aggregate over the column.
      val ndv = df.agg(
        (countDistinct(col(c)) +
           max(when(col(c).isNull, 1L).otherwise(0L))).as("ndv"))
      stitched.agg(
        sum(col("_n")).as("n_rows"),
        (sum(col("_c")) + count(lit(1)) - sum(col("_merge"))).as("n_runs"))
        .crossJoin(broadcast(ndv))
        .select(lit(c).as("column"), col("n_rows"), col("ndv"), col("n_runs"),
                expr("n_runs * 1000000L DIV n_rows").as("run_ppm"),
                expr("ndv * 1000000L DIV n_rows").as("ndv_ppm"))
        .withColumn("suggestion",
          when(col("run_ppm") <= 200000L, lit("RLE"))
            .when(col("ndv_ppm") <= 100000L, lit("DICT"))
            .otherwise(lit("PLAIN")))
    }.reduce(_ unionByName _)
  }

  // -------------------------------------------------------------------
  // Zone-map secondary index (file-level min/max skipping)
  // -------------------------------------------------------------------

  /** Build a file-level zone map for `colName`: one narrow scan emitting
    * (file, min, max, n_rows) per physical file via the `_metadata` hidden
    * column. This is the manifest-stats table a lakehouse format keeps per
    * data file — materialized once (ANALYZE-style) and consulted at
    * planning time; it is metadata-scale (one row per FILE), so at 100 TB
    * with 1 GB files it is ~10⁵ rows against 10¹⁰+ data rows.
    */
  def zoneMapIndex(df: DataFrame, colName: String): DataFrame =
    df.select(col("_metadata.file_path").as("file"), col(colName).as("_v"))
      .groupBy(col("file"))
      .agg(min(col("_v")).as("zmin"), max(col("_v")).as("zmax"),
           count(lit(1)).as("n_rows"))

  /** Range read through the zone map: open ONLY the files whose
    * [zmin, zmax] overlaps [lo, hi], then apply the residual row filter.
    * The stats consult is a driver-side scan of the metadata-scale index
    * (the same place a format's planning phase runs it); the data scan
    * never lists, opens, or row-filters a pruned file. Returns the pruned
    * frame plus (filesScanned, filesTotal) so callers can assert the
    * skipping actually happened. Correct for any layout — a file written
    * without clustering on `colName` simply never prunes (zone maps are
    * an optimization contract, the residual filter is the correctness
    * contract); cluster by [[zorderWrite]]/repartitionByRange to make
    * them selective.
    */
  def zoneMapRead(spark: org.apache.spark.sql.SparkSession,
                  index: DataFrame, colName: String,
                  lo: Column, hi: Column): (DataFrame, Long, Long) = {
    val keep = index.filter(col("zmax") >= lo && col("zmin") <= hi)
      .select("file").collect().map(_.getString(0))
    val total = index.count()
    val pruned =
      if (keep.nonEmpty)
        spark.read.parquet(keep.toIndexedSeq: _*)
          .filter(col(colName) >= lo && col(colName) <= hi)
      else {
        // No zone overlaps [lo, hi]: the answer is an EMPTY relation, not
        // an error — Spark can't infer a schema from a zero-path read, so
        // recover the schema from any indexed file's footer (planning-
        // phase metadata work, same cost class as the stats consult).
        val any = index.select("file").limit(1).collect()
        if (any.isEmpty) spark.emptyDataFrame
        else spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          spark.read.parquet(any(0).getString(0)).schema)
      }
    (pruned, keep.length.toLong, total)
  }
}
