package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ScdFunctions.resolveCi

/** Incremental source scan: high-water-mark filter over a raw source table.
  *
  * Mirrors `/root/reference/macros/builtin_overrides/source.sql:33-58`:
  * on an incremental run, keep only rows with `loaded_at` strictly greater
  * than the target's `max(target_loaded_at)` (defaulting to `defaultValidFrom`
  * when the target is empty), and optionally exclude rows that arrived after
  * the run started (`exclude_data_after_run_start`).
  *
  * The watermark is a single scalar aggregate collected to the driver — the
  * Spark equivalent of the reference's scalar subquery — and the resulting
  * literal predicate is pushed down to the parquet scan (min/max row-group
  * pruning), so at 100 TB the scan touches only files that can contain new
  * rows.
  */
object IncrementalSource {

  def scan(source: DataFrame,
           target: Option[DataFrame],
           loadedAtCol: String,
           targetLoadedAtCol: String = "_loaded_at",
           defaultValidFrom: String = "1900-01-01 00:00:00",
           runStartedAt: Option[Timestamp] = None): DataFrame = {
    val loaded = resolveCi(source.columns.toSeq, loadedAtCol)
    val withWatermark = target match {
      case Some(t) =>
        val tgtCol = resolveCi(t.columns.toSeq, targetLoadedAtCol)
        val wm = t.agg(max(col(tgtCol)).cast("timestamp")).head().get(0)
        val floor =
          if (wm == null) to_timestamp(lit(defaultValidFrom))
          else lit(wm.asInstanceOf[Timestamp])
        source.filter(floor < col(loaded))
      case None => source // initial load: full scan
    }
    runStartedAt match {
      case Some(ts) => withWatermark.filter(col(loaded) <= lit(ts))
      case None     => withWatermark
    }
  }

  /** dbt's `source freshness` check: per group (or whole-source), the age of
    * `max(loadedAt)` relative to `asOf` against warn/error thresholds —
    * `pass` / `warn` / `error`, with a group that never loaded reporting
    * `error`. Integer seconds (µs-floored) so the verdict is engine-exact.
    * One combine-enabled aggregate over the watermark column only — at
    * 100 TB this reads a single column, and on sorted/partitioned layouts
    * Parquet row-group max stats make it metadata-cheap.
    */
  def freshness(source: DataFrame,
                loadedAtCol: String,
                asOf: Timestamp,
                warnAfterSec: Long,
                errorAfterSec: Long,
                groupBy: Seq[String] = Nil): DataFrame = {
    require(warnAfterSec <= errorAfterSec,
            "warn_after must not exceed error_after")
    val loaded = resolveCi(source.columns.toSeq, loadedAtCol)
    val agged = if (groupBy.isEmpty)
      source.agg(max(col(loaded)).as("max_loaded_at"))
    else
      source.groupBy(groupBy.map(col): _*)
        .agg(max(col(loaded)).as("max_loaded_at"))
    agged
      .withColumn("age_sec",
                  expr(s"(${asOf.getTime * 1000L}L - " +
                    "unix_micros(max_loaded_at)) DIV 1000000"))
      .withColumn(
        "status",
        when(col("age_sec").isNull, lit("error"))
          .when(col("age_sec") > errorAfterSec, lit("error"))
          .when(col("age_sec") > warnAfterSec, lit("warn"))
          .otherwise(lit("pass")))
  }
}
