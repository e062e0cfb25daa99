package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relation profiler: per-column row/null/distinct counts and min/max — the
  * `ANALYZE TABLE ... COMPUTE STATISTICS` shape, as a queryable DataFrame.
  *
  * Scale: ONE aggregation job over the relation. The multi-column distinct
  * counts make Catalyst plan a single Expand (one pass over the input, one
  * shuffle of partial aggregates) rather than a scan per column; the final
  * single-row frame is exploded back into one row per column. At 100 TB the
  * drop-in cheaper variant is `approx_count_distinct` (HLL sketches merge
  * order-independently), but its register layout is engine-specific, so the
  * exact form is the cross-engine-checkable one.
  */
object Profile {

  /** One row per profiled column: (column, n_rows, n_nulls, n_distinct,
    * min_str, max_str). min/max are rendered as strings so heterogeneous
    * column types stack into one typed output relation.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] = count(lit(1)).as("_rows") +: cols.flatMap { c =>
      Seq(count(col(c)).as(s"_cnt_$c"),
          countDistinct(col(c)).as(s"_dst_$c"),
          min(col(c)).cast("string").as(s"_min_$c"),
          max(col(c)).cast("string").as(s"_max_$c"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map { c =>
        struct(lit(c).as("column"),
               col("_rows").as("n_rows"),
               (col("_rows") - col(s"_cnt_$c")).as("n_nulls"),
               col(s"_dst_$c").as("n_distinct"),
               col(s"_min_$c").as("min_str"),
               col(s"_max_$c").as("max_str"))
      }: _*)).as("p"))
      .select("p.*")
  }
}
