package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ScdConfig

/** Streaming point-in-time enrichment: a fact stream picks up the dimension
  * version valid at each fact's timestamp from a STATIC SCD2 snapshot — the
  * stream-static join Structured Streaming supports state-free (the static
  * side is re-planned per micro-batch, so republishing the dimension
  * between batches is picked up automatically; pair with
  * [[graft.VersionedTable]] reads for race-free snapshots).
  *
  * The containment predicate is fine here: per micro-batch the fact side is
  * batch-sized, the dimension broadcasts, and there is no facts x versions
  * blowup risk at stream rates. For BACKFILL-scale fact volumes use the
  * batch `operators.Scd2Join.enrich` window-fill instead.
  */
object EnrichStream {

  def enrich(factStream: DataFrame,
             factTsCol: String,
             dim: DataFrame,
             joinKeys: Seq[String],
             cfg: ScdConfig = ScdConfig(uniqueKey = Seq("_unused_"))): DataFrame = {
    val d = dim.select(
      joinKeys.map(k => col(k).as(s"_d_$k")) ++
        dim.columns.filterNot(joinKeys.contains(_)).map(c => col(c).as(s"dim_$c")).toSeq: _*)
    val cond = joinKeys.map(k => col(k) === col(s"_d_$k")).reduce(_ && _) &&
      col(s"dim_${cfg.validFromCol}") <= col(factTsCol) &&
      col(factTsCol) < col(s"dim_${cfg.validToCol}")
    factStream
      .join(broadcast(d), cond, "left")
      .drop(joinKeys.map(k => s"_d_$k"): _*)
  }
}
