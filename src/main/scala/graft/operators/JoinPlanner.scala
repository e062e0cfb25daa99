package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join cardinality pre-flight: predict a join's output size and its skew
  * profile from per-key counts BEFORE shuffling a single fact row.
  *
  * At 100 TB the most expensive mistake is launching a join whose output
  * explodes (unexpected many-to-many) or whose shuffle collapses onto a
  * handful of hot keys. Both are fully determined by the per-key row counts
  * of the two inputs: the exact output cardinality of an equi-join is
  * Σ_k n_left(k) · n_right(k), and a key's share of that sum is exactly the
  * fraction of join work one reducer will do. Computing those counts is two
  * combine-enabled aggregates (map-side partials, dimension-sized results)
  * plus one key-sized join — orders of magnitude cheaper than the join
  * itself, and the answer decides the physical strategy: broadcast if one
  * side's key table is small, salt (SkewJoin) keys whose share crosses a
  * threshold, or refuse to run a join that would emit 10^13 rows.
  *
  * This is the same estimate CBO derives from column histograms, made exact
  * and explicit; the reference's MERGE sizing concern (unique-key delta vs
  * target, `/root/reference/macros/materializations/scd/scd_plan.sql:239-255`
  * `incremental_predicates`) is the 1:1 special case.
  */
object JoinPlanner {

  /** Top-`k` join keys by output contribution, with the exact totals.
    *
    * Output (one row per top key, ordered by contribution desc, key asc):
    * `key, n_left, n_right, out_rows, total_out_rows, share_micro`
    * where `share_micro = out_rows * 1e6 div total_out_rows` (integer
    * parts-per-million — exact, no float drift).
    *
    * Plan shape: two partial-aggregated counts (each |keys|-sized), one
    * sort-merge join of the two count tables, a broadcast of the single
    * total row, and a TakeOrdered for the top-k — no fact-sized shuffle
    * anywhere.
    */
  def preflight(left: DataFrame, right: DataFrame,
                leftKey: String, rightKey: String,
                topK: Int = 10): DataFrame = {
    val lc = left.groupBy(col(leftKey).as("key"))
      .agg(count(lit(1)).as("n_left"))
    val rc = right.groupBy(col(rightKey).as("key"))
      .agg(count(lit(1)).as("n_right"))
    // Pin the (dimension-sized) per-key table: both the grand total and the
    // top-k read it, and without the checkpoint each consumer would re-run
    // the two FULL-INPUT count scans — the one genuinely expensive step.
    val perKey = lc.join(rc, "key")
      .withColumn("out_rows", col("n_left") * col("n_right"))
      .localCheckpoint(false)
    val total = perKey.agg(
      coalesce(sum(col("out_rows")), lit(0L)).as("total_out_rows"))
    Seal(perKey.join(broadcast(total))
      .withColumn("share_micro",
                  expr("out_rows * 1000000L DIV total_out_rows"))
      .orderBy(col("out_rows").desc, col("key").asc)
      .limit(topK),
      ckpts = Seq(perKey))
  }

  /** Join-ORDER pre-flight for a star chain on one shared key: for each
    * choice of which pair to join first, the exact intermediate cardinality
    * — the number a cost-based optimizer estimates from histograms, computed
    * exactly from per-relation key counts (every term is Σ_k Π counts, so
    * three dimension-sized count tables answer every ordering at once; the
    * final cardinality is order-invariant and reported for scale context).
    *
    * At 100 TB picking the wrong first pair is the difference between a
    * |fact|-sized and a |fact|²-sized shuffle feeding join two; this report
    * costs one count aggregate per relation.
    *
    * @param relations (name, df, keyCol) — all joined on their keyCol
    * @return one row per first-pair choice: `plan, inter_rows, final_rows`
    */
  def starJoinOrders(relations: Seq[(String, DataFrame, String)]): DataFrame = {
    require(relations.size == 3, "three-relation chains supported")
    val counts = relations.map { case (name, df, k) =>
      name -> df.groupBy(col(k).as("key")).agg(count(lit(1)).as(s"c_$name"))
        .localCheckpoint(false)
    }.toMap
    val names = relations.map(_._1)
    val finalRows = names.map(counts)
      .reduce(_.join(_, "key"))
      .agg(coalesce(sum(names.map(n => col(s"c_$n")).reduce(_ * _)), lit(0L))
             .as("final_rows"))
    Seal(names.combinations(2).toSeq.map { case Seq(a, b) =>
      counts(a).join(counts(b), "key")
        .agg(coalesce(sum(col(s"c_$a") * col(s"c_$b")), lit(0L))
               .as("inter_rows"))
        .select(lit(s"$a*$b").as("plan"), col("inter_rows"))
    }.reduce(_ unionByName _)
      .join(broadcast(finalRows)),
      ckpts = counts.values.toSeq)
  }
}
