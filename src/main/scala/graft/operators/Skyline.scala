package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Exact multi-objective skyline (Pareto-optimal set) over an ARBITRARY
  * number of objectives — the general case where the bounded-dimension
  * frontier reduction (q225 running-max over dates, q434 suffix-min over
  * sizes) no longer applies: with 3+ objectives no single sort order can
  * resolve dominance.
  *
  * Algorithm: distributed block-nested-loop skyline. Phase 1 computes the
  * local skyline of each partition with an in-memory dominance buffer
  * (`mapPartitions` — genuinely imperative per-partition logic, the
  * documented last-resort case); phase 2 re-runs the same filter over the
  * union of local skylines in one partition. Exact under ANY partitioning:
  * a globally non-dominated point is locally non-dominated wherever it
  * lands, so phase 1 never drops a skyline point; every dominated point
  * that survives phase 1 meets its dominator in phase 2, because
  * domination is transitive and phase 1 only drops a point when keeping a
  * dominator. Phase 2's input is the sum of local skyline sizes —
  * O(partitions × log^(d-1) n) expected on independent dimensions — so the
  * single partition is dimension-sized by construction, never corpus-sized.
  *
  * Points are deduplicated first (the skyline is a property of the point
  * SET) and every objective is normalized to maximize by negating the
  * minimized columns, so dominance is a plain coordinate-wise >= with at
  * least one > — which over distinct points is >= plus inequality.
  */
object Skyline {

  private def dominates(a: Seq[Long], b: Seq[Long]): Boolean = {
    var i = 0
    var strict = false
    while (i < a.length) {
      if (a(i) < b(i)) return false
      if (a(i) > b(i)) strict = true
      i += 1
    }
    strict
  }

  private def localSkyline(it: Iterator[Seq[Long]]): Iterator[Seq[Long]] = {
    val kept = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    it.foreach { p =>
      if (!kept.exists(k => dominates(k, p))) {
        var i = kept.length - 1
        while (i >= 0) { // drop points the newcomer dominates
          if (dominates(p, kept(i))) kept.remove(i)
          i -= 1
        }
        kept += p
      }
    }
    kept.iterator
  }

  /** Skyline of the distinct `maximize` ++ `minimize` points of `df`
    * (all objective columns cast to LONG). Output columns keep the input
    * names and signs, one row per non-dominated distinct point.
    */
  def skyline(df: DataFrame, maximize: Seq[String],
              minimize: Seq[String]): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val proj = maximize.map(c => col(c).cast("long")) ++
      minimize.map(c => (-col(c).cast("long")).as(c))
    val pts: Dataset[Seq[Long]] =
      df.select(array(proj: _*)).distinct().as[Seq[Long]]
    // repartition(1), not coalesce(1): coalesce would fuse phase 1 into the
    // single final partition and run the whole scan serially.
    val sky = pts.mapPartitions(localSkyline)
      .repartition(1)
      .mapPartitions(localSkyline)
    val names = maximize ++ minimize
    val back = names.zipWithIndex.map { case (n, i) =>
      val v = col("value").getItem(i)
      (if (minimize.contains(n)) -v else v).as(n)
    }
    sky.toDF().select(back: _*)
  }
}
