package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling and dataset splitting.
  *
  * The assignment for a row depends only on its id — not on partitioning,
  * row order, executor count, or Spark version — so a 100 TB corpus resample
  * or a train/val/test split is exactly reproducible anywhere (including a
  * different engine: the bucket is an md5 residue both sides compute
  * bit-identically). Pure per-row projection: no shuffle, no state.
  */
object Sampling {

  /** Uniform hash bucket in [0, den): `md5(id)`'s first 8 hex chars as an
    * unsigned int, mod den. Independent of the id's distribution (sequential
    * ids land uniformly).
    */
  def hashBucket(id: Column, den: Int): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("long") % den

  /** Keep ~num/den of rows, deterministically by id. */
  def sample(df: DataFrame, idCol: String, num: Int, den: Int): DataFrame =
    df.filter(hashBucket(col(idCol), den) < num)

  /** Stratified cap: keep at most `cap` rows per stratum, chosen as the rows
    * with the smallest `md5(id)` — a deterministic uniform draw within each
    * stratum (id-hash order is independent of the stratum's own ordering).
    * `sample_rank` is the row's 1-based draw position.
    *
    * One shuffle on the strata columns; the per-stratum window is a top-k
    * over the stratum, so skewed strata cost sort-of-stratum, not a cross
    * product. For strata far larger than `cap` at 100 TB, pre-filter with a
    * per-stratum approximate quantile of the hash to cut the sort input.
    */
  def stratifiedCap(df: DataFrame,
                    idCol: String,
                    strataCols: Seq[String],
                    cap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= cap)
  }

  /** Weighted stratified cap — sequential Poisson sampling (Ohlsson 1998),
    * the deterministic analogue of weighted reservoir sampling: each row
    * draws `u = hashBucket(id, 1e6)` and keeps the `cap` smallest
    * `priority = u·10^12 div weight` per stratum, so inclusion probability
    * is ~proportional to weight (a 10× heavier document is ~10× likelier
    * drawn). All-integer priorities (u ≤ 1e6, so u·10^12 < 2^63): the drawn
    * set is engine- and partitioning-exact, unlike `u^(1/w)` A-RES keys
    * whose float pow drifts across libm builds.
    *
    * Same cost shape as [[stratifiedCap]]: one shuffle on the strata, a
    * top-k window per stratum. Rows with weight <= 0 are excluded (they
    * have no sampling mass).
    */
  def weightedCap(df: DataFrame,
                  idCol: String,
                  strataCols: Seq[String],
                  weightCol: String,
                  cap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(col("_pri"), col(idCol))
    df.filter(col(weightCol) > 0)
      .withColumn("_u", hashBucket(col(idCol), 1000000))
      .withColumn("_pri", expr(s"_u * 1000000000000 DIV $weightCol"))
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= cap)
      .drop("_u")
      .withColumnRenamed("_pri", "priority")
  }

  /** Per-stratum sampling rates (`df.stat.sampleBy`, made deterministic):
    * keep ~num/den of each stratum's rows by the same id-hash draw, strata
    * not listed keep `defaultNum`/den. Shuffle-free per-row filter — the
    * corpus-reweighting primitive (downsample the over-represented source,
    * keep all of the rare one).
    */
  def sampleByRates(df: DataFrame,
                    idCol: String,
                    strataCol: String,
                    rates: Seq[(String, Int)],
                    den: Int = 100,
                    defaultNum: Int = 0): DataFrame = {
    val rate = rates.foldRight(lit(defaultNum): Column) {
      case ((s, num), rest) => when(col(strataCol) === s, lit(num)).otherwise(rest)
    }
    df.filter(hashBucket(col(idCol), den) < rate)
  }

  /** Keep-rates that remix the corpus to target per-stratum ppm shares —
    * the data-mixing primitive (rebalance sources/languages to a recipe).
    * Downsampling only: the largest feasible output corpus F* satisfies
    * `rate_s = target_s · F* / mass_s <= 1` for every listed stratum, i.e.
    * `F* = min_s(mass_s / target_s)`; the binding stratum keeps ~everything
    * and over-represented strata are cut to proportion. All arithmetic is
    * integer (DECIMAL(38,0) products guard the ppm-scale overflow at
    * 100 TB token masses), so the rates — and therefore the kept set — are
    * engine-exact. Cost: one dimension-sized aggregate + a window over the
    * strata relation.
    *
    * Returns one row per listed stratum:
    * `(stratum, mass, target_ppm, rate_ppm)`. Strata not listed are
    * implicitly rate-0 (dropped by [[remixApply]]'s inner join).
    */
  def remixRates(df: DataFrame,
                 strataCol: String,
                 weight: Column,
                 targetPpm: Seq[(String, Long)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(targetPpm.nonEmpty, "need at least one target stratum")
    require(targetPpm.forall(_._2 > 0), "target shares must be positive ppm")
    require(targetPpm.map(_._2).sum <= 1000000L,
            "target shares must sum to <= 1000000 ppm")
    val tcol = targetPpm.foldRight(lit(null).cast("long")) {
      case ((s, t), rest) => when(col(strataCol) === s, lit(t)).otherwise(rest)
    }
    df.filter(col(strataCol).isin(targetPpm.map(_._1): _*))
      .groupBy(col(strataCol))
      .agg(sum(weight).cast("decimal(38,0)").as("mass"))
      .withColumn("target_ppm", tcol)
      .withColumn("_f", expr("mass * 1000000 DIV target_ppm"))
      .withColumn("_fstar",
                  min(col("_f")).over(Window.partitionBy(graft.functions.DimKey.one).rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn(
        "rate_ppm",
        least(lit(1000000L),
              expr("CAST(target_ppm AS DECIMAL(38,0)) * _fstar DIV mass")))
      .select(col(strataCol), col("mass").cast("long").as("mass"),
              col("target_ppm"), col("rate_ppm"))
  }

  /** Apply a [[remixRates]] table: broadcast it back onto the corpus and
    * keep each row iff its deterministic id-hash draw (den = 1e6) falls
    * under its stratum's rate. Shuffle-free on the corpus side.
    */
  def remixApply(df: DataFrame,
                 idCol: String,
                 strataCol: String,
                 rates: DataFrame): DataFrame =
    df.join(broadcast(rates.select(col(strataCol), col("rate_ppm"))),
            Seq(strataCol))
      .filter(hashBucket(col(idCol), 1000000) < col("rate_ppm"))

  /** Label every row with a split name by cumulative per-mille weight,
    * e.g. Seq("train" -> 980, "val" -> 10, "test" -> 10). Weights must sum
    * to <= den; rows past the last cumulative bound get the last label.
    */
  def split(df: DataFrame,
            idCol: String,
            weights: Seq[(String, Int)],
            den: Int = 1000): DataFrame = {
    require(weights.nonEmpty && weights.map(_._2).sum <= den,
            s"weights must sum to <= $den")
    val bucket = hashBucket(col(idCol), den)
    val bounds = weights.scanLeft(0)(_ + _._2).tail
    val labeled = weights.map(_._1).zip(bounds)
    val expr = labeled.init.foldRight(lit(labeled.last._1): Column) {
      case ((name, bound), rest) => when(bucket < bound, lit(name)).otherwise(rest)
    }
    df.withColumn("split", expr)
  }
}
