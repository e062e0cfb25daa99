package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group trend fitting: closed-form OLS (slope / intercept / R²) from
  * INTEGER sufficient statistics.
  *
  * A regression per key over a 100 TB fact table must not collect series to
  * the driver or sort anything: ordinary least squares needs only the six
  * sums (n, Σx, Σy, Σxy, Σx², Σy²), each a combine-enabled aggregate — one
  * map-side-partial exchange on the group key and the fit is done. Keeping
  * x and y INTEGER (epoch-day index, event counts) makes the sums exact, so
  * the final double arithmetic is a fixed closed-form expression over exact
  * integers — bit-reproducible across engines, partitionings, and retries
  * (a float Σ would be addition-order-dependent and hash-unstable).
  *
  * The same sufficient-statistics algebra backs X118; this is its regression
  * face — the "is this key growing or dying" report every corpus/activity
  * dashboard needs (cf. growth-curve X169, which reports the raw series).
  */
object Trend {

  /** OLS of `yCol` (integer) against `xCol` (integer) per `keys` group:
    * `n, slope, intercept, r2`, doubles rounded to 6 decimals.
    *
    * Degenerate groups are explicit: a single point (or all-equal x) has no
    * slope — NULL slope/intercept; R² is NULL when y is constant (zero
    * variance) and the slope denominator is non-zero.
    */
  def fit(df: DataFrame, keys: Seq[String], xCol: Column, yCol: Column)
      : DataFrame = {
    val stats = df
      .select(keys.map(col) :+ xCol.cast("long").as("_x")
                :+ yCol.cast("long").as("_y"): _*)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("_n"),
           sum(col("_x")).as("_sx"),
           sum(col("_y")).as("_sy"),
           sum(col("_x") * col("_y")).as("_sxy"),
           sum(col("_x") * col("_x")).as("_sxx"),
           sum(col("_y") * col("_y")).as("_syy"))
    // n*Sxx - Sx², n*Sxy - Sx*Sy, n*Syy - Sy² are exact longs; the two
    // divisions below are the only float steps.
    stats
      .withColumn("_dx", col("_n") * col("_sxx") - col("_sx") * col("_sx"))
      .withColumn("_dy", col("_n") * col("_syy") - col("_sy") * col("_sy"))
      .withColumn("_cov", col("_n") * col("_sxy") - col("_sx") * col("_sy"))
      .withColumn("slope",
        when(col("_dx") =!= 0L,
             round(col("_cov").cast("double") / col("_dx").cast("double"), 6)))
      .withColumn("intercept",
        when(col("_dx") =!= 0L,
             round((col("_sy").cast("double") -
                      col("_cov").cast("double") / col("_dx").cast("double") *
                      col("_sx").cast("double")) /
                     col("_n").cast("double"), 6)))
      .withColumn("r2",
        when(col("_dx") =!= 0L && col("_dy") =!= 0L,
             round((col("_cov") * col("_cov")).cast("double") /
                     (col("_dx") * col("_dy")).cast("double"), 6)))
      .select(keys.map(col) :+ col("_n").as("n")
                :+ col("slope") :+ col("intercept") :+ col("r2"): _*)
  }
}
