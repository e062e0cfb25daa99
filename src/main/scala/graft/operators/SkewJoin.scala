package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual salted join for hot-key skew: the result is EXACTLY the plain
  * equi-join, but the shuffle distributes every hot key over `nSalts`
  * reducer partitions.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin`) is the first
  * resort and needs no code — but it only splits a skewed SORT-MERGE
  * partition at runtime. Salting is the static fallback for the cases AQE
  * cannot rewrite (skewed aggregation feeding the join, a broadcast-ineligible
  * build side, or a deterministic-layout requirement), and the standard
  * pattern on any engine: fan the fact side out by a salt derived from a
  * per-row attribute, replicate the dimension side `nSalts` times, join on
  * (key, salt). Replication multiplies the SMALL side only — the big side
  * still moves once.
  */
object SkewJoin {

  /** Equi-join `large ⋈ small` on `keys`, salted `nSalts` ways.
    *
    * `saltOf` must be a deterministic function of the large row (e.g.
    * `pmod(hash(col("event_id")), nSalts)`) so the plan is reproducible;
    * any value in [0, nSalts) preserves correctness since the small side
    * carries every salt.
    */
  def salted(large: DataFrame,
             small: DataFrame,
             keys: Seq[String],
             saltOf: Column,
             nSalts: Int): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    val saltedLarge = large.withColumn("_salt", saltOf.cast("int"))
    val saltedSmall = small.withColumn(
      "_salt", explode(sequence(lit(0), lit(nSalts - 1))))
    saltedLarge.join(saltedSmall, keys :+ "_salt").drop("_salt")
  }
}
