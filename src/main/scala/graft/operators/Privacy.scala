package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-anonymity over caller-supplied quasi-identifier generalizations.
  *
  * A released row is k-anonymous when at least k rows share its
  * quasi-identifier tuple. The caller passes the GENERALIZED quasi columns
  * (banded numerics, truncated codes, coarsened categories) — choosing the
  * generalization lattice is policy, not engine work — and the operator
  * computes each equivalence-class size and suppresses (nulls out) the
  * quasi values of rows in classes smaller than k.
  *
  * Cost: one hash shuffle on the quasi tuple. The class-size count is a
  * window over the quasi partition, so at 100 TB this behaves exactly like
  * the SCD audit windows: combine-friendly, skew-bounded by the largest
  * equivalence class (large classes are the GOOD case here — they are the
  * anonymous ones).
  */
object Privacy {

  /** Attach `class_size` and `suppressed`, nulling quasi columns of rows in
    * classes smaller than `k`. `quasi` maps output column name -> the
    * generalized expression.
    */
  def kAnonymize(df: DataFrame,
                 quasi: Seq[(String, Column)],
                 k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, "k must be >= 1")
    val named = quasi.foldLeft(df) { case (d, (name, expr)) =>
      d.withColumn(name, expr)
    }
    val w = Window.partitionBy(quasi.map { case (n, _) => col(n) }: _*)
    val sized = named
      .withColumn("class_size", count(lit(1)).over(w))
      .withColumn("suppressed", col("class_size") < k)
    quasi.foldLeft(sized) { case (d, (name, _)) =>
      d.withColumn(name,
                   when(col("suppressed"), lit(null)).otherwise(col(name)))
    }
  }
}
