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

  /** PII patterns shared by [[piiStats]] and [[scrubPii]]. Restricted to
    * regex constructs with identical semantics in Java regex (Spark) and
    * RE2 (DuckDB/most engines): character classes, greedy counted repeats,
    * no alternation/lookaround — detection is engine-reproducible, like the
    * md5-derived hash families. `[.]` instead of `\.` keeps the strings
    * SQL-quoting-safe.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
  /** E.164-style international numbers: `+` then 7-15 digits. */
  val PhonePattern = "\\+[0-9]{7,15}"
  val Ipv4Pattern =
    "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"

  /** Per-row PII match counts + a `has_pii` gate over `textCol`. Narrow
    * codegen'd regexp projection — shuffle-free, one pass over the text
    * column at any scale (the same shape as the charset QC scan).
    */
  def piiStats(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_emails", regexp_count(col(textCol), lit(EmailPattern)))
      .withColumn("n_phones", regexp_count(col(textCol), lit(PhonePattern)))
      .withColumn("n_ipv4", regexp_count(col(textCol), lit(Ipv4Pattern)))
      .withColumn(
        "has_pii",
        (col("n_emails") + col("n_phones") + col("n_ipv4")) > 0)

  /** Redact PII spans in `textCol` with typed placeholders. Emails are
    * replaced FIRST so address-internal digits/dots can't be re-matched as
    * phone/IP fragments; the placeholders themselves contain no PII-matchable
    * characters, so the passes compose without interference.
    */
  def scrubPii(df: DataFrame, textCol: String,
               out: String = "text_scrubbed"): DataFrame =
    df.withColumn(
      out,
      regexp_replace(
        regexp_replace(
          regexp_replace(col(textCol), EmailPattern, "<EMAIL>"),
          Ipv4Pattern, "<IP>"),
        PhonePattern, "<PHONE>"))
}
