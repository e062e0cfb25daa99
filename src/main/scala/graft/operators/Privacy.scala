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

  /** t-closeness audit (total-variation flavor): k-anonymity hides WHO is
    * in an equivalence class; it says nothing about WHAT the class reveals
    * — a class where every member shares the sensitive value leaks it to
    * anyone who can place a person in the class. Per quasi-identifier
    * class, the total-variation distance between the class's sensitive
    * distribution and the global one:
    *
    *   TVD(g) = ½ Σ_c |n_gc/n_g − n_c/N|
    *
    * computed as exact integer ppm via cross-multiplication
    * (Σ|n_gc·N − n_c·n_g| · 10⁶ DIV (2·n_g·N) — no float division), with
    * `breach` = TVD > `tPpm`. Absent (class, category) cells contribute
    * |0 − n_c·n_g| — the zero-fill grid is class-count × category-count
    * sized (categories are bounded by construction: the caller passes a
    * BANDED sensitive expression), never data-sized. Cost: one rollup to
    * (class, category) grain, one class-sized cross join with the
    * broadcast category margin.
    */
  def tCloseness(df: DataFrame, qidCols: Seq[String],
                 sensitive: Column, tPpm: Long): DataFrame = {
    val qs = qidCols.map(col)
    val cells = df.select(qs :+ sensitive.as("_cat"): _*)
      .groupBy(qs :+ col("_cat"): _*).agg(count(lit(1)).as("_ngc"))
    val classes = cells.groupBy(qs: _*).agg(sum(col("_ngc")).as("_ng"))
    val cats = cells.groupBy(col("_cat")).agg(sum(col("_ngc")).as("_nc"))
    val total = cats.agg(sum(col("_nc")).as("_N"))
    classes.crossJoin(broadcast(cats))
      .join(cells, qidCols :+ "_cat", "left")
      .crossJoin(broadcast(total))
      .select(qs ++ Seq(col("_ng"), col("_N"),
        abs(coalesce(col("_ngc"), lit(0L)) * col("_N") -
              col("_nc") * col("_ng")).as("_d")): _*)
      .groupBy(qs :+ col("_ng") :+ col("_N"): _*)
      .agg(sum(col("_d")).as("_sd"))
      .select(qs ++ Seq(col("_ng").as("class_size"),
        expr("_sd * 1000000L DIV (2L * _ng * _N)").as("tvd_ppm")): _*)
      .withColumn("breach", col("tvd_ppm") > tPpm)
  }

  /** Distinct l-diversity audit: per quasi-identifier class, the class
    * size and the number of DISTINCT sensitive values — a k-anonymous
    * class whose members all share one sensitive value still leaks it
    * (the homogeneity attack k-anonymity misses; l-diversity is the
    * standard fix between [[kAnonymize]] and the distribution-shape
    * [[tCloseness]]). `meets` = distinct count ≥ l.
    *
    * One rollup to (class, sensitive) grain then to class grain — both
    * combine-enabled, output class-count-sized at any corpus scale.
    */
  def lDiversity(df: DataFrame, qidCols: Seq[String],
                 sensitive: Column, l: Long): DataFrame = {
    val qs = qidCols.map(col)
    df.select(qs :+ sensitive.as("_sv"): _*)
      .groupBy(qs :+ col("_sv"): _*).agg(count(lit(1)).as("_n"))
      .groupBy(qs: _*)
      .agg(sum(col("_n")).as("class_size"),
           count(lit(1)).as("n_distinct_sensitive"))
      .withColumn("meets_l", col("n_distinct_sensitive") >= l)
  }
}
