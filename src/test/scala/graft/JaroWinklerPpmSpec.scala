package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Linkage

/** r15 native-rewrite pin: `graft.functions.JaroWinklerPpm` (the codegen
  * expression behind `Linkage.withJaroWinklerPpm`) must be BIT-IDENTICAL
  * to the packed-bitmask SQL fold it replaced — the reference fold is
  * preserved here verbatim and both run over a transposition-heavy
  * fixture plus the full q714-shape blocked bigram vocabulary.
  */
class JaroWinklerPpmSpec extends SparkTestBase {

  /** The r14 reference implementation, verbatim (2^20 mask packing). */
  private def sqlFoldRef(df: DataFrame, c1: String, c2: String): DataFrame = {
    val code = "1048576"
    df
      .withColumn("_l1", length(col(c1)).cast("int"))
      .withColumn("_l2", length(col(c2)).cast("int"))
      .withColumn("_w", expr("greatest(greatest(_l1, _l2) DIV 2 - 1, 0)"))
      .withColumn("_st", expr(
        "aggregate(sequence(1, _l1), 0L, (st, i) -> " +
          "IF(size(filter(IF(greatest(1, i - _w) > least(_l2, i + _w), array(), " +
          "sequence(greatest(1, i - _w), least(_l2, i + _w))), " +
          s"j -> ((st % $code) DIV shiftleft(1L, j - 1)) % 2 = 0 " +
          s"AND substring($c2, j, 1) = substring($c1, i, 1))) = 0, st, " +
          s"st + shiftleft(1L, i - 1) * $code + shiftleft(1L, " +
          "element_at(filter(IF(greatest(1, i - _w) > least(_l2, i + _w), array(), " +
          "sequence(greatest(1, i - _w), least(_l2, i + _w))), " +
          s"j -> ((st % $code) DIV shiftleft(1L, j - 1)) % 2 = 0 " +
          s"AND substring($c2, j, 1) = substring($c1, i, 1)), 1) - 1)))"))
      .withColumn("m", expr(s"CAST(bit_count(_st DIV $code) AS BIGINT)"))
      .withColumn("_t_raw", expr(
        "IF(m = 0, 0L, " +
        "CAST(size(filter(sequence(1, CAST(m AS INT)), k -> " +
          s"substring($c1, element_at(filter(sequence(1, _l1), i -> (_st DIV $code DIV shiftleft(1L, i - 1)) % 2 = 1), k), 1) != " +
          s"substring($c2, element_at(filter(sequence(1, _l2), j -> (_st % $code DIV shiftleft(1L, j - 1)) % 2 = 1), k), 1))) AS BIGINT))"))
      .withColumn("jaro_ppm", expr(
        "IF(m = 0, 0L, " +
          "(m * m * _l2 + m * m * _l1 + (m - _t_raw DIV 2) * _l1 * _l2) " +
          "* 1000000 DIV (3 * _l1 * _l2 * m))"))
      .withColumn("_pl", expr(
        s"coalesce(array_min(filter(sequence(1, least(4, least(_l1, _l2))), " +
          s"k -> substring($c1, k, 1) != substring($c2, k, 1))) - 1, " +
          "least(4, least(_l1, _l2)))"))
      .withColumn("jw_ppm", expr(
        "IF(m = 0, 0L, jaro_ppm + _pl * (1000000 - jaro_ppm) DIV 10)"))
      .withColumn("transpositions", expr("_t_raw DIV 2"))
      .select(col(c1), col(c2), col("m"), col("transpositions"),
              col("jaro_ppm"), col("jw_ppm"))
  }

  private def nativeOf(df: DataFrame, c1: String, c2: String): DataFrame =
    Linkage.withJaroWinklerPpm(df, c1, c2)
      .select(col(c1), col(c2), col("m"), col("transpositions"),
              col("jaro_ppm"), col("jw_ppm"))

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toVector).toSeq.sortBy(_.mkString("|"))

  test("native == SQL fold on adversarial pairs") {
    import spark.implicits._
    val pairs = Seq(
      ("CRATE", "TRACE"),             // classic transposition case
      ("PENNSYLVANIA", "PENCILVENIA"),
      ("DWAYNE", "DUANE"),
      ("MARTHA", "MARHTA"),           // pure transposition
      ("a", "a"), ("a", "b"),         // 1-char corners
      ("abcdefghijklmnopqrst", "abcdefghijklmnopqrst"), // 20-char cap
      ("abcdefghijklmnopqrst", "tsrqponmlkjihgfedcba"),
      ("xxxx", "yyyy"),               // m = 0
      ("azure", "blue"), ("rosy", "rose"), ("navy", "ivory")
    ).toDF("x", "y")
    assert(rows(nativeOf(pairs, "x", "y")) === rows(sqlFoldRef(pairs, "x", "y")))
  }

  test("native == SQL fold on the q714-shape blocked vocabulary") {
    import spark.implicits._
    val words = Seq("almond", "antique", "aquamarine", "azure", "beige",
      "bisque", "black", "blanched", "blue", "blush", "brown", "burlywood",
      "burnished", "chartreuse", "chiffon", "chocolate", "coral",
      "cornflower", "cornsilk", "cream", "cyan", "dark", "deep", "dim",
      "dodger", "drab", "firebrick", "floral", "forest", "frosted",
      "gainsboro", "ghost", "goldenrod", "green", "grey", "honeydew",
      "hot", "indian", "ivory", "khaki")
    val bigrams = (for (a <- words; b <- words if a != b)
      yield a + b).filter(t => t.length >= 3 && t.length <= 20)
      .distinct.toDF("t")
      .withColumn("blk", substring(col("t"), 1, 1))
    val cand = bigrams.as("a").join(bigrams.as("b"), Seq("blk"))
      .filter(col("a.t") < col("b.t"))
      .select(col("a.t").as("x"), col("b.t").as("y"))
      .limit(3000)
      .localCheckpoint() // both sides read the SAME candidate sample
    assert(cand.count() > 500)
    assert(rows(nativeOf(cand, "x", "y")) === rows(sqlFoldRef(cand, "x", "y")))
  }
}
