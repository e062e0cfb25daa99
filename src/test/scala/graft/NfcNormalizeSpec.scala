package graft

import org.apache.spark.sql.functions._

import graft.functions.NfcNormalize

/** Native NFC normalization: codegen + interpreted parity, null/empty
  * handling, and the dedup-collapse semantics the expression exists for.
  * All literals spelled as \\u escapes so no editor/tool can silently
  * re-normalize the fixtures.
  */
class NfcNormalizeSpec extends SparkTestBase {

  import spark.implicits._

  private val composedCafe = "caf\u00e9"
  private val decomposedCafe = "café"
  // s with dot below + dot above: composed U+1E69; decomposed with marks
  // in NON-canonical order (dot above first) — NFC must reorder + compose.
  private val composedS = "\u1e69"
  private val decomposedS = "ṩ"

  test("NfcNormalize composes decomposed sequences; already-NFC is identity") {
    val rows = Seq(
      ("a", composedCafe), ("b", decomposedCafe),
      ("c", composedS), ("d", decomposedS),
      ("e", ""), ("f", null)
    ).toDF("id", "s")
    val got = rows.select(col("id"), NfcNormalize(col("s")).as("n"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("a") === composedCafe)
    assert(got("b") === composedCafe)
    assert(got("c") === composedS)
    assert(got("d") === composedS)
    assert(got("e") === "")
    assert(got("f") === null)
  }

  test("NfcNormalize collapses byte-distinct spell variants for dedup") {
    val df = Seq("résumé", "résumé").toDF("s")
    assert(df.select(countDistinct(col("s"))).as[Long].head() === 2L)
    assert(df.select(countDistinct(NfcNormalize(col("s"))))
      .as[Long].head() === 1L)
  }
}
