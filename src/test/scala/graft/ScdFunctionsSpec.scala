package graft

import org.apache.spark.sql.functions._

import graft.functions.ScdFunctions
import graft.operators.Scd2
import graft.sources.IncrementalSource

/** Unit tests for the shared column builders + config resolution + the
  * incremental source scan.
  */
class ScdFunctionsSpec extends SparkTestBase {

  import spark.implicits._

  test("surrogate key is null-safe: NULL key components match themselves") {
    val df = Seq(("a", Option.empty[String]), ("a", None), ("b", Some("x")))
      .toDF("k1", "k2")
      .withColumn("_sk", ScdFunctions.surrogateKeyOf(Seq("k1", "k2")))
    val hashes = df.select("_sk").collect().map(_.getString(0))
    assert(hashes(0) === hashes(1), "NULL == NULL under the hash")
    assert(hashes(0) !== hashes(2))
  }

  test("native surrogate key == md5(concat_ws) composition, byte-for-byte") {
    val df = Seq(
      (1L, Some("x"), Some(2.5), Some(ts("2024-03-01 12:34:56"))),
      (2L, None, None, None),
      (3L, Some(""), Some(-0.0), Some(ts("1900-01-01 00:00:00"))))
      .toDF("a", "b", "c", "d")
    val cols = Seq("a", "b", "c", "d").map(col)
    val cmp = df.select(
      ScdFunctions.surrogateKey(cols).as("native"),
      ScdFunctions.surrogateKeySpec(cols).as("spec"))
    assert(cmp.filter($"native" =!= $"spec").count() === 0)
    // concat_ws null-skipping semantics when fed raw (un-coalesced) inputs
    val raw = df.select(
      graft.functions.Md5ConcatWs(Seq($"b", $"b")).as("native"),
      md5(concat_ws("-", $"b", $"b")).as("spec"))
    assert(raw.filter($"native" =!= $"spec").count() === 0)
  }

  test("conditional_change_event: A->A->B->A is runs 0,0,1,2") {
    val df = Seq((1, 1, "A"), (1, 2, "A"), (1, 3, "B"), (1, 4, "A"))
      .toDF("k", "t", "h")
    val runs = ScdFunctions
      .withRunId(df, "h", Seq("k"), "t", "_run")
      .orderBy("t").select("_run").collect().map(_.getLong(0))
    assert(runs.toSeq === Seq(0L, 0L, 1L, 2L))
  }

  test("checkColumns: default excludes keys, audit, updated_at, explicit excludes") {
    val cfg = ScdConfig(uniqueKey = Seq("id"), changeExclude = Seq("noise"))
    val cols = Seq("id", "a", "b", "noise", "_updated_at", "_is_current",
      "_valid_from", "_valid_to", "_change_type")
    assert(cfg.checkColumns(cols) === Seq("a", "b"))
  }

  test("checkColumns: include list intersected case-insensitively, then filtered") {
    val cfg = ScdConfig(
      uniqueKey = Seq("id"),
      changeInclude = Some(Seq("A", "missing", "ID", "b")),
      changeExclude = Seq("b"))
    assert(cfg.checkColumns(Seq("id", "a", "b", "c", "_updated_at")) === Seq("A"))
  }

  test("configured created_at must exist in the schema") {
    val cfg = ScdConfig(uniqueKey = Seq("id"), createdAtCol = Some("nope"))
    val e = intercept[IllegalArgumentException] {
      cfg.validateSchema(Seq("id", "_updated_at"))
    }
    assert(e.getMessage.contains("created_at_column"))
  }

  test("case-insensitive column resolution throughout the pipeline") {
    val df = Seq((1, "x", ts("2024-01-01 00:00:00"))).toDF("ID", "VAL", "TS_COL")
    val cfg = ScdConfig(uniqueKey = Seq("id"), updatedAtCol = "ts_col")
    val out = Scd2.initialLoad(df, cfg)
    assert(out.count() === 1)
    assert(out.columns.toSeq.take(3) === Seq("ID", "VAL", "TS_COL"))
  }

  test("incremental source scan: watermark + run-start cutoff") {
    val source = Seq(
      (1, ts("2024-01-01 00:00:00")),
      (2, ts("2024-01-02 00:00:00")),
      (3, ts("2024-01-03 00:00:00")),
      (4, ts("2024-01-04 00:00:00"))).toDF("id", "loaded_at")
    val target = Seq((1, ts("2024-01-01 00:00:00")))
      .toDF("id", "_loaded_at")

    val scanned = IncrementalSource.scan(source, Some(target), "loaded_at",
      runStartedAt = Some(ts("2024-01-03 00:00:00")))
    assert(scanned.select("id").collect().map(_.getInt(0)).sorted.toSeq === Seq(2, 3))

    // empty target falls back to default_valid_from (keep everything)
    val emptyTarget = target.filter(lit(false))
    val full = IncrementalSource.scan(source, Some(emptyTarget), "loaded_at")
    assert(full.count() === 4)

    // no target at all = initial load, no filter
    assert(IncrementalSource.scan(source, None, "loaded_at").count() === 4)
  }
}
