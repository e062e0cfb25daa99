package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.plans.ResultCache

/** Result-cache contract: semantic (plan-canonical) keying, cross-build
  * hits, distinct plans never collide, and content-token re-keying on an
  * in-place source rewrite (no writer-side invalidation protocol).
  */
class ResultCacheSpec extends SparkTestBase {

  import spark.implicits._

  test("semantically identical queries hit; different plans miss") {
    val base = Files.createTempDirectory("rc").toString
    val src = Files.createTempDirectory("rc_src").toString
    Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("k", "g")
      .write.parquet(s"$src/t")
    def q1 = spark.read.parquet(s"$src/t").groupBy("g")
      .agg(count(lit(1)).as("n"))
    val (r1, h1) = ResultCache.through(q1, base)
    val (r2, h2) = ResultCache.through(q1, base) // fresh build, new exprIds
    assert(!h1 && h2)
    assert(r1.collect().toSet === r2.collect().toSet)
    // a different aggregate must key differently
    val q3 = spark.read.parquet(s"$src/t").groupBy("g")
      .agg(sum(col("k")).as("n"))
    val (r3, h3) = ResultCache.through(q3, base)
    assert(!h3)
    assert(r3.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      === Map("a" -> 3L, "b" -> 3L))
  }

  test("in-place source rewrite re-keys via the content token: never stale") {
    val base = Files.createTempDirectory("rc2").toString
    val src = Files.createTempDirectory("rc2_src").toString
    Seq((1L, "a")).toDF("k", "g").write.parquet(s"$src/t")
    def q = spark.read.parquet(s"$src/t").groupBy("g")
      .agg(count(lit(1)).as("n"))
    val fp1 = ResultCache.fingerprint(q)
    val (r1, h1) = ResultCache.through(q, base)
    assert(!h1 && r1.head().getLong(1) === 1L)
    // rewrite the source in place: the plan is identical but the input
    // files' names/sizes/mtimes changed, so the fingerprint changes and
    // the stale entry simply stops being addressed
    Seq((1L, "a"), (2L, "a")).toDF("k", "g")
      .write.mode("overwrite").parquet(s"$src/t")
    val fresh = spark.read.parquet(s"$src/t").groupBy("g")
      .agg(count(lit(1)).as("n"))
    assert(ResultCache.fingerprint(fresh) !== fp1)
    val (r2, h2) = ResultCache.through(fresh, base)
    assert(!h2 && r2.head().getLong(1) === 2L)
    // and the new key hits on re-query
    val (r3, h3) = ResultCache.through(fresh, base)
    assert(h3 && r3.head().getLong(1) === 2L)
  }
}
