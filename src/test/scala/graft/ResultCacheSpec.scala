package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.plans.ResultCache

/** Result-cache contract: semantic (plan-canonical) keying, cross-build
  * hits, distinct plans never collide, and the documented invalidation
  * obligation on source rewrite.
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

  test("source rewrite is the writer's invalidation: stale until dropped") {
    val base = Files.createTempDirectory("rc2").toString
    val src = Files.createTempDirectory("rc2_src").toString
    Seq((1L, "a")).toDF("k", "g").write.parquet(s"$src/t")
    def q = spark.read.parquet(s"$src/t").groupBy("g")
      .agg(count(lit(1)).as("n"))
    val fp = ResultCache.fingerprint(q)
    ResultCache.through(q, base)
    // rewrite the source: the path-keyed fingerprint is unchanged, so the
    // cache still serves the OLD result — the documented contract...
    Seq((1L, "a"), (2L, "a")).toDF("k", "g")
      .write.mode("overwrite").parquet(s"$src/t")
    val fresh = spark.read.parquet(s"$src/t").groupBy("g")
      .agg(count(lit(1)).as("n"))
    val (stale, hit) = ResultCache.through(fresh, base)
    assert(hit && stale.head().getLong(1) === 1L)
    // ...and dropping the entry (what the writer must do) recomputes.
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$base/$fp"), true)
    val (fixed, hit2) = ResultCache.through(fresh, base)
    assert(!hit2 && fixed.head().getLong(1) === 2L)
  }
}
