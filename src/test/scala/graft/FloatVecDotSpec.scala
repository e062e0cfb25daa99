package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.functions.{FloatVecDot, GraftExtensions}

/** The native codegen dot product must be bit-for-bit identical to the
  * built-in HOF composition it replaces (same double-promotion, same
  * left-to-right fold) — the DuckDB oracle depends on that contract.
  */
class FloatVecDotSpec extends SparkTestBase {

  import spark.implicits._

  private def foldDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
              lit(0.0), (acc, x) => acc + x)

  test("codegen dot == HOF fold dot, bit-for-bit, on random vectors") {
    val rnd = new Random(1)
    val vecs = (0 until 200).map { i =>
      (i.toLong, Array.fill(64)((rnd.nextFloat() - 0.5f) * 3f))
    }.toDF("id", "v")
    val pairs = vecs.as("a").join(vecs.as("b"), $"a.id" < $"b.id")
      .select(FloatVecDot($"a.v", $"b.v").as("native"),
              foldDot($"a.v", $"b.v").as("fold"))
    assert(pairs.filter($"native" =!= $"fold").count() === 0)
    // nulls propagate like any binary expression
    val withNull = Seq((Some(Array(1f, 2f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
      .select(FloatVecDot($"a", $"b").as("d"))
    assert(withNull.filter($"d".isNull).count() === 1)
  }

  test("native PQ distance table == HOF composition, bit-for-bit") {
    val rnd = new Random(7)
    val vecs = (0 until 300).map { i =>
      (i.toLong, Array.fill(64)((rnd.nextFloat() - 0.5f) * 2f))
    }.toDF("vec_id", "embedding")
    val native = operators.Similarity
      .pqAssign(vecs, "vec_id", "embedding", dim = 64, m = 4, k = 16)
    val spec = operators.Similarity
      .pqAssignSpec(vecs, "vec_id", "embedding", dim = 64, m = 4, k = 16)
    assert(native.exceptAll(spec).count() === 0)
    assert(spec.exceptAll(native).count() === 0)
    assert(native.count() === 300 * 4)
  }

  test("native sign-LSH bucket == HOF composition, bit-for-bit") {
    val rnd = new Random(7)
    val vecs = (0 until 300).map { i =>
      (i.toLong, Array.fill(64)((rnd.nextFloat() - 0.5f) * 3f))
    }.toDF("id", "v")
    for (planes <- Seq(4, 8)) {
      val cmp = vecs.select(
        graft.functions.SignLshBucket($"v", planes).as("native"),
        graft.operators.Similarity.lshBucketSpec($"v", planes).as("spec"))
      assert(cmp.filter($"native" =!= $"spec").count() === 0)
    }
    // null vector yields null
    val withNull = Seq(Option.empty[Array[Float]]).toDF("v")
      .select(graft.functions.SignLshBucket($"v", 4).as("b"))
    assert(withNull.filter($"b".isNull).count() === 1)
  }

  test("SQL registration via GraftExtensions") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT float_vec_dot(array(1.0f, 2.0f), array(3.0f, 4.0f)) AS d")
      .as[Double].head()
    assert(r === 11.0)
    val nfc = spark.sql("SELECT nfc_normalize('café') AS s")
      .as[String].head()
    assert(nfc === "café")
    val (isz, fc) = spark.sql(
      "SELECT sorted_intersect_size(array(1, 3, 5), array(3, 4, 5)) AS i," +
        " sorted_first_common(array(1, 3, 5), array(3, 4, 5)) AS f")
      .as[(Int, Int)].head()
    assert(isz === 2 && fc === 3)
  }

  test("optimizer rule rewrites md5(concat_ws('-', ...)) to the native expr") {
    GraftExtensions.register(spark)
    // id-derived columns: literal inputs (even via a view) constant-fold the
    // whole expression before the plan can be inspected
    spark.range(1)
      .selectExpr("CAST(id AS STRING) AS c1", "CAST(id + 1 AS STRING) AS c2")
      .createOrReplaceTempView("nk_t")
    val df = spark.sql(
      "SELECT md5(concat_ws('-', c1, CAST(NULL AS STRING), c2)) AS k FROM nk_t")
    assert(df.queryExecution.optimizedPlan.toString.contains("md5_concat_ws"),
           df.queryExecution.optimizedPlan.toString)
    // identical bytes to the built-in composition (null skipped with its sep)
    val builtin = spark.sql("SELECT md5('0-1') AS k").as[String].head()
    assert(df.as[String].head() === builtin)
    // a different separator must NOT be rewritten
    val other = spark.sql(
      "SELECT md5(concat_ws('|', c1, c2)) AS k FROM nk_t")
    assert(!other.queryExecution.optimizedPlan.toString.contains("md5_concat_ws"))
    assert(other.as[String].head() ===
      spark.sql("SELECT md5('0|1') AS k").as[String].head())
  }
}
