package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.plans.{JoinElimination, PlanContract}

/** FK-based join elimination: fires only when sound, result-identical to
  * the join it removes.
  */
class JoinEliminationSpec extends SparkTestBase {

  import spark.implicits._

  private def setup() = {
    val base = Files.createTempDirectory("je").toString
    Seq((1L, "x", 10L), (2L, "y", 20L), (3L, "x", 30L))
      .toDF("pk", "attr", "w").write.parquet(s"$base/dim")
    // fact: every fk present in dim (declared RI holds), one NULL fk that
    // an inner join must drop.
    Seq((Some(1L), "a", 1L), (Some(1L), "b", 2L), (Some(2L), "a", 3L),
        (None: Option[Long], "a", 99L))
      .toDF("fk", "g", "v").write.parquet(s"$base/fact")
    base
  }

  test("eliminates the unused-dim join; results equal the joined query") {
    val base = setup()
    JoinElimination.register(spark, s"$base/dim", "pk")
    try {
      val fact = spark.read.parquet(s"$base/fact")
      val dim = spark.read.parquet(s"$base/dim")
      val q = fact.join(dim, col("fk") === col("pk"))
        .groupBy(col("g")).agg(sum(col("v")).as("sv"))
      assert(!PlanContract.contains(q, "Join"), PlanContract.planString(q))
      // NULL-fk row dropped exactly as the inner join drops it.
      assert(q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        === Map("a" -> 4L, "b" -> 2L))
    } finally JoinElimination.deregister(spark, s"$base/dim")
  }

  test("does NOT fire when dim columns are consumed") {
    val base = setup()
    JoinElimination.register(spark, s"$base/dim", "pk")
    try {
      val fact = spark.read.parquet(s"$base/fact")
      val dim = spark.read.parquet(s"$base/dim")
      val q = fact.join(dim, col("fk") === col("pk"))
        .groupBy(col("attr")).agg(sum(col("v")).as("sv"))
      assert(PlanContract.contains(q, "Join"))
      assert(q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        === Map("x" -> 3L, "y" -> 3L))
    } finally JoinElimination.deregister(spark, s"$base/dim")
  }

  test("does NOT fire on non-PK join keys or other relations") {
    val base = setup()
    JoinElimination.register(spark, s"$base/dim", "pk")
    try {
      val fact = spark.read.parquet(s"$base/fact")
      val dim = spark.read.parquet(s"$base/dim")
      // join on w (not the declared pk) — must stay a join
      val q1 = fact.join(dim, col("v") === col("w"))
        .groupBy(col("g")).agg(count(lit(1)).as("n"))
      assert(PlanContract.contains(q1, "Join"))
      // self-join of fact (right side is not the declared dim) — stays
      val q2 = fact.as("a")
        .join(spark.read.parquet(s"$base/fact").as("b"),
              col("a.fk") === col("b.v"))
        .groupBy(col("a.g")).agg(count(lit(1)).as("n"))
      assert(PlanContract.contains(q2, "Join"))
    } finally JoinElimination.deregister(spark, s"$base/dim")
  }

  test("deregister restores the join") {
    val base = setup()
    JoinElimination.register(spark, s"$base/dim", "pk")
    JoinElimination.deregister(spark, s"$base/dim")
    val fact = spark.read.parquet(s"$base/fact")
    val dim = spark.read.parquet(s"$base/dim")
    val q = fact.join(dim, col("fk") === col("pk"))
      .groupBy(col("g")).agg(sum(col("v")).as("sv"))
    assert(PlanContract.contains(q, "Join"))
  }
}
