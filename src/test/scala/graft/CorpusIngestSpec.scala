package graft

import graft.operators.CorpusIngest

/** Idempotent dedup-on-ingest: in-batch dups collapse to min doc_id,
  * cross-batch dups are dropped, and replaying a batch is a no-op.
  */
class CorpusIngestSpec extends SparkTestBase {

  test("in-batch + cross-batch dedup; replay is a no-op; history travels") {
    val session = spark
    import session.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-ci").toString + "/corpus"

    val b1 = Seq((5L, "hello world"), (2L, "Hello   WORLD"), (3L, "other"))
      .toDF("doc_id", "text")
    CorpusIngest.ingest(spark, b1, root)
    val v1 = VersionedTable.read(spark, root)
    assert(v1.select("doc_id").as[Long].collect().toSet === Set(2L, 3L))

    val b2 = Seq((9L, "hello world"), (4L, "brand new")).toDF("doc_id", "text")
    CorpusIngest.ingest(spark, b2, root)
    assert(VersionedTable.read(spark, root)
      .select("doc_id").as[Long].collect().toSet === Set(2L, 3L, 4L))

    // replay of b2 (at-least-once upstream): corpus unchanged
    val v3 = CorpusIngest.ingest(spark, b2, root)
    assert(VersionedTable.read(spark, root).count() === 3)
    assert(v3 === 3L)
    // pre-replay version still queryable
    assert(VersionedTable.readVersion(spark, root, 1).count() === 2)
  }

  test("ingestNearDup drops near-copies of ingested docs and batch losers") {
    val session = spark
    import session.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-cin").toString + "/corpus"

    val baseA = "the quick brown fox jumps over the lazy dog while rain " +
      "falls softly on the quiet village roofs at night and the old clock " +
      "keeps ticking through winter storms beside the warm fire"
    val baseC = "distributed query engines shuffle partition and aggregate " +
      "wide tables across many executor nodes every single day while the " +
      "optimizer prunes columns pushes filters and reorders joins carefully"

    def ingest(b: org.apache.spark.sql.DataFrame) =
      CorpusIngest.ingestNearDup(spark, b, root, bands = 6, rows = 2)

    ingest(
      Seq((1L, baseA), (2L, "totally unrelated text about cooking pasta"))
        .toDF("doc_id", "text"))
    assert(VersionedTable.read(spark, root)
      .select("doc_id").as[Long].collect().toSet === Set(1L, 2L))

    val b2 = Seq(
      (3L, baseA.replace("lazy", "sleepy")), // near-dup of ingested doc 1
      (4L, "totally unrelated text about cooking pasta"), // exact of doc 2
      (5L, baseC),                            // genuinely new
      (6L, baseC.replace("single", "working")), // in-batch near-dup loser
      (7L, baseC)                             // in-batch exact loser
    ).toDF("doc_id", "text")
    ingest(b2)
    assert(VersionedTable.read(spark, root)
      .select("doc_id").as[Long].collect().toSet === Set(1L, 2L, 5L))

    // replay: idempotent (doc 5 now matches itself by fingerprint)
    ingest(b2)
    assert(VersionedTable.read(spark, root)
      .select("doc_id").as[Long].collect().toSet === Set(1L, 2L, 5L))
  }

  test("streaming near-dup ingest == the same batches ingested one by one") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = session.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-cis").toString
    val root = s"$dir/corpus"

    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val source = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val query = graft.streaming.IngestStream
      .nearDupSink(source.toDF().toDF("doc_id", "text"), root,
                   s"$dir/ckpt", bands = 6, rows = 2)
      .start()
    try {
      source.addData(Seq((1L, base), (2L, "unrelated cooking text")))
      query.processAllAvailable()
      source.addData(Seq(
        (3L, base.replace("sigma", "omega")), // near-dup of streamed doc 1
        (4L, "fresh content entirely")))
      query.processAllAvailable()
    } finally query.stop()

    assert(VersionedTable.read(spark, root)
      .select("doc_id").as[Long].collect().toSet === Set(1L, 2L, 4L))
  }
}
