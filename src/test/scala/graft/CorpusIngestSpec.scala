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
}
