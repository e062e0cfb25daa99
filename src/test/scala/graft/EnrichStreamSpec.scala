package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EnrichStream

/** Stream-static point-in-time enrichment matches the batch enrich on the
  * same facts, including before-first-version and unknown-key NULLs.
  */
class EnrichStreamSpec extends SparkTestBase {

  test("streamed facts pick up the version valid at their timestamp") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = session.sqlContext

    val cfg = ScdConfig(uniqueKey = Seq("customer_id"))
    val dim = operators.Scd2.initialLoad(
      Seq((1L, "new", ts("2025-01-01 00:00:00")),
          (1L, "active", ts("2025-01-03 00:00:00")),
          (2L, "new", ts("2025-01-02 00:00:00")))
        .toDF("customer_id", "status", "_updated_at"),
      cfg).cache()

    val source = MemoryStream[(Long, Long, Timestamp)]
    val out = EnrichStream.enrich(
      source.toDF().toDF("fact_id", "customer_id", "ts"),
      "ts", dim, Seq("customer_id"), cfg)
      .select("fact_id", "dim_status")
    val query = out.writeStream.format("memory").queryName("enrich_out")
      .outputMode(OutputMode.Append()).start()
    try {
      source.addData(
        (10L, 1L, ts("2025-01-02 12:00:00")), // inside v1
        (11L, 1L, ts("2025-01-04 00:00:00")), // current version
        (12L, 1L, ts("2024-12-25 00:00:00")), // before first -> NULL
        (13L, 9L, ts("2025-01-05 00:00:00"))) // unknown key -> NULL
      query.processAllAvailable()
    } finally query.stop()

    val got = session.table("enrich_out")
      .as[(Long, Option[String])].collect().toMap
    assert(got === Map(10L -> Some("new"), 11L -> Some("active"),
                       12L -> None, 13L -> None))
  }
}
