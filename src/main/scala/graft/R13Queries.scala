package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-9 queries (q631+). Separate object: the earlier query objects'
  * map builders sit near the JVM 64 KB method-bytecode ceiling, so new
  * surface accretes here and chains into `SparkEntry.queries` /
  * `oracleSql`.
  */
object R13Queries {

  private def rd(s: SparkSession, dir: String, t: String): DataFrame =
    Tables.read(s, dir, t)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q631_jpeg_metadata" -> ((s, dir) => {
      // JPEG marker-walk round-trip (web corpora are JPEG-dominated;
      // round-8 verdict ask): every document becomes a REAL JPEG — SOI,
      // APP1/Exif TIFF IFD carrying the orientation tag, DQT,
      // SOF0/SOF2 alternating by doc id, SOS, byte-stuffed entropy data,
      // EOI — and the batched mapPartitions decode walks the markers
      // back out. The oracle recomputes every field from the text
      // independently, so a parser that misreads segment lengths, the
      // progressive flag, or IFD endianness fails the hash gate. No
      // shuffle; payload bytes never leave the partition.
      graft.operators.Multimodal.jpegFeaturesFromDocuments(
        Tables.spread(s, rd(s, dir, "documents")))
    }))

  val oracleSql: Map[String, String] = Map(
    "q631_jpeg_metadata" ->
      """WITH m AS (SELECT doc_id, length(text) AS chars,
        |    octet_length(encode(text)) AS nb FROM documents)
        |SELECT doc_id, (16 + chars % 64)::INT AS hdr_width,
        |  (16 + chars % 48)::INT AS hdr_height,
        |  8::INT AS bit_precision, 3::INT AS n_components,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS BIGINT)
        |    AS is_progressive,
        |  (1 + chars % 8)::INT AS orientation, nb::INT AS n_bytes
        |FROM m""".stripMargin)
}
