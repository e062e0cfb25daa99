package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata; decode/feature/resize/frame-sample
  * run as batched per-partition JVM transforms (`mapPartitions` — the Scala
  * counterpart of an Arrow-batched pandas UDF: no shuffle, one pass over each
  * partition, batch-at-a-time processing so a real codec could amortize
  * per-call setup).
  *
  * The actual codecs are NOT in this container, so `decodeStub` is a
  * clearly-marked deterministic fake; everything around it — the schema, the
  * binary column plumbing, the partition/batch shape, the feature contract —
  * is real and tested. Swapping `decodeStub` for a JNI/ffmpeg/ImageIO call is
  * a one-function change.
  *
  * Scale notes: payload bytes never participate in a shuffle (features are
  * extracted before any wide operation), and the batch size bounds per-task
  * memory regardless of payload skew.
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata. */
  final case class MediaRecord(doc_id: Long,
                               modality: String,
                               data: Array[Byte],
                               width: Int,
                               height: Int,
                               duration_ms: Long,
                               n_frames: Int)

  /** Decoded form produced by the (stubbed) codec. */
  final case class Decoded(pixels: Int, channels: Int, samples: Int)

  /** Extracted per-row features. */
  /** `mean_byte_e4` is `floor(byte_sum * 10^4 / n_bytes)` — an exact integer
    * (cross-engine float rounding would otherwise make the oracle flaky);
    * `sampled_frames` is comma-joined for the same reason (list columns don't
    * sort portably in the compare harness).
    */
  final case class MediaFeatures(doc_id: Long,
                                 modality: String,
                                 n_bytes: Int,
                                 byte_sum: Long,
                                 n_distinct_bytes: Int,
                                 mean_byte_e4: Long,
                                 resized_width: Int,
                                 resized_height: Int,
                                 sampled_frames: String)

  /** Rows processed per decode batch (the "Arrow batch" shape: a real codec
    * would decode these together to amortize setup).
    */
  val BatchSize = 64

  /** Deterministic media synthesis from the `documents` table — the ingest
    * path a real pipeline would replace with reading blob files: payload =
    * UTF-8 text bytes, modality cycled by id, metadata derived from payload
    * size (so the oracle can recompute it).
    */
  def fromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(
        col("doc_id").cast("long").as("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
                   (col("doc_id") % 3 + 1).cast("int")).as("modality"),
        encode(col("text"), "UTF-8").as("data"),
        (lit(16) + length(col("text")) % 64).cast("int").as("width"),
        (lit(16) + length(col("text")) % 48).cast("int").as("height"),
        floor(length(col("text")).cast("long") * 1000L / 8000L)
          .cast("long").as("duration_ms"),
        (length(col("text")) % 30 + 1).cast("int").as("n_frames"))
      .as[MediaRecord]
  }

  /** STUB codec ???: a real deployment decodes image/audio/video here
    * (ImageIO / javacv / ffmpeg bindings — not present in this container).
    * The fake is deterministic so the pipeline around it is fully testable:
    * it "decodes" payload bytes into shape metadata only.
    */
  def decodeStub(data: Array[Byte], modality: String): Decoded = modality match {
    case "image" => Decoded(pixels = data.length, channels = 3, samples = 0)
    case "audio" => Decoded(pixels = 0, channels = 1, samples = data.length * 8)
    case _       => Decoded(pixels = data.length, channels = 3, samples = data.length)
  }

  /** Deterministic frame sampling: first / middle / last (distinct, sorted). */
  def sampleFrameIndices(nFrames: Int): Seq[Int] =
    Seq(0, nFrames / 2, nFrames - 1).distinct.sorted

  /** Aspect-preserving-ish resize target, capped at 224. */
  def resizeDims(w: Int, h: Int): (Int, Int) =
    (math.min(w, 224), math.min(h, 224))

  /** Batched per-partition feature extraction — decode (stub), byte stats,
    * resize, frame-sample. One narrow pass; no shuffle.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        // a real codec would decode `batch` in one call here
        batch.map { r =>
          val decoded = decodeStub(r.data, r.modality)
          require(decoded.channels > 0, "decode produced no channels")
          var sum = 0L
          val seen = new java.util.BitSet(256)
          var i = 0
          while (i < r.data.length) {
            val b = r.data(i) & 0xff
            sum += b
            seen.set(b)
            i += 1
          }
          val (rw, rh) = resizeDims(r.width, r.height)
          MediaFeatures(
            doc_id = r.doc_id,
            modality = r.modality,
            n_bytes = r.data.length,
            byte_sum = sum,
            n_distinct_bytes = seen.cardinality(),
            mean_byte_e4 =
              if (r.data.isEmpty) 0L else sum * 10000L / r.data.length,
            resized_width = rw,
            resized_height = rh,
            sampled_frames = sampleFrameIndices(r.n_frames).mkString(","))
        }
      }
    }
  }

  /** The full pipeline over `documents`: ingest → batched decode/feature. */
  def featuresFromDocuments(docs: DataFrame): DataFrame =
    extractFeatures(fromDocuments(docs)).toDF()
}
