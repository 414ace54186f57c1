package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (builder-prompt training-data ops).
  *
  * Media (image/audio/video) travels the pipeline as an opaque `binary`
  * column plus typed metadata; decode / feature-extraction runs as
  * `mapPartitions` over batches so a real decoder (JNI/FFI or a Python
  * worker via Arrow batches) slots in per-partition without changing the
  * plan shape. The decoder here is a clearly-marked deterministic STUB —
  * the container has no image/audio libraries — but the Spark-side
  * contract (schema, batch iteration, partition-local initialization,
  * fixed-width feature vectors) is real and tested.
  */
object Multimodal {

  case class MediaRow(media_id: Long, content: Array[Byte], media_type: String)
  case class DecodedRow(media_id: Long, media_type: String, n_bytes: Int,
      width: Int, height: Int, n_frames: Int, features: Array[Float])

  final val FeatureDim = 8

  /** STUB decoder: stands in for an image/audio decode. Deterministic
    * function of the bytes so tests can pin it; a production build replaces
    * this body with the real codec call (partition-locally initialized). */
  def decodeStub(bytes: Array[Byte], mediaType: String): (Int, Int, Int) = {
    val n = bytes.length
    val w = (n % 64) + 1
    val h = ((n / 64) % 64) + 1
    val frames = if (mediaType == "video") (n % 30) + 1 else 1
    (w, h, frames)
  }

  /** STUB feature extractor: fixed-width vector from byte statistics —
    * stands in for an embedding model over decoded pixels/samples. */
  def featuresStub(bytes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    var i = 0
    while (i < bytes.length) {
      out(i % FeatureDim) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    if (bytes.length > 0) {
      var j = 0
      while (j < FeatureDim) { out(j) /= bytes.length; j += 1 }
    }
    out
  }

  /** Decode + feature-extract over partition batches. The per-partition
    * block is where a real pipeline initializes its codec once. */
  def decodeAndFeaturize(spark: SparkSession, media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // partition-local init would go here (codec handles, model session)
      rows.map { r =>
        val (w, h, f) = decodeStub(r.content, r.media_type)
        DecodedRow(r.media_id, r.media_type, r.content.length, w, h, f,
          featuresStub(r.content))
      }
    }
  }

  /** Build a synthetic media table from `documents` — text bytes play the
    * role of encoded media so the plumbing is exercised end-to-end on the
    * fixtures. */
  def mediaFromDocuments(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents
      .select(
        col("doc_id").as("media_id"),
        col("text").cast("binary").as("content"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"))
      .as[MediaRow]
  }
}
