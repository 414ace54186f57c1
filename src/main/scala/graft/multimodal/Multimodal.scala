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

  /** The m3 dHash banding CANDIDATE stage, factored from the query so CI
    * can pin its density at a scaled signature table (VERDICT r8 #5 —
    * byte-level ops are excluded from the word-rename probe replica, so
    * m3's scale evidence lives at the SIGNATURE level): `sigs` carries
    * (doc_id, sig: 60-bit long); each signature splits into 4×15-bit
    * pigeonhole chunks (Hamming ≤ 3 ⇒ some chunk identical, so banding
    * loses NO pair under the distance bound), and candidates come from
    * the per-(chunk-index, chunk-value) equi-join. The chunk table is
    * cached — one signature pass, the m3 projection-collapse lesson. */
  def phashCandidates(sigs: DataFrame): DataFrame = {
    val chunks = sigs
      .select(col("doc_id"), col("sig"),
        explode(sequence(lit(0), lit(3))).as("c"))
      .withColumn("chunk", expr("shiftright(sig, 15 * c) & 32767"))
      .cache()
    val a = chunks.select(col("c"), col("chunk"),
      col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = chunks.select(col("c"), col("chunk"),
      col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    a.join(b, Seq("c", "chunk")).filter(col("doc_a") < col("doc_b"))
  }

  /** Candidates verified in-stage (bit_count of the XOR rides the join)
    * and deduped on the surviving pairs only — the shared shape of every
    * banding miner in the repo. */
  def phashNeardupPairs(sigs: DataFrame, maxDist: Int = 3): DataFrame =
    phashCandidates(sigs)
      .withColumn("hamming", expr("CAST(bit_count(sig_a ^ sig_b) AS INT)"))
      .filter(col("hamming") <= maxDist)
      .select("doc_a", "doc_b", "hamming").distinct()

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
