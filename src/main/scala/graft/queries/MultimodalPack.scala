package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}
import graft.multimodal.Multimodal

/** Multimodal binary-column operators (builder-prompt training-data ops).
  * m1 metadata math is oracle-checked (byte lengths are engine-agnostic);
  * m2's decode metadata is oracle-checked too (the stub decode is integer
  * arithmetic on byte length, which SQL reproduces — the fixture text is
  * pure ASCII, so strlen = octet count); the float feature VECTORS stay
  * spec-pinned (MultimodalSpec) since their float32 fold order is
  * engine-specific.
  */
object MultimodalPack extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary column + typed metadata: byte length and stub decode
    // dimensions, all arithmetic on octet length → oracle-checkable.
    "m1_binary_meta" -> ((s, dir) =>
      Tables.documents(s, dir)
        .withColumn("content", col("text").cast("binary"))
        .withColumn("n_bytes", length(col("content")))
        .withColumn("width", pmod(col("n_bytes"), lit(64)) + 1)
        .withColumn("height", pmod((col("n_bytes") / 64).cast("int"), lit(64)) + 1)
        .select("doc_id", "n_bytes", "width", "height")),

    // mapPartitions decode/featurize plumbing (stubbed codec). The decode
    // metadata (dims, frame count, feature width) is driver-checked; the
    // feature values are spec-pinned.
    "m2_media_features" -> ((s, dir) => {
      val media = Multimodal.mediaFromDocuments(s, Tables.documents(s, dir))
      Multimodal.decodeAndFeaturize(s, media).toDF()
        .select(col("media_id"), col("media_type"), col("n_bytes"),
          col("width"), col("height"), col("n_frames"),
          size(col("features")).as("feature_dim"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "m2_media_features" ->
      """SELECT doc_id AS media_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |       ELSE 'video' END AS media_type,
        |  strlen(text) AS n_bytes,
        |  strlen(text) % 64 + 1 AS width,
        |  (strlen(text) // 64) % 64 + 1 AS height,
        |  CASE WHEN doc_id % 3 = 2 THEN strlen(text) % 30 + 1 ELSE 1 END
        |    AS n_frames,
        |  8 AS feature_dim
        |FROM documents""".stripMargin,
    "m1_binary_meta" ->
      """SELECT doc_id,
        |  strlen(text) AS n_bytes,
        |  strlen(text) % 64 + 1 AS width,
        |  CAST(floor(strlen(text) / 64) AS INT) % 64 + 1 AS height
        |FROM documents""".stripMargin
  )
}
