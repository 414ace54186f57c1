package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}
import graft.multimodal.Multimodal

/** Multimodal binary-column operators (builder-prompt training-data ops).
  * m1 metadata math is oracle-checked (byte lengths are engine-agnostic);
  * m2's stubbed features are rows-only + spec-pinned.
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

    // mapPartitions decode/featurize plumbing (stubbed codec).
    "m2_media_features" -> ((s, dir) => {
      val media = Multimodal.mediaFromDocuments(s, Tables.documents(s, dir))
      Multimodal.decodeAndFeaturize(s, media).toDF()
        .select(col("media_id"), col("media_type"), col("n_bytes"),
          col("width"), col("height"), col("n_frames"),
          round(element_at(col("features"), 1), 4).as("f0"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "m1_binary_meta" ->
      """SELECT doc_id,
        |  strlen(text) AS n_bytes,
        |  strlen(text) % 64 + 1 AS width,
        |  CAST(floor(strlen(text) / 64) AS INT) % 64 + 1 AS height
        |FROM documents""".stripMargin
  )
}
