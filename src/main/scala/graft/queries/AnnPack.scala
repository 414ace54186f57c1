package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Num, QueryPack, Tables}
import graft.ann.Similarity

/** Approximate-nearest-neighbor search over `embeddings` (builder-prompt
  * training-data ops). Pairwise cosine + brute-force top-k are
  * oracle-checked against DuckDB's list math; the LSH variant is
  * engine-defined bucketing → rows-only + recall spec.
  */
object AnnPack extends QueryPack {

  private def queriesSet(emb: DataFrame): DataFrame =
    emb.filter(pmod(col("vec_id"), lit(50)) === 0)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Cosine similarity between consecutive vectors — pins the vector-math
    // primitive (zip_with/aggregate fold in double) to the oracle.
    "n1_cosine_pairs" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
      val b = e.select((col("vec_id") - 1).as("vec_a"),
        col("vec_id").as("vec_b"), col("embedding").as("eb"))
      a.join(b, "vec_a")
        .select(col("vec_a"), col("vec_b"),
          Num.r6(Similarity.cosine(col("ea"), col("eb"))).as("cos_sim"))
    }),

    // Brute-force cosine top-5 for the query set (every 50th vector).
    "n2_ann_bruteforce" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.bruteForceTopK(e, queriesSet(e), k = 5)
    }),

    // Sign-LSH bucketed top-5 with Hamming-1 multi-probe (the scale path;
    // recall vs brute force pinned in SimilaritySpec).
    "n3_ann_lsh" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.lshTopK(s, e, queriesSet(e), k = 5)
    }),

    // IVF-flat top-5: corpus in 16 inverted lists, queries probe 4
    // (recall vs brute force pinned in IvfSpec).
    "n4_ann_ivf" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      graft.ann.Ivf.topK(s, e, queriesSet(e), k = 5)
    }),

    // Product-quantization top-5: 8-byte codes (32x smaller than floats),
    // ADC table-lookup scoring, exact-cosine refine of the survivors cut
    // by the custom TopK operator (recall pinned in PqSpec).
    "n5_ann_pq" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      graft.ann.Pq.topK(s, e, queriesSet(e), k = 5)
    }),

    // Embedding-cosine near-dup dedup (exhaustive upper-triangle baseline;
    // the scale path replaces candidate generation with the n3/d2 LSH
    // bucketing — this exact variant is what the oracle can check).
    "d6_embedding_neardup" -> ((s, dir) =>
      Similarity.neardupPairs(s, Tables.embeddings(s, dir), threshold = 0.45))
  )

  def oracleSql: Map[String, String] = Map(
    "n1_cosine_pairs" ->
      """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  floor((list_cosine_similarity(
        |    CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))) * 1000000 + 0.5) / 1000000 AS cos_sim
        |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1""".stripMargin,
    "n2_ann_bruteforce" ->
      """WITH q AS (
        |  SELECT vec_id AS qid, embedding AS q_emb FROM embeddings
        |  WHERE vec_id % 50 = 0
        |), scored AS (
        |  SELECT q.qid, c.vec_id AS cid,
        |    floor((list_cosine_similarity(
        |      CAST(q.q_emb AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))) * 1000000 + 0.5) / 1000000 AS sim
        |  FROM q CROSS JOIN embeddings c
        |  WHERE c.vec_id <> q.qid
        |)
        |SELECT qid, row_number() OVER w AS rank, cid, sim
        |FROM scored
        |WINDOW w AS (PARTITION BY qid ORDER BY sim DESC, cid)
        |QUALIFY rank <= 5""".stripMargin,
    "d6_embedding_neardup" ->
      """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  floor((list_cosine_similarity(
        |    CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))) * 1000000 + 0.5) / 1000000 AS cos_sim
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE NOT isnan(list_cosine_similarity(
        |    CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))
        |  AND floor((list_cosine_similarity(
        |    CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))) * 1000000 + 0.5) / 1000000 >= 0.45""".stripMargin
  )
}
