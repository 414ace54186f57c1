package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 1-bit binary quantization (the sign-bit code of LSH / "binary
  * embedding" coarse search — FAISS's IndexBinaryFlat layout): each
  * dimension collapses to its sign, packed 32 bits per Long word, and
  * similarity is Hamming distance via XOR + popcount. At dim 64 the scan
  * touches 16 bytes per vector instead of 256 — the cheapest tier below
  * SQ8 on the memory/recall curve, and the standard first-pass filter in
  * front of an exact re-rank.
  *
  * Everything is exact integer arithmetic: sign test, bit packing, XOR,
  * popcount — so unlike the float ANN tiers the whole top-k is
  * oracle-replayable bit-for-bit (ties broken by (ham asc, cid)). Bits
  * pack 32 per word (not 64) so no packed word ever touches the sign
  * bit and both engines sum plain positive BIGINTs.
  *
  * Scale shape: signatures build in ONE map-only pass (cached — the
  * d3/m3 one-signature-pass lesson: both sides of the query join read
  * the same frame); the query set broadcasts (n2's fixed-|Q| brute-scan
  * shape) and each (query, vector) pair costs two XOR+popcounts inside
  * whole-stage codegen.
  */
object BinaryQuant {

  /** Pack sign bits [off, off+32) of `embedding` into one positive Long. */
  private def word(off: Int): Column = expr(
    s"aggregate(sequence(0, 31), 0L, (acc, j) -> " +
      s"acc + IF(element_at(embedding, $off + j + 1) > 0.0, " +
      "shiftleft(1L, j), 0L))")

  /** (vec_id, s0, s1) signature frame for a dim-64 corpus. */
  def signatures(corpus: DataFrame): DataFrame =
    corpus.select(col("vec_id"), word(0).as("s0"), word(32).as("s1"))

  /** The production two-tier shape: coarse 1-bit Hamming shortlist of
    * `m` candidates per query (the 16-byte scan), then exact cosine
    * re-ranks the shortlist to the final top-k — only m vectors per
    * query ever touch their 256-byte floats. The refine join is keyed on
    * cid (candidates shuffle, the corpus's float column attaches by key);
    * the per-query window orders m rows, bounded by construction. */
  def topKReranked(corpus: DataFrame, queries: DataFrame,
      k: Int, m: Int): DataFrame = {
    val cand = topK(corpus, queries, m).select("qid", "cid")
    val cvec = corpus.select(col("vec_id").as("cid"),
      col("embedding").as("c_emb"), Similarity.l2norm(col("embedding")).as("c_norm"))
    val qvec = queries.select(col("vec_id").as("qid"),
      col("embedding").as("q_emb"), Similarity.l2norm(col("embedding")).as("q_norm"))
    val scored = cand.join(cvec, "cid").join(broadcast(qvec), "qid")
      .withColumn("sim", graft.Num.r6(
        Similarity.dot(col("q_emb"), col("c_emb")) / col("q_norm") / col("c_norm")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "cid", "sim")
  }

  /** Exact Hamming top-k per query over the packed signatures. */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val sig = signatures(corpus).cache() // one signature pass, both sides
    val qsig = signatures(queries)
      .select(col("vec_id").as("qid"), col("s0").as("q0"), col("s1").as("q1"))
    val scored = sig.crossJoin(broadcast(qsig))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("cid"),
        (expr("bit_count(s0 ^ q0)") + expr("bit_count(s1 ^ q1)"))
          .cast("long").as("ham"))
    val w = Window.partitionBy(col("qid")).orderBy(col("ham"), col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "cid", "ham")
  }
}
