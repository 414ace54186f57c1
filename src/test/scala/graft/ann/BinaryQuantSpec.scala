package graft.ann

import org.apache.spark.sql.functions._
import graft.{SparkSuite, Tables}

/** Laws for the 1-bit tier beyond the exact-Hamming oracle: packing
  * faithfulness (self-distance 0, symmetric), and the cosine-recall
  * floor that makes the coarse tier useful in front of a re-rank. */
class BinaryQuantSpec extends SparkSuite {

  private def emb = Tables.embeddings(spark, sf)

  test("signature packing: self-Hamming is zero and distance is symmetric") {
    val sig = BinaryQuant.signatures(emb).cache()
    val self = sig.select(col("vec_id").as("qid"),
      col("s0").as("q0"), col("s1").as("q1"))
    val joined = sig.join(self, col("vec_id") === col("qid"))
    assert(joined.filter(
      expr("bit_count(s0 ^ q0) + bit_count(s1 ^ q1)") =!= 0).count() == 0,
      "ham(x, x) must be 0")
    // packed words stay clear of the sign bit (32 bits per word)
    assert(sig.filter(col("s0") < 0 || col("s1") < 0 ||
      col("s0") > 0xffffffffL || col("s1") > 0xffffffffL).count() == 0)
    sig.unpersist()
  }

  test("hamming top-5 recalls a useful fraction of the exact cosine top-5") {
    val qs = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
    val approx = BinaryQuant.topK(emb, qs, k = 5)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.bruteForceTopK(emb, qs, k = 5)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (approx & exact).size.toDouble / exact.size
    info(f"binary-quant recall@5 vs exact cosine: $recall%.3f")
    // 64 sign bits over a near-isotropic corpus (the hardest case — no
    // cluster structure to preserve): the Goemans-Williamson bound puts
    // sign-agreement ≈ 1 − θ/π, enough to beat chance by an order of
    // magnitude; the production shape re-ranks ~4k candidates exactly
    assert(recall >= 0.15, f"recall $recall%.3f below the coarse-tier floor")

    // the two-tier refine must dominate the raw coarse tier: every exact
    // hit the shortlist contains survives the cosine re-rank
    val reranked = BinaryQuant.topKReranked(emb, qs, k = 5, m = 200)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rr = (reranked & exact).size.toDouble / exact.size
    info(f"two-tier (m=200) recall@5 vs exact cosine: $rr%.3f")
    assert(rr >= recall, "refining a superset shortlist can only help")
    assert(rr >= 0.60, f"two-tier recall $rr%.3f below the n14 frame bound")
  }
}
