package graft.ann

import org.apache.spark.sql.functions._
import graft.{SparkSuite, Tables}

class Sq8Spec extends SparkSuite {

  private def queriesSet = {
    val e = Tables.embeddings(spark, sf)
    e.filter(pmod(col("vec_id"), lit(50)) === 0)
  }

  test("SQ8 recall@5 vs brute force is near-exact on the fixture") {
    val e = Tables.embeddings(spark, sf)
    val q = queriesSet
    val exact = Similarity.bruteForceTopK(e, q, k = 5)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Sq8.topK(spark, e, q, k = 5)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    // SQ8 never drops candidates — every vector is scored, just at int8
    // precision — so unlike the bucketed variants its fixture recall
    // should be essentially exact
    assert(recall >= 0.9, s"recall@5 = $recall")
  }

  test("SQ8 is deterministic across runs") {
    val e = Tables.embeddings(spark, sf)
    val a = Sq8.topK(spark, e, queriesSet, k = 5).collect().map(_.toSeq).toSet
    val b = Sq8.topK(spark, e, queriesSet, k = 5).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("quantization round-trip error is bounded by half a step per dim") {
    val bounds = Array((-1.0, 1.0), (0.0, 0.5), (-0.25, 0.25), (0.1, 0.1))
    val v = Array(0.3f, 0.41f, -0.2f, 0.1f)
    val codes = Sq8.encode(v, bounds)
    val back = Sq8.decode(codes, bounds)
    v.indices.foreach { i =>
      val (mn, mx) = bounds(i)
      val step = (mx - mn) / 255.0
      // degenerate dim (mn == mx): code 0, decodes to mn (up to the
      // float32→double representation gap of the input itself)
      val tol = if (step == 0.0) 1e-6 else step / 2 + 1e-12
      assert(math.abs(back(i) - v(i)) <= tol,
        s"dim $i: ${back(i)} vs ${v(i)} (step $step)")
    }
  }

  test("encode clamps out-of-bounds values to the code range") {
    val bounds = Array((0.0, 1.0), (0.0, 1.0))
    val codes = Sq8.encode(Array(-0.5f, 1.5f), bounds)
    assert((codes(0) & 0xff) == 0)
    assert((codes(1) & 0xff) == 255)
  }

  test("fitBounds covers every dimension and brackets the data") {
    val e = Tables.embeddings(spark, sf)
    val dim = e.select(size(col("embedding"))).head().getInt(0)
    val bounds = Sq8.fitBounds(spark, e)
    assert(bounds.length == dim)
    assert(bounds.forall { case (mn, mx) => mn <= mx })
    // normalized elements live in [-1, 1]
    assert(bounds.forall { case (mn, mx) => mn >= -1.0 - 1e-9 && mx <= 1.0 + 1e-9 })
  }
}
