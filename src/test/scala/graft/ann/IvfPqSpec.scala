package graft.ann

import org.apache.spark.sql.functions._
import graft.{SparkSuite, Tables}

class IvfPqSpec extends SparkSuite {

  private def queriesSet = {
    val e = Tables.embeddings(spark, sf)
    e.filter(pmod(col("vec_id"), lit(50)) === 0)
  }

  test("IVF-PQ recall@5 clears the n7 frame bound with margin") {
    val e = Tables.embeddings(spark, sf)
    val q = queriesSet
    val exact = Similarity.bruteForceTopK(e, q, k = 5)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = IvfPq.topK(spark, e, q, k = 5)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.35, s"recall@5 = $recall (frame bound 0.25 needs margin)")
  }

  test("IVF-PQ is deterministic across runs") {
    val e = Tables.embeddings(spark, sf)
    val a = IvfPq.topK(spark, e, queriesSet, k = 5).collect().map(_.toSeq).toSet
    val b = IvfPq.topK(spark, e, queriesSet, k = 5).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("IVF-PQ candidates are probe-bounded: results ⊆ probed lists") {
    // every returned cid must live in a list the query probed — the
    // property that makes per-query cost (n/nlist)·nprobe, not n
    val e = Tables.embeddings(spark, sf)
    val n = e.count()
    val nl = math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt)
    val np = math.max(math.max(4, math.ceil(math.sqrt(nl.toDouble)).toInt),
      (nl + 5) / 6)
    // normalize centroids and vectors exactly as the operator does —
    // cosineLocal is scale-invariant only up to Float rounding, so raw
    // inputs could flip a near-tie argmax vs the operator (code-review r8)
    val cents = Ivf.centroids(e, nl, n).map { case (i, v) => (i, Pq.normalize(v)) }
    import spark.implicits._
    val vecs = e.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
      .map { case (id, v) => (id, Pq.normalize(v)) }.toMap
    val probed: Map[Long, Set[Int]] = queriesSet.select("vec_id")
      .as[Long].collect()
      .map(qid => qid -> Ivf.nearestCentroids(vecs(qid), cents, np).toSet).toMap
    val assigned: Map[Long, Int] =
      vecs.map { case (id, v) => id -> Ivf.nearestCentroids(v, cents, 1).head }
    val out = IvfPq.topK(spark, e, queriesSet, k = 5)
      .select("qid", "cid").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (qid, cid) = (r.getLong(0), r.getLong(1))
      assert(probed(qid).contains(assigned(cid)),
        s"cid $cid (list ${assigned(cid)}) returned for qid $qid but not probed")
    }
  }
}
