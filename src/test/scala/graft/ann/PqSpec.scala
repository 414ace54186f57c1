package graft.ann

import org.apache.spark.sql.functions._
import graft.{SparkSuite, Tables}

class PqSpec extends SparkSuite {

  private def queriesSet = {
    val e = Tables.embeddings(spark, sf)
    e.filter(pmod(col("vec_id"), lit(50)) === 0)
  }

  test("PQ recall@5 vs brute force is substantial on the fixture") {
    val e = Tables.embeddings(spark, sf)
    val q = queriesSet
    val exact = Similarity.bruteForceTopK(e, q, k = 5)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Pq.topK(spark, e, q, k = 5)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall@5 = $recall")
  }

  test("PQ is deterministic across runs") {
    val e = Tables.embeddings(spark, sf)
    val a = Pq.topK(spark, e, queriesSet, k = 5).collect().map(_.toSeq).toSet
    val b = Pq.topK(spark, e, queriesSet, k = 5).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("codebooks shape and encoding range") {
    val e = Tables.embeddings(spark, sf)
    val books = Pq.codebooks(e, m = 8, ks = 16)
    assert(books.length == 8)
    assert(books.forall(_.length == 16))
    assert(books.forall(_.forall(_.length == 8))) // 64 dims / 8 subspaces
  }

  test("normalize produces unit vectors and keeps zeros intact") {
    val v = Pq.normalize(Array(3f, 4f, 0f, 0f))
    val n = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(n - 1.0) < 1e-6)
    val z = Pq.normalize(Array(0f, 0f))
    assert(z.toSeq == Seq(0f, 0f))
  }
}
