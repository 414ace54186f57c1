package graft.ann

import org.apache.spark.sql.functions._
import graft.SparkSuite

class SimilaritySpec extends SparkSuite {

  /** Deterministic clustered vectors: `centers` well-separated axes, each
    * member = center + small deterministic perturbation. */
  private def clustered(nCenters: Int, perCenter: Int, dim: Int) = {
    import spark.implicits._
    val rows = for {
      c <- 0 until nCenters
      m <- 0 until perCenter
    } yield {
      val v = Array.tabulate(dim) { d =>
        val centerVal = if (d % nCenters == c) 1.0f else 0.0f
        val jitter = (((c * 31 + m * 17 + d * 7) % 11) - 5) / 200.0f
        centerVal + jitter
      }
      ((c * perCenter + m).toLong, v, c)
    }
    rows.toDF("vec_id", "embedding", "cluster")
  }

  test("cosine column: orthogonal → 0, identical → 1") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f)),
      (Array(1.0f, 0.0f), Array(-1.0f, 0.0f))
    ).toDF("a", "b")
    val got = df.select(Similarity.cosine(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(math.abs(got(0) - 0.0) < 1e-12)
    assert(math.abs(got(1) - 1.0) < 1e-12)
    assert(math.abs(got(2) + 1.0) < 1e-12)
  }

  test("brute-force top-k neighbors come from the query's own cluster") {
    val df = clustered(4, 10, 16)
    val queries = df.filter(col("vec_id") % 10 === 0)
    val top = Similarity.bruteForceTopK(df, queries, k = 3)
      .join(df.select(col("vec_id").as("cid"), col("cluster").as("c_cluster")), "cid")
      .join(df.select(col("vec_id").as("qid"), col("cluster").as("q_cluster")), "qid")
    val mismatches = top.filter(col("c_cluster") =!= col("q_cluster")).count()
    assert(mismatches === 0L)
  }

  test("LSH top-k achieves high recall@k vs brute force on clustered data") {
    val df = clustered(4, 10, 16)
    val queries = df.filter(col("vec_id") % 10 === 0)
    val bf = Similarity.bruteForceTopK(df, queries, k = 3)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(spark, df, queries, k = 3)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf intersect lsh).size.toDouble / bf.size
    assert(recall >= 0.6, s"recall=$recall")
  }

  test("signatures are deterministic and plane-count-bounded") {
    val pl = Similarity.planes(12, 16)
    val v = Array.tabulate(16)(i => i / 16.0f)
    val s1 = Similarity.signature(v, pl)
    val s2 = Similarity.signature(v, pl)
    assert(s1 === s2 && s1 >= 0 && s1 < (1 << 12))
  }
}
