package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{SparkSuite, Tables}

/** Measures mean recall@5 of the three approximate ANN paths against the
  * exact brute-force top-5 on the REAL fixture embeddings (near-isotropic —
  * the hardest case for bucketed ANN), backing the 0.30 bounds asserted by
  * the n3/n4/n5 driver invariant frames with measured numbers. */
class AnnRecallSpec extends SparkSuite {

  private def queriesSet(emb: DataFrame): DataFrame =
    emb.filter(pmod(col("vec_id"), lit(50)) === 0)

  private def topkSets(df: DataFrame): Map[Long, Set[Long]] =
    df.select("qid", "cid").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  private def meanRecall(truth: Map[Long, Set[Long]], found: Map[Long, Set[Long]]): Double = {
    val rs = truth.map { case (q, t) =>
      found.getOrElse(q, Set.empty[Long]).intersect(t).size.toDouble / t.size
    }
    rs.sum / rs.size
  }

  private lazy val emb = Tables.embeddings(spark, sf)
  private lazy val truth = topkSets(Similarity.bruteForceTopK(emb, queriesSet(emb), k = 5))

  test("multi-table sign-LSH mean recall@5 ≥ 0.30 on isotropic fixture") {
    val r = meanRecall(truth, topkSets(Similarity.lshTopK(spark, emb, queriesSet(emb), k = 5)))
    info(f"lsh mean recall@5 = $r%.3f (bound 0.30)")
    assert(r >= 0.30, f"lsh recall $r%.3f below driver-frame bound")
  }

  test("IVF-flat mean recall@5 ≥ 0.30 on isotropic fixture") {
    val r = meanRecall(truth, topkSets(Ivf.topK(spark, emb, queriesSet(emb), k = 5)))
    info(f"ivf mean recall@5 = $r%.3f (bound 0.30)")
    assert(r >= 0.30, f"ivf recall $r%.3f below driver-frame bound")
  }

  test("PQ mean recall@5 ≥ 0.30 on isotropic fixture") {
    val r = meanRecall(truth, topkSets(Pq.topK(spark, emb, queriesSet(emb), k = 5)))
    info(f"pq mean recall@5 = $r%.3f (bound 0.30)")
    assert(r >= 0.30, f"pq recall $r%.3f below driver-frame bound")
  }
}
