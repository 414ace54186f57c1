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

  test("LSH near-dup pair mining recalls ≥ 0.80 of the planted population") {
    val aug = graft.queries.AnnPack.withVectorNearDups(spark, sf)
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("vec_a", "vec_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(Similarity.neardupPairs(spark, aug, threshold = 0.9))
    val found = pairs(Similarity.neardupPairsLsh(spark, aug, threshold = 0.9))
    assert(truth.nonEmpty, "fixture must contain planted near-dups")
    assert(found.subsetOf(truth), "exact-cosine verify ⇒ found ⊆ truth")
    val recall = found.intersect(truth).size.toDouble / truth.size
    info(f"d10 planted-pair recall = $recall%.3f over ${truth.size} pairs (bound 0.80)")
    assert(recall >= 0.80, f"planted recall $recall%.3f below driver-frame bound")
  }

  test("d10 shard grid mines a single-bucket identical clique exactly") {
    // the adversarial case the fragment-and-replicate shard exists for:
    // m identical vectors share one bucket in EVERY table (the hottest
    // possible bucket), and the sharded self-join must still emit every
    // clique pair exactly once — a wrong shard pairing (e.g. keying both
    // sides by their own shard) would silently drop the cross-shard pairs
    val m = 60
    val one = emb.orderBy("vec_id").limit(1).select(col("embedding"))
    val clique = one.crossJoin(spark.range(m).toDF("i"))
      .select((col("i") + 900000L).as("vec_id"), col("embedding"))
    val corpus = emb.filter(col("vec_id") < 200)
      .select("vec_id", "embedding").unionByName(clique)
    val found = Similarity.neardupPairsLsh(spark, corpus, threshold = 0.9999)
      .filter(col("vec_a") >= 900000L && col("vec_b") >= 900000L)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.size == m * (m - 1) / 2,
      s"expected all ${m * (m - 1) / 2} clique pairs, got ${found.size}")
    assert(found.forall { case (a, b) => a < b }, "upper triangle only")
  }

  test("d11 sharded in-cluster miner collapses a one-cluster identical clique") {
    // the d10 adversarial case at the semantic-cluster grain (VERDICT r8
    // #1): m identical vectors form the hottest possible cluster, and the
    // sharded (cl, shard) self-join must still connect the whole clique
    // into ONE component — a wrong shard pairing (e.g. keying both sides
    // by their own shard) keeps only same-shard pairs and silently splits
    // the component by shard
    val m = 60
    val one = emb.orderBy("vec_id").limit(1).select(col("embedding"))
    val clique = one.crossJoin(spark.range(m).toDF("i"))
      .select((col("i") + 900000L).as("vec_id"), col("embedding"))
    val corpus = emb.filter(col("vec_id") < 200)
      .select("vec_id", "embedding").unionByName(clique)
    val cc = graft.queries.AnnPack.semanticDedupGroups(spark, corpus)
      .filter(col("node") >= 900000L)
      .select("node", "component").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(cc.length == m, s"all $m clique members must land in a component")
    val labels = cc.map(_._2).toSet
    assert(labels.size == 1,
      s"clique must collapse to ONE component, got ${labels.size}")
    // Components labels every member with the component MINIMUM, and the
    // clique duplicates vec_id 0's embedding, which is in the corpus —
    // so the representative is a base id, never a planted one
    assert(labels.head < 900000L, "representative must be the min (base) id")
  }

  test("n6 centroids are convex: each lies within its label's per-dim range") {
    val cent = graft.queries.AnnPack.queries("n6_embedding_centroid")(spark, sf)
    val bounds = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "el")))
      .groupBy("label", "pos")
      .agg(min(col("el").cast("double")).as("lo"),
        max(col("el").cast("double")).as("hi"))
    val out = cent.join(bounds, Seq("label", "pos"))
      // 1e-6 slack: centroid averages ROUNDED elements, so it can sit
      // half an ulp-of-rounding outside the raw min/max
      .filter(col("centroid") < col("lo") - 1e-6 ||
              col("centroid") > col("hi") + 1e-6)
    assert(out.count() == 0, "mean of members must lie inside their range")
  }
}
