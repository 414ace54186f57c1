package graft.ann

import org.apache.spark.sql.functions._
import graft.SparkSuite

class IvfSpec extends SparkSuite {

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
      ((c * perCenter + m).toLong, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("IVF top-k achieves high recall vs brute force on clustered data") {
    val df = clustered(4, 16, 16)
    val queries = df.filter(col("vec_id") % 8 === 0)
    val bf = Similarity.bruteForceTopK(df, queries, k = 3)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Ivf.topK(spark, df, queries, k = 3, nLists = 8, nProbe = 3)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf intersect ivf).size.toDouble / bf.size
    assert(recall >= 0.7, s"recall=$recall")
  }

  test("filtered top-k with exhaustive probing equals the filtered brute force") {
    import spark.implicits._
    val df = clustered(4, 16, 16)
      .withColumn("label", (pmod(col("vec_id"), lit(3))).cast("int"))
    val queries = df.filter(col("vec_id") % 8 === 0)
    // exact same-label truth
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"), col("label"))
    val c = df.select(col("vec_id").as("cid"), col("embedding").as("ce"), col("label"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("sim").desc, col("cid"))
    val bf = q.join(c, "label").filter(col("qid") =!= col("cid"))
      .withColumn("sim", graft.Num.r6(Similarity.cosine(col("qe"), col("ce"))))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // nProbe = nLists probes every list: the only approximation left is
    // the list pruning, which exhaustive probing removes — results must
    // be EXACTLY the filtered brute force, not merely high-recall
    val got = Ivf.topKFiltered(spark, df, queries, k = 3, nLists = 8, nProbe = 8)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === bf)
    // and every neighbor carries its query's label
    val lbl = df.select(col("vec_id"), col("label")).as[(Long, Int)]
      .collect().toMap
    got.foreach { case (qid, cid) => assert(lbl(qid) === lbl(cid)) }
  }

  test("centroid assignment is deterministic and probe lists are bounded") {
    val df = clustered(4, 8, 16)
    val cents = Ivf.centroids(df, 8, df.count())
    assert(cents.length === 8)
    val v = Array.tabulate(16)(i => i / 16.0f)
    val p1 = Ivf.nearestCentroids(v, cents, 3)
    val p2 = Ivf.nearestCentroids(v, cents, 3)
    assert(p1 === p2 && p1.length === 3)
  }
}
