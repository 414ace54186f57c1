package graft

/** p14 systematic weighted sampling — the exactly-k and proportionality
  * contracts the oracle's hash check can't articulate on its own. */
class SamplingSpec extends SparkSuite {

  test("p14: multiplicities sum to exactly k and weights drive inclusion") {
    val rows = SparkEntry.queries("p14_weighted_sample")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._3).sum == 200L, "Σ n_copies == k by telescoping")
    assert(rows.forall(_._3 >= 1L), "only drawn docs emitted")
    // a doc can be drawn at most ceil(k·w/total)+1 times; sanity: no doc
    // dominates the sample on this corpus
    assert(rows.map(_._3).max <= 5L, "no degenerate multiplicity")
    // proportionality: drawn docs must be (weakly) longer on average than
    // the corpus — weight IS byte length
    val corpusMean = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.avg(
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text")))).head().getDouble(0)
    val sampleMean = rows.map(r => r._2.toDouble * r._3).sum / 200.0
    assert(sampleMean >= corpusMean,
      s"length-weighted sample mean $sampleMean < corpus mean $corpusMean")
  }

  test("p14: deterministic across runs") {
    val a = SparkEntry.queries("p14_weighted_sample")(spark, sf).collect()
      .map(_.toSeq).toSet
    val b = SparkEntry.queries("p14_weighted_sample")(spark, sf).collect()
      .map(_.toSeq).toSet
    assert(a == b)
  }
}
