package graft.ml

import graft.SparkSuite

class NaiveBayesSpec extends SparkSuite {

  private def docs(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "lang", "text")
  }

  test("disjoint vocabularies classify perfectly under resubstitution") {
    // two classes with non-overlapping token sets: every doc's argmax is
    // its own class regardless of priors or hashing
    val corpus = docs(Seq(
      (1L, "aa", "alpha beta gamma alpha"),
      (2L, "aa", "beta beta gamma"),
      (3L, "aa", "gamma alpha alpha beta"),
      (4L, "bb", "delta epsilon zeta"),
      (5L, "bb", "epsilon zeta zeta delta"),
      (6L, "bb", "zeta delta epsilon epsilon")))
    val got = NaiveBayes.classify(spark, corpus).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got == Map(1L -> "aa", 2L -> "aa", 3L -> "aa",
      4L -> "bb", 5L -> "bb", 6L -> "bb"), got)
  }

  test("all-shared tokens with equal priors tie-break to the smaller lang") {
    // identical token multisets and equal doc counts → identical scores
    // for both classes; the pinned tie-break is (score DESC, lang ASC)
    val corpus = docs(Seq(
      (1L, "xx", "same same word"),
      (2L, "yy", "same same word")))
    val got = NaiveBayes.classify(spark, corpus).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got == Map(1L -> "xx", 2L -> "xx"), got)
  }

  test("priors decide when likelihoods are uninformative") {
    // doc 5's tokens appear equally in both classes, but class "maj" has
    // 3x the documents — the log-prior term must tip the argmax
    val corpus = docs(Seq(
      (1L, "maj", "shared tok"),
      (2L, "maj", "shared tok"),
      (3L, "maj", "shared tok"),
      (4L, "min", "shared tok"),
      (5L, "min", "shared tok")))
    // rebalance: make 4/5's class strictly rarer by dropping doc 5
    val unbalanced = corpus.filter("doc_id <= 4")
    val pred4 = NaiveBayes.classify(spark, unbalanced).collect()
      .collectFirst { case r if r.getLong(0) == 4L => r.getString(2) }.get
    assert(pred4 == "maj")
  }

  test("dense model covers |langs| x Buckets with smoothed defaults") {
    val corpus = docs(Seq(
      (1L, "aa", "one two three"),
      (2L, "bb", "four five")))
    val tok = NaiveBayes.tokenBuckets(spark, corpus)
    val m = NaiveBayes.denseModel(spark, tok)
    assert(m.count() == 2L * NaiveBayes.Buckets)
    // unseen-bucket default for class aa (n=3): floor(ln(1/(3+B))*1e12+.5)
    val defAa = math.floor(
      math.log(1.0 / (3 + NaiveBayes.Buckets)) * 1e12 + 0.5).toLong
    val minAa = m.filter("lang = 'aa'").agg(
      org.apache.spark.sql.functions.min("w_e12")).head.getLong(0)
    assert(minAa == defAa)
  }
}
