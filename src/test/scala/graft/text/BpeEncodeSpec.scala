package graft.text

import org.apache.spark.sql.functions._
import graft.{SparkSuite, SparkEntry, Tables}

/** Invariants tying the t15 encoder to the t14 trainer (the oracle checks
  * the values; these pin the relationship the hashes can't explain). */
class BpeEncodeSpec extends SparkSuite {

  test("t15: token counts sit between word count and char count, and merges bite") {
    val enc = SparkEntry.queries("t15_bpe_encode")(spark, sf).cache()
    try {
      val docs = Tables.documents(spark, sf)
        .withColumn("words", split(trim(col("text")), "\\s+"))
        .select(col("doc_id"),
          size(col("words")).cast("long").as("w"),
          expr("CAST(aggregate(transform(words, x -> length(x)), 0, " +
            "(a, b) -> a + b) AS BIGINT)").as("chars"))
      val j = enc.join(docs, "doc_id")
      // every word is at least one token; no word exceeds its char count
      assert(j.filter(col("n_tokens") < col("n_words")).count() === 0)
      assert(j.filter(col("n_tokens") > col("chars")).count() === 0)
      // the learned merges actually reduce the corpus token count below
      // the unmerged (= per-char) total: BPE did something
      val totals = j.agg(sum("n_tokens"), sum("chars")).head()
      assert(totals.getLong(0) < totals.getLong(1),
        s"merged total ${totals.getLong(0)} must undercut char total ${totals.getLong(1)}")
    } finally enc.unpersist()
  }

  test("t15 encodes a punctuation-bearing corpus (merges bound as literals)") {
    // ADVICE r8: the old encoder spliced learned merge pairs into SQL
    // text and require()d [\w ]-only pairs — a corpus whose top pair
    // contains '.' or '\'' crashed instead of encoding. Pairs are now
    // bound as Column literals, so this corpus (top merges necessarily
    // contain '.' and the quote) must encode, and the merges must bite.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("t15punct").toString
    (1L to 12L).map(i => (i, "a.b a.b don't don't e.g. e.g."))
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("t15_bpe_encode")(spark, dir).collect()
    assert(out.length == 12)
    out.foreach { r =>
      val (w, t) = (r.getLong(1), r.getLong(2))
      assert(t >= w, s"every word is at least one token (w=$w t=$t)")
      // 6 words, 24 non-space chars -> unmerged total would be 24;
      // 4 learned merges must cut it
      assert(t < 24, s"merges must bite on the punctuation corpus (t=$t)")
    }
  }
}
