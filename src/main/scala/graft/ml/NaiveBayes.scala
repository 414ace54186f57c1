package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hashed multinomial Naive Bayes language classifier — the TRAINED
  * counterpart of t3's character-heuristic language ID (the
  * fastText-langid-style step of an LLM curation pipeline; the reference
  * tags rows by category before routing them,
  * /root/reference/src/etl/preprocessing.py).
  *
  * Features are word unigrams hashed into [[Buckets]] FNV-1a buckets (the
  * hashing trick), so the MODEL is bounded at |langs|·Buckets rows no
  * matter the corpus size. At 100 TB:
  *   - training is ONE map-side-combined groupBy(lang, bucket) whose
  *     ≤ |langs|·Buckets-row output then broadcasts;
  *   - scoring is ONE shuffle — exploded tokens join the broadcast dense
  *     weight table and partial-aggregate straight to (doc_id, lang), so
  *     shuffle volume is |docs|·|langs| rows, never the token stream.
  *
  * Exactness: add-one-smoothed log-likelihoods and log-priors are
  * e12-quantized BIGINTs (`floor(ln(·)·1e12 + 0.5)` — the t13/t22 recipe),
  * so per-doc scores are exact integer sums both engines reproduce
  * bit-for-bit; the argmax tie-break is (score DESC, lang ASC). Score
  * magnitude is ≤ ~|doc tokens|·1.4e13 ≈ 1e16 ≪ 2^63, and token counts
  * per doc do not grow with corpus size, so the integer path never
  * overflows at scale.
  */
object NaiveBayes {

  /** Feature-space size for the hashing trick (matches the DSIR bucket
    * count so the oracle reuses the same FNV replay). */
  val Buckets = 8192

  /** (doc_id, lang, b): one row per word occurrence, map-only. */
  def tokenBuckets(s: SparkSession, docs: DataFrame): DataFrame = {
    graft.functions.Fnv64.register(s)
    docs
      .select(col("doc_id"), col("lang"),
        explode(split(trim(col("text")), "\\s+")).as("w"))
      .select(col("doc_id"), col("lang"),
        expr(s"pmod(graft_fnv64(w), $Buckets)").as("b"))
  }

  /** Dense (lang, b, w_e12) smoothed log-likelihood table —
    * |langs|·Buckets rows from ONE token-count aggregation; the LEFT JOIN
    * against the observed counts materializes the unseen-bucket default
    * ln(1/(n+B)) without a separate fallback path. */
  def denseModel(s: SparkSession, tok: DataFrame): DataFrame = {
    // bounded at |langs|·Buckets rows; cached so the corpus token pass
    // that feeds it runs ONCE, not once per downstream reference (the
    // a17/ADVICE-r8 triple-scan lesson)
    val cnt = tok.groupBy("lang", "b").agg(count(lit(1)).as("c")).cache()
    val nl  = cnt.groupBy("lang").agg(sum("c").as("n"))
    // |langs| × Buckets dense grid — both sides bounded; hint the Buckets
    // range so the intentional product passes CartesianGuard.
    nl.crossJoin(broadcast(s.range(Buckets).toDF("b")))
      .join(cnt, Seq("lang", "b"), "left")
      .select(col("lang"), col("b"),
        expr(s"CAST(floor(ln((coalesce(c, 0) + 1.0) / (n + $Buckets)) " +
          "* 1000000000000 + 0.5) AS BIGINT)").as("w_e12"))
  }

  /** (lang, p_e12) doc-frequency log-priors. */
  def priors(docs: DataFrame): DataFrame = {
    val dl = docs.groupBy("lang").agg(count(lit(1)).as("dl")).cache()
    dl.crossJoin(broadcast(dl.agg(sum("dl").as("dd"))))
      .select(col("lang"),
        expr("CAST(floor(ln(CAST(dl AS DOUBLE) / CAST(dd AS DOUBLE)) " +
          "* 1000000000000 + 0.5) AS BIGINT)").as("p_e12"))
  }

  /** Resubstitution fit-and-classify over the corpus: per doc, the argmax
    * language with its log-posterior (up to the shared evidence constant).
    * Output: (doc_id, lang, nb_pred, nb_logpost).
    *
    * Plan shape (pinned in PlanAuditSpec): the true label rides the
    * grouping keys so there is no join back to `documents`, and the
    * argmax is `min(struct(-score, cand))` — lexicographic struct order
    * IS the (score DESC, cand ASC) tie-break — so the whole scoring path
    * is two hash aggregations with zero sorts and zero windows. */
  def classify(s: SparkSession, docs: DataFrame): DataFrame = {
    val tok   = tokenBuckets(s, docs)
    val model = denseModel(s, tok)
    tok
      .join(broadcast(model.withColumnRenamed("lang", "cand")), Seq("b"))
      .groupBy(col("doc_id"), col("lang"), col("cand"))
      .agg(sum("w_e12").as("s_e12"))
      .join(broadcast(priors(docs).withColumnRenamed("lang", "cand")),
        Seq("cand"))
      .select(col("doc_id"), col("lang"),
        struct((-(col("s_e12") + col("p_e12"))).as("neg"),
          col("cand").as("cand")).as("key"))
      .groupBy("doc_id", "lang")
      .agg(min(col("key")).as("k"))
      .select(col("doc_id"), col("lang"), col("k.cand").as("nb_pred"),
        graft.Num.r6((-col("k.neg")).cast("double") / 1000000000000.0)
          .as("nb_logpost"))
  }
}
