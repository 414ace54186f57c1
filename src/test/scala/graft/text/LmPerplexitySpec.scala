package graft.text

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Semantics of t13_lm_perplexity: add-one-smoothed bigram LM trained on
  * the corpus with singleton bigram types min-count-pruned (KenLM-style;
  * pruned occurrences back off to their context's add-one unseen
  * probability ln(1/(cu+V)), with cu and V computed pre-prune so the
  * mass accounting stays exact), per-doc cross-entropy in nats/bigram.
  * Hand-computed tiny case + structural invariants on the fixture. */
class LmPerplexitySpec extends SparkSuite {

  private def runT13(dir: String) =
    graft.queries.TextPack.queries("t13_lm_perplexity")(spark, dir)

  private def tmpCorpus(docs: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("t13spec").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  test("hand-computed cross-entropy on a two-doc corpus") {
    // corpus: "a b a b" and "a b". bigram counts: (a b)->3, (b a)->1.
    // context counts: a->3, b->1. vocab V = 2.
    // (a b) is kept (count 3 >= 2): p(b|a) = (3+1)/(3+2) = 0.8.
    // (b a) is a singleton -> PRUNED from the LM; its occurrences score
    // as context b's add-one unseen event: p = 1/(cu_b + V) = 1/3
    // (not the unpruned add-one 2/3 — the prune drops the type's count).
    val dir = tmpCorpus(Seq((1L, "a b a b"), (2L, "a b")))
    val out = runT13(dir).collect().map(r => r.getLong(0) -> r).toMap
    // fixed-point micro-nats, the query's exact integer arithmetic
    val lpAbE6 = math.floor(math.log(4.0 / 5.0) * 1e6 + 0.5).toLong
    val lpBaE6 = math.floor(math.log(1.0 / 3.0) * 1e6 + 0.5).toLong
    // doc 1: bigrams (a b)x2, (b a)x1 -> ce = -(2*lp_ab + lp_ba)/3
    val ce1 = math.floor(
      -(2 * lpAbE6 + lpBaE6).toDouble / (3 * 1e6) * 1e6 + 0.5) / 1e6
    assert(out(1L).getLong(2) == 3L)
    assert(math.abs(out(1L).getDouble(3) - ce1) < 1e-12, s"ce1=${out(1L).getDouble(3)}")
    // doc 2: one bigram (a b) -> ce = -lp_ab
    val ce2 = math.floor(-lpAbE6.toDouble / 1e6 * 1e6 + 0.5) / 1e6
    assert(out(2L).getLong(2) == 1L)
    assert(math.abs(out(2L).getDouble(3) - ce2) < 1e-12)
    // ppl = exp(ce) (both rounded from the same raw ce)
    assert(math.abs(out(1L).getDouble(4) - math.exp(out(1L).getDouble(3))) < 1e-4)
  }

  test("fixture invariants: n_bigrams = n_words - 1, ce and ppl positive") {
    val out = runT13(sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nWords = r.getInt(1)
      if (nWords >= 2) {
        assert(r.getLong(2) == nWords - 1L, s"doc ${r.getLong(0)}")
        assert(r.getDouble(3) > 0, "smoothed bigram probs are < 1 => ce > 0")
        assert(r.getDouble(4) > 1)
      } else {
        assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
      }
    }
  }

  test("a repeated-boilerplate doc scores lower ppl than a novel-text doc") {
    // the filtering property that motivates the operator — and the
    // VERDICT r8 #2 ordering pin: the min-count prune hits exactly the
    // novel doc's singleton bigrams (the template's bigrams have count
    // ~20 and survive), so pruning must PRESERVE the boilerplate < novel
    // ppl ordering the filter exists to produce
    val tmpl = "click here to subscribe now"
    val dir = tmpCorpus(
      (1L to 20L).map(i => (i, tmpl)) :+
        (99L, "quantum hedgehogs orbit purple manifolds beyond syntax"))
    val out = runT13(dir).collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(out(1L) < out(99L),
      s"template ppl ${out(1L)} should be < novel ppl ${out(99L)}")
  }

  test("pruned singleton types score strictly worse than kept types") {
    // doc 3 reuses the (x y) bigram 3 times (kept); doc 4's bigrams are
    // singletons (pruned). Same vocabulary mass — the pruned doc's ppl
    // must be strictly higher, and by MORE than the unpruned add-one gap
    // (ln 2 per singleton occurrence comes from the prune itself)
    val dir = tmpCorpus(Seq((3L, "x y x y x y"), (4L, "p q r s t u")))
    val out = runT13(dir).collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(out(3L) < out(4L),
      s"repeated-bigram ppl ${out(3L)} should be < singleton ppl ${out(4L)}")
  }
}
