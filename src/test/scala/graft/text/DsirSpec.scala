package graft.text

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Semantics of t17_dsir_importance (DSIR-shaped hashed-n-gram importance
  * weighting, target = the `lang = 'en'` slice): the per-doc average
  * log-ratio under the two add-one-smoothed 8192-bucket bigram models,
  * and the above-corpus-average selection rule.
  *
  * The load-bearing property is Gibbs' inequality at the corpus level:
  * the target model assigns its own sample higher average log-likelihood
  * than the raw model does ONLY in expectation over the target
  * distribution — so the en-doc mean of avg_logw must be ≥ the non-en
  * mean whenever the two bigram distributions differ at all, and the
  * selection rule must be enriched for the target slice. */
class DsirSpec extends SparkSuite {

  private lazy val out =
    graft.queries.TextPack.queries("t17_dsir_importance")(spark, sf)
      .collect()

  test("target (en) docs carry higher mean importance weight than non-en") {
    val (en, rest) = out.filter(!_.isNullAt(4)).partition(_.getString(1) == "en")
    assert(en.nonEmpty && rest.nonEmpty)
    val mEn = en.map(_.getDouble(4)).sum / en.length
    val mRest = rest.map(_.getDouble(4)).sum / rest.length
    assert(mEn > mRest, s"Gibbs separation violated: en=$mEn rest=$mRest")
  }

  test("selection is enriched for the target slice") {
    val (en, rest) = out.filter(!_.isNullAt(5)).partition(_.getString(1) == "en")
    def frac(rs: Array[org.apache.spark.sql.Row]) =
      rs.count(_.getBoolean(5)).toDouble / rs.length
    assert(frac(en) > frac(rest),
      s"selected fraction en=${frac(en)} should exceed rest=${frac(rest)}")
    // the rule is a strict above-average cut: someone is always selected
    // and someone always rejected on a non-degenerate corpus
    assert(out.exists(r => !r.isNullAt(5) && r.getBoolean(5)))
    assert(out.exists(r => !r.isNullAt(5) && !r.getBoolean(5)))
  }

  test("docs with fewer than 2 words score NULL, others score all columns") {
    out.foreach { r =>
      val nWords = r.getLong(2)
      if (nWords >= 2) {
        assert(r.getLong(3) == nWords - 1L, s"doc ${r.getLong(0)}")
        assert(!r.isNullAt(4) && !r.isNullAt(5))
      } else assert(r.isNullAt(3) && r.isNullAt(4))
    }
  }
}
