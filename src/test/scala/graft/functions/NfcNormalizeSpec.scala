package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite

class NfcNormalizeSpec extends SparkSuite {

  // explicit escapes — source-literal accents are visually ambiguous
  private val composed = "caf\u00e9"
  private val decomposed = "cafe\u0301"

  test("known NFC vectors through codegen") {
    import spark.implicits._
    NfcNormalize.register(spark)
    val cases = Seq(
      "plain ascii" -> "plain ascii",              // untouched (fast path)
      composed -> composed,                        // already composed
      decomposed -> composed,                      // e + combining acute composes
      "A\u030angstro\u0308m" -> "\u00c5ngstr\u00f6m", // ring + diaeresis
      "\u212b" -> "\u00c5",                        // ANGSTROM SIGN canonicalizes
      "" -> "")
    val got = cases.map(_._1).toDF("t")
      .select(call_function("graft_nfc", col("t")))
      .collect().map(_.getString(0))
    assert(got.toSeq === cases.map(_._2))
  }

  test("null propagates and mixed forms fingerprint identically after NFC") {
    import spark.implicits._
    NfcNormalize.register(spark)
    Fnv64.register(spark)
    val got = Seq(Some(composed), Some(decomposed), None).toDF("t")
      .select(call_function("graft_fnv64",
        call_function("graft_nfc", col("t"))).as("fp"))
      .collect()
    assert(got(0).getLong(0) === got(1).getLong(0),
      "NFC must unify fingerprints across normalization forms")
    assert(got(2).isNullAt(0))
  }
}
