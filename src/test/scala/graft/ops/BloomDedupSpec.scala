package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSuite, Tables}

/** Sketch laws the d16 oracle cannot see (it only checks the final exact
  * is_dup): no false negatives, a false-positive count inside the fpp
  * envelope, and the constant-size artifact contract. Runs on sf0.001. */
class BloomDedupSpec extends SparkSuite {

  private def docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))

  test("bloom membership has no false negatives over the build set") {
    val bf = BloomDedup.build(docs, col("text"))
    val misses = docs
      .filter(!BloomDedup.mightContain(bf, col("text")))
      .count()
    assert(misses == 0, "every inserted key must probe positive")
  }

  test("false-positive count on disjoint keys stays inside the envelope") {
    val bf = BloomDedup.build(docs, col("text"))
    val unseen = docs.select(
      concat(col("text"), lit(" zz"), col("doc_id").cast("string")).as("text"))
    val n = unseen.count()
    val fp = unseen.filter(BloomDedup.mightContain(bf, col("text"))).count()
    // 2^23 bits over ≤ 2^20 items: expected fpp is far below 1%; a 1%
    // ceiling still catches a mis-sized or mis-hashed sketch loudly
    assert(fp <= math.max(1L, n / 100),
      s"$fp false positives over $n unseen keys exceeds the envelope")
  }

  test("the artifact is constant-size: numBits/8 plus a fixed header") {
    val small = BloomDedup.build(docs.limit(10), col("text"))
    val full = BloomDedup.build(docs, col("text"))
    assert(small.length == full.length,
      "sketch size must not depend on the input cardinality")
    assert(full.length <= (1L << 23) / 8 + 64,
      s"sketch is ${full.length} bytes, expected ~numBits/8")
  }

  test("d16 flags exactly the true duplicates (prefilter + verify ≡ exact)") {
    val r = graft.queries.DedupPack.queries("d16_bloom_dedup")(spark, sf)
    val dupIds = r.filter(col("is_dup")).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val expected = docs.filter(col("doc_id") % 50 === 0)
      .select((col("doc_id") + 2000000L).as("d")).collect()
      .map(_.getLong(0)).toSet
    assert(dupIds == expected,
      "every verbatim re-appearance and nothing else is a dup")
  }
}
