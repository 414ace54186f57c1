package graft.text

import graft.SparkSuite

class DedupSpec extends SparkSuite {

  private def doc(id: Long, text: String) = (id, text)

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat sleeps on the warm mat near the door"

  test("minhash LSH finds constructed near-duplicates and not unrelated docs") {
    import spark.implicits._
    val docs = Seq(
      doc(1, base),
      doc(2, base + " today"),                       // near-dup of 1
      doc(3, "completely different words about spark catalyst optimizer plans and shuffles everywhere"),
      doc(4, base.replace("cat", "bird"))            // near-dup of 1
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(spark, docs, shingleW = 3, threshold = 0.5)
      .collect().map(p => (p.doc_a, p.doc_b)).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 4L)))
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("jaccard is exact on known sets") {
    val a = Array(1L, 2L, 3L, 4L)
    val b = Array(3L, 4L, 5L, 6L)
    assert(math.abs(Dedup.jaccard(a, b) - 2.0 / 6.0) < 1e-12)
    assert(Dedup.jaccard(a, a) === 1.0)
  }

  test("minhash signature approximates jaccard") {
    val shA = Dedup.shingleHashes(base, 3)
    val shB = Dedup.shingleHashes(base + " extra tail words here", 3)
    val sigA = Dedup.minhashSignature(shA)
    val sigB = Dedup.minhashSignature(shB)
    val est = sigA.zip(sigB).count { case (x, y) => x == y }.toDouble / sigA.length
    val exact = Dedup.jaccard(shA, shB)
    assert(math.abs(est - exact) < 0.3, s"est=$est exact=$exact")
  }

  test("simhash: near-identical docs within hamming 3, unrelated docs far apart") {
    val a = Dedup.simhash(base)
    val b = Dedup.simhash(base + " today")
    val c = Dedup.simhash("entirely unrelated content regarding database engines and query plans")
    assert(Dedup.hamming(a, b) <= 3)
    assert(Dedup.hamming(a, c) > 10)
  }

  test("simhashPairs surfaces the constructed near-dup via chunk banding") {
    import spark.implicits._
    val docs = Seq(
      doc(1, base),
      doc(2, base + " today"),
      doc(3, "entirely unrelated content regarding database engines and query plans")
    ).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(spark, docs, maxDist = 3)
      .collect().map(p => (p.doc_a, p.doc_b)).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("bipartite miner finds cross-corpus near-dups and never within-side pairs") {
    import spark.implicits._
    val train = Seq(
      doc(1, base),                    // near-dup of test doc 101
      doc(2, base + " entirely"),      // near-dup of 1 AND of test 101
      doc(3, "unrelated text about catalyst plans shuffles and codegen stages everywhere")
    ).toDF("doc_id", "text")
    val test = Seq(
      doc(101, base + " today"),
      doc(102, "nothing here resembles any training document at all in any way whatsoever")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashLshBipartite(spark, train, test, shingleW = 3,
      threshold = 0.5).collect().map(p => (p.doc_a, p.doc_b)).toSet
    assert(pairs.contains((1L, 101L)))
    assert(pairs.contains((2L, 101L)))
    // doc_a is always from the left corpus, doc_b from the right — the
    // train×train near-dup (1, 2) must NOT surface
    assert(pairs.forall { case (a, b) => a < 100L && b >= 100L })
    assert(!pairs.exists { case (a, b) => a == 3L || b == 102L })
  }

  test("d13 duplicated-substring spans: hand-computed coverage and island merge") {
    import spark.implicits._
    // ids chosen indivisible by 20 so withNearDups plants nothing extra
    val dir = java.nio.file.Files.createTempDirectory("d13spec").toString
    Seq(
      // docs 1/2 share exactly their leading 8-gram; tails are unique
      (1L, "a b c d e f g h x1 x2 x3"),
      (2L, "a b c d e f g h y1 y2 y3"),
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10"),
      // internal repeat: the 8-gram at p=1 recurs at p=9; 9 ≤ 1+8 so the
      // two positions merge into ONE island covering all 16 tokens
      (4L, "m1 m2 m3 m4 m5 m6 m7 m8 m1 m2 m3 m4 m5 m6 m7 m8")
    ).toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val out = graft.queries.DedupPack.queries("d13_substring_spans")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getBoolean(5))).toMap
    assert(out(1L) == (1L, 8L, math.floor(8.0 / 11 * 1e6 + 0.5) / 1e6, false))
    assert(out(2L)._2 == 8L && !out(2L)._4)
    assert(out(3L) == (0L, 0L, 0.0, true))
    assert(out(4L) == (1L, 16L, 1.0, false))
  }
}
