package graft.ops

import graft.SparkSuite

class KCoreSpec extends SparkSuite {

  private def sym(pairs: Seq[(Long, Long)]) = {
    import spark.implicits._
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
  }

  private def clique(ids: Seq[Long]): Seq[(Long, Long)] =
    for (a <- ids; b <- ids if a < b) yield (a, b)

  test("2-core keeps the triangle, peels the pendant chain") {
    // triangle 1-2-3 with a chain 3-4-5 hanging off it: nodes 5 then 4
    // peel in successive rounds (degree < 2), the triangle survives
    val edges = sym(clique(Seq(1L, 2L, 3L)) ++ Seq((3L, 4L), (4L, 5L)))
    val got = KCore.run(edges, k = 2, rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set(1L, 2L, 3L), got)
    assert(got.values.forall(_ == 2L), got)
  }

  test("cascading peel needs the later rounds (path dissolves entirely)") {
    // a pure path has no 2-core; each round removes the two current
    // endpoints, so a 7-node path needs 3 rounds to empty
    val path = sym((1L to 6L).map(i => (i, i + 1)))
    assert(KCore.run(path, k = 2, rounds = 3).count() == 0)
    // with only 2 rounds the middle edge pair is still present —
    // fixed-round semantics, which the unrolled oracle mirrors
    assert(KCore.run(path, k = 2, rounds = 2).count() > 0)
  }

  test("4-core of K5 plus a satellite is exactly K5") {
    val edges = sym(clique(Seq(1L, 2L, 3L, 4L, 5L)) ++ Seq((5L, 20L)))
    val got = KCore.run(edges, k = 4, rounds = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L), got)
    assert(got.values.forall(_ == 4L), got)
  }
}
