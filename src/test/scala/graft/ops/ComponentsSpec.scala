package graft.ops

import graft.SparkSuite

class ComponentsSpec extends SparkSuite {

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val df = edges.toDF("a", "b")
    Components.connectedComponents(spark, df)
      .as[(Long, Long)].collect().toMap
  }

  test("a chain collapses to one component labeled by its minimum") {
    val got = cc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("disjoint components keep separate minimum labels") {
    val got = cc(Seq((10L, 11L), (11L, 12L), (20L, 21L), (30L, 31L), (31L, 30L)))
    assert(got == Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 30L -> 30L, 31L -> 30L))
  }

  test("star and cycle shapes converge regardless of edge orientation") {
    // star centered high (label must flow up from the leaf minimum),
    // plus a 4-cycle
    val got = cc(Seq((100L, 7L), (100L, 8L), (100L, 9L),
      (50L, 51L), (51L, 52L), (52L, 53L), (53L, 50L)))
    assert(got(100L) == 7L && got(8L) == 7L && got(9L) == 7L)
    assert(Seq(50L, 51L, 52L, 53L).forall(got(_) == 50L))
  }

  private def ccStar(edges: Seq[(Long, Long)], maxIter: Int = 50): Map[Long, Long] = {
    import spark.implicits._
    Components.connectedComponentsStar(spark, edges.toDF("a", "b"), maxIter)
      .as[(Long, Long)].collect().toMap
  }

  test("star contraction labels a 1024-node path in O(log²) rounds") {
    // diameter 1023 would need 1023 min-label rounds; the contraction
    // budget of 20 is the log² claim, not a tuned constant
    val edges = (0L until 1023L).map(i => (i, i + 1))
    val got = ccStar(edges, maxIter = 20)
    assert(got.size == 1024 && got.values.forall(_ == 0L))
  }

  test("star contraction matches min-label propagation on mixed shapes") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), // chain
      (100L, 7L), (100L, 8L), (100L, 9L),                   // star
      (50L, 51L), (51L, 52L), (52L, 53L), (53L, 50L),       // cycle
      (200L, 200L))                                         // self-loop
    assert(ccStar(edges) == cc(edges))
  }

  test("propagation with a too-small budget falls back to contraction, not a split") {
    import spark.implicits._
    val edges = (0L until 200L).map(i => (i, i + 1)).toDF("a", "b")
    val got = Components.connectedComponents(spark, edges, maxIter = 3)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 201 && got.values.forall(_ == 0L))
  }
}
