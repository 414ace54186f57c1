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
}
