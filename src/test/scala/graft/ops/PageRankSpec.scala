package graft.ops

import graft.SparkSuite

class PageRankSpec extends SparkSuite {

  private def pr(edges: Seq[(Long, Long)], iters: Int = 5): Map[Long, Long] = {
    import spark.implicits._
    val df = edges.toDF("src", "dst")
    PageRank.run(spark, df, iters)
      .as[(Long, Long)].collect().toMap
  }

  /** Local fixed-point reference: the same truncating integer recurrence,
    * computed sequentially — the distributed run must match it exactly. */
  private def prRef(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = edges.map(_._1).distinct
    val outdeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val n = nodes.size
    val teleport = (PageRank.Unit * 15 / 100) / n
    var p = nodes.map(_ -> PageRank.Unit / n).toMap
    for (_ <- 1 to iters) {
      val msgs = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _) => p(s) / outdeg(s) }.sum
      }
      p = nodes.map(v => v -> (teleport + 85 * msgs.getOrElse(v, 0L) / 100)).toMap
    }
    p
  }

  test("distributed run matches the sequential fixed-point reference exactly") {
    // two triangles joined by a bridge, symmetrized
    val raw = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L),
      (4L, 5L), (5L, 6L), (6L, 4L))
    val sym = raw ++ raw.map(_.swap)
    assert(pr(sym) == prRef(sym, 5))
  }

  test("allReceive fast path equals the general path on a symmetric graph") {
    import spark.implicits._
    val raw = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
    val sym = raw ++ raw.map(_.swap)
    val general = pr(sym)
    val fast = PageRank.run(spark, sym.toDF("src", "dst"), 5, 85,
      allReceive = true).as[(Long, Long)].collect().toMap
    assert(fast == general)
  }

  test("directed graph with a message-less node falls back to teleport rank") {
    // 1↔2 cycle plus 3→1: node 3 appears as src (contract holds) but
    // never as dst, so it receives no messages and must keep teleport
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 1L))
    val got = pr(edges)
    assert(got == prRef(edges, 5))
    assert(got(3L) == (PageRank.Unit * 15 / 100) / 3)
  }

  test("rank mass is conserved up to truncation dust") {
    val raw = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (2L, 4L))
    val sym = (raw ++ raw.map(_.swap)).distinct
    val got = pr(sym)
    val total = got.values.sum
    // each node truncates at most a few units per iteration; dust is
    // bounded by nodes × iters × (1 for the message div + 1 for the damp
    // div) plus the initial 1/n remainder
    assert(total <= PageRank.Unit)
    assert(PageRank.Unit - total <= 4L * 5 * 2 + PageRank.Unit % 4)
  }

  test("symmetric star concentrates rank on the hub") {
    val raw = Seq((10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L))
    val sym = raw ++ raw.map(_.swap)
    val got = pr(sym)
    assert(got(10L) > got(1L) * 2)
    assert(Seq(1L, 2L, 3L, 4L).map(got).distinct.size == 1)
  }
}
