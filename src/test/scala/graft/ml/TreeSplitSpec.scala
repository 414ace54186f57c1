package graft.ml

import graft.{SparkSuite, SparkEntry}

/** Semantic check for ml_tree_split: the distributed histogram argmax
  * must agree with a driver-side brute force over the same binned data —
  * every candidate split enumerated, gain computed the same way, best
  * picked with the same (gain desc, bin asc) tie-break.
  */
class TreeSplitSpec extends SparkSuite {

  private def bruteBest(rows: Seq[(Long, Long)]): (Long, Long, Long, Double) = {
    // rows = (bin, y); returns (splitBin, nLeft, nRight, gain)
    val byBin = rows.groupBy(_._1).map { case (b, rs) =>
      (b, rs.size.toLong, rs.map(_._2).sum)
    }.toSeq.sortBy(_._1)
    val nt = byBin.map(_._2).sum
    val st = byBin.map(_._3).sum
    var nl = 0L; var sl = 0L
    val cands = byBin.dropRight(1).map { case (b, n, s) =>
      nl += n; sl += s
      val nr = nt - nl; val sr = st - sl
      val gain = sl.toDouble * sl.toDouble / nl.toDouble +
        sr.toDouble * sr.toDouble / nr.toDouble -
        st.toDouble * st.toDouble / nt.toDouble
      (b, nl, nr, gain)
    }
    cands.minBy { case (b, _, _, g) => (-g, b) }
  }

  test("ml_tree_split matches a brute-force argmax on both features") {
    val out = SparkEntry.queries("ml_tree_split")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(6))).toMap
    assert(out.keySet == Set("qty", "disc"))

    val li = graft.Tables.lineitem(spark, sf)
      .selectExpr("CAST(l_quantity AS BIGINT) AS qty",
        "CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS disc",
        "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    val qtyBest = bruteBest(li.map { case (q, _, y) => (q / 2, y) })
    val discBest = bruteBest(li.map { case (_, d, y) => (d, y) })

    assert(out("qty") == ((qtyBest._1, qtyBest._2, qtyBest._3, qtyBest._4)),
      s"qty: got ${out("qty")}, brute $qtyBest")
    assert(out("disc") == ((discBest._1, discBest._2, discBest._3, discBest._4)),
      s"disc: got ${out("disc")}, brute $discBest")
    // variance-reduction gain is non-negative by Cauchy–Schwarz
    assert(out.values.forall(_._4 >= 0.0))
  }
}
