package graft

import org.apache.spark.sql.Row

/** w18 semantics pin: the exact-integer-moment rolling skew/kurtosis must
  * agree with a naive two-pass (mean, then centered powers) computation of
  * the pandas-adjusted G1/G2 on real frames — an independent formulation
  * (float centering vs integer raw-moment combination), so an algebra slip
  * in the M2/M3/M4 expansion would show up as >1e-6 disagreement.
  */
class WindowMomentsSpec extends SparkSuite {

  private def g1g2(xs: Seq[Double]): (Double, Double) = {
    val n = xs.size
    val mu = xs.sum / n
    val c = xs.map(_ - mu)
    val m2 = c.map(v => v * v).sum / n
    val m3 = c.map(v => v * v * v).sum / n
    val m4 = c.map(v => v * v * v * v).sum / n
    val g1 = m3 / math.pow(m2, 1.5)
    val g2 = m4 / (m2 * m2) - 3.0
    val adj1 = g1 * math.sqrt(n.toDouble * (n - 1)) / (n - 2)
    val adj2 = ((n + 1) * g2 + 6.0) * (n - 1) / ((n - 2.0) * (n - 3.0))
    (adj1, adj2)
  }

  test("w18 rolling skew/kurt matches a naive centered-moment computation") {
    val res = SparkEntry.queries("w18_rolling_skew")(spark, sf)
      .filter("skew20 is not null")
      .orderBy("user_id", "event_id").limit(5).collect()
    assert(res.nonEmpty, "no full 20-row frame in the fixture")
    // reconstruct each row's frame from the raw series
    val ev = Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
    val byUser = ev.groupBy(_._1).map { case (u, rows) =>
      u -> rows.sortBy(t => (t._2.getTime, t._3))
    }
    res.foreach { case Row(eid: Long, uid: Long, sk: Double, ku: Double) =>
      val series = byUser(uid)
      val idx = series.indexWhere(_._3 == eid)
      assert(idx >= 19)
      // frame values in cents, as the query quantizes them
      val frame = series.slice(idx - 19, idx + 1)
        .map(t => math.rint(BigDecimal(t._4).setScale(2,
          BigDecimal.RoundingMode.HALF_UP).toDouble * 100) / 100.0)
      val (e1, e2) = g1g2(frame)
      assert(math.abs(sk - e1) < 2e-6, s"skew uid=$uid eid=$eid: $sk vs $e1")
      assert(math.abs(ku - e2) < 2e-6, s"kurt uid=$uid eid=$eid: $ku vs $e2")
    }
  }

  test("w19 rolling median is the exact lower median of every 15-row frame") {
    val res = SparkEntry.queries("w19_rolling_median")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val ev = Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
    val byUser = ev.groupBy(_._1).map { case (u, rows) =>
      u -> rows.sortBy(t => (t._2.getTime, t._3))
    }
    assert(res.length == ev.length, "one median per event")
    res.foreach { case (eid, uid, got) =>
      val series = byUser(uid)
      val idx = series.indexWhere(_._3 == eid)
      val cents = series.slice(math.max(0, idx - 14), idx + 1)
        .map(t => (BigDecimal(t._4).setScale(2,
          BigDecimal.RoundingMode.HALF_UP) * 100).toLong)
      val want = cents.sorted.apply((cents.length + 1) / 2 - 1).toDouble / 100.0
      assert(got == want, s"median uid=$uid eid=$eid: $got vs $want")
    }
  }
}
