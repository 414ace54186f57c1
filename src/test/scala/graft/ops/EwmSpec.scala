package graft.ops

import java.sql.Timestamp
import graft.SparkSuite

class EwmSpec extends SparkSuite {

  /** pandas ewm(span, adjust=True).mean() reference implementation. */
  private def ewmRef(xs: Seq[Double], span: Int): Seq[Double] = {
    val a = 2.0 / (span + 1.0)
    var num = 0.0; var den = 0.0
    xs.map { x =>
      num = x + (1 - a) * num
      den = 1 + (1 - a) * den
      num / den
    }
  }

  test("macd matches the recursive pandas-adjusted definition per series") {
    import spark.implicits._
    val xs = Seq(1.0, 2.0, 4.0, 3.0, 5.0, 8.0, 6.0, 7.0, 9.0, 10.0)
    val rows = xs.zipWithIndex.map { case (v, i) =>
      (1L, new Timestamp(1700000000000L + i * 60000L), i.toLong, v)
    } ++ xs.zipWithIndex.map { case (v, i) => // second series, shifted values
      (2L, new Timestamp(1700000000000L + i * 60000L), (100 + i).toLong, v * 2)
    }
    val df = rows.toDF("user_id", "ts", "event_id", "value")
    val got = Ewm.macd(spark, df).collect().groupBy(_.user_id)

    val e12 = ewmRef(xs, 12); val e26 = ewmRef(xs, 26)
    val macd = e12.zip(e26).map { case (a, b) => a - b }
    val sig = ewmRef(macd, 9)
    val s1 = got(1L).sortBy(_.event_id)
    assert(s1.map(_.ewm_12).zip(e12).forall { case (g, w) => math.abs(g - w) < 1e-12 })
    assert(s1.map(_.macd).zip(macd).forall { case (g, w) => math.abs(g - w) < 1e-12 })
    assert(s1.map(_.macd_signal).zip(sig).forall { case (g, w) => math.abs(g - w) < 1e-12 })
    // series 2 is independent: its ewm must be exactly 2x series 1's
    val s2 = got(2L).sortBy(_.event_id)
    assert(s2.map(_.ewm_12).zip(e12).forall { case (g, w) => math.abs(g - 2 * w) < 1e-12 })
  }

  test("first ewm value equals the first observation") {
    import spark.implicits._
    val df = Seq((1L, new Timestamp(0L), 0L, 42.5))
      .toDF("user_id", "ts", "event_id", "value")
    val r = Ewm.macd(spark, df).collect().head
    assert(r.ewm_12 === 42.5 && r.ewm_26 === 42.5 && r.macd === 0.0)
  }
}
