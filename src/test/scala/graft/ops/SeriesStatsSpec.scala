package graft.ops

import java.sql.Timestamp
import graft.SparkSuite

class SeriesStatsSpec extends SparkSuite {

  private def series(uid: Long, vals: Seq[Double]) =
    vals.zipWithIndex.map { case (v, i) =>
      (uid, new Timestamp(1700000000000L + i * 60000L), i.toLong, v)
    }

  // deterministic LCG noise
  private def noise(n: Int, seed: Long): Seq[Double] = {
    var s = seed
    (1 to n).map { _ =>
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
  }

  test("ADF t-stat is strongly negative for white noise, near zero for a random walk") {
    import spark.implicits._
    val wn = noise(300, 42L)
    val rw = wn.scanLeft(0.0)(_ + _).tail
    val df = (series(1L, wn) ++ series(2L, rw))
      .toDF("user_id", "ts", "event_id", "value")
    val st = SeriesStats.perSeries(spark, df).collect().map(s => s.user_id -> s).toMap
    assert(st(1L).adf_t < -10.0, s"white noise should reject unit root, got ${st(1L).adf_t}")
    assert(st(2L).adf_t > -3.0, s"random walk should not strongly reject, got ${st(2L).adf_t}")
  }

  test("Ljung-Box Q is small for iid noise, large for a strongly autocorrelated series") {
    import spark.implicits._
    val wn = noise(300, 7L)
    val ar = wn.scanLeft(0.0)((prev, e) => 0.95 * prev + e).tail
    val df = (series(1L, wn) ++ series(2L, ar))
      .toDF("user_id", "ts", "event_id", "value")
    val st = SeriesStats.perSeries(spark, df).collect().map(s => s.user_id -> s).toMap
    // chi2(10) 95% critical value ≈ 18.3
    assert(st(1L).ljung_box_q < 30.0)
    assert(st(2L).ljung_box_q > 100.0)
  }

  test("degenerate series produce NaN, not exceptions") {
    import spark.implicits._
    val df = (series(1L, Seq(1.0, 1.0, 1.0, 1.0)) ++ series(2L, Seq(5.0)))
      .toDF("user_id", "ts", "event_id", "value")
    val st = SeriesStats.perSeries(spark, df).collect().map(s => s.user_id -> s).toMap
    assert(st(1L).adf_t.isNaN && st(2L).adf_t.isNaN)
  }
}
