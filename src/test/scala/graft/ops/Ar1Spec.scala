package graft.ops

import java.sql.Timestamp
import graft.SparkSuite

class Ar1Spec extends SparkSuite {

  /** Closed-form reference on a local ordered series: the same conditional
    * least-squares normal equations, computed directly in doubles from the
    * lag-1 pairs (no integer-moment staging — an INDEPENDENT formulation,
    * so a unit-scaling bug in the fold can't cancel out). */
  private def ref(xs: Seq[Double]): (Long, Double, Double, Double) = {
    val pairs = xs.zip(xs.tail)
    val n = pairs.size.toDouble
    val sx = pairs.map(_._1).sum
    val sy = pairs.map(_._2).sum
    val sxy = pairs.map(p => p._1 * p._2).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val phi = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val drift = (sy - phi * sx) / n
    val sigma2 = ((syy - sy * sy / n) - phi * (sxy - sx * sy / n)) / (n - 2)
    (pairs.size.toLong, phi, drift, sigma2)
  }

  private def toDf(series: Map[Long, Seq[Double]]) = {
    import spark.implicits._
    series.toSeq.flatMap { case (uid, xs) =>
      xs.zipWithIndex.map { case (v, i) =>
        (uid, new Timestamp(1700000000000L + i * 60000L), i.toLong, v)
      }
    }.toDF("user_id", "ts", "event_id", "value")
  }

  test("property: fold matches the closed-form normal equations (5 seeds)") {
    for (seed <- 1L to 5L) {
      val rnd = new scala.util.Random(seed)
      val series = (1L to 4L).map { uid =>
        val n = 20 + rnd.nextInt(80)
        // 2-decimal random walk so values look like the fixture's
        var x = 50.0 + rnd.nextInt(100)
        uid -> Seq.fill(n) {
          x = math.round((x + rnd.nextGaussian() * 5) * 100) / 100.0
          x
        }
      }.toMap
      val got = Ar1.fit(spark, toDf(series)).collect()
        .map(r => r.user_id -> r).toMap
      assert(got.keySet == series.keySet, s"seed=$seed: one row per series")
      series.foreach { case (uid, xs) =>
        val (n, phi, drift, sigma2) = ref(xs)
        val g = got(uid)
        assert(g.n == n, s"seed=$seed uid=$uid n")
        assert(math.abs(g.phi - phi) < 1e-9, s"seed=$seed uid=$uid phi")
        assert(math.abs(g.drift - drift) < 1e-9, s"seed=$seed uid=$uid drift")
        assert(math.abs(g.sigma2 - sigma2) < 1e-9, s"seed=$seed uid=$uid sigma2")
      }
    }
  }

  test("recovers the generating parameters of a synthetic AR(1)") {
    // x_t = 10 + 0.6·x_{t-1} + N(0, 2²), long series → tight estimates
    val rnd = new scala.util.Random(42L)
    var x = 25.0
    val xs = Seq.fill(5000) {
      x = math.round((10.0 + 0.6 * x + rnd.nextGaussian() * 2.0) * 100) / 100.0
      x
    }
    val r = Ar1.fit(spark, toDf(Map(1L -> xs))).collect().head
    assert(math.abs(r.phi - 0.6) < 0.05, s"phi=${r.phi}")
    assert(math.abs(r.drift - 10.0) < 3.0, s"drift=${r.drift}")
    assert(math.abs(r.sigma2 - 4.0) < 0.5, s"sigma2=${r.sigma2}")
  }

  test("short series are dropped, 4-point series are kept") {
    val r = Ar1.fit(spark,
      toDf(Map(1L -> Seq(1.0, 2.0, 3.0), 2L -> Seq(1.0, 2.0, 4.0, 8.0))))
      .collect()
    assert(r.map(_.user_id).toSet == Set(2L), "3 obs = 2 pairs → dropped")
    assert(r.head.n == 3L)
  }
}
