package graft.ops

import java.sql.Timestamp
import graft.SparkSuite

class Sar1Spec extends SparkSuite {

  /** Independent closed-form reference: build the (y, x_{t−1}, x_{t−s})
    * design directly in doubles and solve the 3×3 normal equations by
    * Gaussian elimination — a DIFFERENT solver than the fold's Cramer
    * expansion, so a determinant-expansion bug can't cancel out. */
  private def ref(xs: Seq[Double], s: Int)
      : Option[(Long, Double, Double, Double, Double)] = {
    val rows = (s until xs.size).map(t => (xs(t), xs(t - 1), xs(t - s)))
    val n = rows.size
    if (n < 5) return None
    // normal equations A·β = b for X = [1, a, b]
    val a = Array.ofDim[Double](3, 4)
    rows.foreach { case (y, x1, x2) =>
      val v = Array(1.0, x1, x2)
      for (i <- 0 until 3; j <- 0 until 3) a(i)(j) += v(i) * v(j)
      for (i <- 0 until 3) a(i)(3) += v(i) * y
    }
    // partial-pivot elimination
    for (p <- 0 until 3) {
      val piv = (p until 3).maxBy(i => math.abs(a(i)(p)))
      if (math.abs(a(piv)(p)) < 1e-12) return None
      val tmp = a(p); a(p) = a(piv); a(piv) = tmp
      for (i <- p + 1 until 3) {
        val f = a(i)(p) / a(p)(p)
        for (j <- p to 3) a(i)(j) -= f * a(p)(j)
      }
    }
    val beta = new Array[Double](3)
    for (i <- 2 to 0 by -1) {
      var acc = a(i)(3)
      for (j <- i + 1 until 3) acc -= a(i)(j) * beta(j)
      beta(i) = acc / a(i)(i)
    }
    val sse = rows.map { case (y, x1, x2) =>
      val e = y - beta(0) - beta(1) * x1 - beta(2) * x2; e * e
    }.sum
    Some((n.toLong, beta(0), beta(1), beta(2), sse / (n - 3)))
  }

  private def toDf(series: Map[Long, Seq[Double]]) = {
    import spark.implicits._
    series.toSeq.flatMap { case (uid, xs) =>
      xs.zipWithIndex.map { case (v, i) =>
        (uid, new Timestamp(1700000000000L + i * 60000L), i.toLong, v)
      }
    }.toDF("user_id", "ts", "event_id", "value")
  }

  test("property: Cramer fold matches an independent Gaussian-elimination solve (5 seeds)") {
    for (seed <- 1L to 5L) {
      val rnd = new scala.util.Random(seed)
      val series = (1L to 4L).map { uid =>
        val n = 30 + rnd.nextInt(70)
        var x = 50.0 + rnd.nextInt(100)
        uid -> Seq.fill(n) {
          x = math.round((x + rnd.nextGaussian() * 5) * 100) / 100.0
          x
        }
      }.toMap
      val got = Sar1.fit(spark, toDf(series), season = 7).collect()
        .map(r => r.user_id -> r).toMap
      series.foreach { case (uid, xs) =>
        ref(xs, 7) match {
          case Some((n, c0, phi, phis, sigma2)) =>
            val g = got(uid)
            assert(g.n == n, s"seed=$seed uid=$uid n")
            assert(math.abs(g.drift - c0) < 1e-7, s"seed=$seed uid=$uid drift")
            assert(math.abs(g.phi - phi) < 1e-7, s"seed=$seed uid=$uid phi")
            assert(math.abs(g.phi_s - phis) < 1e-7, s"seed=$seed uid=$uid phi_s")
            assert(math.abs(g.sigma2 - sigma2) < 1e-7, s"seed=$seed uid=$uid sigma2")
          case None => assert(!got.contains(uid))
        }
      }
    }
  }

  test("recovers the generating parameters of a synthetic SAR(1)_7 process") {
    // x_t = 5 + 0.4·x_{t−1} + 0.35·x_{t−7} + N(0, 2²)
    val rnd = new scala.util.Random(7L)
    val xs = scala.collection.mutable.ArrayBuffer.fill(7)(20.0)
    for (_ <- 0 until 8000) {
      val t = xs.size
      val v = 5.0 + 0.4 * xs(t - 1) + 0.35 * xs(t - 7) + rnd.nextGaussian() * 2.0
      xs += math.round(v * 100) / 100.0
    }
    val r = Sar1.fit(spark, toDf(Map(1L -> xs.toSeq)), season = 7)
      .collect().head
    assert(math.abs(r.phi - 0.4) < 0.05, s"phi=${r.phi}")
    assert(math.abs(r.phi_s - 0.35) < 0.05, s"phi_s=${r.phi_s}")
    assert(math.abs(r.sigma2 - 4.0) < 0.5, s"sigma2=${r.sigma2}")
  }

  test("a pure seasonal process loads on phi_s, not phi") {
    // alternating two-regime weekly pattern with noise: the seasonal lag
    // is the predictive one
    val rnd = new scala.util.Random(11L)
    val xs = (0 until 2000).map { t =>
      val base = if ((t / 7) % 2 == 0) 40.0 else 80.0
      math.round((base + rnd.nextGaussian()) * 100) / 100.0
    }
    val r = Sar1.fit(spark, toDf(Map(1L -> xs)), season = 14).collect().head
    assert(r.phi_s > 0.8, s"phi_s=${r.phi_s}")
    assert(math.abs(r.phi) < 0.2, s"phi=${r.phi}")
  }

  test("constant series (singular design) and short series are dropped") {
    val got = Sar1.fit(spark, toDf(Map(
      1L -> Seq.fill(40)(5.0),            // singular: det = 0
      2L -> Seq(1.0, 2.0, 3.0, 4.0, 5.0), // too short for season 7
      3L -> (1 to 40).map(i => (i * 13 % 29).toDouble))), season = 7)
      .collect()
    assert(got.map(_.user_id).toSet == Set(3L), got.mkString(","))
  }
}
