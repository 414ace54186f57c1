package graft.ops

import java.sql.Timestamp
import graft.SparkSuite

class HoltSpec extends SparkSuite {

  /** Float reference of the same recursion (α=0.5, β=0.3, l₁=x₁, b₁=0) —
    * an INDEPENDENT formulation in doubles, so a unit-scaling or
    * truncation-direction bug in the integer fold shows up as drift far
    * above the ~1e-6-per-step truncation envelope. */
  private def ref(xs: Seq[Double]): (Double, Double, Double, Double) = {
    var l = xs.head; var b = 0.0; var sae = 0.0
    xs.tail.foreach { x =>
      sae += math.abs(x - (l + b))
      val lNew = 0.5 * x + 0.5 * (l + b)
      b = 0.3 * (lNew - l) + 0.7 * b
      l = lNew
    }
    (l, b, l + b, sae / (xs.size - 1))
  }

  private def toDf(series: Map[Long, Seq[Double]]) = {
    import spark.implicits._
    series.toSeq.flatMap { case (uid, xs) =>
      xs.zipWithIndex.map { case (v, i) =>
        (uid, new Timestamp(1700000000000L + i * 60000L), i.toLong, v)
      }
    }.toDF("user_id", "ts", "event_id", "value")
  }

  test("property: integer fold tracks the float recursion (5 seeds)") {
    for (seed <- 1L to 5L) {
      val rnd = new scala.util.Random(seed)
      val series = (1L to 4L).map { uid =>
        val n = 20 + rnd.nextInt(80)
        var x = 50.0 + rnd.nextInt(100)
        uid -> Seq.fill(n) {
          x = math.round((x + rnd.nextGaussian() * 5) * 100) / 100.0
          x
        }
      }.toMap
      val got = Holt.smooth(spark, toDf(series)).collect()
        .map(r => r.user_id -> r).toMap
      assert(got.keySet == series.keySet)
      series.foreach { case (uid, xs) =>
        val (l, b, f, mae) = ref(xs)
        val g = got(uid)
        // truncating 1e-6 steps accumulate < n·1e-6 ≈ 1e-4 drift
        assert(math.abs(g.level - l) < 1e-3, s"seed=$seed uid=$uid level")
        assert(math.abs(g.trend - b) < 1e-3, s"seed=$seed uid=$uid trend")
        assert(math.abs(g.forecast - f) < 2e-3, s"seed=$seed uid=$uid forecast")
        assert(math.abs(g.mae - mae) < 1e-3, s"seed=$seed uid=$uid mae")
      }
    }
  }

  test("linear series: level converges onto the line, trend onto its slope") {
    val xs = (0 until 60).map(i => 100.0 + 2.0 * i)
    val got = Holt.smooth(spark, toDf(Map(1L -> xs))).collect().head
    // Holt tracks a deterministic linear trend with vanishing lag
    assert(math.abs(got.trend - 2.0) < 0.05, s"trend=${got.trend}")
    assert(math.abs(got.forecast - (100.0 + 2.0 * 60)) < 0.5,
      s"forecast=${got.forecast}")
  }

  test("constant series: zero trend, zero MAE, level = the constant") {
    val got = Holt.smooth(spark, toDf(Map(1L -> Seq.fill(10)(42.5)))).collect().head
    assert(got.level == 42.5 && got.trend == 0.0 && got.mae == 0.0)
  }

  test("series shorter than 2 observations are skipped") {
    val got = Holt.smooth(spark,
      toDf(Map(1L -> Seq(7.0), 2L -> Seq(1.0, 2.0)))).collect()
    assert(got.map(_.user_id).toSet == Set(2L))
  }

  test("plan: one exchange, secondary sort inside it") {
    // over the parquet fixture — a tiny LocalTableScan input can plan
    // without a shuffle, which would vacuously pass/fail the pin
    val ds = Holt.smooth(spark, graft.Tables.events(spark, sf))
    ds.collect()
    val plan = ds.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected one exchange:\n$plan")
    assert(!plan.contains("Window"), s"must not use a window:\n$plan")
  }
}
