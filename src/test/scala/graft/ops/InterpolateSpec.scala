package graft.ops

import java.sql.Timestamp
import graft.SparkSuite

class InterpolateSpec extends SparkSuite {

  private def mk(vals: Seq[Option[Double]], uid: Long = 1L) =
    vals.zipWithIndex.map { case (v, i) =>
      (uid, new Timestamp(1700000000000L + i * 60000L), i.toLong, v)
    }

  private def run(vals: Seq[Option[Double]]): Seq[Double] = {
    import spark.implicits._
    val df = mk(vals).toDF("user_id", "ts", "event_id", "value")
    Interpolate.quadratic(spark, df).collect().sortBy(_.event_id).map(_.v_interp).toSeq
  }

  test("recovers points on an exact parabola") {
    // y = x^2: knowns at 0,1,3,4; null at 2 → quadratic through (0,1,3) or
    // (1,3,+) — any 3 points of a parabola reproduce it exactly
    val got = run(Seq(Some(0.0), Some(1.0), None, Some(9.0), Some(16.0)))
    assert(math.abs(got(2) - 4.0) < 1e-9)
  }

  test("single left point degrades to linear") {
    // knowns at positions 0 and 2, null at 1 → linear midpoint
    val got = run(Seq(Some(10.0), None, Some(20.0)))
    assert(math.abs(got(1) - 15.0) < 1e-9)
  }

  test("head nulls backfill, tail nulls forward fill") {
    val got = run(Seq(None, None, Some(5.0), Some(6.0), None))
    assert(got(0) === 5.0 && got(1) === 5.0 && got(4) === 6.0)
  }

  test("non-null rows pass through unchanged and row count is preserved") {
    val in = Seq(Some(1.0), None, Some(3.0), None, None, Some(6.0))
    val got = run(in)
    assert(got.length === in.length)
    assert(got(0) === 1.0 && got(2) === 3.0 && got(5) === 6.0)
  }

  test("series are independent across keys") {
    import spark.implicits._
    val df = (mk(Seq(Some(1.0), None, Some(3.0)), uid = 1) ++
      mk(Seq(Some(100.0), None, Some(300.0)), uid = 2))
      .toDF("user_id", "ts", "event_id", "value")
    val by = Interpolate.quadratic(spark, df).collect().groupBy(_.user_id)
    assert(math.abs(by(1L).sortBy(_.event_id).apply(1).v_interp - 2.0) < 1e-9)
    assert(math.abs(by(2L).sortBy(_.event_id).apply(1).v_interp - 200.0) < 1e-9)
  }
}
