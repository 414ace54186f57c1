package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** The opt-in cartesian guardrail: naked cross joins throw, the
  * broadcast-attach pattern and keyed joins pass, and the default
  * (guard off) changes nothing. */
class CartesianGuardSpec extends SparkSuite {

  private def withGuard[A](on: Boolean)(body: => A): A = {
    GraftExtensions.install(spark)
    spark.conf.set(CartesianGuard.EnabledKey, on.toString)
    try body finally spark.conf.set(CartesianGuard.EnabledKey, "false")
  }

  private def left = spark.range(3).select(col("id").as("a"))
  private def right = spark.range(3).select(col("id").as("b"))

  test("naked cross join is rejected when the guard is on") {
    withGuard(on = true) {
      val e = intercept[Exception] { left.crossJoin(right).collect() }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("CartesianGuard")), e.toString)
    }
  }

  test("broadcast-attach cross join and keyed joins pass the guard") {
    withGuard(on = true) {
      assert(left.crossJoin(broadcast(right)).count() === 9)
      assert(left.join(right, col("a") === col("b")).count() === 3)
    }
  }

  test("guard is off by default") {
    GraftExtensions.install(spark)
    spark.conf.unset(CartesianGuard.EnabledKey)
    assert(left.crossJoin(right).count() === 9)
  }
}
