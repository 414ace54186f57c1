package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSuite

class ApproxDistinctRuleSpec extends SparkSuite {

  private def distinctCount() = {
    import spark.implicits._
    (1 to 10000).map(i => i % 997).toDF("x")
      .agg(countDistinct(col("x")).as("d"))
  }

  test("off by default: exact count(distinct) result") {
    GraftExtensions.install(spark)
    spark.conf.set(ApproxDistinctRule.EnabledKey, "false")
    assert(distinctCount().collect().head.getLong(0) === 997L)
  }

  test("enabled: plan uses HLL++ sketch and result is within rsd") {
    GraftExtensions.install(spark)
    spark.conf.set(ApproxDistinctRule.EnabledKey, "true")
    spark.conf.set(ApproxDistinctRule.RsdKey, "0.02")
    try {
      val df = distinctCount()
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("approx_count_distinct") ||
        optimized.contains("hyperloglog"),
        s"expected HLL in plan:\n$optimized")
      val got = df.collect().head.getLong(0)
      assert(math.abs(got - 997L) <= 997 * 0.1, s"approx=$got")
    } finally spark.conf.set(ApproxDistinctRule.EnabledKey, "false")
  }

  test("grouped distinct counts are rewritten too") {
    import spark.implicits._
    GraftExtensions.install(spark)
    spark.conf.set(ApproxDistinctRule.EnabledKey, "true")
    try {
      val df = (1 to 5000).map(i => (i % 5, i % 321)).toDF("g", "x")
        .groupBy("g").agg(countDistinct(col("x")).as("d"))
      val rows = df.collect()
      assert(rows.length === 5)
      rows.foreach(r => assert(math.abs(r.getLong(1) - 321L) <= 32))
    } finally spark.conf.set(ApproxDistinctRule.EnabledKey, "false")
  }
}
