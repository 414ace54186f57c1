package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.WindowFeatures._

/** Property-style invariants (SURVEY §5 test strategy) over seeded random
  * series: lag/diff inversion, fill idempotence, dedup containment, union
  * row-count algebra. Seeds are fixed → deterministic CI.
  */
class PropertiesSpec extends SparkSuite {

  private def randomSeries(seed: Long, n: Int, nulls: Boolean = false) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val v: Option[Double] =
        if (nulls && rnd.nextInt(4) == 0) None
        else Some(math.round(rnd.nextDouble() * 10000) / 100.0)
      (1L + rnd.nextInt(3), new Timestamp(1700000000000L + i * 1000L), i.toLong, v)
    }.toDF("user_id", "ts", "event_id", "value")
  }

  private val w = seriesWindow(col("user_id"), col("ts"), col("event_id"))

  test("property: first(value) + cumsum(diff) recovers every series (5 seeds)") {
    for (seed <- 1L to 5L) {
      val df = randomSeries(seed, 200)
      val bad = df
        .withColumn("d", diff(col("value"), w))
        .withColumn("rebuilt",
          first(col("value")).over(w.rowsBetween(Window.unboundedPreceding, 0)) +
            coalesce(sum(col("d")).over(w.rowsBetween(Window.unboundedPreceding, 0)), lit(0.0)))
        .filter(abs(col("value") - col("rebuilt")) > 1e-9)
        .count()
      assert(bad === 0L, s"seed=$seed")
    }
  }

  test("property: ffill is idempotent and never introduces nulls mid-run (5 seeds)") {
    for (seed <- 1L to 5L) {
      val df = randomSeries(seed, 200, nulls = true)
      val once = df.withColumn("f1", ffill(col("value"), w))
      val twice = once.withColumn("f2", ffill(col("f1"), w))
      assert(twice.filter(not(col("f1") <=> col("f2"))).count() === 0L, s"seed=$seed")
    }
  }

  test("property: dedup output is a subset of input with unique keys (5 seeds)") {
    for (seed <- 1L to 5L) {
      val df = randomSeries(seed, 200)
        .withColumn("day", to_date(col("ts")))
      val dd = dedupKeepFirst(df, Seq(col("user_id"), col("day")),
        Seq(col("ts"), col("event_id")))
      // unique keys
      val dupKeys = dd.groupBy("user_id", "day").count().filter(col("count") > 1).count()
      assert(dupKeys === 0L, s"seed=$seed")
      // subset: every surviving event_id exists in the input
      assert(dd.join(df.select("event_id"), Seq("event_id"), "left_anti").count() === 0L)
    }
  }

  test("property: unionByName row count is additive and column-order independent (5 seeds)") {
    for (seed <- 1L to 5L) {
      val a = randomSeries(seed, 100).select("user_id", "event_id", "value")
      val b = randomSeries(seed + 100, 50).select("value", "user_id", "event_id")
      assert(a.unionByName(b).count() === a.count() + b.count(), s"seed=$seed")
    }
  }

  test("checkpoint parity: flagship pipeline stage counts are consistent (glue.py CHECKPOINTs)") {
    // the reference asserts cardinality at read / post-join / post-window /
    // final stages (glue.py:93-229); here: the flagship output must have
    // exactly one row per (user_id, day) present in the pruned scan
    val refined = pipeline.Flagship.refined(spark, sf).cache()
    val ev = Tables.events(spark, sf)
      .filter(col("ts") >= lit("2024-01-01").cast("timestamp") &&
        col("ts") < lit("2025-01-01").cast("timestamp"))
    val expectedKeys = ev
      .select(col("user_id"), to_date(col("ts")).as("date")).distinct().count()
    assert(refined.count() === expectedKeys)
    assert(refined.filter(col("value_diff").isNull).count() === 0L) // imputed
    refined.unpersist()
  }
}
