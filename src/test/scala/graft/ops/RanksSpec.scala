package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.SparkSuite

/** The distributed scan primitive vs the single-partition window it
  * replaces — must agree exactly across range-partition boundaries. */
class RanksSpec extends SparkSuite {

  test("globalPrefixSum equals the one-partition running sum on a total order") {
    val df = spark.range(0, 10000)
      .select(col("id"),
        pmod(col("id") * 2654435761L, lit(997)).as("k"),
        (pmod(col("id") * 40503L, lit(100)) + 1).as("v"))
    // AQE would coalesce a 10k-row sort to one partition and the
    // cross-boundary property would go untested — pin it off here
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    val got = try {
      val g = graft.Ranks.globalPrefixSum(df, "v",
        Seq(col("k").desc, col("id").asc), "cum")
      g.cache().count()
      g
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
    // ground truth: the funnel shape (fine at test scale)
    val w = Window.orderBy(col("k").desc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("cum_w", sum(col("v")).over(w))
    val mism = got.join(want, Seq("id"))
      .filter(col("cum") =!= col("cum_w")).count()
    assert(mism === 0, "prefix sums must match across partition boundaries")
    // the cached result really crossed range-partition boundaries
    assert(got.rdd.getNumPartitions > 1,
      "prefix sum must run over a multi-partition range sort")
    got.unpersist()
  }

  test("globalPrefixSums carries k columns in one sort and returns exact totals") {
    val df = spark.range(0, 8000)
      .select(col("id"),
        (pmod(col("id") * 48271L, lit(50)) + 1).as("a"),
        (pmod(col("id") * 16807L, lit(30)) + 1).as("b"))
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    val (got, totals) = try {
      val r = graft.Ranks.globalPrefixSums(df, Seq("a", "b"),
        Seq(col("id").asc), Seq("ca", "cb"))
      r._1.cache().count()
      r
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
    val w = Window.orderBy(col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df
      .withColumn("wa", sum(col("a")).over(w))
      .withColumn("wb", sum(col("b")).over(w))
    val mism = got.join(want, Seq("id"))
      .filter(col("ca") =!= col("wa") || col("cb") =!= col("wb")).count()
    assert(mism === 0, "both prefix sums must match across boundaries")
    val wantTotals = df.agg(sum("a"), sum("b")).head()
    assert(totals == Seq(wantTotals.getLong(0), wantTotals.getLong(1)),
      s"grand totals must fall out of the subtotal pass: $totals")
    assert(got.rdd.getNumPartitions > 1)
    got.unpersist()
  }
}
