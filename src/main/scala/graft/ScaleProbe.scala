package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling evidence harness: materializes a 10× replica of a fixture
  * directory (fact keys shifted per copy so join/window/dedup structure is
  * preserved; nation/region stay single-copy — dimension tables don't grow
  * with the fact data), then times a representative operator slice at both
  * scales and prints per-query ratios. A ~linear ratio (≈10× work on 10×
  * data, modulo fixed overheads) is the evidence that the plan shapes hold
  * as data grows; anything super-linear is a red flag the probe surfaces.
  *
  * Not part of the driver contract — a design-validation tool
  * (`runMain graft.ScaleProbe [baseDir] [outDir] [copies]`).
  */
object ScaleProbe {

  private val ProbeQueries = Seq(
    "a1_groupby_agg", "j1_normalized_key_join", "j7_inner_join_agg",
    "w3_rolling_mean", "w14_time_rolling", "tj1_asof_join",
    "flagship_refined", "d1_exact_dedup", "d2_minhash_lsh",
    "o1_sort_topn", "sc4_global_rank", "sc5_topk_exec",
    "t2_quality_score", "x5_grouping_sets", "u4_except",
    // dedup/ANN family: their ground-truth checkers are memoized per data
    // fingerprint (graft.Fingerprint), so the min-of-two timing below
    // measures the bucketed operator, not the one-time n² verification scan
    "d3_simhash", "n3_ann_lsh", "n4_ann_ivf", "n5_ann_pq")

  private def shifted(df: DataFrame, cols: Map[String, Long], i: Int): DataFrame =
    cols.foldLeft(df) { case (d, (c, step)) =>
      d.withColumn(c, col(c) + lit(step * i))
    }

  def build(spark: SparkSession, base: String, out: String, copies: Int): Unit = {
    val plans: Seq[(String, Map[String, Long])] = Seq(
      "lineitem" -> Map("l_orderkey" -> 1000000000L, "l_partkey" -> 1000000000L,
        "l_suppkey" -> 1000000000L),
      "orders" -> Map("o_orderkey" -> 1000000000L, "o_custkey" -> 1000000000L),
      "customer" -> Map("c_custkey" -> 1000000000L),
      "supplier" -> Map("s_suppkey" -> 1000000000L),
      "part" -> Map("p_partkey" -> 1000000000L),
      "nation" -> Map.empty[String, Long], // dims: single copy
      "region" -> Map.empty[String, Long],
      // user_id must shift in lockstep with c_custkey: the flagship joins
      // events.user_id to customer.c_custkey, and base user ids are a
      // subset of base custkeys — a different step would orphan 90% of
      // events from their dimension rows in the replica.
      "events" -> Map("event_id" -> 1000000000L, "user_id" -> 1000000000L),
      "documents" -> Map("doc_id" -> 100000000L),
      "embeddings" -> Map("vec_id" -> 100000000L))
    // events.parquet carries TIMESTAMP(NANOS): read raw
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    plans.foreach { case (name, shifts) =>
      val target = s"$out/$name.parquet"
      val src = spark.read.parquet(s"$base/$name.parquet")
      val n = if (shifts.isEmpty) 1 else copies
      val expected = src.count() * n
      // row-count validation (not bare existence): a replica left by a
      // killed run or a different `copies` value must not be measured
      val valid = java.nio.file.Files.exists(java.nio.file.Paths.get(target)) &&
        (try spark.read.parquet(target).count() == expected
         catch { case _: Throwable => false })
      if (!valid) {
        val rep = (0 until n).map(i => shifted(src, shifts, i))
          .reduce(_ unionByName _)
        rep.write.mode("overwrite").parquet(target)
      }
    }
  }

  private def time(spark: SparkSession, name: String, dir: String): Double = {
    val t0 = System.nanoTime()
    // toRdd materializes every column of the query's own plan; a count()
    // on top would let Catalyst prune the projections/windows being
    // measured down to a parquet-footer row count
    SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    build(spark, base, out, copies)

    // warm both directions once (codegen + file index + the memoized
    // verification ground truths), then measure. Each (query, dir) runs
    // twice and keeps the min: the first execution pays whole-stage-codegen
    // compilation, which would otherwise be attributed to whichever scale
    // ran first.
    time(spark, "a1_groupby_agg", base); time(spark, "a1_groupby_agg", out)
    SparkEntry.warm(spark, base); SparkEntry.warm(spark, out)

    val rows = ProbeQueries.map { q =>
      val tBig = math.min(time(spark, q, out), time(spark, q, out))
      val tBase = math.min(time(spark, q, base), time(spark, q, base))
      val ratio = tBig / tBase
      println(f"""{"query":"$q","base_s":$tBase%.2f,"x${copies}_s":$tBig%.2f,"ratio":$ratio%.1f}""")
      (q, tBase, tBig, ratio)
    }
    val tb = rows.map(_._2).sum
    val tB = rows.map(_._3).sum
    println(f"""{"probe":"total","base_s":$tb%.2f,"x${copies}_s":$tB%.2f,"ratio":${tB / tb}%.1f}""")
    spark.stop()
  }
}
