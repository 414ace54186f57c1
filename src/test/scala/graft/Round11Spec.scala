package graft

import org.apache.spark.sql.functions._

/** Invariants for the r11 adds beyond the DuckDB hash-match: calendar
  * densification completeness, Theil–Sen median laws, winsorization fence
  * laws, and personalized-PageRank mass/reachability laws. Runs on
  * sf0.001. */
class Round11Spec extends SparkSuite {

  test("tj5 densify: complete per-user calendar, counts preserved, ffill total") {
    val r = graft.queries.TemporalPack.queries("tj5_calendar_densify")(spark, sf)
      .cache()
    // every user's grid is exactly its [min, max] span with no holes and
    // no duplicates
    val span = r.groupBy("user_id")
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"),
        count(lit(1)).as("n"), countDistinct(col("day")).as("nd"))
    assert(span.filter(col("n") =!= col("nd")).count() == 0, "dup days")
    assert(span.filter(col("n") =!= datediff(col("d1"), col("d0")) + 1)
      .count() == 0, "calendar holes")
    // event counts are preserved exactly; imputed rows carry none
    val nEvents = Tables.events(spark, sf).count()
    assert(r.agg(sum(col("n_events"))).head().getLong(0) == nEvents)
    assert(r.filter(col("is_imputed") === 1 && col("n_events") =!= 0)
      .count() == 0)
    // after a user's first observed day, the close is never null
    assert(r.filter(col("close_cents").isNull).count() == 0,
      "grid starts at each user's first day, so ffill leaves no nulls")
    r.unpersist()
  }

  test("theil_sen: the reported slope IS the median of local pairwise slopes") {
    val got = graft.queries.StatsTestsPack.queries("stats_theil_sen")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // independent local replay for every type
    val daily = Tables.events(spark, sf)
      .select(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("d"),
        graft.Num.cents(col("value")).as("c"))
      .groupBy("event_type", "d")
      .agg((sum(col("c")).cast("double") / count(lit(1)).cast("double")).as("m"))
      .collect().groupBy(_.getString(0))
    daily.foreach { case (et, rows) =>
      val cells = rows.map(r => (r.getLong(1), r.getDouble(2))).sortBy(_._1)
      val slopes = (for {
        i <- cells.indices; j <- (i + 1) until cells.size
      } yield (cells(j)._2 - cells(i)._2) / (cells(j)._1 - cells(i)._1).toDouble)
        .sorted
      val n = slopes.size
      val want =
        if (n % 2 == 1) slopes(n / 2)
        else (slopes(n / 2 - 1) + slopes(n / 2)) / 2
      assert(math.abs(got(et) - want) < 1e-6, s"$et: ${got(et)} vs $want")
    }
  }

  test("c19 winsorize: values never escape the fences, clip fractions bounded") {
    val r = graft.queries.CurationPack.queries("c19_winsorize")(spark, sf)
      .cache()
    val fences = Tables.events(spark, sf).groupBy("event_type")
      .agg(graft.Num.r6(expr("percentile(value, 0.05)")).as("lo"),
        graft.Num.r6(expr("percentile(value, 0.95)")).as("hi"))
    val joined = r.join(fences, "event_type")
    assert(joined.filter(col("v_winsorized") < col("lo") - 1e-6 ||
      col("v_winsorized") > col("hi") + 1e-6).count() == 0, "fence escape")
    // each tail clips ~5% (interpolated percentile: never more than
    // ceil(5%) + 1 of a type's rows)
    val frac = r.groupBy("event_type").agg(
      (sum(col("clipped_low")) * 100 / count(lit(1))).as("pl"),
      (sum(col("clipped_high")) * 100 / count(lit(1))).as("ph"))
    assert(frac.filter(col("pl") > 6 || col("ph") > 6).count() == 0)
    // clipped rows are exactly the rows sitting AT a fence now
    assert(joined.filter(col("clipped_low") === 1 &&
      col("v_winsorized") =!= col("lo")).count() == 0)
    assert(joined.filter(col("clipped_high") === 1 &&
      col("v_winsorized") =!= col("hi")).count() == 0)
    r.unpersist()
  }

  test("ccf: bounded in [-1, 1] and lag 0 matches a local Pearson replay") {
    val r = graft.queries.StatsTestsPack.queries("stats_ccf")(spark, sf)
      .collect().map(row => row.getLong(0) -> (row.getLong(1), row.getDouble(2)))
      .toMap
    assert(r.keySet == (-5L to 5L).toSet)
    r.values.foreach { case (_, c) => assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9) }
    // local replay at lag 0 from the raw daily totals
    val daily = Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "view"))
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(graft.Num.cents(col("value"))).as("sv"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (t, rows) =>
        t -> rows.map(x => x.getDate(1).toString -> x.getLong(2)).toMap
      }
    val shared = (daily("click").keySet & daily("view").keySet).toSeq
    val xs = shared.map(d => daily("click")(d).toDouble)
    val ys = shared.map(d => daily("view")(d).toDouble)
    val n = shared.size.toDouble
    val want = (n * xs.zip(ys).map(p => p._1 * p._2).sum - xs.sum * ys.sum) /
      (math.sqrt(n * xs.map(v => v * v).sum - xs.sum * xs.sum) *
        math.sqrt(n * ys.map(v => v * v).sum - ys.sum * ys.sum))
    assert(r(0L)._1 == shared.size.toLong, "lag-0 day match count")
    assert(math.abs(r(0L)._2 - want) < 1e-6, s"${r(0L)._2} vs $want")
  }

  test("indicators: %K/%D bounded, bollinger band laws, tau-b in [-1, 1]") {
    val so = graft.queries.WindowPack.queries("w22_stochastic")(spark, sf).cache()
    assert(so.filter(col("pct_k") < 0 || col("pct_k") > 100).count() == 0)
    assert(so.filter(col("pct_d") < 0 || col("pct_d") > 100).count() == 0)
    so.unpersist()
    val bb = graft.queries.WindowPack.queries("w21_bollinger")(spark, sf).cache()
    // sd is a sample stddev: strictly positive wherever emitted; a %B of
    // 0.5 means the price sits ON the mid — values can escape [0,1]
    // (price outside the band) but only by a bounded amount on a
    // 2-decimal fixture
    assert(bb.filter(col("sd_cents") <= 0).count() == 0)
    assert(bb.filter(col("pct_b").isNotNull).count() > 0)
    // mid is the frame mean: always within the frame's [min, max], so
    // |%B - 0.5| = |c - mid| / (4sd) ≤ (max-min)/(4sd); spot the global
    // sanity bound instead: %B stays within [-5, 6] on this fixture
    assert(bb.filter(col("pct_b") < -5 || col("pct_b") > 6).count() == 0)
    bb.unpersist()
    val kt = graft.queries.StatsTestsPack.queries("stats_kendall_tau")(spark, sf)
      .head()
    val (np, c, d) = (kt.getLong(0), kt.getLong(1), kt.getLong(2))
    assert(c + d <= np, "concordant + discordant cannot exceed the pairs")
    val tau = kt.getDouble(5)
    assert(tau >= -1.0 - 1e-9 && tau <= 1.0 + 1e-9, s"tau_b=$tau")
  }

  test("g8 ppr: nonnegative, mass bounded by the unit, seeds carry the restart") {
    val r = graft.queries.GraphPack.queries("g8_personalized_pagerank")(spark, sf)
      .cache()
    assert(r.filter(col("pr") < 0).count() == 0)
    // truncating integer division only LOSES mass, never creates it
    val total = r.agg(sum(col("pr"))).head().getLong(0)
    assert(total <= 1000000000000L, s"mass created: $total")
    assert(total > 500000000000L, s"too much truncation loss: $total")
    // every in-graph seed holds at least the restart mass
    val seeds = Tables.supplier(spark, sf)
      .filter(col("s_suppkey") % 10 === 0)
      .select(col("s_suppkey").cast("long").as("node"))
    val inGraphSeeds = r.join(seeds, "node").cache()
    val nSeeds = inGraphSeeds.count()
    assert(nSeeds > 0)
    val restart = (1000000000000L * 15 / 100) / nSeeds
    assert(inGraphSeeds.filter(col("pr") < restart).count() == 0,
      "a seed's rank can never drop below its own restart share")
    inGraphSeeds.unpersist()
    r.unpersist()
  }
}
