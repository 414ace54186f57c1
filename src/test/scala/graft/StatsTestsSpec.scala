package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The two-sample rank tests vs their scalar textbook definitions on a
  * hand-built fixture — independent of the DuckDB oracle, which replays
  * the same distributed recipe; this pins the recipe TO the definition.
  *
  * Fixture: click values [1, 2, 2, 3], purchase values [2, 4].
  *  - Ranks over the pooled sample: 1→1; the three 2s tie at avg rank 3;
  *    3→5; 4→6. R_click = 1+3+3+5 = 12, U = 12 − 4·5/2 = 2 (cross-check:
  *    pair count = 1·(a=3>b=2) + 2·½·(a=2 ties b=2) = 2).
  *  - Tie correction: the one tie group of size 3 gives Σ(t³−t) = 24.
  *  - KS: ECDF gap peaks after value 3 at |1 − ½| = 0.5.
  */
class StatsTestsSpec extends SparkSuite {

  private lazy val fixtureDir: String = {
    val dir = Files.createTempDirectory("graft_stats_fixture").toString
    val rows = Seq(
      (1L, "click", 1.0), (2L, "click", 2.0), (3L, "click", 2.0),
      (4L, "click", 3.0), (5L, "purchase", 2.0), (6L, "purchase", 4.0),
      // further event types: the two-sample isin filters must exclude
      // them; the 5-group ANOVA needs every group non-empty
      (7L, "view", 100.0), (8L, "error", 5.0), (9L, "signup", 7.0))
    import spark.implicits._
    rows.toDF("event_id", "event_type", "value")
      .withColumn("ts", lit("2024-01-01 00:00:00").cast("timestamp"))
      .withColumn("user_id", col("event_id"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("Mann-Whitney U and tie-corrected z match the scalar definition") {
    val row = graft.queries.StatsTestsPack
      .queries("stats_mannwhitney")(spark, fixtureDir).head()
    assert(row.getLong(row.fieldIndex("n_a")) === 4L)
    assert(row.getLong(row.fieldIndex("n_b")) === 2L)
    assert(row.getDouble(row.fieldIndex("u_stat")) === 2.0)
    // scalar z from the same closed form the test defines: mean nA·nB/2,
    // variance nA·nB/12 · (n+1 − Σ(t³−t)/(n(n−1)))
    val (na, nb, n, tieSum) = (4.0, 2.0, 6.0, 24.0)
    val z = (2.0 - na * nb / 2.0) /
      math.sqrt(na * nb / 12.0 * (n + 1 - tieSum / (n * (n - 1))))
    val zR6 = math.floor(z * 1e6 + 0.5) / 1e6
    assert(row.getDouble(row.fieldIndex("z_score")) === zR6)
  }

  test("KS D statistic is the exact maximum ECDF gap") {
    val row = graft.queries.StatsTestsPack
      .queries("stats_ks_test")(spark, fixtureDir).head()
    assert(row.getLong(row.fieldIndex("n_a")) === 4L)
    assert(row.getLong(row.fieldIndex("n_b")) === 2L)
    assert(row.getDouble(row.fieldIndex("ks_d")) === 0.5)
  }

  private def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("Welch t and Welch-Satterthwaite df match the scalar definition") {
    val row = graft.queries.StatsTestsPack
      .queries("stats_welch_t")(spark, fixtureDir).head()
    assert(row.getLong(row.fieldIndex("n_a")) === 4L)
    assert(row.getLong(row.fieldIndex("n_b")) === 2L)
    assert(row.getDouble(row.fieldIndex("mean_a")) === 2.0)
    assert(row.getDouble(row.fieldIndex("mean_b")) === 3.0)
    // scalar Welch from per-group cents moments: click [100,200,200,300],
    // purchase [200,400]
    val (na, nb) = (4.0, 2.0)
    val va = (100.0 * 100 + 100 * 100) / (na - 1) // Σ(c-200)²/3
    val vb = (100.0 * 100 + 100 * 100) / (nb - 1)
    val (sea, seb) = (va / na, vb / nb)
    val t = (200.0 - 300.0) / math.sqrt(sea + seb)
    val df = (sea + seb) * (sea + seb) /
      (sea * sea / (na - 1) + seb * seb / (nb - 1))
    assert(row.getDouble(row.fieldIndex("t_stat")) === r6(t))
    assert(row.getDouble(row.fieldIndex("df")) === r6(df))
  }

  test("ml_auc: ROC AUC and tie-aware AP match the pair-counting definition") {
    val row = graft.queries.MlPack.queries("ml_auc")(spark, fixtureDir).head()
    assert(row.getLong(row.fieldIndex("n_pos")) === 2L)
    assert(row.getLong(row.fieldIndex("n_neg")) === 4L)
    // pos (purchase) [2,4] vs neg (click) [1,2,2,3]: of the 8 pairs,
    // pos=2 wins 1 + ties 2 (·½), pos=4 wins 4 → AUC = 6/8
    assert(row.getDouble(row.fieldIndex("roc_auc")) === 0.75)
    // thresholds DESC: score 4 → prec 1/1 over 1 positive; score 2 →
    // prec 2/5 over the other → AP = (1.0 + 0.4)/2 = 0.7, exact at e9
    assert(row.getDouble(row.fieldIndex("pr_auc")) === 0.7)
  }

  test("ml_lift_gains: deciles partition the ranking and lift matches counting") {
    val rows = graft.queries.MlPack.queries("ml_lift_gains")(spark, fixtureDir)
      .orderBy("decile").collect()
    // 6 scored rows → 6 occupied deciles of one row each; the top row is
    // the positive c=4.0 → lift there = (1·6)/(1·2) = 3×
    assert(rows.map(_.getLong(rows.head.fieldIndex("n_rows"))).sum === 6L)
    val first = rows.head
    assert(first.getLong(first.fieldIndex("decile")) === 1L)
    assert(first.getDouble(first.fieldIndex("lift")) === 3.0)
    val gains = rows.map(r => r.getDouble(r.fieldIndex("cum_gain")))
    assert(gains.zip(gains.tail).forall { case (a, b) => b >= a },
      "cumulative gain must be monotone")
    assert(gains.last === 1.0, "the full ranking captures every positive")
  }

  test("stats_bootstrap: deterministic Poisson replicates centered on the mean") {
    val q = graft.queries.StatsTestsPack.queries("stats_bootstrap")
    val rows = q(spark, sf).collect()
    assert(rows.length === 64)
    val again = q(spark, sf).collect()
    assert(rows.map(_.toSeq).toSet === again.map(_.toSeq).toSet,
      "hash-seeded resampling must be deterministic")
    val truth = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .agg(avg(col("value"))).head().getDouble(0)
    val means = rows.map(r => r.getDouble(r.fieldIndex("boot_mean")))
    assert(means.forall(m => m > truth * 0.5 && m < truth * 1.5))
    val grand = means.sum / means.length
    assert(math.abs(grand - truth) < 0.10 * truth,
      s"bootstrap grand mean $grand should straddle the sample mean $truth")
  }

  test("stats_spearman matches a driver-side tie-averaged rank correlation") {
    val row = graft.queries.StatsTestsPack
      .queries("stats_spearman")(spark, sf).head()
    val got = row.getDouble(row.fieldIndex("spearman_rho"))
    val pairs = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .select((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"),
        (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def avgRanks(vs: Array[Long]): Map[Long, Double] = {
      val sorted = vs.sorted
      vs.distinct.map { v =>
        val lo = sorted.indexWhere(_ == v) + 1
        val hi = sorted.lastIndexWhere(_ == v) + 1
        v -> (lo + hi) / 2.0
      }.toMap
    }
    val rx = avgRanks(pairs.map(_._1)); val ry = avgRanks(pairs.map(_._2))
    val xs = pairs.map(p => rx(p._1)); val ys = pairs.map(p => ry(p._2))
    val n = xs.length.toDouble
    val (mx, my) = (xs.sum / n, ys.sum / n)
    val cov = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum
    val (vx, vy) = (xs.map(a => (a - mx) * (a - mx)).sum,
      ys.map(b => (b - my) * (b - my)).sum)
    val want = cov / math.sqrt(vx) / math.sqrt(vy)
    assert(math.abs(got - want) <= 1e-6 + 1e-9, s"rho: $got vs $want")
    assert(row.getLong(row.fieldIndex("n")) === pairs.length.toLong)
  }

  test("stats_median_ci brackets the exact median with the right order stats") {
    val row = graft.queries.StatsTestsPack
      .queries("stats_median_ci")(spark, sf).head()
    val vals = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select((col("value").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(_.getLong(0)).sorted
    val n = vals.length
    assert(row.getLong(row.fieldIndex("n")) === n.toLong)
    val med = row.getDouble(row.fieldIndex("median"))
    val (lo, hi) = (row.getDouble(row.fieldIndex("ci_lo")),
      row.getDouble(row.fieldIndex("ci_hi")))
    assert(med === vals((n + 1) / 2 - 1) / 100.0, "lower median order stat")
    val z = 1.959963984540054
    val kLo = math.max(1, math.floor((n - z * math.sqrt(n)) / 2).toInt)
    val kHi = math.min(n.toLong,
      math.ceil((n + z * math.sqrt(n)) / 2).toLong + 1).toInt
    assert(lo === vals(kLo - 1) / 100.0 && hi === vals(kHi - 1) / 100.0)
    assert(lo <= med && med <= hi)
  }

  test("stats_benford: shares sum to one and chi2 reconciles with the counts") {
    val rows = graft.queries.StatsTestsPack
      .queries("stats_benford")(spark, sf).collect()
    val nTotal = rows.head.getLong(rows.head.fieldIndex("n_total"))
    assert(rows.map(r => r.getLong(r.fieldIndex("n_obs"))).sum === nTotal)
    rows.foreach { r =>
      val d = r.getInt(r.fieldIndex("digit"))
      assert(d >= 1 && d <= 9)
      assert(math.abs(r.getDouble(r.fieldIndex("benford_share")) -
        math.log10(1.0 + 1.0 / d)) < 1e-15)
    }
    // chi2 reconciles with a driver-side recompute over the 9 counts
    val counts = rows.map(r => r.getInt(r.fieldIndex("digit")) ->
      r.getLong(r.fieldIndex("n_obs"))).toMap
    val want = (1 to 9).map { d =>
      val e = nTotal * math.log10(1.0 + 1.0 / d)
      val o = counts.getOrElse(d, 0L).toDouble
      (o - e) * (o - e) / e
    }.sum
    val got = rows.head.getDouble(rows.head.fieldIndex("chi2"))
    assert(math.abs(got - want) <= 1e-5 * math.max(1.0, want),
      s"chi2: $got vs $want")
  }

  test("one-way ANOVA F matches the scalar sums-of-squares definition") {
    val row = graft.queries.StatsTestsPack
      .queries("stats_anova_f")(spark, fixtureDir).head()
    assert(row.getLong(row.fieldIndex("n_total")) === 9L)
    assert(row.getInt(row.fieldIndex("k_groups")) === 5)
    // scalar SSB/SSW over the five cents groups
    val groups = Seq(
      Seq(100.0, 200.0, 200.0, 300.0), Seq(500.0), Seq(200.0, 400.0),
      Seq(700.0), Seq(10000.0))
    val all = groups.flatten
    val grand = all.sum / all.size
    val ssb = groups.map(g => g.size * math.pow(g.map(_ / g.size).sum - grand, 2)).sum
    val ssw = groups.map(g => {
      val m = g.sum / g.size; g.map(v => (v - m) * (v - m)).sum
    }).sum
    val f = (ssb / 4.0) / (ssw / (all.size - 5.0))
    val eta = ssb / (ssb + ssw)
    val gotF = row.getDouble(row.fieldIndex("f_stat"))
    val gotEta = row.getDouble(row.fieldIndex("eta_sq"))
    // the query emits r6-quantized values and the scalar path sums in a
    // different order: allow the 1e-6 rounding half-step plus FP slack
    assert(math.abs(gotF - f) <= 5.1e-7 + 1e-9 * math.abs(f),
      s"F: got $gotF want ~$f")
    assert(math.abs(gotEta - eta) <= 5.1e-7,
      s"eta²: got $gotEta want ~$eta")
  }
}
