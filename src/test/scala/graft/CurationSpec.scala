package graft

import org.apache.spark.sql.functions._

/** CurationPack invariants beyond the DuckDB hash-match: split stability,
  * redaction completeness, statistic bounds, ntile partition sizes, CUSUM
  * sign. Runs on sf0.001. */
class CurationSpec extends SparkSuite {

  private val q = graft.queries.CurationPack.queries

  test("c1 hash split is deterministic, total, and roughly 80/10/10") {
    val a = q("c1_hash_split")(spark, sf).cache()
    val b = q("c1_hash_split")(spark, sf)
    assert(a.except(b).count() == 0 && b.except(a).count() == 0,
      "split assignment must be identical across invocations")
    val n = a.count()
    val bySplit = a.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(bySplit.values.sum == n, "every doc gets exactly one split")
    val trainFrac = bySplit("train").toDouble / n
    assert(trainFrac > 0.70 && trainFrac < 0.90,
      s"md5 buckets should put ~80% in train, got $trainFrac")
    a.unpersist()
  }

  test("c2 redaction leaves no matchable PII behind and counts each class") {
    val r = q("c2_pii_redact")(spark, sf).cache()
    assert(r.filter(col("redacted").rlike("[a-zA-Z0-9._]+@[a-zA-Z0-9.-]+"))
      .count() == 0, "no email survives redaction")
    assert(r.filter(col("redacted").rlike("[+]1-555-[0-9]{4}")).count() == 0)
    assert(r.filter(col("n_emails") =!= 1 || col("n_phones") =!= 1 ||
      col("n_ips") =!= 1).count() == 0,
      "each synthesized contact line carries exactly one of each PII class")
    r.unpersist()
  }

  test("c3 KS statistic is within (0,1] bounds and consistent with counts") {
    val row = q("c3_ks_drift")(spark, sf).collect().head
    val (n1, n2, dNum) = (row.getLong(0), row.getLong(1), row.getLong(2))
    val d = row.getDouble(3)
    assert(n1 > 0 && n2 > 0)
    assert(dNum >= 0 && dNum <= n1 * n2, "numerator bounded by n1*n2")
    assert(d >= 0.0 && d <= 1.0)
    assert(math.abs(d - dNum.toDouble / (n1 * n2)) < 1e-6,
      "reported statistic matches its exact rational")
  }

  test("c4 chi-square is non-negative with the expected cell count") {
    val row = q("c4_chi_square")(spark, sf).collect().head
    assert(row.getLong(0) <= 25, "at most 5 segments x 5 nation groups")
    assert(row.getLong(2) >= 0L, "chi2 is a sum of squares")
  }

  test("c5 decile sizes differ by at most one and bounds are ordered") {
    val bins = q("c5_quantile_bins")(spark, sf).collect()
    assert(bins.length == 10)
    val sizes = bins.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1, "ntile balance property")
    val ordered = bins.sortBy(_.getInt(0))
    ordered.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getDouble(3) <= hi.getDouble(2) + 1e-9,
        "bin price ranges are non-overlapping and ascending")
    }
  }

  test("c7 median/MAD are exact lower-medians and outliers obey the rule") {
    val r = q("c7_mad_outliers")(spark, sf).cache()
    assert(r.filter(col("mad_cents") < 0 || col("median_cents") < 0).count() == 0)
    assert(r.filter(col("n_outliers") > col("n_events")).count() == 0)
    // cross-check one series against a driver-side sort
    val row = r.orderBy(col("user_id")).collect().head
    val uid = row.getLong(0)
    val vals = graft.Tables.events(spark, sf)
      .filter(col("user_id") === uid)
      .select((col("value").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(_.getLong(0)).sorted
    val med = vals((vals.length + 1) / 2 - 1)
    assert(row.getLong(2) == med, s"lower median mismatch for user $uid")
    val devs = vals.map(v => math.abs(v - med)).sorted
    assert(row.getLong(3) == devs((devs.length + 1) / 2 - 1))
    r.unpersist()
  }

  test("c8 kappa is a valid agreement coefficient in [-1, 1]") {
    val row = q("c8_label_kappa")(spark, sf).collect().head
    val (n, agree) = (row.getLong(0), row.getLong(1))
    val kappa = row.getDouble(4)
    assert(agree <= n)
    assert(kappa >= -1.0 && kappa <= 1.0)
    assert(row.getLong(3) > 0, "denominator n^2 - pe_num must be positive")
  }

  test("c9 mixture keep-rates track the per-source target weights") {
    val kept = q("c9_source_mix")(spark, sf)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = graft.Tables.documents(spark, sf)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (src, n) =>
      val w = (src.drop(3).toInt % 4 + 1) * 64.0 / 256.0
      val got = kept.getOrElse(src, 0L).toDouble / n
      // md5 buckets over small per-source doc counts: allow generous slack
      assert(math.abs(got - w) < 0.35,
        s"$src keep-rate $got should be near weight $w")
    }
    // weight-1.0 sources keep everything (bucket < 256 always)
    totals.keys.filter(s => s.drop(3).toInt % 4 == 3).foreach { src =>
      assert(kept.getOrElse(src, 0L) == totals(src), s"$src must keep all docs")
    }
  }

  test("t10 vocabulary ids are contiguous and ordered by (freq desc, token)") {
    val v = graft.queries.TextPack.queries("t10_vocab_build")(spark, sf)
      .orderBy(col("token_id")).collect()
    assert(v.nonEmpty)
    v.zipWithIndex.foreach { case (r, i) =>
      assert(r.getInt(2) == i, "ids must be 0..n-1 in rank order")
    }
    v.sliding(2).foreach { case Array(a, b) =>
      val ok = a.getLong(1) > b.getLong(1) ||
        (a.getLong(1) == b.getLong(1) && a.getString(0) < b.getString(0))
      assert(ok, "rank order is (freq desc, token asc)")
    }
  }

  test("t11 padding waste is a valid 1e-6 fraction and zero for tight buckets") {
    val b = graft.queries.TextPack.queries("t11_length_buckets")(spark, sf).collect()
    b.foreach { r =>
      val waste = r.getLong(4)
      assert(waste >= 0 && waste < 1000000, s"waste_e6 $waste out of range")
      if (r.getLong(1) == 1) assert(waste == 0, "singleton bucket pads nothing")
    }
  }

  test("c10 pipeline survivors reconcile with its component stages") {
    val out = q("c10_curation_pipeline")(spark, sf).cache()
    val survivors = out.agg(sum(col("n_docs"))).collect().head.getLong(0)
    val gated = graft.Tables.documents(spark, sf)
      .withColumn("n_tokens", size(split(trim(col("text")), "\\s+")))
      .filter(col("n_tokens") >= 20 && col("n_tokens") <= 400)
    val distinctHashes = gated.select(md5(col("text"))).distinct().count()
    assert(survivors == distinctHashes,
      "one survivor per distinct content hash within the quality gate")
    val splits = out.select("split").distinct().collect().map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "val", "test")) && splits.contains("train"))
    out.unpersist()
  }

  test("c6 CUSUM scores are non-negative and zero only for flat series") {
    val r = q("c6_cusum")(spark, sf).cache()
    assert(r.filter(col("cusum_max_scaled") < 0).count() == 0,
      "cum - running_min >= 0 by construction")
    assert(r.filter(col("n_events") <= 0).count() == 0)
    r.unpersist()
  }

  test("c11 URL gate: blocked never kept, exactly one keeper per unblocked canon group") {
    val r = q("c11_url_canonicalize")(spark, sf).cache()
    assert(r.filter(col("blocked") && col("keep")).count() == 0,
      "blocklisted domains must never survive")
    val groups = r.filter(!col("blocked"))
      .groupBy("canon_url")
      .agg(sum(when(col("keep"), 1).otherwise(0)).as("n_keep"),
        min(col("doc_id")).as("min_id"),
        max(when(col("keep"), col("doc_id"))).as("kept_id"))
    assert(groups.filter(col("n_keep") =!= 1).count() == 0,
      "URL dedup keeps exactly one doc per canonical URL")
    assert(groups.filter(col("kept_id") =!= col("min_id")).count() == 0,
      "the keeper is the minimum doc_id (deterministic)")
    // canonicalization actually collapses something: at least one multi-doc group
    val multi = r.groupBy("canon_url").count().filter(col("count") > 1).count()
    assert(multi > 0, "fixture must exercise real URL collisions")
    r.unpersist()
  }

  test("c12 rebalance: exact thresholds, binomial keep counts, determinism") {
    val r = q("c12_source_rebalance")(spark, sf).cache()
    try {
      val n = r.count()
      val nSources = r.select("source").distinct().count()
      val stats = r.groupBy("source").agg(
          count(lit(1)).as("cnt"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("kept"),
          first("thr").as("thr"))
        .collect()
      for (row <- stats) {
        val (cnt, kept, thr) = (row.getAs[Long]("cnt"),
          row.getAs[Long]("kept"), row.getAs[Long]("thr"))
        // threshold reproduces the exact integer rule
        assert(thr === math.min(256L, 256L * n / (nSources * cnt)),
          s"${row.getString(0)}: thr")
        if (thr >= 256L) assert(kept === cnt, "under-target sources keep all")
        else {
          // kept ~ Binomial(cnt, thr/256): assert within 4 sigma
          val p = thr.toDouble / 256.0
          val sigma = math.sqrt(cnt * p * (1 - p))
          assert(math.abs(kept - cnt * p) <= 4 * sigma + 1,
            s"${row.getString(0)}: kept=$kept expect≈${cnt * p}")
        }
      }
      // membership is a pure function of doc_id — identical across runs
      val again = q("c12_source_rebalance")(spark, sf)
      assert(r.except(again).count() === 0 && again.except(r).count() === 0)
    } finally r.unpersist()
  }

  test("c16 per-type interpolated median/MAD match a driver-side sort") {
    val r = q("c16_mad_outliers")(spark, sf).cache()
    try {
      assert(r.filter(col("n_outliers") > col("n")).count() == 0)
      // cross-check EVERY type against the scalar definition: sort the
      // values, median = avg of 1-indexed positions (n+1) DIV 2 and
      // n DIV 2 + 1, MAD = same over |v - med|, outliers dev > 3·1.4826·MAD
      val types = r.collect().map(row => (row.getString(0), row)).toMap
      val byType = graft.Tables.events(spark, sf)
        .select(col("event_type"),
          (col("value").cast("decimal(18,2)") * 100).cast("long"))
        .collect().groupBy(_.getString(0))
        .view.mapValues(_.map(_.getLong(1)).sorted).toMap
      assert(types.keySet == byType.keySet)
      def med2(sorted: Array[Long]): Long = {
        val n = sorted.length
        sorted((n + 1) / 2 - 1) + sorted(n / 2) // doubled (sum of the two)
      }
      byType.foreach { case (t, vals) =>
        val row = types(t)
        val m2 = med2(vals) // median in doubled-cent space
        assert(row.getDouble(row.fieldIndex("median_value")) == m2 / 200.0,
          s"median mismatch for $t")
        val devs2 = vals.map(v => math.abs(2 * v - m2)).sorted
        // devs already doubled; med2 re-doubles — halve in DOUBLE, the
        // interpolated midpoint can land on .5 exactly as the query's
        val mad2 = med2(devs2) / 2.0
        assert(row.getDouble(row.fieldIndex("mad_value")) == mad2 / 200.0,
          s"MAD mismatch for $t")
        val nOut = devs2.count(_ > 3.0 * 1.4826 * mad2)
        assert(row.getLong(row.fieldIndex("n_outliers")) == nOut,
          s"outlier count mismatch for $t")
      }
    } finally r.unpersist()
  }
}
