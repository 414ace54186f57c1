package graft

import org.apache.spark.sql.functions._

/** Invariants for the r6 ML-boundary additions (driver hash-parity is the
  * Verify gate; these pin the semantics the hashes can't explain). */
class MlSpec extends SparkSuite {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("ml_backtest: 5 folds, growing train spans, RMSE ≥ MAE per forecaster") {
    val rows = q("ml_backtest").orderBy("fold").collect()
    assert(rows.length === 5)
    val nTrain = rows.map(_.getAs[Long]("n_train"))
    assert(nTrain.sliding(2).forall(p => p(0) < p(1)), "rolling origin must grow")
    val nTest = rows.map(_.getAs[Long]("n_test")).distinct
    assert(nTest.length === 1, "every fold tests the same span (n // 6)")
    for (r <- rows) {
      assert(r.getAs[Double]("naive_rmse_cents") >= r.getAs[Double]("naive_mae_cents") - 1e-9)
      assert(r.getAs[Double]("trend_rmse_cents") >= r.getAs[Double]("trend_mae_cents") - 1e-9)
    }
  }

  test("ml_backtest folds reuse ml_cv_splits geometry exactly") {
    val cv = q("ml_cv_splits").collect()
      .map(r => (r.getAs[Long]("fold"), r.getAs[String]("split")) -> r.getAs[Long]("n_rows"))
      .toMap
    val bt = q("ml_backtest").collect()
    for (r <- bt) {
      val f = r.getAs[Long]("fold")
      assert(r.getAs[Long]("n_train") === cv((f, "train")), s"fold $f train size")
      assert(r.getAs[Long]("n_test") === cv((f, "test")), s"fold $f test size")
    }
  }

  test("ml_grid_search: full grid per fold, ranks are a permutation, one winner") {
    val rows = q("ml_grid_search").collect()
    val byFold = rows.groupBy(_.getAs[Long]("fold"))
    assert(byFold.size === 5)
    for ((f, rs) <- byFold) {
      assert(rs.length === 6, s"fold $f must score the whole grid")
      assert(rs.map(_.getAs[Int]("rank_in_fold")).sorted.toSeq === (1 to 6),
        s"fold $f ranks must be a permutation")
      assert(rs.count(_.getAs[Boolean]("is_best")) === 1, s"fold $f winners")
      // rank order must agree with the scores it claims to rank
      val byRank = rs.sortBy(_.getAs[Int]("rank_in_fold"))
        .map(_.getAs[Double]("rmse_cents"))
      assert(byRank.sliding(2).forall(p => p(0) <= p(1)), s"fold $f rank/score order")
    }
  }

  test("ml_halving_search: culling chain, doubling resource, real survivors") {
    val rows = q("ml_halving_search").collect()
    val byRound = rows.groupBy(_.getAs[Int]("round"))
    assert(byRound.keySet === Set(0, 1, 2))
    // candidate counts halve: 6 → 3 → 2; resource doubles each round
    assert(byRound(0).length === 6 && byRound(1).length === 3 &&
      byRound(2).length === 2)
    val res = (0 to 2).map(i => byRound(i).head.getAs[Long]("n_train"))
    assert(res(1) >= 2 * res(0) - 2 && res(2) >= 2 * res(1) - 2,
      s"train prefix must ~double per round, got $res")
    for ((i, rs) <- byRound) {
      assert(rs.map(_.getAs[Int]("rank_in_round")).sorted.toSeq ===
        (1 to rs.length), s"round $i ranks are a permutation")
      val byRank = rs.sortBy(_.getAs[Int]("rank_in_round"))
        .map(_.getAs[Double]("rmse_cents"))
      assert(byRank.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
        s"round $i rank/score order")
    }
    // round i+1's candidate set IS round i's survivor set — culling is real
    for (i <- 0 to 1) {
      val surv = byRound(i).filter(_.getAs[Boolean]("survives"))
        .map(_.getAs[Long]("alpha_ppm")).toSet
      val next = byRound(i + 1).map(_.getAs[Long]("alpha_ppm")).toSet
      assert(surv === next, s"round ${i + 1} must evaluate exactly round $i's survivors")
    }
    assert(byRound(2).count(_.getAs[Boolean]("survives")) === 1, "one winner")
  }

  test("ml_onehot: indicators are a partition of unity and match seg_idx") {
    val df = q("ml_onehot")
    val ohCols = df.columns.filter(_.startsWith("oh_")).sorted
    assert(ohCols.length >= 2, "at least two fitted categories")
    val rowSum = ohCols.map(col).reduce(_ + _)
    assert(df.filter(rowSum =!= 1).count() === 0, "exactly one hot per row")
    // the hot column's position in the sorted vocabulary IS seg_idx
    val mismatch = ohCols.zipWithIndex.foldLeft(df.withColumn("want", lit(-1))) {
      case (d, (c, i)) => d.withColumn("want", when(col(c) === 1, lit(i)).otherwise(col("want")))
    }.filter(col("want") =!= col("seg_idx"))
    assert(mismatch.count() === 0, "seg_idx must be the sorted-vocab position")
  }

  test("ml_kmeans_step: every point assigned once, seeds stay home, exact pooling") {
    val df = q("ml_kmeans_step").cache()
    try {
      val emb = Tables.embeddings(spark, sf)
      val nVecs = emb.count()
      val dim = emb.select(size(col("embedding"))).head().getInt(0)
      val clusters = df.select("cluster_id").distinct()
        .collect().map(_.getLong(0)).sorted
      assert(clusters.forall(c => c >= 0 && c < 8), "cluster ids are seed ids")
      // each point lands in exactly one cluster: per-pos counts sum to n
      val perPos = df.groupBy("pos").agg(sum("n").as("tot"))
        .select("tot").distinct().collect().map(_.getLong(0))
      assert(perPos.toSeq === Seq(nVecs), "every vector assigned exactly once")
      assert(df.count() === clusters.length.toLong * dim,
        "one row per (cluster, dim)")
      // a seed's best cosine match is itself (cos=1): seed 0..7 each
      // anchor a non-empty cluster
      assert(clusters.length === 8, "all 8 seed clusters non-empty")
      // centroid is exactly sum_e6 / (n * 1e6)
      val bad = df.filter(
        col("centroid") =!= col("sum_e6").cast("double") /
          (col("n").cast("double") * 1000000.0)).count()
      assert(bad === 0, "fixed-point centroid arithmetic")
    } finally df.unpersist()
  }

  test("ml_logreg_newton: one Newton step from 0 matches the closed form and points downhill") {
    val row = SparkEntry.queries("ml_logreg_newton")(spark, sf).collect().head
    val n = row.getAs[Long]("n")
    val meanY = row.getAs[Double]("mean_y")
    val beta0 = row.getAs[Double]("beta0")
    assert(n > 0 && meanY > 0.0 && meanY < 1.0)
    // independent driver-side replay of the closed form in doubles
    val rows = graft.Tables.orders(spark, sf)
      .select(org.apache.spark.sql.functions.col("o_orderpriority"),
        org.apache.spark.sql.functions.col("o_totalprice"))
      .collect()
    val xs = rows.map(r => math.round(r.getDouble(1) * 100.0).toDouble)
    val ys = rows.map(r => if (r.getString(0) == "1-URGENT") 1.0 else 0.0)
    val nn = xs.length.toDouble
    val sx = xs.sum; val sy = ys.sum
    val sxx = xs.map(x => x * x).sum
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val det = nn * sxx - sx * sx
    val b0 = (sxx * (2 * sy - nn) - sx * (2 * sxy - sx)) * 2 / det
    assert(math.abs(beta0 - b0) < 1e-4, s"beta0 $beta0 vs replay $b0")
    // with mean_y < 0.5 the intercept step must be negative (toward the
    // minority-class log-odds), and one Newton step from 0 with a
    // near-uninformative feature lands between 0 and the full logit
    assert(beta0 < 0.0 && beta0 > math.log(meanY / (1 - meanY)) * 2)
  }

  test("ml_power_iter: unit norm, and matches a driver-side float matvec replay") {
    val rows = SparkEntry.queries("ml_power_iter")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    val v1 = rows.map(_._2)
    assert(math.abs(v1.map(x => x * x).sum - 1.0) < 1e-4, "normalized output")
    assert(rows.map(_._3).distinct.length == 1, "one Rayleigh value")
    // independent double-precision replay of w = Xᵀ(X·1)
    val embs = graft.Tables.embeddings(spark, sf)
      .select(org.apache.spark.sql.functions.col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val w = new Array[Double](embs.head.length)
    embs.foreach { e =>
      val s = e.sum
      var d = 0
      while (d < e.length) { w(d) += s * e(d); d += 1 }
    }
    val norm = math.sqrt(w.map(x => x * x).sum)
    v1.indices.foreach { d =>
      assert(math.abs(v1(d) - w(d) / norm) < 1e-3,
        s"dim $d: ${v1(d)} vs ${w(d) / norm}")
    }
  }

  test("ml_random_search: seeded draw is a proper deterministic subset of the space") {
    val space = graft.queries.MlPack.RandomSpacePpm
    val drawn = graft.queries.MlPack.RandomSampledPpm
    // subset law: every drawn candidate comes from the declared space,
    // without replacement, and the draw is a strict subsample
    assert(drawn.size == 8 && drawn.distinct.size == 8, drawn)
    assert(drawn.forall(space.contains), s"draw outside the space: $drawn")
    assert(drawn.size < space.size)
    // determinism law: re-deriving the LCG draw gives the same set (a
    // re-run or the oracle builder can never see a different candidate
    // list)
    val again = space.zipWithIndex
      .map { case (a, i) => ((1103515245L * (i + 42) + 12345L) % 2147483648L, i, a) }
      .sortBy(k => (k._1, k._2)).take(8).map(_._3).sorted
    assert(drawn == again, "LCG draw must be reproducible")
    // the result frame carries exactly fold × drawn-candidate rows with
    // one winner per fold
    val r = graft.queries.MlPack.queries("ml_random_search")(spark, sf)
      .cache()
    assert(r.count() == 5L * drawn.size)
    val best = r.filter(org.apache.spark.sql.functions.col("is_best")).collect()
    assert(best.length == 5, "exactly one winner per fold")
    r.unpersist()
  }
}
