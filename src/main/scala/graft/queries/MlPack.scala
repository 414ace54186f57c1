package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import graft.{Num, QueryPack, Tables}

/** ML-boundary operators (SURVEY §2.10): the parts of the reference's
  * sklearn pipelines that are relational at heart — target encoding
  * (category → mean of target, broadcast-joined back) and regression
  * metrics (MAE/RMSE/R²) as aggregate expressions. Model fitting itself is
  * MLlib territory (out of engine core, SURVEY §7.6).
  */
object MlPack extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Target encoder (train.py:153-200): per-category exact mean of the
    // target, joined back broadcast — no sklearn, one shuffle on the
    // category, O(|categories|) broadcast.
    "ml_target_encode" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val enc = c.groupBy(col("c_mktsegment").as("seg"))
        .agg(Num.decAvg(col("c_acctbal")).as("segment_target_mean"))
      c.join(broadcast(enc), col("c_mktsegment") === col("seg"), "left")
        .select("c_custkey", "c_mktsegment", "segment_target_mean")
    }),

    // Metrics (train.py:358-368): y = o_totalprice, ŷ = per-priority mean
    // (a deterministic baseline predictor); MAE/RMSE/R² via exact decimal
    // sums of the (rounded-to-decimal) errors so both engines agree.
    "ml_metrics" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val pred = o.groupBy(col("o_orderpriority").as("prio"))
        .agg(Num.decAvg(col("o_totalprice")).as("yhat"))
      val ybar = o.agg(Num.decAvg(col("o_totalprice")).as("ybar"))
      val e = o.join(broadcast(pred), col("o_orderpriority") === col("prio"))
        .crossJoin(broadcast(ybar))
        .withColumn("err", (col("o_totalprice") - col("yhat")).cast(DecimalType(24, 6)))
        .withColumn("dev", (col("o_totalprice") - col("ybar")).cast(DecimalType(24, 6)))
      // r6 on every metric: the exact decimal SUMS agree bit-for-bit, but
      // casting a ≥6-fractional-digit decimal to double is rounded
      // differently by the two engines in the last ulp (seen at sf0.001),
      // so the derived ratios need the rounding guard.
      e.agg(
        count(lit(1)).as("n"),
        Num.r6(sum(abs(col("err"))).cast(DoubleType) / count(lit(1))).as("mae"),
        Num.r6(sqrt((sum((col("err") * col("err")).cast(DecimalType(38, 10)))
          .cast(DoubleType) / count(lit(1))))).as("rmse"),
        Num.r6(lit(1.0) - sum((col("err") * col("err")).cast(DecimalType(38, 10))).cast(DoubleType)
          / sum((col("dev") * col("dev")).cast(DecimalType(38, 10))).cast(DoubleType))
          .as("r2"))
    }),

    // StandardScaler (train.py's preprocessing): z-score from EXACT decimal
    // moments — mean and stddev derive from associative decimal sums, so
    // the fitted parameters are identical at any partition count, and the
    // per-row transform is then bit-identical across engines.
    "ml_standard_scale" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val m = c.agg(
          count(lit(1)).as("n"),
          sum(col("c_acctbal").cast(DecimalType(18, 2))).cast(DoubleType).as("sx"),
          sum((col("c_acctbal").cast(DecimalType(18, 2)) *
               col("c_acctbal").cast(DecimalType(18, 2))).cast(DecimalType(28, 4)))
            .cast(DoubleType).as("sxx"))
        .select(col("n"), (col("sx") / col("n")).as("mean"),
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")) /
               (col("n") * (col("n") - lit(1)))).as("sd"))
      c.crossJoin(broadcast(m))
        .select(col("c_custkey"),
          ((col("c_acctbal") - col("mean")) / col("sd")).as("acctbal_z"))
    }),

    // Yeo-Johnson power transform with λ FITTED by MLE (train.py:180's
    // PowerTransformer fits λ per column): two-stage grid ascent of the
    // profile log-likelihood, one scan per stage (graft.ml.PowerTransform).
    // c_acctbal goes negative, so both λ and 2-λ branches execute. The
    // oracle replays the identical two-stage search in SQL, so the fitted
    // λ itself is driver-checked, not hard-coded.
    "ml_power_transform" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val lam = graft.ml.PowerTransform.fitLambda(c, "c_acctbal")
      c.select(col("c_custkey"), col("c_acctbal"),
        lit(lam).as("lambda"),
        Num.r6(graft.ml.PowerTransform.yj(col("c_acctbal").cast("double"), lam))
          .as("acctbal_yj"))
    }),

    // SelectKBest(f_regression, k) (train.py:24-54): univariate F-statistic
    // per feature, F = r²/(1−r²)·(n−2), from EXACT decimal raw moments in
    // ONE scan — so the scores (and the selected set) are bit-identical
    // cross-engine. k=3 of 5 lineitem features vs l_extendedprice.
    "ml_select_kbest" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val dec2 = DecimalType(18, 2)
      val dec4 = DecimalType(28, 4)
      val yd = col("l_extendedprice").cast(dec2)
      val aggs = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Column](
        count(lit(1)).as("n"),
        sum(yd).cast(DoubleType).as("sy"),
        sum((yd * yd).cast(dec4)).cast(DoubleType).as("syy"))
      for (f <- KBestFeatures) {
        val fd = col(f).cast(dec2)
        aggs += sum(fd).cast(DoubleType).as(s"sx_$f")
        aggs += sum((fd * fd).cast(dec4)).cast(DoubleType).as(s"sxx_$f")
        aggs += sum((fd * yd).cast(dec4)).cast(DoubleType).as(s"sxy_$f")
      }
      val g = li.agg(aggs.head, aggs.tail.toSeq: _*)
      val entries = KBestFeatures.map { f =>
        val a = col("n") * col(s"sxy_$f") - col(s"sx_$f") * col("sy")
        val b = col("n") * col(s"sxx_$f") - col(s"sx_$f") * col(s"sx_$f")
        val cc = col("n") * col("syy") - col("sy") * col("sy")
        val r2 = (a * a) / (b * cc)
        val fstat = r2 / (lit(1.0) - r2) * (col("n") - lit(2))
        struct(lit(f).as("feature"), Num.r6(fstat).as("f_stat"))
      }
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("f_stat").desc, col("feature"))
      g.select(explode(array(entries: _*)).as("e"))
        .select(col("e.feature").as("feature"), col("e.f_stat").as("f_stat"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
    }),

    // Rolling-origin CV (TimeSeriesSplit(5), model_evaluation.ipynb cell
    // 18): fold i trains on the first test_start(i) rows of the global
    // (ts, event_id) order and tests on the next n//6; emitted as per
    // (fold, split) row counts + id checksums so the whole assignment is
    // hash-checked. The global row_number is the same single-exchange
    // pattern as sc4_global_rank; at 100 TB the fold boundary would come
    // from a count() + range-partitioned rank instead.
    "ml_cv_splits" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("ts"), col("event_id"))
      val ranked = Tables.events(s, dir)
        .select(col("ts"), col("event_id"))
        .withColumn("r", row_number().over(w) - 1)
      val t = ranked.agg(count(lit(1)).as("n"),
        (count(lit(1)) / lit(6)).cast("long").as("ts_sz"))
      val folds = s.range(0, 5).toDF("fold")
      ranked.crossJoin(broadcast(t)).crossJoin(broadcast(folds))
        .withColumn("start", col("n") - (lit(5) - col("fold")) * col("ts_sz"))
        .withColumn("split",
          when(col("r") < col("start"), lit("train"))
            .when(col("r") < col("start") + col("ts_sz"), lit("test")))
        .filter(col("split").isNotNull)
        .groupBy(col("fold"), col("split"))
        .agg(count(lit(1)).as("n_rows"), sum(col("event_id")).as("id_checksum"))
    }),

    // Group-wise quantile normalization: map each value to its empirical
    // quantile WITHIN its group (percent_rank over event_type) — the
    // rank-based feature transform that is robust to per-group scale
    // differences. percent_rank = (rank−1)/(n−1) is one IEEE division of
    // exact integers, so it hash-matches cross-engine with no rounding;
    // ties share a rank (standard rank() semantics) in both engines.
    // One hash exchange per group key + one sort — the W-family shape.
    "ml_quantile_norm" -> ((s, dir) => {
      val cents = graft.Num.cents(col("value"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("cents")
      Tables.events(s, dir)
        .select(col("event_id"), col("event_type"), cents.as("cents"))
        .withColumn("qn", percent_rank().over(w))
        .select("event_id", "event_type", "qn")
    })
  )

  /** Feature columns ranked by ml_select_kbest (shared with the oracle). */
  private val KBestFeatures =
    Seq("l_quantity", "l_discount", "l_tax", "l_partkey", "l_suppkey")

  def oracleSql: Map[String, String] = Map(
    "ml_target_encode" ->
      """WITH enc AS (
        |  SELECT c_mktsegment AS seg,
        |    CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(c_acctbal)
        |      AS segment_target_mean
        |  FROM customer GROUP BY 1
        |)
        |SELECT c.c_custkey, c.c_mktsegment, e.segment_target_mean
        |FROM customer c LEFT JOIN enc e ON c.c_mktsegment = e.seg""".stripMargin,
    "ml_metrics" ->
      """WITH pred AS (
        |  SELECT o_orderpriority AS prio,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS yhat
        |  FROM orders GROUP BY 1
        |), yb AS (
        |  SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS ybar
        |  FROM orders
        |), e AS (
        |  SELECT CAST(o.o_totalprice - p.yhat AS DECIMAL(24,6)) AS err,
        |         CAST(o.o_totalprice - yb.ybar AS DECIMAL(24,6)) AS dev
        |  FROM orders o JOIN pred p ON o.o_orderpriority = p.prio CROSS JOIN yb
        |)
        |SELECT count(*) AS n,
        |  floor((CAST(sum(abs(err)) AS DOUBLE) / count(*)) * 1000000 + 0.5) / 1000000 AS mae,
        |  floor(sqrt(CAST(sum(CAST(err * err AS DECIMAL(38,10))) AS DOUBLE) / count(*))
        |        * 1000000 + 0.5) / 1000000 AS rmse,
        |  floor((1.0 - CAST(sum(CAST(err * err AS DECIMAL(38,10))) AS DOUBLE)
        |      / CAST(sum(CAST(dev * dev AS DECIMAL(38,10))) AS DOUBLE))
        |        * 1000000 + 0.5) / 1000000 AS r2
        |FROM e""".stripMargin,
    "ml_standard_scale" ->
      """WITH m AS (
        |  SELECT count(*) AS n,
        |    CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(18,2)) *
        |                  CAST(c_acctbal AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS DOUBLE) AS sxx
        |  FROM customer
        |), p AS (
        |  SELECT n, sx / n AS mean,
        |    sqrt((n * sxx - sx * sx) / (n * (n - 1))) AS sd
        |  FROM m
        |)
        |SELECT c_custkey, (c_acctbal - mean) / sd AS acctbal_z
        |FROM customer CROSS JOIN p""".stripMargin,
    "ml_power_transform" ->
      s"""WITH c AS (
         |  SELECT c_custkey, c_acctbal, CAST(c_acctbal AS DOUBLE) AS x
         |  FROM customer
         |), ${graft.ml.PowerTransform.fitOracleCtes("c")}
         |SELECT c_custkey, c_acctbal, lambda,
         |  floor((${graft.ml.PowerTransform.yjSql("x", "lambda")})
         |        * 1000000 + 0.5) / 1000000 AS acctbal_yj
         |FROM c CROSS JOIN b2""".stripMargin,
    "ml_select_kbest" -> {
      val momentCols = KBestFeatures.map { f =>
        s"""    CAST(sum(CAST($f AS DECIMAL(18,2))) AS DOUBLE) AS sx_$f,
           |    CAST(sum(CAST(CAST($f AS DECIMAL(18,2)) * CAST($f AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS DOUBLE) AS sxx_$f,
           |    CAST(sum(CAST(CAST($f AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS DOUBLE) AS sxy_$f""".stripMargin
      }.mkString(",\n")
      val fRows = KBestFeatures.map { f =>
        s"""  SELECT '$f' AS feature,
           |    floor((((n * sxy_$f - sx_$f * sy) * (n * sxy_$f - sx_$f * sy))
           |             / ((n * sxx_$f - sx_$f * sx_$f) * (n * syy - sy * sy))
           |           / (1.0 - ((n * sxy_$f - sx_$f * sy) * (n * sxy_$f - sx_$f * sy))
           |             / ((n * sxx_$f - sx_$f * sx_$f) * (n * syy - sy * sy)))
           |           * (n - 2)) * 1000000 + 0.5) / 1000000 AS f_stat
           |  FROM m""".stripMargin
      }.mkString("\n  UNION ALL\n")
      s"""WITH m AS (
         |  SELECT count(*) AS n,
         |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
         |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS DOUBLE) AS syy,
         |$momentCols
         |  FROM lineitem
         |), f AS (
         |$fRows
         |)
         |SELECT feature, f_stat, rank FROM (
         |  SELECT feature, f_stat,
         |    row_number() OVER (ORDER BY f_stat DESC, feature) AS rank
         |  FROM f
         |) WHERE rank <= 3""".stripMargin
    },
    "ml_cv_splits" ->
      """WITH r AS (
        |  SELECT event_id, row_number() OVER (ORDER BY ts, event_id) - 1 AS r
        |  FROM events
        |), t AS (
        |  SELECT count(*) AS n, count(*) // 6 AS ts_sz FROM r
        |), f AS (
        |  SELECT unnest(range(0, 5)) AS fold
        |), j AS (
        |  SELECT fold,
        |    CASE WHEN r.r < n - (5 - fold) * ts_sz THEN 'train'
        |         WHEN r.r < n - (5 - fold) * ts_sz + ts_sz THEN 'test' END AS split,
        |    r.event_id
        |  FROM r CROSS JOIN t CROSS JOIN f
        |)
        |SELECT fold, split, count(*) AS n_rows,
        |  CAST(sum(event_id) AS BIGINT) AS id_checksum
        |FROM j WHERE split IS NOT NULL GROUP BY 1, 2""".stripMargin,
    "ml_quantile_norm" ->
      """SELECT event_id, event_type,
        |  percent_rank() OVER (
        |    PARTITION BY event_type
        |    ORDER BY CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS qn
        |FROM events""".stripMargin
  )
}
