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
      e.agg(
        count(lit(1)).as("n"),
        (sum(abs(col("err"))).cast(DoubleType) / count(lit(1))).as("mae"),
        sqrt((sum((col("err") * col("err")).cast(DecimalType(38, 10)))
          .cast(DoubleType) / count(lit(1)))).as("rmse"),
        (lit(1.0) - sum((col("err") * col("err")).cast(DecimalType(38, 10))).cast(DoubleType)
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

    // Yeo-Johnson power transform at fixed λ=0.5 (train.py:180's
    // PowerTransformer): λ estimation is offline model fitting (like
    // k-means centroids); the engine applies the transform at scale.
    // c_acctbal goes negative, so both λ and 2-λ branches execute.
    "ml_power_transform" -> ((s, dir) =>
      Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_acctbal"),
          Num.r6(
            when(col("c_acctbal") >= 0,
              (pow(col("c_acctbal") + 1, 0.5) - 1) / 0.5)
            .otherwise(-(pow(-col("c_acctbal") + 1, 1.5) - 1) / 1.5))
            .as("acctbal_yj")))
  )

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
        |  CAST(sum(abs(err)) AS DOUBLE) / count(*) AS mae,
        |  sqrt(CAST(sum(CAST(err * err AS DECIMAL(38,10))) AS DOUBLE) / count(*)) AS rmse,
        |  1.0 - CAST(sum(CAST(err * err AS DECIMAL(38,10))) AS DOUBLE)
        |      / CAST(sum(CAST(dev * dev AS DECIMAL(38,10))) AS DOUBLE) AS r2
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
      """SELECT c_custkey, c_acctbal,
        |  floor((CASE WHEN c_acctbal >= 0
        |         THEN (pow(c_acctbal + 1, 0.5) - 1) / 0.5
        |         ELSE -(pow(-c_acctbal + 1, 1.5) - 1) / 1.5 END)
        |        * 1000000 + 0.5) / 1000000 AS acctbal_yj
        |FROM customer""".stripMargin
  )
}
