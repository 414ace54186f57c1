package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Per-series statistical tests (SURVEY §5.2, §2.9): ADF stationarity
  * t-statistic and Ljung-Box Q — the reference runs statsmodels
  * `adfuller` / `acorr_ljungbox` per ticker
  * (/root/reference/src/data/preprocessing.py:273-285,
  * /root/reference/src/model/metrics_visualizer.py:177-191).
  *
  * Hand-rolled OLS (no external deps): ADF regression with constant,
  * zero augmentation lags:  Δy_t = α + β·y_{t-1} + ε_t ; the reported
  * statistic is t(β) = β/se(β). Ljung-Box on the raw series with h lags:
  * Q = n(n+2) Σ_{k=1..h} ρ_k²/(n−k).
  *
  * Runs as `mapGroups` per key over the time-sorted iterator; the two
  * passes need the series in memory (O(series length) per key) — for
  * 100 TB pipelines this is a per-key reduction whose state is one series,
  * the same bound statsmodels needs single-node, but distributed across
  * keys.
  */
object SeriesStats {

  case class Pt(user_id: Long, ts: java.sql.Timestamp, event_id: Long, value: Double)
  case class Stats(user_id: Long, n: Long, mean: Double, adf_t: Double,
      ljung_box_q: Double, lb_lags: Int)

  /** ADF t-stat (constant, no augmentation) on y. */
  def adfT(y: Array[Double]): Double = {
    val n = y.length - 1
    if (n < 3) return Double.NaN
    val x  = new Array[Double](n) // y_{t-1}
    val dy = new Array[Double](n) // Δy_t
    var i = 0
    while (i < n) { x(i) = y(i); dy(i) = y(i + 1) - y(i); i += 1 }
    val mx = x.sum / n
    val my = dy.sum / n
    var sxx = 0.0; var sxy = 0.0
    i = 0
    while (i < n) { val dx = x(i) - mx; sxx += dx * dx; sxy += dx * (dy(i) - my); i += 1 }
    if (sxx == 0.0) return Double.NaN
    val beta  = sxy / sxx
    val alpha = my - beta * mx
    var sse = 0.0
    i = 0
    while (i < n) { val e = dy(i) - alpha - beta * x(i); sse += e * e; i += 1 }
    val dof = n - 2
    if (dof <= 0) return Double.NaN
    val seBeta = math.sqrt(sse / dof / sxx)
    beta / seBeta
  }

  /** Ljung-Box Q over h lags of y. */
  def ljungBoxQ(y: Array[Double], h: Int): Double = {
    val n = y.length
    if (n <= h + 1) return Double.NaN
    val m = y.sum / n
    var c0 = 0.0
    var i = 0
    while (i < n) { val d = y(i) - m; c0 += d * d; i += 1 }
    if (c0 == 0.0) return Double.NaN
    var q = 0.0
    var k = 1
    while (k <= h) {
      var ck = 0.0
      i = k
      while (i < n) { ck += (y(i) - m) * (y(i - k) - m); i += 1 }
      val rho = ck / c0
      q += rho * rho / (n - k)
      k += 1
    }
    n.toDouble * (n + 2) * q
  }

  def perSeries(spark: SparkSession, events: DataFrame, lags: Int = 10): Dataset[Stats] = {
    import spark.implicits._
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[Pt]
      .groupByKey(_.user_id)
      .flatMapSortedGroups($"ts", $"event_id") { (uid: Long, rows: Iterator[Pt]) =>
        val y = rows.map(_.value).toArray
        Iterator.single(Stats(uid, y.length.toLong, y.sum / y.length, adfT(y),
          ljungBoxQ(y, lags), lags))
      }
  }
}
