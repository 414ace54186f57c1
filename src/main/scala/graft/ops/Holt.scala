package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Per-series Holt linear-trend exponential smoothing (double exponential
  * smoothing) — the trend-aware sibling of [[Ewm]]'s single smoothing and
  * the second classical forecaster in the per-series family [[Ar1]]
  * anchors (cf. the reference's per-ticker model loop,
  * /root/reference/src/model/train.py:250-291):
  *
  *   l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1})
  *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
  *
  * with α = 0.5, β = 0.3, l_1 = x_1, b_1 = 0. Emits per series the final
  * level/trend, the one-step forecast l_n + b_n, and the in-sample
  * one-step MAE (mean |x_t − (l_{t−1}+b_{t−1})| over t = 2..n).
  *
  * Engine shape is exactly [[Ar1]]'s: `groupByKey(key)
  * .flatMapSortedGroups(ts, event_id)` — ONE shuffle, secondary sort
  * inside the exchange, O(1) fold state (level, trend, error sum), so a
  * skewed series never buffers.
  *
  * Cross-engine exactness: the recursion is not expressible as an
  * order-independent aggregate, so instead of float recursion (whose
  * rounding would drift between engines) every quantity is a 1e-6-unit
  * BIGINT and every smoothing step TRUNCATING integer division —
  * l' = (5x + 5(l+b)) / 10, b' = (3(l'−l) + 7b) / 10 — which DuckDB's
  * `//` reproduces bit-for-bit (both truncate toward zero, verified on
  * negative operands), so the oracle replays the recursion exactly as a
  * WITH RECURSIVE lockstep over row numbers. Magnitudes: x in 1e-6 units
  * is ≤ ~1e9 for the 2-decimal fixtures; every intermediate stays far
  * under 2^63 and the final ÷1e6 doubles are exact (< 2^53). */
object Holt {

  case class HoltRow(user_id: Long, n: Long, level: Double, trend: Double,
      forecast: Double, mae: Double)

  /** Smooth `value` per `user_id` ordered by (ts, event_id). Series with
    * fewer than 2 observations are skipped (no smoothing step, MAE
    * undefined). */
  def smooth(spark: SparkSession, events: DataFrame): Dataset[HoltRow] = {
    import spark.implicits._
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[Ar1.Point]
      .groupByKey(_.user_id)
      .flatMapSortedGroups($"ts", $"event_id") { (uid: Long, rows: Iterator[Ar1.Point]) =>
        var l = 0L; var b = 0L; var sae = 0L
        var n = 0L
        rows.foreach { p =>
          // 2-decimal source → exact cents → 1e-6 units
          val v = math.round(p.value * 100.0) * 10000L
          if (n == 0L) { l = v; b = 0L }
          else {
            val f = l + b
            sae += math.abs(v - f)
            val lNew = (5L * v + 5L * (l + b)) / 10L
            b = (3L * (lNew - l) + 7L * b) / 10L
            l = lNew
          }
          n += 1
        }
        if (n < 2) Iterator.empty
        else Iterator.single(HoltRow(uid, n,
          l.toDouble / 1e6, b.toDouble / 1e6, (l + b).toDouble / 1e6,
          sae.toDouble / (n - 1).toDouble / 1e6))
      }
  }
}
