package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Exponentially-weighted mean → MACD (SURVEY §2.5 W8, §2.9).
  *
  * The reference computes `ewm(span=12/26).mean()` and a 9-span signal line
  * over the MACD (/root/reference/src/data/preprocessing.py:346-351).
  * EWM is recursive with infinite lookback, so no frame-based Spark window
  * can express it. Engine choice (SURVEY §7.4): typed
  * `groupByKey(key).flatMapSortedGroups(time)` — Spark performs a
  * secondary sort inside the exchange, hands each series as an ORDERED
  * iterator, and the fold below keeps O(1) state per key. No `toList`, no
  * per-group buffering: safe on skewed keys at 100 TB.
  *
  * Semantics = pandas `ewm(span=s, adjust=True).mean()`:
  *   α = 2/(s+1);  num_t = x_t + (1-α)·num_{t-1};  den_t = 1 + (1-α)·den_{t-1}
  *   ewm_t = num_t / den_t
  */
object Ewm {

  case class Point(user_id: Long, ts: java.sql.Timestamp, event_id: Long, value: Double)
  case class MacdRow(user_id: Long, event_id: Long, value: Double,
      ewm_12: Double, ewm_26: Double, macd: Double, macd_signal: Double)

  private final class EwmState(span: Int) {
    private val oneMinusAlpha = 1.0 - 2.0 / (span + 1.0)
    private var num = 0.0
    private var den = 0.0
    def next(x: Double): Double = {
      num = x + oneMinusAlpha * num
      den = 1.0 + oneMinusAlpha * den
      num / den
    }
  }

  /** value → ewm(12), ewm(26), macd, signal(9) per user_id series. */
  def macd(spark: SparkSession, events: DataFrame): Dataset[MacdRow] = {
    import spark.implicits._
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[Point]
      .groupByKey(_.user_id)
      .flatMapSortedGroups($"ts", $"event_id") { (uid: Long, rows: Iterator[Point]) =>
        val e12 = new EwmState(12)
        val e26 = new EwmState(26)
        val e9  = new EwmState(9)
        rows.map { p =>
          val a = e12.next(p.value)
          val b = e26.next(p.value)
          val m = a - b
          val sig = e9.next(m)
          MacdRow(uid, p.event_id, p.value, a, b, m, sig)
        }
      }
  }
}
