package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Per-series seasonal AR fit — SAR(1)_s with a non-seasonal AR(1) term
  * (SURVEY §2.10, §7.6; VERDICT r10 next #5).
  *
  * The reference fits SARIMAX per series
  * (/root/reference/src/model/train.py:250-291); [[Ar1]] demonstrated the
  * per-series conditional-least-squares engine pattern for the
  * non-seasonal AR(1)+drift shape, and this closes the remaining visible
  * distance: the SEASONAL lag term. The model is
  *
  *   x_t = c + φ·x_{t−1} + Φ·x_{t−s} + ε_t
  *
  * estimated by CLS over the rows where both lags exist — OLS with two
  * regressors, solved in closed form from the 3×3 normal equations by
  * Cramer's rule. Same fold as [[Ar1]] (`groupByKey(key)
  * .flatMapSortedGroups(time)`, one shuffle, secondary sort inside the
  * exchange), with the O(1) state growing to O(s): a circular buffer of
  * the last `s` observations replaces the single `prev` cell. A skewed
  * key still never buffers its series — state is 10 integer moments + s
  * longs regardless of series length.
  *
  * Cross-engine exactness (the [[graft.Num]] discipline): moments
  * accumulate as EXACT integers (cent units for linear sums, 1e-4 units
  * for product sums), convert to double once, and the Cramer determinants
  * are evaluated in doubles with an op order written IDENTICALLY in the
  * DuckDB oracle — bit-identical inputs + identical expression tree =
  * bit-identical estimates, rounded at 1e-6 for the hash. Exactness
  * envelope as Ar1: integer sums must stay under 2^53, i.e. |x| ≲ 3e3
  * for a 1e4-row series (fixtures: 2-decimal values ≪ the bound).
  *
  * Singular designs (constant series ⇒ det = 0) are SKIPPED, not
  * NaN-emitted — the oracle filters `det <> 0` on the identically
  * computed double, so the skip set matches exactly.
  */
object Sar1 {

  case class Point(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
      value: Double)
  case class Sar1Row(user_id: Long, n: Long, drift: Double, phi: Double,
      phi_s: Double, sigma2: Double)

  /** Fit one SAR(1)_s + AR(1) + drift per `user_id` over `value` ordered
    * by (ts, event_id). Emits nothing for series with fewer than 5 usable
    * rows (σ² needs n − 3 ≥ 2) or a singular normal matrix. */
  def fit(spark: SparkSession, events: DataFrame, season: Int): Dataset[Sar1Row] = {
    import spark.implicits._
    require(season >= 2, "season must exceed the non-seasonal lag")
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[Point]
      .groupByKey(_.user_id)
      .flatMapSortedGroups($"ts", $"event_id") { (uid: Long, rows: Iterator[Point]) =>
        val buf = new Array[Long](season) // last `season` obs, circular
        var t = 0L
        var n = 0L; var sa = 0L; var sb = 0L; var sy = 0L // cent units
        var saa = 0L; var sbb = 0L; var sab = 0L          // 1e-4 units
        var say = 0L; var sby = 0L; var syy = 0L
        rows.foreach { p =>
          val c = math.round(p.value * 100.0) // exact: 2-decimal source
          if (t >= season) {
            val a = buf(((t - 1) % season).toInt) // x_{t-1}
            val b = buf((t % season).toInt)       // x_{t-season}
            n += 1; sa += a; sb += b; sy += c
            saa += a * a; sbb += b * b; sab += a * b
            say += a * c; sby += b * c; syy += c * c
          }
          buf((t % season).toInt) = c
          t += 1
        }
        if (n < 5) Iterator.empty
        else {
          val nd = n.toDouble
          val sad = sa.toDouble / 100.0
          val sbd = sb.toDouble / 100.0
          val syd = sy.toDouble / 100.0
          val saad = saa.toDouble / 10000.0
          val sbbd = sbb.toDouble / 10000.0
          val sabd = sab.toDouble / 10000.0
          val sayd = say.toDouble / 10000.0
          val sbyd = sby.toDouble / 10000.0
          val syyd = syy.toDouble / 10000.0
          // Cramer's rule on [[n, Σa, Σb], [Σa, Σa², Σab], [Σb, Σab, Σb²]]
          // — each expression mirrors the oracle SQL token for token
          val det = nd * (saad * sbbd - sabd * sabd) -
            sad * (sad * sbbd - sabd * sbd) +
            sbd * (sad * sabd - saad * sbd)
          if (det == 0.0) Iterator.empty
          else {
            val det0 = syd * (saad * sbbd - sabd * sabd) -
              sad * (sayd * sbbd - sabd * sbyd) +
              sbd * (sayd * sabd - saad * sbyd)
            val det1 = nd * (sayd * sbbd - sabd * sbyd) -
              syd * (sad * sbbd - sabd * sbd) +
              sbd * (sad * sbyd - sayd * sbd)
            val det2 = nd * (saad * sbyd - sayd * sabd) -
              sad * (sad * sbyd - sayd * sbd) +
              syd * (sad * sabd - saad * sbd)
            val c0 = det0 / det
            val phi = det1 / det
            val phis = det2 / det
            val sigma2 =
              (syyd - c0 * syd - phi * sayd - phis * sbyd) / (nd - 3.0)
            Iterator.single(Sar1Row(uid, n, c0, phi, phis, sigma2))
          }
        }
      }
  }
}
