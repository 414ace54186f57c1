package graft.ops

import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Polynomial (order-2) interpolation of nulls within a keyed series
  * (SURVEY §2.5 W10; /root/reference/src/data/preprocessing.py:114-155).
  *
  * The reference runs pandas `interpolate(method='polynomial', order=2)`
  * per (setor, industria) group with a fallback cascade. Engine version:
  * `flatMapSortedGroups` per series; for each interior null run, fit a
  * Lagrange quadratic through the two known points before the run and the
  * first known point after it (positions as x); with only one known point
  * on the left, degrade to linear; head runs backfill from the first known
  * value, tail runs forward-fill from the last.
  *
  * Memory per key is O(longest null run) — the streaming fold buffers only
  * the pending gap, never the series, so skewed keys stay bounded at scale.
  */
object Interpolate {

  case class Pt(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
      value: Option[Double])
  case class Out(user_id: Long, event_id: Long, value: Option[Double],
      v_interp: Double)
  /** Pt carrying an explicit interpolation-grain key (cascade variant). */
  case class KPt(gkey: String, user_id: Long, ts: java.sql.Timestamp,
      event_id: Long, value: Option[Double])

  /** Quadratic through (x0,y0),(x1,y1),(x2,y2) evaluated at x. */
  private def lagrange3(x0: Double, y0: Double, x1: Double, y1: Double,
      x2: Double, y2: Double)(x: Double): Double = {
    val l0 = (x - x1) * (x - x2) / ((x0 - x1) * (x0 - x2))
    val l1 = (x - x0) * (x - x2) / ((x1 - x0) * (x1 - x2))
    val l2 = (x - x0) * (x - x1) / ((x2 - x0) * (x2 - x1))
    y0 * l0 + y1 * l1 + y2 * l2
  }

  /** Streaming per-series interpolation over the ordered iterator. */
  def series(rows: Iterator[Pt]): Iterator[Out] = {
    // known(-2), known(-1) positions/values; pending null run
    var k2: Option[(Long, Double)] = None
    var k1: Option[(Long, Double)] = None
    var pos = -1L
    val pending = ArrayBuffer.empty[(Long, Pt)] // (position, row)
    val out = ArrayBuffer.empty[Out]            // drained incrementally

    def flush(right: Option[(Long, Double)]): Unit = {
      val fill: Long => Double = (k1, k2, right) match {
        case (Some((x1, y1)), Some((x0, y0)), Some((x2, y2))) =>
          x => lagrange3(x0.toDouble, y0, x1.toDouble, y1, x2.toDouble, y2)(x.toDouble)
        case (Some((x1, y1)), None, Some((x2, y2))) =>
          x => y1 + (y2 - y1) * (x - x1).toDouble / (x2 - x1).toDouble
        case (Some((_, y1)), _, None) => _ => y1          // tail run: ffill
        case (None, _, Some((_, y2))) => _ => y2          // head run: bfill
        case _ => _ => Double.NaN                          // all-null series
      }
      pending.foreach { case (p, r) =>
        out += Out(r.user_id, r.event_id, r.value, fill(p))
      }
      pending.clear()
    }

    val it = rows.flatMap { r =>
      pos += 1
      r.value match {
        case Some(v) =>
          flush(Some((pos, v)))
          k2 = k1; k1 = Some((pos, v))
          val drained = out.toVector :+ Out(r.user_id, r.event_id, r.value, v)
          out.clear()
          drained
        case None =>
          pending += ((pos, r))
          val drained = out.toVector
          out.clear()
          drained
      }
    }
    // materialize tail flush after the iterator is exhausted
    it ++ Iterator.unfold(false) { done =>
      if (done) None
      else { flush(None); Some((out.toVector, true)) }
    }.flatten
  }

  def quadratic(spark: SparkSession, events: DataFrame): Dataset[Out] = {
    import spark.implicits._
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[Pt]
      .groupByKey(_.user_id)
      .flatMapSortedGroups($"ts", $"event_id") { (_: Long, rows: Iterator[Pt]) =>
        series(rows)
      }
  }

  /** Same per-series fold, but the interpolation grain is an explicit
    * `gkey` column (the cascade's rule-selected grain) rather than the
    * series id — rows of many series interleave within one grain, exactly
    * like the reference's groupby(['setor','industria']).interpolate. */
  def quadraticKeyed(spark: SparkSession, df: DataFrame): Dataset[Out] = {
    import spark.implicits._
    df
      .select(col("gkey"), col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[KPt]
      .groupByKey(_.gkey)
      .flatMapSortedGroups($"ts", $"event_id") { (_: String, rows: Iterator[KPt]) =>
        series(rows.map(p => Pt(p.user_id, p.ts, p.event_id, p.value)))
      }
  }
}
