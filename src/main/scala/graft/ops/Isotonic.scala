package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Weighted isotonic (monotone nondecreasing) regression by
  * pool-adjacent-violators, per series — the calibration primitive
  * (Zadrozny & Elkan 2002 probability calibration; Barlow et al. 1972):
  * fit the best L2 nondecreasing step function to (x, y, w) points.
  *
  * Distribution model: one exchange on the series key with a secondary
  * sort on x (`groupByKey.flatMapSortedGroups` — the Ewm shape), then the
  * classic PAV stack fold per series. PAV state is O(#blocks); the block
  * buffer is bounded by the series' DISTINCT x count (here: calendar
  * days), never the corpus — the corpus collapses to (key, x) cells in a
  * partial agg BEFORE the exchange. Sums and weights stay exact integer
  * cents through the fold; each block's fitted value is the single
  * division sum/weight at emit time, so the result is bit-identical to
  * any engine computing the same quotient — which is how the DuckDB
  * oracle checks it, via the minimax identity
  * f(i) = max_{j≤i} min_{k≥i} avg(j..k) (exact-rational equality, one
  * IEEE division per candidate range on both sides).
  */
object Isotonic {

  case class Cell(key: String, x: Long, s: Long, w: Long)
  case class Fit(key: String, x: Long, s: Long, w: Long, fitted: Double)

  /** @param cells (key, x, s, w): per-(series, position) exact integer
    *        value sum `s` and weight `w` (w > 0). One output row per
    *        input cell with the isotonic fitted mean at that x. */
  def fit(spark: SparkSession, cells: DataFrame): Dataset[Fit] = {
    import spark.implicits._
    cells.select(col("key"), col("x"), col("s"), col("w"))
      .as[Cell]
      .groupByKey(_.key)
      .flatMapSortedGroups($"x") { (key: String, rows: Iterator[Cell]) =>
        // PAV stack: blocks of (sumS, sumW, nCells), merged while the
        // last two violate monotonicity. Violation test is the EXACT
        // integer cross-multiply sPrev·wNew > sNew·wPrev — no FP in the
        // pooling decision, so block boundaries are deterministic.
        val xs = scala.collection.mutable.ArrayBuffer.empty[Cell]
        val bs = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
        rows.foreach { c =>
          xs += c
          bs += Array(c.s, c.w, 1L)
          while (bs.length > 1 && {
            val p = bs(bs.length - 2); val q = bs.last
            // avg(p) > avg(q)  ⇔  p.s·q.w > q.s·p.w  (w > 0)
            p(0) * q(1) > q(0) * p(1)
          }) {
            val q = bs.remove(bs.length - 1)
            val p = bs.last
            p(0) += q(0); p(1) += q(1); p(2) += q(2)
          }
        }
        var i = 0
        bs.iterator.flatMap { b =>
          val v = b(0).toDouble / b(1).toDouble
          (0L until b(2)).map { _ =>
            val c = xs(i); i += 1
            Fit(key, c.x, c.s, c.w, v)
          }
        }
      }
  }
}
