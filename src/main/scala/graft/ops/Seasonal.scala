package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Additive seasonal decomposition per series — the engine counterpart of
  * statsmodels `seasonal_decompose` used by the reference
  * (/root/reference/src/data/preprocessing.py:217-269): value =
  * trend + seasonal + resid with a centered moving-average trend and
  * per-period-index seasonal means (mean-centered).
  *
  * Pure window + groupBy algebra — two shuffles total (the window/groupBy
  * share the user_id hash partitioning; the small per-(user,period) frame
  * broadcasts back). Scale: state per key is O(1) aggregates, never the
  * series.
  *
  * Cross-engine exactness (the oracle-parity rules of `graft.Num`):
  *  - trend = (exact DECIMAL window sum of the 2-decimal values) / p — a
  *    single double division of a bit-identical numerator;
  *  - detrended values are kept in EXACT decimal form d = p·y − S (avoids
  *    summing engine-ordered doubles): seasonal mean = Σd / (p·n_d);
  *  - the seasonal-mean centering averages exactly p doubles via an
  *    explicit per-period pivot, so the summation order is pinned by the
  *    expression shape, not by row order.
  */
object Seasonal {

  /** Decompose `events.value` per user_id series with period `p` (odd, so
    * the centered MA window is symmetric: (p−1)/2 each side). Returns
    * (user_id, event_id, trend, seasonal, resid); trend/resid are NULL on
    * the (p−1)/2 edge rows of each series, like statsmodels' NaN edges. */
  def decompose(events: DataFrame, p: Int = 7): DataFrame = {
    require(p % 2 == 1, s"period must be odd for a symmetric centered MA, got $p")
    val half = p / 2
    val dec2 = DecimalType(18, 2)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wf = w.rowsBetween(-half, half)

    val base = events
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("pidx", pmod(row_number().over(w) - 1, lit(p)))
      .withColumn("cntw", count(col("value")).over(wf))
      .withColumn("sw", sum(col("value").cast(dec2)).over(wf))
      .withColumn("trend",
        when(col("cntw") === p, col("sw").cast("double") / p.toDouble))
      // exact-decimal detrended numerator: p·y − S (detrended = d / p)
      .withColumn("d",
        when(col("cntw") === p, col("value").cast(dec2) * lit(p) - col("sw")))

    // per-(series, period-index) seasonal mean of the detrended values:
    // Σ(p·y − S) / (p·n) — numerator exact, one double division
    val sm = base.groupBy(col("user_id"), col("pidx"))
      .agg((sum(col("d")).cast("double") /
        (lit(p.toDouble) * count(col("d")))).as("sm"))

    // center the p seasonal means per series; the pivot fixes the addition
    // order 0..p−1 so both engines fold the same sequence
    val smCols: Seq[Column] =
      (0 until p).map(j => max(when(col("pidx") === j, col("sm"))).as(s"sm_$j"))
    val adj = sm.groupBy(col("user_id"))
      .agg(smCols.head, smCols.tail: _*)
      .withColumn("adj",
        (0 until p).map(j => col(s"sm_$j")).reduceLeft(_ + _) / p.toDouble)
      .select(col("user_id"), col("adj"))

    // seasonal/adj grow with series cardinality (n_users·p and n_users
    // rows), so they must NOT be broadcast-hinted: at scale a forced
    // broadcast of a per-key frame blows the driver/broadcast limit. The
    // joins key on user_id, the same partitioning the window family
    // already established — a shuffle join co-locates for free, and AQE
    // still broadcasts when the actual size is small.
    val seasonal = sm.join(adj, "user_id")
      .select(col("user_id"), col("pidx"), (col("sm") - col("adj")).as("seasonal"))

    base.join(seasonal, Seq("user_id", "pidx"))
      .select(col("user_id"), col("event_id"),
        graft.Num.r6(col("trend")).as("trend"),
        graft.Num.r6(col("seasonal")).as("seasonal"),
        graft.Num.r6(col("value") - col("trend") - col("seasonal")).as("resid"))
  }

  /** DuckDB oracle for [[decompose]], generated from the same `p`. */
  def decomposeOracle(p: Int = 7): String = {
    val half = p / 2
    val smPivot = (0 until p)
      .map(j => s"max(CASE WHEN pidx = $j THEN sm END)").mkString(" + ")
    s"""WITH r AS (
       |  SELECT user_id, event_id, value,
       |    ((row_number() OVER w - 1) % $p + $p) % $p AS pidx,
       |    count(value) OVER wf AS cntw,
       |    sum(CAST(value AS DECIMAL(18,2))) OVER wf AS sw
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
       |         wf AS (PARTITION BY user_id ORDER BY ts, event_id
       |                ROWS BETWEEN $half PRECEDING AND $half FOLLOWING)
       |), b AS (
       |  SELECT *,
       |    CASE WHEN cntw = $p THEN CAST(sw AS DOUBLE) / ${p.toDouble} END AS trend,
       |    CASE WHEN cntw = $p THEN CAST(value AS DECIMAL(18,2)) * $p - sw END AS d
       |  FROM r
       |), sm AS (
       |  SELECT user_id, pidx,
       |    CAST(sum(d) AS DOUBLE) / (${p.toDouble} * count(d)) AS sm
       |  FROM b GROUP BY user_id, pidx
       |), adj AS (
       |  SELECT user_id, ($smPivot) / ${p.toDouble} AS adj
       |  FROM sm GROUP BY user_id
       |), se AS (
       |  SELECT sm.user_id, sm.pidx, sm.sm - adj.adj AS seasonal
       |  FROM sm JOIN adj ON adj.user_id = sm.user_id
       |)
       |SELECT b.user_id, b.event_id,
       |  floor(trend * 1000000 + 0.5) / 1000000 AS trend,
       |  floor(seasonal * 1000000 + 0.5) / 1000000 AS seasonal,
       |  floor((value - trend - seasonal) * 1000000 + 0.5) / 1000000 AS resid
       |FROM b JOIN se ON se.user_id = b.user_id AND se.pidx = b.pidx""".stripMargin
  }
}
