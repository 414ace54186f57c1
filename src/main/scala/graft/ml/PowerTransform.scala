package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Yeo-Johnson power transform with MLE λ estimation
  * (SURVEY §2.9/§2.10; /root/reference/src/model/train.py:180 uses sklearn
  * PowerTransformer(method='yeo-johnson'), which fits λ by maximizing the
  * profile log-likelihood with Brent's method).
  *
  * Engine version: two-stage grid ascent over the SAME likelihood,
  *   LL(λ) = −n/2·ln(Var_MLE(ψ(x,λ))) + (λ−1)·Σ sign(x)·ln(|x|+1),
  * where each stage evaluates 41 λ probes in ONE scan (41 pairs of agg
  * expressions), then refines around the argmax: stage 1 covers [−2,2] at
  * 0.1, stage 2 ±0.1 around the winner at 0.005. Two scans + one moment
  * pass instead of ~25 sequential Brent scans — the λ resolution (0.005)
  * is far finer than the statistical uncertainty of λ̂ on any real column.
  *
  * Cross-engine determinism: the fitted λ is a grid point whose value both
  * engines derive with identical double arithmetic ((i−20)/10.0, then
  * best₁+(j−20)·0.005), and adjacent-grid LL gaps (curvature ~n·Δλ²) are
  * orders of magnitude above the ~1e-12 relative float noise between the
  * engines' aggregation orders — so the argmax, and therefore the emitted
  * λ and transform, hash-match the DuckDB oracle, which replays the same
  * two-stage search in SQL.
  */
object PowerTransform {

  /** ψ(x, λ): Yeo-Johnson transform of a double column at fixed λ. */
  def yj(x: Column, lam: Double): Column = {
    val pos: Column =
      if (lam == 0.0) log(x + 1) else (pow(x + 1, lam) - 1) / lam
    val neg: Column =
      if (lam == 2.0) -log(-x + 1) else -(pow(-x + 1, 2.0 - lam) - 1) / (2.0 - lam)
    when(x >= 0, pos).otherwise(neg)
  }

  /** SQL text of ψ(x, λ) with λ itself a SQL expression (oracle side). */
  def yjSql(x: String, lam: String): String =
    s"""CASE WHEN $x >= 0 THEN
       |      CASE WHEN $lam = 0 THEN ln($x + 1)
       |           ELSE (pow($x + 1, $lam) - 1) / $lam END
       |    ELSE
       |      CASE WHEN $lam = 2 THEN -ln(-$x + 1)
       |           ELSE -(pow(-$x + 1, 2 - $lam) - 1) / (2 - $lam) END
       |    END""".stripMargin

  /** Fit λ by two-stage grid ascent of the profile log-likelihood.
    * Three scans total over `df` (moments, stage-1 grid, stage-2 grid).
    * NULLs in the column are excluded from the fit (n = count(x), matching
    * the NULL-skipping avg() moments and the oracle's count(x)). */
  def fitLambda(df: DataFrame, colName: String): Double = {
    val x = col(colName).cast("double")
    val head = df.agg(
      count(x).as("n"),
      sum(when(x >= 0, log(x + 1)).otherwise(-log(-x + 1))).as("cnst")).head()
    val n = head.getLong(0)
    val cnst = head.getDouble(1)

    def bestOf(lams: Seq[Double]): Double = {
      val aggs = lams.zipWithIndex.flatMap { case (l, i) =>
        val t = yj(x, l)
        Seq(avg(t * t).as(s"m2_$i"), avg(t).as(s"m1_$i"))
      }
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      val scored = lams.zipWithIndex.map { case (l, i) =>
        val m2 = row.getDouble(2 * i)
        val m1 = row.getDouble(2 * i + 1)
        val ll = -0.5 * n * math.log(m2 - m1 * m1) + (l - 1) * cnst
        (ll, l)
      }.filter(s => java.lang.Double.isFinite(s._1))
      // Degenerate λ probes are dropped BEFORE the argmax so both engines
      // see the same candidate set: variance < 0 rounds to NaN here, and
      // variance == 0 gives ll = +Inf (log 0 = -Inf), while the oracle's
      // ln(nullif(greatest(var, 0), 0)) NULLs both cases. A fully
      // degenerate column (every probe dropped — e.g. a constant x) falls
      // back to λ = 1, the identity transform, mirrored by the oracle's
      // coalesce(..., 1.0).
      if (scored.isEmpty) 1.0
      else scored.reduceLeft { (a, b) => if (b._1 > a._1) b else a }._2
    }

    val best1 = bestOf((0 to 40).map(i => (i - 20) / 10.0))
    bestOf((0 to 40).map(j => best1 + (j - 20) * 0.005))
  }

  /** Oracle CTE chain replaying the two-stage fit over table `tbl`, column
    * `xcol`; yields CTE `b2(lambda)` plus `c(c_key..., x)` is caller-side.
    * `src` must be a CTE exposing column `x` (double). */
  def fitOracleCtes(src: String): String = {
    // DuckDB ln() ERRORS on zero/negative arguments (it does not return
    // NaN), so the variance is guarded: greatest(·,0) clamps tiny negative
    // rounding, nullif(·,0) turns degenerate (zero-variance) probes into
    // NULL ll rows — dropped like the Spark side drops NaN/±Inf scores.
    // If every probe is degenerate, coalesce falls back to λ = 1 exactly
    // as fitLambda does.
    def llStage(lamCte: String, outCte: String): String =
      s"""$outCte AS (
         |  SELECT lam,
         |    -0.5 * (SELECT n FROM st)
         |      * ln(nullif(greatest(avg(t * t) - avg(t) * avg(t), 0), 0))
         |      + (lam - 1) * (SELECT cnst FROM st) AS ll
         |  FROM (
         |    SELECT lam,
         |      ${yjSql("x", "lam")} AS t
         |    FROM $src CROSS JOIN $lamCte)
         |  GROUP BY lam
         |)""".stripMargin
    s"""st AS (
       |  SELECT count(x) AS n,
       |    sum(CASE WHEN x >= 0 THEN ln(x + 1) ELSE -ln(-x + 1) END) AS cnst
       |  FROM $src
       |), l1 AS (
       |  SELECT (i - 20) / 10.0 AS lam FROM (SELECT unnest(range(0, 41)) AS i)
       |), ${llStage("l1", "ll1")},
       |b1 AS (SELECT coalesce(
       |         (SELECT lam FROM ll1 WHERE ll IS NOT NULL
       |          ORDER BY ll DESC, lam LIMIT 1), 1.0) AS best1),
       |l2 AS (
       |  SELECT best1 + (j - 20) * 0.005 AS lam
       |  FROM b1 CROSS JOIN (SELECT unnest(range(0, 41)) AS j)
       |), ${llStage("l2", "ll2")},
       |b2 AS (SELECT coalesce(
       |         (SELECT lam FROM ll2 WHERE ll IS NOT NULL
       |          ORDER BY ll DESC, lam LIMIT 1), 1.0) AS lambda)""".stripMargin
  }
}
