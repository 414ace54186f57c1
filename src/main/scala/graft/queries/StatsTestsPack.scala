package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import graft.{Num, QueryPack, Tables}

/** Distributed two-sample hypothesis tests — the A/B-comparison primitives
  * a data-quality / experimentation pipeline runs over event streams
  * (reference analogue: the notebook's distribution-shift eyeballing,
  * `/root/reference/src/etl/preprocessing.py` summary stats — promoted to
  * proper rank statistics).
  *
  * Both tests are RANK-based, and the classic single-machine formulation
  * (sort everything, walk the ranked list) has no direct distributed
  * analogue — a `row_number() OVER (ORDER BY value)` window funnels the
  * corpus through one task. The scalable shape used here:
  *
  *   1. collapse the corpus to its DISTINCT-value type table with per-group
  *      counts (one keyed shuffle; ties collapse map-side),
  *   2. one [[graft.Ranks.globalPrefixSum]] pass over the type table
  *      (range-partitioned sort + per-partition subtotal broadcast — the
  *      sc4/t16 scan primitive, never a one-task window),
  *   3. per-row integer arithmetic recovers average ranks (Mann–Whitney)
  *      or both ECDFs (KS) exactly — all in Long space, so the DuckDB
  *      oracle's window replay hash-matches bit-for-bit; the only doubles
  *      are the final statistic (r6-rounded).
  *
  * Both prefix passes pack the two group counts into ONE Long
  * (cntA·2³² + cntB) so a single prefix-sum job carries both cumulative
  * counts; an assert_true guards the n_B < 2³¹ packing envelope (at a
  * true 100 TB row count the packing would switch to two passes or a
  * wider accumulator — the guard makes the envelope explicit instead of
  * silently wrapping).
  */
object StatsTestsPack extends QueryPack {

  /** Distinct-value type table for the two-sample slice: one row per
    * distinct `value` with (cnt_a, cnt_b) occurrence counts, plus the
    * packed prefix sum and its unpack — shared by both tests. */
  private def rankedTypes(s: SparkSession, dir: String,
      groupA: String, groupB: String): (DataFrame, Long, Long) = {
    val ev = Tables.events(s, dir)
      .filter(col("event_type").isin(groupA, groupB))
      .select(col("event_type"), col("value"))
    val types = ev.groupBy(col("value"))
      .agg(
        sum(when(col("event_type") === groupA, 1L).otherwise(0L)).as("cnt_a"),
        sum(when(col("event_type") === groupB, 1L).otherwise(0L)).as("cnt_b"))
    // packing envelope check BEFORE the prefix pass: both group totals
    // must stay below 2^31 or the packed accumulator would silently
    // bleed between fields. The totals agg runs over the bounded TYPE
    // table (one tiny job), not the corpus.
    val tot = types.agg(sum(col("cnt_a")).as("na"), sum(col("cnt_b")).as("nb"))
      .head()
    val (nA, nB) = (tot.getLong(0), tot.getLong(1))
    require(nA < (1L << 31) && nB < (1L << 31),
      s"two-sample sizes ($nA, $nB) exceed the 2^31 packing envelope; " +
        "split the prefix pass per group or widen to a decimal accumulator")
    val packed = types.withColumn("packed",
      col("cnt_a") * (1L << 32) + col("cnt_b"))
    val cum = graft.Ranks.globalPrefixSum(
      packed, "packed", Seq(col("value")), "cum_packed")
      .withColumn("cum_a", shiftright(col("cum_packed"), 32))
      .withColumn("cum_b", col("cum_packed").bitwiseAND(lit(0xffffffffL)))
    (cum, nA, nB)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Mann–Whitney U ('click' vs 'purchase' event values): average ranks
    // for ties recovered from the type table in DOUBLED-rank integer
    // space (r2 = 2·ranks_below + t + 1, exact Longs end-to-end), the
    // normal approximation tie-corrected. U and z are the only doubles.
    "stats_mannwhitney" -> ((s, dir) => {
      val (tt, nA, nB) = rankedTypes(s, dir, "click", "purchase")
      val n = nA + nB
      val t = col("cnt_a") + col("cnt_b")
      // ranks strictly below this value = cum_a + cum_b − t; doubled
      // average rank of the tie group = 2·below + t + 1 (integer)
      val r2 = (col("cum_a") + col("cum_b") - t) * 2 + t + 1
      val agg = tt.agg(
        sum(col("cnt_a") * r2).as("r2_sum_a"),
        sum(t * t * t - t).as("tie_term"))
      agg.select(
          lit(nA).as("n_a"), lit(nB).as("n_b"),
          // U_A = R_A − nA(nA+1)/2 with R_A = r2_sum_a / 2 (exact: the
          // doubled rank sum is even iff ties pair up, so divide last)
          ((col("r2_sum_a") - lit(nA) * (nA + 1)).cast(DoubleType) / 2.0)
            .as("u_stat"),
          col("tie_term"))
        .select(col("n_a"), col("n_b"), col("u_stat"),
          Num.r6(
            (col("u_stat") - lit(nA.toDouble * nB / 2.0)) /
              sqrt(lit(nA.toDouble * nB / 12.0) *
                (lit((n + 1).toDouble) -
                  col("tie_term").cast(DoubleType) / (n.toDouble * (n - 1)))))
            .as("z_score"))
    }),

    // Kolmogorov–Smirnov two-sample ('click' vs 'purchase'): the ECDF
    // gap maximized in cross-multiplied INTEGER space — D·nA·nB =
    // max|cum_a·nB − cum_b·nA| — so the max is exact and the single
    // division at the end is the only double. (At ≳3·10⁹ rows per group
    // the cross-product would need a decimal accumulator; the packing
    // guard upstream already bounds this envelope.)
    "stats_ks_test" -> ((s, dir) => {
      val (tt, nA, nB) = rankedTypes(s, dir, "click", "purchase")
      tt.agg(max(abs(col("cum_a") * nB - col("cum_b") * nA)).as("d_scaled"))
        .select(
          lit(nA).as("n_a"), lit(nB).as("n_b"),
          Num.r6(col("d_scaled").cast(DoubleType) / (nA.toDouble * nB))
            .as("ks_d"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "stats_mannwhitney" ->
      """WITH ev AS (
        |  SELECT event_type, value FROM events
        |  WHERE event_type IN ('click', 'purchase')
        |), tt AS (
        |  SELECT value,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS cnt_a,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS cnt_b
        |  FROM ev GROUP BY 1
        |), cum AS (
        |  SELECT cnt_a, cnt_b, cnt_a + cnt_b AS t,
        |    sum(cnt_a + cnt_b) OVER (ORDER BY value) AS below_plus_t
        |  FROM tt
        |), n AS (
        |  SELECT sum(cnt_a) AS n_a, sum(cnt_b) AS n_b FROM tt
        |), agg AS (
        |  SELECT
        |    sum(cnt_a * ((below_plus_t - t) * 2 + t + 1)) AS r2_sum_a,
        |    sum(t * t * t - t) AS tie_term
        |  FROM cum
        |)
        |SELECT n.n_a, n.n_b,
        |  CAST(agg.r2_sum_a - n.n_a * (n.n_a + 1) AS DOUBLE) / 2.0 AS u_stat,
        |  floor(((CAST(agg.r2_sum_a - n.n_a * (n.n_a + 1) AS DOUBLE) / 2.0
        |      - CAST(n.n_a AS DOUBLE) * CAST(n.n_b AS DOUBLE) / 2.0)
        |    / sqrt(CAST(n.n_a AS DOUBLE) * CAST(n.n_b AS DOUBLE) / 12.0 *
        |        (CAST(n.n_a + n.n_b + 1 AS DOUBLE)
        |          - CAST(agg.tie_term AS DOUBLE) /
        |            (CAST(n.n_a + n.n_b AS DOUBLE) * CAST(n.n_a + n.n_b - 1 AS DOUBLE)))))
        |    * 1000000 + 0.5) / 1000000 AS z_score
        |FROM agg, n""".stripMargin,
    "stats_ks_test" ->
      """WITH ev AS (
        |  SELECT event_type, value FROM events
        |  WHERE event_type IN ('click', 'purchase')
        |), tt AS (
        |  SELECT value,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS cnt_a,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS cnt_b
        |  FROM ev GROUP BY 1
        |), cum AS (
        |  SELECT
        |    sum(cnt_a) OVER (ORDER BY value) AS cum_a,
        |    sum(cnt_b) OVER (ORDER BY value) AS cum_b
        |  FROM tt
        |), n AS (SELECT sum(cnt_a) AS n_a, sum(cnt_b) AS n_b FROM tt)
        |SELECT n.n_a, n.n_b,
        |  floor((CAST(max(abs(cum.cum_a * n.n_b - cum.cum_b * n.n_a)) AS DOUBLE)
        |      / (CAST(n.n_a AS DOUBLE) * CAST(n.n_b AS DOUBLE)))
        |    * 1000000 + 0.5) / 1000000 AS ks_d
        |FROM cum, n
        |GROUP BY n.n_a, n.n_b""".stripMargin
  )
}
