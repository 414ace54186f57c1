package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The two-sample rank tests vs their scalar textbook definitions on a
  * hand-built fixture — independent of the DuckDB oracle, which replays
  * the same distributed recipe; this pins the recipe TO the definition.
  *
  * Fixture: click values [1, 2, 2, 3], purchase values [2, 4].
  *  - Ranks over the pooled sample: 1→1; the three 2s tie at avg rank 3;
  *    3→5; 4→6. R_click = 1+3+3+5 = 12, U = 12 − 4·5/2 = 2 (cross-check:
  *    pair count = 1·(a=3>b=2) + 2·½·(a=2 ties b=2) = 2).
  *  - Tie correction: the one tie group of size 3 gives Σ(t³−t) = 24.
  *  - KS: ECDF gap peaks after value 3 at |1 − ½| = 0.5.
  */
class StatsTestsSpec extends SparkSuite {

  private lazy val fixtureDir: String = {
    val dir = Files.createTempDirectory("graft_stats_fixture").toString
    val rows = Seq(
      (1L, "click", 1.0), (2L, "click", 2.0), (3L, "click", 2.0),
      (4L, "click", 3.0), (5L, "purchase", 2.0), (6L, "purchase", 4.0),
      // a third event type the isin filter must exclude
      (7L, "view", 100.0))
    import spark.implicits._
    rows.toDF("event_id", "event_type", "value")
      .withColumn("ts", lit("2024-01-01 00:00:00").cast("timestamp"))
      .withColumn("user_id", col("event_id"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("Mann-Whitney U and tie-corrected z match the scalar definition") {
    val row = graft.queries.StatsTestsPack
      .queries("stats_mannwhitney")(spark, fixtureDir).head()
    assert(row.getLong(row.fieldIndex("n_a")) === 4L)
    assert(row.getLong(row.fieldIndex("n_b")) === 2L)
    assert(row.getDouble(row.fieldIndex("u_stat")) === 2.0)
    // scalar z from the same closed form the test defines: mean nA·nB/2,
    // variance nA·nB/12 · (n+1 − Σ(t³−t)/(n(n−1)))
    val (na, nb, n, tieSum) = (4.0, 2.0, 6.0, 24.0)
    val z = (2.0 - na * nb / 2.0) /
      math.sqrt(na * nb / 12.0 * (n + 1 - tieSum / (n * (n - 1))))
    val zR6 = math.floor(z * 1e6 + 0.5) / 1e6
    assert(row.getDouble(row.fieldIndex("z_score")) === zR6)
  }

  test("KS D statistic is the exact maximum ECDF gap") {
    val row = graft.queries.StatsTestsPack
      .queries("stats_ks_test")(spark, fixtureDir).head()
    assert(row.getLong(row.fieldIndex("n_a")) === 4L)
    assert(row.getLong(row.fieldIndex("n_b")) === 2L)
    assert(row.getDouble(row.fieldIndex("ks_d")) === 0.5)
  }
}
