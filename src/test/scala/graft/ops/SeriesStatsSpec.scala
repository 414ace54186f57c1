package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Test-only reference fold: materializes each series to an array and runs
  * the pure [[SeriesStats.adfT]]/[[SeriesStats.ljungBoxQ]] on it. O(series)
  * memory per key — kept OUT of main so no production path holds a series
  * in memory; the production `adfLjungBoxAgg` is cross-checked against it
  * here. */
object SeriesStatsRef {
  case class Pt(user_id: Long, ts: Timestamp, event_id: Long, value: Double)
  case class Stats(user_id: Long, n: Long, mean: Double, adf_t: Double,
      ljung_box_q: Double, lb_lags: Int)

  def perSeries(spark: SparkSession, events: DataFrame, lags: Int = 10): Dataset[Stats] = {
    import spark.implicits._
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[Pt]
      .groupByKey(_.user_id)
      .flatMapSortedGroups($"ts", $"event_id") { (uid: Long, rows: Iterator[Pt]) =>
        val y = rows.map(_.value).toArray
        Iterator.single(Stats(uid, y.length.toLong, y.sum / y.length,
          SeriesStats.adfT(y), SeriesStats.ljungBoxQ(y, lags), lags))
      }
  }
}

class SeriesStatsSpec extends SparkSuite {

  private def series(uid: Long, vals: Seq[Double]) =
    vals.zipWithIndex.map { case (v, i) =>
      (uid, new Timestamp(1700000000000L + i * 60000L), i.toLong, v)
    }

  // deterministic LCG noise, 2-decimal quantized like the fixture values
  // (the agg path sums DECIMAL(18,2) casts, so the cross-check feeds both
  // paths data that is exactly representable there)
  private def noise(n: Int, seed: Long): Seq[Double] = {
    var s = seed
    (1 to n).map { _ =>
      s = s * 6364136223846793005L + 1442695040888963407L
      math.floor(((s >>> 11).toDouble / (1L << 53).toDouble - 0.5) * 100) / 100
    }
  }

  test("ADF t-stat is strongly negative for white noise, near zero for a random walk") {
    import spark.implicits._
    val wn = noise(300, 42L)
    val rw = wn.scanLeft(0.0)(_ + _).tail
    val df = (series(1L, wn) ++ series(2L, rw))
      .toDF("user_id", "ts", "event_id", "value")
    val st = SeriesStatsRef.perSeries(spark, df).collect().map(s => s.user_id -> s).toMap
    assert(st(1L).adf_t < -10.0, s"white noise should reject unit root, got ${st(1L).adf_t}")
    assert(st(2L).adf_t > -3.0, s"random walk should not strongly reject, got ${st(2L).adf_t}")
  }

  test("Ljung-Box Q is small for iid noise, large for a strongly autocorrelated series") {
    import spark.implicits._
    val wn = noise(300, 7L)
    val ar = wn.scanLeft(0.0)((prev, e) => 0.95 * prev + e).tail
    val df = (series(1L, wn) ++ series(2L, ar))
      .toDF("user_id", "ts", "event_id", "value")
    val st = SeriesStatsRef.perSeries(spark, df).collect().map(s => s.user_id -> s).toMap
    // chi2(10) 95% critical value ≈ 18.3
    assert(st(1L).ljung_box_q < 30.0)
    assert(st(2L).ljung_box_q > 100.0)
  }

  test("degenerate series produce NaN, not exceptions") {
    import spark.implicits._
    val df = (series(1L, Seq(1.0, 1.0, 1.0, 1.0)) ++ series(2L, Seq(5.0)))
      .toDF("user_id", "ts", "event_id", "value")
    val st = SeriesStatsRef.perSeries(spark, df).collect().map(s => s.user_id -> s).toMap
    assert(st(1L).adf_t.isNaN && st(2L).adf_t.isNaN)
  }

  test("production adfLjungBoxAgg matches the array-based reference fold") {
    import spark.implicits._
    val wn = noise(120, 11L)
    val ar = noise(200, 23L).scanLeft(0.0)((p, e) => math.floor((0.8 * p + e) * 100) / 100).tail
    val df = (series(1L, wn) ++ series(2L, ar))
      .toDF("user_id", "ts", "event_id", "value")
    val ref = SeriesStatsRef.perSeries(spark, df).collect().map(s => s.user_id -> s).toMap
    val agg = SeriesStats.adfLjungBoxAgg(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    for (uid <- Seq(1L, 2L)) {
      val (a, b) = (ref(uid), agg(uid))
      assert(b.getLong(1) == a.n)
      // agg output is r6-rounded; reference is unrounded → compare at 1e-5
      assert(math.abs(b.getDouble(3) - a.adf_t) < 1e-5,
        s"adf_t uid=$uid agg=${b.getDouble(3)} ref=${a.adf_t}")
      assert(math.abs(b.getDouble(4) - a.ljung_box_q) < 1e-5,
        s"lb_q uid=$uid agg=${b.getDouble(4)} ref=${a.ljung_box_q}")
    }
  }
}
