package graft

import org.apache.spark.sql.functions._

/** Estimate-quality and invariant pins for the KMV Jaccard sketch and
  * the calibration/ECE table — the parts the DuckDB oracle (which
  * replays the same deterministic recipe) cannot independently vouch
  * for. */
class SketchCalibrationSpec extends SparkSuite {

  test("a19 KMV Jaccard estimates sit within 4 SE of the true overlap") {
    val est = SparkEntry.queries("a19_kmv_jaccard")(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(est.size === 10, "5 types -> 10 unordered pairs")
    est.foreach { case ((a, b), (kUsed, shared, j)) =>
      assert(kUsed > 0 && kUsed <= 64 && shared <= kUsed && a < b)
      assert(j >= 0.0 && j <= 1.0)
    }
    // true Jaccard of the per-type user sets
    val sets = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id")).distinct().collect()
      .groupBy(_.getString(0))
      .map { case (t, rs) => t -> rs.map(_.getLong(1)).toSet }
    est.foreach { case ((a, b), (_, _, j)) =>
      val (sa, sb) = (sets(a), sets(b))
      val truth = sa.intersect(sb).size.toDouble / sa.union(sb).size
      // k = 64 -> SE ≈ √(J(1−J)/64) ≤ 0.0625; 4 SE = 0.25
      assert(math.abs(j - truth) <= 0.25,
        s"pair ($a,$b): est $j vs true $truth")
    }
  }

  test("ml_calibration bins partition the sample and ECE reconciles") {
    val rows = SparkEntry.queries("ml_calibration")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    val n = Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "purchase")).count()
    assert(rows.map(_._2).sum === n, "bins partition the scored sample")
    assert(rows.map(_._1).distinct.length === rows.length)
    rows.foreach { case (bin, nb, acc, conf, _) =>
      assert(bin >= 0 && bin <= 9 && nb > 0)
      assert(acc >= 0.0 && acc <= 1.0)
      // mean confidence must fall inside its own bin's width (bin 9
      // absorbs the top edge)
      assert(conf >= bin / 10.0 - 1e-9 &&
        conf <= (if (bin == 9) 1.0 else (bin + 1) / 10.0) + 1e-9,
        s"bin $bin mean_conf $conf outside its width")
    }
    // ECE reconciles with the weighted per-bin gaps it summarizes
    val ece = rows.head._5
    assert(rows.forall(_._5 == ece), "ECE is a single broadcast scalar")
    val recomputed = rows.map { case (_, nb, acc, conf, _) =>
      nb.toDouble / n * math.abs(acc - conf)
    }.sum
    assert(math.abs(ece - recomputed) <= 1e-9, s"$ece vs $recomputed")
  }
}
