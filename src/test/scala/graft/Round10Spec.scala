package graft

import org.apache.spark.sql.functions._

/** Invariants for the r10 adds beyond the DuckDB hash-match:
  * temperature-mix budget exactness, sessionization partition laws,
  * n-gram novelty bounds, and NDCG ordering properties. Runs on sf0.001. */
class Round10Spec extends SparkSuite {

  test("c17 temperature mix allocates the budget exactly, with exact isqrt weights") {
    val r = graft.queries.CurationPack.queries("c17_temperature_mix")(spark, sf)
      .cache()
    val total = r.agg(sum(col("alloc_tokens"))).head().getLong(0)
    assert(total == 1000000L,
      s"largest-remainder allocation must sum to the budget exactly, got $total")
    // weight is the exact integer sqrt: w² ≤ mass < (w+1)²
    assert(r.filter(col("weight") * col("weight") > col("mass") ||
      (col("weight") + 1) * (col("weight") + 1) <= col("mass")).count() == 0,
      "weight must be floor(sqrt(mass)) exactly")
    // largest-remainder quotas never deviate from the real quota by ≥ 1
    val w = r.agg(sum(col("weight"))).head().getLong(0)
    val off = r.filter(
      abs(col("alloc_tokens") * w - lit(1000000L) * col("weight")) > w)
    assert(off.count() == 0, "per-source quota must be within 1 of T*w/W")
    r.unpersist()
  }

  test("x12 sessions partition each user's events and respect the 30-min gap") {
    val sess = graft.queries.ExtendedPack.queries("x12_sessionization")(spark, sf)
      .cache()
    val nEvents = Tables.events(spark, sf).count()
    assert(sess.agg(sum(col("n_events"))).head().getLong(0) == nEvents,
      "every event lands in exactly one session")
    assert(sess.filter(col("duration_s") < 0).count() == 0)
    // consecutive sessions of the same user are separated by > 30 min
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("session_idx")
    val gaps = sess.withColumn("prev_end", lag(col("end_us"), 1).over(w))
      .filter(col("prev_end").isNotNull)
    assert(gaps.filter(col("start_us") - col("prev_end") <= 1800000000L)
      .count() == 0, "a new session implies a gap strictly over 30 minutes")
    sess.unpersist()
  }

  test("t25 novelty is a bounded per-doc ratio over candidate docs only") {
    val r = graft.queries.TextPack.queries("t25_ngram_novelty")(spark, sf)
      .cache()
    assert(r.filter(pmod(col("doc_id"), lit(2)) =!= 1).count() == 0,
      "only candidate (odd doc_id) docs are scored")
    assert(r.filter(col("n_novel") > col("n_grams") ||
      col("n_novel") < 0).count() == 0)
    assert(r.filter(col("novelty") < 0.0 || col("novelty") > 1.0).count() == 0)
    // spot-check one doc against a direct recomputation
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
      .collect().map(row => row.getLong(0) ->
        row.getSeq[String](1).sliding(3).filter(_.size == 3)
          .map(_.mkString(" ")).toVector).toMap
    val refGrams = docs.filter(_._1 % 2 == 0).values.flatten.toSet
    val someDoc = r.select("doc_id", "n_grams", "n_novel").head()
    val grams = docs(someDoc.getLong(0))
    assert(grams.size.toLong == someDoc.getLong(1))
    assert(grams.count(g => !refGrams(g)).toLong == someDoc.getLong(2))
    r.unpersist()
  }

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    (df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }).toString
  }

  test("x12 plan pin: one user-keyed exchange carries windows AND the session agg") {
    val rendered = finalPlan(
      graft.queries.ExtendedPack.queries("x12_sessionization")(spark, sf))
    assert("Exchange hashpartitioning".r.findAllIn(rendered).size == 1,
      s"lag + prefix sum + per-session agg must share ONE user_id " +
        s"partitioning, got:\n$rendered")
  }

  test("ml_ndcg plan pin: no window operator anywhere (range-sort ranks only)") {
    val rendered = finalPlan(
      graft.queries.MlPack.queries("ml_ndcg")(spark, sf))
    assert(!rendered.contains("Window"),
      s"global ranks must come from the range-sort primitive, never a " +
        s"one-task window:\n$rendered")
  }

  test("d16 plan pin: the membership probe is a literal predicate, not a join") {
    val q = graft.queries.DedupPack.queries("d16_bloom_dedup")(spark, sf)
    val rendered = finalPlan(q)
    assert(rendered.contains("might_contain"),
      s"bloom probe must ride the plan as a scalar predicate:\n$rendered")
    // exactly the ONE exact-verification join (flagged slice vs history
    // digests) — the unflagged branch must reach the union join-free
    assert("Join".r.findAllIn(rendered).size <= 2, // left_anti renders once; AQE may reprint
      s"only the flagged slice may pay a join:\n$rendered")
  }

  test("ml_ndcg is bounded by 1 and IDCG dominates DCG") {
    val row = graft.queries.MlPack.queries("ml_ndcg")(spark, sf).head()
    val (dcg, idcg) = (row.getAs[Long]("dcg_e12"), row.getAs[Long]("idcg_e12"))
    val ndcg = row.getAs[Double]("ndcg")
    assert(idcg > 0 && dcg <= idcg, "ideal ordering maximizes DCG")
    assert(ndcg >= 0.0 && ndcg <= 1.0)
    assert(row.getAs[Long]("n_pos_at_k") <= 100)
  }
}
