package graft.plans

import graft.{SparkSuite, SparkEntry, Tables}

/** Physical-plan audit for the properties the 100 TB design depends on:
  * pushdown reaching the scan, column pruning, broadcast choices, and
  * whole-stage codegen on the hot map-only paths. These are the same
  * checks `graft.Explain` prints for humans, pinned as assertions.
  */
class PlanAuditSpec extends SparkSuite {

  private def executedString(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect()
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
  }

  test("s1: filter is pushed to the parquet scan and columns are pruned") {
    val plan = executedString("s1_pruned_scan")
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("GreaterThan") || plan.contains("IsNotNull"), plan)
    // the scan schema must not include unprojected columns
    assert(!plan.contains("o_orderpriority"), plan)
  }

  test("j1: dimension join is a broadcast hash join, not a shuffle join") {
    val plan = executedString("j1_normalized_key_join")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("a14: referential-integrity check anti-joins via broadcast") {
    val plan = executedString("a14_quality_checks")
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"), plan)
  }

  test("sc6: bloom pre-filter keeps the semi-join broadcast") {
    val plan = executedString("sc6_bloom_prefilter")
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"), plan)
  }

  test("text scan is map-only with codegen spans, no exchange") {
    val plan = executedString("t2_quality_score")
    // treeString marks whole-stage-codegen operators with "*(n)"; the HOF
    // lambdas (filter/transform) are codegen-fallback, so a plain Project
    // between spans is expected — but nothing may shuffle.
    assert(plan.contains("*("), plan)
    assert(!plan.contains("Exchange"), plan)
  }

  test("window family shares one exchange+sort for all features") {
    val plan = executedString("w2_lags")
    val exchanges = "Exchange ".r.findAllIn(plan).size
    val sorts = "Sort ".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected one exchange, got $exchanges:\n$plan")
    assert(sorts == 1, s"expected one sort, got $sorts:\n$plan")
  }

  test("x5 grouping sets expands once — a single aggregation shuffle") {
    val plan = executedString("x5_grouping_sets")
    assert(plan.contains("Expand"), plan)
    val exchanges = "Exchange ".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected one exchange, got $exchanges:\n$plan")
  }

  test("t6: the corpus-size scalar is broadcast, never a shuffled join side") {
    val plan = executedString("t6_tfidf")
    // the 1-row n_docs aggregate must attach via a broadcast (nested-loop
    // for the true cross join), not re-shuffle the tf side; and the
    // top-3-per-doc ranking is one window sort.
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    val windows = "Window".r.findAllIn(plan).size
    assert(windows >= 1, plan)
  }
}
