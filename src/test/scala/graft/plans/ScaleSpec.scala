package graft.plans

import graft.SparkSuite

class ScaleSpec extends SparkSuite {

  test("bucketed join plan has no shuffle Exchange between scan and join") {
    // force a sort-merge join (disable broadcast) to prove the bucketed
    // layout, not broadcast, is what eliminates the shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = graft.queries.ScalePack.queries("sc2_bucketed_join")(spark, sf)
      val physical = df.queryExecution.executedPlan.toString
      val joinIdx = physical.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, s"expected SortMergeJoin in:\n$physical")
      // the only exchange allowed in the whole plan is the final
      // aggregation's — the join inputs read bucketed scans directly
      val exchanges = "Exchange hashpartitioning".r.findAllIn(physical).length
      assert(exchanges <= 1, s"bucketed join should not shuffle its inputs:\n$physical")
      assert(physical.contains("Bucketed: true"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted aggregation equals plain aggregation") {
    import org.apache.spark.sql.functions._
    val salted = graft.queries.ScalePack.queries("sc1_salted_agg")(spark, sf)
    val plain = graft.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_rows"))
    assert(salted.exceptAll(plain).count() === 0L)
    assert(plain.exceptAll(salted).count() === 0L)
  }
}
