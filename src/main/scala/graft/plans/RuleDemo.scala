package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Demo main for the opt-in countDistinct→HLL rewrite: prints the
  * optimized plan and result with the rule off vs on.
  * Usage: runMain graft.plans.RuleDemo [sfDir]
  */
object RuleDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.install(spark)

    def q = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("distinct_parts"))

    spark.conf.set(ApproxDistinctRule.EnabledKey, "false")
    println("--- rule OFF (exact) ---")
    println(q.queryExecution.optimizedPlan.treeString.linesIterator.take(3).mkString("\n"))
    q.show()

    spark.conf.set(ApproxDistinctRule.EnabledKey, "true")
    println("--- rule ON (HLL++ sketch) ---")
    println(q.queryExecution.optimizedPlan.treeString.linesIterator.take(3).mkString("\n"))
    q.show()
    spark.stop()
  }
}
