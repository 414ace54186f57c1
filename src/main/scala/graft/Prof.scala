package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler. `runMain graft.Prof <q1> <q2> ...` times each named
  * query twice (second run is the warm, codegen-amortized number to trust);
  * `runMain graft.Prof all` sweeps every query once in bench order, which
  * INCLUDES first-run codegen cost — use it for ordering effects, not for
  * per-query regression calls. Not part of the driver contract. */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Tables.lineitem(spark, dir).limit(1000).count()
    SparkEntry.warm(spark, dir)
    val names: Seq[String] =
      if (args.headOption.contains("all")) SparkEntry.queries.keys.toSeq.sorted
      else args.toSeq.flatMap(q => Seq(q, q))
    for (q <- names) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).count()
      println(f"[prof] $q: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
