package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Knob-tuning harness for the sign-LSH scale path: measures recall@5 (on
  * a query sample, vs exact brute force) and wall-clock (on the full query
  * set) for candidate (bitsPerTable, probeDepth, numTables) settings at a
  * given corpus — typically the 10× ScaleProbe replica, where the adaptive
  * knobs actually engage. Evidence behind the defaults in
  * [[graft.ann.Similarity.lshTopK]]; not part of the driver contract.
  *
  * `runMain graft.AnnProbe [dir] [bits,depth,tables ...]`  (0 = auto)
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val variants: Seq[(Int, Int, Int)] =
      if (args.length > 1) args.drop(1).toSeq.map { a =>
        val p = a.split(","); (p(0).toInt, p(1).toInt, p(2).toInt)
      }
      else Seq((0, 0, 6), (0, 1, 6), (8, 1, 6), (0, 1, 12))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = Tables.embeddings(spark, dir)
    val n = e.count()
    val qAll = e.filter(pmod(col("vec_id"), lit(50)) === 0)   // timing set
    val qSample = e.filter(pmod(col("vec_id"), lit(500)) === 0) // recall set

    def sets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("qid", "cid").collect().groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val truth = sets(graft.ann.Similarity.bruteForceTopK(e, qSample, 5))
    println(s"[annprobe] corpus=$n, recall sample=${truth.size} queries")

    for ((bits, depth, tables) <- variants) {
      val found = sets(graft.ann.Similarity.lshTopK(
        spark, e, qSample, 5, numTables = tables,
        bitsPerTable = bits, probeDepth = depth))
      val recall = truth.map { case (q, t) =>
        found.getOrElse(q, Set.empty[Long]).intersect(t).size.toDouble / t.size
      }.sum / truth.size
      // warm once, then time the full query set twice, keep min
      def t(): Double = {
        val t0 = System.nanoTime()
        graft.ann.Similarity.lshTopK(spark, e, qAll, 5, numTables = tables,
          bitsPerTable = bits, probeDepth = depth)
          .queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      t()
      val sec = math.min(t(), t())
      println(f"[annprobe] bits=$bits depth=$depth tables=$tables -> recall@5=$recall%.3f time=$sec%.2f s")
    }
    spark.stop()
  }
}
