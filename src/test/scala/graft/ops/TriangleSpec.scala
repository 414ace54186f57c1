package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** g2_triangle_count semantics: degree-ordered orientation must count
  * every triangle exactly once and credit all three corners. The
  * constructed co-occurrence graph is K4 plus a pendant edge — K4 holds
  * 4 triangles with every vertex on exactly 3 of them, and the pendant
  * vertices sit on none. */
class TriangleSpec extends SparkSuite {

  test("K4 plus a pendant edge: per-node triangle counts are exact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("g2spec").toString
    // each co-occurring order repeats 5x (distinct order keys) so every
    // edge clears the w >= 5 noise-pruning threshold
    (0L until 5L).flatMap(r => Seq(
      (10L + r, 1L), (10L + r, 2L), (10L + r, 3L), // clique {1,2,3}
      (30L + r, 1L), (30L + r, 2L), (30L + r, 4L), // clique {1,2,4}
      (20L + r, 3L), (20L + r, 4L),                // edge 3-4 -> union is K4
      (40L + r, 5L), (40L + r, 6L)                 // pendant edge, no triangles
    )).toDF("l_orderkey", "l_suppkey")
      .withColumn("l_shipdate", lit("2024-01-01").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = graft.queries.GraphPack.queries("g2_triangle_count")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 0L, 6L -> 0L))
  }
}
