package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Laws for [[Lineage.pin]] — the r11 lineage-truncation primitive behind
  * the iterative ops (Components/KCore/Hits/g5). */
class LineageSpec extends SparkSuite {

  test("pin preserves rows and schema exactly") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, s"v$i", i * 0.5))
      .toDF("id", "s", "x")
      .filter(col("id") % 3 =!= 0)
    val expected = df.collect().map(_.toString).sorted
    val (pinned, release) = Lineage.pin(df)
    try {
      assert(pinned.schema == df.schema)
      assert(pinned.collect().map(_.toString).sorted.toSeq == expected.toSeq)
    } finally release()
  }

  test("pin truncates the plan to a checkpoint leaf") {
    import spark.implicits._
    val a = (1 to 50).map(i => (i.toLong, i.toLong % 7)).toDF("k", "g")
    val chained = a.groupBy("g").agg(sum("k").as("s"))
      .join(a, "g").groupBy("k").agg(max("s").as("m"))
    val (pinned, release) = Lineage.pin(chained)
    try {
      val plan = pinned.queryExecution.analyzed.toString
      assert(!plan.contains("Join"), s"lineage must be cut:\n$plan")
      assert(pinned.queryExecution.analyzed.children.isEmpty,
        "pinned plan must be a leaf")
    } finally release()
  }

  test("release drops the checkpoint blocks from the persistent-RDD census") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.size
    val (pinned, release) = Lineage.pin(
      (1 to 10).map(_.toLong).toDF("v").select(col("v") * 2))
    pinned.count()
    assert(spark.sparkContext.getPersistentRDDs.size > before,
      "pin must hold storage blocks while alive")
    release()
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      "release must return the census to its prior size")
  }
}
