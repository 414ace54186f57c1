package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite

class DotFSpec extends SparkSuite {

  private def df = {
    import spark.implicits._
    Seq(
      (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),   // 32.0
      (2L, Array(0.5f, -0.5f), Array(2.0f, 2.0f)),              // 0.0
      (3L, Array.empty[Float], Array.empty[Float])              // 0.0
    ).toDF("id", "a", "b")
  }

  test("graft_dotf matches the manual double fold (codegen path)") {
    DotF.register(spark)
    val got = df.select(col("id"), call_function("graft_dotf", col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === Map(1L -> 32.0, 2L -> 0.0, 3L -> 0.0))
  }

  test("graft_dotf agrees with the previous zip_with/aggregate fold on random vectors") {
    import spark.implicits._
    DotF.register(spark)
    val rnd = new scala.util.Random(7)
    val rows = (0 until 50).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() - 0.5f), Array.fill(64)(rnd.nextFloat() - 0.5f))
    }.toDF("id", "a", "b")
    val hof = aggregate(
      zip_with(col("a"), col("b"), (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val bad = rows
      .select(call_function("graft_dotf", col("a"), col("b")).as("native"), hof.as("hof"))
      .filter(col("native") =!= col("hof")) // bit-exact: same fold order
      .count()
    assert(bad === 0L)
  }

  test("null array and null element both yield NULL") {
    import spark.implicits._
    DotF.register(spark)
    val rows = Seq(
      (1L, Some(Array(1.0f)), None: Option[Array[Float]]),
      (2L, Some(Array(1.0f)), Some(Array(1.0f)))
    ).toDF("id", "a", "b")
    val got = rows.select(col("id"),
        call_function("graft_dotf", col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(got === Map(1L -> true, 2L -> false))
    // null ELEMENT via SQL literal arrays
    val el = spark.sql(
      "SELECT graft_dotf(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS d")
    assert(el.collect()(0).isNullAt(0))
  }
}
