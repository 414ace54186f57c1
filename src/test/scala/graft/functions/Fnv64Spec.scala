package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite

class Fnv64Spec extends SparkSuite {

  test("expression matches the scala reference through codegen") {
    import spark.implicits._
    Fnv64.register(spark)
    val texts = Seq("", "a", "abc", "the quick brown fox", "ünïcødé ţêxt")
    val got = texts.toDF("t")
      .select(call_function("graft_fnv64", col("t")))
      .collect().map(_.getLong(0))
    val want = texts.map(Fnv64.hashString)
    assert(got.toSeq === want)
  }

  test("known FNV-1a vectors") {
    // published FNV-1a 64 test vectors
    assert(Fnv64.hashString("") === 0xcbf29ce484222325L)
    assert(Fnv64.hashString("a") === 0xaf63dc4c8601ec8cL)
    assert(Fnv64.hashString("foobar") === 0x85944171f73967e8L)
  }

  test("null propagates") {
    import spark.implicits._
    Fnv64.register(spark)
    val got = Seq(Some("x"), None).toDF("t")
      .select(call_function("graft_fnv64", col("t")))
      .collect()
    assert(!got(0).isNullAt(0) && got(1).isNullAt(0))
  }

  test("works in SQL and in a groupBy key (fingerprint dedup shape)") {
    import spark.implicits._
    Fnv64.register(spark)
    Seq("a" -> 1, "a" -> 2, "b" -> 3).toDF("t", "v").createOrReplaceTempView("fp_in")
    val got = spark.sql(
      "SELECT graft_fnv64(t) AS fp, count(*) AS n FROM fp_in GROUP BY 1 ORDER BY n DESC")
      .collect()
    assert(got.length === 2 && got(0).getLong(1) === 2L)
  }
}
