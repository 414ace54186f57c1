package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSuite

class SeqSourceSpec extends SparkSuite {

  private def read(rows: Int, slices: Int) =
    spark.read.format("graft.sources.SeqSource")
      .option("rows", rows).option("slices", slices).load()

  test("reads the requested rows with the declared schema") {
    val df = read(1000, 8)
    assert(df.schema.fieldNames.toSeq == Seq("id", "symbol", "price"))
    assert(df.count() == 1000)
    val r = df.filter(col("id") === 373).collect().head
    assert(r.getString(1) == SeqSource.symbolOf(373))
    assert(r.getDouble(2) == SeqSource.priceOf(373))
  }

  test("planInputPartitions controls read parallelism") {
    assert(read(1000, 8).rdd.getNumPartitions == 8)
    assert(read(5, 8).rdd.getNumPartitions == 5) // never more slices than rows
    assert(read(1000, 1).rdd.getNumPartitions == 1)
  }

  test("ids are exactly 0..n-1 across partition boundaries") {
    val ids = read(100, 7).select("id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (0L until 100L))
  }
}
