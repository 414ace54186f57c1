package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Multi-batch semantics of the st9 dedup operator that the single-batch
  * oracle check cannot see: `dropDuplicatesWithinWatermark` must (a) drop
  * duplicates that arrive within the watermark delay of each other even
  * across micro-batches, and (b) EVICT a key's state once the watermark
  * passes its expiration, so a late re-occurrence re-emits — the property
  * that keeps state bounded on an unbounded key space (plain
  * `dropDuplicates` would hold every key forever and emit A exactly once).
  */
class StreamingSemanticsSpec extends SparkSuite {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("dropDuplicatesWithinWatermark dedups across batches and evicts by watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(String, Timestamp)]
    val deduped = in.toDF().toDF("k", "ts")
      .withWatermark("ts", "1 day")
      .dropDuplicatesWithinWatermark("k")
    val q = deduped.writeStream.format("memory").queryName("graft_ddww_spec")
      .outputMode("append").start()
    try {
      // batch 1: duplicate inside one batch — one A, one B survive
      in.addData(("A", ts("2024-01-01 10:00:00")),
        ("A", ts("2024-01-01 10:30:00")), ("B", ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      // batch 2: duplicate across batches, still within the 1-day delay
      in.addData(("A", ts("2024-01-01 11:00:00")))
      q.processAllAvailable()
      val mid = spark.table("graft_ddww_spec").groupBy("k").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(mid === Map("A" -> 1L, "B" -> 1L),
        s"within-delay duplicates must collapse to one row per key: $mid")
      // batch 3: an unrelated key far in the future advances the watermark
      // past A's expiration (first-seen + 1 day), evicting A's state row
      in.addData(("C", ts("2024-01-05 00:00:00")))
      q.processAllAvailable()
      // batch 4: A re-occurs AFTER eviction — within-watermark dedup makes
      // no guarantee across the gap, and the bounded-state contract means
      // it must re-emit rather than dedup against evicted state
      in.addData(("A", ts("2024-01-05 01:00:00")))
      q.processAllAvailable()
      val fin = spark.table("graft_ddww_spec").groupBy("k").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(fin === Map("A" -> 2L, "B" -> 1L, "C" -> 1L),
        s"evicted key must re-emit on re-occurrence: $fin")
    } finally q.stop()
  }
}
