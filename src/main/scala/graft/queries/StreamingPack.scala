package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.QueryPack
import graft.streaming.Streams

/** Structured Streaming operators (SURVEY §2.8 extension surface). Both
  * results are deterministic sets, so they oracle-check against plain
  * batch SQL over the same fixture — the streaming and batch semantics
  * must agree on bounded input.
  */
object StreamingPack extends QueryPack {

  /** st11's exact per-day distinct checker is the memoized a17 truth,
    * and st13's historical digest index is a one-time on-disk artifact —
    * both pre-paid here so timed runs measure the streaming paths. */
  override def warm(s: SparkSession, dir: String): Unit = {
    AggPack.hllExactCounts(s, dir)
    Streams.ensureDocDigestIndex(s, dir)
    ()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st1_stream_dedup" -> ((s, dir) => Streams.dedupKeys(s, dir)),
    "st2_stream_window_agg" -> ((s, dir) => Streams.dailyAgg(s, dir)),

    // dropDuplicatesWithinWatermark: watermark-evicted dedup state — the
    // variant that stays bounded on an unbounded key space (st1's plain
    // dropDuplicates keeps every key forever).
    "st9_stream_dedup_within_wm" -> ((s, dir) =>
      Streams.dedupKeysWithinWatermark(s, dir)),
    "st3_stateful_totals" -> ((s, dir) => Streams.statefulUserTotals(s, dir)),

    // Stream-stream inner join (watermarked, time-range-bounded state).
    "st5_stream_stream_join" -> ((s, dir) => Streams.clickPurchaseJoin(s, dir)),

    // Stream-stream LEFT OUTER join: unmatched clicks flush with null
    // purchases when the watermark passes their window (sentinel-advanced
    // on the bounded fixture) — the state-eviction semantics st5's inner
    // join never exercises.
    "st10_stream_outer_join" -> ((s, dir) =>
      Streams.clickPurchaseOuterJoin(s, dir)),

    // Stream-static broadcast enrichment (stateless dimension join per
    // micro-batch feeding a stateful aggregation).
    "st8_stream_static_join" -> ((s, dir) => Streams.streamStaticEnrich(s, dir)),

    // foreachBatch → day-partitioned parquet, dynamic partition overwrite
    // (the reference's idempotent lookback upsert); reads the sink back.
    "st6_foreachbatch_sink" -> ((s, dir) => Streams.foreachBatchSink(s, dir)),

    // transformWithState (Spark 4 arbitrary-state API): same running
    // totals as st3's flatMapGroupsWithState — the two stateful APIs
    // cross-check against the identical batch oracle.
    "st7_transform_with_state" -> ((s, dir) =>
      Streams.transformWithStateTotals(s, dir)),

    // Streaming windowed approximate distinct: the Datasketches HLL
    // partial aggregate IS the per-window state, so state is fixed-width
    // per day where exact distinct would hold every user id. Frame:
    // per-day estimate within 5% of the exact count the oracle
    // recomputes — the exact checker is the MEMOIZED a17 truth set, paid
    // in warm (code-review r9: the inline countDistinct re-scanned
    // events on every timed invocation).
    "st11_stream_approx_distinct" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      import s.implicits._
      val approx = Streams.dailyApproxDistinct(s, dir)
      val (dayExact, _) = AggPack.hllExactCounts(s, dir)
      val exactDf = dayExact.toSeq.toDF("day", "exact_users")
      approx.join(broadcast(exactDf), "day")
        .select(col("day"), col("exact_users"),
          (abs(col("approx_users") - col("exact_users")) /
            col("exact_users") <= 0.05).as("within_rel_005"))
    }),

    // STREAMING session_window under a watermark (append mode): per-user
    // session state merges as events arrive and emits when the watermark
    // passes the session close — st4's assignment made genuinely
    // incremental. Sentinel-advanced watermark on the bounded fixture
    // (the st10 recipe); output equals the batch sessionization.
    "st12_stream_sessionize" -> ((s, dir) => Streams.streamingSessions(s, dir)),

    // Streaming incremental dedup vs a persisted historical digest index
    // (the d9 daily-append dedup pattern, streamed): within-stream
    // dropDuplicates state + a per-micro-batch LEFT ANTI join against
    // the on-disk index artifact. Output = first-seen digest set.
    "st13_stream_incremental_dedup" -> ((s, dir) =>
      Streams.streamIncrementalDedup(s, dir)),

    // d16's streaming twin: the historical membership check as a Bloom
    // PREFILTER — sketch-negative digests skip the index (map-only, no
    // FN), only the flagged sliver pays the per-micro-batch anti join.
    // Output contract identical to st13, so the same oracle shape holds.
    "st15_stream_bloom_dedup" -> ((s, dir) =>
      Streams.streamBloomDedup(s, dir)),

    // Streaming trending-items: the stream maintains watermarked
    // per-(day, type) counts; top-3-per-day ranks DOWNSTREAM over the
    // (windows x types)-sized sink table — ranking can't ride inside an
    // open streaming aggregate, so production splits exactly here.
    "st14_stream_topk" -> ((s, dir) => Streams.dailyTopK(s, dir)),

    // Streaming tick→OHLC bars — w20's streaming twin: open/close are the
    // same sort-free min/max(struct) argmin/argmax, merged per
    // micro-batch as ordinary agg state (O(bars), never O(ticks)).
    "st16_stream_ohlc" -> ((s, dir) => Streams.streamOhlc(s, dir)),

    // session_window (30-min gap) in batch mode — the built-in session
    // assignment; agrees with the composed lag/running-sum sessionization
    // (tj3), which is what the oracle expresses. Boundary semantics: an
    // event at EXACTLY prev + gap still merges (Spark merges while
    // sessionStart <= currentEnd), so the oracle gap test is strict >.
    "st4_session_window" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      graft.Tables.events(s, dir)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), min(col("ts")).as("session_start"))
        .select(col("user_id"), col("session_start"), col("n_events"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "st1_stream_dedup" ->
      "SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events",
    "st9_stream_dedup_within_wm" ->
      "SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events",
    "st2_stream_window_agg" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2""".stripMargin,
    "st3_stateful_totals" ->
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
        |FROM events GROUP BY user_id""".stripMargin,
    "st7_transform_with_state" ->
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
        |FROM events GROUP BY user_id""".stripMargin,
    "st5_stream_stream_join" ->
      """SELECT a.user_id, a.event_id AS click_id, b.event_id AS purchase_id
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND a.event_type = 'click' AND b.event_type = 'purchase'
        | AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR""".stripMargin,
    "st6_foreachbatch_sink" ->
      "SELECT event_id, user_id, CAST(ts AS DATE) AS day, value FROM events",
    "st10_stream_outer_join" ->
      """SELECT a.user_id, a.event_id AS click_id, b.event_id AS purchase_id
        |FROM events a LEFT JOIN events b
        |  ON a.user_id = b.user_id AND b.event_type = 'purchase'
        | AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
        |WHERE a.event_type = 'click'""".stripMargin,
    "st8_stream_static_join" ->
      """SELECT c_mktsegment, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1""".stripMargin,
    "st13_stream_incremental_dedup" ->
      """SELECT DISTINCT md5(text) AS digest
        |FROM documents
        |WHERE md5(text) NOT IN (
        |  SELECT md5(text) FROM documents WHERE doc_id % 7 <> 0)""".stripMargin,
    "st15_stream_bloom_dedup" ->
      """SELECT DISTINCT md5(text) AS digest
        |FROM documents
        |WHERE md5(text) NOT IN (
        |  SELECT md5(text) FROM documents WHERE doc_id % 7 <> 0)""".stripMargin,
    // the 1-day tumbling window is UTC-midnight-aligned, so window.start
    // = CAST(ts AS DATE) and the oracle is exactly the batch w20 SQL
    "st16_stream_ohlc" ->
      """WITH ev AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
        |    CAST(ts AS DATE) AS day
        |  FROM events
        |), r AS (
        |  SELECT user_id, day, c,
        |    row_number() OVER (PARTITION BY user_id, day
        |      ORDER BY ts, event_id) AS rf,
        |    row_number() OVER (PARTITION BY user_id, day
        |      ORDER BY ts DESC, event_id DESC) AS rl
        |  FROM ev
        |)
        |SELECT user_id, day,
        |  CAST(max(CASE WHEN rf = 1 THEN c END) AS BIGINT) AS open_cents,
        |  CAST(max(c) AS BIGINT) AS high_cents,
        |  CAST(min(c) AS BIGINT) AS low_cents,
        |  CAST(max(CASE WHEN rl = 1 THEN c END) AS BIGINT) AS close_cents,
        |  CAST(sum(c) AS BIGINT) AS volume_cents,
        |  CAST(count(*) AS BIGINT) AS n_ticks
        |FROM r GROUP BY 1, 2""".stripMargin,
    "st14_stream_topk" ->
      """WITH c AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT day, event_type, n, rk FROM (
        |  SELECT day, event_type, n,
        |    row_number() OVER (PARTITION BY day
        |      ORDER BY n DESC, event_type) AS rk
        |  FROM c)
        |WHERE rk <= 3""".stripMargin,
    "st12_stream_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts, 1) OVER w IS NULL THEN 1
        |         WHEN ts > lag(ts, 1) OVER w + INTERVAL 30 MINUTE THEN 1
        |         ELSE 0 END AS gap
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sess AS (
        |  SELECT user_id, ts,
        |    sum(gap) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM g
        |)
        |SELECT user_id, min(ts) AS session_start, count(*) AS n_events
        |FROM sess GROUP BY user_id, sid""".stripMargin,
    "st11_stream_approx_distinct" ->
      """SELECT CAST(ts AS DATE) AS day,
        |  count(DISTINCT user_id) AS exact_users,
        |  true AS within_rel_005
        |FROM events GROUP BY 1""".stripMargin,
    "st4_session_window" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts, 1) OVER w IS NULL THEN 1
        |         WHEN ts > lag(ts, 1) OVER w + INTERVAL 30 MINUTE THEN 1
        |         ELSE 0 END AS gap
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sess AS (
        |  SELECT user_id, ts,
        |    sum(gap) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM g
        |)
        |SELECT user_id, min(ts) AS session_start, count(*) AS n_events
        |FROM sess GROUP BY user_id, sid""".stripMargin
  )
}
