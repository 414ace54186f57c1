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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st1_stream_dedup" -> ((s, dir) => Streams.dedupKeys(s, dir)),
    "st2_stream_window_agg" -> ((s, dir) => Streams.dailyAgg(s, dir)),
    "st3_stateful_totals" -> ((s, dir) => Streams.statefulUserTotals(s, dir))
  )

  def oracleSql: Map[String, String] = Map(
    "st1_stream_dedup" ->
      "SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events",
    "st2_stream_window_agg" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2""".stripMargin,
    "st3_stateful_totals" ->
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
        |FROM events GROUP BY user_id""".stripMargin
  )
}
