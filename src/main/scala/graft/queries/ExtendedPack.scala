package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}

/** Analytics surface beyond the reference (engine completeness): pivot,
  * cube / grouping sets, generator (explode) output, and the full ranking
  * family. All builtins, all oracle-checked.
  */
object ExtendedPack extends QueryPack {

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Pivot: per-user event-type counts as columns (explicit value list →
    // deterministic schema, single-pass pivot aggregation).
    "x1_pivot" -> ((s, dir) => {
      val p = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .pivot("event_type", eventTypes)
        .count()
      eventTypes.foldLeft(p)((d, t) =>
        d.withColumn(t, coalesce(col(t), lit(0L))))
    }),

    // Cube: all grouping combinations over (returnflag, linestatus).
    "x2_cube" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))),

    // Generator / UDTF shape: posexplode of the token array (1-based
    // positions to match SQL subscripts).
    "x3_explode_tokens" -> ((s, dir) =>
      Tables.documents(s, dir)
        .filter(col("doc_id") < 20)
        .select(col("doc_id"),
          posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos0", "word")))
        .select(col("doc_id"), (col("pos0") + 1).cast("int").as("pos"), col("word"))),

    // Ranking family: rank / dense_rank / percent_rank / cume_dist / ntile
    // over a unique total order (deterministic across engines).
    "x4_ranking" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .withColumn("prnk", percent_rank().over(w))
        .withColumn("cdist", cume_dist().over(w))
        .withColumn("quartile", ntile(4).over(w))
        .filter(col("rnk") <= 50)
        .select("o_orderpriority", "o_orderkey", "rnk", "drnk", "prnk",
          "cdist", "quartile")
    }),

    // Wide-to-long melt (the inverse of pivot): map-side only — each input
    // row expands to 4 output rows with no shuffle anywhere.
    "x6_unpivot" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "metric", "val"))
  )

  def oracleSql: Map[String, String] = Map(
    "x1_pivot" ->
      """SELECT user_id,
        |  count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |  count(CASE WHEN event_type = 'view' THEN 1 END) AS view
        |FROM events GROUP BY user_id""".stripMargin,
    "x2_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |       sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,
    "x3_explode_tokens" ->
      """SELECT doc_id,
        |  CAST(generate_subscripts(ws, 1) AS INT) AS pos,
        |  unnest(ws) AS word
        |FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
        |      FROM documents WHERE doc_id < 20)""".stripMargin,
    "x4_ranking" ->
      """SELECT o_orderpriority, o_orderkey,
        |  rank() OVER w AS rnk,
        |  dense_rank() OVER w AS drnk,
        |  percent_rank() OVER w AS prnk,
        |  cume_dist() OVER w AS cdist,
        |  ntile(4) OVER w AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice DESC, o_orderkey)
        |QUALIFY rnk <= 50""".stripMargin,
    "x6_unpivot" ->
      """SELECT l_orderkey, l_linenumber, metric, val FROM (
        |  UNPIVOT (SELECT l_orderkey, l_linenumber, l_quantity,
        |           l_extendedprice, l_discount, l_tax FROM lineitem)
        |  ON l_quantity, l_extendedprice, l_discount, l_tax
        |  INTO NAME metric VALUE val)""".stripMargin
  )
}
