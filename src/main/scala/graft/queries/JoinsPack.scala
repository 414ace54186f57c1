package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}

/** Joins (SURVEY §2.3 J1–J4 + the wider Spark join surface).
  *
  * Scale notes: every dim side here is broadcast (≤ a few thousand rows ⇒
  * BroadcastHashJoin, no shuffle of the fact side). At 100 TB the same
  * queries hold: dims stay small; fact-fact joins (j7) shuffle on the join
  * key and AQE handles skew.
  */
object JoinsPack extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // J1: left equi-join fact×dim on a normalized string key —
    // lower(trim(cast)) both sides (glue.py:131-134). Dim = per-segment
    // aggregate, fact = customer.
    "j1_normalized_key_join" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
      val dim = cust
        .groupBy(lower(trim(col("c_mktsegment"))).as("seg_key"))
        .agg(count(lit(1)).as("seg_count"))
      cust
        .withColumn("join_key", lower(trim(col("c_mktsegment"))))
        .join(broadcast(dim), col("join_key") === col("seg_key"), "left")
        .select("c_custkey", "c_mktsegment", "seg_count")
    }),

    // J2: left equi-join on differing key names (eda cell 7
    // merge(left_on='ticker', right_on='codigo')).
    "j2_diff_key_names" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
        .select("c_custkey", "c_name", "n_name", "n_regionkey")
    }),

    // J3: agg-result re-join ×3 grains (preprocessing.py:104-106):
    // per-(nation) distinct segments, per-(nation) customer count,
    // per-(region-of-nation) nation count, all joined back on the fact.
    "j3_agg_rejoin" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val perNationSegs = c.groupBy(col("c_nationkey").as("nk1"))
        .agg(countDistinct(col("c_mktsegment")).as("n_segments"))
      val perNationCust = c.groupBy(col("c_nationkey").as("nk2"))
        .agg(count(lit(1)).as("n_customers"))
      val perRegionNations = n.groupBy(col("n_regionkey").as("rk"))
        .agg(countDistinct(col("n_nationkey")).as("n_nations"))
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
        .join(broadcast(perNationSegs), col("c_nationkey") === col("nk1"), "left")
        .join(broadcast(perNationCust), col("c_nationkey") === col("nk2"), "left")
        .join(broadcast(perRegionNations), col("n_regionkey") === col("rk"), "left")
        .select("c_custkey", "c_nationkey", "n_regionkey", "n_segments",
          "n_customers", "n_nations")
    }),

    // Left-semi join: orders having at least one lineitem (EXISTS).
    "j5_semi_join" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir).filter(col("l_quantity") > 45)
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
        .select("o_orderkey", "o_totalprice")
    }),

    // Left-anti join: orders with no such lineitem (NOT EXISTS).
    "j6_anti_join" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir).filter(col("l_quantity") > 45)
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left_anti")
        .select("o_orderkey", "o_orderstatus")
    }),

    // Inner fact-fact join + aggregate (shuffle join; AQE-coalesced).
    "j7_inner_join_agg" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir)
      l.join(o, l("l_orderkey") === o("o_orderkey"), "inner")
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_lines"),
          sum(col("l_quantity")).as("sum_qty"))
    }),

    // Full-outer join over aggregated sides (key sets differ by filter).
    "j8_full_outer" -> ((s, dir) => {
      val a = Tables.customer(s, dir).filter(col("c_nationkey") < 15)
        .groupBy(col("c_nationkey").as("k")).agg(count(lit(1)).as("n_cust"))
      val b = Tables.supplier(s, dir).filter(col("s_nationkey") >= 5)
        .groupBy(col("s_nationkey").as("k")).agg(count(lit(1)).as("n_supp"))
      a.join(b, Seq("k"), "full_outer")
        .select(col("k"), col("n_cust"), col("n_supp"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "j1_normalized_key_join" ->
      """WITH dim AS (
        |  SELECT lower(trim(c_mktsegment)) AS seg_key, count(*) AS seg_count
        |  FROM customer GROUP BY 1
        |)
        |SELECT c.c_custkey, c.c_mktsegment, d.seg_count
        |FROM customer c LEFT JOIN dim d
        |  ON lower(trim(c.c_mktsegment)) = d.seg_key""".stripMargin,
    "j2_diff_key_names" ->
      """SELECT c.c_custkey, c.c_name, n.n_name, n.n_regionkey
        |FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey""".stripMargin,
    "j3_agg_rejoin" ->
      """WITH segs AS (
        |  SELECT c_nationkey AS nk, count(DISTINCT c_mktsegment) AS n_segments
        |  FROM customer GROUP BY 1
        |), custs AS (
        |  SELECT c_nationkey AS nk, count(*) AS n_customers
        |  FROM customer GROUP BY 1
        |), regs AS (
        |  SELECT n_regionkey AS rk, count(DISTINCT n_nationkey) AS n_nations
        |  FROM nation GROUP BY 1
        |)
        |SELECT c.c_custkey, c.c_nationkey, n.n_regionkey,
        |       s.n_segments, cu.n_customers, r.n_nations
        |FROM customer c
        |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        |LEFT JOIN segs s ON c.c_nationkey = s.nk
        |LEFT JOIN custs cu ON c.c_nationkey = cu.nk
        |LEFT JOIN regs r ON n.n_regionkey = r.rk""".stripMargin,
    "j5_semi_join" ->
      """SELECT o_orderkey, o_totalprice FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)""".stripMargin,
    "j6_anti_join" ->
      """SELECT o_orderkey, o_orderstatus FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)""".stripMargin,
    "j7_inner_join_agg" ->
      """SELECT o.o_orderpriority, count(*) AS n_lines,
        |       sum(l.l_quantity) AS sum_qty
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1""".stripMargin,
    "j8_full_outer" ->
      """WITH a AS (
        |  SELECT c_nationkey AS k, count(*) AS n_cust FROM customer
        |  WHERE c_nationkey < 15 GROUP BY 1
        |), b AS (
        |  SELECT s_nationkey AS k, count(*) AS n_supp FROM supplier
        |  WHERE s_nationkey >= 5 GROUP BY 1
        |)
        |SELECT COALESCE(a.k, b.k) AS k, a.n_cust, b.n_supp
        |FROM a FULL OUTER JOIN b ON a.k = b.k""".stripMargin
  )
}
