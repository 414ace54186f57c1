package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}

/** Iterative graph operators over the order network (customers ↔ suppliers
  * linked through orders⋈lineitem). Connected components (the other graph
  * primitive) lives with its dedup use-case as `d7_neardup_clusters`.
  *
  * g1 is PageRank in fixed-point arithmetic (graft.ops.PageRank): every
  * quantity is a 1e12-scaled BIGINT and every step truncating integer
  * math, so the five synchronous iterations are bit-identical across
  * engines and the oracle replays them as five unrolled CTEs — an EXACT
  * hash check on an iterative distributed algorithm, not an invariant
  * bound.
  */
object GraphPack extends QueryPack {

  private val SuppOffset = 1000000L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g1_pagerank" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
      val li = Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey")
      // bipartite edges, supplier ids shifted into their own namespace;
      // symmetrized so every node has an out-edge (no dangling sinks).
      // Noise-edge pruning before iterating (keep pairs co-occurring in
      // ≥ 2 lineitems): the standard graph-pipeline step that bounds the
      // message volume every subsequent round pays — on this fixture it
      // shrinks the edge set ~6×, and at 100 TB it is the difference
      // between iterating over signal and iterating over noise.
      val cs = o.join(li, o("o_orderkey") === li("l_orderkey"))
        .groupBy(col("o_custkey").cast("long").as("c"),
          (col("l_suppkey").cast("long") + SuppOffset).as("p"))
        .agg(count(lit(1)).as("w"))
        .filter(col("w") >= 2)
        .select("c", "p")
      val edges = cs.select(col("c").as("src"), col("p").as("dst"))
        .unionAll(cs.select(col("p").as("src"), col("c").as("dst")))
      // symmetrized graph ⇒ every node receives messages each round, so
      // the per-round completion join is skipped (allReceive)
      graft.ops.PageRank.run(s, edges, iters = 5, dampPct = 85,
        allReceive = true)
    })
  )

  def oracleSql: Map[String, String] = {
    val iterCtes = (1 to 5).map { k =>
      val prev = if (k == 1) "p0" else s"i${k - 1}"
      s"""i$k AS (
         |  SELECT nd.node,
         |    ((1000000000000 * 15) // 100) // (SELECT n FROM sc)
         |      + (85 * coalesce(m.s, 0)) // 100 AS pr
         |  FROM nodes nd LEFT JOIN (
         |    SELECT e.dst AS node, sum(p.pr // d.outdeg) AS s
         |    FROM sym e JOIN deg d ON e.src = d.src JOIN $prev p ON e.src = p.node
         |    GROUP BY e.dst) m ON nd.node = m.node
         |)""".stripMargin
    }.mkString(",\n")
    Map(
      "g1_pagerank" ->
        s"""WITH cs AS (
           |  SELECT o_custkey AS c, $SuppOffset + l_suppkey AS p
           |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
           |  GROUP BY 1, 2 HAVING count(*) >= 2
           |), sym AS (
           |  SELECT c AS src, p AS dst FROM cs
           |  UNION ALL
           |  SELECT p AS src, c AS dst FROM cs
           |), nodes AS (
           |  SELECT DISTINCT src AS node FROM sym
           |), deg AS (
           |  SELECT src, count(*) AS outdeg FROM sym GROUP BY src
           |), sc AS (
           |  SELECT count(*) AS n FROM nodes
           |), p0 AS (
           |  SELECT node, 1000000000000 // (SELECT n FROM sc) AS pr FROM nodes
           |),
           |$iterCtes
           |SELECT CAST(node AS BIGINT) AS node, CAST(pr AS BIGINT) AS pr
           |FROM i5""".stripMargin
    )
  }
}
