package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
import graft.{QueryPack, Tables}

/** The remaining classic TPC-H query SHAPES (Q2/Q7/Q9/Q11/Q15/Q16/Q19/
  * Q20/Q21 analogues), adapted to the fixture's column subset — the
  * fixture has no partsupp table, no commit/receipt dates and no
  * shipmode, so supply cost derives from `p_retailprice`, "availability"
  * from shipped-quantity aggregates, and lateness is the established
  * ship-lag predicate (> 60 days after the order date, the h4/h12
  * convention). What each query exercises is the PLAN SHAPE the original
  * is famous for:
  *
  *   - h2:  correlated scalar-min subquery → decorrelated min-agg +
  *          equality re-join (never a per-row subquery execution)
  *   - h7:  two-nation pair predicate (disjunctive cross filter) over a
  *          double fact join, grouped by both nations and year
  *   - h9:  multi-term exact-decimal profit arithmetic per nation/year
  *   - h11: group HAVING against a GLOBAL scalar (1-row broadcast,
  *          exact-decimal cross-multiply — no division)
  *   - h15: agg view joined to its own MAX (1-row broadcast, exact
  *          decimal equality — the "create view revenue" shape)
  *   - h16: NOT-IN exclusion (broadcast LEFT ANTI) + count(DISTINCT)
  *          per group on the fact side
  *   - h19: three disjunctive (brand, size, quantity) branches tested
  *          INSIDE one broadcast join — no union of three scans
  *   - h20: nested per-(part,supplier) aggregate compared to the
  *          per-part total (cross-multiply), collapsed to a semi-join
  *   - h21: EXISTS + NOT-EXISTS pair decorrelated into ONE per-order
  *          aggregation (distinct-supplier and distinct-late-supplier
  *          counts) — the oracle replays the classic correlated form,
  *          so the driver proves the decorrelation exact
  *
  * All dimensions broadcast; the only shuffles are the fact joins and
  * the final aggregations. Revenue arithmetic follows the [[graft.Num]]
  * exact-decimal discipline (DECIMAL(28,4) accumulation, one cast to
  * double at the end) so engine summation order can't move the hash.
  */
object TpchPack2 extends QueryPack {

  private def revenue: Column =
    (col("l_extendedprice").cast(DecimalType(18, 2)) *
      (lit(1).cast(DecimalType(18, 2)) -
        col("l_discount").cast(DecimalType(18, 2)))).cast(DecimalType(28, 4))

  private def ts(s: String): Column = lit(s).cast("timestamp")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q2 analogue: min-cost supplier per part. The original's correlated
    // `WHERE cost = (SELECT min(cost) ... WHERE ps_partkey = p_partkey)`
    // decorrelates into one min-agg over the filtered fact slice plus an
    // equality re-join on (partkey, price) — parquet doubles compare
    // exactly, so the re-join loses nothing. Parts broadcast twice
    // (filter probe + name attach); suppliers and nations broadcast.
    "h2_min_cost_supplier" -> ((s, dir) => {
      val p = Tables.part(s, dir)
        .filter(col("p_type") === "SMALL" && col("p_size") <= 10)
        .select("p_partkey", "p_name")
      val l = Tables.lineitem(s, dir)
        .select("l_partkey", "l_suppkey", "l_extendedprice")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      val minPrice = l.groupBy(col("l_partkey").as("mk"))
        .agg(min(col("l_extendedprice")).as("min_price"))
      val sup = Tables.supplier(s, dir)
      val nat = Tables.nation(s, dir).select("n_nationkey", "n_name")
      l.join(minPrice, col("l_partkey") === col("mk") &&
          col("l_extendedprice") === col("min_price"))
        .select("l_partkey", "l_suppkey", "min_price", "p_name").distinct()
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_name"), col("n_name"), col("l_partkey"),
          col("p_name"), col("min_price"), col("s_acctbal"))
        .orderBy(col("l_partkey"), col("s_name"))
        .limit(100)
    }),

    // Q7 analogue: volume shipping between two nations — revenue where
    // the supplier sits in one of the pair and the customer in the
    // other, by (supp_nation, cust_nation, year). The pair predicate is
    // the disjunctive (n1,n2)|(n2,n1) filter applied AFTER both nation
    // attaches (each a 25-row broadcast); the fact side is the one
    // orders⋈lineitem shuffle.
    "h7_volume_shipping" -> ((s, dir) => {
      val nat = Tables.nation(s, dir).select("n_nationkey", "n_name")
      val sup = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
        .filter(col("supp_nation").isin("NATION_13", "NATION_19"))
      val cust = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
        .filter(col("cust_nation").isin("NATION_13", "NATION_19"))
      val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
      val l = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
          revenue.as("rev"))
      l.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .filter((col("supp_nation") === "NATION_13" &&
            col("cust_nation") === "NATION_19") ||
          (col("supp_nation") === "NATION_19" &&
            col("cust_nation") === "NATION_13"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate").cast("date")).cast(LongType).as("l_year"))
        .agg(sum(col("rev")).cast(DoubleType).as("revenue"))
    }),

    // Q9 analogue: product-type profit by supplier nation and year.
    // Supply cost proxies as 80% of the part's retail price (the fixture
    // has no partsupp): profit = Σ [extprice·(1−disc) −
    // 0.8·retailprice·qty], every term exact decimal until the final
    // cast. Parts (name-filtered) and nations broadcast; one fact-fact
    // shuffle for the order date.
    "h9_product_profit" -> ((s, dir) => {
      val p = Tables.part(s, dir)
        .filter(col("p_name").contains("gear"))
        .select(col("p_partkey"),
          (col("p_retailprice").cast(DecimalType(18, 2)) *
            lit(0.8).cast(DecimalType(2, 1))).as("supp_cost"))
      val nat = Tables.nation(s, dir).select("n_nationkey", "n_name")
      val sup = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      val o = Tables.orders(s, dir).select("o_orderkey", "o_orderdate")
      val l = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          revenue.as("rev"), col("l_quantity").cast(LongType).as("qty"))
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name"),
          year(col("o_orderdate").cast("date")).cast(LongType).as("o_year"))
        .agg(sum(col("rev") -
            (col("supp_cost") * col("qty")).cast(DecimalType(28, 4)))
          .cast(DoubleType).as("profit"))
    }),

    // Q11 analogue: important stock — per-part shipped value for one
    // nation's suppliers, keeping parts whose value exceeds 1/1000 of
    // the nation's total. The global total is a 1-row broadcast and the
    // comparison cross-multiplies in exact decimal (value·1000 > total)
    // — no division, no double drift, the h17/h22 discipline.
    "h11_important_stock" -> ((s, dir) => {
      val nat = Tables.nation(s, dir)
        .filter(col("n_name") === "NATION_3").select("n_nationkey")
      val sup = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      val l = Tables.lineitem(s, dir)
        .select(col("l_partkey"), col("l_suppkey"),
          col("l_extendedprice").cast(DecimalType(18, 2)).as("price"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      val perPart = l.groupBy(col("l_partkey"))
        .agg(sum(col("price")).as("value"))
      val total = perPart.agg(sum(col("value")).as("tot"))
      perPart.crossJoin(broadcast(total))
        .filter(col("value") * lit(1000) > col("tot"))
        .select(col("l_partkey"), col("value").cast(DoubleType).as("value"))
    }),

    // Q15 analogue: top supplier — quarterly revenue per supplier joined
    // to its own max. The revenue "view" computes once (cached across
    // the self-reference via the 1-row max broadcast); the equality is
    // on the exact DECIMAL(28,4) accumulator, so ties surface exactly
    // as the original's `WHERE total_revenue = (SELECT max(...))`.
    "h15_top_supplier" -> ((s, dir) => {
      // the explicit isNotNull is a no-op on the data but load-bearing
      // for the PLAN: the supplier join infers isnotnull(l_suppkey) on
      // the filter side only, which would make the two consumers of the
      // per-supplier agg canonically different and defeat exchange
      // reuse — with it, the quarter slice is scanned and aggregated
      // ONCE (ReusedExchange, pinned in PlanAuditSpec)
      val l = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= ts("1997-01-01") &&
          col("l_shipdate") < ts("1997-04-01") &&
          col("l_suppkey").isNotNull)
        .select(col("l_suppkey"), revenue.as("rev"))
      val rev = l.groupBy(col("l_suppkey"))
        .agg(sum(col("rev")).as("total_rev"))
      val mx = rev.agg(max(col("total_rev")).as("max_rev"))
      val sup = Tables.supplier(s, dir).select("s_suppkey", "s_name")
      rev.crossJoin(broadcast(mx))
        .filter(col("total_rev") === col("max_rev"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_rev").cast(DoubleType).as("total_rev"))
    }),

    // Q16 analogue: supplier-count per (brand, type, size) for parts
    // outside one brand/type, excluding complained-about suppliers
    // (account balance below 1000 stands in for the comment scan). The
    // NOT-IN subquery is a broadcast LEFT ANTI join on the fact side
    // BEFORE the distinct-count aggregation, so excluded suppliers
    // never reach the shuffle.
    "h16_supplier_cnt" -> ((s, dir) => {
      val p = Tables.part(s, dir)
        .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO")
        .select("p_partkey", "p_brand", "p_type", "p_size")
      val bad = Tables.supplier(s, dir)
        .filter(col("s_acctbal") < 1000).select("s_suppkey")
      val l = Tables.lineitem(s, dir).select("l_partkey", "l_suppkey")
        .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"),
          "left_anti")
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    }),

    // Q19 analogue: three disjunctive (brand, size, quantity) branches
    // evaluated INSIDE one broadcast hash join — one lineitem scan, one
    // 2000-row part broadcast, no union of three subplans. The quantity
    // bounds differ per branch, so the predicate can't factor out.
    "h19_disjunctive" -> ((s, dir) => {
      val p = Tables.part(s, dir).select("p_partkey", "p_brand", "p_size")
      val l = Tables.lineitem(s, dir)
        .select(col("l_partkey"), col("l_quantity"), revenue.as("rev"))
      val q = col("l_quantity")
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 5) &&
            q.between(1, 11)) ||
          (col("p_brand") === "Brand#13" && col("p_size").between(1, 10) &&
            q.between(10, 20)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 15) &&
            q.between(20, 30)))
        .agg(sum(col("rev")).cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // Q20 analogue: suppliers shipping the majority of some part — the
    // nested `ps_availqty > 0.5 * (SELECT sum(l_quantity) ...)` becomes
    // per-(part,supplier) quantity vs the per-part total, compared by
    // exact integer cross-multiply (2·qty_s > total), then collapsed to
    // a distinct-supplier SEMI probe against the supplier dim.
    "h20_qty_threshold" -> ((s, dir) => {
      val p = Tables.part(s, dir)
        .filter(col("p_name").startsWith("red")).select("p_partkey")
      val l = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= ts("1997-01-01") &&
          col("l_shipdate") < ts("1998-01-01"))
        .select(col("l_partkey"), col("l_suppkey"),
          col("l_quantity").cast(LongType).as("qty"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      val perPS = l.groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("qty")).as("qty_s"))
      val perPart = perPS.groupBy(col("l_partkey").as("pk"))
        .agg(sum(col("qty_s")).as("qty_total"))
      val winners = perPS
        .join(perPart, col("l_partkey") === col("pk"))
        .filter(col("qty_s") * 2 > col("qty_total"))
        .select("l_suppkey").distinct()
      Tables.supplier(s, dir)
        .join(winners, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    }),

    // Q21 analogue: suppliers who kept multi-supplier orders waiting.
    // The original's EXISTS (another supplier on the order) + NOT EXISTS
    // (another LATE supplier) pair decorrelates into per-order
    // aggregation: distinct suppliers ≥ 2, distinct LATE suppliers = 1 —
    // the unique late supplier is then charged that order's late-line
    // count (when exactly one supplier is late, every late line is his,
    // so the per-order late total needs no per-culprit split). The two
    // DISTINCT counts run as ONE per-order collect_set aggregation —
    // suppliers-per-order is bounded (≤7 in TPC-H's generator, a data
    // invariant, not a scale variable), so the sets are O(1) per group
    // and partial-merge map-side; multi-countDistinct would Expand the
    // fact rows ×3 before the shuffle (measured 8.8 s → 1.3 s at sf0.1).
    // The DuckDB oracle replays the classic correlated form, proving
    // the rewrite exact.
    "h21_waiting_supplier" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select("o_orderkey", "o_orderdate")
      val l = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_suppkey", "l_shipdate")
      val late = col("l_shipdate") > col("o_orderdate") +
        expr("INTERVAL 60 DAYS")
      val perOrder = l
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .withColumn("late_supp", when(late, col("l_suppkey")))
        .groupBy(col("l_orderkey"))
        .agg(size(collect_set(col("l_suppkey"))).as("ns"),
          size(collect_set(col("late_supp"))).as("nl"),
          max(col("late_supp")).as("culprit"),
          sum(when(col("late_supp").isNotNull, 1L).otherwise(0L))
            .as("late_lines"))
        .filter(col("ns") >= 2 && col("nl") === 1)
      val sup = Tables.supplier(s, dir).select("s_suppkey", "s_name")
      perOrder.groupBy(col("culprit"))
        .agg(sum(col("late_lines")).as("numwait"))
        .join(broadcast(sup), col("culprit") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(50)
    })
  )

  def oracleSql: Map[String, String] = Map(
    "h2_min_cost_supplier" ->
      """WITH lp AS (
        |  SELECT l.l_partkey, l.l_suppkey, l.l_extendedprice, p.p_name
        |  FROM lineitem l
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE p.p_type = 'SMALL' AND p.p_size <= 10
        |)
        |SELECT DISTINCT s.s_name, n.n_name, lp.l_partkey, lp.p_name,
        |  lp.l_extendedprice AS min_price, s.s_acctbal
        |FROM lp
        |JOIN supplier s ON lp.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |WHERE lp.l_extendedprice = (
        |  SELECT min(l2.l_extendedprice) FROM lineitem l2
        |  JOIN part p2 ON l2.l_partkey = p2.p_partkey
        |  WHERE l2.l_partkey = lp.l_partkey
        |    AND p2.p_type = 'SMALL' AND p2.p_size <= 10)
        |ORDER BY lp.l_partkey, s.s_name
        |LIMIT 100""".stripMargin,
    "h7_volume_shipping" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  CAST(year(CAST(l.l_shipdate AS DATE)) AS BIGINT) AS l_year,
        |  CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |        (1 - CAST(l.l_discount AS DECIMAL(18,2)))
        |        AS DECIMAL(28,4))) AS DOUBLE) AS revenue
        |FROM lineitem l
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        |WHERE (sn.n_name = 'NATION_13' AND cn.n_name = 'NATION_19')
        |   OR (sn.n_name = 'NATION_19' AND cn.n_name = 'NATION_13')
        |GROUP BY 1, 2, 3""".stripMargin,
    "h9_product_profit" ->
      """SELECT n.n_name,
        |  CAST(year(CAST(o.o_orderdate AS DATE)) AS BIGINT) AS o_year,
        |  CAST(sum(
        |    CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |      (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))
        |    - CAST(CAST(p.p_retailprice AS DECIMAL(18,2)) *
        |        CAST(0.8 AS DECIMAL(2,1)) *
        |        CAST(l.l_quantity AS BIGINT) AS DECIMAL(28,4)))
        |    AS DOUBLE) AS profit
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE p.p_name LIKE '%gear%'
        |GROUP BY 1, 2""".stripMargin,
    "h11_important_stock" ->
      """WITH pp AS (
        |  SELECT l.l_partkey,
        |    sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS value
        |  FROM lineitem l
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  WHERE n.n_name = 'NATION_3'
        |  GROUP BY 1
        |), t AS (SELECT sum(value) AS tot FROM pp)
        |SELECT pp.l_partkey, CAST(pp.value AS DOUBLE) AS value
        |FROM pp, t
        |WHERE pp.value * 1000 > t.tot""".stripMargin,
    "h15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |        (1 - CAST(l_discount AS DECIMAL(18,2)))
        |        AS DECIMAL(28,4))) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY 1
        |)
        |SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_rev
        |FROM rev r
        |JOIN supplier s ON r.l_suppkey = s.s_suppkey
        |WHERE r.total_rev = (SELECT max(total_rev) FROM rev)""".stripMargin,
    "h16_supplier_cnt" ->
      """SELECT p.p_brand, p.p_type, p.p_size,
        |  count(DISTINCT l.l_suppkey) AS supplier_cnt
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE p.p_brand <> 'Brand#5' AND p.p_type <> 'PROMO'
        |  AND l.l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
        |GROUP BY 1, 2, 3""".stripMargin,
    "h19_disjunctive" ->
      """SELECT
        |  CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |        (1 - CAST(l.l_discount AS DECIMAL(18,2)))
        |        AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 5
        |       AND l.l_quantity BETWEEN 1 AND 11)
        |   OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 10
        |       AND l.l_quantity BETWEEN 10 AND 20)
        |   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 15
        |       AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "h20_qty_threshold" ->
      """WITH ps AS (
        |  SELECT l.l_partkey, l.l_suppkey,
        |    sum(CAST(l.l_quantity AS BIGINT)) AS qty_s
        |  FROM lineitem l
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE p.p_name LIKE 'red%'
        |    AND l.l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l.l_shipdate < TIMESTAMP '1998-01-01'
        |  GROUP BY 1, 2
        |), pt AS (
        |  SELECT l_partkey AS pk, sum(qty_s) AS qty_total FROM ps GROUP BY 1
        |)
        |SELECT s.s_suppkey, s.s_name
        |FROM supplier s
        |WHERE s.s_suppkey IN (
        |  SELECT ps.l_suppkey FROM ps JOIN pt ON ps.l_partkey = pt.pk
        |  WHERE ps.qty_s * 2 > pt.qty_total)
        |ORDER BY s.s_suppkey""".stripMargin,
    "h21_waiting_supplier" ->
      """SELECT s.s_suppkey, s.s_name, count(*) AS numwait
        |FROM supplier s
        |JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        |JOIN orders o ON o.o_orderkey = l1.l_orderkey
        |WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1, 2
        |ORDER BY numwait DESC, s_name
        |LIMIT 50""".stripMargin
  )
}
