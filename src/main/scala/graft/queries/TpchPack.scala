package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import graft.{QueryPack, Tables}

/** Classic warehouse analytics shapes (TPC-H Q3/Q5/Q10 analogues on the
  * fixture's column subset) — the multi-join star-schema workload an
  * analytics engine is ultimately judged on, expressed the way the 100 TB
  * plan should run it: every dimension (customer/supplier/nation/region,
  * and any filtered derivative) BROADCASTS, the only shuffles are the
  * orders⋈lineitem fact join and the final aggregation, selective filters
  * sit before joins so pushdown reaches the scans, and top-k cuts ride
  * sort+limit (TakeOrderedAndProject — never a full global sort).
  *
  * Revenue arithmetic is the [[graft.Num]] discipline: extendedprice and
  * discount are 2-decimal sources, so Σ price·(1−disc) accumulates as
  * exact DECIMAL(28,4) and converts to double once at the end — engine
  * summation order can't move the hash.
  */
object TpchPack extends QueryPack {

  private def revenue: org.apache.spark.sql.Column =
    (col("l_extendedprice").cast(DecimalType(18, 2)) *
      (lit(1).cast(DecimalType(18, 2)) -
        col("l_discount").cast(DecimalType(18, 2)))).cast(DecimalType(28, 4))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q3 analogue: unshipped-revenue priority list for one segment.
    // BUILDING customers broadcast; orders filter (< cutoff) and
    // lineitem filter (> cutoff) push to the scans; one fact-fact
    // shuffle; top-10 via sort+limit.
    "h3_shipping_priority" -> ((s, dir) => {
      val cutoff = lit("1997-01-01").cast("timestamp")
      val c = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val o = Tables.orders(s, dir).filter(col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val l = Tables.lineitem(s, dir).filter(col("l_shipdate") > cutoff)
        .select(col("l_orderkey"), revenue.as("rev"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_day"),
          col("o_orderpriority"))
        .agg(sum(col("rev")).cast(DoubleType).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // Q5 analogue: local-supplier volume — revenue from orders where the
    // customer and the lineitem's supplier share a nation, for one
    // region and one year, grouped by nation. All four dims broadcast;
    // the same-nation predicate rides the supplier join.
    "h5_local_supplier_volume" -> ((s, dir) => {
      val asia = Tables.region(s, dir).filter(col("r_name") === "ASIA")
      val nat = Tables.nation(s, dir)
        .join(broadcast(asia), col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val cust = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
      val supp = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
      val o = Tables.orders(s, dir)
        .filter(year(col("o_orderdate")) === 1997)
        .select("o_orderkey", "o_custkey")
      val l = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_suppkey"), revenue.as("rev"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(cust), o("o_custkey") === cust("c_custkey"))
        .join(broadcast(supp), l("l_suppkey") === supp("s_suppkey") &&
          cust("c_nationkey") === supp("s_nationkey"))
        .join(broadcast(nat), supp("s_nationkey") === nat("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("rev")).cast(DoubleType).as("revenue"))
    }),

    // Q4 analogue: order-priority count for one quarter, restricted to
    // orders with at least one LATE lineitem (shipped > 60 days after
    // the order date — the fixture has no commit/receipt dates, so
    // lateness is ship-lag; the reference's Athena catalog serves the
    // same EXISTS shape). The EXISTS is a LEFT SEMI join — the probe
    // side never duplicates (an inner join would multiply an order by
    // its late-lineitem count and need a distinct), and the lateness
    // predicate rides the join so each fact row is tested once. One
    // fact-fact shuffle, then a ~5-row priority count.
    "h4_order_priority" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
      val l = Tables.lineitem(s, dir).select("l_orderkey", "l_shipdate")
      o.join(l, o("o_orderkey") === l("l_orderkey") &&
          l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    }),

    // Q8 analogue: national market share — NATION_1 suppliers' slice of
    // PROMO-part revenue sold to AMERICA-region customers, by order
    // year. The classic conditional-aggregate share: numerator and
    // denominator accumulate in the SAME exact-decimal pass (sum of
    // rev·[nation=target] over sum of rev), so the share is ONE double
    // division per year row, r6-rounded. Plan: part filter + all dims
    // broadcast; the only shuffles are orders⋈lineitem and the ~5-row
    // year agg.
    "h8_market_share" -> ((s, dir) => {
      val promo = Tables.part(s, dir).filter(col("p_type") === "PROMO")
        .select("p_partkey")
      val amer = Tables.region(s, dir).filter(col("r_name") === "AMERICA")
      val natC = Tables.nation(s, dir)
        .join(broadcast(amer), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("cn_key"))
      val cust = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
      val supp = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)
          .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("sn_key"))
        .select("s_suppkey", "supp_nation")
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).cast("long").as("o_year"))
      val l = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          revenue.as("rev"))
      l.join(broadcast(promo), l("l_partkey") === promo("p_partkey"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(cust), o("o_custkey") === cust("c_custkey"))
        .join(broadcast(natC), cust("c_nationkey") === natC("cn_key"))
        .join(broadcast(supp), l("l_suppkey") === supp("s_suppkey"))
        .groupBy(col("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_1", col("rev"))
            .otherwise(lit(0).cast(DecimalType(28, 4))))
            .cast(DoubleType).as("nation_rev"),
          sum(col("rev")).cast(DoubleType).as("total_rev"))
        .select(col("o_year"),
          graft.Num.r6(col("nation_rev") / col("total_rev")).as("mkt_share"))
    }),

    // Q10 analogue: returned-item revenue per customer for one quarter —
    // the churn-investigation report. Orders filtered to the quarter,
    // lineitem to returnflag R; customer dim broadcast onto the
    // aggregated result (agg BEFORE the dim join, so the dim attach
    // touches ≤ |customers| rows, not the fact stream); top 20.
    "h10_returned_items" -> ((s, dir) => {
      val q = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val l = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), revenue.as("rev"))
      val agg = l.join(q, l("l_orderkey") === q("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(col("rev")).cast(DoubleType).as("revenue"))
      val c = Tables.customer(s, dir)
        .select("c_custkey", "c_name", "c_acctbal")
      agg.join(broadcast(c), agg("o_custkey") === c("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // Q6 analogue: forecast-revenue-change — the canonical map-only
    // filtered aggregate. NO join, NO shuffle beyond the single-row agg;
    // every predicate (date range, discount band, quantity cap) pushes
    // to the parquet scan, which is the whole point of the query: at
    // 100 TB this is a scan-bandwidth benchmark and nothing else.
    // Σ price·discount accumulates as exact DECIMAL(28,4) (2-dec ×
    // 2-dec), one double conversion at the end.
    "h6_forecast_revenue" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount") >= 0.02 && col("l_discount") <= 0.04 &&
          col("l_quantity") < 24)
        .agg(
          sum((col("l_extendedprice").cast(DecimalType(18, 2)) *
            col("l_discount").cast(DecimalType(18, 2)))
            .cast(DecimalType(28, 4)))
            .cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_lines"))),

    // Q12 analogue: late-line priority audit — the fixture has no
    // shipmode/commitdate, so the Q12 grouping runs per returnflag and
    // lateness is the h4 ship-lag predicate (> 60 days after the order
    // date), tested INSIDE the join so each fact row is filtered during
    // the probe. One orders⋈lineitem shuffle, then a 3-row conditional
    // count split (urgent+high vs rest — Q12's exact output shape).
    "h12_late_lines" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
      val l = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_returnflag", "l_shipdate")
      l.join(o, l("l_orderkey") === o("o_orderkey") &&
          l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))
    }),

    // Q14 analogue: promo-revenue share for one ship month. The part dim
    // broadcasts; numerator and denominator accumulate in the SAME
    // exact-decimal pass (the h8 conditional-share discipline), ONE
    // double division at the end, r6-rounded.
    "h14_promo_share" -> ((s, dir) => {
      val p = Tables.part(s, dir).select("p_partkey", "p_type")
      val l = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .select(col("l_partkey"), revenue.as("rev"))
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", col("rev"))
            .otherwise(lit(0).cast(DecimalType(28, 4))))
            .cast(DoubleType).as("promo_rev"),
          sum(col("rev")).cast(DoubleType).as("total_rev"))
        .select(col("promo_rev"), col("total_rev"),
          graft.Num.r6(lit(100.0) * col("promo_rev") / col("total_rev"))
            .as("promo_pct"))
    }),

    // Q13 analogue: customer order-count distribution. The fact side
    // pre-aggregates FIRST (orders → one row per ordering customer), so
    // the outer join carries ≤ |customer| rows instead of the order
    // stream, and zero-order customers survive via LEFT + coalesce.
    // Both join sides are |customer|-scale (customer grows with SF in
    // TPC-H), so this is an honest shuffle join — no forced broadcast;
    // the final distribution table is ≤ max-orders-per-customer rows.
    "h13_order_distribution" -> ((s, dir) => {
      val perCust = Tables.orders(s, dir)
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
      val c = Tables.customer(s, dir).select("c_custkey")
      c.join(perCust, c("c_custkey") === perCust("o_custkey"), "left")
        .select(coalesce(col("cnt"), lit(0L)).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // Q17 analogue: small-quantity revenue for one brand — the classic
    // correlated scalar subquery (l_quantity < 0.2·avg qty over the same
    // part), DECORRELATED as a per-part aggregate joined back. The
    // correlated predicate is rewritten EXACT-INTEGER: qty < sum/(5·cnt)
    // ⟺ 5·qty·cnt < sum (quantities are integral and cnt > 0), so no
    // engine ever divides — the FP-tie trap of 0.2·avg disappears. Brand
    // filter broadcasts onto the fact scan BEFORE the stats agg, so both
    // the aggregate and the probe side see only the brand's ~4 % slice.
    "h17_small_qty_revenue" -> ((s, dir) => {
      val brandParts = Tables.part(s, dir)
        .filter(col("p_brand") === "Brand#23").select("p_partkey")
      val lb = Tables.lineitem(s, dir)
        .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
          col("l_extendedprice"))
        .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
        .select("l_partkey", "qty", "l_extendedprice")
      val stats = lb.groupBy(col("l_partkey").as("pk"))
        .agg(sum(col("qty")).as("sum_qty"), count(lit(1)).as("n_lines"))
      lb.join(stats, lb("l_partkey") === stats("pk"))
        .filter(col("qty") * lit(5L) * col("n_lines") < col("sum_qty"))
        .agg(
          count(lit(1)).as("n_small"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2)))
            .cast(DoubleType).as("total_ext"))
        .select(col("n_small"), col("total_ext"),
          graft.Num.r6(col("total_ext") / lit(7.0)).as("avg_yearly"))
    }),

    // Q18 analogue: large-volume orders. The HAVING subquery is a
    // per-order quantity pre-aggregate (integral sums — exact across
    // engines) filtered > 250; qualifying orders join orders (carrying
    // the already-computed total, so lineitem is never re-joined) and
    // the customer dim attaches broadcast. Top-100 rides sort+limit
    // (TakeOrderedAndProject), tie-broken on o_orderkey.
    "h18_large_volume" -> ((s, dir) => {
      val bigOrders = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
        .filter(col("total_qty") > 250L)
      val o = Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      val c = Tables.customer(s, dir).select("c_custkey", "c_name")
      o.join(bigOrders, o("o_orderkey") === bigOrders("l_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_day"),
          col("o_totalprice"), col("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    // Q22 analogue: idle above-average balances — customers whose
    // balance beats the positive-balance mean and who never placed an
    // URGENT order, grouped by nation. The scalar subquery (global avg)
    // is a 1-row broadcast; the mean comparison is EXACT-DECIMAL
    // (bal·n_pos > Σbal — no division anywhere, the h17 discipline);
    // the NOT EXISTS is a LEFT ANTI join applied AFTER the balance
    // filter so the anti probe carries only the above-mean slice.
    "h22_idle_balance" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_nationkey"),
          col("c_acctbal").cast(DecimalType(18, 2)).as("bal"))
      val avgStats = c.filter(col("bal") > 0)
        .agg(sum(col("bal")).as("tot_bal"), count(lit(1)).as("n_pos"))
      val urgent = Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      c.crossJoin(broadcast(avgStats))
        .filter(col("bal") * col("n_pos") > col("tot_bal"))
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"),
          sum(col("bal")).cast(DoubleType).as("totacctbal"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "h4_order_priority" ->
      """SELECT o.o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1997-04-01'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey
        |      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1""".stripMargin,
    "h8_market_share" ->
      """WITH rev AS (
        |  SELECT CAST(year(CAST(o.o_orderdate AS DATE)) AS BIGINT) AS o_year,
        |    CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |      (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4)) AS rev,
        |    sn.n_name AS supp_nation
        |  FROM lineitem l
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        |  JOIN region r ON cn.n_regionkey = r.r_regionkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        |  WHERE p.p_type = 'PROMO' AND r.r_name = 'AMERICA'
        |)
        |SELECT o_year,
        |  floor((CAST(sum(CASE WHEN supp_nation = 'NATION_1'
        |          THEN rev ELSE CAST(0 AS DECIMAL(28,4)) END) AS DOUBLE)
        |    / CAST(sum(rev) AS DOUBLE)) * 1000000 + 0.5) / 1000000
        |    AS mkt_share
        |FROM rev GROUP BY 1""".stripMargin,
    "h3_shipping_priority" ->
      """SELECT l.l_orderkey,
        |  strftime(CAST(o.o_orderdate AS DATE), '%Y-%m-%d') AS o_day,
        |  o.o_orderpriority,
        |  CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |        (1 - CAST(l.l_discount AS DECIMAL(18,2)))
        |        AS DECIMAL(28,4))) AS DOUBLE) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1997-01-01'
        |  AND l.l_shipdate > TIMESTAMP '1997-01-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "h5_local_supplier_volume" ->
      """SELECT n.n_name,
        |  CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |        (1 - CAST(l.l_discount AS DECIMAL(18,2)))
        |        AS DECIMAL(28,4))) AS DOUBLE) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  AND c.c_nationkey = s.s_nationkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA'
        |  AND year(CAST(o.o_orderdate AS DATE)) = 1997
        |GROUP BY 1""".stripMargin,
    "h10_returned_items" ->
      """SELECT c.c_custkey, c.c_name, c.c_acctbal,
        |  CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |        (1 - CAST(l.l_discount AS DECIMAL(18,2)))
        |        AS DECIMAL(28,4))) AS DOUBLE) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE l.l_returnflag = 'R'
        |  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1997-04-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,
    "h6_forecast_revenue" ->
      """SELECT
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |        CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(28,4)))
        |    AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount >= 0.02 AND l_discount <= 0.04
        |  AND l_quantity < 24""".stripMargin,
    "h12_late_lines" ->
      """SELECT l.l_returnflag,
        |  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        |GROUP BY 1""".stripMargin,
    "h14_promo_share" ->
      """WITH rev AS (
        |  SELECT p.p_type,
        |    CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |      (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4)) AS rev
        |  FROM lineitem l
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
        |    AND l.l_shipdate < TIMESTAMP '1997-04-01'
        |), a AS (
        |  SELECT
        |    CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev
        |        ELSE CAST(0 AS DECIMAL(28,4)) END) AS DOUBLE) AS promo_rev,
        |    CAST(sum(rev) AS DOUBLE) AS total_rev
        |  FROM rev
        |)
        |SELECT promo_rev, total_rev,
        |  floor((100.0 * promo_rev / total_rev) * 1000000 + 0.5) / 1000000
        |    AS promo_pct
        |FROM a""".stripMargin,
    "h13_order_distribution" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (
        |  SELECT coalesce(o.cnt, 0) AS c_count
        |  FROM customer c
        |  LEFT JOIN (
        |    SELECT o_custkey, count(*) AS cnt
        |    FROM orders
        |    WHERE o_orderpriority <> '1-URGENT'
        |    GROUP BY 1) o
        |  ON c.c_custkey = o.o_custkey)
        |GROUP BY 1
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "h17_small_qty_revenue" ->
      """WITH lb AS (
        |  SELECT l.l_partkey, CAST(l.l_quantity AS BIGINT) AS qty,
        |    l.l_extendedprice
        |  FROM lineitem l
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE p.p_brand = 'Brand#23'
        |), st AS (
        |  SELECT l_partkey AS pk, sum(qty) AS sum_qty, count(*) AS n_lines
        |  FROM lb GROUP BY 1
        |), small AS (
        |  SELECT lb.l_extendedprice
        |  FROM lb JOIN st ON lb.l_partkey = st.pk
        |  WHERE lb.qty * 5 * st.n_lines < st.sum_qty
        |), a AS (
        |  SELECT count(*) AS n_small,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS total_ext
        |  FROM small
        |)
        |SELECT n_small, total_ext,
        |  floor((total_ext / 7.0) * 1000000 + 0.5) / 1000000 AS avg_yearly
        |FROM a""".stripMargin,
    "h18_large_volume" ->
      """SELECT c.c_name, c.c_custkey, o.o_orderkey,
        |  strftime(o.o_orderdate, '%Y-%m-%d') AS o_day,
        |  o.o_totalprice, b.total_qty
        |FROM orders o
        |JOIN (
        |  SELECT l_orderkey,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        |  FROM lineitem
        |  GROUP BY 1
        |  HAVING sum(CAST(l_quantity AS BIGINT)) > 250) b
        |ON o.o_orderkey = b.l_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY o.o_totalprice DESC, o.o_orderkey
        |LIMIT 100""".stripMargin,
    "h22_idle_balance" ->
      """WITH c AS (
        |  SELECT c_custkey, c_nationkey,
        |    CAST(c_acctbal AS DECIMAL(18,2)) AS bal
        |  FROM customer
        |), a AS (
        |  SELECT sum(bal) AS tot_bal, count(*) AS n_pos
        |  FROM c WHERE bal > 0
        |)
        |SELECT c.c_nationkey, count(*) AS numcust,
        |  CAST(sum(c.bal) AS DOUBLE) AS totacctbal
        |FROM c, a
        |WHERE c.bal * a.n_pos > a.tot_bal
        |  AND c.c_custkey NOT IN (
        |    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |GROUP BY 1""".stripMargin
  )
}
