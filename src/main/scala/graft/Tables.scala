package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixture-table loaders.
  *
  * All engine queries read the driver-generated parquet tables under a
  * scale-factor directory (see TESTDATA.md). The reference lake layout is
  * Hive-partitioned parquet (`raw/ano=/mes=/dia=`, cf.
  * /root/reference/src/etl/s3.py:78, glue.py:78); here the fixtures are one
  * parquet file per table and Spark's vectorized parquet reader + Catalyst
  * pushdown provide scan pruning (SURVEY §2.1 S1).
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // Spark 4 defaults to ANSI semantics (errors on div-by-zero, strict
    // casts). The oracle (DuckDB) follows IEEE float semantics for double
    // math (x/0 → inf, 0/0 → NaN), so pin classic semantics per session.
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Normalize a timestamp-ish column to micros TimestampType whatever
    * physical type the current fixture generation shipped (see `events` —
    * the same drift would break o_orderdate/l_shipdate, and a prior
    * `events()` call leaves `nanosAsLong` set session-wide, so a nanos
    * generation would surface here as a LongType column). A cast on an
    * already-TimestampType column is eliminated by Catalyst, so scan
    * pruning and filter pushdown are unaffected on the common path. */
  private def tsNorm(df: DataFrame, c: String): DataFrame =
    df.schema(c).dataType match {
      case LongType => df.withColumn(c, expr(s"timestamp_micros($c div 1000)"))
      case _        => df.withColumn(c, col(c).cast(TimestampType))
    }
  def lineitem(spark: SparkSession, d: String): DataFrame  =
    tsNorm(load(spark, d, "lineitem"), "l_shipdate")
  def orders(spark: SparkSession, d: String): DataFrame    =
    tsNorm(load(spark, d, "orders"), "o_orderdate")
  def customer(spark: SparkSession, d: String): DataFrame  = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame  = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame      = load(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame    = load(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame    = load(spark, d, "region")
  /** `events.ts` has shipped as two physical types across fixture
    * generations: parquet TIMESTAMP(NANOS) — which Spark's reader rejects
    * ([PARQUET_TYPE_ILLEGAL]) unless read as raw long nanos via
    * `legacy.parquet.nanosAsLong` — and plain TIMESTAMP(MICROS), which
    * Spark infers as TIMESTAMP_NTZ. Normalize BOTH to the same micros
    * TimestampType (truncation for nanos is exactly what DuckDB 1.x does
    * at scan time; the NTZ→LTZ cast is value-preserving under the pinned
    * UTC session) so every downstream query and oracle sees one schema. */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the NTZ→LTZ cast below is session-timezone-sensitive; pin UTC here
    // (not just in our own mains) so an external session on a non-UTC box
    // cannot silently shift instants relative to the DuckDB oracle's
    // naive-timestamp arithmetic — same defensive per-call pin as load()'s
    // ansi flag
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = load(spark, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _        => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")

  /** Restore input parallelism for a CPU-heavy map stage (guide §2.5
    * "input skew: one huge unsplittable file … repartition immediately
    * after the read"; §6.1 splits stop at row-group granularity). The
    * fixture tables are single-row-group parquet files, so every scan
    * arrives as ONE task and everything before the first exchange —
    * shingling, signature hashing, regex scoring, edit distance — runs
    * serially no matter how many cores the session has. `spread` is
    * ADAPTIVE, not a constant: it round-robins to the session's default
    * parallelism only when the scan's split count is actually starved
    * (< cores), so on a production lake with properly sized files (or a
    * future multi-row-group fixture) it is a no-op and no extra exchange
    * is paid. Call it on scan-stage frames only (narrow plans, no
    * exchanges) — `.rdd` on a post-shuffle frame would force AQE stage
    * materialization. Only worth it where per-row compute dominates the
    * one extra narrow-row exchange; plain column aggregates should NOT
    * pay this (map-side partial agg over the scan is the scale-correct
    * shape there). */
  private val spreadProbeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Long), Int]()

  def spread(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    // the split-count probe (`.rdd`) pays one physical planning pass, so
    // its result is memoized per (session, semantic plan): the same query
    // shape re-probes for free on every later invocation, and a
    // regenerated fixture at the same path keeps the same single-row-group
    // layout (worst case a stale entry costs one redundant — or one
    // missing — repartition of a scan-sized frame, never correctness)
    val key = (System.identityHashCode(df.sparkSession),
      df.queryExecution.analyzed.semanticHash().toLong)
    val n = spreadProbeCache.computeIfAbsent(key, _ => df.rdd.getNumPartitions)
    if (n >= par) df else df.repartition(par)
  }
}

/** Oracle-parity numeric helpers.
  *
  * The driver hash-compares our parquet output against DuckDB running the
  * same ANSI SQL. Floating-point aggregation order differs between engines,
  * so every aggregate that sums doubles in engine-dependent order goes
  * through one of these:
  *
  *  - `decSum`: cast the 2-decimal source doubles to DECIMAL(18,2), sum
  *    exactly (associative), cast the final sum back to double. Both
  *    engines produce the bit-identical double.
  *  - `r6`/`r2`: round window/frame results where both engines see the same
  *    ordered frame but may differ in the last ulp (segment-tree vs
  *    sequential summation).
  */
object Num {
  /** Cross-engine-deterministic 6-decimal rounding: `floor(x·1e6+0.5)/1e6`
    * is pure IEEE double arithmetic, so Spark and DuckDB produce the SAME
    * result on the SAME input double — unlike library `round`, where Spark
    * rounds the shortest decimal repr and DuckDB rounds the binary value
    * (they disagree on representational boundaries ~1e-6 of the time).
    * NaN is preserved (floor would otherwise coerce it). The matching
    * oracle-SQL fragment is `floor((x) * 1000000 + 0.5) / 1000000`. */
  def r6(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(isnan(c), c).otherwise(floor(c * 1000000d + 0.5d) / 1000000d)
  def r4(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(isnan(c), c).otherwise(floor(c * 10000d + 0.5d) / 10000d)
  def r2(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = round(c, 2)

  /** Exact sum of a 2-decimal double column via decimal, returned as double. */
  def decSum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Exact mean: exact decimal sum as double, divided by count (deterministic). */
  def decAvg(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType) / count(c)

  /** Spark stddev/variance return NaN where DuckDB returns NULL (n=1 frames);
    * normalize NaN to NULL for oracle parity. */
  def nanToNull(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(isnan(c), lit(null)).otherwise(c)

  /** 2-decimal double → exact integer cents (BIGINT). The oracle-parity
    * conversion every exact-arithmetic query over `events.value` starts
    * from; SQL twin: `CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)`. */
  def cents(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (c.cast(DecimalType(18, 2)) * 100).cast("long")
}

/** Scalable global total-order rank shared by sc4_global_rank and
  * c5_quantile_bins: `orderBy` range-partitions + locally sorts (the
  * scalable total sort), then `zipWithIndex` assigns contiguous 1-based
  * ranks partition-by-partition — never a single-partition Window. Order
  * must be pinned by a unique (value, key) pair so ranks are deterministic
  * regardless of sampled range boundaries. */
object Ranks {
  import org.apache.spark.sql.{Column, DataFrame}

  /** df must expose exactly (key: Long, v: Double) under `keyCol`/`valCol`;
    * returns (keyCol, valCol, rankCol) ranked 1..n in `order`. */
  def globalRank(df: DataFrame, keyCol: String, valCol: String,
      rankCol: String, order: Seq[Column]): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.select(col(keyCol), col(valCol))
      .orderBy(order: _*)
      .as[(Long, Double)]
      .rdd.zipWithIndex()
      .map { case ((k, v), i) => (k, v, i + 1) }
      .toDF(keyCol, valCol, rankCol)
  }

  /** Row-preserving variant: appends 1-based contiguous `rankCol` to ALL
    * of df's columns under the total order `order` — the same
    * range-partitioned sort + zipWithIndex shape for frames that need
    * more than a (key, value) pair (the ml_* fold queries), replacing
    * the single-partition `row_number() OVER (ORDER BY …)` funnel. Like
    * globalRank, zipWithIndex runs its partition-offset job at
    * construction. */
  def globalRankRows(df: DataFrame, rankCol: String, order: Seq[Column]): DataFrame = {
    val s = df.sparkSession
    val sorted = df.orderBy(order: _*)
    val schema = sorted.schema.add(rankCol, org.apache.spark.sql.types.LongType,
      nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (row, i) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    s.createDataFrame(rdd, schema)
  }

  /** Appends the running total of `valCol` (LongType) under the global
    * total order `order` — the distributed scan primitive: range-
    * partitioned sort, one pass collecting per-partition subtotals
    * (numPartitions longs on the driver — the zipWithIndex accounting),
    * exclusive offsets broadcast, then a map-only second pass. Replaces
    * the single-partition `sum() OVER (ORDER BY …)` funnel the same way
    * globalRank replaces the row_number one. `order` must be a total
    * order or per-partition re-evaluation could disagree with the
    * subtotal pass (Spark's range sampler is seeded, so equal-key
    * placement is deterministic only when keys aren't equal). */
  def globalPrefixSum(df: DataFrame, valCol: String, order: Seq[Column],
      cumCol: String): DataFrame =
    globalPrefixSumWithTotal(df, valCol, order, cumCol)._1

  /** Appends the running MAX of `valCol` (LongType) over all STRICTLY
    * PRECEDING rows under the global total order `order` — null for the
    * global first row. Same two-pass shape as [[globalPrefixSum]]:
    * range-partitioned sort, per-partition maxima collected (numPartitions
    * longs), exclusive prefix-maxima broadcast, map-only second pass. This
    * is the distributed sweep primitive behind the 2-D skyline
    * (o4_skyline): max is associative, so the per-partition offset trick
    * applies exactly as it does for sums, and no single-partition
    * `max() OVER (ORDER BY …)` funnel ever materializes. */
  def globalPrefixMaxExclusive(df: DataFrame, valCol: String,
      order: Seq[Column], cumCol: String): DataFrame = {
    val s = df.sparkSession
    val sorted = df.orderBy(order: _*)
    val idx = sorted.schema.fieldIndex(valCol)
    val rdd = sorted.rdd
    val partMax = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = Long.MinValue
      var any = false
      it.foreach { r => any = true; acc = math.max(acc, r.getLong(idx)) }
      Iterator.single((i, if (any) Some(acc) else None))
    }.collect().sortBy(_._1).map(_._2)
    // exclusive prefix-max of the per-partition maxima
    val offsets = partMax.scanLeft(Option.empty[Long]) { (a, b) =>
      (a, b) match {
        case (Some(x), Some(y)) => Some(math.max(x, y))
        case (x, None)          => x
        case (None, y)          => y
      }
    }.init // scanLeft yields n+1 entries; entry i = max over partitions [0,i)
    val bc = s.sparkContext.broadcast(offsets)
    val schema = sorted.schema.add(cumCol, org.apache.spark.sql.types.LongType,
      nullable = true)
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = bc.value(i)
      it.map { r =>
        val prev = acc
        val v = r.getLong(idx)
        acc = Some(acc.fold(v)(math.max(_, v)))
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ prev.map(Long.box).orNull)
      }
    }
    s.createDataFrame(out, schema)
  }

  /** Multi-column [[globalPrefixSum]]: appends the running total of EACH
    * of `valCols` (all LongType) under the one global order — the same
    * two-pass shape (per-partition subtotal VECTORS collected, exclusive
    * offset vectors broadcast, map-only second pass), paying ONE sort for
    * k cumulative columns instead of k sorts. Returns the frame plus the
    * grand totals, in `valCols` order (free from the subtotal pass — a
    * caller needing them as scalars reads them here instead of paying a
    * separate aggregation job). Used by c3_ks_drift, whose two-cohort KS
    * scan needs both CDFs under the same value order. */
  def globalPrefixSums(df: DataFrame, valCols: Seq[String],
      order: Seq[Column], cumCols: Seq[String]): (DataFrame, Seq[Long]) = {
    require(valCols.size == cumCols.size)
    val s = df.sparkSession
    val sorted = df.orderBy(order: _*)
    val idxs = valCols.map(sorted.schema.fieldIndex).toArray
    val k = idxs.length
    val rdd = sorted.rdd
    val partSums = rdd.mapPartitionsWithIndex { (i, it) =>
      val acc = new Array[Long](k)
      it.foreach { r =>
        var j = 0
        while (j < k) { acc(j) += r.getLong(idxs(j)); j += 1 }
      }
      Iterator.single((i, acc))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(new Array[Long](k)) { (a, b) =>
      Array.tabulate(k)(j => a(j) + b(j))
    }
    val bc = s.sparkContext.broadcast(offsets)
    val schema = cumCols.foldLeft(sorted.schema)(
      (sc, c) => sc.add(c, org.apache.spark.sql.types.LongType, nullable = false))
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      val acc = bc.value(i).clone()
      it.map { r =>
        var j = 0
        while (j < k) { acc(j) += r.getLong(idxs(j)); j += 1 }
        org.apache.spark.sql.Row.fromSeq(r.toSeq ++ acc.toSeq)
      }
    }
    (s.createDataFrame(out, schema), offsets.last.toSeq)
  }

  /** [[globalPrefixSum]] plus the grand total, which the subtotal pass
    * already computed (offsets.last) — callers needing the corpus total
    * (e.g. a budget knob) read it here instead of paying another scan. */
  def globalPrefixSumWithTotal(df: DataFrame, valCol: String,
      order: Seq[Column], cumCol: String): (DataFrame, Long) = {
    val s = df.sparkSession
    val sorted = df.orderBy(order: _*)
    val idx = sorted.schema.fieldIndex(valCol)
    val rdd = sorted.rdd
    val partSums = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = 0L
      it.foreach(r => acc += r.getLong(idx))
      Iterator.single((i, acc))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)
    val bc = s.sparkContext.broadcast(offsets)
    val schema = sorted.schema.add(cumCol, org.apache.spark.sql.types.LongType,
      nullable = false)
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = bc.value(i)
      it.map { r =>
        acc += r.getLong(idx)
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ acc)
      }
    }
    (s.createDataFrame(out, schema), offsets.last)
  }
}
