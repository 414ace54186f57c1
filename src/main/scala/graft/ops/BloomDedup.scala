package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Constant-size approximate-membership artifact for incremental dedup,
  * built on Spark's OWN Bloom sketch (`BloomFilterAggregate` /
  * `BloomFilterMightContain` — the expressions runtime row-level filtering
  * injects, reached through the one-line GraftSqlShim bridge because both
  * are `private[sql]`-adjacent internals with no public function surface).
  *
  * Why this exists next to d9's exact digest index: d9's daily check
  * shuffles today's digests against a HISTORY-sized index. The Bloom
  * artifact is numBits/8 bytes however large history grows, builds in ONE
  * partial-agg pass (executors build per-partition sketches, merge combines
  * them — the corpus never shuffles for it), merges across daily shards by
  * construction (sketch union = bitwise OR), and the membership probe is
  * MAP-ONLY: the sketch ships as a broadcast literal inside the plan. False
  * negatives are impossible; false positives are bounded by the sketch fpp,
  * so the production shape is bloom prefilter → exact verification join for
  * FLAGGED docs only (the dup fraction of the batch, not the batch).
  */
object BloomDedup {

  /** One partial-agg pass over `history`; returns the serialized sketch —
    * a bounded driver artifact (numBits/8 bytes + a fixed header; ~1 MB at
    * the 2²³-bit default), i.e. the parquet side-file a daily job persists
    * next to its output, NOT a data-sized collect. */
  def build(history: DataFrame, key: Column,
      expectedItems: Long = 1L << 20, numBits: Long = 1L << 23): Array[Byte] = {
    val agg = GraftSqlShim.column(
      new BloomFilterAggregate(
        GraftSqlShim.expression(xxhash64(key)),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())
    history.agg(agg.as("bf")).head().getAs[Array[Byte]](0)
  }

  /** Map-only membership probe against a built sketch: the sketch rides
    * the plan as a foldable binary literal (MightContain requires a
    * constant or scalar subquery on the sketch side), so no join, no
    * shuffle, no broadcast exchange — one codegen'd predicate per row. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    GraftSqlShim.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      GraftSqlShim.expression(xxhash64(key))))
}
