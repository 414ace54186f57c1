package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items ("heavy hitters") sketch as a typed Spark
  * [[Aggregator]].
  *
  * Single-pass, bounded memory: the summary holds at most `k` counters, so
  * map-side partial aggregation ships ≤ k (item, count) entries per
  * partition and the reduce merges summaries — the shuffle volume is
  * O(partitions · k) regardless of input size, which is the whole point at
  * 100 TB (an exact `groupBy(item).count()` shuffles the full item
  * cardinality).
  *
  * Guarantees (Misra–Gries 1982; merge rule from Agarwal et al.,
  * "Mergeable Summaries", PODS 2012):
  *  - estimates never overcount: est(x) ≤ true(x);
  *  - undercount is bounded: true(x) − est(x) ≤ n/(k+1) over n items,
  *    preserved under merge;
  *  - therefore every item with true(x) > n/(k+1) is present in the
  *    summary — the containment invariant `a15_heavy_hitters` asserts
  *    (with the looser n/k threshold).
  *
  * Reference behavior anchor: value_counts/top-terms analyses in
  * /root/reference/src/data/eda.py (exact, single-node); this is the
  * bounded-memory distributed counterpart.
  */
class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  def zero: Map[String, Long] = Map.empty

  def reduce(b: Map[String, Long], item: String): Map[String, Long] =
    b.get(item) match {
      case Some(c)            => b.updated(item, c + 1)
      case None if b.size < k => b.updated(item, 1L)
      case None               =>
        // eviction sweep: decrement every counter, drop zeros. O(k), but
        // amortized O(1)/item — each sweep cancels k+1 prior increments.
        b.flatMap { case (t, c) => if (c > 1) Some(t -> (c - 1)) else None }
    }

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = (a.keySet ++ b.keySet).iterator
      .map(t => t -> (a.getOrElse(t, 0L) + b.getOrElse(t, 0L))).toMap
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest count from all, keep positives:
      // ≤ k survive and the total undercount bound telescopes.
      val cut = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      sum.flatMap { case (t, c) => if (c > cut) Some(t -> (c - cut)) else None }
    }
  }

  def finish(b: Map[String, Long]): Map[String, Long] = b

  // Kryo buffers: the summary is an opaque ≤ k-entry map; it never needs
  // columnar access, only (de)serialization at partial/final boundaries.
  def bufferEncoder: Encoder[Map[String, Long]] = Encoders.kryo[Map[String, Long]]
  def outputEncoder: Encoder[Map[String, Long]] = Encoders.kryo[Map[String, Long]]
}
