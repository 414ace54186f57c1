package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core extraction by synchronized peeling (Matula & Beck 1983, the
  * distributed formulation): each round simultaneously deletes every node
  * whose degree in the CURRENT subgraph is < k, until fixpoint — the
  * remaining subgraph is the k-core (every surviving node has ≥ k
  * surviving neighbors). Synchronized rounds make the computation
  * schedule-free: the round-r subgraph is a pure function of the round-
  * (r−1) subgraph, so a fixed round count replays bit-identically in any
  * engine (the g1/g3 discipline — the oracle unrolls the rounds as CTEs).
  *
  * Scale shape: each round is ONE degree count shuffle + two semi-joins
  * of the edge list against the survivor set — O(rounds·|E|) total, no
  * windows, no driver-side state. Peeling deletes a constant fraction of
  * the sub-k-degree fringe per round, so real graphs converge in a few
  * rounds (web-graph cores stabilize long before the O(n) worst case).
  */
object KCore {

  /** Peel `rounds` synchronized rounds at threshold `k` over a SYMMETRIC
    * (src, dst) edge list; returns (node, deg_core) for the nodes of the
    * resulting subgraph with their within-subgraph degrees.
    *
    * Iteration state is the survivor NODE set, never an edge list: the
    * base edges cache ONCE and every round semi-filters them by the
    * current (node-sized, broadcastable) survivor set before one
    * map-side-combined degree count. Two earlier shapes both failed at
    * scale: leaving round-r edges lazy re-derives the whole r−1 chain
    * per round (O(rounds²) stage executions — 36–57 s warm at sf0.1);
    * caching each round's EDGE list bounds the stages but materializes
    * rounds × |E| cache pages, which evicts under memory pressure at
    * the 100× replica. Node-set state is the survivor-set monotonicity
    * made explicit: restricting the base by the CURRENT survivors
    * equals the chained per-round restriction, each survivor set is
    * node-sized and only shrinks, and each round is two semi filters +
    * one degree shuffle over the one cached table. The semi joins carry
    * NO broadcast hint (code-review r9): the round-1 survivor set is
    * nearly every node on a sparse graph — far beyond the broadcast
    * limit at billion-node scale — so the strategy is left to Spark's
    * statistics/AQE, which broadcasts exactly when the set has shrunk
    * enough to fit (on the fixture: from round 1). */
  def run(edges0: DataFrame, k: Int, rounds: Int): DataFrame = {
    // When the caller hands an ALREADY-CACHED edge artifact (the shared
    // memoized graph views, r11), adding our own cache() is a no-op on the
    // same cache entry — and the final unpersist would then silently DROP
    // the caller's shared cache (measured: g8 lost the src-partitioned
    // artifact whenever g4 ran first). Own the cache only when we made it.
    val preCached =
      edges0.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val edges =
      if (preCached) edges0.select(col("src"), col("dst"))
      else edges0.select(col("src"), col("dst")).cache()
    var surv: DataFrame = null // null = every node survives
    var survRelease: () => Unit = () => ()
    def restricted: DataFrame =
      if (surv == null) edges
      else edges
        .join(surv, col("src") === col("node"), "left_semi")
        .join(surv.withColumnRenamed("node", "nd"),
          col("dst") === col("nd"), "left_semi")
    for (_ <- 1 to rounds) {
      // PINNED per round (Lineage.pin, r11): `restricted` references the
      // survivor frame twice, so a cached-but-unpinned survivor chain
      // doubles the logical plan per round and every round's action
      // re-pays planning over the whole peel history; the pin keeps each
      // round's plan at constant size (edges ⋈ one LogicalRDD leaf).
      val (next, nextRelease) = Lineage.pin(
        restricted.groupBy("src").agg(count(lit(1)).as("d"))
          .filter(col("d") >= k).select(col("src").as("node")))
      survRelease() // previous survivor set is dead from here on
      surv = next
      survRelease = nextRelease
    }
    // Materialize the node-sized result with its lineage truncated, then
    // release the big pinned entries (the |E| edge cache and the final
    // survivor set) — otherwise every invocation (bench loops at 30×/100×)
    // permanently accumulates executor cache pressure across a session.
    val out = restricted.groupBy("src").agg(count(lit(1)).as("deg_core"))
      .select(col("src").as("node"), col("deg_core"))
      .localCheckpoint(true)
    if (!preCached) edges.unpersist(false)
    survRelease()
    out
  }
}
