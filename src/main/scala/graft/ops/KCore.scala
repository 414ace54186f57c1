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
    * resulting subgraph with their within-subgraph degrees. */
  def run(edges0: DataFrame, k: Int, rounds: Int): DataFrame = {
    var edges = edges0.select(col("src"), col("dst"))
      .cache() // round-0 input; reused by round 1's degree AND semi-joins
    for (_ <- 1 to rounds) {
      val keep = edges.groupBy("src").agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select("src")
      edges = edges
        .join(keep, Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("src", "dst"), Seq("dst"), "left_semi")
        .select("src", "dst")
    }
    edges.groupBy("src").agg(count(lit(1)).as("deg_core"))
      .select(col("src").as("node"), col("deg_core"))
  }
}
