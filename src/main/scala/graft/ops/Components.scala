package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components by iterative min-label propagation —
  * the clustering step of a dedup pipeline: near-dup PAIRS (d2/d3) become
  * CLUSTERS, and the pipeline keeps one representative per cluster.
  *
  * Algorithm: every node starts labeled with itself; each round, a node
  * adopts the minimum label among itself and its neighbors; stop when no
  * label changed. Rounds needed = graph diameter, and each round is one
  * shuffle (join on the edge key + min-aggregate) — for dedup graphs,
  * whose components are tiny cliques/chains (diameter ≤ 2–3 in practice),
  * this converges in 2–3 shuffles regardless of corpus size. For graphs
  * with LARGE diameter the label-propagation round count is the known
  * weakness; the production upgrade is the alternating large-star /
  * small-star contraction of Kiveris et al. ("Connected Components in
  * MapReduce and Beyond", SoCC 2014), which converges in O(log²) rounds
  * over the same join/agg primitives.
  *
  * Reference behavior anchor: the drop-duplicates-keep-first semantics of
  * /root/reference/src/data/preprocessing.py (exact duplicates); this
  * generalizes "keep first" to near-duplicate clusters.
  */
object Components {

  /** Release handle for the checkpoint blocks backing the PREVIOUS call's
    * result: the result must stay materialized for the caller to consume,
    * so it can only be released when the next call starts — a one-slot
    * pool that bounds the held blocks to a single labeling regardless of
    * how many times the operator runs in a session. */
  private var lastResultRelease: Option[() => Unit] = None

  /** @param edges DataFrame with two long columns `a`, `b` (undirected).
    * @return (node, component) where component = min node id reachable.
    *         Isolated nodes (absent from `edges`) are absent here too.
    *
    * If labels still change at `maxIter` (component diameter exceeds the
    * round budget — NOT the dedup-graph regime this propagation is tuned
    * for), the call falls back to [[connectedComponentsStar]], whose round
    * count is O(log²) in component size regardless of diameter. Either
    * way the labeling returned is exact; the budget only picks the
    * algorithm. */
  /** @param preSym OPTIONAL caller-owned ALREADY-SYMMETRIZED (a, b) edge
    *        view, typically a cached artifact hash-partitioned on `a`
    *        (r11): when supplied, the per-call symmetrize+pin job is
    *        skipped (the artifact is already a bounded cached leaf), and
    *        if it is partitioned on `a` each propagation step's
    *        neighbor-min groupBy reuses that partitioning — with the
    *        node-sized label side riding a broadcast the whole step runs
    *        exchange-free. Must contain (x,y) AND (y,x) for every edge. */
  def connectedComponents(spark: SparkSession, edges: DataFrame,
      maxIter: Int = 25, preSym: DataFrame = null): DataFrame = {
    synchronized {
      lastResultRelease.foreach(r => r())
      lastResultRelease = None
    }
    // symmetrize once, PINNED (eager localCheckpoint, graft.ops.Lineage):
    // propagation below only needs to look at in-edges, and pinning cuts
    // the INPUT lineage off every round's plan — when the edges come out
    // of an LSH mining pipeline (d7/d11/d15) that lineage is hundreds of
    // plan nodes which every per-round action would re-canonicalize
    // (measured: 9.7 s → 1.6 s for the d11 labeling, data unchanged).
    val (sym, symRelease) =
      if (preSym != null) (preSym.select(col("a"), col("b")), () => ())
      else Lineage.pin(
        edges.select(col("a"), col("b"))
          .union(edges.select(col("b").as("a"), col("a").as("b"))))
    var labels = sym.select(col("a").as("node")).distinct()
      .withColumn("component", col("node"))
    // `cached` is the pinned frame currently backing `labels`; pinning
    // each round truncates logical-plan growth (step() references its
    // input twice, so the join tree would otherwise DOUBLE per round and
    // every action re-pays planning over the whole history).
    var (cached, cachedRelease) = Lineage.pin(labels)
    labels = cached

    // one propagation step: min label over each node's neighborhood;
    // extra columns (the change-tracking `orig`) pass through untouched
    def step(l: DataFrame): DataFrame = {
      val nbrMin = sym.join(l, sym("b") === l("node"))
        .groupBy(sym("a").as("nd"))
        .agg(min(col("component")).as("nbr_min"))
      l.join(nbrMin, l("node") === col("nd"), "left")
        .select((l.columns.filterNot(_ == "component").map(l(_)) :+
          least(col("component"), coalesce(col("nbr_min"), col("component")))
            .as("component")): _*)
    }

    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      // TWO propagation steps per materialized action (r10): each action
      // costs a fixed job-scheduling quantum that dwarfs the per-round
      // data on pruned graphs, and on a cluster halving the actions
      // halves the stage barriers for the same diameter budget. Labels
      // only ever decrease, so "nothing changed across the double step"
      // iff "nothing changed in its first step" — the convergence test
      // is unchanged (compared against the round's entry labels).
      val (next, nextRelease) =
        Lineage.pin(step(step(labels.withColumn("orig", col("component")))))
      changed = next.filter(col("component") < col("orig")).count()
      cachedRelease()
      cached = next
      cachedRelease = nextRelease
      // cheap projection over the freshly pinned round result
      labels = next.select(col("node"), col("component"))
      i += 1
    }
    symRelease()
    if (changed > 0) {
      cachedRelease()
      // diameter blew the propagation budget: hand the SAME edge set to
      // the O(log²)-round star contraction rather than guessing a bigger
      // budget (or worse, returning a silently split labeling)
      return connectedComponentsStar(spark, edges)
    }
    synchronized { lastResultRelease = Some(cachedRelease) }
    labels
  }

  /** Connected components by alternating large-star / small-star
    * contraction — Kiveris et al., "Connected Components in MapReduce and
    * Beyond" (SoCC 2014): the production path for graphs whose diameter is
    * unknown or large, where per-round min-label propagation would need
    * diameter-many shuffles.
    *
    * Edges are kept canonical (u > v, deduped, self-loops dropped).
    * Per round:
    *   - LARGE-STAR: for every node x over its full neighborhood Γ(x),
    *     m = min(Γ(x) ∪ x); rewrite each edge (w, x) with w > x to (w, m).
    *   - SMALL-STAR: group canonical edges by their LARGER endpoint u over
    *     neighbors N (all < u), m = min(N); rewrite to (w, m) for
    *     w ∈ N ∪ {u} \ {m}.
    * Both are single groupBy-join shuffles; each strictly bends edges
    * toward component minima, and the edge set reaches a star forest in
    * O(log² n) rounds for ANY diameter (a 2^k-node path halves in ~1
    * round pair). Fixpoint test is exact set equality (size + anti-join),
    * not a hash.
    *
    * @return (node, component), component = the min node id reachable —
    *         identical labeling semantics to [[connectedComponents]]. */
  def connectedComponentsStar(spark: SparkSession, edges: DataFrame,
      maxIter: Int = 50): DataFrame = {
    val nodes = edges.select(col("a").as("node"))
      .union(edges.select(col("b").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    // localCheckpoint, not persist: every round references `cur` several
    // times (symmetrize, two star joins), so the logical plan multiplies
    // ~6× per round — after ~10 rounds planning alone OOMs. Checkpointing
    // truncates the lineage each round (on a cluster: checkpoint to
    // reliable storage; the round structure is identical).
    var cur = edges.select(col("a"), col("b"))
      .filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("u"),
        least(col("a"), col("b")).as("v"))
      .distinct()
      .localCheckpoint(true)
    var curCnt = cur.count()

    var converged = curCnt == 0
    var i = 0
    while (!converged && i < maxIter) {
      // LARGE-STAR over the symmetrized neighborhood
      val sym = cur.select(col("u").as("x"), col("v").as("w"))
        .union(cur.select(col("v").as("x"), col("u").as("w")))
      val mins = sym.groupBy(col("x"))
        .agg(least(min(col("w")), first(col("x"))).as("m"))
      val large = sym.join(mins, "x")
        .filter(col("w") > col("x"))
        .select(col("w").as("u"), col("m").as("v"))
        .distinct()
      // SMALL-STAR over the larger-endpoint groups
      val sMins = large.groupBy(col("u")).agg(min(col("v")).as("m"))
      val small = large.join(sMins, "u")
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(sMins.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .distinct()
        .localCheckpoint(true)
      val nextCnt = small.count()
      converged = nextCnt == curCnt &&
        small.join(cur, Seq("u", "v"), "left_anti").isEmpty
      cur.unpersist(false)
      cur = small
      curCnt = nextCnt
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"star contraction did not reach a fixpoint in $maxIter rounds — " +
          "raise maxIter (expected O(log² n) rounds)")

    // fixpoint edge set is a star forest: (node → component min); roots
    // and isolated-in-canonical-form nodes label themselves
    val (labels, labelsRelease) = Lineage.pin(nodes
      .join(cur.select(col("u").as("node"), col("v").as("component")),
        Seq("node"), "left")
      .select(col("node"),
        coalesce(col("component"), col("node")).as("component")))
    nodes.unpersist(false)
    synchronized {
      lastResultRelease.foreach(r => r())
      lastResultRelease = Some(labelsRelease)
    }
    labels
  }
}
