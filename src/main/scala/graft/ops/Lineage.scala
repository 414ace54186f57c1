package graft.ops

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative operators (guide §5 "localCheckpoint()
  * is a cheaper way to cut lineage", §7.3 "very large plans … spend minutes
  * in planning").
  *
  * The round-10 iterative ops kept per-round state with `persist()`, on the
  * theory that re-persisting truncates plan growth. It does not: `persist`
  * adds a CacheManager entry but the LOGICAL plan keeps compounding — a
  * round that references the previous round's frame twice doubles the tree
  * per round, and EVERY subsequent action re-canonicalizes the whole tree
  * and walks it against every cache entry (CacheManager lookup is
  * O(plan nodes × cached plans)). Measured on d11_semantic_dedup at sf0.1:
  * the connected-components call over the LSH-mining lineage cost 9.7-11.1 s
  * and a 166-row collect of its cached result 2-2.8 s; with the SAME data
  * `localCheckpoint`ed first, 1.6 s and 0.13 s. The data was always cached —
  * all of the difference is driver-side plan work on lineage that persist
  * left attached.
  *
  * `pin` = eager localCheckpoint + an explicit release handle for the
  * checkpoint's storage blocks. The handle exists because checkpoint blocks
  * are otherwise only reclaimed when the RDD object is GC'd; the iterative
  * ops hold their per-round/previous-result blocks in the same one-slot
  * pools they used for caches, so a session's held storage stays bounded at
  * one run's worth regardless of invocation count (the g5/KCore census
  * contract). Releasing a pinned frame makes it UNREADABLE (local
  * checkpoints cannot recompute) — callers only release frames that are
  * dead by construction (the previous round, the previous call's result).
  *
  * Cluster note: local checkpoints trade executor-loss fault tolerance for
  * speed (the standard iterative-graph trade — recompute would need the
  * very lineage being truncated). On a production cluster with flaky
  * executors, substitute reliable `checkpoint()` to durable storage; the
  * round structure is identical.
  */
object Lineage {

  /** Materialize `df` (eager local checkpoint) and truncate its lineage to
    * a [[org.apache.spark.sql.execution.LogicalRDD]] leaf. Returns the
    * truncated frame and a release handle for its storage blocks. */
  def pin(df: DataFrame): (DataFrame, () => Unit) = {
    val cp = df.localCheckpoint(true)
    val rdd = org.apache.spark.sql.GraftSqlShim.underlyingRdd(cp)
    (cp, () => rdd.foreach(_.unpersist(false)))
  }
}
