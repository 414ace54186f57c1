package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HITS hubs & authorities (Kleinberg, JACM 1999) by synchronous power
  * iteration over a directed bipartite edge set — PageRank's sibling
  * eigenvector: authority mass flows along in-edges, hub mass along
  * out-edges, mutually reinforcing.
  *
  * Arithmetic is FIXED-POINT like [[PageRank]]: scores are 1e6-scaled
  * BIGINTs, each half-round is an exact integer message sum followed by
  * truncating integer renormalization against the round's max score (the
  * HITS normalization step, integerized), so the whole iteration is
  * bit-identical across engines and partition orders and the DuckDB
  * oracle replays it as unrolled CTEs with a hash-match.
  *
  * Each half-round is ONE keyed shuffle (join scores to edges on the
  * source side, partial-agg the sums on the destination side) plus a
  * 1-row max broadcast. Unlike PageRank — whose rounds reference the
  * previous rank vector ONCE and therefore pipeline as a single lineage —
  * the renormalization reads each raw-sum table TWICE (the max aggregate
  * and the divide), so every half-round's raw sums are cached: without
  * that, lineage doubles per half-round and a 3-round run re-derives the
  * edge join ~2⁶ times (measured: 108 s → ~10 s at sf0.01). Caches are
  * nodes-sized, held in the same one-slot pool as [[PageRank]] /
  * [[Components]] and released when the next call starts.
  *
  * Integer envelope: score ≤ 1e6 and raw sum ≤ 1e6·deg, so the 1e6
  * rescale peaks at deg·1e12 — inside BIGINT for deg < 9e6; beyond that,
  * rescale before summing.
  */
object Hits {

  val Scale = 1000000L // 1e6 fixed-point score scale

  private var lastReleases: Seq[() => Unit] = Nil

  /** @param edges directed (c, p) BIGINT pairs, pre-deduplicated: hubs on
    *        the `c` side, authorities on the `p` side.
    * @param iters fixed synchronous round count.
    * @param byC/byP OPTIONAL caller-owned CACHED copies of `edges`
    *        hash-partitioned on `c` / `p` (r11, guide §2.4): the auth
    *        half-round groups by `p` and the hub half-round by `c`, and
    *        since the score side rides a broadcast the join preserves the
    *        edge side's partitioning — with the right pre-partitioned
    *        copy each half-round's edge-sized Exchange disappears
    *        entirely. The copies are owned by the caller's memo (built in
    *        its warm()), so no cache()/unpersist() happens here — an
    *        unpersist of a plan-identical frame would silently drop the
    *        shared cache entry (the KCore r11 lesson).
    * @return (node, kind, score) — kind ∈ {hub, authority}, score the
    *         1e6-scaled fixed-point value after the final round (each
    *         round's max score is pinned at exactly Scale). */
  def run(spark: SparkSession, edges: DataFrame, iters: Int = 3,
      byC: DataFrame = null, byP: DataFrame = null): DataFrame = {
    synchronized {
      lastReleases.foreach(r => r())
      lastReleases = Nil
    }
    val own = byC == null || byP == null
    val cs = if (own) edges.select(col("c"), col("p")).cache() else null
    val csByC = if (own) cs else byC.select(col("c"), col("p"))
    val csByP = if (own) cs else byP.select(col("c"), col("p"))
    var held: Seq[() => Unit] =
      if (own) Seq(() => { cs.unpersist(false); () }) else Nil
    var hub = csByC.select(col("c")).distinct()
      .select(col("c"), lit(Scale).as("h"))
    var auth: DataFrame = null
    for (_ <- 1 to iters) {
      // score vectors are node-sized (≪ edges) and each round already
      // pays a materialization barrier for the max — so unlike PageRank
      // (whose barrier-free rounds pipeline as one shuffle chain and
      // measured 40% faster WITHOUT broadcasts), broadcasting the scores
      // into the edge join costs nothing extra here and keeps the cached
      // edge set from re-shuffling every half-round.
      // PINNED per half-round (Lineage.pin, r11): the renormalization
      // reads each raw-sum table twice, and a cached-but-unpinned chain
      // keeps every earlier half-round in the logical plan — each head()
      // and the final union then re-pay planning over the whole history.
      // (r11 also TRIED folding the pin and the max into one action —
      // persist() + head() — so each half-round pays one job instead of
      // two; measured warm 3.5 s → 4.5 s WORSE: without the LogicalRDD
      // leaf every later action re-plans and re-matches the growing
      // cached chain, which costs more than the extra tiny max job. Kept
      // the pin.)
      val (ar, arRelease) = Lineage.pin(csByP.join(broadcast(hub), "c")
        .groupBy("p").agg(sum(col("h")).as("s")))
      // the round max is ONE scalar — collect it (the PageRank n-count
      // accounting) instead of a crossJoin(broadcast(agg)): the same
      // materialization barrier either way, but no BroadcastExchange +
      // nested-loop-join stage per half-round
      val mxA = ar.agg(max(col("s"))).head().getLong(0)
      auth = ar.select(col("p"), expr(s"(s * ${Scale}L) DIV ${mxA}L").as("a"))
      val (hr, hrRelease) = Lineage.pin(csByC.join(broadcast(auth), "p")
        .groupBy("c").agg(sum(col("a")).as("s")))
      val mxH = hr.agg(max(col("s"))).head().getLong(0)
      hub = hr.select(col("c"), expr(s"(s * ${Scale}L) DIV ${mxH}L").as("h"))
      held = held ++ Seq(arRelease, hrRelease)
    }
    synchronized { lastReleases = held }
    hub.select(col("c").as("node"), lit("hub").as("kind"),
        col("h").as("score"))
      .unionAll(auth.select(col("p").as("node"),
        lit("authority").as("kind"), col("a").as("score")))
  }
}
