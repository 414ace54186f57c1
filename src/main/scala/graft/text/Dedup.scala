package graft.text

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Fnv64

/** Document deduplication family (builder-prompt training-data ops):
  * exact (hash-groupBy), MinHash+LSH banding, SimHash, n-gram Jaccard.
  *
  * Scale design:
  *  - Exact dedup: groupBy(md5(text)) — one shuffle on the 128-bit digest,
  *    never on the full text (the digest is the shuffle key at 100 TB).
  *  - MinHash LSH: shingle→64-perm signature→16 bands × 4 rows. Candidate
  *    generation is a self-join ON THE BAND KEY (explode 16 rows/doc,
  *    groupBy band bucket): cost is Σ|bucket|², never n². Exact Jaccard
  *    verification only on candidates.
  *  - SimHash: map-only 64-bit signature; near-dup candidates via 4×16-bit
  *    chunk banding (Hamming ≤ 3 ⇒ at least one identical chunk by
  *    pigeonhole).
  */
object Dedup {

  // ---- tokenization / shingles -------------------------------------------

  def tokens(text: String): Array[String] =
    text.trim.split("\\s+").filter(_.nonEmpty)

  /** Hashed w-shingles (token n-grams) as a distinct set. */
  def shingleHashes(text: String, w: Int): Array[Long] = {
    val ts = tokens(text)
    if (ts.length < w) Array(Fnv64.hashString(ts.mkString(" ")))
    else ts.sliding(w).map(g => Fnv64.hashString(g.mkString(" "))).toArray.distinct
  }

  // ---- MinHash ------------------------------------------------------------

  final val NumPerms = 64
  final val Bands = 16
  final val RowsPerBand = NumPerms / Bands
  /** Deterministic splitmix64 stream for the permutation coefficients. */
  private def splitmix(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private val permSeed: Array[Long] =
    Array.tabulate(NumPerms)(i => splitmix(0x5eed5eed00000000L + i))

  /** 64-value MinHash signature over the hashed shingle set.
    *
    * Each "permutation" is a full-avalanche 64-bit mix of (shingle ^ seed_i),
    * not a linear (a*h+b) mod p map: the linear form is order-preserving
    * whenever a*h stays below the modulus, which correlates all 64 minima
    * and breaks the Pr[min-collision] = Jaccard identity on small sets. */
  def minhashSignature(shingles: Array[Long]): Array[Long] = {
    val sig = Array.fill(NumPerms)(Long.MaxValue)
    var s = 0
    while (s < shingles.length) {
      val x = shingles(s)
      var i = 0
      while (i < NumPerms) {
        val v = splitmix(x ^ permSeed(i))
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      s += 1
    }
    sig
  }

  def bandHashes(sig: Array[Long]): Array[Long] =
    Array.tabulate(Bands) { b =>
      var h = Fnv64.Offset
      var r = 0
      while (r < RowsPerBand) {
        val v = sig(b * RowsPerBand + r)
        var k = 0
        while (k < 8) { h ^= (v >>> (8 * k)) & 0xffL; h *= Fnv64.Prime; k += 1 }
        r += 1
      }
      h
    }

  def jaccard(a: Array[Long], b: Array[Long]): Double = {
    val sa = a.toSet; val sb = b.toSet
    val inter = sa.intersect(sb).size
    if (sa.isEmpty && sb.isEmpty) 1.0
    else inter.toDouble / (sa.size + sb.size - inter).toDouble
  }

  /** Exact Jaccard over SORTED distinct arrays — identical values to
    * [[jaccard]] (shingle arrays are already distinct; a merge-intersection
    * over sorted input counts the same set sizes) without building two hash
    * sets per pair, which matters when a candidate pair is scored once per
    * colliding band on the hot path. */
  def jaccardSorted(a: Array[Long], b: Array[Long]): Double = {
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) < b(j)) i += 1
      else if (a(i) > b(j)) j += 1
      else { inter += 1; i += 1; j += 1 }
    }
    val union = a.length + b.length - inter
    if (union == 0) 1.0 else inter.toDouble / union.toDouble
  }

  case class DocShingles(doc_id: Long, shingles: Array[Long])
  case class BandRow(doc_id: Long, band: Int, bucket: Long)
  case class DupPair(doc_a: Long, doc_b: Long, jaccard: Double)

  /** Near-duplicate pairs with exact Jaccard ≥ threshold, candidates via
    * MinHash-LSH banding. `docs` needs (doc_id, text).
    *
    * r8 reshape (the d10/d3 lesson): the old plan distinct-ed the RAW
    * band-bucket candidate stream — Σ|bucket|² rows through a full
    * shuffle — and then shuffled it twice more through the shingle-set
    * joins before any Jaccard ran. Now the exact-Jaccard filter runs
    * FIRST (shingle sides broadcast under a size bound, so the whole
    * candidate→verify path pipelines inside the bucket-join stage) and
    * distinct sees only surviving near-dup pairs. The trade: a pair
    * colliding in k bands is scored k times (k ≈ 16·J⁴ ≈ 4 at J = 0.7 —
    * bounded, and only TRUE near-dups collide in many bands) — paid in
    * pipelined CPU on a sorted-merge intersection instead of three
    * shuffles of the full candidate stream. Past the broadcast bound the
    * plan degrades to the linear shuffle joins on doc ids. */
  /** Sorted shingle-hash sets per doc — the shared first stage of every
    * MinHash miner (sorting enables merge-intersection per candidate). */
  private def shingledSets(docs: DataFrame, shingleW: Int): Dataset[DocShingles] = {
    val s = docs.sparkSession
    import s.implicits._
    // spread (r11): the FNV-per-gram shingle pass and the 64-perm
    // signature derivation downstream both run over this frame — on the
    // single-row-group fixture files the scan arrives as ONE split and
    // the whole CPU-heavy signature stage serialized on one core
    graft.Tables.spread(docs.select(col("doc_id"), col("text")))
      .as[(Long, String)]
      .map { case (id, t) =>
        val a = shingleHashes(t, shingleW)
        java.util.Arrays.sort(a)
        DocShingles(id, a)
      }
  }

  /** Band rows from the 64-perm signature — shared by the self-join and
    * bipartite miners. */
  private def bandRows(sh: Dataset[DocShingles]): Dataset[BandRow] = {
    val s = sh.sparkSession
    import s.implicits._
    sh.flatMap { d =>
      val bh = bandHashes(minhashSignature(d.shingles))
      bh.iterator.zipWithIndex.map { case (h, b) => BandRow(d.doc_id, b, h) }
    }
  }

  /** Bounded-broadcast decision for a shingle table (one exact size job —
    * 8 bytes per shingle + row overhead). The bound is on RAW payload
    * bytes — resident HashedRelation ≈ 3× that, × aliased sides, so the
    * executor worst case is ~6× the bound (default 256 MB → ≲ 1.5 GB,
    * sized for multi-GB executors; pass a smaller bound for lean
    * profiles). Past it: linear shuffle joins on doc ids. */
  private def shingleFits(sh: Dataset[DocShingles], broadcastBytes: Long): Boolean = {
    val r = sh.toDF("doc_id", "shingles")
      .select(sum(size(col("shingles"))).cast("long").as("n"),
        count(lit(1)).as("d"))
      .head()
    (Option(r.get(0)).getOrElse(0L).asInstanceOf[Long] * 8L
      + r.getLong(1) * 24L) <= broadcastBytes
  }

  def minhashLshPairs(spark: SparkSession, docs: DataFrame, shingleW: Int,
      threshold: Double, broadcastBytes: Long = 256L << 20): Dataset[DupPair] = {
    import spark.implicits._
    val sh = shingledSets(docs, shingleW)
    sh.cache() // shingle sets: joined back on both pair sides for verification

    // bands cached too: they feed BOTH sides of the bucket self-join, and
    // the 64-perm signature is the expensive step — without caching it
    // runs twice per document. Lifetime is left to Spark's LRU (the query
    // result is lazy, so eager unpersist here would defeat the cache).
    val bands: Dataset[BandRow] = bandRows(sh).cache()

    val fits = shingleFits(sh, broadcastBytes)
    def shAs(idCol: String, setCol: String) = {
      val side = sh.toDF(idCol, setCol)
      if (fits) broadcast(side) else side
    }

    // bucket-join: docs sharing (band, bucket) are candidates; verify
    // in-stage, dedup survivors only. Select the intended column order
    // explicitly: using-column joins move the join key to column 0, so a
    // positional .as[...] would otherwise miswire.
    bands.toDF("doc_a", "band", "bucket")
      .join(bands.toDF("doc_b", "band", "bucket"), Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .join(shAs("doc_a", "sh_a"), "doc_a")
      .join(shAs("doc_b", "sh_b"), "doc_b")
      .select("doc_a", "doc_b", "sh_a", "sh_b")
      .as[(Long, Long, Array[Long], Array[Long])]
      .map { case (a, b, sa, sb) => DupPair(a, b, jaccardSorted(sa, sb)) }
      .filter(_.jaccard >= threshold)
      .distinct()
  }

  /** BIPARTITE near-dup mining between a large `left` corpus and a small
    * `right` corpus — the train × test fuzzy-decontamination shape
    * (GPT-3/Llama-style: drop training documents near-duplicate to any
    * eval document). Candidates come from the (band, bucket) equi-join
    * of the two band tables — never a self-join, so no left×left or
    * right×right candidate work is ever generated; verification runs
    * in-stage exactly like [[minhashLshPairs]]. The right side is the
    * one worth broadcasting: a held-out eval set is orders of magnitude
    * smaller than the training corpus, so its band table and shingle
    * sets ride a broadcast and the train corpus streams through the
    * stage map-only. Left-side shingle sets broadcast only under the
    * same bound; past it, the linear doc-id shuffle join. */
  def minhashLshBipartite(spark: SparkSession, left: DataFrame,
      right: DataFrame, shingleW: Int, threshold: Double,
      broadcastBytes: Long = 256L << 20): Dataset[DupPair] = {
    import spark.implicits._
    // each side's shingle set feeds its band derivation AND the verify
    // join — cached so the 64-perm signature runs once per document
    // (shingling/banding/bound logic shared with minhashLshPairs —
    // code-review r9)
    val shL = shingledSets(left, shingleW).cache()
    val shR = shingledSets(right, shingleW).cache()
    val fitsR = shingleFits(shR, broadcastBytes)
    val fitsL = shingleFits(shL, broadcastBytes)
    def shAs(sh: Dataset[DocShingles], ok: Boolean, idCol: String,
        setCol: String) = {
      val side = sh.toDF(idCol, setCol)
      if (ok) broadcast(side) else side
    }
    val bandsR = bandRows(shR).toDF("doc_b", "band", "bucket")
    bandRows(shL).toDF("doc_a", "band", "bucket")
      .join(if (fitsR) broadcast(bandsR) else bandsR, Seq("band", "bucket"))
      .join(shAs(shL, fitsL, "doc_a", "sh_a"), "doc_a")
      .join(shAs(shR, fitsR, "doc_b", "sh_b"), "doc_b")
      .select("doc_a", "doc_b", "sh_a", "sh_b")
      .as[(Long, Long, Array[Long], Array[Long])]
      .map { case (a, b, sa, sb) => DupPair(a, b, jaccardSorted(sa, sb)) }
      .filter(_.jaccard >= threshold)
      .distinct()
  }

  /** Exhaustive exact-Jaccard pairs over the hashed shingle sets — the
    * ground-truth side of the d2/d5 recall invariants. Broadcast of the
    * (bounded) shingle-set table + primitive sorted-array intersection;
    * this is the VERIFICATION harness, not the scale path: the banded
    * LSH join is the production candidate generator, and this exhaustive
    * pass exists so the driver can check its recall exactly.
    */
  def bruteForcePairs(spark: SparkSession, docs: DataFrame, shingleW: Int,
      threshold: Double): DataFrame = {
    import spark.implicits._
    val sets = graft.Tables.spread(docs.select(col("doc_id"), col("text")))
      .as[(Long, String)]
      .map { case (id, t) =>
        val sh = shingleHashes(t, shingleW)
        java.util.Arrays.sort(sh)
        (id, sh)
      }
      .collect().sortBy(_._1)
    val bc = spark.sparkContext.broadcast(sets)
    val par = spark.sparkContext.defaultParallelism

    def interSize(a: Array[Long], b: Array[Long]): Int = {
      var i = 0; var j = 0; var n = 0
      while (i < a.length && j < b.length) {
        if (a(i) < b(j)) i += 1
        else if (a(i) > b(j)) j += 1
        else { n += 1; i += 1; j += 1 }
      }
      n
    }

    spark.createDataset(sets.indices.toSeq)
      .repartition(par)
      .flatMap { ai =>
        val all = bc.value
        val (ida, sa) = all(ai)
        Iterator.range(ai + 1, all.length).flatMap { bi =>
          val (idb, sb) = all(bi)
          val inter = interSize(sa, sb)
          val union = sa.length + sb.length - inter
          val j = if (union == 0) 1.0 else inter.toDouble / union
          if (j >= threshold) Iterator.single((ida, idb, j)) else Iterator.empty
        }
      }
      .toDF("doc_a", "doc_b", "jaccard")
  }

  // ---- SimHash ------------------------------------------------------------

  /** 64-bit SimHash over token FNV hashes (unit weights). */
  def simhash(text: String): Long = {
    val counts = new Array[Int](64)
    tokens(text).foreach { t =>
      val h = Fnv64.hashString(t)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (counts(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  case class SimhashRow(doc_id: Long, simhash: Long)
  case class SimPair(doc_a: Long, doc_b: Long, hamming: Int)

  /** Near-dup pairs with Hamming(simhash) ≤ maxDist, candidates via
    * 4×16-bit chunk banding (pigeonhole: dist ≤ 3 ⇒ some chunk equal).
    *
    * The full 8-byte signature RIDES THROUGH the bucket self-join, so the
    * Hamming test is a codegen'd `bit_count(a ^ b)` evaluated inside the
    * join output and candidate pairs are filtered to true near-dups before
    * anything materializes; `distinct()` then dedups only the (small)
    * survivor set. The earlier shape — distinct the raw candidate pairs,
    * then join the signature table back on each side — shuffled the full
    * Σ|bucket|² candidate stream three times, which the 10× probe measured
    * as the dominant (and super-linear-looking) cost on skewed chunk
    * buckets; carrying 8 extra bytes per chunk row removes all of it. */
  def simhashPairs(spark: SparkSession, docs: DataFrame, maxDist: Int): Dataset[SimPair] = {
    import spark.implicits._
    // spread (r11): the per-doc 64-bit SimHash fold is the CPU-heavy map
    // stage; see shingledSets
    val chunks = graft.Tables.spread(docs.select(col("doc_id"), col("text")))
      .as[(Long, String)]
      .flatMap { case (id, t) =>
        val s = simhash(t)
        (0 until 4).iterator.map(c => (id, c, (s >>> (16 * c)) & 0xffffL, s))
      }
      .toDF("doc_id", "chunk", "key", "sim")
      .cache() // feeds both sides of the bucket join (one signature pass)
    chunks.toDF("doc_a", "chunk", "key", "sim_a")
      .join(chunks.toDF("doc_b", "chunk", "key", "sim_b"), Seq("chunk", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr(s"CAST(bit_count(sim_a ^ sim_b) AS INT)").as("hamming"))
      .filter(col("hamming") <= maxDist)
      .distinct()
      .as[SimPair]
  }

  /** Exhaustive Hamming ≤ maxDist pairs over the same 64-bit signatures —
    * ground truth for the d3 banding invariant (pigeonhole says the banded
    * set must EQUAL this). Signatures are 8 bytes/doc, so the broadcast is
    * bounded even for large corpora; the n² popcount loop is the
    * verification harness only. */
  def simhashBruteForce(spark: SparkSession, docs: DataFrame, maxDist: Int): DataFrame = {
    import spark.implicits._
    val sigs = graft.Tables.spread(docs.select(col("doc_id"), col("text")))
      .as[(Long, String)].map { case (id, t) => (id, simhash(t)) }
      .collect().sortBy(_._1)
    val bc = spark.sparkContext.broadcast(sigs)
    val par = spark.sparkContext.defaultParallelism
    spark.createDataset(sigs.indices.toSeq)
      .repartition(par)
      .flatMap { ai =>
        val all = bc.value
        val (ida, sa) = all(ai)
        Iterator.range(ai + 1, all.length).flatMap { bi =>
          val (idb, sb) = all(bi)
          val d = java.lang.Long.bitCount(sa ^ sb)
          if (d <= maxDist) Iterator.single((ida, idb, d)) else Iterator.empty
        }
      }
      .toDF("doc_a", "doc_b", "hamming")
  }
}
