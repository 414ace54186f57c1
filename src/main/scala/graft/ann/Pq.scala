package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-quantization ANN (IVF-PQ's compression half): the 100 TB memory
  * path for similarity search.
  *
  * A 64-dim float vector is 256 bytes; its PQ code here is M=8 bytes — a
  * 32× smaller scan per comparison, which is what makes exhaustive
  * candidate scoring memory-bandwidth-feasible when the corpus no longer
  * fits warm. Pipeline:
  *
  *   1. train: per-subspace k-means codebooks (Lloyd on a bounded
  *      deterministic sample, driver-side — O(sample·ks·iters) regardless
  *      of corpus size, like IVF centroid refresh);
  *   2. encode: map-only; each L2-normalized vector → M nearest-codeword
  *      ids (codebooks broadcast);
  *   3. query: ADC — per query an M×ks table of subspace dot products,
  *      each corpus code scored by M table lookups (approximate cosine,
  *      since inputs are normalized);
  *   4. refine: top (k·refine) ADC candidates per query — cut by the
  *      custom [[graft.plans.TopK]] operator, so the shuffle carries only
  *      survivors — then exact-cosine re-rank to the final top-k.
  *
  * Deterministic end to end: stride sample, stride init, fixed iteration
  * count, ties broken by (score desc, cid).
  */
object Pq {

  case class Encoded(cid: Long, codes: Array[Byte])
  case class Adc(qid: Long, cid: Long, adc: Double)

  private[ann] def normalize(v: Array[Float]): Array[Float] = {
    var n2 = 0.0
    var i = 0
    while (i < v.length) { n2 += v(i).toDouble * v(i).toDouble; i += 1 }
    val n = math.sqrt(n2)
    if (n == 0.0) v.clone()
    else {
      val out = new Array[Float](v.length)
      i = 0
      while (i < v.length) { out(i) = (v(i) / n).toFloat; i += 1 }
      out
    }
  }

  private def sub(v: Array[Float], m: Int, subDim: Int): Array[Float] =
    java.util.Arrays.copyOfRange(v, m * subDim, (m + 1) * subDim)

  private def l2sq(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
    s
  }

  /** Per-subspace codebooks [m][ks][subDim] via Lloyd iterations on a
    * deterministic stride sample (collected once; bounded by sampleCap). */
  def codebooks(corpus: DataFrame, m: Int, ks: Int, sampleCap: Int = 512,
      iters: Int = 5): Array[Array[Array[Float]]] =
    codebooksFromPoints(strideSample(corpus, corpus.count(), sampleCap), m, ks, iters)

  /** Deterministic normalized stride sample, bounded by `cap`. `n` is the
    * corpus count the caller already holds (one count action per build).
    * Shared by [[codebooks]] and [[IvfPq]]'s residual trainer. */
  private[ann] def strideSample(corpus: DataFrame, n: Long,
      cap: Int = 512): Array[Array[Float]] = {
    val step = math.max(n / cap, 1L)
    corpus.filter(pmod(col("vec_id"), lit(step)) === 0)
      .orderBy(col("vec_id")).limit(cap)
      .select(col("embedding")).collect()
      .map(r => normalize(r.getSeq[Float](0).toArray))
  }

  /** Lloyd on caller-supplied training points — the residual-space entry
    * for [[IvfPq]] (its training points are v̂ − ĉ, not corpus rows). */
  private[ann] def codebooksFromPoints(sample: Array[Array[Float]], m: Int,
      ks: Int, iters: Int = 5): Array[Array[Array[Float]]] = {
    require(ks >= 1 && ks <= 256, s"codes are single bytes: ks must be in [1,256], got $ks")
    require(sample.nonEmpty, "empty corpus")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    Array.tabulate(m) { mi =>
      val pts = sample.map(v => sub(v, mi, subDim))
      // stride init over the sample, then fixed Lloyd iterations
      var cents = Array.tabulate(ks)(c => pts(c * pts.length / ks).clone())
      var it = 0
      while (it < iters) {
        val sums = Array.fill(ks)(new Array[Double](subDim))
        val counts = new Array[Long](ks)
        pts.foreach { p =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < ks) {
            val d = l2sq(p, cents(c)); if (d < bestD) { bestD = d; best = c }; c += 1
          }
          counts(best) += 1
          var j = 0
          while (j < subDim) { sums(best)(j) += p(j); j += 1 }
        }
        cents = Array.tabulate(ks) { c =>
          if (counts(c) == 0) cents(c) // keep empty clusters where they are
          else Array.tabulate(subDim)(j => (sums(c)(j) / counts(c)).toFloat)
        }
        it += 1
      }
      cents
    }
  }

  /** Per-query ADC lookup table: [m][ks] subspace dot products of the
    * (normalized) query against every codeword. Shared with [[IvfPq]]. */
  private[ann] def adcTable(q: Array[Float],
      books: Array[Array[Array[Float]]]): Array[Array[Double]] = {
    val m = books.length
    val ks = books(0).length
    val subDim = q.length / m
    Array.tabulate(m) { mi =>
      val qs = sub(q, mi, subDim)
      Array.tabulate(ks) { c =>
        val cw = books(mi)(c)
        var dot = 0.0
        var j = 0
        while (j < subDim) { dot += qs(j).toDouble * cw(j).toDouble; j += 1 }
        dot
      }
    }
  }

  /** PQ-encode one (already normalized) vector: M nearest-codeword ids.
    * Shared with [[IvfPq]]. */
  private[ann] def encode(v: Array[Float], books: Array[Array[Array[Float]]]): Array[Byte] = {
    val m = books.length
    val subDim = v.length / m
    val out = new Array[Byte](m)
    var mi = 0
    while (mi < m) {
      val s = sub(v, mi, subDim)
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < books(mi).length) {
        val d = l2sq(s, books(mi)(c)); if (d < bestD) { bestD = d; best = c }; c += 1
      }
      out(mi) = best.toByte
      mi += 1
    }
    out
  }

  /** Approximate top-k by ADC over PQ codes, exact-cosine refined.
    *
    * `excludeSelf` drops candidates whose corpus id equals the query id —
    * correct when queries are drawn from the corpus (the fixture setup);
    * pass `false` for a disjoint query set whose vec_ids may legitimately
    * collide with corpus ids. */
  def topK(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
      k: Int, m: Int = 8, ks: Int = 16, refine: Int = 8,
      excludeSelf: Boolean = true): DataFrame = {
    import spark.implicits._
    val books = codebooks(corpus, m, ks)
    val bcBooks = spark.sparkContext.broadcast(books)

    val encoded = corpus.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) => Encoded(id, encode(normalize(v), bcBooks.value)) }

    // queries are a small set: their ADC tables broadcast to the code scan
    val qTables: Array[(Long, Array[Array[Double]])] = queries
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
      .map { case (qid, qv) => (qid, adcTable(normalize(qv), bcBooks.value)) }
    val bcQ = spark.sparkContext.broadcast(qTables)

    // code scan: M byte-lookups + adds per (query, vector) — never touches
    // the 32x bigger float vectors
    val adcScores = encoded.mapPartitions { it =>
      val qs = bcQ.value
      it.flatMap { e =>
        qs.iterator.collect {
          case (qid, table) if !excludeSelf || qid != e.cid =>
            var s = 0.0
            var mi = 0
            while (mi < table.length) { s += table(mi)(e.codes(mi) & 0xff); mi += 1 }
            Adc(qid, e.cid, s)
        }
      }
    }.toDF("qid", "cid", "adc")

    // candidate cut through the custom two-phase heap operator: only
    // k·refine survivors per query reach the shuffle
    val candidates = graft.plans.TopK.perKey(
      adcScores, Seq("qid"), "adc", Seq("cid"), k * refine)

    val qEmb = queries.select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
      Similarity.l2norm(col("embedding")).as("q_norm"))
    val cEmb = corpus.select(col("vec_id").as("cid"), col("embedding").as("c_emb"),
      Similarity.l2norm(col("embedding")).as("c_norm"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    candidates
      .join(broadcast(qEmb), "qid")
      .join(cEmb, "cid")
      .withColumn("sim",
        graft.Num.r6(Similarity.dot(col("q_emb"), col("c_emb")) / col("q_norm") / col("c_norm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "cid", "sim")
  }
}
