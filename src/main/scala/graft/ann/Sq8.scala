package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Int8 scalar-quantization ANN (the SQ8 layout of FAISS's
  * IndexScalarQuantizer): each element of the L2-normalized vector is
  * affine-mapped to one unsigned byte against PER-DIMENSION [min, max]
  * bounds — a 4× smaller scan than float32 (64 vs 256 bytes at dim 64)
  * with far less distortion than PQ's 8-byte codes, so it sits between
  * brute force and PQ on the memory/recall curve. The middle tier most
  * production vector stores actually run.
  *
  * Pipeline:
  *   1. fit: per-dimension (min, max) over the normalized corpus — ONE
  *      distributed partial agg on (pos) keys (the shuffle carries
  *      dim × partitions rows, nothing vector-sized); the 2·dim bounds
  *      collect to the driver (a bounded fit artifact, like IVF
  *      centroids) and broadcast;
  *   2. encode: map-only; code_i = round(255·(x_i − mn_i)/(mx_i − mn_i))
  *      clamped to [0, 255], stored as bytes;
  *   3. query: ASYMMETRIC scoring — the full-precision query against the
  *      dequantized code, folded as score = Σ q_i·mn_i + Σ (q_i·s_i)·c_i
  *      with s_i = (mx_i − mn_i)/255: the per-query constant and the
  *      weight array q_i·s_i are precomputed once per query, so the scan
  *      does dim byte-weighted multiply-adds per (query, vector) and
  *      never touches the 4× bigger floats;
  *   4. refine: top (k·refine) approximate candidates per query — cut by
  *      the custom [[graft.plans.TopK]] operator so the shuffle carries
  *      only survivors — then exact-cosine re-rank to the final top-k.
  *
  * Deterministic end to end: exact min/max fit, half-up rounding, ties
  * broken by (score desc, cid).
  */
object Sq8 {

  case class Encoded(cid: Long, codes: Array[Byte])
  case class Approx(qid: Long, cid: Long, approx: Double)

  /** Per-dimension (min, max) of the normalized corpus, via one
    * distributed partial agg over (pos, value) rows. Returns bounds
    * aligned by dimension index. */
  def fitBounds(spark: SparkSession, corpus: DataFrame): Array[(Double, Double)] = {
    import spark.implicits._
    val pos = corpus.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .flatMap { case (_, v) =>
        val nv = Pq.normalize(v)
        nv.iterator.zipWithIndex.map { case (x, i) => (i, x.toDouble) }
      }
      .toDF("pos", "x")
    pos.groupBy("pos").agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .orderBy("pos")
      .collect()
      .map(r => (r.getDouble(1), r.getDouble(2)))
  }

  /** Quantize one normalized vector against the fitted bounds. */
  private[ann] def encode(v: Array[Float], bounds: Array[(Double, Double)]): Array[Byte] = {
    val out = new Array[Byte](v.length)
    var i = 0
    while (i < v.length) {
      val (mn, mx) = bounds(i)
      val span = mx - mn
      val c =
        if (span <= 0.0) 0
        else {
          val t = math.floor((v(i).toDouble - mn) / span * 255.0 + 0.5)
          math.max(0.0, math.min(255.0, t)).toInt
        }
      out(i) = c.toByte
      i += 1
    }
    out
  }

  /** Dequantize a code back to its float approximation (spec support —
    * the query path never materializes this; it folds the affine map
    * into the per-query weights instead). */
  private[ann] def decode(codes: Array[Byte], bounds: Array[(Double, Double)]): Array[Double] = {
    Array.tabulate(codes.length) { i =>
      val (mn, mx) = bounds(i)
      mn + (mx - mn) / 255.0 * (codes(i) & 0xff)
    }
  }

  /** Approximate top-k by asymmetric SQ8 scan, exact-cosine refined.
    * Query/corpus contract matches [[Pq.topK]] (bounded query set,
    * `excludeSelf` for corpus-drawn queries). */
  def topK(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
      k: Int, refine: Int = 4, excludeSelf: Boolean = true): DataFrame = {
    import spark.implicits._
    val bounds = fitBounds(spark, corpus)
    val bcBounds = spark.sparkContext.broadcast(bounds)

    val encoded = corpus.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) => Encoded(id, encode(Pq.normalize(v), bcBounds.value)) }

    // per-query fold of the affine map: score = base + Σ w_i · code_i
    val qWeights: Array[(Long, Double, Array[Double])] = queries
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
      .map { case (qid, qv) =>
        val nq = Pq.normalize(qv)
        var base = 0.0
        val w = new Array[Double](nq.length)
        var i = 0
        while (i < nq.length) {
          val (mn, mx) = bounds(i)
          base += nq(i).toDouble * mn
          w(i) = nq(i).toDouble * (mx - mn) / 255.0
          i += 1
        }
        (qid, base, w)
      }
    val bcQ = spark.sparkContext.broadcast(qWeights)

    val approx = encoded.mapPartitions { it =>
      val qs = bcQ.value
      it.flatMap { e =>
        qs.iterator.collect {
          case (qid, base, w) if !excludeSelf || qid != e.cid =>
            var s = base
            var i = 0
            while (i < w.length) { s += w(i) * (e.codes(i) & 0xff); i += 1 }
            Approx(qid, e.cid, s)
        }
      }
    }.toDF("qid", "cid", "approx")

    val candidates = graft.plans.TopK.perKey(
      approx, Seq("qid"), "approx", Seq("cid"), k * refine)

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
