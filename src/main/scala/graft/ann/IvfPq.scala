package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-PQ: the coarse quantizer (Ivf) composed with product-quantization
  * code scans (Pq) — the production ANN layout when the corpus neither
  * fits warm NOR can be exhaustively ADC-scanned per query.
  *
  *   - Ivf alone bounds the candidate set (probe `nprobe` of `nlist`
  *     inverted lists) but pays full float-vector cosines per candidate;
  *   - Pq alone scans 8-byte codes (32x less memory bandwidth) but scans
  *     EVERY corpus code for every query;
  *   - IvfPq pays M byte-lookups only for (query, vector) pairs that share
  *     a probed list: cost per query ≈ (n/nlist)·nprobe ADC adds, and the
  *     scan touches codes, never the 32x bigger float vectors.
  *
  * Spark shape: candidate generation is MAP-SIDE — the probe table
  * (query -> probed centroids, |Q|·nprobe entries) inverts into a
  * broadcast centroid -> [(qid, ADC table)] map, so the encoded-corpus
  * scan scores each vector against exactly the queries probing its list.
  * No shuffle exists until the TopK heap cut (≤ k·refine rows per query),
  * then the exact-cosine refine re-ranks survivors. Deterministic end to
  * end (stride centroids, stride codebook sample, ties by id).
  *
  * Ref: the reference has no ANN surface; this extends SURVEY §7.2-7 with
  * the builder prompt's "IVF or LSH-bucketed variant as the scale path".
  */
object IvfPq {

  case class EncodedIn(cid: Long, centroid: Int, codes: Array[Byte])

  /** r = v̂ − ĉ against the given (normalized) centroid array — shared by
    * the driver-side codebook trainer and the executor-side encode map
    * (which passes the broadcast value). */
  private def residual(vn: Array[Float], ci: Int,
      cents: Array[(Int, Array[Float])]): Array[Float] = {
    val c = cents(ci)._2
    val out = new Array[Float](vn.length)
    var i = 0
    while (i < vn.length) { out(i) = vn(i) - c(i); i += 1 }
    out
  }

  /** Approximate top-k: IVF probe bounding + ADC code scoring + exact
    * refine. Knobs: `nLists = 0` derives nlist/nprobe from the corpus
    * count exactly like [[Ivf.topK]] (including the 1/6 recall floor);
    * m/ks/refine and `excludeSelf` (drop candidates whose corpus id
    * equals the query id — pass false for a disjoint query set) follow
    * [[Pq.topK]]. */
  def topK(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
      k: Int, m: Int = 8, ks: Int = 64, refine: Int = 16,
      nLists: Int = 0, nProbe: Int = 0,
      excludeSelf: Boolean = true): DataFrame = {
    import spark.implicits._
    val n = corpus.count()
    val nl =
      if (nLists > 0) nLists
      else math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt)
    val np =
      if (nProbe > 0) nProbe
      else math.max(math.max(4, math.ceil(math.sqrt(nl.toDouble)).toInt),
        (nl + 5) / 6)

    val cents = Ivf.centroids(corpus, nl, n)
    // RESIDUAL encoding (the FAISS IVFPQ design): codes quantize
    // r = v̂ − ĉ, not v̂ itself. dot(q̂, v̂) = dot(q̂, ĉ) + dot(q̂, r)
    // decomposes exactly, the first term is computed exactly per
    // (query, probed list), and residuals are far tighter than raw
    // vectors — same 8-byte code, roughly half the quantization error.
    val centsN = cents.map { case (i, v) => (i, Pq.normalize(v)) }
    val bcCentsN = spark.sparkContext.broadcast(centsN)

    // residual-space codebooks from a bounded stride sample (reuses the
    // corpus count — one count action total, like Ivf.topK)
    val resSample = Pq.strideSample(corpus, n).map { vn =>
      residual(vn, Ivf.nearestCentroids(vn, centsN, 1).head, centsN)
    }
    val books = Pq.codebooksFromPoints(resSample, m, ks)
    val bcBooks = spark.sparkContext.broadcast(books)

    // one corpus pass: list assignment + residual PQ encoding together
    val encoded = corpus.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        val vn = Pq.normalize(v)
        val ci = Ivf.nearestCentroids(vn, bcCentsN.value, 1).head
        EncodedIn(id, ci, Pq.encode(residual(vn, ci, bcCentsN.value), bcBooks.value))
      }

    // queries are small (the n2 query-set contract): their probed lists,
    // exact dot(q̂, ĉ) bases, and residual ADC tables broadcast, inverted
    // to centroid -> probing queries
    def dotL(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0
      var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val qSide: Array[(Long, Seq[Int], Array[Float])] = queries
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
      .map { case (qid, qv) =>
        val qn = Pq.normalize(qv)
        (qid, Ivf.nearestCentroids(qn, centsN, np), qn)
      }
    // two broadcast structures, so each query's m×ks ADC table serializes
    // ONCE, not once per probed centroid (nprobe-fold blow-up otherwise)
    val qTables: Map[Long, Array[Array[Double]]] =
      qSide.map { case (qid, _, qn) => qid -> Pq.adcTable(qn, books) }.toMap
    val byCentroid: Map[Int, Array[(Long, Double)]] =
      qSide.flatMap { case (qid, cs, qn) =>
        cs.map(c => (c, (qid, dotL(qn, centsN(c)._2))))
      }.groupBy(_._1).map { case (c, xs) => (c, xs.map(_._2)) }
    val bcTables = spark.sparkContext.broadcast(qTables)
    val bcProbes = spark.sparkContext.broadcast(byCentroid)

    // map-side candidate scoring: each encoded vector pays M byte-lookups
    // per query PROBING ITS LIST — never per query globally
    val adcScores = encoded.mapPartitions { it =>
      val probes = bcProbes.value
      val tables = bcTables.value
      it.flatMap { e =>
        probes.get(e.centroid) match {
          case None => Iterator.empty
          case Some(qs) => qs.iterator.collect {
            case (qid, base) if !excludeSelf || qid != e.cid =>
              val table = tables(qid)
              var s = base
              var mi = 0
              while (mi < table.length) { s += table(mi)(e.codes(mi) & 0xff); mi += 1 }
              (qid, e.cid, s)
          }
        }
      }
    }.toDF("qid", "cid", "adc")

    // only k·refine survivors per query reach the shuffle, then exact
    // cosine re-ranks them (same refine tail as Pq.topK)
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
