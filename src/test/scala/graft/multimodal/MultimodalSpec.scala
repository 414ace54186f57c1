package graft.multimodal

import graft.SparkSuite
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {

  test("decodeAndFeaturize preserves rows, emits fixed-width features, deterministic") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, "hello world".getBytes("UTF-8"), "image"),
      Multimodal.MediaRow(2L, Array.fill[Byte](4096)(7), "video"),
      Multimodal.MediaRow(3L, Array.emptyByteArray, "audio")
    ).toDS()
    val out1 = Multimodal.decodeAndFeaturize(spark, media).collect().sortBy(_.media_id)
    val out2 = Multimodal.decodeAndFeaturize(spark, media).collect().sortBy(_.media_id)
    assert(out1.length === 3)
    assert(out1.forall(_.features.length === Multimodal.FeatureDim))
    assert(out1.map(_.n_bytes).toSeq === Seq(11, 4096, 0))
    // video frame sampling stub engages only for video
    assert(out1.find(_.media_id == 2L).get.n_frames > 1)
    assert(out1.find(_.media_id == 1L).get.n_frames === 1)
    // determinism across runs
    out1.zip(out2).foreach { case (a, b) =>
      assert(a.features.toSeq === b.features.toSeq)
      assert((a.width, a.height) === (b.width, b.height))
    }
  }

  test("empty bytes do not divide by zero") {
    import spark.implicits._
    val media = Seq(Multimodal.MediaRow(9L, Array.emptyByteArray, "image")).toDS()
    val out = Multimodal.decodeAndFeaturize(spark, media).collect().head
    assert(out.features.forall(f => !f.isNaN && !f.isInfinite))
  }

  test("m3 banding at a 10× signature table: planted recall and candidate density") {
    // VERDICT r8 #5: byte-level ops are excluded from the word-rename
    // probe replica (the rename is byte-UNFAIR), so m3's scale pin lives
    // at the SIGNATURE level — independent pseudo-random 60-bit
    // signatures at 10× the fixture's ~525-doc population, with planted
    // Hamming-{0..3} twins. Pins the two properties the probe would
    // read: (a) pigeonhole recall — every planted pair at Hamming ≤ 3
    // must surface (4×15-bit banding guarantees a shared chunk), and
    // (b) candidate density — random signatures collide per band at
    // 2^-15, so candidates/doc must stay bounded (the linear-vs-
    // quadratic candidate-stage property that made dHash the pick).
    import spark.implicits._
    def splitmix(x0: Long): Long = {
      var z = x0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val n = 5250
    val base = (0L until n).map(i => (i, splitmix(i) & ((1L << 60) - 1)))
    val planted = base.filter(_._1 % 20 == 0).map { case (id, sig) =>
      val flips = (id % 4).toInt // Hamming 0..3
      val flipped = (0 until flips).foldLeft(sig) { (s, j) =>
        s ^ (1L << (((id * 7 + j * 13) % 60).toInt))
      }
      (id + 1000000L, flipped)
    }
    val sigs = (base ++ planted).toDF("doc_id", "sig")
    val nDocs = base.size + planted.size
    val cand = Multimodal.phashCandidates(sigs).count()
    val density = cand.toDouble / nDocs
    info(f"10x signature table: $cand candidates, $density%.2f per doc")
    assert(density <= 10.0, f"candidates/doc $density%.2f above the bound")
    val found = Multimodal.phashNeardupPairs(sigs)
      .filter(col("doc_b") >= 1000000L && col("doc_a") === col("doc_b") - 1000000L)
      .count()
    val recall = found.toDouble / planted.size
    info(f"planted Hamming<=3 recall = $recall%.3f over ${planted.size} pairs")
    assert(recall >= 0.9, f"planted recall $recall%.3f below the m3 pin")
  }

  test("m4 keyframes: constructed scenes produce exactly the expected cuts") {
    import spark.implicits._
    // frame A (ascending bytes): all 15 dHash diff bits set; frame B
    // (descending): none — Hamming(A, B) = 15 ≥ 4, a guaranteed cut
    val A = "abcdefghijklmnop"
    val B = "ponmlkjihgfedcba"
    val dir = java.nio.file.Files.createTempDirectory("m4spec").toString
    Seq(
      (1L, A * 4),      // frames AAAA, sampled {0,2}: equal sigs -> 1 keyframe
      (2L, A + A + B + B), // sampled {0,2} = A,B: scene cut -> 2 keyframes
      (3L, "tiny")      // < 16 bytes: no frames at all
    ).toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val out = graft.queries.MultimodalPack.queries("m4_video_keyframes")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == (4L, 2L, 1L))
    assert(out(2L) == (4L, 2L, 2L))
    assert(out(3L) == (0L, 0L, 0L))
  }

  test("m5 audio energy: silence, head-trim, and mean energy on constructed frames") {
    import spark.implicits._
    // 8 spaces = a frame of zero energy (silent); 8 'x' (ascii 120):
    // energy 8·88² = 61952 ≥ 5000 (loud)
    val S = " " * 8
    val L = "x" * 8
    val dir = java.nio.file.Files.createTempDirectory("m5spec").toString
    Seq(
      (1L, S + S + L + S),  // lead_trim 2, 3 silent, 4 frames
      (2L, L + L),          // no silence
      (3L, S * 3),          // all silent: lead_trim = n_frames
      (4L, "tiny")          // < 8 bytes: no frames
    ).toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val out = graft.queries.MultimodalPack.queries("m5_audio_energy")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(out(1L)._1 == (4L, 3L, 2L))
    assert(out(1L)._2.contains(61952.0 / 4))
    assert(out(2L)._1 == (2L, 0L, 0L))
    assert(out(2L)._2.contains(61952.0))
    assert(out(3L)._1 == (3L, 3L, 3L))
    assert(out(3L)._2.contains(0.0))
    assert(out(4L)._1 == (0L, 0L, 0L))
    assert(out(4L)._2.isEmpty, "frameless doc has NULL mean energy")
  }
}
