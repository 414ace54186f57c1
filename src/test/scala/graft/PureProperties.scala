package graft

import java.sql.Timestamp
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.functions.{Fnv64, GeoMean, ZOrder}
import graft.ops.Interpolate
import graft.text.Dedup

/** ScalaCheck properties over the engine's pure primitives (SURVEY §5
  * property-based layer). These run under sbt's native ScalaCheck support
  * — no Spark session needed, so they cover the hot per-row kernels at
  * generator scale.
  */
object PureProperties extends Properties("graft.pure") {

  private val text: Gen[String] = Gen.listOf(Gen.alphaNumStr).map(_.mkString(" "))

  property("geomean merge order never changes the result") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0.1, 1e6)), Gen.choose(1, 10)) {
      (xs, cut) =>
        val whole = xs.foldLeft(GeoMean.zero)(GeoMean.reduce)
        val (l, r) = xs.splitAt(cut % xs.length)
        val split = GeoMean.merge(
          l.foldLeft(GeoMean.zero)(GeoMean.reduce),
          r.foldLeft(GeoMean.zero)(GeoMean.reduce))
        math.abs(GeoMean.finish(split) - GeoMean.finish(whole)) <=
          1e-12 * math.abs(GeoMean.finish(whole))
    }

  property("zorder interleave roundtrips both dimensions") =
    forAll(Gen.choose(0L, 0xffffffffL), Gen.choose(0L, 0xffffffffL)) { (a, b) =>
      val z = ZOrder.interleave(a, b)
      def unspread(v: Long): Long = {
        var x = v & 0x5555555555555555L
        x = (x | (x >>> 1)) & 0x3333333333333333L
        x = (x | (x >>> 2)) & 0x0f0f0f0f0f0f0f0fL
        x = (x | (x >>> 4)) & 0x00ff00ff00ff00ffL
        x = (x | (x >>> 8)) & 0x0000ffff0000ffffL
        (x | (x >>> 16)) & 0xffffffffL
      }
      unspread(z) == a && unspread(z >>> 1) == b
    }

  property("fnv64 is deterministic") = forAll(text) { s =>
    Fnv64.hashString(s) == Fnv64.hashString(s)
  }

  property("fnv64 changes when a byte is appended") =
    forAll(text) { s => Fnv64.hashString(s) != Fnv64.hashString(s + "x") }

  property("jaccard in [0,1], symmetric, 1 on self") =
    forAll(Gen.listOf(Gen.long), Gen.listOf(Gen.long)) { (a, b) =>
      val (aa, bb) = (a.toArray, b.toArray)
      val j = Dedup.jaccard(aa, bb)
      j >= 0.0 && j <= 1.0 &&
        Dedup.jaccard(bb, aa) == j &&
        (aa.isEmpty || Dedup.jaccard(aa, aa) == 1.0)
    }

  property("simhash hamming: 0 on self, symmetric, bounded by 64") =
    forAll(text, text) { (s, t) =>
      val (a, b) = (Dedup.simhash(s), Dedup.simhash(t))
      Dedup.hamming(a, a) == 0 &&
        Dedup.hamming(a, b) == Dedup.hamming(b, a) &&
        Dedup.hamming(a, b) <= 64
    }

  property("minhash signature agreement estimates jaccard within 0.35") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0L, 500L))) { xs =>
      val a = xs.toArray.distinct
      val b = a.take(math.max(a.length / 2, 1)) ++ Array(9999L)
      val sa = Dedup.minhashSignature(a)
      val sb = Dedup.minhashSignature(b)
      val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / sa.length
      math.abs(est - Dedup.jaccard(a, b)) <= 0.35
    }

  private def pt(i: Int, v: Option[Double]) =
    Interpolate.Pt(1L, new Timestamp(i * 1000L), i.toLong, v)

  property("streaming interpolation recovers arbitrary parabolas exactly") =
    forAll(Gen.choose(-5.0, 5.0), Gen.choose(-5.0, 5.0), Gen.choose(-5.0, 5.0)) {
      (p, q, r) =>
        def f(x: Double) = p * x * x + q * x + r
        // knowns at positions 0,1,3,4 — null at 2 interpolates on (0,1,3)
        val in = Seq(
          pt(0, Some(f(0))), pt(1, Some(f(1))), pt(2, None),
          pt(3, Some(f(3))), pt(4, Some(f(4))))
        val out = Interpolate.series(in.iterator).toSeq.sortBy(_.event_id)
        out.length == in.length && math.abs(out(2).v_interp - f(2)) < 1e-6
    }

  property("streaming interpolation preserves known values verbatim") =
    forAll(Gen.nonEmptyListOf(Gen.option(Gen.choose(-100.0, 100.0)))) { vs =>
      val in = vs.zipWithIndex.map { case (v, i) => pt(i, v) }
      val out = Interpolate.series(in.iterator).toSeq.sortBy(_.event_id)
      out.length == in.length &&
        out.zip(vs).forall {
          case (o, Some(v)) => o.v_interp == v
          case (_, None) => true
        }
    }
}
