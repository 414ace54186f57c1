package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Kahan-compensated log-sum accumulator (object-level: method-local case
  * classes cannot get product Encoders). */
case class GeoAcc(sum: Double, comp: Double, n: Long)

/** Typed UDAF (SURVEY §2.10 boundary, Spark `Aggregator` surface): geometric
  * mean as exp(mean(ln x)).
  *
  * The log-sum uses Kahan compensation so the partial-merge order Spark
  * chooses at runtime (which is not deterministic across runs on a cluster)
  * cannot meaningfully drift the result: compensation keeps each partial
  * within ~1 ulp, so merge-order drift stays far below the 1e-6 rounding
  * grain that `a12_geomean_udaf` applies (`Num.r6`). Kahan does NOT make
  * the fold exactly associative — do not drop the `Num.r6` guard on the
  * strength of this accumulator alone (a half-boundary value could still
  * flip without it).
  */
object GeoMean extends Aggregator[Double, GeoAcc, Double] {
  private def kahanAdd(sum: Double, comp: Double, x: Double): (Double, Double) = {
    val y = x - comp
    val t = sum + y
    (t, (t - sum) - y)
  }
  override def zero: GeoAcc = GeoAcc(0.0, 0.0, 0L)
  override def reduce(acc: GeoAcc, x: Double): GeoAcc = {
    val (s, c) = kahanAdd(acc.sum, acc.comp, math.log(x))
    GeoAcc(s, c, acc.n + 1)
  }
  override def merge(a: GeoAcc, b: GeoAcc): GeoAcc = {
    val (s1, c1) = kahanAdd(a.sum, a.comp, b.sum)
    val (s2, c2) = kahanAdd(s1, c1, -b.comp)
    GeoAcc(s2, c2, a.n + b.n)
  }
  override def finish(acc: GeoAcc): Double =
    if (acc.n == 0L) Double.NaN else math.exp(acc.sum / acc.n)
  override def bufferEncoder: Encoder[GeoAcc] = Encoders.product[GeoAcc]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
