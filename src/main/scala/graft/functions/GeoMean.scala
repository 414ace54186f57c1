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
  * cannot drift the result: each partial is exact to ~1 ulp, so any merge
  * tree yields the same double after the final exp/round. That is the same
  * associativity-by-construction argument `graft.Num.decSum` makes for
  * decimal sums — required for oracle-exactness at any partition count.
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
