package graft.ops

import graft.SparkSuite

import scala.util.Random

class MisraGriesSpec extends SparkSuite {

  private def exactCounts(items: Seq[String]): Map[String, Long] =
    items.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }

  /** Zipf-ish stream: a few dominant tokens over a long uniform tail. */
  private def zipfStream(n: Int, seed: Int): Seq[String] = {
    val rnd = new Random(seed)
    (0 until n).map { _ =>
      val r = rnd.nextDouble()
      if (r < 0.30) "alpha"
      else if (r < 0.45) "beta"
      else if (r < 0.55) "gamma"
      else s"tail${rnd.nextInt(5000)}"
    }
  }

  test("estimates never overcount and undercount at most n/(k+1)") {
    val k = 16
    val items = zipfStream(20000, seed = 1)
    val truth = exactCounts(items)
    val mg = new MisraGries(k)
    val summary = items.foldLeft(mg.zero)(mg.reduce)
    val bound = items.size.toDouble / (k + 1)
    summary.foreach { case (t, est) =>
      assert(est <= truth(t), s"$t overcounted: est=$est true=${truth(t)}")
      assert(truth(t) - est <= bound + 1e-9,
        s"$t undercount ${truth(t) - est} exceeds n/(k+1)=$bound")
    }
  }

  test("every item with frequency > n/(k+1) is present, also after merges") {
    val k = 16
    val items = zipfStream(30000, seed = 2)
    val truth = exactCounts(items)
    val mg = new MisraGries(k)
    // split into 8 chunks, reduce each, merge pairwise — the distributed path
    val partials = items.grouped(items.size / 8 + 1)
      .map(_.foldLeft(mg.zero)(mg.reduce)).toSeq
    val merged = partials.reduce(mg.merge)
    assert(merged.size <= k)
    val thresh = items.size.toDouble / (k + 1)
    truth.filter(_._2 > thresh).keys.foreach { t =>
      assert(merged.contains(t), s"heavy hitter $t missing after merge")
    }
    merged.foreach { case (t, est) => assert(est <= truth(t)) }
  }

  test("Dataset aggregation path matches the sequential fold's containment") {
    import spark.implicits._
    val k = 8
    val items = zipfStream(5000, seed = 3)
    val truth = exactCounts(items)
    val sketch = spark.createDataset(items).repartition(4)
      .select(new MisraGries(k).toColumn.name("mg")).head()
    assert(sketch.size <= k)
    val thresh = items.size.toDouble / (k + 1)
    truth.filter(_._2 > thresh).keys.foreach { t =>
      assert(sketch.contains(t), s"heavy hitter $t missing from Dataset agg")
    }
  }
}
