package graft.text

import graft.{SparkEntry, SparkSuite, Tables}

/** t23 semantics pin: recount one collocation's statistics with plain
  * Scala string ops (no Spark, no SQL) and reproduce its lift — an
  * independent third formulation alongside the Spark plan and the DuckDB
  * oracle, so a tokenization or join slip can't hide in mirrored code.
  */
class PmiSpec extends SparkSuite {

  test("t23 lift reproduces from a driver-side recount of the corpus") {
    val rows = SparkEntry.queries("t23_pmi_collocations")(spark, sf)
      .orderBy("bigram").limit(3).collect()
    assert(rows.nonEmpty, "no bigram reached min-count 5 in the fixture")

    val texts = Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0))
    val tokLists = texts.map(_.trim.split("\\s+").toSeq)
    val n = tokLists.map(_.size).sum.toLong
    val uni = tokLists.flatten.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val bi = tokLists.filter(_.size >= 2)
      .flatMap(ws => ws.sliding(2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case (p, g) => p -> g.size.toLong }

    rows.foreach { r =>
      val Array(wa, wb) = r.getString(0).split(" ", 2)
      val cab = r.getLong(1)
      val lift = r.getDouble(2)
      assert(bi((wa, wb)) == cab, s"c($wa $wb)")
      val expect = math.floor(
        (cab * n).toDouble / (uni(wa) * uni(wb)).toDouble * 1e6 + 0.5) / 1e6
      assert(lift == expect, s"lift($wa $wb): $lift vs $expect")
    }
  }
}
