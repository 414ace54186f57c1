package graft.plans

import graft.{SparkEntry, SparkSuite}

/** Fleet-wide guard audit (ADVICE r9): with `spark.graft.guard.cartesian`
  * enabled, EVERY query in the suite must optimize cleanly — i.e. each
  * intentional tiny cross join carries its broadcast() hint and nothing
  * anywhere relies on an unhinted cartesian. This is the platform-team
  * scenario the guard exists for (flip it on fleet-wide, nothing breaks),
  * checked at the optimizer level on sf0.001: `optimizedPlan` runs the
  * guard rule without executing the final frame. Streaming queries are
  * excluded — invoking them runs real micro-batch jobs (their batch twins
  * are all swept), as is s3 (its construction path writes a sink).
  */
class CartesianGuardSweepSpec extends SparkSuite {

  test("every batch query optimizes with the cartesian guard enabled") {
    GraftExtensions.install(spark)
    spark.conf.set(CartesianGuard.EnabledKey, "true")
    try {
      val failures = SparkEntry.queries.toSeq.sortBy(_._1)
        .filterNot { case (n, _) => n.startsWith("st") }
        .flatMap { case (name, fn) =>
          try { fn(spark, sf).queryExecution.optimizedPlan; None }
          catch {
            case e: Throwable =>
              def msgs(t: Throwable): Seq[String] =
                if (t == null) Nil
                else Option(t.getMessage).toSeq ++ msgs(t.getCause)
              if (msgs(e).exists(_.contains("CartesianGuard")))
                Some(s"$name: ${e.getMessage}")
              else None // non-guard construction failures belong to Verify
          }
        }
      assert(failures.isEmpty,
        s"unhinted cartesian products under the guard:\n${failures.mkString("\n")}")
    } finally spark.conf.set(CartesianGuard.EnabledKey, "false")
  }
}
