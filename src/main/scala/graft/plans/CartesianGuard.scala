package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.{Cross, FullOuter, Inner, LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in plan guardrail: reject unhinted cartesian products at
  * optimization time.
  *
  * On a 100 TB lake the accidental cross join is the classic platform
  * incident: a missing join condition type-checks, runs fine on the dev
  * sample, and detonates as |A|·|B| in production. Spark's own
  * `spark.sql.crossJoin.enabled` has defaulted to true since 3.0, so
  * nothing stops it. This rule restores the guard as a LIBRARY policy
  * with an escape hatch that encodes this repo's discipline: a cross
  * join whose build side carries an explicit `broadcast()` hint is the
  * legitimate "attach a 1-row stats frame" pattern (bounded by the
  * broadcast size limit) and passes; a condition-less inner/cross join
  * with NO broadcast hint throws with a pointer to the fix.
  *
  * Registered with the other extensions (`GraftExtensions`) but gated
  * off by default behind [[CartesianGuard.EnabledKey]] — a guardrail a
  * platform team turns on fleet-wide, not a semantics change. Runs as
  * an optimizer rule (experimental-methods installable on a live
  * session, unlike `injectCheckRule` which only applies at session
  * build) that inspects and returns the plan unchanged.
  */
object CartesianGuard extends Rule[LogicalPlan] {
  val EnabledKey = "spark.graft.guard.cartesian"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(EnabledKey, "false").toBoolean) {
      plan.foreach {
        // Outer joins without a condition are the same |A|x|B| detonation
        // as cross/inner (every row pairs with every row; the "outer" part
        // never fires because nothing is unmatched), so they are guarded
        // identically. Semi/anti are excluded: condition-less they degrade
        // to EXISTS/NOT-EXISTS on a non-empty side — output is bounded by
        // |A|, not a product.
        case j: Join if j.condition.isEmpty &&
            Seq(Cross, Inner, LeftOuter, RightOuter, FullOuter)
              .contains(j.joinType) &&
            !Seq(j.hint.leftHint, j.hint.rightHint).flatten
              .exists(_.strategy.contains(BROADCAST)) =>
          throw new IllegalStateException(
            "CartesianGuard: condition-less product-shaped join " +
              "(cross/inner/outer) with no " +
              "broadcast hint — at scale this is |A|x|B|. Either add the " +
              "missing join condition, or mark the (small, bounded) side " +
              s"with broadcast(...) if the attach is intentional. Set " +
              s"$EnabledKey=false to disable the guard.")
        case _ => ()
      }
    }
    plan
  }
}
