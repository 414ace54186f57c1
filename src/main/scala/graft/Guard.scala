package graft

import scala.concurrent.{Await, ExecutionContext, Future, TimeoutException}
import scala.concurrent.duration._
import org.apache.spark.sql.SparkSession

/** Per-query watchdog for the harness mains: runs the body on a separate
  * thread inside a Spark job group and cancels the group on timeout, so
  * one pathological query cannot stall an entire Verify/Bench round.
  * Timeout via SPARK_GRAFT_QUERY_TIMEOUT_SEC (default 600 s). */
object Guard {
  private implicit val ec: ExecutionContext = ExecutionContext.global

  val timeoutSec: Long =
    sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT_SEC", "600").toLong

  /** Some(result) on success; None on timeout (job group cancelled).
    * Other exceptions propagate to the caller. */
  def timed[T](spark: SparkSession, name: String)(body: => T): Option[T] = {
    val group = s"graft-$name"
    val fut = Future {
      // job groups are thread-local: set inside the worker thread
      spark.sparkContext.setJobGroup(group, name, interruptOnCancel = true)
      try body finally spark.sparkContext.clearJobGroup()
    }
    try Some(Await.result(fut, timeoutSec.seconds))
    catch {
      case _: TimeoutException =>
        System.err.println(s"[guard] $name exceeded ${timeoutSec}s — cancelling")
        spark.sparkContext.cancelJobGroup(group)
        None
      case e: java.util.concurrent.ExecutionException => throw e.getCause
    }
  }
}
