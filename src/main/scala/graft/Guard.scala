package graft

import java.util.concurrent.{Executors, TimeUnit, TimeoutException}
import org.apache.spark.sql.SparkSession

/** Per-query watchdog for the harness mains: runs the body on a dedicated
  * single-use thread inside a Spark job group; on timeout it cancels the
  * job group (stopping executor-side work) AND interrupts the thread
  * (stopping driver-side work: collect loops, broadcast building, file
  * staging), so one pathological query cannot stall the round or keep
  * running underneath subsequent timed queries.
  * Timeout via SPARK_GRAFT_QUERY_TIMEOUT_SEC (default 600 s). */
object Guard {
  val timeoutSec: Long =
    sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT_SEC", "600").toLong

  /** Some(result) on success; None on timeout (job group cancelled, worker
    * thread interrupted). Other exceptions propagate to the caller. */
  def timed[T](spark: SparkSession, name: String)(body: => T): Option[T] = {
    val group = s"graft-$name"
    val exec = Executors.newSingleThreadExecutor { r =>
      val t = new Thread(r, s"guard-$name"); t.setDaemon(true); t
    }
    val fut = exec.submit(new java.util.concurrent.Callable[T] {
      def call(): T = {
        // job groups are thread-local: set inside the worker thread
        spark.sparkContext.setJobGroup(group, name, interruptOnCancel = true)
        try body finally spark.sparkContext.clearJobGroup()
      }
    })
    try Some(fut.get(timeoutSec, TimeUnit.SECONDS))
    catch {
      case _: TimeoutException =>
        System.err.println(s"[guard] $name exceeded ${timeoutSec}s — cancelling")
        spark.sparkContext.cancelJobGroup(group)
        fut.cancel(true) // interrupts the worker thread
        None
      case e: java.util.concurrent.ExecutionException => throw e.getCause
    } finally exec.shutdown()
  }
}
