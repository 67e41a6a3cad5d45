package graft.plans

import graft.{SparkEntry, SparkSuite}
import graft.streaming.PlanProbe
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.util.QueryExecutionListener

/** QueryPlanLintSpec's cartesian/nested-loop gate, extended to what the
  * streaming queries ACTUALLY execute per micro-batch. The batch lint
  * only sees an `s_stream_*` query's final result read; the incremental
  * plans live inside each `StreamExecution` and die with it. Two capture
  * paths close that gap:
  *
  *   1. [[PlanProbe]] — every streaming runner hands its last
  *      micro-batch `IncrementalExecution.executedPlan` to the probe
  *      (the last batch suffices: AvailableNow replans each trigger from
  *      the same logical template, so join shapes are batch-invariant).
  *   2. A `QueryExecutionListener` — `foreachBatch` pipelines run BATCH
  *      actions inside the batch function (index anti-joins, managed-
  *      table merges); those surface through the session's listener bus.
  *
  * Same rules as the batch lint: `CartesianProductExec` is never
  * acceptable; `BroadcastNestedLoopJoinExec` only when the broadcast side
  * is bounded by construction, allowlisted per query with the WHY.
  */
class StreamingPlanLintSpec extends SparkSuite {

  /** Bounded-broadcast BNLJ shapes inside streaming pipelines. */
  private val bnljBounded: Set[String] = Set(
    // one-row corpus-total frame broadcast onto the ≤|sources|×buckets
    // drift grid — the same bounded fanout the batch lint allowlists
    "s_stream_drift")

  private def offenders(p: SparkPlan): Seq[String] =
    p.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec =>
        s"CartesianProduct: ${c.simpleStringWithNodeId()}"
      case b: BroadcastNestedLoopJoinExec =>
        s"BNLJ(${b.buildSide}): ${b.simpleStringWithNodeId()}"
    }

  test("every streaming query's micro-batch + foreachBatch plans are lint-clean") {
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[SparkPlan]()
    PlanProbe.enable(p => captured.add(p))
    val listener = new QueryExecutionListener {
      override def onSuccess(f: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             ns: Long): Unit = captured.add(qe.executedPlan)
      override def onFailure(f: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             e: Exception): Unit = captured.add(qe.executedPlan)
    }
    spark.listenerManager.register(listener)
    val violations = scala.collection.mutable.ArrayBuffer[String]()
    try {
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter(_._1.startsWith("s_stream_")).foreach { case (name, fn) =>
          captured.clear()
          try fn(spark, sf0)
          catch { case e: Throwable =>
            violations += s"$name: query failed: ${e.getMessage}" }
          // the listener bus delivers async: wait until capture stabilizes
          var last = -1
          var stable = 0
          val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
          while (stable < 3 && System.nanoTime() < deadline) {
            Thread.sleep(100)
            val n = captured.size()
            if (n == last) stable += 1 else { stable = 0; last = n }
          }
          assert(!captured.isEmpty, s"$name: no plan captured — probe unwired?")
          captured.forEach { p =>
            val off = offenders(p)
            val cart = off.filter(_.startsWith("CartesianProduct"))
            val bnlj = off.filter(_.startsWith("BNLJ"))
            if (cart.nonEmpty) violations += s"$name: ${cart.mkString("; ")}"
            if (bnlj.nonEmpty && !bnljBounded(name))
              violations += s"$name: ${bnlj.mkString("; ")}"
          }
          graft.ops.Caches.release()
          spark.catalog.clearCache()
        }
    } finally {
      PlanProbe.disable()
      spark.listenerManager.unregister(listener)
    }
    assert(violations.isEmpty,
      s"\n${violations.size} streaming plan-lint violations:\n${violations.mkString("\n")}")
  }
}
