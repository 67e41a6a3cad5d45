package graft.streaming

import org.apache.spark.sql.execution.SparkPlan

/** Opt-in capture point for streaming micro-batch physical plans.
  *
  * A micro-batch pipeline's execution plan lives inside the
  * `StreamExecution` and is gone once `awaitTermination` returns, so the
  * suite-wide plan lint (QueryPlanLintSpec) — which PLANS each batch query
  * without running it — can't see what a streaming query actually executed
  * per batch. Every streaming runner in this library routes its finished
  * query through [[capture]]; when a sink is registered (tests only —
  * production runs pay one `Option.foreach` on a None), the LAST
  * micro-batch's `IncrementalExecution.executedPlan` is handed over for
  * the same cartesian/nested-loop lint the batch queries get. The last
  * batch suffices: AvailableNow batches replan per trigger from the same
  * logical template, so join/window shapes are identical across batches
  * (only file listings differ).
  *
  * `foreachBatch` pipelines additionally run BATCH actions inside the
  * batch function; those go through the session's normal
  * QueryExecutionListener path and are captured there instead.
  */
object PlanProbe {
  @volatile private var sink: Option[SparkPlan => Unit] = None

  /** Register a plan consumer (test-side). */
  def enable(f: SparkPlan => Unit): Unit = sink = Some(f)

  def disable(): Unit = sink = None

  /** `start().runCaptured()` — awaitTermination that always hands the
    * finished query's last micro-batch plan to [[capture]], even when the
    * stream fails (the failed batch's plan is exactly the evidence). */
  implicit class CapturedRun(private val q: org.apache.spark.sql.streaming.StreamingQuery) {
    def runCaptured(): Unit =
      try q.awaitTermination() finally capture(q)
  }

  /** Hand the query's last micro-batch executed plan to the sink, if one
    * is registered. Safe on a terminated query — `lastExecution` outlives
    * termination; a query that never ran a batch captures nothing. */
  private[graft] def capture(q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
    sink.foreach { f =>
      q match {
        case w: org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper =>
          Option(w.streamingQuery.lastExecution).foreach(e => f(e.executedPlan))
        case _ => ()
      }
    }
}
