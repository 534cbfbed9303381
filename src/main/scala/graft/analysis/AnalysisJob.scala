package graft.analysis

import java.util.concurrent.atomic.AtomicReference

import scala.concurrent.{ExecutionContext, Future}

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Async analysis execution (raise_/analytics/result.py:198-308):
 * pending → running → completed | failed | cancelled, with wait/refresh/
 * cancel. Cancellation uses Spark job groups so a running distributed
 * job is actually interrupted, not just abandoned.
 */
final class AnalysisJob(
    spark: SparkSession,
    df: DataFrame,
    spec: Analysis,
    val jobId: String = java.util.UUID.randomUUID().toString.take(12)) {

  sealed trait State
  case object Pending extends State
  case object Running extends State
  final case class Completed(result: Array[org.apache.spark.sql.Row],
      schema: org.apache.spark.sql.types.StructType) extends State
  final case class Failed(error: Throwable) extends State
  case object Cancelled extends State

  private val state = new AtomicReference[State](Pending)
  private val groupId = s"graft-analysis-$jobId"

  def status: String = state.get() match {
    case Pending      => "pending"
    case Running      => "running"
    case _: Completed => "completed"
    case _: Failed    => "failed"
    case Cancelled    => "cancelled"
  }

  /** Start execution on the given context; returns this for chaining. */
  def start()(implicit ec: ExecutionContext): AnalysisJob = {
    if (!state.compareAndSet(Pending, Running)) return this
    Future {
      try {
        spark.sparkContext.setJobGroup(groupId,
          s"analysis ${spec.kind}", interruptOnCancel = true)
        val out = AnalysisPlanner.plan(df, spec)
        val rows = out.collect()
        state.compareAndSet(Running, Completed(rows, out.schema))
      } catch {
        case e: Throwable =>
          if (state.get() != Cancelled) state.set(Failed(e))
      } finally spark.sparkContext.clearJobGroup()
    }
    this
  }

  def cancel(): Unit = {
    val s = state.get()
    if (s == Pending || s == Running) {
      state.set(Cancelled)
      spark.sparkContext.cancelJobGroup(groupId)
    }
  }

  /** Block until terminal state or timeout; returns final status. */
  def waitFor(timeoutMs: Long = 60000): String = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (System.currentTimeMillis() < deadline &&
        (state.get() == Pending || state.get() == Running))
      Thread.sleep(20)
    status
  }

  def result: Array[org.apache.spark.sql.Row] = state.get() match {
    case Completed(rows, _) => rows
    case Failed(e)          => throw e
    case other =>
      throw new IllegalStateException(s"Result not ready: $status")
  }
}
