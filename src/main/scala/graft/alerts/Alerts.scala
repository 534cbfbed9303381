package graft.alerts

import java.time.Instant

/**
 * Alert conditions + events over analysis results
 * (raise_/analytics/alert.py:18-107, :237-331 and audit alerts
 * models/audit.py:200-252). Evaluation is pure Scala over a metric map
 * (the analysis result row); scheduling is a driver concern.
 */
sealed trait Condition {
  def metric: String
  def eval(value: Double): Boolean
}

final case class Cmp(metric: String, op: String, threshold: Double)
    extends Condition {
  def eval(v: Double): Boolean = op match {
    case "gt"  => v > threshold
    case "lt"  => v < threshold
    case "eq"  => v == threshold
    case "ne"  => v != threshold
    case "gte" => v >= threshold
    case "lte" => v <= threshold
    case other => throw new IllegalArgumentException(s"Unknown op: $other")
  }
}

final case class Between(metric: String, lo: Double, hi: Double,
    inside: Boolean = true) extends Condition {
  def eval(v: Double): Boolean =
    if (inside) v >= lo && v <= hi else v < lo || v > hi
}

/** Domain-specific sugar (PSI_GT / KL_GT / P_VALUE_LT / CHANGE_PCT_GT). */
object Condition {
  def psiGt(t: Double): Condition = Cmp("psi", "gt", t)
  def klGt(t: Double): Condition = Cmp("kl_divergence", "gt", t)
  def pValueLt(t: Double): Condition = Cmp("p_value", "lt", t)
  def changePctGt(t: Double): Condition = Cmp("change_pct", "gt", t)
}

final case class AlertEvent(
    alertName: String, at: Instant, metric: String,
    observed: Double, fired: Boolean)

final class Alert(
    val name: String,
    val condition: Condition,
    val checkIntervalSeconds: Long = 300,
    val cooldownSeconds: Long = 0) {

  private val history = scala.collection.mutable.ArrayBuffer.empty[AlertEvent]
  private var lastFired: Option[Instant] = None

  /** Evaluate against a metric map (one analysis-result row). */
  def check(metrics: Map[String, Double],
      now: Instant = Instant.now()): AlertEvent = {
    val v = metrics.getOrElse(condition.metric,
      throw new NoSuchElementException(
        s"Metric '${condition.metric}' absent from result"))
    val inCooldown = lastFired.exists(t =>
      now.getEpochSecond - t.getEpochSecond < cooldownSeconds)
    val fired = condition.eval(v) && !inCooldown
    if (fired) lastFired = Some(now)
    val ev = AlertEvent(name, now, condition.metric, v, fired)
    synchronized(history += ev)
    ev
  }

  def events: Seq[AlertEvent] = synchronized(history.toSeq)
}
