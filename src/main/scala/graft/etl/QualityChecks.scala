package graft.etl

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/**
 * Data-quality checks evaluated in ONE distributed aggregation pass per
 * report (each check contributes aggregate columns; no per-check jobs) —
 * real versions of raise_/transforms/observability.py:170-451, whose
 * reference implementations return mock values.
 */
sealed trait QualityCheck {
  def name: String
  def severity: String // WARNING | ERROR | CRITICAL
  /** aggregate columns this check needs (aliased uniquely). */
  private[etl] def aggs(idx: Int): Seq[org.apache.spark.sql.Column]
  /** evaluate from the single aggregated row. */
  private[etl] def evaluate(row: Row, idx: Int): QualityResult
}

final case class QualityResult(
    name: String, passed: Boolean, severity: String,
    observed: Double, threshold: Double)

final case class QualityReport(results: Seq[QualityResult]) {
  def failures: Seq[QualityResult] =
    results.filter(r => !r.passed && r.severity != "WARNING")
  def warnings: Seq[QualityResult] =
    results.filter(r => !r.passed && r.severity == "WARNING")
  def failed: Boolean = failures.nonEmpty
}

final case class NullCheck(column: String, maxNullRate: Double,
    severity: String = "ERROR") extends QualityCheck {
  def name = s"null_check($column<=$maxNullRate)"
  private[etl] def aggs(i: Int) = Seq(
    avg(col(column).isNull.cast("double")).as(s"__q$i"))
  private[etl] def evaluate(row: Row, i: Int) = {
    val rate = Option(row.getAs[java.lang.Double](s"__q$i")).fold(0.0)(_.doubleValue)
    QualityResult(name, rate <= maxNullRate, severity, rate, maxNullRate)
  }
}

final case class UniqueCheck(columns: Seq[String],
    severity: String = "ERROR") extends QualityCheck {
  def name = s"unique_check(${columns.mkString(",")})"
  private[etl] def aggs(i: Int) = Seq(
    (count(lit(1)) - count_distinct(struct(columns.map(col): _*)))
      .cast("double").as(s"__q$i"))
  private[etl] def evaluate(row: Row, i: Int) = {
    val dups = row.getAs[Double](s"__q$i")
    QualityResult(name, dups == 0.0, severity, dups, 0.0)
  }
}

final case class RangeCheck(column: String, min: Double, max: Double,
    severity: String = "ERROR") extends QualityCheck {
  def name = s"range_check($column)"
  private[etl] def aggs(i: Int) = Seq(
    count(when(col(column) < min || col(column) > max, 1))
      .cast("double").as(s"__q$i"))
  private[etl] def evaluate(row: Row, i: Int) = {
    val bad = row.getAs[Double](s"__q$i")
    QualityResult(name, bad == 0.0, severity, bad, 0.0)
  }
}

final case class RowCountCheck(minRows: Option[Long] = None,
    maxRows: Option[Long] = None, expected: Option[Long] = None,
    tolerancePct: Double = 0.0, severity: String = "ERROR")
    extends QualityCheck {
  def name = "row_count_check"
  private[etl] def aggs(i: Int) = Seq(count(lit(1)).cast("double").as(s"__q$i"))
  private[etl] def evaluate(row: Row, i: Int) = {
    val n = row.getAs[Double](s"__q$i")
    val ok = minRows.forall(n >= _) && maxRows.forall(n <= _) &&
      expected.forall(e => math.abs(n - e) <= e * tolerancePct / 100.0)
    QualityResult(name, ok, severity, n,
      expected.orElse(minRows).orElse(maxRows).fold(0.0)(_.toDouble))
  }
}

/** max(ts) must be within maxAge of `asOf` (observability.py:350-380). */
final case class FreshnessCheck(column: String, maxAge: String,
    asOf: java.time.Instant = java.time.Instant.now(),
    severity: String = "ERROR") extends QualityCheck {
  def name = s"freshness_check($column)"
  private[etl] def aggs(i: Int) = Seq(
    max(col(column)).cast("timestamp").cast("double").as(s"__q$i"))
  private[etl] def evaluate(row: Row, i: Int) = {
    val maxTs = Option(row.getAs[java.lang.Double](s"__q$i")).fold(0.0)(_.doubleValue)
    val ageSec = asOf.getEpochSecond - maxTs
    val budget = graft.analysis.AnalysisPlanner
      .durationToIntervalSeconds(maxAge).toDouble
    QualityResult(name, ageSec <= budget, severity, ageSec, budget)
  }
}

/** custom predicate over the aggregated frame — run separately. */
final case class CustomCheck(name: String, fn: DataFrame => Boolean,
    severity: String = "ERROR") extends QualityCheck {
  private[etl] def aggs(i: Int) = Nil
  private[etl] def evaluate(row: Row, i: Int) =
    QualityResult(name, passed = true, severity, 0, 0) // handled in runAll
}

/**
 * Blob-reference integrity as a job gate: recompute sha256 over the
 * payload column and compare to the recorded checksum
 * (observability.py:383-451 — real, not mocked). Evaluated in the same
 * single aggregation pass as the other checks.
 */
final case class BlobIntegrityQualityCheck(blobRefCol: String,
    payloadCol: String, maxInvalidRate: Double = 0.0,
    severity: String = "ERROR") extends QualityCheck {
  def name = s"blob_integrity_check($blobRefCol)"
  private[etl] def aggs(i: Int) = Seq(
    avg((sha2(col(payloadCol), 256) =!= col(s"$blobRefCol.checksum"))
      .cast("double")).as(s"__q$i"))
  private[etl] def evaluate(row: Row, i: Int) = {
    val rate = Option(row.getAs[java.lang.Double](s"__q$i")).fold(0.0)(_.doubleValue)
    QualityResult(name, rate <= maxInvalidRate, severity, rate, maxInvalidRate)
  }
}

object QualityCheck {
  /** Evaluate all checks with a single aggregation job (+ custom fns). */
  def runAll(checks: Seq[QualityCheck], df: DataFrame): QualityReport =
    runAllWith(checks, df, Nil)._1

  /** Same single aggregation job, with caller-supplied extra aggregate
    * columns folded into the pass (e.g. the job runner's checkpoint
    * high-water `max` — one scan instead of two). Returns the raw agg
    * row so the caller can read its extras back by alias. */
  def runAllWith(checks: Seq[QualityCheck], df: DataFrame,
      extraAggs: Seq[Column]): (QualityReport, Option[Row]) = {
    val (custom, aggregatable) = checks.zipWithIndex.partition(_._1.isInstanceOf[CustomCheck])
    val aggCols = aggregatable.flatMap { case (c, i) => c.aggs(i) } ++ extraAggs
    val (aggResults: Seq[QualityResult], aggRow) =
      if (aggCols.isEmpty) (Nil, None)
      else {
        val row = df.agg(aggCols.head, aggCols.tail: _*).collect()(0)
        (aggregatable.map { case (c, i) => c.evaluate(row, i) }, Some(row))
      }
    val customResults = custom.map { case (c, _) =>
      val cc = c.asInstanceOf[CustomCheck]
      QualityResult(cc.name, cc.fn(df), cc.severity, 0, 0)
    }
    (QualityReport(aggResults ++ customResults), aggRow)
  }
}
