package graft.analysis

import scala.concurrent.ExecutionContext

import org.apache.spark.sql.DataFrame

import graft.meta.{FeatureGroupData, ResultCache}

/**
 * The analytics entry point tying together planner, freshness cache and
 * async jobs — the real counterpart of raise_/analytics/client.py
 * (whose `_execute_analysis` is mocked): `analyze` honors freshness
 * (default WITHIN 1h, client.py:61-62), caches by spec hash, and
 * `analyzeAsync` returns a cancellable [[AnalysisJob]].
 */
final class AnalyticsClient(data: FeatureGroupData) {

  val cache = new ResultCache
  import cache._

  def analyze(spec: Analysis,
      freshness: Freshness = Within(java.time.Duration.ofHours(1))): DataFrame =
    cache.getOrCompute(spec, freshness) {
      data.analyze(spec)
    }

  def analyzeAsync(spec: Analysis)(implicit ec: ExecutionContext): AnalysisJob =
    new AnalysisJob(data.frame.sparkSession, data.frame, spec).start()

  /** Export an analysis result frame (result.py:102-162 to_json/to_csv). */
  def export(result: DataFrame, path: String, format: String = "json"): Unit =
    result.coalesce(1).write.mode("overwrite").format(format)
      .option("header", "true").save(path)
}
