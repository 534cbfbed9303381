package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/**
 * Hard scale-lint gate over EVERY registered query plan: a future
 * cartesian product, unpartitioned window, or raw-corpus broadcast in
 * any `SparkEntry.queries` entry fails `sbt test` — the same
 * `PlanLint.assertScaleSafe(rawSidesAreCorpus = true)` check the
 * driver-run `graft.Verify` gate applies, duplicated here so the
 * scalatest suite alone catches a regression (VERDICT r12 task #6).
 *
 * Plan-building only (analyze + optimize, no result execution) — the
 * substrate queries that `localCheckpoint` during construction do run
 * their bounded prep stages at sf0.001, which is also what keeps the
 * sweep honest about what each fn actually materializes.
 */
class PlanLintSweepSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.withFunctions(
    SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate())

  private val sfDir = "/root/testdata/sf0.001"

  test("every SparkEntry query plan is scale-safe (PlanLint, rawSidesAreCorpus)") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir not present")
    spark.sparkContext.setLogLevel("ERROR")
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val findings = graft.analysis.PlanLint
          .audit(df, rawSidesAreCorpus = true)
        if (findings.nonEmpty)
          bad += s"$name: ${findings.map(f => f.rule).mkString(",")}"
      } catch { case e: Throwable =>
        bad += s"$name: plan-build failed: ${e.getMessage}"
      }
    }
    assert(bad.isEmpty, s"scale-lint findings:\n${bad.mkString("\n")}")
  }
}
