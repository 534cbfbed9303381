package graft

import org.apache.spark.sql.SparkSession

/**
 * Per-round benchmark: runs every SparkEntry query on
 * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
 *
 * Methodology (r13 rewrite — r12's record was lost to a driver-side
 * timeout because the old min-of-2(+conditional-3rd) scheme ran up to
 * ~1800 executions and printed NOTHING until the very end):
 *  - a warmup pass (tiny read+agg) first, so JVM/classloading/codegen
 *    warmup isn't billed to the first query;
 *  - queries execute via the `noop` sink — full plan runs (a bare
 *    `count()` would let Catalyst prune projections and undercount work);
 *  - PASS 1 runs every query exactly once and then IMMEDIATELY emits a
 *    complete snapshot JSON line (stdout) + BENCH_FULL.json — from this
 *    point on, a timeout can no longer lose the round's record;
 *  - PASS 2 (refinement) re-samples queries to take the noise-robust
 *    min-of-2, slowest-first (where noise hurts the headline most), but
 *    ONLY while a wall-clock budget holds (SPARK_GRAFT_BENCH_BUDGET_SEC,
 *    default 2400 s — comfortably under the driver's 3600 s kill);
 *    a fresh snapshot line is emitted periodically during refinement;
 *  - the conditional 3rd sample only fires for queries whose two samples
 *    disagree >1.5×, again budget-gated;
 *  - the FINAL line is printed after spark.stop() so nothing trails it,
 *    with "value" last (tail-safe for bounded artifact capture).
 * A query that THROWS is recorded as an error, not a time — r6 shipped
 * six runtime-broken queries disguised as 0.04 s rows.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors, 32).toString)
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "2400").toDouble
    val wall0 = System.nanoTime()
    def elapsed(): Double = (System.nanoTime() - wall0) / 1e9

    val spark = GraftSession.withFunctions(
      GraftSession.builder(s"local[$cpus]", cpus.toInt)
        .config("spark.ui.enabled", "false")
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    // warmup: touch every table once (io cache + codegen + executor
    // spin-up), then run two small representative queries so Catalyst /
    // whole-stage-codegen JIT for the shared aggregate and prefix-sum
    // machinery isn't billed to whichever query alphabetically goes first
    Tables.all.foreach { t =>
      try Tables.load(spark, sfDir, t).limit(16).write
        .format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }
    Seq("q05_dist_stats", "q47_distribution_cdf").foreach { w =>
      try SparkEntry.queries(w)(spark, sfDir).write
        .format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }

    val names = SparkEntry.queries.keys.toVector.sorted
    val fns = SparkEntry.queries
    // per-query state: accumulated samples + first error message
    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
        .withDefaultValue(Vector.empty)
    val errs = scala.collection.mutable.LinkedHashMap.empty[String, String]

    def runOnce(name: String): Unit = {
      val t0 = System.nanoTime()
      try {
        fns(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        samples(name) = samples(name) :+ (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        if (!errs.contains(name))
          errs(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
    }

    // COMPACT values rounded to ms so the whole record stays small: the
    // artifact capture keeps a bounded tail (~4 KB) and a full-precision
    // line gets cut mid-JSON (r3 lost its total that way)
    def ms(v: Double): String =
      if (v.isNaN) "null"
      else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""

    def best(name: String): Double = {
      val s = samples(name)
      if (s.isEmpty) Double.NaN else s.min
    }
    def record(): String = {
      val done = names.filter(n => samples(n).nonEmpty || errs.contains(n))
      val qs = done.map(k => "\"" + k + "\":" + ms(best(k))).mkString("{", ",", "}")
      val errJson = errs.map { case (k, m) => q(k) + ":" + q(m) }.mkString("{", ",", "}")
      val total = done.map(best).filterNot(_.isNaN).sum
      s"""{"metric":"total","unit":"sec","sf":"$sfDir","failed":${errs.size},"err":$errJson,"queries":$qs,"value":${ms(total)}}"""
    }
    // every raw sample per query rides in the committed file (NOT the
    // stdout line, which must stay tail-safe): cross-round compares read
    // the spread to self-adjudicate noise — a real regression is ALL
    // samples slow (tight spread, high min); a noisy one is a wide
    // spread whose min still lands low
    def writeFull(): Unit = {
      val samp = names.filter(n => samples(n).nonEmpty)
        .map(k => "\"" + k + "\":[" + samples(k).map(ms).mkString(",") + "]")
        .mkString("{", ",", "}")
      val full = record().dropRight(1) + s""","elapsed":${ms(elapsed())},"samples":$samp}"""
      try java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH_FULL.json"), (full + "\n").getBytes("UTF-8"))
      catch { case e: Throwable =>
        System.err.println(s"[bench] BENCH_FULL.json write failed: $e") }
    }
    // emit a complete snapshot line: if the process is killed later, the
    // last printed snapshot IS the round's record (the capture keeps a
    // tail, and each snapshot is a full JSON object with value last)
    def snapshot(tag: String): Unit = {
      System.err.println(s"[bench] snapshot($tag) elapsed=${ms(elapsed())}s failed=${errs.size}")
      println(record()); System.out.flush(); writeFull()
    }

    // PASS 1 — one complete sweep; checkpoint the file every 50 queries
    // and print a full snapshot line every 100, so even a mid-pass-1
    // kill leaves both artifacts with a parseable partial record
    names.zipWithIndex.foreach { case (n, i) =>
      runOnce(n)
      if ((i + 1) % 100 == 0) snapshot(s"pass1@${i + 1}")
      else if ((i + 1) % 50 == 0) writeFull()
    }
    snapshot("pass1")

    // PASS 2 — refinement to min-of-2, slowest-first, budget-gated.
    // Reserve headroom for the 3rd-sample pass + shutdown + final print.
    val ok = names.filterNot(errs.contains)
    val bySlowest = ok.sortBy(n => -best(n))
    var i2 = 0
    while (i2 < bySlowest.length && elapsed() < budgetSec * 0.75) {
      runOnce(bySlowest(i2))
      i2 += 1
      if (i2 % 100 == 0) snapshot(s"pass2@$i2")
    }
    if (i2 < bySlowest.length)
      System.err.println(s"[bench] pass2 budget-stopped at $i2/${bySlowest.length}")
    snapshot("pass2")

    // PASS 3 — conditional 3rd sample where the two disagree >1.5× (the
    // box was busy during one of them); slowest-first, budget-gated
    val disagree = ok.filter { n =>
      val s = samples(n)
      s.length >= 2 && s.max / math.max(s.min, 1e-9) > 1.5
    }.sortBy(n => -best(n))
    var i3 = 0
    while (i3 < disagree.length && elapsed() < budgetSec * 0.92) {
      runOnce(disagree(i3))
      i3 += 1
      if (i3 % 100 == 0) snapshot(s"pass3@$i3")
    }
    if (i3 < disagree.length)
      System.err.println(s"[bench] pass3 budget-stopped at $i3/${disagree.length}")

    if (errs.nonEmpty)
      System.err.println(
        s"[bench] FAILED ${errs.size}/${names.size}: ${errs.keys.mkString(",")}")
    writeFull()
    val finalLine = record()
    spark.stop()
    // printed LAST, after spark shutdown, so no log line can trail it —
    // and "value" is the FINAL field (tail-safe; r4's artifact lost the
    // total because the total led the line)
    println(finalLine)
    System.out.flush()
  }
}
