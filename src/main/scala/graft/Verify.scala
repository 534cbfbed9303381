package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.withFunctions(
      GraftSession.builder(s"local[$cpus]", cpus.toInt)
        .config("spark.ui.enabled", "false")
        .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // local-dev narrowing: SPARK_GRAFT_ONLY=q84,q85 runs matching
    // prefixes only (the driver never sets it, so its gate is unchanged)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
    var failed = Vector.empty[String]
    // scale lint rides the correctness gate: a query whose plan carries
    // a cartesian product, unpartitioned window, or raw-corpus
    // broadcast FAILS verify even when its rows are right at sf0.01.
    // rawSidesAreCorpus: byte estimates scale with the tiny test SF, so
    // the cartesian rule keys on the scale-invariant signal instead —
    // a non-reduced join side is corpus-sized by decree.
    // SPARK_GRAFT_LINT=off opts out for local debugging only.
    val lint = !sys.env.get("SPARK_GRAFT_LINT").contains("off")
    // bounded-collect discipline rides the same gate: every driver
    // collect issued while building/running ANY query must come from a
    // cardinality-bounded plan (aggregate/limit/distinct/literal) — an
    // unbounded collect added anywhere in the library fails verify.
    val collectGuard = new graft.analysis.PlanLint.BoundedCollectListener
    if (lint) spark.listenerManager.register(collectGuard)
    selected.foreach { case (name, fn) =>
      try {
        System.err.println(s"[verify] $name start")
        val df = fn(spark, sfDir)
        if (lint)
          graft.analysis.PlanLint.assertScaleSafe(df,
            rawSidesAreCorpus = true)
        df.coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        failed :+= name
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // loud completeness gate: every declared query must have written its
    // result dir (r6 shipped 6 silent runtime failures — never again).
    // Printed to stdout AND stderr so no log capture can drop it.
    val missing = selected.keys.toSeq.sorted
      .filterNot(n => Files.isDirectory(Paths.get(s"$outDir/$n")))
    // Drain the async listener bus BEFORE the OK/FAILED decision so the
    // bounded-collect discipline is a real gate, not an advisory line: an
    // unbounded collect anywhere in the library turns the run FAILED.
    // listenerBus.waitUntilEmpty is private[spark] → reflective call with
    // a bounded-sleep fallback (same 2 s the old advisory path used).
    try {
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethods.find(_.getName == "listenerBus")
        .map(_.invoke(sc)).get
      val ms = bus.getClass.getMethods.filter(_.getName == "waitUntilEmpty")
      ms.find(_.getParameterCount == 1) match {
        case Some(m) => m.invoke(bus, java.lang.Long.valueOf(10000L))
        case None    => ms.find(_.getParameterCount == 0).get.invoke(bus)
      }
    } catch { case _: Throwable => Thread.sleep(2000) }
    val unb = collectGuard.violations
    if (unb.nonEmpty) {
      val line = s"[verify] UNBOUNDED-COLLECT ${unb.size}: ${unb.take(5).mkString(" || ")}"
      System.err.println(line); println(line)
    }
    val bad =
      (failed ++ missing ++ (if (unb.nonEmpty) Seq("unbounded-collect") else Nil))
        .distinct.sorted
    if (bad.nonEmpty) {
      val line = s"[verify] FAILED ${bad.size}/${selected.size}: ${bad.mkString(",")}"
      System.err.println(line); println(line)
    } else println(s"[verify] OK ${selected.size}/${selected.size}")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
