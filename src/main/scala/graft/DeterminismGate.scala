package graft

import org.apache.spark.sql.DataFrame

/**
 * Spark-vs-Spark determinism gate: run each selected query TWICE in
 * one session and hash-compare the results. Catches nondeterministic
 * plans (partition-order-sensitive aggregation of floats, unstable
 * argmax tie-breaks, time-dependent expressions) that the DuckDB
 * oracle can mask when both engines happen to land the same way on a
 * given run. Cheap: one extra pass over the selected keys at sf0.01.
 *
 * Usage: `runMain graft.DeterminismGate <sfDir> [--from=qNNN | prefixes...]`
 *  - `--from=q387` selects every query whose numeric id ≥ 387 (the
 *    "newest queries this round" shape the round gate wants);
 *  - bare args are name prefixes (the SPARK_GRAFT_ONLY convention);
 *  - no selector runs the whole suite.
 * Exits non-zero listing any query whose two runs hash differently.
 */
object DeterminismGate {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val rest = args.drop(1)
    val from = rest.collectFirst {
      case a if a.startsWith("--from=q") =>
        a.stripPrefix("--from=q").toInt
    }
    val prefixes = rest.filterNot(_.startsWith("--"))
    def qNum(name: String): Int =
      "^q(\\d+)".r.findFirstMatchIn(name).map(_.group(1).toInt).getOrElse(-1)
    val spark = GraftSession.withFunctions(
      GraftSession.builder("local[8]", 8)
        .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val selected = SparkEntry.queries.filter { case (n, _) =>
      from.forall(qNum(n) >= _) &&
        (prefixes.isEmpty || prefixes.exists(n.startsWith))
    }.toSeq.sortBy(_._1)
    println(s"[determinism] ${selected.size} queries x 2 runs at $sfDir")

    /** Row-order-insensitive content hash: every row renders to a
      * canonical string (column-name-sorted), the row strings sort,
      * and the whole block hashes — exactly the driver's compare
      * modulo its float rounding (we compare Spark vs Spark, so full
      * precision must replay, a STRICTER bar than the oracle's). */
    def contentHash(df: DataFrame): String = {
      val cols = df.columns.sorted
      val rows = df.select(cols.map(org.apache.spark.sql.functions.col): _*)
        .collect()
        .map(r => (0 until r.length).map(i =>
          String.valueOf(r.get(i))).mkString("\u0001"))
        .sorted
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.foreach(s => md.update(s.getBytes("UTF-8")))
      md.digest().map("%02x".format(_)).mkString
    }

    var bad = Vector.empty[String]
    var err = Vector.empty[String]
    selected.foreach { case (name, fn) =>
      try {
        val h1 = contentHash(fn(spark, sfDir))
        val h2 = contentHash(fn(spark, sfDir))
        if (h1 != h2) {
          bad :+= name
          println(s"[determinism] MISMATCH $name: $h1 vs $h2")
        }
      } catch { case e: Throwable =>
        err :+= name
        println(s"[determinism] ERROR $name: ${e.getMessage}")
      }
    }
    val line =
      if (bad.isEmpty && err.isEmpty)
        s"[determinism] OK ${selected.size}/${selected.size} replay bit-stable"
      else
        s"[determinism] FAILED mismatches=${bad.mkString(",")} errors=${err.mkString(",")}"
    println(line)
    spark.stop()
    if (bad.nonEmpty || err.nonEmpty) sys.exit(1)
  }
}
