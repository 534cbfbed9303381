package graft

import org.apache.spark.sql.SparkSession

/** Timing probe: run named queries N times against a sf dir and print
  * per-run seconds (dev tool; not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args(1).split(",").toSeq
                else Seq("q15_derived_features")
    val explain = args.contains("--explain")
    val cpus = math.min(Runtime.getRuntime.availableProcessors, 32)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.all.foreach { t =>
      try Tables.load(spark, sfDir, t).limit(16).write
        .format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }
    for (name <- names; if SparkEntry.queries.contains(name)) {
      val fn = SparkEntry.queries(name)
      if (explain) fn(spark, sfDir).explain("formatted")
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name%-32s ${times.map(t => f"$t%6.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
