package graft

/** Throwaway perf probe: warm tables, run named queries 3x, print min. */
object JudgeProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.withFunctions(
      GraftSession.builder("local[32]", 32)
        .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    Tables.events(spark, dir).count()
    Tables.lineitem(spark, dir).count()
    for (name <- args) {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        Queries.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name%-28s min=${times.min}%6.2f  all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
