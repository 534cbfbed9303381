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
    for (mf <- Seq("100", "1200"); _ <- 1 to 2) {
      spark.conf.set("spark.sql.codegen.maxFields", mf)
      val t0 = System.nanoTime()
      Queries.queries("q174_poisson_bootstrap")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"maxFields=$mf%-5s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
