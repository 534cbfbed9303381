package graft

/** Plan-audit probe: prints the formatted physical plan of the named
  * queries (local dev only; not part of the library surface). */
object DevPlan {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.withFunctions(
      GraftSession.builder("local[8]", 8)
        .config("spark.ui.enabled", "false")
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val full = SparkEntry.queries.keys.find(_.startsWith(name))
        .getOrElse(sys.error(s"no query matches $name"))
      println(s"========== $full ==========")
      println(SparkEntry.queries(full)(spark, dir).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
