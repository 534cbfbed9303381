package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe main for local development; not part of the library. */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession
      .builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warmup
    Tables.customer(spark, d).limit(16).write.format("noop").mode("overwrite").save()
    val q15 = Queries.queries("q15_derived_features")
    time("q15 run1")(q15(spark, d).write.format("noop").mode("overwrite").save())
    time("q15 run2")(q15(spark, d).write.format("noop").mode("overwrite").save())
    q15(spark, d).explain("formatted")
    spark.stop()
  }
}
