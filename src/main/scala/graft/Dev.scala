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
    try {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      ev.printSchema()
      import org.apache.spark.sql.functions._
      val ev2 = ev.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      ev2.show(3, truncate = false)
      ev2.selectExpr("max(ts)", "min(ts)").show(truncate = false)
    } catch {
      case e: Throwable => println("EVENTS READ FAILED: " + e.getMessage)
    }
    spark.stop()
  }
}
