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
    val entry = SparkEntry.entry(spark)
    val n = entry.count()
    println(s"ENTRY SMOKE: rows=$n schema=${entry.schema.fieldNames.mkString(",")}")
    entry.show(3)
    spark.stop()
  }
}
