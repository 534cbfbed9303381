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
    import graft.etl._
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("devjob").toString
    val cps = new CheckpointStore(s"$root/cp")
    val job = new Job(
      jobId = "daily_revenue",
      sources = Seq(FileSource("ev", "/root/testdata/sf0.001/events.parquet")),
      transform = SqlTransform("""
        SELECT CAST(timestamp_micros(ts div 1000) AS DATE) AS day,
               event_type, count(*) AS n, round(sum(value), 2) AS revenue
        FROM ev
        WHERE timestamp_micros(ts div 1000) > {{checkpoint}}
        GROUP BY 1, 2"""),
      target = ParquetTarget(s"$root/out"),
      incremental = IncrementalConfig.full,
      qualityChecks = Seq(NullCheck("revenue", 0.0),
        RowCountCheck(minRows = Some(1))),
      checkpoints = cps)
    job.activate()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val r1 = job.run(spark)
    println(s"RUN1: state=${r1.state} read=${r1.rowsRead} written=${r1.rowsWritten} " +
      s"quality=${r1.qualityReport.map(_.results.map(q => q.name -> q.passed))}")
    val out = spark.read.parquet(s"$root/out")
    out.orderBy("day", "event_type").show(8)
    println("rows in target: " + out.count())
    spark.stop()
  }
}
