package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Bucketed-table helpers for co-located joins/aggregations — the
 * pre-shuffle answer to repeated large-fact equi-joins at 100 TB: write
 * both sides bucketed (and sorted) by the join keys ONCE, and every
 * subsequent join/groupBy on those keys skips its Exchange (and with
 * sorted buckets, the sort) entirely. EtlExtSpec asserts the
 * shuffle-free plan.
 */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted parquet table. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}

/**
 * Small-file compaction for parquet directories — the table-maintenance
 * pass that keeps scan throughput healthy at 100 TB (a partition made
 * of thousands of KB-files pays one task + one footer read each;
 * compacted, the same bytes stream through a handful of tasks).
 * Target file count = ceil(input bytes / targetBytes), written via a
 * temp dir (can't overwrite a path being read), preserving an optional
 * partition layout.
 */
object Compaction {

  /** Returns (filesBefore, filesAfter). Row content is preserved. */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024,
      partitionBy: Seq[String] = Nil): (Int, Int) = {
    // resolve the filesystem FROM the path (s3a://… must not fall back
    // to the cluster's default FS)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parquetFiles(p: String): Seq[org.apache.hadoop.fs.FileStatus] = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(p), true)
      val buf = scala.collection.mutable.ArrayBuffer
        .empty[org.apache.hadoop.fs.FileStatus]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) buf += f
      }
      buf.toSeq
    }
    val before = parquetFiles(path)
    val nOut = math.max(1,
      math.ceil(before.map(_.getLen).sum.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(path)
    val tmp = path + ".compact.tmp"
    val writer = df.repartition(nOut).write.mode("overwrite")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*)
     else writer).parquet(tmp)
    val back = spark.read.parquet(tmp)
    val writer2 = back.write.mode("overwrite")
    (if (partitionBy.nonEmpty) writer2.partitionBy(partitionBy: _*)
     else writer2).parquet(path)
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    (before.size, parquetFiles(path).size)
  }
}
