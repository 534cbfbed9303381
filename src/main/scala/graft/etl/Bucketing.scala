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

/**
 * Z-order (Morton) clustering for multi-column data skipping — the
 * table-layout lever that makes parquet row-group/file min-max stats
 * selective on SEVERAL filter columns at once. A single-column sort
 * gives perfect pruning on that column and none on any other; the
 * Morton curve interleaves the bits of all clustering columns, so each
 * written file covers a small HYPER-TILE of the value space and a
 * point/range predicate on ANY clustered column prunes most files.
 *
 * Pipeline shape: one 1-row bounds aggregate (broadcast) → a map-only
 * codegen'd bit-interleave expression → `repartitionByRange` on the
 * z-value (the one necessary shuffle — it IS the clustering) → a
 * partition-local sort → write. Nothing driver-side beyond the bounds
 * row. Range normalization is min/max-based; for heavily skewed
 * columns compose with a rank transform upstream (e.g.
 * `ops.Features.quantileBucket`) so the curve doesn't collapse onto
 * the dense region.
 */
object ZOrder {

  /** Adds `outCol` = Morton code of `cols`, each range-normalized to
    * `bits` bits via a broadcast 1-row bounds aggregate. NULL values
    * sort first (code 0 in that dimension). `bits * cols.size` must
    * fit a signed long. */
  def withZValue(df: DataFrame, cols: Seq[String], bits: Int = 16,
      outCol: String = "__z"): DataFrame = {
    import org.apache.spark.sql.functions._
    require(cols.nonEmpty, "need at least one clustering column")
    require(bits >= 1 && bits * cols.size <= 63,
      s"bits*cols (${bits * cols.size}) must fit a signed long")
    val scale = (1L << bits) - 1
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(col(c).cast("double")).as(s"__lo$i"),
        max(col(c).cast("double")).as(s"__hi$i"))
    }
    val bounds = df.agg(aggs.head, aggs.tail: _*)
    val joined = df.join(broadcast(bounds))
    // per-column quantized value in [0, 2^bits)
    val quant = cols.zipWithIndex.map { case (c, i) =>
      val v = col(c).cast("double")
      val lo = col(s"__lo$i")
      val hi = col(s"__hi$i")
      when(v.isNull, lit(0L))
        .when(hi <= lo, lit(0L))
        .otherwise(least(lit(scale),
          greatest(lit(0L),
            floor((v - lo) / (hi - lo) * scale).cast("long"))))
    }
    // interleave: output bit (i*width + j) takes bit i of column j —
    // a flat sum of shift/mask terms, all inside whole-stage codegen
    val width = cols.size
    val z = (0 until bits).flatMap { i =>
      quant.zipWithIndex.map { case (q, j) =>
        import org.apache.spark.sql.functions.shiftleft
        shiftleft(shiftright(q, i).bitwiseAND(lit(1L)), i * width + j)
      }
    }.reduce(_ + _)
    joined.withColumn(outCol, z)
      .drop((0 until width).flatMap(i => Seq(s"__lo$i", s"__hi$i")): _*)
  }

  /** Write `df` z-order-clustered on `cols` into ~`nFiles` files. */
  def writeClustered(df: DataFrame, path: String, cols: Seq[String],
      nFiles: Int, bits: Int = 16): Unit = {
    import org.apache.spark.sql.functions.col
    require(nFiles >= 1, "nFiles must be positive")
    withZValue(df, cols, bits)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
