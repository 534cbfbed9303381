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
    import graft.ops.Multimodal
    val scanned = Multimodal.scanBinaryFiles(spark, "/tmp/blobs")
    scanned.select("path", "length", "blob_ref.checksum", "blob_ref.size_bytes",
      "blob_ref.etag").show(5, 48)
    val integ = Multimodal.blobIntegrity(scanned, "blob_ref", "content")
    integ.show()
    // corrupt one checksum → integrity must flag exactly 1
    import org.apache.spark.sql.functions._
    val corrupted = scanned.withColumn("blob_ref",
      when(col("path").endsWith("b.bin"),
        struct(col("blob_ref.uri").as("uri"),
          col("blob_ref.content_type").as("content_type"),
          lit("deadbeef").as("checksum"),
          col("blob_ref.hash_algorithm").as("hash_algorithm"),
          col("blob_ref.size_bytes").as("size_bytes"),
          col("blob_ref.etag").as("etag"),
          col("blob_ref.version_id").as("version_id"),
          col("blob_ref.metadata").as("metadata")))
        .otherwise(col("blob_ref")))
    Multimodal.blobIntegrity(corrupted, "blob_ref", "content").show()
    val feats = Multimodal.extractFeatures(scanned, "path", "content", dim = 4)
    feats.show(5, 60)
    spark.stop()
  }
}
