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
    import graft.ops.Dedup
    val docs = Tables.documents(spark, d)
    docs.limit(4).write.format("noop").mode("overwrite").save()
    time("shingles")(Dedup.shingles(docs, "doc_id", "text", 3, distinct = false)
      .write.format("noop").mode("overwrite").save())
    time("signatures")(Dedup.minhashSignatures(docs, "doc_id", "text")
      .write.format("noop").mode("overwrite").save())
    time("full q21")(Dedup.minhashLsh(docs, "doc_id", "text")
      .write.format("noop").mode("overwrite").save())
    time("full q21 again")(Dedup.minhashLsh(docs, "doc_id", "text")
      .write.format("noop").mode("overwrite").save())
    time("jaccard q22")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .write.format("noop").mode("overwrite").save())
    val sh = Dedup.shingles(docs, "doc_id", "text", 3, distinct = true)
    println("shingle rows: " + sh.count() + " distinct shingles: " +
      sh.select("s").distinct().count())
    spark.stop()
  }
}
