package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage-timing harness (dev only). */
object DevTime {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = math.min(Runtime.getRuntime.availableProcessors, 32)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir).cache()
    println(s"docs: ${docs.count()}")

    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"TIME $label%-28s ${ts.map(t => f"$t%6.2f").mkString(" ")}")
    }

    import graft.ops.Dedup
    time("shingles3_nodist") {
      Dedup.shingles(docs, "doc_id", "text", 3, distinct = false)
        .write.format("noop").mode("overwrite").save()
    }
    time("shingles3_distinct") {
      Dedup.shingles(docs, "doc_id", "text", 3)
        .write.format("noop").mode("overwrite").save()
    }
    time("sh_hash_distinct") {
      Dedup.shingles(docs, "doc_id", "text", 3, distinct = false)
        .select(col("id"), xxhash64(col("s")).as("sk")).distinct()
        .write.format("noop").mode("overwrite").save()
    }
    time("minhash_sigs") {
      Dedup.minhashSignatures(docs, "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
    }
    time("minhash_full") {
      Dedup.minhashLsh(docs, "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
    }
    time("jaccard_full") {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
