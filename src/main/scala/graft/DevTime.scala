package graft

import org.apache.spark.sql.functions._

/** Scratch phase-timing probe for local development; not part of the
  * library surface. */
object DevTime {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.withFunctions(
      GraftSession.builder("local[32]", 32)
        .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    Tables.lineitem(spark, dir).count()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $label%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    for (_ <- 1 to 2) {
      val rt = Tables.lineitem(spark, dir)
        .withColumn("rater", col("l_suppkey") % 7)
      val cells = t("voteCells")(
        graft.ops.Labeling.voteCells(rt, "l_orderkey", "rater",
          "l_returnflag"))
      val ds = t("dawidSkene-build")(
        graft.ops.Labeling.dawidSkeneFromCells(cells, iterations = 2))
      val mv = graft.ops.Labeling.majorityVoteFromCells(cells)
      t("final-join") {
        ds.items.select(col("item"), col("label").as("ds_label"))
          .join(mv.select(col("item"), col("label").as("vote_label")),
            Seq("item"))
          .groupBy("ds_label", "vote_label").agg(count(lit(1)).as("n"))
          .orderBy("ds_label", "vote_label")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
