package graft

import org.apache.spark.sql.functions._

/** Scratch phase-timing probe for local development; not part of the
  * library surface. Current use (r14): same-session A/B of the q565/
  * q570 supplier co-occurrence refactor — OLD shape rebuilds the b⋈b
  * pair-join edge frame per query and lets each op symmetrize+distinct
  * internally; NEW shape reads the shared Tables.materialized frame
  * with preNormalized=true. Alternating rounds, min printed per
  * variant. */
object DevTime {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.withFunctions(
      GraftSession.builder("local[32]", 32)
        .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val s = spark
    Tables.lineitem(s, d).write.format("noop").mode("overwrite").save()

    def pairEdges() = {
      val b = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("bk"), col("l_suppkey").as("it"))
        .distinct()
      b.as("l")
        .join(b.as("r"),
          col("l.bk") === col("r.bk") && col("l.it") < col("r.it"))
        .select(col("l.it").as("s1"), col("r.it").as("s2"))
    }
    def sharedEdges() =
      graft.Queries.suppCoocEdges(s, d)

    def run(df: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def katzOld() = run(
      graft.ops.Graph.katzCentrality(pairEdges(), "s1", "s2",
        alpha = 0.005, iterations = 8)
        .orderBy(desc("katz"), col("node")).limit(10))
    def katzNew() = run(
      graft.ops.Graph.katzCentrality(sharedEdges(), "s1", "s2",
        alpha = 0.005, iterations = 8, preNormalized = true)
        .orderBy(desc("katz"), col("node")).limit(10))
    def specOld() = run(
      graft.ops.Graph.spectralRadius(pairEdges(), "s1", "s2",
        iterations = 8))
    def specNew() = run(
      graft.ops.Graph.spectralRadius(sharedEdges(), "s1", "s2",
        iterations = 8, preNormalized = true))

    val ko = Vector(katzOld(), katzOld(), katzOld())
    val kn = Vector(katzNew(), katzNew(), katzNew())
    val so = Vector(specOld(), specOld(), specOld())
    val sn = Vector(specNew(), specNew(), specNew())
    println(f"AB katz  old=${ko.map(x => f"$x%5.2f").mkString(" ")} min=${ko.min}%5.2f")
    println(f"AB katz  new=${kn.map(x => f"$x%5.2f").mkString(" ")} min=${kn.min}%5.2f")
    println(f"AB spec  old=${so.map(x => f"$x%5.2f").mkString(" ")} min=${so.min}%5.2f")
    println(f"AB spec  new=${sn.map(x => f"$x%5.2f").mkString(" ")} min=${sn.min}%5.2f")
    spark.stop()
  }
}
