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
    import graft.analysis.Stats
    println(f"t=2.0 df=10 two-sided p = ${Stats.tTestPValue(2.0, 10)}%.5f (expect 0.07339)")
    println(f"chi2=3.841 dof=1 p = ${Stats.chi2PValue(3.841, 1)}%.5f (expect 0.05004)")
    println(f"Phi(1.96) = ${Stats.normalCdf(1.96)}%.6f (expect 0.975002)")
    println(f"z=1.96 two-sided p = ${Stats.zTestPValue(1.96)}%.5f (expect 0.04999)")
    println(f"F=4.10 d1=2 d2=10 p = ${Stats.fTestPValue(4.10, 2, 10)}%.5f (expect ~0.0500)")
    println(f"invT(0.975, 10) = ${Stats.inverseTCdf(0.975, 10)}%.4f (expect 2.2281)")
    val ci = Stats.welchConfidenceInterval(1.0, 0.5, 10)
    println(f"welch CI = (${ci._1}%.4f, ${ci._2}%.4f) (expect (-0.1141, 2.1141))")
    spark.stop()
  }
}
