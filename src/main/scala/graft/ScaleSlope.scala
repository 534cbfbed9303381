package graft

import org.apache.spark.sql.SparkSession

/**
 * Empirical scale-slope probe: runs named queries at two scale factors
 * and checks the time ratio stays near-linear in the data ratio — the
 * runtime complement to PlanLint, which can see shapes (cartesians,
 * unpartitioned windows) but not super-linear CONSTANTS (an O(n log n)
 * sort chain, a quadratic candidate blow-up inside a keyed join).
 *
 * Usage:
 *   runMain graft.ScaleSlope [smallDir] [bigDir] [q1,q2,...] [maxRatio]
 *
 * Defaults: sf0.01 → sf0.1 (10× data), the suite's historically
 * heaviest queries, maxRatio 12 (10× data + scheduling slack; a truly
 * quadratic query shows ≥50× here). Each query runs twice per SF and
 * keeps the min (same noise stance as Bench). Prints one line per
 * query and a final PASS/FAIL; exits non-zero on FAIL so a round-end
 * routine can gate on it.
 */
object ScaleSlope {
  def main(args: Array[String]): Unit = {
    val small = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val big = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val names: Seq[String] =
      if (args.length > 2 && args(2).nonEmpty) args(2).split(",").toSeq
      else Seq(
        // every query whose committed record or probe exceeds ~2.5 s
        // at sf0.1 (round 10 refresh) — the suite's entire heavy tail
        // carries a recorded slope
        "q304_dawid_skene", "q174_poisson_bootstrap", "q296_rmst_by_arm",
        "q256_hits", "q221_kcore", "q234_hop_distance", "q158_pagerank",
        "q317_modularity", "q08_corr_spearman", "q46_corr_kendall",
        "q372_fligner_killeen", "q382_c_index", "q383_ordinal_association",
        "q78_cluster_canonical", "q168_theil_sen", "q167_cliffs_delta",
        "q200_label_propagation", "q222_assortativity",
        "q354_k_sample_ad", "q397_lorenz_deciles", "q401_quade",
        "q404_blomqvist_beta", "q387_ansari_bradley", "q412_runs_test",
        "q414_amoc_changepoint", "q34_dedup_clusters",
        "q418_competing_risks", "q441_weighted_logrank",
        "q445_hoeffdings_d",
        // round-11 heavy-tail entrants (probe > 2.5 s at sf0.1)
        "q540_bradley_terry", "q535_hubness", "q245_naive_bayes",
        "q284_c2st_drift", "q545_psm_att", "q546_randomization_test",
        // round-12 heavy-tail entrants (committed fold ≥ 2.5 s at sf0.1)
        "q570_spectral_radius", "q565_katz_centrality",
        "q586_minhash_error_audit", "q650_butterfly_count",
        "q665_spearman_ci",
        // round-14 heavy-tail entrants (probe ≥ ~2.5 s at sf0.1)
        "q673_containment_pairs", "q679_dedup_threshold_sweep")
    val maxRatio = if (args.length > 3) args(3).toDouble else 12.0
    val cpus = math.min(Runtime.getRuntime.availableProcessors, 32)
    val spark = GraftSession.withFunctions(
      GraftSession.builder(s"local[$cpus]", cpus)
        .config("spark.ui.enabled", "false")
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq(small, big); t <- Tables.all)
      try Tables.load(spark, dir, t).limit(16).write
        .format("noop").mode("overwrite").save()
      catch { case _: Throwable => }

    def minTime(name: String, dir: String): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }

    // an unknown name is a HARD failure, not a silent filter — r13
    // shipped "q650_butterfly" (registered: q650_butterfly_count) and
    // the suite's slowest query silently skipped the gate built for it
    val unknown = names.filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      println(s"SCALE-SLOPE FAIL: unknown query names: ${unknown.mkString(",")}")
      spark.stop()
      sys.exit(2)
    }
    var bad = Vector.empty[String]
    names.foreach { name =>
      val ts = minTime(name, small)
      val tb = minTime(name, big)
      // sub-second small-SF times are dominated by fixed scheduling
      // cost; ratio against a floor so a 0.05 s → 1 s pair (still
      // trivially cheap) doesn't read as a 20× slope
      val ratio = tb / math.max(ts, 0.30)
      val verdict = if (ratio <= maxRatio) "ok" else "SUPTRLINEAR"
      if (ratio > maxRatio) bad :+= name
      println(f"SLOPE $name%-28s small=$ts%6.2fs big=$tb%6.2fs ratio=$ratio%5.1fx $verdict")
    }
    spark.stop()
    if (bad.nonEmpty) {
      println(s"SCALE-SLOPE FAIL: ${bad.mkString(",")}")
      sys.exit(1)
    } else println(s"SCALE-SLOPE PASS: ${names.size} queries ≤ ${maxRatio}x")
  }
}
