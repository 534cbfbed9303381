package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.analysis._

/**
 * Driver-verified query registry. Each entry pairs a Spark DataFrame
 * program (built on the graft library operators) with an equivalent DuckDB
 * SQL oracle over the same parquet tables.
 *
 * Determinism/parity rules (see SURVEY.md §5):
 *  - every query ends with an explicit ORDER BY over a unique key prefix;
 *  - float aggregates are rounded, with the rounding grid chosen per
 *    magnitude (sums of ~1e9 → round 2; unit-scale stats → round 6) so the
 *    grid is far coarser than cross-engine fp summation noise;
 *  - time windows anchor to max(ts), never NOW();
 *  - formulas that both engines must evaluate (histogram bucketing, moment
 *    stats, drift) are written with structurally identical arithmetic.
 */
object Queries {

  type QueryFn = (SparkSession, String) => DataFrame

  final case class Entry(name: String, fn: QueryFn, oracle: Option[String])

  private def r2(c: org.apache.spark.sql.Column) = round(c, 2)
  private def r6(c: org.apache.spark.sql.Column) = round(c, 6)

  // ------------------------------------------------------------------
  // Shared cross-query substrates (computed once per session+dir)
  // ------------------------------------------------------------------

  /** The k-sample rank family's (value, event_type) cell frame over
    * `events` — q45/q300/q302/q323/q354/q355/q372 all reduce this ONE
    * memoized corpus shuffle instead of re-deriving it per query (the
    * same cross-query amortization the graph family's edge frame
    * uses). */
  private def eventTypeValueCells(s: SparkSession, d: String): DataFrame =
    Tables.materialized(s, d, "events_type_value_cells")(
      AnalysisPlanner.rankCells(Tables.events(s, d), "event_type", "value"))

  /** Kendall concordance frame of (value, user_id) over `events` — a
    * 1-row sufficient-statistics result that q46 reports directly and
    * q383 re-derives ordinal-association measures from; memoized so
    * the Fenwick inversion pass runs once per session+dir. */
  private def eventsKendallValueUser(s: SparkSession, d: String): DataFrame =
    Tables.materialized(s, d, "events_kendall_value_user")(
      AnalysisPlanner.kendallTau(Tables.events(s, d), "value", "user_id",
        "event_id"))

  /** The trigram-Jaccard near-dup cluster assignment over `documents`
    * (shingle → pruned posting join → threshold pairs → connected
    * components) — the production "cluster store" that q34 reports
    * directly and q78's canonical selection reduces; the multi-stage
    * CC iteration is the expensive part, so it runs ONCE per
    * (session, dir) — exactly the persisted cluster-store read a
    * cluster deployment would do ([[graft.ops.Dedup.writeClusterStore]]). */
  private def docTrigramPairs(s: SparkSession, d: String): DataFrame =
    Tables.materialized(s, d, "doc_trigram_pairs")(
      graft.ops.Dedup.ngramJaccardPairs(Tables.documents(s, d), "doc_id",
        "text", 3, 0.8, maxPostings = 100))

  private def docTrigramClusters(s: SparkSession, d: String): DataFrame =
    Tables.materialized(s, d, "doc_trigram_clusters")(
      graft.ops.Dedup.dedupClusters(Tables.documents(s, d), "doc_id",
        docTrigramPairs(s, d)))

  // ------------------------------------------------------------------
  // Analysis operators
  // ------------------------------------------------------------------

  /** Aggregation with group_by — full metric set on lineitem.l_quantity. */
  private val q01 = Entry(
    "q01_agg_group",
    (s, d) => {
      val spec = Aggregation(
        feature = "l_quantity",
        metrics = Seq("count", "sum", "avg", "min", "max", "stddev",
          "variance", "median", "null_count", "null_rate", "distinct_count"),
        groupBy = Seq("l_returnflag", "l_linestatus"))
      AnalysisPlanner
        .plan(Tables.lineitem(s, d), spec)
        .select(
          col("l_returnflag"), col("l_linestatus"),
          col("count").as("cnt"),
          r2(col("sum")).as("sum_qty"),
          r6(col("avg")).as("avg_qty"),
          col("min").as("min_qty"),
          col("max").as("max_qty"),
          r6(col("stddev")).as("std_qty"),
          r6(col("variance")).as("var_qty"),
          r6(col("median")).as("median_qty"),
          col("null_count").as("null_cnt"),
          r6(col("null_rate")).as("null_rate"),
          col("distinct_count").as("nd_qty"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             count(l_quantity) AS cnt,
             round(sum(l_quantity), 2) AS sum_qty,
             round(avg(l_quantity), 6) AS avg_qty,
             min(l_quantity) AS min_qty,
             max(l_quantity) AS max_qty,
             round(stddev_samp(l_quantity), 6) AS std_qty,
             round(var_samp(l_quantity), 6) AS var_qty,
             round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
             count(*) - count(l_quantity) AS null_cnt,
             round(1.0 - count(l_quantity) / count(*), 6) AS null_rate,
             count(DISTINCT l_quantity) AS nd_qty
      FROM lineitem
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  /** Aggregation with a 7d time window anchored to max(ts). */
  private val q02 = Entry(
    "q02_agg_window",
    (s, d) => {
      val spec = Aggregation(
        feature = "value",
        metrics = Seq("count", "sum", "avg", "p95"),
        window = Some("7d"),
        groupBy = Seq("event_type"),
        timeColumn = "ts")
      AnalysisPlanner
        .plan(Tables.events(s, d), spec)
        .select(
          col("event_type"),
          col("count").as("cnt"),
          r2(col("sum")).as("sum_value"),
          r6(col("avg")).as("avg_value"),
          r6(col("p95")).as("p95_value"))
        .orderBy("event_type")
    },
    Some("""
      SELECT event_type,
             count("value") AS cnt,
             round(sum("value"), 2) AS sum_value,
             round(avg("value"), 6) AS avg_value,
             round(quantile_cont("value", 0.95), 6) AS p95_value
      FROM events
      WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 7 DAY
      GROUP BY event_type
      ORDER BY event_type"""))

  /** Rolling 7-period daily aggregation (PRD.md:985-994 semantics). */
  private val q03 = Entry(
    "q03_agg_rolling",
    (s, d) => {
      val spec = Aggregation(
        feature = "value",
        metrics = Seq("sum", "count"),
        rolling = true,
        periods = Some(7),
        timeColumn = "ts")
      AnalysisPlanner
        .plan(Tables.events(s, d), spec)
        .select(
          to_date(col("period")).as("day"),
          r2(col("sum")).as("day_sum"),
          col("count").as("cnt"),
          r2(col("rolling_sum")).as("rolling_sum7"),
          col("rolling_count").as("rolling_cnt7"))
        .orderBy("day")
    },
    Some("""
      WITH dly AS (
        SELECT CAST(ts AS DATE) AS day,
               sum("value") AS s,
               count("value") AS c
        FROM events GROUP BY 1)
      SELECT day,
             round(s, 2) AS day_sum,
             c AS cnt,
             round(sum(s) OVER (ORDER BY day RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW), 2) AS rolling_sum7,
             CAST(sum(c) OVER (ORDER BY day RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW) AS BIGINT) AS rolling_cnt7
      FROM dly ORDER BY day"""))

  /** Distribution: 20-bin equal-width histogram. */
  private val q04 = Entry(
    "q04_histogram",
    (s, d) =>
      AnalysisPlanner
        .histogram(Tables.lineitem(s, d), "l_extendedprice", 20)
        .select(col("bucket"), col("n"))
        .orderBy("bucket"),
    Some("""
      WITH b AS (SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi FROM lineitem)
      SELECT LEAST(CAST(FLOOR(((l_extendedprice - lo) / (hi - lo)) * 20) AS BIGINT), 19) AS bucket,
             count(*) AS n
      FROM lineitem, b
      GROUP BY 1 ORDER BY 1"""))

  /** Distribution: moment statistics (pop. skewness/kurtosis, shared formula). */
  private val q05 = Entry(
    "q05_dist_stats",
    (s, d) =>
      AnalysisPlanner
        .momentStats(Tables.lineitem(s, d), "l_quantity")
        .select(
          col("n"),
          r6(col("mean")).as("mean"),
          r6(col("stddev_pop")).as("stddev_pop"),
          r6(col("skewness_pop")).as("skewness_pop"),
          r6(col("kurtosis_pop")).as("kurtosis_pop")),
    Some("""
      WITH m AS (
        SELECT count(l_quantity) AS n,
               avg(l_quantity) AS m1,
               avg(l_quantity * l_quantity) AS m2,
               avg(l_quantity * l_quantity * l_quantity) AS m3,
               avg(l_quantity * l_quantity * l_quantity * l_quantity) AS m4
        FROM lineitem)
      SELECT n,
             round(m1, 6) AS mean,
             round(sqrt(m2 - m1 * m1), 6) AS stddev_pop,
             round((m3 - 3.0 * m1 * m2 + 2.0 * m1 * m1 * m1) / power(m2 - m1 * m1, 1.5), 6) AS skewness_pop,
             round((m4 - 4.0 * m1 * m3 + 6.0 * m1 * m1 * m2 - 3.0 * m1 * m1 * m1 * m1) / power(m2 - m1 * m1, 2.0) - 3.0, 6) AS kurtosis_pop
      FROM m"""))

  /** Distribution: exact percentiles p25..p99. */
  private val q06 = Entry(
    "q06_percentiles",
    (s, d) =>
      AnalysisPlanner
        .percentiles(Tables.lineitem(s, d), "l_extendedprice")
        .select(
          r6(col("p25")).as("p25"), r6(col("p50")).as("p50"),
          r6(col("p75")).as("p75"), r6(col("p90")).as("p90"),
          r6(col("p95")).as("p95"), r6(col("p99")).as("p99")),
    Some("""
      SELECT round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
             round(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
             round(quantile_cont(l_extendedprice, 0.75), 6) AS p75,
             round(quantile_cont(l_extendedprice, 0.90), 6) AS p90,
             round(quantile_cont(l_extendedprice, 0.95), 6) AS p95,
             round(quantile_cont(l_extendedprice, 0.99), 6) AS p99
      FROM lineitem"""))

  /** RecordLookup: projection + filter + order + limit. */
  private val q12 = Entry(
    "q12_record_lookup",
    (s, d) =>
      AnalysisPlanner
        .recordLookup(
          Tables.orders(s, d),
          RecordLookup(
            features = Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"),
            filter = Some("o_totalprice > 150000"),
            orderBy = Seq("o_totalprice", "o_orderkey"),
            descending = true,
            limit = 100)),
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
      FROM orders
      WHERE o_totalprice > 150000
      ORDER BY o_totalprice DESC, o_orderkey DESC
      LIMIT 100"""))

  /** DataQuality profile: completeness / distincts / key uniqueness. */
  private val q13 = Entry(
    "q13_data_quality",
    (s, d) =>
      AnalysisPlanner
        .dataQuality(
          Tables.orders(s, d),
          DataQuality(
            features = Seq("o_totalprice", "o_orderstatus", "o_custkey"),
            keyColumns = Seq("o_orderkey")))
        .select(
          col("row_count"),
          r6(col("null_rate__o_totalprice")).as("nr_totalprice"),
          r6(col("null_rate__o_orderstatus")).as("nr_orderstatus"),
          r6(col("null_rate__o_custkey")).as("nr_custkey"),
          col("distinct__o_totalprice").as("nd_totalprice"),
          col("distinct__o_orderstatus").as("nd_orderstatus"),
          col("distinct__o_custkey").as("nd_custkey"),
          col("dup_keys")),
    Some("""
      SELECT CAST(count(*) AS DOUBLE) AS row_count,
             round(1.0 - count(o_totalprice) / count(*), 6) AS nr_totalprice,
             round(1.0 - count(o_orderstatus) / count(*), 6) AS nr_orderstatus,
             round(1.0 - count(o_custkey) / count(*), 6) AS nr_custkey,
             CAST(count(DISTINCT o_totalprice) AS DOUBLE) AS nd_totalprice,
             CAST(count(DISTINCT o_orderstatus) AS DOUBLE) AS nd_orderstatus,
             CAST(count(DISTINCT o_custkey) AS DOUBLE) AS nd_custkey,
             CAST(count(*) - count(DISTINCT o_orderkey) AS DOUBLE) AS dup_keys
      FROM orders"""))

  /** Pearson correlation matrix (single distributed aggregate pass). */
  private val q07 = Entry(
    "q07_corr_pearson",
    (s, d) => {
      val feats = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val out = AnalysisPlanner.correlation(
        Tables.lineitem(s, d), Correlation(feats, "pearson"))
      out.select(out.columns.map(c => r6(col(c)).as(c)): _*)
    },
    Some("""
      SELECT round(corr(l_quantity, l_extendedprice), 6) AS corr_l_quantity__l_extendedprice,
             round(corr(l_quantity, l_discount), 6) AS corr_l_quantity__l_discount,
             round(corr(l_quantity, l_tax), 6) AS corr_l_quantity__l_tax,
             round(corr(l_extendedprice, l_discount), 6) AS corr_l_extendedprice__l_discount,
             round(corr(l_extendedprice, l_tax), 6) AS corr_l_extendedprice__l_tax,
             round(corr(l_discount, l_tax), 6) AS corr_l_discount__l_tax
      FROM lineitem"""))

  /** Spearman rank correlation (rank() min-rank convention, both engines). */
  private val q08 = Entry(
    "q08_corr_spearman",
    (s, d) => {
      val feats = Seq("l_quantity", "l_extendedprice", "l_discount")
      val out = AnalysisPlanner.correlation(
        Tables.lineitem(s, d), Correlation(feats, "spearman"))
      out.select(out.columns.map(c => r6(col(c)).as(c)): _*)
    },
    Some("""
      WITH r AS (
        SELECT CAST(rank() OVER (ORDER BY l_quantity) AS DOUBLE) AS r1,
               CAST(rank() OVER (ORDER BY l_extendedprice) AS DOUBLE) AS r2,
               CAST(rank() OVER (ORDER BY l_discount) AS DOUBLE) AS r3
        FROM lineitem)
      SELECT round(corr(r1, r2), 6) AS corr_l_quantity__l_extendedprice,
             round(corr(r1, r3), 6) AS corr_l_quantity__l_discount,
             round(corr(r2, r3), 6) AS corr_l_extendedprice__l_discount
      FROM r"""))

  private val driftBaseline = "ts < TIMESTAMP '2024-01-16 00:00:00'"
  private val driftCurrent = "ts >= TIMESTAMP '2024-01-16 00:00:00'"

  /** Drift: all five divergence metrics between two time windows. */
  private val q09 = Entry(
    "q09_drift",
    (s, d) =>
      AnalysisPlanner
        .drift(Tables.events(s, d),
          Drift("value", driftBaseline, driftCurrent,
            Seq("psi", "kl_divergence", "js_divergence", "wasserstein", "ks_statistic"),
            bins = 10))
        .select(
          r6(col("psi")).as("psi"),
          r6(col("kl_divergence")).as("kl_divergence"),
          r6(col("js_divergence")).as("js_divergence"),
          r6(col("wasserstein")).as("wasserstein"),
          r6(col("ks_statistic")).as("ks_statistic")),
    Some(s"""
      WITH f AS (
        SELECT "value" AS v,
               CASE WHEN $driftBaseline THEN 1 ELSE 0 END AS ia,
               CASE WHEN $driftCurrent THEN 1 ELSE 0 END AS ib
        FROM events
        WHERE ($driftBaseline) OR ($driftCurrent)),
      b AS (SELECT min(v) AS lo, max(v) AS hi FROM f),
      h AS (
        SELECT LEAST(CAST(FLOOR(((v - lo) / (hi - lo)) * 10) AS BIGINT), 9) AS bucket,
               sum(ia) AS na, sum(ib) AS nb
        FROM f, b GROUP BY 1),
      p AS (
        SELECT bucket,
               greatest(na / (sum(na) OVER ()), 1e-9) AS p,
               greatest(nb / (sum(nb) OVER ()), 1e-9) AS q,
               (sum(na) OVER (ORDER BY bucket)) / (sum(na) OVER ()) AS cp,
               (sum(nb) OVER (ORDER BY bucket)) / (sum(nb) OVER ()) AS cq
        FROM h)
      SELECT round(sum((p - q) * ln(p / q)), 6) AS psi,
             round(sum(p * ln(p / q)), 6) AS kl_divergence,
             round(sum(p * ln(p / ((p + q) / 2.0))) / 2.0 + sum(q * ln(q / ((p + q) / 2.0))) / 2.0, 6) AS js_divergence,
             round(sum(abs(cp - cq)), 6) AS wasserstein,
             round(max(abs(cp - cq)), 6) AS ks_statistic
      FROM p"""))

  /** Two-sample KS test (exact CDFs via RANGE-frame windows). */
  private val q10 = Entry(
    "q10_stattest_ks",
    (s, d) =>
      AnalysisPlanner
        .statTest(Tables.events(s, d),
          StatTest("value", "ks", "event_type", "purchase", "click"))
        .select(r6(col("ks_stat")).as("ks_stat")),
    Some("""
      WITH u AS (
        SELECT "value" AS x,
               CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS ic,
               CASE WHEN event_type = 'click' THEN 1.0 ELSE 0.0 END AS it
        FROM events
        WHERE event_type IN ('purchase', 'click')),
      c AS (
        SELECT sum(ic) OVER (ORDER BY x) / (sum(ic) OVER ()) AS fc,
               sum(it) OVER (ORDER BY x) / (sum(it) OVER ()) AS ft
        FROM u)
      SELECT round(max(abs(fc - ft)), 6) AS ks_stat FROM c"""))

  /** Welch t-test: single conditional-aggregation pass. */
  private val q11 = Entry(
    "q11_stattest_welch",
    (s, d) =>
      AnalysisPlanner
        .statTest(Tables.events(s, d),
          StatTest("value", "welch", "event_type", "purchase", "click"))
        .select(
          r6(col("mean_c")).as("mean_c"), r6(col("mean_t")).as("mean_t"),
          r6(col("var_c")).as("var_c"), r6(col("var_t")).as("var_t"),
          col("n_c"), col("n_t"),
          r6(col("effect_size")).as("effect_size"),
          r6(col("t_stat")).as("t_stat"),
          r6(col("df_welch")).as("df_welch")),
    Some("""
      WITH g AS (
        SELECT avg(CASE WHEN event_type = 'purchase' THEN "value" END) AS mean_c,
               avg(CASE WHEN event_type = 'click' THEN "value" END) AS mean_t,
               var_samp(CASE WHEN event_type = 'purchase' THEN "value" END) AS var_c,
               var_samp(CASE WHEN event_type = 'click' THEN "value" END) AS var_t,
               count(CASE WHEN event_type = 'purchase' THEN "value" END) AS n_c,
               count(CASE WHEN event_type = 'click' THEN "value" END) AS n_t
        FROM events
        WHERE event_type IN ('purchase', 'click'))
      SELECT round(mean_c, 6) AS mean_c, round(mean_t, 6) AS mean_t,
             round(var_c, 6) AS var_c, round(var_t, 6) AS var_t,
             n_c, n_t,
             round((mean_t - mean_c) / sqrt((var_c + var_t) / 2.0), 6) AS effect_size,
             round((mean_t - mean_c) / sqrt(var_c / n_c + var_t / n_t), 6) AS t_stat,
             round(power(var_c / n_c + var_t / n_t, 2.0) /
                   (power(var_c / n_c, 2.0) / (n_c - 1) + power(var_t / n_t, 2.0) / (n_t - 1)), 6) AS df_welch
      FROM g"""))

  /** VersionDiff: statistics diff + distribution drift between versions. */
  private val q14 = Entry(
    "q14_version_diff",
    (s, d) =>
      AnalysisPlanner
        .versionDiff(Tables.lineitem(s, d),
          VersionDiff("l_quantity", "l_linestatus = 'O'", "l_linestatus = 'F'", bins = 10))
        .select(
          col("n_a"), col("n_b"),
          r6(col("mean_a")).as("mean_a"), r6(col("mean_b")).as("mean_b"),
          r6(col("std_a")).as("std_a"), r6(col("std_b")).as("std_b"),
          r6(col("mean_diff")).as("mean_diff"),
          r6(col("psi")).as("psi"),
          r6(col("kl_divergence")).as("kl_divergence")),
    Some("""
      WITH st AS (
        SELECT count(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS n_a,
               count(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS n_b,
               avg(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS mean_a,
               avg(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS mean_b,
               stddev_samp(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS std_a,
               stddev_samp(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS std_b
        FROM lineitem
        WHERE l_linestatus = 'O' OR l_linestatus = 'F'),
      f AS (
        SELECT l_quantity AS v,
               CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END AS ia,
               CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END AS ib
        FROM lineitem
        WHERE l_linestatus = 'O' OR l_linestatus = 'F'),
      b AS (SELECT min(v) AS lo, max(v) AS hi FROM f),
      h AS (
        SELECT LEAST(CAST(FLOOR(((v - lo) / (hi - lo)) * 10) AS BIGINT), 9) AS bucket,
               sum(ia) AS na, sum(ib) AS nb
        FROM f, b GROUP BY 1),
      p AS (
        SELECT greatest(na / (sum(na) OVER ()), 1e-9) AS p,
               greatest(nb / (sum(nb) OVER ()), 1e-9) AS q
        FROM h),
      dr AS (
        SELECT sum((p - q) * ln(p / q)) AS psi, sum(p * ln(p / q)) AS kl
        FROM p)
      SELECT n_a, n_b,
             round(mean_a, 6) AS mean_a, round(mean_b, 6) AS mean_b,
             round(std_a, 6) AS std_a, round(std_b, 6) AS std_b,
             round(mean_b - mean_a, 6) AS mean_diff,
             round(psi, 6) AS psi, round(kl, 6) AS kl_divergence
      FROM st, dr"""))

  /** Chi-square independence test over binned feature × segment. */
  private val q43 = Entry(
    "q43_stattest_chi2",
    (s, d) =>
      AnalysisPlanner
        .statTest(Tables.events(s, d),
          StatTest("value", "chi2", "event_type", "purchase", "click", bins = 10))
        .select(r6(col("chi2_stat")).as("chi2_stat"), col("dof")),
    Some("""
      WITH f AS (
        SELECT "value" AS v, event_type FROM events
        WHERE event_type IN ('purchase', 'click')),
      b AS (SELECT min(v) AS lo, max(v) AS hi FROM f),
      h AS (
        SELECT LEAST(CAST(FLOOR(((v - lo) / (hi - lo)) * 10) AS BIGINT), 9) AS band,
               sum(CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END) AS oc,
               sum(CASE WHEN event_type = 'click' THEN 1.0 ELSE 0.0 END) AS ot
        FROM f, b GROUP BY 1),
      t AS (
        SELECT band, oc, ot, oc + ot AS rt,
               sum(oc) OVER () AS nc, sum(ot) OVER () AS nt
        FROM h),
      e AS (
        SELECT *, nc + nt AS n,
               rt * nc / (nc + nt) AS ec, rt * nt / (nc + nt) AS et
        FROM t)
      SELECT round(sum(power(oc - ec, 2.0) / ec + power(ot - et, 2.0) / et), 6) AS chi2_stat,
             count(*) - 1 AS dof
      FROM e"""))

  /** One-way ANOVA across all segment values. */
  private val q44 = Entry(
    "q44_stattest_anova",
    (s, d) =>
      AnalysisPlanner
        .statTest(Tables.events(s, d),
          StatTest("value", "anova", "event_type", "", ""))
        .select(
          r6(col("f_stat")).as("f_stat"),
          col("df_between"), col("df_within")),
    Some("""
      WITH g AS (
        SELECT event_type, count("value") AS n, avg("value") AS m,
               var_samp("value") AS v
        FROM events GROUP BY 1),
      w AS (
        SELECT *, sum(m * n) OVER () / sum(n) OVER () AS gm,
               count(*) OVER () AS k, sum(n) OVER () AS ntot
        FROM g)
      SELECT round((sum(n * power(m - gm, 2.0)) / (max(k) - 1)) /
                   (sum((n - 1) * v) / (max(ntot) - max(k))), 6) AS f_stat,
             CAST(max(k) - 1 AS BIGINT) AS df_between,
             CAST(max(ntot) - max(k) AS BIGINT) AS df_within
      FROM w"""))

  /** Mann-Whitney U (rank-sum, min-rank ties, normal approximation z). */
  private val q45 = Entry(
    "q45_stattest_mannwhitney",
    (s, d) =>
      AnalysisPlanner
        .mannWhitneyFromCells(eventTypeValueCells(s, d),
          control = "purchase", treatment = "click")
        .select(
          col("n_c"), col("n_t"),
          r6(col("u_stat")).as("u_stat"),
          r6(col("z_stat")).as("z_stat")),
    Some("""
      WITH f AS (
        SELECT "value" AS v, event_type FROM events
        WHERE event_type IN ('purchase', 'click')),
      r AS (
        SELECT v, event_type,
               CAST(rank() OVER (ORDER BY v) AS DOUBLE) AS rk
        FROM f),
      a AS (
        SELECT sum(CASE WHEN event_type = 'click' THEN rk END) AS r_t,
               count(CASE WHEN event_type = 'click' THEN v END) AS n_t,
               count(CASE WHEN event_type = 'purchase' THEN v END) AS n_c
        FROM r)
      SELECT n_c, n_t,
             round(r_t - n_t * (n_t + 1) / 2.0, 6) AS u_stat,
             round((r_t - n_t * (n_t + 1) / 2.0 - n_c * n_t / 2.0) /
                   sqrt(n_c * n_t * (n_c + n_t + 1) / 12.0), 6) AS z_stat
      FROM a"""))

  // ------------------------------------------------------------------
  // Derived-feature expression surface
  // ------------------------------------------------------------------

  /** Derived features: CASE/COALESCE/NULLIF/string fns — the reference's
    * `derived_from` expression language, materialized via withColumn. */
  private val q15 = Entry(
    "q15_derived_features",
    (s, d) =>
      Tables.customer(s, d)
        .withColumn("name_upper", upper(col("c_name")))
        .withColumn("bal_bucket",
          when(col("c_acctbal") < 0, "neg")
            .when(col("c_acctbal") < 5000, "low")
            .otherwise("high"))
        .withColumn("bal_per_nation",
          r6(col("c_acctbal") / nullif(col("c_nationkey").cast("double"), lit(0.0))))
        .withColumn("name_prefix", substring(col("c_name"), 1, 8))
        .withColumn("name_len", length(col("c_name")).cast("long"))
        .withColumn("seg_key",
          concat(col("c_mktsegment"), lit("#"), col("c_custkey").cast("string")))
        .select("c_custkey", "name_upper", "bal_bucket", "bal_per_nation",
          "name_prefix", "name_len", "seg_key")
        .orderBy("c_custkey"),
    Some("""
      SELECT c_custkey,
             upper(c_name) AS name_upper,
             CASE WHEN c_acctbal < 0 THEN 'neg'
                  WHEN c_acctbal < 5000 THEN 'low'
                  ELSE 'high' END AS bal_bucket,
             round(c_acctbal / nullif(CAST(c_nationkey AS DOUBLE), 0.0), 6) AS bal_per_nation,
             substring(c_name, 1, 8) AS name_prefix,
             length(c_name) AS name_len,
             concat(c_mktsegment, '#', CAST(c_custkey AS VARCHAR)) AS seg_key
      FROM customer
      ORDER BY c_custkey"""))

  /** Vector function surface (DOT/COSINE/L1/L2/NORM) through the SQL
    * registration path — the reference's custom vector UDFs. */
  private val q16 = Entry(
    "q16_vector_functions",
    (s, d) => {
      graft.functions.VectorFunctions.registerAll(s)
      Tables.embeddings(s, d).createOrReplaceTempView("emb")
      s.sql("""
        SELECT a.vec_id,
               round(DOT(CAST(a.embedding AS ARRAY<DOUBLE>), CAST(b.embedding AS ARRAY<DOUBLE>)), 6) AS dot,
               round(COSINE_SIMILARITY(CAST(a.embedding AS ARRAY<DOUBLE>), CAST(b.embedding AS ARRAY<DOUBLE>)), 6) AS cosine,
               round(L2_DISTANCE(CAST(a.embedding AS ARRAY<DOUBLE>), CAST(b.embedding AS ARRAY<DOUBLE>)), 6) AS l2,
               round(L1_DISTANCE(CAST(a.embedding AS ARRAY<DOUBLE>), CAST(b.embedding AS ARRAY<DOUBLE>)), 6) AS l1,
               round(NORM(CAST(a.embedding AS ARRAY<DOUBLE>)), 6) AS norm_a
        FROM emb a JOIN emb b ON b.vec_id = a.vec_id + 1
        ORDER BY a.vec_id""")
    },
    Some("""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
      SELECT a.vec_id,
             round(list_dot_product(a.v, b.v), 6) AS dot,
             round(list_dot_product(a.v, b.v) /
                   (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine,
             round(sqrt(list_aggregate(list_transform(list_zip(a.v, b.v),
                   x -> (x[1] - x[2]) * (x[1] - x[2])), 'sum')), 6) AS l2,
             round(list_aggregate(list_transform(list_zip(a.v, b.v),
                   x -> abs(x[1] - x[2])), 'sum'), 6) AS l1,
             round(sqrt(list_dot_product(a.v, a.v)), 6) AS norm_a
      FROM e a JOIN e b ON b.vec_id = a.vec_id + 1
      ORDER BY a.vec_id"""))

  /** SQLTransform with {{checkpoint}} substitution — the incremental ETL
    * read path, run through the real transform machinery. */
  private val q18 = Entry(
    "q18_sql_transform_incremental",
    (s, d) => {
      val t = graft.etl.SqlTransform("""
        SELECT CAST(ts AS DATE) AS day,
               count(*) AS n,
               round(sum(value), 2) AS revenue
        FROM ev
        WHERE ts > {{checkpoint}}
        GROUP BY CAST(ts AS DATE)
        ORDER BY day""")
      val ctx = graft.etl.TransformContext(
        jobId = "q18", runId = "r1",
        executionDate = java.time.Instant.parse("2024-02-01T00:00:00Z"),
        isIncremental = true,
        checkpointValue = Some("2024-01-20 00:00:00"))
      t(s, ctx, Map("ev" -> Tables.events(s, d)))
    },
    Some("""
      SELECT CAST(ts AS DATE) AS day,
             count(*) AS n,
             round(sum("value"), 2) AS revenue
      FROM events
      WHERE ts > TIMESTAMP '2024-01-20 00:00:00'
      GROUP BY CAST(ts AS DATE)
      ORDER BY day"""))

  /** Serving-style point lookup on the entity key. */
  private val q17 = Entry(
    "q17_point_lookup",
    (s, d) =>
      Tables.customer(s, d)
        .where(col("c_custkey").isin(1L, 5L, 10L, 50L, 100L, 500L))
        .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
        .orderBy("c_custkey"),
    Some("""
      SELECT c_custkey, c_name, c_acctbal, c_mktsegment
      FROM customer
      WHERE c_custkey IN (1, 5, 10, 50, 100, 500)
      ORDER BY c_custkey"""))

  /** Distribution CDF over histogram buckets. */
  private val q47 = Entry(
    "q47_distribution_cdf",
    (s, d) =>
      AnalysisPlanner
        .cdf(AnalysisPlanner.histogram(Tables.lineitem(s, d), "l_extendedprice", 20))
        .select(col("bucket"), col("n"), col("cum_n"),
          r6(col("cdf")).as("cdf"))
        .orderBy("bucket"),
    Some("""
      WITH b AS (SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi FROM lineitem),
      h AS (
        SELECT LEAST(CAST(FLOOR(((l_extendedprice - lo) / (hi - lo)) * 20) AS BIGINT), 19) AS bucket,
               count(*) AS n
        FROM lineitem, b GROUP BY 1)
      SELECT bucket, n,
             CAST(sum(n) OVER (ORDER BY bucket) AS BIGINT) AS cum_n,
             round((sum(n) OVER (ORDER BY bucket)) / (sum(n) OVER ()), 6) AS cdf
      FROM h ORDER BY bucket"""))

  /** Kendall tau-b over ALL events rows — the full distributed
    * inversion-count path (no subset cap); oracle is the O(n²) pair
    * join, tractable at the sf0.01 gate. */
  private val q46 = Entry(
    "q46_corr_kendall",
    (s, d) =>
      eventsKendallValueUser(s, d)
        .select(col("concordant"), col("discordant"), col("ties_x"),
          col("ties_y"), col("n_pairs"), r6(col("tau_b")).as("tau_b")),
    Some("""
      WITH s AS (
        SELECT event_id AS k, "value" AS x, CAST(user_id AS DOUBLE) AS y
        FROM events
        WHERE "value" IS NOT NULL AND user_id IS NOT NULL),
      pairs AS (
        SELECT (p.x - q.x) * (p.y - q.y) AS prod,
               CAST(p.x = q.x AS BIGINT) AS tx,
               CAST(p.y = q.y AS BIGINT) AS ty
        FROM s p JOIN s q ON p.k < q.k),
      a AS (
        SELECT CAST(sum(CASE WHEN prod > 0 THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
               CAST(sum(CASE WHEN prod < 0 THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
               CAST(sum(tx) AS BIGINT) AS ties_x,
               CAST(sum(ty) AS BIGINT) AS ties_y,
               count(*) AS n_pairs
        FROM pairs)
      SELECT concordant, discordant, ties_x, ties_y, n_pairs,
             round((concordant - discordant) /
                   sqrt((n_pairs - ties_x) * (n_pairs - ties_y)), 6) AS tau_b
      FROM a"""))

  // ------------------------------------------------------------------
  // Incremental / upsert semantics
  // ------------------------------------------------------------------

  /** Upsert-style latest-row-per-key dedup (CDC compaction semantics). */
  private val q19 = Entry(
    "q19_upsert_latest",
    (s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("ts").as("last_ts"), col("value").as("last_value"))
        .orderBy("user_id")
    },
    Some("""
      SELECT user_id, event_id AS last_event_id, ts AS last_ts, "value" AS last_value
      FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) t
      WHERE rn = 1
      ORDER BY user_id"""))

  // ------------------------------------------------------------------
  // Dedup family (training-data pipeline operators)
  // ------------------------------------------------------------------

  /** Exact dedup by full text equality. */
  private val q20 = Entry(
    "q20_dedup_exact",
    (s, d) =>
      graft.ops.Dedup.exact(Tables.documents(s, d), "text", "doc_id")
        .orderBy("keeper_id"),
    Some("""
      SELECT min(doc_id) AS keeper_id, count(*) AS n_copies
      FROM documents GROUP BY text ORDER BY keeper_id"""))

  /** MinHash + LSH near-dup candidate pairs (16 hashes, 4 bands × 4). */
  private val q21 = Entry(
    "q21_dedup_minhash_lsh",
    (s, d) =>
      graft.ops.Dedup.minhashLsh(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_a", "doc_b"),
    Some("""
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      sh AS (
        SELECT DISTINCT doc_id AS id,
               unnest(list_transform(range(1, len(w) - 1),
                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        FROM toks WHERE len(w) >= 3),
      hd AS (
        SELECT id, md5('0:' || s) AS h0, md5('1:' || s) AS h1,
                   md5('2:' || s) AS h2, md5('3:' || s) AS h3
        FROM sh),
      sig AS (
        SELECT id,
               min(substring(h0, 1, 8))  AS mh_0,  min(substring(h0, 9, 8))  AS mh_1,
               min(substring(h0, 17, 8)) AS mh_2,  min(substring(h0, 25, 8)) AS mh_3,
               min(substring(h1, 1, 8))  AS mh_4,  min(substring(h1, 9, 8))  AS mh_5,
               min(substring(h1, 17, 8)) AS mh_6,  min(substring(h1, 25, 8)) AS mh_7,
               min(substring(h2, 1, 8))  AS mh_8,  min(substring(h2, 9, 8))  AS mh_9,
               min(substring(h2, 17, 8)) AS mh_10, min(substring(h2, 25, 8)) AS mh_11,
               min(substring(h3, 1, 8))  AS mh_12, min(substring(h3, 9, 8))  AS mh_13,
               min(substring(h3, 17, 8)) AS mh_14, min(substring(h3, 25, 8)) AS mh_15
        FROM hd GROUP BY id),
      bands AS (
        SELECT id, 0 AS band, md5(mh_0 || mh_1 || mh_2 || mh_3) AS key FROM sig
        UNION ALL
        SELECT id, 1, md5(mh_4 || mh_5 || mh_6 || mh_7) FROM sig
        UNION ALL
        SELECT id, 2, md5(mh_8 || mh_9 || mh_10 || mh_11) FROM sig
        UNION ALL
        SELECT id, 3, md5(mh_12 || mh_13 || mh_14 || mh_15) FROM sig)
      SELECT DISTINCT a.id AS doc_a, b.id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.key = b.key AND a.id < b.id
      ORDER BY doc_a, doc_b"""))

  /** Signature-estimated Jaccard for the LSH candidates — no posting
    * lists; same md5 signature replay as q21 plus per-position match
    * counting. */
  private val q70 = Entry(
    "q70_minhash_est_jaccard",
    (s, d) =>
      graft.ops.Dedup
        .minhashEstimatedJaccard(Tables.documents(s, d), "doc_id", "text")
        .select(col("doc_a"), col("doc_b"),
          r6(col("est_jaccard")).as("est_jaccard"))
        .orderBy("doc_a", "doc_b"),
    Some("""
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      sh AS (
        SELECT DISTINCT doc_id AS id,
               unnest(list_transform(range(1, len(w) - 1),
                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        FROM toks WHERE len(w) >= 3),
      hd AS (
        SELECT id, md5('0:' || s) AS h0, md5('1:' || s) AS h1,
                   md5('2:' || s) AS h2, md5('3:' || s) AS h3
        FROM sh),
      sig AS (
        SELECT id,
               min(substring(h0, 1, 8))  AS mh_0,  min(substring(h0, 9, 8))  AS mh_1,
               min(substring(h0, 17, 8)) AS mh_2,  min(substring(h0, 25, 8)) AS mh_3,
               min(substring(h1, 1, 8))  AS mh_4,  min(substring(h1, 9, 8))  AS mh_5,
               min(substring(h1, 17, 8)) AS mh_6,  min(substring(h1, 25, 8)) AS mh_7,
               min(substring(h2, 1, 8))  AS mh_8,  min(substring(h2, 9, 8))  AS mh_9,
               min(substring(h2, 17, 8)) AS mh_10, min(substring(h2, 25, 8)) AS mh_11,
               min(substring(h3, 1, 8))  AS mh_12, min(substring(h3, 9, 8))  AS mh_13,
               min(substring(h3, 17, 8)) AS mh_14, min(substring(h3, 25, 8)) AS mh_15
        FROM hd GROUP BY id),
      bands AS (
        SELECT id, 0 AS band, md5(mh_0 || mh_1 || mh_2 || mh_3) AS key FROM sig
        UNION ALL
        SELECT id, 1, md5(mh_4 || mh_5 || mh_6 || mh_7) FROM sig
        UNION ALL
        SELECT id, 2, md5(mh_8 || mh_9 || mh_10 || mh_11) FROM sig
        UNION ALL
        SELECT id, 3, md5(mh_12 || mh_13 || mh_14 || mh_15) FROM sig),
      cand AS (
        SELECT DISTINCT a.id AS doc_a, b.id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.key = b.key AND a.id < b.id)
      SELECT doc_a, doc_b,
             round((
               (CASE WHEN x.mh_0 = y.mh_0 THEN 1 ELSE 0 END) + (CASE WHEN x.mh_1 = y.mh_1 THEN 1 ELSE 0 END) +
               (CASE WHEN x.mh_2 = y.mh_2 THEN 1 ELSE 0 END) + (CASE WHEN x.mh_3 = y.mh_3 THEN 1 ELSE 0 END) +
               (CASE WHEN x.mh_4 = y.mh_4 THEN 1 ELSE 0 END) + (CASE WHEN x.mh_5 = y.mh_5 THEN 1 ELSE 0 END) +
               (CASE WHEN x.mh_6 = y.mh_6 THEN 1 ELSE 0 END) + (CASE WHEN x.mh_7 = y.mh_7 THEN 1 ELSE 0 END) +
               (CASE WHEN x.mh_8 = y.mh_8 THEN 1 ELSE 0 END) + (CASE WHEN x.mh_9 = y.mh_9 THEN 1 ELSE 0 END) +
               (CASE WHEN x.mh_10 = y.mh_10 THEN 1 ELSE 0 END) + (CASE WHEN x.mh_11 = y.mh_11 THEN 1 ELSE 0 END) +
               (CASE WHEN x.mh_12 = y.mh_12 THEN 1 ELSE 0 END) + (CASE WHEN x.mh_13 = y.mh_13 THEN 1 ELSE 0 END) +
               (CASE WHEN x.mh_14 = y.mh_14 THEN 1 ELSE 0 END) + (CASE WHEN x.mh_15 = y.mh_15 THEN 1 ELSE 0 END)
             ) / 16.0, 6) AS est_jaccard
      FROM cand JOIN sig x ON doc_a = x.id JOIN sig y ON doc_b = y.id
      ORDER BY doc_a, doc_b"""))

  /** Exact trigram-Jaccard near-dup pairs at threshold 0.8. */
  private val q22 = Entry(
    "q22_dedup_ngram_jaccard",
    (s, d) =>
      docTrigramPairs(s, d)
        .select(col("doc_a"), col("doc_b"), r6(col("jaccard")).as("jaccard"))
        .orderBy("doc_a", "doc_b"),
    Some("""
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      sh AS (
        SELECT DISTINCT doc_id AS id,
               unnest(list_transform(range(1, len(w) - 1),
                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        FROM toks WHERE len(w) >= 3),
      keep AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 100),
      shk AS (SELECT sh.id, sh.s FROM sh JOIN keep USING (s)),
      sz AS (SELECT id, count(*) AS n_sh FROM shk GROUP BY 1),
      pairs AS (
        SELECT a.id AS doc_a, b.id AS doc_b, count(*) AS inter
        FROM shk a JOIN shk b ON a.s = b.s AND a.id < b.id
        GROUP BY 1, 2)
      SELECT doc_a, doc_b,
             round(inter / (x.n_sh + y.n_sh - inter), 6) AS jaccard
      FROM pairs JOIN sz x ON doc_a = x.id JOIN sz y ON doc_b = y.id
      WHERE inter / (x.n_sh + y.n_sh - inter) >= 0.8
      ORDER BY doc_a, doc_b"""))

  /** Duplicate clusters: trigram-Jaccard pairs → connected components
    * (min-label propagation) → every doc gets a cluster id and the min
    * doc per cluster is the representative. Oracle replays the closure
    * with a recursive CTE. */
  private val q34 = Entry(
    "q34_dedup_clusters",
    (s, d) => docTrigramClusters(s, d).orderBy("doc_id"),
    Some("""
      WITH RECURSIVE toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      sh AS (
        SELECT DISTINCT doc_id AS id,
               unnest(list_transform(range(1, len(w) - 1),
                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        FROM toks WHERE len(w) >= 3),
      keep AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 100),
      shk AS (SELECT sh.id, sh.s FROM sh JOIN keep USING (s)),
      sz AS (SELECT id, count(*) AS n_sh FROM shk GROUP BY 1),
      prs AS (
        SELECT a.id AS doc_a, b.id AS doc_b, count(*) AS inter
        FROM shk a JOIN shk b ON a.s = b.s AND a.id < b.id
        GROUP BY 1, 2),
      jac AS (
        SELECT doc_a, doc_b
        FROM prs JOIN sz x ON doc_a = x.id JOIN sz y ON doc_b = y.id
        WHERE inter / (x.n_sh + y.n_sh - inter) >= 0.8),
      sym AS (SELECT doc_a AS a, doc_b AS b FROM jac
              UNION SELECT doc_b, doc_a FROM jac),
      reach(a, b) AS (
        SELECT a, b FROM sym
        UNION
        SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
      comp AS (SELECT a AS id, least(a, min(b)) AS component
               FROM reach GROUP BY a)
      SELECT d.doc_id,
             COALESCE(c.component, d.doc_id) AS cluster,
             (COALESCE(c.component, d.doc_id) = d.doc_id) AS is_representative
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
      ORDER BY d.doc_id"""))

  /** Stratified (per-class) deterministic sampling: ~100 orders per
    * order status, engine-replayable hash threshold. */
  private val q35 = Entry(
    "q35_stratified_sample",
    (s, d) =>
      graft.ops.Sampling
        .stratifiedHashSample(
          Tables.orders(s, d)
            .select("o_orderkey", "o_orderstatus", "o_totalprice"),
          100, Seq("o_orderstatus"), Seq("o_orderkey"))
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey"),
    Some("""
      WITH t AS (SELECT o_orderstatus, count(*) AS tot FROM orders GROUP BY 1)
      SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice
      FROM orders o JOIN t USING (o_orderstatus)
      WHERE (('0x' || substring(md5(CAST(o.o_orderkey AS VARCHAR)), 1, 15))::BIGINT % 1048576) * tot
            < 100 * 1048576
      ORDER BY o.o_orderkey"""))

  /** Train/benchmark decontamination: trigram containment of benchmark
    * docs (doc_id < 250) inside training docs (doc_id >= 250). */
  private val q36 = Entry(
    "q36_decontamination",
    (s, d) => {
      val docs = Tables.documents(s, d)
      graft.ops.Dedup
        .ngramContainment(
          docs.where(col("doc_id") >= 250), "doc_id", "text",
          docs.where(col("doc_id") < 250), "doc_id", "text",
          n = 3, threshold = 0.5, maxPostings = 100)
        .select(col("train_id"), col("bench_id"),
          r6(col("containment")).as("containment"))
        .orderBy("train_id", "bench_id")
    },
    Some("""
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      sh AS (
        SELECT DISTINCT doc_id AS id,
               unnest(list_transform(range(1, len(w) - 1),
                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        FROM toks WHERE len(w) >= 3),
      trk AS (SELECT id, s FROM (
        SELECT id, s, count(*) OVER (PARTITION BY s) AS df
        FROM sh WHERE id >= 250) WHERE df <= 100),
      bek AS (SELECT id, s FROM (
        SELECT id, s, count(*) OVER (PARTITION BY s) AS df
        FROM sh WHERE id < 250) WHERE df <= 100),
      szb AS (SELECT id, count(*) AS nb FROM bek GROUP BY 1),
      it AS (
        SELECT t.id AS train_id, b.id AS bench_id, count(*) AS inter
        FROM trk t JOIN bek b ON t.s = b.s GROUP BY 1, 2)
      SELECT train_id, bench_id, round(inter / nb, 6) AS containment
      FROM it JOIN szb ON bench_id = szb.id
      WHERE inter / nb >= 0.5
      ORDER BY train_id, bench_id"""))

  /** Pattern redaction / scrubbing: stop-words replaced by a token,
    * match count from the original text. Same regex (RE2 ∩ Java subset)
    * in both engines; DuckDB needs the 'g' flag for global replace. */
  private val q37 = Entry(
    "q37_text_scrub",
    (s, d) =>
      graft.ops.TextAnalysis
        .redact(Tables.documents(s, d), "text",
          Seq("\\b(the|a)\\b" -> "<STOP>"))
        .select(col("doc_id"), col("redacted"), col("n_redactions"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
             regexp_replace(text, '\b(the|a)\b', '<STOP>', 'g') AS redacted,
             CAST(len(regexp_extract_all(text, '\b(the|a)\b')) AS BIGINT) AS n_redactions
      FROM documents ORDER BY doc_id"""))

  /** SimHash 16-bit fingerprints (md5-digit parity votes). */
  private val q23 = Entry(
    "q23_dedup_simhash",
    (s, d) =>
      graft.ops.Dedup.simhash(Tables.documents(s, d), "doc_id", "text")
        .select(col("id").as("doc_id"), col("simhash"))
        .orderBy("doc_id"),
    Some("""
      WITH toks AS (
        SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS s
        FROM documents),
      h AS (SELECT doc_id, md5(s) AS h FROM toks),
      v AS (
        SELECT doc_id,
               sum(2 * ((strpos('0123456789abcdef', substring(h, 1, 1)) - 1) % 2) - 1) AS v_1,
               sum(2 * ((strpos('0123456789abcdef', substring(h, 2, 1)) - 1) % 2) - 1) AS v_2,
               sum(2 * ((strpos('0123456789abcdef', substring(h, 3, 1)) - 1) % 2) - 1) AS v_3,
               sum(2 * ((strpos('0123456789abcdef', substring(h, 4, 1)) - 1) % 2) - 1) AS v_4,
               sum(2 * ((strpos('0123456789abcdef', substring(h, 5, 1)) - 1) % 2) - 1) AS v_5,
               sum(2 * ((strpos('0123456789abcdef', substring(h, 6, 1)) - 1) % 2) - 1) AS v_6,
               sum(2 * ((strpos('0123456789abcdef', substring(h, 7, 1)) - 1) % 2) - 1) AS v_7,
               sum(2 * ((strpos('0123456789abcdef', substring(h, 8, 1)) - 1) % 2) - 1) AS v_8,
               sum(2 * ((strpos('0123456789abcdef', substring(h, 9, 1)) - 1) % 2) - 1) AS v_9,
               sum(2 * ((strpos('0123456789abcdef', substring(h, 10, 1)) - 1) % 2) - 1) AS v_10,
               sum(2 * ((strpos('0123456789abcdef', substring(h, 11, 1)) - 1) % 2) - 1) AS v_11,
               sum(2 * ((strpos('0123456789abcdef', substring(h, 12, 1)) - 1) % 2) - 1) AS v_12,
               sum(2 * ((strpos('0123456789abcdef', substring(h, 13, 1)) - 1) % 2) - 1) AS v_13,
               sum(2 * ((strpos('0123456789abcdef', substring(h, 14, 1)) - 1) % 2) - 1) AS v_14,
               sum(2 * ((strpos('0123456789abcdef', substring(h, 15, 1)) - 1) % 2) - 1) AS v_15,
               sum(2 * ((strpos('0123456789abcdef', substring(h, 16, 1)) - 1) % 2) - 1) AS v_16
        FROM h GROUP BY doc_id)
      SELECT doc_id,
             (CASE WHEN v_1 >= 0 THEN '1' ELSE '0' END) ||
             (CASE WHEN v_2 >= 0 THEN '1' ELSE '0' END) ||
             (CASE WHEN v_3 >= 0 THEN '1' ELSE '0' END) ||
             (CASE WHEN v_4 >= 0 THEN '1' ELSE '0' END) ||
             (CASE WHEN v_5 >= 0 THEN '1' ELSE '0' END) ||
             (CASE WHEN v_6 >= 0 THEN '1' ELSE '0' END) ||
             (CASE WHEN v_7 >= 0 THEN '1' ELSE '0' END) ||
             (CASE WHEN v_8 >= 0 THEN '1' ELSE '0' END) ||
             (CASE WHEN v_9 >= 0 THEN '1' ELSE '0' END) ||
             (CASE WHEN v_10 >= 0 THEN '1' ELSE '0' END) ||
             (CASE WHEN v_11 >= 0 THEN '1' ELSE '0' END) ||
             (CASE WHEN v_12 >= 0 THEN '1' ELSE '0' END) ||
             (CASE WHEN v_13 >= 0 THEN '1' ELSE '0' END) ||
             (CASE WHEN v_14 >= 0 THEN '1' ELSE '0' END) ||
             (CASE WHEN v_15 >= 0 THEN '1' ELSE '0' END) ||
             (CASE WHEN v_16 >= 0 THEN '1' ELSE '0' END) AS simhash
      FROM v ORDER BY doc_id"""))

  /** Embedding-cosine near-dup pairs, blocked by label. */
  private val q24 = Entry(
    "q24_dedup_embedding",
    (s, d) =>
      graft.ops.Dedup
        .embeddingNearDup(Tables.embeddings(s, d), "vec_id", "embedding",
          "label", 0.45)
        .select(col("blk"), col("id_a"), col("id_b"), r6(col("cos")).as("cos"))
        .orderBy("id_a", "id_b"),
    Some("""
      WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
      SELECT a.label AS blk, a.vec_id AS id_a, b.vec_id AS id_b,
             round(list_dot_product(a.v, b.v) /
                   (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos
      FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE list_dot_product(a.v, b.v) /
            (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.45
      ORDER BY id_a, id_b"""))

  // ------------------------------------------------------------------
  // Similarity search
  // ------------------------------------------------------------------

  /** Brute-force exact cosine top-5 for 10 query vectors. */
  private val q25 = Entry(
    "q25_knn_bruteforce",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      graft.ops.Similarity
        .bruteForceKnn(emb, emb.where(col("vec_id") < 10), 5)
        .select(col("query_id"), col("rnk").cast("long").as("rnk"),
          col("nbr_id"), r6(col("cos")).as("cos"))
        .orderBy("query_id", "rnk")
    },
    Some("""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      q AS (SELECT * FROM e WHERE vec_id < 10),
      sc AS (
        SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
               list_dot_product(q.v, c.v) /
               (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
        FROM q JOIN e c ON q.vec_id <> c.vec_id),
      r AS (
        SELECT query_id, nbr_id, cos,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, nbr_id ASC) AS rnk
        FROM sc)
      SELECT query_id, rnk, nbr_id, round(cos, 6) AS cos
      FROM r WHERE rnk <= 5 ORDER BY query_id, rnk"""))

  /** LSH-bucketed ANN (scale path). The oracle replays the exact same
    * deterministic algorithm — hyperplane weights are generated by the
    * SAME `Similarity.planeWeights` call and inlined as SQL array
    * literals, so signatures, Hamming-1 multi-probe, and the re-rank
    * are engine-identical (not a recall approximation check). */
  private val q26 = Entry(
    "q26_knn_lsh",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      graft.ops.Similarity
        .lshKnn(emb, emb.where(col("vec_id") < 10), 5, planes = 4)
        .select(col("query_id"), col("rnk").cast("long").as("rnk"),
          col("nbr_id"), r6(col("cos")).as("cos"))
        .orderBy("query_id", "rnk")
    },
    Some {
      val w = (0 until 4).map(p =>
        graft.ops.Similarity.planeWeights(p, 64).mkString("[", ", ", "]"))
      s"""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      b AS (
        SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
               (CASE WHEN list_dot_product(v, ${w(0)}) >= 0 THEN '1' ELSE '0' END) ||
               (CASE WHEN list_dot_product(v, ${w(1)}) >= 0 THEN '1' ELSE '0' END) ||
               (CASE WHEN list_dot_product(v, ${w(2)}) >= 0 THEN '1' ELSE '0' END) ||
               (CASE WHEN list_dot_product(v, ${w(3)}) >= 0 THEN '1' ELSE '0' END) AS bkt
        FROM e),
      q AS (SELECT * FROM b WHERE vec_id < 10),
      probes AS (
        SELECT vec_id, v, nrm, unnest([bkt,
          (CASE WHEN substring(bkt,1,1)='1' THEN '0' ELSE '1' END) || substring(bkt,2,3),
          substring(bkt,1,1) || (CASE WHEN substring(bkt,2,1)='1' THEN '0' ELSE '1' END) || substring(bkt,3,2),
          substring(bkt,1,2) || (CASE WHEN substring(bkt,3,1)='1' THEN '0' ELSE '1' END) || substring(bkt,4,1),
          substring(bkt,1,3) || (CASE WHEN substring(bkt,4,1)='1' THEN '0' ELSE '1' END)]) AS bkt
        FROM q),
      sc AS (
        SELECT p.vec_id AS query_id, c.vec_id AS nbr_id,
               list_dot_product(p.v, c.v) / (p.nrm * c.nrm) AS cos
        FROM probes p JOIN b c ON p.bkt = c.bkt AND p.vec_id <> c.vec_id),
      r AS (SELECT query_id, nbr_id, cos,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, nbr_id ASC) AS rnk
            FROM sc)
      SELECT query_id, rnk, nbr_id, round(cos, 6) AS cos
      FROM r WHERE rnk <= 5 ORDER BY query_id, rnk"""
    })

  /** Corpus-vs-corpus self-ANN (every vector's top-3): shuffle bucket
    * join, nothing broadcast — the 100 TB self-join form. Oracle replays
    * the identical hyperplane signatures, Hamming-1 probes, and re-rank. */
  private val q69 = Entry(
    "q69_knn_self",
    (s, d) =>
      // maxBucket = 100 ACTIVE: hot buckets are thinned to a
      // deterministic ~100-candidate subset (md5 threshold, mirrored
      // bit-exactly in the oracle CTE `cc`); buckets ≤ 100 are untouched
      graft.ops.Similarity
        .lshSelfKnn(Tables.embeddings(s, d), 3, planes = 4, maxBucket = 100)
        .select(col("query_id"), col("rnk").cast("long").as("rnk"),
          col("nbr_id"), r6(col("cos")).as("cos"))
        .orderBy("query_id", "rnk"),
    Some {
      val w = (0 until 4).map(p =>
        graft.ops.Similarity.planeWeights(p, 64).mkString("[", ", ", "]"))
      s"""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      b AS (
        SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
               (CASE WHEN list_dot_product(v, ${w(0)}) >= 0 THEN '1' ELSE '0' END) ||
               (CASE WHEN list_dot_product(v, ${w(1)}) >= 0 THEN '1' ELSE '0' END) ||
               (CASE WHEN list_dot_product(v, ${w(2)}) >= 0 THEN '1' ELSE '0' END) ||
               (CASE WHEN list_dot_product(v, ${w(3)}) >= 0 THEN '1' ELSE '0' END) AS bkt
        FROM e),
      probes AS (
        SELECT vec_id, v, nrm, unnest([bkt,
          (CASE WHEN substring(bkt,1,1)='1' THEN '0' ELSE '1' END) || substring(bkt,2,3),
          substring(bkt,1,1) || (CASE WHEN substring(bkt,2,1)='1' THEN '0' ELSE '1' END) || substring(bkt,3,2),
          substring(bkt,1,2) || (CASE WHEN substring(bkt,3,1)='1' THEN '0' ELSE '1' END) || substring(bkt,4,1),
          substring(bkt,1,3) || (CASE WHEN substring(bkt,4,1)='1' THEN '0' ELSE '1' END)]) AS bkt
        FROM b),
      bc AS (SELECT bkt, count(*) AS bn FROM b GROUP BY bkt),
      cc AS (
        SELECT c.* FROM b c JOIN bc USING (bkt)
        WHERE (('0x' || substring(md5(c.bkt || '|' || CAST(c.vec_id AS VARCHAR)), 1, 15))::BIGINT
               % 1048576) * bn < 100 * 1048576),
      sc AS (
        SELECT p.vec_id AS query_id, c.vec_id AS nbr_id,
               list_dot_product(p.v, c.v) / (p.nrm * c.nrm) AS cos
        FROM probes p JOIN cc c ON p.bkt = c.bkt AND p.vec_id <> c.vec_id),
      r AS (SELECT query_id, nbr_id, cos,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, nbr_id ASC) AS rnk
            FROM sc)
      SELECT query_id, rnk, nbr_id, round(cos, 6) AS cos
      FROM r WHERE rnk <= 3 ORDER BY query_id, rnk"""
    })

  /** IVF ANN (k-means-cell scale path). Oracle-replayable variant: the
    * centroids are the deterministic `Similarity.pseudoCentroids` inlined
    * as SQL literals, so cell assignment (argmin L2, first-min tie-break),
    * nProbe probe ranking, and the cosine re-rank replay identically in
    * DuckDB. The data-dependent k-means path keeps its scalatest (fp
    * averaging isn't bit-reproducible across engines). */
  private val q32 = Entry(
    "q32_knn_ivf",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      graft.ops.Similarity
        .ivfKnnWith(emb, emb.where(col("vec_id") < 10), 5,
          graft.ops.Similarity.pseudoCentroids(8, 64), nProbe = 2)
        .select(col("query_id"), col("rnk").cast("long").as("rnk"),
          col("nbr_id"), r6(col("cos")).as("cos"))
        .orderBy("query_id", "rnk")
    },
    Some(ivfOracleSql))

  /** Shared by q32 (inline IVF) and q162 (persisted-index IVF): both
    * paths must produce byte-identical results over the same corpus
    * and pseudo-centroids. */
  private lazy val ivfOracleSql: String = {
      val cents = graft.ops.Similarity.pseudoCentroids(8, 64)
      val values = cents.zipWithIndex.map { case (cv, i) =>
        val cc = cv.map(x => x * x).sum
        s"($i, ${cv.mkString("[", ", ", "]")}::DOUBLE[], $cc)"
      }.mkString(",\n               ")
      s"""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      cent AS (SELECT * FROM (VALUES $values) AS t(cell, cv, cc)),
      ad AS (
        SELECT e.vec_id, cent.cell,
               list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, cent.cv) + cent.cc AS d
        FROM e, cent),
      asg AS (
        SELECT vec_id, cell FROM (
          SELECT vec_id, cell,
                 row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
          FROM ad) WHERE rn = 1),
      corp AS (
        SELECT e.vec_id, e.v, sqrt(list_dot_product(e.v, e.v)) AS nrm, asg.cell
        FROM e JOIN asg USING (vec_id)),
      probes AS (
        SELECT vec_id, cell FROM (
          SELECT vec_id, cell,
                 row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
          FROM ad WHERE vec_id < 10) WHERE rn <= 2),
      q AS (
        SELECT p.vec_id, e.v, sqrt(list_dot_product(e.v, e.v)) AS nrm, p.cell
        FROM probes p JOIN e ON e.vec_id = p.vec_id),
      sc AS (
        SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
               list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
        FROM q JOIN corp c ON q.cell = c.cell AND q.vec_id <> c.vec_id),
      r AS (SELECT query_id, nbr_id, cos,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, nbr_id ASC) AS rnk
            FROM sc)
      SELECT query_id, rnk, nbr_id, round(cos, 6) AS cos
      FROM r WHERE rnk <= 5 ORDER BY query_id, rnk"""
    }

  /** Deterministic hash-threshold sampling (the scale-safe replacement
    * for orderBy(rand).limit): both engines keep the row iff its md5
    * mod-2²⁰ value, scaled by the filtered row count, clears the target —
    * exact same subset, no global sort in either engine. */
  private val q33 = Entry(
    "q33_record_sample",
    (s, d) =>
      AnalysisPlanner
        .recordLookup(
          Tables.orders(s, d),
          RecordLookup(
            features = Seq("o_orderkey", "o_custkey", "o_totalprice"),
            filter = Some("o_totalprice > 100000"),
            sample = Some(200),
            sampleKeys = Seq("o_orderkey"),
            orderBy = Seq("o_orderkey"),
            limit = 150)),
    Some("""
      WITH f AS (
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders WHERE o_totalprice > 100000),
      t AS (SELECT count(*) AS tot FROM f)
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM f, t
      WHERE (('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT % 1048576) * tot
            < 200 * 1048576
      ORDER BY o_orderkey
      LIMIT 150"""))

  // ------------------------------------------------------------------
  // Text analysis
  // ------------------------------------------------------------------

  /** Per-document stats + composite quality score. */
  private val q27 = Entry(
    "q27_text_stats",
    (s, d) =>
      graft.ops.TextAnalysis.textStats(Tables.documents(s, d), "text")
        .select(col("doc_id"), col("n_words").cast("long").as("n_words"),
          col("n_distinct_words").cast("long").as("n_distinct_words"),
          col("quality_score"))
        .orderBy("doc_id"),
    Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      SELECT doc_id,
             len(w) AS n_words,
             len(list_distinct(w)) AS n_distinct_words,
             round(least(len(w) / 50.0, 1.0) * 0.5 +
                   (len(list_distinct(w)) / CAST(len(w) AS DOUBLE)) * 0.5, 6) AS quality_score
      FROM t ORDER BY doc_id"""))

  /** Heuristic language ID by marker-word hits. */
  private val q28 = Entry(
    "q28_text_langid",
    (s, d) =>
      graft.ops.TextAnalysis.langId(Tables.documents(s, d), "text")
        .select(col("doc_id"),
          col("hits_de").cast("long").as("hits_de"),
          col("hits_en").cast("long").as("hits_en"),
          col("hits_es").cast("long").as("hits_es"),
          col("hits_fr").cast("long").as("hits_fr"),
          col("predicted_lang"))
        .orderBy("doc_id"),
    Some("""
      WITH t AS (
        SELECT doc_id, list_distinct(string_split(text, ' ')) AS w FROM documents),
      h AS (
        SELECT doc_id,
               len(list_intersect(w, ['der','die','und','das','ist','nicht','ein','zu'])) AS hits_de,
               len(list_intersect(w, ['the','a','of','and','to','in','is','that'])) AS hits_en,
               len(list_intersect(w, ['el','la','de','que','y','en','un','los'])) AS hits_es,
               len(list_intersect(w, ['le','la','les','de','et','un','est','que'])) AS hits_fr
        FROM t)
      SELECT doc_id, hits_de, hits_en, hits_es, hits_fr,
             CASE WHEN greatest(hits_de, hits_en, hits_es, hits_fr) <= 0 THEN 'und'
                  WHEN hits_de = greatest(hits_de, hits_en, hits_es, hits_fr) THEN 'de'
                  WHEN hits_en = greatest(hits_de, hits_en, hits_es, hits_fr) THEN 'en'
                  WHEN hits_es = greatest(hits_de, hits_en, hits_es, hits_fr) THEN 'es'
                  ELSE 'fr' END AS predicted_lang
      FROM h ORDER BY doc_id"""))

  /** Token counting: whitespace + BPE-ish regex pre-tokenization. */
  private val q29 = Entry(
    "q29_text_tokens",
    (s, d) =>
      graft.ops.TextAnalysis.tokenCounts(Tables.documents(s, d), "text")
        .select(col("doc_id"), col("ws_tokens").cast("long").as("ws_tokens"),
          col("bpe_ish_tokens").cast("long").as("bpe_ish_tokens"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
             len(string_split(text, ' ')) AS ws_tokens,
             len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS bpe_ish_tokens
      FROM documents ORDER BY doc_id"""))

  /** Word-set fingerprint dedup (order/duplication-insensitive). */
  private val q30 = Entry(
    "q30_text_fingerprint",
    (s, d) =>
      graft.ops.TextAnalysis
        .fingerprintDedup(Tables.documents(s, d), "doc_id", "text")
        .orderBy("keeper_id"),
    Some("""
      SELECT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp,
             min(doc_id) AS keeper_id, count(*) AS n_copies
      FROM documents
      GROUP BY 1 ORDER BY keeper_id"""))

  // ------------------------------------------------------------------
  // Multimodal blob references
  // ------------------------------------------------------------------

  /** BlobReference construction: checksum/size/etag over payloads. */
  private val q31 = Entry(
    "q31_blob_refs",
    (s, d) =>
      Tables.documents(s, d)
        .withColumn("ref",
          graft.ops.Multimodal.blobRef(
            concat(lit("mem://docs/"), col("doc_id").cast("string")),
            lit("text/plain"), col("text")))
        .select(col("doc_id"), col("ref.uri").as("uri"),
          col("ref.content_type").as("content_type"),
          col("ref.checksum").as("checksum"),
          col("ref.etag").as("etag"),
          col("ref.size_bytes").as("size_bytes"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
             'mem://docs/' || CAST(doc_id AS VARCHAR) AS uri,
             'text/plain' AS content_type,
             sha256(text) AS checksum,
             md5(text) AS etag,
             CAST(length(text) AS BIGINT) AS size_bytes
      FROM documents ORDER BY doc_id"""))

  // ------------------------------------------------------------------
  // Cross-group joins (derived features across feature groups)
  // ------------------------------------------------------------------

  /** Cross-group equi-join on entity key; dim side broadcast. */
  private val q40 = Entry(
    "q40_join_enrich",
    (s, d) =>
      Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          count(lit(1)).as("n_orders"),
          r2(sum(col("o_totalprice"))).as("revenue"),
          r6(avg(col("o_totalprice"))).as("avg_order"))
        .orderBy("c_mktsegment"),
    Some("""
      SELECT c_mktsegment,
             count(*) AS n_orders,
             round(sum(o_totalprice), 2) AS revenue,
             round(avg(o_totalprice), 6) AS avg_order
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment"""))

  /** 5-way star join: fact shuffle-joined, dims broadcast. */
  private val q41 = Entry(
    "q41_region_revenue",
    (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(
          r2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name"),
    Some("""
      SELECT r_name,
             round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
             count(*) AS n_items
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY r_name
      ORDER BY r_name"""))

  /** Windowed top-k per group (partitioned window — no global sort). */
  private val q42 = Entry(
    "q42_topk_per_group",
    (s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w).cast("long"))
        .where(col("rn") <= 3)
        .select("o_orderpriority", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_orderpriority", "rn")
    },
    Some("""
      SELECT o_orderpriority, rn, o_orderkey, o_totalprice
      FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders) t
      WHERE rn <= 3
      ORDER BY o_orderpriority, rn"""))

  /** Date/time expression surface (DATE_TRUNC/DATE_PART/EXTRACT/±INTERVAL/
    * TO_CHAR analogs), aligned across engines. */
  private val q48 = Entry(
    "q48_datetime_functions",
    (s, d) =>
      Tables.events(s, d)
        .where(col("event_id") < 2000)
        .select(
          col("event_id"),
          to_date(col("ts")).as("day"),
          hour(col("ts")).cast("long").as("hr"),
          (dayofweek(col("ts")) - 1).cast("long").as("dow"),
          to_date(date_trunc("week", col("ts"))).as("week_start"),
          date_format(col("ts"), "yyyy-MM-dd HH").as("fmt"),
          datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
            .cast("long").as("days_since"),
          minute(col("ts") + expr("INTERVAL 90 MINUTES")).cast("long").as("min_plus90"))
        .orderBy("event_id"),
    Some("""
      SELECT event_id,
             CAST(ts AS DATE) AS day,
             date_part('hour', ts) AS hr,
             date_part('dow', ts) AS dow,
             date_trunc('week', CAST(ts AS DATE)) AS week_start,
             strftime(ts, '%Y-%m-%d %H') AS fmt,
             date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS days_since,
             date_part('minute', ts + INTERVAL 90 MINUTE) AS min_plus90
      FROM events
      WHERE event_id < 2000
      ORDER BY event_id"""))

  /** Window-function surface: LAG/LEAD/FIRST/LAST/NTH over keyed frames. */
  private val q49 = Entry(
    "q49_window_functions",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, d)
        .where(col("user_id") < 30)
        .select(
          col("event_id"), col("user_id"), col("value"),
          lag(col("value"), 1).over(w).as("prev_value"),
          lead(col("value"), 1).over(w).as("next_value"),
          first(col("value")).over(full).as("first_value"),
          last(col("value")).over(full).as("last_value"),
          nth_value(col("value"), 2).over(full).as("second_value"),
          dense_rank().over(Window.partitionBy("user_id")
            .orderBy(col("value").desc)).cast("long").as("value_rank"))
        .orderBy("event_id")
    },
    Some("""
      SELECT event_id, user_id, "value",
             lag("value", 1) OVER w AS prev_value,
             lead("value", 1) OVER w AS next_value,
             first_value("value") OVER wf AS first_value,
             last_value("value") OVER wf AS last_value,
             nth_value("value", 2) OVER wf AS second_value,
             CAST(dense_rank() OVER (PARTITION BY user_id ORDER BY "value" DESC) AS BIGINT) AS value_rank
      FROM events
      WHERE user_id < 30
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
             wf AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY event_id"""))

  /** STRING_AGG / ARRAY_AGG analogs + SPLIT_PART (deterministic order). */
  private val q50 = Entry(
    "q50_string_agg",
    (s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 10)
        .groupBy("o_orderpriority")
        .agg(
          array_join(array_sort(collect_list(col("o_orderkey").cast("string"))), ",")
            .as("top_keys"),
          count(lit(1)).as("n"))
        .withColumn("prio_num", split_part(col("o_orderpriority"), lit("-"), lit(1)))
        .withColumn("prio_name", split_part(col("o_orderpriority"), lit("-"), lit(2)))
        .orderBy("o_orderpriority")
    },
    Some("""
      WITH t AS (
        SELECT o_orderpriority, o_orderkey,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders)
      SELECT o_orderpriority,
             string_agg(CAST(o_orderkey AS VARCHAR), ','
                        ORDER BY CAST(o_orderkey AS VARCHAR)) AS top_keys,
             count(*) AS n,
             split_part(o_orderpriority, '-', 1) AS prio_num,
             split_part(o_orderpriority, '-', 2) AS prio_name
      FROM t WHERE rn <= 10
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""))

  /** Semi-structured JSON property extraction + typed aggregation. */
  private val q51 = Entry(
    "q51_json_extract",
    (s, d) =>
      Tables.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(
          count(col("k")).as("n"),
          r6(avg(col("k"))).as("avg_k"),
          max(col("k")).as("max_k"))
        .orderBy("event_type"),
    Some("""
      SELECT event_type,
             count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n,
             round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k,
             max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""))

  /** DataQuality outlier detection: |x − μ| > 3σ counts. */
  private val q52 = Entry(
    "q52_outliers",
    (s, d) =>
      AnalysisPlanner
        .outlierCounts(Tables.orders(s, d), Seq("o_totalprice"), 3.0)
        .select(col("outliers__o_totalprice").as("outliers_totalprice"), col("n")),
    Some("""
      WITH b AS (
        SELECT avg(o_totalprice) AS mu, stddev_pop(o_totalprice) AS sd
        FROM orders)
      SELECT count(CASE WHEN abs(o_totalprice - mu) > 3.0 * sd THEN 1 END) AS outliers_totalprice,
             count(*) AS n
      FROM orders, b"""))

  /** Gap-based sessionization (30m) + per-user session features — the
    * lag/cumulative-flag formulation, portable across engines and
    * shuffle-partitioned by user. */
  private val q53 = Entry(
    "q53_sessionize",
    (s, d) => {
      val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1L)
            .otherwise(0L))
        .withColumn("sess_id",
          sum(col("new_sess")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "sess_id")
        .agg(count(lit(1)).as("n_events"),
          (max(col("ts").cast("long")) - min(col("ts").cast("long")))
            .as("sess_seconds"),
          r2(sum(col("value"))).as("sess_value"))
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_sessions"),
          max(col("n_events")).as("max_session_events"),
          r6(avg(col("sess_seconds"))).as("avg_session_seconds"),
          r2(sum(col("sess_value"))).as("total_value"))
        .orderBy("user_id")
    },
    Some("""
      WITH e AS (
        SELECT user_id, event_id, ts, "value",
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events),
      f AS (
        SELECT *,
               CASE WHEN prev_ts IS NULL
                         OR date_diff('second', prev_ts, ts) > 1800
                    THEN 1 ELSE 0 END AS new_sess
        FROM e),
      g AS (
        SELECT *,
               CAST(sum(new_sess) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
        FROM f),
      s AS (
        SELECT user_id, sess_id, count(*) AS n_events,
               date_diff('second', min(ts), max(ts)) AS sess_seconds,
               sum("value") AS sess_value
        FROM g GROUP BY 1, 2)
      SELECT user_id,
             count(*) AS n_sessions,
             max(n_events) AS max_session_events,
             round(avg(sess_seconds), 6) AS avg_session_seconds,
             round(sum(sess_value), 2) AS total_value
      FROM s GROUP BY user_id ORDER BY user_id"""))

  /** Segmented histogram with a pre-filter (Distribution segment_by +
    * filter params; shared global bounds across segments). */
  private val q54 = Entry(
    "q54_histogram_segmented",
    (s, d) =>
      AnalysisPlanner
        .plan(Tables.events(s, d),
          Distribution("value", bins = 8, segmentBy = Some("event_type"),
            filter = Some("value > 10"), outputs = Seq("histogram")))
        .select(col("event_type"), col("bucket"), col("n"))
        .orderBy("event_type", "bucket"),
    Some("""
      WITH f AS (SELECT event_type, "value" AS v FROM events WHERE "value" > 10),
      b AS (SELECT min(v) AS lo, max(v) AS hi FROM f)
      SELECT event_type,
             LEAST(CAST(FLOOR(((v - lo) / (hi - lo)) * 8) AS BIGINT), 7) AS bucket,
             count(*) AS n
      FROM f, b
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  // ------------------------------------------------------------------
  // Point-in-time (as-of) joins — training-set generation
  // ------------------------------------------------------------------

  /** As-of join: each purchase event picks up the latest prior click
    * feature per user (inclusive at-or-before, no future leakage).
    * Spark side is the union-marker single-shuffle algorithm; the
    * oracle is DuckDB's native ASOF LEFT JOIN. */
  private val q55 = Entry(
    "q55_asof_join",
    (s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("value").as("purchase_value"))
      val clicks = ev.where(col("event_type") === "click")
        .groupBy("user_id", "ts")
        .agg(max(col("value")).as("last_click_value"))
      graft.ops.PointInTime
        .asofJoin(purchases, clicks, Seq("user_id"), "ts", "ts",
          Seq("last_click_value"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("feature_ts"), r2(col("purchase_value")).as("purchase_value"),
          r2(col("last_click_value")).as("last_click_value"))
        .orderBy("user_id", "event_id")
    },
    Some("""
      WITH p AS (
        SELECT event_id, user_id, ts, "value" AS purchase_value
        FROM events WHERE event_type = 'purchase'),
      c AS (
        SELECT user_id, ts, max("value") AS last_click_value
        FROM events WHERE event_type = 'click' GROUP BY 1, 2)
      SELECT p.event_id, p.user_id, p.ts, c.ts AS feature_ts,
             round(p.purchase_value, 2) AS purchase_value,
             round(c.last_click_value, 2) AS last_click_value
      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
      ORDER BY p.user_id, p.event_id"""))

  /** Skew-aware two-phase salted aggregation — results are identical to
    * a direct GROUP BY by construction, so the oracle is the plain SQL
    * aggregate (verifying the salt/merge algebra end-to-end). */
  private val q38 = Entry(
    "q38_skew_agg",
    (s, d) =>
      graft.ops.SkewAware
        .groupAgg(Tables.events(s, d), Seq("event_type"), salt = 8,
          Seq(("cnt", "count", "value"), ("sum_v", "sum", "value"),
            ("avg_v", "avg", "value"), ("min_v", "min", "value"),
            ("max_v", "max", "value")))
        .select(col("event_type"), col("cnt"),
          r2(col("sum_v")).as("sum_v"), r6(col("avg_v")).as("avg_v"),
          col("min_v").as("min_v"), col("max_v").as("max_v"))
        .orderBy("event_type"),
    Some("""
      SELECT event_type,
             count("value") AS cnt,
             round(sum("value"), 2) AS sum_v,
             round(avg("value"), 6) AS avg_v,
             min("value") AS min_v,
             max("value") AS max_v
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Hot-entity SALTED as-of join — same DuckDB ASOF oracle as q55: the
    * salt spreads hot users over sub-partitions and replicates only
    * their right-side history, leaving results identical. */
  private val q39 = Entry(
    "q39_asof_salted",
    (s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("value").as("purchase_value"))
      val clicks = ev.where(col("event_type") === "click")
        .groupBy("user_id", "ts")
        .agg(max(col("value")).as("last_click_value"))
      graft.ops.PointInTime
        .asofJoin(purchases, clicks, Seq("user_id"), "ts", "ts",
          Seq("last_click_value"), salt = 4, hotThreshold = 10L)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("feature_ts"), r2(col("purchase_value")).as("purchase_value"),
          r2(col("last_click_value")).as("last_click_value"))
        .orderBy("user_id", "event_id")
    },
    Some("""
      WITH p AS (
        SELECT event_id, user_id, ts, "value" AS purchase_value
        FROM events WHERE event_type = 'purchase'),
      c AS (
        SELECT user_id, ts, max("value") AS last_click_value
        FROM events WHERE event_type = 'click' GROUP BY 1, 2)
      SELECT p.event_id, p.user_id, p.ts, c.ts AS feature_ts,
             round(p.purchase_value, 2) AS purchase_value,
             round(c.last_click_value, 2) AS last_click_value
      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
      ORDER BY p.user_id, p.event_id"""))

  // ------------------------------------------------------------------
  // Multi-level aggregation, set ops, feature prep, time series, text
  // ------------------------------------------------------------------

  /** ROLLUP over (returnflag, linestatus) with grouping id — Spark's
    * rollup/grouping_id bit encoding matches DuckDB's GROUPING(). */
  private val q56 = Entry(
    "q56_rollup_revenue",
    (s, d) =>
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n"),
          r2(sum(col("l_quantity"))).as("sum_qty"),
          r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("revenue"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first),
    Some("""
      SELECT l_returnflag, l_linestatus,
             GROUPING(l_returnflag, l_linestatus) AS gid,
             count(*) AS n,
             round(sum(l_quantity), 2) AS sum_qty,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM lineitem
      GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""))

  /** Set operations as an API surface: INTERSECT / EXCEPT / UNION over
    * per-segment entity sets (distinct-user audiences). */
  private val q57 = Entry(
    "q57_set_ops",
    (s, d) => {
      val ev = Tables.events(s, d)
      def users(t: String) =
        ev.where(col("event_type") === t).select("user_id").distinct()
      val p = users("purchase")
      val c = users("click")
      def tagged(df: DataFrame, tag: String) =
        df.agg(count(lit(1)).as("n_users")).withColumn("tag", lit(tag))
      tagged(p.intersect(c), "both")
        .unionByName(tagged(p.union(c).distinct(), "either"))
        .unionByName(tagged(p.except(c), "purchase_only"))
        .select("tag", "n_users")
        .orderBy("tag")
    },
    Some("""
      SELECT 'both' AS tag, count(*) AS n_users FROM (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
        INTERSECT
        SELECT DISTINCT user_id FROM events WHERE event_type = 'click') t
      UNION ALL
      SELECT 'either', count(*) FROM (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
        UNION
        SELECT DISTINCT user_id FROM events WHERE event_type = 'click') t
      UNION ALL
      SELECT 'purchase_only', count(*) FROM (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
        EXCEPT
        SELECT DISTINCT user_id FROM events WHERE event_type = 'click') t
      ORDER BY tag"""))

  /** Feature scaling + equal-width discretization from one broadcast
    * stats row (z-score, min-max, bin). */
  private val q58 = Entry(
    "q58_feature_scaling",
    (s, d) =>
      graft.ops.Features.scaleColumn(
        Tables.lineitem(s, d).where(col("l_orderkey") < 1000)
          .select("l_orderkey", "l_linenumber", "l_extendedprice"),
        "l_extendedprice", 10)
        .select(col("l_orderkey"), col("l_linenumber"),
          r6(col("z_score")).as("z_score"),
          r6(col("min_max")).as("min_max"), col("bin"))
        .orderBy("l_orderkey", "l_linenumber"),
    Some("""
      WITH f AS (
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem WHERE l_orderkey < 1000),
      s AS (
        SELECT avg(l_extendedprice) AS mu, stddev_samp(l_extendedprice) AS sd,
               min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
        FROM f)
      SELECT l_orderkey, l_linenumber,
             round((l_extendedprice - mu) / sd, 6) AS z_score,
             round((l_extendedprice - lo) / (hi - lo), 6) AS min_max,
             LEAST(CAST(FLOOR(((l_extendedprice - lo) / (hi - lo)) * 10) AS BIGINT), 9) AS bin
      FROM f, s ORDER BY l_orderkey, l_linenumber"""))

  /** Calendar gap-fill: daily counts/sums on a generated date spine,
    * missing days as zeros. */
  private val q59 = Entry(
    "q59_gap_fill_daily",
    (s, d) =>
      graft.ops.TimeSeries.gapFillDaily(Tables.events(s, d), "ts", "value")
        .select(col("day"), col("n_events"), r2(col("day_value")).as("day_value"))
        .orderBy("day"),
    Some("""
      WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, count(*) AS n_events,
               sum("value") AS day_value
        FROM events GROUP BY 1),
      b AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
      spine AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
        FROM b)
      SELECT s.day, coalesce(d.n_events, 0) AS n_events,
             round(coalesce(d.day_value, 0.0), 2) AS day_value
      FROM spine s LEFT JOIN daily d ON s.day = d.day
      ORDER BY s.day"""))

  /** Exact top-k frequent items (heavy hitters); map-side partial
    * aggregation makes the wide groupBy cheap, TakeOrdered the top-k. */
  private val q60 = Entry(
    "q60_topk_frequent_terms",
    (s, d) =>
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word").asc)
        .limit(10),
    Some("""
      SELECT word, count(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
      GROUP BY word ORDER BY n DESC, word LIMIT 10"""))

  /** TF-IDF: highest-scoring term per document. */
  private val q61 = Entry(
    "q61_tfidf_top_term",
    (s, d) => {
      val scored = graft.ops.TextAnalysis
        .tfIdf(Tables.documents(s, d), "doc_id", "text")
      val w = Window.partitionBy("id")
        .orderBy(col("tfidf").desc, col("term").asc)
      scored.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("id").as("doc_id"), col("term").as("top_term"),
          r6(col("tfidf")).as("tfidf"))
        .orderBy("doc_id")
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      tc AS (SELECT doc_id, term, count(*) AS cnt FROM toks GROUP BY 1, 2),
      dl AS (SELECT doc_id, sum(cnt) AS doc_len FROM tc GROUP BY 1),
      dfr AS (SELECT term, count(*) AS doc_freq FROM tc GROUP BY 1),
      n AS (SELECT count(*) AS n_docs FROM documents),
      sc AS (
        SELECT tc.doc_id, tc.term,
               (cnt / doc_len) * ln(n_docs / doc_freq) AS tfidf
        FROM tc JOIN dl USING (doc_id) JOIN dfr USING (term), n),
      r AS (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY tfidf DESC, term) AS rn
        FROM sc)
      SELECT doc_id, term AS top_term, round(tfidf, 6) AS tfidf
      FROM r WHERE rn = 1 ORDER BY doc_id"""))

  /** Quantile (equal-frequency) bucketing of l_extendedprice into
    * quartiles: per-bucket count/min/max. Boundaries = exact
    * interpolated quantiles (distributed path) ≡ quantile_cont. */
  private val q63 = Entry(
    "q63_quantile_bucket",
    (s, d) =>
      graft.ops.Features
        .quantileBucket(Tables.lineitem(s, d), "l_extendedprice", 4)
        .groupBy("q_bucket")
        .agg(count(lit(1)).as("n"),
          r2(min(col("l_extendedprice"))).as("min_v"),
          r2(max(col("l_extendedprice"))).as("max_v"))
        .orderBy("q_bucket"),
    Some("""
      WITH b AS (
        SELECT quantile_cont(l_extendedprice, 0.25) AS q1,
               quantile_cont(l_extendedprice, 0.50) AS q2,
               quantile_cont(l_extendedprice, 0.75) AS q3
        FROM lineitem)
      SELECT (CASE WHEN l_extendedprice > q1 THEN 1 ELSE 0 END +
              CASE WHEN l_extendedprice > q2 THEN 1 ELSE 0 END +
              CASE WHEN l_extendedprice > q3 THEN 1 ELSE 0 END + 1) AS q_bucket,
             count(*) AS n,
             round(min(l_extendedprice), 2) AS min_v,
             round(max(l_extendedprice), 2) AS max_v
      FROM lineitem, b
      GROUP BY 1 ORDER BY 1"""))

  /** Corpus mixing: src0 upsampled 2.5 epochs, src1 downsampled to 40%,
    * everything else untouched — per-copy rows with identical md5
    * fractional-epoch coins in both engines. */
  private val q66 = Entry(
    "q66_weighted_mix",
    (s, d) =>
      graft.ops.Sampling
        .weightedMix(Tables.documents(s, d), "source",
          Map("src0" -> 2.5, "src1" -> 0.4), Seq("doc_id"))
        .select(col("doc_id"), col("source"), col("mix_copy"))
        .orderBy("doc_id", "mix_copy"),
    Some("""
      WITH r AS (
        SELECT doc_id, source,
               CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 0.4
                    ELSE 1.0 END AS rate,
               (('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                 % 1048576) AS h
        FROM documents),
      c AS (
        SELECT doc_id, source,
               CAST(floor(rate) AS BIGINT) +
               (CASE WHEN h < (rate - floor(rate)) * 1048576 THEN 1 ELSE 0 END)
                 AS copies
        FROM r)
      SELECT doc_id, source, u.cp AS mix_copy
      FROM c, unnest(range(1, copies + 1)) AS u(cp)
      ORDER BY doc_id, mix_copy"""))

  /** Robust (median/MAD) scaling on events.value — identical nested
    * quantile_cont formula in both engines. */
  private val q67 = Entry(
    "q67_robust_scale",
    (s, d) =>
      graft.ops.Features
        .robustScale(Tables.events(s, d), "value")
        .agg(count(lit(1)).as("n"),
          r6(min(col("robust_z"))).as("min_z"),
          r6(max(col("robust_z"))).as("max_z"),
          r6(avg(col("robust_z"))).as("avg_z")),
    Some("""
      WITH m AS (SELECT quantile_cont("value", 0.5) AS med FROM events),
      md AS (
        SELECT quantile_cont(abs("value" - med), 0.5) AS mad
        FROM events, m)
      SELECT count(*) AS n,
             round(min(("value" - med) / (1.4826 * mad)), 6) AS min_z,
             round(max(("value" - med) / (1.4826 * mad)), 6) AS max_z,
             round(avg(("value" - med) / (1.4826 * mad)), 6) AS avg_z
      FROM events, m, md"""))

  /** Winsorization at [p05, p95]: clipped-column stats prove the clamp
    * (min/max equal the exact interpolated bounds). */
  private val q65 = Entry(
    "q65_winsorize",
    (s, d) =>
      graft.ops.Features
        .winsorize(Tables.lineitem(s, d), "l_extendedprice", 0.05, 0.95)
        .agg(count(lit(1)).as("n"),
          r2(min(col("v_wins"))).as("min_w"),
          r2(max(col("v_wins"))).as("max_w"),
          r6(avg(col("v_wins"))).as("avg_w")),
    Some("""
      WITH b AS (
        SELECT quantile_cont(l_extendedprice, 0.05) AS lo,
               quantile_cont(l_extendedprice, 0.95) AS hi
        FROM lineitem)
      SELECT count(*) AS n,
             round(min(greatest(lo, least(hi, l_extendedprice))), 2) AS min_w,
             round(max(greatest(lo, least(hi, l_extendedprice))), 2) AS max_w,
             round(avg(greatest(lo, least(hi, l_extendedprice))), 6) AS avg_w
      FROM lineitem, b"""))

  /** Forward fill (LOCF) over the same deterministic NULL injection as
    * q64 — leading NULLs stay NULL. */
  private val q68 = Entry(
    "q68_forward_fill",
    (s, d) => {
      val base = Tables.events(s, d)
        .groupBy("user_id", "ts").agg(avg(col("value")).as("v"))
        .withColumn("v",
          when(pmod(conv(substring(md5(
            concat(col("user_id").cast("string"), lit("|"),
              unix_micros(col("ts")).cast("string"))), 1, 15), 16, 10)
            .cast("long"), lit(3L)) === 0, lit(null).cast("double"))
            .otherwise(col("v")))
      graft.ops.TimeSeries
        .forwardFill(base, Seq("user_id"), "ts", "v")
        .select(col("user_id"), col("ts"),
          r6(col("v")).as("v"), r6(col("v_ffill")).as("v_ffill"))
        .orderBy("user_id", "ts")
    },
    Some("""
      WITH base AS (
        SELECT user_id, ts,
               CASE WHEN (('0x' || substring(md5(CAST(user_id AS VARCHAR) || '|' ||
                            CAST(epoch_us(ts) AS VARCHAR)), 1, 15))::BIGINT % 3) = 0
                    THEN NULL ELSE avg("value") END AS v
        FROM events GROUP BY user_id, ts)
      SELECT user_id, ts, round(v, 6) AS v,
             round(last_value(v IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS v_ffill
      FROM base ORDER BY user_id, ts"""))

  /** Per-entity linear interpolation: values NULLed on a deterministic
    * md5 predicate are reconstructed from their temporal neighbors;
    * boundary NULLs stay NULL. Both engines run the same prev/next
    * IGNORE-NULLS windows and line formula on epoch-micros. */
  private val q64 = Entry(
    "q64_interpolate",
    (s, d) => {
      val base = Tables.events(s, d)
        .groupBy("user_id", "ts").agg(avg(col("value")).as("v"))
        .withColumn("v",
          when(pmod(conv(substring(md5(
            concat(col("user_id").cast("string"), lit("|"),
              unix_micros(col("ts")).cast("string"))), 1, 15), 16, 10)
            .cast("long"), lit(3L)) === 0, lit(null).cast("double"))
            .otherwise(col("v")))
      graft.ops.TimeSeries
        .interpolateLinear(base, Seq("user_id"), "ts", "v")
        .select(col("user_id"), col("ts"),
          r6(col("v")).as("v"), r6(col("v_interp")).as("v_interp"))
        .orderBy("user_id", "ts")
    },
    Some("""
      WITH base AS (
        SELECT user_id, ts,
               CASE WHEN (('0x' || substring(md5(CAST(user_id AS VARCHAR) || '|' ||
                            CAST(epoch_us(ts) AS VARCHAR)), 1, 15))::BIGINT % 3) = 0
                    THEN NULL ELSE avg("value") END AS v
        FROM events GROUP BY user_id, ts),
      w AS (
        SELECT user_id, ts, v,
               last_value(v IGNORE NULLS) OVER
                 (PARTITION BY user_id ORDER BY ts
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
               last_value(CASE WHEN v IS NOT NULL THEN epoch_us(ts) END IGNORE NULLS) OVER
                 (PARTITION BY user_id ORDER BY ts
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pt,
               first_value(v IGNORE NULLS) OVER
                 (PARTITION BY user_id ORDER BY ts
                  ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
               first_value(CASE WHEN v IS NOT NULL THEN epoch_us(ts) END IGNORE NULLS) OVER
                 (PARTITION BY user_id ORDER BY ts
                  ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt
        FROM base)
      SELECT user_id, ts, round(v, 6) AS v,
             round(CASE WHEN v IS NOT NULL THEN v
                        WHEN pv IS NOT NULL AND nv IS NOT NULL AND nt = pt
                          THEN (pv + nv) / 2.0
                        WHEN pv IS NOT NULL AND nv IS NOT NULL
                          THEN pv + (nv - pv) * (epoch_us(ts) - pt) / (nt - pt)
                   END, 6) AS v_interp
      FROM w ORDER BY user_id, ts"""))

  /** Context-window chunking: 20-token chunks with 5-token overlap,
    * final chunk keeps the overhang. */
  private val q62 = Entry(
    "q62_text_chunk",
    (s, d) =>
      graft.ops.TextAnalysis
        .chunk(Tables.documents(s, d), "doc_id", "text", 20, 5)
        .select(col("doc_id"), col("chunk_id"), col("chunk_text"),
          col("n_tokens"))
        .orderBy("doc_id", "chunk_id"),
    Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      c AS (
        SELECT doc_id, w, len(w) AS n,
               CASE WHEN len(w) <= 20 THEN 1
                    ELSE CAST(ceil((len(w) - 20) / 15.0) AS BIGINT) + 1
               END AS nc
        FROM t)
      SELECT doc_id, i AS chunk_id,
             array_to_string(w[i * 15 + 1 : i * 15 + 20], ' ') AS chunk_text,
             CAST(len(w[i * 15 + 1 : i * 15 + 20]) AS BIGINT) AS n_tokens
      FROM c, unnest(range(0, nc)) AS u(i)
      ORDER BY doc_id, chunk_id"""))

  /** Gopher-style repetition filters: type-token ratio, top-bigram and
    * duplicate-bigram occupancy per document — the "drop looping /
    * boilerplate text" signals of corpus cleaning. */
  private val q71 = Entry(
    "q71_repetition_stats",
    (s, d) =>
      graft.ops.TextAnalysis
        .repetitionStats(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id"),
    Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      uni AS (SELECT doc_id, unnest(w) AS s FROM t WHERE len(w) >= 1),
      ua AS (
        SELECT doc_id, count(*) AS n_words, count(DISTINCT s) AS dw
        FROM uni GROUP BY doc_id),
      bg AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(w)),
                      i -> w[i] || ' ' || w[i+1])) AS g
        FROM t WHERE len(w) >= 2),
      bc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
      ba AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS bt,
               CAST(max(c) AS BIGINT) AS bm,
               CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS bd
        FROM bc GROUP BY doc_id)
      SELECT ua.doc_id, n_words,
             round(dw / n_words::DOUBLE, 6) AS distinct_word_ratio,
             round(bm / bt::DOUBLE, 6) AS top_bigram_frac,
             round(bd / bt::DOUBLE, 6) AS dup_bigram_frac
      FROM ua LEFT JOIN ba USING (doc_id) ORDER BY doc_id"""))

  /** Symmetric int8 embedding quantization: per-vector scale, an md5
    * checksum over the exact code sequence (arrays stay out of the
    * compared output; the checksum still pins every code), and the
    * order-independent max reconstruction error. */
  private val q72 = Entry(
    "q72_embedding_quantize",
    (s, d) =>
      graft.ops.Features
        .quantizeEmbedding(Tables.embeddings(s, d), "vec_id", "embedding")
        .select(col("vec_id"), r6(col("scale")).as("scale"),
          md5(concat_ws(",",
            transform(col("codes"), c => c.cast("string")))).as("codes_md5"),
          r6(col("max_abs_err")).as("max_abs_err"))
        .orderBy("vec_id"),
    Some("""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      s AS (
        SELECT vec_id, v,
               list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
        FROM e),
      q AS (
        SELECT vec_id, v, scale,
               list_transform(v, x ->
                 CAST(CASE WHEN scale = 0 THEN 0.0
                      ELSE greatest(-127.0, least(127.0, round(x / scale)))
                      END AS INTEGER)) AS codes
        FROM s)
      SELECT vec_id, round(scale, 6) AS scale,
             md5(array_to_string(codes, ',')) AS codes_md5,
             round(list_max(list_transform(range(1, len(v) + 1),
                   i -> abs(v[i] - codes[i] * scale))), 6) AS max_abs_err
      FROM q ORDER BY vec_id"""))

  /** Quantized IVF ANN: int8-code integer-dot candidate scoring, exact
    * cosine re-rank of the top-16 — the quantize-score-rerank pipeline
    * replayed end-to-end in DuckDB (integer dots are exact, so the
    * approximate ranking is engine-identical). */
  private val q73 = Entry(
    "q73_knn_ivf_quantized",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      graft.ops.Similarity
        .ivfKnnQuantizedWith(emb, emb.where(col("vec_id") < 10), 5,
          graft.ops.Similarity.pseudoCentroids(8, 64), nProbe = 2,
          rerank = 16)
        .select(col("query_id"), col("rnk").cast("long").as("rnk"),
          col("nbr_id"), r6(col("cos")).as("cos"),
          r6(col("approx_cos")).as("approx_cos"))
        .orderBy("query_id", "rnk")
    },
    Some {
      val cents = graft.ops.Similarity.pseudoCentroids(8, 64)
      val values = cents.zipWithIndex.map { case (cv, i) =>
        val cc = cv.map(x => x * x).sum
        s"($i, ${cv.mkString("[", ", ", "]")}::DOUBLE[], $cc)"
      }.mkString(",\n               ")
      s"""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      cent AS (SELECT * FROM (VALUES $values) AS t(cell, cv, cc)),
      ad AS (
        SELECT e.vec_id, cent.cell,
               list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, cent.cv) + cent.cc AS d
        FROM e, cent),
      asg AS (
        SELECT vec_id, cell FROM (
          SELECT vec_id, cell,
                 row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
          FROM ad) WHERE rn = 1),
      qz AS (
        SELECT vec_id, list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
        FROM e),
      codes AS (
        SELECT e.vec_id, qz.scale,
               list_transform(e.v, x ->
                 CAST(CASE WHEN qz.scale = 0 THEN 0.0
                      ELSE greatest(-127.0, least(127.0, round(x / qz.scale)))
                      END AS INTEGER)) AS codes
        FROM e JOIN qz USING (vec_id)),
      corp AS (
        SELECT e.vec_id, e.v, sqrt(list_dot_product(e.v, e.v)) AS nrm,
               asg.cell, k.codes, k.scale
        FROM e JOIN asg USING (vec_id) JOIN codes k USING (vec_id)),
      probes AS (
        SELECT vec_id, cell FROM (
          SELECT vec_id, cell,
                 row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
          FROM ad WHERE vec_id < 10) WHERE rn <= 2),
      q AS (
        SELECT p.vec_id, e.v, sqrt(list_dot_product(e.v, e.v)) AS nrm,
               p.cell, k.codes, k.scale
        FROM probes p JOIN e ON e.vec_id = p.vec_id
                      JOIN codes k ON k.vec_id = p.vec_id),
      sc AS (
        SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
               q.v AS qv, c.v AS cv, q.nrm AS qn, c.nrm AS cn,
               CAST(list_sum(list_transform(range(1, len(q.codes) + 1),
                 i -> CAST(q.codes[i] AS BIGINT) * CAST(c.codes[i] AS BIGINT)))
                 AS BIGINT) AS idot,
               q.scale AS qs, c.scale AS cs
        FROM q JOIN corp c ON q.cell = c.cell AND q.vec_id <> c.vec_id),
      a1 AS (
        SELECT *, CAST(idot AS DOUBLE) * qs * cs / (qn * cn) AS approx_cos
        FROM sc),
      r1 AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY approx_cos DESC, nbr_id ASC) AS arnk
        FROM a1),
      r2 AS (
        SELECT query_id, nbr_id, approx_cos,
               list_dot_product(qv, cv) / (qn * cn) AS cos
        FROM r1 WHERE arnk <= 16),
      r AS (
        SELECT query_id, nbr_id, cos, approx_cos,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, nbr_id ASC) AS rnk
        FROM r2)
      SELECT query_id, rnk, nbr_id, round(cos, 6) AS cos,
             round(approx_cos, 6) AS approx_cos
      FROM r WHERE rnk <= 5 ORDER BY query_id, rnk"""
    })

  /** Incremental near-dup at ingestion time: docs 450+ play the NEW
    * batch, the rest the existing corpus signature store — band-keyed
    * join, O(batch) per increment, no corpus rescan. */
  private val q74 = Entry(
    "q74_dedup_incremental",
    (s, d) => {
      val docs = Tables.documents(s, d)
      graft.ops.Dedup
        .incrementalNearDup(docs.where(col("doc_id") >= 450),
          docs.where(col("doc_id") < 450), "doc_id", "text")
        .orderBy("new_id", "corpus_id")
    },
    Some("""
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      sh AS (
        SELECT DISTINCT doc_id AS id,
               unnest(list_transform(range(1, len(w) - 1),
                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        FROM toks WHERE len(w) >= 3),
      hd AS (
        SELECT id, md5('0:' || s) AS h0, md5('1:' || s) AS h1,
                   md5('2:' || s) AS h2, md5('3:' || s) AS h3
        FROM sh),
      sig AS (
        SELECT id,
               min(substring(h0, 1, 8))  AS mh_0,  min(substring(h0, 9, 8))  AS mh_1,
               min(substring(h0, 17, 8)) AS mh_2,  min(substring(h0, 25, 8)) AS mh_3,
               min(substring(h1, 1, 8))  AS mh_4,  min(substring(h1, 9, 8))  AS mh_5,
               min(substring(h1, 17, 8)) AS mh_6,  min(substring(h1, 25, 8)) AS mh_7,
               min(substring(h2, 1, 8))  AS mh_8,  min(substring(h2, 9, 8))  AS mh_9,
               min(substring(h2, 17, 8)) AS mh_10, min(substring(h2, 25, 8)) AS mh_11,
               min(substring(h3, 1, 8))  AS mh_12, min(substring(h3, 9, 8))  AS mh_13,
               min(substring(h3, 17, 8)) AS mh_14, min(substring(h3, 25, 8)) AS mh_15
        FROM hd GROUP BY id),
      bands AS (
        SELECT id, 0 AS band, md5(mh_0 || mh_1 || mh_2 || mh_3) AS key FROM sig
        UNION ALL
        SELECT id, 1, md5(mh_4 || mh_5 || mh_6 || mh_7) FROM sig
        UNION ALL
        SELECT id, 2, md5(mh_8 || mh_9 || mh_10 || mh_11) FROM sig
        UNION ALL
        SELECT id, 3, md5(mh_12 || mh_13 || mh_14 || mh_15) FROM sig)
      SELECT DISTINCT a.id AS new_id, b.id AS corpus_id
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.key = b.key AND a.id <> b.id
      WHERE a.id >= 450 AND b.id < 450
      ORDER BY new_id, corpus_id"""))

  /** C4-style repeated-passage removal: 3-word chunks occurring in >= 3
    * documents are boilerplate and get dropped; docs are reassembled
    * from the surviving chunks. */
  private val q75 = Entry(
    "q75_chunk_dedup",
    (s, d) =>
      graft.ops.Dedup
        .chunkDedup(Tables.documents(s, d), "doc_id", "text",
          chunkTokens = 3, maxDocs = 3)
        .orderBy("doc_id"),
    Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      c AS (
        SELECT doc_id, w,
               CASE WHEN len(w) <= 3 THEN 1
                    ELSE CAST(ceil((len(w) - 3) / 3.0) AS BIGINT) + 1
               END AS nc
        FROM t),
      ch AS (
        SELECT doc_id, i AS chunk_id,
               array_to_string(w[i * 3 + 1 : i * 3 + 3], ' ') AS chunk_text
        FROM c, unnest(range(0, nc)) AS u(i)),
      hot AS (
        SELECT chunk_text FROM ch
        GROUP BY chunk_text HAVING count(DISTINCT doc_id) >= 3),
      k AS (
        SELECT ch.doc_id, ch.chunk_id, ch.chunk_text,
               (h.chunk_text IS NOT NULL) AS is_hot
        FROM ch LEFT JOIN hot h ON ch.chunk_text = h.chunk_text)
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_chunks,
             CAST(sum(CASE WHEN is_hot THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dropped,
             COALESCE(string_agg(CASE WHEN NOT is_hot THEN chunk_text END,
                                 ' ' ORDER BY chunk_id), '') AS clean_text
      FROM k GROUP BY doc_id ORDER BY doc_id"""))

  /** Distributed Lloyd k-means over the embedding corpus (4 cells, 2
    * iterations, centroids rounded to the engine-portable 6dp grid),
    * profiled to per-cell size and mean L2 distance. */
  private val q76 = Entry(
    "q76_kmeans_profile",
    (s, d) =>
      graft.ops.Similarity
        .kmeansProfile(Tables.embeddings(s, d), "vec_id", "embedding",
          cells = 4, iters = 2, roundDp = 6)
        .select(col("cell"), col("n"), r6(col("mean_dist")).as("mean_dist"))
        .orderBy("cell"),
    Some("""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      c0 AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS cv
        FROM e QUALIFY row_number() OVER (ORDER BY vec_id) <= 4),
      d1 AS (
        SELECT e.vec_id, c0.cell,
               sqrt(list_sum(list_transform(range(1, len(e.v) + 1),
                 i -> (e.v[i] - c0.cv[i]) * (e.v[i] - c0.cv[i])))) AS d
        FROM e, c0),
      a1 AS (
        SELECT vec_id, cell FROM (
          SELECT vec_id, cell,
                 row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
          FROM d1) WHERE rn = 1),
      m1 AS (
        SELECT a1.cell, u.i, round(avg(e.v[u.i]), 6) AS m
        FROM a1 JOIN e USING (vec_id), unnest(range(1, 65)) AS u(i)
        GROUP BY a1.cell, u.i),
      c1 AS (
        SELECT c0.cell, COALESCE(n.cv, c0.cv) AS cv
        FROM c0 LEFT JOIN (SELECT cell, list(m ORDER BY i) AS cv
                           FROM m1 GROUP BY cell) n USING (cell)),
      d2 AS (
        SELECT e.vec_id, c1.cell,
               sqrt(list_sum(list_transform(range(1, len(e.v) + 1),
                 i -> (e.v[i] - c1.cv[i]) * (e.v[i] - c1.cv[i])))) AS d
        FROM e, c1),
      a2 AS (
        SELECT vec_id, cell FROM (
          SELECT vec_id, cell,
                 row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
          FROM d2) WHERE rn = 1),
      m2 AS (
        SELECT a2.cell, u.i, round(avg(e.v[u.i]), 6) AS m
        FROM a2 JOIN e USING (vec_id), unnest(range(1, 65)) AS u(i)
        GROUP BY a2.cell, u.i),
      c2 AS (
        SELECT c1.cell, COALESCE(n.cv, c1.cv) AS cv
        FROM c1 LEFT JOIN (SELECT cell, list(m ORDER BY i) AS cv
                           FROM m2 GROUP BY cell) n USING (cell)),
      df AS (
        SELECT e.vec_id, c2.cell,
               sqrt(list_sum(list_transform(range(1, len(e.v) + 1),
                 i -> (e.v[i] - c2.cv[i]) * (e.v[i] - c2.cv[i])))) AS d
        FROM e, c2),
      af AS (
        SELECT vec_id, cell, d FROM (
          SELECT vec_id, cell, d,
                 row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
          FROM df) WHERE rn = 1)
      SELECT cell, CAST(count(*) AS BIGINT) AS n,
             round(avg(d), 6) AS mean_dist
      FROM af GROUP BY cell ORDER BY cell"""))

  /** Token-budget corpus sampling: deterministic md5-ordered prefix of
    * documents whose exclusive running token total stays under 12000 —
    * the budget-capped (not rate-based) subset selection step. */
  private val q77 = Entry(
    "q77_token_budget_sample",
    (s, d) =>
      graft.ops.Sampling
        .budgetSample(
          Tables.documents(s, d)
            .select(col("doc_id"),
              size(split(col("text"), " ")).cast("long").as("n_tokens")),
          budget = 12000L, "n_tokens", Seq("doc_id"))
        .select(col("doc_id"), col("n_tokens"), col("budget_used"))
        .orderBy("doc_id"),
    Some("""
      WITH t AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
                 AS h
        FROM documents),
      c AS (
        SELECT doc_id, n_tokens,
               CAST(COALESCE(sum(n_tokens) OVER (
                 ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING), 0) AS BIGINT) AS budget_used
        FROM t)
      SELECT doc_id, n_tokens, budget_used
      FROM c WHERE budget_used < 12000 ORDER BY doc_id"""))

  /** Canonical-document selection over the q34 near-dup clusters: keep
    * the LONGEST member per cluster (tie -> lowest id), not the
    * arbitrary min-id graph representative. */
  private val q78 = Entry(
    "q78_cluster_canonical",
    (s, d) =>
      graft.ops.Dedup
        .canonicalPerCluster(docTrigramClusters(s, d),
          Tables.documents(s, d), "doc_id", "n_chars")
        .orderBy("doc_id"),
    Some("""
      WITH RECURSIVE toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      sh AS (
        SELECT DISTINCT doc_id AS id,
               unnest(list_transform(range(1, len(w) - 1),
                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        FROM toks WHERE len(w) >= 3),
      keep AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 100),
      shk AS (SELECT sh.id, sh.s FROM sh JOIN keep USING (s)),
      sz AS (SELECT id, count(*) AS n_sh FROM shk GROUP BY 1),
      prs AS (
        SELECT a.id AS doc_a, b.id AS doc_b, count(*) AS inter
        FROM shk a JOIN shk b ON a.s = b.s AND a.id < b.id
        GROUP BY 1, 2),
      jac AS (
        SELECT doc_a, doc_b
        FROM prs JOIN sz x ON doc_a = x.id JOIN sz y ON doc_b = y.id
        WHERE inter / (x.n_sh + y.n_sh - inter) >= 0.8),
      sym AS (SELECT doc_a AS a, doc_b AS b FROM jac
              UNION SELECT doc_b, doc_a FROM jac),
      reach(a, b) AS (
        SELECT a, b FROM sym
        UNION
        SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
      comp AS (SELECT a AS id, least(a, min(b)) AS component
               FROM reach GROUP BY a),
      cl AS (
        SELECT d.doc_id,
               COALESCE(c.component, d.doc_id) AS cluster,
               d.n_chars
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
      cn AS (
        SELECT doc_id, cluster,
               first_value(doc_id) OVER (
                 PARTITION BY cluster ORDER BY n_chars DESC, doc_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                 AS canonical_id
        FROM cl)
      SELECT doc_id, cluster, canonical_id,
             (doc_id = canonical_id) AS keep
      FROM cn ORDER BY doc_id"""))

  /** Gopher-style structural quality gate: word-count and mean-word-
    * length bounds, stopword presence, alphabetic-word fraction. */
  private val q79 = Entry(
    "q79_quality_flags",
    (s, d) =>
      graft.ops.TextAnalysis
        .qualityFlags(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id"),
    Some("""
      WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS w
                 FROM documents)
      SELECT doc_id,
             CAST(len(w) AS BIGINT) AS n_words,
             round((length(text) - (len(w) - 1)) / CAST(len(w) AS DOUBLE), 6)
               AS mean_word_len,
             CAST(len(list_intersect(list_distinct(w),
               ['the','a','of','and','to','in','is','that'])) AS BIGINT)
               AS stop_hits,
             round(len(list_filter(w, x -> regexp_matches(x, '^[A-Za-z]+$')))
               / CAST(len(w) AS DOUBLE), 6) AS alpha_frac,
             (len(w) BETWEEN 20 AND 100000
              AND (length(text) - (len(w) - 1)) / CAST(len(w) AS DOUBLE)
                  BETWEEN 3.0 AND 10.0
              AND len(list_intersect(list_distinct(w),
                    ['the','a','of','and','to','in','is','that'])) >= 2
              AND len(list_filter(w, x -> regexp_matches(x, '^[A-Za-z]+$')))
                  / CAST(len(w) AS DOUBLE) >= 0.8) AS pass
      FROM t ORDER BY doc_id"""))

  /** Exact duplicated-substring spans (Lee et al. shape): 3-gram
    * positions occurring in >= 3 docs, merged into maximal per-doc
    * token intervals. */
  private val q80 = Entry(
    "q80_duplicate_spans",
    (s, d) =>
      graft.ops.Dedup
        .duplicateSpans(Tables.documents(s, d), "doc_id", "text",
          n = 3, minDocs = 3)
        .orderBy("doc_id", "span_start"),
    Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      g AS (
        SELECT doc_id, i AS pos,
               w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS gtext
        FROM t, unnest(range(1, len(w) - 1)) AS u(i)
        WHERE len(w) >= 3),
      dup AS (
        SELECT gtext FROM g GROUP BY gtext
        HAVING count(DISTINCT doc_id) >= 3),
      f AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gtext)),
      s AS (
        SELECT doc_id, pos,
               CASE WHEN pos - lag(pos) OVER
                      (PARTITION BY doc_id ORDER BY pos) > 3
                    THEN 1 ELSE 0 END AS nw
        FROM f),
      sp AS (
        SELECT doc_id, pos,
               sum(nw) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span
        FROM s)
      SELECT doc_id,
             CAST(min(pos) AS BIGINT) AS span_start,
             CAST(max(pos) + 2 AS BIGINT) AS span_end,
             CAST(max(pos) + 2 - min(pos) + 1 AS BIGINT) AS span_tokens
      FROM sp GROUP BY doc_id, span ORDER BY doc_id, span_start"""))

  /** SemDeDup: 1-iteration k-means cells (4, 6dp-rounded) block the
    * cosine pairs; a vector is dropped when any lower-id cellmate is
    * >= 0.45 cosine-similar. */
  private val q81 = Entry(
    "q81_semantic_dedup",
    (s, d) =>
      graft.ops.Dedup
        .semanticDedup(Tables.embeddings(s, d), "vec_id", "embedding",
          cells = 4, iters = 1, roundDp = 6, threshold = 0.45)
        .orderBy("vec_id"),
    Some("""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      c0 AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS cv
        FROM e QUALIFY row_number() OVER (ORDER BY vec_id) <= 4),
      d1 AS (
        SELECT e.vec_id, c0.cell,
               sqrt(list_sum(list_transform(range(1, len(e.v) + 1),
                 i -> (e.v[i] - c0.cv[i]) * (e.v[i] - c0.cv[i])))) AS d
        FROM e, c0),
      a1 AS (
        SELECT vec_id, cell FROM (
          SELECT vec_id, cell,
                 row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
          FROM d1) WHERE rn = 1),
      m1 AS (
        SELECT a1.cell, u.i, round(avg(e.v[u.i]), 6) AS m
        FROM a1 JOIN e USING (vec_id), unnest(range(1, 65)) AS u(i)
        GROUP BY a1.cell, u.i),
      c1 AS (
        SELECT c0.cell, COALESCE(n.cv, c0.cv) AS cv
        FROM c0 LEFT JOIN (SELECT cell, list(m ORDER BY i) AS cv
                           FROM m1 GROUP BY cell) n USING (cell)),
      d2 AS (
        SELECT e.vec_id, c1.cell,
               sqrt(list_sum(list_transform(range(1, len(e.v) + 1),
                 i -> (e.v[i] - c1.cv[i]) * (e.v[i] - c1.cv[i])))) AS d
        FROM e, c1),
      af AS (
        SELECT vec_id, cell FROM (
          SELECT vec_id, cell,
                 row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
          FROM d2) WHERE rn = 1),
      j AS (
        SELECT af.vec_id, af.cell, e.v,
               sqrt(list_dot_product(e.v, e.v)) AS nrm
        FROM af JOIN e USING (vec_id)),
      fl AS (
        SELECT DISTINCT b.vec_id
        FROM j a JOIN j b ON a.cell = b.cell AND a.vec_id < b.vec_id
        WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.45)
      SELECT j.vec_id, j.cell, (fl.vec_id IS NULL) AS keep
      FROM j LEFT JOIN fl ON j.vec_id = fl.vec_id
      ORDER BY j.vec_id"""))

  /** Per-source token budgets (mixture balancing): each source keeps
    * its own md5-ordered 800-token document prefix. */
  private val q82 = Entry(
    "q82_budget_per_source",
    (s, d) =>
      graft.ops.Sampling
        .budgetSample(
          Tables.documents(s, d)
            .select(col("doc_id"), col("source"),
              size(split(col("text"), " ")).cast("long").as("n_tokens")),
          budget = 800L, "n_tokens", Seq("doc_id"),
          strataCols = Seq("source"))
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("budget_used"))
        .orderBy("doc_id"),
    Some("""
      WITH t AS (
        SELECT doc_id, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
                 AS h
        FROM documents),
      c AS (
        SELECT doc_id, source, n_tokens,
               CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY source
                 ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING), 0) AS BIGINT) AS budget_used
        FROM t)
      SELECT doc_id, source, n_tokens, budget_used
      FROM c WHERE budget_used < 800 ORDER BY doc_id"""))

  /** Token-balanced shard packing: hash-ordered docs packed into
    * ~4000-token training shards. */
  private val q83 = Entry(
    "q83_shard_assign",
    (s, d) =>
      graft.ops.Sampling
        .assignShards(
          Tables.documents(s, d)
            .select(col("doc_id"),
              size(split(col("text"), " ")).cast("long").as("n_tokens")),
          weightPerShard = 4000L, "n_tokens", Seq("doc_id"))
        .select(col("doc_id"), col("n_tokens"), col("shard_id"))
        .orderBy("doc_id"),
    Some("""
      WITH t AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
                 AS h
        FROM documents),
      c AS (
        SELECT doc_id, n_tokens,
               COALESCE(sum(n_tokens) OVER (
                 ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING), 0) AS cum
        FROM t)
      SELECT doc_id, n_tokens,
             CAST(floor(cum / 4000) AS BIGINT) AS shard_id
      FROM c ORDER BY doc_id"""))

  /** BM25 top-k full-text retrieval over documents for a 3-term query —
    * both engines rank by the ROUNDED score + id so the k-boundary is
    * deterministic. */
  private val q84 = Entry(
    "q84_bm25_topk",
    (s, d) =>
      graft.ops.TextAnalysis
        .bm25TopK(Tables.documents(s, d), "doc_id", "text",
          Seq("hash", "join", "scan"), k = 10)
        .select(col("doc_id"), col("bm25")),
    Some("""
      WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS w,
               CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl
        FROM documents),
      st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM d),
      tf AS (
        SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf,
               any_value(dl) AS dl
        FROM (SELECT doc_id, dl, unnest(w) AS term FROM d)
        WHERE term IN ('hash', 'join', 'scan')
        GROUP BY doc_id, term),
      dfr AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf
              GROUP BY term),
      sc AS (
        SELECT doc_id,
               round(sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                 * tf * (1.2 + 1)
                 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 6) AS bm25
        FROM tf JOIN dfr USING (term), st
        GROUP BY doc_id)
      SELECT doc_id, bm25 FROM sc ORDER BY bm25 DESC, doc_id LIMIT 10"""))

  /** PMI collocations: top-20 bigrams by pointwise mutual information
    * with min support 5 — Spark zips the token array with its tail
    * (map-only), the oracle re-derives adjacency with a lead window. */
  private val q85 = Entry(
    "q85_pmi_bigrams",
    (s, d) =>
      graft.ops.TextAnalysis
        .pmiBigrams(Tables.documents(s, d), "text", minCount = 5, k = 20),
    Some("""
      WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term,
               generate_subscripts(string_split(text, ' '), 1) AS ord
        FROM documents),
      bi0 AS (
        SELECT term AS x,
               lead(term) OVER (PARTITION BY doc_id ORDER BY ord) AS y
        FROM toks),
      bi AS (SELECT x, y, count(*) AS c_xy FROM bi0 WHERE y IS NOT NULL
             GROUP BY 1, 2),
      uni AS (SELECT term AS t, count(*) AS c_t FROM toks GROUP BY 1),
      tb AS (SELECT sum(c_xy) AS t_bi FROM bi),
      tu AS (SELECT sum(c_t) AS t_uni FROM uni)
      SELECT x, y, c_xy,
             round(ln((c_xy / t_bi) /
               ((cx.c_t / t_uni) * (cy.c_t / t_uni))), 6) AS pmi
      FROM bi JOIN uni cx ON bi.x = cx.t JOIN uni cy ON bi.y = cy.t, tb, tu
      WHERE c_xy >= 5
      ORDER BY pmi DESC, x, y LIMIT 20"""))

  /** Bloom-prefiltered decontamination: per-training-doc count of
    * distinct trigrams appearing anywhere in the benchmark split
    * (doc_id < 250). The bloom stage only prunes — the exact confirm
    * join makes the result oracle-verifiable. */
  private val q86 = Entry(
    "q86_bloom_decontaminate",
    (s, d) => {
      val docs = Tables.documents(s, d)
      graft.ops.Dedup
        .bloomDecontaminate(
          docs.where(col("doc_id") >= 250), "doc_id", "text",
          docs.where(col("doc_id") < 250), "text", n = 3)
        .orderBy("doc_id")
    },
    Some("""
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      sh AS (
        SELECT DISTINCT doc_id AS id,
               unnest(list_transform(range(1, len(w) - 1),
                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        FROM toks WHERE len(w) >= 3),
      refg AS (SELECT DISTINCT s FROM sh WHERE id < 250),
      cnt AS (
        SELECT id, count(*) AS dirty_ngrams
        FROM sh JOIN refg USING (s)
        WHERE id >= 250
        GROUP BY id)
      SELECT d.doc_id, COALESCE(c.dirty_ngrams, 0) AS dirty_ngrams,
             COALESCE(c.dirty_ngrams, 0) > 0 AS contaminated
      FROM (SELECT doc_id FROM documents WHERE doc_id >= 250) d
      LEFT JOIN cnt c ON d.doc_id = c.id
      ORDER BY d.doc_id"""))

  /** Sequence packing: md5-hash-ordered token stream chunked into
    * 512-token training sequences; documents may straddle boundaries
    * (seq_first/seq_last span + offset within the first sequence). */
  private val q87 = Entry(
    "q87_sequence_pack",
    (s, d) =>
      graft.ops.Sampling
        .packSequences(
          Tables.documents(s, d)
            .select(col("doc_id"),
              size(split(col("text"), " ")).cast("long").as("n_tokens")),
          seqLen = 512L, "n_tokens", Seq("doc_id"))
        .select(col("doc_id"), col("n_tokens"), col("seq_first"),
          col("seq_last"), col("offset_in_seq"))
        .orderBy("doc_id"),
    Some("""
      WITH t AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
                 AS h
        FROM documents),
      c AS (
        SELECT doc_id, n_tokens,
               COALESCE(sum(n_tokens) OVER (
                 ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING), 0) AS cum
        FROM t)
      SELECT doc_id, n_tokens,
             CAST(floor(cum / 512) AS BIGINT) AS seq_first,
             CAST(CASE WHEN n_tokens <= 0 THEN floor(cum / 512)
                  ELSE floor((cum + n_tokens - 1) / 512) END AS BIGINT)
               AS seq_last,
             CAST(cum % 512 AS BIGINT) AS offset_in_seq
      FROM c ORDER BY doc_id"""))

  /** Matryoshka truncation 64→16 with L2 renorm: the compared surface
    * pins the sequential element sum, min/max, and retained-norm
    * fraction (no float→string hashing — formats differ per engine). */
  private val q88 = Entry(
    "q88_embedding_truncate",
    (s, d) =>
      graft.ops.Features
        .truncateEmbedding(Tables.embeddings(s, d), "vec_id", "embedding",
          dim = 16)
        .select(col("vec_id"),
          r6(aggregate(col("truncated"), lit(0.0), (a, x) => a + x))
            .as("t_sum"),
          r6(array_min(col("truncated"))).as("t_min"),
          r6(array_max(col("truncated"))).as("t_max"),
          r6(col("norm_frac")).as("norm_frac"))
        .orderBy("vec_id"),
    Some("""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      t AS (
        SELECT vec_id, v[1:16] AS p,
               sqrt(list_sum(list_transform(v[1:16], x -> x * x))) AS pn,
               sqrt(list_sum(list_transform(v, x -> x * x))) AS fn
        FROM e),
      r AS (
        SELECT vec_id,
               list_transform(p, x ->
                 CASE WHEN pn = 0 THEN 0.0 ELSE x / pn END) AS tr,
               CASE WHEN fn = 0 THEN NULL ELSE pn / fn END AS norm_frac
        FROM t)
      SELECT vec_id,
             round(list_sum(tr), 6) AS t_sum,
             round(list_min(tr), 6) AS t_min,
             round(list_max(tr), 6) AS t_max,
             round(norm_frac, 6) AS norm_frac
      FROM r ORDER BY vec_id"""))

  /** Bucketed range join: overlapping 2-day windows (one per event
    * day) × events — each event lands in up to two windows through a
    * day-width bucket equi-join, never a nested-loop. */
  private val q89 = Entry(
    "q89_range_join",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts").cast("long").as("t"),
          col("value"))
      val wins = Tables.events(s, d)
        .select(date_trunc("DAY", col("ts")).cast("long").as("w_start"))
        .distinct()
        .withColumn("w_end", col("w_start") + 172800L)
      graft.ops.PointInTime
        .rangeJoin(ev, "t", wins, "w_start", "w_end",
          bucketWidth = 86400L)
        .groupBy("w_start")
        .agg(count(lit(1)).as("n_events"), r2(sum(col("value"))).as("win_value"))
        .orderBy("w_start")
    },
    Some("""
      WITH p AS (
        SELECT event_id, epoch(ts)::BIGINT AS t, "value" FROM events),
      w AS (
        SELECT DISTINCT epoch(date_trunc('day', ts))::BIGINT AS w_start
        FROM events),
      j AS (
        SELECT w_start, t, "value"
        FROM w JOIN p ON t >= w_start AND t < w_start + 172800)
      SELECT w_start, count(*) AS n_events,
             round(sum("value"), 2) AS win_value
      FROM j GROUP BY 1 ORDER BY 1"""))

  /** Per-entity rolling z-score anomalies on the events stream:
    * trailing-7 baseline strictly before each point, per-user flag
    * counts + the extreme score. */
  private val q90 = Entry(
    "q90_rolling_anomaly",
    (s, d) =>
      graft.ops.TimeSeries
        .rollingAnomaly(Tables.events(s, d), Seq("user_id"), "ts", "value",
          window = 7, z = 2.5, tieCols = Seq("event_id"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_obs"),
          sum(when(col("anomaly"), 1L).otherwise(0L)).as("n_anomalies"),
          r6(max(abs(col("zscore")))).as("max_abs_z"))
        .orderBy("user_id"),
    Some("""
      WITH e AS (
        SELECT user_id, "value",
               avg("value") OVER w AS mu,
               stddev_samp("value") OVER w AS sd,
               count("value") OVER w AS n
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
      s AS (
        SELECT user_id,
               CASE WHEN n >= 2 AND sd IS NOT NULL AND sd > 0
                    THEN ("value" - mu) / sd END AS zscore
        FROM e)
      SELECT user_id, count(*) AS n_obs,
             CAST(sum(CASE WHEN abs(zscore) > 2.5 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_anomalies,
             round(max(abs(zscore)), 6) AS max_abs_z
      FROM s GROUP BY 1 ORDER BY 1"""))

  /** Interval-overlap join: per-order 3-day fulfillment windows ×
    * overlapping 10-day monitoring windows (every 7 days) — pairs meet
    * once in the canonical bucket, counted per monitoring window. */
  private val q91 = Entry(
    "q91_interval_join",
    (s, d) => {
      val orders = Tables.orders(s, d)
        .select(col("o_orderkey"),
          col("o_orderdate").cast("timestamp").cast("long").as("o_start"))
        .withColumn("o_end", col("o_start") + 259200L)
      val weeks = Tables.orders(s, d)
        .select((floor(col("o_orderdate").cast("timestamp").cast("long")
          / 604800L) * 604800L).cast("long").as("w_start"))
        .distinct()
        .withColumn("w_end", col("w_start") + 864000L)
      graft.ops.PointInTime
        .intervalJoin(orders, "o_start", "o_end",
          weeks, "w_start", "w_end", bucketWidth = 604800L)
        .groupBy("w_start")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("w_start")
    },
    Some("""
      WITH o AS (
        SELECT o_orderkey,
               epoch(o_orderdate::TIMESTAMP)::BIGINT AS o_start,
               epoch(o_orderdate::TIMESTAMP)::BIGINT + 259200 AS o_end
        FROM orders),
      w AS (
        SELECT DISTINCT
               (floor(epoch(o_orderdate::TIMESTAMP) / 604800) * 604800)::BIGINT
                 AS w_start
        FROM orders),
      w2 AS (SELECT w_start, w_start + 864000 AS w_end FROM w),
      j AS (
        SELECT w_start
        FROM o JOIN w2 ON o_start < w_end AND w_start < o_end)
      SELECT w_start, count(*) AS n_orders
      FROM j GROUP BY 1 ORDER BY 1"""))

  /** Row-level version diff: deterministic mutation of orders (drop
    * keys %97, bump price on %101, add offset copies of %103) diffed
    * against the original — per-status counts + key checksums. */
  private val q92 = Entry(
    "q92_row_diff",
    (s, d) => {
      val o = Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
      val k = col("o_orderkey")
      val mutated = o.where(k % 97 =!= 0)
        .withColumn("o_totalprice",
          when(k % 101 === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")))
        .unionByName(o.where(k % 103 === 0)
          .withColumn("o_orderkey", k + 900000000L))
      graft.ops.Diff
        .rowDiff(o, mutated, Seq("o_orderkey"),
          Seq("o_totalprice", "o_orderstatus"))
        .groupBy("diff_status")
        .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("key_sum"))
        .orderBy("diff_status")
    },
    Some("""
      WITH o AS (
        SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
      n AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 101 = 0 THEN o_totalprice + 1.0
                    ELSE o_totalprice END AS o_totalprice,
               o_orderstatus
        FROM o WHERE o_orderkey % 97 <> 0
        UNION ALL
        SELECT o_orderkey + 900000000, o_totalprice, o_orderstatus
        FROM o WHERE o_orderkey % 103 = 0),
      j AS (
        SELECT COALESCE(n.o_orderkey, o.o_orderkey) AS k,
               CASE WHEN o.o_orderkey IS NULL THEN 'added'
                    WHEN n.o_orderkey IS NULL THEN 'removed'
                    WHEN o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
                         AND o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus
                      THEN 'unchanged'
                    ELSE 'changed' END AS diff_status
        FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey)
      SELECT diff_status, count(*) AS n,
             CAST(sum(k) AS BIGINT) AS key_sum
      FROM j GROUP BY 1 ORDER BY 1"""))

  /** Content-defined chunk dedup: word-hash boundaries (divisor 4),
    * hot chunks (≥3 docs) dropped, survivors reassembled — the
    * insertion-robust sibling of the fixed-window q75. */
  private val q93 = Entry(
    "q93_cdc_chunk_dedup",
    (s, d) =>
      graft.ops.Dedup
        .cdcChunkDedup(Tables.documents(s, d), "doc_id", "text",
          divisor = 4, maxDocs = 3)
        .orderBy("doc_id"),
    Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      st AS (
        SELECT doc_id, w,
               list_filter(range(1, len(w) + 1),
                 i -> i = 1 OR
                   ('0x' || substring(md5(w[i]), 1, 13))::BIGINT % 4 = 0)
                 AS starts
        FROM t),
      ch AS (
        SELECT doc_id, j - 1 AS chunk_id,
               array_to_string(
                 w[starts[j] : COALESCE(starts[j + 1], len(w) + 1) - 1],
                 ' ') AS chunk_text
        FROM st, unnest(range(1, len(starts) + 1)) AS u(j)),
      hot AS (
        SELECT chunk_text FROM ch
        GROUP BY chunk_text HAVING count(DISTINCT doc_id) >= 3),
      k AS (
        SELECT ch.doc_id, ch.chunk_id, ch.chunk_text,
               (h.chunk_text IS NOT NULL) AS is_hot
        FROM ch LEFT JOIN hot h ON ch.chunk_text = h.chunk_text)
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_chunks,
             CAST(sum(CASE WHEN is_hot THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dropped,
             COALESCE(string_agg(CASE WHEN NOT is_hot THEN chunk_text END,
                                 ' ' ORDER BY chunk_id), '') AS clean_text
      FROM k GROUP BY doc_id ORDER BY doc_id"""))

  /** Unigram-LM scoring: add-1 smoothed model fit on the doc_id<250
    * split, every document scored by mean token log-prob + perplexity. */
  private val q94 = Entry(
    "q94_unigram_loglik",
    (s, d) => {
      val docs = Tables.documents(s, d)
      graft.ops.TextAnalysis
        .unigramLogLikelihood(docs, "doc_id", "text",
          docs.where(col("doc_id") < 250), "text")
        .orderBy("doc_id")
    },
    Some("""
      WITH rt AS (
        SELECT unnest(string_split(text, ' ')) AS term
        FROM documents WHERE doc_id < 250),
      v AS (SELECT term, count(*) AS c FROM rt GROUP BY 1),
      tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                     count(*) AS vv FROM v),
      tk AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents),
      sc AS (
        SELECT doc_id,
               ln((COALESCE(v.c, 0) + 1.0) / (n + 1.0 * (vv + 1))) AS lp
        FROM tk LEFT JOIN v USING (term), tot)
      SELECT doc_id, count(*) AS n_tokens,
             round(avg(lp), 6) AS avg_logprob,
             round(exp(-avg(lp)), 6) AS ppl
      FROM sc GROUP BY 1 ORDER BY 1"""))

  /** Text canonicalization + its dedup payoff: normalized exact-dup
    * groups vs raw exact-dup groups over case/whitespace variants
    * (synthesized deterministically from the corpus). */
  private val q95 = Entry(
    "q95_normalize_text",
    (s, d) => {
      val docs = Tables.documents(s, d)
      // plant case variants: a copy of every %7 doc, uppercased
      val variants = docs.where(col("doc_id") % 7 === 0)
        .withColumn("doc_id", col("doc_id") + 10000000L)
        .withColumn("text", upper(col("text")))
      val all = docs.unionByName(variants)
      graft.ops.TextAnalysis.normalizeText(all, "text")
        .groupBy(md5(col("norm_text")).as("g"))
        .agg(count(lit(1)).as("n_variants"),
          min(col("doc_id")).as("keeper_id"))
        .where(col("n_variants") > 1)
        .select("keeper_id", "n_variants")
        .orderBy("keeper_id")
    },
    Some("""
      WITH a AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 10000000, upper(text)
        FROM documents WHERE doc_id % 7 = 0),
      n AS (
        SELECT doc_id,
               trim(regexp_replace(
                 regexp_replace(lower(text), '[\x00-\x1f\x7f]', ' ', 'g'),
                 '[ \t\n\r]+', ' ', 'g')) AS norm_text
        FROM a)
      SELECT min(doc_id) AS keeper_id, count(*) AS n_variants
      FROM n GROUP BY md5(norm_text) HAVING count(*) > 1
      ORDER BY keeper_id"""))

  /** Key-skew profile on the events stream's type column: histogram
    * shape + the salt factor the mitigation operators should use. */
  private val q96 = Entry(
    "q96_key_skew_profile",
    (s, d) =>
      graft.ops.SkewAware
        .keySkewProfile(Tables.events(s, d), Seq("event_type"))
        .select(col("n_keys"), col("n_rows"), col("max_rows"),
          r6(col("avg_rows")).as("avg_rows"),
          r6(col("top_share")).as("top_share"),
          r6(col("skew_ratio")).as("skew_ratio"),
          col("suggested_salt")),
    Some("""
      WITH c AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1)
      SELECT count(*) AS n_keys,
             CAST(sum(n) AS BIGINT) AS n_rows,
             max(n) AS max_rows,
             round(avg(n), 6) AS avg_rows,
             round(max(n) / sum(n), 6) AS top_share,
             round(max(n) / avg(n), 6) AS skew_ratio,
             CAST(least(greatest(ceil(max(n) / avg(n)), 1), 64) AS INTEGER)
               AS suggested_salt
      FROM c"""))

  /** Blocked fuzzy matching over DISTINCT part names (the
    * entity-resolution shape: dedupe values first, so the comparison
    * space is vocabulary-bounded, not corpus-quadratic — row-level
    * pairing on a corpus of repeated names explodes with SF). The
    * default-on hot-block cap is set low enough (6 < the 8-name
    * blocks at this SF) to genuinely engage: the oracle mirrors the
    * md5 thin threshold on the candidate side. */
  private val q97 = Entry(
    "q97_fuzzy_pairs",
    (s, d) => {
      val names = Tables.part(s, d)
        .groupBy(col("p_name"))
        .agg(min(col("p_partkey")).as("name_id"))
      graft.ops.Dedup
        .fuzzyPairs(names, "name_id", "p_name", maxDist = 3, maxBlock = 6)
        .orderBy("id_a", "id_b")
    },
    Some("""
      WITH p AS (
        SELECT min(p_partkey) AS id, p_name AS nm,
               string_split(p_name, ' ')[1] AS bk
        FROM part GROUP BY p_name),
      bc AS (SELECT bk, count(*) AS bn FROM p GROUP BY bk),
      pc AS (
        SELECT p.* FROM p JOIN bc USING (bk)
        WHERE (('0x' || substring(md5(p.bk || '|' || CAST(p.id AS VARCHAR)), 1, 15))::BIGINT
               % 1048576) * bn < 6 * 1048576),
      j AS (
        SELECT a.id AS id_a, b.id AS id_b,
               levenshtein(a.nm, b.nm) AS edit_dist
        FROM p a JOIN pc b ON a.bk = b.bk AND a.id < b.id
        WHERE abs(len(a.nm) - len(b.nm)) <= 3)
      SELECT id_a, id_b, edit_dist FROM j
      WHERE edit_dist <= 3 ORDER BY id_a, id_b"""))

  /** Canonical selection from a PERSISTED cluster store — the
    * amortized production shape of q78: pairs + connected components
    * are computed once and written as a parquet store keyed by a
    * content fingerprint (count + id/text hashes, so a changed corpus
    * rebuilds instead of reading stale clusters); the query itself
    * pays one store read + the per-cluster canonical window. The
    * oracle replays the full derivation — results must be identical
    * to recomputing from scratch. */
  private val q98 = Entry(
    "q98_canonical_from_store",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val fp = docs.agg(count(lit(1)),
        expr("bit_xor(xxhash64(doc_id))"),
        expr("bit_xor(xxhash64(text))")).head()
      val tag = java.lang.Long.toHexString(
        fp.getLong(0) ^ fp.getLong(1) ^ fp.getLong(2))
      val path = s"${sys.props("java.io.tmpdir")}/graft_cluster_store/$tag"
      if (!new java.io.File(s"$path/_SUCCESS").exists()) {
        val pairs = graft.ops.Dedup
          .ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8,
            maxPostings = 100)
        graft.ops.Dedup.writeClusterStore(docs, "doc_id", pairs, path)
      }
      graft.ops.Dedup
        .canonicalFromStore(path, docs, "doc_id", "n_chars")
        .orderBy("doc_id")
    },
    Some("""
      WITH RECURSIVE toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      sh AS (
        SELECT DISTINCT doc_id AS id,
               unnest(list_transform(range(1, len(w) - 1),
                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        FROM toks WHERE len(w) >= 3),
      keep AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 100),
      shk AS (SELECT sh.id, sh.s FROM sh JOIN keep USING (s)),
      sz AS (SELECT id, count(*) AS n_sh FROM shk GROUP BY 1),
      prs AS (
        SELECT a.id AS doc_a, b.id AS doc_b, count(*) AS inter
        FROM shk a JOIN shk b ON a.s = b.s AND a.id < b.id
        GROUP BY 1, 2),
      jac AS (
        SELECT doc_a, doc_b
        FROM prs JOIN sz x ON doc_a = x.id JOIN sz y ON doc_b = y.id
        WHERE inter / (x.n_sh + y.n_sh - inter) >= 0.8),
      sym AS (SELECT doc_a AS a, doc_b AS b FROM jac
              UNION SELECT doc_b, doc_a FROM jac),
      reach(a, b) AS (
        SELECT a, b FROM sym
        UNION
        SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
      comp AS (SELECT a AS id, least(a, min(b)) AS component
               FROM reach GROUP BY a),
      cl AS (
        SELECT d.doc_id,
               COALESCE(c.component, d.doc_id) AS cluster,
               d.n_chars
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
      cn AS (
        SELECT doc_id, cluster,
               first_value(doc_id) OVER (
                 PARTITION BY cluster ORDER BY n_chars DESC, doc_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                 AS canonical_id
        FROM cl)
      SELECT doc_id, cluster, canonical_id,
             (doc_id = canonical_id) AS keep
      FROM cn ORDER BY doc_id"""))

  /** Deterministic train/val/test split over documents: 80/10/10 by
    * md5 bucket — per-row stable under corpus growth (no rand()). */
  private val q99 = Entry(
    "q99_hash_split",
    (s, d) =>
      graft.ops.Sampling
        .hashSplit(Tables.documents(s, d),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), Seq("doc_id"))
        .groupBy("split")
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_id"))
        .orderBy("split"),
    Some(s"""
      WITH h AS (
        SELECT doc_id,
               (('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                % 1048576) AS b
        FROM documents),
      s AS (
        SELECT doc_id,
               CASE WHEN b < 0.8 * 1048576 THEN 'train'
                    WHEN b < 0.9 * 1048576 THEN 'val'
                    ELSE 'test' END AS split
        FROM h)
      SELECT split, count(*) AS n, min(doc_id) AS min_id
      FROM s GROUP BY split ORDER BY split"""))

  /** Exact-n stratified sample: exactly 30 docs per language in
    * deterministic md5 order (vs the ~n rate-based sampler of q35). */
  private val q100 = Entry(
    "q100_exact_stratified",
    (s, d) =>
      graft.ops.Sampling
        .exactStratifiedSample(Tables.documents(s, d), 30, Seq("lang"),
          Seq("doc_id"))
        .select(col("doc_id"), col("lang"))
        .orderBy("lang", "doc_id"),
    Some("""
      WITH h AS (
        SELECT doc_id, lang,
               (('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                % 1048576) AS b
        FROM documents),
      r AS (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY b, doc_id) AS rn
        FROM h)
      SELECT doc_id, lang FROM r WHERE rn <= 30 ORDER BY lang, doc_id"""))

  /** Per-source token-distribution entropy: the diversity diagnostic a
    * mixing decision reads before temperature rebalancing. */
  private val q101 = Entry(
    "q101_token_entropy",
    (s, d) =>
      graft.ops.TextAnalysis
        .tokenEntropy(Tables.documents(s, d), "source", "text")
        .orderBy("source"),
    Some("""
      WITH toks AS (
        SELECT source, unnest(string_split(text, ' ')) AS term
        FROM documents),
      c AS (SELECT source, term, count(*) AS c FROM toks GROUP BY 1, 2),
      t AS (SELECT source, CAST(sum(c) AS BIGINT) AS n,
                   count(*) AS v
            FROM c GROUP BY 1)
      SELECT c.source,
             CAST(min(t.n) AS BIGINT) AS n_tokens,
             CAST(min(t.v) AS BIGINT) AS vocab_size,
             round(-sum((c.c / t.n) * ln(c.c / t.n)), 6) AS entropy,
             round(min(t.v) / CAST(min(t.n) AS DOUBLE), 6) AS type_token_ratio
      FROM c JOIN t USING (source)
      GROUP BY c.source ORDER BY c.source"""))

  /** DSIR-style importance log-ratio of every doc against a TARGET
    * domain (here: the 'wiki' source slice) vs the raw corpus. */
  private val q102 = Entry(
    "q102_dsir_logratio",
    (s, d) => {
      val docs = Tables.documents(s, d)
      graft.ops.TextAnalysis
        .dsirLogRatio(docs, "doc_id", "text",
          docs.where(col("source") === "wiki"), "text")
        .orderBy("doc_id")
    },
    Some("""
      WITH tgt AS (
        SELECT unnest(string_split(text, ' ')) AS term
        FROM documents WHERE source = 'wiki'),
      tv AS (SELECT term, count(*) AS tc FROM tgt GROUP BY 1),
      tt AS (SELECT CAST(sum(tc) AS BIGINT) AS tn, count(*) AS tvs FROM tv),
      raw AS (
        SELECT unnest(string_split(text, ' ')) AS term FROM documents),
      rv AS (SELECT term, count(*) AS rc FROM raw GROUP BY 1),
      rt AS (SELECT CAST(sum(rc) AS BIGINT) AS rn, count(*) AS rvs FROM rv),
      toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents),
      sc AS (
        SELECT toks.doc_id,
               ln((COALESCE(tv.tc, 0) + 1.0) / (tt.tn + 1.0 * (tt.tvs + 1)))
             - ln((COALESCE(rv.rc, 0) + 1.0) / (rt.rn + 1.0 * (rt.rvs + 1)))
                 AS d
        FROM toks
        LEFT JOIN tv USING (term)
        LEFT JOIN rv USING (term), tt, rt)
      SELECT doc_id, count(*) AS n_tokens,
             round(sum(d), 6) AS log_ratio
      FROM sc GROUP BY doc_id ORDER BY doc_id"""))

  /** Embedding-centroid drift between two corpus halves — the
    * vector-space twin of the scalar drift monitor (q09). */
  private val q103 = Entry(
    "q103_embedding_drift",
    (s, d) => {
      val e = Tables.embeddings(s, d)
      graft.ops.Features
        .embeddingDrift(e.where(col("vec_id") < 250),
          e.where(col("vec_id") >= 250))
        .select(r6(col("centroid_cosine")).as("centroid_cosine"),
          r6(col("centroid_l2")).as("centroid_l2"),
          r6(col("max_dim_shift")).as("max_dim_shift"))
    },
    Some("""
      WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      ma AS (
        SELECT i, avg(v[i]) AS m
        FROM e, range(1, 65) t(i) WHERE vec_id < 250 GROUP BY i),
      mb AS (
        SELECT i, avg(v[i]) AS m
        FROM e, range(1, 65) t(i) WHERE vec_id >= 250 GROUP BY i),
      j AS (SELECT ma.m AS x, mb.m AS y FROM ma JOIN mb USING (i))
      SELECT round(sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))), 6)
               AS centroid_cosine,
             round(sqrt(sum((x - y) * (x - y))), 6) AS centroid_l2,
             round(max(abs(x - y)), 6) AS max_dim_shift
      FROM j"""))

  /** Contrastive hard negatives: top-3 most similar embeddings with a
    * DIFFERENT label for each of 10 query vectors. */
  private val q104 = Entry(
    "q104_hard_negatives",
    (s, d) => {
      val e = Tables.embeddings(s, d)
      graft.ops.Similarity
        .hardNegatives(e, e.where(col("vec_id") < 10), k = 3)
        .select(col("query_id"), col("rnk").cast("long").as("rnk"),
          col("nbr_id"), col("nbr_label"), r6(col("cos")).as("cos"))
        .orderBy("query_id", "rnk")
    },
    Some("""
      WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                    CAST(embedding AS DOUBLE[]))) AS nrm
        FROM embeddings),
      sc AS (
        SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
               c.label AS nbr_label,
               list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
        FROM e q JOIN e c
          ON q.vec_id <> c.vec_id
         AND (q.label IS DISTINCT FROM c.label)
        WHERE q.vec_id < 10),
      r AS (
        SELECT query_id, nbr_id, nbr_label, cos,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, nbr_id ASC) AS rnk
        FROM sc)
      SELECT query_id, rnk, nbr_id, nbr_label, round(cos, 6) AS cos
      FROM r WHERE rnk <= 3 ORDER BY query_id, rnk"""))

  /** Robust MAD-based outlier profile on order totals — the
    * median-anchored twin of the mean±kσ check (q52). */
  private val q105 = Entry(
    "q105_mad_outliers",
    (s, d) =>
      AnalysisPlanner.madOutliers(Tables.orders(s, d), "o_totalprice")
        .select(r6(col("median")).as("median"), r6(col("mad")).as("mad"),
          r6(col("threshold")).as("threshold"), col("n"),
          col("n_outliers"), r6(col("outlier_rate")).as("outlier_rate")),
    Some("""
      WITH m AS (
        SELECT quantile_cont(o_totalprice, 0.5) AS med FROM orders),
      dv AS (
        SELECT quantile_cont(abs(o_totalprice - m.med), 0.5) AS mad
        FROM orders, m)
      SELECT round(min(m.med), 6) AS median,
             round(min(dv.mad), 6) AS mad,
             round(min(3.0 * 1.4826 * dv.mad), 6) AS threshold,
             count(*) AS n,
             CAST(sum(CASE WHEN abs(o_totalprice - m.med)
                                > 3.0 * 1.4826 * dv.mad
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
             round(sum(CASE WHEN abs(o_totalprice - m.med)
                                 > 3.0 * 1.4826 * dv.mad
                            THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 6)
               AS outlier_rate
      FROM orders, m, dv"""))

  /** Per-user trailing-7 rolling correlation between event value and
    * event time — the "is the relationship drifting" series monitor. */
  private val q106 = Entry(
    "q106_rolling_corr",
    (s, d) =>
      graft.ops.TimeSeries
        .rollingCorrelation(
          Tables.events(s, d)
            .withColumn("t_sec", unix_micros(col("ts")) / lit(1000000.0)),
          Seq("user_id"), "ts", "value", "t_sec", window = 7,
          tieCols = Seq("event_id"))
        .select(col("event_id"), r6(col("roll_corr")).as("roll_corr"))
        .orderBy("event_id"),
    Some("""
      SELECT event_id,
             round(corr("value", epoch(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS roll_corr
      FROM events ORDER BY event_id"""))

  /** Per-user EWMA (span 5) of event values — sequential per-entity
    * fold kernel; oracle replays the closed-form expansion. */
  private val q107 = Entry(
    "q107_ewma",
    (s, d) =>
      graft.ops.TimeSeries
        .ewma(Tables.events(s, d), Seq("user_id"), "ts", "value",
          span = 5, tieCols = Seq("event_id"))
        .select(col("event_id"), r6(col("ewma")).as("ewma"))
        .orderBy("event_id"),
    Some("""
      WITH s AS (
        SELECT user_id, event_id, "value",
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events),
      p AS (
        SELECT a.user_id, a.event_id, a.rn AS t, b.rn AS i,
               b."value" AS x
        FROM s a JOIN s b ON a.user_id = b.user_id AND b.rn <= a.rn),
      e AS (
        SELECT user_id, event_id,
               sum(x * CASE WHEN i = 1 THEN power(2.0/3.0, t - 1)
                            ELSE (1.0/3.0) * power(2.0/3.0, t - i) END)
                 AS ewma
        FROM p GROUP BY user_id, event_id)
      SELECT event_id, round(ewma, 6) AS ewma FROM e ORDER BY event_id"""))

  /** Per-priority OLS trend of order totals over order date — slope /
    * intercept / r² from one sufficient-statistics aggregation. */
  private val q108 = Entry(
    "q108_group_ols",
    (s, d) =>
      AnalysisPlanner
        .groupOls(
          Tables.orders(s, d).withColumn("day",
            datediff(col("o_orderdate"), to_date(lit("1970-01-01")))),
          Seq("o_orderpriority"), "day", "o_totalprice")
        .select(col("o_orderpriority"), col("n"),
          r6(col("slope")).as("slope"),
          r6(col("intercept")).as("intercept"), r6(col("r2")).as("r2"))
        .orderBy("o_orderpriority"),
    Some("""
      WITH s AS (
        SELECT o_orderpriority,
               count(*) AS n,
               sum(CAST(date_diff('day', DATE '1970-01-01', o_orderdate)
                   AS DOUBLE)) AS sx,
               sum(o_totalprice) AS sy,
               sum(CAST(date_diff('day', DATE '1970-01-01', o_orderdate)
                   AS DOUBLE) * o_totalprice) AS sxy,
               sum(CAST(date_diff('day', DATE '1970-01-01', o_orderdate)
                   AS DOUBLE)
                 * CAST(date_diff('day', DATE '1970-01-01', o_orderdate)
                   AS DOUBLE)) AS sxx,
               sum(o_totalprice * o_totalprice) AS syy
        FROM orders GROUP BY o_orderpriority),
      f AS (
        SELECT o_orderpriority, n,
               (sxy - sx * sy / n) / (sxx - sx * sx / n) AS slope,
               (sxy - sx * sy / n) AS cxy,
               (sxx - sx * sx / n) AS vx,
               (syy - sy * sy / n) AS vy,
               sx, sy
        FROM s)
      SELECT o_orderpriority, n,
             round(slope, 6) AS slope,
             round((sy - slope * sx) / n, 6) AS intercept,
             round(cxy * cxy / (vx * vy), 6) AS r2
      FROM f ORDER BY o_orderpriority"""))

  /** Null imputation: median fill on a numeric column, mode fill on a
    * categorical one (nulls planted deterministically). */
  private val q109 = Entry(
    "q109_impute",
    (s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("value",
          when(col("event_id") % 7 === 0, lit(null).cast("double"))
            .otherwise(col("value")))
        .withColumn("etype",
          when(col("event_id") % 11 === 0, lit(null).cast("string"))
            .otherwise(col("event_type")))
      graft.ops.Features
        .impute(ev, Map("value" -> "median", "etype" -> "mode"))
        .where(col("event_id") % 7 === 0 || col("event_id") % 11 === 0)
        .select(col("event_id"), r6(col("value")).as("value"), col("etype"))
        .orderBy("event_id")
    },
    Some("""
      WITH ev AS (
        SELECT event_id,
               CASE WHEN event_id % 7 = 0 THEN NULL ELSE "value" END AS v,
               CASE WHEN event_id % 11 = 0 THEN NULL
                    ELSE event_type END AS etype
        FROM events),
      med AS (SELECT quantile_cont(v, 0.5) AS m FROM ev),
      md AS (
        SELECT etype AS mo FROM ev WHERE etype IS NOT NULL
        GROUP BY etype ORDER BY count(*) DESC, etype ASC LIMIT 1)
      SELECT event_id,
             round(COALESCE(v, med.m), 6) AS "value",
             COALESCE(etype, md.mo) AS etype
      FROM ev, med, md
      WHERE event_id % 7 = 0 OR event_id % 11 = 0
      ORDER BY event_id"""))

  /** Leave-one-out smoothed target encoding of market segment against
    * account balance — the leakage-guarded categorical feature. */
  private val q110 = Entry(
    "q110_target_encode",
    (s, d) =>
      graft.ops.Features
        .targetEncode(Tables.customer(s, d), "c_mktsegment", "c_acctbal",
          alpha = 10.0, leaveOneOut = true)
        .select(col("c_custkey"), r6(col("target_enc")).as("target_enc"))
        .orderBy("c_custkey"),
    Some("""
      WITH g AS (SELECT avg(c_acctbal) AS gm FROM customer),
      c AS (SELECT c_mktsegment, sum(c_acctbal) AS s, count(*) AS n
            FROM customer GROUP BY 1)
      SELECT c_custkey,
             round(((c.s - c_acctbal) + 10.0 * g.gm) / ((c.n - 1) + 10.0), 6)
               AS target_enc
      FROM customer JOIN c USING (c_mktsegment), g
      ORDER BY c_custkey"""))

  /** Probability-density histogram (the reference Distribution's
    * 'density' output): per-bucket n/(N·binwidth), integrates to 1. */
  private val q111 = Entry(
    "q111_density",
    (s, d) =>
      AnalysisPlanner
        .density(Tables.lineitem(s, d), "l_extendedprice", 20)
        .select(col("bucket"), col("n"), r6(col("density")).as("density"))
        .orderBy("bucket"),
    Some("""
      WITH b AS (SELECT min(l_extendedprice) AS lo,
                        max(l_extendedprice) AS hi,
                        count(*) AS tn
                 FROM lineitem),
      h AS (
        SELECT LEAST(CAST(FLOOR(((l_extendedprice - lo) / (hi - lo)) * 20)
                 AS BIGINT), 19) AS bucket,
               count(*) AS n
        FROM lineitem, b GROUP BY 1)
      SELECT bucket, n,
             round(n / (b.tn * ((b.hi - b.lo) / 20.0)), 6) AS density
      FROM h, b ORDER BY bucket"""))

  /** Interpolated bigram-LM scoring against the wiki slice — catches
    * word-salad that a unigram model (q94) cannot. */
  private val q112 = Entry(
    "q112_bigram_loglik",
    (s, d) => {
      val docs = Tables.documents(s, d)
      graft.ops.TextAnalysis
        .bigramLogLikelihood(docs, "doc_id", "text",
          docs.where(col("source") === "wiki"), "text")
        .orderBy("doc_id")
    },
    Some("""
      WITH sh AS (SELECT doc_id, string_split(text, ' ') AS w
                  FROM documents),
      wsh AS (SELECT string_split(text, ' ') AS w FROM documents
              WHERE source = 'wiki'),
      wpos AS (SELECT w, unnest(range(1, len(w))) AS i
               FROM wsh WHERE len(w) >= 2),
      wbi AS (SELECT w[i] AS x, w[i+1] AS y, count(*) AS cxy
              FROM wpos GROUP BY 1, 2),
      wuni AS (SELECT unnest(w) AS t FROM wsh),
      wu AS (SELECT t, count(*) AS ct FROM wuni GROUP BY 1),
      wt AS (SELECT CAST(sum(ct) AS BIGINT) AS n, count(*) AS v FROM wu),
      pos AS (SELECT doc_id, w, unnest(range(1, len(w))) AS i
              FROM sh WHERE len(w) >= 2),
      bg AS (SELECT doc_id, w[i] AS x, w[i+1] AS y FROM pos),
      sc AS (
        SELECT bg.doc_id,
               ln(0.7 * (CASE WHEN cx.ct IS NOT NULL AND wbi.cxy IS NOT NULL
                              THEN wbi.cxy / CAST(cx.ct AS DOUBLE)
                              ELSE 0.0 END)
                + 0.3 * ((COALESCE(cy.ct, 0) + 1.0)
                         / (wt.n + 1.0 * (wt.v + 1)))) AS lp
        FROM bg
        LEFT JOIN wbi ON bg.x = wbi.x AND bg.y = wbi.y
        LEFT JOIN wu cx ON bg.x = cx.t
        LEFT JOIN wu cy ON bg.y = cy.t, wt)
      SELECT doc_id, count(*) AS n_bigrams,
             round(avg(lp), 6) AS avg_logprob,
             round(exp(-avg(lp)), 6) AS ppl
      FROM sc GROUP BY doc_id ORDER BY doc_id"""))

  /** Ordered signup→view→click→purchase funnel over the event
    * stream: strict sequential conversion semantics. */
  private val q113 = Entry(
    "q113_funnel",
    (s, d) =>
      graft.ops.Behavioral
        .funnel(Tables.events(s, d), "user_id", "ts", "event_type",
          Seq("signup", "view", "click", "purchase"))
        .orderBy("step_idx"),
    Some("""
      WITH s1 AS (
        SELECT user_id, min(ts) AS t FROM events
        WHERE event_type = 'signup' GROUP BY 1),
      s2 AS (
        SELECT e.user_id, min(e.ts) AS t FROM events e
        JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'view' AND e.ts >= s1.t GROUP BY 1),
      s3 AS (
        SELECT e.user_id, min(e.ts) AS t FROM events e
        JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'click' AND e.ts >= s2.t GROUP BY 1),
      s4 AS (
        SELECT e.user_id, min(e.ts) AS t FROM events e
        JOIN s3 ON e.user_id = s3.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= s3.t GROUP BY 1)
      SELECT 1 AS step_idx, 'signup' AS step, count(*) AS n_users FROM s1
      UNION ALL
      SELECT 2, 'view', count(*) FROM s2
      UNION ALL
      SELECT 3, 'click', count(*) FROM s3
      UNION ALL
      SELECT 4, 'purchase', count(*) FROM s4
      ORDER BY step_idx"""))

  /** Weekly cohort retention triangle over the event stream. */
  private val q114 = Entry(
    "q114_cohort_retention",
    (s, d) =>
      graft.ops.Behavioral
        .cohortRetention(Tables.events(s, d), "user_id", "ts", "week")
        .select(col("cohort").cast("date").as("cohort"),
          col("period_offset"), col("n_users"))
        .orderBy("cohort", "period_offset"),
    Some("""
      WITH f AS (
        SELECT user_id, min(date_trunc('week', ts)) AS cohort
        FROM events GROUP BY 1),
      a AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS p FROM events)
      SELECT CAST(f.cohort AS DATE) AS cohort,
             CAST(date_diff('day', f.cohort, a.p) / 7 AS BIGINT)
               AS period_offset,
             count(*) AS n_users
      FROM a JOIN f USING (user_id)
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Binned mutual information between lineitem quantity and price —
    * the nonlinear dependence screen. */
  private val q115 = Entry(
    "q115_mutual_info",
    (s, d) =>
      AnalysisPlanner
        .mutualInformation(Tables.lineitem(s, d), "l_quantity",
          "l_extendedprice", bins = 16)
        .select(r6(col("mi_nats")).as("mi_nats"), col("n"), col("bins")),
    Some("""
      WITH base AS (
        SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
      b AS (SELECT min(x) AS xlo, max(x) AS xhi,
                   min(y) AS ylo, max(y) AS yhi FROM base),
      j AS (
        SELECT LEAST(CAST(FLOOR(((x - xlo) / (xhi - xlo)) * 16) AS BIGINT),
                 15) AS bx,
               LEAST(CAST(FLOOR(((y - ylo) / (yhi - ylo)) * 16) AS BIGINT),
                 15) AS by,
               count(*) AS c
        FROM base, b GROUP BY 1, 2),
      mx AS (SELECT bx, sum(c) AS cx FROM j GROUP BY 1),
      my AS (SELECT by, sum(c) AS cy FROM j GROUP BY 1),
      t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM j)
      SELECT round(sum((j.c / t.n) * ln((j.c * t.n) /
               (CAST(mx.cx AS DOUBLE) * my.cy))), 6) AS mi_nats,
             CAST(min(t.n) AS BIGINT) AS n,
             16 AS bins
      FROM j JOIN mx USING (bx) JOIN my USING (by), t"""))

  /** Ranking-window completeness: NTILE / PERCENT_RANK / CUME_DIST
    * (SURVEY §2.2 window surface, previously untested by any oracle). */
  private val q116 = Entry(
    "q116_window_ranking",
    (s, d) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"),
          ntile(4).over(w).as("quartile"),
          r6(percent_rank().over(w)).as("pct_rank"),
          r6(cume_dist().over(w)).as("cume"))
        .orderBy("c_custkey")
    },
    Some("""
      SELECT c_custkey, c_mktsegment,
             ntile(4) OVER w AS quartile,
             round(percent_rank() OVER w, 6) AS pct_rank,
             round(cume_dist() OVER w, 6) AS cume
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment
                   ORDER BY c_acctbal ASC, c_custkey ASC)
      ORDER BY c_custkey"""))

  /** Scalar-function completeness: INITCAP / SPLIT_PART / CBRT /
    * numeric TRUNC / SIGN / GREATEST / LEAST (validator surface,
    * previously untested by any oracle). Numeric TRUNC is
    * toward-zero truncation in both engines. */
  private val q117 = Entry(
    "q117_scalar_extra",
    (s, d) => {
      val bal = col("c_acctbal")
      Tables.customer(s, d)
        .select(col("c_custkey"),
          initcap(lower(col("c_name"))).as("name_cap"),
          split_part(col("c_name"), lit("#"), lit(2)).as("name_num"),
          r6(cbrt(abs(bal))).as("bal_cbrt"),
          (when(bal >= 0, floor(bal)).otherwise(ceil(bal)))
            .cast("long").as("bal_trunc"),
          signum(bal).cast("int").as("bal_sign"),
          greatest(bal, lit(0.0)).as("bal_pos"),
          least(bal, lit(0.0)).as("bal_neg"),
          r6(sin(bal / 1000.0) + cos(bal / 1000.0)).as("bal_trig"),
          r6(log10(abs(bal) + lit(1.0))).as("bal_log10"),
          pmod(col("c_custkey"), lit(7L)).as("key_mod"),
          r6(pow(abs(bal) + lit(1.0), lit(0.25))).as("bal_pow"),
          substring(col("c_name"), 1, 4).as("name_left"),
          substring(col("c_name"), -3, 3).as("name_right"),
          col("c_name").rlike("#0000").as("name_match"))
        .orderBy("c_custkey")
    },
    Some("""
      SELECT c_custkey,
             array_to_string(list_transform(
               string_split(lower(c_name), ' '),
               w -> upper(w[1]) || w[2:]), ' ') AS name_cap,
             split_part(c_name, '#', 2) AS name_num,
             round(cbrt(abs(c_acctbal)), 6) AS bal_cbrt,
             CAST(trunc(c_acctbal) AS BIGINT) AS bal_trunc,
             CAST(sign(c_acctbal) AS INTEGER) AS bal_sign,
             greatest(c_acctbal, 0.0) AS bal_pos,
             least(c_acctbal, 0.0) AS bal_neg,
             round(sin(c_acctbal / 1000.0) + cos(c_acctbal / 1000.0), 6)
               AS bal_trig,
             round(log10(abs(c_acctbal) + 1.0), 6) AS bal_log10,
             c_custkey % 7 AS key_mod,
             round(power(abs(c_acctbal) + 1.0, 0.25), 6) AS bal_pow,
             left(c_name, 4) AS name_left,
             right(c_name, 3) AS name_right,
             regexp_matches(c_name, '#0000') AS name_match
      FROM customer ORDER BY c_custkey"""))

  /** Linear-time MMD² two-sample test between two embedding halves —
    * distribution-level shift detection (complement of the centroid
    * drift q103, which only sees mean movement). */
  private val q118 = Entry(
    "q118_embedding_mmd",
    (s, d) => {
      val e = Tables.embeddings(s, d)
      graft.ops.Features
        .embeddingMmd(e.where(col("vec_id") < 250),
          e.where(col("vec_id") >= 250), sigma = 1.0, buckets = 8)
        .select(r6(col("mmd2")).as("mmd2"), col("n_pairs"))
    },
    Some("""
      WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               ((('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT
                 % 1048576) % 8) AS bkt
        FROM embeddings),
      ra AS (
        SELECT bkt, v,
               row_number() OVER (PARTITION BY bkt ORDER BY vec_id) - 1
                 AS rn
        FROM e WHERE vec_id < 250),
      rb AS (
        SELECT bkt, v,
               row_number() OVER (PARTITION BY bkt ORDER BY vec_id) - 1
                 AS rn
        FROM e WHERE vec_id >= 250),
      ga AS (
        SELECT bkt, rn // 2 AS blk,
               min(CASE WHEN rn % 2 = 0 THEN v END) AS a1,
               min(CASE WHEN rn % 2 = 1 THEN v END) AS a2
        FROM ra GROUP BY 1, 2),
      gb AS (
        SELECT bkt, rn // 2 AS blk,
               min(CASE WHEN rn % 2 = 0 THEN v END) AS b1,
               min(CASE WHEN rn % 2 = 1 THEN v END) AS b2
        FROM rb GROUP BY 1, 2),
      j AS (
        SELECT a1, a2, b1, b2 FROM ga JOIN gb USING (bkt, blk)
        WHERE a1 IS NOT NULL AND a2 IS NOT NULL
          AND b1 IS NOT NULL AND b2 IS NOT NULL),
      h AS (
        SELECT exp(-list_aggregate(list_transform(list_zip(a1, a2),
                 p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') / 2.0)
             + exp(-list_aggregate(list_transform(list_zip(b1, b2),
                 p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') / 2.0)
             - exp(-list_aggregate(list_transform(list_zip(a1, b2),
                 p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') / 2.0)
             - exp(-list_aggregate(list_transform(list_zip(a2, b1),
                 p -> (p[1]-p[2])*(p[1]-p[2])), 'sum') / 2.0) AS hv
        FROM j)
      SELECT round(avg(hv), 6) AS mmd2, count(*) AS n_pairs FROM h"""))

  /** GROUPED exact percentiles — exercises the per-group bucketed
    * prefix-sum path (every prior percentile oracle was ungrouped). */
  private val q119 = Entry(
    "q119_grouped_percentiles",
    (s, d) =>
      AnalysisPlanner
        .exactPercentiles(Tables.lineitem(s, d), "l_extendedprice",
          Seq("p50" -> 0.5, "p90" -> 0.9), Seq("l_returnflag"))
        .select(col("l_returnflag"), r6(col("p50")).as("p50"),
          r6(col("p90")).as("p90"))
        .orderBy("l_returnflag"),
    Some("""
      SELECT l_returnflag,
             round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
             round(quantile_cont(l_extendedprice, 0.9), 6) AS p90
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** First-order Markov transition matrix over per-user event
    * sequences — the behavioral fingerprint. */
  private val q120 = Entry(
    "q120_event_transitions",
    (s, d) =>
      graft.ops.Behavioral
        .eventTransitions(Tables.events(s, d), "user_id", "ts",
          "event_type", tieCols = Seq("event_id"))
        .select(col("from_type"), col("to_type"), col("n"),
          r6(col("p")).as("p"))
        .orderBy("from_type", "to_type"),
    Some("""
      WITH s AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events),
      c AS (
        SELECT event_type AS from_type, nxt AS to_type, count(*) AS n
        FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2),
      t AS (SELECT from_type, sum(n) AS tot FROM c GROUP BY 1)
      SELECT c.from_type, c.to_type, c.n,
             round(c.n / t.tot, 6) AS p
      FROM c JOIN t USING (from_type)
      ORDER BY from_type, to_type"""))

  /** Per-user inter-arrival cadence profile (gap stats in seconds). */
  private val q121 = Entry(
    "q121_inter_arrival",
    (s, d) =>
      graft.ops.Behavioral
        .interArrival(
          Tables.events(s, d)
            .withColumn("t_sec", unix_micros(col("ts")) / lit(1000000.0)),
          "user_id", "t_sec", tieCols = Seq("event_id"))
        .select(col("user_id"), col("n_gaps"),
          r6(col("mean_gap")).as("mean_gap"),
          r6(col("min_gap")).as("min_gap"),
          r6(col("max_gap")).as("max_gap"))
        .orderBy("user_id"),
    Some("""
      WITH s AS (
        SELECT user_id,
               epoch(ts) - lag(epoch(ts)) OVER (
                 PARTITION BY user_id ORDER BY epoch(ts), event_id) AS gap
        FROM events)
      SELECT user_id,
             count(gap) AS n_gaps,
             round(avg(gap), 6) AS mean_gap,
             round(min(gap), 6) AS min_gap,
             round(max(gap), 6) AS max_gap
      FROM s GROUP BY user_id ORDER BY user_id"""))

  /** WOE / information value of the embedding norm against label==1 —
    * the tabular feature-relevance diagnostic. */
  private val q122 = Entry(
    "q122_woe_bins",
    (s, d) =>
      graft.ops.Features
        .woeBins(
          Tables.embeddings(s, d)
            .withColumn("nrm",
              graft.functions.VectorFunctions.norm(col("embedding")))
            .withColumn("is_one", (col("label") === 1).cast("int")),
          "nrm", "is_one", bins = 8)
        .select(col("bucket"), col("n_good"), col("n_bad"),
          r6(col("woe")).as("woe"), r6(col("iv_term")).as("iv_term"))
        .orderBy("bucket"),
    Some("""
      WITH e AS (
        SELECT sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                 CAST(embedding AS DOUBLE[]))) AS nrm,
               CASE WHEN label = 1 THEN 1 ELSE 0 END AS y
        FROM embeddings),
      b AS (SELECT min(nrm) AS lo, max(nrm) AS hi FROM e),
      binned AS (
        SELECT LEAST(CAST(FLOOR(((nrm - lo) / (hi - lo)) * 8) AS BIGINT),
                 7) AS bucket,
               CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_good,
               CAST(sum(CASE WHEN y <> 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_bad
        FROM e, b GROUP BY 1),
      t AS (SELECT sum(n_good) AS tg, sum(n_bad) AS tb, count(*) AS nb
            FROM binned),
      w AS (
        SELECT bucket, n_good, n_bad,
               (n_good + 0.5) / (t.tg + 0.5 * t.nb) AS pg,
               (n_bad + 0.5) / (t.tb + 0.5 * t.nb) AS pb
        FROM binned, t)
      SELECT bucket, n_good, n_bad,
             round(ln(pg / pb), 6) AS woe,
             round((pg - pb) * ln(pg / pb), 6) AS iv_term
      FROM w ORDER BY bucket"""))

  /** Week-over-week PSI drift series on event values — the scheduled
    * per-feature stability monitor. */
  private val q123 = Entry(
    "q123_psi_over_time",
    (s, d) =>
      AnalysisPlanner
        .psiOverTime(Tables.events(s, d), "ts", "value",
          granularity = "week", bins = 10)
        .select(col("period").cast("date").as("period"),
          r6(col("psi")).as("psi"), col("n_cur"), col("n_prev"))
        .orderBy("period"),
    Some("""
      WITH e AS (SELECT date_trunc('week', ts) AS p, "value" AS x
                 FROM events WHERE "value" IS NOT NULL),
      b AS (SELECT min(x) AS lo, max(x) AS hi FROM e),
      binned AS (
        SELECT p, LEAST(CAST(FLOOR(((x - lo) / (hi - lo)) * 10) AS BIGINT),
                 9) AS bucket,
               count(*) AS c
        FROM e, b GROUP BY 1, 2),
      tot AS (SELECT p, CAST(sum(c) AS BIGINT) AS tot FROM binned
              GROUP BY 1),
      grid AS (
        SELECT tot.p, tot.tot, g.bucket,
               (COALESCE(binned.c, 0) + 0.5) / (tot.tot + 0.5 * 10)
                 AS prob
        FROM tot
        CROSS JOIN (SELECT unnest(range(0, 10)) AS bucket) g
        LEFT JOIN binned ON binned.p = tot.p AND binned.bucket = g.bucket),
      j AS (
        SELECT cur.p AS period, cur.prob AS pc, prv.prob AS pp,
               cur.tot AS n_cur, prv.tot AS n_prev
        FROM grid cur
        JOIN grid prv ON prv.p + INTERVAL 7 DAY = cur.p
                     AND prv.bucket = cur.bucket)
      SELECT CAST(period AS DATE) AS period,
             round(sum((pc - pp) * ln(pc / pp)), 6) AS psi,
             CAST(min(n_cur) AS BIGINT) AS n_cur,
             CAST(min(n_prev) AS BIGINT) AS n_prev
      FROM j GROUP BY period ORDER BY period"""))

  /** Audio chunk planning over document payloads modeled as PCM16
    * mono 16 kHz — 5 ms windows with 1 ms overlap, exact byte ranges. */
  private val q124 = Entry(
    "q124_audio_chunk_plan",
    (s, d) =>
      graft.ops.Multimodal
        .audioChunkPlan(
          Tables.documents(s, d)
            .where(col("doc_id") < 50)
            .select(col("doc_id"), col("n_chars").as("size_bytes")),
          "doc_id", "size_bytes", sampleRate = 16000,
          bytesPerSample = 2, channels = 1,
          chunkSeconds = 0.005, overlapSeconds = 0.001)
        .select(col("doc_id"), col("chunk_idx"), col("start_sample"),
          col("n_samples"), col("start_byte"), col("n_bytes"),
          r6(col("start_sec")).as("start_sec"),
          r6(col("end_sec")).as("end_sec"))
        .orderBy("doc_id", "chunk_idx"),
    Some("""
      WITH d AS (
        SELECT doc_id, CAST(n_chars // 2 AS BIGINT) AS total
        FROM documents WHERE doc_id < 50),
      n AS (
        SELECT doc_id, total,
               CASE WHEN total <= 0 THEN 0
                    WHEN total <= 80 THEN 1
                    ELSE CAST(CEIL((total - 80) / 64.0) AS BIGINT) + 1
               END AS nch
        FROM d),
      c AS (
        SELECT doc_id, total, unnest(range(0, nch)) AS chunk_idx
        FROM n WHERE nch > 0),
      r AS (
        SELECT doc_id, chunk_idx,
               chunk_idx * 64 AS start_sample,
               LEAST(80, total - chunk_idx * 64) AS n_samples
        FROM c)
      SELECT doc_id, chunk_idx, start_sample, n_samples,
             start_sample * 2 AS start_byte,
             n_samples * 2 AS n_bytes,
             round(start_sample / 16000.0, 6) AS start_sec,
             round((start_sample + n_samples) / 16000.0, 6) AS end_sec
      FROM r ORDER BY doc_id, chunk_idx"""))

  /** SCD2 versioned-dimension maintenance: customers start as one open
    * version, a batch changes every third balance — changed keys close
    * and re-open, unchanged keys stay single-version. */
  private val q125 = Entry(
    "q125_scd2_apply",
    (s, d) => {
      val cust = Tables.customer(s, d)
      val t0 = to_timestamp(lit("2024-01-01 00:00:00"))
      val t1 = to_timestamp(lit("2024-02-01 00:00:00"))
      val history = cust.select(col("c_custkey"), col("c_acctbal"),
        t0.as("valid_from"),
        lit(null).cast("timestamp").as("valid_to"))
      val updates = cust.select(col("c_custkey"),
        when(col("c_custkey") % 3 === 0, col("c_acctbal") + 100.0)
          .otherwise(col("c_acctbal")).as("c_acctbal"),
        t1.as("ts"))
      graft.etl.Scd
        .scd2Apply(history, updates, Seq("c_custkey"), Seq("c_acctbal"),
          "ts")
        .select(col("c_custkey"), col("c_acctbal"),
          col("valid_from").cast("date").as("valid_from"),
          col("valid_to").cast("date").as("valid_to"))
        .orderBy(col("c_custkey"), col("valid_from"))
    },
    Some("""
      WITH h AS (
        SELECT c_custkey, c_acctbal,
               TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
               CAST(NULL AS TIMESTAMP) AS valid_to
        FROM customer),
      u AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 100.0
                    ELSE c_acctbal END AS nb,
               TIMESTAMP '2024-02-01 00:00:00' AS uts
        FROM customer),
      j AS (SELECT h.*, u.nb, u.uts FROM h JOIN u USING (c_custkey)),
      kept AS (
        SELECT c_custkey, c_acctbal, valid_from,
               CASE WHEN nb IS DISTINCT FROM c_acctbal THEN uts
                    ELSE valid_to END AS valid_to
        FROM j),
      ins AS (
        SELECT c_custkey, nb AS c_acctbal, uts AS valid_from,
               CAST(NULL AS TIMESTAMP) AS valid_to
        FROM j WHERE nb IS DISTINCT FROM c_acctbal)
      SELECT c_custkey, c_acctbal,
             CAST(valid_from AS DATE) AS valid_from,
             CAST(valid_to AS DATE) AS valid_to
      FROM (SELECT * FROM kept UNION ALL SELECT * FROM ins)
      ORDER BY c_custkey, valid_from"""))

  /** Point-in-time dimension join: each event reads the customer
    * balance version valid AT ITS OWN timestamp — versions flip
    * mid-month, so events straddle the boundary. */
  private val q126 = Entry(
    "q126_pit_dimension_join",
    (s, d) => {
      val cust = Tables.customer(s, d).where(col("c_custkey") < 150)
      val t0 = to_timestamp(lit("2024-01-01 00:00:00"))
      val t1 = to_timestamp(lit("2024-01-15 00:00:00"))
      val history =
        cust.select(col("c_custkey").as("user_id"),
          col("c_acctbal").as("bal"), t0.as("valid_from"),
          when(col("c_custkey") % 3 === 0, t1)
            .otherwise(lit(null).cast("timestamp")).as("valid_to"))
        .unionByName(
          cust.where(col("c_custkey") % 3 === 0)
            .select(col("c_custkey").as("user_id"),
              (col("c_acctbal") + 100.0).as("bal"), t1.as("valid_from"),
              lit(null).cast("timestamp").as("valid_to")))
      graft.etl.Scd
        .pitJoin(Tables.events(s, d), history, Seq("user_id"), "ts")
        .select(col("event_id"), col("user_id"), col("bal"))
        .orderBy("event_id")
    },
    Some("""
      WITH c AS (SELECT * FROM customer WHERE c_custkey < 150),
      h AS (
        SELECT c_custkey AS user_id, c_acctbal AS bal,
               TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
               CASE WHEN c_custkey % 3 = 0
                    THEN TIMESTAMP '2024-01-15 00:00:00' END AS valid_to
        FROM c
        UNION ALL
        SELECT c_custkey, c_acctbal + 100.0,
               TIMESTAMP '2024-01-15 00:00:00',
               CAST(NULL AS TIMESTAMP)
        FROM c WHERE c_custkey % 3 = 0)
      SELECT e.event_id, e.user_id, h.bal
      FROM events e JOIN h
        ON e.user_id = h.user_id
       AND h.valid_from <= e.ts
       AND (h.valid_to IS NULL OR e.ts < h.valid_to)
      ORDER BY e.event_id"""))

  /** Referential integrity: lineitems referencing orders, with planted
    * orphans (order keys shifted out of range for every 11th row). */
  private val q127 = Entry(
    "q127_referential_check",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .withColumn("ok",
          when(col("l_linenumber") % 11 === 0,
            col("l_orderkey") + 10000000L)
            .otherwise(col("l_orderkey")))
      AnalysisPlanner
        .referentialCheck(li, Tables.orders(s, d), Seq("ok"),
          Seq("o_orderkey"))
        .select(col("n_child"), col("n_null_keys"), col("n_orphans"),
          r6(col("orphan_rate")).as("orphan_rate"))
    },
    Some("""
      WITH li AS (
        SELECT CASE WHEN l_linenumber % 11 = 0
                    THEN l_orderkey + 10000000 ELSE l_orderkey END AS ok
        FROM lineitem),
      o AS (SELECT DISTINCT o_orderkey FROM orders),
      orph AS (
        SELECT count(*) AS n_orphans FROM li
        WHERE ok IS NOT NULL
          AND ok NOT IN (SELECT o_orderkey FROM o)),
      t AS (SELECT count(*) AS n_child,
                   CAST(sum(CASE WHEN ok IS NULL THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_null_keys
            FROM li)
      SELECT t.n_child, t.n_null_keys, orph.n_orphans,
             round(orph.n_orphans /
               CAST(GREATEST(t.n_child - t.n_null_keys, 1) AS DOUBLE), 6)
               AS orphan_rate
      FROM t, orph"""))

  /** Pre-flight join fan-out: what lineitem ⋈ orders will produce,
    * from key-count frames only — the accidental-explosion guard. */
  private val q128 = Entry(
    "q128_join_fanout",
    (s, d) =>
      graft.ops.SkewAware
        .joinFanout(
          Tables.lineitem(s, d).select(col("l_orderkey").as("k")),
          Tables.orders(s, d).select(col("o_orderkey").as("k")),
          Seq("k"))
        .select(col("n_matched_keys"), col("est_rows"),
          col("max_key_rows"), r6(col("max_key_share")).as("max_key_share")),
    Some("""
      WITH ca AS (SELECT l_orderkey AS k, count(*) AS c
                  FROM lineitem GROUP BY 1),
      cb AS (SELECT o_orderkey AS k, count(*) AS c FROM orders GROUP BY 1),
      j AS (SELECT ca.c * cb.c AS p FROM ca JOIN cb USING (k))
      SELECT count(*) AS n_matched_keys,
             CAST(COALESCE(sum(p), 0) AS BIGINT) AS est_rows,
             CAST(COALESCE(max(p), 0) AS BIGINT) AS max_key_rows,
             round(max(p) / CAST(sum(p) AS DOUBLE), 6) AS max_key_share
      FROM j"""))

  /** PERCENTILE_DISC semantics (actual data values, no interpolation),
    * grouped — completes the validator's CONT/DISC percentile pair. */
  private val q129 = Entry(
    "q129_percentile_disc",
    (s, d) =>
      AnalysisPlanner
        .exactPercentilesDisc(Tables.lineitem(s, d), "l_extendedprice",
          Seq("p25" -> 0.25, "p50" -> 0.5, "p99" -> 0.99),
          Seq("l_returnflag"))
        .select(col("l_returnflag"), r6(col("p25")).as("p25"),
          r6(col("p50")).as("p50"), r6(col("p99")).as("p99"))
        .orderBy("l_returnflag"),
    Some("""
      SELECT l_returnflag,
             round(quantile_disc(l_extendedprice, 0.25), 6) AS p25,
             round(quantile_disc(l_extendedprice, 0.5), 6) AS p50,
             round(quantile_disc(l_extendedprice, 0.99), 6) AS p99
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** BM25 from a PERSISTED inverted index — the amortized q84: the
    * index is built once (fingerprint-keyed, like the q98 cluster
    * store); the query reads only its terms' postings (term predicate
    * pushed to the parquet scan). Results identical to q84. */
  private val q130 = Entry(
    "q130_bm25_from_index",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val fp = docs.agg(count(lit(1)),
        expr("bit_xor(xxhash64(doc_id))"),
        expr("bit_xor(xxhash64(text))")).head()
      val tag = java.lang.Long.toHexString(
        fp.getLong(0) ^ fp.getLong(1) ^ fp.getLong(2))
      val path = s"${sys.props("java.io.tmpdir")}/graft_search_index/$tag"
      if (!new java.io.File(s"$path/stats/_SUCCESS").exists())
        graft.ops.TextAnalysis.writeSearchIndex(docs, "doc_id", "text",
          path)
      graft.ops.TextAnalysis
        .searchIndex(s, path, Seq("hash", "join", "scan"), k = 10,
          idCol = "doc_id")
        .select(col("doc_id"), col("bm25"))
    },
    Some("""
      WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS w,
               CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl
        FROM documents),
      st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM d),
      tf AS (
        SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf,
               any_value(dl) AS dl
        FROM (SELECT doc_id, dl, unnest(w) AS term FROM d)
        WHERE term IN ('hash', 'join', 'scan')
        GROUP BY doc_id, term),
      dfr AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf
              GROUP BY term),
      sc AS (
        SELECT doc_id,
               round(sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                 * tf * (1.2 + 1)
                 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 6) AS bm25
        FROM tf JOIN dfr USING (term), st
        GROUP BY doc_id)
      SELECT doc_id, bm25 FROM sc ORDER BY bm25 DESC, doc_id LIMIT 10"""))

  /** Per-source document cap (RefinedWeb-style per-domain curation):
    * keep the 10 smallest-hash docs per source, deterministically.
    * Only over-cap keys' rows pay the rank window. */
  private val q131 = Entry(
    "q131_per_key_cap",
    (s, d) =>
      graft.ops.Sampling
        .perKeyCap(Tables.documents(s, d).select("doc_id", "source"),
          Seq("source"), 10, Seq("doc_id"))
        .orderBy("source", "doc_id"),
    Some("""
      SELECT doc_id, source FROM (
        SELECT doc_id, source,
               row_number() OVER (
                 PARTITION BY source
                 ORDER BY (('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1048576),
                          doc_id) AS rn
        FROM documents) t
      WHERE rn <= 10 ORDER BY source, doc_id"""))

  /** Two-proportion z-test on conversion rate (A/B bucketed by
    * user_id parity) — the experiment-readout statistic. */
  private val q132 = Entry(
    "q132_ztest_proportions",
    (s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("bucket", pmod(col("user_id"), lit(2)).cast("string"))
        .withColumn("converted",
          (col("event_type") === "purchase").cast("int"))
      AnalysisPlanner
        .statTest(ev,
          StatTest("converted", "ztest_proportions", "bucket", "0", "1"))
        .select(col("n_c"), col("n_t"), col("x_c"), col("x_t"),
          r6(col("p_c")).as("p_c"), r6(col("p_t")).as("p_t"),
          r6(col("z_stat")).as("z_stat"))
    },
    Some("""
      WITH g AS (
        SELECT count(CASE WHEN user_id % 2 = 0 THEN 1 END) AS n_c,
               count(CASE WHEN user_id % 2 = 1 THEN 1 END) AS n_t,
               CAST(sum(CASE WHEN user_id % 2 = 0 AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS x_c,
               CAST(sum(CASE WHEN user_id % 2 = 1 AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS x_t
        FROM events)
      SELECT n_c, n_t, x_c, x_t,
             round(x_c / CAST(n_c AS DOUBLE), 6) AS p_c,
             round(x_t / CAST(n_t AS DOUBLE), 6) AS p_t,
             round((x_t / CAST(n_t AS DOUBLE) - x_c / CAST(n_c AS DOUBLE)) /
                   sqrt(((x_c + x_t) / CAST(n_c + n_t AS DOUBLE)) *
                        (1 - (x_c + x_t) / CAST(n_c + n_t AS DOUBLE)) *
                        (1.0 / n_c + 1.0 / n_t)), 6) AS z_stat
      FROM g"""))

  /** Last-touch conversion attribution: every purchase credited to the
    * user's most recent preceding non-purchase event type. */
  private val q133 = Entry(
    "q133_attribution",
    (s, d) =>
      graft.ops.Behavioral
        .attribution(Tables.events(s, d), "user_id", "ts", "event_type",
          "value", "purchase", "last_touch", tieCols = Seq("event_id"))
        .select(col("channel"), col("n_conversions"),
          r6(col("attributed_value")).as("attributed_value"))
        .orderBy("channel"),
    Some("""
      WITH s AS (
        SELECT event_type, "value",
               last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ch
        FROM events)
      SELECT COALESCE(ch, '(none)') AS channel,
             count(*) AS n_conversions,
             round(sum("value"), 6) AS attributed_value
      FROM s WHERE event_type = 'purchase'
      GROUP BY 1 ORDER BY 1"""))

  /** Hour-of-day seasonality profile per event type: count, mean, and
    * multiplicative lift vs the type's overall mean. */
  private val q134 = Entry(
    "q134_seasonality",
    (s, d) =>
      graft.ops.TimeSeries
        .seasonalityProfile(Tables.events(s, d), "ts", "value",
          "event_type")
        .select(col("segment"), col("hod").cast("long").as("hod"),
          col("n"), r6(col("mean_value")).as("mean_value"),
          r6(col("lift")).as("lift"))
        .orderBy("segment", "hod"),
    Some("""
      WITH h AS (
        SELECT event_type AS segment, EXTRACT(hour FROM ts) AS hod,
               count(*) AS n, avg("value") AS mean_value
        FROM events GROUP BY 1, 2),
      o AS (SELECT event_type AS segment, avg("value") AS om
            FROM events GROUP BY 1)
      SELECT segment, hod, n, round(mean_value, 6) AS mean_value,
             round(mean_value / om, 6) AS lift
      FROM h JOIN o USING (segment)
      ORDER BY segment, hod"""))

  /** Gini concentration of revenue over customers — the PrefixSum-
    * ranked inequality diagnostic (no global sort / single-partition
    * window; the oracle's row_number form is algebraically identical
    * because tie groups contribute v·(c·p + c(c+1)/2) either way). */
  private val q135 = Entry(
    "q135_gini_concentration",
    (s, d) =>
      AnalysisPlanner
        .giniConcentration(Tables.orders(s, d), Seq("o_custkey"),
          "o_totalprice")
        .select(col("n_keys"), r6(col("total")).as("total"),
          r6(col("gini")).as("gini")),
    Some("""
      WITH t AS (SELECT o_custkey, sum(o_totalprice) AS x
                 FROM orders GROUP BY 1),
      r AS (SELECT x, row_number() OVER (ORDER BY x) AS i FROM t),
      a AS (SELECT count(*) AS n, sum(x) AS s, sum(i * x) AS si FROM r)
      SELECT n AS n_keys, round(s, 6) AS total,
             round(2.0 * si / (n * s) - (n + 1.0) / n, 6) AS gini
      FROM a"""))

  /** Incremental materialized aggregate: two disjoint event batches
    * folded into a persisted per-key sufficient-statistics store
    * (etl/AggStore), metrics finalized from the STORE alone — the
    * oracle recomputes from the full raw table, proving
    * ingest(b1); ingest(b2) ≡ one aggregation over b1 ∪ b2. */
  private val q136 = Entry(
    "q136_agg_store_incremental",
    (s, d) => {
      val ev = Tables.events(s, d)
      val fp = ev.agg(count(lit(1)),
        expr("bit_xor(xxhash64(event_id))")).head()
      val tag = java.lang.Long.toHexString(fp.getLong(0) ^ fp.getLong(1))
      val base = s"${sys.props("java.io.tmpdir")}/graft_agg_store/$tag"
      val hBase = new org.apache.hadoop.fs.Path(base)
      val hFs = hBase.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (hFs.exists(hBase)) hFs.delete(hBase, true)
      val store = s"$base/store"
      graft.etl.AggStore.ingest(s, store,
        ev.where(pmod(col("event_id"), lit(2)) === 0),
        Seq("event_type"), "value")
      graft.etl.AggStore.ingest(s, store,
        ev.where(pmod(col("event_id"), lit(2)) === 1),
        Seq("event_type"), "value")
      graft.etl.AggStore
        .finalizeStats(graft.etl.AggStore.read(s, store),
          Seq("event_type"))
        .select(col("event_type"), col("n"),
          r6(col("sum")).as("sum_value"), r6(col("mean")).as("mean_value"),
          r6(col("std")).as("std_value"), r6(col("vmin")).as("min_value"),
          r6(col("vmax")).as("max_value"))
        .orderBy("event_type")
    },
    Some("""
      SELECT event_type,
             count("value") AS n,
             round(sum("value"), 6) AS sum_value,
             round(avg("value"), 6) AS mean_value,
             round(stddev_samp("value"), 6) AS std_value,
             round(min("value"), 6) AS min_value,
             round(max("value"), 6) AS max_value
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Embedding-space decontamination: train docs semantically close
    * (cos ≥ 0.35) to any of the last-25 "benchmark" vectors; eval side
    * broadcast, train side map-only. */
  private val q137 = Entry(
    "q137_embedding_decontaminate",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      graft.ops.Dedup
        .embeddingDecontaminate(emb.where(col("vec_id") < 475),
          emb.where(col("vec_id") >= 475), "vec_id", "embedding", 0.35)
        .select(col("train_id"), col("n_eval_hits"),
          r6(col("max_cos")).as("max_cos"), col("worst_eval_id"))
        .orderBy("train_id")
    },
    Some("""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      ev AS (SELECT * FROM e WHERE vec_id >= 475),
      tr AS (SELECT * FROM e WHERE vec_id < 475),
      p AS (
        SELECT tr.vec_id AS train_id, ev.vec_id AS eval_id,
               list_dot_product(tr.v, ev.v) /
               (sqrt(list_dot_product(tr.v, tr.v)) *
                sqrt(list_dot_product(ev.v, ev.v))) AS cos
        FROM tr, ev),
      f AS (SELECT * FROM p WHERE cos >= 0.35),
      m AS (SELECT train_id, count(*) AS n_eval_hits, max(cos) AS mx
            FROM f GROUP BY 1)
      SELECT m.train_id, m.n_eval_hits, round(m.mx, 6) AS max_cos,
             min(f.eval_id) AS worst_eval_id
      FROM m JOIN f ON f.train_id = m.train_id AND f.cos = m.mx
      GROUP BY 1, 2, 3
      ORDER BY m.train_id"""))

  /** Kaplan–Meier time-to-first-big-purchase: per user, days from
    * first activity to the first purchase over 200 (event) or to the
    * last observed day (censored). Distinct-duration sufficient stats
    * + PrefixSum at-risk counts + exp∘Σlog running product — no
    * single-partition window anywhere. */
  private val q138 = Entry(
    "q138_kaplan_meier",
    (s, d) => {
      val ev = Tables.events(s, d)
      val hit = when(col("event_type") === "purchase" &&
        col("value") > 200, col("ts"))
      val surv = ev.groupBy("user_id")
        .agg(min(hit).as("__hit"), min(col("ts")).as("__first"),
          max(col("ts")).as("__last"))
        .select(
          when(col("__hit").isNotNull,
            datediff(to_date(col("__hit")), to_date(col("__first"))))
            .otherwise(
              datediff(to_date(col("__last")), to_date(col("__first"))))
            .as("dur"),
          when(col("__hit").isNotNull, lit(1)).otherwise(lit(0)).as("ev"))
      AnalysisPlanner.kaplanMeier(surv, "dur", "ev")
        .select(col("duration").cast("long").as("duration"),
          col("n_risk"), col("n_event"), r6(col("survival")).as("survival"))
        .orderBy("duration")
    },
    Some("""
      WITH s AS (
        SELECT user_id,
          CASE WHEN min(ts) FILTER (event_type = 'purchase' AND "value" > 200) IS NOT NULL
               THEN datediff('day', min(ts)::DATE,
                 (min(ts) FILTER (event_type = 'purchase' AND "value" > 200))::DATE)
               ELSE datediff('day', min(ts)::DATE, max(ts)::DATE) END AS dur,
          CASE WHEN min(ts) FILTER (event_type = 'purchase' AND "value" > 200) IS NOT NULL
               THEN 1 ELSE 0 END AS ev
        FROM events GROUP BY 1),
      g AS (SELECT dur, sum(ev)::DOUBLE AS dd, count(*)::DOUBLE AS tot
            FROM s GROUP BY 1),
      a AS (SELECT dur, dd,
              (SELECT count(*) FROM s)::DOUBLE - coalesce(sum(tot) OVER
                (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS n_risk
            FROM g),
      e AS (SELECT dur, n_risk, dd,
              exp(sum(ln(1 - dd / n_risk)) OVER (ORDER BY dur)) AS surv
            FROM a WHERE dd > 0)
      SELECT dur::BIGINT AS duration, n_risk::BIGINT AS n_risk,
             dd::BIGINT AS n_event, round(surv, 6) AS survival
      FROM e ORDER BY duration"""))

  /** Single changepoint in daily event revenue — the split minimizing
    * two-segment SSE, scored entirely from bucketed prefix sums over
    * per-day sufficient statistics. */
  private val q139 = Entry(
    "q139_changepoint",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(datediff(to_date(col("ts")), lit(java.sql.Date.valueOf("1970-01-01"))).as("day"))
        .agg(sum("value").as("daily_value"))
      AnalysisPlanner.changepoint(daily, "day", "daily_value")
        .select(col("split_at").cast("long").as("split_day"),
          col("n_left"), col("n_right"),
          r6(col("mean_left")).as("mean_left"),
          r6(col("mean_right")).as("mean_right"),
          // gain ~1e6 arises from ~1e10 cancellations → fp noise ~1e-2;
          // integer grid keeps a 50× margin (r6 flaked on the boundary)
          round(col("gain"), 0).as("gain"))
    },
    Some("""
      WITH dgrp AS (SELECT datediff('day', DATE '1970-01-01', ts::DATE) AS day,
                           sum("value") AS v
                    FROM events GROUP BY 1),
      g AS (SELECT day::DOUBLE AS o, 1.0 AS c, v AS sv, v * v AS q FROM dgrp),
      p AS (SELECT o,
              sum(c) OVER w AS cl, sum(sv) OVER w AS sl, sum(q) OVER w AS ql
            FROM g WINDOW w AS (ORDER BY o)),
      t AS (SELECT count(*)::DOUBLE AS n, sum(sv) AS s, sum(q) AS qq FROM g),
      k AS (SELECT o, cl, sl, n, s,
              (qq - s * s / n) - (ql - sl * sl / cl) -
                ((qq - ql) - (s - sl) * (s - sl) / (n - cl)) AS gain
            FROM p, t WHERE cl >= 1 AND n - cl >= 1)
      SELECT o::BIGINT AS split_day, cl::BIGINT AS n_left,
             (n - cl)::BIGINT AS n_right, round(sl / cl, 6) AS mean_left,
             round((s - sl) / (n - cl), 6) AS mean_right,
             round(gain, 0) AS gain
      FROM k ORDER BY gain DESC, o ASC LIMIT 1"""))

  /** Benford first-digit conformance of order totals: per-digit
    * observed vs log10(1+1/d) expectation plus the corpus chi-square
    * and MAD — the fabricated-data screen as one 9-row frame. */
  private val q140 = Entry(
    "q140_benford_digits",
    (s, d) =>
      AnalysisPlanner.benford(Tables.orders(s, d), "o_totalprice")
        .select(col("digit"), col("n"), r6(col("obs_p")).as("obs_p"),
          r6(col("exp_p")).as("exp_p"), r6(col("chi2")).as("chi2"),
          r6(col("mad")).as("mad"))
        .orderBy("digit"),
    Some("""
      WITH x AS (SELECT abs(o_totalprice) AS v FROM orders
                 WHERE abs(o_totalprice) > 0),
      dg AS (SELECT floor(v / pow(10, floor(log10(v))))::BIGINT AS digit FROM x),
      o AS (SELECT digit, count(*)::DOUBLE AS n FROM dg GROUP BY 1),
      t AS (SELECT sum(n) AS total FROM o),
      e AS (SELECT digit, n, n / total AS obs_p,
                   log10(1 + 1.0 / digit) AS exp_p
            FROM o, t),
      g AS (SELECT sum(pow(obs_p - exp_p, 2) / exp_p * total) AS chi2,
                   avg(abs(obs_p - exp_p)) AS mad
            FROM e, t)
      SELECT digit, n::BIGINT AS n, round(obs_p, 6) AS obs_p,
             round(exp_p, 6) AS exp_p, round(chi2, 6) AS chi2,
             round(mad, 6) AS mad
      FROM e, g ORDER BY digit"""))

  /** Cramér's V association between order status and priority —
    * chi-square over the joint-counts frame (zero cells handled
    * algebraically, no dense grid), normalized to [0, 1]. */
  private val q141 = Entry(
    "q141_cramers_v",
    (s, d) =>
      AnalysisPlanner
        .cramersV(Tables.orders(s, d), "o_orderstatus", "o_orderpriority")
        .select(col("n"), col("n_a"), col("n_b"), col("dof"),
          r6(col("chi2")).as("chi2"), r6(col("cramers_v")).as("cramers_v")),
    Some("""
      WITH j AS (SELECT o_orderstatus AS a, o_orderpriority AS b,
                        count(*)::DOUBLE AS n
                 FROM orders GROUP BY 1, 2),
      ra AS (SELECT a, sum(n) AS na FROM j GROUP BY 1),
      rb AS (SELECT b, sum(n) AS nb FROM j GROUP BY 1),
      t AS (SELECT sum(j.n) AS total, count(DISTINCT j.a)::DOUBLE AS r,
                   count(DISTINCT j.b)::DOUBLE AS c,
                   sum(j.n * j.n / (ra.na * rb.nb)) AS tt
            FROM j JOIN ra USING (a) JOIN rb USING (b))
      SELECT total::BIGINT AS n, r::BIGINT AS n_a, c::BIGINT AS n_b,
             ((r - 1) * (c - 1))::BIGINT AS dof,
             round(total * tt - total, 6) AS chi2,
             round(sqrt((total * tt - total) /
               (total * (least(r, c) - 1))), 6) AS cramers_v
      FROM t"""))

  /** Shared scored-frame for the model-eval queries q142–q145: a
    * deterministic pseudo-model over orders — label correlates with
    * price through an orderkey-mod coin, score is a LINEAR probability
    * (exact cross-engine parity; no transcendental in the rank path). */
  private def scoredOrders(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      when((col("o_orderkey") % 100).cast("double") <
        col("o_totalprice") / 5000.0, lit(1.0)).otherwise(lit(0.0))
        .as("label"),
      (col("o_totalprice") / 600000.0).as("score"))

  private val scoredOrdersSql = """
      sc AS (SELECT CASE WHEN (o_orderkey % 100) < o_totalprice / 5000.0
                         THEN 1.0 ELSE 0.0 END AS y,
                    o_totalprice / 600000.0 AS p
             FROM orders)"""

  /** Binary-classifier eval in one pass: tie-corrected rank AUC plus
    * log-loss and Brier — the ranks come from a prefix sum over the
    * distinct-score frame, exact integer-and-half arithmetic. */
  private val q142 = Entry(
    "q142_roc_auc",
    (s, d) =>
      graft.ops.Evaluation.binaryMetrics(scoredOrders(s, d), "label", "score")
        .select(col("n"), col("n_pos"), col("n_neg"), r6(col("auc")).as("auc"),
          r6(col("log_loss")).as("log_loss"), r6(col("brier")).as("brier")),
    Some(s"""
      WITH $scoredOrdersSql,
      r AS (SELECT y, p, rank() OVER (ORDER BY p) AS rmin,
                   count(*) OVER (PARTITION BY p) AS c
            FROM sc),
      a AS (SELECT count(*)::DOUBLE AS n, sum(y) AS np,
                   sum(CASE WHEN y = 1 THEN rmin + (c - 1) / 2.0 END) AS rpos
            FROM r),
      m AS (SELECT avg(-(y * ln(least(greatest(p, 1e-15), 1 - 1e-15)) +
                     (1 - y) * ln(1 - least(greatest(p, 1e-15), 1 - 1e-15))))
                     AS log_loss,
                   avg(pow(p - y, 2)) AS brier
            FROM sc)
      SELECT n::BIGINT AS n, np::BIGINT AS n_pos, (n - np)::BIGINT AS n_neg,
             round((rpos - np * (np + 1) / 2.0) / (np * (n - np)), 6) AS auc,
             round(log_loss, 6) AS log_loss, round(brier, 6) AS brier
      FROM a, m"""))

  /** Average precision (PR-AUC, step interpolation) — each distinct
    * threshold self-contains its Δrecall·precision term via one
    * descending prefix sum. */
  private val q143 = Entry(
    "q143_pr_auc",
    (s, d) =>
      graft.ops.Evaluation.prAuc(scoredOrders(s, d), "label", "score")
        .select(col("n"), col("n_pos"), col("n_thresholds"),
          r6(col("pr_auc")).as("pr_auc")),
    Some(s"""
      WITH $scoredOrdersSql,
      v AS (SELECT p, sum(y) AS pos, count(*)::DOUBLE AS tot
            FROM sc GROUP BY 1),
      w AS (SELECT pos, tot,
                   coalesce(sum(pos) OVER (ORDER BY p DESC ROWS BETWEEN
                     UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pabove,
                   coalesce(sum(tot) OVER (ORDER BY p DESC ROWS BETWEEN
                     UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tabove
            FROM v),
      t AS (SELECT sum(y) AS pp, count(*)::DOUBLE AS nn FROM sc)
      SELECT nn::BIGINT AS n, pp::BIGINT AS n_pos,
             (SELECT count(*) FROM v) AS n_thresholds,
             round(sum((pos / pp) * ((pabove + pos) / (tabove + tot))), 6)
               AS pr_auc
      FROM w, t GROUP BY nn, pp"""))

  /** Reliability curve: 10 equal-width probability bins, mean predicted
    * vs observed rate per bin, corpus ECE repeated on every row. */
  private val q144 = Entry(
    "q144_calibration",
    (s, d) =>
      graft.ops.Evaluation
        .calibrationCurve(scoredOrders(s, d), "label", "score", 10)
        .select(col("bin"), col("n"), r6(col("mean_score")).as("mean_score"),
          r6(col("mean_label")).as("mean_label"), r6(col("gap")).as("gap"),
          r6(col("ece")).as("ece"))
        .orderBy("bin"),
    Some(s"""
      WITH $scoredOrdersSql,
      b AS (SELECT least(floor(p * 10), 9)::BIGINT AS bin,
                   count(*)::DOUBLE AS n,
                   avg(p) AS mean_score, avg(y) AS mean_label
            FROM sc GROUP BY 1),
      t AS (SELECT sum(n) AS nn FROM b),
      e AS (SELECT sum(n / nn * abs(mean_score - mean_label)) AS ece
            FROM b, t)
      SELECT bin, n::BIGINT AS n, round(mean_score, 6) AS mean_score,
             round(mean_label, 6) AS mean_label,
             round(abs(mean_score - mean_label), 6) AS gap,
             round(ece, 6) AS ece
      FROM b, e ORDER BY bin"""))

  /** Decile lift/gains: score bands assigned per DISTINCT score from
    * strictly-above counts (deterministic under ties, unlike ntile),
    * cumulative gains via a second prefix sum over the 10-row frame. */
  private val q145 = Entry(
    "q145_lift_table",
    (s, d) =>
      graft.ops.Evaluation.liftTable(scoredOrders(s, d), "label", "score", 10)
        .select(col("bucket"), col("n"), col("n_pos"),
          r6(col("rate")).as("rate"), r6(col("lift")).as("lift"),
          r6(col("cum_gain")).as("cum_gain"), r6(col("cum_pct")).as("cum_pct"))
        .orderBy("bucket"),
    Some(s"""
      WITH $scoredOrdersSql,
      v AS (SELECT p, sum(y) AS pos, count(*)::DOUBLE AS tot
            FROM sc GROUP BY 1),
      t AS (SELECT count(*)::DOUBLE AS nn, sum(y) AS pp FROM sc),
      w AS (SELECT pos, tot,
                   coalesce(sum(tot) OVER (ORDER BY p DESC ROWS BETWEEN
                     UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS above
            FROM v),
      b AS (SELECT least(floor(above * 10 / nn), 9)::BIGINT AS bucket,
                   sum(tot) AS n, sum(pos) AS npos
            FROM w, t GROUP BY 1),
      c AS (SELECT bucket, n, npos,
                   coalesce(sum(n) OVER (ORDER BY bucket ROWS BETWEEN
                     UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cn,
                   coalesce(sum(npos) OVER (ORDER BY bucket ROWS BETWEEN
                     UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cp
            FROM b)
      SELECT bucket, n::BIGINT AS n, npos::BIGINT AS n_pos,
             round(npos / n, 6) AS rate,
             round((npos / n) / (pp / nn), 6) AS lift,
             round((cp + npos) / pp, 6) AS cum_gain,
             round((cn + n) / nn, 6) AS cum_pct
      FROM c, t ORDER BY bucket"""))

  /** Cohen's kappa between the recorded order status and a price-band
    * heuristic labeler over the same {F,O,P} category space. */
  private val q146 = Entry(
    "q146_cohen_kappa",
    (s, d) => {
      val rater = Tables.orders(s, d).select(col("o_orderstatus").as("a"),
        when(col("o_totalprice") < 170000.0, lit("F"))
          .when(col("o_totalprice") < 340000.0, lit("O"))
          .otherwise(lit("P")).as("b"))
      graft.ops.Evaluation.cohenKappa(rater, "a", "b")
        .select(col("n"), r6(col("po")).as("po"), r6(col("pe")).as("pe"),
          r6(col("kappa")).as("kappa"))
    },
    Some("""
      WITH r AS (SELECT o_orderstatus AS a,
                        CASE WHEN o_totalprice < 170000.0 THEN 'F'
                             WHEN o_totalprice < 340000.0 THEN 'O'
                             ELSE 'P' END AS b
                 FROM orders),
      j AS (SELECT a, b, count(*)::DOUBLE AS n FROM r GROUP BY 1, 2),
      ma AS (SELECT a AS k, sum(n) AS na FROM j GROUP BY 1),
      mb AS (SELECT b AS k, sum(n) AS nb FROM j GROUP BY 1),
      t AS (SELECT sum(n) AS nn,
                   sum(CASE WHEN a = b THEN n ELSE 0 END) AS agree FROM j),
      x AS (SELECT sum(na * nb) AS crossp FROM ma JOIN mb USING (k))
      SELECT nn::BIGINT AS n, round(agree / nn, 6) AS po,
             round(crossp / (nn * nn), 6) AS pe,
             round((agree / nn - crossp / (nn * nn)) /
               (1 - crossp / (nn * nn)), 6) AS kappa
      FROM t, x"""))

  /** Correlogram of daily event revenue at lags 1–7 — mean/denominator
    * from one broadcast aggregate, lagged pairs via a keyed self-join
    * (no window at all). */
  private val q147 = Entry(
    "q147_acf",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(datediff(to_date(col("ts")),
          lit(java.sql.Date.valueOf("1970-01-01"))).as("day"))
        .agg(sum("value").as("rev"))
      graft.ops.Evaluation.acf(daily, "day", "rev", 7)
        .select(col("lag"), col("n_pairs"), r6(col("acf")).as("acf"))
        .orderBy("lag")
    },
    Some("""
      WITH daily AS (SELECT datediff('day', DATE '1970-01-01', ts::DATE)
                       AS day, sum("value") AS rev
                     FROM events GROUP BY 1),
      st AS (SELECT count(*)::DOUBLE AS n, sum(rev) AS sx,
                    sum(rev * rev) AS sxx FROM daily),
      m AS (SELECT sx / n AS mu, sxx - sx * sx / n AS den FROM st),
      l AS (SELECT * FROM (VALUES (1),(2),(3),(4),(5),(6),(7)) t(lag)),
      p AS (SELECT l.lag, a.rev AS x1, b.rev AS x2
            FROM l JOIN daily a ON true
                   JOIN daily b ON b.day = a.day + l.lag)
      SELECT lag::BIGINT AS lag, count(*) AS n_pairs,
             round(sum((x1 - mu) * (x2 - mu)) / max(den), 6) AS acf
      FROM p, m GROUP BY 1 ORDER BY 1"""))

  /** CUPED variance reduction on a pre/post split of event revenue:
    * per-user covariate x = first-half revenue, metric y = second-half
    * revenue, arms by user-id parity; adjusted means shift
    * algebraically — no per-row adjusted column. */
  private val q148 = Entry(
    "q148_cuped",
    (s, d) => {
      val ev = Tables.events(s, d)
      val mid = ev.agg(min(to_date(col("ts"))).as("__lo"),
          max(to_date(col("ts"))).as("__hi"))
        .select(date_add(col("__lo"),
          (datediff(col("__hi"), col("__lo")) / 2).cast("int")).as("__mid"))
      val per = ev.crossJoin(broadcast(mid))
        .groupBy("user_id")
        .agg(sum(when(to_date(col("ts")) < col("__mid"), col("value"))
          .otherwise(lit(0.0))).as("x"),
          sum(when(to_date(col("ts")) >= col("__mid"), col("value"))
            .otherwise(lit(0.0))).as("y"))
        .withColumn("arm", (col("user_id") % 2).cast("long"))
      graft.ops.Evaluation.cuped(per, "arm", "y", "x")
        .select(col("group").as("arm"), col("n"),
          r6(col("mean_raw")).as("mean_raw"), r6(col("mean_adj")).as("mean_adj"),
          r6(col("theta")).as("theta"),
          r6(col("var_reduction")).as("var_reduction"))
        .orderBy("arm")
    },
    Some("""
      WITH b AS (SELECT min(ts::DATE) AS lo, max(ts::DATE) AS hi FROM events),
      mid AS (SELECT lo + ((datediff('day', lo, hi) // 2))::INT AS m FROM b),
      per AS (SELECT user_id % 2 AS arm,
                     sum(CASE WHEN ts::DATE < m THEN "value" ELSE 0 END) AS x,
                     sum(CASE WHEN ts::DATE >= m THEN "value" ELSE 0 END) AS y
              FROM events, mid GROUP BY user_id),
      g AS (SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
                   sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
            FROM per),
      th AS (SELECT sx / n AS mx,
                    (sxy - sx * sy / n) / (sxx - sx * sx / n) AS theta,
                    (syy - sy * sy / n) / n AS vary,
                    (sxy - sx * sy / n) * (sxy - sx * sy / n) /
                      (sxx - sx * sx / n) / n AS covterm
             FROM g),
      a AS (SELECT arm, count(*) AS n, avg(y) AS mean_raw, avg(x) AS mxg
            FROM per GROUP BY 1)
      SELECT arm::BIGINT AS arm, n, round(mean_raw, 6) AS mean_raw,
             round(mean_raw - theta * (mxg - mx), 6) AS mean_adj,
             round(theta, 6) AS theta,
             round(covterm / vary, 6) AS var_reduction
      FROM a, th ORDER BY arm"""))

  /** NDCG@10 per event type: docs = users ranked by summed event value,
    * graded relevance from a user-id mod — rankings tie-broken by doc
    * id so both engines rank identically. */
  private val q149 = Entry(
    "q149_ndcg",
    (s, d) => {
      val per = Tables.events(s, d)
        .groupBy(col("event_type").as("q"), col("user_id").as("doc"))
        .agg(sum("value").as("score"))
        .withColumn("rel", (col("doc") % 4).cast("double"))
      graft.ops.Evaluation.ndcgAtK(per, "q", "doc", "rel", "score", 10)
        .select(col("query"), col("n_docs"), r6(col("dcg")).as("dcg"),
          r6(col("idcg")).as("idcg"), r6(col("ndcg")).as("ndcg"))
        .orderBy("query")
    },
    Some("""
      WITH per AS (SELECT event_type AS q, user_id AS doc,
                          sum("value") AS score
                   FROM events GROUP BY 1, 2),
      r AS (SELECT q, doc, score, (doc % 4)::DOUBLE AS rel,
                   row_number() OVER (PARTITION BY q
                     ORDER BY score DESC, doc ASC) AS rs,
                   row_number() OVER (PARTITION BY q
                     ORDER BY (doc % 4) DESC, doc ASC) AS ri
            FROM per),
      a AS (SELECT q, count(*) AS n_docs,
                   sum(CASE WHEN rs <= 10
                       THEN (pow(2, rel) - 1) / log2(rs + 1) ELSE 0 END) AS dcg,
                   sum(CASE WHEN ri <= 10
                       THEN (pow(2, rel) - 1) / log2(ri + 1) ELSE 0 END) AS idcg
            FROM r GROUP BY 1)
      SELECT q AS query, n_docs, round(dcg, 6) AS dcg,
             round(idcg, 6) AS idcg,
             round(CASE WHEN idcg > 0 THEN dcg / idcg ELSE 0 END, 6) AS ndcg
      FROM a ORDER BY query"""))

  /** Log-rank test on the q138 time-to-first-big-purchase frame, arms
    * by user-id parity — does either arm's survival curve differ? */
  private val q150 = Entry(
    "q150_log_rank",
    (s, d) => {
      val ev = Tables.events(s, d)
      val hit = when(col("event_type") === "purchase" &&
        col("value") > 200, col("ts"))
      val surv = ev.groupBy("user_id")
        .agg(min(hit).as("__hit"), min(col("ts")).as("__first"),
          max(col("ts")).as("__last"))
        .select(
          when(col("user_id") % 2 === 0, lit("even")).otherwise(lit("odd"))
            .as("arm"),
          when(col("__hit").isNotNull,
            datediff(to_date(col("__hit")), to_date(col("__first"))))
            .otherwise(
              datediff(to_date(col("__last")), to_date(col("__first"))))
            .as("dur"),
          when(col("__hit").isNotNull, lit(1)).otherwise(lit(0)).as("ev"))
      AnalysisPlanner.logRank(surv, "dur", "ev", "arm", "even", "odd")
        .select(col("observed_a"), r6(col("expected_a")).as("expected_a"),
          r6(col("chi2")).as("chi2"))
    },
    Some("""
      WITH s AS (
        SELECT CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END AS arm,
          CASE WHEN min(ts) FILTER (event_type = 'purchase' AND "value" > 200) IS NOT NULL
               THEN datediff('day', min(ts)::DATE,
                 (min(ts) FILTER (event_type = 'purchase' AND "value" > 200))::DATE)
               ELSE datediff('day', min(ts)::DATE, max(ts)::DATE) END AS dur,
          CASE WHEN min(ts) FILTER (event_type = 'purchase' AND "value" > 200) IS NOT NULL
               THEN 1.0 ELSE 0.0 END AS ev
        FROM events GROUP BY user_id),
      v AS (SELECT dur,
              sum(CASE WHEN arm = 'even' THEN ev ELSE 0 END) AS da,
              sum(CASE WHEN arm = 'odd' THEN ev ELSE 0 END) AS db,
              sum(CASE WHEN arm = 'even' THEN 1.0 ELSE 0 END) AS ta,
              sum(CASE WHEN arm = 'odd' THEN 1.0 ELSE 0 END) AS tb
            FROM s GROUP BY 1),
      t AS (SELECT sum(ta) AS na0, sum(tb) AS nb0 FROM v),
      w AS (SELECT dur, da, db,
              coalesce(sum(ta) OVER (ORDER BY dur ROWS BETWEEN
                UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS befa,
              coalesce(sum(tb) OVER (ORDER BY dur ROWS BETWEEN
                UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS befb
            FROM v),
      k AS (SELECT da, na0 - befa AS n1, nb0 - befb AS n2, da + db AS d
            FROM w, t
            WHERE da + db > 0 AND (na0 - befa + nb0 - befb) > 1)
      SELECT sum(da)::BIGINT AS observed_a,
             round(sum(d * n1 / (n1 + n2)), 6) AS expected_a,
             round(pow(sum(da) - sum(d * n1 / (n1 + n2)), 2) /
               sum(d * (n1 / (n1 + n2)) * (1 - n1 / (n1 + n2)) *
                 (n1 + n2 - d) / (n1 + n2 - 1)), 6) AS chi2
      FROM k"""))

  /** Zipf slope of the document corpus: weighted OLS of log-frequency
    * on log-average-rank over the (frequency → term count) histogram. */
  private val q151 = Entry(
    "q151_zipf_slope",
    (s, d) =>
      graft.ops.TextAnalysis.zipfSlope(Tables.documents(s, d), "text")
        .select(col("n_terms"), col("n_freq_levels"),
          r6(col("slope")).as("slope"), r6(col("intercept")).as("intercept")),
    Some("""
      WITH tf AS (SELECT w, count(*)::DOUBLE AS f
                  FROM (SELECT unnest(string_split(text, ' ')) AS w
                        FROM documents) t
                  GROUP BY w),
      fc AS (SELECT f, count(*)::DOUBLE AS cnt FROM tf GROUP BY 1),
      r AS (SELECT f, cnt,
                   coalesce(sum(cnt) OVER (ORDER BY f DESC ROWS BETWEEN
                     UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
            FROM fc),
      o AS (SELECT ln(f) AS y, ln(bef + (cnt + 1) / 2.0) AS x, cnt AS wgt
            FROM r),
      g AS (SELECT sum(wgt) AS n, count(*) AS nl, sum(wgt * x) AS sx,
                   sum(wgt * y) AS sy, sum(wgt * x * x) AS sxx,
                   sum(wgt * x * y) AS sxy
            FROM o)
      SELECT n::BIGINT AS n_terms, nl AS n_freq_levels,
             round((sxy - sx * sy / n) / (sxx - sx * sx / n), 6) AS slope,
             round((sy - ((sxy - sx * sy / n) / (sxx - sx * sx / n)) * sx)
               / n, 6) AS intercept
      FROM g"""))

  /** Heaps'-law vocabulary growth over doc-id-ordered checkpoints. */
  private val q152 = Entry(
    "q152_heaps_law",
    (s, d) =>
      graft.ops.TextAnalysis.heapsLaw(Tables.documents(s, d), "doc_id", "text")
        .select(col("n_docs"), col("total_tokens"), col("vocab"),
          r6(col("beta")).as("beta"), r6(col("k")).as("k")),
    Some("""
      WITH tok AS (SELECT doc_id AS d, unnest(string_split(text, ' ')) AS w
                   FROM documents),
      pd AS (SELECT d, count(*)::DOUBLE AS tok FROM tok GROUP BY 1),
      ft AS (SELECT w, min(d) AS fd FROM tok GROUP BY 1),
      nt AS (SELECT fd AS d, count(*)::DOUBLE AS nw FROM ft GROUP BY 1),
      per AS (SELECT pd.d, pd.tok, coalesce(nt.nw, 0) AS nw
              FROM pd LEFT JOIN nt USING (d)),
      cum AS (SELECT sum(tok) OVER (ORDER BY d) AS n,
                     sum(nw) OVER (ORDER BY d) AS v
              FROM per),
      g AS (SELECT count(*)::DOUBLE AS c, max(n) AS tt, max(v) AS vv,
                   sum(ln(n)) AS sx, sum(ln(v)) AS sy,
                   sum(ln(n) * ln(n)) AS sxx, sum(ln(n) * ln(v)) AS sxy
            FROM cum)
      SELECT c::BIGINT AS n_docs, tt::BIGINT AS total_tokens,
             vv::BIGINT AS vocab,
             round((sxy - sx * sy / c) / (sxx - sx * sx / c), 6) AS beta,
             round(exp((sy - ((sxy - sx * sy / c) / (sxx - sx * sx / c))
               * sx) / c), 6) AS k
      FROM g"""))

  /** Top bursty terms by variance-to-mean ratio of per-doc counts —
    * all quantities derive from integer sums, so the (unrounded) vmr
    * ordering is bit-identical across engines. */
  private val q153 = Entry(
    "q153_term_burstiness",
    (s, d) =>
      graft.ops.TextAnalysis
        .termBurstiness(Tables.documents(s, d), "doc_id", "text", minDf = 10)
        .orderBy(col("vmr").desc, col("term").asc)
        .limit(20)
        .select(col("term"), col("df"), col("total_tf"),
          r6(col("mean_tf")).as("mean_tf"), r6(col("vmr")).as("vmr")),
    Some("""
      WITH tok AS (SELECT doc_id AS d, unnest(string_split(text, ' ')) AS w
                   FROM documents),
      cells AS (SELECT w, d, count(*)::DOUBLE AS c FROM tok GROUP BY 1, 2),
      pt AS (SELECT w AS term, count(*) AS df, sum(c) AS s, sum(c * c) AS ss
             FROM cells GROUP BY 1),
      t AS (SELECT count(DISTINCT doc_id)::DOUBLE AS dd FROM documents)
      SELECT term, df, s::BIGINT AS total_tf,
             round(s / dd, 6) AS mean_tf,
             round((ss / dd - (s / dd) * (s / dd)) / (s / dd), 6) AS vmr
      FROM pt, t WHERE df >= 10
      ORDER BY (ss / dd - (s / dd) * (s / dd)) / (s / dd) DESC, term
      LIMIT 20"""))

  /** Per-lang rankers shared by q154/q155: A = longest docs first,
    * B = lowest doc id first — deterministic stand-ins for a lexical
    * and a recency retriever, both top-20 per query group. */
  private def rankerA(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("lang"), col("doc_id"),
        row_number().over(Window.partitionBy("lang")
          .orderBy(col("n_chars").desc, col("doc_id").asc)).as("rank"))
      .where(col("rank") <= 20)

  /** Reciprocal-rank fusion of the two per-lang rankers, top 10 fused
    * results per query — fused scores are sums of two correctly-rounded
    * reciprocals of integer ranks, bit-identical across engines. */
  private val q154 = Entry(
    "q154_rrf_fuse",
    (s, d) => {
      val b = Tables.documents(s, d).select(col("lang"), col("doc_id"),
          row_number().over(Window.partitionBy("lang")
            .orderBy(col("doc_id").asc)).as("rank"))
        .where(col("rank") <= 20)
      graft.ops.Retrieval.rrfFuse(rankerA(s, d), b, "lang", "doc_id", "rank")
        .where(col("fused_rank") <= 10)
        .select(col("query"), col("doc"), r6(col("rrf_score")).as("rrf_score"),
          col("fused_rank"))
        .orderBy("query", "fused_rank")
    },
    Some("""
      WITH a AS (SELECT lang AS query, doc_id AS doc,
                        row_number() OVER (PARTITION BY lang
                          ORDER BY n_chars DESC, doc_id) AS r
                 FROM documents QUALIFY r <= 20),
      b AS (SELECT lang AS query, doc_id AS doc,
                   row_number() OVER (PARTITION BY lang
                     ORDER BY doc_id) AS r
            FROM documents QUALIFY r <= 20),
      f AS (SELECT coalesce(a.query, b.query) AS query,
                   coalesce(a.doc, b.doc) AS doc,
                   coalesce(1.0 / (60 + a.r), 0) +
                     coalesce(1.0 / (60 + b.r), 0) AS s
            FROM a FULL OUTER JOIN b
              ON a.query = b.query AND a.doc = b.doc),
      rk AS (SELECT query, doc, s,
                    row_number() OVER (PARTITION BY query
                      ORDER BY s DESC, doc) AS fr
             FROM f)
      SELECT query, doc, round(s, 6) AS rrf_score, fr AS fused_rank
      FROM rk WHERE fr <= 10 ORDER BY query, fr"""))

  /** Ranked-retrieval eval of ranker A against a source-based
    * relevance set: per-lang MRR components, recall@10, precision@10. */
  private val q155 = Entry(
    "q155_retrieval_eval",
    (s, d) => {
      val rel = Tables.documents(s, d).where(col("source") === "src0")
        .select(col("lang"), col("doc_id"))
      graft.ops.Retrieval
        .retrievalMetrics(rankerA(s, d), rel, "lang", "doc_id", "rank", 10)
        .select(col("query"), col("n_results"), col("n_relevant"),
          col("first_rel_rank"), r6(col("rr")).as("rr"),
          r6(col("recall_at_k")).as("recall_at_k"),
          r6(col("precision_at_k")).as("precision_at_k"))
        .orderBy("query")
    },
    Some("""
      WITH res AS (SELECT lang AS query, doc_id AS doc,
                          row_number() OVER (PARTITION BY lang
                            ORDER BY n_chars DESC, doc_id) AS r
                   FROM documents QUALIFY r <= 20),
      rel AS (SELECT DISTINCT lang AS query, doc_id AS doc
              FROM documents WHERE source = 'src0'),
      nr AS (SELECT query, count(*) AS n_relevant FROM rel GROUP BY 1),
      h AS (SELECT res.query, res.r,
                   CASE WHEN rel.doc IS NOT NULL THEN 1 ELSE 0 END AS hit
            FROM res LEFT JOIN rel
              ON res.query = rel.query AND res.doc = rel.doc),
      p AS (SELECT query, count(*) AS n_results,
                   min(CASE WHEN hit = 1 THEN r END) AS first_rel_rank,
                   sum(CASE WHEN hit = 1 AND r <= 10 THEN 1 ELSE 0 END)
                     AS hitsk
            FROM h GROUP BY 1)
      SELECT p.query, n_results, coalesce(n_relevant, 0) AS n_relevant,
             first_rel_rank,
             round(coalesce(1.0 / first_rel_rank, 0), 6) AS rr,
             CASE WHEN coalesce(n_relevant, 0) > 0
                  THEN round(hitsk / n_relevant, 6) END AS recall_at_k,
             round(hitsk / 10.0, 6) AS precision_at_k
      FROM p LEFT JOIN nr USING (query) ORDER BY p.query"""))

  /** Term-distribution JS divergence between two document sources —
    * the text-space drift check. */
  private val q156 = Entry(
    "q156_term_js_divergence",
    (s, d) =>
      graft.ops.TextAnalysis
        .termJsDivergence(Tables.documents(s, d), "text", "source",
          "src0", "src1")
        .select(col("n_terms_a"), col("n_terms_b"), col("n_terms_union"),
          col("tokens_a"), col("tokens_b"),
          r6(col("js_divergence")).as("js_divergence")),
    Some("""
      WITH ta AS (SELECT w, count(*)::DOUBLE AS ca
                  FROM (SELECT unnest(string_split(text, ' ')) AS w
                        FROM documents WHERE source = 'src0') t
                  GROUP BY 1),
      tb AS (SELECT w, count(*)::DOUBLE AS cb
             FROM (SELECT unnest(string_split(text, ' ')) AS w
                   FROM documents WHERE source = 'src1') t
             GROUP BY 1),
      j AS (SELECT coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
            FROM ta FULL OUTER JOIN tb ON ta.w = tb.w),
      t AS (SELECT sum(ca) AS tta, sum(cb) AS ttb FROM j),
      p AS (SELECT ca, cb, ca / tta AS pa, cb / ttb AS pb,
                   (ca / tta + cb / ttb) / 2.0 AS m FROM j, t)
      SELECT sum(CASE WHEN ca > 0 THEN 1 ELSE 0 END)::BIGINT AS n_terms_a,
             sum(CASE WHEN cb > 0 THEN 1 ELSE 0 END)::BIGINT AS n_terms_b,
             count(*) AS n_terms_union,
             (SELECT tta FROM t)::BIGINT AS tokens_a,
             (SELECT ttb FROM t)::BIGINT AS tokens_b,
             round(sum(CASE WHEN ca > 0 THEN pa * ln(pa / m) ELSE 0 END)
                 / 2.0 +
               sum(CASE WHEN cb > 0 THEN pb * ln(pb / m) ELSE 0 END)
                 / 2.0, 6) AS js_divergence
      FROM p"""))

  /** Vocabulary coverage quantiles — smallest most-frequent-first
    * vocabulary covering 50/80/95% of corpus tokens; the crossing-
    * block search is exact integer arithmetic. */
  private val q157 = Entry(
    "q157_vocab_coverage",
    (s, d) =>
      graft.ops.TextAnalysis
        .vocabCoverage(Tables.documents(s, d), "text", Seq(0.5, 0.8, 0.95))
        .select(col("share"), col("vocab_size"), col("total_vocab"),
          col("total_tokens"), r6(col("coverage")).as("coverage"))
        .orderBy("share"),
    Some("""
      WITH fc AS (SELECT f, count(*)::DOUBLE AS cnt,
                         f * count(*)::DOUBLE AS toks
                  FROM (SELECT w, count(*)::DOUBLE AS f
                        FROM (SELECT unnest(string_split(text, ' ')) AS w
                              FROM documents) u
                        GROUP BY w) tf
                  GROUP BY f),
      pre AS (SELECT f, cnt, toks,
                     coalesce(sum(cnt) OVER (ORDER BY f DESC ROWS BETWEEN
                       UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS terms_before,
                     coalesce(sum(toks) OVER (ORDER BY f DESC ROWS BETWEEN
                       UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS toks_before
              FROM fc),
      t AS (SELECT sum(toks) AS tt, sum(cnt) AS tv FROM fc),
      s AS (SELECT unnest([0.5::DOUBLE, 0.8::DOUBLE, 0.95::DOUBLE])
              AS share),
      k AS (SELECT share, terms_before, toks_before, f, tt, tv,
                   share * tt AS target
            FROM s, pre, t
            WHERE toks_before < share * tt
              AND toks_before + toks >= share * tt)
      SELECT share,
             (terms_before + ceil((target - toks_before) / f))::BIGINT
               AS vocab_size,
             tv::BIGINT AS total_vocab, tt::BIGINT AS total_tokens,
             round((toks_before + ceil((target - toks_before) / f) * f)
               / tt, 6) AS coverage
      FROM k ORDER BY share"""))

  /** PageRank over the customer→supplier purchase graph (3 damped
    * power-iteration steps from uniform; suppliers are all dangling,
    * exercising the dangling-mass redistribution). The oracle unrolls
    * the same three iterations as nested CTEs. */
  /** The customer↔supplier interaction graph shared by the 10 graph
    * queries (q158/q164/q200/q211/q221/q222/q232/q234/q256/q317):
    * DISTINCT over the (custkey, suppkey) INT pairs first — the shuffle
    * dedups 8-byte keys, not the ~600k concat'd strings it would
    * otherwise carry — then widened to the prefixed string node ids
    * map-side (the graph ops' own distinct then sees pre-deduped rows).
    * Materialized ONCE per (session, dir) via [[Tables.materialized]]:
    * the orders⋈lineitem distinct build runs on the first graph query
    * and every later one reads the localCheckpoint — the feature-store
    * move of registering a derived edge table once and reading it many
    * times. Each query's DuckDB oracle still derives its own edges. */
  private def custSuppEdges(s: SparkSession, d: String) =
    Tables.materialized(s, d, "cust_supp_edges") {
      Tables.orders(s, d)
        .join(Tables.lineitem(s, d),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
        .distinct()
        .select(concat(lit("c"), col("ck")).as("src"),
          concat(lit("s"), col("sk")).as("dst"))
    }

  private val q158 = Entry(
    "q158_pagerank",
    (s, d) => {
      val edges = custSuppEdges(s, d)
      graft.ops.Graph.pageRank(edges, "src", "dst", iterations = 3)
        .select(col("node"), r6(col("rank")).as("rank"))
        .orderBy("node")
    },
    Some("""
      WITH e AS (SELECT DISTINCT 'c' || o_custkey AS src,
                        's' || l_suppkey AS dst
                 FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
      deg AS (SELECT src, count(*)::DOUBLE AS dg FROM e GROUP BY 1),
      r0 AS (SELECT node, 1.0 / n AS rank FROM nodes, nn),
      c1 AS (SELECT e.dst AS node, sum(r0.rank / deg.dg) AS c
             FROM r0 JOIN e ON r0.node = e.src
                     JOIN deg ON e.src = deg.src
             GROUP BY 1),
      d1 AS (SELECT coalesce(sum(rank), 0) AS dang FROM r0
             WHERE node NOT IN (SELECT src FROM deg)),
      r1 AS (SELECT nodes.node,
                    0.15 / n + 0.85 * (coalesce(c, 0) + dang / n) AS rank
             FROM nodes LEFT JOIN c1 ON nodes.node = c1.node, nn, d1),
      c2 AS (SELECT e.dst AS node, sum(r1.rank / deg.dg) AS c
             FROM r1 JOIN e ON r1.node = e.src
                     JOIN deg ON e.src = deg.src
             GROUP BY 1),
      d2 AS (SELECT coalesce(sum(rank), 0) AS dang FROM r1
             WHERE node NOT IN (SELECT src FROM deg)),
      r2 AS (SELECT nodes.node,
                    0.15 / n + 0.85 * (coalesce(c, 0) + dang / n) AS rank
             FROM nodes LEFT JOIN c2 ON nodes.node = c2.node, nn, d2),
      c3 AS (SELECT e.dst AS node, sum(r2.rank / deg.dg) AS c
             FROM r2 JOIN e ON r2.node = e.src
                     JOIN deg ON e.src = deg.src
             GROUP BY 1),
      d3 AS (SELECT coalesce(sum(rank), 0) AS dang FROM r2
             WHERE node NOT IN (SELECT src FROM deg)),
      r3 AS (SELECT nodes.node,
                    0.15 / n + 0.85 * (coalesce(c, 0) + dang / n) AS rank
             FROM nodes LEFT JOIN c3 ON nodes.node = c3.node, nn, d3)
      SELECT node, round(rank, 6) AS rank FROM r3 ORDER BY node"""))

  /** BH step-up FDR over 125 synthetic hypotheses (exact-rational
    * p-values, planted small-p block) — flags the discovery set. */
  private val q159 = Entry(
    "q159_bh_fdr",
    (s, d) => {
      val hyp = Tables.orders(s, d).where(col("o_orderkey") <= 500)
        .select(col("o_orderkey").as("hid"),
          when(col("o_orderkey") % 50 === 0,
            (col("o_orderkey") * 7919 % 9973) / lit(9973000.0))
            .otherwise((col("o_orderkey") * 7919 % 9973) / lit(9973.0))
            .as("p"))
      AnalysisPlanner.bhFdr(hyp, "p", 0.1)
        .select(col("hid"), r6(col("p")).as("p"), col("p_rank"),
          r6(col("bh_critical")).as("bh_critical"), col("discovery"))
        .orderBy("hid")
    },
    Some("""
      WITH hyp AS (SELECT o_orderkey AS hid,
                          CASE WHEN o_orderkey % 50 = 0
                               THEN (o_orderkey * 7919 % 9973) / 9973000.0
                               ELSE (o_orderkey * 7919 % 9973) / 9973.0
                          END AS p
                   FROM orders WHERE o_orderkey <= 500),
      v AS (SELECT p, count(*)::DOUBLE AS cnt FROM hyp GROUP BY 1),
      w AS (SELECT p, cnt,
                   coalesce(sum(cnt) OVER (ORDER BY p ROWS BETWEEN
                     UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
            FROM v),
      m AS (SELECT count(*)::DOUBLE AS m FROM hyp),
      ps AS (SELECT max(CASE WHEN p <= (bef + cnt) * 0.1 / m THEN p END)
               AS pstar
             FROM w, m)
      SELECT hid, round(p, 6) AS p, (bef + 1)::BIGINT AS p_rank,
             round((bef + 1) * 0.1 / m, 6) AS bh_critical,
             (pstar IS NOT NULL AND p <= pstar) AS discovery
      FROM hyp JOIN w USING (p), m, ps
      ORDER BY hid"""))

  /** Split-conformal thresholds for purchase values at three
    * miscoverage levels — thresholds are exact order statistics
    * (actual data values, no float formula). */
  private val q160 = Entry(
    "q160_conformal_threshold",
    (s, d) =>
      AnalysisPlanner
        .conformalThreshold(
          Tables.events(s, d).where(col("event_type") === "purchase"),
          "value", Seq(0.1, 0.05, 0.01))
        .select(col("alpha"), col("n"), col("k"),
          r6(col("threshold")).as("threshold"))
        .orderBy(col("alpha").desc),
    Some("""
      WITH s AS (SELECT "value" AS v FROM events
                 WHERE event_type = 'purchase'),
      n AS (SELECT count(*)::DOUBLE AS n FROM s),
      v AS (SELECT v, count(*)::DOUBLE AS cnt FROM s GROUP BY 1),
      w AS (SELECT v, cnt,
                   coalesce(sum(cnt) OVER (ORDER BY v ROWS BETWEEN
                     UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
            FROM v),
      a AS (SELECT unnest([0.1::DOUBLE, 0.05::DOUBLE, 0.01::DOUBLE])
              AS alpha),
      k AS (SELECT alpha, least(ceil((n + 1) * (1 - alpha)), n) AS kk, n
            FROM a, n),
      t AS (SELECT k.alpha, k.n, k.kk, w.v
            FROM k JOIN w ON w.bef < k.kk AND w.bef + w.cnt >= k.kk)
      SELECT alpha, n::BIGINT AS n, kk::BIGINT AS k,
             round(v, 6) AS threshold
      FROM t ORDER BY alpha DESC"""))

  /** Pinball-loss backtest of a 0.9-quantile forecast: per event type,
    * the first-half 0.9 order-stat quantile predicts second-half
    * values; coverage should sit near 0.9 for a stable series. */
  private val q161 = Entry(
    "q161_pinball_loss",
    (s, d) => {
      val ev = Tables.events(s, d)
      val mid = ev.agg(min(to_date(col("ts"))).as("__lo"),
          max(to_date(col("ts"))).as("__hi"))
        .select(date_add(col("__lo"),
          (datediff(col("__hi"), col("__lo")) / 2).cast("int")).as("__mid"))
      val first = ev.crossJoin(broadcast(mid))
        .where(to_date(col("ts")) < col("__mid"))
      val preds = AnalysisPlanner.exactPercentilesDisc(first, "value",
        Seq("pred" -> 0.9), Seq("event_type"))
      val second = ev.crossJoin(broadcast(mid))
        .where(to_date(col("ts")) >= col("__mid"))
      graft.ops.Evaluation
        .pinballLoss(second.join(preds, Seq("event_type")),
          "value", "pred", 0.9, Seq("event_type"))
        .select(col("event_type"), col("n"),
          r6(col("mean_pinball")).as("mean_pinball"),
          r6(col("coverage")).as("coverage"))
        .orderBy("event_type")
    },
    Some("""
      WITH b AS (SELECT min(ts::DATE) AS lo, max(ts::DATE) AS hi
                 FROM events),
      mid AS (SELECT lo + ((datediff('day', lo, hi) // 2))::INT AS m
              FROM b),
      f AS (SELECT event_type, quantile_disc("value", 0.9) AS pred
            FROM events, mid WHERE ts::DATE < m GROUP BY 1),
      s AS (SELECT e.event_type, e."value" AS y, f.pred
            FROM events e CROSS JOIN mid
                 JOIN f ON e.event_type = f.event_type
            WHERE e.ts::DATE >= m)
      SELECT event_type, count(*) AS n,
             round(avg(CASE WHEN y >= pred THEN 0.9 * (y - pred)
                            ELSE 0.1 * (pred - y) END), 6) AS mean_pinball,
             round(avg(CASE WHEN y <= pred THEN 1.0 ELSE 0 END), 6)
               AS coverage
      FROM s GROUP BY 1 ORDER BY 1"""))

  /** IVF ANN from a PERSISTED index — the amortized q32: assignments
    * and centroids are written once (fingerprint-keyed store, the
    * q98/q130 pattern); the query batch probes the stored cells.
    * Shares q32's oracle — the two paths must match exactly. */
  private val q162 = Entry(
    "q162_knn_ivf_from_index",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      // fingerprint CONTENT, not just ids: the driver ships the same
      // vec_id range at every scale factor with different vectors, so
      // an id-only tag collides across SF dirs and a stale index built
      // on one SF would silently answer for another
      val fp = emb.agg(count(lit(1)),
        expr("bit_xor(xxhash64(vec_id, embedding))")).head()
      val tag = java.lang.Long.toHexString(fp.getLong(0) ^ fp.getLong(1))
      val path = s"${sys.props("java.io.tmpdir")}/graft_ivf_index/$tag"
      if (!new java.io.File(s"$path/centroids/_SUCCESS").exists())
        graft.ops.Similarity.writeIvfIndex(emb, "vec_id", "embedding",
          graft.ops.Similarity.pseudoCentroids(8, 64), path)
      graft.ops.Similarity
        .ivfKnnFromIndex(s, path, emb.where(col("vec_id") < 10), 5,
          nProbe = 2)
        .select(col("query_id"), col("rnk").cast("long").as("rnk"),
          col("nbr_id"), r6(col("cos")).as("cos"))
        .orderBy("query_id", "rnk")
    },
    Some(ivfOracleSql))

  /** Association rules over the order→supplier basket relation:
    * co-supply support/confidence/lift per supplier pair. */
  private val q163 = Entry(
    "q163_assoc_rules",
    (s, d) =>
      graft.ops.Associations
        .pairRules(Tables.lineitem(s, d), "l_orderkey", "l_suppkey",
          minPairCount = 5)
        .select(col("item_a"), col("item_b"), col("n_pair"), col("n_a"),
          col("n_b"), r6(col("support")).as("support"),
          r6(col("conf_a_b")).as("conf_a_b"),
          r6(col("conf_b_a")).as("conf_b_a"), r6(col("lift")).as("lift"))
        .orderBy("item_a", "item_b"),
    Some("""
      WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_suppkey AS it
                 FROM lineitem),
      nb AS (SELECT count(DISTINCT bk)::DOUBLE AS n FROM b),
      ic AS (SELECT it, count(*)::DOUBLE AS ni FROM b GROUP BY 1),
      p AS (SELECT l.it AS item_a, r.it AS item_b, count(*) AS n_pair
            FROM b l JOIN b r ON l.bk = r.bk AND l.it < r.it
            GROUP BY 1, 2 HAVING count(*) >= 5)
      SELECT item_a, item_b, n_pair,
             a.ni::BIGINT AS n_a, c.ni::BIGINT AS n_b,
             round(n_pair / nb.n, 6) AS support,
             round(n_pair / a.ni, 6) AS conf_a_b,
             round(n_pair / c.ni, 6) AS conf_b_a,
             round(n_pair * nb.n / (a.ni * c.ni), 6) AS lift
      FROM p JOIN ic a ON p.item_a = a.it
             JOIN ic c ON p.item_b = c.it, nb
      ORDER BY item_a, item_b"""))

  /** Per-node triangle counts + clustering coefficient on the
    * co-supply graph (supplier pairs sharing ≥5 orders). The oracle
    * enumerates triangles in id order a<b<c; the engine's
    * degree-ordered orientation finds the identical triangle set. */
  private val q164 = Entry(
    "q164_triangles",
    (s, d) => {
      val b = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("bk"), col("l_suppkey").as("it"))
        .distinct()
      val e = b.as("l")
        .join(b.as("r"),
          col("l.bk") === col("r.bk") && col("l.it") < col("r.it"))
        .select(col("l.it").as("s1"), col("r.it").as("s2"))
      graft.ops.Graph.triangleStats(e, "s1", "s2", minCount = 5)
        .select(col("node"), col("degree"), col("triangles"),
          r6(col("clustering_coeff")).as("clustering_coeff"))
        .orderBy("node")
    },
    Some("""
      WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_suppkey AS it
                 FROM lineitem),
      e AS (SELECT l.it AS u, r.it AS v
            FROM b l JOIN b r ON l.bk = r.bk AND l.it < r.it
            GROUP BY 1, 2 HAVING count(*) >= 5),
      deg AS (SELECT node, count(*) AS degree FROM (
                SELECT u AS node FROM e UNION ALL SELECT v FROM e)
              GROUP BY 1),
      tri AS (SELECT e1.u AS a, e1.v AS b2, e2.v AS c
              FROM e e1 JOIN e e2 ON e1.v = e2.u
                        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
      pn AS (SELECT node, count(*) AS triangles FROM (
               SELECT a AS node FROM tri
               UNION ALL SELECT b2 FROM tri
               UNION ALL SELECT c FROM tri) GROUP BY 1)
      SELECT deg.node, deg.degree,
             coalesce(pn.triangles, 0) AS triangles,
             round(CASE WHEN deg.degree >= 2 THEN
                     2.0 * coalesce(pn.triangles, 0) /
                     (deg.degree * (deg.degree - 1.0))
                   ELSE 0.0 END, 6) AS clustering_coeff
      FROM deg LEFT JOIN pn USING (node) ORDER BY node"""))

  /** Jarque–Bera normality per event type — closed-form χ²(2)
    * p-value, so (uniquely among the tests) p rides in-plan. */
  private val q165 = Entry(
    "q165_jarque_bera",
    (s, d) =>
      AnalysisPlanner.jarqueBera(Tables.events(s, d), "value",
          Seq("event_type"))
        .select(col("event_type"), col("n"),
          r6(col("skewness")).as("skewness"),
          r6(col("kurtosis_excess")).as("kurtosis_excess"),
          r6(col("jb_stat")).as("jb_stat"),
          r6(col("p_value")).as("p_value"))
        .orderBy("event_type"),
    Some("""
      WITH m AS (
        SELECT event_type, count("value")::DOUBLE AS n, avg("value") AS m1,
               avg("value" * "value") AS m2,
               avg("value" * "value" * "value") AS m3,
               avg("value" * "value" * "value" * "value") AS m4
        FROM events WHERE "value" IS NOT NULL GROUP BY 1),
      s AS (
        SELECT event_type, n,
               (m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1)
                 / power(m2 - m1 * m1, 1.5) AS sk,
               (m4 - 4 * m1 * m3 + 6 * m1 * m1 * m2
                  - 3 * power(m1, 4)) / power(m2 - m1 * m1, 2) - 3 AS ku
        FROM m)
      SELECT event_type, n::BIGINT AS n, round(sk, 6) AS skewness,
             round(ku, 6) AS kurtosis_excess,
             round(n / 6 * (sk * sk + ku * ku / 4), 6) AS jb_stat,
             round(exp(-0.5 * n / 6 * (sk * sk + ku * ku / 4)), 6)
               AS p_value
      FROM s ORDER BY event_type"""))

  /** Brown–Forsythe variance-homogeneity test across event types
    * (Levene on |x − group median|). */
  private val q166 = Entry(
    "q166_brown_forsythe",
    (s, d) =>
      AnalysisPlanner.brownForsythe(Tables.events(s, d), "value",
          "event_type")
        .select(r6(col("f_stat")).as("f_stat"), col("df_between"),
          col("df_within")),
    Some("""
      WITH med AS (
        SELECT event_type, quantile_cont("value", 0.5) AS md
        FROM events WHERE "value" IS NOT NULL GROUP BY 1),
      z AS (
        SELECT e.event_type, abs(e."value" - med.md) AS z
        FROM events e JOIN med USING (event_type)
        WHERE e."value" IS NOT NULL),
      g AS (SELECT event_type, count(*)::DOUBLE AS n, avg(z) AS m,
                   var_samp(z) AS v
            FROM z GROUP BY 1),
      w AS (SELECT *, sum(m * n) OVER () / sum(n) OVER () AS gm,
                   count(*) OVER ()::DOUBLE AS k, sum(n) OVER () AS ntot
            FROM g)
      SELECT round((sum(n * power(m - gm, 2.0)) / (max(k) - 1)) /
                   (sum((n - 1) * v) / (max(ntot) - max(k))), 6) AS f_stat,
             CAST(max(k) - 1 AS BIGINT) AS df_between,
             CAST(max(ntot) - max(k) AS BIGINT) AS df_within
      FROM w"""))

  /** Cliff's delta effect size: returned-vs-refused extended price.
    * Win/loss masses are exact integer sums off one prefix-sum pass —
    * never an O(n²) pair join. */
  private val q167 = Entry(
    "q167_cliffs_delta",
    (s, d) =>
      AnalysisPlanner.cliffsDelta(Tables.lineitem(s, d),
          "l_extendedprice", "l_returnflag", "A", "R")
        .select(col("n_a"), col("n_b"), col("wins"), col("losses"),
          col("ties"), r6(col("cliffs_delta")).as("cliffs_delta")),
    Some("""
      WITH vc AS (
        SELECT l_extendedprice AS v,
               sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END)::BIGINT
                 AS ca,
               sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT
                 AS cb
        FROM lineitem WHERE l_returnflag IN ('A', 'R') GROUP BY 1),
      p AS (SELECT *,
              coalesce(sum(cb) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS bb
            FROM vc),
      t AS (SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb FROM vc)
      SELECT t.na AS n_a, t.nb AS n_b,
             sum(ca * bb)::BIGINT AS wins,
             sum(ca * (t.nb - bb - cb))::BIGINT AS losses,
             sum(ca * cb)::BIGINT AS ties,
             round((sum(ca * bb) - sum(ca * (t.nb - bb - cb)))
                   / (t.na::DOUBLE * t.nb), 6) AS cliffs_delta
      FROM p, t GROUP BY t.na, t.nb"""))

  /** Theil–Sen robust daily trend of event value per type — median of
    * pairwise slopes over the daily rollup (30-point series). */
  private val q168 = Entry(
    "q168_theil_sen",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(col("value")).as("y"))
        .select(col("event_type"),
          datediff(col("day"), to_date(lit("2024-01-01")))
            .cast("double").as("x"), col("y"))
      graft.ops.TimeSeries.theilSen(daily, Seq("event_type"), "x", "y")
        .select(col("event_type"), r6(col("slope")).as("slope"),
          r6(col("intercept")).as("intercept"))
        .orderBy("event_type")
    },
    Some("""
      WITH d AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               sum("value") AS y
        FROM events GROUP BY 1, 2),
      x AS (SELECT event_type,
                   date_diff('day', DATE '2024-01-01', day::DATE)::DOUBLE
                     AS x, y
            FROM d),
      s AS (SELECT l.event_type, (r.y - l.y) / (r.x - l.x) AS slope
            FROM x l JOIN x r
              ON l.event_type = r.event_type AND l.x < r.x),
      sm AS (SELECT event_type, quantile_cont(slope, 0.5) AS slope
             FROM s GROUP BY 1),
      res AS (SELECT x.event_type, x.y - sm.slope * x.x AS rr
              FROM x JOIN sm USING (event_type)),
      im AS (SELECT event_type, quantile_cont(rr, 0.5) AS intercept
             FROM res GROUP BY 1)
      SELECT sm.event_type, round(sm.slope, 6) AS slope,
             round(im.intercept, 6) AS intercept
      FROM sm JOIN im USING (event_type) ORDER BY event_type"""))

  /** Candidate-key discovery: per-column uniqueness profile of the
    * orders table in one scan. */
  private val q169 = Entry(
    "q169_uniqueness_profile",
    (s, d) =>
      graft.ops.Profiling
        .uniquenessProfile(Tables.orders(s, d),
          Seq("o_orderkey", "o_custkey", "o_orderstatus"))
        .select(col("column"), col("n_rows"), col("n_distinct"),
          col("n_nulls"), r6(col("distinct_ratio")).as("distinct_ratio"),
          col("is_candidate_key"))
        .orderBy("column"),
    Some("""
      SELECT 'o_custkey' AS "column", count(*)::BIGINT AS n_rows,
             count(DISTINCT o_custkey)::BIGINT AS n_distinct,
             sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT
               AS n_nulls,
             round(count(DISTINCT o_custkey)::DOUBLE /
               greatest(count(*) - sum(CASE WHEN o_custkey IS NULL
                 THEN 1 ELSE 0 END), 1), 6) AS distinct_ratio,
             (sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) = 0 AND
              count(DISTINCT o_custkey) = count(*)) AS is_candidate_key
      FROM orders
      UNION ALL
      SELECT 'o_orderkey', count(*)::BIGINT,
             count(DISTINCT o_orderkey)::BIGINT,
             sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT,
             round(count(DISTINCT o_orderkey)::DOUBLE /
               greatest(count(*) - sum(CASE WHEN o_orderkey IS NULL
                 THEN 1 ELSE 0 END), 1), 6),
             (sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) = 0 AND
              count(DISTINCT o_orderkey) = count(*))
      FROM orders
      UNION ALL
      SELECT 'o_orderstatus', count(*)::BIGINT,
             count(DISTINCT o_orderstatus)::BIGINT,
             sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)::BIGINT,
             round(count(DISTINCT o_orderstatus)::DOUBLE /
               greatest(count(*) - sum(CASE WHEN o_orderstatus IS NULL
                 THEN 1 ELSE 0 END), 1), 6),
             (sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) = 0
              AND count(DISTINCT o_orderstatus) = count(*))
      FROM orders
      ORDER BY "column""""))

  /** Functional-dependency check l_partkey → l_suppkey (violated:
    * parts ship from several suppliers) — discovery-side data
    * quality. */
  private val q170 = Entry(
    "q170_fd_check",
    (s, d) =>
      graft.ops.Profiling
        .functionalDependency(Tables.lineitem(s, d), "l_partkey",
          "l_suppkey")
        .select(col("determinant"), col("dependent"), col("n_groups"),
          col("violating_groups"), col("violating_rows"), col("n_rows"),
          r6(col("holds_ratio")).as("holds_ratio")),
    Some("""
      WITH g AS (
        SELECT l_partkey, count(*) AS n,
               count(DISTINCT l_suppkey) AS d
        FROM lineitem GROUP BY 1)
      SELECT 'l_partkey' AS determinant, 'l_suppkey' AS dependent,
             count(*)::BIGINT AS n_groups,
             sum(CASE WHEN d > 1 THEN 1 ELSE 0 END)::BIGINT
               AS violating_groups,
             sum(CASE WHEN d > 1 THEN n ELSE 0 END)::BIGINT
               AS violating_rows,
             sum(n)::BIGINT AS n_rows,
             round(1.0 - sum(CASE WHEN d > 1 THEN 1 ELSE 0 END)::DOUBLE
                   / count(*), 6) AS holds_ratio
      FROM g"""))

  /** Efraimidis–Spirakis weighted sampling WITHOUT replacement: 50
    * docs drawn ∝ n_chars, deterministic md5 uniforms, TakeOrdered
    * top-k — never a global sort. */
  private val q171 = Entry(
    "q171_weighted_sample_wor",
    (s, d) =>
      graft.ops.Sampling
        .weightedSampleWithoutReplacement(
          Tables.documents(s, d).select("doc_id", "n_chars"), 50,
          "n_chars", Seq("doc_id"))
        .orderBy("doc_id"),
    Some("""
      WITH h AS (
        SELECT doc_id, n_chars,
               ln((((('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                     % 1048576) + 0.5) / 1048576.0)) / n_chars AS k
        FROM documents)
      SELECT doc_id, n_chars FROM (
        SELECT doc_id, n_chars FROM h ORDER BY k DESC, doc_id LIMIT 50)
      ORDER BY doc_id"""))

  /** Exact φ-heavy hitters: parts holding ≥ 0.07% of lineitem rows. */
  private val q172 = Entry(
    "q172_heavy_hitters",
    (s, d) =>
      graft.ops.Profiling
        .heavyHitters(Tables.lineitem(s, d), Seq("l_partkey"), 0.0007)
        .select(col("l_partkey"), col("cnt"),
          r6(col("share")).as("share"))
        .orderBy("l_partkey"),
    Some("""
      WITH c AS (SELECT l_partkey, count(*) AS cnt FROM lineitem
                 GROUP BY 1),
      t AS (SELECT sum(cnt)::DOUBLE AS tot FROM c)
      SELECT l_partkey, cnt, round(cnt / t.tot, 6) AS share
      FROM c, t WHERE cnt >= 0.0007 * t.tot ORDER BY l_partkey"""))

  /** Numerically stable grouped log-sum-exp of event values. */
  private val q173 = Entry(
    "q173_logsumexp",
    (s, d) =>
      AnalysisPlanner.logSumExp(Tables.events(s, d), "value",
          Seq("event_type"))
        .select(col("event_type"), col("n"), r6(col("max_x")).as("max_x"),
          r6(col("logsumexp")).as("logsumexp"))
        .orderBy("event_type"),
    Some("""
      WITH m AS (
        SELECT event_type, max("value") AS mx FROM events
        WHERE "value" IS NOT NULL GROUP BY 1)
      SELECT e.event_type, count(*)::BIGINT AS n,
             round(max(m.mx), 6) AS max_x,
             round(max(m.mx) + ln(sum(exp(e."value" - m.mx))), 6)
               AS logsumexp
      FROM events e JOIN m USING (event_type)
      WHERE e."value" IS NOT NULL
      GROUP BY 1 ORDER BY 1"""))

  /** Poisson bootstrap CI for the mean event value: 200 deterministic
    * replicates off the portable-hash inverse-CDF weights. */
  private val q174 = Entry(
    "q174_poisson_bootstrap",
    (s, d) =>
      AnalysisPlanner
        .poissonBootstrapMean(Tables.events(s, d), "value",
          Seq("event_id"), b = 200, level = 0.95)
        .select(col("n"), col("b"), r6(col("mean")).as("mean"),
          r6(col("ci_lo")).as("ci_lo"), r6(col("ci_hi")).as("ci_hi")),
    Some("""
      WITH r AS (SELECT range AS rep FROM range(200)),
      w AS (
        SELECT r.rep, e."value" AS x,
               (((('0x' || substring(md5(CAST(e.event_id AS VARCHAR) || '|' ||
                      CAST(r.rep // 6 AS VARCHAR)),
                    1 + 15 * ((r.rep % 6) // 3), 15))::BIGINT
                  >> (20 * (r.rep % 3))) & 1048575) + 0.5) / 1048576.0 AS u
        FROM events e CROSS JOIN r WHERE e."value" IS NOT NULL),
      pw AS (
        SELECT rep, x,
               CASE WHEN u < 0.36787944117144233 THEN 0.0
                    WHEN u < 0.7357588823428847 THEN 1.0
                    WHEN u < 0.9196986029286058 THEN 2.0
                    WHEN u < 0.9810118431238462 THEN 3.0
                    WHEN u < 0.9963401531726563 THEN 4.0
                    WHEN u < 0.9994058151824183 THEN 5.0
                    WHEN u < 0.9999167588507119 THEN 6.0
                    WHEN u < 0.9999897508033253 THEN 7.0
                    WHEN u < 0.9999988747974051 THEN 8.0
                    ELSE 9.0 END AS wt
        FROM w),
      rm AS (SELECT rep, sum(wt * x) / sum(wt) AS m FROM pw GROUP BY 1),
      o AS (SELECT count(*)::BIGINT AS n, avg("value") AS mean
            FROM events WHERE "value" IS NOT NULL)
      SELECT o.n, count(*)::BIGINT AS b, round(o.mean, 6) AS mean,
             round(quantile_cont(rm.m, 0.025), 6) AS ci_lo,
             round(quantile_cont(rm.m, 0.975), 6) AS ci_hi
      FROM rm, o GROUP BY o.n, o.mean"""))

  /** Sorted-neighborhood blocking on supplier account balance
    * (window 3) — candidate pairs + edit distance, rank via bucketed
    * prefix sums, never a single-partition window. */
  private val q175 = Entry(
    "q175_sorted_neighborhood",
    (s, d) =>
      graft.ops.Dedup
        .sortedNeighborhood(Tables.supplier(s, d), "s_suppkey",
          "s_acctbal", 3, Seq("s_name"))
        .select(col("id_a"), col("id_b"), col("rank_gap"),
          r2(col("key_a")).as("key_a"), r2(col("key_b")).as("key_b"),
          levenshtein(col("s_name_a"), col("s_name_b")).cast("long")
            .as("edit_dist"))
        .orderBy("id_a", "id_b"),
    Some("""
      WITH r AS (
        SELECT s_suppkey AS id, s_acctbal AS k, s_name AS nm,
               row_number() OVER (ORDER BY s_acctbal, s_suppkey) AS rn
        FROM supplier WHERE s_acctbal IS NOT NULL)
      SELECT a.id AS id_a, b.id AS id_b,
             (b.rn - a.rn)::BIGINT AS rank_gap,
             round(a.k, 2) AS key_a, round(b.k, 2) AS key_b,
             levenshtein(a.nm, b.nm)::BIGINT AS edit_dist
      FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 3
      ORDER BY id_a, id_b"""))

  /** Jaro–Winkler fuzzy matching over nation-blocked supplier pairs —
    * the codegen'd native expression vs DuckDB's builtin. */
  private val q176 = Entry(
    "q176_jaro_winkler",
    (s, d) => {
      val sup = Tables.supplier(s, d)
      val a = sup.select(col("s_suppkey").as("id_a"),
        col("s_nationkey").as("nk"), col("s_name").as("name_a"))
      val b = sup.select(col("s_suppkey").as("id_b"),
        col("s_nationkey").as("nk"), col("s_name").as("name_b"))
      a.join(b, Seq("nk"))
        .where(col("id_a") < col("id_b"))
        .withColumn("jw", graft.functions.StringSimilarity
          .jaroWinkler(col("name_a"), col("name_b")))
        .where(col("jw") >= 0.9)
        .select(col("id_a"), col("id_b"), r6(col("jw")).as("jw"))
        .orderBy("id_a", "id_b")
    },
    Some("""
      SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
             round(jaro_winkler_similarity(a.s_name, b.s_name), 6) AS jw
      FROM supplier a JOIN supplier b
        ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
      WHERE jaro_winkler_similarity(a.s_name, b.s_name) >= 0.9
      ORDER BY id_a, id_b"""))

  /** Sample-ratio-mismatch gate: χ² goodness-of-fit of a 50/50
    * hash-split assignment against its declared allocation. */
  private val q177 = Entry(
    "q177_srm_check",
    (s, d) => {
      val arm = when(graft.functions.PortableHash
          .bucket(Seq(col("user_id"))) < lit(524288L), "control")
        .otherwise("treatment")
      AnalysisPlanner
        .srmCheck(Tables.events(s, d).withColumn("arm", arm), "arm",
          Map("control" -> 0.5, "treatment" -> 0.5))
        .select(col("arm"), col("n_obs"), r2(col("expected")).as("expected"),
          r6(col("chi2_contrib")).as("chi2_contrib"),
          col("undeclared_arm"), r6(col("chi2_stat")).as("chi2_stat"),
          col("dof"))
        .orderBy("arm")
    },
    Some("""
      WITH a AS (
        SELECT CASE WHEN (('0x' || substring(md5(CAST(user_id AS VARCHAR)),
                           1, 15))::BIGINT % 1048576) < 524288
                    THEN 'control' ELSE 'treatment' END AS arm
        FROM events),
      o AS (SELECT arm, count(*) AS n_obs FROM a GROUP BY 1),
      t AS (SELECT sum(n_obs)::DOUBLE AS n FROM o),
      p AS (SELECT arm, n_obs, 0.5 * t.n AS expected,
                   power(n_obs - 0.5 * t.n, 2.0) / (0.5 * t.n) AS contrib
            FROM o, t),
      r AS (SELECT sum(contrib) AS chi2, count(*) - 1 AS dof FROM p)
      SELECT p.arm, p.n_obs, round(p.expected, 2) AS expected,
             round(p.contrib, 6) AS chi2_contrib,
             false AS undeclared_arm, round(r.chi2, 6) AS chi2_stat,
             r.dof::BIGINT AS dof
      FROM p, r ORDER BY arm"""))

  /** Cross-correlation of daily purchase vs click value at lags
    * −3..3 — "which series leads?". */
  private val q178 = Entry(
    "q178_cross_correlation",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(
          coalesce(sum(when(col("event_type") === "purchase",
            col("value"))), lit(0.0)).as("x"),
          coalesce(sum(when(col("event_type") === "click",
            col("value"))), lit(0.0)).as("y"))
        .select(datediff(col("day"), to_date(lit("2024-01-01")))
          .cast("double").as("t"), col("x"), col("y"))
      graft.ops.Evaluation.crossCorrelation(daily, "t", "x", "y", 3)
        .select(col("lag"), col("n_pairs"), r6(col("ccf")).as("ccf"))
        .orderBy("lag")
    },
    Some("""
      WITH d AS (
        SELECT date_trunc('day', ts) AS day,
               coalesce(sum(CASE WHEN event_type = 'purchase'
                 THEN "value" END), 0) AS x,
               coalesce(sum(CASE WHEN event_type = 'click'
                 THEN "value" END), 0) AS y
        FROM events GROUP BY 1),
      s AS (SELECT date_diff('day', DATE '2024-01-01', day::DATE)::DOUBLE
                     AS t, x, y
            FROM d),
      st AS (SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(x * x) AS sxx,
                    sum(y) AS sy, sum(y * y) AS syy
             FROM s),
      c AS (SELECT sx / n AS mx, sy / n AS my,
                   sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)) AS den
            FROM st),
      l AS (SELECT range AS lag FROM range(-3, 4)),
      p AS (SELECT l.lag, a.x, b.y
            FROM s a JOIN l ON true JOIN s b ON a.t + l.lag = b.t)
      SELECT p.lag::BIGINT AS lag, count(*)::BIGINT AS n_pairs,
             round(sum((p.x - c.mx) * (p.y - c.my)) / max(c.den), 6) AS ccf
      FROM p, c GROUP BY 1 ORDER BY 1"""))

  /** Mutual information / entropies between return flag and line
    * status — categorical feature-relevance diagnostic. */
  private val q179 = Entry(
    "q179_mutual_information",
    (s, d) =>
      AnalysisPlanner
        .mutualInformation(Tables.lineitem(s, d), "l_returnflag",
          "l_linestatus")
        .select(col("n"), r6(col("h_x")).as("h_x"),
          r6(col("h_y")).as("h_y"), r6(col("h_xy")).as("h_xy"),
          r6(col("mi")).as("mi"), r6(col("nmi")).as("nmi")),
    Some("""
      WITH j AS (
        SELECT l_returnflag AS x, l_linestatus AS y,
               count(*)::DOUBLE AS nxy
        FROM lineitem
        WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL
        GROUP BY 1, 2),
      mx AS (SELECT x, sum(nxy) AS nx FROM j GROUP BY 1),
      my AS (SELECT y, sum(nxy) AS ny FROM j GROUP BY 1),
      t AS (SELECT sum(nxy) AS n FROM j),
      a AS (
        SELECT max(t.n) AS n,
               -sum(j.nxy / t.n * ln(mx.nx / t.n)) AS hx,
               -sum(j.nxy / t.n * ln(my.ny / t.n)) AS hy,
               -sum(j.nxy / t.n * ln(j.nxy / t.n)) AS hxy,
               sum(j.nxy / t.n *
                   ln(j.nxy * t.n / (mx.nx * my.ny))) AS mi
        FROM j JOIN mx USING (x) JOIN my USING (y), t)
      SELECT n::BIGINT AS n, round(hx, 6) AS h_x, round(hy, 6) AS h_y,
             round(hxy, 6) AS h_xy, round(mi, 6) AS mi,
             round(CASE WHEN hx > 0 AND hy > 0
                        THEN mi / sqrt(hx * hy) ELSE 0 END, 6) AS nmi
      FROM a"""))

  /** RFM segmentation of event users: quintile scores off exact
    * corpus percentile boundaries, recency inverted. */
  private val q180 = Entry(
    "q180_rfm_segments",
    (s, d) =>
      graft.ops.Behavioral
        .rfmSegments(Tables.events(s, d), "user_id", "ts", "value", 5)
        .select(col("user_id"),
          col("recency_days").cast("long").as("recency_days"),
          col("frequency").cast("long").as("frequency"),
          r2(col("monetary")).as("monetary"),
          col("r_score"), col("f_score"), col("m_score"))
        .orderBy("user_id"),
    Some("""
      WITH a AS (SELECT max(ts::DATE) AS anchor FROM events),
      u AS (
        SELECT user_id,
               min(date_diff('day', ts::DATE, a.anchor))::DOUBLE AS r,
               count(*)::DOUBLE AS f, sum("value") AS m
        FROM events, a GROUP BY user_id),
      b AS (
        SELECT quantile_cont(r, 0.2) AS r1, quantile_cont(r, 0.4) AS r2,
               quantile_cont(r, 0.6) AS r3, quantile_cont(r, 0.8) AS r4,
               quantile_cont(f, 0.2) AS f1, quantile_cont(f, 0.4) AS f2,
               quantile_cont(f, 0.6) AS f3, quantile_cont(f, 0.8) AS f4,
               quantile_cont(m, 0.2) AS m1, quantile_cont(m, 0.4) AS m2,
               quantile_cont(m, 0.6) AS m3, quantile_cont(m, 0.8) AS m4
        FROM u)
      SELECT u.user_id, u.r::BIGINT AS recency_days,
             u.f::BIGINT AS frequency, round(u.m, 2) AS monetary,
             (6 - (1 + (u.r > b.r1)::INT + (u.r > b.r2)::INT +
                   (u.r > b.r3)::INT + (u.r > b.r4)::INT))::BIGINT
               AS r_score,
             (1 + (u.f > b.f1)::INT + (u.f > b.f2)::INT +
                  (u.f > b.f3)::INT + (u.f > b.f4)::INT)::BIGINT
               AS f_score,
             (1 + (u.m > b.m1)::INT + (u.m > b.m2)::INT +
                  (u.m > b.m3)::INT + (u.m > b.m4)::INT)::BIGINT
               AS m_score
      FROM u, b ORDER BY user_id"""))

  /** Gap-based batch sessionization (1-day gap): per-user session
    * rollup on floored epoch seconds — portable across engines'
    * sub-second precision. */
  private val q181 = Entry(
    "q181_sessionize",
    (s, d) =>
      graft.ops.Behavioral
        .sessionize(Tables.events(s, d), "user_id", "ts", "event_id",
          gapSeconds = 86400L)
        .select(col("user_id"), col("session_idx"), col("n_events"),
          col("start_sec"), col("end_sec"), col("duration_sec"))
        .orderBy("user_id", "session_idx"),
    Some("""
      WITH e AS (
        SELECT user_id, event_id, floor(epoch(ts))::BIGINT AS sec
        FROM events),
      l AS (
        SELECT *, lag(sec) OVER (PARTITION BY user_id
                                 ORDER BY sec, event_id) AS prev
        FROM e),
      n AS (
        SELECT *, CASE WHEN prev IS NULL OR sec - prev > 86400
                       THEN 1 ELSE 0 END AS ns
        FROM l),
      s AS (
        SELECT *, sum(ns) OVER (PARTITION BY user_id
                                ORDER BY sec, event_id
                                ROWS UNBOUNDED PRECEDING) AS sess
        FROM n)
      SELECT user_id, sess::BIGINT AS session_idx,
             count(*)::BIGINT AS n_events,
             min(sec) AS start_sec, max(sec) AS end_sec,
             (max(sec) - min(sec)) AS duration_sec
      FROM s GROUP BY user_id, sess
      ORDER BY user_id, session_idx"""))

  /** Neyman optimal allocation of a 1000-row sample budget across
    * order priorities ∝ N_h·S_h. */
  private val q182 = Entry(
    "q182_neyman_allocation",
    (s, d) =>
      graft.ops.Sampling
        .neymanAllocation(Tables.orders(s, d), Seq("o_orderpriority"),
          "o_totalprice", 1000L)
        .select(col("o_orderpriority"), col("n_rows"),
          r6(col("stddev")).as("stddev"), col("alloc"))
        .orderBy("o_orderpriority"),
    Some("""
      WITH g AS (
        SELECT o_orderpriority, count(*)::BIGINT AS n_rows,
               coalesce(stddev_samp(o_totalprice), 0) AS sd
        FROM orders GROUP BY 1),
      t AS (SELECT sum(n_rows * sd) AS tot FROM g)
      SELECT o_orderpriority, n_rows, round(sd, 6) AS stddev,
             floor(round(1000.0 * n_rows * sd / t.tot, 6))::BIGINT
               AS alloc
      FROM g, t ORDER BY o_orderpriority"""))

  /** DSIR importance weights: English-docs target LM vs whole-corpus
    * raw LM, per-doc token log-likelihood ratio. */
  private val q183 = Entry(
    "q183_dsir_weights",
    (s, d) => {
      val docs = Tables.documents(s, d)
      graft.ops.TextAnalysis
        .dsirWeights(docs, "doc_id", "text",
          docs.where(col("lang") === "en"), "text", docs, "text")
        .select(col("doc_id"), col("n_tokens"),
          r6(col("log_ratio_sum")).as("log_ratio_sum"),
          r6(col("log_ratio_avg")).as("log_ratio_avg"))
        .orderBy("doc_id")
    },
    Some("""
      WITH tt AS (
        SELECT unnest(string_split(text, ' ')) AS term
        FROM documents WHERE lang = 'en'),
      tv AS (SELECT term, count(*) AS ct FROM tt GROUP BY 1),
      rt AS (
        SELECT unnest(string_split(text, ' ')) AS term FROM documents),
      rv AS (SELECT term, count(*) AS cr FROM rt GROUP BY 1),
      v AS (
        SELECT coalesce(rv.term, tv.term) AS term, tv.ct, rv.cr
        FROM rv FULL OUTER JOIN tv ON rv.term = tv.term),
      tot AS (SELECT sum(coalesce(ct, 0)) AS nt,
                     sum(coalesce(cr, 0)) AS nr, count(*) AS vv
              FROM v),
      tk AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents),
      sc AS (
        SELECT doc_id,
               ln((coalesce(v.ct, 0) + 1.0) / (nt + 1.0 * (vv + 1))) -
               ln((coalesce(v.cr, 0) + 1.0) / (nr + 1.0 * (vv + 1))) AS lr
        FROM tk LEFT JOIN v USING (term), tot)
      SELECT doc_id, count(*) AS n_tokens,
             round(sum(lr), 6) AS log_ratio_sum,
             round(avg(lr), 6) AS log_ratio_avg
      FROM sc GROUP BY 1 ORDER BY 1"""))

  /** Yuen's 20%-trimmed-mean robust t-test, returned vs refused
    * extended price — order statistics via grouped prefix sums. */
  private val q184 = Entry(
    "q184_yuen_ttest",
    (s, d) =>
      AnalysisPlanner
        .yuenTTest(Tables.lineitem(s, d), "l_extendedprice",
          "l_returnflag", "A", "R", trim = 0.2)
        .select(r6(col("t_stat")).as("t_stat"), r6(col("dof")).as("dof"),
          col("h_a"), col("h_b"), r6(col("tmean_a")).as("tmean_a"),
          r6(col("tmean_b")).as("tmean_b")),
    Some("""
      WITH f AS (
        SELECT l_returnflag AS g, l_extendedprice AS v
        FROM lineitem WHERE l_returnflag IN ('A', 'R')),
      vc AS (SELECT g, v, count(*)::BIGINT AS c FROM f GROUP BY 1, 2),
      p AS (
        SELECT *, coalesce(sum(c) OVER (PARTITION BY g ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS below
        FROM vc),
      sz AS (SELECT g, sum(c) AS n, floor(0.2 * sum(c))::BIGINT AS gc
             FROM vc GROUP BY 1),
      j AS (SELECT p.*, sz.n, sz.gc FROM p JOIN sz USING (g)),
      b AS (
        SELECT g, min(CASE WHEN below + c >= gc + 1 THEN v END) AS lo,
               min(CASE WHEN below + c >= n - gc THEN v END) AS hi
        FROM j GROUP BY 1),
      k AS (
        SELECT j.*, b.lo, b.hi,
               greatest(0, least(below + c, n - gc) - greatest(below, gc))
                 AS kept,
               least(greatest(v, lo), hi) AS wv
        FROM j JOIN b USING (g)),
      pg AS (
        SELECT g, max(n) AS n, max(n) - 2 * max(gc) AS h,
               sum(v * kept) / (max(n) - 2 * max(gc)) AS tmean,
               (sum(wv * wv * c) - sum(wv * c) * sum(wv * c) / max(n))
                 / (max(n) - 1) AS wvar
        FROM k GROUP BY 1),
      dd AS (SELECT g, n, h, tmean,
                    (n - 1) * wvar / (h * (h - 1)) AS d
             FROM pg),
      aa AS (SELECT h AS h_a, tmean AS tmean_a, d AS da
             FROM dd WHERE g = 'A'),
      bb AS (SELECT h AS h_b, tmean AS tmean_b, d AS db
             FROM dd WHERE g = 'R')
      SELECT round((tmean_a - tmean_b) / sqrt(da + db), 6) AS t_stat,
             round(power(da + db, 2.0) /
                   (power(da, 2.0) / (h_a - 1) +
                    power(db, 2.0) / (h_b - 1)), 6) AS dof,
             h_a::BIGINT AS h_a, h_b::BIGINT AS h_b,
             round(tmean_a, 6) AS tmean_a, round(tmean_b, 6) AS tmean_b
      FROM aa, bb"""))

  /** Covariate balance (standardized mean differences) between
    * returned and refused lineitems across four numerics — one scan. */
  private val q185 = Entry(
    "q185_covariate_balance",
    (s, d) =>
      graft.ops.Evaluation
        .covariateBalance(Tables.lineitem(s, d), "l_returnflag", "A", "R",
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .select(col("covariate"), col("n_a"), col("n_b"),
          r6(col("mean_a")).as("mean_a"), r6(col("mean_b")).as("mean_b"),
          r6(col("smd")).as("smd"))
        .orderBy("covariate"),
    Some("""
      WITH g AS (
        SELECT l_returnflag AS grp, count(*)::BIGINT AS n,
               avg(l_quantity) AS m0, var_samp(l_quantity) AS v0,
               avg(l_extendedprice) AS m1, var_samp(l_extendedprice) AS v1,
               avg(l_discount) AS m2, var_samp(l_discount) AS v2,
               avg(l_tax) AS m3, var_samp(l_tax) AS v3
        FROM lineitem WHERE l_returnflag IN ('A', 'R') GROUP BY 1),
      a AS (SELECT * FROM g WHERE grp = 'A'),
      b AS (SELECT * FROM g WHERE grp = 'R')
      SELECT c.covariate, a.n AS n_a, b.n AS n_b,
             round(CASE c.i WHEN 0 THEN a.m0 WHEN 1 THEN a.m1
                            WHEN 2 THEN a.m2 ELSE a.m3 END, 6) AS mean_a,
             round(CASE c.i WHEN 0 THEN b.m0 WHEN 1 THEN b.m1
                            WHEN 2 THEN b.m2 ELSE b.m3 END, 6) AS mean_b,
             round((CASE c.i WHEN 0 THEN a.m0 WHEN 1 THEN a.m1
                             WHEN 2 THEN a.m2 ELSE a.m3 END -
                    CASE c.i WHEN 0 THEN b.m0 WHEN 1 THEN b.m1
                             WHEN 2 THEN b.m2 ELSE b.m3 END) /
                   sqrt((CASE c.i WHEN 0 THEN a.v0 WHEN 1 THEN a.v1
                              WHEN 2 THEN a.v2 ELSE a.v3 END +
                         CASE c.i WHEN 0 THEN b.v0 WHEN 1 THEN b.v1
                              WHEN 2 THEN b.v2 ELSE b.v3 END) / 2.0), 6)
               AS smd
      FROM a, b,
           (VALUES (0, 'l_quantity'), (1, 'l_extendedprice'),
                   (2, 'l_discount'), (3, 'l_tax')) AS c(i, covariate)
      ORDER BY c.covariate"""))

  /** Rolling 7-day active users: DAU, trailing distinct (WAU) via a
    * bounded offset fan-out — no range join, no window. */
  private val q186 = Entry(
    "q186_active_users",
    (s, d) =>
      graft.ops.Behavioral
        .activeUserMetrics(Tables.events(s, d), "user_id", "ts", 7)
        .select(datediff(col("day"), to_date(lit("2024-01-01")))
            .cast("long").as("day_idx"),
          col("dau"), col("rolling_active").as("wau"),
          r6(col("stickiness")).as("stickiness"))
        .orderBy("day_idx"),
    Some("""
      WITH ud AS (SELECT DISTINCT user_id, ts::DATE AS d FROM events),
      dau AS (SELECT d, count(*)::BIGINT AS dau FROM ud GROUP BY 1),
      off AS (SELECT range AS k FROM range(7)),
      rol AS (SELECT ud.d + k::INT AS d,
                     count(DISTINCT user_id)::BIGINT AS wau
              FROM ud, off GROUP BY 1)
      SELECT date_diff('day', DATE '2024-01-01', dau.d)::BIGINT AS day_idx,
             dau.dau, rol.wau,
             round(dau.dau / rol.wau::DOUBLE, 6) AS stickiness
      FROM dau JOIN rol USING (d) ORDER BY day_idx"""))

  /** Partial correlation: quantity ↔ extended price controlling for
    * discount — one nine-sum scan. */
  private val q187 = Entry(
    "q187_partial_correlation",
    (s, d) =>
      AnalysisPlanner
        .partialCorrelation(Tables.lineitem(s, d), "l_quantity",
          "l_extendedprice", "l_discount")
        .select(col("n"), r6(col("r_xy")).as("r_xy"),
          r6(col("r_xz")).as("r_xz"), r6(col("r_yz")).as("r_yz"),
          r6(col("partial_r")).as("partial_r")),
    Some("""
      WITH m AS (
        SELECT count(*)::DOUBLE AS n,
               sum(l_quantity) AS sx, sum(l_extendedprice) AS sy,
               sum(l_discount) AS sz,
               sum(l_quantity * l_quantity) AS sxx,
               sum(l_extendedprice * l_extendedprice) AS syy,
               sum(l_discount * l_discount) AS szz,
               sum(l_quantity * l_extendedprice) AS sxy,
               sum(l_quantity * l_discount) AS sxz,
               sum(l_extendedprice * l_discount) AS syz
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
          AND l_discount IS NOT NULL),
      r AS (
        SELECT n,
               (sxy - sx * sy / n) /
                 sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)) AS rxy,
               (sxz - sx * sz / n) /
                 sqrt((sxx - sx * sx / n) * (szz - sz * sz / n)) AS rxz,
               (syz - sy * sz / n) /
                 sqrt((syy - sy * sy / n) * (szz - sz * sz / n)) AS ryz
        FROM m)
      SELECT n::BIGINT AS n, round(rxy, 6) AS r_xy, round(rxz, 6) AS r_xz,
             round(ryz, 6) AS r_yz,
             round((rxy - rxz * ryz) /
                   sqrt((1 - rxz * rxz) * (1 - ryz * ryz)), 6)
               AS partial_r
      FROM r"""))

  /** Two-predictor OLS by normal equations: extended price from
    * quantity + discount, closed-form 1-row algebra. */
  private val q188 = Entry(
    "q188_ols_normal_equations",
    (s, d) =>
      AnalysisPlanner
        .ols2(Tables.lineitem(s, d), "l_extendedprice", "l_quantity",
          "l_discount")
        .select(col("n"), r6(col("b0")).as("b0"), r6(col("b1")).as("b1"),
          r6(col("b2")).as("b2"), r6(col("r2")).as("r2"),
          r6(col("rmse")).as("rmse")),
    Some("""
      WITH m AS (
        SELECT count(*)::DOUBLE AS n,
               sum(l_quantity) AS s1, sum(l_discount) AS s2,
               sum(l_extendedprice) AS sy,
               sum(l_quantity * l_quantity) AS s11,
               sum(l_discount * l_discount) AS s22,
               sum(l_quantity * l_discount) AS s12,
               sum(l_quantity * l_extendedprice) AS s1y,
               sum(l_discount * l_extendedprice) AS s2y,
               sum(l_extendedprice * l_extendedprice) AS syy
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
          AND l_discount IS NOT NULL),
      c AS (
        SELECT n, s11 - s1 * s1 / n AS c11, s22 - s2 * s2 / n AS c22,
               s12 - s1 * s2 / n AS c12, s1y - s1 * sy / n AS c1y,
               s2y - s2 * sy / n AS c2y, syy - sy * sy / n AS cyy,
               s1 / n AS m1, s2 / n AS m2, sy / n AS my
        FROM m),
      b AS (
        SELECT *, c11 * c22 - c12 * c12 AS det FROM c),
      f AS (
        SELECT n, my, m1, m2, c1y, c2y, cyy,
               (c1y * c22 - c2y * c12) / det AS b1,
               (c2y * c11 - c1y * c12) / det AS b2
        FROM b)
      SELECT n::BIGINT AS n,
             round(my - b1 * m1 - b2 * m2, 6) AS b0,
             round(b1, 6) AS b1, round(b2, 6) AS b2,
             round(1.0 - (cyy - b1 * c1y - b2 * c2y) / cyy, 6) AS r2,
             round(sqrt((cyy - b1 * c1y - b2 * c2y) / n), 6) AS rmse
      FROM f"""))

  /** OLS influence diagnostics over the daily event-value trend:
    * leverage / residual / Cook's distance per day, map-only after a
    * 1-row moment broadcast. */
  private val q189 = Entry(
    "q189_ols_influence",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(sum(col("value")).as("y"))
        .select(datediff(col("day"), to_date(lit("2024-01-01")))
          .cast("double").as("x"), col("y"))
      AnalysisPlanner.olsInfluence(daily, Seq("x"), "x", "y")
        .select(col("x").cast("long").as("day_idx"),
          r6(col("leverage")).as("leverage"),
          r6(col("residual")).as("residual"),
          r6(col("cooks_d")).as("cooks_d"), col("influential"))
        .orderBy("day_idx")
    },
    Some("""
      WITH d AS (
        SELECT date_diff('day', DATE '2024-01-01',
                 date_trunc('day', ts)::DATE)::DOUBLE AS x,
               sum("value") AS y
        FROM events GROUP BY 1),
      m AS (
        SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
               sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
        FROM d),
      c AS (
        SELECT n, sx / n AS mx, sy / n AS my,
               sxx - sx * sx / n AS cxx, sxy - sx * sy / n AS cxy,
               syy - sy * sy / n AS cyy
        FROM m),
      f AS (
        SELECT *, cxy / cxx AS b1,
               (cyy - cxy * cxy / cxx) / (n - 2) AS s2
        FROM c)
      SELECT d.x::BIGINT AS day_idx,
             round(1.0 / f.n + (d.x - f.mx) * (d.x - f.mx) / f.cxx, 6)
               AS leverage,
             round(d.y - f.my - f.b1 * (d.x - f.mx), 6) AS residual,
             round((d.y - f.my - f.b1 * (d.x - f.mx)) *
                   (d.y - f.my - f.b1 * (d.x - f.mx)) *
                   (1.0 / f.n + (d.x - f.mx) * (d.x - f.mx) / f.cxx) /
                   (2.0 * f.s2 *
                    (1.0 - (1.0 / f.n + (d.x - f.mx) * (d.x - f.mx)
                            / f.cxx)) *
                    (1.0 - (1.0 / f.n + (d.x - f.mx) * (d.x - f.mx)
                            / f.cxx))), 6) AS cooks_d,
             ((d.y - f.my - f.b1 * (d.x - f.mx)) *
              (d.y - f.my - f.b1 * (d.x - f.mx)) *
              (1.0 / f.n + (d.x - f.mx) * (d.x - f.mx) / f.cxx) /
              (2.0 * f.s2 *
               (1.0 - (1.0 / f.n + (d.x - f.mx) * (d.x - f.mx) / f.cxx)) *
               (1.0 - (1.0 / f.n + (d.x - f.mx) * (d.x - f.mx) / f.cxx))))
              > 4.0 / f.n AS influential
      FROM d, f ORDER BY day_idx"""))

  /** N-gram novelty: share of each doc's distinct trigrams unseen in
    * the doc_id<100 reference slice. */
  private val q190 = Entry(
    "q190_ngram_novelty",
    (s, d) => {
      val docs = Tables.documents(s, d)
      graft.ops.Dedup
        .ngramNovelty(docs, "doc_id", "text",
          docs.where(col("doc_id") < 100), "text", n = 3)
        .select(col("doc_id"), col("n_ngrams"), col("n_seen"),
          r6(col("novelty")).as("novelty"))
        .orderBy("doc_id")
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      sh AS (
        SELECT DISTINCT doc_id AS id,
               unnest(list_transform(range(1, len(w) - 1),
                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        FROM toks WHERE len(w) >= 3),
      refg AS (SELECT DISTINCT s FROM sh WHERE id < 100)
      SELECT sh.id AS doc_id, count(*) AS n_ngrams,
             sum(CASE WHEN refg.s IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
               AS n_seen,
             round(1.0 - sum(CASE WHEN refg.s IS NOT NULL
                             THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
               AS novelty
      FROM sh LEFT JOIN refg ON sh.s = refg.s
      GROUP BY 1 ORDER BY 1"""))

  /** Sequential monitor: daily cumulative Welch z between hash-split
    * arms vs the O'Brien–Fleming z_c/√t boundary. */
  private val q191 = Entry(
    "q191_sequential_monitor",
    (s, d) => {
      val arm = when(graft.functions.PortableHash
          .bucket(Seq(col("user_id"))) < lit(524288L), "control")
        .otherwise("treatment")
      AnalysisPlanner
        .sequentialMonitor(Tables.events(s, d).withColumn("arm", arm),
          "ts", "arm", "value", "control", "treatment")
        .select(datediff(col("day"), to_date(lit("2024-01-01")))
            .cast("long").as("day_idx"),
          col("n_a"), col("n_b"), r6(col("z")).as("z"),
          r6(col("info_frac")).as("info_frac"),
          r6(col("boundary")).as("boundary"), col("crossed"))
        .orderBy("day_idx")
    },
    Some("""
      WITH a AS (
        SELECT CASE WHEN (('0x' || substring(md5(CAST(user_id AS VARCHAR)),
                           1, 15))::BIGINT % 1048576) < 524288
                    THEN 'control' ELSE 'treatment' END AS arm,
               ts::DATE AS day, "value" AS v
        FROM events WHERE "value" IS NOT NULL),
      d AS (SELECT arm, day, count(*) AS n, sum(v) AS s,
                   sum(v * v) AS ss
            FROM a GROUP BY 1, 2),
      c AS (SELECT arm, day,
                   sum(n) OVER w AS cn, sum(s) OVER w AS cs,
                   sum(ss) OVER w AS css
            FROM d
            WINDOW w AS (PARTITION BY arm ORDER BY day
                         ROWS UNBOUNDED PRECEDING)),
      t AS (SELECT sum(n)::DOUBLE AS ntot FROM d),
      ca AS (SELECT day, cn AS n_a, cs / cn AS ma,
                    (css - cs * cs / cn) / (cn - 1) AS va
             FROM c WHERE arm = 'control'),
      cb AS (SELECT day, cn AS n_b, cs / cn AS mb,
                    (css - cs * cs / cn) / (cn - 1) AS vb
             FROM c WHERE arm = 'treatment')
      SELECT date_diff('day', DATE '2024-01-01', ca.day)::BIGINT
               AS day_idx,
             n_a::BIGINT AS n_a, n_b::BIGINT AS n_b,
             round(CASE WHEN n_a > 1 AND n_b > 1 THEN
               (ma - mb) / sqrt(va / n_a + vb / n_b) END, 6) AS z,
             round((n_a + n_b) / t.ntot, 6) AS info_frac,
             round(2.797 / sqrt((n_a + n_b) / t.ntot), 6) AS boundary,
             (abs((ma - mb) / sqrt(va / n_a + vb / n_b)) >
              2.797 / sqrt((n_a + n_b) / t.ntot)) AS crossed
      FROM ca JOIN cb USING (day), t ORDER BY day_idx"""))

  /** Difference-in-differences: purchase vs click value around a
    * mid-month cutover — 2×2 cells, closed-form SE. */
  private val q192 = Entry(
    "q192_diff_in_diff",
    (s, d) =>
      graft.ops.Evaluation
        .diffInDiff(Tables.events(s, d), "event_type", "purchase",
          "click", to_date(col("ts")) >= lit("2024-01-15"), "value")
        .select(r6(col("mean_treat_pre")).as("mean_treat_pre"),
          r6(col("mean_treat_post")).as("mean_treat_post"),
          r6(col("mean_ctrl_pre")).as("mean_ctrl_pre"),
          r6(col("mean_ctrl_post")).as("mean_ctrl_post"),
          r6(col("did")).as("did"), r6(col("se")).as("se"),
          r6(col("t_stat")).as("t_stat")),
    Some("""
      WITH c AS (
        SELECT event_type AS g, (ts::DATE >= DATE '2024-01-15') AS p,
               count(*)::DOUBLE AS n, avg("value") AS m,
               var_samp("value") AS v
        FROM events
        WHERE event_type IN ('purchase', 'click')
          AND "value" IS NOT NULL
        GROUP BY 1, 2),
      tp0 AS (SELECT m, v / n AS se FROM c WHERE g = 'purchase' AND NOT p),
      tp1 AS (SELECT m, v / n AS se FROM c WHERE g = 'purchase' AND p),
      cp0 AS (SELECT m, v / n AS se FROM c WHERE g = 'click' AND NOT p),
      cp1 AS (SELECT m, v / n AS se FROM c WHERE g = 'click' AND p)
      SELECT round(tp0.m, 6) AS mean_treat_pre,
             round(tp1.m, 6) AS mean_treat_post,
             round(cp0.m, 6) AS mean_ctrl_pre,
             round(cp1.m, 6) AS mean_ctrl_post,
             round((tp1.m - tp0.m) - (cp1.m - cp0.m), 6) AS did,
             round(sqrt(tp0.se + tp1.se + cp0.se + cp1.se), 6) AS se,
             round(((tp1.m - tp0.m) - (cp1.m - cp0.m)) /
                   sqrt(tp0.se + tp1.se + cp0.se + cp1.se), 6) AS t_stat
      FROM tp0, tp1, cp0, cp1"""))

  /** Uplift by segment: per event type, hash-split treatment-vs-
    * control mean difference with Welch SE. */
  private val q193 = Entry(
    "q193_uplift_by_segment",
    (s, d) => {
      val arm = when(graft.functions.PortableHash
          .bucket(Seq(col("user_id"))) < lit(524288L), "control")
        .otherwise("treatment")
      graft.ops.Evaluation
        .upliftBySegment(Tables.events(s, d).withColumn("arm", arm),
          "arm", "treatment", "control", "event_type", "value")
        .select(col("segment"), col("n_treat"), col("n_ctrl"),
          r6(col("mean_treat")).as("mean_treat"),
          r6(col("mean_ctrl")).as("mean_ctrl"),
          r6(col("uplift")).as("uplift"), r6(col("se")).as("se"),
          r6(col("t_stat")).as("t_stat"))
        .orderBy("segment")
    },
    Some("""
      WITH a AS (
        SELECT event_type AS segment,
               CASE WHEN (('0x' || substring(md5(CAST(user_id AS VARCHAR)),
                           1, 15))::BIGINT % 1048576) < 524288
                    THEN 'control' ELSE 'treatment' END AS arm,
               "value" AS v
        FROM events WHERE "value" IS NOT NULL),
      g AS (SELECT segment, arm, count(*)::BIGINT AS n, avg(v) AS m,
                   var_samp(v) AS vv
            FROM a GROUP BY 1, 2),
      t AS (SELECT segment, n AS n_treat, m AS mt, vv AS vt
            FROM g WHERE arm = 'treatment'),
      c AS (SELECT segment, n AS n_ctrl, m AS mc, vv AS vc
            FROM g WHERE arm = 'control')
      SELECT t.segment, n_treat, n_ctrl,
             round(mt, 6) AS mean_treat, round(mc, 6) AS mean_ctrl,
             round(mt - mc, 6) AS uplift,
             round(sqrt(vt / n_treat + vc / n_ctrl), 6) AS se,
             round((mt - mc) / sqrt(vt / n_treat + vc / n_ctrl), 6)
               AS t_stat
      FROM t JOIN c USING (segment) ORDER BY segment"""))

  /** McNemar paired-binary test: per user, purchased-before vs
    * purchased-after the mid-month cutover — discordant cells only. */
  private val q194 = Entry(
    "q194_mcnemar",
    (s, d) => {
      val ev = Tables.events(s, d)
      val purchased = (pre: Boolean) => {
        val side = if (pre) to_date(col("ts")) < lit("2024-01-15")
          else to_date(col("ts")) >= lit("2024-01-15")
        coalesce(sum(when(col("event_type") === "purchase" && side, 1L)),
          lit(0L)) > 0
      }
      val pairs = ev.groupBy("user_id")
        .agg(purchased(true).as("a"), purchased(false).as("b"))
      AnalysisPlanner.mcnemarTest(pairs, "a", "b")
        .select(col("n_both"), col("n_a_only"), col("n_b_only"),
          col("n_neither"), r6(col("chi2")).as("chi2"))
    },
    Some("""
      WITH p AS (
        SELECT user_id,
               bool_or(event_type = 'purchase' AND
                       ts::DATE < DATE '2024-01-15') AS a,
               bool_or(event_type = 'purchase' AND
                       ts::DATE >= DATE '2024-01-15') AS b
        FROM events GROUP BY 1),
      c AS (SELECT
              sum(CASE WHEN a AND b THEN 1 ELSE 0 END)::BIGINT AS n_both,
              sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END)::BIGINT
                AS n_a_only,
              sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END)::BIGINT
                AS n_b_only,
              sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END)::BIGINT
                AS n_neither
            FROM p)
      SELECT n_both, n_a_only, n_b_only, n_neither,
             round(CASE WHEN n_a_only + n_b_only > 0 THEN
               power(abs(n_a_only - n_b_only) - 1.0, 2) /
                 (n_a_only + n_b_only) END, 6) AS chi2
      FROM c"""))

  /** Minimum detectable effect at current traffic: per event type,
    * the effect size the hash-split experiment could detect at
    * α=0.05 / 80% power. */
  private val q195 = Entry(
    "q195_min_detectable_effect",
    (s, d) => {
      val arm = when(graft.functions.PortableHash
          .bucket(Seq(col("user_id"))) < lit(524288L), "control")
        .otherwise("treatment")
      graft.ops.Evaluation
        .minDetectableEffect(Tables.events(s, d).withColumn("arm", arm),
          "arm", "treatment", "control", "event_type", "value")
        .select(col("segment"), col("n_treat"), col("n_ctrl"),
          r6(col("mean_ctrl")).as("mean_ctrl"), r6(col("se")).as("se"),
          r6(col("mde_abs")).as("mde_abs"),
          r6(col("mde_rel")).as("mde_rel"))
        .orderBy("segment")
    },
    Some("""
      WITH a AS (
        SELECT event_type AS segment,
               CASE WHEN (('0x' || substring(md5(CAST(user_id AS VARCHAR)),
                           1, 15))::BIGINT % 1048576) < 524288
                    THEN 'control' ELSE 'treatment' END AS arm,
               "value" AS v
        FROM events WHERE "value" IS NOT NULL),
      g AS (SELECT segment, arm, count(*)::BIGINT AS n, avg(v) AS m,
                   var_samp(v) AS vv
            FROM a GROUP BY 1, 2),
      t AS (SELECT segment, n AS n_treat, vv AS vt
            FROM g WHERE arm = 'treatment'),
      c AS (SELECT segment, n AS n_ctrl, m AS mc, vv AS vc
            FROM g WHERE arm = 'control')
      SELECT t.segment, n_treat, n_ctrl, round(mc, 6) AS mean_ctrl,
             round(sqrt(vt / n_treat + vc / n_ctrl), 6) AS se,
             round(2.801585 * sqrt(vt / n_treat + vc / n_ctrl), 6)
               AS mde_abs,
             round(2.801585 * sqrt(vt / n_treat + vc / n_ctrl) / mc, 6)
               AS mde_rel
      FROM t JOIN c USING (segment) ORDER BY segment"""))

  /** Two-sided CUSUM mean-shift monitor over the daily mean-value
    * series per event type (k=0.5, h=4, running-min identity). */
  private val q196 = Entry(
    "q196_cusum",
    (s, d) => {
      val daily = Tables.events(s, d)
        .where(col("value").isNotNull)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(avg(col("value")).as("mean_v"))
      graft.ops.TimeSeries
        .cusum(daily, Seq("event_type"), "day", "mean_v")
        .select(col("event_type"),
          datediff(col("day"), to_date(lit("2024-01-01")))
            .cast("long").as("day_idx"),
          r6(col("z")).as("z"), r6(col("cusum_pos")).as("cusum_pos"),
          r6(col("cusum_neg")).as("cusum_neg"), col("alarm"))
        .orderBy("event_type", "day_idx")
    },
    Some("""
      WITH daily AS (
        SELECT event_type, ts::DATE AS day, avg("value") AS v
        FROM events WHERE "value" IS NOT NULL GROUP BY 1, 2),
      st AS (SELECT event_type, avg(v) AS mu, stddev_samp(v) AS sd
             FROM daily GROUP BY 1),
      z AS (SELECT d.event_type, d.day,
                   CASE WHEN st.sd > 0 THEN (d.v - st.mu) / st.sd
                        ELSE 0.0 END AS z
            FROM daily d JOIN st USING (event_type)),
      s AS (SELECT event_type, day, z,
                   sum(z - 0.5) OVER w AS sp,
                   sum(-z - 0.5) OVER w AS sn
            FROM z
            WINDOW w AS (PARTITION BY event_type ORDER BY day
                         ROWS UNBOUNDED PRECEDING)),
      c AS (SELECT event_type, day, z,
                   sp - least(0.0, min(sp) OVER w) AS cpos,
                   sn - least(0.0, min(sn) OVER w) AS cneg
            FROM s
            WINDOW w AS (PARTITION BY event_type ORDER BY day
                         ROWS UNBOUNDED PRECEDING))
      SELECT event_type,
             date_diff('day', DATE '2024-01-01', day)::BIGINT AS day_idx,
             round(z, 6) AS z, round(cpos, 6) AS cusum_pos,
             round(cneg, 6) AS cusum_neg,
             (cpos > 4.0 OR cneg > 4.0) AS alarm
      FROM c ORDER BY event_type, day_idx"""))

  /** Seasonal-naive forecast scorecard: sMAPE / WAPE / MASE of the
    * lag-7 forecast over the daily spend series per event type. */
  private val q197 = Entry(
    "q197_forecast_accuracy",
    (s, d) => {
      val daily = Tables.events(s, d)
        .where(col("value").isNotNull)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(col("value")).as("spend"))
      graft.ops.Evaluation
        .forecastAccuracy(daily, Seq("event_type"), "day", "spend", 7)
        .select(col("event_type"), col("n_points"),
          r6(col("smape")).as("smape"), r6(col("wape")).as("wape"),
          r6(col("mase")).as("mase"))
        .orderBy("event_type")
    },
    Some("""
      WITH daily AS (
        SELECT event_type, ts::DATE AS day, sum("value") AS a
        FROM events WHERE "value" IS NOT NULL GROUP BY 1, 2),
      lagged AS (
        SELECT event_type, a,
               lag(a, 7) OVER w AS f, lag(a, 1) OVER w AS nv
        FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)),
      s AS (SELECT * FROM lagged WHERE f IS NOT NULL AND nv IS NOT NULL)
      SELECT event_type, count(*)::BIGINT AS n_points,
             round(avg(CASE WHEN abs(a) + abs(f) <> 0 THEN
               2.0 * abs(a - f) / (abs(a) + abs(f)) END), 6) AS smape,
             round(sum(abs(a - f)) / sum(abs(a)), 6) AS wape,
             round(avg(abs(a - f)) / avg(abs(a - nv)), 6) AS mase
      FROM s GROUP BY 1 ORDER BY 1"""))

  /** k-anonymity risk profile of customer quasi-identifiers
    * (nation × market segment): group-size histogram + at-risk flag. */
  private val q198 = Entry(
    "q198_k_anonymity",
    (s, d) =>
      graft.ops.Profiling
        .kAnonymityProfile(Tables.customer(s, d),
          Seq("c_nationkey", "c_mktsegment"), riskK = 5)
        .select(col("k"), col("n_classes"), col("n_rows"),
          col("at_risk"), r6(col("row_share")).as("row_share"))
        .orderBy("k"),
    Some("""
      WITH c AS (
        SELECT c_nationkey, c_mktsegment, count(*) AS sz
        FROM customer GROUP BY 1, 2),
      t AS (SELECT count(*)::DOUBLE AS tot FROM customer)
      SELECT sz::BIGINT AS k, count(*)::BIGINT AS n_classes,
             sum(sz)::BIGINT AS n_rows, (sz < 5) AS at_risk,
             round(sum(sz) / t.tot, 6) AS row_share
      FROM c, t GROUP BY sz, t.tot ORDER BY k"""))

  /** Good–Turing frequency-of-frequencies over word TRIGRAMS (the
    * unigram vocabulary is tiny and saturated): unseen mass and
    * adjusted counts for the low-frequency bands. */
  private val q199 = Entry(
    "q199_good_turing",
    (s, d) =>
      graft.ops.TextAnalysis
        .goodTuring(Tables.documents(s, d), "text", maxR = 5, n = 3)
        .select(col("r"), col("n_types"),
          r6(col("token_share")).as("token_share"),
          r6(col("r_star")).as("r_star"), r6(col("p0")).as("p0"))
        .orderBy("r"),
    Some("""
      WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term,
               generate_subscripts(string_split(text, ' '), 1) AS ord
        FROM documents),
      tk AS (
        SELECT term || '_' || lead(term) OVER w || '_' ||
               lead(term, 2) OVER w AS w
        FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY ord)),
      tc AS (SELECT w, count(*) AS r FROM tk WHERE w IS NOT NULL
             GROUP BY 1),
      b AS (SELECT r, count(*) AS n_types FROM tc
            WHERE r <= 6 GROUP BY 1),
      tot AS (SELECT sum(r)::DOUBLE AS n,
                     sum(CASE WHEN r = 1 THEN 1 ELSE 0 END)::DOUBLE AS n1
              FROM tc)
      SELECT b.r::BIGINT AS r, b.n_types::BIGINT AS n_types,
             round(b.r * b.n_types / tot.n, 6) AS token_share,
             round((b.r + 1) * COALESCE(b2.n_types, 0) /
                   b.n_types::DOUBLE, 6) AS r_star,
             round(tot.n1 / tot.n, 6) AS p0
      FROM b LEFT JOIN b AS b2 ON b2.r = b.r + 1, tot
      WHERE b.r <= 5 ORDER BY r"""))

  /** Community detection by deterministic synchronous label
    * propagation over the customer↔supplier interaction graph (q158's
    * edge set) — 3 fixed rounds, ties to the smallest label. */
  private val q200 = Entry(
    "q200_label_propagation",
    (s, d) => {
      val edges = custSuppEdges(s, d)
      graft.ops.Graph.labelPropagation(edges, "src", "dst", iterations = 3)
        .orderBy("node")
    },
    Some("""
      WITH ed AS (
        SELECT DISTINCT 'c' || o_custkey AS a, 's' || l_suppkey AS b
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      e AS (SELECT a, b FROM ed UNION SELECT b, a FROM ed),
      l0 AS (SELECT DISTINCT a AS node, a AS label FROM e),
      v1 AS (SELECT e.a AS node, l.label, count(*) AS c
             FROM e JOIN l0 l ON e.b = l.node GROUP BY 1, 2),
      l1 AS (SELECT node, label FROM (
               SELECT node, label, row_number() OVER (PARTITION BY node
                 ORDER BY c DESC, label) AS rn FROM v1) WHERE rn = 1),
      v2 AS (SELECT e.a AS node, l.label, count(*) AS c
             FROM e JOIN l1 l ON e.b = l.node GROUP BY 1, 2),
      l2 AS (SELECT node, label FROM (
               SELECT node, label, row_number() OVER (PARTITION BY node
                 ORDER BY c DESC, label) AS rn FROM v2) WHERE rn = 1),
      v3 AS (SELECT e.a AS node, l.label, count(*) AS c
             FROM e JOIN l2 l ON e.b = l.node GROUP BY 1, 2),
      l3 AS (SELECT node, label FROM (
               SELECT node, label, row_number() OVER (PARTITION BY node
                 ORDER BY c DESC, label) AS rn FROM v3) WHERE rn = 1)
      SELECT node, label FROM l3 ORDER BY node"""))

  /** Per-entity temporal train/val split: each user's last ~20% of
    * events (by ts, event_id tie-break) go to validation; per-user
    * counts plus the validation boundary verify the cut exactly. */
  private val q201 = Entry(
    "q201_temporal_split",
    (s, d) =>
      graft.ops.Sampling
        .temporalSplit(Tables.events(s, d), Seq("user_id"),
          Seq("ts", "event_id"), valFrac = 0.2)
        .groupBy("user_id")
        .agg(sum(when(col("split") === "train", 1L).otherwise(0L))
            .as("n_train"),
          sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"),
          max(when(col("split") === "train", col("ts"))).as("last_train_ts"),
          min(when(col("split") === "val", col("ts"))).as("first_val_ts"))
        .orderBy("user_id"),
    Some("""
      WITH r AS (
        SELECT user_id, event_id, ts,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n
        FROM events),
      s AS (
        SELECT user_id, ts,
               CASE WHEN rn > n - least(CAST(ceil(n * 0.2) AS BIGINT),
                                        n - 1)
                    THEN 'val' ELSE 'train' END AS split
        FROM r)
      SELECT user_id,
             CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_train,
             CAST(sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_val,
             max(CASE WHEN split = 'train' THEN ts END) AS last_train_ts,
             min(CASE WHEN split = 'val' THEN ts END) AS first_val_ts
      FROM s GROUP BY 1 ORDER BY 1"""))

  /** Temperature-weighted corpus mixture plan with epoch caps and one
    * waterfall redistribution round over the per-source token stats. */
  private val q202 = Entry(
    "q202_mixture_plan",
    (s, d) =>
      graft.ops.Sampling
        .mixturePlan(
          Tables.documents(s, d)
            .select(col("source"),
              size(split(col("text"), " ")).cast("long").as("n_tokens")),
          "source", "n_tokens", budget = 40000L, temperature = 2.0,
          maxEpochs = 1.5)
        .select(col("source"), col("n_tokens"),
          r6(col("weight")).as("weight"),
          r6(col("alloc_tokens")).as("alloc_tokens"),
          r6(col("epochs")).as("epochs"))
        .orderBy("source"),
    Some("""
      WITH t AS (
        SELECT source,
               CAST(len(string_split(text, ' ')) AS DOUBLE) AS tok
        FROM documents),
      ps AS (SELECT source, sum(tok) AS n_tokens FROM t GROUP BY 1),
      w AS (SELECT source, n_tokens, pow(n_tokens, 1.0 / 2.0) AS wr
            FROM ps),
      tw AS (SELECT sum(wr) AS tw FROM w),
      f0 AS (SELECT source, n_tokens, wr, wr / tw AS weight,
                    n_tokens * 1.5 AS cap
             FROM w, tw),
      f AS (SELECT *, least(weight * 40000, cap) AS a0,
                   weight * 40000 > cap AS capped
            FROM f0),
      lo AS (SELECT 40000.0 - sum(a0) AS lft,
                    COALESCE(sum(CASE WHEN NOT capped THEN wr END), 0)
                      AS wu
             FROM f)
      SELECT source, n_tokens, round(weight, 6) AS weight,
             round(CASE WHEN capped OR wu = 0 THEN a0
                        ELSE least(a0 + lft * wr / wu, cap) END, 6)
               AS alloc_tokens,
             round(CASE WHEN capped OR wu = 0 THEN a0
                        ELSE least(a0 + lft * wr / wu, cap) END
                   / n_tokens, 6) AS epochs
      FROM f, lo ORDER BY source"""))

  /** Per-segment classifier eval: the q142 pseudo-model graded within
    * each order status — grouped rank-AUC via per-group prefix sums
    * (same shuffle count as the corpus-level metric). */
  private val q203 = Entry(
    "q203_grouped_auc",
    (s, d) =>
      graft.ops.Evaluation
        .binaryMetrics(
          Tables.orders(s, d).select(col("o_orderstatus").as("seg"),
            when((col("o_orderkey") % 100).cast("double") <
              col("o_totalprice") / 5000.0, lit(1.0)).otherwise(lit(0.0))
              .as("label"),
            (col("o_totalprice") / 600000.0).as("score")),
          "label", "score", groupCols = Seq("seg"))
        .select(col("seg"), col("n"), col("n_pos"), col("n_neg"),
          r6(col("auc")).as("auc"), r6(col("log_loss")).as("log_loss"),
          r6(col("brier")).as("brier"))
        .orderBy("seg"),
    Some("""
      WITH sc AS (
        SELECT o_orderstatus AS seg,
               CASE WHEN (o_orderkey % 100) < o_totalprice / 5000.0
                    THEN 1.0 ELSE 0.0 END AS y,
               o_totalprice / 600000.0 AS p
        FROM orders),
      r AS (SELECT seg, y, p,
                   rank() OVER (PARTITION BY seg ORDER BY p) AS rmin,
                   count(*) OVER (PARTITION BY seg, p) AS c
            FROM sc),
      a AS (SELECT seg, count(*)::DOUBLE AS n, sum(y) AS np,
                   sum(CASE WHEN y = 1 THEN rmin + (c - 1) / 2.0 END)
                     AS rpos
            FROM r GROUP BY seg),
      m AS (SELECT seg,
                   avg(-(y * ln(least(greatest(p, 1e-15), 1 - 1e-15)) +
                     (1 - y) * ln(1 - least(greatest(p, 1e-15),
                                            1 - 1e-15)))) AS log_loss,
                   avg(pow(p - y, 2)) AS brier
            FROM sc GROUP BY seg)
      SELECT a.seg, n::BIGINT AS n, np::BIGINT AS n_pos,
             (n - np)::BIGINT AS n_neg,
             round((rpos - np * (np + 1) / 2.0) / (np * (n - np)), 6)
               AS auc,
             round(log_loss, 6) AS log_loss, round(brier, 6) AS brier
      FROM a JOIN m ON a.seg = m.seg ORDER BY a.seg"""))

  /** Johnson–Lindenstrauss random projection 64→4 dims: fixed
    * md5-derived matrix (the q26 driver-literal trick), map-only
    * native dots — the oracle inlines the identical weights. */
  private val q204 = Entry(
    "q204_random_project",
    (s, d) => {
      val out = graft.ops.Features.randomProject(
        Tables.embeddings(s, d), "vec_id", "embedding",
        inDim = 64, outDim = 4)
      out.select(col("vec_id") +:
        (0 until 4).map(j => r6(col("projected")(j)).as(s"p$j")): _*)
        .orderBy("vec_id")
    },
    Some {
      val w = (0 until 4).map(j =>
        graft.ops.Similarity.planeWeights(j, 64)
          .mkString("[", ", ", "]"))
      s"""
      SELECT vec_id,
             round(list_dot_product(embedding::DOUBLE[], ${w(0)}) * 0.5,
                   6) AS p0,
             round(list_dot_product(embedding::DOUBLE[], ${w(1)}) * 0.5,
                   6) AS p1,
             round(list_dot_product(embedding::DOUBLE[], ${w(2)}) * 0.5,
                   6) AS p2,
             round(list_dot_product(embedding::DOUBLE[], ${w(3)}) * 0.5,
                   6) AS p3
      FROM embeddings ORDER BY vec_id"""
    })

  /** Shared pseudo-observational frame for q205/q206: the q142 coin as
    * non-randomized "treatment", price-derived propensity & outcome. */
  private def obsOrders(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      when((col("o_orderkey") % 100).cast("double") <
        col("o_totalprice") / 5000.0, 1L).otherwise(0L).as("t"),
      (col("o_totalprice") / 600000.0).as("p"),
      (col("o_totalprice") / 1000.0).as("y"))

  private val obsOrdersSql = """
      sc AS (SELECT CASE WHEN (o_orderkey % 100) < o_totalprice / 5000.0
                         THEN 1 ELSE 0 END AS t,
                    o_totalprice / 600000.0 AS p,
                    o_totalprice / 1000.0 AS y
             FROM orders)"""

  /** Propensity-score subclassification: 5 equal-width strata,
    * treated-weighted pooled ATT; strata missing an arm surface with
    * NULL diff instead of silently biasing the pool. */
  private val q205 = Entry(
    "q205_propensity_att",
    (s, d) =>
      graft.ops.Evaluation
        .propensityStratification(obsOrders(s, d), col("t") === 1L,
          "p", "y", bins = 5)
        .select(col("stratum"), col("p_lo"), col("p_hi"), col("n_treat"),
          col("n_ctrl"), r6(col("mean_treat")).as("mean_treat"),
          r6(col("mean_ctrl")).as("mean_ctrl"), r6(col("diff")).as("diff"),
          r6(col("att")).as("att"))
        .orderBy("stratum"),
    Some(s"""
      WITH $obsOrdersSql,
      c AS (
        SELECT least(CAST(floor(p * 5) AS BIGINT), 4) AS stratum,
               count(CASE WHEN t = 1 THEN 1 END) AS n_treat,
               avg(CASE WHEN t = 1 THEN y END) AS mean_treat,
               count(CASE WHEN t = 0 THEN 1 END) AS n_ctrl,
               avg(CASE WHEN t = 0 THEN y END) AS mean_ctrl
        FROM sc GROUP BY 1),
      cd AS (
        SELECT *, CASE WHEN n_treat > 0 AND n_ctrl > 0
                       THEN mean_treat - mean_ctrl END AS diff
        FROM c),
      pool AS (SELECT sum(diff * n_treat) / sum(n_treat) AS att
               FROM cd WHERE diff IS NOT NULL)
      SELECT stratum, stratum / 5.0 AS p_lo, (stratum + 1) / 5.0 AS p_hi,
             n_treat, n_ctrl, round(mean_treat, 6) AS mean_treat,
             round(mean_ctrl, 6) AS mean_ctrl, round(diff, 6) AS diff,
             round(att, 6) AS att
      FROM cd, pool ORDER BY stratum"""))

  /** Hájek-normalized inverse-propensity ATE with overlap clipping —
    * one aggregation, one row. */
  private val q206 = Entry(
    "q206_ipw_ate",
    (s, d) =>
      graft.ops.Evaluation
        .ipwEffect(obsOrders(s, d), col("t") === 1L, "p", "y",
          clip = 0.01)
        .select(col("n"), col("n_treat"),
          r6(col("mean_treat_w")).as("mean_treat_w"),
          r6(col("mean_ctrl_w")).as("mean_ctrl_w"),
          r6(col("ate")).as("ate")),
    Some(s"""
      WITH $obsOrdersSql,
      cl AS (SELECT t, y,
                    least(greatest(p, 0.01), 0.99) AS pc
             FROM sc)
      SELECT count(*) AS n,
             CAST(sum(t) AS BIGINT) AS n_treat,
             round(sum(t * y / pc) / sum(t / pc), 6) AS mean_treat_w,
             round(sum((1 - t) * y / (1 - pc)) /
                   sum((1 - t) / (1 - pc)), 6) AS mean_ctrl_w,
             round(sum(t * y / pc) / sum(t / pc) -
                   sum((1 - t) * y / (1 - pc)) /
                   sum((1 - t) / (1 - pc)), 6) AS ate
      FROM cl"""))

  /** Benford first-digit conformity of order totals: 9 digit rows with
    * observed-vs-log10(1+1/d) frequencies, MAD and χ² repeated. */
  private val q207 = Entry(
    "q207_benford",
    (s, d) =>
      graft.ops.Profiling
        .benfordConformity(Tables.orders(s, d), "o_totalprice")
        .select(col("digit"), col("n"), r6(col("observed")).as("observed"),
          r6(col("expected")).as("expected"), r6(col("mad")).as("mad"),
          r6(col("chi2")).as("chi2"))
        .orderBy("digit"),
    Some("""
      WITH v AS (SELECT abs(o_totalprice) AS x FROM orders
                 WHERE abs(o_totalprice) > 0),
      c AS (SELECT CAST(floor(x / pow(10.0, floor(log10(x)))) AS BIGINT)
                     AS digit,
                   count(*) AS n
            FROM v GROUP BY 1),
      g AS (SELECT d.digit, COALESCE(c.n, 0) AS n
            FROM (SELECT unnest(generate_series(1, 9)) AS digit) d
            LEFT JOIN c ON c.digit = d.digit),
      tot AS (SELECT CAST(sum(n) AS DOUBLE) AS nt FROM g),
      p AS (SELECT digit, n, n / nt AS observed,
                   log10(1.0 + 1.0 / digit) AS expected
            FROM g, tot),
      sc AS (SELECT avg(abs(observed - expected)) AS mad,
                    (SELECT nt FROM tot) *
                      sum(pow(observed - expected, 2) / expected) AS chi2
             FROM p)
      SELECT digit, n, round(observed, 6) AS observed,
             round(expected, 6) AS expected, round(mad, 6) AS mad,
             round(chi2, 6) AS chi2
      FROM p, sc ORDER BY digit"""))

  /** Conversion-window funnel: each step must land within 7 days of
    * the previous step's reach time (q113's unbounded counterpart). */
  private val q208 = Entry(
    "q208_windowed_funnel",
    (s, d) =>
      graft.ops.Behavioral
        .funnel(Tables.events(s, d), "user_id", "ts", "event_type",
          Seq("signup", "view", "click", "purchase"),
          maxGapSeconds = Some(7L * 86400))
        .orderBy("step_idx"),
    Some("""
      WITH s1 AS (
        SELECT user_id, min(ts) AS t FROM events
        WHERE event_type = 'signup' GROUP BY 1),
      s2 AS (
        SELECT e.user_id, min(e.ts) AS t FROM events e
        JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'view' AND e.ts >= s1.t
          AND epoch_us(e.ts) - epoch_us(s1.t) <= 604800000000
        GROUP BY 1),
      s3 AS (
        SELECT e.user_id, min(e.ts) AS t FROM events e
        JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'click' AND e.ts >= s2.t
          AND epoch_us(e.ts) - epoch_us(s2.t) <= 604800000000
        GROUP BY 1),
      s4 AS (
        SELECT e.user_id, min(e.ts) AS t FROM events e
        JOIN s3 ON e.user_id = s3.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= s3.t
          AND epoch_us(e.ts) - epoch_us(s3.t) <= 604800000000
        GROUP BY 1)
      SELECT 1 AS step_idx, 'signup' AS step, count(*) AS n_users FROM s1
      UNION ALL
      SELECT 2, 'view', count(*) FROM s2
      UNION ALL
      SELECT 3, 'click', count(*) FROM s3
      UNION ALL
      SELECT 4, 'purchase', count(*) FROM s4
      ORDER BY step_idx"""))

  /** HBOS multivariate outliers over lineitem (quantity, price,
    * discount): top-50 sparsest-bin rows, F broadcast joins, map-only
    * scoring. */
  private val q209 = Entry(
    "q209_hbos_outliers",
    (s, d) =>
      graft.ops.Profiling
        .hbosScore(
          Tables.lineitem(s, d).select(col("l_orderkey"),
            col("l_linenumber"), col("l_quantity"),
            col("l_extendedprice"), col("l_discount")),
          Seq("l_quantity", "l_extendedprice", "l_discount"), bins = 10)
        .select(col("l_orderkey"), col("l_linenumber"),
          r6(col("hbos_score")).as("hbos_score"))
        .orderBy(desc("hbos_score"), col("l_orderkey"),
          col("l_linenumber"))
        .limit(50),
    Some("""
      WITH src AS (SELECT l_orderkey, l_linenumber,
                          l_quantity AS v0, l_extendedprice AS v1,
                          l_discount AS v2
                   FROM lineitem),
      b0 AS (SELECT min(v0) AS lo0, max(v0) AS hi0,
                    count(v0)::DOUBLE AS n0 FROM src),
      b1 AS (SELECT min(v1) AS lo1, max(v1) AS hi1,
                    count(v1)::DOUBLE AS n1 FROM src),
      b2 AS (SELECT min(v2) AS lo2, max(v2) AS hi2,
                    count(v2)::DOUBLE AS n2 FROM src),
      binned AS (
        SELECT l_orderkey, l_linenumber,
               CASE WHEN hi0 <= lo0 THEN 0 ELSE
                 least(greatest(CAST(floor((v0 - lo0) / (hi0 - lo0)
                   * 10) AS BIGINT), 0), 9) END AS bin0,
               CASE WHEN hi1 <= lo1 THEN 0 ELSE
                 least(greatest(CAST(floor((v1 - lo1) / (hi1 - lo1)
                   * 10) AS BIGINT), 0), 9) END AS bin1,
               CASE WHEN hi2 <= lo2 THEN 0 ELSE
                 least(greatest(CAST(floor((v2 - lo2) / (hi2 - lo2)
                   * 10) AS BIGINT), 0), 9) END AS bin2
        FROM src, b0, b1, b2),
      h0 AS (SELECT bin0, count(*)::DOUBLE AS c0 FROM binned GROUP BY 1),
      h1 AS (SELECT bin1, count(*)::DOUBLE AS c1 FROM binned GROUP BY 1),
      h2 AS (SELECT bin2, count(*)::DOUBLE AS c2 FROM binned GROUP BY 1),
      sc AS (
        SELECT l_orderkey, l_linenumber,
               ln((SELECT n0 FROM b0) / c0) +
               ln((SELECT n1 FROM b1) / c1) +
               ln((SELECT n2 FROM b2) / c2) AS score
        FROM binned
        JOIN h0 USING (bin0) JOIN h1 USING (bin1) JOIN h2 USING (bin2))
      SELECT l_orderkey, l_linenumber, round(score, 6) AS hbos_score
      FROM sc
      ORDER BY hbos_score DESC, l_orderkey, l_linenumber LIMIT 50"""))

  /** Rank-based inverse-normal transform (Blom) of price per return
    * flag — distinct (group, value) → z mapping, first 100. The oracle
    * replays Acklam's probit from the SAME coefficient list (the SQL
    * is generated from it — no transcription drift). */
  private val q210 = Entry(
    "q210_inverse_normal",
    (s, d) =>
      graft.ops.Features
        .inverseNormalTransform(
          Tables.lineitem(s, d).select(col("l_returnflag"),
            col("l_extendedprice")),
          "l_extendedprice", Seq("l_returnflag"))
        .select(col("l_returnflag"), col("l_extendedprice"),
          r6(col("int_z")).as("int_z"))
        .distinct()
        .orderBy("l_returnflag", "l_extendedprice")
        .limit(100),
    Some {
      val a = Seq(-3.969683028665376e+01, 2.209460984245205e+02,
        -2.759285104469687e+02, 1.383577518672690e+02,
        -3.066479806614716e+01, 2.506628277459239e+00)
      val b = Seq(-5.447609879822406e+01, 1.615858368580409e+02,
        -1.556989798598866e+02, 6.680131188771972e+01,
        -1.328068155288572e+01)
      val c = Seq(-7.784894002430293e-03, -3.223964580411365e-01,
        -2.400758277161838e+00, -2.549732539343734e+00,
        4.374664141464968e+00, 2.938163982698783e+00)
      val dd = Seq(7.784695709041462e-03, 3.224671290700398e-01,
        2.445134137142996e+00, 3.754408661907416e+00)
      def h(cs: Seq[Double], x: String): String =
        cs.tail.foldLeft(cs.head.toString)((acc, k) =>
          s"($acc * $x + $k)")
      s"""
      WITH vc AS (SELECT l_returnflag AS g, l_extendedprice AS v,
                         count(*) AS cnt
                  FROM lineitem WHERE l_extendedprice IS NOT NULL
                  GROUP BY 1, 2),
      r0 AS (SELECT g, v, cnt,
                    COALESCE(sum(cnt) OVER (PARTITION BY g ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS ex,
                    sum(cnt) OVER (PARTITION BY g) AS n
             FROM vc),
      p0 AS (SELECT g, v,
                    (ex + (cnt + 1) / 2.0 - 0.375) / (n - 0.75 + 1.0)
                      AS pr
             FROM r0),
      q0 AS (SELECT g, v, pr, pr - 0.5 AS qc,
                    (pr - 0.5) * (pr - 0.5) AS rc,
                    sqrt(-2.0 * ln(pr)) AS ql,
                    sqrt(-2.0 * ln(1.0 - pr)) AS qu
             FROM p0),
      z0 AS (SELECT g, v,
               CASE WHEN pr < 0.02425 THEN
                 ${h(c, "ql")} / (${h(dd, "ql")} * ql + 1.0)
               WHEN pr > 0.97575 THEN
                 -(${h(c, "qu")} / (${h(dd, "qu")} * qu + 1.0))
               ELSE ${h(a, "rc")} * qc / (${h(b, "rc")} * rc + 1.0)
               END AS z
             FROM q0)
      SELECT g AS l_returnflag, v AS l_extendedprice,
             round(z, 6) AS int_z
      FROM z0 ORDER BY 1, 2 LIMIT 100"""
    })

  /** Deterministic link-prediction negatives over the customer–
    * supplier graph: ~5 hash-bucketed candidates per node (bucket
    * count derived from N so generation is output-sized — no
    * enumerate-then-thin), anti-joined against real edges; first 200
    * pairs. */
  private val q211 = Entry(
    "q211_negative_edges",
    (s, d) => {
      val edges = custSuppEdges(s, d)
      graft.ops.Graph
        .negativeEdges(edges, "src", "dst", perNode = 5)
        .orderBy("u", "v").limit(200)
    },
    Some("""
      WITH ed AS (
        SELECT DISTINCT 'c' || o_custkey AS s, 's' || l_suppkey AS d
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      canon AS (SELECT DISTINCT least(s, d) AS u, greatest(s, d) AS v
                FROM ed WHERE least(s, d) <> greatest(s, d)),
      nodes AS (SELECT DISTINCT n FROM
                  (SELECT u AS n FROM canon
                   UNION SELECT v AS n FROM canon)),
      nn AS (SELECT greatest(1, CAST(ceil(count(*) / 6.0) AS BIGINT))
               AS bkts
             FROM nodes),
      nb AS (SELECT n,
                    (('0x' || substring(md5(n), 1, 15))::BIGINT
                      % 1048576) % nn.bkts AS b
             FROM nodes, nn),
      pairs AS (SELECT a.n AS u, b.n AS v
                FROM nb a JOIN nb b ON a.b = b.b AND a.n < b.n),
      neg AS (SELECT p.u, p.v FROM pairs p
              LEFT JOIN canon c ON p.u = c.u AND p.v = c.v
              WHERE c.u IS NULL)
      SELECT u, v FROM neg ORDER BY u, v LIMIT 200"""))

  /** Nearest-centroid classification of the held-out embedding split:
    * confusion counts (train = vec_id ≥ 100, test < 100); cosine
    * ranked on the 6-decimal grid so both engines argmax identically. */
  private val q212 = Entry(
    "q212_nearest_centroid",
    (s, d) => {
      val e = Tables.embeddings(s, d)
      graft.ops.Similarity
        .nearestCentroid(e.where(col("vec_id") >= 100),
          e.where(col("vec_id") < 100), "vec_id", "embedding", "label",
          cosRound = Some(6))
        .groupBy(col("true_label").cast("long").as("true_label"),
          col("pred_label").cast("long").as("pred_label"))
        .agg(count(lit(1)).as("n"))
        .orderBy("true_label", "pred_label")
    },
    Some("""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label
                 FROM embeddings),
      tr AS (SELECT * FROM e WHERE vec_id >= 100),
      te AS (SELECT * FROM e WHERE vec_id < 100),
      ex AS (SELECT label, unnest(v) AS x,
                    generate_subscripts(v, 1) AS p
             FROM tr),
      cm AS (SELECT label, p, avg(x) AS m FROM ex GROUP BY 1, 2),
      cent AS (SELECT label, list(m ORDER BY p) AS cv FROM cm
               GROUP BY 1),
      sc AS (SELECT te.vec_id AS id, te.label AS tl,
                    cent.label AS cl,
                    round(list_dot_product(te.v, cent.cv) /
                      (sqrt(list_dot_product(te.v, te.v)) *
                       sqrt(list_dot_product(cent.cv, cent.cv))), 6)
                      AS cos
             FROM te CROSS JOIN cent),
      pred AS (SELECT id, tl, cl FROM (
                 SELECT *, row_number() OVER (PARTITION BY id
                   ORDER BY cos DESC, cl) AS rn FROM sc)
               WHERE rn = 1)
      SELECT tl::BIGINT AS true_label, cl::BIGINT AS pred_label,
             count(*) AS n
      FROM pred GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Top-20 three-step event paths over per-user streams (ties pinned
    * by event_id). */
  private val q213 = Entry(
    "q213_top_paths",
    (s, d) =>
      graft.ops.Behavioral
        .topPaths(Tables.events(s, d), "user_id", "ts", "event_type",
          len = 3, k = 20, tieCols = Seq("event_id")),
    Some("""
      WITH o AS (
        SELECT user_id, event_type,
               lead(event_type, 1) OVER w AS s2,
               lead(event_type, 2) OVER w AS s3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      p AS (SELECT event_type || '>' || s2 || '>' || s3 AS path
            FROM o WHERE s3 IS NOT NULL AND s2 IS NOT NULL)
      SELECT path, count(*) AS n FROM p
      GROUP BY 1 ORDER BY n DESC, path LIMIT 20"""))

  /** Blocklist screening of documents: per-doc listed-term hit totals,
    * distinct terms, and the gate flag — map-only lambda counts. */
  private val q214 = Entry(
    "q214_blocklist",
    (s, d) =>
      graft.ops.TextAnalysis
        .blocklistScore(Tables.documents(s, d), "doc_id", "text",
          Seq("hash", "scan", "join", "filter"))
        .orderBy("doc_id"),
    Some("""
      WITH t AS (
        SELECT doc_id,
               list_filter(string_split(lower(text), ' '),
                 x -> list_contains(['filter', 'hash', 'join', 'scan'],
                                    x)) AS h
        FROM documents)
      SELECT doc_id, len(h) AS hits,
             len(list_distinct(h)) AS distinct_terms,
             len(h) > 0 AS flagged
      FROM t ORDER BY doc_id"""))

  /** End-to-end curation funnel per source: structural quality gate →
    * exact dedup (keep-first among survivors) → blocklist clean — the
    * three library gates composed, reported as per-source stage
    * counts. */
  private val q215 = Entry(
    "q215_curation_funnel",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val flags = graft.ops.TextAnalysis
        .qualityFlags(docs, "doc_id", "text")
        .select(col("doc_id"), col("pass"))
      val bl = graft.ops.TextAnalysis
        .blocklistScore(docs, "doc_id", "text",
          Seq("hash", "scan", "join", "filter"))
        .select(col("doc_id"), col("hits"))
      val base = docs.select("doc_id", "source", "text")
        .join(flags, "doc_id").join(bl, "doc_id")
      val keepers = base.where(col("pass"))
        .groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id")).withColumn("__kept", lit(true))
      base.join(keepers, Seq("doc_id"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("pass"), 1L).otherwise(0L)).as("n_quality"),
          sum(when(col("pass") && col("__kept").isNotNull, 1L)
            .otherwise(0L)).as("n_dedup"),
          sum(when(col("pass") && col("__kept").isNotNull &&
              col("hits") === 0, 1L).otherwise(0L)).as("n_clean"))
        .orderBy("source")
    },
    Some("""
      WITH t AS (SELECT doc_id, source, text,
                        string_split(text, ' ') AS w
                 FROM documents),
      f AS (SELECT doc_id, source, text,
                   (len(w) BETWEEN 20 AND 100000
                    AND (length(text) - (len(w) - 1))
                        / CAST(len(w) AS DOUBLE) BETWEEN 3.0 AND 10.0
                    AND len(list_intersect(list_distinct(w),
                          ['the','a','of','and','to','in','is','that']))
                        >= 2
                    AND len(list_filter(w,
                          x -> regexp_matches(x, '^[A-Za-z]+$')))
                        / CAST(len(w) AS DOUBLE) >= 0.8) AS pass,
                   len(list_filter(string_split(lower(text), ' '),
                     x -> list_contains(
                       ['filter', 'hash', 'join', 'scan'], x))) AS hits
            FROM t),
      k AS (SELECT min(doc_id) AS doc_id FROM f WHERE pass
            GROUP BY text)
      SELECT source,
             count(*) AS n_total,
             CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT)
               AS n_quality,
             CAST(sum(CASE WHEN pass AND k.doc_id IS NOT NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_dedup,
             CAST(sum(CASE WHEN pass AND k.doc_id IS NOT NULL
                            AND hits = 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_clean
      FROM f LEFT JOIN k ON f.doc_id = k.doc_id
      GROUP BY source ORDER BY source"""))

  /** Image patch-grid planning (ViT shape): synthetic per-doc
    * dimensions → patch rows with grid coords and byte offsets. */
  private val q216 = Entry(
    "q216_image_patch_plan",
    (s, d) =>
      graft.ops.Multimodal
        .imagePatchPlan(
          Tables.documents(s, d).where(col("doc_id") < 20)
            .select(col("doc_id"),
              (lit(64) + (col("doc_id") % 3) * 32).as("w"),
              (lit(48) + (col("doc_id") % 2) * 16).as("h")),
          "doc_id", "w", "h", patch = 16, bytesPerPixel = 3)
        .orderBy("doc_id", "patch_id"),
    Some("""
      WITH m AS (
        SELECT doc_id,
               CAST(64 + (doc_id % 3) * 32 AS BIGINT) AS w,
               CAST(48 + (doc_id % 2) * 16 AS BIGINT) AS h
        FROM documents WHERE doc_id < 20),
      g AS (SELECT doc_id, w,
                   CAST(ceil(w / 16.0) AS BIGINT) AS n_px,
                   CAST(ceil(h / 16.0) AS BIGINT) AS n_py
            FROM m),
      p AS (SELECT doc_id, w, n_px, n_py,
                   unnest(range(0, n_px * n_py)) AS patch_id
            FROM g WHERE n_px > 0 AND n_py > 0)
      SELECT doc_id, patch_id,
             patch_id % n_px AS px,
             patch_id // n_px AS py,
             n_px, n_py,
             ((patch_id // n_px) * 16 * w + (patch_id % n_px) * 16) * 3
               AS start_byte
      FROM p ORDER BY doc_id, patch_id"""))

  /** Per-cohort exponential retention decay: closed-form OLS slope of
    * ln retention over weekly offsets, with half-life. */
  private val q217 = Entry(
    "q217_retention_decay",
    (s, d) =>
      graft.ops.Behavioral
        .retentionDecay(Tables.events(s, d), "user_id", "ts", "week")
        .select(col("cohort").cast("date").as("cohort"), col("n_points"),
          r6(col("decay_rate")).as("decay_rate"),
          r6(col("half_life_periods")).as("half_life_periods"))
        .orderBy("cohort"),
    Some("""
      WITH f AS (
        SELECT user_id, min(date_trunc('week', ts)) AS cohort
        FROM events GROUP BY 1),
      a AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS p
        FROM events),
      ret AS (
        SELECT f.cohort,
               CAST(date_diff('day', f.cohort, a.p) / 7 AS BIGINT)
                 AS period_offset,
               count(*) AS n_users
        FROM a JOIN f USING (user_id)
        GROUP BY 1, 2),
      b AS (SELECT cohort, n_users AS n0 FROM ret
            WHERE period_offset = 0),
      lr AS (SELECT ret.cohort,
                    CAST(period_offset AS DOUBLE) AS x,
                    ln(n_users / CAST(n0 AS DOUBLE)) AS y
             FROM ret JOIN b USING (cohort) WHERE n_users > 0),
      fit AS (SELECT cohort, count(*) AS n_points,
                     covar_pop(x, y) AS cv, var_pop(x) AS vr
              FROM lr GROUP BY 1),
      o AS (SELECT cohort, n_points,
                   CASE WHEN vr > 0 THEN cv / vr END AS decay
            FROM fit)
      SELECT CAST(cohort AS DATE) AS cohort, n_points,
             round(decay, 6) AS decay_rate,
             round(CASE WHEN decay < 0 THEN -ln(2.0) / decay END, 6)
               AS half_life_periods
      FROM o ORDER BY cohort"""))

  /** Snapshot-store time travel end to end: a versioned table is built
    * from orders (full load, then two deterministic upserts, then a
    * rollback to v2); the query reads THREE snapshots — v1 via time
    * travel after later writes changed the table, v3 as the deepest
    * merge state, and the post-rollback head — and aggregates each.
    * The oracle replays every merge as CASE logic over the base table:
    * time travel must return bit-identical pre-upsert state. The store
    * is rebuilt fresh per invocation (version numbers must be
    * deterministic). */
  private val q218 = Entry(
    "q218_snapshot_time_travel",
    (s, d) => {
      import graft.etl.{SnapshotStore, WriteMode}
      val ord = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice"), col("o_orderstatus"))
      val fp = ord.agg(count(lit(1)),
        expr("bit_xor(xxhash64(o_orderkey))")).head()
      val tag = java.lang.Long.toHexString(fp.getLong(0) ^ fp.getLong(1))
      val base = s"${sys.props("java.io.tmpdir")}/graft_snap_store/$tag"
      val hBase = new org.apache.hadoop.fs.Path(base)
      val hFs = hBase.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (hFs.exists(hBase)) hFs.delete(hBase, true)
      val st = SnapshotStore(s"$base/t", orderColumn = Some("o_orderkey"))
      st.write(ord, WriteMode.Full)
      st.write(ord.where(pmod(col("o_orderkey"), lit(10)) === 0)
          .withColumn("o_totalprice", col("o_totalprice") * 2)
          .withColumn("o_orderstatus", lit("X")),
        WriteMode.Upsert, Seq("o_orderkey"))
      st.write(ord.where(pmod(col("o_orderkey"), lit(100)) === 0)
          .withColumn("o_totalprice", col("o_totalprice") * 3)
          .withColumn("o_orderstatus", lit("Y")),
        WriteMode.Upsert, Seq("o_orderkey"))
      st.rollback(s, 2)
      def snapAgg(df: DataFrame, snap: String): DataFrame =
        df.agg(count(lit(1)).as("n_rows"),
          round(sum(col("o_totalprice")), 2).as("total"),
          countDistinct(col("o_orderstatus")).as("n_status"))
          .select(lit(snap).as("snap"), col("n_rows"), col("total"),
            col("n_status"))
      snapAgg(st.readVersion(s, 1), "v1")
        .unionByName(snapAgg(st.readVersion(s, 3), "v3"))
        .unionByName(snapAgg(st.read(s), "v4_rollback_to_v2"))
        .orderBy("snap")
    },
    Some("""
      WITH o AS (SELECT o_orderkey, o_totalprice, o_orderstatus
                 FROM orders),
      v1 AS (SELECT 'v1' AS snap, count(*)::BIGINT AS n_rows,
                    round(sum(o_totalprice), 2) AS total,
                    count(DISTINCT o_orderstatus)::BIGINT AS n_status
             FROM o),
      v3 AS (SELECT 'v3' AS snap, count(*)::BIGINT AS n_rows,
                    round(sum(CASE WHEN o_orderkey % 100 = 0
                                     THEN o_totalprice * 3
                                   WHEN o_orderkey % 10 = 0
                                     THEN o_totalprice * 2
                                   ELSE o_totalprice END), 2) AS total,
                    count(DISTINCT CASE WHEN o_orderkey % 100 = 0 THEN 'Y'
                                        WHEN o_orderkey % 10 = 0 THEN 'X'
                                        ELSE o_orderstatus END)::BIGINT
                      AS n_status
             FROM o),
      v4 AS (SELECT 'v4_rollback_to_v2' AS snap, count(*)::BIGINT AS n_rows,
                    round(sum(CASE WHEN o_orderkey % 10 = 0
                                     THEN o_totalprice * 2
                                   ELSE o_totalprice END), 2) AS total,
                    count(DISTINCT CASE WHEN o_orderkey % 10 = 0 THEN 'X'
                                        ELSE o_orderstatus END)::BIGINT
                      AS n_status
             FROM o)
      SELECT * FROM v1 UNION ALL SELECT * FROM v3
      UNION ALL SELECT * FROM v4 ORDER BY snap"""))

  /** Per-segment Benford conformity: first-digit law fitted
    * independently per lineitem return flag — the grouped form of
    * q207's screen (which segment's magnitudes look organic?). */
  private val q219 = Entry(
    "q219_benford_grouped",
    (s, d) =>
      graft.ops.Profiling
        .benfordConformity(Tables.lineitem(s, d), "l_extendedprice",
          groupCols = Seq("l_returnflag"))
        .select(col("l_returnflag"), col("digit"), col("n"),
          r6(col("observed")).as("observed"),
          r6(col("expected")).as("expected"), r6(col("mad")).as("mad"),
          r6(col("chi2")).as("chi2"))
        .orderBy("l_returnflag", "digit"),
    Some("""
      WITH v AS (SELECT l_returnflag AS g, abs(l_extendedprice) AS x
                 FROM lineitem WHERE abs(l_extendedprice) > 0),
      c AS (SELECT g,
                   CAST(floor(x / pow(10.0, floor(log10(x)))) AS BIGINT)
                     AS digit,
                   count(*) AS n
            FROM v GROUP BY 1, 2),
      grid AS (SELECT g, digit FROM (SELECT DISTINCT g FROM c)
               CROSS JOIN (SELECT unnest(generate_series(1, 9)) AS digit)),
      gd AS (SELECT grid.g, grid.digit, COALESCE(c.n, 0) AS n
             FROM grid LEFT JOIN c
               ON c.g = grid.g AND c.digit = grid.digit),
      tot AS (SELECT g, CAST(sum(n) AS DOUBLE) AS nt FROM gd GROUP BY 1),
      p AS (SELECT gd.g, digit, n, n / nt AS observed,
                   log10(1.0 + 1.0 / digit) AS expected
            FROM gd JOIN tot ON tot.g = gd.g),
      sc AS (SELECT p.g, avg(abs(observed - expected)) AS mad,
                    max(nt) * sum(pow(observed - expected, 2) / expected)
                      AS chi2
             FROM p JOIN tot ON tot.g = p.g GROUP BY 1)
      SELECT p.g AS l_returnflag, digit, n,
             round(observed, 6) AS observed,
             round(expected, 6) AS expected, round(mad, 6) AS mad,
             round(chi2, 6) AS chi2
      FROM p JOIN sc ON sc.g = p.g ORDER BY l_returnflag, digit"""))

  /** Sliced Wasserstein distance between the even- and odd-id halves
    * of the embedding corpus: 4 md5-derived projection directions,
    * 8-point PERCENTILE_DISC quantile grid per slice — the
    * magnitude-sensitive distribution-shift metric beside q118's MMD.
    * Oracle replays the identical plane literals and quantile grid. */
  private val q220 = Entry(
    "q220_sliced_wasserstein",
    (s, d) => {
      val e = Tables.embeddings(s, d)
      graft.ops.Features
        .slicedWasserstein(e.where(pmod(col("vec_id"), lit(2)) === 0),
          e.where(pmod(col("vec_id"), lit(2)) === 1), "embedding",
          inDim = 64, slices = 4, gridPoints = 8)
        .select(col("slice"), r6(col("w1")).as("w1"),
          r6(col("mean_w1")).as("mean_w1"))
        .orderBy("slice")
    },
    Some {
      val w = (0 until 4).map(j =>
        graft.ops.Similarity.planeWeights(j, 64).mkString("[", ", ", "]"))
      val qs = (0 until 8).map(i => (i + 0.5) / 8)
      def side(pred: String): String = (0 until 4).map { j =>
        s"SELECT $j AS slice, list_dot_product(v, ${w(j)}) AS proj FROM e WHERE $pred"
      }.mkString(" UNION ALL ")
      def qcols(suffix: String): String = qs.zipWithIndex.map {
        case (p, i) => s"quantile_disc(proj, $p) AS g$i$suffix"
      }.mkString(", ")
      val diff = (0 until 8).map(i => s"abs(qa.g${i}a - qb.g${i}b)")
        .mkString(" + ")
      s"""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                 FROM embeddings),
      pa AS (${side("vec_id % 2 = 0")}),
      pb AS (${side("vec_id % 2 = 1")}),
      qa AS (SELECT slice, ${qcols("a")} FROM pa GROUP BY 1),
      qb AS (SELECT slice, ${qcols("b")} FROM pb GROUP BY 1),
      w AS (SELECT qa.slice, ($diff) / 8.0 AS w1
            FROM qa JOIN qb ON qa.slice = qb.slice),
      m AS (SELECT avg(w1) AS mean_w1 FROM w)
      SELECT slice, round(w1, 6) AS w1, round(mean_w1, 6) AS mean_w1
      FROM w, m ORDER BY slice"""
    })

  /** 12-core of the customer–supplier graph: 3 deterministic peel
    * rounds (fixpoint-unrolled, engine-replayable) — the dense
    * interaction backbone, with each survivor's within-core degree. */
  private val q221 = Entry(
    "q221_kcore",
    (s, d) =>
      graft.ops.Graph.kCore(custSuppEdges(s, d), "src", "dst",
        k = 12, rounds = 3)
        .orderBy("node"),
    Some("""
      WITH ed AS (
        SELECT DISTINCT 'c' || o_custkey AS s, 's' || l_suppkey AS d
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      e0 AS (SELECT s AS a, d AS b FROM ed UNION SELECT d, s FROM ed),
      k1 AS (SELECT a FROM e0 GROUP BY a HAVING count(*) >= 12),
      e1 AS (SELECT e0.a, e0.b FROM e0
             JOIN k1 x ON e0.a = x.a JOIN k1 y ON e0.b = y.a),
      k2 AS (SELECT a FROM e1 GROUP BY a HAVING count(*) >= 12),
      e2 AS (SELECT e1.a, e1.b FROM e1
             JOIN k2 x ON e1.a = x.a JOIN k2 y ON e1.b = y.a),
      k3 AS (SELECT a FROM e2 GROUP BY a HAVING count(*) >= 12),
      e3 AS (SELECT e2.a, e2.b FROM e2
             JOIN k3 x ON e2.a = x.a JOIN k3 y ON e2.b = y.a)
      SELECT a AS node, count(*) AS core_degree
      FROM e3 GROUP BY 1 ORDER BY node"""))

  /** Degree assortativity of the customer–supplier graph (Newman's r —
    * negative by construction on bipartite interaction graphs). */
  private val q222 = Entry(
    "q222_assortativity",
    (s, d) =>
      graft.ops.Graph
        .degreeAssortativity(custSuppEdges(s, d), "src", "dst")
        .select(r6(col("assortativity")).as("assortativity"),
          col("n_edges"), col("n_nodes")),
    Some("""
      WITH ed AS (
        SELECT DISTINCT 'c' || o_custkey AS s, 's' || l_suppkey AS d
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      e AS (SELECT s AS a, d AS b FROM ed UNION SELECT d, s FROM ed),
      deg AS (SELECT a AS n, CAST(count(*) AS DOUBLE) AS dg
              FROM e GROUP BY 1),
      ann AS (SELECT du.dg AS du, dv.dg AS dv FROM e
              JOIN deg du ON e.a = du.n JOIN deg dv ON e.b = dv.n),
      st AS (SELECT count(*) AS m, avg(du) AS eu, avg(dv) AS ev,
                    avg(du * dv) AS euv, avg(du * du) AS eu2,
                    avg(dv * dv) AS ev2
             FROM ann),
      nn AS (SELECT count(*) AS n_nodes FROM deg)
      SELECT round((euv - eu * ev) /
               (sqrt(eu2 - eu * eu) * sqrt(ev2 - ev * ev)), 6)
               AS assortativity,
             CAST(m // 2 AS BIGINT) AS n_edges, n_nodes
      FROM st, nn"""))

  /** Quantile normalization of event values by event type (64-cell
    * pooled grid): after QN every type shares the pooled distribution
    * — the per-type stats collapse onto near-identical values. Oracle
    * replays midranks, grid cells, and the 64 pooled disc quantiles. */
  private val q223 = Entry(
    "q223_quantile_normalize",
    (s, d) =>
      graft.ops.Features
        .quantileNormalize(Tables.events(s, d), "value",
          Seq("event_type"), gridPoints = 64)
        .groupBy("event_type")
        .agg(count(col("qn_value")).as("n_mapped"),
          r6(avg(col("qn_value"))).as("qn_avg"),
          r6(min(col("qn_value"))).as("qn_min"),
          r6(max(col("qn_value"))).as("qn_max"))
        .orderBy("event_type"),
    Some {
      val ref = (1 to 64).map { c =>
        val p = (c - 0.5) / 64
        s"SELECT $c AS cell, quantile_disc(x, $p) AS qn FROM t"
      }.mkString(" UNION ALL ")
      s"""
      WITH t AS (SELECT event_type AS g, CAST("value" AS DOUBLE) AS x
                 FROM events WHERE "value" IS NOT NULL),
      vc AS (SELECT g, x, count(*) AS c FROM t GROUP BY 1, 2),
      r AS (SELECT g, x, c,
                   coalesce(sum(c) OVER (PARTITION BY g ORDER BY x
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS ex,
                   sum(c) OVER (PARTITION BY g) AS n
            FROM vc),
      cells AS (SELECT g, x,
                       CAST(least(ceil(((ex + (c + 1) / 2.0 - 0.5) / n)
                         * 64.0), 64.0) AS BIGINT) AS cell
                FROM r),
      ref AS ($ref),
      m AS (SELECT g, x, qn FROM cells JOIN ref USING (cell)),
      rows_ AS (SELECT t.g, m.qn FROM t
                JOIN m ON m.g = t.g AND m.x = t.x)
      SELECT g AS event_type, count(qn)::BIGINT AS n_mapped,
             round(avg(qn), 6) AS qn_avg, round(min(qn), 6) AS qn_min,
             round(max(qn), 6) AS qn_max
      FROM rows_ GROUP BY 1 ORDER BY event_type"""
    })

  /** Funnel time-to-convert: per-step gap distribution (mean, exact
    * disc p50/p90 seconds) through the 7-day windowed signup funnel —
    * where q208 counts the leak, this measures the stall. */
  private val q224 = Entry(
    "q224_funnel_durations",
    (s, d) =>
      graft.ops.Behavioral
        .funnelDurations(Tables.events(s, d), "user_id", "ts",
          "event_type", Seq("signup", "view", "click", "purchase"),
          maxGapSeconds = Some(7L * 86400))
        .select(col("step_idx"), col("step"), col("n_users"),
          r6(col("avg_gap_s")).as("avg_gap_s"),
          r6(col("p50_gap_s")).as("p50_gap_s"),
          r6(col("p90_gap_s")).as("p90_gap_s"))
        .orderBy("step_idx"),
    Some("""
      WITH s1 AS (
        SELECT user_id, min(ts) AS t FROM events
        WHERE event_type = 'signup' GROUP BY 1),
      s2 AS (
        SELECT e.user_id, min(e.ts) AS t FROM events e
        JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'view' AND e.ts >= s1.t
          AND epoch_us(e.ts) - epoch_us(s1.t) <= 604800000000
        GROUP BY 1),
      s3 AS (
        SELECT e.user_id, min(e.ts) AS t FROM events e
        JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'click' AND e.ts >= s2.t
          AND epoch_us(e.ts) - epoch_us(s2.t) <= 604800000000
        GROUP BY 1),
      s4 AS (
        SELECT e.user_id, min(e.ts) AS t FROM events e
        JOIN s3 ON e.user_id = s3.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= s3.t
          AND epoch_us(e.ts) - epoch_us(s3.t) <= 604800000000
        GROUP BY 1),
      u AS (
        SELECT 2 AS step_idx, 'view' AS step,
               (epoch_us(s2.t) - epoch_us(s1.t)) / 1000000.0 AS gap
        FROM s2 JOIN s1 USING (user_id)
        UNION ALL
        SELECT 3, 'click',
               (epoch_us(s3.t) - epoch_us(s2.t)) / 1000000.0
        FROM s3 JOIN s2 USING (user_id)
        UNION ALL
        SELECT 4, 'purchase',
               (epoch_us(s4.t) - epoch_us(s3.t)) / 1000000.0
        FROM s4 JOIN s3 USING (user_id))
      SELECT step_idx, step, count(*) AS n_users,
             round(avg(gap), 6) AS avg_gap_s,
             round(quantile_disc(gap, 0.5), 6) AS p50_gap_s,
             round(quantile_disc(gap, 0.9), 6) AS p90_gap_s
      FROM u GROUP BY 1, 2 ORDER BY step_idx"""))

  // ---- PQ oracle SQL generators (q225/q226): the encode/ADC replay is
  // generated from the SAME pqCentroids arrays the Spark ops inline, so
  // there is no transcription drift and every IEEE expression matches
  // shape for shape (sum order, (x-y)*(x-y) squares, first-wins argmin)
  private def pqSqDistSql(vecExpr: String, s: Int, subDim: Int,
      cent: Array[Double]): String =
    (0 until subDim).map { i =>
      val idx = s * subDim + i + 1 // 1-based into the full vector
      s"(($vecExpr[$idx] - ${cent(i)}) * ($vecExpr[$idx] - ${cent(i)}))"
    }.mkString("(", " + ", ")")

  private def pqCodeSql(vecExpr: String, s: Int, subDim: Int,
      ksub: Int): String = {
    val ds = (0 until ksub).map(c => pqSqDistSql(vecExpr, s, subDim,
      graft.ops.Similarity.pqCentroids(s, ksub, subDim)(c)))
    val mn = ds.mkString("least(", ", ", ")")
    val branches = (0 until ksub)
      .map(c => s"WHEN ${ds(c)} = $mn THEN $c").mkString(" ")
    s"(CASE $branches END)"
  }

  /** PQ encode of the embedding corpus: 64 dims → 4 subspace codes
    * (8-centroid md5-seeded codebooks) + reconstruction error — the
    * m-byte-per-vector billion-scale ANN storage layout, fully
    * engine-replayed by a generated argmin oracle. */
  private val q225 = Entry(
    "q225_pq_encode",
    (s, d) =>
      graft.ops.Similarity
        .pqEncode(Tables.embeddings(s, d).where(col("vec_id") < 100),
          "vec_id", "embedding", inDim = 64, m = 4, ksub = 8)
        .select(col("vec_id"),
          col("pq_codes")(0).as("c0"), col("pq_codes")(1).as("c1"),
          col("pq_codes")(2).as("c2"), col("pq_codes")(3).as("c3"),
          r6(col("recon_err")).as("recon_err"))
        .orderBy("vec_id"),
    Some {
      val subDim = 16
      val codes = (0 until 4).map(s => s"${pqCodeSql("v", s, subDim, 8)} AS c$s")
      val errTerms = (0 until 4).map { s =>
        val ds = (0 until 8).map(c => pqSqDistSql("v", s, subDim,
          graft.ops.Similarity.pqCentroids(s, 8, subDim)(c)))
        ds.mkString("least(", ", ", ")")
      }
      s"""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                 FROM embeddings WHERE vec_id < 100),
      enc AS (SELECT vec_id, ${codes.mkString(", ")},
                     sqrt(${errTerms.mkString("(", " + ", ")")}) AS err
              FROM e)
      SELECT vec_id, c0, c1, c2, c3, round(err, 6) AS recon_err
      FROM enc ORDER BY vec_id"""
    })

  /** PQ asymmetric-distance top-5 for the first five query vectors:
    * corpus as codes, queries full-precision, distance = summed
    * subspace table lookups — the generated oracle replays encode +
    * ADC end to end. */
  private val q226 = Entry(
    "q226_pq_knn",
    (s, d) => {
      val e = Tables.embeddings(s, d)
      graft.ops.Similarity
        .pqKnn(e, e.where(col("vec_id") < 5), k = 5, inDim = 64,
          m = 4, ksub = 8)
        .select(col("query_id"), col("rnk"), col("nbr_id"),
          r6(col("approx_dist")).as("approx_dist"))
        .orderBy("query_id", "rnk")
    },
    Some {
      val subDim = 16
      val codes = (0 until 4).map(s => s"${pqCodeSql("v", s, subDim, 8)} AS c$s")
      val adc = (0 until 4).map { s =>
        val branches = (0 until 8).map { c =>
          s"WHEN c.c$s = $c THEN ${pqSqDistSql("q.v", s, subDim,
            graft.ops.Similarity.pqCentroids(s, 8, subDim)(c))}"
        }.mkString(" ")
        s"(CASE $branches END)"
      }.mkString("(", " + ", ")")
      s"""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                 FROM embeddings),
      c AS (SELECT vec_id, ${codes.mkString(", ")} FROM e),
      q AS (SELECT vec_id, v FROM e WHERE vec_id < 5),
      sc AS (SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
                    $adc AS approx_dist
             FROM c CROSS JOIN q WHERE q.vec_id <> c.vec_id),
      r AS (SELECT query_id, nbr_id, approx_dist,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY approx_dist ASC, nbr_id ASC) AS rnk
            FROM sc)
      SELECT query_id, rnk, nbr_id, round(approx_dist, 6) AS approx_dist
      FROM r WHERE rnk <= 5 ORDER BY query_id, rnk"""
    })

  /** Sharp regression discontinuity at a price cutoff: outcome carries
    * a deterministic +5 jump at 150k, the estimator's local linear
    * fits recover it — closed-form moments replayed by the oracle. */
  private val q227 = Entry(
    "q227_rdd_estimate",
    (s, d) => {
      val df = Tables.orders(s, d).select(
        col("o_totalprice").as("run"),
        (col("o_totalprice") / 1000.0 +
          when(col("o_totalprice") >= 150000.0, 5.0).otherwise(0.0) +
          (col("o_orderkey") % 7).cast("double")).as("y"))
      graft.ops.Evaluation
        .rddEstimate(df, "run", "y", cutoff = 150000.0,
          bandwidth = 100000.0)
        .select(col("n_left"), col("n_right"),
          r6(col("slope_l")).as("slope_l"),
          r6(col("slope_r")).as("slope_r"),
          r6(col("at_cutoff_l")).as("at_cutoff_l"),
          r6(col("at_cutoff_r")).as("at_cutoff_r"),
          r6(col("effect")).as("effect"), r6(col("se")).as("se"),
          r6(col("t_stat")).as("t_stat"))
    },
    Some("""
      WITH t AS (
        SELECT o_totalprice - 150000.0 AS x,
               o_totalprice / 1000.0 +
                 (CASE WHEN o_totalprice >= 150000.0 THEN 5.0
                       ELSE 0.0 END) + (o_orderkey % 7) AS y
        FROM orders
        WHERE o_totalprice - 150000.0 >= -100000.0
          AND o_totalprice - 150000.0 < 100000.0),
      m AS (SELECT
        count(*) FILTER (WHERE x < 0) AS nl,
        sum(x) FILTER (WHERE x < 0) AS sxl,
        sum(y) FILTER (WHERE x < 0) AS syl,
        sum(x * x) FILTER (WHERE x < 0) AS sxxl,
        sum(x * y) FILTER (WHERE x < 0) AS sxyl,
        sum(y * y) FILTER (WHERE x < 0) AS syyl,
        count(*) FILTER (WHERE x >= 0) AS nr,
        sum(x) FILTER (WHERE x >= 0) AS sxr,
        sum(y) FILTER (WHERE x >= 0) AS syr,
        sum(x * x) FILTER (WHERE x >= 0) AS sxxr,
        sum(x * y) FILTER (WHERE x >= 0) AS sxyr,
        sum(y * y) FILTER (WHERE x >= 0) AS syyr
        FROM t),
      f AS (SELECT nl, nr,
        CASE WHEN nl >= 3 AND nl * sxxl - sxl * sxl <> 0 THEN
          (nl * sxyl - sxl * syl) / (nl * sxxl - sxl * sxl) END AS bl,
        CASE WHEN nr >= 3 AND nr * sxxr - sxr * sxr <> 0 THEN
          (nr * sxyr - sxr * syr) / (nr * sxxr - sxr * sxr) END AS br,
        sxl, syl, sxxl, sxyl, syyl, sxr, syr, sxxr, sxyr, syyr
        FROM m),
      g AS (SELECT nl, nr, bl, br,
        (syl - bl * sxl) / nl AS al,
        (syr - br * sxr) / nr AS ar,
        ((syyl - syl * syl / nl - bl * bl * (sxxl - sxl * sxl / nl))
          / (nl - 2)) * sxxl / (nl * sxxl - sxl * sxl) AS vil,
        ((syyr - syr * syr / nr - br * br * (sxxr - sxr * sxr / nr))
          / (nr - 2)) * sxxr / (nr * sxxr - sxr * sxr) AS vir
        FROM f)
      SELECT nl::BIGINT AS n_left, nr::BIGINT AS n_right,
             round(bl, 6) AS slope_l, round(br, 6) AS slope_r,
             round(al, 6) AS at_cutoff_l, round(ar, 6) AS at_cutoff_r,
             round(ar - al, 6) AS effect,
             round(sqrt(vil + vir), 6) AS se,
             round((ar - al) / sqrt(vil + vir), 6) AS t_stat
      FROM g"""))

  /** Event-study DiD by week: purchase-vs-view value effects per week
    * relative to the first week — placebo/dynamic readout around q192's
    * pooled number. */
  private val q228 = Entry(
    "q228_event_study",
    (s, d) =>
      graft.ops.Evaluation
        .eventStudy(
          Tables.events(s, d).withColumn("__period",
            date_trunc("week", col("ts")).cast("date")),
          "event_type", "purchase", "view", "__period", "value",
          java.sql.Date.valueOf("2024-01-01"))
        .withColumn("period", col("period").cast("date"))
        .select(col("period"), col("n_treat"), col("n_ctrl"),
          r6(col("mean_treat")).as("mean_treat"),
          r6(col("mean_ctrl")).as("mean_ctrl"),
          r6(col("effect")).as("effect"), r6(col("se")).as("se"),
          r6(col("t_stat")).as("t_stat"))
        .orderBy("period"),
    Some("""
      WITH c AS (
        SELECT date_trunc('week', ts)::DATE AS period,
               count(*) FILTER (WHERE event_type = 'purchase')
                 AS n_treat,
               avg("value") FILTER (WHERE event_type = 'purchase') AS mt,
               var_samp("value") FILTER (WHERE event_type = 'purchase')
                 / count(*) FILTER (WHERE event_type = 'purchase')
                 AS vmt,
               count(*) FILTER (WHERE event_type = 'view') AS n_ctrl,
               avg("value") FILTER (WHERE event_type = 'view') AS mc,
               var_samp("value") FILTER (WHERE event_type = 'view')
                 / count(*) FILTER (WHERE event_type = 'view') AS vmc
        FROM events
        WHERE event_type IN ('purchase', 'view') AND "value" IS NOT NULL
        GROUP BY 1),
      b AS (SELECT mt AS bt, mc AS bc, vmt AS bvt, vmc AS bvc
            FROM c WHERE period = DATE '2024-01-01')
      SELECT c.period, n_treat, n_ctrl,
             round(mt, 6) AS mean_treat, round(mc, 6) AS mean_ctrl,
             round((mt - bt) - (mc - bc), 6) AS effect,
             round(sqrt(vmt + bvt + vmc + bvc), 6) AS se,
             round(((mt - bt) - (mc - bc)) /
               sqrt(vmt + bvt + vmc + bvc), 6) AS t_stat
      FROM c, b WHERE c.period <> DATE '2024-01-01'
      ORDER BY period"""))

  /** Information-gain feature ranking: which order attributes predict
    * a high-value order — entropy screen over a single melted scan. */
  private val q229 = Entry(
    "q229_information_gain",
    (s, d) =>
      graft.ops.Profiling
        .informationGain(
          Tables.orders(s, d)
            .withColumn("hi",
              (col("o_totalprice") > 150000.0).cast("string"))
            .withColumn("cust_bucket",
              (col("o_custkey") % 10).cast("string")),
          Seq("o_orderstatus", "o_orderpriority", "cust_bucket"),
          "hi")
        .select(col("feature"), r6(col("h_label")).as("h_label"),
          r6(col("h_cond")).as("h_cond"),
          r6(col("info_gain")).as("info_gain"))
        .orderBy("feature"),
    Some("""
      WITH t AS (SELECT o_orderstatus, o_orderpriority,
                        CAST(o_custkey % 10 AS VARCHAR) AS cust_bucket,
                        CAST(o_totalprice > 150000.0 AS VARCHAR) AS lab
                 FROM orders),
      m AS (
        SELECT 'o_orderstatus' AS feature, o_orderstatus AS v, lab
        FROM t
        UNION ALL
        SELECT 'o_orderpriority', o_orderpriority, lab FROM t
        UNION ALL
        SELECT 'cust_bucket', cust_bucket, lab FROM t),
      joint AS (SELECT feature, v, lab, count(*) AS n
                FROM m GROUP BY 1, 2, 3),
      pv AS (SELECT feature, v, sum(n) AS nv,
                    sum(n * ln(n)) AS s
             FROM joint GROUP BY 1, 2),
      hc AS (SELECT feature,
                    sum(nv * (ln(nv) - s / nv)) / sum(nv) AS h_cond
             FROM pv GROUP BY 1),
      lc AS (SELECT lab, count(*) AS n FROM t GROUP BY 1),
      hl AS (SELECT ln(sum(n)) - sum(n * ln(n)) / sum(n) AS h_label
             FROM lc)
      SELECT feature, round(h_label, 6) AS h_label,
             round(h_cond, 6) AS h_cond,
             round(h_label - h_cond, 6) AS info_gain
      FROM hc, hl ORDER BY feature"""))

  /** Seasonal-trend decomposition of daily event value per type:
    * 7-day centered trend, zero-centered weekly seasonal, remainder —
    * full window replay in the oracle. */
  private val q230 = Entry(
    "q230_seasonal_decompose",
    (s, d) =>
      graft.ops.TimeSeries
        .decompose(Tables.events(s, d), Seq("event_type"), "ts",
          "value", period = 7, halfWindow = 3)
        .select(col("event_type"), col("day"), r6(col("y")).as("y"),
          r6(col("trend")).as("trend"),
          r6(col("seasonal")).as("seasonal"),
          r6(col("remainder")).as("remainder"))
        .orderBy("event_type", "day"),
    Some("""
      WITH d AS (SELECT event_type AS g, date_trunc('day', ts)::DATE
                   AS day, sum("value") AS y
                 FROM events GROUP BY 1, 2),
      t AS (SELECT g, day, y,
                   CASE WHEN count(*) OVER wnd = 7
                        THEN avg(y) OVER wnd END AS trend,
                   date_diff('day', DATE '2024-01-01', day) % 7 AS ph
            FROM d WINDOW wnd AS (PARTITION BY g ORDER BY day
              ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      s0 AS (SELECT g, ph, avg(y - trend) AS s0 FROM t
             WHERE trend IS NOT NULL GROUP BY 1, 2),
      sm AS (SELECT g, avg(s0) AS sm FROM s0 GROUP BY 1),
      se AS (SELECT s0.g, ph, s0 - sm AS seasonal
             FROM s0 JOIN sm ON sm.g = s0.g)
      SELECT t.g AS event_type, day, round(y, 6) AS y,
             round(trend, 6) AS trend,
             round(seasonal, 6) AS seasonal,
             round(y - trend - seasonal, 6) AS remainder
      FROM t LEFT JOIN se ON se.g = t.g AND se.ph = t.ph
      ORDER BY event_type, day"""))

  /** Binary-relevance ranking metrics (MRR, MAP@10, P@10, R@10) per
    * event type on the q149 ranking frame — relevant docs are users
    * with id % 5 == 0, rankings tie-broken by doc id. */
  private val q231 = Entry(
    "q231_ranking_metrics",
    (s, d) => {
      val per = Tables.events(s, d)
        .groupBy(col("event_type").as("q"), col("user_id").as("doc"))
        .agg(sum("value").as("score"))
        .withColumn("rel",
          when(col("doc") % 5 === 0, 1.0).otherwise(0.0))
      graft.ops.Evaluation
        .rankingMetrics(per, "q", "doc", "rel", "score", 10)
        .select(col("query"), col("n_docs"), col("n_rel"),
          r6(col("mrr")).as("mrr"), r6(col("map_k")).as("map_k"),
          r6(col("precision_k")).as("precision_k"),
          r6(col("recall_k")).as("recall_k"))
        .orderBy("query")
    },
    Some("""
      WITH per AS (SELECT event_type AS q, user_id AS doc,
                          sum("value") AS score
                   FROM events GROUP BY 1, 2),
      r AS (SELECT q, doc, score,
                   CASE WHEN doc % 5 = 0 THEN 1.0 ELSE 0.0 END AS rel,
                   row_number() OVER (PARTITION BY q
                     ORDER BY score DESC, doc ASC) AS rk
            FROM per),
      c AS (SELECT q, rel, rk,
                   sum(rel) OVER (PARTITION BY q ORDER BY rk) AS cum
            FROM r),
      a AS (SELECT q, count(*) AS n_docs,
                   CAST(sum(rel) AS BIGINT) AS n_rel,
                   coalesce(max(CASE WHEN rel > 0 THEN 1.0 / rk END), 0)
                     AS mrr,
                   sum(CASE WHEN rel > 0 AND rk <= 10 THEN cum / rk
                       ELSE 0 END) AS apnum,
                   sum(CASE WHEN rk <= 10 THEN rel ELSE 0 END) AS relk
            FROM c GROUP BY 1)
      SELECT q AS query, n_docs, n_rel, round(mrr, 6) AS mrr,
             round(CASE WHEN n_rel > 0 THEN apnum / least(n_rel, 10)
                   ELSE 0 END, 6) AS map_k,
             round(relk / 10.0, 6) AS precision_k,
             round(CASE WHEN n_rel > 0 THEN relk / n_rel ELSE 0 END, 6)
               AS recall_k
      FROM a ORDER BY query"""))

  /** Supplier–supplier link prediction over the customer–supplier
    * graph: wedges through shared low-degree customer centers (cap
    * 100 excludes the ~500-degree supplier hubs from center duty)
    * score non-adjacent pairs by common neighbours / Adamic–Adar /
    * resource allocation / Jaccard; top 20 by common-neighbour count
    * (exact-integer ordering — no float-cutoff ambiguity). */
  private val q232 = Entry(
    "q232_link_prediction",
    (s, d) =>
      graft.ops.Graph
        .linkPredictionScores(custSuppEdges(s, d), "src", "dst",
          maxCenterDegree = 100)
        .where(col("u").startsWith("s"))
        .orderBy(desc("common"), asc("u"), asc("w"))
        .limit(20)
        .select(col("u"), col("w"), col("common"),
          r6(col("adamic_adar")).as("adamic_adar"),
          r6(col("resource_alloc")).as("resource_alloc"),
          r6(col("jaccard")).as("jaccard"))
        .orderBy(desc("common"), asc("u"), asc("w")),
    Some("""
      WITH ed AS (SELECT DISTINCT 'c' || o_custkey AS s,
                         's' || l_suppkey AS d
                  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      e AS (SELECT s AS a, d AS b FROM ed UNION SELECT d, s FROM ed),
      deg AS (SELECT a AS node, count(*)::DOUBLE AS dg FROM e GROUP BY 1),
      adj AS (SELECT e.b AS z, e.a AS n, dg AS zdeg
              FROM e JOIN deg ON e.b = deg.node WHERE dg <= 100),
      wdg AS (SELECT l.n AS u, r.n AS w, l.zdeg AS zdeg
              FROM adj l JOIN adj r ON l.z = r.z AND l.n < r.n),
      sc AS (SELECT u, w, count(*) AS common,
                    sum(1.0 / ln(zdeg)) AS aa, sum(1.0 / zdeg) AS ra
             FROM wdg GROUP BY 1, 2),
      nsc AS (SELECT sc.* FROM sc WHERE NOT EXISTS
                (SELECT 1 FROM e WHERE e.a = sc.u AND e.b = sc.w)),
      j AS (SELECT u, w, common, aa, ra,
                   common / (du.dg + dw.dg - common) AS jac
            FROM nsc JOIN deg du ON nsc.u = du.node
                     JOIN deg dw ON nsc.w = dw.node)
      SELECT u, w, common, round(aa, 6) AS adamic_adar,
             round(ra, 6) AS resource_alloc, round(jac, 6) AS jaccard
      FROM j WHERE u LIKE 's%'
      ORDER BY common DESC, u, w LIMIT 20"""))

  /** Mass-based anomaly profile of lineitem (quantity, price,
    * discount) via 4 oblivious half-space trees of depth 4 — per
    * return flag: mean/max rarity score and the count of rows whose
    * emptiest cell holds <0.4% of the corpus. The oracle replays the
    * identical md5-derived trees (generated SQL, the q225 pattern);
    * the rare-row gate thresholds an IEEE-exact count fraction, never
    * a libm log. */
  private val q233 = Entry(
    "q233_mass_anomaly",
    (s, d) =>
      graft.ops.Profiling
        .massAnomaly(Tables.lineitem(s, d),
          Seq("l_quantity", "l_extendedprice", "l_discount"),
          Seq("l_returnflag"), trees = 4, depth = 4)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          r6(avg(col("mass_score"))).as("avg_score"),
          r6(max(col("mass_score"))).as("max_score"),
          sum(when(col("min_mass_frac") < 0.004, 1L).otherwise(0L))
            .as("rare_rows"))
        .orderBy("l_returnflag"),
    Some {
      val feats = Seq("l_quantity", "l_extendedprice", "l_discount")
      def leafSql(t: Int) = (0 until 4).map { l =>
        val (f, u) = graft.ops.Profiling.massSplit(t, l, feats.size)
        s"(CASE WHEN ${feats(f)}::DOUBLE < mn$f + $u * (mx$f - mn$f) " +
          s"THEN ${1L << l} ELSE 0 END)"
      }.mkString(" + ")
      val stats = feats.zipWithIndex.map { case (f, i) =>
        s"min($f::DOUBLE) AS mn$i, max($f::DOUBLE) AS mx$i"
      }.mkString(", ")
      val leafCols = (0 until 4)
        .map(t => s"${leafSql(t)} AS leaf$t").mkString(",\n             ")
      val cCtes = (0 until 4).map(t =>
        s"c$t AS (SELECT leaf$t AS lf$t, count(*)::DOUBLE AS c " +
          s"FROM lf GROUP BY 1)").mkString(",\n      ")
      val joins = (0 until 4)
        .map(t => s"JOIN c$t ON lf.leaf$t = c$t.lf$t").mkString(" ")
      val logs = (0 until 4).map(t => s"log2(c$t.c / st.N)").mkString(" + ")
      val leastC = (0 until 4).map(t => s"c$t.c").mkString(", ")
      s"""
      WITH st AS (SELECT $stats, count(*)::DOUBLE AS N FROM lineitem),
      lf AS (SELECT l_returnflag,
             $leafCols
             FROM lineitem, st),
      $cCtes,
      sc AS (SELECT lf.l_returnflag,
                    (-($logs)) / 4 AS score,
                    least($leastC) / st.N AS mfrac
             FROM lf $joins, st)
      SELECT l_returnflag, count(*) AS n, round(avg(score), 6) AS avg_score,
             round(max(score), 6) AS max_score,
             CAST(sum(CASE WHEN mfrac < 0.004 THEN 1 ELSE 0 END) AS BIGINT)
               AS rare_rows
      FROM sc GROUP BY 1 ORDER BY l_returnflag"""
    })

  /** Multi-source BFS over the customer–supplier graph from the
    * nation-0 suppliers: reachable-node census per hop distance
    * (3 rounds, fixpoint-unrolled in the oracle). */
  private val q234 = Entry(
    "q234_hop_distance",
    (s, d) => {
      val seeds = Tables.supplier(s, d)
        .where(col("s_nationkey") === 0)
        .select(concat(lit("s"), col("s_suppkey")).as("node"))
      graft.ops.Graph
        .hopDistance(custSuppEdges(s, d), "src", "dst", seeds, "node",
          maxHops = 3)
        .groupBy("dist")
        .agg(count(lit(1)).as("n"), min("node").as("min_node"),
          max("node").as("max_node"))
        .orderBy("dist")
    },
    Some("""
      WITH ed AS (SELECT DISTINCT 'c' || o_custkey AS s,
                         's' || l_suppkey AS d
                  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      e AS (SELECT s AS a, d AS b FROM ed UNION SELECT d, s FROM ed),
      v0 AS (SELECT DISTINCT 's' || s_suppkey AS node FROM supplier
             WHERE s_nationkey = 0),
      f1 AS (SELECT DISTINCT e.b AS node FROM e
             JOIN v0 ON e.a = v0.node
             WHERE e.b NOT IN (SELECT node FROM v0)),
      f2 AS (SELECT DISTINCT e.b AS node FROM e
             JOIN f1 ON e.a = f1.node
             WHERE e.b NOT IN (SELECT node FROM v0
                               UNION ALL SELECT node FROM f1)),
      f3 AS (SELECT DISTINCT e.b AS node FROM e
             JOIN f2 ON e.a = f2.node
             WHERE e.b NOT IN (SELECT node FROM v0
                               UNION ALL SELECT node FROM f1
                               UNION ALL SELECT node FROM f2)),
      allv AS (SELECT node, 0 AS dist FROM v0
               UNION ALL SELECT node, 1 FROM f1
               UNION ALL SELECT node, 2 FROM f2
               UNION ALL SELECT node, 3 FROM f3)
      SELECT dist, count(*) AS n, min(node) AS min_node,
             max(node) AS max_node
      FROM allv GROUP BY 1 ORDER BY dist"""))

  /** Per-event-type Gini coefficient of user spend — the inequality
    * profile that drives salting/sampling decisions. The oracle uses
    * the rank-window formulation; the engine computes the identical
    * tie-invariant statistic from distinct-value counts + distributed
    * prefix sums (no corpus-wide window). */
  private val q235 = Entry(
    "q235_gini",
    (s, d) => {
      val per = Tables.events(s, d)
        .groupBy(col("event_type"), col("user_id"))
        .agg(sum("value").as("x"))
      graft.ops.Profiling.giniCoefficient(per, "x", Seq("event_type"))
        .select(col("event_type"), col("n"), r2(col("total")).as("total"),
          r6(col("mean")).as("mean"), r6(col("gini")).as("gini"))
        .orderBy("event_type")
    },
    Some("""
      WITH per AS (SELECT event_type AS g, user_id, sum("value") AS x
                   FROM events GROUP BY 1, 2),
      r AS (SELECT g, x,
                   row_number() OVER (PARTITION BY g ORDER BY x) AS i
            FROM per WHERE x IS NOT NULL),
      a AS (SELECT g, count(*) AS n, sum(x) AS total, sum(i * x) AS ix
            FROM r GROUP BY 1)
      SELECT g AS event_type, n, round(total, 2) AS total,
             round(total / n, 6) AS mean,
             round(CASE WHEN total > 0
                   THEN 2.0 * ix / (n * total) - (n + 1.0) / n
                   ELSE 0 END, 6) AS gini
      FROM a ORDER BY event_type"""))

  /** Coarsened exact matching ATT: treated = even users, outcome =
    * event value, strata = event type × day-of-week. Output is
    * relabeling-invariant (counts + ATT only), so the two engines'
    * different day-of-week numbering conventions cannot diverge. */
  private val q236 = Entry(
    "q236_cem",
    (s, d) =>
      graft.ops.Evaluation
        .coarsenedExactMatch(
          Tables.events(s, d).withColumn("dow", dayofweek(col("ts"))),
          col("user_id") % 2 === 0, "value", Seq("event_type", "dow"))
        .select(col("n_strata"), col("n_strata_matched"),
          col("n_treated"), col("n_treated_matched"),
          col("n_control_matched"), r6(col("att")).as("att")),
    Some("""
      WITH b AS (SELECT event_type AS et, dayofweek(ts) AS dow,
                        user_id % 2 = 0 AS t, "value" AS y
                 FROM events WHERE "value" IS NOT NULL),
      cells AS (SELECT et, dow,
                       sum(CASE WHEN t THEN 1.0 ELSE 0 END) AS nt,
                       sum(CASE WHEN t THEN 0 ELSE 1.0 END) AS nc,
                       sum(CASE WHEN t THEN y ELSE 0 END) AS syt,
                       sum(CASE WHEN t THEN 0 ELSE y END) AS syc
                FROM b GROUP BY 1, 2)
      SELECT count(*) AS n_strata,
             CAST(sum(CASE WHEN nt > 0 AND nc > 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_strata_matched,
             CAST(sum(nt) AS BIGINT) AS n_treated,
             CAST(sum(CASE WHEN nt > 0 AND nc > 0 THEN nt ELSE 0 END)
               AS BIGINT) AS n_treated_matched,
             CAST(sum(CASE WHEN nt > 0 AND nc > 0 THEN nc ELSE 0 END)
               AS BIGINT) AS n_control_matched,
             round(sum(CASE WHEN nt > 0 AND nc > 0
                       THEN nt * (syt / nt - syc / nc) ELSE 0 END) /
                   sum(CASE WHEN nt > 0 AND nc > 0 THEN nt ELSE 0 END), 6)
               AS att
      FROM cells"""))

  /** MMR diverse top-4 over the embeddings table: relevance = cosine
    * to a fixed md5-derived query direction, diversity penalty =
    * max cosine to the already-picked set (λ=0.7). The oracle unrolls
    * the 4 greedy rounds with the identical literal query vector and
    * operand-ordered arithmetic, so it selects the same sequence. */
  private val q237 = Entry(
    "q237_mmr_select",
    (s, d) => {
      val qv = lit(graft.ops.Similarity.planeWeights(0, 64))
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("v"))
        .withColumn("rel", graft.functions.VectorFunctions
          .cosineSimilarity(col("v"), qv))
      graft.ops.Similarity
        .mmrSelect(emb, "vec_id", "v", "rel", k = 4, lambda = 0.7)
        .select(col("round"), col("id").as("vec_id"),
          r6(col("rel")).as("rel"), r6(col("mmr")).as("mmr"))
        .orderBy("round")
    },
    Some {
      val lam = 0.7
      val oml = 1.0 - lam
      val qvLit = graft.ops.Similarity.planeWeights(0, 64)
        .mkString("[", ", ", "]")
      val rounds = (2 to 4).map { r =>
        val msExpr =
          if (r == 2) s"list_dot_product(c.v, s.v) / (c.nn * s.nn)"
          else s"greatest(c.ms, list_dot_product(c.v, s.v) / (c.nn * s.nn))"
        s"""c${r - 1} AS (SELECT c.id, c.v, c.nn, c.rel, $msExpr AS ms
           FROM c${r - 2} c, s${r - 1} s WHERE c.id <> s.id),
      s$r AS (SELECT id, v, nn, rel, ms, $lam * rel - $oml * ms AS mmr
              FROM c${r - 1} ORDER BY mmr DESC, id LIMIT 1)"""
      }.mkString(",\n      ")
      val selects = (1 to 4).map { r =>
        s"SELECT $r AS round, id AS vec_id, round(rel, 6) AS rel, " +
          s"round(mmr, 6) AS mmr FROM s$r"
      }.mkString("\n        UNION ALL ")
      s"""
      WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v,
                  sqrt(list_dot_product(embedding::DOUBLE[],
                                        embedding::DOUBLE[])) AS nn
                 FROM embeddings),
      qn AS (SELECT $qvLit::DOUBLE[] AS qv),
      c0 AS (SELECT id, v, nn,
                    list_dot_product(v, qv) /
                      (nn * sqrt(list_dot_product(qv, qv))) AS rel
             FROM e, qn),
      s1 AS (SELECT id, v, nn, rel, $lam * rel - $oml * 0.0 AS mmr
             FROM c0 ORDER BY mmr DESC, id LIMIT 1),
      $rounds
      SELECT * FROM (
        $selects)
      ORDER BY round"""
    })

  /** BPE merge learning: 3 rounds over the documents word-type
    * vocabulary — most frequent adjacent symbol pair, merged
    * everywhere, greedy left-to-right. The oracle unrolls the rounds
    * on the same wrapped-symbol representation. */
  private val q238 = Entry(
    "q238_bpe_merges",
    (s, d) =>
      graft.ops.TextAnalysis
        .bpeMerges(Tables.documents(s, d), "text", merges = 3)
        .orderBy("round"),
    Some {
      val mergedExpr = "'<' || substring(lft, 2, length(lft) - 2) || " +
        "substring(rgt, 2, length(rgt) - 2) || '>'"
      val rounds = (1 to 3).map { r =>
        val apply =
          if (r == 3) ""
          else s""",
      v$r AS (SELECT replace(s, lft || ' ' || rgt, $mergedExpr) AS s, n
              FROM v${r - 1}, m$r)"""
        s"""p$r AS (SELECT n, unnest(t[1:len(t)-1]) AS lft,
                    unnest(t[2:len(t)]) AS rgt
             FROM (SELECT n, string_split(s, ' ') AS t FROM v${r - 1})
             WHERE len(t) >= 2),
      g$r AS (SELECT lft, rgt, CAST(sum(n) AS BIGINT) AS cnt
              FROM p$r GROUP BY 1, 2),
      m$r AS (SELECT lft, rgt, cnt FROM g$r
              ORDER BY cnt DESC, lft, rgt LIMIT 1)$apply"""
      }.mkString(",\n      ")
      val selects = (1 to 3).map { r =>
        s"""SELECT $r AS round, lft AS "left", rgt AS "right",
             $mergedExpr AS merged, cnt FROM m$r"""
      }.mkString("\n        UNION ALL ")
      s"""
      WITH wt AS (SELECT unnest(string_split_regex(lower(text),
                    '[^a-z]+')) AS w FROM documents),
      wc AS (SELECT w, count(*) AS n FROM wt WHERE length(w) > 0
             GROUP BY 1),
      v0 AS (SELECT array_to_string(list_transform(
               string_split_regex(w, ''), c -> '<' || c || '>'), ' ')
               AS s, n
             FROM wc),
      $rounds
      SELECT * FROM (
        $selects)
      ORDER BY round"""
    })

  /** Reciprocal rank fusion of two user rankings per event type —
    * total spend and event frequency — top 5 fused users per type.
    * rrf sums two exact rationals 1/(60+rank): IEEE-identical across
    * engines, so the fused ordering is deterministic. */
  private val q239 = Entry(
    "q239_rank_fusion",
    (s, d) => {
      val per = Tables.events(s, d)
        .groupBy(col("event_type").as("q"), col("user_id").as("doc"))
        .agg(sum("value").as("spend"),
          count(lit(1)).cast("double").as("freq"))
      val melted = per.select(col("q"), col("doc"),
        explode(array(
          struct(lit("spend").as("rkr"), col("spend").as("score")),
          struct(lit("freq").as("rkr"), col("freq").as("score"))))
          .as("m"))
        .select(col("q"), col("doc"), col("m.rkr").as("rkr"),
          col("m.score").as("score"))
      val fused = graft.ops.Evaluation
        .reciprocalRankFusion(melted, "q", "doc", "rkr", "score", 60)
      val w = Window.partitionBy(col("query"))
        .orderBy(desc("rrf"), col("doc").asc)
      fused.withColumn("rn", row_number().over(w))
        .where(col("rn") <= 5)
        .select(col("query"), col("doc"), col("n_rankers"),
          r6(col("rrf")).as("rrf"), col("rn"))
        .orderBy("query", "rn")
    },
    Some("""
      WITH per AS (SELECT event_type AS q, user_id AS doc,
                          sum("value") AS spend,
                          count(*)::DOUBLE AS freq
                   FROM events GROUP BY 1, 2),
      m AS (SELECT q, doc, 'spend' AS rkr, spend AS score FROM per
            UNION ALL
            SELECT q, doc, 'freq', freq FROM per),
      r AS (SELECT q, doc,
                   row_number() OVER (PARTITION BY rkr, q
                     ORDER BY score DESC, doc ASC) AS rk
            FROM m),
      f AS (SELECT q, doc, count(*) AS n_rankers,
                   sum(1.0 / (60.0 + rk)) AS rrf
            FROM r GROUP BY 1, 2),
      t AS (SELECT q, doc, n_rankers, rrf,
                   row_number() OVER (PARTITION BY q
                     ORDER BY rrf DESC, doc ASC) AS rn
            FROM f)
      SELECT q AS query, doc, n_rankers, round(rrf, 6) AS rrf, rn
      FROM t WHERE rn <= 5 ORDER BY query, rn"""))

  /** Hashing-trick encoding of four lineitem categoricals into an
    * 8-dim signed vector, profiled as per-returnflag means — the
    * vocabulary-free encoder; both index and sign hashes ride the
    * PortableHash md5 primitive, replayed verbatim by the oracle. */
  private val q240 = Entry(
    "q240_feature_hashing",
    (s, d) => {
      val cols = Seq("l_returnflag", "l_linestatus", "l_linenumber",
        "l_suppkey")
      val aggs = count(lit(1)).as("n") +: (0 until 8).map(j =>
        r6(avg(element_at(col("hashed"), j + 1))).as(s"h$j"))
      graft.ops.Features
        .hashFeatures(Tables.lineitem(s, d), cols, dims = 8,
          viaDictionary = true)
        .groupBy("l_returnflag")
        .agg(aggs.head, aggs.tail: _*)
        .orderBy("l_returnflag")
    },
    Some {
      val cols = Seq("l_returnflag", "l_linestatus", "l_linenumber",
        "l_suppkey")
      def b(k: String) =
        s"(('0x' || substring(md5($k), 1, 15))::BIGINT % 1048576)"
      def idx(c: String) = s"(${b(s"'$c' || '|' || $c")} % 8)"
      def sgn(c: String) =
        s"(CASE WHEN ${b(s"'s' || '|' || '$c' || '|' || $c")} % 2 = 0 " +
          "THEN 1.0 ELSE -1.0 END)"
      val hs = (0 until 8).map { j =>
        val terms = cols.map(c =>
          s"(CASE WHEN ${idx(c)} = $j THEN ${sgn(c)} ELSE 0.0 END)")
          .mkString(" + ")
        s"round(avg($terms), 6) AS h$j"
      }.mkString(",\n             ")
      s"""
      SELECT l_returnflag, count(*) AS n,
             $hs
      FROM lineitem GROUP BY 1 ORDER BY l_returnflag"""
    })

  /** Column-level PII exposure profile over documents, with
    * deterministic synthetic PII injected into a derived text column
    * (the corpus itself is clean — both engines replay the same
    * injection, exercising all four pattern classes). */
  private val q241 = Entry(
    "q241_pii_profile",
    (s, d) => {
      val doc = Tables.documents(s, d)
        .withColumn("text2", concat(col("text"),
          when(col("doc_id") % 7 === 0,
            concat(lit(" contact user"), col("doc_id"),
              lit("@example.com")))
            .when(col("doc_id") % 11 === 0, lit(" ssn 123-45-6789"))
            .when(col("doc_id") % 13 === 0,
              lit(" from 10.0.42.7 at +1 (415) 555-0100"))
            .otherwise(lit(""))))
      graft.ops.TextAnalysis
        .piiProfile(doc, Seq("text2", "lang", "source"))
        .select(col("column"), col("n"),
          r6(col("email_rate")).as("email_rate"),
          r6(col("ssn_rate")).as("ssn_rate"),
          r6(col("ipv4_rate")).as("ipv4_rate"),
          r6(col("phone_rate")).as("phone_rate"),
          r6(col("any_rate")).as("any_rate"))
        .orderBy("column")
    },
    Some {
      val pats = Seq(
        "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
        "ssn" -> "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b",
        "ipv4" -> "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b",
        "phone" -> "\\+?[0-9][0-9 ()./-]{6,}[0-9]")
      def rates(c: String) = {
        val per = pats.map { case (k, p) =>
          s"round(sum(CASE WHEN regexp_matches($c, '$p') THEN 1.0 " +
            s"ELSE 0.0 END) / count(*), 6) AS ${k}_rate"
        }.mkString(",\n               ")
        val anyHit = pats.map { case (_, p) =>
          s"regexp_matches($c, '$p')" }.mkString(" OR ")
        s"""SELECT '$c' AS "column", count(*) AS n,
               $per,
               round(sum(CASE WHEN $anyHit THEN 1.0 ELSE 0.0 END) /
                 count(*), 6) AS any_rate
        FROM d"""
      }
      s"""
      WITH d AS (SELECT lang, source,
        text || CASE
          WHEN doc_id % 7 = 0 THEN ' contact user' || doc_id ||
            '@example.com'
          WHEN doc_id % 11 = 0 THEN ' ssn 123-45-6789'
          WHEN doc_id % 13 = 0 THEN ' from 10.0.42.7 at +1 (415) 555-0100'
          ELSE '' END AS text2
        FROM documents)
      SELECT * FROM (
        ${rates("text2")}
        UNION ALL ${rates("lang")}
        UNION ALL ${rates("source")})
      ORDER BY "column""""
    })

  /** Segment-insight sweep: which (feature, value) cells move mean
    * extended price, as finite-population-corrected z-scores — the
    * one-scan automated-insights primitive. */
  private val q242 = Entry(
    "q242_segment_insights",
    (s, d) =>
      graft.ops.Profiling
        .segmentInsights(Tables.lineitem(s, d), "l_extendedprice",
          Seq("l_returnflag", "l_linestatus", "l_linenumber"),
          minSupport = 30)
        .select(col("feature"), col("value"), col("n"),
          r6(col("mean")).as("mean"), r6(col("lift")).as("lift"),
          r6(col("z")).as("z"))
        .orderBy("feature", "value"),
    Some("""
      WITH b AS (SELECT l_extendedprice::DOUBLE AS y, l_returnflag,
                        l_linestatus, l_linenumber
                 FROM lineitem WHERE l_extendedprice IS NOT NULL),
      m AS (SELECT 'l_returnflag' AS feature,
                   l_returnflag::VARCHAR AS value, y FROM b
            UNION ALL
            SELECT 'l_linestatus', l_linestatus::VARCHAR, y FROM b
            UNION ALL
            SELECT 'l_linenumber', l_linenumber::VARCHAR, y FROM b),
      c AS (SELECT feature, value, count(*) AS n, avg(y) AS mean
            FROM m GROUP BY 1, 2 HAVING count(*) >= 30),
      g AS (SELECT count(*)::DOUBLE AS nn, avg(y) AS gm,
                   var_samp(y) AS gv
            FROM b)
      SELECT feature, value, n, round(mean, 6) AS mean,
             round(mean / gm, 6) AS lift,
             round((mean - gm) /
               sqrt(gv * (1.0 / n - 1.0 / nn)), 6) AS z
      FROM c, g ORDER BY feature, value"""))

  /** Quantile treatment effects of the even-user "treatment" on event
    * value: exact per-arm DISC quantiles at 4 probabilities, melted to
    * one row per quantile. */
  private val q243 = Entry(
    "q243_qte",
    (s, d) =>
      graft.ops.Evaluation
        .quantileTreatmentEffect(
          Tables.events(s, d).where(col("value").isNotNull),
          col("user_id") % 2 === 0, "value")
        .select(col("p"), r6(col("q_treat")).as("q_treat"),
          r6(col("q_control")).as("q_control"), r6(col("qte")).as("qte"))
        .orderBy("p"),
    Some("""
      WITH b AS (SELECT "value"::DOUBLE AS y, user_id % 2 = 0 AS t
                 FROM events WHERE "value" IS NOT NULL),
      q AS (SELECT
              quantile_disc(y, 0.25) FILTER (WHERE t) AS t25,
              quantile_disc(y, 0.5)  FILTER (WHERE t) AS t50,
              quantile_disc(y, 0.75) FILTER (WHERE t) AS t75,
              quantile_disc(y, 0.9)  FILTER (WHERE t) AS t90,
              quantile_disc(y, 0.25) FILTER (WHERE NOT t) AS c25,
              quantile_disc(y, 0.5)  FILTER (WHERE NOT t) AS c50,
              quantile_disc(y, 0.75) FILTER (WHERE NOT t) AS c75,
              quantile_disc(y, 0.9)  FILTER (WHERE NOT t) AS c90
            FROM b)
      SELECT * FROM (
        SELECT 0.25::DOUBLE AS p, round(t25, 6) AS q_treat,
               round(c25, 6) AS q_control, round(t25 - c25, 6) AS qte
        FROM q
        UNION ALL SELECT 0.5, round(t50, 6), round(c50, 6),
               round(t50 - c50, 6) FROM q
        UNION ALL SELECT 0.75, round(t75, 6), round(c75, 6),
               round(t75 - c75, 6) FROM q
        UNION ALL SELECT 0.9, round(t90, 6), round(c90, 6),
               round(t90 - c90, 6) FROM q)
      ORDER BY p"""))

  /** Multi-feature OLS (normal equations, one sufficient-stats scan +
    * driver solve) of rescaled extended price on quantity and
    * discount. The oracle solves the same 3×3 system by Cramer's rule
    * from identical sufficient statistics; unit-ish feature scaling
    * keeps the system's condition number small so cross-engine fp
    * noise stays orders of magnitude under the rounding grid. */
  private val q244 = Entry(
    "q244_linear_regression",
    (s, d) => {
      val li = Tables.lineitem(s, d).select(
        (col("l_extendedprice") / lit(10000.0)).as("y4"),
        (col("l_quantity") / lit(10.0)).as("x1"),
        (col("l_discount") * lit(10.0)).as("x2"))
      graft.ops.Regression.linearRegression(li, Seq("x1", "x2"), "y4")
        .select(col("term"), r6(col("coef")).as("coef"), col("n"),
          r6(col("r2")).as("r2"), r6(col("mse")).as("mse"))
        .orderBy("term")
    },
    Some("""
      WITH b AS (SELECT l_extendedprice::DOUBLE / 10000.0 AS yv,
                        l_quantity::DOUBLE / 10.0 AS x1,
                        l_discount::DOUBLE * 10.0 AS x2
                 FROM lineitem
                 WHERE l_extendedprice IS NOT NULL
                   AND l_quantity IS NOT NULL AND l_discount IS NOT NULL),
      s AS (SELECT count(*)::DOUBLE AS n, sum(x1) AS s1, sum(x2) AS s2,
                   sum(x1 * x1) AS s11, sum(x1 * x2) AS s12,
                   sum(x2 * x2) AS s22, sum(yv) AS sy,
                   sum(x1 * yv) AS s1y, sum(x2 * yv) AS s2y,
                   sum(yv * yv) AS syy
            FROM b),
      d AS (SELECT *, n * (s11 * s22 - s12 * s12) -
                      s1 * (s1 * s22 - s12 * s2) +
                      s2 * (s1 * s12 - s11 * s2) AS det
            FROM s),
      c AS (SELECT *,
        (sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) +
         s2 * (s1y * s12 - s11 * s2y)) / det AS b0,
        (n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) +
         s2 * (s1 * s2y - s1y * s2)) / det AS b1,
        (n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) +
         sy * (s1 * s12 - s11 * s2)) / det AS b2
        FROM d),
      f AS (SELECT *,
        syy - 2 * (b0 * sy + b1 * s1y + b2 * s2y) +
          (b0 * b0 * n + b1 * b1 * s11 + b2 * b2 * s22 +
           2 * b0 * b1 * s1 + 2 * b0 * b2 * s2 + 2 * b1 * b2 * s12)
          AS rss,
        syy - sy * sy / n AS tss
        FROM c)
      SELECT * FROM (
        SELECT '(intercept)' AS term, round(b0, 6) AS coef,
               n::BIGINT AS n, round(1 - rss / tss, 6) AS r2,
               round(rss / n, 6) AS mse FROM f
        UNION ALL SELECT 'x1', round(b1, 6), n::BIGINT,
               round(1 - rss / tss, 6), round(rss / n, 6) FROM f
        UNION ALL SELECT 'x2', round(b2, 6), n::BIGINT,
               round(1 - rss / tss, 6), round(rss / n, 6) FROM f)
      ORDER BY term"""))

  /** Categorical naive Bayes: train on the hash-split half of
    * lineitem, predict return flag from line status / line number /
    * quantity decile on the other half; confusion-matrix readout.
    * Scores are rounded to 9 dp before the argmax in BOTH engines so
    * a JVM-vs-libm ln() ulp cannot flip a genuine tie. */
  private val q245 = Entry(
    "q245_naive_bayes",
    (s, d) => {
      // (orderkey, linenumber) is NOT unique in the synthetic
      // lineitem — the 4-column key is, and both the split hash and
      // the scoring key must ride it
      val li = Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_returnflag"),
        col("l_linestatus").cast("string").as("f0"),
        col("l_linenumber").cast("string").as("f1"),
        floor(col("l_quantity") / 10).cast("string").as("f2"),
        graft.functions.PortableHash
          .bucket(Seq(col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_suppkey")))
          .as("__bkt"))
        // one materialization: fit reads the train side twice (labels,
        // melted counts) and score reads test — without this the
        // corpus and its md5 split hash recompute on every consumer
        .localCheckpoint()
      val train = li.where(col("__bkt") < 524288)
      val test = li.where(col("__bkt") >= 524288)
      graft.ops.NaiveBayes
        .confusion(train, test, Seq("f0", "f1", "f2"), "l_returnflag",
          Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
          alpha = 1.0,
          scoreRound = Some(9))
        .orderBy("true_label", "pred_label")
    },
    Some("""
      WITH li AS (SELECT l_orderkey, l_linenumber, l_partkey,
                         l_suppkey, l_returnflag AS lbl,
                         l_linestatus::VARCHAR AS f0,
                         l_linenumber::VARCHAR AS f1,
                         CAST(floor(l_quantity / 10) AS BIGINT)::VARCHAR
                           AS f2,
                         (('0x' || substring(md5(l_orderkey || '|' ||
                            l_linenumber || '|' || l_partkey || '|' ||
                            l_suppkey), 1, 15))::BIGINT % 1048576)
                           AS bkt
                  FROM lineitem),
      tr AS (SELECT * FROM li WHERE bkt < 524288),
      te AS (SELECT * FROM li WHERE bkt >= 524288),
      lc AS (SELECT lbl AS label, count(*)::DOUBLE AS n_l
             FROM tr GROUP BY 1),
      na AS (SELECT count(*)::DOUBLE AS n_all FROM tr),
      c0 AS (SELECT f0 AS v, lbl AS label, count(*)::DOUBLE AS c
             FROM tr GROUP BY 1, 2),
      c1 AS (SELECT f1 AS v, lbl AS label, count(*)::DOUBLE AS c
             FROM tr GROUP BY 1, 2),
      c2 AS (SELECT f2 AS v, lbl AS label, count(*)::DOUBLE AS c
             FROM tr GROUP BY 1, 2),
      d0 AS (SELECT label, sum(c) AS cf,
                    (SELECT count(DISTINCT f0) FROM tr)::DOUBLE AS vf
             FROM c0 GROUP BY 1),
      d1 AS (SELECT label, sum(c) AS cf,
                    (SELECT count(DISTINCT f1) FROM tr)::DOUBLE AS vf
             FROM c1 GROUP BY 1),
      d2 AS (SELECT label, sum(c) AS cf,
                    (SELECT count(DISTINCT f2) FROM tr)::DOUBLE AS vf
             FROM c2 GROUP BY 1),
      sc AS (SELECT te.l_orderkey, te.l_linenumber, te.l_partkey,
                    te.l_suppkey, te.lbl AS true_label, lc.label,
                    round(ln(lc.n_l / na.n_all)
                      + ln((coalesce(c0.c, 0) + 1.0) /
                           (d0.cf + 1.0 * d0.vf))
                      + ln((coalesce(c1.c, 0) + 1.0) /
                           (d1.cf + 1.0 * d1.vf))
                      + ln((coalesce(c2.c, 0) + 1.0) /
                           (d2.cf + 1.0 * d2.vf)), 9) AS score
             FROM te CROSS JOIN na CROSS JOIN lc
             LEFT JOIN c0 ON c0.v = te.f0 AND c0.label = lc.label
             JOIN d0 ON d0.label = lc.label
             LEFT JOIN c1 ON c1.v = te.f1 AND c1.label = lc.label
             JOIN d1 ON d1.label = lc.label
             LEFT JOIN c2 ON c2.v = te.f2 AND c2.label = lc.label
             JOIN d2 ON d2.label = lc.label),
      pr AS (SELECT true_label, label AS pred_label,
                    row_number() OVER (
                      PARTITION BY l_orderkey, l_linenumber, l_partkey,
                        l_suppkey
                      ORDER BY score DESC, label ASC) AS rn
             FROM sc)
      SELECT true_label, pred_label, count(*) AS n
      FROM pr WHERE rn = 1 GROUP BY 1, 2
      ORDER BY true_label, pred_label"""))

  /** Per-event-type daily revenue trend: closed-form per-key OLS of
    * the day-grain rollup on the day index — slope/intercept/r² per
    * type in one grouped aggregation, no driver involvement. */
  private val q246 = Entry(
    "q246_grouped_ols",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum("value").as("y"))
        .withColumn("x",
          datediff(col("day"), lit("2024-01-01").cast("date"))
            .cast("double"))
      graft.ops.Regression
        .groupedOls(daily, Seq("event_type"), "x", "y")
        .select(col("event_type"), col("n"),
          r6(col("slope")).as("slope"),
          r6(col("intercept")).as("intercept"), r6(col("r2")).as("r2"))
        .orderBy("event_type")
    },
    Some("""
      WITH d AS (SELECT event_type AS g,
                        date_diff('day', DATE '2024-01-01',
                          ts::DATE)::DOUBLE AS x,
                        sum("value") AS y
                 FROM events GROUP BY event_type, ts::DATE),
      a AS (SELECT g, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                   sum(x * x) AS sxx, sum(x * y) AS sxy,
                   sum(y * y) AS syy
            FROM d GROUP BY 1)
      SELECT g AS event_type, n,
             round((sxy - sx * sy / n) / (sxx - sx * sx / n), 6)
               AS slope,
             round((sy - (sxy - sx * sy / n) / (sxx - sx * sx / n) * sx)
               / n, 6) AS intercept,
             round((sxy - sx * sy / n) * (sxy - sx * sy / n) /
               ((sxx - sx * sx / n) * (syy - sy * sy / n)), 6) AS r2
      FROM a ORDER BY event_type"""))

  /** Mantel–Haenszel common odds ratio + CMH χ² of the even-user
    * "treatment" on high-value events, stratified by event type. */
  private val q247 = Entry(
    "q247_mantel_haenszel",
    (s, d) =>
      graft.ops.Evaluation
        .mantelHaenszel(Tables.events(s, d),
          col("user_id") % 2 === 0, col("value") > 100,
          Seq("event_type"))
        .select(col("n_strata"), col("n"), r6(col("or_mh")).as("or_mh"),
          r6(col("chi2")).as("chi2")),
    Some("""
      WITH b AS (SELECT event_type AS st, user_id % 2 = 0 AS t,
                        "value" > 100 AS s
                 FROM events),
      c AS (SELECT st,
                   sum(CASE WHEN t AND s THEN 1.0 ELSE 0 END) AS a,
                   sum(CASE WHEN t AND NOT s THEN 1.0 ELSE 0 END) AS b2,
                   sum(CASE WHEN NOT t AND s THEN 1.0 ELSE 0 END) AS c2,
                   sum(CASE WHEN NOT t AND NOT s THEN 1.0 ELSE 0 END)
                     AS d
            FROM b GROUP BY 1),
      e AS (SELECT *, a + b2 + c2 + d AS n, a + b2 AS r1, a + c2 AS c1
            FROM c)
      SELECT count(*) AS n_strata, CAST(sum(n) AS BIGINT) AS n,
             round(sum(a * d / n) / sum(b2 * c2 / n), 6) AS or_mh,
             round(pow(sum(a - r1 * c1 / n), 2) /
               sum(r1 * (n - r1) * c1 * (n - c1) /
                   (n * n * (n - 1.0))), 6) AS chi2
      FROM e"""))

  /** Per-document keyword extraction: top-3 TF-IDF terms for the
    * first 15 docs (corpus-level idf, filtered after ranking). */
  private val q248 = Entry(
    "q248_top_terms",
    (s, d) =>
      graft.ops.TextAnalysis
        .topTerms(Tables.documents(s, d), "doc_id", "text", 3)
        .where(col("id") < 15)
        .select(col("id").as("doc_id"), col("rank"), col("term"),
          r6(col("tfidf")).as("tfidf"))
        .orderBy("doc_id", "rank"),
    Some("""
      WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents),
      tc AS (SELECT doc_id, term, count(*) AS cnt FROM toks GROUP BY 1, 2),
      dl AS (SELECT doc_id, sum(cnt) AS doc_len FROM tc GROUP BY 1),
      dfr AS (SELECT term, count(*) AS doc_freq FROM tc GROUP BY 1),
      n AS (SELECT count(*) AS n_docs FROM documents),
      sc AS (
        SELECT tc.doc_id, tc.term,
               (cnt / doc_len) * ln(n_docs / doc_freq) AS tfidf
        FROM tc JOIN dl USING (doc_id) JOIN dfr USING (term), n),
      r AS (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY tfidf DESC, term) AS rn
        FROM sc)
      SELECT doc_id, rn AS rank, term, round(tfidf, 6) AS tfidf
      FROM r WHERE rn <= 3 AND doc_id < 15
      ORDER BY doc_id, rank"""))

  /** Two-sample Poisson rate test: per-user event counts over
    * active-day exposure, even vs odd users. */
  private val q249 = Entry(
    "q249_poisson_rate",
    (s, d) => {
      val per = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("cnt"),
          countDistinct(to_date(col("ts"))).as("days"))
      graft.ops.Evaluation
        .poissonRateTest(per, col("user_id") % 2 === 0, col("cnt"),
          col("days"))
        .select(col("count_t"), col("exposure_t"),
          r6(col("rate_t")).as("rate_t"), col("count_c"),
          col("exposure_c"), r6(col("rate_c")).as("rate_c"),
          r6(col("rate_ratio")).as("rate_ratio"), r6(col("z")).as("z"))
    },
    Some("""
      WITH per AS (SELECT user_id, count(*)::DOUBLE AS cnt,
                          count(DISTINCT ts::DATE)::DOUBLE AS days
                   FROM events GROUP BY 1),
      a AS (SELECT
              sum(CASE WHEN user_id % 2 = 0 THEN cnt ELSE 0 END) AS ct,
              sum(CASE WHEN user_id % 2 = 0 THEN days ELSE 0 END) AS et,
              sum(CASE WHEN user_id % 2 <> 0 THEN cnt ELSE 0 END) AS cc,
              sum(CASE WHEN user_id % 2 <> 0 THEN days ELSE 0 END) AS ec
            FROM per)
      SELECT ct AS count_t, et AS exposure_t,
             round(ct / et, 6) AS rate_t,
             cc AS count_c, ec AS exposure_c,
             round(cc / ec, 6) AS rate_c,
             round(ct / et / (cc / ec), 6) AS rate_ratio,
             round((ct / et - cc / ec) /
               sqrt(ct / (et * et) + cc / (ec * ec)), 6) AS z
      FROM a"""))

  /** Missingness-correlation profile over documents with
    * deterministically injected nulls: lang misses on every 5th doc,
    * source on every 10th (a subset — φ strongly positive), n_chars
    * on every 3rd (independent). */
  private val q250 = Entry(
    "q250_missingness_corr",
    (s, d) => {
      val doc = Tables.documents(s, d).select(
        when(col("doc_id") % 5 === 0, lit(null).cast("string"))
          .otherwise(col("lang")).as("lang2"),
        when(col("doc_id") % 10 === 0, lit(null).cast("string"))
          .otherwise(col("source")).as("source2"),
        when(col("doc_id") % 3 === 0, lit(null).cast("long"))
          .otherwise(col("n_chars")).as("chars2"))
      graft.ops.Profiling
        .missingnessCorrelation(doc, Seq("lang2", "source2", "chars2"))
        .select(col("col_a"), col("col_b"), col("n"), col("null_a"),
          col("null_b"), col("both_null"), r6(col("phi")).as("phi"))
        .orderBy("col_a", "col_b")
    },
    Some("""
      WITH d AS (SELECT
        CASE WHEN doc_id % 5 = 0 THEN 1.0 ELSE 0.0 END AS ia,
        CASE WHEN doc_id % 10 = 0 THEN 1.0 ELSE 0.0 END AS ib,
        CASE WHEN doc_id % 3 = 0 THEN 1.0 ELSE 0.0 END AS ic
        FROM documents),
      a AS (SELECT count(*)::DOUBLE AS n, sum(ia) AS ma, sum(ib) AS mb,
                   sum(ic) AS mc, sum(ia * ib) AS bab,
                   sum(ia * ic) AS bac, sum(ib * ic) AS bbc
            FROM d)
      SELECT * FROM (
        SELECT 'lang2' AS col_a, 'source2' AS col_b, n::BIGINT AS n,
               ma::BIGINT AS null_a, mb::BIGINT AS null_b,
               bab::BIGINT AS both_null,
               round((n * bab - ma * mb) /
                 sqrt(ma * (n - ma) * mb * (n - mb)), 6) AS phi
        FROM a
        UNION ALL
        SELECT 'lang2', 'chars2', n::BIGINT, ma::BIGINT, mc::BIGINT,
               bac::BIGINT,
               round((n * bac - ma * mc) /
                 sqrt(ma * (n - ma) * mc * (n - mc)), 6)
        FROM a
        UNION ALL
        SELECT 'source2', 'chars2', n::BIGINT, mb::BIGINT, mc::BIGINT,
               bbc::BIGINT,
               round((n * bbc - mb * mc) /
                 sqrt(mb * (n - mb) * mc * (n - mc)), 6)
        FROM a)
      ORDER BY col_a, col_b"""))

  /** l-diversity of customer market segment within (order status,
    * priority) quasi-identifier classes — does a QI class leak the
    * sensitive attribute outright (l = 1)? */
  private val q251 = Entry(
    "q251_l_diversity",
    (s, d) => {
      val oc = Tables.orders(s, d)
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
      graft.ops.Profiling
        .lDiversityProfile(oc, Seq("o_orderstatus", "o_orderpriority"),
          "c_mktsegment", riskL = 3)
        .select(col("l"), col("n_classes"), col("n_rows"),
          col("at_risk"), r6(col("avg_entropy")).as("avg_entropy"))
        .orderBy("l")
    },
    Some("""
      WITH oc AS (SELECT o_orderstatus AS s1, o_orderpriority AS s2,
                         c_mktsegment AS sv
                  FROM orders JOIN customer ON o_custkey = c_custkey),
      cells AS (SELECT s1, s2, sv, count(*)::DOUBLE AS c
                FROM oc GROUP BY 1, 2, 3),
      pc AS (SELECT s1, s2, count(*) AS l, sum(c) AS sz,
                    ln(sum(c)) - sum(c * ln(c)) / sum(c) AS h
             FROM cells GROUP BY 1, 2)
      SELECT l, count(*) AS n_classes, CAST(sum(sz) AS BIGINT) AS n_rows,
             l < 3 AS at_risk, round(avg(h), 6) AS avg_entropy
      FROM pc GROUP BY l ORDER BY l"""))

  /** t-closeness of the same QI/sensitive pair: per-class total
    * variation distance from the global segment distribution,
    * rolled up to max/avg and the over-threshold census. */
  private val q252 = Entry(
    "q252_t_closeness",
    (s, d) => {
      val oc = Tables.orders(s, d)
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
      graft.ops.Profiling
        .tClosenessProfile(oc, Seq("o_orderstatus", "o_orderpriority"),
          "c_mktsegment", t = 0.05)
        .select(col("n_classes"), r6(col("max_tvd")).as("max_tvd"),
          r6(col("avg_tvd")).as("avg_tvd"), col("classes_over"),
          col("rows_over"))
    },
    Some("""
      WITH oc AS (SELECT o_orderstatus AS s1, o_orderpriority AS s2,
                         c_mktsegment AS sv
                  FROM orders JOIN customer ON o_custkey = c_custkey),
      cells AS (SELECT s1, s2, sv, count(*)::DOUBLE AS c
                FROM oc GROUP BY 1, 2, 3),
      tot AS (SELECT sum(c) AS tot FROM cells),
      gq AS (SELECT sv, sum(c) / tot AS q FROM cells, tot
             GROUP BY sv, tot),
      szs AS (SELECT s1, s2, sum(c) AS sz FROM cells GROUP BY 1, 2),
      j AS (SELECT cells.s1, cells.s2, max(szs.sz) AS sz,
                   sum(abs(cells.c / szs.sz - gq.q)) AS sabs,
                   sum(gq.q) AS qpres
            FROM cells
            JOIN szs ON cells.s1 = szs.s1 AND cells.s2 = szs.s2
            JOIN gq ON cells.sv = gq.sv
            GROUP BY 1, 2),
      tv AS (SELECT sz, 0.5 * (sabs + 1.0 - qpres) AS tvd FROM j)
      SELECT count(*) AS n_classes, round(max(tvd), 6) AS max_tvd,
             round(avg(tvd), 6) AS avg_tvd,
             CAST(sum(CASE WHEN tvd > 0.05 THEN 1 ELSE 0 END) AS BIGINT)
               AS classes_over,
             CAST(sum(CASE WHEN tvd > 0.05 THEN sz ELSE 0 END) AS BIGINT)
               AS rows_over
      FROM tv"""))

  /** Change data feed over the snapshot store: full load → one upsert
    * (updates the key%10 rows, inserts negated-key rows for key%7=3) →
    * one positive-key predicate delete; the CDF between each version
    * pair, rolled up per change type. Oracle replays the same
    * mutations as CASE logic on the source table. */
  private val q253 = Entry(
    "q253_snapshot_cdf",
    (s, d) => {
      import graft.etl.{SnapshotStore, WriteMode}
      val ord = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderstatus"))
      val fp = ord.agg(count(lit(1)),
        expr("bit_xor(xxhash64(o_orderkey))")).head()
      val tag = java.lang.Long.toHexString(fp.getLong(0) ^ fp.getLong(1))
      val base = s"${sys.props("java.io.tmpdir")}/graft_snap_cdf/$tag"
      val hBase = new org.apache.hadoop.fs.Path(base)
      val hFs = hBase.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (hFs.exists(hBase)) hFs.delete(hBase, true)
      val st = SnapshotStore(s"$base/t",
        orderColumn = Some("o_orderkey"))
      st.write(ord, WriteMode.Full)
      val batch = ord.where(pmod(col("o_orderkey"), lit(10)) === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .withColumn("o_orderstatus", lit("X"))
        .unionByName(ord.where(pmod(col("o_orderkey"), lit(7)) === 3)
          .select((-col("o_orderkey")).as("o_orderkey"),
            (col("o_totalprice") + 1000).as("o_totalprice"),
            lit("N").as("o_orderstatus")))
      st.write(batch, WriteMode.Upsert, Seq("o_orderkey"))
      st.delete(s, "o_orderkey % 100 = 0 AND o_orderkey > 0")
      def roll(fromV: Long, toV: Long): DataFrame =
        st.changes(s, fromV, toV, Seq("o_orderkey"))
          .groupBy(lit(s"v$fromV-v$toV").as("step"), col("change_type"))
          .agg(count(lit(1)).as("n"),
            r2(sum(col("o_totalprice"))).as("total"))
      roll(1, 2).unionByName(roll(2, 3))
        .orderBy("step", "change_type")
    },
    Some("""
      WITH o AS (SELECT o_orderkey AS k, o_totalprice AS tp FROM orders)
      SELECT * FROM (
        SELECT 'v1-v2' AS step, 'insert' AS change_type,
               count(*) AS n, round(sum(tp + 1000), 2) AS total
        FROM o WHERE k % 7 = 3
        UNION ALL
        SELECT 'v1-v2', 'update', count(*), round(sum(tp * 2), 2)
        FROM o WHERE k % 10 = 0
        UNION ALL
        SELECT 'v2-v3', 'delete', count(*), round(sum(tp * 2), 2)
        FROM o WHERE k % 100 = 0 AND k > 0)
      ORDER BY step, change_type"""))

  /** UCB1 arm index over event types: mean high-value-event rate per
    * arm plus the sqrt(2·ln N / n) exploration bonus. */
  private val q254 = Entry(
    "q254_ucb_arms",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"),
          when(col("value") > 100, 1.0).otherwise(0.0).as("reward"))
      graft.ops.Evaluation.ucbScores(ev, "event_type", "reward")
        .select(col("arm"), col("n_pulls"),
          r6(col("mean_reward")).as("mean_reward"),
          r6(col("bonus")).as("bonus"), r6(col("ucb")).as("ucb"))
        .orderBy("arm")
    },
    Some("""
      WITH a AS (SELECT event_type AS arm, count(*)::DOUBLE AS n,
                        avg(CASE WHEN "value" > 100 THEN 1.0 ELSE 0.0 END)
                          AS m
                 FROM events GROUP BY 1),
      t AS (SELECT count(*)::DOUBLE AS big_n FROM events)
      SELECT arm, n::BIGINT AS n_pulls, round(m, 6) AS mean_reward,
             round(sqrt(2) * sqrt(ln(big_n) / n), 6) AS bonus,
             round(m + sqrt(2) * sqrt(ln(big_n) / n), 6) AS ucb
      FROM a, t ORDER BY arm"""))

  /** Cochran–Armitage trend: is the big-ticket rate monotone in order
    * priority level (1-URGENT … 5-LOW)? */
  private val q255 = Entry(
    "q255_trend_test",
    (s, d) => {
      graft.ops.Evaluation.cochranArmitage(
          Tables.orders(s, d),
          substring(col("o_orderpriority"), 1, 1).cast("int"),
          col("o_totalprice") > 150000)
        .select(col("n"), col("n_success"), r6(col("p_bar")).as("p_bar"),
          r6(col("z")).as("z"), r6(col("chi2")).as("chi2"))
    },
    Some("""
      WITH g AS (SELECT substring(o_orderpriority, 1, 1)::INT::DOUBLE AS s,
                        count(*)::DOUBLE AS n,
                        sum(CASE WHEN o_totalprice > 150000
                            THEN 1.0 ELSE 0.0 END) AS r
                 FROM orders GROUP BY 1),
      a AS (SELECT sum(n) AS nn, sum(r) AS rr, sum(s * r) AS t,
                   sum(s * n) AS sn, sum(s * s * n) AS s2n
            FROM g)
      SELECT nn::BIGINT AS n, rr::BIGINT AS n_success,
             round(rr / nn, 6) AS p_bar,
             round((t - rr / nn * sn) /
               sqrt(rr / nn * (1 - rr / nn) * (s2n - sn * sn / nn)), 6)
               AS z,
             round(pow((t - rr / nn * sn) /
               sqrt(rr / nn * (1 - rr / nn) * (s2n - sn * sn / nn)), 2), 6)
               AS chi2
      FROM a"""))

  /** HITS hubs/authorities on the customer→supplier bipartite graph,
    * 2 normalized iterations (oracle unrolls them). */
  private val q256 = Entry(
    "q256_hits",
    (s, d) => {
      graft.ops.Graph.hits(custSuppEdges(s, d), "src", "dst",
          iterations = 2)
        .select(col("node"), r6(col("hub")).as("hub"),
          r6(col("authority")).as("authority"))
        .where(substring(col("node"), 1, 1) === "s" ||
          col("node").isin((1 to 40).map("c" + _): _*))
        .orderBy("node")
    },
    Some("""
      WITH e AS (SELECT DISTINCT 'c' || o_custkey AS src,
                        's' || l_suppkey AS dst
                 FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      a1r AS (SELECT dst AS node, count(*)::DOUBLE AS a
              FROM e GROUP BY 1),
      a1n AS (SELECT sqrt(sum(a * a)) AS na FROM a1r),
      a1 AS (SELECT nodes.node, coalesce(a, 0) / na AS a
             FROM nodes LEFT JOIN a1r USING (node), a1n),
      h1r AS (SELECT e.src AS node, sum(a1.a) AS h
              FROM a1 JOIN e ON a1.node = e.dst GROUP BY 1),
      h1n AS (SELECT sqrt(sum(h * h)) AS nh FROM h1r),
      h1 AS (SELECT nodes.node, coalesce(h, 0) / nh AS h
             FROM nodes LEFT JOIN h1r USING (node), h1n),
      a2r AS (SELECT e.dst AS node, sum(h1.h) AS a
              FROM h1 JOIN e ON h1.node = e.src GROUP BY 1),
      a2n AS (SELECT sqrt(sum(a * a)) AS na FROM a2r),
      a2 AS (SELECT nodes.node, coalesce(a, 0) / na AS a
             FROM nodes LEFT JOIN a2r USING (node), a2n),
      h2r AS (SELECT e.src AS node, sum(a2.a) AS h
              FROM a2 JOIN e ON a2.node = e.dst GROUP BY 1),
      h2n AS (SELECT sqrt(sum(h * h)) AS nh FROM h2r),
      h2 AS (SELECT nodes.node, coalesce(h, 0) / nh AS h
             FROM nodes LEFT JOIN h2r USING (node), h2n)
      SELECT h2.node AS node, round(h2.h, 6) AS hub,
             round(a2.a, 6) AS authority
      FROM h2 JOIN a2 ON h2.node = a2.node
      WHERE substring(h2.node, 1, 1) = 's' OR h2.node IN
        ('c1','c2','c3','c4','c5','c6','c7','c8','c9','c10','c11','c12',
         'c13','c14','c15','c16','c17','c18','c19','c20','c21','c22',
         'c23','c24','c25','c26','c27','c28','c29','c30','c31','c32',
         'c33','c34','c35','c36','c37','c38','c39','c40')
      ORDER BY node"""))

  /** Fisher's exact test on suppliers: nation block × account balance
    * — a genuinely small 2×2 where the exact test matters. */
  private val q257 = Entry(
    "q257_fisher_exact",
    (s, d) => {
      graft.ops.Evaluation.fisherExact(
          Tables.supplier(s, d),
          col("s_nationkey") < 5, col("s_acctbal") > 5000)
        .select(col("a"), col("b"), col("c"), col("d"),
          r6(col("odds_ratio")).as("odds_ratio"), col("support"),
          r6(col("p_two_sided")).as("p_two_sided"))
    },
    Some("""
      WITH cells AS (
        SELECT sum(CASE WHEN s_nationkey < 5 AND s_acctbal > 5000
                   THEN 1.0 ELSE 0 END) AS a,
               sum(CASE WHEN s_nationkey < 5 AND NOT s_acctbal > 5000
                   THEN 1.0 ELSE 0 END) AS b,
               sum(CASE WHEN s_nationkey >= 5 AND s_acctbal > 5000
                   THEN 1.0 ELSE 0 END) AS c,
               sum(CASE WHEN s_nationkey >= 5 AND NOT s_acctbal > 5000
                   THEN 1.0 ELSE 0 END) AS d
        FROM supplier),
      m AS (SELECT *, a + b AS r1, c + d AS r2, a + c AS c1, b + d AS c2,
                   a + b + c + d AS n,
                   greatest(0, a + b - (b + d)) AS kmin,
                   least(a + b, a + c) AS kmax
            FROM cells),
      ks AS (SELECT m.*, g.k::DOUBLE AS k
             FROM m, (SELECT unnest(generate_series(0, 100000)) AS k) g
             WHERE g.k BETWEEN kmin AND kmax),
      lp AS (SELECT k, a, b, c, d, r1, c1,
                    lgamma(r1 + 1) - lgamma(k + 1) - lgamma(r1 - k + 1)
                    + lgamma(r2 + 1) - lgamma(c1 - k + 1)
                    - lgamma(r2 - c1 + k + 1)
                    + lgamma(c1 + 1) + lgamma(c2 + 1) - lgamma(n + 1)
                      AS l
             FROM ks),
      ob AS (SELECT l AS lobs FROM lp WHERE k = a)
      SELECT max(a)::BIGINT AS a, max(b)::BIGINT AS b,
             max(c)::BIGINT AS c, max(d)::BIGINT AS d,
             round(max(a) * max(d) / (max(b) * max(c)), 6) AS odds_ratio,
             count(*) AS support,
             round(sum(CASE WHEN exp(l) <= exp(lobs) * (1 + 1e-7)
                       THEN exp(l) ELSE 0 END) / sum(exp(l)), 6)
               AS p_two_sided
      FROM lp, ob"""))

  /** Nelson–Aalen cumulative hazard of time-to-first-big-purchase —
    * the hazard-scale companion to the q138/q150 survival frame. */
  private val q258 = Entry(
    "q258_nelson_aalen",
    (s, d) => {
      val ev = Tables.events(s, d)
      val hit = when(col("event_type") === "purchase" &&
        col("value") > 200, col("ts"))
      val surv = ev.groupBy("user_id")
        .agg(min(hit).as("__hit"), min(col("ts")).as("__first"),
          max(col("ts")).as("__last"))
        .select(
          when(col("__hit").isNotNull,
            datediff(to_date(col("__hit")), to_date(col("__first"))))
            .otherwise(
              datediff(to_date(col("__last")), to_date(col("__first"))))
            .as("dur"),
          when(col("__hit").isNotNull, lit(1)).otherwise(lit(0)).as("ev"))
      AnalysisPlanner.nelsonAalen(surv, "dur", "ev")
        .select(col("duration").cast("long").as("duration"),
          col("n_risk"), col("n_event"),
          r6(col("cum_hazard")).as("cum_hazard"),
          r6(sqrt(col("var_hazard"))).as("se_hazard"))
        .orderBy("duration")
    },
    Some("""
      WITH s AS (
        SELECT
          CASE WHEN min(ts) FILTER (event_type = 'purchase' AND "value" > 200) IS NOT NULL
               THEN datediff('day', min(ts)::DATE,
                 (min(ts) FILTER (event_type = 'purchase' AND "value" > 200))::DATE)
               ELSE datediff('day', min(ts)::DATE, max(ts)::DATE) END AS dur,
          CASE WHEN min(ts) FILTER (event_type = 'purchase' AND "value" > 200) IS NOT NULL
               THEN 1.0 ELSE 0.0 END AS ev
        FROM events GROUP BY user_id),
      g AS (SELECT dur, sum(ev) AS d, count(*)::DOUBLE AS tot
            FROM s GROUP BY 1),
      t AS (SELECT count(*)::DOUBLE AS nn FROM s),
      w AS (SELECT dur, d,
              coalesce(sum(tot) OVER (ORDER BY dur ROWS BETWEEN
                UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
            FROM g),
      e AS (SELECT dur, d, nn - bef AS n_risk FROM w, t WHERE d > 0),
      c AS (SELECT dur, n_risk, d,
              sum(d / n_risk) OVER (ORDER BY dur) AS ch,
              sum(d / (n_risk * n_risk)) OVER (ORDER BY dur) AS vh
            FROM e)
      SELECT dur AS duration, n_risk::BIGINT AS n_risk,
             d::BIGINT AS n_event, round(ch, 6) AS cum_hazard,
             round(sqrt(vh), 6) AS se_hazard
      FROM c ORDER BY duration"""))

  /** Flesch / Flesch–Kincaid readability of the document corpus
    * (vowel-group syllable proxy). */
  private val q259 = Entry(
    "q259_readability",
    (s, d) => {
      graft.ops.TextAnalysis.readability(
          Tables.documents(s, d).where(col("doc_id") < 30), "text")
        .select(col("doc_id"), col("n_words"), col("n_sentences"),
          col("n_syllables"), r6(col("flesch")).as("flesch"),
          r6(col("fk_grade")).as("fk_grade"))
        .orderBy("doc_id")
    },
    Some("""
      WITH m AS (
        SELECT doc_id,
          greatest(1.0, len(regexp_split_to_array(trim(text), '\s+')))
            AS w,
          greatest(1.0, len(regexp_extract_all(text, '[.!?]'))) AS sn,
          greatest(greatest(1.0,
              len(regexp_split_to_array(trim(text), '\s+'))),
            len(regexp_extract_all(lower(text), '[aeiouy]+'))) AS sy
        FROM documents WHERE doc_id < 30)
      SELECT doc_id, w::BIGINT AS n_words, sn::BIGINT AS n_sentences,
             sy::BIGINT AS n_syllables,
             round(206.835 - 1.015 * (w / sn) - 84.6 * (sy / w), 6)
               AS flesch,
             round(0.39 * (w / sn) + 11.8 * (sy / w) - 15.59, 6)
               AS fk_grade
      FROM m ORDER BY doc_id"""))

  /** Item–item cosine neighborhoods over order baskets (suppliers as
    * items): top-5 "also bought" per supplier. */
  private val q260 = Entry(
    "q260_item_cf",
    (s, d) => {
      graft.ops.Associations.itemSimilarity(
          Tables.lineitem(s, d), "l_orderkey", "l_suppkey",
          minPairCount = 3, topK = 5)
        .select(col("item"), col("rank"), col("neighbor"),
          col("n_pair"), r6(col("cosine")).as("cosine"))
        .orderBy("item", "rank")
    },
    Some("""
      WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_suppkey AS it
                 FROM lineitem),
      ic AS (SELECT it, count(*)::DOUBLE AS ni FROM b GROUP BY 1),
      p AS (SELECT l.it AS a, r.it AS b2, count(*) AS np
            FROM b l JOIN b r ON l.bk = r.bk AND l.it < r.it
            GROUP BY 1, 2 HAVING count(*) >= 3),
      sym AS (SELECT a, b2, np FROM p
              UNION ALL SELECT b2, a, np FROM p),
      sc AS (SELECT sym.a AS item, sym.b2 AS neighbor, np AS n_pair,
                    np / sqrt(ia.ni * ib.ni) AS cosine
             FROM sym JOIN ic ia ON sym.a = ia.it
                      JOIN ic ib ON sym.b2 = ib.it),
      r AS (SELECT *, row_number() OVER (PARTITION BY item
                        ORDER BY cosine DESC, neighbor ASC) AS rank
            FROM sc)
      SELECT item, rank, neighbor, n_pair, round(cosine, 6) AS cosine
      FROM r WHERE rank <= 5 ORDER BY item, rank"""))

  /** Isotonic calibration (binned PAVA via the minimax form) of a
    * hash-derived score against an independent binary label — bin
    * means hover around 1/3, so pooling is exercised heavily. */
  private val q261 = Entry(
    "q261_isotonic",
    (s, d) => {
      val df = Tables.orders(s, d).select(
        (pmod(col("o_custkey"), lit(1000)) / 1000.0).as("score"),
        when(col("o_orderkey") % 3 === 0, 1.0).otherwise(0.0)
          .as("label"))
      graft.ops.Evaluation.isotonicCalibration(df, "score", "label", 10)
        .select(col("bin"), r6(col("bin_lo")).as("bin_lo"), col("n"),
          r6(col("raw_mean")).as("raw_mean"),
          r6(col("fitted")).as("fitted"))
        .orderBy("bin")
    },
    Some("""
      WITH base AS (SELECT (o_custkey % 1000) / 1000.0 AS s,
                           CASE WHEN o_orderkey % 3 = 0
                                THEN 1.0 ELSE 0.0 END AS y
                    FROM orders),
      bd AS (SELECT min(s) AS lo, max(s) AS hi FROM base),
      binned AS (SELECT CASE WHEN hi <= lo THEN 0
                         ELSE least(9, greatest(0,
                           floor((s - lo) / ((hi - lo) / 10))::INT)) END
                           AS b, y
                 FROM base, bd),
      cells AS (SELECT b, count(*)::DOUBLE AS n, sum(y) AS sy
                FROM binned GROUP BY 1),
      incl AS (SELECT x.b AS bb, sum(p.n) AS inn, sum(p.sy) AS iss
               FROM cells x JOIN cells p ON p.b <= x.b GROUP BY 1),
      lefts AS (SELECT c.b AS bi, inn - c.n AS en, iss - c.sy AS es
                FROM cells c JOIN incl ON incl.bb = c.b),
      seg AS (SELECT bi, k.bb AS bk, (k.iss - es) / (k.inn - en) AS m
              FROM lefts JOIN incl k ON k.bb >= bi),
      im AS (SELECT j.b AS bj, sg.bi, min(sg.m) AS mn
             FROM cells j JOIN seg sg
               ON sg.bi <= j.b AND sg.bk >= j.b
             GROUP BY 1, 2),
      fit AS (SELECT bj, max(mn) AS fitted FROM im GROUP BY 1)
      SELECT c.b AS bin, round(lo + c.b * ((hi - lo) / 10), 6) AS bin_lo,
             n::BIGINT AS n, round(sy / n, 6) AS raw_mean,
             round(fitted, 6) AS fitted
      FROM cells c JOIN fit ON fit.bj = c.b, bd ORDER BY bin"""))

  /** Hash-randomization permutation test: return-flag effect on
    * quantity over a 20-supplier slice, 100 md5-derived replicates
    * (every replicate replayable in the oracle). */
  private val q262 = Entry(
    "q262_permutation",
    (s, d) => {
      val li = Tables.lineitem(s, d).where(col("l_suppkey") <= 20)
      graft.ops.Evaluation.permutationTest(li,
          concat_ws("-", col("l_orderkey"), col("l_linenumber")),
          col("l_returnflag") === "R", col("l_quantity"), reps = 100)
        .select(r6(col("obs_diff")).as("obs_diff"), col("reps"),
          col("n_ge"), r6(col("p_value")).as("p_value"))
    },
    Some("""
      WITH d AS (SELECT l_orderkey || '-' || l_linenumber AS id,
                        l_quantity::DOUBLE AS v,
                        CASE WHEN l_returnflag = 'R'
                             THEN 1.0 ELSE 0.0 END AS t
                 FROM lineitem WHERE l_suppkey <= 20),
      obs AS (SELECT sum(t * v) / sum(t)
                     - sum((1 - t) * v) / sum(1 - t) AS od FROM d),
      reps AS (SELECT unnest(generate_series(0, 99)) AS rep),
      h AS (SELECT rep, v,
              (('0x' || substring(md5('perm|' || id || '|' || rep), 1, 15))::BIGINT
                % 1048576) AS bkt
            FROM d, reps),
      rs AS (SELECT rep,
               sum(CASE WHEN bkt < 524288 THEN v ELSE 0 END) /
                 sum(CASE WHEN bkt < 524288 THEN 1.0 ELSE 0 END)
               - sum(CASE WHEN bkt >= 524288 THEN v ELSE 0 END) /
                 sum(CASE WHEN bkt >= 524288 THEN 1.0 ELSE 0 END) AS df
             FROM h GROUP BY 1)
      SELECT round(od, 6) AS obs_diff, count(*) AS reps,
             sum(CASE WHEN abs(df) >= abs(od)
                 THEN 1 ELSE 0 END)::BIGINT AS n_ge,
             round((sum(CASE WHEN abs(df) >= abs(od)
                        THEN 1 ELSE 0 END) + 1.0) / (count(*) + 1.0), 6)
               AS p_value
      FROM rs, obs GROUP BY od"""))

  /** Two-sample Anderson–Darling on quantity, even- vs odd-part
    * lineitems — the tail-weighted companion to the q10 KS test. */
  private val q263 = Entry(
    "q263_anderson_darling",
    (s, d) => {
      AnalysisPlanner.andersonDarling(Tables.lineitem(s, d),
          "l_quantity", col("l_partkey") % 2 === 0)
        .select(col("n_a"), col("n_b"), r6(col("a2")).as("a2"))
    },
    Some("""
      WITH b AS (SELECT l_quantity::DOUBLE AS v,
                        CASE WHEN l_partkey % 2 = 0
                             THEN 1.0 ELSE 0.0 END AS a
                 FROM lineitem),
      g AS (SELECT v, sum(a) AS ca, count(*)::DOUBLE AS cnt
            FROM b GROUP BY 1),
      w AS (SELECT v, ca, cnt, sum(ca) OVER (ORDER BY v) AS m,
                   sum(cnt) OVER (ORDER BY v) AS bb
            FROM g),
      t AS (SELECT sum(a) AS n1, sum(1 - a) AS n2,
                   count(*)::DOUBLE AS nn
            FROM b)
      SELECT n1::BIGINT AS n_a, n2::BIGINT AS n_b,
             round(sum(cnt * pow(m * nn - bb * n1, 2) /
               (bb * (nn - bb))) / (n1 * n2), 6) AS a2
      FROM w, t WHERE bb < nn GROUP BY n1, n2"""))

  /** Fleiss' kappa: do a user's events agree on type? item = user,
    * category = event_type, one rating per event. */
  private val q264 = Entry(
    "q264_fleiss_kappa",
    (s, d) => {
      graft.ops.Evaluation.fleissKappa(Tables.events(s, d),
          "user_id", "event_type")
        .select(col("n_items"), col("n_ratings"),
          r6(col("p_observed")).as("p_observed"),
          r6(col("p_expected")).as("p_expected"),
          r6(col("kappa")).as("kappa"))
    },
    Some("""
      WITH ic AS (SELECT user_id AS i, event_type AS c,
                         count(*)::DOUBLE AS k
                  FROM events GROUP BY 1, 2),
      ni AS (SELECT i, sum(k) AS ni, sum(k * k) AS s2
             FROM ic GROUP BY 1),
      kept AS (SELECT * FROM ni WHERE ni >= 2),
      pb AS (SELECT avg((s2 - ni) / (ni * (ni - 1))) AS pbar,
                    count(*) AS nitems, sum(ni) AS ntot
             FROM kept),
      pe AS (SELECT sum(nc * nc) / (any_value(ntot) * any_value(ntot))
               AS pe
             FROM (SELECT sum(k) AS nc
                   FROM ic JOIN kept USING (i) GROUP BY ic.c), pb)
      SELECT nitems AS n_items, ntot::BIGINT AS n_ratings,
             round(pbar, 6) AS p_observed, round(pe, 6) AS p_expected,
             round((pbar - pe) / (1 - pe), 6) AS kappa
      FROM pb, pe"""))

  /** Chao1 vocabulary-richness estimate of the document corpus —
    * how big is the population vocabulary, and how much of it has
    * the sample covered? */
  private val q265 = Entry(
    "q265_chao1",
    (s, d) => {
      val toks = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("term"))
      graft.ops.Profiling.chao1Richness(toks, "term")
        .select(col("observed"), col("n_tokens"), col("f1"), col("f2"),
          r6(col("chao1")).as("chao1"),
          r6(col("coverage")).as("coverage"))
    },
    Some("""
      WITH toks AS (SELECT unnest(string_split(text, ' ')) AS term
                    FROM documents),
      c AS (SELECT term, count(*) AS c FROM toks GROUP BY 1),
      a AS (SELECT count(*) AS observed, sum(c)::DOUBLE AS n,
                   sum(CASE WHEN c = 1 THEN 1.0 ELSE 0 END) AS f1,
                   sum(CASE WHEN c = 2 THEN 1.0 ELSE 0 END) AS f2
            FROM c)
      SELECT observed, n::BIGINT AS n_tokens, f1::BIGINT AS f1,
             f2::BIGINT AS f2,
             round(observed + f1 * (f1 - 1) / (2.0 * (f2 + 1)), 6)
               AS chao1,
             round(1.0 - f1 / n, 6) AS coverage
      FROM a"""))

  /** Pairwise Welch contrasts between order priorities on total
    * price — the post-hoc sweep after the q44-style omnibus. */
  private val q266 = Entry(
    "q266_pairwise_contrasts",
    (s, d) => {
      graft.ops.Evaluation.pairwiseContrasts(Tables.orders(s, d),
          "o_orderpriority", "o_totalprice")
        .select(col("group_a"), col("group_b"), col("n_a"), col("n_b"),
          r2(col("mean_diff")).as("mean_diff"), r6(col("z")).as("z"))
        .orderBy("group_a", "group_b")
    },
    Some("""
      WITH cells AS (SELECT o_orderpriority AS g,
                            count(*)::DOUBLE AS n,
                            avg(o_totalprice) AS m,
                            var_samp(o_totalprice) AS s2
                     FROM orders GROUP BY 1)
      SELECT l.g AS group_a, r.g AS group_b, l.n::BIGINT AS n_a,
             r.n::BIGINT AS n_b, round(l.m - r.m, 2) AS mean_diff,
             round((l.m - r.m) / sqrt(l.s2 / l.n + r.s2 / r.n), 6) AS z
      FROM cells l JOIN cells r ON l.g < r.g
      ORDER BY group_a, group_b"""))

  /** Bayesian A/B: probability the nation-block-B high-balance rate
    * beats block A's, exact Beta-posterior closed form. */
  private val q267 = Entry(
    "q267_bayesian_ab",
    (s, d) => {
      graft.ops.Evaluation.bayesianAbTest(Tables.customer(s, d),
          col("c_nationkey") < 12, col("c_acctbal") > 9000)
        .select(col("n_a"), col("s_a"), col("n_b"), col("s_b"),
          r6(col("rate_a")).as("rate_a"), r6(col("rate_b")).as("rate_b"),
          r6(col("prob_b_gt_a")).as("prob_b_gt_a"))
    },
    Some("""
      WITH c AS (
        SELECT sum(CASE WHEN c_nationkey < 12 AND c_acctbal > 9000
                   THEN 1.0 ELSE 0 END) AS sa,
               sum(CASE WHEN c_nationkey < 12 THEN 1.0 ELSE 0 END) AS na,
               sum(CASE WHEN c_nationkey >= 12 AND c_acctbal > 9000
                   THEN 1.0 ELSE 0 END) AS sb,
               sum(CASE WHEN c_nationkey >= 12 THEN 1.0 ELSE 0 END) AS nb
        FROM customer),
      m AS (SELECT sa, na, sb, nb, sa + 1 AS aa, na - sa + 1 AS ba,
                   sb + 1 AS ab2, nb - sb + 1 AS bb
            FROM c),
      k AS (SELECT m.*, g.i::DOUBLE AS i
            FROM m, (SELECT unnest(generate_series(0, 200000)) AS i) g
            WHERE g.i <= ab2 - 1),
      t AS (SELECT sa, na, sb, nb,
              exp(lgamma(aa + i) + lgamma(ba + bb)
                - lgamma(aa + i + ba + bb) - ln(bb + i)
                - (lgamma(1 + i) + lgamma(bb) - lgamma(1 + i + bb))
                - (lgamma(aa) + lgamma(ba) - lgamma(aa + ba))) AS term
            FROM k)
      SELECT max(na)::BIGINT AS n_a, max(sa)::BIGINT AS s_a,
             max(nb)::BIGINT AS n_b, max(sb)::BIGINT AS s_b,
             round(max(sa) / max(na), 6) AS rate_a,
             round(max(sb) / max(nb), 6) AS rate_b,
             round(sum(term), 6) AS prob_b_gt_a
      FROM t"""))

  /** Empirical-Bayes shrinkage of per-customer urgent-order rates —
    * the beta-binomial CTR-smoothing pattern, prior strength fit by
    * moments over ALL customers, first 300 keys emitted. */
  private val q268 = Entry(
    "q268_eb_shrinkage",
    (s, d) => {
      graft.ops.Features.empiricalBayesRate(Tables.orders(s, d),
          "o_custkey", col("o_orderpriority") === "1-URGENT")
        .where(col("key") < 300)
        .select(col("key"), col("n"), col("successes"),
          r6(col("raw_rate")).as("raw_rate"),
          r6(col("prior_rate")).as("prior_rate"),
          r6(col("shrunk_rate")).as("shrunk_rate"))
        .orderBy("key")
    },
    Some("""
      WITH per AS (SELECT o_custkey AS key, count(*)::DOUBLE AS n,
                          sum(CASE WHEN o_orderpriority = '1-URGENT'
                              THEN 1.0 ELSE 0 END) AS s
                   FROM orders GROUP BY 1),
      mom AS (SELECT avg(s / n) AS m, var_samp(s / n) AS v FROM per),
      k AS (SELECT greatest(0,
              CASE WHEN v > 0 AND m > 0 AND m < 1
                   THEN m * (1 - m) / v - 1 ELSE 0 END) AS k0, m
            FROM mom)
      SELECT key, n::BIGINT AS n, s::BIGINT AS successes,
             round(s / n, 6) AS raw_rate, round(m, 6) AS prior_rate,
             round((s + k0 * m) / (n + k0), 6) AS shrunk_rate
      FROM per, k WHERE key < 300 ORDER BY key"""))

  /** G-test of independence between order status and priority — the
    * LLR companion to the q43 Pearson χ². */
  private val q269 = Entry(
    "q269_g_test",
    (s, d) => {
      graft.ops.Evaluation.gTest(Tables.orders(s, d),
          "o_orderstatus", "o_orderpriority")
        .select(col("n"), col("dof"), r6(col("g")).as("g"))
    },
    Some("""
      WITH cells AS (SELECT o_orderstatus AS r, o_orderpriority AS c,
                            count(*)::DOUBLE AS o
                     FROM orders GROUP BY 1, 2),
      rt AS (SELECT r, sum(o) AS rt FROM cells GROUP BY 1),
      ct AS (SELECT c, sum(o) AS ct FROM cells GROUP BY 1),
      t AS (SELECT sum(o) AS nn, count(DISTINCT r) AS nr,
                   count(DISTINCT c) AS nc
            FROM cells)
      SELECT max(nn)::BIGINT AS n,
             max((nr - 1) * (nc - 1)) AS dof,
             round(2.0 * sum(o * ln(o * nn / (rt.rt * ct.ct))), 6) AS g
      FROM cells JOIN rt USING (r) JOIN ct USING (c), t"""))

  /** Cosine similarity between per-label embedding centroids — how
    * close are the corpus slices in embedding space? */
  private val q270 = Entry(
    "q270_centroid_sim",
    (s, d) => {
      graft.ops.Similarity.centroidSimilarity(
          Tables.embeddings(s, d), "label", "embedding")
        .select(col("seg_a"), col("seg_b"), r6(col("cosine")).as("cosine"))
        .orderBy("seg_a", "seg_b")
    },
    Some("""
      WITH e AS (SELECT label AS seg, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      c AS (SELECT seg, i, avg(v[i]) AS m
            FROM e, range(1, 65) t(i) GROUP BY 1, 2),
      j AS (SELECT a.seg AS seg_a, b.seg AS seg_b,
                   sum(a.m * b.m) AS dot, sum(a.m * a.m) AS sa2,
                   sum(b.m * b.m) AS sb2
            FROM c a JOIN c b ON a.i = b.i AND a.seg < b.seg
            GROUP BY 1, 2)
      SELECT seg_a, seg_b,
             round(dot / (sqrt(sa2) * sqrt(sb2)), 6) AS cosine
      FROM j ORDER BY seg_a, seg_b"""))

  /** Subgroup LLR scan: which event-type / month / user-bucket slice
    * has an anomalously elevated high-value rate? */
  private val q271 = Entry(
    "q271_subgroup_scan",
    (s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("etype", col("event_type"))
        .withColumn("emonth", month(col("ts")).cast("string"))
        .withColumn("ubucket", (col("user_id") % 7).cast("string"))
      graft.ops.Profiling.subgroupScan(ev, col("value") > 150,
          Seq("etype", "emonth", "ubucket"), topK = 15)
        .select(col("segment"), col("value"), col("n"), col("k"),
          r6(col("rate")).as("rate"), r6(col("base_rate")).as("base_rate"),
          r6(col("llr")).as("llr"))
    },
    Some("""
      WITH ev AS (SELECT CASE WHEN "value" > 150 THEN 1.0 ELSE 0.0 END
                    AS y, event_type AS etype,
                    month(ts)::VARCHAR AS emonth,
                    (user_id % 7)::VARCHAR AS ubucket
                  FROM events),
      melted AS (
        SELECT 'etype' AS segment, etype AS value, y FROM ev
        UNION ALL
        SELECT 'emonth', emonth, y FROM ev
        UNION ALL
        SELECT 'ubucket', ubucket, y FROM ev),
      g AS (SELECT sum(y) AS gs, count(*)::DOUBLE AS gn FROM ev),
      cells AS (SELECT segment, value, count(*)::DOUBLE AS n,
                       sum(y) AS k
                FROM melted GROUP BY 1, 2),
      sc AS (SELECT segment, value, n, k, k / n AS q, gs / gn AS q0,
               CASE WHEN k / n > gs / gn THEN
                 k * ln((k / n) / (gs / gn)) +
                 CASE WHEN k / n < 1 THEN (n - k) *
                   ln((1 - k / n) / (1 - gs / gn)) ELSE 0.0 END
               ELSE 0.0 END AS llr
             FROM cells, g)
      SELECT segment, value, n::BIGINT AS n, k::BIGINT AS k,
             round(q, 6) AS rate, round(q0, 6) AS base_rate,
             round(llr, 6) AS llr
      FROM sc ORDER BY llr DESC, segment, value LIMIT 15"""))

  /** Ljung–Box white-noise test on daily event revenue through lag 7 —
    * the residual-diagnostics companion to the q147 correlogram
    * (statistic-only contract; Q ~ χ²(7) under H0). */
  private val q272 = Entry(
    "q272_ljung_box",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(datediff(to_date(col("ts")),
          lit(java.sql.Date.valueOf("1970-01-01"))).as("day"))
        .agg(sum("value").as("rev"))
      graft.ops.Evaluation.ljungBox(daily, "day", "rev", 7)
        .select(col("n"), col("max_lag"), r6(col("q_stat")).as("q_stat"))
    },
    Some("""
      WITH daily AS (SELECT datediff('day', DATE '1970-01-01', ts::DATE)
                       AS day, sum("value") AS rev
                     FROM events GROUP BY 1),
      st AS (SELECT count(*)::DOUBLE AS n, sum(rev) AS sx,
                    sum(rev * rev) AS sxx FROM daily),
      m AS (SELECT n, sx / n AS mu, sxx - sx * sx / n AS den FROM st),
      l AS (SELECT * FROM (VALUES (1),(2),(3),(4),(5),(6),(7)) t(lag)),
      p AS (SELECT l.lag, a.rev AS x1, b.rev AS x2
            FROM l JOIN daily a ON true
                   JOIN daily b ON b.day = a.day + l.lag),
      r AS (SELECT lag, sum((x1 - mu) * (x2 - mu)) / max(den) AS acf,
                   max(n) AS n
            FROM p, m GROUP BY lag)
      SELECT max(n)::BIGINT AS n, count(*) AS max_lag,
             round(max(n) * (max(n) + 2) *
               sum(acf * acf / (n - lag)), 6) AS q_stat
      FROM r"""))

  /** Durbin–Watson on the residuals of each event type's daily revenue
    * trend — first-order serial correlation left after the q246
    * closed-form per-key OLS detrend. */
  private val q273 = Entry(
    "q273_durbin_watson",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum("value").as("y"))
        .withColumn("x",
          datediff(col("day"), lit("2024-01-01").cast("date"))
            .cast("double"))
      val fit = graft.ops.Regression
        .groupedOls(daily, Seq("event_type"), "x", "y")
        .select(col("event_type"), col("slope"), col("intercept"))
      val resid = daily.join(broadcast(fit), Seq("event_type"))
        .withColumn("resid",
          col("y") - (col("intercept") + col("slope") * col("x")))
      graft.ops.TimeSeries
        .durbinWatson(resid, Seq("event_type"), "x", "resid")
        .select(col("event_type"), col("n"), r6(col("dw")).as("dw"))
        .orderBy("event_type")
    },
    Some("""
      WITH d AS (SELECT event_type AS g,
                        date_diff('day', DATE '2024-01-01',
                          ts::DATE)::DOUBLE AS x,
                        sum("value") AS y
                 FROM events GROUP BY event_type, ts::DATE),
      a AS (SELECT g, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                   sum(x * x) AS sxx, sum(x * y) AS sxy
            FROM d GROUP BY 1),
      f AS (SELECT g, (sxy - sx * sy / n) / (sxx - sx * sx / n) AS sl,
                   (sy - (sxy - sx * sy / n) / (sxx - sx * sx / n) * sx)
                     / n AS ic
            FROM a),
      e AS (SELECT d.g, d.x, d.y - (f.ic + f.sl * d.x) AS resid
            FROM d JOIN f USING (g)),
      w AS (SELECT g, resid,
                   lag(resid) OVER (PARTITION BY g ORDER BY x) AS pr
            FROM e)
      SELECT g AS event_type, count(*) AS n,
             round(sum((resid - pr) * (resid - pr))
               / sum(resid * resid), 6) AS dw
      FROM w GROUP BY 1 ORDER BY 1"""))

  /** Periodogram of daily event revenue at Fourier frequencies 1–10:
    * where does the series' variance live in frequency space? Power
    * emitted as the scale-free share of total variance. */
  private val q274 = Entry(
    "q274_periodogram",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(datediff(to_date(col("ts")),
          lit("2024-01-01").cast("date")).as("t"))
        .agg(sum("value").as("rev"))
      graft.ops.TimeSeries.periodogram(daily, "t", "rev", 10)
        .select(col("freq"), r6(col("period")).as("period"),
          r6(col("power_frac")).as("power_frac"))
        .orderBy("freq")
    },
    Some("""
      WITH daily AS (SELECT date_diff('day', DATE '2024-01-01',
                       ts::DATE)::DOUBLE AS t, sum("value") AS x
                     FROM events GROUP BY 1),
      st AS (SELECT count(*)::DOUBLE AS n, sum(x) / count(*) AS mu,
                    sum(x * x) - sum(x) * sum(x) / count(*) AS den
             FROM daily),
      k AS (SELECT unnest(generate_series(1, 10))::DOUBLE AS k),
      t AS (SELECT k.k, st.n, st.den,
                   sum((x - mu) * cos(2 * pi() * k.k * t / st.n)) AS c,
                   sum((x - mu) * sin(2 * pi() * k.k * t / st.n)) AS s
            FROM daily, st, k GROUP BY 1, 2, 3)
      SELECT k::BIGINT AS freq, round(n / k, 6) AS period,
             round((c * c + s * s) / den, 6) AS power_frac
      FROM t ORDER BY 1"""))

  /** Distributed logistic regression: P(urgent order | scaled price)
    * by 4 fixed Newton steps, each ONE sufficient-stats scan — the
    * oracle replays every iteration's 2×2 solve in SQL. */
  private val q275 = Entry(
    "q275_logistic_regression",
    (s, d) => {
      val df = Tables.orders(s, d)
        .withColumn("x", col("o_totalprice") / 100000.0)
      graft.ops.Regression
        .logisticRegression(df, Seq("x"),
          col("o_orderpriority") === "1-URGENT", iterations = 4)
        .select(col("term"), r6(col("coef")).as("coef"), col("n"),
          r6(col("log_loss")).as("log_loss"), col("iterations"))
        .orderBy("term")
    },
    Some("""
      WITH d AS (SELECT CASE WHEN o_orderpriority = '1-URGENT'
                   THEN 1.0 ELSE 0.0 END AS y,
                   o_totalprice / 100000.0 AS x
                 FROM orders),
      i0 AS (SELECT 0.0 AS b0, 0.0 AS b1),
      s1 AS (SELECT sum(w) AS h00, sum(w * x) AS h01,
                    sum(w * x * x) AS h11, sum(y - mu) AS g0,
                    sum(x * (y - mu)) AS g1
             FROM (SELECT x, y, mu, mu * (1 - mu) AS w
                   FROM (SELECT x, y,
                           1 / (1 + exp(-(b0 + b1 * x))) AS mu
                         FROM d, i0))),
      i1 AS (SELECT b0 + (h11 * g0 - h01 * g1)
                      / (h00 * h11 - h01 * h01) AS b0,
                    b1 + (h00 * g1 - h01 * g0)
                      / (h00 * h11 - h01 * h01) AS b1
             FROM s1, i0),
      s2 AS (SELECT sum(w) AS h00, sum(w * x) AS h01,
                    sum(w * x * x) AS h11, sum(y - mu) AS g0,
                    sum(x * (y - mu)) AS g1
             FROM (SELECT x, y, mu, mu * (1 - mu) AS w
                   FROM (SELECT x, y,
                           1 / (1 + exp(-(b0 + b1 * x))) AS mu
                         FROM d, i1))),
      i2 AS (SELECT b0 + (h11 * g0 - h01 * g1)
                      / (h00 * h11 - h01 * h01) AS b0,
                    b1 + (h00 * g1 - h01 * g0)
                      / (h00 * h11 - h01 * h01) AS b1
             FROM s2, i1),
      s3 AS (SELECT sum(w) AS h00, sum(w * x) AS h01,
                    sum(w * x * x) AS h11, sum(y - mu) AS g0,
                    sum(x * (y - mu)) AS g1
             FROM (SELECT x, y, mu, mu * (1 - mu) AS w
                   FROM (SELECT x, y,
                           1 / (1 + exp(-(b0 + b1 * x))) AS mu
                         FROM d, i2))),
      i3 AS (SELECT b0 + (h11 * g0 - h01 * g1)
                      / (h00 * h11 - h01 * h01) AS b0,
                    b1 + (h00 * g1 - h01 * g0)
                      / (h00 * h11 - h01 * h01) AS b1
             FROM s3, i2),
      s4 AS (SELECT sum(w) AS h00, sum(w * x) AS h01,
                    sum(w * x * x) AS h11, sum(y - mu) AS g0,
                    sum(x * (y - mu)) AS g1
             FROM (SELECT x, y, mu, mu * (1 - mu) AS w
                   FROM (SELECT x, y,
                           1 / (1 + exp(-(b0 + b1 * x))) AS mu
                         FROM d, i3))),
      i4 AS (SELECT b0 + (h11 * g0 - h01 * g1)
                      / (h00 * h11 - h01 * h01) AS b0,
                    b1 + (h00 * g1 - h01 * g0)
                      / (h00 * h11 - h01 * h01) AS b1
             FROM s4, i3),
      ll AS (SELECT avg(ln(1 + exp(-abs(z))) +
                      CASE WHEN z > 0 THEN (1 - y) * z
                           ELSE -y * z END) AS loss,
                    count(*) AS n
             FROM (SELECT y, b0 + b1 * x AS z FROM d, i4))
      SELECT t.term,
             round(CASE WHEN t.term = 'x' THEN i4.b1
                        ELSE i4.b0 END, 6) AS coef,
             ll.n AS n, round(ll.loss, 6) AS log_loss,
             4 AS iterations
      FROM (VALUES ('(intercept)'), ('x')) t(term), i4, ll
      ORDER BY t.term"""))

  /** Leave-one-group-out influence: which event type drags the
    * corpus-level value-on-hour trend, by sufficient-stats
    * subtraction — no per-group refit scan. */
  private val q276 = Entry(
    "q276_logo_influence",
    (s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("hr", hour(col("ts")).cast("double"))
      graft.ops.Regression
        .leaveOneGroupOut(ev, "event_type", "hr", "value")
        .select(col("group"), col("n"),
          r6(col("slope_full")).as("slope_full"),
          r6(col("slope_loo")).as("slope_loo"),
          r6(col("delta_slope")).as("delta_slope"),
          r6(col("delta_intercept")).as("delta_intercept"))
        .orderBy("group")
    },
    Some("""
      WITH d AS (SELECT event_type AS g, hour(ts)::DOUBLE AS x,
                        "value" AS y
                 FROM events),
      per AS (SELECT g, count(*)::DOUBLE AS n, sum(x) AS sx,
                     sum(y) AS sy, sum(x * x) AS sxx, sum(x * y) AS sxy
              FROM d GROUP BY 1),
      gl AS (SELECT sum(n) AS nn, sum(sx) AS tsx, sum(sy) AS tsy,
                    sum(sxx) AS tsxx, sum(sxy) AS tsxy
             FROM per),
      f AS (SELECT g, n,
              (tsxy - tsx * tsy / nn) / (tsxx - tsx * tsx / nn) AS slf,
              (tsy - (tsxy - tsx * tsy / nn) / (tsxx - tsx * tsx / nn)
                * tsx) / nn AS icf,
              (tsxy - sxy - (tsx - sx) * (tsy - sy) / (nn - n))
                / (tsxx - sxx - (tsx - sx) * (tsx - sx) / (nn - n))
                AS sll,
              ((tsy - sy) -
                (tsxy - sxy - (tsx - sx) * (tsy - sy) / (nn - n))
                / (tsxx - sxx - (tsx - sx) * (tsx - sx) / (nn - n))
                * (tsx - sx)) / (nn - n) AS icl
            FROM per, gl)
      SELECT g AS "group", n::BIGINT AS n,
             round(slf, 6) AS slope_full, round(sll, 6) AS slope_loo,
             round(slf - sll, 6) AS delta_slope,
             round(icf - icl, 6) AS delta_intercept
      FROM f ORDER BY g"""))

  /** Krippendorff's alpha over the same rating frame as the q264
    * Fleiss kappa — the coincidence-matrix agreement coefficient whose
    * native case is varying raters per item. */
  private val q277 = Entry(
    "q277_krippendorff_alpha",
    (s, d) => {
      graft.ops.Evaluation.krippendorffAlpha(Tables.events(s, d),
          "user_id", "event_type")
        .select(col("n_items"), col("n_ratings"),
          r6(col("d_observed")).as("d_observed"),
          r6(col("d_expected")).as("d_expected"),
          r6(col("alpha")).as("alpha"))
    },
    Some("""
      WITH ic AS (SELECT user_id AS i, event_type AS c,
                         count(*)::DOUBLE AS k
                  FROM events GROUP BY 1, 2),
      ni AS (SELECT i, sum(k) AS ni, sum(k * k) AS s2
             FROM ic GROUP BY 1),
      kept AS (SELECT * FROM ni WHERE ni >= 2),
      t AS (SELECT sum((ni * ni - s2) / (ni - 1)) AS don,
                   count(*) AS nitems, sum(ni) AS ntot
            FROM kept),
      nc AS (SELECT sum(k) AS nc
             FROM ic JOIN kept USING (i) GROUP BY ic.c),
      e AS (SELECT (ntot * ntot - (SELECT sum(nc * nc) FROM nc))
                     / (ntot * (ntot - 1)) AS de,
                   don / ntot AS dob, nitems, ntot
            FROM t)
      SELECT nitems AS n_items, ntot::BIGINT AS n_ratings,
             round(dob, 6) AS d_observed, round(de, 6) AS d_expected,
             round(1 - dob / de, 6) AS alpha
      FROM e"""))

  /** Holm–Bonferroni step-down over the q159 hypothesis battery —
    * FWER control beside BH's FDR, same synthetic p-values so the two
    * procedures are directly comparable. */
  private val q278 = Entry(
    "q278_holm_bonferroni",
    (s, d) => {
      val hyp = Tables.orders(s, d).where(col("o_orderkey") <= 500)
        .select(col("o_orderkey").as("hid"),
          when(col("o_orderkey") % 50 === 0,
            (col("o_orderkey") * 7919 % 9973) / lit(9973000.0))
            .otherwise((col("o_orderkey") * 7919 % 9973) / lit(9973.0))
            .as("p"))
      AnalysisPlanner.holmBonferroni(hyp, "p", 0.1)
        .select(col("hid"), r6(col("p")).as("p"), col("p_rank"),
          r6(col("adj_p")).as("adj_p"), col("discovery"))
        .orderBy("hid")
    },
    Some("""
      WITH hyp AS (SELECT o_orderkey AS hid,
                          CASE WHEN o_orderkey % 50 = 0
                               THEN (o_orderkey * 7919 % 9973) / 9973000.0
                               ELSE (o_orderkey * 7919 % 9973) / 9973.0
                          END AS p
                   FROM orders WHERE o_orderkey <= 500),
      v AS (SELECT p, count(*)::DOUBLE AS cnt FROM hyp GROUP BY 1),
      w AS (SELECT p, cnt,
                   coalesce(sum(cnt) OVER (ORDER BY p ROWS BETWEEN
                     UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
            FROM v),
      m AS (SELECT count(*)::DOUBLE AS m FROM hyp),
      b AS (SELECT p, bef, least(1.0, (m - bef) * p) AS blk
            FROM w, m),
      a AS (SELECT p, bef, max(blk) OVER (ORDER BY p ROWS BETWEEN
              UNBOUNDED PRECEDING AND CURRENT ROW) AS adj
            FROM b)
      SELECT hid, round(p, 6) AS p, (bef + 1)::BIGINT AS p_rank,
             round(adj, 6) AS adj_p, adj <= 0.1 AS discovery
      FROM hyp JOIN a USING (p)
      ORDER BY hid"""))

  /** Restricted mean survival time through a 20-day horizon for the
    * q258 time-to-big-purchase cohort — the KM step curve integrated
    * without any window (rank-shift join on the tiny event frame). */
  private val q279 = Entry(
    "q279_rmst",
    (s, d) => {
      val ev = Tables.events(s, d)
      val hit = when(col("event_type") === "purchase" &&
        col("value") > 200, col("ts"))
      val surv = ev.groupBy("user_id")
        .agg(min(hit).as("__hit"), min(col("ts")).as("__first"),
          max(col("ts")).as("__last"))
        .select(
          when(col("__hit").isNotNull,
            datediff(to_date(col("__hit")), to_date(col("__first"))))
            .otherwise(
              datediff(to_date(col("__last")), to_date(col("__first"))))
            .as("dur"),
          when(col("__hit").isNotNull, lit(1)).otherwise(lit(0)).as("ev"))
      AnalysisPlanner.restrictedMeanSurvival(surv, "dur", "ev", 20.0)
        .select(col("tau"), col("n"), col("n_events"),
          r6(col("rmst")).as("rmst"))
    },
    Some("""
      WITH s AS (
        SELECT
          CASE WHEN min(ts) FILTER (event_type = 'purchase' AND "value" > 200) IS NOT NULL
               THEN datediff('day', min(ts)::DATE,
                 (min(ts) FILTER (event_type = 'purchase' AND "value" > 200))::DATE)
               ELSE datediff('day', min(ts)::DATE, max(ts)::DATE) END AS dur,
          CASE WHEN min(ts) FILTER (event_type = 'purchase' AND "value" > 200) IS NOT NULL
               THEN 1.0 ELSE 0.0 END AS ev
        FROM events GROUP BY user_id),
      g AS (SELECT dur, sum(ev) AS d, count(*)::DOUBLE AS tot
            FROM s GROUP BY 1),
      t AS (SELECT count(*)::DOUBLE AS nn FROM s),
      w AS (SELECT dur, d,
              coalesce(sum(tot) OVER (ORDER BY dur ROWS BETWEEN
                UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
            FROM g),
      e AS (SELECT dur, d, nn - bef AS n_risk FROM w, t WHERE d > 0),
      km AS (SELECT dur, exp(sum(ln(1 - d / n_risk)) OVER (
               ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND
               CURRENT ROW)) AS sv
             FROM e),
      nx AS (SELECT dur, sv, lead(dur) OVER (ORDER BY dur) AS nd
             FROM km),
      seg AS (SELECT sv * (least(coalesce(nd, 20.0), 20.0) -
                           least(dur::DOUBLE, 20.0)) AS seg
              FROM nx
              UNION ALL
              SELECT least((SELECT min(dur)::DOUBLE FROM km), 20.0))
      SELECT 20.0 AS tau, (SELECT count(*) FROM s) AS n,
             (SELECT sum(ev) FROM s)::BIGINT AS n_events,
             round(sum(seg), 6) AS rmst
      FROM seg"""))

  /** 5-fold grouped cross-validation of the value-on-hour trend:
    * folds by the portable user-id hash (all of a user's rows share a
    * fold), each fold scored by the model fit WITHOUT it via
    * sufficient-stats subtraction — out-of-fold MSE per fold. */
  private val q280 = Entry(
    "q280_cross_validation",
    (s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("hr", hour(col("ts")).cast("double"))
      graft.ops.Regression
        .crossValidatedOls(ev, Seq(col("user_id")), "hr", "value",
          folds = 5)
        .select(col("fold"), col("n_train"), col("n_test"),
          r6(col("slope")).as("slope"),
          r6(col("intercept")).as("intercept"),
          r6(col("mse_oof")).as("mse_oof"))
        .orderBy("fold")
    },
    Some("""
      WITH d AS (SELECT (('0x' || substring(md5(user_id::VARCHAR),
                    1, 15))::BIGINT % 1048576) % 5 AS fold,
                   hour(ts)::DOUBLE AS x, "value" AS y
                 FROM events),
      per AS (SELECT fold, count(*)::DOUBLE AS n, sum(x) AS sx,
                     sum(y) AS sy, sum(x * x) AS sxx, sum(x * y) AS sxy
              FROM d GROUP BY 1),
      gl AS (SELECT sum(n) AS gn, sum(sx) AS gsx, sum(sy) AS gsy,
                    sum(sxx) AS gsxx, sum(sxy) AS gsxy
             FROM per),
      cf AS (SELECT fold, n, gn - n AS tn,
               ((gsxy - sxy) - (gsx - sx) * (gsy - sy) / (gn - n)) /
                 ((gsxx - sxx) - (gsx - sx) * (gsx - sx) / (gn - n))
                 AS slope,
               ((gsy - sy) -
                 ((gsxy - sxy) - (gsx - sx) * (gsy - sy) / (gn - n)) /
                 ((gsxx - sxx) - (gsx - sx) * (gsx - sx) / (gn - n))
                 * (gsx - sx)) / (gn - n) AS ic
             FROM per, gl)
      SELECT d.fold, max(tn)::BIGINT AS n_train,
             max(cf.n)::BIGINT AS n_test,
             round(max(slope), 6) AS slope,
             round(max(ic), 6) AS intercept,
             round(avg((y - (ic + slope * x)) * (y - (ic + slope * x))),
               6) AS mse_oof
      FROM d JOIN cf USING (fold) GROUP BY 1 ORDER BY fold"""))

  /** Cronbach's alpha across the three lineitem rate columns — the
    * internal-consistency readout (near 0 here: TPC-H draws them
    * independently, which is exactly what the metric should say). */
  private val q281 = Entry(
    "q281_cronbach_alpha",
    (s, d) => {
      graft.ops.Evaluation.cronbachAlpha(Tables.lineitem(s, d),
          Seq("l_quantity", "l_discount", "l_tax"))
        .select(col("k"), col("n"),
          r6(col("item_var_sum")).as("item_var_sum"),
          r6(col("total_var")).as("total_var"),
          r6(col("alpha")).as("alpha"))
    },
    Some("""
      SELECT 3 AS k, count(*) AS n,
             round(var_samp(l_quantity) + var_samp(l_discount)
               + var_samp(l_tax), 6) AS item_var_sum,
             round(var_samp(l_quantity + l_discount + l_tax), 6)
               AS total_var,
             round(1.5 * (1 - (var_samp(l_quantity) + var_samp(l_discount)
               + var_samp(l_tax))
               / var_samp(l_quantity + l_discount + l_tax)), 6) AS alpha
      FROM lineitem"""))

  /** Delta-method CI for revenue-per-event by user-parity arm — the
    * ratio-metric inference whose analysis unit (event) differs from
    * the randomization unit (user). */
  private val q282 = Entry(
    "q282_ratio_metric",
    (s, d) => {
      val units = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(sum("value").as("x"), count(lit(1)).cast("double").as("y"))
        .withColumn("arm",
          when(col("user_id") % 2 === 0, "even").otherwise("odd"))
      graft.ops.Evaluation.ratioMetric(units, "arm", "x", "y")
        .select(col("arm"), col("n"), r6(col("sum_x")).as("sum_x"),
          r6(col("sum_y")).as("sum_y"), r6(col("ratio")).as("ratio"),
          r6(col("se")).as("se"), r6(col("ci_lo")).as("ci_lo"),
          r6(col("ci_hi")).as("ci_hi"))
        .orderBy("arm")
    },
    Some("""
      WITH u AS (SELECT user_id, sum("value") AS x,
                        count(*)::DOUBLE AS y,
                        CASE WHEN user_id % 2 = 0 THEN 'even'
                             ELSE 'odd' END AS arm
                 FROM events GROUP BY 1),
      g AS (SELECT arm, count(*)::DOUBLE AS n, sum(x) AS sx,
                   sum(y) AS sy, var_samp(x) AS vx, var_samp(y) AS vy,
                   covar_samp(x, y) AS cxy
            FROM u GROUP BY 1),
      f AS (SELECT arm, n, sx, sy, sx / sy AS r, sy / n AS my,
                   sqrt((vx - 2 * (sx / sy) * cxy +
                     (sx / sy) * (sx / sy) * vy) / (n * (sy / n) *
                     (sy / n))) AS se
            FROM g)
      SELECT arm, n::BIGINT AS n, round(sx, 6) AS sum_x,
             round(sy, 6) AS sum_y, round(r, 6) AS ratio,
             round(se, 6) AS se,
             round(r - 1.959963984540054 * se, 6) AS ci_lo,
             round(r + 1.959963984540054 * se, 6) AS ci_hi
      FROM f ORDER BY arm"""))

  /** Hosmer–Lemeshow calibration test of a fixed logistic model for
    * P(urgent | price) over price-band bins — a deliberately
    * mis-specified model, so the statistic should be large. */
  private val q283 = Entry(
    "q283_hosmer_lemeshow",
    (s, d) => {
      val o = Tables.orders(s, d)
        .withColumn("x", col("o_totalprice") / 100000.0)
        .withColumn("mu",
          lit(1.0) / (lit(1.0) + exp(-(lit(-1.2) + lit(0.3) * col("x")))))
        .withColumn("bin", least(floor(col("x") * 2), lit(5)))
      graft.ops.Evaluation.hosmerLemeshow(o,
          col("o_orderpriority") === "1-URGENT", col("mu"), col("bin"))
        .select(col("n_bins"), col("n"), r6(col("hl_stat")).as("hl_stat"))
    },
    Some("""
      WITH d AS (SELECT CASE WHEN o_orderpriority = '1-URGENT'
                   THEN 1.0 ELSE 0.0 END AS y,
                   o_totalprice / 100000.0 AS x
                 FROM orders),
      b AS (SELECT least(floor(x * 2), 5) AS bin, y,
                   1 / (1 + exp(-(-1.2 + 0.3 * x))) AS mu
            FROM d),
      c AS (SELECT bin, count(*)::DOUBLE AS ng, sum(y) AS o,
                   sum(mu) AS e
            FROM b GROUP BY 1)
      SELECT count(*) AS n_bins, sum(ng)::BIGINT AS n,
             round(sum((o - e) * (o - e) / (e * (1 - e / ng))), 6)
               AS hl_stat
      FROM c"""))

  /** Classifier two-sample drift test: can a naive-Bayes
    * discriminator tell January's first half from its second on
    * (type, hour, value-band)? Held-out AUC ≈ 0.5 ⇒ no drift — the
    * model-based companion to the q09 PSI family. */
  private val q284 = Entry(
    "q284_c2st_drift",
    (s, d) => {
      val ev = Tables.events(s, d).select(
        col("event_id"),
        (col("ts") >= lit("2024-01-16").cast("timestamp")).as("late"),
        col("event_type").as("f0"),
        hour(col("ts")).cast("string").as("f1"),
        least(floor(col("value") / 50), lit(10)).cast("string").as("f2"))
      graft.ops.Evaluation.classifierTwoSampleTest(ev, col("late"),
          Seq("f0", "f1", "f2"), Seq("event_id"))
        .select(col("n_train"), col("n"), col("n_pos"), col("n_neg"),
          r6(col("auc")).as("auc"))
    },
    Some("""
      WITH ev AS (SELECT event_id,
                    CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 'b'
                         ELSE 'a' END AS lbl,
                    event_type AS f0, hour(ts)::VARCHAR AS f1,
                    CAST(least(floor("value" / 50), 10) AS
                      BIGINT)::VARCHAR AS f2,
                    (('0x' || substring(md5(event_id::VARCHAR), 1, 15))
                      ::BIGINT % 1048576) AS bkt
                  FROM events),
      tr AS (SELECT * FROM ev WHERE bkt < 524288),
      te AS (SELECT * FROM ev WHERE bkt >= 524288),
      lc AS (SELECT lbl AS label, count(*)::DOUBLE AS n_l
             FROM tr GROUP BY 1),
      na AS (SELECT count(*)::DOUBLE AS n_all FROM tr),
      c0 AS (SELECT f0 AS v, lbl AS label, count(*)::DOUBLE AS c
             FROM tr GROUP BY 1, 2),
      c1 AS (SELECT f1 AS v, lbl AS label, count(*)::DOUBLE AS c
             FROM tr GROUP BY 1, 2),
      c2 AS (SELECT f2 AS v, lbl AS label, count(*)::DOUBLE AS c
             FROM tr GROUP BY 1, 2),
      d0 AS (SELECT label, sum(c) AS cf,
                    (SELECT count(DISTINCT f0) FROM tr)::DOUBLE AS vf
             FROM c0 GROUP BY 1),
      d1 AS (SELECT label, sum(c) AS cf,
                    (SELECT count(DISTINCT f1) FROM tr)::DOUBLE AS vf
             FROM c1 GROUP BY 1),
      d2 AS (SELECT label, sum(c) AS cf,
                    (SELECT count(DISTINCT f2) FROM tr)::DOUBLE AS vf
             FROM c2 GROUP BY 1),
      sc AS (SELECT te.event_id, te.lbl AS truelbl, lc.label,
                    round(ln(lc.n_l / na.n_all)
                      + ln((coalesce(c0.c, 0) + 1.0) /
                           (d0.cf + 1.0 * d0.vf))
                      + ln((coalesce(c1.c, 0) + 1.0) /
                           (d1.cf + 1.0 * d1.vf))
                      + ln((coalesce(c2.c, 0) + 1.0) /
                           (d2.cf + 1.0 * d2.vf)), 9) AS score
             FROM te CROSS JOIN na CROSS JOIN lc
             LEFT JOIN c0 ON c0.v = te.f0 AND c0.label = lc.label
             JOIN d0 ON d0.label = lc.label
             LEFT JOIN c1 ON c1.v = te.f1 AND c1.label = lc.label
             JOIN d1 ON d1.label = lc.label
             LEFT JOIN c2 ON c2.v = te.f2 AND c2.label = lc.label
             JOIN d2 ON d2.label = lc.label),
      lo AS (SELECT event_id, truelbl,
                    sum(CASE WHEN label = 'b' THEN score
                        ELSE -score END) AS s
             FROM sc GROUP BY 1, 2),
      v AS (SELECT s, sum(CASE WHEN truelbl = 'b' THEN 1.0 ELSE 0 END)
               AS pos, count(*)::DOUBLE AS tot
            FROM lo GROUP BY 1),
      w AS (SELECT s, pos, tot,
                   coalesce(sum(tot) OVER (ORDER BY s ROWS BETWEEN
                     UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ex
            FROM v),
      a AS (SELECT sum(pos * (ex + (tot + 1) / 2)) AS rpos,
                   sum(pos) AS np, sum(tot) AS n
            FROM w)
      SELECT (SELECT count(*) FROM tr) AS n_train, n::BIGINT AS n,
             np::BIGINT AS n_pos, (n - np)::BIGINT AS n_neg,
             round((rpos - np * (np + 1) / 2) / (np * (n - np)), 6)
               AS auc
      FROM a"""))

  /** Fellegi–Sunter linkage scoring of nation-blocked supplier pairs
    * on three normalized comparison fields — the probabilistic
    * entity-resolution decision rule (match / possible / non_match by
    * summed log₂ m/u agreement weights), top 100 pairs. */
  private val q285 = Entry(
    "q285_fellegi_sunter",
    (s, d) => {
      val sup = Tables.supplier(s, d)
        .withColumn("f1", substring(col("s_name"), -1, 1))
        .withColumn("f2", floor(col("s_acctbal") / 1000))
        .withColumn("f3", col("s_suppkey") % 5)
      graft.ops.Dedup.fellegiSunter(sup, "s_suppkey", "s_nationkey",
          Seq(("f1", 0.9, 0.1), ("f2", 0.85, 0.08), ("f3", 0.95, 0.2)),
          upper = 2.0, lower = 0.0, maxBlock = 0)
        .select(col("id_a"), col("id_b"), col("n_agree"),
          r6(col("weight")).as("weight"), col("decision"))
        .orderBy(desc("weight"), col("id_a"), col("id_b"))
        .limit(100)
    },
    Some("""
      WITH s AS (SELECT s_suppkey AS id, s_nationkey AS bk,
                        right(s_name, 1) AS f1,
                        floor(s_acctbal / 1000) AS f2,
                        s_suppkey % 5 AS f3
                 FROM supplier),
      p AS (SELECT a.id AS id_a, b.id AS id_b,
              (CASE WHEN a.f1 = b.f1 THEN 1 ELSE 0 END +
               CASE WHEN a.f2 = b.f2 THEN 1 ELSE 0 END +
               CASE WHEN a.f3 = b.f3 THEN 1 ELSE 0 END)::BIGINT
                AS n_agree,
              (CASE WHEN a.f1 = b.f1 THEN ln(0.9 / 0.1) / ln(2)
                    ELSE ln(0.1 / 0.9) / ln(2) END
               + CASE WHEN a.f2 = b.f2 THEN ln(0.85 / 0.08) / ln(2)
                      ELSE ln(0.15 / 0.92) / ln(2) END
               + CASE WHEN a.f3 = b.f3 THEN ln(0.95 / 0.2) / ln(2)
                      ELSE ln(0.05 / 0.8) / ln(2) END) AS w
            FROM s a JOIN s b ON a.bk = b.bk AND a.id < b.id)
      SELECT id_a, id_b, n_agree, round(w, 6) AS weight,
             CASE WHEN w > 2.0 THEN 'match'
                  WHEN w > 0.0 THEN 'possible'
                  ELSE 'non_match' END AS decision
      FROM p ORDER BY w DESC, id_a, id_b LIMIT 100"""))

  /** BPE round-trip: learn the q238 merge table, ENCODE the corpus
    * with it, and read off per-document token counts + compression —
    * the tokenizer-sizing diagnostic. */
  private val q286 = Entry(
    "q286_bpe_encode",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val merges = graft.ops.TextAnalysis
        .bpeMerges(docs, "text", merges = 3)
      graft.ops.TextAnalysis.bpeEncode(docs, "doc_id", "text", merges)
        .where(col("doc_id") < 20)
        .select(col("doc_id"), col("n_words"), col("n_tokens_base"),
          col("n_tokens_bpe"), r6(col("compression")).as("compression"))
        .orderBy("doc_id")
    },
    Some {
      val mergedExpr = (t: String) =>
        s"(SELECT '<' || substring(lft, 2, length(lft) - 2) || " +
          s"substring(rgt, 2, length(rgt) - 2) || '>' FROM $t)"
      val pairExpr = (t: String) =>
        s"(SELECT lft || ' ' || rgt FROM $t)"
      val rounds = (1 to 3).map { r =>
        val apply =
          if (r == 3) ""
          else s""",
      v$r AS (SELECT replace(s, ${pairExpr(s"m$r")},
                ${mergedExpr(s"m$r")}) AS s, n
              FROM v${r - 1})"""
        s"""p$r AS (SELECT n, unnest(t[1:len(t)-1]) AS lft,
                    unnest(t[2:len(t)]) AS rgt
             FROM (SELECT n, string_split(s, ' ') AS t FROM v${r - 1})
             WHERE len(t) >= 2),
      g$r AS (SELECT lft, rgt, CAST(sum(n) AS BIGINT) AS cnt
              FROM p$r GROUP BY 1, 2),
      m$r AS (SELECT lft, rgt, cnt FROM g$r
              ORDER BY cnt DESC, lft, rgt LIMIT 1)$apply"""
      }.mkString(",\n      ")
      val encodes = (1 to 3).map { r =>
        s"""e$r AS (SELECT doc_id, base, replace(s, ${pairExpr(s"m$r")},
                ${mergedExpr(s"m$r")}) AS s
              FROM e${r - 1})"""
      }.mkString(",\n      ")
      s"""
      WITH wt AS (SELECT unnest(string_split_regex(lower(text),
                    '[^a-z]+')) AS w FROM documents),
      wc AS (SELECT w, count(*) AS n FROM wt WHERE length(w) > 0
             GROUP BY 1),
      v0 AS (SELECT array_to_string(list_transform(
               string_split_regex(w, ''), c -> '<' || c || '>'), ' ')
               AS s, n
             FROM wc),
      $rounds,
      dw AS (SELECT doc_id, unnest(string_split_regex(lower(text),
               '[^a-z]+')) AS w
             FROM documents WHERE doc_id < 20),
      e0 AS (SELECT doc_id, length(w)::BIGINT AS base,
                    array_to_string(list_transform(
                      string_split_regex(w, ''), c -> '<' || c || '>'),
                      ' ') AS s
             FROM dw WHERE length(w) > 0),
      $encodes
      SELECT doc_id, count(*) AS n_words,
             sum(base)::BIGINT AS n_tokens_base,
             sum(len(string_split(s, ' ')))::BIGINT AS n_tokens_bpe,
             round(sum(base)::DOUBLE /
               sum(len(string_split(s, ' '))), 6) AS compression
      FROM e3 GROUP BY 1 ORDER BY doc_id"""
    })

  /** Poisson (log-link) regression of per-customer order counts on
    * scaled account balance — the count-GLM companion to q275, same
    * fixed-Newton replay (4 iterations, 2×2 solve per step). */
  private val q287 = Entry(
    "q287_poisson_regression",
    (s, d) => {
      val cnt = Tables.orders(s, d).groupBy(col("o_custkey"))
        .agg(count(lit(1)).cast("double").as("y"))
      val df = Tables.customer(s, d)
        .select(col("c_custkey"), (col("c_acctbal") / 10000.0).as("x"))
        .join(cnt, col("c_custkey") === col("o_custkey"), "left")
        .na.fill(0.0, Seq("y"))
      graft.ops.Regression
        .poissonRegression(df, Seq("x"), col("y"), iterations = 4)
        .select(col("term"), r6(col("coef")).as("coef"), col("n"),
          r6(col("log_loss")).as("log_loss"), col("iterations"))
        .orderBy("term")
    },
    Some("""
      WITH cnt AS (SELECT o_custkey, count(*)::DOUBLE AS y
                   FROM orders GROUP BY 1),
      d AS (SELECT coalesce(y, 0.0) AS y, c_acctbal / 10000.0 AS x
            FROM customer LEFT JOIN cnt ON c_custkey = o_custkey),
      i0 AS (SELECT 0.0 AS b0, 0.0 AS b1),
      s1 AS (SELECT sum(mu) AS h00, sum(mu * x) AS h01,
                    sum(mu * x * x) AS h11, sum(y - mu) AS g0,
                    sum(x * (y - mu)) AS g1
             FROM (SELECT x, y, exp(b0 + b1 * x) AS mu FROM d, i0)),
      i1 AS (SELECT b0 + (h11 * g0 - h01 * g1)
                      / (h00 * h11 - h01 * h01) AS b0,
                    b1 + (h00 * g1 - h01 * g0)
                      / (h00 * h11 - h01 * h01) AS b1
             FROM s1, i0),
      s2 AS (SELECT sum(mu) AS h00, sum(mu * x) AS h01,
                    sum(mu * x * x) AS h11, sum(y - mu) AS g0,
                    sum(x * (y - mu)) AS g1
             FROM (SELECT x, y, exp(b0 + b1 * x) AS mu FROM d, i1)),
      i2 AS (SELECT b0 + (h11 * g0 - h01 * g1)
                      / (h00 * h11 - h01 * h01) AS b0,
                    b1 + (h00 * g1 - h01 * g0)
                      / (h00 * h11 - h01 * h01) AS b1
             FROM s2, i1),
      s3 AS (SELECT sum(mu) AS h00, sum(mu * x) AS h01,
                    sum(mu * x * x) AS h11, sum(y - mu) AS g0,
                    sum(x * (y - mu)) AS g1
             FROM (SELECT x, y, exp(b0 + b1 * x) AS mu FROM d, i2)),
      i3 AS (SELECT b0 + (h11 * g0 - h01 * g1)
                      / (h00 * h11 - h01 * h01) AS b0,
                    b1 + (h00 * g1 - h01 * g0)
                      / (h00 * h11 - h01 * h01) AS b1
             FROM s3, i2),
      s4 AS (SELECT sum(mu) AS h00, sum(mu * x) AS h01,
                    sum(mu * x * x) AS h11, sum(y - mu) AS g0,
                    sum(x * (y - mu)) AS g1
             FROM (SELECT x, y, exp(b0 + b1 * x) AS mu FROM d, i3)),
      i4 AS (SELECT b0 + (h11 * g0 - h01 * g1)
                      / (h00 * h11 - h01 * h01) AS b0,
                    b1 + (h00 * g1 - h01 * g0)
                      / (h00 * h11 - h01 * h01) AS b1
             FROM s4, i3),
      ll AS (SELECT avg(exp(z) - y * z) AS loss, count(*) AS n
             FROM (SELECT y, b0 + b1 * x AS z FROM d, i4))
      SELECT t.term,
             round(CASE WHEN t.term = 'x' THEN i4.b1
                        ELSE i4.b0 END, 6) AS coef,
             ll.n AS n, round(ll.loss, 6) AS log_loss,
             4 AS iterations
      FROM (VALUES ('(intercept)'), ('x')) t(term), i4, ll
      ORDER BY t.term"""))

  /** Target-leakage scan over lineitem features with one PLANTED leak
    * (a return-flag proxy) — the planted feature must flag at
    * separation 1.0, the honest features must not. */
  private val q288 = Entry(
    "q288_leakage_scan",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .withColumn("f_qty", col("l_quantity").cast("double"))
        .withColumn("f_price", col("l_extendedprice").cast("double"))
        .withColumn("f_disc", col("l_discount").cast("double"))
        .withColumn("f_leak",
          when(col("l_returnflag") === "R", lit(1.0) + col("l_tax"))
            .otherwise(col("l_tax")))
      graft.ops.Profiling.leakageScan(li, col("l_returnflag") === "R",
          Seq("f_qty", "f_price", "f_disc", "f_leak"), flagAbove = 0.8)
        .select(col("feature"), col("n"), col("n_pos"),
          r6(col("auc")).as("auc"),
          r6(col("separation")).as("separation"), col("leaky"))
        .orderBy("feature")
    },
    Some("""
      WITH d AS (SELECT CASE WHEN l_returnflag = 'R' THEN 1.0
                   ELSE 0.0 END AS y,
                   l_quantity::DOUBLE AS f_qty,
                   l_extendedprice::DOUBLE AS f_price,
                   l_discount::DOUBLE AS f_disc,
                   CASE WHEN l_returnflag = 'R' THEN 1.0 + l_tax
                        ELSE l_tax END AS f_leak
                 FROM lineitem),
      m AS (SELECT 'f_qty' AS feature, f_qty AS v, y FROM d
            UNION ALL SELECT 'f_price', f_price, y FROM d
            UNION ALL SELECT 'f_disc', f_disc, y FROM d
            UNION ALL SELECT 'f_leak', f_leak, y FROM d),
      v AS (SELECT feature, v, sum(y) AS pos, count(*)::DOUBLE AS tot
            FROM m GROUP BY 1, 2),
      w AS (SELECT feature, pos, tot,
                   coalesce(sum(tot) OVER (PARTITION BY feature
                     ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND
                     1 PRECEDING), 0) AS ex
            FROM v),
      a AS (SELECT feature, sum(pos * (ex + (tot + 1) / 2)) AS rpos,
                   sum(pos) AS np, sum(tot) AS n
            FROM w GROUP BY 1),
      f AS (SELECT feature, n, np,
                   (rpos - np * (np + 1) / 2) / (np * (n - np)) AS auc
            FROM a)
      SELECT feature, n::BIGINT AS n, np::BIGINT AS n_pos,
             round(auc, 6) AS auc,
             round(greatest(auc, 1 - auc), 6) AS separation,
             greatest(auc, 1 - auc) >= 0.8 AS leaky
      FROM f ORDER BY feature"""))

  /** Qini curve of hour-of-day as an uplift score for the user-parity
    * "treatment" on high-value events — flat by construction (hour
    * carries no uplift signal), AUUC = Σ qini·d_frac from the same
    * rows. */
  private val q289 = Entry(
    "q289_qini_curve",
    (s, d) => {
      val ev = Tables.events(s, d).withColumn("score", hour(col("ts")))
      graft.ops.Evaluation.qiniCurve(ev, col("user_id") % 2 === 0,
          col("value") > 150, "score")
        .select(col("score"), r6(col("frac")).as("frac"),
          r6(col("d_frac")).as("d_frac"), col("cum_treated"),
          col("cum_control"), col("cum_resp_treated"),
          col("cum_resp_control"), r6(col("qini")).as("qini"))
        .orderBy(desc("score"))
    },
    Some("""
      WITH d AS (SELECT hour(ts)::DOUBLE AS s,
                   CASE WHEN user_id % 2 = 0 THEN 1.0 ELSE 0.0 END AS t,
                   CASE WHEN "value" > 150 THEN 1.0 ELSE 0.0 END AS y
                 FROM events),
      v AS (SELECT s, count(*)::DOUBLE AS tot, sum(t) AS nt,
                   sum(t * y) AS rt, sum((1 - t) * y) AS rc
            FROM d GROUP BY 1),
      w AS (SELECT s, tot, nt, rt, rc,
                   coalesce(sum(tot) OVER (ORDER BY s DESC ROWS BETWEEN
                     UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS xtot,
                   coalesce(sum(nt) OVER (ORDER BY s DESC ROWS BETWEEN
                     UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS xnt,
                   coalesce(sum(rt) OVER (ORDER BY s DESC ROWS BETWEEN
                     UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS xrt,
                   coalesce(sum(rc) OVER (ORDER BY s DESC ROWS BETWEEN
                     UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS xrc
            FROM v),
      n AS (SELECT count(*)::DOUBLE AS n FROM d)
      SELECT s AS score, round((xtot + tot) / n.n, 6) AS frac,
             round(tot / n.n, 6) AS d_frac,
             (xnt + nt)::BIGINT AS cum_treated,
             ((xtot + tot) - (xnt + nt))::BIGINT AS cum_control,
             (xrt + rt)::BIGINT AS cum_resp_treated,
             (xrc + rc)::BIGINT AS cum_resp_control,
             round(CASE WHEN (xtot + tot) - (xnt + nt) > 0
               THEN (xrt + rt) - (xrc + rc) * (xnt + nt) /
                    ((xtot + tot) - (xnt + nt)) END, 6) AS qini
      FROM w, n ORDER BY score DESC"""))

  /** IPF raking of the event corpus onto uniform type × hour-band
    * margins — per-cell sampling weights that satisfy BOTH target
    * marginals at once (3 fixed rounds, oracle-unrolled). */
  private val q290 = Entry(
    "q290_rake_weights",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .withColumn("band", floor(hour(col("ts")) / 6))
      val ta = Seq("click", "error", "purchase", "signup", "view")
        .map(t => (t, 0.2)).toDF("value", "share")
      val tb = (0 to 3).map(b => (b.toLong, 0.25)).toDF("value", "share")
      graft.ops.Sampling
        .rakeWeights(ev, "event_type", "band", ta, tb, iterations = 3)
        .select(col("a"), col("b"), col("n"),
          r6(col("weight")).as("weight"))
        .orderBy("a", "b")
    },
    Some("""
      WITH c AS (SELECT event_type AS a, floor(hour(ts) / 6) AS b,
                        count(*)::DOUBLE AS n
                 FROM events GROUP BY 1, 2),
      t AS (SELECT sum(n) AS nn FROM c),
      w0 AS (SELECT a, b, n, 1.0 AS w FROM c),
      a1 AS (SELECT w0.a, b, n,
                    w * 0.2 * t.nn / sum(n * w) OVER (PARTITION BY w0.a)
                      AS w
             FROM w0, t),
      b1 AS (SELECT a, a1.b, n,
                    w * 0.25 * t.nn / sum(n * w) OVER (PARTITION BY a1.b)
                      AS w
             FROM a1, t),
      a2 AS (SELECT b1.a, b, n,
                    w * 0.2 * t.nn / sum(n * w) OVER (PARTITION BY b1.a)
                      AS w
             FROM b1, t),
      b2 AS (SELECT a, a2.b, n,
                    w * 0.25 * t.nn / sum(n * w) OVER (PARTITION BY a2.b)
                      AS w
             FROM a2, t),
      a3 AS (SELECT b2.a, b, n,
                    w * 0.2 * t.nn / sum(n * w) OVER (PARTITION BY b2.a)
                      AS w
             FROM b2, t),
      b3 AS (SELECT a, a3.b, n,
                    w * 0.25 * t.nn / sum(n * w) OVER (PARTITION BY a3.b)
                      AS w
             FROM a3, t)
      SELECT a, b::BIGINT AS b, n::BIGINT AS n, round(w, 6) AS weight
      FROM b3 ORDER BY a, b"""))

  /** Entity-resolution capstone: Fellegi–Sunter match pairs →
    * connected components → canonical entity per supplier — the
    * full linkage pipeline composed from q285's scorer and the q34
    * cluster machinery. */
  private val q291 = Entry(
    "q291_entity_resolution",
    (s, d) => {
      val sup = Tables.supplier(s, d)
        .withColumn("f1", substring(col("s_name"), -1, 1))
        .withColumn("f2", floor(col("s_acctbal") / 1000))
        .withColumn("f3", col("s_suppkey") % 5)
      val matches = graft.ops.Dedup.fellegiSunter(sup, "s_suppkey",
          "s_nationkey",
          Seq(("f1", 0.9, 0.1), ("f2", 0.85, 0.08), ("f3", 0.95, 0.2)),
          upper = 2.0, lower = 0.0, maxBlock = 0)
        .where(col("decision") === "match")
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
      graft.ops.Dedup.dedupClusters(sup, "s_suppkey", matches)
        .orderBy("s_suppkey")
    },
    Some("""
      WITH RECURSIVE s AS (SELECT s_suppkey AS id, s_nationkey AS bk,
                        right(s_name, 1) AS f1,
                        floor(s_acctbal / 1000) AS f2,
                        s_suppkey % 5 AS f3
                 FROM supplier),
      p AS (SELECT a.id AS id_a, b.id AS id_b,
              (CASE WHEN a.f1 = b.f1 THEN ln(0.9 / 0.1) / ln(2)
                    ELSE ln(0.1 / 0.9) / ln(2) END
               + CASE WHEN a.f2 = b.f2 THEN ln(0.85 / 0.08) / ln(2)
                      ELSE ln(0.15 / 0.92) / ln(2) END
               + CASE WHEN a.f3 = b.f3 THEN ln(0.95 / 0.2) / ln(2)
                      ELSE ln(0.05 / 0.8) / ln(2) END) AS w
            FROM s a JOIN s b ON a.bk = b.bk AND a.id < b.id),
      mt AS (SELECT id_a, id_b FROM p WHERE w > 2.0),
      sym AS (SELECT id_a AS a, id_b AS b FROM mt
              UNION SELECT id_b, id_a FROM mt),
      reach(a, b) AS (
        SELECT a, b FROM sym
        UNION
        SELECT r.a, s2.b FROM reach r JOIN sym s2 ON r.b = s2.a),
      comp AS (SELECT a AS id, least(a, min(b)) AS component
               FROM reach GROUP BY a)
      SELECT sup.s_suppkey,
             COALESCE(c.component, sup.s_suppkey) AS cluster,
             (COALESCE(c.component, sup.s_suppkey) = sup.s_suppkey)
               AS is_representative
      FROM supplier sup LEFT JOIN comp c ON sup.s_suppkey = c.id
      ORDER BY sup.s_suppkey"""))

  /** Murphy decomposition of a banded price→urgency forecast — exact
    * reliability/resolution/uncertainty split over distinct forecast
    * values (integer bands, so the partition is engine-stable). */
  private val q292 = Entry(
    "q292_brier_decomposition",
    (s, d) => {
      val o = Tables.orders(s, d)
        .withColumn("s",
          (least(floor(col("o_totalprice") / 50000), lit(5)) + 1) / 10.0)
      graft.ops.Evaluation.brierDecomposition(o,
          col("o_orderpriority") === "1-URGENT", col("s"))
        .select(col("n"), col("n_scores"),
          r6(col("base_rate")).as("base_rate"), r6(col("brier")).as("brier"),
          r6(col("reliability")).as("reliability"),
          r6(col("resolution")).as("resolution"),
          r6(col("uncertainty")).as("uncertainty"))
    },
    Some("""
      WITH d AS (SELECT CASE WHEN o_orderpriority = '1-URGENT'
                   THEN 1.0 ELSE 0.0 END AS y,
                   (least(floor(o_totalprice / 50000), 5) + 1) / 10.0 AS s
                 FROM orders),
      c AS (SELECT s, count(*)::DOUBLE AS n, sum(y) AS k
            FROM d GROUP BY 1),
      b AS (SELECT sum(k) / sum(n) AS base, sum(n) AS nn FROM c),
      a AS (SELECT max(nn) AS n, count(*) AS n_scores, max(base) AS base,
                   sum(n / nn * (s - k / n) * (s - k / n)) AS rel,
                   sum(n / nn * (k / n - base) * (k / n - base)) AS res,
                   max(base * (1 - base)) AS unc
            FROM c, b)
      SELECT n::BIGINT AS n, n_scores, round(base, 6) AS base_rate,
             round(rel - res + unc, 6) AS brier,
             round(rel, 6) AS reliability, round(res, 6) AS resolution,
             round(unc, 6) AS uncertainty
      FROM a"""))

  /** Top-20 multivariate outliers in (quantity, price, discount) by
    * Mahalanobis distance — covariance-aware joint outliers the
    * per-column z-scores can't see; χ²(3) 0.001 threshold. */
  private val q293 = Entry(
    "q293_mahalanobis",
    (s, d) => {
      graft.ops.Profiling.mahalanobisOutliers(Tables.lineitem(s, d),
          Seq("l_quantity", "l_extendedprice", "l_discount"),
          threshold = 16.27)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), r6(col("mahalanobis2")).as("mahalanobis2"),
          col("outlier"))
        .orderBy(desc("mahalanobis2"), col("l_orderkey"),
          col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
        .limit(20)
    },
    Some("""
      WITH st AS (SELECT count(*)::DOUBLE AS n,
                    avg(l_quantity::DOUBLE) AS m1,
                    avg(l_extendedprice::DOUBLE) AS m2,
                    avg(l_discount::DOUBLE) AS m3,
                    sum(l_quantity * l_quantity) AS s11,
                    sum(l_quantity * l_extendedprice) AS s12,
                    sum(l_quantity * l_discount) AS s13,
                    sum(l_extendedprice * l_extendedprice) AS s22,
                    sum(l_extendedprice * l_discount) AS s23,
                    sum(l_discount * l_discount) AS s33
                  FROM lineitem),
      cv AS (SELECT n, m1, m2, m3,
               (s11 - n * m1 * m1) / (n - 1) AS c11,
               (s12 - n * m1 * m2) / (n - 1) AS c12,
               (s13 - n * m1 * m3) / (n - 1) AS c13,
               (s22 - n * m2 * m2) / (n - 1) AS c22,
               (s23 - n * m2 * m3) / (n - 1) AS c23,
               (s33 - n * m3 * m3) / (n - 1) AS c33
             FROM st),
      iv AS (SELECT *,
               c11 * (c22 * c33 - c23 * c23)
                 - c12 * (c12 * c33 - c23 * c13)
                 + c13 * (c12 * c23 - c22 * c13) AS det
             FROM cv),
      i2 AS (SELECT m1, m2, m3,
               (c22 * c33 - c23 * c23) / det AS i11,
               (c13 * c23 - c12 * c33) / det AS i12,
               (c12 * c23 - c13 * c22) / det AS i13,
               (c11 * c33 - c13 * c13) / det AS i22,
               (c12 * c13 - c11 * c23) / det AS i23,
               (c11 * c22 - c12 * c12) / det AS i33
             FROM iv),
      sc AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
               i11 * (l_quantity - m1) * (l_quantity - m1)
               + i22 * (l_extendedprice - m2) * (l_extendedprice - m2)
               + i33 * (l_discount - m3) * (l_discount - m3)
               + 2 * (i12 * (l_quantity - m1) * (l_extendedprice - m2)
                 + i13 * (l_quantity - m1) * (l_discount - m3)
                 + i23 * (l_extendedprice - m2) * (l_discount - m3))
                 AS d2
             FROM lineitem, i2)
      SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
             round(d2, 6) AS mahalanobis2, d2 > 16.27 AS outlier
      FROM sc
      ORDER BY d2 DESC, l_orderkey, l_linenumber, l_partkey, l_suppkey
      LIMIT 20"""))

  /** Language-ID quality: confusion of the declared document language
    * vs the n-gram heuristic's prediction — composition of the q28
    * classifier with the corpus metadata. */
  private val q294 = Entry(
    "q294_langid_confusion",
    (s, d) => {
      graft.ops.TextAnalysis.langId(Tables.documents(s, d), "text")
        .groupBy(col("lang").as("declared"), col("predicted_lang"))
        .agg(count(lit(1)).as("n"))
        .orderBy("declared", "predicted_lang")
    },
    Some("""
      WITH t AS (
        SELECT doc_id, lang,
               list_distinct(string_split(text, ' ')) AS w
        FROM documents),
      h AS (
        SELECT doc_id, lang,
               len(list_intersect(w, ['der','die','und','das','ist','nicht','ein','zu'])) AS hits_de,
               len(list_intersect(w, ['the','a','of','and','to','in','is','that'])) AS hits_en,
               len(list_intersect(w, ['el','la','de','que','y','en','un','los'])) AS hits_es,
               len(list_intersect(w, ['le','la','les','de','et','un','est','que'])) AS hits_fr
        FROM t),
      p AS (SELECT lang,
              CASE WHEN greatest(hits_de, hits_en, hits_es, hits_fr) <= 0 THEN 'und'
                   WHEN hits_de = greatest(hits_de, hits_en, hits_es, hits_fr) THEN 'de'
                   WHEN hits_en = greatest(hits_de, hits_en, hits_es, hits_fr) THEN 'en'
                   WHEN hits_es = greatest(hits_de, hits_en, hits_es, hits_fr) THEN 'es'
                   ELSE 'fr' END AS predicted_lang
            FROM h)
      SELECT lang AS declared, predicted_lang, count(*) AS n
      FROM p GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Two-component Gaussian mixture on event values by 2 fixed EM
    * steps — deterministic quartile-anchored init, every E/M update
    * replayed by the oracle. */
  private val q295 = Entry(
    "q295_gaussian_mixture",
    (s, d) => {
      graft.ops.Regression.gaussianMixture1D(
          Tables.events(s, d).select(col("value")), "value",
          iterations = 2)
        .select(col("component"), r6(col("weight")).as("weight"),
          r6(col("mean")).as("mean"), r6(col("std")).as("std"),
          col("n"), r6(col("log_lik")).as("log_lik"), col("iterations"))
        .orderBy("component")
    },
    Some {
      def estep(prev: String, out: String) = s"""
      $out AS (SELECT sum(r) AS r1, sum(r * x) AS rx1,
                    sum(r * x * x) AS rxx1,
                    sum((1 - r) * x) AS rx2,
                    sum((1 - r) * x * x) AS rxx2
             FROM (SELECT x, a / (a + b) AS r FROM (
                   SELECT x,
                     p1 / sqrt(v1) * exp(-(x - m1) * (x - m1) / (2 * v1))
                       AS a,
                     (1 - p1) / sqrt(v2) *
                       exp(-(x - m2) * (x - m2) / (2 * v2)) AS b
                   FROM d, $prev)))"""
      def mstep(e: String, out: String) = s"""
      $out AS (SELECT rx1 / r1 AS m1,
                    greatest(rxx1 / r1 - (rx1 / r1) * (rx1 / r1),
                      1e-12) AS v1,
                    rx2 / (i.n - r1) AS m2,
                    greatest(rxx2 / (i.n - r1) -
                      (rx2 / (i.n - r1)) * (rx2 / (i.n - r1)),
                      1e-12) AS v2,
                    r1 / i.n AS p1
             FROM $e, i)"""
      s"""
      WITH d AS (SELECT "value"::DOUBLE AS x FROM events
                 WHERE "value" IS NOT NULL),
      i AS (SELECT min(x) AS mn, max(x) AS mx,
                   greatest(var_samp(x), 1e-12) AS v0,
                   count(*)::DOUBLE AS n
            FROM d),
      p0 AS (SELECT mn + (mx - mn) / 4 AS m1, v0 AS v1,
                    mn + 3 * (mx - mn) / 4 AS m2, v0 AS v2,
                    0.5 AS p1
             FROM i),
      ${estep("p0", "e1")},
      ${mstep("e1", "px1")},
      ${estep("px1", "e2")},
      ${mstep("e2", "px2")},
      ll AS (SELECT avg(ln(
               p1 / sqrt(2 * pi() * v1) *
                 exp(-(x - m1) * (x - m1) / (2 * v1)) +
               (1 - p1) / sqrt(2 * pi() * v2) *
                 exp(-(x - m2) * (x - m2) / (2 * v2)))) AS l
             FROM d, px2)
      SELECT c.component, round(CASE WHEN c.component = 1 THEN p1
               ELSE 1 - p1 END, 6) AS weight,
             round(CASE WHEN c.component = 1 THEN m1 ELSE m2 END, 6)
               AS mean,
             round(CASE WHEN c.component = 1 THEN sqrt(v1)
               ELSE sqrt(v2) END, 6) AS std,
             i.n::BIGINT AS n, round(ll.l, 6) AS log_lik,
             2 AS iterations
      FROM (VALUES (1), (2)) c(component), px2, i, ll
      ORDER BY c.component"""
    })

  /** Restricted mean survival through 20 days per user-parity arm —
    * the clinical-style RMST contrast on the q279 cohort machinery. */
  private val q296 = Entry(
    "q296_rmst_by_arm",
    (s, d) => {
      // ONE events scan: arm rides as a column through the per-user
      // rollup, and the grouped restrictedMeanSurvival computes both
      // arms' KM integrals from per-group prefix sums (was: two full
      // scans + two separate survival chains).
      val hit = when(col("event_type") === "purchase" &&
        col("value") > 200, col("ts"))
      val surv = Tables.events(s, d)
        .groupBy("user_id")
        .agg(min(hit).as("__hit"), min(col("ts")).as("__first"),
          max(col("ts")).as("__last"))
        .select(
          when(col("user_id") % 2 === 0, lit("even"))
            .otherwise(lit("odd")).as("arm"),
          when(col("__hit").isNotNull,
            datediff(to_date(col("__hit")), to_date(col("__first"))))
            .otherwise(
              datediff(to_date(col("__last")), to_date(col("__first"))))
            .as("dur"),
          when(col("__hit").isNotNull, lit(1)).otherwise(lit(0))
            .as("ev"))
      AnalysisPlanner
        .restrictedMeanSurvival(surv, "dur", "ev", 20.0,
          groupCols = Seq("arm"))
        .select(col("arm"), col("n"), col("n_events"),
          r6(col("rmst")).as("rmst"))
        .orderBy("arm")
    },
    Some {
      def chain(p: String, par: Int, label: String) = s"""
      ${p}s AS (
        SELECT
          CASE WHEN min(ts) FILTER (event_type = 'purchase' AND "value" > 200) IS NOT NULL
               THEN datediff('day', min(ts)::DATE,
                 (min(ts) FILTER (event_type = 'purchase' AND "value" > 200))::DATE)
               ELSE datediff('day', min(ts)::DATE, max(ts)::DATE) END AS dur,
          CASE WHEN min(ts) FILTER (event_type = 'purchase' AND "value" > 200) IS NOT NULL
               THEN 1.0 ELSE 0.0 END AS ev
        FROM events WHERE user_id % 2 = $par GROUP BY user_id),
      ${p}g AS (SELECT dur, sum(ev) AS d, count(*)::DOUBLE AS tot
            FROM ${p}s GROUP BY 1),
      ${p}t AS (SELECT count(*)::DOUBLE AS nn FROM ${p}s),
      ${p}w AS (SELECT dur, d,
              coalesce(sum(tot) OVER (ORDER BY dur ROWS BETWEEN
                UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
            FROM ${p}g),
      ${p}e AS (SELECT dur, d, nn - bef AS n_risk
            FROM ${p}w, ${p}t WHERE d > 0),
      ${p}km AS (SELECT dur, exp(sum(ln(1 - d / n_risk)) OVER (
               ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND
               CURRENT ROW)) AS sv
             FROM ${p}e),
      ${p}nx AS (SELECT dur, sv, lead(dur) OVER (ORDER BY dur) AS nd
             FROM ${p}km),
      ${p}seg AS (SELECT sv * (least(coalesce(nd, 20.0), 20.0) -
                           least(dur::DOUBLE, 20.0)) AS seg
              FROM ${p}nx
              UNION ALL
              SELECT least((SELECT min(dur)::DOUBLE FROM ${p}km), 20.0)),
      ${p}r AS (SELECT '$label' AS arm,
               (SELECT count(*) FROM ${p}s) AS n,
               (SELECT sum(ev) FROM ${p}s)::BIGINT AS n_events,
               round(sum(seg), 6) AS rmst
            FROM ${p}seg)"""
      s"""
      WITH ${chain("ea_", 0, "even")},
      ${chain("ob_", 1, "odd")}
      SELECT * FROM ea_r UNION ALL SELECT * FROM ob_r ORDER BY arm"""
    })

  /** Completeness drift: per-week NULL rates for two columns with
    * deterministically injected missingness that worsens over the
    * month — the degradation the flat profile can't localize. */
  private val q297 = Entry(
    "q297_completeness_trend",
    (s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("week", floor((dayofmonth(col("ts")) - 1) / 7))
        .withColumn("v",
          when(col("event_id") % 29 < col("week") * 3, lit(null))
            .otherwise(col("value")))
        .withColumn("p",
          when(col("event_id") % 31 < 2, lit(null))
            .otherwise(col("props")))
      graft.ops.Profiling
        .completenessTrend(ev, col("week"), Seq("v", "p"))
        .select(col("period"), col("column"), col("n"), col("n_null"),
          r6(col("null_rate")).as("null_rate"))
        .orderBy("period", "column")
    },
    Some("""
      WITH ev AS (SELECT floor((day(ts) - 1) / 7) AS week,
                    CASE WHEN event_id % 29 <
                      floor((day(ts) - 1) / 7) * 3
                      THEN NULL ELSE "value" END AS v,
                    CASE WHEN event_id % 31 < 2 THEN NULL
                         ELSE props END AS p
                  FROM events),
      g AS (SELECT week, count(*) AS n,
                   sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS kv,
                   sum(CASE WHEN p IS NULL THEN 1 ELSE 0 END) AS kp
            FROM ev GROUP BY 1)
      SELECT week::BIGINT AS period, m.col AS "column", n,
             CASE WHEN m.col = 'v' THEN kv ELSE kp END::BIGINT
               AS n_null,
             round((CASE WHEN m.col = 'v' THEN kv ELSE kp END)::DOUBLE
               / n, 6) AS null_rate
      FROM g, (VALUES ('v'), ('p')) m(col)
      ORDER BY period, "column""""))

  /** Huber robust fit of event value on hour (δ = 50, OLS + 2 IRLS
    * rounds) — the multi-feature robust regression; every weighted
    * 2×2 solve replayed by the oracle. */
  private val q298 = Entry(
    "q298_huber_regression",
    (s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("x", hour(col("ts")).cast("double"))
      graft.ops.Regression
        .huberRegression(ev, Seq("x"), "value", delta = 50.0,
          iterations = 3)
        .select(col("term"), r6(col("coef")).as("coef"), col("n"),
          r6(col("mean_abs_resid")).as("mean_abs_resid"),
          col("iterations"))
        .orderBy("term")
    },
    Some {
      def wls(prev: Option[String], out: String) = {
        val w = prev.fold("1.0") { p =>
          s"least(1.0, 50.0 / greatest(abs(y - ($p.b0 + $p.b1 * x)), 1e-300))"
        }
        val from = prev.fold("d")(p => s"d, $p")
        s"""
      ${out}s AS (SELECT sum(w) AS sw, sum(w * x) AS swx,
                    sum(w * y) AS swy, sum(w * x * x) AS swxx,
                    sum(w * x * y) AS swxy
             FROM (SELECT x, y, $w AS w FROM $from)),
      $out AS (SELECT (sw * swxy - swx * swy)
                      / (sw * swxx - swx * swx) AS b1,
                    (swy - (sw * swxy - swx * swy)
                      / (sw * swxx - swx * swx) * swx) / sw AS b0
             FROM ${out}s)"""
      }
      s"""
      WITH d AS (SELECT hour(ts)::DOUBLE AS x, "value" AS y
                 FROM events
                 WHERE "value" IS NOT NULL AND ts IS NOT NULL),
      ${wls(None, "f1")},
      ${wls(Some("f1"), "f2")},
      ${wls(Some("f2"), "f3")},
      ll AS (SELECT avg(abs(y - (f3.b0 + f3.b1 * x))) AS mar,
                    count(*) AS n
             FROM d, f3)
      SELECT t.term,
             round(CASE WHEN t.term = 'x' THEN f3.b1
                        ELSE f3.b0 END, 6) AS coef,
             ll.n AS n, round(ll.mar, 6) AS mean_abs_resid,
             3 AS iterations
      FROM (VALUES ('(intercept)'), ('x')) t(term), f3, ll
      ORDER BY t.term"""
    })

  /** Second-order partial correlation: price ↔ quantity controlling
    * for BOTH unit price and discount — the precision-matrix
    * multi-control generalization of the existing single-control op
    * (oracle via the recursive first-order composition). */
  private val q299 = Entry(
    "q299_partial_correlation_multi",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .withColumn("unit",
          col("l_extendedprice") / greatest(col("l_quantity"), lit(1.0)))
      AnalysisPlanner.partialCorrelationMulti(li, "l_extendedprice",
          "l_quantity", Seq("unit", "l_discount"))
        .select(col("n"), r6(col("r_xy")).as("r_xy"),
          r6(col("r_xy_given_z")).as("r_xy_given_z"), col("n_controls"))
    },
    Some("""
      WITH d AS (SELECT l_extendedprice::DOUBLE AS x,
                   l_quantity::DOUBLE AS y,
                   l_extendedprice / greatest(l_quantity, 1.0) AS z1,
                   l_discount::DOUBLE AS z2
                 FROM lineitem),
      m AS (SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
                   sum(z1) AS sz1, sum(z2) AS sz2, sum(x * x) AS sxx,
                   sum(y * y) AS syy, sum(z1 * z1) AS sz1z1,
                   sum(z2 * z2) AS sz2z2, sum(x * y) AS sxy,
                   sum(x * z1) AS sxz1, sum(x * z2) AS sxz2,
                   sum(y * z1) AS syz1, sum(y * z2) AS syz2,
                   sum(z1 * z2) AS sz1z2
            FROM d),
      r AS (SELECT n,
              (sxy - sx * sy / n) / sqrt((sxx - sx * sx / n)
                * (syy - sy * sy / n)) AS rxy,
              (sxz1 - sx * sz1 / n) / sqrt((sxx - sx * sx / n)
                * (sz1z1 - sz1 * sz1 / n)) AS rxz1,
              (sxz2 - sx * sz2 / n) / sqrt((sxx - sx * sx / n)
                * (sz2z2 - sz2 * sz2 / n)) AS rxz2,
              (syz1 - sy * sz1 / n) / sqrt((syy - sy * sy / n)
                * (sz1z1 - sz1 * sz1 / n)) AS ryz1,
              (syz2 - sy * sz2 / n) / sqrt((syy - sy * sy / n)
                * (sz2z2 - sz2 * sz2 / n)) AS ryz2,
              (sz1z2 - sz1 * sz2 / n) / sqrt((sz1z1 - sz1 * sz1 / n)
                * (sz2z2 - sz2 * sz2 / n)) AS rz1z2
            FROM m),
      p1 AS (SELECT n, rxy,
               (rxy - rxz1 * ryz1) /
                 sqrt((1 - rxz1 * rxz1) * (1 - ryz1 * ryz1)) AS rxy_1,
               (rxz2 - rxz1 * rz1z2) /
                 sqrt((1 - rxz1 * rxz1) * (1 - rz1z2 * rz1z2)) AS rx2_1,
               (ryz2 - ryz1 * rz1z2) /
                 sqrt((1 - ryz1 * ryz1) * (1 - rz1z2 * rz1z2)) AS ry2_1
             FROM r)
      SELECT n::BIGINT AS n, round(rxy, 6) AS r_xy,
             round((rxy_1 - rx2_1 * ry2_1) /
               sqrt((1 - rx2_1 * rx2_1) * (1 - ry2_1 * ry2_1)), 6)
               AS r_xy_given_z,
             2 AS n_controls
      FROM p1"""))

  /** Kruskal–Wallis rank test: do the five event types draw their
    * values from the same distribution? Midrank/tie convention,
    * statistic-only (H ~ χ²(4)). */
  private val q300 = Entry(
    "q300_kruskal_wallis",
    (s, d) => {
      AnalysisPlanner.kruskalWallisFromCells(eventTypeValueCells(s, d))
        .select(col("n"), col("n_groups"), col("dof"),
          r6(col("h")).as("h"),
          r6(col("h_corrected")).as("h_corrected"))
    },
    Some("""
      WITH d AS (SELECT event_type AS g, "value"::DOUBLE AS v
                 FROM events
                 WHERE "value" IS NOT NULL AND event_type IS NOT NULL),
      vt AS (SELECT v, count(*)::DOUBLE AS t FROM d GROUP BY 1),
      r AS (SELECT v, t,
                   coalesce(sum(t) OVER (ORDER BY v ROWS BETWEEN
                     UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     + (t + 1) / 2 AS mr
            FROM vt),
      cells AS (SELECT g, v, count(*)::DOUBLE AS c FROM d GROUP BY 1, 2),
      per AS (SELECT g, sum(c) AS ng, sum(c * mr) AS rg
              FROM cells JOIN r USING (v) GROUP BY 1),
      tie AS (SELECT sum(t * t * t - t) AS tie, sum(t) AS nn FROM r),
      h AS (SELECT max(nn)::BIGINT AS n, count(*) AS n_groups,
                   count(*) - 1 AS dof,
                   12.0 / (max(nn) * (max(nn) + 1))
                     * sum(rg * rg / ng) - 3 * (max(nn) + 1) AS h,
                   max(tie / (nn * nn * nn - nn)) AS cf
            FROM per, tie)
      SELECT n, n_groups, dof, round(h, 6) AS h,
             round(h / (1 - cf), 6) AS h_corrected
      FROM h"""))

  /** Cramér–von Mises two-sample criterion on event values by user
    * parity — the integrated-squared companion to q10 (KS) and q263
    * (Anderson–Darling). */
  private val q301 = Entry(
    "q301_cramer_von_mises",
    (s, d) => {
      AnalysisPlanner.cramerVonMises(Tables.events(s, d), "value",
          col("user_id") % 2 === 0)
        .select(col("n_a"), col("n_b"),
          r6(col("cvm_stat")).as("cvm_stat"))
    },
    Some("""
      WITH d AS (SELECT "value"::DOUBLE AS v,
                   CASE WHEN user_id % 2 = 0 THEN 1.0 ELSE 0.0 END AS a
                 FROM events WHERE "value" IS NOT NULL),
      g AS (SELECT v, sum(a) AS ca, count(*)::DOUBLE AS cnt
            FROM d GROUP BY 1),
      w AS (SELECT v, ca, cnt,
              coalesce(sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                PRECEDING AND 1 PRECEDING), 0) + ca AS fa,
              coalesce(sum(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                PRECEDING AND 1 PRECEDING), 0) + cnt AS ft
            FROM g),
      t AS (SELECT sum(a) AS n1, sum(1 - a) AS n2,
                   count(*)::DOUBLE AS tt
            FROM d)
      SELECT n1::BIGINT AS n_a, n2::BIGINT AS n_b,
             round(n1 * n2 / (tt * tt) *
               sum(cnt * (fa / n1 - (ft - fa) / n2)
                       * (fa / n1 - (ft - fa) / n2)), 6) AS cvm_stat
      FROM w, t GROUP BY n1, n2, tt"""))

  /** Dunn's rank post-hoc across the five event types — which pairs
    * differ, after q300's omnibus; tie-corrected z per pair. */
  private val q302 = Entry(
    "q302_dunn_test",
    (s, d) => {
      AnalysisPlanner.dunnTestFromCells(eventTypeValueCells(s, d))
        .select(col("group_a"), col("group_b"), col("n_a"), col("n_b"),
          r6(col("mean_rank_a")).as("mean_rank_a"),
          r6(col("mean_rank_b")).as("mean_rank_b"), r6(col("z")).as("z"))
        .orderBy("group_a", "group_b")
    },
    Some("""
      WITH d AS (SELECT event_type AS g, "value"::DOUBLE AS v
                 FROM events
                 WHERE "value" IS NOT NULL AND event_type IS NOT NULL),
      vt AS (SELECT v, count(*)::DOUBLE AS t FROM d GROUP BY 1),
      r AS (SELECT v, t,
                   coalesce(sum(t) OVER (ORDER BY v ROWS BETWEEN
                     UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     + (t + 1) / 2 AS mr
            FROM vt),
      cells AS (SELECT g, v, count(*)::DOUBLE AS c FROM d GROUP BY 1, 2),
      per AS (SELECT g, sum(c) AS ng, sum(c * mr) / sum(c) AS mrg
              FROM cells JOIN r USING (v) GROUP BY 1),
      tie AS (SELECT sum(t * t * t - t) AS tie, sum(t) AS nn FROM r)
      SELECT a.g AS group_a, b.g AS group_b, a.ng::BIGINT AS n_a,
             b.ng::BIGINT AS n_b, round(a.mrg, 6) AS mean_rank_a,
             round(b.mrg, 6) AS mean_rank_b,
             round((a.mrg - b.mrg) /
               sqrt(((nn * (nn + 1) - tie / (nn - 1)) / 12)
                 * (1 / a.ng + 1 / b.ng)), 6) AS z
      FROM per a JOIN per b ON a.g < b.g, tie
      ORDER BY group_a, group_b"""))

  /** Majority-vote label aggregation of the (order, rater-pool,
    * return-flag) rating frame — the baseline consensus readout,
    * grouped to per-label item counts and share stats. */
  private val q303 = Entry(
    "q303_majority_vote",
    (s, d) => {
      val rt = Tables.lineitem(s, d)
      graft.ops.Labeling.majorityVote(
          rt.withColumn("rater", col("l_suppkey") % 7),
          "l_orderkey", "rater", "l_returnflag")
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_items"),
          r6(avg(col("vote_share"))).as("avg_vote_share"),
          sum(when(col("vote_share") === 1.0, 1L).otherwise(0L))
            .as("unanimous_items"))
        .orderBy("label")
    },
    Some("""
      WITH v AS (SELECT l_orderkey AS item, l_returnflag AS obs,
                        count(*)::DOUBLE AS c
                 FROM lineitem GROUP BY 1, 2),
      pi_ AS (SELECT item, sum(c) AS nr FROM v GROUP BY 1),
      mv AS (SELECT v.item, obs AS label, c AS n_votes, nr,
                    row_number() OVER (PARTITION BY v.item
                      ORDER BY c DESC, obs ASC) AS rn
             FROM v JOIN pi_ USING (item))
      SELECT label, count(*) AS n_items,
             round(avg(n_votes / nr), 6) AS avg_vote_share,
             sum(CASE WHEN n_votes = nr THEN 1 ELSE 0 END)::BIGINT
               AS unanimous_items
      FROM mv WHERE rn = 1 GROUP BY 1 ORDER BY 1"""))

  /** Dawid–Skene EM vs majority vote: the (ds_label, vote_label)
    * item confusion after 2 EM rounds — every posterior, prior, and
    * confusion cell replayed on the same 9-decimal grid. */
  private val q304 = Entry(
    "q304_dawid_skene",
    (s, d) => {
      val rt = Tables.lineitem(s, d)
        .withColumn("rater", col("l_suppkey") % 7)
      // ONE corpus scan: the EM reduces the shared vote-cell substrate
      // and emits the plurality baseline for free off its initial
      // posteriors — no second estimator pass, no extra join.
      val ds = graft.ops.Labeling.dawidSkeneFromCells(
        graft.ops.Labeling.voteCells(rt, "l_orderkey", "rater",
          "l_returnflag"),
        iterations = 2, withVoteLabel = true)
      ds.items.select(col("label").as("ds_label"), col("vote_label"))
        .groupBy("ds_label", "vote_label").agg(count(lit(1)).as("n"))
        .orderBy("ds_label", "vote_label")
    },
    Some {
      def iter(k: Int) = {
        val prev = if (k == 1) "t0" else s"t${k - 1}"
        s"""pr$k AS (SELECT l, round((sum(w) + 0.1) / (ni.ni + 0.3), 9)
               AS p
             FROM $prev, ni GROUP BY l, ni.ni),
      cl$k AS (SELECT rater, t.l, rt.obs, sum(t.w) AS s
             FROM rt JOIN $prev t USING (item) GROUP BY 1, 2, 3),
      dn$k AS (SELECT rater, l, sum(s) AS tot FROM cl$k GROUP BY 1, 2),
      cf$k AS (SELECT c.rater, c.l, c.obs,
                    round((c.s + 0.1) / (d.tot + 0.3), 9) AS pi
             FROM cl$k c JOIN dn$k d USING (rater, l)),
      e$k AS (SELECT rt.item, cf$k.l,
                   round(sum(ln(cf$k.pi)) + max(lp$k.lp), 9) AS s
            FROM rt JOIN cf$k ON cf$k.rater = rt.rater
                              AND cf$k.obs = rt.obs
            JOIN (SELECT l, ln(p) AS lp FROM pr$k) lp$k
              ON lp$k.l = cf$k.l
            GROUP BY 1, 2),
      mx$k AS (SELECT item, max(s) AS mx FROM e$k GROUP BY 1),
      z$k AS (SELECT e.item, sum(exp(e.s - m.mx)) AS z
             FROM e$k e JOIN mx$k m USING (item) GROUP BY 1),
      t$k AS (SELECT e.item, e.l,
                   round(exp(e.s - m.mx) / z.z, 9) AS w
             FROM e$k e JOIN mx$k m USING (item)
             JOIN z$k z ON z.item = e.item)"""
      }
      s"""
      WITH rt AS (SELECT l_orderkey AS item, l_suppkey % 7 AS rater,
                    l_returnflag AS obs
                  FROM lineitem),
      ni AS (SELECT count(DISTINCT item)::DOUBLE AS ni FROM rt),
      lab AS (SELECT * FROM (VALUES ('A'), ('N'), ('R')) t(l)),
      v AS (SELECT item, obs, count(*)::DOUBLE AS c
            FROM rt GROUP BY 1, 2),
      pi_ AS (SELECT item, sum(c) AS nr FROM v GROUP BY 1),
      t0 AS (SELECT pi_.item, lab.l,
                    round(coalesce(v.c, 0) / pi_.nr, 9) AS w
             FROM pi_ CROSS JOIN lab
             LEFT JOIN v ON v.item = pi_.item AND v.obs = lab.l),
      ${iter(1)},
      ${iter(2)},
      ds AS (SELECT item, l AS ds_label FROM (
               SELECT item, l, row_number() OVER (PARTITION BY item
                 ORDER BY w DESC, l ASC) AS rn
               FROM t2) WHERE rn = 1),
      mv AS (SELECT item, obs AS vote_label FROM (
               SELECT v.item, obs, row_number() OVER (PARTITION BY
                 v.item ORDER BY c DESC, obs ASC) AS rn
               FROM v) WHERE rn = 1)
      SELECT ds_label, vote_label, count(*) AS n
      FROM ds JOIN mv USING (item)
      GROUP BY 1, 2 ORDER BY 1, 2"""
    })

  /** Source-pair vocabulary Jaccard across the 20 document sources —
    * the mixture-planning "are these crawls the same text?" matrix;
    * top 15 most-overlapping pairs. */
  private val q305 = Entry(
    "q305_vocab_overlap",
    (s, d) => {
      graft.ops.TextAnalysis
        .sourceVocabularyOverlap(Tables.documents(s, d), "source", "text")
        .select(col("source_a"), col("source_b"), col("vocab_a"),
          col("vocab_b"), col("common"), r6(col("jaccard")).as("jaccard"))
        .orderBy(desc("jaccard"), col("source_a"), col("source_b"))
        .limit(15)
    },
    Some("""
      WITH v AS (SELECT DISTINCT source AS s,
                        unnest(string_split_regex(lower(text),
                          '[^a-z]+')) AS t
                 FROM documents),
      vv AS (SELECT s, t FROM v WHERE length(t) > 0),
      sz AS (SELECT s, count(*) AS vb FROM vv GROUP BY 1),
      p AS (SELECT a.s AS sa, b.s AS sb, count(*) AS common
            FROM vv a JOIN vv b ON a.t = b.t AND a.s < b.s
            GROUP BY 1, 2)
      SELECT sa AS source_a, sb AS source_b, x.vb AS vocab_a,
             y.vb AS vocab_b, common,
             round(common::DOUBLE / (x.vb + y.vb - common), 6)
               AS jaccard
      FROM p JOIN sz x ON sa = x.s JOIN sz y ON sb = y.s
      ORDER BY jaccard DESC, source_a, source_b LIMIT 15"""))

  /** Hill tail index of event values from the top-100 order
    * statistics — the heavy-tail diagnostic that prices clipping
    * decisions. */
  private val q306 = Entry(
    "q306_hill_tail_index",
    (s, d) => {
      graft.ops.Profiling.hillTailIndex(Tables.events(s, d), "value",
          k = 100)
        .select(col("k"), col("n_positive"), r6(col("x_k1")).as("x_k1"),
          r6(col("hill_gamma")).as("hill_gamma"),
          r6(col("hill_alpha")).as("hill_alpha"))
    },
    Some("""
      WITH pos AS (SELECT "value"::DOUBLE AS x FROM events
                   WHERE "value" IS NOT NULL AND "value" > 0),
      np AS (SELECT count(*) AS n_positive FROM pos),
      top AS (SELECT x FROM pos ORDER BY x DESC LIMIT 101),
      mn AS (SELECT min(x) AS xk1 FROM top),
      h AS (SELECT count(*) AS k, max(mn.xk1) AS x_k1,
                   avg(ln(x / mn.xk1)) AS g
            FROM top, mn WHERE x > mn.xk1)
      SELECT k, n_positive, round(x_k1, 6) AS x_k1,
             round(g, 6) AS hill_gamma, round(1 / g, 6) AS hill_alpha
      FROM h, np"""))

  /** Cross-source exact-duplicate matrix with a planted "recrawl"
    * source (a relabeled slice of the corpus) — which source pairs
    * share identical texts, and how much of each is copied. */
  private val q307 = Entry(
    "q307_cross_source_dups",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val recrawl = docs.where(col("doc_id") % 3 === 0)
        .withColumn("source", lit("recrawl"))
      graft.ops.Dedup
        .crossSourceDuplicates(docs.unionByName(recrawl), "source",
          "text")
        .select(col("source_a"), col("source_b"), col("docs_a"),
          col("docs_b"), col("shared_texts"),
          r6(col("overlap_a")).as("overlap_a"),
          r6(col("overlap_b")).as("overlap_b"))
        .orderBy("source_a", "source_b")
    },
    Some("""
      WITH all_docs AS (
        SELECT source, text FROM documents
        UNION ALL
        SELECT 'recrawl' AS source, text FROM documents
        WHERE doc_id % 3 = 0),
      hs AS (SELECT DISTINCT source AS s, md5(text) AS h
             FROM all_docs WHERE text IS NOT NULL),
      sz AS (SELECT s, count(*) AS dd FROM hs GROUP BY 1),
      p AS (SELECT a.s AS sa, b.s AS sb, count(*) AS shared
            FROM hs a JOIN hs b ON a.h = b.h AND a.s < b.s
            GROUP BY 1, 2)
      SELECT sa AS source_a, sb AS source_b, x.dd AS docs_a,
             y.dd AS docs_b, shared AS shared_texts,
             round(shared::DOUBLE / x.dd, 6) AS overlap_a,
             round(shared::DOUBLE / y.dd, 6) AS overlap_b
      FROM p JOIN sz x ON sa = x.s JOIN sz y ON sb = y.s
      ORDER BY source_a, source_b"""))

  /** Embedding dimension health over the 64-dim corpus: per-dim
    * variance share and collapsed-dimension flags. */
  private val q308 = Entry(
    "q308_embedding_health",
    (s, d) => {
      graft.ops.Features
        .embeddingDimensionHealth(Tables.embeddings(s, d), "embedding")
        .select(col("dim"), col("n"), r6(col("mean")).as("mean"),
          r6(col("variance")).as("variance"),
          r6(col("var_share")).as("var_share"), col("collapsed"))
        .orderBy("dim")
    },
    Some("""
      WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings WHERE embedding IS NOT NULL),
      m AS (SELECT i - 1 AS dim, count(*) AS n, avg(v[i]) AS mean,
                   var_samp(v[i]) AS variance
            FROM e, range(1, 65) t(i) GROUP BY 1),
      tv AS (SELECT sum(variance) AS tv FROM m)
      SELECT dim::INT AS dim, n, round(mean, 6) AS mean,
             round(variance, 6) AS variance,
             round(variance / tv, 6) AS var_share,
             variance < 1e-6 AS collapsed
      FROM m, tv ORDER BY dim"""))

  /** Corpus report card — the dataset-card summary table: size,
    * shape, redundancy, vocabulary, language entropy, source
    * concentration, one (metric, value) row each. */
  private val q309 = Entry(
    "q309_corpus_report_card",
    (s, d) => {
      graft.ops.CorpusPipeline.reportCard(Tables.documents(s, d),
          "doc_id", "text", "lang", "source")
        .select(col("metric"), r6(col("value")).as("value"))
        .orderBy("metric")
    },
    Some("""
      WITH base AS (SELECT * FROM documents WHERE text IS NOT NULL),
      mom AS (SELECT count(*)::DOUBLE AS docs,
                sum(len(string_split(text, ' ')))::DOUBLE AS tokens,
                sum(length(text))::DOUBLE AS chars,
                avg(len(string_split(text, ' '))) AS avg_tok,
                max(len(string_split(text, ' ')))::DOUBLE AS max_tok,
                1.0 - count(DISTINCT text)::DOUBLE / count(*) AS dup
              FROM base),
      voc AS (SELECT count(*)::DOUBLE AS v FROM (
                SELECT DISTINCT unnest(string_split_regex(lower(text),
                  '[^a-z]+')) AS t FROM base) WHERE length(t) > 0),
      lp AS (SELECT count(*)::DOUBLE AS c FROM base GROUP BY lang),
      le AS (SELECT -sum(p * log2(p)) AS e FROM (
               SELECT c / (SELECT sum(c) FROM lp) AS p FROM lp)),
      sp AS (SELECT count(*)::DOUBLE AS c FROM base GROUP BY source),
      ts AS (SELECT max(c / (SELECT sum(c) FROM sp)) AS s FROM sp)
      SELECT metric, round(value, 6) AS value FROM (
        SELECT 'docs' AS metric, docs AS value FROM mom
        UNION ALL SELECT 'tokens', tokens FROM mom
        UNION ALL SELECT 'chars', chars FROM mom
        UNION ALL SELECT 'avg_doc_tokens', avg_tok FROM mom
        UNION ALL SELECT 'max_doc_tokens', max_tok FROM mom
        UNION ALL SELECT 'dup_text_rate', dup FROM mom
        UNION ALL SELECT 'vocab_size', v FROM voc
        UNION ALL SELECT 'lang_entropy_bits', e FROM le
        UNION ALL SELECT 'top_source_share', s FROM ts)
      ORDER BY metric"""))

  /** Cox proportional hazards on the q150 time-to-first-big-purchase
    * frame: hazard of converting vs log average event value, 2 fixed
    * Newton rounds, Breslow ties — the oracle replays both rounds'
    * risk-set suffix sums and score/information rollups. */
  private val q310 = Entry(
    "q310_cox_ph",
    (s, d) => {
      val ev = Tables.events(s, d)
      val hit = when(col("event_type") === "purchase" &&
        col("value") > 200, col("ts"))
      val surv = ev.groupBy("user_id")
        .agg(min(hit).as("__hit"), min(col("ts")).as("__first"),
          max(col("ts")).as("__last"), avg(col("value")).as("__avgv"))
        .select(
          when(col("__hit").isNotNull,
            datediff(to_date(col("__hit")), to_date(col("__first"))))
            .otherwise(
              datediff(to_date(col("__last")), to_date(col("__first"))))
            .as("dur"),
          when(col("__hit").isNotNull, lit(1)).otherwise(lit(0)).as("ev"),
          log1p(col("__avgv")).as("x"))
      graft.ops.Survival.coxPH(surv, "dur", "ev", "x", iterations = 2)
        .select(col("n"), col("n_events"), r6(col("beta")).as("beta"),
          r6(col("hazard_ratio")).as("hazard_ratio"),
          r6(col("se")).as("se"), r6(col("z")).as("z"),
          col("iterations"))
    },
    Some("""
      WITH s AS (
        SELECT CASE WHEN min(ts) FILTER (event_type = 'purchase' AND "value" > 200) IS NOT NULL
               THEN datediff('day', min(ts)::DATE,
                 (min(ts) FILTER (event_type = 'purchase' AND "value" > 200))::DATE)
               ELSE datediff('day', min(ts)::DATE, max(ts)::DATE) END AS dur0,
          CASE WHEN min(ts) FILTER (event_type = 'purchase' AND "value" > 200) IS NOT NULL
               THEN 1.0 ELSE 0.0 END AS ev,
          ln(1 + avg("value")) AS x
        FROM events GROUP BY user_id),
      sv AS (SELECT dur0::DOUBLE AS dur, ev, x FROM s
             WHERE x IS NOT NULL AND dur0 IS NOT NULL),
      i0 AS (SELECT 0.0 AS b0),
      p1 AS (SELECT dur, sum(ev) AS d, sum(ev * x) AS sxe,
               sum(exp(b0 * x)) AS w0, sum(x * exp(b0 * x)) AS w1,
               sum(x * x * exp(b0 * x)) AS w2
             FROM sv, i0 GROUP BY dur),
      r1 AS (SELECT d, sxe,
               sum(w0) OVER (ORDER BY dur ROWS BETWEEN CURRENT ROW
                 AND UNBOUNDED FOLLOWING) AS s0,
               sum(w1) OVER (ORDER BY dur ROWS BETWEEN CURRENT ROW
                 AND UNBOUNDED FOLLOWING) AS s1,
               sum(w2) OVER (ORDER BY dur ROWS BETWEEN CURRENT ROW
                 AND UNBOUNDED FOLLOWING) AS s2
             FROM p1),
      u1 AS (SELECT sum(sxe - d * s1 / s0) FILTER (d > 0) AS u,
                    sum(d * (s2 / s0 - (s1 / s0) * (s1 / s0)))
                      FILTER (d > 0) AS i
             FROM r1),
      i1 AS (SELECT b0 + u / i AS b0 FROM u1, i0),
      p2 AS (SELECT dur, sum(ev) AS d, sum(ev * x) AS sxe,
               sum(exp(b0 * x)) AS w0, sum(x * exp(b0 * x)) AS w1,
               sum(x * x * exp(b0 * x)) AS w2
             FROM sv, i1 GROUP BY dur),
      r2 AS (SELECT d, sxe,
               sum(w0) OVER (ORDER BY dur ROWS BETWEEN CURRENT ROW
                 AND UNBOUNDED FOLLOWING) AS s0,
               sum(w1) OVER (ORDER BY dur ROWS BETWEEN CURRENT ROW
                 AND UNBOUNDED FOLLOWING) AS s1,
               sum(w2) OVER (ORDER BY dur ROWS BETWEEN CURRENT ROW
                 AND UNBOUNDED FOLLOWING) AS s2
             FROM p2),
      u2 AS (SELECT sum(sxe - d * s1 / s0) FILTER (d > 0) AS u,
                    sum(d * (s2 / s0 - (s1 / s0) * (s1 / s0)))
                      FILTER (d > 0) AS i
             FROM r2),
      i2 AS (SELECT b0 + u / i AS b0 FROM u2, i1),
      t AS (SELECT count(*) AS n, sum(ev) AS ne FROM sv)
      SELECT t.n::BIGINT AS n, t.ne::BIGINT AS n_events,
             round(i2.b0, 6) AS beta, round(exp(i2.b0), 6) AS hazard_ratio,
             round(1 / sqrt(u2.i), 6) AS se,
             round(i2.b0 * sqrt(u2.i), 6) AS z, 2 AS iterations
      FROM i2, u2, t"""))

  /** Bartlett's variance-homogeneity test across the five event
    * types — the parametric twin of the q254-family Levene check. */
  private val q311 = Entry(
    "q311_bartlett",
    (s, d) =>
      graft.analysis.AnalysisPlanner
        .bartlettTest(Tables.events(s, d), "event_type", "value")
        .select(col("n"), col("n_groups"), col("dof"),
          r6(col("pooled_var")).as("pooled_var"),
          r6(col("chi2")).as("chi2")),
    Some("""
      WITH d AS (SELECT event_type AS g, "value"::DOUBLE AS v
                 FROM events
                 WHERE "value" IS NOT NULL AND event_type IS NOT NULL),
      per AS (SELECT g, count(*)::DOUBLE AS n, sum(v) AS s,
                     sum(v * v) AS ss
              FROM d GROUP BY 1),
      pv AS (SELECT n, (ss - s * s / n) / (n - 1) AS var
             FROM per WHERE n >= 2),
      a AS (SELECT sum(n) AS nn, count(*)::DOUBLE AS k,
                   sum((n - 1) * var) AS sw, sum((n - 1) * ln(var)) AS slog,
                   sum(1 / (n - 1)) AS sinv
            FROM pv)
      SELECT nn::BIGINT AS n, k::BIGINT AS n_groups,
             (k - 1)::BIGINT AS dof,
             round(sw / (nn - k), 6) AS pooled_var,
             round(((nn - k) * ln(sw / (nn - k)) - slog) /
               (1 + (sinv - 1 / (nn - k)) / (3 * (k - 1))), 6) AS chi2
      FROM a"""))

  /** Friedman repeated-measures rank test: do the event types rank
    * differently WITHIN each user? Complete blocks only, midranks,
    * tie-robust Conover form. */
  private val q312 = Entry(
    "q312_friedman",
    (s, d) =>
      graft.analysis.AnalysisPlanner
        .friedmanTest(Tables.events(s, d), "user_id", "event_type",
          "value")
        .select(col("n_blocks"), col("n_treatments"), col("dof"),
          r6(col("chi2")).as("chi2")),
    Some("""
      WITH cells AS (SELECT user_id AS b, event_type AS t,
                            avg("value") AS m
                     FROM events
                     WHERE "value" IS NOT NULL AND event_type IS NOT NULL
                     GROUP BY 1, 2),
      k AS (SELECT count(DISTINCT t)::DOUBLE AS k FROM cells),
      keep AS (SELECT b FROM cells GROUP BY b
               HAVING count(*) = (SELECT k FROM k)),
      kept AS (SELECT c.* FROM cells c JOIN keep USING (b)),
      r AS (SELECT b, t,
              rank() OVER (PARTITION BY b ORDER BY m) - 1
                + (count(*) OVER (PARTITION BY b, m) + 1) / 2.0 AS r
            FROM kept),
      perT AS (SELECT t, sum(r) AS rj, sum(r * r) AS rj2,
                      count(*)::DOUBLE AS nb
               FROM r GROUP BY 1),
      a AS (SELECT max(nb) AS n, count(*)::DOUBLE AS kk,
                   sum(rj2) AS a2,
                   sum((rj - nb * (k.k + 1) / 2)
                     * (rj - nb * (k.k + 1) / 2)) AS sq
            FROM perT, k)
      SELECT n::BIGINT AS n_blocks, kk::BIGINT AS n_treatments,
             (kk - 1)::BIGINT AS dof,
             round((kk - 1) * sq /
               (a2 - n * kk * (kk + 1) * (kk + 1) / 4), 6) AS chi2
      FROM a"""))

  /** Grubbs extreme-studentized-deviate per event type: the single
    * most aberrant value in each stream, G = max|x−x̄|/s. */
  private val q313 = Entry(
    "q313_grubbs",
    (s, d) =>
      graft.analysis.AnalysisPlanner
        .grubbsTest(Tables.events(s, d), "event_type", "value")
        .select(col("group"), col("n"), r6(col("mean")).as("mean"),
          r6(col("std")).as("std"),
          r6(col("extreme_value")).as("extreme_value"),
          r6(col("g_stat")).as("g_stat"))
        .orderBy("group"),
    Some("""
      WITH d AS (SELECT event_type AS g, "value"::DOUBLE AS v
                 FROM events
                 WHERE "value" IS NOT NULL AND event_type IS NOT NULL),
      per AS (SELECT g, count(*)::DOUBLE AS n, avg(v) AS mu,
                     stddev_samp(v) AS sd, min(v) AS lo, max(v) AS hi
              FROM d GROUP BY 1)
      SELECT g AS "group", n::BIGINT AS n, round(mu, 6) AS mean,
             round(sd, 6) AS std,
             round(CASE WHEN mu - lo >= hi - mu THEN lo ELSE hi END, 6)
               AS extreme_value,
             round(greatest(mu - lo, hi - mu) / sd, 6) AS g_stat
      FROM per WHERE n >= 3 AND sd > 0 ORDER BY g"""))

  /** Youden-J optimal cut on the q142 scored-orders frame: the
    * threshold maximizing sensitivity + specificity − 1, with its
    * full operating point; smallest threshold wins exact J ties. */
  private val q314 = Entry(
    "q314_youden_threshold",
    (s, d) =>
      graft.ops.Evaluation
        .optimalThreshold(scoredOrders(s, d), "label", "score")
        .select(col("n"), col("n_pos"), r6(col("threshold")).as("threshold"),
          r6(col("sensitivity")).as("sensitivity"),
          r6(col("specificity")).as("specificity"),
          r6(col("j_stat")).as("j_stat"), r6(col("accuracy")).as("accuracy")),
    Some(s"""
      WITH $scoredOrdersSql,
      v AS (SELECT p, sum(y) AS pos, count(*)::DOUBLE AS tot
            FROM sc GROUP BY 1),
      w AS (SELECT p, pos, tot,
              coalesce(sum(pos) OVER (ORDER BY p DESC ROWS BETWEEN
                UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pab,
              coalesce(sum(tot) OVER (ORDER BY p DESC ROWS BETWEEN
                UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tab
            FROM v),
      t AS (SELECT sum(y) AS np, count(*)::DOUBLE AS nn FROM sc),
      s2 AS (SELECT p AS t0, np, nn, (pab + pos) / np AS sens,
                    1 - (tab + tot - pab - pos) / (nn - np) AS spec,
                    (pab + pos + nn - np - (tab + tot - pab - pos)) / nn
                      AS acc
             FROM w, t),
      b AS (SELECT * FROM s2
            ORDER BY sens + spec - 1 DESC, t0 ASC LIMIT 1)
      SELECT nn::BIGINT AS n, np::BIGINT AS n_pos,
             round(t0, 6) AS threshold, round(sens, 6) AS sensitivity,
             round(spec, 6) AS specificity,
             round(sens + spec - 1, 6) AS j_stat, round(acc, 6) AS accuracy
      FROM b"""))

  /** Page–Hinkley sequential mean-shift monitor per event type over
    * the daily mean value series: when would an online detector with
    * slack δ=0.05, fence λ=2 have fired? */
  private val q315 = Entry(
    "q315_page_hinkley",
    (s, d) =>
      graft.ops.TimeSeries
        .pageHinkley(Tables.events(s, d), Seq("event_type"), "ts",
          "value", delta = 0.05, lambda = 2.0)
        .select(col("event_type"), col("n_days"), col("n_alarm_days"),
          col("first_alarm_date"), r6(col("max_ph")).as("max_ph"))
        .orderBy("event_type"),
    Some("""
      WITH daily AS (SELECT event_type AS g, ts::DATE AS d,
                            avg("value") AS x
                     FROM events
                     WHERE "value" IS NOT NULL AND ts IS NOT NULL
                     GROUP BY 1, 2),
      m1 AS (SELECT g, d, x, avg(x) OVER (PARTITION BY g ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rm
             FROM daily),
      m2 AS (SELECT g, d, sum(x - rm - 0.05) OVER (PARTITION BY g
               ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND
               CURRENT ROW) AS m
             FROM m1),
      m3 AS (SELECT g, d, m - min(m) OVER (PARTITION BY g ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gap
             FROM m2)
      SELECT g AS event_type, count(*) AS n_days,
             sum(CASE WHEN gap > 2.0 THEN 1 ELSE 0 END)::BIGINT
               AS n_alarm_days,
             min(CASE WHEN gap > 2.0 THEN d END) AS first_alarm_date,
             round(max(gap), 6) AS max_ph
      FROM m3 GROUP BY 1 ORDER BY 1"""))

  /** Dunning log-likelihood keyness: the 30 terms most
    * characteristic of the English sub-corpus vs the rest — the
    * training-mixture "what is this slice actually about" audit. */
  private val q316 = Entry(
    "q316_keyness",
    (s, d) =>
      graft.ops.TextAnalysis
        .keyness(Tables.documents(s, d), "text", col("lang") === "en",
          k = 30, minCount = 5)
        .select(col("term"), col("n_focus"), col("n_reference"),
          r6(col("keyness")).as("keyness")),
    Some("""
      WITH toks AS (SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END
                      AS f,
                    unnest(string_split_regex(lower(text), '[^a-z]+'))
                      AS t
                    FROM documents),
      tk AS (SELECT f, t FROM toks WHERE length(t) > 0),
      per AS (SELECT t, sum(f) AS a, sum(1 - f) AS b FROM tk
              GROUP BY 1 HAVING sum(f) + sum(1 - f) >= 5),
      tot AS (SELECT sum(a) AS na, sum(b) AS nb FROM per),
      g AS (SELECT t, a, b,
              2 * (CASE WHEN a > 0
                     THEN a * ln(a / ((a + b) * na / (na + nb)))
                     ELSE 0 END +
                   CASE WHEN b > 0
                     THEN b * ln(b / ((a + b) * nb / (na + nb)))
                     ELSE 0 END) AS g2,
              CASE WHEN a / na >= b / nb THEN 1.0 ELSE -1.0 END AS sgn
            FROM per, tot)
      SELECT t AS term, a::BIGINT AS n_focus, b::BIGINT AS n_reference,
             round(sgn * g2, 6) AS keyness
      FROM g ORDER BY g2 DESC, t ASC LIMIT 30"""))

  /** Newman modularity of the nation partition over the
    * customer–supplier co-order graph: does trading stay within
    * nations more than a random graph would? */
  private val q317 = Entry(
    "q317_modularity",
    (s, d) => {
      val labels = Tables.customer(s, d)
        .select(concat(lit("c"), col("c_custkey")).as("node"),
          col("c_nationkey").as("community"))
        .unionByName(Tables.supplier(s, d)
          .select(concat(lit("s"), col("s_suppkey")).as("node"),
            col("s_nationkey").as("community")))
      graft.ops.Graph.modularity(custSuppEdges(s, d), "src", "dst",
          labels, "node", "community")
        .select(col("n_nodes"), col("n_edges"), col("n_communities"),
          r6(col("modularity")).as("modularity"))
    },
    Some("""
      WITH ed AS (SELECT DISTINCT 'c' || o_custkey AS a,
                         's' || l_suppkey AS b
                  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      ca AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
             FROM ed WHERE a <> b),
      lab AS (SELECT 'c' || c_custkey AS n, c_nationkey AS l
              FROM customer
              UNION ALL
              SELECT 's' || s_suppkey, s_nationkey FROM supplier),
      m AS (SELECT count(*)::DOUBLE AS m FROM ca),
      win AS (SELECT lu.l, count(*)::DOUBLE AS ec
              FROM ca JOIN lab lu ON ca.u = lu.n
                      JOIN lab lv ON ca.v = lv.n
              WHERE lu.l = lv.l GROUP BY 1),
      deg AS (SELECT n, count(*)::DOUBLE AS d0
              FROM (SELECT u AS n FROM ca UNION ALL SELECT v FROM ca)
              GROUP BY 1),
      nn AS (SELECT count(*) AS nn FROM deg),
      perc AS (SELECT l.l AS l, sum(deg.d0) AS dc
               FROM deg JOIN lab l ON deg.n = l.n GROUP BY 1),
      q AS (SELECT sum(coalesce(w.ec, 0) / m.m -
                       (p.dc / (2 * m.m)) * (p.dc / (2 * m.m))) AS q,
                   count(*) AS k
            FROM perc p LEFT JOIN win w ON p.l = w.l, m)
      SELECT nn.nn::BIGINT AS n_nodes, m.m::BIGINT AS n_edges,
             q.k AS n_communities, round(q.q, 6) AS modularity
      FROM nn, m, q"""))

  /** Bradley–Terry preference strengths over supplier nations (a
    * fixed 25-item pool at ANY scale): within each order the pricier
    * line's supplier nation "beats" the cheaper line's; 3 MM rounds
    * replayed in full by the oracle. */
  private val q318 = Entry(
    "q318_bradley_terry",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .join(Tables.supplier(s, d),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("l_orderkey").as("ok"),
          col("s_nationkey").cast("string").as("m"),
          col("l_extendedprice").as("p"))
      val prefs = li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.m") =!= col("b.m") &&
            col("a.p") > col("b.p"))
        .select(col("a.m").as("winner"), col("b.m").as("loser"))
      graft.ops.Labeling.bradleyTerry(prefs, "winner", "loser",
          iterations = 3)
        .select(col("item"), r6(col("score")).as("score"), col("wins"),
          col("games"))
        .orderBy("item")
    },
    Some("""
      WITH li AS (SELECT l_orderkey AS ok, s_nationkey::VARCHAR AS m,
                         l_extendedprice AS p
                  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey),
      pr AS (SELECT a.m AS w, b.m AS l FROM li a JOIN li b
             ON a.ok = b.ok AND a.m <> b.m AND a.p > b.p),
      wc AS (SELECT w, l, count(*)::DOUBLE AS c FROM pr GROUP BY 1, 2),
      items AS (SELECT DISTINCT i FROM
                 (SELECT w AS i FROM wc UNION SELECT l FROM wc)),
      k AS (SELECT count(*)::DOUBLE AS k FROM items),
      games AS (SELECT i, j, sum(c) AS n FROM (
                  SELECT w AS i, l AS j, c FROM wc
                  UNION ALL SELECT l, w, c FROM wc)
                GROUP BY 1, 2),
      ws AS (SELECT w AS i, sum(c) AS wi FROM wc GROUP BY 1),
      w0 AS (SELECT i, 1.0 AS w FROM items),
      d1 AS (SELECT g.i, sum(g.n / (wa.w + wb.w)) AS den
             FROM games g JOIN w0 wa ON g.i = wa.i
                          JOIN w0 wb ON g.j = wb.i GROUP BY 1),
      u1 AS (SELECT d1.i, coalesce(ws.wi, 0) / d1.den AS w
             FROM d1 LEFT JOIN ws ON d1.i = ws.i),
      s1 AS (SELECT sum(w) AS s FROM u1),
      w1 AS (SELECT i, u1.w * k.k / s1.s AS w FROM u1, k, s1),
      d2 AS (SELECT g.i, sum(g.n / (wa.w + wb.w)) AS den
             FROM games g JOIN w1 wa ON g.i = wa.i
                          JOIN w1 wb ON g.j = wb.i GROUP BY 1),
      u2 AS (SELECT d2.i, coalesce(ws.wi, 0) / d2.den AS w
             FROM d2 LEFT JOIN ws ON d2.i = ws.i),
      s2 AS (SELECT sum(w) AS s FROM u2),
      w2 AS (SELECT i, u2.w * k.k / s2.s AS w FROM u2, k, s2),
      d3 AS (SELECT g.i, sum(g.n / (wa.w + wb.w)) AS den
             FROM games g JOIN w2 wa ON g.i = wa.i
                          JOIN w2 wb ON g.j = wb.i GROUP BY 1),
      u3 AS (SELECT d3.i, coalesce(ws.wi, 0) / d3.den AS w
             FROM d3 LEFT JOIN ws ON d3.i = ws.i),
      s3 AS (SELECT sum(w) AS s FROM u3),
      w3 AS (SELECT i, u3.w * k.k / s3.s AS w FROM u3, k, s3),
      gt AS (SELECT i, sum(n) AS gs FROM games GROUP BY 1)
      SELECT w3.i AS item, round(w3.w, 6) AS score,
             coalesce(ws.wi, 0)::BIGINT AS wins, gt.gs::BIGINT AS games
      FROM w3 LEFT JOIN ws ON w3.i = ws.i JOIN gt ON w3.i = gt.i
      ORDER BY item"""))

  /** Platt scaling of the q142 scored-orders frame: fit σ(a·s+b) by
    * the q275 fixed-Newton contract, then compare expected
    * calibration error raw vs calibrated from ONE binned cell
    * frame — the oracle replays all four Newton rounds. */
  private val q319 = Entry(
    "q319_platt_scaling",
    (s, d) =>
      graft.ops.Evaluation
        .plattScaling(scoredOrders(s, d), "label", "score",
          iterations = 4, bins = 10)
        .select(col("n"), r6(col("a")).as("a"), r6(col("b")).as("b"),
          r6(col("ece_raw")).as("ece_raw"),
          r6(col("ece_platt")).as("ece_platt"), col("iterations")),
    Some(s"""
      WITH $scoredOrdersSql,
      i0 AS (SELECT 0.0 AS b0, 0.0 AS b1),
      s1 AS (SELECT sum(w) AS h00, sum(w * p) AS h01,
                    sum(w * p * p) AS h11, sum(y - mu) AS g0,
                    sum(p * (y - mu)) AS g1
             FROM (SELECT p, y, mu, mu * (1 - mu) AS w
                   FROM (SELECT p, y,
                           1 / (1 + exp(-(b0 + b1 * p))) AS mu
                         FROM sc, i0))),
      i1 AS (SELECT b0 + (h11 * g0 - h01 * g1)
                      / (h00 * h11 - h01 * h01) AS b0,
                    b1 + (h00 * g1 - h01 * g0)
                      / (h00 * h11 - h01 * h01) AS b1
             FROM s1, i0),
      s2 AS (SELECT sum(w) AS h00, sum(w * p) AS h01,
                    sum(w * p * p) AS h11, sum(y - mu) AS g0,
                    sum(p * (y - mu)) AS g1
             FROM (SELECT p, y, mu, mu * (1 - mu) AS w
                   FROM (SELECT p, y,
                           1 / (1 + exp(-(b0 + b1 * p))) AS mu
                         FROM sc, i1))),
      i2 AS (SELECT b0 + (h11 * g0 - h01 * g1)
                      / (h00 * h11 - h01 * h01) AS b0,
                    b1 + (h00 * g1 - h01 * g0)
                      / (h00 * h11 - h01 * h01) AS b1
             FROM s2, i1),
      s3 AS (SELECT sum(w) AS h00, sum(w * p) AS h01,
                    sum(w * p * p) AS h11, sum(y - mu) AS g0,
                    sum(p * (y - mu)) AS g1
             FROM (SELECT p, y, mu, mu * (1 - mu) AS w
                   FROM (SELECT p, y,
                           1 / (1 + exp(-(b0 + b1 * p))) AS mu
                         FROM sc, i2))),
      i3 AS (SELECT b0 + (h11 * g0 - h01 * g1)
                      / (h00 * h11 - h01 * h01) AS b0,
                    b1 + (h00 * g1 - h01 * g0)
                      / (h00 * h11 - h01 * h01) AS b1
             FROM s3, i2),
      s4 AS (SELECT sum(w) AS h00, sum(w * p) AS h01,
                    sum(w * p * p) AS h11, sum(y - mu) AS g0,
                    sum(p * (y - mu)) AS g1
             FROM (SELECT p, y, mu, mu * (1 - mu) AS w
                   FROM (SELECT p, y,
                           1 / (1 + exp(-(b0 + b1 * p))) AS mu
                         FROM sc, i3))),
      i4 AS (SELECT b0 + (h11 * g0 - h01 * g1)
                      / (h00 * h11 - h01 * h01) AS b0,
                    b1 + (h00 * g1 - h01 * g0)
                      / (h00 * h11 - h01 * h01) AS b1
             FROM s4, i3),
      cal AS (SELECT y, least(greatest(p, 0), 1) AS praw,
                     1 / (1 + exp(-(b0 + b1 * p))) AS pcal
              FROM sc, i4),
      cells AS (SELECT least(floor(praw * 10), 9)::BIGINT AS br,
                       least(floor(pcal * 10), 9)::BIGINT AS bc,
                       count(*)::DOUBLE AS n, sum(y) AS sy,
                       sum(praw) AS sr, sum(pcal) AS sc2
                FROM cal GROUP BY 1, 2),
      t AS (SELECT sum(n) AS nn FROM cells),
      er AS (SELECT sum(bn / t.nn * abs(by2 / bn - bp / bn)) AS ece
             FROM (SELECT br, sum(n) AS bn, sum(sy) AS by2,
                          sum(sr) AS bp
                   FROM cells GROUP BY 1), t),
      ec AS (SELECT sum(bn / t.nn * abs(by2 / bn - bp / bn)) AS ece
             FROM (SELECT bc, sum(n) AS bn, sum(sy) AS by2,
                          sum(sc2) AS bp
                   FROM cells GROUP BY 1), t)
      SELECT t.nn::BIGINT AS n, round(i4.b1, 6) AS a,
             round(i4.b0, 6) AS b, round(er.ece, 6) AS ece_raw,
             round(ec.ece, 6) AS ece_platt, 4 AS iterations
      FROM t, i4, er, ec"""))

  /** Lilliefors normality screen per event type: KS distance of the
    * value distribution from the normal fitted to each group's own
    * moments, with the identical A&S-7.1.26 CDF algebra replayed by
    * the oracle. */
  private val q320 = Entry(
    "q320_lilliefors",
    (s, d) =>
      graft.analysis.AnalysisPlanner
        .lillieforsTest(Tables.events(s, d), "event_type", "value")
        .select(col("group"), col("n"), r6(col("mean")).as("mean"),
          r6(col("std")).as("std"), r6(col("d_stat")).as("d_stat"),
          r6(col("sqrt_n_d")).as("sqrt_n_d"))
        .orderBy("group"),
    Some("""
      WITH d AS (SELECT event_type AS g, "value"::DOUBLE AS v
                 FROM events
                 WHERE "value" IS NOT NULL AND event_type IS NOT NULL),
      mo AS (SELECT g, count(*)::DOUBLE AS n, avg(v) AS mu,
                    stddev_samp(v) AS sd
             FROM d GROUP BY 1
             HAVING count(*) >= 4 AND stddev_samp(v) > 0),
      vc AS (SELECT g, v, count(*)::DOUBLE AS c FROM d GROUP BY 1, 2),
      w AS (SELECT g, v, c,
              coalesce(sum(c) OVER (PARTITION BY g ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS ex
            FROM vc),
      z0 AS (SELECT w.g, w.c, w.ex, mo.n, mo.mu, mo.sd,
                    (w.v - mo.mu) / mo.sd AS z
             FROM w JOIN mo ON w.g = mo.g),
      z1 AS (SELECT g, c, ex, n, mu, sd, z, abs(z) / sqrt(2) AS x,
                    1 / (1 + 0.3275911 * (abs(z) / sqrt(2))) AS t
             FROM z0),
      ph AS (SELECT g, c, ex, n, mu, sd,
               0.5 * (1 + CASE WHEN z >= 0 THEN 1.0 ELSE -1.0 END *
                 (1 - ((((1.061405429 * t - 1.453152027) * t
                         + 1.421413741) * t - 0.284496736) * t
                        + 0.254829592) * t * exp(-x * x))) AS phi
             FROM z1),
      dd AS (SELECT g, n, mu, sd,
               greatest(abs((ex + c) / n - phi), abs(phi - ex / n)) AS dv
             FROM ph)
      SELECT g AS "group", max(n)::BIGINT AS n, round(max(mu), 6) AS mean,
             round(max(sd), 6) AS std, round(max(dv), 6) AS d_stat,
             round(sqrt(max(n)) * max(dv), 6) AS sqrt_n_d
      FROM dd GROUP BY g ORDER BY g"""))

  /** Clustering-quality report for the labeled embedding set:
    * Calinski–Harabasz variance ratio and Davies–Bouldin index of
    * the 10-label partition, from one sufficient-stats scan. */
  private val q321 = Entry(
    "q321_cluster_quality",
    (s, d) =>
      graft.ops.Similarity
        .partitionQuality(Tables.embeddings(s, d), "embedding", "label")
        .select(col("n"), col("n_clusters"), col("dims"),
          r6(col("ch_index")).as("ch_index"),
          r6(col("db_index")).as("db_index")),
    Some("""
      WITH e AS (SELECT label AS l, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings
                 WHERE embedding IS NOT NULL AND label IS NOT NULL),
      cell AS (SELECT l, i - 1 AS d, count(*)::DOUBLE AS c,
                      sum(v[i]) AS s, sum(v[i] * v[i]) AS ss
               FROM e, range(1, 65) t(i) GROUP BY 1, 2),
      gl AS (SELECT d, sum(s) AS gs, sum(c) AS gc FROM cell
             GROUP BY 1),
      perl AS (SELECT l, sum(ss - s * s / c) AS w, max(c) AS n
               FROM cell GROUP BY 1),
      tot AS (SELECT sum(n) AS nn, count(*)::DOUBLE AS k,
                     sum(w) AS tw
              FROM perl),
      bb AS (SELECT sum(c * (s / c - gs / gc) * (s / c - gs / gc)) AS b
             FROM cell JOIN gl USING (d)),
      dims AS (SELECT count(DISTINCT d) AS dims FROM cell),
      pr AS (SELECT a.l AS i, b.l AS j,
                    sqrt(sum((a.s / a.c - b.s / b.c)
                           * (a.s / a.c - b.s / b.c))) AS m
             FROM cell a JOIN cell b ON a.d = b.d AND a.l < b.l
             GROUP BY 1, 2),
      sym AS (SELECT i, j, m FROM pr UNION ALL SELECT j, i, m FROM pr),
      si AS (SELECT l, sqrt(w / n) AS si FROM perl),
      rt AS (SELECT sym.i, max((s1.si + s2.si) / sym.m) AS r
             FROM sym JOIN si s1 ON sym.i = s1.l
                      JOIN si s2 ON sym.j = s2.l
             GROUP BY 1),
      db AS (SELECT avg(r) AS db FROM rt)
      SELECT tot.nn::BIGINT AS n, tot.k::BIGINT AS n_clusters,
             dims.dims AS dims,
             round((bb.b / (tot.k - 1)) /
                   (tot.tw / (tot.nn - tot.k)), 6) AS ch_index,
             round(db.db, 6) AS db_index
      FROM tot, bb, dims, db"""))

  /** Two-sample energy distance on event values by user parity —
    * the distance-weighted companion to q10 (KS) and q301 (CvM),
    * fully prefix-sum shaped. */
  private val q322 = Entry(
    "q322_energy_distance",
    (s, d) =>
      graft.analysis.AnalysisPlanner
        .energyDistance(Tables.events(s, d), "value",
          col("user_id") % 2 === 0)
        .select(col("n_a"), col("n_b"),
          r6(col("e_dist_sq")).as("e_dist_sq"),
          r6(col("e_dist")).as("e_dist")),
    Some("""
      WITH d AS (SELECT "value"::DOUBLE AS v,
                   CASE WHEN user_id % 2 = 0 THEN 1.0 ELSE 0.0 END AS a
                 FROM events WHERE "value" IS NOT NULL),
      g AS (SELECT v, sum(a) AS ca, sum(1 - a) AS cb,
                   sum(a * v) AS sa, sum((1 - a) * v) AS sb
            FROM d GROUP BY 1),
      w AS (SELECT v, ca, cb, sa, sb,
              coalesce(sum(ca) OVER win, 0) AS pca,
              coalesce(sum(cb) OVER win, 0) AS pcb,
              coalesce(sum(sa) OVER win, 0) AS psa,
              coalesce(sum(sb) OVER win, 0) AS psb
            FROM g WINDOW win AS (ORDER BY v ROWS BETWEEN UNBOUNDED
              PRECEDING AND 1 PRECEDING)),
      t AS (SELECT sum(ca) AS na, sum(cb) AS nb, sum(sa) AS ta,
                   sum(sb) AS tb
            FROM g),
      r AS (SELECT
              sum(ca * (pcb * v - psb + (tb - psb - cb * v)
                - (nb - pcb - cb) * v)) AS dab,
              sum(ca * (pca * v - psa + (ta - psa - ca * v)
                - (na - pca - ca) * v)) AS daa,
              sum(cb * (pcb * v - psb + (tb - psb - cb * v)
                - (nb - pcb - cb) * v)) AS dbb,
              max(na) AS na, max(nb) AS nb
            FROM w, t)
      SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b,
             round(2 * dab / (na * nb) - daa / (na * na)
               - dbb / (nb * nb), 6) AS e_dist_sq,
             round(sqrt(greatest(2 * dab / (na * nb) - daa / (na * na)
               - dbb / (nb * nb), 0)), 6) AS e_dist
      FROM r"""))

  /** Jonckheere–Terpstra ordered-trend test across the five event
    * types (ascending type order): are values stochastically
    * increasing along the ordering? */
  private val q323 = Entry(
    "q323_jonckheere",
    (s, d) =>
      graft.analysis.AnalysisPlanner
        .jonckheereTerpstraFromCells(eventTypeValueCells(s, d))
        .select(col("n"), col("n_groups"),
          r6(col("jt_stat")).as("jt_stat"), r6(col("jt_mean")).as("jt_mean"),
          r6(col("z")).as("z")),
    Some("""
      WITH d AS (SELECT event_type AS g, "value"::DOUBLE AS v
                 FROM events
                 WHERE "value" IS NOT NULL AND event_type IS NOT NULL),
      cells AS (SELECT v, g, count(*)::DOUBLE AS c FROM d GROUP BY 1, 2),
      vals AS (SELECT DISTINCT v FROM cells),
      grps AS (SELECT DISTINCT g FROM cells),
      grid AS (SELECT vals.v, grps.g, coalesce(cells.c, 0) AS c
               FROM vals CROSS JOIN grps
               LEFT JOIN cells ON cells.v = vals.v AND cells.g = grps.g),
      pre AS (SELECT v, g, c,
                coalesce(sum(c) OVER (PARTITION BY g ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS below
              FROM grid),
      jt AS (SELECT coalesce(sum(h.c * (l.below + l.c / 2)), 0) AS jt
             FROM pre l JOIN pre h ON l.v = h.v AND l.g < h.g),
      mo AS (SELECT sum(ng) AS n, count(*) AS k, sum(ng * ng) AS sn2,
                    sum(ng * ng * (2 * ng + 3)) AS sn23
             FROM (SELECT g, sum(c) AS ng FROM cells GROUP BY 1))
      SELECT n::BIGINT AS n, k AS n_groups, round(jt.jt, 6) AS jt_stat,
             round((n * n - sn2) / 4, 6) AS jt_mean,
             round((jt.jt - (n * n - sn2) / 4) /
               sqrt((n * n * (2 * n + 3) - sn23) / 72), 6) AS z
      FROM jt, mo"""))

  /** Cohen's d / Hedges' g effect size of the even-vs-odd user arms
    * on event value — "significant, but is it big?". */
  private val q324 = Entry(
    "q324_cohens_d",
    (s, d) =>
      graft.analysis.AnalysisPlanner
        .cohensD(Tables.events(s, d), "value", col("user_id") % 2 === 0)
        .select(col("n_a"), col("n_b"), r6(col("mean_a")).as("mean_a"),
          r6(col("mean_b")).as("mean_b"),
          r6(col("pooled_sd")).as("pooled_sd"),
          r6(col("cohens_d")).as("cohens_d"),
          r6(col("hedges_g")).as("hedges_g")),
    Some("""
      WITH d AS (SELECT "value"::DOUBLE AS v,
                   CASE WHEN user_id % 2 = 0 THEN 1.0 ELSE 0.0 END AS a
                 FROM events WHERE "value" IS NOT NULL),
      m AS (SELECT sum(a) AS na, sum(1 - a) AS nb, sum(a * v) AS sa,
                   sum((1 - a) * v) AS sb, sum(a * v * v) AS ssa,
                   sum((1 - a) * v * v) AS ssb
            FROM d),
      f AS (SELECT na, nb, sa / na AS ma, sb / nb AS mb,
              sqrt(((ssa - sa * sa / na) + (ssb - sb * sb / nb))
                / (na + nb - 2)) AS sp
            FROM m)
      SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b,
             round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
             round(sp, 6) AS pooled_sd,
             round((ma - mb) / sp, 6) AS cohens_d,
             round((ma - mb) / sp * (1 - 3 / (4 * (na + nb) - 9)), 6)
               AS hedges_g
      FROM f"""))

  /** Source-concentration report over document mass (chars):
    * HHI, normalized HHI, Theil index, top source share — the
    * "is one source eating the corpus" audit. */
  private val q325 = Entry(
    "q325_concentration",
    (s, d) =>
      graft.ops.Profiling
        .segmentConcentration(Tables.documents(s, d), "source",
          "n_chars")
        .select(col("n_segments"), r6(col("total")).as("total"),
          r6(col("hhi")).as("hhi"),
          r6(col("hhi_normalized")).as("hhi_normalized"),
          r6(col("theil")).as("theil"),
          r6(col("top_share")).as("top_share")),
    Some("""
      WITH per AS (SELECT source AS s, sum(n_chars)::DOUBLE AS x
                   FROM documents
                   WHERE n_chars IS NOT NULL AND source IS NOT NULL
                   GROUP BY 1),
      t AS (SELECT sum(x) AS t, count(*)::DOUBLE AS k FROM per)
      SELECT k::BIGINT AS n_segments, round(t.t, 6) AS total,
             round(sum(x * x / (t.t * t.t)), 6) AS hhi,
             round((sum(x * x / (t.t * t.t)) - 1 / k) / (1 - 1 / k), 6)
               AS hhi_normalized,
             round(sum(CASE WHEN x > 0
               THEN (x / (t.t / k)) * ln(x / (t.t / k))
               ELSE 0 END) / k, 6) AS theil,
             round(max(x / t.t), 6) AS top_share
      FROM per, t GROUP BY k, t.t"""))

  /** Exact 10% symmetric trimmed mean per event type, fractional
    * boundary weights — the robust location readout between mean
    * and median. */
  private val q326 = Entry(
    "q326_trimmed_mean",
    (s, d) =>
      graft.analysis.AnalysisPlanner
        .trimmedMean(Tables.events(s, d), "event_type", "value", 0.1)
        .select(col("group"), col("n"), r6(col("mean")).as("mean"),
          r6(col("trimmed_mean")).as("trimmed_mean"), col("trim"))
        .orderBy("group"),
    Some("""
      WITH d AS (SELECT event_type AS g, "value"::DOUBLE AS v
                 FROM events
                 WHERE "value" IS NOT NULL AND event_type IS NOT NULL),
      cells AS (SELECT g, v, count(*)::DOUBLE AS c FROM d GROUP BY 1, 2),
      pre AS (SELECT g, v, c,
                coalesce(sum(c) OVER (PARTITION BY g ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS pc
              FROM cells),
      tot AS (SELECT g, sum(c) AS n, sum(c * v) AS s FROM cells
              GROUP BY 1),
      k AS (SELECT pre.g, pre.v,
              greatest(0, least(pre.pc + pre.c, 0.9 * tot.n)
                - greatest(pre.pc, 0.1 * tot.n)) AS w,
              tot.n, tot.s
            FROM pre JOIN tot ON pre.g = tot.g)
      SELECT g AS "group", max(n)::BIGINT AS n,
             round(max(s) / max(n), 6) AS mean,
             round(sum(w * v) / (0.8 * max(n)), 6) AS trimmed_mean,
             0.1::DOUBLE AS trim
      FROM k GROUP BY g ORDER BY g"""))

  /** Runs (up–down) randomness test on each event type's daily mean
    * series: trending (too few runs) vs oscillating (too many). */
  private val q327 = Entry(
    "q327_runs_test",
    (s, d) =>
      graft.ops.TimeSeries
        .runsTest(Tables.events(s, d), Seq("event_type"), "ts", "value")
        .select(col("event_type"), col("n_days"), col("n_signs"),
          col("runs"), r6(col("expected_runs")).as("expected_runs"),
          r6(col("z")).as("z"))
        .orderBy("event_type"),
    Some("""
      WITH daily AS (SELECT event_type AS g, ts::DATE AS d,
                            avg("value") AS x
                     FROM events
                     WHERE "value" IS NOT NULL AND ts IS NOT NULL
                     GROUP BY 1, 2),
      sg AS (SELECT g, d,
               CASE WHEN x > lag(x) OVER w THEN 1
                    WHEN x < lag(x) OVER w THEN -1 END AS s,
               count(*) OVER (PARTITION BY g) AS nd
             FROM daily WINDOW w AS (PARTITION BY g ORDER BY d)),
      f AS (SELECT g, d, s, nd FROM sg WHERE s IS NOT NULL),
      r AS (SELECT g, max(nd) AS nd, count(*) AS ns,
              1 + coalesce(sum(CASE WHEN ps IS NOT NULL AND s <> ps
                THEN 1 ELSE 0 END), 0) AS runs
            FROM (SELECT g, s, nd,
                    lag(s) OVER (PARTITION BY g ORDER BY d) AS ps
                  FROM f)
            GROUP BY 1)
      SELECT g AS event_type, nd::BIGINT AS n_days, ns::BIGINT AS n_signs,
             runs::BIGINT AS runs,
             round((2.0 * (ns + 1) - 1) / 3, 6) AS expected_runs,
             round((runs - (2.0 * (ns + 1) - 1) / 3) /
               sqrt((16.0 * (ns + 1) - 29) / 90), 6) AS z
      FROM r ORDER BY g"""))

  /** Kuiper two-sample test on the circular hour-of-day of purchase
    * events by user parity — the cyclic-shift-invariant KS. */
  private val q328 = Entry(
    "q328_kuiper",
    (s, d) =>
      graft.analysis.AnalysisPlanner
        .kuiperTest(Tables.events(s, d)
            .where(col("event_type") === "purchase")
            .withColumn("hod", hour(col("ts"))),
          "hod", col("user_id") % 2 === 0)
        .select(col("n_a"), col("n_b"), r6(col("d_plus")).as("d_plus"),
          r6(col("d_minus")).as("d_minus"),
          r6(col("kuiper_v")).as("kuiper_v")),
    Some("""
      WITH d AS (SELECT hour(ts)::DOUBLE AS v,
                   CASE WHEN user_id % 2 = 0 THEN 1.0 ELSE 0.0 END AS a
                 FROM events
                 WHERE event_type = 'purchase' AND ts IS NOT NULL),
      g AS (SELECT v, sum(a) AS ca, count(*)::DOUBLE AS cnt
            FROM d GROUP BY 1),
      w AS (SELECT v, ca, cnt,
              coalesce(sum(ca) OVER win, 0) + ca AS fa,
              coalesce(sum(cnt) OVER win, 0) + cnt AS ft
            FROM g WINDOW win AS (ORDER BY v ROWS BETWEEN UNBOUNDED
              PRECEDING AND 1 PRECEDING)),
      t AS (SELECT sum(a) AS n1, sum(1 - a) AS n2 FROM d),
      r AS (SELECT max(n1) AS n1, max(n2) AS n2,
              greatest(max(fa / n1 - (ft - fa) / n2), 0) AS dp,
              greatest(max((ft - fa) / n2 - fa / n1), 0) AS dm
            FROM w, t)
      SELECT n1::BIGINT AS n_a, n2::BIGINT AS n_b,
             round(dp, 6) AS d_plus, round(dm, 6) AS d_minus,
             round(dp + dm, 6) AS kuiper_v
      FROM r"""))

  /** Wilcoxon signed-rank on per-user paired differences (mean
    * purchase value − mean view value): the within-subject sibling
    * of q45's Mann–Whitney. */
  private val q329 = Entry(
    "q329_wilcoxon_signed_rank",
    (s, d) => {
      val ev = Tables.events(s, d)
      val pairs = ev
        .where(col("event_type").isin("purchase", "view") &&
          col("value").isNotNull)
        .groupBy("user_id")
        .agg(avg(when(col("event_type") === "purchase", col("value")))
          .as("__p"),
          avg(when(col("event_type") === "view", col("value")))
            .as("__v"))
        .where(col("__p").isNotNull && col("__v").isNotNull)
        .select((col("__p") - col("__v")).as("diff"))
      graft.analysis.AnalysisPlanner.wilcoxonSignedRank(pairs, "diff")
        .select(col("n"), col("n_pos"), col("n_neg"),
          r6(col("w_plus")).as("w_plus"), r6(col("w_mean")).as("w_mean"),
          r6(col("z")).as("z"))
    },
    Some("""
      WITH pr AS (SELECT user_id,
                    avg("value") FILTER (event_type = 'purchase') AS p,
                    avg("value") FILTER (event_type = 'view') AS v
                  FROM events
                  WHERE event_type IN ('purchase', 'view')
                    AND "value" IS NOT NULL
                  GROUP BY 1),
      df AS (SELECT p - v AS d FROM pr
             WHERE p IS NOT NULL AND v IS NOT NULL AND p - v <> 0),
      g AS (SELECT abs(d) AS ad,
                   sum(CASE WHEN d > 0 THEN 1.0 ELSE 0.0 END) AS cp,
                   count(*)::DOUBLE AS t
            FROM df GROUP BY 1),
      w AS (SELECT ad, cp, t,
              coalesce(sum(t) OVER (ORDER BY ad ROWS BETWEEN UNBOUNDED
                PRECEDING AND 1 PRECEDING), 0) + (t + 1) / 2 AS mr
            FROM g),
      r AS (SELECT sum(t) AS n, sum(cp) AS np, sum(cp * mr) AS wp,
                   sum(t) * (sum(t) + 1) / 4 AS wm,
                   sum(t) * (sum(t) + 1) * (2 * sum(t) + 1) / 24
                     - sum(t * t * t - t) / 48 AS var
            FROM w)
      SELECT n::BIGINT AS n, np::BIGINT AS n_pos,
             (n - np)::BIGINT AS n_neg, round(wp, 6) AS w_plus,
             round(wm, 6) AS w_mean,
             round((wp - wm) / sqrt(var), 6) AS z
      FROM r"""))

  /** Granger lag-1 causality: do yesterday's click values lead
    * today's purchase values? Closed-form nested-OLS F from one
    * moments row, Cramer-3×3 replayed by the oracle. */
  private val q330 = Entry(
    "q330_granger",
    (s, d) =>
      graft.ops.TimeSeries
        .grangerCausality(Tables.events(s, d), "ts", "value",
          col("event_type") === "click", col("event_type") === "purchase")
        .select(col("n"), r6(col("beta_xlag")).as("beta_xlag"),
          r6(col("rss_restricted")).as("rss_restricted"),
          r6(col("rss_unrestricted")).as("rss_unrestricted"),
          r6(col("f_stat")).as("f_stat")),
    Some("""
      WITH daily AS (SELECT ts::DATE AS d,
                       avg("value") FILTER (event_type = 'click') AS x,
                       avg("value") FILTER (event_type = 'purchase') AS y
                     FROM events
                     WHERE "value" IS NOT NULL AND ts IS NOT NULL
                     GROUP BY 1),
      d2 AS (SELECT d, x, y FROM daily
             WHERE x IS NOT NULL AND y IS NOT NULL),
      fr AS (SELECT t.y AS y, p.y AS yl, p.x AS xl
             FROM d2 t JOIN d2 p ON t.d = p.d + INTERVAL 1 DAY),
      m AS (SELECT count(*)::DOUBLE AS n, sum(y) AS sy,
                   sum(y * y) AS syy, sum(yl) AS sl, sum(yl * yl) AS sll,
                   sum(xl) AS sx, sum(xl * xl) AS sxx,
                   sum(yl * y) AS sly, sum(xl * y) AS sxy,
                   sum(yl * xl) AS slx
            FROM fr),
      f AS (SELECT n, sy, syy, sly, sxy,
              (n * sly - sl * sy) / (n * sll - sl * sl) AS br,
              (sy - (n * sly - sl * sy) / (n * sll - sl * sl) * sl) / n
                AS ar,
              n * (sll * sxx - slx * slx) - sl * (sl * sxx - slx * sx)
                + sx * (sl * slx - sll * sx) AS det,
              sy * (sll * sxx - slx * slx)
                - sl * (sly * sxx - slx * sxy)
                + sx * (sly * slx - sll * sxy) AS da,
              n * (sly * sxx - slx * sxy) - sy * (sl * sxx - slx * sx)
                + sx * (sl * sxy - sly * sx) AS db,
              n * (sll * sxy - sly * slx) - sl * (sl * sxy - sly * sx)
                + sy * (sl * slx - sll * sx) AS dc
            FROM m),
      r AS (SELECT n, dc / det AS c, syy - ar * sy - br * sly AS rssr,
              syy - (da / det) * sy - (db / det) * sly
                - (dc / det) * sxy AS rssu
            FROM f)
      SELECT n::BIGINT AS n, round(c, 6) AS beta_xlag,
             round(rssr, 6) AS rss_restricted,
             round(rssu, 6) AS rss_unrestricted,
             round((rssr - rssu) / (rssu / (n - 3)), 6) AS f_stat
      FROM r"""))

  /** Normalized spectral entropy of q274's daily revenue series:
    * one scalar "how periodic is this" plus the dominant cycle. */
  private val q331 = Entry(
    "q331_spectral_entropy",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(datediff(to_date(col("ts")),
          lit("2024-01-01").cast("date")).as("t"))
        .agg(sum("value").as("rev"))
      graft.ops.TimeSeries.spectralEntropy(daily, "t", "rev", 10)
        .select(col("n_freqs"),
          r6(col("spectral_entropy")).as("spectral_entropy"),
          col("peak_freq"), r6(col("peak_period")).as("peak_period"),
          r6(col("peak_share")).as("peak_share"))
    },
    Some("""
      WITH daily AS (SELECT date_diff('day', DATE '2024-01-01',
                       ts::DATE)::DOUBLE AS t, sum("value") AS x
                     FROM events GROUP BY 1),
      st AS (SELECT count(*)::DOUBLE AS n, sum(x) / count(*) AS mu,
                    sum(x * x) - sum(x) * sum(x) / count(*) AS den
             FROM daily),
      k AS (SELECT unnest(generate_series(1, 10))::DOUBLE AS k),
      t AS (SELECT k.k, st.n, st.den,
                   sum((x - mu) * cos(2 * pi() * k.k * t / st.n)) AS c,
                   sum((x - mu) * sin(2 * pi() * k.k * t / st.n)) AS s
            FROM daily, st, k GROUP BY 1, 2, 3),
      pf AS (SELECT k::BIGINT AS freq, n / k AS period,
                    (c * c + s * s) / den AS pf
             FROM t),
      tp AS (SELECT sum(pf) AS tp FROM pf),
      e AS (SELECT count(*) AS nf,
              -sum(CASE WHEN pf / tp.tp > 0
                THEN (pf / tp.tp) * ln(pf / tp.tp) ELSE 0 END) / ln(10)
                AS ent
            FROM pf, tp),
      pk AS (SELECT freq, period, pf FROM pf
             ORDER BY pf DESC, freq ASC LIMIT 1)
      SELECT e.nf AS n_freqs, round(e.ent, 6) AS spectral_entropy,
             pk.freq AS peak_freq, round(pk.period, 6) AS peak_period,
             round(pk.pf / tp.tp, 6) AS peak_share
      FROM e, pk, tp"""))

  /** Cross-correlation profile clicks→purchases at lags −7..7 (the
    * q272-family full-series estimator over a day-indexed wide
    * frame) — the full lead/lag picture around q330's single-lag
    * test. */
  private val q332 = Entry(
    "q332_cross_correlation",
    (s, d) => {
      val daily = Tables.events(s, d)
        .where(col("value").isNotNull && col("ts").isNotNull)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(avg(when(col("event_type") === "click", col("value")))
          .as("x"),
          avg(when(col("event_type") === "purchase", col("value")))
            .as("y"))
        .where(col("x").isNotNull && col("y").isNotNull)
        .select(datediff(col("d"), lit("2024-01-01").cast("date"))
          .as("t"), col("x"), col("y"))
      graft.ops.Evaluation.crossCorrelation(daily, "t", "x", "y", 7)
        .select(col("lag"), col("n_pairs"), r6(col("ccf")).as("ccf"))
        .orderBy("lag")
    },
    Some("""
      WITH daily AS (SELECT ts::DATE AS d,
                       avg("value") FILTER (event_type = 'click') AS x,
                       avg("value") FILTER (event_type = 'purchase') AS y
                     FROM events
                     WHERE "value" IS NOT NULL AND ts IS NOT NULL
                     GROUP BY 1),
      d2 AS (SELECT date_diff('day', DATE '2024-01-01', d)::DOUBLE AS t,
                    x, y
             FROM daily WHERE x IS NOT NULL AND y IS NOT NULL),
      st AS (SELECT count(*)::DOUBLE AS n, sum(x) / count(*) AS mx,
                    sum(y) / count(*) AS my,
                    sqrt((sum(x * x) - sum(x) * sum(x) / count(*)) *
                         (sum(y * y) - sum(y) * sum(y) / count(*)))
                      AS den
             FROM d2),
      l AS (SELECT unnest(generate_series(-7, 7))::DOUBLE AS lag),
      j AS (SELECT l.lag, a.x, b.y
            FROM d2 a CROSS JOIN l JOIN d2 b ON a.t + l.lag = b.t)
      SELECT lag::BIGINT AS lag, count(*) AS n_pairs,
             round(sum((x - st.mx) * (y - st.my)) / max(st.den), 6)
               AS ccf
      FROM j, st GROUP BY lag ORDER BY lag"""))

  /** Engle–Granger cointegration screen clicks vs purchases: hedge
    * ratio, residual mean-reversion ρ, Dickey–Fuller t. */
  private val q333 = Entry(
    "q333_cointegration",
    (s, d) =>
      graft.ops.TimeSeries
        .cointegration(Tables.events(s, d), "ts", "value",
          col("event_type") === "click",
          col("event_type") === "purchase")
        .select(col("n"), r6(col("hedge_ratio")).as("hedge_ratio"),
          r6(col("intercept")).as("intercept"), r6(col("rho")).as("rho"),
          r6(col("df_t")).as("df_t")),
    Some("""
      WITH daily AS (SELECT ts::DATE AS d,
                       avg("value") FILTER (event_type = 'click') AS x,
                       avg("value") FILTER (event_type = 'purchase') AS y
                     FROM events
                     WHERE "value" IS NOT NULL AND ts IS NOT NULL
                     GROUP BY 1),
      d2 AS (SELECT d, x, y FROM daily
             WHERE x IS NOT NULL AND y IS NOT NULL),
      m1 AS (SELECT count(*)::DOUBLE AS n1, sum(x) AS sx1, sum(y) AS sy1,
                    sum(x * x) AS sxx1, sum(x * y) AS sxy1
             FROM d2),
      ab AS (SELECT n1,
               (n1 * sxy1 - sx1 * sy1) / (n1 * sxx1 - sx1 * sx1) AS b,
               (sy1 - (n1 * sxy1 - sx1 * sy1) / (n1 * sxx1 - sx1 * sx1)
                 * sx1) / n1 AS a
             FROM m1),
      e AS (SELECT d, y - ab.a - ab.b * x AS e2, ab.n1, ab.b, ab.a
            FROM d2, ab),
      fr AS (SELECT t.e2 - p.e2 AS de, p.e2 AS el, t.n1, t.b, t.a
             FROM e t JOIN e p ON t.d = p.d + 1),
      m2 AS (SELECT max(n1) AS n1, max(b) AS b, max(a) AS a,
                    count(*)::DOUBLE AS n2, sum(el) AS sl, sum(de) AS sd,
                    sum(el * el) AS sll, sum(el * de) AS sld,
                    sum(de * de) AS sdd
             FROM fr)
      SELECT n1::BIGINT AS n, round(b, 6) AS hedge_ratio,
             round(a, 6) AS intercept,
             round((n2 * sld - sl * sd) / (n2 * sll - sl * sl), 6) AS rho,
             round(((n2 * sld - sl * sd) / (n2 * sll - sl * sl)) /
               sqrt((sdd - sd * sd / n2
                 - ((n2 * sld - sl * sd) / (n2 * sll - sl * sl))
                   * (sld - sl * sd / n2)) / (n2 - 2)
                 / (sll - sl * sl / n2)), 6) AS df_t
      FROM m2"""))

  /** Hurst exponent (R/S) of the daily mean-value series at block
    * sizes 8/16/32 — long-memory vs mean-reversion in one number. */
  private val q334 = Entry(
    "q334_hurst",
    (s, d) =>
      graft.ops.TimeSeries
        .hurstExponent(Tables.events(s, d), "ts", "value",
          Seq(8, 16, 32))
        .select(col("n_days"), col("n_sizes"),
          r6(col("hurst")).as("hurst")),
    Some("""
      WITH daily AS (SELECT ts::DATE AS d, avg("value") AS x
                     FROM events
                     WHERE "value" IS NOT NULL AND ts IS NOT NULL
                     GROUP BY 1),
      i AS (SELECT date_diff('day', (SELECT min(d) FROM daily), d) AS i,
                   x, (SELECT count(*) FROM daily) AS nd
            FROM daily),
      grid AS (SELECT i.i, i.x, i.nd, k.k, floor(i.i / k.k) AS b
               FROM i, (SELECT unnest([8, 16, 32]) AS k) k),
      bn AS (SELECT k, b, count(*) AS bnn, avg(x) AS bm,
                    stddev_pop(x) AS bs
             FROM grid GROUP BY 1, 2),
      comp AS (SELECT g.i, g.x, g.nd, g.k, g.b, bn.bm, bn.bs
               FROM grid g JOIN bn ON g.k = bn.k AND g.b = bn.b
               WHERE bn.bnn = g.k AND bn.bs > 0),
      cum AS (SELECT k, b, nd, bs,
                sum(x - bm) OVER (PARTITION BY k, b ORDER BY i
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
              FROM comp),
      rs AS (SELECT k, b, (max(c) - min(c)) / max(bs) AS rs,
                    max(nd) AS nd
             FROM cum GROUP BY 1, 2),
      pk AS (SELECT k, avg(rs) AS mrs, max(nd) AS nd FROM rs GROUP BY 1
             HAVING avg(rs) > 0),
      f AS (SELECT max(nd) AS nd, count(*) AS ns, count(*)::DOUBLE AS m,
                   sum(ln(k)) AS slk, sum(ln(mrs)) AS slr,
                   sum(ln(k) * ln(k)) AS slkk,
                   sum(ln(k) * ln(mrs)) AS slkr
            FROM pk)
      SELECT nd::BIGINT AS n_days, ns AS n_sizes,
             round((m * slkr - slk * slr) /
               (m * slkk - slk * slk), 6) AS hurst
      FROM f"""))

  /** Pattern-mask profile of customer name/segment columns: the top
    * character-class shapes per column — the format-rule discovery
    * readout. */
  private val q335 = Entry(
    "q335_mask_profile",
    (s, d) =>
      graft.ops.Profiling
        .maskProfile(Tables.customer(s, d),
          Seq("c_name", "c_mktsegment", "c_acctbal"), k = 5)
        .select(col("column"), col("mask"), col("n"),
          r6(col("share")).as("share"))
        .orderBy(col("column"), col("n").desc, col("mask")),
    Some("""
      WITH pairs AS (
        SELECT col, regexp_replace(regexp_replace(regexp_replace(
          regexp_replace(val, '[A-Z]+', 'A', 'g'), '[a-z]+', 'a', 'g'),
          '[0-9]+', '9', 'g'), '\s+', '_', 'g') AS mask
        FROM (SELECT 'c_name' AS col, c_name::VARCHAR AS val
              FROM customer
              UNION ALL
              SELECT 'c_mktsegment', c_mktsegment::VARCHAR
              FROM customer
              UNION ALL
              SELECT 'c_acctbal', c_acctbal::VARCHAR FROM customer)
        WHERE val IS NOT NULL),
      counts AS (SELECT col, mask, count(*) AS n FROM pairs
                 GROUP BY 1, 2),
      tot AS (SELECT col, sum(n)::DOUBLE AS t FROM counts GROUP BY 1),
      r AS (SELECT c.col, c.mask, c.n, c.n / t.t AS share,
              row_number() OVER (PARTITION BY c.col
                ORDER BY c.n DESC, c.mask) AS rk
            FROM counts c JOIN tot t ON c.col = t.col)
      SELECT col AS "column", mask, n, round(share, 6) AS share
      FROM r WHERE rk <= 5 ORDER BY "column", n DESC, mask"""))

  /** Grouped Benford conformity: first-digit law per order priority —
    * exercises benfordConformity's segment path (which slice of the
    * book looks fabricated?). */
  private val q336 = Entry(
    "q336_benford_grouped",
    (s, d) =>
      graft.ops.Profiling
        .benfordConformity(Tables.orders(s, d), "o_totalprice",
          Seq("o_orderpriority"))
        .select(col("o_orderpriority").as("priority"), col("digit"),
          col("n"), r6(col("observed")).as("observed"),
          r6(col("expected")).as("expected"), r6(col("mad")).as("mad"),
          r6(col("chi2")).as("chi2"))
        .orderBy("priority", "digit"),
    Some("""
      WITH d AS (SELECT o_orderpriority AS g, abs(o_totalprice) AS v
                 FROM orders WHERE abs(o_totalprice) > 0),
      c AS (SELECT g, floor(v / pow(10, floor(log10(v))))::BIGINT
              AS digit, count(*) AS n
            FROM d GROUP BY 1, 2),
      grid AS (SELECT g, digit
               FROM (SELECT DISTINCT g FROM c),
                    (SELECT unnest(generate_series(1, 9)) AS digit)),
      j AS (SELECT grid.g, grid.digit, coalesce(c.n, 0) AS n
            FROM grid LEFT JOIN c USING (g, digit)),
      t AS (SELECT g, sum(n)::DOUBLE AS nn FROM j GROUP BY 1),
      p AS (SELECT j.g, j.digit, j.n, j.n / t.nn AS observed,
                   log10(1 + 1.0 / j.digit) AS expected, t.nn
            FROM j JOIN t USING (g)),
      sc AS (SELECT g, avg(abs(observed - expected)) AS mad,
                    max(nn) * sum(pow(observed - expected, 2)
                      / expected) AS chi2
             FROM p GROUP BY 1)
      SELECT p.g AS priority, p.digit, p.n,
             round(p.observed, 6) AS observed,
             round(p.expected, 6) AS expected, round(sc.mad, 6) AS mad,
             round(sc.chi2, 6) AS chi2
      FROM p JOIN sc USING (g) ORDER BY priority, digit"""))

  /** Mann–Kendall monotone trend per event type on the daily mean
    * series — the evidence companion to Theil–Sen's slope. */
  private val q337 = Entry(
    "q337_mann_kendall",
    (s, d) =>
      graft.ops.TimeSeries
        .mannKendall(Tables.events(s, d), Seq("event_type"), "ts",
          "value")
        .select(col("event_type"), col("n_days"),
          r6(col("s_stat")).as("s_stat"), r6(col("var_s")).as("var_s"),
          r6(col("z")).as("z"))
        .orderBy("event_type"),
    Some("""
      WITH daily AS (SELECT event_type AS g, ts::DATE AS d,
                            avg("value") AS x
                     FROM events
                     WHERE "value" IS NOT NULL AND ts IS NOT NULL
                     GROUP BY 1, 2),
      sf AS (SELECT a.g, sum(sign(b.x - a.x)) AS s
             FROM daily a JOIN daily b ON a.g = b.g AND a.d < b.d
             GROUP BY 1),
      tie AS (SELECT g, sum(t) AS n,
                     sum(t * (t - 1) * (2 * t + 5)) AS tt
              FROM (SELECT g, x, count(*)::DOUBLE AS t
                    FROM daily GROUP BY 1, 2)
              GROUP BY 1),
      f AS (SELECT sf.g, tie.n, sf.s,
                   (tie.n * (tie.n - 1) * (2 * tie.n + 5) - tie.tt) / 18
                     AS vs
            FROM sf JOIN tie USING (g))
      SELECT g AS event_type, n::BIGINT AS n_days, round(s, 6) AS s_stat,
             round(vs, 6) AS var_s,
             round(CASE WHEN vs > 0 AND s <> 0
               THEN (s - sign(s)) / sqrt(vs) ELSE 0 END, 6) AS z
      FROM f ORDER BY g"""))

  /** Mediation: does order price drive total quantity THROUGH line
    * count? Product-of-coefficients from one moments scan. */
  private val q338 = Entry(
    "q338_mediation",
    (s, d) => {
      val per = Tables.orders(s, d)
        .join(Tables.lineitem(s, d),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey", "o_totalprice")
        .agg(count(lit(1)).cast("double").as("m"),
          sum(col("l_quantity")).cast("double").as("y"))
        .select((col("o_totalprice") / 100000.0).as("x"), col("m"),
          col("y"))
      graft.ops.Evaluation.mediationAnalysis(per, "x", "m", "y")
        .select(col("n"), r6(col("total_effect")).as("total_effect"),
          r6(col("a_path")).as("a_path"), r6(col("b_path")).as("b_path"),
          r6(col("direct_effect")).as("direct_effect"),
          r6(col("indirect_effect")).as("indirect_effect"),
          r6(col("prop_mediated")).as("prop_mediated"))
    },
    Some("""
      WITH per AS (SELECT o_totalprice / 100000.0 AS x,
                          count(*)::DOUBLE AS m,
                          sum(l_quantity)::DOUBLE AS y
                   FROM orders JOIN lineitem ON l_orderkey = o_orderkey
                   GROUP BY o_orderkey, o_totalprice),
      mo AS (SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(m) AS sm,
                    sum(y) AS sy, sum(x * x) AS sxx, sum(m * m) AS smm,
                    sum(x * m) AS sxm, sum(x * y) AS sxy,
                    sum(m * y) AS smy
             FROM per),
      c AS (SELECT n, sxx - sx * sx / n AS cxx, smm - sm * sm / n AS cmm,
                   sxm - sx * sm / n AS cxm, sxy - sx * sy / n AS cxy,
                   smy - sm * sy / n AS cmy
            FROM mo)
      SELECT n::BIGINT AS n, round(cxy / cxx, 6) AS total_effect,
             round(cxm / cxx, 6) AS a_path,
             round((cmy * cxx - cxy * cxm) /
               (cxx * cmm - cxm * cxm), 6) AS b_path,
             round((cxy * cmm - cmy * cxm) /
               (cxx * cmm - cxm * cxm), 6) AS direct_effect,
             round((cxm / cxx) * ((cmy * cxx - cxy * cxm) /
               (cxx * cmm - cxm * cxm)), 6) AS indirect_effect,
             round((cxm / cxx) * ((cmy * cxx - cxy * cxm) /
               (cxx * cmm - cxm * cxm)) / (cxy / cxx), 6)
               AS prop_mediated
      FROM c"""))

  /** Doubly-robust AIPW treatment effect of the even-user "arm" on
    * per-user event counts, log-mean-value covariate — propensity
    * Newton rounds AND both outcome fits replayed by the oracle. */
  private val q339 = Entry(
    "q339_doubly_robust",
    (s, d) => {
      val per = Tables.events(s, d)
        .where(col("value").isNotNull)
        .groupBy("user_id")
        .agg(log1p(avg(col("value"))).as("x"),
          count(lit(1)).cast("double").as("y"))
      graft.ops.Evaluation.doublyRobustATE(per,
          col("user_id") % 2 === 0, "x", "y", iterations = 2)
        .select(col("n"), col("n_treated"),
          r6(col("propensity_slope")).as("propensity_slope"),
          r6(col("ate_naive")).as("ate_naive"),
          r6(col("ate_dr")).as("ate_dr"))
    },
    Some("""
      WITH per AS (SELECT user_id, ln(1 + avg("value")) AS x,
                          count(*)::DOUBLE AS y,
                          CASE WHEN user_id % 2 = 0 THEN 1.0 ELSE 0.0
                            END AS t
                   FROM events WHERE "value" IS NOT NULL
                   GROUP BY user_id),
      b AS (SELECT t, x, y FROM per
            WHERE x IS NOT NULL AND y IS NOT NULL),
      i0 AS (SELECT 0.0 AS c0, 0.0 AS c1),
      s1 AS (SELECT sum(w) AS h00, sum(w * x) AS h01,
                    sum(w * x * x) AS h11, sum(t - mu) AS g0,
                    sum(x * (t - mu)) AS g1
             FROM (SELECT x, t, mu, mu * (1 - mu) AS w
                   FROM (SELECT x, t,
                           1 / (1 + exp(-(c0 + c1 * x))) AS mu
                         FROM b, i0))),
      i1 AS (SELECT c0 + (h11 * g0 - h01 * g1)
                      / (h00 * h11 - h01 * h01) AS c0,
                    c1 + (h00 * g1 - h01 * g0)
                      / (h00 * h11 - h01 * h01) AS c1
             FROM s1, i0),
      s2 AS (SELECT sum(w) AS h00, sum(w * x) AS h01,
                    sum(w * x * x) AS h11, sum(t - mu) AS g0,
                    sum(x * (t - mu)) AS g1
             FROM (SELECT x, t, mu, mu * (1 - mu) AS w
                   FROM (SELECT x, t,
                           1 / (1 + exp(-(c0 + c1 * x))) AS mu
                         FROM b, i1))),
      i2 AS (SELECT c0 + (h11 * g0 - h01 * g1)
                      / (h00 * h11 - h01 * h01) AS c0,
                    c1 + (h00 * g1 - h01 * g0)
                      / (h00 * h11 - h01 * h01) AS c1
             FROM s2, i1),
      om AS (SELECT sum(t) AS n1, sum(1 - t) AS n0,
                    sum(t * x) AS sx1, sum((1 - t) * x) AS sx0,
                    sum(t * y) AS sy1, sum((1 - t) * y) AS sy0,
                    sum(t * x * x) AS sxx1, sum((1 - t) * x * x) AS sxx0,
                    sum(t * x * y) AS sxy1, sum((1 - t) * x * y) AS sxy0
             FROM b),
      co AS (SELECT
               (n1 * sxy1 - sx1 * sy1) / (n1 * sxx1 - sx1 * sx1) AS b1u,
               (sy1 - (n1 * sxy1 - sx1 * sy1)
                 / (n1 * sxx1 - sx1 * sx1) * sx1) / n1 AS a1u,
               (n0 * sxy0 - sx0 * sy0) / (n0 * sxx0 - sx0 * sx0) AS b0u,
               (sy0 - (n0 * sxy0 - sx0 * sy0)
                 / (n0 * sxx0 - sx0 * sx0) * sx0) / n0 AS a0u
             FROM om),
      f AS (SELECT count(*) AS n, sum(t) AS nt, max(i2.c1) AS pslope,
              sum(t * y) / sum(t)
                - sum((1 - t) * y) / sum(1 - t) AS naive,
              avg(t * (y - (a1u + b1u * x)) /
                    least(greatest(1 / (1 + exp(-(c0 + c1 * x))), 0.01),
                      0.99)
                  + (a1u + b1u * x)
                  - (1 - t) * (y - (a0u + b0u * x)) /
                    (1 - least(greatest(1 / (1 + exp(-(c0 + c1 * x))),
                      0.01), 0.99))
                  - (a0u + b0u * x)) AS atedr
            FROM b, i2, co)
      SELECT n::BIGINT AS n, nt::BIGINT AS n_treated,
             round(pslope, 6) AS propensity_slope,
             round(naive, 6) AS ate_naive, round(atedr, 6) AS ate_dr
      FROM f"""))

  /** Breusch–Pagan: does event-value residual variance depend on
    * hour-of-day? The standard-error sanity check behind every OLS
    * readout. */
  private val q340 = Entry(
    "q340_breusch_pagan",
    (s, d) =>
      graft.ops.Regression
        .breuschPagan(Tables.events(s, d)
            .withColumn("hod", hour(col("ts")).cast("double")),
          "hod", "value")
        .select(col("n"), r6(col("slope")).as("slope"),
          r6(col("intercept")).as("intercept"),
          r6(col("r2_aux")).as("r2_aux"),
          r6(col("lm_stat")).as("lm_stat")),
    Some("""
      WITH d AS (SELECT hour(ts)::DOUBLE AS x, "value"::DOUBLE AS y
                 FROM events
                 WHERE ts IS NOT NULL AND "value" IS NOT NULL),
      m AS (SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
                   sum(x * x) AS sxx, sum(x * y) AS sxy
            FROM d),
      ab AS (SELECT n, (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b,
               (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
                 AS a
             FROM m),
      e AS (SELECT x, (y - ab.a - ab.b * x) * (y - ab.a - ab.b * x)
              AS e2, ab.b, ab.a
            FROM d, ab),
      m2 AS (SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(e2) AS se,
                    sum(x * x) AS sxx, sum(x * e2) AS sxe,
                    sum(e2 * e2) AS see, max(b) AS b, max(a) AS a
             FROM e)
      SELECT n::BIGINT AS n, round(b, 6) AS slope,
             round(a, 6) AS intercept,
             round((sxe - sx * se / n) * (sxe - sx * se / n) /
               ((sxx - sx * sx / n) * (see - se * se / n)), 6) AS r2_aux,
             round(n * (sxe - sx * se / n) * (sxe - sx * se / n) /
               ((sxx - sx * sx / n) * (see - se * se / n)), 6) AS lm_stat
      FROM m2"""))

  /** Chow break test: does the value~hour line differ between the
    * first and second half-month? Known-breakpoint inference next to
    * the changepoint search. */
  private val q341 = Entry(
    "q341_chow_test",
    (s, d) =>
      graft.ops.Regression
        .chowTest(Tables.events(s, d)
            .withColumn("hod", hour(col("ts")).cast("double")),
          "hod", "value", dayofmonth(col("ts")) <= 15)
        .select(col("n_a"), col("n_b"),
          r6(col("rss_pooled")).as("rss_pooled"),
          r6(col("rss_a")).as("rss_a"), r6(col("rss_b")).as("rss_b"),
          r6(col("f_stat")).as("f_stat")),
    Some("""
      WITH d AS (SELECT hour(ts)::DOUBLE AS x, "value"::DOUBLE AS y,
                   CASE WHEN day(ts) <= 15 THEN 1.0 ELSE 0.0 END AS t
                 FROM events
                 WHERE ts IS NOT NULL AND "value" IS NOT NULL),
      m AS (SELECT sum(t) AS na, sum(1 - t) AS nb,
                   sum(t * x) AS sxa, sum((1 - t) * x) AS sxb,
                   sum(t * y) AS sya, sum((1 - t) * y) AS syb,
                   sum(t * x * x) AS sxxa, sum((1 - t) * x * x) AS sxxb,
                   sum(t * x * y) AS sxya, sum((1 - t) * x * y) AS sxyb,
                   sum(t * y * y) AS syya, sum((1 - t) * y * y) AS syyb
            FROM d),
      r AS (SELECT na, nb,
              (syya - sya * sya / na) -
                (sxya - sxa * sya / na) * (sxya - sxa * sya / na) /
                (sxxa - sxa * sxa / na) AS ra,
              (syyb - syb * syb / nb) -
                (sxyb - sxb * syb / nb) * (sxyb - sxb * syb / nb) /
                (sxxb - sxb * sxb / nb) AS rb,
              ((syya + syyb) - (sya + syb) * (sya + syb) / (na + nb)) -
                ((sxya + sxyb) - (sxa + sxb) * (sya + syb) / (na + nb))
                * ((sxya + sxyb) - (sxa + sxb) * (sya + syb) / (na + nb))
                / ((sxxa + sxxb) - (sxa + sxb) * (sxa + sxb) / (na + nb))
                AS rp
            FROM m)
      SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b,
             round(rp, 6) AS rss_pooled, round(ra, 6) AS rss_a,
             round(rb, 6) AS rss_b,
             round(((rp - ra - rb) / 2) /
               ((ra + rb) / (na + nb - 4)), 6) AS f_stat
      FROM r"""))

  /** Expected Reciprocal Rank of the per-lang ranker under the q149
    * graded relevance — the cascade-model companion to NDCG/MRR. */
  private val q342 = Entry(
    "q342_err",
    (s, d) => {
      val graded = Tables.documents(s, d).select(col("lang"),
        col("doc_id"), (col("doc_id") % 4).as("gain"))
      graft.ops.Retrieval
        .expectedReciprocalRank(rankerA(s, d), graded, "lang",
          "doc_id", "rank", "gain", maxGain = 3, k = 10)
        .select(col("query"), col("n_results"),
          r6(col("err_at_k")).as("err_at_k"))
        .orderBy("query")
    },
    Some("""
      WITH res AS (SELECT lang AS query, doc_id AS doc,
                     row_number() OVER (PARTITION BY lang
                       ORDER BY n_chars DESC, doc_id ASC) AS r
                   FROM documents),
      top AS (SELECT query, doc, r FROM res WHERE r <= 10),
      g AS (SELECT query, r,
              (pow(2, doc % 4) - 1) / pow(2, 3) AS rr
            FROM top),
      c AS (SELECT query, r, rr,
              exp(coalesce(sum(ln(1 - rr)) OVER (PARTITION BY query
                ORDER BY r ROWS BETWEEN UNBOUNDED PRECEDING AND
                1 PRECEDING), 0)) AS surv
            FROM g)
      SELECT query, count(*) AS n_results,
             round(sum(rr / r * surv), 6) AS err_at_k
      FROM c GROUP BY 1 ORDER BY query"""))

  /** Competing-risks cumulative incidence: conversion (big purchase)
    * vs first error per user — the Aalen–Johansen correction to
    * per-cause 1−KM. */
  private val q343 = Entry(
    "q343_cumulative_incidence",
    (s, d) => {
      val ev = Tables.events(s, d)
      val hitP = when(col("event_type") === "purchase" &&
        col("value") > 200, col("ts"))
      val hitE = when(col("event_type") === "error", col("ts"))
      val surv = ev.groupBy("user_id")
        .agg(min(hitP).as("__tp"), min(hitE).as("__te"),
          min(col("ts")).as("__t0"), max(col("ts")).as("__tl"))
        .select(
          when(col("__tp").isNotNull &&
              (col("__te").isNull || col("__tp") <= col("__te")), 1)
            .when(col("__te").isNotNull, 2).otherwise(0).as("cause"),
          when(col("__tp").isNotNull &&
              (col("__te").isNull || col("__tp") <= col("__te")),
            datediff(to_date(col("__tp")), to_date(col("__t0"))))
            .when(col("__te").isNotNull,
              datediff(to_date(col("__te")), to_date(col("__t0"))))
            .otherwise(
              datediff(to_date(col("__tl")), to_date(col("__t0"))))
            .as("dur"))
      graft.analysis.AnalysisPlanner
        .cumulativeIncidence(surv, "dur", "cause")
        .select(col("duration"), col("cause"), col("n_risk"),
          col("n_event"), r6(col("cif")).as("cif"))
        .orderBy("duration", "cause")
    },
    Some("""
      WITH s AS (SELECT
          min(ts) FILTER (event_type = 'purchase' AND "value" > 200)
            AS tp,
          min(ts) FILTER (event_type = 'error') AS te,
          min(ts) AS t0, max(ts) AS tl
        FROM events GROUP BY user_id),
      d AS (SELECT CASE WHEN tp IS NOT NULL AND (te IS NULL OR tp <= te)
                     THEN 1
                   WHEN te IS NOT NULL THEN 2 ELSE 0 END AS c,
                   CASE WHEN tp IS NOT NULL AND (te IS NULL OR tp <= te)
                     THEN datediff('day', t0::DATE, tp::DATE)
                   WHEN te IS NOT NULL
                     THEN datediff('day', t0::DATE, te::DATE)
                   ELSE datediff('day', t0::DATE, tl::DATE)
                   END::DOUBLE AS t
            FROM s),
      pt AS (SELECT t, count(*)::DOUBLE AS tot,
                    sum(CASE WHEN c > 0 THEN 1.0 ELSE 0 END) AS d0
             FROM d GROUP BY 1),
      rk AS (SELECT t, tot, d0,
               (SELECT count(*) FROM d)::DOUBLE
                 - coalesce(sum(tot) OVER (ORDER BY t ROWS BETWEEN
                   UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nr
             FROM pt),
      ev AS (SELECT t, nr,
               CASE WHEN d0 < nr THEN ln(1 - d0 / nr) ELSE 0 END AS lnf
             FROM rk WHERE d0 > 0),
      sv AS (SELECT t, nr,
               exp(coalesce(sum(lnf) OVER (ORDER BY t ROWS BETWEEN
                 UNBOUNDED PRECEDING AND 1 PRECEDING), 0)) AS sm
             FROM ev),
      bc AS (SELECT t, c, count(*)::DOUBLE AS dk FROM d WHERE c > 0
             GROUP BY 1, 2),
      inc AS (SELECT bc.t, bc.c, sv.nr, bc.dk,
                     sv.sm * bc.dk / sv.nr AS i0
              FROM bc JOIN sv ON bc.t = sv.t)
      SELECT t AS duration, c AS cause, nr::BIGINT AS n_risk,
             dk::BIGINT AS n_event,
             round(sum(i0) OVER (PARTITION BY c ORDER BY t ROWS BETWEEN
               UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS cif
      FROM inc ORDER BY duration, cause"""))

  /** Cameron–Trivedi overdispersion test on q287's orders-per-
    * customer Poisson fit: does the count variance exceed the mean
    * (⇒ the Poisson SEs are wrong, prefer NB)? */
  private val q344 = Entry(
    "q344_overdispersion",
    (s, d) => {
      val cnt = Tables.orders(s, d).groupBy(col("o_custkey"))
        .agg(count(lit(1)).cast("double").as("y"))
      val df = Tables.customer(s, d)
        .select(col("c_custkey"), (col("c_acctbal") / 10000.0).as("x"))
        .join(cnt, col("c_custkey") === col("o_custkey"), "left")
        .na.fill(0.0, Seq("y"))
      graft.ops.Regression
        .overdispersionTest(df, "x", col("y"), iterations = 4)
        .select(col("n"), r6(col("mu_mean")).as("mu_mean"),
          r6(col("alpha")).as("alpha"), r6(col("t_stat")).as("t_stat"))
    },
    Some("""
      WITH cnt AS (SELECT o_custkey, count(*)::DOUBLE AS y
                   FROM orders GROUP BY 1),
      d AS (SELECT coalesce(y, 0.0) AS y, c_acctbal / 10000.0 AS x
            FROM customer LEFT JOIN cnt ON c_custkey = o_custkey),
      i0 AS (SELECT 0.0 AS b0, 0.0 AS b1),
      s1 AS (SELECT sum(mu) AS h00, sum(mu * x) AS h01,
                    sum(mu * x * x) AS h11, sum(y - mu) AS g0,
                    sum(x * (y - mu)) AS g1
             FROM (SELECT x, y, exp(b0 + b1 * x) AS mu FROM d, i0)),
      i1 AS (SELECT b0 + (h11 * g0 - h01 * g1)
                      / (h00 * h11 - h01 * h01) AS b0,
                    b1 + (h00 * g1 - h01 * g0)
                      / (h00 * h11 - h01 * h01) AS b1
             FROM s1, i0),
      s2 AS (SELECT sum(mu) AS h00, sum(mu * x) AS h01,
                    sum(mu * x * x) AS h11, sum(y - mu) AS g0,
                    sum(x * (y - mu)) AS g1
             FROM (SELECT x, y, exp(b0 + b1 * x) AS mu FROM d, i1)),
      i2 AS (SELECT b0 + (h11 * g0 - h01 * g1)
                      / (h00 * h11 - h01 * h01) AS b0,
                    b1 + (h00 * g1 - h01 * g0)
                      / (h00 * h11 - h01 * h01) AS b1
             FROM s2, i1),
      s3 AS (SELECT sum(mu) AS h00, sum(mu * x) AS h01,
                    sum(mu * x * x) AS h11, sum(y - mu) AS g0,
                    sum(x * (y - mu)) AS g1
             FROM (SELECT x, y, exp(b0 + b1 * x) AS mu FROM d, i2)),
      i3 AS (SELECT b0 + (h11 * g0 - h01 * g1)
                      / (h00 * h11 - h01 * h01) AS b0,
                    b1 + (h00 * g1 - h01 * g0)
                      / (h00 * h11 - h01 * h01) AS b1
             FROM s3, i2),
      s4 AS (SELECT sum(mu) AS h00, sum(mu * x) AS h01,
                    sum(mu * x * x) AS h11, sum(y - mu) AS g0,
                    sum(x * (y - mu)) AS g1
             FROM (SELECT x, y, exp(b0 + b1 * x) AS mu FROM d, i3)),
      i4 AS (SELECT b0 + (h11 * g0 - h01 * g1)
                      / (h00 * h11 - h01 * h01) AS b0,
                    b1 + (h00 * g1 - h01 * g0)
                      / (h00 * h11 - h01 * h01) AS b1
             FROM s4, i3),
      aux AS (SELECT count(*)::DOUBLE AS n, sum(mu) AS smu,
                     sum(mu * mu) AS smu2, sum(mu * z) AS smz,
                     sum(z * z) AS szz
              FROM (SELECT mu, ((y - mu) * (y - mu) - y) / mu AS z
                    FROM (SELECT y, exp(b0 + b1 * x) AS mu
                          FROM d, i4)))
      SELECT n::BIGINT AS n, round(smu / n, 6) AS mu_mean,
             round(smz / smu2, 6) AS alpha,
             round((smz / smu2) /
               sqrt(((szz - smz * smz / smu2) / (n - 1)) / smu2), 6)
               AS t_stat
      FROM aux"""))

  /** Kendall's W: do the five event types agree on how the 24 hours
    * rank by mean value? Pure composition over friedmanTest with
    * types as raters and hours as items. */
  private val q345 = Entry(
    "q345_kendalls_w",
    (s, d) =>
      graft.analysis.AnalysisPlanner
        .friedmanTest(Tables.events(s, d)
            .withColumn("hod", hour(col("ts"))),
          "event_type", "hod", "value")
        .select(col("n_blocks").as("n_raters"),
          col("n_treatments").as("n_items"), r6(col("chi2")).as("chi2"),
          r6(col("chi2") / (col("n_blocks") * (col("n_treatments") - 1)))
            .as("kendalls_w"),
          r6((col("n_blocks") *
            (col("chi2") / (col("n_blocks") *
              (col("n_treatments") - 1))) - 1) /
            (col("n_blocks") - 1)).as("avg_spearman")),
    Some("""
      WITH cells AS (SELECT event_type AS b, hour(ts) AS t,
                            avg("value") AS m
                     FROM events
                     WHERE "value" IS NOT NULL AND event_type IS NOT NULL
                     GROUP BY 1, 2),
      k AS (SELECT count(DISTINCT t)::DOUBLE AS k FROM cells),
      keep AS (SELECT b FROM cells GROUP BY b
               HAVING count(*) = (SELECT k FROM k)),
      kept AS (SELECT c.* FROM cells c JOIN keep USING (b)),
      r AS (SELECT b, t,
              rank() OVER (PARTITION BY b ORDER BY m) - 1
                + (count(*) OVER (PARTITION BY b, m) + 1) / 2.0 AS r
            FROM kept),
      perT AS (SELECT t, sum(r) AS rj, sum(r * r) AS rj2,
                      count(*)::DOUBLE AS nb
               FROM r GROUP BY 1),
      a AS (SELECT max(nb) AS n, count(*)::DOUBLE AS kk,
                   sum(rj2) AS a2,
                   sum((rj - nb * (k.k + 1) / 2)
                     * (rj - nb * (k.k + 1) / 2)) AS sq
            FROM perT, k),
      f AS (SELECT n, kk,
              (kk - 1) * sq / (a2 - n * kk * (kk + 1) * (kk + 1) / 4)
                AS chi2
            FROM a)
      SELECT n::BIGINT AS n_raters, kk::BIGINT AS n_items,
             round(chi2, 6) AS chi2,
             round(chi2 / (n * (kk - 1)), 6) AS kendalls_w,
             round((n * (chi2 / (n * (kk - 1))) - 1) / (n - 1), 6)
               AS avg_spearman
      FROM f"""))

  /** Standardized contingency residuals for event type × user
    * parity: which cells drive the q43-style chi-square? */
  private val q346 = Entry(
    "q346_contingency_residuals",
    (s, d) =>
      graft.analysis.AnalysisPlanner
        .contingencyResiduals(Tables.events(s, d)
            .withColumn("parity",
              when(col("user_id") % 2 === 0, "even").otherwise("odd")),
          "event_type", "parity")
        .select(col("a"), col("b"), col("n"),
          r6(col("expected")).as("expected"),
          r6(col("std_residual")).as("std_residual"),
          r6(col("adj_residual")).as("adj_residual"),
          r6(col("chi2")).as("chi2"))
        .orderBy("a", "b"),
    Some("""
      WITH d AS (SELECT event_type AS a,
                   CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END
                     AS b
                 FROM events WHERE event_type IS NOT NULL),
      cells AS (SELECT a, b, count(*)::DOUBLE AS n FROM d GROUP BY 1, 2),
      rm AS (SELECT a, sum(n) AS ra FROM cells GROUP BY 1),
      cm AS (SELECT b, sum(n) AS cb FROM cells GROUP BY 1),
      t AS (SELECT sum(n) AS nn FROM cells),
      j AS (SELECT cells.a, cells.b, cells.n, rm.ra, cm.cb, t.nn,
                   rm.ra * cm.cb / t.nn AS e
            FROM cells JOIN rm USING (a) JOIN cm USING (b), t),
      c2 AS (SELECT sum((n - e) * (n - e) / e)
                      + greatest(max(nn) - sum(e), 0) AS chi2
             FROM j)
      SELECT a, b, n::BIGINT AS n, round(e, 6) AS expected,
             round((n - e) / sqrt(e), 6) AS std_residual,
             round((n - e) / sqrt(e * (1 - ra / nn) * (1 - cb / nn)), 6)
               AS adj_residual,
             round(c2.chi2, 6) AS chi2
      FROM j, c2 ORDER BY a, b"""))

  /** Kish effective sample size + design effect of the q290 raked
    * weights — "how much sample did the reweighting cost?". */
  private val q347 = Entry(
    "q347_kish_neff",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .withColumn("band", floor(hour(col("ts")) / 6))
      val ta = Seq("click", "error", "purchase", "signup", "view")
        .map(t => (t, 0.2)).toDF("value", "share")
      val tb = (0 to 3).map(b => (b.toLong, 0.25)).toDF("value", "share")
      graft.ops.Sampling
        .rakeWeights(ev, "event_type", "band", ta, tb, iterations = 3)
        .agg(sum(col("n")).cast("long").as("n"),
          (pow(sum(col("n") * col("weight")), 2) /
            sum(col("n") * col("weight") * col("weight"))).as("__ne"),
          sum(col("n")).cast("double").as("__nd"),
          sum(col("n") * col("weight") * col("weight")).as("__nw2"),
          sum(col("n") * col("weight")).as("__nw"))
        .select(col("n"), r6(col("__ne")).as("n_eff"),
          r6(col("__nd") / col("__ne")).as("design_effect"),
          r6(sqrt(col("__nd") * col("__nw2") /
            (col("__nw") * col("__nw")) - 1)).as("cv_weights"))
    },
    Some("""
      WITH c AS (SELECT event_type AS a, floor(hour(ts) / 6) AS b,
                        count(*)::DOUBLE AS n
                 FROM events GROUP BY 1, 2),
      t AS (SELECT sum(n) AS nn FROM c),
      w0 AS (SELECT a, b, n, 1.0 AS w FROM c),
      a1 AS (SELECT w0.a, b, n,
                    w * 0.2 * t.nn / sum(n * w) OVER (PARTITION BY w0.a)
                      AS w
             FROM w0, t),
      b1 AS (SELECT a, a1.b, n,
                    w * 0.25 * t.nn / sum(n * w) OVER (PARTITION BY a1.b)
                      AS w
             FROM a1, t),
      a2 AS (SELECT b1.a, b, n,
                    w * 0.2 * t.nn / sum(n * w) OVER (PARTITION BY b1.a)
                      AS w
             FROM b1, t),
      b2 AS (SELECT a, a2.b, n,
                    w * 0.25 * t.nn / sum(n * w) OVER (PARTITION BY a2.b)
                      AS w
             FROM a2, t),
      a3 AS (SELECT b2.a, b, n,
                    w * 0.2 * t.nn / sum(n * w) OVER (PARTITION BY b2.a)
                      AS w
             FROM b2, t),
      b3 AS (SELECT a, a3.b, n,
                    w * 0.25 * t.nn / sum(n * w) OVER (PARTITION BY a3.b)
                      AS w
             FROM a3, t),
      f AS (SELECT sum(n) AS n, sum(n * w) AS nw,
                   sum(n * w * w) AS nw2
            FROM b3)
      SELECT n::BIGINT AS n, round(nw * nw / nw2, 6) AS n_eff,
             round(n / (nw * nw / nw2), 6) AS design_effect,
             round(sqrt(n * nw2 / (nw * nw) - 1), 6) AS cv_weights
      FROM f"""))

  /** Dunnett-layout contrasts: every event type vs the 'view'
    * control arm, Welch z per arm. */
  private val q348 = Entry(
    "q348_control_contrasts",
    (s, d) =>
      graft.analysis.AnalysisPlanner
        .controlContrasts(Tables.events(s, d), "event_type", "value",
          "view")
        .select(col("group"), col("n"), r6(col("mean")).as("mean"),
          r6(col("diff_vs_control")).as("diff_vs_control"),
          r6(col("se")).as("se"), r6(col("z")).as("z"))
        .orderBy("group"),
    Some("""
      WITH d AS (SELECT event_type AS g, "value"::DOUBLE AS v
                 FROM events
                 WHERE "value" IS NOT NULL AND event_type IS NOT NULL),
      per AS (SELECT g, count(*)::DOUBLE AS n, avg(v) AS m,
                     var_samp(v) AS s2
              FROM d GROUP BY 1 HAVING count(*) >= 2),
      ctrl AS (SELECT n AS nc, m AS mc, s2 AS vc FROM per
               WHERE g = 'view')
      SELECT g AS "group", per.n::BIGINT AS n, round(m, 6) AS mean,
             round(m - mc, 6) AS diff_vs_control,
             round(sqrt(s2 / per.n + vc / nc), 6) AS se,
             round((m - mc) / sqrt(s2 / per.n + vc / nc), 6) AS z
      FROM per, ctrl WHERE g <> 'view' ORDER BY g"""))

  /** Wald SPRT on the daily purchase-share stream: p0=0.18 vs
    * p1=0.22, α=0.05, β=0.2 — when would a fully sequential monitor
    * have stopped? */
  private val q349 = Entry(
    "q349_sprt",
    (s, d) =>
      graft.analysis.AnalysisPlanner
        .sprtBinary(Tables.events(s, d), "ts",
          col("event_type") === "purchase", p0 = 0.18, p1 = 0.22,
          alpha = 0.05, beta = 0.2)
        .select(col("n_days"), col("n"), col("conversions"),
          r6(col("llr_final")).as("llr_final"),
          r6(col("lower_bound")).as("lower_bound"),
          r6(col("upper_bound")).as("upper_bound"), col("decision"),
          col("first_decision_day")),
    Some("""
      WITH daily AS (SELECT ts::DATE AS d, count(*)::DOUBLE AS n,
                       sum(CASE WHEN event_type = 'purchase'
                         THEN 1.0 ELSE 0 END) AS x
                     FROM events WHERE ts IS NOT NULL GROUP BY 1),
      cum AS (SELECT d, sum(n) OVER w AS cn, sum(x) OVER w AS cx
              FROM daily WINDOW w AS (ORDER BY d ROWS BETWEEN
                UNBOUNDED PRECEDING AND CURRENT ROW)),
      l AS (SELECT d, cn, cx,
              cx * ln(0.22 / 0.18)
                + (cn - cx) * ln(0.78 / 0.82) AS llr
            FROM cum),
      f AS (SELECT count(*) AS nd, max(cn) AS n, max(cx) AS cv,
                   max_by(llr, d) AS lf,
                   min(CASE WHEN llr >= ln(0.8 / 0.05) THEN d END) AS fu,
                   min(CASE WHEN llr <= ln(0.2 / 0.95) THEN d END) AS fd
            FROM l)
      SELECT nd AS n_days, n::BIGINT AS n, cv::BIGINT AS conversions,
             round(lf, 6) AS llr_final,
             round(ln(0.2 / 0.95), 6) AS lower_bound,
             round(ln(0.8 / 0.05), 6) AS upper_bound,
             CASE WHEN fu IS NOT NULL AND (fd IS NULL OR fu <= fd)
               THEN 'reject_h0'
             WHEN fd IS NOT NULL THEN 'accept_h0'
             ELSE 'continue' END AS decision,
             least(fu, fd) AS first_decision_day
      FROM f"""))

  /** Q–Q table of event values, even vs odd users, at the standard
    * 5-point grid — WHERE the two arms differ, not just whether. */
  private val q350 = Entry(
    "q350_qq_table",
    (s, d) =>
      graft.analysis.AnalysisPlanner
        .qqTable(Tables.events(s, d), "value", col("user_id") % 2 === 0,
          Seq(0.1, 0.25, 0.5, 0.75, 0.9))
        .select(col("prob"), r6(col("q_a")).as("q_a"),
          r6(col("q_b")).as("q_b"), r6(col("qq_diff")).as("qq_diff"),
          r6(col("qq_ratio")).as("qq_ratio"))
        .orderBy("prob"),
    Some("""
      WITH d AS (SELECT "value"::DOUBLE AS v,
                   CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END
                     AS arm
                 FROM events WHERE "value" IS NOT NULL),
      a AS (SELECT quantile_cont(v, 0.1) AS q1,
                   quantile_cont(v, 0.25) AS q2,
                   quantile_cont(v, 0.5) AS q3,
                   quantile_cont(v, 0.75) AS q4,
                   quantile_cont(v, 0.9) AS q5
            FROM d WHERE arm = 'a'),
      b AS (SELECT quantile_cont(v, 0.1) AS q1,
                   quantile_cont(v, 0.25) AS q2,
                   quantile_cont(v, 0.5) AS q3,
                   quantile_cont(v, 0.75) AS q4,
                   quantile_cont(v, 0.9) AS q5
            FROM d WHERE arm = 'b'),
      u AS (SELECT 0.1 AS prob, a.q1 AS qa, b.q1 AS qb FROM a, b
            UNION ALL SELECT 0.25, a.q2, b.q2 FROM a, b
            UNION ALL SELECT 0.5, a.q3, b.q3 FROM a, b
            UNION ALL SELECT 0.75, a.q4, b.q4 FROM a, b
            UNION ALL SELECT 0.9, a.q5, b.q5 FROM a, b)
      SELECT prob, round(qa, 6) AS q_a, round(qb, 6) AS q_b,
             round(qa - qb, 6) AS qq_diff,
             round(CASE WHEN qb <> 0 THEN qa / qb END, 6) AS qq_ratio
      FROM u ORDER BY prob"""))

  /** Spiegelhalter calibration z on the q142 scored-orders frame —
    * the hypothesis-test companion to q319's ECE. */
  private val q351 = Entry(
    "q351_calibration_z",
    (s, d) =>
      graft.ops.Evaluation
        .calibrationZTest(scoredOrders(s, d), "label", "score")
        .select(col("n"), r6(col("base_rate")).as("base_rate"),
          r6(col("mean_score")).as("mean_score"),
          r6(col("brier")).as("brier"), r6(col("z_stat")).as("z_stat")),
    Some(s"""
      WITH $scoredOrdersSql,
      c AS (SELECT y, least(greatest(p, 0.000001), 0.999999) AS pc
            FROM sc),
      a AS (SELECT count(*)::DOUBLE AS n, sum(y) AS sy, sum(pc) AS sp,
                   avg(pow(pc - y, 2)) AS brier,
                   sum((y - pc) * (1 - 2 * pc)) AS num,
                   sum(pow(1 - 2 * pc, 2) * pc * (1 - pc)) AS den
            FROM c)
      SELECT n::BIGINT AS n, round(sy / n, 6) AS base_rate,
             round(sp / n, 6) AS mean_score, round(brier, 6) AS brier,
             round(num / sqrt(den), 6) AS z_stat
      FROM a"""))

  /** Horizon backtest: naive-persistence error growth over 1..7-day
    * lead times on each event type's daily revenue series. */
  private val q352 = Entry(
    "q352_horizon_backtest",
    (s, d) => {
      val daily = Tables.events(s, d)
        .where(col("value").isNotNull && col("ts").isNotNull)
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
            .as("t"))
        .agg(sum("value").as("rev"))
      graft.ops.Evaluation
        .horizonBacktest(daily, Seq("event_type"), "t", "rev", 7)
        .select(col("event_type"), col("horizon").cast("long")
            .as("horizon"), col("n_points"),
          r6(col("mae")).as("mae"), r6(col("rmse")).as("rmse"),
          r6(col("smape")).as("smape"))
        .orderBy("event_type", "horizon")
    },
    Some("""
      WITH daily AS (SELECT event_type AS g,
                       date_diff('day', DATE '2024-01-01', ts::DATE)
                         AS t,
                       sum("value") AS y
                     FROM events
                     WHERE "value" IS NOT NULL AND ts IS NOT NULL
                     GROUP BY 1, 2),
      h AS (SELECT unnest(generate_series(1, 7)) AS horizon),
      sh AS (SELECT g, t + horizon AS t, horizon, y AS f
             FROM daily, h),
      j AS (SELECT sh.g, sh.horizon, sh.f, daily.y
            FROM sh JOIN daily ON sh.g = daily.g AND sh.t = daily.t)
      SELECT g AS event_type, horizon::BIGINT AS horizon,
             count(*) AS n_points,
             round(avg(abs(y - f)), 6) AS mae,
             round(sqrt(avg(pow(y - f, 2))), 6) AS rmse,
             round(avg(CASE WHEN abs(y) + abs(f) <> 0
               THEN 2 * abs(y - f) / (abs(y) + abs(f)) END), 6)
               AS smape
      FROM j GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Two-proportion sample-size planner: detecting a +10% relative
    * lift on the observed purchase share at 5%/80% — with the
    * days-of-traffic answer a launch review asks for. */
  private val q353 = Entry(
    "q353_sample_size",
    (s, d) =>
      graft.ops.Evaluation
        .binarySampleSize(Tables.events(s, d), "ts",
          col("event_type") === "purchase", relativeLift = 0.10)
        .select(col("n"), r6(col("baseline_rate")).as("baseline_rate"),
          r6(col("target_rate")).as("target_rate"), col("n_per_arm"),
          r6(col("days_per_arm")).as("days_per_arm")),
    Some("""
      WITH a AS (SELECT count(*)::DOUBLE AS n,
                   sum(CASE WHEN event_type = 'purchase' THEN 1.0
                     ELSE 0 END) AS x,
                   count(DISTINCT ts::DATE)::DOUBLE AS days
                 FROM events WHERE ts IS NOT NULL),
      r AS (SELECT n, days, x / n AS p1, x / n * 1.1 AS p2 FROM a),
      f AS (SELECT n, days, p1, p2,
              ceil(pow(1.959964 + 0.841621, 2) *
                (p1 * (1 - p1) + p2 * (1 - p2)) /
                pow(p2 - p1, 2))::BIGINT AS npa
            FROM r)
      SELECT n::BIGINT AS n, round(p1, 6) AS baseline_rate,
             round(p2, 6) AS target_rate, npa AS n_per_arm,
             round(npa / (n / days / 2), 6) AS days_per_arm
      FROM f"""))

  /** k-sample Anderson–Darling across the five event types — the
    * tail-sensitive omnibus next to q300's rank-based KW. */
  private val q354 = Entry(
    "q354_k_sample_ad",
    (s, d) =>
      graft.analysis.AnalysisPlanner
        .kSampleAndersonDarlingFromCells(eventTypeValueCells(s, d))
        .select(col("n"), col("n_groups"),
          r6(col("ad_stat")).as("ad_stat")),
    Some("""
      WITH d AS (SELECT event_type AS g, "value"::DOUBLE AS v
                 FROM events
                 WHERE "value" IS NOT NULL AND event_type IS NOT NULL),
      cells AS (SELECT v, g, count(*)::DOUBLE AS f FROM d GROUP BY 1, 2),
      vals AS (SELECT DISTINCT v FROM cells),
      grps AS (SELECT DISTINCT g FROM cells),
      grid AS (SELECT vals.v, grps.g, coalesce(cells.f, 0) AS f
               FROM vals CROSS JOIN grps
               LEFT JOIN cells ON cells.v = vals.v AND cells.g = grps.g),
      pre AS (SELECT v, g, f,
                coalesce(sum(f) OVER (PARTITION BY g ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  + f AS m
              FROM grid),
      pl AS (SELECT v, sum(f) AS fj FROM cells GROUP BY 1),
      plp AS (SELECT v, fj,
                coalesce(sum(fj) OVER (ORDER BY v ROWS BETWEEN
                  UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + fj AS b
              FROM pl),
      sz AS (SELECT g, sum(f) AS ni FROM cells GROUP BY 1),
      t AS (SELECT sum(f) AS nn, count(DISTINCT g) AS k FROM cells)
      SELECT t.nn::BIGINT AS n, t.k AS n_groups,
             round(sum(plp.fj *
               pow(t.nn * pre.m - sz.ni * plp.b, 2) /
               (plp.b * (t.nn - plp.b) * sz.ni)) / t.nn, 6) AS ad_stat
      FROM pre JOIN plp ON pre.v = plp.v JOIN sz ON pre.g = sz.g, t
      WHERE plp.b < t.nn
      GROUP BY t.nn, t.k"""))

  /** Mood's median test across the five event types — the
    * outlier-proof k-sample location check vs the pooled median. */
  private val q355 = Entry(
    "q355_mood_median",
    (s, d) =>
      graft.analysis.AnalysisPlanner
        .moodMedianTestFromCells(eventTypeValueCells(s, d))
        .select(col("n"), col("n_groups"),
          r6(col("pooled_median")).as("pooled_median"),
          r6(col("chi2")).as("chi2"), col("dof")),
    Some("""
      WITH d AS (SELECT event_type AS g, "value"::DOUBLE AS v
                 FROM events
                 WHERE "value" IS NOT NULL AND event_type IS NOT NULL),
      m AS (SELECT quantile_cont(v, 0.5) AS med FROM d),
      f AS (SELECT g,
              sum(CASE WHEN v > m.med THEN 1.0 ELSE 0 END) AS a,
              sum(CASE WHEN v < m.med THEN 1.0 ELSE 0 END) AS b
            FROM d, m GROUP BY 1),
      t AS (SELECT sum(a) AS ta, sum(b) AS tb FROM f),
      x AS (SELECT f.g, f.a, f.b, f.a + f.b AS ni, t.ta, t.tb,
                   t.ta + t.tb AS nn
            FROM f, t)
      SELECT max(nn)::BIGINT AS n, count(*) AS n_groups,
             round(max(m.med), 6) AS pooled_median,
             round(sum(pow(a - ni * ta / nn, 2) / (ni * ta / nn) +
               pow(b - ni * tb / nn, 2) / (ni * tb / nn)), 6) AS chi2,
             count(*) - 1 AS dof
      FROM x, m"""))

  /** Deming (orthogonal, λ=1) errors-in-variables fit of extended
    * price on quantity — the method-comparison slope OLS attenuates;
    * closed form on one moments scan. */
  private val q356 = Entry(
    "q356_deming",
    (s, d) =>
      graft.ops.Regression.deming(Tables.lineitem(s, d), "l_quantity",
          "l_extendedprice", lambda = 1.0)
        .select(col("n"), col("lambda"), r6(col("slope")).as("slope"),
          r6(col("intercept")).as("intercept"),
          r6(col("pearson_r")).as("pearson_r")),
    Some("""
      WITH m AS (SELECT count(*)::DOUBLE AS n,
                   sum(l_quantity)::DOUBLE AS sx,
                   sum(l_extendedprice)::DOUBLE AS sy,
                   sum(l_quantity * l_quantity)::DOUBLE AS sxx,
                   sum(l_extendedprice * l_extendedprice)::DOUBLE AS syy,
                   sum(l_quantity * l_extendedprice)::DOUBLE AS sxy
                 FROM lineitem),
      c AS (SELECT n, sx / n AS mx, sy / n AS my,
                   sxx - sx * sx / n AS cxx, syy - sy * sy / n AS cyy,
                   sxy - sx * sy / n AS cxy FROM m),
      f AS (SELECT n, mx, my, cxx, cyy, cxy,
                   ((cyy - cxx) + sqrt((cyy - cxx) * (cyy - cxx)
                     + 4 * cxy * cxy)) / (2 * cxy) AS b FROM c)
      SELECT n::BIGINT AS n, 1.0 AS lambda, round(b, 6) AS slope,
             round(my - b * mx, 6) AS intercept,
             round(cxy / sqrt(cxx * cyy), 6) AS pearson_r FROM f"""))

  /** Wald/IV slope of price on quantity instrumented by line number,
    * with the OLS contrast and the weak-instrument first-stage F —
    * one moments scan, three fits as algebra. */
  private val q357 = Entry(
    "q357_iv_2sls",
    (s, d) =>
      graft.ops.Regression.ivTwoStage(Tables.lineitem(s, d),
          "l_extendedprice", "l_quantity", "l_linenumber")
        .select(col("n"), r6(col("beta_iv")).as("beta_iv"),
          r6(col("intercept_iv")).as("intercept_iv"),
          r6(col("beta_ols")).as("beta_ols"),
          r6(col("first_stage_f")).as("first_stage_f")),
    Some("""
      WITH m AS (SELECT count(*)::DOUBLE AS n,
                   sum(l_quantity)::DOUBLE AS sx,
                   sum(l_extendedprice)::DOUBLE AS sy,
                   sum(l_linenumber)::DOUBLE AS sz,
                   sum(l_quantity * l_quantity)::DOUBLE AS sxx,
                   sum(l_linenumber * l_linenumber)::DOUBLE AS szz,
                   sum(l_quantity * l_linenumber)::DOUBLE AS sxz,
                   sum(l_linenumber * l_extendedprice)::DOUBLE AS szy,
                   sum(l_quantity * l_extendedprice)::DOUBLE AS sxy
                 FROM lineitem),
      c AS (SELECT n, sx / n AS mx, sy / n AS my,
                   sxx - sx * sx / n AS cxx, szz - sz * sz / n AS czz,
                   sxz - sx * sz / n AS cxz, szy - sz * sy / n AS czy,
                   sxy - sx * sy / n AS cxy FROM m),
      f AS (SELECT n, mx, my, cxx, czy / cxz AS beta, cxy / cxx AS bols,
                   cxz * cxz / (cxx * czz) AS r2f FROM c)
      SELECT n::BIGINT AS n, round(beta, 6) AS beta_iv,
             round(my - beta * mx, 6) AS intercept_iv,
             round(bols, 6) AS beta_ols,
             round((n - 2) * r2f / (1 - r2f), 6) AS first_stage_f
      FROM f"""))

  /** Oaxaca–Blinder decomposition of the returned-vs-kept price gap
    * into the quantity-mix (explained) and pricing (unexplained)
    * parts — both group fits from ONE conditional-moments scan. */
  private val q358 = Entry(
    "q358_oaxaca_blinder",
    (s, d) =>
      graft.ops.Regression.oaxacaBlinder(Tables.lineitem(s, d),
          "l_quantity", "l_extendedprice",
          col("l_returnflag") === "R")
        .select(col("n_a"), col("n_b"), r6(col("mean_a")).as("mean_a"),
          r6(col("mean_b")).as("mean_b"), r6(col("gap")).as("gap"),
          r6(col("explained")).as("explained"),
          r6(col("unexplained")).as("unexplained")),
    Some("""
      WITH m AS (SELECT
          sum(CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0 END) AS na,
          sum(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1.0 END) AS nb,
          sum(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END)::DOUBLE AS sxa,
          sum(CASE WHEN l_returnflag = 'R' THEN 0 ELSE l_quantity END)::DOUBLE AS sxb,
          sum(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0 END)::DOUBLE AS sya,
          sum(CASE WHEN l_returnflag = 'R' THEN 0 ELSE l_extendedprice END)::DOUBLE AS syb,
          sum(CASE WHEN l_returnflag = 'R' THEN l_quantity * l_quantity ELSE 0 END)::DOUBLE AS sxxa,
          sum(CASE WHEN l_returnflag = 'R' THEN 0 ELSE l_quantity * l_quantity END)::DOUBLE AS sxxb,
          sum(CASE WHEN l_returnflag = 'R' THEN l_quantity * l_extendedprice ELSE 0 END)::DOUBLE AS sxya,
          sum(CASE WHEN l_returnflag = 'R' THEN 0 ELSE l_quantity * l_extendedprice END)::DOUBLE AS sxyb
        FROM lineitem),
      c AS (SELECT na, nb, sxa / na AS mxa, sxb / nb AS mxb,
                   sya / na AS mya, syb / nb AS myb,
                   (sxya - sxa * sya / na) / (sxxa - sxa * sxa / na) AS ba,
                   (sxyb - sxb * syb / nb) / (sxxb - sxb * sxb / nb) AS bb
            FROM m)
      SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b,
             round(mya, 6) AS mean_a, round(myb, 6) AS mean_b,
             round(mya - myb, 6) AS gap,
             round(bb * (mxa - mxb), 6) AS explained,
             round(((mya - ba * mxa) - (myb - bb * mxb))
               + (ba - bb) * mxa, 6) AS unexplained
      FROM c"""))

  /** Lin's concordance + Bland–Altman limits between gross and
    * discounted price (per-k$) — the method-comparison pair in one
    * moments scan. */
  private val q359 = Entry(
    "q359_concordance",
    (s, d) =>
      graft.ops.Evaluation.concordanceMetrics(
          Tables.lineitem(s, d).select(
            (col("l_extendedprice") / 1000).as("x"),
            (col("l_extendedprice") * (lit(1.0) - col("l_discount")) / 1000)
              .as("y")),
          "x", "y")
        .select(col("n"), r6(col("pearson_r")).as("pearson_r"),
          r6(col("ccc")).as("ccc"), r6(col("bias")).as("bias"),
          r6(col("sd_diff")).as("sd_diff"),
          r6(col("loa_low")).as("loa_low"),
          r6(col("loa_high")).as("loa_high")),
    Some("""
      WITH b AS (SELECT l_extendedprice / 1000 AS x,
                   l_extendedprice * (1 - l_discount) / 1000 AS y
                 FROM lineitem),
      m AS (SELECT count(*)::DOUBLE AS n, sum(x)::DOUBLE AS sx,
              sum(y)::DOUBLE AS sy, sum(x * x)::DOUBLE AS sxx,
              sum(y * y)::DOUBLE AS syy, sum(x * y)::DOUBLE AS sxy
            FROM b),
      c AS (SELECT n, (sxx - sx * sx / n) / n AS cxx,
                   (syy - sy * sy / n) / n AS cyy,
                   (sxy - sx * sy / n) / n AS cxy,
                   sx / n - sy / n AS dm,
                   sqrt((sxx + syy - 2 * sxy
                     - n * (sx / n - sy / n) * (sx / n - sy / n))
                     / (n - 1)) AS sd
            FROM m)
      SELECT n::BIGINT AS n,
             round(cxy / sqrt(cxx * cyy), 6) AS pearson_r,
             round(2 * cxy / (cxx + cyy + dm * dm), 6) AS ccc,
             round(dm, 6) AS bias, round(sd, 6) AS sd_diff,
             round(dm - 1.96 * sd, 6) AS loa_low,
             round(dm + 1.96 * sd, 6) AS loa_high
      FROM c"""))

  /** Variance inflation factors for the quantity/price/discount
    * feature trio — the multicollinearity screen off the inverse
    * correlation matrix (one pairwise-moments scan). */
  private val q360 = Entry(
    "q360_vif",
    (s, d) =>
      graft.analysis.AnalysisPlanner.vif(Tables.lineitem(s, d),
          Seq("l_quantity", "l_extendedprice", "l_discount"))
        .select(col("feature"), r6(col("r2_others")).as("r2_others"),
          r6(col("vif")).as("vif"))
        .orderBy("feature"),
    Some("""
      WITH c AS (SELECT corr(l_quantity, l_extendedprice) AS r12,
                   corr(l_quantity, l_discount) AS r13,
                   corr(l_extendedprice, l_discount) AS r23
                 FROM lineitem),
      v AS (SELECT 'l_quantity' AS feature,
              (r12 * r12 + r13 * r13 - 2 * r12 * r13 * r23)
                / (1 - r23 * r23) AS r2 FROM c
            UNION ALL
            SELECT 'l_extendedprice',
              (r12 * r12 + r23 * r23 - 2 * r12 * r23 * r13)
                / (1 - r13 * r13) FROM c
            UNION ALL
            SELECT 'l_discount',
              (r13 * r13 + r23 * r23 - 2 * r13 * r23 * r12)
                / (1 - r12 * r12) FROM c)
      SELECT feature, round(r2, 6) AS r2_others,
             round(1 / (1 - r2), 6) AS vif
      FROM v ORDER BY feature"""))

  /** Theil's uncertainty coefficient between event type and user
    * cohort — the DIRECTIONAL association readout Cramér's V can't
    * give (U(B|A) ≠ U(A|B)). */
  private val q361 = Entry(
    "q361_theil_u",
    (s, d) =>
      graft.analysis.AnalysisPlanner.theilU(
          Tables.events(s, d).select(col("event_type").as("et"),
            (col("user_id") % 5).cast("string").as("cohort")),
          "et", "cohort")
        .select(col("n"), r6(col("h_a")).as("h_a"),
          r6(col("h_b")).as("h_b"),
          r6(col("mutual_info")).as("mutual_info"),
          r6(col("u_b_given_a")).as("u_b_given_a"),
          r6(col("u_a_given_b")).as("u_a_given_b"),
          r6(col("u_symmetric")).as("u_symmetric")),
    Some("""
      WITH j AS (SELECT event_type AS a, (user_id % 5)::VARCHAR AS b,
                   count(*)::DOUBLE AS n
                 FROM events
                 WHERE event_type IS NOT NULL AND user_id IS NOT NULL
                 GROUP BY 1, 2),
      ra AS (SELECT a, sum(n) AS na FROM j GROUP BY 1),
      rb AS (SELECT b, sum(n) AS nb FROM j GROUP BY 1),
      t AS (SELECT sum(n) AS nn FROM j),
      agg AS (SELECT max(t.nn) AS nn,
                sum(j.n * ln(t.nn * j.n / (ra.na * rb.nb))) AS minum,
                sum(j.n * ln(ra.na)) AS slna,
                sum(j.n * ln(rb.nb)) AS slnb
              FROM j JOIN ra USING (a) JOIN rb USING (b), t)
      SELECT nn::BIGINT AS n,
             round(ln(nn) - slna / nn, 6) AS h_a,
             round(ln(nn) - slnb / nn, 6) AS h_b,
             round(minum / nn, 6) AS mutual_info,
             round((minum / nn) / (ln(nn) - slnb / nn), 6)
               AS u_b_given_a,
             round((minum / nn) / (ln(nn) - slna / nn), 6)
               AS u_a_given_b,
             round(2 * (minum / nn) /
               ((ln(nn) - slna / nn) + (ln(nn) - slnb / nn)), 6)
               AS u_symmetric
      FROM agg"""))

  /** Cochran's Q: do the event types share one "ever exceeded 50"
    * success rate per user (complete blocks only) — the binary
    * Friedman / k-treatment McNemar. */
  private val q362 = Entry(
    "q362_cochran_q",
    (s, d) =>
      graft.analysis.AnalysisPlanner.cochranQ(
          Tables.events(s, d).where(col("value").isNotNull)
            .select(col("user_id"), col("event_type"),
              when(col("value") > 50, 1.0).otherwise(0.0).as("succ")),
          "user_id", "event_type", "succ")
        .select(col("n_blocks"), col("n_treatments"), col("dof"),
          r6(col("q_stat")).as("q_stat")),
    Some("""
      WITH cells AS (SELECT user_id AS b, event_type AS t,
                       max(CASE WHEN "value" > 50 THEN 1.0 ELSE 0.0 END)
                         AS x
                     FROM events WHERE "value" IS NOT NULL
                     GROUP BY 1, 2),
      k AS (SELECT count(DISTINCT t) AS kk FROM cells),
      comp AS (SELECT b FROM cells GROUP BY b
               HAVING count(*) = (SELECT kk FROM k)),
      kept AS (SELECT cells.* FROM cells JOIN comp USING (b)),
      pb AS (SELECT b, sum(x) AS bi FROM kept GROUP BY 1),
      bb AS (SELECT count(*)::DOUBLE AS nb, sum(bi) AS tt,
               sum(bi * bi) AS b2 FROM pb),
      bt AS (SELECT count(*)::DOUBLE AS kk, sum(gj * gj) AS g2 FROM (
               SELECT t, sum(x) AS gj FROM kept GROUP BY 1))
      SELECT nb::BIGINT AS n_blocks, kk::BIGINT AS n_treatments,
             (kk - 1)::BIGINT AS dof,
             round(kk * (kk - 1) * (g2 - tt * tt / kk)
               / (kk * tt - b2), 6) AS q_stat
      FROM bb, bt"""))

  /** One-way ICC: how much of line-item quantity variance is the
    * ORDER rather than noise — continuous-rating reliability beside
    * the categorical agreement family. */
  private val q363 = Entry(
    "q363_icc",
    (s, d) =>
      graft.analysis.AnalysisPlanner.iccOneWay(Tables.lineitem(s, d),
          "l_orderkey", "l_quantity")
        .select(col("n"), col("n_groups"), r6(col("k0")).as("k0"),
          r6(col("ms_between")).as("ms_between"),
          r6(col("ms_within")).as("ms_within"),
          r6(col("icc1")).as("icc1")),
    Some("""
      WITH per AS (SELECT l_orderkey, count(*)::DOUBLE AS ni,
                     sum(l_quantity)::DOUBLE AS si,
                     sum(l_quantity * l_quantity)::DOUBLE AS qi
                   FROM lineitem GROUP BY 1),
      agg AS (SELECT sum(ni) AS nn, count(*)::DOUBLE AS g,
                sum(si) AS s, sum(qi) AS q,
                sum(si * si / ni) AS a, sum(ni * ni) AS n2
              FROM per),
      f AS (SELECT nn, g, (nn - n2 / nn) / (g - 1) AS k0,
              (a - s * s / nn) / (g - 1) AS msb,
              (q - a) / (nn - g) AS msw
            FROM agg)
      SELECT nn::BIGINT AS n, g::BIGINT AS n_groups,
             round(k0, 6) AS k0, round(msb, 6) AS ms_between,
             round(msw, 6) AS ms_within,
             round((msb - msw) / (msb + (k0 - 1) * msw), 6) AS icc1
      FROM f"""))

  /** Page's trend test: does quantity INCREASE along line number
    * (1→2→3) within an order — the directional Friedman, complete
    * blocks only. */
  private val q364 = Entry(
    "q364_page_trend",
    (s, d) =>
      graft.analysis.AnalysisPlanner.pageTrend(
          Tables.lineitem(s, d).where(col("l_linenumber") <= 3),
          "l_orderkey", "l_linenumber", "l_quantity",
          col("l_linenumber"))
        .select(col("n_blocks"), col("n_treatments"),
          r6(col("l_stat")).as("l_stat"), r6(col("e_l")).as("e_l"),
          r6(col("z")).as("z")),
    Some("""
      WITH cells AS (SELECT l_orderkey AS b, l_linenumber AS t,
                       avg(l_quantity)::DOUBLE AS m,
                       l_linenumber::DOUBLE AS c
                     FROM lineitem WHERE l_linenumber <= 3
                     GROUP BY 1, 2),
      k AS (SELECT count(DISTINCT t) AS kk FROM cells),
      comp AS (SELECT b FROM cells GROUP BY b
               HAVING count(*) = (SELECT kk FROM k)),
      kept AS (SELECT cells.* FROM cells JOIN comp USING (b)),
      rk AS (SELECT b, t, c,
               rank() OVER (PARTITION BY b ORDER BY m) - 1
                 + (count(*) OVER (PARTITION BY b, m) + 1) / 2.0 AS r
             FROM kept),
      pt AS (SELECT t, max(c) AS cj, sum(r) AS rj,
               count(*)::DOUBLE AS nb
             FROM rk GROUP BY 1),
      f AS (SELECT max(nb) AS n, count(*)::DOUBLE AS kk,
              sum(cj * rj) AS l FROM pt)
      SELECT n::BIGINT AS n_blocks, kk::BIGINT AS n_treatments,
             round(l, 6) AS l_stat,
             round(n * kk * (kk + 1) * (kk + 1) / 4, 6) AS e_l,
             round((l - n * kk * (kk + 1) * (kk + 1) / 4)
               / sqrt(n * kk * kk * (kk + 1) * (kk * kk - 1) / 144.0), 6)
               AS z
      FROM f"""))

  /** Matthews correlation across score cutoffs (top 20 by MCC) — the
    * class-imbalance-robust threshold picker beside Youden's J, read
    * off the same distinct-score prefix frame. */
  private val q365 = Entry(
    "q365_mcc_curve",
    (s, d) =>
      graft.ops.Evaluation.mccByThreshold(scoredOrders(s, d), "label",
          "score")
        .select(r6(col("threshold")).as("threshold"), col("tp"),
          col("fp"), col("fn"), col("tn"), r6(col("mcc")).as("mcc"),
          r6(col("f1")).as("f1"))
        .orderBy(desc("mcc"), col("threshold"))
        .limit(20),
    Some(s"""
      WITH $scoredOrdersSql,
      v AS (SELECT p, sum(y) AS pos, count(*)::DOUBLE AS tot
            FROM sc GROUP BY 1),
      w AS (SELECT p, pos, tot,
              coalesce(sum(pos) OVER (ORDER BY p DESC ROWS BETWEEN
                UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pab,
              coalesce(sum(tot) OVER (ORDER BY p DESC ROWS BETWEEN
                UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tab
            FROM v),
      t AS (SELECT sum(y) AS np, count(*)::DOUBLE AS nn FROM sc),
      cell AS (SELECT p, pab + pos AS tp,
                 (tab + tot) - (pab + pos) AS fp,
                 np - (pab + pos) AS fn,
                 nn - np - ((tab + tot) - (pab + pos)) AS tn
               FROM w, t)
      SELECT round(p, 6) AS threshold, tp::BIGINT AS tp,
             fp::BIGINT AS fp, fn::BIGINT AS fn, tn::BIGINT AS tn,
             round((tp * tn - fp * fn) /
               sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)), 6)
               AS mcc,
             round(2 * tp / (2 * tp + fp + fn), 6) AS f1
      FROM cell
      ORDER BY mcc DESC, threshold LIMIT 20"""))

  /** E-value for unmeasured confounding on the purchase→big-value
    * risk ratio — the observational-RR sensitivity readout. */
  private val q366 = Entry(
    "q366_e_value",
    (s, d) =>
      graft.ops.Evaluation.eValue(Tables.events(s, d),
          col("event_type") === "purchase", col("value") > 100)
        .select(col("n"), col("n_exposed"), r6(col("rr")).as("rr"),
          r6(col("rr_ci_low")).as("rr_ci_low"),
          r6(col("rr_ci_high")).as("rr_ci_high"),
          r6(col("e_value")).as("e_value"),
          r6(col("e_value_ci")).as("e_value_ci")),
    Some("""
      WITH m AS (SELECT count(*) AS n,
          sum(CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0 END)
            AS n1,
          sum(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1.0 END)
            AS n0,
          sum(CASE WHEN event_type = 'purchase'
                AND coalesce("value" > 100, FALSE) THEN 1.0 ELSE 0 END)
            AS a,
          sum(CASE WHEN event_type <> 'purchase'
                AND coalesce("value" > 100, FALSE) THEN 1.0 ELSE 0 END)
            AS c
        FROM events),
      f AS (SELECT n, n1, (a / n1) / (c / n0) AS rr,
              sqrt(1 / a - 1 / n1 + 1 / c - 1 / n0) AS se FROM m),
      g AS (SELECT n, n1, rr, exp(ln(rr) - 1.96 * se) AS lo,
              exp(ln(rr) + 1.96 * se) AS hi FROM f),
      h AS (SELECT n, n1, rr, lo, hi,
              CASE WHEN rr >= 1 THEN rr ELSE 1 / rr END AS rs,
              CASE WHEN rr >= 1 THEN lo ELSE hi END AS nearn
            FROM g)
      SELECT n, n1::BIGINT AS n_exposed, round(rr, 6) AS rr,
             round(lo, 6) AS rr_ci_low, round(hi, 6) AS rr_ci_high,
             round(rs + sqrt(rs * (rs - 1)), 6) AS e_value,
             CASE WHEN (rr >= 1 AND lo > 1) OR (rr < 1 AND hi < 1)
               THEN round((CASE WHEN nearn >= 1 THEN nearn
                             ELSE 1 / nearn END)
                 + sqrt((CASE WHEN nearn >= 1 THEN nearn
                           ELSE 1 / nearn END)
                   * ((CASE WHEN nearn >= 1 THEN nearn
                        ELSE 1 / nearn END) - 1)), 6)
             END AS e_value_ci
      FROM h"""))

  /** AR(2) Yule–Walker fit of the daily event-value series — momentum
    * vs oscillation off the q147 ACF machinery. */
  private val q367 = Entry(
    "q367_yule_walker",
    (s, d) =>
      graft.ops.Regression.yuleWalkerAr2(Tables.events(s, d), "ts",
          "value")
        .select(col("n_days"), r6(col("r1")).as("r1"),
          r6(col("r2")).as("r2"), r6(col("phi1")).as("phi1"),
          r6(col("phi2")).as("phi2"), r6(col("sigma2")).as("sigma2")),
    Some("""
      WITH daily AS (SELECT datediff('day', DATE '1970-01-01', ts::DATE)
                       AS t, avg("value") AS x
                     FROM events
                     WHERE "value" IS NOT NULL AND ts IS NOT NULL
                     GROUP BY 1),
      st AS (SELECT count(*)::DOUBLE AS n, sum(x) / count(*) AS m,
               sum(x * x) - sum(x) * sum(x) / count(*) AS den
             FROM daily),
      r1 AS (SELECT sum((a.x - st.m) * (b.x - st.m)) / max(st.den) AS r1
             FROM daily a JOIN daily b ON a.t + 1 = b.t, st),
      r2 AS (SELECT sum((a.x - st.m) * (b.x - st.m)) / max(st.den) AS r2
             FROM daily a JOIN daily b ON a.t + 2 = b.t, st),
      f AS (SELECT st.n, st.den / st.n AS c0, r1.r1, r2.r2,
              r1.r1 * (1 - r2.r2) / (1 - r1.r1 * r1.r1) AS p1,
              (r2.r2 - r1.r1 * r1.r1) / (1 - r1.r1 * r1.r1) AS p2
            FROM st, r1, r2)
      SELECT n::BIGINT AS n_days, round(r1, 6) AS r1,
             round(r2, 6) AS r2, round(p1, 6) AS phi1,
             round(p2, 6) AS phi2,
             round(c0 * (1 - p1 * r1 - p2 * r2), 6) AS sigma2
      FROM f"""))

  /** Systematic PPS document sample (100 points, half-step start, no
    * RNG): heavy documents are certainty units, Σ hits = 100 exactly —
    * the HT-estimator-ready curation draw. */
  private val q368 = Entry(
    "q368_pps_sample",
    (s, d) =>
      graft.ops.Sampling.ppsSystematic(Tables.documents(s, d), 100,
          "n_chars", "doc_id")
        .select(col("doc_id"), col("n_chars"), col("n_hits"),
          r6(col("cum_before")).as("cum_before"))
        .orderBy("doc_id"),
    Some("""
      WITH base AS (SELECT doc_id, n_chars, n_chars::DOUBLE AS w
                    FROM documents
                    WHERE n_chars IS NOT NULL AND n_chars > 0
                      AND doc_id IS NOT NULL),
      t AS (SELECT sum(w) AS tt FROM base),
      pre AS (SELECT doc_id, n_chars, w,
                coalesce(sum(w) OVER (ORDER BY doc_id ROWS BETWEEN
                  UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
              FROM base),
      sel AS (SELECT doc_id, n_chars, cb,
                floor(round((cb + w - tt / 200) / (tt / 100), 6))
                  - floor(round((cb - tt / 200) / (tt / 100), 6))
                  AS n_hits
              FROM pre, t)
      SELECT doc_id, n_chars, n_hits::BIGINT AS n_hits,
             round(cb, 6) AS cum_before
      FROM sel WHERE n_hits >= 1 ORDER BY doc_id"""))

  /** Embedding-space isotropy: share of embedding energy NOT explained
    * by the common mean direction — the "should I mean-center before
    * retrieval" readout. */
  private val q369 = Entry(
    "q369_isotropy",
    (s, d) =>
      graft.ops.Similarity.isotropyProfile(Tables.embeddings(s, d),
          "embedding")
        .select(col("n"), col("dim"),
          r6(col("mean_vec_norm")).as("mean_vec_norm"),
          r6(col("avg_vec_norm")).as("avg_vec_norm"),
          r6(col("avg_cos_to_mean")).as("avg_cos_to_mean"),
          r6(col("isotropy")).as("isotropy")),
    Some("""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                 FROM embeddings WHERE embedding IS NOT NULL),
      u0 AS (SELECT vec_id, v,
               unnest(generate_series(1, len(v))) AS i FROM e),
      u AS (SELECT vec_id, i, v[i] AS x FROM u0),
      mu AS (SELECT i, sum(x) / count(*) AS m FROM u GROUP BY 1),
      mn AS (SELECT sqrt(sum(m * m)) AS mnorm, count(*) AS dim FROM mu),
      per AS (SELECT u.vec_id, sum(u.x * mu.m) AS dotm,
                sqrt(sum(u.x * u.x)) AS nrm, sum(u.x * u.x) AS sq
              FROM u JOIN mu USING (i) GROUP BY 1),
      agg AS (SELECT count(*) AS n, avg(dotm / (nrm * mn.mnorm))
                AS avgcos, avg(sq) AS avgsq, avg(nrm) AS avgnrm
              FROM per, mn GROUP BY mn.mnorm)
      SELECT n, mn.dim::BIGINT AS dim, round(mn.mnorm, 6)
               AS mean_vec_norm,
             round(avgnrm, 6) AS avg_vec_norm,
             round(avgcos, 6) AS avg_cos_to_mean,
             round(1 - mn.mnorm * mn.mnorm / avgsq, 6) AS isotropy
      FROM agg, mn"""))

  /** Scott's π and Gwet's AC1 beside Cohen — the prevalence-robust
    * agreement pair on a two-rater readout derived from return flag
    * vs line status. */
  private val q370 = Entry(
    "q370_gwet_scott",
    (s, d) =>
      graft.ops.Evaluation.gwetScottAgreement(
          Tables.lineitem(s, d).select(col("l_returnflag").as("a"),
            when(col("l_linestatus") === "F", lit("R"))
              .otherwise(lit("N")).as("b")),
          "a", "b")
        .select(col("n"), col("n_categories"), r6(col("po")).as("po"),
          r6(col("pe_scott")).as("pe_scott"),
          r6(col("scott_pi")).as("scott_pi"),
          r6(col("pe_gwet")).as("pe_gwet"),
          r6(col("gwet_ac1")).as("gwet_ac1")),
    Some("""
      WITH b0 AS (SELECT l_returnflag AS a,
                    CASE WHEN l_linestatus = 'F' THEN 'R' ELSE 'N' END
                      AS b
                  FROM lineitem),
      j AS (SELECT a, b, count(*)::DOUBLE AS n FROM b0 GROUP BY 1, 2),
      ma AS (SELECT a AS k, sum(n) AS na FROM j GROUP BY 1),
      mb AS (SELECT b AS k, sum(n) AS nb FROM j GROUP BY 1),
      pooled AS (SELECT coalesce(ma.na, 0) AS na,
                   coalesce(mb.nb, 0) AS nb
                 FROM ma FULL OUTER JOIN mb USING (k)),
      t AS (SELECT sum(n) AS nn,
              sum(CASE WHEN a = b THEN n ELSE 0 END) AS agree FROM j),
      p AS (SELECT count(*)::DOUBLE AS q,
              sum((na + nb) * (na + nb)) AS sq2 FROM pooled),
      f AS (SELECT t.nn, p.q, t.agree / t.nn AS po,
              p.sq2 / (4 * t.nn * t.nn) AS pes,
              (1 - p.sq2 / (4 * t.nn * t.nn)) / (p.q - 1) AS peg
            FROM t, p)
      SELECT nn::BIGINT AS n, q::BIGINT AS n_categories,
             round(po, 6) AS po, round(pes, 6) AS pe_scott,
             round((po - pes) / (1 - pes), 6) AS scott_pi,
             round(peg, 6) AS pe_gwet,
             round((po - peg) / (1 - peg), 6) AS gwet_ac1
      FROM f"""))

  /** Global graph clustering summary over the co-supplier graph:
    * transitivity (3·triangles/wedges) vs average LOCAL clustering —
    * the one-row readout composed from q164's per-node frame. */
  private val q371 = Entry(
    "q371_transitivity",
    (s, d) => {
      val b = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("bk"), col("l_suppkey").as("it"))
        .distinct()
      val e = b.as("l")
        .join(b.as("r"),
          col("l.bk") === col("r.bk") && col("l.it") < col("r.it"))
        .select(col("l.it").as("s1"), col("r.it").as("s2"))
      graft.ops.Graph.triangleStats(e, "s1", "s2", minCount = 5)
        .agg(count(lit(1)).as("n_nodes"),
          (sum(col("degree")) / 2).cast("long").as("n_edges"),
          (sum(col("triangles")) / 3).cast("long").as("n_triangles"),
          r6(sum(col("triangles")) /
            sum(col("degree") * (col("degree") - 1) / 2.0))
            .as("transitivity"),
          r6(avg(col("clustering_coeff"))).as("avg_clustering"))
    },
    Some("""
      WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_suppkey AS it
                 FROM lineitem),
      e AS (SELECT l.it AS u, r.it AS v
            FROM b l JOIN b r ON l.bk = r.bk AND l.it < r.it
            GROUP BY 1, 2 HAVING count(*) >= 5),
      deg AS (SELECT node, count(*) AS degree FROM (
                SELECT u AS node FROM e UNION ALL SELECT v FROM e)
              GROUP BY 1),
      tri AS (SELECT e1.u AS a, e1.v AS b2, e2.v AS c
              FROM e e1 JOIN e e2 ON e1.v = e2.u
                        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
      pn AS (SELECT node, count(*) AS triangles FROM (
               SELECT a AS node FROM tri
               UNION ALL SELECT b2 FROM tri
               UNION ALL SELECT c FROM tri) GROUP BY 1),
      per AS (SELECT deg.node, deg.degree,
                coalesce(pn.triangles, 0) AS triangles,
                CASE WHEN deg.degree >= 2 THEN
                  2.0 * coalesce(pn.triangles, 0) /
                  (deg.degree * (deg.degree - 1.0))
                ELSE 0.0 END AS cc
              FROM deg LEFT JOIN pn USING (node))
      SELECT count(*) AS n_nodes,
             (sum(degree) / 2)::BIGINT AS n_edges,
             (sum(triangles) / 3)::BIGINT AS n_triangles,
             round(sum(triangles) /
               sum(degree * (degree - 1) / 2.0), 6) AS transitivity,
             round(avg(cc), 6) AS avg_clustering
      FROM per"""))

  /** Fligner–Killeen scale test of event values across event types —
    * the normal-scores member of the variance-homogeneity trio beside
    * q166's Brown–Forsythe; oracle replays Acklam's probit from the
    * same coefficient list. */
  private val q372 = Entry(
    "q372_fligner_killeen",
    (s, d) =>
      graft.analysis.AnalysisPlanner.flignerKilleenFromCells(
          eventTypeValueCells(s, d))
        .select(col("n"), col("n_groups"), col("dof"),
          r6(col("fk_stat")).as("fk_stat")),
    Some {
      val a = Seq(-3.969683028665376e+01, 2.209460984245205e+02,
        -2.759285104469687e+02, 1.383577518672690e+02,
        -3.066479806614716e+01, 2.506628277459239e+00)
      val b = Seq(-5.447609879822406e+01, 1.615858368580409e+02,
        -1.556989798598866e+02, 6.680131188771972e+01,
        -1.328068155288572e+01)
      val c = Seq(-7.784894002430293e-03, -3.223964580411365e-01,
        -2.400758277161838e+00, -2.549732539343734e+00,
        4.374664141464968e+00, 2.938163982698783e+00)
      val dd = Seq(7.784695709041462e-03, 3.224671290700398e-01,
        2.445134137142996e+00, 3.754408661907416e+00)
      def h(cs: Seq[Double], x: String): String =
        cs.tail.foldLeft(cs.head.toString)((acc, k) =>
          s"($acc * $x + $k)")
      s"""
      WITH med AS (SELECT event_type AS g,
                     quantile_cont("value", 0.5) AS md
                   FROM events WHERE "value" IS NOT NULL GROUP BY 1),
      z AS (SELECT e.event_type AS g, abs(e."value" - med.md) AS z
            FROM events e JOIN med ON e.event_type = med.g
            WHERE e."value" IS NOT NULL),
      vc AS (SELECT z AS v, g, count(*)::DOUBLE AS cg
             FROM z GROUP BY 1, 2),
      pv AS (SELECT v, sum(cg) AS ct FROM vc GROUP BY 1),
      pre AS (SELECT v, ct,
                coalesce(sum(ct) OVER (ORDER BY v ROWS BETWEEN
                  UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ex
              FROM pv),
      nn AS (SELECT sum(ct) AS n FROM pv),
      rk AS (SELECT v, ex + (ct + 1) / 2.0 AS r FROM pre),
      pr AS (SELECT vc.g, vc.cg,
               0.5 + rk.r / (2 * (nn.n + 1)) AS p
             FROM vc JOIN rk USING (v), nn),
      q0 AS (SELECT g, cg, p, p - 0.5 AS qc,
               (p - 0.5) * (p - 0.5) AS rc,
               sqrt(-2.0 * ln(p)) AS ql,
               sqrt(-2.0 * ln(1.0 - p)) AS qu
             FROM pr),
      sc AS (SELECT g, cg,
               CASE WHEN p < 0.02425 THEN
                 ${h(c, "ql")} / (${h(dd, "ql")} * ql + 1.0)
               WHEN p > 0.97575 THEN
                 -(${h(c, "qu")} / (${h(dd, "qu")} * qu + 1.0))
               ELSE ${h(a, "rc")} * qc / (${h(b, "rc")} * rc + 1.0)
               END AS sa
             FROM q0),
      pg AS (SELECT g, sum(cg) AS ng, sum(cg * sa) AS sag
             FROM sc GROUP BY 1),
      gl AS (SELECT sum(cg * sa) AS s1, sum(cg * sa * sa) AS s2,
               sum(cg) AS n FROM sc),
      f AS (SELECT gl.n, count(*)::DOUBLE AS k,
              sum(ng * power(sag / ng - gl.s1 / gl.n, 2)) AS num,
              (gl.s2 - gl.s1 * gl.s1 / gl.n) / (gl.n - 1) AS s2a
            FROM pg, gl GROUP BY gl.n, gl.s1, gl.s2)
      SELECT n::BIGINT AS n, k::BIGINT AS n_groups,
             (k - 1)::BIGINT AS dof, round(num / s2a, 6) AS fk_stat
      FROM f"""
    })

  /** Brunner–Munzel test: P(returned < kept quantity) + ½P(=) vs ½ —
    * the unequal-variance-safe Wilcoxon, exact midranks from one
    * value-count frame. */
  private val q373 = Entry(
    "q373_brunner_munzel",
    (s, d) =>
      graft.analysis.AnalysisPlanner.brunnerMunzel(
          Tables.lineitem(s, d), "l_quantity",
          col("l_returnflag") === "R")
        .select(col("n_a"), col("n_b"), r6(col("p_hat")).as("p_hat"),
          r6(col("bm_stat")).as("bm_stat"), r6(col("dof")).as("dof")),
    Some("""
      WITH vc AS (SELECT l_quantity::DOUBLE AS v,
              sum(CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0 END)
                AS ca,
              sum(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1.0 END)
                AS cb
            FROM lineitem GROUP BY 1),
      pre AS (SELECT v, ca, cb,
               coalesce(sum(ca) OVER (ORDER BY v ROWS BETWEEN
                 UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS exa,
               coalesce(sum(cb) OVER (ORDER BY v ROWS BETWEEN
                 UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS exb
             FROM vc),
      r AS (SELECT v, ca, cb,
              exa + exb + (ca + cb + 1) / 2.0 AS rc,
              exa + (ca + 1) / 2.0 AS ra,
              exb + (cb + 1) / 2.0 AS rb
            FROM pre),
      t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM vc),
      m AS (SELECT sum(ca * rc) / t.na AS m1,
              sum(cb * rc) / t.nb AS m2
            FROM r, t GROUP BY t.na, t.nb),
      f AS (SELECT t.na AS n1, t.nb AS n2, m.m1, m.m2,
              sum(ca * power(rc - ra - m.m1 + (t.na + 1) / 2, 2))
                / (t.na - 1) AS v1,
              sum(cb * power(rc - rb - m.m2 + (t.nb + 1) / 2, 2))
                / (t.nb - 1) AS v2
            FROM r, t, m GROUP BY t.na, t.nb, m.m1, m.m2)
      SELECT n1::BIGINT AS n_a, n2::BIGINT AS n_b,
             round((m2 - (n2 + 1) / 2) / n1, 6) AS p_hat,
             round(n1 * n2 * (m2 - m1) / (n1 + n2)
               / sqrt(n1 * v1 + n2 * v2), 6) AS bm_stat,
             round(power(n1 * v1 + n2 * v2, 2) /
               (power(n1 * v1, 2) / (n1 - 1)
                 + power(n2 * v2, 2) / (n2 - 1)), 6) AS dof
      FROM f"""))

  /** Bowker symmetry test on the q370 paired-label square: is the
    * disagreement FLOW directional (N→R vs R→N) — the k-category
    * McNemar. */
  private val q374 = Entry(
    "q374_bowker",
    (s, d) =>
      graft.analysis.AnalysisPlanner.bowkerTest(
          Tables.lineitem(s, d).select(col("l_returnflag").as("a"),
            when(col("l_linestatus") === "F", lit("R"))
              .otherwise(lit("N")).as("b")),
          "a", "b")
        .select(col("n"), col("n_categories"), col("dof"),
          r6(col("chi2")).as("chi2")),
    Some("""
      WITH b0 AS (SELECT l_returnflag AS a,
                    CASE WHEN l_linestatus = 'F' THEN 'R' ELSE 'N' END
                      AS b
                  FROM lineitem),
      j AS (SELECT a, b, count(*)::DOUBLE AS n FROM b0 GROUP BY 1, 2),
      tr AS (SELECT b AS a, a AS b, n AS nt FROM j),
      p AS (SELECT coalesce(j.n, 0) AS nij, coalesce(tr.nt, 0) AS nji
            FROM j FULL OUTER JOIN tr USING (a, b)
            WHERE a < b AND coalesce(j.n, 0) + coalesce(tr.nt, 0) > 0),
      t AS (SELECT sum(n) AS nn,
              greatest(count(DISTINCT a), count(DISTINCT b)) AS k
            FROM j)
      SELECT t.nn::BIGINT AS n, t.k::BIGINT AS n_categories,
             count(*)::BIGINT AS dof,
             round(sum(power(nij - nji, 2) / (nij + nji)), 6) AS chi2
      FROM p, t GROUP BY t.nn, t.k"""))

  /** Chapman capture–recapture: estimate the true document universe
    * from two overlapping capture lists (doc_id mod 2 / mod 3 slices
    * — true N is the full corpus, recoverable to sampling error). */
  private val q375 = Entry(
    "q375_chapman_overlap",
    (s, d) =>
      graft.ops.Dedup.chapmanOverlap(Tables.documents(s, d), "doc_id",
          col("doc_id") % 2 === 0, col("doc_id") % 3 === 0)
        .select(col("n_a"), col("n_b"), col("n_overlap"),
          col("n_union"),
          r6(col("chapman_estimate")).as("chapman_estimate"),
          r6(col("se")).as("se"),
          r6(col("unseen_estimate")).as("unseen_estimate")),
    Some("""
      WITH per AS (SELECT doc_id,
              max(CASE WHEN doc_id % 2 = 0 THEN 1.0 ELSE 0 END) AS a,
              max(CASE WHEN doc_id % 3 = 0 THEN 1.0 ELSE 0 END) AS b
            FROM documents WHERE doc_id IS NOT NULL GROUP BY 1
            HAVING max(CASE WHEN doc_id % 2 = 0 THEN 1.0 ELSE 0 END)
              + max(CASE WHEN doc_id % 3 = 0 THEN 1.0 ELSE 0 END) > 0),
      f AS (SELECT sum(a) AS n1, sum(b) AS n2, sum(a * b) AS m,
              count(*)::DOUBLE AS u FROM per)
      SELECT n1::BIGINT AS n_a, n2::BIGINT AS n_b, m::BIGINT
               AS n_overlap, u::BIGINT AS n_union,
             round((n1 + 1) * (n2 + 1) / (m + 1) - 1, 6)
               AS chapman_estimate,
             round(sqrt((n1 + 1) * (n2 + 1) * (n1 - m) * (n2 - m)
               / (power(m + 1, 2) * (m + 2))), 6) AS se,
             greatest(round(((n1 + 1) * (n2 + 1) / (m + 1) - 1) - u, 6),
               0.0) AS unseen_estimate
      FROM f"""))

  /** Delete-one-supplier-bucket jackknife SE for revenue-per-unit —
    * the clustered-resampling-correct uncertainty for a ratio metric,
    * closed form from one grouped scan. */
  private val q376 = Entry(
    "q376_jackknife_ratio",
    (s, d) =>
      graft.analysis.AnalysisPlanner.jackknifeRatio(
          Tables.lineitem(s, d), col("l_suppkey") % 32,
          "l_extendedprice", "l_quantity")
        .select(col("n_groups"), r6(col("ratio")).as("ratio"),
          r6(col("ratio_jack")).as("ratio_jack"),
          r6(col("se_jack")).as("se_jack"),
          r6(col("ci_low")).as("ci_low"),
          r6(col("ci_high")).as("ci_high")),
    Some("""
      WITH per AS (SELECT l_suppkey % 32 AS g,
              sum(l_extendedprice)::DOUBLE AS yg,
              sum(l_quantity)::DOUBLE AS xg
            FROM lineitem GROUP BY 1),
      t AS (SELECT sum(yg) AS sy, sum(xg) AS sx,
              count(*)::DOUBLE AS gg FROM per),
      loo AS (SELECT t.sy, t.sx, t.gg,
                (t.sy - yg) / (t.sx - xg) AS rg FROM per, t),
      m AS (SELECT avg(rg) AS rbar FROM loo),
      f AS (SELECT max(sy) / max(sx) AS r, max(gg) AS gg,
              max(m.rbar) AS rbar,
              sqrt((max(gg) - 1) / max(gg)
                * sum(power(rg - m.rbar, 2))) AS se
            FROM loo, m)
      SELECT gg::BIGINT AS n_groups, round(r, 6) AS ratio,
             round(gg * r - (gg - 1) * rbar, 6) AS ratio_jack,
             round(se, 6) AS se_jack,
             round(r - 1.96 * se, 6) AS ci_low,
             round(r + 1.96 * se, 6) AS ci_high
      FROM f"""))

  /** Welch's heteroscedastic ANOVA of event values across event types
    * — the unequal-variance-safe F (the test to trust when q166/q372
    * reject equal scales). */
  private val q377 = Entry(
    "q377_welch_anova",
    (s, d) =>
      graft.analysis.AnalysisPlanner.welchAnova(Tables.events(s, d),
          "event_type", "value")
        .select(col("n"), col("n_groups"), r6(col("f_stat")).as("f_stat"),
          col("df1"), r6(col("df2")).as("df2")),
    Some("""
      WITH g AS (SELECT event_type, count(*)::DOUBLE AS ng,
                   avg("value") AS m, var_samp("value") AS s2
                 FROM events WHERE "value" IS NOT NULL
                 GROUP BY 1 HAVING count(*) >= 2
                   AND var_samp("value") > 0),
      w AS (SELECT *, ng / s2 AS wg FROM g),
      t AS (SELECT sum(wg) AS sw, sum(wg * m) AS swm,
              count(*)::DOUBLE AS k, sum(ng) AS nn FROM w),
      f AS (SELECT t.nn, t.k,
              sum(wg * power(m - t.swm / t.sw, 2)) / (t.k - 1) AS num,
              sum(power(1 - wg / t.sw, 2) / (ng - 1)) AS lam
            FROM w, t GROUP BY t.nn, t.k)
      SELECT nn::BIGINT AS n, k::BIGINT AS n_groups,
             round(num / (1 + 2 * (k - 2) / (k * k - 1) * lam), 6)
               AS f_stat,
             (k - 1)::BIGINT AS df1,
             round((k * k - 1) / (3 * lam), 6) AS df2
      FROM f"""))

  /** ANOVA effect sizes η²/ω² for event values by type — "the F is
    * significant at corpus n, but is the effect LARGE?". */
  private val q378 = Entry(
    "q378_effect_sizes",
    (s, d) =>
      graft.analysis.AnalysisPlanner.anovaEffectSizes(
          Tables.events(s, d), "event_type", "value")
        .select(col("n"), col("n_groups"),
          r6(col("ss_between")).as("ss_between"),
          r6(col("ss_within")).as("ss_within"),
          r6(col("eta_sq")).as("eta_sq"),
          r6(col("omega_sq")).as("omega_sq")),
    Some("""
      WITH g AS (SELECT event_type, count(*)::DOUBLE AS ng,
                   sum("value") AS sg,
                   sum("value" * "value") AS qg
                 FROM events WHERE "value" IS NOT NULL GROUP BY 1),
      a AS (SELECT sum(ng) AS nn, count(*)::DOUBLE AS k, sum(sg) AS s,
              sum(qg) AS q, sum(sg * sg / ng) AS aa FROM g),
      f AS (SELECT nn, k, aa - s * s / nn AS ssb, q - aa AS ssw
            FROM a)
      SELECT nn::BIGINT AS n, k::BIGINT AS n_groups,
             round(ssb, 6) AS ss_between, round(ssw, 6) AS ss_within,
             round(ssb / (ssb + ssw), 6) AS eta_sq,
             round((ssb - (k - 1) * (ssw / (nn - k)))
               / ((ssb + ssw) + ssw / (nn - k)), 6) AS omega_sq
      FROM f"""))

  /** Weighted percentiles of price with QUANTITY as the weight — "the
    * price below which half the UNITS ship" vs the row median. */
  private val q379 = Entry(
    "q379_weighted_median",
    (s, d) =>
      graft.analysis.AnalysisPlanner.weightedPercentiles(
          Tables.lineitem(s, d), "l_extendedprice", "l_quantity",
          Seq(0.25, 0.5, 0.75, 0.9))
        .select(col("p"), r6(col("value")).as("value"),
          r6(col("cum_weight")).as("cum_weight"),
          r6(col("total_weight")).as("total_weight"))
        .orderBy("p"),
    Some("""
      WITH vc AS (SELECT l_extendedprice::DOUBLE AS v,
                    sum(l_quantity)::DOUBLE AS w
                  FROM lineitem
                  WHERE l_extendedprice IS NOT NULL AND l_quantity > 0
                  GROUP BY 1),
      pre AS (SELECT v, w,
                coalesce(sum(w) OVER (ORDER BY v ROWS BETWEEN
                  UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
              FROM vc),
      t AS (SELECT sum(w) AS tot FROM vc),
      ps AS (SELECT unnest([0.25, 0.5, 0.75, 0.9]) AS p)
      SELECT p, round(v, 6) AS value,
             round(bef + w, 6) AS cum_weight, round(tot, 6)
               AS total_weight
      FROM ps, pre, t
      WHERE bef < p * tot AND bef + w >= p * tot
      ORDER BY p"""))

  /** Linear + quadratic weighted kappa on a near-diagonal ordinal
    * rating pair — distance-aware agreement where plain kappa
    * over-penalizes near misses. */
  private val q380 = Entry(
    "q380_weighted_kappa",
    (s, d) =>
      graft.ops.Evaluation.weightedKappa(
          Tables.lineitem(s, d).select(
            floor(col("l_quantity") / 10).as("a"),
            floor(least(col("l_quantity") + col("l_linenumber") - 1,
              lit(50)) / 10).as("b")),
          "a", "b")
        .select(col("n"), r6(col("po_linear")).as("po_linear"),
          r6(col("pe_linear")).as("pe_linear"),
          r6(col("kappa_linear")).as("kappa_linear"),
          r6(col("po_quadratic")).as("po_quadratic"),
          r6(col("pe_quadratic")).as("pe_quadratic"),
          r6(col("kappa_quadratic")).as("kappa_quadratic")),
    Some("""
      WITH b0 AS (SELECT floor(l_quantity / 10)::DOUBLE AS a,
                    floor(least(l_quantity + l_linenumber - 1, 50)
                      / 10)::DOUBLE AS b
                  FROM lineitem),
      j AS (SELECT a, b, count(*)::DOUBLE AS n FROM b0 GROUP BY 1, 2),
      ma AS (SELECT a AS k, sum(n) AS na FROM j GROUP BY 1),
      mb AS (SELECT b AS k, sum(n) AS nb FROM j GROUP BY 1),
      r AS (SELECT greatest(max(a), max(b)) - least(min(a), min(b))
              AS rr, sum(n) AS nn FROM j),
      po AS (SELECT sum(n * (1 - abs(a - b) / r.rr)) AS pol,
               sum(n * (1 - power((a - b) / r.rr, 2))) AS poq
             FROM j, r GROUP BY r.rr),
      pe AS (SELECT sum(ma.na * mb.nb * (1 - abs(ma.k - mb.k) / r.rr))
               AS pel,
               sum(ma.na * mb.nb *
                 (1 - power((ma.k - mb.k) / r.rr, 2))) AS peq
             FROM ma, mb, r GROUP BY r.rr)
      SELECT r.nn::BIGINT AS n,
             round(po.pol / r.nn, 6) AS po_linear,
             round(pe.pel / (r.nn * r.nn), 6) AS pe_linear,
             round((po.pol / r.nn - pe.pel / (r.nn * r.nn))
               / (1 - pe.pel / (r.nn * r.nn)), 6) AS kappa_linear,
             round(po.poq / r.nn, 6) AS po_quadratic,
             round(pe.peq / (r.nn * r.nn), 6) AS pe_quadratic,
             round((po.poq / r.nn - pe.peq / (r.nn * r.nn))
               / (1 - pe.peq / (r.nn * r.nn)), 6) AS kappa_quadratic
      FROM po, pe, r"""))

  /** Tokenizer fertility by language: BPE-ish tokens per whitespace
    * word — the "which languages cost more tokens" planning readout,
    * composed over the q29 token counter. */
  private val q381 = Entry(
    "q381_fertility",
    (s, d) => {
      val docs = Tables.documents(s, d)
      graft.ops.TextAnalysis.tokenCounts(docs, "text")
        .select(col("doc_id"), col("ws_tokens"), col("bpe_ish_tokens"))
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ws_tokens")).cast("long").as("words"),
          sum(col("bpe_ish_tokens")).cast("long").as("tokens"),
          r6(sum(col("bpe_ish_tokens")) /
            sum(col("ws_tokens")).cast("double")).as("fertility"))
        .orderBy("lang")
    },
    Some("""
      WITH t AS (SELECT doc_id, lang,
                   len(string_split(text, ' ')) AS ws,
                   len(regexp_extract_all(text,
                     '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS bp
                 FROM documents)
      SELECT lang, count(*) AS n_docs, sum(ws)::BIGINT AS words,
             sum(bp)::BIGINT AS tokens,
             round(sum(bp) / sum(ws)::DOUBLE, 6) AS fertility
      FROM t GROUP BY 1 ORDER BY lang"""))

  /** Harrell's C-index: does per-user event volume predict time to
    * first big purchase (q296's cohort)? Concordance via the Kendall
    * Fenwick machinery in its two-weight (event×all) form; the oracle
    * brute-forces the pairs. */
  private val q382 = Entry(
    "q382_c_index",
    (s, d) => {
      val hit = when(col("event_type") === "purchase" &&
        col("value") > 200, col("ts"))
      val surv = Tables.events(s, d)
        .groupBy("user_id")
        .agg(min(hit).as("__hit"), min(col("ts")).as("__first"),
          max(col("ts")).as("__last"),
          count(lit(1)).cast("double").as("score"))
        .select(
          when(col("__hit").isNotNull,
            datediff(to_date(col("__hit")), to_date(col("__first"))))
            .otherwise(
              datediff(to_date(col("__last")), to_date(col("__first"))))
            .as("dur"),
          when(col("__hit").isNotNull, lit(1)).otherwise(lit(0))
            .as("ev"),
          col("score"))
      graft.analysis.AnalysisPlanner
        .concordanceIndex(surv, "dur", "ev", "score")
        .select(col("n"), col("n_events"), col("comparable_pairs"),
          col("concordant"), col("tied_score"),
          r6(col("c_index")).as("c_index"))
    },
    Some("""
      WITH s AS (
        SELECT
          CASE WHEN min(ts) FILTER (event_type = 'purchase' AND "value" > 200) IS NOT NULL
               THEN datediff('day', min(ts)::DATE,
                 (min(ts) FILTER (event_type = 'purchase' AND "value" > 200))::DATE)
               ELSE datediff('day', min(ts)::DATE, max(ts)::DATE) END
            ::DOUBLE AS dur,
          CASE WHEN min(ts) FILTER (event_type = 'purchase' AND "value" > 200) IS NOT NULL
               THEN 1 ELSE 0 END AS ev,
          count(*)::DOUBLE AS score
        FROM events GROUP BY user_id),
      p AS (SELECT a.score AS sa, b.score AS sb
            FROM s a JOIN s b ON a.ev = 1 AND a.dur < b.dur),
      f AS (SELECT count(*)::BIGINT AS comparable_pairs,
              sum(CASE WHEN sa > sb THEN 1 ELSE 0 END)::BIGINT
                AS concordant,
              sum(CASE WHEN sa = sb THEN 1 ELSE 0 END)::BIGINT
                AS tied_score
            FROM p),
      t AS (SELECT count(*)::BIGINT AS n, sum(ev)::BIGINT AS n_events
            FROM s)
      SELECT t.n, t.n_events, f.comparable_pairs, f.concordant,
             f.tied_score,
             round((f.concordant + 0.5 * f.tied_score)
               / f.comparable_pairs, 6) AS c_index
      FROM f, t"""))

  /** Ordinal-association suite composed from the q46 Kendall counts:
    * Goodman–Kruskal gamma (ties ignored) and both Somers' D
    * asymmetries — pure algebra on the existing distributed
    * concordance frame. */
  private val q383 = Entry(
    "q383_ordinal_association",
    (s, d) =>
      eventsKendallValueUser(s, d)
        .select(col("concordant"), col("discordant"),
          r6((col("concordant") - col("discordant")).cast("double") /
            (col("concordant") + col("discordant"))).as("gamma"),
          r6((col("concordant") - col("discordant")).cast("double") /
            (col("n_pairs") - col("ties_x"))).as("somers_dyx"),
          r6((col("concordant") - col("discordant")).cast("double") /
            (col("n_pairs") - col("ties_y"))).as("somers_dxy"),
          r6(col("tau_b")).as("tau_b")),
    Some("""
      WITH s AS (
        SELECT event_id AS k, "value" AS x, CAST(user_id AS DOUBLE) AS y
        FROM events
        WHERE "value" IS NOT NULL AND user_id IS NOT NULL),
      pairs AS (
        SELECT (p.x - q.x) * (p.y - q.y) AS prod,
               CAST(p.x = q.x AS BIGINT) AS tx,
               CAST(p.y = q.y AS BIGINT) AS ty
        FROM s p JOIN s q ON p.k < q.k),
      a AS (
        SELECT CAST(sum(CASE WHEN prod > 0 THEN 1 ELSE 0 END) AS BIGINT) AS c,
               CAST(sum(CASE WHEN prod < 0 THEN 1 ELSE 0 END) AS BIGINT) AS d,
               CAST(sum(tx) AS BIGINT) AS tx,
               CAST(sum(ty) AS BIGINT) AS ty,
               count(*) AS np
        FROM pairs)
      SELECT c AS concordant, d AS discordant,
             round((c - d)::DOUBLE / (c + d), 6) AS gamma,
             round((c - d)::DOUBLE / (np - tx), 6) AS somers_dyx,
             round((c - d)::DOUBLE / (np - ty), 6) AS somers_dxy,
             round((c - d) / sqrt((np - tx) * (np - ty)), 6) AS tau_b
      FROM a"""))

  /** Categorical drift of the event-type mix between user cohorts —
    * PSI/JS/chi2 on EXACT categories, where numeric binning is
    * meaningless. */
  private val q384 = Entry(
    "q384_categorical_drift",
    (s, d) =>
      graft.analysis.AnalysisPlanner.categoricalDrift(
          Tables.events(s, d), "event_type",
          col("user_id") % 2 === 0, col("user_id") % 2 === 1)
        .select(col("n_categories"), col("n_a"), col("n_b"),
          r6(col("psi")).as("psi"),
          r6(col("js_divergence")).as("js_divergence"),
          r6(col("chi2")).as("chi2"),
          r6(col("max_abs_diff")).as("max_abs_diff")),
    Some("""
      WITH per AS (SELECT event_type,
              sum(CASE WHEN user_id % 2 = 0 THEN 1.0 ELSE 0 END) AS na,
              sum(CASE WHEN user_id % 2 = 1 THEN 1.0 ELSE 0 END) AS nb
            FROM events WHERE event_type IS NOT NULL GROUP BY 1),
      t AS (SELECT sum(na) AS ta, sum(nb) AS tb FROM per),
      f AS (SELECT greatest(na / t.ta, 1e-9) AS p,
              greatest(nb / t.tb, 1e-9) AS q,
              na, nb, t.ta, t.tb,
              (na + nb) * t.ta / (t.ta + t.tb) AS ea,
              (na + nb) * t.tb / (t.ta + t.tb) AS eb
            FROM per, t)
      SELECT count(*)::BIGINT AS n_categories,
             max(ta)::BIGINT AS n_a, max(tb)::BIGINT AS n_b,
             round(sum((p - q) * ln(p / q)), 6) AS psi,
             round(sum(p * ln(p / ((p + q) / 2))) / 2 +
               sum(q * ln(q / ((p + q) / 2))) / 2, 6) AS js_divergence,
             round(sum(power(na - ea, 2) / ea
               + power(nb - eb, 2) / eb), 6) AS chi2,
             round(max(abs(p - q)), 6) AS max_abs_diff
      FROM f"""))

  /** Direct standardization: the big-purchase rate gap between user
    * cohorts re-weighted to the pooled event-type mix — "is the gap
    * real or composition?". */
  private val q385 = Entry(
    "q385_standardized_rates",
    (s, d) =>
      graft.analysis.AnalysisPlanner.directStandardizedRates(
          Tables.events(s, d), "event_type",
          col("user_id") % 2 === 0,
          col("value") > 100)
        .select(col("n"), col("n_strata"),
          r6(col("crude_a")).as("crude_a"),
          r6(col("crude_b")).as("crude_b"),
          r6(col("adj_a")).as("adj_a"), r6(col("adj_b")).as("adj_b"),
          r6(col("crude_diff")).as("crude_diff"),
          r6(col("adj_diff")).as("adj_diff")),
    Some("""
      WITH per AS (SELECT event_type,
              sum(CASE WHEN user_id % 2 = 0 THEN 1.0 ELSE 0 END) AS na,
              sum(CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1.0 END) AS nb,
              sum(CASE WHEN user_id % 2 = 0
                    AND coalesce("value" > 100, FALSE)
                    THEN 1.0 ELSE 0 END) AS ya,
              sum(CASE WHEN user_id % 2 <> 0
                    AND coalesce("value" > 100, FALSE)
                    THEN 1.0 ELSE 0 END) AS yb
            FROM events WHERE event_type IS NOT NULL
            GROUP BY 1 HAVING sum(CASE WHEN user_id % 2 = 0 THEN 1.0
              ELSE 0 END) > 0 AND sum(CASE WHEN user_id % 2 = 0 THEN 0
              ELSE 1.0 END) > 0)
      SELECT sum(na + nb)::BIGINT AS n, count(*)::BIGINT AS n_strata,
             round(sum(ya) / sum(na), 6) AS crude_a,
             round(sum(yb) / sum(nb), 6) AS crude_b,
             round(sum((na + nb) * ya / na) / sum(na + nb), 6) AS adj_a,
             round(sum((na + nb) * yb / nb) / sum(na + nb), 6) AS adj_b,
             round(sum(ya) / sum(na) - sum(yb) / sum(nb), 6)
               AS crude_diff,
             round(sum((na + nb) * ya / na) / sum(na + nb)
               - sum((na + nb) * yb / nb) / sum(na + nb), 6) AS adj_diff
      FROM per"""))

  /** Dedup savings report: exact-duplicate cluster-size histogram +
    * the removable-document share — the "what does dedup buy on this
    * corpus" planning readout, composed over the q30 fingerprint
    * groups. */
  private val q386 = Entry(
    "q386_dedup_savings",
    (s, d) =>
      graft.ops.TextAnalysis
        .fingerprintDedup(Tables.documents(s, d), "doc_id", "text")
        .groupBy(col("n_copies").as("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"),
          (count(lit(1)) * col("n_copies")).cast("long").as("docs"),
          (count(lit(1)) * (col("n_copies") - 1)).cast("long")
            .as("removable"))
        .orderBy("cluster_size"),
    Some("""
      WITH fp AS (SELECT md5(array_to_string(list_sort(list_distinct(
                    string_split(text, ' '))), ' ')) AS fp,
                    count(*) AS n_copies
                  FROM documents GROUP BY 1)
      SELECT n_copies AS cluster_size, count(*) AS n_clusters,
             (count(*) * n_copies)::BIGINT AS docs,
             (count(*) * (n_copies - 1))::BIGINT AS removable
      FROM fp GROUP BY 1 ORDER BY 1"""))

  /** Ansari–Bradley scale test: are purchase and click event values
    * equally dispersed? Folded-rank scores from the shared rank-cell
    * substrate; tie blocks via closed-form range sums. */
  private val q387 = Entry(
    "q387_ansari_bradley",
    (s, d) =>
      AnalysisPlanner
        .ansariBradleyFromCells(eventTypeValueCells(s, d),
          control = "purchase", treatment = "click")
        .select(col("n_c"), col("n_t"), r6(col("ab_stat")).as("ab_stat"),
          r6(col("z_stat")).as("z_stat")),
    Some("""
      WITH d AS (SELECT "value"::DOUBLE AS v, event_type AS g
                 FROM events WHERE "value" IS NOT NULL
                   AND event_type IN ('purchase', 'click')),
      vc AS (SELECT v,
               sum(CASE WHEN g = 'click' THEN 1.0 ELSE 0 END) AS ct,
               sum(CASE WHEN g = 'purchase' THEN 1.0 ELSE 0 END) AS cc
             FROM d GROUP BY 1),
      pre AS (SELECT v, ct, cc, ct + cc AS t,
                coalesce(sum(ct + cc) OVER (ORDER BY v ROWS BETWEEN
                  UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ex
              FROM vc),
      tot AS (SELECT sum(ct + cc) AS nn FROM vc),
      sc AS (SELECT ct, cc, t, nn, ex + 1 AS lo, ex + t AS hi,
               floor((nn + 1) / 2.0) AS m
             FROM pre, tot),
      sc2 AS (SELECT ct, cc, t, nn,
                (CASE WHEN least(hi, m) >= lo
                  THEN (least(hi, m) * (least(hi, m) + 1)
                    - (lo - 1) * lo) / 2.0 ELSE 0 END)
                + (CASE WHEN hi >= greatest(lo, m + 1)
                  THEN (nn + 1) * (hi - greatest(lo, m + 1) + 1)
                    - (hi * (hi + 1) - (greatest(lo, m + 1) - 1)
                      * greatest(lo, m + 1)) / 2.0 ELSE 0 END) AS sb
              FROM sc),
      a AS (SELECT sum(cc) AS nc, sum(ct) AS nt, max(nn) AS n,
              sum(ct * sb / t) AS ab, sum(sb) AS sa,
              sum(sb * sb / t) AS sa2
            FROM sc2)
      SELECT nc::BIGINT AS n_c, nt::BIGINT AS n_t,
             round(ab, 6) AS ab_stat,
             round((ab - nt * sa / n) /
               sqrt(nc * nt * (sa2 - sa * sa / n) / (n * (n - 1))), 6)
               AS z_stat
      FROM a"""))

  /** Lepage location-or-scale omnibus: Wilcoxon z² + Ansari z² on the
    * same purchase/click pair — one χ²(2) number for "shifted OR
    * re-dispersed". */
  private val q388 = Entry(
    "q388_lepage",
    (s, d) =>
      AnalysisPlanner
        .lepageFromCells(eventTypeValueCells(s, d),
          control = "purchase", treatment = "click")
        .select(col("n_c"), col("n_t"),
          r6(col("z_wilcoxon")).as("z_wilcoxon"),
          r6(col("z_ansari")).as("z_ansari"),
          r6(col("lepage_l")).as("lepage_l")),
    Some("""
      WITH d AS (SELECT "value"::DOUBLE AS v, event_type AS g
                 FROM events WHERE "value" IS NOT NULL
                   AND event_type IN ('purchase', 'click')),
      vc AS (SELECT v,
               sum(CASE WHEN g = 'click' THEN 1.0 ELSE 0 END) AS ct,
               sum(CASE WHEN g = 'purchase' THEN 1.0 ELSE 0 END) AS cc
             FROM d GROUP BY 1),
      pre AS (SELECT v, ct, cc, ct + cc AS t,
                coalesce(sum(ct + cc) OVER (ORDER BY v ROWS BETWEEN
                  UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ex
              FROM vc),
      tot AS (SELECT sum(ct + cc) AS nn FROM vc),
      wil AS (SELECT sum((ex + 1) * ct) AS rt, sum(ct) AS nt,
                sum(cc) AS nc
              FROM pre),
      wz AS (SELECT nc, nt,
               (rt - nt * (nt + 1) / 2.0 - nc * nt / 2.0) /
                 sqrt(nc * nt * (nc + nt + 1) / 12.0) AS zw
             FROM wil),
      sc AS (SELECT ct, cc, t, nn, ex + 1 AS lo, ex + t AS hi,
               floor((nn + 1) / 2.0) AS m
             FROM pre, tot),
      sc2 AS (SELECT ct, cc, t, nn,
                (CASE WHEN least(hi, m) >= lo
                  THEN (least(hi, m) * (least(hi, m) + 1)
                    - (lo - 1) * lo) / 2.0 ELSE 0 END)
                + (CASE WHEN hi >= greatest(lo, m + 1)
                  THEN (nn + 1) * (hi - greatest(lo, m + 1) + 1)
                    - (hi * (hi + 1) - (greatest(lo, m + 1) - 1)
                      * greatest(lo, m + 1)) / 2.0 ELSE 0 END) AS sb
              FROM sc),
      ab AS (SELECT sum(cc) AS nc, sum(ct) AS nt, max(nn) AS n,
               sum(ct * sb / t) AS abv, sum(sb) AS sa,
               sum(sb * sb / t) AS sa2
             FROM sc2),
      az AS (SELECT (abv - nt * sa / n) /
               sqrt(nc * nt * (sa2 - sa * sa / n) / (n * (n - 1))) AS za
             FROM ab)
      SELECT wz.nc::BIGINT AS n_c, wz.nt::BIGINT AS n_t,
             round(wz.zw, 6) AS z_wilcoxon, round(az.za, 6) AS z_ansari,
             round(wz.zw * wz.zw + az.za * az.za, 6) AS lepage_l
      FROM wz, az"""))

  /** Cucconi location-and-scale test on the same pair: squared ranks
    * from both ends with the exact null correlation. */
  private val q389 = Entry(
    "q389_cucconi",
    (s, d) =>
      AnalysisPlanner
        .cucconiFromCells(eventTypeValueCells(s, d),
          control = "purchase", treatment = "click")
        .select(col("n_c"), col("n_t"), r6(col("u")).as("u"),
          r6(col("v")).as("v"), r6(col("cucconi_c")).as("cucconi_c")),
    Some("""
      WITH d AS (SELECT "value"::DOUBLE AS v, event_type AS g
                 FROM events WHERE "value" IS NOT NULL
                   AND event_type IN ('purchase', 'click')),
      vc AS (SELECT v,
               sum(CASE WHEN g = 'click' THEN 1.0 ELSE 0 END) AS ct,
               sum(CASE WHEN g = 'purchase' THEN 1.0 ELSE 0 END) AS cc
             FROM d GROUP BY 1),
      pre AS (SELECT ct, cc, ct + cc AS t,
                coalesce(sum(ct + cc) OVER (ORDER BY v ROWS BETWEEN
                  UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  + (ct + cc + 1) / 2.0 AS r
              FROM vc),
      a AS (SELECT sum(cc) AS nc, sum(ct) AS nt,
              sum(ct * r) AS sr, sum(ct * r * r) AS sr2
            FROM pre),
      b AS (SELECT nc, nt, sr, sr2, nc + nt AS n,
              sqrt(nc * nt * (nc + nt + 1) * (2 * (nc + nt) + 1)
                * (8 * (nc + nt) + 11) / 5.0) AS den
            FROM a),
      c AS (SELECT nc, nt,
              (6 * sr2 - nt * (n + 1) * (2 * n + 1)) / den AS u,
              (6 * (nt * (n + 1) * (n + 1) - 2 * (n + 1) * sr + sr2)
                - nt * (n + 1) * (2 * n + 1)) / den AS v,
              2.0 * (n * n - 4) / ((2 * n + 1) * (8 * n + 11)) - 1
                AS rho
            FROM b)
      SELECT nc::BIGINT AS n_c, nt::BIGINT AS n_t, round(u, 6) AS u,
             round(v, 6) AS v,
             round((u * u + v * v - 2 * rho * u * v) /
               (2 * (1 - rho * rho)), 6) AS cucconi_c
      FROM c"""))

  /** Stuart–Maxwell marginal homogeneity: did the class MIX shift
    * between the return-flag labeling and a derived relabeling? The
    * margins question Bowker's symmetry test doesn't ask. */
  private val q390 = Entry(
    "q390_stuart_maxwell",
    (s, d) =>
      AnalysisPlanner.stuartMaxwell(
          Tables.lineitem(s, d).select(col("l_returnflag").as("a"),
            when(col("l_partkey") % 3 === 0, lit("A"))
              .when(col("l_partkey") % 3 === 1, lit("N"))
              .otherwise(lit("R")).as("b")),
          "a", "b")
        .select(col("n"), col("n_categories"), col("dof"),
          r6(col("chi2")).as("chi2")),
    Some("""
      WITH b0 AS (SELECT l_returnflag AS a,
                    CASE l_partkey % 3 WHEN 0 THEN 'A' WHEN 1 THEN 'N'
                      ELSE 'R' END AS b
                  FROM lineitem),
      j AS (SELECT a, b, count(*)::DOUBLE AS n FROM b0 GROUP BY 1, 2),
      m AS (SELECT sum(n) AS nn,
              sum(CASE WHEN a = 'A' THEN n ELSE 0 END) AS ra,
              sum(CASE WHEN a = 'N' THEN n ELSE 0 END) AS rn,
              sum(CASE WHEN b = 'A' THEN n ELSE 0 END) AS ca,
              sum(CASE WHEN b = 'N' THEN n ELSE 0 END) AS cn,
              sum(CASE WHEN a = 'A' AND b = 'A' THEN n ELSE 0 END) AS naa,
              sum(CASE WHEN a = 'N' AND b = 'N' THEN n ELSE 0 END) AS nnn2,
              sum(CASE WHEN a = 'A' AND b = 'N' THEN n ELSE 0 END) AS nan2,
              sum(CASE WHEN a = 'N' AND b = 'A' THEN n ELSE 0 END) AS nna
            FROM j),
      x AS (SELECT nn, ra - ca AS d1, rn - cn AS d2,
              ra + ca - 2 * naa AS v11, rn + cn - 2 * nnn2 AS v22,
              -(nan2 + nna) AS v12
            FROM m)
      SELECT nn::BIGINT AS n, 3 AS n_categories, 2 AS dof,
             round((v22 * d1 * d1 - 2 * v12 * d1 * d2 + v11 * d2 * d2)
               / (v11 * v22 - v12 * v12), 6) AS chi2
      FROM x"""))

  /** Cochran–Armitage trend: does the big-order rate ramp across the
    * five numeric priority levels — the ordered-dose 2×k test. */
  private val q391 = Entry(
    "q391_cochran_armitage",
    (s, d) =>
      AnalysisPlanner.cochranArmitage(
          Tables.orders(s, d).withColumn("prio_level",
            substring(col("o_orderpriority"), 1, 1).cast("int")),
          "prio_level", col("o_totalprice") > 150000)
        .select(col("n"), col("n_levels"),
          r6(col("pooled_rate")).as("pooled_rate"),
          r6(col("z_trend")).as("z_trend")),
    Some("""
      WITH lv AS (SELECT CAST(substr(o_orderpriority, 1, 1) AS INT)
                    AS lvl,
                    CASE WHEN o_totalprice > 150000 THEN 1.0 ELSE 0 END
                      AS s
                  FROM orders WHERE o_orderpriority IS NOT NULL),
      g AS (SELECT lvl, count(*)::DOUBLE AS ni, sum(s) AS xi
            FROM lv GROUP BY 1),
      w AS (SELECT lvl, ni, xi,
              coalesce(sum(1.0) OVER (ORDER BY lvl ROWS BETWEEN
                UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS w
            FROM g),
      a AS (SELECT sum(ni) AS n, count(*) AS k, sum(xi) AS x,
              sum(w * xi) AS swx, sum(w * ni) AS swn,
              sum(w * w * ni) AS sw2n
            FROM w)
      SELECT n::BIGINT AS n, k AS n_levels, round(x / n, 6)
               AS pooled_rate,
             round((swx - (x / n) * swn) /
               sqrt((x / n) * (1 - x / n) * (sw2n - swn * swn / n)), 6)
               AS z_trend
      FROM a"""))

  /** Kendall's W: do five hash-raters agree on the ordering of twenty
    * part buckets by total quantity — multi-rater rank concordance
    * with the standard tie correction. */
  private val q392 = Entry(
    "q392_kendalls_w",
    (s, d) =>
      AnalysisPlanner.kendallsW(
          Tables.lineitem(s, d)
            .groupBy((col("l_suppkey") % 5).as("rater"),
              (col("l_partkey") % 20).as("item"))
            .agg(sum(col("l_quantity")).as("score")),
          "rater", "item", "score")
        .select(col("n_raters"), col("n_items"), r6(col("w")).as("w"),
          r6(col("chi2_stat")).as("chi2_stat"), col("dof")),
    Some("""
      WITH cell AS (SELECT l_suppkey % 5 AS rater, l_partkey % 20
                      AS item, sum(l_quantity)::DOUBLE AS score
                    FROM lineitem GROUP BY 1, 2),
      ni AS (SELECT count(DISTINCT item) AS n_items FROM cell),
      fullr AS (SELECT rater FROM cell GROUP BY 1
                HAVING count(*) = (SELECT n_items FROM ni)),
      k AS (SELECT c.* FROM cell c JOIN fullr USING (rater)),
      rk AS (SELECT rater, item, score,
               rank() OVER (PARTITION BY rater ORDER BY score) AS r,
               count(*) OVER (PARTITION BY rater, score) AS tc
             FROM k),
      t1 AS (SELECT DISTINCT rater, score, tc FROM rk),
      t2 AS (SELECT rater, sum(tc * tc * tc - tc) AS t FROM t1
             GROUP BY 1),
      t3 AS (SELECT sum(t) AS tt, count(*) AS m FROM t2),
      rs AS (SELECT item, sum(r + (tc - 1) / 2.0) AS rr FROM rk
             GROUP BY 1),
      s AS (SELECT count(*)::DOUBLE AS ni, sum(rr) AS sr,
              sum(rr * rr) AS sr2 FROM rs),
      wv AS (SELECT t3.m, s.ni,
               12 * (s.sr2 - s.sr * s.sr / s.ni) /
                 (t3.m * t3.m * (s.ni * s.ni * s.ni - s.ni)
                   - t3.m * t3.tt) AS ww
             FROM s, t3)
      SELECT m AS n_raters, ni::BIGINT AS n_items, round(ww, 6) AS w,
             round(m * (ni - 1) * ww, 6) AS chi2_stat,
             (ni - 1)::BIGINT AS dof
      FROM wv"""))

  /** Dickey–Fuller unit-root check on the daily event-value series:
    * is the KPI mean-reverting or a random walk? */
  private val q393 = Entry(
    "q393_dickey_fuller",
    (s, d) =>
      graft.ops.TimeSeries.dickeyFuller(Tables.events(s, d), "ts",
          "value")
        .select(col("n_days"), col("n_pairs"), r6(col("gamma")).as("gamma"),
          r6(col("se_gamma")).as("se_gamma"),
          r6(col("df_stat")).as("df_stat")),
    Some("""
      WITH daily AS (SELECT CAST(ts AS DATE) AS dd,
                       avg("value"::DOUBLE) AS x
                     FROM events
                     WHERE "value" IS NOT NULL AND ts IS NOT NULL
                     GROUP BY 1),
      t AS (SELECT datediff('day', DATE '1970-01-01', dd) AS t, x
            FROM daily),
      p AS (SELECT l.x AS xl, c.x - l.x AS dy
            FROM t c JOIN t l ON c.t = l.t + 1),
      a AS (SELECT count(*)::DOUBLE AS np, sum(xl) AS sz,
              sum(xl * xl) AS szz, sum(dy) AS sd, sum(xl * dy) AS szd,
              sum(dy * dy) AS sdd
            FROM p),
      b AS (SELECT np, szz - sz * sz / np AS sxx,
              szd - sz * sd / np AS sxy, sd, sdd
            FROM a),
      g AS (SELECT np, sxx, sxy / sxx AS gamma,
              sdd - sd * sd / np - (sxy / sxx) * sxy AS sse
            FROM b),
      nd AS (SELECT count(*) AS n_days FROM daily)
      SELECT nd.n_days, g.np::BIGINT AS n_pairs,
             round(g.gamma, 6) AS gamma,
             round(sqrt(g.sse / (g.np - 2) / g.sxx), 6) AS se_gamma,
             round(g.gamma / sqrt(g.sse / (g.np - 2) / g.sxx), 6)
               AS df_stat
      FROM g, nd"""))

  /** KPSS level-stationarity statistic on the same daily series — the
    * complementary null (stationary) to q393's unit root. */
  private val q394 = Entry(
    "q394_kpss",
    (s, d) =>
      graft.ops.TimeSeries.kpssLevel(Tables.events(s, d), "ts", "value")
        .select(col("n_days"), r6(col("sigma2")).as("sigma2"),
          r6(col("kpss_stat")).as("kpss_stat")),
    Some("""
      WITH daily AS (SELECT CAST(ts AS DATE) AS dd,
                       avg("value"::DOUBLE) AS x
                     FROM events
                     WHERE "value" IS NOT NULL AND ts IS NOT NULL
                     GROUP BY 1),
      m AS (SELECT count(*)::DOUBLE AS n, avg(x) AS mu FROM daily),
      e AS (SELECT dd, x - m.mu AS e, m.n FROM daily, m),
      s AS (SELECT n, e,
              sum(e) OVER (ORDER BY dd ROWS BETWEEN UNBOUNDED
                PRECEDING AND CURRENT ROW) AS st
            FROM e)
      SELECT max(n)::BIGINT AS n_days,
             round(sum(e * e) / max(n), 6) AS sigma2,
             round(sum(st * st) /
               (max(n) * max(n) * (sum(e * e) / max(n))), 6)
               AS kpss_stat
      FROM s"""))

  /** D'Agostino–Pearson K² normality omnibus on extended price —
    * finite-n skewness and kurtosis z-tests combined. */
  private val q395 = Entry(
    "q395_dagostino_k2",
    (s, d) =>
      AnalysisPlanner.dagostinoK2(Tables.lineitem(s, d),
          "l_extendedprice")
        .select(col("n"), r6(col("skewness")).as("skewness"),
          r6(col("kurtosis")).as("kurtosis"),
          r6(col("z_skew")).as("z_skew"), r6(col("z_kurt")).as("z_kurt"),
          r6(col("k2")).as("k2")),
    Some("""
      WITH r AS (SELECT l_extendedprice::DOUBLE AS x FROM lineitem
                 WHERE l_extendedprice IS NOT NULL),
      a AS (SELECT count(*)::DOUBLE AS n, sum(x) AS s1,
              sum(x * x) AS s2, sum(x * x * x) AS s3,
              sum(x * x * x * x) AS s4
            FROM r),
      c AS (SELECT n, s1 / n AS mu,
              s2 / n - (s1 / n) * (s1 / n) AS m2,
              s3 / n - (s1 / n) * 3.0 * s2 / n
                + (s1 / n) * (s1 / n) * (s1 / n) * 2.0 AS m3,
              s4 / n - (s1 / n) * 4.0 * s3 / n
                + (s1 / n) * (s1 / n) * 6.0 * s2 / n
                - (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) * 3.0 AS m4
            FROM a),
      g AS (SELECT n, m3 / pow(m2, 1.5) AS g1, m4 / (m2 * m2) AS b2
            FROM c),
      sk AS (SELECT n, g1, b2,
               g1 * sqrt((n + 1) * (n + 3) / ((n - 2) * 6)) AS y,
               (n * n + n * 27 - 70) * (n + 1) * (n + 3) * 3.0 /
                 ((n - 2) * (n + 5) * (n + 7) * (n + 9)) AS beta2
             FROM g),
      sk2 AS (SELECT n, g1, b2, y,
                sqrt((beta2 - 1) * 2) - 1 AS w2
              FROM sk),
      sk3 AS (SELECT n, g1, b2,
                (1.0 / sqrt(ln(sqrt(w2)))) *
                  ln(y / sqrt(2.0 / (w2 - 1)) +
                    sqrt(y / sqrt(2.0 / (w2 - 1)) *
                      (y / sqrt(2.0 / (w2 - 1))) + 1)) AS z1
              FROM sk2),
      ku AS (SELECT n, g1, b2, z1,
               (b2 - (n - 1) * 3 / (n + 1)) /
                 sqrt(n * (n - 2) * (n - 3) * 24.0 /
                   ((n + 1) * (n + 1) * (n + 3) * (n + 5))) AS xk,
               (n * n - n * 5 + 2) * 6.0 / ((n + 7) * (n + 9)) *
                 sqrt((n + 3) * (n + 5) * 6.0 /
                   (n * (n - 2) * (n - 3))) AS sb1
             FROM sk3),
      ku2 AS (SELECT n, g1, b2, z1, xk,
                6.0 + 8.0 / sb1 *
                  (2.0 / sb1 + sqrt(1.0 + 4.0 / (sb1 * sb1))) AS aa
              FROM ku),
      ku3 AS (SELECT n, g1, b2, z1,
                (1.0 - 2.0 / (aa * 9) -
                  pow((1.0 - 2.0 / aa) /
                    (1.0 + xk * sqrt(2.0 / (aa - 4))), 1.0 / 3.0)) /
                  sqrt(2.0 / (aa * 9)) AS z2
              FROM ku2)
      SELECT n::BIGINT AS n, round(g1, 6) AS skewness,
             round(b2 - 3, 6) AS kurtosis, round(z1, 6) AS z_skew,
             round(z2, 6) AS z_kurt, round(z1 * z1 + z2 * z2, 6) AS k2
      FROM ku3"""))

  /** Inequality panel (Theil-T/MLD/Atkinson) of order revenue — three
    * decomposable complements to the Gini readout. */
  private val q396 = Entry(
    "q396_inequality_indices",
    (s, d) =>
      graft.ops.Profiling.inequalityIndices(Tables.orders(s, d),
          "o_totalprice")
        .select(col("n"), col("n_dropped"), r6(col("mean")).as("mean"),
          r6(col("theil_t")).as("theil_t"),
          r6(col("theil_l")).as("theil_l"),
          r6(col("atkinson_05")).as("atkinson_05")),
    Some("""
      WITH r AS (SELECT o_totalprice::DOUBLE AS x FROM orders
                 WHERE o_totalprice IS NOT NULL),
      a AS (SELECT sum(CASE WHEN x > 0 THEN 1 ELSE 0 END)::DOUBLE AS n,
              sum(CASE WHEN x <= 0 THEN 1 ELSE 0 END)::BIGINT
                AS n_dropped,
              sum(CASE WHEN x > 0 THEN x END) AS s,
              sum(CASE WHEN x > 0 THEN ln(x) END) AS slog,
              sum(CASE WHEN x > 0 THEN x * ln(x) END) AS sxlog,
              sum(CASE WHEN x > 0 THEN sqrt(x) END) AS ssqrt
            FROM r)
      SELECT n::BIGINT AS n, n_dropped, round(s / n, 6) AS mean,
             round(sxlog / s - ln(s / n), 6) AS theil_t,
             round(ln(s / n) - slog / n, 6) AS theil_l,
             round(1 - pow(ssqrt / n, 2) / (s / n), 6) AS atkinson_05
      FROM a"""))

  /** Lorenz decile table of order revenue: the mass share each value
    * decile holds, cut at exact interpolated quantiles. */
  private val q397 = Entry(
    "q397_lorenz_deciles",
    (s, d) =>
      graft.ops.Profiling.lorenzDeciles(Tables.orders(s, d),
          "o_totalprice")
        .select(col("decile"), col("n"), r2(col("total")).as("total"),
          r6(col("share")).as("share"),
          r6(col("cum_share")).as("cum_share"))
        .orderBy("decile"),
    Some("""
      WITH r AS (SELECT o_totalprice::DOUBLE AS x FROM orders
                 WHERE o_totalprice IS NOT NULL),
      q AS (SELECT quantile_cont(x, 0.1) AS q1,
              quantile_cont(x, 0.2) AS q2, quantile_cont(x, 0.3) AS q3,
              quantile_cont(x, 0.4) AS q4, quantile_cont(x, 0.5) AS q5,
              quantile_cont(x, 0.6) AS q6, quantile_cont(x, 0.7) AS q7,
              quantile_cont(x, 0.8) AS q8, quantile_cont(x, 0.9) AS q9
            FROM r),
      b AS (SELECT x,
              (CASE WHEN x > q1 THEN 1 ELSE 0 END +
               CASE WHEN x > q2 THEN 1 ELSE 0 END +
               CASE WHEN x > q3 THEN 1 ELSE 0 END +
               CASE WHEN x > q4 THEN 1 ELSE 0 END +
               CASE WHEN x > q5 THEN 1 ELSE 0 END +
               CASE WHEN x > q6 THEN 1 ELSE 0 END +
               CASE WHEN x > q7 THEN 1 ELSE 0 END +
               CASE WHEN x > q8 THEN 1 ELSE 0 END +
               CASE WHEN x > q9 THEN 1 ELSE 0 END)::BIGINT AS decile
            FROM r, q),
      t AS (SELECT sum(x) AS tt FROM r),
      per AS (SELECT decile, count(*) AS n, sum(x) AS total
              FROM b GROUP BY 1)
      SELECT decile, n, round(total, 2) AS total,
             round(total / t.tt, 6) AS share,
             round(sum(total / t.tt) OVER (ORDER BY decile ROWS
               BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
               AS cum_share
      FROM per, t ORDER BY decile"""))

  /** Reliability diagram of the synthetic order score: the per-bin
    * table behind q319's scalar ECE — where is it miscalibrated. */
  private val q398 = Entry(
    "q398_reliability_diagram",
    (s, d) =>
      graft.ops.Evaluation
        .reliabilityDiagram(scoredOrders(s, d), "label", "score",
          bins = 10)
        .select(col("bin"), col("n"),
          r6(col("confidence")).as("confidence"),
          r6(col("accuracy")).as("accuracy"), r6(col("gap")).as("gap"),
          r6(col("ece_contribution")).as("ece_contribution"))
        .orderBy("bin"),
    Some(s"""
      WITH $scoredOrdersSql,
      c AS (SELECT least(floor(least(greatest(p, 0), 1) * 10), 9)::BIGINT
              AS bin, least(greatest(p, 0), 1) AS p, y
            FROM sc),
      t AS (SELECT count(*)::DOUBLE AS nn FROM c),
      per AS (SELECT bin, count(*) AS n, avg(p) AS confidence,
                avg(y) AS accuracy
              FROM c GROUP BY 1)
      SELECT bin, n, round(confidence, 6) AS confidence,
             round(accuracy, 6) AS accuracy,
             round(accuracy - confidence, 6) AS gap,
             round(n / t.nn * abs(accuracy - confidence), 6)
               AS ece_contribution
      FROM per, t ORDER BY bin"""))

  /** Flesch reading-ease rollup by language — the prose-difficulty
    * gate, vowel-run syllable proxy. */
  private val q399 = Entry(
    "q399_flesch_readability",
    (s, d) =>
      graft.ops.TextAnalysis
        .fleschReadingEase(Tables.documents(s, d), "text", "lang")
        .select(col("lang"), col("n_docs"),
          r6(col("avg_words")).as("avg_words"),
          r6(col("avg_sentence_len")).as("avg_sentence_len"),
          r6(col("avg_syllables_per_word")).as("avg_syllables_per_word"),
          r6(col("avg_flesch")).as("avg_flesch"),
          r6(col("share_difficult")).as("share_difficult"))
        .orderBy("lang"),
    Some("""
      WITH p AS (SELECT lang,
              len(list_filter(string_split(text, ' '),
                x -> x <> ''))::DOUBLE AS w,
              greatest(len(regexp_extract_all(text, '[.!?]+')),
                1)::DOUBLE AS s,
              greatest(len(regexp_extract_all(lower(text),
                '[aeiouy]+')), 1)::DOUBLE AS y
            FROM documents WHERE text IS NOT NULL),
      f AS (SELECT lang, w, s, y,
              206.835 - 1.015 * (w / s) - 84.6 * (y / w) AS fl
            FROM p WHERE w > 0)
      SELECT lang, count(*)::BIGINT AS n_docs,
             round(avg(w), 6) AS avg_words,
             round(avg(w / s), 6) AS avg_sentence_len,
             round(avg(y / w), 6) AS avg_syllables_per_word,
             round(avg(fl), 6) AS avg_flesch,
             round(avg(CASE WHEN fl < 50 THEN 1.0 ELSE 0 END), 6)
               AS share_difficult
      FROM f GROUP BY 1 ORDER BY lang"""))

  /** Corpus vocabulary-frequency profile: hapax / dis legomena share
    * — the Zipf-tail "how much is one-off noise" readout. */
  private val q400 = Entry(
    "q400_vocabulary_profile",
    (s, d) =>
      graft.ops.TextAnalysis
        .vocabularyProfile(Tables.documents(s, d), "text")
        .select(col("vocabulary"), col("n_tokens"), col("hapax"),
          col("dis_legomena"),
          r6(col("hapax_vocab_share")).as("hapax_vocab_share"),
          r6(col("hapax_token_share")).as("hapax_token_share"),
          r6(col("type_token_ratio")).as("type_token_ratio")),
    Some("""
      WITH w AS (SELECT unnest(string_split(text, ' ')) AS w
                 FROM documents WHERE text IS NOT NULL),
      tf AS (SELECT w, count(*) AS c FROM w WHERE w <> '' GROUP BY 1),
      a AS (SELECT count(*)::BIGINT AS vocabulary,
              sum(c)::BIGINT AS n_tokens,
              sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS hapax,
              sum(CASE WHEN c = 2 THEN 1 ELSE 0 END)::BIGINT
                AS dis_legomena
            FROM tf)
      SELECT vocabulary, n_tokens, hapax, dis_legomena,
             round(hapax::DOUBLE / vocabulary, 6) AS hapax_vocab_share,
             round(hapax::DOUBLE / n_tokens, 6) AS hapax_token_share,
             round(vocabulary::DOUBLE / n_tokens, 6) AS type_token_ratio
      FROM a"""))

  /** Quade test: do users rank event types consistently by frequency,
    * weighting high-spread users more — the range-weighted Friedman. */
  private val q401 = Entry(
    "q401_quade",
    (s, d) =>
      AnalysisPlanner.quadeTest(
          Tables.events(s, d)
            .groupBy(col("user_id").as("blk"),
              col("event_type").as("trt"))
            .agg(count(lit(1)).cast("double").as("cnt")),
          "blk", "trt", "cnt")
        .select(col("n_blocks"), col("n_treatments"),
          r6(col("a_stat")).as("a_stat"), r6(col("b_stat")).as("b_stat"),
          r6(col("quade_f")).as("quade_f"), col("df1"), col("df2")),
    Some("""
      WITH cell AS (SELECT user_id AS blk, event_type AS trt,
                      count(*)::DOUBLE AS x
                    FROM events GROUP BY 1, 2),
      kk AS (SELECT count(DISTINCT trt) AS k FROM cell),
      fullb AS (SELECT blk, max(x) - min(x) AS rg FROM cell
                GROUP BY 1 HAVING count(*) = (SELECT k FROM kk)),
      kept AS (SELECT c.blk, c.trt, c.x, f.rg
               FROM cell c JOIN fullb f USING (blk)),
      rk AS (SELECT blk, trt, rg,
               rank() OVER (PARTITION BY blk ORDER BY x)
                 + (count(*) OVER (PARTITION BY blk, x) - 1) / 2.0 AS r
             FROM kept),
      qb AS (SELECT blk,
               rank() OVER (ORDER BY rg)
                 + (count(*) OVER (PARTITION BY rg) - 1) / 2.0 AS q
             FROM fullb),
      sc AS (SELECT rk.trt,
               qb.q * (rk.r - ((SELECT k FROM kk) + 1) / 2.0) AS s
             FROM rk JOIN qb USING (blk)),
      bb AS (SELECT count(*)::DOUBLE AS b FROM fullb),
      a AS (SELECT sum(s * s) AS astat FROM sc),
      pj AS (SELECT trt, sum(s) AS sj FROM sc GROUP BY 1),
      f AS (SELECT bb.b, count(*) AS k2, a.astat,
              sum(sj * sj) / bb.b AS bstat
            FROM pj, bb, a GROUP BY bb.b, a.astat)
      SELECT b::BIGINT AS n_blocks, k2 AS n_treatments,
             round(astat, 6) AS a_stat, round(bstat, 6) AS b_stat,
             round((b - 1) * bstat / (astat - bstat), 6) AS quade_f,
             (k2 - 1)::BIGINT AS df1,
             ((b - 1) * (k2 - 1))::BIGINT AS df2
      FROM f"""))

  /** Benjamini–Yekutieli FDR over q159's hypothesis frame — the
    * arbitrary-dependence step-up with the harmonic factor. */
  private val q402 = Entry(
    "q402_by_fdr",
    (s, d) => {
      val hyp = Tables.orders(s, d).where(col("o_orderkey") <= 500)
        .select(col("o_orderkey").as("hid"),
          when(col("o_orderkey") % 50 === 0,
            (col("o_orderkey") * 7919 % 9973) / lit(9973000.0))
            .otherwise((col("o_orderkey") * 7919 % 9973) / lit(9973.0))
            .as("p"))
      AnalysisPlanner.byFdr(hyp, "p", 0.1)
        .select(col("hid"), r6(col("p")).as("p"), col("p_rank"),
          r6(col("by_critical")).as("by_critical"), col("discovery"))
        .orderBy("hid")
    },
    Some("""
      WITH hyp AS (SELECT o_orderkey AS hid,
                          CASE WHEN o_orderkey % 50 = 0
                               THEN (o_orderkey * 7919 % 9973) / 9973000.0
                               ELSE (o_orderkey * 7919 % 9973) / 9973.0
                          END AS p
                   FROM orders WHERE o_orderkey <= 500),
      hm AS (SELECT sum(1.0 / rn) AS h FROM
               (SELECT row_number() OVER () AS rn FROM hyp)),
      v AS (SELECT p, count(*)::DOUBLE AS cnt FROM hyp GROUP BY 1),
      w AS (SELECT p, cnt,
                   coalesce(sum(cnt) OVER (ORDER BY p ROWS BETWEEN
                     UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
            FROM v),
      m AS (SELECT count(*)::DOUBLE AS m FROM hyp),
      ps AS (SELECT max(CASE WHEN p <= (bef + cnt) * (0.1 / hm.h) / m.m
                        THEN p END) AS pstar
             FROM w, m, hm)
      SELECT hid, round(p, 6) AS p, (bef + 1)::BIGINT AS p_rank,
             round((bef + 1) * (0.1 / hm.h) / m.m, 6) AS by_critical,
             (pstar IS NOT NULL AND p <= pstar) AS discovery
      FROM hyp JOIN w USING (p), m, ps, hm
      ORDER BY hid"""))

  /** Storey π₀ + q-values over the same hypothesis frame — the
    * adaptive-FDR readout per hypothesis. */
  private val q403 = Entry(
    "q403_storey_qvalues",
    (s, d) => {
      val hyp = Tables.orders(s, d).where(col("o_orderkey") <= 500)
        .select(col("o_orderkey").as("hid"),
          when(col("o_orderkey") % 50 === 0,
            (col("o_orderkey") * 7919 % 9973) / lit(9973000.0))
            .otherwise((col("o_orderkey") * 7919 % 9973) / lit(9973.0))
            .as("p"))
      AnalysisPlanner.storeyQValues(hyp, "p", lambda = 0.5)
        .select(col("hid"), r6(col("p")).as("p"), col("p_rank"),
          r6(col("pi0")).as("pi0"), r6(col("q_value")).as("q_value"))
        .orderBy("hid")
    },
    Some("""
      WITH hyp AS (SELECT o_orderkey AS hid,
                          CASE WHEN o_orderkey % 50 = 0
                               THEN (o_orderkey * 7919 % 9973) / 9973000.0
                               ELSE (o_orderkey * 7919 % 9973) / 9973.0
                          END AS p
                   FROM orders WHERE o_orderkey <= 500),
      t AS (SELECT count(*)::DOUBLE AS m,
              sum(CASE WHEN p > 0.5 THEN 1.0 ELSE 0 END) AS ov
            FROM hyp),
      v AS (SELECT p, count(*)::DOUBLE AS cnt FROM hyp GROUP BY 1),
      w AS (SELECT p, cnt,
                   coalesce(sum(cnt) OVER (ORDER BY p ROWS BETWEEN
                     UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef,
                   least(1.0, t.ov / ((1 - 0.5) * t.m)) AS pi0,
                   least(1.0, t.ov / ((1 - 0.5) * t.m)) * t.m * p /
                     (coalesce(sum(cnt) OVER (ORDER BY p ROWS BETWEEN
                       UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + cnt)
                     AS raw
            FROM v, t),
      qv AS (SELECT p, bef, pi0,
               least(1.0, min(raw) OVER (ORDER BY p ROWS BETWEEN
                 CURRENT ROW AND UNBOUNDED FOLLOWING)) AS q_value
             FROM w)
      SELECT hid, round(hyp.p, 6) AS p, (bef + 1)::BIGINT AS p_rank,
             round(pi0, 6) AS pi0, round(q_value, 6) AS q_value
      FROM hyp JOIN qv USING (p)
      ORDER BY hid"""))

  /** Blomqvist's β: quadrant dependence of quantity and price around
    * the median point — the robustness floor of the correlation
    * family. */
  private val q404 = Entry(
    "q404_blomqvist_beta",
    (s, d) =>
      AnalysisPlanner.blomqvistBeta(Tables.lineitem(s, d),
          "l_quantity", "l_extendedprice")
        .select(col("n_used"), col("n_dropped"),
          r6(col("median_x")).as("median_x"),
          r6(col("median_y")).as("median_y"), r6(col("beta")).as("beta")),
    Some("""
      WITH r AS (SELECT l_quantity::DOUBLE AS x,
                   l_extendedprice::DOUBLE AS y
                 FROM lineitem
                 WHERE l_quantity IS NOT NULL
                   AND l_extendedprice IS NOT NULL),
      m AS (SELECT quantile_cont(x, 0.5) AS mx,
              quantile_cont(y, 0.5) AS my FROM r),
      a AS (SELECT
              sum(CASE WHEN (x > mx AND y > my) OR (x < mx AND y < my)
                  THEN 1.0 ELSE 0 END) AS conc,
              sum(CASE WHEN (x > mx AND y < my) OR (x < mx AND y > my)
                  THEN 1.0 ELSE 0 END) AS disc,
              count(*)::DOUBLE AS tot, max(mx) AS mx, max(my) AS my
            FROM r, m)
      SELECT (conc + disc)::BIGINT AS n_used,
             (tot - conc - disc)::BIGINT AS n_dropped,
             round(mx, 6) AS median_x, round(my, 6) AS median_y,
             round((conc - disc) / (conc + disc), 6) AS beta
      FROM a"""))

  /** Goodman–Kruskal λ: does order status actually help PREDICT
    * priority (and vice versa) — the actionability check behind a
    * significant χ². */
  private val q405 = Entry(
    "q405_gk_lambda",
    (s, d) =>
      AnalysisPlanner.gkLambda(Tables.orders(s, d), "o_orderstatus",
          "o_orderpriority")
        .select(col("n"),
          r6(col("lambda_b_given_a")).as("lambda_b_given_a"),
          r6(col("lambda_a_given_b")).as("lambda_a_given_b"),
          r6(col("lambda_symmetric")).as("lambda_symmetric")),
    Some("""
      WITH j AS (SELECT o_orderstatus AS a, o_orderpriority AS b,
                   count(*)::DOUBLE AS n
                 FROM orders
                 WHERE o_orderstatus IS NOT NULL
                   AND o_orderpriority IS NOT NULL
                 GROUP BY 1, 2),
      rm AS (SELECT sum(mx) AS srm FROM
               (SELECT a, max(n) AS mx FROM j GROUP BY 1)),
      cm AS (SELECT sum(mx) AS scm FROM
               (SELECT b, max(n) AS mx FROM j GROUP BY 1)),
      ma AS (SELECT max(s) AS maxa FROM
               (SELECT a, sum(n) AS s FROM j GROUP BY 1)),
      mb AS (SELECT max(s) AS maxb FROM
               (SELECT b, sum(n) AS s FROM j GROUP BY 1)),
      t AS (SELECT sum(n) AS nn FROM j)
      SELECT nn::BIGINT AS n,
             round((srm - maxb) / (nn - maxb), 6) AS lambda_b_given_a,
             round((scm - maxa) / (nn - maxa), 6) AS lambda_a_given_b,
             round((srm + scm - maxa - maxb) /
               (2 * nn - maxa - maxb), 6) AS lambda_symmetric
      FROM rm, cm, ma, mb, t"""))

  /** Woolf homogeneity: is the even-user / high-value odds ratio ONE
    * effect across event types, or effect modification — the
    * precondition for q247's pooled OR. */
  private val q406 = Entry(
    "q406_woolf_homogeneity",
    (s, d) =>
      AnalysisPlanner.woolfHomogeneity(Tables.events(s, d),
          "event_type", col("user_id") % 2 === 0, col("value") > 250)
        .select(col("n"), col("n_strata"),
          r6(col("pooled_log_or")).as("pooled_log_or"),
          r6(col("chi2")).as("chi2"), col("dof")),
    Some("""
      WITH per AS (SELECT event_type,
              sum(CASE WHEN user_id % 2 = 0 AND "value" > 250
                  THEN 1.0 ELSE 0 END) AS a,
              sum(CASE WHEN user_id % 2 = 0 AND NOT ("value" > 250)
                  THEN 1.0 ELSE 0 END) AS b,
              sum(CASE WHEN user_id % 2 <> 0 AND "value" > 250
                  THEN 1.0 ELSE 0 END) AS c,
              sum(CASE WHEN user_id % 2 <> 0 AND NOT ("value" > 250)
                  THEN 1.0 ELSE 0 END) AS dd
            FROM events WHERE event_type IS NOT NULL GROUP BY 1),
      lw AS (SELECT a, b, c, dd,
               ln(((a + 0.5) * (dd + 0.5)) / ((b + 0.5) * (c + 0.5)))
                 AS lor,
               1.0 / (1.0 / (a + 0.5) + 1.0 / (b + 0.5)
                 + 1.0 / (c + 0.5) + 1.0 / (dd + 0.5)) AS w
             FROM per),
      pl AS (SELECT sum(w * lor) / sum(w) AS plor FROM lw)
      SELECT sum(a + b + c + dd)::BIGINT AS n,
             count(*)::BIGINT AS n_strata,
             round(max(pl.plor), 6) AS pooled_log_or,
             round(sum(w * (lor - pl.plor) * (lor - pl.plor)), 6)
               AS chi2,
             (count(*) - 1)::BIGINT AS dof
      FROM lw, pl"""))

  /** Zero-inflation score test on orders-per-customer: more
    * no-order customers than the Poisson fit predicts? */
  private val q407 = Entry(
    "q407_zero_inflation",
    (s, d) =>
      AnalysisPlanner.zeroInflationScore(
          Tables.customer(s, d)
            .join(Tables.orders(s, d),
              col("c_custkey") === col("o_custkey"), "left")
            .groupBy(col("c_custkey"))
            .agg(count(col("o_orderkey")).as("y")),
          "y")
        .select(col("n"), col("n_zero"),
          r6(col("lambda_hat")).as("lambda_hat"),
          r6(col("expected_zero")).as("expected_zero"),
          r6(col("score_stat")).as("score_stat")),
    Some("""
      WITH cnt AS (SELECT c.c_custkey, count(o.o_orderkey)::DOUBLE AS y
                   FROM customer c LEFT JOIN orders o
                     ON o.o_custkey = c.c_custkey
                   GROUP BY 1),
      a AS (SELECT count(*)::DOUBLE AS n,
              sum(CASE WHEN y = 0 THEN 1.0 ELSE 0 END) AS n0,
              avg(y) AS lam
            FROM cnt),
      b AS (SELECT n, n0, lam, exp(-lam) AS p0 FROM a)
      SELECT n::BIGINT AS n, n0::BIGINT AS n_zero,
             round(lam, 6) AS lambda_hat,
             round(n * p0, 6) AS expected_zero,
             round(pow(n0 - n * p0, 2) /
               (n * p0 * (1 - p0) - n * lam * p0 * p0), 6)
               AS score_stat
      FROM b"""))

  /** Wilson score intervals for the high-value rate per event type —
    * the binomial CI that behaves at the extremes. */
  private val q408 = Entry(
    "q408_wilson_intervals",
    (s, d) =>
      AnalysisPlanner.wilsonIntervals(Tables.events(s, d),
          "event_type", col("value") > 250)
        .select(col("event_type"), col("n"), col("successes"),
          r6(col("rate")).as("rate"),
          r6(col("wilson_low")).as("wilson_low"),
          r6(col("wilson_high")).as("wilson_high"))
        .orderBy("event_type"),
    Some("""
      WITH g AS (SELECT event_type, count(*)::DOUBLE AS n,
              sum(CASE WHEN "value" > 250 THEN 1.0 ELSE 0 END) AS x
            FROM events WHERE event_type IS NOT NULL GROUP BY 1),
      w AS (SELECT event_type, n, x, x / n AS p,
              1.959963984540054 AS z
            FROM g),
      c AS (SELECT event_type, n, x, p, z,
              (x + z * z / 2) / (n + z * z) AS center,
              z * sqrt(p * (1 - p) / n + z * z / (4 * n * n)) /
                (1 + z * z / n) AS half
            FROM w)
      SELECT event_type, n::BIGINT AS n, x::BIGINT AS successes,
             round(p, 6) AS rate,
             round(greatest(0.0, center - half), 6) AS wilson_low,
             round(least(1.0, center + half), 6) AS wilson_high
      FROM c ORDER BY event_type"""))

  /** Hartley's F-max variance-ratio screen across event types — the
    * triage before Bartlett/Levene. */
  private val q409 = Entry(
    "q409_hartley_fmax",
    (s, d) =>
      AnalysisPlanner.hartleyFmax(Tables.events(s, d), "event_type",
          "value")
        .select(col("n_groups"), col("n_min"), col("n_max"),
          r6(col("var_min")).as("var_min"),
          r6(col("var_max")).as("var_max"), r6(col("f_max")).as("f_max")),
    Some("""
      WITH g AS (SELECT event_type, count(*)::BIGINT AS n,
              var_samp("value"::DOUBLE) AS v
            FROM events
            WHERE "value" IS NOT NULL AND event_type IS NOT NULL
            GROUP BY 1)
      SELECT count(*)::BIGINT AS n_groups, min(n) AS n_min,
             max(n) AS n_max, round(min(v), 6) AS var_min,
             round(max(v), 6) AS var_max,
             round(max(v) / min(v), 6) AS f_max
      FROM g WHERE v IS NOT NULL"""))

  /** Mood's squared-rank scale test on the purchase/click pair — the
    * squared-rank sibling of q387's folded ranks. */
  private val q410 = Entry(
    "q410_mood_scale",
    (s, d) =>
      AnalysisPlanner
        .moodScaleFromCells(eventTypeValueCells(s, d),
          control = "purchase", treatment = "click")
        .select(col("n_c"), col("n_t"), r6(col("t_stat")).as("t_stat"),
          r6(col("z_stat")).as("z_stat")),
    Some("""
      WITH d AS (SELECT "value"::DOUBLE AS v, event_type AS g
                 FROM events WHERE "value" IS NOT NULL
                   AND event_type IN ('purchase', 'click')),
      vc AS (SELECT v,
               sum(CASE WHEN g = 'click' THEN 1.0 ELSE 0 END) AS ct,
               sum(CASE WHEN g = 'purchase' THEN 1.0 ELSE 0 END) AS cc
             FROM d GROUP BY 1),
      pre AS (SELECT ct, cc,
                coalesce(sum(ct + cc) OVER (ORDER BY v ROWS BETWEEN
                  UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  + (ct + cc + 1) / 2.0 AS r
              FROM vc),
      tot AS (SELECT sum(ct + cc) AS nn FROM vc),
      a AS (SELECT sum(cc) AS nc, sum(ct) AS nt,
              sum(ct * (r - (nn + 1) / 2.0) * (r - (nn + 1) / 2.0))
                AS t
            FROM pre, tot GROUP BY nn)
      SELECT nc::BIGINT AS n_c, nt::BIGINT AS n_t,
             round(t, 6) AS t_stat,
             round((t - nt * ((nc + nt) * (nc + nt) - 1) / 12.0) /
               sqrt(nc * nt * (nc + nt + 1) *
                 ((nc + nt) * (nc + nt) - 4) / 180.0), 6) AS z_stat
      FROM a"""))

  /** Exact 1-D Cramér / energy distance between purchase and click
    * values — the accumulated-CDF-gap companion to q10's KS. */
  private val q411 = Entry(
    "q411_cramer_energy",
    (s, d) =>
      AnalysisPlanner
        .energyDistanceFromCells(eventTypeValueCells(s, d),
          control = "purchase", treatment = "click")
        .select(col("n_c"), col("n_t"), r6(col("cramer_d")).as("cramer_d"),
          r6(col("energy_dist")).as("energy_dist")),
    Some("""
      WITH d AS (SELECT "value"::DOUBLE AS v, event_type AS g
                 FROM events WHERE "value" IS NOT NULL
                   AND event_type IN ('purchase', 'click')),
      vc AS (SELECT v,
               sum(CASE WHEN g = 'click' THEN 1.0 ELSE 0 END) AS ct,
               sum(CASE WHEN g = 'purchase' THEN 1.0 ELSE 0 END) AS cc
             FROM d GROUP BY 1),
      pre AS (SELECT v,
                sum(ct) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                  PRECEDING AND CURRENT ROW) AS ft,
                sum(cc) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                  PRECEDING AND CURRENT ROW) AS fc,
                lead(v) OVER (ORDER BY v) AS vn
              FROM vc),
      tot AS (SELECT sum(ct) AS nt, sum(cc) AS nc FROM vc)
      SELECT nc::BIGINT AS n_c, nt::BIGINT AS n_t,
             round(sum((ft / nt - fc / nc) * (ft / nt - fc / nc) *
               (vn - v)), 6) AS cramer_d,
             round(2 * sum((ft / nt - fc / nc) * (ft / nt - fc / nc) *
               (vn - v)), 6) AS energy_dist
      FROM pre, tot WHERE vn IS NOT NULL
      GROUP BY nc, nt"""))

  /** Wald–Wolfowitz runs test of the daily event-count sequence vs
    * its median — randomness screen on the KPI series. */
  private val q412 = Entry(
    "q412_runs_test",
    (s, d) =>
      graft.ops.TimeSeries.runsTest(Tables.events(s, d), "ts")
        .select(col("n_days"), col("n_above"), col("n_below"),
          col("n_runs"), r6(col("z_stat")).as("z_stat")),
    Some("""
      WITH daily AS (SELECT CAST(ts AS DATE) AS dd,
                       count(*)::DOUBLE AS y
                     FROM events WHERE ts IS NOT NULL GROUP BY 1),
      med AS (SELECT quantile_cont(y, 0.5) AS m FROM daily),
      s AS (SELECT dd, CASE WHEN y > m THEN 1.0 ELSE 0 END AS sgn
            FROM daily, med WHERE y <> m),
      w AS (SELECT sgn, lag(sgn) OVER (ORDER BY dd) AS prev FROM s),
      a AS (SELECT sum(CASE WHEN prev IS NOT NULL AND sgn <> prev
                       THEN 1.0 ELSE 0 END) + 1 AS r
            FROM w),
      c AS (SELECT sum(sgn) AS na, count(*) - sum(sgn) AS nb,
              count(*)::DOUBLE AS n
            FROM s)
      SELECT n::BIGINT AS n_days, na::BIGINT AS n_above,
             nb::BIGINT AS n_below, r::BIGINT AS n_runs,
             round((r - (2 * na * nb / n + 1)) /
               sqrt(2 * na * nb * (2 * na * nb - n) /
                 (n * n * (n - 1))), 6) AS z_stat
      FROM a, c"""))

  /** TV / Hellinger / Bhattacharyya panel of the event-type mix
    * between user cohorts — q384's PSI/JS/χ² companions. */
  private val q413 = Entry(
    "q413_distribution_distances",
    (s, d) =>
      AnalysisPlanner.distributionDistances(Tables.events(s, d),
          "event_type", col("user_id") % 2 === 0)
        .select(col("n_a"), col("n_b"), col("n_categories"),
          r6(col("tv_dist")).as("tv_dist"),
          r6(col("hellinger")).as("hellinger"),
          r6(col("bhattacharyya_coef")).as("bhattacharyya_coef"),
          r6(col("bhattacharyya_dist")).as("bhattacharyya_dist")),
    Some("""
      WITH per AS (SELECT event_type,
              sum(CASE WHEN user_id % 2 = 0 THEN 1.0 ELSE 0 END) AS ca,
              sum(CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1.0 END) AS cb
            FROM events WHERE event_type IS NOT NULL GROUP BY 1),
      t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM per),
      a AS (SELECT max(na) AS na, max(nb) AS nb, count(*) AS k,
              sum(abs(ca / na - cb / nb)) / 2 AS tv,
              sum(sqrt((ca / na) * (cb / nb))) AS bc
            FROM per, t)
      SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b, k AS n_categories,
             round(tv, 6) AS tv_dist,
             round(sqrt(greatest(0.0, 1 - bc)), 6) AS hellinger,
             round(bc, 6) AS bhattacharyya_coef,
             round(-ln(bc), 6) AS bhattacharyya_dist
      FROM a"""))

  /** AMOC changepoint: WHEN did the daily event volume shift level —
    * the SSE-optimal single split. */
  private val q414 = Entry(
    "q414_amoc_changepoint",
    (s, d) =>
      graft.ops.TimeSeries.amocChangepoint(Tables.events(s, d), "ts")
        .select(col("n_days"), col("change_day"), col("n_left"),
          col("n_right"), r6(col("mean_left")).as("mean_left"),
          r6(col("mean_right")).as("mean_right"),
          r6(col("sse_total")).as("sse_total"),
          r6(col("sse_split")).as("sse_split"),
          r6(col("reduction_share")).as("reduction_share")),
    Some("""
      WITH daily AS (SELECT datediff('day', DATE '1970-01-01',
                       CAST(ts AS DATE)) AS t, count(*)::DOUBLE AS y
                     FROM events WHERE ts IS NOT NULL GROUP BY 1),
      pre AS (SELECT t, y,
                sum(y) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                  PRECEDING AND CURRENT ROW) AS s,
                sum(y * y) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                  PRECEDING AND CURRENT ROW) AS s2,
                row_number() OVER (ORDER BY t) AS i
              FROM daily),
      tot AS (SELECT count(*)::DOUBLE AS n, sum(y) AS ts2,
                sum(y * y) AS ts22
              FROM daily),
      cand AS (SELECT t, i, s, s2, n, ts2, ts22,
                 (s2 - s * s / i) +
                   ((ts22 - s2) - (ts2 - s) * (ts2 - s) / (n - i))
                   AS sse
               FROM pre, tot WHERE i < n),
      best AS (SELECT * FROM cand ORDER BY sse, t LIMIT 1)
      SELECT n::BIGINT AS n_days,
             DATE '1970-01-01' + t::INT AS change_day,
             i::BIGINT AS n_left, (n - i)::BIGINT AS n_right,
             round(s / i, 6) AS mean_left,
             round((ts2 - s) / (n - i), 6) AS mean_right,
             round(ts22 - ts2 * ts2 / n, 6) AS sse_total,
             round(sse, 6) AS sse_split,
             round((ts22 - ts2 * ts2 / n - sse) /
               (ts22 - ts2 * ts2 / n), 6) AS reduction_share
      FROM best"""))

  /** Pettitt rank changepoint on the same daily series — the
    * distribution-free companion to q414. */
  private val q415 = Entry(
    "q415_pettitt",
    (s, d) =>
      graft.ops.TimeSeries.pettittTest(Tables.events(s, d), "ts")
        .select(col("n_days"), col("change_day"),
          r6(col("k_stat")).as("k_stat"),
          r6(col("p_approx")).as("p_approx")),
    Some("""
      WITH daily AS (SELECT datediff('day', DATE '1970-01-01',
                       CAST(ts AS DATE)) AS t, count(*)::DOUBLE AS y
                     FROM events WHERE ts IS NOT NULL GROUP BY 1),
      rk AS (SELECT t, rank() OVER (ORDER BY y)
               + (count(*) OVER (PARTITION BY y) - 1) / 2.0 AS r
             FROM daily),
      pre AS (SELECT t,
                sum(r) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                  PRECEDING AND CURRENT ROW) AS s,
                row_number() OVER (ORDER BY t) AS i
              FROM rk),
      n AS (SELECT count(*)::DOUBLE AS n FROM daily),
      u AS (SELECT t, 2 * s - i * (n + 1) AS u
            FROM pre, n WHERE i < n),
      best AS (SELECT * FROM u ORDER BY abs(u) DESC, t LIMIT 1)
      SELECT n.n::BIGINT AS n_days,
             DATE '1970-01-01' + t::INT AS change_day,
             round(abs(u), 6) AS k_stat,
             round(least(1.0, 2 * exp(-6 * u * u /
               (n * n * n + n * n))), 6) AS p_approx
      FROM best, n"""))

  /** Cox–Stuart trend sign test on the daily event counts — the
    * assumption-free "is it trending at all" gate. */
  private val q416 = Entry(
    "q416_cox_stuart",
    (s, d) =>
      graft.ops.TimeSeries.coxStuart(Tables.events(s, d), "ts")
        .select(col("n_days"), col("n_pairs"), col("n_up"),
          col("n_down"), r6(col("z_stat")).as("z_stat")),
    Some("""
      WITH daily AS (SELECT datediff('day', DATE '1970-01-01',
                       CAST(ts AS DATE)) AS t, count(*)::DOUBLE AS y
                     FROM events WHERE ts IS NOT NULL GROUP BY 1),
      idx AS (SELECT y, row_number() OVER (ORDER BY t) AS i
              FROM daily),
      cnt AS (SELECT count(*) AS n FROM daily),
      p AS (SELECT b.y - a.y AS d
            FROM idx a JOIN idx b
              ON b.i = a.i + (SELECT (n + 1) // 2 FROM cnt)),
      nz AS (SELECT count(*)::DOUBLE AS m,
               sum(CASE WHEN d > 0 THEN 1.0 ELSE 0 END) AS up
             FROM p WHERE d <> 0)
      SELECT cnt.n::BIGINT AS n_days, m::BIGINT AS n_pairs,
             up::BIGINT AS n_up, (m - up)::BIGINT AS n_down,
             round((up - m / 2) / sqrt(m / 4), 6) AS z_stat
      FROM nz, cnt"""))

  /** PACF at lags 1–3 of the daily value series via Durbin–Levinson —
    * AR(1) or genuinely higher-order? */
  private val q417 = Entry(
    "q417_pacf",
    (s, d) =>
      graft.ops.TimeSeries.pacf3(Tables.events(s, d), "ts", "value")
        .select(col("n_days"), r6(col("r1")).as("r1"),
          r6(col("r2")).as("r2"), r6(col("r3")).as("r3"),
          r6(col("pacf1")).as("pacf1"), r6(col("pacf2")).as("pacf2"),
          r6(col("pacf3")).as("pacf3")),
    Some("""
      WITH daily AS (SELECT datediff('day', DATE '1970-01-01', ts::DATE)
                       AS t, avg("value") AS x
                     FROM events
                     WHERE "value" IS NOT NULL AND ts IS NOT NULL
                     GROUP BY 1),
      st AS (SELECT count(*)::DOUBLE AS n, sum(x) / count(*) AS m,
               sum(x * x) - sum(x) * sum(x) / count(*) AS den
             FROM daily),
      r1 AS (SELECT sum((a.x - st.m) * (b.x - st.m)) / max(st.den) AS r1
             FROM daily a JOIN daily b ON a.t + 1 = b.t, st),
      r2 AS (SELECT sum((a.x - st.m) * (b.x - st.m)) / max(st.den) AS r2
             FROM daily a JOIN daily b ON a.t + 2 = b.t, st),
      r3 AS (SELECT sum((a.x - st.m) * (b.x - st.m)) / max(st.den) AS r3
             FROM daily a JOIN daily b ON a.t + 3 = b.t, st),
      p2 AS (SELECT st.n, r1.r1, r2.r2, r3.r3,
               (r2.r2 - r1.r1 * r1.r1) / (1 - r1.r1 * r1.r1) AS p22
             FROM st, r1, r2, r3),
      p3 AS (SELECT n, r1, r2, r3, p22, r1 * (1 - p22) AS p21 FROM p2)
      SELECT n::BIGINT AS n_days, round(r1, 6) AS r1,
             round(r2, 6) AS r2, round(r3, 6) AS r3,
             round(r1, 6) AS pacf1, round(p22, 6) AS pacf2,
             round((r3 - p21 * r2 - p22 * r1) /
               (1 - p21 * r1 - p22 * r2), 6) AS pacf3
      FROM p3"""))

  /** Aalen–Johansen cumulative incidence: big purchase vs error as
    * competing first events per user — where 1−KM per cause lies. */
  private val q418 = Entry(
    "q418_competing_risks",
    (s, d) => {
      val hp = when(col("event_type") === "purchase" &&
        col("value") > 200, col("ts"))
      val he = when(col("event_type") === "error", col("ts"))
      val per = Tables.events(s, d)
        .groupBy("user_id")
        .agg(min(hp).as("__hp"), min(he).as("__he"),
          min(col("ts")).as("__f"), max(col("ts")).as("__l"))
        .select(
          when(col("__hp").isNotNull &&
            (col("__he").isNull || col("__hp") <= col("__he")), 1)
            .when(col("__he").isNotNull, 2).otherwise(0).as("cause"),
          datediff(to_date(
            when(col("__hp").isNotNull &&
              (col("__he").isNull || col("__hp") <= col("__he")),
              col("__hp"))
              .when(col("__he").isNotNull, col("__he"))
              .otherwise(col("__l"))), to_date(col("__f"))).as("dur"))
      AnalysisPlanner.aalenJohansen(per, "dur", "cause")
        .select(col("duration"), col("n_risk"), col("d_cause1"),
          col("d_cause2"), r6(col("survival")).as("survival"),
          r6(col("cif_1")).as("cif_1"), r6(col("cif_2")).as("cif_2"))
        .orderBy("duration")
    },
    Some("""
      WITH per AS (SELECT user_id,
              min(CASE WHEN event_type = 'purchase' AND "value" > 200
                  THEN ts END) AS hp,
              min(CASE WHEN event_type = 'error' THEN ts END) AS he,
              min(ts) AS f, max(ts) AS l
            FROM events GROUP BY 1),
      cr AS (SELECT CASE WHEN hp IS NOT NULL
                           AND (he IS NULL OR hp <= he) THEN 1
                         WHEN he IS NOT NULL THEN 2 ELSE 0 END AS cause,
               datediff('day', f::DATE,
                 (CASE WHEN hp IS NOT NULL AND (he IS NULL OR hp <= he)
                       THEN hp
                       WHEN he IS NOT NULL THEN he ELSE l END)::DATE)
                 AS t
             FROM per),
      g AS (SELECT t::DOUBLE AS t,
              sum(CASE WHEN cause = 1 THEN 1.0 ELSE 0 END) AS d1,
              sum(CASE WHEN cause = 2 THEN 1.0 ELSE 0 END) AS d2,
              count(*)::DOUBLE AS tot
            FROM cr GROUP BY 1),
      n AS (SELECT sum(tot) AS nn FROM g),
      pre AS (SELECT t, d1, d2,
                nn - coalesce(sum(tot) OVER (ORDER BY t ROWS BETWEEN
                  UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
              FROM g, n),
      ev AS (SELECT t, d1, d2, n_risk,
               CASE WHEN d1 + d2 < n_risk
                    THEN ln(1 - (d1 + d2) / n_risk) ELSE 0 END AS lnf
             FROM pre WHERE d1 + d2 > 0),
      sv AS (SELECT t, d1, d2, n_risk, lnf,
               coalesce(sum(lnf) OVER (ORDER BY t ROWS BETWEEN
                 UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lnp
             FROM ev),
      inc AS (SELECT t, d1, d2, n_risk, lnf, lnp,
                exp(lnp) * d1 / n_risk AS i1,
                exp(lnp) * d2 / n_risk AS i2
              FROM sv)
      SELECT t AS duration, n_risk::BIGINT AS n_risk,
             d1::BIGINT AS d_cause1, d2::BIGINT AS d_cause2,
             CASE WHEN d1 + d2 < n_risk
                  THEN round(exp(lnp + lnf), 6) ELSE 0 END AS survival,
             round(sum(i1) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW), 6) AS cif_1,
             round(sum(i2) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW), 6) AS cif_2
      FROM inc ORDER BY duration"""))

  /** Spiegelhalter's Z: is the synthetic order score's miscalibration
    * statistically real — the binning-free companion to q398. */
  private val q419 = Entry(
    "q419_spiegelhalter_z",
    (s, d) =>
      graft.ops.Evaluation.spiegelhalterZ(scoredOrders(s, d), "label",
          "score")
        .select(col("n"), r6(col("brier")).as("brier"),
          r6(col("z_stat")).as("z_stat")),
    Some(s"""
      WITH $scoredOrdersSql,
      c AS (SELECT y, least(greatest(p, 0), 1) AS p FROM sc),
      a AS (SELECT count(*)::BIGINT AS n,
              avg((y - p) * (y - p)) AS brier,
              sum((y - p) * (1 - 2 * p)) AS num,
              sum((1 - 2 * p) * (1 - 2 * p) * p * (1 - p)) AS den
            FROM c)
      SELECT n, round(brier, 6) AS brier,
             round(num / sqrt(den), 6) AS z_stat
      FROM a"""))

  /** Hosmer–Lemeshow χ² over risk deciles cut at exact score
    * quantiles — the classical calibration goodness-of-fit. */
  private val q420 = Entry(
    "q420_hosmer_lemeshow",
    (s, d) =>
      graft.ops.Evaluation.hosmerLemeshow(scoredOrders(s, d), "label",
          "score", bins = 10)
        .select(col("n"), col("n_bins"), r6(col("chi2")).as("chi2"),
          col("dof")),
    Some(s"""
      WITH $scoredOrdersSql,
      c AS (SELECT y, least(greatest(p, 0), 1) AS p FROM sc),
      q AS (SELECT quantile_cont(p, 0.1) AS q1,
              quantile_cont(p, 0.2) AS q2, quantile_cont(p, 0.3) AS q3,
              quantile_cont(p, 0.4) AS q4, quantile_cont(p, 0.5) AS q5,
              quantile_cont(p, 0.6) AS q6, quantile_cont(p, 0.7) AS q7,
              quantile_cont(p, 0.8) AS q8, quantile_cont(p, 0.9) AS q9
            FROM c),
      b AS (SELECT y, p,
              (CASE WHEN p > q1 THEN 1 ELSE 0 END +
               CASE WHEN p > q2 THEN 1 ELSE 0 END +
               CASE WHEN p > q3 THEN 1 ELSE 0 END +
               CASE WHEN p > q4 THEN 1 ELSE 0 END +
               CASE WHEN p > q5 THEN 1 ELSE 0 END +
               CASE WHEN p > q6 THEN 1 ELSE 0 END +
               CASE WHEN p > q7 THEN 1 ELSE 0 END +
               CASE WHEN p > q8 THEN 1 ELSE 0 END +
               CASE WHEN p > q9 THEN 1 ELSE 0 END) AS g
            FROM c, q),
      per AS (SELECT g, count(*)::DOUBLE AS ng, sum(y) AS o,
                sum(p) AS e
              FROM b GROUP BY 1),
      f AS (SELECT sum(ng)::BIGINT AS n, count(*) AS n_bins,
              sum(pow(o - e, 2) / (e * (1 - e / ng))) AS chi2
            FROM per WHERE e > 0 AND e < ng)
      SELECT n, n_bins, round(chi2, 6) AS chi2,
             greatest(n_bins - 2, 1)::BIGINT AS dof
      FROM f"""))

  /** Murphy decomposition of the Brier score: miscalibration vs
    * missing discrimination, separated. */
  private val q421 = Entry(
    "q421_brier_decomposition",
    (s, d) =>
      graft.ops.Evaluation.brierDecomposition(scoredOrders(s, d),
          "label", "score", bins = 10)
        .select(col("n"), r6(col("brier")).as("brier"),
          r6(col("reliability")).as("reliability"),
          r6(col("resolution")).as("resolution"),
          r6(col("uncertainty")).as("uncertainty"),
          r6(col("within_bin_variance")).as("within_bin_variance")),
    Some(s"""
      WITH $scoredOrdersSql,
      c AS (SELECT y, least(greatest(p, 0), 1) AS p FROM sc),
      b AS (SELECT least(floor(p * 10), 9) AS bk, p, y FROM c),
      per AS (SELECT bk, count(*)::DOUBLE AS nk, avg(p) AS pk,
                avg(y) AS ok, sum((y - p) * (y - p)) AS sqk
              FROM b GROUP BY 1),
      t AS (SELECT sum(nk) AS nn,
              sum(ok * nk) / sum(nk) AS obar
            FROM per),
      f AS (SELECT max(nn)::BIGINT AS n,
              sum(sqk) / max(nn) AS brier,
              sum(nk * (pk - ok) * (pk - ok)) / max(nn) AS rel,
              sum(nk * (ok - obar) * (ok - obar)) / max(nn) AS res,
              max(obar * (1 - obar)) AS unc
            FROM per, t)
      SELECT n, round(brier, 6) AS brier, round(rel, 6) AS reliability,
             round(res, 6) AS resolution, round(unc, 6) AS uncertainty,
             round(brier - rel + res - unc, 6) AS within_bin_variance
      FROM f"""))

  /** Vocabulary coverage curve: token-mass share of top-k vocab at
    * k = 100 / 1000 / 10000 — the tokenizer sizing readout. */
  private val q422 = Entry(
    "q422_vocab_coverage",
    (s, d) =>
      graft.ops.TextAnalysis
        .topKVocabCoverage(Tables.documents(s, d), "text",
          Seq(100L, 1000L, 10000L))
        .select(col("k"), col("k_effective"), col("vocabulary"),
          col("total_tokens"), col("covered_tokens"),
          r6(col("coverage")).as("coverage"))
        .orderBy("k"),
    Some("""
      WITH w AS (SELECT unnest(string_split(text, ' ')) AS w
                 FROM documents WHERE text IS NOT NULL),
      tf AS (SELECT w, count(*)::DOUBLE AS c FROM w WHERE w <> ''
             GROUP BY 1),
      cc AS (SELECT c, count(*)::DOUBLE AS m, c * count(*) AS mass
             FROM tf GROUP BY 1),
      pre AS (SELECT c, m,
                coalesce(sum(m) OVER (ORDER BY c DESC ROWS BETWEEN
                  UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS exm,
                coalesce(sum(mass) OVER (ORDER BY c DESC ROWS BETWEEN
                  UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS exmass
              FROM cc),
      t AS (SELECT sum(c) AS total, count(*)::DOUBLE AS vocab FROM tf),
      ks AS (SELECT unnest([100, 1000, 10000]) AS k),
      k2 AS (SELECT k, least(k::DOUBLE, vocab) AS ke, total, vocab
             FROM ks, t)
      SELECT k, ke::BIGINT AS k_effective, vocab::BIGINT AS vocabulary,
             total::BIGINT AS total_tokens,
             (exmass + (ke - exm) * c)::BIGINT AS covered_tokens,
             round((exmass + (ke - exm) * c) / total, 6) AS coverage
      FROM pre JOIN k2 ON exm < ke AND ke <= exm + m
      ORDER BY k"""))

  /** Acklam-probit CASE expression in DuckDB SQL over a probability
    * column `p` with precomputed helper columns qc/rc/ql/qu (the
    * q210/q372 coefficient list, shared so every normal-scores oracle
    * replays the SAME arithmetic the Spark side runs). */
  private def acklamSqlCase: String = {
    val a = Seq(-3.969683028665376e+01, 2.209460984245205e+02,
      -2.759285104469687e+02, 1.383577518672690e+02,
      -3.066479806614716e+01, 2.506628277459239e+00)
    val b = Seq(-5.447609879822406e+01, 1.615858368580409e+02,
      -1.556989798598866e+02, 6.680131188771972e+01,
      -1.328068155288572e+01)
    val c = Seq(-7.784894002430293e-03, -3.223964580411365e-01,
      -2.400758277161838e+00, -2.549732539343734e+00,
      4.374664141464968e+00, 2.938163982698783e+00)
    val dd = Seq(7.784695709041462e-03, 3.224671290700398e-01,
      2.445134137142996e+00, 3.754408661907416e+00)
    def h(cs: Seq[Double], x: String): String =
      cs.tail.foldLeft(cs.head.toString)((acc, k) => s"($acc * $x + $k)")
    s"""CASE WHEN pr < 0.02425 THEN
          ${h(c, "ql")} / (${h(dd, "ql")} * ql + 1.0)
        WHEN pr > 0.97575 THEN
          -(${h(c, "qu")} / (${h(dd, "qu")} * qu + 1.0))
        ELSE ${h(a, "rc")} * qc / (${h(b, "rc")} * rc + 1.0) END"""
  }

  /** Cuzick trend test across the funnel-ordered event types
    * (view→click→signup→purchase as doses 1..4): is event value
    * monotone in funnel depth? Exact permutation moments over the
    * shared rank-cell substrate. */
  private val q423 = Entry(
    "q423_cuzick_trend",
    (s, d) =>
      AnalysisPlanner.cuzickTrendFromCells(eventTypeValueCells(s, d),
          Seq("view" -> 1.0, "click" -> 2.0, "signup" -> 3.0,
            "purchase" -> 4.0))
        .select(col("n"), col("n_groups"),
          r6(col("t_stat")).as("t_stat"), r6(col("z_stat")).as("z_stat")),
    Some("""
      WITH d AS (SELECT "value"::DOUBLE AS v,
              CASE event_type WHEN 'view' THEN 1.0 WHEN 'click' THEN 2.0
                WHEN 'signup' THEN 3.0 WHEN 'purchase' THEN 4.0 END AS z
            FROM events WHERE "value" IS NOT NULL
              AND event_type IN ('view', 'click', 'signup', 'purchase')),
      vc AS (SELECT v, count(*)::DOUBLE AS t, sum(z) AS sz,
               sum(z * z) AS szz
             FROM d GROUP BY 1),
      pre AS (SELECT t, sz, szz,
                coalesce(sum(t) OVER (ORDER BY v ROWS BETWEEN
                  UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  + (t + 1) / 2.0 AS r
              FROM vc),
      a AS (SELECT sum(t) AS n, sum(sz) AS tz, sum(szz) AS tzz,
              sum(sz * r) AS tstat, sum(t * r * r) AS sr2
            FROM pre)
      SELECT n::BIGINT AS n, 4 AS n_groups, round(tstat, 6) AS t_stat,
             round((tstat - tz * (n + 1) / 2.0) /
               sqrt((tzz - tz * tz / n) *
                 (sr2 - n * ((n + 1) / 2.0) * ((n + 1) / 2.0)) /
                 (n - 1)), 6) AS z_stat
      FROM a"""))

  /** Klotz normal-scores scale test, purchase vs click values — the
    * normal-scores member of the scale trio beside q387/q410; oracle
    * replays Acklam's probit from the shared coefficient list. */
  private val q424 = Entry(
    "q424_klotz",
    (s, d) =>
      AnalysisPlanner
        .klotzFromCells(eventTypeValueCells(s, d),
          control = "purchase", treatment = "click")
        .select(col("n_c"), col("n_t"), r6(col("t_stat")).as("t_stat"),
          r6(col("z_stat")).as("z_stat")),
    Some(s"""
      WITH d AS (SELECT "value"::DOUBLE AS v, event_type AS g
                 FROM events WHERE "value" IS NOT NULL
                   AND event_type IN ('purchase', 'click')),
      vc AS (SELECT v,
               sum(CASE WHEN g = 'click' THEN 1.0 ELSE 0 END) AS ct,
               sum(CASE WHEN g = 'purchase' THEN 1.0 ELSE 0 END) AS cc
             FROM d GROUP BY 1),
      tot AS (SELECT sum(ct + cc) AS nn FROM vc),
      pre AS (SELECT ct, cc,
                (coalesce(sum(ct + cc) OVER (ORDER BY v ROWS BETWEEN
                  UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  + (ct + cc + 1) / 2.0) / (nn + 1) AS pr
              FROM vc, tot),
      q0 AS (SELECT ct, cc, pr, pr - 0.5 AS qc,
               (pr - 0.5) * (pr - 0.5) AS rc,
               sqrt(-2.0 * ln(pr)) AS ql,
               sqrt(-2.0 * ln(1.0 - pr)) AS qu
             FROM pre),
      sc AS (SELECT ct, cc,
               ($acklamSqlCase) * ($acklamSqlCase) AS s
             FROM q0),
      a AS (SELECT sum(cc) AS nc, sum(ct) AS nt,
              sum(ct * s) AS t, sum((ct + cc) * s) AS ss,
              sum((ct + cc) * s * s) AS ss2
            FROM sc)
      SELECT nc::BIGINT AS n_c, nt::BIGINT AS n_t,
             round(t, 6) AS t_stat,
             round((t - nt * ss / (nc + nt)) /
               sqrt(nc * nt / ((nc + nt) * (nc + nt - 1)) *
                 (ss2 - ss * ss / (nc + nt))), 6) AS z_stat
      FROM a"""))

  /** Shapiro–Francia normality of extended price (Blom scores on
    * midranks, Royston z) — the large-N normality screen beside
    * q320's Lilliefors and q395's K². */
  private val q425 = Entry(
    "q425_shapiro_francia",
    (s, d) =>
      AnalysisPlanner.shapiroFrancia(Tables.lineitem(s, d),
          "l_extendedprice")
        .select(col("n"), r6(col("w_stat")).as("w_stat"),
          r6(col("z_stat")).as("z_stat")),
    Some(s"""
      WITH vc AS (SELECT l_extendedprice::DOUBLE AS v,
                    count(*)::DOUBLE AS c
                  FROM lineitem WHERE l_extendedprice IS NOT NULL
                  GROUP BY 1),
      tot AS (SELECT sum(c) AS nn FROM vc),
      pre AS (SELECT v, c,
                (coalesce(sum(c) OVER (ORDER BY v ROWS BETWEEN
                  UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  + (c + 1) / 2.0 - 0.375) / (nn + 0.25) AS pr
              FROM vc, tot),
      q0 AS (SELECT v, c, pr, pr - 0.5 AS qc,
               (pr - 0.5) * (pr - 0.5) AS rc,
               sqrt(-2.0 * ln(pr)) AS ql,
               sqrt(-2.0 * ln(1.0 - pr)) AS qu
             FROM pre),
      sc AS (SELECT v, c, ($acklamSqlCase) AS m FROM q0),
      a AS (SELECT sum(c) AS n, sum(c * m) AS sm,
              sum(c * m * m) AS smm, sum(c * v) AS sx,
              sum(c * v * v) AS sxx, sum(c * m * v) AS smx
            FROM sc),
      w AS (SELECT n,
              (smx - sm * sx / n) * (smx - sm * sx / n) /
                ((smm - sm * sm / n) * (sxx - sx * sx / n)) AS wst
            FROM a)
      SELECT n::BIGINT AS n, round(wst, 6) AS w_stat,
             round((ln(1.0 - wst) -
               (-1.2725 + 1.0521 * (ln(ln(n)) - ln(n)))) /
               (1.0308 - 0.26758 * (ln(ln(n)) + 2.0 / ln(n))), 6)
               AS z_stat
      FROM w"""))

  /** Hodges–Lehmann estimate of the per-user purchase-minus-view
    * activity shift (median of Walsh averages over integer-exact
    * per-user count differences — the deterministic-order-statistic
    * discipline). */
  private val q426 = Entry(
    "q426_hodges_lehmann",
    (s, d) => {
      val per = Tables.events(s, d)
        .groupBy("user_id")
        .agg((sum(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)) -
          sum(when(col("event_type") === "view", 1L).otherwise(0L)))
          .cast("double").as("diff"))
      AnalysisPlanner.hodgesLehmann(per, "diff")
        .select(col("n"), col("n_walsh"), col("hl_estimate"))
    },
    Some("""
      WITH per AS (SELECT user_id,
              (sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               - sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              )::DOUBLE AS d
            FROM events GROUP BY 1),
      cl AS (SELECT d, count(*)::DOUBLE AS c FROM per GROUP BY 1),
      pairs AS (SELECT (a.d + b.d) / 2.0 AS wa,
                  CASE WHEN a.d = b.d THEN a.c * (a.c + 1) / 2.0
                       ELSE a.c * b.c END AS w
                FROM cl a JOIN cl b ON a.d <= b.d),
      g AS (SELECT wa, sum(w) AS cnt FROM pairs GROUP BY 1),
      pre AS (SELECT wa, cnt,
                coalesce(sum(cnt) OVER (ORDER BY wa ROWS BETWEEN
                  UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
              FROM g),
      t AS (SELECT sum(cnt) AS tw FROM g),
      n AS (SELECT count(*) AS nu FROM per)
      SELECT nu AS n, tw::BIGINT AS n_walsh, wa AS hl_estimate
      FROM pre, t, n
      WHERE bef < ceil(tw / 2.0) AND bef + cnt >= ceil(tw / 2.0)"""))

  /** Quandt sup-F (QLR) trend-break search on the daily event-count
    * series — where q414's AMOC sees only a level shift, this fits
    * y = a + bt on both sides of every trimmed candidate split;
    * integer-exact moments keep the argmax engine-deterministic. */
  private val q427 = Entry(
    "q427_qlr_break",
    (s, d) =>
      graft.ops.TimeSeries.qlrSupF(Tables.events(s, d), "ts")
        .select(col("n_days"), col("break_day"),
          r6(col("f_stat")).as("f_stat"),
          r6(col("sse_pooled")).as("sse_pooled"),
          r6(col("sse_split")).as("sse_split")),
    Some("""
      WITH daily AS (SELECT datediff('day', DATE '1970-01-01',
                       CAST(ts AS DATE)) AS t, count(*)::DOUBLE AS y
                     FROM events WHERE ts IS NOT NULL GROUP BY 1),
      m AS (SELECT t, row_number() OVER (ORDER BY t)::DOUBLE AS i,
              sum(t::DOUBLE) OVER w AS st, sum(y) OVER w AS sy,
              sum(t::DOUBLE * t) OVER w AS stt,
              sum(t::DOUBLE * y) OVER w AS sty,
              sum(y * y) OVER w AS syy
            FROM daily WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED
              PRECEDING AND CURRENT ROW)),
      tot AS (SELECT count(*)::DOUBLE AS n, sum(t::DOUBLE) AS tst,
                sum(y) AS tsy, sum(t::DOUBLE * t) AS tstt,
                sum(t::DOUBLE * y) AS tsty, sum(y * y) AS tsyy
              FROM daily),
      cand AS (SELECT t, n,
                 (syy - sy * sy / i) -
                   (sty - st * sy / i) * (sty - st * sy / i) /
                   (stt - st * st / i) AS sseL,
                 ((tsyy - syy) - (tsy - sy) * (tsy - sy) / (n - i)) -
                   ((tsty - sty) - (tst - st) * (tsy - sy) / (n - i)) *
                   ((tsty - sty) - (tst - st) * (tsy - sy) / (n - i)) /
                   ((tstt - stt) - (tst - st) * (tst - st) / (n - i))
                   AS sseR,
                 tsyy - tsy * tsy / n -
                   (tsty - tst * tsy / n) * (tsty - tst * tsy / n) /
                   (tstt - tst * tst / n) AS sseP
               FROM m, tot
               WHERE i >= ceil(n * 0.15) AND i <= floor(n * 0.85)
                 AND i >= 3 AND n - i >= 3),
      f AS (SELECT t, n, sseP, sseL + sseR AS sseS,
              ((sseP - sseL - sseR) / 2) /
                ((sseL + sseR) / (n - 4)) AS f
            FROM cand WHERE sseL + sseR > 0 AND n > 4)
      SELECT n::BIGINT AS n_days, DATE '1970-01-01' + t::INT
               AS break_day,
             round(f, 6) AS f_stat, round(sseP, 6) AS sse_pooled,
             round(sseS, 6) AS sse_split
      FROM f ORDER BY f DESC, t LIMIT 1"""))

  /** CUSUM-of-squares stability statistic on the daily count series'
    * trend residuals — the variance-stability companion to q427. */
  private val q428 = Entry(
    "q428_cusum_squares",
    (s, d) =>
      graft.ops.TimeSeries.cusumSquares(Tables.events(s, d), "ts")
        .select(col("n_days"),
          r6(col("cusum_sq_stat")).as("cusum_sq_stat")),
    Some("""
      WITH daily AS (SELECT datediff('day', DATE '1970-01-01',
                       CAST(ts AS DATE)) AS t, count(*)::DOUBLE AS y
                     FROM events WHERE ts IS NOT NULL GROUP BY 1),
      tot AS (SELECT count(*)::DOUBLE AS n, sum(t::DOUBLE) AS tst,
                sum(y) AS tsy, sum(t::DOUBLE * t) AS tstt,
                sum(t::DOUBLE * y) AS tsty
              FROM daily),
      fit AS (SELECT n, tsy, tst,
                (tsty - tst * tsy / n) / (tstt - tst * tst / n) AS b
              FROM tot),
      f2 AS (SELECT n, b, (tsy - b * tst) / n AS a FROM fit),
      e AS (SELECT t, n,
              (y - a - b * t) * (y - a - b * t) AS e2
            FROM daily, f2),
      pre AS (SELECT n,
                sum(e2) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                  PRECEDING AND CURRENT ROW) AS ce,
                row_number() OVER (ORDER BY t)::DOUBLE AS i
              FROM e),
      te AS (SELECT sum(e2) AS tot_e FROM e)
      SELECT max(n)::BIGINT AS n_days,
             round(max(abs(ce / tot_e - i / n)), 6) AS cusum_sq_stat
      FROM pre, te"""))

  /** Goldfeld–Quandt heteroskedasticity F on the daily count series
    * (first 40% vs last 40% of days around the trend). */
  private val q429 = Entry(
    "q429_goldfeld_quandt",
    (s, d) =>
      graft.ops.TimeSeries.goldfeldQuandt(Tables.events(s, d), "ts")
        .select(col("n_days"), col("n_each"),
          r6(col("sse_first")).as("sse_first"),
          r6(col("sse_last")).as("sse_last"),
          r6(col("gq_f")).as("gq_f")),
    Some("""
      WITH daily AS (SELECT datediff('day', DATE '1970-01-01',
                       CAST(ts AS DATE)) AS t, count(*)::DOUBLE AS y
                     FROM events WHERE ts IS NOT NULL GROUP BY 1),
      m AS (SELECT t, row_number() OVER (ORDER BY t)::DOUBLE AS i,
              sum(t::DOUBLE) OVER w AS st, sum(y) OVER w AS sy,
              sum(t::DOUBLE * t) OVER w AS stt,
              sum(t::DOUBLE * y) OVER w AS sty,
              sum(y * y) OVER w AS syy
            FROM daily WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED
              PRECEDING AND CURRENT ROW)),
      tot AS (SELECT count(*)::DOUBLE AS n, sum(t::DOUBLE) AS tst,
                sum(y) AS tsy, sum(t::DOUBLE * t) AS tstt,
                sum(t::DOUBLE * y) AS tsty, sum(y * y) AS tsyy
              FROM daily),
      lo AS (SELECT n, floor(n * 0.4) AS mm,
               (syy - sy * sy / i) -
                 (sty - st * sy / i) * (sty - st * sy / i) /
                 (stt - st * st / i) AS sse_first
             FROM m, tot WHERE i = floor(n * 0.4)),
      hi AS (SELECT ((tsyy - syy) - (tsy - sy) * (tsy - sy) /
                 (n - i)) -
               ((tsty - sty) - (tst - st) * (tsy - sy) / (n - i)) *
               ((tsty - sty) - (tst - st) * (tsy - sy) / (n - i)) /
               ((tstt - stt) - (tst - st) * (tst - st) / (n - i))
               AS sse_last
             FROM m, tot WHERE i = n - floor(n * 0.4))
      SELECT n::BIGINT AS n_days, mm::BIGINT AS n_each,
             round(sse_first, 6) AS sse_first,
             round(sse_last, 6) AS sse_last,
             round((sse_last / (mm - 2)) / (sse_first / (mm - 2)), 6)
               AS gq_f
      FROM lo, hi"""))

  /** Engle ARCH LM(1) on the daily-mean value series' trend
    * residuals — does today's volatility predict tomorrow's? */
  private val q430 = Entry(
    "q430_arch_lm",
    (s, d) =>
      graft.ops.TimeSeries.archLm(Tables.events(s, d), "ts", "value")
        .select(col("n_pairs"), r6(col("r2")).as("r2"),
          r6(col("lm_stat")).as("lm_stat")),
    Some("""
      WITH daily AS (SELECT datediff('day', DATE '1970-01-01',
                       CAST(ts AS DATE)) AS t, avg("value"::DOUBLE) AS x
                     FROM events
                     WHERE ts IS NOT NULL AND "value" IS NOT NULL
                     GROUP BY 1),
      tot AS (SELECT count(*)::DOUBLE AS n, sum(t::DOUBLE) AS tst,
                sum(x) AS tsy, sum(t::DOUBLE * t) AS tstt,
                sum(t::DOUBLE * x) AS tsty
              FROM daily),
      fit AS (SELECT n, tst, tsy,
                (tsty - tst * tsy / n) / (tstt - tst * tst / n) AS b
              FROM tot),
      f2 AS (SELECT b, (tsy - b * tst) / n AS a FROM fit),
      e AS (SELECT t, (x - a - b * t) * (x - a - b * t) AS e2
            FROM daily, f2),
      p AS (SELECT c.e2 AS ey, l.e2 AS ex
            FROM e c JOIN e l ON c.t = l.t + 1),
      a2 AS (SELECT count(*)::DOUBLE AS np, sum(ex) AS sx,
               sum(ey) AS sy, sum(ex * ex) AS sxx,
               sum(ex * ey) AS sxy, sum(ey * ey) AS syy
             FROM p),
      r AS (SELECT np,
              (sxy - sx * sy / np) * (sxy - sx * sy / np) /
                ((sxx - sx * sx / np) * (syy - sy * sy / np)) AS r2
            FROM a2)
      SELECT np::BIGINT AS n_pairs, round(r2, 6) AS r2,
             round(np * r2, 6) AS lm_stat
      FROM r"""))

  /** Lo–MacKinlay variance ratio (q = 5) on the daily event-count
    * series — random walk vs mean-reversion vs momentum. */
  private val q431 = Entry(
    "q431_variance_ratio",
    (s, d) =>
      graft.ops.TimeSeries.varianceRatio(Tables.events(s, d), "ts", 5)
        .select(col("n_days"), col("q"), r6(col("vr")).as("vr"),
          r6(col("z_stat")).as("z_stat")),
    Some("""
      WITH daily AS (SELECT datediff('day', DATE '1970-01-01',
                       CAST(ts AS DATE)) AS t, count(*)::DOUBLE AS y
                     FROM events WHERE ts IS NOT NULL GROUP BY 1),
      d1 AS (SELECT count(*)::DOUBLE AS n1, sum(c.y - l.y) AS s1,
               sum((c.y - l.y) * (c.y - l.y)) AS ss1
             FROM daily c JOIN daily l ON c.t = l.t + 1),
      dq AS (SELECT count(*)::DOUBLE AS nq, sum(c.y - l.y) AS sq,
               sum((c.y - l.y) * (c.y - l.y)) AS ssq
             FROM daily c JOIN daily l ON c.t = l.t + 5),
      nd AS (SELECT count(*)::DOUBLE AS nn FROM daily),
      v AS (SELECT nn, (ss1 - s1 * s1 / n1) / (n1 - 1) AS v1,
              (ssq - sq * sq / nq) / (nq - 1) AS vq
            FROM d1, dq, nd)
      SELECT nn::BIGINT AS n_days, 5 AS q,
             round(vq / (5 * v1), 6) AS vr,
             round((vq / (5 * v1) - 1) /
               sqrt(2.0 * 9 * 4 / (3.0 * 5 * nn)), 6) AS z_stat
      FROM v"""))

  /** Buishand range + SNHT level-homogeneity panel on the daily
    * event-count series — integer-exact prefix sums make the SNHT
    * break argmax engine-deterministic. */
  private val q432 = Entry(
    "q432_homogeneity",
    (s, d) =>
      graft.ops.TimeSeries.homogeneityPanel(Tables.events(s, d), "ts")
        .select(col("n_days"), r6(col("buishand_r")).as("buishand_r"),
          r6(col("snht_t")).as("snht_t"), col("snht_break_day")),
    Some("""
      WITH daily AS (SELECT datediff('day', DATE '1970-01-01',
                       CAST(ts AS DATE)) AS t, count(*)::DOUBLE AS y
                     FROM events WHERE ts IS NOT NULL GROUP BY 1),
      tot AS (SELECT count(*)::DOUBLE AS n, sum(y) AS tsy,
                sum(y * y) AS tsyy
              FROM daily),
      m AS (SELECT t, row_number() OVER (ORDER BY t)::DOUBLE AS i,
              sum(y) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                PRECEDING AND CURRENT ROW) AS sy
            FROM daily),
      base AS (SELECT t, i, sy, n, tsy,
                 sy - i * tsy / n AS sk,
                 (tsyy - tsy * tsy / n) / n AS s2
               FROM m, tot),
      rng AS (SELECT max(n) AS nn, max(s2) AS v, max(sk) AS mx,
                min(sk) AS mn
              FROM base),
      snht AS (SELECT i * ((sy / i - tsy / n) / sqrt(s2)) *
                   ((sy / i - tsy / n) / sqrt(s2)) +
                 (n - i) * (((tsy - sy) / (n - i) - tsy / n) /
                   sqrt(s2)) *
                   (((tsy - sy) / (n - i) - tsy / n) / sqrt(s2))
                   AS tk,
                 t
               FROM base WHERE i < n AND s2 > 0
               ORDER BY tk DESC, t LIMIT 1)
      SELECT nn::BIGINT AS n_days,
             round((mx - mn) / (sqrt(v) * sqrt(nn)), 6) AS buishand_r,
             round(tk, 6) AS snht_t,
             DATE '1970-01-01' + t::INT AS snht_break_day
      FROM rng, snht"""))

  /** Bartels rank von Neumann randomness test on the daily count
    * series — the nonparametric serial-dependence screen. */
  private val q433 = Entry(
    "q433_bartels_rank",
    (s, d) =>
      graft.ops.TimeSeries.bartelsRank(Tables.events(s, d), "ts")
        .select(col("n_days"), r6(col("rvn")).as("rvn"),
          r6(col("z_stat")).as("z_stat")),
    Some("""
      WITH daily AS (SELECT datediff('day', DATE '1970-01-01',
                       CAST(ts AS DATE)) AS t, count(*)::DOUBLE AS y
                     FROM events WHERE ts IS NOT NULL GROUP BY 1),
      idx AS (SELECT t, y, row_number() OVER (ORDER BY t) AS i
              FROM daily),
      vc AS (SELECT y AS yv, count(*)::DOUBLE AS c FROM daily
             GROUP BY 1),
      rk AS (SELECT yv,
               coalesce(sum(c) OVER (ORDER BY yv ROWS BETWEEN
                 UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 + (c + 1) / 2.0 AS r
             FROM vc),
      rr AS (SELECT i, r FROM idx JOIN rk ON idx.y = rk.yv),
      num AS (SELECT sum((a.r - b.r) * (a.r - b.r)) AS nm
              FROM rr a JOIN rr b ON b.i = a.i + 1),
      den AS (SELECT count(*)::DOUBLE AS n, sum(r) AS sr,
                sum(r * r) AS srr
              FROM rr)
      SELECT n::BIGINT AS n_days,
             round(nm / (srr - sr * sr / n), 6) AS rvn,
             round((nm / (srr - sr * sr / n) - 2) /
               sqrt(4.0 * (n - 2) * (5 * n * n - 2 * n - 9) /
                 (5.0 * n * (n + 1) * (n - 1) * (n - 1))), 6)
               AS z_stat
      FROM num, den"""))

  /** Turning-point + difference-sign randomness panel on the daily
    * count series (strict inequalities on integer counts). */
  private val q434 = Entry(
    "q434_randomness",
    (s, d) =>
      graft.ops.TimeSeries.randomnessPanel(Tables.events(s, d), "ts")
        .select(col("n_days"), col("turning_points"),
          r6(col("tp_z")).as("tp_z"), col("n_increases"),
          r6(col("ds_z")).as("ds_z")),
    Some("""
      WITH daily AS (SELECT datediff('day', DATE '1970-01-01',
                       CAST(ts AS DATE)) AS t, count(*)::DOUBLE AS y
                     FROM events WHERE ts IS NOT NULL GROUP BY 1),
      idx AS (SELECT y, row_number() OVER (ORDER BY t) AS i
              FROM daily),
      tp AS (SELECT sum(CASE WHEN (c.y > p.y AND c.y > nx.y)
                            OR (c.y < p.y AND c.y < nx.y)
                       THEN 1.0 ELSE 0 END) AS tpc
             FROM idx c JOIN idx p ON c.i = p.i + 1
                        JOIN idx nx ON nx.i = c.i + 1),
      ds AS (SELECT sum(CASE WHEN c.y > p.y THEN 1.0 ELSE 0 END) AS up
             FROM idx c JOIN idx p ON c.i = p.i + 1),
      nd AS (SELECT count(*)::DOUBLE AS n FROM daily)
      SELECT n::BIGINT AS n_days, tpc::BIGINT AS turning_points,
             round((tpc - 2.0 * (n - 2) / 3) /
               sqrt((16.0 * n - 29) / 90), 6) AS tp_z,
             up::BIGINT AS n_increases,
             round((up - (n - 1) / 2) / sqrt((n + 1) / 12), 6) AS ds_z
      FROM tp, ds, nd"""))

  /** Hirsch–Slack seasonal Mann–Kendall trend test of daily mean
    * event value, month-of-year seasons — no cross-season pairs, so
    * an annual cycle can't fake a trend. */
  private val q435 = Entry(
    "q435_seasonal_mk",
    (s, d) =>
      graft.ops.TimeSeries.seasonalMannKendall(Tables.events(s, d),
          "ts", "value")
        .select(col("n_seasons"), col("n_days"), col("s_stat"),
          r6(col("var_s")).as("var_s"), r6(col("z")).as("z")),
    Some("""
      WITH daily AS (SELECT month(CAST(ts AS DATE)) AS season,
                       CAST(ts AS DATE) AS dd,
                       avg("value"::DOUBLE) AS x
                     FROM events
                     WHERE "value" IS NOT NULL AND ts IS NOT NULL
                     GROUP BY 1, 2),
      s AS (SELECT l.season,
              sum(CASE WHEN r.x > l.x THEN 1.0
                       WHEN r.x < l.x THEN -1.0 ELSE 0 END) AS s_stat
            FROM daily l JOIN daily r
              ON l.season = r.season AND l.dd < r.dd
            GROUP BY 1),
      ties AS (SELECT season, sum(tc) AS n,
                 sum(tc * (tc - 1) * (2.0 * tc + 5)) AS tt
               FROM (SELECT season, x, count(*)::DOUBLE AS tc
                     FROM daily GROUP BY 1, 2)
               GROUP BY 1),
      per AS (SELECT s.season, s.s_stat, ties.n,
                (ties.n * (ties.n - 1) * (2.0 * ties.n + 5) - ties.tt)
                  / 18 AS var_s
              FROM s JOIN ties ON s.season = ties.season),
      agg AS (SELECT count(*) AS n_seasons, sum(n) AS n_days,
                sum(s_stat) AS s_stat, sum(var_s) AS var_s
              FROM per)
      SELECT n_seasons, n_days::BIGINT AS n_days, s_stat,
             round(var_s, 6) AS var_s,
             round(CASE WHEN var_s > 0 AND s_stat <> 0
               THEN (s_stat - sign(s_stat)) / sqrt(var_s)
               ELSE 0 END, 6) AS z
      FROM agg"""))

  /** Breslow–Day + Tarone OR-homogeneity across event types (same
    * 2x2 design as q406's Woolf — the exact-expected-count
    * counterpart, no +0.5 continuity fudge). */
  private val q436 = Entry(
    "q436_breslow_day",
    (s, d) =>
      graft.ops.Evaluation.breslowDay(
          Tables.events(s, d).where(col("event_type").isNotNull),
          col("user_id") % 2 === 0, col("value") > 250,
          Seq("event_type"))
        .select(col("n_strata"), r6(col("or_mh")).as("or_mh"),
          r6(col("bd_chi2")).as("bd_chi2"),
          r6(col("tarone_chi2")).as("tarone_chi2"), col("dof")),
    Some("""
      WITH per AS (SELECT event_type,
              sum(CASE WHEN user_id % 2 = 0 AND "value" > 250
                  THEN 1.0 ELSE 0 END) AS a,
              sum(CASE WHEN user_id % 2 = 0 AND NOT ("value" > 250)
                  THEN 1.0 ELSE 0 END) AS b,
              sum(CASE WHEN user_id % 2 <> 0 AND "value" > 250
                  THEN 1.0 ELSE 0 END) AS c,
              sum(CASE WHEN user_id % 2 <> 0 AND NOT ("value" > 250)
                  THEN 1.0 ELSE 0 END) AS dd
            FROM events WHERE event_type IS NOT NULL GROUP BY 1),
      mg AS (SELECT event_type, a, b, c, dd, a + b + c + dd AS n,
               a + b AS r1, c + dd AS r0, a + c AS m1
             FROM per),
      psi AS (SELECT sum(a * dd / n) / sum(b * c / n) AS p FROM mg),
      q AS (SELECT event_type, a, r1, r0, m1, n, p,
              p - 1 AS qa,
              -(p * (r1 + m1) + (r0 - m1)) AS qb,
              p * r1 * m1 AS qc
            FROM mg, psi),
      rt AS (SELECT *,
               sqrt(greatest(qb * qb - 4 * qa * qc, 0)) AS disc,
               greatest(0, m1 - r0) AS lo, least(r1, m1) AS hi
             FROM q),
      sv AS (SELECT event_type, a, p,
               CASE WHEN abs(qa) < 1e-12 THEN r1 * m1 / n
                    WHEN (-qb - disc) / (2 * qa) >= lo
                     AND (-qb - disc) / (2 * qa) <= hi
                    THEN (-qb - disc) / (2 * qa)
                    ELSE (-qb + disc) / (2 * qa) END AS atil,
               r1, m1, r0
             FROM rt),
      vv AS (SELECT event_type, a, p, atil,
               CASE WHEN atil > 0 AND r1 - atil > 0 AND m1 - atil > 0
                     AND r0 - m1 + atil > 0
                 THEN 1.0 / (1.0 / atil + 1.0 / (r1 - atil)
                   + 1.0 / (m1 - atil) + 1.0 / (r0 - m1 + atil))
                 END AS v
             FROM sv),
      agg AS (SELECT count(*) AS n_strata, max(p) AS or_mh,
                sum((a - atil) * (a - atil) / v) AS bd,
                sum(a - atil) AS dev, sum(v) AS svv
              FROM vv WHERE v IS NOT NULL)
      SELECT n_strata, round(or_mh, 6) AS or_mh,
             round(bd, 6) AS bd_chi2,
             round(bd - dev * dev / svv, 6) AS tarone_chi2,
             n_strata - 1 AS dof
      FROM agg"""))

  /** Durbin–Wu–Hausman endogeneity test on the q357 IV design — is
    * the instrument even needed, or is OLS consistent? */
  private val q437 = Entry(
    "q437_hausman",
    (s, d) =>
      graft.ops.Regression.hausmanIvOls(Tables.lineitem(s, d),
          "l_extendedprice", "l_quantity", "l_linenumber")
        .select(col("n"), r6(col("beta_ols")).as("beta_ols"),
          r6(col("beta_iv")).as("beta_iv"),
          r6(col("hausman_stat")).as("hausman_stat")),
    Some("""
      WITH m AS (SELECT count(*)::DOUBLE AS n,
                   sum(l_quantity)::DOUBLE AS sx,
                   sum(l_extendedprice)::DOUBLE AS sy,
                   sum(l_linenumber)::DOUBLE AS sz,
                   sum(l_quantity * l_quantity)::DOUBLE AS sxx,
                   sum(l_linenumber * l_linenumber)::DOUBLE AS szz,
                   sum(l_quantity * l_linenumber)::DOUBLE AS sxz,
                   sum(l_linenumber * l_extendedprice)::DOUBLE AS szy,
                   sum(l_quantity * l_extendedprice)::DOUBLE AS sxy,
                   sum(l_extendedprice * l_extendedprice)::DOUBLE AS syy
                 FROM lineitem),
      c AS (SELECT n, sxx - sx * sx / n AS cxx,
              szz - sz * sz / n AS czz, sxz - sx * sz / n AS cxz,
              szy - sz * sy / n AS czy, sxy - sx * sy / n AS cxy,
              syy - sy * sy / n AS cyy
            FROM m),
      b AS (SELECT n, cxx, czz, cxz, cxy, cyy,
              cxy / cxx AS bols, czy / cxz AS biv
            FROM c),
      v AS (SELECT n, bols, biv,
              ((cyy - bols * cxy) / (n - 2)) / cxx AS vols,
              ((cyy - 2 * biv * cxy + biv * biv * cxx) / (n - 2)) *
                czz / (cxz * cxz) AS viv
            FROM b)
      SELECT n::BIGINT AS n, round(bols, 6) AS beta_ols,
             round(biv, 6) AS beta_iv,
             round(CASE WHEN viv > vols
               THEN (biv - bols) * (biv - bols) / (viv - vols) END, 6)
               AS hausman_stat
      FROM v"""))

  /** Lexical-richness panel over the document corpus: Yule's K,
    * Simpson's D, Herdan's C, Guiraud's R, Sichel's S, Honoré's H —
    * all pure functions of the count-of-counts frame. */
  private val q438 = Entry(
    "q438_lexical_richness",
    (s, d) =>
      graft.ops.TextAnalysis.lexicalRichness(Tables.documents(s, d),
          "text")
        .select(col("n_tokens"), col("vocabulary"),
          r6(col("yule_k")).as("yule_k"),
          r6(col("simpson_d") * 1e6).as("simpson_d_ppm"),
          r6(col("herdan_c")).as("herdan_c"),
          r6(col("guiraud_r")).as("guiraud_r"),
          r6(col("sichel_s")).as("sichel_s"),
          r6(col("honore_h")).as("honore_h")),
    Some("""
      WITH w AS (SELECT unnest(string_split(text, ' ')) AS w
                 FROM documents WHERE text IS NOT NULL),
      tf AS (SELECT w, count(*)::DOUBLE AS c FROM w WHERE w <> ''
             GROUP BY 1),
      coc AS (SELECT c AS m, count(*)::DOUBLE AS vm FROM tf
              GROUP BY 1),
      a AS (SELECT sum(m * vm) AS n, sum(vm) AS v,
              sum(m * m * vm) AS sm2, sum(m * (m - 1) * vm) AS sm11,
              sum(CASE WHEN m = 1 THEN vm ELSE 0 END) AS v1,
              sum(CASE WHEN m = 2 THEN vm ELSE 0 END) AS v2
            FROM coc)
      SELECT n::BIGINT AS n_tokens, v::BIGINT AS vocabulary,
             round(1e4 * (sm2 - n) / (n * n), 6) AS yule_k,
             round(1e6 * sm11 / (n * (n - 1)), 6) AS simpson_d_ppm,
             round(ln(v) / ln(n), 6) AS herdan_c,
             round(v / sqrt(n), 6) AS guiraud_r,
             round(v2 / v, 6) AS sichel_s,
             round(CASE WHEN v1 < v
               THEN 100.0 * ln(n) / (1.0 - v1 / v) END, 6) AS honore_h
      FROM a"""))

  /** Collocation-strength panel: top-20 bigrams by logDice with the
    * Church–Hanks t-score beside it — the lexicographic companion to
    * q85's PMI ranking. */
  private val q439 = Entry(
    "q439_collocations",
    (s, d) =>
      graft.ops.TextAnalysis.collocationPanel(Tables.documents(s, d),
        "text", minCount = 5, k = 20),
    Some("""
      WITH toks AS (SELECT doc_id,
                      unnest(string_split(text, ' ')) AS term,
                      generate_subscripts(string_split(text, ' '), 1)
                        AS ord
                    FROM documents WHERE text IS NOT NULL),
      bi0 AS (SELECT term AS x,
                lead(term) OVER (PARTITION BY doc_id ORDER BY ord)
                  AS y
              FROM toks),
      bc AS (SELECT x, y, count(*) AS c_xy FROM bi0
             WHERE y IS NOT NULL GROUP BY 1, 2),
      uc AS (SELECT term AS t, count(*) AS c_t FROM toks GROUP BY 1),
      tot AS (SELECT sum(c_t)::DOUBLE AS t_uni FROM uc)
      SELECT bc.x, bc.y, bc.c_xy,
             round((bc.c_xy - ux.c_t::DOUBLE * uy.c_t / t_uni) /
               sqrt(bc.c_xy), 6) AS t_score,
             round(14.0 + log2(2.0 * bc.c_xy /
               (ux.c_t + uy.c_t)), 6) AS log_dice
      FROM bc
      JOIN uc ux ON ux.t = bc.x
      JOIN uc uy ON uy.t = bc.y
      CROSS JOIN tot
      WHERE bc.c_xy >= 5
      ORDER BY log_dice DESC, bc.x ASC, bc.y ASC
      LIMIT 20"""))

  /** Hill-number diversity profile (q = 0, 1, 2) of token usage per
    * language — effective-vocabulary sizes exposing head-domination
    * that raw token counts hide. */
  private val q440 = Entry(
    "q440_hill_diversity",
    (s, d) =>
      graft.ops.TextAnalysis.hillDiversity(Tables.documents(s, d),
          "text", "lang")
        .select(col("lang"), col("n_tokens"), col("hill_q0"),
          r6(col("hill_q1")).as("hill_q1"),
          r6(col("hill_q2")).as("hill_q2"))
        .orderBy("lang"),
    Some("""
      WITH w AS (SELECT lang, unnest(string_split(text, ' ')) AS w
                 FROM documents
                 WHERE text IS NOT NULL AND lang IS NOT NULL),
      tf AS (SELECT lang, w, count(*)::DOUBLE AS c FROM w
             WHERE w <> '' GROUP BY 1, 2),
      tot AS (SELECT lang, sum(c) AS n FROM tf GROUP BY 1),
      a AS (SELECT tf.lang, max(tot.n) AS n,
              count(*)::DOUBLE AS v,
              sum(-(tf.c / tot.n) * ln(tf.c / tot.n)) AS h,
              sum((tf.c / tot.n) * (tf.c / tot.n)) AS l
            FROM tf JOIN tot ON tf.lang = tot.lang
            GROUP BY 1)
      SELECT lang, n::BIGINT AS n_tokens, v::BIGINT AS hill_q0,
             round(exp(h), 6) AS hill_q1,
             round(1.0 / l, 6) AS hill_q2
      FROM a
      ORDER BY lang"""))

  /** Weighted log-rank panel on the q150 design: log-rank, Gehan,
    * Tarone–Ware and Peto–Peto z's in one pass — disagreement between
    * early- and late-weighted members flags crossing hazards. */
  private val q441 = Entry(
    "q441_weighted_logrank",
    (s, d) => {
      val ev = Tables.events(s, d)
      val hit = when(col("event_type") === "purchase" &&
        col("value") > 200, col("ts"))
      val surv = ev.groupBy("user_id")
        .agg(min(hit).as("__hit"), min(col("ts")).as("__first"),
          max(col("ts")).as("__last"))
        .select(
          when(col("user_id") % 2 === 0, lit("even")).otherwise(lit("odd"))
            .as("arm"),
          when(col("__hit").isNotNull,
            datediff(to_date(col("__hit")), to_date(col("__first"))))
            .otherwise(
              datediff(to_date(col("__last")), to_date(col("__first"))))
            .as("dur"),
          when(col("__hit").isNotNull, lit(1)).otherwise(lit(0)).as("ev"))
      AnalysisPlanner
        .weightedLogRankPanel(surv, "dur", "ev", "arm", "even", "odd")
        .select(col("n_a"), col("n_b"),
          r6(col("z_logrank")).as("z_logrank"),
          r6(col("z_gehan")).as("z_gehan"),
          r6(col("z_tarone_ware")).as("z_tarone_ware"),
          r6(col("z_peto")).as("z_peto"))
    },
    Some("""
      WITH s AS (
        SELECT CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END AS arm,
          CASE WHEN min(ts) FILTER (event_type = 'purchase' AND "value" > 200) IS NOT NULL
               THEN datediff('day', min(ts)::DATE,
                 (min(ts) FILTER (event_type = 'purchase' AND "value" > 200))::DATE)
               ELSE datediff('day', min(ts)::DATE, max(ts)::DATE) END AS dur,
          CASE WHEN min(ts) FILTER (event_type = 'purchase' AND "value" > 200) IS NOT NULL
               THEN 1.0 ELSE 0.0 END AS ev
        FROM events GROUP BY user_id),
      v AS (SELECT dur,
              sum(CASE WHEN arm = 'even' THEN ev ELSE 0 END) AS da,
              sum(CASE WHEN arm = 'odd' THEN ev ELSE 0 END) AS db,
              sum(CASE WHEN arm = 'even' THEN 1.0 ELSE 0 END) AS ta,
              sum(CASE WHEN arm = 'odd' THEN 1.0 ELSE 0 END) AS tb
            FROM s GROUP BY 1),
      t AS (SELECT sum(ta) AS na0, sum(tb) AS nb0 FROM v),
      w AS (SELECT dur, da, db,
              coalesce(sum(ta) OVER (ORDER BY dur ROWS BETWEEN
                UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS befa,
              coalesce(sum(tb) OVER (ORDER BY dur ROWS BETWEEN
                UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS befb
            FROM v),
      k AS (SELECT dur, da, na0, nb0, na0 - befa AS n1,
              na0 - befa + nb0 - befb AS n, da + db AS d
            FROM w, t
            WHERE da + db > 0 AND (na0 - befa + nb0 - befb) > 1),
      pw AS (SELECT dur, da, na0, nb0, n1, n, d,
               exp(sum(ln(1 - d / (n + 1))) OVER (ORDER BY dur)) AS sp,
               da - d * n1 / n AS o,
               d * (n1 / n) * (1 - n1 / n) * (n - d) / (n - 1) AS vv
             FROM k)
      SELECT max(na0)::BIGINT AS n_a, max(nb0)::BIGINT AS n_b,
             round(sum(o) / sqrt(sum(vv)), 6) AS z_logrank,
             round(sum(n * o) / sqrt(sum(n * n * vv)), 6) AS z_gehan,
             round(sum(sqrt(n) * o) / sqrt(sum(n * vv)), 6)
               AS z_tarone_ware,
             round(sum(sp * o) / sqrt(sum(sp * sp * vv)), 6) AS z_peto
      FROM pw"""))

  /** Median survival with a log-log Greenwood (Brookmeyer–Crowley
    * style) CI on the q138 design — the one-number summary the full
    * KM curve buries. */
  private val q442 = Entry(
    "q442_median_survival",
    (s, d) => {
      val ev = Tables.events(s, d)
      val hit = when(col("event_type") === "purchase" &&
        col("value") > 200, col("ts"))
      val surv = ev.groupBy("user_id")
        .agg(min(hit).as("__hit"), min(col("ts")).as("__first"),
          max(col("ts")).as("__last"))
        .select(
          when(col("__hit").isNotNull,
            datediff(to_date(col("__hit")), to_date(col("__first"))))
            .otherwise(
              datediff(to_date(col("__last")), to_date(col("__first"))))
            .as("dur"),
          when(col("__hit").isNotNull, lit(1)).otherwise(lit(0)).as("ev"))
      AnalysisPlanner.medianSurvival(surv, "dur", "ev")
        .select(col("n"), col("n_events"),
          col("median_time").cast("long").as("median_time"),
          col("ci_lower_time").cast("long").as("ci_lower_time"),
          col("ci_upper_time").cast("long").as("ci_upper_time"))
    },
    Some("""
      WITH s AS (
        SELECT user_id,
          CASE WHEN min(ts) FILTER (event_type = 'purchase' AND "value" > 200) IS NOT NULL
               THEN datediff('day', min(ts)::DATE,
                 (min(ts) FILTER (event_type = 'purchase' AND "value" > 200))::DATE)
               ELSE datediff('day', min(ts)::DATE, max(ts)::DATE) END AS dur,
          CASE WHEN min(ts) FILTER (event_type = 'purchase' AND "value" > 200) IS NOT NULL
               THEN 1.0 ELSE 0.0 END AS ev
        FROM events GROUP BY 1),
      g AS (SELECT dur::DOUBLE AS t, sum(ev) AS dd,
              count(*)::DOUBLE AS tot
            FROM s GROUP BY 1),
      tt AS (SELECT sum(tot) AS nn, sum(dd) AS ne FROM g),
      a AS (SELECT t, dd, nn, ne,
              nn - coalesce(sum(tot) OVER (ORDER BY t ROWS BETWEEN
                UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
            FROM g, tt),
      e AS (SELECT t, dd, n_risk, nn, ne,
              CASE WHEN dd < n_risk THEN ln(1 - dd / n_risk)
                   ELSE 0 END AS lnf,
              CASE WHEN dd < n_risk
                THEN dd / (n_risk * (n_risk - dd)) ELSE 0 END AS gw
            FROM a WHERE dd > 0),
      c AS (SELECT t, dd, n_risk, nn, ne,
              sum(lnf) OVER (ORDER BY t) AS lns,
              sum(gw) OVER (ORDER BY t) AS gwc
            FROM e),
      c2 AS (SELECT t, nn, ne,
               CASE WHEN dd < n_risk THEN exp(lns) ELSE 0 END AS sv,
               CASE WHEN exp(lns) > 0 AND exp(lns) < 1
                 THEN sqrt(gwc) / abs(lns) END AS sll
             FROM c),
      c3 AS (SELECT t, nn, ne, sv,
               CASE WHEN sll IS NOT NULL
                 THEN pow(sv, exp(1.959963984540054 * sll)) END AS lo,
               CASE WHEN sll IS NOT NULL
                 THEN pow(sv, exp(-1.959963984540054 * sll)) END AS hi
             FROM c2)
      SELECT max(nn)::BIGINT AS n, max(ne)::BIGINT AS n_events,
             min(CASE WHEN sv <= 0.5 THEN t END)::BIGINT
               AS median_time,
             min(CASE WHEN lo <= 0.5 THEN t END)::BIGINT
               AS ci_lower_time,
             min(CASE WHEN hi <= 0.5 THEN t END)::BIGINT
               AS ci_upper_time
      FROM c3"""))

  /** Winsorized Pearson correlation of quantity vs extended price
    * (10% cuts) beside the raw Pearson — the tail-leverage screen. */
  private val q443 = Entry(
    "q443_winsorized_corr",
    (s, d) =>
      AnalysisPlanner.winsorizedCorrelation(Tables.lineitem(s, d),
          "l_quantity", "l_extendedprice", 0.1)
        .select(col("n"), col("x_lo"), col("x_hi"), col("y_lo"),
          col("y_hi"), r6(col("winsorized_r")).as("winsorized_r"),
          r6(col("pearson_r")).as("pearson_r")),
    Some("""
      WITH base AS (SELECT l_quantity::DOUBLE AS x,
                      l_extendedprice::DOUBLE AS y
                    FROM lineitem
                    WHERE l_quantity IS NOT NULL
                      AND l_extendedprice IS NOT NULL),
      xc AS (SELECT x AS v, count(*)::DOUBLE AS c FROM base GROUP BY 1),
      xt AS (SELECT sum(c) AS nn FROM xc),
      xp AS (SELECT v, c, coalesce(sum(c) OVER (ORDER BY v ROWS
               BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef,
               nn
             FROM xc, xt),
      xcut AS (SELECT
                 min(CASE WHEN bef < ceil(nn * 0.1)
                   AND bef + c >= ceil(nn * 0.1) THEN v END) AS xlo,
                 min(CASE WHEN bef < ceil(nn * 0.9)
                   AND bef + c >= ceil(nn * 0.9) THEN v END) AS xhi
               FROM xp),
      yc AS (SELECT y AS v, count(*)::DOUBLE AS c FROM base GROUP BY 1),
      yt AS (SELECT sum(c) AS nn FROM yc),
      yp AS (SELECT v, c, coalesce(sum(c) OVER (ORDER BY v ROWS
               BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef,
               nn
             FROM yc, yt),
      ycut AS (SELECT
                 min(CASE WHEN bef < ceil(nn * 0.1)
                   AND bef + c >= ceil(nn * 0.1) THEN v END) AS ylo,
                 min(CASE WHEN bef < ceil(nn * 0.9)
                   AND bef + c >= ceil(nn * 0.9) THEN v END) AS yhi
               FROM yp),
      cl AS (SELECT least(greatest(x, xlo), xhi) AS wx,
               least(greatest(y, ylo), yhi) AS wy, x, y,
               xlo, xhi, ylo, yhi
             FROM base, xcut, ycut),
      m AS (SELECT count(*)::DOUBLE AS n, max(xlo) AS xlo,
              max(xhi) AS xhi, max(ylo) AS ylo, max(yhi) AS yhi,
              sum(wx) AS sx, sum(wy) AS sy, sum(wx * wx) AS sxx,
              sum(wy * wy) AS syy, sum(wx * wy) AS sxy,
              sum(x) AS rx, sum(y) AS ry, sum(x * x) AS rxx,
              sum(y * y) AS ryy, sum(x * y) AS rxy
            FROM cl)
      SELECT n::BIGINT AS n, xlo AS x_lo, xhi AS x_hi,
             ylo AS y_lo, yhi AS y_hi,
             round((sxy - sx * sy / n) /
               sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), 6)
               AS winsorized_r,
             round((rxy - rx * ry / n) /
               sqrt((rxx - rx * rx / n) * (ryy - ry * ry / n)), 6)
               AS pearson_r
      FROM m"""))

  /** Siegel repeated-medians slope of the daily event-count trend —
    * the 50%-breakdown robust companion to q168's Theil–Sen. */
  private val q444 = Entry(
    "q444_siegel_slopes",
    (s, d) =>
      graft.ops.TimeSeries.siegelSlopes(Tables.events(s, d), "ts")
        .select(col("n_days"), col("n_pairs"),
          col("siegel_slope")),
    Some("""
      WITH daily AS (SELECT datediff('day', DATE '1970-01-01',
                       CAST(ts AS DATE)) AS t, count(*)::DOUBLE AS y
                     FROM events WHERE ts IS NOT NULL GROUP BY 1),
      pairs AS (SELECT a.t AS ti, (b.y - a.y) / (b.t - a.t) AS sl
                FROM daily a JOIN daily b ON a.t <> b.t),
      ranked AS (SELECT ti, sl,
                   row_number() OVER (PARTITION BY ti ORDER BY sl)
                     AS rn,
                   count(*) OVER (PARTITION BY ti) AS m
                 FROM pairs),
      med AS (SELECT sl AS md FROM ranked
              WHERE rn = ceil(m / 2.0)),
      mr AS (SELECT md, row_number() OVER (ORDER BY md) AS rn,
               count(*) OVER () AS m
             FROM med),
      nd AS (SELECT count(*) AS n_days,
               count(*) * (count(*) - 1) AS n_pairs
             FROM daily)
      SELECT n_days, n_pairs, md AS siegel_slope
      FROM mr, nd WHERE rn = ceil(m / 2.0)"""))

  /** Hoeffding's D between event type (5 ordered categories) and
    * value — general dependence the monotone measures (Pearson/
    * Spearman/Kendall) can read as zero; 2-D dominance counts ride
    * wide per-category prefix columns. */
  private val q445 = Entry(
    "q445_hoeffdings_d",
    (s, d) =>
      AnalysisPlanner.hoeffdingsD(Tables.events(s, d), "event_type",
          "value")
        .select(col("n"), col("n_x_categories"),
          r6(col("d_stat") * 1e3).as("d_stat_milli")),
    Some("""
      WITH cells AS (SELECT event_type AS et, "value"::DOUBLE AS v,
                       count(*)::DOUBLE AS c
                     FROM events
                     WHERE event_type IS NOT NULL AND "value" IS NOT NULL
                     GROUP BY 1, 2),
      nx AS (SELECT
               sum(CASE WHEN et = 'click' THEN c ELSE 0 END) AS n1,
               sum(CASE WHEN et = 'error' THEN c ELSE 0 END) AS n2,
               sum(CASE WHEN et = 'purchase' THEN c ELSE 0 END) AS n3,
               sum(CASE WHEN et = 'signup' THEN c ELSE 0 END) AS n4,
               sum(CASE WHEN et = 'view' THEN c ELSE 0 END) AS n5
             FROM cells),
      py AS (SELECT v, sum(c) AS cy,
               sum(CASE WHEN et = 'click' THEN c ELSE 0 END) AS c1,
               sum(CASE WHEN et = 'error' THEN c ELSE 0 END) AS c2,
               sum(CASE WHEN et = 'purchase' THEN c ELSE 0 END) AS c3,
               sum(CASE WHEN et = 'signup' THEN c ELSE 0 END) AS c4,
               sum(CASE WHEN et = 'view' THEN c ELSE 0 END) AS c5
             FROM cells GROUP BY 1),
      pre AS (SELECT v, cy, c1, c2, c3, c4, c5,
                coalesce(sum(cy) OVER w, 0) AS pyy,
                coalesce(sum(c1) OVER w, 0) AS p1,
                coalesce(sum(c2) OVER w, 0) AS p2,
                coalesce(sum(c3) OVER w, 0) AS p3,
                coalesce(sum(c4) OVER w, 0) AS p4,
                coalesce(sum(c5) OVER w, 0) AS p5
              FROM py WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED
                PRECEDING AND 1 PRECEDING)),
      j AS (SELECT cells.et, cells.c, pre.*,
              CASE cells.et WHEN 'click' THEN 0
                WHEN 'error' THEN p1
                WHEN 'purchase' THEN p1 + p2
                WHEN 'signup' THEN p1 + p2 + p3
                ELSE p1 + p2 + p3 + p4 END AS bb,
              CASE cells.et WHEN 'click' THEN p1 WHEN 'error' THEN p2
                WHEN 'purchase' THEN p3 WHEN 'signup' THEN p4
                ELSE p5 END AS ex,
              CASE cells.et WHEN 'click' THEN 0
                WHEN 'error' THEN c1
                WHEN 'purchase' THEN c1 + c2
                WHEN 'signup' THEN c1 + c2 + c3
                ELSE c1 + c2 + c3 + c4 END AS ey,
              CASE cells.et WHEN 'click' THEN (n1 + 1) / 2.0
                WHEN 'error' THEN n1 + (n2 + 1) / 2.0
                WHEN 'purchase' THEN n1 + n2 + (n3 + 1) / 2.0
                WHEN 'signup' THEN n1 + n2 + n3 + (n4 + 1) / 2.0
                ELSE n1 + n2 + n3 + n4 + (n5 + 1) / 2.0 END AS r,
              pre.pyy + (pre.cy + 1) / 2.0 AS s
            FROM cells JOIN pre ON cells.v = pre.v CROSS JOIN nx),
      q AS (SELECT c, r, s,
              1.0 + bb + ex / 2.0 + ey / 2.0 + (c - 1) / 4.0 AS qq
            FROM j),
      a AS (SELECT sum(c) AS n,
              sum(c * (qq - 1) * (qq - 2)) AS d1,
              sum(c * (r - 1) * (r - 2) * (s - 1) * (s - 2)) AS d2,
              sum(c * (r - 2) * (s - 2) * (qq - 1)) AS d3
            FROM q)
      SELECT n::BIGINT AS n, 5 AS n_x_categories,
             round(1e3 * 30.0 * ((n - 2) * (n - 3) * d1 + d2 -
               2.0 * (n - 2) * d3) /
               (n * (n - 1) * (n - 2) * (n - 3) * (n - 4)), 6)
               AS d_stat_milli
      FROM a"""))

  /** Cochran's C variance-outlier screen across event types — is one
    * segment's noise dominating the pooled variance? */
  private val q446 = Entry(
    "q446_cochran_c",
    (s, d) =>
      AnalysisPlanner.cochranC(Tables.events(s, d), "event_type",
          "value")
        .select(col("n_groups"), col("n_min"), col("n_max"),
          r6(col("c_stat")).as("c_stat"),
          r6(col("c_expected")).as("c_expected")),
    Some("""
      WITH g AS (SELECT event_type, count(*) AS n,
                   var_samp("value"::DOUBLE) AS v
                 FROM events
                 WHERE "value" IS NOT NULL AND event_type IS NOT NULL
                 GROUP BY 1),
      a AS (SELECT count(*) AS n_groups, min(n) AS n_min,
              max(n) AS n_max, max(v) AS vmax, sum(v) AS vsum
            FROM g WHERE v IS NOT NULL)
      SELECT n_groups, n_min, n_max,
             round(vmax / vsum, 6) AS c_stat,
             round(1.0 / n_groups, 6) AS c_expected
      FROM a"""))

  /** Skillings–Mack test over user × event-type ACTIVITY ranks with
    * missing cells kept (Friedman/Quade drop incomplete blocks):
    * integer event counts make the within-block ranks exact. */
  private val q447 = Entry(
    "q447_skillings_mack",
    (s, d) => {
      val per = Tables.events(s, d)
        .where(col("event_type").isin("view", "click", "purchase"))
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).cast("double").as("cnt"))
      AnalysisPlanner.skillingsMack(per, "user_id", "event_type", "cnt")
        .select(col("n_blocks"), col("n_treatments"), col("dof"),
          r6(col("sm_stat")).as("sm_stat"))
    },
    Some("""
      WITH cell AS (SELECT user_id AS blk, event_type AS trt,
                      count(*)::DOUBLE AS x
                    FROM events
                    WHERE event_type IN ('view', 'click', 'purchase')
                    GROUP BY 1, 2),
      sized AS (SELECT blk, trt, x,
                  count(*) OVER (PARTITION BY blk) AS k
                FROM cell),
      kept AS (SELECT * FROM sized WHERE k >= 2),
      ranked AS (SELECT blk, trt, k,
                   rank() OVER (PARTITION BY blk ORDER BY x)
                     + (count(*) OVER (PARTITION BY blk, x) - 1) / 2.0
                     AS r
                 FROM kept),
      a AS (SELECT trt,
              sum(sqrt(12.0 / (k + 1)) * (r - (k + 1) / 2.0)) AS t,
              sum(k - 1) AS diag
            FROM ranked GROUP BY 1),
      co AS (SELECT
               sum(CASE WHEN l.trt = 'click' AND r.trt = 'purchase'
                   THEN 1.0 ELSE 0 END) AS m12,
               sum(CASE WHEN l.trt = 'click' AND r.trt = 'view'
                   THEN 1.0 ELSE 0 END) AS m13,
               sum(CASE WHEN l.trt = 'purchase' AND r.trt = 'view'
                   THEN 1.0 ELSE 0 END) AS m23
             FROM kept l JOIN kept r
               ON l.blk = r.blk AND l.trt < r.trt),
      tv AS (SELECT
               max(CASE WHEN trt = 'click' THEN t END) AS t1,
               max(CASE WHEN trt = 'purchase' THEN t END) AS t2,
               max(CASE WHEN trt = 'click' THEN diag END) AS v11,
               max(CASE WHEN trt = 'purchase' THEN diag END) AS v22
             FROM a),
      nb AS (SELECT count(DISTINCT blk) AS n_blocks FROM kept)
      SELECT n_blocks, 3 AS n_treatments, 2 AS dof,
             round((v22 * t1 * t1 - 2 * (-m12) * t1 * t2 +
               v11 * t2 * t2) / (v11 * v22 - m12 * m12), 6) AS sm_stat
      FROM tv, co, nb"""))

  /** Gries' DP dispersion: the corpus's most shard-clumped frequent
    * terms — boilerplate detectors a frequency cut keeps. */
  private val q448 = Entry(
    "q448_term_dispersion",
    (s, d) =>
      graft.ops.TextAnalysis.termDispersion(Tables.documents(s, d),
        "text", "source", minCount = 100, k = 15),
    Some("""
      WITH ts AS (SELECT source AS s,
                    unnest(string_split(text, ' ')) AS w
                  FROM documents
                  WHERE text IS NOT NULL AND source IS NOT NULL),
      tc AS (SELECT s, w, count(*)::DOUBLE AS c FROM ts
             WHERE w <> '' GROUP BY 1, 2),
      tt AS (SELECT w, sum(c) AS f FROM tc GROUP BY 1),
      st AS (SELECT s, sum(c) AS ns FROM tc GROUP BY 1),
      nn AS (SELECT sum(ns) AS n FROM st),
      sh AS (SELECT s, ns / n AS shr FROM st, nn),
      dp AS (SELECT tc.w AS term, max(tt.f) AS f,
               sum(abs(tc.c / tt.f - sh.shr) - sh.shr) AS dsum
             FROM tc JOIN tt ON tc.w = tt.w JOIN sh ON tc.s = sh.s
             GROUP BY 1)
      SELECT term, f::BIGINT AS count,
             round(0.5 + 0.5 * dsum, 6) AS dp
      FROM dp WHERE f >= 100
      ORDER BY dp DESC, term ASC LIMIT 15"""))

  /** Burrows' Delta between languages over the top-30 corpus terms —
    * do the shards speak the same dialect? */
  private val q449 = Entry(
    "q449_burrows_delta",
    (s, d) =>
      graft.ops.TextAnalysis.burrowsDelta(Tables.documents(s, d),
        "text", "lang", k = 30),
    Some("""
      WITH gt0 AS (SELECT lang AS g,
                     unnest(string_split(text, ' ')) AS w
                   FROM documents
                   WHERE text IS NOT NULL AND lang IS NOT NULL),
      gt AS (SELECT g, w, count(*)::DOUBLE AS c FROM gt0
             WHERE w <> '' GROUP BY 1, 2),
      topk AS (SELECT w FROM (SELECT w, sum(c) AS f FROM gt GROUP BY 1)
               ORDER BY f DESC, w ASC LIMIT 30),
      gtot AS (SELECT g, sum(c) AS n FROM gt GROUP BY 1),
      grid AS (SELECT gtot.g, gtot.n, topk.w FROM gtot CROSS JOIN topk),
      r AS (SELECT grid.g, grid.w,
              coalesce(gt.c, 0) / grid.n AS rr
            FROM grid LEFT JOIN gt
              ON gt.g = grid.g AND gt.w = grid.w),
      mom AS (SELECT w, avg(rr) AS mu, stddev_samp(rr) AS sd
              FROM r GROUP BY 1),
      z AS (SELECT r.w, r.g, (r.rr - mom.mu) / mom.sd AS z
            FROM r JOIN mom ON r.w = mom.w WHERE mom.sd > 0)
      SELECT a.g AS group_a, b.g AS group_b,
             round(avg(abs(a.z - b.z)), 6) AS delta
      FROM z a JOIN z b ON a.w = b.w AND a.g < b.g
      GROUP BY 1, 2
      ORDER BY group_a, group_b"""))

  /** Tukey HSD post-hoc panel: which event-type pairs differ on value
    * after the q44 omnibus ANOVA rejects — Tukey–Kramer q per pair. */
  private val q450 = Entry(
    "q450_tukey_hsd",
    (s, d) =>
      AnalysisPlanner.tukeyHsd(Tables.events(s, d), "event_type", "value")
        .select(col("group_a"), col("group_b"), col("n_a"), col("n_b"),
          r6(col("mean_diff")).as("mean_diff"), r6(col("se")).as("se"),
          r6(col("q_stat")).as("q_stat"), col("df_error"))
        .orderBy("group_a", "group_b"),
    Some("""
      WITH g AS (SELECT event_type AS gr, count(*)::DOUBLE AS n,
                   avg("value") AS m, var_samp("value") AS s2
                 FROM events
                 WHERE "value" IS NOT NULL AND event_type IS NOT NULL
                 GROUP BY 1),
      k AS (SELECT * FROM g WHERE n >= 2),
      w AS (SELECT sum(s2 * (n - 1)) / sum(n - 1) AS msw,
              sum(n - 1) AS dfe FROM k)
      SELECT a.gr AS group_a, b.gr AS group_b,
             a.n::BIGINT AS n_a, b.n::BIGINT AS n_b,
             round(a.m - b.m, 6) AS mean_diff,
             round(sqrt(msw / 2 * (1 / a.n + 1 / b.n)), 6) AS se,
             round(abs(a.m - b.m) /
               sqrt(msw / 2 * (1 / a.n + 1 / b.n)), 6) AS q_stat,
             dfe::BIGINT AS df_error
      FROM k a JOIN k b ON a.gr < b.gr CROSS JOIN w
      ORDER BY group_a, group_b"""))

  /** Games–Howell post-hoc: the Tukey readout without equal variances
    * — Welch SE + per-pair Welch–Satterthwaite df. */
  private val q451 = Entry(
    "q451_games_howell",
    (s, d) =>
      AnalysisPlanner.gamesHowell(Tables.events(s, d), "event_type",
          "value")
        .select(col("group_a"), col("group_b"), col("n_a"), col("n_b"),
          r6(col("mean_diff")).as("mean_diff"), r6(col("se")).as("se"),
          r6(col("t_stat")).as("t_stat"), r6(col("q_stat")).as("q_stat"),
          r6(col("df_welch")).as("df_welch"))
        .orderBy("group_a", "group_b"),
    Some("""
      WITH g AS (SELECT event_type AS gr, count(*)::DOUBLE AS n,
                   avg("value") AS m, var_samp("value") AS s2
                 FROM events
                 WHERE "value" IS NOT NULL AND event_type IS NOT NULL
                 GROUP BY 1),
      k AS (SELECT * FROM g WHERE n >= 2 AND s2 IS NOT NULL)
      SELECT a.gr AS group_a, b.gr AS group_b,
             a.n::BIGINT AS n_a, b.n::BIGINT AS n_b,
             round(a.m - b.m, 6) AS mean_diff,
             round(sqrt(a.s2 / a.n + b.s2 / b.n), 6) AS se,
             round((a.m - b.m) / sqrt(a.s2 / a.n + b.s2 / b.n), 6)
               AS t_stat,
             round(abs(a.m - b.m) /
               sqrt((a.s2 / a.n + b.s2 / b.n) / 2), 6) AS q_stat,
             round(power(a.s2 / a.n + b.s2 / b.n, 2) /
               ((a.s2 / a.n) * (a.s2 / a.n) / (a.n - 1) +
                (b.s2 / b.n) * (b.s2 / b.n) / (b.n - 1)), 6) AS df_welch
      FROM k a JOIN k b ON a.gr < b.gr
      ORDER BY group_a, group_b"""))

  /** Rank effect sizes for the q45 arm pair: Vargha–Delaney A and
    * Cliff's δ from the midrank-exact U — HOW MUCH, not just whether.
    * Rides the shared memoized rank-cell substrate. */
  private val q452 = Entry(
    "q452_rank_effect_sizes",
    (s, d) =>
      AnalysisPlanner
        .rankEffectSizesFromCells(eventTypeValueCells(s, d),
          control = "purchase", treatment = "click")
        .select(col("n_c"), col("n_t"), r6(col("u_stat")).as("u_stat"),
          r6(col("vda_a")).as("vda_a"),
          r6(col("cliffs_delta")).as("cliffs_delta")),
    Some("""
      WITH f AS (SELECT "value" AS v, event_type FROM events
                 WHERE event_type IN ('purchase', 'click')
                   AND "value" IS NOT NULL),
      r AS (SELECT v, event_type,
              rank() OVER (ORDER BY v) +
                (count(*) OVER (PARTITION BY v) - 1) / 2.0 AS mr
            FROM f),
      a AS (SELECT sum(CASE WHEN event_type = 'click' THEN mr END) AS rt,
              count(CASE WHEN event_type = 'click' THEN v END)::DOUBLE
                AS nt,
              count(CASE WHEN event_type = 'purchase' THEN v END)::DOUBLE
                AS nc
            FROM r)
      SELECT nc::BIGINT AS n_c, nt::BIGINT AS n_t,
             round(rt - nt * (nt + 1) / 2.0, 6) AS u_stat,
             round((rt - nt * (nt + 1) / 2.0) / (nt * nc), 6) AS vda_a,
             round(2 * (rt - nt * (nt + 1) / 2.0) / (nt * nc) - 1, 6)
               AS cliffs_delta
      FROM a"""))

  /** Stuart's tau-c on the order-priority × price-quartile contingency
    * — the rectangular-table Kendall variant (tau-b penalizes r≠c);
    * priority code and exact DISC quartile cuts keep both engines on
    * identical integer cells. */
  private val q453 = Entry(
    "q453_stuart_tau_c",
    (s, d) => {
      val o = Tables.orders(s, d)
      val qs = AnalysisPlanner.exactPercentilesDisc(o, "o_totalprice",
        Seq("q1" -> 0.25, "q2" -> 0.5, "q3" -> 0.75), Nil)
      val coded = o.crossJoin(broadcast(qs)).select(
        substring(col("o_orderpriority"), 1, 1).cast("int").as("__px"),
        (lit(1) + (col("o_totalprice") > col("q1")).cast("int") +
          (col("o_totalprice") > col("q2")).cast("int") +
          (col("o_totalprice") > col("q3")).cast("int")).as("__py"))
      AnalysisPlanner.tauCContingency(coded, "__px", "__py")
        .select(col("n"), col("n_x_levels"), col("n_y_levels"),
          col("concordant"), col("discordant"),
          r6(col("tau_c")).as("tau_c"))
    },
    Some("""
      WITH q AS (SELECT quantile_disc(o_totalprice, 0.25) AS q1,
                   quantile_disc(o_totalprice, 0.5) AS q2,
                   quantile_disc(o_totalprice, 0.75) AS q3
                 FROM orders),
      b AS (SELECT CAST(substr(o_orderpriority, 1, 1) AS INT) AS px,
              1 + (o_totalprice > q1)::INT + (o_totalprice > q2)::INT +
                (o_totalprice > q3)::INT AS py
            FROM orders, q),
      cells AS (SELECT px, py, count(*)::DOUBLE AS c FROM b GROUP BY 1, 2),
      cd AS (SELECT
               sum(CASE WHEN a.px < d.px AND a.py < d.py
                   THEN a.c * d.c ELSE 0 END) AS conc,
               sum(CASE WHEN a.px < d.px AND a.py > d.py
                   THEN a.c * d.c ELSE 0 END) AS disc
             FROM cells a, cells d),
      m AS (SELECT count(*)::DOUBLE AS n,
              count(DISTINCT px)::DOUBLE AS r,
              count(DISTINCT py)::DOUBLE AS cc
            FROM b)
      SELECT n::BIGINT AS n, r::BIGINT AS n_x_levels,
             cc::BIGINT AS n_y_levels,
             conc::BIGINT AS concordant, disc::BIGINT AS discordant,
             round(least(r, cc) * 2 * (conc - disc) /
               (n * n * (least(r, cc) - 1)), 6) AS tau_c
      FROM cd, m"""))

  /** Power-divergence family on the market-segment × nation
    * contingency: Pearson, Freeman–Tukey, Neyman, Cressie–Read — when
    * they split, sparse cells drive the verdict. */
  private val q454 = Entry(
    "q454_power_divergence",
    (s, d) =>
      AnalysisPlanner.powerDivergence(Tables.customer(s, d),
          "c_mktsegment", "c_nationkey")
        .select(col("n"), col("n_rows"), col("n_cols"), col("dof"),
          r6(col("chi2")).as("chi2"),
          r6(col("freeman_tukey")).as("freeman_tukey"),
          r6(col("neyman")).as("neyman"),
          r6(col("cressie_read")).as("cressie_read")),
    Some("""
      WITH cells AS (SELECT c_mktsegment AS x,
                       CAST(c_nationkey AS VARCHAR) AS y,
                       count(*)::DOUBLE AS o
                     FROM customer
                     WHERE c_mktsegment IS NOT NULL
                       AND c_nationkey IS NOT NULL
                     GROUP BY 1, 2),
      rm AS (SELECT x, sum(o) AS rx FROM cells GROUP BY 1),
      cm AS (SELECT y, sum(o) AS cy FROM cells GROUP BY 1),
      t AS (SELECT sum(o) AS n, count(DISTINCT x)::DOUBLE AS r,
              count(DISTINCT y)::DOUBLE AS c
            FROM cells)
      SELECT n::BIGINT AS n, r::BIGINT AS n_rows, c::BIGINT AS n_cols,
             ((r - 1) * (c - 1))::BIGINT AS dof,
             round(sum(o * o / (rx * cy / n)) - n, 6) AS chi2,
             round(8 * n - 8 * sum(sqrt(o * (rx * cy / n))), 6)
               AS freeman_tukey,
             round(sum(CASE WHEN o > 0
               THEN power(o - rx * cy / n, 2) / o ELSE 0 END), 6)
               AS neyman,
             round(2 / ((2.0 / 3) * (2.0 / 3 + 1)) *
               sum(o * (power(o / (rx * cy / n), 2.0 / 3) - 1)), 6)
               AS cressie_read
      FROM cells JOIN rm USING (x) JOIN cm USING (y) CROSS JOIN t
      GROUP BY n, r, c"""))

  /** Nominal-association strength panel on priority × status:
    * Tschuprow's T (dof-normalized, comparable across table shapes),
    * Pearson's C, and Sakoda's adjusted C. */
  private val q455 = Entry(
    "q455_tschuprow",
    (s, d) => {
      val pd = AnalysisPlanner.powerDivergence(Tables.orders(s, d),
        "o_orderpriority", "o_orderstatus")
      val m = least(col("n_rows"), col("n_cols")).cast("double")
      val c2 = col("chi2") / (col("chi2") + col("n"))
      pd.select(col("n"), col("n_rows"), col("n_cols"),
        r6(col("chi2")).as("chi2"),
        r6(sqrt(col("chi2") /
          (col("n") * sqrt(col("dof").cast("double")))))
          .as("tschuprow_t"),
        r6(sqrt(c2)).as("pearson_c"),
        r6(sqrt(c2) / sqrt((m - 1) / m)).as("sakoda_c"))
    },
    Some("""
      WITH cells AS (SELECT o_orderpriority AS x, o_orderstatus AS y,
                       count(*)::DOUBLE AS o
                     FROM orders
                     WHERE o_orderpriority IS NOT NULL
                       AND o_orderstatus IS NOT NULL
                     GROUP BY 1, 2),
      rm AS (SELECT x, sum(o) AS rx FROM cells GROUP BY 1),
      cm AS (SELECT y, sum(o) AS cy FROM cells GROUP BY 1),
      t AS (SELECT sum(o) AS n, count(DISTINCT x)::DOUBLE AS r,
              count(DISTINCT y)::DOUBLE AS c
            FROM cells),
      x2 AS (SELECT n, r, c, sum(o * o / (rx * cy / n)) - n AS chi2
             FROM cells JOIN rm USING (x) JOIN cm USING (y) CROSS JOIN t
             GROUP BY n, r, c)
      SELECT n::BIGINT AS n, r::BIGINT AS n_rows, c::BIGINT AS n_cols,
             round(chi2, 6) AS chi2,
             round(sqrt(chi2 / (n * sqrt((r - 1) * (c - 1)))), 6)
               AS tschuprow_t,
             round(sqrt(chi2 / (chi2 + n)), 6) AS pearson_c,
             round(sqrt(chi2 / (chi2 + n)) /
               sqrt((least(r, c) - 1) / least(r, c)), 6) AS sakoda_c
      FROM x2"""))

  /** Bartlett's sphericity gate on the lineitem price-structure
    * columns — is the correlation matrix distinguishable from
    * identity before any PCA/factor reduction is worth fitting? */
  private val q456 = Entry(
    "q456_bartlett_sphericity",
    (s, d) =>
      AnalysisPlanner.bartlettSphericity(Tables.lineitem(s, d),
          Seq("l_quantity", "l_extendedprice", "l_discount"))
        .select(col("n"), col("n_vars"), r6(col("det_r")).as("det_r"),
          r6(col("chi2")).as("chi2"), col("dof")),
    Some("""
      WITH c AS (SELECT count(*)::DOUBLE AS n,
              corr(l_quantity, l_extendedprice) AS r12,
              corr(l_quantity, l_discount) AS r13,
              corr(l_extendedprice, l_discount) AS r23
            FROM lineitem
            WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
              AND l_discount IS NOT NULL),
      dd AS (SELECT n,
               1 + 2 * r12 * r13 * r23 - r12 * r12 - r13 * r13 -
                 r23 * r23 AS det_r
             FROM c)
      SELECT n::BIGINT AS n, 3::BIGINT AS n_vars,
             round(det_r, 6) AS det_r,
             round(CASE WHEN det_r > 0
               THEN -(n - 1 - 11.0 / 6) * ln(det_r) END, 6) AS chi2,
             3::BIGINT AS dof
      FROM dd"""))

  /** Clustering-agreement panel: do the corpus's two natural
    * partitions (language vs source) say the same thing? ARI,
    * Fowlkes–Mallows, raw Rand — all closed forms over the
    * contingency, never a pair join. */
  private val q457 = Entry(
    "q457_cluster_agreement",
    (s, d) =>
      AnalysisPlanner.clusterAgreement(Tables.documents(s, d), "lang",
          "source")
        .select(col("n"), col("n_clusters_a"), col("n_clusters_b"),
          r6(col("rand_index")).as("rand_index"),
          r6(col("adjusted_rand")).as("adjusted_rand"),
          r6(col("fowlkes_mallows")).as("fowlkes_mallows")),
    Some("""
      WITH cells AS (SELECT lang AS a, source AS b, count(*)::DOUBLE AS n
                     FROM documents
                     WHERE lang IS NOT NULL AND source IS NOT NULL
                     GROUP BY 1, 2),
      am AS (SELECT sum(na * (na - 1) / 2.0) AS pa, count(*) AS ka
             FROM (SELECT a, sum(n) AS na FROM cells GROUP BY 1)),
      bm AS (SELECT sum(nb * (nb - 1) / 2.0) AS pb, count(*) AS kb
             FROM (SELECT b, sum(n) AS nb FROM cells GROUP BY 1)),
      t AS (SELECT sum(n) AS nn, sum(n * (n - 1) / 2.0) AS pij
            FROM cells),
      z AS (SELECT nn, ka, kb, pij, pa, pb,
              nn * (nn - 1) / 2.0 AS tot,
              pa * pb / (nn * (nn - 1) / 2.0) AS expd
            FROM t, am, bm)
      SELECT nn::BIGINT AS n, ka::BIGINT AS n_clusters_a,
             kb::BIGINT AS n_clusters_b,
             round((tot + 2 * pij - pa - pb) / tot, 6) AS rand_index,
             round(CASE WHEN (pa + pb) / 2 - expd <> 0
               THEN (pij - expd) / ((pa + pb) / 2 - expd) END, 6)
               AS adjusted_rand,
             round(CASE WHEN pa > 0 AND pb > 0
               THEN pij / sqrt(pa * pb) END, 6) AS fowlkes_mallows
      FROM z"""))

  /** Two-proportion effect panel: positive-balance rate, BUILDING vs
    * AUTOMOBILE — risk difference/ratio, odds ratio, Cohen's h, NNT. */
  private val q458 = Entry(
    "q458_proportion_effects",
    (s, d) =>
      AnalysisPlanner.proportionEffects(
          Tables.customer(s, d).withColumn("__pos", col("c_acctbal") > 0),
          "c_mktsegment", "__pos", "BUILDING", "AUTOMOBILE")
        .select(col("n_a"), col("n_b"), r6(col("p_a")).as("p_a"),
          r6(col("p_b")).as("p_b"), r6(col("risk_diff")).as("risk_diff"),
          r6(col("risk_ratio")).as("risk_ratio"),
          r6(col("odds_ratio")).as("odds_ratio"),
          r6(col("cohens_h")).as("cohens_h"), r6(col("nnt")).as("nnt")),
    Some("""
      WITH a AS (SELECT
              sum(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END)
                AS na,
              sum(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END)
                AS nb,
              sum(CASE WHEN c_mktsegment = 'BUILDING' AND c_acctbal > 0
                THEN 1 ELSE 0 END) AS sa,
              sum(CASE WHEN c_mktsegment = 'AUTOMOBILE' AND c_acctbal > 0
                THEN 1 ELSE 0 END) AS sb
            FROM customer
            WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
              AND c_acctbal IS NOT NULL),
      p AS (SELECT na, nb, sa / CAST(na AS DOUBLE) AS pa,
              sb / CAST(nb AS DOUBLE) AS pb
            FROM a)
      SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b, round(pa, 6) AS p_a,
             round(pb, 6) AS p_b, round(pa - pb, 6) AS risk_diff,
             round(CASE WHEN pb > 0 THEN pa / pb END, 6) AS risk_ratio,
             round(CASE WHEN pa > 0 AND pa < 1 AND pb > 0 AND pb < 1
               THEN (pa / (1 - pa)) / (pb / (1 - pb)) END, 6)
               AS odds_ratio,
             round(2 * (asin(sqrt(pa)) - asin(sqrt(pb))), 6) AS cohens_h,
             round(CASE WHEN pa <> pb THEN 1 / abs(pa - pb) END, 6)
               AS nnt
      FROM p"""))

  /** Holt double-exponential smoothing of the daily event-count
    * series (α=0.3, β=0.1): level+trend state and the 7-day-ahead
    * forecast band a capacity planner reads. */
  private val q459 = Entry(
    "q459_holt_trend",
    (s, d) =>
      graft.ops.TimeSeries.holtLinear(Tables.events(s, d), "ts",
          alpha = 0.3, beta = 0.1, horizon = 7)
        .select(col("h"), col("n_days"), r6(col("level")).as("level"),
          r6(col("trend")).as("trend"),
          r6(col("forecast")).as("forecast"), r2(col("sse")).as("sse"),
          r6(col("rmse")).as("rmse"))
        .orderBy("h"),
    Some("""
      WITH RECURSIVE days AS (SELECT CAST(ts AS DATE) AS day,
                     count(*)::DOUBLE AS y
                   FROM events WHERE ts IS NOT NULL GROUP BY 1),
      seq AS (SELECT row_number() OVER (ORDER BY day) AS i, y FROM days),
      rec AS (
        SELECT 1::BIGINT AS t,
               (SELECT y FROM seq WHERE i = 1) AS level,
               (SELECT y FROM seq WHERE i = 2) -
                 (SELECT y FROM seq WHERE i = 1) AS trend,
               CAST(0.0 AS DOUBLE) AS sse
        UNION ALL
        SELECT r.t + 1,
               0.3 * s.y + 0.7 * (r.level + r.trend),
               0.1 * (0.3 * s.y + 0.7 * (r.level + r.trend) - r.level) +
                 0.9 * r.trend,
               r.sse + (s.y - (r.level + r.trend)) *
                 (s.y - (r.level + r.trend))
        FROM rec r JOIN seq s ON s.i = r.t + 1),
      fin AS (SELECT * FROM rec ORDER BY t DESC LIMIT 1),
      n AS (SELECT count(*)::BIGINT AS nd FROM seq)
      SELECT h::BIGINT AS h, nd AS n_days, round(level, 6) AS level,
             round(trend, 6) AS trend,
             round(level + h * trend, 6) AS forecast,
             round(sse, 2) AS sse,
             round(sqrt(sse / (nd - 1)), 6) AS rmse
      FROM (SELECT unnest(generate_series(1, 7)) AS h), fin, n
      ORDER BY h"""))

  /** Supplier concentration per part brand: quantity-share HHI + CR4
    * + top-supplier share — integer-exact quantity sums make the
    * top-k cut engine-deterministic. */
  private val q460 = Entry(
    "q460_concentration",
    (s, d) => {
      val li = Tables.lineitem(s, d).join(
        Tables.part(s, d).select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      val per = li.groupBy("p_brand", "l_suppkey")
        .agg(sum(col("l_quantity")).cast("long").as("__q"))
      val w = Window.partitionBy("p_brand")
        .orderBy(col("__q").desc, col("l_suppkey").asc)
      per.withColumn("__rk", row_number().over(w))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_suppliers"),
          sum(col("__q")).as("total_qty"),
          r6(sum(col("__q") * col("__q")).cast("double") /
            (sum(col("__q")) * sum(col("__q")))).as("hhi"),
          r6(sum(when(col("__rk") <= 4, col("__q")).otherwise(0L))
            .cast("double") / sum(col("__q"))).as("cr4"),
          r6(max(when(col("__rk") === 1, col("__q"))).cast("double") /
            sum(col("__q"))).as("top_share"))
        .orderBy("p_brand")
    },
    Some("""
      WITH per AS (SELECT p_brand, l_suppkey,
                     CAST(sum(l_quantity) AS BIGINT) AS q
                   FROM lineitem JOIN part ON l_partkey = p_partkey
                   GROUP BY 1, 2),
      rk AS (SELECT p_brand, q,
               row_number() OVER (PARTITION BY p_brand
                 ORDER BY q DESC, l_suppkey ASC) AS r
             FROM per)
      SELECT p_brand, count(*)::BIGINT AS n_suppliers,
             sum(q)::BIGINT AS total_qty,
             round(sum(q * q) / (CAST(sum(q) AS DOUBLE) * sum(q)), 6)
               AS hhi,
             round(sum(CASE WHEN r <= 4 THEN q ELSE 0 END) /
               CAST(sum(q) AS DOUBLE), 6) AS cr4,
             round(max(CASE WHEN r = 1 THEN q END) /
               CAST(sum(q) AS DOUBLE), 6) AS top_share
      FROM rk GROUP BY 1 ORDER BY p_brand"""))

  /** Grade-level readability panel by language: ARI + Coleman–Liau
    * (character-based) vs Gunning fog + SMOG (complex-word based) —
    * indices that fail independently of the Flesch syllable proxy. */
  private val q461 = Entry(
    "q461_readability_panel",
    (s, d) =>
      graft.ops.TextAnalysis
        .readabilityPanel(
          Tables.documents(s, d).where(col("text").isNotNull), "text")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          r6(avg(col("ari"))).as("avg_ari"),
          r6(avg(col("coleman_liau"))).as("avg_coleman_liau"),
          r6(avg(col("gunning_fog"))).as("avg_gunning_fog"),
          r6(avg(col("smog"))).as("avg_smog"),
          r6(avg(col("n_complex").cast("double") /
            col("n_words"))).as("avg_complex_share"))
        .orderBy("lang"),
    Some("""
      WITH p AS (SELECT lang,
              greatest(len(list_filter(string_split(trim(text), ' '),
                x -> x <> '')), 1)::DOUBLE AS w,
              greatest(len(regexp_extract_all(text, '[.!?]')), 1)::DOUBLE
                AS s,
              length(regexp_replace(text, '\s', '', 'g'))::DOUBLE AS l,
              len(list_filter(string_split(trim(text), ' '),
                x -> len(regexp_extract_all(lower(x), '[aeiouy]+')) >= 3))
                ::DOUBLE AS cx
            FROM documents WHERE text IS NOT NULL)
      SELECT lang, count(*)::BIGINT AS n_docs,
             round(avg(4.71 * (l / w) + 0.5 * (w / s) - 21.43), 6)
               AS avg_ari,
             round(avg(0.0588 * (l / w * 100) - 0.296 * (s / w * 100) -
               15.8), 6) AS avg_coleman_liau,
             round(avg((w / s + cx / w * 100) * 0.4), 6)
               AS avg_gunning_fog,
             round(avg(1.0430 * sqrt(cx * 30 / s) + 3.1291), 6)
               AS avg_smog,
             round(avg(cx / w), 6) AS avg_complex_share
      FROM p GROUP BY 1 ORDER BY lang"""))

  /** Paired sign test on integer-exact per-user activity counts: do
    * users click more than they view? Counts keep the per-block SIGN
    * engine-deterministic (a near-zero mean difference would not be). */
  private val q462 = Entry(
    "q462_sign_test",
    (s, d) =>
      AnalysisPlanner.signTest(Tables.events(s, d), "user_id",
          "event_type", a = "click", b = "view")
        .select(col("n_blocks"), col("n_pos"), col("n_neg"),
          col("n_tied"), r6(col("z_stat")).as("z_stat")),
    Some("""
      WITH per AS (SELECT user_id,
              sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ca,
              sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS cb
            FROM events WHERE event_type IN ('click', 'view')
            GROUP BY 1),
      k AS (SELECT * FROM per WHERE ca > 0 AND cb > 0),
      a AS (SELECT count(*)::BIGINT AS n_blocks,
              sum(CASE WHEN ca > cb THEN 1 ELSE 0 END)::BIGINT AS n_pos,
              sum(CASE WHEN ca < cb THEN 1 ELSE 0 END)::BIGINT AS n_neg,
              sum(CASE WHEN ca = cb THEN 1 ELSE 0 END)::BIGINT AS n_tied
            FROM k)
      SELECT n_blocks, n_pos, n_neg, n_tied,
             round((n_pos - (n_pos + n_neg) / 2.0) /
               sqrt((n_pos + n_neg) / 4.0), 6) AS z_stat
      FROM a"""))

  /** V-measure panel: the entropy view of the q457 lang×source
    * agreement — homogeneity, completeness, V, NMI. */
  private val q463 = Entry(
    "q463_v_measure",
    (s, d) =>
      AnalysisPlanner.vMeasure(Tables.documents(s, d), "lang", "source")
        .select(col("n"), col("n_clusters_a"), col("n_clusters_b"),
          r6(col("h_a")).as("h_a"), r6(col("h_b")).as("h_b"),
          r6(col("mutual_info")).as("mutual_info"),
          r6(col("homogeneity")).as("homogeneity"),
          r6(col("completeness")).as("completeness"),
          r6(col("v_measure")).as("v_measure"), r6(col("nmi")).as("nmi")),
    Some("""
      WITH cells AS (SELECT lang AS a, source AS b, count(*)::DOUBLE AS n
                     FROM documents
                     WHERE lang IS NOT NULL AND source IS NOT NULL
                     GROUP BY 1, 2),
      t AS (SELECT sum(n) AS nn, count(DISTINCT a) AS ka,
              count(DISTINCT b) AS kb FROM cells),
      am AS (SELECT a, sum(n) AS na FROM cells GROUP BY 1),
      bm AS (SELECT b, sum(n) AS nb FROM cells GROUP BY 1),
      ha AS (SELECT -sum(na / nn * ln(na / nn)) AS h_a FROM am, t),
      hb AS (SELECT -sum(nb / nn * ln(nb / nn)) AS h_b FROM bm, t),
      cj AS (SELECT -sum(n / nn * ln(n / nb)) AS h_a_given_b,
               -sum(n / nn * ln(n / na)) AS h_b_given_a
             FROM cells JOIN am USING (a) JOIN bm USING (b) CROSS JOIN t),
      z AS (SELECT nn, ka, kb, h_a, h_b,
              h_a - h_a_given_b AS mi,
              CASE WHEN h_a > 0 THEN 1 - h_a_given_b / h_a ELSE 1 END
                AS hom,
              CASE WHEN h_b > 0 THEN 1 - h_b_given_a / h_b ELSE 1 END
                AS com
            FROM t, ha, hb, cj)
      SELECT nn::BIGINT AS n, ka::BIGINT AS n_clusters_a,
             kb::BIGINT AS n_clusters_b,
             round(h_a, 6) AS h_a, round(h_b, 6) AS h_b,
             round(mi, 6) AS mutual_info, round(hom, 6) AS homogeneity,
             round(com, 6) AS completeness,
             round(CASE WHEN hom + com > 0
               THEN 2 * hom * com / (hom + com) ELSE 0 END, 6)
               AS v_measure,
             round(CASE WHEN h_a + h_b > 0
               THEN 2 * mi / (h_a + h_b) END, 6) AS nmi
      FROM z"""))

  /** Gumbel fit on daily value maxima + monthly/quarterly/yearly
    * return levels — the capacity-planning extreme-value readout. */
  private val q464 = Entry(
    "q464_gumbel_maxima",
    (s, d) =>
      graft.ops.TimeSeries
        .gumbelBlockMaxima(Tables.events(s, d), "ts", "value")
        .select(col("t_period"), col("n_blocks"), r6(col("mu")).as("mu"),
          r6(col("beta")).as("beta"),
          r6(col("return_level")).as("return_level"))
        .orderBy("t_period"),
    Some("""
      WITH mx AS (SELECT CAST(ts AS DATE) AS d, max("value") AS m
                  FROM events
                  WHERE ts IS NOT NULL AND "value" IS NOT NULL
                  GROUP BY 1),
      mom AS (SELECT count(*)::BIGINT AS n_blocks, avg(m) AS mean,
                stddev_samp(m) AS sd FROM mx),
      p AS (SELECT n_blocks, sd * sqrt(6.0) / pi() AS beta,
              mean - 0.5772156649015329 * (sd * sqrt(6.0) / pi()) AS mu
            FROM mom)
      SELECT t AS t_period, n_blocks, round(mu, 6) AS mu,
             round(beta, 6) AS beta,
             round(mu - beta * ln(-ln(1 - 1.0 / t)), 6) AS return_level
      FROM (SELECT unnest([30, 90, 365]) AS t), p
      ORDER BY t_period"""))

  /** Embedding label-coherence: avg cosine to own-label centroid vs
    * the corpus centroid, per label — do labels carve the space? */
  private val q465 = Entry(
    "q465_label_coherence",
    (s, d) =>
      graft.ops.Similarity
        .labelCoherence(Tables.embeddings(s, d), "label", "embedding")
        .select(col("label"), col("n"),
          r6(col("avg_cos_own")).as("avg_cos_own"),
          r6(col("avg_cos_global")).as("avg_cos_global"),
          r6(col("separation")).as("separation"))
        .orderBy("label"),
    Some("""
      WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
                 FROM embeddings
                 WHERE embedding IS NOT NULL AND label IS NOT NULL),
      pos AS (SELECT label, u.i AS i, v[u.i] AS x
              FROM e, unnest(generate_series(1, len(v))) AS u(i)),
      cent AS (SELECT label, list(c ORDER BY i) AS cl
               FROM (SELECT label, i, avg(x) AS c FROM pos GROUP BY 1, 2)
               GROUP BY 1),
      gcent AS (SELECT list(g ORDER BY i) AS gl
               FROM (SELECT i, avg(x) AS g FROM pos GROUP BY 1)),
      per AS (SELECT e.label,
                list_dot_product(e.v, c.cl) /
                  (sqrt(list_dot_product(e.v, e.v)) *
                   sqrt(list_dot_product(c.cl, c.cl))) AS co,
                list_dot_product(e.v, g.gl) /
                  (sqrt(list_dot_product(e.v, e.v)) *
                   sqrt(list_dot_product(g.gl, g.gl))) AS cg
              FROM e JOIN cent c USING (label) CROSS JOIN gcent g)
      SELECT label, count(*)::BIGINT AS n,
             round(avg(co), 6) AS avg_cos_own,
             round(avg(cg), 6) AS avg_cos_global,
             round(avg(co - cg), 6) AS separation
      FROM per GROUP BY 1 ORDER BY label"""))

  /** Difference-in-differences: click vs view value, last-14-days post
    * period (max(ts)-anchored) — the drift-corrected lift estimate. */
  private val q466 = Entry(
    "q466_did",
    (s, d) => {
      val ev = Tables.events(s, d)
        .where(col("event_type").isin("click", "view"))
      val anchored = ev.crossJoin(broadcast(ev.agg(max("ts").as("__mx"))))
      graft.ops.Regression.differenceInDifferences(anchored, "value",
          treated = col("event_type") === "click",
          post = col("ts") >= col("__mx") - expr("INTERVAL 14 DAYS"))
        .select(col("n"), r6(col("mean_c_pre")).as("mean_c_pre"),
          r6(col("mean_c_post")).as("mean_c_post"),
          r6(col("mean_t_pre")).as("mean_t_pre"),
          r6(col("mean_t_post")).as("mean_t_post"),
          r6(col("did")).as("did"), r6(col("se")).as("se"),
          r6(col("t_stat")).as("t_stat"))
    },
    Some("""
      WITH mx AS (SELECT max(ts) AS m FROM events
                  WHERE event_type IN ('click', 'view')),
      f AS (SELECT "value" AS y, (event_type = 'click') AS tr,
              (ts >= m - INTERVAL 14 DAY) AS po
            FROM events, mx
            WHERE event_type IN ('click', 'view')
              AND "value" IS NOT NULL),
      a AS (SELECT
              sum(CASE WHEN NOT tr AND NOT po THEN y END) AS s0,
              sum(CASE WHEN NOT tr AND NOT po THEN y * y END) AS q0,
              sum(CASE WHEN NOT tr AND NOT po THEN 1.0 ELSE 0 END) AS n0,
              sum(CASE WHEN NOT tr AND po THEN y END) AS s1,
              sum(CASE WHEN NOT tr AND po THEN y * y END) AS q1,
              sum(CASE WHEN NOT tr AND po THEN 1.0 ELSE 0 END) AS n1,
              sum(CASE WHEN tr AND NOT po THEN y END) AS s2,
              sum(CASE WHEN tr AND NOT po THEN y * y END) AS q2,
              sum(CASE WHEN tr AND NOT po THEN 1.0 ELSE 0 END) AS n2,
              sum(CASE WHEN tr AND po THEN y END) AS s3,
              sum(CASE WHEN tr AND po THEN y * y END) AS q3,
              sum(CASE WHEN tr AND po THEN 1.0 ELSE 0 END) AS n3
            FROM f),
      z AS (SELECT n0 + n1 + n2 + n3 AS n,
              s0 / n0 AS m0, s1 / n1 AS m1, s2 / n2 AS m2, s3 / n3 AS m3,
              (s3 / n3 - s2 / n2) - (s1 / n1 - s0 / n0) AS did,
              sqrt((q0 - s0 * s0 / n0) / (n0 - 1) / n0 +
                   (q1 - s1 * s1 / n1) / (n1 - 1) / n1 +
                   (q2 - s2 * s2 / n2) / (n2 - 1) / n2 +
                   (q3 - s3 * s3 / n3) / (n3 - 1) / n3) AS se
            FROM a)
      SELECT n::BIGINT AS n, round(m0, 6) AS mean_c_pre,
             round(m1, 6) AS mean_c_post, round(m2, 6) AS mean_t_pre,
             round(m3, 6) AS mean_t_post, round(did, 6) AS did,
             round(se, 6) AS se,
             round(CASE WHEN se > 0 THEN did / se END, 6) AS t_stat
      FROM z"""))

  /** Sharp regression discontinuity at the 5% discount cutoff:
    * triangular-kernel local linear fits on both sides, jump =
    * intercept difference. */
  private val q467 = Entry(
    "q467_rdd_local_linear",
    (s, d) =>
      graft.ops.Regression.rddLocalLinear(Tables.lineitem(s, d),
          "l_discount", "l_extendedprice", cutoff = 0.05,
          bandwidth = 0.03)
        .select(col("n_left"), col("n_right"),
          r6(col("intercept_left")).as("intercept_left"),
          r6(col("intercept_right")).as("intercept_right"),
          r6(col("slope_left")).as("slope_left"),
          r6(col("slope_right")).as("slope_right"),
          r6(col("effect")).as("effect")),
    Some("""
      WITH g AS (SELECT l_discount - 0.05 AS xc, l_extendedprice AS y,
              1 - abs(l_discount - 0.05) / 0.03 AS w,
              (l_discount >= 0.05) AS r
            FROM lineitem
            WHERE l_discount IS NOT NULL AND l_extendedprice IS NOT NULL
              AND abs(l_discount - 0.05) < 0.03),
      a AS (SELECT
              sum(CASE WHEN NOT r THEN 1 ELSE 0 END)::BIGINT AS nl,
              sum(CASE WHEN r THEN 1 ELSE 0 END)::BIGINT AS nr,
              sum(CASE WHEN NOT r THEN w ELSE 0 END) AS swl,
              sum(CASE WHEN NOT r THEN w * xc END) AS swxl,
              sum(CASE WHEN NOT r THEN w * y END) AS swyl,
              sum(CASE WHEN NOT r THEN w * xc * xc END) AS swxxl,
              sum(CASE WHEN NOT r THEN w * xc * y END) AS swxyl,
              sum(CASE WHEN r THEN w ELSE 0 END) AS swr,
              sum(CASE WHEN r THEN w * xc END) AS swxr,
              sum(CASE WHEN r THEN w * y END) AS swyr,
              sum(CASE WHEN r THEN w * xc * xc END) AS swxxr,
              sum(CASE WHEN r THEN w * xc * y END) AS swxyr
            FROM g),
      fit AS (SELECT nl, nr,
                (swl * swxyl - swxl * swyl) /
                  (swl * swxxl - swxl * swxl) AS bl,
                (swr * swxyr - swxr * swyr) /
                  (swr * swxxr - swxr * swxr) AS br,
                swl, swxl, swyl, swr, swxr, swyr
              FROM a),
      z AS (SELECT nl, nr, bl, br,
              (swyl - bl * swxl) / swl AS al,
              (swyr - br * swxr) / swr AS ar
            FROM fit)
      SELECT nl AS n_left, nr AS n_right,
             round(al, 6) AS intercept_left,
             round(ar, 6) AS intercept_right,
             round(bl, 6) AS slope_left, round(br, 6) AS slope_right,
             round(ar - al, 6) AS effect
      FROM z"""))

  /** Pareto-tail profile of order totals above the exact p95: Hill
    * α, mean excess, and the tail's share of total revenue — the
    * skew-planning heavy-tail readout. */
  private val q468 = Entry(
    "q468_pareto_tail",
    (s, d) =>
      AnalysisPlanner.paretoTail(Tables.orders(s, d), "o_totalprice",
          p = 0.95)
        .select(r6(col("threshold")).as("threshold"), col("n_tail"),
          r6(col("tail_frac")).as("tail_frac"),
          r6(col("hill_alpha")).as("hill_alpha"),
          r6(col("mean_excess")).as("mean_excess"),
          r6(col("tail_mass_share")).as("tail_mass_share")),
    Some("""
      WITH u AS (SELECT quantile_disc(o_totalprice, 0.95) AS th
                 FROM orders),
      a AS (SELECT max(th) AS threshold,
              sum(CASE WHEN o_totalprice > th THEN 1 ELSE 0 END)::BIGINT
                AS n_tail,
              count(*)::DOUBLE AS n,
              avg(CASE WHEN o_totalprice > th
                THEN ln(o_totalprice / th) END) AS mlog,
              avg(CASE WHEN o_totalprice > th
                THEN o_totalprice - th END) AS mean_excess,
              sum(CASE WHEN o_totalprice > th THEN o_totalprice
                ELSE 0 END) / sum(o_totalprice) AS tms
            FROM orders, u WHERE o_totalprice IS NOT NULL)
      SELECT round(threshold, 6) AS threshold, n_tail,
             round(n_tail / n, 6) AS tail_frac,
             round(CASE WHEN mlog > 0 THEN 1 / mlog END, 6)
               AS hill_alpha,
             round(mean_excess, 6) AS mean_excess,
             round(tms, 6) AS tail_mass_share
      FROM a"""))

  /** Scholz–Stephens k-sample Anderson–Darling over all five event
    * types — tail-weighted "same distribution?" with the paper's exact
    * finite-N standardization; rides the memoized rank-cell substrate. */
  private val q469 = Entry(
    "q469_ksample_ad",
    (s, d) =>
      AnalysisPlanner
        .andersonDarlingKSampleFromCells(eventTypeValueCells(s, d))
        .select(col("n"), col("n_groups"),
          r6(col("a2_stat")).as("a2_stat"), r6(col("sigma")).as("sigma"),
          r6(col("t_stat")).as("t_stat")),
    Some("""
      WITH f AS (SELECT "value" AS v, event_type AS g FROM events
                 WHERE "value" IS NOT NULL AND event_type IS NOT NULL),
      gt AS (SELECT g, count(*)::DOUBLE AS ng FROM f GROUP BY 1),
      t AS (SELECT sum(ng) AS n, count(*)::DOUBLE AS k FROM gt),
      vc AS (SELECT v, g, count(*)::DOUBLE AS c FROM f GROUP BY 1, 2),
      vt AS (SELECT v, sum(c) AS h FROM vc GROUP BY 1),
      grid AS (SELECT vt.v, vt.h, gt.g, gt.ng, coalesce(vc.c, 0) AS c
               FROM vt CROSS JOIN gt
               LEFT JOIN vc ON vc.v = vt.v AND vc.g = gt.g),
      cum AS (SELECT v, h, g, ng, c,
                sum(c) OVER (PARTITION BY g ORDER BY v) - c / 2.0 AS ma,
                sum(h) OVER (PARTITION BY g ORDER BY v) - h / 2.0 AS ba
              FROM grid),
      a2c AS (SELECT (max(n) - 1) / max(n) *
                sum(CASE WHEN ba * (n - ba) - n * h / 4 > 0
                  THEN h / n * (n * ma - ng * ba) * (n * ma - ng * ba) /
                    ng / (ba * (n - ba) - n * h / 4)
                  ELSE 0 END) AS a2
              FROM cum, t),
      ser AS (SELECT i, sum(1.0 / i) OVER (ORDER BY i) AS hh
              FROM (SELECT unnest(generate_series(1,
                (SELECT (n - 1)::BIGINT FROM t))) AS i)),
      hs AS (SELECT max(hh) AS hn FROM ser),
      gs AS (SELECT sum((hn - hh) / ((SELECT n FROM t) - i)) AS g2
             FROM ser, hs
             WHERE i <= (SELECT (n - 2)::BIGINT FROM t)),
      hh2 AS (SELECT sum(1.0 / ng) AS bigh FROM gt),
      v2 AS (SELECT n, k, hn, g2, bigh,
               (4 * g2 - 6) * (k - 1) + (10 - 6 * g2) * bigh AS va,
               (2 * g2 - 4) * k * k + 8 * hn * k +
                 (2 * g2 - 14 * hn - 4) * bigh - 8 * hn + 4 * g2 - 6
                 AS vb,
               (6 * hn + 2 * g2 - 2) * k * k +
                 (4 * hn - 4 * g2 + 6) * k + (2 * hn - 6) * bigh +
                 4 * hn AS vc2,
               (2 * hn + 6) * k * k - 4 * hn * k AS vd
             FROM t, hs, gs, hh2),
      sg AS (SELECT n, k,
               sqrt((va * n * n * n + vb * n * n + vc2 * n + vd) /
                 ((n - 1) * (n - 2) * (n - 3))) AS sigma
             FROM v2)
      SELECT n::BIGINT AS n, k::BIGINT AS n_groups,
             round(a2, 6) AS a2_stat, round(sigma, 6) AS sigma,
             round((a2 - (k - 1)) / sigma, 6) AS t_stat
      FROM a2c, sg"""))

  /** Quantile treatment effects: click − view value at the exact DISC
    * deciles — WHERE in the distribution the arms differ (a mean shift
    * and a tail shift read identically to a t-test). */
  private val q470 = Entry(
    "q470_qte",
    (s, d) => {
      val ps = Seq("p10" -> 0.1, "p25" -> 0.25, "p50" -> 0.5,
        "p75" -> 0.75, "p90" -> 0.9)
      val ev = Tables.events(s, d)
      def arm(a: String, tag: String) =
        AnalysisPlanner.exactPercentilesDisc(
          ev.where(col("event_type") === a), "value", ps, Nil)
          .select(ps.map { case (n, _) => col(n).as(s"${n}_$tag") }: _*)
      val nC = ev.where(col("event_type") === "view" &&
        col("value").isNotNull).agg(count(lit(1)).as("n_c"))
      val nT = ev.where(col("event_type") === "click" &&
        col("value").isNotNull).agg(count(lit(1)).as("n_t"))
      arm("view", "c").crossJoin(arm("click", "t"))
        .crossJoin(broadcast(nC)).crossJoin(broadcast(nT))
        .select(col("n_c") +: col("n_t") +: ps.map { case (n, _) =>
          r6(col(s"${n}_t") - col(s"${n}_c")).as(s"qte_$n") }: _*)
    },
    Some("""
      WITH c AS (SELECT quantile_disc("value", 0.1) AS p10,
              quantile_disc("value", 0.25) AS p25,
              quantile_disc("value", 0.5) AS p50,
              quantile_disc("value", 0.75) AS p75,
              quantile_disc("value", 0.9) AS p90,
              count("value")::BIGINT AS n_c
            FROM events WHERE event_type = 'view'),
      t AS (SELECT quantile_disc("value", 0.1) AS p10,
              quantile_disc("value", 0.25) AS p25,
              quantile_disc("value", 0.5) AS p50,
              quantile_disc("value", 0.75) AS p75,
              quantile_disc("value", 0.9) AS p90,
              count("value")::BIGINT AS n_t
            FROM events WHERE event_type = 'click')
      SELECT n_c, n_t,
             round(t.p10 - c.p10, 6) AS qte_p10,
             round(t.p25 - c.p25, 6) AS qte_p25,
             round(t.p50 - c.p50, 6) AS qte_p50,
             round(t.p75 - c.p75, 6) AS qte_p75,
             round(t.p90 - c.p90, 6) AS qte_p90
      FROM c, t"""))

  /** James–Stein shrinkage of per-event-type means: the
    * noise-proportional pull toward the pooled mean that keeps tiny
    * segments from topping ranked readouts. */
  private val q471 = Entry(
    "q471_james_stein",
    (s, d) =>
      AnalysisPlanner.jamesSteinMeans(Tables.events(s, d), "event_type",
          "value")
        .select(col("group_name"), col("n"),
          r6(col("raw_mean")).as("raw_mean"),
          r6(col("shrink_weight")).as("shrink_weight"),
          r6(col("shrunk_mean")).as("shrunk_mean"))
        .orderBy("group_name"),
    Some("""
      WITH g AS (SELECT event_type AS grp, count(*)::DOUBLE AS n,
              avg("value") AS m, sum("value") AS s,
              sum("value" * "value") AS q
            FROM events
            WHERE "value" IS NOT NULL AND event_type IS NOT NULL
            GROUP BY 1),
      t AS (SELECT count(*)::DOUBLE AS k, avg(m) AS gm,
              sum(q - s * s / n) / sum(n - 1) AS msw
            FROM g),
      ss AS (SELECT sum((m - gm) * (m - gm)) AS ss FROM g, t),
      z AS (SELECT grp, n, m, gm,
              CASE WHEN ss > 0 AND k > 3
                THEN greatest(0, 1 - (k - 3) * (msw / n) / ss)
                ELSE 1 END AS w
            FROM g, t, ss)
      SELECT grp AS group_name, n::BIGINT AS n, round(m, 6) AS raw_mean,
             round(w, 6) AS shrink_weight,
             round(gm + w * (m - gm), 6) AS shrunk_mean
      FROM z ORDER BY group_name"""))

  /** Box–Cox λ profile over order totals: which power transform makes
    * the revenue feature most Gaussian — the transform-selection scan
    * a feature pipeline runs before z-scoring a skewed column. */
  private val q472 = Entry(
    "q472_box_cox",
    (s, d) =>
      AnalysisPlanner.boxCoxScan(Tables.orders(s, d), "o_totalprice")
        .select(col("lambda"), col("n"), r6(col("loglik")).as("loglik"))
        .orderBy("lambda"),
    Some("""
      WITH a AS (SELECT count(*)::DOUBLE AS n, sum(ln(o_totalprice)) AS slx,
              sum((power(o_totalprice, -1.0) - 1) / (-1.0)) AS s0,
              sum(((power(o_totalprice, -1.0) - 1) / (-1.0)) *
                  ((power(o_totalprice, -1.0) - 1) / (-1.0))) AS q0,
              sum((power(o_totalprice, -0.5) - 1) / (-0.5)) AS s1,
              sum(((power(o_totalprice, -0.5) - 1) / (-0.5)) *
                  ((power(o_totalprice, -0.5) - 1) / (-0.5))) AS q1,
              sum(ln(o_totalprice)) AS s2,
              sum(ln(o_totalprice) * ln(o_totalprice)) AS q2,
              sum((power(o_totalprice, 0.5) - 1) / 0.5) AS s3,
              sum(((power(o_totalprice, 0.5) - 1) / 0.5) *
                  ((power(o_totalprice, 0.5) - 1) / 0.5)) AS q3,
              sum((power(o_totalprice, 1.0) - 1) / 1.0) AS s4,
              sum(((power(o_totalprice, 1.0) - 1) / 1.0) *
                  ((power(o_totalprice, 1.0) - 1) / 1.0)) AS q4
            FROM orders
            WHERE o_totalprice IS NOT NULL AND o_totalprice > 0)
      SELECT -1.0 AS lambda, n::BIGINT AS n,
             round(-0.5 * n * ln((q0 - s0 * s0 / n) / n) +
               (-1.0 - 1) * slx, 6) AS loglik FROM a
      UNION ALL SELECT -0.5, n::BIGINT,
             round(-0.5 * n * ln((q1 - s1 * s1 / n) / n) +
               (-0.5 - 1) * slx, 6) FROM a
      UNION ALL SELECT 0.0, n::BIGINT,
             round(-0.5 * n * ln((q2 - s2 * s2 / n) / n) +
               (0.0 - 1) * slx, 6) FROM a
      UNION ALL SELECT 0.5, n::BIGINT,
             round(-0.5 * n * ln((q3 - s3 * s3 / n) / n) +
               (0.5 - 1) * slx, 6) FROM a
      UNION ALL SELECT 1.0, n::BIGINT,
             round(-0.5 * n * ln((q4 - s4 * s4 / n) / n) +
               (1.0 - 1) * slx, 6) FROM a
      ORDER BY lambda"""))

  /** Two-sample Hotelling's T² on (quantity, discount) between return
    * flags — did the bivariate mean move in a way marginal t's miss? */
  private val q473 = Entry(
    "q473_hotelling_t2",
    (s, d) =>
      AnalysisPlanner.hotellingT2(Tables.lineitem(s, d), "l_quantity",
          "l_discount", "l_returnflag", a = "R", b = "N")
        .select(col("n_a"), col("n_b"),
          r6(col("mean_diff_x")).as("mean_diff_x"),
          r6(col("mean_diff_y")).as("mean_diff_y"),
          r6(col("t2_stat")).as("t2_stat"),
          r6(col("f_stat")).as("f_stat"), col("df1"), col("df2")),
    Some("""
      WITH m AS (SELECT
              sum(CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0 END) AS na,
              sum(CASE WHEN l_returnflag = 'N' THEN 1.0 ELSE 0 END) AS nb,
              sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END) AS sxa,
              sum(CASE WHEN l_returnflag = 'R' THEN l_discount END) AS sya,
              sum(CASE WHEN l_returnflag = 'R'
                THEN l_quantity * l_quantity END) AS sxxa,
              sum(CASE WHEN l_returnflag = 'R'
                THEN l_discount * l_discount END) AS syya,
              sum(CASE WHEN l_returnflag = 'R'
                THEN l_quantity * l_discount END) AS sxya,
              sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END) AS sxb,
              sum(CASE WHEN l_returnflag = 'N' THEN l_discount END) AS syb,
              sum(CASE WHEN l_returnflag = 'N'
                THEN l_quantity * l_quantity END) AS sxxb,
              sum(CASE WHEN l_returnflag = 'N'
                THEN l_discount * l_discount END) AS syyb,
              sum(CASE WHEN l_returnflag = 'N'
                THEN l_quantity * l_discount END) AS sxyb
            FROM lineitem
            WHERE l_returnflag IN ('R', 'N')
              AND l_quantity IS NOT NULL AND l_discount IS NOT NULL),
      z AS (SELECT na, nb, na + nb AS nn,
              ((sxxa - sxa * sxa / na) + (sxxb - sxb * sxb / nb)) /
                (na + nb - 2) AS sxx,
              ((syya - sya * sya / na) + (syyb - syb * syb / nb)) /
                (na + nb - 2) AS syy,
              ((sxya - sxa * sya / na) + (sxyb - sxb * syb / nb)) /
                (na + nb - 2) AS sxy,
              sxa / na - sxb / nb AS dx, sya / na - syb / nb AS dy
            FROM m),
      w AS (SELECT na, nb, nn, dx, dy,
              sxx * syy - sxy * sxy AS det,
              na * nb / nn * ((dx * (syy * dx - sxy * dy) +
                dy * (sxx * dy - sxy * dx)) /
                (sxx * syy - sxy * sxy)) AS t2
            FROM z)
      SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b,
             round(dx, 6) AS mean_diff_x, round(dy, 6) AS mean_diff_y,
             round(CASE WHEN det > 0 THEN t2 END, 6) AS t2_stat,
             round(CASE WHEN det > 0
               THEN (nn - 3) / ((nn - 2) * 2) * t2 END, 6) AS f_stat,
             2::BIGINT AS df1, (nn - 3)::BIGINT AS df2
      FROM w"""))

  /** Gopher gate-yield waterfall: marginal failures vs cumulative
    * survivorship per gate — which filter actually costs corpus. */
  private val q474 = Entry(
    "q474_filter_waterfall",
    (s, d) =>
      graft.ops.TextAnalysis
        .gateWaterfall(Tables.documents(s, d), "text")
        .select(col("gate_order"), col("gate"), col("n_fail_marginal"),
          col("n_pass_cumulative"),
          r6(col("yield_share")).as("yield_share"))
        .orderBy("gate_order"),
    Some("""
      WITH t AS (SELECT text, string_split(text, ' ') AS w
                 FROM documents WHERE text IS NOT NULL),
      p AS (SELECT
              (len(w) BETWEEN 20 AND 100000) AS g1,
              ((length(text) - (len(w) - 1)) / CAST(len(w) AS DOUBLE)
                BETWEEN 3.0 AND 10.0) AS g2,
              (len(list_intersect(list_distinct(w),
                ['the','a','of','and','to','in','is','that'])) >= 2)
                AS g3,
              (len(list_filter(w, x -> regexp_matches(x, '^[A-Za-z]+$')))
                / CAST(len(w) AS DOUBLE) >= 0.8) AS g4
            FROM t),
      a AS (SELECT count(*)::DOUBLE AS total,
              sum(CASE WHEN NOT g1 THEN 1 ELSE 0 END)::BIGINT AS f1,
              sum(CASE WHEN NOT g2 THEN 1 ELSE 0 END)::BIGINT AS f2,
              sum(CASE WHEN NOT g3 THEN 1 ELSE 0 END)::BIGINT AS f3,
              sum(CASE WHEN NOT g4 THEN 1 ELSE 0 END)::BIGINT AS f4,
              sum(CASE WHEN g1 THEN 1 ELSE 0 END)::BIGINT AS c1,
              sum(CASE WHEN g1 AND g2 THEN 1 ELSE 0 END)::BIGINT AS c2,
              sum(CASE WHEN g1 AND g2 AND g3 THEN 1 ELSE 0 END)::BIGINT
                AS c3,
              sum(CASE WHEN g1 AND g2 AND g3 AND g4 THEN 1 ELSE 0 END)
                ::BIGINT AS c4
            FROM p)
      SELECT 1 AS gate_order, 'word_count' AS gate, f1 AS n_fail_marginal,
             c1 AS n_pass_cumulative, round(c1 / total, 6) AS yield_share
      FROM a
      UNION ALL SELECT 2, 'mean_word_len', f2, c2, round(c2 / total, 6)
      FROM a
      UNION ALL SELECT 3, 'stopword_hits', f3, c3, round(c3 / total, 6)
      FROM a
      UNION ALL SELECT 4, 'alpha_frac', f4, c4, round(c4 / total, 6)
      FROM a
      ORDER BY gate_order"""))

  /** mSPRT always-valid A/B inference (click vs view, τ=0.5): the
    * peek-proof sequential p-value a running experiment reads daily. */
  private val q475 = Entry(
    "q475_msprt",
    (s, d) =>
      graft.ops.Evaluation.msprt(Tables.events(s, d), "event_type",
          "value", control = "view", treatment = "click", tau = 0.5)
        .select(col("n_c"), col("n_t"), r6(col("diff")).as("diff"),
          r6(col("se")).as("se"),
          r6(col("log_lambda")).as("log_lambda"),
          r6(col("always_valid_p")).as("always_valid_p")),
    Some("""
      WITH a AS (SELECT
              sum(CASE WHEN event_type = 'view' THEN 1.0 ELSE 0 END)
                AS na,
              sum(CASE WHEN event_type = 'click' THEN 1.0 ELSE 0 END)
                AS nb,
              sum(CASE WHEN event_type = 'view' THEN "value" END) AS sa,
              sum(CASE WHEN event_type = 'click' THEN "value" END) AS sb,
              sum(CASE WHEN event_type = 'view'
                THEN "value" * "value" END) AS qa,
              sum(CASE WHEN event_type = 'click'
                THEN "value" * "value" END) AS qb
            FROM events
            WHERE event_type IN ('view', 'click')
              AND "value" IS NOT NULL),
      z AS (SELECT na, nb, sb / nb - sa / na AS d,
              (qa - sa * sa / na) / (na - 1) / na +
              (qb - sb * sb / nb) / (nb - 1) / nb AS v
            FROM a),
      w AS (SELECT na, nb, d, v,
              0.5 * ln(v / (v + 0.25)) +
                d * d * 0.25 / (2 * v * (v + 0.25)) AS ll
            FROM z)
      SELECT na::BIGINT AS n_c, nb::BIGINT AS n_t, round(d, 6) AS diff,
             round(sqrt(v), 6) AS se, round(ll, 6) AS log_lambda,
             round(least(1.0, exp(-ll)), 6) AS always_valid_p
      FROM w"""))

  /** Gaussian Bayesian A/B decision panel: P(click beats view) and
    * both expected losses — the launch-decision numbers, Φ replayed
    * from the shared Abramowitz–Stegun polynomial. */
  private val q476 = Entry(
    "q476_gauss_ab_loss",
    (s, d) =>
      graft.ops.Evaluation.gaussianAbLoss(Tables.events(s, d),
          "event_type", "value", control = "view", treatment = "click")
        .select(col("n_c"), col("n_t"), r6(col("diff")).as("diff"),
          r6(col("se")).as("se"),
          r6(col("prob_t_beats_c")).as("prob_t_beats_c"),
          r6(col("exp_loss_choose_t")).as("exp_loss_choose_t"),
          r6(col("exp_loss_choose_c")).as("exp_loss_choose_c")),
    Some("""
      WITH a AS (SELECT
              sum(CASE WHEN event_type = 'view' THEN 1.0 ELSE 0 END)
                AS na,
              sum(CASE WHEN event_type = 'click' THEN 1.0 ELSE 0 END)
                AS nb,
              sum(CASE WHEN event_type = 'view' THEN "value" END) AS sa,
              sum(CASE WHEN event_type = 'click' THEN "value" END) AS sb,
              sum(CASE WHEN event_type = 'view'
                THEN "value" * "value" END) AS qa,
              sum(CASE WHEN event_type = 'click'
                THEN "value" * "value" END) AS qb
            FROM events
            WHERE event_type IN ('view', 'click')
              AND "value" IS NOT NULL),
      z AS (SELECT na, nb, sb / nb - sa / na AS d,
              sqrt((qa - sa * sa / na) / (na - 1) / na +
                   (qb - sb * sb / nb) / (nb - 1) / nb) AS se
            FROM a),
      g AS (SELECT na, nb, d, se, d / se AS zz, abs(d / se) AS az
            FROM z),
      h AS (SELECT *, exp(-az * az / 2) / sqrt(2 * pi()) AS pdf,
              1 / (1 + 0.2316419 * az) AS t
            FROM g),
      u AS (SELECT *, pdf * (t * (0.319381530 + t * (-0.356563782 +
              t * (1.781477937 + t * (-1.821255978 +
              t * 1.330274429))))) AS ut
            FROM h),
      f AS (SELECT *, CASE WHEN zz >= 0 THEN 1 - ut ELSE ut END AS phi
            FROM u)
      SELECT na::BIGINT AS n_c, nb::BIGINT AS n_t, round(d, 6) AS diff,
             round(se, 6) AS se, round(phi, 6) AS prob_t_beats_c,
             round(se * pdf - d * (1 - phi), 6) AS exp_loss_choose_t,
             round(se * pdf + d * phi, 6) AS exp_loss_choose_c
      FROM f"""))

  /** Split conformal interval around the quantity→price OLS fit:
    * distribution-free ≥90% coverage from the md5-half calibration
    * residual order statistic. */
  private val q477 = Entry(
    "q477_conformal",
    (s, d) =>
      graft.ops.Regression.splitConformal(Tables.lineitem(s, d),
          "l_quantity", "l_extendedprice", Seq("l_orderkey"),
          alpha = 0.1)
        .select(col("n_fit"), col("n_cal"),
          r6(col("intercept")).as("intercept"),
          r6(col("slope")).as("slope"), r6(col("q_hat")).as("q_hat"),
          round(col("coverage_cal"), 4).as("coverage_cal"),
          r6(col("interval_width")).as("interval_width")),
    Some("""
      WITH s AS (SELECT l_quantity::DOUBLE AS x,
              l_extendedprice::DOUBLE AS y,
              (('0x' || substring(md5(CAST(l_orderkey AS VARCHAR)),
                1, 15))::BIGINT % 1048576) AS b
            FROM lineitem
            WHERE l_quantity IS NOT NULL
              AND l_extendedprice IS NOT NULL),
      f AS (SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
              sum(x * x) AS sxx, sum(x * y) AS sxy
            FROM s WHERE b < 524288),
      co AS (SELECT n,
              (sxy - sx * sy / n) / (sxx - sx * sx / n) AS sl,
              sy / n - (sxy - sx * sy / n) / (sxx - sx * sx / n) *
                sx / n AS ic
            FROM f),
      r AS (SELECT abs(y - (ic + sl * x)) AS res
            FROM s, co WHERE b >= 524288),
      mm AS (SELECT count(*)::DOUBLE AS m FROM r),
      k AS (SELECT least(ceil((m + 1) * 0.9), m) AS kk, m FROM mm),
      o AS (SELECT res, row_number() OVER (ORDER BY res) AS rn FROM r),
      q AS (SELECT min(res) AS qh FROM o, k WHERE rn = kk),
      cov AS (SELECT sum(CASE WHEN res <= qh THEN 1 ELSE 0 END) /
                max(m) AS cv
              FROM r, q, mm)
      SELECT (SELECT n::BIGINT FROM f) AS n_fit,
             (SELECT m::BIGINT FROM mm) AS n_cal,
             round((SELECT ic FROM co), 6) AS intercept,
             round((SELECT sl FROM co), 6) AS slope,
             round(qh, 6) AS q_hat, round(cv, 4) AS coverage_cal,
             round(2 * qh, 6) AS interval_width
      FROM q, cov"""))

  /** Levene + Brown–Forsythe variance-homogeneity gate in one panel:
    * the ANOVA-assumption check, with the robust median-centered
    * variant beside the classic mean-centered W. Medians via the
    * exact-DISC grouped percentile machinery. */
  private val q478 = Entry(
    "q478_levene",
    (s, d) => {
      val ev = Tables.events(s, d)
      AnalysisPlanner.leveneTest(ev, "event_type", "value", "mean")
        .unionByName(
          AnalysisPlanner.leveneTest(ev, "event_type", "value", "median"))
        .select(col("center"), col("n"), col("n_groups"),
          r6(col("w_stat")).as("w_stat"), col("df1"), col("df2"))
        .orderBy("center")
    },
    Some("""
      WITH b AS (SELECT event_type AS g, "value"::DOUBLE AS x
                 FROM events
                 WHERE "value" IS NOT NULL AND event_type IS NOT NULL),
      cm AS (SELECT g, avg(x) AS c FROM b GROUP BY 1),
      cd AS (SELECT g, quantile_disc(x, 0.5) AS c FROM b GROUP BY 1),
      zm AS (SELECT 'mean' AS center, b.g, abs(x - c) AS z
             FROM b JOIN cm USING (g)
             UNION ALL
             SELECT 'median', b.g, abs(x - c) FROM b JOIN cd USING (g)),
      gm AS (SELECT center, g, count(*)::DOUBLE AS n, sum(z) AS s,
               sum(z * z) AS q
             FROM zm GROUP BY 1, 2),
      t AS (SELECT center, sum(n) AS nn, count(*)::DOUBLE AS k,
              sum(s) / sum(n) AS zz
            FROM gm GROUP BY 1)
      SELECT center, nn::BIGINT AS n, k::BIGINT AS n_groups,
             round((nn - k) / (k - 1) *
               sum(n * (s / n - zz) * (s / n - zz)) /
               sum(q - s * s / n), 6) AS w_stat,
             (k - 1)::BIGINT AS df1, (nn - k)::BIGINT AS df2
      FROM gm JOIN t USING (center)
      GROUP BY center, nn, k ORDER BY center"""))

  /** X̄ control chart (pooled σ) over daily event-value subgroups:
    * per-day means against center ± 3σ̂/√n_t. */
  private val q479 = Entry(
    "q479_xbar_chart",
    (s, d) =>
      graft.ops.Spc.xbarChart(Tables.events(s, d), "ts", "value")
        .select(col("day"), col("n"), r6(col("xbar")).as("xbar"),
          r6(col("center")).as("center"), r6(col("ucl")).as("ucl"),
          r6(col("lcl")).as("lcl"), col("out_of_control"))
        .orderBy("day"),
    Some("""
      WITH b AS (SELECT CAST(ts AS DATE) AS day, "value"::DOUBLE AS v
                 FROM events
                 WHERE ts IS NOT NULL AND "value" IS NOT NULL),
      d AS (SELECT day, count(*)::DOUBLE AS n, avg(v) AS m
            FROM b GROUP BY 1),
      t AS (SELECT avg(v) AS mu, stddev_samp(v) AS sg FROM b)
      SELECT day, n::BIGINT AS n, round(m, 6) AS xbar,
             round(mu, 6) AS center,
             round(mu + 3 * sg / sqrt(n), 6) AS ucl,
             round(mu - 3 * sg / sqrt(n), 6) AS lcl,
             (m > mu + 3 * sg / sqrt(n) OR m < mu - 3 * sg / sqrt(n))
               AS out_of_control
      FROM d, t ORDER BY day"""))

  /** Tabular CUSUM chart on standardized daily means (k=0.5, h=4):
    * driver recursion over the bounded day frame; oracle replays it
    * as a recursive CTE (the q459 Holt discipline). */
  private val q480 = Entry(
    "q480_cusum_chart",
    (s, d) =>
      graft.ops.Spc.cusumChart(Tables.events(s, d), "ts", "value")
        .select(col("day"), r6(col("z")).as("z"),
          r6(col("s_hi")).as("s_hi"), r6(col("s_lo")).as("s_lo"),
          col("signal"))
        .orderBy("day"),
    Some("""
      WITH RECURSIVE b AS (SELECT CAST(ts AS DATE) AS day,
              "value"::DOUBLE AS v
            FROM events
            WHERE ts IS NOT NULL AND "value" IS NOT NULL),
      d AS (SELECT day, count(*)::DOUBLE AS n, avg(v) AS m
            FROM b GROUP BY 1),
      t AS (SELECT avg(v) AS mu, stddev_samp(v) AS sg FROM b),
      seq AS (SELECT row_number() OVER (ORDER BY day) AS i, day,
                (m - mu) * sqrt(n) / sg AS z
              FROM d, t),
      rec AS (SELECT i, day, z, greatest(0, z - 0.5) AS shi,
                greatest(0, -z - 0.5) AS slo
              FROM seq WHERE i = 1
              UNION ALL
              SELECT s.i, s.day, s.z,
                     greatest(0, r.shi + s.z - 0.5),
                     greatest(0, r.slo - s.z - 0.5)
              FROM rec r JOIN seq s ON s.i = r.i + 1)
      SELECT day, round(z, 6) AS z, round(shi, 6) AS s_hi,
             round(slo, 6) AS s_lo, (shi > 4 OR slo > 4) AS signal
      FROM rec ORDER BY day"""))

  /** EWMA control chart (λ=0.2, L=3) on daily means with time-varying
    * limits — the small-shift detector between Shewhart and CUSUM. */
  private val q481 = Entry(
    "q481_ewma_chart",
    (s, d) =>
      graft.ops.Spc.ewmaChart(Tables.events(s, d), "ts", "value")
        .select(col("day"), r6(col("xbar")).as("xbar"),
          r6(col("ewma")).as("ewma"), r6(col("ucl")).as("ucl"),
          r6(col("lcl")).as("lcl"), col("out_of_control"))
        .orderBy("day"),
    Some("""
      WITH RECURSIVE b AS (SELECT CAST(ts AS DATE) AS day,
              "value"::DOUBLE AS v
            FROM events
            WHERE ts IS NOT NULL AND "value" IS NOT NULL),
      d AS (SELECT day, count(*)::DOUBLE AS n, avg(v) AS m
            FROM b GROUP BY 1),
      t AS (SELECT avg(v) AS mu, stddev_samp(v) AS sg FROM b),
      nb AS (SELECT avg(n) AS nbar FROM d),
      seq AS (SELECT row_number() OVER (ORDER BY day) AS i, day, m
              FROM d),
      rec AS (SELECT 1::BIGINT AS i,
                (SELECT day FROM seq WHERE i = 1) AS day,
                (SELECT m FROM seq WHERE i = 1) AS xbar,
                0.2 * (SELECT m FROM seq WHERE i = 1) + 0.8 * mu AS z
              FROM t
              UNION ALL
              SELECT s.i, s.day, s.m, 0.2 * s.m + 0.8 * r.z
              FROM rec r JOIN seq s ON s.i = r.i + 1)
      SELECT day, round(xbar, 6) AS xbar, round(z, 6) AS ewma,
             round(mu + 3 * sg / sqrt(nbar) *
               sqrt(0.2 / 1.8 * (1 - power(0.8, 2 * i))), 6) AS ucl,
             round(mu - 3 * sg / sqrt(nbar) *
               sqrt(0.2 / 1.8 * (1 - power(0.8, 2 * i))), 6) AS lcl,
             (z > mu + 3 * sg / sqrt(nbar) *
                sqrt(0.2 / 1.8 * (1 - power(0.8, 2 * i))) OR
              z < mu - 3 * sg / sqrt(nbar) *
                sqrt(0.2 / 1.8 * (1 - power(0.8, 2 * i)))) AS out_of_control
      FROM rec, t, nb ORDER BY day"""))

  /** Process capability of event value against spec [0, 250]:
    * Cp/Cpk plus the observed out-of-spec fractions (the
    * normality-free companion). */
  private val q482 = Entry(
    "q482_capability",
    (s, d) =>
      graft.ops.Spc.processCapability(Tables.events(s, d), "value",
          lsl = 0.0, usl = 250.0)
        .select(col("n"), r6(col("mean")).as("mean"),
          r6(col("stddev")).as("stddev"), r6(col("cp")).as("cp"),
          r6(col("cpk")).as("cpk"),
          round(col("frac_below"), 6).as("frac_below"),
          round(col("frac_above"), 6).as("frac_above")),
    Some("""
      SELECT count(*)::BIGINT AS n,
             round(avg("value"), 6) AS mean,
             round(stddev_samp("value"), 6) AS stddev,
             round(250.0 / (6 * stddev_samp("value")), 6) AS cp,
             round(least(250.0 - avg("value"), avg("value") - 0.0) /
               (3 * stddev_samp("value")), 6) AS cpk,
             round(avg(CASE WHEN "value" < 0 THEN 1.0 ELSE 0.0 END), 6)
               AS frac_below,
             round(avg(CASE WHEN "value" > 250 THEN 1.0 ELSE 0.0 END), 6)
               AS frac_above
      FROM events WHERE "value" IS NOT NULL"""))

  /** Theil-T within/between decomposition of revenue inequality by
    * return flag — WHERE the inequality lives; the decomposition is
    * an exact identity (total = within + between). */
  private val q483 = Entry(
    "q483_theil_decomp",
    (s, d) =>
      graft.ops.Profiling
        .theilDecomposition(Tables.lineitem(s, d), "l_returnflag",
          "l_extendedprice")
        .select(col("n"), col("n_groups"), r6(col("mean")).as("mean"),
          r6(col("theil_total")).as("theil_total"),
          r6(col("theil_within")).as("theil_within"),
          r6(col("theil_between")).as("theil_between")),
    Some("""
      WITH b AS (SELECT l_returnflag AS g, l_extendedprice::DOUBLE AS x
                 FROM lineitem
                 WHERE l_extendedprice > 0 AND l_returnflag IS NOT NULL),
      gm AS (SELECT g, count(*)::DOUBLE AS n, sum(x) AS s,
               sum(x * ln(x)) AS sxl
             FROM b GROUP BY 1),
      t AS (SELECT sum(n) AS tn, sum(s) AS ts, count(*)::BIGINT AS k
            FROM gm)
      SELECT tn::BIGINT AS n, k AS n_groups, round(ts / tn, 6) AS mean,
             round(sum(sxl) / ts - ln(ts / tn), 6) AS theil_total,
             round(sum(sxl / ts - (s / ts) * ln(s / n)), 6)
               AS theil_within,
             round(sum((s / ts) * ln((s / n) / (ts / tn))), 6)
               AS theil_between
      FROM gm, t GROUP BY tn, ts, k"""))

  /** Hoover (Robin Hood) index + Palma tail shares of revenue:
    * "what fraction of mass must move to equalize" plus top-10% vs
    * bottom-40% mass at exact-DISC value cuts. */
  private val q484 = Entry(
    "q484_hoover_palma",
    (s, d) =>
      graft.ops.Profiling
        .hooverPalma(Tables.lineitem(s, d), "l_extendedprice")
        .select(col("n"), r6(col("mean")).as("mean"),
          r6(col("hoover")).as("hoover"),
          r6(col("p40_cut")).as("p40_cut"),
          r6(col("p90_cut")).as("p90_cut"),
          r6(col("bottom40_share")).as("bottom40_share"),
          r6(col("top10_share")).as("top10_share"),
          r6(col("palma")).as("palma")),
    Some("""
      WITH b AS (SELECT l_extendedprice::DOUBLE AS x FROM lineitem
                 WHERE l_extendedprice > 0),
      c AS (SELECT quantile_disc(x, 0.4) AS p40,
                   quantile_disc(x, 0.9) AS p90 FROM b),
      m AS (SELECT avg(x) AS mu, sum(x) AS t, count(*)::DOUBLE AS n
            FROM b)
      SELECT n::BIGINT AS n, round(mu, 6) AS mean,
             round(sum(abs(x - mu)) / (n * mu * 2), 6) AS hoover,
             round(p40, 6) AS p40_cut, round(p90, 6) AS p90_cut,
             round(sum(CASE WHEN x <= p40 THEN x ELSE 0 END) / t, 6)
               AS bottom40_share,
             round(sum(CASE WHEN x > p90 THEN x ELSE 0 END) / t, 6)
               AS top10_share,
             round((sum(CASE WHEN x > p90 THEN x ELSE 0 END) / t) /
               (sum(CASE WHEN x <= p40 THEN x ELSE 0 END) / t), 6)
               AS palma
      FROM b, c, m GROUP BY n, mu, p40, p90, t"""))

  /** Bland–Altman agreement between net price and charged price (the
    * tax wedge as a method difference): bias, limits of agreement,
    * observed outside-fraction, proportional-bias screen. */
  private val q485 = Entry(
    "q485_bland_altman",
    (s, d) =>
      graft.ops.Profiling
        .blandAltman(
          Tables.lineitem(s, d)
            .withColumn("__a",
              col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .withColumn("__b",
              col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
                (lit(1.0) + col("l_tax"))),
          "__a", "__b")
        .select(col("n"), r6(col("bias")).as("bias"),
          r6(col("sd_diff")).as("sd_diff"),
          r6(col("loa_low")).as("loa_low"),
          r6(col("loa_high")).as("loa_high"),
          round(col("frac_outside"), 6).as("frac_outside"),
          r6(col("prop_bias_corr")).as("prop_bias_corr")),
    Some("""
      WITH p AS (SELECT (l_extendedprice * (1 - l_discount))::DOUBLE AS a,
                   (l_extendedprice * (1 - l_discount) *
                     (1 + l_tax))::DOUBLE AS bb
                 FROM lineitem WHERE l_extendedprice IS NOT NULL),
      d AS (SELECT a - bb AS dd, (a + bb) / 2 AS mm FROM p),
      s AS (SELECT count(*)::DOUBLE AS n, avg(dd) AS bias,
              stddev_samp(dd) AS sd, corr(dd, mm) AS pb
            FROM d)
      SELECT n::BIGINT AS n, round(bias, 6) AS bias,
             round(sd, 6) AS sd_diff,
             round(bias - 1.96 * sd, 6) AS loa_low,
             round(bias + 1.96 * sd, 6) AS loa_high,
             round(avg(CASE WHEN dd < bias - 1.96 * sd OR
               dd > bias + 1.96 * sd THEN 1.0 ELSE 0.0 END), 6)
               AS frac_outside,
             round(pb, 6) AS prop_bias_corr
      FROM d, s GROUP BY n, bias, sd, pb"""))

  /** White's heteroskedasticity test on price ~ quantity: the
    * specification-robust sibling of q340's Breusch–Pagan (the x²
    * auxiliary term catches non-linear variance growth). */
  private val q486 = Entry(
    "q486_white_test",
    (s, d) =>
      graft.ops.Regression
        .whiteTest(Tables.lineitem(s, d), "l_quantity",
          "l_extendedprice")
        .select(col("n"), r6(col("slope")).as("slope"),
          r6(col("intercept")).as("intercept"),
          r6(col("r2_aux")).as("r2_aux"),
          r6(col("lm_stat")).as("lm_stat"), col("df")),
    Some("""
      WITH b AS (SELECT l_quantity::DOUBLE AS x,
                        l_extendedprice::DOUBLE AS y
                 FROM lineitem
                 WHERE l_quantity IS NOT NULL
                   AND l_extendedprice IS NOT NULL),
      a AS (SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
                   sum(x * x) AS sxx, sum(x * y) AS sxy
            FROM b),
      f AS (SELECT n,
              (n * sxy - sx * sy) / (n * sxx - sx * sx) AS sl,
              (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
                AS ic
            FROM a),
      e AS (SELECT x, x * x AS w,
                   (y - ic - sl * x) * (y - ic - sl * x) AS e2
            FROM b, f),
      s AS (SELECT count(*)::DOUBLE AS n, sum(x) AS su, sum(w) AS sw,
                   sum(e2) AS se, sum(x * x) AS suu, sum(w * w) AS sww,
                   sum(x * w) AS suw, sum(x * e2) AS sue,
                   sum(w * e2) AS swe, sum(e2 * e2) AS see
            FROM e),
      c AS (SELECT n, suu - su * su / n AS cuu, sww - sw * sw / n AS cww,
                   suw - su * sw / n AS cuw, sue - su * se / n AS cue,
                   swe - sw * se / n AS cwe, see - se * se / n AS cee
            FROM s)
      SELECT c.n::BIGINT AS n, round(sl, 6) AS slope,
             round(ic, 6) AS intercept,
             round((cue * (cww * cue - cuw * cwe) +
                    cwe * (cuu * cwe - cuw * cue)) /
               (cuu * cww - cuw * cuw) / cee, 6) AS r2_aux,
             round(c.n * (cue * (cww * cue - cuw * cwe) +
                    cwe * (cuu * cwe - cuw * cue)) /
               (cuu * cww - cuw * cuw) / cee, 6) AS lm_stat,
             2::BIGINT AS df
      FROM c, f"""))

  /** Ramsey RESET on price ~ quantity: does adding the squared fitted
    * value buy explanatory power (missing curvature gate)? */
  private val q487 = Entry(
    "q487_reset_test",
    (s, d) =>
      graft.ops.Regression
        .resetTest(Tables.lineitem(s, d), "l_quantity",
          "l_extendedprice")
        .select(col("n"), r6(col("slope")).as("slope"),
          r6(col("intercept")).as("intercept"),
          round(col("rss1") / 1e9, 6).as("rss1_b"),
          round(col("rss2") / 1e9, 6).as("rss2_b"),
          r6(col("f_stat")).as("f_stat")),
    Some("""
      WITH b AS (SELECT l_quantity::DOUBLE AS x,
                        l_extendedprice::DOUBLE AS y
                 FROM lineitem
                 WHERE l_quantity IS NOT NULL
                   AND l_extendedprice IS NOT NULL),
      a AS (SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
                   sum(x * x) AS sxx, sum(x * y) AS sxy
            FROM b),
      f AS (SELECT n,
              (n * sxy - sx * sy) / (n * sxx - sx * sx) AS sl,
              (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
                AS ic
            FROM a),
      e AS (SELECT x, (ic + sl * x) * (ic + sl * x) AS z, y FROM b, f),
      s AS (SELECT count(*)::DOUBLE AS n, sum(x) AS su, sum(z) AS sw,
                   sum(y) AS se, sum(x * x) AS suu, sum(z * z) AS sww,
                   sum(x * z) AS suw, sum(x * y) AS sue,
                   sum(z * y) AS swe, sum(y * y) AS see
            FROM e),
      c AS (SELECT n, suu - su * su / n AS cuu, sww - sw * sw / n AS cww,
                   suw - su * sw / n AS cuw, sue - su * se / n AS cue,
                   swe - sw * se / n AS cwe, see - se * se / n AS cee
            FROM s),
      r AS (SELECT n, cee - cue * cue / cuu AS rss1,
                   cee - (cue * (cww * cue - cuw * cwe) +
                          cwe * (cuu * cwe - cuw * cue)) /
                     (cuu * cww - cuw * cuw) AS rss2
            FROM c)
      SELECT r.n::BIGINT AS n, round(sl, 6) AS slope,
             round(ic, 6) AS intercept,
             round(rss1 / 1e9, 6) AS rss1_b,
             round(rss2 / 1e9, 6) AS rss2_b,
             round((rss1 - rss2) / (rss2 / (r.n - 3)), 6) AS f_stat
      FROM r, f"""))

  /** Breusch–Godfrey lag-1 serial-correlation LM per event type on
    * the q273 daily-residual substrate — the regression-framework
    * upgrade of the Durbin–Watson readout. */
  private val q488 = Entry(
    "q488_breusch_godfrey",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum("value").as("y"))
        .withColumn("x",
          datediff(col("day"), lit("2024-01-01").cast("date"))
            .cast("double"))
      val fit = graft.ops.Regression
        .groupedOls(daily, Seq("event_type"), "x", "y")
        .select(col("event_type"), col("slope"), col("intercept"))
      val resid = daily.join(broadcast(fit), Seq("event_type"))
        .withColumn("resid",
          col("y") - (col("intercept") + col("slope") * col("x")))
      graft.ops.Regression
        .breuschGodfrey(resid, Seq("event_type"), "x", "resid")
        .select(col("event_type"), col("n"),
          r6(col("r2_aux")).as("r2_aux"),
          r6(col("lm_stat")).as("lm_stat"), col("df"))
        .orderBy("event_type")
    },
    Some("""
      WITH d AS (SELECT event_type AS g,
                        date_diff('day', DATE '2024-01-01',
                          ts::DATE)::DOUBLE AS x,
                        sum("value") AS y
                 FROM events GROUP BY event_type, ts::DATE),
      a AS (SELECT g, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                   sum(x * x) AS sxx, sum(x * y) AS sxy
            FROM d GROUP BY 1),
      f AS (SELECT g, (sxy - sx * sy / n) / (sxx - sx * sx / n) AS sl,
                   (sy - (sxy - sx * sy / n) / (sxx - sx * sx / n) * sx)
                     / n AS ic
            FROM a),
      e AS (SELECT d.g, d.x, d.y - (f.ic + f.sl * d.x) AS resid
            FROM d JOIN f USING (g)),
      w AS (SELECT g, x, resid,
                   lag(resid) OVER (PARTITION BY g ORDER BY x) AS pr
            FROM e),
      l AS (SELECT g, x AS u, pr AS v, resid AS ee FROM w
            WHERE pr IS NOT NULL),
      s AS (SELECT g, count(*)::DOUBLE AS n, sum(u) AS su, sum(v) AS sw,
                   sum(ee) AS se, sum(u * u) AS suu, sum(v * v) AS sww,
                   sum(u * v) AS suw, sum(u * ee) AS sue,
                   sum(v * ee) AS swe, sum(ee * ee) AS see
            FROM l GROUP BY 1),
      c AS (SELECT g, n, suu - su * su / n AS cuu,
                   sww - sw * sw / n AS cww, suw - su * sw / n AS cuw,
                   sue - su * se / n AS cue, swe - sw * se / n AS cwe,
                   see - se * se / n AS cee
            FROM s)
      SELECT g AS event_type, n::BIGINT AS n,
             round((cue * (cww * cue - cuw * cwe) +
                    cwe * (cuu * cwe - cuw * cue)) /
               (cuu * cww - cuw * cuw) / cee, 6) AS r2_aux,
             round(n * (cue * (cww * cue - cuw * cwe) +
                    cwe * (cuu * cwe - cuw * cue)) /
               (cuu * cww - cuw * cuw) / cee, 6) AS lm_stat,
             1::BIGINT AS df
      FROM c ORDER BY event_type"""))

  /** Holt–Winters additive weekly forecaster on daily event counts:
    * level+trend+season driver recursion over the bounded calendar
    * frame; the oracle carries the 7-element seasonal state as a
    * LIST through a recursive CTE. */
  private val q489 = Entry(
    "q489_holt_winters",
    (s, d) =>
      graft.ops.TimeSeries.holtWinters(Tables.events(s, d), "ts",
          alpha = 0.4, beta = 0.1, gamma = 0.2, period = 7, horizon = 7)
        .select(col("h"), col("n_days"), r6(col("level")).as("level"),
          r6(col("trend")).as("trend"),
          r6(col("seasonal")).as("seasonal"),
          r6(col("forecast")).as("forecast"), r2(col("sse")).as("sse"),
          r6(col("rmse")).as("rmse"))
        .orderBy("h"),
    Some("""
      WITH RECURSIVE days AS (SELECT CAST(ts AS DATE) AS day,
              count(*)::DOUBLE AS y
            FROM events WHERE ts IS NOT NULL GROUP BY 1),
      seq AS (SELECT row_number() OVER (ORDER BY day) AS i, y
              FROM days),
      m AS (SELECT (SELECT avg(y) FROM seq WHERE i <= 7) AS m1,
                   (SELECT avg(y) FROM seq WHERE i > 7 AND i <= 14)
                     AS m2),
      seed AS (SELECT (SELECT list(y - m.m1 ORDER BY i) FROM seq
                       WHERE i <= 7) AS s0
               FROM m),
      rec AS (
        SELECT 7::BIGINT AS t, m1 AS level, (m2 - m1) / 7 AS trend,
               s0 AS s, CAST(0.0 AS DOUBLE) AS sse
        FROM m, seed
        UNION ALL
        SELECT r.t + 1,
               0.4 * (q.y - r.s[1]) + 0.6 * (r.level + r.trend),
               0.1 * ((0.4 * (q.y - r.s[1]) +
                 0.6 * (r.level + r.trend)) - r.level) + 0.9 * r.trend,
               list_append(r.s[2:7],
                 0.2 * (q.y - (0.4 * (q.y - r.s[1]) +
                   0.6 * (r.level + r.trend))) + 0.8 * r.s[1]),
               r.sse + (q.y - (r.level + r.trend + r.s[1])) *
                 (q.y - (r.level + r.trend + r.s[1]))
        FROM rec r JOIN seq q ON q.i = r.t + 1),
      fin AS (SELECT * FROM rec ORDER BY t DESC LIMIT 1),
      n AS (SELECT count(*)::BIGINT AS nd FROM seq)
      SELECT h::BIGINT AS h, nd AS n_days, round(level, 6) AS level,
             round(trend, 6) AS trend,
             round(s[h], 6) AS seasonal,
             round(level + h * trend + s[h], 6) AS forecast,
             round(sse, 2) AS sse,
             round(sqrt(sse / (nd - 7)), 6) AS rmse
      FROM (SELECT unnest(generate_series(1, 7)) AS h), fin, n
      ORDER BY h"""))

  /** Croston's intermittent-demand forecast on rare high-value
    * events (daily count of value > 300): demand-size and interval
    * smoothers + SBA bias-corrected rate. */
  private val q490 = Entry(
    "q490_croston",
    (s, d) =>
      graft.ops.TimeSeries.croston(Tables.events(s, d), "ts",
          col("value") > 300, alpha = 0.1)
        .select(col("n_days"), col("n_demand_days"),
          r6(col("z_hat")).as("z_hat"), r6(col("p_hat")).as("p_hat"),
          r6(col("forecast")).as("forecast"),
          r6(col("forecast_sba")).as("forecast_sba")),
    Some("""
      WITH RECURSIVE days AS (SELECT CAST(ts AS DATE) AS day,
              sum(CASE WHEN "value" > 300
                THEN 1.0 ELSE 0.0 END)::DOUBLE AS y
            FROM events WHERE ts IS NOT NULL GROUP BY 1),
      seq AS (SELECT row_number() OVER (ORDER BY day) AS i, y
              FROM days),
      f AS (SELECT min(i) AS i0 FROM seq WHERE y > 0),
      rec AS (
        SELECT s.i AS t, s.y AS z, f.i0::DOUBLE AS p, 0::BIGINT AS gap,
               1::BIGINT AS nd
        FROM seq s, f WHERE s.i = f.i0
        UNION ALL
        SELECT s.i,
               CASE WHEN s.y > 0 THEN 0.1 * s.y + 0.9 * r.z
                    ELSE r.z END,
               CASE WHEN s.y > 0 THEN 0.1 * (r.gap + 1) + 0.9 * r.p
                    ELSE r.p END,
               CASE WHEN s.y > 0 THEN 0 ELSE r.gap + 1 END,
               r.nd + CASE WHEN s.y > 0 THEN 1 ELSE 0 END
        FROM rec r JOIN seq s ON s.i = r.t + 1),
      fin AS (SELECT * FROM rec ORDER BY t DESC LIMIT 1),
      n AS (SELECT count(*)::BIGINT AS ndays FROM seq)
      SELECT ndays AS n_days, nd AS n_demand_days,
             round(z, 6) AS z_hat, round(p, 6) AS p_hat,
             round(z / p, 6) AS forecast,
             round(z / p * 0.95, 6) AS forecast_sba
      FROM fin, n"""))

  /** Gains / KS score-separation decile table of event value against
    * the user_id%5 positive class: per-decile capture, cumulative
    * gains, lift, and the KS separation profile. */
  private val q491 = Entry(
    "q491_gains_table",
    (s, d) =>
      graft.ops.Evaluation
        .gainsTable(Tables.events(s, d), "value",
          col("user_id") % 5 === 0)
        .select(col("decile"), col("n"), col("n_pos"),
          r6(col("pos_rate")).as("pos_rate"),
          r6(col("cum_n_share")).as("cum_n_share"),
          r6(col("cum_pos_share")).as("cum_pos_share"),
          r6(col("lift")).as("lift"), r6(col("ks_at")).as("ks_at"))
        .orderBy("decile"),
    Some("""
      WITH b AS (SELECT "value"::DOUBLE AS x,
              CASE WHEN user_id % 5 = 0 THEN 1.0 ELSE 0.0 END AS y
            FROM events WHERE "value" IS NOT NULL),
      c AS (SELECT quantile_disc(x, 0.1) AS q1,
              quantile_disc(x, 0.2) AS q2, quantile_disc(x, 0.3) AS q3,
              quantile_disc(x, 0.4) AS q4, quantile_disc(x, 0.5) AS q5,
              quantile_disc(x, 0.6) AS q6, quantile_disc(x, 0.7) AS q7,
              quantile_disc(x, 0.8) AS q8, quantile_disc(x, 0.9) AS q9
            FROM b),
      dd AS (SELECT 10 - ((CASE WHEN x > q1 THEN 1 ELSE 0 END) +
               (CASE WHEN x > q2 THEN 1 ELSE 0 END) +
               (CASE WHEN x > q3 THEN 1 ELSE 0 END) +
               (CASE WHEN x > q4 THEN 1 ELSE 0 END) +
               (CASE WHEN x > q5 THEN 1 ELSE 0 END) +
               (CASE WHEN x > q6 THEN 1 ELSE 0 END) +
               (CASE WHEN x > q7 THEN 1 ELSE 0 END) +
               (CASE WHEN x > q8 THEN 1 ELSE 0 END) +
               (CASE WHEN x > q9 THEN 1 ELSE 0 END)) AS decile, y
            FROM b, c),
      per AS (SELECT decile, count(*)::DOUBLE AS n, sum(y) AS p
              FROM dd GROUP BY 1),
      t AS (SELECT sum(n) AS tn, sum(p) AS tp FROM per),
      w AS (SELECT decile, n, p,
                   sum(n) OVER (ORDER BY decile) AS cn,
                   sum(p) OVER (ORDER BY decile) AS cp
            FROM per)
      SELECT decile::BIGINT AS decile, n::BIGINT AS n,
             p::BIGINT AS n_pos, round(p / n, 6) AS pos_rate,
             round(cn / tn, 6) AS cum_n_share,
             round(cp / tp, 6) AS cum_pos_share,
             round((cp / tp) / (cn / tn), 6) AS lift,
             round(abs(cp / tp - (cn - cp) / (tn - tp)), 6) AS ks_at
      FROM w, t ORDER BY decile"""))

  /** Simplified (centroid) silhouette per embedding label: compact-
    * and-separated clustering quality at O(n·k) — per-label averages
    * only (engine-replayable; per-point argmin is not). */
  private val q492 = Entry(
    "q492_silhouette",
    (s, d) =>
      graft.ops.Similarity
        .simplifiedSilhouette(Tables.embeddings(s, d), "vec_id",
          "label", "embedding")
        .select(col("label"), col("n"),
          r6(col("mean_silhouette")).as("mean_silhouette"),
          r6(col("mean_own_dist")).as("mean_own_dist"),
          r6(col("mean_other_dist")).as("mean_other_dist"))
        .orderBy("label"),
    Some("""
      WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
                 FROM embeddings
                 WHERE embedding IS NOT NULL AND label IS NOT NULL),
      pos AS (SELECT label, u.i AS i, v[u.i] AS x
              FROM e, unnest(generate_series(1, len(v))) AS u(i)),
      cent AS (SELECT label AS clbl, list(c ORDER BY i) AS cl
               FROM (SELECT label, i, avg(x) AS c FROM pos GROUP BY 1, 2)
               GROUP BY 1),
      ab AS (SELECT e.vec_id, e.label,
               min(CASE WHEN c.clbl = e.label THEN
                 1 - list_dot_product(e.v, c.cl) /
                   (sqrt(list_dot_product(e.v, e.v)) *
                    sqrt(list_dot_product(c.cl, c.cl))) END) AS a,
               min(CASE WHEN c.clbl <> e.label THEN
                 1 - list_dot_product(e.v, c.cl) /
                   (sqrt(list_dot_product(e.v, e.v)) *
                    sqrt(list_dot_product(c.cl, c.cl))) END) AS b
             FROM e CROSS JOIN cent c GROUP BY 1, 2)
      SELECT label, count(*)::BIGINT AS n,
             round(avg((b - a) / greatest(a, b)), 6) AS mean_silhouette,
             round(avg(a), 6) AS mean_own_dist,
             round(avg(b), 6) AS mean_other_dist
      FROM ab WHERE a IS NOT NULL AND b IS NOT NULL
      GROUP BY 1 ORDER BY label"""))

  /** Laspeyres / Paasche / Fisher price indices for parts between the
    * pre-1998 base period and the rest — matched-sample bilateral
    * index panel with quantity-weighted unit prices. */
  private val q493 = Entry(
    "q493_price_indices",
    (s, d) =>
      graft.ops.Profiling
        .priceIndices(Tables.lineitem(s, d), "l_partkey", "l_quantity",
          "l_extendedprice",
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("n_items"), col("n_dropped"),
          r6(col("laspeyres")).as("laspeyres"),
          r6(col("paasche")).as("paasche"),
          r6(col("fisher")).as("fisher"),
          r6(col("value_ratio")).as("value_ratio")),
    Some("""
      WITH b AS (SELECT l_partkey AS it,
              CASE WHEN l_shipdate < TIMESTAMP '1998-01-01'
                   THEN 1.0 ELSE 0.0 END AS base,
              l_quantity::DOUBLE AS q, l_extendedprice::DOUBLE AS r
            FROM lineitem
            WHERE l_partkey IS NOT NULL AND l_quantity > 0
              AND l_extendedprice IS NOT NULL),
      per AS (SELECT it, sum(base * q) AS q0, sum(base * r) AS r0,
               sum((1 - base) * q) AS q1, sum((1 - base) * r) AS r1
             FROM b GROUP BY 1),
      m AS (SELECT sum(CASE WHEN q0 > 0 AND q1 > 0 THEN 1 ELSE 0 END)
               ::BIGINT AS n_items,
             sum(CASE WHEN q0 > 0 AND q1 > 0 THEN 0 ELSE 1 END)
               ::BIGINT AS n_dropped,
             sum(CASE WHEN q0 > 0 AND q1 > 0
                 THEN (r1 / q1) * q0 END) AS lnum,
             sum(CASE WHEN q0 > 0 AND q1 > 0
                 THEN (r0 / q0) * q0 END) AS lden,
             sum(CASE WHEN q0 > 0 AND q1 > 0
                 THEN (r1 / q1) * q1 END) AS pnum,
             sum(CASE WHEN q0 > 0 AND q1 > 0
                 THEN (r0 / q0) * q1 END) AS pden,
             sum(CASE WHEN q0 > 0 AND q1 > 0 THEN r1 END) AS v1,
             sum(CASE WHEN q0 > 0 AND q1 > 0 THEN r0 END) AS v0
            FROM per)
      SELECT n_items, n_dropped,
             round(lnum / lden, 6) AS laspeyres,
             round(pnum / pden, 6) AS paasche,
             round(sqrt(lnum / lden * (pnum / pden)), 6) AS fisher,
             round(v1 / v0, 6) AS value_ratio
      FROM m"""))

  /** Extended association-rule metric panel on the q163 pairs:
    * conviction (directional expected-failure ratio), leverage
    * (additive lift), jaccard (co-basket union share). */
  private val q494 = Entry(
    "q494_rule_metrics",
    (s, d) =>
      graft.ops.Associations
        .pairRules(Tables.lineitem(s, d), "l_orderkey", "l_suppkey",
          minPairCount = 5)
        .select(col("item_a"), col("item_b"), col("n_pair"),
          r6(col("conviction_a_b")).as("conviction_a_b"),
          // leverage is a difference of products that can round to a
          // signed zero; +0.0 canonicalizes -0.0 → +0.0 (IEEE) so the
          // byte-level hash gate matches the oracle's `+ 0` twin.
          (r6(col("leverage")) + lit(0.0)).as("leverage"),
          r6(col("jaccard")).as("jaccard"))
        .orderBy("item_a", "item_b"),
    Some("""
      WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_suppkey AS it
                 FROM lineitem),
      nb AS (SELECT count(DISTINCT bk)::DOUBLE AS n FROM b),
      ic AS (SELECT it, count(*)::DOUBLE AS ni FROM b GROUP BY 1),
      pr AS (SELECT l.it AS item_a, r.it AS item_b,
               count(*)::DOUBLE AS np
             FROM b l JOIN b r ON l.bk = r.bk AND l.it < r.it
             GROUP BY 1, 2 HAVING count(*) >= 5)
      SELECT item_a, item_b, np::BIGINT AS n_pair,
             round(CASE WHEN np < a.ni THEN
               (1 - bb.ni / n) / (1 - np / a.ni) END, 6)
               AS conviction_a_b,
             round(np / n - a.ni * bb.ni / (n * n), 6) + 0 AS leverage,
             round(np / (a.ni + bb.ni - np), 6) AS jaccard
      FROM pr JOIN ic a ON item_a = a.it JOIN ic bb ON item_b = bb.it
      CROSS JOIN nb
      ORDER BY item_a, item_b"""))

  /** p-chart of the daily error-event rate: attribute control chart
    * with per-day √(p̄(1−p̄)/n) limits. */
  private val q495 = Entry(
    "q495_p_chart",
    (s, d) =>
      graft.ops.Spc.pChart(Tables.events(s, d), "ts",
          col("event_type") === "error")
        .select(col("day"), col("n"), col("n_defect"),
          r6(col("p")).as("p"), r6(col("center")).as("center"),
          r6(col("ucl")).as("ucl"), r6(col("lcl")).as("lcl"),
          col("out_of_control"))
        .orderBy("day"),
    Some("""
      WITH d AS (SELECT CAST(ts AS DATE) AS day,
              count(*)::DOUBLE AS n,
              sum(CASE WHEN event_type = 'error' THEN 1.0 ELSE 0.0 END)
                AS dd
            FROM events WHERE ts IS NOT NULL GROUP BY 1),
      t AS (SELECT sum(dd) / sum(n) AS pbar FROM d)
      SELECT day, n::BIGINT AS n, dd::BIGINT AS n_defect,
             round(dd / n, 6) AS p, round(pbar, 6) AS center,
             round(least(pbar + 3 * sqrt(pbar * (1 - pbar) / n), 1), 6)
               AS ucl,
             round(greatest(pbar - 3 * sqrt(pbar * (1 - pbar) / n), 0), 6)
               AS lcl,
             (dd / n > least(pbar + 3 * sqrt(pbar * (1 - pbar) / n), 1)
              OR dd / n <
                greatest(pbar - 3 * sqrt(pbar * (1 - pbar) / n), 0))
               AS out_of_control
      FROM d, t ORDER BY day"""))

  /** c-chart of daily extreme-value incident counts (value > 400)
    * under Poisson ±3√c̄ limits. */
  private val q496 = Entry(
    "q496_c_chart",
    (s, d) =>
      graft.ops.Spc.cChart(Tables.events(s, d), "ts",
          col("value") > 400)
        .select(col("day"), col("c"), r6(col("center")).as("center"),
          r6(col("ucl")).as("ucl"), r6(col("lcl")).as("lcl"),
          col("out_of_control"))
        .orderBy("day"),
    Some("""
      WITH d AS (SELECT CAST(ts AS DATE) AS day,
              sum(CASE WHEN "value" > 400 THEN 1.0 ELSE 0.0 END) AS c
            FROM events WHERE ts IS NOT NULL GROUP BY 1),
      t AS (SELECT avg(c) AS cbar FROM d)
      SELECT day, c::BIGINT AS c, round(cbar, 6) AS center,
             round(cbar + 3 * sqrt(cbar), 6) AS ucl,
             round(greatest(cbar - 3 * sqrt(cbar), 0), 6) AS lcl,
             (c > cbar + 3 * sqrt(cbar) OR
              c < greatest(cbar - 3 * sqrt(cbar), 0)) AS out_of_control
      FROM d, t ORDER BY day"""))

  /** Empirical-Bayes beta-binomial shrinkage of per-segment
    * high-value rates: MoM Beta prior from the observed rate spread,
    * posterior-mean smoothing of the 50 user segments. */
  private val q497 = Entry(
    "q497_eb_rates",
    (s, d) =>
      AnalysisPlanner.ebBetaBinomialRates(
          Tables.events(s, d).withColumn("seg", col("user_id") % 50),
          "seg", col("value") > 300)
        .select(col("group_name"), col("n"), col("successes"),
          r6(col("raw_rate")).as("raw_rate"), r6(col("alpha")).as("alpha"),
          r6(col("beta")).as("beta"),
          r6(col("shrunk_rate")).as("shrunk_rate"))
        .orderBy("group_name"),
    Some("""
      WITH g AS (SELECT (user_id % 50)::VARCHAR AS gn,
              count(*)::DOUBLE AS n,
              sum(CASE WHEN "value" > 300 THEN 1.0 ELSE 0.0 END) AS x
            FROM events GROUP BY 1),
      p AS (SELECT count(*) AS k, avg(x / n) AS pm,
              var_samp(x / n) AS pv
            FROM g),
      m AS (SELECT pm, CASE WHEN k > 1 AND pv > 0
                  THEN pm * (1 - pm) / pv - 1 END AS mm
            FROM p)
      SELECT gn AS group_name, n::BIGINT AS n, x::BIGINT AS successes,
             round(x / n, 6) AS raw_rate,
             round(CASE WHEN mm > 0 THEN pm * mm END, 6) AS alpha,
             round(CASE WHEN mm > 0 THEN (1 - pm) * mm END, 6) AS beta,
             round(CASE WHEN mm > 0 THEN (pm * mm + x) / (mm + n)
                   ELSE x / n END, 6) AS shrunk_rate
      FROM g, m ORDER BY group_name"""))

  /** Chapman capture–recapture: estimate the distinct-user population
    * from the overlap of the two month halves — the dedup/traffic
    * audit estimator, checked against the observed union. */
  private val q498 = Entry(
    "q498_capture_recapture",
    (s, d) =>
      graft.ops.Sampling.captureRecapture(Tables.events(s, d),
          "user_id",
          col("ts") < lit("2024-01-16").cast("timestamp"),
          col("ts") >= lit("2024-01-16").cast("timestamp"))
        .select(col("n_a"), col("n_b"), col("n_overlap"),
          col("n_observed"), r6(col("chapman")).as("chapman"),
          r6(col("se")).as("se")),
    Some("""
      WITH per AS (SELECT user_id,
              max(CASE WHEN ts < TIMESTAMP '2024-01-16'
                  THEN 1.0 ELSE 0.0 END) AS a,
              max(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                  THEN 1.0 ELSE 0.0 END) AS b
            FROM events WHERE user_id IS NOT NULL GROUP BY 1),
      f AS (SELECT * FROM per WHERE a > 0 OR b > 0),
      s AS (SELECT sum(a) AS n1, sum(b) AS n2, sum(a * b) AS m,
              count(*)::BIGINT AS no
            FROM f)
      SELECT n1::BIGINT AS n_a, n2::BIGINT AS n_b,
             m::BIGINT AS n_overlap, no AS n_observed,
             round((n1 + 1) * (n2 + 1) / (m + 1) - 1, 6) AS chapman,
             round(sqrt((n1 + 1) * (n2 + 1) * (n1 - m) * (n2 - m) /
               ((m + 1) * (m + 1) * (m + 2))), 6) AS se
      FROM s"""))

  /** Good–Turing unseen-mass + Chao1 vocabulary-richness estimates
    * from the corpus frequency-of-frequencies profile. */
  private val q499 = Entry(
    "q499_vocab_richness",
    (s, d) =>
      graft.ops.TextAnalysis.vocabRichness(Tables.documents(s, d),
          "text")
        .select(col("n_tokens"), col("vocab"), col("singletons"),
          col("doubletons"), r6(col("p_unseen")).as("p_unseen"),
          r6(col("coverage")).as("coverage"),
          r6(col("chao1")).as("chao1")),
    Some("""
      WITH tf AS (SELECT w, count(*)::DOUBLE AS c
                  FROM (SELECT unnest(string_split(text, ' ')) AS w
                        FROM documents WHERE text IS NOT NULL)
                  WHERE w <> '' GROUP BY 1)
      SELECT sum(c)::BIGINT AS n_tokens, count(*)::BIGINT AS vocab,
             sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT
               AS singletons,
             sum(CASE WHEN c = 2 THEN 1 ELSE 0 END)::BIGINT
               AS doubletons,
             round(sum(CASE WHEN c = 1 THEN 1.0 ELSE 0 END) / sum(c), 6)
               AS p_unseen,
             round(1 - sum(CASE WHEN c = 1 THEN 1.0 ELSE 0 END) /
               sum(c), 6) AS coverage,
             round(count(*) +
               power(sum(CASE WHEN c = 1 THEN 1.0 ELSE 0 END), 2) /
               (2 * sum(CASE WHEN c = 2 THEN 1.0 ELSE 0 END)), 6)
               AS chao1
      FROM tf"""))

  /** GPD peaks-over-threshold fit above the exact p95 of event value:
    * MoM ξ/σ + observation-horizon return levels — the every-extreme
    * EVT companion to q461's Gumbel block maxima. */
  private val q500 = Entry(
    "q500_gpd_pot",
    (s, d) =>
      graft.ops.TimeSeries.gpdPotFit(Tables.events(s, d), "value",
          thresholdQ = 0.95, returnPeriods = Seq(1000, 10000, 100000))
        .select(col("t_period"), r6(col("threshold")).as("threshold"),
          col("n_exceed"), r6(col("exceed_rate")).as("exceed_rate"),
          r6(col("xi")).as("xi"), r6(col("sigma")).as("sigma"),
          r6(col("return_level")).as("return_level"))
        .orderBy("t_period"),
    Some("""
      WITH b AS (SELECT "value"::DOUBLE AS x FROM events
                 WHERE "value" IS NOT NULL),
      u AS (SELECT quantile_disc(x, 0.95) AS uu FROM b),
      m AS (SELECT count(*)::DOUBLE AS n,
              sum(CASE WHEN x > uu THEN 1.0 ELSE 0 END) AS ne,
              avg(CASE WHEN x > uu THEN x - uu END) AS mm,
              var_samp(CASE WHEN x > uu THEN x - uu END) AS s2
            FROM b, u),
      p AS (SELECT uu, n, ne, mm, s2, mm * mm / s2 AS r FROM m, u)
      SELECT t AS t_period, round(uu, 6) AS threshold,
             ne::BIGINT AS n_exceed, round(ne / n, 6) AS exceed_rate,
             round((1 - r) / 2, 6) AS xi,
             round(mm * (r + 1) / 2, 6) AS sigma,
             round(CASE WHEN abs((1 - r) / 2) > 1e-9
               THEN uu + (mm * (r + 1) / 2) / ((1 - r) / 2) *
                 (power(ne / n * t, (1 - r) / 2) - 1)
               ELSE uu + mm * (r + 1) / 2 * ln(ne / n * t) END, 6)
               AS return_level
      FROM (SELECT unnest([1000, 10000, 100000]) AS t), p
      ORDER BY t_period"""))

  /** Post-stratification of event value to a declared event-type mix:
    * per-stratum reweighting, post-stratified mean, and Kish ESS
    * pricing the variance cost. */
  private val q501 = Entry(
    "q501_post_stratify",
    (s, d) =>
      graft.ops.Sampling.postStratify(Tables.events(s, d),
          "event_type", "value",
          Map("click" -> 0.3, "view" -> 0.3, "purchase" -> 0.2,
            "signup" -> 0.1, "error" -> 0.1))
        .select(col("n"), col("n_used"), col("n_strata"),
          r6(col("raw_mean")).as("raw_mean"),
          r6(col("post_mean")).as("post_mean"), r6(col("ess")).as("ess")),
    Some("""
      WITH g AS (SELECT event_type AS gg, count(*)::DOUBLE AS n,
              sum("value") AS s
            FROM events
            WHERE "value" IS NOT NULL AND event_type IS NOT NULL
            GROUP BY 1),
      tm AS (SELECT gg, n, s,
               CASE gg WHEN 'click' THEN 0.3 WHEN 'view' THEN 0.3
                 WHEN 'purchase' THEN 0.2 WHEN 'signup' THEN 0.1
                 WHEN 'error' THEN 0.1 END AS t
             FROM g),
      tt AS (SELECT sum(n) AS tn, sum(s) AS ts FROM g),
      w AS (SELECT tm.*, tn, ts, t / (n / tn) AS wt FROM tm, tt)
      SELECT max(tn)::BIGINT AS n,
             sum(CASE WHEN t IS NOT NULL THEN n ELSE 0 END)::BIGINT
               AS n_used,
             sum(CASE WHEN t IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
               AS n_strata,
             round(max(ts) / max(tn), 6) AS raw_mean,
             round(sum(CASE WHEN t IS NOT NULL THEN t * s / n END), 6)
               AS post_mean,
             round(power(sum(CASE WHEN t IS NOT NULL
                 THEN wt * n END), 2) /
               sum(CASE WHEN t IS NOT NULL THEN wt * wt * n END), 6)
               AS ess
      FROM w"""))

  /** Drawdown profile of each event type's daily-value curve treated
    * as a level series: running-peak drawdown, longest underwater
    * spell, underwater fraction. Daily sums are rounded to 6 decimals
    * on BOTH engines before the peak comparison so float summation
    * order can't flip a flag. */
  private val q502 = Entry(
    "q502_drawdown",
    (s, d) =>
      graft.ops.Risk.drawdown(Tables.events(s, d), "event_type", "ts",
          "value")
        .select(col("event_type"), col("n_days"),
          r6(col("peak_value")).as("peak_value"),
          r6(col("max_drawdown")).as("max_drawdown"),
          col("longest_underwater"),
          r6(col("frac_underwater")).as("frac_underwater"))
        .orderBy("event_type"),
    Some("""
      WITH d AS (SELECT event_type AS g, date_trunc('day', ts) AS day,
                   round(sum("value"), 6) AS v
                 FROM events
                 WHERE "value" IS NOT NULL AND ts IS NOT NULL
                   AND event_type IS NOT NULL
                 GROUP BY 1, 2),
      r AS (SELECT g, day, v, max(v) OVER (PARTITION BY g ORDER BY day
              ROWS UNBOUNDED PRECEDING) AS rm FROM d),
      f AS (SELECT g, day, v, rm,
              CASE WHEN rm > 0 THEN 1 - v / rm ELSE 0 END AS dd,
              CASE WHEN v >= rm THEN 1 ELSE 0 END AS pk FROM r),
      i AS (SELECT *, sum(pk) OVER (PARTITION BY g ORDER BY day
              ROWS UNBOUNDED PRECEDING) AS isl FROM f),
      runs AS (SELECT g, isl, sum(1 - pk) AS uw FROM i GROUP BY 1, 2),
      mu AS (SELECT g, max(uw) AS lu FROM runs GROUP BY 1)
      SELECT i.g AS event_type, count(*)::BIGINT AS n_days,
             round(max(v), 6) AS peak_value,
             round(max(dd), 6) AS max_drawdown,
             max(mu.lu)::BIGINT AS longest_underwater,
             round(avg(1.0 - pk), 6) AS frac_underwater
      FROM i JOIN mu ON mu.g = i.g GROUP BY 1 ORDER BY 1"""))

  /** Risk-adjusted daily-return panel per event type: Sharpe, Sortino
    * (full-sample downside deviation), win rate, best/worst day — the
    * equity-curve companion to q502's level-series drawdown. */
  private val q503 = Entry(
    "q503_risk_adjusted",
    (s, d) =>
      graft.ops.Risk.riskAdjusted(Tables.events(s, d), "event_type",
          "ts", "value")
        .select(col("event_type"), col("n_ret"),
          r6(col("mean_ret")).as("mean_ret"),
          r6(col("sd_ret")).as("sd_ret"),
          r6(col("downside_dev")).as("downside_dev"),
          r6(col("win_rate")).as("win_rate"),
          r6(col("best_day")).as("best_day"),
          r6(col("worst_day")).as("worst_day"),
          r6(col("sharpe")).as("sharpe"),
          r6(col("sortino")).as("sortino"))
        .orderBy("event_type"),
    Some("""
      WITH d AS (SELECT event_type AS g, date_trunc('day', ts) AS day,
                   round(sum("value"), 6) AS v
                 FROM events
                 WHERE "value" IS NOT NULL AND ts IS NOT NULL
                   AND event_type IS NOT NULL
                 GROUP BY 1, 2),
      l AS (SELECT g, day, v, lag(v) OVER (PARTITION BY g ORDER BY day)
              AS pv FROM d),
      x AS (SELECT g, round(v / pv - 1, 6) AS r FROM l WHERE pv > 0),
      a AS (SELECT g, count(*)::BIGINT AS n_ret, avg(r) AS m,
              stddev_samp(r) AS sd,
              sqrt(avg(CASE WHEN r < 0 THEN r * r ELSE 0 END)) AS dd,
              avg(CASE WHEN r > 0 THEN 1.0 ELSE 0.0 END) AS wr,
              max(r) AS best, min(r) AS worst
            FROM x GROUP BY 1)
      SELECT g AS event_type, n_ret, round(m, 6) AS mean_ret,
             round(sd, 6) AS sd_ret, round(dd, 6) AS downside_dev,
             round(wr, 6) AS win_rate, round(best, 6) AS best_day,
             round(worst, 6) AS worst_day,
             round(CASE WHEN sd > 0 THEN m / sd END, 6) AS sharpe,
             round(CASE WHEN dd > 0 THEN m / dd END, 6) AS sortino
      FROM a ORDER BY 1"""))

  /** In-sample 95% VaR backtest per event type: VaR as the exact
    * ⌈0.05·n⌉-th smallest daily return (order statistic — no
    * interpolation to disagree on), Kupiec POF LR, and Christoffersen
    * independence LR over the violation indicator's transitions. */
  private val q504 = Entry(
    "q504_var_backtest",
    (s, d) =>
      graft.ops.Risk.varBacktest(Tables.events(s, d), "event_type",
          "ts", "value", p = 0.05)
        .select(col("event_type"), col("n_ret"),
          r6(col("var_p")).as("var_p"), col("n_viol"),
          r6(col("viol_rate")).as("viol_rate"),
          r6(col("lr_pof")).as("lr_pof"),
          r6(col("lr_ind")).as("lr_ind"))
        .orderBy("event_type"),
    Some("""
      WITH d AS (SELECT event_type AS g, date_trunc('day', ts) AS day,
                   round(sum("value"), 6) AS v
                 FROM events
                 WHERE "value" IS NOT NULL AND ts IS NOT NULL
                   AND event_type IS NOT NULL
                 GROUP BY 1, 2),
      l AS (SELECT g, day, v, lag(v) OVER (PARTITION BY g ORDER BY day)
              AS pv FROM d),
      x AS (SELECT g, day, round(v / pv - 1, 6) AS r FROM l
            WHERE pv > 0),
      v2 AS (SELECT g, day, r,
               row_number() OVER (PARTITION BY g ORDER BY r) AS rn,
               count(*) OVER (PARTITION BY g) AS n
             FROM x),
      k AS (SELECT g, day, r, n,
              max(CASE WHEN rn = ceil(0.05 * n) THEN r END)
                OVER (PARTITION BY g) AS var_p
            FROM v2),
      i AS (SELECT g, day, n, var_p,
              CASE WHEN r < var_p THEN 1 ELSE 0 END AS viol FROM k),
      t AS (SELECT *, lag(viol) OVER (PARTITION BY g ORDER BY day)
              AS pviol FROM i),
      c AS (SELECT g, max(n)::BIGINT AS n_ret, max(var_p) AS var_p,
              sum(viol)::BIGINT AS n_viol,
              sum(CASE WHEN pviol = 0 AND viol = 0 THEN 1.0 ELSE 0 END)
                AS n00,
              sum(CASE WHEN pviol = 0 AND viol = 1 THEN 1.0 ELSE 0 END)
                AS n01,
              sum(CASE WHEN pviol = 1 AND viol = 0 THEN 1.0 ELSE 0 END)
                AS n10,
              sum(CASE WHEN pviol = 1 AND viol = 1 THEN 1.0 ELSE 0 END)
                AS n11
            FROM t GROUP BY 1)
      SELECT g AS event_type, n_ret, round(var_p, 6) AS var_p, n_viol,
             round(n_viol / n_ret::DOUBLE, 6) AS viol_rate,
             round(-2 * ((n_ret - n_viol) * ln(0.95)
               + n_viol * ln(0.05)
               - (CASE WHEN n_ret - n_viol > 0 THEN (n_ret - n_viol) *
                   ln((n_ret - n_viol) / n_ret::DOUBLE) ELSE 0 END)
               - (CASE WHEN n_viol > 0 THEN n_viol *
                   ln(n_viol / n_ret::DOUBLE) ELSE 0 END)), 6) AS lr_pof,
             round(2 * (
                 (CASE WHEN n01 > 0 AND n00 + n01 > 0 THEN n01 *
                   ln(n01 / (n00 + n01)) ELSE 0 END)
               + (CASE WHEN n00 > 0 AND n00 + n01 > 0 THEN n00 *
                   ln(n00 / (n00 + n01)) ELSE 0 END)
               + (CASE WHEN n11 > 0 AND n10 + n11 > 0 THEN n11 *
                   ln(n11 / (n10 + n11)) ELSE 0 END)
               + (CASE WHEN n10 > 0 AND n10 + n11 > 0 THEN n10 *
                   ln(n10 / (n10 + n11)) ELSE 0 END)
               - (CASE WHEN n01 + n11 > 0 AND n00 + n01 + n10 + n11 > 0
                   THEN (n01 + n11) *
                   ln((n01 + n11) / (n00 + n01 + n10 + n11)) ELSE 0 END)
               - (CASE WHEN n00 + n10 > 0 AND n00 + n01 + n10 + n11 > 0
                   THEN (n00 + n10) *
                   ln((n00 + n10) / (n00 + n01 + n10 + n11)) ELSE 0 END)
             ), 6) AS lr_ind
      FROM c ORDER BY 1"""))

  /** Markov-chain panel of the per-user event-type stream: stationary
    * distribution by 12 fixed power-iteration steps (unrolled
    * identically in the oracle — no convergence test to disagree on),
    * per-state conditional entropy, and entropy-rate contributions. */
  private val q505 = Entry(
    "q505_markov_chain",
    (s, d) =>
      graft.ops.Behavioral.markovChain(Tables.events(s, d), "user_id",
          "ts", "event_type", tieCols = Seq("event_id"), iterations = 12)
        .select(col("state"), col("n_out"),
          r6(col("p_stationary")).as("p_stationary"),
          r6(col("h_cond")).as("h_cond"), r6(col("pi_h")).as("pi_h"))
        .orderBy("state"),
    Some("""
      WITH s AS (SELECT user_id, event_type,
              lead(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS nxt
            FROM events),
      c AS (SELECT event_type AS f, nxt AS t, count(*)::DOUBLE AS n
            FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2),
      st AS (SELECT DISTINCT f FROM c),
      c2 AS (SELECT f, t, n FROM c WHERE t IN (SELECT f FROM st)),
      tot AS (SELECT f, sum(n) AS tn FROM c2 GROUP BY 1),
      p AS (SELECT c2.f, c2.t, c2.n / tot.tn AS p
            FROM c2 JOIN tot ON c2.f = tot.f),
      kk AS (SELECT count(*)::DOUBLE AS k FROM st),
      i0 AS (SELECT f AS state, 1.0 / k AS pi FROM st, kk),
      i1 AS (SELECT p.t AS state, sum(i0.pi * p.p) AS pi
             FROM i0 JOIN p ON p.f = i0.state GROUP BY 1),
      i2 AS (SELECT p.t AS state, sum(i1.pi * p.p) AS pi
             FROM i1 JOIN p ON p.f = i1.state GROUP BY 1),
      i3 AS (SELECT p.t AS state, sum(i2.pi * p.p) AS pi
             FROM i2 JOIN p ON p.f = i2.state GROUP BY 1),
      i4 AS (SELECT p.t AS state, sum(i3.pi * p.p) AS pi
             FROM i3 JOIN p ON p.f = i3.state GROUP BY 1),
      i5 AS (SELECT p.t AS state, sum(i4.pi * p.p) AS pi
             FROM i4 JOIN p ON p.f = i4.state GROUP BY 1),
      i6 AS (SELECT p.t AS state, sum(i5.pi * p.p) AS pi
             FROM i5 JOIN p ON p.f = i5.state GROUP BY 1),
      i7 AS (SELECT p.t AS state, sum(i6.pi * p.p) AS pi
             FROM i6 JOIN p ON p.f = i6.state GROUP BY 1),
      i8 AS (SELECT p.t AS state, sum(i7.pi * p.p) AS pi
             FROM i7 JOIN p ON p.f = i7.state GROUP BY 1),
      i9 AS (SELECT p.t AS state, sum(i8.pi * p.p) AS pi
             FROM i8 JOIN p ON p.f = i8.state GROUP BY 1),
      i10 AS (SELECT p.t AS state, sum(i9.pi * p.p) AS pi
              FROM i9 JOIN p ON p.f = i9.state GROUP BY 1),
      i11 AS (SELECT p.t AS state, sum(i10.pi * p.p) AS pi
              FROM i10 JOIN p ON p.f = i10.state GROUP BY 1),
      i12 AS (SELECT p.t AS state, sum(i11.pi * p.p) AS pi
              FROM i11 JOIN p ON p.f = i11.state GROUP BY 1),
      h AS (SELECT f AS state, -sum(p * ln(p)) AS h FROM p GROUP BY 1)
      SELECT st.f AS state, tot.tn::BIGINT AS n_out,
             round(coalesce(i12.pi, 0), 6) AS p_stationary,
             round(coalesce(h.h, 0), 6) AS h_cond,
             round(coalesce(i12.pi, 0) * coalesce(h.h, 0), 6) AS pi_h
      FROM st JOIN tot ON tot.f = st.f
        LEFT JOIN i12 ON i12.state = st.f
        LEFT JOIN h ON h.state = st.f
      ORDER BY state"""))

  /** Order-3 permutation entropy of each event type's daily-value
    * series — the ordinal-pattern complexity screen (1 = white noise,
    * 0 = monotone), ties ranked by time index on rounded daily sums. */
  private val q506 = Entry(
    "q506_permutation_entropy",
    (s, d) =>
      graft.ops.TimeSeries.permutationEntropy(Tables.events(s, d),
          "event_type", "ts", "value")
        .select(col("event_type"), col("n_windows"), col("n_patterns"),
          r6(col("perm_entropy")).as("perm_entropy"))
        .orderBy("event_type"),
    Some("""
      WITH d AS (SELECT event_type AS g, date_trunc('day', ts) AS day,
                   round(sum("value"), 6) AS a
                 FROM events
                 WHERE "value" IS NOT NULL AND ts IS NOT NULL
                   AND event_type IS NOT NULL
                 GROUP BY 1, 2),
      w AS (SELECT g, a,
              lead(a, 1) OVER (PARTITION BY g ORDER BY day) AS b,
              lead(a, 2) OVER (PARTITION BY g ORDER BY day) AS c
            FROM d),
      x AS (SELECT g,
              CASE WHEN a <= b AND b <= c THEN 0
                   WHEN a <= b AND NOT b <= c AND a <= c THEN 1
                   WHEN NOT a <= b AND b <= c AND a <= c THEN 2
                   WHEN a <= b AND NOT b <= c AND NOT a <= c THEN 3
                   WHEN NOT a <= b AND b <= c AND NOT a <= c THEN 4
                   ELSE 5 END AS pat
            FROM w WHERE b IS NOT NULL AND c IS NOT NULL),
      cnt AS (SELECT g, pat, count(*)::DOUBLE AS n FROM x GROUP BY 1, 2),
      t AS (SELECT g, sum(n) AS tn FROM cnt GROUP BY 1)
      SELECT cnt.g AS event_type, max(tn)::BIGINT AS n_windows,
             count(*)::BIGINT AS n_patterns,
             round(-sum((n / tn) * ln(n / tn)) / ln(6), 6)
               AS perm_entropy
      FROM cnt JOIN t ON t.g = cnt.g GROUP BY 1 ORDER BY 1"""))

  /** Rich-club coefficient profile of the customer↔supplier graph:
    * do high-degree nodes preferentially wire to each other —
    * φ(k) = 2·E_k/(N_k(N_k−1)) over a fixed degree-threshold grid. */
  private val q507 = Entry(
    "q507_rich_club",
    (s, d) =>
      graft.ops.Graph.richClub(custSuppEdges(s, d), "src", "dst",
          ks = Seq(4, 16, 64, 256))
        .select(col("k"), col("n_nodes"), col("n_edges"),
          r6(col("phi")).as("phi"))
        .orderBy("k"),
    Some("""
      WITH e AS (SELECT DISTINCT 'c' || o_custkey AS src,
                        's' || l_suppkey AS dst
                 FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      und AS (SELECT src AS a, dst AS b FROM e
              UNION SELECT dst, src FROM e),
      deg AS (SELECT a, count(*)::BIGINT AS dg FROM und GROUP BY 1),
      canon AS (SELECT und.a, und.b, da.dg AS dga, db.dg AS dgb
                FROM und JOIN deg da ON da.a = und.a
                  JOIN deg db ON db.a = und.b
                WHERE und.a < und.b),
      ks AS (SELECT unnest([4, 16, 64, 256]) AS k),
      nk AS (SELECT k, count(*)::BIGINT AS n_nodes FROM ks
             JOIN deg ON deg.dg > k GROUP BY 1),
      ek AS (SELECT k, count(*)::BIGINT AS n_edges FROM ks
             JOIN canon ON canon.dga > k AND canon.dgb > k GROUP BY 1)
      SELECT ks.k, coalesce(nk.n_nodes, 0) AS n_nodes,
             coalesce(ek.n_edges, 0) AS n_edges,
             round(CASE WHEN coalesce(nk.n_nodes, 0) > 1
               THEN 2.0 * coalesce(ek.n_edges, 0) /
                 (nk.n_nodes * (nk.n_nodes - 1)) END, 6) AS phi
      FROM ks LEFT JOIN nk ON nk.k = ks.k LEFT JOIN ek ON ek.k = ks.k
      ORDER BY ks.k"""))

  /** Decision-curve analysis of the q142 pseudo-model: net benefit per
    * threshold vs the treat-all reference — the clinical-utility
    * readout AUC famously can't give (thresholds as explicit literals
    * so both engines compare against the SAME doubles). */
  private val q508 = Entry(
    "q508_net_benefit",
    (s, d) =>
      graft.ops.Evaluation.decisionCurve(scoredOrders(s, d), "label",
          "score", thresholds = Seq(0.05, 0.1, 0.15, 0.2, 0.25, 0.3,
            0.35, 0.4, 0.45, 0.5))
        .select(r6(col("threshold")).as("threshold"), col("n_treated"),
          col("tp"), col("fp"), r6(col("net_benefit")).as("net_benefit"),
          r6(col("nb_treat_all")).as("nb_treat_all"))
        .orderBy("threshold"),
    Some(s"""
      WITH $scoredOrdersSql,
      ks AS (SELECT unnest([0.05, 0.1, 0.15, 0.2, 0.25, 0.3, 0.35,
               0.4, 0.45, 0.5]) AS t),
      a AS (SELECT t, count(*)::DOUBLE AS n, avg(y) AS prev,
              sum(CASE WHEN p >= t THEN 1 ELSE 0 END)::BIGINT
                AS n_treated,
              sum(CASE WHEN p >= t THEN y ELSE 0 END) AS tp,
              sum(CASE WHEN p >= t THEN 1.0 - y ELSE 0 END) AS fp
            FROM sc, ks GROUP BY 1)
      SELECT round(t, 6) AS threshold, n_treated, tp::BIGINT AS tp,
             fp::BIGINT AS fp,
             round(tp / n - fp / n * (t / (1 - t)), 6) AS net_benefit,
             round(prev - (1 - prev) * (t / (1 - t)), 6) AS nb_treat_all
      FROM a ORDER BY threshold"""))

  /** Newey–West trend per event type: daily-mean-on-day-index OLS with
    * Bartlett-kernel HAC(3) standard errors vs the plain OLS se — how
    * much serial correlation inflates the trend's uncertainty. */
  private val q509 = Entry(
    "q509_newey_west",
    (s, d) =>
      graft.ops.Regression.neweyWestTrend(Tables.events(s, d),
          "event_type", "ts", "value", maxLag = 3)
        .select(col("event_type"), col("n_days"),
          r6(col("slope")).as("slope"),
          r6(col("intercept")).as("intercept"),
          r6(col("se_ols")).as("se_ols"), r6(col("se_hac")).as("se_hac"),
          r6(col("hac_ratio")).as("hac_ratio"))
        .orderBy("event_type"),
    Some("""
      WITH d AS (SELECT event_type AS g, ts::DATE AS dd,
                   round(avg("value"), 6) AS y
                 FROM events
                 WHERE "value" IS NOT NULL AND ts IS NOT NULL
                   AND event_type IS NOT NULL
                 GROUP BY 1, 2),
      i AS (SELECT g, dd, y,
              date_diff('day', min(dd) OVER (PARTITION BY g),
                dd)::DOUBLE AS x
            FROM d),
      f AS (SELECT g, count(*)::DOUBLE AS n, avg(x) AS xb, avg(y) AS yb,
              sum(x * x) AS sxx0, sum(x * y) AS sxy0 FROM i GROUP BY 1),
      f2 AS (SELECT g, n, xb, sxx0 - n * xb * xb AS sxx,
               (sxy0 - n * xb * yb) / (sxx0 - n * xb * xb) AS slope,
               yb - (sxy0 - n * xb * yb) / (sxx0 - n * xb * xb) * xb
                 AS icpt
             FROM f),
      sc2 AS (SELECT i.g, dd, n, sxx, slope, icpt,
                y - icpt - slope * x AS e,
                (x - xb) * (y - icpt - slope * x) AS u
              FROM i JOIN f2 ON f2.g = i.g),
      lg AS (SELECT g, n, sxx, slope, icpt, e, u,
               lag(u, 1) OVER (PARTITION BY g ORDER BY dd) AS u1,
               lag(u, 2) OVER (PARTITION BY g ORDER BY dd) AS u2,
               lag(u, 3) OVER (PARTITION BY g ORDER BY dd) AS u3
             FROM sc2),
      a AS (SELECT g, max(n) AS n, max(sxx) AS sxx, max(slope) AS slope,
              max(icpt) AS icpt, sum(e * e) AS sse, sum(u * u) AS g0,
              sum(coalesce(u * u1, 0)) AS g1,
              sum(coalesce(u * u2, 0)) AS g2,
              sum(coalesce(u * u3, 0)) AS g3
            FROM lg GROUP BY 1),
      a2 AS (SELECT g, n, slope, icpt,
               CASE WHEN n > 2 AND sxx > 0
                 THEN sqrt(sse / (n - 2) / sxx) END AS se_ols,
               CASE WHEN sxx > 0 THEN sqrt((g0 + 2 * 0.75 * g1
                 + 2 * 0.5 * g2 + 2 * 0.25 * g3) / (sxx * sxx)) END
                 AS se_hac
             FROM a)
      SELECT g AS event_type, n::BIGINT AS n_days,
             round(slope, 6) AS slope, round(icpt, 6) AS intercept,
             round(se_ols, 6) AS se_ols, round(se_hac, 6) AS se_hac,
             round(CASE WHEN se_ols > 0 THEN se_hac / se_ols END, 6)
               AS hac_ratio
      FROM a2 ORDER BY 1"""))

  /** Western Electric run rules per event type over the daily-mean
    * chart: beyond-3σ points, 2-of-3 beyond 2σ, 4-of-5 beyond 1σ, and
    * 8-in-a-row same side — the pattern alarms a plain ±3σ chart
    * misses. */
  private val q510 = Entry(
    "q510_run_rules",
    (s, d) =>
      graft.ops.Spc.runRules(Tables.events(s, d), "event_type", "ts",
          "value")
        .select(col("event_type"), col("rule"), col("n_days"),
          col("n_flagged"))
        .orderBy("event_type", "rule"),
    Some("""
      WITH raw AS (SELECT event_type AS g, ts::DATE AS t,
                     "value"::DOUBLE AS v
                   FROM events
                   WHERE ts IS NOT NULL AND "value" IS NOT NULL
                     AND event_type IS NOT NULL),
      days AS (SELECT g, t, count(*)::DOUBLE AS n, round(avg(v), 6) AS m
               FROM raw GROUP BY 1, 2),
      tot AS (SELECT g, avg(v) AS mu, stddev_samp(v) AS sg
              FROM raw GROUP BY 1),
      fl AS (SELECT days.g, t, m, mu, sg / sqrt(n) AS half
             FROM days JOIN tot ON tot.g = days.g),
      z AS (SELECT g, t,
              CASE WHEN m > mu + 3 * half THEN 1 ELSE 0 END AS a3,
              CASE WHEN m < mu - 3 * half THEN 1 ELSE 0 END AS b3,
              CASE WHEN m > mu + 2 * half THEN 1 ELSE 0 END AS a2,
              CASE WHEN m < mu - 2 * half THEN 1 ELSE 0 END AS b2,
              CASE WHEN m > mu + 1 * half THEN 1 ELSE 0 END AS a1,
              CASE WHEN m < mu - 1 * half THEN 1 ELSE 0 END AS b1,
              CASE WHEN m > mu THEN 1 ELSE 0 END AS a0,
              CASE WHEN m < mu THEN 1 ELSE 0 END AS b0
            FROM fl),
      r AS (SELECT g, t,
              CASE WHEN a3 + b3 >= 1 THEN 1 ELSE 0 END AS r1,
              CASE WHEN sum(a2) OVER w3 >= 2 OR sum(b2) OVER w3 >= 2
                THEN 1 ELSE 0 END AS r2,
              CASE WHEN sum(a1) OVER w5 >= 4 OR sum(b1) OVER w5 >= 4
                THEN 1 ELSE 0 END AS r3,
              CASE WHEN sum(a0) OVER w8 >= 8 OR sum(b0) OVER w8 >= 8
                THEN 1 ELSE 0 END AS r4
            FROM z
            WINDOW w3 AS (PARTITION BY g ORDER BY t
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
                   w5 AS (PARTITION BY g ORDER BY t
                          ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
                   w8 AS (PARTITION BY g ORDER BY t
                          ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)),
      sel AS (SELECT g, count(*)::BIGINT AS n_days,
                sum(r1)::BIGINT AS v1, sum(r2)::BIGINT AS v2,
                sum(r3)::BIGINT AS v3, sum(r4)::BIGINT AS v4
              FROM r GROUP BY 1)
      SELECT g AS event_type, 'R1' AS rule, n_days, v1 AS n_flagged
      FROM sel
      UNION ALL SELECT g, 'R2', n_days, v2 FROM sel
      UNION ALL SELECT g, 'R3', n_days, v3 FROM sel
      UNION ALL SELECT g, 'R4', n_days, v4 FROM sel
      ORDER BY event_type, rule"""))

  /** Categorical event-type mix shift between the first and second
    * half of the window: total-variation distance (= Duncan
    * dissimilarity), overlap coefficient, and the L∞ gap — the
    * bounded-support complements to q09's PSI/KL drift panel. */
  private val q511 = Entry(
    "q511_categorical_shift",
    (s, d) =>
      graft.ops.Profiling.categoricalShift(Tables.events(s, d),
          "event_type", "ts")
        .select(col("n_before"), col("n_after"), col("n_cats"),
          r6(col("tv")).as("tv"), r6(col("overlap")).as("overlap"),
          r6(col("max_gap")).as("max_gap")),
    Some("""
      WITH b AS (SELECT event_type AS c, ts::DATE AS d FROM events
                 WHERE event_type IS NOT NULL AND ts IS NOT NULL),
      bd AS (SELECT min(d) AS lo, max(d) AS hi FROM b),
      cut AS (SELECT lo + (date_diff('day', lo, hi) // 2)::INTEGER AS cc
              FROM bd),
      cells AS (SELECT c,
                  sum(CASE WHEN d <= cc THEN 1.0 ELSE 0 END) AS a,
                  sum(CASE WHEN d > cc THEN 1.0 ELSE 0 END) AS bb
                FROM b, cut GROUP BY 1),
      t AS (SELECT sum(a) AS ta, sum(bb) AS tb FROM cells)
      SELECT max(ta)::BIGINT AS n_before, max(tb)::BIGINT AS n_after,
             count(*)::BIGINT AS n_cats,
             round(sum(abs(a / ta - bb / tb)) / 2, 6) AS tv,
             round(sum(least(a / ta, bb / tb)), 6) AS overlap,
             round(max(abs(a / ta - bb / tb)), 6) AS max_gap
      FROM cells, t"""))

  /** Theta-method forecast of daily event volume: OLS trend + SES(0.2)
    * over the θ=2 double-curvature line, combined half-half — the M3
    * benchmark winner as a 7-day forecaster (recursion unrolled as a
    * recursive CTE in the oracle, integer-exact OLS inputs). */
  private val q512 = Entry(
    "q512_theta_forecast",
    (s, d) =>
      graft.ops.TimeSeries.thetaForecast(Tables.events(s, d), "ts",
          alpha = 0.2, horizon = 7)
        .select(col("h"), col("n_days"),
          r6(col("intercept")).as("intercept"), r6(col("drift")).as("drift"),
          r6(col("ses_level")).as("ses_level"),
          r6(col("forecast")).as("forecast"))
        .orderBy("h"),
    Some("""
      WITH RECURSIVE days AS (SELECT CAST(ts AS DATE) AS day,
                     count(*)::DOUBLE AS y
                   FROM events WHERE ts IS NOT NULL GROUP BY 1),
      seq AS (SELECT row_number() OVER (ORDER BY day) AS i, y FROM days),
      f AS (SELECT count(*)::DOUBLE AS n, avg(i) AS tb, avg(y) AS yb,
              sum(i * y) AS sxy0, sum(i * i)::DOUBLE AS sxx0 FROM seq),
      ab AS (SELECT n,
               (sxy0 - n * tb * yb) / (sxx0 - n * tb * tb) AS b,
               yb - (sxy0 - n * tb * yb) / (sxx0 - n * tb * tb) * tb AS a
             FROM f),
      rec AS (
        SELECT 1::BIGINT AS t,
               (2 * (SELECT y FROM seq WHERE i = 1) -
                 (a + b * 1))::DOUBLE AS s
        FROM ab
        UNION ALL
        SELECT r.t + 1,
               0.2 * (2 * q.y - (ab.a + ab.b * (r.t + 1))) + 0.8 * r.s
        FROM rec r JOIN seq q ON q.i = r.t + 1, ab),
      fin AS (SELECT s FROM rec ORDER BY t DESC LIMIT 1)
      SELECT h::BIGINT AS h, n::BIGINT AS n_days,
             round(a, 6) AS intercept, round(b, 6) AS drift,
             round(s, 6) AS ses_level,
             round(0.5 * ((a + b * (n + h)) + s), 6) AS forecast
      FROM (SELECT unnest(generate_series(1, 7)) AS h), ab, fin
      ORDER BY h"""))

  /** Generalized-entropy inequality panel of order revenue: GE(0)
    * mean-log-deviation, GE(1) Theil T, GE(2) half-CV² — the
    * tail-sensitivity spectrum from one pass of sufficient stats. */
  private val q513 = Entry(
    "q513_ge_panel",
    (s, d) =>
      graft.ops.Profiling
        .generalizedEntropy(Tables.lineitem(s, d), "l_extendedprice")
        .select(col("n"), r6(col("mean")).as("mean"),
          r6(col("mld")).as("mld"), r6(col("theil_t")).as("theil_t"),
          r6(col("ge2")).as("ge2")),
    Some("""
      WITH b AS (SELECT l_extendedprice::DOUBLE AS x FROM lineitem
                 WHERE l_extendedprice > 0),
      a AS (SELECT count(*)::DOUBLE AS n, sum(x) AS s, sum(ln(x)) AS sl,
              sum(x * ln(x)) AS sxl, sum(x * x) AS s2 FROM b)
      SELECT n::BIGINT AS n, round(s / n, 6) AS mean,
             round(ln(s / n) - sl / n, 6) AS mld,
             round(sxl / s - ln(s / n), 6) AS theil_t,
             round(((s2 / n) / ((s / n) * (s / n)) - 1) / 2, 6) AS ge2
      FROM a"""))

  /** TextRank keywords over the corpus word co-occurrence graph:
    * PageRank (3 fixed iterations, q158 discipline) on symmetrized
    * count-≥5 adjacency edges, top-20 terms. */
  private val q514 = Entry(
    "q514_textrank",
    (s, d) =>
      graft.ops.TextAnalysis
        .textRank(Tables.documents(s, d), "text", minCount = 5, k = 20,
          iterations = 3)
        .select(col("term"), r6(col("rank")).as("rank")),
    Some("""
      WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term,
               generate_subscripts(string_split(text, ' '), 1) AS ord
        FROM documents),
      bi0 AS (SELECT term AS x,
                lead(term) OVER (PARTITION BY doc_id ORDER BY ord) AS y
              FROM toks),
      bi AS (SELECT x, y, count(*) AS c FROM bi0 WHERE y IS NOT NULL
             GROUP BY 1, 2),
      bf AS (SELECT x, y FROM bi WHERE c >= 5 AND x <> y),
      e AS (SELECT DISTINCT src, dst FROM
              (SELECT x AS src, y AS dst FROM bf
               UNION ALL SELECT y, x FROM bf)),
      nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
      deg AS (SELECT src, count(*)::DOUBLE AS dg FROM e GROUP BY 1),
      r0 AS (SELECT node, 1.0 / n AS rank FROM nodes, nn),
      c1 AS (SELECT e.dst AS node, sum(r0.rank / deg.dg) AS c
             FROM r0 JOIN e ON r0.node = e.src
                     JOIN deg ON e.src = deg.src
             GROUP BY 1),
      d1 AS (SELECT coalesce(sum(rank), 0) AS dang FROM r0
             WHERE node NOT IN (SELECT src FROM deg)),
      r1 AS (SELECT nodes.node,
                    0.15 / n + 0.85 * (coalesce(c, 0) + dang / n) AS rank
             FROM nodes LEFT JOIN c1 ON nodes.node = c1.node, nn, d1),
      c2 AS (SELECT e.dst AS node, sum(r1.rank / deg.dg) AS c
             FROM r1 JOIN e ON r1.node = e.src
                     JOIN deg ON e.src = deg.src
             GROUP BY 1),
      d2 AS (SELECT coalesce(sum(rank), 0) AS dang FROM r1
             WHERE node NOT IN (SELECT src FROM deg)),
      r2 AS (SELECT nodes.node,
                    0.15 / n + 0.85 * (coalesce(c, 0) + dang / n) AS rank
             FROM nodes LEFT JOIN c2 ON nodes.node = c2.node, nn, d2),
      c3 AS (SELECT e.dst AS node, sum(r2.rank / deg.dg) AS c
             FROM r2 JOIN e ON r2.node = e.src
                     JOIN deg ON e.src = deg.src
             GROUP BY 1),
      d3 AS (SELECT coalesce(sum(rank), 0) AS dang FROM r2
             WHERE node NOT IN (SELECT src FROM deg)),
      r3 AS (SELECT nodes.node,
                    0.15 / n + 0.85 * (coalesce(c, 0) + dang / n) AS rank
             FROM nodes LEFT JOIN c3 ON nodes.node = c3.node, nn, d3)
      SELECT node AS term, round(rank, 6) AS rank FROM r3
      ORDER BY r3.rank DESC, term LIMIT 20"""))

  /** ROUGE-1/2 overlap scores over the trigram near-dup pair store:
    * clipped-count n-gram precision/recall/F per pair — what the
    * near-duplicates actually share lexically, beyond the Jaccard
    * that surfaced them. */
  private val q515 = Entry(
    "q515_rouge_pairs",
    (s, d) =>
      graft.ops.TextAnalysis
        .rougePairs(Tables.documents(s, d), "doc_id", "text",
          docTrigramPairs(s, d))
        .select(col("doc_a"), col("doc_b"),
          r6(col("r1_precision")).as("r1_precision"),
          r6(col("r1_recall")).as("r1_recall"),
          r6(col("r1_f")).as("r1_f"), r6(col("r2_f")).as("r2_f"))
        .orderBy("doc_a", "doc_b"),
    Some("""
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w
                    FROM documents),
      sh AS (
        SELECT DISTINCT doc_id AS id,
               unnest(list_transform(range(1, len(w) - 1),
                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        FROM toks WHERE len(w) >= 3),
      keep AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 100),
      shk AS (SELECT sh.id, sh.s FROM sh JOIN keep USING (s)),
      sz AS (SELECT id, count(*) AS n_sh FROM shk GROUP BY 1),
      prs AS (
        SELECT a.id AS doc_a, b.id AS doc_b, count(*) AS inter
        FROM shk a JOIN shk b ON a.s = b.s AND a.id < b.id
        GROUP BY 1, 2),
      jac AS (
        SELECT doc_a, doc_b
        FROM prs JOIN sz x ON doc_a = x.id JOIN sz y ON doc_b = y.id
        WHERE inter / (x.n_sh + y.n_sh - inter) >= 0.8),
      unic AS (SELECT doc_id AS id, g, count(*)::DOUBLE AS c FROM
                 (SELECT doc_id, unnest(w) AS g FROM toks)
               GROUP BY 1, 2),
      t1 AS (SELECT id, sum(c) AS t FROM unic GROUP BY 1),
      bigc AS (SELECT doc_id AS id, g, count(*)::DOUBLE AS c FROM
                 (SELECT doc_id,
                    unnest(list_transform(range(1, len(w)),
                      i -> w[i] || ' ' || w[i+1])) AS g
                  FROM toks WHERE len(w) >= 2)
               GROUP BY 1, 2),
      t2 AS (SELECT id, sum(c) AS t FROM bigc GROUP BY 1),
      o1 AS (SELECT doc_a, doc_b, sum(least(a.c, b.c)) AS o
             FROM jac JOIN unic a ON a.id = doc_a
               JOIN unic b ON b.id = doc_b AND b.g = a.g
             GROUP BY 1, 2),
      o2 AS (SELECT doc_a, doc_b, sum(least(a.c, b.c)) AS o
             FROM jac JOIN bigc a ON a.id = doc_a
               JOIN bigc b ON b.id = doc_b AND b.g = a.g
             GROUP BY 1, 2)
      SELECT jac.doc_a, jac.doc_b,
             round(coalesce(o1.o, 0) / tb1.t, 6) AS r1_precision,
             round(coalesce(o1.o, 0) / ta1.t, 6) AS r1_recall,
             round(CASE WHEN coalesce(o1.o, 0) > 0
               THEN 2 * (o1.o / tb1.t) * (o1.o / ta1.t) /
                 ((o1.o / tb1.t) + (o1.o / ta1.t))
               WHEN ta1.t > 0 AND tb1.t > 0 THEN 0 END, 6) AS r1_f,
             round(CASE WHEN coalesce(o2.o, 0) > 0
               THEN 2 * (o2.o / tb2.t) * (o2.o / ta2.t) /
                 ((o2.o / tb2.t) + (o2.o / ta2.t))
               WHEN ta2.t > 0 AND tb2.t > 0 THEN 0 END, 6) AS r2_f
      FROM jac LEFT JOIN o1 USING (doc_a, doc_b)
        LEFT JOIN o2 USING (doc_a, doc_b)
        JOIN t1 ta1 ON ta1.id = jac.doc_a
        JOIN t1 tb1 ON tb1.id = jac.doc_b
        LEFT JOIN t2 ta2 ON ta2.id = jac.doc_a
        LEFT JOIN t2 tb2 ON tb2.id = jac.doc_b
      ORDER BY doc_a, doc_b"""))

  /** Corpus distinct-n diversity: distinct/total n-gram ratios for
    * n = 1..3 — the mode-collapse / templating screen. */
  private val q516 = Entry(
    "q516_distinct_ngrams",
    (s, d) =>
      graft.ops.TextAnalysis.distinctNgrams(Tables.documents(s, d),
          "text", maxN = 3)
        .select(col("n"), col("total_ngrams"), col("distinct_ngrams"),
          r6(col("distinct_ratio")).as("distinct_ratio"))
        .orderBy("n"),
    Some("""
      WITH toks AS (SELECT string_split(text, ' ') AS w FROM documents),
      g1 AS (SELECT unnest(w) AS g FROM toks),
      g2 AS (SELECT unnest(list_transform(range(1, len(w)),
               i -> w[i] || ' ' || w[i+1])) AS g
             FROM toks WHERE len(w) >= 2),
      g3 AS (SELECT unnest(list_transform(range(1, len(w) - 1),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
             FROM toks WHERE len(w) >= 3)
      SELECT 1 AS n, count(*)::BIGINT AS total_ngrams,
             count(DISTINCT g)::BIGINT AS distinct_ngrams,
             round(count(DISTINCT g) / count(*)::DOUBLE, 6)
               AS distinct_ratio
      FROM g1
      UNION ALL
      SELECT 2, count(*)::BIGINT, count(DISTINCT g)::BIGINT,
             round(count(DISTINCT g) / count(*)::DOUBLE, 6)
      FROM g2
      UNION ALL
      SELECT 3, count(*)::BIGINT, count(DISTINCT g)::BIGINT,
             round(count(DISTINCT g) / count(*)::DOUBLE, 6)
      FROM g3
      ORDER BY n"""))

  /** Generalized ESD outlier sweep over daily event volume: three
    * sequential max-|z| removals (Rosner's masking-proof multi-outlier
    * test), each round's R statistic and victim reported. */
  private val q517 = Entry(
    "q517_esd_outliers",
    (s, d) =>
      graft.ops.TimeSeries.esdOutliers(Tables.events(s, d), "ts",
          rounds = 3)
        .select(col("round"), col("n_used"), r6(col("mean")).as("mean"),
          r6(col("sd")).as("sd"), r6(col("r_stat")).as("r_stat"),
          r6(col("removed_value")).as("removed_value"),
          col("removed_day"))
        .orderBy("round"),
    Some("""
      WITH days AS (SELECT CAST(ts AS DATE) AS day, count(*)::DOUBLE AS y
                    FROM events WHERE ts IS NOT NULL GROUP BY 1),
      s1 AS (SELECT count(*)::DOUBLE AS n, sum(y) / count(*) AS m
             FROM days),
      d1 AS (SELECT n, m,
               sqrt(sum((y - m) * (y - m)) / (n - 1)) AS sd
             FROM days, s1 GROUP BY n, m),
      v1 AS (SELECT day, y FROM days, d1
             ORDER BY abs(y - d1.m) DESC, day LIMIT 1),
      e1 AS (SELECT day, y FROM days
             WHERE day NOT IN (SELECT day FROM v1)),
      s2 AS (SELECT count(*)::DOUBLE AS n, sum(y) / count(*) AS m
             FROM e1),
      d2 AS (SELECT n, m,
               sqrt(sum((y - m) * (y - m)) / (n - 1)) AS sd
             FROM e1, s2 GROUP BY n, m),
      v2 AS (SELECT day, y FROM e1, d2
             ORDER BY abs(y - d2.m) DESC, day LIMIT 1),
      e2 AS (SELECT day, y FROM e1
             WHERE day NOT IN (SELECT day FROM v2)),
      s3 AS (SELECT count(*)::DOUBLE AS n, sum(y) / count(*) AS m
             FROM e2),
      d3 AS (SELECT n, m,
               sqrt(sum((y - m) * (y - m)) / (n - 1)) AS sd
             FROM e2, s3 GROUP BY n, m),
      v3 AS (SELECT day, y FROM e2, d3
             ORDER BY abs(y - d3.m) DESC, day LIMIT 1)
      SELECT 1::BIGINT AS round, d1.n::BIGINT AS n_used,
             round(d1.m, 6) AS mean, round(d1.sd, 6) AS sd,
             round(abs(v1.y - d1.m) / d1.sd, 6) AS r_stat,
             round(v1.y, 6) AS removed_value, v1.day AS removed_day
      FROM d1, v1
      UNION ALL
      SELECT 2, d2.n::BIGINT, round(d2.m, 6), round(d2.sd, 6),
             round(abs(v2.y - d2.m) / d2.sd, 6), round(v2.y, 6), v2.day
      FROM d2, v2
      UNION ALL
      SELECT 3, d3.n::BIGINT, round(d3.m, 6), round(d3.sd, 6),
             round(abs(v3.y - d3.m) / d3.sd, 6), round(v3.y, 6), v3.day
      FROM d3, v3
      ORDER BY round"""))

  /** Rayleigh circular-uniformity test of hour-of-day per event type:
    * mean resultant length, z = n·R̄², mean direction in hours —
    * "does this event type have a preferred time of day", computed
    * right at the midnight wrap. */
  private val q518 = Entry(
    "q518_rayleigh",
    (s, d) =>
      graft.ops.TimeSeries.circularHourStats(Tables.events(s, d),
          "event_type", "ts")
        .select(col("event_type"), col("n"),
          r6(col("mean_hour")).as("mean_hour"),
          r6(col("resultant_r")).as("resultant_r"),
          r6(col("rayleigh_z")).as("rayleigh_z"),
          r6(col("circ_variance")).as("circ_variance"))
        .orderBy("event_type"),
    Some("""
      WITH b AS (SELECT event_type AS g,
              (hour(ts) + minute(ts) / 60.0) *
                (2 * pi() / 24) AS th
            FROM events
            WHERE ts IS NOT NULL AND event_type IS NOT NULL),
      a AS (SELECT g, count(*)::DOUBLE AS n, sum(cos(th)) AS c,
              sum(sin(th)) AS s
            FROM b GROUP BY 1),
      r AS (SELECT g, n, sqrt(c * c + s * s) / n AS rr,
              atan2(s, c) AS mh
            FROM a)
      SELECT g AS event_type, n::BIGINT AS n,
             round(fmod(mh * (24 / (2 * pi())) + 24, 24), 6) AS mean_hour,
             round(rr, 6) AS resultant_r,
             round(n * rr * rr, 6) AS rayleigh_z,
             round(1 - rr, 6) AS circ_variance
      FROM r ORDER BY 1"""))

  /** ABC/Pareto classification of parts by revenue mass: strictly-
    * above cumulative-share cuts at 0.8/0.95 — the inventory 80/15/5
    * readout, tie-stable by construction. */
  private val q519 = Entry(
    "q519_abc_classification",
    (s, d) =>
      graft.ops.Profiling
        .abcClassification(Tables.lineitem(s, d), "l_partkey",
          "l_extendedprice")
        .select(col("abc_class"), col("n_keys"),
          r2(col("value_total")).as("value_total"),
          r6(col("value_share")).as("value_share"))
        .orderBy("abc_class"),
    Some("""
      WITH rev AS (SELECT l_partkey AS k,
                     round(sum(l_extendedprice::DOUBLE), 6) AS v
                   FROM lineitem WHERE l_extendedprice IS NOT NULL
                   GROUP BY 1),
      vc AS (SELECT v, count(*)::BIGINT AS kk, sum(v) AS mass
             FROM rev GROUP BY 1),
      ex AS (SELECT v, kk, mass,
               coalesce(sum(mass) OVER (ORDER BY v DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS above
             FROM vc),
      t AS (SELECT sum(mass) AS tot FROM vc)
      SELECT CASE WHEN above / tot < 0.8 THEN 'A'
                  WHEN above / tot < 0.95 THEN 'B'
                  ELSE 'C' END AS abc_class,
             sum(kk)::BIGINT AS n_keys,
             round(sum(mass), 2) AS value_total,
             round(sum(mass) / max(tot), 6) AS value_share
      FROM ex, t GROUP BY 1 ORDER BY 1"""))

  /** Savitzky–Golay 7-point quadratic smoothing of each type's daily
    * event counts (exact integer weights −2,3,6,7,6,3,−2 over 21) +
    * 3σ residual outlier flags — the shape-preserving denoiser. */
  private val q520 = Entry(
    "q520_savitzky_golay",
    (s, d) =>
      graft.ops.TimeSeries.savitzkyGolay(Tables.events(s, d),
          "event_type", "ts", k = 3.0)
        .select(col("event_type"), col("day"),
          col("y").cast("long").as("y"), r6(col("smooth")).as("smooth"),
          r6(col("resid")).as("resid"), col("is_outlier"))
        .orderBy("event_type", "day"),
    Some("""
      WITH d AS (SELECT event_type AS g, ts::DATE AS day,
                   count(*)::DOUBLE AS y
                 FROM events
                 WHERE ts IS NOT NULL AND event_type IS NOT NULL
                 GROUP BY 1, 2),
      l AS (SELECT g, day, y,
              lag(y, 3) OVER w AS w0, lag(y, 2) OVER w AS w1,
              lag(y, 1) OVER w AS w2, lead(y, 1) OVER w AS w4,
              lead(y, 2) OVER w AS w5, lead(y, 3) OVER w AS w6,
              count(y) OVER (PARTITION BY g ORDER BY day
                ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS cnt
            FROM d WINDOW w AS (PARTITION BY g ORDER BY day)),
      s AS (SELECT g, day, y,
              CASE WHEN cnt = 7 THEN
                (w0 * -2 + w1 * 3 + w2 * 6 + y * 7 + w4 * 6 + w5 * 3
                  + w6 * -2) / 21.0 END AS smooth
            FROM l),
      r AS (SELECT g, day, y, smooth, y - smooth AS resid FROM s),
      sd AS (SELECT g, stddev_samp(resid) AS sg FROM r GROUP BY 1)
      SELECT r.g AS event_type, day, y::BIGINT AS y,
             round(smooth, 6) AS smooth, round(resid, 6) AS resid,
             CASE WHEN resid IS NOT NULL AND sg > 0
               THEN abs(resid) > 3 * sg END AS is_outlier
      FROM r JOIN sd ON sd.g = r.g ORDER BY event_type, day"""))

  /** Tukey biweight robust location/midvariance of event value next
    * to the classical moments — the smooth-rejection M-estimator
    * (9-MAD bisquare), exact-DISC median/MAD anchors. */
  private val q521 = Entry(
    "q521_biweight",
    (s, d) =>
      graft.ops.Profiling.biweightStats(Tables.events(s, d), "value")
        .select(col("n"), r6(col("mean")).as("mean"), r6(col("sd")).as("sd"),
          r6(col("median")).as("median"), r6(col("mad")).as("mad"),
          r6(col("biweight_loc")).as("biweight_loc"),
          r6(col("biweight_midvar")).as("biweight_midvar")),
    Some("""
      WITH b AS (SELECT "value"::DOUBLE AS x FROM events
                 WHERE "value" IS NOT NULL),
      m AS (SELECT quantile_disc(x, 0.5) AS med FROM b),
      md AS (SELECT quantile_disc(abs(x - med), 0.5) AS mad FROM b, m),
      a AS (SELECT count(*)::DOUBLE AS n, avg(x) AS mean,
              stddev_samp(x) AS sd, max(med) AS med, max(mad) AS mad,
              sum(CASE WHEN mad > 0 AND
                  abs((x - med) / (9 * mad)) < 1
                THEN (x - med) *
                  (1 - ((x - med) / (9 * mad)) * ((x - med) / (9 * mad)))
                  * (1 - ((x - med) / (9 * mad)) * ((x - med) / (9 * mad)))
                ELSE 0 END) AS num,
              sum(CASE WHEN mad > 0 AND
                  abs((x - med) / (9 * mad)) < 1
                THEN (1 - ((x - med) / (9 * mad)) * ((x - med) / (9 * mad)))
                  * (1 - ((x - med) / (9 * mad)) * ((x - med) / (9 * mad)))
                ELSE 0 END) AS den,
              sum(CASE WHEN mad > 0 AND
                  abs((x - med) / (9 * mad)) < 1
                THEN (x - med) * (x - med) *
                  (1 - ((x - med) / (9 * mad)) * ((x - med) / (9 * mad)))
                  * (1 - ((x - med) / (9 * mad)) * ((x - med) / (9 * mad)))
                  * (1 - ((x - med) / (9 * mad)) * ((x - med) / (9 * mad)))
                  * (1 - ((x - med) / (9 * mad)) * ((x - med) / (9 * mad)))
                ELSE 0 END) AS vnum,
              sum(CASE WHEN mad > 0 AND
                  abs((x - med) / (9 * mad)) < 1
                THEN (1 - ((x - med) / (9 * mad)) * ((x - med) / (9 * mad)))
                  * (1 - 5 * ((x - med) / (9 * mad)) * ((x - med) / (9 * mad)))
                ELSE 0 END) AS vden
            FROM b, m, md)
      SELECT n::BIGINT AS n, round(mean, 6) AS mean, round(sd, 6) AS sd,
             round(med, 6) AS median, round(mad, 6) AS mad,
             round(CASE WHEN den > 0 THEN med + num / den
               ELSE med END, 6) AS biweight_loc,
             round(CASE WHEN vden > 0
               THEN n * vnum / (vden * vden) END, 6) AS biweight_midvar
      FROM a"""))

  /** Ridit analysis of order priority across customer market
    * segments: each segment's mean ridit against the pooled ordinal
    * distribution — the ordered-categorical effect size (0.5 = no
    * shift). */
  private val q522 = Entry(
    "q522_ridit",
    (s, d) =>
      graft.ops.Profiling
        .riditAnalysis(
          Tables.orders(s, d).join(Tables.customer(s, d),
            col("o_custkey") === col("c_custkey")),
          "c_mktsegment", "o_orderpriority",
          ordinalKey = c => substring(c, 1, 1).cast("int"))
        .select(col("c_mktsegment").as("segment"), col("n"),
          r6(col("mean_ridit")).as("mean_ridit"))
        .orderBy("segment"),
    Some("""
      WITH b AS (SELECT c_mktsegment AS g, o_orderpriority AS c
                 FROM orders JOIN customer ON o_custkey = c_custkey
                 WHERE o_orderpriority IS NOT NULL
                   AND c_mktsegment IS NOT NULL),
      cats AS (SELECT c, count(*)::DOUBLE AS n FROM b GROUP BY 1),
      ex AS (SELECT c, n, coalesce(sum(n) OVER (ORDER BY c
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS below
             FROM cats),
      t AS (SELECT sum(n) AS tot FROM cats),
      rd AS (SELECT c, (below + n / 2) / tot AS r FROM ex, t),
      gc AS (SELECT g, c, count(*)::BIGINT AS gn FROM b GROUP BY 1, 2)
      SELECT g AS segment, sum(gn)::BIGINT AS n,
             round(sum(gn * r) / sum(gn), 6) AS mean_ridit
      FROM gc JOIN rd USING (c) GROUP BY 1 ORDER BY 1"""))

  /** Closed-form distribution-fit panel for event value: exponential /
    * gamma-MoM / lognormal-MLE parameters plus observed vs implied
    * skewness — which tail family the data supports, one pass. */
  private val q523 = Entry(
    "q523_dist_fit_panel",
    (s, d) =>
      graft.ops.Profiling.distributionFitPanel(Tables.events(s, d),
          "value")
        .select(col("n"), r6(col("mean")).as("mean"),
          r6(col("variance")).as("variance"),
          r6(col("exp_rate")).as("exp_rate"),
          r6(col("gamma_shape")).as("gamma_shape"),
          r6(col("gamma_scale")).as("gamma_scale"),
          r6(col("lognorm_mu")).as("lognorm_mu"),
          r6(col("lognorm_sigma")).as("lognorm_sigma"),
          r6(col("skew_obs")).as("skew_obs"),
          r6(col("skew_gamma")).as("skew_gamma"),
          r6(col("skew_lognormal")).as("skew_lognormal")),
    Some("""
      WITH b AS (SELECT "value"::DOUBLE AS x FROM events
                 WHERE "value" IS NOT NULL AND "value" > 0),
      a AS (SELECT count(*)::DOUBLE AS n, sum(x) AS s1,
              sum(x * x) AS s2, sum(x * x * x) AS s3,
              sum(ln(x)) AS l1, sum(ln(x) * ln(x)) AS l2
            FROM b),
      m AS (SELECT n, s2, s3, s1 / n AS mm,
              (s2 - n * (s1 / n) * (s1 / n)) / (n - 1) AS v,
              l1 / n AS mu,
              (l2 - n * (l1 / n) * (l1 / n)) / (n - 1) AS sig2
            FROM a),
      g AS (SELECT *, mm * mm / v AS kk FROM m)
      SELECT n::BIGINT AS n, round(mm, 6) AS mean,
             round(v, 6) AS variance, round(1 / mm, 6) AS exp_rate,
             round(kk, 6) AS gamma_shape, round(v / mm, 6) AS gamma_scale,
             round(mu, 6) AS lognorm_mu,
             round(sqrt(sig2), 6) AS lognorm_sigma,
             round((s3 / n - 3 * mm * (s2 / n) + 2 * mm * mm * mm) /
               pow(s2 / n - mm * mm, 1.5), 6) AS skew_obs,
             round(2 / sqrt(kk), 6) AS skew_gamma,
             round((exp(sig2) + 2) * sqrt(exp(sig2) - 1), 6)
               AS skew_lognormal
      FROM g"""))

  /** Customer value-quartile migration between the two halves of the
    * order window: exact-DISC quartile cuts per half, (from, to)
    * transition counts + row shares over both-half customers. */
  private val q524 = Entry(
    "q524_segment_migration",
    (s, d) =>
      graft.ops.Behavioral.segmentMigration(Tables.orders(s, d),
          "o_custkey", "o_orderdate", "o_totalprice")
        .select(col("q_from"), col("q_to"), col("n"),
          r6(col("row_share")).as("row_share"))
        .orderBy("q_from", "q_to"),
    Some("""
      WITH b AS (SELECT o_custkey AS e, o_orderdate::DATE AS d,
                   o_totalprice::DOUBLE AS v
                 FROM orders
                 WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
                   AND o_totalprice IS NOT NULL),
      bd AS (SELECT min(d) AS lo, max(d) AS hi FROM b),
      cut AS (SELECT lo + (date_diff('day', lo, hi) // 2)::INTEGER AS cc
              FROM bd),
      per AS (SELECT e,
                round(sum(CASE WHEN d <= cc THEN v ELSE 0 END), 6) AS a,
                round(sum(CASE WHEN d > cc THEN v ELSE 0 END), 6) AS bb
              FROM b, cut GROUP BY 1),
      bo AS (SELECT e, a, bb FROM per WHERE a > 0 AND bb > 0),
      ca AS (SELECT quantile_disc(a, 0.25) AS p25,
                    quantile_disc(a, 0.5) AS p50,
                    quantile_disc(a, 0.75) AS p75 FROM bo),
      cb AS (SELECT quantile_disc(bb, 0.25) AS p25,
                    quantile_disc(bb, 0.5) AS p50,
                    quantile_disc(bb, 0.75) AS p75 FROM bo),
      q AS (SELECT
              CASE WHEN a <= ca.p25 THEN 1 WHEN a <= ca.p50 THEN 2
                   WHEN a <= ca.p75 THEN 3 ELSE 4 END AS q_from,
              CASE WHEN bb <= cb.p25 THEN 1 WHEN bb <= cb.p50 THEN 2
                   WHEN bb <= cb.p75 THEN 3 ELSE 4 END AS q_to
            FROM bo, ca, cb),
      cells AS (SELECT q_from, q_to, count(*)::BIGINT AS n FROM q
                GROUP BY 1, 2),
      rt AS (SELECT q_from, sum(n) AS t FROM cells GROUP BY 1)
      SELECT cells.q_from, cells.q_to, cells.n,
             round(cells.n / rt.t::DOUBLE, 6) AS row_share
      FROM cells JOIN rt ON rt.q_from = cells.q_from
      ORDER BY cells.q_from, cells.q_to"""))

  /** Rank-biased overlap + Spearman footrule between the even-doc and
    * odd-doc top-50 term rankings — how stable the corpus's term
    * head is, top-weighted the way a ranking comparison should be. */
  private val q525 = Entry(
    "q525_rank_stability",
    (s, d) =>
      graft.ops.TextAnalysis.rankStability(Tables.documents(s, d),
          "doc_id", "text", k = 50, p = 0.9)
        .select(col("k"), col("n_shared"),
          r6(col("overlap_at_k")).as("overlap_at_k"),
          r6(col("rbo")).as("rbo"), col("footrule")),
    Some("""
      WITH ca AS (SELECT unnest(string_split(text, ' ')) AS t
                  FROM documents WHERE doc_id % 2 = 0),
      ga AS (SELECT t, count(*) AS c FROM ca GROUP BY 1),
      tka AS (SELECT t, row_number() OVER (ORDER BY c DESC, t) AS ra
              FROM ga QUALIFY ra <= 50),
      cb AS (SELECT unnest(string_split(text, ' ')) AS t
             FROM documents WHERE doc_id % 2 = 1),
      gb AS (SELECT t, count(*) AS c FROM cb GROUP BY 1),
      tkb AS (SELECT t, row_number() OVER (ORDER BY c DESC, t) AS rb
              FROM gb QUALIFY rb <= 50),
      j AS (SELECT ra, rb FROM tka FULL OUTER JOIN tkb ON tka.t = tkb.t),
      dg AS (SELECT unnest(generate_series(1, 50)) AS dd),
      xd AS (SELECT dd, count(*)::DOUBLE AS x FROM dg
             JOIN j ON ra <= dd AND rb <= dd GROUP BY 1),
      rbo AS (SELECT sum((1 - 0.9) * pow(0.9, dd - 1) *
                coalesce(x, 0) / dd) AS rbo
              FROM dg LEFT JOIN xd USING (dd)),
      sh AS (SELECT sum(CASE WHEN ra IS NOT NULL AND rb IS NOT NULL
                 THEN 1 ELSE 0 END)::BIGINT AS n_shared,
               sum(CASE WHEN ra IS NOT NULL AND rb IS NOT NULL
                 THEN abs(ra - rb) END)::BIGINT AS footrule
             FROM j)
      SELECT 50 AS k, n_shared,
             round(n_shared / 50.0, 6) AS overlap_at_k,
             round(rbo.rbo, 6) AS rbo, footrule
      FROM sh, rbo"""))

  /** Session-quality panel by exit event type: 30-min-gap sessions
    * grouped by their last event — exit share, bounce rate, mean
    * length and duration per exit type. */
  private val q526 = Entry(
    "q526_session_quality",
    (s, d) =>
      graft.ops.Behavioral.sessionQuality(Tables.events(s, d),
          "user_id", "ts", "event_id", "event_type")
        .select(col("exit_type"), col("n_sessions"),
          r6(col("session_share")).as("session_share"),
          r6(col("bounce_rate")).as("bounce_rate"),
          r6(col("mean_events")).as("mean_events"),
          r6(col("mean_duration_sec")).as("mean_duration_sec"))
        .orderBy("exit_type"),
    Some("""
      WITH e AS (SELECT user_id, event_id, event_type,
                   floor(epoch(ts))::BIGINT AS sec
                 FROM events),
      w1 AS (SELECT *, lag(sec) OVER (PARTITION BY user_id
               ORDER BY sec, event_id) AS prev FROM e),
      w2 AS (SELECT *, CASE WHEN prev IS NULL OR sec - prev > 1800
               THEN 1 ELSE 0 END AS nw FROM w1),
      w3 AS (SELECT *, sum(nw) OVER (PARTITION BY user_id
               ORDER BY sec, event_id ROWS UNBOUNDED PRECEDING) AS sid
             FROM w2),
      w4 AS (SELECT *, row_number() OVER (PARTITION BY user_id, sid
               ORDER BY sec DESC, event_id DESC) AS rnd FROM w3),
      sess AS (SELECT user_id, sid, count(*)::DOUBLE AS n,
                 max(sec) - min(sec) AS dur,
                 max(CASE WHEN rnd = 1 THEN event_type END) AS ex
               FROM w4 GROUP BY 1, 2),
      pe AS (SELECT ex AS exit_type, count(*)::BIGINT AS n_sessions,
               avg(CASE WHEN n = 1 THEN 1.0 ELSE 0.0 END) AS bounce_rate,
               avg(n) AS mean_events, avg(dur) AS mean_duration_sec
             FROM sess GROUP BY 1),
      t AS (SELECT sum(n_sessions)::DOUBLE AS tt FROM pe)
      SELECT exit_type, n_sessions,
             round(n_sessions / tt, 6) AS session_share,
             round(bounce_rate, 6) AS bounce_rate,
             round(mean_events, 6) AS mean_events,
             round(mean_duration_sec, 6) AS mean_duration_sec
      FROM pe, t ORDER BY exit_type"""))

  /** Wang–Smith–Hyndman trend/seasonal strength per event type from
    * the q230 STL-lite components — the forecastability screen. */
  private val q527 = Entry(
    "q527_stl_strength",
    (s, d) =>
      graft.ops.TimeSeries.stlStrength(Tables.events(s, d),
          Seq("event_type"), "ts", "value", period = 7, halfWindow = 3)
        .select(col("event_type"), col("n_days"),
          r6(col("var_remainder")).as("var_remainder"),
          r6(col("f_trend")).as("f_trend"),
          r6(col("f_seasonal")).as("f_seasonal"))
        .orderBy("event_type"),
    Some("""
      WITH d AS (SELECT event_type AS g, date_trunc('day', ts)::DATE
                   AS day, sum("value") AS y
                 FROM events GROUP BY 1, 2),
      t AS (SELECT g, day, y,
                   CASE WHEN count(*) OVER wnd = 7
                        THEN avg(y) OVER wnd END AS trend,
                   date_diff('day', DATE '2024-01-01', day) % 7 AS ph
            FROM d WINDOW wnd AS (PARTITION BY g ORDER BY day
              ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      s0 AS (SELECT g, ph, avg(y - trend) AS s0 FROM t
             WHERE trend IS NOT NULL GROUP BY 1, 2),
      sm AS (SELECT g, avg(s0) AS sm FROM s0 GROUP BY 1),
      se AS (SELECT s0.g, ph, s0 - sm AS seasonal
             FROM s0 JOIN sm ON sm.g = s0.g),
      r AS (SELECT t.g, t.y, t.trend, se.seasonal,
              t.y - t.trend - se.seasonal AS rem
            FROM t LEFT JOIN se ON se.g = t.g AND se.ph = t.ph
            WHERE t.trend IS NOT NULL AND se.seasonal IS NOT NULL)
      SELECT g AS event_type, count(*)::BIGINT AS n_days,
             round(var_samp(rem), 6) AS var_remainder,
             round(CASE WHEN var_samp(y - seasonal) > 0
               THEN greatest(0, 1 - var_samp(rem) /
                 var_samp(y - seasonal)) END, 6) AS f_trend,
             round(CASE WHEN var_samp(y - trend) > 0
               THEN greatest(0, 1 - var_samp(rem) /
                 var_samp(y - trend)) END, 6) AS f_seasonal
      FROM r GROUP BY 1 ORDER BY 1"""))

  /** Overdispersion panel: per-type Fano factor of daily counts +
    * the cross-type Taylor's-law exponent — Poisson vs bursty
    * arrivals, every number from exact integer count sums. */
  private val q528 = Entry(
    "q528_fano_taylor",
    (s, d) =>
      graft.ops.TimeSeries.fanoTaylor(Tables.events(s, d),
          "event_type", "ts")
        .select(col("event_type"), col("n_days"),
          r6(col("mean_daily")).as("mean_daily"),
          r6(col("var_daily")).as("var_daily"),
          r6(col("fano")).as("fano"),
          r6(col("taylor_slope")).as("taylor_slope"))
        .orderBy("event_type"),
    Some("""
      WITH d AS (SELECT event_type AS g, ts::DATE AS day,
                   count(*)::DOUBLE AS y
                 FROM events
                 WHERE ts IS NOT NULL AND event_type IS NOT NULL
                 GROUP BY 1, 2),
      p AS (SELECT g, count(*)::DOUBLE AS n, sum(y) AS s1,
              sum(y * y) AS s2
            FROM d GROUP BY 1),
      p2 AS (SELECT g, n, s1 / n AS m,
               (s2 - n * (s1 / n) * (s1 / n)) / (n - 1) AS v
             FROM p),
      f AS (SELECT count(*)::DOUBLE AS k, avg(ln(m)) AS xb,
              avg(ln(v)) AS yb, sum(ln(m) * ln(m)) AS xx,
              sum(ln(m) * ln(v)) AS xy
            FROM p2 WHERE v > 0 AND m > 0),
      sl AS (SELECT (xy - k * xb * yb) / (xx - k * xb * xb) AS slope
             FROM f)
      SELECT g AS event_type, n::BIGINT AS n_days,
             round(m, 6) AS mean_daily, round(v, 6) AS var_daily,
             round(CASE WHEN m > 0 THEN v / m END, 6) AS fano,
             round(slope, 6) AS taylor_slope
      FROM p2, sl ORDER BY 1"""))

  /** Order→ship open-line work-in-progress curve: daily +1/−1 net
    * changes prefix-summed in date order — interval concurrency
    * without exploding each line into its open days. Integer-exact. */
  private val q529 = Entry(
    "q529_open_lines_wip",
    (s, d) =>
      graft.ops.TimeSeries.intervalLoadCurve(
          Tables.lineitem(s, d).join(Tables.orders(s, d),
            col("l_orderkey") === col("o_orderkey")),
          "o_orderdate", "l_shipdate")
        .select(col("day"), col("started"), col("ended"), col("active"))
        .orderBy("day"),
    Some("""
      WITH li AS (SELECT o_orderdate, l_shipdate
                  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      ev AS (SELECT o_orderdate::DATE AS day, 1 AS s, 0 AS e
             FROM li WHERE o_orderdate IS NOT NULL
             UNION ALL
             SELECT l_shipdate::DATE, 0, 1 FROM li
             WHERE l_shipdate IS NOT NULL),
      d AS (SELECT day, sum(s)::BIGINT AS started,
              sum(e)::BIGINT AS ended
            FROM ev GROUP BY 1)
      SELECT day, started, ended,
             (sum(started - ended) OVER (ORDER BY day
               ROWS UNBOUNDED PRECEDING))::BIGINT AS active
      FROM d ORDER BY day"""))

  /** Epidemiological 2×2 risk panel — weekend exposure vs high-value
    * outcome: RR/OR/risk difference/NNT with log-Wald CIs and
    * VanderWeele's E-value confounding bound. */
  private val q530 = Entry(
    "q530_risk_panel",
    (s, d) =>
      graft.ops.Evaluation.riskPanel(
          Tables.events(s, d)
            .where(col("ts").isNotNull && col("value").isNotNull),
          exposed = pmod(datediff(to_date(col("ts")),
            lit("2024-01-01")), lit(7)).isin(5, 6),
          outcome = col("value") > 200)
        .select(col("n_exposed"), col("n_unexposed"),
          r6(col("risk_exposed")).as("risk_exposed"),
          r6(col("risk_unexposed")).as("risk_unexposed"),
          r6(col("rr")).as("rr"), r6(col("rr_lo")).as("rr_lo"),
          r6(col("rr_hi")).as("rr_hi"),
          r6(col("odds_ratio")).as("odds_ratio"),
          r6(col("or_lo")).as("or_lo"), r6(col("or_hi")).as("or_hi"),
          r6(col("risk_diff")).as("risk_diff"), r6(col("nnt")).as("nnt"),
          r6(col("e_value")).as("e_value")),
    Some("""
      WITH b AS (SELECT
              (date_diff('day', DATE '2024-01-01', ts::DATE) % 7)
                IN (5, 6) AS ex,
              "value" > 200 AS oc
            FROM events WHERE ts IS NOT NULL AND "value" IS NOT NULL),
      c AS (SELECT
              sum(CASE WHEN ex AND oc THEN 1.0 ELSE 0 END) AS a,
              sum(CASE WHEN ex AND NOT oc THEN 1.0 ELSE 0 END) AS bb,
              sum(CASE WHEN NOT ex AND oc THEN 1.0 ELSE 0 END) AS cc,
              sum(CASE WHEN NOT ex AND NOT oc THEN 1.0 ELSE 0 END) AS dd
            FROM b),
      m AS (SELECT a, bb, cc, dd, a / (a + bb) AS r1, cc / (cc + dd) AS r0,
              (a / (a + bb)) / (cc / (cc + dd)) AS rr,
              sqrt(1 / a - 1 / (a + bb) + 1 / cc - 1 / (cc + dd)) AS selr,
              a * dd / (bb * cc) AS orr,
              sqrt(1 / a + 1 / bb + 1 / cc + 1 / dd) AS selo,
              a > 0 AND bb > 0 AND cc > 0 AND dd > 0 AS ok
            FROM c),
      m2 AS (SELECT *, CASE WHEN rr >= 1 THEN rr ELSE 1 / rr END AS rs
             FROM m)
      SELECT (a + bb)::BIGINT AS n_exposed,
             (cc + dd)::BIGINT AS n_unexposed,
             round(CASE WHEN ok THEN r1 END, 6) AS risk_exposed,
             round(CASE WHEN ok THEN r0 END, 6) AS risk_unexposed,
             round(CASE WHEN ok THEN rr END, 6) AS rr,
             round(CASE WHEN ok THEN exp(ln(rr) - 1.96 * selr) END, 6)
               AS rr_lo,
             round(CASE WHEN ok THEN exp(ln(rr) + 1.96 * selr) END, 6)
               AS rr_hi,
             round(CASE WHEN ok THEN orr END, 6) AS odds_ratio,
             round(CASE WHEN ok THEN exp(ln(orr) - 1.96 * selo) END, 6)
               AS or_lo,
             round(CASE WHEN ok THEN exp(ln(orr) + 1.96 * selo) END, 6)
               AS or_hi,
             round(CASE WHEN ok THEN r1 - r0 END, 6) AS risk_diff,
             round(CASE WHEN ok AND abs(r1 - r0) > 0
               THEN 1 / abs(r1 - r0) END, 6) AS nnt,
             round(CASE WHEN ok THEN rs + sqrt(rs * (rs - 1)) END, 6)
               AS e_value
      FROM m2"""))

  /** DerSimonian–Laird meta-analysis of the weekend effect across
    * event types: fixed/random-effect pools, Cochran Q, I², τ², and
    * Egger's small-study-bias intercept — strata as "studies". */
  private val q531 = Entry(
    "q531_meta_analysis",
    (s, d) =>
      graft.ops.Evaluation.metaAnalysis(
          Tables.events(s, d)
            .where(col("ts").isNotNull && col("value").isNotNull),
          "event_type",
          exposed = pmod(datediff(to_date(col("ts")),
            lit("2024-01-01")), lit(7)).isin(5, 6),
          "value")
        .select(col("k"), r6(col("fe_effect")).as("fe_effect"),
          r6(col("fe_se")).as("fe_se"), r6(col("q_stat")).as("q_stat"),
          r6(col("i2")).as("i2"), r6(col("tau2")).as("tau2"),
          r6(col("re_effect")).as("re_effect"),
          r6(col("re_se")).as("re_se"),
          r6(col("egger_intercept")).as("egger_intercept")),
    Some("""
      WITH b AS (SELECT event_type AS g,
              (date_diff('day', DATE '2024-01-01', ts::DATE) % 7)
                IN (5, 6) AS ex,
              "value"::DOUBLE AS v
            FROM events
            WHERE ts IS NOT NULL AND "value" IS NOT NULL
              AND event_type IS NOT NULL),
      per AS (SELECT g,
                count(CASE WHEN ex THEN 1 END)::DOUBLE AS n1,
                avg(CASE WHEN ex THEN v END) AS m1,
                var_samp(CASE WHEN ex THEN v END) AS v1,
                count(CASE WHEN NOT ex THEN 1 END)::DOUBLE AS n0,
                avg(CASE WHEN NOT ex THEN v END) AS m0,
                var_samp(CASE WHEN NOT ex THEN v END) AS v0
              FROM b GROUP BY 1),
      st AS (SELECT g, m1 - m0 AS th, v1 / n1 + v0 / n0 AS se2
             FROM per WHERE n1 > 1 AND n0 > 1),
      st2 AS (SELECT g, th, se2 FROM st WHERE se2 > 0),
      fe AS (SELECT count(*)::DOUBLE AS k, sum(1 / se2) AS sw,
               sum(th / se2) AS swt,
               sum((1 / se2) * (1 / se2)) AS sw2,
               sum(th / sqrt(se2)) AS ey, sum(1 / sqrt(se2)) AS ex2,
               sum(1 / se2) AS exx, sum(th / se2) AS exy
             FROM st2),
      q AS (SELECT fe.*, swt / sw AS feff,
              (SELECT sum((th - swt / sw) * (th - swt / sw) / se2)
               FROM st2, fe) AS qq
            FROM fe),
      t2 AS (SELECT q.*, CASE WHEN sw - sw2 / sw > 0
               THEN greatest(0, (qq - (k - 1)) / (sw - sw2 / sw))
               ELSE 0 END AS tau2
             FROM q)
      SELECT k::BIGINT AS k, round(feff, 6) AS fe_effect,
             round(1 / sqrt(sw), 6) AS fe_se, round(qq, 6) AS q_stat,
             round(CASE WHEN qq > 0
               THEN greatest(0, (qq - (k - 1)) / qq)
               ELSE 0 END, 6) AS i2,
             round(tau2, 6) AS tau2,
             round((SELECT sum(th / (se2 + tau2)) FROM st2, t2) /
               (SELECT sum(1 / (se2 + tau2)) FROM st2, t2), 6)
               AS re_effect,
             round(1 / sqrt((SELECT sum(1 / (se2 + tau2))
               FROM st2, t2)), 6) AS re_se,
             round(CASE WHEN abs(k - ex2 * ex2 / exx) > 1e-12
               THEN (ey - exy * ex2 / exx) / (k - ex2 * ex2 / exx)
               END, 6) AS egger_intercept
      FROM t2"""))

  /** AIPW doubly robust ATE on the q205 observational substrate:
    * stratum nuisances, efficient-influence-function SE — consistent
    * if either the propensity or the outcome model is right. */
  private val q532 = Entry(
    "q532_aipw",
    (s, d) =>
      graft.ops.Evaluation.aipwEffect(obsOrders(s, d),
          col("t") === 1L, "p", "y", bins = 5)
        .select(col("n"), col("n_used"),
          r6(col("ate_outcome")).as("ate_outcome"),
          r6(col("ate_ipw")).as("ate_ipw"),
          r6(col("ate_aipw")).as("ate_aipw"),
          r6(col("se_aipw")).as("se_aipw")),
    Some(s"""
      WITH $obsOrdersSql,
      b AS (SELECT least(floor(p * 5), 4)::BIGINT AS st, t, y FROM sc
            WHERE p IS NOT NULL AND y IS NOT NULL),
      cl AS (SELECT st, count(*)::DOUBLE AS ns,
               sum(CASE WHEN t = 1 THEN 1.0 ELSE 0 END) AS nt,
               avg(CASE WHEN t = 1 THEN y END) AS m1,
               avg(CASE WHEN t = 0 THEN y END) AS m0
             FROM b GROUP BY 1),
      cl2 AS (SELECT st, ns, m1, m0, nt / ns AS e FROM cl
              WHERE nt > 0 AND ns - nt > 0),
      tot AS (SELECT count(*)::BIGINT AS nall FROM b),
      j AS (SELECT b.t::DOUBLE AS t, b.y, cl2.m1, cl2.m0, cl2.e
            FROM b JOIN cl2 ON cl2.st = b.st)
      SELECT max(nall) AS n, count(*)::BIGINT AS n_used,
             round(avg(m1 - m0), 6) AS ate_outcome,
             round(sum(t * y / e) / sum(t / e) -
               sum((1 - t) * y / (1 - e)) / sum((1 - t) / (1 - e)), 6)
               AS ate_ipw,
             round(avg(m1 - m0 + t * (y - m1) / e -
               (1 - t) * (y - m0) / (1 - e)), 6) AS ate_aipw,
             round(stddev_samp(m1 - m0 + t * (y - m1) / e -
               (1 - t) * (y - m0) / (1 - e)) / sqrt(count(*)), 6)
               AS se_aipw
      FROM j, tot"""))

  /** Covariance spectral-mass panel of the embedding corpus:
    * participation ratio, stable rank, and λ_max by a 12-step power
    * iteration replayed verbatim as unrolled CTEs — the eigen-free
    * "how many dimensions actually carry variance" readout. */
  private val q533 = Entry(
    "q533_spectral_mass",
    (s, d) =>
      graft.ops.Features.spectralMassPanel(Tables.embeddings(s, d),
          "vec_id", "embedding", d = 64, iterations = 12)
        .select(col("d"), r6(col("trace")).as("trace"),
          r6(col("frob_sq")).as("frob_sq"),
          r6(col("participation_ratio")).as("participation_ratio"),
          r6(col("lambda_max")).as("lambda_max"),
          r6(col("stable_rank")).as("stable_rank"),
          r6(col("top_share")).as("top_share")),
    Some("""
      WITH ex AS MATERIALIZED (SELECT vec_id, i, v[i] AS x
             FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings WHERE embedding IS NOT NULL),
                  range(1, 65) t(i)),
      mm AS MATERIALIZED (SELECT i, avg(x) AS mu FROM ex GROUP BY 1),
      xy AS MATERIALIZED (SELECT a.i, b.i AS j, avg(a.x * b.x) AS exy
             FROM ex a JOIN ex b ON a.vec_id = b.vec_id GROUP BY 1, 2),
      cc AS MATERIALIZED (SELECT xy.i, xy.j, exy - ma.mu * mb.mu AS c
             FROM xy JOIN mm ma ON ma.i = xy.i
               JOIN mm mb ON mb.i = xy.j),
      x0 AS MATERIALIZED (SELECT i, 1.0 / sqrt(64) AS x
             FROM range(1, 65) t(i)),
      y1 AS MATERIALIZED (SELECT cc.j AS i,
               sum(x0.x * cc.c) AS y
             FROM x0 JOIN cc ON cc.i = x0.i GROUP BY 1),
      n1 AS MATERIALIZED (SELECT sqrt(sum(y * y)) AS nm FROM y1),
      x1 AS MATERIALIZED (SELECT i, y / nm AS x FROM y1, n1),
      y2 AS MATERIALIZED (SELECT cc.j AS i,
               sum(x1.x * cc.c) AS y
             FROM x1 JOIN cc ON cc.i = x1.i GROUP BY 1),
      n2 AS MATERIALIZED (SELECT sqrt(sum(y * y)) AS nm FROM y2),
      x2 AS MATERIALIZED (SELECT i, y / nm AS x FROM y2, n2),
      y3 AS MATERIALIZED (SELECT cc.j AS i,
               sum(x2.x * cc.c) AS y
             FROM x2 JOIN cc ON cc.i = x2.i GROUP BY 1),
      n3 AS MATERIALIZED (SELECT sqrt(sum(y * y)) AS nm FROM y3),
      x3 AS MATERIALIZED (SELECT i, y / nm AS x FROM y3, n3),
      y4 AS MATERIALIZED (SELECT cc.j AS i,
               sum(x3.x * cc.c) AS y
             FROM x3 JOIN cc ON cc.i = x3.i GROUP BY 1),
      n4 AS MATERIALIZED (SELECT sqrt(sum(y * y)) AS nm FROM y4),
      x4 AS MATERIALIZED (SELECT i, y / nm AS x FROM y4, n4),
      y5 AS MATERIALIZED (SELECT cc.j AS i,
               sum(x4.x * cc.c) AS y
             FROM x4 JOIN cc ON cc.i = x4.i GROUP BY 1),
      n5 AS MATERIALIZED (SELECT sqrt(sum(y * y)) AS nm FROM y5),
      x5 AS MATERIALIZED (SELECT i, y / nm AS x FROM y5, n5),
      y6 AS MATERIALIZED (SELECT cc.j AS i,
               sum(x5.x * cc.c) AS y
             FROM x5 JOIN cc ON cc.i = x5.i GROUP BY 1),
      n6 AS MATERIALIZED (SELECT sqrt(sum(y * y)) AS nm FROM y6),
      x6 AS MATERIALIZED (SELECT i, y / nm AS x FROM y6, n6),
      y7 AS MATERIALIZED (SELECT cc.j AS i,
               sum(x6.x * cc.c) AS y
             FROM x6 JOIN cc ON cc.i = x6.i GROUP BY 1),
      n7 AS MATERIALIZED (SELECT sqrt(sum(y * y)) AS nm FROM y7),
      x7 AS MATERIALIZED (SELECT i, y / nm AS x FROM y7, n7),
      y8 AS MATERIALIZED (SELECT cc.j AS i,
               sum(x7.x * cc.c) AS y
             FROM x7 JOIN cc ON cc.i = x7.i GROUP BY 1),
      n8 AS MATERIALIZED (SELECT sqrt(sum(y * y)) AS nm FROM y8),
      x8 AS MATERIALIZED (SELECT i, y / nm AS x FROM y8, n8),
      y9 AS MATERIALIZED (SELECT cc.j AS i,
               sum(x8.x * cc.c) AS y
             FROM x8 JOIN cc ON cc.i = x8.i GROUP BY 1),
      n9 AS MATERIALIZED (SELECT sqrt(sum(y * y)) AS nm FROM y9),
      x9 AS MATERIALIZED (SELECT i, y / nm AS x FROM y9, n9),
      y10 AS MATERIALIZED (SELECT cc.j AS i,
               sum(x9.x * cc.c) AS y
             FROM x9 JOIN cc ON cc.i = x9.i GROUP BY 1),
      n10 AS MATERIALIZED (SELECT sqrt(sum(y * y)) AS nm FROM y10),
      x10 AS MATERIALIZED (SELECT i, y / nm AS x FROM y10, n10),
      y11 AS MATERIALIZED (SELECT cc.j AS i,
               sum(x10.x * cc.c) AS y
             FROM x10 JOIN cc ON cc.i = x10.i GROUP BY 1),
      n11 AS MATERIALIZED (SELECT sqrt(sum(y * y)) AS nm FROM y11),
      x11 AS MATERIALIZED (SELECT i, y / nm AS x FROM y11, n11),
      y12 AS MATERIALIZED (SELECT cc.j AS i,
               sum(x11.x * cc.c) AS y
             FROM x11 JOIN cc ON cc.i = x11.i GROUP BY 1),
      n12 AS MATERIALIZED (SELECT sqrt(sum(y * y)) AS nm FROM y12),
      x12 AS MATERIALIZED (SELECT i, y / nm AS x FROM y12, n12),
      lam AS (SELECT sum(xa.x * cc.c * xb.x) AS lmax
              FROM cc JOIN x12 xa ON xa.i = cc.i
                JOIN x12 xb ON xb.i = cc.j),
      tr AS (SELECT sum(c) AS trace FROM cc WHERE i = j),
      fr AS (SELECT sum(c * c) AS frob FROM cc)
      SELECT 64::BIGINT AS d, round(trace, 6) AS trace,
             round(frob, 6) AS frob_sq,
             round(trace * trace / frob, 6) AS participation_ratio,
             round(lmax, 6) AS lambda_max,
             round(trace / lmax, 6) AS stable_rank,
             round(lmax / trace, 6) AS top_share
      FROM tr, fr, lam"""))

  /** Alignment & uniformity (Wang & Isola) of the embedding corpus on
    * deterministic positive (consecutive same-label) and background
    * (half-offset) pairs — collapse shows up as great alignment with
    * terrible uniformity. */
  private val q534 = Entry(
    "q534_align_uniformity",
    (s, d) =>
      graft.ops.Features.alignmentUniformity(Tables.embeddings(s, d),
          "vec_id", "embedding", "label")
        .select(col("n_pos"), r6(col("alignment")).as("alignment"),
          col("n_background"), r6(col("uniformity")).as("uniformity")),
    Some("""
      WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings WHERE embedding IS NOT NULL),
      nn AS (SELECT vec_id, sqrt(sum(v[i] * v[i])) AS nm
             FROM e, range(1, 65) t(i) GROUP BY 1),
      e2 AS (SELECT e.vec_id, e.label, e.v, nn.nm
             FROM e JOIN nn USING (vec_id) WHERE nn.nm > 0),
      ct AS (SELECT count(*)::BIGINT AS cnt FROM e2),
      posd AS (SELECT a.vec_id,
                 sum(a.v[i] * b.v[i]) / (a.nm * b.nm) AS cs
               FROM e2 a JOIN e2 b ON b.vec_id = a.vec_id + 1
                 AND b.label = a.label, range(1, 65) t(i)
               GROUP BY a.vec_id, a.nm, b.nm),
      pa AS (SELECT count(*)::BIGINT AS n_pos,
               avg(2 - 2 * cs) AS alignment FROM posd),
      bgd AS (SELECT a.vec_id,
                sum(a.v[i] * b.v[i]) / (a.nm * b.nm) AS cs
              FROM e2 a JOIN e2 b
                ON b.vec_id = a.vec_id + (SELECT cnt // 2 FROM ct),
                range(1, 65) t(i)
              GROUP BY a.vec_id, a.nm, b.nm),
      ub AS (SELECT count(*)::BIGINT AS n_background,
               ln(avg(exp(-2 * (2 - 2 * cs)))) AS uniformity FROM bgd)
      SELECT n_pos, round(alignment, 6) AS alignment, n_background,
             round(uniformity, 6) AS uniformity
      FROM pa, ub"""))

  /** Hubness panel over the 512 smallest-id embeddings: k-occurrence
    * skewness, the biggest hub, and the anti-hub fraction — the
    * high-dimensional retrieval pathology screen. */
  private val q535 = Entry(
    "q535_hubness",
    (s, d) =>
      graft.ops.Features.hubnessPanel(Tables.embeddings(s, d),
          "vec_id", "embedding", cap = 512, k = 5)
        .select(col("n_sample"), col("k"),
          r6(col("skew_kocc")).as("skew_kocc"), col("max_kocc"),
          r6(col("frac_antihub")).as("frac_antihub")),
    Some("""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings WHERE embedding IS NOT NULL),
      s0 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 512),
      nn AS (SELECT vec_id, sqrt(sum(v[i] * v[i])) AS nm
             FROM s0, range(1, 65) t(i) GROUP BY 1),
      s AS (SELECT s0.vec_id, v, nm FROM s0 JOIN nn USING (vec_id)
            WHERE nm > 0),
      sims AS (SELECT a.vec_id AS ai, b.vec_id AS bi,
                 sum(a.v[i] * b.v[i]) / (a.nm * b.nm) AS sim
               FROM s a JOIN s b ON a.vec_id <> b.vec_id,
                 range(1, 65) t(i)
               GROUP BY a.vec_id, b.vec_id, a.nm, b.nm),
      tk AS (SELECT ai, bi FROM sims QUALIFY row_number()
               OVER (PARTITION BY ai ORDER BY sim DESC, bi) <= 5),
      ko AS (SELECT s.vec_id, coalesce(t.c, 0) AS kk
             FROM s LEFT JOIN (SELECT bi, count(*)::DOUBLE AS c
               FROM tk GROUP BY 1) t ON t.bi = s.vec_id)
      SELECT count(*)::BIGINT AS n_sample, 5 AS k,
             round((avg(kk * kk * kk) - 3 * avg(kk) * avg(kk * kk)
               + 2 * avg(kk) * avg(kk) * avg(kk)) /
               pow(avg(kk * kk) - avg(kk) * avg(kk), 1.5), 6)
               AS skew_kocc,
             max(kk)::BIGINT AS max_kocc,
             round(avg(CASE WHEN kk = 0 THEN 1.0 ELSE 0 END), 6)
               AS frac_antihub
      FROM ko"""))

  /** Weibull order→ship duration fit by log-moment matching (closed
    * form, no iterative MLE), graded against the exact-DISC observed
    * median/p90. */
  private val q536 = Entry(
    "q536_weibull_fit",
    (s, d) =>
      graft.ops.Survival.weibullFit(
          Tables.lineitem(s, d).join(Tables.orders(s, d),
              col("l_orderkey") === col("o_orderkey"))
            .withColumn("__dur",
              datediff(col("l_shipdate"), col("o_orderdate")) + 1),
          "__dur")
        .select(col("n"), r6(col("k_shape")).as("k_shape"),
          r6(col("lambda_scale")).as("lambda_scale"),
          r6(col("fit_median")).as("fit_median"),
          r6(col("obs_median")).as("obs_median"),
          r6(col("fit_p90")).as("fit_p90"),
          r6(col("obs_p90")).as("obs_p90")),
    Some("""
      WITH li AS (SELECT date_diff('day', o_orderdate::DATE,
                    l_shipdate::DATE) + 1 AS t0
                  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      b AS (SELECT t0::DOUBLE AS t FROM li WHERE t0 > 0),
      m AS (SELECT count(*)::DOUBLE AS n, avg(ln(t)) AS mm,
              stddev_samp(ln(t)) AS s FROM b),
      k AS (SELECT n, pi() / (s * sqrt(6)) AS kk,
              exp(mm + 0.5772156649015329 /
                (pi() / (s * sqrt(6)))) AS lam
            FROM m),
      q AS (SELECT quantile_disc(t, 0.5) AS om,
              quantile_disc(t, 0.9) AS o9 FROM b)
      SELECT n::BIGINT AS n, round(kk, 6) AS k_shape,
             round(lam, 6) AS lambda_scale,
             round(lam * pow(ln(2), 1 / kk), 6) AS fit_median,
             round(om, 6) AS obs_median,
             round(lam * pow(ln(10), 1 / kk), 6) AS fit_p90,
             round(o9, 6) AS obs_p90
      FROM k, q"""))

  /** Lorenz asymmetry S = F(μ) + L(μ): is revenue inequality driven
    * by many small or a few giant line items — the direction the
    * Gini alone can't give. */
  private val q537 = Entry(
    "q537_lorenz_asymmetry",
    (s, d) =>
      graft.ops.Profiling.lorenzAsymmetry(Tables.lineitem(s, d),
          "l_extendedprice")
        .select(col("n"), r6(col("mean")).as("mean"),
          r6(col("f_mu")).as("f_mu"), r6(col("l_mu")).as("l_mu"),
          r6(col("asymmetry")).as("asymmetry")),
    Some("""
      WITH b AS (SELECT l_extendedprice::DOUBLE AS x FROM lineitem
                 WHERE l_extendedprice > 0),
      m AS (SELECT avg(x) AS mu FROM b)
      SELECT count(*)::BIGINT AS n, round(max(mu), 6) AS mean,
             round(avg(CASE WHEN x < mu THEN 1.0 ELSE 0 END), 6) AS f_mu,
             round(sum(CASE WHEN x < mu THEN x ELSE 0 END) / sum(x), 6)
               AS l_mu,
             round(avg(CASE WHEN x < mu THEN 1.0 ELSE 0 END) +
               sum(CASE WHEN x < mu THEN x ELSE 0 END) / sum(x), 6)
               AS asymmetry
      FROM b, m"""))

  /** Digit-heaping screen on order totals: last-cent-digit χ² vs
    * uniform + round-number heaping shares — the trailing-digit
    * complement to q140's Benford first-digit law. */
  private val q538 = Entry(
    "q538_digit_heaping",
    (s, d) =>
      graft.ops.Profiling.digitHeaping(Tables.orders(s, d),
          "o_totalprice")
        .select(col("n"), r6(col("chi2_last_digit")).as("chi2_last_digit"),
          col("df"), r6(col("share_mod5")).as("share_mod5"),
          r6(col("share_mod10")).as("share_mod10")),
    Some("""
      WITH b AS (SELECT round(o_totalprice * 100)::BIGINT % 10 AS cd,
                   floor(o_totalprice)::BIGINT % 10 AS id
                 FROM orders WHERE o_totalprice >= 0),
      c AS (SELECT cd, count(*)::DOUBLE AS n FROM b GROUP BY 1),
      t AS (SELECT sum(n) AS tt FROM c),
      x2 AS (SELECT max(tt) AS tt,
               sum((n - tt / 10) * (n - tt / 10) / (tt / 10)) AS chi2
             FROM c, t),
      h AS (SELECT avg(CASE WHEN id % 5 = 0 THEN 1.0 ELSE 0 END) AS s5,
              avg(CASE WHEN id = 0 THEN 1.0 ELSE 0 END) AS s10
            FROM b)
      SELECT tt::BIGINT AS n, round(chi2, 6) AS chi2_last_digit,
             9::BIGINT AS df, round(s5, 6) AS share_mod5,
             round(s10, 6) AS share_mod10
      FROM x2, h"""))

  /** Reliability panel of 'error' events per user stream: MTBF, MTTR
    * (next non-error recovery proxy), failures per kilo-event, and
    * availability. */
  private val q539 = Entry(
    "q539_reliability",
    (s, d) =>
      graft.ops.Behavioral.reliabilityPanel(Tables.events(s, d),
          "user_id", "ts", "event_id", "event_type", "error")
        .select(col("n_events"), col("n_failures"),
          r6(col("mtbf_sec")).as("mtbf_sec"),
          r6(col("mttr_sec")).as("mttr_sec"),
          r6(col("failures_per_1k")).as("failures_per_1k"),
          r6(col("availability")).as("availability")),
    Some("""
      WITH e AS (SELECT user_id, event_id,
                   floor(epoch(ts))::BIGINT AS sec,
                   CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS f
                 FROM events),
      m AS (SELECT *, min(CASE WHEN f = 1 THEN sec END) OVER w AS nf,
              min(CASE WHEN f = 0 THEN sec END) OVER w AS nk
            FROM e WINDOW w AS (PARTITION BY user_id
              ORDER BY sec, event_id
              ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
      a AS (SELECT count(*)::BIGINT AS n_events,
              sum(f)::BIGINT AS n_failures,
              avg(CASE WHEN f = 1 THEN (nf - sec)::DOUBLE END) AS mtbf,
              avg(CASE WHEN f = 1 THEN (nk - sec)::DOUBLE END) AS mttr
            FROM m)
      SELECT n_events, n_failures, round(mtbf, 6) AS mtbf_sec,
             round(mttr, 6) AS mttr_sec,
             round(n_failures::DOUBLE / n_events * 1000, 6)
               AS failures_per_1k,
             round(CASE WHEN mtbf + mttr > 0
               THEN mtbf / (mtbf + mttr) END, 6) AS availability
      FROM a"""))

  /** Bradley–Terry supplier strength from cheaper-than-the-next-
    * supplier chain comparisons per part (the sparse comparison design
    * that keeps the pair frame O(lines), not O(suppliers²·parts)):
    * 4 fixed MM iterations, mean-1 renormalized, replayed as unrolled
    * materialized CTEs. */
  private val q540 = Entry(
    "q540_bradley_terry",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val unit = Tables.lineitem(s, d)
        .where(col("l_quantity") > 0)
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(round(avg(col("l_extendedprice") / col("l_quantity")), 6)
          .as("__up"))
      val w = Window.partitionBy("l_partkey")
        .orderBy(col("__up"), col("l_suppkey"))
      val chain = unit
        .withColumn("__ns", lead(col("l_suppkey"), 1).over(w))
        .withColumn("__nu", lead(col("__up"), 1).over(w))
        .where(col("__ns").isNotNull && col("__up") =!= col("__nu"))
      val pairs = chain
        .select(least(col("l_suppkey"), col("__ns")).as("sa"),
          greatest(col("l_suppkey"), col("__ns")).as("sb"),
          when(col("l_suppkey") < col("__ns"), 1L).otherwise(0L)
            .as("__wina"))
        .groupBy("sa", "sb")
        .agg(sum(col("__wina")).as("wa"),
          sum(lit(1L) - col("__wina")).as("wb"),
          count(lit(1)).as("__cnt"))
        // support pruning (the q163 discipline): single-game pairs are
        // noise — >= 2 games to enter the fit
        .where(col("__cnt") >= 2)
      graft.ops.Graph.bradleyTerry(pairs, "sa", "sb", "wa", "wb",
          iterations = 4)
        .select(col("item").as("supplier"), col("games"), col("wins"),
          r6(col("rating")).as("rating"))
        .orderBy("supplier")
    },
    Some("""
      WITH unit AS MATERIALIZED (
        SELECT l_partkey AS pk, l_suppkey AS sk,
               round(avg(l_extendedprice / l_quantity), 6) AS up
        FROM lineitem WHERE l_quantity > 0 GROUP BY 1, 2),
      ch AS (SELECT pk, sk, up, lead(sk) OVER wd AS ns,
               lead(up) OVER wd AS nu
             FROM unit WINDOW wd AS (PARTITION BY pk ORDER BY up, sk)),
      cf AS (SELECT least(sk, ns) AS sa, greatest(sk, ns) AS sb,
               CASE WHEN sk < ns THEN 1 ELSE 0 END AS wina
             FROM ch WHERE ns IS NOT NULL AND up <> nu),
      pr AS MATERIALIZED (
        SELECT sa, sb, sum(wina)::DOUBLE AS wa,
               sum(1 - wina)::DOUBLE AS wb
        FROM cf GROUP BY 1, 2 HAVING count(*) >= 2),
      sym AS MATERIALIZED (
        SELECT sa AS i, sb AS j, wa + wb AS g, wa AS w FROM pr
        UNION ALL SELECT sb, sa, wa + wb, wb FROM pr),
      it AS MATERIALIZED (SELECT i, sum(g) AS games, sum(w) AS wins
                          FROM sym GROUP BY 1),
      r0 AS MATERIALIZED (SELECT i, 1.0 AS r FROM it),
      d1 AS MATERIALIZED (SELECT sym.i, sum(g / (ri.r + rj.r)) AS den
             FROM sym JOIN r0 ri ON ri.i = sym.i
               JOIN r0 rj ON rj.i = sym.j GROUP BY 1),
      w1 AS MATERIALIZED (SELECT it.i, CASE WHEN den > 0
               THEN wins / den ELSE 0 END AS r
             FROM it JOIN d1 ON d1.i = it.i),
      m1 AS MATERIALIZED (SELECT avg(r) AS m FROM w1),
      r1 AS MATERIALIZED (SELECT i, r / m AS r FROM w1, m1),
      d2 AS MATERIALIZED (SELECT sym.i, sum(g / (ri.r + rj.r)) AS den
             FROM sym JOIN r1 ri ON ri.i = sym.i
               JOIN r1 rj ON rj.i = sym.j GROUP BY 1),
      w2 AS MATERIALIZED (SELECT it.i, CASE WHEN den > 0
               THEN wins / den ELSE 0 END AS r
             FROM it JOIN d2 ON d2.i = it.i),
      m2 AS MATERIALIZED (SELECT avg(r) AS m FROM w2),
      r2 AS MATERIALIZED (SELECT i, r / m AS r FROM w2, m2),
      d3 AS MATERIALIZED (SELECT sym.i, sum(g / (ri.r + rj.r)) AS den
             FROM sym JOIN r2 ri ON ri.i = sym.i
               JOIN r2 rj ON rj.i = sym.j GROUP BY 1),
      w3 AS MATERIALIZED (SELECT it.i, CASE WHEN den > 0
               THEN wins / den ELSE 0 END AS r
             FROM it JOIN d3 ON d3.i = it.i),
      m3 AS MATERIALIZED (SELECT avg(r) AS m FROM w3),
      r3 AS MATERIALIZED (SELECT i, r / m AS r FROM w3, m3),
      d4 AS MATERIALIZED (SELECT sym.i, sum(g / (ri.r + rj.r)) AS den
             FROM sym JOIN r3 ri ON ri.i = sym.i
               JOIN r3 rj ON rj.i = sym.j GROUP BY 1),
      w4 AS MATERIALIZED (SELECT it.i, CASE WHEN den > 0
               THEN wins / den ELSE 0 END AS r
             FROM it JOIN d4 ON d4.i = it.i),
      m4 AS MATERIALIZED (SELECT avg(r) AS m FROM w4),
      r4 AS MATERIALIZED (SELECT i, r / m AS r FROM w4, m4),
      fin AS (SELECT i, r FROM r4)
      SELECT it.i AS supplier, games::BIGINT AS games,
             wins::BIGINT AS wins, round(fin.r, 6) AS rating
      FROM it JOIN fin ON fin.i = it.i ORDER BY supplier"""))

  /** Kitagawa decomposition of the high-value-rate gap between the
    * two window halves: composition (type-mix) vs within-type rate
    * effects, exact with symmetric weights. */
  private val q541 = Entry(
    "q541_kitagawa",
    (s, d) => {
      val e = Tables.events(s, d)
        .where(col("ts").isNotNull && col("value").isNotNull &&
          col("event_type").isNotNull)
      val bounds = e.agg(min(to_date(col("ts"))).as("__lo"),
        max(to_date(col("ts"))).as("__hi"))
      val withCut = e.crossJoin(broadcast(bounds))
        .withColumn("__cut", date_add(col("__lo"),
          (datediff(col("__hi"), col("__lo")) / 2).cast("int")))
      graft.ops.Evaluation.kitagawa(withCut, "event_type",
          inB = to_date(col("ts")) > col("__cut"),
          outcome = col("value") > 200)
        .select(r6(col("rate_a")).as("rate_a"),
          r6(col("rate_b")).as("rate_b"), r6(col("gap")).as("gap"),
          r6(col("composition_effect")).as("composition_effect"),
          r6(col("rate_effect")).as("rate_effect"))
    },
    Some("""
      WITH b AS (SELECT event_type AS s, ts::DATE AS d,
                   "value" > 200 AS oc
                 FROM events
                 WHERE ts IS NOT NULL AND "value" IS NOT NULL
                   AND event_type IS NOT NULL),
      bd AS (SELECT min(d) AS lo, max(d) AS hi FROM b),
      cut AS (SELECT lo + (date_diff('day', lo, hi) // 2)::INTEGER AS cc
              FROM bd),
      cells AS (SELECT s,
                  sum(CASE WHEN d <= cc THEN 1.0 ELSE 0 END) AS na,
                  sum(CASE WHEN d <= cc AND oc THEN 1.0 ELSE 0 END)
                    AS ka,
                  sum(CASE WHEN d > cc THEN 1.0 ELSE 0 END) AS nb,
                  sum(CASE WHEN d > cc AND oc THEN 1.0 ELSE 0 END)
                    AS kb
                FROM b, cut GROUP BY 1),
      t AS (SELECT sum(na) AS ta, sum(nb) AS tb FROM cells),
      f AS (SELECT na / ta AS wa, nb / tb AS wb,
              CASE WHEN na > 0 THEN ka / na ELSE 0 END AS ra,
              CASE WHEN nb > 0 THEN kb / nb ELSE 0 END AS rb,
              ka, kb
            FROM cells, t)
      SELECT round(sum(ka) / max(t.ta), 6) AS rate_a,
             round(sum(kb) / max(t.tb), 6) AS rate_b,
             round(sum(kb) / max(t.tb) - sum(ka) / max(t.ta), 6) AS gap,
             round(sum((wb - wa) * (ra + rb) / 2), 6)
               AS composition_effect,
             round(sum((rb - ra) * (wa + wb) / 2), 6) AS rate_effect
      FROM f, t"""))

  /** Oaxaca–Blinder decomposition of the price gap between returned
    * and delivered line items into quantity-mix (explained) and
    * coefficient (unexplained) components. */
  private val q542 = Entry(
    "q542_oaxaca",
    (s, d) =>
      graft.ops.Evaluation.oaxacaBlinder(Tables.lineitem(s, d),
          inA = col("l_returnflag") === "R", "l_quantity",
          "l_extendedprice")
        .select(col("n_a"), col("n_b"), r6(col("gap")).as("gap"),
          r6(col("explained")).as("explained"),
          r6(col("unexplained")).as("unexplained"),
          r6(col("beta_a")).as("beta_a"), r6(col("beta_b")).as("beta_b"),
          r6(col("xbar_a")).as("xbar_a"), r6(col("xbar_b")).as("xbar_b")),
    Some("""
      WITH b AS (SELECT l_returnflag = 'R' AS ia,
                   l_quantity::DOUBLE AS x, l_extendedprice::DOUBLE AS y
                 FROM lineitem
                 WHERE l_quantity IS NOT NULL
                   AND l_extendedprice IS NOT NULL),
      m AS (SELECT
              count(CASE WHEN ia THEN 1 END)::DOUBLE AS na,
              avg(CASE WHEN ia THEN x END) AS xba,
              avg(CASE WHEN ia THEN y END) AS yba,
              sum(CASE WHEN ia THEN x * x ELSE 0 END) AS xxa,
              sum(CASE WHEN ia THEN x * y ELSE 0 END) AS xya,
              count(CASE WHEN NOT ia THEN 1 END)::DOUBLE AS nb,
              avg(CASE WHEN NOT ia THEN x END) AS xbb,
              avg(CASE WHEN NOT ia THEN y END) AS ybb,
              sum(CASE WHEN NOT ia THEN x * x ELSE 0 END) AS xxb,
              sum(CASE WHEN NOT ia THEN x * y ELSE 0 END) AS xyb
            FROM b),
      k AS (SELECT *,
              (xya - na * xba * yba) / (xxa - na * xba * xba) AS ba,
              (xyb - nb * xbb * ybb) / (xxb - nb * xbb * xbb) AS bb
            FROM m)
      SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b,
             round(yba - ybb, 6) AS gap,
             round((xba - xbb) * bb, 6) AS explained,
             round(yba - ybb - (xba - xbb) * bb, 6) AS unexplained,
             round(ba, 6) AS beta_a, round(bb, 6) AS beta_b,
             round(xba, 6) AS xbar_a, round(xbb, 6) AS xbar_b
      FROM k"""))

  /** "Fightin' words" (Monroe et al.): terms distinguishing the even
    * from the odd corpus half by Dirichlet-prior log-odds z-score —
    * the honest trending-terms ranking. */
  private val q543 = Entry(
    "q543_fightin_words",
    (s, d) =>
      graft.ops.TextAnalysis.fightinWords(Tables.documents(s, d),
          "doc_id", "text", alpha0 = 10.0, k = 20)
        .select(col("term"), col("n_a"), col("n_b"),
          r6(col("log_odds")).as("log_odds"), r6(col("z")).as("z")),
    Some("""
      WITH ca AS (SELECT t, count(*)::DOUBLE AS c FROM (
              SELECT unnest(string_split(text, ' ')) AS t
              FROM documents WHERE doc_id % 2 = 0) GROUP BY 1),
      cb AS (SELECT t, count(*)::DOUBLE AS c FROM (
              SELECT unnest(string_split(text, ' ')) AS t
              FROM documents WHERE doc_id % 2 = 1) GROUP BY 1),
      j AS (SELECT coalesce(ca.t, cb.t) AS t,
              coalesce(ca.c, 0) AS x, coalesce(cb.c, 0) AS y
            FROM ca FULL OUTER JOIN cb ON ca.t = cb.t),
      tt AS (SELECT sum(x) AS na, sum(y) AS nb FROM j),
      sc AS (SELECT t, x, y,
               (x + y) * 10.0 / (na + nb) AS aw, na, nb
             FROM j, tt),
      z AS (SELECT t, x, y,
              ln((x + aw) / (na + 10.0 - x - aw)) -
                ln((y + aw) / (nb + 10.0 - y - aw)) AS lo,
              1 / (x + aw) + 1 / (y + aw) AS s2
            FROM sc)
      SELECT t AS term, x::BIGINT AS n_a, y::BIGINT AS n_b,
             round(lo, 6) AS log_odds, round(lo / sqrt(s2), 6) AS z
      FROM z ORDER BY abs(lo / sqrt(s2)) DESC, term LIMIT 20"""))

  /** Hotspot scan: (event type × user decile) cells whose high-value
    * rate deviates most from the corpus rate, by binomial z — where
    * the anomaly concentrates. */
  private val q544 = Entry(
    "q544_hotspot_cells",
    (s, d) =>
      graft.ops.Profiling.hotspotCells(
          Tables.events(s, d)
            .where(col("value").isNotNull && col("event_type").isNotNull),
          dim1 = col("event_type"), dim2 = pmod(col("user_id"), lit(10L)),
          outcome = col("value") > 200, minN = 30, k = 10)
        .select(col("dim1"), col("dim2"), col("n"),
          r6(col("rate")).as("rate"),
          r6(col("overall_rate")).as("overall_rate"), r6(col("z")).as("z")),
    Some("""
      WITH b AS (SELECT event_type AS d1, user_id % 10 AS d2,
                   CASE WHEN "value" > 200 THEN 1.0 ELSE 0.0 END AS y
                 FROM events
                 WHERE "value" IS NOT NULL AND event_type IS NOT NULL
                   AND user_id IS NOT NULL),
      o AS (SELECT avg(y) AS p0 FROM b),
      c AS (SELECT d1, d2, count(*)::BIGINT AS n, avg(y) AS rate
            FROM b GROUP BY 1, 2),
      f AS (SELECT d1, d2, n, rate, p0,
              CASE WHEN p0 > 0 AND p0 < 1 THEN (rate - p0) /
                sqrt(p0 * (1 - p0) / n) END AS z
            FROM c, o WHERE n >= 30)
      SELECT d1 AS dim1, d2 AS dim2, n, round(rate, 6) AS rate,
             round(p0, 6) AS overall_rate, round(z, 6) AS z
      FROM f ORDER BY abs(z) DESC, dim1, dim2 LIMIT 10"""))

  /** Propensity-score matching ATT on the observational substrate:
    * caliper 1-NN with replacement, deterministic (|Δp|, id)
    * tie-break, paired-t SE — the matching member of the q205/q532
    * causal family. */
  private val q545 = Entry(
    "q545_psm_att",
    (s, d) =>
      graft.ops.Evaluation.psmAtt(
          Tables.orders(s, d).select(col("o_orderkey"),
            when((col("o_orderkey") % 100).cast("double") <
              col("o_totalprice") / 5000.0, 1L).otherwise(0L).as("t"),
            (col("o_totalprice") / 600000.0).as("p"),
            (col("o_totalprice") / 1000.0).as("y")),
          col("t") === 1L, "p", "y", "o_orderkey", caliper = 0.0005)
        .select(col("n_treated"), col("n_matched"),
          r6(col("match_rate")).as("match_rate"), r6(col("att")).as("att"),
          r6(col("se_att")).as("se_att")),
    Some("""
      WITH sc AS (SELECT o_orderkey AS id,
              CASE WHEN (o_orderkey % 100) < o_totalprice / 5000.0
                THEN 1 ELSE 0 END AS t,
              o_totalprice / 600000.0 AS p,
              o_totalprice / 1000.0 AS y
            FROM orders),
      b AS (SELECT id, t, p, y, floor(p / 0.0005)::BIGINT AS bk
            FROM sc),
      tr AS (SELECT id AS tid, p AS tp, y AS ty, bk FROM b WHERE t = 1),
      co AS (SELECT id AS cid, p AS cp, y AS cy,
               unnest([bk - 1, bk, bk + 1]) AS bk
             FROM b WHERE t = 0),
      cand AS (SELECT tid, ty, cid, cy, abs(tp - cp) AS dp
               FROM tr JOIN co USING (bk)
               WHERE abs(tp - cp) <= 0.0005),
      m AS (SELECT tid, ty - cy AS dd FROM cand
            QUALIFY row_number() OVER (PARTITION BY tid
              ORDER BY dp, cid) = 1),
      nt AS (SELECT count(*)::BIGINT AS n_treated FROM tr)
      SELECT max(n_treated) AS n_treated, count(*)::BIGINT AS n_matched,
             round(count(*) / max(n_treated)::DOUBLE, 6) AS match_rate,
             round(avg(dd), 6) AS att,
             round(stddev_samp(dd) / sqrt(count(*)), 6) AS se_att
      FROM m, nt"""))

  /** Randomization inference for the arm mean difference: 19 portable
    * md5 pseudo-assignments, exact finite-sample p — no variance
    * formula, no RNG, identical in any engine. */
  private val q546 = Entry(
    "q546_randomization_test",
    (s, d) =>
      graft.ops.Evaluation.randomizationTest(
          Tables.orders(s, d).select(col("o_orderkey"),
            when((col("o_orderkey") % 100).cast("double") <
              col("o_totalprice") / 5000.0, 1L).otherwise(0L).as("t"),
            (col("o_totalprice") / 1000.0).as("y")),
          col("t") === 1L, "o_orderkey", "y", k = 19)
        .select(col("n"), r6(col("effect")).as("effect"), col("k"),
          col("n_ge"), r6(col("p_value")).as("p_value"),
          r6(col("max_pseudo_abs")).as("max_pseudo_abs")),
    Some("""
      WITH sc AS (SELECT o_orderkey AS id,
              CASE WHEN (o_orderkey % 100) < o_totalprice / 5000.0
                THEN 1 ELSE 0 END AS t0,
              o_totalprice / 1000.0 AS y
            FROM orders WHERE o_totalprice IS NOT NULL),
      g AS (SELECT id, t0, y, unnest(generate_series(0, 19)) AS i
            FROM sc),
      a AS (SELECT i, y, CASE WHEN i = 0 THEN t0 ELSE
              CASE WHEN ('0x' || substring(md5(CAST(id AS VARCHAR)
                || '|' || CAST(i AS VARCHAR)), 1, 15))::BIGINT
                % 1048576 < 524288 THEN 1 ELSE 0 END END AS t
            FROM g),
      e AS (SELECT i, count(*)::BIGINT AS n,
              avg(CASE WHEN t = 1 THEN y END) -
                avg(CASE WHEN t = 0 THEN y END) AS th
            FROM a GROUP BY 1),
      o AS (SELECT n, th AS effect FROM e WHERE i = 0),
      ps AS (SELECT count(*)::BIGINT AS k, max(abs(th)) AS mpa
             FROM e WHERE i <> 0),
      ng AS (SELECT sum(CASE WHEN abs(e.th) >= abs(o.effect)
               THEN 1 ELSE 0 END)::BIGINT AS n_ge
             FROM e, o WHERE e.i <> 0)
      SELECT o.n, round(o.effect, 6) AS effect, ps.k, ng.n_ge,
             round((ng.n_ge + 1) / (ps.k + 1.0), 6) AS p_value,
             round(ps.mpa, 6) AS max_pseudo_abs
      FROM o, ps, ng"""))

  /** Group-sequential monitoring: cumulative Welch z at 5 calendar
    * looks vs the O'Brien–Fleming-shaped boundary 2.04·√(K/k) — the
    * peek-with-discipline panel next to q475's always-valid mSPRT. */
  private val q547 = Entry(
    "q547_group_sequential",
    (s, d) =>
      graft.ops.Evaluation.groupSequential(
          Tables.orders(s, d)
            .where(col("o_totalprice").isNotNull &&
              col("o_orderdate").isNotNull)
            .withColumn("__y", col("o_totalprice") / 1000.0),
          col("o_orderkey") % 2 === 0, "o_orderdate", "__y",
          looks = 5, c = 2.04)
        .select(col("look"), col("n_cum"), r6(col("z")).as("z"),
          r6(col("boundary")).as("boundary"), col("crossed"))
        .orderBy("look"),
    Some("""
      WITH b AS (SELECT CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END
                   AS t, o_totalprice / 1000.0 AS y,
                   o_orderdate::DATE AS d
                 FROM orders
                 WHERE o_totalprice IS NOT NULL
                   AND o_orderdate IS NOT NULL),
      bd AS (SELECT min(d) AS lo, max(d) AS hi FROM b),
      s AS (SELECT t, y, least(greatest(
              floor(date_diff('day', lo, d)::DOUBLE * 5 /
                (date_diff('day', lo, hi) + 1))::INTEGER + 1, 1), 5)
              AS sl
            FROM b, bd),
      g AS (SELECT lk.look, t, y FROM s,
              (SELECT unnest(generate_series(1, 5)) AS look) lk
            WHERE sl <= look),
      a AS (SELECT look, count(*)::BIGINT AS n_cum,
              count(CASE WHEN t = 1 THEN 1 END)::DOUBLE AS n1,
              avg(CASE WHEN t = 1 THEN y END) AS m1,
              var_samp(CASE WHEN t = 1 THEN y END) AS v1,
              count(CASE WHEN t = 0 THEN 1 END)::DOUBLE AS n0,
              avg(CASE WHEN t = 0 THEN y END) AS m0,
              var_samp(CASE WHEN t = 0 THEN y END) AS v0
            FROM g GROUP BY 1)
      SELECT look, n_cum,
             round(CASE WHEN n1 > 1 AND n0 > 1 THEN (m1 - m0) /
               sqrt(v1 / n1 + v0 / n0) END, 6) AS z,
             round(2.04 * sqrt(5.0 / look), 6) AS boundary,
             CASE WHEN n1 > 1 AND n0 > 1 THEN
               abs((m1 - m0) / sqrt(v1 / n1 + v0 / n0)) >
                 2.04 * sqrt(5.0 / look) END AS crossed
      FROM a ORDER BY look"""))

  /** Market-model betas of each event type's daily returns vs the
    * pooled series: which types ride the aggregate and which move on
    * their own (β, α, R²). */
  private val q548 = Entry(
    "q548_market_beta",
    (s, d) =>
      graft.ops.Risk.marketBeta(Tables.events(s, d), "event_type",
          "ts", "value")
        .select(col("event_type"), col("n_days"), r6(col("beta")).as("beta"),
          r6(col("alpha")).as("alpha"), r6(col("r2")).as("r2"))
        .orderBy("event_type"),
    Some("""
      WITH d AS (SELECT event_type AS g, ts::DATE AS day,
                   round(sum("value"), 6) AS v
                 FROM events
                 WHERE "value" IS NOT NULL AND ts IS NOT NULL
                   AND event_type IS NOT NULL
                 GROUP BY 1, 2),
      mk AS (SELECT day, round(sum(v), 6) AS mv FROM d GROUP BY 1),
      mr AS (SELECT m1.day, round(m1.mv / m2.mv - 1, 6) AS rm
             FROM mk m1 JOIN mk m2 ON m1.day = m2.day + 1
             WHERE m2.mv > 0),
      kr AS (SELECT g, day, round(v / pv - 1, 6) AS rk FROM (
               SELECT g, day, v,
                      lag(v) OVER (PARTITION BY g ORDER BY day) AS pv
               FROM d)
             WHERE pv > 0),
      j AS (SELECT g, rk, rm FROM kr JOIN mr USING (day)),
      a AS (SELECT g, count(*)::BIGINT AS n_days, avg(rk) AS mk2,
              avg(rm) AS mm, covar_samp(rk, rm) AS cv,
              var_samp(rm) AS vm, var_samp(rk) AS vk
            FROM j GROUP BY 1)
      SELECT g AS event_type, n_days,
             round(CASE WHEN vm > 0 THEN cv / vm END, 6) AS beta,
             round(mk2 - (CASE WHEN vm > 0 THEN cv / vm END) * mm, 6)
               AS alpha,
             round(CASE WHEN vm > 0 AND vk > 0
               THEN cv * cv / (vm * vk) END, 6) AS r2
      FROM a ORDER BY 1"""))

  /** Daily adoption curve: active users split into new vs returning
    * plus cumulative adopters — growth accounting, prefix-summed in
    * date order. */
  private val q549 = Entry(
    "q549_adoption_curve",
    (s, d) =>
      graft.ops.Behavioral.adoptionCurve(Tables.events(s, d),
          "user_id", "ts")
        .select(col("day"), col("active_users"), col("new_users"),
          col("returning_users"), col("cum_adopters"))
        .orderBy("day"),
    Some("""
      WITH ud AS (SELECT DISTINCT user_id AS u, ts::DATE AS d
                  FROM events
                  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      f AS (SELECT u, min(d) AS fd FROM ud GROUP BY 1),
      dd AS (SELECT d AS day, count(*)::BIGINT AS active_users,
               sum(CASE WHEN d = fd THEN 1 ELSE 0 END)::BIGINT
                 AS new_users
             FROM ud JOIN f USING (u) GROUP BY 1)
      SELECT day, active_users, new_users,
             active_users - new_users AS returning_users,
             (sum(new_users) OVER (ORDER BY day
               ROWS UNBOUNDED PRECEDING))::BIGINT AS cum_adopters
      FROM dd ORDER BY day"""))

  /** Activity-streak panel: the population distribution of each
    * user's longest consecutive-day run (gaps-and-islands), with
    * exact-DISC median/p90. */
  private val q550 = Entry(
    "q550_streaks",
    (s, d) =>
      graft.ops.Behavioral.streakPanel(Tables.events(s, d),
          "user_id", "ts")
        .select(col("n_users"),
          r6(col("mean_max_streak")).as("mean_max_streak"), col("p50"),
          col("p90"), col("max_streak")),
    Some("""
      WITH ud AS (SELECT DISTINCT user_id AS u, ts::DATE AS d
                  FROM events
                  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      s AS (SELECT u, date_diff('day', DATE '1970-01-01', d) -
              row_number() OVER (PARTITION BY u ORDER BY d) AS grp
            FROM ud),
      l AS (SELECT u, grp, count(*) AS len FROM s GROUP BY 1, 2),
      ms AS (SELECT u, max(len)::DOUBLE AS msx FROM l GROUP BY 1),
      c AS (SELECT quantile_disc(msx, 0.5) AS p50,
              quantile_disc(msx, 0.9) AS p90 FROM ms)
      SELECT count(*)::BIGINT AS n_users,
             round(avg(msx), 6) AS mean_max_streak,
             max(p50)::BIGINT AS p50, max(p90)::BIGINT AS p90,
             max(msx)::BIGINT AS max_streak
      FROM ms, c"""))

  // ------------------------------------------------------------------

  val entries: Seq[Entry] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11, q12, q13, q14,
    q15, q16, q17, q18, q19, q20, q21, q22, q23, q24, q25, q26, q27, q28,
    q29, q30, q31, q32, q33, q34, q35, q36, q37, q38, q39, q40, q41, q42, q43, q44, q45,
    q46, q47, q48,
    q49, q50,
    q51, q52, q53, q54, q55, q56, q57, q58, q59, q60, q61, q62, q63, q64, q65, q66, q67, q68, q69, q70,
    q71, q72, q73, q74, q75, q76, q77, q78, q79, q80, q81, q82, q83,
    q84, q85, q86, q87, q88, q89, q90, q91, q92, q93, q94, q95, q96,
    q97, q98, q99, q100, q101, q102, q103, q104, q105, q106, q107, q108,
    q109, q110, q111, q112, q113, q114, q115, q116, q117, q118, q119,
    q120, q121, q122, q123, q124, q125, q126, q127, q128, q129, q130,
    q131, q132, q133, q134, q135, q136, q137, q138, q139, q140, q141,
    q142, q143, q144, q145, q146, q147, q148, q149, q150, q151, q152, q153,
    q154, q155, q156, q157, q158, q159, q160, q161, q162, q163, q164,
    q165, q166, q167, q168, q169, q170, q171, q172, q173, q174, q175,
    q176, q177, q178, q179, q180, q181, q182, q183, q184, q185, q186,
    q187, q188, q189, q190, q191, q192, q193, q194, q195, q196, q197,
    q198, q199, q200, q201, q202, q203, q204, q205, q206, q207, q208, q209, q210, q211, q212, q213, q214, q215, q216, q217, q218, q219, q220, q221, q222, q223, q224, q225, q226, q227, q228, q229, q230, q231, q232, q233,
    q234, q235, q236, q237, q238, q239, q240, q241, q242, q243, q244, q245, q246, q247, q248, q249, q250, q251, q252, q253,
    q254, q255, q256, q257, q258, q259, q260, q261, q262, q263, q264,
    q265, q266, q267, q268, q269, q270, q271, q272, q273, q274, q275,
    q276, q277, q278, q279, q280, q281, q282, q283, q284, q285, q286,
    q287, q288, q289, q290, q291, q292, q293, q294, q295, q296, q297, q298, q299, q300, q301, q302, q303, q304, q305, q306, q307, q308, q309, q310, q311, q312, q313, q314, q315, q316, q317, q318, q319, q320, q321, q322, q323, q324, q325, q326, q327, q328, q329, q330, q331, q332, q333, q334, q335, q336, q337, q338, q339, q340, q341, q342, q343, q344, q345, q346, q347, q348, q349, q350, q351, q352, q353, q354, q355,
    q356, q357, q358, q359, q360, q361, q362, q363, q364, q365, q366, q367, q368, q369, q370, q371,
    q372, q373, q374, q375, q376, q377, q378, q379, q380, q381, q382, q383, q384, q385, q386,
    q387, q388, q389, q390, q391, q392, q393, q394, q395, q396, q397,
    q398, q399, q400, q401, q402, q403, q404, q405, q406, q407, q408,
    q409, q410, q411, q412, q413, q414, q415, q416, q417, q418, q419,
    q420, q421, q422, q423, q424, q425, q426, q427, q428, q429, q430,
    q431, q432, q433, q434, q435, q436, q437, q438, q439, q440, q441,
    q442, q443, q444, q445, q446, q447, q448, q449,
    q450, q451, q452, q453, q454, q455, q456, q457, q458, q459, q460,
    q461, q462, q463, q464, q465, q466, q467, q468, q469, q470, q471,
    q472, q473, q474, q475, q476, q477, q478, q479, q480, q481, q482,
    q483, q484, q485, q486, q487, q488, q489, q490, q491, q492, q493, q494, q495, q496, q497, q498, q499, q500, q501,
    q502, q503, q504, q505, q506, q507, q508, q509, q510, q511,
    q512, q513, q514, q515, q516, q517, q518, q519, q520, q521, q522,
    q523, q524, q525, q526, q527, q528, q529, q530, q531, q532,
    q533, q534, q535, q536, q537, q538, q539, q540, q541, q542,
    q543, q544, q545, q546, q547, q548, q549, q550)

  def queries: Map[String, QueryFn] =
    entries.map(e => e.name -> e.fn).toMap

  def oracleSql: Map[String, String] =
    entries.flatMap(e => e.oracle.map(sql => e.name -> sql.trim)).toMap
}
