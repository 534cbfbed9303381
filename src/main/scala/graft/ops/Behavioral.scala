package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Event-stream behavioral analytics — the funnel / cohort queries every
 * event-backed feature store ends up serving. Both operators reduce to
 * a handful of keyed aggregations and entity-keyed joins: no windows
 * over the raw stream, no per-user state larger than a few timestamps,
 * parallelism scales with users.
 */
object Behavioral {

  /**
   * Ordered funnel conversion: step i counts a user iff an event of
   * `steps(i)` occurred AT OR AFTER the user's earliest qualifying time
   * for step i−1 (strict sequential semantics — a purchase before the
   * signup does not convert). Each step is one filtered aggregation
   * joined on the user key: k steps = k keyed joins over per-step
   * MINIMAL frames (one row per qualifying user), never a self-join of
   * the raw stream. Each intermediate reach frame is persisted so the
   * single result action computes every step ONCE — without the cache,
   * step k's plan would re-execute steps 1..k−1 (O(k²) scans); caches
   * are released to Spark's LRU once the action completes. Returns
   * (step_idx, step, n_users) with step 1 = the entry population, as
   * ONE lazy frame (no per-step driver action).
   */
  def funnel(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String],
      maxGapSeconds: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(maxGapSeconds.forall(_ > 0), "maxGapSeconds must be positive")
    var reached = df.where(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
      .persist()
    def stepCount(r: DataFrame, idx: Int, name: String) =
      r.agg(count(lit(1)).as("n_users"))
        .select(lit(idx).as("step_idx"), lit(name).as("step"),
          col("n_users"))
    val stepCounts = scala.collection.mutable.ArrayBuffer(
      stepCount(reached, 1, steps.head))
    steps.zipWithIndex.drop(1).foreach { case (s, i) =>
      // conversion window: step i must land within maxGap of step i−1's
      // reach time (the standard "converted within N days" funnel);
      // unbounded when None — the original ever-converted semantics
      val inWindow = maxGapSeconds.fold(lit(true))(g =>
        unix_micros(col(tsCol)) - unix_micros(col("__prev")) <=
          g * 1000000L)
      reached = df.where(col(typeCol) === s)
        .join(reached.select(col(userCol), col("__t").as("__prev")), userCol)
        .where(col(tsCol) >= col("__prev") && inWindow)
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
        .persist()
      stepCounts += stepCount(reached, i + 1, s)
    }
    stepCounts.reduce(_ unionByName _)
  }

  /**
   * Time-to-convert profile per funnel step: for every user who reaches
   * step i (same strict sequential semantics as [[funnel]], same
   * optional conversion window), the gap between their step-(i−1) and
   * step-i reach times, summarized per step as count, mean, and exact
   * PERCENTILE_DISC p50/p90 — the "WHERE does the funnel stall"
   * companion to funnel's "where does it leak". Returns
   * (step_idx, step, n_users, avg_gap_s, p50_gap_s, p90_gap_s) for
   * steps 2..k.
   *
   * Scale shape: the same k keyed joins over per-step minimal frames as
   * [[funnel]] (reach frames persisted — each step computed once); gap
   * percentiles run the grouped prefix-sum PERCENTILE_DISC path, never
   * a per-step sort.
   */
  def funnelDurations(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String],
      maxGapSeconds: Option[Long] = None): DataFrame = {
    require(steps.length >= 2, "durations need at least two steps")
    require(maxGapSeconds.forall(_ > 0), "maxGapSeconds must be positive")
    import graft.analysis.{AnalysisPlanner, PrefixSum}
    var reached = df.where(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
      .persist()
    var gaps: Option[DataFrame] = None
    steps.zipWithIndex.drop(1).foreach { case (s, i) =>
      val inWindow = maxGapSeconds.fold(lit(true))(g =>
        unix_micros(col(tsCol)) - unix_micros(col("__prev")) <=
          g * 1000000L)
      val nxt = df.where(col(typeCol) === s)
        .join(reached.select(col(userCol), col("__t").as("__prev")),
          userCol)
        .where(col(tsCol) >= col("__prev") && inWindow)
        .groupBy(col(userCol))
        // __prev is constant per user (one row in `reached`), so min()
        // just carries it through the aggregate
        .agg(min(col(tsCol)).as("__t"), min(col("__prev")).as("__p"))
        .persist()
      val g = nxt.select(lit(i + 1).as("step_idx"), lit(s).as("step"),
        ((unix_micros(col("__t")) - unix_micros(col("__p"))) /
          lit(1000000.0)).as("gap_s"))
      gaps = Some(gaps.fold(g)(_.unionByName(g)))
      reached = nxt.select(col(userCol), col("__t")).persist()
    }
    val gapFrame = gaps.get
    val stats = gapFrame.groupBy(col("step_idx"), col("step"))
      .agg(count(lit(1)).as("n_users"), avg(col("gap_s")).as("avg_gap_s"))
    val pcts = AnalysisPlanner.exactPercentilesDisc(gapFrame, "gap_s",
      Seq("p50_gap_s" -> 0.5, "p90_gap_s" -> 0.9),
      Seq("step_idx", "step"))
    PrefixSum.joinNullSafe(stats, pcts, Seq("step_idx", "step"))
  }

  /**
   * Top-k most frequent length-`len` event paths — the sequence-mining
   * readout behind "what do users actually do": every window of `len`
   * consecutive events in a user's time-ordered stream (ties pinned by
   * `tieCols` for determinism) becomes a path, counted corpus-wide.
   * One user-partitioned lead window (bounded by per-user event
   * count), one path-count aggregation, TakeOrdered for the top-k —
   * no self-joins, no global window.
   */
  def topPaths(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, len: Int = 3, k: Int = 20,
      tieCols: Seq[String] = Nil): DataFrame = {
    require(len >= 2, "paths need at least 2 steps")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol))
      .orderBy(col(tsCol) +: tieCols.map(col): _*)
    val steps = (1 until len).map(i => lead(col(typeCol), i).over(w))
    val path = concat_ws(">", col(typeCol) +: steps: _*)
    df.select(path.as("path"),
        steps.last.isNotNull.as("__complete"))
      .where(col("__complete"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("path"))
      .limit(k)
  }

  /**
   * Exponential retention-decay fit per cohort: regress
   * ln(retention ratio) on the period offset (closed-form population
   * OLS slope — cov/var, no iterative fit) over [[cohortRetention]]'s
   * output, yielding each cohort's decay rate and half-life. The fit
   * runs on the ≤cohorts×offsets retention frame — corpus size only
   * enters through cohortRetention's one (user, period) dedup. Cohorts
   * with a single observed offset return NULL decay (no slope from one
   * point; 0/0 is an error under ANSI, not a NaN).
   * Returns (cohort, n_points, decay_rate, half_life_periods).
   */
  def retentionDecay(df: DataFrame, userCol: String, tsCol: String,
      granularity: String = "week"): DataFrame = {
    val ret = cohortRetention(df, userCol, tsCol, granularity)
    val base = ret.where(col("period_offset") === 0)
      .select(col("cohort"), col("n_users").as("__n0"))
    val x = col("period_offset").cast("double")
    ret.join(base, "cohort")
      .where(col("n_users") > 0)
      .withColumn("__lr",
        log(col("n_users").cast("double") / col("__n0")))
      .groupBy(col("cohort"))
      .agg(count(lit(1)).as("n_points"),
        covar_pop(x, col("__lr")).as("__cov"),
        var_pop(x).as("__var"))
      .withColumn("decay_rate",
        when(col("__var") > 0, col("__cov") / col("__var")))
      .withColumn("half_life_periods",
        when(col("decay_rate") < 0,
          -lit(math.log(2.0)) / col("decay_rate")))
      .drop("__cov", "__var")
  }

  /**
   * First-order Markov transition profile over per-user event
   * sequences: P(next event type | current type), estimated from every
   * consecutive pair in each user's time-ordered stream. One
   * user-partitioned `lag` window (ties pinned by `tieCols`) + one
   * pair-count aggregation + a per-source-state total joined back —
   * the "what do users do next" behavioral fingerprint, and the input
   * to sequence-anomaly scoring (improbable transition chains).
   */
  def eventTransitions(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol) +: tieCols.map(col): _*)
    val pairs = df
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .where(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("from_type").agg(sum(col("n")).as("__tot"))
    pairs.join(totals, "from_type")
      .withColumn("p", col("n").cast("double") / col("__tot"))
      .drop("__tot")
  }

  /**
   * Per-user inter-arrival profile: count, mean/min/max gap (seconds)
   * between consecutive events — the activity-cadence feature set
   * (burst detection upstream, churn signals downstream). One
   * user-partitioned `lag` window + one aggregation; users with a
   * single event report zero gaps and NULL stats.
   */
  def interArrival(df: DataFrame, userCol: String, tsCol: String,
      tieCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol) +: tieCols.map(col): _*)
    val t = col(tsCol).cast("double")
    df.withColumn("__gap", t - lag(t, 1).over(w))
      .groupBy(col(userCol))
      .agg(count(col("__gap")).as("n_gaps"),
        avg(col("__gap")).as("mean_gap"),
        min(col("__gap")).as("min_gap"),
        max(col("__gap")).as("max_gap"))
  }

  /**
   * Conversion attribution: each `target` event (the conversion) is
   * credited to a non-target event type seen EARLIER in the same
   * user's stream — `model = "last_touch"` credits the most recent
   * such event, `"first_touch"` the earliest. Conversions with no
   * preceding touch report channel `"(none)"` (a real category: the
   * direct/organic bucket). One user-partitioned window (ties pinned
   * by `tieCols` for deterministic replay) over the raw stream + one
   * channel aggregation — per-user frames distribute, nothing global.
   * Returns (channel, n_conversions, attributed_value).
   */
  def attribution(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, valueCol: String, target: String,
      model: String = "last_touch", tieCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(Set("last_touch", "first_touch")(model), s"Unknown model: $model")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol) +: tieCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col(typeCol) =!= target, col(typeCol))
    val ch =
      if (model == "last_touch") last(touch, ignoreNulls = true).over(w)
      else first(touch, ignoreNulls = true).over(w)
    df.withColumn("__ch", ch)
      .where(col(typeCol) === target)
      .groupBy(coalesce(col("__ch"), lit("(none)")).as("channel"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(col(valueCol)).as("attributed_value"))
  }

  /**
   * Cohort retention: users grouped by their first-activity period
   * (the cohort), counted in every later period they return —
   * `(cohort, period_offset, n_users)`, the classic retention
   * triangle. Two aggregations (first-seen per user; distinct
   * user-periods) and one user-keyed join. `granularity` is any
   * `date_trunc` unit (`week`, `month`, `day`).
   */
  def cohortRetention(df: DataFrame, userCol: String, tsCol: String,
      granularity: String = "week"): DataFrame = {
    val period = date_trunc(granularity, col(tsCol))
    val firstSeen = df.groupBy(col(userCol))
      .agg(min(period).as("cohort"))
    val active = df.select(col(userCol), period.as("__p")).distinct()
    val diff = granularity.toLowerCase match {
      case "day"   => datediff(col("__p"), col("cohort"))
      case "week"  => floor(datediff(col("__p"), col("cohort")) / 7)
      case "month" => months_between(col("__p"), col("cohort")).cast("long")
      case g => throw new IllegalArgumentException(s"granularity: $g")
    }
    active.join(firstSeen, userCol)
      .withColumn("period_offset", diff.cast("long"))
      .groupBy(col("cohort"), col("period_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /**
   * Batch sessionization: assigns every event a per-user session index
   * — a new session starts when the gap since the user's previous
   * event exceeds `gapSeconds` — then rolls sessions up to one row
   * each: (userCol, session_idx, n_events, start_sec, end_sec,
   * duration_sec, total_value).
   *
   * Determinism/portability: ordering and gap math run on FLOORED
   * epoch seconds with the event id as tie-break, so engines that keep
   * different sub-second precision (Spark µs vs a ns-native reader)
   * replay the identical session assignment. The two windows (lag +
   * running sum) share one user-keyed partitioning — per-user state,
   * one shuffle, parallelism scales with users, never a global window.
   */
  def sessionize(df: DataFrame, userCol: String, tsCol: String,
      idCol: String, gapSeconds: Long = 1800L): DataFrame = {
    require(gapSeconds > 0, "gapSeconds must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col("__sec"), col(idCol))
    val events = df
      .withColumn("__sec", unix_timestamp(col(tsCol)))
      .withColumn("__prev", lag(col("__sec"), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull ||
          col("__sec") - col("__prev") > gapSeconds, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    events.groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("__sec")).as("start_sec"),
        max(col("__sec")).as("end_sec"))
      .withColumn("duration_sec", col("end_sec") - col("start_sec"))
  }

  /**
   * RFM (recency / frequency / monetary) customer segmentation: per
   * user, days since last event (vs the corpus max-ts anchor — never
   * NOW()), event count, and value sum, each scored 1..`buckets` by
   * exact corpus quantile boundaries. Recency scores INVERTED (most
   * recent = highest score), the marketing convention.
   *
   * Scale shape: one user-keyed aggregation builds the per-user frame;
   * each boundary set is a 1-row exact-percentile broadcast
   * ([[graft.ops.Features.quantileBucket]]'s pattern, strict `>`
   * comparisons so boundary ties land low in any engine). Returns one
   * row per user: (userCol, recency_days, frequency, monetary,
   * r_score, f_score, m_score).
   */
  def rfmSegments(df: DataFrame, userCol: String, tsCol: String,
      valueCol: String, buckets: Int = 5): DataFrame = {
    require(buckets >= 2, "need at least 2 buckets")
    val anchor = broadcast(df.agg(max(to_date(col(tsCol))).as("__anchor")))
    // min over day gaps = days since the user's most RECENT event
    val users = df.crossJoin(anchor)
      .groupBy(col(userCol))
      .agg(min(datediff(col("__anchor"), to_date(col(tsCol))))
          .cast("double").as("recency_days"),
        count(lit(1)).cast("double").as("frequency"),
        sum(col(valueCol).cast("double")).as("monetary"))
    def score(c: String, inverted: Boolean): org.apache.spark.sql.Column = {
      val raw = (1 until buckets)
        .map(i => when(col(c) > col(s"__${c}_q$i"), 1).otherwise(0))
        .reduce(_ + _) + 1
      if (inverted) lit(buckets + 1) - raw else raw
    }
    // ONE grouped percentile machinery for all three metrics (r14):
    // melt users to (metric, value) rows and run a single grouped
    // exact-percentile pass, instead of three full ungrouped passes
    // (3× the bucketed-prefix exchanges for the same answer). The
    // 3-row bounds frame pivots back to the one wide row the scoring
    // expressions read — quantile values are bit-identical because
    // the grouped path applies the same (n−1)·p interpolation per
    // group that the ungrouped path applies to each column.
    val metricNames = Seq("recency_days", "frequency", "monetary")
    val melted = users.select(explode(map(metricNames.flatMap(c =>
      Seq(lit(c), col(c))): _*)).as(Seq("__metric", "__val")))
    val qNames = (1 until buckets).map(i => s"__q$i" -> i.toDouble / buckets)
    val grouped = graft.analysis.AnalysisPlanner.exactPercentiles(
      melted, "__val", qNames, Seq("__metric"))
    val pivotAggs = for { c <- metricNames; i <- 1 until buckets } yield
      max(when(col("__metric") === c, col(s"__q$i"))).as(s"__${c}_q$i")
    val bounds = grouped.agg(pivotAggs.head, pivotAggs.tail: _*)
    val withBounds = users.join(broadcast(bounds))
    withBounds
      .withColumn("r_score", score("recency_days", inverted = true)
        .cast("long"))
      .withColumn("f_score", score("frequency", inverted = false)
        .cast("long"))
      .withColumn("m_score", score("monetary", inverted = false)
        .cast("long"))
      .select(col(userCol), col("recency_days"), col("frequency"),
        col("monetary"), col("r_score"), col("f_score"), col("m_score"))
  }

  /**
   * Rolling active-user metrics: per observed day, DAU (distinct users
   * that day), the trailing `windowDays`-day distinct-user count
   * (WAU/MAU shape), and stickiness = DAU/rolling — the canonical
   * product-engagement series.
   *
   * Scale shape: a rolling DISTINCT can't sum daily counts, so the
   * distinct (user, day) frame fans out over the `windowDays` offsets
   * it contributes to (a bounded `explode`, window≤31) and re-counts
   * distinct per anchor day — two keyed aggregations over a frame
   * bounded by users×days, no range join, no window function. Anchor
   * days outside the observed span (the fan-out's tail) are dropped by
   * the inner join back to real days.
   */
  def activeUserMetrics(df: DataFrame, userCol: String, tsCol: String,
      windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1 && windowDays <= 92, "windowDays in [1, 92]")
    val userDays = df
      .select(col(userCol).as("__u"), to_date(col(tsCol)).as("__d"))
      .distinct()
    val dau = userDays.groupBy(col("__d").as("day"))
      .agg(count(lit(1)).as("dau"))
    val offsets = df.sparkSession.range(windowDays.toLong)
      .select(col("id").cast("int").as("__k"))
    val rolling = userDays.crossJoin(broadcast(offsets))
      .select(col("__u"), date_add(col("__d"), col("__k")).as("day"))
      .groupBy("day")
      .agg(countDistinct(col("__u")).as("rolling_active"))
    dau.join(rolling, Seq("day"))
      .withColumn("stickiness",
        col("dau").cast("double") / col("rolling_active"))
  }

  /**
   * Daily adoption curve: active users per day split into NEW (first
   * ever appearance) and returning, plus the cumulative adopter count
   * — the growth-accounting readout. Returns one row per active day:
   * (day, active_users, new_users, returning_users, cum_adopters).
   *
   * Scale shape: one per-user first-day aggregate, one (user, day)
   * distinct, a user-keyed join, and a calendar-bounded prefix sum
   * ([[graft.analysis.PrefixSum]] — no single-partition window).
   */
  def adoptionCurve(df: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val ud = df.where(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("__u"), to_date(col(tsCol)).as("__d"))
      .distinct()
      .localCheckpoint() // first-day agg AND the daily roll-up
    val first = ud.groupBy("__u").agg(min(col("__d")).as("__f"))
    val daily = ud.join(first, Seq("__u"))
      .groupBy(col("__d").as("day"))
      .agg(count(lit(1)).as("active_users"),
        sum(when(col("__d") === col("__f"), 1L).otherwise(0L))
          .as("new_users"))
      .withColumn("returning_users",
        col("active_users") - col("new_users"))
    graft.analysis.PrefixSum.exclusive(daily, "day",
        Seq("new_users" -> "__before"))
      .select(col("day"), col("active_users"), col("new_users"),
        col("returning_users"),
        (col("__before") + col("new_users")).cast("long")
          .as("cum_adopters"))
  }

  /**
   * Activity-streak panel: each user's LONGEST run of consecutive
   * active days (gaps-and-islands on the distinct-day frame: day
   * minus a per-user row_number is constant within a streak), then
   * the population's mean / exact-DISC median / p90 / max of those
   * maxima. Returns ONE row: (n_users, mean_max_streak, p50, p90,
   * max_streak).
   *
   * Scale shape: one (user, day) distinct, one user-partitioned
   * window, two grouped reduces, one exact-percentile pass over the
   * user-sized integer frame.
   */
  def streakPanel(df: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ud = df.where(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("__u"), to_date(col(tsCol)).as("__d"))
      .distinct()
    val w = Window.partitionBy("__u").orderBy("__d")
    val maxStreak = ud
      .withColumn("__grp",
        datediff(col("__d"), lit("1970-01-01")) -
          row_number().over(w))
      .groupBy("__u", "__grp").agg(count(lit(1)).as("__len"))
      .groupBy("__u").agg(max(col("__len")).cast("double").as("__ms"))
      .localCheckpoint() // moments AND the percentile pass
    val cuts = broadcast(graft.analysis.AnalysisPlanner
      .exactPercentilesDisc(maxStreak, "__ms",
        Seq("__p50" -> 0.5, "__p90" -> 0.9), Nil))
    maxStreak.crossJoin(cuts)
      .agg(count(lit(1)).as("n_users"),
        avg(col("__ms")).as("mean_max_streak"),
        max(col("__p50")).cast("long").as("p50"),
        max(col("__p90")).cast("long").as("p90"),
        max(col("__ms")).cast("long").as("max_streak"))
  }

  /**
   * Reliability panel of a failure event type per user stream: MTBF
   * (mean seconds between consecutive failures of the SAME user),
   * MTTR (mean seconds from a failure to the user's next non-failure
   * event — the recovery proxy), failure rate per kilo-event, and
   * availability MTBF/(MTBF+MTTR). Ordering pins ties by (ts, id) so
   * every engine replays the same stream. Returns ONE row: (n_events,
   * n_failures, mtbf_sec, mttr_sec, failures_per_1k, availability).
   *
   * Scale shape: two user-partitioned lead windows over the raw
   * stream + one reduce — parallelism scales with users.
   */
  def reliabilityPanel(df: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, failureType: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col("__sec"), col(idCol))
    val events = df
      .withColumn("__sec", unix_timestamp(col(tsCol)))
      .withColumn("__fail",
        when(col(typeCol) === failureType, 1L).otherwise(0L))
    // next failure time / next recovery time via conditional leads:
    // min over the FOLLOWING frame of the respective kind's timestamp
    val wAfter = w.rowsBetween(1, Window.unboundedFollowing)
    val marked = events
      .withColumn("__nextFail",
        min(when(col("__fail") === 1, col("__sec"))).over(wAfter))
      .withColumn("__nextOk",
        min(when(col("__fail") === 0, col("__sec"))).over(wAfter))
    marked.agg(count(lit(1)).as("n_events"),
        sum(col("__fail")).as("n_failures"),
        avg(when(col("__fail") === 1,
          col("__nextFail") - col("__sec"))).as("mtbf_sec"),
        avg(when(col("__fail") === 1,
          col("__nextOk") - col("__sec"))).as("mttr_sec"))
      .withColumn("failures_per_1k",
        col("n_failures").cast("double") / col("n_events") * 1000)
      .withColumn("availability",
        when(col("mtbf_sec") + col("mttr_sec") > 0,
          col("mtbf_sec") / (col("mtbf_sec") + col("mttr_sec"))))
  }

  /**
   * Session-quality panel by EXIT event type: sessions (30-min-gap
   * sessionization, [[sessionize]] semantics with (ts, id) tie order)
   * grouped by their LAST event's type — exit-page analysis: how many
   * sessions end on each type, that exit's bounce rate (single-event
   * sessions), and the mean session length/duration. Returns one row
   * per exit type: (exit_type, n_sessions, session_share, bounce_rate,
   * mean_events, mean_duration_sec).
   *
   * Scale shape: the same two user-partitioned windows sessionize
   * uses (order by (epoch, id)), one per-session aggregate, one
   * exit-type reduce — parallelism scales with users.
   */
  def sessionQuality(df: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String,
      gapSeconds: Long = 1800L): DataFrame = {
    require(gapSeconds > 0, "gapSeconds must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col("__sec"), col(idCol))
    val events = df
      .withColumn("__sec", unix_timestamp(col(tsCol)))
      .withColumn("__prev", lag(col("__sec"), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull ||
          col("__sec") - col("__prev") > gapSeconds, 1L).otherwise(0L))
      .withColumn("__sid",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val wSess = Window.partitionBy(col(userCol), col("__sid"))
      .orderBy(col("__sec").desc, col(idCol).desc)
    val sessions = events
      .withColumn("__rnd", row_number().over(wSess))
      .groupBy(col(userCol), col("__sid"))
      .agg(count(lit(1)).as("__n"),
        (max(col("__sec")) - min(col("__sec"))).as("__dur"),
        max(when(col("__rnd") === 1, col(typeCol))).as("__exit"))
    val perExit = sessions.groupBy(col("__exit").as("exit_type"))
      .agg(count(lit(1)).as("n_sessions"),
        avg(when(col("__n") === 1, 1.0).otherwise(0.0)).as("bounce_rate"),
        avg(col("__n")).as("mean_events"),
        avg(col("__dur")).as("mean_duration_sec"))
    val tot = broadcast(perExit
      .agg(sum(col("n_sessions")).cast("double").as("__t")))
    perExit.crossJoin(tot)
      .select(col("exit_type"), col("n_sessions"),
        (col("n_sessions") / col("__t")).as("session_share"),
        col("bounce_rate"), col("mean_events"), col("mean_duration_sec"))
  }

  /**
   * Value-quartile migration matrix between the first and second half
   * of the observation window: each entity's total value lands in a
   * quartile of ITS half's per-entity distribution (exact-DISC cuts on
   * 6-decimal-rounded totals — tie-stable in any engine), and the
   * matrix counts entities present in BOTH halves by (from, to) cell
   * with row shares — the churn/upsell movement readout. Returns one
   * row per observed cell: (q_from, q_to, n, row_share).
   *
   * Scale shape: one corpus groupBy(entity) with conditional half
   * sums, two exact-percentile passes over the entity-sized totals,
   * one bounded (≤16-cell) matrix aggregation.
   */
  def segmentMigration(df: DataFrame, entityCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val base = df.where(col(entityCol).isNotNull && col(tsCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(entityCol).as("__e"), to_date(col(tsCol)).as("__d"),
        col(valueCol).cast("double").as("__v"))
    val bounds = broadcast(base.agg(min(col("__d")).as("__lo"),
      max(col("__d")).as("__hi")))
    val per = base.crossJoin(bounds)
      .withColumn("__cut",
        date_add(col("__lo"),
          (datediff(col("__hi"), col("__lo")) / 2).cast("int")))
      .groupBy("__e")
      .agg(round(sum(when(col("__d") <= col("__cut"), col("__v"))
        .otherwise(0.0)), 6).as("__a"),
        round(sum(when(col("__d") > col("__cut"), col("__v"))
          .otherwise(0.0)), 6).as("__b"))
      .where(col("__a") > 0 && col("__b") > 0)
      .localCheckpoint() // read for both cut frames AND the matrix
    def cuts(c: String, tag: String) = broadcast(
      graft.analysis.AnalysisPlanner.exactPercentilesDisc(
        per.select(col(c)), c,
        Seq(s"__p25$tag" -> 0.25, s"__p50$tag" -> 0.5,
          s"__p75$tag" -> 0.75), Nil))
    def quartile(v: Column, tag: String) =
      when(v <= col(s"__p25$tag"), 1)
        .when(v <= col(s"__p50$tag"), 2)
        .when(v <= col(s"__p75$tag"), 3)
        .otherwise(4)
    val cells = per.crossJoin(cuts("__a", "a")).crossJoin(cuts("__b", "b"))
      .select(quartile(col("__a"), "a").as("q_from"),
        quartile(col("__b"), "b").as("q_to"))
      .groupBy("q_from", "q_to").agg(count(lit(1)).as("n"))
    val rows = cells.groupBy("q_from").agg(sum(col("n")).as("__rt"))
    cells.join(rows, Seq("q_from"))
      .withColumn("row_share", col("n").cast("double") / col("__rt"))
      .drop("__rt")
  }

  /**
   * Markov-chain view of the per-user event-type stream: the empirical
   * transition matrix (restricted to states that appear as a FROM
   * state, rows renormalized over the kept targets), the stationary
   * distribution by `iterations` fixed power-iteration steps from the
   * uniform vector (fixed step count, not a float-tolerance
   * convergence test — deterministic in any engine), and each state's
   * conditional next-step entropy −Σ_j p_ij·ln p_ij. The entropy rate
   * of the chain is Σ_i π_i·h_i, emitted per state as `pi_h`. Returns
   * one row per state: (state, n_out, p_stationary, h_cond, pi_h).
   *
   * Scale shape: the ONLY full-data stage is the lead-window transition
   * count (per-user partitions); the collected matrix is ≤ maxStates²
   * rows behind a loud require — the event-type vocabulary is a
   * bounded dimension, not data-sized.
   */
  def markovChain(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCols: Seq[String] = Nil, iterations: Int = 12,
      maxStates: Int = 32): DataFrame = {
    require(iterations >= 1 && iterations <= 64,
      s"markovChain: 1..64 iterations, got $iterations")
    val counts = eventTransitions(df, userCol, tsCol, typeCol, tieCols)
      .select(col("from_type"), col("to_type"), col("n"))
    val rows = counts.limit(maxStates * maxStates + 1).collect()
    require(rows.length <= maxStates * maxStates,
      s"markovChain: more than $maxStates² transition cells — the type " +
        "column is not a bounded state space; pre-bucket it")
    val raw = rows.map(r => (r.getString(0), r.getString(1),
      r.getLong(2).toDouble))
    val states = raw.map(_._1).distinct.sorted
    require(states.length <= maxStates,
      s"markovChain: ${states.length} states exceeds maxStates=$maxStates")
    val idx = states.zipWithIndex.toMap
    val k = states.length
    // renormalize over kept targets (targets that never emit are
    // dropped, same restriction any row-stochastic fit needs)
    val kept = raw.filter { case (_, t, _) => idx.contains(t) }
    val outTotals = Array.fill(k)(0.0)
    kept.foreach { case (f, _, n) => outTotals(idx(f)) += n }
    val p = Array.fill(k, k)(0.0)
    kept.foreach { case (f, t, n) =>
      p(idx(f))(idx(t)) = n / outTotals(idx(f)) }
    var pi = Array.fill(k)(1.0 / k)
    for (_ <- 0 until iterations) {
      val next = Array.fill(k)(0.0)
      var i = 0
      while (i < k) {
        var j = 0
        while (j < k) { next(j) += pi(i) * p(i)(j); j += 1 }
        i += 1
      }
      pi = next
    }
    val hCond = (0 until k).map { i =>
      (0 until k).map(j => p(i)(j))
        .filter(_ > 0).map(q => -q * math.log(q)).sum
    }
    val out = states.zipWithIndex.map { case (st, i) =>
      (st, outTotals(i).toLong, pi(i), hCond(i), pi(i) * hCond(i))
    }
    df.sparkSession.createDataFrame(out.toSeq)
      .toDF("state", "n_out", "p_stationary", "h_cond", "pi_h")
  }

  /**
   * Audience overlap (Jaccard of USER sets) between every pair of item
   * types — "do these behaviors share an audience", the global-base
   * complement of [[sessionCopresence]]'s within-session PMI (two
   * types can share every user yet never co-occur in a session).
   * Returns ordered pairs: (item_a, item_b, users_a, users_b,
   * users_both, jaccard).
   *
   * Scale shape: one distinct (item, user) pass; pair counts from a
   * user-keyed self-join with per-user fan-out bounded by the item
   * cardinality; set sizes broadcast back.
   */
  def audienceOverlap(df: DataFrame, itemCol: String,
      userCol: String): DataFrame = {
    val pres = df
      .where(col(itemCol).isNotNull && col(userCol).isNotNull)
      .select(col(itemCol).cast("string").as("__i"),
        col(userCol).as("__u"))
      .distinct().localCheckpoint()
    val sizes = pres.groupBy("__i").agg(count(lit(1)).as("__n"))
    val both = pres.as("a")
      .join(pres.as("b"),
        col("a.__u") === col("b.__u") && col("a.__i") < col("b.__i"))
      .groupBy(col("a.__i").as("item_a"), col("b.__i").as("item_b"))
      .agg(count(lit(1)).as("users_both"))
    both
      .join(broadcast(sizes.select(col("__i").as("item_a"),
        col("__n").as("users_a"))), Seq("item_a"))
      .join(broadcast(sizes.select(col("__i").as("item_b"),
        col("__n").as("users_b"))), Seq("item_b"))
      .select(col("item_a"), col("item_b"), col("users_a"),
        col("users_b"), col("users_both"),
        (col("users_both").cast("double") /
          (col("users_a") + col("users_b") - col("users_both")))
          .as("jaccard"))
  }

  /**
   * Goh–Barabási burstiness/memory panel of inter-event gaps per key:
   * B = (σ−μ)/(σ+μ) of the gap distribution (−1 regular … 0
   * Poissonian … 1 bursty) and the memory coefficient M = corr of
   * consecutive gaps — together they place each stream on the
   * burstiness–memory phase plane (human activity sits B>0, M≈0).
   * Gaps and their successors come from ONE key-partitioned ordered
   * window (per-key event counts bound the partitions); everything
   * after is a grouped moment aggregate.
   * Returns (key, n_gaps, mean_gap, sd_gap, b_index, memory_coeff).
   */
  def burstinessMemory(df: DataFrame, keyCol: String, tsCol: String,
      tieCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol) +: tieCols.map(col): _*)
    val ordered = df
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .withColumn("__nxt", lead(col(tsCol), 1).over(w))
      .withColumn("__nxt2", lead(col(tsCol), 2).over(w))
      .where(col("__nxt").isNotNull)
      .select(col(keyCol),
        ((unix_micros(col("__nxt")) - unix_micros(col(tsCol))) /
          lit(1000000.0)).as("__g"),
        when(col("__nxt2").isNotNull,
          (unix_micros(col("__nxt2")) - unix_micros(col("__nxt"))) /
            lit(1000000.0)).as("__gn"))
    val st = ordered.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_gaps"),
        avg(col("__g")).as("mean_gap"),
        sqrt(avg(col("__g") * col("__g")) -
          avg(col("__g")) * avg(col("__g"))).as("sd_gap"),
        count(col("__gn")).cast("double").as("__np"),
        sum(when(col("__gn").isNotNull, col("__g"))).as("__sx"),
        sum(col("__gn")).as("__sy"),
        sum(when(col("__gn").isNotNull, col("__g") * col("__g")))
          .as("__sxx"),
        sum(col("__g") * col("__gn")).as("__sxy"),
        sum(col("__gn") * col("__gn")).as("__syy"))
    val num = col("__np") * col("__sxy") - col("__sx") * col("__sy")
    val den = sqrt((col("__np") * col("__sxx") -
      col("__sx") * col("__sx")) *
      (col("__np") * col("__syy") - col("__sy") * col("__sy")))
    st.select(col(keyCol), col("n_gaps"), col("mean_gap"), col("sd_gap"),
      when(col("sd_gap") + col("mean_gap") > 0,
        (col("sd_gap") - col("mean_gap")) /
          (col("sd_gap") + col("mean_gap"))).as("b_index"),
      when(den > 0, num / den).as("memory_coeff"))
  }

  /**
   * Volume/rate/mix growth decomposition between two periods, per
   * segment: ΔR_s = Δn_s·avg₀ + n₀·Δavg + Δn·Δavg (volume effect,
   * rate effect, cross term) — the finance-review "WHY did revenue
   * move" bridge, summing exactly to the raw delta by construction.
   * Returns one row per segment present in either period (absent side
   * counts as zero): (segment, n0, n1, rev0, rev1, delta,
   * volume_effect, rate_effect, cross_effect).
   *
   * Scale shape: ONE groupBy over (segment, period flag), a
   * full-outer-free pivot via conditional sums, map-only algebra.
   */
  def growthDecomposition(df: DataFrame, segmentCol: String,
      periodFlag: Column, valueCol: String): DataFrame = {
    val per = df
      .where(col(segmentCol).isNotNull && col(valueCol).isNotNull &&
        periodFlag.isNotNull)
      .groupBy(col(segmentCol).as("segment"))
      .agg(
        sum(when(!periodFlag, 1.0).otherwise(0.0)).as("__n0"),
        sum(when(periodFlag, 1.0).otherwise(0.0)).as("__n1"),
        sum(when(!periodFlag, col(valueCol).cast("double"))
          .otherwise(lit(0.0))).as("rev0"),
        sum(when(periodFlag, col(valueCol).cast("double"))
          .otherwise(lit(0.0))).as("rev1"))
    val a0 = when(col("__n0") > 0, col("rev0") / col("__n0"))
      .otherwise(lit(0.0))
    val a1 = when(col("__n1") > 0, col("rev1") / col("__n1"))
      .otherwise(lit(0.0))
    per.select(col("segment"),
      col("__n0").cast("long").as("n0"),
      col("__n1").cast("long").as("n1"), col("rev0"), col("rev1"),
      (col("rev1") - col("rev0")).as("delta"),
      ((col("__n1") - col("__n0")) * a0).as("volume_effect"),
      (col("__n0") * (a1 - a0)).as("rate_effect"),
      ((col("__n1") - col("__n0")) * (a1 - a0)).as("cross_effect"))
  }

  /**
   * Shifted-beta-geometric (sBG, Fader–Hardie 2007) retention
   * projection by method of moments: pool weekly cohort retention,
   * read r₁ and r₂, and invert the sBG identities r₁ = β/(α+β),
   * r₂/r₁ = (β+1)/(α+β+1) in closed form — no MLE, both engines replay
   * the algebra exactly. Projects S(t) = Π_{k≤t} (β+k−1)/(α+β+k−1)
   * against the observed curve for `horizon` weeks — the
   * "heterogeneous churn propensity" model that explains why naive
   * geometric fits always over-predict late churn.
   *
   * Pooling: only cohorts OLD enough to be observed at `horizon`
   * periods enter, so every r_t shares one denominator population.
   * Returns one row per week 1..horizon: (period, n_cohort_users,
   * observed_retention, projected_retention, alpha, beta).
   *
   * Scale shape: first-activity + activity-week frames are two grouped
   * passes; retention counts one more; α/β come from a broadcast 1-row
   * frame; the projection is a ≤horizon-row literal expansion joined
   * to observed — no window, no collect beyond the 2-value read.
   */
  def sbgRetention(df: DataFrame, userCol: String, tsCol: String,
      horizon: Int = 8, periodDays: Int = 7): DataFrame = {
    require(horizon >= 3 && horizon <= 104, "sbgRetention: horizon 3..104")
    require(periodDays >= 1, "sbgRetention: periodDays >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val acts = df.where(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("__u"),
        floor(datediff(to_date(col(tsCol)), lit("1970-01-01")) /
          periodDays).as("__w"))
      .distinct().localCheckpoint()
    val first = acts.groupBy("__u").agg(min(col("__w")).as("__w0"))
    val maxW = broadcast(acts.agg(max(col("__w")).as("__wm")))
    // cohorts with a full horizon of observation
    val eligible = first.crossJoin(maxW)
      .where(col("__w0") + horizon <= col("__wm"))
      .select(col("__u"), col("__w0")).localCheckpoint()
    val base = broadcast(eligible.agg(
      count(lit(1)).cast("double").as("__n0")))
    val ret = acts.join(eligible, Seq("__u"))
      .select((col("__w") - col("__w0")).as("period"), col("__u"))
      .where(col("period") >= 1 && col("period") <= horizon)
      .distinct()
      .groupBy("period")
      .agg(count(lit(1)).cast("double").as("__na"))
      .crossJoin(base)
      .select(col("period"), col("__na"),
        (col("__na") / col("__n0")).as("observed_retention"))
      .localCheckpoint()
    val r12 = broadcast(ret
      .agg(max(when(col("period") === 1, col("observed_retention")))
        .as("__r1"),
        max(when(col("period") === 2, col("observed_retention")))
          .as("__r2")))
    // method of moments on survival S1, S2 (conditional rates r1 = S1,
    // r2 = S2/S1): β = S1(S1−S2)/(S2−S1²), α = β(1−S1)/S1 — checked
    // against (α,β) = (1,2) ⇒ S1 = 2/3, S2 = 1/2 round-trip. A valid
    // sBG needs 0 < S2 < S1 < 1 and S2 > S1² (heterogeneous churn);
    // degenerate curves (fully-retained or sub-geometric) yield NULL
    // α/β and NULL projections instead of an ANSI divide error.
    val ok = col("__r1") < 1 && col("__r2") > 0 &&
      col("__r2") < col("__r1") &&
      col("__r2") > col("__r1") * col("__r1")
    val ab = broadcast(r12.select(
      when(ok, col("__r1") * (col("__r1") - col("__r2")) /
        (col("__r2") - col("__r1") * col("__r1")) *
        (lit(1.0) - col("__r1")) / col("__r1")).as("alpha"),
      when(ok, col("__r1") * (col("__r1") - col("__r2")) /
        (col("__r2") - col("__r1") * col("__r1"))).as("beta")))
    // S(t) = Π_{k=1..t} (β+k−1)/(α+β+k−1): exp of the prefix log sum
    val terms = spark.range(1, horizon + 1L).toDF("__k")
      .crossJoin(ab)
      .select(col("__k"),
        log((col("beta") + col("__k") - 1) /
          (col("alpha") + col("beta") + col("__k") - 1)).as("__lt"),
        col("alpha"), col("beta"))
    val proj = graft.analysis.PrefixSum.exclusive(terms, "__k",
        Seq("__lt" -> "__pre"))
      .select(col("__k").as("period"),
        exp(col("__pre") + col("__lt")).as("projected_retention"),
        col("alpha"), col("beta"))
    ret.join(proj, Seq("period"))
      .crossJoin(base)
      .select(col("period"), col("__n0").cast("long")
        .as("n_cohort_users"), col("observed_retention"),
        col("projected_retention"), col("alpha"), col("beta"))
  }

  /**
   * PMI co-presence of item pairs within sessions — "which event types
   * show up TOGETHER in a user-day beyond what their individual
   * frequencies predict": pmi(a,b) = ln( P(a,b) / (P(a)·P(b)) ) over
   * session presence sets, the behavioral sibling of the in-text
   * [[graft.ops.TextAnalysis]] PMI collocations. Positive PMI = the
   * behaviors co-occur (bundled flows); strongly negative = they
   * substitute.
   *
   * Scale shape: distinct (session, item) presence in one groupBy;
   * pair counts via a session-keyed self-join whose per-session
   * fan-out is bounded by the (small) item-type cardinality, never the
   * session count; marginals broadcast. Returns one row per qualifying
   * pair: (item_a, item_b, n_sessions_both, pmi, lift).
   */
  def sessionCopresence(df: DataFrame, sessionCols: Seq[Column],
      itemCol: String, minPairSessions: Long = 5): DataFrame = {
    require(sessionCols.nonEmpty, "sessionCopresence: sessionCols required")
    val pres = df.where(col(itemCol).isNotNull)
      .select(concat_ws("|",
        sessionCols.map(_.cast("string")): _*).as("__s"),
        col(itemCol).cast("string").as("__i"))
      .distinct()
      .localCheckpoint()
    val nS = broadcast(pres.select("__s").distinct()
      .agg(count(lit(1)).cast("double").as("__ns")))
    val marg = pres.groupBy("__i")
      .agg(count(lit(1)).cast("double").as("__ni"))
    val pairs = pres.as("a")
      .join(pres.as("b"),
        col("a.__s") === col("b.__s") && col("a.__i") < col("b.__i"))
      .groupBy(col("a.__i").as("item_a"), col("b.__i").as("item_b"))
      .agg(count(lit(1)).as("n_sessions_both"))
      .where(col("n_sessions_both") >= minPairSessions)
    pairs
      .join(broadcast(marg.select(col("__i").as("item_a"),
        col("__ni").as("__na"))), Seq("item_a"))
      .join(broadcast(marg.select(col("__i").as("item_b"),
        col("__ni").as("__nb"))), Seq("item_b"))
      .crossJoin(nS)
      .select(col("item_a"), col("item_b"), col("n_sessions_both"),
        log((col("n_sessions_both") * col("__ns")) /
          (col("__na") * col("__nb"))).as("pmi"),
        ((col("n_sessions_both") * col("__ns")) /
          (col("__na") * col("__nb"))).as("lift"))
  }

  /**
   * Zhang–Bradlow–Small clumpiness of each entity's event stream:
   * over the SHARED observation window [min ts, max ts], an entity
   * with n events yields n + 1 normalized inter-event intervals
   * (boundary gaps included) and C = 1 + Σ x·ln x / ln(n + 1) ∈
   * [0, 1] — 0 = evenly spread, 1 = one burst. The per-entity score
   * [[burstinessMemory]] can't give (B needs many gaps per key;
   * clumpiness is defined at n = 1). Per-entity C is rounded to 1e-9
   * before the summary percentiles so a last-bit ln() difference
   * can never flip a discrete-percentile pick between engines.
   *
   * Scale shape: one partitioned lead window + one groupBy(entity)
   * for boundaries, a union, one groupBy(entity) reduce, then the
   * value-level percentile machinery on the |entities|-sized C
   * frame. Returns 1 row: (n_entities, window_seconds, mean_c,
   * c_p25, c_p50, c_p75).
   */
  /**
   * Time-weighted average (TWAP) of a step metric per group: each
   * observation's value HOLDS until the next observation, so the
   * honest average weights by holding time Σvᵢ·(tᵢ₊₁−tᵢ)/span — on
   * irregular streams the plain mean over-weights bursty periods
   * (many samples, little time) and the gap twap − mean is itself a
   * sampling-bias diagnostic. Last observation carries no interval
   * (standard left-step convention, oracle mirrored).
   *
   * Scale shape: one partitioned lead window + one groupBy. Returns
   * one row per group: (group, n, span_seconds, plain_mean, twap,
   * twap_minus_mean).
   */
  def twap(df: DataFrame, groupCol: String, tsCol: String,
      valueCol: String, tieCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__g"))
      .orderBy(col("__t").asc, col("__tb").asc)
    val base = df
      .where(col(groupCol).isNotNull && col(tsCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"), unix_micros(col(tsCol)).as("__t"),
        struct(tieCols.map(col): _*).as("__tb"),
        col(valueCol).cast("double").as("__v"))
      .withColumn("__nx", lead(col("__t"), 1).over(w))
    base.groupBy(col("__g").as(groupCol))
      .agg(count(lit(1)).as("n"),
        ((max(col("__t")) - min(col("__t"))) / 1000000.0)
          .as("span_seconds"),
        avg(col("__v")).as("plain_mean"),
        (sum(when(col("__nx").isNotNull,
          col("__v") * (col("__nx") - col("__t")))) /
          sum(when(col("__nx").isNotNull, col("__nx") - col("__t"))))
          .as("twap"))
      .withColumn("twap_minus_mean", col("twap") - col("plain_mean"))
  }

  /**
   * Two-phase hyperexponential fit of per-entity inter-event gaps by
   * moment matching: with reduced moments uₖ = Mₖ/k!, the two phase
   * means are the roots of t² − at + b (a = (u₃ − u₁u₂)/(u₂ − u₁²),
   * b = (u₁u₃ − u₂²)/(u₂ − u₁²)) and p₁ = (u₁ − t₂)/(t₁ − t₂) — the
   * queueing-theory decomposition of a heavy-CV arrival process into
   * "fast" and "slow" phases that a single exponential (CV² ≡ 1)
   * cannot represent. fit_ok is false when CV² ≤ 1 or the
   * discriminant is negative (H₂ is then the wrong family). Gaps are
   * measured in HOURS so the rates land on a readable scale.
   *
   * Scale shape: one partitioned lead window, ONE moments reduce,
   * closed-form algebra. Returns 1 row: (n_gaps, mean_gap_hours,
   * cv2, p1, lambda1, lambda2, fit_ok).
   */
  def hyperexpGaps(df: DataFrame, idCol: String, tsCol: String,
      tieCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__u"))
      .orderBy(col("__t").asc, col("__tb").asc)
    val gaps = df.where(col(idCol).isNotNull && col(tsCol).isNotNull)
      .select(col(idCol).as("__u"), unix_micros(col(tsCol)).as("__t"),
        struct(tieCols.map(col): _*).as("__tb"))
      .withColumn("__nx", lead(col("__t"), 1).over(w))
      .where(col("__nx").isNotNull)
      .select(((col("__nx") - col("__t")) / 3600000000.0).as("__g"))
    val m = gaps.agg(count(lit(1)).cast("double").as("__n"),
      avg(col("__g")).as("__u1"),
      (sum(col("__g") * col("__g")) / count(lit(1)) / 2).as("__u2"),
      (sum(col("__g") * col("__g") * col("__g")) / count(lit(1)) / 6)
        .as("__u3"))
    val den = col("__u2") - col("__u1") * col("__u1")
    val a = (col("__u3") - col("__u1") * col("__u2")) / den
    val b = (col("__u1") * col("__u3") - col("__u2") * col("__u2")) /
      den
    val disc = a * a - lit(4.0) * b
    val t1 = (a + sqrt(disc)) / 2
    val t2 = (a - sqrt(disc)) / 2
    val cv2 = lit(2.0) * col("__u2") /
      (col("__u1") * col("__u1")) - 1
    val p1 = (col("__u1") - t2) / (t1 - t2)
    // feasibility, not just solvability: both phase means positive
    // and the mixing weight a probability — MoM can land outside the
    // H2 family on short samples, and an infeasible "fit" is noise
    val ok = cv2 > 1 && disc > 0 && den =!= 0 && t2 > 0 &&
      p1 >= 0 && p1 <= 1
    m.select(col("__n").cast("long").as("n_gaps"),
      col("__u1").as("mean_gap_hours"), cv2.as("cv2"),
      when(ok, p1).as("p1"),
      when(ok, lit(1.0) / t1).as("lambda1"),
      when(ok, lit(1.0) / t2).as("lambda2"),
      ok.as("fit_ok"))
  }

  /**
   * Session-count sensitivity sweep over the inactivity-gap
   * threshold: a "session" metric that doubles when the gap cutoff
   * halves is an artifact, not behavior — this panel makes the
   * dependence visible BEFORE anyone standardizes on 30 minutes.
   * Session count per threshold is n_entities + #(gaps > T): one
   * gap pass, every threshold a conditional sum — no re-sessionizing
   * per candidate.
   *
   * Scale shape: one partitioned lead window + ONE reduce with a
   * bounded per-threshold when-chain. Returns one row per threshold:
   * (threshold_seconds, n_sessions, events_per_session).
   */
  def sessionGapSweep(df: DataFrame, idCol: String, tsCol: String,
      thresholdsSeconds: Seq[Long] = Seq(300L, 900L, 1800L, 3600L),
      tieCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(thresholdsSeconds.nonEmpty && thresholdsSeconds.forall(_ > 0),
      "sessionGapSweep: positive thresholds")
    val w = Window.partitionBy(col("__u"))
      .orderBy(col("__t").asc, col("__tb").asc)
    val base = df.where(col(idCol).isNotNull && col(tsCol).isNotNull)
      .select(col(idCol).as("__u"), unix_micros(col(tsCol)).as("__t"),
        struct(tieCols.map(col): _*).as("__tb"))
      .withColumn("__nx", lead(col("__t"), 1).over(w))
    val aggs = thresholdsSeconds.sorted.flatMap { t =>
      Seq(coalesce(sum(when(col("__nx").isNotNull &&
        col("__nx") - col("__t") > t * 1000000L, 1L).otherwise(0L)),
        lit(0L)).as(s"__br_$t"))
    }
    val st = base.agg(count(lit(1)).as("__ne"),
      countDistinct(col("__u")).as("__nu"))
    val breaks = base.agg(aggs.head, aggs.tail: _*)
    val wide = st.crossJoin(breaks)
    val rows = thresholdsSeconds.sorted.map { t =>
      wide.select(lit(t).as("threshold_seconds"),
        (col("__nu") + col(s"__br_$t")).as("n_sessions"),
        (col("__ne").cast("double") / (col("__nu") + col(s"__br_$t")))
          .as("events_per_session"))
    }
    rows.reduce(_.unionByName(_))
  }

  /**
   * Split-half reliability of a per-entity metric: each entity's
   * event values split by arrival parity (odd/even positions in ts
   * order), the two half-means correlate across entities, and
   * Spearman–Brown 2r/(1+r) projects the full-length reliability —
   * "is this per-user score a stable trait or session noise", the
   * prerequisite for using it as a segmentation feature. Entities
   * need ≥ `minEvents` events so both halves are populated.
   *
   * Scale shape: one partitioned row_number window, one
   * groupBy(entity) with conditional halves, one 1-row correlation
   * reduce. Returns 1 row: (n_entities, r_half, spearman_brown).
   */
  def splitHalfReliability(df: DataFrame, idCol: String, tsCol: String,
      valueCol: String, minEvents: Int = 4,
      tieCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(minEvents >= 2, "splitHalfReliability: minEvents >= 2")
    val w = Window.partitionBy(col("__u"))
      .orderBy(col("__t").asc, col("__tb").asc)
    val per = df
      .where(col(idCol).isNotNull && col(tsCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(idCol).as("__u"), col(tsCol).as("__t"),
        struct(tieCols.map(col): _*).as("__tb"),
        col(valueCol).cast("double").as("__v"))
      .withColumn("__rn", row_number().over(w))
      .groupBy("__u")
      .agg(count(lit(1)).as("__ne"),
        avg(when(pmod(col("__rn"), lit(2)) === 1, col("__v")))
          .as("__mo"),
        avg(when(pmod(col("__rn"), lit(2)) === 0, col("__v")))
          .as("__me"))
      .where(col("__ne") >= minEvents)
    val a = per.agg(count(lit(1)).cast("double").as("__n"),
      sum(col("__mo")).as("__so"), sum(col("__me")).as("__se"),
      sum(col("__mo") * col("__mo")).as("__soo"),
      sum(col("__me") * col("__me")).as("__see"),
      sum(col("__mo") * col("__me")).as("__soe"))
    val num = col("__n") * col("__soe") - col("__so") * col("__se")
    val den = sqrt((col("__n") * col("__soo") -
      col("__so") * col("__so")) *
      (col("__n") * col("__see") - col("__se") * col("__se")))
    val r = num / den
    a.select(col("__n").cast("long").as("n_entities"),
      when(den > 0, r).as("r_half"),
      when(den > 0 && r > -1, lit(2.0) * r / (lit(1.0) + r))
        .as("spearman_brown"))
  }

  /**
   * Engagement intensity by tenure: events per USER-DAY at each age
   * week since a user's first event — the exposure-corrected
   * engagement-aging curve that cohort retention (presence/absence)
   * can't show: retention says users come back, this says how HARD
   * they use it as they age. Exposure at age week b counts only
   * users whose observation window [first, global max] reaches that
   * age: contribution min(span − 7b + 1, 7) days.
   *
   * Scale shape: one groupBy(user) firsts pass (+1-row horizon
   * broadcast), an equi-join back for ages, one bucket groupBy, and
   * a span-cell explode bounded by |calendar|/7 buckets. Returns
   * one row per age week: (age_week, n_events, user_days,
   * events_per_user_day).
   */
  def engagementByTenure(df: DataFrame, idCol: String,
      tsCol: String): DataFrame = {
    val base = df.where(col(idCol).isNotNull && col(tsCol).isNotNull)
      .select(col(idCol).as("__u"), to_date(col(tsCol)).as("__d"))
    val gmax = broadcast(base.agg(max(col("__d")).as("__gm")))
    val firsts = base.groupBy("__u").agg(min(col("__d")).as("__f"))
      .crossJoin(gmax)
      .select(col("__u"), col("__f"),
        datediff(col("__gm"), col("__f")).as("__span"))
      .localCheckpoint()
    val ev = base.join(firsts, Seq("__u"))
      .select(floor(datediff(col("__d"), col("__f")) / 7)
        .cast("long").as("age_week"))
      .groupBy("age_week").agg(count(lit(1)).as("n_events"))
    val spans = firsts.groupBy("__span")
      .agg(count(lit(1)).as("__nu"))
      .withColumn("age_week",
        explode(sequence(lit(0L), floor(col("__span") / 7)
          .cast("long"))))
      .groupBy("age_week")
      .agg(sum(col("__nu") * least(col("__span") - col("age_week") * 7
        + 1, lit(7L))).as("user_days"))
    ev.join(spans, Seq("age_week"))
      .select(col("age_week"), col("n_events"), col("user_days"),
        (col("n_events").cast("double") / col("user_days"))
          .as("events_per_user_day"))
  }

  /**
   * Markov entropy rate of the per-entity event-type process:
   * H = −Σᵢⱼ p(i,j)·ln p(j|i) over observed transitions, reported
   * against the marginal entropy H₀ = −Σᵢ p(i)·ln p(i) and as
   * predictability 1 − H/ln k — "how much does knowing the CURRENT
   * event tell you about the next one", the single-number summary
   * of the transition matrix the raw q120 counts don't give
   * (H ≈ H₀ → the chain is memoryless; H ≪ H₀ → strong structure).
   *
   * Scale shape: one partitioned lead window, one groupBy(i, j) ≤ k²
   * cell frame, broadcast row totals, one reduce. Returns 1 row:
   * (n_transitions, n_states, h_rate, h_marginal, predictability).
   */
  def markovEntropyRate(df: DataFrame, idCol: String, tsCol: String,
      typeCol: String, tieCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__u"))
      .orderBy(col("__t").asc, col("__tb").asc)
    val trans = df
      .where(col(idCol).isNotNull && col(tsCol).isNotNull &&
        col(typeCol).isNotNull)
      .select(col(idCol).as("__u"), col(tsCol).as("__t"),
        struct(tieCols.map(col): _*).as("__tb"),
        col(typeCol).as("__a"))
      .withColumn("__b", lead(col("__a"), 1).over(w))
      .where(col("__b").isNotNull)
      .groupBy("__a", "__b")
      .agg(count(lit(1)).cast("double").as("__nij"))
      .localCheckpoint()
    val rows = trans.groupBy("__a")
      .agg(sum(col("__nij")).as("__ni"))
    val tot = broadcast(rows.agg(sum(col("__ni")).as("__T"),
      count(lit(1)).as("__k")))
    val hRate = trans.join(broadcast(rows), Seq("__a")).crossJoin(tot)
      .agg(max(col("__T")).cast("long").as("n_transitions"),
        max(col("__k")).as("n_states"),
        (-sum(col("__nij") / col("__T") *
          log(col("__nij") / col("__ni")))).as("h_rate"))
    val hMarg = broadcast(rows.crossJoin(tot)
      .agg((-sum(col("__ni") / col("__T") *
        log(col("__ni") / col("__T")))).as("h_marginal")))
    hRate.crossJoin(hMarg)
      .select(col("n_transitions"), col("n_states"), col("h_rate"),
        col("h_marginal"),
        when(col("n_states") > 1,
          lit(1.0) - col("h_rate") / log(col("n_states").cast("double")))
          .as("predictability"))
  }

  /**
   * Process-mining conformance: each entity's ordered event-type
   * sequence (types mapped to single chars, capped at `maxEvents`)
   * is aligned against the canonical `target` string by Levenshtein
   * distance — "how far does each user's journey deviate from the
   * designed funnel", the distribution the strict q113 funnel
   * (prefix-match only) cannot see: distance 1 separates
   * skipped-one-step users from chaos. Returns the distance
   * histogram: (distance, n_entities, share).
   *
   * Scale shape: one partitioned sort-window per entity folded into
   * a groupBy collect of ≤ maxEvents chars (the cap bounds per-group
   * state; longer journeys score on their prefix, documented), one
   * map-side levenshtein, one ≤|distances| groupBy.
   */
  def sequenceConformance(df: DataFrame, idCol: String, tsCol: String,
      typeCol: String, typeChars: Seq[(String, String)],
      target: String, maxEvents: Int = 512,
      tieCols: Seq[String] = Nil): DataFrame = {
    require(typeChars.nonEmpty && typeChars.forall(_._2.length == 1),
      "sequenceConformance: typeChars maps each type to ONE char")
    val chr = typeChars.tail.foldLeft(
      when(col(typeCol) === typeChars.head._1, typeChars.head._2)) {
        case (acc, (t, c)) => acc.when(col(typeCol) === t, c) }
    val base = df
      .where(col(idCol).isNotNull && col(tsCol).isNotNull &&
        col(typeCol).isin(typeChars.map(_._1): _*))
      .select(col(idCol).as("__u"), col(tsCol).as("__t"),
        struct(tieCols.map(col): _*).as("__tb"), chr.as("__ch"))
    val seqs = base.groupBy("__u")
      .agg(array_join(transform(slice(array_sort(collect_list(
        struct(col("__t"), col("__tb"), col("__ch")))), 1, maxEvents),
        x => x("__ch")), "").as("__seq"))
      .select(levenshtein(col("__seq"), lit(target)).as("distance"))
    val tot = broadcast(seqs.agg(count(lit(1)).cast("double")
      .as("__n")))
    seqs.groupBy("distance")
      .agg(count(lit(1)).as("n_entities"))
      .crossJoin(tot)
      .select(col("distance"), col("n_entities"),
        (col("n_entities") / col("__n")).as("share"))
  }

  def clumpiness(df: DataFrame, idCol: String, tsCol: String,
      tieCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.where(col(idCol).isNotNull && col(tsCol).isNotNull)
      .select(col(idCol).as("__u"), unix_micros(col(tsCol)).as("__t"),
        struct(tieCols.map(col): _*).as("__tb"))
    val bounds = broadcast(base.agg(min(col("__t")).as("__lo"),
      max(col("__t")).as("__hi")))
    val w = Window.partitionBy(col("__u"))
      .orderBy(col("__t").asc, col("__tb").asc)
    // one grouped pass: inner-gap terms aggregate, the two boundary
    // terms are algebra on the same group's min/max — no union, no
    // second shuffle, no join (the first cut's union+join chain
    // tripled the stage count for identical numbers)
    def xlnx(x: Column): Column =
      coalesce(when(x > 0, x * log(x)), lit(0.0))
    val xg = (col("__nx") - col("__t")).cast("double") /
      (col("__hi") - col("__lo")).cast("double")
    val perUser = base.crossJoin(bounds)
      .withColumn("__nx", lead(col("__t"), 1).over(w))
      .groupBy("__u")
      .agg(coalesce(sum(when(col("__nx").isNotNull && xg > 0,
          xg * log(xg))), lit(0.0)).as("__sxi"),
        min(col("__t")).as("__fst"), max(col("__t")).as("__lst"),
        max(col("__lo")).as("__lo"), max(col("__hi")).as("__hi"),
        count(lit(1)).cast("double").as("__ne"))
      .select(round(lit(1.0) + (col("__sxi") +
        xlnx((col("__fst") - col("__lo")).cast("double") /
          (col("__hi") - col("__lo")).cast("double")) +
        xlnx((col("__hi") - col("__lst")).cast("double") /
          (col("__hi") - col("__lo")).cast("double"))) /
        log(col("__ne") + 1), 9).as("__c"))
      .localCheckpoint()
    val pct = graft.analysis.AnalysisPlanner.exactPercentilesDisc(
      perUser, "__c",
      Seq("c_p25" -> 0.25, "c_p50" -> 0.5, "c_p75" -> 0.75), Nil)
    val sm = perUser.agg(count(lit(1)).as("n_entities"),
      avg(col("__c")).as("mean_c"))
    val win = broadcast(bounds.select(
      ((col("__hi") - col("__lo")) / 1000000.0).as("window_seconds")))
    sm.crossJoin(broadcast(pct)).crossJoin(win)
      .select(col("n_entities"), col("window_seconds"), col("mean_c"),
        col("c_p25"), col("c_p50"), col("c_p75"))
  }
}
