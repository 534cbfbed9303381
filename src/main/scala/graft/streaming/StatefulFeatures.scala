package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One keyed observation on the stream. */
final case class FeatureEvent(key: String, value: Double, ts: Long)

/** Running per-key state (bounded: four scalars per key). */
final case class FeatureState(count: Long, sum: Double, last: Double,
    lastTs: Long)

/** Emitted snapshot after each micro-batch touches a key. */
final case class FeatureSnapshot(key: String, count: Long, mean: Double,
    last: Double, lastTs: Long)

/** Welford running-variance state: three scalars per key. */
final case class WelfordState(count: Long, mean: Double, m2: Double)

/** EWMA state: the smoothed value + bookkeeping, three scalars. */
final case class EwmaState(count: Long, ewma: Double, lastTs: Long)

/** Session input row: epoch-millis ts plus the original watermarked
  * timestamp column (must survive the projection — Spark's streaming
  * checker requires the watermarked attribute in the stateful
  * operator's child for EventTimeTimeout). */
final case class SessionEvent(key: String, ts: Long,
    et: java.sql.Timestamp)

/** Open-session state: three scalars per key with an open session. */
final case class SessionState(start: Long, end: Long, n: Long)

/** A closed session. */
final case class SessionOut(key: String, sessionStart: Long,
    sessionEnd: Long, nEvents: Long)

/** Emitted EWMA point. */
final case class EwmaPoint(key: String, ts: Long, value: Double,
    ewma: Double)

/** Per-event verdict from [[StatefulFeatures.anomalyStream]]. */
final case class AnomalyVerdict(key: String, ts: Long, value: Double,
    zscore: Option[Double], anomaly: Boolean)

/**
 * Custom streaming state via `flatMapGroupsWithState` — the path for
 * per-entity features a windowed aggregation cannot express: a TRUE
 * running count/mean/latest over the unbounded stream (no window
 * horizon), re-emitted whenever a key receives data.
 *
 * Scale stance: state is O(distinct keys) × 4 scalars, partitioned by
 * key hash across the cluster and checkpointed by the streaming engine;
 * within a micro-batch events fold in event-time order so `last` is
 * deterministic under batch-boundary changes. Works identically on a
 * static Dataset (one "batch" = the whole input), which is how the spec
 * pins down semantics.
 */
object StatefulFeatures {

  def runningFeatures(events: Dataset[FeatureEvent])
      : Dataset[FeatureSnapshot] = {
    implicit val stateEnc = Encoders.product[FeatureState]
    implicit val outEnc = Encoders.product[FeatureSnapshot]
    events
      .groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[FeatureEvent],
            state: GroupState[FeatureState]) =>
          val prev = state.getOption
            .getOrElse(FeatureState(0L, 0.0, Double.NaN, Long.MinValue))
          val next = rows.toSeq.sortBy(_.ts).foldLeft(prev) { (s, ev) =>
            FeatureState(s.count + 1, s.sum + ev.value,
              if (ev.ts >= s.lastTs) ev.value else s.last,
              math.max(ev.ts, s.lastTs))
          }
          state.update(next)
          Iterator.single(FeatureSnapshot(key, next.count,
            next.sum / next.count, next.last, next.lastTs))
      }
  }

  /**
   * Streaming per-entity anomaly flags — the unbounded-history sibling
   * of [[graft.ops.TimeSeries.rollingAnomaly]] (which scores against a
   * trailing row window in batch): per-key Welford running mean/M2
   * state (three scalars — bounded regardless of stream length), each
   * event scored against the state BEFORE it folds in (the strict-prior
   * stance: a spike never deflates its own baseline). Events with fewer
   * than `minPrior` prior observations or a degenerate (zero-variance)
   * baseline report no score. Within a micro-batch events fold in
   * event-time order, so verdicts are deterministic under
   * batch-boundary changes — and identical on a static Dataset, which
   * is how the spec pins the semantics.
   */
  def anomalyStream(events: Dataset[FeatureEvent], z: Double = 3.0,
      minPrior: Long = 2): Dataset[AnomalyVerdict] = {
    implicit val stateEnc = Encoders.product[WelfordState]
    implicit val outEnc = Encoders.product[AnomalyVerdict]
    events
      .groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[FeatureEvent],
            state: GroupState[WelfordState]) =>
          var s = state.getOption.getOrElse(WelfordState(0L, 0.0, 0.0))
          val out = rows.toSeq.sortBy(ev => (ev.ts, ev.value)).map { ev =>
            val variance = if (s.count >= 2) s.m2 / (s.count - 1) else 0.0
            val score =
              if (s.count >= minPrior && variance > 0.0)
                Some((ev.value - s.mean) / math.sqrt(variance))
              else None
            // fold the event in AFTER scoring (Welford update)
            val n1 = s.count + 1
            val d1 = ev.value - s.mean
            val mean1 = s.mean + d1 / n1
            s = WelfordState(n1, mean1, s.m2 + d1 * (ev.value - mean1))
            AnomalyVerdict(key, ev.ts, ev.value, score,
              score.exists(v => math.abs(v) > z))
          }
          state.update(s)
          out.iterator
      }
  }

  /**
   * Streaming per-entity EWMA — the unbounded twin of
   * [[graft.ops.TimeSeries.ewma]] (α = 2/(span+1), adjust=false):
   * per-key state is ONE scalar (the current smoothed value) plus the
   * last event time; each micro-batch folds its events in event-time
   * order, so the emitted series equals the batch operator run over
   * the concatenated history regardless of how delivery chops the
   * stream into batches — the parity StreamingSpec asserts.
   */
  def ewmaStream(events: Dataset[FeatureEvent], span: Int)
      : Dataset[EwmaPoint] = {
    require(span >= 1, "span must be >= 1")
    val alpha = 2.0 / (span + 1.0)
    implicit val stateEnc = Encoders.product[EwmaState]
    implicit val outEnc = Encoders.product[EwmaPoint]
    events
      .groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[FeatureEvent],
            state: GroupState[EwmaState]) =>
          var s = state.getOption
            .getOrElse(EwmaState(0L, Double.NaN, Long.MinValue))
          val out = rows.toSeq.sortBy(ev => (ev.ts, ev.value)).map { ev =>
            val e = if (s.count == 0L) ev.value
                    else alpha * ev.value + (1 - alpha) * s.ewma
            s = EwmaState(s.count + 1, e, math.max(ev.ts, s.lastTs))
            EwmaPoint(key, ev.ts, ev.value, e)
          }
          state.update(s)
          out.iterator
      }
  }

  /**
   * Streaming sessionization with TIMEOUT-DRIVEN state expiry — the
   * state-lifecycle complement of the windowed `session_window`
   * aggregation in [[StreamingAgg]]: an open session per key lives in
   * state, extends while events arrive within `gapMs` of its current
   * end, and is EMITTED (then cleared) either when a later event opens
   * a new session or when the EVENT-TIME timeout fires — i.e. the
   * watermark passed `session end + gap`, so the engine itself closes
   * idle sessions without waiting for the key's next event. That
   * timeout path is what a pure aggregation can't express and what
   * bounds state for keys that go silent: state is O(open sessions),
   * not O(keys ever seen).
   *
   * Events inside a micro-batch fold in event-time order; late events
   * older than the open session's start are counted into it (the
   * watermark on the SOURCE governs true lateness). Emitted rows:
   * (key, session_start, session_end, n_events).
   */
  def sessionStream(df: DataFrame, keyCol: String, tsCol: String,
      gapMs: Long, watermarkDelay: Option[String] = None)
      : Dataset[SessionOut] = {
    require(gapMs > 0, "gap must be positive")
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[SessionOut]
    import org.apache.spark.sql.functions._
    // watermark BEFORE the projection, and the watermarked attribute
    // itself carried THROUGH it (aliased — alias preserves the
    // watermark metadata): Spark's streaming checker requires it in the
    // stateful operator's child for EventTimeTimeout
    val withWm = watermarkDelay.fold(df)(d => df.withWatermark(tsCol, d))
    val events = withWm.select(
      col(keyCol).cast("string").as("key"),
      unix_millis(col(tsCol).cast("timestamp")).as("ts"),
      col(tsCol).as("et"))
      .as[SessionEvent](Encoders.product[SessionEvent])
    events
      .groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[SessionEvent],
            state: GroupState[SessionState]) =>
          if (!rows.hasNext && state.hasTimedOut) {
            // watermark passed end+gap: close and clear the idle session
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(key, s.start, s.end, s.n))
          } else {
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            var cur = state.getOption
            rows.toSeq.sortBy(_.ts).foreach { ev =>
              cur match {
                case Some(s) if ev.ts <= s.end + gapMs =>
                  cur = Some(SessionState(math.min(s.start, ev.ts),
                    math.max(s.end, ev.ts), s.n + 1))
                case Some(s) =>
                  closed += SessionOut(key, s.start, s.end, s.n)
                  cur = Some(SessionState(ev.ts, ev.ts, 1))
                case None =>
                  cur = Some(SessionState(ev.ts, ev.ts, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // ask the engine to close this session once the watermark
              // passes its gap horizon
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.iterator
          }
      }
  }

  /**
   * Watermarked streaming exact dedup: keeps the first row per key
   * within the watermark horizon; duplicate-key state ages out with the
   * watermark, so state stays bounded by the horizon's key cardinality
   * (`dropDuplicatesWithinWatermark` — the CDC at-least-once →
   * exactly-once compaction step).
   */
  def dedupStream(df: DataFrame, tsCol: String, lateness: String,
      keys: Seq[String]): DataFrame =
    df.withWatermark(tsCol, StreamingAgg.humanize(lateness))
      .dropDuplicatesWithinWatermark(keys)
}
