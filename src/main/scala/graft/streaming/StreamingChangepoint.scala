package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One keyed observation for the change monitor. */
final case class PhEvent(key: String, ts: Long, value: Double)

/** Page–Hinkley per-key state: four scalars. */
final case class PhState(count: Long, sum: Double, m: Double,
    minM: Double, lastTs: Long)

/** Per-observation verdict: the detector's fence distance + alarm. */
final case class PhVerdict(key: String, ts: Long, value: Double,
    gap: Double, alarm: Boolean)

/**
 * Online Page–Hinkley mean-shift monitor — the STREAMING twin of
 * [[graft.ops.TimeSeries.pageHinkley]]: per key it maintains the
 * running mean, the cumulative deviation m_t = Σ(x_i − x̄_i − δ) and
 * its running minimum, and emits one verdict per observation with
 * gap = m_t − min m and alarm = gap > λ. Batch-split invariant: the
 * verdicts are a pure function of the per-key event sequence (events
 * fold in (ts, value) order within each micro-batch — the value
 * tiebreak pins the fold order under duplicate per-key timestamps),
 * so any micro-batch slicing of the same input replays the batch
 * operator exactly — the equality the spec asserts, provided a split
 * does not separate equal-ts events across batches.
 *
 * Scale stance: state is O(distinct keys) × 5 scalars, key-hash
 * partitioned and engine-checkpointed; no window, no buffer of
 * history. Late (out-of-order ACROSS batches) events fold with the
 * state as-is — bound disorder upstream with a watermark when exact
 * replay matters.
 */
object StreamingChangepoint {

  def pageHinkleyStream(events: Dataset[PhEvent], delta: Double = 0.0,
      lambda: Double = 10.0): Dataset[PhVerdict] = {
    implicit val stateEnc = Encoders.product[PhState]
    implicit val outEnc = Encoders.product[PhVerdict]
    events
      .groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[PhEvent],
            state: GroupState[PhState]) =>
          // minM starts at +∞ so the FIRST observation pins it to m_1
          // (the batch operator's prefix-min has no synthetic 0 term)
          var s = state.getOption
            .getOrElse(PhState(0L, 0.0, 0.0, Double.PositiveInfinity,
              Long.MinValue))
          // ties on ts break by value so the fold order — and hence
          // the advertised batch-split replay equality — is
          // deterministic even when a key carries duplicate timestamps
          val out = rows.toSeq.sortBy(e => (e.ts, e.value)).map { ev =>
            val count = s.count + 1
            val sum = s.sum + ev.value
            val mean = sum / count
            val m = s.m + (ev.value - mean - delta)
            val minM = math.min(s.minM, m)
            s = PhState(count, sum, m, minM,
              math.max(ev.ts, s.lastTs))
            val gap = m - minM
            PhVerdict(key, ev.ts, ev.value, gap, gap > lambda)
          }
          state.update(s)
          out.iterator
      }
  }
}
