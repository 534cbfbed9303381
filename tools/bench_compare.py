#!/usr/bin/env python3
"""Compare two BENCH_FULL.json files and flag real per-query regressions.

Usage: python3 tools/bench_compare.py <old.json> <new.json> [ratio=1.5]

Prints queries present in both whose new/old min-time ratio exceeds the
threshold, plus totals and the new file's error map if any queries
failed. When both files carry per-query raw samples (the "samples" map
Bench writes since round 9), drift self-adjudicates: a REAL regression
shows every new sample slow (tight spread, high min), while shared-box
noise shows a wide spread — those are printed as NOISY and do not fail
the gate (probe them in isolation before calling them real). Exits
non-zero on clean regressions or errors, so the round-end routine can
gate on drift.
"""
import json
import sys

NOISY_SPREAD = 1.5  # max/min within one query's samples


def spread(samples):
    ts = [t for t in (samples or []) if t is not None and t > 0]
    if len(ts) < 2:
        return None
    return max(ts) / min(ts)


def main() -> int:
    old_path, new_path = sys.argv[1], sys.argv[2]
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    oq, nq = old["queries"], new["queries"]
    osamp, nsamp = old.get("samples") or {}, new.get("samples") or {}
    # failed queries record null, not a time — compare only real pairs
    shared = sorted(q for q in set(oq) & set(nq)
                    if oq[q] is not None and nq[q] is not None)
    drifted = [(q, oq[q], nq[q]) for q in shared
               if oq[q] > 0.05 and nq[q] / max(oq[q], 1e-9) > ratio]
    print(f"shared={len(shared)} old_total={old['value']:.1f}s "
          f"new_total={new['value']:.1f}s "
          f"old_n={len(oq)} new_n={len(nq)}")
    regressions = []
    for q, o, n in sorted(drifted, key=lambda t: -t[2] / t[1]):
        sp = spread(nsamp.get(q))
        # wide new spread = the box was busy during at least one sample;
        # the min is then an upper bound on true cost, not evidence of a
        # real slowdown — report, don't gate
        if sp is not None and sp > NOISY_SPREAD:
            print(f"NOISY {q}: {o:.2f}s -> {n:.2f}s ({n / o:.1f}x, "
                  f"sample spread {sp:.1f}x) — re-probe in isolation")
        else:
            tag = "" if sp is None else f" (spread {sp:.1f}x, consistent)"
            print(f"REGRESS {q}: {o:.2f}s -> {n:.2f}s ({n / o:.1f}x){tag}")
            regressions.append(q)
        # >2x the committed min must NOT be recorded as-is: either it is
        # real (probe confirms, investigate) or the run was loaded (fold
        # via tools/bench_record.py so the committed record keeps the
        # honest minimum) — never let a one-run phantom become the next
        # round's baseline
        if n > 2.0 * o:
            print(f"PROBE-BEFORE-RECORD {q}: final-run {n:.2f}s exceeds "
                  f"2x the committed min {o:.2f}s — isolate-probe, then "
                  f"record via tools/bench_record.py")
    if not drifted:
        print("no per-query drift above threshold")
    err = new.get("err") or {}
    for q, m in err.items():
        print(f"ERR {q}: {m}")
    return 1 if (err or regressions) else 0


if __name__ == "__main__":
    sys.exit(main())
