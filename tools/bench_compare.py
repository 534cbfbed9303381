#!/usr/bin/env python3
"""Compare two BENCH_FULL.json files and flag real per-query regressions.

Usage: python3 tools/bench_compare.py <old.json> <new.json> [ratio=1.5]

Prints queries present in both whose new/old min-time ratio exceeds the
threshold (candidates for an isolated re-run before calling them real —
shared-box noise routinely fakes 2x on this host), plus totals and the
new file's error map if any queries failed. Exits non-zero when any
query regressed past the threshold or errored, so the round-end routine
can gate on drift (probe regressions in isolation before shipping).
"""
import json
import sys


def main() -> int:
    old_path, new_path = sys.argv[1], sys.argv[2]
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    oq, nq = old["queries"], new["queries"]
    # failed queries record null, not a time — compare only real pairs
    shared = sorted(q for q in set(oq) & set(nq)
                    if oq[q] is not None and nq[q] is not None)
    regressions = [(q, oq[q], nq[q]) for q in shared
                   if oq[q] > 0.05 and nq[q] / max(oq[q], 1e-9) > ratio]
    print(f"shared={len(shared)} old_total={old['value']:.1f}s "
          f"new_total={new['value']:.1f}s "
          f"old_n={len(oq)} new_n={len(nq)}")
    for q, o, n in sorted(regressions, key=lambda t: -t[2] / t[1]):
        print(f"REGRESS {q}: {o:.2f}s -> {n:.2f}s ({n / o:.1f}x)")
    if not regressions:
        print("no per-query regressions above threshold")
    err = new.get("err") or {}
    for q, m in err.items():
        print(f"ERR {q}: {m}")
    return 1 if (err or regressions) else 0


if __name__ == "__main__":
    sys.exit(main())
