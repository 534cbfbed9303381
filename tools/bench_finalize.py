#!/usr/bin/env python3
"""Round-end bench flow that OBEYS its own PROBE-BEFORE-RECORD flag.

Usage: python3 tools/bench_finalize.py <out.json> <run1.json> [run2.json ...]

1. Folds the given bench runs with bench_record.py (min across samples).
2. If any query is flagged PROBE-BEFORE-RECORD (last-run min > 2x the
   merged min - the load-phantom signal), runs EXACTLY those queries in
   a fresh isolated session (graft.JudgeProbe: warm tables, min-of-3,
   noop sink) writing a probe run JSON.
3. Re-folds with the probe run included (probe runs are passed BEFORE
   the final bench run so per-query coverage of the last run decides
   the suite membership), so every committed value is
   min(bench samples, isolated probe) - no committed min exceeds 2x its
   isolated probe by construction.

Repeats the probe loop up to 2 times (new flags can surface if the
probe box itself was loaded), then writes the final record and prints
residual flags (if any survive, the probe itself reproduced the time -
i.e. the value is real, not load).
"""
import json
import re
import subprocess
import sys

FLAG_RE = re.compile(r"^PROBE-BEFORE-RECORD (\S+):")


def fold(out_path, run_paths):
    p = subprocess.run(
        [sys.executable, "tools/bench_record.py", out_path] + run_paths,
        capture_output=True, text=True, check=True)
    sys.stdout.write(p.stdout)
    return [m.group(1) for m in
            (FLAG_RE.match(l) for l in p.stdout.splitlines()) if m]


def probe(queries, probe_path):
    print(f"[finalize] isolated-probing {len(queries)} flagged queries")
    subprocess.run(
        ["sbt", "-batch",
         "runMain graft.JudgeProbe --json=" + probe_path + " "
         + " ".join(queries)],
        check=True)


def main() -> int:
    out_path, run_paths = sys.argv[1], list(sys.argv[2:])
    probed: set = set()
    flagged = fold(out_path, run_paths)
    # NOTE the flag compares the LAST bench run's value to the merged
    # min, so a query stays "flagged" even after its isolated probe is
    # folded in (the loaded last-run sample doesn't change) - track the
    # probed set and only probe each query once.
    for i in range(2):
        todo = sorted(set(flagged) - probed)
        if not todo:
            break
        probe_path = f"/tmp/bench_probe_{i}.json"
        probe(todo, probe_path)
        probed.update(todo)
        # probe runs go BEFORE the final bench run: the last run still
        # defines suite membership, probes only contribute samples
        run_paths = [probe_path] + run_paths
        flagged = fold(out_path, run_paths)
    unprobed = sorted(set(flagged) - probed)
    if unprobed:
        print("[finalize] WARNING: flagged but never probed: "
              + ", ".join(unprobed))
        return 1
    if probed:
        print(f"[finalize] record clean: {len(probed)} flagged queries "
              "isolated-probed and folded - every committed min is "
              "min(bench, isolated probe)")
    else:
        print("[finalize] record clean: no load phantoms flagged")
    return 0


if __name__ == "__main__":
    sys.exit(main())
