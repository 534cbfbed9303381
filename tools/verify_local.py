#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/verify_local.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ (spark parquet result) and runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB with every
testdata table registered as a view. Compares: column-name sets,
row counts, and cell values (exact for non-floats, tiny epsilon report
for floats — the real driver hash-compares, so we flag ANY diff).
"""
import json
import math
import struct
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        # Byte-faithful: the real driver hash-compares raw bytes, so
        # -0.0 vs 0.0 and differing NaN payloads MUST fail here too.
        return struct.pack("<d", v).hex()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    try:  # Decimal → float
        import decimal
        if isinstance(v, decimal.Decimal):
            return float(v)
    except Exception:
        pass
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: exec error: {str(e)[:200]}")
            n_fail += 1
            continue
        gcols, wcols = sorted(got.columns), sorted(want.columns)
        if gcols != wcols:
            print(f"FAIL {name}: columns {gcols} != {wcols}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        g = got[gcols]
        w = want[wcols]
        bad = []
        for i in range(len(g)):
            for c in gcols:
                a, b = norm(g[c].iloc[i]), norm(w[c].iloc[i])
                if isinstance(a, float) and isinstance(b, float):
                    if a != b and not (math.isnan(a) and math.isnan(b)):
                        bad.append((i, c, a, b, abs(a - b)))
                elif str(a) != str(b):
                    bad.append((i, c, a, b, None))
        if bad:
            print(f"FAIL {name}: {len(bad)} cell diffs; first 5:")
            for rec in bad[:5]:
                print("   ", rec)
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows, {len(gcols)} cols)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
