#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>

Reads each <outDir>/<name> parquet result (written by graft.Verify), runs the
paired oracle SQL from <outDir>/oracle_sql.json in DuckDB over the same
<sfDir>/*.parquet tables, and compares: row count, sorted column names, and
exact value equality both in result order and after a canonical row sort.
Exact means exact — bitwise for doubles — matching the driver's hash-match.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v.hex()
    return v


def eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return (math.isnan(a) and math.isnan(b)) or a == b
    if a is None or b is None:
        return a is None and b is None
    # Decimal vs Decimal compares by value; datetimes compare directly.
    try:
        return a == b
    except TypeError:
        return str(a) == str(b)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = [c.lower() for c in got_rel.columns]
            got = got_rel.fetchall()
            want_rel = con.sql(sql)
            want_cols = [c.lower() for c in want_rel.columns]
            want = want_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        ok = True
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(want_cols)}")
            ok = False
        elif len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            ok = False
        else:
            gidx = [got_cols.index(c) for c in sorted(got_cols)]
            widx = [want_cols.index(c) for c in sorted(want_cols)]
            for i, (g, w) in enumerate(zip(got, want)):
                grow = [g[j] for j in gidx]
                wrow = [w[j] for j in widx]
                bad = [(sorted(got_cols)[k], grow[k], wrow[k])
                       for k in range(len(grow)) if not eq(grow[k], wrow[k])]
                if bad:
                    print(f"FAIL {name}: row {i} differs: {bad[:3]}")
                    ok = False
                    break
        if ok:
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows)")
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, "
          f"{len(oracles)} oracles ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
