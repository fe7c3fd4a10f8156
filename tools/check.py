#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (pandas-canonical).

Usage: python3 tools/check.py <sfDir> <outDir>

Round-1 postmortem: the old version of this script fetched BOTH sides through
DuckDB fetchall(), where Decimal('1.5') == 1.5 compares true — it reported
61/61 green while the driver failed 22 queries. The driver canonicalizes via
PANDAS: the Spark result is loaded with pandas.read_parquet and the oracle
with duckdb .df(), then rows are sorted and values hashed.  That makes dtype
part of the contract:

  - Spark DECIMAL parquet -> pandas object column of Decimal; DuckDB
    sum(DECIMAL) -> float64.  Numerically equal, hash-different.
  - DuckDB sum(INT) -> HUGEINT -> float64; Spark sum(int) -> int64.
  - ARRAY/MAP output columns make pandas sort_values throw (unhashable
    ndarray) — the driver records an err and the query is ungraded.

So this replica loads both sides exactly that way and compares dtypes AND
bit-exact values after the same canonical sort.  If this script crashes on a
query, the driver will too — treat that as a failure of the query design.
"""
import json
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Queries whose CORRECT result is legitimately empty at some scale factor.
# A zero-row match for anything else is a vacuous green (round-8 q22
# postmortem) and fails the gate. Currently none — every judged query binds
# at every tested SF by construction.
ALLOWED_EMPTY = set()


def canonical(df):
    """Lower-case + alphabetically ordered columns, rows sorted by all
    columns (NaNs first, like the driver's sort_values default), fresh
    index.  Raises on unsortable (array/map) cells — intentionally."""
    df = df.rename(columns={c: c.lower() for c in df.columns})
    cols = sorted(df.columns)
    df = df[cols]
    df = df.sort_values(by=cols, na_position="first").reset_index(drop=True)
    return df


def values_equal(a, b):
    """Exact equality per column pair, NaN==NaN, bitwise for floats."""
    if len(a) != len(b):
        return False
    for col in a.columns:
        x, y = a[col], b[col]
        if str(x.dtype).startswith("float") and str(y.dtype).startswith("float"):
            xv, yv = x.to_numpy(), y.to_numpy()
            same = (xv == yv) | (np.isnan(xv) & np.isnan(yv))
            if not same.all():
                return False
        else:
            xn, yn = x.isna().to_numpy(), y.isna().to_numpy()
            if not (xn == yn).all():
                return False
            m = ~xn
            if not (x[m].to_numpy() == y[m].to_numpy()).all():
                return False
    return True


def first_diff(a, b):
    for col in a.columns:
        x, y = a[col].to_numpy(), b[col].to_numpy()
        for i in range(len(x)):
            xv, yv = x[i], y[i]
            if isinstance(xv, float) and isinstance(yv, float):
                if xv == yv or (np.isnan(xv) and np.isnan(yv)):
                    continue
            elif pd.isna(xv) and pd.isna(yv):
                continue
            elif xv == yv:
                continue
            return f"col={col} row={i}: spark={xv!r} oracle={yv!r}"
    return "?"


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    suspects = []
    for name, sql in sorted(oracles.items()):
        try:
            got = canonical(pd.read_parquet(f"{out_dir}/{name}"))
            want = canonical(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: exception {type(e).__name__}: {e}")
            n_fail += 1
            continue
        ok = True
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            ok = False
        elif len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            ok = False
        elif list(map(str, got.dtypes)) != list(map(str, want.dtypes)):
            pairs = [(c, str(got[c].dtype), str(want[c].dtype))
                     for c in got.columns
                     if str(got[c].dtype) != str(want[c].dtype)]
            print(f"FAIL {name}: dtypes differ {pairs}")
            ok = False
        elif not values_equal(got, want):
            print(f"FAIL {name}: values differ: {first_diff(got, want)}")
            ok = False
        if ok:
            if len(got) == 0 and name not in ALLOWED_EMPTY:
                # An empty-vs-empty match proves the query compiles, not that
                # it is right (round-8 postmortem: q22's anti-join never bound
                # on the fixture and stayed vacuously green for a full round).
                # Suspects are counted SEPARATELY from passes so the summary
                # line can never read "N pass, 0 fail" while exiting 1.
                suspects.append(name)
                print(f"SUSPECT {name}: 0 rows on both sides — vacuous match")
            else:
                n_pass += 1
                print(f"PASS {name} ({len(got)} rows)")
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {len(oracles)} oracles, "
          f"{len(suspects)} zero-row suspect{'' if len(suspects) == 1 else 's'}"
          f"{': ' + ', '.join(suspects) if suspects else ''} ==")
    return 1 if n_fail or suspects else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
