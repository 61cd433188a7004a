#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare
row-count, schema shape, and order-insensitive values.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> list[str]:
    issues = []
    if len(got) != len(exp):
        issues.append(f"rowcount {len(got)} != {len(exp)}")
        return issues
    g, e = normalize(got), normalize(exp)
    if list(g.columns) != list(e.columns):
        issues.append(f"columns {list(g.columns)} != {list(e.columns)}")
        return issues
    for c in g.columns:
        gv, ev = g[c], e[c]
        if pd.api.types.is_float_dtype(gv):
            ok = np.allclose(gv.fillna(-9e99), ev.fillna(-9e99), rtol=0, atol=1.5e-6)
            exact = (gv.fillna(-9e99) == ev.fillna(-9e99)).all()
            if not ok:
                bad = (~np.isclose(gv.fillna(-9e99), ev.fillna(-9e99), rtol=0, atol=1.5e-6)).sum()
                issues.append(f"col {c}: {bad} values differ beyond 1.5e-6")
            elif not exact:
                n = (gv.fillna(-9e99) != ev.fillna(-9e99)).sum()
                issues.append(f"col {c}: WARN {n} values differ in rounding ulps (hash would mismatch)")
        else:
            if not gv.equals(ev):
                n = (gv != ev).sum()
                issues.append(f"col {c}: {n} values differ (dtype {gv.dtype} vs {ev.dtype})")
    return issues


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # the PQ oracles embed numpy-trained codebooks as SQL literals; the
    # generator must train on the same sf the gate compares at
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir

    import __spark_entry__ as entrymod
    from gordo_spark import get_spark

    spark = get_spark("check_correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS {name}: {len(got)} rows (rows-only, {time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as exc:
            print(f"FAIL {name}: duckdb error: {exc}")
            n_fail += 1
            continue
        issues = compare(name, got, exp)
        hard = [i for i in issues if "WARN" not in i]
        if hard:
            print(f"FAIL {name} ({time.time()-t0:.1f}s):")
            for i in issues:
                print(f"   - {i}")
            n_fail += 1
        else:
            warn = "".join(f"\n   - {i}" for i in issues)
            print(f"PASS {name}: {len(got)} rows ({time.time()-t0:.1f}s){warn}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
