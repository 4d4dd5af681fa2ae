#!/usr/bin/env python3
"""Local parity harness mirroring the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>

<outDir> must contain <name>/ parquet dirs (from graft.Verify) and
oracle_sql.json. For each query: run the oracle SQL in DuckDB with views
named after the test tables, load the Spark parquet result, sort columns by
name and rows by all columns, and compare exactly + with float tolerance.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            oracle = con.execute(sql).fetchdf()
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            o, g = normalize(oracle), normalize(got)
            if list(o.columns) != list(g.columns):
                print(f"FAIL {name}: columns oracle={list(o.columns)} "
                      f"got={list(g.columns)}")
                n_fail += 1
                continue
            if len(o) != len(g):
                print(f"FAIL {name}: rows oracle={len(o)} got={len(g)}")
                n_fail += 1
                continue
            # exact compare first; fall back to tolerance for floats
            if o.equals(g):
                print(f"OK   {name}: {len(o)} rows exact")
                continue
            ok = True
            for c in o.columns:
                oc, gc = o[c], g[c]
                if pd.api.types.is_float_dtype(oc) or \
                        pd.api.types.is_float_dtype(gc):
                    import numpy as np
                    if not np.allclose(oc.astype(float), gc.astype(float),
                                       rtol=1e-9, atol=1e-9, equal_nan=True):
                        print(f"FAIL {name}: float col {c} differs")
                        ok = False
                else:
                    neq = (oc != gc) & ~(oc.isna() & gc.isna())
                    if neq.any():
                        i = neq.idxmax()
                        print(f"FAIL {name}: col {c} row {i}: "
                              f"oracle={oc[i]!r} got={gc[i]!r}")
                        ok = False
            if ok:
                print(f"WARN {name}: {len(o)} rows equal only within float "
                      f"tolerance (driver may hash-mismatch)")
            else:
                n_fail += 1
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}")
            n_fail += 1
    print(f"{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'} "
          f"({len(oracles)} oracles)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
