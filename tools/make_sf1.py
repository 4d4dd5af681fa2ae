#!/usr/bin/env python3
"""Replicate the driver's sf0.1 testdata 10x (~sf1) with DISJOINT,
FK-consistent key ranges — the input for the once-per-round sf1 oracle
stress pass (VERDICT r16 ask #6: flush scale-dependent drift — NDV
estimator branches, PQ ADC ranks, widening stat strings — that the
sf0.01 gate's value space never reaches).

Key families shift together so joins stay exact at 10x size:
  customer.c_custkey <- orders.o_custkey
  orders.o_orderkey  <- lineitem.l_orderkey
  part.p_partkey     <- lineitem.l_partkey
  supplier.s_suppkey <- lineitem.l_suppkey
  events.event_id / events.user_id, documents.doc_id, embeddings.vec_id
Dims (region, nation) copy as-is (TPC-H keeps them constant across SF).
Non-key values are identical per replica — parity only needs both
engines to read the SAME files; DuckDB replays over the same parquet.

Usage: python3 tools/make_sf1.py [outDir=/tmp/sf1data] [copies=10]
"""
import duckdb
import os
import sys

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1data"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 10

con = duckdb.connect()


def base10(table, col):
    mx = con.execute(
        f"SELECT max({col}) FROM read_parquet('{SRC}/{table}.parquet')"
    ).fetchone()[0]
    b = 1
    while b <= mx:
        b *= 10
    # several queries synthesize "fresh" keys at key + 900000 (beyond any
    # base-SF max); the replica shift must clear that headroom too, or the
    # synthetic keys collide with a replica's range (q196 at shift 1e5)
    return max(b, 10 ** 8)


# one shift unit per key FAMILY (FK pairs share it)
K = {
    "cust": base10("customer", "c_custkey"),
    "ord": base10("orders", "o_orderkey"),
    "part": base10("part", "p_partkey"),
    "supp": base10("supplier", "s_suppkey"),
    "event": base10("events", "event_id"),
    "user": base10("events", "user_id"),
    "doc": base10("documents", "doc_id"),
    "vec": base10("embeddings", "vec_id"),
}

# table -> {column: family}; unlisted columns copy verbatim
SHIFTS = {
    "region": {},
    "nation": {},
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "ord", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "ord", "l_partkey": "part",
                 "l_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}

os.makedirs(DST, exist_ok=True)
for table, shifts in SHIFTS.items():
    src = f"{SRC}/{table}.parquet"
    cols = [c[0] for c in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{src}')").fetchall()]
    if not shifts:  # dims: byte-identical copy of the single file
        import shutil
        shutil.copyfile(src, f"{DST}/{table}.parquet")
        print(f"{table}: copied (dim)")
        continue
    selects = []
    for i in range(N):
        exprs = []
        for c in cols:
            if c in shifts:
                exprs.append(f"{c} + {i * K[shifts[c]]} AS {c}")
            else:
                exprs.append(c)
        selects.append(
            f"SELECT {', '.join(exprs)} FROM read_parquet('{src}')")
    sql = " UNION ALL ".join(selects)
    con.execute(
        f"COPY ({sql}) TO '{DST}/{table}.parquet' (FORMAT PARQUET, "
        f"COMPRESSION SNAPPY)")
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{DST}/{table}.parquet')"
    ).fetchone()[0]
    print(f"{table}: {n} rows ({N}x)")
print(f"wrote {DST}")
