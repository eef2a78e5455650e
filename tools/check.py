#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: tools/check.py <sfDir> <verifyOutDir>

Runs each oracle_sql.json query in DuckDB against the sfDir parquet tables,
loads the corresponding Spark parquet output, and compares schema + values
exactly (column order normalized by sorting column names; row order
normalized by sorting rows). Reports per-query PASS/FAIL with diffs.
"""
import json
import math
import sys
from decimal import Decimal

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    # Wrap every value in a (tag, payload) tuple so rows stay sortable in
    # the presence of NULLs / NaNs mixed with real values.
    if v is None:
        return (0,)
    # DuckDB SUM(BIGINT) → HUGEINT → arrow decimal128: python's int==Decimal
    # equality would hide the type drift the driver's hash catches — keep
    # Decimal distinct so local checks mirror the driver (r03 token_pack).
    if isinstance(v, Decimal):
        return (5, str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return (1, "NaN")
        return (2, v)
    if isinstance(v, list):
        return (3, tuple(norm(x) for x in v))
    if isinstance(v, dict):
        return (4, tuple(sorted((k, norm(x)) for k, x in v.items())))
    return (2, v)


def rows_of(cols, names):
    n = len(cols[0]) if cols else 0
    order = sorted(range(len(names)), key=lambda i: names[i])
    return sorted(tuple(norm(cols[i][r]) for i in order) for r in range(n))


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
            spark_tbl = pq.read_table(f"{out_dir}/{name}")
            duck = con.execute(sql).fetch_arrow_table()
            s_names = sorted(spark_tbl.schema.names)
            d_names = sorted(duck.schema.names)
            if s_names != d_names:
                print(f"FAIL {name}: columns spark={s_names} duck={d_names}")
                n_fail += 1
                continue
            s_rows = rows_of([spark_tbl.column(c).to_pylist()
                              for c in spark_tbl.schema.names],
                             spark_tbl.schema.names)
            d_rows = rows_of([duck.column(c).to_pylist()
                              for c in duck.schema.names],
                             duck.schema.names)
            if len(s_rows) != len(d_rows):
                print(f"FAIL {name}: rows spark={len(s_rows)} duck={len(d_rows)}")
                n_fail += 1
                continue
            bad = [(i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows))
                   if a != b]
            if bad:
                i, a, b = bad[0]
                print(f"FAIL {name}: {len(bad)}/{len(s_rows)} rows differ; "
                      f"first at {i}:\n  spark={a}\n  duck ={b}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(s_rows)} rows)")
                n_pass += 1
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
