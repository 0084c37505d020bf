#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads the parquet dumps written by `graft.Verify` plus `oracle_sql.json`,
runs each oracle in DuckDB against the same testdata dir, and compares
result sets exactly (columns sorted by name, rows sorted by all columns,
values compared bit-for-bit; NaN == NaN).

Usage: tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((str(type(x)), str(x)) for x in t))
    return [cols[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # Fail-closed count assertion: every query Verify ran (registry.json)
    # must have BOTH an oracle entry and an output dir. A missing side is a
    # FAIL, not a silently shorter report (the r7 failure mode).
    try:
        registry = set(json.load(open(f"{out_dir}/registry.json")))
    except FileNotFoundError:
        registry = set(oracle)
    import os
    outputs = {d for d in os.listdir(out_dir)
               if os.path.isdir(os.path.join(out_dir, d))}
    scope = {n for n in registry if not only or n in only}
    for name in sorted(scope - set(oracle)):
        print(f"FAIL {name}: registry query has no oracle_sql entry")
        n_fail += 1
    for name in sorted(scope - outputs):
        print(f"FAIL {name}: registry query produced no output dir")
        n_fail += 1
    errors = {}
    try:
        errors = json.load(open(f"{out_dir}/_errors.json"))
    except FileNotFoundError:
        pass
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        if name in errors:
            print(f"FAIL {name}: verify error {errors[name]}")
            n_fail += 1
            continue
        if name not in outputs:
            continue  # already counted above
        try:
            spark_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            s_cols, s_rows = norm_rows(
                list(spark_rel.columns), spark_rel.fetchall())
            d_rel = con.sql(sql)
            d_cols, d_rows = norm_rows(list(d_rel.columns), d_rel.fetchall())
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if s_cols != d_cols:
            print(f"FAIL {name}: columns differ spark={s_cols} duck={d_cols}")
            n_fail += 1
            continue
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rowcount spark={len(s_rows)} duck={len(d_rows)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows))
               if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(s_rows)} rows differ; "
                  f"first at {i}:\n  cols : {s_cols}\n  spark: {a}\n  duck : {b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
