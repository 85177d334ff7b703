#!/usr/bin/env python3
"""Local oracle harness: emulates the driver's DuckDB correctness compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB with the testdata tables
registered as views, and compares schemas + multiset of rows exactly.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    # decimals, timestamps, bytes -> canonical string
    t = type(v).__name__
    if t == "Decimal":
        return ("dec", str(v))
    if t in ("datetime", "date", "Timestamp"):
        return ("ts", str(v))
    if isinstance(v, (bytes, bytearray)):
        return ("b", bytes(v).hex())
    return v


def rows_key(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return [tuple(norm(r[i]) for i in order) for r in rows]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = [c.lower() for c in got_rel.columns]
            got = rows_key(got_rel.fetchall(), got_cols)
            exp_rel = con.sql(sql)
            exp_cols = [c.lower() for c in exp_rel.columns]
            exp = rows_key(exp_rel.fetchall(), exp_cols)
        except Exception as e:
            print(f"FAIL {name}: error {str(e)[:200]}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns spark={sorted(got_cols)} oracle={sorted(exp_cols)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rowcount spark={len(got)} oracle={len(exp)}")
            n_fail += 1
            continue
        # exact compare, both in declared order and as sorted multiset
        mism = [i for i, (g, e) in enumerate(zip(got, exp)) if g != e]
        if mism and sorted(map(repr, got)) != sorted(map(repr, exp)):
            i = mism[0]
            print(f"FAIL {name}: {len(mism)} mismatched rows; first at {i}:")
            print(f"  spark : {got[i]}")
            print(f"  oracle: {exp[i]}")
            n_fail += 1
        elif mism:
            print(f"WARN {name}: rows equal as multiset but ordering differs "
                  f"({len(mism)} positions)")
            n_pass += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
