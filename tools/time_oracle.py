#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB at a given sf dir (the bench's 2x bar).

Usage: python3 tools/time_oracle.py <sfDir> <oracleSqlJson> [reps [query ...]]
Prints per-query seconds (min over reps) and the total. With query names,
only those oracles run (the scaled-bench subset path).
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def loadavg():
    try:
        with open("/proc/loadavg") as f:
            return " ".join(f.read().split()[:3])
    except OSError:
        return ""


def calibrate(con):
    """Fixed pure-CPU probe (never edited across rounds): host-speed
    normalizer for cross-round oracle totals, mirroring graft.Bench's
    range200M probe on the Spark side."""
    t0 = time.monotonic()
    con.sql("SELECT sum(i % 97) FROM range(200000000) t(i)").fetchall()
    return time.monotonic() - t0


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    calibrate(con)  # untimed warm-up, mirroring graft.Bench
    load_before, cal_before = loadavg(), calibrate(con)
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_path))
    only = set(sys.argv[4:])
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    times = {}
    for name in sorted(oracle):
        best = None
        for _ in range(reps):
            t0 = time.monotonic()
            try:
                con.sql(oracle[name]).fetchall()
            except Exception as e:
                print(f"{name}: ERROR {e}")
                break
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
            # progress to stderr (stdout stays the parseable summary):
            # on a host with multi-minute hypervisor stalls, a silent
            # 40-minute run is indistinguishable from a hang
            print(f"[oracle] {name} rep {dt:.2f}s", file=sys.stderr, flush=True)
        if best is not None:
            times[name] = best
    cal_after, load_after = calibrate(con), loadavg()
    for name, dt in sorted(times.items(), key=lambda kv: -kv[1]):
        print(f"{dt:8.3f}  {name}")
    print(f"TOTAL {sum(times.values()):.2f}s over {len(times)} queries")
    print(f"CALIBRATION probe=range200M_sum_mod97 "
          f"before={cal_before:.3f}s after={cal_after:.3f}s "
          f"loadavg_before='{load_before}' loadavg_after='{load_after}'")


if __name__ == "__main__":
    main()
