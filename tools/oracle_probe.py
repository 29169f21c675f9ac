#!/usr/bin/env python3
"""Time (and optionally run) individual DuckDB oracles against a corpus dir.

Usage: oracle_probe.py SFDIR ORACLE_JSON KEY [KEY...] [--threads N] [--limit-only]

Prints per-key wall seconds + row count. Used for the 10x/100x-corpus
oracle feasibility probes (the heavy-tail keys whose DuckDB forms are
the bottleneck, not the engine).
"""
import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import duck_env

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    threads = 8
    for a in sys.argv[1:]:
        if a.startswith("--threads="):
            threads = int(a.split("=")[1])
    sfdir, oracle_json = args[0], args[1]
    keys = args[2:]
    con = duckdb.connect()
    con.sql(f"SET threads TO {threads}")
    # RAM-derived limit + per-process spill dir (round-15 advice)
    duck_env.configure(con)
    for t in TABLES:
        path = f"{sfdir}/{t}.parquet"
        src = f"'{path}/*.parquet'" if os.path.isdir(path) else f"'{path}'"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    oracle = json.load(open(oracle_json))
    for k in keys:
        sql = oracle[k]
        t0 = time.time()
        try:
            rows = con.sql(sql).fetchall()
            print(f"{k:28s} {time.time()-t0:8.1f} s  rows={len(rows)}", flush=True)
        except Exception as e:
            print(f"{k:28s} {time.time()-t0:8.1f} s  ERROR {e}", flush=True)


if __name__ == "__main__":
    main()
