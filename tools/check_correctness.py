#!/usr/bin/env python3
"""Local pre-check of SparkEntry.queries vs DuckDB oracles.

Mimics a strict driver compare:
  - Spark side is read with pyarrow (NOT duckdb) so engine-reader type
    differences surface exactly as they do for the driver;
  - values are compared by canonical STRING form (the driver hashes
    stringified values — Decimal('1.20') vs 1.2 must FAIL here);
  - any terminal DECIMAL or DATE column is flagged as a contract violation
    (CORRECTNESS_r02 proved those are hash-unstable across readers; the
    authoring contract is: output only string/int/bigint/double/bool/
    timestamp columns).

Usage: check_correctness.py SFDIR OUTDIR
"""
import datetime
import glob
import json
import math
import os
import sys

import duckdb
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import duck_env

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

BANNED_TYPES = ("decimal", "date32")

# Oracle-side mirror of BANNED_TYPES: duckdb result column types the
# driver's pandas comparator can't hash stably. HUGEINT (uncast sum())
# coerces to float64 -> "3000.0" vs Spark's "3000" (r6 p07); DECIMAL and
# DATE are the r2/r5 classes on the oracle side. The local fetchall()
# path returns Python ints for HUGEINT so value-compare alone can't
# catch it — the dtype itself must be linted.
ORACLE_BANNED_TYPES = ("HUGEINT", "DECIMAL", "DATE")


def canon(v):
    """Canonical string form of a value for cross-engine comparison."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # shortest round-trip: bit-exact doubles agree
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return f"{type(v).__name__}:{v}"


def main(sfdir, outdir):
    con = duckdb.connect()
    # bounded memory + disk spill: an oracle that outgrows RAM must slow
    # down or fail with a DuckDB OOM error, never get SIGKILLed by the
    # host (which also loses buffered OK lines for already-checked keys).
    # The limit tracks MemAvailable and the spill dir is per-process —
    # see duck_env.py.
    duck_env.configure(con)
    for t in TABLES:
        # driver testdata ships single-file tables; Spark-written corpora
        # (e.g. graft.ScaleData output) are part-file DIRECTORIES
        path = f"{sfdir}/{t}.parquet"
        src = f"'{path}/*.parquet'" if os.path.isdir(path) else f"'{path}'"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        # partial dumps (SPARK_GRAFT_ONLY) leave most keys without an
        # output dir — don't burn oracle time on queries that were never
        # dumped (the full-dump path checks everything as before)
        if not os.path.isdir(f"{outdir}/{name}"):
            print(f"SKIP  {name:24s} (not dumped)", flush=True)
            continue
        try:
            exp = con.sql(sql)
            exp_cols = exp.columns
            oracle_banned = [
                f"{c}:{t}" for c, t in zip(exp.columns, exp.types)
                if any(b in str(t).upper() for b in ORACLE_BANNED_TYPES)]
            exp_rows = exp.fetchall()
            files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
            tbl = pq.read_table(files)
            got_cols = tbl.column_names
            banned = [f"{f.name}:{f.type}" for f in tbl.schema
                      if any(b in str(f.type) for b in BANNED_TYPES)]
            got_rows = [tuple(r[c] for c in got_cols) for r in tbl.to_pylist()]
            eidx = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
            gidx = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
            cols_match = sorted(exp_cols) == sorted(got_cols)
            e = sorted(tuple(canon(r[i]) for i in eidx) for r in exp_rows)
            g = sorted(tuple(canon(r[i]) for i in gidx) for r in got_rows)
            rows_match = len(e) == len(g)
            vals_match = e == g
            status = ("OK" if cols_match and vals_match and not banned
                      and not oracle_banned else "FAIL")
            detail = ""
            if banned:
                detail = f"BANNED output types: {banned}"
            elif oracle_banned:
                detail = f"BANNED oracle result types: {oracle_banned}"
            elif not cols_match:
                detail = f"cols exp={sorted(exp_cols)} got={sorted(got_cols)}"
            elif not rows_match:
                detail = f"rowcount exp={len(e)} got={len(g)}"
            elif not vals_match:
                for i, (a, b) in enumerate(zip(e, g)):
                    if a != b:
                        detail = f"first diff row {i}: exp={a} got={b}"
                        break
            results[name] = (status, len(g), detail)
        except Exception as ex:
            results[name] = ("ERROR", 0, str(ex)[:300])
    ok = sum(1 for s, _, _ in results.values() if s == "OK")
    for name, (status, n, detail) in sorted(results.items()):
        print(f"{status:5s} {name:24s} rows={n:<7d} {detail[:220]}", flush=True)
    print(f"== {ok}/{len(results)} oracle-checked queries match ==")
    return 0 if ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
