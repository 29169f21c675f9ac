#!/usr/bin/env python3
"""Local pre-check of SparkEntry.queries vs DuckDB oracles.

Mimics a strict driver compare: for each query output parquet under OUTDIR,
run the oracle SQL in DuckDB (views registered over the same sf parquet
tables), sort columns by name, sort rows, and compare values exactly.

Usage: check_correctness.py SFDIR OUTDIR
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.sql(sql)
            exp_cols = exp.columns
            exp_rows = exp.fetchall()
            got = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
            got_cols = got.columns
            got_rows = got.fetchall()
            # sort columns by name
            eidx = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
            gidx = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
            cols_match = sorted(exp_cols) == sorted(got_cols)
            def sortkey(row):
                return tuple((v is None, str(type(v)), str(v)) for v in row)
            e = sorted((tuple(canon(r[i]) for i in eidx) for r in exp_rows), key=sortkey)
            g = sorted((tuple(canon(r[i]) for i in gidx) for r in got_rows), key=sortkey)
            rows_match = len(e) == len(g)
            vals_match = e == g
            status = "OK" if cols_match and vals_match else "FAIL"
            detail = ""
            if not cols_match:
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
    # queries without oracle: row-count only
    ok = sum(1 for s, _, _ in results.values() if s == "OK")
    for name, (status, n, detail) in sorted(results.items()):
        print(f"{status:5s} {name:24s} rows={n:<7d} {detail}")
    print(f"== {ok}/{len(results)} oracle-checked queries match ==")
    return 0 if ok == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
