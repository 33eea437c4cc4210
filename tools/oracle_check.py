#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run DuckDB oracle SQL
against the sf tables and compare to the Verify.scala parquet dumps
(columns sorted by name, rows sorted, exact value compare with float report).

Usage: oracle_check.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm_df(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    results = {}
    for name, sql in sorted(oracles.items()):
        try:
            expected = con.execute(sql).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE-ERROR: {e}"
            continue
        try:
            actual = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            results[name] = f"SPARK-MISSING: {e}"
            continue
        e, a = norm_df(expected), norm_df(actual)
        if list(e.columns) != list(a.columns):
            results[name] = f"SCHEMA: oracle={list(e.columns)} spark={list(a.columns)}"
            continue
        if len(e) != len(a):
            results[name] = f"ROWS: oracle={len(e)} spark={len(a)}"
            continue
        mismatch = None
        for c in e.columns:
            ev, av = e[c], a[c]
            if ev.dtype.kind == 'f' or av.dtype.kind == 'f':
                ev = ev.astype(float); av = av.astype(float)
                bad = ~((ev == av) | (ev.isna() & av.isna()))
                if bad.any():
                    i = bad.idxmax()
                    mismatch = f"VALUE col={c} row={i} oracle={ev[i]!r} spark={av[i]!r} diff={abs(ev[i]-av[i])}"
                    break
            else:
                evs = ev.astype(str); avs = av.astype(str)
                bad = ~(evs == avs)
                if bad.any():
                    i = bad.idxmax()
                    mismatch = f"VALUE col={c} row={i} oracle={ev[i]!r} spark={av[i]!r}"
                    break
        results[name] = mismatch or "OK"
    n_ok = sum(1 for v in results.values() if v == "OK")
    for name, v in sorted(results.items()):
        print(f"{'PASS' if v=='OK' else 'FAIL'} {name}: {v}")
    print(f"\n{n_ok}/{len(results)} oracled queries match")
    return 0 if n_ok == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
