#!/usr/bin/env python3
"""Dev-only parity harness: replicate the driver's DuckDB-oracle compare.

NOT part of the shipped library (the engine is pure Scala/Spark); this
mirrors the driver's correctness gate so oracle SQL can be validated
before each round. Usage:
    tools/run_main.sh graft.Verify /root/testdata/sf0.01 /tmp/vout
    python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/vout
"""
import json
import sys
import glob

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def load_spark_result(outdir, name):
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def canon(df):
    df = df[sorted(df.columns)]
    # normalize timestamp-like columns to ns for cross-engine compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[ns]")
        if str(df[c].dtype) == "float32":
            df[c] = df[c].astype("float64")
    return df.reset_index(drop=True)


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # catalog-vs-dump accounting: a thrown query writes no parquet and
    # would otherwise vanish from the report while everything still
    # reads "all pass" (round-9 failure mode)
    try:
        meta = json.load(open(f"{outdir}/verify_meta.json"))
        if meta.get("failed"):
            print(f"FAIL _meta: Verify failed queries: {meta['failed']}")
            n_fail += 1
        if meta.get("n_selected") != meta.get("n_written"):
            print(f"FAIL _meta: {meta['n_selected']} selected vs "
                  f"{meta['n_written']} written")
            n_fail += 1
    except FileNotFoundError:
        print("WARN no verify_meta.json (old Verify build?)")
    for name, sql in sorted(oracle.items()):
        got = load_spark_result(outdir, name)
        if got is None:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1
            continue
        dt_bad = [(c, str(g[c].dtype), str(e[c].dtype))
                  for c in g.columns if str(g[c].dtype) != str(e[c].dtype)]
        if dt_bad:
            print(f"FAIL {name}: dtype mismatch {dt_bad}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            n_fail += 1
            continue
        exact = g.equals(e)
        gs = g.sort_values(by=list(g.columns)).reset_index(drop=True)
        es = e.sort_values(by=list(e.columns)).reset_index(drop=True)
        sorted_eq = gs.equals(es)
        if exact:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        elif sorted_eq:
            print(f"WARN {name}: values match only after row sort (ordering differs)")
            n_fail += 1
        else:
            print(f"FAIL {name}: value mismatch")
            diff = (gs != es) & ~(gs.isna() & es.isna())
            bad_cols = [c for c in gs.columns if diff[c].any()]
            for c in bad_cols[:3]:
                i = diff[c].idxmax()
                print(f"   col {c} row {i}: spark={gs[c][i]!r} duck={es[c][i]!r}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
