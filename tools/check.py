#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfdir> <outdir>
  1. (caller ran) sbt "runMain graft.Verify <sfdir> <outdir>"
  2. registers every parquet table in <sfdir> as a DuckDB view
  3. runs each oracle_sql.json query, compares with the Spark parquet
     result: row count, column names (sorted), and per-value hash with
     columns sorted by name (mirrors the driver contract in the prompt).
"""
import glob
import json
import math
import os
import sys

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_localize(None)
            except TypeError:
                pass
            s = s.astype("datetime64[us]")
        out[c] = s
    return pd.DataFrame(out)


def cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_hash(df: pd.DataFrame):
    import hashlib
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(("|".join(cell(v) for v in row) + "\n").encode())
    return h.hexdigest()


def main(sfdir, outdir):
    con = duckdb.connect()
    for f in glob.glob(f"{sfdir}/*.parquet"):
        name = os.path.basename(f)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")

    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(outdir)):
        d = os.path.join(outdir, name)
        if not os.path.isdir(d):
            continue
        spark_df = pd.read_parquet(d)
        if name not in oracles:
            results[name] = f"ROWS_ONLY rows={len(spark_df)}" + (
                " EMPTY!" if len(spark_df) == 0 else "")
            continue
        try:
            oracle_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE_ERROR {str(e)[:200]}"
            continue
        a, b = canon(spark_df), canon(oracle_df)
        if list(a.columns) != list(b.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(a.columns)} oracle={list(b.columns)}"
        elif len(a) != len(b):
            results[name] = f"ROWCOUNT spark={len(a)} oracle={len(b)}"
        elif table_hash(a) != table_hash(b):
            diff = None
            for i in range(min(len(a), 2000000)):
                ra = [cell(v) for v in a.iloc[i]]
                rb = [cell(v) for v in b.iloc[i]]
                if ra != rb:
                    diff = f" first_diff_row={i} spark={ra} oracle={rb}"
                    break
            results[name] = f"HASH_MISMATCH rows={len(a)}{diff or ''}"
        else:
            results[name] = f"OK rows={len(a)}" + (" EMPTY!" if len(a) == 0 else "")

    npass = sum(1 for v in results.values() if v.startswith("OK"))
    for k, v in results.items():
        print(f"{'PASS' if v.startswith('OK') else 'FAIL' if not v.startswith('ROWS_ONLY') else 'ROWS'}  {k}: {v}")
    print(f"\n{npass}/{len([r for r in results.values() if not r.startswith('ROWS_ONLY')])} oracle-checked pass; "
          f"{len(results)} total")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
