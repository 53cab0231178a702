#!/usr/bin/env python3
"""Replicate the driver's correctness gate locally: for each query output in
<outDir> (written by `sbt "runMain graft.Verify <sfDir> <outDir>"`), run the
matching oracle SQL from oracle_sql.json in DuckDB over the sfDir parquet
tables and compare row/schema/values (columns sorted by name, rows sorted)."""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.round(9)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif s.dtype == object:
            df[c] = s.astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracles:
            results[name] = f"ROWS_ONLY({len(got)})" + ("" if len(got) > 0 else " EMPTY!")
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        g, w = normalize(got.copy()), normalize(want.copy())
        if list(g.columns) != list(w.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(g.columns)} duck={list(w.columns)}"
        elif len(g) != len(w):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(g)} duck={len(w)}"
        elif not g.equals(w):
            diff = (g != w) & ~(g.isna() & w.isna())
            bad = diff.any(axis=1)
            i = bad.idxmax() if bad.any() else None
            results[name] = (f"VALUE_MISMATCH rows={int(bad.sum())} first@{i} "
                             f"spark={g.loc[i].to_dict() if i is not None else ''} "
                             f"duck={w.loc[i].to_dict() if i is not None else ''}")
        else:
            results[name] = f"OK({len(g)})"
    width = max(len(k) for k in results)
    fails = 0
    for k in sorted(results):
        ok = results[k].startswith("OK") or results[k].startswith("ROWS_ONLY(") and "EMPTY" not in results[k]
        if not ok:
            fails += 1
        print(f"{'PASS' if ok else 'FAIL'}  {k:<{width}}  {results[k]}")
    missing = set(oracles) - {os.path.basename(q.rstrip('/')) for q in glob.glob(f'{out_dir}/*/')}
    for m in sorted(missing):
        fails += 1
        print(f"FAIL  {m:<{width}}  ORACLE_WITHOUT_OUTPUT")
    print(f"\n{len(results) - fails}/{len(results)} pass")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
