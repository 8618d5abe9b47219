#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs graft.Verify (Spark) into an outDir, then replays oracle_sql.json in
DuckDB over the same parquet tables and compares canonicalized results
(columns sorted by name, rows sorted, doubles rounded).

Usage: python3 scripts/local_verify.py [sfDir] [outDir] [--skip-spark] [name...]
"""
import json, math, subprocess, sys
from pathlib import Path

import duckdb
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == "float64" or df[c].dtype == "float32":
            df[c] = df[c].astype("float64").round(4)
        # normalize timestamp flavors (ns/us/ms, ntz) to one dtype
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                str(type(v)).endswith("ndarray'>") else v)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> str:
    s, d = canon(spark_df), canon(duck_df)
    if list(s.columns) != list(d.columns):
        return f"SCHEMA MISMATCH spark={list(s.columns)} duck={list(d.columns)}"
    if len(s) != len(d):
        return f"ROWCOUNT MISMATCH spark={len(s)} duck={len(d)}"
    for c in s.columns:
        a, b = s[c], d[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            aa = pd.to_numeric(a, errors="coerce")
            bb = pd.to_numeric(b, errors="coerce")
            bad = ~((aa.isna() & bb.isna()) |
                    (abs(aa - bb) <= 1e-6 + 1e-6 * abs(bb)))
            if bad.any():
                i = bad.idxmax()
                return f"VALUE MISMATCH col={c} row={i} spark={a[i]} duck={b[i]}"
        else:
            if not a.astype(str).equals(b.astype(str)):
                neq = a.astype(str) != b.astype(str)
                i = neq.idxmax()
                return f"VALUE MISMATCH col={c} row={i} spark={a[i]!r} duck={b[i]!r}"
    return "OK"


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out_dir = args[1] if len(args) > 1 else "/tmp/graft_verify"
    only = set(args[2:])

    if "--skip-spark" not in flags:
        subprocess.run([str(REPO / "scripts/run_class.sh"), "graft.Verify",
                        sf_dir, out_dir, *sorted(only)], check=True)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())

    results = {}
    out = Path(out_dir)
    names = sorted(p.name for p in out.iterdir() if p.is_dir())
    for name in names:
        if only and name not in only:
            continue
        try:
            spark_df = pd.read_parquet(out / name)
        except Exception as e:
            results[name] = f"SPARK READ FAIL {e}"
            continue
        if name not in oracle:
            results[name] = f"rows-only ({len(spark_df)} rows)" + \
                (" EMPTY!" if len(spark_df) == 0 else "")
            continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            results[name] = f"DUCK FAIL {str(e).splitlines()[0][:160]}"
            continue
        try:
            results[name] = compare(name, spark_df, duck_df)
        except Exception as e:
            results[name] = f"COMPARE FAIL {e}"
    missing = [] if only else [n for n in oracle if n not in names]
    width = max((len(n) for n in results), default=10)
    n_ok = sum(1 for v in results.values() if v == "OK" or v.startswith("rows-only"))
    for name, res in sorted(results.items()):
        print(f"{name:<{width}}  {res}")
    if missing:
        print("MISSING spark outputs for:", missing)
    print(f"== {n_ok}/{len(results)} pass ==")
    sys.exit(0 if n_ok == len(results) and not missing else 1)


if __name__ == "__main__":
    main()
