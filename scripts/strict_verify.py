#!/usr/bin/env python3
"""Strict (driver-hash-like) comparator: columns sorted by name, rows sorted,
then exact string-repr equality per cell + dtype report. Finds what the
byte-exact driver hash would see differently."""
import json, sys
from pathlib import Path
import duckdb, pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/gv")
only = set(sys.argv[3:])
TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]
con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
oracle = json.loads((out/"oracle_sql.json").read_text())

def canon(df):
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].apply(lambda v: tuple(v) if isinstance(v,(list,tuple)) or str(type(v)).endswith("ndarray'>") else v)
    try:
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    except Exception:
        df = df.sort_values(by=list(df.columns), key=lambda s: s.astype(str), ignore_index=True)
    return df

names = sorted(p.name for p in out.iterdir() if p.is_dir())
for name in names:
    if only and name not in only: continue
    if name not in oracle: continue
    s = canon(pd.read_parquet(out/name))
    try:
        d = canon(con.sql(oracle[name]).df())
    except Exception as e:
        print(f"{name}: DUCK FAIL {str(e).splitlines()[0][:160]}"); continue
    probs = []
    for c in s.columns:
        if c not in d.columns: probs.append(f"col {c} missing in duck"); continue
        if str(s[c].dtype) != str(d[c].dtype):
            probs.append(f"DTYPE {c}: spark={s[c].dtype} duck={d[c].dtype}")
        a, b = s[c].astype(str), d[c].astype(str)
        neq = a != b
        if neq.any():
            i = neq.idxmax()
            probs.append(f"VAL {c}@{i}: spark={a[i]!r} duck={b[i]!r} ({neq.sum()} cells)")
    print(f"{name}: " + ("; ".join(probs) if probs else "STRICT-OK"))
