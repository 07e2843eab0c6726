#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify at a
scale factor, then replay each oracle SQL in DuckDB over the same parquet
tables and compare (columns sorted by name, rows sorted, values compared).

Hash-strict: both sides are read through Arrow, decimal columns must agree
on precision AND scale (the driver's hash is type-inclusive — Spark
decimal(28,2) vs DuckDB decimal(38,2) fails it even when values match),
and non-float values are compared by exact string rendering.

Usage: python3 tools/check.py [sfdir] [--skip-verify] [query ...]
"""
import json, math, subprocess, sys
from pathlib import Path

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIR = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else "/root/testdata/sf0.01"
OUT = "/tmp/verify_out"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
only = [a for a in sys.argv[2:] if not a.startswith("-")]

if "--skip-verify" not in sys.argv:
    r = subprocess.run(
        ["sbt", "--batch", f'runMain graft.Verify {SF_DIR} {OUT}'],
        cwd="/root/repo", capture_output=True, text=True)
    tail = "\n".join((r.stdout + r.stderr).splitlines()[-25:])
    if r.returncode != 0:
        print(tail); sys.exit(1)
    if "[verify]" in r.stdout + r.stderr:  # per-query failures
        print("\n".join(l for l in (r.stdout + r.stderr).splitlines() if "[verify]" in l))

con = duckdb.connect()
for t in TABLES:
    p = f"{SF_DIR}/{t}.parquet"
    if Path(p).exists():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracles = json.loads(Path(f"{OUT}/oracle_sql.json").read_text())
spark_dirs = {p.name for p in Path(OUT).iterdir() if p.is_dir()}

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns), ignore_index=True) if len(df.columns) else df

def decimal_types(tbl: pa.Table) -> dict:
    return {f.name: str(f.type) for f in tbl.schema
            if pa.types.is_decimal(f.type)}

fails = 0
names = [n for n in sorted(spark_dirs) if not only or n in only]
for name in names:
    try:
        st = pq.read_table(f"{OUT}/{name}")
        sdf = st.to_pandas()
    except Exception as e:
        print(f"FAIL {name}: spark output unreadable: {e}"); fails += 1; continue
    if name not in oracles:
        status = "rows-only" if len(sdf) > 0 else "rows-only EMPTY(!)"
        print(f"  ok  {name}: {status} ({len(sdf)} rows)")
        if len(sdf) == 0: fails += 1
        continue
    try:
        ot = con.execute(oracles[name]).arrow()
        odf = ot.to_pandas()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}"); fails += 1; continue
    sdec, odec = decimal_types(st), decimal_types(ot)
    if sdec != odec:
        print(f"FAIL {name}: decimal types spark={sdec} oracle={odec}"); fails += 1; continue
    s, o = canon(sdf), canon(odf)
    if list(s.columns) != list(o.columns):
        print(f"FAIL {name}: columns spark={list(s.columns)} oracle={list(o.columns)}"); fails += 1; continue
    if len(s) != len(o):
        print(f"FAIL {name}: rows spark={len(s)} oracle={len(o)}"); fails += 1; continue
    bad = None
    for c in s.columns:
        sv, ov = s[c], o[c]
        if sv.dtype.kind == "f" and ov.dtype.kind == "f":
            # genuine doubles on both sides: bit-equality (NaN == NaN)
            eq = [(math.isnan(a) and math.isnan(b)) or a == b
                  for a, b in zip(sv.astype(float), ov.astype(float))]
        else:
            # everything else (ints, strings, Decimal objects): exact rendering
            eq = (sv.astype(str) == ov.astype(str)).tolist()
        if not all(eq):
            i = eq.index(False)
            bad = f"col {c} row {i}: spark={sv.iloc[i]!r} oracle={ov.iloc[i]!r}"
            break
    if bad:
        print(f"FAIL {name}: {bad}"); fails += 1
    else:
        print(f"  ok  {name}: {len(s)} rows match")

missing = [n for n in oracles if n not in spark_dirs]
for n in missing:
    print(f"FAIL {n}: oracle declared but no spark output"); fails += 1
print(f"\n{len(names) - fails}/{len(names)} pass" + (f", {fails} FAIL" if fails else ""))
sys.exit(1 if fails else 0)
