#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

Registers each parquet fixture as a DuckDB view, runs every oracle SQL
from <verifyOutDir>/oracle_sql.json, and compares against the engine's
parquet dump: column names (sorted), row counts, and canonicalized
values. Floats are compared with rel tolerance 1e-9 as a diagnostic and
exactly (bit-identical after float64 cast) as the strict criterion.
"""
import json, sys, math
import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

sf, vout = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{vout}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        want = con.sql(sql).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle error: {e}")); continue
    try:
        import glob
        files = glob.glob(f"{vout}/{name}/*.parquet")
        got = pq.ParquetDataset(files).read().to_pandas()
    except Exception as e:
        fails.append((name, f"engine output missing: {e}")); continue
    # driver sorts columns by name
    want = want[sorted(want.columns)]
    got = got[sorted(got.columns)] if set(got.columns)==set(want.columns) else got
    # Spark parquet timestamps read back tz-aware (isAdjustedToUTC);
    # DuckDB's fetchdf returns naive UTC — normalize both to naive so
    # the str() compare matches the driver's canonicalizer
    for df in (want, got):
        for c in df.columns:
            if str(df[c].dtype).startswith("datetime64") and getattr(
                    df[c].dt, "tz", None) is not None:
                df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
    if list(got.columns) != list(want.columns):
        fails.append((name, f"columns: engine={list(got.columns)} oracle={list(want.columns)}")); continue
    if len(got) != len(want):
        fails.append((name, f"rows: engine={len(got)} oracle={len(want)}")); continue
    mism = []
    for c in want.columns:
        wv, gv = want[c].tolist(), got[c].tolist()
        for i, (w, g) in enumerate(zip(wv, gv)):
            if w is None and g is None: continue
            if isinstance(w, float) and isinstance(g, float):
                if math.isnan(w) and math.isnan(g): continue
                if w != g:
                    mism.append(f"{c}[{i}]: {g!r} != {w!r} (diff {abs(w-g):.3e})")
            elif str(w) != str(g):
                mism.append(f"{c}[{i}]: {g!r} != {w!r}")
            if len(mism) >= 3: break
        if len(mism) >= 3: break
    if mism:
        fails.append((name, "; ".join(mism)))
print(f"{len(oracle)-len(fails)}/{len(oracle)} oracle queries match")
for n, m in fails:
    print(f"FAIL {n}: {m}")
unchecked = [p.split('/')[-1] for p in __import__('glob').glob(f"{vout}/*")
             if p.split('/')[-1] not in oracle and not p.endswith('.json')]
for u in sorted(unchecked):
    try:
        import glob as g
        n = pq.ParquetDataset(g.glob(f"{vout}/{u}/*.parquet")).read().num_rows
        print(f"UNCHECKED {u}: {n} rows")
    except Exception as e:
        print(f"UNCHECKED {u}: unreadable ({e})")
sys.exit(1 if fails else 0)
