#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle SQL and compare exactly (rows, schema, values).

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Queries whose oracle dtype legitimately differs ACROSS families
# (documented per entry: {query: (columns...)}). Everything else is
# family-strict: int-vs-float (the r6 m4 HUGEINT bug) FAILS instead of
# being silently astype-coerced like the r6 gate did. Within-family
# representation differences (date-as-object vs datetime64, int32 vs
# int64, float32 vs float64) are canonicalized in norm() — the driver's
# value-based hash tolerates exactly those and nothing more.
DTYPE_TOLERANT = {
    # (none currently)
}

def canon(s: pd.Series) -> pd.Series:
    """Family-preserving canonical representation of one column.

    Each astype is guarded: a nullable-Int column holding pd.NA (or any
    other non-coercible value) falls back to the original series, so the
    query records a dtype-strict mismatch instead of crashing the gate.
    """
    dt = s.dtype
    if str(dt).startswith("datetime64"):
        try:
            return s.astype("datetime64[us]")
        except Exception:
            return s
    if pd.api.types.is_integer_dtype(dt):
        try:
            return s.astype("int64")
        except Exception:
            return s
    if pd.api.types.is_float_dtype(dt):
        try:
            return s.astype("float64")
        except Exception:
            return s
    if dt == object and len(s) and all(
            x is None or isinstance(x, (pd.Timestamp,) +
                tuple([__import__("datetime").date]))
            for x in s.dropna().head(100)):
        # Spark DATE reads back as python date objects; DuckDB DATE as
        # datetime64 — same family, canonicalize to datetime64[us]
        try:
            return pd.to_datetime(s).astype("datetime64[us]")
        except Exception:
            return s
    return s

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        df[c] = canon(df[c])
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            odf = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        sdf = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        s, o = norm(sdf), norm(odf)
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} oracle={list(o.columns)}")
            n_fail += 1
            continue
        if len(s) != len(o):
            print(f"FAIL {name}: rows spark={len(s)} oracle={len(o)}")
            n_fail += 1
            continue
        mism = []
        for c in s.columns:
            a, b = s[c].to_numpy(), o[c].to_numpy()
            if a.dtype != b.dtype:
                if c in DTYPE_TOLERANT.get(name, ()):
                    try:
                        b = b.astype(a.dtype)
                    except Exception:
                        mism.append((c, "dtype", str(s[c].dtype), str(o[c].dtype)))
                        continue
                else:
                    mism.append((c, "dtype-strict", str(s[c].dtype), str(o[c].dtype)))
                    continue
            eq = (pd.Series(a) == pd.Series(b)) | (pd.isna(a) & pd.isna(b))
            if not eq.all():
                i = int(np.flatnonzero(~eq.to_numpy())[0])
                mism.append((c, f"row{i}", repr(a[i]), repr(b[i])))
        if mism:
            print(f"FAIL {name}: {mism[:3]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
