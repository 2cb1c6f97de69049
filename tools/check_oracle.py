#!/usr/bin/env python3
"""Local twin of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <verifyOutDir> <sfDir> [query ...]

Reads <verifyOutDir>/<name>.parquet (written by graft.Verify) and
<verifyOutDir>/oracle_sql.json, runs each oracle in DuckDB over the
parquet tables in <sfDir>, and compares row count / column names /
values (columns sorted by name, rows sorted by all columns, floats
rounded) the way the driver does.
"""
import sys, os, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings","partsupp"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # make unhashable cells (arrays/lists/dicts) sortable
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: json.dumps(v.tolist() if hasattr(v, "tolist") else v, default=str)
                              if isinstance(v, (list, dict)) or hasattr(v, "tolist") else v)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def cells_equal(a, b):
    if a is None and b is None: return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b): return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    try:
        if pd.isna(a) and pd.isna(b): return True
    except (TypeError, ValueError):
        pass
    if str(a) == str(b): return True
    try:
        fa, fb = float(a), float(b)
        return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9)
    except (TypeError, ValueError):
        return False

def compare(name, spark_df, oracle_df):
    out = {"name": name}
    out["rows_match"] = len(spark_df) == len(oracle_df)
    s_cols, o_cols = sorted(spark_df.columns), sorted(oracle_df.columns)
    out["schema_match"] = s_cols == o_cols
    if not out["rows_match"] or not out["schema_match"]:
        out["detail"] = f"rows {len(spark_df)} vs {len(oracle_df)}; cols {s_cols} vs {o_cols}"
        out["values_match"] = False
        return out
    s, o = canon(spark_df), canon(oracle_df)
    bad = None
    for c in s.columns:
        sv, ov = s[c].tolist(), o[c].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            if not cells_equal(a, b):
                bad = f"col {c} row {i}: spark={a!r} oracle={b!r}"
                break
        if bad: break
    out["values_match"] = bad is None
    if bad: out["detail"] = bad
    return out

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    results, fails = [], 0
    for name in sorted(oracles):
        if only and name not in only: continue
        pq = os.path.join(outdir, name)
        files = glob.glob(os.path.join(pq, "*.parquet")) if os.path.isdir(pq) else [pq + ".parquet"]
        if not files or not any(os.path.exists(f) for f in files):
            print(f"FAIL {name}: no spark output at {pq}"); fails += 1; continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            oracle_df = con.execute(oracles[name]).fetchdf()
            r = compare(name, spark_df, oracle_df)
        except Exception as e:
            print(f"FAIL {name}: {e}"); fails += 1; continue
        ok = r["rows_match"] and r["schema_match"] and r["values_match"]
        if ok:
            print(f"ok   {name} ({len(spark_df)} rows)")
        else:
            fails += 1
            print(f"FAIL {name}: {r.get('detail','')}")
    print(f"\n{fails} failures")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
