#!/usr/bin/env python3
"""Local self-gate: compare Verify parquet output against DuckDB oracle SQL.

Mirrors the driver's CORRECTNESS gate: per query, rows / schema(col names) /
value-hash match with columns sorted by name and rows sorted by all columns.

Usage: local_verify.py <sfDir> <verifyOutDir> [query,query,...]
"""
import json, sys, hashlib
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    try:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    except Exception:
        pass

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def h(df: pd.DataFrame) -> str:
    # row-wise repr hash; floats via repr (bit-identical expectation)
    m = hashlib.sha256()
    for row in df.itertuples(index=False):
        m.update(("|".join(repr(v) for v in row)).encode())
    return m.hexdigest()

results = {}
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    try:
        spark_df = pq.read_table(f"{out_dir}/{name}").to_pandas()
    except Exception as e:
        results[name] = {"err": f"spark read: {e}"}
        continue
    try:
        ora_df = con.execute(sql).df()
    except Exception as e:
        results[name] = {"err": f"oracle: {e}"}
        continue
    s, o = canon(spark_df), canon(ora_df)
    # normalize integer dtypes across engines before hashing
    for df in (s, o):
        for c in df.columns:
            if pd.api.types.is_integer_dtype(df[c]):
                df[c] = df[c].astype("int64")
            elif pd.api.types.is_bool_dtype(df[c]):
                df[c] = df[c].astype(bool)
    results[name] = {
        "rows": [len(s), len(o)],
        "schema_match": list(s.columns) == list(o.columns),
        "hash_match": len(s) == len(o) and list(s.columns) == list(o.columns)
                      and h(s) == h(o),
    }
    if not results[name]["hash_match"] and len(s) == len(o) and list(s.columns) == list(o.columns):
        # find first differing cell for debugging
        for c in s.columns:
            if not s[c].equals(o[c]):
                diff = s[c] != o[c]
                i = diff[diff].index[0] if diff.any() else None
                if i is not None:
                    results[name]["first_diff"] = {
                        "col": c, "row": int(i),
                        "spark": repr(s[c][i]), "oracle": repr(o[c][i])}
                break

print(json.dumps(results, indent=1))
bad = [n for n, r in results.items() if not r.get("hash_match")]
sys.exit(1 if bad else 0)
