#!/usr/bin/env python3
"""Mimic of the hypothesized driver t2 compare: the Spark parquet side is
read with decimal scale preserved (python Decimal -> str keeps trailing
zeros) while the DuckDB oracle side goes through a float64 dataframe
(shortest repr). A query whose Spark output has a DECIMAL column with any
trailing-zero value at its scale will therefore hash-mismatch even when
the values are numerically identical.

Usage: tools/check_driver_mimic.py [sfdir] [verify_outdir]
"""
import glob
import json
import math
import sys

import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)
    return str(v)


def canon(df):
    df = df[sorted(df.columns)]
    cells = getattr(df, "map", getattr(df, "applymap", None))(cell)
    rows = sorted(tuple(r) for r in cells.itertuples(index=False, name=None))
    return rows


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    failures = []
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out}/{name}/*.parquet")
        spark_df = pq.ParquetDataset(files).read().to_pandas()  # Decimal preserved
        duck_df = con.sql(sql).df()                             # decimals -> float64
        s, d = canon(spark_df), canon(duck_df)
        if s != d:
            failures.append(name)
            diffs = [(a, b) for a, b in zip(s, d) if a != b][:2]
            print(f"MISMATCH {name}: rows {len(s)} vs {len(d)}; first diffs: {diffs}")
    print(f"\n{len(oracle) - len(failures)}/{len(oracle)} match; failures: {failures}")


if __name__ == "__main__":
    main()
