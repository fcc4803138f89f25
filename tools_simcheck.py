"""Quick driver-sim over a subset of registry keys (or all with no args).

Usage: python tools_simcheck.py [key ...]
       python tools_simcheck.py --backlog   # every never-driver-certified key
Mirrors the driver's canonicalization: sorted columns, repr-sorted rows,
9dp float rounding, list->tuple, date->Timestamp.

``--backlog`` derives the set of registered keys with no green driver
CORRECTNESS row in any round (the same rule the entry module uses to
order the driver sample) and checks exactly those — the seal ritual runs
it so a red can never reach a driver round un-pre-verified.
"""
import datetime
import sys

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

import __spark_entry__ as e

SF = "/root/testdata/sf0.01"


def norm(v):
    if isinstance(v, (list, np.ndarray)):
        return tuple(norm(x) for x in v)
    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        return pd.Timestamp(v)
    if isinstance(v, float):
        return round(v, 9)
    return v


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1).map(norm)
    key = df.map(repr)
    order = key.sort_values(by=list(key.columns)).index
    return df.loc[order].reset_index(drop=True)


def main():
    spark = SparkSession.builder.master("local[8]").getOrCreate()
    qs, osql = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    if sys.argv[1:] == ["--backlog"]:
        keys = sorted(set(qs) - e._certified())
        if not keys:
            print("backlog empty: every registered key has a green "
                  "driver CORRECTNESS row")
            sys.exit(0)
        print(f"backlog: {len(keys)} never-certified keys")
    else:
        keys = sys.argv[1:] or sorted(qs)
    bad = 0
    for name in keys:
        try:
            sp = qs[name](spark, SF).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error {type(ex).__name__}: {ex}")
            bad += 1
            continue
        if name not in osql:
            print(f"ok   {name} rows-only: {len(sp)}")
            continue
        try:
            du = con.execute(osql[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error {ex}")
            bad += 1
            continue
        if len(sp) != len(du):
            print(f"FAIL {name}: rows {len(sp)} vs {len(du)}")
            bad += 1
            continue
        a, b = canon(sp), canon(du)
        if sorted(a.columns) != sorted(b.columns):
            print(f"FAIL {name}: cols {sorted(a.columns)} vs {sorted(b.columns)}")
            bad += 1
            continue
        if a.map(repr).values.tolist() != b.map(repr).values.tolist():
            neq = (a.map(repr) != b.map(repr)).any(axis=1)
            print(f"FAIL {name}: {int(neq.sum())} mismatched rows, first:")
            print(a[neq].head(3))
            print(b[neq].head(3))
            bad += 1
            continue
        print(f"ok   {name} ({len(sp)} rows)")
    print(f"done: {len(keys) - bad}/{len(keys)} ok")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
