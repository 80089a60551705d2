"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and, where an ``oracle_sql()``
entry exists, the oracle SQL on DuckDB (with the sf parquet tables
registered as views), then compares rows / schema / values after
canonicalization (columns sorted by name, rows sorted by all columns).

Usage:  python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def _values_match(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    if a.shape != b.shape:
        return False
    for col in a.columns:
        va, vb = a[col], b[col]
        if va.dtype.kind == "f" or vb.dtype.kind == "f":
            import numpy as np

            ok = np.allclose(
                va.astype(float), vb.astype(float), rtol=0, atol=1e-12,
                equal_nan=True,
            )
        else:
            ok = va.astype(object).equals(vb.astype(object))
        if not ok:
            print(f"      column {col!r} differs")
            da = va[~(va.astype(object) == vb.astype(object))].head(3)
            print("      spark:", list(da))
            print("      oracle:", list(vb[da.index]) if len(da) else [])
            return False
    return True


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    n_pass = n_fail = n_noora = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"[ERR ] {name}: spark query raised")
            traceback.print_exc()
            n_fail += 1
            continue
        if name not in oracles:
            print(f"[    ] {name}: no_oracle ({len(sdf)} rows, "
                  f"{time.time()-t0:.1f}s)")
            n_noora += 1
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception:
            print(f"[ERR ] {name}: oracle SQL raised")
            traceback.print_exc()
            n_fail += 1
            continue
        a, b = _canon(sdf), _canon(odf)
        rows = len(a) == len(b)
        schema = list(a.columns) == list(b.columns)
        vals = rows and schema and _values_match(a, b)
        status = "PASS" if (rows and schema and vals) else "FAIL"
        if status == "PASS":
            n_pass += 1
        else:
            n_fail += 1
        print(
            f"[{status}] {name}: rows={len(a)}/{len(b)} schema={schema} "
            f"values={vals} ({time.time()-t0:.1f}s)"
        )
        if not schema:
            print(f"      spark cols:  {list(a.columns)}")
            print(f"      oracle cols: {list(b.columns)}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noora} no_oracle")


if __name__ == "__main__":
    main()
