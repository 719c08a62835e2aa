"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() twin on DuckDB over the same parquet, compare
row count, column names, and order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif s.dtype == object:
            df[c] = s.astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    issues = []
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        issues.append(f"columns: {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}")
        return issues
    if len(spark_pdf) != len(oracle_pdf):
        issues.append(f"rows: {len(spark_pdf)} vs {len(oracle_pdf)}")
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            if pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(bv):
                ok = np.allclose(av.fillna(0), bv.fillna(0), rtol=1e-9, atol=1e-9) and (
                    av.isna() == bv.isna()
                ).all()
            else:
                ok = (av.fillna("<null>").astype(str) == bv.fillna("<null>").astype(str)).all()
            if not ok:
                bad = (av.astype(str) != bv.astype(str)).to_numpy().nonzero()[0][:3]
                issues.append(
                    f"col {c} mismatch, e.g. rows {bad.tolist()}: "
                    f"{[av.iloc[i] for i in bad]} vs {[bv.iloc[i] for i in bad]}"
                )
    return issues


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from datastream_deltalake_connector_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="oracle-check", cores=8, shuffle_partitions=8, driver_memory="8g")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(spark_pdf)} rows ({time.time()-t0:.1f}s, no oracle)")
            continue
        try:
            oracle_pdf = con.execute(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            n_fail += 1
            continue
        issues = compare(name, spark_pdf, oracle_pdf)
        if issues:
            n_fail += 1
            print(f"FAIL  {name}: " + "; ".join(issues))
        else:
            print(f"OK    {name}: {len(spark_pdf)} rows ({time.time()-t0:.1f}s)")
    print(f"\n{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
