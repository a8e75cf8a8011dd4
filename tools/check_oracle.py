"""Driver-style correctness check: run every queries() entry on Spark
and its oracle_sql() on DuckDB over the same sf dir; compare row count,
column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

import duckdb
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: float(v) if hasattr(v, "as_tuple") else v)
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> str:
    if sorted(sdf.columns) != sorted(odf.columns):
        return f"COLS spark={sorted(sdf.columns)} duck={sorted(odf.columns)}"
    if len(sdf) != len(odf):
        return f"ROWS spark={len(sdf)} duck={len(odf)}"
    # driver-strict: the driver hashes raw materialized values, so a
    # dtype divergence (e.g. DuckDB HUGEINT -> float64 vs Spark int64)
    # flips its value hash even when every value is equal — fail here.
    for c in sorted(sdf.columns):
        sk, ok = sdf[c].dtype.kind, odf[c].dtype.kind
        if sk != ok and "O" not in (sk, ok):
            return f"DTYPE {c}: spark={sdf[c].dtype} duck={odf[c].dtype}"
    a, b = normalize(sdf), normalize(odf)
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                      check_exact=False, rtol=1e-6, atol=1e-6)
    except AssertionError as e:
        return "VALUES " + str(e).split("\n")[0][:160]
    return "OK"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from resume_parser_service_spark.operators.catalog import TABLES
    from resume_parser_service_spark.session import get_spark

    spark = get_spark(cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        # DuckDB binds views eagerly — guard missing files like the
        # Spark-side register_views does, so a custom sf dir lacking an
        # optional table still checks everything it has
        if os.path.exists(f"{sf_dir}/{t}.parquet"):
            con.execute(f"CREATE VIEW {t} AS SELECT * "
                        f"FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"{name:28s} SPARK-ERR {str(e).splitlines()[0][:140]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"{name:28s} rows-only ({len(sdf)} rows)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"{name:28s} DUCK-ERR {str(e).splitlines()[0][:140]}")
            failures += 1
            continue
        verdict = compare(name, sdf, odf)
        if verdict != "OK":
            failures += 1
        print(f"{name:28s} {verdict}")

    # entry smoke
    if not only:
        try:
            edf = entrymod.entry(spark).toPandas()
            ident = int(edf["n_byte_identical"].sum())
            total = int(edf["n_docs"].sum())
            print(f"{'entry()':28s} rows={len(edf)} "
                  f"byte_identical={ident}/{total}")
            if ident != total:
                failures += 1
        except Exception as e:
            print(f"{'entry()':28s} ERR {str(e).splitlines()[0][:140]}")
            failures += 1
    spark.stop()
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
