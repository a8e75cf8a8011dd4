"""Driver-contract parity: every queries() entry with an oracle must
match DuckDB on sf0.001 (row count, column names, order-insensitive
values) — the same check the driver runs at sf0.01."""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from resume_parser_service_spark.operators.catalog import TABLES  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(not os.path.exists(SF_DIR),
                                reason="driver testdata not present")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
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


_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(spark, duck, name):
    sdf = _QUERIES[name](spark, SF_DIR).toPandas()
    if name not in _ORACLES:
        assert len(sdf) > 0  # rows-only contract
        return
    odf = duck.execute(_ORACLES[name]).df()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf)
    pd.testing.assert_frame_equal(_normalize(sdf), _normalize(odf),
                                  check_dtype=False, check_exact=False,
                                  rtol=1e-6, atol=1e-6)


def test_entry_smoke(spark):
    edf = entrymod.entry(spark).toPandas()
    assert len(edf) > 0
    assert int(edf["n_byte_identical"].sum()) == int(edf["n_docs"].sum())
