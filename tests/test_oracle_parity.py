"""Driver-style gate rehearsal: run every queries() entry at sf0.001 and
compare against its oracle_sql() via DuckDB — row count, column names and
order-insensitive values (the same comparison the driver makes at sf0.01)."""

import math

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entrymod

import os

SF = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def to_pandas(res):
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(9)
        else:
            try:
                df[c] = df[c].astype("int64")
            except (TypeError, ValueError):
                df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


SQL_KEYS = sorted(entrymod.oracle_sql().keys())


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", SQL_KEYS)
def test_query_matches_oracle(con, name):
    q = entrymod.queries()[name]
    got = canon(to_pandas(q(SF)))
    expect = canon(con.execute(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(expect.columns), (
        f"{name}: columns {list(got.columns)} vs {list(expect.columns)}")
    assert len(got) == len(expect), f"{name}: {len(got)} vs {len(expect)} rows"
    pd.testing.assert_frame_equal(got, expect, check_dtype=False,
                                  check_exact=False, rtol=0, atol=1e-8)


@pytest.mark.usefixtures("ray_session")
def test_entry_smoke():
    res = entrymod.entry()
    df = to_pandas(res)
    assert len(df) > 0
    assert {"z", "x", "y", "png", "checksum"} <= set(df.columns)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", sorted(set(entrymod.queries()) - set(SQL_KEYS)))
def test_rows_only_queries_run(name):
    res = entrymod.queries()[name](SF)
    df = to_pandas(res)
    assert len(df) >= 0
    assert len(df.columns) > 0
