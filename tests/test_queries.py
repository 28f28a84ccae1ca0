"""Driver-gate mirror: run every queries() entry at sf0.001 and compare it
against oracle_sql() via DuckDB (row count + order-insensitive values),
the same shape as CORRECTNESS_r{N}.json."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype("string")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


SQL_KEYS = sorted(entrymod.oracle_sql().keys())
ALL_KEYS = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", SQL_KEYS)
def test_query_matches_oracle(ray_session, name):
    ray_df = _canon(_to_pandas(entrymod.queries()[name](SF_DIR)))
    con = _duck(SF_DIR)
    sql_df = _canon(con.sql(entrymod.oracle_sql()[name]).df())
    assert list(ray_df.columns) == list(sql_df.columns), \
        f"{name}: columns {list(ray_df.columns)} != {list(sql_df.columns)}"
    assert len(ray_df) == len(sql_df), f"{name}: rows {len(ray_df)} != {len(sql_df)}"
    pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False,
                                  check_exact=True, obj=name)


@pytest.mark.parametrize("name", sorted(set(ALL_KEYS) - set(SQL_KEYS)))
def test_rows_only_queries_run(ray_session, name):
    df = _to_pandas(entrymod.queries()[name](SF_DIR))
    assert df is not None and len(df.columns) > 0


def test_entry_runs(ray_session):
    res = _to_pandas(entrymod.entry())
    assert len(res) > 0
    assert set(res.columns) == {"route", "role", "tool", "bucket", "n_turns"}


def test_oracle_checked_queries_first():
    """Driver-gate ordering invariant: the driver checks queries in
    iteration order with a cap, so every oracle-checked entry must
    precede every rows-only entry."""
    q_names = list(entrymod.queries())
    oracle_names = set(entrymod.oracle_sql())
    assert oracle_names <= set(q_names)
    head = q_names[:len(oracle_names)]
    assert set(head) == oracle_names, (
        "oracle-checked queries must come first in queries()")
