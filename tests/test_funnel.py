"""Funnel / conversion operator (stages/funnel.py) vs DuckDB nested
min-filter joins, tie and negative-order edges, validation."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from opentelemetry_collector_ray.stages.funnel import funnel


def _canon(df):
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns),
                          kind="mergesort").reset_index(drop=True)


def test_funnel_matches_duckdb(ray_session):
    rng = np.random.default_rng(9)
    n = 30000
    tbl = pa.table({
        "u": pa.array(rng.integers(0, 800, n)),
        "ts": pa.array(rng.integers(0, 2000, n).astype("datetime64[us]")),
        "e": pa.array(rng.choice(["view", "click", "purchase", "error"],
                                 n, p=[.5, .3, .1, .1])),
    })
    out = funnel(ray.data.from_arrow(tbl).repartition(7), "u", "ts", "e",
                 ["view", "click", "purchase"], n_buckets=8).to_pandas()
    exp = duckdb.sql("""
WITH s1 AS (SELECT u, min(ts) AS ts_1 FROM tbl WHERE e='view' GROUP BY u),
s2 AS (SELECT t.u, min(t.ts) AS ts_2 FROM tbl t JOIN s1 USING (u)
       WHERE t.e='click' AND t.ts >= s1.ts_1 GROUP BY t.u),
s3 AS (SELECT t.u, min(t.ts) AS ts_3 FROM tbl t JOIN s2 USING (u)
       WHERE t.e='purchase' AND t.ts >= s2.ts_2 GROUP BY t.u)
SELECT k.u, s1.ts_1, s2.ts_2, s3.ts_3,
  CAST(CASE WHEN s3.u IS NOT NULL THEN 3 WHEN s2.u IS NOT NULL THEN 2
       WHEN s1.u IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
      AS steps_completed
FROM (SELECT DISTINCT u FROM tbl) k
LEFT JOIN s1 USING (u) LEFT JOIN s2 USING (u) LEFT JOIN s3 USING (u)
""").df()
    pd.testing.assert_frame_equal(_canon(out), _canon(exp),
                                  check_dtype=False, check_exact=True)


def test_funnel_ties_and_negative_order(ray_session):
    """Ties share a timestamp across steps (>= semantics) and negative
    integer order values must not collide with any sentinel."""
    tbl = pa.table({"u": pa.array([1, 1, 1, 2, 2, 3]),
                    "o": pa.array([-10, -5, -1, -3, -3, 7], pa.int64()),
                    "e": pa.array(["a", "b", "c", "a", "b", "b"])})
    out = funnel(ray.data.from_arrow(tbl), "u", "o", "e",
                 ["a", "b"]).to_pandas().sort_values("u")
    assert out["ts_1"].tolist()[:2] == [-10, -3]
    assert out["ts_2"].tolist()[:2] == [-5, -3]
    assert out["steps_completed"].tolist() == [2, 2, 0]
    assert pd.isna(out["ts_1"].iloc[2]) and pd.isna(out["ts_2"].iloc[2])


def test_funnel_out_of_order_steps_dont_count(ray_session):
    """A purchase BEFORE the first view must not complete the funnel."""
    tbl = pa.table({"u": [1, 1], "o": pa.array([1, 2], pa.int64()),
                    "e": ["purchase", "view"]})
    out = funnel(ray.data.from_arrow(tbl), "u", "o", "e",
                 ["view", "purchase"]).to_pandas()
    assert out["steps_completed"].tolist() == [1]
    assert out["ts_1"].tolist() == [2] and pd.isna(out["ts_2"].iloc[0])


def test_funnel_validation(ray_session):
    ds = ray.data.from_arrow(pa.table(
        {"u": ["a"], "o": [1], "e": ["x"], "f": [1.5]}))
    with pytest.raises(ValueError, match="at least one step"):
        funnel(ds, "u", "o", "e", [])
    with pytest.raises(ValueError, match="distinct"):
        funnel(ds, "u", "o", "e", ["x", "x"])
    with pytest.raises(ValueError, match="collides"):
        funnel(ds, "u", "o", "e", ["x"], completed_name="u")
    with pytest.raises(Exception, match="integer or timestamp"):
        funnel(ds, "u", "f", "e", ["x"]).to_pandas()
    withnull = pa.table({"u": ["a"], "o": pa.array([None], pa.int64()),
                         "e": ["x"]})
    with pytest.raises(Exception, match="has nulls"):
        funnel(ray.data.from_arrow(withnull), "u", "o", "e",
               ["x"]).to_pandas()
