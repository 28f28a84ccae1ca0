"""Multi-level ROLLUP / GROUPING SETS aggregation (stages/rollup.py)
vs DuckDB GROUP BY ROLLUP / CUBE and validation edges."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from opentelemetry_collector_ray.stages.rollup import rollup_agg


def _canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype("string")
    return df.sort_values(list(df.columns),
                          kind="mergesort").reset_index(drop=True)


def _make(n=20000, seed=3):
    rng = np.random.default_rng(seed)
    return pa.table({
        "a": pa.array(rng.choice(["x", "y", "z"], n)),
        "b": pa.array(rng.integers(0, 5, n)),
        "v": pa.array(rng.integers(-50, 50, n).astype(np.int64)),
    })


def test_rollup_matches_duckdb(ray_session):
    tbl = _make()
    out = rollup_agg(ray.data.from_arrow(tbl).repartition(6), ["a", "b"],
                     count_name="n", sum_cols={"sv": "v"},
                     min_cols={"mn": "v"},
                     max_cols={"mx": "v"}).to_pandas()
    exp = duckdb.sql("""
        SELECT a, b, CAST(count(*) AS BIGINT) n, CAST(sum(v) AS BIGINT) sv,
               min(v) mn, max(v) mx,
               CAST(grouping(a, b) AS BIGINT) AS "grouping_id"
        FROM tbl GROUP BY ROLLUP(a, b)""").df()
    pd.testing.assert_frame_equal(_canon(out), _canon(exp),
                                  check_dtype=False)
    # every ROLLUP level present
    assert sorted(out["grouping_id"].unique()) == [0, 1, 3]


def test_cube_via_explicit_sets(ray_session):
    tbl = _make(8000, seed=5)
    out = rollup_agg(ray.data.from_arrow(tbl).repartition(4), ["a", "b"],
                     count_name="n",
                     sets=[(0, 1), (0,), (1,), ()]).to_pandas()
    exp = duckdb.sql("""
        SELECT a, b, CAST(count(*) AS BIGINT) n,
               CAST(grouping(a, b) AS BIGINT) AS "grouping_id"
        FROM tbl GROUP BY CUBE(a, b)""").df()
    pd.testing.assert_frame_equal(_canon(out), _canon(exp),
                                  check_dtype=False)


def test_rollup_validation(ray_session):
    ds = ray.data.from_arrow(pa.table({"a": ["p"], "v": [1]}))
    with pytest.raises(ValueError, match="at least one key"):
        rollup_agg(ds, [], count_name="n")
    with pytest.raises(ValueError, match="no aggregates"):
        rollup_agg(ds, ["a"])
    with pytest.raises(ValueError, match="bad grouping set"):
        rollup_agg(ds, ["a"], count_name="n", sets=[(0, 7)])
    with pytest.raises(ValueError, match="duplicate grouping set"):
        rollup_agg(ds, ["a"], count_name="n", sets=[(0,), (0,)])
    with pytest.raises(ValueError, match="sets must be non-empty"):
        rollup_agg(ds, ["a"], count_name="n", sets=[])
    with pytest.raises(ValueError, match="collides"):
        rollup_agg(ds, ["a"], count_name="grouping_id")


def test_rollup_empty_input_documented_shape(ray_session):
    """Documented SQL deviation: empty input → zero rows (Ray never
    calls map UDFs on an empty dataset), while ANSI yields one
    grand-total row."""
    empty = pa.table({"a": pa.array([], pa.string()),
                      "v": pa.array([], pa.int64())})
    out = rollup_agg(ray.data.from_arrow(empty), ["a"],
                     count_name="n")
    assert out.count() == 0
