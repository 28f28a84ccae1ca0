"""Time-series resample / gap-fill (stages/resample.py) vs DuckDB
generate_series + ASOF LEFT JOIN, and validation edges."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from opentelemetry_collector_ray.stages.resample import resample_asof

DAY = 86_400_000_000


def _canon(df):
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns),
                          kind="mergesort").reset_index(drop=True)


def test_resample_matches_duckdb(ray_session):
    rng = np.random.default_rng(21)
    n = 8000
    tbl = pa.table({
        "u": pa.array(rng.integers(0, 60, n)),
        "ts": pa.array(rng.integers(0, 90 * 86400, n).astype("int64")
                       * 1_000_000).cast(pa.timestamp("us")),
        "cents": pa.array(rng.integers(0, 10000, n).astype(np.int64)),
    })
    out = resample_asof(
        lambda: ray.data.from_arrow(tbl).repartition(5),
        "u", "ts", DAY, ["cents"]).to_pandas()
    exp = duckdb.sql("""
        WITH b AS (SELECT u, date_trunc('day', min(ts)) AS lo,
                          max(ts) AS hi FROM tbl GROUP BY u),
        g AS (SELECT u, unnest(generate_series(lo, hi, INTERVAL 1 DAY))
                     AS grid_ts FROM b)
        SELECT g.u, g.grid_ts, e.cents
        FROM g ASOF LEFT JOIN tbl e
          ON g.u = e.u AND g.grid_ts >= e.ts""").df()
    pd.testing.assert_frame_equal(_canon(out), _canon(exp),
                                  check_dtype=False, check_exact=True)
    # exactly one leading null grid point per key
    assert int(out["cents"].isna().sum()) == 60


def test_resample_ns_timestamps_normalized(ray_session):
    """Review finding: a timestamp[ns] input must produce the same
    DAILY grid as the us input — every_us is microseconds for every
    temporal unit, not the column's native unit."""
    ts_us = pa.array([0, 2 * 86_400_000_000 + 5], pa.int64())
    tbl_us = pa.table({"u": [1, 1], "ts": ts_us.cast(pa.timestamp("us")),
                       "v": [10, 20]})
    tbl_ns = pa.table({"u": [1, 1],
                       "ts": pc_cast_ns(ts_us), "v": [10, 20]})
    out_us = resample_asof(lambda: ray.data.from_arrow(tbl_us),
                           "u", "ts", DAY, ["v"]).to_pandas()
    out_ns = resample_asof(lambda: ray.data.from_arrow(tbl_ns),
                           "u", "ts", DAY, ["v"]).to_pandas()
    assert len(out_us) == len(out_ns) == 3  # days 0, 1, 2 — not 2001
    pd.testing.assert_frame_equal(
        out_us.sort_values("grid_ts").reset_index(drop=True),
        out_ns.sort_values("grid_ts").reset_index(drop=True),
        check_dtype=False)


def pc_cast_ns(arr_us):
    import pyarrow.compute as pc

    return pc.multiply(arr_us, 1000).cast(pa.timestamp("ns"))


def test_resample_single_point_key_and_validation(ray_session):
    tbl = pa.table({"u": [7], "ts": pa.array(
        [1_500_000], pa.int64()).cast(pa.timestamp("us")),
        "v": [42]})
    mk = lambda: ray.data.from_arrow(tbl)
    out = resample_asof(mk, "u", "ts", DAY, ["v"]).to_pandas()
    assert len(out) == 1  # one grid point at the day floor, null value
    assert pd.isna(out["v"].iloc[0])

    with pytest.raises(ValueError, match="positive"):
        resample_asof(mk, "u", "ts", 0, ["v"])
    with pytest.raises(ValueError, match="non-empty"):
        resample_asof(mk, "u", "ts", DAY, [])
    with pytest.raises(ValueError, match="collides"):
        resample_asof(mk, "u", "ts", DAY, ["v"], grid_name="u")
    with pytest.raises(ValueError, match="not in input schema"):
        resample_asof(mk, "u", "bogus", DAY, ["v"])
    wide = pa.table({"u": [1, 1], "ts": pa.array(
        [0, 1_000_000], pa.int64()).cast(pa.timestamp("us")),
        "v": [1, 2]})
    with pytest.raises(Exception, match="grid points"):
        resample_asof(lambda: ray.data.from_arrow(wide), "u", "ts", 1,
                      ["v"], max_points_per_key=10).to_pandas()
    withnull = pa.table({"u": [1], "ts": pa.array(
        [None], pa.timestamp("us")), "v": [1]})
    with pytest.raises(Exception, match="has nulls"):
        resample_asof(lambda: ray.data.from_arrow(withnull),
                      "u", "ts", DAY, ["v"]).to_pandas()
