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


# --------------------------------------------------- hopping windows


def test_hopping_window_matches_duckdb(ray_session):
    from opentelemetry_collector_ray.stages.resample import (
        hopping_window_agg)

    rng = np.random.default_rng(5)
    n = 6000
    tbl = pa.table({
        "ts": pa.array(rng.integers(0, 7 * 86400, n).astype("int64")
                       * 1_000_000).cast(pa.timestamp("us")),
        "kind": pa.array(rng.choice(["a", "b", "c"], n)),
        "cents": pa.array(rng.integers(0, 500, n).astype(np.int64)),
    })
    HOUR = 3_600_000_000
    out = hopping_window_agg(
        ray.data.from_arrow(tbl).repartition(5), "ts",
        size_us=HOUR, slide_us=HOUR // 4, keys=["kind"],
        count_name="n", sum_cols={"cents": "cents"}).to_pandas()
    exp = duckdb.sql("""
        WITH e AS (SELECT kind, cents,
                          (epoch_us(ts) // 900000000) * 900000000 AS w0
                   FROM tbl),
        x AS (SELECT kind, cents, w0 - r.i * 900000000 AS ws
              FROM e CROSS JOIN range(4) AS r(i))
        SELECT make_timestamp(ws) AS window_start, kind,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS cents
        FROM x GROUP BY 1, 2""").df()
    pd.testing.assert_frame_equal(_canon(out), _canon(exp),
                                  check_dtype=False, check_exact=True)
    # every row lands in exactly size/slide windows
    assert int(out["n"].sum()) == 4 * n


def test_hopping_window_negative_ts_floors(ray_session):
    """Pre-epoch timestamps must floor toward -inf (not truncate)."""
    from opentelemetry_collector_ray.stages.resample import (
        hopping_window_agg)

    tbl = pa.table({"ts": pa.array([-1, -10, 5, 14], pa.int64())})
    out = hopping_window_agg(
        ray.data.from_arrow(tbl), "ts", size_us=20, slide_us=10,
        count_name="n").to_pandas().sort_values("window_start")
    # ts=-1,-10 -> w0=-10 (windows -10,-20); ts=5 -> 0,-10; ts=14 -> 10,0
    got = dict(zip(out["window_start"], out["n"]))
    assert got == {-20: 2, -10: 3, 0: 2, 10: 1}


def test_hopping_window_validation(ray_session):
    from opentelemetry_collector_ray.stages.resample import (
        hopping_window_agg)

    ds = ray.data.from_arrow(pa.table({"ts": pa.array([1], pa.int64())}))
    with pytest.raises(ValueError, match="positive"):
        hopping_window_agg(ds, "ts", size_us=0, slide_us=1)
    with pytest.raises(ValueError, match="multiple"):
        hopping_window_agg(ds, "ts", size_us=25, slide_us=10)
    with pytest.raises(ValueError, match="max_windows_per_row"):
        hopping_window_agg(ds, "ts", size_us=10_000, slide_us=1,
                           max_windows_per_row=100)
    with pytest.raises(Exception, match="null"):
        hopping_window_agg(
            ray.data.from_arrow(pa.table(
                {"ts": pa.array([1, None], pa.int64())})),
            "ts", size_us=10, slide_us=10).materialize()


def test_lagged_xcorr_parts_planted(ray_session):
    """Planted shifted series: b = a shifted by +2 buckets; the lag=2
    stats equal the lag-0 stats of the unshifted pair; numpy reference
    parity on every lane; guards."""
    import ray.data

    from opentelemetry_collector_ray.stages.resample import (
        lagged_xcorr_parts)

    rng = np.random.default_rng(6)
    span = 40
    a_counts = rng.integers(0, 5, span)
    rows_b, rows_g = [], []
    for t, c in enumerate(a_counts):
        rows_b += [t] * int(c) + [t + 2] * int(c)
        rows_g += ["a"] * int(c) + ["b"] * int(c)
    t = pa.table({"b": pa.array(rows_b, pa.int64()),
                  "g": pa.array(rows_g)})
    out = lagged_xcorr_parts(
        ray.data.from_arrow(t).repartition(3), "b", "g", "a", "b",
        lags=(0, 2)).to_pandas().set_index("lag")
    # dense arrays over union span [0, span+1]
    A = np.zeros(span + 2, np.int64)
    B = np.zeros(span + 2, np.int64)
    A[:span] = a_counts
    B[2:span + 2] = a_counts
    for k in (0, 2):
        x = A[:len(A) - k]
        y = B[k:]
        r = out.loc[k]
        assert r["n"] == len(x)
        assert r["sx"] == x.sum() and r["sy"] == y.sum()
        assert r["sxy"] == (x * y).sum()
        assert r["sxx"] == (x * x).sum() and r["syy"] == (y * y).sum()
    # perfect alignment at lag 2: sxy == sxx restricted to the overlap
    assert out.loc[2, "sxy"] == (a_counts * a_counts).sum()

    with pytest.raises(ValueError, match="differ"):
        lagged_xcorr_parts(ray.data.from_arrow(t), "b", "g", "a", "a")
    with pytest.raises(ValueError, match="lags"):
        lagged_xcorr_parts(ray.data.from_arrow(t), "b", "g", "a", "b",
                           lags=())
    with pytest.raises(Exception, match="no rows"):
        lagged_xcorr_parts(ray.data.from_arrow(t), "b", "g", "zz",
                           "ww").to_pandas()


def test_lag_xcorr_yaml_parity(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data

    from opentelemetry_collector_ray.config import PipelineConfig
    from opentelemetry_collector_ray.pipelines.builder import build_dataset
    from opentelemetry_collector_ray.stages.resample import (
        lagged_xcorr_parts)

    rng = np.random.default_rng(2)
    t = pa.table({"b": pa.array(rng.integers(0, 20, 300), pa.int64()),
                  "g": pa.array(rng.choice(["a", "b"], 300))})
    p = tmp_path / "x.parquet"
    pq.write_table(t, str(p))
    y = build_dataset(PipelineConfig.from_dict({
        "receivers": {"parquet": {"paths": str(p)}},
        "processors": {"lag_xcorr": {
            "bucket_col": "b", "group_col": "g", "group_a": "a",
            "group_b": "b", "lags": [-1, 0, 1]}},
        "exporters": {"debug": {}},
        "service": {"pipelines": {"logs": {
            "receivers": ["parquet"], "processors": ["lag_xcorr"],
            "exporters": ["debug"]}}},
    })).to_pandas()
    d = lagged_xcorr_parts(ray.data.read_parquet(str(p)), "b", "g",
                           "a", "b", lags=(-1, 0, 1)).to_pandas()
    assert y.equals(d)


def _ri(rows, every, **kw):
    import pyarrow as pa

    import ray.data

    from opentelemetry_collector_ray.stages.resample import (
        resample_interp)

    ds = ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(2)
    return resample_interp(ds, "k", "t", "v", every, **kw).to_pandas() \
        .sort_values(["k", "grid_ts"]).reset_index(drop=True)


def test_resample_interp_planted(ray_session):
    rows = [{"k": "a", "t": t, "v": v}
            for t, v in [(0, 0), (10, 100), (30, 50)]]
    out = _ri(rows, 5)
    # grid 0,5,10,...,30; linear 0->100 over [0,10], 100->50 over [10,30]
    assert out.grid_ts.tolist() == [0, 5, 10, 15, 20, 25, 30]
    # 15: 100 + (50-100)*5//20 = 100 + trunc(-12.5) = 100 - 12 = 88
    assert out.v_interp.tolist() == [0, 50, 100, 88, 75, 63, 50]


def test_resample_interp_truncates_toward_zero(ray_session):
    # pv=10 -> nv=0 over den=3, grid at +1: num=-10 -> trunc = -3
    # (Python floor would give -4 and silently diverge from SQL //)
    rows = [{"k": "a", "t": 0, "v": 10}, {"k": "a", "t": 3, "v": 0}]
    out = _ri(rows, 1)
    assert out.v_interp.tolist() == [10, 7, 4, 0]


def test_resample_interp_leading_drop_and_alignment(ray_session):
    # first obs at t=7, every=5: grid starts at 10 (5 < 7 has no left
    # neighbor), ends at 12's last grid point 10
    rows = [{"k": "a", "t": 7, "v": 0}, {"k": "a", "t": 12, "v": 100}]
    out = _ri(rows, 5)
    assert out.grid_ts.tolist() == [10]
    assert out.v_interp.tolist() == [60]


def test_resample_interp_guards(ray_session):
    import pytest

    rows = [{"k": "a", "t": 1, "v": 5}, {"k": "a", "t": 1, "v": 6}]
    with pytest.raises(Exception, match="duplicate timestamps"):
        _ri(rows, 5)
    with pytest.raises(Exception, match="max_points_per_key"):
        _ri([{"k": "a", "t": 0, "v": 0},
             {"k": "a", "t": 10_000, "v": 1}], 1,
            max_points_per_key=100)


def test_resample_interp_guards_gap_not_grid_step(ray_session):
    # the multiply is dv * (grid - pt) with grid - pt bounded by the
    # OBSERVATION GAP, not `every`: dv=2^40 over a 2^23-us gap wraps
    # int64 even at every=1 — the old every-based guard missed this
    import pytest

    rows = [{"k": "a", "t": 0, "v": 0},
            {"k": "a", "t": 2 ** 23, "v": 2 ** 40}]
    with pytest.raises(Exception, match="observation gap"):
        _ri(rows, 2 ** 21, max_points_per_key=10)
    # same dv over a small gap is fine (dv * gap fits comfortably)
    ok = _ri([{"k": "a", "t": 0, "v": 0},
              {"k": "a", "t": 4, "v": 2 ** 40}], 2)
    assert ok.v_interp.tolist() == [0, 2 ** 39, 2 ** 40]
