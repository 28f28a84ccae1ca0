"""Two-pass min-max scaling (stages/normalize.py): global + per-key,
constant groups, integer exactness, float path, max_groups guard."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from opentelemetry_collector_ray.stages.normalize import minmax_scale


def _make(tbl):
    return lambda: ray.data.from_arrow(tbl).repartition(3)


def test_minmax_per_key_integer_exact(ray_session):
    tbl = pa.table({
        "k": pa.array(["a", "a", "a", "b", "b", "c"]),
        "x": pa.array([10, 20, 30, 5, 7, 42], pa.int64())})
    out = minmax_scale(_make(tbl), "x", key="k", scale=100).to_pandas()
    out = out.sort_values(["k", "x"]).reset_index(drop=True)
    # a: span 20 → 0,50,100; b: span 2 → 0,100; c: constant → 0
    assert out["x_scaled"].tolist() == [0, 50, 100, 0, 100, 0]
    assert out["x_scaled"].dtype == np.int64


def test_minmax_global(ray_session):
    tbl = pa.table({"x": pa.array([0, 5, 10], pa.int64())})
    out = minmax_scale(_make(tbl), "x", scale=1000).to_pandas()
    assert sorted(out["x_scaled"]) == [0, 500, 1000]


def test_minmax_float_path(ray_session):
    tbl = pa.table({"k": pa.array(["a"] * 3),
                    "x": pa.array([1.0, 1.5, 2.0], pa.float64())})
    out = minmax_scale(_make(tbl), "x", key="k", scale=1).to_pandas()
    assert sorted(out["x_scaled"]) == [0.0, 0.5, 1.0]
    assert out["x_scaled"].dtype == np.float64


def test_minmax_max_groups_guard(ray_session):
    tbl = pa.table({"k": pa.array([str(i) for i in range(50)]),
                    "x": pa.array(list(range(50)), pa.int64())})
    with pytest.raises(Exception, match="max_groups"):
        minmax_scale(_make(tbl), "x", key="k", max_groups=10).to_pandas()
