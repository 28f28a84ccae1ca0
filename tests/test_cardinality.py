"""Cardinality limiter (stages/cardinality.py) — the OTel SDK metrics
cardinality-limit semantic: top-k series kept per group, everything
else folded into one overflow series."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

import ray
import ray.data

from opentelemetry_collector_ray.stages.cardinality import cardinality_cap


def _ds(rows):
    return ray.data.from_arrow(pa.Table.from_pylist(rows))


def _result(ds):
    return ds.to_pandas().sort_values(
        ["g", "s"]).reset_index(drop=True)


def test_basic_cap_with_overflow(ray_session):
    rows = ([{"g": "a", "s": i % 4, "v": 10} for i in range(8)]
            + [{"g": "a", "s": 9, "v": 1}]          # the smallest series
            + [{"g": "b", "s": 1, "v": 5}])          # under-k group
    out = _result(cardinality_cap(
        _ds(rows), "g", "s", 2, overflow_value=-1,
        count_name="n", sum_cols={"sv": "v"}))
    # group a: series 0..3 have n=2 each (ties -> s ASC kept: 0,1);
    # overflow = series 2,3 (n=2 each) + series 9 (n=1) -> n=5, sv=41
    a = out[out.g == "a"]
    assert list(a.s) == [-1, 0, 1]
    assert list(a.n) == [5, 2, 2]
    assert list(a.sv) == [41, 20, 20]
    # group b has 1 series <= k: no overflow row at all
    b = out[out.g == "b"]
    assert list(b.s) == [1] and list(b.n) == [1] and list(b.sv) == [5]


def test_tie_break_is_series_ascending(ray_session):
    rows = [{"g": "m", "s": s, "v": 0} for s in (30, 10, 20)]
    out = _result(cardinality_cap(_ds(rows), "g", "s", 2,
                                  overflow_value=-1))
    # all counts tie at 1: kept = two smallest series values
    assert list(out.s) == [-1, 10, 20]
    assert list(out.n) == [1, 1, 1]


def test_string_series_and_overflow_value(ray_session):
    rows = [{"g": 1, "s": w, "v": 0}
            for w in ("x", "x", "y", "z", "w")]
    out = cardinality_cap(_ds(rows), "g", "s", 1,
                          overflow_value="__overflow__").to_pandas()
    out = out.sort_values("s").reset_index(drop=True)
    assert list(out.s) == ["__overflow__", "x"]
    assert list(out.n) == [3, 2]


def test_overflow_collision_raises(ray_session):
    rows = [{"g": 1, "s": -1, "v": 0}, {"g": 1, "s": 2, "v": 0}]
    with pytest.raises(Exception, match="collides"):
        cardinality_cap(_ds(rows), "g", "s", 1,
                        overflow_value=-1).materialize()


def test_null_series_raises(ray_session):
    rows = [{"g": 1, "s": None, "v": 0}, {"g": 1, "s": 2, "v": 0}]
    with pytest.raises(Exception, match="nulls"):
        cardinality_cap(_ds(rows), "g", "s", 1,
                        overflow_value=-1).materialize()


def test_k_validation():
    with pytest.raises(ValueError, match="k must be"):
        cardinality_cap(None, "g", "s", 0, overflow_value=-1)


def test_yaml_builder_parity(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from opentelemetry_collector_ray.config import PipelineConfig
    from opentelemetry_collector_ray.pipelines.builder import build_dataset

    rows = [{"g": "a", "s": i % 3, "v": i} for i in range(9)]
    p = tmp_path / "c.parquet"
    pq.write_table(pa.Table.from_pylist(rows), str(p))
    y = build_dataset(PipelineConfig.from_dict({
        "receivers": {"parquet": {"paths": str(p)}},
        "processors": {"cardinality_cap": {
            "group": "g", "series": "s", "k": 2, "overflow_value": -1,
            "sum_cols": {"sv": "v"}}},
        "exporters": {"debug": {}},
        "service": {"pipelines": {"logs": {
            "receivers": ["parquet"], "processors": ["cardinality_cap"],
            "exporters": ["debug"]}}},
    })).to_pandas().sort_values("s").reset_index(drop=True)
    want = cardinality_cap(
        ray.data.read_parquet(str(p)), "g", "s", 2, overflow_value=-1,
        sum_cols={"sv": "v"}).to_pandas() \
        .sort_values("s").reset_index(drop=True)
    pd.testing.assert_frame_equal(y, want, check_dtype=False)


def test_yaml_missing_required(tmp_path):
    import pyarrow.parquet as pq

    from opentelemetry_collector_ray.config import (
        ConfigError, PipelineConfig)
    from opentelemetry_collector_ray.pipelines.builder import build_dataset

    p = tmp_path / "x.parquet"
    pq.write_table(pa.table({"g": [1], "s": [2]}), str(p))
    with pytest.raises(ConfigError, match="overflow_value"):
        build_dataset(PipelineConfig.from_dict({
            "receivers": {"parquet": {"paths": str(p)}},
            "processors": {"cardinality_cap": {"group": "g",
                                               "series": "s"}},
            "exporters": {"debug": {}},
            "service": {"pipelines": {"logs": {
                "receivers": ["parquet"],
                "processors": ["cardinality_cap"],
                "exporters": ["debug"]}}},
        }))
