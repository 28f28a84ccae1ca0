"""Kaplan–Meier life-table parts (stages/survival.py): planted table,
KM product from the lanes, guards, YAML parity."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from opentelemetry_collector_ray.stages.survival import km_parts


def test_km_parts_planted(ray_session):
    # durations: 2 obs@1, 1 cens@1, 1 obs@3, 2 cens@5
    subj = pa.table({
        "dur": pa.array([1, 1, 1, 3, 5, 5]),
        "obs": pa.array([1, 1, 0, 1, 0, 0])})
    out = km_parts(ray.data.from_arrow(subj).repartition(2),
                   "dur", "obs").to_pandas()
    assert out["duration"].tolist() == [1, 3, 5]
    assert out["d"].tolist() == [2, 1, 0]
    assert out["c"].tolist() == [1, 0, 2]
    assert out["at_risk"].tolist() == [6, 3, 2]
    # KM product from the exact lanes
    s = np.cumprod(1.0 - out["d"] / out["at_risk"])
    assert s.tolist() == pytest.approx([4 / 6, 4 / 9, 4 / 9])


def test_km_parts_guards(ray_session):
    ds = ray.data.from_arrow(pa.table({"dur": [1], "obs": [2]}))
    with pytest.raises(Exception, match="0 or 1"):
        km_parts(ds, "dur", "obs").to_pandas()
    ds = ray.data.from_arrow(pa.table({"dur": [-1], "obs": [1]}))
    with pytest.raises(Exception, match="non-negative"):
        km_parts(ds, "dur", "obs").to_pandas()
    ds = ray.data.from_arrow(pa.table({"dur": [1.5], "obs": [1]}))
    with pytest.raises(Exception, match="non-negative integer"):
        km_parts(ds, "dur", "obs").to_pandas()
    ds = ray.data.from_arrow(pa.table(
        {"dur": pa.array([None], pa.int64()), "obs": [1]}))
    with pytest.raises(Exception, match="non-null"):
        km_parts(ds, "dur", "obs").to_pandas()


def test_km_yaml_parity(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from opentelemetry_collector_ray.config import PipelineConfig
    from opentelemetry_collector_ray.pipelines.builder import build_dataset

    rng = np.random.default_rng(4)
    t = pa.table({"dur": pa.array(rng.integers(0, 30, 500)),
                  "obs": pa.array(rng.integers(0, 2, 500))})
    p = tmp_path / "s.parquet"
    pq.write_table(t, str(p))
    y = build_dataset(PipelineConfig.from_dict({
        "receivers": {"parquet": {"paths": str(p)}},
        "processors": {"km": {"duration_col": "dur",
                              "observed_col": "obs"}},
        "exporters": {"debug": {}},
        "service": {"pipelines": {"logs": {
            "receivers": ["parquet"], "processors": ["km"],
            "exporters": ["debug"]}}},
    })).to_pandas()
    d = km_parts(ray.data.read_parquet(str(p)), "dur",
                 "obs").to_pandas()
    assert y.equals(d)
