"""Pareto skyline (stages/skyline.py): brute-force dominance parity on
adversarial tie-heavy data, duplicate survival, null exclusion."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from opentelemetry_collector_ray.stages.skyline import skyline_2d


def _brute(x, y):
    keep = []
    for i in range(len(x)):
        dom = False
        for j in range(len(x)):
            if i == j:
                continue
            if (x[j] >= x[i] and y[j] >= y[i]
                    and (x[j] > x[i] or y[j] > y[i])):
                dom = True
                break
        if not dom:
            keep.append(i)
    return sorted(zip(np.asarray(x)[keep].tolist(),
                      np.asarray(y)[keep].tolist()))


def _run(x, y, nparts=7):
    t = pa.table({"x": pa.array(x, pa.int64()),
                  "y": pa.array(y, pa.int64()),
                  "rid": pa.array(range(len(x)), pa.int64())})
    out = skyline_2d(lambda: ray.data.from_arrow(t).repartition(nparts),
                     "x", "y").to_pandas()
    return sorted(zip(out["x"].tolist(), out["y"].tolist()))


def test_skyline_matches_bruteforce_tie_heavy(ray_session):
    rng = np.random.default_rng(17)
    # tiny domains force equal-x runs to span sort partitions
    x = rng.integers(0, 6, 400)
    y = rng.integers(0, 6, 400)
    assert _run(x, y) == _brute(x, y)


def test_skyline_matches_bruteforce_wide_domain(ray_session):
    rng = np.random.default_rng(23)
    x = rng.integers(0, 10**6, 300)
    y = rng.integers(0, 10**6, 300)
    assert _run(x, y) == _brute(x, y)


def test_skyline_duplicates_all_survive(ray_session):
    # two identical maximal points: neither dominates the other
    x = [5, 5, 1, 3]
    y = [7, 7, 9, 3]
    got = _run(x, y, nparts=3)
    assert got == [(1, 9), (5, 7), (5, 7)]


def test_skyline_null_objectives_excluded(ray_session):
    t = pa.table({"x": pa.array([1, None, 3], pa.int64()),
                  "y": pa.array([5, 9, None], pa.int64())})
    out = skyline_2d(lambda: ray.data.from_arrow(t), "x", "y").to_pandas()
    assert out[["x", "y"]].values.tolist() == [[1, 5]]


def test_skyline_int64_beyond_float53_exact(ray_session):
    big = 2**60
    # y values differ by 1 at 2^60 — a float roundtrip would collapse
    # them and wrongly drop the second point
    x = [1, 2]
    y = [big + 1, big]
    got = _run(x, y, nparts=2)
    assert got == [(1, big + 1), (2, big)]


def test_skyline_yaml_parity(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from opentelemetry_collector_ray.config import PipelineConfig
    from opentelemetry_collector_ray.pipelines.builder import build_dataset

    rng = np.random.default_rng(9)
    tbl = pa.table({"x": pa.array(rng.integers(0, 20, 200), pa.int64()),
                    "y": pa.array(rng.integers(0, 20, 200), pa.int64())})
    p = tmp_path / "t.parquet"
    pq.write_table(tbl, str(p))
    y = build_dataset(PipelineConfig.from_dict({
        "receivers": {"parquet": {"paths": str(p)}},
        "processors": {"skyline": {"x_col": "x", "y_col": "y"}},
        "exporters": {"debug": {}},
        "service": {"pipelines": {"logs": {
            "receivers": ["parquet"], "processors": ["skyline"],
            "exporters": ["debug"]}}},
    })).to_pandas()
    d = skyline_2d(lambda: ray.data.read_parquet(str(p)),
                   "x", "y").to_pandas()
    assert sorted(map(tuple, y.values.tolist())) == \
        sorted(map(tuple, d.values.tolist()))
