"""cohort_retention (stages/cohort.py): planted matrix, period guard,
YAML parity."""

from __future__ import annotations

import pyarrow as pa
import pytest

import ray.data

from opentelemetry_collector_ray.stages.cohort import cohort_retention

DAY = 86_400_000_000


def _ev(rows):
    return ray.data.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] * DAY for r in rows],
                       pa.timestamp("us"))})).repartition(3)


def test_cohort_planted(ray_session):
    # u1 joins day 0, active days 0,1,3 (two events day 0 dedup);
    # u2 joins day 1, active days 1,2; u3 joins day 3 only
    ds = _ev([(1, 0), (1, 0), (1, 1), (1, 3),
              (2, 1), (2, 2), (3, 3)])
    out = cohort_retention(ds, period="day").to_pandas()
    cells = {(int(r.cohort_day) // DAY, int(r.offset)): int(r.n_users)
             for r in out.itertuples()}
    assert cells == {(0, 0): 1, (0, 1): 1, (0, 3): 1,
                     (1, 0): 1, (1, 1): 1, (3, 0): 1}
    with pytest.raises(ValueError, match="period"):
        cohort_retention(ds, period="month")


def test_cohort_yaml(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from opentelemetry_collector_ray.config import PipelineConfig
    from opentelemetry_collector_ray.pipelines.builder import build_dataset

    p = tmp_path / "e.parquet"
    pq.write_table(pa.table({
        "user_id": pa.array([1, 1, 2], pa.int64()),
        "ts": pa.array([0, DAY, 0], pa.timestamp("us"))}), str(p))
    y = build_dataset(PipelineConfig.from_dict({
        "receivers": {"parquet": {"paths": str(p)}},
        "processors": {"cohort": {"period": "day"}},
        "exporters": {"debug": {}},
        "service": {"pipelines": {"logs": {
            "receivers": ["parquet"], "processors": ["cohort"],
            "exporters": ["debug"]}}},
    })).to_pandas()
    direct = cohort_retention(ray.data.read_parquet(str(p)),
                              period="day").to_pandas()
    assert sorted(map(tuple, y.values.tolist())) == \
        sorted(map(tuple, direct.values.tolist()))
