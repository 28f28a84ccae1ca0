"""union_by_name + snapshot_diff (stages/snapshot.py): planted truth,
null-safe change detection, type-conflict guard."""

from __future__ import annotations

import pyarrow as pa
import pytest

import ray.data

from opentelemetry_collector_ray.stages.snapshot import (
    snapshot_diff, union_by_name)


def test_union_by_name_fills_missing(ray_session):
    a = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "x": pa.array(["p", "q"])}))
    b = ray.data.from_arrow(pa.table({
        "id": pa.array([3], pa.int64()),
        "y": pa.array([7], pa.int64())}))
    df = union_by_name([a, b]).to_pandas().sort_values(
        "id").reset_index(drop=True)
    assert list(df.columns) == ["id", "x", "y"]
    assert df["x"].tolist() == ["p", "q", None]
    assert df["y"].fillna(-1).tolist() == [-1, -1, 7]


def test_union_by_name_type_conflict(ray_session):
    a = ray.data.from_arrow(pa.table({"x": pa.array([1], pa.int64())}))
    b = ray.data.from_arrow(pa.table({"x": pa.array(["s"])}))
    with pytest.raises(TypeError, match="conflicting"):
        union_by_name([a, b])


def test_snapshot_diff_planted(ray_session):
    old = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "v": pa.array([10, 20, None, 40], pa.int64())}))
    new = ray.data.from_arrow(pa.table({
        "id": pa.array([2, 3, 4, 5], pa.int64()),
        "v": pa.array([21, None, 40, 50], pa.int64())}))
    df = snapshot_diff(old, new, "id", ["v"]).to_pandas()
    st = dict(zip(df["id"], df["change"]))
    # 1 removed; 2 changed (20->21); 3 unchanged (null==null) absent;
    # 4 unchanged absent; 5 added
    assert st == {1: "removed", 2: "changed", 5: "added"}
    full = snapshot_diff(old, new, "id", ["v"],
                         include_unchanged=True).to_pandas()
    stf = dict(zip(full["id"], full["change"]))
    assert stf[3] == "unchanged" and stf[4] == "unchanged"
    # null -> value counts as a change
    new2 = ray.data.from_arrow(pa.table({
        "id": pa.array([3], pa.int64()),
        "v": pa.array([99], pa.int64())}))
    old2 = ray.data.from_arrow(pa.table({
        "id": pa.array([3], pa.int64()),
        "v": pa.array([None], pa.int64())}))
    d2 = snapshot_diff(old2, new2, "id", ["v"]).to_pandas()
    assert d2["change"].tolist() == ["changed"]
    with pytest.raises(ValueError, match="compare_cols"):
        snapshot_diff(old, new, "id", [])
