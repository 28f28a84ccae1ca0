"""Arrow IPC stream source/sink (sources/arrow_ipc.py): exact
roundtrip through every wire compression, schema-evolution
union-by-name on read, empty-block skip."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from opentelemetry_collector_ray.sources.arrow_ipc import (
    read_ipc, write_ipc)


def _tbl(n=200, seed=4):
    rng = np.random.default_rng(seed)
    return pa.table({
        "id": pa.array(np.arange(n), pa.int64()),
        "v": pa.array(rng.integers(0, 100, n), pa.int64()),
        "s": pa.array(np.char.add("x", rng.integers(0, 9, n)
                                  .astype("U2")))})


@pytest.mark.parametrize("comp", ["none", "gzip", "zstd", "lz4",
                                  "snappy"])
def test_ipc_roundtrip_compressions(ray_session, tmp_path, comp):
    tbl = _tbl()
    out = str(tmp_path / comp)
    n = write_ipc(ray.data.from_arrow(tbl).repartition(4), out,
                  compression=comp)
    assert n == tbl.num_rows
    import os

    files = [f"{out}/{f}" for f in sorted(os.listdir(out))]
    assert len(files) >= 2  # block-per-file sharding
    back = read_ipc(files).to_pandas().sort_values("id") \
        .reset_index(drop=True)
    orig = tbl.to_pandas().sort_values("id").reset_index(drop=True)
    assert back.equals(orig[back.columns])


def test_ipc_schema_evolution_and_empty(ray_session, tmp_path):
    import os

    a = pa.table({"id": pa.array([1, 2], pa.int64()),
                  "x": pa.array(["a", "b"])})
    b = pa.table({"id": pa.array([3], pa.int64()),
                  "y": pa.array([9.5], pa.float64())})
    write_ipc(ray.data.from_arrow(a), str(tmp_path), "none")
    write_ipc(ray.data.from_arrow(b), str(tmp_path), "none")
    # an all-empty block writes nothing (skip path)
    write_ipc(ray.data.from_arrow(a.slice(0, 0)), str(tmp_path), "none")
    files = [str(tmp_path / f) for f in sorted(os.listdir(tmp_path))]
    assert len(files) == 2
    df = read_ipc(files).to_pandas().sort_values("id") \
        .reset_index(drop=True)
    assert list(df["id"]) == [1, 2, 3]
    # union-by-name promotion: missing columns null-fill
    assert df["x"].isna().tolist() == [False, False, True]
    assert df["y"].isna().tolist() == [True, True, False]


def test_ipc_yaml_receiver_and_sink(ray_session, tmp_path):
    """ipc receiver + ipc_sink via the YAML builder invert each other."""
    import os

    import pyarrow.parquet as pq

    from opentelemetry_collector_ray.config import PipelineConfig
    from opentelemetry_collector_ray.pipelines.builder import (
        build_dataset, run_exporters)

    tbl = _tbl(n=50, seed=8)
    src = tmp_path / "in.parquet"
    pq.write_table(tbl, str(src))

    cfg = PipelineConfig.from_dict({
        "receivers": {"parquet": {"paths": str(src)}},
        "exporters": {"ipc_sink": {"path": "wire",
                                   "compression": "zstd"}},
        "service": {"pipelines": {"logs": {
            "receivers": ["parquet"], "processors": [],
            "exporters": ["ipc_sink"]}}},
    })
    out_root = str(tmp_path / "out")
    counts = run_exporters(cfg, build_dataset(cfg), out_root)
    assert counts["ipc_sink"] == tbl.num_rows

    wire = os.path.join(out_root, "wire")
    back_cfg = PipelineConfig.from_dict({
        "receivers": {"ipc": {"paths": [
            os.path.join(wire, f) for f in sorted(os.listdir(wire))]}},
        "exporters": {"debug": {}},
        "service": {"pipelines": {"logs": {
            "receivers": ["ipc"], "processors": [],
            "exporters": ["debug"]}}},
    })
    back = build_dataset(back_cfg).to_pandas().sort_values("id") \
        .reset_index(drop=True)
    assert back.equals(tbl.to_pandas().sort_values("id")
                       .reset_index(drop=True)[back.columns])


def test_ipc_schema_pin_null_fills_per_file(ray_session, tmp_path):
    """schema= pins every block to one schema regardless of how files
    split across read tasks (review finding: promotion is per-batch)."""
    import os

    a = pa.table({"id": pa.array([1, 2], pa.int64()),
                  "x": pa.array(["a", "b"])})
    b = pa.table({"id": pa.array([3], pa.int32()),  # narrower int
                  "y": pa.array([9.5], pa.float64())})
    write_ipc(ray.data.from_arrow(a), str(tmp_path), "none")
    write_ipc(ray.data.from_arrow(b), str(tmp_path), "none")
    schema = pa.schema([("id", pa.int64()), ("x", pa.string()),
                        ("y", pa.float64())])
    files = [str(tmp_path / f) for f in sorted(os.listdir(tmp_path))]
    # force one file per read task: read each file as its own dataset
    # and union — every block must already match the pinned schema
    parts = [read_ipc([f], schema=schema) for f in files]
    ds = parts[0].union(*parts[1:])
    df = ds.to_pandas().sort_values("id").reset_index(drop=True)
    assert list(df.columns) == ["id", "x", "y"]
    assert list(df["id"]) == [1, 2, 3]
    assert df["x"].isna().tolist() == [False, False, True]
    assert df["y"].isna().tolist() == [True, True, False]
