"""Checkpoint-resume idempotence — the exporter contract-checker analog
(/root/reference/exporter/exportertest/contract_checker.go:45-110): tag
every record with its unique id (conv_id, turn_idx), kill the job partway,
rerun, and assert every id appears in exactly one sink exactly once."""

import glob

import pandas as pd
import pyarrow.parquet as pq
import pytest

from opentelemetry_collector_ray.config import PipelineConfig
from opentelemetry_collector_ray.pipelines.builder import run_pipeline
from opentelemetry_collector_ray.state.manifest import (
    ManifestStore, PartitionTask, run_resumable)
from opentelemetry_collector_ray.synth import synth_turns, write_turns_parquet


def _cfg(src):
    return PipelineConfig.from_dict({
        "receivers": {"parquet": {"paths": src}},
        "processors": {"parse": {}, "enrich": {}, "route": {}},
        "exporters": {"parquet_sink/out": {"path": "sinks"}},
        "service": {"pipelines": {"logs": {
            "receivers": ["parquet"],
            "processors": ["parse", "enrich", "route"],
            "exporters": ["parquet_sink/out"],
        }}},
    })


class Boom(RuntimeError):
    pass


def test_kill_and_resume_exactly_once(ray_session, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    write_turns_parquet(src, sf=0.05, shards=4)
    cfg = _cfg(src)

    # Crash after 2 partitions: wrap run_resumable's process fn via a killing
    # manifest-store run (mirrors a worker dying mid-job).
    from opentelemetry_collector_ray.pipelines import builder as B

    calls = {"n": 0}
    orig = B.run_exporters

    def dying(cfg_, ds, root):
        calls["n"] += 1
        if calls["n"] == 3:
            raise Boom("simulated crash mid-job")
        return orig(cfg_, ds, root)

    B.run_exporters = dying
    try:
        with pytest.raises(Boom):
            run_pipeline(cfg, out)
    finally:
        B.run_exporters = orig

    store = ManifestStore(out)
    committed_before = store.committed_ids()
    assert len(committed_before) == 2  # two committed, third died pre-commit

    # No partial output leaked into final dirs for uncommitted partitions.
    final_parts = {p.split("/")[-1].replace("part-", "")
                   for p in glob.glob(f"{out}/part-*") if not p.endswith(".staging")}
    assert final_parts == committed_before

    r = run_pipeline(cfg, out)  # resume
    assert sorted(r["skipped"]) == sorted(committed_before)
    assert len(r["ran"]) == 2

    # Exactly-once: every input (conv_id, turn_idx) appears in exactly one
    # sink exactly once.
    outs = []
    for f in glob.glob(f"{out}/part-*/**/*.parquet", recursive=True):
        if ".staging" in f:
            continue
        outs.append(pq.read_table(f, columns=["conv_id", "turn_idx"]).to_pandas())
    got = pd.concat(outs, ignore_index=True)
    expect = synth_turns(sf=0.05).select(["conv_id", "turn_idx"]).to_pandas()
    key = ["conv_id", "turn_idx"]
    got_s = got.sort_values(key).reset_index(drop=True)
    exp_s = expect.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s, exp_s)


def test_torn_manifest_is_not_committed(tmp_path):
    store = ManifestStore(str(tmp_path))
    with open(store._path("x"), "w") as f:
        f.write('{"status": "comm')  # torn write
    assert not store.is_committed("x")
    ran = run_resumable(store, [PartitionTask("x", [])],
                        lambda t, d: {"ok": 1}, "h")
    assert ran["ran"] == ["x"]
    assert store.is_committed("x", "h")
    assert not store.is_committed("x", "other-hash")


def test_bucket_level_resumable_write(ray_session, tmp_path):
    """Per-bucket atomic commit + skip: second run skips every committed
    bucket; a deleted bucket is rewritten; output stays sorted."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data
    import glob
    import os
    import shutil

    from opentelemetry_collector_ray.sinks.parquet_sink import (
        bucketed_resumable_write)

    t = pa.table({"conv_id": pa.array([f"c{i % 5}" for i in range(100)]),
                  "turn_idx": pa.array(list(range(100)), pa.int32())})
    out = str(tmp_path / "sink")
    r1 = bucketed_resumable_write(ray.data.from_arrow(t), out, n_buckets=4)
    assert r1["written"] and not r1["skipped"]
    r2 = bucketed_resumable_write(ray.data.from_arrow(t), out, n_buckets=4)
    assert not r2["written"] and sorted(r2["skipped"]) == sorted(r1["written"])
    # delete one bucket → only it is rewritten
    victim = r1["written"][0]
    shutil.rmtree(os.path.join(out, victim))
    r3 = bucketed_resumable_write(ray.data.from_arrow(t), out, n_buckets=4)
    assert r3["written"] == [victim]
    # per-bucket order holds
    for d in glob.glob(os.path.join(out, "bucket=*")):
        part = pq.read_table(os.path.join(d, "part-0.parquet")).to_pandas()
        assert part.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True) \
            .equals(part.reset_index(drop=True))
    total = sum(pq.read_table(os.path.join(d, "part-0.parquet")).num_rows
                for d in glob.glob(os.path.join(out, "bucket=*")))
    assert total == 100


def test_resumable_write_rewrites_on_changed_input(ray_session, tmp_path):
    """A committed bucket whose CONTENT changed is rewritten, not skipped:
    the _SUCCESS fingerprint cross-checks the sorted bucket bytes (stale
    outputs from a changed input/config must never be silently retained)."""
    import glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from opentelemetry_collector_ray.sinks.parquet_sink import (
        bucketed_resumable_write)

    t1 = pa.table({"conv_id": pa.array([f"c{i % 5}" for i in range(100)]),
                   "turn_idx": pa.array(list(range(100)), pa.int32())})
    out = str(tmp_path / "sink")
    r1 = bucketed_resumable_write(ray.data.from_arrow(t1), out, n_buckets=4)
    assert r1["written"] and not r1["skipped"]
    # change every c0 row's turn_idx → only buckets containing c0 rewrite
    idx = t1.column("turn_idx").to_pylist()
    conv = t1.column("conv_id").to_pylist()
    t2 = pa.table({"conv_id": t1.column("conv_id"),
                   "turn_idx": pa.array(
                       [i + 1000 if c == "c0" else i
                        for c, i in zip(conv, idx)], pa.int32())})
    r2 = bucketed_resumable_write(ray.data.from_arrow(t2), out, n_buckets=4)
    assert r2["written"]  # the changed bucket(s) rewrote
    assert set(r2["written"]) | set(r2["skipped"]) == set(r1["written"])
    rows = pa.concat_tables([
        pq.read_table(p) for p in glob.glob(os.path.join(
            out, "bucket=*", "part-0.parquet"))]).to_pandas()
    # final output reflects the NEW input everywhere
    assert sorted(rows[rows.conv_id == "c0"].turn_idx) == \
        sorted(i + 1000 for c, i in zip(conv, idx) if c == "c0")
    # unchanged buckets were skipped (not needlessly rewritten)
    assert r2["skipped"]


def test_config_staleness_partial_reload(tmp_path):
    """The batch partial-reload analog (otelcol/collector.go:290-329):
    editing ONE route rule changes only the routed output's ruleset hash
    — on the next run the routed partitions recompute while the
    aggregate output's committed manifests still skip."""
    from opentelemetry_collector_ray.config import (
        PipelineConfig, output_ruleset_hashes)
    from opentelemetry_collector_ray.state.manifest import reload_report

    def make_cfg(route_to):
        return PipelineConfig.from_dict({
            "receivers": {"parquet": {"paths": "/tmp/in"}},
            "processors": {
                "parse": {"pattern": r"(?P<k>\w+)", "column": "text"},
                "route": {"routes": [
                    {"match": {"column": "role", "equals": "user"},
                     "route": route_to}], "default_route": "other"},
            },
            "exporters": {"parquet_sink/routed": {"path": "/tmp/r"},
                          "parquet_sink/agg": {"path": "/tmp/a"}},
            "service": {"pipelines": {"logs": {
                "receivers": ["parquet"],
                "processors": ["parse", "route"],
                "exporters": ["parquet_sink/routed", "parquet_sink/agg"]}}},
        })

    # the aggregate output consumes parse but NOT the route table
    depends = {"parquet_sink/agg": ["parse"]}
    h1 = output_ruleset_hashes(make_cfg("users"), depends=depends)

    stores = {name: ManifestStore(str(tmp_path / name))
              for name in ("parquet_sink/routed", "parquet_sink/agg")}
    calls = {"parquet_sink/routed": 0, "parquet_sink/agg": 0}

    def run_all(hashes):
        for name, store in stores.items():
            def process(task, staging, _n=name):
                calls[_n] += 1
                return {"rows": 1}
            run_resumable(store, [PartitionTask("p0", ["f0"]),
                                  PartitionTask("p1", ["f1"])],
                          process, hashes[name])

    run_all(h1)
    assert calls == {"parquet_sink/routed": 2, "parquet_sink/agg": 2}

    # identical config → everything skips
    run_all(output_ruleset_hashes(make_cfg("users"), depends=depends))
    assert calls == {"parquet_sink/routed": 2, "parquet_sink/agg": 2}

    # edit ONE route rule → routed hash changes, agg hash does not
    h2 = output_ruleset_hashes(make_cfg("vip_users"), depends=depends)
    assert h2["parquet_sink/routed"] != h1["parquet_sink/routed"]
    assert h2["parquet_sink/agg"] == h1["parquet_sink/agg"]

    rep = reload_report(stores, h2)
    assert rep["parquet_sink/routed"]["stale"] == ["p0", "p1"]
    assert rep["parquet_sink/routed"]["valid"] == []
    assert rep["parquet_sink/agg"]["valid"] == ["p0", "p1"]
    assert rep["parquet_sink/agg"]["stale"] == []

    run_all(h2)  # only the routed partitions recompute
    assert calls == {"parquet_sink/routed": 4, "parquet_sink/agg": 2}

    # depends naming an unknown processor fails loudly
    with pytest.raises(Exception, match="unknown processors"):
        output_ruleset_hashes(make_cfg("users"),
                              depends={"parquet_sink/agg": ["nope"]})
