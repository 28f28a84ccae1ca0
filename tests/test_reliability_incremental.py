"""Retry sender schedule, permanent/throttle classification, incremental
(scraper-analog) source, counter identities."""

import os

import pytest

from opentelemetry_collector_ray.sinks.reliability import (
    PermanentError, RetryConfig, ThrottleError, is_permanent, retry_call)
from opentelemetry_collector_ray.sources.incremental import IncrementalParquetSource
from opentelemetry_collector_ray.state.metrics import check_identities


def test_retry_backoff_schedule():
    sleeps = []
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 5:
            raise RuntimeError("transient")
        return "ok"

    out = retry_call(flaky, RetryConfig(), sleep=sleeps.append,
                     clock=lambda: 0.0)
    assert out == "ok"
    # reference schedule: 5, 7.5, 11.25, 16.875 (×1.5, capped at 30)
    assert sleeps == [5.0, 7.5, 11.25, 16.875]


def test_retry_cap_and_budget():
    sleeps = []
    t = {"now": 0.0}

    def clock():
        return t["now"]

    def sleep(s):
        sleeps.append(s)
        t["now"] += s

    def always_fails():
        raise RuntimeError("down")

    with pytest.raises(TimeoutError):
        retry_call(always_fails, RetryConfig(), sleep=sleep, clock=clock)
    assert max(sleeps) == 30.0  # max_interval cap
    assert sum(sleeps) <= 300.0  # give-up budget


def test_permanent_short_circuits():
    calls = {"n": 0}

    def bad():
        calls["n"] += 1
        raise PermanentError("schema violation")

    with pytest.raises(PermanentError):
        retry_call(bad, sleep=lambda s: None, clock=lambda: 0.0)
    assert calls["n"] == 1
    assert is_permanent(PermanentError("x")) and not is_permanent(ValueError())


def test_throttle_delay_honored():
    sleeps = []
    calls = {"n": 0}

    def throttled():
        calls["n"] += 1
        if calls["n"] == 1:
            raise ThrottleError(12.5)
        return 1

    assert retry_call(throttled, sleep=sleeps.append, clock=lambda: 0.0) == 1
    assert sleeps == [12.5]  # server delay, not the 5s backoff


def test_incremental_source_watermark(ray_session, tmp_path):
    from opentelemetry_collector_ray.synth import write_turns_parquet

    src = tmp_path / "frags"
    state = str(tmp_path / "state.json")
    write_turns_parquet(str(src), sf=0.02, shards=2)
    s = IncrementalParquetSource(str(src / "*.parquet"), state)
    ds, new, failed = s.scrape()
    assert len(new) == 2 and not failed and ds.count() > 0
    ds2, new2, _ = s.scrape()  # nothing new
    assert ds2 is None and new2 == []
    # a new fragment appears + one corrupt file
    write_turns_parquet(str(tmp_path / "more"), sf=0.01, shards=1)
    os.rename(str(tmp_path / "more" / "turns-0000.parquet"),
              str(src / "turns-9999.parquet"))
    (src / "corrupt.parquet").write_bytes(b"not a parquet file")
    ds3, new3, failed3 = s.scrape()
    assert len(new3) == 1 and ds3.count() > 0
    assert list(failed3) == [str(src / "corrupt.parquet")]
    # failed fragment is retried next tick (still not in watermark)
    _, _, failed4 = s.scrape()
    assert list(failed4) == [str(src / "corrupt.parquet")]


def test_incremental_jsonl_tailing(ray_session, tmp_path):
    """Generalized incremental source over the filelog-analog reader:
    new JSONL files flow exactly once, the watermark survives, empty
    ticks return None."""
    import json

    from opentelemetry_collector_ray.sources.incremental import (
        IncrementalFileSource)
    from opentelemetry_collector_ray.sources.textlog import read_jsonl

    logs = tmp_path / "logs"
    logs.mkdir()
    (logs / "a.jsonl").write_text(json.dumps({"x": 1}))
    s = IncrementalFileSource(str(logs / "*.jsonl"),
                              str(tmp_path / "st.json"),
                              reader=read_jsonl)
    ds, new, failed = s.scrape()
    assert len(new) == 1 and not failed and ds.to_pandas()["x"].tolist() == [1]
    assert s.scrape()[0] is None  # nothing new
    (logs / "b.jsonl").write_text(json.dumps({"x": 2}))
    ds3, new3, _ = s.scrape()
    assert len(new3) == 1 and ds3.to_pandas()["x"].tolist() == [2]
    # requeue lever for lazy-read failures discovered after commit
    s.unsee(new3)
    ds4, new4, _ = s.scrape()
    assert new4 == new3 and ds4.to_pandas()["x"].tolist() == [2]


def test_counter_identities():
    check_identities(10, {"a": 7, "b": 3})
    check_identities(10, {"a": 7}, dropped=3)
    with pytest.raises(AssertionError):
        check_identities(10, {"a": 7, "b": 2})


def test_manifest_records_per_route(ray_session, tmp_path):
    from opentelemetry_collector_ray.config import PipelineConfig
    from opentelemetry_collector_ray.pipelines.builder import run_pipeline
    from opentelemetry_collector_ray.state.manifest import ManifestStore
    from opentelemetry_collector_ray.synth import write_turns_parquet

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    write_turns_parquet(src, sf=0.03, shards=1)
    cfg = PipelineConfig.from_dict({
        "receivers": {"parquet": {"paths": src}},
        "processors": {"parse": {}, "enrich": {}, "route": {}},
        "exporters": {"parquet_sink/out": {"path": "sinks"}},
        "service": {"pipelines": {"logs": {
            "receivers": ["parquet"], "processors": ["parse", "enrich", "route"],
            "exporters": ["parquet_sink/out"]}}},
    })
    run_pipeline(cfg, out)
    store = ManifestStore(out)
    (pid,) = store.committed_ids()  # content-addressed partition id
    m = store.load(pid)
    assert m["status"] == "committed"
    assert m["metrics"]["rows_in"] == m["metrics"]["rows_out"] > 0
    assert sum(m["metrics"]["per_route"].values()) == m["metrics"]["rows_in"]


def test_exporter_contract_scenarios(ray_session):
    """Contract-checker analog (exporter/exportertest/contract_checker.go:
    45-110): every record carries a unique test_id; scenarios
    always_succeed / random_non_permanent_error / random_permanent_error;
    non-permanently-failed ids must be delivered AT LEAST once."""
    import numpy as np
    import pyarrow as pa

    import ray.data

    from opentelemetry_collector_ray.sinks.reliability import (
        PermanentError, RetryConfig, retry_call)

    ids = np.arange(200, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"test_id": pa.array(ids)}))
    fast = RetryConfig(initial_interval=0.001, max_interval=0.01,
                       max_elapsed=5.0)

    def run_scenario(fail_every, permanent_ids=frozenset()):
        delivered: list[int] = []
        perm_failed: list[int] = []
        calls = {"n": 0}

        def consume(batch: pa.Table):
            bids = batch.column("test_id").to_pylist()

            def attempt():
                calls["n"] += 1
                hit_perm = [i for i in bids if i in permanent_ids]
                if hit_perm:
                    raise PermanentError(f"bad records {hit_perm}")
                if fail_every and calls["n"] % fail_every == 0:
                    raise ConnectionError("transient export failure")
                delivered.extend(bids)

            try:
                retry_call(attempt, fast, sleep=lambda s: None)
            except PermanentError:
                perm_failed.extend(bids)

        for b in ds.iter_batches(batch_size=16, batch_format="pyarrow"):
            consume(b)
        return delivered, perm_failed

    # always_succeed: exactly-once delivery of every id
    d, p = run_scenario(fail_every=0)
    assert sorted(d) == ids.tolist() and not p

    # random_non_permanent_error: every id delivered AT LEAST once
    d, p = run_scenario(fail_every=3)
    assert set(d) == set(ids.tolist()) and not p

    # random_permanent_error: permanently-failed batches dropped without
    # retry, everything else delivered
    d, p = run_scenario(fail_every=0, permanent_ids=frozenset({37}))
    assert 37 in p and 37 not in d
    assert set(d) | set(p) == set(ids.tolist())


def test_telemetry_identities_on_flagship(ray_session, tmp_path):
    """The reference's consumed/produced counter identities
    (service/documentation.md:9-101) hold on a real flagship routed run,
    derived from data counts (fusion-proof)."""
    from opentelemetry_collector_ray.pipelines.flagship import build_routed
    from opentelemetry_collector_ray.sinks.parquet_sink import write_routed
    from opentelemetry_collector_ray.sources.transcripts import (
        read_derived_turns)
    from opentelemetry_collector_ray.state.metrics import (
        check_telemetry_identities, parquet_rows, routed_counts,
        telemetry_table)

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "routed")
    write_routed(build_routed(read_derived_turns(sf)), out)
    rows_in = parquet_rows(f"{sf}/events.parquet")  # 1 turn per event
    per_route = routed_counts(out)
    t = telemetry_table(rows_in, per_route,
                        processors=["parse", "enrich"])
    check_telemetry_identities(t)
    # the table is queryable: counters keyed exactly like the reference
    names = set(t.column("counter").to_pylist())
    assert names == {"otelcol.receiver.produced.items",
                     "otelcol.processor.consumed.items",
                     "otelcol.processor.produced.items",
                     "otelcol.connector.consumed.items",
                     "otelcol.connector.produced.items",
                     "otelcol.exporter.consumed.items"}
    # a broken link is caught and NAMED
    bad = telemetry_table(rows_in + 1, per_route,
                          processors=["parse", "enrich"])
    with pytest.raises(AssertionError, match="identity violated"):
        check_telemetry_identities(bad)
    # a row-changing stage with honest counts keeps the chain green
    t2 = telemetry_table(
        rows_in, per_route,
        processors=[("filter", rows_in, rows_in)])
    check_telemetry_identities(t2)
