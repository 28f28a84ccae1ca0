"""Persisted seen-content index (stages/seenindex.py): planted
incremental-crawl rounds, within-ingest first-wins, append semantics,
YAML parity."""

from __future__ import annotations

import pyarrow as pa

import ray.data

from opentelemetry_collector_ray.stages.seenindex import (
    append_to_index, build_seen_index, dedup_against_index)


def _docs(rows):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows])})).repartition(3)


def test_incremental_rounds(ray_session, tmp_path):
    idx = str(tmp_path / "idx")
    build_seen_index(_docs([(1, "alpha"), (2, "beta")]), idx,
                     n_shards=4)

    # round 2: one seen dup, one internal dup pair, one fresh
    surv = dedup_against_index(
        _docs([(10, "alpha"),          # seen in round 1 -> dropped
               (11, "gamma"), (12, "gamma"),  # internal dup -> min id
               (13, "delta")]), idx).to_pandas()
    assert sorted(surv["doc_id"]) == [11, 13]

    # append survivors; round 3 must now see gamma/delta as seen
    append_to_index(_docs([(11, "gamma"), (13, "delta")]), idx,
                    n_shards=4)
    surv3 = dedup_against_index(
        _docs([(20, "gamma"), (21, "delta"), (22, "epsilon"),
               (23, "beta")]), idx).to_pandas()
    assert sorted(surv3["doc_id"]) == [22]


def test_index_is_sharded_and_distinct(ray_session, tmp_path):
    import glob

    idx = str(tmp_path / "idx")
    # duplicate text in the base corpus -> ONE fingerprint row
    build_seen_index(_docs([(1, "x"), (2, "x"), (3, "y")]), idx,
                     n_shards=4)
    files = glob.glob(idx + "/shard=*/*.parquet")
    assert files, "expected Hive shard directories"
    total = ray.data.read_parquet(idx).count()
    assert total == 2  # distinct fingerprints only


def test_dedup_index_yaml(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from opentelemetry_collector_ray.config import PipelineConfig
    from opentelemetry_collector_ray.pipelines.builder import build_dataset

    idx = str(tmp_path / "idx")
    build_seen_index(_docs([(1, "old news")]), idx, n_shards=2)
    p = tmp_path / "new.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array([5, 6], pa.int64()),
        "text": pa.array(["old news", "fresh take"])}), str(p))
    y = build_dataset(PipelineConfig.from_dict({
        "receivers": {"parquet": {"paths": str(p)}},
        "processors": {"dedup_index": {"path": idx}},
        "exporters": {"debug": {}},
        "service": {"pipelines": {"logs": {
            "receivers": ["parquet"], "processors": ["dedup_index"],
            "exporters": ["debug"]}}},
    })).to_pandas()
    assert y["doc_id"].tolist() == [6]


def test_compaction_merges_small_files(ray_session, tmp_path):
    import glob

    from opentelemetry_collector_ray.stages.seenindex import (
        compact_seen_index)

    idx = str(tmp_path / "idx")
    build_seen_index(_docs([(1, "a"), (2, "b")]), idx, n_shards=2)
    append_to_index(_docs([(3, "c"), (4, "a")]), idx, n_shards=2)
    append_to_index(_docs([(5, "d")]), idx, n_shards=2)
    before = ray.data.read_parquet(idx).to_pandas()
    files_before = len(glob.glob(idx + "/shard=*/*.parquet"))
    n = compact_seen_index(idx)
    after = ray.data.read_parquet(idx).to_pandas()
    files_after = len(glob.glob(idx + "/shard=*/*.parquet"))
    # distinct fingerprints preserved ('a' was appended twice)
    key = ["h1", "h2"]
    assert n == 4
    assert sorted(map(tuple, after[key].values.tolist())) == \
        sorted(set(map(tuple, before[key].values.tolist())))
    assert files_after < files_before
    # dedup still works against the compacted index
    surv = dedup_against_index(_docs([(9, "d"), (10, "e")]),
                               idx).to_pandas()
    assert surv["doc_id"].tolist() == [10]


def test_compaction_crash_window_recovers(ray_session, tmp_path):
    """Simulate a crash between the two renames (only <path>.old left):
    the next entry-point call heals the index automatically."""
    import os

    from opentelemetry_collector_ray.stages.seenindex import (
        compact_seen_index)

    idx = str(tmp_path / "idx")
    build_seen_index(_docs([(1, "a"), (2, "b")]), idx, n_shards=2)
    os.rename(idx, idx + ".old")  # the crash window state
    surv = dedup_against_index(_docs([(9, "a"), (10, "z")]),
                               idx).to_pandas()
    assert surv["doc_id"].tolist() == [10]
    # and compaction itself also recovers from the same state
    os.rename(idx, idx + ".old")
    assert compact_seen_index(idx) == 2


def test_append_into_crash_window_recovers_first(ray_session, tmp_path):
    """append_to_index after a crashed compaction must heal the index,
    not create a fresh one that orphans the history (review finding)."""
    import os

    idx = str(tmp_path / "idx")
    build_seen_index(_docs([(1, "old gold")]), idx, n_shards=2)
    os.rename(idx, idx + ".old")  # crash window
    append_to_index(_docs([(2, "newer")]), idx, n_shards=2)
    # both the historical and the appended fingerprints must be live
    surv = dedup_against_index(
        _docs([(9, "old gold"), (10, "newer"), (11, "fresh")]),
        idx).to_pandas()
    assert surv["doc_id"].tolist() == [11]
