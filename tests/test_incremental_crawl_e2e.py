"""Incremental-crawl integration: the composed story the pieces were
built for — per-tick file arrival (IncrementalParquetSource watermark)
→ dedup against the PERSISTED seen-content index (cross-round exact
dedup) → append survivors' fingerprints → compaction mid-stream →
survivors written per round. Three rounds, planted cross-round and
within-round duplicates, then a cold restart of every piece of state
from disk."""

from __future__ import annotations

import glob

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from opentelemetry_collector_ray.sources.incremental import (
    IncrementalParquetSource)
from opentelemetry_collector_ray.stages.seenindex import (
    append_to_index, build_seen_index, compact_seen_index,
    dedup_against_index)


def _write_round(dirpath, name, rows):
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows])}),
        str(dirpath / name))


def test_incremental_crawl_three_rounds(ray_session, tmp_path):
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    idx = str(tmp_path / "seen_idx")
    out = tmp_path / "out"
    state = str(tmp_path / "watermark.json")

    src = IncrementalParquetSource(str(inbox / "*.parquet"), state)

    def one_round(round_no: int) -> list[int]:
        ds, new_paths, failed = src.scrape()
        assert not failed
        if ds is None:
            return []
        surv = dedup_against_index(ds, idx)
        ids = sorted(surv.to_pandas()["doc_id"].tolist())
        if ids:
            kept = ds.map_batches(
                lambda t, ids=frozenset(ids): t.filter(
                    pa.compute.is_in(t.column("doc_id"),
                                     pa.array(list(ids), pa.int64()))),
                batch_format="pyarrow")
            append_to_index(kept, idx, n_shards=4)
            kept.write_parquet(str(out / f"round={round_no}"))
        return ids

    # round 0: bootstrap the index from an empty corpus
    build_seen_index(ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())})), idx, n_shards=4)

    # round 1: all fresh; one within-round duplicate pair
    _write_round(inbox, "r1a.parquet", [(1, "alpha"), (2, "beta")])
    _write_round(inbox, "r1b.parquet", [(3, "beta"), (4, "gamma")])
    assert one_round(1) == [1, 2, 4]  # 3 loses 'beta' to 2

    # round 2: cross-round dup + fresh; watermark skips round-1 files
    _write_round(inbox, "r2.parquet", [(10, "alpha"), (11, "delta")])
    assert one_round(2) == [11]

    # compact between rounds (simulating maintenance) and keep going
    n = compact_seen_index(idx)
    assert n == 4  # alpha, beta, gamma, delta
    assert len(glob.glob(idx + "/shard=*/*.parquet")) <= 4

    # round 3 from a COLD restart: new source object, state from disk
    src2 = IncrementalParquetSource(str(inbox / "*.parquet"), state)
    _write_round(inbox, "r3.parquet",
                 [(20, "gamma"), (21, "epsilon"), (22, "epsilon")])
    ds3, new_paths, failed = src2.scrape()
    assert [p.endswith("r3.parquet") for p in new_paths] == [True]
    surv3 = sorted(dedup_against_index(
        ds3, idx).to_pandas()["doc_id"].tolist())
    assert surv3 == [21]

    # the per-round outputs hold exactly the survivors
    all_out = ray.data.read_parquet(str(out)).to_pandas()
    assert sorted(all_out["doc_id"].tolist()) == [1, 2, 4, 11]
