"""table_checksum (stages/checksum.py): DuckDB md5-digest parity,
order/sharding insensitivity, guards; feature_hash and target_encode
(stages/encoding.py): SQL parity and overflow/mode guards."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray.data

from opentelemetry_collector_ray.stages.checksum import table_checksum
from opentelemetry_collector_ray.stages.encoding import (
    feature_hash, target_encode)


def _tbl(n=1000, seed=5):
    rng = np.random.default_rng(seed)
    return pa.table({
        "id": pa.array(np.arange(n), pa.int64()),
        "g": pa.array(np.char.add("g", rng.integers(0, 7, n)
                                  .astype("U2"))),
        "s": pa.array(np.char.add("v", rng.integers(0, 50, n)
                                  .astype("U3")))})


def _sql(tbl, q):
    con = duckdb.connect()
    con.register("t", tbl)
    return con.execute(q).df()


def test_table_checksum_matches_sql(ray_session):
    tbl = _tbl()
    out = table_checksum(ray.data.from_arrow(tbl).repartition(5),
                         ["id", "s"], group_col="g").to_pandas()
    want = _sql(tbl, """
        SELECT g, CAST(count(*) AS BIGINT) AS n,
               CAST(CAST(sum(CAST(('0x' || substr(md5(
                   CAST(id AS VARCHAR) || ':' || s), 1, 12))::UBIGINT
                   AS HUGEINT)) AS HUGEINT) % 18446744073709551616
                   AS VARCHAR) AS checksum
        FROM t GROUP BY g""")
    g = out.sort_values("g").reset_index(drop=True)
    w = want.sort_values("g").reset_index(drop=True)
    assert (g[["g", "n", "checksum"]].astype(str).values
            == w[["g", "n", "checksum"]].astype(str).values).all()


def test_table_checksum_shard_insensitive_and_global(ray_session):
    tbl = _tbl(seed=9)
    a = table_checksum(ray.data.from_arrow(tbl).repartition(2),
                       ["id", "s"], group_col="g").to_pandas()
    # a different sharding AND a shuffled row order: same checksums
    perm = np.random.default_rng(0).permutation(tbl.num_rows)
    shuffled = tbl.take(pa.array(perm, pa.int64()))
    b = table_checksum(ray.data.from_arrow(shuffled).repartition(11),
                       ["id", "s"], group_col="g").to_pandas()
    a = a.sort_values("g").reset_index(drop=True)
    b = b.sort_values("g").reset_index(drop=True)
    assert (a.values == b.values).all()
    # whole-table mode: one row, no group column
    g = table_checksum(ray.data.from_arrow(tbl).repartition(3),
                       ["id", "s"]).to_pandas()
    assert list(g.columns) == ["n", "checksum"] and len(g) == 1
    assert int(g["n"][0]) == tbl.num_rows


def test_table_checksum_guards(ray_session):
    tbl = pa.table({"x": pa.array([1.5, 2.5], pa.float64()),
                    "s": pa.array(["a", None], pa.string())})
    with pytest.raises(Exception, match="integer/string"):
        table_checksum(ray.data.from_arrow(tbl), ["x"]).to_pandas()
    with pytest.raises(Exception, match="nulls"):
        table_checksum(ray.data.from_arrow(tbl), ["s"]).to_pandas()
    with pytest.raises(ValueError, match="non-empty"):
        table_checksum(ray.data.from_arrow(tbl), [])


def test_feature_hash_md5_matches_sql(ray_session):
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["a b c a", "b  b", "", "c a xyz"],
                         pa.string())})
    out = feature_hash(ray.data.from_arrow(docs).repartition(2),
                       "doc_id", "text", n_buckets=8,
                       hash_mode="md5").to_pandas()
    want = _sql(docs, """
        WITH toks AS (SELECT doc_id,
                             unnest(string_split(text, ' ')) AS tok
                      FROM t),
        h AS (SELECT doc_id,
                     CAST(('0x' || substr(md5(tok), 1, 6))::UBIGINT % 8
                          AS BIGINT) AS bucket
              FROM toks WHERE tok <> '')
        SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS n
        FROM h GROUP BY doc_id, bucket""")
    cols = ["doc_id", "bucket", "n"]
    g = out.sort_values(cols).reset_index(drop=True)
    w = want.sort_values(cols).reset_index(drop=True)
    assert (g[cols].values == w[cols].values).all()
    # total token mass preserved (the '' doc contributes nothing)
    assert int(out["n"].sum()) == 4 + 2 + 0 + 3


def test_feature_hash_modes_and_guards(ray_session):
    docs = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                     "text": pa.array(["a b", "a"], pa.string())})
    xx = feature_hash(ray.data.from_arrow(docs), "doc_id", "text",
                      n_buckets=4).to_pandas()
    assert int(xx["n"].sum()) == 3
    assert xx["bucket"].between(0, 3).all()
    with pytest.raises(ValueError, match="hash_mode"):
        feature_hash(ray.data.from_arrow(docs), "doc_id", "text",
                     hash_mode="sha9")
    with pytest.raises(ValueError, match="n_buckets"):
        feature_hash(ray.data.from_arrow(docs), "doc_id", "text",
                     n_buckets=0)
    big = pa.table({"doc_id": pa.array([2**62], pa.int64()),
                    "text": pa.array(["a"], pa.string())})
    with pytest.raises(Exception, match="out of range"):
        feature_hash(ray.data.from_arrow(big), "doc_id", "text",
                     n_buckets=64).to_pandas()


def test_target_encode_matches_sql_and_guards(ray_session):
    rng = np.random.default_rng(2)
    tbl = pa.table({
        "cat": pa.array(np.char.add("c", rng.integers(0, 5, 300)
                                    .astype("U2"))),
        "y": pa.array(rng.integers(0, 10_000, 300), pa.int64())})
    out = target_encode(ray.data.from_arrow(tbl).repartition(3),
                        "cat", "y", smoothing_m=20).to_pandas()
    want = _sql(tbl, """
        WITH p AS (SELECT cat, CAST(count(*) AS BIGINT) AS n,
                          CAST(sum(y) AS BIGINT) AS s
                   FROM t GROUP BY cat),
        g AS (SELECT CAST(sum(n) AS BIGINT) AS gn,
                     CAST(sum(s) AS BIGINT) AS gs FROM p)
        SELECT cat, n, s,
               CAST((s * gn + 20 * gs) // ((n + 20) * gn) AS BIGINT)
                   AS enc FROM p, g""")
    cols = ["cat", "n", "s", "enc"]
    a = out.sort_values("cat").reset_index(drop=True)
    b = want.sort_values("cat").reset_index(drop=True)
    assert (a[cols].values == b[cols].values).all()
    # m=0 degenerates to the exact per-category floor mean
    m0 = target_encode(ray.data.from_arrow(tbl), "cat", "y",
                       smoothing_m=0).to_pandas()
    for _, r in m0.iterrows():
        assert int(r["enc"]) == int(r["s"]) // int(r["n"])
    with pytest.raises(ValueError, match="smoothing_m"):
        target_encode(ray.data.from_arrow(tbl), "cat", "y",
                      smoothing_m=-1)
    neg = pa.table({"cat": pa.array(["a"]), "y": pa.array([-5],
                                                          pa.int64())})
    with pytest.raises(ValueError, match="negative"):
        target_encode(ray.data.from_arrow(neg), "cat", "y")


def test_feature_hash_int32_ids(ray_session):
    """int32 id columns must not wrap in the packed (id, bucket) key —
    review-found numpy value-based-cast bug."""
    docs = pa.table({"doc_id": pa.array([40_000_000, 7], pa.int32()),
                     "text": pa.array(["a b", "c"], pa.string())})
    out = feature_hash(ray.data.from_arrow(docs), "doc_id", "text",
                       n_buckets=64).to_pandas()
    assert set(out["doc_id"]) == {40_000_000, 7}
    assert (out["doc_id"] >= 0).all() and (out["n"] > 0).all()


def test_target_encode_empty_keeps_cat_type(ray_session):
    """Empty input returns the category column's REAL type, not a
    hardcoded string (review finding)."""
    tbl = pa.table({"cat": pa.array([], pa.int64()),
                    "y": pa.array([], pa.int64())})
    out = target_encode(ray.data.from_arrow(tbl), "cat", "y")
    sch = out.schema()
    assert dict(zip(sch.names, sch.types))["cat"] == pa.int64()
    assert out.count() == 0


def test_replication_check_example_yaml(ray_session, tmp_path,
                                        monkeypatch):
    """examples/replication_check.yaml: the YAML pipeline's whole-table
    checksum equals the direct call AND survives an IPC export/reimport
    round trip (the replication-validation pattern it documents)."""
    import os

    import pyarrow.parquet as pq
    import ray.data

    from opentelemetry_collector_ray.config import PipelineConfig
    from opentelemetry_collector_ray.pipelines.builder import build_dataset
    from opentelemetry_collector_ray.sources.arrow_ipc import (
        read_ipc, write_ipc)

    tbl = pa.table({
        "event_id": pa.array(np.arange(300), pa.int64()),
        "user_id": pa.array(np.arange(300) % 17, pa.int64()),
        "event_type": pa.array(
            np.char.add("t", (np.arange(300) % 5).astype("U2")))})
    p = tmp_path / "events.parquet"
    pq.write_table(tbl, str(p))
    monkeypatch.setenv("EVENTS_DIR", str(p))
    cfg = PipelineConfig.from_yaml(
        os.path.join(os.path.dirname(__file__), "..", "examples",
                     "replication_check.yaml"))
    src_sum = build_dataset(cfg).to_pandas()
    assert list(src_sum.columns) == ["n", "checksum"]
    assert int(src_sum["n"][0]) == 300

    # replicate over the IPC wire (different sharding), re-checksum
    wire = str(tmp_path / "wire")
    write_ipc(ray.data.from_arrow(tbl).repartition(7), wire, "zstd")
    files = [f"{wire}/{f}" for f in sorted(os.listdir(wire))]
    copy_sum = table_checksum(
        read_ipc(files), ["event_id", "user_id", "event_type"]
        ).to_pandas()
    assert copy_sum["checksum"][0] == src_sum["checksum"][0]
    assert int(copy_sum["n"][0]) == 300
