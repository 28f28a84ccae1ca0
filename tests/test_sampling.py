"""Distributed bottom-k hash sampling (stages/sampling.py):
determinism across layouts, exact merge semantics, md5 oracle parity."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from opentelemetry_collector_ray.stages.sampling import sample_bottom_k


def _tbl(n=500):
    return pa.table({"doc_id": pa.array(np.arange(n)),
                     "v": pa.array(np.arange(n) * 7 % 13)})


def test_bottom_k_layout_invariant(ray_session):
    tbl = _tbl()
    outs = []
    for blocks in (1, 3, 9):
        out = sample_bottom_k(
            ray.data.from_arrow(tbl).repartition(blocks), 25,
            "doc_id").to_pandas().sort_values("doc_id")
        outs.append(out["doc_id"].tolist())
    assert outs[0] == outs[1] == outs[2]
    assert len(outs[0]) == 25


def test_bottom_k_md5_matches_python_reference(ray_session):
    tbl = _tbl(200)
    out = sample_bottom_k(ray.data.from_arrow(tbl).repartition(4), 10,
                          "doc_id", hash_mode="md5",
                          keep_rank=True).to_pandas()
    ref = sorted(range(200),
                 key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(),
                                i))[:10]
    assert out["doc_id"].tolist() == ref  # output IS bottom-k sorted
    assert (out["_rk"] == [hashlib.md5(str(i).encode()).hexdigest()
                           for i in ref]).all()


def test_bottom_k_small_input_and_validation(ray_session):
    tbl = _tbl(5)
    out = sample_bottom_k(ray.data.from_arrow(tbl), 25, "doc_id"
                          ).to_pandas()
    assert sorted(out["doc_id"]) == list(range(5))  # k > n keeps all
    with pytest.raises(ValueError):
        sample_bottom_k(ray.data.from_arrow(tbl), 0, "doc_id")
    with pytest.raises(ValueError):
        sample_bottom_k(ray.data.from_arrow(tbl), 1, "doc_id",
                        hash_mode="sha1")


def test_bottom_k_by_group_matches_duckdb_and_layout(ray_session):
    """Per-group sampler: md5 mode equals the SQL window oracle
    bit-for-bit; xx64 mode is layout-invariant; small groups keep all
    rows."""
    import duckdb

    from opentelemetry_collector_ray.stages.sampling import (
        sample_bottom_k_by)

    rng = np.random.default_rng(17)
    n = 600
    tbl = pa.table({"doc_id": pa.array(np.arange(n)),
                    "g": pa.array(rng.choice(["a", "b", "c"], n,
                                             p=[.6, .38, .02]))})
    out = sample_bottom_k_by(
        ray.data.from_arrow(tbl).repartition(5), 9, "doc_id", "g",
        hash_mode="md5").to_pandas()
    exp = duckdb.sql("""
        WITH r AS (SELECT doc_id, g, row_number() OVER (PARTITION BY g
              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
            FROM tbl)
        SELECT doc_id, g FROM r WHERE rn <= 9""").df()
    assert sorted(map(tuple, out.values.tolist())) == \
        sorted(map(tuple, exp.values.tolist()))

    outs = [sample_bottom_k_by(
        ray.data.from_arrow(tbl).repartition(b), 9, "doc_id", "g"
        ).to_pandas().sort_values("doc_id")["doc_id"].tolist()
        for b in (1, 4, 11)]
    assert outs[0] == outs[1] == outs[2]
    assert len(outs[0]) == 27

    tiny = pa.table({"doc_id": [1, 2, 3], "g": ["x", "x", "y"]})
    keep = sample_bottom_k_by(ray.data.from_arrow(tiny), 10,
                              "doc_id", "g").to_pandas()
    assert len(keep) == 3  # k > group size keeps every row
    with pytest.raises(ValueError):
        sample_bottom_k_by(ray.data.from_arrow(tiny), 0, "doc_id", "g")
    with pytest.raises(ValueError, match="reserved"):
        sample_bottom_k_by(ray.data.from_arrow(tiny), 1, "doc_id", "_rk")


def test_assign_split_group_consistent(ray_session):
    from opentelemetry_collector_ray.stages.sampling import assign_split

    tbl = pa.table({"row": pa.array(range(200), pa.int64()),
                    "grp": pa.array([i % 17 for i in range(200)],
                                    pa.int64())})
    for mode in ("xx64", "md5"):
        out = assign_split(ray.data.from_arrow(tbl).repartition(4), "grp",
                           {"train": 0.5, "val": 0.25, "test": 0.25},
                           hash_mode=mode).to_pandas()
        per_group = out.groupby("grp")["split"].nunique()
        assert (per_group == 1).all(), mode  # group never straddles
        assert set(out["split"]) <= {"train", "val", "test"}
        # deterministic across runs
        out2 = assign_split(ray.data.from_arrow(tbl), "grp",
                            {"train": 0.5, "val": 0.25, "test": 0.25},
                            hash_mode=mode).to_pandas()
        m = out.sort_values("row")["split"].tolist()
        assert m == out2.sort_values("row")["split"].tolist()


def test_assign_split_validation(ray_session):
    from opentelemetry_collector_ray.stages.sampling import assign_split

    tbl = pa.table({"k": pa.array([1, 2], pa.int64())})
    ds = ray.data.from_arrow(tbl)
    with pytest.raises(ValueError, match="sum to 1"):
        assign_split(ds, "k", {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError, match="hash_mode"):
        assign_split(ds, "k", {"a": 1.0}, hash_mode="bogus")
    with pytest.raises(ValueError, match="non-empty"):
        assign_split(ds, "k", {})


def test_weighted_sample_layout_invariant_and_heavy(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from opentelemetry_collector_ray.stages.sampling import (
        sample_weighted_k)

    n = 1001
    w = np.ones(n, np.int64)
    w[-1] = 100000  # one overwhelmingly heavy row
    t = pa.table({"id": pa.array(range(n), pa.int64()),
                  "w": pa.array(w)})
    outs = []
    for parts in (2, 8):
        out = sample_weighted_k(
            ray.data.from_arrow(t).repartition(parts), 10, "id",
            "w").to_pandas()
        outs.append(sorted(out["id"].tolist()))
    assert outs[0] == outs[1]          # layout-independent
    assert len(outs[0]) == 10
    assert n - 1 in outs[0]            # the heavy row is all but certain


def test_weighted_sample_duckdb_parity(ray_session):
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from opentelemetry_collector_ray.stages.sampling import (
        sample_weighted_k)

    rng = np.random.default_rng(2)
    t = pa.table({"id": pa.array(range(800), pa.int64()),
                  "w": pa.array(rng.integers(1, 50, 800).astype(np.int64))})
    got = sample_weighted_k(ray.data.from_arrow(t).repartition(6),
                            25, "id", "w", hash_mode="md5").to_pandas()
    con = duckdb.connect()
    con.register("iv", t)
    want = con.sql(r"""
WITH r AS (SELECT id, w,
    -ln((('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 12))::UBIGINT
         + 0.5) / 281474976710656.0) / w AS rk FROM iv)
SELECT id, w FROM r ORDER BY rk, id LIMIT 25
""").df()
    assert sorted(got["id"]) == sorted(want["id"])


def test_weighted_sample_guards(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data

    from opentelemetry_collector_ray.stages.sampling import (
        sample_weighted_k)

    t = pa.table({"id": pa.array([1, 2], pa.int64()),
                  "w": pa.array([1, 0], pa.int64())})
    with pytest.raises(Exception, match="> 0"):
        sample_weighted_k(ray.data.from_arrow(t), 1, "id",
                          "w").to_pandas()
    with pytest.raises(ValueError, match="positive"):
        sample_weighted_k(ray.data.from_arrow(t), 0, "id", "w")
