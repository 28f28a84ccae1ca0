"""Z-order layout (stages/layout.py): code correctness vs a bit-level
reference, locality property, guards, and the sorted-output contract."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from opentelemetry_collector_ray.stages.layout import zorder_code, zorder_sort


def _ref_code(x, y):
    out = 0
    for k in range(31):
        out |= ((x >> k) & 1) << (2 * k)
        out |= ((y >> k) & 1) << (2 * k + 1)
    return out


def test_zorder_code_matches_bit_reference():
    rng = np.random.default_rng(5)
    x = rng.integers(0, 2**31, 200)
    y = rng.integers(0, 2**31, 200)
    got = zorder_code(x, y)
    want = np.array([_ref_code(int(a), int(b)) for a, b in zip(x, y)])
    assert (got == want).all()
    assert got.dtype == np.int64 and (got >= 0).all()


def test_zorder_code_guards():
    with pytest.raises(ValueError, match="2\\^31"):
        zorder_code(np.array([-1]), np.array([0]))
    with pytest.raises(ValueError, match="2\\^31"):
        zorder_code(np.array([0]), np.array([2**31]))


def test_zorder_sort_orders_globally(ray_session):
    rng = np.random.default_rng(6)
    n = 5000
    tbl = pa.table({"id": pa.array(np.arange(n), pa.int64()),
                    "x": pa.array(rng.integers(0, 1000, n), pa.int64()),
                    "y": pa.array(rng.integers(0, 1000, n), pa.int64())})
    out = zorder_sort(lambda: ray.data.from_arrow(tbl).repartition(8),
                      "x", "y", tie_break="id").to_pandas()
    s = out.sort_values("zrank")
    codes = s["zcode"].to_numpy()
    assert (np.diff(codes) >= 0).all()
    assert sorted(s["zrank"]) == list(range(n))
    # locality: rows adjacent in z-rank are close in (x, y) far more
    # often than random ordering — the read-pruning property
    xy = s[["x", "y"]].to_numpy()
    d_sorted = np.abs(np.diff(xy, axis=0)).sum(axis=1).mean()
    r = np.random.default_rng(0).permutation(n)
    d_rand = np.abs(np.diff(xy[r], axis=0)).sum(axis=1).mean()
    assert d_sorted < d_rand / 3


# ------------------------------------------------- zone-mapped clustering

from opentelemetry_collector_ray.stages.layout import (  # noqa: E402
    MANIFEST_NAME, cluster_write, read_pruned)


def _mk(n=2000, seed=7):
    rng = np.random.default_rng(seed)
    tbl = pa.table({
        "k": rng.uniform(0, 1000, n),
        "grp": rng.integers(0, 5, n),
        "payload": rng.integers(0, 10**9, n)})
    return tbl


def test_cluster_write_prunes_and_is_exact(ray_session, tmp_path):
    tbl = _mk()
    out = str(tmp_path / "zm")
    man = cluster_write(
        lambda: ray.data.from_arrow(tbl).repartition(8),
        out, keys="k", stats_cols=["payload"], num_partitions=10)
    # manifest committed, one file per non-empty partition, disjoint in k
    assert man.num_rows >= 8
    assert int(pa.compute.sum(man.column("n_rows")).as_py()) == tbl.num_rows
    mins = man.column("min_k").to_numpy()
    maxs = man.column("max_k").to_numpy()
    order = np.argsort(mins)
    assert (maxs[order][:-1] <= mins[order][1:]).all()  # disjoint ranges

    ds, report = read_pruned(out, {"k": (100.0, 200.0)})
    assert report["files_total"] == man.num_rows
    assert 0 < report["files_scanned"] < report["files_total"]
    got = ds.to_pandas().sort_values(["k", "payload"]).reset_index(drop=True)
    mask = (tbl.column("k").to_numpy() >= 100.0) & \
           (tbl.column("k").to_numpy() <= 200.0)
    want = tbl.to_pandas()[mask].sort_values(
        ["k", "payload"]).reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_read_pruned_empty_band_keeps_schema(ray_session, tmp_path):
    out = str(tmp_path / "zm2")
    cluster_write(lambda: ray.data.from_arrow(_mk(300)).repartition(4),
                  out, keys="k", stats_cols=[], num_partitions=4)
    ds, report = read_pruned(out, {"k": (5000.0, 6000.0)})
    assert report["files_scanned"] == 0
    assert ds.count() == 0
    assert set(ds.schema().names) == {"k", "grp", "payload"}


def test_read_pruned_halfopen_and_residual(ray_session, tmp_path):
    out = str(tmp_path / "zm3")
    tbl = _mk(500, seed=11)
    cluster_write(lambda: ray.data.from_arrow(tbl).repartition(4),
                  out, keys="k", stats_cols=[], num_partitions=6)
    ds, _ = read_pruned(out, {"k": (None, 50.0)})
    got = sorted(ds.to_pandas()["k"])
    want = sorted(v for v in tbl.column("k").to_pylist() if v <= 50.0)
    assert got == pytest.approx(want)


def test_bloom_point_lookup_prunes_and_is_exact(ray_session, tmp_path):
    """bloom_cols point lookups: the eq= probe skips files whose filter
    proves the value absent, result equals the exact filter, and a
    value placed in exactly one file scans (almost) one file."""
    rng = np.random.default_rng(21)
    n = 4000
    tbl = pa.table({
        "k": pa.array(np.arange(n, dtype=np.int64)),
        "user": pa.array(rng.integers(0, 50_000, n), pa.int64()),
        "payload": pa.array(rng.integers(0, 10**9, n))})
    out = str(tmp_path / "bl")
    man = cluster_write(
        lambda: ray.data.from_arrow(tbl).repartition(8),
        out, keys="k", stats_cols=["k"], num_partitions=16,
        bloom_cols=["user"], bloom_bits=4096)
    assert "bloom_user" in man.column_names

    probe = int(tbl.column("user")[7].as_py())
    ds, report = read_pruned(out, {}, eq={"user": probe})
    got = ds.to_pandas().sort_values("k").reset_index(drop=True)
    want = tbl.to_pandas().query("user == @probe") \
        .sort_values("k").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the value occurs in few files; bloom must prune most of them
    assert report["files_scanned"] < report["files_total"]

    # a value NOT in the data: with high probability every file prunes
    ds2, rep2 = read_pruned(out, {}, eq={"user": 99_999_999})
    assert rep2["files_scanned"] <= 2
    assert ds2.count() == 0

    # eq composes with a range band; residual still exact
    ds3, rep3 = read_pruned(out, {"k": (0, 999)}, eq={"user": probe})
    got3 = ds3.to_pandas()
    want3 = tbl.to_pandas().query("user == @probe and k <= 999")
    assert len(got3) == len(want3)
    with pytest.raises(ValueError, match="power of two"):
        cluster_write(lambda: ray.data.from_arrow(tbl), out,
                      keys="k", stats_cols=["k"], bloom_cols=["user"],
                      bloom_bits=1000)
