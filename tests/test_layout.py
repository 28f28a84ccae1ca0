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
