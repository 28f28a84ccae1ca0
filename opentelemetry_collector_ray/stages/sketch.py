"""Mergeable sketches: HyperLogLog approximate distinct count.

The mergeable-sketch pattern for unbounded-cardinality aggregates at
10^12-row scale: each batch reduces to ONE fixed-size register array
(2^p bytes), registers merge by element-wise max (associative +
commutative → tree reduce, no shuffle), and the final estimate reads one
array. Standard HLL per Flajolet et al. 2007 with the small-range
linear-counting correction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..functions.hashing import hash64


def _registers(col: pa.ChunkedArray | pa.Array, p: int) -> np.ndarray:
    """One HLL register array (2^p uint8) for a column chunk."""
    h = hash64(col)
    m = 1 << p
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)
    # rank = leading zeros of remaining bits + 1 (cap at 64-p+1)
    rank = np.ones(len(h), dtype=np.uint8)
    nz = rest != 0
    # leading zero count via float trick is unsafe for 64-bit; loop bits
    v = rest[nz]
    lz = np.zeros(len(v), dtype=np.uint8)
    for shift in (32, 16, 8, 4, 2, 1):
        mask = v < (np.uint64(1) << np.uint64(64 - shift))
        lz[mask] += shift
        v[mask] = v[mask] << np.uint64(shift)
    rank_nz = lz + 1
    rank[nz] = rank_nz
    rank[~nz] = 64 - p + 1
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def _estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(2.0 ** -regs.astype(np.float64))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting small-range correction
    return float(est)


class HllPartial:
    """Per-batch: one serialized register row (fixed_size binary)."""

    def __init__(self, col: str, p: int = 12):
        self.col, self.p = col, p

    def __call__(self, t: pa.Table) -> pa.Table:
        regs = _registers(t.column(self.col), self.p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})


def _merge_regs(t: pa.Table) -> pa.Table:
    arrs = [np.frombuffer(b, dtype=np.uint8) for b in t.column("regs").to_pylist()]
    merged = np.maximum.reduce(arrs) if arrs else np.zeros(0, np.uint8)
    return pa.table({"regs": pa.array([merged.tobytes()], pa.binary())})


def approx_distinct(ds: ray.data.Dataset, col: str, p: int = 12,
                    fanin: int = 8) -> float:
    """Approximate COUNT(DISTINCT col): per-batch HLL registers →
    element-wise-max tree merge → estimate. Relative error ≈ 1.04/√(2^p)
    (~1.6% at p=12); the whole exchange moves fanin+1 rows of 2^p bytes."""
    partial = ds.select_columns([col]).map_batches(
        HllPartial(col, p), batch_format="pyarrow")
    merged = partial.repartition(fanin).map_batches(
        _merge_regs, batch_format="pyarrow", batch_size=None).repartition(1) \
        .map_batches(_merge_regs, batch_format="pyarrow", batch_size=None)
    (row,) = merged.take(1)
    return _estimate(np.frombuffer(row["regs"], dtype=np.uint8))
