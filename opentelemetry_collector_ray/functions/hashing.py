"""Deterministic vectorized hashing for partitioning, dedup and sketches.

Process-independent (no PYTHONHASHSEED dependence) so that hash-partitioned
outputs and resume runs are stable within a deployment — the same
requirement the reference's persistent queue places on its read/write
indices (``/root/reference/exporter/exporterhelper/internal/queue/
persistent_queue.go``).

Primary kernel: polars ``Series.hash`` (vectorized xxhash in Rust, fixed
seed — stable across processes for a fixed polars version, which is all a
single cluster/deployment needs). Fallback: a numpy FNV-1a64 loop over byte
positions (only used if polars is absent; capped cost documented there).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

try:
    import polars as pl
    _HAVE_POLARS = True
except ImportError:  # pragma: no cover
    _HAVE_POLARS = False

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _fnv1a_fallback(arr: pa.Array, seed: int = 0) -> np.ndarray:  # pragma: no cover
    arr = arr.cast(pa.large_string())
    buf = np.frombuffer(arr.buffers()[2], dtype=np.uint8) if arr.buffers()[2] else np.empty(0, np.uint8)
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64)[arr.offset: arr.offset + len(arr) + 1]
    starts, ends = offsets[:-1].copy(), offsets[1:]
    # Mix the seed into the initial offset basis (splitmix64 of seed) so
    # seed=0 and seed=1 give INDEPENDENT hash families — exact_dedup's
    # (h1, h2) pair guarantee must hold on the fallback path too.
    with np.errstate(over="ignore"):
        offset = _FNV_OFFSET ^ hash64_ints(np.array([seed], np.uint64), seed=seed)[0]
    h = np.full(len(arr), offset, dtype=np.uint64)
    pos = starts.copy()
    alive = pos < ends
    with np.errstate(over="ignore"):
        while alive.any():
            idx = np.nonzero(alive)[0]
            b = buf[pos[idx]].astype(np.uint64)
            h[idx] = (h[idx] ^ b) * _FNV_PRIME
            pos[idx] += 1
            alive = pos < ends
    h[arr.is_null().to_numpy(zero_copy_only=False)] = 0
    return h


def hash64(col: pa.ChunkedArray | pa.Array, seed: int = 0) -> np.ndarray:
    """Stable 64-bit hash of a column → uint64 ndarray (nulls → 0-seeded)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if _HAVE_POLARS:
        s = pl.Series("h", pl.from_arrow(col))
        return s.hash(seed=seed).to_numpy().astype(np.uint64)
    return _fnv1a_fallback(col.cast(pa.string()), seed=seed)


def hash64_ints(a: np.ndarray, seed: int = 0) -> np.ndarray:
    """Stable splitmix64 over an integer ndarray (minhash permutations etc.;
    pure numpy, version-independent)."""
    with np.errstate(over="ignore"):
        x = a.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15) * np.uint64(seed + 1)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
    return x


def bucket_of(col: pa.ChunkedArray | pa.Array, n_buckets: int) -> np.ndarray:
    """Deterministic partition bucket for a key column → int64 ndarray."""
    return (hash64(col) % np.uint64(n_buckets)).astype(np.int64)
