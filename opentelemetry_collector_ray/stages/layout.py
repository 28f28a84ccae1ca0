"""Data-layout optimization — Z-order (Morton) clustering.

The table-layout step a 100 TB lakehouse pipeline runs before writing:
rows sorted by the bit-interleaving of two dimension columns cluster
multi-dimensional range queries into few row groups, so both
predicates prune at the read (the Delta/Iceberg OPTIMIZE ZORDER
analog; the reference collector has no layout operator — this is an
engine addition serving the same read-pruning goal as its batching).

``zorder_code`` is a pure numpy bit-spread (5 shift/mask rounds per
dimension, no Python per row); ``zorder_sort`` rides the spill-safe
distributed sample sort (``stages/sort.global_sort``), so the
clustering scales exactly like any other global sort here. Inputs must
be non-negative and < 2^31 so the interleaved code fits int64 —
violations raise loudly per batch (never silent wraparound).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

__all__ = ["zorder_code", "zorder_sort"]

_MAX_DIM = np.int64(1) << 31


def _spread_bits(v: np.ndarray) -> np.ndarray:
    """32-bit values → bits at even positions of a 64-bit word."""
    v = v.astype(np.uint64)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def zorder_code(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Morton code: x's bits at even positions, y's at odd — int64."""
    x = np.asarray(x, np.int64)
    y = np.asarray(y, np.int64)
    for name, v in (("x", x), ("y", y)):
        if len(v) and (int(v.min()) < 0 or int(v.max()) >= _MAX_DIM):
            raise ValueError(
                f"zorder_code: {name} must be in [0, 2^31) so the "
                "interleaved code fits int64; rescale or bucket the "
                "dimension first")
    return (_spread_bits(x)
            | (_spread_bits(y) << np.uint64(1))).astype(np.int64)


def zorder_sort(make_ds, x_col: str, y_col: str, tie_break: str,
                code_col: str = "zcode", rank_col: str | None = "zrank",
                persist: str = "none") -> ray.data.Dataset:
    """Append the Morton code of (``x_col``, ``y_col``) and totally
    order the dataset by (code, ``tie_break``) via the distributed
    sample sort; with ``rank_col`` each row carries its dense global
    position (the value-hash-checkable evidence of the order). The
    two-pass ``global_sort`` contract applies — ``persist=`` forwards."""
    from .sort import global_sort

    def add_code(t: pa.Table) -> pa.Table:
        x = t.column(x_col).to_numpy(zero_copy_only=False)
        y = t.column(y_col).to_numpy(zero_copy_only=False)
        return t.append_column(code_col, pa.array(zorder_code(x, y)))

    return global_sort(
        lambda: make_ds().map_batches(add_code, batch_format="pyarrow"),
        [code_col, tie_break], rank_col=rank_col, persist=persist)
