"""Aggregation-temporality conversion — the pmetric delta↔cumulative analog.

Reference: metric data carries ``AggregationTemporality`` (delta |
cumulative, ``/root/reference/pdata/pmetric/aggregation_temporality.go:
14-21``) and downstream components must convert/respect it. In batch mode
the conversion is an exact per-series ordered running sum: partition by
series key, order by time bucket, prefix-sum the deltas.

Execution shape: the per-series scan uses the hash-bucket map_groups
pattern (bounded group count; ``Table.sort_by`` + numpy segment prefix
sums inside — no Arrow→pandas round trip, no per-series Python).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from .bucketing import bucketed_map_groups, key_segments

N_BUCKETS = 64


def _sorted_with_segments(t: pa.Table, key: str, order_col: str):
    t = t.sort_by([(key, "ascending"), (order_col, "ascending")])
    keys = t.column(key).to_numpy(zero_copy_only=False)
    change, seg_start = key_segments(keys)
    return t, change, seg_start


def delta_to_cumulative(ds: ray.data.Dataset, key: str, order_col: str,
                        value_col: str, out_col: str = "cum",
                        n_buckets: int | str = N_BUCKETS) -> ray.data.Dataset:
    """Per-key ordered prefix sum: adds ``out_col`` = running total of
    ``value_col`` in ``order_col`` order within each ``key`` series."""

    def cumsum(t: pa.Table) -> pa.Table:
        t, change, seg_start = _sorted_with_segments(t, key, order_col)
        vals = t.column(value_col).to_numpy(zero_copy_only=False)
        total = np.cumsum(vals)
        # per-key prefix sum = global cumsum minus the cumsum just before
        # each key's first row (exact for any sign, no forward-fill tricks)
        base = total[seg_start] - vals[seg_start]
        out = total - base
        if vals.dtype.kind == "i":
            out = out.astype(np.int64)
        return t.append_column(out_col, pa.array(out))

    return bucketed_map_groups(ds, key, cumsum, n_buckets=n_buckets)


def cumulative_to_delta(ds: ray.data.Dataset, key: str, order_col: str,
                        value_col: str, out_col: str = "delta",
                        n_buckets: int | str = N_BUCKETS) -> ray.data.Dataset:
    """Inverse conversion: per-key ordered difference (first point keeps its
    value — the series start resets, matching cumulative semantics)."""

    def diff(t: pa.Table) -> pa.Table:
        t, change, _ = _sorted_with_segments(t, key, order_col)
        vals = t.column(value_col).to_numpy(zero_copy_only=False)
        prev = np.empty_like(vals)
        if len(vals):
            prev[0] = 0
            prev[1:] = vals[:-1]
        out = np.where(change, vals, vals - prev).astype(vals.dtype)
        return t.append_column(out_col, pa.array(out))

    return bucketed_map_groups(ds, key, diff, n_buckets=n_buckets)
