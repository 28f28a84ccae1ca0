"""Aggregation-temporality conversion — the pmetric delta↔cumulative analog.

Reference: metric data carries ``AggregationTemporality`` (delta |
cumulative, ``/root/reference/pdata/pmetric/aggregation_temporality.go:
14-21``) and downstream components must convert/respect it. In batch mode
the conversion is an exact per-series ordered running sum: partition by
series key, order by time bucket, prefix-sum the deltas.

Execution shape: the per-series scan uses the hash-bucket map_groups
pattern (bounded group count, vectorized pandas groupby-cumsum inside) —
never one Python call per series.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..functions.hashing import bucket_of

N_BUCKETS = 64


def delta_to_cumulative(ds: ray.data.Dataset, key: str, order_col: str,
                        value_col: str, out_col: str = "cum",
                        n_buckets: int = N_BUCKETS) -> ray.data.Dataset:
    """Per-key ordered prefix sum: adds ``out_col`` = running total of
    ``value_col`` in ``order_col`` order within each ``key`` series."""

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("_bucket",
                               pa.array(bucket_of(t.column(key), n_buckets)))

    def cumsum(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, order_col], kind="mergesort")
        g[out_col] = g.groupby(key, sort=False)[value_col].cumsum() \
            .astype(np.int64 if g[value_col].dtype.kind == "i" else None)
        return g.drop(columns=["_bucket"])

    return ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("_bucket").map_groups(cumsum, batch_format="pandas")


def cumulative_to_delta(ds: ray.data.Dataset, key: str, order_col: str,
                        value_col: str, out_col: str = "delta",
                        n_buckets: int = N_BUCKETS) -> ray.data.Dataset:
    """Inverse conversion: per-key ordered difference (first point keeps its
    value — the series start resets, matching cumulative semantics)."""

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("_bucket",
                               pa.array(bucket_of(t.column(key), n_buckets)))

    def diff(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, order_col], kind="mergesort")
        prev = g.groupby(key, sort=False)[value_col].shift()
        g[out_col] = (g[value_col] - prev.fillna(0)).astype(g[value_col].dtype)
        return g.drop(columns=["_bucket"])

    return ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("_bucket").map_groups(diff, batch_format="pandas")
