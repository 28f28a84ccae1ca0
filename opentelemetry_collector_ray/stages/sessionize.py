"""Windowed / session aggregation over an ordered event stream.

The reference has no event-time windows (SURVEY.md §2.10 — the collector
is an at-arrival forwarder); in batch mode windowing is exact. Pattern
(Ray guide "streaming-shaped workloads"): treat the input as a partitioned
log — hash-partition by key, sort by ts within the group, window with
vectorized pandas inside ``map_groups``. The partitioning assumption is
explicit: all rows of one key fit one group task (salt/split by time range
if a single key exceeds worker memory).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data


N_SESSION_BUCKETS = 64


def _with_bucket(ds: ray.data.Dataset, key: str,
                 n_buckets: int = N_SESSION_BUCKETS) -> ray.data.Dataset:
    import pyarrow as pa

    from ..functions.hashing import bucket_of

    return ds.map_batches(
        lambda t: t.append_column("_bucket",
                                  pa.array(bucket_of(t.column(key), n_buckets))),
        batch_format="pyarrow")


def _assign_sessions(g: pd.DataFrame, key: str, ts_col: str,
                     order_cols: list[str], gap: pd.Timedelta) -> pd.DataFrame:
    """Vectorized session assignment for ALL keys in one hash bucket: sort
    by (key, order), new-session = key change OR gap exceeded, session_id =
    running new-session count rebased per key."""
    g = g.sort_values([key, *order_cols], kind="mergesort")
    key_change = g[key].ne(g[key].shift())
    new = key_change | (g[ts_col].diff() > gap)
    run = np.cumsum(new.to_numpy())
    first_of_key = pd.Series(run, index=g.index).where(key_change).ffill().to_numpy()
    g["session_id"] = (run - first_of_key).astype(np.int64)
    return g


def sessionize(events: ray.data.Dataset, key: str = "user_id", ts_col: str = "ts",
               order_cols: tuple[str, ...] = ("ts", "event_id"),
               gap: pd.Timedelta = pd.Timedelta(minutes=30)) -> ray.data.Dataset:
    """Gap-based session assignment: a new session starts when the time
    since the previous event of the same key exceeds ``gap``. Adds
    ``session_id`` (0-based per key, in ts order).

    Shuffle keys on hash(key) % 64 buckets — the map_groups unit is a
    bucket of many keys, processed in one vectorized pandas pass (no
    per-key Python)."""

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        return _assign_sessions(g, key, ts_col, list(order_cols), gap) \
            .drop(columns=["_bucket"])

    return _with_bucket(events, key).groupby("_bucket") \
        .map_groups(assign, batch_format="pandas")


def session_stats(events: ray.data.Dataset, key: str = "user_id",
                  ts_col: str = "ts", gap_minutes: int = 30) -> ray.data.Dataset:
    """Per (key, session): n_events, start_ts, end_ts — the windowed
    aggregate shape. Session assignment and the per-session reduce run in
    the SAME bucket task (one shuffle total, vectorized across all keys of
    the bucket)."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def assign_and_reduce(g: pd.DataFrame) -> pd.DataFrame:
        order = [ts_col, "event_id"] if "event_id" in g.columns else [ts_col]
        g = _assign_sessions(g, key, ts_col, order, gap)
        out = g.groupby([key, "session_id"], sort=True).agg(
            n_events=(ts_col, "size"), start_ts=(ts_col, "min"),
            end_ts=(ts_col, "max")).reset_index()
        return out[[key, "session_id", "n_events", "start_ts", "end_ts"]]

    return _with_bucket(events, key).groupby("_bucket") \
        .map_groups(assign_and_reduce, batch_format="pandas")


def tumbling_window_count(events: ray.data.Dataset, key: str, ts_col: str = "ts",
                          unit: str = "hour") -> ray.data.Dataset:
    """Tumbling event-time window counts — degenerates to the two-phase
    grouped count on (key, time-bucket), exact in batch."""
    import pyarrow.compute as pc

    from .aggregate import grouped_count

    with_bucket = events.map_batches(
        lambda t: t.append_column("bucket", pc.floor_temporal(t.column(ts_col),
                                                              unit=unit)),
        batch_format="pyarrow")
    return grouped_count(with_bucket.select_columns([key, "bucket"]),
                         [key, "bucket"], count_name="n_events")
