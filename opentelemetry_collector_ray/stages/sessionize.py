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


def sessionize(events: ray.data.Dataset, key: str = "user_id", ts_col: str = "ts",
               order_cols: tuple[str, ...] = ("ts", "event_id"),
               gap: pd.Timedelta = pd.Timedelta(minutes=30)) -> ray.data.Dataset:
    """Gap-based session assignment: a new session starts when the time
    since the previous event of the same key exceeds ``gap``. Adds
    ``session_id`` (0-based per key, in ts order)."""

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(list(order_cols), kind="mergesort")
        new = (g[ts_col].diff() > gap) | g[ts_col].diff().isna()
        g["session_id"] = np.cumsum(new.to_numpy()) - 1
        return g

    return events.groupby(key).map_groups(assign, batch_format="pandas")


def session_stats(events: ray.data.Dataset, key: str = "user_id",
                  ts_col: str = "ts", gap_minutes: int = 30) -> ray.data.Dataset:
    """Per (key, session): n_events, start_ts, end_ts — the windowed
    aggregate shape. Session assignment and the per-session reduce run in
    the SAME map_groups task (one shuffle total)."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def assign_and_reduce(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, "event_id"] if "event_id" in g else [ts_col],
                          kind="mergesort")
        new = (g[ts_col].diff() > gap) | g[ts_col].diff().isna()
        g["session_id"] = np.cumsum(new.to_numpy()) - 1
        out = g.groupby("session_id", sort=True).agg(
            n_events=(ts_col, "size"), start_ts=(ts_col, "min"),
            end_ts=(ts_col, "max")).reset_index()
        out[key] = g[key].iloc[0]
        return out[[key, "session_id", "n_events", "start_ts", "end_ts"]]

    return events.groupby(key).map_groups(assign_and_reduce, batch_format="pandas")


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
