"""Cohort retention — the activation/retention matrix every product
analytics stack derives from an event stream: users grouped by the
period of their FIRST event (the cohort), counted as retained in each
later period they appear in.

Scale shape: two bounded exchanges over skinny rows —
1. per-user first-event period: the bucket idiom on the (unbounded)
   user key, one Arrow sort + segment-first per bucket; the SAME bucket
   pass also deduplicates (user, period) activity rows, so a user's
   million events reduce to their distinct active periods before
   anything wide happens;
2. (cohort_period, offset) counting: bounded keys (periods²/2) → the
   two-phase tree aggregate.
Users never land on the driver; only the final matrix does. Output is
one row per (cohort period, period offset) with the retained distinct
user count — exactly SQL's ``GROUP BY cohort, offset`` over
``min(ts) OVER (PARTITION BY user)``, so the oracle hash-matches.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .aggregate import grouped_count
from .bucketing import bucketed_map_groups, key_segments

__all__ = ["cohort_retention"]

_PERIOD_US = {"day": 86_400_000_000, "week": 604_800_000_000}


def cohort_retention(ds: ray.data.Dataset, user_col: str = "user_id",
                     ts_col: str = "ts", period: str = "week",
                     n_buckets: int | str = "auto") -> ray.data.Dataset:
    """Retention matrix: (``cohort_<period>`` — epoch-µs start of the
    user's first period, ``offset`` — whole periods since the cohort,
    ``n_users`` — distinct users from that cohort active at that
    offset). ``period`` is ``"day"`` or ``"week"`` (fixed-width epoch
    buckets, the cross-engine-stable choice — calendar weeks differ by
    locale)."""
    if period not in _PERIOD_US:
        raise ValueError(
            f"cohort_retention: period must be one of "
            f"{sorted(_PERIOD_US)}, got {period!r}")
    width = _PERIOD_US[period]

    def to_periods(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")),
                     pa.int64())
        p = pc.multiply(pc.divide(us, width), width)
        return pa.table({user_col: t.column(user_col), "_p": p})

    pre = ds.select_columns([user_col, ts_col]).map_batches(
        to_periods, batch_format="pyarrow")

    def per_user(t: pa.Table) -> pa.Table:
        # one sort: (user, period); segment starts give the cohort,
        # period-change rows give the distinct activity set
        t = t.sort_by([(user_col, "ascending"), ("_p", "ascending")])
        u = t.column(user_col).to_numpy(zero_copy_only=False)
        p = t.column("_p").to_numpy(zero_copy_only=False)
        change, seg_start = key_segments(u)
        cohort = p[seg_start]  # broadcast: first period of each user
        keep = change.copy()
        if len(p) > 1:
            keep[1:] |= p[1:] != p[:-1]
        off = (p[keep] - cohort[keep]) // width
        return pa.table({
            "cohort": pa.array(cohort[keep]),
            "offset": pa.array(off.astype(np.int64)),
        })

    pairs = bucketed_map_groups(pre, user_col, per_user,
                                n_buckets=n_buckets)
    out = grouped_count(pairs, ["cohort", "offset"],
                        count_name="n_users", strategy="tree")
    return out.map_batches(
        lambda t: t.rename_columns([f"cohort_{period}", "offset",
                                    "n_users"]),
        batch_format="pyarrow")
