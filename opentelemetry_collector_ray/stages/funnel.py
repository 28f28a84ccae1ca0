"""Funnel / conversion analysis — per key, the timestamp of the first
occurrence of step 1, then the first occurrence of step 2 AT OR AFTER
it, and so on through an ordered step list: the "signup → activate →
purchase within the log" question every event pipeline gets asked.

Semantics are defined purely on the ORDER COLUMN (usually event time):
step ``j+1`` matches the earliest row of the partition whose step value
equals ``steps[j+1]`` and whose order value is ``>=`` the matched order
value of step ``j`` (ties allowed — two steps may share a timestamp,
matching the natural SQL nested ``min(ts) FILTER (ts >= prev)``
phrasing, which keeps the operator oracle-checkable).

Scale shape: ONE bucket exchange (``bucketed_map_groups`` — never
``groupby(raw key)``), then per bucket each step is resolved for ALL
partitions at once with numpy: sort by (key, order), build a
segment-lifted composite of the order values (the same idiom as
``stages/window.py`` rolling frames), take a per-segment SUFFIX MINIMUM
of "matching row position" via one reversed ``np.minimum.accumulate``
over lifted candidates, and gather it at each partition's
``searchsorted(prev_match_order)`` threshold. O(n log n) per bucket,
no Python per key, |steps| passes total.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from .bucketing import bucketed_map_groups, key_segments


def funnel(ds: ray.data.Dataset, key: str, order_col: str, step_col: str,
           steps: list[str], out_prefix: str = "ts_",
           completed_name: str = "steps_completed",
           n_buckets: int | str = "auto") -> ray.data.Dataset:
    """One output row per distinct ``key``: columns ``{out_prefix}{i}``
    (1-based; the order value at which step i first completed, null if
    never reached) and ``completed_name`` (int64 count of completed
    steps). ``steps`` values must be distinct; the order and step
    columns must be null-free (a null has no position in a funnel)."""
    if not steps:
        raise ValueError("funnel: need at least one step")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel: steps must be distinct, got {steps!r}")
    out_names = [f"{out_prefix}{i + 1}" for i in range(len(steps))]
    for c in (*out_names, completed_name):
        if c == key:
            raise ValueError(f"funnel: output column {c!r} collides "
                             "with the key column")

    # Only step rows can ever match or gate a threshold — pre-reduce
    # each block to its step rows plus ONE marker row per key before
    # the exchange, so non-step traffic (usually the vast majority)
    # never shuffles while every key still surfaces a
    # steps_completed=0 output row (the contract anchors on ALL keys).
    step_set = pa.array(steps)

    def prefilter(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        for c, what in ((order_col, "order"), (step_col, "step")):
            if t.column(c).null_count:
                raise ValueError(
                    f"funnel: {what} column {c!r} has nulls — drop or "
                    "fill them first")
        is_step = _pc.is_in(t.column(step_col), value_set=step_set) \
            .combine_chunks().to_numpy(zero_copy_only=False)
        codes = _pc.dictionary_encode(t.column(key)).combine_chunks() \
            .indices.to_numpy(zero_copy_only=False)
        keep = is_step.copy()
        _, first_idx = np.unique(codes, return_index=True)
        keep[first_idx] = True
        return t.filter(pa.array(keep))

    def bucket_fn(t: pa.Table) -> pa.Table:
        for c, what in ((order_col, "order"), (step_col, "step")):
            if t.column(c).null_count:
                raise ValueError(
                    f"funnel: {what} column {c!r} has nulls — drop or "
                    "fill them first")
        t = t.sort_by([(key, "ascending"), (order_col, "ascending")])
        keys = t.column(key).to_numpy(zero_copy_only=False)
        change, seg_start = key_segments(keys)
        n = len(keys)
        starts = np.flatnonzero(change)
        n_seg = len(starts)
        seg_end = np.append(starts[1:], n)
        seg_id = np.cumsum(change) - 1 if n else np.zeros(0, np.int64)

        oc = t.column(order_col)
        ov = oc.to_numpy(zero_copy_only=False)
        temporal = ov.dtype.kind == "M"
        if temporal:
            ov_i = ov.view("i8")
        elif ov.dtype.kind in "iu":
            ov_i = ov.astype(np.int64, copy=False)
        else:
            raise ValueError(
                "funnel: order column must be integer or timestamp, "
                f"got {ov.dtype}")
        # Segment-lifted composite (see stages/window.py): globally
        # sorted, probes can't cross partition boundaries.
        rel = ov_i - ov_i[seg_start] if n else ov_i
        max_rel = int(rel.max()) if n else 0
        stride = max_rel + 2
        if n_seg and stride > (2 ** 62) // max(n_seg, 1):
            raise ValueError(
                "funnel: order composite would overflow int64 "
                f"({n_seg} partitions x order-range {max_rel}); rebase "
                "the order column")
        comp = seg_id * stride + rel

        import pyarrow.compute as pc

        pos_rel = (np.arange(n) - seg_start) if n else np.zeros(0, np.int64)
        nomatch = n + 1  # > any relative position
        lift = seg_id * (nomatch + 1)

        # thr: per-segment absolute probe row, starts at the segment head.
        thr = starts.copy()
        alive = np.ones(n_seg, dtype=bool)
        reached = np.zeros((len(steps), n_seg), dtype=bool)
        step_vals = np.zeros((len(steps), n_seg), np.int64)
        for si, step in enumerate(steps):
            if n == 0 or not alive.any():
                break
            match = pc.equal(t.column(step_col), step).combine_chunks() \
                .to_numpy(zero_copy_only=False)
            cand = np.where(match, pos_rel, nomatch) + lift
            # suffix min within segment: one reversed accumulate over
            # the lifted candidates (a segment's own sentinel is still
            # smaller than any later segment's value, so the min never
            # leaks backwards across a boundary).
            suffix = np.minimum.accumulate(cand[::-1])[::-1]
            idx = np.minimum(thr, n - 1)
            ok = alive & (thr < seg_end)
            hit_rel = np.where(ok, suffix[idx] - lift[idx], nomatch)
            found = ok & (hit_rel < nomatch)
            abs_pos = np.where(found, starts + hit_rel, 0)
            step_vals[si] = ov_i[abs_pos]
            reached[si] = found
            alive = found
            # next step must be AT OR AFTER this match's order value:
            # threshold = first row of the segment with order >= match.
            nxt = np.searchsorted(comp, comp[abs_pos], side="left")
            thr = np.where(found, nxt, seg_end)

        # steps are sequential: completed = count of matched prefixes
        completed = reached.sum(axis=0) if n_seg else np.zeros(0, np.int64)
        cols: dict[str, object] = {
            key: t.column(key).take(pa.array(starts))}
        for si, name in enumerate(out_names):
            vals = np.ascontiguousarray(step_vals[si])
            mask = ~reached[si]
            if temporal:
                arr = pa.array(vals.view(ov.dtype), mask=mask)
            else:
                arr = pa.array(vals, oc.type, mask=mask)
            cols[name] = arr
        cols[completed_name] = pa.array(completed.astype(np.int64))
        return pa.table(cols)

    pre = ds.map_batches(prefilter, batch_format="pyarrow")
    return bucketed_map_groups(pre, key, bucket_fn, n_buckets=n_buckets)
