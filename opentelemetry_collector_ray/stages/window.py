"""Per-key ordered window functions — lag / lead / delta / cumsum /
row_number / rolling_sum / rolling_count over a key partition in event
order, the SQL-window-function family a batch pipeline needs for
per-entity sequence features (previous event value, inter-event delta,
running totals, ordinal position, trailing-interval RANGE frames).

Scale shape: ONE bucket exchange (``bucketed_map_groups`` — never
``groupby(raw key)``), then every window op inside a bucket is a
vectorized pass over the (key, order)-sorted table using
``key_segments`` offsets: lag/lead are shifted views with segment-start
masking, cumsum is one global cumsum minus a segment-base gather,
row_number is ``arange - segment_start``, and the RANGE-frame rolling
ops are ONE global ``searchsorted`` over a segment-lifted composite
(each partition's order values rebased to its start, then lifted by
``segment_id * stride`` with ``stride > max_range + window`` so a
``value - window`` probe can never cross into the previous partition)
plus a prefix-sum gather. No Python per key or per row.

The collector has no window operator (batch fate of its streaming
deltatocumulative idea — ``stages/temporal.py`` is the single-op
special case); this generalizes the idiom used by sessionize/temporal
into the full family.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .bucketing import bucketed_map_groups, key_segments

_OPS = ("lag", "lead", "delta", "cumsum", "row_number", "rolling_sum",
        "rolling_count", "rank", "dense_rank", "ntile", "percent_rank",
        "cume_dist", "first_value", "last_value", "ffill",
        "moving_sum", "moving_count", "rolling_max", "rolling_min",
        "moving_max", "moving_min")


def _range_extreme(v: np.ndarray, lo: np.ndarray, pos: np.ndarray,
                   kind: str) -> np.ndarray:
    """Windowed max/min over inclusive per-row frames ``[lo[t], t]`` —
    the sparse-table (range-max query) construction: level j holds the
    extreme of the 2^j-window ending at each row, a frame of width w
    is the overlap of the two 2^floor(log2 w) windows ending at ``t``
    and at ``lo + 2^p − 1``. O(n log maxw) build, fully vectorized —
    no monotonic-deque scan, and per-row widths (RANGE frames,
    partition starts) come for free."""
    n = len(v)
    if n == 0:
        return v.copy()
    op = np.maximum if kind == "max" else np.minimum
    w = pos - lo + 1
    levels = max(1, int(w.max()).bit_length())
    table = np.empty((levels, n), dtype=v.dtype)
    table[0] = v
    for j in range(1, levels):
        d = 1 << (j - 1)
        table[j, :d] = table[j - 1, :d]
        table[j, d:] = op(table[j - 1, d:], table[j - 1, :-d])
    # exact floor(log2 w): frexp is exact for ints < 2^53
    p = (np.frexp(w.astype(np.float64))[1] - 1).astype(np.int64)
    return op(table[p, pos], table[p, lo + (1 << p) - 1])


def per_key_window(ds: ray.data.Dataset, key: str, order_by: list[str],
                   ops: dict[str, tuple],
                   n_buckets: int | str = "auto") -> ray.data.Dataset:
    """Append window columns per ``key`` partition ordered by
    ``order_by`` (use a unique tie-break column for determinism).

    ``ops`` maps output column → spec tuple:
      ``("lag", col)`` / ``("lead", col)`` — previous/next value in the
      partition (null at the edge); ``("lag", col, k)`` /
      ``("lead", col, k)`` — the value ``k`` rows back/ahead (SQL
      ``lag(col, k)``; null when the partition edge is nearer);
      ``("delta", col)`` — ``col - lag(col)`` (null on first row);
      ``("cumsum", col)`` — running total including the current row;
      ``("row_number",)`` — 0-based ordinal within the partition;
      ``("rank",)`` / ``("dense_rank",)`` — SQL RANK / DENSE_RANK
      (1-based; peers = rows equal on the FULL ``order_by`` tuple);
      ``("ntile", k)`` — SQL NTILE(k) (1-based; the first ``n % k``
      tiles get the extra row);
      ``("rolling_sum", col, window)`` / ``("rolling_count", window)``
      — value-range window over the FIRST order_by column: all rows of
      the partition whose order value lies in ``[cur - window, cur]``
      (both inclusive, ALL ties included) — SQL ``RANGE BETWEEN window
      PRECEDING AND CURRENT ROW`` semantics exactly. ``window`` is in
      the order column's units (microseconds for timestamps);
      ``("moving_sum", col, k)`` / ``("moving_count", k)`` — ROW-count
      window: the current row and the ``k`` rows before it within the
      partition (fewer near the partition start) — SQL ``ROWS BETWEEN
      k PRECEDING AND CURRENT ROW`` exactly (use a unique tie-break in
      ``order_by``: a ROWS frame cuts through order ties).
    Output rows are the input rows (order within blocks follows the
    bucket sort, not input order)."""
    rolling_requested = False
    for out, spec in ops.items():
        if not spec or spec[0] not in _OPS:
            raise ValueError(
                f"per_key_window: op {out!r} must start with one of "
                f"{_OPS}, got {spec!r}")
        if spec[0] in ("rolling_sum", "moving_sum", "rolling_max",
                       "rolling_min", "moving_max", "moving_min") \
                and len(spec) != 3:
            raise ValueError(
                f"per_key_window: {spec[0]} takes (col, window)")
        if spec[0] in ("rolling_count", "moving_count") \
                and len(spec) != 2:
            raise ValueError(
                f"per_key_window: {spec[0]} takes (window,)")
        if spec[0] == "ntile":
            if len(spec) != 2 or int(spec[1]) < 1:
                raise ValueError(
                    "per_key_window: ntile takes one tile count >= 1")
        elif spec[0] in ("rolling_sum", "rolling_count",
                         "rolling_max", "rolling_min"):
            rolling_requested = True
            if int(spec[-1]) < 0:
                raise ValueError("per_key_window: window must be >= 0")
        elif spec[0] in ("moving_sum", "moving_count", "moving_max",
                         "moving_min"):
            if int(spec[-1]) < 0:
                raise ValueError("per_key_window: window must be >= 0")
        elif spec[0] in ("row_number", "rank", "dense_rank",
                         "percent_rank", "cume_dist"):
            if len(spec) != 1:
                raise ValueError(
                    f"per_key_window: {spec[0]} takes no arguments")
        elif spec[0] in ("lag", "lead"):
            if len(spec) not in (2, 3) or \
                    (len(spec) == 3 and int(spec[2]) < 1):
                raise ValueError(
                    f"per_key_window: {spec[0]} takes (col) or "
                    "(col, offset >= 1)")
        elif len(spec) != 2:
            raise ValueError(
                f"per_key_window: {spec[0]} takes exactly one column")

    sort_spec = [(key, "ascending")] + [(c, "ascending")
                                        for c in order_by]
    windows = sorted({int(spec[-1]) for spec in ops.values()
                      if spec[0] in ("rolling_sum", "rolling_count",
                                     "rolling_max", "rolling_min")})

    def bucket_fn(t: pa.Table) -> pa.Table:
        t = t.sort_by(sort_spec)
        keys = t.column(key).to_numpy(zero_copy_only=False)
        change, seg_start = key_segments(keys)
        n = len(keys)
        pos = np.arange(n)
        hi = None
        lo_of: dict[int, np.ndarray] = {}
        run_start = None
        run_end = None
        if any(spec[0] in ("rank", "dense_rank", "percent_rank",
                           "cume_dist") for spec in ops.values()):
            # peer runs: rows equal on (key, *order_by); order_by
            # columns compared pairwise on the sorted table.
            run_change = change.copy()
            for c in order_by:
                oc_ = t.column(c)
                if oc_.null_count:
                    raise ValueError(
                        f"per_key_window: order column {c!r} has nulls "
                        "— SQL treats nulls as rank peers, the numpy "
                        "compare would not; fill or drop them first")
                cv = oc_.to_numpy(zero_copy_only=False)
                if cv.dtype.kind == "f" and np.isnan(cv).any():
                    raise ValueError(
                        f"per_key_window: order column {c!r} has NaNs "
                        "— NaN != NaN breaks rank peer detection; fill "
                        "or drop them first")
                if n > 1:
                    neq = cv[1:] != cv[:-1]
                    if neq.dtype != bool:  # NaN-propagating dtypes
                        neq = neq.astype(bool)
                    run_change[1:] |= neq
            run_starts = np.flatnonzero(run_change)
            run_of_row = np.repeat(
                np.arange(len(run_starts)),
                np.diff(np.append(run_starts, n)))
            run_start = run_starts[run_of_row] if n else pos
            # exclusive end of each peer run (for cume_dist: rows <= peers)
            run_end = (np.append(run_starts[1:], n)[run_of_row]
                       if n else pos)
            run_id = run_of_row
        lens = None
        if any(spec[0] in ("ntile", "percent_rank", "cume_dist",
                           "last_value") for spec in ops.values()):
            starts_nt = np.flatnonzero(change)
            seg_sizes = np.diff(np.append(starts_nt, n))
            lens = (np.repeat(seg_sizes, seg_sizes) if n
                    else np.zeros(0, np.int64))
        if rolling_requested:
            oc = t.column(order_by[0])
            if oc.null_count:
                raise ValueError(
                    f"per_key_window: rolling order column "
                    f"{order_by[0]!r} has nulls — a null has no frame")
            ov = oc.to_numpy(zero_copy_only=False)
            if ov.dtype.kind == "M":
                ov = ov.view("i8")
            elif ov.dtype.kind not in "iu":
                raise ValueError(
                    "per_key_window: rolling ops need an integer or "
                    f"timestamp order column, got {ov.dtype} "
                    f"for {order_by[0]!r}")
            ov = ov.astype(np.int64, copy=False)
            # One GLOBAL searchsorted for all segments: rebase each
            # segment to its own start, then lift segment s by s*stride
            # so the array is globally sorted and a query (value -
            # window) can never fall past the previous segment's lift.
            rel = ov - ov[seg_start] if n else ov
            seg_id = (np.cumsum(change) - 1) if n else np.zeros(0, np.int64)
            max_rel = int(rel.max()) if n else 0
            stride = max_rel + (windows[-1] if windows else 0) + 2
            n_seg = int(seg_id[-1]) + 1 if n else 0
            if n_seg and stride > (2 ** 62) // n_seg:
                raise ValueError(
                    "per_key_window: rolling composite would overflow "
                    f"int64 ({n_seg} partitions x order-range {max_rel});"
                    " rebase the order column (e.g. subtract a corpus "
                    "epoch) or shrink the window")
            comp = seg_id * stride + rel
            hi = np.searchsorted(comp, comp, side="right")
            for w in windows:
                lo_of[w] = np.searchsorted(comp, comp - w, side="left")
        for out, spec in ops.items():
            op = spec[0]
            if op == "row_number":
                t = t.append_column(
                    out, pa.array((pos - seg_start).astype(np.int64)))
                continue
            if op == "rank":
                t = t.append_column(out, pa.array(
                    (run_start - seg_start + 1).astype(np.int64)))
                continue
            if op == "percent_rank":
                # SQL: (rank - 1) / (n - 1); 0.0 for single-row
                # partitions — exact double division of small ints,
                # bit-identical across engines
                r0 = (run_start - seg_start).astype(np.float64)
                den = np.maximum(lens - 1, 1).astype(np.float64)
                t = t.append_column(out, pa.array(r0 / den))
                continue
            if op == "cume_dist":
                # SQL: (# rows <= current incl. peers) / n
                t = t.append_column(out, pa.array(
                    (run_end - seg_start).astype(np.float64)
                    / lens.astype(np.float64)))
                continue
            if op == "ffill":
                # LOCF (last observation carried forward) within the
                # partition — the gauge carry-forward; SQL mirror is
                # last_value(col IGNORE NULLS) with a ROWS UNBOUNDED
                # PRECEDING frame. Null-safe by construction: rows
                # before a partition's first non-null stay null.
                fc = t.column(spec[1])
                if isinstance(fc, pa.ChunkedArray):
                    fc = fc.combine_chunks()
                valid = pc.is_valid(fc).to_numpy(zero_copy_only=False)
                seg_id2 = (np.cumsum(change) - 1) if n else \
                    np.zeros(0, np.int64)
                # lift each segment so accumulate cannot cross keys:
                # within segment s values live in [s*(n+1), s*(n+1)+n]
                comp2 = seg_id2 * (n + 1) + np.where(valid, pos + 1, 0)
                acc2 = np.maximum.accumulate(comp2)
                last_pos = acc2 - seg_id2 * (n + 1) - 1
                none = last_pos < 0
                take_idx = pa.array(np.where(none, 0, last_pos),
                                    pa.int64())
                filled = fc.take(take_idx)
                if none.any():
                    filled = pc.if_else(pa.array(~none), filled,
                                        pa.scalar(None, fc.type))
                t = t.append_column(out, filled)
                continue
            if op == "first_value":
                fv = t.column(spec[1])
                if fv.null_count:
                    raise ValueError(
                        f"per_key_window: value column {spec[1]!r} has "
                        "nulls — first/last over nulls would be "
                        "silently wrong; fill or drop them first")
                vv = fv.to_numpy(zero_copy_only=False)
                t = t.append_column(out, pa.array(vv[seg_start], fv.type))
                continue
            if op == "last_value":
                # whole-partition frame (mirror with ROWS BETWEEN
                # UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING — the SQL
                # default frame would stop at the current peer run)
                fv = t.column(spec[1])
                if fv.null_count:
                    raise ValueError(
                        f"per_key_window: value column {spec[1]!r} has "
                        "nulls — first/last over nulls would be "
                        "silently wrong; fill or drop them first")
                vv = fv.to_numpy(zero_copy_only=False)
                seg_end = seg_start + lens - 1
                t = t.append_column(out, pa.array(vv[seg_end], fv.type))
                continue
            if op == "dense_rank":
                t = t.append_column(out, pa.array(
                    (run_id - run_id[seg_start] + 1).astype(np.int64)))
                continue
            if op == "ntile":
                k = int(spec[1])
                r = pos - seg_start
                q, m = lens // k, lens % k
                big = (q + 1) * m  # rows covered by the larger tiles
                tile = np.where(
                    r < big, r // np.maximum(q + 1, 1),
                    m + (r - big) // np.maximum(q, 1))
                t = t.append_column(
                    out, pa.array((tile + 1).astype(np.int64)))
                continue
            if op == "rolling_count":
                t = t.append_column(out, pa.array(
                    (hi - lo_of[int(spec[1])]).astype(np.int64)))
                continue
            if op == "moving_count":
                # ROWS frame: min(rows-before-me-in-partition, k) + 1
                t = t.append_column(out, pa.array(np.minimum(
                    pos - seg_start, int(spec[1])).astype(np.int64) + 1))
                continue
            col = t.column(spec[1])
            if col.null_count:
                raise ValueError(
                    f"per_key_window: value column {spec[1]!r} has "
                    "nulls — lag/delta/cumsum over nulls would be "
                    "silently wrong (numpy NaN coercion); fill or drop "
                    "them first")
            v = col.to_numpy(zero_copy_only=False)
            if op == "rolling_sum":
                if v.dtype.kind in "mM":
                    raise ValueError(
                        "per_key_window: rolling_sum over a temporal "
                        "column is undefined; delta it to numbers first")
                acc = v.astype(
                    np.int64 if v.dtype.kind in "iub" else np.float64)
                if acc.dtype.kind == "f" and np.isnan(acc).any():
                    # prefix sums would poison every later frame, not
                    # just frames containing the NaN row
                    raise ValueError(
                        f"per_key_window: value column {spec[1]!r} has "
                        "NaNs — rolling_sum via prefix sums would "
                        "corrupt later frames; fill or drop them first")
                prefix = np.concatenate([[acc.dtype.type(0)],
                                         np.cumsum(acc)])
                lo = lo_of[int(spec[2])]
                t = t.append_column(out, pa.array(prefix[hi] - prefix[lo]))
                continue
            if op == "moving_sum":
                if v.dtype.kind in "mM":
                    raise ValueError(
                        "per_key_window: moving_sum over a temporal "
                        "column is undefined; delta it to numbers first")
                acc = v.astype(
                    np.int64 if v.dtype.kind in "iub" else np.float64)
                if acc.dtype.kind == "f" and np.isnan(acc).any():
                    raise ValueError(
                        f"per_key_window: value column {spec[1]!r} has "
                        "NaNs — moving_sum via prefix sums would "
                        "corrupt later frames; fill or drop them first")
                prefix = np.concatenate([[acc.dtype.type(0)],
                                         np.cumsum(acc)])
                lo = np.maximum(seg_start, pos - int(spec[2]))
                t = t.append_column(
                    out, pa.array(prefix[pos + 1] - prefix[lo]))
                continue
            if op in ("rolling_max", "rolling_min", "moving_max",
                      "moving_min"):
                if v.dtype.kind not in "iuf" or (
                        v.dtype.kind == "f" and np.isnan(v).any()):
                    raise ValueError(
                        f"per_key_window: {op} needs a numeric NaN-free "
                        f"column, got {v.dtype} for {spec[1]!r}")
                ext = v.astype(
                    np.int64 if v.dtype.kind in "iub" else np.float64)
                if op.startswith("rolling"):
                    # RANGE frame = [lo, hi) row span: later order TIES
                    # belong to the frame too (SQL CURRENT ROW = peer
                    # group), so the window ends at hi - 1, not pos.
                    lo = lo_of[int(spec[2])]
                    end = hi - 1
                else:
                    lo = np.maximum(seg_start, pos - int(spec[2]))
                    end = pos
                t = t.append_column(out, pa.array(_range_extreme(
                    ext, lo, end, op[-3:])))
                continue
            if op in ("lag", "delta"):
                k_off = int(spec[2]) if (op == "lag" and len(spec) == 3) \
                    else 1
                lag = np.empty_like(v)
                if n > k_off:
                    lag[k_off:] = v[:-k_off]
                # no value k_off rows back within the partition
                mask = (pos - seg_start) < k_off
                if op == "lag":
                    t = t.append_column(
                        out, pa.array(lag, col.type, mask=mask))
                else:
                    d = v - (lag if n else v)
                    if d.dtype.kind == "m":  # temporal delta → int64
                        d = d.astype(np.int64)  # in the column's unit
                        typ = pa.int64()
                    else:
                        d = np.where(mask, 0, d)
                        typ = col.type
                    t = t.append_column(
                        out, pa.array(d, typ, mask=mask))
            elif op == "lead":
                k_off = int(spec[2]) if len(spec) == 3 else 1
                lead = np.empty_like(v)
                if n > k_off:
                    lead[:-k_off] = v[k_off:]
                mask = np.ones(n, bool)
                if n > k_off:
                    # valid iff the row k_off ahead is in my partition
                    mask[:-k_off] = seg_start[k_off:] != seg_start[:-k_off]
                t = t.append_column(
                    out, pa.array(lead, col.type, mask=mask))
            else:  # cumsum: global cumsum minus exclusive segment base
                if v.dtype.kind in "mM":
                    raise ValueError(
                        "per_key_window: cumsum over a temporal column "
                        "is undefined; delta it to numbers first")
                c = np.cumsum(v)
                base = np.where(seg_start > 0, c[seg_start - 1], 0)
                t = t.append_column(out, pa.array(c - base, col.type))
        return t

    return bucketed_map_groups(ds, key, bucket_fn, n_buckets=n_buckets)
