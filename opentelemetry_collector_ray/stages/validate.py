"""Data-quality expectation checks — the violations-table operator a
corpus ingest runs before training (Great-Expectations-shaped, Ray-Data
native).

``validate_rules`` evaluates declared expectations and emits one
``(rule, id)`` row per violating input row. Row-local rules (not_null /
in_range / in_set / matches) are one vectorized mask per batch — no
shuffle, no state. ``unique`` is the only distributed rule: rows
exchange ONCE by a hash bucket of the checked column (the repo's
bounded-group idiom), and every member of a duplicated value — all
occurrences, matching SQL's windowed ``count(*) OVER (PARTITION BY col)
> 1`` — is emitted from its bucket task. Empty result = contract holds.

All outputs are (string, int64) pairs so a DuckDB UNION-ALL oracle
hash-matches exactly.

Reference analog: the reference validates CONFIG shape
(confmap.Validate, component start-time checks) but has no data-plane
expectation operator; this is the data-shaped counterpart.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .bucketing import bucketed_map_groups

__all__ = ["validate_rules"]

_ROW_LOCAL = {"not_null", "in_range", "in_set", "matches"}


def validate_rules(ds: ray.data.Dataset, rules: dict[str, tuple],
                   id_col: str,
                   n_buckets: int | str = "auto") -> ray.data.Dataset:
    """Evaluate ``rules`` → Dataset (rule, id) of violations.

    Rule forms: ``("not_null", col)``, ``("in_range", col, lo, hi)``
    (inclusive bounds; nulls pass — compose with not_null),
    ``("in_set", col, values)``, ``("matches", col, regex)`` (full RE2
    match on a string column), ``("unique", col)``."""
    if not rules:
        raise ValueError("validate_rules: rules must be non-empty")
    local: dict[str, tuple] = {}
    uniques: dict[str, str] = {}
    for name, spec in rules.items():
        kind = spec[0]
        if kind in _ROW_LOCAL:
            local[name] = spec
        elif kind == "unique":
            uniques[name] = spec[1]
        else:
            raise ValueError(
                f"validate_rules: unknown rule kind {kind!r} in {name!r} "
                f"(supported: {sorted(_ROW_LOCAL | {'unique'})})")

    def empty() -> pa.Table:
        return pa.table({"rule": pa.array([], pa.string()),
                         "id": pa.array([], pa.int64())})

    parts = []
    if local:
        def check(t: pa.Table) -> pa.Table:
            outs = []
            for name, spec in local.items():
                kind, col = spec[0], t.column(spec[1])
                if kind == "not_null":
                    bad = pc.is_null(col)
                elif kind == "in_range":
                    lo, hi = spec[2], spec[3]
                    bad = pc.or_(pc.less(col, pa.scalar(lo)),
                                 pc.greater(col, pa.scalar(hi)))
                    bad = pc.fill_null(bad, False)  # nulls pass
                elif kind == "in_set":
                    bad = pc.invert(pc.fill_null(
                        pc.is_in(col, value_set=pa.array(list(spec[2]))),
                        False))
                    bad = pc.and_(bad, pc.is_valid(col))  # nulls pass
                else:  # matches
                    bad = pc.and_(pc.invert(pc.fill_null(
                        pc.match_substring_regex(
                            col, pattern=f"^(?:{spec[2]})$"), True)),
                        pc.is_valid(col))
                ids = t.column(id_col).filter(bad)
                outs.append(pa.table({
                    "rule": pa.array([name] * len(ids), pa.string()),
                    "id": ids.cast(pa.int64())}))
            return pa.concat_tables(outs) if outs else empty()

        parts.append(ds.map_batches(check, batch_format="pyarrow"))

    for name, col in uniques.items():
        def dup_ids(g: pa.Table, _col=col, _name=name) -> pa.Table:
            vals = g.column(_col)
            counts = vals.value_counts()
            dupd = counts.field("values").filter(
                pc.greater(counts.field("counts"), 1))
            bad = pc.is_in(vals, value_set=dupd)
            ids = g.column(id_col).filter(bad)
            return pa.table({
                "rule": pa.array([_name] * len(ids), pa.string()),
                "id": ids.cast(pa.int64())})

        sel = [id_col] if col == id_col else [id_col, col]
        parts.append(bucketed_map_groups(
            ds.select_columns(sel), col, dup_ids, n_buckets=n_buckets))

    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def sequence_gaps(ds: ray.data.Dataset, key: str, idx_col: str, *,
                  n_buckets: int | str = "auto") -> ray.data.Dataset:
    """Per-key sequence-completeness audit — the dropped-record detector
    a log pipeline runs when records carry a dense per-stream index
    (turn_idx, offset, sequence number): for each key, how many indices
    below the observed maximum are missing, and which is the FIRST gap?

    Output: one row per key — ``n_present``, ``max_idx``,
    ``n_missing = max_idx + 1 − n_present`` (indices assumed unique and
    0-based; duplicates are a different contract, use validate_rules'
    ``unique``), and ``first_gap`` (the smallest missing index; null
    when the prefix is complete).

    Scale shape: ONE hash-bucket exchange on ``key`` co-locates each
    stream, then every stream in a bucket resolves vectorized — sort by
    (key, idx), rank-within-segment via one global cumsum, and the
    first index≠rank mismatch per segment via one minimum.reduceat.
    The SQL mirror is ``min(rk) FILTER (WHERE idx > rk)`` over the
    rank window."""
    from .bucketing import key_segments

    def audit(t: pa.Table) -> pa.Table:
        e = pa.array([], pa.int64())
        if t.num_rows == 0:
            return pa.table({key: t.column(key).slice(0, 0),
                             "n_present": e, "max_idx": e,
                             "n_missing": e, "first_gap": e})
        t = t.sort_by([(key, "ascending"), (idx_col, "ascending")])
        keys = t.column(key).to_numpy(zero_copy_only=False)
        change, _ = key_segments(keys)
        starts = np.flatnonzero(change)
        idx = t.column(idx_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pos = np.arange(len(idx), dtype=np.int64)
        rank = pos - starts[np.cumsum(change) - 1]
        n = np.diff(np.append(starts, len(idx)))
        max_idx = idx[np.append(starts[1:] - 1, len(idx) - 1)]
        # first gap: min rank where idx > rank, per segment (sentinel
        # for complete prefixes)
        sent = np.int64(2 ** 62)
        cand = np.where(idx > rank, rank, sent)
        fg = np.minimum.reduceat(cand, starts)
        return pa.table({
            key: t.column(key).take(pa.array(starts)),
            "n_present": pa.array(n),
            "max_idx": pa.array(max_idx),
            "n_missing": pa.array(max_idx + 1 - n),
            "first_gap": pa.array(fg, mask=fg == sent)})

    return bucketed_map_groups(ds.select_columns([key, idx_col]), key,
                               audit, n_buckets=n_buckets)
