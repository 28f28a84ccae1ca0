"""Distributed order-insensitive table checksums — the cross-system
data-validation primitive for replicated pipelines: run the same
checksum over the source table and the exported copy (another engine,
another cluster, a rewritten layout) and compare ONE small row per
partition instead of the data. The integrity counterpart of the
reference's exporter acknowledgement contract (delivery is acked
per-batch, `exporterhelper/queue_sender.go`; content equality across
systems needs a content digest — this stage).

Row digest = the first 48 bits of ``md5`` over a canonical ``:``-joined
string of the checked columns; partition checksum = Σ digest **mod
2^64**, computed as plain ``uint64`` wrap-around addition. Wrap-add is
associative AND commutative, so per-block partials combine in any
order with zero coordination — one skinny exchange of
``(group, n, csum)`` rows no matter the table size, and re-sharding
the table never changes the result. Matches the DuckDB expression::

    sum(('0x' || substr(md5(s), 1, 12))::UBIGINT) % 2**64

bit-for-bit (the checksum is emitted as a DECIMAL STRING because the
mod-2^64 residue does not fit a signed BIGINT).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .bucketing import bucketed_map_groups

__all__ = ["table_checksum"]

_GROUP = "_cksum_group"


def table_checksum(ds: ray.data.Dataset, cols: list[str],
                   group_col: str | None = None, sep: str = ":",
                   n_buckets: int | str = "auto") -> ray.data.Dataset:
    """Per-``group_col`` (or whole-table) row count + content checksum
    over ``cols``. Only integer/string columns are accepted — float and
    timestamp rendering differs across engines; pre-format those to
    strings upstream. Null cells raise (SQL ``||`` would silently null
    the row out of the digest)."""
    if not cols:
        raise ValueError("table_checksum: cols must be non-empty")

    def partial(t: pa.Table) -> pa.Table:
        from ..functions.text import md5_hex

        parts = []
        for c in cols:
            col = t.column(c)
            if col.null_count:
                raise ValueError(f"table_checksum: column {c!r} has "
                                 "nulls — fill or drop them first")
            if not (pa.types.is_integer(col.type)
                    or pa.types.is_string(col.type)
                    or pa.types.is_large_string(col.type)):
                raise ValueError(
                    f"table_checksum: column {c!r} is {col.type} — only "
                    "integer/string render identically across engines; "
                    "pre-format it to a string")
            parts.append(col.cast(pa.string()).combine_chunks())
        canon = pc.binary_join_element_wise(*parts, sep)
        h = np.fromiter((int(x[:12], 16)
                         for x in md5_hex(canon).to_pylist()),
                        np.uint64, count=t.num_rows)
        if group_col is None:
            g = np.zeros(t.num_rows, np.int64)
            gvals = pa.array(["all"], pa.string())
        else:
            garr = t.column(group_col)
            if garr.null_count:
                raise ValueError(f"table_checksum: {group_col!r} has "
                                 "nulls")
            enc = pc.dictionary_encode(garr.combine_chunks())
            enc = (enc.combine_chunks() if isinstance(enc, pa.ChunkedArray)
                   else enc)
            g = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            gvals = enc.dictionary
        order = np.argsort(g, kind="stable")
        gs, hs = g[order], h[order]
        starts = np.flatnonzero(np.r_[True, gs[1:] != gs[:-1]]) \
            if len(gs) else np.array([], np.int64)
        if len(gs):
            csum = np.add.reduceat(hs, starts)  # uint64 wrap = mod 2^64
            n = np.diff(np.append(starts, len(gs)))
            keys = pc.take(gvals, pa.array(gs[starts], pa.int64()))
        else:
            csum = np.array([], np.uint64)
            n = np.array([], np.int64)
            keys = pa.array([], gvals.type)
        name = group_col or _GROUP
        return pa.table({name: keys,
                         "n": pa.array(n, pa.int64()),
                         "_csum": pa.array(csum, pa.uint64())})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    name = group_col or _GROUP

    def combine(t: pa.Table) -> pa.Table:
        g = t.column(name).to_numpy(zero_copy_only=False)
        order = np.argsort(g, kind="stable")
        cs = t.column("_csum").to_numpy(zero_copy_only=False)[order]
        ns = t.column("n").to_numpy(zero_copy_only=False)[order]
        gs = g[order]
        starts = np.flatnonzero(np.r_[True, gs[1:] != gs[:-1]])
        csum = np.add.reduceat(cs, starts)
        n = np.add.reduceat(ns, starts)
        out_keys = pa.array(gs[starts])
        return pa.table({
            name: out_keys,
            "n": pa.array(n, pa.int64()),
            "checksum": pa.array([str(int(v)) for v in csum],
                                 pa.string())})

    out = bucketed_map_groups(partials, name, combine,
                              n_buckets=n_buckets)
    if group_col is None:
        out = out.drop_columns([_GROUP])
    return out
