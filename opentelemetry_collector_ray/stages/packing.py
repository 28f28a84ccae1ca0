"""Distributed ordered prefix sum and sequence packing — the
concat-then-chunk pattern LLM pretraining pipelines use to turn a
document corpus into fixed-size training sequences.

``ordered_prefix_sum`` is a two-phase distributed SCAN:

- pass 1 reduces each block to (min, max, sum) of the order/value columns
  — only this tiny per-block table reaches the driver (10^12 rows →
  #blocks rows);
- the driver sorts the stats by range start, VALIDATES that block ranges
  do not overlap (the range-partitioned-input contract: parquet written
  in order keeps it; a shuffled input fails loudly, never silently), and
  computes each block's exclusive base;
- pass 2 rebuilds the same plan, looks up each batch's base by its min
  order value (validated against the recorded ranges) and adds a local
  ``np.cumsum`` — one vectorized pass per block, no global sort.

``pack_chunks`` then assigns ``chunk_id = global_offset // capacity``:
documents are concatenated in order and sliced into capacity-token
chunks (chunks may span document boundaries — the standard pretraining
packing). ``pack_bins`` is the whole-document complement: next-fit bin
packing that never splits a document.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def _stats_fn(order_col: str, val_col: str):
    def fn(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_rows == 0:
            return pa.table({"_min": pa.array([], pa.int64()),
                             "_max": pa.array([], pa.int64()),
                             "_sum": pa.array([], pa.int64())})
        o = t.column(order_col)
        return pa.table({
            "_min": pa.array([pc.min(o).as_py()], pa.int64()),
            "_max": pa.array([pc.max(o).as_py()], pa.int64()),
            "_sum": pa.array([int(pc.sum(t.column(val_col)).as_py() or 0)],
                             pa.int64()),
        })
    return fn


def ordered_prefix_sum(make_ds, order_col: str, val_col: str,
                       out_col: str = "offset",
                       persist: str = "none") -> ray.data.Dataset:
    """Exclusive prefix sum of ``val_col`` in ``order_col`` order.

    ``make_ds`` is a ZERO-ARG CALLABLE returning the input Dataset — it
    is invoked twice so both passes execute the identical lazy plan
    (identical block boundaries). COST CONTRACT: with the default
    ``persist="none"`` the upstream plan EXECUTES TWICE — free for a
    bare parquet read, but for an expensive derived pipeline pass
    ``persist="memory"`` (materialize once, both passes share blocks) or
    ``persist=<dir>`` (write parquet once, both passes re-read — the
    resumable 100 TB choice). A non-deterministic upstream either fails
    the pass-2 range validation loudly (persist="none") or is executed
    exactly once (any persist mode).
    """
    from .bucketing import persisted_factory

    make_ds = persisted_factory(make_ds, persist)
    stats = make_ds().map_batches(
        _stats_fn(order_col, val_col), batch_size=None,
        batch_format="pyarrow").to_pandas()
    stats = stats.sort_values("_min").reset_index(drop=True)
    if len(stats) > 1:
        overlap = (stats["_min"].iloc[1:].to_numpy()
                   <= stats["_max"].iloc[:-1].to_numpy())
        if overlap.any():
            raise ValueError(
                "ordered_prefix_sum: block ranges overlap on "
                f"{order_col!r} — input is not range-partitioned in "
                "order; sort/repartition by the order column first")
    mins = stats["_min"].to_numpy()
    bases = np.concatenate([[0], np.cumsum(stats["_sum"].to_numpy())[:-1]])
    maxs = stats["_max"].to_numpy()
    base_of = {int(m): int(b) for m, b in zip(mins, bases)}
    max_of = {int(m): int(x) for m, x in zip(mins, maxs)}

    def add_offsets(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.nulls(0, pa.int64()))
        o = t.column(order_col).to_numpy(zero_copy_only=False)
        if len(o) > 1 and not bool((np.diff(o) >= 0).all()):
            raise ValueError(
                "ordered_prefix_sum: rows inside a block are not sorted "
                f"by {order_col!r} — sort the input by the order column "
                "first (offsets would be silently wrong)")
        lo, hi = int(o.min()), int(o.max())
        if lo not in base_of or hi > max_of[lo]:
            raise ValueError(
                "ordered_prefix_sum: pass-2 batch does not match a "
                "recorded pass-1 block range — the two executions "
                "produced different blocks; materialize the input or "
                "pass a deterministic make_ds")
        v = t.column(val_col).to_numpy(zero_copy_only=False).astype(np.int64)
        off = base_of[lo] + np.concatenate([[0], np.cumsum(v)[:-1]])
        return t.append_column(out_col, pa.array(off))

    return make_ds().map_batches(add_offsets, batch_size=None,
                                 batch_format="pyarrow")


def pack_chunks(make_ds, order_col: str, token_col: str,
                capacity: int, offset_col: str = "start_offset",
                chunk_col: str = "chunk_id",
                persist: str = "none") -> ray.data.Dataset:
    """Concat-then-chunk packing: global exclusive token offset per doc +
    ``chunk_id = offset // capacity``. ``persist`` forwards to
    ``ordered_prefix_sum`` (see its cost contract — the input plan runs
    twice unless persisted)."""
    import pyarrow.compute as pc

    ds = ordered_prefix_sum(make_ds, order_col, token_col,
                            out_col=offset_col, persist=persist)
    return ds.map_batches(
        lambda t: t.append_column(
            chunk_col, pc.cast(pc.divide(t.column(offset_col),
                                         pa.scalar(int(capacity))),
                               pa.int64())),
        batch_format="pyarrow")


def pack_bins(ds: ray.data.Dataset, token_col: str,
              capacity: int, bin_col: str = "bin_id") -> ray.data.Dataset:
    """Whole-document next-fit bin packing (the SFT-style complement to
    ``pack_chunks``): documents are assigned, in block order, to
    consecutive bins so that a bin's token sum never exceeds
    ``capacity``; a document larger than ``capacity`` gets a bin of its
    own. Documents are NEVER split (unlike chunk packing).

    Bins never span blocks — each block packs independently and bin ids
    are ``"<block-uuid>-<k>"`` strings, so the operator is embarrassingly
    parallel with zero exchange; the waste is at most one partial bin per
    block (negligible when blocks hold thousands of documents).

    Per-block cost is O(#bins · log #docs), not O(#docs) Python: the
    next-fit boundary after position i is ``searchsorted(cumsum,
    cumsum[i-1] + capacity)`` — one numpy call per BIN. Block ids are
    content-addressed (md5 over EVERY column's buffers, not just the
    token array — two blocks with byte-identical token arrays but
    different documents must NOT share bin ids, or bins silently merge
    across blocks and break the capacity contract), so reruns over the
    same blocking are deterministic."""
    import hashlib as _hashlib

    cap = int(capacity)

    def _block_id(t: pa.Table) -> str:
        h = _hashlib.md5()
        for col in t.combine_chunks().columns:
            for chunk in col.chunks:
                for buf in chunk.buffers():
                    if buf is not None:
                        h.update(buf)
        return h.hexdigest()[:12]

    def pack(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t.append_column(bin_col, pa.nulls(0, pa.string()))
        v = t.column(token_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cum = np.cumsum(v)
        bounds = [0]
        while bounds[-1] < n:
            start = bounds[-1]
            base = cum[start - 1] if start else 0
            # largest j with cum[j] - base <= cap; oversize doc → j=start
            j = int(np.searchsorted(cum, base + cap, side="right"))
            bounds.append(max(j, start + 1))
        block = _block_id(t)
        bins = np.zeros(n, np.int64)
        for k in range(len(bounds) - 1):
            bins[bounds[k]: bounds[k + 1]] = k
        ids = pa.array([f"{block}-{b}" for b in bins], pa.string())
        return t.append_column(bin_col, ids)

    return ds.map_batches(pack, batch_size=None, batch_format="pyarrow")


def chunk_sliding(ds: ray.data.Dataset, text_col: str = "text",
                  id_col: str = "doc_id", window: int = 256,
                  stride: int | None = None) -> ray.data.Dataset:
    """Per-document sliding-window chunking (the RAG/training-prep
    counterpart of concat-then-chunk packing): each document yields
    chunks starting at token 0, stride, 2·stride, … while the start is
    inside the document; a tail chunk is truncated to the remaining
    tokens. Output rows: (id_col, chunk_id, start_tok, n_tok).

    Embarrassingly parallel — no shuffle, no driver state: one
    tokenization pass per batch (the corpusstats ``[a-z]+`` rule so a
    DuckDB ``generate_series`` lateral oracle mirrors it exactly), then
    chunk rows are materialized with repeat/arange arithmetic. Zero-token
    documents emit nothing (same as the SQL lateral)."""
    from .corpusstats import _tokens_with_rows

    stride = int(stride or window)
    if window <= 0 or stride <= 0:
        raise ValueError("chunk_sliding: window and stride must be > 0")
    if stride > window:
        raise ValueError(
            f"chunk_sliding: stride={stride} > window={window} would skip "
            "tokens; use stride <= window")

    def chunks(t: pa.Table) -> pa.Table:
        _flat, rows = _tokens_with_rows(t.column(text_col))
        n_tok = np.bincount(rows, minlength=t.num_rows).astype(np.int64)
        n_chunks = np.where(n_tok > 0, (n_tok - 1) // stride + 1, 0)
        doc_idx = np.repeat(np.arange(t.num_rows), n_chunks)
        total = int(n_chunks.sum())
        # chunk ordinal within its doc: global arange minus each doc's base
        base = np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks)
        ordinal = np.arange(total) - base
        start = ordinal * stride
        size = np.minimum(window, n_tok[doc_idx] - start)
        return pa.table({
            id_col: t.column(id_col).take(pa.array(doc_idx)),
            "chunk_id": pa.array(ordinal),
            "start_tok": pa.array(start),
            "n_tok": pa.array(size)})

    return ds.select_columns([id_col, text_col]).map_batches(
        chunks, batch_format="pyarrow")


def tail_budget(ds: ray.data.Dataset, key: str, order_by: list[str],
                weight_col: str, budget: int,
                out_col: str = "suffix_w",
                n_buckets: int | str = "auto") -> ray.data.Dataset:
    """Context-window truncation (the chat-assembly step of every
    LLM serving/training pipeline): per ``key`` partition, keep the
    TRAILING rows in ``order_by`` order whose running ``weight_col``
    sum, accumulated from the END backward, stays within ``budget`` —
    exactly "fit the most recent turns into the model's context
    window". A row is kept iff its suffix-cumulative weight (itself
    included) is <= budget, so even the final row drops when it alone
    exceeds the budget (mirror: SQL reverse-ordered ROWS-frame SUM).

    Scale shape: ONE bucket exchange (``bucketed_map_groups``), then
    one sort per bucket (key asc, order desc) + one global cumsum
    rebased per segment — no Python per key. ``out_col`` carries the
    suffix sum for auditability. Weights must be non-negative ints
    (a negative weight breaks the monotone suffix sum and would make
    "fits in the window" order-dependent — rejected loudly)."""
    b = int(budget)
    if b < 0:
        raise ValueError("tail_budget: budget must be >= 0")
    sort_spec = [(key, "ascending")] + [(c, "descending")
                                        for c in order_by]

    def fn(t: pa.Table) -> pa.Table:
        from .bucketing import key_segments

        t = t.sort_by(sort_spec)
        keys = t.column(key).to_numpy(zero_copy_only=False)
        _change, seg_start = key_segments(keys)
        wc = t.column(weight_col)
        if wc.null_count:
            raise ValueError(
                f"tail_budget: weight column {weight_col!r} has nulls")
        w = wc.to_numpy(zero_copy_only=False)
        if w.dtype.kind not in "iu":
            raise ValueError(
                f"tail_budget: weight column {weight_col!r} must be "
                f"integer, got {w.dtype}")
        w = w.astype(np.int64)
        if len(w) and w.min() < 0:
            raise ValueError(
                "tail_budget: negative weights break the suffix sum")
        cum = np.cumsum(w)
        excl = cum - w                       # exclusive global prefix
        suffix = cum - excl[seg_start]       # inclusive within-segment
        t = t.append_column(out_col, pa.array(suffix))
        return t.filter(pa.array(suffix <= b))

    from .bucketing import bucketed_map_groups

    return bucketed_map_groups(ds, key, fn, n_buckets=n_buckets)
