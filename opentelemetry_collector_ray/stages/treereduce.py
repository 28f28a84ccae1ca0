"""One-summary tree reduce — the shared dataflow under every
mergeable-sketch builder (HLL / KLL / CMS / bloom): per-batch partial
rows → ``repartition(fanin)`` → merge → ``repartition(1)`` → merge →
exactly one row. Extracted so the fanin/batch_size/empty-input policy
lives in ONE place (each hand-rolled copy had independently re-decided
how to handle an empty input — Ray never invokes a map UDF on an empty
dataset, so ``take(1)`` comes back empty and must fall back to the
caller's identity element)."""

from __future__ import annotations

import ray.data


def tree_reduce_single(partials: ray.data.Dataset, merge_fn,
                       fanin: int = 8):
    """Reduce a dataset of mergeable partial rows to its single merged
    row (a dict), or ``None`` for an empty input — the caller supplies
    the identity element (zero registers / zero matrix / empty bloom),
    because only it knows the shape."""
    merged = partials.repartition(fanin).map_batches(
        merge_fn, batch_format="pyarrow", batch_size=None) \
        .repartition(1).map_batches(merge_fn, batch_format="pyarrow",
                                    batch_size=None)
    rows = merged.take(1)
    return rows[0] if rows else None
