"""Categorical feature encoding — the preprocessing step between a
curated corpus and a trainer.

``label_encode`` maps a string/categorical column onto DENSE integer
ids. ``order="frequency"`` assigns id 0 to the most frequent value
(count DESC, value ASC tie-break) — the embedding-table layout that
puts hot rows first; ``order="lexical"`` sorts values. Exactly the SQL
``row_number() OVER (ORDER BY count(*) DESC, v) - 1`` mapping, so the
ids sit behind the DuckDB hash gate.

Scale shape: one shuffle grouped count reduces the corpus to its
distinct values (per-batch partials — unbounded keys safe), a loud
``max_categories`` count-before-pull guards the broadcast, the mapping
ships via ``ray.put`` once, and the encode pass is one ``pc.index_in``
per batch. Nulls encode to null (SQL join convention).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .aggregate import grouped_count
from .bucketing import persisted_factory

__all__ = ["label_encode"]


def label_encode(make_ds, col: str, out_col: str | None = None,
                 order: str = "frequency",
                 max_categories: int = 10_000_000,
                 persist: str = "none") -> ray.data.Dataset:
    """Append ``out_col`` (default ``{col}_id``): the dense id of each
    row's ``col`` value. Two passes over ``make_ds`` (the repo's
    two-pass factory contract; ``persist=`` forwards)."""
    if order not in ("frequency", "lexical"):
        raise ValueError(f"label_encode: order must be 'frequency' or "
                         f"'lexical', got {order!r}")
    out_col = out_col or f"{col}_id"
    f = persisted_factory(make_ds, persist)

    def drop_nulls(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t.column(col)))

    counts = grouped_count(
        f().select_columns([col]).map_batches(drop_nulls,
                                              batch_format="pyarrow"),
        [col], count_name="_n", strategy="shuffle").materialize()
    n_cat = counts.count()
    if n_cat > int(max_categories):
        raise ValueError(
            f"label_encode: {col!r} has {n_cat:,} categories "
            f"(> max_categories={int(max_categories):,}); the "
            "broadcast mapping would not fit a worker — hash-bucket "
            "the encode as a join instead")
    pdf = counts.to_pandas()
    if order == "frequency":
        pdf = pdf.sort_values(["_n", col],
                              ascending=[False, True],
                              kind="mergesort")
    else:
        pdf = pdf.sort_values(col, kind="mergesort")
    keys_ref = ray.put(pa.array(pdf[col]))

    def encode(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t.column(col), ray.get(keys_ref))
        return t.append_column(out_col, idx.cast(pa.int64()))

    return f().map_batches(encode, batch_format="pyarrow")
