"""Dataset profiling — per-column exact statistics for data validation.

The pre-ingestion sanity check a training pipeline runs on a new corpus
drop: row count, null count and EXACT distinct count per column, all
integers so a DuckDB UNION-ALL oracle hash-matches. One streaming pass
produces the n/null partials (tree-combined, one row per column on the
driver); distinct counts ride the repo's shuffle-free two-phase
``count_distinct`` — one per profiled column, so profiling C columns
costs C distinct-merge trees (each bounded by that column's value
domain, per count_distinct's contract; profile only the columns you
need at 100 TB, or swap in the HLL sketch for the unbounded ones).

Reference analog: no profiler exists in the reference; nearest is the
obsreport counters (received/dropped per signal). This is the
table-shaped generalization.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from .aggregate import count_distinct

__all__ = ["profile_table"]


def profile_table(ds: ray.data.Dataset,
                  columns: list[str]) -> pa.Table:
    """Profile ``columns`` → pa.Table (column, n_rows, n_null,
    n_distinct), one row per column, ordered as given."""
    if not columns:
        raise ValueError("profile_table: columns must be non-empty")

    def partials(t: pa.Table) -> pa.Table:
        return pa.table({
            "column": pa.array(columns, pa.string()),
            "n_rows": pa.array([t.num_rows] * len(columns), pa.int64()),
            "n_null": pa.array([t.column(c).null_count for c in columns],
                               pa.int64())})

    def combine(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return t
        g = t.group_by(["column"], use_threads=False).aggregate(
            [("n_rows", "sum"), ("n_null", "sum")])
        return pa.table({"column": g.column("column"),
                         "n_rows": g.column("n_rows_sum"),
                         "n_null": g.column("n_null_sum")})

    base = ds.select_columns(columns).map_batches(
        partials, batch_format="pyarrow").repartition(16).map_batches(
        combine, batch_size=None, batch_format="pyarrow").repartition(
        1).map_batches(combine, batch_size=None,
                       batch_format="pyarrow").to_pandas()
    base = base.set_index("column")

    # SQL count(DISTINCT x) convention: nulls are NOT a distinct value
    # (Arrow's group_by gives nulls their own group — subtract it out)
    n_distinct = {
        c: int(count_distinct(ds.select_columns([c]), [c]).to_pandas()
               ["n_distinct"].iloc[0])
        - (1 if int(base.loc[c, "n_null"]) > 0 else 0)
        for c in columns}
    return pa.table({
        "column": pa.array(columns, pa.string()),
        "n_rows": pa.array([int(base.loc[c, "n_rows"]) for c in columns],
                           pa.int64()),
        "n_null": pa.array([int(base.loc[c, "n_null"]) for c in columns],
                           pa.int64()),
        "n_distinct": pa.array([n_distinct[c] for c in columns],
                               pa.int64())})
