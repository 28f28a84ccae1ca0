"""Broadcast (map-side) hash join.

The collector has no relational join (SURVEY.md §2.4) — its join-like ops
are enrichment lookups against small side tables. The engine generalizes
that into a broadcast join stage: the small side is ``ray.put`` once,
fetched once per actor, and probed per batch with ``pc.index_in`` —
no shuffle ever touches the big side. For big-big joins use bucketed
``groupby`` + per-bucket merge (not needed by the reference surface).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data


class BroadcastJoinStage:
    """Inner/left join of each batch against a broadcast right table on one
    key column. Right-side duplicate keys must be unique (dimension-table
    contract — validated in __init__)."""

    def __init__(self, right: pa.Table | None = None, right_ref=None, *,
                 key: str, right_key: str | None = None,
                 columns: list[str] | None = None, how: str = "inner"):
        if right is None:
            import ray

            right = ray.get(right_ref)  # broadcast fetch, once per actor
        right_key = right_key or key
        if pc.count_distinct(right.column(right_key)).as_py() != right.num_rows:
            raise ValueError(f"broadcast right side has duplicate keys on {right_key}")
        self.key, self.how = key, how
        self.right_keys = right.column(right_key).combine_chunks()
        cols = columns or [c for c in right.column_names if c != right_key]
        self.right_cols = {c: right.column(c).combine_chunks() for c in cols}

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx = pc.index_in(batch.column(self.key), value_set=self.right_keys)
        if self.how == "inner":
            keep = idx.is_valid()
            batch = batch.filter(keep)
            idx = idx.filter(keep)
        for name, col in self.right_cols.items():
            batch = batch.append_column(name, pc.take(col, idx))
        return batch


def broadcast_join(ds: ray.data.Dataset, right: pa.Table, *, key: str,
                   right_key: str | None = None,
                   columns: list[str] | None = None, how: str = "inner",
                   concurrency=None) -> ray.data.Dataset:
    if concurrency:
        import ray

        ref = ray.put(right)
        return ds.map_batches(
            BroadcastJoinStage,
            fn_constructor_kwargs=dict(right_ref=ref, key=key, right_key=right_key,
                                       columns=columns, how=how),
            batch_format="pyarrow", concurrency=concurrency)
    return ds.map_batches(
        BroadcastJoinStage(right, key=key, right_key=right_key,
                           columns=columns, how=how),
        batch_format="pyarrow")
