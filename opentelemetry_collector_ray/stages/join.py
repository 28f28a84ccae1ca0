"""Broadcast (map-side) hash join and distributed big-big shuffle join.

The collector has no relational join (SURVEY.md §2.4) — its join-like ops
are enrichment lookups against small side tables. The engine generalizes
that two ways:

- ``broadcast_join``: the small side is ``ray.put`` once, fetched once
  per actor, probed per batch with ``pc.index_in`` — no shuffle ever
  touches the big side. ALWAYS prefer this when one side fits a worker.
- ``shuffle_hash_join``: both sides big — ONE int-bucket exchange
  co-partitions both inputs by ``hash(key) % n_buckets`` (the same
  bucket idiom as every per-key op, stages/bucketing.py), then one
  vectorized Arrow hash join per bucket. Nothing materializes on the
  driver; bucket count scales with input bytes, so at 100 TB a bucket
  stays a ~task-sized unit. Skew caveat: a single hot KEY lands in one
  bucket by construction (that is what makes the join exact); salt hot
  keys upstream if one key's rows exceed a task.
"""

from __future__ import annotations

import numpy as np
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


_JOIN_TYPES = {"inner": "inner", "left": "left outer", "full": "full outer",
               "semi": "left semi", "anti": "left anti"}


def shuffle_hash_join(left: ray.data.Dataset, right: ray.data.Dataset, *,
                      key: str, right_key: str | None = None,
                      how: str = "inner",
                      n_buckets: int | str = "auto") -> ray.data.Dataset:
    """Distributed big-big equi-join: co-partition BOTH sides by
    ``hash(key) % n_buckets`` in one exchange, then one Arrow hash join
    per bucket (``pa.Table.join`` — vectorized, no Python per row).

    The two sides are tagged and unioned into one dataset with a null-
    padded superset schema (Arrow null columns are validity-bitmap-only,
    ~free to ship), so the exchange is a single ``groupby(_bucket)`` —
    Ray schedules one task per bucket, each seeing all rows of both sides
    whose key hashes there. ``how``: inner / left / full / semi / anti
    (semi and anti emit left columns only). Right payload columns that
    collide with left names get an ``_r`` suffix. The right key is cast
    to the left key's type before hashing so both sides co-partition.
    """
    from .bucketing import (adaptive_n_buckets, estimate_input_bytes,
                            with_hash_bucket)

    if how not in _JOIN_TYPES:
        raise ValueError(f"shuffle_hash_join: unknown how={how!r}; "
                         f"one of {sorted(_JOIN_TYPES)}")
    rk = right_key or key
    lschema = left.schema()
    rschema = right.schema()
    lnames = list(lschema.names)
    if key not in lnames:
        raise ValueError(f"left side has no key column {key!r}")
    if rk not in rschema.names:
        raise ValueError(f"right side has no key column {rk!r}")
    rbase = rschema.base_schema if hasattr(rschema, "base_schema") else rschema
    lbase = lschema.base_schema if hasattr(lschema, "base_schema") else lschema
    r_payload = [n for n in rschema.names if n != rk]
    rename = {n: (n + "_r" if n in lnames else n) for n in r_payload}
    out_fields = [(n, lbase.field(n).type) for n in lnames] + \
        [(rename[n], rbase.field(n).type) for n in r_payload]
    target = pa.schema(out_fields + [("_side", pa.int8())])

    def pad(side: int):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = []
            for name, typ in out_fields:
                if side == 0 and name in lnames:
                    cols.append(t.column(name).cast(typ))
                elif side == 1 and name == key:
                    cols.append(t.column(rk).cast(typ))
                elif side == 1 and name in rename.values():
                    src = next(s for s, d in rename.items() if d == name)
                    cols.append(t.column(src).cast(typ))
                else:
                    cols.append(pa.nulls(n, typ))
            cols.append(pa.array(np.full(n, side, np.int8)))
            return pa.Table.from_arrays(cols, schema=target)
        return fn

    unioned = left.map_batches(pad(0), batch_format="pyarrow").union(
        right.map_batches(pad(1), batch_format="pyarrow"))
    if n_buckets == "auto":
        nb = adaptive_n_buckets(
            (estimate_input_bytes(left) or 0)
            + (estimate_input_bytes(right) or 0) or None)
    else:
        nb = int(n_buckets)
    arrow_how = _JOIN_TYPES[how]
    right_cols = [rename[n] for n in r_payload]

    def bucket_join(t: pa.Table) -> pa.Table:
        side = t.column("_side")
        lt = t.filter(pc.equal(side, 0)).select(lnames)
        rt = t.filter(pc.equal(side, 1)).select([key] + right_cols)
        return lt.join(rt, keys=[key], right_keys=[key],
                       join_type=arrow_how)

    bucketed = with_hash_bucket(unioned, key, nb)
    return bucketed.groupby("_bucket").map_groups(
        lambda t: bucket_join(t.drop_columns(["_bucket"])),
        batch_format="pyarrow")
