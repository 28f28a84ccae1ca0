"""Feature scaling for training-data pipelines — two-pass min-max
normalization (global or per-key).

The canonical broadcast-statistics shape: pass 1 reduces the corpus to
one (min, max) row per key (mergeable partials — hot keys are
batch-salted by ``grouped_agg``'s shuffle strategy); the key→(min, max)
table is guarded by ``max_groups`` (count BEFORE driver pull, loud
failure like ``exact_global_quantile``) and broadcast via ``ray.put``;
pass 2 rescales every batch with ONE ``pc.index_in`` probe + numpy
gathers. ``make_ds`` is a factory because the input executes twice —
``persist=`` forwards to the shared two-pass machinery.

On an INTEGER column the output is exact integer arithmetic
(``(x − min) · scale // (max − min)``) so a DuckDB window oracle
(``min(x) OVER (PARTITION BY key)``) hash-matches; float columns work
but carry the usual cross-engine rounding caveat (rows-only gate).

Reference analog: no scaling processor exists in the reference
(metricstransform rescales by a CONSTANT factor); this is the
broadcast-statistics engine addition a feature pipeline needs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .aggregate import grouped_agg
from .bucketing import persisted_factory

__all__ = ["minmax_scale"]


def minmax_scale(make_ds, col: str, key: str | None = None,
                 scale: int = 1_000_000, out_col: str | None = None,
                 max_groups: int = 1_000_000,
                 persist: str = "none") -> ray.data.Dataset:
    """Scale ``col`` into [0, scale] per ``key`` group (or globally when
    ``key`` is None); appends ``out_col`` (default ``{col}_scaled``).
    Constant groups (min == max) scale to 0."""
    out_col = out_col or f"{col}_scaled"
    make_ds = persisted_factory(make_ds, persist)

    if key is None:
        from ray.data.aggregate import Max, Min

        row = make_ds().aggregate(Min(col, alias_name="_min"),
                                  Max(col, alias_name="_max"))
        keys_ref = None
        mins = np.asarray([row["_min"]])
        maxs = np.asarray([row["_max"]])
        stats_ref = ray.put((mins, maxs))
    else:
        stats = grouped_agg(make_ds().select_columns([key, col]), [key],
                            min_cols={"_min": col}, max_cols={"_max": col},
                            strategy="shuffle").materialize()
        n_groups = stats.count()
        if n_groups > int(max_groups):
            raise ValueError(
                f"minmax_scale: {key!r} has {n_groups:,} groups "
                f"(> max_groups={int(max_groups):,}); the broadcast "
                "stats table would not fit a worker. Raise max_groups "
                "or pre-bucket the key.")
        pdf = stats.to_pandas()
        keys_ref = ray.put(pa.array(pdf[key]))
        stats_ref = ray.put((pdf["_min"].to_numpy(), pdf["_max"].to_numpy()))

    def apply(t: pa.Table) -> pa.Table:
        mins, maxs = ray.get(stats_ref)
        x = t.column(col).to_numpy(zero_copy_only=False)
        if key is None:
            idx = np.zeros(len(x), np.intp)
        else:
            keys_arr = ray.get(keys_ref)
            idx_pa = pc.index_in(t.column(key), keys_arr)
            if idx_pa.null_count:
                raise ValueError(
                    "minmax_scale: pass 2 saw keys absent from pass 1 "
                    "stats — the input factory is not deterministic "
                    "across passes (use persist=)")
            idx = idx_pa.to_numpy(zero_copy_only=False).astype(np.intp)
        mn, mx = mins[idx], maxs[idx]
        span = mx - mn
        if np.issubdtype(x.dtype, np.integer):
            scaled = np.where(
                span > 0,
                (x.astype(np.int64) - mn) * np.int64(scale)
                // np.maximum(span, 1),
                0).astype(np.int64)
            arr = pa.array(scaled, pa.int64())
        else:
            scaled = np.where(span > 0, (x - mn) * float(scale)
                              / np.where(span > 0, span, 1.0), 0.0)
            arr = pa.array(scaled, pa.float64())
        return t.append_column(out_col, arr)

    return make_ds().map_batches(apply, batch_format="pyarrow")
