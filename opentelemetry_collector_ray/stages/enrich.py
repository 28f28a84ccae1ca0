"""Enrichment stage: broadcast-dictionary lookups appending attribute columns.

Collector analog: the attributes/resource-enrichment processor family
(k8sattributes / resourcedetection pattern, named in
``/root/reference/docs/rfcs/processing.md:88-95``), whose surface is
``pcommon.Map`` mutation. The collector has **no relational join**
(SURVEY.md §2.4); enrichment is always a small side table — so here it is
a broadcast hash lookup inside ``map_batches``, never a shuffle join:
the dictionaries are ``ray.put`` once on the driver and fetched once per
actor in ``__init__``.

Three dictionary kinds (FIXTURES.md side inputs):
- exact-key maps (tool -> family/cost, role -> kind) via ``pc.index_in`` +
  ``take`` (pure Arrow, zero-copy);
- longest-prefix match (conv_id prefix -> tenant/env) via ordered
  ``pc.starts_with`` passes (k passes for k prefixes, k small).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Fixture dictionaries (FIXTURES.md): 12-entry tool dict, 4-entry role dict,
# prefix-matched resource dict.
TOOL_DICT: dict[str, tuple[str, str]] = {
    # tool -> (tool_family, tool_cost_class)
    "search": ("retrieval", "low"),
    "browser": ("retrieval", "medium"),
    "python": ("compute", "high"),
    "bash": ("compute", "medium"),
    "calculator": ("compute", "low"),
    "sql": ("data", "medium"),
    "retrieval": ("retrieval", "low"),
    "email": ("comm", "low"),
    "calendar": ("comm", "low"),
    "files": ("data", "low"),
    "translate": ("nlp", "medium"),
    "vision": ("nlp", "high"),
    # event-derived tool vocabulary (sources/transcripts.py)
    "click": ("ui", "low"),
    "purchase": ("commerce", "high"),
    "signup": ("account", "medium"),
    "error": ("diagnostics", "high"),
}
ROLE_DICT: dict[str, str] = {
    "user": "human",
    "assistant": "model",
    "system": "control",
    "tool": "machine",
}
# Ordered longest-prefix-first (resource-detection analog).
RESOURCE_PREFIXES: list[tuple[str, str, str]] = [
    ("conv-00000000", "tenant-zero", "prod"),
    ("conv-0000000", "tenant-small", "prod"),
    ("conv-000000", "tenant-mid", "staging"),
    ("conv-", "tenant-default", "dev"),
]


def _lookup_exact(col: pa.ChunkedArray, mapping: dict[str, tuple | str],
                  default: tuple | str) -> list[pa.Array]:
    """Vectorized dict lookup: index_in against the key vocabulary, then take
    from each value column (with a trailing default slot for misses)."""
    keys = pa.array(list(mapping.keys()), pa.string())
    idx = pc.index_in(col, value_set=keys)
    idx = pc.fill_null(idx, len(mapping))  # default slot
    vals = list(mapping.values())
    if vals and isinstance(vals[0], tuple):
        width = len(vals[0])
        outs = []
        for j in range(width):
            value_col = pa.array([v[j] for v in vals] + [default[j]], pa.string())
            outs.append(pc.take(value_col, idx))
        return outs
    value_col = pa.array(list(vals) + [default], pa.string())
    return [pc.take(value_col, idx)]


def _lookup_prefix(col: pa.ChunkedArray, prefixes: list[tuple[str, str, str]],
                   default: tuple[str, str] = ("tenant-unknown", "none"),
                   ) -> tuple[pa.Array, pa.Array]:
    n = len(col)
    tenant = np.full(n, default[0], dtype=object)
    env = np.full(n, default[1], dtype=object)
    claimed = np.zeros(n, dtype=bool)
    for pref, t, e in prefixes:  # ordered longest-first → first match wins
        m = pc.starts_with(col, pattern=pref).to_numpy(zero_copy_only=False)
        m = np.asarray(m, dtype=bool) & ~claimed
        tenant[m] = t
        env[m] = e
        claimed |= m
    return pa.array(tenant, pa.string()), pa.array(env, pa.string())


class EnrichStage:
    """Actor-pool stage: ``map_batches(EnrichStage, fn_constructor_kwargs=
    {"refs": refs}, batch_format="pyarrow", concurrency=N)``.

    ``refs`` is an optional dict of ``ray.ObjectRef`` for the three
    dictionaries (broadcast once via ``ray.put`` on the driver); when None
    the module-level fixtures are used (tests / small runs). Fetch happens
    once per actor in ``__init__`` — never per batch.
    """

    def __init__(self, refs: dict | None = None,
                 tool_col: str = "tool", role_col: str = "role",
                 conv_col: str = "conv_id"):
        if refs is not None:
            import ray

            self.tool_dict = ray.get(refs["tool_dict"])
            self.role_dict = ray.get(refs["role_dict"])
            self.resource_prefixes = ray.get(refs["resource_prefixes"])
        else:
            self.tool_dict = TOOL_DICT
            self.role_dict = ROLE_DICT
            self.resource_prefixes = RESOURCE_PREFIXES
        self.tool_col, self.role_col, self.conv_col = tool_col, role_col, conv_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        fam, cost = _lookup_exact(batch.column(self.tool_col), self.tool_dict,
                                  ("unknown", "unknown"))
        (kind,) = _lookup_exact(batch.column(self.role_col), self.role_dict, "unknown")
        tenant, env = _lookup_prefix(batch.column(self.conv_col), self.resource_prefixes)
        return (batch
                .append_column("tool_family", fam)
                .append_column("tool_cost_class", cost)
                .append_column("role_kind", kind)
                .append_column("tenant", tenant)
                .append_column("env", env))


def broadcast_dicts(tool_dict=None, role_dict=None, resource_prefixes=None) -> dict:
    """``ray.put`` the dictionaries once; pass the returned refs to
    EnrichStage via fn_constructor_kwargs so every actor reads the same
    object-store copy (no per-batch reshipping)."""
    import ray

    return {
        "tool_dict": ray.put(tool_dict or TOOL_DICT),
        "role_dict": ray.put(role_dict or ROLE_DICT),
        "resource_prefixes": ray.put(resource_prefixes or RESOURCE_PREFIXES),
    }


def range_lookup(ds: ray.data.Dataset, col: str, breaks, labels,
                 out_col: str | None = None) -> ray.data.Dataset:
    """Broadcast RANGE-table enrichment: map a numeric column onto
    labeled half-open bins ``[breaks[i], breaks[i+1])`` — the IP-block
    / price-band / latency-SLO lookup pattern (the reference's analog
    is a chained OTTL set(...) where; at scale a CASE chain per row is
    wrong, one ``np.searchsorted`` per batch is right).

    ``len(labels) == len(breaks) + 1``: ``labels[0]`` covers
    ``(-inf, breaks[0])``, ``labels[i]`` covers
    ``[breaks[i-1], breaks[i])``, ``labels[-1]`` covers
    ``[breaks[-1], inf)``. Breaks must be strictly increasing (loud
    check, once). The tiny table ships inside the closure — one
    ``ray.put`` under the hood via Ray's argument store."""
    breaks_arr = np.asarray(breaks)
    if len(breaks_arr) == 0:
        raise ValueError("range_lookup: breaks must be non-empty")
    if not (np.diff(breaks_arr) > 0).all():
        raise ValueError("range_lookup: breaks must be strictly "
                         "increasing")
    if len(labels) != len(breaks_arr) + 1:
        raise ValueError(
            f"range_lookup: need len(breaks)+1 labels, got "
            f"{len(labels)} labels for {len(breaks_arr)} breaks")
    labels_pa = pa.array([str(x) for x in labels], pa.string())
    out_col = out_col or f"{col}_band"

    def apply(t: pa.Table) -> pa.Table:
        x = t.column(col)
        if x.null_count:
            raise ValueError(
                f"range_lookup: {col!r} has nulls — a null has no "
                "band; fill or drop them first")
        v = x.to_numpy(zero_copy_only=False)
        idx = np.searchsorted(breaks_arr, v, side="right")
        return t.append_column(
            out_col, labels_pa.take(pa.array(idx, pa.int64())))

    return ds.map_batches(apply, batch_format="pyarrow")
