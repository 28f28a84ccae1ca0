"""Privacy-preserving release operators — the anonymity layer between a
curated dataset and publication, extending the scrubbing family
(``functions/redact.py`` masks values INSIDE a row; these suppress rows
whose mere combination of quasi-identifiers re-identifies someone).

``k_anonymize`` implements suppression-based k-anonymity (Sweeney 2002):
a row survives only if at least ``k`` rows share its full
quasi-identifier tuple. With ``sensitive_col``/``l`` it additionally
enforces distinct l-diversity (Machanavajjhala et al. 2007): the
surviving group must contain at least ``l`` DISTINCT sensitive values,
so a group that is large but homogeneous (everyone in it has the same
diagnosis) is still suppressed.

Scale shape: group sizes come from the shuffle-partial grouped count
(unbounded quasi-identifier domains — per-batch partials bound the
exchange, batch-index-as-salt neutralizes hot groups), l-diversity from
the exact two-phase ``grouped_count_distinct``; the two per-group tables
join on the quasi columns and the verdict joins back to the rows with
one composite-key SEMI join — fixed-width group rows are the only extra
exchange currency, raw rows move once.

Null discipline: Arrow's hash join drops null keys while SQL's window
``count(*) OVER (PARTITION BY ...)`` groups nulls together — the same
row set would silently diverge. Quasi columns must therefore be
null-free; the stage raises loudly instead of guessing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

__all__ = ["k_anonymize", "dp_count_release"]


def k_anonymize(ds: ray.data.Dataset, quasi_cols: list[str], k: int, *,
                sensitive_col: str | None = None, l: int | None = None,
                n_buckets: int | str = "auto", mode: str = "join",
                max_broadcast_groups: int = 2_000_000
                ) -> ray.data.Dataset:
    """Keep only rows whose quasi-identifier group has ≥ ``k`` members
    (and, when ``sensitive_col``/``l`` are given, ≥ ``l`` distinct
    sensitive values). Output schema = input schema; row order follows
    the exchange.

    ``mode="join"`` (default) co-partitions rows and verdicts — correct
    for UNBOUNDED quasi domains. ``mode="broadcast"`` is the bounded-
    domain fast path (a banded quasi tuple usually is): the surviving
    group table is pulled once (guarded loudly by
    ``max_broadcast_groups`` with a count-before-pull), ``ray.put``
    once, and each batch keeps its rows with one vectorized Arrow
    LEFT-SEMI join against the broadcast table — the raw rows never
    shuffle (measured 20.6 s → ~2 s on 2M rows × ~2k groups)."""
    import ray

    from .aggregate import grouped_count, grouped_count_distinct
    from .join import shuffle_hash_join

    if mode not in ("join", "broadcast"):
        raise ValueError(f"k_anonymize: unknown mode={mode!r}")

    if k < 1:
        raise ValueError("k_anonymize: k must be >= 1")
    if (sensitive_col is None) != (l is None):
        raise ValueError("k_anonymize: sensitive_col and l go together")
    if l is not None and l < 1:
        raise ValueError("k_anonymize: l must be >= 1")
    quasi = list(quasi_cols)
    if not quasi:
        raise ValueError("k_anonymize: quasi_cols must be non-empty")

    def check_nulls(t: pa.Table) -> pa.Table:
        for c in quasi:
            if t.column(c).null_count:
                raise ValueError(
                    f"k_anonymize: quasi column {c!r} has nulls — SQL "
                    "groups nulls together, the join would drop them; "
                    "fill or drop nulls first")
        return t

    checked = ds.map_batches(check_nulls, batch_format="pyarrow")
    groups = grouped_count(checked.select_columns(quasi), quasi,
                           count_name="_gn", strategy="shuffle")
    ok = groups.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("_gn"), k)),
        batch_format="pyarrow")
    if sensitive_col is not None:
        div = grouped_count_distinct(checked, quasi, sensitive_col,
                                     out_name="_gl",
                                     final_strategy="shuffle")
        div_ok = div.map_batches(
            lambda t: t.filter(pc.greater_equal(t.column("_gl"), l)),
            batch_format="pyarrow")
        ok = shuffle_hash_join(ok, div_ok, key=quasi, how="semi",
                               n_buckets=n_buckets)
    if mode == "broadcast":
        okm = ok.materialize()
        n_groups = okm.count()
        if n_groups > max_broadcast_groups:
            raise ValueError(
                f"k_anonymize: {n_groups} surviving groups exceed "
                f"max_broadcast_groups={max_broadcast_groups} — use "
                "mode='join' for unbounded quasi domains")
        # Blocks may carry helper columns (the l-diversity lane's _gn)
        # or be empty with a bare schema — project per block, skip
        # empties, and fall back to the materialized schema when every
        # block is empty.
        parts = [t.select(quasi) for t in ray.get(okm.to_arrow_refs())
                 if t.num_rows]
        if parts:
            ok_tbl = pa.concat_tables(parts).combine_chunks()
        else:
            ok_tbl = pa.schema(
                [okm.schema().base_schema.field(c) for c in quasi]
            ).empty_table()
        ref = ray.put(ok_tbl)

        def keep(t: pa.Table) -> pa.Table:
            return t.join(ray.get(ref), keys=quasi,
                          join_type="left semi")

        return checked.map_batches(keep, batch_format="pyarrow")
    return shuffle_hash_join(checked, ok, key=quasi, how="semi",
                             n_buckets=n_buckets)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer — the standard public-domain 64-bit mixer
    (Steele et al. 2014); full avalanche, so per-group noise draws are
    independent even for adjacent key hashes."""
    with np.errstate(over="ignore"):
        x = x + np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def dp_count_release(ds: ray.data.Dataset, keys: list[str], *,
                     epsilon: float, seed: int,
                     count_name: str = "n",
                     suppress_below: int | None = None,
                     strategy: str = "shuffle"
                     ) -> ray.data.Dataset:
    """ε-differentially-private group-count release (Dwork et al. 2006
    Laplace mechanism): exact per-key counts get Laplace(1/ε) noise —
    count queries have L1 sensitivity 1 — rounded half-even to an
    integer, optionally suppressing released groups whose NOISY count
    falls below ``suppress_below`` (noisy thresholding; the decision
    consumes no extra budget because it reads only the released value).
    The third rung of the release ladder after ``k_anonymize``'s
    suppression and l-diversity: protects the aggregate itself, not
    just the microdata.

    Determinism: the noise draw is a pure function of (key tuple,
    ``seed``) — a SplitMix64-mixed composite key hash feeds the inverse
    Laplace CDF — so a release is reproducible (and testable) given its
    seed, and identical across retries/re-executions of the task (a
    stateful RNG would break Ray's re-execution semantics). Publishing
    multiple releases of the SAME data with different seeds composes
    ε-additively — rotate data, not seeds.

    Scale shape: the exact counts come from the two-phase partials
    (unbounded keys, ``strategy="shuffle"``); noise is one vectorized
    map over the skinny count rows. Output: keys + noisy ``count_name``
    (int64)."""
    from .aggregate import grouped_count
    from .join import _composite_hash

    if epsilon <= 0:
        raise ValueError("dp_count_release: epsilon must be positive")
    b = 1.0 / float(epsilon)
    seed64 = np.uint64(seed & 0xFFFFFFFFFFFFFFFF)

    counts = grouped_count(ds.select_columns(keys), keys,
                           count_name=count_name, strategy=strategy)

    def add_noise(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        h = _splitmix64(_composite_hash(t, keys) ^ seed64)
        # u ∈ (-0.5, 0.5) strictly: (h + 0.5) / 2^64 ∈ (0, 1).
        u = (h.astype(np.float64) + 0.5) / 18446744073709551616.0 - 0.5
        noise = -b * np.sign(u) * np.log1p(-2.0 * np.abs(u))
        n = t.column(count_name).to_numpy(zero_copy_only=False)
        released = np.asarray(
            np.rint(n.astype(np.float64) + noise), dtype=np.int64)
        out = t.set_column(t.schema.get_field_index(count_name),
                           count_name, pa.array(released))
        if suppress_below is not None:
            out = out.filter(pc.greater_equal(
                out.column(count_name), suppress_below))
        return out

    return counts.map_batches(add_noise, batch_format="pyarrow")
