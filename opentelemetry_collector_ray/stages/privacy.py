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

__all__ = ["k_anonymize", "dp_count_release", "t_closeness",
           "l_diversity"]


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


def t_closeness(ds: ray.data.Dataset, group_col: str, sensitive_col: str,
                *, max_grid: int = 10_000, n_buckets: int | str = "auto"
                ) -> ray.data.Dataset:
    """t-closeness audit (Li et al. 2007) — the third rung of the
    release ladder after :func:`k_anonymize`'s suppression/l-diversity
    and before :func:`dp_count_release`: a quasi-identifier group leaks
    when its SENSITIVE-VALUE DISTRIBUTION sits far from the corpus
    distribution, even if the group is large and diverse. Distance is
    Wasserstein-1 over the ordered sensitive domain (the metric the
    paper recommends for numeric attributes), emitted as EXACT integer
    lanes: per group ``w1_num = Σ_i |N·cumG(v_i) − n_g·cumA(v_i)|·Δv_i``
    over the corpus's sorted distinct sensitive values, so
    ``W1 = w1_num / (n_g·N)`` and the release rule "suppress when
    W1 > t = num/den" is the integer inequality
    ``w1_num·den > num·n_g·N`` — no floats anywhere, the drift panel's
    W1 lane discipline applied per group.

    Output: one row per group — ``group_col``, ``n_g`` (group size),
    ``n_total`` (corpus size, constant), ``w1_num``.

    ``sensitive_col`` must be integer (band/bucket it first — cents,
    deciles; the value domain is the grid and is ``count()``-guarded by
    ``max_grid`` BEFORE the driver pull). Groups are unbounded: the
    (group, value) count rows ride one shuffle-partial grouped count,
    then one hash-bucket exchange by group; inside a bucket every
    group's cum-curve evaluates at once on a dense (groups × grid)
    scatter + axis cumsum — no Python per group. Magnitude is guarded
    loudly: ``N · max(n_g) · value-range`` must fit int64 (at 10^12
    rows, band the domain and audit per partition instead)."""
    import ray

    from .aggregate import grouped_count
    from .bucketing import bucketed_map_groups, key_segments

    def check(t: pa.Table) -> pa.Table:
        for c in (group_col, sensitive_col):
            if t.column(c).null_count:
                raise ValueError(
                    f"t_closeness: column {c!r} has nulls — SQL groups "
                    "nulls, the exchange would drop them; fill or drop "
                    "nulls first")
        st = t.column(sensitive_col)
        if not pa.types.is_integer(st.type):
            raise TypeError(
                f"t_closeness: {sensitive_col!r} must be integer "
                f"(got {st.type}); band the domain first")
        return t

    checked = ds.select_columns([group_col, sensitive_col]).map_batches(
        check, batch_format="pyarrow")
    gv = grouped_count(checked, [group_col, sensitive_col],
                       count_name="_c", strategy="shuffle").materialize()
    # corpus grid: global per-value counts — bounded by the (banded)
    # value domain, guarded BEFORE the pull
    grid_ds = grouped_count(
        gv.select_columns([sensitive_col, "_c"]),
        [sensitive_col], count_name="_n", sum_cols={"_ca": "_c"},
        strategy="shuffle").materialize()
    m = grid_ds.count()
    if m > int(max_grid):
        raise ValueError(
            f"t_closeness: {m:,} distinct sensitive values exceed "
            f"max_grid={int(max_grid):,} — band the domain first")
    parts = [ray.get(r) for r in grid_ds.to_arrow_refs()]
    parts = [t for t in parts if t.num_rows]
    if parts:
        gt = pa.concat_tables(parts).sort_by(
            [(sensitive_col, "ascending")])
        grid = gt.column(sensitive_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cum_a = np.cumsum(gt.column("_ca").to_numpy(zero_copy_only=False)
                          .astype(np.int64))
    else:
        grid = np.zeros(0, np.int64)
        cum_a = np.zeros(0, np.int64)
    n_total = int(cum_a[-1]) if len(cum_a) else 0
    dv = np.zeros(len(grid), np.int64)
    if len(grid) > 1:
        dv[:-1] = np.diff(grid)
    # loud int64 magnitude guard: the largest |N·cumG − n_g·cumA| is
    # ≤ N·n_g ≤ N²; summed over the grid it is bounded by N²·range
    rng = int(grid[-1] - grid[0]) if len(grid) > 1 else 1
    if n_total and rng and n_total > (2 ** 62) // max(n_total * rng, 1):
        raise ValueError(
            "t_closeness: w1_num would overflow int64 "
            f"(N={n_total:,} × range={rng:,}); band the sensitive "
            "domain or audit per partition")
    ref = ray.put((grid, cum_a, dv, n_total))

    def audit(t: pa.Table) -> pa.Table:
        grid_v, cumA, dv_v, N = ray.get(ref)
        if t.num_rows == 0 or len(grid_v) == 0:
            e = pa.array([], pa.int64())
            return pa.table({group_col: t.column(group_col).slice(0, 0),
                             "n_g": e, "n_total": e, "w1_num": e})
        t = t.sort_by([(group_col, "ascending"),
                       (sensitive_col, "ascending")])
        keys = t.column(group_col).to_numpy(zero_copy_only=False)
        change, _ = key_segments(keys)
        starts = np.flatnonzero(change)
        g_of_row = np.cumsum(change) - 1
        n_groups = len(starts)
        mm = len(grid_v)
        if n_groups * mm > 100_000_000:
            raise ValueError(
                f"t_closeness: {n_groups:,} groups × {mm:,} grid values "
                "in one bucket task — raise n_buckets or band harder")
        vals = t.column(sensitive_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cnts = t.column("_c").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        col = np.searchsorted(grid_v, vals)  # exact: vals ⊆ grid
        dense = np.zeros((n_groups, mm), np.int64)
        dense[g_of_row, col] = cnts
        cum_g = np.cumsum(dense, axis=1)
        n_g = cum_g[:, -1]
        w1 = np.abs(N * cum_g - n_g[:, None] * cumA[None, :]) @ dv_v
        return pa.table({
            group_col: t.column(group_col).take(pa.array(starts)),
            "n_g": pa.array(n_g),
            "n_total": pa.array(np.full(n_groups, N, np.int64)),
            "w1_num": pa.array(w1.astype(np.int64))})

    return bucketed_map_groups(gv, group_col, audit, n_buckets=n_buckets)


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


def l_diversity(ds: ray.data.Dataset, quasi_cols: list[str],
                sensitive_col: str, l: int) -> ray.data.Dataset:
    """l-diversity audit — the rung between k-anonymity and
    t-closeness (Machanavajjhala et al. 2007): a quasi-identifier
    group is l-diverse when it contains ≥ ``l`` DISTINCT sensitive
    values, so an attacker who locates a group still can't infer the
    sensitive attribute. Emits per group the row count, the exact
    distinct-sensitive count, a truncating diversity ratio permille
    and the ``is_diverse`` flag.

    Distribution shape: per-batch Arrow group-by partials (one
    (quasi…, sensitive, c) row per pair per batch) → ONE hash-bucket
    exchange on ``quasi_cols[0]`` → a single vectorized pass per
    bucket reads BOTH lanes (Σc per quasi group = row count;
    first-occurrence mask over the sorted pairs = distinct count) —
    no join, no sort aggregate; the first cut (two chained two-phase
    counts + a hash join) measured 3.8 s vs 0.2 s on sf0.1."""
    if l < 1:
        raise ValueError("l_diversity: l must be >= 1")
    quasi = list(quasi_cols)

    def partial(t: pa.Table) -> pa.Table:
        t = t.select(quasi + [sensitive_col])
        for k in quasi:
            if t.column(k).null_count:
                raise ValueError(
                    f"l_diversity: quasi column {k!r} has nulls — "
                    "fill them upstream (SQL GROUP BY groups nulls; "
                    "the vectorized mask would not)")
        return t.group_by(quasi + [sensitive_col],
                          use_threads=False).aggregate([([], "count_all")]) \
            .rename_columns(quasi + [sensitive_col, "_c"])

    def per_bucket(t: pa.Table) -> pa.Table:
        from .bucketing import multi_key_change

        t = t.sort_by([(k, "ascending") for k in quasi]
                      + [(sensitive_col, "ascending")])
        n_rows = t.num_rows
        kmask = multi_key_change(t, quasi)
        pmask = kmask.copy()
        s = t.column(sensitive_col)
        if n_rows > 1:
            sv = s.to_numpy(zero_copy_only=False)
            pmask[1:] |= sv[1:] != sv[:-1]
        # COUNT(DISTINCT) ignores NULLs; COUNT(*) keeps them
        valid = pc.is_valid(s).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(kmask)
        c = t.column("_c").to_numpy(zero_copy_only=False)
        n = np.add.reduceat(c, starts) if len(starts) \
            else np.empty(0, np.int64)
        nd_ = np.add.reduceat((pmask & valid).astype(np.int64),
                              starts) if len(starts) \
            else np.empty(0, np.int64)
        heads = t.take(pa.array(starts.astype(np.int64)))
        ratio = 1000 * nd_ // n
        return pa.table(
            {**{k: heads.column(k) for k in quasi},
             "n": pa.array(n.astype(np.int64)),
             "n_sensitive": pa.array(nd_),
             "diversity_permille": pa.array(ratio.astype(np.int64)),
             "is_diverse": pa.array((nd_ >= l).astype(np.int64))})

    from .bucketing import bucketed_map_groups

    pre = ds.select_columns(quasi + [sensitive_col]).map_batches(
        partial, batch_format="pyarrow", batch_size=65536)
    return bucketed_map_groups(pre, quasi[0], per_bucket)
