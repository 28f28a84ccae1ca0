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

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

__all__ = ["k_anonymize"]


def k_anonymize(ds: ray.data.Dataset, quasi_cols: list[str], k: int, *,
                sensitive_col: str | None = None, l: int | None = None,
                n_buckets: int | str = "auto") -> ray.data.Dataset:
    """Keep only rows whose quasi-identifier group has ≥ ``k`` members
    (and, when ``sensitive_col``/``l`` are given, ≥ ``l`` distinct
    sensitive values). Output schema = input schema; row order follows
    the join exchange."""
    from .aggregate import grouped_count, grouped_count_distinct
    from .join import shuffle_hash_join

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
    return shuffle_hash_join(checked, ok, key=quasi, how="semi",
                             n_buckets=n_buckets)
