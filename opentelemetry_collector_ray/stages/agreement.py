"""Inter-rater agreement (Cohen's kappa) as exact integer lanes — the
label-quality audit step of an annotation/classifier pipeline: given two
label columns per record (two annotators, or a new model vs the
incumbent), how much do they agree beyond chance?

    kappa = (p_o - p_e) / (1 - p_e)

with p_o the observed agreement rate and p_e the chance rate implied by
the two raters' marginal class distributions (Cohen 1960). Everything
is kept rational: per group we emit

    n              total double-labeled records
    n_agree        records where the labels match
    pe_num         sum_c  n_a(c) * n_b(c)     (chance numerator, x n^2)
    kappa_permille trunc(1000 * (n*n_agree - pe_num) / (n*n - pe_num))

so ``kappa = (n*n_agree - pe_num) / (n*n - pe_num)`` exactly, and the
permille uses SQL's TRUNCATING integer division (negative kappa — worse
than chance — truncates toward zero like DuckDB ``//``). NULL when the
denominator is zero (both raters constant: kappa undefined).

Scale shape: the corpus reduces ONCE to the (group, a, b) count table —
bounded by groups x classes^2, screened before the tree combine's
single task exists (HLL on the group key, structural [0, max_classes)
validation on the labels per batch) — and the kappa arithmetic is a
driver pass over that skinny table in PYTHON ints (no intermediate
overflow), with an int64 range check on emit.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_I64_MAX = (1 << 63) - 1


def _trunc_div(num: int, den: int) -> int:
    """DuckDB ``//`` semantics: truncate toward zero (Python floors)."""
    q = abs(num) // abs(den)
    return -q if (num < 0) != (den < 0) else q


def rater_agreement(ds: ray.data.Dataset, group_key: str, a_col: str,
                    b_col: str, *, max_classes: int = 16,
                    max_groups: int = 10_000) -> pa.Table:
    """Per-``group_key`` Cohen's kappa lanes between integer label
    columns ``a_col`` and ``b_col`` (classes in ``[0, max_classes)`` —
    validated per batch, so a runaway label domain fails in the map
    stage, never in the combine). Rows with a NULL label on either
    side are excluded (SQL COUNT semantics over the pair)."""
    mc = int(max_classes)
    if mc < 2:
        raise ValueError("rater_agreement: max_classes must be >= 2")

    def prep(t: pa.Table) -> pa.Table:
        a, b = t.column(a_col), t.column(b_col)
        ok = pc.and_(pc.is_valid(a), pc.is_valid(b))
        t = t.filter(ok)
        for name, col in ((a_col, t.column(a_col)),
                          (b_col, t.column(b_col))):
            if not pa.types.is_integer(col.type):
                raise ValueError(
                    f"rater_agreement: label column {name!r} must be "
                    f"integer class ids, got {col.type}")
            if t.num_rows:
                lo = pc.min(col).as_py()
                hi = pc.max(col).as_py()
                if lo < 0 or hi >= mc:
                    raise ValueError(
                        f"rater_agreement: {name!r} has labels outside "
                        f"[0, {mc}) (saw [{lo}, {hi}]); raise "
                        "max_classes or fix the labeler")
        return t.select([group_key, a_col, b_col])

    labeled = ds.map_batches(prep, batch_format="pyarrow")

    # guard BEFORE the tree combine's single task exists (the
    # exact_global_quantiles lesson): one map-only HLL pass bounds the
    # group domain; classes are already bounded structurally above.
    from .aggregate import grouped_count
    from .sketch import approx_distinct

    est = approx_distinct(labeled.select_columns([group_key]), group_key)
    if est > float(max_groups):
        raise ValueError(
            f"rater_agreement: ~{int(est):,} groups (HLL estimate > "
            f"max_groups={max_groups:,}); the count table would not fit "
            "one task — shard by group range or raise max_groups")

    counts = grouped_count(labeled, [group_key, a_col, b_col],
                           count_name="_n", strategy="tree")
    counts = counts.materialize()
    cs = counts.schema(fetch_if_missing=False)
    if cs is not None and group_key in cs.base_schema.names:
        gtype = cs.base_schema.field(group_key).type
    else:
        # fully-empty count table: a materialized empty dataset reports
        # no schema (and neither does a fully-empty input) — fall back
        # to the input's group-key type when known, else pin string
        # (the quantile_map empty-path convention).
        in_schema = ds.schema(fetch_if_missing=False)
        if in_schema is not None and group_key in in_schema.base_schema.names:
            gtype = in_schema.base_schema.field(group_key).type
        else:
            gtype = pa.string()
    pdf = counts.to_pandas()
    if not len(pdf):
        # Ray to_pandas drops all columns on a fully-empty dataset —
        # build the empty result with an explicit schema instead.
        return pa.schema([(group_key, gtype), ("n", pa.int64()),
                          ("n_agree", pa.int64()), ("pe_num", pa.int64()),
                          ("kappa_permille", pa.int64())]).empty_table()

    groups: dict = {}
    for rec in pdf.to_dict("records"):
        g = rec[group_key]
        st = groups.setdefault(g, {"n": 0, "agree": 0, "na": {}, "nb": {}})
        cnt = int(rec["_n"])
        ca, cb = int(rec[a_col]), int(rec[b_col])
        st["n"] += cnt
        if ca == cb:
            st["agree"] += cnt
        st["na"][ca] = st["na"].get(ca, 0) + cnt
        st["nb"][cb] = st["nb"].get(cb, 0) + cnt

    out = {group_key: [], "n": [], "n_agree": [], "pe_num": [],
           "kappa_permille": []}
    for g in sorted(groups, key=lambda x: (x is None, x)):
        st = groups[g]
        n, agree = st["n"], st["agree"]
        pe = sum(cnt * st["nb"].get(c, 0) for c, cnt in st["na"].items())
        den = n * n - pe
        kappa = _trunc_div(1000 * (n * agree - pe), den) if den else None
        for name, v in (("n", n), ("pe_num", pe),
                        ("kappa_permille", kappa or 0)):
            if abs(v) > _I64_MAX:
                raise ValueError(
                    f"rater_agreement: lane {name!r} for group {g!r} "
                    f"overflows int64 ({v}); shard the group")
        out[group_key].append(g)
        out["n"].append(n)
        out["n_agree"].append(agree)
        out["pe_num"].append(pe)
        out["kappa_permille"].append(kappa)

    return pa.table({
        group_key: pa.array(out[group_key], gtype),
        "n": pa.array(out["n"], pa.int64()),
        "n_agree": pa.array(out["n_agree"], pa.int64()),
        "pe_num": pa.array(out["pe_num"], pa.int64()),
        "kappa_permille": pa.array(out["kappa_permille"], pa.int64()),
    })
