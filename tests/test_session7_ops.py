"""Unit tests for the seventh-session operator batch: tail_budget
(context-window truncation), slo_burn (multiwindow burn-rate alert),
exphist_downscale (OTel exponential-histogram scale reduction), and
rater_agreement (Cohen's kappa integer lanes)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from opentelemetry_collector_ray.stages.agreement import rater_agreement
from opentelemetry_collector_ray.stages.metricsops import (
    exp_histogram, exphist_downscale, slo_burn)
from opentelemetry_collector_ray.stages.packing import tail_budget


def _ds(tbl: pa.Table, n_blocks: int = 3) -> ray.data.Dataset:
    return ray.data.from_arrow(tbl).repartition(n_blocks)


# ------------------------------------------------------------ tail_budget

def test_tail_budget_keeps_trailing_rows(ray_session):
    t = pa.table({
        "k": pa.array(["a"] * 5 + ["b"] * 3),
        "i": pa.array([0, 1, 2, 3, 4, 0, 1, 2]),
        "w": pa.array([10, 10, 10, 10, 10, 100, 1, 2], pa.int64()),
    })
    out = tail_budget(_ds(t), "k", ["i"], "w", 30).to_pandas()
    out = out.sort_values(["k", "i"]).reset_index(drop=True)
    # a: suffix sums from the end are 10,20,30,(40,50) -> keep i=2,3,4
    assert out[out.k == "a"].i.tolist() == [2, 3, 4]
    assert out[out.k == "a"].suffix_tok.tolist() if "suffix_tok" in out else True
    assert out[out.k == "a"].suffix_w.tolist() == [30, 20, 10]
    # b: last two fit (2, then 2+1=3); the 100-weight head drops
    assert out[out.k == "b"].i.tolist() == [1, 2]
    assert out[out.k == "b"].suffix_w.tolist() == [3, 2]


def test_tail_budget_single_row_over_budget_drops(ray_session):
    t = pa.table({"k": ["x"], "i": [0], "w": pa.array([99], pa.int64())})
    out = tail_budget(_ds(t, 1), "k", ["i"], "w", 50).to_pandas()
    assert len(out) == 0


def test_tail_budget_rejects_bad_weights(ray_session):
    neg = pa.table({"k": ["x", "x"], "i": [0, 1],
                    "w": pa.array([-1, 5], pa.int64())})
    with pytest.raises(Exception, match="negative"):
        tail_budget(_ds(neg, 1), "k", ["i"], "w", 10).materialize()
    nulls = pa.table({"k": ["x"], "i": [0], "w": pa.array([None], pa.int64())})
    with pytest.raises(Exception, match="null"):
        tail_budget(_ds(nulls, 1), "k", ["i"], "w", 10).materialize()
    flo = pa.table({"k": ["x"], "i": [0], "w": pa.array([1.5])})
    with pytest.raises(Exception, match="integer"):
        tail_budget(_ds(flo, 1), "k", ["i"], "w", 10).materialize()
    with pytest.raises(ValueError, match="budget"):
        tail_budget(_ds(neg, 1), "k", ["i"], "w", -1)


# --------------------------------------------------------------- slo_burn

def test_slo_burn_both_windows_required(ray_session):
    # one service; errors concentrated at the head so the long window
    # is burning there but the short window recovers later.
    ts = np.arange(10, dtype=np.int64) * 10
    err = np.array([1, 1, 1, 1, 0, 0, 0, 0, 0, 0], dtype=np.int64)
    t = pa.table({"svc": pa.array(["s"] * 10), "ts": pa.array(ts),
                  "e": pa.array(err)})
    out = slo_burn(_ds(t), "svc", "ts", "e", short_us=20, long_us=90,
                   err_permille=500).to_pandas().sort_values("ts")
    # at ts=30: short window [10,30] = rows 1,2,3 all err -> 3/3;
    # long window covers all 4 rows err 4/4 -> burning
    row = out[out.ts == 30].iloc[0]
    assert (row.n_err_short, row.n_short) == (3, 3)
    assert row.burning == 1
    # at ts=90: short [70,90] err 0/3 -> not burning even though the
    # long window still carries head errors
    row = out[out.ts == 90].iloc[0]
    assert row.n_err_short == 0 and row.burning == 0
    # rate compare is strict: exactly at threshold is NOT burning
    out2 = slo_burn(_ds(t), "svc", "ts", "e", 20, 90, 1000).to_pandas()
    assert out2.burning.sum() == 0


def test_slo_burn_validates_params(ray_session):
    t = pa.table({"svc": ["s"], "ts": pa.array([0], pa.int64()),
                  "e": pa.array([0], pa.int64())})
    with pytest.raises(ValueError, match="permille"):
        slo_burn(_ds(t, 1), "svc", "ts", "e", 10, 20, 1500)
    with pytest.raises(ValueError, match="short_us"):
        slo_burn(_ds(t, 1), "svc", "ts", "e", 30, 20, 500)


# ------------------------------------------------------ exphist_downscale

def test_exphist_downscale_perfect_subsetting(ray_session):
    # downscale(hist(scale=2), 2) must equal hist(scale=0) directly.
    rng = np.random.default_rng(7)
    v = rng.integers(1, 100_000, 500)
    t = pa.table({"k": pa.array(rng.choice(["a", "b"], 500)),
                  "v": pa.array(v, pa.int64())})
    fine = exp_histogram(_ds(t), keys=["k"], value_col="v", scale=2)
    coarse = exphist_downscale(fine, ["k"], shift=2).to_pandas()
    direct = exp_histogram(_ds(t), keys=["k"], value_col="v",
                           scale=0).to_pandas()
    c = coarse.sort_values(["k", "idx"]).reset_index(drop=True)
    d = direct.sort_values(["k", "idx"]).reset_index(drop=True)
    assert c[["k", "idx", "n"]].equals(d[["k", "idx", "n"]])


def test_exphist_downscale_zero_bucket_and_negatives(ray_session):
    # zero values land in the NULL-idx bucket and pass through; a
    # negative index (value < 1 at scale 0) shifts arithmetically.
    t = pa.table({"k": pa.array(["a"] * 4),
                  "v": pa.array([0, 0, 1, 6], pa.int64())})
    fine = exp_histogram(_ds(t, 1), keys=["k"], value_col="v", scale=0)
    out = exphist_downscale(fine, ["k"], shift=1).to_pandas()
    zero = out[out.idx.isna()]
    assert zero.n.tolist() == [2]
    # scale 0: 1 -> idx -1 (v=1 is the upper edge of (1/2,1]); 6 -> idx 2.
    # shift 1: -1 >> 1 = -1, 2 >> 1 = 1.
    nz = out[out.idx.notna()].sort_values("idx")
    assert nz.idx.tolist() == [-1, 1]
    assert nz.n.tolist() == [1, 1]
    with pytest.raises(ValueError, match="shift"):
        exphist_downscale(fine, ["k"], shift=-1)


def test_exphist_downscale_shift0_identity(ray_session):
    t = pa.table({"k": pa.array(["a"] * 3),
                  "v": pa.array([1, 5, 9], pa.int64())})
    fine = exp_histogram(_ds(t, 1), keys=["k"], value_col="v", scale=1)
    a = exphist_downscale(fine, ["k"], shift=0).to_pandas()
    b = exp_histogram(_ds(t, 1), keys=["k"], value_col="v",
                      scale=1).to_pandas()
    a = a.sort_values(["k", "idx"]).reset_index(drop=True)
    b = b.sort_values(["k", "idx"]).reset_index(drop=True)
    assert a[["k", "idx", "n"]].equals(b[["k", "idx", "n"]])


# --------------------------------------------------------- rater_agreement

def test_rater_agreement_known_values(ray_session):
    # classic 2x2: n=100, agree=70, marginals A(50,50) B(60,40)
    # pe_num = 50*60 + 50*40 = 5000; kappa = (7000-5000)/(10000-5000) = .4
    a = [0] * 50 + [1] * 50
    b = ([0] * 40 + [1] * 10) + ([0] * 20 + [1] * 30)
    t = pa.table({"g": pa.array(["x"] * 100),
                  "a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})
    out = rater_agreement(_ds(t), "g", "a", "b").to_pandas()
    row = out.iloc[0]
    assert (row.n, row.n_agree, row.pe_num) == (100, 70, 5000)
    assert row.kappa_permille == 400


def test_rater_agreement_edge_cases(ray_session):
    # perfect agreement -> 1000; constant raters -> NULL kappa;
    # nulls on either side excluded.
    t = pa.table({
        "g": pa.array(["p"] * 4 + ["c"] * 3 + ["n"] * 3),
        "a": pa.array([0, 1, 2, 0, 1, 1, 1, 0, None, 1], pa.int64()),
        "b": pa.array([0, 1, 2, 0, 1, 1, 1, 0, 1, None], pa.int64()),
    })
    out = rater_agreement(_ds(t), "g", "a", "b").to_pandas().set_index("g")
    assert out.loc["p"].kappa_permille == 1000
    assert out.loc["c"].n == 3 and np.isnan(out.loc["c"].kappa_permille)
    assert out.loc["n"].n == 1  # two null-bearing rows dropped
    # worse-than-chance kappa truncates toward zero like DuckDB //
    t2 = pa.table({"g": ["x"] * 4, "a": pa.array([0, 0, 1, 1], pa.int64()),
                   "b": pa.array([1, 1, 0, 0], pa.int64())})
    out2 = rater_agreement(_ds(t2, 1), "g", "a", "b").to_pandas()
    assert out2.iloc[0].kappa_permille == -1000


def test_rater_agreement_validates(ray_session):
    t = pa.table({"g": ["x"], "a": pa.array([99], pa.int64()),
                  "b": pa.array([0], pa.int64())})
    with pytest.raises(Exception, match="outside"):
        rater_agreement(_ds(t, 1), "g", "a", "b", max_classes=16)
    flo = pa.table({"g": ["x"], "a": pa.array([0.5]),
                    "b": pa.array([0], pa.int64())})
    with pytest.raises(Exception, match="integer"):
        rater_agreement(_ds(flo, 1), "g", "a", "b")
    with pytest.raises(ValueError, match="max_classes"):
        rater_agreement(_ds(t, 1), "g", "a", "b", max_classes=1)
    empty = pa.table({"g": pa.array([], pa.string()),
                      "a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64())})
    out = rater_agreement(_ds(empty, 1), "g", "a", "b")
    assert out.num_rows == 0
    assert out.schema.names == ["g", "n", "n_agree", "pe_num",
                                "kappa_permille"]


# -------------------------------------------------------------- binary_eval

def test_binary_eval_known_confusion(ray_session):
    from opentelemetry_collector_ray.stages.agreement import binary_eval
    # tp=3 fp=1 fn=2 tn=4 -> precision 750, recall 600, f1 2*3/(6+3)=666
    p = [1, 1, 1, 1, 0, 0, 0, 0, 0, 0]
    y = [1, 1, 1, 0, 1, 1, 0, 0, 0, 0]
    t = pa.table({"g": pa.array(["x"] * 10),
                  "p": pa.array(p, pa.int64()), "y": pa.array(y, pa.int64())})
    out = binary_eval(_ds(t), ["g"], "p", "y").to_pandas().iloc[0]
    assert (out.tp, out.fp, out.fn, out.tn) == (3, 1, 2, 4)
    assert out.precision_permille == 750
    assert out.recall_permille == 600
    assert out.f1_permille == 666


def test_binary_eval_null_denominators_and_validation(ray_session):
    from opentelemetry_collector_ray.stages.agreement import binary_eval
    # no predicted positives -> precision NULL; no actual -> recall NULL
    t = pa.table({"g": ["a", "a", "b", "b", "c"],
                  "p": pa.array([0, 0, 1, 1, None], pa.int64()),
                  "y": pa.array([1, 0, 0, 0, 1], pa.int64())})
    out = binary_eval(_ds(t), ["g"], "p", "y").to_pandas().set_index("g")
    assert np.isnan(out.loc["a"].precision_permille)
    assert out.loc["a"].recall_permille == 0
    assert np.isnan(out.loc["b"].recall_permille)
    assert out.loc["b"].precision_permille == 0
    assert "c" not in out.index  # null pred row dropped
    bad = pa.table({"g": ["x"], "p": pa.array([2], pa.int64()),
                    "y": pa.array([0], pa.int64())})
    with pytest.raises(Exception, match="outside"):
        binary_eval(_ds(bad, 1), ["g"], "p", "y").materialize()


# -------------------------------------------------------------- grouped_auc

def test_grouped_auc_perfect_and_ties(ray_session):
    from opentelemetry_collector_ray.stages.agreement import grouped_auc
    # perfect separation -> AUC 1000; all-tied scores -> AUC 500
    t = pa.table({
        "g": pa.array(["p"] * 4 + ["t"] * 4),
        "s": pa.array([1, 2, 3, 4, 7, 7, 7, 7], pa.int64()),
        "y": pa.array([0, 0, 1, 1, 0, 1, 0, 1], pa.int64()),
    })
    out = grouped_auc(_ds(t), "g", "s", "y").to_pandas().set_index("g")
    assert out.loc["p"].auc_permille == 1000
    assert out.loc["p"].u2 == 2 * (2 * 2)  # 2 * n_pos*n_neg
    assert out.loc["t"].auc_permille == 500


def test_grouped_auc_matches_sklearn_formula(ray_session):
    from opentelemetry_collector_ray.stages.agreement import grouped_auc
    rng = np.random.default_rng(3)
    s = rng.integers(0, 20, 300)          # heavy ties
    y = (rng.random(300) < 1 / (1 + np.exp(-(s - 10)))).astype(np.int64)
    t = pa.table({"g": pa.array(["k"] * 300),
                  "s": pa.array(s, pa.int64()), "y": pa.array(y)})
    out = grouped_auc(_ds(t), "g", "s", "y").to_pandas().iloc[0]
    # reference: pairwise count with half-credit ties (O(n^2) oracle)
    pos, neg = s[y == 1], s[y == 0]
    wins = (pos[:, None] > neg[None, :]).sum()
    ties = (pos[:, None] == neg[None, :]).sum()
    assert out.u2 == 2 * wins + ties
    assert out.n_pos == len(pos) and out.n_neg == len(neg)


def test_grouped_auc_single_class_null(ray_session):
    from opentelemetry_collector_ray.stages.agreement import grouped_auc
    t = pa.table({"g": ["x", "x"], "s": pa.array([1, 2], pa.int64()),
                  "y": pa.array([1, 1], pa.int64())})
    out = grouped_auc(_ds(t, 1), "g", "s", "y").to_pandas().iloc[0]
    assert out.n_neg == 0 and np.isnan(out.auc_permille)
    flo = pa.table({"g": ["x"], "s": pa.array([0.5]),
                    "y": pa.array([1], pa.int64())})
    with pytest.raises(Exception, match="integer"):
        grouped_auc(_ds(flo, 1), "g", "s", "y").materialize()


# ------------------------------------------------------------ gini_impurity

def test_gini_impurity_known_values(ray_session):
    from opentelemetry_collector_ray.stages.agreement import gini_impurity
    # pure group -> 0; 50/50 -> 500; 4-way uniform -> 750
    t = pa.table({
        "k": ["p"] * 3 + ["h"] * 4 + ["u"] * 4,
        "c": ["a", "a", "a", "a", "a", "b", "b", "w", "x", "y", "z"],
    })
    out = gini_impurity(_ds(t), "k", "c").to_pandas().set_index("k")
    assert out.loc["p"].gini_permille == 0 and out.loc["p"].gini_num == 0
    assert out.loc["h"].gini_permille == 500
    assert out.loc["u"].gini_permille == 750
    assert out.loc["u"].n == 4 and out.loc["u"].gini_num == 12


# ---------------------------------------------------------- exphist_quantile

def test_exphist_quantile_rank_rule(ray_session):
    from opentelemetry_collector_ray.stages.metricsops import (
        exphist_quantile)
    # buckets: idx 0 x3, idx 1 x3, idx 2 x4 -> N=10
    # q=500: target=(10-1)*500//1000=4 -> first cum>4 is idx 1 (cum 6)
    # q=1000: target=9 -> idx 2; q=0: target=0 -> idx 0
    h = pa.table({"k": ["a"] * 3, "idx": pa.array([0, 1, 2], pa.int64()),
                  "n": pa.array([3, 3, 4], pa.int64())})
    for q, want in ((500, 1), (1000, 2), (0, 0)):
        out = exphist_quantile(_ds(h, 1), "k", q).to_pandas()
        assert out.iloc[0].q_idx == want and out.iloc[0].n_total == 10
    with pytest.raises(ValueError, match="q_permille"):
        exphist_quantile(_ds(h, 1), "k", 1001)


def test_exphist_quantile_zero_bucket_first(ray_session):
    from opentelemetry_collector_ray.stages.metricsops import (
        exphist_quantile)
    # zero bucket (NULL idx) holds the low ranks: 6 zeros + 4 at idx 3
    h = pa.table({"k": ["a", "a"], "idx": pa.array([None, 3], pa.int64()),
                  "n": pa.array([6, 4], pa.int64())})
    lo = exphist_quantile(_ds(h, 1), "k", 250).to_pandas().iloc[0]
    assert np.isnan(lo.q_idx)         # p25 is in the zero bucket
    hi = exphist_quantile(_ds(h, 1), "k", 900).to_pandas().iloc[0]
    assert hi.q_idx == 3


def test_exphist_quantile_end_to_end_matches_direct(ray_session):
    from opentelemetry_collector_ray.stages.metricsops import (
        exp_bucket_index, exp_histogram, exphist_quantile)
    rng = np.random.default_rng(11)
    v = rng.integers(1, 10_000, 400)
    ks = rng.choice(["x", "y"], 400)
    t = pa.table({"k": pa.array(ks), "v": pa.array(v, pa.int64())})
    hist = exp_histogram(_ds(t), keys=["k"], value_col="v", scale=0)
    out = exphist_quantile(hist, "k", 990).to_pandas().set_index("k")
    for key in ("x", "y"):
        vals = np.sort(v[ks == key])
        direct = vals[(len(vals) - 1) * 990 // 1000]
        assert out.loc[key].q_idx == exp_bucket_index(
            np.array([direct], dtype=np.float64))[0]


# ----------------------------------------------------------------- parse_kv

def test_parse_kv_quoted_bare_missing():
    from opentelemetry_collector_ray.functions.text import parse_kv
    c = pa.array(['a=1 b="two words" c=x', 'b=bare', 'none here', None,
                  'b=""', 'prefab=9 b=2'])
    out = parse_kv(c, ["a", "b"])
    assert out["a"].to_pylist() == ["1", None, None, None, None, None]
    # 'prefab=9' must NOT match key 'b' mid-token ((?:^| ) anchor)
    assert out["b"].to_pylist() == ["two words", "bare", None, None,
                                    "", "2"]
    with pytest.raises(ValueError, match="bare logfmt key"):
        parse_kv(c, ["bad key"])


# ------------------------------------------------------- trace_deepest_path

def test_trace_deepest_path_chains_and_orphans(ray_session):
    from opentelemetry_collector_ray.stages.spanops import (
        trace_deepest_path)
    # trace t1: root(10) -> a(5) -> b(3); root -> c(20): deepest 10+20=30
    # trace t2: orphan parent link = its own root: single span 7
    t = pa.table({
        "trace_id": ["t1", "t1", "t1", "t1", "t2"],
        "span_id": ["r", "a", "b", "c", "z"],
        "parent_span_id": ["", "r", "a", "r", "missing"],
        "duration_us": pa.array([10, 5, 3, 20, 7], pa.int64()),
    })
    out = trace_deepest_path(_ds(t)).to_pandas().set_index("trace_id")
    assert out.loc["t1"].critical_us == 30 and out.loc["t1"].n_spans == 4
    assert out.loc["t2"].critical_us == 7 and out.loc["t2"].n_spans == 1


def test_trace_deepest_path_deep_chain_and_cycle(ray_session):
    from opentelemetry_collector_ray.stages.spanops import (
        trace_deepest_path)
    # 64-deep linear chain: sum of 1..64
    n = 64
    t = pa.table({
        "trace_id": ["t"] * n,
        "span_id": [f"s{i}" for i in range(n)],
        "parent_span_id": [""] + [f"s{i - 1}" for i in range(1, n)],
        "duration_us": pa.array(list(range(1, n + 1)), pa.int64()),
    })
    out = trace_deepest_path(_ds(t, 2)).to_pandas()
    assert out.iloc[0].critical_us == n * (n + 1) // 2
    cyc = pa.table({
        "trace_id": ["c", "c"], "span_id": ["a", "b"],
        "parent_span_id": ["b", "a"],
        "duration_us": pa.array([1, 1], pa.int64())})
    with pytest.raises(Exception, match="cyclic"):
        trace_deepest_path(_ds(cyc, 1)).materialize()


# ------------------------------------------------------- edit_distance_pairs

def _lev_ref(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_levenshtein_pairs_matches_reference():
    from opentelemetry_collector_ray.stages.fuzzy import levenshtein_pairs
    rng = np.random.default_rng(5)
    words = ["".join(rng.choice(list("abcd"), rng.integers(0, 9)))
             for _ in range(40)]
    ia = rng.integers(0, 40, 120)
    ib = rng.integers(0, 40, 120)
    got = levenshtein_pairs(pa.array(words), ia, ib, chunk=37)
    want = [_lev_ref(words[x], words[y]) for x, y in zip(ia, ib)]
    assert got.tolist() == want


def test_edit_distance_pairs_cross_band_and_dedup(ray_session):
    from opentelemetry_collector_ray.stages.fuzzy import edit_distance_pairs
    # lengths 3,4 land in adjacent bands at max_dist=1 (w=2): the
    # insert pair (abc, abcd) must still be found, and every pair
    # exactly once.
    t = pa.table({"id": pa.array([1, 2, 3, 4], pa.int64()),
                  "s": ["abc", "abcd", "abd", "zzzzzz"]})
    out = edit_distance_pairs(_ds(t), "id", "s", 1).to_pandas()
    pairs = sorted(map(tuple, out[["id_a", "id_b", "dist"]].values.tolist()))
    assert pairs == [(1, 2, 1), (1, 3, 1), (2, 3, 1)] or \
        pairs == [(1, 2, 1), (1, 3, 1)]
    # (2,3): 'abcd' vs 'abd' -> one deletion = dist 1, same band pair
    assert (2, 3, 1) in pairs
    assert len(pairs) == len(set((a, b) for a, b, _ in pairs))


def test_edit_distance_pairs_blocking_and_guards(ray_session):
    from opentelemetry_collector_ray.stages.fuzzy import edit_distance_pairs
    t = pa.table({"id": pa.array([1, 2, 3, 4], pa.int64()),
                  "s": ["aaa", "aab", "aaa", "aab"],
                  "blk": ["x", "x", "y", "y"]})
    out = edit_distance_pairs(_ds(t), "id", "s", 1,
                              block_col="blk").to_pandas()
    got = sorted(map(tuple, out[["id_a", "id_b"]].values.tolist()))
    assert got == [(1, 2), (3, 4)]        # cross-block pairs excluded
    dup = pa.table({"id": pa.array([7, 7], pa.int64()), "s": ["aa", "ab"]})
    with pytest.raises(Exception, match="unique"):
        edit_distance_pairs(_ds(dup, 1), "id", "s", 1).materialize()
    long = pa.table({"id": pa.array([1], pa.int64()), "s": ["x" * 600]})
    with pytest.raises(Exception, match="max_len"):
        edit_distance_pairs(_ds(long, 1), "id", "s", 1).materialize()
    tight = pa.table({"id": pa.array(list(range(100)), pa.int64()),
                      "s": ["ab"] * 100})
    with pytest.raises(Exception, match="max_block_pairs"):
        edit_distance_pairs(_ds(tight, 1), "id", "s", 1,
                            max_block_pairs=10).materialize()
    with pytest.raises(ValueError, match="max_dist"):
        edit_distance_pairs(_ds(t, 1), "id", "s", -1)


# ------------------------------------------------------ YAML builder parity

def _build_one(tmp_path, table: pa.Table, proc_name: str, proc_cfg: dict):
    import pyarrow.parquet as pq

    from opentelemetry_collector_ray.config import PipelineConfig
    from opentelemetry_collector_ray.pipelines.builder import build_dataset

    tmp_path.mkdir(parents=True, exist_ok=True)
    src = tmp_path / "in.parquet"
    pq.write_table(table, str(src))
    return build_dataset(PipelineConfig.from_dict({
        "receivers": {"parquet": {"paths": str(src)}},
        "processors": {proc_name: proc_cfg},
        "exporters": {"debug": {}},
        "service": {"pipelines": {"logs": {
            "receivers": ["parquet"], "processors": [proc_name],
            "exporters": ["debug"]}}},
    }))


def test_yaml_session7_processors(ray_session, tmp_path):
    from opentelemetry_collector_ray.config import ConfigError

    t = pa.table({
        "k": pa.array(["a"] * 6),
        "i": pa.array(range(6), pa.int64()),
        "w": pa.array([5] * 6, pa.int64()),
        "p": pa.array([1, 0, 1, 0, 1, 0], pa.int64()),
        "y": pa.array([1, 0, 0, 0, 1, 1], pa.int64()),
    })
    out = _build_one(tmp_path / "tb", t, "tail_budget",
                     {"key": "k", "order_by": "i", "weight": "w",
                      "budget": 12}).to_pandas()
    assert sorted(out.i.tolist()) == [4, 5]
    out = _build_one(tmp_path / "be", t, "binary_eval",
                     {"keys": "k", "pred": "p", "label": "y"}).to_pandas()
    assert out.iloc[0].tp == 2 and out.iloc[0].fn == 1
    out = _build_one(tmp_path / "auc", t, "auc",
                     {"key": "k", "score": "i", "label": "y"}).to_pandas()
    assert out.iloc[0].n_pos == 3
    out = _build_one(tmp_path / "gi", t, "gini_impurity",
                     {"key": "k", "cat": "p"}).to_pandas()
    assert out.iloc[0].gini_permille == 500
    out = _build_one(tmp_path / "ka", t, "rater_kappa",
                     {"key": "k", "a": "p", "b": "y"}).to_pandas()
    assert out.iloc[0].n == 6
    sb = pa.table({"svc": ["s"] * 4, "ts": pa.array([0, 1, 2, 3],
                                                    pa.int64()),
                   "e": pa.array([1, 1, 1, 1], pa.int64())})
    out = _build_one(tmp_path / "slo", sb, "slo_burn",
                     {"key": "svc", "ts": "ts", "err": "e",
                      "short_us": 1, "long_us": 3,
                      "err_permille": 500}).to_pandas()
    assert out.burning.sum() == 4
    ep = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                   "s": ["abc", "abd", "xyz"]})
    out = _build_one(tmp_path / "ep", ep, "edit_pairs",
                     {"id": "id", "text": "s", "max_dist": 1}).to_pandas()
    assert sorted(map(tuple, out[["id_a", "id_b"]].values.tolist())) == \
        [(1, 2)]
    h = pa.table({"k": ["a", "a"], "idx": pa.array([2, 5], pa.int64()),
                  "n": pa.array([3, 1], pa.int64())})
    out = _build_one(tmp_path / "ed", h, "exphist_downscale",
                     {"keys": "k", "shift": 1}).to_pandas()
    assert sorted(out.idx.tolist()) == [1, 2]
    out = _build_one(tmp_path / "eq", h, "exphist_quantile",
                     {"key": "k", "q_permille": 1000}).to_pandas()
    assert out.iloc[0].q_idx == 5
    for name, cfg in (("tail_budget", {"key": "k"}),
                      ("slo_burn", {"key": "s", "ts": "t", "err": "e"}),
                      ("binary_eval", {"keys": "k", "pred": "p"}),
                      ("auc", {"key": "k", "score": "s"}),
                      ("rater_kappa", {"key": "k", "a": "a"}),
                      ("gini_impurity", {"key": "k"}),
                      ("edit_pairs", {"id": "i", "text": "t"}),
                      ("exphist_downscale", {"keys": "k"}),
                      ("exphist_quantile", {"key": "k"})):
        with pytest.raises(ConfigError):
            _build_one(tmp_path / f"err_{name}", t, name, cfg)


# ------------------------------------------------- window extremum lanes

def test_window_extrema_brute_force(ray_session):
    from opentelemetry_collector_ray.stages.window import per_key_window
    rng = np.random.default_rng(9)
    n = 400
    keys = rng.choice(["a", "b", "c"], n)
    order = np.sort(rng.integers(0, 500, n))  # duplicates = RANGE ties
    rid = np.arange(n)
    vals = rng.integers(-50, 50, n)
    t = pa.table({"k": pa.array(keys), "o": pa.array(order, pa.int64()),
                  "rid": pa.array(rid, pa.int64()),
                  "v": pa.array(vals, pa.int64())})
    out = per_key_window(
        ray.data.from_arrow(t).repartition(3), "k", ["o", "rid"],
        {"mx": ("rolling_max", "v", 20), "mn": ("rolling_min", "v", 20),
         "rmx": ("moving_max", "v", 5),
         "rmn": ("moving_min", "v", 5)}).to_pandas()
    out = out.sort_values(["k", "o", "rid"]).reset_index(drop=True)
    for kk in ("a", "b", "c"):
        g = out[out.k == kk].reset_index(drop=True)
        ov = g.o.to_numpy()
        vv = g.v.to_numpy()
        for i in range(len(g)):
            in_range = (ov >= ov[i] - 20) & (ov <= ov[i])
            assert g.mx[i] == vv[in_range].max()
            assert g.mn[i] == vv[in_range].min()
            lo = max(0, i - 5)
            assert g.rmx[i] == vv[lo:i + 1].max()
            assert g.rmn[i] == vv[lo:i + 1].min()


def test_window_extrema_validation(ray_session):
    from opentelemetry_collector_ray.stages.window import per_key_window
    t = pa.table({"k": ["a"], "o": pa.array([1], pa.int64()),
                  "v": pa.array([float("nan")])})
    ds = ray.data.from_arrow(t)
    with pytest.raises(Exception, match="NaN-free"):
        per_key_window(ds, "k", ["o"],
                       {"m": ("moving_max", "v", 2)}).materialize()
    with pytest.raises(ValueError, match="takes"):
        per_key_window(ds, "k", ["o"], {"m": ("rolling_max", "v")})


# ---------------------------------------------------------------- longest_run

def test_longest_run_streaks(ray_session):
    from opentelemetry_collector_ray.stages.sessionize import longest_run
    t = pa.table({
        "k": ["a"] * 6 + ["b"] * 3 + ["c"],
        # a: days {1,2,3, 7,8} with a duplicate 2 -> longest 3, n=5
        # b: {10, 12, 14} -> longest 1, n=3; c: {5} -> 1, 1
        "d": pa.array([1, 2, 2, 3, 7, 8, 10, 12, 14, 5], pa.int64()),
    })
    out = longest_run(_ds(t), "k", "d").to_pandas().set_index("k")
    assert (out.loc["a"].n_ordinals, out.loc["a"].longest_run) == (5, 3)
    assert (out.loc["b"].n_ordinals, out.loc["b"].longest_run) == (3, 1)
    assert (out.loc["c"].n_ordinals, out.loc["c"].longest_run) == (1, 1)
    neg = pa.table({"k": ["x"], "d": pa.array([1.5])})
    with pytest.raises(Exception, match="integer"):
        longest_run(_ds(neg, 1), "k", "d").materialize()


# ---------------------------------------------------- keyness / overlap

def test_keyness_odds_planted(ray_session):
    from opentelemetry_collector_ray.stages.corpusstats import keyness_odds
    t = pa.table({
        "sl": ["a"] * 3 + ["b"] * 3 + ["x"],
        "text": ["cat cat dog", "cat fish", "cat",
                 "dog dog fish", "dog", "bird", "ignored slice"],
    })
    out = keyness_odds(_ds(t), "sl", "a", "b", top_k=10).to_pandas()
    out = out.set_index("term")
    # a: cat=4 dog=1 fish=1 (Na=6); b: dog=3 fish=1 bird=1 (Nb=5); V=4
    assert out.loc["cat"].a == 4 and out.loc["cat"].b == 0
    assert out.loc["cat"].odds_permille == 1000 * 5 * 9 // (1 * 10)
    assert out.loc["bird"].odds_permille == 1000 * 1 * 9 // (2 * 10)
    assert out.index[0] == "cat"           # highest keyness first
    with pytest.raises(ValueError, match="differ"):
        keyness_odds(_ds(t, 1), "sl", "a", "a")


def test_audience_overlap_planted(ray_session):
    from opentelemetry_collector_ray.stages.cohort import audience_overlap
    # day 1: {u1,u2}; day 2: {u2,u3} -> inter 1, union 3; day 4 not
    # contiguous with day 2 -> no output row for day 4.
    t = pa.table({
        "g": ["x"] * 6,
        "day": pa.array([1, 1, 2, 2, 4, 4], pa.int64()),
        "u": pa.array([1, 2, 2, 3, 1, 2], pa.int64()),
    })
    out = audience_overlap(_ds(t), "g", "day", "u").to_pandas()
    assert out.day.tolist() == [2]
    row = out.iloc[0]
    assert (row.n_today, row.n_prev, row.n_inter) == (2, 2, 1)
    assert row.jaccard_permille == 333


# ------------------------------------------------------------ multiclass_eval

def test_multiclass_eval_known(ray_session):
    from opentelemetry_collector_ray.stages.agreement import multiclass_eval
    t = pa.table({
        "p": ["a", "a", "b", "b", "c", None],
        "y": ["a", "b", "b", "b", "a", "a"],
    })
    out = multiclass_eval(_ds(t), "p", "y").to_pandas().set_index("cls")
    # a: tp 1, fp 1 (pred a label b), fn 1 (label a pred c)
    assert (out.loc["a"].tp, out.loc["a"].fp, out.loc["a"].fn) == (1, 1, 1)
    assert out.loc["a"].precision_permille == 500
    assert out.loc["a"].f1_permille == 500
    # b: tp 2, fp 0, fn 1 -> recall 666
    assert (out.loc["b"].tp, out.loc["b"].recall_permille) == (2, 666)
    # c: predicted only, never a label -> recall NULL
    assert out.loc["c"].tp == 0 and np.isnan(out.loc["c"].recall_permille)
    empty = pa.table({"p": pa.array([], pa.string()),
                      "y": pa.array([], pa.string())})
    res = multiclass_eval(_ds(empty, 1), "p", "y")
    assert res.num_rows == 0 and res.schema.names[0] == "cls"
    with pytest.raises(ValueError, match="max_classes"):
        big = pa.table({"p": [str(i) for i in range(40)],
                        "y": [str(i + 1) for i in range(40)]})
        multiclass_eval(_ds(big, 1), "p", "y", max_classes=3)


# ------------------------------------------------ review-fix regressions

def test_exphist_quantile_zero_total_raises(ray_session):
    from opentelemetry_collector_ray.stages.metricsops import (
        exphist_quantile)
    h = pa.table({"k": ["a"], "idx": pa.array([3], pa.int64()),
                  "n": pa.array([0], pa.int64())})
    with pytest.raises(Exception, match="sum to zero"):
        exphist_quantile(_ds(h, 1), "k", 0).materialize()


def test_edit_pairs_null_block_raises(ray_session):
    from opentelemetry_collector_ray.stages.fuzzy import edit_distance_pairs
    t = pa.table({"id": pa.array([1, 2], pa.int64()), "s": ["aa", "ab"],
                  "blk": pa.array(["x", None])})
    with pytest.raises(Exception, match="nulls"):
        edit_distance_pairs(_ds(t, 1), "id", "s", 1,
                            block_col="blk").materialize()


def test_keyness_empty_path_schema(ray_session):
    from opentelemetry_collector_ray.stages.corpusstats import keyness_odds
    t = pa.table({"sl": ["z"], "text": ["nothing in either slice"]})
    out = keyness_odds(_ds(t, 1), "sl", "a", "b")
    assert out.count() == 0
    assert out.schema().base_schema.names == \
        ["term", "a", "b", "odds_permille"]


def test_parse_kv_lone_quote_value():
    from opentelemetry_collector_ray.functions.text import parse_kv
    out = parse_kv(pa.array(['k=" x=1', 'k="ab x=1']), ["k"])
    # a lone quote and an unterminated quote are bare tokens: returned
    # verbatim, never stripped to ''.
    assert out["k"].to_pylist() == ['"', '"ab']


def test_model_eval_example_yaml(ray_session, tmp_path, monkeypatch):
    """examples/model_eval.yaml end to end: parquet receiver ->
    binary_eval scorecard over a planted confusion matrix."""
    from pathlib import Path

    import pyarrow.parquet as pq

    from opentelemetry_collector_ray.config import PipelineConfig
    from opentelemetry_collector_ray.pipelines.builder import build_dataset

    rows = [{"slice": "s", "pred": p, "label": y}
            for p, y in [(1, 1), (1, 1), (1, 0), (0, 1), (0, 0)]]
    p = tmp_path / "e.parquet"
    pq.write_table(pa.Table.from_pylist(rows), str(p))
    monkeypatch.setenv("EVAL_PATH", str(p))
    yml = Path(__file__).resolve().parent.parent / "examples" \
        / "model_eval.yaml"
    out = build_dataset(PipelineConfig.from_yaml(str(yml))).to_pandas()
    row = out.iloc[0]
    assert (row.tp, row.fp, row.fn, row.tn) == (2, 1, 1, 1)
    assert row.precision_permille == 666 and row.recall_permille == 666


# --------------------------------------------- path rollup / compression

def test_path_rollup_counts(ray_session):
    from opentelemetry_collector_ray.stages.rollup import path_rollup
    t = pa.table({"p": ["/a/b/c/", "a/b", "a", "x/y", None]})
    out = path_rollup(_ds(t), "p", 2).to_pandas()
    got = {(r.prefix, r.depth): r.n for r in out.itertuples()}
    assert got[("a", 1)] == 3 and got[("a/b", 2)] == 2
    assert got[("x", 1)] == 1 and got[("x/y", 2)] == 1
    assert ("", 1) not in got          # null path dropped, not counted
    with pytest.raises(ValueError, match="max_depth"):
        path_rollup(_ds(t, 1), "p", 0)


def test_compression_ratio_ordering():
    from opentelemetry_collector_ray.functions.text import (
        compression_ratio)
    rep = "spam ham " * 200
    import random
    rng = random.Random(7)
    prose = "".join(rng.choice("abcdefghijklmnop qrstuvwxyz.,!?")
                    for _ in range(len(rep)))
    d = compression_ratio(pa.array([rep, prose, None, ""]))
    r = d["ratio_permille"].to_pylist()
    assert r[0] < r[1]                 # repetition compresses harder
    assert r[2] is None and r[3] is None
    assert d["n_bytes"].to_pylist()[:2] == [len(rep), len(prose)]


# ----------------------------------------------------------- hist_rebucket

def test_hist_rebucket_subsetting_and_guards(ray_session):
    from opentelemetry_collector_ray.stages.metricsops import (
        explicit_histogram, hist_rebucket)
    rng = np.random.default_rng(13)
    t = pa.table({"k": pa.array(rng.choice(["a", "b"], 300)),
                  "v": pa.array(rng.integers(1, 1000, 300), pa.int64())})
    fine = list(range(50, 1001, 50))
    coarse = list(range(200, 1001, 200))
    merged = hist_rebucket(
        explicit_histogram(_ds(t), ["k"], "v", fine), ["k"],
        fine, coarse).to_pandas().sort_values(["k", "bucket"])
    direct = explicit_histogram(_ds(t), ["k"], "v",
                                coarse).to_pandas().sort_values(
        ["k", "bucket"])
    assert merged.reset_index(drop=True)[["k", "bucket", "n"]].equals(
        direct.reset_index(drop=True)[["k", "bucket", "n"]])
    with pytest.raises(ValueError, match="must be one of the old"):
        hist_rebucket(explicit_histogram(_ds(t), ["k"], "v", fine),
                      ["k"], fine, [75, 400])
    with pytest.raises(ValueError, match="strictly"):
        explicit_histogram(_ds(t), ["k"], "v", [100, 100])


# -------------------------------------------------- base64 / duration

def test_base64_roundtrip_and_strict():
    from opentelemetry_collector_ray.functions.text import (
        base64_decode, base64_encode)
    src = pa.array(["hello", "", "ünïcode ✓", None])
    enc = base64_encode(src)
    assert base64_decode(enc).to_pylist() == src.to_pylist()
    with pytest.raises(ValueError, match="malformed"):
        base64_decode(pa.array(["not base64!!"]))
    assert base64_decode(pa.array(["not base64!!"]),
                         strict=False).to_pylist() == [None]


def test_parse_duration_us_lanes():
    from opentelemetry_collector_ray.functions.text import (
        parse_duration_us)
    got = parse_duration_us(pa.array(
        ["1h30m", "45s", "250ms", "2h0m5s", "0s", "", "nope",
         "5m250ms", None]))
    assert got.to_pylist() == [
        5_400_000_000, 45_000_000, 250_000, 7_205_000_000, 0, None,
        None, 300_250_000, None]
