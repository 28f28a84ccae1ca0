"""Round-5 late operators: fuzzy Levenshtein lookup (stages/fuzzy.py),
per-key top-p selection (mixing.select_top_share_by), vocabulary-growth
curve (corpusstats.vocab_growth), retrieval eval (ranking.eval_ranking)
— DuckDB parity on randomized inputs, guards, edge cases, YAML parity."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray.data

from opentelemetry_collector_ray.stages.fuzzy import (
    fuzzy_lookup, levenshtein_matrix)


def _rand_strings(rng, n, alpha="abcd", lo=0, hi=9):
    lens = rng.integers(lo, hi + 1, n)
    return ["".join(rng.choice(list(alpha), ln)) for ln in lens]


def test_levenshtein_matches_duckdb_randomized():
    rng = np.random.default_rng(11)
    probes = _rand_strings(rng, 120)
    cands = _rand_strings(rng, 15)
    got = levenshtein_matrix(pa.array(probes), pa.array(cands))
    con = duckdb.connect()
    for i in range(0, 120, 7):          # spot grid, still ~270 pairs
        for j in range(15):
            want = con.execute("SELECT levenshtein(?, ?)",
                               [probes[i], cands[j]]).fetchone()[0]
            assert got[i, j] == want, (probes[i], cands[j])


def test_levenshtein_empty_and_identical():
    d = levenshtein_matrix(pa.array(["", "abc", "abc"]),
                           pa.array(["", "abc"]))
    assert d[0, 0] == 0 and d[0, 1] == 3
    assert d[1, 0] == 3 and d[1, 1] == 0


def test_levenshtein_sliced_offset_buffers():
    arr = pa.array(["xx", "abc", "abd", "zzz"]).slice(1, 2)
    d = levenshtein_matrix(arr, pa.array(["abc"]))
    assert list(d[:, 0]) == [0, 1]


def test_fuzzy_lookup_best_match_and_nulls(ray_session):
    t = pa.table({"s": ["kitten", "sitting", "zzzzzzzzzz"]})
    ds = ray.data.from_arrow(t)
    out = fuzzy_lookup(ds, ["kitten", "mitten"], "s",
                       max_dist=3).to_pandas()
    out = out.sort_values("s").reset_index(drop=True)
    # kitten: exact; sitting: dist 3 to both -> lexical tie-break
    by = dict(zip(out["s"], zip(out["fuzzy_match"], out["fuzzy_dist"])))
    assert by["kitten"] == ("kitten", 0)
    assert by["sitting"] == ("kitten", 3)
    assert by["zzzzzzzzzz"][0] is None or by["zzzzzzzzzz"][0] != by["zzzzzzzzzz"][0] \
        or np.isnan(by["zzzzzzzzzz"][1])


def test_fuzzy_lookup_rejects_null_and_oversized(ray_session):
    with pytest.raises(ValueError, match="null candidate"):
        fuzzy_lookup(ray.data.from_arrow(pa.table({"s": ["a"]})),
                     pa.array(["a", None]), "s")
    import opentelemetry_collector_ray.stages.fuzzy as fz
    with pytest.raises(ValueError, match="candidates"):
        fuzzy_lookup(ray.data.from_arrow(pa.table({"s": ["a"]})),
                     ["x"] * (fz.MAX_CANDIDATES + 1), "s")


def test_select_top_share_matches_sql(ray_session):
    from opentelemetry_collector_ray.stages.mixing import (
        select_top_share_by)

    rng = np.random.default_rng(5)
    n = 3000
    tbl = pa.table({"k": pa.array(rng.integers(0, 25, n), pa.int64()),
                    "v": pa.array(rng.integers(0, 500, n), pa.int64()),
                    "id": pa.array(np.arange(n), pa.int64())})
    out = select_top_share_by(
        ray.data.from_arrow(tbl).repartition(6), "k", "v", "id",
        share_num=55, share_den=100).to_pandas()
    con = duckdb.connect()
    con.register("t", tbl)
    want = con.execute("""
        WITH w AS (SELECT *, coalesce(sum(v) OVER (PARTITION BY k
                     ORDER BY v DESC, id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS cb,
                   sum(v) OVER (PARTITION BY k) AS total FROM t)
        SELECT k, v, id FROM w WHERE cb * 100 < 55 * total""").df()
    assert sorted(out["id"]) == sorted(want["id"])


def test_select_top_share_guards(ray_session):
    from opentelemetry_collector_ray.stages.mixing import (
        select_top_share_by)

    ds = ray.data.from_arrow(pa.table(
        {"k": [1], "v": [1.5], "id": [0]}))
    with pytest.raises(ValueError, match="share"):
        select_top_share_by(ds, "k", "v", "id", share_num=1,
                            share_den=0)
    with pytest.raises(Exception, match="integer lane"):
        select_top_share_by(ds, "k", "v", "id", share_num=1,
                            share_den=2).materialize()
    neg = ray.data.from_arrow(pa.table(
        {"k": [1], "v": pa.array([-3], pa.int64()), "id": [0]}))
    with pytest.raises(Exception, match="negative"):
        select_top_share_by(neg, "k", "v", "id", share_num=1,
                            share_den=2).materialize()


def test_vocab_growth_matches_sql(ray_session):
    from opentelemetry_collector_ray.stages.corpusstats import (
        vocab_growth)

    rng = np.random.default_rng(9)
    words = ["".join(p) for p in
             __import__("itertools").product("abcdefgh", "nopqrstu")]
    docs = [" ".join(rng.choice(words, rng.integers(1, 12)))
            for _ in range(400)]
    tbl = pa.table({"doc_id": pa.array(np.arange(400), pa.int64()),
                    "text": pa.array(docs)})
    out = vocab_growth(ray.data.from_arrow(tbl).repartition(5),
                       bucket_size=50).to_pandas()
    con = duckdb.connect()
    con.register("t", tbl)
    want = con.execute("""
        WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(
                       lower(text), '[a-z]+')) AS term FROM t),
        f AS (SELECT term, min(doc_id) AS fd FROM tok GROUP BY term)
        SELECT fd // 50 AS bucket, count(*) AS new_terms
        FROM f GROUP BY 1""").df()
    g = out.sort_values("bucket").reset_index(drop=True)
    w = want.sort_values("bucket").reset_index(drop=True)
    assert list(g["bucket"]) == list(w["bucket"])
    assert list(g["new_terms"]) == list(w["new_terms"])


def test_vocab_growth_bigrams_match_sql(ray_session):
    from opentelemetry_collector_ray.stages.corpusstats import (
        vocab_growth)

    rng = np.random.default_rng(13)
    words = ["".join(p) for p in
             __import__("itertools").product("abcd", "wxyz")]
    docs = [" ".join(rng.choice(words, rng.integers(0, 8)))
            for _ in range(200)]
    tbl = pa.table({"doc_id": pa.array(np.arange(200), pa.int64()),
                    "text": pa.array(docs)})
    out = vocab_growth(ray.data.from_arrow(tbl).repartition(4),
                       bucket_size=20, ngram=2).to_pandas()
    con = duckdb.connect()
    con.register("t", tbl)
    want = con.execute("""
        WITH l AS (SELECT doc_id, regexp_extract_all(lower(text),
                     '[a-z]+') AS ts FROM t),
        tok AS (SELECT doc_id, ts[i] || ' ' || ts[i+1] AS term
                FROM l, unnest(range(1, len(ts))) AS r(i)),
        f AS (SELECT term, min(doc_id) AS fd FROM tok GROUP BY term)
        SELECT fd // 20 AS bucket, count(*) AS new_terms
        FROM f GROUP BY 1""").df()
    g = out.sort_values("bucket").reset_index(drop=True)
    w = want.sort_values("bucket").reset_index(drop=True)
    assert list(g["bucket"]) == list(w["bucket"])
    assert list(g["new_terms"]) == list(w["new_terms"])


def test_vocab_growth_guards(ray_session):
    from opentelemetry_collector_ray.stages.corpusstats import (
        vocab_growth)

    tbl = pa.table({"doc_id": pa.array([-1], pa.int64()),
                    "text": ["a b"]})
    with pytest.raises(ValueError, match="bucket_size"):
        vocab_growth(ray.data.from_arrow(tbl), bucket_size=0)
    with pytest.raises(Exception, match="non-negative"):
        vocab_growth(ray.data.from_arrow(tbl)).materialize()


def test_eval_ranking_planted(ray_session):
    from opentelemetry_collector_ray.stages.ranking import eval_ranking

    results = ray.data.from_arrow(pa.table({
        "query": ["a"] * 5 + ["b"] * 5,
        "doc_id": pa.array(list(range(5)) * 2, pa.int64()),
        "rank": pa.array([1, 2, 3, 4, 5] * 2, pa.int64())}))
    # query a: docs 2 and 4 relevant -> first at rank 3, 2 hits;
    # query b: doc 99 relevant but never retrieved -> rr 0, 0 hits;
    # query c: judged but absent from results -> rr 0 row still emitted.
    qrels = ray.data.from_arrow(pa.table({
        "query": ["a", "a", "b", "c"],
        "doc_id": pa.array([2, 4, 99, 1], pa.int64())}))
    out = eval_ranking(results, qrels, k=3).to_pandas() \
        .set_index("query").sort_index()
    assert out.loc["a", "rr_scaled"] == 1_000_000 // 3
    assert out.loc["a", "hits_at_k"] == 1      # doc 4 is rank 4 > k=3
    assert out.loc["a", "n_rel"] == 2
    assert out.loc["b", "rr_scaled"] == 0
    assert out.loc["b", "hits_at_k"] == 0 and out.loc["b", "n_rel"] == 1
    assert out.loc["c", "rr_scaled"] == 0 and out.loc["c", "n_rel"] == 1


def test_eval_ranking_guards(ray_session):
    from opentelemetry_collector_ray.stages.ranking import eval_ranking

    ds = ray.data.from_arrow(pa.table(
        {"query": ["a"], "doc_id": pa.array([1], pa.int64()),
         "rank": pa.array([1], pa.int64())}))
    with pytest.raises(ValueError, match="positive"):
        eval_ranking(ds, ds, k=0)


def test_yaml_parity_new_processors(ray_session, tmp_path):
    """fuzzy_lookup / top_share / vocab_growth built from YAML produce
    the same rows as the direct calls."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_ray.config import PipelineConfig
    from opentelemetry_collector_ray.pipelines.builder import (
        build_dataset)
    from opentelemetry_collector_ray.stages.corpusstats import (
        vocab_growth)
    from opentelemetry_collector_ray.stages.mixing import (
        select_top_share_by)

    t = pa.table({"s": ["kitten", "mittan"],
                  "k": pa.array([1, 1], pa.int64()),
                  "v": pa.array([10, 3], pa.int64()),
                  "doc_id": pa.array([0, 1], pa.int64()),
                  "text": ["a b c", "a d"]})
    p = tmp_path / "t.parquet"
    pq.write_table(t, str(p))
    ds = ray.data.read_parquet(str(p))

    def run(proc_name, proc_cfg):
        return build_dataset(PipelineConfig.from_dict({
            "receivers": {"parquet": {"paths": str(p)}},
            "processors": {proc_name: proc_cfg},
            "exporters": {"debug": {}},
            "service": {"pipelines": {"logs": {
                "receivers": ["parquet"], "processors": [proc_name],
                "exporters": ["debug"]}}},
        })).to_pandas()

    y = run("fuzzy_lookup", {"column": "s", "candidates": ["kitten"],
                             "max_dist": 2})
    d = fuzzy_lookup(ds, ["kitten"], "s", max_dist=2).to_pandas()
    assert sorted(zip(y["s"], y["fuzzy_dist"].fillna(-1))) == \
        sorted(zip(d["s"], d["fuzzy_dist"].fillna(-1)))

    y = run("top_share", {"key": "k", "value_col": "v",
                          "id_col": "doc_id", "share_num": 1,
                          "share_den": 2})
    d2 = select_top_share_by(ds, "k", "v", "doc_id", share_num=1,
                             share_den=2).to_pandas()
    assert sorted(y["doc_id"]) == sorted(d2["doc_id"])

    y = run("vocab_growth", {"bucket_size": 1})
    d3 = vocab_growth(ds, bucket_size=1).to_pandas()
    assert sorted(y["bucket"]) == sorted(d3["bucket"])
    assert sorted(y["new_terms"]) == sorted(d3["new_terms"])
