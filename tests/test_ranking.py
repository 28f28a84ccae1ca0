"""TF-IDF / BM25 scoring and the persisted inverted index
(stages/ranking.py) — python row-reference parity, conjunction
semantics, partition pruning."""

import math
import os
import re

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from opentelemetry_collector_ray.stages import ranking as R

DOCS = [
    ("d1", "alpha beta gamma alpha"),
    ("d2", "beta beta delta"),
    ("d3", "alpha epsilon! zeta-beta"),
    ("d4", "nothing relevant here"),
    ("d5", ""),
    ("d6", "ALPHA Beta ALPHA alpha"),
]


def _toks(text):
    return [t for t in re.split(r"[^a-z]+", text.lower()) if t]


def _make(blocks=3):
    tbl = pa.table({"doc_id": [d for d, _ in DOCS],
                    "text": [t for _, t in DOCS]})
    return lambda: ray.data.from_arrow(tbl).repartition(blocks)


def test_corpus_query_stats(ray_session):
    st = R.corpus_query_stats(_make(), ["alpha", "beta", "missing"])
    assert st["n_docs"] == 6
    assert st["total_tokens"] == sum(len(_toks(t)) for _, t in DOCS)
    assert st["df"] == {"alpha": 3, "beta": 4, "missing": 0}


def test_score_tfidf_int_matches_reference(ray_session):
    terms, scale = ["alpha", "beta"], 1000
    out = R.score_tfidf_int(_make(), terms, scale=scale).to_pandas()
    df = {"alpha": 3, "beta": 4}
    w = {t: (6 * scale) // (df[t] + 1) for t in terms}
    got = dict(zip(out["doc_id"], out["score"]))
    for d, text in DOCS:
        tf = {t: _toks(text).count(t) for t in terms}
        assert got[d] == sum(tf[t] * w[t] for t in terms), d
    nm = dict(zip(out["doc_id"], out["n_matched"]))
    assert nm["d1"] == 2 and nm["d4"] == 0 and nm["d5"] == 0


def test_score_bm25_matches_reference(ray_session):
    terms, k1, b = ["alpha", "beta"], 1.2, 0.75
    out = R.score_bm25(_make(), terms, k1=k1, b=b).to_pandas()
    N = 6
    df = {"alpha": 3, "beta": 4}
    avgdl = sum(len(_toks(t)) for _, t in DOCS) / N
    got = dict(zip(out["doc_id"], out["score"]))
    for d, text in DOCS:
        toks = _toks(text)
        exp = 0.0
        for t in terms:
            tf = toks.count(t)
            if tf == 0:
                continue
            idf = math.log1p((N - df[t] + 0.5) / (df[t] + 0.5))
            dl = len(toks)
            exp += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
        assert got[d] == pytest.approx(exp, rel=1e-12), d


def test_query_terms_validation(ray_session):
    with pytest.raises(ValueError):
        R.corpus_query_stats(_make(), [])
    with pytest.raises(ValueError):
        R.corpus_query_stats(_make(), ["a", "a"])
    with pytest.raises(ValueError):
        R.corpus_query_stats(_make(), [f"t{i}" for i in range(300)])


def test_inverted_index_build_query(ray_session, tmp_path):
    idx = str(tmp_path / "inv")
    R.build_inverted_index(ray.data.from_arrow(pa.table({
        "doc_id": [d for d, _ in DOCS],
        "text": [t for _, t in DOCS]})).repartition(3), idx, n_buckets=8)
    # hive partition dirs exist
    assert any(p.startswith("bucket=") for p in os.listdir(idx))
    # mode=any: exploded distinct postings
    posts = R.query_inverted_index(idx, ["alpha", "beta"], n_buckets=8
                                   ).to_pandas()
    got = set(zip(posts["term"], posts["doc_id"]))
    exp = {(t, d) for d, text in DOCS for t in set(_toks(text))
           if t in ("alpha", "beta")}
    assert got == exp
    # mode=all: conjunction
    both = R.query_inverted_index(idx, ["alpha", "beta"], mode="all",
                                  n_buckets=8).to_pandas()
    assert set(both["doc_id"]) == {"d1", "d3", "d6"}
    # a term set whose conjunction is empty
    none = R.query_inverted_index(idx, ["alpha", "delta"], mode="all",
                                  n_buckets=8).to_pandas()
    assert len(none) == 0


def test_inverted_index_prunes_partitions(ray_session, tmp_path):
    idx = str(tmp_path / "inv2")
    # many buckets so one term's bucket is a strict subset of the dirs
    R.build_inverted_index(ray.data.from_arrow(pa.table({
        "doc_id": [d for d, _ in DOCS],
        "text": [t for _, t in DOCS]})), idx, n_buckets=32)
    from opentelemetry_collector_ray.functions.hashing import bucket_of
    b = int(bucket_of(pa.array(["alpha"]), 32)[0])
    files = R.probe_paths(idx, ["alpha"], 32)
    assert files and all(f"bucket={b}" in f for f in files)
    n_dirs = sum(p.startswith("bucket=") for p in os.listdir(idx))
    assert n_dirs > 1  # pruning actually skipped partitions
    # and the pruned query still answers correctly
    posts = R.query_inverted_index(idx, ["alpha"], n_buckets=32).to_pandas()
    assert set(posts["doc_id"]) == {"d1", "d3", "d6"}


def test_positional_phrase_query(ray_session, tmp_path):
    import pyarrow as pa

    import ray.data

    from opentelemetry_collector_ray.stages.ranking import (
        build_positional_index, query_phrase)

    docs = [
        {"doc_id": 1, "text": "big red fox"},          # match
        {"doc_id": 2, "text": "red, fox"},              # punctuation
        {"doc_id": 3, "text": "red and fox"},           # NOT adjacent
        {"doc_id": 4, "text": "fox red"},               # wrong order
        {"doc_id": 5, "text": "red red fox"},           # match via pos 1
        {"doc_id": 6, "text": "RED FOX"},               # lowercased
    ]
    idx = str(tmp_path / "pidx")
    build_positional_index(
        ray.data.from_arrow(pa.Table.from_pylist(docs)), idx,
        n_buckets=8)
    out = query_phrase(idx, ["red", "fox"], n_buckets=8).to_pandas()
    assert sorted(out.doc_id.tolist()) == [1, 2, 5, 6]
    # 3-term phrase
    out3 = query_phrase(idx, ["big", "red", "fox"],
                        n_buckets=8).to_pandas()
    assert out3.doc_id.tolist() == [1]
    # absent term -> empty
    assert query_phrase(idx, ["red", "wolf"], n_buckets=8).count() == 0


def test_query_phrase_exchange_buckets_independent(ray_session,
                                                   tmp_path):
    """`n_buckets` is the index-layout contract (partition pruning);
    the doc-id exchange width is the separate ``exchange_buckets``
    knob — any value must give identical matches."""
    import pyarrow as pa

    import ray.data

    from opentelemetry_collector_ray.stages.ranking import (
        build_positional_index, query_phrase)

    docs = [{"doc_id": i, "text": t} for i, t in enumerate(
        ["big red fox", "red fox", "fox red", "red and fox"] * 3)]
    idx = str(tmp_path / "xidx")
    build_positional_index(
        ray.data.from_arrow(pa.Table.from_pylist(docs)), idx,
        n_buckets=8)
    want = sorted(query_phrase(idx, ["red", "fox"], n_buckets=8)
                  .to_pandas().doc_id.tolist())
    assert want == sorted([0, 1, 4, 5, 8, 9])
    for xb in (1, 3):
        got = sorted(query_phrase(idx, ["red", "fox"], n_buckets=8,
                                  exchange_buckets=xb)
                     .to_pandas().doc_id.tolist())
        assert got == want


def test_query_phrase_validates_terms(tmp_path):
    import pytest

    from opentelemetry_collector_ray.stages.ranking import query_phrase

    with pytest.raises(ValueError, match="2 terms"):
        query_phrase(str(tmp_path), ["solo"])


def test_query_phrase_string_ids_absent_term(ray_session, tmp_path):
    """Review regression: the absent-term empty path must carry the
    INDEXED id type (string here), not a hardcoded int64 — otherwise
    the semi-join chain type-mismatches."""
    import pyarrow as pa

    import ray.data

    from opentelemetry_collector_ray.stages.ranking import (
        build_positional_index, query_phrase)

    docs = [{"doc_id": "d1", "text": "red fox runs"},
            {"doc_id": "d2", "text": "red wolf"}]
    idx = str(tmp_path / "sidx")
    build_positional_index(
        ray.data.from_arrow(pa.Table.from_pylist(docs)), idx,
        n_buckets=4)
    out = query_phrase(idx, ["red", "zebra"], n_buckets=4)
    assert out.count() == 0
    ok = query_phrase(idx, ["red", "fox"], n_buckets=4).to_pandas()
    assert ok.doc_id.tolist() == ["d1"]
