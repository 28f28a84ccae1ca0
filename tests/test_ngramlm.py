"""Bigram LM screen (stages/ngramlm.py): hand-computed planted truth,
in-row-only pairs, guards, and the exact integer lanes."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from opentelemetry_collector_ray.stages.ngramlm import (
    bigram_counts, score_bigram_lm)


def test_bigram_counts_do_not_cross_rows(ray_session):
    tbl = pa.table({"text": pa.array(["a b", "b a b", "z"])})
    out = bigram_counts(ray.data.from_arrow(tbl).repartition(2)) \
        .to_pandas().sort_values(["w1", "w2"]).reset_index(drop=True)
    got = {(r.w1, r.w2): r.n for r in out.itertuples()}
    # rows: (a,b) from doc1, (b,a)+(a,b) from doc2; never (b,b) across
    assert got == {("a", "b"): 2, ("b", "a"): 1}


def test_score_matches_hand_computation(ray_session):
    texts = ["a b a b", "a a"]
    tbl = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array(texts)})
    out = score_bigram_lm(
        lambda: ray.data.from_arrow(tbl).repartition(2)) \
        .to_pandas().set_index("doc_id")
    # corpus: unigrams a=4 b=2 (V=2); bigrams ab=2 ba=1 aa=1
    # doc1 pairs: ab, ba, ab -> n=3, sum_c2 = 2+1+2 = 5
    # doc2 pairs: aa -> n=1, sum_c2 = 1
    assert out.loc[1, "n_bigrams"] == 3
    assert out.loc[1, "sum_bigram_n"] == 5
    assert out.loc[2, "n_bigrams"] == 1
    assert out.loc[2, "sum_bigram_n"] == 1
    assert (out["n_unseen"] == 0).all()
    lp1 = (math.log((2 + 1) / (4 + 2)) + math.log((1 + 1) / (2 + 2))
           + math.log((2 + 1) / (4 + 2)))
    assert out.loc[1, "logprob"] == pytest.approx(lp1, rel=1e-12)
    ppl1 = math.exp(-lp1 / 3)
    assert out.loc[1, "ppl_x1000"] == round(ppl1 * 1000)
    # repeated text scores better (lower ppl) than rare transitions
    assert out.loc[1, "ppl_x1000"] < 1000 * math.exp(
        -math.log(1 / (4 + 2)))


def test_docs_without_bigrams_are_omitted(ray_session):
    tbl = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                    "text": pa.array(["only", "", "two words"])})
    out = score_bigram_lm(lambda: ray.data.from_arrow(tbl)).to_pandas()
    assert sorted(out["doc_id"]) == [3]


def test_vocab_guard(ray_session):
    tbl = pa.table({"doc_id": pa.array([1], pa.int64()),
                    "text": pa.array(["a b c d e f"])})
    with pytest.raises(ValueError, match="max_vocab"):
        score_bigram_lm(lambda: ray.data.from_arrow(tbl),
                        max_vocab=3).to_pandas()
    with pytest.raises(ValueError, match="max_bigrams"):
        score_bigram_lm(lambda: ray.data.from_arrow(tbl),
                        max_bigrams=2).to_pandas()
