"""Substring-level duplicate detection (stages/subdedup.py) —
planted-passage ground truth, within-doc repeats, stride semantics,
validation."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from opentelemetry_collector_ray.stages.subdedup import (
    duplicate_spans, duplication_stats)


def _alpha(i):
    s = ""
    i += 1
    while i:
        s += chr(97 + i % 26)
        i //= 26
    return s


def _words(base, n):
    return [_alpha(base * 1000 + i) for i in range(n)]


def _corpus():
    passage = " ".join(_words(900, 60))
    docs = [" ".join(_words(d, 200)) for d in range(10)]
    docs[3] = " ".join(_words(3, 100)) + " " + passage + " " + \
        " ".join(_words(33, 40))
    docs[7] = passage + " " + " ".join(_words(7, 150))
    rep = " ".join(_words(800, 50))
    docs[9] = rep + " " + " ".join(_words(9, 80)) + " " + rep
    return pa.table({"doc_id": pa.array(np.arange(10)),
                     "text": pa.array(docs)})


def test_planted_passages_found_exactly(ray_session):
    ds = ray.data.from_arrow(_corpus()).repartition(4)
    spans = duplicate_spans(ds, window=50).to_pandas() \
        .sort_values(["doc_id", "span_start"])
    assert spans.values.tolist() == [
        [3, 100, 160],   # shared passage inside doc 3
        [7, 0, 60],      # same passage opens doc 7
        [9, 0, 50],      # within-doc repeat, first copy
        [9, 130, 180],   # within-doc repeat, second copy
    ]
    stats = duplication_stats(ds, window=50).to_pandas() \
        .sort_values("doc_id")
    assert len(stats) == 10  # every doc reports, clean ones zero-filled
    byid = stats.set_index("doc_id")
    assert byid.loc[3, "dup_tokens"] == 60 and byid.loc[3, "n_spans"] == 1
    assert byid.loc[7, "dup_tokens"] == 60
    assert byid.loc[9, "dup_tokens"] == 100 and byid.loc[9, "n_spans"] == 2
    assert byid.loc[0, "dup_tokens"] == 0 and byid.loc[0, "n_spans"] == 0
    assert byid.loc[3, "n_tokens"] == 200 and byid.loc[9, "n_tokens"] == 180


def test_stride_is_content_anchored(ray_session):
    """Review finding: stride sampling must be CONTENT-anchored — a
    long passage duplicated at offsets 100 and 1 (incongruent mod 5)
    must still be found at stride=5, because both copies emit the
    identical hash-selected window subset."""
    passage = " ".join(_words(950, 150))
    docs = [" ".join(_words(d, 200)) for d in range(6)]
    docs[2] = " ".join(_words(2, 100)) + " " + passage
    docs[5] = _words(5, 1)[0] + " " + passage + " " + \
        " ".join(_words(55, 30))
    tbl = pa.table({"doc_id": pa.array(np.arange(6)),
                    "text": pa.array(docs)})
    spans = duplicate_spans(ray.data.from_arrow(tbl).repartition(3),
                            window=50, stride=5).to_pandas()
    docs_found = set(spans["doc_id"])
    assert {2, 5} <= docs_found
    d2 = spans[spans.doc_id == 2]
    assert d2["span_start"].min() >= 100 and \
        d2["span_end"].max() <= 250
    assert (d2["span_end"] - d2["span_start"]).sum() >= 50


def test_randomized_corpus_matches_duckdb(ray_session):
    """Randomized equivalence: a small-vocab corpus (natural window
    collisions everywhere) must produce byte-identical spans and stats
    to the content-keyed SQL oracle at window=5."""
    import duckdb
    import pandas as pd

    rng = np.random.default_rng(41)
    vocab = [_alpha(i) for i in range(12)]
    docs = [" ".join(rng.choice(vocab, rng.integers(3, 40)))
            for _ in range(120)]
    tbl = pa.table({"doc_id": pa.array(np.arange(120)),
                    "text": pa.array(docs)})
    W = 5
    spans = duplicate_spans(ray.data.from_arrow(tbl).repartition(5),
                            window=W).to_pandas()
    stats = duplication_stats(ray.data.from_arrow(tbl).repartition(5),
                              window=W).to_pandas()
    base = f"""
WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+')
                    AS toks FROM tbl),
w AS (SELECT doc_id, i AS s, array_to_string(toks[i+1 : i+{W}], ' ') AS win
      FROM (SELECT doc_id, toks,
                   unnest(generate_series(0, len(toks) - {W})) AS i
            FROM tok WHERE len(toks) >= {W})),
d AS (SELECT win FROM w GROUP BY win HAVING count(*) >= 2),
hits AS (SELECT w.doc_id, w.s FROM w JOIN d USING (win)),
isl AS (SELECT doc_id, s,
        CASE WHEN lag(s) OVER (PARTITION BY doc_id ORDER BY s) IS NULL
               OR s > lag(s) OVER (PARTITION BY doc_id ORDER BY s) + {W}
             THEN 1 ELSE 0 END AS new_run FROM hits),
g AS (SELECT doc_id, s,
      sum(new_run) OVER (PARTITION BY doc_id ORDER BY s) AS grp FROM isl)
"""
    exp_spans = duckdb.sql(base + f"""
SELECT doc_id, CAST(min(s) AS BIGINT) AS span_start,
       CAST(max(s) + {W} AS BIGINT) AS span_end
FROM g GROUP BY doc_id, grp""").df()
    exp_stats = duckdb.sql(base + f""",
spans AS (SELECT doc_id, min(s) AS a, max(s) + {W} AS b
          FROM g GROUP BY doc_id, grp),
cov AS (SELECT doc_id, CAST(sum(b - a) AS BIGINT) AS dup_tokens,
        CAST(count(*) AS BIGINT) AS n_spans FROM spans GROUP BY doc_id)
SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
       COALESCE(cov.dup_tokens, 0) AS dup_tokens,
       COALESCE(cov.n_spans, 0) AS n_spans
FROM tok t LEFT JOIN cov USING (doc_id)""").df()

    def canon(df):
        df = df[sorted(df.columns)].copy()
        return df.sort_values(list(df.columns),
                              kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(canon(spans), canon(exp_spans),
                                  check_dtype=False, check_exact=True)
    pd.testing.assert_frame_equal(canon(stats), canon(exp_stats),
                                  check_dtype=False, check_exact=True)
    assert (stats["dup_tokens"] > 0).sum() >= 5  # the test has teeth


def test_subdedup_validation(ray_session):
    ds = ray.data.from_arrow(pa.table({"doc_id": [1], "text": ["x"]}))
    with pytest.raises(ValueError):
        duplicate_spans(ds, window=1)
    with pytest.raises(ValueError):
        duplicate_spans(ds, stride=0)
    with pytest.raises(ValueError):
        duplication_stats(ds, min_count=1)
    # corpus with no duplicates at all → empty spans, zero-filled stats
    clean = pa.table({"doc_id": pa.array([1, 2]),
                      "text": pa.array([" ".join(_words(1, 30)),
                                        " ".join(_words(2, 30))])})
    assert duplicate_spans(ray.data.from_arrow(clean),
                           window=20).count() == 0
    st = duplication_stats(ray.data.from_arrow(clean),
                           window=20).to_pandas()
    assert st["dup_tokens"].tolist() == [0, 0]
    assert st["n_tokens"].tolist() == [30, 30]
