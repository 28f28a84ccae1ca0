"""Benchmark contamination screening (stages/contamination.py):
planted phrases, tokenizer normalization, boundary and overlap
semantics."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from opentelemetry_collector_ray.stages.contamination import (
    _phrase_table, _rolling_hashes, flag_contaminated)
from opentelemetry_collector_ray.functions.hashing import hash64


DOCS = [
    ("d1", "the quick brown fox jumps over the lazy dog"),
    ("d2", "completely unrelated text about spark and ray"),
    ("d3", "prefix text THE QUICK, BROWN fox! suffix"),   # normalized hit
    ("d4", "quick brown"),                                 # partial only
    ("d5", "quick brown fox quick brown fox"),             # two hits
    ("d6", ""),
]
PHRASES = ["quick brown fox", "lazy dog"]


def _ds(blocks=3):
    return ray.data.from_arrow(pa.table({
        "doc_id": [d for d, _ in DOCS],
        "text": [t for _, t in DOCS]})).repartition(blocks)


def test_flag_contaminated_planted(ray_session):
    out = flag_contaminated(_ds(), PHRASES).to_pandas()
    got = dict(zip(out["doc_id"], out["contaminated"]))
    assert got == {"d1": True, "d2": False, "d3": True, "d4": False,
                   "d5": True, "d6": False}
    hits = dict(zip(out["doc_id"], out["n_hits"]))
    assert hits["d1"] == 2  # quick-brown-fox + lazy-dog
    assert hits["d5"] == 2  # two occurrences of the same phrase
    assert hits["d4"] == 0


def test_no_cross_document_windows(ray_session):
    # adjacent rows ending/starting with phrase halves must NOT match
    ds = ray.data.from_arrow(pa.table({
        "doc_id": ["a", "b"],
        "text": ["ends with quick brown", "fox starts here"]}))
    out = flag_contaminated(ds, ["quick brown fox"]).to_pandas()
    assert not out["contaminated"].any()


def test_phrase_table_groups_by_length():
    t = _phrase_table(["one two", "three four", "five six seven"])
    assert sorted(t) == [2, 3]
    assert len(t[2]) == 2 and len(t[3]) == 1
    assert (np.diff(t[2].astype(np.uint64)) >= 0).all()


def test_rolling_hash_masks_boundaries():
    toks = pa.array(["a", "b", "c", "d"], pa.string())
    th = hash64(toks)
    rows = np.array([0, 0, 1, 1])
    h, hrows, hstarts = _rolling_hashes(th, rows, 2)
    # windows: (a,b) row0, (b,c) CROSSES, (c,d) row1 → 2 survive
    assert len(h) == 2 and list(hrows) == [0, 1]
    assert list(hstarts) == [0, 2]  # flat-token starts of the survivors


def test_empty_phrase_rejected(ray_session):
    with pytest.raises(ValueError):
        flag_contaminated(_ds(), ["!!!"])
    with pytest.raises(ValueError):
        flag_contaminated(_ds(), [])


def test_ngram_counts_matches_reference(ray_session):
    """corpusstats.ngram_counts: vectorized shifted-view bigrams equal a
    per-row python reference; document boundaries never produce grams."""
    import re

    from opentelemetry_collector_ray.stages.corpusstats import ngram_counts

    texts = ["a b c a b", "b c", "x", "", "c a? b!"]
    ds = ray.data.from_arrow(pa.table({"text": texts})).repartition(2)
    out = ngram_counts(ds, n=2).to_pandas()
    got = dict(zip(out["ngram"], out["n"]))
    ref = {}
    for t in texts:
        toks = [w for w in re.split(r"[^a-z]+", t.lower()) if w]
        for i in range(len(toks) - 1):
            g = f"{toks[i]} {toks[i+1]}"
            ref[g] = ref.get(g, 0) + 1
    assert got == ref
    # trigrams too
    out3 = ngram_counts(ds, n=3).to_pandas()
    got3 = dict(zip(out3["ngram"], out3["n"]))
    assert got3["a b c"] == 1 and got3["c a b"] == 2
    with pytest.raises(ValueError):
        ngram_counts(ds, n=1)


def test_frequent_terms_exact_heavy_hitters(ray_session):
    """corpusstats.frequent_terms: local-threshold candidates + exact
    recount equals the brute-force frequent set at several thresholds,
    across block layouts (the pigeonhole completeness guarantee)."""
    import re

    from opentelemetry_collector_ray.stages.corpusstats import frequent_terms

    rng = np.random.default_rng(13)
    # pure-alpha vocab (the corpus tokenizer splits on [^a-z]+)
    vocab = ["".join(chr(ord('a') + int(c)) for c in str(i)).rjust(3, 'q')
             for i in range(50)]
    p = np.array([50, 30, 20, 10, 5] + [1] * 45, float)
    texts = [" ".join(rng.choice(vocab, 40, p=p / p.sum()))
             for _ in range(60)]
    toks = [w for t in texts for w in re.split(r"[^a-z]+", t.lower()) if w]
    total = len(toks)
    from collections import Counter
    cnt = Counter(toks)
    for num, den in ((1, 50), (1, 20), (3, 100)):
        for blocks in (1, 4, 11):
            tbl = pa.table({"text": texts})
            out = frequent_terms(
                lambda: ray.data.from_arrow(tbl).repartition(blocks),
                num, den).to_pandas()
            got = dict(zip(out["term"], out["n"]))
            exp = {t: c for t, c in cnt.items() if c * den >= num * total}
            assert got == exp, (num, den, blocks)


def test_frequent_terms_validation(ray_session):
    from opentelemetry_collector_ray.stages.corpusstats import frequent_terms

    with pytest.raises(ValueError):
        frequent_terms(lambda: ray.data.range(1), 0, 10)
    # empty corpus → empty result
    tbl = pa.table({"text": pa.array([], pa.string())})
    out = frequent_terms(lambda: ray.data.from_arrow(tbl), 1, 10
                         ).to_pandas()
    assert len(out) == 0


def test_cross_decontaminate_fuzzy(ray_session):
    """MinHash train/eval decontamination: near-dups of eval docs (and
    their transitive train near-dups) dropped; unrelated docs and
    train-internal dup clusters untouched."""
    from opentelemetry_collector_ray.stages.dedup import cross_decontaminate

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark forest tonight")
    train = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            base,                                # ~ eval doc → drop
            base.replace("dark", "bright"),      # ~ doc 0 → transitive drop
            "completely different text about spark ray data pipelines "
            "and arrow batches flowing through the streaming executor",
            "another unrelated document with its own words entirely "
            "separate from every other text in this tiny corpus here",
            "another unrelated document with its own words entirely "
            "separate from every other text in this small corpus here",
            # docs 3+4 are a TRAIN-INTERNAL near-dup pair: kept
        ]),
    })
    ref = pa.table({
        "doc_id": pa.array([0], pa.int64()),  # id collides with train: ok
        "text": pa.array([base.replace("tonight", "today")]),
    })
    out = cross_decontaminate(
        ray.data.from_arrow(train).repartition(2),
        ray.data.from_arrow(ref), threshold=0.5).to_pandas()
    assert sorted(out["doc_id"]) == [2, 3, 4]

    bad = pa.table({"doc_id": pa.array(["a"]), "text": pa.array(["x"])})
    with pytest.raises(Exception, match="integer id"):
        cross_decontaminate(ray.data.from_arrow(bad),
                            ray.data.from_arrow(ref)).to_pandas()
