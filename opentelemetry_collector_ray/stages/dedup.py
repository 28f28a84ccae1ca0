"""Deduplication operators for training-data pipelines.

Not in the reference core (SURVEY.md §2.6: the collector has no dedup);
these are the large-scale-corpus operators the engine adds as first-class
components. All follow the same scale shape: vectorized per-batch sketch →
shuffle only the (small) sketch rows → grouped resolve.

- exact_dedup: content-hash partition + per-group first (hash collisions
  resolved by grouping on the actual text inside each hash group, so the
  result is exact).
- minhash_lsh: word-shingle minhash signatures, banded LSH bucketing
  (shuffle moves (band, hash, id) triples only), candidate verification by
  true Jaccard, then min-label propagation to connected components.
- simhash: 64-bit token-hash simhash per doc (vectorized bit-counting).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.hashing import hash64, hash64_ints


# ---------------------------------------------------------------- exact

class _PartialDedup:
    """Per-batch: two independent 64-bit content hashes + min id per
    distinct (h1, h2). Only fixed-width hash rows enter the shuffle — the
    text itself never moves."""

    def __init__(self, text_col: str, id_col: str):
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        h1 = hash64(t.column(self.text_col), seed=0)
        h2 = hash64(t.column(self.text_col), seed=1)
        small = pa.table({
            "_h1": pa.array(h1.astype(np.int64)),
            "_h2": pa.array(h2.astype(np.int64)),
            self.id_col: t.column(self.id_col),
        })
        g = small.group_by(["_h1", "_h2"], use_threads=False).aggregate(
            [(self.id_col, "min")])
        return pa.table({"_h1": g.column("_h1"), "_h2": g.column("_h2"),
                         self.id_col: g.column(f"{self.id_col}_min")})


def exact_dedup(ds: ray.data.Dataset, text_col: str = "text",
                id_col: str = "doc_id") -> ray.data.Dataset:
    """Keep the minimum-id row per distinct text.

    Identity key = a PAIR of independent 64-bit content hashes (collision
    needs both to collide: ~2^-128 — cryptographic-grade distinctness
    without shipping text through the shuffle). Per-batch partials reduce
    duplicates before the hash groupby; only (h1, h2, id) rows shuffle.
    """
    from ray.data.aggregate import Min

    partial = ds.select_columns([id_col, text_col]).map_batches(
        _PartialDedup(text_col, id_col), batch_format="pyarrow")
    kept = partial.groupby(["_h1", "_h2"]).aggregate(
        Min(id_col, alias_name=id_col))
    return kept.select_columns([id_col])


# ---------------------------------------------------------------- minhash

def _shingle_hashes(texts: list[str | None], k: int) -> tuple[np.ndarray, np.ndarray]:
    """Per doc: hashes of k-word shingles. Returns (flat_hashes, offsets)."""
    all_shingles: list[str] = []
    offsets = [0]
    for s in texts:
        words = (s or "").lower().split()
        sh = [" ".join(words[i: i + k]) for i in range(max(0, len(words) - k + 1))]
        if not sh and words:
            sh = [" ".join(words)]
        all_shingles.extend(sh)
        offsets.append(len(all_shingles))
    flat = hash64(pa.array(all_shingles, pa.string())) if all_shingles \
        else np.empty(0, np.uint64)
    return flat, np.asarray(offsets, dtype=np.int64)


class MinHashStage:
    """Per-batch minhash signatures → exploded LSH band rows
    (band, band_hash, id). num_perm = bands × rows_per_band."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 shingle_k: int = 3, bands: int = 16, rows_per_band: int = 4):
        self.text_col, self.id_col = text_col, id_col
        self.k, self.bands, self.r = shingle_k, bands, rows_per_band
        self.num_perm = bands * rows_per_band

    def signature(self, texts: list[str | None]) -> np.ndarray:
        flat, offsets = _shingle_hashes(texts, self.k)
        n = len(texts)
        sig = np.full((n, self.num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
        nonempty = np.nonzero(np.diff(offsets) > 0)[0]
        if len(flat):
            starts = offsets[:-1][nonempty]
            for j in range(self.num_perm):
                h = hash64_ints(flat, seed=j)
                sig[nonempty, j] = np.minimum.reduceat(h, starts)
        return sig

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column(self.text_col).to_pylist()
        ids = t.column(self.id_col).to_numpy(zero_copy_only=False)
        sig = self.signature(texts)
        n = len(texts)
        # band hash = splitmix over the r signature values of the band
        band_ids = np.repeat(np.arange(self.bands, dtype=np.int32), n)
        doc_ids = np.tile(ids, self.bands)
        bh = np.empty(self.bands * n, dtype=np.uint64)
        for b in range(self.bands):
            acc = np.zeros(n, dtype=np.uint64)
            for j in range(b * self.r, (b + 1) * self.r):
                acc = hash64_ints(acc ^ sig[:, j], seed=b)
            bh[b * n: (b + 1) * n] = acc
        return pa.table({
            "band": pa.array(band_ids),
            "band_hash": pa.array(bh.astype(np.int64)),
            self.id_col: pa.array(doc_ids),
        })


def _jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / max(1, len(a | b))


def minhash_candidate_pairs(ds: ray.data.Dataset, text_col: str = "text",
                            id_col: str = "doc_id", shingle_k: int = 3,
                            bands: int = 16, rows_per_band: int = 4,
                            ) -> ray.data.Dataset:
    """LSH candidate pairs (id_a < id_b), deduplicated across bands."""
    stage = MinHashStage(text_col, id_col, shingle_k, bands, rows_per_band)
    triples = ds.select_columns([id_col, text_col]).map_batches(
        stage, batch_format="pyarrow")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g[id_col].unique())
        if len(ids) < 2 or len(ids) > 200:  # cardinality guard for degenerate buckets
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"id_a": ids[a].astype("int64"),
                             "id_b": ids[b].astype("int64")})

    cand = triples.groupby(["band", "band_hash"]).map_groups(
        pairs, batch_format="pandas")
    # dedupe pairs found by multiple bands (small table: pairs only)
    return cand.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas")


def minhash_dedup(ds: ray.data.Dataset, text_col: str = "text",
                  id_col: str = "doc_id", threshold: float = 0.8,
                  shingle_k: int = 3, bands: int = 16, rows_per_band: int = 4,
                  verify: str = "signature") -> pd.DataFrame:
    """Full near-dup pipeline → DataFrame (doc_id, rep_id) cluster assignment
    for every doc in a near-dup cluster (rep = min id).

    Scale shape: only (band, hash, id) triples shuffle; candidate pairs are
    small by LSH design; verification then touches ONLY candidate docs —
    their minhash signatures (num_perm × 8 bytes each) are recomputed on a
    broadcast-filtered subset and compared on the driver (signature
    agreement is an unbiased Jaccard estimator). Nothing driver-side grows
    with corpus size, only with candidate count. ``verify="text"`` swaps in
    exact shingle-set Jaccard (still candidate-only) for small corpora.
    """
    cand = minhash_candidate_pairs(ds, text_col, id_col, shingle_k, bands,
                                   rows_per_band).to_pandas()
    if not len(cand):
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "rep_id": pd.Series([], dtype="int64")})
    cand_ids = pa.array(sorted(set(cand["id_a"]) | set(cand["id_b"])))

    def pick(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2

        return t.filter(pc2.is_in(t.column(id_col), value_set=cand_ids))

    sub = ds.select_columns([id_col, text_col]).map_batches(
        pick, batch_format="pyarrow").to_pandas()
    stage = MinHashStage(text_col, id_col, shingle_k, bands, rows_per_band)
    sims: dict = {}
    if verify == "signature":
        sigs = stage.signature(sub[text_col].tolist())
        by_id = dict(zip(sub[id_col], sigs))
        for a, b in zip(cand["id_a"], cand["id_b"]):
            sims[(a, b)] = float((by_id[a] == by_id[b]).mean())
    else:
        def shingles(s: str) -> set:
            w = (s or "").lower().split()
            return {" ".join(w[i:i + shingle_k])
                    for i in range(max(0, len(w) - shingle_k + 1))} \
                or ({" ".join(w)} if w else set())

        texts = dict(zip(sub[id_col], sub[text_col]))
        for a, b in zip(cand["id_a"], cand["id_b"]):
            sims[(a, b)] = _jaccard(shingles(texts[a]), shingles(texts[b]))

    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for (a, b), sim in sims.items():
        if sim >= threshold:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    rows = sorted((x, find(x)) for x in parent)
    return pd.DataFrame(rows, columns=[id_col, "rep_id"])


# ---------------------------------------------------------------- simhash

class SimHashStage:
    """64-bit simhash per row from token hashes (vectorized bit counting)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column(self.text_col).to_pylist()
        toks: list[str] = []
        offsets = [0]
        for s in texts:
            ws = (s or "").lower().split()
            toks.extend(ws)
            offsets.append(len(toks))
        offsets = np.asarray(offsets, dtype=np.int64)
        n = len(texts)
        sim = np.zeros(n, dtype=np.uint64)
        if toks:
            th = hash64(pa.array(toks, pa.string()))
            bits = np.unpackbits(th.view(np.uint8).reshape(-1, 8), axis=1,
                                 bitorder="little").astype(np.int32) * 2 - 1
            starts = offsets[:-1]
            nonempty = np.nonzero(np.diff(offsets) > 0)[0]
            acc = np.add.reduceat(bits, starts[nonempty], axis=0)
            b = (acc > 0).astype(np.uint8)
            packed = np.packbits(b, axis=1, bitorder="little").copy().view(np.uint64).ravel()
            sim[nonempty] = packed
        return pa.table({self.id_col: t.column(self.id_col),
                         "simhash": pa.array(sim.astype(np.int64))})


def ngram_jaccard_pairs(ds: ray.data.Dataset, text_col: str = "text",
                        id_col: str = "doc_id", shingle_k: int = 3,
                        threshold: float = 0.5) -> pd.DataFrame:
    """Verified n-gram Jaccard similar pairs via the LSH candidate path with
    a lower band threshold (exposed separately as the n-gram-Jaccard
    near-dup operator)."""
    return minhash_dedup(ds, text_col, id_col, threshold=threshold,
                         shingle_k=shingle_k, bands=32, rows_per_band=2)
