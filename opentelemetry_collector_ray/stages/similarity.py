"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — numpy matmul per batch against a
broadcast query matrix, emitting only each batch's local top-k; the tiny
partial set merges at the end (tree-reduce shape: O(batches × k) rows move,
never the corpus). Scale path: LSH-bucketed ANN — signed random
projections assign each vector to a bucket; queries probe their own bucket
(+ multiprobe neighbors), turning the scan into a bucket-local matmul.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _stack(col: pa.ChunkedArray) -> np.ndarray:
    """list<float> column → (n, d) float64 matrix, zero-copy flat read."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    if n and len(flat) % n != 0:
        raise ValueError("embedding column has ragged list lengths — "
                         "fixed dimensionality required")
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _normalize(m: np.ndarray) -> np.ndarray:
    norm = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(norm, 1e-12)


SIM_SCALE = 1_000_000  # similarities reported as integer micro-units so
# cross-engine comparisons (and the driver's value hash) are FP-exact.


def _to_e6(sims: np.ndarray) -> np.ndarray:
    return np.floor(sims * SIM_SCALE + 0.5).astype(np.int64)


class BruteForceTopK:
    """Per-batch local top-k against a broadcast (or inline) query vector.
    Emits integer micro-cosine (cos_sim_e6) with (−sim, id) tie-break so the
    global merge is deterministic."""

    def __init__(self, query: np.ndarray | None = None, query_ref=None,
                 k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding"):
        if query is None:
            import ray

            query = ray.get(query_ref)  # broadcast fetch, once per actor
        self.q = _normalize(np.asarray(query, dtype=np.float64).reshape(1, -1))[0]
        self.k, self.id_col, self.vec_col = k, id_col, vec_col

    def __call__(self, t: pa.Table) -> pa.Table:
        x = _normalize(_stack(t.column(self.vec_col)))
        e6 = _to_e6(x @ self.q)
        ids = t.column(self.id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -e6))[: min(self.k, len(e6))]
        return pa.table({self.id_col: pa.array(ids[order]),
                         "cos_sim_e6": pa.array(e6[order])})


def knn_topk(ds: ray.data.Dataset, query: np.ndarray, k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding") -> pa.Table:
    """Brute-force cosine top-k of `query` over the corpus. Returns a small
    Arrow table (vec_id, cos_sim_e6) sorted by (-cos_sim_e6, vec_id)."""
    partials = ds.select_columns([id_col, vec_col]).map_batches(
        BruteForceTopK(query=query, k=k, id_col=id_col, vec_col=vec_col),
        batch_format="pyarrow")
    merged = partials.to_pandas()  # O(num_batches × k) rows — tiny by design
    if len(merged) == 0 or "cos_sim_e6" not in merged.columns:
        # Ray drops the schema of 0-row datasets in to_pandas
        return pa.table({id_col: pa.array([], pa.int64()),
                         "cos_sim_e6": pa.array([], pa.int64())})
    merged = merged.sort_values(["cos_sim_e6", id_col], ascending=[False, True],
                                kind="mergesort").head(k)
    return pa.Table.from_pandas(merged.reset_index(drop=True), preserve_index=False)


# ---------------------------------------------------------------- LSH ANN

def _projection_matrix(dim: int, n_bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, n_bits))


class LshBucketStage:
    """Assign each vector a signed-random-projection bucket id (n_bits)."""

    def __init__(self, dim: int, n_bits: int = 8, seed: int = 42,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        self.proj = _projection_matrix(dim, n_bits, seed)  # built once per actor
        self.id_col, self.vec_col = id_col, vec_col
        self.pow2 = 2 ** np.arange(n_bits, dtype=np.int64)

    def __call__(self, t: pa.Table) -> pa.Table:
        x = _stack(t.column(self.vec_col))
        bits = (x @ self.proj) > 0
        bucket = bits @ self.pow2
        return t.append_column("bucket", pa.array(bucket.astype(np.int64)))


def _probe_buckets(q: np.ndarray, proj: np.ndarray, n_bits: int,
                   multiprobe: int) -> set[int]:
    """Own bucket plus every bucket within Hamming distance ≤ multiprobe
    (all bit-flip combinations up to that size — C(n_bits, j) per level,
    so keep multiprobe small relative to n_bits)."""
    from itertools import combinations

    pow2 = 2 ** np.arange(n_bits, dtype=np.int64)
    qbits = (q @ proj) > 0
    targets = {int(qbits @ pow2)}
    for j in range(1, min(multiprobe, n_bits) + 1):
        for flip in combinations(range(n_bits), j):
            fb = qbits.copy()
            fb[list(flip)] = ~fb[list(flip)]
            targets.add(int(fb @ pow2))
    return targets


def build_ann_index(ds: ray.data.Dataset, index_dir: str, n_bits: int = 8,
                    seed: int = 42, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> dict:
    """Build-ONCE persisted LSH/IVF index: one full scan assigns every
    vector its signed-random-projection bucket and writes the corpus
    Hive-partitioned by bucket (``bucket=<b>/`` directories). Queries then
    read ONLY their probed bucket partitions — the repeated-query cost is
    sublinear in corpus size, vs. the per-call full rescan of
    ``ann_topk_lsh``. Metadata (n_bits/seed/dim) is stored next to the
    partitions; the projection matrix is re-derived from the seed.
    """
    import json
    import os

    head = ds.take(1)
    if not head:
        raise ValueError(
            "build_ann_index: empty corpus — no rows to infer the "
            "embedding dim from (pass a non-empty dataset)")
    dim = len(head[0][vec_col])
    bucketed = ds.select_columns([id_col, vec_col]).map_batches(
        LshBucketStage, fn_constructor_kwargs=dict(
            dim=dim, n_bits=n_bits, seed=seed, id_col=id_col, vec_col=vec_col),
        batch_format="pyarrow", concurrency=(1, 8))
    # keep bucket as a DATA column too (bucket_id): hive writers strip the
    # partition column, and multi-bucket query reads need it per row.
    bucketed = bucketed.map_batches(
        lambda t: t.append_column("bucket_id", t.column("bucket")),
        batch_format="pyarrow")
    bucketed.write_parquet(index_dir, partition_cols=["bucket"])
    meta = {"n_bits": n_bits, "seed": seed, "dim": dim,
            "id_col": id_col, "vec_col": vec_col}
    with open(os.path.join(index_dir, "_ann_meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


class IvfAssignStage:
    """Assign each vector its nearest spherical-k-means centroid id."""

    def __init__(self, centroids: np.ndarray, id_col: str = "vec_id",
                 vec_col: str = "embedding"):
        self.cent = _normalize(np.asarray(centroids, np.float64))
        self.id_col, self.vec_col = id_col, vec_col

    def __call__(self, t: pa.Table) -> pa.Table:
        x = _normalize(_stack(t.column(self.vec_col)))
        bucket = np.argmax(x @ self.cent.T, axis=1).astype(np.int64) \
            if t.num_rows else np.empty(0, np.int64)
        return t.append_column("bucket", pa.array(bucket))


def _spherical_kmeans(sample: np.ndarray, n_centroids: int, iters: int,
                      seed: int) -> np.ndarray:
    """Lloyd's iterations with cosine assignment (centroids re-normalized
    each round); deterministic seeded init from sample rows."""
    rng = np.random.default_rng(seed)
    x = _normalize(sample)
    cent = x[rng.choice(len(x), size=min(n_centroids, len(x)),
                        replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent



def _hash_sample(ds: ray.data.Dataset, sample_size: int, id_col: str,
                 vec_col: str) -> np.ndarray:
    """Deterministic hash-sampled subset of the embedding column for
    trainer stages — bounded driver memory (≈ sample_size × dim floats),
    one streaming pass; raises on an empty corpus (shared by the IVF and
    IVF-PQ builders)."""
    total = ds.count()
    prob_mod = max(1, total // max(1, sample_size))

    def pick(t: pa.Table) -> pa.Table:
        from ..functions.hashing import hash64

        h = hash64(t.column(id_col).cast(pa.string()), seed=9)
        return t.filter(pa.array(h % np.uint64(prob_mod) == 0))

    sample_tbl = ds.select_columns([id_col, vec_col]).map_batches(
        pick, batch_format="pyarrow").to_pandas()
    if not len(sample_tbl):
        raise ValueError("_hash_sample: empty corpus — nothing to train on")
    return np.stack(sample_tbl[vec_col].to_numpy()).astype(np.float64)


def build_ivf_index(ds: ray.data.Dataset, index_dir: str,
                    n_centroids: int = 64, sample_size: int = 65536,
                    iters: int = 10, seed: int = 42, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> dict:
    """IVF variant of the persisted index: spherical k-means coarse
    quantizer trained on a hash-sampled subset (bounded driver memory:
    sample_size × dim floats), every vector assigned to its nearest
    centroid (broadcast centroids, one matmul per batch), corpus written
    Hive-partitioned by centroid id. Queries probe the ``1 + multiprobe``
    nearest centroids. Same on-disk layout as the LSH index —
    ``ann_query_index`` dispatches on the metadata."""
    import json
    import os

    sample = _hash_sample(ds, sample_size, id_col, vec_col)
    cent = _spherical_kmeans(sample, n_centroids, iters, seed)
    dim = cent.shape[1]

    assigned = ds.select_columns([id_col, vec_col]).map_batches(
        IvfAssignStage, fn_constructor_kwargs=dict(
            centroids=cent, id_col=id_col, vec_col=vec_col),
        batch_format="pyarrow", concurrency=(1, 8))
    assigned = assigned.map_batches(
        lambda t: t.append_column("bucket_id", t.column("bucket")),
        batch_format="pyarrow")
    assigned.write_parquet(index_dir, partition_cols=["bucket"])
    os.makedirs(index_dir, exist_ok=True)
    np.save(os.path.join(index_dir, "_centroids.npy"), cent)
    meta = {"kind": "ivf", "n_centroids": int(len(cent)), "dim": int(dim),
            "seed": seed, "id_col": id_col, "vec_col": vec_col}
    with open(os.path.join(index_dir, "_ann_meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def _load_meta(index_dir: str) -> dict:
    import json
    import os

    with open(os.path.join(index_dir, "_ann_meta.json")) as f:
        return json.load(f)


def _query_targets(meta: dict, index_dir: str, qm: np.ndarray,
                   multiprobe: int) -> list[set[int]]:
    """Per-query probed bucket ids — LSH: own bucket + Hamming-≤multiprobe
    neighbors; IVF: the 1 + multiprobe nearest centroids."""
    import os

    if meta.get("kind") == "ivf":
        cent = _normalize(np.load(os.path.join(index_dir, "_centroids.npy")))
        sims = _normalize(qm) @ cent.T
        nprobe = min(1 + multiprobe, cent.shape[0])
        order = np.argsort(-sims, axis=1)[:, :nprobe]
        return [set(map(int, row)) for row in order]
    proj = _projection_matrix(meta["dim"], meta["n_bits"], meta["seed"])
    return [_probe_buckets(q, proj, meta["n_bits"], multiprobe) for q in qm]


def ann_query_index(index_dir: str, queries: np.ndarray, k: int = 10,
                    multiprobe: int = 1) -> pa.Table:
    """Batch ANN query against a persisted index (LSH or IVF): reads only
    the union of the queries' probed bucket partitions, computes one
    (rows × queries) matmul per batch, per-query bucket masks, local top-k
    per (batch, query), final merge. Returns (q, vec_id, cos_sim_e6) with
    q = query row index. Scan fraction = probed-partition rows / corpus
    rows — sublinear for selective probes (see ``ann_scan_fraction``)."""
    import glob
    import os

    meta = _load_meta(index_dir)
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    qm = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    if meta.get("kind") == "ivfpq":
        return _ivfpq_query(index_dir, meta, qm, k, multiprobe)
    per_query = _query_targets(meta, index_dir, qm, multiprobe)
    union = sorted(set().union(*per_query))
    # explicit file list: this Ray build rejects a LIST of directories
    paths = [f for b in union
             for f in sorted(glob.glob(
                 os.path.join(index_dir, f"bucket={b}", "*.parquet")))]
    if not paths:
        return pa.table({"q": pa.array([], pa.int64()),
                         id_col: pa.array([], pa.int64()),
                         "cos_sim_e6": pa.array([], pa.int64())})
    qn = _normalize(qm)
    target_sets = [np.fromiter(s, dtype=np.int64) for s in per_query]

    def topk_batch(t: pa.Table) -> pa.Table:
        x = _normalize(_stack(t.column(vec_col)))
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        buckets = t.column("bucket_id").to_numpy(zero_copy_only=False)
        sims = x @ qn.T  # (rows, m) — one matmul for the whole query batch
        out_q, out_id, out_e6 = [], [], []
        for j in range(qn.shape[0]):
            mask = np.isin(buckets, target_sets[j])
            if not mask.any():
                continue
            e6 = _to_e6(sims[mask, j])
            mids = ids[mask]
            order = np.lexsort((mids, -e6))[: min(k, len(e6))]
            out_q.append(np.full(len(order), j, dtype=np.int64))
            out_id.append(mids[order])
            out_e6.append(e6[order])
        if not out_q:
            return pa.table({"q": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "cos_sim_e6": pa.array([], pa.int64())})
        return pa.table({"q": pa.array(np.concatenate(out_q)),
                         id_col: pa.array(np.concatenate(out_id)),
                         "cos_sim_e6": pa.array(np.concatenate(out_e6))})

    partials = ray.data.read_parquet(paths).map_batches(
        topk_batch, batch_format="pyarrow")
    merged = partials.to_pandas()  # O(batches × m × k) rows — tiny by design
    if len(merged) == 0 or "cos_sim_e6" not in merged.columns:
        return pa.table({"q": pa.array([], pa.int64()),
                         id_col: pa.array([], pa.int64()),
                         "cos_sim_e6": pa.array([], pa.int64())})
    merged = merged.sort_values(["q", "cos_sim_e6", id_col],
                                ascending=[True, False, True],
                                kind="mergesort").groupby("q").head(k)
    return pa.Table.from_pandas(merged.reset_index(drop=True),
                                preserve_index=False)


def ann_scan_fraction(index_dir: str, queries: np.ndarray,
                      multiprobe: int = 1) -> float:
    """Fraction of corpus rows a query batch touches (probed partitions /
    all partitions, by row count from parquet METADATA — no data read)."""
    import glob
    import os

    import pyarrow.parquet as pq

    meta = _load_meta(index_dir)
    qm = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    union = sorted(set().union(*_query_targets(meta, index_dir, qm,
                                               multiprobe)))

    def rows_under(d: str) -> int:
        return sum(pq.ParquetFile(p).metadata.num_rows
                   for p in glob.glob(os.path.join(d, "*.parquet")))

    total = sum(rows_under(d) for d in glob.glob(
        os.path.join(index_dir, "bucket=*")))
    probed = sum(rows_under(os.path.join(index_dir, f"bucket={b}"))
                 for b in union
                 if os.path.isdir(os.path.join(index_dir, f"bucket={b}")))
    return probed / max(1, total)


def ann_topk_lsh(ds: ray.data.Dataset, query: np.ndarray, k: int = 10,
                 n_bits: int = 8, multiprobe: int = 1, seed: int = 42,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> pa.Table:
    """Approximate top-k: scan only the query's LSH bucket (plus buckets at
    Hamming distance ≤ multiprobe). Recall grows with multiprobe; exact scan
    is the `knn_topk` baseline. The bucket column is computed once and can
    be persisted as a partition key for repeated queries (IVF-style)."""
    q = np.asarray(query, dtype=np.float64).ravel()
    proj = _projection_matrix(len(q), n_bits, seed)
    targets = _probe_buckets(q, proj, n_bits, multiprobe)
    bucketed = ds.select_columns([id_col, vec_col]).map_batches(
        LshBucketStage, fn_constructor_kwargs=dict(
            dim=len(q), n_bits=n_bits, seed=seed, id_col=id_col, vec_col=vec_col),
        batch_format="pyarrow", concurrency=2)
    target_arr = pa.array(sorted(targets), pa.int64())
    probe = bucketed.map_batches(
        lambda t: t.filter(pc.is_in(t.column("bucket"), value_set=target_arr)),
        batch_format="pyarrow")
    return knn_topk(probe, q, k=k, id_col=id_col, vec_col=vec_col)


# ---------------------------------------------------------------- IVF-PQ

def _euclid_kmeans(x: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    """Plain Lloyd's k-means (Euclidean) — the per-subspace PQ codebook
    trainer; assignment via the expanded form (-2x·c + |c|²), never the
    (n, k, d) distance tensor."""
    rng = np.random.default_rng(seed)
    k = min(k, len(x))
    cent = x[rng.choice(len(x), size=k, replace=False)].copy()
    for _ in range(iters):
        assign = np.argmin(-2.0 * (x @ cent.T) + (cent ** 2).sum(1)[None, :],
                           axis=1)
        for c in range(k):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


class PqEncodeStage:
    """Coarse-assign + product-quantize: each vector becomes (coarse
    centroid id, m_sub one-byte codes of its RESIDUAL's subvectors) —
    m_sub bytes instead of 8·dim, the compression that lets a 100 TB
    corpus's index live in a fraction of the space. Codebooks/centroids
    are broadcast once per actor."""

    def __init__(self, centroids: np.ndarray, codebooks: np.ndarray,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        self.cent = _normalize(np.asarray(centroids, np.float64))
        self.books = np.asarray(codebooks, np.float64)  # (m, K, sub_d)
        self.id_col, self.vec_col = id_col, vec_col

    def __call__(self, t: pa.Table) -> pa.Table:
        x = _normalize(_stack(t.column(self.vec_col)))
        n = t.num_rows
        if n == 0:
            bucket = np.empty(0, np.int64)
            codes = np.empty((0, self.books.shape[0]), np.uint8)
        else:
            bucket = np.argmax(x @ self.cent.T, axis=1)
            res = x - self.cent[bucket]
            m, K, sub_d = self.books.shape
            codes = np.empty((n, m), np.uint8)
            for j in range(m):
                sub = res[:, j * sub_d: (j + 1) * sub_d]
                cb = self.books[j]
                codes[:, j] = np.argmin(
                    -2.0 * (sub @ cb.T) + (cb ** 2).sum(1)[None, :], axis=1)
        width = self.books.shape[0]
        vals = pa.py_buffer(codes.tobytes())
        offs = pa.py_buffer((np.arange(n + 1, dtype=np.int32)
                             * width).tobytes())
        return pa.table({
            self.id_col: t.column(self.id_col),
            "bucket": pa.array(bucket.astype(np.int64)),
            "bucket_id": pa.array(bucket.astype(np.int64)),
            "codes": pa.Array.from_buffers(pa.binary(), n, [None, offs, vals]),
        })


def build_ivfpq_index(ds: ray.data.Dataset, index_dir: str,
                      n_centroids: int = 64, m_sub: int = 8, n_bits: int = 8,
                      sample_size: int = 65536, iters: int = 10,
                      seed: int = 42, id_col: str = "vec_id",
                      vec_col: str = "embedding") -> dict:
    """IVF-PQ persisted index: IVF coarse quantizer + product-quantized
    residuals. On disk each vector is (id, m_sub bytes) — vs 8·dim bytes
    for the raw-vector indexes — Hive-partitioned by coarse centroid.
    Queries score by ADC (asymmetric distance computation): one
    (m_sub × 2^n_bits) lookup table per query, scores read off by byte
    indexing — approximate by design (use ``build_ivf_index`` when exact
    in-bucket scores matter more than index size). Training (coarse +
    per-subspace codebooks) runs on a hash-sampled subset — bounded
    driver memory."""
    import json
    import os

    sample = _normalize(_hash_sample(ds, sample_size, id_col, vec_col))
    dim = sample.shape[1]
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    sub_d = dim // m_sub
    cent = _spherical_kmeans(sample, n_centroids, iters, seed)
    assign = np.argmax(sample @ cent.T, axis=1)
    res = sample - cent[assign]
    books = np.stack([
        _pad_codebook(_euclid_kmeans(res[:, j * sub_d: (j + 1) * sub_d],
                                     1 << n_bits, iters, seed + 100 + j),
                      1 << n_bits)
        for j in range(m_sub)])

    encoded = ds.select_columns([id_col, vec_col]).map_batches(
        PqEncodeStage, fn_constructor_kwargs=dict(
            centroids=cent, codebooks=books, id_col=id_col, vec_col=vec_col),
        batch_format="pyarrow", concurrency=(1, 8))
    encoded.write_parquet(index_dir, partition_cols=["bucket"])
    os.makedirs(index_dir, exist_ok=True)
    np.save(os.path.join(index_dir, "_centroids.npy"), cent)
    np.save(os.path.join(index_dir, "_codebooks.npy"), books)
    meta = {"kind": "ivfpq", "n_centroids": int(len(cent)),
            "m_sub": int(m_sub), "n_bits": int(n_bits), "dim": int(dim),
            "seed": seed, "id_col": id_col, "vec_col": vec_col}
    with open(os.path.join(index_dir, "_ann_meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def _pad_codebook(cb: np.ndarray, k: int) -> np.ndarray:
    """Pad a codebook trained on a small sample up to 2^n_bits rows
    (repeat rows — unused codewords are harmless)."""
    if len(cb) >= k:
        return cb[:k]
    reps = -(-k // len(cb))
    return np.tile(cb, (reps, 1))[:k]


def _ivfpq_query(index_dir: str, meta: dict, qm: np.ndarray, k: int,
                 multiprobe: int) -> pa.Table:
    """ADC scoring over the probed partitions: score(x) ≈ q·c_bucket +
    Σ_j LUT[j, code_j] with LUT[j, :] = q_subvector_j · codebook_j — one
    table lookup per byte instead of a d-dim dot product. Output schema
    matches the other index kinds — (q, vec_id, cos_sim_e6) — with the
    caveat that here cos_sim_e6 is the PQ-approximated cosine."""
    import glob
    import os

    id_col = meta["id_col"]
    cent = _normalize(np.load(os.path.join(index_dir, "_centroids.npy")))
    books = np.load(os.path.join(index_dir, "_codebooks.npy"))
    m, K, sub_d = books.shape
    qn = _normalize(qm)
    qc = qn @ cent.T                                   # (nq, n_centroids)
    luts = np.stack([qn[:, j * sub_d: (j + 1) * sub_d] @ books[j].T
                     for j in range(m)], axis=1)     # (nq, m, K)
    nprobe = min(1 + multiprobe, cent.shape[0])
    per_query = [set(map(int, row))
                 for row in np.argsort(-qc, axis=1)[:, :nprobe]]
    union = sorted(set().union(*per_query))
    paths = [f for b in union
             for f in sorted(glob.glob(
                 os.path.join(index_dir, f"bucket={b}", "*.parquet")))]
    empty = pa.table({"q": pa.array([], pa.int64()),
                      id_col: pa.array([], pa.int64()),
                      "cos_sim_e6": pa.array([], pa.int64())})
    if not paths:
        return empty
    target_sets = [np.fromiter(s, dtype=np.int64) for s in per_query]

    def topk_batch(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        buckets = t.column("bucket_id").to_numpy(zero_copy_only=False)
        codes_col = t.column("codes")
        if isinstance(codes_col, pa.ChunkedArray):
            codes_col = codes_col.combine_chunks()
        codes = np.frombuffer(b"".join(
            codes_col.to_numpy(zero_copy_only=False)),
            np.uint8).reshape(n, m)
        out_q, out_id, out_e6 = [], [], []
        ar = np.arange(m)
        for j in range(qn.shape[0]):
            mask = np.isin(buckets, target_sets[j])
            if not mask.any():
                continue
            c = codes[mask]
            score = qc[j, buckets[mask]] + luts[j][ar[None, :], c].sum(axis=1)
            e6 = _to_e6(score)
            mids = ids[mask]
            order = np.lexsort((mids, -e6))[: min(k, len(e6))]
            out_q.append(np.full(len(order), j, dtype=np.int64))
            out_id.append(mids[order])
            out_e6.append(e6[order])
        if not out_q:
            return empty
        return pa.table({"q": pa.array(np.concatenate(out_q)),
                         id_col: pa.array(np.concatenate(out_id)),
                         "cos_sim_e6": pa.array(np.concatenate(out_e6))})

    partials = ray.data.read_parquet(paths).map_batches(
        topk_batch, batch_format="pyarrow")
    merged = partials.to_pandas()
    if len(merged) == 0 or "cos_sim_e6" not in merged.columns:
        return empty
    merged = merged.sort_values(["q", "cos_sim_e6", id_col],
                                ascending=[True, False, True],
                                kind="mergesort").groupby("q").head(k)
    return pa.Table.from_pandas(merged.reset_index(drop=True),
                                preserve_index=False)
