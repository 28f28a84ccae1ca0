"""Dedup (exact / minhash / simhash) and similarity search on corpora with
planted duplicates and known neighbors."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data

    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa"]
    texts, ids = [], []
    base_docs = []
    for i in range(30):
        base = " ".join(rng.choice(vocab, 30))
        base_docs.append(base)
        texts.append(base)
        ids.append(i)
    # planted exact dups
    texts += [base_docs[0], base_docs[1]]
    ids += [100, 101]
    # planted near-dups (edit a couple words)
    w = base_docs[2].split()
    w[5] = "CHANGED"
    texts.append(" ".join(w))
    ids.append(200)
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())})
    return ray.data.from_arrow(t)


def test_exact_dedup(docs_ds):
    from opentelemetry_collector_ray.stages.dedup import exact_dedup

    kept = sorted(exact_dedup(docs_ds).to_pandas()["doc_id"])
    assert 100 not in kept and 101 not in kept  # exact dups dropped
    assert 200 in kept  # near-dup kept by exact pass
    assert set(range(30)) <= set(kept)


def test_minhash_finds_planted_neardups(docs_ds):
    from opentelemetry_collector_ray.stages.dedup import minhash_dedup

    clusters = minhash_dedup(docs_ds, threshold=0.5).to_pandas()
    as_map = dict(zip(clusters["doc_id"], clusters["rep_id"]))
    assert as_map.get(100) == 0  # exact dup of doc 0
    assert as_map.get(101) == 1
    assert as_map.get(200) == 2  # near-dup of doc 2
    # representatives are listed too, as their own rep
    assert as_map.get(0) == 0 and as_map.get(2) == 2
    # no false merges between unrelated base docs
    reps = {as_map.get(i, i) for i in range(3, 30)}
    assert reps == set(range(3, 30))


def test_minhash_distributed_cc_path(docs_ds):
    """Same planted dups through the DISTRIBUTED min-label-propagation CC
    (mode forced), proving nothing depends on the driver union-find."""
    from opentelemetry_collector_ray.stages.dedup import minhash_dedup

    clusters = minhash_dedup(docs_ds, threshold=0.5,
                             cc_mode="distributed").to_pandas()
    as_map = dict(zip(clusters["doc_id"], clusters["rep_id"]))
    assert as_map.get(100) == 0 and as_map.get(101) == 1
    assert as_map.get(200) == 2 and as_map.get(0) == 0


def test_connected_components_chain(ray_session):
    """A 5-node chain + isolated pair: distributed CC must propagate the min
    label across the whole chain (multi-round convergence)."""
    import ray.data

    from opentelemetry_collector_ray.stages.dedup import connected_components

    edges = pa.table({"id_a": pa.array([1, 2, 3, 4, 10], pa.int64()),
                      "id_b": pa.array([2, 3, 4, 5, 11], pa.int64())})
    out = connected_components(ray.data.from_arrow(edges), n_buckets=4,
                               mode="distributed").to_pandas()
    lab = dict(zip(out["node"], out["label"]))
    assert {lab[n] for n in (1, 2, 3, 4, 5)} == {1}
    assert lab[10] == 10 and lab[11] == 10


def test_simhash_close_for_neardups(docs_ds):
    from opentelemetry_collector_ray.stages.dedup import SimHashStage

    out = docs_ds.map_batches(SimHashStage(), batch_format="pyarrow").to_pandas()
    h = dict(zip(out["doc_id"], out["simhash"]))
    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert ham(h[0], h[100]) == 0  # identical text
    assert ham(h[2], h[200]) <= 12  # near-dup: small distance
    dists = [ham(h[3], h[j]) for j in range(4, 30)]
    assert np.median(dists) > 12  # unrelated: large distance


def test_knn_vs_numpy_ground_truth(ray_session):
    import ray.data

    from opentelemetry_collector_ray.stages.similarity import SIM_SCALE, knn_topk

    rng = np.random.default_rng(3)
    x = rng.standard_normal((200, 16)).astype(np.float32)
    t = pa.table({"vec_id": pa.array(np.arange(200), pa.int64()),
                  "embedding": pa.array([list(map(float, r)) for r in x],
                                        pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(t).repartition(4)
    q = np.asarray(x[5], dtype=np.float64)
    got = knn_topk(ds, q, k=10).to_pandas()
    xn = x.astype(np.float64)
    xn = xn / np.linalg.norm(xn, axis=1, keepdims=True)
    sims = xn @ (q / np.linalg.norm(q))
    e6 = np.floor(sims * SIM_SCALE + 0.5).astype(np.int64)
    order = np.lexsort((np.arange(200), -e6))[:10]
    assert got["vec_id"].tolist() == order.tolist()
    assert got["cos_sim_e6"].tolist() == e6[order].tolist()
    assert got["vec_id"].iloc[0] == 5  # self is nearest


def test_ann_lsh_recall(ray_session):
    import ray.data

    from opentelemetry_collector_ray.stages.similarity import ann_topk_lsh, knn_topk

    rng = np.random.default_rng(4)
    x = rng.standard_normal((500, 16)).astype(np.float32)
    t = pa.table({"vec_id": pa.array(np.arange(500), pa.int64()),
                  "embedding": pa.array([list(map(float, r)) for r in x],
                                        pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(t)
    q = np.asarray(x[7], dtype=np.float64)
    exact = set(knn_topk(ds, q, k=10).to_pandas()["vec_id"])
    approx = set(ann_topk_lsh(ds, q, k=10, n_bits=4, multiprobe=1)
                 .to_pandas()["vec_id"])
    assert 7 in approx
    assert len(exact & approx) >= 3  # recall with aggressive bucketing


def test_ann_persisted_index(ray_session, tmp_path):
    """Build-once index + batch query: recall vs exact knn, self-hit, and
    sublinear scan fraction (probed partitions only)."""
    import ray.data

    from opentelemetry_collector_ray.stages.similarity import (
        ann_query_index, ann_scan_fraction, build_ann_index, knn_topk)

    rng = np.random.default_rng(11)
    x = rng.standard_normal((600, 16)).astype(np.float32)
    t = pa.table({"vec_id": pa.array(np.arange(600), pa.int64()),
                  "embedding": pa.array([list(map(float, r)) for r in x],
                                        pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(t)
    idx_dir = str(tmp_path / "annidx")
    meta = build_ann_index(ds, idx_dir, n_bits=4)
    assert meta["dim"] == 16

    queries = np.asarray(x[[3, 17]], dtype=np.float64)
    got = ann_query_index(idx_dir, queries, k=10, multiprobe=1).to_pandas()
    by_q = {q: set(g["vec_id"]) for q, g in got.groupby("q")}
    assert 3 in by_q[0] and 17 in by_q[1]  # self is found
    exact0 = set(knn_topk(ds, queries[0], k=10).to_pandas()["vec_id"])
    assert len(by_q[0] & exact0) >= 3  # recall under aggressive bucketing

    frac = ann_scan_fraction(idx_dir, queries, multiprobe=1)
    assert 0 < frac < 1.0  # strictly sublinear scan


def test_sessionize_oracle(ray_session):
    import ray.data

    from opentelemetry_collector_ray.stages.sessionize import session_stats

    ts = pd.to_datetime([
        "2024-01-01 00:00", "2024-01-01 00:10", "2024-01-01 01:00",
        "2024-01-01 01:20", "2024-01-02 00:00",
    ])
    df = pd.DataFrame({"user_id": [1] * 5, "event_id": range(5), "ts": ts})
    ds = ray.data.from_pandas(df)
    out = session_stats(ds, gap_minutes=30).to_pandas() \
        .sort_values("session_id").reset_index(drop=True)
    assert out["session_id"].tolist() == [0, 1, 2]
    assert out["n_events"].tolist() == [2, 2, 1]


def test_ivf_persisted_index(ray_session, tmp_path):
    """IVF variant: k-means coarse quantizer, centroid-partitioned layout,
    same query API; recall + sublinear scan."""
    import ray.data

    from opentelemetry_collector_ray.stages.similarity import (
        ann_query_index, ann_scan_fraction, build_ivf_index, knn_topk)

    rng = np.random.default_rng(21)
    # clustered data so the coarse quantizer has real structure
    centers = rng.standard_normal((8, 16)) * 4
    x = np.concatenate([c + rng.standard_normal((80, 16)) for c in centers])
    t = pa.table({"vec_id": pa.array(np.arange(len(x)), pa.int64()),
                  "embedding": pa.array([list(map(float, r)) for r in x],
                                        pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(t)
    idx = str(tmp_path / "ivf")
    meta = build_ivf_index(ds, idx, n_centroids=8, sample_size=640, iters=5)
    assert meta["kind"] == "ivf" and meta["dim"] == 16

    queries = np.asarray(x[[5, 200]], dtype=np.float64)
    got = ann_query_index(idx, queries, k=10, multiprobe=1).to_pandas()
    by_q = {q: set(g["vec_id"]) for q, g in got.groupby("q")}
    assert 5 in by_q[0] and 200 in by_q[1]
    exact0 = set(knn_topk(ds, queries[0], k=10).to_pandas()["vec_id"])
    assert len(by_q[0] & exact0) >= 5  # clustered data: good recall
    frac = ann_scan_fraction(idx, queries, multiprobe=1)
    assert 0 < frac < 1.0


def test_simhash_dedup_clusters(ray_session):
    """SimHash pigeonhole LSH + exact hamming verify + CC: exact dups and
    a 2-of-60-words near-dup cluster; unrelated docs (rich vocabulary →
    well-separated simhashes) do not."""
    import ray.data

    from opentelemetry_collector_ray.stages.dedup import simhash_dedup

    rng = np.random.default_rng(17)
    vocab = [f"w{i:03d}" for i in range(400)]
    texts, ids, base = [], [], []
    for i in range(30):
        d = " ".join(rng.choice(vocab, 60))
        base.append(d)
        texts.append(d)
        ids.append(i)
    texts += [base[0], base[1]]          # exact dups
    ids += [100, 101]
    w = base[2].split()
    w[5], w[30] = "CHANGED", "ALSO"      # near-dup: 2 of 60 words
    texts.append(" ".join(w))
    ids.append(200)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string())}))
    out = simhash_dedup(ds, max_hamming=10).to_pandas()
    as_map = dict(zip(out["doc_id"], out["rep_id"]))
    assert as_map.get(100) == 0 and as_map.get(101) == 1  # exact dups
    assert as_map.get(200) == 2  # near-dup within hamming budget
    # unrelated docs not merged
    reps = {as_map.get(i, i) for i in range(3, 30)}
    assert reps == set(range(3, 30))
    # pigeonhole completeness bound enforced
    with pytest.raises(ValueError):
        simhash_dedup(ds, max_hamming=10, bands=4)


def test_embedding_near_dup(ray_session):
    """Embedding-cosine near-dup: planted near-identical vectors cluster;
    distinct directions do not."""
    import ray.data

    from opentelemetry_collector_ray.stages.dedup import embedding_near_dup

    rng = np.random.default_rng(13)
    base = rng.standard_normal((50, 16))
    # planted near-dups: ids 100/101 are tiny perturbations of 0 and 1
    vecs = np.vstack([base, base[0] + 0.01 * rng.standard_normal(16),
                      base[1] + 0.01 * rng.standard_normal(16)])
    ids = list(range(50)) + [100, 101]
    t = pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array([list(map(float, r)) for r in vecs],
                                        pa.list_(pa.float32()))})
    out = embedding_near_dup(ray.data.from_arrow(t), threshold=0.98,
                             n_bits=6, n_tables=6).to_pandas()
    as_map = dict(zip(out["vec_id"], out["rep_id"]))
    assert as_map.get(100) == 0 and as_map.get(101) == 1
    # random 16-d gaussians are far from cosine 0.98 of each other
    others = {k for k in as_map if k not in (0, 1, 100, 101)}
    assert not others


def test_ivfpq_index_recall_and_compression(ray_session, tmp_path):
    """IVF-PQ persisted index: ADC top-k recalls most of the exact top-k
    while storing m_sub BYTES per vector (vs 8·dim for raw vectors), and
    probed reads stay partition-pruned."""
    import glob
    import os

    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from opentelemetry_collector_ray.stages.similarity import (
        ann_query_index, build_ivfpq_index, knn_topk)

    src = "/root/testdata/sf0.001/embeddings.parquet"
    ds = ray.data.read_parquet(src, columns=["vec_id", "embedding"])
    idx = str(tmp_path / "ivfpq")
    meta = build_ivfpq_index(ds, idx, n_centroids=16, m_sub=8,
                             sample_size=10_000)
    assert meta["kind"] == "ivfpq" and meta["m_sub"] == 8

    t = pq.read_table(src, columns=["vec_id", "embedding"])
    queries = np.array([t.column("embedding")[i].as_py() for i in range(4)],
                       dtype=np.float64)
    got = ann_query_index(idx, queries, k=10, multiprobe=4).to_pandas()
    recalls = []
    for qi in range(4):
        exact = set(knn_topk(ds, queries[qi], k=10)
                    .column("vec_id").to_pylist())
        approx = set(got[got.q == qi]["vec_id"])
        recalls.append(len(exact & approx) / 10)
    assert float(np.mean(recalls)) >= 0.5, recalls
    # each query finds itself first (its own vector has zero residual
    # error only approximately, but rank-1 must hold for identical vecs)
    for qi in range(4):
        rows = got[got.q == qi].reset_index(drop=True)
        assert rows["vec_id"][0] == qi
    # compression: stored codes are m_sub bytes per vector
    stored = pa.concat_tables([
        pq.read_table(p, columns=["codes"])
        for p in glob.glob(os.path.join(idx, "bucket=*", "*.parquet"))])
    widths = {len(b.as_py()) for b in stored.column("codes")}
    assert widths == {8}
    assert stored.num_rows == 500


def test_dedup_filter_keeps_one_per_cluster(ray_session):
    """Planted duplicates: the filtered corpus holds exactly one doc per
    near-dup cluster plus every unclustered doc."""
    import pandas as pd
    import ray.data

    from opentelemetry_collector_ray.stages.dedup import (
        dedup_filter, minhash_dedup)

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark forest tonight")
    texts, ids = [], []
    for i in range(8):  # 4 planted pairs: near-identical text
        texts += [base + f" variant {i}", base + f" variant {i}!"]
        ids += [2 * i, 2 * i + 1]
    for i in range(5):  # singletons
        texts.append(f"completely different document number {i} "
                     f"about topic {i * 7} with unique words w{i}")
        ids.append(100 + i)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string())}))
    clusters = minhash_dedup(ds, threshold=0.5)
    cl = clusters.to_pandas() if not isinstance(clusters, pd.DataFrame) \
        else clusters
    filtered = dedup_filter(ds, clusters, id_col="doc_id").to_pandas()
    n_dropped = (cl["doc_id"] != cl["rep_id"]).sum()
    assert len(filtered) == len(ids) - n_dropped
    # every cluster keeps exactly its representative
    kept = set(filtered["doc_id"])
    for _, row in cl.iterrows():
        assert (row["doc_id"] in kept) == (row["doc_id"] == row["rep_id"])
    # unclustered singletons all survive
    assert all(100 + i in kept for i in range(5))
    # no-duplicates case: filter is the identity
    solo = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["aaa bbb ccc", "xxx yyy zzz"])}))
    c2 = minhash_dedup(solo, threshold=0.5)
    assert dedup_filter(solo, c2, id_col="doc_id").count() == 2
