"""Session-10 operators: k-core peeling (stages/graph.py::kcore),
rendezvous routing (stages/route.py::rendezvous_assign), sequence-gap
audit (stages/validate.py::sequence_gaps) and ROUGE-1 multiset overlap
(stages/agreement.py::unigram_overlap) — planted-truth and brute-force
parity, guards, and the distributed-vs-local path equivalences."""

from __future__ import annotations

import hashlib
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from opentelemetry_collector_ray.stages.agreement import unigram_overlap
from opentelemetry_collector_ray.stages.graph import kcore
from opentelemetry_collector_ray.stages.route import rendezvous_assign
from opentelemetry_collector_ray.stages.validate import sequence_gaps


def _edges_ds(edges, parts=4):
    t = pa.table({"src": pa.array([e[0] for e in edges]),
                  "dst": pa.array([e[1] for e in edges])})
    return lambda: ray.data.from_arrow(t).repartition(parts)


def _brute_kcore(edges, k):
    """Independent peeling reference over the simple undirected graph."""
    adj: dict[str, set[str]] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    alive = set(adj)
    while True:
        dead = {v for v in alive
                if len(adj[v] & alive) < k}
        if not dead:
            break
        alive -= dead
    return {v: len(adj[v] & alive) for v in alive}


def test_kcore_clique_with_pendants(ray_session):
    # 5-clique (degree 4 each) + a pendant chain off one clique node:
    # at k=3 only the clique survives, every survivor at degree 4.
    clique = [f"c{i}" for i in range(5)]
    edges = [(a, b) for i, a in enumerate(clique)
             for b in clique[i + 1:]]
    edges += [("c0", "p1"), ("p1", "p2"), ("p2", "p3")]
    out = kcore(_edges_ds(edges), "src", "dst", k=3).to_pandas()
    assert sorted(out["node"]) == clique
    assert set(out["core_degree"]) == {4}


@pytest.mark.parametrize("k", [1, 2, 3, 4])
def test_kcore_matches_bruteforce(ray_session, k):
    rng = np.random.default_rng(7)
    nodes = [f"n{i}" for i in range(40)]
    edges = [(nodes[a], nodes[b]) for a, b in
             zip(rng.integers(0, 40, 300), rng.integers(0, 40, 300))]
    want = _brute_kcore(edges, k)
    out = kcore(_edges_ds(edges), "src", "dst", k=k).to_pandas()
    got = dict(zip(out["node"], out["core_degree"]))
    assert got == want


def test_kcore_distributed_path_matches_local(ray_session):
    rng = np.random.default_rng(11)
    nodes = [f"n{i}" for i in range(25)]
    edges = [(nodes[a], nodes[b]) for a, b in
             zip(rng.integers(0, 25, 200), rng.integers(0, 25, 200))]
    loc = kcore(_edges_ds(edges), "src", "dst", k=3).to_pandas()
    dist = kcore(_edges_ds(edges), "src", "dst", k=3,
                 max_local_edges=0).to_pandas()
    assert (dict(zip(loc["node"], loc["core_degree"]))
            == dict(zip(dist["node"], dist["core_degree"])))


def test_kcore_self_loops_and_parallel_edges_ignored(ray_session):
    # a-b listed twice + a self-loop: simple-graph degrees are all 1,
    # so the 2-core is empty and the 1-core is the a-b pair.
    edges = [("a", "b"), ("b", "a"), ("a", "a")]
    assert kcore(_edges_ds(edges, parts=2), "src", "dst",
                 k=2).count() == 0
    out = kcore(_edges_ds(edges, parts=2), "src", "dst",
                k=1).to_pandas()
    assert dict(zip(out["node"], out["core_degree"])) == {"a": 1, "b": 1}


def test_kcore_guards_and_empty(ray_session):
    with pytest.raises(ValueError, match="k must be"):
        kcore(_edges_ds([("a", "b")]), "src", "dst", k=0)
    out = kcore(_edges_ds([]), "src", "dst", k=2)
    assert out.count() == 0
    assert set(out.schema().names) == {"node", "core_degree"}


def _hrw_expected(key: str, backends: list[str]) -> str:
    best = None
    for b in sorted(backends):
        w = int(hashlib.md5(f"{b}#{key}".encode()).hexdigest()[:12], 16)
        if best is None or w > best[0]:
            best = (w, b)
    return best[1]


def test_rendezvous_matches_reference_md5(ray_session):
    backends = ["be-a", "be-b", "be-c", "be-d"]
    keys = [f"user-{i}" for i in range(200)]
    ds = ray.data.from_arrow(pa.table({"k": keys})).repartition(3)
    out = rendezvous_assign(ds, "k", backends).to_pandas()
    got = dict(zip(out["k"], out["backend"]))
    assert got == {k: _hrw_expected(k, backends) for k in keys}
    # every backend owns a non-trivial share of 200 keys
    assert set(out["backend"]) == set(backends)


def test_rendezvous_minimal_disruption(ray_session):
    """Removing one backend moves ONLY that backend's keys — the HRW
    property the ring needs vnodes to approximate."""
    backends = ["be-a", "be-b", "be-c", "be-d"]
    keys = [f"user-{i}" for i in range(300)]
    ds = ray.data.from_arrow(pa.table({"k": keys}))
    full = dict(zip(*[rendezvous_assign(ds, "k", backends)
                      .to_pandas()[c] for c in ("k", "backend")]))
    down = dict(zip(*[rendezvous_assign(ds, "k", backends[:-1])
                      .to_pandas()[c] for c in ("k", "backend")]))
    for k in keys:
        if full[k] != "be-d":
            assert down[k] == full[k], k


def test_rendezvous_guards(ray_session):
    ds = ray.data.from_arrow(pa.table({"k": ["x"]}))
    with pytest.raises(ValueError, match="non-empty"):
        rendezvous_assign(ds, "k", [])
    with pytest.raises(ValueError, match="duplicate"):
        rendezvous_assign(ds, "k", ["a", "a"])


def test_sequence_gaps_planted(ray_session):
    rows = {
        # complete prefix 0..3 -> no gap
        "full": [0, 1, 2, 3],
        # missing 0 -> first_gap 0, missing {0, 2} of max 3
        "holes": [1, 3],
        # single row at 5 -> 5 missing below it, first gap 0
        "late": [5],
        # single row at 0 -> complete
        "one": [0],
    }
    t = pa.table({
        "key": pa.array([k for k, v in rows.items() for _ in v]),
        "idx": pa.array([i for v in rows.values() for i in v],
                        pa.int64())})
    out = sequence_gaps(ray.data.from_arrow(t).repartition(3),
                        "key", "idx").to_pandas().set_index("key")
    assert out.loc["full", "n_missing"] == 0
    assert pd_isnull(out.loc["full", "first_gap"])
    assert out.loc["holes", "n_present"] == 2
    assert out.loc["holes", "max_idx"] == 3
    assert out.loc["holes", "n_missing"] == 2
    assert out.loc["holes", "first_gap"] == 0
    assert out.loc["late", "n_missing"] == 5
    assert out.loc["late", "first_gap"] == 0
    assert out.loc["one", "n_missing"] == 0
    assert pd_isnull(out.loc["one", "first_gap"])


def pd_isnull(v) -> bool:
    import pandas as pd
    return pd.isnull(v)


def test_sequence_gaps_first_gap_mid_stream(ray_session):
    t = pa.table({"key": pa.array(["s"] * 5),
                  "idx": pa.array([0, 1, 3, 4, 7], pa.int64())})
    out = sequence_gaps(ray.data.from_arrow(t).repartition(2),
                        "key", "idx").to_pandas()
    assert out.loc[0, "first_gap"] == 2
    assert out.loc[0, "n_missing"] == 3


def _brute_overlap(a: str, b: str, pat=r"[a-z0-9]+"):
    import re
    ca = Counter(re.findall(pat, a.lower()))
    cb = Counter(re.findall(pat, b.lower()))
    ov = sum(min(ca[w], cb[w]) for w in ca.keys() & cb.keys())
    na, nb = sum(ca.values()), sum(cb.values())
    f1 = (2000 * ov) // (na + nb) if na + nb else None
    return na, nb, ov, f1


def test_unigram_overlap_matches_bruteforce(ray_session):
    rng = np.random.default_rng(5)
    vocab = ["alpha", "beta", "gamma", "delta", "x9"]
    pairs = [(" ".join(rng.choice(vocab, rng.integers(0, 8))),
              " ".join(rng.choice(vocab, rng.integers(0, 8))))
             for _ in range(50)]
    t = pa.table({"rid": pa.array(range(50), pa.int64()),
                  "a": pa.array([p[0] for p in pairs]),
                  "b": pa.array([p[1] for p in pairs])})
    out = unigram_overlap(ray.data.from_arrow(t).repartition(4),
                          "a", "b", id_cols=["rid"]).to_pandas()
    out = out.set_index("rid").sort_index()
    for i, (a, b) in enumerate(pairs):
        na, nb, ov, f1 = _brute_overlap(a, b)
        assert out.loc[i, "n_a"] == na
        assert out.loc[i, "n_b"] == nb
        assert out.loc[i, "overlap"] == ov
        if f1 is None:
            assert pd_isnull(out.loc[i, "f1_permille"])
        else:
            assert out.loc[i, "f1_permille"] == f1


def test_unigram_overlap_null_texts_keep_row(ray_session):
    t = pa.table({"rid": pa.array([0, 1], pa.int64()),
                  "a": pa.array(["hello world", None]),
                  "b": pa.array([None, "hello"])})
    out = unigram_overlap(ray.data.from_arrow(t), "a", "b",
                          id_cols=["rid"]).to_pandas()
    assert len(out) == 2
    assert pd_isnull(out.loc[0, "overlap"])
    assert pd_isnull(out.loc[1, "overlap"])
