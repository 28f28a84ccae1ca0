"""PageRank (stages/graph.py): dense numpy power-iteration parity,
dangling handling, parallel edges, guards, YAML parity."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from opentelemetry_collector_ray.stages.graph import pagerank


def _dense_pagerank(nodes, edges, damping=0.85, iterations=20):
    """Independent dense reference with uniform dangling
    redistribution."""
    n = len(nodes)
    pos = {v: i for i, v in enumerate(nodes)}
    outdeg = np.zeros(n)
    for s, _t in edges:
        outdeg[pos[s]] += 1
    rank = np.full(n, 1.0 / n)
    for _ in range(iterations):
        incoming = np.zeros(n)
        for s, t in edges:
            incoming[pos[t]] += rank[pos[s]] / outdeg[pos[s]]
        dangling = rank[outdeg == 0].sum()
        rank = (1 - damping) / n + damping * (incoming + dangling / n)
    return dict(zip(nodes, rank))


def _edges_ds(edges, parts=4):
    t = pa.table({"src": pa.array([e[0] for e in edges]),
                  "dst": pa.array([e[1] for e in edges])})
    return lambda: ray.data.from_arrow(t).repartition(parts)


def test_pagerank_matches_dense(ray_session):
    rng = np.random.default_rng(3)
    nodes = [f"n{i}" for i in range(30)]
    edges = [(nodes[a], nodes[b]) for a, b in
             zip(rng.integers(0, 30, 400), rng.integers(0, 30, 400))]
    out = pagerank(_edges_ds(edges), "src", "dst",
                   iterations=15).to_pandas()
    want = _dense_pagerank(sorted({v for e in edges for v in e}),
                           edges, iterations=15)
    got = dict(zip(out["node"], out["rank"]))
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-9), v
    assert out["rank"].sum() == pytest.approx(1.0, rel=1e-9)


def test_pagerank_dangling_and_parallel_edges(ray_session):
    # b is dangling (no out-edges); a->b twice = parallel edge weight 2
    edges = [("a", "b"), ("a", "b"), ("a", "c"), ("c", "a")]
    out = pagerank(_edges_ds(edges, parts=2), "src", "dst",
                   iterations=30).to_pandas()
    want = _dense_pagerank(["a", "b", "c"], edges, iterations=30)
    got = dict(zip(out["node"], out["rank"]))
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-9), v
    # b receives 2/3 of a's share, c only 1/3 -> b outranks c
    assert got["b"] > got["c"]


def test_pagerank_guards(ray_session):
    edges = [("a", "b")]
    with pytest.raises(ValueError, match="damping"):
        pagerank(_edges_ds(edges), "src", "dst", damping=1.5)
    with pytest.raises(ValueError, match="nodes"):
        pagerank(_edges_ds(edges), "src", "dst", max_nodes=1).to_pandas()
    tn = pa.table({"src": pa.array(["a", None]),
                   "dst": pa.array(["b", "c"])})
    with pytest.raises(Exception, match="null"):
        pagerank(lambda: ray.data.from_arrow(tn), "src",
                 "dst").to_pandas()


def test_pagerank_empty(ray_session):
    t = pa.table({"src": pa.array([], pa.string()),
                  "dst": pa.array([], pa.string())})
    out = pagerank(lambda: ray.data.from_arrow(t), "src", "dst")
    assert out.count() == 0
    assert set(out.schema().names) == {"node", "rank"}


def test_pagerank_yaml_parity(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from opentelemetry_collector_ray.config import PipelineConfig
    from opentelemetry_collector_ray.pipelines.builder import build_dataset

    p = tmp_path / "e.parquet"
    pq.write_table(pa.table({
        "src": pa.array(["a", "a", "c"]),
        "dst": pa.array(["b", "c", "a"])}), str(p))
    y = build_dataset(PipelineConfig.from_dict({
        "receivers": {"parquet": {"paths": str(p)}},
        "processors": {"pagerank": {"src": "src", "dst": "dst",
                                    "iterations": 5}},
        "exporters": {"debug": {}},
        "service": {"pipelines": {"logs": {
            "receivers": ["parquet"], "processors": ["pagerank"],
            "exporters": ["debug"]}}},
    })).to_pandas()
    direct = pagerank(lambda: ray.data.read_parquet(str(p)), "src",
                      "dst", iterations=5).to_pandas()
    ys = y.sort_values("node").reset_index(drop=True)
    dsr = direct.sort_values("node").reset_index(drop=True)
    assert ys["node"].tolist() == dsr["node"].tolist()
    assert np.allclose(ys["rank"], dsr["rank"], rtol=1e-12)


def test_pagerank_tol_early_exit(ray_session):
    """tol>0 stops once max|Δrank| < tol: far fewer edge scans than the
    iteration cap, identical top-k ordering, and near-identical ranks
    (the converged fixpoint)."""
    rng = np.random.default_rng(7)
    nodes = [f"n{i}" for i in range(20)]
    edges = [(nodes[a], nodes[b]) for a, b in
             zip(rng.integers(0, 20, 200), rng.integers(0, 20, 200))]
    full = pagerank(_edges_ds(edges), "src", "dst",
                    iterations=60).to_pandas()
    early = pagerank(_edges_ds(edges), "src", "dst",
                     iterations=60, tol=1e-10).to_pandas()
    f = full.sort_values("rank", ascending=False)["node"].tolist()
    e = early.sort_values("rank", ascending=False)["node"].tolist()
    assert f[:10] == e[:10]
    merged = full.merge(early, on="node", suffixes=("_f", "_e"))
    assert np.allclose(merged["rank_f"], merged["rank_e"], atol=1e-8)
    assert early["rank"].sum() == pytest.approx(1.0, rel=1e-9)


def test_pagerank_tol_zero_keeps_fixed_iterations(ray_session):
    """tol=0 (default) must preserve the exact fixed-iteration result."""
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
    out = pagerank(_edges_ds(edges, parts=2), "src", "dst",
                   iterations=3, tol=0.0).to_pandas()
    want = _dense_pagerank(["a", "b", "c"], edges, iterations=3)
    got = dict(zip(out["node"], out["rank"]))
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-9), v


# ---------------------------------------------- co-occurrence + triangles

from opentelemetry_collector_ray.stages.graph import (  # noqa: E402
    cooccurrence_edges, triangle_count)


def test_cooccurrence_edges_matches_bruteforce(ray_session):
    import itertools

    rng = np.random.default_rng(3)
    g = rng.integers(0, 40, 500)
    v = rng.integers(0, 12, 500)
    t = pa.table({"g": g, "item": v})
    got = cooccurrence_edges(ray.data.from_arrow(t), "g", "item",
                             min_support=1).to_pandas()
    got = {(r.a, r.b): r.support for r in got.itertuples()}
    want = {}
    for grp in np.unique(g):
        items = sorted(set(v[g == grp].tolist()))
        for a, b in itertools.combinations(items, 2):
            want[(a, b)] = want.get((a, b), 0) + 1
    assert got == want


def test_cooccurrence_min_support_filters(ray_session):
    t = pa.table({"g": [1, 1, 2, 2, 3, 3], "item": [1, 2, 1, 2, 1, 3]})
    got = cooccurrence_edges(ray.data.from_arrow(t), "g", "item",
                             min_support=2).to_pandas()
    assert got[["a", "b"]].values.tolist() == [[1, 2]]
    assert got["support"].tolist() == [2]


def test_triangle_count_planted(ray_session):
    # K4 on {1,2,3,4} plus a pendant edge (4,5): each K4 node is in
    # C(3,2)=3 triangles; node 5 in none (absent from output).
    edges = pa.table({"a": [1, 1, 1, 2, 2, 3, 4],
                      "b": [2, 3, 4, 3, 4, 4, 5]})
    got = triangle_count(ray.data.from_arrow(edges)).to_pandas()
    got = dict(zip(got["node"], got["n_triangles"]))
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_count_empty_graph_keeps_schema(ray_session):
    # path graph: no triangles -> empty result, schema intact
    edges = pa.table({"a": [1, 2, 3], "b": [2, 3, 4]})
    got = triangle_count(ray.data.from_arrow(edges))
    assert got.count() == 0
    assert set(got.schema().names) == {"node", "n_triangles"}


def test_cooccurrence_cosine_planted(ray_session):
    """cosine = support / sqrt(n_a*n_b) on a planted basket set; items
    always co-occurring score exactly 1.0."""
    from opentelemetry_collector_ray.stages.graph import (
        cooccurrence_cosine)

    rows = [(1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x"), (3, "z"),
            (3, "y"), (4, "w"), (4, "w")]  # dup membership dedupes
    t = pa.table({"g": pa.array([r[0] for r in rows]),
                  "i": pa.array([r[1] for r in rows])})
    out = cooccurrence_cosine(
        lambda: ray.data.from_arrow(t).repartition(2), "g", "i",
        min_support=1).to_pandas().sort_values(["a", "b"]) \
        .reset_index(drop=True)
    got = {(r.a, r.b): (r.support, r.n_a, r.n_b, r.cosine)
           for r in out.itertuples()}
    # x and y co-occur in all 3 of their baskets -> cosine 1.0 exactly
    assert got[("x", "y")] == (3, 3, 3, 1.0)
    assert got[("x", "z")][:3] == (1, 3, 1)
    assert got[("x", "z")][3] == 1 / np.sqrt(3.0)
    assert ("w", "w") not in got and not any(
        a == b for a, b in got)  # no self pairs
    with pytest.raises(ValueError, match="min_support"):
        cooccurrence_cosine(lambda: ray.data.from_arrow(t), "g", "i",
                            min_support=0)
    with pytest.raises(Exception, match="max_items"):
        cooccurrence_cosine(lambda: ray.data.from_arrow(t), "g", "i",
                            max_items=1).to_pandas()


def test_association_rules_planted(ray_session):
    """conf_ppm = sup*1e6 // n_ante, lift_ppm = sup*N*1e6 //
    (n_ante*n_cons) on a planted basket set — each undirected pair
    emits BOTH directed rules, duplicate memberships dedupe."""
    from opentelemetry_collector_ray.stages.graph import (
        association_rules)

    rows = [(1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x"), (3, "z"),
            (3, "y"), (4, "w"), (4, "w")]
    t = pa.table({"g": pa.array([r[0] for r in rows]),
                  "i": pa.array([r[1] for r in rows])})
    out = association_rules(
        lambda: ray.data.from_arrow(t).repartition(2), "g", "i",
        min_support=1).to_pandas()
    got = {(r.antecedent, r.consequent):
           (r.support, r.n_ante, r.n_cons, r.conf_ppm, r.lift_ppm)
           for r in out.itertuples()}
    # N = 4 distinct baskets; x:3 y:3 z:1 w:1
    # x->y: sup 3, conf 3e6//3 = 1e6, lift 3*4e6//9 = 1333333
    assert got[("x", "y")] == (3, 3, 3, 1_000_000, 1_333_333)
    assert got[("y", "x")] == (3, 3, 3, 1_000_000, 1_333_333)
    # z->x: sup 1, conf 1e6//1 = 1e6, lift 1*4e6//3 = 1333333
    assert got[("z", "x")] == (1, 1, 3, 1_000_000, 1_333_333)
    # x->z: conf 1e6//3 = 333333
    assert got[("x", "z")] == (1, 3, 1, 333_333, 1_333_333)
    assert not any(a == b for a, b in got)
    assert ("w", "x") not in got  # w never co-occurs
    # min_support prunes pairs before the rule expansion
    out2 = association_rules(
        lambda: ray.data.from_arrow(t), "g", "i",
        min_support=2).to_pandas()
    assert set(zip(out2.antecedent, out2.consequent)) == {
        ("x", "y"), ("y", "x")}
    with pytest.raises(ValueError, match="min_support"):
        association_rules(lambda: ray.data.from_arrow(t), "g", "i",
                          min_support=0)
    with pytest.raises(ValueError, match="scale"):
        association_rules(lambda: ray.data.from_arrow(t), "g", "i",
                          scale=0)
    with pytest.raises(Exception, match="max_items"):
        association_rules(lambda: ray.data.from_arrow(t), "g", "i",
                          max_items=1).to_pandas()


def test_association_rules_empty_and_yaml(ray_session, tmp_path):
    """Empty input keeps the 7-column schema; the assoc_rules YAML
    component matches the direct call."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_ray.config import PipelineConfig
    from opentelemetry_collector_ray.pipelines.builder import (
        build_dataset)
    from opentelemetry_collector_ray.stages.graph import (
        association_rules)

    empty = pa.table({"g": pa.array([], pa.int64()),
                      "i": pa.array([], pa.int64())})
    got = association_rules(lambda: ray.data.from_arrow(empty),
                            "g", "i")
    assert got.count() == 0
    assert set(got.schema().names) == {
        "antecedent", "consequent", "support", "n_ante", "n_cons",
        "conf_ppm", "lift_ppm"}

    t = pa.table({"g": [1, 1, 2, 2, 3], "i": [10, 11, 10, 11, 10]})
    src = tmp_path / "m.parquet"
    pq.write_table(t, str(src))
    y = build_dataset(PipelineConfig.from_dict({
        "receivers": {"parquet": {"paths": str(src)}},
        "processors": {"assoc_rules": {"group": "g", "item": "i",
                                       "min_support": 2}},
        "exporters": {"debug": {}},
        "service": {"pipelines": {"logs": {
            "receivers": ["parquet"], "processors": ["assoc_rules"],
            "exporters": ["debug"]}}},
    })).to_pandas().sort_values(["antecedent", "consequent"]) \
        .reset_index(drop=True)
    want = association_rules(lambda: ray.data.from_arrow(t), "g", "i",
                             min_support=2).to_pandas() \
        .sort_values(["antecedent", "consequent"]).reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(y, want, check_dtype=False)


def _bfs_ref(edges, seeds, max_depth, directed=False):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        if not directed:
            adj.setdefault(b, set()).add(a)
        adj.setdefault(b, set())
        adj.setdefault(a, set())
    depth = {s: 0 for s in seeds}
    frontier = set(seeds)
    for d in range(1, max_depth + 1):
        nxt = {v for u in frontier for v in adj.get(u, ())
               if v not in depth}
        for v in nxt:
            depth[v] = d
        frontier = nxt
    return depth


def test_bfs_layers_matches_reference(ray_session):
    from opentelemetry_collector_ray.stages.graph import bfs_layers

    rng = np.random.default_rng(7)
    nodes = [f"n{i}" for i in range(40)]
    edges = [(nodes[a], nodes[b]) for a, b in
             zip(rng.integers(0, 40, 120), rng.integers(0, 40, 120))
             if a != b]
    for directed in (False, True):
        for md in (0, 1, 3):
            out = bfs_layers(_edges_ds(edges), "src", "dst",
                             seeds=["n0", "n7"], max_depth=md,
                             directed=directed).to_pandas()
            want = _bfs_ref(edges, ["n0", "n7"], md, directed)
            got = dict(zip(out["node"], out["depth"]))
            assert got == want, (directed, md)


def test_bfs_layers_distributed_path_and_guards(ray_session):
    from opentelemetry_collector_ray.stages.graph import bfs_layers

    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")]
    out = bfs_layers(_edges_ds(edges), "src", "dst", seeds=["a"],
                     max_depth=5, max_local_edges=0).to_pandas()
    got = dict(zip(out["node"], out["depth"]))
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}  # x/y unreachable
    # directed distributed: only forward edges
    out = bfs_layers(_edges_ds(edges), "src", "dst", seeds=["b"],
                     max_depth=5, directed=True,
                     max_local_edges=0).to_pandas()
    assert dict(zip(out["node"], out["depth"])) == \
        {"b": 0, "c": 1, "d": 2}
    with pytest.raises(ValueError, match="seed"):
        bfs_layers(_edges_ds(edges), "src", "dst", seeds=["zz"])
    with pytest.raises(ValueError, match="seeds must be non-empty"):
        bfs_layers(_edges_ds(edges), "src", "dst", seeds=[])
    with pytest.raises(ValueError, match="max_depth"):
        bfs_layers(_edges_ds(edges), "src", "dst", seeds=["a"],
                   max_depth=-1)


def test_pagerank_distributed_path_matches_local(ray_session):
    """max_local_edges=0 forces the distributed per-iteration combine;
    ranks must match the driver fast path to float jitter."""
    rng = np.random.default_rng(5)
    nodes = [f"n{i}" for i in range(20)]
    edges = [(nodes[a], nodes[b]) for a, b in
             zip(rng.integers(0, 20, 150), rng.integers(0, 20, 150))]
    a = pagerank(_edges_ds(edges), "src", "dst",
                 iterations=8).to_pandas()
    b = pagerank(_edges_ds(edges), "src", "dst", iterations=8,
                 max_local_edges=0).to_pandas()
    ga = dict(zip(a["node"], a["rank"]))
    gb = dict(zip(b["node"], b["rank"]))
    assert set(ga) == set(gb)
    for v in ga:
        assert ga[v] == pytest.approx(gb[v], rel=1e-9), v


def test_graph_yaml_parity(ray_session, tmp_path):
    """YAML pair_cosine / bfs == direct stage calls."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_ray.config import PipelineConfig
    from opentelemetry_collector_ray.pipelines.builder import build_dataset
    from opentelemetry_collector_ray.stages.graph import (
        bfs_layers, cooccurrence_cosine)

    t = pa.table({"g": pa.array(["g1", "g1", "g2", "g2", "g3", "g3"]),
                  "i": pa.array(["x", "y", "x", "y", "y", "z"])})
    p = tmp_path / "g.parquet"
    pq.write_table(t, str(p))

    def run(proc_name, proc_cfg):
        return build_dataset(PipelineConfig.from_dict({
            "receivers": {"parquet": {"paths": str(p)}},
            "processors": {proc_name: proc_cfg},
            "exporters": {"debug": {}},
            "service": {"pipelines": {"logs": {
                "receivers": ["parquet"], "processors": [proc_name],
                "exporters": ["debug"]}}},
        })).to_pandas()

    y = run("pair_cosine", {"group": "g", "item": "i"}) \
        .sort_values(["a", "b"]).reset_index(drop=True)
    d = cooccurrence_cosine(
        lambda: ray.data.read_parquet(str(p)), "g", "i") \
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    assert y.equals(d)

    y = run("bfs", {"src": "g", "dst": "i", "seeds": ["g1"],
                    "max_depth": 2}) \
        .sort_values("node").reset_index(drop=True)
    d = bfs_layers(lambda: ray.data.read_parquet(str(p)), "g", "i",
                   seeds=["g1"], max_depth=2).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    assert y.equals(d)


def test_pagerank_weighted_and_personalized(ray_session):
    """weight_col w == the edge replicated w times (bit-identical
    math); personalize=all nodes == standard pagerank; a personalized
    seed concentrates rank around the seed."""
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
    # weighted: a->b has weight 3
    wt = pa.table({"src": pa.array([e[0] for e in edges]),
                   "dst": pa.array([e[1] for e in edges]),
                   "w": pa.array([3.0, 1.0, 1.0, 1.0])})
    rep_edges = [("a", "b")] * 3 + edges[1:]
    a = pagerank(lambda: ray.data.from_arrow(wt), "src", "dst",
                 iterations=12, weight_col="w").to_pandas()
    b = pagerank(_edges_ds(rep_edges), "src", "dst",
                 iterations=12).to_pandas()
    ga = dict(zip(a["node"], a["rank"]))
    gb = dict(zip(b["node"], b["rank"]))
    for v in gb:
        assert ga[v] == pytest.approx(gb[v], rel=1e-12), v

    # personalize over ALL nodes == standard
    std = pagerank(_edges_ds(edges), "src", "dst",
                   iterations=10).to_pandas()
    allp = pagerank(_edges_ds(edges), "src", "dst", iterations=10,
                    personalize=["a", "b", "c"]).to_pandas()
    gs = dict(zip(std["node"], std["rank"]))
    gp = dict(zip(allp["node"], allp["rank"]))
    for v in gs:
        assert gp[v] == pytest.approx(gs[v], rel=1e-12), v

    # restart at 'a': a outranks its standard self, mass sums to 1
    pers = pagerank(_edges_ds(edges), "src", "dst", iterations=30,
                    personalize=["a"]).to_pandas()
    g1 = dict(zip(pers["node"], pers["rank"]))
    assert g1["a"] > gs["a"]
    assert pers["rank"].sum() == pytest.approx(1.0, rel=1e-9)

    with pytest.raises(ValueError, match="personalize"):
        pagerank(_edges_ds(edges), "src", "dst",
                 personalize=["zz"]).to_pandas()
    bad = pa.table({"src": ["a"], "dst": ["b"], "w": [-1.0]})
    with pytest.raises(Exception, match="negative"):
        pagerank(lambda: ray.data.from_arrow(bad), "src", "dst",
                 weight_col="w").to_pandas()
