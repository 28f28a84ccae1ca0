"""overlap_join: interval×interval equality join vs a brute-force pair
enumeration, including touching endpoints, hot keys, salt, composites."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from opentelemetry_collector_ray.stages.join import overlap_join


def _brute(lt, rt, bys):
    out = set()
    lrows, rrows = lt.to_pylist(), rt.to_pylist()
    for i, l in enumerate(lrows):
        for j, r in enumerate(rrows):
            if all(l[k] == r[k] for k in bys) and \
                    l["ls"] < r["re"] and r["rs"] < l["le"]:
                out.add((l["lid"], r["rid"]))
    return out


def _run(lt, rt, by, max_interval, **kw):
    got = overlap_join(
        ray.data.from_arrow(lt), ray.data.from_arrow(rt),
        by=by, left_start="ls", left_end="le",
        right_start="rs", right_end="re",
        max_interval=max_interval, n_buckets=4, **kw).to_pandas()
    return set(zip(got["lid"], got["rid"]))


def _mk(n_l=300, n_r=120, n_keys=5, span=1000, seed=0):
    rng = np.random.RandomState(seed)
    ls = rng.randint(0, span, n_l).astype(np.int64)
    rs = rng.randint(0, span, n_r).astype(np.int64)
    lt = pa.table({
        "k": pa.array([f"s{v}" for v in rng.randint(0, n_keys, n_l)]),
        "ls": ls, "le": ls + rng.randint(1, 80, n_l),
        "lid": np.arange(n_l, dtype=np.int64)})
    rt = pa.table({
        "k": pa.array([f"s{v}" for v in rng.randint(0, n_keys, n_r)]),
        "rs": rs, "re": rs + rng.randint(1, 50, n_r),
        "rid": np.arange(n_r, dtype=np.int64)})
    return lt, rt


def test_overlap_join_matches_bruteforce(ray_session):
    lt, rt = _mk()
    assert _run(lt, rt, "k", 50) == _brute(lt, rt, ["k"])


def test_touching_endpoints_do_not_overlap(ray_session):
    lt = pa.table({"k": ["a", "a", "a"],
                   "ls": pa.array([0, 10, 20], pa.int64()),
                   "le": pa.array([10, 20, 30], pa.int64()),
                   "lid": pa.array([0, 1, 2], pa.int64())})
    rt = pa.table({"k": ["a"], "rs": pa.array([10], pa.int64()),
                   "re": pa.array([20], pa.int64()),
                   "rid": pa.array([0], pa.int64())})
    # [0,10) and [20,30) touch [10,20) at an endpoint — no overlap
    assert _run(lt, rt, "k", 10) == {(1, 0)}


def test_long_left_short_right_and_salt(ray_session):
    rng = np.random.RandomState(3)
    n_l, n_r = 200, 150
    ls = rng.randint(0, 500, n_l).astype(np.int64)
    rs = rng.randint(0, 2000, n_r).astype(np.int64)
    lt = pa.table({"k": ["hot"] * n_l, "ls": ls,
                   "le": ls + rng.randint(1, 1500, n_l),
                   "lid": np.arange(n_l, dtype=np.int64)})
    rt = pa.table({"k": ["hot"] * n_r, "rs": rs,
                   "re": rs + rng.randint(1, 30, n_r),
                   "rid": np.arange(n_r, dtype=np.int64)})
    exp = _brute(lt, rt, ["k"])
    assert _run(lt, rt, "k", 30) == exp
    assert _run(lt, rt, "k", 30, salt=4) == exp


def test_composite_keys(ray_session):
    lt, rt = _mk(seed=7)
    lt = lt.append_column("k2", pa.array(
        (np.arange(lt.num_rows) % 2).astype(np.int64)))
    rt = rt.append_column("k2", pa.array(
        (np.arange(rt.num_rows) % 2).astype(np.int64)))
    assert _run(lt, rt, ["k", "k2"], 50) == _brute(lt, rt, ["k", "k2"])


def test_max_interval_violation_raises(ray_session):
    lt = pa.table({"k": ["a"], "ls": pa.array([0], pa.int64()),
                   "le": pa.array([5], pa.int64()),
                   "lid": pa.array([0], pa.int64())})
    rt = pa.table({"k": ["a"], "rs": pa.array([0], pa.int64()),
                   "re": pa.array([100], pa.int64()),
                   "rid": pa.array([0], pa.int64())})
    with pytest.raises(Exception, match="max_interval"):
        overlap_join(ray.data.from_arrow(lt), ray.data.from_arrow(rt),
                     by="k", left_start="ls", left_end="le",
                     right_start="rs", right_end="re",
                     max_interval=10, n_buckets=2).to_pandas()
