"""merge_intervals (stages/intervals.py): planted truth, prereduce
associativity, randomized DuckDB gaps-and-islands parity, guards, YAML
builder parity."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray.data

from opentelemetry_collector_ray.stages.intervals import merge_intervals


def _run(rows, **kw):
    t = pa.table({"k": pa.array([r[0] for r in rows]),
                  "s": pa.array([r[1] for r in rows], pa.int64()),
                  "e": pa.array([r[2] for r in rows], pa.int64())})
    out = merge_intervals(ray.data.from_arrow(t), "k", "s", "e",
                          **kw).to_pandas()
    return sorted(map(tuple, out[["k", "merged_start", "merged_end",
                                  "n_intervals"]].values.tolist()))


def test_merge_planted(ray_session):
    rows = [("a", 0, 10), ("a", 5, 12), ("a", 12, 20),  # chain: touch merges
            ("a", 25, 30),                               # gap -> new island
            ("b", 0, 100), ("b", 10, 20),                # contained
            ("c", 7, 7)]                                 # zero-length
    assert _run(rows) == [("a", 0, 20, 3), ("a", 25, 30, 1),
                          ("b", 0, 100, 2), ("c", 7, 7, 1)]


def test_merge_min_gap(ray_session):
    rows = [("a", 0, 10), ("a", 13, 20), ("a", 26, 30)]
    # gap of 3 between first two, 6 between last two
    assert _run(rows, min_gap=3) == [("a", 0, 20, 2), ("a", 26, 30, 1)]
    assert _run(rows, min_gap=6) == [("a", 0, 30, 3)]


def test_merge_prereduce_parity(ray_session):
    """prereduce=True == prereduce=False (associativity), many blocks."""
    rng = np.random.default_rng(11)
    n = 4000
    k = rng.integers(0, 5, n)
    s = rng.integers(0, 2000, n).astype(np.int64)
    e = s + rng.integers(0, 40, n)
    t = pa.table({"k": pa.array([f"k{v}" for v in k]),
                  "s": pa.array(s), "e": pa.array(e)})
    ds = ray.data.from_arrow(t).repartition(16)
    a = merge_intervals(ds, "k", "s", "e", prereduce=True).to_pandas()
    b = merge_intervals(ds, "k", "s", "e", prereduce=False).to_pandas()
    key = ["k", "merged_start", "merged_end", "n_intervals"]
    assert sorted(map(tuple, a[key].values.tolist())) == \
        sorted(map(tuple, b[key].values.tolist()))


@pytest.mark.parametrize("seed,gap", [(1, 0), (2, 5), (3, 17)])
def test_merge_duckdb_parity(ray_session, seed, gap):
    rng = np.random.default_rng(seed)
    n = 1500
    k = rng.integers(0, 7, n)
    s = rng.integers(0, 1200, n).astype(np.int64)
    e = s + rng.integers(0, 30, n)
    t = pa.table({"k": pa.array([f"u{v}" for v in k]),
                  "s": pa.array(s), "e": pa.array(e)})
    got = merge_intervals(ray.data.from_arrow(t).repartition(8),
                          "k", "s", "e", min_gap=gap).to_pandas()
    con = duckdb.connect()
    con.register("iv", t)
    want = con.sql(f"""
WITH b AS (SELECT k, s, e,
        CASE WHEN s > COALESCE(max(e) OVER (PARTITION BY k ORDER BY s, e
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + {gap},
             s - 1)
             THEN 1 ELSE 0 END AS brk FROM iv),
g AS (SELECT *, sum(brk) OVER (PARTITION BY k ORDER BY s, e
        ROWS UNBOUNDED PRECEDING) AS grp FROM b)
SELECT k, min(s) AS merged_start, max(e) AS merged_end,
       CAST(count(*) AS BIGINT) AS n_intervals
FROM g GROUP BY k, grp
""").df()
    cols = ["k", "merged_start", "merged_end", "n_intervals"]
    assert sorted(map(tuple, got[cols].values.tolist())) == \
        sorted(map(tuple, want[cols].values.tolist()))


def test_merge_guards(ray_session):
    t = pa.table({"k": pa.array(["a"]), "s": pa.array([5], pa.int64()),
                  "e": pa.array([3], pa.int64())})
    with pytest.raises(Exception, match="e < s|end.*start|rows with"):
        merge_intervals(ray.data.from_arrow(t), "k", "s", "e").to_pandas()
    with pytest.raises(ValueError, match="min_gap"):
        merge_intervals(ray.data.from_arrow(t), "k", "s", "e", min_gap=-1)
    tf = pa.table({"k": pa.array(["a"]), "s": pa.array([1.0]),
                   "e": pa.array([2.0])})
    with pytest.raises(Exception, match="integer"):
        merge_intervals(ray.data.from_arrow(tf), "k", "s",
                        "e").to_pandas()


def test_merge_yaml_parity(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from opentelemetry_collector_ray.config import PipelineConfig
    from opentelemetry_collector_ray.pipelines.builder import build_dataset

    p = tmp_path / "iv.parquet"
    pq.write_table(pa.table({
        "k": pa.array(["a", "a", "b"]),
        "s": pa.array([0, 5, 2], pa.int64()),
        "e": pa.array([10, 20, 4], pa.int64())}), str(p))
    y = build_dataset(PipelineConfig.from_dict({
        "receivers": {"parquet": {"paths": str(p)}},
        "processors": {"merge_intervals": {
            "key": "k", "start_col": "s", "end_col": "e"}},
        "exporters": {"debug": {}},
        "service": {"pipelines": {"logs": {
            "receivers": ["parquet"], "processors": ["merge_intervals"],
            "exporters": ["debug"]}}},
    })).to_pandas()
    direct = merge_intervals(
        ray.data.read_parquet(str(p)), "k", "s", "e").to_pandas()
    assert sorted(map(tuple, y.values.tolist())) == \
        sorted(map(tuple, direct.values.tolist()))


def test_concurrency_profile_planted(ray_session):
    from opentelemetry_collector_ray.stages.intervals import (
        concurrency_profile)

    rows = [("a", 0, 10), ("a", 5, 15), ("a", 10, 20),  # 10: end+start tie
            ("b", 0, 4)]
    t = pa.table({"k": pa.array([r[0] for r in rows]),
                  "s": pa.array([r[1] for r in rows], pa.int64()),
                  "e": pa.array([r[2] for r in rows], pa.int64())})

    def make():
        return ray.data.from_arrow(t).repartition(2)

    out = concurrency_profile(make, "k", "s", "e").to_pandas()
    a = out[out["k"] == "a"].sort_values(["t", "delta"])
    # ends sort before starts at t=10: conc path 1,2,1,2,1,0
    assert list(zip(a["t"], a["delta"], a["concurrency"])) == [
        (0, 1, 1), (5, 1, 2), (10, -1, 1), (10, 1, 2),
        (15, -1, 1), (20, -1, 0)]
    b = out[out["k"] == "b"].sort_values(["t", "delta"])
    assert b["concurrency"].tolist() == [1, 0]  # key b unaffected by a


def test_concurrency_profile_duckdb_parity(ray_session):
    rng = np.random.default_rng(21)
    n = 800
    t = pa.table({
        "k": pa.array([f"s{v}" for v in rng.integers(0, 4, n)]),
        "s": pa.array(rng.integers(0, 500, n).astype(np.int64))})
    t = t.append_column("e", pa.array(
        t.column("s").to_numpy(zero_copy_only=False)
        + rng.integers(0, 60, n)))
    from opentelemetry_collector_ray.stages.intervals import (
        concurrency_profile)

    got = concurrency_profile(
        lambda: ray.data.from_arrow(t).repartition(4),
        "k", "s", "e").to_pandas()
    con = duckdb.connect()
    con.register("iv", t)
    want = con.sql("""
WITH d AS (SELECT k, s AS t, CAST(1 AS BIGINT) AS delta FROM iv
           UNION ALL SELECT k, e, CAST(-1 AS BIGINT) FROM iv)
SELECT k, t, delta, CAST(sum(delta) OVER (PARTITION BY k
       ORDER BY t, delta ROWS UNBOUNDED PRECEDING) AS BIGINT)
       AS concurrency
FROM d
""").df()
    cols = ["k", "t", "delta", "concurrency"]
    assert sorted(map(tuple, got[cols].values.tolist())) == \
        sorted(map(tuple, want[cols].values.tolist()))
    assert got["concurrency"].max() > 1  # real overlap exercised


# ------------------------------------------------- overlap pair count


def test_overlap_pair_count_matches_sql_self_join(ray_session):
    import duckdb

    from opentelemetry_collector_ray.stages.intervals import (
        overlap_pair_count)

    rng = np.random.default_rng(17)
    n = 4000
    s = rng.integers(0, 100_000, n).astype(np.int64)
    tbl = pa.table({
        "k": pa.array(rng.choice(["a", "b", "c", "d"], n)),
        "id": pa.array(np.arange(n), pa.int64()),
        "s": pa.array(s),
        "e": pa.array(s + rng.integers(1, 500, n).astype(np.int64)),
    })
    got = overlap_pair_count(
        ray.data.from_arrow(tbl).repartition(5), "k", "s",
        "e").to_pandas().sort_values("k").reset_index(drop=True)
    exp = duckdb.sql("""
        WITH p AS (SELECT a.k AS k FROM tbl a JOIN tbl b
                   ON a.k = b.k AND a.id <> b.id
                      AND a.s < b.e AND b.s < a.e)
        SELECT t.k, CAST(coalesce(c.n, 0) AS BIGINT) AS n_overlap_pairs,
               CAST(count(*) AS BIGINT) AS n_intervals
        FROM tbl t LEFT JOIN (SELECT k, count(*) // 2 AS n FROM p
                              GROUP BY k) c USING (k)
        GROUP BY t.k, c.n ORDER BY t.k""").df()
    assert got["k"].tolist() == exp["k"].tolist()
    assert got["n_overlap_pairs"].tolist() == \
        exp["n_overlap_pairs"].tolist()
    assert got["n_intervals"].tolist() == exp["n_intervals"].tolist()


def test_overlap_pair_count_planted(ray_session):
    from opentelemetry_collector_ray.stages.intervals import (
        overlap_pair_count)

    tbl = pa.table({
        # key "all": 3 intervals pairwise overlapping -> 3 pairs;
        # key "none": 3 touching-but-disjoint [0,10) [10,20) [20,30)
        # -> 0 pairs (end == next start does NOT overlap);
        # key "chain": [0,15) [10,25) [20,35) -> 2 pairs
        "k": pa.array(["all"] * 3 + ["none"] * 3 + ["chain"] * 3),
        "s": pa.array([0, 1, 2, 0, 10, 20, 0, 10, 20], pa.int64()),
        "e": pa.array([10, 10, 10, 10, 20, 30, 15, 25, 35], pa.int64()),
    })
    got = overlap_pair_count(ray.data.from_arrow(tbl).repartition(2),
                             "k", "s", "e").to_pandas()
    res = dict(zip(got["k"], got["n_overlap_pairs"]))
    assert res == {"all": 3, "none": 0, "chain": 2}


def test_overlap_pair_count_validation(ray_session):
    from opentelemetry_collector_ray.stages.intervals import (
        overlap_pair_count)

    bad = ray.data.from_arrow(pa.table({
        "k": ["a"], "s": pa.array([5], pa.int64()),
        "e": pa.array([5], pa.int64())}))
    with pytest.raises(Exception, match="end > start"):
        overlap_pair_count(bad, "k", "s", "e").materialize()
    nulls = ray.data.from_arrow(pa.table({
        "k": ["a", "a"], "s": pa.array([1, None], pa.int64()),
        "e": pa.array([2, 3], pa.int64())}))
    with pytest.raises(Exception, match="null"):
        overlap_pair_count(nulls, "k", "s", "e").materialize()


def test_rolling_distinct_count_hand_case(ray_session):
    """u1 active days {1,3,10}, u2 day {3}, window=3: coverage unions
    u1=[1,5]+[10,12], u2=[3,5] -> counts 1,1,2,2,2,0...,1,1,1."""
    from opentelemetry_collector_ray.stages.intervals import (
        rolling_distinct_count)

    t = pa.table({"u": ["u1", "u1", "u1", "u2"],
                  "d": pa.array([1, 3, 10, 3], pa.int64())})
    out = rolling_distinct_count(ray.data.from_arrow(t), "u", "d", 3) \
        .to_pandas().sort_values("t").reset_index(drop=True)
    assert list(out["t"]) == [1, 2, 3, 4, 5, 10, 11, 12]
    assert list(out["n_active"]) == [1, 1, 2, 2, 2, 1, 1, 1]
    # window=1 degenerates to per-day distinct count
    out1 = rolling_distinct_count(ray.data.from_arrow(t), "u", "d", 1) \
        .to_pandas().sort_values("t").reset_index(drop=True)
    assert list(out1["t"]) == [1, 3, 10]
    assert list(out1["n_active"]) == [1, 2, 1]


def test_rolling_distinct_count_empty_and_guards(ray_session):
    from opentelemetry_collector_ray.stages.intervals import (
        rolling_distinct_count)

    empty = ray.data.from_arrow(pa.table({
        "u": pa.array([], pa.string()), "d": pa.array([], pa.int64())}))
    out = rolling_distinct_count(empty, "u", "d", 7)
    assert out.to_pandas().shape[0] == 0
    assert [f.name for f in out.schema().base_schema] == ["t", "n_active"]

    t = pa.table({"u": ["a"], "d": pa.array([1], pa.int64())})
    with pytest.raises(ValueError, match="window"):
        rolling_distinct_count(ray.data.from_arrow(t), "u", "d", 0)
    tn = pa.table({"u": ["a", None], "d": pa.array([1, 2], pa.int64())})
    with pytest.raises(Exception, match="null"):
        rolling_distinct_count(ray.data.from_arrow(tn), "u", "d", 3) \
            .materialize()
    tf = pa.table({"u": ["a"], "d": pa.array([1.5], pa.float64())})
    with pytest.raises(Exception, match="integer"):
        rolling_distinct_count(ray.data.from_arrow(tf), "u", "d", 3) \
            .materialize()
    # span cap fires on the driver sweep
    tw = pa.table({"u": ["a", "a"],
                   "d": pa.array([0, 10_000], pa.int64())})
    with pytest.raises(Exception, match="span"):
        rolling_distinct_count(ray.data.from_arrow(tw), "u", "d", 3,
                               max_times=100).materialize()
