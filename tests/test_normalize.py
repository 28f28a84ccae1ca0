"""Two-pass min-max scaling (stages/normalize.py): global + per-key,
constant groups, integer exactness, float path, max_groups guard."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from opentelemetry_collector_ray.stages.normalize import minmax_scale


def _make(tbl):
    return lambda: ray.data.from_arrow(tbl).repartition(3)


def test_minmax_per_key_integer_exact(ray_session):
    tbl = pa.table({
        "k": pa.array(["a", "a", "a", "b", "b", "c"]),
        "x": pa.array([10, 20, 30, 5, 7, 42], pa.int64())})
    out = minmax_scale(_make(tbl), "x", key="k", scale=100).to_pandas()
    out = out.sort_values(["k", "x"]).reset_index(drop=True)
    # a: span 20 → 0,50,100; b: span 2 → 0,100; c: constant → 0
    assert out["x_scaled"].tolist() == [0, 50, 100, 0, 100, 0]
    assert out["x_scaled"].dtype == np.int64


def test_minmax_global(ray_session):
    tbl = pa.table({"x": pa.array([0, 5, 10], pa.int64())})
    out = minmax_scale(_make(tbl), "x", scale=1000).to_pandas()
    assert sorted(out["x_scaled"]) == [0, 500, 1000]


def test_minmax_float_path(ray_session):
    tbl = pa.table({"k": pa.array(["a"] * 3),
                    "x": pa.array([1.0, 1.5, 2.0], pa.float64())})
    out = minmax_scale(_make(tbl), "x", key="k", scale=1).to_pandas()
    assert sorted(out["x_scaled"]) == [0.0, 0.5, 1.0]
    assert out["x_scaled"].dtype == np.float64


def test_minmax_max_groups_guard(ray_session):
    tbl = pa.table({"k": pa.array([str(i) for i in range(50)]),
                    "x": pa.array(list(range(50)), pa.int64())})
    with pytest.raises(Exception, match="max_groups"):
        minmax_scale(_make(tbl), "x", key="k", max_groups=10).to_pandas()


def test_sigma_outliers_planted(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from opentelemetry_collector_ray.stages.normalize import sigma_outliers

    # one extreme point among 30 inliers (a single outlier's max
    # possible z-score is ~sqrt(n-1), so n must exceed k^2+1)
    vals = [10, 11, 9, 10, 12, 10] * 5 + [500]
    t = pa.table({"k": pa.array(["a"] * len(vals)),
                  "v": pa.array(vals, pa.int64())})
    out = sigma_outliers(lambda: ray.data.from_arrow(t), "v",
                         key="k").to_pandas()
    flagged = out[out["v_outlier"] == 1]["v"].tolist()
    assert flagged == [500]
    # global (key=None) path agrees on single-key data
    g = sigma_outliers(lambda: ray.data.from_arrow(t), "v").to_pandas()
    assert g.sort_values("v")["v_outlier"].tolist() == \
        out.sort_values("v")["v_outlier"].tolist()


def test_sigma_outliers_duckdb_parity(ray_session):
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from opentelemetry_collector_ray.stages.normalize import sigma_outliers

    rng = np.random.default_rng(5)
    n = 3000
    t = pa.table({
        "k": pa.array([f"g{v}" for v in rng.integers(0, 6, n)]),
        "v": pa.array(np.where(rng.random(n) < 0.01,
                               rng.integers(5000, 9000, n),
                               rng.integers(0, 100, n)).astype(np.int64))})
    got = sigma_outliers(lambda: ray.data.from_arrow(t).repartition(8),
                         "v", key="k", k=2).to_pandas()
    con = duckdb.connect()
    con.register("iv", t)
    want = con.sql("""
WITH s AS (SELECT k, CAST(count(*) AS HUGEINT) n,
                  CAST(sum(v) AS HUGEINT) s1,
                  CAST(sum(v*v) AS HUGEINT) s2 FROM iv GROUP BY k)
SELECT iv.k, iv.v,
       CAST(CASE WHEN (n*iv.v - s1)*(n*iv.v - s1) > 4*(n*s2 - s1*s1)
            THEN 1 ELSE 0 END AS BIGINT) AS v_outlier
FROM iv JOIN s USING (k)
""").df()
    key = ["k", "v", "v_outlier"]
    assert sorted(map(tuple, got[key].values.tolist())) == \
        sorted(map(tuple, want[key].values.tolist()))
    assert got["v_outlier"].sum() > 0  # planted heavy tail got flagged


def test_sigma_outliers_guards(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data

    from opentelemetry_collector_ray.stages.normalize import sigma_outliers

    tf = pa.table({"v": pa.array([1.0, 2.0])})
    with pytest.raises(Exception, match="integer"):
        sigma_outliers(lambda: ray.data.from_arrow(tf), "v").to_pandas()
    tb = pa.table({"v": pa.array([4_000_000_000, 1], pa.int64())})
    with pytest.raises(Exception, match="overflow|pre-scale"):
        sigma_outliers(lambda: ray.data.from_arrow(tb), "v").to_pandas()


def test_sigma_outliers_yaml_parity(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from opentelemetry_collector_ray.config import PipelineConfig
    from opentelemetry_collector_ray.pipelines.builder import build_dataset
    from opentelemetry_collector_ray.stages.normalize import sigma_outliers

    p = tmp_path / "v.parquet"
    pq.write_table(pa.table({
        "k": pa.array(["a"] * 9 + ["a"]),
        "v": pa.array([10] * 9 + [900], pa.int64())}), str(p))
    y = build_dataset(PipelineConfig.from_dict({
        "receivers": {"parquet": {"paths": str(p)}},
        "processors": {"sigma_outliers": {"column": "v", "key": "k"}},
        "exporters": {"debug": {}},
        "service": {"pipelines": {"logs": {
            "receivers": ["parquet"], "processors": ["sigma_outliers"],
            "exporters": ["debug"]}}},
    })).to_pandas()
    direct = sigma_outliers(lambda: ray.data.read_parquet(str(p)), "v",
                            key="k").to_pandas()
    assert sorted(map(tuple, y.values.tolist())) == \
        sorted(map(tuple, direct.values.tolist()))


def test_mad_outliers_planted_and_global(ray_session):
    import pyarrow as pa
    import ray.data

    from opentelemetry_collector_ray.stages.normalize import mad_outliers

    # MAD is robust: ONE wild point cannot inflate the threshold the
    # way it inflates sigma (cf. the sqrt(n-1) cap above)
    vals = [10, 11, 9, 10, 12, 10, 11, 9, 10, 500]
    t = pa.table({"k": pa.array(["a"] * 10),
                  "v": pa.array(vals, pa.int64())})
    out = mad_outliers(lambda: ray.data.from_arrow(t), "v",
                       key="k").to_pandas()
    assert out[out["v_outlier"] == 1]["v"].tolist() == [500]
    g = mad_outliers(lambda: ray.data.from_arrow(t), "v").to_pandas()
    assert g.sort_values("v")["v_outlier"].tolist() == \
        out.sort_values("v")["v_outlier"].tolist()
    assert "_g" not in g.columns  # synthetic global key never leaks


def test_mad_outliers_duckdb_parity(ray_session):
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from opentelemetry_collector_ray.stages.normalize import mad_outliers

    rng = np.random.default_rng(9)
    n = 2500
    t = pa.table({
        "k": pa.array([f"g{v}" for v in rng.integers(0, 5, n)]),
        "v": pa.array(np.where(rng.random(n) < 0.02,
                               rng.integers(2000, 5000, n),
                               rng.integers(0, 60, n)).astype(np.int64))})
    got = mad_outliers(lambda: ray.data.from_arrow(t).repartition(8),
                       "v", key="k", k=2).to_pandas()
    con = duckdb.connect()
    con.register("iv", t)
    want = con.sql("""
WITH m AS (SELECT k, quantile_disc(v, 0.5) AS med FROM iv GROUP BY k),
d AS (SELECT iv.k, iv.v, abs(iv.v - m.med) AS dev
      FROM iv JOIN m USING (k)),
md AS (SELECT k, quantile_disc(dev, 0.5) AS mad FROM d GROUP BY k)
SELECT d.k, d.v, CAST(CASE WHEN d.dev > 2 * md.mad THEN 1 ELSE 0 END
       AS BIGINT) AS v_outlier
FROM d JOIN md USING (k)
""").df()
    key = ["k", "v", "v_outlier"]
    assert sorted(map(tuple, got[key].values.tolist())) == \
        sorted(map(tuple, want[key].values.tolist()))
    assert got["v_outlier"].sum() > 0


def test_sigma_outliers_distributed_sum_overflow_guard(ray_session):
    """Per-element |x| passes the batch guard but n*max|x|^2 could wrap
    the distributed int64 sum of squares -> loud driver-side failure
    (review finding)."""
    import pyarrow as pa
    import pytest
    import ray.data

    from opentelemetry_collector_ray.stages.normalize import sigma_outliers

    t = pa.table({"v": pa.array([2_900_000_000, 2_900_000_000],
                                pa.int64())})
    with pytest.raises(ValueError, match="sum-of-squares|overflow"):
        sigma_outliers(lambda: ray.data.from_arrow(t), "v").to_pandas()


def test_robust_scale_planted_and_yaml(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from opentelemetry_collector_ray.config import PipelineConfig
    from opentelemetry_collector_ray.pipelines.builder import build_dataset
    from opentelemetry_collector_ray.stages.normalize import robust_scale

    # sorted a: [0,10,20,30,100]; floor((n-1)q): p25=10 p50=20 p75=30
    # IQR=20; e.g. x=0 -> (0-20)*1000000 // 20 = -1000000 (floor)
    t = pa.table({"k": pa.array(["a"] * 5 + ["b"] * 2),
                  "v": pa.array([0, 10, 20, 30, 100, 7, 7], pa.int64())})
    p = tmp_path / "v.parquet"
    pq.write_table(t, str(p))
    out = robust_scale(lambda: ray.data.read_parquet(str(p)), "v",
                       key="k").to_pandas()
    a = out[out["k"] == "a"].sort_values("v")["v_rscaled"].tolist()
    assert a == [-1000000, -500000, 0, 500000, 4000000]
    # zero-IQR group scales to 0
    assert out[out["k"] == "b"]["v_rscaled"].tolist() == [0, 0]
    # YAML parity
    y = build_dataset(PipelineConfig.from_dict({
        "receivers": {"parquet": {"paths": str(p)}},
        "processors": {"robust_scale": {"column": "v", "key": "k"}},
        "exporters": {"debug": {}},
        "service": {"pipelines": {"logs": {
            "receivers": ["parquet"], "processors": ["robust_scale"],
            "exporters": ["debug"]}}},
    })).to_pandas()
    assert sorted(map(tuple, y.values.tolist())) == \
        sorted(map(tuple, out.values.tolist()))


def test_minmax_int_overflow_guard(ray_session):
    """A span whose (max-min)*scale exceeds int64 must raise loudly
    instead of wrapping silently in the pass-2 numerator."""
    t = pa.table({"k": pa.array(["a", "a"]),
                  "v": pa.array([0, 10**13], pa.int64())})
    with pytest.raises(OverflowError, match="overflow|pre-scale"):
        minmax_scale(lambda: ray.data.from_arrow(t), "v", key="k",
                     scale=1_000_000).to_pandas()
    # same span at a small scale is fine
    out = minmax_scale(lambda: ray.data.from_arrow(t), "v", key="k",
                       scale=100).to_pandas()
    assert sorted(out["v_scaled"]) == [0, 100]


def test_robust_scale_int_overflow_guard(ray_session):
    from opentelemetry_collector_ray.stages.normalize import robust_scale

    t = pa.table({"k": pa.array(["a"] * 5),
                  "v": pa.array([0, 1, 2, 3, 10**13], pa.int64())})
    with pytest.raises(OverflowError, match="overflow|pre-scale"):
        robust_scale(lambda: ray.data.from_arrow(t), "v", key="k",
                     scale=1_000_000).to_pandas()
    # small scale passes and median/IQR stay exact
    out = robust_scale(lambda: ray.data.from_arrow(t), "v", key="k",
                       scale=100).to_pandas().sort_values("v")
    # median=2, IQR=p75-p25=3-1=2 -> (0-2)*100//2=-100
    assert out["v_rscaled"].tolist()[0] == -100


def test_ks_two_sample_planted(ray_session):
    """KS distance: identical slices -> 0, disjoint -> 1, shifted ->
    matches the numpy ECDF reference exactly (integer lanes)."""
    import ray.data

    from opentelemetry_collector_ray.stages.normalize import (
        ks_two_sample)

    def ks(t):
        return ks_two_sample(ray.data.from_arrow(t).repartition(3),
                             "g", "v", "a", "b").to_pandas().iloc[0]

    rng = np.random.default_rng(3)
    va = rng.integers(0, 100, 800)
    r = ks(pa.table({"g": ["a"] * 800 + ["b"] * 800,
                     "v": np.concatenate([va, va])}))
    assert r["d_num"] == 0 and r["d"] == 0.0

    r = ks(pa.table({"g": ["a"] * 300 + ["b"] * 200,
                     "v": np.concatenate([rng.integers(0, 50, 300),
                                          rng.integers(100, 150, 200)])}))
    assert r["d"] == 1.0 and r["d_num"] == r["n_a"] * r["n_b"]

    vb = rng.integers(10, 110, 500)
    va2 = rng.integers(0, 100, 700)
    tbl = pa.table({"g": ["a"] * 700 + ["b"] * 500 + ["other"] * 50,
                    "v": np.concatenate([va2, vb,
                                         rng.integers(0, 9, 50)])})
    r = ks(tbl)
    # numpy reference over the union grid
    grid = np.unique(np.concatenate([va2, vb]))
    ea = np.searchsorted(np.sort(va2), grid, side="right")
    eb = np.searchsorted(np.sort(vb), grid, side="right")
    want = np.abs(500 * ea - 700 * eb).max()
    assert r["n_a"] == 700 and r["n_b"] == 500
    assert r["d_num"] == want
    assert r["d"] == want / float(700 * 500)

    with pytest.raises(ValueError, match="must differ"):
        ks_two_sample(ray.data.from_arrow(tbl), "g", "v", "a", "a")
    with pytest.raises(Exception, match="empty slice"):
        ks_two_sample(ray.data.from_arrow(tbl), "g", "v", "a",
                      "zz").to_pandas()
    with pytest.raises(Exception, match="nulls"):
        ks_two_sample(ray.data.from_arrow(pa.table(
            {"g": ["a", "b"], "v": pa.array([1, None])})),
            "g", "v", "a", "b").to_pandas()


def test_weighted_quantiles_and_ks_yaml_parity(ray_session, tmp_path):
    """YAML weighted_quantiles / ks_drift == direct stage calls."""
    import pyarrow.parquet as pq
    import ray.data

    from opentelemetry_collector_ray.config import PipelineConfig
    from opentelemetry_collector_ray.pipelines.builder import build_dataset
    from opentelemetry_collector_ray.stages.normalize import ks_two_sample
    from opentelemetry_collector_ray.stages.spanops import (
        grouped_weighted_quantiles)

    rng = np.random.default_rng(8)
    t = pa.table({"k": pa.array(rng.integers(0, 5, 400).astype("str")),
                  "v": pa.array(rng.integers(0, 200, 400)),
                  "w": pa.array(rng.integers(1, 6, 400))})
    p = tmp_path / "t.parquet"
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

    y = run("weighted_quantiles", {"key": "k", "value_col": "v",
                                   "weight_col": "w",
                                   "qs": [[1, 2], [9, 10]]}) \
        .sort_values("k").reset_index(drop=True)
    d = grouped_weighted_quantiles(
        ray.data.read_parquet(str(p)), "k", "v", "w",
        qs=((1, 2), (9, 10))).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert y.equals(d)

    y = run("ks_drift", {"group_col": "k", "value_col": "v",
                         "group_a": "0", "group_b": "1"})
    d = ks_two_sample(ray.data.read_parquet(str(p)), "k", "v",
                      "0", "1").to_pandas()
    assert y.equals(d)


def test_ks_u2_matches_bruteforce(ray_session):
    """u2 = 2*U_a (ties half) == the O(n^2) pair count on small data."""
    import ray.data

    from opentelemetry_collector_ray.stages.normalize import (
        ks_two_sample)

    rng = np.random.default_rng(5)
    va = rng.integers(0, 30, 150)
    vb = rng.integers(5, 35, 120)
    t = pa.table({"g": ["a"] * 150 + ["b"] * 120,
                  "v": np.concatenate([va, vb])})
    r = ks_two_sample(ray.data.from_arrow(t).repartition(2),
                      "g", "v", "a", "b").to_pandas().iloc[0]
    brute = 2 * (va[:, None] > vb[None, :]).sum() + \
        (va[:, None] == vb[None, :]).sum()
    assert r["u2"] == brute


def test_ks_w1_matches_scipy_style_reference(ray_session):
    """w1/(na*nb) == the classic 1-D Wasserstein distance (numpy
    reference over sorted samples / ECDF integral); shift-by-c moves
    W1 by exactly c."""
    import ray.data

    from opentelemetry_collector_ray.stages.normalize import (
        ks_two_sample)

    rng = np.random.default_rng(9)
    va = rng.integers(0, 60, 400)
    vb = rng.integers(0, 60, 250)
    t = pa.table({"g": ["a"] * 400 + ["b"] * 250,
                  "v": np.concatenate([va, vb])})
    r = ks_two_sample(ray.data.from_arrow(t).repartition(2),
                      "g", "v", "a", "b").to_pandas().iloc[0]
    # reference: integral of |ECDF_a - ECDF_b| over the value axis
    grid = np.unique(np.concatenate([va, vb]))
    ea = np.searchsorted(np.sort(va), grid, side="right") / len(va)
    eb = np.searchsorted(np.sort(vb), grid, side="right") / len(vb)
    want = float((np.abs(ea - eb)[:-1] * np.diff(grid)).sum())
    assert r["w1"] == pytest.approx(want, rel=1e-12)
    # pure shift: b = a + 7 -> W1 == 7 exactly (integer lanes)
    t2 = pa.table({"g": ["a"] * 400 + ["b"] * 400,
                   "v": np.concatenate([va, va + 7])})
    r2 = ks_two_sample(ray.data.from_arrow(t2), "g", "v",
                       "a", "b").to_pandas().iloc[0]
    assert r2["w1_num"] == 7 * 400 * 400 and r2["w1"] == 7.0


def test_grouped_ks_matches_global(ray_session):
    """Per-key KS == one global ks_two_sample per key; empty-slice
    keys dropped; identical-slice key scores 0."""
    import ray.data

    from opentelemetry_collector_ray.stages.normalize import (
        grouped_ks, ks_two_sample)

    rng = np.random.default_rng(12)
    rows_k, rows_g, rows_v = [], [], []
    for k, shift in (("s1", 0), ("s2", 15), ("s3", 40)):
        va = rng.integers(0, 50, 120)
        vb = rng.integers(shift, 50 + shift, 90)
        rows_k += [k] * 210
        rows_g += ["a"] * 120 + ["b"] * 90
        rows_v += list(va) + list(vb)
    # s4: only slice a -> dropped; s5: identical -> D=0
    rows_k += ["s4"] * 10 + ["s5"] * 20
    rows_g += ["a"] * 10 + ["a"] * 10 + ["b"] * 10
    ident = list(rng.integers(0, 9, 10))
    rows_v += list(rng.integers(0, 9, 10)) + ident + ident
    t = pa.table({"k": pa.array(rows_k), "g": pa.array(rows_g),
                  "v": pa.array(rows_v, pa.int64())})
    out = grouped_ks(ray.data.from_arrow(t).repartition(4), "k", "g",
                     "v", "a", "b", n_buckets=8).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert out["k"].tolist() == ["s1", "s2", "s3", "s5"]
    for _, row in out.iterrows():
        sub = t.filter(pa.compute.equal(t.column("k"), row["k"]))
        ref = ks_two_sample(ray.data.from_arrow(sub), "g", "v",
                            "a", "b").to_pandas().iloc[0]
        assert row["n_a"] == ref["n_a"] and row["n_b"] == ref["n_b"]
        assert row["d_num"] == ref["d_num"] and row["d"] == ref["d"]
    assert out.set_index("k").loc["s5", "d_num"] == 0
    # the fully-disjoint shift should score higher than the small one
    g = out.set_index("k")
    assert g.loc["s3", "d"] > g.loc["s2", "d"] > g.loc["s1", "d"]


def test_grouped_ks_yaml_parity(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data

    from opentelemetry_collector_ray.config import PipelineConfig
    from opentelemetry_collector_ray.pipelines.builder import build_dataset
    from opentelemetry_collector_ray.stages.normalize import grouped_ks

    rng = np.random.default_rng(7)
    t = pa.table({"k": pa.array(rng.choice(["x", "y"], 300)),
                  "g": pa.array(rng.choice(["a", "b"], 300)),
                  "v": pa.array(rng.integers(0, 40, 300), pa.int64())})
    p = tmp_path / "gks.parquet"
    pq.write_table(t, str(p))
    y = build_dataset(PipelineConfig.from_dict({
        "receivers": {"parquet": {"paths": str(p)}},
        "processors": {"ks_drift": {
            "key": "k", "group_col": "g", "value_col": "v",
            "group_a": "a", "group_b": "b"}},
        "exporters": {"debug": {}},
        "service": {"pipelines": {"logs": {
            "receivers": ["parquet"], "processors": ["ks_drift"],
            "exporters": ["debug"]}}},
    })).to_pandas().sort_values("k").reset_index(drop=True)
    d = grouped_ks(ray.data.read_parquet(str(p)), "k", "g", "v",
                   "a", "b").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert y.equals(d)


def test_ks_and_grouped_ks_guards(ray_session):
    """Review-fix regressions: float value domain rejected (the W1
    lane would truncate silently); key colliding with internal/output
    columns rejected."""
    import ray.data

    from opentelemetry_collector_ray.stages.normalize import (
        grouped_ks, ks_two_sample)

    t = pa.table({"g": ["a", "b"], "v": [0.1, 0.9]})
    with pytest.raises(Exception, match="integer"):
        ks_two_sample(ray.data.from_arrow(t), "g", "v",
                      "a", "b").to_pandas()
    t2 = pa.table({"n_a": ["x", "x"], "g": ["a", "b"], "v": [1, 2]})
    with pytest.raises(ValueError, match="collides"):
        grouped_ks(ray.data.from_arrow(t2), "n_a", "g", "v", "a", "b")


def test_chi2_two_sample_exact(ray_session):
    """Hand-computed 2×2 contingency: a=(10 x, 20 y), b=(30 x, 0 y).
    N=60, na=30, nb=30, C_x=40, C_y=20; every term checked against the
    big-int formula by hand."""
    import ray.data

    from opentelemetry_collector_ray.stages.normalize import chi2_two_sample

    t = pa.table({"g": ["a"] * 30 + ["b"] * 30,
                  "c": ["x"] * 10 + ["y"] * 20 + ["x"] * 30})
    df = chi2_two_sample(ray.data.from_arrow(t), "g", "c", "a", "b") \
        .to_pandas().sort_values("c").reset_index(drop=True)
    assert list(df["c"]) == ["x", "y"]
    assert list(df["o_a"]) == [10, 30] or list(df["o_a"]) == [10, 20]
    # x: E_a = 30*40/60 = 20 -> (10*60-30*40)^2*1e6 // (60*30*40)
    tx_a = (10 * 60 - 30 * 40) ** 2 * 1_000_000 // (60 * 30 * 40)
    tx_b = (30 * 60 - 30 * 40) ** 2 * 1_000_000 // (60 * 30 * 40)
    ty_a = (20 * 60 - 30 * 20) ** 2 * 1_000_000 // (60 * 30 * 20)
    ty_b = (0 * 60 - 30 * 20) ** 2 * 1_000_000 // (60 * 30 * 20)
    assert df.loc[0, "chi2_scaled"] == tx_a + tx_b == 10_000_000
    assert df.loc[1, "chi2_scaled"] == ty_a + ty_b == 20_000_000
    # cross-check the float value against the classic chi2 statistic
    assert abs((tx_a + tx_b + ty_a + ty_b) / 1e6 - 30.0) < 1e-9


def test_chi2_two_sample_guards(ray_session):
    import ray.data

    from opentelemetry_collector_ray.stages.normalize import chi2_two_sample

    t = pa.table({"g": ["a", "b"], "c": ["x", "y"]})
    with pytest.raises(ValueError, match="differ"):
        chi2_two_sample(ray.data.from_arrow(t), "g", "c", "a", "a")
    tn = pa.table({"g": ["a", "b"], "c": pa.array(["x", None])})
    with pytest.raises(Exception, match="null"):
        chi2_two_sample(ray.data.from_arrow(tn), "g", "c", "a", "b") \
            .to_pandas()
    # one slice empty
    te = pa.table({"g": ["a", "a"], "c": ["x", "y"]})
    with pytest.raises(Exception, match="empty slice"):
        chi2_two_sample(ray.data.from_arrow(te), "g", "c", "a", "b") \
            .to_pandas()
    # cell cap
    tb = pa.table({"g": ["a", "b"] * 4, "c": [str(i) for i in range(8)]})
    with pytest.raises(Exception, match="max_cells"):
        chi2_two_sample(ray.data.from_arrow(tb), "g", "c", "a", "b",
                        max_cells=3).to_pandas()


def test_quantile_map_planted(ray_session):
    import pyarrow as pa

    import ray.data

    from opentelemetry_collector_ray.stages.normalize import quantile_map

    # ref slice: values 10 x2, 20 x2 (n_ref=4, cum 2/4)
    # slice b: 100, 200 (n=2): r=0 -> idx 0 -> first cum>0 = 10;
    #                          r=1 -> idx (3*1)//1 = 3 -> cum>3 = 20
    rows = ([{"s": "ref", "v": 10}] * 2 + [{"s": "ref", "v": 20}] * 2
            + [{"s": "b", "v": 100}, {"s": "b", "v": 200}]
            + [{"s": "solo", "v": 7}])  # n=1 slice: dropped
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(2)
    out = quantile_map(ds, "s", "v", "ref").to_pandas() \
        .sort_values(["s", "v"]).reset_index(drop=True)
    assert out.s.tolist() == ["b", "b"]
    assert out.v.tolist() == [100, 200]
    assert out.mapped.tolist() == [10, 20]
    # identity: mapping the reference distribution onto itself via a
    # copy slice reproduces its own values
    rows2 = ([{"s": "ref", "v": x} for x in (1, 2, 3, 4)]
             + [{"s": "copy", "v": x} for x in (1, 2, 3, 4)])
    ds2 = ray.data.from_arrow(pa.Table.from_pylist(rows2))
    out2 = quantile_map(ds2, "s", "v", "ref").to_pandas() \
        .sort_values("v").reset_index(drop=True)
    assert out2.mapped.tolist() == [1, 2, 3, 4]


def test_quantile_map_guards(ray_session):
    import pyarrow as pa
    import pytest

    import ray.data

    from opentelemetry_collector_ray.stages.normalize import quantile_map

    ds = ray.data.from_arrow(pa.Table.from_pylist(
        [{"s": "a", "v": 1}, {"s": "a", "v": 2}]))
    with pytest.raises(ValueError, match="not present"):
        quantile_map(ds, "s", "v", "missing")
    dsf = ray.data.from_arrow(pa.Table.from_pylist(
        [{"s": "a", "v": 1.5}, {"s": "ref", "v": 1.0}]))
    with pytest.raises(Exception, match="integer"):
        quantile_map(dsf, "s", "v", "ref")
    with pytest.raises(ValueError, match="max_table"):
        quantile_map(ds, "s", "v", "a", max_table=1)
