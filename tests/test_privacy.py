"""k-anonymity / l-diversity release filter (stages/privacy.py):
window-SQL parity, planted suppression truth, null guard, argument
validation, YAML parity."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray.data

from opentelemetry_collector_ray.stages.privacy import k_anonymize


def _people(n=400, seed=3):
    rng = np.random.default_rng(seed)
    return pa.table({
        "row_id": pa.array(np.arange(n), pa.int64()),
        "zip3": pa.array(rng.integers(100, 110, n), pa.int64()),
        "age_band": pa.array(rng.integers(0, 4, n), pa.int64()),
        "diagnosis": pa.array(np.char.add(
            "d", rng.integers(0, 3, n).astype("U2"))),
    })


def _sql(tbl, q):
    con = duckdb.connect()
    con.register("t", tbl)
    return con.execute(q).df()


def test_k_anonymize_matches_window_sql(ray_session):
    tbl = _people()
    ds = ray.data.from_arrow(tbl).repartition(4)
    got = k_anonymize(ds, ["zip3", "age_band"], 12).to_pandas()
    want = _sql(tbl, """
        SELECT * FROM (
          SELECT *, count(*) OVER (PARTITION BY zip3, age_band) AS c
          FROM t) WHERE c >= 12
    """).drop(columns=["c"])
    assert sorted(got.columns) == sorted(want.columns)
    assert sorted(got["row_id"]) == sorted(want["row_id"])


def test_l_diversity_matches_window_sql(ray_session):
    tbl = _people()
    ds = ray.data.from_arrow(tbl).repartition(4)
    got = k_anonymize(ds, ["zip3", "age_band"], 8,
                      sensitive_col="diagnosis", l=3).to_pandas()
    want = _sql(tbl, """
        SELECT * FROM (
          SELECT *, count(*) OVER (PARTITION BY zip3, age_band) AS c,
                 count(DISTINCT diagnosis)
                   OVER (PARTITION BY zip3, age_band) AS d
          FROM t) WHERE c >= 8 AND d >= 3
    """).drop(columns=["c", "d"])
    assert sorted(got["row_id"]) == sorted(want["row_id"])


def test_planted_homogeneous_group_suppressed(ray_session):
    # Group A: 10 rows, 1 distinct sensitive value -> l=2 kills it.
    # Group B: 10 rows, 2 distinct values -> survives.
    # Group C: 3 rows -> k=5 kills it regardless of diversity.
    tbl = pa.table({
        "row_id": pa.array(np.arange(23), pa.int64()),
        "g": pa.array(["A"] * 10 + ["B"] * 10 + ["C"] * 3),
        "s": pa.array(["x"] * 10 + ["x", "y"] * 5 + ["x", "y", "z"]),
    })
    ds = ray.data.from_arrow(tbl).repartition(3)
    got = k_anonymize(ds, ["g"], 5, sensitive_col="s", l=2).to_pandas()
    assert set(got["g"]) == {"B"}
    assert len(got) == 10


def test_null_quasi_raises(ray_session):
    tbl = pa.table({"g": pa.array(["a", None, "a"]),
                    "v": pa.array([1, 2, 3], pa.int64())})
    ds = ray.data.from_arrow(tbl)
    with pytest.raises(Exception, match="nulls"):
        k_anonymize(ds, ["g"], 1).materialize()


def test_argument_validation(ray_session):
    ds = ray.data.from_arrow(pa.table({"g": ["a"], "s": ["x"]}))
    with pytest.raises(ValueError, match="k must be"):
        k_anonymize(ds, ["g"], 0)
    with pytest.raises(ValueError, match="go together"):
        k_anonymize(ds, ["g"], 1, sensitive_col="s")
    with pytest.raises(ValueError, match="go together"):
        k_anonymize(ds, ["g"], 1, l=2)
    with pytest.raises(ValueError, match="non-empty"):
        k_anonymize(ds, [], 1)
    with pytest.raises(ValueError, match="l must be"):
        k_anonymize(ds, ["g"], 1, sensitive_col="s", l=0)


def test_yaml_parity(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from opentelemetry_collector_ray.config import PipelineConfig
    from opentelemetry_collector_ray.pipelines.builder import build_dataset

    tbl = _people(200, seed=7)
    src = tmp_path / "people.parquet"
    pq.write_table(tbl, str(src))
    built = build_dataset(PipelineConfig.from_dict({
        "receivers": {"parquet": {"paths": str(src)}},
        "processors": {"k_anonymize": {
            "quasi": ["zip3", "age_band"], "k": 6,
            "sensitive": "diagnosis", "l": 2}},
        "exporters": {"debug": {}},
        "service": {"pipelines": {"logs": {
            "receivers": ["parquet"], "processors": ["k_anonymize"],
            "exporters": ["debug"]}}},
    })).to_pandas()
    direct = k_anonymize(ray.data.from_arrow(tbl), ["zip3", "age_band"],
                         6, sensitive_col="diagnosis", l=2).to_pandas()
    assert sorted(built["row_id"]) == sorted(direct["row_id"])


def test_yaml_validation_errors():
    from opentelemetry_collector_ray.config import ConfigError, get_factory

    make = get_factory("k_anonymize").create
    with pytest.raises(ConfigError, match="quasi and k"):
        make({"k": 5})
    with pytest.raises(ConfigError, match="quasi and k"):
        make({"quasi": ["g"]})
    with pytest.raises(ConfigError, match="go together"):
        make({"quasi": ["g"], "k": 5, "sensitive": "s"})
    with pytest.raises(ConfigError, match="go together"):
        make({"quasi": ["g"], "k": 5, "l": 2})


# ------------------------------------------------ DP count release


def test_dp_release_deterministic_and_integer(ray_session):
    from opentelemetry_collector_ray.stages.privacy import dp_count_release

    tbl = _people(1000, seed=9)
    ds = ray.data.from_arrow(tbl).repartition(4)
    a = dp_count_release(ds, ["zip3"], epsilon=1.0, seed=42).to_pandas()
    b = dp_count_release(ds, ["zip3"], epsilon=1.0, seed=42).to_pandas()
    assert a.sort_values("zip3").reset_index(drop=True).equals(
        b.sort_values("zip3").reset_index(drop=True))
    assert a["n"].dtype == np.int64
    # a different seed gives a different release (overwhelmingly)
    c = dp_count_release(ds, ["zip3"], epsilon=1.0, seed=43).to_pandas()
    assert not a.sort_values("zip3")["n"].reset_index(drop=True).equals(
        c.sort_values("zip3")["n"].reset_index(drop=True))


def test_dp_noise_scale_tracks_epsilon(ray_session):
    """Mean |noise| over many groups ≈ b = 1/ε (Laplace mean abs)."""
    from opentelemetry_collector_ray.stages.privacy import dp_count_release

    n = 20000
    tbl = pa.table({"g": pa.array(np.arange(n) % 2000, pa.int64())})
    ds = ray.data.from_arrow(tbl).repartition(4)
    true = 10.0  # every group has exactly 10 rows
    for eps, lo, hi in [(1.0, 0.7, 1.4), (0.2, 3.8, 6.5)]:
        rel = dp_count_release(ds, ["g"], epsilon=eps,
                               seed=7).to_pandas()
        assert len(rel) == 2000
        err = np.abs(rel["n"].to_numpy() - true).mean()
        assert lo < err < hi, (eps, err)


def test_dp_suppress_below(ray_session):
    from opentelemetry_collector_ray.stages.privacy import dp_count_release

    tbl = pa.table({"g": pa.array(["big"] * 500 + ["tiny"] * 2)})
    ds = ray.data.from_arrow(tbl)
    rel = dp_count_release(ds, ["g"], epsilon=1.0, seed=3,
                           suppress_below=50).to_pandas()
    assert set(rel["g"]) == {"big"}
    with pytest.raises(ValueError, match="epsilon"):
        dp_count_release(ds, ["g"], epsilon=0.0, seed=1)


def test_broadcast_mode_matches_join_mode(ray_session):
    tbl = _people(600, seed=13)
    ds = ray.data.from_arrow(tbl).repartition(4)
    a = k_anonymize(ds, ["zip3", "age_band"], 10, sensitive_col="diagnosis",
                    l=2, mode="join").to_pandas()
    b = k_anonymize(ds, ["zip3", "age_band"], 10, sensitive_col="diagnosis",
                    l=2, mode="broadcast").to_pandas()
    assert sorted(a["row_id"]) == sorted(b["row_id"])


def test_broadcast_mode_no_survivors(ray_session):
    tbl = _people(80, seed=7)
    ds = ray.data.from_arrow(tbl).repartition(3)
    out = k_anonymize(ds, ["zip3", "age_band"], 10_000, mode="broadcast")
    assert out.count() == 0
    assert set(out.schema().names) == set(tbl.schema.names)


def test_broadcast_mode_group_guard(ray_session):
    tbl = _people(300, seed=1)
    ds = ray.data.from_arrow(tbl)
    with pytest.raises(Exception, match="max_broadcast_groups"):
        k_anonymize(ds, ["row_id"], 1, mode="broadcast",
                    max_broadcast_groups=5).materialize()
    with pytest.raises(ValueError, match="mode"):
        k_anonymize(ds, ["zip3"], 2, mode="nope")


def _tc_ds(rows):
    import pyarrow as pa

    import ray.data

    return ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(3)


def test_t_closeness_planted(ray_session):
    from opentelemetry_collector_ray.stages.privacy import t_closeness

    # corpus: a = {0,0,10,10}, b = {0,0,0,0} -> N=8, grid [0,10],
    # cumA = [6, 8], dv = [10, 0].
    #   a: cumG=[2,4], n_g=4 -> |8*2 - 4*6|*10 = 80
    #   b: cumG=[4,4], n_g=4 -> |8*4 - 4*6|*10 = 80
    # (both sit 0.25 mass away from the 75/25 corpus mix, from
    # opposite sides — symmetric by construction)
    rows = ([{"g": "a", "v": 0}] * 2 + [{"g": "a", "v": 10}] * 2
            + [{"g": "b", "v": 0}] * 4)
    out = t_closeness(_tc_ds(rows), "g", "v").to_pandas() \
        .sort_values("g").reset_index(drop=True)
    assert list(out.g) == ["a", "b"]
    assert list(out.n_g) == [4, 4]
    assert list(out.n_total) == [8, 8]
    assert list(out.w1_num) == [80, 80]
    # threshold rule: suppress when W1 > t -> w1_num > t*n_g*N;
    # W1 here = 80/32 = 2.5 units: t=2 suppresses both, t=3 keeps both
    assert (out.w1_num > 2 * out.n_g * out.n_total).all()
    assert not (out.w1_num > 3 * out.n_g * out.n_total).any()


def test_t_closeness_whole_corpus_group_is_zero(ray_session):
    from opentelemetry_collector_ray.stages.privacy import t_closeness

    rows = [{"g": "only", "v": v} for v in (1, 5, 5, 9, 9, 9)]
    out = t_closeness(_tc_ds(rows), "g", "v").to_pandas()
    # a group that IS the corpus is at distance zero by identity
    assert list(out.w1_num) == [0]
    assert list(out.n_g) == [6] and list(out.n_total) == [6]


def test_t_closeness_matches_scipy_style_reference(ray_session):
    import numpy as np

    from opentelemetry_collector_ray.stages.privacy import t_closeness

    rng = np.random.default_rng(7)
    vals = rng.integers(0, 20, 400)
    grps = rng.choice(["x", "y", "z"], 400)
    rows = [{"g": g, "v": int(v)} for g, v in zip(grps, vals)]
    out = t_closeness(_tc_ds(rows), "g", "v").to_pandas() \
        .set_index("g")
    grid = np.unique(vals)
    dv = np.append(np.diff(grid), 0)
    N = len(vals)
    cuma = np.cumsum([np.sum(vals == u) for u in grid])
    for g in "xyz":
        gv = vals[grps == g]
        cumg = np.cumsum([np.sum(gv == u) for u in grid])
        w1 = int(np.sum(np.abs(N * cumg - len(gv) * cuma) * dv))
        assert out.loc[g, "w1_num"] == w1
        assert out.loc[g, "n_g"] == len(gv)


def test_t_closeness_guards(ray_session):
    import pytest

    from opentelemetry_collector_ray.stages.privacy import t_closeness

    with pytest.raises(Exception, match="integer"):
        t_closeness(_tc_ds([{"g": "a", "v": 1.5}]), "g",
                    "v").materialize()
    with pytest.raises(Exception, match="nulls"):
        t_closeness(_tc_ds([{"g": "a", "v": None},
                            {"g": "a", "v": 1}]), "g", "v").materialize()
    with pytest.raises(ValueError, match="max_grid"):
        t_closeness(_tc_ds([{"g": "a", "v": i} for i in range(50)]),
                    "g", "v", max_grid=10)


def test_t_closeness_yaml_parity(ray_session, tmp_path):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data

    from opentelemetry_collector_ray.config import PipelineConfig
    from opentelemetry_collector_ray.pipelines.builder import build_dataset
    from opentelemetry_collector_ray.stages.privacy import t_closeness

    rows = ([{"g": "a", "v": 0}] * 2 + [{"g": "a", "v": 10}] * 2
            + [{"g": "b", "v": 0}] * 4)
    p = tmp_path / "t.parquet"
    pq.write_table(pa.Table.from_pylist(rows), str(p))
    y = build_dataset(PipelineConfig.from_dict({
        "receivers": {"parquet": {"paths": str(p)}},
        "processors": {"t_closeness": {"group": "g", "sensitive": "v"}},
        "exporters": {"debug": {}},
        "service": {"pipelines": {"logs": {
            "receivers": ["parquet"], "processors": ["t_closeness"],
            "exporters": ["debug"]}}},
    })).to_pandas().sort_values("g").reset_index(drop=True)
    want = t_closeness(ray.data.read_parquet(str(p)), "g",
                       "v").to_pandas() \
        .sort_values("g").reset_index(drop=True)
    pd.testing.assert_frame_equal(y, want, check_dtype=False)
