"""Traces signal (span derivation, parent links, trace rollup, exact
quantiles) and the remaining pmetric types (exponential histogram, gauge
last-value) on handcrafted fixtures."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def tiny_events(ray_session):
    import ray.data

    # one user, 3 events inside one hour (one trace) + 1 in the next hour
    # (new trace) + a second user's single event
    ts = pd.to_datetime(["2024-01-01 10:00:05", "2024-01-01 10:10:00",
                         "2024-01-01 10:20:00", "2024-01-01 11:00:01",
                         "2024-01-01 10:00:00"])
    t = pa.table({
        "event_id": pa.array([11, 12, 13, 14, 99], pa.int64()),
        "ts": pa.array(ts),
        "user_id": pa.array([7, 7, 7, 7, 8], pa.int64()),
        "event_type": pa.array(["signup", "click", "error", "view",
                                "purchase"]),
        "value": pa.array([10.0, 20.5, 30.9, 0.4, 5.0]),
    })
    return ray.data.from_arrow(t)


def test_span_derivation_and_parent_links(tiny_events):
    from opentelemetry_collector_ray.sources.spans import derive_spans

    df = derive_spans(tiny_events).to_pandas().sort_values(
        ["trace_id", "start_ts"]).reset_index(drop=True)
    assert len(df) == 5
    u7 = df[df.trace_id.str.startswith("00000007")]
    traces = sorted(u7.trace_id.unique())
    assert len(traces) == 2  # hour 10 and hour 11 are separate traces
    t0 = u7[u7.trace_id == traces[0]].sort_values("start_ts")
    # root has empty parent; each next span parents on the previous one
    assert t0.parent_span_id.tolist() == ["", f"{11:016x}", f"{12:016x}"]
    assert t0.span_id.tolist() == [f"{11:016x}", f"{12:016x}", f"{13:016x}"]
    # enums per ptrace span_kind.go / status.go
    assert t0.kind.tolist() == [2, 3, 1]  # signup=Server click=Client error=Internal
    assert t0.status_code.tolist() == [1, 1, 2]
    assert t0.service.tolist() == ["auth", "frontend", "backend"]
    assert t0.duration_us.tolist() == [10000, 20500, 30900]


def test_parent_child_join_roots_null(tiny_events):
    from opentelemetry_collector_ray.sources.spans import derive_spans
    from opentelemetry_collector_ray.stages.spanops import parent_child_join

    out = parent_child_join(derive_spans(tiny_events)).to_pandas()
    by_span = dict(zip(out.span_id, out.parent_service))
    assert pd.isna(by_span[f"{11:016x}"])  # root
    assert by_span[f"{12:016x}"] == "auth"
    assert by_span[f"{13:016x}"] == "frontend"


def test_trace_stats(tiny_events):
    from opentelemetry_collector_ray.sources.spans import derive_spans
    from opentelemetry_collector_ray.stages.spanops import trace_stats

    out = trace_stats(derive_spans(tiny_events)).to_pandas()
    out = out.set_index("trace_id")
    big = out[out.n_spans == 3].iloc[0]
    assert big.n_errors == 1
    # span 13 starts at 10:20:00 + 30900us; trace starts 10:00:05
    assert big.trace_duration_us == (20 * 60 - 5) * 1_000_000 + 30900


def test_exact_quantiles_rank_rule(ray_session):
    import ray.data

    from opentelemetry_collector_ray.stages.spanops import (
        grouped_exact_quantiles)

    vals = list(range(1, 101))  # 1..100
    t = pa.table({"k": pa.array(["a"] * 100), "v": pa.array(vals, pa.int64())})
    out = grouped_exact_quantiles(ray.data.from_arrow(t), "k", "v") \
        .to_pandas().iloc[0]
    # rank r = floor((n-1)q): p50 → r=49 → value 50; p95 → r=94 → 95; p99 → 98 → 99
    assert (out.n, out.p50, out.p95, out.p99) == (100, 50, 95, 99)


def test_exp_bucket_index_exact():
    from opentelemetry_collector_ray.stages.metricsops import exp_bucket_index

    # OTel mapping: lower-exclusive buckets, idx = ceil(log2 v) - 1 —
    # exact powers of two land in the LOWER bucket (8 → 2, 1024 → 9)
    v = np.array([1, 2, 3, 4, 7, 8, 1023, 1024, 0.5, 0.3])
    idx = exp_bucket_index(v, scale=0)
    assert idx.tolist() == [-1, 0, 1, 1, 2, 2, 9, 9, -2, -2]
    # scale=-1: buckets twice as wide, arithmetic shift (floor division)
    idx2 = exp_bucket_index(np.array([1.0, 2, 4, 8, 0.5, 0.25]), scale=-1)
    assert idx2.tolist() == [-1, 0, 0, 1, -1, -2]


def test_exp_histogram_zero_bucket(ray_session):
    import ray.data

    from opentelemetry_collector_ray.stages.metricsops import exp_histogram

    t = pa.table({"k": pa.array(["x"] * 6),
                  "v": pa.array([0, 0, 1, 2, 3, 8], pa.int64())})
    out = exp_histogram(ray.data.from_arrow(t), ["k"], "v").to_pandas()
    zero = out[out.idx.isna()]
    assert zero.n.tolist() == [2]
    nz = out.dropna(subset=["idx"]).set_index("idx").n.to_dict()
    assert nz == {-1: 1, 0: 1, 1: 1, 2: 1}


def test_gauge_last_value(ray_session):
    import ray.data

    from opentelemetry_collector_ray.stages.metricsops import gauge_last

    ts = pd.to_datetime(["2024-01-01 10:00", "2024-01-01 11:00",
                         "2024-01-01 11:00", "2024-01-01 09:00"])
    t = pa.table({"k": pa.array([1, 1, 1, 2], pa.int64()),
                  "ts": pa.array(ts),
                  "eid": pa.array([5, 6, 7, 1], pa.int64()),
                  "v": pa.array([10, 20, 30, 40], pa.int64())})
    out = gauge_last(ray.data.from_arrow(t), key="k",
                     order_cols=["ts", "eid"], value_col="v").to_pandas()
    got = dict(zip(out.k, out.last_value))
    assert got == {1: 30, 2: 40}  # ties on ts broken by eid


def test_function_table_vocab_cap_and_hashed_fallback(ray_session):
    """Over-cap vocabulary: build_function_table refuses (bounded-vocab
    contract) and the hash-id path yields consistent ids between the
    dictionary and the encoded samples; empty input returns an empty typed
    table instead of crashing."""
    import pyarrow as pa
    import ray.data

    from opentelemetry_collector_ray.sources.profiles import (
        build_function_table, encode_samples_hashed, hashed_function_table)

    n = 50
    frames = ray.data.from_arrow(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "frame0": pa.array([f"proc::{i}" for i in range(n)]),
        "frame1": pa.array([f"op::{i}" for i in range(n)]),
        "frame2": pa.array(["status::ok"] * n),
        "value_us": pa.array([10] * n, pa.int64()),
    }))
    with pytest.raises(ValueError, match="max_names"):
        build_function_table(frames, max_names=10)

    ftab = hashed_function_table(frames).to_pandas()
    assert len(ftab) == 2 * n + 1  # distinct names
    assert ftab.func_id.nunique() == len(ftab)
    lut = dict(zip(ftab.name, ftab.func_id))
    enc = encode_samples_hashed(frames).to_pandas().sort_values("event_id")
    assert enc.f0_id.tolist() == [lut[f"proc::{i}"] for i in range(n)]
    assert enc.f2_id.unique().tolist() == [lut["status::ok"]]

    empty = ray.data.from_arrow(pa.table({
        "event_id": pa.array([], pa.int64()),
        "frame0": pa.array([], pa.string()),
        "frame1": pa.array([], pa.string()),
        "frame2": pa.array([], pa.string()),
        "value_us": pa.array([], pa.int64())}))
    et = build_function_table(empty)
    assert et.num_rows == 0 and et.column_names == ["func_id", "name"]


def test_span_links_root_reference(tiny_events):
    """Links[]: non-root spans link to their trace's root; roots carry an
    empty list; the explode traversal flattens to one row per link."""
    from opentelemetry_collector_ray.sources.spans import (
        derive_spans, explode_span_links, with_span_links)

    spans = with_span_links(derive_spans(tiny_events))
    df = spans.to_pandas().set_index("span_id")
    # trace of user 7, hour 10: 11 is root (no link); 12, 13 link to 11
    assert df.loc[f"{11:016x}", "links"] is None or \
        len(df.loc[f"{11:016x}", "links"]) == 0
    for child in (12, 13):
        (link,) = df.loc[f"{child:016x}", "links"]
        assert link["span_id"] == f"{11:016x}"
    flat = explode_span_links(with_span_links(
        derive_spans(tiny_events))).to_pandas()
    assert len(flat) == 2  # spans 14 and 99 are single-span-trace roots
    assert set(flat.link_span_id) == {f"{11:016x}"}


def test_grouped_trend_planted(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data

    from opentelemetry_collector_ray.stages.metricsops import grouped_trend

    # key a: perfect slope 3 (y = 3x + 1); key b: constant x -> null;
    # key c: negative slope -2 (truncation sign matters)
    t = pa.table({
        "k": pa.array(["a"] * 4 + ["b"] * 2 + ["c"] * 3),
        "x": pa.array([0, 1, 2, 3, 5, 5, 0, 1, 2], pa.int64()),
        "y": pa.array([1, 4, 7, 10, 9, 11, 10, 8, 6], pa.int64())})
    out = grouped_trend(ray.data.from_arrow(t).repartition(3),
                        "k", "x", "y").to_pandas()
    got = dict(zip(out["k"], out["slope_scaled"]))
    r2 = dict(zip(out["k"], out["r2_scaled"]))
    assert got["a"] == 3_000_000
    assert got["c"] == -2_000_000
    assert r2["a"] == 1_000_000 and r2["c"] == 1_000_000  # perfect fits
    import pandas as pd
    assert pd.isna(got["b"])
    # truncation (not floor) on a negative NON-EXACT quotient: slope
    # -2/7 -> -285714 (DuckDB // truncates), a floor would give -285715
    t2 = pa.table({"k": pa.array(["z"] * 3),
                   "x": pa.array([0, 1, 3], pa.int64()),
                   "y": pa.array([1, 0, 0], pa.int64())})
    o2 = grouped_trend(ray.data.from_arrow(t2), "k", "x", "y").to_pandas()
    assert o2["slope_scaled"].tolist() == [-285714]
    # and the empty input keeps a typed schema
    te = pa.table({"k": pa.array([], pa.string()),
                   "x": pa.array([], pa.int64()),
                   "y": pa.array([], pa.int64())})
    oe = grouped_trend(ray.data.from_arrow(te), "k", "x", "y")
    sch = dict(zip(oe.schema().names, oe.schema().types))
    assert str(sch["k"]) == "string"
    tf = pa.table({"k": pa.array(["a"]), "x": pa.array([1.0]),
                   "y": pa.array([1], pa.int64())})
    with pytest.raises(Exception, match="integer"):
        grouped_trend(ray.data.from_arrow(tf), "k", "x", "y").to_pandas()


def test_cusum_scores_planted_multikey(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from opentelemetry_collector_ray.stages.metricsops import cusum_scores

    # classic recursion, two keys FORCED into one bucket so a
    # cross-segment running-min leak (the inverted-lift bug) would show
    def ref(ds_, target):
        s, out = 0, []
        for d in ds_:
            s = max(0, s + d - target)
            out.append(s)
        return out

    a_vals = [14, 4, 7, 25, 25, 3, 30]
    b_vals = [1, 2, 30, 1]
    t = pa.table({
        "k": pa.array(["a"] * len(a_vals) + ["b"] * len(b_vals)),
        "i": pa.array(list(range(len(a_vals))) + list(range(len(b_vals))),
                      pa.int64()),
        "v": pa.array(a_vals + b_vals, pa.int64())})
    out = cusum_scores(ray.data.from_arrow(t).repartition(3),
                       "k", ["i"], "v", target=10,
                       n_buckets=1).to_pandas()
    a = out[out["k"] == "a"].sort_values("i")["cusum"].tolist()
    b = out[out["k"] == "b"].sort_values("i")["cusum"].tolist()
    assert a == ref(a_vals, 10)
    assert b == ref(b_vals, 10)  # b starts at 0, no leak from a


def test_cusum_scores_duckdb_parity(ray_session):
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from opentelemetry_collector_ray.stages.metricsops import cusum_scores

    rng = np.random.default_rng(13)
    n = 2000
    t = pa.table({
        "k": pa.array([f"g{v}" for v in rng.integers(0, 5, n)]),
        "i": pa.array(np.arange(n), pa.int64()),
        "v": pa.array(rng.integers(0, 40, n).astype(np.int64))})
    got = cusum_scores(ray.data.from_arrow(t).repartition(6),
                       "k", ["i"], "v", target=20).to_pandas()
    con = duckdb.connect()
    con.register("iv", t)
    want = con.sql("""
WITH p AS (SELECT k, i, sum(v - 20) OVER (PARTITION BY k ORDER BY i
               ROWS UNBOUNDED PRECEDING) AS pre FROM iv),
r AS (SELECT *, min(pre) OVER (PARTITION BY k ORDER BY i
          ROWS UNBOUNDED PRECEDING) AS runmin FROM p)
SELECT k, i, CAST(pre - LEAST(runmin, 0) AS BIGINT) AS cusum FROM r
""").df()
    cols = ["k", "i", "cusum"]
    assert sorted(map(tuple, got[cols].values.tolist())) == \
        sorted(map(tuple, want[cols].values.tolist()))


def test_grouped_weighted_median(ray_session):
    """Planted + randomized weighted-median parity with the SQL window
    rule 2*cum >= tot (lower weighted median)."""
    import duckdb
    import numpy as np
    import pyarrow as pa

    import ray.data

    from opentelemetry_collector_ray.stages.spanops import (
        grouped_weighted_median)

    # planted: k=a values 1,2,3 weights 1,1,2 -> tot 4, 2*cum>=4 at v=2
    #          k=b single value; k=c zero-weight then heavy value
    tbl = pa.table({
        "k": pa.array(["a", "a", "a", "b", "c", "c"]),
        "v": pa.array([1, 2, 3, 7, 1, 5], pa.int64()),
        "w": pa.array([1, 1, 2, 3, 0, 4], pa.int64())})
    out = grouped_weighted_median(
        ray.data.from_arrow(tbl).repartition(3), "k", "v", "w"
        ).to_pandas().set_index("k")
    assert out.loc["a", "wmedian"] == 2 and out.loc["a", "tot_w"] == 4
    assert out.loc["b", "wmedian"] == 7
    assert out.loc["c", "wmedian"] == 5 and out.loc["c", "tot_w"] == 4

    rng = np.random.default_rng(11)
    big = pa.table({
        "k": pa.array(np.char.add("g", rng.integers(0, 9, 2000)
                                  .astype("U2"))),
        "v": pa.array(rng.integers(-50, 50, 2000), pa.int64()),
        "w": pa.array(rng.integers(1, 9, 2000), pa.int64())})
    got = grouped_weighted_median(
        ray.data.from_arrow(big).repartition(5), "k", "v", "w"
        ).to_pandas().sort_values("k").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", big)
    want = con.execute("""
        WITH d AS (SELECT k, v, CAST(sum(w) AS BIGINT) w
                   FROM t GROUP BY k, v),
        c AS (SELECT k, v, sum(w) OVER (PARTITION BY k ORDER BY v) cum,
                     sum(w) OVER (PARTITION BY k) tot FROM d)
        SELECT k, CAST(min(tot) AS BIGINT) tot_w,
               CAST(min(v) AS BIGINT) wmedian
        FROM c WHERE 2*cum >= tot GROUP BY k ORDER BY k""").df()
    assert (got[["k", "tot_w", "wmedian"]].values
            == want[["k", "tot_w", "wmedian"]].values).all()


def test_grouped_weighted_median_zero_weight_key(ray_session):
    """An all-zero-weight key must answer its OWN smallest value (SQL
    2*cum >= 0 holds at the first row), not the previous segment's —
    review-found searchsorted plateau bug."""
    import pyarrow as pa

    import ray.data

    from opentelemetry_collector_ray.stages.spanops import (
        grouped_weighted_median)

    tbl = pa.table({
        "k": pa.array(["a", "b", "b"]),
        "v": pa.array([100, 5, 7], pa.int64()),
        "w": pa.array([1, 0, 0], pa.int64())})
    out = grouped_weighted_median(
        ray.data.from_arrow(tbl), "k", "v", "w",
        n_buckets=1).to_pandas().set_index("k")
    assert out.loc["a", "wmedian"] == 100
    assert out.loc["b", "wmedian"] == 5 and out.loc["b", "tot_w"] == 0


def test_cont_quantiles_match_quantile_cont(ray_session):
    """grouped_cont_quantiles scaled integers / den == DuckDB
    quantile_cont exactly (the scaled-int form IS the interpolated
    value times den), plus the exact-integer identity on small cases."""
    import duckdb
    import ray.data

    from opentelemetry_collector_ray.stages.spanops import (
        grouped_cont_quantiles)

    rng = np.random.default_rng(3)
    n = 5000
    t = pa.table({"k": pa.array(rng.integers(0, 29, n).astype("str")),
                  "v": pa.array(rng.integers(-200, 3000, n))})
    out = grouped_cont_quantiles(
        ray.data.from_arrow(t).repartition(5), "k", "v",
        qs=((1, 2), (1, 4), (99, 100)), n_buckets=8).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    ref = duckdb.sql("""
        SELECT k, quantile_cont(v, 0.5) q50, quantile_cont(v, 0.25) q25,
               quantile_cont(v, 0.99) q99, count(*) n
        FROM t GROUP BY k""").df().sort_values("k").reset_index(drop=True)
    assert out["n"].tolist() == ref["n"].tolist()
    assert np.allclose(out["p1_2_x2"] / 2.0, ref["q50"], rtol=0, atol=0)
    assert np.allclose(out["p1_4_x4"] / 4.0, ref["q25"], rtol=0, atol=0)
    assert np.allclose(out["p99_100_x100"] / 100.0, ref["q99"],
                       rtol=0, atol=1e-9)
    # exact identity: single-key 4-row case, q=1/2 -> v2+v3
    t2 = pa.table({"k": ["a"] * 4, "v": [10, 20, 30, 40]})
    o2 = grouped_cont_quantiles(ray.data.from_arrow(t2), "k", "v",
                                qs=((1, 2),)).to_pandas()
    assert o2["p1_2_x2"].tolist() == [50]  # (20+30)/2 * 2


def test_cont_quantiles_guards(ray_session):
    import ray.data

    from opentelemetry_collector_ray.stages.spanops import (
        grouped_cont_quantiles)

    with pytest.raises(ValueError, match="num/den"):
        grouped_cont_quantiles(
            ray.data.from_arrow(pa.table({"k": ["a"], "v": [1]})),
            "k", "v", qs=((3, 2),))
    big = pa.table({"k": ["a"], "v": [2 ** 61]})
    with pytest.raises(Exception, match="overflow"):
        grouped_cont_quantiles(ray.data.from_arrow(big), "k", "v",
                               qs=((1, 10),)).to_pandas()


def test_weighted_quantiles_generalize_median(ray_session):
    """(1,2) == grouped_weighted_median; q=0/1 hit segment ends;
    zero-weight keys clamp to their own segment (plateau fix)."""
    import ray.data

    from opentelemetry_collector_ray.stages.spanops import (
        grouped_weighted_median, grouped_weighted_quantiles)

    rng = np.random.default_rng(13)
    n = 4000
    t = pa.table({"k": pa.array(rng.integers(0, 19, n).astype("str")),
                  "v": pa.array(rng.integers(0, 500, n)),
                  "w": pa.array(rng.integers(0, 7, n))})
    med = grouped_weighted_median(
        ray.data.from_arrow(t).repartition(4), "k", "v", "w") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    gen = grouped_weighted_quantiles(
        ray.data.from_arrow(t).repartition(4), "k", "v", "w",
        qs=((1, 2), (0, 1), (1, 1))).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert gen["p1_2_w"].tolist() == med["wmedian"].tolist()
    assert gen["tot_w"].tolist() == med["tot_w"].tolist()
    # q=0 -> first value of the key; q=1 -> last positive-weight value
    ref = t.to_pandas()
    for k, grp in ref.groupby("k"):
        grp = grp.sort_values("v")
        row = gen[gen["k"] == k].iloc[0]
        assert row["p0_1_w"] == grp["v"].min()
        pos = grp[grp["w"] > 0]
        if len(pos):
            cum = pos.groupby("v")["w"].sum().sort_index().cumsum()
            assert row["p1_1_w"] == cum.index[
                np.searchsorted(cum.to_numpy(), cum.iloc[-1])]
    with pytest.raises(ValueError, match="num/den"):
        grouped_weighted_quantiles(ray.data.from_arrow(t), "k", "v",
                                   "w", qs=((3, 2),))
    with pytest.raises(ValueError, match="tot_w"):
        grouped_weighted_quantiles(ray.data.from_arrow(t), "tot_w",
                                   "v", "w")


def test_weighted_quantiles_key_collision_guard(ray_session):
    import ray.data

    from opentelemetry_collector_ray.stages.spanops import (
        grouped_weighted_quantiles)

    t = pa.table({"p1_2_w": ["a"], "v": [1], "w": [1]})
    with pytest.raises(ValueError, match="collides"):
        grouped_weighted_quantiles(ray.data.from_arrow(t), "p1_2_w",
                                   "v", "w", qs=((1, 2),))


def test_hysteresis_alerts_planted(ray_session):
    import pyarrow as pa

    import ray.data

    from opentelemetry_collector_ray.stages.metricsops import (
        hysteresis_alerts)

    # high=10, low=5. Stream u:
    #   3 (clear) 12 (fire) 7 (band->carry firing) 11 (still firing)
    #   4 (clear) 8 (band->carry cleared) 15 (fire again) = 2 episodes,
    #   4 firing rows. The two band rows prove hysteresis: a plain
    #   threshold would flap on them.
    vals = [3, 12, 7, 11, 4, 8, 15]
    rows = [{"k": "u", "i": i, "v": v} for i, v in enumerate(vals)]
    # stream w starts in the band: stays cleared until a definitive fire
    rows += [{"k": "w", "i": 0, "v": 7}, {"k": "w", "i": 1, "v": 11}]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(3)
    out = hysteresis_alerts(ds, "k", ["i"], "v", high=10, low=5) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    u = out[out.k == "u"].iloc[0]
    assert (u.n_rows, u.n_firing, u.n_alerts) == (7, 4, 2)
    w = out[out.k == "w"].iloc[0]
    assert (w.n_rows, w.n_firing, w.n_alerts) == (2, 1, 1)


def test_hysteresis_alerts_guards(ray_session):
    import pyarrow as pa
    import pytest

    import ray.data

    from opentelemetry_collector_ray.stages.metricsops import (
        hysteresis_alerts)

    with pytest.raises(ValueError, match="low"):
        hysteresis_alerts(None, "k", ["i"], "v", high=5, low=10)
    ds = ray.data.from_arrow(pa.Table.from_pylist(
        [{"k": "u", "i": 0, "v": 1.5}]))
    with pytest.raises(Exception, match="integer"):
        hysteresis_alerts(ds, "k", ["i"], "v",
                          high=10, low=5).materialize()
    ds2 = ray.data.from_arrow(pa.Table.from_pylist(
        [{"k": "u", "i": 0, "v": None}, {"k": "u", "i": 1, "v": 3}]))
    with pytest.raises(Exception, match="nulls"):
        hysteresis_alerts(ds2, "k", ["i"], "v",
                          high=10, low=5).materialize()


def test_hysteresis_alerts_yaml_parity(ray_session, tmp_path):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data

    from opentelemetry_collector_ray.config import PipelineConfig
    from opentelemetry_collector_ray.pipelines.builder import build_dataset
    from opentelemetry_collector_ray.stages.metricsops import (
        hysteresis_alerts)

    rows = [{"k": "u", "i": i, "v": v}
            for i, v in enumerate([3, 12, 7, 4, 15])]
    p = tmp_path / "h.parquet"
    pq.write_table(pa.Table.from_pylist(rows), str(p))
    y = build_dataset(PipelineConfig.from_dict({
        "receivers": {"parquet": {"paths": str(p)}},
        "processors": {"hysteresis_alerts": {
            "key": "k", "order_by": "i", "value": "v",
            "high": 10, "low": 5}},
        "exporters": {"debug": {}},
        "service": {"pipelines": {"logs": {
            "receivers": ["parquet"],
            "processors": ["hysteresis_alerts"],
            "exporters": ["debug"]}}},
    })).to_pandas()
    want = hysteresis_alerts(ray.data.read_parquet(str(p)), "k", ["i"],
                             "v", high=10, low=5).to_pandas()
    pd.testing.assert_frame_equal(y, want, check_dtype=False)


def test_alerting_example_yaml(ray_session, tmp_path, monkeypatch):
    """examples/alerting_pipeline.yaml end to end: parquet receiver →
    hysteresis state machine over a planted flapping series."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opentelemetry_collector_ray.config import PipelineConfig
    from opentelemetry_collector_ray.pipelines.builder import build_dataset

    rows = [{"series": "cpu", "ts_us": i, "value_scaled": v}
            for i, v in enumerate([1000, 9000, 5000, 2000, 9500])]
    p = tmp_path / "m.parquet"
    pq.write_table(pa.Table.from_pylist(rows), str(p))
    monkeypatch.setenv("METRICS_PATH", str(p))
    from pathlib import Path

    yml = Path(__file__).resolve().parent.parent / "examples" \
        / "alerting_pipeline.yaml"
    out = build_dataset(PipelineConfig.from_yaml(str(yml))).to_pandas()
    row = out.iloc[0]
    # fire at 9000, band-carry at 5000, clear at 2000, fire at 9500
    assert (row.n_rows, row.n_firing, row.n_alerts) == (5, 3, 2)
