"""Delta↔cumulative temporality conversion round trip."""

import numpy as np
import pandas as pd


def test_delta_cumulative_round_trip(ray_session):
    import ray.data

    from opentelemetry_collector_ray.stages.temporal import (
        cumulative_to_delta, delta_to_cumulative)

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "series": rng.choice(["a", "b", "c"], 300),
        "t": rng.permutation(300),
        "v": rng.integers(0, 100, 300),
    })
    ds = ray.data.from_pandas(df).repartition(4)
    cum = delta_to_cumulative(ds, "series", "t", "v", out_col="cum")
    back = cumulative_to_delta(cum, "series", "t", "cum", out_col="v2")
    out = back.to_pandas().sort_values(["series", "t"]).reset_index(drop=True)
    exp = df.sort_values(["series", "t"]).reset_index(drop=True)
    assert (out["v2"].to_numpy() == exp["v"].to_numpy()).all()
    # cumulative is monotone per series
    assert (out.groupby("series")["cum"].diff().dropna() >= 0).all()


def _late(rows, **kw):
    import pyarrow as pa

    import ray.data

    from opentelemetry_collector_ray.stages.temporal import late_arrivals

    ds = ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(3)
    return late_arrivals(ds, "k", ["arr"], "ts", **kw).to_pandas() \
        .sort_values("k").reset_index(drop=True)


def test_late_arrivals_planted(ray_session):
    # stream u: arrivals 1..5 carry event times 10, 50, 20, 49, 60
    #   row 3 (ts=20) trails watermark 50 by 30 -> late at L<30
    #   row 4 (ts=49) trails watermark 50 by 1  -> late only at L=0
    rows = [{"k": "u", "arr": a, "ts": t}
            for a, t in [(1, 10), (2, 50), (3, 20), (4, 49), (5, 60)]]
    rows += [{"k": "v", "arr": 1, "ts": 100}]  # single-row stream
    out = _late(rows, allowed_lateness=0)
    u = out[out.k == "u"].iloc[0]
    assert (u.n_events, u.n_late, u.max_late_us) == (5, 2, 30)
    v = out[out.k == "v"].iloc[0]
    assert (v.n_events, v.n_late, v.max_late_us) == (1, 0, 0)
    out5 = _late(rows, allowed_lateness=5)
    u5 = out5[out5.k == "u"].iloc[0]
    assert (u5.n_late, u5.max_late_us) == (1, 30)


def test_late_arrivals_matches_pandas_window(ray_session):
    rng = np.random.default_rng(11)
    n = 500
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c", "d"], n),
        "arr": rng.permutation(n).astype(np.int64),
        "ts": rng.integers(0, 10_000, n, dtype=np.int64),
    })
    out = _late(df.to_dict("records"), allowed_lateness=7)
    ref = []
    for k, g in df.sort_values(["k", "arr"]).groupby("k"):
        ts = g.ts.to_numpy()
        wm = np.maximum.accumulate(ts)[:-1]
        lateness = wm - ts[1:]
        late = lateness > 7
        ref.append((k, len(ts), int(late.sum()),
                    int(lateness[late].max()) if late.any() else 0))
    ref = pd.DataFrame(ref, columns=["k", "n_events", "n_late",
                                     "max_late_us"])
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_late_arrivals_rejects_nulls_and_floats(ray_session):
    import pytest

    rows = [{"k": "u", "arr": 1, "ts": None},
            {"k": "u", "arr": 2, "ts": 5}]
    with pytest.raises(Exception, match="nulls"):
        _late(rows)
    rows = [{"k": "u", "arr": 1, "ts": 1.5}]
    with pytest.raises(Exception, match="integer"):
        _late(rows)
    import pytest as _pt

    from opentelemetry_collector_ray.stages.temporal import late_arrivals
    with _pt.raises(ValueError, match="allowed_lateness"):
        late_arrivals(None, "k", ["arr"], "ts", allowed_lateness=-1)


def test_late_arrivals_yaml_parity(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data

    from opentelemetry_collector_ray.config import PipelineConfig
    from opentelemetry_collector_ray.pipelines.builder import build_dataset
    from opentelemetry_collector_ray.stages.temporal import late_arrivals

    rows = [{"k": "u", "arr": a, "ts": t}
            for a, t in [(1, 10), (2, 50), (3, 20)]]
    p = tmp_path / "l.parquet"
    pq.write_table(pa.Table.from_pylist(rows), str(p))
    y = build_dataset(PipelineConfig.from_dict({
        "receivers": {"parquet": {"paths": str(p)}},
        "processors": {"late_arrivals": {
            "key": "k", "arrival": "arr", "ts": "ts",
            "allowed_lateness": 0}},
        "exporters": {"debug": {}},
        "service": {"pipelines": {"logs": {
            "receivers": ["parquet"], "processors": ["late_arrivals"],
            "exporters": ["debug"]}}},
    })).to_pandas()
    want = late_arrivals(ray.data.read_parquet(str(p)), "k", ["arr"],
                         "ts", allowed_lateness=0).to_pandas()
    pd.testing.assert_frame_equal(y, want, check_dtype=False)


def test_delta_to_rate_planted(ray_session):
    import pyarrow as pa

    import ray.data

    from opentelemetry_collector_ray.stages.temporal import delta_to_rate

    rows = [{"k": "a", "t": 0, "v": 10}, {"k": "a", "t": 2, "v": 10},
            {"k": "a", "t": 3, "v": 7}, {"k": "b", "t": 5, "v": 4}]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(2)
    out = delta_to_rate(ds, "k", "t", "v", "t", scale=10) \
        .to_pandas().sort_values(["k", "t"]).reset_index(drop=True)
    # a: first NULL, then 10*10//2 = 50, 7*10//1 = 70; b: first NULL
    assert out.rate_scaled.tolist()[0] != out.rate_scaled.tolist()[0] \
        or out.rate_scaled.isna().tolist() == [True, False, False, True]
    assert out.rate_scaled.dropna().tolist() == [50, 70]


def test_delta_to_rate_guards(ray_session):
    import pyarrow as pa
    import pytest

    import ray.data

    from opentelemetry_collector_ray.stages.temporal import delta_to_rate

    dup = ray.data.from_arrow(pa.Table.from_pylist(
        [{"k": "a", "t": 1, "v": 1}, {"k": "a", "t": 1, "v": 2}]))
    with pytest.raises(Exception, match="non-increasing"):
        delta_to_rate(dup, "k", "t", "v", "t").materialize()
    neg = ray.data.from_arrow(pa.Table.from_pylist(
        [{"k": "a", "t": 1, "v": -1}]))
    with pytest.raises(Exception, match="negative"):
        delta_to_rate(neg, "k", "t", "v", "t").materialize()


def test_delta_to_rate_overflow_guard(ray_session):
    import pyarrow as pa
    import pytest

    import ray.data

    from opentelemetry_collector_ray.stages.temporal import delta_to_rate

    big = ray.data.from_arrow(pa.Table.from_pylist(
        [{"k": "a", "t": 0, "v": 2 ** 61}, {"k": "a", "t": 1, "v": 1}]))
    with pytest.raises(Exception, match="overflow"):
        delta_to_rate(big, "k", "t", "v", "t",
                      scale=1_000_000).materialize()


def test_cumulative_to_delta_otel_resets(ray_session):
    import pyarrow as pa

    import ray.data

    from opentelemetry_collector_ray.stages.temporal import (
        cumulative_to_delta)

    # series: 5, 12, 3(reset), 7 → deltas 5, 7, 3, 4; one reset
    t = pa.table({"series": ["s"] * 4, "t": [1, 2, 3, 4],
                  "cum": pa.array([5, 12, 3, 7], pa.int64())})
    out = cumulative_to_delta(
        ray.data.from_arrow(t), "series", "t", "cum", out_col="d",
        resets="otel", reset_col="r").to_pandas().sort_values("t")
    assert out["d"].tolist() == [5, 7, 3, 4]
    assert out["r"].tolist() == [0, 0, 1, 0]
    # plain diff path keeps the negative delta and rejects reset_col
    plain = cumulative_to_delta(
        ray.data.from_arrow(t), "series", "t", "cum",
        out_col="d").to_pandas().sort_values("t")
    assert plain["d"].tolist() == [5, 7, -9, 4]
    import pytest as _pt

    with _pt.raises(Exception, match="resets='otel'"):
        cumulative_to_delta(ray.data.from_arrow(t), "series", "t",
                            "cum", reset_col="r").to_pandas()
