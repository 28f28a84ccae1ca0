"""Deterministic corpus mixing (stages/mixing.py): integer rate math,
filter parity with a python reference, unsatisfiable-mixture errors."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from opentelemetry_collector_ray.stages.mixing import (mix_by_class,
                                                       mixture_rates)


def test_mixture_rates_math():
    counts = {"en": 193, "fr": 82, "de": 71, "zh": 74}
    w = {"en": 5, "fr": 3, "de": 2}
    r = mixture_rates(counts, w)
    # scale = min(193//5, 82//3, 71//2) = 27
    assert r == {"en": (5 * 27 * 1000) // 193,
                 "fr": (3 * 27 * 1000) // 82,
                 "de": (2 * 27 * 1000) // 71}
    assert all(0 < v <= 1000 for v in r.values())
    # bottleneck class keeps (almost) everything
    assert r["fr"] == 987


def test_mixture_rates_errors():
    with pytest.raises(ValueError):
        mixture_rates({"a": 10}, {})
    with pytest.raises(ValueError):
        mixture_rates({"a": 10}, {"a": 0})
    with pytest.raises(ValueError):
        mixture_rates({"a": 10}, {"a": 1, "b": 1})  # b has no rows
    with pytest.raises(ValueError):
        mixture_rates({"a": 3}, {"a": 5})  # scale would be 0


def test_mix_by_class_matches_reference(ray_session):
    rng = np.random.default_rng(5)
    n = 4000
    classes = rng.choice(["en", "fr", "de", "zh"], n,
                         p=[0.5, 0.25, 0.15, 0.1])
    tbl = pa.table({"doc_id": pa.array(np.arange(n)),
                    "lang": pa.array(classes)})
    w = {"en": 4, "fr": 2, "de": 1}
    out = mix_by_class(
        lambda: ray.data.from_arrow(tbl).repartition(4),
        "lang", w, id_col="doc_id").to_pandas()
    counts = {c: int((classes == c).sum()) for c in set(classes)}
    rates = mixture_rates(counts, w)
    keep = [i for i in range(n)
            if classes[i] in rates and i % 1000 < rates[classes[i]]]
    assert sorted(out["doc_id"]) == keep
    # unweighted class fully dropped
    assert not (out["lang"] == "zh").any()
    # achieved composition is close to the target ratio
    got = out.groupby("lang").size()
    ratio = got / got.min()
    assert abs(ratio["en"] / ratio["de"] - 4.0) < 0.35
    assert abs(ratio["fr"] / ratio["de"] - 2.0) < 0.2


def test_select_token_budget_planted(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data

    from opentelemetry_collector_ray.stages.mixing import (
        select_token_budget)

    t = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                  "score": pa.array([90, 70, 80, 60], pa.int64()),
                  "tok": pa.array([5, 4, 3, 2], pa.int64())})

    def make():
        return ray.data.from_arrow(t).repartition(2)

    # order: 1(90,5) -> 3(80,3) -> 2(70,4) -> 4(60,2); budget 9 keeps
    # 1 and 3 (cum 5, 8) but not 2 (cum 12)
    out = select_token_budget(make, "score", "tok", 9).to_pandas()
    got = out.sort_values("cum_before")
    assert got["doc_id"].tolist() == [1, 3]
    assert got["cum_before"].tolist() == [0, 5]
    # budget 0 selects nothing; negative budget raises
    assert len(select_token_budget(make, "score", "tok",
                                   0).to_pandas()) == 0
    with pytest.raises(ValueError, match="budget"):
        select_token_budget(make, "score", "tok", -1)


def test_select_budget_by_matches_window_sql(ray_session):
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from opentelemetry_collector_ray.stages.mixing import select_budget_by

    rng = np.random.default_rng(11)
    n = 5000
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "source": pa.array(rng.choice(["w", "x", "y", "z"], n)),
        "score": pa.array(rng.integers(0, 100, n).astype(np.int64)),
        "tok": pa.array(rng.integers(1, 50, n).astype(np.int64)),
    })
    out = select_budget_by(
        ray.data.from_arrow(tbl).repartition(5), "source", "tok",
        "doc_id", budget=5000, order_col="score").to_pandas()
    exp = duckdb.sql("""
        SELECT doc_id, source, score, tok FROM (
          SELECT *, sum(tok) OVER (PARTITION BY source
                 ORDER BY score DESC, doc_id) AS cum FROM tbl)
        WHERE cum <= 5000""").df()
    assert sorted(out["doc_id"]) == sorted(exp["doc_id"])
    # each source's kept mass is within budget
    assert out.groupby("source")["tok"].sum().max() <= 5000


def test_select_budget_by_validation(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data

    from opentelemetry_collector_ray.stages.mixing import select_budget_by

    ints = ray.data.from_arrow(pa.table(
        {"k": ["a"], "v": pa.array([-1], pa.int64()),
         "id": pa.array([1], pa.int64())}))
    with pytest.raises(ValueError, match="budget"):
        select_budget_by(ints, "k", "v", "id", budget=-1)
    with pytest.raises(Exception, match="negative"):
        select_budget_by(ints, "k", "v", "id", budget=5).materialize()
    floats = ray.data.from_arrow(pa.table(
        {"k": ["a"], "v": [1.5], "id": pa.array([1], pa.int64())}))
    with pytest.raises(Exception, match="integer lane"):
        select_budget_by(floats, "k", "v", "id", budget=5).materialize()


def _fq(rows, cap, **kw):
    import pyarrow as pa

    import ray.data

    from opentelemetry_collector_ray.stages.mixing import fair_quota

    ds = ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(2)
    return fair_quota(ds, "t", cap, **kw).to_pandas() \
        .sort_values("t").reset_index(drop=True)


def test_fair_quota_water_filling(ray_session):
    # demands a=1, b=4, c=10; capacity 9 -> level (9-1)/2 = 4 -> floor 4
    # a keeps 1, b capped 4, c capped 4 (sum 9 = capacity exactly)
    rows = ([{"t": "a"}] * 1 + [{"t": "b"}] * 4 + [{"t": "c"}] * 10)
    out = _fq(rows, 9)
    assert list(out.demand) == [1, 4, 10]
    assert list(out.alloc) == [1, 4, 4]
    # no contention: everyone granted in full
    out2 = _fq(rows, 100)
    assert list(out2.alloc) == [1, 4, 10]
    # zero capacity: nobody granted
    out3 = _fq(rows, 0)
    assert list(out3.alloc) == [0, 0, 0]


def test_fair_quota_small_tenants_never_starved(ray_session):
    import numpy as np

    rng = np.random.default_rng(3)
    rows = []
    for i, d in enumerate(rng.integers(1, 200, 30)):
        rows += [{"t": f"t{i:02d}"}] * int(d)
    total = len(rows)
    out = _fq(rows, total // 2)
    # feasibility + max-min property: every capped tenant sits at one
    # common level; every uncapped tenant gets its full demand
    assert out.alloc.sum() <= total // 2
    capped = out[out.alloc < out.demand]
    assert capped.alloc.nunique() <= 1
    level = int(capped.alloc.max()) if len(capped) else 0
    uncapped = out[out.alloc == out.demand]
    assert (uncapped.demand <= max(level + 1, 1) * 200).all()


def test_fair_quota_guards(ray_session):
    import pytest

    from opentelemetry_collector_ray.stages.mixing import fair_quota

    with pytest.raises(ValueError, match="capacity"):
        fair_quota(None, "t", -1)
    rows = [{"t": f"t{i}"} for i in range(20)]
    with pytest.raises(ValueError, match="max_tenants"):
        _fq(rows, 10, max_tenants=5)
