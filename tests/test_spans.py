

def test_span_depth_branching_orphans_and_cycles(ray_session):
    """Pointer doubling on a real TREE (not just chains): branching,
    multiple traces in one bucket, an orphan parent, and a loud cycle
    guard."""
    import pyarrow as pa
    import pytest
    import ray.data

    from opentelemetry_collector_ray.stages.spanops import span_depth

    #        t1: r -> a -> b -> c     r -> d (branch)
    #        t2: r2 -> x;  orphan o (parent missing)
    tbl = pa.table({
        "trace_id": pa.array(["t1"] * 5 + ["t2"] * 3),
        "span_id": pa.array(["r", "a", "b", "c", "d", "r2", "x", "o"]),
        "parent_span_id": pa.array(["", "r", "a", "b", "r",
                                    "", "r2", "missing"]),
    })
    out = span_depth(ray.data.from_arrow(tbl).repartition(3)) \
        .to_pandas().set_index("span_id")["depth"]
    assert out["r"] == 0 and out["a"] == 1 and out["b"] == 2
    assert out["c"] == 3 and out["d"] == 1
    assert out["r2"] == 0 and out["x"] == 1
    assert out["o"] == 0  # unresolvable parent ends the chain

    cyc = pa.table({
        "trace_id": pa.array(["t"] * 2),
        "span_id": pa.array(["p", "q"]),
        "parent_span_id": pa.array(["q", "p"]),
    })
    with pytest.raises(Exception, match="cyclic"):
        span_depth(ray.data.from_arrow(cyc)).to_pandas()


def test_head_sample_consistency_and_bounds(ray_session):
    from opentelemetry_collector_ray.sources.spans import (
        read_derived_spans)
    from opentelemetry_collector_ray.stages.spanops import head_sample

    spans = read_derived_spans("/root/testdata/sf0.001")
    kept = head_sample(spans, 200).to_pandas()
    allsp = spans.to_pandas()
    # trace-consistent: a kept trace keeps ALL its spans
    per_trace = allsp.groupby("trace_id").size()
    kept_trace = kept.groupby("trace_id").size()
    for tid, n in kept_trace.items():
        assert n == per_trace[tid]
    # rate lands near permille/1000 at the trace level
    rate = len(kept_trace) / len(per_trace)
    assert 0.1 < rate < 0.3
    # degenerate thresholds
    assert head_sample(spans, 0).count() == 0
    assert head_sample(spans, 1000).count() == len(allsp)


def test_head_sample_validates_permille():
    import pytest

    from opentelemetry_collector_ray.stages.spanops import head_sample

    with pytest.raises(ValueError, match="permille"):
        head_sample(None, -1)
    with pytest.raises(ValueError, match="permille"):
        head_sample(None, 1001)


def test_apdex_planted(ray_session):
    import pyarrow as pa

    import ray.data

    from opentelemetry_collector_ray.stages.spanops import apdex

    # T=100: a = [50 sat, 150 tol, 500 frustrated] -> (2+1)*500//3 = 500
    #        b = [100 sat, 400 tol] -> (2+1)*500//2 = 750
    rows = [{"service": "a", "duration_us": d} for d in (50, 150, 500)]
    rows += [{"service": "b", "duration_us": d} for d in (100, 400)]
    out = apdex(ray.data.from_arrow(pa.Table.from_pylist(rows)), 100) \
        .to_pandas().sort_values("service").reset_index(drop=True)
    assert list(out.n) == [3, 2]
    assert list(out.n_satisfied) == [1, 1]
    assert list(out.n_tolerating) == [1, 1]
    assert list(out.apdex_permille) == [500, 750]


def test_apdex_validates_t():
    import pytest

    from opentelemetry_collector_ray.stages.spanops import apdex

    with pytest.raises(ValueError, match="t_us"):
        apdex(None, 0)
