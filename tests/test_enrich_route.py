"""Enrich (broadcast lookups) + route (first-match) unit tests against
row-at-a-time oracles — the routed-row-set equality discipline of the
reference router test (service/internal/graph/graph_test.go:1173)."""

import pyarrow as pa

from opentelemetry_collector_ray.stages.enrich import (
    RESOURCE_PREFIXES, ROLE_DICT, TOOL_DICT, EnrichStage)
from opentelemetry_collector_ray.stages.parse import ParseStage
from opentelemetry_collector_ray.stages.route import (
    DEFAULT_SINK, RouteRule, RouteStage)
from opentelemetry_collector_ray.synth import synth_turns


def test_enrich_matches_oracle():
    t = synth_turns(sf=0.05)
    out = EnrichStage()(t)
    tools = t.column("tool").to_pylist()
    roles = t.column("role").to_pylist()
    convs = t.column("conv_id").to_pylist()
    fam = out.column("tool_family").to_pylist()
    cost = out.column("tool_cost_class").to_pylist()
    kind = out.column("role_kind").to_pylist()
    tenant = out.column("tenant").to_pylist()
    for i in range(t.num_rows):
        ef, ec = TOOL_DICT.get(tools[i], ("unknown", "unknown"))
        assert (fam[i], cost[i]) == (ef, ec)
        assert kind[i] == ROLE_DICT.get(roles[i], "unknown")
        expect_tenant = "tenant-unknown"
        for pref, ten, _env in RESOURCE_PREFIXES:
            if convs[i].startswith(pref):
                expect_tenant = ten
                break
        assert tenant[i] == expect_tenant


def test_enrich_empty_tool_distinct_from_missing():
    t = pa.table({"tool": pa.array(["", None, "search"]),
                  "role": pa.array(["user"] * 3),
                  "conv_id": pa.array(["conv-00000001"] * 3)})
    out = EnrichStage()(t)
    assert out.column("tool_family").to_pylist() == ["unknown", "unknown", "retrieval"]


RULES = (
    RouteRule(sink="left", strict={"level": ("ERROR",)}),
    RouteRule(sink="right", strict={"tool": ("python", "bash")}),
    RouteRule(sink="views", regex={"text": r"viewed page"}),
)


def oracle_route(row) -> str:
    if row.get("level") == "ERROR":
        return "left"
    if row.get("tool") in ("python", "bash"):
        return "right"
    import re

    if row.get("text") and re.search(r"viewed page", row["text"]):
        return "views"
    return DEFAULT_SINK


def test_route_matches_oracle():
    t = synth_turns(sf=0.05)
    parsed = ParseStage()(t)
    routed = RouteStage(RULES)(parsed)
    rows = parsed.to_pylist()
    got = routed.column("route").to_pylist()
    for i, row in enumerate(rows):
        assert got[i] == oracle_route(row), row


def test_route_first_match_priority_and_null_safety():
    t = pa.table({
        "level": pa.array(["ERROR", None, "INFO"]),
        "tool": pa.array(["python", "python", ""]),
        "text": pa.array([None, "viewed page p1", "plain"]),
    })
    got = RouteStage(RULES)(t).column("route").to_pylist()
    # row0: both left+right match -> left (priority). row1: right beats views.
    assert got == ["left", "right", "default"]


def test_ring_assign_consistency_under_churn(ray_session):
    """THE consistent-hashing property: removing one backend only
    moves the keys that were on it — every other key keeps its
    assignment (a mod-N partitioner would reshuffle nearly all)."""
    import pyarrow as pa

    import ray.data

    from opentelemetry_collector_ray.stages.route import ring_assign

    rows = [{"k": f"user-{i}"} for i in range(500)]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    four = ring_assign(ds, "k", ["a", "b", "c", "d"]) \
        .to_pandas().set_index("k")["backend"]
    three = ring_assign(ds, "k", ["a", "b", "c"]) \
        .to_pandas().set_index("k")["backend"]
    moved = 0
    for k in four.index:
        if four[k] == "d":
            assert three[k] in ("a", "b", "c")
            moved += 1
        else:
            assert three[k] == four[k], k
    # backend d held a real share of the ring
    assert 50 < moved < 250
    # all four backends actually receive keys
    assert set(four.unique()) == {"a", "b", "c", "d"}


def test_ring_assign_validation():
    import pytest

    from opentelemetry_collector_ray.stages.route import ring_assign

    with pytest.raises(ValueError, match="non-empty"):
        ring_assign(None, "k", [])
    with pytest.raises(ValueError, match="duplicate"):
        ring_assign(None, "k", ["a", "a"])
    with pytest.raises(ValueError, match="vnodes"):
        ring_assign(None, "k", ["a"], vnodes=0)
