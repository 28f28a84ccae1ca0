"""Whole-pipeline equality against a pure-Python row-at-a-time oracle on
synthetic turns (SURVEY.md §5): per-sink aggregate counts exactly equal,
routed-row sets equal, per-turn text byte-equal under stable
(conv_id, turn_idx) order — the north-rule invariants."""

import re
from collections import Counter

import pandas as pd
import pyarrow.parquet as pq

from opentelemetry_collector_ray.pipelines.flagship import (
    build_aggregate, build_routed)
from opentelemetry_collector_ray.stages.enrich import (
    RESOURCE_PREFIXES, ROLE_DICT, TOOL_DICT)
from opentelemetry_collector_ray.stages.parse import DEFAULT_PARSE_RULES
from opentelemetry_collector_ray.stages.route import DEFAULT_ROUTE_RULES, DEFAULT_SINK
from opentelemetry_collector_ray.synth import synth_turns


def oracle_row(row: dict) -> dict:
    """Collector-semantics mirror: parse (first match), enrich, route."""
    out = dict(row)
    gd, rix = {}, -1
    for i, rule in enumerate(DEFAULT_PARSE_RULES):
        m = re.search(rule.pattern, row["text"] or "")
        if m:
            gd, rix = m.groupdict(), i
            break
    out["level"] = gd.get("level")
    out["tool_attr"] = gd.get("tool_attr")
    out["parse_rule"] = rix
    fam, cost = TOOL_DICT.get(row["tool"], ("unknown", "unknown"))
    out["tool_family"], out["tool_cost_class"] = fam, cost
    out["role_kind"] = ROLE_DICT.get(row["role"], "unknown")
    out["tenant"] = "tenant-unknown"
    for pref, ten, env in RESOURCE_PREFIXES:
        if row["conv_id"].startswith(pref):
            out["tenant"], out["env"] = ten, env
            break
    out["route"] = DEFAULT_SINK
    for r in DEFAULT_ROUTE_RULES:
        ok = True
        for col, allowed in r.strict.items():
            if out.get(col) not in allowed:
                ok = False
        for col, pat in r.regex.items():
            v = out.get(col)
            if v is None or not re.search(pat, v):
                ok = False
        if ok:
            out["route"] = r.sink
            break
    return out


def test_flagship_matches_row_oracle(ray_session, tmp_path):
    import ray.data

    t = synth_turns(sf=0.2)  # ~2000 rows, zipf skew, edge rows included
    ds = ray.data.from_arrow(t).repartition(6)
    routed = build_routed(ds)
    got = routed.to_pandas()

    oracle = pd.DataFrame([oracle_row(r) for r in t.to_pylist()])

    key = ["conv_id", "turn_idx"]
    got_s = got.sort_values(key, kind="mergesort").reset_index(drop=True)
    ora_s = oracle.sort_values(key, kind="mergesort").reset_index(drop=True)

    # routed-row sets equal (router test semantics)
    pd.testing.assert_series_equal(got_s["route"], ora_s["route"], check_names=False)
    # per-turn text BYTE-equal under stable order (north rule)
    assert got_s["text"].tolist() == ora_s["text"].tolist()
    for col in ["level", "tool_family", "role_kind", "tenant", "env"]:
        assert got_s[col].where(got_s[col].notna(), None).tolist() == \
            ora_s[col].where(ora_s[col].notna(), None).tolist(), col

    # per-sink aggregate counts exactly equal
    agg = build_aggregate(build_routed(ray.data.from_arrow(t))).to_pandas()
    ora_counts = Counter()
    for r in ora_s.to_dict("records"):
        bucket = pd.Timestamp(r["ts"]).floor("h")
        ora_counts[(r["route"], r["role"], r["tool"], bucket)] += 1
    got_counts = {(r["route"], r["role"], r["tool"], pd.Timestamp(r["bucket"])):
                  r["n_turns"] for r in agg.to_dict("records")}
    assert got_counts == dict(ora_counts)


def test_sorted_partition_write_stable_order(ray_session, tmp_path):
    import ray.data

    from opentelemetry_collector_ray.sinks.parquet_sink import sorted_partition_write

    t = synth_turns(sf=0.1)
    out = str(tmp_path / "sorted")
    sorted_partition_write(ray.data.from_arrow(t).repartition(5), out)
    back = pq.read_table(out).to_pandas()
    expect = t.to_pandas().sort_values(["conv_id", "turn_idx"],
                                       kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(back.reset_index(drop=True), expect)


def test_bucketed_sorted_write(ray_session, tmp_path):
    import glob

    import ray.data

    from opentelemetry_collector_ray.sinks.parquet_sink import bucketed_sorted_write

    t = synth_turns(sf=0.2)
    out = str(tmp_path / "bucketed")
    bucketed_sorted_write(ray.data.from_arrow(t).repartition(6), out, n_buckets=8)

    seen_convs: dict[str, str] = {}
    total = 0
    for d in sorted(glob.glob(f"{out}/_bucket=*")):
        files = sorted(glob.glob(f"{d}/*.parquet"))
        tb = pq.read_table(files).to_pandas() if files else None
        assert tb is not None and len(tb)
        total += len(tb)
        # within-bucket rows are sorted by (conv_id, turn_idx)
        assert tb[["conv_id", "turn_idx"]].equals(
            tb.sort_values(["conv_id", "turn_idx"], kind="mergesort")
            [["conv_id", "turn_idx"]].reset_index(drop=True))
        # no conversation straddles buckets
        for c in tb["conv_id"].unique():
            assert seen_convs.setdefault(c, d) == d
    assert total == t.num_rows
