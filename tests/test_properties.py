"""Property-based tests (hypothesis) — the fuzz-test analog of the
reference's plog fuzzers (pdata/plog/fuzz_test.go) and round-trip tests."""

import json

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from opentelemetry_collector_ray.functions.attrs import to_attr_map
from opentelemetry_collector_ray.functions.hashing import hash64, hash64_ints
from opentelemetry_collector_ray.sources.otlp_json import (
    parse_request_lines, records_to_request)
from opentelemetry_collector_ray.stages.batching import split_table
from opentelemetry_collector_ray.stages.parse import ParseStage

texts = st.lists(st.one_of(st.none(), st.text(max_size=200)), max_size=50)


@settings(max_examples=30, deadline=None)
@given(texts)
def test_parse_total_and_stable(vals):
    t = pa.table({"text": pa.array(vals, pa.string())})
    out1 = ParseStage()(t)
    out2 = ParseStage()(t)
    assert out1.num_rows == len(vals)  # parse never drops rows
    assert out1.equals(out2)  # deterministic
    rules = out1.column("parse_rule").to_pylist()
    assert all(-1 <= r <= 2 for r in rules)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(max_size=64)), max_size=40),
       st.lists(st.one_of(st.none(), st.text(max_size=64)), max_size=40))
def test_attr_map_pack(a_vals, b_vals):
    n = min(len(a_vals), len(b_vals))
    t = pa.table({"a": pa.array(a_vals[:n], pa.string()),
                  "b": pa.array(b_vals[:n], pa.string())})
    out = to_attr_map(t, ["a", "b"])
    for i, m in enumerate(out.column("attrs").to_pylist()):
        d = dict(m)
        expect = {}
        if a_vals[i] is not None:
            expect["a"] = a_vals[i]
        if b_vals[i] is not None:
            expect["b"] = b_vals[i]
        assert d == expect  # null omitted, empty-string kept


@settings(max_examples=30, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(max_size=100)), min_size=1, max_size=60))
def test_hash64_equality_consistent(vals):
    t = pa.array(vals, pa.string())
    h = hash64(t)
    for i, a in enumerate(vals):
        for j, b in enumerate(vals):
            if a == b and a is not None:
                assert h[i] == h[j]


@settings(max_examples=20, deadline=None)
@given(st.integers(min_value=1, max_value=97), st.integers(min_value=0, max_value=300))
def test_split_table_partition_of_input(chunk, n):
    t = pa.table({"i": pa.array(range(n))})
    parts = split_table(t, chunk)
    assert sum(p.num_rows for p in parts) == n
    assert all(p.num_rows <= chunk for p in parts)
    if parts:
        assert pa.concat_tables(parts).equals(t)


@settings(max_examples=20, deadline=None)
@given(st.lists(
    st.fixed_dictionaries({
        "body": st.text(max_size=50),
        "sev": st.integers(min_value=0, max_value=24),
        "res": st.dictionaries(st.text(min_size=1, max_size=8),
                               st.text(max_size=10), max_size=3),
    }), min_size=1, max_size=10))
def test_otlp_json_round_trip(recs):
    req = {"resourceLogs": [{
        "resource": {"attributes": [{"key": k, "value": {"stringValue": v}}
                                    for k, v in sorted(r["res"].items())]},
        "scopeLogs": [{"scope": {"name": "s", "version": "1"},
                       "logRecords": [{"timeUnixNano": "1", "severityNumber": r["sev"],
                                       "severityText": "X",
                                       "body": {"stringValue": r["body"]}}]}],
    } for r in recs]}
    flat = parse_request_lines(pa.table({"text": pa.array([json.dumps(req)])}))
    line = records_to_request(flat)
    flat2 = parse_request_lines(pa.table({"text": pa.array([line])}))

    # Re-nesting merges records that share a resource (pdata batching
    # semantics), which may reorder records — compare as multisets.
    def keyset(t):
        return sorted(
            (b, s, tuple(r or []))
            for b, s, r in zip(t.column("body").to_pylist(),
                               t.column("severity_number").to_pylist(),
                               t.column("resource_attributes").to_pylist()))

    assert keyset(flat2) == keyset(flat)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=50),
       st.integers(min_value=0, max_value=10))
def test_splitmix_deterministic_and_seed_sensitive(vals, seed):
    a = np.asarray(vals, dtype=np.uint64)
    assert (hash64_ints(a, seed) == hash64_ints(a, seed)).all()
    if len(set(vals)) > 3:
        assert (hash64_ints(a, seed) != hash64_ints(a, seed + 1)).any()
