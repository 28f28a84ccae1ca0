"""Parse stage: first-match priority, typed casts, parse-miss path —
mirrors the reference's exact count/content assertion style
(processor/batchprocessor/batch_processor_test.go:86,165)."""

import re

import pytest

import pyarrow as pa

from opentelemetry_collector_ray.stages.parse import (
    DEFAULT_PARSE_RULES, ParseStage, ruleset_hash)
from opentelemetry_collector_ray.synth import synth_turns


def oracle_parse_row(text: str):
    """Row-at-a-time oracle (collector-semantics mirror)."""
    for i, rule in enumerate(DEFAULT_PARSE_RULES):
        m = re.search(rule.pattern, text)
        if m:
            return i, m.groupdict()
    return -1, {}


def test_parse_matches_oracle():
    t = synth_turns(sf=0.05)
    out = ParseStage()(t)
    texts = t.column("text").to_pylist()
    got_rule = out.column("parse_rule").to_pylist()
    got_level = out.column("level").to_pylist()
    got_lat = out.column("latency_ms").to_pylist()
    got_status = out.column("status").to_pylist()
    for i, text in enumerate(texts):
        rix, gd = oracle_parse_row(text)
        assert got_rule[i] == rix, (i, text)
        assert got_level[i] == gd.get("level"), (i, text)
        exp_lat = int(gd["latency_ms"]) if "latency_ms" in gd else None
        assert got_lat[i] == exp_lat
        assert got_status[i] == gd.get("status")


def test_first_match_priority():
    t = pa.table({"text": pa.array([
        "[INFO] call tool=search latency_ms=5 status=ok trace=0123456789abcdef",
        "[WARN] something else entirely",
        "no match at all",
    ])})
    out = ParseStage()(t)
    assert out.column("parse_rule").to_pylist() == [0, 1, -1]
    # rule 0 rows must be claimed by rule 0 even though rule 1 also matches
    assert out.column("rest").to_pylist()[0] is None
    assert out.column("rest").to_pylist()[1] == "something else entirely"


def test_parse_miss_rows_pass_through():
    t = pa.table({"text": pa.array(["", "plain words", None])})
    out = ParseStage()(t)
    assert out.num_rows == 3  # no drops: miss path stays in-band
    assert out.column("parse_rule").to_pylist() == [-1, -1, -1]


def test_ruleset_hash_stable_and_sensitive():
    h1 = ruleset_hash(DEFAULT_PARSE_RULES)
    h2 = ruleset_hash(DEFAULT_PARSE_RULES)
    assert h1 == h2
    h3 = ruleset_hash(DEFAULT_PARSE_RULES[:1])
    assert h3 != h1


def test_extract_all_matches_duckdb_and_fallback(ray_session, monkeypatch):
    """functions.text.extract_all == DuckDB regexp_extract_all on
    nulls / empties / no-match rows, polars kernel and stdlib
    fallback agree, capture groups rejected up front."""
    import sys

    import duckdb
    import pytest as _pytest

    from opentelemetry_collector_ray.functions.text import extract_all

    vals = ["foo barbar bazbazbaz", None, "", "no", "aaaaaa bb cccccc"]
    col = pa.chunked_array([pa.array(vals, pa.string())])
    want = [r[0] for r in duckdb.sql(
        "SELECT regexp_extract_all(s, '[a-z]{6,}') FROM "
        "(SELECT unnest($1) s)", params=[vals]).fetchall()]
    got = extract_all(col, "[a-z]{6,}").to_pylist()
    assert got == want
    monkeypatch.setitem(sys.modules, "polars", None)
    assert extract_all(col, "[a-z]{6,}").to_pylist() == want
    monkeypatch.delitem(sys.modules, "polars")
    with _pytest.raises(ValueError, match="capture groups"):
        extract_all(col, "([a-z]{6,})")
    # non-capturing groups are the portable spelling
    assert extract_all(col, "(?:bar){2}").to_pylist() == \
        [["barbar"], None, [], [], []]


def test_extract_all_explode_stage(ray_session):
    """extract_all_explode: one output row per match carrying keep
    columns; null/empty/no-match rows contribute nothing (unnest
    semantics); collision validated."""
    import ray.data

    from opentelemetry_collector_ray.stages.parse import (
        extract_all_explode)

    t = pa.table({"id": [1, 2, 3, 4],
                  "txt": ["aaaaaa x bbbbbb", None, "zz", "cccccc"]})
    out = extract_all_explode(
        ray.data.from_arrow(t).repartition(2), "txt", "[a-z]{6,}",
        keep=["id"], out="m").to_pandas().sort_values(
        ["id", "m"]).reset_index(drop=True)
    assert out["id"].tolist() == [1, 1, 4]
    assert out["m"].tolist() == ["aaaaaa", "bbbbbb", "cccccc"]
    with pytest.raises(ValueError, match="collides"):
        extract_all_explode(ray.data.from_arrow(t), "txt", "x",
                            keep=["id"], out="id")
