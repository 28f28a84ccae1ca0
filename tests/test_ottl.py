"""Mini-OTTL statement layer (functions/ottl.py): parser correctness,
editor/converter semantics vs direct kernels, where-mask behavior,
loud errors, YAML transform parity."""

from __future__ import annotations

import pyarrow as pa
import pytest

from opentelemetry_collector_ray.functions import mapattrs
from opentelemetry_collector_ray.functions.ottl import (
    compile_statements, parse_statement)


def _table():
    return pa.table({
        "body": pa.array(["Hello user=bob END", "ok user=eve", "plain"]),
        "severity_text": pa.array(["ERROR", "INFO", "ERROR"]),
        "value": pa.array([10, 200, 50], pa.int64()),
        "attrs": mapattrs.build_map({
            "env": pa.array(["dev", "dev", "prod"]),
            "secret": pa.array(["x", "y", "z"])}),
    })


def test_parse_statement_shapes():
    s = parse_statement(
        'set(attributes["env"], "prod") where severity_text == "ERROR"')
    assert s["editor"] == "set"
    assert s["args"][0] == ("mappath", "attributes", "env")
    assert s["where"][0] == "cmp"
    with pytest.raises(ValueError, match="unknown editor"):
        parse_statement('frobnicate(body)')
    with pytest.raises(ValueError, match="unknown converter"):
        parse_statement('set(body, Magic(body))')
    with pytest.raises(ValueError, match="trailing"):
        parse_statement('set(body, "x") garbage')


def test_conditional_set_and_converters():
    fn = compile_statements([
        'set(attributes["env"], "prod") where severity_text == "ERROR"',
        'set(body, ConvertCase(body, "lower"))',
        'replace_pattern(body, "user=\\\\w+", "user=***")',
        'set(flag, "big") where value > 100 and IsMatch(body, "user")',
        'set(first3, Substring(severity_text, 0, 3))',
        'set(joined, Concat(severity_text, body, "-"))',
    ])
    out = fn(_table())
    assert out.column("body").to_pylist() == [
        "hello user=*** end", "ok user=***", "plain"]
    assert mapattrs.map_get(out.column("attrs"), "env").to_pylist() == [
        "prod", "dev", "prod"]
    assert out.column("flag").to_pylist() == [None, "big", None]
    assert out.column("first3").to_pylist() == ["ERR", "INF", "ERR"]
    assert out.column("joined").to_pylist()[2] == "ERROR-plain"


def test_structural_editors_and_guards():
    fn = compile_statements([
        'rename_key(attributes, "env", "environment")',
        'delete_key(attributes, "secret")',
    ])
    out = fn(_table())
    assert mapattrs.map_has(out.column("attrs"),
                            "environment").to_pylist() == [True] * 3
    assert mapattrs.map_has(out.column("attrs"),
                            "secret").to_pylist() == [False] * 3
    keep = compile_statements(['keep_keys(attributes, ["secret"])'])
    out2 = keep(_table())
    assert mapattrs.map_has(out2.column("attrs"),
                            "env").to_pylist() == [False] * 3
    with pytest.raises(ValueError, match="structural"):
        compile_statements([
            'delete_key(attributes, "secret") where value > 0'])(_table())
    with pytest.raises(KeyError, match="no column"):
        compile_statements(['set(x, missing_col)'])(_table())


def test_statements_apply_in_order():
    # later statements see earlier edits (transformprocessor contract)
    fn = compile_statements([
        'set(tag, "a")',
        'set(tag, Concat(tag, "b", ""))',
    ])
    out = fn(_table())
    assert out.column("tag").to_pylist() == ["ab"] * 3


def test_yaml_transform_parity(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data

    from opentelemetry_collector_ray.config import PipelineConfig
    from opentelemetry_collector_ray.pipelines.builder import build_dataset

    t = pa.table({"body": pa.array(["A1", "b2", "C3"]),
                  "value": pa.array([1, 200, 3], pa.int64())})
    p = tmp_path / "t.parquet"
    pq.write_table(t, str(p))
    stmts = ['set(body, ConvertCase(body, "lower"))',
             'set(flag, "hi") where value > 100']
    y = build_dataset(PipelineConfig.from_dict({
        "receivers": {"parquet": {"paths": str(p)}},
        "processors": {"transform": {"statements": stmts}},
        "exporters": {"debug": {}},
        "service": {"pipelines": {"logs": {
            "receivers": ["parquet"], "processors": ["transform"],
            "exporters": ["debug"]}}},
    })).to_pandas().sort_values("body").reset_index(drop=True)
    fn = compile_statements(stmts)
    d = ray.data.read_parquet(str(p)).map_batches(
        fn, batch_format="pyarrow").to_pandas() \
        .sort_values("body").reset_index(drop=True)
    assert (y.astype(str).values == d.astype(str).values).all()


def test_jsonpath_converter_and_kernel(ray_session, monkeypatch):
    """JSONPath converter (functions/ottl.py) and json_path_str kernel
    (functions/text.py): polars path and the stdlib fallback agree,
    malformed JSON and missing paths go null."""
    import sys

    import pyarrow as pa

    from opentelemetry_collector_ray.functions.ottl import (
        compile_statements)
    from opentelemetry_collector_ray.functions.text import json_path_str

    col = pa.array(['{"k": 87}', '{"k": 0, "j": "x y"}', None,
                    'not json', '{"j": 5}', '{"a": {"b": true}}',
                    '{"k": 1.5}'], pa.string())
    want = ["87", "0", None, None, None, None, "1.5"]
    got = json_path_str(col, "$.k").to_pylist()
    assert got == want
    assert json_path_str(col, "$.a.b").to_pylist() == \
        [None, None, None, None, None, "true", None]

    # stdlib fallback (polars hidden) must agree exactly
    monkeypatch.setitem(sys.modules, "polars", None)
    assert json_path_str(col, "$.k").to_pylist() == want
    assert json_path_str(col, "$.a.b").to_pylist() == \
        [None, None, None, None, None, "true", None]
    monkeypatch.delitem(sys.modules, "polars")

    t = pa.table({"props": col})
    fn = compile_statements(['set(k, JSONPath(props, "$.k"))'])
    assert fn(t).column("k").to_pylist() == want


def test_jsonpath_rejects_unportable_paths(ray_session):
    """Path contract validated up front in BOTH branches (review
    finding: the fallback rejected paths polars accepted)."""
    import pyarrow as pa
    import pytest

    from opentelemetry_collector_ray.functions.text import json_path_str

    col = pa.array(['{"a": [1]}'], pa.string())
    for bad in ("$[0]", "$.a[1]", "a.b", "$."):
        with pytest.raises(ValueError, match="dotted keys"):
            json_path_str(col, bad)
