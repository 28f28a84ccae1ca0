"""Full pcommon.Value union over Arrow typed maps — type-tagged lanes,
last-writer-wins upsert, typed readers, nested Map/Slice cells, and
cross-marshaler (JSON vs protobuf) parity for typed log attributes
(functions/typedattrs.py; reference pdata/pcommon/value.go:19-30)."""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from opentelemetry_collector_ray.functions import typedattrs as T


def _base():
    return T.build_typed_map({
        "level": pa.array(["INFO", None, "ERROR"]),
        "latency": pa.array([120, 30, None], pa.int64()),
        "score": pa.array([0.5, None, 1.25]),
        "ok": pa.array([True, False, True]),
        "payload": pa.array([b"\x00\x01", None, b"z"], pa.binary()),
    })


def test_build_typed_map_lanes_and_readers():
    m = _base()
    assert T.map_len(m).to_pylist() == [5, 2, 4]
    assert T.map_get_str(m, "level").to_pylist() == ["INFO", None, "ERROR"]
    assert T.map_get_int(m, "latency").to_pylist() == [120, 30, None]
    assert T.map_get_double(m, "score").to_pylist() == [0.5, None, 1.25]
    assert T.map_get_bool(m, "ok").to_pylist() == [True, False, True]
    assert T.map_get_bytes(m, "payload").to_pylist() == [b"\x00\x01", None, b"z"]
    # typed reader on a wrong-typed key → null, not a coerced value
    assert T.map_get_str(m, "latency").to_pylist() == [None, None, None]
    assert T.map_get_int(m, "level").to_pylist() == [None, None, None]
    assert T.vtype_of(m, "latency").to_pylist() == [T.VTYPE_INT] * 2 + [None]


def test_typed_put_upsert_and_scalars():
    m = _base()
    m2 = T.map_put(m, "latency", pa.array([1, None, 3], pa.int64()))
    assert T.map_get_int(m2, "latency").to_pylist() == [1, None, 3]
    assert T.map_len(m2).to_pylist() == [5, 1, 5]  # None row loses the entry
    # scalar puts pick the right lane per python type
    assert T.map_get_bool(T.map_put(m, "flag", True),
                          "flag").to_pylist() == [True] * 3
    assert T.map_get_int(T.map_put(m, "n", 7), "n").to_pylist() == [7] * 3
    assert T.map_get_double(T.map_put(m, "x", 1.5), "x").to_pylist() == [1.5] * 3
    assert T.map_get_bytes(T.map_put(m, "raw", b"ab"),
                           "raw").to_pylist() == [b"ab"] * 3
    # upsert replaces, preserving the other entries
    m3 = T.map_put(m2, "latency", 99)
    assert T.map_get_int(m3, "latency").to_pylist() == [99] * 3


def test_delete_rename_keep_typed():
    m = _base()
    d = T.map_delete(m, "score")
    assert T.map_len(d).to_pylist() == [4, 2, 3]
    ren = T.map_rename(m, "latency", "lat_ms")
    assert T.map_get_int(ren, "lat_ms").to_pylist() == [120, 30, None]
    kept = T.map_keep_keys(m, ["level", "ok"])
    assert T.map_len(kept).to_pylist() == [2, 1, 2]


def test_last_writer_wins_typed():
    raw = pa.array([[("k", T.cell(T.VTYPE_INT, 1)),
                     ("k", T.cell(T.VTYPE_INT, 2))]], T.TYPED_MAP_T)
    assert T.map_get_int(raw, "k").to_pylist() == [2]


def test_sliced_typed_maps_rebased():
    m = _base().slice(1, 2)
    assert T.map_get_int(m, "latency").to_pylist() == [30, None]
    assert T.map_len(m).to_pylist() == [2, 4]


def test_cell_round_trip_nested():
    nested = [("svc", (T.VTYPE_STR, "auth")),
              ("retries", (T.VTYPE_INT, 3)),
              ("blob", (T.VTYPE_BYTES, b"\x01\x02"))]
    c = T.cell(T.VTYPE_MAP, nested)
    assert T.cell_value(c) == (T.VTYPE_MAP, nested)
    sl = [(T.VTYPE_DOUBLE, 0.5), (T.VTYPE_BOOL, False)]
    c2 = T.cell(T.VTYPE_SLICE, sl)
    assert T.cell_value(c2) == (T.VTYPE_SLICE, sl)
    assert T.cell_value(T.cell(T.VTYPE_EMPTY, None)) == (T.VTYPE_EMPTY, None)


def test_json_value_mapping():
    cases = [(T.VTYPE_STR, "x"), (T.VTYPE_INT, -5), (T.VTYPE_DOUBLE, 2.5),
             (T.VTYPE_BOOL, True), (T.VTYPE_BYTES, b"\xff"),
             (T.VTYPE_SLICE, [(T.VTYPE_INT, 1), (T.VTYPE_STR, "s")]),
             (T.VTYPE_MAP, [("a", (T.VTYPE_BOOL, False))])]
    for vt, v in cases:
        assert T.json_to_value(T.value_to_json(vt, v)) == (vt, v), (vt, v)
    # OTLP JSON int64 rides as a string
    assert T.value_to_json(T.VTYPE_INT, 3) == {"intValue": "3"}


def test_to_string_map_as_string_semantics():
    m = _base()
    s = T.to_string_map(m)
    row0 = dict(s.to_pylist()[0])
    assert row0["level"] == "INFO"
    assert row0["latency"] == "120"
    assert row0["score"] == "0.5"
    assert row0["ok"] == "true"
    back = T.from_string_map(s)
    assert T.map_get_str(back, "latency").to_pylist()[0] == "120"


# ---------------------------------------------------------------- property

_cells = st.one_of(
    st.tuples(st.just(T.VTYPE_STR), st.text(max_size=6)),
    st.tuples(st.just(T.VTYPE_INT),
              st.integers(min_value=-(2**62), max_value=2**62)),
    st.tuples(st.just(T.VTYPE_DOUBLE),
              st.floats(allow_nan=False, allow_infinity=False, width=32)),
    st.tuples(st.just(T.VTYPE_BOOL), st.booleans()),
    st.tuples(st.just(T.VTYPE_BYTES), st.binary(max_size=4)),
)
_keys = st.sampled_from(["a", "b", "c", "d"])
_maps = st.lists(st.lists(st.tuples(_keys, _cells), max_size=5),
                 min_size=1, max_size=8)


@settings(max_examples=50, deadline=None)
@given(_maps, _keys, _cells)
def test_typed_ops_match_row_reference(rows, key, newval):
    m = pa.array([[(k, T.cell(vt, v)) for k, (vt, v) in row]
                  for row in rows], T.TYPED_MAP_T)

    def last(row):
        hit = None
        for k, v in row:
            if k == key:
                hit = v
        return hit

    got = T.map_get(m, key)
    want = [last(row) for row in rows]
    for g, w in zip(got.to_pylist(), want):
        if w is None:
            assert g is None  # absent → null struct (pylist renders None)
        else:
            assert T.cell_value(g) == w
    # delete removes exactly that key, order preserved
    deleted = T.map_delete(m, key).to_pylist()
    for drow, row in zip(deleted, rows):
        assert [(k, T.cell_value(c)) for k, c in drow] == \
            [(k, v) for k, v in row if k != key]
    # put == delete-then-append of the typed cell
    vt, v = newval
    put = T.map_put(m, key, pa.array(
        [T.cell(vt, v)] * len(rows), T.VALUE_T))
    for prow, row in zip(put.to_pylist(), rows):
        assert [(k, T.cell_value(c)) for k, c in prow] == \
            [(k, w) for k, w in row if k != key] + [(key, (vt, v))]
    assert T.map_has(m, key).to_pylist() == \
        [any(k == key for k, _ in row) for row in rows]
    assert T.map_len(m).to_pylist() == [len(row) for row in rows]


# ------------------------------------------- cross-marshaler parity (logs)

def test_log_typed_attrs_json_proto_parity():
    """One typed flat model, two marshalers: a record carrying every Value
    case round-trips identically through the JSON and protobuf codecs
    (plog json.go / pb.go parity, now typed)."""
    from opentelemetry_collector_ray.sources.otlp_json import (
        parse_request_lines, records_to_request)
    from opentelemetry_collector_ray.sources.otlp_proto import (
        decode_request, encode_request)

    attrs = [
        ("s", T.cell(T.VTYPE_STR, "txt")),
        ("i", T.cell(T.VTYPE_INT, -42)),
        ("d", T.cell(T.VTYPE_DOUBLE, 3.5)),
        ("b", T.cell(T.VTYPE_BOOL, True)),
        ("z", T.cell(T.VTYPE_BYTES, b"\x00\xff")),
        ("m", T.cell(T.VTYPE_MAP, [("inner", (T.VTYPE_INT, 7))])),
        ("l", T.cell(T.VTYPE_SLICE, [(T.VTYPE_STR, "x"),
                                     (T.VTYPE_DOUBLE, 1.5)])),
    ]
    flat = pa.table({
        "time_unix_nano": pa.array([1], pa.uint64()),
        "observed_time_unix_nano": pa.array([0], pa.uint64()),
        "severity_number": pa.array([9], pa.int32()),
        "severity_text": pa.array(["Info"]),
        "body": pa.array(["hello"]),
        "trace_id": pa.array([""]),
        "span_id": pa.array([""]),
        "event_name": pa.array([""]),
        "resource_attributes": pa.array([[("svc", "x")]],
                                        pa.map_(pa.string(), pa.string())),
        "scope_name": pa.array(["s"]),
        "scope_version": pa.array(["1"]),
        "attributes": pa.array([attrs], T.TYPED_MAP_T),
    })
    via_proto = decode_request(encode_request(flat))
    via_json = parse_request_lines(
        pa.table({"text": pa.array([records_to_request(flat)])}))
    assert via_proto.column("attributes").to_pylist() == \
        via_json.column("attributes").to_pylist()
    assert via_proto.column("attributes").to_pylist()[0] == attrs
    # the int attribute reads back typed — no cast from string anywhere
    got = T.map_get_int(via_proto.column("attributes").combine_chunks(), "i")
    assert got.to_pylist() == [-42]


def test_to_string_map_exact_big_ints():
    """Regression: the int lane holds nulls on other-typed entries, so a
    numpy conversion would go through float64 and corrupt ints > 2^53 —
    AsString must render them exactly."""
    big = 2**60 + 1
    m = T.build_typed_map({"big": pa.array([big], pa.int64()),
                           "s": pa.array(["x"])})
    assert dict(T.to_string_map(m).to_pylist()[0])["big"] == str(big)


def test_json_marshaler_accepts_legacy_string_maps():
    """Regression: string-restricted map<string,string> attributes (older
    producers) must encode through the JSON marshaler like they do
    through the protobuf one."""
    from opentelemetry_collector_ray.sources.otlp_json import (
        parse_request_lines, records_to_request)

    flat = pa.table({
        "time_unix_nano": pa.array([1], pa.uint64()),
        "observed_time_unix_nano": pa.array([0], pa.uint64()),
        "severity_number": pa.array([9], pa.int32()),
        "severity_text": pa.array(["Info"]),
        "body": pa.array(["hello"]),
        "trace_id": pa.array([""]), "span_id": pa.array([""]),
        "event_name": pa.array([""]),
        "resource_attributes": pa.array([[("svc", "x")]],
                                        pa.map_(pa.string(), pa.string())),
        "scope_name": pa.array(["s"]), "scope_version": pa.array(["1"]),
        "attributes": pa.array([[("app", "server")]],
                               pa.map_(pa.string(), pa.string())),
    })
    line = records_to_request(flat)
    back = parse_request_lines(pa.table({"text": pa.array([line])}))
    got = back.column("attributes").to_pylist()[0]
    assert got[0][0] == "app" and got[0][1]["s"] == "server"


def test_one_deep_slice_real_lane_and_get_nested():
    """One-deep Slice/Map cells land on REAL nested lanes (nv/nk) — no
    JSON on the string lane — and get_nested reads elements vectorized."""
    from opentelemetry_collector_ray.functions import typedattrs as T

    toks = pa.array([["a", "b", "c"], ["x"], None, []],
                    pa.list_(pa.string()))
    ids = pa.array([1, 2, 3, 4], pa.int64())
    m = T.build_typed_map({"tokens": toks, "n": ids})
    # slice cells carry nv, NOT JSON
    g = T.map_get(m, "tokens")
    assert g.field("s").null_count == len(g)
    assert T.nested_len(m, "tokens").to_pylist() == [3, 1, None, 0]
    first = T.nested_str(T.get_nested(m, "tokens.0"))
    assert first.to_pylist() == ["a", "x", None, None]
    third = T.nested_str(T.get_nested(m, "tokens.2"))
    assert third.to_pylist() == ["c", None, None, None]
    # wrong-kind attr (int) → null, not a crash
    assert T.nested_str(T.get_nested(m, "n.0")).to_pylist() == [None] * 4


def test_one_deep_map_cell_and_wire_round_trip():
    from opentelemetry_collector_ray.functions import typedattrs as T

    shallow_map = (T.VTYPE_MAP, [("lang", (T.VTYPE_STR, "en")),
                                 ("score", (T.VTYPE_INT, 7)),
                                 ("lang", (T.VTYPE_STR, "de"))])
    shallow_slice = (T.VTYPE_SLICE, [(T.VTYPE_INT, 1), (T.VTYPE_DOUBLE, 2.5)])
    deep = (T.VTYPE_MAP, [("inner", shallow_slice)])
    cells = [T.cell(*shallow_map), T.cell(*shallow_slice), T.cell(*deep)]
    # shallow cells use nk/nv; deep falls back to JSON
    assert cells[0]["s"] is None and cells[0]["nk"] == ["lang", "score",
                                                       "lang"]
    assert cells[1]["s"] is None and cells[1]["nk"] is None
    assert cells[2]["s"] is not None
    # exact round trip for all three (wire codecs ride cell/cell_value)
    for src, c in zip((shallow_map, shallow_slice, deep), cells):
        assert T.cell_value(c) == src
    # OTLP JSON AnyValue round trip preserved
    for src in (shallow_map, shallow_slice, deep):
        assert T.json_to_value(T.value_to_json(*src)) == src
    # vectorized subkey read over an Arrow column of these cells
    items = pa.array(cells, T.VALUE_T)
    mp = pa.MapArray.from_arrays(pa.array([0, 1, 2, 3], pa.int32()),
                                 pa.array(["a", "a", "a"], pa.string()),
                                 items)
    lang = T.nested_str(T.get_nested(mp, "a.lang"))
    assert lang.to_pylist() == ["de", None, None]  # last-writer-wins
    score = T.nested_int(T.get_nested(mp, "a.score"))
    assert score.to_pylist() == [7, None, None]
    # to_string_map renders one-deep cells as JSON text (lossy direction)
    import json as _json

    sm = T.to_string_map(mp)
    rendered = _json.loads(sm.to_pylist()[1][0][1])
    assert rendered == [[T.VTYPE_INT, 1], [T.VTYPE_DOUBLE, 2.5]]


def test_lift_null_list_elements_are_empty_cells():
    """A null ELEMENT inside a lifted list is the Empty value case —
    (evt, None) cells would crash the wire codecs (review finding)."""
    from opentelemetry_collector_ray.functions import typedattrs as T

    m = T.build_typed_map({"xs": pa.array([[1, None, 2], [None]],
                                          pa.list_(pa.int64()))})
    cells = T.map_get(m, "xs").to_pylist()
    assert [e["vtype"] for e in cells[0]["nv"]] == \
        [T.VTYPE_INT, T.VTYPE_EMPTY, T.VTYPE_INT]
    # cell contract round-trips through both wire forms
    vt, py = T.cell_value(cells[0])
    assert py == [(T.VTYPE_INT, 1), (T.VTYPE_EMPTY, None),
                  (T.VTYPE_INT, 2)]
    assert T.json_to_value(T.value_to_json(vt, py)) == (vt, py)
    # element reads: the empty slot is null on every typed lane
    assert T.nested_int(T.get_nested(m, "xs.1")).to_pylist() == [None,
                                                                 None]
    assert T.nested_int(T.get_nested(m, "xs.0")).to_pylist() == [1, None]


def test_get_nested_numeric_string_map_subkey():
    """A digit path segment must also reach Map subkeys that are numeric
    strings (review finding: previously silently null)."""
    from opentelemetry_collector_ray.functions import typedattrs as T

    cells = [T.cell(T.VTYPE_MAP, [("0", (T.VTYPE_STR, "zero")),
                                  ("x", (T.VTYPE_INT, 9))]),
             T.cell(T.VTYPE_SLICE, [(T.VTYPE_STR, "s0"),
                                    (T.VTYPE_STR, "s1")])]
    mp = pa.MapArray.from_arrays(pa.array([0, 1, 2], pa.int32()),
                                 pa.array(["a", "a"], pa.string()),
                                 pa.array(cells, T.VALUE_T))
    got = T.nested_str(T.get_nested(mp, "a.0"))
    assert got.to_pylist() == ["zero", "s0"]  # map subkey AND slice index
    assert T.nested_int(T.get_nested(mp, "a.x")).to_pylist() == [9, None]
