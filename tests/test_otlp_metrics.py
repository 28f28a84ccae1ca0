"""OTLP metrics wire formats: proto + JSON encode/decode round trips over
all five pmetric types, cross-marshaler parity, the analytic
exp-histogram bridge, and the file source/sink
(sources/otlp_metrics.py; reference pmetric/pb.go + json.go)."""

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from opentelemetry_collector_ray.functions import typedattrs as tav
from opentelemetry_collector_ray.sources.otlp_metrics import (
    EXP_HISTOGRAM, GAUGE, HISTOGRAM, SUM, SUMMARY, _empty_row,
    _rows_to_table, decode_metrics_request, encode_metrics_request,
    exp_histogram_rows_to_wire, metrics_to_request,
    parse_metrics_request_lines)


def _mk(mtype, name, **over):
    r = _empty_row()
    r.update({"metric_name": name, "metric_description": "desc",
              "metric_unit": "1", "metric_type": mtype,
              "time_unix_nano": 1700000000000000000,
              "start_time_unix_nano": 1600000000000000000,
              "aggregation_temporality":
                  2 if mtype in (SUM, HISTOGRAM, EXP_HISTOGRAM) else None,
              "is_monotonic": True if mtype == SUM else None,
              "resource_attributes": [("service.name", "checkout")],
              "scope_name": "lib", "scope_version": "1",
              "attributes": [("host", tav.cell(tav.VTYPE_STR, "a")),
                             ("pid", tav.cell(tav.VTYPE_INT, 42))]})
    r.update(over)
    return r


_EXEMPLARS = [
    {"time_unix_nano": 1700000000000000001, "value_int": None,
     "value_double": 0.75, "trace_id": "0102030405060708090a0b0c0d0e0f10",
     "span_id": "0102030405060708",
     "filtered_attributes": [("why", tav.cell(tav.VTYPE_STR, "spike"))]},
    {"time_unix_nano": 1700000000000000002, "value_int": 9,
     "value_double": None, "trace_id": "", "span_id": "",
     "filtered_attributes": []},
]


def _all_types_table() -> pa.Table:
    rows = [
        _mk(GAUGE, "cpu.temp", value_double=63.5, exemplars=_EXEMPLARS),
        _mk(GAUGE, "queue.len", value_int=17),
        _mk(SUM, "requests.total", value_int=12345),
        _mk(SUM, "bytes.rate", value_double=2.5),
        _mk(HISTOGRAM, "latency.hist", count=10, sum=123.5,
            bucket_counts=[1, 4, 5], explicit_bounds=[0.5, 1.0],
            min=0.02, max=9.5, exemplars=_EXEMPLARS[:1]),
        _mk(EXP_HISTOGRAM, "latency.exp", count=9, sum=77.0, scale=-1,
            zero_count=2, positive_offset=-3,
            positive_bucket_counts=[1, 0, 4], negative_offset=0,
            negative_bucket_counts=[2], min=-1.5, max=30.0),
        _mk(SUMMARY, "gc.pause", count=5, sum=0.9,
            quantile_values=[{"quantile": 0.5, "value": 0.1},
                             {"quantile": 0.99, "value": 0.4}]),
    ]
    return _rows_to_table(rows)


def test_proto_round_trip_all_types():
    flat = _all_types_table()
    back = decode_metrics_request(encode_metrics_request(flat))
    assert back.num_rows == flat.num_rows
    b = {r["metric_name"]: r for r in back.to_pylist()}
    f = {r["metric_name"]: r for r in flat.to_pylist()}
    assert set(b) == set(f)
    for name in f:
        for col in ["metric_type", "metric_unit", "time_unix_nano",
                    "start_time_unix_nano", "value_int", "value_double",
                    "count", "sum", "min", "max", "bucket_counts",
                    "explicit_bounds", "scale", "zero_count",
                    "positive_offset", "positive_bucket_counts",
                    "quantile_values", "exemplars",
                    "aggregation_temporality", "is_monotonic",
                    "attributes", "resource_attributes"]:
            fb, ff = b[name][col], f[name][col]
            # exp-histogram empty bucket lists normalize to (0, [])
            if ff is None and fb in (0, [], None):
                continue
            assert fb == ff, (name, col, fb, ff)


def test_json_round_trip_all_types():
    flat = _all_types_table()
    line = metrics_to_request(flat)
    back = parse_metrics_request_lines(
        pa.table({"text": pa.array([line])}))
    assert back.num_rows == flat.num_rows
    b = {r["metric_name"]: r for r in back.to_pylist()}
    f = {r["metric_name"]: r for r in flat.to_pylist()}
    for name in f:
        for col in ["metric_type", "value_int", "value_double", "count",
                    "sum", "bucket_counts", "explicit_bounds", "scale",
                    "zero_count", "positive_bucket_counts",
                    "quantile_values", "attributes"]:
            fb, ff = b[name][col], f[name][col]
            if ff is None and fb in (0, [], None):
                continue
            assert fb == ff, (name, col, fb, ff)


def test_cross_marshaler_parity():
    """One flat model, two marshalers: proto round trip equals JSON round
    trip row for row (pmetric pb.go / json.go parity)."""
    flat = _all_types_table()
    via_proto = decode_metrics_request(encode_metrics_request(flat))
    via_json = parse_metrics_request_lines(
        pa.table({"text": pa.array([metrics_to_request(flat)])}))
    p = sorted(via_proto.to_pylist(), key=lambda r: r["metric_name"])
    j = sorted(via_json.to_pylist(), key=lambda r: r["metric_name"])
    assert p == j


_attr_cells = st.lists(
    st.tuples(st.sampled_from(["a", "b", "k"]),
              st.one_of(
                  st.tuples(st.just(tav.VTYPE_STR), st.text(max_size=6)),
                  st.tuples(st.just(tav.VTYPE_INT),
                            st.integers(-(2**40), 2**40)),
                  st.tuples(st.just(tav.VTYPE_BOOL), st.booleans()))),
    max_size=2)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(
    st.sampled_from([GAUGE, SUM]),
    st.integers(min_value=0, max_value=2**62),                 # time
    st.one_of(st.integers(-(2**62), 2**62),                    # as_int
              st.floats(allow_nan=False, allow_infinity=False, width=32)),
    _attr_cells,
), min_size=1, max_size=6))
def test_number_points_property(points):
    rows = []
    for i, (mtype, t, val, attrs) in enumerate(points):
        over = {"value_int": val} if isinstance(val, int) \
            else {"value_double": val}
        rows.append(_mk(mtype, f"m{i}", time_unix_nano=t,
                        attributes=[(k, tav.cell(vt, v))
                                    for k, (vt, v) in dict(attrs).items()],
                        **over))
    flat = _rows_to_table(rows)
    via_proto = decode_metrics_request(encode_metrics_request(flat))
    via_json = parse_metrics_request_lines(
        pa.table({"text": pa.array([metrics_to_request(flat)])}))
    key = lambda r: r["metric_name"]
    assert sorted(via_proto.to_pylist(), key=key) == \
        sorted(via_json.to_pylist(), key=key)
    got = {r["metric_name"]: r for r in via_proto.to_pylist()}
    for i, (mtype, t, val, attrs) in enumerate(points):
        r = got[f"m{i}"]
        if isinstance(val, int):
            assert r["value_int"] == val
        else:
            assert r["value_double"] == pytest.approx(val, abs=0)


def test_exp_histogram_bridge(ray_session):
    """Analytic exp_histogram output → wire data points: counts densify
    into offset + contiguous bucket list; zero bucket (null idx) becomes
    zeroCount; round-trips through the proto codec."""
    import ray.data

    from opentelemetry_collector_ray.stages.metricsops import exp_histogram

    t = pa.table({"k": pa.array(["x"] * 6 + ["y"] * 2),
                  "v": pa.array([0, 0, 1, 2, 3, 8, 4, 0], pa.int64())})
    agg = exp_histogram(ray.data.from_arrow(t), ["k"], "v").to_arrow_refs()
    import ray as _ray

    parts = [x for x in _ray.get(agg) if x.num_rows]
    hist = pa.concat_tables(parts)
    wire = exp_histogram_rows_to_wire(hist, ["k"], "events.cents")
    assert wire.num_rows == 2
    back = decode_metrics_request(encode_metrics_request(wire))
    by_k = {dict(r["attributes"])["k"]["s"]: r for r in back.to_pylist()}
    # x: values 0,0,1,2,3,8 → zero=2; idx: 1→-1, 2→0, 3→1, 8→2
    x = by_k["x"]
    assert x["zero_count"] == 2
    assert x["positive_offset"] == -1
    assert x["positive_bucket_counts"] == [1, 1, 1, 1]
    assert x["count"] == 6
    y = by_k["y"]  # 4 → idx 1; one zero
    assert y["zero_count"] == 1
    assert y["positive_offset"] == 1
    assert y["positive_bucket_counts"] == [1]


def test_metrics_file_source_sink(ray_session, tmp_path):
    import ray.data

    from opentelemetry_collector_ray.sources.otlp_metrics import (
        read_otlp_proto_metrics, write_otlp_proto_metrics)

    flat = _all_types_table()
    out = str(tmp_path / "metrics_out")
    n = write_otlp_proto_metrics(ray.data.from_arrow(flat), out)
    assert n == flat.num_rows
    # project before to_pandas: Ray's pandas conversion trips over
    # list<struct> columns (tensor-extension cast — NOTES.md)
    back = read_otlp_proto_metrics(out) \
        .select_columns(["metric_name"]).to_pandas()
    assert sorted(back["metric_name"]) == sorted(
        flat.column("metric_name").to_pylist())


def test_exemplar_wire_tags_match_reference():
    """Byte-level check against the reference marshaler's tags
    (generated_proto_exemplar.go): span_id is FIELD 4 (tag 0x22, 8
    bytes) and trace_id FIELD 5 (tag 0x2a, 16 bytes) — a swap would
    round-trip internally but break every real OTLP peer."""
    from opentelemetry_collector_ray.sources.otlp_metrics import (
        _encode_exemplar)

    blob = _encode_exemplar({
        "time_unix_nano": 1, "value_int": None, "value_double": 0.5,
        "trace_id": "0102030405060708090a0b0c0d0e0f10",
        "span_id": "a1a2a3a4a5a6a7a8", "filtered_attributes": []})
    i4 = blob.index(b"\x22")
    assert blob[i4 + 1] == 8  # span_id length
    assert blob[i4 + 2: i4 + 10] == bytes.fromhex("a1a2a3a4a5a6a7a8")
    i5 = blob.index(b"\x2a")
    assert blob[i5 + 1] == 16  # trace_id length
    assert blob[i5 + 2: i5 + 18] == bytes.fromhex(
        "0102030405060708090a0b0c0d0e0f10")
