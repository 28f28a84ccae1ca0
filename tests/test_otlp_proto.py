"""OTLP protobuf logs wire format: encode/decode round trip, cross-check
vs the JSON codec (one flat model, two marshalers — plog/pb.go analog),
byte sizer + MergeSplit splitting, and the file source/sink."""

import json

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from opentelemetry_collector_ray.functions import typedattrs as tav
from opentelemetry_collector_ray.sources.otlp_json import parse_request_lines
from opentelemetry_collector_ray.sources.otlp_proto import (
    decode_request, encode_request, record_byte_sizes, split_by_bytes)
from tests.test_otlp_json import REQ


def _flat():
    return parse_request_lines(
        pa.table({"text": pa.array([json.dumps(REQ)])}))


def test_proto_round_trip_matches_flat():
    flat = _flat()
    blob = encode_request(flat)
    back = decode_request(blob)
    for col in ["time_unix_nano", "observed_time_unix_nano",
                "severity_number", "severity_text", "body", "trace_id",
                "span_id", "event_name", "scope_name", "scope_version"]:
        assert back.column(col).to_pylist() == flat.column(col).to_pylist(), col
    assert back.column("attributes").to_pylist() == \
        flat.column("attributes").to_pylist()
    assert back.column("resource_attributes").to_pylist() == \
        flat.column("resource_attributes").to_pylist()


# typed attribute VALUES: the full pcommon.Value union incl. nested
# containers (strategy mirrors pdata/pcommon/value.go's 8 cases)
_prims = st.one_of(
    st.tuples(st.just(tav.VTYPE_STR), st.text(max_size=12)),
    st.tuples(st.just(tav.VTYPE_INT),
              st.integers(min_value=-(2**63), max_value=2**63 - 1)),
    st.tuples(st.just(tav.VTYPE_DOUBLE),
              st.floats(allow_nan=False, allow_infinity=False, width=64)),
    st.tuples(st.just(tav.VTYPE_BOOL), st.booleans()),
    st.tuples(st.just(tav.VTYPE_BYTES), st.binary(max_size=8)),
)
_values = st.one_of(
    _prims,
    st.tuples(st.just(tav.VTYPE_SLICE), st.lists(_prims, max_size=3)),
    st.tuples(st.just(tav.VTYPE_MAP),
              st.lists(st.tuples(st.text(min_size=1, max_size=4), _prims),
                       max_size=3)),
)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(
    st.integers(min_value=0, max_value=2**63),   # time
    st.integers(min_value=0, max_value=24),      # severity
    st.text(max_size=40),                        # body
    st.lists(st.tuples(st.text(min_size=1, max_size=8), _values), max_size=3),
), min_size=1, max_size=8))
def test_proto_round_trip_property(records):
    flat = pa.table({
        "time_unix_nano": pa.array([r[0] for r in records], pa.uint64()),
        "observed_time_unix_nano": pa.array([0] * len(records), pa.uint64()),
        "severity_number": pa.array([r[1] for r in records], pa.int32()),
        "severity_text": pa.array(["T"] * len(records)),
        "body": pa.array([r[2] for r in records]),
        "trace_id": pa.array(["0102030405060708090a0b0c0d0e0f10"] * len(records)),
        "span_id": pa.array(["0102030405060708"] * len(records)),
        "event_name": pa.array([""] * len(records)),
        "resource_attributes": pa.array([[("svc", "x")]] * len(records),
                                        pa.map_(pa.string(), pa.string())),
        "scope_name": pa.array(["s"] * len(records)),
        "scope_version": pa.array(["1"] * len(records)),
        "attributes": pa.array(
            [[(k, tav.cell(vt, v)) for k, (vt, v) in dict(r[3]).items()]
             for r in records], tav.TYPED_MAP_T),
    })
    back = decode_request(encode_request(flat))
    assert back.num_rows == flat.num_rows
    for col in ["time_unix_nano", "severity_number", "body", "attributes"]:
        assert back.column(col).to_pylist() == flat.column(col).to_pylist(), col


def test_sizer_and_split():
    flat = _flat()
    sizes = record_byte_sizes(flat)
    assert len(sizes) == flat.num_rows and all(s > 0 for s in sizes)
    # one record per slice at a tight budget; everything retained in order
    parts = split_by_bytes(flat, max_bytes=max(sizes))
    assert sum(p.num_rows for p in parts) == flat.num_rows
    assert all(p.num_rows >= 1 for p in parts)
    rejoined = pa.concat_tables(parts)
    assert rejoined.column("body").to_pylist() == \
        flat.column("body").to_pylist()
    # generous budget → single slice
    assert len(split_by_bytes(flat, max_bytes=10**9)) == 1


def test_proto_file_source_sink(ray_session, tmp_path):
    import ray.data

    from opentelemetry_collector_ray.sources.otlp_proto import (
        read_otlp_proto_logs, write_otlp_proto_logs)

    flat = _flat()
    ds = ray.data.from_arrow(flat)
    out = str(tmp_path / "proto_out")
    n = write_otlp_proto_logs(ds, out, max_request_bytes=64)
    assert n == flat.num_rows
    back = read_otlp_proto_logs(out).to_pandas().sort_values(
        "time_unix_nano").reset_index(drop=True)
    assert back["body"].tolist() == ["first", "second"]
    assert back["severity_number"].tolist() == [9, 17]


def test_span_proto_round_trip(ray_session):
    """Analytic spans → wire rows → ptrace protobuf → decoded flat rows:
    ids, timestamps, kind/status and the service.name resource attribute
    all survive."""
    import numpy as np
    import pandas as pd

    import ray.data

    from opentelemetry_collector_ray.sources.spans import derive_spans
    from opentelemetry_collector_ray.sources.otlp_proto import (
        decode_spans_request, encode_spans_request, spans_to_wire)

    ts = pd.to_datetime(["2024-01-01 10:00:05", "2024-01-01 10:10:00",
                         "2024-01-01 11:00:01"])
    ev = pa.table({
        "event_id": pa.array([11, 12, 14], pa.int64()),
        "ts": pa.array(ts),
        "user_id": pa.array([7, 7, 7], pa.int64()),
        "event_type": pa.array(["signup", "error", "view"]),
        "value": pa.array([10.0, 30.9, 0.4]),
    })
    span_tbl = derive_spans(ray.data.from_arrow(ev)).to_pandas()
    span_tbl = pa.Table.from_pandas(span_tbl, preserve_index=False)
    wire = spans_to_wire(span_tbl)
    back = decode_spans_request(encode_spans_request(wire))
    w = wire.to_pandas().sort_values("span_id").reset_index(drop=True)
    b = back.to_pandas().sort_values("span_id").reset_index(drop=True)
    for col in ["trace_id", "span_id", "parent_span_id", "name", "kind",
                "start_time_unix_nano", "end_time_unix_nano", "status_code",
                "scope_name", "scope_version"]:
        assert b[col].tolist() == w[col].tolist(), col
    assert b["resource_attributes"].tolist() == \
        w["resource_attributes"].tolist()
    # the packed 16-byte TraceID is reversible back to (user_id, epoch_hour)
    import struct as st

    uid, hour = st.unpack(">QQ", bytes.fromhex(b["trace_id"][0]))
    assert uid == 7


def test_span_json_and_proto_agree(ray_session):
    """One flat span model, two marshalers: JSON round trip equals the
    protobuf round trip row for row (ptrace json.go / pb.go parity)."""
    import pandas as pd

    import ray.data

    from opentelemetry_collector_ray.sources.otlp_json import (
        parse_spans_request_lines, spans_to_request)
    from opentelemetry_collector_ray.sources.otlp_proto import (
        decode_spans_request, encode_spans_request, spans_to_wire)
    from opentelemetry_collector_ray.sources.spans import derive_spans

    ts = pd.to_datetime(["2024-01-01 10:00:05", "2024-01-01 10:10:00"])
    ev = pa.table({
        "event_id": pa.array([21, 22], pa.int64()),
        "ts": pa.array(ts),
        "user_id": pa.array([3, 3], pa.int64()),
        "event_type": pa.array(["purchase", "error"]),
        "value": pa.array([7.0, 1.5]),
    })
    wire = spans_to_wire(
        pa.Table.from_pandas(derive_spans(ray.data.from_arrow(ev))
                             .to_pandas(), preserve_index=False))
    via_json = parse_spans_request_lines(
        pa.table({"text": pa.array([spans_to_request(wire)])}))
    via_proto = decode_spans_request(encode_spans_request(wire))
    j = via_json.to_pandas().sort_values("span_id").reset_index(drop=True)
    p = via_proto.to_pandas().sort_values("span_id").reset_index(drop=True)

    def norm(vals):
        # pandas renders list columns as ndarrays; == on those is elementwise
        return [list(v) if hasattr(v, "__len__") and not isinstance(v, str)
                else v for v in vals]

    for col in j.columns:
        assert norm(j[col].tolist()) == norm(p[col].tolist()), col


def test_span_links_wire_round_trip(ray_session):
    """Links[] survive both marshalers: analytic links (root references)
    pack into 16-byte TraceIDs on the wire and decode back identically
    via proto AND JSON."""
    import pandas as pd

    import ray.data

    from opentelemetry_collector_ray.sources.otlp_json import (
        parse_spans_request_lines, spans_to_request)
    from opentelemetry_collector_ray.sources.otlp_proto import (
        decode_spans_request, encode_spans_request, spans_to_wire)
    from opentelemetry_collector_ray.sources.spans import (
        derive_spans, with_span_links)

    ts = pd.to_datetime(["2024-01-01 10:00:05", "2024-01-01 10:10:00",
                         "2024-01-01 10:20:00"])
    ev = pa.table({
        "event_id": pa.array([11, 12, 13], pa.int64()),
        "ts": pa.array(ts),
        "user_id": pa.array([7, 7, 7], pa.int64()),
        "event_type": pa.array(["signup", "click", "error"]),
        "value": pa.array([10.0, 20.5, 30.9]),
    })
    spans = with_span_links(derive_spans(ray.data.from_arrow(ev)))
    wire = spans_to_wire(pa.Table.from_pandas(spans.to_pandas(),
                                              preserve_index=False))
    via_proto = decode_spans_request(encode_spans_request(wire))
    via_json = parse_spans_request_lines(
        pa.table({"text": pa.array([spans_to_request(wire)])}))
    p = via_proto.to_pandas().sort_values("span_id").reset_index(drop=True)
    j = via_json.to_pandas().sort_values("span_id").reset_index(drop=True)
    w = wire.to_pandas().sort_values("span_id").reset_index(drop=True)
    for df in (p, j):
        assert [list(x) for x in df["links"]] == \
            [list(x) for x in w["links"]]
    # the two non-root spans link to the root, trace id in packed hex form
    root = f"{11:016x}"
    linked = [lk for row in p["links"] for lk in row]
    assert len(linked) == 2
    assert all(lk["span_id"] == root for lk in linked)
    assert all(lk["trace_id"] == w["trace_id"][0] for lk in linked)
