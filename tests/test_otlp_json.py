"""OTLP/JSON logs wire format: flatten → process → re-nest round trip
(plog/json.go marshal/unmarshal analog + severity bands)."""

import json

import pyarrow as pa
import pytest

from opentelemetry_collector_ray.functions.severity import (
    severity_number, severity_text)
from opentelemetry_collector_ray.sources.otlp_json import (
    parse_request_lines, read_otlp_json_logs, records_to_request,
    write_otlp_json_logs)

REQ = {
    "resourceLogs": [{
        "resource": {"attributes": [
            {"key": "service.name", "value": {"stringValue": "checkout"}},
            {"key": "retries", "value": {"intValue": "3"}},
        ]},
        "scopeLogs": [{
            "scope": {"name": "lib", "version": "1.2.0"},
            "logRecords": [
                {"timeUnixNano": "1581452773000000789", "severityNumber": 9,
                 "severityText": "Info", "body": {"stringValue": "first"},
                 "traceId": "0102030405060708090a0b0c0d0e0f10",
                 "spanId": "0102030405060708",
                 "attributes": [{"key": "app", "value": {"stringValue": "server"}}]},
                {"timeUnixNano": "1581452773000000790", "severityNumber": 17,
                 "severityText": "Error", "body": {"stringValue": "second"}},
            ],
        }],
    }],
}


def test_parse_request_lines_flattens():
    batch = pa.table({"text": pa.array([json.dumps(REQ), "", json.dumps(REQ)])})
    out = parse_request_lines(batch)
    assert out.num_rows == 4
    assert out.column("body").to_pylist() == ["first", "second"] * 2
    assert out.column("severity_number").to_pylist()[:2] == [9, 17]
    res = dict(out.column("resource_attributes").to_pylist()[0])
    assert res["service.name"] == "checkout"
    # non-string pcommon.Value → JSON-encoded string (documented simplification)
    assert json.loads(res["retries"]) == {"intValue": "3"}
    assert out.column("scope_version").to_pylist()[0] == "1.2.0"


def test_round_trip_renest():
    batch = pa.table({"text": pa.array([json.dumps(REQ)])})
    flat = parse_request_lines(batch)
    line = records_to_request(flat)
    reparsed = parse_request_lines(pa.table({"text": pa.array([line])}))
    for col in ["body", "severity_number", "severity_text", "trace_id",
                "span_id", "time_unix_nano"]:
        assert reparsed.column(col).to_pylist() == flat.column(col).to_pylist(), col
    assert reparsed.column("resource_attributes").to_pylist() == \
        flat.column("resource_attributes").to_pylist()


def test_read_write_dataset(ray_session, tmp_path):
    import ray.data

    src = tmp_path / "in.jsonl"
    src.write_text(json.dumps(REQ) + "\n" + json.dumps(REQ) + "\n")
    ds = read_otlp_json_logs(str(src))
    assert ds.count() == 4
    out_dir = str(tmp_path / "out")
    n = write_otlp_json_logs(ds, out_dir)
    assert n == 4
    import pathlib

    files = [str(p) for p in pathlib.Path(out_dir).glob("req-*.jsonl")]
    assert files
    back = read_otlp_json_logs(files)
    assert back.count() == 4


def test_severity_bands():
    nums = pa.array([0, 1, 5, 9, 13, 17, 21, 24, 25])
    assert severity_text(nums).to_pylist() == [
        "UNSPECIFIED", "TRACE", "DEBUG", "INFO", "WARN", "ERROR", "FATAL",
        "FATAL", "UNSPECIFIED"]
    assert severity_number(pa.array(["info", "ERROR", "bogus"])).to_pylist() == \
        [9, 17, 0]
