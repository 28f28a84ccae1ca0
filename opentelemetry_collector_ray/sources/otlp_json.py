"""OTLP/JSON logs source and sink — the plog JSON wire format analog.

The reference marshals/unmarshals the three-level ResourceLogs →
ScopeLogs → LogRecord hierarchy to OTLP JSON
(``/root/reference/pdata/plog/json.go:14-44``) and the HTTP exporter can
emit it (``exporter/otlphttpexporter/otlp.go:176-265``). Here one JSON
line = one ExportLogsServiceRequest (the unit one OTLP/HTTP request
carries); reading flattens the hierarchy into one row per LogRecord with
resource/scope context denormalized into columns (SURVEY.md §1.5 — Arrow
dictionary encoding recovers the sharing the nesting provided);
writing re-nests grouped by (resource, scope).

Record/span ``attributes`` carry the FULL ``pcommon.Value`` union
(Str/Int/Double/Bool/Bytes/Map/Slice — functions/typedattrs.py typed map,
``pdata/pcommon/value.go:19-30``); nested Map/Slice values re-nest into
real kvlist/array AnyValues on the wire. ``resource_attributes`` remain
the string-restricted map (resource attrs are overwhelmingly strings —
semantic-convention names; non-string ones round-trip as JSON-encoded
strings, the documented remaining simplification).
"""

from __future__ import annotations

import json

import pyarrow as pa

import ray.data

from ..functions import typedattrs as tav

LOG_COLUMNS = ["time_unix_nano", "observed_time_unix_nano", "severity_number",
               "severity_text", "body", "trace_id", "span_id", "event_name",
               "resource_attributes", "scope_name", "scope_version",
               "attributes"]


def _attr_list_to_pairs(attrs: list | None) -> list[tuple[str, str]]:
    out = []
    for kv in attrs or []:
        v = kv.get("value", {})
        if "stringValue" in v:
            s = v["stringValue"]
        else:
            s = json.dumps(v, sort_keys=True)
        out.append((kv.get("key", ""), s))
    return out


def _pairs_to_attr_list(pairs) -> list[dict]:
    return [{"key": k, "value": {"stringValue": v}} for k, v in (pairs or [])]


def _attr_list_to_cells(attrs: list | None) -> list[tuple[str, dict]]:
    """OTLP JSON attribute list → [(key, typed cell)] — the full Value
    union, order preserved (pcommon.Map is an ordered kv-list)."""
    return [(kv.get("key", ""),
             tav.cell(*tav.json_to_value(kv.get("value", {}))))
            for kv in attrs or []]


def _cells_to_attr_list(pairs) -> list[dict]:
    # bare-str values accepted for compatibility with string-restricted
    # tables (same contract as the protobuf marshaler's _cell_keyvalue)
    return [{"key": k,
             "value": ({"stringValue": c} if isinstance(c, str)
                       else tav.value_to_json(*tav.cell_value(c)))}
            for k, c in (pairs or [])]


def parse_request_lines(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """One JSON line (ExportLogsServiceRequest) → N flat LogRecord rows."""
    rows = {c: [] for c in LOG_COLUMNS}
    for line in batch.column(text_col).to_pylist():
        if not line or not line.strip():
            continue
        req = json.loads(line)
        for rl in req.get("resourceLogs", []):
            res_attrs = _attr_list_to_pairs(rl.get("resource", {}).get("attributes"))
            for sl in rl.get("scopeLogs", []):
                scope = sl.get("scope", {})
                for lr in sl.get("logRecords", []):
                    body = lr.get("body", {})
                    rows["time_unix_nano"].append(int(lr.get("timeUnixNano", 0)))
                    rows["observed_time_unix_nano"].append(
                        int(lr.get("observedTimeUnixNano", 0)))
                    rows["severity_number"].append(int(lr.get("severityNumber", 0)))
                    rows["severity_text"].append(lr.get("severityText", ""))
                    rows["body"].append(body.get("stringValue",
                                                 json.dumps(body, sort_keys=True)
                                                 if body else ""))
                    rows["trace_id"].append(lr.get("traceId", ""))
                    rows["span_id"].append(lr.get("spanId", ""))
                    rows["event_name"].append(lr.get("eventName", ""))
                    rows["resource_attributes"].append(res_attrs)
                    rows["scope_name"].append(scope.get("name", ""))
                    rows["scope_version"].append(scope.get("version", ""))
                    rows["attributes"].append(
                        _attr_list_to_cells(lr.get("attributes")))
    return pa.table({
        "time_unix_nano": pa.array(rows["time_unix_nano"], pa.uint64()),
        "observed_time_unix_nano": pa.array(rows["observed_time_unix_nano"], pa.uint64()),
        "severity_number": pa.array(rows["severity_number"], pa.int32()),
        "severity_text": pa.array(rows["severity_text"], pa.string()),
        "body": pa.array(rows["body"], pa.string()),
        "trace_id": pa.array(rows["trace_id"], pa.string()),
        "span_id": pa.array(rows["span_id"], pa.string()),
        "event_name": pa.array(rows["event_name"], pa.string()),
        "resource_attributes": pa.array(rows["resource_attributes"],
                                        pa.map_(pa.string(), pa.string())),
        "scope_name": pa.array(rows["scope_name"], pa.string()),
        "scope_version": pa.array(rows["scope_version"], pa.string()),
        "attributes": pa.array(rows["attributes"], tav.TYPED_MAP_T),
    })


def read_otlp_json_logs(paths) -> ray.data.Dataset:
    """Read OTLP/JSON log lines into the flat LogRecord table; compressed
    request files decompress by the writer's filename suffix."""
    from .wire_io import read_decompressed_lines

    return read_decompressed_lines(paths).map_batches(
        lambda t: parse_request_lines(t, "text"), batch_format="pyarrow")


def records_to_request(batch: pa.Table) -> str:
    """Flat rows → one ExportLogsServiceRequest JSON line, re-nested by
    (resource_attributes, scope)."""
    groups: dict = {}
    for row in batch.to_pylist():
        # keep attribute order: pcommon.Map is an ORDERED kv-list (map.go)
        res_key = tuple(row.get("resource_attributes") or [])
        scope_key = (row.get("scope_name", ""), row.get("scope_version", ""))
        groups.setdefault(res_key, {}).setdefault(scope_key, []).append(row)
    resource_logs = []
    for res_key, scopes in groups.items():
        scope_logs = []
        for (sname, sver), recs in scopes.items():
            log_records = []
            for r in recs:
                lr = {
                    "timeUnixNano": str(r["time_unix_nano"]),
                    "severityNumber": r["severity_number"],
                    "severityText": r["severity_text"],
                    "body": {"stringValue": r["body"]},
                }
                if r.get("observed_time_unix_nano"):
                    lr["observedTimeUnixNano"] = str(r["observed_time_unix_nano"])
                if r.get("trace_id"):
                    lr["traceId"] = r["trace_id"]
                if r.get("span_id"):
                    lr["spanId"] = r["span_id"]
                if r.get("event_name"):
                    lr["eventName"] = r["event_name"]
                if r.get("attributes"):
                    lr["attributes"] = _cells_to_attr_list(r["attributes"])
                log_records.append(lr)
            scope_logs.append({"scope": {"name": sname, "version": sver},
                               "logRecords": log_records})
        resource_logs.append({
            "resource": {"attributes": _pairs_to_attr_list(list(res_key))},
            "scopeLogs": scope_logs,
        })
    return json.dumps({"resourceLogs": resource_logs}, sort_keys=True)


def write_otlp_json_logs(ds: ray.data.Dataset, out_dir: str,
                         compression: str = "none") -> int:
    """Each block → one JSON-line request file (request = batch, mirroring
    the 1-request-per-batch push model); ``compression=`` gzip/zlib/deflate
    compresses each file. Filenames are unique per run
    (uuid); rerun idempotence is provided one level up by the manifest
    runner's staging-dir wipe + atomic rename (state/manifest.py), matching
    how the persistent queue owns delivery state rather than the wire
    encoder. Returns total records written."""
    from .wire_io import write_request_files

    return write_request_files(
        ds, out_dir,
        lambda b: (records_to_request(b) + "\n").encode(),
        ".jsonl", compression)


# ------------------------------------------------------------ traces (JSON)

SPAN_COLUMNS = ["trace_id", "span_id", "parent_span_id", "name", "kind",
                "start_time_unix_nano", "end_time_unix_nano", "status_code",
                "status_message", "resource_attributes", "scope_name",
                "scope_version", "attributes", "links"]


def parse_spans_request_lines(batch: pa.Table, text_col: str = "text"
                              ) -> pa.Table:
    """One JSON line (ExportTraceServiceRequest) → N flat span rows (same
    flat schema as the protobuf codec's SPAN_WIRE_COLUMNS — one model,
    two marshalers, ptrace/json.go analog)."""
    rows = {c: [] for c in SPAN_COLUMNS}
    for line in batch.column(text_col).to_pylist():
        if not line or not line.strip():
            continue
        req = json.loads(line)
        for rs in req.get("resourceSpans", []):
            res_attrs = _attr_list_to_pairs(
                rs.get("resource", {}).get("attributes"))
            for ss in rs.get("scopeSpans", []):
                scope = ss.get("scope", {})
                for sp in ss.get("spans", []):
                    st = sp.get("status", {})
                    rows["trace_id"].append(sp.get("traceId", ""))
                    rows["span_id"].append(sp.get("spanId", ""))
                    rows["parent_span_id"].append(sp.get("parentSpanId", ""))
                    rows["name"].append(sp.get("name", ""))
                    rows["kind"].append(int(sp.get("kind", 0)))
                    rows["start_time_unix_nano"].append(
                        int(sp.get("startTimeUnixNano", 0)))
                    rows["end_time_unix_nano"].append(
                        int(sp.get("endTimeUnixNano", 0)))
                    rows["status_code"].append(int(st.get("code", 0)))
                    rows["status_message"].append(st.get("message", ""))
                    rows["resource_attributes"].append(res_attrs)
                    rows["scope_name"].append(scope.get("name", ""))
                    rows["scope_version"].append(scope.get("version", ""))
                    rows["attributes"].append(
                        _attr_list_to_cells(sp.get("attributes")))
                    rows["links"].append(
                        [{"trace_id": lk.get("traceId", ""),
                          "span_id": lk.get("spanId", "")}
                         for lk in sp.get("links", [])])
    return pa.table({
        "trace_id": pa.array(rows["trace_id"], pa.string()),
        "span_id": pa.array(rows["span_id"], pa.string()),
        "parent_span_id": pa.array(rows["parent_span_id"], pa.string()),
        "name": pa.array(rows["name"], pa.string()),
        "kind": pa.array(rows["kind"], pa.int32()),
        "start_time_unix_nano": pa.array(rows["start_time_unix_nano"],
                                         pa.uint64()),
        "end_time_unix_nano": pa.array(rows["end_time_unix_nano"],
                                       pa.uint64()),
        "status_code": pa.array(rows["status_code"], pa.int32()),
        "status_message": pa.array(rows["status_message"], pa.string()),
        "resource_attributes": pa.array(rows["resource_attributes"],
                                        pa.map_(pa.string(), pa.string())),
        "scope_name": pa.array(rows["scope_name"], pa.string()),
        "scope_version": pa.array(rows["scope_version"], pa.string()),
        "attributes": pa.array(rows["attributes"], tav.TYPED_MAP_T),
        "links": pa.array(rows["links"], pa.list_(pa.struct(
            [("trace_id", pa.string()), ("span_id", pa.string())]))),
    })


def spans_to_request(batch: pa.Table) -> str:
    """Flat span rows → one ExportTraceServiceRequest JSON line, re-nested
    by (resource attributes, scope)."""
    groups: dict = {}
    for row in batch.to_pylist():
        res_key = tuple(row.get("resource_attributes") or [])
        scope_key = (row.get("scope_name", ""), row.get("scope_version", ""))
        groups.setdefault(res_key, {}).setdefault(scope_key, []).append(row)
    resource_spans = []
    for res_key, scopes in groups.items():
        scope_spans = []
        for (sname, sver), recs in scopes.items():
            spans = []
            for r in recs:
                sp = {
                    "traceId": r["trace_id"],
                    "spanId": r["span_id"],
                    "name": r["name"],
                    "kind": r["kind"],
                    "startTimeUnixNano": str(r["start_time_unix_nano"]),
                    "endTimeUnixNano": str(r["end_time_unix_nano"]),
                }
                if r.get("parent_span_id"):
                    sp["parentSpanId"] = r["parent_span_id"]
                if r.get("attributes"):
                    sp["attributes"] = _cells_to_attr_list(r["attributes"])
                if r.get("links"):
                    sp["links"] = [{"traceId": lk["trace_id"],
                                    "spanId": lk["span_id"]}
                                   for lk in r["links"]]
                st = {}
                if r.get("status_code"):
                    st["code"] = r["status_code"]
                if r.get("status_message"):
                    st["message"] = r["status_message"]
                if st:
                    sp["status"] = st
                spans.append(sp)
            scope_spans.append({"scope": {"name": sname, "version": sver},
                                "spans": spans})
        resource_spans.append({
            "resource": {"attributes": _pairs_to_attr_list(list(res_key))},
            "scopeSpans": scope_spans,
        })
    return json.dumps({"resourceSpans": resource_spans}, sort_keys=True)


def read_otlp_json_spans(paths) -> ray.data.Dataset:
    """Read OTLP/JSON trace request lines into the flat span table;
    compressed files decompress by the writer's filename suffix."""
    from .wire_io import read_decompressed_lines

    return read_decompressed_lines(paths).map_batches(
        lambda t: parse_spans_request_lines(t, "text"),
        batch_format="pyarrow")


def write_otlp_json_spans(ds: ray.data.Dataset, out_dir: str,
                          compression: str = "none") -> int:
    """Each block → one ExportTraceServiceRequest JSON-line file."""
    from .wire_io import write_request_files

    return write_request_files(
        ds, out_dir,
        lambda b: (spans_to_request(b) + "\n").encode(),
        ".jsonl", compression)
