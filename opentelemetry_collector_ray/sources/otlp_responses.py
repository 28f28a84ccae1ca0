"""OTLP export service RESPONSES with partial success — the plogotlp /
ptraceotlp / pmetricotlp / pprofileotlp response wrappers.

The reference wraps each signal's Export response in a small message whose
only field is ``partial_success`` (field 1): a server that accepted the
request but rejected some records reports the rejected count and a
human-readable error (``pdata/plog/plogotlp/response.go``,
``generated_exportpartialsuccess.go``; OTLP spec: a missing/zero
partial_success means full success). Field numbers per signal are
identical — only the rejected-count field NAME differs:

    ExportXServiceResponse: partial_success = 1 (LEN)
    ExportXPartialSuccess:  rejected_<records> = 1 (varint int64)
                            error_message = 2 (string)

Exporter-side semantics (mirrored from otlpexporter/otlp.go): a partial
success is NOT an error — the request is consumed, the rejection is
logged/counted; only transport errors retry (sinks/reliability.py).
"""

from __future__ import annotations

import json as _json

from .otlp_proto import _LEN, _VARINT, _iter_fields, _len_field, _str_field, _tag, _varint

# rejected-count JSON field name per signal (proto field number is 1 for all)
_REJECTED_KEY = {
    "logs": "rejectedLogRecords",
    "traces": "rejectedSpans",
    "metrics": "rejectedDataPoints",
    "profiles": "rejectedProfiles",
}
SIGNALS = tuple(_REJECTED_KEY)


def encode_export_response(signal: str, rejected: int = 0,
                           error_message: str = "") -> bytes:
    """Export<Signal>ServiceResponse bytes. Full success (rejected=0 and
    no message) encodes as the canonical EMPTY message."""
    if signal not in _REJECTED_KEY:
        raise ValueError(f"unknown signal {signal!r}")
    if not rejected and not error_message:
        return b""
    ps = b""
    if rejected:
        ps += _tag(1, _VARINT) + _varint(int(rejected))
    if error_message:
        ps += _str_field(2, error_message)
    return _len_field(1, ps)


def decode_export_response(signal: str, buf: bytes) -> dict:
    """→ {"rejected": int, "error_message": str} (zeros on full success)."""
    if signal not in _REJECTED_KEY:
        raise ValueError(f"unknown signal {signal!r}")
    rejected, msg = 0, ""
    for f, w, v in _iter_fields(buf):
        if f == 1 and w == _LEN:
            for f2, _w2, v2 in _iter_fields(bytes(v)):
                if f2 == 1:
                    rejected = int(v2)
                elif f2 == 2:
                    msg = bytes(v2).decode()
    return {"rejected": rejected, "error_message": msg}


def encode_export_response_json(signal: str, rejected: int = 0,
                                error_message: str = "") -> str:
    """OTLP/JSON response line (int64 count serialized as a string per the
    OTLP JSON mapping). Full success is the empty object ``{}``."""
    if signal not in _REJECTED_KEY:
        raise ValueError(f"unknown signal {signal!r}")
    if not rejected and not error_message:
        return "{}"
    ps: dict = {}
    if rejected:
        ps[_REJECTED_KEY[signal]] = str(int(rejected))
    if error_message:
        ps["errorMessage"] = error_message
    return _json.dumps({"partialSuccess": ps}, separators=(",", ":"))


def decode_export_response_json(signal: str, line: str) -> dict:
    if signal not in _REJECTED_KEY:
        raise ValueError(f"unknown signal {signal!r}")
    ps = _json.loads(line or "{}").get("partialSuccess", {})
    return {"rejected": int(ps.get(_REJECTED_KEY[signal], 0)),
            "error_message": ps.get("errorMessage", "")}
