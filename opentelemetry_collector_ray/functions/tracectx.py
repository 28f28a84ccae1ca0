"""W3C Trace Context parsing — the propagation half the wire codecs
don't cover: a ``traceparent`` header is ``{version:2x}-{trace_id:32x}-
{span_id:16x}-{flags:2x}`` (W3C Trace Context §3.2; the reference
consumes it through its propagators on every HTTP/gRPC ingest path).
Malformed headers yield NULL fields rather than raising — a telemetry
ingest keeps the record and drops the context, exactly what the spec's
"restart the trace" rule prescribes.

Validity (the spec's hard rules, all vectorized): the full fixed-width
shape must match, version ``ff`` is forbidden, and an all-zero trace id
or span id is invalid. The sampled flag is the low bit of the flags
byte — as a whole-column check on the last hex digit.

Everything is Arrow kernels (one regex match + fixed slices), and every
rule is mirrorable in SQL (``regexp_matches`` + ``substr``), so parses
gate under the exact hash oracle.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["parse_traceparent", "TRACEPARENT_RE"]

TRACEPARENT_RE = "^[0-9a-f]{2}-[0-9a-f]{32}-[0-9a-f]{16}-[0-9a-f]{2}$"
_ZERO_TRACE = "0" * 32
_ZERO_SPAN = "0" * 16
_ODD_HEX = ["1", "3", "5", "7", "9", "b", "d", "f"]


def parse_traceparent(col: pa.ChunkedArray | pa.Array) -> dict[str, pa.Array]:
    """Parse a traceparent column into ``tp_version``, ``tp_trace_id``,
    ``tp_span_id`` (strings) and ``tp_sampled`` (int64 0/1); all four
    are NULL for any row failing the spec's validity rules."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    shape_ok = pc.match_substring_regex(col, TRACEPARENT_RE)
    version = pc.utf8_slice_codeunits(col, 0, 2)
    trace = pc.utf8_slice_codeunits(col, 3, 35)
    span = pc.utf8_slice_codeunits(col, 36, 52)
    flags_lo = pc.utf8_slice_codeunits(col, 54, 55)
    valid = pc.and_kleene(
        pc.and_kleene(shape_ok, pc.not_equal(version, "ff")),
        pc.and_kleene(pc.not_equal(trace, _ZERO_TRACE),
                      pc.not_equal(span, _ZERO_SPAN)))
    valid = pc.fill_null(valid, False)
    sampled = pc.cast(pc.is_in(flags_lo, value_set=pa.array(_ODD_HEX)),
                      pa.int64())
    null = pa.scalar(None, pa.string())

    def gate(a, typ_null=null):
        return pc.if_else(valid, a, typ_null)

    return {"tp_version": gate(version),
            "tp_trace_id": gate(trace),
            "tp_span_id": gate(span),
            "tp_sampled": pc.if_else(valid, sampled,
                                     pa.scalar(None, pa.int64()))}
