"""Export partial-success responses (plogotlp analogs, all four signals ×
proto/JSON) and wire-payload compression (configcompression analog),
including compressed round trips through the real OTLP sources/sinks."""

import numpy as np
import pyarrow as pa
import pytest

from opentelemetry_collector_ray.sources.compression import (
    ARROW_ENCODINGS, compress_payload, decompress_payload)
from opentelemetry_collector_ray.sources.otlp_responses import (
    SIGNALS, decode_export_response, decode_export_response_json,
    encode_export_response, encode_export_response_json)


@pytest.mark.parametrize("signal", SIGNALS)
def test_export_response_round_trip(signal):
    # full success is the canonical empty message / empty object
    assert encode_export_response(signal) == b""
    assert decode_export_response(signal, b"") == \
        {"rejected": 0, "error_message": ""}
    assert encode_export_response_json(signal) == "{}"
    assert decode_export_response_json(signal, "{}") == \
        {"rejected": 0, "error_message": ""}
    # partial success carries count + message through both wire forms
    blob = encode_export_response(signal, 17, "queue full")
    assert decode_export_response(signal, blob) == \
        {"rejected": 17, "error_message": "queue full"}
    line = encode_export_response_json(signal, 17, "queue full")
    assert decode_export_response_json(signal, line) == \
        {"rejected": 17, "error_message": "queue full"}
    # count-only and message-only shapes
    assert decode_export_response(
        signal, encode_export_response(signal, 3))["rejected"] == 3
    assert decode_export_response_json(
        signal, encode_export_response_json(
            signal, 0, "warn"))["error_message"] == "warn"


def test_export_response_unknown_signal():
    with pytest.raises(ValueError):
        encode_export_response("nope", 1)
    with pytest.raises(ValueError):
        decode_export_response_json("nope", "{}")


def test_compression_round_trip_and_sniff():
    rng = np.random.default_rng(3)
    data = rng.integers(0, 64, 4096, dtype=np.uint8).tobytes() * 3
    for enc in ("none", "identity", "gzip", "zlib", "deflate"):
        blob = compress_payload(data, enc)
        assert decompress_payload(blob, enc) == data
        if enc not in ("none", "identity"):
            assert len(blob) < len(data)
            # sniffing path (no declared encoding)
            assert decompress_payload(blob) == data
    # deterministic gzip (mtime pinned)
    assert compress_payload(data, "gzip") == compress_payload(data, "gzip")
    # identity sniff falls through for non-compressed payloads
    assert decompress_payload(b"hello world") == b"hello world"
    for enc in ARROW_ENCODINGS:  # pyarrow-bundled codecs, size-framed
        blob = compress_payload(data, enc)
        assert decompress_payload(blob, enc) == data
        assert len(blob) < len(data)
    # zstd is sniffable (frame magic behind our 8-byte size prefix)
    assert decompress_payload(compress_payload(data, "zstd")) == data
    # review finding: a payload size whose LE prefix starts 1f 8b must
    # still sniff as zstd, not die in the gzip branch
    tricky = b"x" * 35615  # 0x8b1f
    assert decompress_payload(compress_payload(tricky, "zstd")) == tricky
    # compress-side frame cap fails loudly (not a broken round-trip)
    import pytest as _pytest
    from opentelemetry_collector_ray.sources.compression import _MAX_FRAME
    class _Huge(bytes):
        def __len__(self): return _MAX_FRAME + 1
    with _pytest.raises(ValueError, match="caps one payload"):
        compress_payload(_Huge(), "zstd")
    # corrupt size header fails loudly, not with a codec segv
    bad = b"\xff" * 8 + compress_payload(data, "zstd")[8:]
    with pytest.raises(ValueError, match="corrupt|foreign"):
        decompress_payload(bad, "zstd")
    with pytest.raises(ValueError):
        compress_payload(data, "brotli2")


def test_compressed_wire_round_trip(ray_session, tmp_path):
    """Logs written compressed through the real sinks read back identical
    via encoding sniff, for both wire forms."""
    import ray.data

    from opentelemetry_collector_ray.sources.otlp_json import (
        read_otlp_json_logs, write_otlp_json_logs)
    from opentelemetry_collector_ray.sources.otlp_proto import (
        read_otlp_proto_logs, write_otlp_proto_logs)

    rows = pa.table({
        "time_unix_nano": pa.array([1, 2, 3], pa.uint64()),
        "observed_time_unix_nano": pa.array([0, 0, 0], pa.uint64()),
        "severity_number": pa.array([9, 13, 17], pa.int32()),
        "severity_text": pa.array(["INFO", "WARN", "ERROR"]),
        "body": pa.array(["a", "b", "c"]),
        "trace_id": pa.array(["", "", ""]),
        "span_id": pa.array(["", "", ""]),
        "event_name": pa.array(["", "", ""]),
        "resource_attributes": pa.array([[], [], []],
                                        pa.map_(pa.string(), pa.string())),
        "scope_name": pa.array(["s", "s", "s"]),
        "scope_version": pa.array(["1", "1", "1"]),
        "attributes": pa.array([[], [], []],
                               pa.map_(pa.string(), pa.string())),
    })
    ds = ray.data.from_arrow(rows)
    for enc in ("gzip", "zlib", "deflate", "zstd", "snappy", "lz4"):
        pdir = tmp_path / f"proto_{enc}"
        n = write_otlp_proto_logs(ds, str(pdir), compression=enc)
        assert n == 3
        back = read_otlp_proto_logs(str(pdir)).to_pandas()
        assert sorted(back["body"]) == ["a", "b", "c"]
        jdir = tmp_path / f"json_{enc}"
        n = write_otlp_json_logs(ds, str(jdir), compression=enc)
        assert n == 3
        back = read_otlp_json_logs(str(jdir)).to_pandas()
        assert sorted(back["body"]) == ["a", "b", "c"]
