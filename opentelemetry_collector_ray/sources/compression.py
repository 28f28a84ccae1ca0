"""Wire-payload compression — the configcompression analog.

The reference's HTTP/gRPC senders compress request bodies per a
configurable ``compression:`` type (``config/configcompression/
compressiontype.go``: gzip, zlib, deflate, snappy, zstd, lz4, none) and
servers transparently decompress by Content-Encoding
(``config/confighttp/compression.go``). Here the same surface wraps the
OTLP wire blobs (sources/otlp_proto.py / otlp_json.py request bytes):

- stdlib-backed encodings are REAL: gzip, zlib, deflate (raw DEFLATE),
  identity/none.
- snappy / zstd / lz4 need external codecs absent from this deployment;
  they raise a clear error naming the gap (policy-gated, same stance as
  the http(s) confmap provider).

``decompress_payload`` also sniffs the encoding from magic bytes when the
caller passes ``encoding=None`` — the server-side Content-Encoding-less
fallback. At scale compression runs inside the same ``map_batches`` task
that marshals the request, so blobs cross the object store compressed.
"""

from __future__ import annotations

import gzip as _gzip
import zlib as _zlib

STDLIB_ENCODINGS = ("none", "identity", "gzip", "zlib", "deflate")
GATED_ENCODINGS = ("snappy", "zstd", "lz4")


def compress_payload(data: bytes, encoding: str = "gzip",
                     level: int = 6) -> bytes:
    """Compress one wire blob. Deterministic (gzip mtime pinned to 0)."""
    if encoding in ("none", "identity"):
        return data
    if encoding == "gzip":
        return _gzip.compress(data, compresslevel=level, mtime=0)
    if encoding == "zlib":
        return _zlib.compress(data, level)
    if encoding == "deflate":
        # raw DEFLATE stream (no zlib header), per RFC 9110 practice
        c = _zlib.compressobj(level, _zlib.DEFLATED, -_zlib.MAX_WBITS)
        return c.compress(data) + c.flush()
    if encoding in GATED_ENCODINGS:
        raise NotImplementedError(
            f"compression {encoding!r} needs an external codec not present "
            "in this deployment; supported here: "
            + ", ".join(STDLIB_ENCODINGS))
    raise ValueError(f"unknown compression encoding {encoding!r}")


def decompress_payload(data: bytes, encoding: str | None = None) -> bytes:
    """Decompress one wire blob; ``encoding=None`` sniffs magic bytes
    (gzip 1f 8b; zlib 78 xx with valid FCHECK; else raw DEFLATE is tried
    last, falling back to identity)."""
    if encoding in ("none", "identity"):
        return data
    if encoding == "gzip":
        return _gzip.decompress(data)
    if encoding == "zlib":
        return _zlib.decompress(data)
    if encoding == "deflate":
        return _zlib.decompress(data, -_zlib.MAX_WBITS)
    if encoding in GATED_ENCODINGS:
        raise NotImplementedError(
            f"compression {encoding!r} needs an external codec not present "
            "in this deployment")
    if encoding is not None:
        raise ValueError(f"unknown compression encoding {encoding!r}")
    # sniff
    if data[:2] == b"\x1f\x8b":
        return _gzip.decompress(data)
    if len(data) >= 2 and data[0] == 0x78 and \
            ((data[0] << 8) | data[1]) % 31 == 0:
        return _zlib.decompress(data)
    try:
        return _zlib.decompress(data, -_zlib.MAX_WBITS)
    except _zlib.error:
        return data
