"""Wire-payload compression — the configcompression analog.

The reference's HTTP/gRPC senders compress request bodies per a
configurable ``compression:`` type (``config/configcompression/
compressiontype.go``: gzip, zlib, deflate, snappy, zstd, lz4, none) and
servers transparently decompress by Content-Encoding
(``config/confighttp/compression.go``). Here the same surface wraps the
OTLP wire blobs (sources/otlp_proto.py / otlp_json.py request bytes):

- stdlib-backed encodings are REAL: gzip, zlib, deflate (raw DEFLATE),
  identity/none.
- snappy / zstd / lz4 are REAL via pyarrow's bundled codecs
  (``pa.Codec``); because those codecs require the decompressed size,
  OUR file framing prefixes the compressed body with an 8-byte
  little-endian original-length header (we own both ends of the wire —
  reference servers similarly know the size from the transport). A
  1 GiB frame cap is enforced on BOTH ends: compress refuses larger
  payloads (split the batch instead), decompress rejects corrupt
  headers loudly.

``decompress_payload`` also sniffs the encoding from magic bytes when the
caller passes ``encoding=None`` — the server-side Content-Encoding-less
fallback (gzip/zlib magic plus the zstd frame magic behind our size
prefix; headerless snappy/lz4 are reachable only by explicit encoding
or filename suffix). At scale compression runs inside the same
``map_batches`` task that marshals the request, so blobs cross the
object store compressed.
"""

from __future__ import annotations

import gzip as _gzip
import struct as _struct
import zlib as _zlib

STDLIB_ENCODINGS = ("none", "identity", "gzip", "zlib", "deflate")
ARROW_ENCODINGS = ("snappy", "zstd", "lz4")
_MAX_FRAME = 1 << 30  # sanity cap on the size-prefix header
_ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"


def _arrow_compress(data: bytes, encoding: str) -> bytes:
    import pyarrow as pa

    if len(data) > _MAX_FRAME:
        raise ValueError(
            f"{encoding} framing caps one payload at {_MAX_FRAME} bytes "
            f"(got {len(data)}); split the batch before compressing")
    body = pa.Codec(encoding).compress(data, asbytes=True)
    return _struct.pack("<Q", len(data)) + body


def _arrow_decompress(data: bytes, encoding: str) -> bytes:
    import pyarrow as pa

    if len(data) < 8:
        raise ValueError(f"{encoding} frame too short for the 8-byte "
                         "size prefix")
    (size,) = _struct.unpack("<Q", data[:8])
    if size > _MAX_FRAME:
        raise ValueError(
            f"{encoding} frame header claims {size} bytes "
            f"(> {_MAX_FRAME}) — corrupt or foreign framing")
    return pa.Codec(encoding).decompress(data[8:], decompressed_size=size,
                                         asbytes=True)


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
    if encoding in ARROW_ENCODINGS:
        return _arrow_compress(data, encoding)
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
    if encoding in ARROW_ENCODINGS:
        return _arrow_decompress(data, encoding)
    if encoding is not None:
        raise ValueError(f"unknown compression encoding {encoding!r}")
    # sniff — framed zstd BEFORE gzip: the size prefix's low bytes can
    # collide with the gzip magic (1 in 2^16 payload sizes), while a
    # real gzip stream carrying the zstd magic at bytes 8-12 would need
    # mtime 0xFD2FB528 (year 2104); if both match, zstd is tried first
    # and gzip remains the fallback.
    if len(data) >= 12 and data[8:12] == _ZSTD_MAGIC:
        try:
            return _arrow_decompress(data, "zstd")
        except Exception:
            if data[:2] != b"\x1f\x8b":
                raise
    if data[:2] == b"\x1f\x8b":
        return _gzip.decompress(data)
    if len(data) >= 2 and data[0] == 0x78 and \
            ((data[0] << 8) | data[1]) % 31 == 0:
        return _zlib.decompress(data)
    try:
        return _zlib.decompress(data, -_zlib.MAX_WBITS)
    except _zlib.error:
        return data
