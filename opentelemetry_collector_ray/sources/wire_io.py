"""Shared file I/O for the wire codecs (request-file sources/sinks).

One implementation of the read-decompress and write-compress-rename
bodies that every signal's proto/JSON source and sink shares, so codec
policy fixes (suffix dispatch, atomic-rename discipline) live in ONE
place. Decompression dispatches on the DETERMINISTIC filename suffix the
writers themselves emit (``.gz``/``.z``/``.zz`` — sniffing is kept only
for suffix-less foreign files, where gzip/zlib magic is checked but the
raw-DEFLATE guess is NOT attempted: an uncompressed payload that happens
to inflate must not be silently replaced with garbage).
"""

from __future__ import annotations

import gzip as _gzip
import os
import uuid
import zlib as _zlib

import pyarrow as pa

import ray.data

from .compression import compress_payload

def decompress_for_path(data: bytes, path: str) -> bytes:
    """Decompress by filename suffix; suffix-less files fall back to
    magic-byte checks for gzip/zlib only (identity otherwise — the
    raw-DEFLATE guess is never attempted on unlabeled data).

    ``.gz`` is special-cased: Ray's file reader force-detects gzip by
    extension and decompresses during the read (no opt-out —
    ``file_based_datasource.py`` detects when no compression is given),
    so a ``.gz`` payload without the gzip magic is ALREADY decompressed
    and passes through."""
    if path.endswith(".gz"):
        return _gzip.decompress(data) if data[:2] == b"\x1f\x8b" else data
    if path.endswith(".z"):
        return _zlib.decompress(data)
    if path.endswith(".zz"):
        return _zlib.decompress(data, -_zlib.MAX_WBITS)
    # the trailing 'f' marks OUR size-framed format AND dodges Arrow's
    # extension auto-detection (.zst/.lz4 would be decompressed — and
    # rejected for the 8-byte prefix — during the read itself)
    for suffix, enc in ((".zstf", "zstd"), (".szf", "snappy"),
                        (".lz4f", "lz4")):
        if path.endswith(suffix):
            from .compression import decompress_payload

            return decompress_payload(data, enc)
    if data[:2] == b"\x1f\x8b":
        return _gzip.decompress(data)
    if len(data) >= 2 and data[0] == 0x78 and \
            ((data[0] << 8) | data[1]) % 31 == 0:
        return _zlib.decompress(data)
    return data


def read_decompressed_files(paths) -> ray.data.Dataset:
    """Request files → one decompressed ``payload`` (binary) row each.

    ``.gz`` arrives pre-decompressed (Ray force-detects gzip by
    extension); ``decompress_for_path`` handles every case."""
    ds = ray.data.read_binary_files(paths, include_paths=True)

    def decomp(t: pa.Table) -> pa.Table:
        payloads = [decompress_for_path(b.as_py(), p.as_py())
                    for b, p in zip(t.column("bytes"), t.column("path"))]
        return pa.table({"payload": pa.array(payloads, pa.binary())})

    return ds.map_batches(decomp, batch_format="pyarrow")


def read_decompressed_lines(paths) -> ray.data.Dataset:
    """Request files → one ``text`` row per line, decompressed."""
    ds = read_decompressed_files(paths)

    def to_lines(t: pa.Table) -> pa.Table:
        lines: list[str] = []
        for b in t.column("payload"):
            lines.extend(b.as_py().decode().splitlines())
        return pa.table({"text": pa.array(lines, pa.string())})

    return ds.map_batches(to_lines, batch_format="pyarrow")


def write_request_files(ds: ray.data.Dataset, out_dir: str, make_blob,
                        ext: str, compression: str = "none") -> int:
    """Each block → request file(s) via ``make_blob(batch) -> bytes |
    list[bytes] | None`` (None/empty skips; a list writes one file per
    element — the byte-budget split path), compressed per
    ``compression``, written tmp-then-atomic-rename with a unique name.
    Returns rows."""
    suffix = {"gzip": ".gz", "zlib": ".z", "deflate": ".zz",
              "zstd": ".zstf", "snappy": ".szf", "lz4": ".lz4f"} \
        .get(compression, "")
    os.makedirs(out_dir, exist_ok=True)

    def emit(batch: pa.Table) -> pa.Table:
        blobs = make_blob(batch)
        if isinstance(blobs, (bytes, bytearray)):
            blobs = [blobs]
        for blob in blobs or []:
            if not blob:
                continue
            blob = compress_payload(blob, compression)
            name = uuid.uuid4().hex[:24]
            tmp = os.path.join(out_dir, f".{name}.tmp")
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp,
                       os.path.join(out_dir, f"req-{name}{ext}{suffix}"))
        return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

    counts = ds.map_batches(emit, batch_format="pyarrow").to_pandas()
    if len(counts) == 0 or "n" not in counts.columns:  # 0-row schema loss
        return 0
    return int(counts["n"].sum())
