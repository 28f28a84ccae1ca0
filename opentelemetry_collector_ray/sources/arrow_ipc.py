"""Arrow IPC stream source/sink — the zero-parse interchange wire.

The reference ships logs between collectors over OTLP
(proto/JSON wire pairs, ``sources/otlp_proto.py`` here); between RAY
pipelines the native interchange is the Arrow IPC stream format:
schema-preserving, zero re-encode on write (blocks already ARE Arrow)
and one C++ ``RecordBatchStreamReader`` call per file on read — no
row-level marshaling in either direction. Use it for pipeline-to-
pipeline handoff where parquet's encode cost isn't wanted (hot
intermediate exchanges, spill-through-filesystem relays).

Scale shape mirrors the other wire sinks: the FILE is the shard unit
(`wire_io.write_request_files` — tmp-then-atomic-rename, optional
wire compression with the size-prefix framing suffixes), and the
reader schedules one task per file via ``read_binary_files``. Schema
evolution across files follows the union-by-name promotion rule
(missing columns null-fill), same convention as
``stages/snapshot.union_by_name``.
"""

from __future__ import annotations

import io

import pyarrow as pa

import ray.data

from .wire_io import read_decompressed_files, write_request_files

__all__ = ["write_ipc", "read_ipc"]


def write_ipc(ds: ray.data.Dataset, out_dir: str,
              compression: str = "none") -> int:
    """Each block → one ``.arrows`` IPC stream file (atomic rename,
    unique names, optional wire compression). Returns rows written."""

    def make_blob(batch: pa.Table) -> bytes:
        if batch.num_rows == 0:
            return b""
        sink = io.BytesIO()
        with pa.ipc.new_stream(sink, batch.schema) as w:
            w.write_table(batch)
        return sink.getvalue()

    return write_request_files(ds, out_dir, make_blob, ".arrows",
                               compression=compression)


def read_ipc(paths) -> ray.data.Dataset:
    """IPC stream files → Dataset. One reader call per file; files may
    disagree on column order/presence (union-by-name promotion)."""
    raw = read_decompressed_files(paths)

    def parse(t: pa.Table) -> pa.Table:
        tables = []
        for b in t.column("payload"):
            buf = b.as_py()
            if buf:
                tables.append(pa.ipc.open_stream(io.BytesIO(buf))
                              .read_all())
        if not tables:
            return pa.table({})
        return pa.concat_tables(tables, promote_options="default") \
            .combine_chunks()

    return raw.map_batches(parse, batch_format="pyarrow")
