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


def read_ipc(paths, *, schema: pa.Schema | None = None
             ) -> ray.data.Dataset:
    """IPC stream files → Dataset. One reader call per file.

    Files may disagree on column order/presence. Union-by-name
    promotion runs WITHIN a read task; files large enough to occupy
    one task each never meet, so a schema-evolving directory must pin
    ``schema=`` — each file is then null-filled/reordered to it (the
    ``read_jsonl`` schema-pin convention) and every block agrees. A
    same-schema directory (the common wire case — one writer) needs no
    pin."""
    raw = read_decompressed_files(paths)

    def parse(t: pa.Table) -> pa.Table:
        tables = []
        for b in t.column("payload"):
            buf = b.as_py()
            if buf:
                tables.append(pa.ipc.open_stream(io.BytesIO(buf))
                              .read_all())
        if schema is not None:
            tables = [pa.table(
                {f.name: (tb.column(f.name).cast(f.type)
                          if f.name in tb.column_names
                          else pa.nulls(tb.num_rows, f.type))
                 for f in schema}) for tb in tables]
            if not tables:
                return schema.empty_table()
        if not tables:
            return pa.table({})
        return pa.concat_tables(tables, promote_options="default") \
            .combine_chunks()

    return raw.map_batches(parse, batch_format="pyarrow")
