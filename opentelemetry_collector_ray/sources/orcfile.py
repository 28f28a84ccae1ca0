"""ORC file source/sink — the columnar-format sibling of the parquet
and Arrow-IPC wire paths (reference: the collector reads whatever the
storage tier serves; ORC is the other columnar format a lake commonly
holds). Ray 2.49 has no ``read_orc``, so this rides
``read_binary_files`` + one ``pyarrow.orc`` C++ parse per file — the
same one-parse-per-file shape as the JSONL reader.
"""

from __future__ import annotations

import io

import pyarrow as pa

import ray.data


def read_orc(paths, *, columns: list[str] | None = None
             ) -> ray.data.Dataset:
    """ORC file(s) → Dataset. ``columns`` prunes at the decode (the
    ORC reader materializes only the requested columns)."""
    from pyarrow import orc

    raw = ray.data.read_binary_files(paths)

    def parse(t: pa.Table) -> pa.Table:
        outs = []
        for b in t.column("bytes"):
            outs.append(orc.read_table(io.BytesIO(b.as_py()),
                                       columns=columns))
        if not outs:
            return pa.table({})
        return pa.concat_tables(outs, promote_options="default")

    return raw.map_batches(parse, batch_format="pyarrow")


def write_orc(ds: ray.data.Dataset, out_dir: str) -> int:
    """Each block → one ORC file (tmp-then-atomic-rename, unique
    names — the resumable-sink convention). Returns rows written."""
    import os
    import uuid

    from pyarrow import orc

    os.makedirs(out_dir, exist_ok=True)

    def emit(batch: pa.Table) -> pa.Table:
        if batch.num_rows:
            name = f"part-{uuid.uuid4().hex[:12]}.orc"
            tmp = os.path.join(out_dir, f".{name}.tmp")
            orc.write_table(batch, tmp)
            os.rename(tmp, os.path.join(out_dir, name))
        return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

    parts = ds.map_batches(emit, batch_format="pyarrow",
                           batch_size=None)
    return int(sum(r["n"] for r in parts.take_all()))
