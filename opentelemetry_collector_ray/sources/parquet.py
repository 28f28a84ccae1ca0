"""Parquet source — the otlpreceiver analog.

``/root/reference/receiver/otlpreceiver/otlp.go:55-215`` accepts pushed
OTLP requests and converts wire → pdata; in batch mode the source is
``ray.data.read_parquet`` over transcript fragments (SURVEY.md §2.1).
Always prune columns at the read and push row filters down to row groups.
"""

from __future__ import annotations

from collections.abc import Sequence

import ray.data


def read_turns(paths: str | Sequence[str], columns: Sequence[str] | None = None,
               filter_expr=None, **kwargs) -> ray.data.Dataset:
    """Read transcript fragments with column pruning + row-group pushdown.

    ``filter_expr`` is a ``pyarrow.dataset`` expression (e.g.
    ``pc.field("role") == "tool"``) applied at scan time.
    """
    kw = dict(kwargs)
    if columns is not None:
        kw["columns"] = list(columns)
    if filter_expr is not None:
        kw["filter"] = filter_expr
    return ray.data.read_parquet(paths, **kw)


def read_table(sf_dir: str, name: str, columns: Sequence[str] | None = None,
               **kwargs) -> ray.data.Dataset:
    """Read one named testdata table (region/nation/.../events/documents/
    embeddings) from an sf directory."""
    return read_turns(f"{sf_dir}/{name}.parquet", columns=columns, **kwargs)


def read_table_coalesced(sf_dir: str, name: str,
                         columns: Sequence[str] | None = None,
                         target_bytes: int = 64 << 20, floor: int = 8,
                         ) -> ray.data.Dataset:
    """Coalesced read for EXCHANGE-BOUND pipelines: block count sized by
    BYTES (~64 MB each; small floor for local parallelism) instead of
    Ray's one-plus-per-file default. Ray's sort-based groupby exchange
    costs scale with BLOCK COUNT, not rows — measured on the sf0.1 spans
    derive (trace-bucket exchange): 64 default blocks 2.0-6.1 s vs 8
    blocks 0.4-0.7 s, identical output. At real scale bytes/target
    dominates and the floor is irrelevant."""
    import os

    path = f"{sf_dir}/{name}.parquet"
    nblocks = max(floor, os.path.getsize(path) // target_bytes)
    return ray.data.read_parquet(path, columns=list(columns) if columns
                                 else None,
                                 override_num_blocks=int(nblocks))
