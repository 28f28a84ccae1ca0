"""Stage/sink counters computed FROM DATA (file metadata), not execution
hooks — so the collector's accounting identities hold even when Ray fuses
stages (SURVEY.md §2.5/§4.3(e)): produced(stage k) == consumed(stage k+1),
and per-sink counts == receiver-accepted − dropped.

Reference counters mirrored: ``otelcol.receiver.produced.items``,
``otelcol.processor.consumed/produced.items``,
``otelcol.exporter.consumed.items`` (service/documentation.md:9-101).
"""

from __future__ import annotations

import glob
import os


def parquet_rows(path_or_dir: str) -> int:
    """Total rows across parquet files under a path (metadata only)."""
    import pyarrow.parquet as pq

    if os.path.isfile(path_or_dir):
        return pq.read_metadata(path_or_dir).num_rows
    return sum(pq.read_metadata(f).num_rows
               for f in glob.glob(os.path.join(path_or_dir, "**", "*.parquet"),
                                  recursive=True))


def routed_counts(sink_dir: str, route_col: str = "route") -> dict[str, int]:
    """Per-route row counts from a Hive-partitioned sink layout
    (route=<name>/...parquet), metadata-only."""
    out: dict[str, int] = {}
    for d in sorted(glob.glob(os.path.join(sink_dir, f"{route_col}=*"))):
        route = os.path.basename(d).split("=", 1)[1]
        out[route] = parquet_rows(d)
    return out


def check_identities(rows_in: int, per_route: dict[str, int],
                     dropped: int = 0) -> None:
    """Receiver-accepted == sum(per-sink) + dropped; raise on violation
    (the contract the reference asserts via its pipeline counters)."""
    total_out = sum(per_route.values())
    if rows_in != total_out + dropped:
        raise AssertionError(
            f"counter identity violated: rows_in={rows_in} != "
            f"routed_out={total_out} + dropped={dropped}")
