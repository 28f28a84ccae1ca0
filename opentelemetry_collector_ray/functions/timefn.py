"""Timestamp kernels (pcommon.Timestamp analog,
``/root/reference/pdata/pcommon/timestamp.go:12-22`` — uint64 epoch ns).

In batch mode the collector's only time semantics are arrival batching
timeouts (meaningless here) and event-time bucketing for the north-star
aggregate, which is exact in batch (SURVEY.md §2.10)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_UNITS = {"second", "minute", "hour", "day", "week", "month", "year"}


def bucket_ts(col: pa.ChunkedArray | pa.Array, unit: str = "hour") -> pa.ChunkedArray:
    """Truncate timestamps to a bucket boundary. Matches DuckDB
    ``date_trunc(unit, ts)`` for naive timestamps."""
    if unit not in _UNITS:
        raise ValueError(f"unsupported bucket unit: {unit}")
    return pc.floor_temporal(col, unit=unit)
