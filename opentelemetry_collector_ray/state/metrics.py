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


def telemetry_table(rows_in: int, per_route: dict[str, int],
                    processors: list | None = None,
                    receiver: str = "parquet", connector: str = "route",
                    dropped: int = 0):
    """The reference's self-telemetry counters as ONE queryable Arrow
    table (component, kind, counter, items) — the zpages/metrics-reader
    analog for a batch engine, derived from data/manifest counts rather
    than execution hooks (fusion-proof).

    Counter names mirror ``service/documentation.md:9-101``:
    receiver.produced / processor.consumed+produced /
    connector.consumed+produced / exporter.consumed ``.items``.

    ``processors`` is a list of names (row-preserving stages: consumed ==
    produced == upstream produced) or ``(name, consumed, produced)``
    triples for row-changing stages (filter/sample). The router-connector
    drops ``dropped`` rows (no matching sink and no default)."""
    import pyarrow as pa

    rows = []

    def emit(component, kind, counter, items):
        rows.append((component, kind, f"otelcol.{counter}.items",
                     int(items)))

    emit(receiver, "receiver", "receiver.produced", rows_in)
    upstream = rows_in
    for p in (processors or []):
        if isinstance(p, str):
            name, consumed, produced = p, upstream, upstream
        else:
            name, consumed, produced = p
        emit(name, "processor", "processor.consumed", consumed)
        emit(name, "processor", "processor.produced", produced)
        upstream = produced
    emit(connector, "connector", "connector.consumed", upstream)
    emit(connector, "connector", "connector.produced",
         upstream - int(dropped))
    for route, n in sorted(per_route.items()):
        emit(f"parquet_sink/{route}", "exporter", "exporter.consumed", n)
    cols = list(zip(*rows))
    return pa.table({"component": pa.array(cols[0], pa.string()),
                     "kind": pa.array(cols[1], pa.string()),
                     "counter": pa.array(cols[2], pa.string()),
                     "items": pa.array(cols[3], pa.int64())})


def check_telemetry_identities(t) -> None:
    """Assert the reference's accounting identities over a
    ``telemetry_table``: produced(stage k) == consumed(stage k+1) along
    the receiver → processors → connector chain, and connector.produced
    == Σ exporter.consumed (per-sink counts account for every routed
    row). Raises AssertionError naming the broken link."""
    comp = t.column("component").to_pylist()
    counter = t.column("counter").to_pylist()
    items = t.column("items").to_pylist()
    chain = []  # (component, consumed, produced) in pipeline order
    for c, k, n in zip(comp, counter, items):
        if k.endswith("receiver.produced.items"):
            chain.append((c, n, n))
        elif k.endswith("processor.consumed.items") \
                or k.endswith("connector.consumed.items"):
            chain.append((c, n, None))
        elif k.endswith(".produced.items"):
            c0, cons, _ = chain[-1]
            chain[-1] = (c0, cons, n)
    for (c0, _, prod), (c1, cons, _) in zip(chain, chain[1:]):
        if prod != cons:
            raise AssertionError(
                f"counter identity violated: {c0}.produced={prod} != "
                f"{c1}.consumed={cons}")
    exporter_sum = sum(n for k, n in zip(counter, items)
                       if k == "otelcol.exporter.consumed.items")
    produced_last = chain[-1][2]
    if produced_last != exporter_sum:
        raise AssertionError(
            f"counter identity violated: connector.produced="
            f"{produced_last} != Σ exporter.consumed={exporter_sum}")
