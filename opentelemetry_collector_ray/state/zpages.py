"""zpages analog — a self-contained diagnostics page for a batch run.

The reference's zpagesextension (``extension/zpagesextension/``) serves
live ``/debug/pipelinez`` / ``/debug/featurez`` HTML over HTTP while the
collector runs. A batch engine's natural analog is a POST-RUN artifact:
the same information — pipeline components with their counter values and
accounting identities, feature gates, the registered component factories
— rendered once from data-derived counters (``state/metrics.py``) into a
static HTML file next to the run's output. No server: the no-network
policy that refuses the ``http(s):`` confmap provider applies to serving
too; a file:// page keeps the introspection story without a socket.
"""

from __future__ import annotations

import html
import time

_CSS = """
body{font-family:sans-serif;margin:2em;color:#222}
h1{font-size:1.3em}h2{font-size:1.1em;margin-top:1.6em}
table{border-collapse:collapse;margin:.5em 0}
td,th{border:1px solid #bbb;padding:.25em .6em;text-align:left;
font-size:.9em}th{background:#eee}
.ok{color:#070}.bad{color:#b00;font-weight:bold}
.muted{color:#777;font-size:.85em}
"""


def _table(headers, rows) -> str:
    h = "".join(f"<th>{html.escape(str(c))}</th>" for c in headers)
    body = "".join(
        "<tr>" + "".join(f"<td>{html.escape(str(c))}</td>" for c in r)
        + "</tr>" for r in rows)
    return f"<table><tr>{h}</tr>{body}</table>"


def render_zpages(telemetry=None, gates=None, components=None,
                  run_info: dict | None = None,
                  timestamp: float | None = None) -> str:
    """One self-contained HTML diagnostics page.

    ``telemetry``: a ``state.metrics.telemetry_table`` Arrow table
    (pipelinez section — per-component counters plus the accounting
    identity verdict). ``gates``: a ``config.FeatureGateRegistry``
    (featurez section). ``components``: iterable of registered factory
    type names (componentz section). ``run_info``: free-form run
    metadata (dict of str → str). ``timestamp``: unix seconds for the
    page header (pass explicitly in deterministic contexts)."""
    parts = ["<!doctype html><html><head><meta charset='utf-8'>"
             "<title>zpages</title><style>", _CSS, "</style></head><body>",
             "<h1>Pipeline diagnostics (zpages analog)</h1>"]
    if timestamp is not None:
        stamp = time.strftime("%Y-%m-%d %H:%M:%SZ", time.gmtime(timestamp))
        parts.append(f"<div class='muted'>generated {stamp}</div>")
    if run_info:
        parts.append("<h2>runz</h2>")
        parts.append(_table(["key", "value"], sorted(run_info.items())))
    if telemetry is not None:
        parts.append("<h2>pipelinez</h2>")
        rows = zip(telemetry.column("component").to_pylist(),
                   telemetry.column("kind").to_pylist(),
                   telemetry.column("counter").to_pylist(),
                   telemetry.column("items").to_pylist())
        parts.append(_table(["component", "kind", "counter", "items"],
                            rows))
        from .metrics import check_telemetry_identities

        try:
            check_telemetry_identities(telemetry)
            parts.append("<div class='ok'>counter identities: OK "
                         "(produced(k) == consumed(k+1); "
                         "connector.produced == &Sigma; exporter.consumed)"
                         "</div>")
        except AssertionError as err:
            parts.append(
                f"<div class='bad'>counter identities: VIOLATED — "
                f"{html.escape(str(err))}</div>")
    if gates is not None:
        parts.append("<h2>featurez</h2>")
        rows = [(name, g["stage"], "on" if g["enabled"] else "off")
                for name, g in sorted(gates._gates.items())]
        parts.append(_table(["gate", "stage", "enabled"], rows))
    if components is not None:
        parts.append("<h2>componentz</h2>")
        parts.append(_table(["registered factory type"],
                            [(c,) for c in sorted(components)]))
    parts.append("</body></html>")
    return "".join(parts)


def write_zpages(path: str, **kwargs) -> str:
    """Render and write the diagnostics page; returns the path."""
    page = render_zpages(**kwargs)
    with open(path, "w", encoding="utf-8") as f:
        f.write(page)
    return path
