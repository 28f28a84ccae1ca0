"""zpages-analog diagnostics page (state/zpages.py): pipelinez counters
with identity verdict, featurez gates, componentz registry."""

import pyarrow as pa

from opentelemetry_collector_ray.config import FeatureGateRegistry
from opentelemetry_collector_ray.state.metrics import telemetry_table
from opentelemetry_collector_ray.state.zpages import (render_zpages,
                                                      write_zpages)


def _telemetry(ok=True):
    per_route = {"left": 30, "right": 70} if ok else {"left": 30,
                                                     "right": 60}
    return telemetry_table(100, per_route, processors=["parse", "enrich"])


def test_render_sections_and_identity_ok():
    gates = FeatureGateRegistry()
    gates.register("engine.newThing", "alpha")
    gates.register("engine.stableThing", "stable")
    page = render_zpages(telemetry=_telemetry(True), gates=gates,
                         components=["parse", "route", "parquet_sink"],
                         run_info={"input": "sf0.001", "cpus": "4"},
                         timestamp=1_700_000_000)
    assert "pipelinez" in page and "featurez" in page \
        and "componentz" in page and "runz" in page
    assert "counter identities: OK" in page
    assert "otelcol.receiver.produced.items" in page
    assert "engine.newThing" in page and "alpha" in page
    assert "2023-11-14" in page  # deterministic timestamp rendering


def test_render_identity_violation_is_loud():
    page = render_zpages(telemetry=_telemetry(False))
    assert "VIOLATED" in page
    assert "class='bad'" in page


def test_write_zpages_roundtrip(tmp_path):
    p = write_zpages(str(tmp_path / "zpages.html"),
                     telemetry=_telemetry(True))
    text = open(p, encoding="utf-8").read()
    assert text.startswith("<!doctype html>")
    assert "exporter.consumed" in text


def test_html_escaping():
    t = telemetry_table(1, {"<script>": 1}, processors=[])
    page = render_zpages(telemetry=t)
    assert "<script>" not in page and "&lt;script&gt;" in page
