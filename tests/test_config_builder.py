"""Config layer (env expansion, validation, feature gates) + config-driven
resumable pipeline runner — confmap/otelcol + persistent-queue semantics."""

import glob
import os

import pytest

from opentelemetry_collector_ray.config import (
    ConfigError, FeatureGateRegistry, PipelineConfig, expand_env)


def test_expand_env(monkeypatch):
    monkeypatch.setenv("GRAFT_X", "hello")
    assert expand_env("${env:GRAFT_X}/suffix") == "hello/suffix"
    assert expand_env({"a": ["${env:GRAFT_X}"]}) == {"a": ["hello"]}
    assert expand_env("${env:GRAFT_UNSET_ZZ:-fallback}") == "fallback"
    with pytest.raises(ConfigError):
        expand_env("${env:GRAFT_UNSET_ZZ}")


def _raw(paths="/tmp/in"):
    return {
        "receivers": {"parquet": {"paths": paths}},
        "processors": {"parse": {}, "enrich": {}, "route": {}},
        "exporters": {"parquet_sink/out": {"path": "sinks"}},
        "service": {"pipelines": {"logs": {
            "receivers": ["parquet"],
            "processors": ["parse", "enrich", "route"],
            "exporters": ["parquet_sink/out"],
        }}},
    }


def test_config_validation():
    cfg = PipelineConfig.from_dict(_raw())
    assert cfg.pipeline["processors"] == ["parse", "enrich", "route"]
    bad = _raw()
    bad["service"]["pipelines"]["logs"]["processors"] = ["nope"]
    with pytest.raises(ConfigError):
        PipelineConfig.from_dict(bad)
    bad2 = _raw()
    bad2["service"]["pipelines"]["logs"]["exporters"] = []
    with pytest.raises(ConfigError):
        PipelineConfig.from_dict(bad2)


def test_feature_gates():
    g = FeatureGateRegistry()
    g.register("x.alpha", "alpha")
    g.register("y.stable", "stable")
    assert not g.enabled("x.alpha") and g.enabled("y.stable")
    g.set("x.alpha", True)
    assert g.enabled("x.alpha")
    with pytest.raises(ConfigError):
        g.set("y.stable", False)
    with pytest.raises(ConfigError):
        g.register("x.alpha", "beta")


def test_run_pipeline_resumable(ray_session, tmp_path):
    from opentelemetry_collector_ray.pipelines.builder import run_pipeline
    from opentelemetry_collector_ray.synth import write_turns_parquet

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    write_turns_parquet(src, sf=0.05, shards=3)
    cfg = PipelineConfig.from_dict(_raw(paths=src))
    r1 = run_pipeline(cfg, out)
    assert len(r1["ran"]) == 3 and not r1["skipped"]
    files = glob.glob(os.path.join(out, "part-*", "**", "*.parquet"),
                      recursive=True)
    assert files
    r2 = run_pipeline(cfg, out)  # resume: everything committed
    assert not r2["ran"] and len(r2["skipped"]) == 3
    # config change → different hash → full recompute
    cfg2 = PipelineConfig.from_dict(_raw(paths=src))
    cfg2.processors["route"] = {"default_sink": "other"}
    r3 = run_pipeline(cfg2, out)
    assert len(r3["ran"]) == 3
