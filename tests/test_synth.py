import numpy as np
import pyarrow as pa

from opentelemetry_collector_ray.schema import TURNS_SCHEMA, SchemaError, validate_turns
from opentelemetry_collector_ray.synth import synth_turns


def test_schema_and_determinism():
    t1 = synth_turns(sf=0.01, seed=42)
    t2 = synth_turns(sf=0.01, seed=42)
    assert t1.schema == TURNS_SCHEMA
    assert t1.equals(t2)  # byte-stable


def test_unique_contiguous_turn_idx():
    t = synth_turns(sf=0.05)
    df = t.to_pandas()
    for _, g in df.groupby("conv_id"):
        idx = np.sort(g["turn_idx"].to_numpy())
        assert (idx == np.arange(len(g))).all()


def test_edge_rows_present():
    t = synth_turns(sf=0.05)
    texts = t.column("text").to_pylist()
    assert "" in texts
    assert any(len(x) > 64 * 1024 for x in texts)
    assert any("ünïcødé" in x for x in texts)


def test_skew_present():
    t = synth_turns(sf=0.1)
    counts = t.to_pandas().groupby("conv_id").size()
    assert counts.max() > 5 * counts.median()


def test_validate_turns_rejects_missing():
    t = synth_turns(sf=0.01).drop_columns(["role"])
    try:
        validate_turns(t)
        raise AssertionError("expected SchemaError")
    except SchemaError:
        pass


def test_validate_casts():
    t = synth_turns(sf=0.01)
    t2 = t.set_column(1, "turn_idx", t.column("turn_idx").cast(pa.int64()))
    out = validate_turns(t2)
    assert out.schema == TURNS_SCHEMA
