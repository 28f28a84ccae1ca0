"""int8 embedding quantization (stages/embeddings.py): round-trip
error bound, cosine preservation, zero vectors, real table drive."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from opentelemetry_collector_ray.stages.embeddings import (
    dequantize_batch, dequantize_embeddings, quantize_batch,
    quantize_embeddings)
from opentelemetry_collector_ray.stages.similarity import _stack


def _tbl(n=100, d=16, seed=4):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d)).astype(np.float32)
    x[3] = 0.0  # planted zero vector
    return pa.table({
        "vec_id": pa.array(np.arange(n)),
        "embedding": pa.array(list(x), pa.list_(pa.float32())),
    }), x


def test_quantize_round_trip_error_bound():
    tbl, x = _tbl()
    q = quantize_batch(tbl)
    assert q.column("q8").type == pa.binary()
    back = dequantize_batch(q)
    y = _stack(back.column("embedding"))
    # symmetric int8: per-component error ≤ scale/2 = max|x|/254
    bound = np.abs(x).max(axis=1, keepdims=True) / 254.0 + 1e-7
    assert (np.abs(y - x) <= bound).all()
    # zero vector exactly preserved
    assert (y[3] == 0).all()


def test_quantize_preserves_cosine_ordering():
    tbl, x = _tbl(n=300, d=32, seed=9)
    y = _stack(dequantize_batch(quantize_batch(tbl)).column("embedding"))
    qv = x[7]
    def cos(m, v):
        nm = np.linalg.norm(m, axis=1) * np.linalg.norm(v) + 1e-12
        return (m @ v) / nm
    a = np.argsort(-cos(np.delete(x, 3, 0), qv))[:10]
    b = np.argsort(-cos(np.delete(y, 3, 0), qv))[:10]
    assert len(set(a[:10]) & set(b[:10])) >= 8  # top-10 mostly stable


def test_quantize_through_ray_exchange(ray_session):
    """The binary payload must survive a real Ray exchange (the reason
    it is binary, not list<int8>)."""
    tbl, x = _tbl(n=200, d=8)
    ds = quantize_embeddings(
        ray.data.from_arrow(tbl).repartition(4))
    # exchange: shuffle-repartition the quantized rows, then dequantize
    out = dequantize_embeddings(
        ds.repartition(3, shuffle=True)).to_pandas()
    assert len(out) == 200
    got = np.stack(out.sort_values("vec_id")["embedding"].to_numpy())
    bound = np.abs(x).max(axis=1, keepdims=True) / 254.0 + 1e-7
    assert (np.abs(got - x) <= bound).all()


def test_quantize_real_embeddings_table(ray_session):
    ds = ray.data.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    q = quantize_embeddings(ds).to_pandas()
    d = q["q8_dim"].iloc[0]
    assert all(len(b) == d for b in q["q8"].head(20))
    assert (q["q8_scale"] >= 0).all()


def test_dequantize_mixed_dim_rejected():
    tbl, _ = _tbl(n=4, d=8)
    q = quantize_batch(tbl)
    bad = q.set_column(q.column_names.index("q8_dim"), "q8_dim",
                       pa.array([8, 8, 4, 8], pa.int32()))
    with pytest.raises(ValueError, match="mixed q8_dim"):
        dequantize_batch(bad)
