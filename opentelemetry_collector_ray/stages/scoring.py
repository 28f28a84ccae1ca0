"""Model-scoring stage — the batched-inference pattern for quality
classifiers at corpus scale.

The shape every learned quality/toxicity/language scorer shares:
1. weights live in the object store (``ray.put`` ONCE, driver-side),
2. each actor fetches them ONCE in ``__init__`` (model load),
3. ``__call__`` scores a whole batch with one matmul — never per row.

The bundled model is a deterministic integer LINEAR scorer over feature
columns, which keeps the oracle exact (the same dot product is one SQL
expression) while exercising the full broadcast + actor-pool + batched
matmul plumbing a real (np/onnx) model would use. Swap ``weights`` for a
real matrix and ``__call__`` stays the same.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


class LinearScorerStage:
    """score = sum_i weights[col_i] * col_i + bias (int64, exact).

    Pass ``weights_ref`` (an ``ray.put`` ObjectRef of the weights dict)
    for the broadcast path: fetched once per actor, shared across all of
    the actor's batches."""

    def __init__(self, weights: dict[str, int] | None = None,
                 weights_ref=None, bias: int = 0,
                 out_col: str = "score"):
        if weights is None:
            import ray

            weights = ray.get(weights_ref)  # broadcast fetch, once/actor
        self.cols = list(weights)
        self.w = np.array([weights[c] for c in self.cols], np.int64)
        self.bias = int(bias)
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch.append_column(self.out_col,
                                       pa.nulls(0, pa.int64()))
        X = np.empty((n, len(self.cols)), np.int64)
        for j, c in enumerate(self.cols):
            X[:, j] = batch.column(c).to_numpy(zero_copy_only=False)
        score = X @ self.w + self.bias  # ONE matmul per batch
        return batch.append_column(self.out_col, pa.array(score))


def score(ds: ray.data.Dataset, weights: dict[str, int], bias: int = 0,
          out_col: str = "score", concurrency=None,
          batch_size: int | None = None) -> ray.data.Dataset:
    """Actor-pool scoring: weights broadcast via ``ray.put`` when a pool
    is requested; plain fused task otherwise."""
    if concurrency:
        import ray

        ref = ray.put(weights)
        return ds.map_batches(
            LinearScorerStage,
            fn_constructor_kwargs=dict(weights_ref=ref, bias=bias,
                                       out_col=out_col),
            batch_format="pyarrow", concurrency=concurrency,
            **({"batch_size": batch_size} if batch_size else {}))
    return ds.map_batches(LinearScorerStage(weights, bias=bias,
                                            out_col=out_col),
                          batch_format="pyarrow")
