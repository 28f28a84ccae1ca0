"""pivot / unpivot (stages/reshape.py): scatter correctness, strict
unknown-name guard, name/key clash, melt round-trip, type promotion."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from opentelemetry_collector_ray.stages.reshape import pivot, unpivot


def _long():
    return pa.table({
        "k": pa.array(["x", "x", "y", "y", "y"]),
        "name": pa.array(["a", "b", "a", "a", "c"]),
        "v": pa.array([1, 2, 3, 4, 5], pa.int64())})


def test_pivot_sums(ray_session):
    ds = ray.data.from_arrow(_long()).repartition(2)
    out = pivot(ds, ["k"], "name", "v", names=["a", "b", "c"]
                ).to_pandas().sort_values("k").reset_index(drop=True)
    assert out["a"].tolist() == [1, 7]
    assert out["b"].tolist() == [2, 0]
    assert out["c"].tolist() == [0, 5]


def test_pivot_strict_raises_on_unknown(ray_session):
    ds = ray.data.from_arrow(_long())
    with pytest.raises(Exception, match="unexpected"):
        pivot(ds, ["k"], "name", "v", names=["a", "b"]).to_pandas()
    # strict=False drops the unknown name
    out = pivot(ds, ["k"], "name", "v", names=["a", "b"],
                strict=False).to_pandas()
    assert sorted(out.columns) == ["a", "b", "k"]


def test_pivot_validation():
    ds = ray.data.from_arrow(_long())
    with pytest.raises(ValueError, match="duplicate"):
        pivot(ds, ["k"], "name", "v", names=["a", "a"])
    with pytest.raises(ValueError, match="collide"):
        pivot(ds, ["k"], "name", "v", names=["k"])


def test_unpivot_melt_and_types(ray_session):
    wide = pa.table({"id": pa.array([1, 2], pa.int64()),
                     "p": pa.array([10, 20], pa.int64()),
                     "q": pa.array([0.5, 1.5], pa.float64())})
    out = unpivot(ray.data.from_arrow(wide), ["id"], ["p", "q"]
                  ).to_pandas().sort_values(["id", "name"]
                                            ).reset_index(drop=True)
    assert len(out) == 4
    assert out["value"].dtype == np.float64  # promoted (mixed sources)
    assert out.loc[0, "name"] == "p" and out.loc[0, "value"] == 10.0
    ints = unpivot(ray.data.from_arrow(wide), ["id"], ["p"]).to_pandas()
    assert ints["value"].dtype == np.int64


def test_pivot_null_values_sum_as_zero(ray_session):
    tbl = pa.table({"k": pa.array(["x", "x"]),
                    "name": pa.array(["a", "a"]),
                    "v": pa.array([3, None], pa.int64())})
    out = pivot(ray.data.from_arrow(tbl), ["k"], "name", "v",
                names=["a"]).to_pandas()
    assert out["a"].tolist() == [3]
