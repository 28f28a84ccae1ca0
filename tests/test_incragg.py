"""Incremental aggregate-view maintenance (stages/incragg.py):
maintained state ≡ full recompute, changelog contract violations fail
loudly, zero-count keys vanish."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from opentelemetry_collector_ray.stages.aggregate import grouped_agg
from opentelemetry_collector_ray.stages.incragg import apply_agg_delta


def _facts(n=6000, keys=23, seed=5):
    rng = np.random.default_rng(seed)
    return pa.table({
        "k": pa.array(rng.integers(0, keys, n).astype("str")),
        "id": pa.array(np.arange(n)),
        "v": pa.array(rng.integers(-100, 500, n)),
    })


def _agg_pdf(tbl: pa.Table):
    df = tbl.to_pandas().groupby("k").agg(
        n=("v", "size"), sv=("v", "sum")).reset_index()
    return df.sort_values("k").reset_index(drop=True)


def test_delta_apply_equals_recompute(ray_session):
    tbl = _facts()
    ids = tbl.column("id").to_numpy()
    base = tbl.filter(pa.array(ids % 10 < 8))
    ins = tbl.filter(pa.array(ids % 10 >= 8))
    dels = base.filter(pa.array(
        base.column("id").to_numpy() % 9 == 0))
    chg = pa.concat_tables([
        ins.append_column("op", pa.array(np.ones(ins.num_rows, np.int64))),
        dels.append_column("op", pa.array(
            -np.ones(dels.num_rows, np.int64)))])
    base_agg = grouped_agg(ray.data.from_arrow(base).repartition(4),
                           ["k"], count_name="n", sum_cols={"sv": "v"})
    got = apply_agg_delta(
        base_agg, ray.data.from_arrow(chg).repartition(3), ["k"],
        count_name="n", sum_cols={"sv": "v"}).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    eff_ids = tbl.to_pandas()
    keep = ((eff_ids["id"] % 10 < 8) & (eff_ids["id"] % 9 != 0)) | \
        (eff_ids["id"] % 10 >= 8)
    want = _agg_pdf(pa.Table.from_pandas(eff_ids[keep][["k", "id", "v"]]))
    assert got["k"].tolist() == want["k"].tolist()
    assert got["n"].tolist() == want["n"].tolist()
    assert got["sv"].tolist() == want["sv"].tolist()


def test_zero_count_keys_dropped(ray_session):
    base = pa.table({"k": ["a", "b"], "v": [5, 7]})
    base_agg = grouped_agg(ray.data.from_arrow(base), ["k"],
                           count_name="n", sum_cols={"sv": "v"})
    chg = pa.table({"k": ["a"], "v": [5], "op": [-1]})
    got = apply_agg_delta(base_agg, ray.data.from_arrow(chg), ["k"],
                          count_name="n",
                          sum_cols={"sv": "v"}).to_pandas()
    assert got["k"].tolist() == ["b"]
    assert got["n"].tolist() == [1] and got["sv"].tolist() == [7]


def test_over_delete_raises(ray_session):
    base = pa.table({"k": ["a"], "v": [5]})
    base_agg = grouped_agg(ray.data.from_arrow(base), ["k"],
                           count_name="n", sum_cols={"sv": "v"})
    chg = pa.table({"k": ["a", "a"], "v": [5, 5], "op": [-1, -1]})
    with pytest.raises(Exception, match="over-delete"):
        apply_agg_delta(base_agg, ray.data.from_arrow(chg), ["k"],
                        count_name="n",
                        sum_cols={"sv": "v"}).to_pandas()


def test_changelog_contract_validation(ray_session):
    base = pa.table({"k": ["a"], "v": [5]})
    base_agg = grouped_agg(ray.data.from_arrow(base), ["k"],
                           count_name="n", sum_cols={"sv": "v"})
    with pytest.raises(Exception, match="must be \\+1 or -1"):
        apply_agg_delta(
            base_agg,
            ray.data.from_arrow(pa.table(
                {"k": ["a"], "v": [5], "op": [2]})),
            ["k"], count_name="n", sum_cols={"sv": "v"}).to_pandas()
    with pytest.raises(Exception, match="has nulls"):
        apply_agg_delta(
            base_agg,
            ray.data.from_arrow(pa.table({
                "k": ["a"], "v": pa.array([None], pa.int64()),
                "op": [1]})),
            ["k"], count_name="n", sum_cols={"sv": "v"}).to_pandas()
    with pytest.raises(Exception, match="must be integer"):
        apply_agg_delta(
            base_agg,
            ray.data.from_arrow(pa.table(
                {"k": ["a"], "v": [5.0], "op": [1]})),
            ["k"], count_name="n", sum_cols={"sv": "v"}).to_pandas()
    with pytest.raises(ValueError, match="collide"):
        apply_agg_delta(base_agg, base_agg, ["n"], count_name="n")


def test_agg_delta_yaml_parity(ray_session, tmp_path):
    """YAML agg_delta (base view from parquet) == direct call."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_ray.config import PipelineConfig
    from opentelemetry_collector_ray.pipelines.builder import build_dataset

    base = pa.table({"k": ["a", "b"], "v": [5, 7]})
    base_agg = grouped_agg(ray.data.from_arrow(base), ["k"],
                           count_name="n", sum_cols={"sv": "v"})
    bdir = tmp_path / "base"
    base_agg.write_parquet(str(bdir))
    chg = pa.table({"k": ["a", "c"], "v": [9, 4], "op": [1, 1]})
    cpath = tmp_path / "chg.parquet"
    pq.write_table(chg, str(cpath))

    y = build_dataset(PipelineConfig.from_dict({
        "receivers": {"parquet": {"paths": str(cpath)}},
        "processors": {"agg_delta": {
            "keys": ["k"], "base_path": str(bdir),
            "count_name": "n", "sum_cols": {"sv": "v"}}},
        "exporters": {"debug": {}},
        "service": {"pipelines": {"logs": {
            "receivers": ["parquet"], "processors": ["agg_delta"],
            "exporters": ["debug"]}}},
    })).to_pandas().sort_values("k").reset_index(drop=True)
    d = apply_agg_delta(
        ray.data.read_parquet(str(bdir)),
        ray.data.read_parquet(str(cpath)), ["k"], count_name="n",
        sum_cols={"sv": "v"}).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert y.equals(d)
    assert y["k"].tolist() == ["a", "b", "c"]
    assert y["n"].tolist() == [2, 1, 1]
    assert y["sv"].tolist() == [14, 7, 4]
