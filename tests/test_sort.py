"""Global sample sort: total order, rank, ties, nulls, directions."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from opentelemetry_collector_ray.stages.sort import global_sort


def _make(tbl: pa.Table, blocks: int = 5):
    return lambda: ray.data.from_arrow(tbl).repartition(blocks)


def _expected_order(tbl, keys, desc):
    spec = [(k, "descending" if d else "ascending")
            for k, d in zip(keys, desc)]
    return tbl.sort_by(spec)


def test_global_sort_total_order_with_rank(ray_session):
    rng = np.random.default_rng(7)
    n = 5000
    tbl = pa.table({
        "k": pa.array(rng.integers(0, 800, n)),
        "tie": pa.array(rng.integers(0, 10, n)),
        "id": pa.array(np.arange(n)),
    })
    out = global_sort(_make(tbl, 7), ["k", "id"], descending=False,
                      rank_col="rnk").to_pandas()
    exp = _expected_order(tbl, ["k", "id"], [False, False]).to_pandas()
    got = out.sort_values("rnk").reset_index(drop=True)
    assert list(got["rnk"]) == list(range(n))
    assert got["k"].tolist() == exp["k"].tolist()
    assert got["id"].tolist() == exp["id"].tolist()


def test_global_sort_descending_and_multikey(ray_session):
    rng = np.random.default_rng(11)
    n = 3000
    tbl = pa.table({
        "price": pa.array(rng.integers(0, 500, n)),
        "id": pa.array(np.arange(n)),
    })
    out = global_sort(_make(tbl, 6), ["price", "id"],
                      descending=[True, False],
                      rank_col="rnk").to_pandas()
    exp = _expected_order(tbl, ["price", "id"],
                          [True, False]).to_pandas()
    got = out.sort_values("rnk").reset_index(drop=True)
    assert got["price"].tolist() == exp["price"].tolist()
    assert got["id"].tolist() == exp["id"].tolist()


def test_global_sort_strings_and_nulls_last(ray_session):
    vals = ["pear", None, "apple", "fig", None, "kiwi", "apple", "date"]
    tbl = pa.table({"s": pa.array(vals, pa.string()),
                    "id": pa.array(range(len(vals)))})
    out = global_sort(_make(tbl, 3), ["s", "id"], rank_col="rnk"
                      ).to_pandas().sort_values("rnk")
    got = out["s"].tolist()
    nn = [v for v in got if v is not None]
    assert nn == sorted(nn)
    # nulls occupy the final ranks (Arrow/DuckDB nulls-last default)
    assert got[-2:] == [None, None] or (got[-1] is None and got[-2] is None)


def test_global_sort_no_rank_streams_partitions(ray_session):
    rng = np.random.default_rng(3)
    tbl = pa.table({"k": pa.array(rng.integers(0, 100, 1000)),
                    "id": pa.array(np.arange(1000))})
    ds = global_sort(_make(tbl, 4), ["k", "id"])
    t = ds.to_pandas()
    assert len(t) == 1000
    assert "_part" not in t.columns and "_lrank" not in t.columns


def test_global_sort_heavy_ties_single_value(ray_session):
    # every row identical primary key: all land in ONE partition; the
    # tie-break key still yields a deterministic total order
    tbl = pa.table({"k": pa.array([42] * 500),
                    "id": pa.array(np.arange(500)[::-1].copy())})
    out = global_sort(_make(tbl, 5), ["k", "id"], rank_col="rnk"
                      ).to_pandas().sort_values("rnk")
    assert out["id"].tolist() == list(range(500))


def test_global_sort_empty(ray_session):
    tbl = pa.table({"k": pa.array([], pa.int64()),
                    "id": pa.array([], pa.int64())})
    ds = global_sort(lambda: ray.data.from_arrow(tbl), ["k"],
                     rank_col="rnk")
    assert len(ds.to_pandas()) == 0
    # empty path keeps the promised DATASET schema (review finding):
    # input columns + rank, internal columns absent (Ray's to_pandas
    # drops columns on fully-empty datasets, so assert on the schema)
    names = ds.schema().names
    assert names == ["k", "id", "rnk"]


def test_global_sort_bad_descending_len(ray_session):
    with pytest.raises(ValueError):
        global_sort(lambda: ray.data.range(3), ["id"],
                    descending=[True, False])


def test_global_sort_property_vs_duckdb(ray_session):
    """Randomized parity: rank column equals DuckDB row_number() over
    mixed-sign ints and strings with heavy duplicates, across block
    layouts and directions."""
    import duckdb

    rng = np.random.default_rng(17)
    for trial in range(4):
        n = int(rng.integers(50, 400))
        tbl = pa.table({
            "a": pa.array(rng.integers(-20, 20, n)),
            "s": pa.array(rng.choice(["x", "yy", "z", "pp", "q"], n)),
            "id": pa.array(np.arange(n)),
        })
        desc = bool(trial % 2)
        blocks = int(rng.integers(1, 8))
        out = global_sort(_make(tbl, blocks), ["a", "s", "id"],
                          descending=[desc, False, False],
                          rank_col="rnk").to_pandas()
        con = duckdb.connect()
        con.register("t", tbl)
        o = con.execute(f"""
            SELECT a, s, id, CAST(row_number() OVER (ORDER BY
                a {'DESC' if desc else 'ASC'}, s, id) - 1 AS BIGINT)
                AS rnk FROM t""").fetchdf()
        got = out.sort_values("rnk").reset_index(drop=True)
        exp = o.sort_values("rnk").reset_index(drop=True)
        assert got[["a", "s", "id", "rnk"]].equals(
            exp[["a", "s", "id", "rnk"]]), (trial, desc, blocks)
