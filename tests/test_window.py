"""Per-key window functions (stages/window.py) vs a pandas reference
and edge semantics (partition edges, single-row keys, empty)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from opentelemetry_collector_ray.stages.window import per_key_window


def _make(n=3000, keys=40, seed=2):
    rng = np.random.default_rng(seed)
    return pa.table({
        "k": pa.array(rng.integers(0, keys, n).astype("str")),
        "o": pa.array(rng.permutation(n)),
        "v": pa.array(rng.integers(-50, 50, n)),
    })


def test_window_ops_match_pandas(ray_session):
    tbl = _make()
    out = per_key_window(
        ray.data.from_arrow(tbl).repartition(5), "k", ["o"],
        {"prev": ("lag", "v"), "nxt": ("lead", "v"),
         "d": ("delta", "v"), "cum": ("cumsum", "v"),
         "rn": ("row_number",)},
        n_buckets=8).to_pandas().sort_values(["k", "o"]).reset_index(
        drop=True)
    ref = tbl.to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    g = ref.groupby("k")["v"]
    assert np.array_equal(out["prev"].to_numpy(dtype=float),
                          g.shift(1).to_numpy(dtype=float),
                          equal_nan=True)
    assert np.array_equal(out["nxt"].to_numpy(dtype=float),
                          g.shift(-1).to_numpy(dtype=float),
                          equal_nan=True)
    assert np.array_equal(out["d"].to_numpy(dtype=float),
                          (ref["v"] - g.shift(1)).to_numpy(dtype=float),
                          equal_nan=True)
    assert out["cum"].tolist() == g.cumsum().tolist()
    assert out["rn"].tolist() == ref.groupby("k").cumcount().tolist()


def test_window_single_row_partitions(ray_session):
    tbl = pa.table({"k": ["a", "b", "c"], "o": [1, 1, 1],
                    "v": [10, 20, 30]})
    out = per_key_window(ray.data.from_arrow(tbl), "k", ["o"],
                         {"prev": ("lag", "v"), "nxt": ("lead", "v"),
                          "rn": ("row_number",)}).to_pandas()
    assert out["prev"].isna().all() and out["nxt"].isna().all()
    assert out["rn"].tolist() == [0, 0, 0]


def test_rolling_range_frames_match_duckdb(ray_session):
    """rolling_sum / rolling_count = SQL RANGE BETWEEN w PRECEDING AND
    CURRENT ROW (ties included) — randomized DuckDB parity over int,
    float and timestamp order columns."""
    import duckdb
    rng = np.random.default_rng(11)
    n = 4000
    tbl = pa.table({
        "k": pa.array(rng.integers(0, 37, n)),
        "o": pa.array(rng.integers(0, 400, n).astype(np.int64)),
        "v": pa.array(rng.integers(-100, 100, n).astype(np.int64)),
        "rid": pa.array(np.arange(n)),
    })
    out = per_key_window(
        ray.data.from_arrow(tbl).repartition(6), "k", ["o", "rid"],
        {"rs": ("rolling_sum", "v", 40), "rc": ("rolling_count", 40),
         "rs0": ("rolling_sum", "v", 0)},
        n_buckets=8).to_pandas().sort_values("rid").reset_index(drop=True)
    exp = duckdb.sql("""
        SELECT rid,
          CAST(sum(v) OVER w AS BIGINT) AS rs,
          CAST(count(*) OVER w AS BIGINT) AS rc,
          CAST(sum(v) OVER (PARTITION BY k ORDER BY o RANGE BETWEEN
               0 PRECEDING AND CURRENT ROW) AS BIGINT) AS rs0
        FROM tbl WINDOW w AS (PARTITION BY k ORDER BY o
             RANGE BETWEEN 40 PRECEDING AND CURRENT ROW)
        ORDER BY rid""").df()
    for c in ("rs", "rc", "rs0"):
        assert out[c].tolist() == exp[c].tolist(), c

    ts = pa.array((tbl.column("o").to_numpy() * 1000).astype(
        "datetime64[us]"))
    tblt = pa.table({"k": tbl.column("k"), "ts": ts,
                     "v": pa.array(rng.normal(size=n)),
                     "rid": tbl.column("rid")})
    outt = per_key_window(
        ray.data.from_arrow(tblt).repartition(6), "k", ["ts", "rid"],
        {"rs": ("rolling_sum", "v", 40_000),
         "rc": ("rolling_count", 40_000)},
        n_buckets=8).to_pandas().sort_values("rid").reset_index(drop=True)
    expt = duckdb.sql("""
        SELECT rid, sum(v) OVER w AS rs,
               CAST(count(*) OVER w AS BIGINT) AS rc
        FROM tblt WINDOW w AS (PARTITION BY k ORDER BY ts RANGE BETWEEN
             INTERVAL 40 MILLISECONDS PRECEDING AND CURRENT ROW)
        ORDER BY rid""").df()
    assert outt["rc"].tolist() == expt["rc"].tolist()
    assert np.allclose(outt["rs"].to_numpy(), expt["rs"].to_numpy())


def test_rank_dense_rank_ntile_match_duckdb(ray_session):
    """rank / dense_rank (peers = full order_by tuple, incl. string
    tie-break columns) and ntile vs DuckDB. ntile is order-dependent
    among ties, so the tied case compares tile-size distributions and
    the unique-order case compares exactly."""
    import duckdb
    rng = np.random.default_rng(13)
    n = 9000
    tbl = pa.table({
        "k": pa.array(rng.choice(["a", "b", "c", "d"], n)),
        "o": pa.array(rng.integers(0, 80, n).astype(np.int64)),
        "o2": pa.array(rng.choice(["u", "v"], n)),
        "rid": pa.array(np.arange(n)),
    })
    out = per_key_window(
        ray.data.from_arrow(tbl).repartition(5), "k", ["o", "o2"],
        {"rk": ("rank",), "dr": ("dense_rank",), "nt": ("ntile", 7)},
        n_buckets=4).to_pandas().sort_values("rid").reset_index(drop=True)
    exp = duckdb.sql("""
        SELECT rid, CAST(rank() OVER w AS BIGINT) rk,
               CAST(dense_rank() OVER w AS BIGINT) dr
        FROM tbl WINDOW w AS (PARTITION BY k ORDER BY o, o2)
        ORDER BY rid""").df()
    assert out["rk"].tolist() == exp["rk"].tolist()
    assert out["dr"].tolist() == exp["dr"].tolist()
    sizes = out.groupby(["k", "nt"]).size().sort_index()
    expsz = duckdb.sql("""
        SELECT k, CAST(ntile(7) OVER (PARTITION BY k ORDER BY o, o2)
               AS BIGINT) nt FROM tbl""").df() \
        .groupby(["k", "nt"]).size().sort_index()
    assert sizes.tolist() == expsz.tolist()

    tblu = pa.table({"k": pa.array(rng.choice(["a", "b"], 997)),
                     "o": pa.array(rng.permutation(997)),
                     "rid": pa.array(np.arange(997))})
    outu = per_key_window(
        ray.data.from_arrow(tblu).repartition(3), "k", ["o"],
        {"nt": ("ntile", 5)}).to_pandas().sort_values("rid")
    expu = duckdb.sql("""
        SELECT rid, CAST(ntile(5) OVER (PARTITION BY k ORDER BY o)
               AS BIGINT) nt FROM tblu ORDER BY rid""").df()
    assert outu["nt"].tolist() == expu["nt"].tolist()

    with pytest.raises(ValueError, match="no arguments"):
        per_key_window(ray.data.range(3), "id", ["id"],
                       {"x": ("rank", "id")})
    with pytest.raises(ValueError, match="tile count"):
        per_key_window(ray.data.range(3), "id", ["id"],
                       {"x": ("ntile", 0)})


def test_rolling_validation(ray_session):
    ds = ray.data.from_arrow(pa.table(
        {"k": ["a"], "o": [1], "v": [1], "s": ["x"]}))
    with pytest.raises(ValueError, match="rolling_sum takes"):
        per_key_window(ds, "k", ["o"], {"x": ("rolling_sum", "v")})
    with pytest.raises(ValueError, match="rolling_count takes"):
        per_key_window(ds, "k", ["o"], {"x": ("rolling_count",)})
    with pytest.raises(ValueError, match="window must be"):
        per_key_window(ds, "k", ["o"], {"x": ("rolling_count", -5)})
    with pytest.raises(Exception, match="integer or.*timestamp|timestamp"):
        per_key_window(ds, "k", ["s"],
                       {"x": ("rolling_count", 1)}).to_pandas()
    withnull = pa.table({"k": ["a", "a"],
                         "o": pa.array([1, None], pa.int64()),
                         "v": [1, 2]})
    with pytest.raises(Exception, match="has nulls"):
        per_key_window(ray.data.from_arrow(withnull), "k", ["o"],
                       {"x": ("rolling_count", 1)}).to_pandas()


def test_rolling_sum_nan_and_rank_null_guards(ray_session):
    """Review findings: a NaN value poisons prefix-sum rolling frames →
    loud error; null/NaN ORDER values break rank peer detection →
    loud error."""
    withnan = pa.table({"k": ["a", "a"], "o": pa.array([1, 2], pa.int64()),
                        "v": pa.array([1.0, float("nan")])})
    with pytest.raises(Exception, match="has NaNs"):
        per_key_window(ray.data.from_arrow(withnan), "k", ["o"],
                       {"rs": ("rolling_sum", "v", 10)}).to_pandas()
    nullorder = pa.table({"k": ["a", "a"],
                          "o": pa.array([1, None], pa.int64())})
    with pytest.raises(Exception, match="has nulls"):
        per_key_window(ray.data.from_arrow(nullorder), "k", ["o"],
                       {"r": ("rank",)}).to_pandas()
    nanorder = pa.table({"k": ["a", "a"],
                         "o": pa.array([1.0, float("nan")])})
    with pytest.raises(Exception, match="has NaNs"):
        per_key_window(ray.data.from_arrow(nanorder), "k", ["o"],
                       {"r": ("dense_rank",)}).to_pandas()


def test_window_bad_spec(ray_session):
    ds = ray.data.range(3)
    with pytest.raises(ValueError):
        per_key_window(ds, "id", ["id"], {"x": ("median", "id")})
    with pytest.raises(ValueError):
        per_key_window(ds, "id", ["id"], {"x": ("lag",)})


def test_window_temporal_delta_and_null_guard(ray_session):
    """Review findings: delta over timestamps yields int64 gaps (column
    unit); null value columns are rejected loudly, not silently wrong."""
    ts = pa.array(np.array(["2026-01-01T00:00:00", "2026-01-01T00:00:05",
                            "2026-01-01T00:01:00"], "datetime64[us]"))
    tbl = pa.table({"k": ["a", "a", "a"], "o": [1, 2, 3], "ts": ts})
    out = per_key_window(ray.data.from_arrow(tbl), "k", ["o"],
                         {"gap_us": ("delta", "ts"),
                          "prev_ts": ("lag", "ts")}).to_pandas()
    out = out.sort_values("o")
    assert out["gap_us"].tolist()[1:] == [5_000_000, 55_000_000]
    assert pd.isna(out["gap_us"].iloc[0])
    assert out["prev_ts"].iloc[1] == pd.Timestamp("2026-01-01T00:00:00")

    withnull = pa.table({"k": ["a", "a"], "o": [1, 2],
                         "v": pa.array([1, None], pa.int64())})
    with pytest.raises(Exception, match="has\\s+nulls|has .?nulls"):
        per_key_window(ray.data.from_arrow(withnull), "k", ["o"],
                       {"c": ("cumsum", "v")}).to_pandas()
    with pytest.raises(Exception, match="temporal"):
        per_key_window(ray.data.from_arrow(tbl), "k", ["o"],
                       {"c": ("cumsum", "ts")}).to_pandas()


def test_pctrank_cumedist_first_last_match_duckdb(ray_session):
    """percent_rank / cume_dist peer semantics and whole-partition
    first/last_value vs DuckDB, with planted ties."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from opentelemetry_collector_ray.stages.window import per_key_window

    rng = np.random.default_rng(9)
    n = 400
    tbl = pa.table({
        "id": pa.array(np.arange(n), pa.int64()),
        "k": pa.array(np.char.add("g", rng.integers(0, 7, n)
                                  .astype("U2"))),
        "v": pa.array(rng.integers(0, 12, n), pa.int64())})  # many ties
    out = per_key_window(
        ray.data.from_arrow(tbl).repartition(4), "k", ["v"], {
            "pct": ("percent_rank",), "cd": ("cume_dist",),
            "fv": ("first_value", "v"), "lv": ("last_value", "v"),
        }).to_pandas().sort_values("id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", tbl)
    want = con.execute("""
        SELECT id, percent_rank() OVER w AS pct, cume_dist() OVER w AS cd,
               first_value(v) OVER (PARTITION BY k ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND UNBOUNDED FOLLOWING) AS fv,
               last_value(v) OVER (PARTITION BY k ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND UNBOUNDED FOLLOWING) AS lv
        FROM t WINDOW w AS (PARTITION BY k ORDER BY v)
        ORDER BY id""").df()
    assert (out["pct"].values == want["pct"].values).all()
    assert (out["cd"].values == want["cd"].values).all()
    assert (out["fv"].values == want["fv"].values).all()
    assert (out["lv"].values == want["lv"].values).all()
    # single-row partition: percent_rank 0, cume_dist 1
    one = per_key_window(ray.data.from_arrow(pa.table({
        "id": pa.array([0], pa.int64()), "k": pa.array(["z"]),
        "v": pa.array([5], pa.int64())})), "k", ["v"], {
        "pct": ("percent_rank",), "cd": ("cume_dist",)}).to_pandas()
    assert one["pct"].iloc[0] == 0.0 and one["cd"].iloc[0] == 1.0


def test_ffill_matches_duckdb(ray_session):
    """LOCF forward fill vs last_value(... IGNORE NULLS); nulls before
    a partition's first observation stay null, keys never bleed."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from opentelemetry_collector_ray.stages.window import per_key_window

    rng = np.random.default_rng(13)
    n = 300
    vals = rng.integers(0, 100, n).astype(object)
    vals[rng.random(n) < 0.5] = None
    tbl = pa.table({
        "id": pa.array(np.arange(n), pa.int64()),
        "k": pa.array(np.char.add("g", rng.integers(0, 8, n)
                                  .astype("U2"))),
        "v": pa.array(list(vals), pa.int64())})
    out = per_key_window(
        ray.data.from_arrow(tbl).repartition(4), "k", ["id"],
        {"f": ("ffill", "v")}).to_pandas().sort_values("id")
    con = duckdb.connect()
    con.register("t", tbl)
    want = con.execute("""
        SELECT id, last_value(v IGNORE NULLS) OVER (
            PARTITION BY k ORDER BY id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f
        FROM t ORDER BY id""").df()
    got = out["f"].astype("object").where(out["f"].notna(), None).tolist()
    exp = want["f"].astype("object").where(want["f"].notna(), None).tolist()
    assert got == exp


def test_moving_rows_frames_match_duckdb(ray_session):
    """moving_sum / moving_count = SQL ROWS BETWEEN k PRECEDING AND
    CURRENT ROW — randomized DuckDB parity with a unique tie-break
    (a ROWS frame cuts through order ties, so determinism needs it)."""
    import duckdb

    rng = np.random.default_rng(11)
    n = 4000
    tbl = pa.table({
        "k": pa.array(rng.integers(0, 31, n).astype("str")),
        "o": pa.array(rng.integers(0, 200, n)),   # heavy ties
        "id": pa.array(np.arange(n)),
        "v": pa.array(rng.integers(-40, 60, n)),
    })
    for k in (0, 1, 5):
        out = per_key_window(
            ray.data.from_arrow(tbl).repartition(6), "k", ["o", "id"],
            {"ms": ("moving_sum", "v", k), "mc": ("moving_count", k)},
            n_buckets=8).to_pandas().sort_values(
            ["k", "id"]).reset_index(drop=True)
        ref = duckdb.sql(f"""
            SELECT k, id,
              CAST(sum(v) OVER w AS BIGINT) ms,
              CAST(count(*) OVER w AS BIGINT) mc
            FROM tbl WINDOW w AS (PARTITION BY k ORDER BY o, id
              ROWS BETWEEN {k} PRECEDING AND CURRENT ROW)
            """).df().sort_values(["k", "id"]).reset_index(drop=True)
        assert out["ms"].tolist() == ref["ms"].tolist(), f"k={k}"
        assert out["mc"].tolist() == ref["mc"].tolist(), f"k={k}"


def test_moving_validation(ray_session):
    tbl = pa.table({"k": ["a"], "o": [1], "v": [1]})
    ds = ray.data.from_arrow(tbl)
    with pytest.raises(ValueError, match="moving_sum takes"):
        per_key_window(ds, "k", ["o"], {"m": ("moving_sum", "v")})
    with pytest.raises(ValueError, match="window must be >= 0"):
        per_key_window(ds, "k", ["o"], {"m": ("moving_count", -1)})
    with pytest.raises(ValueError, match="temporal"):
        per_key_window(
            ray.data.from_arrow(pa.table({
                "k": ["a"], "o": [1],
                "t": pa.array([0], pa.timestamp("us"))})),
            "k", ["o"], {"m": ("moving_sum", "t", 2)}).to_pandas()


def test_lag_lead_offsets_match_duckdb(ray_session):
    """lag/lead with offset k == SQL lag(col, k)/lead(col, k)."""
    import duckdb

    rng = np.random.default_rng(23)
    n = 2000
    tbl = pa.table({
        "k": pa.array(rng.integers(0, 17, n).astype("str")),
        "o": pa.array(np.arange(n)),
        "v": pa.array(rng.integers(0, 999, n)),
    })
    out = per_key_window(
        ray.data.from_arrow(tbl).repartition(4), "k", ["o"],
        {"l2": ("lag", "v", 2), "f3": ("lead", "v", 3),
         "l1": ("lag", "v")}, n_buckets=8).to_pandas() \
        .sort_values(["k", "o"]).reset_index(drop=True)
    ref = duckdb.sql("""
        SELECT k, o, lag(v, 2) OVER w l2, lead(v, 3) OVER w f3,
               lag(v) OVER w l1
        FROM tbl WINDOW w AS (PARTITION BY k ORDER BY o)
        """).df().sort_values(["k", "o"]).reset_index(drop=True)
    for c in ("l2", "f3", "l1"):
        assert np.array_equal(out[c].to_numpy(dtype=float),
                              ref[c].to_numpy(dtype=float),
                              equal_nan=True), c
    with pytest.raises(ValueError, match="offset"):
        per_key_window(ray.data.from_arrow(tbl), "k", ["o"],
                       {"x": ("lag", "v", 0)})
