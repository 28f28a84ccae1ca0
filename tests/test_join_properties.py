"""Property-based join correctness: random small tables, every join mode
compared against DuckDB running the equivalent SQL on the same data —
the joins' analog of the wire codecs' fuzz round-trip tests."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from opentelemetry_collector_ray.stages.join import (
    asof_join, range_join, shuffle_hash_join)

keys = st.lists(st.integers(0, 5), min_size=0, max_size=25)
times = st.lists(st.integers(-50, 50), min_size=0, max_size=25)


def _tables(lk, lt, rk, rt):
    left = pa.table({
        "k": pa.array(lk, pa.int64()),
        "t": pa.array(lt[: len(lk)] + [0] * (len(lk) - len(lt)), pa.int64()),
        "lv": pa.array(range(len(lk)), pa.int64()),
    })
    right = pa.table({
        "k": pa.array(rk, pa.int64()),
        "rt": pa.array(rt[: len(rk)] + [0] * (len(rk) - len(rt)), pa.int64()),
        "rv": pa.array(range(len(rk)), pa.int64()),
    })
    return left, right


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), kind="mergesort") \
        .reset_index(drop=True)


def _assert_match(ours: pd.DataFrame, oracle: pd.DataFrame, obj: str):
    # Ray drops the schema of a fully-empty dataset (known 0-row edge,
    # guarded elsewhere); 0 rows on both sides is a match by definition
    if len(ours) == 0 and len(oracle) == 0:
        return
    pd.testing.assert_frame_equal(_canon(ours), _canon(oracle),
                                  check_dtype=False, obj=obj)


@settings(max_examples=4, deadline=None, derandomize=True)
@given(keys, times, keys, times)
def test_join_modes_match_duckdb(ray_session, lk, lt, rk, rt):
    import ray.data

    left, right = _tables(lk, lt, rk, rt)
    lds = ray.data.from_arrow(left)
    rds = ray.data.from_arrow(right)
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)

    # hash join, every mode
    sqls = {
        "inner": "SELECT l.*, r.rt, r.rv FROM l JOIN r USING (k)",
        "left": "SELECT l.*, r.rt, r.rv FROM l LEFT JOIN r USING (k)",
        "semi": "SELECT l.* FROM l SEMI JOIN r USING (k)",
        "anti": "SELECT l.* FROM l ANTI JOIN r USING (k)",
        # RIGHT JOIN: key column comes from the preserved (right) side
        "right": "SELECT COALESCE(r.k, l.k) AS k, l.t, l.lv, r.rt, "
                 "r.rv FROM l RIGHT JOIN r ON l.k = r.k",
    }
    for how, sql in sqls.items():
        ours = shuffle_hash_join(
            lds, rds, key="k", how=how, n_buckets=2).to_pandas()
        _assert_match(ours, con.sql(sql).df(), f"hash-{how}")

    # as-of (backward, inner) — emit matched TIME only (row ties ambiguous)
    ours = asof_join(lds, rds, by="k", on="t", right_on="rt",
                     n_buckets=2).to_pandas()
    if "rv" in ours.columns:
        ours = ours.drop(columns=["rv"])
    _assert_match(ours, con.sql(
        "SELECT l.*, r.rt FROM l ASOF JOIN r "
        "ON l.k = r.k AND l.t >= r.rt").df(), "asof")

    # range join, implicit window [rt, rt+10): all pairs, fully exact
    ours = range_join(lds, rds, by="k", on="t", right_start="rt",
                      max_interval=10, n_buckets=2).to_pandas()
    _assert_match(ours, con.sql(
        "SELECT l.*, r.rt, r.rv FROM l JOIN r ON l.k = r.k "
        "AND l.t >= r.rt AND l.t < r.rt + 10").df(), "range")

@settings(max_examples=3, deadline=None, derandomize=True)
@given(keys, times, keys, times)
def test_asof_range_salted_match_unsalted(ray_session, lk, lt, rk, rt):
    """salt>1 replicates the right side per sub-bucket; results must be
    identical to salt=1 (each left row still meets its full key group)."""
    import ray.data

    left, right = _tables(lk, lt, rk, rt)
    lds = ray.data.from_arrow(left)
    rds = ray.data.from_arrow(right)
    for how in ("inner", "left"):
        base = asof_join(lds, rds, by="k", on="t", right_on="rt",
                         how=how, n_buckets=2).to_pandas()
        salted = asof_join(lds, rds, by="k", on="t", right_on="rt",
                           how=how, n_buckets=2, salt=3).to_pandas()
        # drop rv: row ties on (k, rt) make the matched ROW ambiguous
        for df in (base, salted):
            if "rv" in df.columns:
                df.drop(columns=["rv"], inplace=True)
        _assert_match(salted, base, f"asof-salt-{how}")
    base = range_join(lds, rds, by="k", on="t", right_start="rt",
                      max_interval=10, n_buckets=2).to_pandas()
    salted = range_join(lds, rds, by="k", on="t", right_start="rt",
                        max_interval=10, n_buckets=2, salt=3).to_pandas()
    _assert_match(salted, base, "range-salt")


def test_join_plan_build_validation(ray_session):
    """Misuse fails loudly at plan-build time, not deep inside a task."""
    import ray.data

    left = pa.table({"k": pa.array([1], pa.int64()),
                     "t": pa.array([1], pa.int64())})
    right = pa.table({"k": pa.array([1], pa.int64()),
                      "rt": pa.array([1], pa.int64())})
    lds, rds = ray.data.from_arrow(left), ray.data.from_arrow(right)

    # right_on == right_by would select the key column twice per bucket
    with pytest.raises(ValueError, match="right_on must differ"):
        asof_join(lds, rds, by="k", on="t", right_on="k")

    # reserved exchange column names on either input
    bad_l = ray.data.from_arrow(left.append_column(
        "_side", pa.array([0], pa.int8())))
    with pytest.raises(ValueError, match="reserved exchange"):
        shuffle_hash_join(bad_l, rds, key="k")
    bad_r = ray.data.from_arrow(right.append_column(
        "_bucket", pa.array([0], pa.int64())))
    with pytest.raises(ValueError, match="reserved exchange"):
        shuffle_hash_join(lds, bad_r, key="k")


@settings(max_examples=4, deadline=None, derandomize=True)
@given(keys, times, keys, times)
def test_composite_key_join_matches_duckdb(ray_session, lk, lt, rk, rt):
    """Multi-column equi-join (key lists) vs DuckDB on both columns, all
    modes; composite bucketing must agree with per-bucket Arrow join."""
    import ray.data

    left, right = _tables(lk, lt, rk, rt)
    # reuse t/rt as the SECOND key column (coarsened for collisions)
    left = left.set_column(1, "t", pa.array(
        [v % 3 for v in left.column("t").to_pylist()], pa.int64()))
    right = right.set_column(1, "rt", pa.array(
        [v % 3 for v in right.column("rt").to_pylist()], pa.int64()))
    lds = ray.data.from_arrow(left)
    rds = ray.data.from_arrow(right)
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    sql = {
        "inner": "SELECT l.k, l.t, l.lv, r.rv FROM l JOIN r "
                 "ON l.k = r.k AND l.t = r.rt",
        "left": "SELECT l.k, l.t, l.lv, r.rv FROM l LEFT JOIN r "
                "ON l.k = r.k AND l.t = r.rt",
        "semi": "SELECT l.k, l.t, l.lv FROM l SEMI JOIN r "
                "ON l.k = r.k AND l.t = r.rt",
        "anti": "SELECT l.k, l.t, l.lv FROM l ANTI JOIN r "
                "ON l.k = r.k AND l.t = r.rt",
    }
    for how, q in sql.items():
        ours = shuffle_hash_join(
            lds, rds, key=["k", "t"], right_key=["k", "rt"], how=how,
            n_buckets=3).to_pandas()
        oracle = con.execute(q).fetchdf()
        _assert_match(ours, oracle, f"composite-{how}")
    # salt>1 must equal salt=1 on composite keys too
    base = shuffle_hash_join(lds, rds, key=["k", "t"],
                             right_key=["k", "rt"], n_buckets=3
                             ).to_pandas()
    salted = shuffle_hash_join(lds, rds, key=["k", "t"],
                               right_key=["k", "rt"], n_buckets=3,
                               salt=3).to_pandas()
    _assert_match(salted, base, "composite-salt")


def test_composite_key_validation(ray_session):
    import ray.data

    left = pa.table({"k": [1], "t": [1], "lv": [1]})
    right = pa.table({"k": [1], "rt": [1], "rv": [1]})
    lds, rds = ray.data.from_arrow(left), ray.data.from_arrow(right)
    with pytest.raises(ValueError, match="same length"):
        shuffle_hash_join(lds, rds, key=["k", "t"], right_key=["k"])
    with pytest.raises(ValueError, match="duplicate"):
        shuffle_hash_join(lds, rds, key=["k", "k"],
                          right_key=["k", "rt"])


@settings(max_examples=3, deadline=None, derandomize=True)
@given(keys, times, keys, times)
def test_composite_by_asof_matches_duckdb(ray_session, lk, lt, rk, rt):
    """asof_join with a two-column by key vs DuckDB ASOF JOIN with two
    equality conditions; plus salt parity on the composite key."""
    import ray.data

    left, right = _tables(lk, lt, rk, rt)
    # second key column: coarse parity of the value columns
    left = left.append_column("k2", pa.array(
        [v % 2 for v in left.column("lv").to_pylist()], pa.int64()))
    right = right.append_column("k2", pa.array(
        [v % 2 for v in right.column("rv").to_pylist()], pa.int64()))
    lds = ray.data.from_arrow(left)
    rds = ray.data.from_arrow(right)
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    for how, sqlhow in (("inner", "ASOF JOIN"), ("left",
                                                 "ASOF LEFT JOIN")):
        ours = asof_join(lds, rds, by=["k", "k2"], on="t",
                         right_on="rt", how=how, n_buckets=2
                         ).to_pandas()
        oracle = con.execute(f"""
            SELECT l.k, l.k2, l.t, l.lv, r.rt, r.rv
            FROM l {sqlhow} r
            ON l.k = r.k AND l.k2 = r.k2 AND l.t >= r.rt""").fetchdf()
        # ties on (k, k2, rt) make the matched ROW ambiguous — drop rv
        for df in (ours, oracle):
            df.drop(columns=["rv"], inplace=True, errors="ignore")
        _assert_match(ours, oracle, f"asof-composite-{how}")
    base = asof_join(lds, rds, by=["k", "k2"], on="t", right_on="rt",
                     n_buckets=2).to_pandas().drop(columns=["rv"], errors="ignore")
    salted = asof_join(lds, rds, by=["k", "k2"], on="t", right_on="rt",
                       n_buckets=2, salt=3).to_pandas().drop(
        columns=["rv"], errors="ignore")
    _assert_match(salted, base, "asof-composite-salt")


@settings(max_examples=3, deadline=None, derandomize=True)
@given(keys, times, keys, times)
def test_composite_by_range_matches_duckdb(ray_session, lk, lt, rk, rt):
    """range_join with a two-column by key vs the equivalent DuckDB
    inequality join, plus salt parity."""
    import ray.data

    left, right = _tables(lk, lt, rk, rt)
    left = left.append_column("k2", pa.array(
        [v % 2 for v in left.column("lv").to_pylist()], pa.int64()))
    right = right.append_column("k2", pa.array(
        [v % 2 for v in right.column("rv").to_pylist()], pa.int64()))
    lds = ray.data.from_arrow(left)
    rds = ray.data.from_arrow(right)
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    ours = range_join(lds, rds, by=["k", "k2"], on="t",
                      right_start="rt", max_interval=10,
                      n_buckets=2).to_pandas()
    oracle = con.execute("""
        SELECT l.k, l.k2, l.t, l.lv, r.rt, r.rv
        FROM l JOIN r ON l.k = r.k AND l.k2 = r.k2
        AND l.t >= r.rt AND l.t < r.rt + 10""").fetchdf()
    _assert_match(ours, oracle, "range-composite")
    salted = range_join(lds, rds, by=["k", "k2"], on="t",
                        right_start="rt", max_interval=10,
                        n_buckets=2, salt=3).to_pandas()
    _assert_match(salted, ours, "range-composite-salt")


@settings(max_examples=4, deadline=None, derandomize=True)
@given(keys, times, keys, times)
def test_asof_nearest_matches_pandas(ray_session, lk, lt, rk, rt):
    """direction='nearest' vs pandas merge_asof nearest per key (the
    reference implementation for the tie-to-backward rule)."""
    import ray.data

    left, right = _tables(lk, lt, rk, rt)
    # dedupe right (k, rt) pairs: equal-distance DUPLICATE right rows
    # make the matched row ambiguous in any implementation
    rdf = right.to_pandas().drop_duplicates(["k", "rt"])
    right = pa.Table.from_pandas(rdf, preserve_index=False)
    lds = ray.data.from_arrow(left)
    rds = ray.data.from_arrow(right)
    for how in ("inner", "left"):
        ours = asof_join(lds, rds, by="k", on="t", right_on="rt",
                         direction="nearest", how=how,
                         n_buckets=2).to_pandas()
        ldf = left.to_pandas().sort_values("t", kind="mergesort")
        if len(ldf) and len(rdf):
            exp = pd.merge_asof(
                ldf, rdf.sort_values("rt", kind="mergesort"),
                left_on="t", right_on="rt", left_by="k", right_by="k",
                direction="nearest")
        else:
            exp = ldf.assign(rt=pd.Series(dtype="float64"),
                             rv=pd.Series(dtype="float64"))
        if how == "inner":
            exp = exp[exp["rt"].notna()]
        _assert_match(ours, exp, f"asof-nearest-{how}")


def test_asof_nearest_tolerance_and_ties(ray_session):
    import ray.data

    left = pa.table({"k": [1, 1, 1], "t": [10, 14, 30],
                     "lv": [0, 1, 2]})
    right = pa.table({"k": [1, 1], "rt": [8, 16], "rv": [100, 200]})
    out = asof_join(ray.data.from_arrow(left),
                    ray.data.from_arrow(right), by="k", on="t",
                    right_on="rt", direction="nearest",
                    how="left").to_pandas().sort_values("t")
    # t=10: gaps 2 back / 6 fwd → back; t=14: 6 back / 2 fwd → fwd;
    # t=30: 14 back, no fwd → back
    assert out["rv"].tolist() == [100, 200, 200]
    tol = asof_join(ray.data.from_arrow(left),
                    ray.data.from_arrow(right), by="k", on="t",
                    right_on="rt", direction="nearest", how="left",
                    tolerance=5).to_pandas().sort_values("t")
    assert tol["rv"].fillna(-1).tolist() == [100, 200, -1]
    # equidistant tie goes BACKWARD (t=12: both gaps 4)
    tie = asof_join(
        ray.data.from_arrow(pa.table({"k": [1], "t": [12],
                                      "lv": [0]})),
        ray.data.from_arrow(right), by="k", on="t", right_on="rt",
        direction="nearest").to_pandas()
    assert tie["rv"].tolist() == [100]


def test_bloom_prefiltered_join_parity_and_validation(ray_session):
    """bloom_bits must not change inner/semi results (false positives
    only pass extra rows into the exact per-bucket join); it is
    rejected for join modes that keep unmatched left rows; the
    prefilter itself keeps ~only the matching keys."""
    import ray
    import ray.data

    from opentelemetry_collector_ray.stages.join import (
        _BloomPrefilterStage, build_key_bloom, shuffle_hash_join)

    rng = np.random.default_rng(5)
    n = 30000
    left = pa.table({"k": pa.array(rng.integers(0, 10000, n)),
                     "lv": pa.array(np.arange(n))})
    right = pa.table({"k2": pa.array(rng.choice(
        10000, 120, replace=False).astype(np.int64)),
        "rv": pa.array(np.arange(120))})
    for how in ("inner", "semi"):
        plain = shuffle_hash_join(
            ray.data.from_arrow(left).repartition(5),
            ray.data.from_arrow(right), key="k", right_key="k2",
            how=how).to_pandas()
        bloomed = shuffle_hash_join(
            ray.data.from_arrow(left).repartition(5),
            ray.data.from_arrow(right), key="k", right_key="k2",
            how=how, bloom_bits=1 << 20).to_pandas()
        cols = sorted(plain.columns)
        pd.testing.assert_frame_equal(
            plain[cols].sort_values(cols).reset_index(drop=True),
            bloomed[cols].sort_values(cols).reset_index(drop=True))

    bits = build_key_bloom(ray.data.from_arrow(right), ["k2"],
                           m_bits=1 << 20)
    kept = _BloomPrefilterStage(ray.put(bits), ["k"], 1 << 20, 5)(
        left).num_rows
    true_matches = int(pd.Series(left["k"].to_numpy()).isin(
        right["k2"].to_pylist()).sum())
    assert true_matches <= kept <= int(n * 0.05)  # one-sided, selective

    # review finding: empty right side must behave like the plain join
    # (0 rows out), not crash the bloom build
    empty_right = pa.table({"k2": pa.array([], pa.int64()),
                            "rv": pa.array([], pa.int64())})
    out_empty = shuffle_hash_join(
        ray.data.from_arrow(left), ray.data.from_arrow(empty_right),
        key="k", right_key="k2", how="inner",
        bloom_bits=1 << 16).to_pandas()
    assert len(out_empty) == 0

    for bad_how in ("left", "full", "anti"):
        with pytest.raises(ValueError, match="bloom_bits"):
            shuffle_hash_join(ray.data.from_arrow(left),
                              ray.data.from_arrow(right), key="k",
                              right_key="k2", how=bad_how,
                              bloom_bits=1 << 20)
    with pytest.raises(ValueError, match="multiple of 8"):
        build_key_bloom(ray.data.from_arrow(right), ["k2"], m_bits=9)


def test_bucket_fn_join_group_fusion(ray_session):
    """bucket_fn sees complete key groups per bucket: per-key partial
    counts summed across buckets == a global post-join groupby; salt>1
    is rejected (it splits key groups)."""
    import ray.data

    rng = np.random.default_rng(17)
    n = 3000
    left = pa.table({"k": pa.array(rng.integers(0, 40, n)),
                     "lv": pa.array(rng.integers(0, 9, n))})
    right = pa.table({"k": pa.array(np.arange(40)),
                      "rv": pa.array(np.arange(40) % 3)})

    def per_key(joined: pa.Table) -> pa.Table:
        g = joined.group_by("k").aggregate([("lv", "sum"),
                                            ("lv", "count")])
        return pa.table({"k": g.column("k"),
                         "s": g.column("lv_sum").cast(pa.int64()),
                         "c": g.column("lv_count").cast(pa.int64())})

    out = shuffle_hash_join(
        ray.data.from_arrow(left).repartition(5),
        ray.data.from_arrow(right), key="k", how="inner",
        bucket_fn=per_key, n_buckets=8).to_pandas()
    # each key lives in exactly one bucket -> one row per key already
    assert out["k"].is_unique
    ref = left.to_pandas().groupby("k").agg(
        s=("lv", "sum"), c=("lv", "size")).reset_index()
    got = out.sort_values("k").reset_index(drop=True)
    assert got["k"].tolist() == ref["k"].tolist()
    assert got["s"].tolist() == ref["s"].tolist()
    assert got["c"].tolist() == ref["c"].tolist()

    with pytest.raises(ValueError, match="bucket_fn"):
        shuffle_hash_join(ray.data.from_arrow(left),
                          ray.data.from_arrow(right), key="k",
                          salt=2, bucket_fn=per_key)
