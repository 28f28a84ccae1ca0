"""CDC / retention operators (stages/cdc.py): latest_by_key upsert
compaction, first_k_by throttling, dedupe_consecutive state-change
compression — DuckDB window-SQL parity, null/NaN semantics, guards,
YAML parity."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray.data

from opentelemetry_collector_ray.stages.cdc import (
    dedupe_consecutive, first_k_by, latest_by_key)


def _events(n=500, seed=1):
    rng = np.random.default_rng(seed)
    return pa.table({
        "id": pa.array(np.arange(n), pa.int64()),
        "k": pa.array(np.char.add("u", rng.integers(0, 20, n)
                                  .astype("U4"))),
        "ts": pa.array(rng.integers(0, 50, n), pa.int64()),
        "state": pa.array(np.char.add("s", rng.integers(0, 3, n)
                                      .astype("U2")))})


def _sql(tbl, q):
    con = duckdb.connect()
    con.register("t", tbl)
    return con.execute(q).df()


def _cmp(got, want, cols):
    g = got.sort_values(cols).reset_index(drop=True)
    w = want.sort_values(cols).reset_index(drop=True)
    assert g.shape == w.shape
    assert (g[cols].astype(str).values == w[cols].astype(str).values).all()


def test_latest_by_key_matches_sql(ray_session):
    tbl = _events()
    ds = ray.data.from_arrow(tbl).repartition(4)
    out = latest_by_key(ds, "k", ["ts", "id"]).to_pandas()
    want = _sql(tbl, """
        SELECT * EXCLUDE rn FROM (
          SELECT *, row_number() OVER (PARTITION BY k
              ORDER BY ts DESC, id DESC) AS rn FROM t) WHERE rn = 1""")
    _cmp(out, want, ["id", "k", "ts", "state"])
    first = latest_by_key(ray.data.from_arrow(tbl).repartition(4),
                          "k", ["ts", "id"], keep="first").to_pandas()
    want_f = _sql(tbl, """
        SELECT * EXCLUDE rn FROM (
          SELECT *, row_number() OVER (PARTITION BY k
              ORDER BY ts, id) AS rn FROM t) WHERE rn = 1""")
    _cmp(first, want_f, ["id", "k", "ts", "state"])


def test_first_k_by_matches_sql(ray_session):
    tbl = _events(seed=2)
    out = first_k_by(ray.data.from_arrow(tbl).repartition(4),
                     "k", ["ts", "id"], k=4).to_pandas()
    want = _sql(tbl, """
        SELECT * EXCLUDE rn FROM (
          SELECT *, row_number() OVER (PARTITION BY k
              ORDER BY ts, id) AS rn FROM t) WHERE rn <= 4""")
    _cmp(out, want, ["id", "k", "ts", "state"])


def test_dedupe_consecutive_matches_sql(ray_session):
    tbl = _events(seed=3)
    out = dedupe_consecutive(ray.data.from_arrow(tbl).repartition(4),
                             "k", ["ts", "id"],
                             value_cols=["state"]).to_pandas()
    want = _sql(tbl, """
        SELECT * EXCLUDE (prev, rn) FROM (
          SELECT *, lag(state) OVER w AS prev,
                 row_number() OVER w AS rn
          FROM t WINDOW w AS (PARTITION BY k ORDER BY ts, id))
        WHERE rn = 1 OR state IS DISTINCT FROM prev""")
    _cmp(out, want, ["id", "k", "ts", "state"])


def test_dedupe_consecutive_null_and_nan_runs(ray_session):
    # null==null and NaN==NaN are NOT changes (IS DISTINCT FROM)
    tbl = pa.table({
        "id": pa.array(range(6), pa.int64()),
        "k": pa.array(["a"] * 6),
        "state": pa.array(["x", None, None, "x", "x", None]),
        "val": pa.array([1.0, float("nan"), float("nan"), 1.0, 1.0, 2.0]),
    })
    out = dedupe_consecutive(ray.data.from_arrow(tbl), "k", ["id"],
                             value_cols=["state"]).to_pandas()
    assert sorted(out["id"].tolist()) == [0, 1, 3, 5]
    out2 = dedupe_consecutive(ray.data.from_arrow(tbl), "k", ["id"],
                              value_cols=["val"]).to_pandas()
    assert sorted(out2["id"].tolist()) == [0, 1, 3, 5]


def test_cdc_guards(ray_session):
    tbl = pa.table({"id": pa.array([1, None], pa.int64()),
                    "k": pa.array(["a", "b"]),
                    "v": pa.array([1, 2], pa.int64())})
    with pytest.raises(Exception, match="null"):
        latest_by_key(ray.data.from_arrow(tbl), "k", ["id"]).to_pandas()
    with pytest.raises(ValueError, match="k must be"):
        first_k_by(ray.data.from_arrow(tbl), "k", ["v"], k=0)
    with pytest.raises(ValueError, match="keep"):
        latest_by_key(ray.data.from_arrow(tbl), "k", ["v"], keep="mid")
    with pytest.raises(ValueError, match="value_cols"):
        dedupe_consecutive(ray.data.from_arrow(tbl), "k", ["v"], [])


def test_cdc_yaml_parity(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from opentelemetry_collector_ray.config import PipelineConfig
    from opentelemetry_collector_ray.pipelines.builder import build_dataset

    tbl = _events(n=100, seed=4)
    p = tmp_path / "e.parquet"
    pq.write_table(tbl, str(p))

    def run(proc_name, proc_cfg):
        return build_dataset(PipelineConfig.from_dict({
            "receivers": {"parquet": {"paths": str(p)}},
            "processors": {proc_name: proc_cfg},
            "exporters": {"debug": {}},
            "service": {"pipelines": {"logs": {
                "receivers": ["parquet"], "processors": [proc_name],
                "exporters": ["debug"]}}},
        })).to_pandas()

    y = run("latest_by", {"key": "k", "order_by": ["ts", "id"]})
    d = latest_by_key(ray.data.read_parquet(str(p)), "k",
                      ["ts", "id"]).to_pandas()
    _cmp(y, d, ["id", "k", "ts", "state"])

    y = run("throttle", {"key": "k", "order_by": ["ts", "id"], "k": 2})
    d = first_k_by(ray.data.read_parquet(str(p)), "k",
                   ["ts", "id"], k=2).to_pandas()
    _cmp(y, d, ["id", "k", "ts", "state"])

    y = run("dedupe_consecutive", {"key": "k", "order_by": ["ts", "id"],
                                   "value_cols": ["state"]})
    d = dedupe_consecutive(ray.data.read_parquet(str(p)), "k",
                           ["ts", "id"], ["state"]).to_pandas()
    _cmp(y, d, ["id", "k", "ts", "state"])


def test_state_snapshot_example_yaml(ray_session, tmp_path, monkeypatch):
    """examples/state_snapshot.yaml end to end: the YAML pipeline equals
    the direct dedupe_consecutive -> latest_by_key composition."""
    import os

    import pyarrow.parquet as pq
    import ray.data

    from opentelemetry_collector_ray.config import PipelineConfig
    from opentelemetry_collector_ray.pipelines.builder import build_dataset

    tbl = _events(n=300, seed=7)
    tbl = tbl.rename_columns(["event_id", "user_id", "ts", "event_type"])
    p = tmp_path / "events.parquet"
    pq.write_table(tbl, str(p))
    monkeypatch.setenv("EVENTS_DIR", str(p))
    cfg = PipelineConfig.from_yaml(
        os.path.join(os.path.dirname(__file__), "..", "examples",
                     "state_snapshot.yaml"))
    y = build_dataset(cfg).to_pandas()
    direct = latest_by_key(
        dedupe_consecutive(ray.data.read_parquet(str(p)), "user_id",
                           ["ts", "event_id"], ["event_type"]),
        "user_id", ["ts", "event_id"]).to_pandas()
    cols = ["event_id", "user_id", "ts", "event_type"]
    _cmp(y, direct, cols)
    # one row per user, and it is that user's LAST state change
    assert y["user_id"].is_unique


def test_scd2_intervals_matches_sql(ray_session):
    from opentelemetry_collector_ray.stages.cdc import scd2_intervals

    tbl = _events(n=400, seed=3)
    ds = ray.data.from_arrow(tbl).repartition(4)
    out = scd2_intervals(ds, "k", "ts", ["state"],
                         tie_break="id").to_pandas()
    want = _sql(tbl, """
        WITH s AS (SELECT k, ts, id, state,
                          lag(state) OVER w AS prev
                   FROM t WINDOW w AS (PARTITION BY k ORDER BY ts, id)),
        kept AS (SELECT * FROM s WHERE prev IS NULL OR prev <> state),
        iv AS (SELECT k, state, ts AS valid_from,
                      lead(ts) OVER (PARTITION BY k ORDER BY ts, id)
                          AS valid_to
               FROM kept)
        SELECT k, state, valid_from, valid_to,
               (valid_to IS NULL) AS is_current FROM iv""")
    _cmp(out, want, ["k", "state", "valid_from", "valid_to",
                     "is_current"])
    # exactly one open interval per key
    assert out[out["is_current"]].groupby("k").size().max() == 1
    assert set(out[out["is_current"]]["k"]) == set(out["k"])


def test_scd2_intervals_null_state_and_guard(ray_session):
    from opentelemetry_collector_ray.stages.cdc import scd2_intervals

    tbl = pa.table({
        "k": pa.array(["a"] * 4, pa.string()),
        "ts": pa.array([1, 2, 3, 4], pa.int64()),
        "state": pa.array(["x", None, None, "x"], pa.string())})
    out = scd2_intervals(ray.data.from_arrow(tbl), "k", "ts",
                         ["state"]).to_pandas()
    # null==null is NOT a change (IS DISTINCT FROM): x -> null -> x
    out = out.sort_values("valid_from").reset_index(drop=True)
    assert list(out["valid_from"]) == [1, 2, 4]
    assert list(out["valid_to"].fillna(-1)) == [2, 4, -1]
    assert list(out["is_current"]) == [False, False, True]
    with pytest.raises(ValueError, match="value_cols"):
        scd2_intervals(ray.data.from_arrow(tbl), "k", "ts", [])


def test_scd2_reserved_name_collision(ray_session):
    from opentelemetry_collector_ray.stages.cdc import scd2_intervals

    tbl = pa.table({"k": pa.array(["a"]),
                    "ts": pa.array([1], pa.int64()),
                    "valid_from": pa.array(["x"])})
    with pytest.raises(ValueError, match="reserved"):
        scd2_intervals(ray.data.from_arrow(tbl), "k", "ts",
                       ["valid_from"])


def test_log_dedup_collapses_identical_rows(ray_session):
    """Contrib logdedup analog: identical (match) rows in one interval
    collapse with count + first/last ts; different windows stay
    separate; guards."""
    from opentelemetry_collector_ray.stages.cdc import log_dedup

    us = 1_000_000
    t = pa.table({
        "ts": pa.array([1 * us, 2 * us, 3 * us, 61 * us, 62 * us],
                       pa.timestamp("us")),
        "body": ["oom", "oom", "disk", "oom", "oom"],
    })
    out = log_dedup(ray.data.from_arrow(t).repartition(2), ["body"],
                    "ts", 60 * us).to_pandas() \
        .sort_values(["window_start", "body"]).reset_index(drop=True)
    assert out["body"].tolist() == ["disk", "oom", "oom"]
    assert out["log_count"].tolist() == [1, 2, 2]
    assert out["first_ts"].tolist() == [3 * us, 1 * us, 61 * us]
    assert out["last_ts"].tolist() == [3 * us, 2 * us, 62 * us]
    assert out["window_start"].tolist() == [0, 0, 60 * us]

    with pytest.raises(ValueError, match="interval_us"):
        log_dedup(ray.data.from_arrow(t), ["body"], "ts", 0)
    with pytest.raises(ValueError, match="match_cols"):
        log_dedup(ray.data.from_arrow(t), [], "ts", us)
    with pytest.raises(ValueError, match="collide"):
        log_dedup(ray.data.from_arrow(t.rename_columns(
            ["ts", "first_ts"])), ["first_ts"], "ts", us)


def test_log_dedup_yaml_parity(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from opentelemetry_collector_ray.config import PipelineConfig
    from opentelemetry_collector_ray.pipelines.builder import build_dataset
    from opentelemetry_collector_ray.stages.cdc import log_dedup

    t = _events(n=80, seed=9)
    p = tmp_path / "l.parquet"
    pq.write_table(t, str(p))
    y = build_dataset(PipelineConfig.from_dict({
        "receivers": {"parquet": {"paths": str(p)}},
        "processors": {"log_dedup": {
            "match_cols": ["k", "state"], "ts_col": "ts",
            "interval_us": 1_000_000}},
        "exporters": {"debug": {}},
        "service": {"pipelines": {"logs": {
            "receivers": ["parquet"], "processors": ["log_dedup"],
            "exporters": ["debug"]}}},
    })).to_pandas().sort_values(
        ["window_start", "k", "state"]).reset_index(drop=True)
    d = log_dedup(ray.data.read_parquet(str(p)), ["k", "state"],
                  "ts", 1_000_000).to_pandas().sort_values(
        ["window_start", "k", "state"]).reset_index(drop=True)
    assert y.equals(d)


def test_log_dedup_internal_lane_guard(ray_session):
    from opentelemetry_collector_ray.stages.cdc import log_dedup

    t = pa.table({"ts": pa.array([0], pa.int64()), "_ts": ["x"]})
    with pytest.raises(ValueError, match="collide"):
        log_dedup(ray.data.from_arrow(t), ["_ts"], "ts", 1000)
