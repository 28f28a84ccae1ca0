"""Log template mining (stages/templates.py): masking order, grouping,
deterministic example, DuckDB regexp_replace-chain parity, YAML parity."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pytest

import ray.data

from opentelemetry_collector_ray.stages.templates import (
    DEFAULT_MASK_RULES, mask_templates_sql, mine_templates)

LINES = [
    "[INFO] call tool=grep latency_ms=42 status=ok trace=00deadbeef001122",
    "[INFO] call tool=grep latency_ms=7 status=ok trace=ffffffffffffffff",
    "[ERROR] call tool=grep latency_ms=900 status=err trace=0123456789abcdef",
    "req 550e8400-e29b-41d4-a716-446655440000 took 12 ms",
    "req 123e4567-e89b-12d3-a456-426614174000 took 9 ms",
    "no variables here",
    "",
    "unicode 🙂 path /a/b/7",
]


def _mine(lines, **kw):
    ds = ray.data.from_arrow(pa.table({"text": pa.array(lines)}))
    return mine_templates(ds.repartition(3), "text", **kw) \
        .to_pandas().sort_values("template").reset_index(drop=True)


def test_masking_and_grouping(ray_session):
    out = _mine(LINES)
    got = {r.template: (r.n, r.example) for r in out.itertuples()}
    t_ok = ("[INFO] call tool=grep latency_ms=<NUM> status=ok "
            "trace=<HEX>")
    t_err = ("[ERROR] call tool=grep latency_ms=<NUM> status=err "
             "trace=<HEX>")
    assert got[t_ok] == (2, LINES[0])  # min example, not first-seen
    assert got[t_err] == (1, LINES[2])
    # uuid masked BEFORE digits — a shredded uuid would leave <NUM>s
    assert got["req <UUID> took <NUM> ms"][0] == 2
    assert got["no variables here"] == (1, "no variables here")
    assert got[""] == (1, "")
    assert got["unicode 🙂 path /a/b/<NUM>"][0] == 1
    assert len(got) == 6
    with pytest.raises(ValueError, match="rules"):
        mine_templates(ray.data.from_arrow(
            pa.table({"text": ["x"]})), "text", rules=())


def test_sql_chain_parity(ray_session):
    """mask_templates_sql over the same lines in DuckDB produces the
    identical template set — the oracle-generator contract."""
    out = _mine(LINES)
    con = duckdb.connect()
    con.register("t", pa.table({"text": pa.array(LINES)}))
    sql = (f"SELECT {mask_templates_sql('text')} AS template, "
           "CAST(count(*) AS BIGINT) AS n, min(text) AS example "
           "FROM t GROUP BY template ORDER BY template")
    want = con.sql(sql).df().reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_custom_rules_and_yaml(ray_session, tmp_path):
    """Custom rule list via YAML config matches a direct call with the
    same rules."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_ray.config import PipelineConfig
    from opentelemetry_collector_ray.pipelines.builder import (
        build_dataset)

    rules = (("ip", r"\b\d+\.\d+\.\d+\.\d+\b", "<IP>"),
             ("num", r"\d+", "<NUM>"))
    lines = ["GET /x from 10.0.0.1", "GET /x from 10.9.8.7",
             "GET /y/3 from 10.0.0.2"]
    p = tmp_path / "l.parquet"
    pq.write_table(pa.table({"text": pa.array(lines)}), str(p))
    y = build_dataset(PipelineConfig.from_dict({
        "receivers": {"parquet": {"paths": str(p)}},
        "processors": {"log_templates": {"text": "text", "rules": [
            {"name": n, "pattern": pat, "token": tok}
            for n, pat, tok in rules]}},
        "exporters": {"debug": {}},
        "service": {"pipelines": {"logs": {
            "receivers": ["parquet"], "processors": ["log_templates"],
            "exporters": ["debug"]}}},
    })).to_pandas().sort_values("template").reset_index(drop=True)
    want = mine_templates(ray.data.read_parquet(str(p)), "text",
                          rules=rules).to_pandas() \
        .sort_values("template").reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(y, want, check_dtype=False)
    got = {r.template: r.n for r in y.itertuples()}
    # the ip rule fires before the bare-digit rule
    assert got["GET /x from <IP>"] == 2
    assert got["GET /y/<NUM> from <IP>"] == 1
