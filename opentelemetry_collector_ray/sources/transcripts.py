"""Derive the canonical transcript ("turns") table from the driver's
``events`` table — deterministically, so the whole flagship pipeline is
oracle-checkable in DuckDB.

Mapping (one event = one turn; see tests and __ray_entry__.oracle_sql for
the SQL mirror — every expression here must stay byte-equal to it):

    conv_id  = printf('conv-%08d', user_id)
    turn_idx = row_number() over (partition by user_id order by ts, event_id) - 1
    role     = signup→system, error→tool, purchase→assistant, click/view→user
    tool     = '' for view else event_type   ('' = non-tool turn; empty-vs-
               missing is significant, reference batchprocessor/config.go:36-38)
    text     = view:  'viewed page p{floor(value)} by user {user_id}'
               else:  '[{LEVEL}] call tool={event_type} latency_ms={floor(value*10)}
                       status={ok|err} trace={event_id:016x}'
    ts       = ts

The per-user rank is the one wide op: a hash shuffle on ``conv_id`` — the
same partitioning key every downstream stage reuses (SURVEY.md §4.3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

ROLE_MAP = {"signup": "system", "error": "tool", "purchase": "assistant",
            "click": "user", "view": "user"}


def _event_to_turn_cols(batch: pa.Table) -> pa.Table:
    """Vectorized text/role/tool construction (stateless map_batches)."""
    et = batch.column("event_type").to_numpy(zero_copy_only=False)
    uid = batch.column("user_id").to_numpy(zero_copy_only=False)
    eid = batch.column("event_id").to_numpy(zero_copy_only=False)
    val = batch.column("value").to_numpy(zero_copy_only=False)

    n = batch.num_rows
    role = np.array([ROLE_MAP.get(e, "user") for e in et], dtype=object)
    is_view = et == "view"
    tool = np.where(is_view, "", et).astype(object)
    level = np.where(et == "error", "ERROR", "INFO")
    status = np.where(et == "error", "err", "ok")
    lat = np.floor(val * 10).astype(np.int64)
    page = np.floor(val).astype(np.int64)

    text = np.empty(n, dtype=object)
    for i in range(n):  # format-string assembly; see note below
        if is_view[i]:
            text[i] = f"viewed page p{page[i]} by user {uid[i]}"
        else:
            text[i] = (f"[{level[i]}] call tool={et[i]} latency_ms={lat[i]} "
                       f"status={status[i]} trace={eid[i]:016x}")
    # NOTE: the f-string loop is the only row loop in the engine; it exists
    # only in this synthetic-derivation source (not a real pipeline stage).

    conv_id = np.array([f"conv-{u:08d}" for u in uid], dtype=object)
    return pa.table({
        "conv_id": pa.array(conv_id, pa.string()),
        "event_id": batch.column("event_id"),
        "role": pa.array(role, pa.string()),
        "text": pa.array(text, pa.string()),
        "tool": pa.array(tool, pa.string()),
        "ts": batch.column("ts"),
    })


N_RANK_BUCKETS = 64


def _add_bucket(batch: pa.Table) -> pa.Table:
    from ..functions.hashing import bucket_of

    b = bucket_of(batch.column("conv_id"), N_RANK_BUCKETS)
    return batch.append_column("_bucket", pa.array(b))


def _rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """Rank turns within every conversation of one hash bucket — one
    vectorized pandas pass over MANY conversations (no per-group Python:
    buckets, not conversations, are the map_groups unit — the bounded-group
    pattern for per-key windowed work at scale)."""
    g = g.sort_values(["conv_id", "ts", "event_id"], kind="mergesort")
    g["turn_idx"] = g.groupby("conv_id", sort=False).cumcount().astype(np.int32)
    return g.drop(columns=["event_id", "_bucket"])


def derive_turns(events: ray.data.Dataset) -> ray.data.Dataset:
    """events → canonical turns table (conv_id, turn_idx, role, text, tool, ts).

    The rank shuffle keys on hash(conv_id) % 64 buckets rather than raw
    conv_id, so the group count (and Python-call count) is bounded and every
    bucket ranks thousands of conversations in one vectorized pass."""
    pre = events.map_batches(_event_to_turn_cols, batch_format="pyarrow") \
        .map_batches(_add_bucket, batch_format="pyarrow")
    ranked = pre.groupby("_bucket").map_groups(_rank_bucket, batch_format="pandas")
    return ranked.select_columns(["conv_id", "turn_idx", "role", "text", "tool", "ts"])


def read_derived_turns(sf_dir: str) -> ray.data.Dataset:
    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"])
    return derive_turns(events)


# SQL mirror used by oracle_sql() entries (DuckDB; `events` is a view).
TURNS_CTE = """
turns AS (
  SELECT
    printf('conv-%08d', user_id) AS conv_id,
    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INTEGER) AS turn_idx,
    CASE event_type WHEN 'signup' THEN 'system' WHEN 'error' THEN 'tool'
                    WHEN 'purchase' THEN 'assistant' ELSE 'user' END AS role,
    CASE WHEN event_type = 'view'
      THEN printf('viewed page p%d by user %d', CAST(floor(value) AS BIGINT), user_id)
      ELSE printf('[%s] call tool=%s latency_ms=%d status=%s trace=%016x',
                  CASE WHEN event_type = 'error' THEN 'ERROR' ELSE 'INFO' END,
                  event_type,
                  CAST(floor(value * 10) AS BIGINT),
                  CASE WHEN event_type = 'error' THEN 'err' ELSE 'ok' END,
                  event_id)
    END AS text,
    CASE WHEN event_type = 'view' THEN '' ELSE event_type END AS tool,
    ts
  FROM events
)
"""
