"""Deterministic seeded generator for the transcript ("turns") table.

Our analog of the reference's canonical fixture builders
(``/root/reference/pdata/testdata/log.go:15-57`` — fixed timestamp, a
small pool of record shapes, byte-stable across runs). Used by unit
tests and by ``bench.py`` to scale the table up; never used for the
driver's DuckDB correctness gate (that runs on /root/testdata tables).

Shape rules (FIXTURES.md):
- ``conv_id`` = ``conv-{i:08d}``, Zipf-skewed turn counts (hot-conversation
  skew for salting tests).
- ``turn_idx`` contiguous 0..n-1 per conversation, unique.
- ``role`` cycles over user/assistant/system/tool with fixed weights.
- ``text`` from a template pool with embedded parseable fields; ~10%
  deliberately non-matching; includes empty string, unicode, and one
  >64 KiB outlier.
- ``tool`` from a 12-entry dictionary; "" for non-tool turns.
- ``ts`` = fixed epoch base 2020-02-11T20:26:13.000000789Z (the instant used
  by reference pdata/testdata/log.go:13) + turn_idx-proportional
  increments; a few conversations shuffled out of order to prove
  sort-stability.

All numpy with ``seed=42`` — byte-stable (required for byte-equality and
resume-idempotence tests).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .schema import TURNS_SCHEMA

SEED = 42
# 2020-02-11T20:26:13.000000789Z in ns (pdata/testdata/log.go:13); us precision.
BASE_TS_US = 1581452773000000

TOOLS = [
    "search", "browser", "python", "bash", "calculator", "sql",
    "retrieval", "email", "calendar", "files", "translate", "vision",
]

ROLE_POOL = np.array(["user", "assistant", "system", "tool"])
ROLE_WEIGHTS = np.array([0.40, 0.40, 0.05, 0.15])


def _zipf_turn_counts(n_convs: int, total_turns: int, rng: np.random.Generator) -> np.ndarray:
    w = (np.arange(1, n_convs + 1, dtype=np.float64)) ** -1.1
    rng.shuffle(w)
    counts = np.maximum(1, np.round(w / w.sum() * total_turns)).astype(np.int64)
    return counts


def synth_turns(sf: float = 0.01, seed: int = SEED) -> pa.Table:
    """Generate ≈ sf×10^4 turns across ≈ sf×10^2 conversations."""
    rng = np.random.default_rng(seed)
    n_convs = max(1, int(round(sf * 100)))
    total = max(4, int(round(sf * 10_000)))
    counts = _zipf_turn_counts(n_convs, total, rng)
    n = int(counts.sum())

    conv_ordinal = np.repeat(np.arange(n_convs), counts)
    turn_idx = (np.arange(n) - np.repeat(np.cumsum(counts) - counts, counts)).astype(np.int32)
    conv_id = np.array([f"conv-{i:08d}" for i in range(n_convs)])[conv_ordinal]

    role = ROLE_POOL[rng.choice(4, size=n, p=ROLE_WEIGHTS)]
    tool_ix = rng.integers(0, len(TOOLS), size=n)
    is_tool_turn = role == "tool"
    tool = np.where(is_tool_turn, np.array(TOOLS)[tool_ix], "")

    latency = rng.integers(1, 5000, size=n)
    status = np.where(rng.random(n) < 0.9, "ok", "err")
    trace = rng.integers(0, 2**63, size=n, dtype=np.int64)

    # Template pool: ~80% parseable tool-call lines, ~10% free text (parse
    # miss), ~10% chat text; plus deterministic edge rows injected below.
    shape = rng.random(n)
    texts = np.empty(n, dtype=object)
    for i in range(n):
        if shape[i] < 0.80:
            lvl = "ERROR" if status[i] == "err" else "INFO"
            t = tool[i] if tool[i] else TOOLS[tool_ix[i]]
            texts[i] = (
                f"[{lvl}] call tool={t} latency_ms={latency[i]} "
                f"status={status[i]} trace={int(trace[i]):016x}"
            )
        elif shape[i] < 0.90:
            texts[i] = f"free-form note {int(latency[i])} with no rule match"
        else:
            texts[i] = f"hello from {role[i]} turn — ünïcødé ✓ {int(latency[i])}"
    if n >= 4:
        texts[0] = ""  # empty-string body
        texts[1] = "大模型 разговор émoji 🙂 end"
        texts[2] = "x" * (64 * 1024 + 17)  # >64KiB wide-record outlier
        texts[3] = "[INFO] call tool=search latency_ms=1 status=ok trace=" + "0" * 16

    ts = BASE_TS_US + conv_ordinal * 10_000_000 + turn_idx.astype(np.int64) * 1_000_000
    # Shuffle timestamps out of order within a few conversations (sort-stability
    # proof): reverse ts for conv ordinals ≡ 3 (mod 7).
    ooo = conv_ordinal % 7 == 3
    if ooo.any():
        rev = ts.copy()
        for c in np.unique(conv_ordinal[ooo]):
            m = conv_ordinal == c
            rev[m] = ts[m][::-1]
        ts = rev

    return pa.table(
        {
            "conv_id": pa.array(conv_id, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(role, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tool, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        },
        schema=TURNS_SCHEMA,
    )


def write_turns_parquet(out_dir: str, sf: float = 0.01, seed: int = SEED,
                        shards: int = 4) -> list[str]:
    """Write the synthetic table as multiple shard files (fragment analog of
    per-request OTLP pushes) so Ray reads produce multiple blocks."""
    import os
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    t = synth_turns(sf, seed)
    n = t.num_rows
    paths = []
    per = max(1, (n + shards - 1) // shards)
    for s in range(shards):
        lo = s * per
        if lo >= n:
            break
        part = t.slice(lo, per)
        p = os.path.join(out_dir, f"turns-{s:04d}.parquet")
        pq.write_table(part, p)
        paths.append(p)
    return paths
