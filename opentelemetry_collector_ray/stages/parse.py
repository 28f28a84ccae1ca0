"""Grok/regex parse stage: turn ``text`` into typed attribute columns.

The collector analog is the processorhelper-wrapped transform processor
(``/root/reference/processor/processorhelper/logs.go:22,31-75`` wraps a
pure ProcessLogsFunc) applying OTTL-style extraction
(``/root/reference/docs/rfcs/processing.md:36-50``). Parse rules follow
the reference filter library's compile-once discipline
(``/root/reference/filter/config.go:42-58``).

Semantics:
- An ordered ruleset; **first matching rule wins** per row (router-style
  priority, cf. connector first-match routing).
- Each rule is an RE2 regex with named groups; matched groups become
  columns (union of all rules' groups; null where the winning rule lacks
  the group or no rule matches).
- ``parse_rule:int8`` records the winning rule index, -1 for a miss —
  the parse-miss path stays in-band (no rows dropped), mirroring the
  collector's pass-through of unparseable bodies.

Execution: one ``pc.extract_regex`` pass per rule per batch (vectorized,
zero-copy Arrow); combined with ``pc.if_else`` by priority. The stage is a
callable class so the compiled ruleset + its hash live once per actor.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


@dataclass(frozen=True)
class ParseRule:
    name: str
    pattern: str  # RE2 with named groups
    casts: dict[str, str] = field(default_factory=dict)  # group -> arrow type name


# Fixture ruleset (FIXTURES.md): one rich rule, one overlapping lower-priority
# rule (first-match priority test), one rule that never matches.
DEFAULT_PARSE_RULES: tuple[ParseRule, ...] = (
    ParseRule(
        "tool_call",
        r"\[(?P<level>[A-Z]+)\] call tool=(?P<tool_attr>\w+) "
        r"latency_ms=(?P<latency_ms>\d+) status=(?P<status>ok|err) "
        r"trace=(?P<trace>[0-9a-f]{16})",
        casts={"latency_ms": "int64"},
    ),
    ParseRule("any_level", r"\[(?P<level>[A-Z]+)\] (?P<rest>.*)"),
    ParseRule("never_matches", r"\bZZZ-NO-SUCH-PREFIX-(?P<nothing>\d+)\b"),
)


def ruleset_hash(rules: tuple[ParseRule, ...]) -> str:
    """Stable hash of the ruleset, recorded in partition manifests so config
    changes invalidate committed outputs (reference reload fingerprinting,
    otelcol/collector.go:201-209)."""
    blob = json.dumps([[r.name, r.pattern, sorted(r.casts.items())] for r in rules])
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def _group_names(pattern: str) -> list[str]:
    import re

    return list(re.compile(pattern).groupindex.keys())


class ParseStage:
    """Callable class for ``map_batches(ParseStage, batch_format="pyarrow",
    concurrency=N)`` — ruleset is validated/compiled once per actor."""

    def __init__(self, rules: tuple[ParseRule, ...] = DEFAULT_PARSE_RULES,
                 text_col: str = "text"):
        self.rules = tuple(rules)
        self.text_col = text_col
        self.hash = ruleset_hash(self.rules)
        self.rule_groups = [_group_names(r.pattern) for r in self.rules]
        self.all_groups: list[str] = []
        for gs in self.rule_groups:
            for g in gs:
                if g not in self.all_groups:
                    self.all_groups.append(g)
        self.casts: dict[str, str] = {}
        for r in self.rules:
            self.casts.update(r.casts)

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column(self.text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n = batch.num_rows
        out: dict[str, pa.Array] = {
            g: pa.nulls(n, pa.string()) for g in self.all_groups
        }
        rule_ix = np.full(n, -1, dtype=np.int8)
        unclaimed_np = np.ones(n, dtype=bool)
        for i, rule in enumerate(self.rules):
            n_open = int(unclaimed_np.sum())
            if n_open == 0:
                break
            if n_open > 0.9 * n:
                # full-column pass (vectorized if_else merge)
                ext = pc.extract_regex(text, pattern=rule.pattern)
                if isinstance(ext, pa.ChunkedArray):
                    ext = ext.combine_chunks()
                matched_np = ext.is_valid().to_numpy(zero_copy_only=False)
                wins_np = matched_np & unclaimed_np
                if wins_np.any():
                    rule_ix[wins_np] = i
                    wins = pa.array(wins_np)
                    for g in self.rule_groups[i]:
                        out[g] = pc.if_else(wins, pc.struct_field(ext, g), out[g])
                unclaimed_np &= ~matched_np
            else:
                # fast path: run the regex only on still-unclaimed rows and
                # scatter winners back (later rules usually see a small
                # residue after the first rule claims the bulk)
                idx = np.nonzero(unclaimed_np)[0]
                sub = text.take(pa.array(idx))
                ext = pc.extract_regex(sub, pattern=rule.pattern)
                if isinstance(ext, pa.ChunkedArray):
                    ext = ext.combine_chunks()
                matched_sub = ext.is_valid().to_numpy(zero_copy_only=False)
                if matched_sub.any():
                    win_global = idx[matched_sub]
                    rule_ix[win_global] = i
                    for g in self.rule_groups[i]:
                        vals = pc.struct_field(ext, g).to_numpy(zero_copy_only=False)
                        full = np.full(n, None, dtype=object)
                        full[win_global] = vals[matched_sub]
                        merged = pa.array(full, pa.string())
                        # rows outside win_global keep their previous value
                        keep_prev = pa.array(rule_ix != i) if g in {
                            h for j in range(i) for h in self.rule_groups[j]} \
                            else None
                        if keep_prev is not None:
                            merged = pc.if_else(keep_prev, out[g], merged)
                        out[g] = merged
                    unclaimed_np[idx] &= ~matched_sub
                else:
                    continue
        for g, typ in self.casts.items():
            out[g] = out[g].cast(pa.type_for_alias(typ))
        res = batch
        for g in self.all_groups:
            res = res.append_column(g, out[g])
        return res.append_column("parse_rule", pa.array(rule_ix, pa.int8()))


def extract_all_explode(ds, text_col: str, pattern: str,
                        keep: list[str] | None = None,
                        out: str = "match"):
    """Explode EVERY regex match of ``pattern`` in ``text_col`` to its
    own output row carrying the ``keep`` columns — the all-matches
    generalization of the first-match ParseStage (contrib OTTL
    ``ExtractPatterns`` returns one match; a log pipeline pulling
    every IP / tag / token from a line needs them all). SQL mirror:
    ``unnest(regexp_extract_all(text, pattern))``. Rows with no match
    (or null text) contribute no output rows — exactly unnest's
    semantics.

    Scale shape: map-only — :func:`~..functions.text.extract_all`
    runs one vectorized Rust-regex pass per batch, the explode is an
    Arrow ``list_parent_indices`` take; nothing shuffles and output
    rows are skinny (keep + match only)."""
    import pyarrow as pa_
    import pyarrow.compute as pc_

    from ..functions.text import extract_all

    keep = list(keep or [])
    if out in keep or out == text_col:
        raise ValueError(
            f"extract_all_explode: output column {out!r} collides")

    def f(t: pa_.Table) -> pa_.Table:
        lists = extract_all(t.column(text_col), pattern)
        idx = pc_.list_parent_indices(lists)
        lanes = {k: t.column(k).take(idx) for k in keep}
        lanes[out] = pc_.list_flatten(lists)
        return pa_.table(lanes)

    return ds.map_batches(f, batch_format="pyarrow")
