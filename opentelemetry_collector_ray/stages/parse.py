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
        n = batch.num_rows
        out: dict[str, pa.Array] = {
            g: pa.nulls(n, pa.string()) for g in self.all_groups
        }
        rule_ix = np.full(n, -1, dtype=np.int8)
        unclaimed = pa.array(np.ones(n, dtype=bool))
        for i, rule in enumerate(self.rules):
            ext = pc.extract_regex(text, pattern=rule.pattern)
            if isinstance(ext, pa.ChunkedArray):
                ext = ext.combine_chunks()
            matched = ext.is_valid()
            wins = pc.and_(matched, unclaimed)
            wins_np = wins.to_numpy(zero_copy_only=False)
            if not wins_np.any():
                continue
            rule_ix[wins_np] = i
            for g in self.rule_groups[i]:
                vals = pc.struct_field(ext, g)
                out[g] = pc.if_else(wins, vals, out[g])
            unclaimed = pc.and_(unclaimed, pc.invert(matched))
        for g, typ in self.casts.items():
            out[g] = out[g].cast(pa.type_for_alias(typ))
        res = batch
        for g in self.all_groups:
            res = res.append_column(g, out[g])
        return res.append_column("parse_rule", pa.array(rule_ix, pa.int8()))
