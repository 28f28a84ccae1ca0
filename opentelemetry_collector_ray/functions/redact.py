"""PII redaction kernels for training-data pipelines.

The collector ships attribute-level deletion/hashing in its attributes
machinery (SURVEY §2.2 OTTL mutation set; `pdata/pcommon/map.go:65-319`
Remove/RemoveIf); a corpus-scale training pipeline additionally needs
*content* redaction — scrubbing emails/phones/SSNs/credit-cards/IPs out of
free text before the text is shuffled, deduped or exported.

Scale notes (100 TB):
- Every kernel is a whole-column Arrow RE2 pass
  (``pc.replace_substring_regex`` / ``pc.count_substring_regex``); no
  Python per row, no materialization — runs inside
  ``map_batches(..., batch_format="pyarrow")`` on the streaming path.
- RE2 is linear-time (no backtracking), so adversarial documents cannot
  blow up a worker: cost is O(bytes) per rule pass, ~5 passes per batch.
- The same patterns are valid DuckDB ``regexp_replace`` / RE2 patterns,
  which is what makes the oracle gate exact (both engines run RE2 with
  leftmost non-overlapping semantics).

Rule order matters and is fixed: EMAIL → SSN (3-2-4) → CC (4×4) →
PHONE (3-3-4) → IPV4. The digit-group shapes are mutually exclusive at
word boundaries, so a later rule never matches inside an earlier rule's
replacement token.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"
CC_RE = r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b"
PHONE_RE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# (name, RE2 pattern, replacement token) — applied strictly in this order.
PII_RULES: list[tuple[str, str, str]] = [
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ssn", SSN_RE, "<SSN>"),
    ("credit_card", CC_RE, "<CC>"),
    ("phone", PHONE_RE, "<PHONE>"),
    ("ipv4", IPV4_RE, "<IP>"),
]


def redact(col: pa.ChunkedArray | pa.Array,
           rules: list[tuple[str, str, str]] = PII_RULES) -> pa.ChunkedArray:
    """Sequentially replace every rule's matches with its token.

    One vectorized RE2 pass per rule over the whole column.
    """
    out = col
    for _name, pattern, token in rules:
        out = pc.replace_substring_regex(out, pattern=pattern,
                                         replacement=token)
    return out


def pii_counts(col: pa.ChunkedArray | pa.Array,
               rules: list[tuple[str, str, str]] = PII_RULES,
               ) -> dict[str, pa.Array]:
    """Per-rule match counts on the ORIGINAL (pre-redaction) text.

    Returns ``{"n_<rule>": int64 array}``. Counts are non-overlapping
    leftmost RE2 matches — identical semantics to DuckDB's
    ``len(regexp_extract_all(...))`` for the oracle gate.
    """
    return {
        f"n_{name}": pc.count_substring_regex(col, pattern=pattern)
        .cast(pa.int64())
        for name, pattern, _token in rules
    }


def redact_table(t: pa.Table, text_col: str = "text",
                 out_col: str = "redacted",
                 rules: list[tuple[str, str, str]] = PII_RULES,
                 with_counts: bool = True) -> pa.Table:
    """map_batches-ready helper: append redacted text (+ per-rule counts)."""
    col = t.column(text_col)
    t = t.append_column(out_col, redact(col, rules))
    if with_counts:
        for name, arr in pii_counts(col, rules).items():
            t = t.append_column(name, arr)
    return t
