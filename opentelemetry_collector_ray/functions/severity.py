"""Severity number/text mapping — plog.SeverityNumber analog
(``/root/reference/pdata/plog/severity_number.go``: 0 unspecified, 1-4
TRACE, 5-8 DEBUG, 9-12 INFO, 13-16 WARN, 17-20 ERROR, 21-24 FATAL)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SEVERITY_UNSPECIFIED = 0
SEVERITY_TRACE = 1
SEVERITY_DEBUG = 5
SEVERITY_INFO = 9
SEVERITY_WARN = 13
SEVERITY_ERROR = 17
SEVERITY_FATAL = 21

_BANDS = [(21, "FATAL"), (17, "ERROR"), (13, "WARN"), (9, "INFO"),
          (5, "DEBUG"), (1, "TRACE")]

TEXT_TO_NUMBER = {"TRACE": 1, "DEBUG": 5, "INFO": 9, "WARN": 13,
                  "ERROR": 17, "FATAL": 21}


def severity_text(numbers: pa.Array | pa.ChunkedArray) -> pa.Array:
    """SeverityNumber → canonical text band (vectorized)."""
    n = np.asarray(numbers.to_numpy(zero_copy_only=False) if hasattr(numbers, "to_numpy")
                   else numbers, dtype=np.int64)
    out = np.full(len(n), "UNSPECIFIED", dtype=object)
    for lo, name in _BANDS:
        out[(n >= lo) & (n <= lo + 3)] = name
    out[(n < 1) | (n > 24)] = "UNSPECIFIED"
    return pa.array(out, pa.string())


def severity_number(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Text → base SeverityNumber of the band (unknown → 0)."""
    vals = texts.to_pylist() if hasattr(texts, "to_pylist") else list(texts)
    return pa.array([TEXT_TO_NUMBER.get((t or "").upper(), 0) for t in vals],
                    pa.int32())
