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


# syslog severity (RFC 5424 §6.2.1, 0 emergency … 7 debug) → the base
# SeverityNumber of the matching plog band — the mapping the collector's
# syslog receiver applies on ingest (contrib syslogreceiver; severity
# table per RFC 5424 Table 2).
_SYSLOG_TO_OTEL = np.array([
    SEVERITY_FATAL,      # 0 emergency
    SEVERITY_FATAL + 1,  # 1 alert
    SEVERITY_FATAL + 2,  # 2 critical
    SEVERITY_ERROR,      # 3 error
    SEVERITY_WARN,       # 4 warning
    SEVERITY_INFO + 1,   # 5 notice
    SEVERITY_INFO,       # 6 informational
    SEVERITY_DEBUG,      # 7 debug
], dtype=np.int64)


def decode_syslog_pri(pri: pa.Array | pa.ChunkedArray
                      ) -> dict[str, pa.Array]:
    """Decode the syslog PRI value (RFC 5424 §6.2.1: ``PRI = facility*8
    + severity``) into ``facility`` (int64 0-23), ``syslog_severity``
    (int64 0-7) and the mapped OTel ``severity_number``. Out-of-range
    PRI (valid domain 0-191) yields NULLs in all three — the receiver
    drops the priority, not the record. Pure integer arithmetic, so the
    SQL mirror is ``pri // 8`` / ``pri % 8`` + a CASE band map."""
    p = np.asarray(pri.to_numpy(zero_copy_only=False)
                   if hasattr(pri, "to_numpy") else pri, dtype=np.int64)
    ok = (p >= 0) & (p <= 191)
    fac = np.where(ok, p // 8, 0)
    sev = np.where(ok, p % 8, 0)
    otel = _SYSLOG_TO_OTEL[sev]
    mask = pa.array(ok)
    null64 = pa.scalar(None, pa.int64())
    import pyarrow.compute as pc

    return {
        "facility": pc.if_else(mask, pa.array(fac), null64),
        "syslog_severity": pc.if_else(mask, pa.array(sev), null64),
        "severity_number": pc.if_else(mask, pa.array(otel), null64),
    }
