"""IPv4 attribute lanes: parse / format / subnet / CIDR classify.

Log pipelines carry client addresses as plain string attributes (the
reference surfaces them via ``client.Info.Addr`` — reference
``client/client.go:67-75`` — and endpoint strings validated by
``config/confignet/confignet.go``); enrichment then needs the integer
form (range joins against allocation tables), the subnet rollup key,
and an RFC 1918 / special-range class. Everything here is a
whole-column Arrow/numpy kernel over int64 address lanes — an IPv4 is
just a uint32, so the dotted-quad string is presentation, not data.

Malformed strings parse to NULL (count them; never guess), matching
the repo-wide rule that corrupt wire input fails visibly
(sources/compression.py) while per-row dirt degrades to null lanes
(functions/tracectx.py traceparent).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_IPV4_RE = (r"^(?P<o1>[0-9]{1,3})\.(?P<o2>[0-9]{1,3})"
            r"\.(?P<o3>[0-9]{1,3})\.(?P<o4>[0-9]{1,3})$")


def _as_array(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col


def ipv4_format(ints: pa.Array | pa.ChunkedArray) -> pa.Array:
    """int64 addresses (0..2^32-1) → dotted-quad strings; null → null,
    out-of-range raises loudly (an address lane holding 2^32+ is a
    pipeline bug, not row dirt)."""
    arr = _as_array(ints)
    lo = pc.min_max(arr)
    if len(arr) - arr.null_count:
        if lo["min"].as_py() < 0 or lo["max"].as_py() > 0xFFFFFFFF:
            raise ValueError(
                "ipv4_format: address outside [0, 2^32) — not an IPv4 "
                "lane")
    octets = [pc.cast(pc.bit_wise_and(
        pc.shift_right(arr, pa.scalar(s, arr.type)),
        pa.scalar(255, arr.type)), pa.string()) for s in (24, 16, 8, 0)]
    return pc.binary_join_element_wise(
        octets[0], octets[1], octets[2], octets[3], ".")


def ipv4_parse(strings: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Dotted-quad strings → int64 addresses; anything that is not
    exactly four 1-3 digit octets each <= 255 (junk suffixes, empty
    octets, values like 300) → NULL. One RE2 extract + integer
    arithmetic — no per-row Python."""
    arr = _as_array(strings)
    parts = pc.extract_regex(arr, pattern=_IPV4_RE)
    out = pa.nulls(len(arr), pa.int64())
    valid = pc.is_valid(parts).to_numpy(zero_copy_only=False)
    if not valid.any():
        return out
    oct_np = []
    ok = valid.copy()
    vmask = pa.array(valid)
    for name in ("o1", "o2", "o3", "o4"):
        # non-matching rows leave EMPTY strings (not nulls) in the
        # struct children — mask them before the cast
        f = pc.if_else(vmask, parts.field(name), pa.scalar("0"))
        o = pc.cast(f, pa.int64()).fill_null(0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        ok &= o <= 255
        oct_np.append(o)
    vals = ((oct_np[0] << 24) | (oct_np[1] << 16)
            | (oct_np[2] << 8) | oct_np[3])
    return pc.if_else(pa.array(ok), pa.array(vals, pa.int64()),
                      pa.scalar(None, pa.int64()))


def cidr_range(cidr: str) -> tuple[int, int]:
    """'a.b.c.d/p' → inclusive (lo, hi) int range. The base address is
    masked to the prefix (10.1.2.3/8 means 10.0.0.0/8)."""
    try:
        addr_s, _, plen_s = cidr.partition("/")
        plen = int(plen_s)
        octs = [int(x) for x in addr_s.split(".")]
    except ValueError:
        raise ValueError(f"cidr_range: malformed CIDR {cidr!r}")
    if len(octs) != 4 or not all(0 <= o <= 255 for o in octs) \
            or not 0 <= plen <= 32:
        raise ValueError(f"cidr_range: malformed CIDR {cidr!r}")
    addr = (octs[0] << 24) | (octs[1] << 16) | (octs[2] << 8) | octs[3]
    size = 1 << (32 - plen)
    lo = addr & ~(size - 1) & 0xFFFFFFFF
    return lo, lo + size - 1


def subnet_prefix(ints: pa.Array | pa.ChunkedArray, prefix: int
                  ) -> pa.Array:
    """Zero the host bits: the /prefix network address as int64 (the
    natural rollup / partition key for address lanes)."""
    if not 0 <= prefix <= 32:
        raise ValueError("subnet_prefix: prefix must be in [0, 32]")
    arr = _as_array(ints)
    mask = (~((1 << (32 - prefix)) - 1)) & 0xFFFFFFFF
    return pc.bit_wise_and(arr, pa.scalar(mask, pa.int64()))


def classify_cidr(ints: pa.Array | pa.ChunkedArray,
                  rules: list[tuple[str, str]],
                  default: str = "public") -> pa.Array:
    """First-match CIDR classification (same first-match contract as
    stages/route.py): ordered (label, cidr) rules, unmatched non-null
    addresses get ``default``, null stays null. Vectorized as one
    integer range test per RULE (bounded rule lists), not per row."""
    arr = _as_array(ints)
    assigned = np.zeros(len(arr), bool)
    vals = arr.fill_null(-1).to_numpy(zero_copy_only=False)
    labels = np.full(len(arr), default, object)
    for label, cidr in rules:
        lo, hi = cidr_range(cidr)
        hit = (~assigned) & (vals >= lo) & (vals <= hi)
        labels[hit] = label
        assigned |= hit
    return pc.if_else(pc.is_valid(arr), pa.array(labels, pa.string()),
                      pa.scalar(None, pa.string()))
