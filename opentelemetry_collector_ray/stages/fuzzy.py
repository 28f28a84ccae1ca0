"""Fuzzy string matching — the entity-resolution primitive a curation
pipeline uses to reconcile dirty keys (vendor names, user handles, OCR'd
titles) against a small canonical dictionary.

``fuzzy_lookup`` is a broadcast edit-distance join: the canonical side
ships once via ``ray.put`` (loudly guarded — it is the small side by
contract, like ``stages/enrich.py``'s dictionaries), and each batch
computes byte-level Levenshtein distance from every probe string to
every candidate with a fully vectorized numpy DP — no Python per row,
per pair, or per character.

Vectorization: the classic DP ``d[i][j] = min(d[i-1][j]+1, d[i][j-1]+1,
d[i-1][j-1]+cost)`` has a sequential dependency along ``j`` through the
``d[i][j-1]+1`` insertion term. That term is a running minimum of
``c[j] - j`` (where ``c`` is the candidate from the other two arms), so
one ``np.minimum.accumulate`` per pattern row replaces the inner loop:
``d[i] = minimum.accumulate(c - arange) + arange``. Cost is
O(K · M · N·L) element ops for K candidates of length ≤ M against N
probes of padded length L — all SIMD, batch-local, shuffle-free.

Semantics: distances are over UTF-8 BYTES (identical to character
distance for ASCII; DuckDB's ``levenshtein`` is character-based —
documented so oracle inputs stay ASCII). Best match = minimum distance,
ties broken by the lexically smallest candidate (deterministic and
SQL-mirrorable as ``ROW_NUMBER() OVER (ORDER BY dist, cand)``); probes
whose best distance exceeds ``max_dist`` get null match columns
(left-join convention). Reference semantics analog: the collector's
strict/regex filtersets (`internal/filter/filterset/filterset.go`) stop
at exact/regex match — fuzzy matching is the curation-grade extension.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

__all__ = ["levenshtein_matrix", "fuzzy_lookup", "FuzzyLookupStage"]

MAX_CANDIDATES = 10_000  # broadcast side guard: K·M DP rows per batch


def _padded_bytes(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(N×L uint8 matrix padded with 0, per-row byte lengths) from a
    string array — built from the Arrow offsets/data buffers, no
    per-row Python."""
    arr = pc.cast(arr, pa.string())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        raise ValueError("fuzzy_lookup: null probe/candidate strings — "
                         "filter or fill them first")
    # Slice-safe: respect arr.offset into the value buffers.
    off = np.frombuffer(arr.buffers()[1], np.int32,
                        count=len(arr) + 1, offset=4 * arr.offset)
    data = np.frombuffer(arr.buffers()[2], np.uint8)
    lens = np.diff(off).astype(np.int64)
    pad = int(lens.max()) if len(lens) else 0
    if pad == 0:
        return np.zeros((len(arr), 0), np.uint8), lens
    idx = off[:-1, None].astype(np.int64) + np.arange(pad)[None, :]
    valid = np.arange(pad)[None, :] < lens[:, None]
    mat = np.where(valid, data[np.minimum(idx, len(data) - 1)],
                   np.uint8(0))
    return mat, lens


def levenshtein_matrix(probes: pa.Array,
                       candidates: pa.Array) -> np.ndarray:
    """N×K int64 matrix of byte-level Levenshtein distances. One numpy
    DP per candidate, vectorized across all probes and positions."""
    pmat, plens = _padded_bytes(probes)
    cmat, clens = _padded_bytes(candidates)
    n, pad = pmat.shape
    k = len(clens)
    out = np.empty((n, k), np.int64)
    if n == 0:
        return out
    base = np.arange(1, pad + 1, dtype=np.int64)[None, :]
    for j in range(k):
        cand = cmat[j, : clens[j]]
        # prev[:, t] = distance(cand[:i], probe[:t]); row 0 = t.
        prev = np.broadcast_to(base, (n, pad)).copy()
        prev0 = np.zeros(n, np.int64)  # column t=0 of prev row
        for i, ch in enumerate(cand):
            cur0 = prev0 + 1
            cost = (pmat != ch).astype(np.int64)
            # candidate arms: deletion (prev+1) and substitution
            # (diag+cost); diag column 0 is prev0.
            diag = np.concatenate([prev0[:, None], prev[:, :-1]], axis=1)
            c = np.minimum(prev + 1, diag + cost)
            # insertion arm is a running min along t:
            # cur[t] = min(c[t], cur[t-1]+1)
            #        = arange(t) + running_min(c - arange, seeded cur0)
            shift = np.concatenate(
                [cur0[:, None],
                 c - np.arange(1, pad + 1, dtype=np.int64)[None, :]],
                axis=1)
            cur = np.minimum.accumulate(shift, axis=1)[:, 1:] + base
            prev, prev0 = cur, cur0
        # distance = dp[len(cand)][len(probe)]
        full = np.concatenate([prev0[:, None], prev], axis=1)
        out[:, j] = full[np.arange(n), plens]
    return out


class FuzzyLookupStage:
    """Actor-pool stage: fetch + pre-encode the candidate dictionary
    once per actor in ``__init__``; each ``__call__`` is the vectorized
    DP + argmin."""

    def __init__(self, cand_ref, probe_col: str, max_dist: int,
                 out_prefix: str):
        cands: pa.Array = ray.get(cand_ref)
        order = pc.sort_indices(cands)  # lexical tie-break by layout
        taken = pc.take(cands, order)
        if isinstance(taken, pa.ChunkedArray):
            taken = taken.combine_chunks()
        self.cands = taken
        self.probe_col = probe_col
        self.max_dist = int(max_dist)
        self.out_prefix = out_prefix

    def __call__(self, t: pa.Table) -> pa.Table:
        dist = levenshtein_matrix(
            t.column(self.probe_col).combine_chunks(), self.cands)
        if dist.shape[1] == 0 or dist.shape[0] == 0:
            best = np.zeros(len(t), np.int64)
            bd = np.full(len(t), np.iinfo(np.int64).max)
        else:
            # candidates are pre-sorted, so the FIRST argmin is the
            # lexically smallest among distance ties.
            best = dist.argmin(axis=1)
            bd = dist[np.arange(len(t)), best]
        ok = bd <= self.max_dist
        match = pc.take(
            self.cands,
            pa.array(best, pa.int64()),
            boundscheck=False) if len(self.cands) else pa.nulls(
                len(t), pa.string())
        match = pc.if_else(pa.array(ok), match, pa.scalar(
            None, pa.string()))
        dcol = pc.if_else(pa.array(ok), pa.array(bd, pa.int64()),
                          pa.scalar(None, pa.int64()))
        p = self.out_prefix
        return t.append_column(f"{p}match", match).append_column(
            f"{p}dist", dcol)


def fuzzy_lookup(ds: ray.data.Dataset, candidates: pa.Array | list,
                 probe_col: str, *, max_dist: int = 2,
                 out_prefix: str = "fuzzy_",
                 concurrency=None) -> ray.data.Dataset:
    """Append ``{out_prefix}match`` / ``{out_prefix}dist``: the best
    (min-distance, lexical tie-break) candidate within ``max_dist``
    byte edits of ``probe_col``, else nulls."""
    cands = pa.array(candidates) if not isinstance(
        candidates, (pa.Array, pa.ChunkedArray)) else candidates
    if isinstance(cands, pa.ChunkedArray):
        cands = cands.combine_chunks()
    if cands.null_count:
        raise ValueError("fuzzy_lookup: null candidate strings")
    if len(cands) > MAX_CANDIDATES:
        raise ValueError(
            f"fuzzy_lookup: {len(cands):,} candidates (> "
            f"{MAX_CANDIDATES:,}); the broadcast DP would dominate — "
            "block on a coarse key (first char / length band) and join "
            "instead")
    ref = ray.put(cands)
    kwargs = dict(cand_ref=ref, probe_col=probe_col, max_dist=max_dist,
                  out_prefix=out_prefix)
    if concurrency:
        return ds.map_batches(FuzzyLookupStage,
                              fn_constructor_kwargs=kwargs,
                              batch_format="pyarrow",
                              concurrency=concurrency)
    return ds.map_batches(FuzzyLookupStage(**kwargs),
                          batch_format="pyarrow")
