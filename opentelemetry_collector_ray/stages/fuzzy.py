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


def levenshtein_pairs(strings: pa.Array, ia: np.ndarray, ib: np.ndarray,
                      chunk: int = 1 << 17) -> np.ndarray:
    """Byte-level Levenshtein distance for P explicit pairs
    ``(strings[ia[p]], strings[ib[p]])`` — the pairwise sibling of
    ``levenshtein_matrix``: the same prefix-min DP, but the pattern
    character is a per-pair COLUMN (``amat[:, i-1]``) instead of a
    scalar, so one loop of ``max_len`` rounds covers every pair at
    once. Pairs are processed in ``chunk`` slices to bound the
    P×L temporaries."""
    mat, lens = _padded_bytes(strings)
    pad = mat.shape[1]
    P = len(ia)
    out = np.empty(P, np.int64)
    base = np.arange(1, pad + 1, dtype=np.int64)[None, :]
    for lo in range(0, P, chunk):
        sl = slice(lo, min(lo + chunk, P))
        amat, alens = mat[ia[sl]], lens[ia[sl]]
        bmat, blens = mat[ib[sl]], lens[ib[sl]]
        n = amat.shape[0]
        prev = np.broadcast_to(base, (n, pad)).copy()
        prev0 = np.zeros(n, np.int64)
        res = np.empty(n, np.int64)
        done = alens == 0
        res[done] = blens[done]          # empty pattern: all inserts
        max_a = int(alens.max()) if n else 0
        rows = np.arange(n)
        for i in range(1, max_a + 1):
            ch = amat[:, i - 1]
            cur0 = prev0 + 1
            cost = (bmat != ch[:, None]).astype(np.int64)
            diag = np.concatenate([prev0[:, None], prev[:, :-1]], axis=1)
            c = np.minimum(prev + 1, diag + cost)
            shift = np.concatenate([cur0[:, None], c - base], axis=1)
            cur = np.minimum.accumulate(shift, axis=1)[:, 1:] + base
            prev, prev0 = cur, cur0
            hit = alens == i
            if hit.any():
                full = np.concatenate([prev0[:, None], prev], axis=1)
                res[hit] = full[rows[hit], blens[hit]]
        out[sl] = res
    return out


def edit_distance_pairs(ds: "ray.data.Dataset", id_col: str,
                        text_col: str, max_dist: int,
                        block_col: str | None = None, *,
                        max_len: int = 512,
                        max_block_pairs: int = 20_000_000,
                        n_buckets: int | str = "auto"
                        ) -> "ray.data.Dataset":
    """Blocked big-big edit-distance SELF-join — find all record pairs
    within Levenshtein distance ``max_dist`` (the entity-resolution /
    near-duplicate-key discovery step; ``fuzzy_lookup`` is the
    broadcast small-dictionary sibling, this is the corpus×corpus
    one). Output rows: ``(id_a, id_b, dist)`` with ``id_a < id_b``,
    each qualifying pair exactly once.

    Candidate generation is exact within a block: rows sharing
    ``block_col`` (the user's blocking key — pairs in different blocks
    are NOT compared, the standard recall trade documented by every
    record-linkage system) are length-banded with width
    ``max_dist + 1``; since ``|len(a) − len(b)| ≤ lev(a, b)``, two
    rows within ``max_dist`` land in the same or adjacent bands, so
    each row is emitted to its own band and the next one and pairs
    form inside one band task. Duplicate meetings cancel structurally:
    same-band pairs join as (original, original), adjacent-band pairs
    as (replica, original), and (replica, replica) pairs — the echo of
    a same-band pair one band up — are dropped.

    Scale shape: ONE exchange on (block, band); per bucket the pair
    list is built arithmetically (triangular-number inversion — no
    Python per pair) and scored by the vectorized pairwise DP. The
    per-(block, band) pair count is guarded loudly by
    ``max_block_pairs``: a hot block needs a finer blocking key, never
    a silent truncation."""
    d = int(max_dist)
    if d < 0:
        raise ValueError("edit_distance_pairs: max_dist must be >= 0")
    w = d + 1
    from .bucketing import bucketed_map_groups

    def prep(t: pa.Table) -> pa.Table:
        txt = t.column(text_col)
        if txt.null_count:
            raise ValueError(
                f"edit_distance_pairs: {text_col!r} has nulls — filter "
                "them first")
        nb = pc.binary_length(txt)
        if t.num_rows and pc.max(nb).as_py() > max_len:
            raise ValueError(
                f"edit_distance_pairs: a string exceeds max_len="
                f"{max_len} bytes; truncate or raise the cap")
        band = pc.divide(pc.cast(nb, pa.int64()),
                         pa.scalar(w, pa.int64()))
        if block_col:
            blk = pc.cast(t.column(block_col), pa.string())
            if blk.null_count:
                raise ValueError(
                    f"edit_distance_pairs: {block_col!r} has nulls — a "
                    "null block would collapse the band encoding; "
                    "filter or fill them first")
        else:
            blk = pa.nulls(t.num_rows, pa.string()).fill_null("")
        ids = t.column(id_col)
        orig = pa.table({
            "_blk": pc.binary_join_element_wise(
                blk, pc.cast(band, pa.string()), "\x1f"),
            "_id": ids, "_txt": txt,
            "_repl": pa.nulls(t.num_rows, pa.int8()).fill_null(0)})
        repl = pa.table({
            "_blk": pc.binary_join_element_wise(
                blk, pc.cast(pc.add(band, pa.scalar(1, pa.int64())),
                             pa.string()), "\x1f"),
            "_id": ids, "_txt": txt,
            "_repl": pa.nulls(t.num_rows, pa.int8()).fill_null(1)})
        return pa.concat_tables([orig, repl])

    pre = ds.map_batches(prep, batch_format="pyarrow")

    def pairs_fn(t: pa.Table) -> pa.Table:
        idt = t.column("_id").type
        out_schema = pa.schema([("id_a", idt), ("id_b", idt),
                                ("dist", pa.int64())])
        if t.num_rows == 0:
            return out_schema.empty_table()
        t = t.sort_by([("_blk", "ascending")])
        blk = t.column("_blk").to_numpy(zero_copy_only=False)
        n = len(blk)
        new = np.append(True, blk[1:] != blk[:-1])
        seg_of = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, n)).astype(np.int64)
        pair_counts = sizes * (sizes - 1) // 2
        total = int(pair_counts.sum())
        if total > max_block_pairs:
            raise ValueError(
                f"edit_distance_pairs: {total:,} candidate pairs in one "
                f"bucket exceeds max_block_pairs={max_block_pairs:,} — "
                "use a finer block_col")
        if total == 0:
            return out_schema.empty_table()
        # pair rank -> (segment, local i<j) via triangular inversion
        seg_off = np.cumsum(pair_counts) - pair_counts
        pair_seg = np.repeat(np.arange(len(sizes)), pair_counts)
        r = np.arange(total, dtype=np.int64) - seg_off[pair_seg]
        j = ((1.0 + np.sqrt(1.0 + 8.0 * r.astype(np.float64))) / 2.0
             ).astype(np.int64)
        # float correction: j is the unique int with j(j-1)/2 <= r < j(j+1)/2
        j -= j * (j - 1) // 2 > r
        j += (j + 1) * j // 2 <= r
        i = r - j * (j - 1) // 2
        ia = starts[pair_seg] + i
        ib = starts[pair_seg] + j
        repl = t.column("_repl").to_numpy(zero_copy_only=False)
        keep = ~((repl[ia] == 1) & (repl[ib] == 1))
        ia, ib = ia[keep], ib[keep]
        if len(ia) == 0:
            return out_schema.empty_table()
        dist = levenshtein_pairs(t.column("_txt").combine_chunks(),
                                 ia, ib)
        hit = dist <= d
        ia, ib, dist = ia[hit], ib[hit], dist[hit]
        ids = t.column("_id").to_numpy(zero_copy_only=False)
        a, b = ids[ia], ids[ib]
        lo_, hi_ = np.minimum(a, b), np.maximum(a, b)
        if (lo_ == hi_).any():
            raise ValueError(
                f"edit_distance_pairs: duplicate {id_col!r} values — "
                "ids must be unique")
        return pa.table({"id_a": pa.array(lo_).cast(idt),
                         "id_b": pa.array(hi_).cast(idt),
                         "dist": pa.array(dist)})

    return bucketed_map_groups(pre, "_blk", pairs_fn,
                               n_buckets=n_buckets)
