"""Text-analysis kernels for training-data pipelines: token counting,
quality scoring, language-ID, document fingerprinting.

All functions are whole-column Arrow/numpy kernels intended to run inside
``map_batches(..., batch_format="pyarrow")``; none loops over Python rows
except the explicitly-documented md5 oracle helper.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = r"\S+"
WORDISH_RE = r"[\w]+|[^\w\s]"  # BPE-ish: words plus individual punctuation
PUNCT_RE = r"[^\w\s]"

# Tiny marker-word inventories for the n-gram/stopword language heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"],
    "es": ["el", "la", "de", "que", "los", "una", "por", "con", "para", "es"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "pour", "que", "sur"],
}
CJK_RE = r"[一-鿿぀-ヿ]"


def token_count(col: pa.ChunkedArray | pa.Array, pattern: str = TOKEN_RE) -> pa.ChunkedArray:
    """Whitespace token count (``\\S+`` matches); 0 for empty/blank."""
    return pc.count_substring_regex(col, pattern=pattern)


def quality_features(col: pa.ChunkedArray | pa.Array) -> dict[str, pa.Array]:
    """Length / punctuation / token-shape quality features.

    Returns columns: n_chars, n_tokens, n_punct, punct_ratio,
    mean_token_len, quality_score (a deterministic [0,1] heuristic).
    """
    n_chars = pc.utf8_length(col).cast(pa.int64())
    n_tokens = pc.count_substring_regex(col, pattern=TOKEN_RE).cast(pa.int64())
    n_punct = pc.count_substring_regex(col, pattern=PUNCT_RE).cast(pa.int64())
    nc = n_chars.combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64) \
        if isinstance(n_chars, pa.ChunkedArray) else n_chars.to_numpy(zero_copy_only=False).astype(np.float64)
    nt = (n_tokens.combine_chunks() if isinstance(n_tokens, pa.ChunkedArray) else n_tokens) \
        .to_numpy(zero_copy_only=False).astype(np.float64)
    npunct = (n_punct.combine_chunks() if isinstance(n_punct, pa.ChunkedArray) else n_punct) \
        .to_numpy(zero_copy_only=False).astype(np.float64)
    punct_ratio = np.divide(npunct, np.maximum(nc, 1.0))
    mean_tok = np.divide(nc, np.maximum(nt, 1.0))
    # Heuristic: reward 50..5000 chars, 3..12 mean token length, low punct.
    len_score = np.clip(np.minimum(nc / 50.0, 5000.0 / np.maximum(nc, 1.0)), 0, 1)
    tok_score = np.clip(1.0 - np.abs(mean_tok - 6.0) / 12.0, 0, 1)
    punct_score = np.clip(1.0 - punct_ratio * 4.0, 0, 1)
    score = (len_score + tok_score + punct_score) / 3.0
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "n_punct": n_punct,
        "punct_ratio": pa.array(punct_ratio),
        "mean_token_len": pa.array(mean_tok),
        "quality_score": pa.array(score),
    }


def lang_id(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Marker-word + CJK-script language heuristic → 2-letter code or 'und'.

    One vectorized regex count pass per language (≤5 passes/batch); argmax
    of marker hits, 'zh' when CJK chars present, 'und' when nothing hits.
    """
    lowered = pc.utf8_lower(col)
    n = len(col)
    scores = np.zeros((n, len(LANG_MARKERS)), dtype=np.int64)
    for j, (_lang, words) in enumerate(LANG_MARKERS.items()):
        pat = r"\b(" + "|".join(words) + r")\b"
        c = pc.count_substring_regex(lowered, pattern=pat)
        scores[:, j] = (c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c) \
            .to_numpy(zero_copy_only=False)
    cjk = pc.count_substring_regex(col, pattern=CJK_RE)
    cjk_np = (cjk.combine_chunks() if isinstance(cjk, pa.ChunkedArray) else cjk) \
        .to_numpy(zero_copy_only=False)
    langs = np.array(list(LANG_MARKERS.keys()))
    best = scores.argmax(axis=1)
    out = langs[best].astype(object)
    out[scores.max(axis=1) == 0] = "und"
    out[cjk_np > 0] = "zh"
    return pa.array(out, pa.string())


def md5_hex(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Content fingerprint as md5 hex — matches DuckDB ``md5(text)`` for the
    oracle gate. Per-row hashlib (C speed); at 100 TB scale prefer
    ``hashing.hash64`` for partitioning and keep md5 only where an
    external-standard digest is required."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return pa.array(
        [hashlib.md5(s.encode()).hexdigest() if s is not None else None
         for s in col.to_pylist()],
        pa.string(),
    )


def fingerprint_minima(col: pa.ChunkedArray | pa.Array, k: int = 5, window: int = 8,
                       ) -> pa.ListArray:
    """Winnowing-style rolling-hash fingerprint: k-gram word shingles hashed
    with splitmix64, minimum per sliding window → sorted unique fingerprint
    list per document (list<uint64> column)."""
    from .hashing import hash64, hash64_ints

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    split = pc.split_pattern_regex(pc.utf8_lower(col), pattern=r"\W+")
    offsets_out = [0]
    values: list[np.ndarray] = []
    for words in split.to_pylist():
        words = [w for w in (words or []) if w]
        if len(words) < k:
            offsets_out.append(offsets_out[-1])
            continue
        wh = hash64(pa.array(words))
        sh = wh[: len(wh) - k + 1].copy()
        for j in range(1, k):
            sh = hash64_ints(sh ^ wh[j: j + len(sh)])
        if len(sh) <= window:
            mins = np.array([sh.min()], dtype=np.uint64)
        else:
            win = np.lib.stride_tricks.sliding_window_view(sh, window)
            mins = np.unique(win.min(axis=1))
        values.append(mins)
        offsets_out.append(offsets_out[-1] + len(mins))
    flat = np.concatenate(values) if values else np.empty(0, np.uint64)
    return pa.ListArray.from_arrays(pa.array(offsets_out, pa.int32()),
                                    pa.array(flat, pa.uint64()))
