"""Dynamic attribute maps: a ``map<string,string>`` column with the
``pcommon.Map`` operation surface (SURVEY.md §1.5).

The reference's attributes are an ORDERED kv-list with last-writer-wins
upsert (``/root/reference/pdata/pcommon/map.go:65-319``: Get, Remove,
PutStr, Range...). Here the same surface is vectorized over Arrow
MapArray FLAT buffers — every op is O(total entries) numpy over the
flattened keys/items children plus an offsets rebuild; never a Python
loop over rows. Values are the string-restricted ``Value`` case
(documented engine simplification, otlp_json.py).

Ops: ``build_map`` (columns → map), ``map_get`` (last entry wins, the
upsert read), ``map_put`` (upsert = remove + append), ``map_delete``,
``map_rename``, ``map_keep_keys``, ``map_has``, ``map_len``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MAP_T = pa.map_(pa.string(), pa.string())


def _parts(m: pa.Array | pa.ChunkedArray):
    if isinstance(m, pa.ChunkedArray):
        m = m.combine_chunks()
    off = np.asarray(m.offsets.to_numpy(zero_copy_only=False),
                     dtype=np.int64)
    keys = np.asarray(m.keys.to_numpy(zero_copy_only=False), dtype=object)
    items = np.asarray(m.items.to_numpy(zero_copy_only=False), dtype=object)
    # A zero-copy SLICED MapArray keeps the full (unsliced) keys/items
    # children while its offsets address into them — rebase so every op
    # sees only this slice's entries (otherwise values from rows outside
    # the slice leak in, or boolean masks misalign and raise).
    base = off[0] if len(off) else 0
    if base or (len(off) and off[-1] != len(keys)):
        keys = keys[base: off[-1]]
        items = items[base: off[-1]]
        off = off - base
    return off, keys, items


def _rebuild(off: np.ndarray, keys: np.ndarray, items: np.ndarray) -> pa.Array:
    return pa.MapArray.from_arrays(
        pa.array(off.astype(np.int32)),
        pa.array(keys, pa.string()), pa.array(items, pa.string()))


def build_map(columns: dict[str, pa.Array | pa.ChunkedArray]) -> pa.Array:
    """Fixed columns → map column; a row's entry for a column is omitted
    when the value is null (pcommon.Map has no null values — absent ≠
    empty, batchprocessor/config.go:36-38)."""
    names = list(columns)
    cols = []
    for c in columns.values():
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        cols.append(c)
    n = len(cols[0]) if cols else 0
    valid = np.stack([~np.asarray(c.is_null()) for c in cols], axis=1) \
        if cols else np.zeros((0, 0), bool)
    counts = valid.sum(axis=1)
    off = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=off[1:])
    total = int(off[-1])
    keys = np.empty(total, object)
    items = np.empty(total, object)
    # column-major fill: for column j, its entries land at the row's offset
    # plus the count of valid earlier columns in that row
    before = np.zeros(n, np.int64)
    for j, name in enumerate(names):
        rows = np.flatnonzero(valid[:, j])
        pos = off[rows] + before[rows]
        keys[pos] = name
        vals = cols[j].to_numpy(zero_copy_only=False)
        if vals.dtype.kind not in "OU":  # numeric column → stringify
            vals = np.char.mod("%s", vals)
        items[pos] = vals.astype(object)[rows]
        before[rows] += 1
    items = items.astype(object)
    return _rebuild(off, keys, items)


def map_len(m) -> pa.Array:
    off, _, _ = _parts(m)
    return pa.array(np.diff(off).astype(np.int64))


def map_has(m, key: str) -> pa.Array:
    off, keys, _ = _parts(m)
    n = len(off) - 1
    rows = np.repeat(np.arange(n), np.diff(off))
    hit = np.zeros(n, bool)
    hit[rows[keys == key]] = True
    return pa.array(hit)


def map_get(m, key: str) -> pa.Array:
    """Value of the LAST entry with ``key`` per row (upsert read
    semantics); null when absent."""
    off, keys, items = _parts(m)
    n = len(off) - 1
    rows = np.repeat(np.arange(n), np.diff(off))
    match = np.flatnonzero(keys == key)
    last = np.full(n, -1, np.int64)
    np.maximum.at(last, rows[match], match)
    out = np.empty(n, object)
    got = last >= 0
    out[got] = items[last[got]]
    out[~got] = None
    return pa.array(out, pa.string())


def map_delete(m, key: str) -> pa.Array:
    off, keys, items = _parts(m)
    n = len(off) - 1
    keep = keys != key
    rows = np.repeat(np.arange(n), np.diff(off))
    counts = np.bincount(rows[keep], minlength=n)
    new_off = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=new_off[1:])
    return _rebuild(new_off, keys[keep], items[keep])


def map_keep_keys(m, keys_to_keep) -> pa.Array:
    off, keys, items = _parts(m)
    n = len(off) - 1
    # object-dtype isin: no fixed-width unicode cast (a 'U64' cast would
    # silently truncate >64-char keys and conflate distinct ones)
    keep = np.isin(keys, np.asarray(list(keys_to_keep), dtype=object))
    rows = np.repeat(np.arange(n), np.diff(off))
    counts = np.bincount(rows[keep], minlength=n)
    new_off = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=new_off[1:])
    return _rebuild(new_off, keys[keep], items[keep])


def map_put(m, key: str, values) -> pa.Array:
    """Upsert (PutStr): remove any existing entries for ``key``, append one
    entry at the row's end. ``values`` is a same-length array (null value →
    no entry for that row) or a scalar string."""
    base = map_delete(m, key)
    off, keys, items = _parts(base)
    n = len(off) - 1
    if isinstance(values, str):
        # slice-assign, NOT np.full: np.full treats a str fill value as a
        # C string and silently truncates at an embedded NUL byte
        vals = np.empty(n, object)
        vals[:] = values
        valid = np.ones(n, bool)
    else:
        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        vals = np.asarray(values.to_numpy(zero_copy_only=False), object)
        valid = ~np.asarray(values.is_null())
    adds = valid.astype(np.int64)
    before = np.concatenate([[0], np.cumsum(adds)[:-1]])
    counts = np.diff(off)
    total = int(off[-1] + adds.sum())
    new_keys = np.empty(total, object)
    new_items = np.empty(total, object)
    old_rows = np.repeat(np.arange(n), counts)
    old_pos = np.arange(len(keys)) + before[old_rows]
    new_keys[old_pos] = keys
    new_items[old_pos] = items
    app_rows = np.flatnonzero(valid)
    app_pos = off[app_rows + 1] + before[app_rows]
    new_keys[app_pos] = key
    new_items[app_pos] = vals[app_rows]
    new_off = off + np.concatenate([[0], np.cumsum(adds)])
    return _rebuild(new_off, new_keys, new_items)


def map_rename(m, old: str, new: str) -> pa.Array:
    """Rename a key in place (order-preserving: the entry keeps its slot,
    unlike delete+put which would move it to the end)."""
    off, keys, items = _parts(m)
    keys = keys.copy()
    keys[keys == old] = new
    return _rebuild(off, keys, items)
