"""OTTL-style attribute mutation functions, vectorized over Arrow columns.

The reference's mutation surface is the ``pcommon.Map`` API
(``/root/reference/pdata/pcommon/map.go:65-319``: Get/Remove/PutStr/...)
plus the OTTL function inventory named in the processing RFC
(``/root/reference/docs/rfcs/processing.md:148-238``: set, delete,
keep_keys, replace_match, replace_all_matches, drop-where). The pdata
model mutates one record at a time; here every function is a whole-column
Arrow kernel over a batch — attributes are struct-flattened top-level
columns (schema.py rationale).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyarrow as pa
import pyarrow.compute as pc


def set_attr(table: pa.Table, name: str, value) -> pa.Table:
    """``set(attributes[name], value)`` — upsert semantics (last writer wins,
    map.go PutStr analog). ``value`` is a scalar or an array of len(table)."""
    if not isinstance(value, (pa.Array, pa.ChunkedArray)):
        value = pa.array([value] * table.num_rows)
    if name in table.column_names:
        i = table.column_names.index(name)
        return table.set_column(i, name, value)
    return table.append_column(name, value)


def delete_attr(table: pa.Table, name: str) -> pa.Table:
    """``delete(attributes[name])`` — no-op when absent (map.go Remove)."""
    if name in table.column_names:
        return table.drop_columns([name])
    return table


def keep_keys(table: pa.Table, keys: Sequence[str]) -> pa.Table:
    """``keep_keys(attributes, [...])`` — project to the listed columns,
    preserving table order for the ones present."""
    keep = [n for n in table.column_names if n in set(keys)]
    return table.select(keep)


def rename_attr(table: pa.Table, old: str, new: str) -> pa.Table:
    return table.rename_columns([new if n == old else n for n in table.column_names])


def replace_match(table: pa.Table, name: str, pattern: str, replacement: str,
                  max_replacements: int | None = None) -> pa.Table:
    """``replace_all_matches(attributes[name], pattern, replacement)`` →
    pc.replace_substring_regex (RE2 syntax, same family the reference's
    filter lib compiles — filter/config.go:42-58)."""
    col = pc.replace_substring_regex(
        table.column(name), pattern=pattern, replacement=replacement,
        max_replacements=max_replacements)
    return set_attr(table, name, col)


def copy_attr(table: pa.Table, src: str, dst: str) -> pa.Table:
    """Copy resource-level attr → record attr analog (processing RFC:88-95)."""
    return set_attr(table, dst, table.column(src))


def drop_where(table: pa.Table, mask: pa.ChunkedArray | pa.Array) -> pa.Table:
    """``drop() where <pred>`` — keep rows where mask is False/null-false."""
    keep = pc.invert(pc.fill_null(mask, False))
    return table.filter(keep)


def to_attr_map(table: pa.Table, keys: Sequence[str], out_name: str = "attrs") -> pa.Table:
    """Pack columns into a ``map<string,string>`` column (the dynamic-key
    pcommon.Map wire shape) — null values omitted, mirroring map semantics
    where an absent key is distinct from an empty value."""
    import numpy as np

    n = table.num_rows
    cols = [table.column(k).cast(pa.string()).combine_chunks() for k in keys]
    valid = np.column_stack([c.is_valid().to_numpy(zero_copy_only=False) for c in cols]) \
        if keys else np.zeros((n, 0), bool)
    counts = valid.sum(axis=1).astype(np.int32)
    offsets = np.zeros(n + 1, np.int32)
    np.cumsum(counts, out=offsets[1:])
    key_arr = np.empty(offsets[-1], dtype=object)
    item_arr = np.empty(offsets[-1], dtype=object)
    # Column-major fill: for each key, place into the row slots where valid.
    pos = offsets[:-1].copy()
    for j, k in enumerate(keys):
        vj = valid[:, j]
        rows = np.nonzero(vj)[0]
        vals = np.asarray(cols[j].to_pandas(), dtype=object)
        key_arr[pos[rows]] = k
        item_arr[pos[rows]] = vals[rows]
        pos[rows] += 1
    m = pa.MapArray.from_arrays(pa.array(offsets), pa.array(key_arr, pa.string()),
                                pa.array(item_arr, pa.string()))
    return table.append_column(out_name, m)
