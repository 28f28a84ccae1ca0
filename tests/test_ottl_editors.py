"""OTTL Map/Slice editor functions over the typed attribute map —
keep_matching_keys / delete_matching_keys / truncate_all / limit /
flatten / replace_all_patterns (functions/typedattrs.py; OTTL editor
inventory referenced from docs/rfcs/processing.md:148-238)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from opentelemetry_collector_ray.functions import typedattrs as T


def _base():
    return T.build_typed_map({
        "http.method": pa.array(["GET", "POST", None]),
        "http.status": pa.array([200, 404, 500]),
        "note": pa.array(["aa bb", None, "a-very-long-note"]),
    })


def _entries(m):
    """[(key, (vtype, payload)), ...] per row via the cell contract."""
    return [[(k, T.cell_value(c)) for k, c in row]
            for row in m.to_pylist()]


def test_keep_and_delete_matching_partition():
    m = _base()
    kept = _entries(T.map_keep_matching_keys(m, r"^http\."))
    dropped = _entries(T.map_delete_matching_keys(m, r"^http\."))
    assert [len(a) + len(b) for a, b in zip(kept, dropped)] == \
        [len(r) for r in _entries(m)]
    assert all(k.startswith("http.") for row in kept for k, _ in row)
    assert all(not k.startswith("http.") for row in dropped for k, _ in row)
    # entry order within each side is preserved
    assert [k for k, _ in kept[0]] == ["http.method", "http.status"]


def test_truncate_all_only_strings():
    m = _base()
    out = _entries(T.map_truncate_all(m, 4))
    by0 = dict(out[2])
    assert by0["note"] == (T.VTYPE_STR, "a-ve")
    assert by0["http.status"] == (T.VTYPE_INT, 500)
    # deep container JSON on the s lane is NOT a string value: untouched
    deep = (T.VTYPE_MAP, [("inner", (T.VTYPE_SLICE, [(T.VTYPE_INT, 1)]))])
    items = pa.array([T.cell(*deep)], T.VALUE_T)
    mp = pa.MapArray.from_arrays(pa.array([0, 1], pa.int32()),
                                 pa.array(["d"], pa.string()), items)
    out2 = _entries(T.map_truncate_all(mp, 2))
    assert out2[0][0] == ("d", deep)


def test_limit_priority_keys_and_order():
    m = _base()  # row0 has method, status, note (in insertion order)
    out = _entries(T.map_limit(m, 2, priority_keys=["note"]))
    # note is priority: survives; then first remaining in original order
    assert [k for k, _ in out[0]] == ["http.method", "note"]
    assert [len(r) for r in out] <= [2, 2, 2]
    out_nopri = _entries(T.map_limit(m, 1))
    assert [k for k, _ in out_nopri[0]] == ["http.method"]
    assert _entries(T.map_limit(m, 0)) == [[], [], []]


def test_flatten_one_deep_map_slice_and_deep_passthrough():
    shallow_map = (T.VTYPE_MAP, [("a", (T.VTYPE_STR, "x")),
                                 ("b", (T.VTYPE_INT, 2))])
    shallow_slice = (T.VTYPE_SLICE, [(T.VTYPE_INT, 7),
                                     (T.VTYPE_BOOL, True)])
    empty_slice = (T.VTYPE_SLICE, [])
    deep = (T.VTYPE_MAP, [("inner", shallow_slice)])
    prim = (T.VTYPE_STR, "leaf")
    cells = [T.cell(*c) for c in
             (shallow_map, shallow_slice, empty_slice, deep, prim)]
    items = pa.array(cells, T.VALUE_T)
    mp = pa.MapArray.from_arrays(
        pa.array([0, 5], pa.int32()),
        pa.array(["m", "s", "e", "d", "p"], pa.string()), items)
    out = _entries(T.map_flatten(mp))
    assert out[0] == [
        ("m.a", (T.VTYPE_STR, "x")),
        ("m.b", (T.VTYPE_INT, 2)),
        ("s.0", (T.VTYPE_INT, 7)),
        ("s.1", (T.VTYPE_BOOL, True)),
        # "e" vanished (empty container), "d" deep passthrough
        ("d", deep),
        ("p", prim),
    ]
    # custom separator
    out2 = _entries(T.map_flatten(mp, sep="/"))
    assert out2[0][0][0] == "m/a"


def test_flatten_primitives_only_is_identity():
    m = _base()
    assert _entries(T.map_flatten(m)) == _entries(m)


def test_replace_all_patterns_value_and_key():
    m = _base()
    out = _entries(T.map_replace_all_patterns(m, "value", r"[ab]+", "_"))
    assert dict(out[0])["note"] == (T.VTYPE_STR, "_ _")
    assert dict(out[0])["http.status"] == (T.VTYPE_INT, 200)
    out2 = _entries(T.map_replace_all_patterns(m, "key", r"^http\.", ""))
    assert [k for k, _ in out2[0]] == ["method", "status", "note"]
    try:
        T.map_replace_all_patterns(m, "both", "x", "y")
        assert False, "bad mode must raise"
    except ValueError:
        pass


_KEYS = st.sampled_from(["a", "b", "http.x", "http.y", "zz"])
_ROWS = st.lists(st.lists(
    st.tuples(_KEYS, st.one_of(
        st.text(max_size=6).map(lambda s: (T.VTYPE_STR, s)),
        st.integers(-10, 10).map(lambda i: (T.VTYPE_INT, i)),
        st.lists(st.integers(0, 5), max_size=3).map(
            lambda xs: (T.VTYPE_SLICE, [(T.VTYPE_INT, x) for x in xs])),
    )), max_size=5), min_size=1, max_size=8)


def _mk(rows):
    off = np.cumsum([0] + [len(r) for r in rows]).astype(np.int32)
    keys = pa.array([k for r in rows for k, _ in r], pa.string())
    items = pa.array([T.cell(vt, v) for r in rows for _, (vt, v) in r],
                     T.VALUE_T)
    return pa.MapArray.from_arrays(pa.array(off), keys, items)


@settings(max_examples=60, deadline=None)
@given(_ROWS, st.integers(0, 4))
def test_editors_match_row_reference(rows, lim):
    m = _mk(rows)
    # keep/delete partition vs python reference
    kept = _entries(T.map_keep_matching_keys(m, "http"))
    assert kept == [[(k, v) for k, v in r if "http" in k] for r in rows]
    dropped = _entries(T.map_delete_matching_keys(m, "http"))
    assert dropped == [[(k, v) for k, v in r if "http" not in k]
                       for r in rows]
    # limit: python reference (no priority)
    out = _entries(T.map_limit(m, lim))
    assert out == [r[:lim] for r in rows]
    # flatten: python reference
    flat = _entries(T.map_flatten(m))
    ref = []
    for r in rows:
        row = []
        for k, (vt, v) in r:
            if vt == T.VTYPE_SLICE:
                row.extend((f"{k}.{i}", e) for i, e in enumerate(v))
            else:
                row.append((k, (vt, v)))
        ref.append(row)
    assert flat == ref
