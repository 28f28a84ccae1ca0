"""pcommon.Map surface over Arrow map<string,string> columns — ordered
kv-list semantics, last-writer-wins upsert, absent ≠ empty
(functions/mapattrs.py; reference pdata/pcommon/map.go:65-319)."""

import pyarrow as pa

from opentelemetry_collector_ray.functions import mapattrs as M


def _base():
    return M.build_map({
        "level": pa.array(["INFO", None, "ERROR"]),
        "tool": pa.array(["bash", "py", None]),
    })


def test_build_map_omits_nulls():
    m = _base()
    assert m.to_pylist() == [[("level", "INFO"), ("tool", "bash")],
                             [("tool", "py")],
                             [("level", "ERROR")]]
    assert M.map_len(m).to_pylist() == [2, 1, 1]
    assert M.map_has(m, "level").to_pylist() == [True, False, True]
    assert M.map_get(m, "tool").to_pylist() == ["bash", "py", None]


def test_put_appends_and_upserts():
    m = M.map_put(_base(), "status", pa.array(["ok", None, "err"]))
    assert m.to_pylist() == [
        [("level", "INFO"), ("tool", "bash"), ("status", "ok")],
        [("tool", "py")],
        [("level", "ERROR"), ("status", "err")]]
    # upsert of an existing key replaces every row's value
    m2 = M.map_put(m, "tool", "zzz")
    assert M.map_get(m2, "tool").to_pylist() == ["zzz", "zzz", "zzz"]


def test_delete_rename_keep():
    m = M.map_put(_base(), "status", pa.array(["ok", None, "err"]))
    assert M.map_delete(m, "tool").to_pylist()[0] == \
        [("level", "INFO"), ("status", "ok")]
    ren = M.map_rename(m, "level", "lvl")
    assert M.map_get(ren, "lvl").to_pylist() == ["INFO", None, "ERROR"]
    # rename preserves entry order (in-place), unlike delete+put
    assert ren.to_pylist()[0][0] == ("lvl", "INFO")
    assert M.map_keep_keys(m, ["status"]).to_pylist() == \
        [[("status", "ok")], [], [("status", "err")]]


def test_last_writer_wins_read():
    raw = pa.array([[("k", "1"), ("k", "2")]], M.MAP_T)
    assert M.map_get(raw, "k").to_pylist() == ["2"]


def test_empty_and_chunked():
    empty = pa.array([], M.MAP_T)
    assert M.map_len(empty).to_pylist() == []
    assert M.map_get(empty, "x").to_pylist() == []
    chunked = pa.chunked_array([_base(), _base()])
    assert M.map_len(chunked).to_pylist() == [2, 1, 1, 2, 1, 1]


# ---------------------------------------------------------------- property

from hypothesis import given, settings
from hypothesis import strategies as st

_keys = st.sampled_from(["a", "b", "c", "d"])
_maps = st.lists(st.lists(st.tuples(_keys, st.text(max_size=5)),
                          max_size=5), min_size=1, max_size=8)


def _ref_get(rows, key):
    out = []
    for row in rows:
        hit = None
        for k, v in row:
            if k == key:
                hit = v
        out.append(hit)
    return out


@settings(max_examples=50, deadline=None)
@given(_maps, _keys, st.text(max_size=4))
def test_map_ops_match_row_reference(rows, key, newval):
    m = pa.array(rows, M.MAP_T)
    # get == last-entry-wins row scan
    assert M.map_get(m, key).to_pylist() == _ref_get(rows, key)
    # delete removes exactly that key's entries, order preserved
    assert M.map_delete(m, key).to_pylist() == \
        [[(k, v) for k, v in row if k != key] for row in rows]
    # put == delete-then-append, then get returns the new value everywhere
    put = M.map_put(m, key, newval)
    assert put.to_pylist() == \
        [[(k, v) for k, v in row if k != key] + [(key, newval)]
         for row in rows]
    assert M.map_get(put, key).to_pylist() == [newval] * len(rows)
    # has/len agree with the raw rows
    assert M.map_has(m, key).to_pylist() == \
        [any(k == key for k, _ in row) for row in rows]
    assert M.map_len(m).to_pylist() == [len(row) for row in rows]


def test_sliced_map_arrays_rebased():
    """Zero-copy sliced MapArrays keep full children; ops must rebase
    (regression: values leaked from rows outside the slice)."""
    m = pa.array([[("a", "1")], [("b", "2")], [("a", "3"), ("c", "4")],
                  [("c", "5")]], M.MAP_T)
    s = m.slice(2)
    assert M.map_get(s, "a").to_pylist() == ["3", None]
    assert M.map_delete(s, "c").to_pylist() == [[("a", "3")], []]
    assert M.map_len(s).to_pylist() == [2, 1]
    assert M.map_has(s, "c").to_pylist() == [True, True]
    assert M.map_put(s, "z", "9").to_pylist() == \
        [[("a", "3"), ("c", "4"), ("z", "9")], [("c", "5"), ("z", "9")]]


def test_build_map_stringifies_numeric():
    m = M.build_map({"latency": pa.array([10, 20], pa.int64()),
                     "name": pa.array(["x", None])})
    assert m.to_pylist() == [[("latency", "10"), ("name", "x")],
                             [("latency", "20")]]
