"""functions/: attrs (OTTL ops), hashing, text analysis kernels."""

import numpy as np
import pyarrow as pa
import pytest

from opentelemetry_collector_ray.functions import attrs
from opentelemetry_collector_ray.functions.hashing import bucket_of, hash64, hash64_ints
from opentelemetry_collector_ray.functions.text import (
    fingerprint_minima, lang_id, md5_hex, quality_features, token_count)


@pytest.fixture
def t():
    return pa.table({
        "a": pa.array(["x", "y", None]),
        "b": pa.array([1, 2, 3]),
        "text": pa.array(["hello world", "foo bar baz", ""]),
    })


def test_set_delete_keep_rename(t):
    out = attrs.set_attr(t, "c", "v")
    assert out.column("c").to_pylist() == ["v"] * 3
    out = attrs.set_attr(out, "c", pa.array(["1", "2", "3"]))  # upsert
    assert out.column("c").to_pylist() == ["1", "2", "3"]
    assert "a" not in attrs.delete_attr(t, "a").column_names
    assert attrs.delete_attr(t, "zzz").equals(t)  # absent → no-op
    assert attrs.keep_keys(t, ["b", "text"]).column_names == ["b", "text"]
    assert "a2" in attrs.rename_attr(t, "a", "a2").column_names


def test_replace_match_and_copy(t):
    out = attrs.replace_match(t, "text", r"o", "0")
    assert out.column("text").to_pylist()[0] == "hell0 w0rld"
    out = attrs.copy_attr(t, "a", "a_copy")
    assert out.column("a_copy").to_pylist() == out.column("a").to_pylist()


def test_drop_where(t):
    import pyarrow.compute as pc

    out = attrs.drop_where(t, pc.equal(t.column("b"), 2))
    assert out.column("b").to_pylist() == [1, 3]
    # null mask rows are kept (null-false semantics)
    out = attrs.drop_where(t, pc.equal(t.column("a"), "x"))
    assert out.column("b").to_pylist() == [2, 3]


def test_to_attr_map(t):
    out = attrs.to_attr_map(t, ["a", "text"])
    m = out.column("attrs").to_pylist()
    assert dict(m[0]) == {"a": "x", "text": "hello world"}
    assert dict(m[2]) == {"text": ""}  # null a omitted; empty text kept


def test_hash64_stability_and_nulls():
    col = pa.array(["abc", "abc", "def", None])
    h = hash64(col)
    assert h[0] == h[1] and h[0] != h[2]
    h2 = hash64(col)
    assert (h == h2).all()
    b = bucket_of(col, 16)
    assert ((b >= 0) & (b < 16)).all()


def test_hash64_ints_seeded():
    a = np.arange(10)
    assert not (hash64_ints(a, 0) == hash64_ints(a, 1)).any()
    assert (hash64_ints(a, 7) == hash64_ints(a, 7)).all()


def test_token_count_and_quality():
    col = pa.array(["a  b c", "", "one"])
    assert token_count(col).to_pylist() == [3, 0, 1]
    feats = quality_features(col)
    assert feats["n_chars"].to_pylist() == [6, 0, 3]
    scores = feats["quality_score"].to_pylist()
    assert all(0.0 <= s <= 1.0 for s in scores)


def test_lang_id():
    col = pa.array([
        "the cat and the dog in the house",
        "der Hund ist nicht mit der Katze",
        "el perro y la casa de los gatos es una",
        "le chat est dans la maison pour les chiens",
        "这是一个中文句子",
        "zzz qqq www",
    ])
    assert lang_id(col).to_pylist() == ["en", "de", "es", "fr", "zh", "und"]


def test_md5_matches_duckdb():
    import duckdb

    col = pa.array(["hello", "", "ünïcødé ✓"])
    ours = md5_hex(col).to_pylist()
    con = duckdb.connect()
    for s, h in zip(col.to_pylist(), ours):
        assert con.execute("SELECT md5(?)", [s]).fetchone()[0] == h


def test_fingerprint_minima_shape():
    col = pa.array(["one two three four five six seven eight nine ten " * 5,
                    "short", ""])
    fp = fingerprint_minima(col, k=3, window=4)
    lists = fp.to_pylist()
    assert len(lists[0]) >= 1
    assert lists[1] == [] or len(lists[1]) >= 0
    assert lists[2] == []
    # deterministic
    assert fp.to_pylist() == fingerprint_minima(col, k=3, window=4).to_pylist()
