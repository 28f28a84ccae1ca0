"""Expectation validation (stages/validate.py): every rule kind, null
semantics, distributed unique, unknown-kind guard."""

import pyarrow as pa
import pytest
import ray.data

from opentelemetry_collector_ray.stages.validate import validate_rules


def _ds():
    return ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "v": pa.array([10, 55, None, -3, 20, 20], pa.int64()),
        "s": pa.array(["ok", "bad!", None, "ok", "meh", "ok"]),
        "k": pa.array([7, 8, 9, 7, 10, 7], pa.int64()),
    })).repartition(3)


def test_row_local_rules(ray_session):
    out = validate_rules(_ds(), {
        "v_not_null": ("not_null", "v"),
        "v_range": ("in_range", "v", 0, 50),
        "s_set": ("in_set", "s", ["ok", "meh"]),
        "s_shape": ("matches", "s", "[a-z]+"),
    }, id_col="id").to_pandas()
    got = {(r, int(i)) for r, i in zip(out["rule"], out["id"])}
    assert got == {
        ("v_not_null", 3),
        ("v_range", 2), ("v_range", 4),   # null v passes range
        ("s_set", 2),                      # null s passes set
        ("s_shape", 2),                    # 'bad!' fails full match
    }


def test_unique_rule_flags_all_occurrences(ray_session):
    out = validate_rules(_ds(), {"k_unique": ("unique", "k")},
                         id_col="id").to_pandas()
    assert sorted(out["id"]) == [1, 4, 6]  # every row of duplicated k=7
    assert set(out["rule"]) == {"k_unique"}


def test_validate_guards(ray_session):
    with pytest.raises(ValueError, match="non-empty"):
        validate_rules(_ds(), {}, id_col="id")
    with pytest.raises(ValueError, match="unknown rule kind"):
        validate_rules(_ds(), {"x": ("positive", "v")}, id_col="id")
