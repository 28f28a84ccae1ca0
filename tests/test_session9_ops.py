"""Unit tests for the ninth-session operator batch: composite tail
sampling (tail_sample_policies), Flesch readability lanes
(readability_counts), the C4-style blocklist screen (blocklist_counts),
and the exact per-key trimmed mean (grouped_trimmed)."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from opentelemetry_collector_ray.functions.text import (
    blocklist_counts, readability_counts)
from opentelemetry_collector_ray.stages.aggregate import grouped_trimmed
from opentelemetry_collector_ray.stages.spanops import tail_sample_policies


def _ds(tbl: pa.Table, n_blocks: int = 3) -> ray.data.Dataset:
    return ray.data.from_arrow(tbl).repartition(n_blocks)


def _md5_permille(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16) % 1000


# --------------------------------------------------- tail_sample_policies

def _span_row(trace, span, start_us, dur, status):
    return (trace, span, "svc", start_us, dur, status)


def _spans_table(rows):
    tr, sp, sv, st, du, sc = zip(*rows)
    return pa.table({
        "trace_id": pa.array(tr), "span_id": pa.array(sp),
        "service": pa.array(sv),
        "start_ts": pa.array(list(st), pa.timestamp("us")),
        "duration_us": pa.array(list(du), pa.int64()),
        "status_code": pa.array(list(sc), pa.int32())})


def test_tail_policies_priority_and_membership(ray_session):
    # trace E: has an error AND is long -> tagged 'error' (priority)
    # trace L: no error, window >= 1000us -> 'latency'
    # trace D: short, no error, digest decides 'prob' vs dropped
    prob_in = next(t for t in (f"t{i}" for i in range(1000))
                   if _md5_permille(t) < 500)
    prob_out = next(t for t in (f"t{i}" for i in range(1000))
                    if _md5_permille(t) >= 500)
    rows = [
        _span_row("E", "e1", 0, 5000, 1), _span_row("E", "e2", 10, 5, 2),
        _span_row("L", "l1", 0, 10, 1), _span_row("L", "l2", 995, 10, 1),
        _span_row(prob_in, "p1", 0, 1, 1),
        _span_row(prob_out, "q1", 0, 1, 1),
    ]
    out = tail_sample_policies(_ds(_spans_table(rows)), latency_us=1000,
                               permille=500, n_buckets=4).to_pandas()
    pol = dict(zip(out.span_id, out.policy))
    assert pol["e1"] == "error" and pol["e2"] == "error"
    assert pol["l1"] == "latency" and pol["l2"] == "latency"
    assert pol["p1"] == "prob"
    assert "q1" not in pol


def test_tail_policies_validates_args(ray_session):
    t = _spans_table([_span_row("a", "s", 0, 1, 1)])
    with pytest.raises(ValueError, match="permille"):
        tail_sample_policies(_ds(t), latency_us=1, permille=2000)
    with pytest.raises(ValueError, match="latency_us"):
        tail_sample_policies(_ds(t), latency_us=-1, permille=10)


def test_tail_policies_rejects_column_collision(ray_session):
    t = _spans_table([_span_row("a", "s", 0, 1, 2)])
    t = t.append_column("policy", pa.array(["x"]))
    with pytest.raises(Exception, match="already exists"):
        tail_sample_policies(_ds(t, 1), latency_us=1,
                             permille=0).to_pandas()


# ----------------------------------------------------- readability_counts

def test_readability_known_text():
    r = readability_counts(pa.array(
        ["The cat sat. On a mat!", "", "xyz"]))
    assert r["n_words"].to_pylist() == [6, 0, 1]
    # '.' and '!' runs -> 2 matches, +1 = 3 "sentences"
    assert r["n_sentences"].to_pylist() == [3, 1, 1]
    # vowel groups: e,a,a,o,a,a -> 6; ''->0; xyz -> 'y' -> 1
    assert r["n_syllables"].to_pylist() == [6, 0, 1]
    w, s, y = 6, 3, 6
    expect = 206835 - (1015 * w) // s - (84600 * y) // w
    assert r["ease_milli"].to_pylist() == [
        expect, None, 206835 - 1015 - 84600]


# ------------------------------------------------------- blocklist_counts

def test_blocklist_word_boundaries_and_keep():
    r = blocklist_counts(pa.array(
        ["a bad word", "badly formed", "BAD Bad bad", "clean text"]),
        ["bad", "worse"])
    assert r["n_hits"].to_pylist() == [1, 0, 3, 0]
    assert r["keep"].to_pylist() == [0, 1, 0, 1]


def test_blocklist_rejects_metacharacters():
    with pytest.raises(ValueError, match="plain"):
        blocklist_counts(pa.array(["x"]), ["a.b"])
    with pytest.raises(ValueError, match="non-empty"):
        blocklist_counts(pa.array(["x"]), [])


# -------------------------------------------------------- grouped_trimmed

def _brute_trimmed(vals, tp):
    vals = sorted(vals)
    n = len(vals)
    d = (n * tp) // 1000
    mid = vals[d:n - d]
    s = sum(mid)
    num = 1000 * s
    den = len(mid)
    mean = (abs(num) // den) * (1 if num >= 0 else -1) if den else None
    return n, len(mid), s, mean


@pytest.mark.parametrize("tp", [0, 100, 250, 499])
def test_grouped_trimmed_matches_bruteforce(ray_session, tp):
    rng = np.random.default_rng(7)
    keys = rng.choice(["a", "b", "c"], size=400)
    # include negative values and heavy ties
    vals = rng.integers(-50, 50, size=400)
    t = pa.table({"k": pa.array(keys), "v": pa.array(vals, pa.int64())})
    out = grouped_trimmed(_ds(t), "k", "v", trim_permille=tp,
                          n_buckets=4).to_pandas()
    for k in "abc":
        expect = _brute_trimmed(vals[keys == k].tolist(), tp)
        row = out[out.k == k].iloc[0]
        got = (row["n"], row["n_mid"], row["sum_mid"], row["mean_milli"])
        assert tuple(int(x) for x in got) == expect, (k, tp)


def test_grouped_trimmed_guards(ray_session):
    t = pa.table({"k": ["a"], "v": pa.array([1.5])})
    with pytest.raises(Exception, match="integer"):
        grouped_trimmed(_ds(t, 1), "k", "v").to_pandas()
    ti = pa.table({"k": ["a"], "v": pa.array([1], pa.int64())})
    with pytest.raises(ValueError, match="trim_permille"):
        grouped_trimmed(_ds(ti, 1), "k", "v", trim_permille=500)


def test_grouped_trimmed_ignores_null_values(ray_session):
    t = pa.table({"k": ["a", "a", "a", "a"],
                  "v": pa.array([1, None, 3, None], pa.int64())})
    out = grouped_trimmed(_ds(t, 1), "k", "v",
                          trim_permille=0).to_pandas()
    assert out.iloc[0]["n"] == 2 and out.iloc[0]["sum_mid"] == 4
