"""Filter, batching/split, join, multimodal, aggregate-partial stages."""

import numpy as np
import pyarrow as pa
import pytest

from opentelemetry_collector_ray.stages.aggregate import PartialCountStage
from opentelemetry_collector_ray.stages.batching import (
    DEFAULT_SEND_BATCH_SIZE, TooManyBatchersError, split_table)
from opentelemetry_collector_ray.stages.filterstage import FilterConfig, FilterStage
from opentelemetry_collector_ray.stages.join import BroadcastJoinStage
from opentelemetry_collector_ray.stages.multimodal import (
    DecodeStage, FeatureStage, FrameSampleStage, synth_media)


def test_filter_strict_and_regex():
    t = pa.table({"role": pa.array(["user", "tool", "system", None]),
                  "text": pa.array(["abc", "xbcd", "zzz", "abc"])})
    out = FilterStage(include=FilterConfig("role", strict=("user", "tool")))(t)
    assert out.column("role").to_pylist() == ["user", "tool"]
    out = FilterStage(include=FilterConfig("text", regex="bc"))(t)
    assert out.column("text").to_pylist() == ["abc", "xbcd", "abc"]
    out = FilterStage(include=FilterConfig("text", regex="bc"),
                      exclude=FilterConfig("role", strict=("tool",)))(t)
    assert out.column("text").to_pylist() == ["abc", "abc"]
    with pytest.raises(ValueError):
        FilterConfig("x", strict=("a",), regex="b")
    with pytest.raises(ValueError):
        FilterConfig("x")


def test_split_table_exact_sizes():
    t = pa.table({"i": pa.array(range(25))})
    parts = split_table(t, 10)
    assert [p.num_rows for p in parts] == [10, 10, 5]
    assert pa.concat_tables(parts).equals(t)  # lossless
    assert DEFAULT_SEND_BATCH_SIZE == 8192


def test_broadcast_join_inner_left():
    left = pa.table({"k": pa.array([1, 2, 3, 2]), "v": pa.array(list("abcd"))})
    right = pa.table({"k": pa.array([1, 2]), "name": pa.array(["one", "two"])})
    out = BroadcastJoinStage(right, key="k")(left)
    assert out.column("name").to_pylist() == ["one", "two", "two"]
    out = BroadcastJoinStage(right, key="k", how="left")(left)
    assert out.column("name").to_pylist() == ["one", "two", None, "two"]
    dup = pa.table({"k": pa.array([1, 1]), "x": pa.array([1, 2])})
    with pytest.raises(ValueError):
        BroadcastJoinStage(dup, key="k")


def test_partial_count_stage_identity():
    rng = np.random.default_rng(0)
    t = pa.table({"g": pa.array(rng.choice(["a", "b", "c"], 100)),
                  "v": pa.array(rng.integers(0, 10, 100))})
    out = PartialCountStage(["g"], count_name="n", sum_cols={"sv": "v"})(t)
    df = out.to_pandas().set_index("g")
    ref = t.to_pandas().groupby("g")["v"].agg(["size", "sum"])
    for g in ref.index:
        assert df.loc[g, "n"] == ref.loc[g, "size"]
        assert df.loc[g, "sv"] == ref.loc[g, "sum"]


def test_multimodal_plumbing():
    media = synth_media(16, payload_bytes=256)
    decoded = DecodeStage(codec="fake", target=(8, 8))(media)
    assert "payload" not in decoded.column_names
    assert len(decoded.column("pixels")[0].as_py()) == 64
    feats = FeatureStage()(decoded)
    assert "feat_mean" in feats.column_names and len(feats) == 16
    frames = FrameSampleStage(every_k=100)(media)
    assert all(len(f) >= 1 for f in frames.column("frame_idxs").to_pylist())
    # real codec is a clearly-marked stub
    with pytest.raises(NotImplementedError):
        DecodeStage(codec="real")._decode_one(b"xx")


def test_metadata_cardinality_guard(ray_session):
    import ray.data

    from opentelemetry_collector_ray.stages.batching import check_metadata_cardinality

    ds = ray.data.from_arrow(pa.table({"k": pa.array(list("abcd") * 5)}))
    assert check_metadata_cardinality(ds, ["k"], limit=10) == 4
    with pytest.raises(TooManyBatchersError):
        check_metadata_cardinality(ds, ["k"], limit=3)


def test_audio_wav_pipeline(ray_session):
    """REAL audio codec: genuine WAV bytes → stdlib-wave decode (actor
    pool) → features; dominant-frequency estimate recovers the synthesized
    tone within 15% for most rows."""
    import numpy as np
    import ray.data

    from opentelemetry_collector_ray.stages.multimodal import (
        AudioDecodeStage, AudioFeatureStage, synth_wav_media)

    t = synth_wav_media(32, seed=3)
    ds = ray.data.from_arrow(t)
    out = ds.map_batches(AudioDecodeStage, batch_format="pyarrow",
                         batch_size=8, concurrency=2) \
        .map_batches(AudioFeatureStage(), batch_format="pyarrow").to_pandas()
    out = out.sort_values("media_id").reset_index(drop=True)
    freqs = t.column("freq_hz").to_numpy(zero_copy_only=False)
    rel_err = np.abs(out["dominant_hz"].to_numpy() - freqs) / freqs
    assert (rel_err < 0.15).mean() > 0.8
    assert (out["duration_ms"] == 100).all()
    assert (out["rms"] > 0).all() and (out["peak"] <= 32767).all()


def test_bytes_budget_batch_size(ray_session):
    import ray.data

    from opentelemetry_collector_ray.stages.multimodal import (
        bytes_budget_batch_size, synth_media)

    ds = ray.data.from_arrow(synth_media(64, payload_bytes=4096))
    bs = bytes_budget_batch_size(ds, budget_bytes=1 << 20)
    assert bs == (1 << 20) // 4096  # 256 rows of 4 KiB per 1 MiB batch
