"""Filter, batching/split, join, multimodal, aggregate-partial stages."""

import numpy as np
import pandas as pd
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


def test_png_codec_round_trip():
    """Stdlib PNG: encode → decode is byte-exact for gray and RGB."""
    import numpy as np

    from opentelemetry_collector_ray.stages.multimodal import (
        decode_png, encode_png)

    rng = np.random.default_rng(3)
    gray = rng.integers(0, 256, (13, 7), dtype=np.uint8)
    assert (decode_png(encode_png(gray)) == gray).all()
    rgb = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    assert (decode_png(encode_png(rgb)) == rgb).all()


def test_png_decode_all_filters():
    """Decoder reconstructs scanlines under every PNG filter type
    (None/Sub/Up/Average/Paeth) — filtered streams are handcrafted from a
    known image, so this is true decode coverage, not just our encoder's
    filter-0 output."""
    import struct
    import zlib

    import numpy as np

    from opentelemetry_collector_ray.stages.multimodal import decode_png

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (6, 5), dtype=np.uint8)
    h, w = img.shape

    def paeth(a, b, c):
        p = a + b - c
        pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)

    raw = bytearray()
    filters = [0, 1, 2, 3, 4, 2]
    for y, f in enumerate(filters):
        line = img[y].astype(np.int64)
        prev = img[y - 1].astype(np.int64) if y else np.zeros(w, np.int64)
        filt = np.zeros(w, np.int64)
        for x in range(w):
            left = line[x - 1] if x else 0
            up = prev[x]
            ul = prev[x - 1] if x else 0
            if f == 0:
                filt[x] = line[x]
            elif f == 1:
                filt[x] = line[x] - left
            elif f == 2:
                filt[x] = line[x] - up
            elif f == 3:
                filt[x] = line[x] - ((left + up) >> 1)
            else:
                filt[x] = line[x] - paeth(left, up, ul)
        raw += bytes([f]) + bytes((filt & 0xFF).astype(np.uint8).tolist())

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    payload = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(bytes(raw)))
               + chunk(b"IEND", b""))
    assert (decode_png(payload) == img).all()


def test_media_pipeline_real_png(ray_session):
    """End-to-end image pipeline over GENUINE PNG bytes: decode (actor
    pool, stdlib codec) → resize → features; feature values match the
    directly-computed resized luma."""
    import numpy as np
    import ray.data

    from opentelemetry_collector_ray.stages.multimodal import (
        DecodeStage, FeatureStage, _resize_nearest, _to_gray, decode_png,
        synth_png_media)

    media = synth_png_media(24, seed=11)
    ds = ray.data.from_arrow(media)
    decoded = ds.map_batches(
        DecodeStage, fn_constructor_kwargs={"codec": "real",
                                            "target": (8, 8)},
        batch_format="pyarrow", batch_size=8, concurrency=2)
    out = decoded.map_batches(FeatureStage(), batch_format="pyarrow") \
        .to_pandas().sort_values("media_id").reset_index(drop=True)
    assert len(out) == 24
    for i in (0, 7, 23):
        img = _resize_nearest(
            _to_gray(decode_png(media.column("payload")[i].as_py())), 8, 8)
        assert out.feat_mean[i] == img.astype(np.float64).mean()


def test_y4m_codec_round_trip():
    from opentelemetry_collector_ray.stages.multimodal import (
        decode_y4m, encode_y4m)

    frames = (np.arange(5 * 6 * 8).reshape(5, 6, 8) % 256).astype(np.uint8)
    for chroma in ["mono", "420jpeg"]:
        out, fps = decode_y4m(encode_y4m(frames, fps=(30, 1), chroma=chroma))
        assert fps == (30, 1)
        assert (out == frames).all()
    # general path: per-frame parameters after the FRAME marker
    tagged = encode_y4m(frames, chroma="mono").replace(b"FRAME\n",
                                                       b"FRAME Xt\n")
    out, _ = decode_y4m(tagged)
    assert (out == frames).all()
    with pytest.raises(ValueError):
        decode_y4m(b"RIFF not a y4m stream")
    with pytest.raises(NotImplementedError):
        decode_y4m(b"YUV4MPEG2 W2 H2 F25:1 C422\nFRAME\n" + b"\x00" * 8)


def test_video_pipeline_planted_cuts(ray_session):
    import ray.data

    from opentelemetry_collector_ray.stages.multimodal import (
        VideoDecodeStage, VideoFeatureStage, synth_y4m_media)

    t = synth_y4m_media(32, seed=9)
    ds = ray.data.from_arrow(t).map_batches(
        VideoDecodeStage, fn_constructor_kwargs={"every_k": 2},
        batch_format="pyarrow", batch_size=8, concurrency=2)
    feat = ds.map_batches(VideoFeatureStage(), batch_format="pyarrow") \
        .to_pandas().sort_values("media_id").reset_index(drop=True)
    truth = t.to_pandas()
    assert (feat["n_frames"].values == truth["n_frames_true"].values).all()
    assert ((feat["n_cuts"] >= 1) == truth["has_cut"]).all()
    assert (feat.loc[~truth["has_cut"], "n_cuts"] == 0).all()
    assert (feat["fps_milli"] == 30000).all()


def test_png_all_depths_colortypes_interlace():
    """Extended stdlib PNG coverage: Adam7 interlace, 16-bit (high byte),
    palette (PLTE), and sub-byte gray depths (scaled to 8-bit)."""
    import struct
    import zlib

    from opentelemetry_collector_ray.stages.multimodal import (
        _PNG_MAGIC, _png_chunk, decode_png, encode_png)

    rng = np.random.default_rng(0)
    for shape in [(7, 5), (8, 8), (13, 9), (1, 1), (3, 17)]:
        g = rng.integers(0, 256, shape, dtype=np.uint8)
        for il in (False, True):
            assert (decode_png(encode_png(g, interlace=il)) == g).all()
    rgb = rng.integers(0, 256, (11, 6, 3), dtype=np.uint8)
    for il in (False, True):
        assert (decode_png(encode_png(rgb, interlace=il)) == rgb).all()
    g16 = rng.integers(0, 65536, (9, 7)).astype(np.uint16)
    for il in (False, True):
        assert (decode_png(encode_png(g16, interlace=il))
                == (g16 >> 8).astype(np.uint8)).all()
    # palette, depth 4 (hand-packed indexes — NOT sample-scaled)
    pal = np.array([[i * 16, (15 - i) * 16, i * 8] for i in range(16)],
                   np.uint8)
    idx = rng.integers(0, 16, (5, 7), dtype=np.uint8)
    rows = []
    for y in range(5):
        row = np.concatenate([idx[y], [0]])
        rows.append(b"\x00" + ((row[0::2] << 4) | row[1::2])
                    .astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", 7, 5, 4, 3, 0, 0, 0)
    png = (_PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
           + _png_chunk(b"PLTE", pal.tobytes())
           + _png_chunk(b"IDAT", zlib.compress(b"".join(rows)))
           + _png_chunk(b"IEND", b""))
    out = decode_png(png)
    assert out.shape == (5, 7, 3) and (out == pal[idx]).all()
    # 1-bit gray scales to 0/255
    bits = rng.integers(0, 2, (4, 10), dtype=np.uint8)
    rows = [b"\x00" + np.packbits(np.concatenate(
        [bits[y], np.zeros(6, np.uint8)]))[:2].tobytes() for y in range(4)]
    ihdr = struct.pack(">IIBBBBB", 10, 4, 1, 0, 0, 0, 0)
    png = (_PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
           + _png_chunk(b"IDAT", zlib.compress(b"".join(rows)))
           + _png_chunk(b"IEND", b""))
    assert (decode_png(png) == bits * 255).all()


def test_shuffle_hash_join_modes(ray_session):
    import ray.data

    from opentelemetry_collector_ray.stages.join import shuffle_hash_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4, 4], pa.int64()),
        "v": pa.array(["a", "b", "c", "d", "e"]),
    }))
    right = ray.data.from_arrow(pa.table({
        "rk": pa.array([2, 3, 3, 9], pa.int32()),  # dtype differs — cast
        "v": pa.array(["x", "y", "z", "w"]),        # name collides → v_r
    }))

    def run(how):
        return shuffle_hash_join(
            left, right, key="k", right_key="rk", how=how,
            n_buckets=3).to_pandas().sort_values(
                ["k", "v"] , kind="mergesort").reset_index(drop=True)

    inner = run("inner")
    assert list(inner.columns) == ["k", "v", "v_r"]
    assert len(inner) == 3  # k=2 ×1, k=3 ×2
    assert set(inner.loc[inner.k == 3, "v_r"]) == {"y", "z"}
    leftj = run("left")
    assert len(leftj) == 6  # 3 matches + unmatched 1, 4, 4
    assert leftj.loc[leftj.k == 1, "v_r"].isna().all()
    semi = run("semi")
    assert list(semi.columns) == ["k", "v"] and sorted(semi.k) == [2, 3]
    anti = run("anti")
    assert sorted(anti.k) == [1, 4, 4]
    full = shuffle_hash_join(left, right, key="k", right_key="rk",
                             how="full", n_buckets=3).to_pandas()
    assert len(full) == 7  # 6 left-side rows + unmatched right k=9
    with pytest.raises(ValueError):
        shuffle_hash_join(left, right, key="k", right_key="rk", how="cross")
    with pytest.raises(ValueError):
        shuffle_hash_join(left, right, key="missing", right_key="rk")


def test_asof_join_directions_tolerance(ray_session):
    import ray.data

    from opentelemetry_collector_ray.stages.join import asof_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array(["a", "a", "a", "b", "c"]),
        "t": pa.array([10, 25, 5, 10, 10], pa.int64()),
        "lv": pa.array([1, 2, 3, 4, 5], pa.int64()),
    }))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array(["a", "a", "a", "b"]),
        "rt": pa.array([8, 20, 30, 40], pa.int64()),
        "rv": pa.array([100, 200, 300, 400], pa.int64()),
    }))

    def run(**kw):
        return asof_join(left, right, by="k", on="t", right_on="rt",
                         n_buckets=2, **kw).to_pandas() \
            .sort_values(["k", "t"]).reset_index(drop=True)

    back = run(how="inner")  # backward: greatest rt <= t
    assert back[["k", "t", "rv"]].values.tolist() == \
        [["a", 10, 100], ["a", 25, 200]]
    fwd = run(how="inner", direction="forward")  # smallest rt >= t
    assert fwd[["k", "t", "rv"]].values.tolist() == \
        [["a", 5, 100], ["a", 10, 200], ["a", 25, 300], ["b", 10, 400]]
    leftj = run(how="left")
    assert len(leftj) == 5
    assert leftj.loc[leftj.k == "c", "rv"].isna().all()
    assert leftj.loc[(leftj.k == "a") & (leftj.t == 5), "rv"].isna().all()
    tol = run(how="left", tolerance=3)  # a@10→rt8 gap 2 ok; a@25→rt20 gap 5 no
    got = {(r.k, r.t): r.rv for r in tol.itertuples()}
    assert got[("a", 10)] == 100
    assert pd.isna(got[("a", 25)])
    # exact tie is inclusive in both directions
    tie = asof_join(
        ray.data.from_arrow(pa.table({"k": ["x"], "t": pa.array([7], pa.int64()),
                                      "lv": pa.array([0], pa.int64())})),
        ray.data.from_arrow(pa.table({"k": ["x"], "rt": pa.array([7], pa.int64()),
                                      "rv": pa.array([9], pa.int64())})),
        by="k", on="t", right_on="rt", n_buckets=1).to_pandas()
    assert tie["rv"].tolist() == [9]
    with pytest.raises(ValueError):
        asof_join(left, right, by="k", on="t", right_on="rt", how="full")
    with pytest.raises(ValueError):
        asof_join(left, right, by="k", on="t", right_on="rt",
                  direction="sideways")
    # nearest is now a supported direction (pandas merge_asof parity —
    # see tests/test_join_properties.py for the full oracle)
    near = asof_join(left, right, by="k", on="t", right_on="rt",
                     direction="nearest", n_buckets=1).to_pandas()
    assert len(near) > 0


def test_range_join_semantics(ray_session):
    import ray.data

    from opentelemetry_collector_ray.stages.join import range_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array(["a", "a", "b", "c"]),
        "t": pa.array([10, 30, 5, 99], pa.int64()),
        "lv": pa.array([1, 2, 3, 4], pa.int64()),
    }))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array(["a", "a", "b"]),
        "s": pa.array([8, 25, 5], pa.int64()),
        "e": pa.array([12, 40, 6], pa.int64()),
        "rv": pa.array([100, 200, 300], pa.int64()),
    }))
    # explicit end column: [s, e) intervals, all matches emitted
    j = range_join(left, right, by="k", on="t", right_start="s",
                   right_end="e", max_interval=20, n_buckets=2) \
        .to_pandas().sort_values(["k", "t", "rv"]).reset_index(drop=True)
    assert j[["k", "t", "rv"]].values.tolist() == \
        [["a", 10, 100], ["a", 30, 200], ["b", 5, 300]]
    # implicit end = start + max_interval; overlapping intervals fan out
    j2 = range_join(left, right, by="k", on="t", right_start="s",
                    max_interval=25, n_buckets=2).to_pandas()
    a10 = j2[(j2.k == "a") & (j2.t == 10)]
    assert sorted(a10["rv"]) == [100]          # s=8 only (25 not <= 10)
    a30 = j2[(j2.k == "a") & (j2.t == 30)]
    assert sorted(a30["rv"]) == [100, 200]     # both windows cover 30
    # interval longer than max_interval is rejected
    bad = ray.data.from_arrow(pa.table({
        "k": pa.array(["a"]), "s": pa.array([0], pa.int64()),
        "e": pa.array([100], pa.int64()), "rv": pa.array([1], pa.int64())}))
    with pytest.raises(Exception):
        range_join(left, bad, by="k", on="t", right_start="s",
                   right_end="e", max_interval=20, n_buckets=1).to_pandas()


def test_shuffle_hash_join_salted(ray_session):
    """salt>1 splits a hot key across sub-buckets without changing any
    result (inner/left/semi/anti); full outer is rejected."""
    import ray.data

    from opentelemetry_collector_ray.stages.join import shuffle_hash_join

    rng = np.random.default_rng(5)
    lk = np.concatenate([np.zeros(40, np.int64),          # hot key 0
                         rng.integers(1, 6, 20)])
    left = ray.data.from_arrow(pa.table({
        "k": pa.array(lk), "lv": pa.array(np.arange(len(lk)))}))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([0, 0, 1, 3, 9], pa.int64()),
        "rv": pa.array([10, 11, 12, 13, 14], pa.int64())}))

    for how in ["inner", "left", "semi", "anti"]:
        plain = shuffle_hash_join(left, right, key="k", how=how,
                                  n_buckets=2).to_pandas()
        salted = shuffle_hash_join(left, right, key="k", how=how,
                                   n_buckets=2, salt=4).to_pandas()
        cols = list(plain.columns)
        pd.testing.assert_frame_equal(
            plain.sort_values(cols, kind="mergesort").reset_index(drop=True),
            salted[cols].sort_values(cols, kind="mergesort")
            .reset_index(drop=True), check_dtype=False, obj=how)
    with pytest.raises(ValueError):
        shuffle_hash_join(left, right, key="k", how="full", salt=4)


def test_ordered_prefix_sum_and_packing(ray_session):
    import ray.data

    from opentelemetry_collector_ray.stages.packing import (
        ordered_prefix_sum, pack_chunks)

    def make():
        # two blocks with non-overlapping order ranges
        a = pa.table({"i": pa.array([1, 2, 3], pa.int64()),
                      "v": pa.array([5, 7, 2], pa.int64())})
        b = pa.table({"i": pa.array([10, 11], pa.int64()),
                      "v": pa.array([4, 9], pa.int64())})
        return ray.data.from_arrow(a).union(ray.data.from_arrow(b))

    out = ordered_prefix_sum(make, "i", "v").to_pandas() \
        .sort_values("i").reset_index(drop=True)
    assert out["offset"].tolist() == [0, 5, 12, 14, 18]
    chunks = pack_chunks(make, "i", "v", capacity=10).to_pandas() \
        .sort_values("i")
    assert chunks["chunk_id"].tolist() == [0, 0, 1, 1, 1]
    # overlapping ranges are rejected loudly
    def bad():
        a = pa.table({"i": pa.array([1, 5], pa.int64()),
                      "v": pa.array([1, 1], pa.int64())})
        b = pa.table({"i": pa.array([3, 9], pa.int64()),
                      "v": pa.array([1, 1], pa.int64())})
        return ray.data.from_arrow(a).union(ray.data.from_arrow(b))
    with pytest.raises(ValueError):
        ordered_prefix_sum(bad, "i", "v")


def test_pad_union_rename_collision_rejected(ray_session):
    import ray.data

    from opentelemetry_collector_ray.stages.join import shuffle_hash_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1], pa.int64()), "v": pa.array([1], pa.int64()),
        "v_r": pa.array([2], pa.int64())}))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([1], pa.int64()), "v": pa.array([3], pa.int64())}))
    with pytest.raises(ValueError, match="collides"):
        shuffle_hash_join(left, right, key="k")


def test_prefix_sum_unsorted_block_rejected(ray_session):
    import ray.data

    from opentelemetry_collector_ray.stages.packing import ordered_prefix_sum

    def make():
        return ray.data.from_arrow(pa.table({
            "i": pa.array([3, 1, 2], pa.int64()),
            "v": pa.array([100, 5, 7], pa.int64())}))
    with pytest.raises(Exception, match="not sorted"):
        ordered_prefix_sum(make, "i", "v").to_pandas()


def test_pack_bins_next_fit(ray_session):
    import ray.data

    from opentelemetry_collector_ray.stages.packing import pack_bins

    t = pa.table({"doc": pa.array(range(7), pa.int64()),
                  "n": pa.array([5, 3, 4, 9, 12, 1, 1], pa.int64())})
    out = pack_bins(ray.data.from_arrow(t), "n", capacity=10).to_pandas()
    sums = out.groupby("bin_id")["n"].sum()
    sizes = out.groupby("bin_id").size()
    # every bin fits, except single-doc oversize bins
    assert all(s <= 10 or sizes[b] == 1 for b, s in sums.items())
    # next-fit grouping: [5,3],[4],[9],[12],[1,1]
    assert sorted(sums.tolist()) == [2, 4, 8, 9, 12]
    # docs never split, all present once
    assert len(out) == 7 and out["doc"].is_unique
    # deterministic (content-addressed block ids)
    out2 = pack_bins(ray.data.from_arrow(t), "n", capacity=10).to_pandas()
    assert out2["bin_id"].tolist() == out["bin_id"].tolist()


def test_unigram_mass_corpus_scoring(ray_session):
    import ray.data

    from opentelemetry_collector_ray.stages.corpusstats import (
        UnigramMassStage, term_counts, unigram_mass)

    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["a a b", "b c", ""])})

    def make():
        return ray.data.from_arrow(t)

    out = unigram_mass(make).to_pandas().sort_values("doc_id")
    # corpus: a=2 b=2 c=1 → doc1 = 2+2+2, doc2 = 2+1, doc3 empty
    assert out["freq_mass"].tolist() == [6, 3, 0]
    assert out["n_tokens"].tolist() == [3, 2, 0]
    # vocab cap guards the broadcast
    with pytest.raises(ValueError, match="max_vocab"):
        unigram_mass(make, max_vocab=2)
    # foreign tokens score 0
    vocab = pa.table({"term": pa.array(["a"]), "n": pa.array([5], pa.int64())})
    st = UnigramMassStage(vocab)
    res = st(pa.table({"doc_id": pa.array([9], pa.int64()),
                       "text": pa.array(["a zzz"])}))
    assert res.column("freq_mass").to_pylist() == [5]
    # term table itself
    tc = term_counts(make()).to_pandas().set_index("term")["n"]
    assert tc.to_dict() == {"a": 2, "b": 2, "c": 1}


def test_pack_bins_identical_token_blocks_stay_distinct(ray_session):
    """Two BLOCKS whose token-count arrays are byte-identical must not
    share bin ids (block id hashes every column, not just tokens)."""
    import ray.data

    from opentelemetry_collector_ray.stages.packing import pack_bins

    t1 = pa.table({"doc": pa.array([0, 1], pa.int64()),
                   "n": pa.array([5, 5], pa.int64())})
    t2 = pa.table({"doc": pa.array([2, 3], pa.int64()),
                   "n": pa.array([5, 5], pa.int64())})
    ds = ray.data.from_arrow([t1, t2])
    assert ds.num_blocks() == 2
    out = pack_bins(ds, "n", capacity=10).to_pandas()
    sums = out.groupby("bin_id")["n"].sum()
    # one bin per block; a shared id would merge to a single 20-token bin
    assert len(sums) == 2 and (sums <= 10).all()


def test_audio_video_features_sliced_list_column():
    """Sliced ListArray input: flatten() rebases the values buffer, so the
    offsets must be rebased too or features silently read wrong rows."""
    import pyarrow as pa

    from opentelemetry_collector_ray.stages.multimodal import (
        AudioFeatureStage, VideoFeatureStage)

    means = pa.array([[999.0, 0.0], [10.0, 200.0, 10.0], [7.0, 7.0]],
                     pa.list_(pa.float64()))
    full = pa.table({"frame_means": means,
                     "media_id": pa.array([0, 1, 2], pa.int64())})
    whole = VideoFeatureStage()(full.slice(1))        # sliced: offset != 0
    fresh = VideoFeatureStage()(pa.table(
        {"frame_means": pa.array([[10.0, 200.0, 10.0], [7.0, 7.0]],
                                 pa.list_(pa.float64())),
         "media_id": pa.array([1, 2], pa.int64())}))
    assert whole.column("motion").to_pylist() == \
        fresh.column("motion").to_pylist()
    assert whole.column("n_cuts").to_pylist() == \
        fresh.column("n_cuts").to_pylist()

    samples = pa.array([[0.5, -0.5], [0.1, 0.1, -0.1], [1.0]],
                       pa.list_(pa.float64()))
    afull = pa.table({"samples": samples,
                      "sample_rate": pa.array([8000, 8000, 8000],
                                              pa.int64())})
    a_sliced = AudioFeatureStage()(afull.slice(1))
    a_fresh = AudioFeatureStage()(pa.table(
        {"samples": pa.array([[0.1, 0.1, -0.1], [1.0]],
                             pa.list_(pa.float64())),
         "sample_rate": pa.array([8000, 8000], pa.int64())}))
    for c in ("rms", "peak", "zcr"):
        assert a_sliced.column(c).to_pylist() == \
            a_fresh.column(c).to_pylist(), c


def test_exact_global_quantile_cardinality_guard(ray_session):
    import ray.data

    from opentelemetry_collector_ray.stages.aggregate import (
        exact_global_quantile)

    t = pa.table({"v": pa.array(range(100), pa.int64())})
    ds = ray.data.from_arrow(t)
    # within cap: exact answer
    assert exact_global_quantile(ds, "v", 0.5) == 49
    # over cap: loud failure pointing to the sketch path, no driver pull
    with pytest.raises(ValueError, match="distinct"):
        exact_global_quantile(ds, "v", 0.5, max_distinct=10)


def test_two_pass_persist_modes(ray_session, tmp_path):
    """A NON-DETERMINISTIC upstream either fails loudly (persist='none',
    pass-2 range validation) or is executed exactly once (persist=
    'memory' / path)."""
    import ray.data

    from opentelemetry_collector_ray.stages.packing import (
        ordered_prefix_sum)

    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        shift = 0 if calls["n"] == 1 else 100  # 2nd execution diverges
        return ray.data.from_arrow(pa.table({
            "i": pa.array([shift + 1, shift + 2], pa.int64()),
            "v": pa.array([5, 7], pa.int64())}))

    with pytest.raises(Exception, match="pass-1 block range"):
        ordered_prefix_sum(flaky, "i", "v").to_pandas()

    calls["n"] = 0
    out = ordered_prefix_sum(flaky, "i", "v", persist="memory") \
        .to_pandas().sort_values("i")
    assert calls["n"] == 1 and out["offset"].tolist() == [0, 5]

    calls["n"] = 0
    out = ordered_prefix_sum(flaky, "i", "v",
                             persist=str(tmp_path / "persist")) \
        .to_pandas().sort_values("i")
    assert calls["n"] == 1 and out["offset"].tolist() == [0, 5]


def test_unigram_mass_persist_memory(ray_session):
    import ray.data

    from opentelemetry_collector_ray.stages.corpusstats import unigram_mass

    calls = {"n": 0}
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["a a b", "b"])})

    def make():
        calls["n"] += 1
        return ray.data.from_arrow(t)

    out = unigram_mass(make, persist="memory").to_pandas() \
        .sort_values("doc_id")
    assert calls["n"] == 1
    # corpus counts: a=2, b=2 → doc1 mass 2+2+2=6, doc2 mass 2
    assert out["freq_mass"].tolist() == [6, 2]


def test_chunk_sliding(ray_session):
    import ray.data

    from opentelemetry_collector_ray.stages.packing import chunk_sliding

    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a b c d e f g", "x y", ""])})
    out = chunk_sliding(ray.data.from_arrow(tbl).repartition(2),
                        window=4, stride=2).to_pandas()
    out = out.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    d1 = out[out["doc_id"] == 1]
    # 7 tokens, stride 2 → starts 0,2,4,6; sizes 4,4,3,1
    assert d1["start_tok"].tolist() == [0, 2, 4, 6]
    assert d1["n_tok"].tolist() == [4, 4, 3, 1]
    assert d1["chunk_id"].tolist() == [0, 1, 2, 3]
    d2 = out[out["doc_id"] == 2]
    assert d2["n_tok"].tolist() == [2]
    assert (out["doc_id"] != 3).all()  # empty doc emits nothing

    import pytest as _pt
    with _pt.raises(ValueError, match="stride"):
        chunk_sliding(ray.data.from_arrow(tbl), window=2, stride=3)


def test_profile_table_with_nulls(ray_session):
    import ray.data

    from opentelemetry_collector_ray.stages.profile import profile_table

    tbl = pa.table({
        "a": pa.array(["x", "y", None, "x", None]),
        "b": pa.array([1, 1, 1, 2, 3], pa.int64())})
    out = profile_table(ray.data.from_arrow(tbl).repartition(3),
                        ["a", "b"]).to_pandas().set_index("column")
    assert out.loc["a", "n_rows"] == 5
    assert out.loc["a", "n_null"] == 2
    assert out.loc["a", "n_distinct"] == 2  # SQL convention: nulls excluded
    assert out.loc["b", "n_null"] == 0
    assert out.loc["b", "n_distinct"] == 3

    import pytest as _pt
    with _pt.raises(ValueError, match="non-empty"):
        profile_table(ray.data.from_arrow(tbl), [])


def test_exact_global_quantiles_one_pass(ray_session):
    """Multi-q variant agrees with the singular function at every q and
    enforces the same cardinality guard."""
    import numpy as np
    import ray.data

    from opentelemetry_collector_ray.stages.aggregate import (
        exact_global_quantile, exact_global_quantiles)

    rng = np.random.default_rng(7)
    t = pa.table({"v": pa.array(rng.integers(0, 50, 997), pa.int64())})
    ds = ray.data.from_arrow(t)
    qs = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    got = exact_global_quantiles(ds, "v", qs)
    want = [exact_global_quantile(ds, "v", q) for q in qs]
    assert got == want
    with pytest.raises(ValueError, match="distinct"):
        exact_global_quantiles(ds, "v", qs, max_distinct=5)


def test_term_divergence_identities(ray_session):
    import math

    import ray.data

    from opentelemetry_collector_ray.stages.corpusstats import (
        term_divergence)

    def corp(texts):
        return ray.data.from_arrow(pa.table({
            "text": pa.array(texts)})).repartition(2)

    same = ["alpha beta gamma", "beta gamma delta"]
    row = term_divergence(corp(same), corp(same)).to_pandas().iloc[0]
    assert row["jsd_nats"] == pytest.approx(0.0, abs=1e-12)
    assert row["shared_vocab"] == row["vocab_a"] == row["vocab_b"]

    a, b = corp(["one two three"]), corp(["four five six"])
    row = term_divergence(a, b).to_pandas().iloc[0]
    assert row["jsd_nats"] == pytest.approx(math.log(2), rel=1e-12)
    assert row["shared_vocab"] == 0

    x = corp(["cat dog cat", "dog bird"])
    y = corp(["cat fish", "fish fish dog"])
    j1 = term_divergence(x, y).to_pandas().iloc[0]["jsd_nats"]
    j2 = term_divergence(y, x).to_pandas().iloc[0]["jsd_nats"]
    assert j1 == pytest.approx(j2, rel=1e-12)
    assert 0 < j1 < math.log(2)

    with pytest.raises(ValueError, match="max_vocab"):
        term_divergence(x, y, max_vocab=1).to_pandas()


def test_exact_global_quantiles_hll_preguard(ray_session):
    """The tree-strategy cardinality guard fires from the HLL screen
    BEFORE any task holds the distinct table (review finding)."""
    import numpy as np
    import ray.data

    from opentelemetry_collector_ray.stages.aggregate import (
        exact_global_quantiles)

    t = pa.table({"v": pa.array(np.arange(50_000), pa.int64())})
    ds = ray.data.from_arrow(t).repartition(4)
    with pytest.raises(ValueError, match="HLL estimate"):
        exact_global_quantiles(ds, "v", (0.5,), max_distinct=1_000)


def test_grouped_count_distinct(ray_session):
    import numpy as np
    import ray.data

    from opentelemetry_collector_ray.stages.aggregate import (
        grouped_count_distinct)

    rng = np.random.default_rng(4)
    n = 3000
    t = pa.table({"k": pa.array([f"g{v}" for v in rng.integers(0, 3, n)]),
                  "u": pa.array(rng.integers(0, 40, n).astype(np.int64))})
    out = grouped_count_distinct(
        ray.data.from_arrow(t).repartition(6), ["k"],
        "u").to_pandas()
    import pandas as pd
    want = pd.DataFrame(t.to_pandas().groupby("k")["u"].nunique()
                        ).reset_index().rename(columns={"u": "n_distinct"})
    got = out.sort_values("k").reset_index(drop=True)
    want = want.sort_values("k").reset_index(drop=True)
    assert got["k"].tolist() == want["k"].tolist()
    assert got["n_distinct"].tolist() == want["n_distinct"].tolist()


def test_grouped_count_distinct_ignores_nulls(ray_session):
    import ray.data

    from opentelemetry_collector_ray.stages.aggregate import (
        grouped_count_distinct)

    t = pa.table({"k": pa.array(["a", "a", "a", "b"]),
                  "u": pa.array([1, None, 1, None], pa.int64())})
    out = grouped_count_distinct(ray.data.from_arrow(t), ["k"],
                                 "u").to_pandas()
    got = dict(zip(out["k"], out["n_distinct"]))
    # SQL count(DISTINCT u): a -> 1 (null ignored); b -> 0 rows AFTER
    # the null drop, so b emits no row at all (matches GROUP BY over
    # the filtered rows — SQL emits b with 0 only via LEFT semantics)
    assert got == {"a": 1}


def test_profile_table_single_input_execution(ray_session):
    """Profiling C columns must execute the input ONCE (the round-4
    version ran one count_distinct dataset per column — C+1 scans).
    A counter actor inside an upstream map_batches observes exactly
    one pass over the blocks."""
    import ray
    import ray.data

    from opentelemetry_collector_ray.stages.profile import profile_table

    @ray.remote
    class Counter:
        def __init__(self):
            self.n = 0

        def bump(self, k):
            self.n += k

        def get(self):
            return self.n

    c = Counter.remote()

    tbl = pa.table({
        "a": pa.array([f"v{i % 7}" for i in range(100)]),
        "b": pa.array([i % 13 for i in range(100)], pa.int64()),
        "f": pa.array([float(i % 5) / 2 for i in range(100)])})
    n_parts = 4

    def counted(t: pa.Table, _c=c) -> pa.Table:
        ray.get(_c.bump.remote(1))
        return t

    ds = ray.data.from_arrow(tbl).repartition(n_parts).map_batches(
        counted, batch_format="pyarrow")
    out = profile_table(ds, ["a", "b", "f"]).to_pandas().set_index("column")
    assert out.loc["a", "n_distinct"] == 7
    assert out.loc["b", "n_distinct"] == 13
    assert out.loc["f", "n_distinct"] == 5
    assert (out["n_rows"] == 100).all()
    assert ray.get(c.get.remote()) == n_parts  # one execution, not C+1


def test_grouped_mode_tie_break_and_nulls(ray_session):
    import duckdb
    import ray.data

    from opentelemetry_collector_ray.stages.aggregate import grouped_mode

    tbl = pa.table({
        "k": pa.array(["a"] * 4 + ["b"] * 3 + ["c"]),
        "v": pa.array(["x", "y", "x", "y",      # tie -> smaller value x
                       "z", None, "z",          # null ignored
                       None])})                 # all-null key -> no row
    out = grouped_mode(ray.data.from_arrow(tbl).repartition(3),
                       "k", "v").to_pandas().sort_values("k")
    assert out["k"].tolist() == ["a", "b"]
    assert out["mode"].tolist() == ["x", "z"]
    assert out["mode_n"].tolist() == [2, 2]


def test_grouped_string_agg_order_and_nulls(ray_session):
    import ray.data

    from opentelemetry_collector_ray.stages.aggregate import (
        grouped_string_agg)

    tbl = pa.table({
        "k": pa.array(["a", "a", "a", "b", "b"]),
        "o": pa.array([3, 1, 2, 2, 1], pa.int64()),
        "v": pa.array(["C", "A", None, "D", None])})
    out = grouped_string_agg(
        ray.data.from_arrow(tbl).repartition(2), "k", ["o"], "v",
        sep="-", out_name="s").to_pandas().sort_values("k")
    assert out["s"].tolist() == ["A-C", "D"]


def test_sha256_hex_matches_duckdb():
    import duckdb

    from opentelemetry_collector_ray.functions.text import sha256_hex

    vals = ["", "abc", "Hello, wörld", None]
    got = sha256_hex(pa.array(vals)).to_pylist()
    con = duckdb.connect()
    want = [con.execute("SELECT sha256(?)", [v]).fetchone()[0]
            if v is not None else None for v in vals]
    assert got == want


def test_mode_stringagg_zorder_yaml_parity(ray_session, tmp_path):
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from opentelemetry_collector_ray.config import PipelineConfig
    from opentelemetry_collector_ray.pipelines.builder import build_dataset
    from opentelemetry_collector_ray.stages.aggregate import (
        grouped_mode, grouped_string_agg)
    from opentelemetry_collector_ray.stages.layout import zorder_sort

    rng = np.random.default_rng(11)
    n = 200
    tbl = pa.table({"id": pa.array(np.arange(n), pa.int64()),
                    "k": pa.array(np.char.add("u", rng.integers(0, 9, n)
                                              .astype("U2"))),
                    "x": pa.array(rng.integers(0, 50, n), pa.int64()),
                    "y": pa.array(rng.integers(0, 50, n), pa.int64()),
                    "v": pa.array(np.char.add("s", rng.integers(0, 4, n)
                                              .astype("U2")))})
    p = tmp_path / "t.parquet"
    pq.write_table(tbl, str(p))

    def run(proc_name, proc_cfg):
        return build_dataset(PipelineConfig.from_dict({
            "receivers": {"parquet": {"paths": str(p)}},
            "processors": {proc_name: proc_cfg},
            "exporters": {"debug": {}},
            "service": {"pipelines": {"logs": {
                "receivers": ["parquet"], "processors": [proc_name],
                "exporters": ["debug"]}}},
        })).to_pandas()

    y = run("mode_agg", {"key": "k", "value_col": "v"})
    d = grouped_mode(ray.data.read_parquet(str(p)), "k", "v").to_pandas()
    assert (y.sort_values("k").values
            == d.sort_values("k").values).all()

    y = run("string_agg", {"key": "k", "order_by": ["id"],
                           "value_col": "v", "sep": "|"})
    d = grouped_string_agg(ray.data.read_parquet(str(p)), "k", ["id"],
                           "v", sep="|").to_pandas()
    assert (y.sort_values("k").values
            == d.sort_values("k").values).all()

    y = run("zorder", {"x_col": "x", "y_col": "y", "tie_break": "id"})
    d = zorder_sort(lambda: ray.data.read_parquet(str(p)), "x", "y",
                    tie_break="id").to_pandas()
    assert (y.sort_values("id")["zrank"].values
            == d.sort_values("id")["zrank"].values).all()


def test_range_lookup_bins_and_guards(ray_session):
    import ray.data

    from opentelemetry_collector_ray.stages.enrich import range_lookup

    tbl = pa.table({"v": pa.array([-5, 0, 9, 10, 99, 100], pa.int64())})
    out = range_lookup(ray.data.from_arrow(tbl), "v",
                       breaks=[0, 10, 100],
                       labels=["neg", "low", "mid", "high"]).to_pandas()
    assert out.sort_values("v")["v_band"].tolist() == \
        ["neg", "low", "low", "mid", "mid", "high"]
    import pytest as _pt
    with _pt.raises(ValueError, match="strictly"):
        range_lookup(ray.data.from_arrow(tbl), "v", [5, 5], ["a", "b", "c"])
    with _pt.raises(ValueError, match="labels"):
        range_lookup(ray.data.from_arrow(tbl), "v", [5], ["a"])
    tn = pa.table({"v": pa.array([1, None], pa.int64())})
    with _pt.raises(Exception, match="null"):
        range_lookup(ray.data.from_arrow(tn), "v", [0],
                     ["a", "b"]).to_pandas()


def test_label_encode_orders_and_nulls(ray_session):
    import ray.data

    from opentelemetry_collector_ray.stages.encoding import label_encode

    tbl = pa.table({"v": pa.array(["b", "a", "b", None, "c", "b", "a"])})
    out = label_encode(lambda: ray.data.from_arrow(tbl).repartition(2),
                       "v").to_pandas()
    got = dict(zip(out["v"], out["v_id"]))
    # freq: b=3 -> 0, a=2 -> 1, c=1 -> 2; null -> null
    assert got["b"] == 0 and got["a"] == 1 and got["c"] == 2
    assert out.loc[out["v"].isna(), "v_id"].isna().all()
    lex = label_encode(lambda: ray.data.from_arrow(tbl), "v",
                       order="lexical").to_pandas()
    gl = dict(zip(lex["v"], lex["v_id"]))
    assert gl["a"] == 0 and gl["b"] == 1 and gl["c"] == 2
    import pytest as _pt
    with _pt.raises(ValueError, match="max_categories"):
        label_encode(lambda: ray.data.from_arrow(tbl), "v",
                     max_categories=2).to_pandas()
    with _pt.raises(ValueError, match="order"):
        label_encode(lambda: ray.data.from_arrow(tbl), "v", order="x")


def test_profile_table_empty_and_negative_zero(ray_session):
    import ray.data

    from opentelemetry_collector_ray.stages.profile import profile_table

    empty = pa.table({"a": pa.array([], pa.string()),
                      "f": pa.array([], pa.float64())})
    out = profile_table(ray.data.from_arrow(empty),
                        ["a", "f"]).to_pandas().set_index("column")
    assert (out["n_rows"] == 0).all()
    assert (out["n_distinct"] == 0).all()

    # SQL count(DISTINCT) value equality: -0.0 == 0.0 (one value)
    t = pa.table({"f": pa.array([0.0, -0.0, 1.5])})
    out = profile_table(ray.data.from_arrow(t), ["f"]).to_pandas()
    assert out["n_distinct"].iloc[0] == 2


def test_reload_report_removed_output(tmp_path):
    from opentelemetry_collector_ray.state.manifest import (
        ManifestStore, PartitionTask, reload_report, run_resumable)

    store = ManifestStore(str(tmp_path / "old_sink"))
    run_resumable(store, [PartitionTask("p0", ["f"])],
                  lambda t, s: {}, "h1")
    rep = reload_report({"old_sink": store}, {})  # output dropped
    assert rep["old_sink"]["removed"] is True
    assert rep["old_sink"]["stale"] == ["p0"]
    assert rep["old_sink"]["valid"] == []


def test_ruleset_hashes_unknown_exporter_raises(tmp_path):
    from opentelemetry_collector_ray.config import (
        ConfigError, PipelineConfig, output_ruleset_hashes)
    import pytest as _pt

    cfg = PipelineConfig.from_dict({
        "receivers": {"parquet": {"paths": "/tmp/x"}},
        "processors": {"parse": {"pattern": "(?P<k>.)", "column": "t"}},
        "exporters": {"debug": {}},
        "service": {"pipelines": {"logs": {
            "receivers": ["parquet"], "processors": ["parse"],
            "exporters": ["debug"]}}}})
    with _pt.raises(ConfigError, match="unknown exporters"):
        output_ruleset_hashes(cfg, depends={"debgu": ["parse"]})


def test_epoch_order_reshuffles_and_is_dense(ray_session):
    import numpy as np
    import ray.data

    from opentelemetry_collector_ray.stages.mixing import epoch_order

    tbl = pa.table({"id": pa.array(np.arange(200), pa.int64())})
    e1 = epoch_order(ray.data.from_arrow(tbl).repartition(4), "id",
                     epoch=1, n_shards=4).to_pandas()
    e2 = epoch_order(ray.data.from_arrow(tbl).repartition(4), "id",
                     epoch=2, n_shards=4).to_pandas()
    # per-shard positions are dense 0..k-1
    for df in (e1, e2):
        for s, g in df.groupby("shard"):
            assert sorted(g["pos"]) == list(range(len(g)))
        assert len(df) == 200
    # a new epoch is a REAL reshuffle: coordinates differ for most ids
    m = e1.merge(e2, on="id", suffixes=("_1", "_2"))
    moved = ((m["shard_1"] != m["shard_2"])
             | (m["pos_1"] != m["pos_2"])).mean()
    assert moved > 0.9
    # determinism: same epoch twice = identical plan
    e1b = epoch_order(ray.data.from_arrow(tbl).repartition(2), "id",
                      epoch=1, n_shards=4).to_pandas()
    a = e1.sort_values("id").reset_index(drop=True)
    b = e1b.sort_values("id").reset_index(drop=True)
    assert (a[["shard", "pos"]].values == b[["shard", "pos"]].values).all()
    import pytest as _pt
    with _pt.raises(ValueError, match="n_shards"):
        epoch_order(ray.data.from_arrow(tbl), "id", epoch=1, n_shards=0)
    with _pt.raises(ValueError, match="hash_mode"):
        epoch_order(ray.data.from_arrow(tbl), "id", epoch=1,
                    n_shards=2, hash_mode="crc")


def test_rrf_fuse_semantics(ray_session):
    import ray.data

    from opentelemetry_collector_ray.stages.ranking import rrf_fuse

    a = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "rank": pa.array([0, 1, 2], pa.int64())}))
    b = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([3, 4], pa.int64()),
        "rank": pa.array([0, 1], pa.int64())}))
    out = rrf_fuse([a, b], k=60).to_pandas().set_index("doc_id")["rrf"]
    assert out[3] == 1.0 / 62 + 1.0 / 60   # in both lists
    assert out[1] == 1.0 / 60              # single-list ids keep one term
    assert out[4] == 1.0 / 61
    # id 3 outranks everything (two contributions)
    assert out.idxmax() == 3
    import pytest as _pt
    with _pt.raises(ValueError, match="at least one"):
        rrf_fuse([])


def test_every_factory_raises_config_error_on_bad_config():
    """Registry invariant (confmap/validation.go semantics): an invalid
    component config fails with ConfigError, never a raw
    KeyError/TypeError leaking implementation details."""
    import opentelemetry_collector_ray.config as c

    try:
        c._register_builtins()
    except c.ConfigError:
        pass  # already registered
    assert len(c._REGISTRY) >= 70
    for name, f in sorted(c._REGISTRY.items()):
        try:
            f.create({})
        except c.ConfigError:
            pass  # the expected failure mode
        except Exception as e:  # pragma: no cover - the assertion path
            raise AssertionError(
                f"factory {name!r} raised {type(e).__name__} on empty "
                f"config instead of ConfigError: {e}") from e


def test_grouped_gini_matches_window_sql(ray_session):
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from opentelemetry_collector_ray.stages.corpusstats import grouped_gini

    rng = np.random.default_rng(23)
    n = 5000
    tbl = pa.table({
        "k": pa.array(rng.choice(["a", "b", "c"], n)),
        "v": pa.array(rng.integers(0, 1000, n).astype(np.int64)),
    })
    got = grouped_gini(ray.data.from_arrow(tbl).repartition(4), "k",
                       "v").to_pandas().sort_values("k"
                                                    ).reset_index(drop=True)
    exp = duckdb.sql("""
        WITH r AS (SELECT k, v,
                          row_number() OVER (PARTITION BY k ORDER BY v)
                            AS rn,
                          count(*) OVER (PARTITION BY k) AS n FROM tbl)
        SELECT k, CAST(sum((2*rn - n - 1) * v) AS BIGINT) AS gini_num,
               CAST(sum(v) AS BIGINT) AS total,
               CAST(max(n) AS BIGINT) AS n
        FROM r GROUP BY k ORDER BY k""").df()
    assert got["gini_num"].tolist() == exp["gini_num"].tolist()
    assert got["total"].tolist() == exp["total"].tolist()
    assert got["n"].tolist() == exp["n"].tolist()


def test_grouped_gini_extremes_and_validation(ray_session):
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data

    from opentelemetry_collector_ray.stages.corpusstats import grouped_gini

    tbl = pa.table({
        # "eq": perfect equality -> gini_num 0;
        # "one": one owns all -> gini_num = (n-1)*total = 3*100
        "k": pa.array(["eq"] * 4 + ["one"] * 4),
        "v": pa.array([25, 25, 25, 25, 0, 0, 0, 100], pa.int64()),
    })
    got = grouped_gini(ray.data.from_arrow(tbl), "k", "v").to_pandas()
    res = {r.k: (r.gini_num, r.total, r.n) for r in got.itertuples()}
    assert res == {"eq": (0, 100, 4), "one": (300, 100, 4)}

    neg = ray.data.from_arrow(pa.table(
        {"k": ["a"], "v": pa.array([-1], pa.int64())}))
    with pytest.raises(Exception, match="negative"):
        grouped_gini(neg, "k", "v").materialize()
    fl = ray.data.from_arrow(pa.table({"k": ["a"], "v": [1.5]}))
    with pytest.raises(Exception, match="integer lane"):
        grouped_gini(fl, "k", "v").materialize()


def test_compact_files_binpacks_and_preserves_rows(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from opentelemetry_collector_ray.sinks.parquet_sink import compact_files

    src = tmp_path / "small"
    src.mkdir()
    rng = np.random.default_rng(2)
    all_rows = []
    for i in range(12):
        t = pa.table({"a": pa.array(rng.integers(0, 100, 50), pa.int64()),
                      "b": pa.array(rng.uniform(size=50))})
        pq.write_table(t, str(src / f"f{i:02d}.parquet"))
        all_rows.append(t)
    want = pa.concat_tables(all_rows)
    per_file = (src / "f00.parquet").stat().st_size
    out = tmp_path / "compacted"
    man = compact_files(str(src), str(out), target_bytes=per_file * 4)
    import os
    got_files = sorted(f for f in os.listdir(out) if f.endswith(".parquet"))
    assert man.column("out_file").to_pylist() == got_files
    assert 1 < len(got_files) < 12
    assert int(pa.compute.sum(man.column("n_rows")).as_py()) == want.num_rows
    assert int(pa.compute.sum(man.column("n_inputs")).as_py()) == 12
    got = pa.concat_tables([pq.read_table(str(out / f)) for f in got_files])
    assert sorted(zip(got.column("a").to_pylist(), got.column("b").to_pylist())) == \
        sorted(zip(want.column("a").to_pylist(), want.column("b").to_pylist()))


def test_compact_files_schema_mismatch_raises(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import pytest as _pt

    from opentelemetry_collector_ray.sinks.parquet_sink import compact_files

    src = tmp_path / "mix"
    src.mkdir()
    pq.write_table(pa.table({"a": pa.array([1], pa.int64())}),
                   str(src / "x.parquet"))
    pq.write_table(pa.table({"a": pa.array(["s"], pa.string())}),
                   str(src / "y.parquet"))
    with _pt.raises(Exception, match="schemas differ|union_by_name"):
        compact_files(str(src), str(src / "out"), target_bytes=1 << 30)


def test_oov_stats_planted(ray_session):
    import pyarrow as pa

    import ray.data

    from opentelemetry_collector_ray.stages.corpusstats import oov_stats

    docs = [
        {"doc_id": 1, "text": "red red blue"},     # blue is a singleton
        {"doc_id": 2, "text": "red green green"},
        {"doc_id": 3, "text": "zebra"},             # all-OOV doc
        {"doc_id": 4, "text": "..."},               # zero tokens
    ]
    tbl = pa.Table.from_pylist(docs)
    out = oov_stats(lambda: ray.data.from_arrow(tbl), min_count=2) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    # vocab = {red (3), green (2)}; blue/zebra are OOV
    assert list(out.n_tokens) == [3, 3, 1, 0]
    assert list(out.n_oov) == [1, 0, 1, 0]


def test_oov_stats_split_pattern_and_multi_id(ray_session):
    import pyarrow as pa

    import ray.data

    from opentelemetry_collector_ray.stages.corpusstats import oov_stats

    docs = [
        {"a": "x", "b": 1, "text": "id9 id9 7f3k"},
        {"a": "x", "b": 2, "text": "id9"},
    ]
    tbl = pa.Table.from_pylist(docs)
    out = oov_stats(lambda: ray.data.from_arrow(tbl),
                    id_cols=["a", "b"], min_count=2,
                    split_pattern="[^a-z0-9]+") \
        .to_pandas().sort_values("b").reset_index(drop=True)
    assert list(out.columns) == ["a", "b", "n_tokens", "n_oov"]
    # alnum tokens: id9 x3 in vocab; 7f3k singleton OOV
    assert list(out.n_tokens) == [3, 1]
    assert list(out.n_oov) == [1, 0]


def test_oov_stats_guards(ray_session):
    import pyarrow as pa
    import pytest

    import ray.data

    from opentelemetry_collector_ray.stages.corpusstats import oov_stats

    with pytest.raises(ValueError, match="min_count"):
        oov_stats(lambda: None, min_count=0)
    tbl = pa.Table.from_pylist(
        [{"doc_id": 1, "text": "a b c d e f g h"}])
    with pytest.raises(ValueError, match="max_vocab"):
        oov_stats(lambda: ray.data.from_arrow(tbl), min_count=1,
                  max_vocab=3)


def test_oov_stats_yaml_parity(ray_session, tmp_path):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data

    from opentelemetry_collector_ray.config import PipelineConfig
    from opentelemetry_collector_ray.pipelines.builder import build_dataset
    from opentelemetry_collector_ray.stages.corpusstats import oov_stats

    docs = [{"doc_id": i, "text": t} for i, t in
            enumerate(["red red blue", "red green green", "zebra"])]
    p = tmp_path / "d.parquet"
    pq.write_table(pa.Table.from_pylist(docs), str(p))
    y = build_dataset(PipelineConfig.from_dict({
        "receivers": {"parquet": {"paths": str(p)}},
        "processors": {"oov_stats": {"min_count": 2}},
        "exporters": {"debug": {}},
        "service": {"pipelines": {"logs": {
            "receivers": ["parquet"], "processors": ["oov_stats"],
            "exporters": ["debug"]}}},
    })).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = oov_stats(lambda: ray.data.read_parquet(str(p)),
                     min_count=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(y, want, check_dtype=False)
