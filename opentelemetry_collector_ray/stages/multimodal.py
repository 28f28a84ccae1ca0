"""Multimodal column stages: decode / feature-extract / resize / frame-sample
over opaque ``binary`` payload columns with typed metadata.

The Ray-side plumbing (schema, actor-pool signature, batch sizing, output
layout) is real and tested; the codec kernels are STUBS — image/audio
libraries are not in this container. Each stage takes ``codec="fake"``
(deterministic, pure-numpy stand-in used by tests) or ``codec="real"``
which raises NotImplementedError at the decode call site, marking exactly
where Pillow/av/soundfile plug in.

Scale notes (the reason these are actor pools with small batches): payload
rows are orders of magnitude wider than text rows — ``batch_size`` must be
sized by bytes not rows (64 × 1 MiB images ≈ one 64 MiB block), decoders
hold per-actor state (codec contexts), and outputs (thumbnails, features)
are much smaller than inputs so the stage should run early, next to the
read.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    pa.field("media_id", pa.int64()),
    pa.field("payload", pa.binary()),
    pa.field("mime", pa.string()),
    pa.field("width", pa.int32()),
    pa.field("height", pa.int32()),
])


def synth_media(n: int = 64, seed: int = 42, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media table for tests (binary payloads + metadata)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=payload_bytes, dtype=np.uint8).tobytes()
                for _ in range(n)]
    return pa.table({
        "media_id": pa.array(np.arange(n)),
        "payload": pa.array(payloads, pa.binary()),
        "mime": pa.array(["image/png" if i % 2 == 0 else "image/jpeg"
                          for i in range(n)]),
        "width": pa.array(rng.integers(64, 1024, n, dtype=np.int32)),
        "height": pa.array(rng.integers(64, 1024, n, dtype=np.int32)),
    }, schema=MEDIA_SCHEMA)


class DecodeStage:
    """binary payload → decoded pixel tensor (flattened) + shape columns.

    Actor-pool stage: ``map_batches(DecodeStage, fn_constructor_kwargs=
    {"codec": "fake"}, batch_format="pyarrow", batch_size=64,
    concurrency=N)`` — batch_size is deliberately small (payload-bytes
    budget, not row budget)."""

    def __init__(self, codec: str = "fake", target: tuple[int, int] = (8, 8)):
        self.codec = codec
        self.th, self.tw = target
        if codec == "real":
            # real decoder construction goes here (once per actor)
            pass

    def _decode_one(self, payload: bytes) -> np.ndarray:
        if self.codec == "real":
            raise NotImplementedError(
                "image decode requires Pillow/libav — not in this container; "
                "plug the real decoder here")
        # fake codec: deterministic bytes → grayscale target-size "pixels"
        raw = np.frombuffer(payload, dtype=np.uint8)
        need = self.th * self.tw
        reps = int(np.ceil(need / max(1, len(raw))))
        return np.tile(raw, reps)[:need].reshape(self.th, self.tw)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        pixels = np.stack([self._decode_one(p) for p in payloads]) \
            if payloads else np.zeros((0, self.th, self.tw), np.uint8)
        flat = pa.FixedSizeListArray.from_arrays(
            pa.array(pixels.reshape(-1), pa.uint8()), self.th * self.tw)
        return (batch.drop_columns(["payload"])
                .append_column("pixels", flat)
                .append_column("pix_h", pa.array([self.th] * batch.num_rows, pa.int32()))
                .append_column("pix_w", pa.array([self.tw] * batch.num_rows, pa.int32())))


class FeatureStage:
    """Decoded pixels → small feature vector (mean/std/hist) — the
    feature-extraction actor stage; vectorized numpy over the batch."""

    def __init__(self, bins: int = 8):
        self.bins = bins

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column("pixels").combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(col)
        px = flat.reshape(n, -1) if n else flat.reshape(0, 1)
        mean = px.mean(axis=1) if n else np.zeros(0)
        std = px.std(axis=1) if n else np.zeros(0)
        return (batch.drop_columns(["pixels"])
                .append_column("feat_mean", pa.array(mean))
                .append_column("feat_std", pa.array(std)))


class FrameSampleStage:
    """Video analog: sample every k-th frame index from a frame-count column
    (pure plumbing — decoding stubbed as in DecodeStage)."""

    def __init__(self, every_k: int = 10):
        self.k = every_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts = batch.column("width").to_numpy(zero_copy_only=False)  # stand-in
        offsets = [0]
        vals: list[int] = []
        for c in counts:
            idxs = list(range(0, int(c), self.k))
            vals.extend(idxs)
            offsets.append(len(vals))
        arr = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                       pa.array(vals, pa.int32()))
        return batch.append_column("frame_idxs", arr)
