"""Multimodal column stages: decode / feature-extract / resize / frame-sample
over opaque ``binary`` payload columns with typed metadata.

Codec status by modality:
- **audio (WAV/PCM): REAL** — stdlib ``wave`` decode, no external deps
  (``AudioDecodeStage`` / ``AudioFeatureStage``; ``synth_wav_media``
  writes genuine RIFF/WAVE payloads for tests).
- **image (PNG): REAL** — a pure-stdlib PNG codec (``decode_png`` /
  ``encode_png``: zlib inflate + all five scanline filters, ALL bit
  depths 1/2/4/8/16, all five color types incl. palette, and Adam7
  interlace), the same move that made audio real. ``codec="real"``
  uses Pillow as the FAST path when available and falls back to the
  stdlib PNG decoder otherwise; only non-PNG payloads (JPEG…) without
  Pillow raise NotImplementedError. ``synth_png_media`` writes genuine
  PNG payloads for reconstruction tests; ``codec="fake"`` remains the
  deterministic non-decoding stand-in.
- **video (YUV4MPEG2/.y4m): REAL** — pure stdlib/numpy stream parser
  (``decode_y4m`` / ``encode_y4m``: header parse, FRAME walk, luma-plane
  slice, mono/4:2:0/4:4:4 chroma skip). ``VideoDecodeStage`` samples
  every k-th REAL frame; ``VideoFeatureStage`` derives motion /
  scene-cut features vectorized over list offsets. ``synth_y4m_media``
  writes genuine .y4m payloads with planted scene cuts for tests.
  ``FrameSampleStage`` remains the metadata-only plumbing stand-in for
  compressed formats (H.264 etc.) that need external codecs.

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


# ------------------------------------------------------- PNG (stdlib, REAL)

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data)))


def encode_png(img: np.ndarray, interlace: bool = False) -> bytes:
    """Image ndarray (HxW gray or HxWx3 RGB; uint8 → 8-bit, uint16 gray →
    16-bit big-endian) → genuine PNG bytes (stdlib only: zlib deflate,
    filter type 0 per scanline, CRC32, optional Adam7 interlace)."""
    import struct
    import zlib

    depth = 16 if img.dtype == np.uint16 else 8
    img = np.ascontiguousarray(img, np.uint16 if depth == 16 else np.uint8)
    if img.ndim == 2:
        h, w = img.shape
        ctype = 0
    elif img.ndim == 3 and img.shape[2] == 3 and depth == 8:
        h, w, _ = img.shape
        ctype = 2
    else:
        raise ValueError("encode_png: expect HxW gray (uint8/uint16) or "
                         "HxWx3 RGB uint8")

    def rowbytes(block: np.ndarray) -> bytes:
        # scanlines with filter 0; 16-bit samples big-endian per PNG
        data = block.astype(">u2").tobytes() if depth == 16 \
            else block.tobytes()
        stride = len(data) // max(1, block.shape[0])
        return b"".join(b"\x00" + data[y * stride: (y + 1) * stride]
                        for y in range(block.shape[0]))

    if interlace:
        raw = b"".join(
            rowbytes(img[y0::ys, x0::xs])
            for (x0, y0, xs, ys) in _ADAM7
            if img[y0::ys, x0::xs].size)
    else:
        raw = rowbytes(img.reshape(h, -1))
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0,
                       1 if interlace else 0)
    return (_PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b""))


# Adam7 interlace passes: (x_start, y_start, x_step, y_step)
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _unfilter(raw: bytes, pos: int, height: int, stride: int, bpp: int,
              ) -> tuple[np.ndarray, int]:
    """Reverse the five PNG scanline filters (None/Sub/Up/Average/Paeth)
    over one image (or interlace pass): ``height`` scanlines of ``stride``
    bytes each, filter distance ``bpp`` bytes. Sub is a cumsum over
    bpp-byte pixel lanes; Average/Paeth need the left RECONSTRUCTED byte,
    so those scanlines run a per-byte loop — correctness fallback; Pillow
    is the fast path when installed."""
    out = np.zeros((height, stride), np.uint8)
    prev = np.zeros(stride, np.int64)
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw, np.uint8, stride, pos).astype(np.int64)
        pos += stride
        if ftype == 0:
            recon = line
        elif ftype == 1:  # Sub: prefix sum over bpp-byte pixel lanes
            nlanes = stride // bpp if stride % bpp == 0 else 0
            if nlanes:
                recon = np.cumsum(line.reshape(nlanes, bpp), axis=0) \
                    .reshape(stride)
            else:  # stride not bpp-aligned (sub-byte depths): bpp == 1
                recon = np.cumsum(line)
        elif ftype == 2:  # Up
            recon = line + prev
        elif ftype == 3:  # Average (left is reconstructed → sequential)
            rec = np.zeros(stride, np.int64)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
            recon = rec
        elif ftype == 4:  # Paeth
            rec = np.zeros(stride, np.int64)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else \
                    (b if pb_ <= pc_ else c)
                rec[x] = (line[x] + pred) & 0xFF
            recon = rec
        else:
            raise ValueError(f"decode_png: unknown filter type {ftype}")
        out[y] = (recon & 0xFF).astype(np.uint8)
        prev = out[y].astype(np.int64)
    return out, pos


def _unpack_scanlines(rows: np.ndarray, width: int, channels: int,
                      depth: int, scale: bool = True) -> np.ndarray:
    """(h, stride_bytes) filtered-out rows → (h, width*channels) uint8
    samples. Sub-byte depths are bit-unpacked MSB-first and, for
    grayscale, SCALED to 8-bit (PNG sample scaling x*255/maxval) —
    palette INDEXES pass through unscaled (``scale=False``); 16-bit takes
    the high byte (8-bit contract of this decoder)."""
    h = rows.shape[0]
    if depth == 8:
        return rows[:, : width * channels]
    if depth == 16:
        return rows.reshape(h, -1)[:, 0::2][:, : width * channels]
    bits = np.unpackbits(rows, axis=1)
    idx = np.arange(width * channels) * depth
    vals = np.zeros((h, width * channels), np.uint16)
    for b in range(depth):
        vals = (vals << 1) | bits[:, idx + b]
    if not scale:
        return vals.astype(np.uint8)
    maxval = (1 << depth) - 1
    return ((vals * 255) // maxval).astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """Genuine PNG bytes → uint8 ndarray (HxW gray, HxWx2 gray+alpha,
    HxWx3 RGB, HxWx4 RGBA) — pure stdlib: chunk walk, zlib inflate, all
    five scanline filters, ALL bit depths (1/2/4/8/16; sub-byte scaled to
    8-bit, 16-bit high byte), all five color types (palette via PLTE),
    and both interlace methods (none + Adam7 seven-pass deinterlace)."""
    import struct
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("decode_png: not a PNG payload")
    pos = 8
    idat = bytearray()
    meta = None
    palette = None
    while pos + 8 <= len(payload):
        ln, typ = struct.unpack_from(">I4s", payload, pos)
        pos += 8
        data = payload[pos: pos + ln]
        pos += ln + 4  # skip CRC
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = struct.unpack(
                ">IIBBBBB", data)
            if (ctype not in (0, 2, 3, 4, 6) or inter not in (0, 1)
                    or depth not in (1, 2, 4, 8, 16)):
                raise NotImplementedError(
                    f"decode_png: invalid PNG shape (bit depth {depth}, "
                    f"color type {ctype}, interlace {inter})")
            meta = (w, h, depth, ctype, inter)
        elif typ == b"PLTE":
            palette = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if meta is None:
        raise ValueError("decode_png: missing IHDR")
    w, h, depth, ctype, inter = meta
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    bpp = max(1, (channels * depth) // 8)
    raw = zlib.decompress(bytes(idat))
    out = np.zeros((h, w * channels), np.uint8)
    passes = _ADAM7 if inter == 1 else [(0, 0, 1, 1)]
    pos = 0
    for (x0, y0, xs, ys) in passes:
        pw = (w - x0 + xs - 1) // xs
        ph = (h - y0 + ys - 1) // ys
        if pw <= 0 or ph <= 0:
            continue
        stride = (pw * channels * depth + 7) // 8
        rows, pos = _unfilter(raw, pos, ph, stride, bpp)
        samples = _unpack_scanlines(rows, pw, channels, depth,
                                    scale=ctype != 3)
        # scatter the pass into the target pixel grid
        cols = (x0 + np.arange(pw) * xs)[:, None] * channels \
            + np.arange(channels)
        out[y0::ys][:ph][:, cols.reshape(-1)] = samples
    if ctype == 3:
        if palette is None:
            raise ValueError("decode_png: palette image missing PLTE")
        return palette[out.reshape(h, w)]
    return out.reshape(h, w) if channels == 1 else \
        out.reshape(h, w, channels)


def _to_gray(img: np.ndarray) -> np.ndarray:
    """HxW[xC] → HxW luma (ITU-R 601 integer weights; alpha dropped;
    2-channel gray+alpha takes the gray channel)."""
    if img.ndim == 2:
        return img
    if img.shape[2] == 2:  # gray + alpha
        return img[:, :, 0]
    rgb = img[:, :, :3].astype(np.int64)
    return ((299 * rgb[:, :, 0] + 587 * rgb[:, :, 1] + 114 * rgb[:, :, 2])
            // 1000).astype(np.uint8)


def _resize_nearest(img: np.ndarray, th: int, tw: int) -> np.ndarray:
    h, w = img.shape[:2]
    ri = (np.arange(th) * h) // th
    ci = (np.arange(tw) * w) // tw
    return img[ri][:, ci]


def synth_png_media(n: int = 64, seed: int = 42) -> pa.Table:
    """Genuine PNG payloads (deterministic gradient+noise gray images of
    varying sizes, stdlib encoder) — real bytes a real decoder must
    parse."""
    rng = np.random.default_rng(seed)
    payloads, widths, heights = [], [], []
    for i in range(n):
        h = int(rng.integers(8, 48))
        w = int(rng.integers(8, 48))
        yy, xx = np.mgrid[0:h, 0:w]
        img = ((xx * 255) // max(1, w - 1) // 2
               + (yy * 255) // max(1, h - 1) // 2
               + rng.integers(0, 32, (h, w))).astype(np.uint8)
        payloads.append(encode_png(img))
        widths.append(w)
        heights.append(h)
    return pa.table({
        "media_id": pa.array(np.arange(n)),
        "payload": pa.array(payloads, pa.binary()),
        "mime": pa.array(["image/png"] * n),
        "width": pa.array(np.array(widths, np.int32)),
        "height": pa.array(np.array(heights, np.int32)),
    }, schema=MEDIA_SCHEMA)


class DecodeStage:
    """binary payload → decoded pixel tensor (flattened) + shape columns.

    Actor-pool stage: ``map_batches(DecodeStage, fn_constructor_kwargs=
    {"codec": "real"}, batch_format="pyarrow", batch_size=64,
    concurrency=N)`` — batch_size is deliberately small (payload-bytes
    budget, not row budget). ``codec="real"`` decodes genuine bytes:
    PNG always via the stdlib decoder (deterministic across
    environments); Pillow, when installed, extends coverage to other
    formats (JPEG/WebP/…) — without it those raise. ``codec="fake"`` is
    the deterministic non-decoding stand-in for plumbing tests."""

    def __init__(self, codec: str = "fake", target: tuple[int, int] = (8, 8)):
        self.codec = codec
        self.th, self.tw = target
        self._pil = None
        if codec == "real":
            # once-per-actor decoder construction: Pillow when available;
            # stdlib PNG decode otherwise (no import error at build time)
            try:
                from PIL import Image  # noqa: F401

                self._pil = Image
            except ImportError:
                self._pil = None

    def _decode_one(self, payload: bytes) -> np.ndarray:
        if self.codec == "real":
            # PNG takes the stdlib path first — deterministic pixels
            # regardless of whether Pillow is installed (PIL's convert+
            # bicubic resize would silently change outputs per
            # environment). The stdlib decoder covers every legal PNG
            # shape (all depths/color types/interlace); the Pillow
            # fallback remains for other formats (JPEG/WebP/…) and as a
            # safety net for malformed-but-PIL-tolerated payloads.
            if payload[:8] == _PNG_MAGIC:
                try:
                    gray = _to_gray(decode_png(payload))
                    return _resize_nearest(gray, self.th, self.tw)
                except NotImplementedError:
                    if self._pil is None:
                        raise
            if self._pil is not None:
                import io

                img = self._pil.open(io.BytesIO(payload)).convert("L") \
                    .resize((self.tw, self.th))
                return np.asarray(img, dtype=np.uint8)
            raise NotImplementedError(
                "codec='real' without Pillow decodes PNG only; this "
                "payload is not PNG — install Pillow for JPEG/WebP/…")
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


# ------------------------------------------------------------- audio (REAL)

def synth_wav_media(n: int = 64, seed: int = 42, sample_rate: int = 8000,
                    duration_s: float = 0.1) -> pa.Table:
    """Genuine RIFF/WAVE payloads (16-bit PCM mono sine tones, stdlib
    ``wave`` writer) — real bytes a real decoder must parse, deterministic
    for tests/oracles."""
    import io
    import wave

    rng = np.random.default_rng(seed)
    freqs = rng.integers(100, 2000, n)
    amps = rng.uniform(0.1, 0.9, n)
    t = np.arange(int(sample_rate * duration_s)) / sample_rate
    payloads = []
    for f, a in zip(freqs, amps):
        samples = (a * 32767 * np.sin(2 * np.pi * int(f) * t)).astype("<i2")
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sample_rate)
            w.writeframes(samples.tobytes())
        payloads.append(buf.getvalue())
    return pa.table({
        "media_id": pa.array(np.arange(n)),
        "payload": pa.array(payloads, pa.binary()),
        "mime": pa.array(["audio/wav"] * n),
        "freq_hz": pa.array(freqs.astype(np.int32)),
    })


class AudioDecodeStage:
    """REAL audio decode (stdlib ``wave``, once-per-actor construction):
    WAV payload → samples (list<int16>), sample_rate, n_samples. Batch
    size should be BYTE-budgeted like the image stage."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import io
        import wave

        sample_lists = []
        rates = np.empty(batch.num_rows, np.int32)
        for i, payload in enumerate(batch.column("payload").to_pylist()):
            with wave.open(io.BytesIO(payload), "rb") as w:
                if w.getsampwidth() != 2 or w.getnchannels() != 1:
                    raise ValueError("only 16-bit mono PCM supported")
                rates[i] = w.getframerate()
                frames = w.readframes(w.getnframes())
            sample_lists.append(np.frombuffer(frames, "<i2"))
        offsets = np.zeros(batch.num_rows + 1, np.int64)
        np.cumsum([len(s) for s in sample_lists], out=offsets[1:])
        flat = np.concatenate(sample_lists) if sample_lists \
            else np.empty(0, np.int16)
        samples = pa.ListArray.from_arrays(
            pa.array(offsets.astype(np.int32)),
            pa.array(flat.astype(np.int16), pa.int16()))
        return (batch.drop_columns(["payload"])
                .append_column("samples", samples)
                .append_column("sample_rate", pa.array(rates))
                .append_column("n_samples",
                               pa.array(np.diff(offsets).astype(np.int64))))


class AudioFeatureStage:
    """Decoded samples → features (rms, peak, zero-crossing rate,
    duration_ms, dominant period estimate) — vectorized over the flat
    sample buffer using the list offsets (no per-row numpy re-slicing
    beyond reduceat)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column("samples")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        offsets = np.asarray(col.offsets.to_numpy(zero_copy_only=False),
                             np.int64)
        # a sliced ListArray's flatten() rebases the values buffer but its
        # offsets still start at offsets[0] != 0 — rebase before indexing
        offsets = offsets - offsets[0]
        starts, counts = offsets[:-1], np.diff(offsets)
        n = batch.num_rows
        rates = batch.column("sample_rate").to_numpy(zero_copy_only=False)
        rms = np.zeros(n)
        peak = np.zeros(n)
        zcr = np.zeros(n)
        ne = np.nonzero(counts > 0)[0]
        if len(flat) and len(ne):
            # reduceat only over NONEMPTY segments: an empty segment's
            # reduceat returns the neighbor's element, and offsets[i+1]-1
            # underflows for a zero-length first row — both produced
            # garbage features for 0-sample payloads
            sq = np.add.reduceat(flat * flat, starts[ne])
            rms[ne] = np.sqrt(sq / counts[ne])
            peak[ne] = np.maximum.reduceat(np.abs(flat), starts[ne])
            signs = flat[1:] * flat[:-1] < 0  # crossing between neighbors
            # exclude crossings that straddle row boundaries
            cross_cum = np.concatenate([[0], np.cumsum(signs)])
            zc = cross_cum[offsets[1:][ne] - 1] - cross_cum[starts[ne]]
            zcr[ne] = zc / np.maximum(counts[ne] - 1, 1)
        dur_ms = counts * 1000 // np.maximum(rates, 1)
        # dominant frequency ≈ zcr * rate / 2 (two crossings per cycle)
        dom_hz = zcr * rates / 2.0
        return (batch.drop_columns(["samples"])
                .append_column("rms", pa.array(rms))
                .append_column("peak", pa.array(peak))
                .append_column("zcr", pa.array(zcr))
                .append_column("duration_ms", pa.array(dur_ms.astype(np.int64)))
                .append_column("dominant_hz", pa.array(dom_hz)))


# ------------------------------------------------------------- video (REAL)
#
# YUV4MPEG2 (.y4m) is the uncompressed interchange format the open video
# toolchain (mjpegtools/ffmpeg/x264) uses: a plain-text stream header
# ``YUV4MPEG2 W<w> H<h> F<num>:<den> ... C<chroma>\n`` followed by
# ``FRAME\n`` + raw planar YUV per frame. Pure stdlib/numpy parse — the
# same move that made audio (wave) and image (PNG) real. Chroma modes
# handled: Cmono (luma only), C420* (2x2 subsampled), C444.

_Y4M_MAGIC = b"YUV4MPEG2 "


def encode_y4m(frames: np.ndarray, fps: tuple[int, int] = (25, 1),
               chroma: str = "mono") -> bytes:
    """(T,H,W) uint8 luma frames → genuine .y4m bytes. ``chroma="mono"``
    writes luma-only; ``"420jpeg"`` adds flat 128-valued chroma planes
    (real 4:2:0 layout a real parser must skip correctly)."""
    frames = np.ascontiguousarray(frames, np.uint8)
    if frames.ndim != 3:
        raise ValueError("encode_y4m: expect (T,H,W) uint8 luma frames")
    t, h, w = frames.shape
    header = (f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 "
              f"C{chroma}\n").encode()
    parts = [header]
    if chroma == "mono":
        for i in range(t):
            parts.append(b"FRAME\n" + frames[i].tobytes())
    elif chroma.startswith("420"):
        if h % 2 or w % 2:
            raise ValueError("encode_y4m: 4:2:0 needs even dimensions")
        cpane = np.full((h // 2) * (w // 2), 128, np.uint8).tobytes()
        for i in range(t):
            parts.append(b"FRAME\n" + frames[i].tobytes() + cpane + cpane)
    else:
        raise ValueError(f"encode_y4m: unsupported chroma {chroma!r}")
    return b"".join(parts)


def decode_y4m(payload: bytes) -> tuple[np.ndarray, tuple[int, int]]:
    """Genuine .y4m bytes → ((T,H,W) uint8 luma frames, (fps_num, fps_den)).

    Parses the stream header, walks FRAME markers (per-frame params after
    ``FRAME`` are tolerated), slices the luma plane of every frame and
    skips chroma per the declared mode. One ``np.frombuffer`` reshape for
    the common case where all frames are contiguous and unparameterized —
    no per-pixel Python."""
    if not payload.startswith(_Y4M_MAGIC):
        raise ValueError("decode_y4m: not a YUV4MPEG2 payload")
    nl = payload.index(b"\n")
    w = h = None
    fps = (25, 1)
    chroma = "420jpeg"
    for tok in payload[len(_Y4M_MAGIC):nl].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"F":
            num, den = val.split(b":")
            fps = (int(num), int(den))
        elif tag == b"C":
            chroma = val.decode()
    if w is None or h is None:
        raise ValueError("decode_y4m: header missing W/H")
    if chroma == "mono":
        luma, frame = h * w, h * w
    elif chroma.startswith("420"):
        luma = h * w
        frame = luma + 2 * ((h // 2) * (w // 2))
    elif chroma.startswith("444"):
        luma, frame = h * w, 3 * h * w
    else:
        raise NotImplementedError(
            f"decode_y4m: unsupported chroma mode C{chroma}")
    pos = nl + 1
    body = payload[pos:]
    # fast path: every frame is exactly b"FRAME\n" + frame bytes
    unit = 6 + frame
    if len(body) % unit == 0 and all(
            body[i * unit: i * unit + 6] == b"FRAME\n"
            for i in range(len(body) // unit)):
        t = len(body) // unit
        buf = np.frombuffer(body, np.uint8).reshape(t, unit)[:, 6: 6 + luma]
        return np.ascontiguousarray(buf).reshape(t, h, w), fps
    # general path: frames may carry parameters after FRAME
    frames = []
    while pos < len(payload):
        if not payload.startswith(b"FRAME", pos):
            raise ValueError("decode_y4m: expected FRAME marker")
        fnl = payload.index(b"\n", pos)
        pos = fnl + 1
        frames.append(np.frombuffer(payload, np.uint8, luma, pos)
                      .reshape(h, w))
        pos += frame
    return (np.stack(frames) if frames
            else np.zeros((0, h, w), np.uint8)), fps


def synth_y4m_media(n: int = 32, seed: int = 42,
                    scene_cut_every: int = 4) -> pa.Table:
    """Genuine .y4m payloads: moving-gradient luma frames with a planted
    hard scene cut (jump to a near-black solid scene, a mean-luma step far
    above the cut threshold) halfway through every ``scene_cut_every``-th
    clip — real bytes a real parser must decode, with known motion truth
    for tests (``has_cut`` column)."""
    rng = np.random.default_rng(seed)
    payloads, n_frames, cuts = [], [], []
    for i in range(n):
        t = int(rng.integers(8, 24))
        h = int(rng.integers(4, 12)) * 2
        w = int(rng.integers(4, 12)) * 2
        yy, xx = np.mgrid[0:h, 0:w]
        base = ((xx * 255) // max(1, w - 1)).astype(np.int64)
        shift = rng.integers(1, 5)
        frames = np.stack([(base + k * shift) % 256 for k in range(t)]) \
            .astype(np.uint8)
        has_cut = i % scene_cut_every == 0
        if has_cut:
            frames[t // 2:] = 5  # solid near-black: mean jumps ~120 levels
        chroma = "mono" if i % 2 == 0 else "420jpeg"
        payloads.append(encode_y4m(frames, fps=(30, 1), chroma=chroma))
        n_frames.append(t)
        cuts.append(has_cut)
    return pa.table({
        "media_id": pa.array(np.arange(n)),
        "payload": pa.array(payloads, pa.binary()),
        "mime": pa.array(["video/x-yuv4mpeg"] * n),
        "n_frames_true": pa.array(np.array(n_frames, np.int32)),
        "has_cut": pa.array(cuts, pa.bool_()),
    })


class VideoDecodeStage:
    """REAL video decode (stdlib y4m parser): payload → sampled frame
    indices, per-sampled-frame mean luma (list<double>), frame count, fps,
    and an 8x8 luma thumbnail of the first sampled frame. Actor-pool
    stage; batch size must be BYTE-budgeted (``bytes_budget_batch_size``)
    — clips are the widest rows in any table."""

    def __init__(self, every_k: int = 2, thumb: tuple[int, int] = (8, 8)):
        self.k = every_k
        self.th, self.tw = thumb

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        idx_off, idx_vals = [0], []
        mean_vals: list[float] = []
        counts = np.zeros(n, np.int64)
        fps_milli = np.zeros(n, np.int64)
        thumbs = np.zeros((n, self.th * self.tw), np.uint8)
        for i, payload in enumerate(batch.column("payload").to_pylist()):
            frames, (fn, fd) = decode_y4m(payload)
            counts[i] = len(frames)
            fps_milli[i] = (fn * 1000) // max(1, fd)
            sampled = frames[:: self.k]
            idxs = np.arange(0, len(frames), self.k, dtype=np.int32)
            idx_vals.extend(idxs.tolist())
            idx_off.append(len(idx_vals))
            # per-frame mean over (H,W) axes — one vectorized reduction
            mean_vals.extend(sampled.mean(axis=(1, 2)).tolist()
                             if len(sampled) else [])
            if len(sampled):
                thumbs[i] = _resize_nearest(sampled[0], self.th, self.tw) \
                    .reshape(-1)
        frame_idxs = pa.ListArray.from_arrays(
            pa.array(idx_off, pa.int32()), pa.array(idx_vals, pa.int32()))
        frame_means = pa.ListArray.from_arrays(
            pa.array(idx_off, pa.int32()), pa.array(mean_vals, pa.float64()))
        thumb = pa.FixedSizeListArray.from_arrays(
            pa.array(thumbs.reshape(-1), pa.uint8()), self.th * self.tw)
        return (batch.drop_columns(["payload"])
                .append_column("n_frames", pa.array(counts))
                .append_column("fps_milli", pa.array(fps_milli))
                .append_column("frame_idxs", frame_idxs)
                .append_column("frame_means", frame_means)
                .append_column("thumb", thumb))


class VideoFeatureStage:
    """Sampled per-frame means → motion features, vectorized over the flat
    list buffer: mean|Δluma| between consecutive sampled frames and a
    scene-cut count (|Δ| > threshold), with row-boundary deltas masked —
    the same offsets idiom as AudioFeatureStage."""

    def __init__(self, cut_threshold: float = 40.0):
        self.thr = cut_threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column("frame_means")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        offsets = np.asarray(col.offsets.to_numpy(zero_copy_only=False),
                             np.int64)
        # rebase sliced-ListArray offsets (flatten() rebases values)
        offsets = offsets - offsets[0]
        starts, counts = offsets[:-1], np.diff(offsets)
        n = batch.num_rows
        motion = np.zeros(n)
        cuts = np.zeros(n, np.int64)
        multi = np.nonzero(counts > 1)[0]
        if len(flat) > 1 and len(multi):
            d = np.abs(np.diff(flat))
            dcum = np.concatenate([[0.0], np.cumsum(d)])
            ccum = np.concatenate([[0], np.cumsum(d > self.thr)])
            lo, hi = starts[multi], offsets[1:][multi] - 1
            motion[multi] = (dcum[hi] - dcum[lo]) / (counts[multi] - 1)
            cuts[multi] = ccum[hi] - ccum[lo]
        return (batch.drop_columns(["frame_means"])
                .append_column("motion", pa.array(motion))
                .append_column("n_cuts", pa.array(cuts)))


def bytes_budget_batch_size(ds, payload_col: str = "payload",
                            budget_bytes: int = 64 << 20,
                            sample_rows: int = 256,
                            default: int = 64) -> int:
    """Dynamic batch size for binary-payload stages: rows per batch ≈
    byte budget / mean payload size (sampled from the dataset head).
    Payload rows are orders of magnitude wider than text rows, so
    ``batch_size`` must be BYTE-budgeted, not row-budgeted — 64 × 1 MiB
    images ≈ one 64 MiB block, which is the object-store sweet spot."""
    try:
        head = ds.limit(sample_rows).select_columns([payload_col]).to_pandas()
        if not len(head):
            return default
        avg = float(head[payload_col].map(len).mean())
        return max(1, int(budget_bytes // max(1.0, avg)))
    except Exception:
        return default
