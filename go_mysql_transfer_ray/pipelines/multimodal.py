"""Multimodal columns: opaque binary payloads, REAL container decode.

Images/audio/video ride through the engine as ``binary`` columns with
typed metadata; decode / feature-extract / frame-sample are actor-pool
``map_batches`` stages.  The codecs are real, pure-Python + numpy
implementations of simple PUBLIC container formats — no image/audio
libraries exist in this environment, so the formats chosen are the ones
fully decodable from their published byte layouts:

* image  — PPM (P6, binary RGB) and BMP (24-bit BI_RGB, bottom-up,
           BGR, 4-byte row padding);
* audio  — WAV (RIFF, PCM 16-bit LE, interleaved channels);
* video  — Y4M (YUV4MPEG2, C444: per-frame ``FRAME\\n`` + raw Y/U/V
           planes; frame rate from the ``F<num>:<den>`` header).

Every feature the pipeline emits is derived from the PAYLOAD BYTES
(dimensions, channel sums, sample peaks, frame counts) — the metadata
columns are never consulted — and is an exact integer, so the DuckDB
oracle can restate it value-for-value from the generator's parameter
formulas (a hash match proves the decode inverted the encode).

A production deployment would slot JPEG/MP3/MP4 behind the same
``PurePythonCodec`` interface via PIL/cv2/ffmpeg (import-gated); the Ray
plumbing — actor pool, small batch_size for large binaries, pyarrow
batches end-to-end, one output row per media item — is unchanged.

Scale notes: binary payloads are large → run with a small ``batch_size``
(rows) and keep ``batch_format="pyarrow"`` end-to-end; never convert the
payload column to pandas (object boxing copies every buffer).  The
per-row loop over payloads is inherent to opaque-blob decode (each blob
is one indivisible container); all work WITHIN a payload is numpy over
``np.frombuffer`` views.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("payload", pa.binary()),
        ("media_type", pa.string()),   # image | audio | video
        ("format", pa.string()),       # ppm | bmp | wav | y4m
    ]
)


# ---------------------------------------------------------------------------
# encoders (synthetic-corpus generation; deterministic in media_id)


def _image_params(i: int) -> tuple[int, int, int, int, int]:
    """(w, h, base_r, base_g, base_b) for image/video id ``i`` — every
    value is a closed-form function of the id so the oracle can restate
    the decoded feature sums in SQL.  Pixel(x, y, c) = base_c + x + 2*y;
    bounds (w ≤ 48, h ≤ 30, base ≤ 88) keep the max at 193 < 256, so no
    modular wraparound enters the sums."""
    w = 16 + (i % 5) * 8
    h = 12 + (i % 4) * 6
    return w, h, i % 89, (3 * i) % 89, (7 * i) % 89


def _image_pixels(i: int) -> np.ndarray:
    w, h, br, bg, bb = _image_params(i)
    x = np.arange(w, dtype=np.int32)[None, :, None]
    y = np.arange(h, dtype=np.int32)[:, None, None]
    base = np.array([br, bg, bb], dtype=np.int32)[None, None, :]
    return (base + x + 2 * y).astype(np.uint8)  # (h, w, 3) RGB


def encode_ppm(rgb: np.ndarray) -> bytes:
    """PPM P6: ASCII header + raw RGB rows (the netpbm format)."""
    h, w, _ = rgb.shape
    return f"P6\n{w} {h}\n255\n".encode() + rgb.tobytes()


def encode_bmp(rgb: np.ndarray) -> bytes:
    """24-bit uncompressed BMP (BITMAPINFOHEADER): bottom-up rows, BGR
    byte order, rows padded to 4-byte boundaries."""
    h, w, _ = rgb.shape
    row = (3 * w + 3) & ~3
    img_size = row * h
    bgr = rgb[::-1, :, ::-1]  # bottom-up, RGB→BGR
    rows = np.zeros((h, row), dtype=np.uint8)
    rows[:, : 3 * w] = bgr.reshape(h, 3 * w)
    head = b"BM" + struct.pack("<IHHI", 14 + 40 + img_size, 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    return head + info + rows.tobytes()


def _audio_params(i: int) -> tuple[int, int, int, int]:
    """(channels, sample_rate, n_frames, amplitude) for audio id ``i``.
    Square wave with period 8 frames: sample = ±amp, so peak = amp and
    Σ|s| = amp × frames × channels — both closed-form."""
    channels = 1 + (i % 2)
    rate = 8000
    n_frames = 2000 + (i % 8) * 1000  # 250..1125 ms at 8 kHz
    amp = 500 + (i % 100) * 37
    return channels, rate, n_frames, amp


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """WAV/RIFF, PCM 16-bit LE.  ``samples``: (frames, channels) int16."""
    frames, channels = samples.shape
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2,
                      channels * 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def _audio_samples(i: int) -> tuple[np.ndarray, int]:
    channels, rate, n_frames, amp = _audio_params(i)
    sign = np.where((np.arange(n_frames) // 4) % 2 == 0, 1, -1)
    mono = (amp * sign).astype(np.int16)
    return np.repeat(mono[:, None], channels, axis=1), rate


def _video_params(i: int) -> tuple[int, int, int, int]:
    """(w, h, n_frames, base_y) for video id ``i``; fps fixed 25:1 so
    duration_ms = 40 × n_frames.  Luma(x, y, f) = base_y + x + 2y + 3f
    (max 79 + 47 + 58 + 21 = 205 < 256)."""
    w = 16 + (i % 5) * 8
    h = 12 + (i % 4) * 6
    return w, h, 4 + (i % 4), i % 80


def encode_y4m(frames_y: np.ndarray) -> bytes:
    """Y4M (YUV4MPEG2), C444: header + per-frame FRAME marker + raw
    Y, U, V planes.  ``frames_y``: (frames, h, w) uint8 luma; chroma is
    constant 128 (grey)."""
    f, h, w = frames_y.shape
    out = [f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C444\n".encode()]
    uv = np.full(h * w, 128, dtype=np.uint8).tobytes()
    for k in range(f):
        out.append(b"FRAME\n")
        out.append(frames_y[k].tobytes())
        out.append(uv)
        out.append(uv)
    return b"".join(out)


def _video_frames(i: int) -> np.ndarray:
    w, h, n_frames, base = _video_params(i)
    x = np.arange(w, dtype=np.int32)[None, None, :]
    y = np.arange(h, dtype=np.int32)[None, :, None]
    f = np.arange(n_frames, dtype=np.int32)[:, None, None]
    return (base + x + 2 * y + 3 * f).astype(np.uint8)


def synthetic_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic REAL-container media corpus: id % 3 cycles
    image → audio → video; images alternate PPM/BMP.  ``seed`` is kept
    for API compatibility but unused — every byte is a closed-form
    function of media_id (that's what makes the features SQL-statable)."""
    ids, payloads, types, fmts = [], [], [], []
    for i in range(n):
        m = i % 3
        if m == 0:
            rgb = _image_pixels(i)
            fmt = "ppm" if (i // 3) % 2 == 0 else "bmp"
            payloads.append(
                encode_ppm(rgb) if fmt == "ppm" else encode_bmp(rgb)
            )
            types.append("image")
            fmts.append(fmt)
        elif m == 1:
            samples, rate = _audio_samples(i)
            payloads.append(encode_wav(samples, rate))
            types.append("audio")
            fmts.append("wav")
        else:
            payloads.append(encode_y4m(_video_frames(i)))
            types.append("video")
            fmts.append("y4m")
        ids.append(i)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(types, pa.string()),
            "format": pa.array(fmts, pa.string()),
        },
        schema=MEDIA_SCHEMA,
    )


# ---------------------------------------------------------------------------
# decoders (payload bytes → arrays; pure Python + numpy)


def decode_ppm(buf: bytes) -> np.ndarray:
    """P6 → (h, w, 3) uint8 RGB.  Handles whitespace and ``#`` comments
    in the header per the netpbm spec."""
    if buf[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if buf[pos : pos + 1] == b"#":
            while buf[pos : pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(buf[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    return (
        np.frombuffer(buf, dtype=np.uint8, count=w * h * 3, offset=pos)
        .reshape(h, w, 3)
    )


def decode_bmp(buf: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP → (h, w, 3) uint8 RGB (undoes bottom-up rows,
    BGR order and 4-byte row padding)."""
    if buf[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", buf, 10)[0]
    hdr_size, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", buf, 14)
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    flip = h > 0
    h = abs(h)
    row = (3 * w + 3) & ~3
    rows = np.frombuffer(buf, dtype=np.uint8, count=row * h, offset=offset)
    bgr = rows.reshape(h, row)[:, : 3 * w].reshape(h, w, 3)
    if flip:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1]


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAV PCM16 → ((frames, channels) int16, sample_rate).  Walks
    the chunk list (a real WAV may carry LIST/fact chunks before data)."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, channels, rate, bits, data = 12, None, None, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        size = struct.unpack_from("<I", buf, pos + 4)[0]
        body = pos + 8
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack_from("<HHI", buf, body)
            bits = struct.unpack_from("<H", buf, body + 14)[0]
            if audio_fmt != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV (fmt={audio_fmt}, bits={bits})"
                )
        elif cid == b"data":
            data = np.frombuffer(buf, dtype="<i2", count=size // 2,
                                 offset=body)
        pos = body + size + (size & 1)  # chunks are word-aligned
    if data is None or channels is None:
        raise ValueError("WAV missing fmt/data chunk")
    return data.reshape(-1, channels), rate


def decode_y4m(buf: bytes) -> tuple[np.ndarray, int, int]:
    """YUV4MPEG2 C444 → ((frames, h, w) uint8 luma, fps_num, fps_den).
    Chroma planes are skipped (present in the stream, not needed for
    luma features); non-444 subsampling is rejected."""
    nl = buf.index(b"\n")
    head = buf[:nl].decode("ascii", "replace").split(" ")
    if head[0] != "YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    num, den, c = 25, 1, "C420jpeg"
    for p in head[1:]:
        if p.startswith("W"):
            w = int(p[1:])
        elif p.startswith("H"):
            h = int(p[1:])
        elif p.startswith("F"):
            num, den = (int(v) for v in p[1:].split(":"))
        elif p.startswith("C"):
            c = p
    if c != "C444":
        raise ValueError(f"unsupported Y4M chroma mode {c}")
    plane = w * h
    pos, frames = nl + 1, []
    while pos < len(buf):
        fnl = buf.index(b"\n", pos)  # FRAME line (may carry params)
        if buf[pos : pos + 5] != b"FRAME":
            raise ValueError("malformed Y4M frame marker")
        pos = fnl + 1
        frames.append(
            np.frombuffer(buf, dtype=np.uint8, count=plane, offset=pos)
            .reshape(h, w)
        )
        pos += 3 * plane  # Y + U + V
    return np.stack(frames) if frames else np.empty((0, h, w), np.uint8), num, den


class PurePythonCodec:
    """Container decode without any media library.  JPEG/MP3/MP4 would
    slot in here behind the same three methods via import-gated PIL /
    cv2 / ffmpeg; the pipeline stages only see arrays."""

    def decode_image(self, payload: bytes, fmt: str) -> np.ndarray:
        if fmt == "ppm":
            return decode_ppm(payload)
        if fmt == "bmp":
            return decode_bmp(payload)
        raise ValueError(f"unsupported image format {fmt!r}")

    def decode_audio(self, payload: bytes, fmt: str) -> tuple[np.ndarray, int]:
        if fmt == "wav":
            return decode_wav(payload)
        raise ValueError(f"unsupported audio format {fmt!r}")

    def decode_video(self, payload: bytes, fmt: str) -> tuple[np.ndarray, int, int]:
        if fmt == "y4m":
            return decode_y4m(payload)
        raise ValueError(f"unsupported video format {fmt!r}")


# ---------------------------------------------------------------------------
# pipeline stages

_FEATURE_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),
        ("format", pa.string()),
        ("width", pa.int64()),
        ("height", pa.int64()),
        ("n_frames", pa.int64()),
        ("channels", pa.int64()),
        ("sample_rate", pa.int64()),
        ("duration_ms", pa.int64()),
        ("px_sum_r", pa.int64()),
        ("px_sum_g", pa.int64()),
        ("px_sum_b", pa.int64()),
        ("sample_peak", pa.int64()),
        ("sample_abs_sum", pa.int64()),
        ("luma_sum", pa.int64()),
    ]
)


class MediaFeatureExtractor:
    """Actor-pool stage: real container decode → exact integer features.

    Codec constructed once per actor (``__init__``); per batch, each
    payload is decoded from its bytes and summarized into one row —
    dimensions, frame/sample counts, duration, and integer channel /
    amplitude / luma sums (exact, so value-level oracles can restate
    them).  Inapplicable columns are NULL per modality."""

    def __init__(self):
        self.codec = PurePythonCodec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        payloads = batch.column("payload")
        mtypes = batch.column("media_type").to_pylist()
        fmts = batch.column("format").to_pylist()
        out = {
            f.name: np.full(n, -1, dtype=np.int64)
            for f in _FEATURE_SCHEMA
            if f.type == pa.int64() and f.name != "media_id"
        }
        valid = {k: np.zeros(n, dtype=bool) for k in out}
        for row in range(n):
            payload = payloads[row].as_py()
            mt, fmt = mtypes[row], fmts[row]
            if mt == "image":
                img = self.codec.decode_image(payload, fmt)
                h, w, _ = img.shape
                sums = img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                vals = {
                    "width": w, "height": h,
                    "px_sum_r": sums[0], "px_sum_g": sums[1],
                    "px_sum_b": sums[2],
                }
            elif mt == "audio":
                samples, rate = self.codec.decode_audio(payload, fmt)
                frames, channels = samples.shape
                a = np.abs(samples.astype(np.int64))
                vals = {
                    "n_frames": frames, "channels": channels,
                    "sample_rate": rate,
                    "duration_ms": frames * 1000 // rate,
                    "sample_peak": a.max() if frames else 0,
                    "sample_abs_sum": a.sum(dtype=np.int64),
                }
            elif mt == "video":
                luma, num, den = self.codec.decode_video(payload, fmt)
                f, h, w = luma.shape
                vals = {
                    "width": w, "height": h, "n_frames": f,
                    "duration_ms": f * 1000 * den // num,
                    "luma_sum": luma.sum(dtype=np.int64),
                }
            else:
                raise ValueError(f"unknown media_type {mt!r}")
            for k, v in vals.items():
                out[k][row] = v
                valid[k][row] = True
        cols: dict = {
            "media_id": batch.column("media_id"),
            "media_type": batch.column("media_type"),
            "format": batch.column("format"),
        }
        for k in out:
            cols[k] = pa.array(out[k], pa.int64(), mask=~valid[k])
        return pa.table(cols, schema=_FEATURE_SCHEMA)


class FrameSampler:
    """Actor-pool stage: REAL frame sampling from video payloads — one
    output row per (media_id, sampled frame) with the frame's exact luma
    sum.  ``frames``: how many frames to sample, evenly spaced across
    the clip (standard keyframe-ish sampling for vision pipelines)."""

    def __init__(self, frames: int = 4):
        self.codec = PurePythonCodec()
        self.frames = frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, lsum = [], [], []
        payloads = batch.column("payload")
        mtypes = batch.column("media_type").to_pylist()
        fmts = batch.column("format").to_pylist()
        mids = batch.column("media_id").to_pylist()
        for row in range(batch.num_rows):
            if mtypes[row] != "video":
                continue
            luma, _, _ = self.codec.decode_video(
                payloads[row].as_py(), fmts[row]
            )
            total = luma.shape[0]
            take = np.unique(
                np.linspace(0, max(total - 1, 0), min(self.frames, total))
                .astype(np.int64)
            )
            sums = luma[take].sum(axis=(1, 2), dtype=np.int64)
            ids.extend([mids[row]] * len(take))
            fidx.extend(take.tolist())
            lsum.extend(sums.tolist())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_index": pa.array(fidx, pa.int64()),
                "frame_luma_sum": pa.array(lsum, pa.int64()),
            }
        )


def media_features(
    ds: "ray.data.Dataset", batch_size: int = 64, concurrency=(1, 4)
) -> "ray.data.Dataset":
    return ds.map_batches(
        MediaFeatureExtractor,
        concurrency=concurrency,
        batch_size=batch_size,  # small: payloads are large binaries
        batch_format="pyarrow",
    )


def sample_frames(
    ds: "ray.data.Dataset", frames: int = 4, batch_size: int = 64, concurrency=(1, 4)
) -> "ray.data.Dataset":
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"frames": frames},
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )
