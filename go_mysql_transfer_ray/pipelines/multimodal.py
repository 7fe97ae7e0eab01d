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
feature stages decode GROUPED BY FORMAT, zero-copy: payloads stay in the
Arrow value buffer (one numpy view per batch, ``_binary_views``), fixed
headers (BMP/WAV) parse vectorized at header offsets across the whole
group, the canonical PPM header parses vectorized over a 24-byte window
matrix, Y4M headers parse from a ≤64-byte per-row window (header bytes
only — never the payload), and all payload math (pixel/sample/luma
sums) runs as grouped numpy gathers into the shared buffer — no per-row
``as_py()`` bytes materialization anywhere on the fast path.  Rows a
fast path can't prove regular (header comments, extra RIFF chunks, Y4M
frame params, format/media_type disagreement) fall back to the scalar
spec-general codecs below, one row at a time.
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
# vectorized (format-grouped) decode: batch-level fast paths
#
# The scalar codecs above implement the full published specs; the fast
# paths below prove a payload matches the CANONICAL layout each encoder
# emits (fixed header offsets, no comment lines, no extra RIFF chunks,
# bare FRAME markers) with vectorized checks across the whole format
# group, then run the payload math per row over ZERO-COPY views into
# the shared Arrow value buffer (slice + reshape + strided sum /
# ``.view('<i2')``) — never ``as_py()`` bytes copies and never
# fancy-index gathers, whose int64 index matrices cost 8× the payload
# bytes in memory traffic.  Any row the checks can't prove regular is
# routed to the scalar codec, so behavior is bit-identical either way.


def _binary_views(col) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Zero-copy views over a (large_)binary column: the shared uint8
    value buffer plus per-row [start, end) offsets into it."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    odt = np.int64 if pa.types.is_large_binary(col.type) else np.int32
    off = col.offset
    offsets = np.frombuffer(col.buffers()[1], dtype=odt)[
        off : off + len(col) + 1
    ].astype(np.int64)
    values = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    return values, offsets[:-1], offsets[1:]


def _le_fields(values: np.ndarray, pos: np.ndarray, nbytes: int) -> np.ndarray:
    """Little-endian unsigned ints of width ``nbytes`` read at per-row
    byte positions ``pos`` — one gather for the whole group."""
    b = values[pos[:, None] + np.arange(nbytes)].astype(np.int64)
    return b @ (1 << (8 * np.arange(nbytes, dtype=np.int64)))


def _bytes_eq(values: np.ndarray, pos: np.ndarray, literal: bytes) -> np.ndarray:
    lit = np.frombuffer(literal, dtype=np.uint8)
    return (values[pos[:, None] + np.arange(len(lit))] == lit).all(axis=1)


def _parse_digit_spans(M: np.ndarray, start: np.ndarray, length: np.ndarray,
                       max_digits: int = 5) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized base-10 parse of per-row digit spans inside a window
    matrix ``M`` (k, W).  Returns (values, ok): ok is False where the
    span is empty, too long, or contains a non-digit."""
    k = M.shape[0]
    ok = (length >= 1) & (length <= max_digits)
    st = np.where(ok, start, 0)
    ln = np.where(ok, length, 1)
    cols = st[:, None] + np.arange(max_digits)
    cols = np.minimum(cols, M.shape[1] - 1)
    d = M[np.arange(k)[:, None], cols].astype(np.int64) - ord("0")
    mask = np.arange(max_digits) < ln[:, None]
    ok &= ((d >= 0) & (d <= 9) | ~mask).all(axis=1)
    powers = np.where(mask, 10 ** np.maximum(ln[:, None] - 1 - np.arange(max_digits), 0), 0)
    return (d * mask * powers).sum(axis=1), ok


def _ppm_headers(values: np.ndarray, s: np.ndarray, lens: np.ndarray):
    """Vectorized canonical-PPM header parse: ``P6\\n{w} {h}\\n255\\n``
    over a 24-byte window matrix.  Returns (w, h, data_pos, ok); rows
    with comments / exotic whitespace get ok=False (scalar fallback)."""
    W = 24
    k = len(s)
    w = np.zeros(k, np.int64)
    h = np.zeros(k, np.int64)
    pos = np.zeros(k, np.int64)
    ok = lens >= W
    c = np.flatnonzero(ok)
    if not c.size:
        return w, h, pos, ok
    M = values[s[c][:, None] + np.arange(W)]
    good = (M[:, :3] == np.frombuffer(b"P6\n", np.uint8)).all(axis=1)
    idx = np.arange(W)
    sp_mask = M == ord(" ")
    sp_mask[:, :4] = False  # width has ≥1 digit after "P6\n"
    good &= sp_mask.any(axis=1)
    sp = sp_mask.argmax(axis=1)
    nl_mask = (M == ord("\n")) & (idx[None, :] > sp[:, None])
    good &= nl_mask.any(axis=1)
    nl = nl_mask.argmax(axis=1)
    wv, wok = _parse_digit_spans(M, np.full(len(c), 3), sp - 3)
    hv, hok = _parse_digit_spans(M, sp + 1, nl - sp - 1)
    good &= wok & hok & (nl + 5 <= W)
    tail = M[np.arange(len(c))[:, None],
             np.minimum(nl[:, None] + 1 + np.arange(4), W - 1)]
    good &= (tail == np.frombuffer(b"255\n", np.uint8)).all(axis=1)
    w[c], h[c], pos[c] = wv, hv, nl + 5
    ok[c] = good
    ok &= lens >= pos + 3 * w * h
    return w, h, pos, ok


def _y4m_header_window(win: bytes):
    """Parse one Y4M header line from a bounded window (header bytes
    only).  Returns (w, h, fps_num, fps_den, data_pos) or None when the
    header doesn't fit the window / isn't C444 (scalar fallback)."""
    nl = win.find(b"\n")
    if nl < 0:
        return None
    head = win[:nl].split(b" ")
    if head[0] != b"YUV4MPEG2":
        return None
    w = h = None
    num, den, chroma = 25, 1, b"C420jpeg"
    for p in head[1:]:
        if p[:1] == b"W":
            w = int(p[1:])
        elif p[:1] == b"H":
            h = int(p[1:])
        elif p[:1] == b"F":
            num, den = (int(v) for v in p[1:].split(b":"))
        elif p[:1] == b"C":
            chroma = p
    if chroma != b"C444" or w is None or h is None or w <= 0 or h <= 0:
        return None
    return w, h, num, den, nl + 1


def _y4m_group_scan(values, s, lens, frames_wanted=None):
    """Shared Y4M fast-path scan: per-row bounded-window header parse,
    then grouped vectorized FRAME-marker verification and luma-plane
    gathers.  Yields ``(local_rows, take_idx, frame_sums, meta)`` per
    regular group where ``frame_sums`` is (k, len(take)) int64 luma sums
    and ``meta`` is (w, h, f, num, den); returns the local indices that
    need the scalar codec."""
    k = len(s)
    w = np.zeros(k, np.int64)
    h = np.zeros(k, np.int64)
    num = np.zeros(k, np.int64)
    den = np.ones(k, np.int64)
    hdr = np.zeros(k, np.int64)
    ok = np.zeros(k, bool)
    for j in range(k):
        win_len = min(int(lens[j]), 64)
        parsed = _y4m_header_window(values[s[j] : s[j] + win_len].tobytes())
        if parsed is not None:
            w[j], h[j], num[j], den[j], hdr[j] = parsed
            ok[j] = True
    plane = w * h
    stride = 6 + 3 * plane
    body = lens - hdr
    ok &= (body >= 0) & (num > 0) & (den > 0)
    fcnt = np.where(ok, body % np.where(stride > 0, stride, 1) == 0, False)
    ok &= fcnt
    f = np.where(ok, body // np.where(stride > 0, stride, 1), 0)
    groups = []
    marker = np.frombuffer(b"FRAME\n", np.uint8)
    keys = np.stack([plane, f], axis=1)
    okr = np.flatnonzero(ok)
    if okr.size:
        uniq, inv = np.unique(keys[okr], axis=0, return_inverse=True)
        for u in range(len(uniq)):
            m = okr[inv == u]
            pv, fv = int(uniq[u][0]), int(uniq[u][1])
            sv = 6 + 3 * pv
            base = s[m] + hdr[m]
            if fv:
                mk = values[
                    base[:, None, None]
                    + (np.arange(fv) * sv)[None, :, None]
                    + np.arange(6)[None, None, :]
                ]
                regular = (mk == marker).all(axis=(1, 2))
            else:
                regular = np.ones(len(m), bool)
            irregular = m[~regular]
            if irregular.size:
                ok[irregular] = False
            m = m[regular]
            base = base[regular]
            if not m.size:
                continue
            if frames_wanted is None:
                take = np.arange(fv)
            else:
                take = np.unique(
                    np.linspace(0, max(fv - 1, 0), min(frames_wanted, fv))
                    .astype(np.int64)
                ) if fv else np.empty(0, np.int64)
            sums = np.zeros((len(m), len(take)), np.int64)
            if len(take) and pv:
                full = len(take) == fv
                for j, bb in enumerate(base):
                    # body is fv frames of sv bytes each, contiguous →
                    # reshape is free; the luma columns are a strided
                    # view the sum kernel walks without copying
                    lum = values[bb : bb + fv * sv].reshape(fv, sv)[
                        :, 6 : 6 + pv
                    ]
                    sums[j] = (
                        lum.sum(axis=1, dtype=np.int64)
                        if full
                        else lum[take].sum(axis=1, dtype=np.int64)
                    )
            meta = (w[m], h[m], np.full(len(m), fv, np.int64), num[m], den[m])
            groups.append((m, take, sums, meta))
    return groups, np.flatnonzero(~ok)


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
        batch = batch.combine_chunks()
        n = batch.num_rows
        out = {
            f.name: np.full(n, -1, dtype=np.int64)
            for f in _FEATURE_SCHEMA
            if f.type == pa.int64() and f.name != "media_id"
        }
        valid = {k: np.zeros(n, dtype=bool) for k in out}
        values, starts, ends = _binary_views(batch.column("payload"))
        mtypes = np.asarray(batch.column("media_type").to_pylist(), object)
        fmts = np.asarray(batch.column("format").to_pylist(), object)
        slow: list[int] = []
        fast = {
            "ppm": ("image", self._fast_ppm),
            "bmp": ("image", self._fast_bmp),
            "wav": ("audio", self._fast_wav),
            "y4m": ("video", self._fast_y4m),
        }
        for fmt, (mt, handler) in fast.items():
            g = np.flatnonzero((fmts == fmt) & (mtypes == mt))
            if g.size:
                left = handler(values, starts[g], ends[g], g, out, valid)
                slow.extend(left.tolist())
        matched = np.asarray(
            [fast.get(f, (None,))[0] == m for f, m in zip(fmts, mtypes)],
            dtype=bool,
        )
        slow.extend(np.flatnonzero(~matched).tolist())
        if slow:
            self._scalar_rows(batch, sorted(slow), out, valid)
        cols: dict = {
            "media_id": batch.column("media_id"),
            "media_type": batch.column("media_type"),
            "format": batch.column("format"),
        }
        for k in out:
            cols[k] = pa.array(out[k], pa.int64(), mask=~valid[k])
        return pa.table(cols, schema=_FEATURE_SCHEMA)

    # -- format-grouped fast paths (vectorized; return leftover rows) --

    @staticmethod
    def _set(out, valid, rows, **vals):
        for k, v in vals.items():
            out[k][rows] = v
            valid[k][rows] = True

    def _fast_ppm(self, values, s, e, rows, out, valid) -> np.ndarray:
        lens = e - s
        w, h, pos, ok = _ppm_headers(values, s, lens)
        okr = np.flatnonzero(ok)
        if okr.size:
            sums = np.empty((len(okr), 3), np.int64)
            for j, r in enumerate(okr):
                b = int(s[r] + pos[r])
                nb = 3 * int(w[r]) * int(h[r])
                # contiguous slice → reshape is a free view
                sums[j] = values[b : b + nb].reshape(-1, 3).sum(
                    axis=0, dtype=np.int64
                )
            self._set(
                out, valid, rows[okr],
                width=w[okr], height=h[okr],
                px_sum_r=sums[:, 0], px_sum_g=sums[:, 1],
                px_sum_b=sums[:, 2],
            )
        return rows[~ok]

    def _fast_bmp(self, values, s, e, rows, out, valid) -> np.ndarray:
        lens = e - s
        ok = lens >= 54
        c = np.flatnonzero(ok)
        if not c.size:
            return rows[~ok]
        sc = s[c]
        good = _bytes_eq(values, sc, b"BM")
        off = _le_fields(values, sc + 10, 4)
        w = _le_fields(values, sc + 18, 4)
        h = _le_fields(values, sc + 22, 4)
        h = np.where(h >= 1 << 31, h - (1 << 32), h)  # int32 height
        bpp = _le_fields(values, sc + 28, 2)
        comp = _le_fields(values, sc + 30, 4)
        habs = np.abs(h)
        rowb = (3 * w + 3) & ~3
        good &= (
            (bpp == 24) & (comp == 0) & (w > 0) & (habs > 0)
            & (off >= 54) & (lens[c] >= off + rowb * habs)
        )
        ok[c] = good
        okc = np.flatnonzero(good)
        if okc.size:
            m = c[okc]
            sums = np.empty((len(m), 3), np.int64)
            for j, r in enumerate(m):
                wv, hv = int(w[okc[j]]), int(habs[okc[j]])
                rb = (3 * wv + 3) & ~3
                b = int(s[r] + off[okc[j]])
                # contiguous rows → reshape is free; dropping the pad
                # bytes and splitting channels are strided views the
                # sum kernel walks without copying.  Row order
                # (bottom-up vs top-down) is sum-invariant.
                px = values[b : b + rb * hv].reshape(hv, rb)[:, : 3 * wv]
                for ch in range(3):
                    sums[j, ch] = px[:, ch::3].sum(dtype=np.int64)
            self._set(
                out, valid, rows[m],
                width=w[okc], height=habs[okc],
                px_sum_r=sums[:, 2], px_sum_g=sums[:, 1],  # BGR→RGB
                px_sum_b=sums[:, 0],
            )
        return rows[~ok]

    def _fast_wav(self, values, s, e, rows, out, valid) -> np.ndarray:
        lens = e - s
        ok = lens >= 44
        c = np.flatnonzero(ok)
        if not c.size:
            return rows[~ok]
        sc = s[c]
        good = (
            _bytes_eq(values, sc, b"RIFF")
            & _bytes_eq(values, sc + 8, b"WAVEfmt ")
            & _bytes_eq(values, sc + 36, b"data")
        )
        good &= _le_fields(values, sc + 16, 4) == 16      # canonical fmt
        good &= _le_fields(values, sc + 20, 2) == 1       # PCM
        ch = _le_fields(values, sc + 22, 2)
        rate = _le_fields(values, sc + 24, 4)
        good &= _le_fields(values, sc + 34, 2) == 16      # 16-bit
        dsize = _le_fields(values, sc + 40, 4)
        good &= (
            (ch >= 1) & (rate > 0) & (dsize % 2 == 0)
            # exact length: trailing chunks (e.g. a second 'data') would
            # change what the scalar chunk-walk decodes — fall back
            & (lens[c] == 44 + dsize)
        )
        ok[c] = good
        okc = np.flatnonzero(good)
        if okc.size:
            m = c[okc]
            frames = dsize[okc] // (2 * ch[okc])
            self._set(
                out, valid, rows[m],
                n_frames=frames, channels=ch[okc],
                sample_rate=rate[okc],
                duration_ms=frames * 1000 // rate[okc],
            )
            peak = np.zeros(len(m), np.int64)
            asum = np.zeros(len(m), np.int64)
            for j, r in enumerate(m):
                dv = int(dsize[okc[j]])
                if dv:
                    b = int(s[r]) + 44
                    # unaligned-safe int16 view over the sample bytes
                    a = np.abs(
                        values[b : b + dv].view("<i2").astype(np.int32)
                    )
                    peak[j] = a.max()
                    asum[j] = a.sum(dtype=np.int64)
            self._set(out, valid, rows[m],
                      sample_peak=peak, sample_abs_sum=asum)
        return rows[~ok]

    def _fast_y4m(self, values, s, e, rows, out, valid) -> np.ndarray:
        groups, left = _y4m_group_scan(values, s, e - s)
        for m, _take, frame_sums, (w, h, f, num, den) in groups:
            self._set(
                out, valid, rows[m],
                width=w, height=h, n_frames=f,
                duration_ms=f * 1000 * den // num,
                luma_sum=frame_sums.sum(axis=1, dtype=np.int64),
            )
        return rows[left]

    def _scalar_rows(self, batch, slow_rows, out, valid) -> None:
        """Spec-general per-row fallback (comments, extra chunks, frame
        params, mismatched metadata) — identical to the scalar codecs."""
        payloads = batch.column("payload")
        mtypes = batch.column("media_type")
        fmts = batch.column("format")
        for row in slow_rows:
            payload = payloads[row].as_py()
            mt, fmt = mtypes[row].as_py(), fmts[row].as_py()
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


class FrameSampler:
    """Actor-pool stage: REAL frame sampling from video payloads — one
    output row per (media_id, sampled frame) with the frame's exact luma
    sum.  ``frames``: how many frames to sample, evenly spaced across
    the clip (standard keyframe-ish sampling for vision pipelines)."""

    def __init__(self, frames: int = 4):
        self.codec = PurePythonCodec()
        self.frames = frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        payloads = batch.column("payload")
        mtypes = np.asarray(batch.column("media_type").to_pylist(), object)
        fmts = np.asarray(batch.column("format").to_pylist(), object)
        mids = batch.column("media_id").to_pylist()
        # per-row results keyed by row index so output keeps row order
        per_row: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        vid = np.flatnonzero(mtypes == "video")
        fast = vid[fmts[vid] == "y4m"] if vid.size else vid
        if fast.size:
            values, s, e = _binary_views(batch.column("payload"))
            groups, left = _y4m_group_scan(
                values, s[fast], (e - s)[fast], frames_wanted=self.frames
            )
            for m, take, frame_sums, _meta in groups:
                for j, r in enumerate(fast[m]):
                    per_row[int(r)] = (take, frame_sums[j])
            slow = set(fast[left].tolist()) | set(
                vid[fmts[vid] != "y4m"].tolist()
            )
        else:
            slow = set(vid.tolist())
        for row in sorted(slow):
            luma, _, _ = self.codec.decode_video(
                payloads[row].as_py(), fmts[row]
            )
            total = luma.shape[0]
            take = np.unique(
                np.linspace(0, max(total - 1, 0), min(self.frames, total))
                .astype(np.int64)
            )
            per_row[row] = (take, luma[take].sum(axis=(1, 2), dtype=np.int64))
        ids, fidx, lsum = [], [], []
        for row in sorted(per_row):
            take, sums = per_row[row]
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
