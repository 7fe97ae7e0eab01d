"""Multimodal: real container decode (PPM/BMP/WAV/Y4M) + actor stages.

Every feature is an exact integer derivable from the generator's
closed-form parameters, so the tests check decoded values against the
formulas directly (the same relationship the DuckDB oracle states)."""

import numpy as np
import pytest
import ray.data

from go_mysql_transfer_ray.pipelines import multimodal


def test_ppm_roundtrip():
    rgb = multimodal._image_pixels(0)
    buf = multimodal.encode_ppm(rgb)
    assert buf.startswith(b"P6\n")
    out = multimodal.decode_ppm(buf)
    assert (out == rgb).all() and out.dtype == np.uint8


def test_ppm_header_comments():
    rgb = multimodal._image_pixels(3)
    buf = multimodal.encode_ppm(rgb)
    # inject a comment line after the magic (legal per netpbm spec)
    buf = b"P6\n# a comment\n" + buf[3:]
    assert (multimodal.decode_ppm(buf) == rgb).all()


def test_bmp_roundtrip_padding_and_flip():
    # w=18 → 3*w=54, padded row=56: exercises the pad bytes; bottom-up +
    # BGR are undone
    rgb = (np.arange(18 * 10 * 3, dtype=np.int64) % 251).astype(np.uint8)
    rgb = rgb.reshape(10, 18, 3)
    buf = multimodal.encode_bmp(rgb)
    assert buf[:2] == b"BM"
    out = multimodal.decode_bmp(buf)
    assert (out == rgb).all()


def test_wav_roundtrip_stereo():
    samples, rate = multimodal._audio_samples(7)  # 7%2=1 → stereo
    buf = multimodal.encode_wav(samples, rate)
    out, orate = multimodal.decode_wav(buf)
    assert orate == rate and out.shape == samples.shape
    assert (out == samples).all()


def test_wav_chunk_walk_tolerates_extra_chunks():
    samples, rate = multimodal._audio_samples(1)
    buf = multimodal.encode_wav(samples, rate)
    # splice a LIST chunk between fmt and data (odd size → pad byte)
    import struct
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = buf[:fmt_end] + extra + buf[fmt_end:]
    out, orate = multimodal.decode_wav(spliced)
    assert orate == rate and (out == samples).all()


def test_y4m_roundtrip():
    frames = multimodal._video_frames(2)
    buf = multimodal.encode_y4m(frames)
    luma, num, den = multimodal.decode_y4m(buf)
    assert (num, den) == (25, 1)
    assert (luma == frames).all()


def test_unsupported_formats_raise():
    c = multimodal.PurePythonCodec()
    with pytest.raises(ValueError):
        c.decode_image(b"\x89PNG...", "png")
    with pytest.raises(ValueError):
        c.decode_audio(b"ID3...", "mp3")
    with pytest.raises(ValueError):
        multimodal.decode_ppm(b"P5\n1 1\n255\n\x00")


def test_media_features_match_generator_formulas():
    n = 36
    tab = multimodal.synthetic_media_table(n=n)
    out = (
        multimodal.media_features(ray.data.from_arrow(tab), batch_size=8)
        .to_pandas()
        .set_index("media_id")
        .sort_index()
    )
    assert len(out) == n
    for i in range(n):
        row = out.loc[i]
        if i % 3 == 0:  # image
            w, h, br, bg, bb = multimodal._image_params(i)
            # Σ(base + x + 2y) = w·h·base + h·w(w−1)/2 + w·h(h−1)
            geo = h * w * (w - 1) // 2 + w * h * (h - 1)
            assert row["width"] == w and row["height"] == h
            assert row["px_sum_r"] == w * h * br + geo
            assert row["px_sum_g"] == w * h * bg + geo
            assert row["px_sum_b"] == w * h * bb + geo
            assert row["format"] == ("ppm" if (i // 3) % 2 == 0 else "bmp")
            assert np.isnan(row["sample_peak"]) and np.isnan(row["luma_sum"])
        elif i % 3 == 1:  # audio
            channels, rate, frames, amp = multimodal._audio_params(i)
            assert row["channels"] == channels
            assert row["sample_rate"] == rate
            assert row["n_frames"] == frames
            assert row["duration_ms"] == frames * 1000 // rate
            assert row["sample_peak"] == amp
            assert row["sample_abs_sum"] == amp * frames * channels
            assert np.isnan(row["width"]) and np.isnan(row["px_sum_r"])
        else:  # video
            w, h, f, base = multimodal._video_params(i)
            geo = h * w * (w - 1) // 2 + w * h * (h - 1)
            luma = f * (w * h * base + geo) + w * h * 3 * (f - 1) * f // 2
            assert row["width"] == w and row["height"] == h
            assert row["n_frames"] == f
            assert row["duration_ms"] == f * 40  # 25 fps
            assert row["luma_sum"] == luma
            assert np.isnan(row["channels"]) and np.isnan(row["px_sum_b"])


def test_frame_sampler_real_luma():
    tab = multimodal.synthetic_media_table(n=30)
    ds = ray.data.from_arrow(tab)
    out = multimodal.sample_frames(ds, frames=3).to_pandas()
    vids = [i for i in range(30) if i % 3 == 2]
    assert set(out["media_id"]) == set(vids)
    for i in vids:
        w, h, f, base = multimodal._video_params(i)
        got = out[out["media_id"] == i].sort_values("frame_index")
        assert len(got) == min(3, f)
        geo = h * w * (w - 1) // 2 + w * h * (h - 1)
        for _, r in got.iterrows():
            k = int(r["frame_index"])
            expect = w * h * base + geo + 3 * k * w * h
            assert r["frame_luma_sum"] == expect


# ---------------------------------------------------------------------------
# fast-path (format-grouped vectorized) vs scalar-codec parity


def _force_scalar(tab):
    """Run MediaFeatureExtractor through the per-row scalar codecs only."""
    import pyarrow as pa

    ex = multimodal.MediaFeatureExtractor()
    n = tab.num_rows
    out = {
        f.name: np.full(n, -1, dtype=np.int64)
        for f in multimodal._FEATURE_SCHEMA
        if f.type == pa.int64() and f.name != "media_id"
    }
    valid = {k: np.zeros(n, dtype=bool) for k in out}
    ex._scalar_rows(tab.combine_chunks(), list(range(n)), out, valid)
    cols = {
        "media_id": tab.column("media_id"),
        "media_type": tab.column("media_type"),
        "format": tab.column("format"),
    }
    for k in out:
        cols[k] = pa.array(out[k], pa.int64(), mask=~valid[k])
    return pa.table(cols, schema=multimodal._FEATURE_SCHEMA)


def _noncanonical_media_table():
    """Payload variants the fast paths must ROUTE TO FALLBACK: legal per
    spec but not the canonical layout the encoders emit."""
    import struct
    import pyarrow as pa

    rows = []
    # PPM with a header comment
    rgb = multimodal._image_pixels(6)
    rows.append((b"P6\n# c\n" + multimodal.encode_ppm(rgb)[3:], "image", "ppm"))
    # PPM with double-space separator
    buf = multimodal.encode_ppm(multimodal._image_pixels(9))
    head, rest = buf.split(b"\n", 2)[0], buf.split(b"\n", 2)
    rows.append((b"P6\n" + rest[1].replace(b" ", b"  ") + b"\n" + rest[2],
                 "image", "ppm"))
    # WAV with a LIST chunk spliced between fmt and data
    samples, rate = multimodal._audio_samples(1)
    wav = multimodal.encode_wav(samples, rate)
    fmt_end = 12 + 8 + 16
    rows.append((wav[:fmt_end] + b"LIST" + struct.pack("<I", 5) + b"INFOx\x00"
                 + wav[fmt_end:], "audio", "wav"))
    # Y4M whose FRAME markers carry parameters
    y4m = multimodal.encode_y4m(multimodal._video_frames(2))
    rows.append((y4m.replace(b"FRAME\n", b"FRAME Ixy\n"), "video", "y4m"))
    # top-down BMP (negative height) — in-band for the fast path itself
    rgb = multimodal._image_pixels(12)
    bmp = bytearray(multimodal.encode_bmp(rgb))
    h = rgb.shape[0]
    # flip height sign and un-flip the rows so pixels stay identical
    struct.pack_into("<i", bmp, 22, -h)
    row_sz = (3 * rgb.shape[1] + 3) & ~3
    body = bytes(bmp[54:])
    flipped = b"".join(
        body[(h - 1 - r) * row_sz : (h - r) * row_sz] for r in range(h)
    )
    rows.append((bytes(bmp[:54]) + flipped, "image", "bmp"))
    return pa.table(
        {
            "media_id": pa.array(range(len(rows)), pa.int64()),
            "payload": pa.array([r[0] for r in rows], pa.binary()),
            "media_type": pa.array([r[1] for r in rows], pa.string()),
            "format": pa.array([r[2] for r in rows], pa.string()),
        },
        schema=multimodal.MEDIA_SCHEMA,
    )


def test_fast_paths_match_scalar_on_canonical_corpus():
    tab = multimodal.synthetic_media_table(n=48)
    fast = multimodal.MediaFeatureExtractor()(tab)
    assert fast.equals(_force_scalar(tab))


def test_fast_paths_fall_back_and_match_on_noncanonical_payloads():
    tab = _noncanonical_media_table()
    fast = multimodal.MediaFeatureExtractor()(tab)
    assert fast.equals(_force_scalar(tab))
    # and a shuffled mix of canonical + non-canonical in one batch
    import pyarrow as pa
    base = multimodal.synthetic_media_table(n=15)
    mixed = pa.concat_tables([
        base.set_column(0, "media_id",
                        pa.array(range(100, 115), pa.int64())),
        tab,
    ]).combine_chunks()
    idx = np.argsort(np.arange(mixed.num_rows) * 7919 % 97).tolist()
    mixed = mixed.take(idx)
    assert multimodal.MediaFeatureExtractor()(mixed).equals(
        _force_scalar(mixed)
    )


def test_frame_sampler_fast_matches_scalar_mixed():
    import pyarrow as pa
    # canonical videos + one param-carrying Y4M that must fall back
    base = multimodal.synthetic_media_table(n=24)
    y4m = multimodal.encode_y4m(multimodal._video_frames(5))
    odd = pa.table(
        {
            "media_id": pa.array([999], pa.int64()),
            "payload": pa.array(
                [y4m.replace(b"FRAME\n", b"FRAME Ixy\n")], pa.binary()
            ),
            "media_type": pa.array(["video"], pa.string()),
            "format": pa.array(["y4m"], pa.string()),
        },
        schema=multimodal.MEDIA_SCHEMA,
    )
    mixed = pa.concat_tables([base, odd]).combine_chunks()
    got = multimodal.FrameSampler(frames=3)(mixed).to_pandas()
    # scalar expectation straight from decode_y4m
    for mid in got["media_id"].unique():
        row = mixed.take(
            np.flatnonzero(
                np.asarray(mixed.column("media_id")) == mid
            ).tolist()
        )
        luma, _, _ = multimodal.decode_y4m(row.column("payload")[0].as_py())
        total = luma.shape[0]
        take = np.unique(
            np.linspace(0, max(total - 1, 0), min(3, total)).astype(np.int64)
        )
        sub = got[got["media_id"] == mid].sort_values("frame_index")
        assert list(sub["frame_index"]) == take.tolist()
        expect = luma[take].sum(axis=(1, 2), dtype=np.int64)
        assert list(sub["frame_luma_sum"]) == expect.tolist()
