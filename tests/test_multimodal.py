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
