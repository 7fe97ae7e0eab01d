"""Multimodal plumbing: schema, actor stages, deterministic stub codec."""

import numpy as np
import pytest
import ray.data

from go_mysql_transfer_ray.pipelines import multimodal


def test_fake_codec_deterministic():
    c = multimodal.DeterministicFakeCodec()
    a = c.decode_image(b"payload", 16, 16)
    b = c.decode_image(b"payload", 16, 16)
    assert (a == b).all() and a.shape == (16, 16, 3) and a.dtype == np.uint8
    assert not (a == c.decode_image(b"other", 16, 16)).all()


def test_real_codec_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.RealCodec().decode_image(b"x", 1, 1)


def test_media_features_pipeline():
    tab = multimodal.synthetic_media_table(n=30)
    ds = ray.data.from_arrow(tab)
    out = multimodal.media_features(ds, batch_size=8).to_pandas()
    assert len(out) == 30
    dims = {len(f) for f in out["feature"]}
    assert dims == {64}  # 8x8 pooled grid
    # determinism across runs
    out2 = multimodal.media_features(ray.data.from_arrow(tab), batch_size=16).to_pandas()
    f1 = np.stack(out.sort_values("media_id")["feature"].to_numpy())
    f2 = np.stack(out2.sort_values("media_id")["feature"].to_numpy())
    assert np.allclose(f1, f2)


def test_frame_sampler_video_only():
    tab = multimodal.synthetic_media_table(n=30)
    ds = ray.data.from_arrow(tab)
    out = multimodal.sample_frames(ds, frames=3).to_pandas()
    n_videos = (tab.column("media_type").to_pandas() == "video").sum()
    assert len(out) == n_videos * 3
    assert set(out["frame_index"]) == {0, 1, 2}
