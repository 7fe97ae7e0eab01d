"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / feature-extract / resize / frame-sample are
actor-pool ``map_batches`` stages.  The actual codec work is STUBBED (no
image/audio libraries in this environment — see the build brief): the
``DeterministicFakeCodec`` produces seeded, reproducible "pixels" from the
payload bytes so the Ray-side plumbing — schema, batch sizing, actor
signature, output layout — is real and tested, while ``RealCodec`` raises
``NotImplementedError`` until a codec library is provided.

Scale notes: binary payloads are large → run with a small ``batch_size``
(rows) and keep ``batch_format="pyarrow"`` end-to-end; never convert the
payload column to pandas (object boxing copies every buffer).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("payload", pa.binary()),
        ("media_type", pa.string()),   # image | audio | video
        ("format", pa.string()),       # png | wav | mp4 | ...
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synthetic_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus (payload = seeded bytes)."""
    rng = np.random.RandomState(seed)
    payloads = [rng.bytes(256 + int(rng.randint(0, 1024))) for _ in range(n)]
    types = ["image", "audio", "video"]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array([types[i % 3] for i in range(n)]),
            "format": pa.array(["png", "wav", "mp4"][i % 3] for i in range(n)),
            "width": pa.array(np.full(n, 64, np.int32)),
            "height": pa.array(np.full(n, 64, np.int32)),
            "duration_ms": pa.array((1000 + 100 * np.arange(n)).astype(np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


class RealCodec:
    """Placeholder for a real decoder — STUB per the build brief."""

    def decode_image(self, payload: bytes, width: int, height: int) -> np.ndarray:
        raise NotImplementedError(
            "no image codec library available in this environment; "
            "swap in PIL/cv2 and return an (H, W, 3) uint8 array"
        )


class DeterministicFakeCodec:
    """Seeded stand-in codec: bytes → reproducible uint8 'pixels'."""

    def decode_image(self, payload: bytes, width: int, height: int) -> np.ndarray:
        seed = int.from_bytes(hashlib.sha256(payload).digest()[:4], "little")
        rng = np.random.RandomState(seed)
        return rng.randint(0, 256, size=(height, width, 3), dtype=np.uint8)


class MediaFeatureExtractor:
    """Actor-pool stage: decode (stub) → mean-pool feature vector.

    Real pattern: codec/model loaded once per actor in ``__init__``; per
    batch, decode each payload and emit a fixed-size feature vector column.
    """

    def __init__(self, patch: int = 8, use_fake_codec: bool = True):
        self.codec = DeterministicFakeCodec() if use_fake_codec else RealCodec()
        self.patch = patch

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for row in range(batch.num_rows):
            payload = batch.column("payload")[row].as_py()
            w = batch.column("width")[row].as_py()
            h = batch.column("height")[row].as_py()
            img = self.codec.decode_image(payload, w, h)
            p = self.patch
            pooled = img[: h // p * p, : w // p * p].reshape(
                h // p, p, w // p, p, 3
            ).mean(axis=(1, 3))
            feats.append(pooled.mean(axis=2).reshape(-1).astype(np.float32))
        dim = len(feats[0]) if feats else 0
        flat = np.concatenate(feats) if feats else np.empty(0, np.float32)
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "media_type": batch.column("media_type"),
                "feature": pa.FixedSizeListArray.from_arrays(pa.array(flat), dim)
                if dim
                else pa.array([], pa.list_(pa.float32())),
            }
        )


class FrameSampler:
    """Actor-pool stage: sample N deterministic 'frames' from video payloads
    (stub decode) — one output row per (media_id, frame_index)."""

    def __init__(self, frames: int = 4):
        self.codec = DeterministicFakeCodec()
        self.frames = frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, payloads = [], [], []
        for row in range(batch.num_rows):
            if batch.column("media_type")[row].as_py() != "video":
                continue
            mid = batch.column("media_id")[row].as_py()
            payload = batch.column("payload")[row].as_py()
            for f in range(self.frames):
                ids.append(mid)
                fidx.append(f)
                payloads.append(
                    hashlib.sha256(payload + f.to_bytes(4, "little")).digest()
                )
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_index": pa.array(fidx, pa.int32()),
                "frame_digest": pa.array(payloads, pa.binary()),
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
