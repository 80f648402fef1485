"""Multimodal-column plumbing: image/audio/video as opaque `binary`
columns with typed metadata, processed by actor-pool map_batches stages.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this environment, so
the decode kernels are stubbed behind ``fake=True`` (a deterministic
hash-driven fake decoder) or raise NotImplementedError — but the Ray-side
plumbing is real and tested: schemas, actor-pool signatures, batch sizing
for large binary payloads, and output layout are exactly what a real
deployment would use (swap `_decode_real` in, nothing else changes).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),          # image | audio | video
    ("payload", pa.binary()),       # opaque encoded bytes
    ("mime", pa.string()),
    ("width", pa.int32()),          # -1 when unknown / n.a.
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def make_fake_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows for tests/benches."""
    rng = np.random.Generator(np.random.PCG64(seed))
    kinds = ["image", "audio", "video"]
    rows = {k.name: [] for k in MEDIA_SCHEMA}
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, int(rng.integers(256, 4096)),
                               dtype=np.uint8).tobytes()
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append({"image": "image/png", "audio": "audio/wav",
                             "video": "video/mp4"}[kind])
        rows["width"].append(int(rng.integers(16, 512)) if kind != "audio" else -1)
        rows["height"].append(int(rng.integers(16, 512)) if kind != "audio" else -1)
        rows["duration_ms"].append(int(rng.integers(100, 60000))
                                   if kind != "image" else -1)
    return pa.table(rows, schema=MEDIA_SCHEMA)


class ImageFeatureExtractor:
    """Actor-pool stage: decode + feature-extract images.

    Real deployment: ``__init__`` loads the decoder/model ONCE per actor;
    ``__call__`` decodes each payload and emits a feature vector. Here the
    decode is stubbed: fake=True produces a deterministic 64-d feature from
    a hash of the payload (stable across runs/platforms); fake=False raises
    NotImplementedError (no image libs in this environment).

    Use small batch_size (large binary payloads): e.g.
    ``ds.map_batches(ImageFeatureExtractor, fn_constructor_kwargs={"fake": True},
    batch_size=32, concurrency=(2, 8), num_cpus=1, batch_format="pyarrow")``.
    """

    DIM = 64

    def __init__(self, fake: bool = False) -> None:
        self.fake = fake
        # real version: self.model = load_model(...)  (once per actor)

    def _decode_real(self, payload: bytes) -> np.ndarray:
        raise NotImplementedError(
            "image decode requires PIL/opencv — not available in this "
            "environment; run with fake=True for the deterministic stub")

    def _decode_fake(self, payload: bytes) -> np.ndarray:
        d = hashlib.blake2b(payload, digest_size=self.DIM).digest()
        return (np.frombuffer(d, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0

    def __call__(self, b: pa.Table) -> pa.Table:
        decode = self._decode_fake if self.fake else self._decode_real
        feats = np.stack([decode(p) for p in b.column("payload").to_pylist()])
        return pa.table({
            "media_id": b.column("media_id"),
            "feature": pa.FixedSizeListArray.from_arrays(
                pa.array(feats.ravel(), pa.float32()), self.DIM),
        })


class FrameSampler:
    """Actor-pool stage: sample n frames per video payload (stubbed).

    Emits one row per sampled frame (media_id, frame_idx, frame_payload) —
    the batch-native flat-map layout a real frame sampler would use."""

    def __init__(self, n_frames: int = 4, fake: bool = False) -> None:
        self.n_frames = n_frames
        self.fake = fake

    def __call__(self, b: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "video decode requires ffmpeg — not available; use fake=True")
        ids, idxs, frames = [], [], []
        for mid, payload, dur in zip(b.column("media_id").to_pylist(),
                                     b.column("payload").to_pylist(),
                                     b.column("duration_ms").to_pylist()):
            for fi in range(self.n_frames):
                ids.append(mid)
                idxs.append(fi)
                frames.append(hashlib.blake2b(
                    payload + fi.to_bytes(4, "little"), digest_size=32).digest())
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(idxs, pa.int32()),
            "frame_payload": pa.array(frames, pa.binary()),
        })
