"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool map_batches stages.

The decode libraries (PIL/torchaudio/ffmpeg) are NOT present in this
environment, so the decode kernels are STUBS behind ``decoder="fake"``
(deterministic hash-derived features, fully tested) or ``decoder="real"``
(raises NotImplementedError at the exact integration point).  Everything
Ray-side — schema, batch sizing, actor pool shape, output layout — is real:
swap ``_fake_*`` for a PIL/ffmpeg call and the pipeline is production.

Batch-size note: media rows are wide (MBs of binary per row), so these
stages default to small ``batch_size`` and ``batch_format="pyarrow"``
(binary columns stay zero-copy until the decode touches them) — the same
sizing rule as the crawl's html extract stage (SURVEY.md §7 hard part f).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
from ray.data import Dataset

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.binary()),  # opaque encoded bytes
        ("mime", pa.string()),
        ("width", pa.int32()),  # -1 when unknown/not applicable
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def _digest_floats(payload: bytes, n: int, salt: bytes = b"") -> np.ndarray:
    """Deterministic pseudo-features from payload bytes (the fake decode)."""
    out = np.empty(n, dtype=np.float32)
    i = 0
    counter = 0
    while i < n:
        d = hashlib.sha256(salt + payload + counter.to_bytes(4, "little")).digest()
        chunk = np.frombuffer(d, dtype=np.uint8).astype(np.float32) / 255.0
        take = min(n - i, len(chunk))
        out[i : i + take] = chunk[:take]
        i += take
        counter += 1
    return out


class ImageFeatures:
    """Actor-pool stage: decode → resize → feature vector per image.

    ``__init__`` is the once-per-actor model/library load point."""

    def __init__(self, decoder: str = "fake", feat_dim: int = 32):
        self.decoder = decoder
        self.feat_dim = feat_dim
        if decoder == "real":
            raise NotImplementedError(
                "image decode requires PIL/opencv — not available in this "
                "environment; plug the real decoder here"
            )

    def __call__(self, t: pa.Table) -> pa.Table:
        feats = [
            _digest_floats(p or b"", self.feat_dim, b"img")
            for p in t["payload"].to_pylist()
        ]
        return pa.Table.from_arrays(
            [
                t["media_id"].combine_chunks(),
                pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
                pa.array(
                    [float(np.round(f.mean(), 6)) for f in feats], pa.float32()
                ),
            ],
            names=["media_id", "features", "feat_mean"],
        )


class AudioFrameSampler:
    """Actor-pool stage: sample n fixed-position 'frames' per audio/video
    payload (the frame-sample plumbing; the real stage would seek+decode)."""

    def __init__(self, decoder: str = "fake", n_frames: int = 4, frame_dim: int = 16):
        self.n_frames = n_frames
        self.frame_dim = frame_dim
        if decoder == "real":
            raise NotImplementedError("audio/video decode requires ffmpeg — stubbed")

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, frame_idx, frames = [], [], []
        for mid, p in zip(t["media_id"].to_pylist(), t["payload"].to_pylist()):
            for fi in range(self.n_frames):
                ids.append(mid)
                frame_idx.append(fi)
                frames.append(
                    _digest_floats(p or b"", self.frame_dim, b"frm%d" % fi).tolist()
                )
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(frame_idx, pa.int32()),
                pa.array(frames, pa.list_(pa.float32())),
            ],
            names=["media_id", "frame_idx", "frame_features"],
        )


def image_features(
    ds: Dataset, decoder: str = "fake", concurrency: int = 4, batch_size: int = 64
) -> Dataset:
    return ds.map_batches(
        ImageFeatures,
        fn_constructor_kwargs={"decoder": decoder},
        batch_format="pyarrow",
        batch_size=batch_size,  # small: media rows are wide
        concurrency=concurrency,
        num_cpus=1,
    )


def sample_frames(
    ds: Dataset, decoder: str = "fake", concurrency: int = 4, batch_size: int = 32
) -> Dataset:
    return ds.map_batches(
        AudioFrameSampler,
        fn_constructor_kwargs={"decoder": decoder},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def synthetic_media_table(n: int = 64, seed: int = 5) -> pa.Table:
    """Deterministic fake media corpus for tests/demo."""
    import random

    rng = random.Random(seed)
    kinds = ["image", "audio", "video"]
    rows = {k.name: [] for k in MEDIA_SCHEMA}
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.randrange(256) for _ in range(rng.randrange(64, 256)))
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append({"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind])
        rows["width"].append(64 if kind == "image" else -1)
        rows["height"].append(64 if kind == "image" else -1)
        rows["duration_ms"].append(-1 if kind == "image" else 1000 + i)
    return pa.Table.from_arrays(
        [pa.array(rows[f.name], f.type) for f in MEDIA_SCHEMA], schema=MEDIA_SCHEMA
    )
