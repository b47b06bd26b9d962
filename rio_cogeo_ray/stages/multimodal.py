"""Multimodal columns — opaque binary payloads with typed metadata.

Image/audio/video payloads are ``binary`` columns + metadata columns
(media_type, width/height or sample_rate). The Ray-side plumbing —
schemas, small-batch actor pools, output layout — is real and tested;
the actual codec calls are STUBBED behind ``try: import`` because this
container ships no PIL/cv2/soundfile (decode falls back to a
deterministic fake so pipelines stay testable end-to-end; swap the stub
for the real library call in production).

Batch-size discipline: payloads are wide — callers should use small
``batch_size`` (the default 256 here vs 8192 for text stages) so
batch × concurrency fits worker heaps, and keep these stages in
``batch_format="pyarrow"`` (binary round-trips pandas badly).

Pool-sizing discipline: actor pools RESERVE their CPUs for the whole
pipeline lifetime. When chaining actor-pool stages (e.g. feature
extraction → CosineTopK) the sum of concurrencies must stay below the
cluster's CPU count or downstream task stages (the top-k groupby sort)
starve and the pipeline stalls — size each pool to
``cluster_cpus // (n_actor_stages + 1)`` or lower.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pyarrow as pa

from rio_cogeo_ray.functions.hashing import splitmix64

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # "image/png", "audio/wav", ...
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),
    ]
)

DEFAULT_BATCH_SIZE = 256


def synth_media(n: int, seed: int = 42, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media corpus (binary blobs + metadata)."""
    ids = np.arange(n, dtype=np.int64)
    h = splitmix64(ids.astype(np.uint64) + np.uint64(seed))
    kinds = np.where(h % np.uint64(3) == 0, "audio/wav", "image/png")
    rng_bytes = []
    for i in range(n):
        s = np.random.RandomState(int(h[i] % np.uint64(2**31)))
        rng_bytes.append(s.bytes(payload_bytes))
    w = (64 + (h % np.uint64(448))).astype(np.int32)
    hgt = (64 + ((h >> np.uint64(13)) % np.uint64(448))).astype(np.int32)
    sr = np.where(kinds == "audio/wav", 16000, 0).astype(np.int32)
    return pa.Table.from_arrays(
        [
            pa.array(ids),
            pa.array(kinds.tolist(), pa.string()),
            pa.array(rng_bytes, pa.binary()),
            pa.array(w),
            pa.array(hgt),
            pa.array(sr),
        ],
        schema=MEDIA_SCHEMA,
    )


def _try_real_image_decode(payload: bytes) -> Optional[np.ndarray]:
    try:  # pragma: no cover - PIL absent in this container
        from PIL import Image  # type: ignore
        import io

        return np.asarray(Image.open(io.BytesIO(payload)))
    except ImportError:
        return None


class ImageFeatures:
    """Actor: decode + feature-extract images per batch.

    Real path (PIL, when installed): decode → resize → channel stats.
    Stub path: a deterministic fake 'decode' hashing the payload into a
    fixed-length feature vector, preserving the exact Ray plumbing
    (actor init, batch shapes, output schema)."""

    def __init__(self, feature_dim: int = 16, target_size: Tuple[int, int] = (32, 32)):
        self.dim = feature_dim
        self.target = target_size

    def _fake_features(self, payloads: pa.Array) -> np.ndarray:
        buf = payloads.combine_chunks() if isinstance(payloads, pa.ChunkedArray) else payloads
        off = np.frombuffer(buf.buffers()[1], dtype=np.int32)
        off = off[buf.offset : buf.offset + len(buf) + 1].astype(np.int64)
        data = np.frombuffer(buf.buffers()[2], dtype=np.uint8)
        feats = np.zeros((len(buf), self.dim), dtype=np.float32)
        # deterministic: fold payload bytes into dim buckets
        for j in range(self.dim):
            sl = data[j::self.dim].astype(np.int64)
            csum = np.concatenate(([0], np.cumsum(sl)))
            idx0 = np.minimum((off[:-1] + j) // self.dim, len(sl))
            idx1 = np.minimum((off[1:] + j) // self.dim, len(sl))
            feats[:, j] = (csum[idx1] - csum[idx0]).astype(np.float32)
        norms = np.maximum((off[1:] - off[:-1]).astype(np.float32), 1.0)
        return feats / norms[:, None]

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].combine_chunks()
        first = payloads[0].as_py() if len(batch) else b""
        real = _try_real_image_decode(first)
        if real is not None:  # pragma: no cover - real codec path
            raise NotImplementedError(
                "real image decode available but feature kernel is stubbed; "
                "plug PIL resize + stats here"
            )
        feats = self._fake_features(payloads)
        out = batch.drop_columns(["payload"])  # features replace payloads
        return out.append_column(
            "features",
            pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1), pa.float32()), self.dim
            ),
        )


class AudioFrames:
    """Actor: frame-sample audio payloads (stub: fixed-stride byte
    windows standing in for PCM frames; real path would use soundfile).
    Emits one row per sampled frame (flat_map-shaped explode)."""

    def __init__(self, frame_bytes: int = 512, stride: int = 2048, max_frames: int = 8):
        self.frame = frame_bytes
        self.stride = stride
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, idxs = [], [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            for fi in range(min(self.max_frames, max(0, (len(payload) - self.frame) // self.stride + 1))):
                start = fi * self.stride
                ids.append(mid)
                idxs.append(fi)
                frames.append(payload[start : start + self.frame])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


def image_features(ds, concurrency: int = 4, batch_size: int = DEFAULT_BATCH_SIZE):
    """Attach the image feature actor pool (small batches: wide rows)."""
    return ds.map_batches(
        ImageFeatures, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )


def audio_frames(ds, concurrency: int = 4, batch_size: int = DEFAULT_BATCH_SIZE):
    return ds.map_batches(
        AudioFrames, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )
