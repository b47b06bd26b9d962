"""Multimodal columns — opaque binary payloads with typed metadata.

Image/audio/video payloads are ``binary`` columns + metadata columns
(media_type, width/height or sample_rate). The Ray-side plumbing —
schemas, small-batch actor pools, output layout — is real and tested.
The image path uses PIL when importable (decode → resize → bucket-mean
features, resolved once per actor) and falls back to a deterministic
byte-fold stub per undecodable payload or when the library is absent
(this container ships no PIL/cv2/soundfile), so pipelines run
end-to-end in both worlds.

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


def _pil_module():
    try:
        from PIL import Image  # type: ignore

        return Image
    except ImportError:  # this container ships no PIL
        return None


class ImageFeatures:
    """Actor: decode + feature-extract images per batch.

    Real path (PIL, when importable — resolved ONCE in ``__init__``, not
    per batch): decode → grayscale → resize to ``target_size`` → fold
    the pixel raster into ``feature_dim`` bucket means. Per-payload
    decode failures (corrupt/unsupported bytes) fall back to the
    deterministic byte-fold stub for THAT row, so a mixed corpus never
    crashes the pipeline. Stub path (no PIL): the same byte-fold over
    raw payload bytes for every row — preserving the exact Ray plumbing
    (actor init, batch shapes, output schema)."""

    def __init__(self, feature_dim: int = 16, target_size: Tuple[int, int] = (32, 32)):
        self.dim = feature_dim
        self.target = target_size
        self.pil = _pil_module()  # once per actor, never per batch

    def _decode_features(self, payload: bytes) -> Optional[np.ndarray]:
        """Real codec path: PIL decode → L → resize → dim bucket means."""
        import io

        try:
            img = self.pil.open(io.BytesIO(payload)).convert("L")
            img = img.resize(self.target)
        except Exception:  # undecodable payload → caller falls back
            return None
        px = np.asarray(img, dtype=np.float32).reshape(-1)
        # fold the raster into dim equal buckets (mean per bucket)
        pad = (-len(px)) % self.dim
        if pad:
            px = np.concatenate([px, np.zeros(pad, dtype=np.float32)])
        return px.reshape(self.dim, -1).mean(axis=1)

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
        if self.pil is None:
            feats = self._fake_features(payloads)
        else:
            # real decode per payload (the codec IS the per-item work);
            # the byte-fold stub is computed lazily, once, only when
            # some row fails to decode — a clean corpus never pays it
            feats = np.zeros((len(payloads), self.dim), dtype=np.float32)
            stub = None
            for i in range(len(payloads)):
                real = self._decode_features(payloads[i].as_py())
                if real is not None:
                    feats[i] = real
                else:
                    if stub is None:
                        stub = self._fake_features(payloads)
                    feats[i] = stub[i]
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
    Emits one row per sampled frame (flat_map-shaped explode), fully
    vectorized over the Arrow binary buffers — no Python row loop."""

    def __init__(self, frame_bytes: int = 512, stride: int = 2048, max_frames: int = 8):
        self.frame = frame_bytes
        self.stride = stride
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "media_id": pa.array([], pa.int64()),
                    "frame_idx": pa.array([], pa.int32()),
                    "frame": pa.array([], pa.binary()),
                }
            )
        buf = batch["payload"].combine_chunks()
        off = np.frombuffer(buf.buffers()[1], dtype=np.int32)
        off = off[buf.offset : buf.offset + len(buf) + 1].astype(np.int64)
        dbuf = buf.buffers()[2]
        data = (
            np.frombuffer(dbuf, dtype=np.uint8)
            if dbuf is not None
            else np.zeros(0, dtype=np.uint8)
        )
        lens = off[1:] - off[:-1]
        nframes = np.clip(
            (lens - self.frame) // self.stride + 1, 0, self.max_frames
        ).astype(np.int64)
        row_idx = np.repeat(np.arange(len(buf), dtype=np.int64), nframes)
        total = int(nframes.sum())
        # per-row frame index: global arange minus each row's running start
        excl = np.concatenate(([0], np.cumsum(nframes)[:-1]))
        fi = np.arange(total, dtype=np.int64) - np.repeat(excl, nframes)
        starts = off[:-1][row_idx] + fi * self.stride
        # gather all frame windows in one fancy-index (total × frame bytes)
        windows = data[starts[:, None] + np.arange(self.frame, dtype=np.int64)[None, :]]
        frame_off = pa.array(
            (np.arange(total + 1, dtype=np.int64) * self.frame).astype(np.int32),
            pa.int32(),
        )
        frames = pa.Array.from_buffers(
            pa.binary(), total,
            [None, frame_off.buffers()[1], pa.py_buffer(windows.tobytes())],
        )
        ids = batch["media_id"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "media_id": pa.array(ids[row_idx], pa.int64()),
                "frame_idx": pa.array(fi.astype(np.int32), pa.int32()),
                "frame": frames,
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
