"""Multimodal columns — opaque binary payloads with typed metadata.

Image/audio/video payloads are ``binary`` columns + metadata columns
(media_type, width/height or sample_rate). The Ray-side plumbing —
schemas, small-batch actor pools, output layout — is real and tested.
The image path uses PIL when importable, else the dependency-free mini
codec (functions/imagecodec.py: real PNG/PPM/PGM decode with stdlib
zlib) — resolved ONCE per actor — so the real decode executes even in
this PIL-less container; payloads neither codec can decode fall back
per row to a deterministic byte-fold stub, so a mixed corpus runs
end-to-end in every world (audio/video decode remains stubbed: no
soundfile/av here).

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
    """Codec resolution, once per actor: PIL when importable, else the
    dependency-free mini codec (functions/imagecodec.py — real PNG/PPM/
    PGM decode via stdlib zlib), so the REAL decode path executes even
    in containers without PIL. Payloads neither can decode fall back
    per row to the byte-fold stub as before."""
    try:
        from PIL import Image  # type: ignore

        return Image
    except ImportError:  # no PIL here: the mini codec IS the real path
        from rio_cogeo_ray.functions import imagecodec

        return imagecodec


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


# ---------------------------------------------------------------------------
# Video: uniform temporal frame sampling (decode stubbed — no codec lib
# in this container; the Ray plumbing is real, the brief's contract)
# ---------------------------------------------------------------------------

VIDEO_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("payload", pa.binary()),
        ("n_frames", pa.int32()),
        ("fps", pa.int32()),
    ]
)


def synth_video(n: int, seed: int = 7, payload_bytes: int = 8192) -> pa.Table:
    """Deterministic fake video corpus: opaque binary blobs + the
    (n_frames, fps) metadata a real demuxer would read from the
    container header."""
    ids = np.arange(n, dtype=np.int64)
    h = splitmix64(ids.astype(np.uint64) + np.uint64(seed))
    blobs = []
    for i in range(n):
        s = np.random.RandomState(int(h[i] % np.uint64(2**31)))
        blobs.append(s.bytes(payload_bytes))
    n_frames = (8 + (h % np.uint64(240))).astype(np.int32)
    fps = np.where(h % np.uint64(2) == 0, 24, 30).astype(np.int32)
    return pa.Table.from_arrays(
        [pa.array(ids), pa.array(blobs, pa.binary()), pa.array(n_frames), pa.array(fps)],
        schema=VIDEO_SCHEMA,
    )


class VideoFrames:
    """Actor: sample ``max_frames`` temporally UNIFORM frames per video
    (the index rule ``idx_j = j·(n−1)//(k−1)`` — first and last frame
    always included, the standard clip-sampling recipe) and emit one
    row per sampled frame with its timestamp. DECODE IS STUBBED: a
    "frame" is the fixed-size byte window at the frame's nominal
    payload offset (a real path would hand the demuxed packet to a
    codec); everything around it — actor pool, per-row frame counts,
    vectorized multi-window gather over the Arrow binary buffer, the
    (media_id, frame_idx, ts_ms, frame) output layout — is the real
    distributed plumbing and is tested."""

    def __init__(self, max_frames: int = 4, frame_bytes: int = 256):
        self.k = max_frames
        self.frame = frame_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "media_id": pa.array([], pa.int64()),
                "frame_idx": pa.array([], pa.int32()),
                "ts_ms": pa.array([], pa.int64()),
                "frame": pa.array([], pa.binary()),
            }
        )
        if len(batch) == 0:
            return empty
        buf = batch["payload"].combine_chunks()
        off = np.frombuffer(buf.buffers()[1], dtype=np.int32)
        off = off[buf.offset : buf.offset + len(buf) + 1].astype(np.int64)
        dbuf = buf.buffers()[2]
        data = (
            np.frombuffer(dbuf, dtype=np.uint8)
            if dbuf is not None
            else np.zeros(0, dtype=np.uint8)
        )
        plen = off[1:] - off[:-1]
        nf = batch["n_frames"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        fps = batch["fps"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        k = np.minimum(self.k, np.maximum(nf, 1))
        # AudioFrames convention: payloads too short for one full window
        # emit no frames — a fixed-size gather past the payload end
        # would bleed the NEXT row's bytes (or crash on the last row)
        k = np.where(plen < self.frame, 0, k)
        row_idx = np.repeat(np.arange(len(batch), dtype=np.int64), k)
        total = int(k.sum())
        if total == 0:
            return empty
        excl = np.concatenate(([0], np.cumsum(k)[:-1]))
        j = np.arange(total, dtype=np.int64) - np.repeat(excl, k)
        nfr, kr = nf[row_idx], k[row_idx]
        # uniform temporal indices; k==1 degenerates to frame 0
        idx = np.where(kr > 1, (j * (nfr - 1)) // np.maximum(kr - 1, 1), 0)
        ts_ms = idx * 1000 // np.maximum(fps[row_idx], 1)
        span = plen[row_idx] - self.frame + 1  # >= 1 by the k=0 guard
        starts = off[:-1][row_idx] + (idx * self.frame) % span
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
                "frame_idx": pa.array(idx.astype(np.int32), pa.int32()),
                "ts_ms": pa.array(ts_ms, pa.int64()),
                "frame": frames,
            }
        )


def video_frames(ds, concurrency: int = 4, batch_size: int = DEFAULT_BATCH_SIZE):
    return ds.map_batches(
        VideoFrames, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# Perceptual-hash image near-duplicates
# ---------------------------------------------------------------------------


def image_phash64(feats: np.ndarray) -> np.ndarray:
    """(n, 64) image features → 64-bit perceptual fingerprint (aHash
    over bucket means): bit j = feature_j > row median. Bit-packed via
    ``np.packbits`` (no int64 overflow path); returned as int64 with
    the uint64 bit pattern, matching dedup.hamming64's convention."""
    med = np.median(feats.astype(np.float64), axis=1, keepdims=True)
    bits = np.ascontiguousarray(feats > med)
    packed = np.packbits(bits, axis=1, bitorder="little")
    return np.ascontiguousarray(packed).view(np.uint64).reshape(-1).view(np.int64).copy()


def image_phash_neardup(
    ds,
    max_hamming: int = 3,
    id_col: str = "media_id",
    concurrency=(1, 4),
    batch_size: int = DEFAULT_BATCH_SIZE,
    n_buckets: int = 64,
):
    """Near-duplicate image clusters by perceptual hash — the image
    dedup step of a multimodal training-data pipeline (decode →
    64-bucket features → 64-bit aHash → banded hamming search):

    1. ImageFeatures actor pool (real PIL decode when present, the
       deterministic byte-fold stub otherwise) at feature_dim=64.
    2. fingerprint = :func:`image_phash64` (pure map).
    3. 4 bands × 16 bits — pigeonhole: hamming ≤ 3 ⇒ at least one
       identical band, so banding loses no candidate under the
       default threshold. Band rows carry only (id, fp) — 16 bytes.
    4. bucketed star edges per LSH bucket, EXACT hamming verify
       against the bucket min (dedup.hamming64), keep ≤ max_hamming.
    5. connected components → (media_id, cluster). Only ids that
       touch a verified edge appear (singletons are implicitly their
       own cluster — same contract as embedding_neardup).

    Reference analog: none in rio-cogeo; pigeonhole banding follows
    stages/dedup.py: simhash_band_rows."""
    from rio_cogeo_ray.functions.hashing import hash_columns
    from rio_cogeo_ray.stages.dedup import connected_components, hamming64

    feats = ds.map_batches(
        ImageFeatures,
        fn_constructor_args=(64,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

    def _fp_bands(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if not n:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "fp": pa.array([], pa.int64()),
                    "band": pa.array([], pa.int64()),
                    "band_bits": pa.array([], pa.int64()),
                }
            )
        f = t["features"].combine_chunks()
        vals = f.flatten().to_numpy(zero_copy_only=False).reshape(n, -1)
        fp = image_phash64(vals)
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        band = np.tile(np.arange(4, dtype=np.int64), n)
        rep = np.repeat(np.arange(n), 4)
        bits = (fp.astype(np.uint64)[rep] >> (band.astype(np.uint64) * np.uint64(16))) & np.uint64(0xFFFF)
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, 4), pa.int64()),
                "fp": pa.array(fp[rep], pa.int64()),
                "band": pa.array(band, pa.int64()),
                "band_bits": pa.array(bits.astype(np.int64), pa.int64()),
            }
        )

    def _route(t: pa.Table) -> pa.Table:
        b = (hash_columns(t, ["band", "band_bits"]) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("__bucket", pa.array(b, pa.int64()))

    def _edges(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__bucket"])
        empty = pa.table(
            {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
        )
        if not g.num_rows:
            return empty
        g = g.sort_by(
            [("band", "ascending"), ("band_bits", "ascending"), (id_col, "ascending")]
        )
        b = g["band"].combine_chunks().to_numpy(zero_copy_only=False)
        h = g["band_bits"].combine_chunks().to_numpy(zero_copy_only=False)
        ids = g[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        fp = g["fp"].combine_chunks().to_numpy(zero_copy_only=False)
        new = np.concatenate(([True], (b[1:] != b[:-1]) | (h[1:] != h[:-1])))
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(b)))
        first_row = np.repeat(starts, lens)
        member = ~new
        if not member.any():
            return empty
        ham = hamming64(fp[member], fp[first_row[member]])
        keep = ham <= max_hamming
        return pa.table(
            {
                "src": pa.array(ids[member][keep], pa.int64()),
                "dst": pa.array(ids[first_row[member]][keep], pa.int64()),
            }
        )

    edges = (
        feats.map_batches(_fp_bands, batch_format="pyarrow")
        .map_batches(_route, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(_edges, batch_format="pyarrow")
    )
    return connected_components(edges).map_batches(
        lambda t: t.rename_columns([id_col, "cluster"]), batch_format="pyarrow"
    )


class ImageResize:
    """Actor: payload → payload image RESIZE (the thumbnailing /
    normalization stage of a multimodal training pipeline — distinct
    from :class:`ImageFeatures`, which consumes images into vectors;
    this stage PRESERVES the binary-image column for downstream
    decode).

    Real path (PIL, resolved once per actor): decode → RGB → resize to
    ``target_size`` → re-encode PNG; per-row decode failures fall back
    to the stub for that row. Stub path (no PIL in this container):
    deterministic byte resample — the payload is stride-sampled (or
    byte-repeated) to exactly ``target_bytes`` — keeping the actor
    plumbing, batch shapes and (id, payload, width, height) output
    schema real. Output width/height are the target dims (stub rows
    report them too: the schema contract is what downstream trusts)."""

    def __init__(self, target_size: Tuple[int, int] = (64, 64)):
        self.target = target_size
        self.target_bytes = target_size[0] * target_size[1]
        self.pil = _pil_module()

    def _resize_real(self, payload: bytes) -> Optional[bytes]:
        import io

        try:
            img = self.pil.open(io.BytesIO(payload)).convert("RGB")
            img = img.resize(self.target)
            out = io.BytesIO()
            img.save(out, format="PNG")
            return out.getvalue()
        except Exception:
            return None

    def _resize_stub(self, payload: bytes) -> bytes:
        n = self.target_bytes
        if not payload:
            return b"\x00" * n
        if len(payload) >= n:
            # stride-sample to exactly n bytes (deterministic)
            idx = (np.arange(n, dtype=np.int64) * len(payload)) // n
            return bytes(np.frombuffer(payload, dtype=np.uint8)[idx])
        reps = -(-n // len(payload))
        return (payload * reps)[:n]

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].combine_chunks()
        out_payloads = []
        for i in range(len(payloads)):
            p = payloads[i].as_py() or b""
            r = self._resize_real(p) if self.pil is not None else None
            out_payloads.append(r if r is not None else self._resize_stub(p))
        n = batch.num_rows
        w, h = self.target
        # the resize REPLACES payload (same column name — downstream
        # decode stages read batch["payload"], so the stage composes
        # with ImageFeatures / image_phash) and its typed size
        # metadata (int32, the MEDIA_SCHEMA contract)
        drop = [c for c in ("payload", "width", "height")
                if c in batch.column_names]
        out = batch.drop_columns(drop)
        return (
            out.append_column("payload", pa.array(out_payloads, pa.binary()))
            .append_column("width", pa.array(np.full(n, w, np.int32), pa.int32()))
            .append_column("height", pa.array(np.full(n, h, np.int32), pa.int32()))
        )


def image_resize(
    ds,
    target_size: Tuple[int, int] = (64, 64),
    concurrency: int = 4,
    batch_size: int = DEFAULT_BATCH_SIZE,
):
    """Actor-pool image resize over binary payloads — small batches by
    contract (large binary payloads × concurrency must fit the worker
    heap; the multimodal batch-size doctrine)."""
    return ds.map_batches(
        ImageResize,
        fn_constructor_kwargs={"target_size": target_size},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
