"""Dependency-free mini image codec — the in-sandbox REAL decode path.

This container ships no PIL/cv2, so the multimodal stages
(stages/multimodal.py: ImageFeatures, ImageResize) would otherwise only
ever exercise their byte-fold stubs here. This module implements a
PIL-shaped subset — ``open(fp)`` → image with ``convert/resize/save``
and ``__array__`` — over three real formats with nothing but the
stdlib + numpy:

- PGM (P5) / PPM (P6): binary netpbm, 8-bit maxval.
- PNG: 8-bit depth, color types 0 (gray), 2 (RGB), 6 (RGBA),
  interlace 0; all five scanline filters (none/sub/up/average/paeth)
  on decode; filter-0 + one zlib IDAT on encode (always valid PNG).

Determinism contracts (documented because downstream features hash
them): ``convert("L")`` is the ITU-R 601-2 integer luma
``(299 R + 587 G + 114 B) // 1000`` (PIL's L formula, truncated);
``resize`` is nearest-neighbor with source index
``(i * in_dim) // out_dim`` — a decoder spec of THIS engine, not a
numeric replica of PIL's default bicubic.

Anything with an unknown magic raises ValueError, which the callers
translate into their per-row stub fallback — a mixed corpus never
crashes the pipeline (stages/multimodal.py contract).
"""

from __future__ import annotations

import io
import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


class MiniImage:
    """Minimal PIL.Image.Image stand-in over a uint8 numpy raster:
    (H, W) for mode L, (H, W, 3) RGB, (H, W, 4) RGBA."""

    def __init__(self, arr: np.ndarray):
        arr = np.asarray(arr, dtype=np.uint8)
        if arr.ndim == 2:
            self.mode = "L"
        elif arr.ndim == 3 and arr.shape[2] == 3:
            self.mode = "RGB"
        elif arr.ndim == 3 and arr.shape[2] == 4:
            self.mode = "RGBA"
        else:
            raise ValueError(f"unsupported raster shape {arr.shape}")
        self.arr = arr

    # -- PIL-shaped surface -------------------------------------------------
    @property
    def size(self):
        return (self.arr.shape[1], self.arr.shape[0])  # (W, H), PIL order

    def convert(self, mode: str) -> "MiniImage":
        if mode == self.mode:
            return self
        if mode == "L":
            if self.mode in ("RGB", "RGBA"):
                r = self.arr[..., 0].astype(np.uint32)
                g = self.arr[..., 1].astype(np.uint32)
                b = self.arr[..., 2].astype(np.uint32)
                return MiniImage(((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8))
        if mode == "RGB":
            if self.mode == "L":
                return MiniImage(np.repeat(self.arr[..., None], 3, axis=2))
            if self.mode == "RGBA":
                return MiniImage(self.arr[..., :3])
        raise ValueError(f"convert {self.mode} -> {mode} unsupported")

    def resize(self, size) -> "MiniImage":
        w, h = int(size[0]), int(size[1])
        if w < 1 or h < 1:
            raise ValueError("resize target must be >= 1x1")
        src_h, src_w = self.arr.shape[:2]
        yi = (np.arange(h, dtype=np.int64) * src_h) // h
        xi = (np.arange(w, dtype=np.int64) * src_w) // w
        return MiniImage(self.arr[yi][:, xi])

    def save(self, fp, format: str = "PNG") -> None:
        if (format or "PNG").upper() != "PNG":
            raise ValueError("MiniImage saves PNG only")
        fp.write(png_encode(self.arr))

    def __array__(self, dtype=None, copy=None):
        a = self.arr
        return a.astype(dtype) if dtype is not None else a


def open(fp) -> MiniImage:  # noqa: A001 - PIL-shaped name
    """PIL.Image.open stand-in: sniff magic, decode fully (no lazy)."""
    data = fp.read() if hasattr(fp, "read") else bytes(fp)
    if data[:8] == PNG_MAGIC:
        return MiniImage(png_decode(data))
    if data[:2] in (b"P5", b"P6"):
        return MiniImage(_pnm_decode(data))
    raise ValueError("unknown image magic")


# ---------------------------------------------------------------------------
# netpbm
# ---------------------------------------------------------------------------

def _pnm_decode(data: bytes) -> np.ndarray:
    """P5 (gray) / P6 (RGB) binary netpbm, maxval <= 255."""
    magic = data[:2]
    pos, fields = 2, []
    while len(fields) < 3:
        # skip whitespace + '#' comment lines between header tokens
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            pos = data.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit netpbm unsupported")
    ch = 1 if magic == b"P5" else 3
    raster = np.frombuffer(data, np.uint8, count=w * h * ch, offset=pos)
    return raster.reshape((h, w) if ch == 1 else (h, w, 3)).copy()


def pnm_encode(arr: np.ndarray) -> bytes:
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        magic, ch = b"P5", 1
    elif arr.ndim == 3 and arr.shape[2] == 3:
        magic, ch = b"P6", 3
    else:
        raise ValueError(f"unsupported raster shape {arr.shape}")
    h, w = arr.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + arr.tobytes()


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

def png_decode(data: bytes) -> np.ndarray:
    """8-bit PNG (gray / RGB / RGBA, non-interlaced) → uint8 raster."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + crc
    if ihdr is None or not idat:
        raise ValueError("truncated PNG")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError("only 8-bit non-interlaced PNG supported")
    ch = {0: 1, 2: 3, 6: 4}.get(color)
    if ch is None:
        raise ValueError(f"color type {color} unsupported")
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline size mismatch")
    raw = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    ftypes = raw[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):  # rows depend on the previous row: loop is inherent
        line = raw[y, 1:].astype(np.int64)
        ft = int(ftypes[y])
        prev = out[y - 1].astype(np.int64) if y else np.zeros(stride, np.int64)
        if ft == 0:
            rec = line
        elif ft == 2:  # up
            rec = (line + prev) & 0xFF
        elif ft in (1, 3, 4):  # sub / average / paeth scan left-to-right
            rec = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = rec[x - ch] if x >= ch else 0
                b = prev[x]
                if ft == 1:
                    p = a
                elif ft == 3:
                    p = (a + b) >> 1
                else:
                    c = prev[x - ch] if x >= ch else 0
                    pa_, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                    p = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
                rec[x] = (line[x] + p) & 0xFF
        else:
            raise ValueError(f"filter {ft} invalid")
        out[y] = rec.astype(np.uint8)
    return out.reshape((h, w) if ch == 1 else (h, w, ch)).copy()


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def png_encode(arr: np.ndarray) -> bytes:
    """uint8 raster → minimal valid PNG (filter 0, one IDAT)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        color, ch = 0, 1
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color, ch = 2, 3
    elif arr.ndim == 3 and arr.shape[2] == 4:
        color, ch = 6, 4
    else:
        raise ValueError(f"unsupported raster shape {arr.shape}")
    h, w = arr.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    lines = np.concatenate(
        [np.zeros((h, 1), np.uint8), arr.reshape(h, w * ch)], axis=1
    )
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(lines.tobytes(), 6))
        + _chunk(b"IEND", b"")
    )


def synth_real_images(n: int, size: int = 24, seed: int = 3) -> list:
    """n deterministic REAL payloads alternating PNG-gray / PNG-RGB /
    PPM — gradient+checker rasters so resize/luma have structure."""
    from rio_cogeo_ray.functions.hashing import splitmix64

    out = []
    for i in range(n):
        s = int(splitmix64(np.array([i + seed], np.uint64))[0] % np.uint64(251))
        yy, xx = np.mgrid[0:size, 0:size]
        base = ((xx * 11 + yy * 7 + s) % 256).astype(np.uint8)
        kind = i % 3
        if kind == 0:
            out.append(png_encode(base))
        elif kind == 1:
            rgb = np.stack([base, base[::-1], base.T], axis=2)
            out.append(png_encode(rgb))
        else:
            rgb = np.stack([base.T, base, (255 - base)], axis=2)
            out.append(pnm_encode(rgb))
    return out
