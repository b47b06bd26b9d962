"""Deterministic geocoding — the engine's analog of georeferencing.

The reference georeferences pixels with a CRS + affine transform
(rio_cogeo/cogeo.py:261-295); here pages are geocoded to lon/lat by a
deterministic pure function of their identity, so the distributed run,
the single-node oracle, and the DuckDB oracle SQL agree bit-for-bit.

Two flavors:

- :func:`geocode_id` — integer-id based, expressed with exact int64 +
  float64 arithmetic that is reproducible in ANSI SQL (see
  ``GEOCODE_SQL``). Used by the driver-checked queries over the
  ``documents`` table.
- :func:`geocode_url` — FNV-1a(url) based, mapped into a per-scenario
  spatial distribution (:class:`GeoSpec`). Used by the pages fixtures.
  Fully vectorized over Arrow string arrays (no per-row Python).

Pages whose hash falls in the "invalid" bucket get null lon/lat — the
nodata/masking analog (cogeo.py:276-279): they are excluded from density
grids but counted in the manifest.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa

# Knuth / xxhash multiplicative constants (public domain folklore values).
_MULT_A = 2654435761  # 2**32 * golden ratio conjugate
_MULT_B = 2246822519  # xxhash PRIME32_2
_MOD32 = 4294967296  # 2**32

#: ~1 in INVALID_MOD ids fail geocoding (null lon/lat) — nodata analog.
INVALID_MOD = 97

# SQL templates reproducing geocode_id EXACTLY (same op order, int64-safe
# for ids < 2**21; documents doc_ids are far below that).
GEOCODE_LON_SQL = "((({id} * 2654435761) % 4294967296) / 4294967296.0 * 360.0 - 180.0)"
GEOCODE_LAT_SQL = "(((({id} + 1) * 2246822519) % 4294967296) / 4294967296.0 * 170.0 - 85.0)"
GEOCODE_VALID_SQL = "((({id} * 2654435761) % 4294967296) % 97 <> 0)"


def geocode_id(ids: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Integer id → (lon, lat, valid).

    lon uniform in [-180, 180), lat uniform in [-85, 85) (inside the
    web-mercator cutoff), ~1/97 invalid. Exact int64 arithmetic followed
    by one division by 2**32 (exact) and one multiply+subtract — the same
    IEEE-754 op sequence as ``GEOCODE_*_SQL``.
    """
    ids = np.asarray(ids, dtype=np.int64)
    h1 = (ids * _MULT_A) % _MOD32
    h2 = ((ids + 1) * _MULT_B) % _MOD32
    lon = h1.astype(np.float64) / _MOD32 * 360.0 - 180.0
    lat = h2.astype(np.float64) / _MOD32 * 170.0 - 85.0
    valid = (h1 % INVALID_MOD) != 0
    return lon, lat, valid


# ---------------------------------------------------------------------------
# Vectorized FNV-1a over Arrow string arrays.
# ---------------------------------------------------------------------------

_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)


def fnv1a64(strings: pa.Array) -> np.ndarray:
    """FNV-1a 64-bit hash of each utf-8 string, vectorized.

    Reads the Arrow values/offsets buffers zero-copy and iterates over
    CHARACTER POSITIONS (bounded, ~tens) instead of rows, so hashing n
    rows costs O(max_len) numpy passes, not n Python iterations.
    """
    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    arr = strings
    if pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.string())
    # values buffer + int32 offsets, respecting the array's slice offset.
    buf_offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32)
    off = buf_offsets[arr.offset : arr.offset + len(arr) + 1].astype(np.int64)
    values = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    starts, ends = off[:-1], off[1:]
    lengths = ends - starts
    h = np.full(len(arr), _FNV_OFFSET, dtype=np.uint64)
    max_len = int(lengths.max()) if len(lengths) else 0
    idx = starts.copy()
    with np.errstate(over="ignore"):
        for j in range(max_len):
            mask = lengths > j
            b = values[idx[mask] + j].astype(np.uint64)
            h[mask] = (h[mask] ^ b) * _FNV_PRIME
    return h


@dataclass(frozen=True)
class GeoSpec:
    """Per-scenario spatial distribution for url-hash geocoding.

    A mixture of uniform lon/lat boxes with integer weights; the url hash
    deterministically picks the box and the position inside it. Mirrors
    the reference's fixture corpus where each GeoTIFF pins a different
    spatial situation (FIXTURES.md scenario table).
    """

    #: (west, south, east, north, weight) — lat in degrees within ±85.
    boxes: Sequence[Tuple[float, float, float, float, int]] = field(
        default_factory=lambda: [(-180.0, -85.0, 180.0, 85.0, 1)]
    )
    #: fraction (per 2**16) of pages that fail geocoding; 0 disables.
    invalid_per_65536: int = 0


GLOBAL_UNIFORM = GeoSpec()


def geocode_url(
    urls: pa.Array, spec: GeoSpec = GLOBAL_UNIFORM
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """url → (lon, lat, valid) under ``spec``. Pure function of the url
    bytes: any engine stage and the oracle compute identical results.
    """
    from rio_cogeo_ray.functions.hashing import splitmix64

    h = fnv1a64(urls)
    # Split the 64-bit hash into independent fields. u_inv comes from a
    # SECOND mix of h (not a bit range of h) so geocode validity is
    # statistically independent of box pick and longitude — overlapping
    # bit ranges would spatially bias which pages are invalid.
    u_box = (h >> np.uint64(48)).astype(np.int64)  # 16 bits: box pick
    u_lon = ((h >> np.uint64(24)) & np.uint64(0xFFFFFF)).astype(np.float64) / float(1 << 24)
    u_lat = (h & np.uint64(0xFFFFFF)).astype(np.float64) / float(1 << 24)
    u_inv = (splitmix64(h) & np.uint64(0xFFFF)).astype(np.int64)  # 16 bits

    weights = np.array([b[4] for b in spec.boxes], dtype=np.float64)
    cum = np.cumsum(weights) / weights.sum()
    thresholds = np.floor(cum * 65536.0).astype(np.int64)
    box_idx = np.searchsorted(thresholds, u_box % 65536, side="right")
    box_idx = np.clip(box_idx, 0, len(spec.boxes) - 1)

    boxes = np.array([b[:4] for b in spec.boxes], dtype=np.float64)
    west, south, east, north = (boxes[box_idx, i] for i in range(4))
    lon = west + u_lon * (east - west)
    lat = south + u_lat * (north - south)
    valid = np.ones(len(lon), dtype=bool)
    if spec.invalid_per_65536:
        valid = u_inv >= spec.invalid_per_65536
    return lon, lat, valid


def url_doc_id(urls: pa.Array) -> Optional[np.ndarray]:
    """Parse the trailing integer id out of canonical fixture urls
    (``https://{host}/p/{id}``); returns None if any url doesn't match."""
    import pyarrow.compute as pc

    ext = pc.extract_regex(urls, r"/p/(?P<id>\d+)$")
    if ext.null_count > 0:
        return None
    return pc.struct_field(ext, "id").cast(pa.int64()).to_numpy(zero_copy_only=False)
