"""WebMercatorQuad tile-matrix-set math, from first principles (pure numpy).

Re-derives the tile-grid semantics the reference delegates to
morecantile/rasterio (rio_cogeo/utils.py:48-147, rio_cogeo/cogeo.py:381-389):

- ``cell_size(z)``      — resolution of the 256px tile matrix at zoom z
- ``tile(lon, lat, z)`` — point → (x, y) tile indices (utils.py:125,134)
- ``xy_bounds(z,x,y)``  — tile → mercator bbox (utils.py:126,135)
- ``zoom_for_res``      — resolution → zoom with auto/lower/upper strategy
                          (utils.py:74-78,111-115)
- ``get_maximum_overview_level`` — overview ladder depth (cogeo.py:381-384)
- ``web_optimized_params``       — aligned output grid (utils.py:88-147)

All functions are vectorized over numpy arrays and also accept scalars.
Everything is float64 / int64 with a fixed operation order so the Ray
pipeline, the single-node oracle and the DuckDB oracle SQL agree
bit-for-bit.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple, Union

import numpy as np

# WebMercatorQuad constants (EPSG:3857 on the WGS84 sphere).
EARTH_RADIUS = 6378137.0
ORIGIN_SHIFT = np.pi * EARTH_RADIUS  # 20037508.342789244
WORLD_SPAN = 2.0 * ORIGIN_SHIFT  # 40075016.68557849
TILE_PX = 256  # tileWidth/tileHeight of every WebMercatorQuad matrix
MAX_ZOOM = 30
# Max latitude where the square mercator world cuts off: atan(sinh(pi)).
MAX_LAT = 85.0511287798066

ArrayLike = Union[float, np.ndarray]


def cell_size(z: ArrayLike) -> ArrayLike:
    """Resolution (mercator meters per 'pixel') of the zoom-z matrix.

    cell_size(0) == 156543.03392804097 (the canonical 2*pi*R/256).
    """
    return WORLD_SPAN / (TILE_PX * np.power(2.0, z))


def tile_span(z: ArrayLike) -> ArrayLike:
    """Width/height in mercator meters of one tile at zoom z."""
    return WORLD_SPAN / np.power(2.0, z)


#: EARTH_RADIUS * pi / 180 as an exact literal — the same literal appears
#: in the oracle SQL templates (stages/assign.py MERCATOR_MX_SQL) so the
#: one-multiply lon path is bit-identical across engines.
DEG_TO_MERC = 111319.49079327358


def lonlat_to_mercator(lon: ArrayLike, lat: ArrayLike) -> Tuple[ArrayLike, ArrayLike]:
    """Project WGS84 lon/lat (degrees) to web-mercator meters.

    Exact op order (mirrored by MERCATOR_*_SQL, bit-for-bit):
    ``mx = lon * DEG_TO_MERC``;
    ``my = R * ln(tan(pi/4 + (lat * pi / 180) / 2))``.
    Latitudes are clamped to ±MAX_LAT first so the projection stays
    finite (fixture/geocode latitudes never exceed ±85, so the clamp is
    a no-op on real inputs and absent from the SQL).
    """
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    lat = np.clip(lat, -MAX_LAT, MAX_LAT)
    mx = lon * DEG_TO_MERC
    my = EARTH_RADIUS * np.log(np.tan(np.pi / 4.0 + (lat * np.pi / 180.0) / 2.0))
    return mx, my


def mercator_to_lonlat(mx: ArrayLike, my: ArrayLike) -> Tuple[ArrayLike, ArrayLike]:
    """Inverse of :func:`lonlat_to_mercator`."""
    mx = np.asarray(mx, dtype=np.float64)
    my = np.asarray(my, dtype=np.float64)
    lon = np.degrees(mx / EARTH_RADIUS)
    lat = np.degrees(2.0 * np.arctan(np.exp(my / EARTH_RADIUS)) - np.pi / 2.0)
    return lon, lat


def mercator_tile(mx: ArrayLike, my: ArrayLike, z: int) -> Tuple[np.ndarray, np.ndarray]:
    """Mercator point → tile indices at zoom z.

    Tie rule (pinned by tests): a point exactly on a tile's right/bottom
    boundary belongs to the NEXT tile (pure floor), except points on the
    world edge which clamp into [0, 2**z - 1]. This mirrors the reference's
    LR-edge handling (utils.py:134-137 uses tile+1 bounds for the
    lower-right corner rather than widening the tile function).
    """
    n = np.int64(1) << np.int64(z)
    span = tile_span(z)
    tx = np.floor((np.asarray(mx, dtype=np.float64) + ORIGIN_SHIFT) / span)
    ty = np.floor((ORIGIN_SHIFT - np.asarray(my, dtype=np.float64)) / span)
    tx = np.clip(tx, 0, float(n - 1)).astype(np.int64)
    ty = np.clip(ty, 0, float(n - 1)).astype(np.int64)
    return tx, ty


def tile(lon: ArrayLike, lat: ArrayLike, z: int) -> Tuple[np.ndarray, np.ndarray]:
    """lon/lat (degrees) → (x, y) tile indices at zoom z."""
    mx, my = lonlat_to_mercator(lon, lat)
    return mercator_tile(mx, my, z)


def xy_bounds(z: int, x: ArrayLike, y: ArrayLike) -> Tuple[ArrayLike, ArrayLike, ArrayLike, ArrayLike]:
    """Tile (z, x, y) → mercator bbox (west, south, east, north)."""
    span = tile_span(z)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    west = x * span - ORIGIN_SHIFT
    east = (x + 1.0) * span - ORIGIN_SHIFT
    north = ORIGIN_SHIFT - y * span
    south = ORIGIN_SHIFT - (y + 1.0) * span
    return west, south, east, north


def tile_centroid(z: int, x: ArrayLike, y: ArrayLike) -> Tuple[ArrayLike, ArrayLike]:
    """Mercator centroid of tile (z, x, y)."""
    span = tile_span(z)
    cx = (np.asarray(x, dtype=np.float64) + 0.5) * span - ORIGIN_SHIFT
    cy = ORIGIN_SHIFT - (np.asarray(y, dtype=np.float64) + 0.5) * span
    return cx, cy


def zoom_for_res(res: float, max_z: int = MAX_ZOOM, zoom_level_strategy: str = "auto") -> int:
    """Smallest zoom whose cell size is <= ``res`` (within 1e-8 relative
    tolerance), adjusted by strategy — semantics of morecantile's
    ``zoom_for_res`` as used by the reference (utils.py:74-78,111-115):

    - ``upper``: keep the finer (higher) bracketing zoom.
    - ``lower``: step one coarser.
    - ``auto``: pick whichever bracketing zoom's resolution ratio is
      closer to ``res`` (coarser wins ties the way the strict ``<``
      comparison falls).
    """
    z = 0
    matrix_res = cell_size(0)
    for z in range(0, max_z + 1):
        matrix_res = cell_size(z)
        if res > matrix_res or abs(res - matrix_res) / matrix_res <= 1e-8:
            break
    # morecantile applies the strategy ONLY when res is not an exact
    # matrix resolution (and an invalid strategy string passes through
    # silently on exact match) — mirror that (utils.py:74-78 delegate).
    if z > 0 and abs(res - matrix_res) / matrix_res > 1e-8:
        strategy = zoom_level_strategy.lower()
        if strategy == "lower":
            z = max(z - 1, 0)
        elif strategy == "upper":
            z = min(z, max_z)
        elif strategy == "auto":
            if (cell_size(max(z - 1, 0)) / res) < (res / matrix_res):
                z = max(z - 1, 0)
        else:
            raise ValueError(
                f"Invalid zoom_level_strategy: {zoom_level_strategy!r} "
                "(expected auto/lower/upper)"
            )
    return int(z)


def get_maximum_overview_level(width: int, height: int, minsize: int = 256) -> int:
    """Number of power-of-two decimations until max(width, height) fits in
    ``minsize`` — semantics of rasterio's helper used at cogeo.py:381-384.

    Pinned by reference tests: (512, 512, minsize=64) → 3 overviews
    [2, 4, 8]; (171, 171, 128) → 1 → [2]; (51, 51, 512) → 0 → [].
    """
    overview_level = 0
    overview_factor = 1
    while max(width // overview_factor, height // overview_factor) > minsize:
        overview_factor *= 2
        overview_level += 1
    return overview_level


def overview_decimations(levels: int, base: int = 2) -> list:
    """``[base**j for j in 1..levels]`` (cogeo.py:389)."""
    return [base**j for j in range(1, levels + 1)]


def get_zooms(
    bounds_mercator: Tuple[float, float, float, float],
    resolution: float,
    tilesize: int = 256,
    zoom_level_strategy: str = "auto",
) -> Tuple[int, int]:
    """Min/max zoom for a dataset with the given mercator bounds and
    resolution — semantics of utils.py:48-85.

    maxzoom from the resolution; minzoom from the resolution of the
    maximum theoretical overview level of the (width, height) implied by
    bounds / resolution.
    """
    w, s, e, n = bounds_mercator
    width = max(1, int(round((e - w) / resolution)))
    height = max(1, int(round((n - s) / resolution)))
    max_zoom = zoom_for_res(resolution, zoom_level_strategy=zoom_level_strategy)
    max_possible_overview_level = get_maximum_overview_level(width, height, minsize=tilesize)
    ovr_resolution = resolution * (2**max_possible_overview_level)
    min_zoom = zoom_for_res(ovr_resolution)
    return (min_zoom, max_zoom)


@dataclass(frozen=True)
class WebOptimizedParams:
    """Aligned output grid — the engine's analog of the VRT params dict
    returned by utils.py:88-147."""

    zoom: int  # max_zoom: the tile pyramid's base level
    base_zoom: int  # zoom - aligned_levels: alignment snap level
    origin_mx: float  # UL corner (mercator) of the aligned grid
    origin_my: float
    resolution: float  # cell_size(zoom)
    width: int  # grid size in cells; multiples of TILE_PX * 2**aligned_levels
    height: int
    # Tile cover of the aligned grid at ``zoom`` (inclusive ranges).
    tile_cover: Tuple[int, int, int, int]  # (min_x, min_y, max_x, max_y)


def web_optimized_params(
    bounds_mercator: Tuple[float, float, float, float],
    resolution: float = None,
    zoom_level_strategy: str = "auto",
    zoom_level: int = None,
    aligned_levels: int = None,
) -> WebOptimizedParams:
    """Compute the web-optimized aligned grid (utils.py:88-147):

    1. ``max_zoom`` from resolution (or explicit ``zoom_level``).
    2. ``base_zoom = max_zoom - aligned_levels``.
    3. New origin = UL corner of the tile containing (west, north) at
       base_zoom; extent to the LR corner of ``lr_tile + 1`` at base_zoom.
    4. width/height = rounded span / cell_size(max_zoom) — multiples of
       ``TILE_PX * 2**aligned_levels`` by construction.
    """
    w, s, e, n = bounds_mercator
    if zoom_level is not None:
        max_zoom = int(zoom_level)
    else:
        if resolution is None:
            raise ValueError("web_optimized_params needs resolution or zoom_level")
        max_zoom = zoom_for_res(resolution, zoom_level_strategy=zoom_level_strategy)

    aligned_levels = aligned_levels or 0
    base_zoom = max_zoom - aligned_levels
    if base_zoom < 0:
        raise ValueError(f"aligned_levels {aligned_levels} exceeds zoom {max_zoom}")

    ul_x, ul_y = mercator_tile(w, n, base_zoom)
    grid_w, _, _, grid_n = xy_bounds(base_zoom, ul_x, ul_y)

    res = float(cell_size(max_zoom))

    # LR corner of the cover = UL corner of tile (lr+1, lr+1) at base_zoom,
    # matching the reference's use of tile+1 bounds (utils.py:134-137).
    lr_x, lr_y = mercator_tile(e, s, base_zoom)
    grid_e, _, _, grid_s = xy_bounds(base_zoom, lr_x + 1, lr_y + 1)
    grid_e, grid_s = float(grid_e), float(grid_s)

    width = max(1, round((grid_e - grid_w) / res))
    height = max(1, round((grid_n - grid_s) / res))

    factor = 1 << (max_zoom - base_zoom)
    return WebOptimizedParams(
        zoom=max_zoom,
        base_zoom=base_zoom,
        origin_mx=float(grid_w),
        origin_my=float(grid_n),
        resolution=res,
        width=int(width),
        height=int(height),
        tile_cover=(
            int(ul_x) * factor,
            int(ul_y) * factor,
            (int(lr_x) + 1) * factor - 1,
            (int(lr_y) + 1) * factor - 1,
        ),
    )


# ---------------------------------------------------------------------------
# Tile-key packing — the shuffle key used by every groupby stage.
# ---------------------------------------------------------------------------

_KEY_Z_SHIFT = 58
_KEY_X_SHIFT = 29
_KEY_XY_MASK = (1 << 29) - 1

# SQL equivalent (int64-safe for z <= 29):
#   tile_key = z * 288230376151711744 + x * 536870912 + y
TILE_KEY_SQL = "({z} * 288230376151711744 + {x} * 536870912 + {y})"


def crs84_tile(lon: ArrayLike, lat: ArrayLike, z: int) -> Tuple[np.ndarray, np.ndarray]:
    """WorldCRS84Quad tile indices (the multi-TMS axis the reference
    exposes via its ``tms:`` parameter, rio_cogeo/cogeo.py:86,
    cli.py:214-218): plain-degree quad grid, TWO columns × one row at
    level 0 (OGC WorldCRS84Quad), cell = 180/2^z degrees.

    Same floor/tie/clamp rules as the mercator grid: right/bottom
    boundary belongs to the next tile, world edge clamps in. Exactly
    mirrored in SQL (pure arithmetic, no transcendentals at all)."""
    span = 180.0 / float(1 << z)
    nx = np.int64(2) << np.int64(z)
    ny = np.int64(1) << np.int64(z)
    tx = np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / span)
    ty = np.floor((90.0 - np.asarray(lat, dtype=np.float64)) / span)
    tx = np.clip(tx, 0, float(nx - 1)).astype(np.int64)
    ty = np.clip(ty, 0, float(ny - 1)).astype(np.int64)
    return tx, ty


def quad_tile(
    xc: ArrayLike,
    yc: ArrayLike,
    z: int,
    tms: dict,
) -> Tuple[np.ndarray, np.ndarray]:
    """USER-DEFINED quad tile matrix set — the reference's ``--tms
    custom.json`` axis (rio_cogeo/cli.py:214-218,273-276: any
    morecantile TMS JSON) generalized: a TMS here is a dict
    ``{origin_x, origin_y, span_x, span_y, cols0, rows0}`` describing a
    grid of ``cols0·2^z × rows0·2^z`` tiles over the rectangle
    ``[origin_x, origin_x+span_x] × [origin_y−span_y, origin_y]``
    (y-down from the top-left origin, the TMS convention both built-in
    grids follow). WebMercatorQuad ≡ ``{−O, +O, 2O, 2O, 1, 1}``;
    WorldCRS84Quad ≡ ``{−180, 90, 360, 180, 2, 1}`` — both built-ins
    are special cases, pinned by a pytest.

    Same floor/tie/clamp rules as the built-ins: right/bottom boundary
    belongs to the next tile, world edge clamps in. Pure arithmetic —
    mirrors into SQL literally."""
    nx = np.int64(int(tms["cols0"])) << np.int64(z)
    ny = np.int64(int(tms["rows0"])) << np.int64(z)
    sx = float(tms["span_x"]) / float(nx)
    sy = float(tms["span_y"]) / float(ny)
    tx = np.floor((np.asarray(xc, dtype=np.float64) - float(tms["origin_x"])) / sx)
    ty = np.floor((float(tms["origin_y"]) - np.asarray(yc, dtype=np.float64)) / sy)
    tx = np.clip(tx, 0, float(nx - 1)).astype(np.int64)
    ty = np.clip(ty, 0, float(ny - 1)).astype(np.int64)
    return tx, ty


def validate_tms_dict(tms: dict) -> dict:
    """Validate a quad-TMS definition dict (keys as in
    :func:`quad_tile`, all required, spans positive). Returns it."""
    required = {"origin_x", "origin_y", "span_x", "span_y", "cols0", "rows0"}
    missing = required - set(tms)
    if missing:
        raise ValueError(f"TMS JSON missing keys: {sorted(missing)}")
    if float(tms["span_x"]) <= 0 or float(tms["span_y"]) <= 0:
        raise ValueError("TMS spans must be positive")
    if int(tms["cols0"]) < 1 or int(tms["rows0"]) < 1:
        raise ValueError("TMS base grid must be at least 1×1")
    return tms


def load_tms_json(path: str) -> dict:
    """Load a user TMS definition from JSON (the CLI-facing hook)."""
    import json

    with open(path) as f:
        return validate_tms_dict(json.load(f))


def quad_tile_bounds(
    x: ArrayLike, y: ArrayLike, z: int, tms: dict
) -> Tuple[np.ndarray, np.ndarray, float, float]:
    """Per-tile (west, north, span_x, span_y) under a :func:`quad_tile`
    TMS at zoom ``z`` — the custom-grid analog of the mercator
    ``x·span − O`` bounds the density rasterizer uses. Same float op
    order as quad_tile so a point's tile floor and pixel floor agree to
    the clip rule."""
    nx = np.int64(int(tms["cols0"])) << np.int64(z)
    ny = np.int64(int(tms["rows0"])) << np.int64(z)
    sx = float(tms["span_x"]) / float(nx)
    sy = float(tms["span_y"]) / float(ny)
    west = np.asarray(x, dtype=np.float64) * sx + float(tms["origin_x"])
    north = float(tms["origin_y"]) - np.asarray(y, dtype=np.float64) * sy
    return west, north, sx, sy


def ladder_step(base: int) -> int:
    """Ladder z decrement per pyramid step for a decimation base:
    log2(base) for powers of two (real TMS zooms); 1 otherwise (pseudo-
    zoom ordinal ladders over iterated ceil-div grids). THE one source
    of this rule — spec/validate/rasterize/create all call it."""
    if base & (base - 1) == 0:
        return base.bit_length() - 1
    return 1


def pack_tile_key(z: ArrayLike, x: ArrayLike, y: ArrayLike) -> np.ndarray:
    """Pack (z, x, y) into one int64: ``z<<58 | x<<29 | y`` (z ≤ 29)."""
    z = np.asarray(z, dtype=np.int64)
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    return (z << _KEY_Z_SHIFT) | (x << _KEY_X_SHIFT) | y


def unpack_tile_key(key: ArrayLike) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Inverse of :func:`pack_tile_key`."""
    key = np.asarray(key, dtype=np.int64)
    z = key >> _KEY_Z_SHIFT
    x = (key >> _KEY_X_SHIFT) & _KEY_XY_MASK
    y = key & _KEY_XY_MASK
    return z, x, y


def parent_tile_key(key: ArrayLike, levels: int = 1) -> np.ndarray:
    """Hierarchical parent: (z, x, y) → (z-levels, x>>levels, y>>levels).

    The engine's H3/S2-style containment relation: parent cell id is
    derivable by pure bit math, so pyramid stages never re-project.
    """
    z, x, y = unpack_tile_key(key)
    return pack_tile_key(z - levels, x >> levels, y >> levels)


# ---------------------------------------------------------------------------
# Morton (Z-order) cell ids — S2-style space-filling-curve encoding.
# ---------------------------------------------------------------------------


def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread the low 29 bits of v so there is a 0 bit between each."""
    v = np.asarray(v, dtype=np.uint64) & np.uint64(0x1FFFFFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def cell_encode(lon: ArrayLike, lat: ArrayLike, level: int) -> np.ndarray:
    """S2-style hierarchical cell id: Morton-interleaved quadtree cell at
    ``level``, with the level packed in the low 5 bits.

    ``cell >> (5 + 2*(level - parent_level))`` with a level rewrite gives
    the parent cell — containment is bit math, like H3/S2. Ordering along
    the id is a Z-order space-filling curve, so ranges of ids are
    spatially local (good for partition pruning).
    """
    x, y = tile(lon, lat, level)
    morton = (_part1by1(x.astype(np.uint64)) << np.uint64(1)) | _part1by1(y.astype(np.uint64))
    return ((morton << np.uint64(5)) | np.uint64(level)).astype(np.int64)


def cell_parent(cell: ArrayLike, parent_level: int) -> np.ndarray:
    """Parent cell id at ``parent_level`` via pure bit math."""
    cell = np.asarray(cell, dtype=np.int64).astype(np.uint64)
    level = (cell & np.uint64(31)).astype(np.int64)
    morton = cell >> np.uint64(5)
    shift = (2 * (level - parent_level)).astype(np.uint64)
    return ((morton >> shift) << np.uint64(5) | np.uint64(parent_level)).astype(np.int64)


def cell_to_tile(cell: ArrayLike) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Cell id → (level, x, y)."""
    cell = np.asarray(cell, dtype=np.int64).astype(np.uint64)
    level = (cell & np.uint64(31)).astype(np.int64)
    morton = cell >> np.uint64(5)

    def _compact1by1(v):
        v = v & np.uint64(0x5555555555555555)
        v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
        v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
        v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
        v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
        return v

    x = _compact1by1(morton >> np.uint64(1)).astype(np.int64)
    y = _compact1by1(morton).astype(np.int64)
    return level, x, y


def tile_quadkey_int(x: "np.ndarray", y: "np.ndarray", z: int) -> "np.ndarray":
    """Bing-maps quadkeys for (x, y) tiles at zoom z, packed as base-10
    int64 (digit i = x-bit + 2·y-bit at level i, most significant
    first): the string key is ``str(qk).zfill(z)``. Decimal packing
    keeps the kernel integer-only and SQL-mirrorable with plain
    arithmetic + LPAD; z ≤ 18 fits int64 (10^18 < 2^63). The quadkey
    is the classic web-tile addressing scheme of the reference's TMS
    ecosystem (morecantile Tile ids; rio-cogeo's --tms axis,
    /root/reference/rio_cogeo/cogeo.py:86)."""
    if not 1 <= z <= 18:
        raise ValueError(f"quadkey zoom must be in [1, 18], got {z}")
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    qk = np.zeros(len(x), dtype=np.int64)
    for i in range(z):
        b = z - 1 - i
        d = ((x >> b) & 1) + 2 * ((y >> b) & 1)
        qk = qk * 10 + d
    return qk


def quadkey_to_tile(qk: str):
    """Inverse of :func:`tile_quadkey_int`'s string form: quadkey
    string → (x, y, z)."""
    x = y = 0
    for ch in qk:
        d = ord(ch) - 48
        if not 0 <= d <= 3:
            raise ValueError(f"invalid quadkey digit {ch!r}")
        x = (x << 1) | (d & 1)
        y = (y << 1) | (d >> 1)
    return x, y, len(qk)
