"""TilingSpec — the pure planning product driving every tiler stage.

The engine analog of the reference's setup + warp-plan phases
(rio_cogeo/cogeo.py:189-298 + utils.py:88-147): everything the
distributed stages need is computed up-front on the driver from cheap
aggregate statistics, then broadcast (it is a small frozen dataclass
shipped in actor constructor args / task closures — never per batch).
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass, field, replace
from typing import Optional, Tuple

from rio_cogeo_ray import errors
from rio_cogeo_ray.functions import tms
from rio_cogeo_ray.functions.geocode import GeoSpec, GLOBAL_UNIFORM

from rio_cogeo_ray.stages.rasterize import CONV_KERNELS as CONV_RESAMPLINGS

#: Distributive kernels (partials pre-sum; 'mode' defers to the merge).
SUMMABLE_RESAMPLINGS = ("sum", "average", "nearest", "mode")
#: Interpolating kernels — separable integer-tap convolutions, imported
#: from stages/rasterize.py (the kernel implementations' own registry)
#: so the planner can never accept a kernel the pipeline lacks.
#: Full reference enum (cogeo.py:48-72), all ten implemented for
#: density grids: rms squares each child level's values, sums them
#: through the ordinary additive merge, and floor-sqrt-normalizes once
#: per level (rasterize.finalize_rms_tiles); 'sum' is the engine's own
#: tenth kernel (the natural density-grid aggregate).
RESAMPLINGS = SUMMABLE_RESAMPLINGS + ("rms",) + CONV_RESAMPLINGS
RIO_RESAMPLINGS = RESAMPLINGS

INVALID_POLICIES = ("mask", "drop")


@dataclass(frozen=True)
class TilingSpec:
    """Plan for one create run.

    - ``zoom``: base (max) zoom — the main-IFD analog.
    - ``min_zoom``: coarsest pyramid level (inclusive).
    - ``aligned_levels``: web-optimized alignment depth (utils.py:120-140).
    - ``tile_px``: G — per-tile density-grid resolution (blocksize analog;
      profiles default 512, web default 256 — profiles.py:8-151).
    - ``decimation_base``: overview decimation base (cogeo.py:196-203).
    - ``resampling``: density-grid downsample kernel (cogeo.py:48-60).
    - ``geocode``: spatial distribution spec for url-hash geocoding.
    - ``invalid_policy``: nodata analog — 'mask' counts geocode-invalid
      pages in the manifest; 'drop' silently discards (cogeo.py:276-279).
    """

    zoom: int
    min_zoom: int
    aligned_levels: int = 0
    tile_px: int = 256
    decimation_base: int = 2
    resampling: str = "sum"
    geocode: GeoSpec = field(default_factory=lambda: GLOBAL_UNIFORM)
    invalid_policy: str = "mask"
    #: inclusive (min_x, min_y, max_x, max_y) cover at ``zoom``; None = world.
    tile_cover: Optional[Tuple[int, int, int, int]] = None
    #: user-defined quad TMS (functions/tms.py:quad_tile keys — the
    #: reference's --tms custom.json axis, rio_cogeo/cli.py:214-218);
    #: None = built-in WebMercatorQuad. When set, tile assignment and
    #: per-tile pixel bounds use this grid over plain (lon, lat).
    tms: Optional[dict] = None
    #: per-overview grid override (GDAL_TIFF_OVR_BLOCKSIZE analog,
    #: rio_cogeo/cli.py:141-144): overview levels store this many cells
    #: per tile axis instead of ``tile_px``. The engine's storage block
    #: IS the TMS tile, so — unlike GDAL, where the flag only retilés
    #: bytes — this changes the overview grid RESOLUTION (documented
    #: divergence). None = uniform grid.
    overview_blocksize: Optional[int] = None

    def __post_init__(self):
        if self.decimation_base < 2:
            # cogeo.py:196-203: base must be >= 2
            raise errors.IncompatibleOptions(
                f"decimation_base must be >= 2, got {self.decimation_base}"
            )
        if not self.is_pow2_base and self.tile_cover is not None:
            # Non-power-of-two ladders are pseudo-zoom ordinals over the
            # WORLD grid (iterated ceil-div dims); an aligned tile cover
            # has no stable meaning across such levels.
            raise errors.IncompatibleOptions(
                "tile_cover requires a power-of-two decimation_base"
            )
        if self.aligned_levels and self.decimation_base != 2:
            # web-optimized alignment assumes power-of-two pyramids
            raise errors.IncompatibleOptions(
                "aligned_levels requires decimation_base=2 "
                "(web-optimized grids are power-of-two)"
            )
        if self.resampling not in RESAMPLINGS:
            raise errors.IncompatibleOptions(
                f"unknown resampling {self.resampling!r}; choose from {RESAMPLINGS}"
            )
        if self.invalid_policy not in INVALID_POLICIES:
            raise errors.IncompatibleOptions(
                f"invalid_policy must be one of {INVALID_POLICIES}"
            )
        if not (0 <= self.min_zoom <= self.zoom <= 29):
            raise errors.IncompatibleOptions(
                f"need 0 <= min_zoom <= zoom <= 29, got {self.min_zoom}..{self.zoom}"
            )
        if self.tile_px < 1 or self.tile_px & (self.tile_px - 1):
            raise errors.IncompatibleOptions("tile_px must be a power of two")
        if self.overview_blocksize is not None:
            ob = self.overview_blocksize
            if ob < 1 or ob & (ob - 1):
                raise errors.IncompatibleOptions(
                    "overview_blocksize must be a power of two"
                )
            if self.resampling not in ("sum", "nearest", "mode"):
                # average/rms/conv finalizers normalize by uniform
                # per-level footprints (base^(2·level), (Σw)², base²);
                # a mixed-grid ladder breaks that arithmetic — refuse
                raise errors.IncompatibleOptions(
                    "overview_blocksize supports sum/nearest/mode "
                    "resampling only"
                )
            if (self.decimation_base * self.tile_px) % ob or ob > (
                self.decimation_base * self.tile_px
            ):
                raise errors.IncompatibleOptions(
                    "overview_blocksize must evenly divide "
                    "decimation_base*tile_px"
                )
        if self.tms is not None:
            # key/shape validation shared with the CLI JSON loader
            tms.validate_tms_dict(self.tms)
            if not self.is_pow2_base:
                # the overview parent rule (x >> step, y >> step) is a
                # quad-split shift; non-pow2 pseudo-zoom ladders assume
                # the square mercator world grid
                raise errors.IncompatibleOptions(
                    "custom tms requires a power-of-two decimation_base"
                )
            if self.is_conv:
                # conv kernels need global pixel dims (level_dim), which
                # assume the square 2^z world — not a cols0×rows0 quad
                raise errors.IncompatibleOptions(
                    "custom tms supports non-interpolating resampling only "
                    "(sum/average/nearest/mode/rms)"
                )
            if self.aligned_levels:
                # web-optimized alignment derives covers in mercator
                raise errors.IncompatibleOptions(
                    "custom tms is incompatible with aligned_levels"
                )

    # ------------------------------------------------------------------
    @property
    def is_pow2_base(self) -> bool:
        return self.decimation_base & (self.decimation_base - 1) == 0

    @property
    def is_conv(self) -> bool:
        """True for interpolating (convolution) resampling kernels."""
        return self.resampling in CONV_RESAMPLINGS

    @property
    def is_rms(self) -> bool:
        """True for root-mean-square decimation (cogeo.py:57 slot)."""
        return self.resampling == "rms"

    @property
    def zoom_step(self) -> int:
        """Ladder z decrement per pyramid step: log2(base) for
        power-of-two bases (real TMS zooms); 1 for other bases (the z
        column is then a pseudo-zoom ORDINAL over iterated ceil-div
        world grids, cogeo.py:196-203 arbitrary-base ladder analog)."""
        return tms.ladder_step(self.decimation_base)

    @property
    def n_levels(self) -> int:
        """Number of overview levels below the base zoom."""
        return (self.zoom - self.min_zoom) // self.zoom_step

    def level_dim(self, j: int) -> int:
        """Global-pixel extent per axis of the (square) world grid at
        ladder level j: exact shifts for power-of-two bases, iterated
        ceil-div otherwise (the raster-dims rule of an overview chain)."""
        d = (1 << self.zoom) * self.tile_px
        if self.is_pow2_base:
            return d >> (j * self.zoom_step)
        for _ in range(j):
            d = -(-d // self.decimation_base)
        return d

    @property
    def decimations(self) -> list:
        """[base**j for j in 1..L] (cogeo.py:389)."""
        return tms.overview_decimations(self.n_levels, self.decimation_base)

    @property
    def zooms(self) -> list:
        """All pyramid zooms, base first (IFD order: main, then overviews)."""
        return list(range(self.zoom, self.min_zoom - 1, -self.zoom_step))

    def cover_size_px(self) -> Tuple[int, int]:
        """Cover extent in grid cells at base zoom (width, height)."""
        if self.tile_cover is None:
            n = 1 << self.zoom
            return n * self.tile_px, n * self.tile_px
        min_x, min_y, max_x, max_y = self.tile_cover
        return (max_x - min_x + 1) * self.tile_px, (max_y - min_y + 1) * self.tile_px


def plan(
    bounds_mercator: Optional[Tuple[float, float, float, float]] = None,
    zoom: Optional[int] = None,
    resolution: Optional[float] = None,
    zoom_level_strategy: str = "auto",
    aligned_levels: int = 0,
    overview_levels: Optional[int] = None,
    tile_px: int = 256,
    decimation_base: int = 2,
    resampling: str = "sum",
    geocode: GeoSpec = GLOBAL_UNIFORM,
    invalid_policy: str = "mask",
    tms_def: Optional[dict] = None,
    overview_blocksize: Optional[int] = None,
) -> TilingSpec:
    """Build a TilingSpec — the planning composite of get_web_optimized_params
    (utils.py:88-147), get_zooms (utils.py:48-85) and overview-level
    inference (cogeo.py:381-390).

    ``zoom`` wins over ``resolution``; with neither, bounds are required
    and zoom defaults so the cover is ~4x4 tiles (a sensible page-density
    default). ``overview_levels`` overrides the auto ladder depth.
    """
    if zoom is None and resolution is not None:
        zoom = tms.zoom_for_res(resolution, zoom_level_strategy=zoom_level_strategy)
    if zoom is None:
        raise errors.IncompatibleOptions("plan() needs zoom or resolution")

    cover = None
    if bounds_mercator is not None:
        p = tms.web_optimized_params(
            bounds_mercator,
            zoom_level=zoom,
            aligned_levels=aligned_levels,
        )
        cover = p.tile_cover

    # ladder depth: explicit, else smallest overview fits one tile
    # (get_maximum_overview_level semantics, cogeo.py:381-384)
    pow2 = decimation_base & (decimation_base - 1) == 0
    if overview_levels is None:
        if cover is not None:
            w_px = (cover[2] - cover[0] + 1) * tile_px
            h_px = (cover[3] - cover[1] + 1) * tile_px
            overview_levels = tms.get_maximum_overview_level(w_px, h_px, minsize=tile_px)
        elif pow2:
            overview_levels = zoom  # world cover: pyramid to z=0
        else:
            # iterated ceil-div until the world grid fits one tile
            d, overview_levels = (1 << zoom) * tile_px, 0
            while d > tile_px and overview_levels < zoom:
                d = -(-d // decimation_base)
                overview_levels += 1
    step = tms.ladder_step(decimation_base)
    min_zoom = max(0, zoom - overview_levels * step)
    # keep the ladder on whole steps
    min_zoom = zoom - ((zoom - min_zoom) // step) * step

    if cover is not None and (cover[2] - cover[0] < 1) and (cover[3] - cover[1] < 1):
        warnings.warn(
            "extent smaller than one tile — pyramid degenerates "
            "(IncompatibleBlockRasterSize analog)",
            errors.IncompatibleBlockRasterSize,
        )

    return TilingSpec(
        zoom=zoom,
        min_zoom=min_zoom,
        aligned_levels=aligned_levels,
        tile_px=tile_px,
        decimation_base=decimation_base,
        resampling=resampling,
        geocode=geocode,
        invalid_policy=invalid_policy,
        tile_cover=cover,
        tms=tms_def,
        overview_blocksize=overview_blocksize,
    )


def with_cover_from_bounds(spec: TilingSpec, bounds_mercator) -> TilingSpec:
    """Derive the aligned tile cover for a spec from measured data bounds."""
    p = tms.web_optimized_params(
        bounds_mercator, zoom_level=spec.zoom, aligned_levels=spec.aligned_levels
    )
    return replace(spec, tile_cover=p.tile_cover)
