"""``info`` — aggregate metadata of a tile-pyramid output.

The engine analog of cog_info (rio_cogeo/cogeo.py:730-853) and its
pydantic models (rio_cogeo/models.py:18-85): dataclasses with
dict-style access (models.py:10-15) describing the output's profile,
georeferencing, pyramid (IFD list), and tags, serializable to JSON for
the CLI (scripts/cli.py:360-480).
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow.parquet as pq

from rio_cogeo_ray.functions import tms
from rio_cogeo_ray.pipelines.validate import validate as _validate
from rio_cogeo_ray.state import manifest as mani


class _DictAccess:
    """dict-style access mirror of rio_cogeo/models.py:10-15."""

    def __getitem__(self, item):
        return getattr(self, item)


@dataclass
class IFD(_DictAccess):
    """One pyramid level (models.py:18-27 analog)."""

    Level: int
    Zoom: int
    Decimation: int
    Tiles: int
    Pages: int
    Cells: int
    Width: int  # extent in grid pixels at this level
    Height: int


@dataclass
class Geo(_DictAccess):
    """Georeferencing (models.py:30-43 analog)."""

    CRS: str
    BoundsWGS84: Tuple[float, float, float, float]
    BoundsMercator: Tuple[float, float, float, float]
    Center: Tuple[float, float]
    Resolution: float
    MinZoom: int
    MaxZoom: int


@dataclass
class Profile(_DictAccess):
    """Creation profile (models.py:46-66 analog)."""

    TilePx: int
    Resampling: str
    DecimationBase: int
    AlignedLevels: int
    InvalidPolicy: str
    Source: str
    WeightColumn: Optional[str]


@dataclass
class Band(_DictAccess):
    """One grid channel's forwarded metadata — the reference's band
    description + scale/offset block (models.py:46-66 band fields;
    forwarding cogeo.py:395-437, pinned by tests/test_cogeo.py:472-488)."""

    Name: str
    Tags: Dict[str, str] = field(default_factory=dict)
    Scale: float = 1.0
    Offset: float = 0.0


@dataclass
class Info(_DictAccess):
    """Top-level info model (models.py:69-85 analog)."""

    Path: str
    Engine: str
    Valid: bool
    Errors: List[str]
    Warnings: List[str]
    Profile: Profile
    GEO: Geo
    IFDs: List[IFD]
    Tags: Dict[str, str] = field(default_factory=dict)
    Bands: List[Band] = field(default_factory=list)
    Colormap: Dict[str, str] = field(default_factory=dict)
    TotalPages: int = 0
    InvalidPages: int = 0

    def to_json(self, indent: int = 2) -> str:
        return json.dumps(asdict(self), indent=indent)


def info(out_dir: str, run_validate: bool = True) -> Info:
    """Build the Info model from manifest + tile index (cog_info runs
    cog_validate first, cogeo.py:739-741 — mirrored here)."""
    m = mani.load_manifest(out_dir)
    spec = m.spec
    base_z = int(spec["zoom"])
    G = int(spec["tile_px"])

    ok, errs, warns = (True, [], [])
    if run_validate:
        ok, errs, warns = _validate(out_dir, strict=False, spot_check=False)

    # observed mercator bounds from the base-level tile extent
    idx_path = os.path.join(mani.manifest_dir(out_dir), "tiles_index")
    cover = spec.get("tile_cover")
    if cover:
        min_x, min_y, max_x, max_y = cover
    else:
        idx = pq.read_table(idx_path, columns=["z", "x", "y"])
        z = idx["z"].to_numpy(zero_copy_only=False)
        sel = z == base_z
        xs = idx["x"].to_numpy(zero_copy_only=False)[sel]
        ys = idx["y"].to_numpy(zero_copy_only=False)[sel]
        if len(xs) == 0:
            min_x = min_y = 0
            max_x = max_y = -1
        else:
            min_x, min_y, max_x, max_y = (
                int(xs.min()), int(ys.min()), int(xs.max()), int(ys.max())
            )

    tms_def = spec.get("tms")
    if max_x >= min_x and tms_def:
        # custom quad TMS (--tms): grid coordinates ARE lon/lat-like —
        # bounds come from the user grid, no mercator projection exists
        w_arr, n_arr, sx, sy = tms.quad_tile_bounds(
            np.array([min_x]), np.array([min_y]), base_z, tms_def
        )
        e_arr, s_arr, _, _ = tms.quad_tile_bounds(
            np.array([max_x + 1]), np.array([max_y + 1]), base_z, tms_def
        )
        bounds_w = (float(w_arr[0]), float(s_arr[0]), float(e_arr[0]), float(n_arr[0]))
        bounds_m = bounds_w
    elif max_x >= min_x:
        west, _, _, north = tms.xy_bounds(base_z, min_x, min_y)
        _, south, east, _ = tms.xy_bounds(base_z, max_x, max_y)
        lon_w, lat_n = tms.mercator_to_lonlat(np.float64(west), np.float64(north))
        lon_e, lat_s = tms.mercator_to_lonlat(np.float64(east), np.float64(south))
        bounds_m = (float(west), float(south), float(east), float(north))
        bounds_w = (float(lon_w), float(lat_s), float(lon_e), float(lat_n))
    else:
        bounds_m = bounds_w = (0.0, 0.0, 0.0, 0.0)
    center = (
        (bounds_w[0] + bounds_w[2]) / 2.0,
        (bounds_w[1] + bounds_w[3]) / 2.0,
    )

    ifds = []
    ob = spec.get("overview_blocksize")
    for j, lv in enumerate(m.levels):
        # decimation IS the per-axis shrink for every ladder type
        # (pow2 TMS zooms and pseudo-zoom ordinal ladders alike); with
        # an --overview-blocksize grid, overview dims follow that grid
        shrink = lv.decimation
        g_lv = G if j == 0 else int(ob or G)
        w_tiles = (max_x - min_x + 1) if max_x >= min_x else 0
        h_tiles = (max_y - min_y + 1) if max_y >= min_y else 0
        ifds.append(
            IFD(
                Level=j,
                Zoom=lv.z,
                Decimation=lv.decimation,
                Tiles=lv.tiles,
                Pages=lv.pages,
                Cells=lv.cells,
                Width=max(1, (w_tiles * g_lv) // shrink) if w_tiles else 0,
                Height=max(1, (h_tiles * g_lv) // shrink) if h_tiles else 0,
            )
        )

    return Info(
        Path=os.path.abspath(out_dir),
        Engine=f"{m.engine} v{m.version}",
        Valid=ok,
        Errors=errs,
        Warnings=warns,
        Profile=Profile(
            TilePx=G,
            Resampling=spec.get("resampling", "sum"),
            DecimationBase=int(spec.get("decimation_base", 2)),
            AlignedLevels=int(spec.get("aligned_levels", 0)),
            InvalidPolicy=spec.get("invalid_policy", "mask"),
            Source=spec.get("source", "pages"),
            WeightColumn=spec.get("weight_col"),
        ),
        GEO=Geo(
            CRS=(
                f"custom quad TMS ({int(tms_def['cols0'])}x"
                f"{int(tms_def['rows0'])} base grid)"
                if tms_def
                else "EPSG:3857 (WebMercatorQuad)"
            ),
            BoundsWGS84=bounds_w,
            BoundsMercator=bounds_m,
            Center=center,
            Resolution=float(tms.cell_size(base_z)),
            MinZoom=int(spec["min_zoom"]),
            MaxZoom=base_z,
        ),
        IFDs=ifds,
        Tags=dict(m.tags),
        Bands=[
            Band(
                Name=b,
                Tags=dict(m.band_tags.get(b, {})),
                Scale=float(m.band_scales.get(b, 1.0)),
                Offset=float(m.band_offsets.get(b, 0.0)),
            )
            for b in ["count"]
            + ([spec["weight_col"]] if spec.get("weight_col") else [])
        ],
        Colormap=dict(m.colormap),
        TotalPages=m.total_pages,
        InvalidPages=m.invalid_pages,
    )


def stage_report(ds) -> "pa.Table":
    """Structured per-operator execution report from ``ds.stats()`` —
    the measure-don't-guess feedback loop as a queryable table:
    (stage, tasks, blocks, wall_s_ppm, rows_out, bytes_out) one row
    per operator of an EXECUTED Dataset (call after ``materialize()``
    or a consuming action; a never-executed plan reports zero rows).

    Parsing targets the stable Ray 2.x stats lines
    (``Operator N <name>: T tasks executed, B blocks produced in Ss``
    and the ``Output num rows/size bytes per block`` totals); wall
    time is integer microseconds (ppm of a second) so downstream
    comparisons stay in the engine's integer doctrine."""
    import re

    import pyarrow as pa

    txt = ds.stats() or ""
    rows = []
    current = None
    for line in txt.splitlines():
        m = re.match(
            r"Operator \d+ (.+?): (\d+) tasks executed, "
            r"(\d+) blocks produced in ([\d.]+)s",
            line.strip(),
        )
        if m:
            current = {
                "stage": m.group(1),
                "tasks": int(m.group(2)),
                "blocks": int(m.group(3)),
                "wall_us": int(round(float(m.group(4)) * 1_000_000)),
                "rows_out": 0,
                "bytes_out": 0,
            }
            rows.append(current)
            continue
        if current is None:
            continue
        m = re.match(
            r"\* Output num rows per block: .* ([\d]+) total", line.strip()
        )
        if m:
            current["rows_out"] = int(m.group(1))
            continue
        m = re.match(
            r"\* Output size bytes per block: .* ([\d]+) total", line.strip()
        )
        if m:
            current["bytes_out"] = int(m.group(1))
    return pa.table(
        {
            "stage": pa.array([r["stage"] for r in rows], pa.string()),
            "tasks": pa.array([r["tasks"] for r in rows], pa.int64()),
            "blocks": pa.array([r["blocks"] for r in rows], pa.int64()),
            "wall_us": pa.array([r["wall_us"] for r in rows], pa.int64()),
            "rows_out": pa.array([r["rows_out"] for r in rows], pa.int64()),
            "bytes_out": pa.array([r["bytes_out"] for r in rows], pa.int64()),
        }
    )
