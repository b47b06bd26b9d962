"""Single-node, single-pass oracle tiler — the engine's "GDAL cross
check".

Plays the role GDAL's own COG driver plays in the reference's test suite
(tests/test_web.py:303-405: rio-cogeo output compared against
gdal_translate COG output): an independent, trivially-auditable
implementation of extract→geocode→assign→rasterize→pyramid over ONE
in-memory Arrow table, with a fixed row order (sorted by url/doc_id).
Pytest asserts that the distributed Ray pipeline's outputs equal the
oracle's bit-for-bit at every pyramid level (the distributed analog of
the reference's byte-identical internal-tile check,
tests/test_web.py:158-238).

Shares only the leaf math (tms/geocode/extract pure functions) with the
engine — composition here is deliberately naive: one table, plain
dict-of-grids, python loops over tiles.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import pyarrow as pa

from rio_cogeo_ray.functions import tms
from rio_cogeo_ray.functions.extract import extract_text
from rio_cogeo_ray.functions.geocode import geocode_id, geocode_url
from rio_cogeo_ray.pipelines.spec import TilingSpec

SparseTiles = Dict[int, Tuple[np.ndarray, np.ndarray, int]]  # key → (cells, counts, pages)


def prepare(table: pa.Table, spec: TilingSpec, source: str = "pages") -> pa.Table:
    """Geocode + tile-assign one table (sorted by identity column)."""
    sort_col = "url" if source == "pages" else "doc_id"
    table = table.sort_by(sort_col)
    if source == "pages":
        lon, lat, valid = geocode_url(table["url"].combine_chunks(), spec.geocode)
    else:
        ids = table["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        lon, lat, valid = geocode_id(ids)
    mx, my = tms.lonlat_to_mercator(lon, lat)
    x, y = tms.mercator_tile(mx, my, spec.zoom)
    key = tms.pack_tile_key(spec.zoom, x, y)
    for name, arr, typ in [
        ("lon", lon, pa.float64()),
        ("lat", lat, pa.float64()),
        ("mx", mx, pa.float64()),
        ("my", my, pa.float64()),
        ("x", x, pa.int64()),
        ("y", y, pa.int64()),
        ("tile_key", key, pa.int64()),
    ]:
        table = table.append_column(name, pa.array(arr, typ, mask=~valid))
    return table.append_column("geo_valid", pa.array(valid))


def base_tiles(
    prepared: pa.Table, spec: TilingSpec, weight_col: Optional[str] = None
) -> SparseTiles:
    """Scatter pages into per-tile sparse G×G grids (row loop per tile)."""
    G = spec.tile_px
    gv = prepared["geo_valid"].combine_chunks().to_numpy(zero_copy_only=False)
    if weight_col is not None and pa.types.is_floating(prepared[weight_col].type):
        wf = prepared[weight_col].combine_chunks().fill_null(np.nan).to_numpy(
            zero_copy_only=False
        )
        gv = gv & np.isfinite(wf)  # NaN weight = nodata page
    t = prepared.filter(pa.array(gv))
    if spec.tile_cover is not None:
        min_x, min_y, max_x, max_y = spec.tile_cover
        xs = t["x"].combine_chunks().to_numpy(zero_copy_only=False)
        ys = t["y"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = (xs >= min_x) & (xs <= max_x) & (ys >= min_y) & (ys <= max_y)
        t = t.filter(pa.array(keep))
    mx = t["mx"].combine_chunks().to_numpy(zero_copy_only=False)
    my = t["my"].combine_chunks().to_numpy(zero_copy_only=False)
    x = t["x"].combine_chunks().to_numpy(zero_copy_only=False)
    y = t["y"].combine_chunks().to_numpy(zero_copy_only=False)
    key = t["tile_key"].combine_chunks().to_numpy(zero_copy_only=False)
    if weight_col is not None:
        wcol = t[weight_col].combine_chunks()
        if pa.types.is_floating(wcol.type):
            w = np.floor(
                wcol.to_numpy(zero_copy_only=False) * 256.0 + 0.5
            ).astype(np.int64)  # 1/256 fixed point, mirrors density_partials
        else:
            w = wcol.to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        w = np.ones(len(t), dtype=np.int64)
    span = tms.tile_span(spec.zoom)
    pspan = span / G
    west = x * span - tms.ORIGIN_SHIFT
    north = tms.ORIGIN_SHIFT - y * span
    px = np.clip(np.floor((mx - west) / pspan), 0, G - 1).astype(np.int64)
    py = np.clip(np.floor((north - my) / pspan), 0, G - 1).astype(np.int64)
    cell = py * G + px

    out: SparseTiles = {}
    for k in np.unique(key):
        m = key == k
        c = cell[m]
        ws = w[m]
        uc = np.unique(c)
        sums = np.array([int(ws[c == ci].sum()) for ci in uc], dtype=np.int64)
        out[int(k)] = (uc, sums, int(m.sum()))
    return out


def downsample(tiles: SparseTiles, spec: TilingSpec, level: int) -> SparseTiles:
    """One pyramid step (decimation by 2**zoom_step) with the spec's
    resampling kernel — naive per-tile loops."""
    G = spec.tile_px
    step = spec.zoom_step
    mask = (1 << step) - 1
    nsub = 1 << step

    # gather children per parent
    parents: Dict[int, list] = {}
    for k, payload in tiles.items():
        z_, x_, y_ = tms.unpack_tile_key(np.array([k], dtype=np.int64))
        z, x, y = int(z_[0]), int(x_[0]), int(y_[0])
        pk = int(tms.pack_tile_key(z - step, x >> step, y >> step))
        parents.setdefault(pk, []).append((x, y, payload))

    out: SparseTiles = {}
    for pk, children in parents.items():
        acc: Dict[int, list] = {}
        pages = 0
        for x, y, (cells, counts, cpages) in children:
            pages += cpages
            px = cells % G
            py = cells // G
            ppx = ((x & mask) * G + px) >> step
            ppy = ((y & mask) * G + py) >> step
            sub = (py & mask) * nsub + (px & mask)
            for pc_, v, sp in zip(ppy * G + ppx, counts, sub):
                acc.setdefault(int(pc_), []).append((int(sp), int(v)))
        cells_out, counts_out = [], []
        for pc_ in sorted(acc):
            vals = acc[pc_]
            if spec.resampling in ("sum", "average"):
                cells_out.append(pc_)
                counts_out.append(sum(v for _, v in vals))
            elif spec.resampling == "nearest":
                tl = [v for sp, v in vals if sp == 0]
                if tl:
                    cells_out.append(pc_)
                    counts_out.append(tl[0])
            elif spec.resampling == "mode":
                n_empty = nsub * nsub - len(vals)
                vcounts: Dict[int, int] = {}
                for _, v in vals:
                    vcounts[v] = vcounts.get(v, 0) + 1
                best_v = min(
                    (v for v in vcounts if vcounts[v] == max(vcounts.values()))
                )
                if n_empty >= vcounts[best_v]:
                    continue
                cells_out.append(pc_)
                counts_out.append(best_v)
        out[pk] = (
            np.array(cells_out, dtype=np.int64),
            np.array(counts_out, dtype=np.int64),
            pages,
        )
    return out


def downsample_general(
    tiles: SparseTiles, spec: TilingSpec, level_j: int
) -> SparseTiles:
    """One pyramid step for ANY decimation base / kernel — naive global
    dicts (python loops). Mirrors the engine's global-pixel floor-div
    semantics (stages/rasterize.py:pyramid_partials[_conv]): child pixel
    g → parent pixel g // base; conv kernels fan out integer taps and
    floor-normalize by (Σw)²; pages go to the parent tile of the child
    tile's top-left pixel; out-of-world taps read as zero; cover clips
    conv ringing."""
    from rio_cogeo_ray.stages.rasterize import kernel_taps

    G = spec.tile_px
    b = spec.decimation_base
    step = spec.zoom_step
    parent_dim = spec.level_dim(level_j)
    is_conv = spec.is_conv
    cover = (
        tuple(c >> (level_j * step) for c in spec.tile_cover)
        if (is_conv and spec.tile_cover is not None)
        else None
    )

    pages: Dict[Tuple[int, int], int] = {}
    acc: Dict[Tuple[int, int], object] = {}  # (pgx, pgy) → int or list
    if is_conv:
        offs, ws, wsum = kernel_taps(spec.resampling, b)
        taps = list(zip(offs.tolist(), ws.tolist()))

    parent_z = None
    for k, (cells, counts, cpages) in tiles.items():
        z_, x_, y_ = tms.unpack_tile_key(np.array([k], dtype=np.int64))
        z, x, y = int(z_[0]), int(x_[0]), int(y_[0])
        parent_z = z - step
        pt = ((x * G) // b // G, (y * G) // b // G)
        pages[pt] = pages.get(pt, 0) + cpages
        for c, v in zip(cells.tolist(), counts.tolist()):
            gx = x * G + c % G
            gy = y * G + c // G
            if is_conv:
                for ox, wx in taps:
                    qx = gx - ox
                    if qx % b:
                        continue
                    pgx = qx // b
                    if not (0 <= pgx < parent_dim):
                        continue
                    for oy, wy in taps:
                        qy = gy - oy
                        if qy % b:
                            continue
                        pgy = qy // b
                        if not (0 <= pgy < parent_dim):
                            continue
                        p = (pgx, pgy)
                        acc[p] = acc.get(p, 0) + v * wx * wy
            elif spec.resampling == "nearest":
                if gx % b == 0 and gy % b == 0:
                    p = (gx // b, gy // b)
                    acc[p] = acc.get(p, 0) + v
            elif spec.resampling == "mode":
                p = (gx // b, gy // b)
                acc.setdefault(p, []).append(((gy % b) * b + gx % b, v))
            elif spec.resampling == "rms":
                p = (gx // b, gy // b)
                acc[p] = acc.get(p, 0) + v * v
            else:  # sum / average
                p = (gx // b, gy // b)
                acc[p] = acc.get(p, 0) + v

    # resolve per-parent-pixel values
    vals: Dict[Tuple[int, int], int] = {}
    for p, payload in acc.items():
        if is_conv:
            v = payload // (wsum * wsum)  # python floor division
            if v == 0:
                continue
        elif spec.resampling == "rms":
            v = int(np.floor(np.sqrt(float(payload) / (b * b))))
            if v == 0:
                continue
        elif spec.resampling == "mode":
            n_empty = b * b - len(payload)
            vcounts: Dict[int, int] = {}
            for _, vv in payload:
                vcounts[vv] = vcounts.get(vv, 0) + 1
            best_v = min(v for v in vcounts if vcounts[v] == max(vcounts.values()))
            if n_empty >= vcounts[best_v]:
                continue
            v = best_v
        else:
            v = payload
        if cover is not None:
            tx, ty = p[0] // G, p[1] // G
            if not (cover[0] <= tx <= cover[2] and cover[1] <= ty <= cover[3]):
                continue
        vals[p] = v

    # regroup into tiles; union of page-attributed and cell-bearing tiles
    per_tile: Dict[Tuple[int, int], list] = {t: [] for t in pages}
    for (pgx, pgy), v in vals.items():
        t = (pgx // G, pgy // G)
        per_tile.setdefault(t, []).append(((pgy % G) * G + (pgx % G), v))
    out: SparseTiles = {}
    for t, cellvals in per_tile.items():
        if not cellvals and pages.get(t, 0) == 0:
            continue  # conv ringing target with no pages: not a tile
        cellvals.sort()
        key = int(tms.pack_tile_key(parent_z, t[0], t[1]))
        out[key] = (
            np.array([c for c, _ in cellvals], dtype=np.int64),
            np.array([v for _, v in cellvals], dtype=np.int64),
            pages.get(t, 0),
        )
    return out


def pyramid(
    table: pa.Table, spec: TilingSpec, source: str = "pages", weight_col: Optional[str] = None
) -> Dict[int, SparseTiles]:
    """Full oracle run: {zoom → sparse tiles} for every pyramid level."""
    prepared = prepare(table, spec, source=source)
    levels = {spec.zoom: base_tiles(prepared, spec, weight_col)}
    cur = levels[spec.zoom]
    use_general = spec.is_conv or spec.is_rms or not spec.is_pow2_base
    for j, z in enumerate(spec.zooms[1:], start=1):
        cur = downsample_general(cur, spec, j) if use_general else downsample(cur, spec, j)
        levels[z] = cur
    return levels


def verify_text_invariant(table: pa.Table) -> int:
    """Rows whose stored text differs from extract_text(html)."""
    import pyarrow.compute as pc

    text = extract_text(table["html"].combine_chunks())
    eq = pc.equal(text, table["text"].combine_chunks())
    return len(table) - pc.sum(pc.cast(eq, pa.int64())).as_py()
