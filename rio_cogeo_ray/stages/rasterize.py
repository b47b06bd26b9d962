"""Density rasterization + overview pyramid — sparse per-tile page grids.

The engine analog of the reference's windowed block copy + overview build
(rio_cogeo/cogeo.py:362-390): pages are scattered into a G×G pixel grid
per TMS tile (G = spec.tile_px, the blocksize analog of
rio_cogeo/profiles.py:8-151), then coarser zoom levels are produced by
power-of-two decimation with a resampling kernel (subset of the
reference's RIOResampling enum, cogeo.py:48-60).

Representation: SPARSE grids — per tile row, ``cells: list<int32>``
(sorted ascending, ``cell = py * G + px``) and ``counts: list<int64>``.
Sparse is the 100 TB-scale choice (a batch touching many distinct tiles
must not allocate G² per tile) and mirrors COG sparse-tile support
(cogeo.py:706-727 treats absent block offsets as sparse). All
aggregation is int64 — associative, so results are bit-identical at any
parallelism / batch order. Lossy float conversion happens only at dense
export (:func:`tiles_to_dense`).

Shuffle discipline: raw page rows NEVER enter a shuffle. Each batch is
pre-aggregated to at most one partial row per touched tile
(``density_partials``), and only those partials flow into
``groupby(tile_key)`` — the partial→final aggregate pattern. Hot (urban)
tiles therefore cost O(#batches) partial rows, not O(#pages), which is
the skew story for the density path.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from rio_cogeo_ray.functions import tms

TILE_SCHEMA = pa.schema(
    [
        ("tile_key", pa.int64()),
        ("z", pa.int16()),
        ("x", pa.int64()),
        ("y", pa.int64()),
        ("page_count", pa.int64()),
        ("cells", pa.list_(pa.int32())),
        ("counts", pa.list_(pa.int64())),
    ]
)

#: Kernels whose per-pixel aggregation is a plain sum (distributive —
#: partials can pre-aggregate). 'average' stores the sum and divides by
#: base**(2*level) at dense export; 'nearest' keeps the top-left subpixel.
_SUMMABLE = ("sum", "average", "nearest")

#: Separable interpolating kernels (the remaining reference resampling
#: enum members, rio_cogeo/cogeo.py:48-60). Each is lowered to a 1-D
#: integer tap table (:func:`kernel_taps`) applied along x then y:
#: parent pixel p draws child pixels at global positions base*p + offset
#: with int64 weights, summed through the ordinary partial→final merge
#: (associative ⇒ bit-deterministic), then floor-normalized ONCE per
#: level by (Σw)² (:func:`finalize_conv_tiles`). Out-of-world taps read
#: as zero and the divisor stays (Σw)² everywhere (documented edge
#: semantics; density grids have no nodata, absent cell ≡ count 0).
CONV_KERNELS = ("bilinear", "cubic", "cubic_spline", "lanczos", "gauss")

#: Fixed-point scale for tap quantization. Chosen so every power-of-two
#: base's polynomial-kernel taps are EXACT integers (denominators divide
#: 4096) and transcendental kernels (lanczos/gauss) quantize with ~1e-4
#: relative error — far below one count at any realistic cell density.
_TAP_SCALE = 4096


def _kernel_fn(kernel: str):
    """Continuous kernel k(t) (support radius in parent-pixel units)."""
    if kernel == "bilinear":
        return (lambda t: max(0.0, 1.0 - abs(t))), 1.0
    if kernel == "cubic":
        # Catmull-Rom (a = -0.5), the GDAL cubic default.
        def k(t):
            t = abs(t)
            if t <= 1.0:
                return 1.5 * t**3 - 2.5 * t**2 + 1.0
            if t <= 2.0:
                return -0.5 * t**3 + 2.5 * t**2 - 4.0 * t + 2.0
            return 0.0

        return k, 2.0
    if kernel == "cubic_spline":
        # Cubic B-spline (smoothing, strictly positive taps).
        def k(t):
            t = abs(t)
            if t <= 1.0:
                return 2.0 / 3.0 - t**2 + t**3 / 2.0
            if t <= 2.0:
                return (2.0 - t) ** 3 / 6.0
            return 0.0

        return k, 2.0
    if kernel == "lanczos":
        def k(t):
            t = abs(t)
            if t >= 3.0:
                return 0.0
            if t < 1e-12:
                return 1.0
            pt = np.pi * t
            return 3.0 * np.sin(pt) * np.sin(pt / 3.0) / (pt * pt)

        return k, 3.0
    if kernel == "gauss":
        # exp(-2t²) truncated at |t| ≤ 1 (engine-defined; GDAL's gauss
        # likewise uses a small truncated kernel per factor).
        return (lambda t: np.exp(-2.0 * t * t) if abs(t) < 1.0 else 0.0), 1.0
    raise ValueError(f"not a convolution kernel: {kernel!r}")


def kernel_taps(kernel: str, base: int):
    """Integer 1-D taps for decimating by ``base`` with ``kernel``.

    Returns ``(offsets int64[], weights int64[], wsum int)``. Parent
    pixel p (global coords) draws child pixel ``base*p + offset`` with
    ``weight``; the normalized value is ``floor(Σ wx·wy·child / wsum²)``
    (floor division, negative lobes permitted — lanczos/cubic ringing).
    Kernel center sits at src position ``base*p + (base-1)/2`` (the
    standard dst→src pixel-center mapping) and the support is scaled by
    ``base``, matching overview-resampler convention.
    """
    k, radius = _kernel_fn(kernel)
    s = (base - 1) / 2.0
    lo = int(np.floor(s - radius * base)) + 1
    hi = int(np.ceil(s + radius * base)) - 1
    offs, ws = [], []
    for j in range(lo, hi + 1):
        w = int(np.floor(k((j - s) / base) * _TAP_SCALE + 0.5))
        if w != 0:
            offs.append(j)
            ws.append(w)
    return (
        np.asarray(offs, dtype=np.int64),
        np.asarray(ws, dtype=np.int64),
        int(sum(ws)),
    )


def _aggregate_sparse(
    tile_ids: np.ndarray,
    cells: np.ndarray,
    weights: np.ndarray,
    n_tiles: int,
) -> tuple:
    """Sort-based sparse aggregation: (tile_id, cell) pairs → per-tile
    sorted unique cells with int64 summed weights. O(n log n), no dense
    G² allocation (the sparse-scalability core of the rasterizer)."""
    order = np.lexsort((cells, tile_ids))
    t = tile_ids[order]
    c = cells[order]
    w = weights[order]
    new = np.empty(len(t), dtype=bool)
    if len(t):
        new[0] = True
        np.not_equal(t[1:], t[:-1], out=new[1:])
        cell_change = c[1:] != c[:-1]
        new[1:] |= cell_change
    starts = np.flatnonzero(new)
    sums = np.add.reduceat(w, starts) if len(starts) else np.zeros(0, dtype=np.int64)
    u_tiles = t[starts]
    u_cells = c[starts]
    # per-tile unique-cell counts (tile ids are dense 0..n_tiles-1)
    tile_counts = np.bincount(u_tiles, minlength=n_tiles).astype(np.int64)
    return u_tiles, u_cells, sums, tile_counts


def _tiles_table(
    keys: np.ndarray,
    cell_offsets: np.ndarray,
    cells: np.ndarray,
    counts: np.ndarray,
    page_counts: np.ndarray,
) -> pa.Table:
    z, x, y = tms.unpack_tile_key(keys)
    return pa.Table.from_arrays(
        [
            pa.array(keys, pa.int64()),
            pa.array(z.astype(np.int16), pa.int16()),
            pa.array(x, pa.int64()),
            pa.array(y, pa.int64()),
            pa.array(page_counts, pa.int64()),
            pa.ListArray.from_arrays(
                pa.array(cell_offsets, pa.int32()), pa.array(cells.astype(np.int32), pa.int32())
            ),
            pa.ListArray.from_arrays(
                pa.array(cell_offsets, pa.int32()), pa.array(counts.astype(np.int64), pa.int64())
            ),
        ],
        schema=TILE_SCHEMA,
    )


def density_partials(
    batch: pa.Table,
    tile_px: int,
    weight_col: Optional[str] = None,
    tms_def=None,
) -> pa.Table:
    """Prepared page batch → partial tile rows (≤1 per touched tile).

    Pixel rule: ``px = clip(floor((mx - tile_west) / (span/G)), 0, G-1)``
    (clipping absorbs the ulp-level disagreement a point exactly on a
    boundary could have between the tile floor and the pixel floor).
    ``weight_col``: integer column used verbatim, or a FLOAT column
    quantized to 1/256 fixed point (``floor(w·256 + 0.5)``, mirrored by
    the oracle); non-finite float weights (NaN/inf) mark the page as
    nodata — excluded from both the grid and the page count (the
    NaN-channel analog of the reference's image_nan fixture,
    tests/test_cogeo.py:236-255). Default weight is 1 page.
    """
    valid = batch["geo_valid"].combine_chunks().to_numpy(zero_copy_only=False)
    if weight_col is not None and pa.types.is_floating(batch[weight_col].type):
        wf = batch[weight_col].combine_chunks().fill_null(np.nan).to_numpy(
            zero_copy_only=False
        )
        valid = valid & np.isfinite(wf)
    if not valid.all():
        batch = batch.filter(pa.array(valid))
    if len(batch) == 0:
        return TILE_SCHEMA.empty_table()
    G = tile_px
    key = batch["tile_key"].combine_chunks().to_numpy(zero_copy_only=False)
    x = batch["x"].combine_chunks().to_numpy(zero_copy_only=False)
    y = batch["y"].combine_chunks().to_numpy(zero_copy_only=False)
    mx = batch["mx"].combine_chunks().to_numpy(zero_copy_only=False)
    my = batch["my"].combine_chunks().to_numpy(zero_copy_only=False)
    z = int(tms.unpack_tile_key(key[:1])[0][0])
    if tms_def is not None:
        # custom quad TMS (--tms axis): mx/my carry the grid coords
        # (lon, lat) and tile bounds come from the user grid
        west, north, sx, sy = tms.quad_tile_bounds(x, y, z, tms_def)
        px = np.clip(np.floor((mx - west) / (sx / G)), 0, G - 1).astype(np.int64)
        py = np.clip(np.floor((north - my) / (sy / G)), 0, G - 1).astype(np.int64)
    else:
        span = tms.tile_span(z)
        pspan = span / G
        west = x * span - tms.ORIGIN_SHIFT
        north = tms.ORIGIN_SHIFT - y * span
        px = np.clip(np.floor((mx - west) / pspan), 0, G - 1).astype(np.int64)
        py = np.clip(np.floor((north - my) / pspan), 0, G - 1).astype(np.int64)
    cell = (py * G + px).astype(np.int64)
    if weight_col is not None:
        wcol = batch[weight_col].combine_chunks()
        if pa.types.is_floating(wcol.type):
            wf = wcol.to_numpy(zero_copy_only=False)
            w = np.floor(wf * 256.0 + 0.5).astype(np.int64)  # 1/256 fixed point
        else:
            w = wcol.to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        w = np.ones(len(batch), dtype=np.int64)

    u_keys, inv = np.unique(key, return_inverse=True)
    u_t, u_c, sums, tile_ncells = _aggregate_sparse(inv, cell, w, len(u_keys))
    offsets = np.concatenate(([0], np.cumsum(tile_ncells)))
    page_counts = np.bincount(inv, minlength=len(u_keys)).astype(np.int64)
    return _tiles_table(u_keys, offsets, u_c, sums, page_counts)


def _merge_bucket_table(
    group: pa.Table, resampling: str, level: int, base: int, tile_px: int
) -> pa.Table:
    """Vectorized merge of the partial rows of MANY tiles (one hash
    bucket): one lexsort + reduceat over all (tile, cell) pairs — no
    per-tile Python. This is the final combiner behind
    :func:`merge_sparse_tiles`."""
    if len(group) == 0:
        return TILE_SCHEMA.empty_table()
    keys = group["tile_key"].combine_chunks().to_numpy(zero_copy_only=False)
    cells_list = group["cells"].combine_chunks()
    lens = np.diff(cells_list.offsets.to_numpy(zero_copy_only=False))
    row_idx = np.repeat(np.arange(len(group), dtype=np.int64), lens)
    cells = cells_list.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    vals = group["counts"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
    t_of_entry = keys[row_idx]

    # per-tile page counts (independent of the cell kernel)
    u_keys, kinv = np.unique(keys, return_inverse=True)
    pc_counts = group["page_count"].combine_chunks().to_numpy(zero_copy_only=False)
    pages = np.bincount(kinv, weights=pc_counts.astype(np.float64)).astype(np.int64)

    if len(cells) == 0:
        # every partial in the bucket has an empty grid (nearest/mode can
        # drop all pixels) — emit the tiles as empty sparse rows
        out_t = np.zeros(0, dtype=np.int64)
        out_c = np.zeros(0, dtype=np.int64)
        out_v = np.zeros(0, dtype=np.int64)
    elif resampling == "mode" and level > 0:
        nsub2 = base * base
        pix = cells // nsub2
        order = np.lexsort((vals, pix, t_of_entry))
        t, p, v = t_of_entry[order], pix[order], vals[order]
        # runs of identical (t, p, v)
        new_run = np.concatenate(
            ([True], (t[1:] != t[:-1]) | (p[1:] != p[:-1]) | (v[1:] != v[:-1]))
        )
        run_start = np.flatnonzero(new_run)
        run_cnt = np.diff(np.append(run_start, len(t)))
        rt, rp, rv = t[run_start], p[run_start], v[run_start]
        # segments of identical (t, p) over the run array
        new_seg = np.concatenate(([True], (rt[1:] != rt[:-1]) | (rp[1:] != rp[:-1])))
        seg_start = np.flatnonzero(new_seg)
        seg_id = np.cumsum(new_seg) - 1
        seg_max = np.maximum.reduceat(run_cnt, seg_start)
        seg_total = np.add.reduceat(run_cnt, seg_start)
        # winning run per segment: first (smallest v, runs sorted by v)
        # run whose count equals the segment max
        cand = run_cnt == seg_max[seg_id]
        _, first_idx = np.unique(seg_id[cand], return_index=True)
        win = np.flatnonzero(cand)[first_idx]
        # zero-majority rule: empty subpixels (nsub2 - total) win ties
        keep = seg_max > (nsub2 - seg_total)
        keep_seg = keep[seg_id[win]]
        win = win[keep_seg]
        out_t, out_c, out_v = rt[win], rp[win], rv[win]
    else:
        order = np.lexsort((cells, t_of_entry))
        t, c, v = t_of_entry[order], cells[order], vals[order]
        new = np.concatenate(([True], (t[1:] != t[:-1]) | (c[1:] != c[:-1])))
        starts = np.flatnonzero(new)
        out_t = t[starts]
        out_c = c[starts]
        out_v = np.add.reduceat(v, starts) if len(starts) else np.zeros(0, np.int64)

    # per-tile list offsets over the (sorted-by-tile) unique pairs;
    # tiles with zero surviving cells still get a (sparse, empty) row
    ncells = np.zeros(len(u_keys), dtype=np.int64)
    if len(out_t):
        pos = np.searchsorted(u_keys, out_t)
        ncells = np.bincount(pos, minlength=len(u_keys)).astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(ncells)))
    return _tiles_table(u_keys, offsets, out_c, out_v, pages)


def merge_sparse_tiles(
    partials,
    resampling: str = "sum",
    level: int = 0,
    base: int = 2,
    tile_px: int = 256,
    n_buckets: int = 64,
):
    """Partial tile rows → final tiles via BUCKETED aggregation: tiles
    hash into ``n_buckets`` groups, so the groupby makes n_buckets
    map_groups calls (each merged vectorized), not one per tile —
    per-group Python overhead is O(buckets), independent of tile count.
    Size n_buckets so one bucket's tiles fit a worker heap
    (~tiles/n_buckets rows each; raise it for deep zooms)."""
    from rio_cogeo_ray.functions.hashing import splitmix64

    def _bucket(t: pa.Table) -> pa.Table:
        k = t["tile_key"].combine_chunks().to_numpy(zero_copy_only=False)
        b = (splitmix64(k.astype(np.uint64)) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("__bucket", pa.array(b, pa.int64()))

    bucketed = partials.map_batches(_bucket, batch_format="pyarrow")
    return bucketed.groupby("__bucket").map_groups(
        lambda g: _merge_bucket_table(
            g.drop_columns(["__bucket"]), resampling, level, base, tile_px
        ),
        batch_format="pyarrow",
    )


def _parent_z_for(child_z: int, base: int) -> int:
    """Ladder rule (tms.ladder_step is the single source): power-of-two
    bases step real TMS zooms; other bases use a pseudo-zoom ORDINAL
    decrementing by 1 (the reference's arbitrary-base overview ladder,
    cogeo.py:196-203)."""
    return child_z - tms.ladder_step(base)


def _load_sparse(batch: pa.Table, G: int):
    """Unpack a tile-row batch into flat global-pixel arrays."""
    key = batch["tile_key"].combine_chunks().to_numpy(zero_copy_only=False)
    x = batch["x"].combine_chunks().to_numpy(zero_copy_only=False)
    y = batch["y"].combine_chunks().to_numpy(zero_copy_only=False)
    pc_counts = batch["page_count"].combine_chunks().to_numpy(zero_copy_only=False)
    cells_list = batch["cells"].combine_chunks()
    lens = np.diff(cells_list.offsets.to_numpy(zero_copy_only=False))
    row_idx = np.repeat(np.arange(len(batch), dtype=np.int64), lens)
    cells = cells_list.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    vals = batch["counts"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
    gx = x[row_idx] * G + cells % G
    gy = y[row_idx] * G + cells // G
    return key, x, y, pc_counts, gx, gy, vals


def _partials_from_contribs(
    G: int,
    parent_z: int,
    pgx: np.ndarray,
    pgy: np.ndarray,
    vals: np.ndarray,
    page_key: np.ndarray,
    pc_counts: np.ndarray,
    subpix: Optional[np.ndarray] = None,
    nsub2: int = 0,
) -> pa.Table:
    """Assemble partial tile rows from (parent global pixel, value)
    contributions plus per-child-row page attributions. Emits the UNION
    of cell-receiving and page-attributed parent tiles (they differ when
    decimation misaligns tile boundaries or a kernel rings across them)."""
    ptx = pgx // G
    pty = pgy // G
    pcell = (pgy % G) * G + (pgx % G)
    if subpix is not None:
        pcell = pcell * nsub2 + subpix
    pkey = tms.pack_tile_key(parent_z, ptx, pty)
    u_keys = np.unique(np.concatenate([pkey, page_key]))
    inv = np.searchsorted(u_keys, pkey)
    u_t, u_c, sums, tile_ncells = _aggregate_sparse(inv, pcell, vals, len(u_keys))
    offsets = np.concatenate(([0], np.cumsum(tile_ncells)))
    pages = np.bincount(
        np.searchsorted(u_keys, page_key),
        weights=pc_counts.astype(np.float64),
        minlength=len(u_keys),
    ).astype(np.int64)
    return _tiles_table(u_keys, offsets, u_c, sums, pages)


def pyramid_partials(
    batch: pa.Table,
    tile_px: int,
    resampling: str = "sum",
    base: int = 2,
    parent_px: Optional[int] = None,
) -> pa.Table:
    """Final tile rows at level z → partial parent rows one ladder level
    up, decimating by ``base`` (any base ≥ 2, cogeo.py:196-203).

    All math is GLOBAL-pixel floor division: child pixel g lands in
    parent pixel ``g // f``, which lives in parent tile
    ``(g // f) // Gp`` — for the default uniform grid (``parent_px``
    None ⇒ Gp = tile_px, f = base) this reduces exactly to the former
    shift math (bit-identical), for other bases a child tile's pixels
    may split across two parent tiles. Kernels: sum/average pre-sum;
    nearest keeps child pixels with ``g % f == 0`` on both axes; mode
    defers to the merge via subpixel-expanded cells (``f²`` slots per
    parent pixel). Child page counts are attributed to the parent tile
    of the child tile's top-left pixel (unambiguous for aligned bases,
    documented rule for misaligned ones).

    ``parent_px``: per-level grid override (the --overview-blocksize
    axis — GDAL_TIFF_OVR_BLOCKSIZE analog, rio_cogeo/cli.py:141-144):
    the parent level stores ``parent_px²`` cells per tile, so the
    PIXEL decimation is ``f = base·tile_px / parent_px`` (must divide
    evenly and be ≥ 1 — loud error otherwise).
    """
    if len(batch) == 0:
        return TILE_SCHEMA.empty_table()
    G = tile_px
    Gp = parent_px if parent_px is not None else tile_px
    num = base * G
    if num % Gp or num < Gp:
        raise ValueError(
            f"pyramid_partials: parent grid {Gp} must evenly divide "
            f"base·tile_px = {num} (pixel decimation must be a positive "
            "integer)"
        )
    f = num // Gp
    key, x, y, pc_counts, gx, gy, vals = _load_sparse(batch, G)
    child_z = int(tms.unpack_tile_key(key[:1])[0][0])
    parent_z = _parent_z_for(child_z, base)

    page_key = tms.pack_tile_key(parent_z, (x * G) // f // Gp, (y * G) // f // Gp)

    subpix = None
    nsub2 = 0
    if resampling == "nearest":
        keep = (gx % f == 0) & (gy % f == 0)
        gx, gy, vals = gx[keep], gy[keep], vals[keep]
    elif resampling == "mode":
        nsub2 = f * f
        subpix = (gy % f) * f + (gx % f)
    return _partials_from_contribs(
        Gp, parent_z, gx // f, gy // f, vals, page_key, pc_counts,
        subpix=subpix, nsub2=nsub2,
    )


def pyramid_partials_conv(
    batch: pa.Table,
    tile_px: int,
    kernel: str,
    base: int,
    parent_dim: int,
    parent_cover: Optional[tuple] = None,
) -> pa.Table:
    """Final tile rows at level z → UNNORMALIZED partial parent rows for
    an interpolating kernel (bilinear/cubic/cubic_spline/lanczos/gauss —
    the remaining reference resampling enum, cogeo.py:48-60).

    Separable integer convolution: each child pixel g (value v) fans out
    along x to parents p with ``base*p + off == g`` (weight w_off), then
    the expanded set fans out along y the same way; contributions are
    ``v · wx · wy`` int64 partials summed by the ordinary merge
    (associative ⇒ bit-deterministic regardless of batch/bucket order).
    :func:`finalize_conv_tiles` floor-divides the merged sums by
    ``(Σw)²`` once per level. ``parent_dim`` bounds the parent global
    grid (taps past the world edge read as zero); ``parent_cover``
    (inclusive tile bounds) additionally clips ringing outside an
    aligned cover. Overflow headroom: |v| must stay ≲ 2⁶³ / (Σ|w|)² ≈
    5·10⁹ per pixel — far above any real page density per cell.
    """
    if len(batch) == 0:
        return TILE_SCHEMA.empty_table()
    G = tile_px
    offs, ws, _ = kernel_taps(kernel, base)
    key, x, y, pc_counts, gx, gy, vals = _load_sparse(batch, G)
    child_z = int(tms.unpack_tile_key(key[:1])[0][0])
    parent_z = _parent_z_for(child_z, base)

    page_key = tms.pack_tile_key(parent_z, (x * G) // base // G, (y * G) // base // G)

    def _expand(g: np.ndarray, carried: tuple, v: np.ndarray):
        """One separable pass: (g, v) → (parent coord, carried…, v·w)."""
        outs = []
        for o, w in zip(offs, ws):
            q = g - o
            p = q // base
            m = (q == p * base) & (p >= 0) & (p < parent_dim)
            if not m.any():
                continue
            outs.append((p[m], tuple(c[m] for c in carried), v[m] * w))
        if not outs:
            z = np.zeros(0, dtype=np.int64)
            return z, tuple(z for _ in carried), z
        return (
            np.concatenate([o[0] for o in outs]),
            tuple(np.concatenate([o[1][i] for o in outs]) for i in range(len(carried))),
            np.concatenate([o[2] for o in outs]),
        )

    pgx, (gy1,), v1 = _expand(gx, (gy,), vals)
    pgy, (pgx2,), v2 = _expand(gy1, (pgx,), v1)
    if parent_cover is not None:
        min_x, min_y, max_x, max_y = parent_cover
        ptx = pgx2 // G
        pty = pgy // G
        m = (ptx >= min_x) & (ptx <= max_x) & (pty >= min_y) & (pty <= max_y)
        pgx2, pgy, v2 = pgx2[m], pgy[m], v2[m]
    return _partials_from_contribs(G, parent_z, pgx2, pgy, v2, page_key, pc_counts)


def finalize_conv_tiles(table: pa.Table, kernel: str, base: int) -> pa.Table:
    """Normalize MERGED conv-kernel tiles: floor-divide every cell sum by
    ``(Σw)²`` and drop cells that land on exactly 0 (sparse ≡ 0). Runs
    on final (post-merge) values only, so the lossy division never
    enters the distributed aggregation — same doctrine as 'average'."""
    _, _, wsum = kernel_taps(kernel, base)
    W2 = np.int64(wsum) * np.int64(wsum)
    # numpy floor division (negative lobes round toward -inf)
    return _finalize_tiles(table, lambda v: v // W2)


def square_tile_values(table: pa.Table) -> pa.Table:
    """Cell values c → c² (the rms ladder-step lift, reference enum
    slot rio_cogeo/cogeo.py:57): each step squares the child level's
    finalized values, then the merge is the ordinary ADDITIVE sum (Σc²
    is distributive) and the lossy sqrt happens exactly once per level
    at :func:`finalize_rms_tiles`. Overflow headroom: |c| ≲ 3·10⁹ per
    cell keeps c² inside int64 — far above any real density."""
    if len(table) == 0:
        return table
    vals = table["counts"].combine_chunks()
    off = vals.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = np.diff(off)
    flat = vals.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    sq = flat * flat
    new_off = pa.array(
        np.concatenate(([0], np.cumsum(lens))).astype(np.int32), pa.int32()
    )
    new = pa.ListArray.from_arrays(new_off, pa.array(sq, pa.int64()))
    return table.set_column(
        table.schema.get_field_index("counts"), "counts", new
    )


def finalize_rms_tiles(table: pa.Table, base: int) -> pa.Table:
    """Normalize MERGED rms tiles: cell ← ``floor(sqrt(ss / base²))``;
    cells flooring to 0 drop (sparse ≡ 0). Engine rms semantics
    (documented — the reference delegates the kernel to GDAL,
    cogeo.py:57): each level is the root-mean-square of the PREVIOUS
    level's cells over its base² footprint (recursive successive-
    overview build, absent cells counting as 0), the same per-level
    doctrine as the conv kernels. IEEE division and sqrt are correctly
    rounded in both numpy and DuckDB, so the SQL mirror
    ``CAST(FLOOR(SQRT(CAST(ss AS DOUBLE) / n)) AS BIGINT)`` is exact."""
    n = float(base * base)
    return _finalize_tiles(
        table,
        lambda v: np.floor(np.sqrt(v.astype(np.float64) / n)).astype(np.int64),
    )


def _finalize_tiles(table: pa.Table, qfn) -> pa.Table:
    """Shared post-merge normalize: map cell values through ``qfn``,
    drop cells landing on exactly 0, drop tiles left with no cells and
    no pages (they only existed as contribution targets)."""
    if len(table) == 0:
        return table
    cells_list = table["cells"].combine_chunks()
    offsets = cells_list.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = np.diff(offsets)
    cells = cells_list.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    vals = table["counts"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
    q = qfn(vals)
    keep = q != 0
    row_idx = np.repeat(np.arange(len(table), dtype=np.int64), lens)
    ncells = np.bincount(row_idx[keep], minlength=len(table)).astype(np.int64)
    keys = table["tile_key"].combine_chunks().to_numpy(zero_copy_only=False)
    pages = table["page_count"].combine_chunks().to_numpy(zero_copy_only=False)
    keep_row = (ncells > 0) | (pages > 0)
    if not keep_row.all():
        sel = np.repeat(keep_row, lens) & keep
        ncells = ncells[keep_row]
        keys, pages = keys[keep_row], pages[keep_row]
        cells, q, keep = cells[sel], q[sel], np.ones(int(sel.sum()), dtype=bool)
        new_off = np.concatenate(([0], np.cumsum(ncells)))
        return _tiles_table(keys, new_off, cells, q, pages)
    new_off = np.concatenate(([0], np.cumsum(ncells)))
    return _tiles_table(keys, new_off, cells[keep], q[keep], pages)


def tiles_to_dense(
    table: pa.Table, tile_px: int, resampling: str = "sum", level: int = 0,
    base: int = 2,
) -> dict:
    """Sparse tile rows → dict tile_key → dense float32 (G, G) grid.
    'average' divides the stored sums by base**(2*level) here (lossy
    float step kept OUT of the distributed aggregation for determinism);
    conv kernels are already normalized per level at merge time."""
    G = tile_px
    out = {}
    div = float(base ** (2 * level)) if resampling == "average" else 1.0
    keys = table["tile_key"].to_pylist()
    cells_col = table["cells"].to_pylist()
    counts_col = table["counts"].to_pylist()
    for k, cs, ws in zip(keys, cells_col, counts_col):
        g = np.zeros(G * G, dtype=np.float32)
        if cs:
            g[np.asarray(cs)] = np.asarray(ws, dtype=np.float32) / div
        out[k] = g.reshape(G, G)
    return out


def focal_scatter(
    batch: pa.Table, z: int, val_col: str = "pages",
    x_col: str = "x", y_col: str = "y",
) -> pa.Table:
    """3×3 focal (neighborhood) scatter over the z-level tile grid —
    the raster focal-sum / smoothing op expressed as a distributed
    scatter-gather: each (x, y, value) row emits one partial row to
    itself and its 8 grid neighbors; a downstream partial→final
    group-sum on (x, y) yields the focal sum at EVERY cell that
    receives mass (halo cells included). Neighbors falling outside
    [0, 2^z) are dropped (no wraparound). Sum is associative, so this
    runs correctly on pre-aggregated partials too. Vectorized tile +
    repeat — no Python per row."""
    n = len(batch)
    x = batch[x_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
    y = batch[y_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
    v = batch[val_col].combine_chunks().to_numpy(zero_copy_only=False)
    dx = np.array([-1, -1, -1, 0, 0, 0, 1, 1, 1], dtype=np.int64)
    dy = np.array([-1, 0, 1, -1, 0, 1, -1, 0, 1], dtype=np.int64)
    nx = np.repeat(x, 9) + np.tile(dx, n)
    ny = np.repeat(y, 9) + np.tile(dy, n)
    nv = np.repeat(v, 9)
    lim = np.int64(1) << np.int64(z)
    keep = (nx >= 0) & (nx < lim) & (ny >= 0) & (ny < lim)
    return pa.table(
        {
            x_col: pa.array(nx[keep], pa.int64()),
            y_col: pa.array(ny[keep], pa.int64()),
            val_col: pa.array(nv[keep]),
        }
    )
