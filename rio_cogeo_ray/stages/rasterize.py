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
#: 4**level at dense export; 'nearest' keeps only the top-left subpixel.
_SUMMABLE = ("sum", "average", "nearest")


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
) -> pa.Table:
    """Prepared page batch → partial tile rows (≤1 per touched tile).

    Pixel rule: ``px = clip(floor((mx - tile_west) / (span/G)), 0, G-1)``
    (clipping absorbs the ulp-level disagreement a point exactly on a
    boundary could have between the tile floor and the pixel floor).
    ``weight_col`` must be an integer column; default weight is 1 page.
    """
    valid = batch["geo_valid"].combine_chunks().to_numpy(zero_copy_only=False)
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
    span = tms.tile_span(z)
    pspan = span / G
    west = x * span - tms.ORIGIN_SHIFT
    north = tms.ORIGIN_SHIFT - y * span
    px = np.clip(np.floor((mx - west) / pspan), 0, G - 1).astype(np.int64)
    py = np.clip(np.floor((north - my) / pspan), 0, G - 1).astype(np.int64)
    cell = (py * G + px).astype(np.int64)
    if weight_col is not None:
        w = batch[weight_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        w = np.ones(len(batch), dtype=np.int64)

    u_keys, inv = np.unique(key, return_inverse=True)
    u_t, u_c, sums, tile_ncells = _aggregate_sparse(inv, cell, w, len(u_keys))
    offsets = np.concatenate(([0], np.cumsum(tile_ncells)))
    page_counts = np.bincount(inv, minlength=len(u_keys)).astype(np.int64)
    return _tiles_table(u_keys, offsets, u_c, sums, page_counts)


def merge_tile_group(
    group: pa.Table, resampling: str = "sum", level: int = 0, step: int = 1
) -> pa.Table:
    """Final combiner for ``groupby(tile_key).map_groups``: merge the
    partial sparse grids of ONE tile into its canonical row (cells sorted
    ascending). Int64 addition → order-independent, bit-deterministic.

    For the non-distributive 'mode' kernel at pyramid levels the partial
    cells are expanded (cell * 4**step + subpixel); the merge resolves
    the mode over each pixel's ≤4**step subpixel values (ties → smallest
    value; empty subpixels count as 0, GDAL-mode analog of
    cogeo.py:48-60).
    """
    key = group["tile_key"][0].as_py()
    cells_arr = group["cells"].combine_chunks()
    counts_arr = group["counts"].combine_chunks()
    cells = cells_arr.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    counts = counts_arr.flatten().to_numpy(zero_copy_only=False)
    page_count = int(
        np.sum(group["page_count"].combine_chunks().to_numpy(zero_copy_only=False))
    )
    if len(cells) == 0:
        # a parent whose child pixels all dropped (nearest/mode) still
        # exists as a tile row with an empty grid (sparse-tile analog)
        u_c = np.zeros(0, dtype=np.int64)
        sums = np.zeros(0, dtype=np.int64)
    elif resampling == "mode" and level > 0:
        nsub2 = (1 << step) ** 2
        # cells are (pixel*nsub2 + subpix); each (pixel, subpix) unique.
        pix = cells // nsub2
        order = np.lexsort((counts, pix))
        pix, vals = pix[order], counts[order]
        starts = np.flatnonzero(np.concatenate(([True], pix[1:] != pix[:-1])))
        ends = np.concatenate((starts[1:], [len(pix)]))
        out_c, out_v = [], []
        for s, e in zip(starts, ends):
            v = vals[s:e]
            nzero = nsub2 - (e - s)
            uv, uc = np.unique(v, return_counts=True)
            best = int(np.argmax(uc))  # ties → smallest value (uv sorted)
            if nzero >= uc[best]:
                continue  # mode is 0 (empty) → sparse omit
            out_c.append(int(pix[s]))
            out_v.append(int(uv[best]))
        u_c = np.array(out_c, dtype=np.int64)
        sums = np.array(out_v, dtype=np.int64)
    else:
        order = np.argsort(cells, kind="stable")
        c = cells[order]
        w = counts[order]
        starts = np.flatnonzero(np.concatenate(([True], c[1:] != c[:-1])))
        u_c = c[starts]
        sums = np.add.reduceat(w, starts) if len(starts) else np.zeros(0, np.int64)
    offsets = np.array([0, len(u_c)], dtype=np.int64)
    return _tiles_table(
        np.array([key], dtype=np.int64), offsets, u_c, sums,
        np.array([page_count], dtype=np.int64),
    )


def _merge_bucket_table(
    group: pa.Table, resampling: str, level: int, step: int, tile_px: int
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
        nsub2 = (1 << step) ** 2
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
    step: int = 1,
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
            g.drop_columns(["__bucket"]), resampling, level, step, tile_px
        ),
        batch_format="pyarrow",
    )


def pyramid_partials(
    batch: pa.Table, tile_px: int, resampling: str = "sum", step: int = 1
) -> pa.Table:
    """Final tile rows at level z → partial parent rows at z-step.

    One pyramid level decimates by ``2**step`` (decimation_base =
    2**step; cogeo.py:389 — the reference allows any base ≥ 2, but TMS
    zoom grids are power-of-two, so non-power-of-two bases are rejected
    at plan time). Child pixel (x*G+px, y*G+py) lands in parent pixel
    ((gx >> step) % G, (gy >> step) % G). Kernels: sum/average pre-sum;
    nearest keeps the top-left child pixel of each block; mode defers to
    the merge via subpixel-expanded cells.
    """
    if len(batch) == 0:
        return TILE_SCHEMA.empty_table()
    G = tile_px
    mask = (1 << step) - 1
    key = batch["tile_key"].combine_chunks().to_numpy(zero_copy_only=False)
    x = batch["x"].combine_chunks().to_numpy(zero_copy_only=False)
    y = batch["y"].combine_chunks().to_numpy(zero_copy_only=False)
    pc_counts = batch["page_count"].combine_chunks().to_numpy(zero_copy_only=False)
    cells_list = batch["cells"].combine_chunks()
    counts_list = batch["counts"].combine_chunks()
    lens = np.diff(cells_list.offsets.to_numpy(zero_copy_only=False))
    row_idx = np.repeat(np.arange(len(batch), dtype=np.int64), lens)
    cells = cells_list.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    vals = counts_list.flatten().to_numpy(zero_copy_only=False)

    px = cells % G
    py = cells // G
    # position within the parent tile's G×G grid (G is a power of two and
    # G >= 2**step, so x*G contributes nothing mod 2**step)
    ppx = ((x[row_idx] & mask) * G + px) >> step
    ppy = ((y[row_idx] & mask) * G + py) >> step
    pcell = ppy * G + ppx

    parent_key = tms.parent_tile_key(key, levels=step)
    pk_rows = parent_key[row_idx]

    if resampling == "nearest":
        keep = ((px & mask) == 0) & ((py & mask) == 0)
        pk_rows, pcell, vals = pk_rows[keep], pcell[keep], vals[keep]
    elif resampling == "mode":
        nsub = 1 << step
        subpix = (py & mask) * nsub + (px & mask)
        pcell = pcell * (nsub * nsub) + subpix  # unique per (pixel, subpix)

    u_keys, inv = np.unique(pk_rows, return_inverse=True)
    u_t, u_c, sums, tile_ncells = _aggregate_sparse(inv, pcell, vals, len(u_keys))
    offsets = np.concatenate(([0], np.cumsum(tile_ncells)))
    # parent page_count = sum of child page counts (regardless of kernel)
    upk, pinv = np.unique(parent_key, return_inverse=True)
    pages = np.bincount(pinv, weights=pc_counts.astype(np.float64)).astype(np.int64)
    # align: upk == u_keys unless a parent got zero cells (possible under
    # nearest/mode when all child pixels drop) — reindex onto upk.
    if len(u_keys) != len(upk) or not np.array_equal(u_keys, upk):
        full_off = np.zeros(len(upk) + 1, dtype=np.int64)
        pos = np.searchsorted(upk, u_keys)
        counts_per = np.diff(offsets)
        ncells_full = np.zeros(len(upk), dtype=np.int64)
        ncells_full[pos] = counts_per
        full_off[1:] = np.cumsum(ncells_full)
        return _tiles_table(upk, full_off, u_c, sums, pages)
    return _tiles_table(u_keys, offsets, u_c, sums, pages)


def tiles_to_dense(
    table: pa.Table, tile_px: int, resampling: str = "sum", level: int = 0
) -> dict:
    """Sparse tile rows → dict tile_key → dense float32 (G, G) grid.
    'average' divides the stored sums by 4**level here (lossy float step
    kept OUT of the distributed aggregation for determinism)."""
    G = tile_px
    out = {}
    div = float(4**level) if resampling == "average" else 1.0
    keys = table["tile_key"].to_pylist()
    cells_col = table["cells"].to_pylist()
    counts_col = table["counts"].to_pylist()
    for k, cs, ws in zip(keys, cells_col, counts_col):
        g = np.zeros(G * G, dtype=np.float32)
        if cs:
            g[np.asarray(cs)] = np.asarray(ws, dtype=np.float32) / div
        out[k] = g.reshape(G, G)
    return out
