"""``create`` — the distributed cog_translate analog (cogeo.py:75-467).

Pipeline shape (Ray-Data-first; no raw page row ever enters a shuffle):

1. planning on the driver (TilingSpec; optional one-column bounds pass)
2. base level: ``read_parquet(pruned columns)`` → ``map_batches``
   (extract/geocode/assign, stateless, zero-copy Arrow) →
   ``map_batches(density_partials)`` (≤1 partial row per tile per batch)
   → ``groupby(tile_key).map_groups(merge)`` → level parquet + marker
3. pyramid: per level, read the previous level (checkpointed parquet) →
   ``map_batches(pyramid_partials)`` → ``groupby.map_groups(merge)`` →
   level parquet + marker  (the overview build, cogeo.py:381-390)
4. manifest: per-level stats read back over PRUNED columns of the small
   tile tables + tile index sorted (z desc, y, x) — the IFD-ordered
   final copy analog (cogeo.py:442-467)

Every level directory is written to a temp dir and atomically renamed
(TemporaryRasterFile analog, cogeo.py:29-43); a rerun verifies each
level's done-marker against disk and skips completed levels
(checkpoint-resume with per-partition lineage).
"""

from __future__ import annotations

import os
import shutil
import time
from dataclasses import asdict
from typing import Dict, List, Optional, Sequence, Union

import numpy as np
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Max, Min, Sum

from rio_cogeo_ray import errors
from rio_cogeo_ray.functions import tms
from rio_cogeo_ray.functions.geocode import GeoSpec
from rio_cogeo_ray.pipelines.spec import TilingSpec, with_cover_from_bounds
from rio_cogeo_ray.stages import assign, rasterize
from rio_cogeo_ray.state import manifest as mani


def _read_input(
    src: Union[str, Sequence[str], rd.Dataset],
    columns: Optional[List[str]],
) -> rd.Dataset:
    if isinstance(src, rd.Dataset):
        return src
    return rd.read_parquet(src, columns=columns)


def _run_fingerprint(
    src: Union[str, Sequence[str], rd.Dataset],
    spec: TilingSpec,
    source: str,
    weight_col: Optional[str],
) -> Optional[str]:
    """Cheap identity of the RUN recorded in every level marker: the
    source corpus (file names + sizes) AND the spec/source/weight
    configuration. Resume only skips levels built from the same input
    with the same plan — resuming a sum-kernel output with a bilinear
    spec must rebuild, not silently relabel old tiles. None for
    in-memory Datasets (no stable input identity — check skipped)."""
    if isinstance(src, rd.Dataset):
        return None
    import hashlib
    import json as _json

    paths = [src] if isinstance(src, str) else list(src)
    items = []
    for p in paths:
        if os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                for f in sorted(files):
                    fp = os.path.join(root, f)
                    items.append((os.path.relpath(fp, p), os.path.getsize(fp)))
        elif os.path.exists(p):
            items.append((os.path.basename(p), os.path.getsize(p)))
    spec_sig = {
        **{k: v for k, v in asdict(spec).items() if k != "geocode"},
        "geocode_boxes": list(map(list, spec.geocode.boxes)),
        "geocode_invalid": spec.geocode.invalid_per_65536,
        "source": source,
        "weight_col": weight_col,
    }
    blob = _json.dumps([sorted(items), spec_sig], sort_keys=True, default=list)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def measure_bounds(
    src: Union[str, Sequence[str], rd.Dataset],
    spec: TilingSpec,
    source: str = "pages",
) -> tuple:
    """Mercator bounds of the corpus via a ONE-column scan (url/doc_id)
    + a tiny aggregate — the stats pass feeding web-optimized alignment
    (get_web_optimized_params input, utils.py:88-147)."""
    cols = {"pages": ["url"], "lonlat": ["lon", "lat"]}.get(source, ["doc_id"])
    ds = _read_input(src, cols)
    prepare = assign.make_prepare_fn(spec.geocode, spec.zoom, extract=False, source=source)
    prepared = ds.map_batches(prepare, batch_format="pyarrow")
    row = prepared.aggregate(Min("mx"), Max("mx"), Min("my"), Max("my"))
    return (row["min(mx)"], row["min(my)"], row["max(mx)"], row["max(my)"])


def _write_level(ds: rd.Dataset, out_dir: str, z: int, codec: Optional[str] = None) -> None:
    """Atomic level sink: write to tiles/.tmp-z={z}, rename into place.
    ``codec``: parquet compression (profile preset; None = default)."""
    final = mani.level_dir(out_dir, z)
    tmp = os.path.join(out_dir, "tiles", f".tmp-z={z}")
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(final, ignore_errors=True)
    os.makedirs(os.path.dirname(tmp), exist_ok=True)
    if codec:
        ds.write_parquet(tmp, compression=codec)
    else:
        ds.write_parquet(tmp)
    os.replace(tmp, final)


#: Below this many bytes of level parquet, manifest bookkeeping runs
#: driver-side with plain pyarrow (a Ray job's fixed overhead dominates);
#: above it, the same logic runs as a pruned Ray read + aggregate.
#: Env-tunable like the reference's IN_MEMORY_THRESHOLD
#: (rio_cogeo/cogeo.py:26).
_DRIVER_SIDE_BYTES = int(
    os.environ.get("RCR_IN_MEMORY_THRESHOLD", 64 * 1024 * 1024)
)


def _level_stats(out_dir: str, z: int, decimation: int) -> mani.LevelEntry:
    """Per-level manifest entry; stats from a PRUNED read of the (small)
    tile table, never from the raw corpus."""
    files = mani.scan_level_files(out_dir, z)
    total_bytes = sum(f.bytes for f in files)

    def _stats(t: pa.Table) -> pa.Table:
        ncells = t["cells"].combine_chunks()
        lens = int(np.sum(np.diff(ncells.offsets.to_numpy(zero_copy_only=False))))
        pages = int(np.sum(t["page_count"].combine_chunks().to_numpy(zero_copy_only=False)))
        return pa.table({"tiles": [len(t)], "pages": [pages], "ncells": [lens]})

    if total_bytes < _DRIVER_SIDE_BYTES:
        import pyarrow.parquet as pq

        t = pq.read_table(mani.level_dir(out_dir, z), columns=["page_count", "cells"])
        s = _stats(t)
        tiles, pages, ncells = (s[c][0].as_py() for c in ("tiles", "pages", "ncells"))
    else:
        ds = rd.read_parquet(mani.level_dir(out_dir, z), columns=["page_count", "cells"])
        agg = ds.map_batches(_stats, batch_format="pyarrow").aggregate(
            Sum("tiles"), Sum("pages"), Sum("ncells")
        )
        tiles = int(agg["sum(tiles)"] or 0)
        pages = int(agg["sum(pages)"] or 0)
        ncells = int(agg["sum(ncells)"] or 0)
    return mani.LevelEntry(
        z=z, decimation=decimation, tiles=tiles, pages=pages, cells=ncells,
        files=files,
    )


def read_level(out_dir: str, z: int, columns: Optional[List[str]] = None) -> rd.Dataset:
    return rd.read_parquet(mani.level_dir(out_dir, z), columns=columns)


def _write_level_table(
    t: pa.Table, out_dir: str, z: int, decimation: int, codec: Optional[str] = None
) -> mani.LevelEntry:
    """Driver-side level sink (small levels): one parquet file, atomic
    rename, stats straight from the in-memory table (no read-back)."""
    import pyarrow.parquet as pq

    final = mani.level_dir(out_dir, z)
    tmp = os.path.join(out_dir, "tiles", f".tmp-z={z}")
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(final, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(t, os.path.join(tmp, "part-0.parquet"),
                   compression=codec or "snappy")
    os.replace(tmp, final)
    cells_arr = t["cells"].combine_chunks()
    ncells = int(np.sum(np.diff(cells_arr.offsets.to_numpy(zero_copy_only=False))))
    pages = int(np.sum(t["page_count"].combine_chunks().to_numpy(zero_copy_only=False)))
    return mani.LevelEntry(
        z=z, decimation=decimation, tiles=t.num_rows, pages=pages, cells=ncells,
        files=mani.scan_level_files(out_dir, z),
    )


def create(
    src: Union[str, Sequence[str], rd.Dataset],
    out_dir: str,
    spec: TilingSpec,
    source: str = "pages",
    weight_col: Optional[str] = None,
    extract: bool = False,
    resume: bool = True,
    batch_size: int = 8192,
    n_buckets: int = 64,
    codec: Optional[str] = None,
    tags: Optional[Dict[str, str]] = None,
    band_tags: Optional[Dict[str, Dict[str, str]]] = None,
    band_scales: Optional[Dict[str, float]] = None,
    band_offsets: Optional[Dict[str, float]] = None,
    colormap: Optional[Dict] = None,
) -> mani.Manifest:
    """Build the full tile pyramid for a corpus. Returns the manifest.

    ``source``: 'pages' (url-hash geocode over the input_hint shape) or
    'documents' (SQL-reproducible id geocode over the driver testdata
    shape). ``extract`` additionally runs the html→text extractor in the
    prepare stage (the byte-identical-text invariant path) — off by
    default because the density pipeline only needs ``url``.
    ``weight_col``: optional integer column accumulated into the grids
    instead of page counts (band-value analog).
    ``band_tags`` / ``band_scales`` / ``band_offsets``: per-band metadata
    forwarded verbatim into the manifest and surfaced by info() — the
    reference's band tag + scales/offsets forwarding
    (rio_cogeo/cogeo.py:395-437). Bands: 'count', plus ``weight_col``.
    """
    if spec.aligned_levels and spec.tile_cover is None:
        bounds = measure_bounds(src, spec, source=source)
        spec = with_cover_from_bounds(spec, bounds)

    os.makedirs(out_dir, exist_ok=True)
    step = spec.zoom_step
    zooms = spec.zooms  # base first
    src_fp = _run_fingerprint(src, spec, source, weight_col)
    levels_done: Dict[int, mani.LevelEntry] = {}
    if resume:
        for z in zooms:
            try:
                entry = mani.verify_level_marker(out_dir, z, src_fingerprint=src_fp)
            except errors.ResumeMismatch:
                entry = None
            if entry is None:
                # rebuild this level AND every coarser one: a coarser
                # level derived from a rebuilt finer level is stale even
                # if its own marker still matches its files
                break
            levels_done[z] = entry

    # ---- base level ------------------------------------------------------
    base_z = spec.zoom
    total_rows = None
    if base_z not in levels_done:
        _t_level = time.monotonic()
        id_cols = {"pages": ["url"], "lonlat": ["lon", "lat"]}.get(source, ["doc_id"])
        cols = id_cols + ([weight_col] if weight_col else [])
        if extract and source == "pages":
            cols += ["html"]
        ds = _read_input(src, cols)
        total_rows = ds.count()
        prepare = assign.make_prepare_fn(
            spec.geocode, base_z, extract=extract, source=source,
            tms_def=spec.tms,
        )
        prepared = ds.map_batches(prepare, batch_format="pyarrow", batch_size=batch_size)
        if spec.tile_cover is not None:
            min_x, min_y, max_x, max_y = spec.tile_cover

            def _clip(t: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                keep = pc.and_(
                    pc.and_(pc.greater_equal(t["x"], min_x), pc.less_equal(t["x"], max_x)),
                    pc.and_(pc.greater_equal(t["y"], min_y), pc.less_equal(t["y"], max_y)),
                )
                return t.filter(pc.fill_null(keep, False))

            prepared = prepared.map_batches(_clip, batch_format="pyarrow")
        # wide columns (html) are dropped by prepare; rebatch larger so
        # each partial covers many rows per tile even at deep zooms.
        # Floor 16384, not 131072: Ray fuses this map with the upstream
        # prepare chain and the LAST batch_size sets task granularity
        # for the whole fused operator — 131072 caps a 600k-row corpus
        # at ~5 tasks (starving a 32-CPU node), while at cluster scale
        # tasks are abundant either way and the extra partial rows
        # (≤ distinct-tiles per batch) collapse in the bucket merge.
        partials = prepared.map_batches(
            lambda t: rasterize.density_partials(
                t, spec.tile_px, weight_col, tms_def=spec.tms
            ),
            batch_format="pyarrow",
            batch_size=max(batch_size, 16384),
        )
        merged = rasterize.merge_sparse_tiles(
            partials, spec.resampling, level=0, base=spec.decimation_base,
            tile_px=spec.tile_px, n_buckets=n_buckets,
        )
        _write_level(merged, out_dir, base_z, codec=codec)
        entry = _level_stats(out_dir, base_z, decimation=1)
        entry.src_fingerprint = src_fp
        entry.build_wall_s = round(time.monotonic() - _t_level, 3)
        if entry.build_wall_s > 0:
            entry.pages_per_sec = round(entry.pages / entry.build_wall_s, 1)
        mani.write_level_marker(out_dir, entry)
        levels_done[base_z] = entry

    # ---- pyramid ---------------------------------------------------------
    # Levels shrink geometrically; once a level fits the driver-side
    # threshold we finish the remaining ladder locally with the SAME
    # vectorized kernels (bit-identical results — _merge_bucket_table
    # over the whole table is the n_buckets=1 case). At cluster scale the
    # distributed path runs until the data is small; paying a full
    # all-to-all per near-empty level is pure fixed overhead.
    local_table: Optional[pa.Table] = None
    base_b = spec.decimation_base
    # conv and rms kernels aggregate raw sums and normalize post-merge;
    # their merge path is the plain 'sum' combiner.
    merge_kernel = "sum" if (spec.is_conv or spec.is_rms) else spec.resampling
    for j, z in enumerate(zooms[1:], start=1):
        if z in levels_done:
            local_table = None  # resume hole: re-read below if needed
            continue
        _t_level = time.monotonic()
        cover_j = (
            tuple(c >> (j * step) for c in spec.tile_cover)
            if (spec.is_conv and spec.tile_cover is not None)
            else None
        )

        # per-level grids (--overview-blocksize analog): overview levels
        # store ob² cells per tile; the pixel decimation f is base·G/ob
        # on the first ladder step and plain `base` below it (child and
        # parent then share ob). For the default uniform grid, child_px
        # == parent_px == G and f == base — bit-identical to before.
        ob = spec.overview_blocksize
        child_px = spec.tile_px if (ob is None or j == 1) else ob
        parent_px = ob if ob is not None else spec.tile_px
        pix_f = (base_b * child_px) // parent_px

        def _partials_fn(t: pa.Table, _j=j, _cov=cover_j, _cpx=child_px, _ppx=parent_px) -> pa.Table:
            if spec.is_conv:
                return rasterize.pyramid_partials_conv(
                    t, spec.tile_px, spec.resampling, base_b,
                    spec.level_dim(_j), _cov,
                )
            if spec.is_rms:
                # square the child level's finalized values, then the
                # ladder step is the ordinary additive pre-sum
                t = rasterize.square_tile_values(t)
                return rasterize.pyramid_partials(t, spec.tile_px, "sum", base_b)
            return rasterize.pyramid_partials(
                t, _cpx, spec.resampling, base_b, parent_px=_ppx
            )

        if local_table is None:
            prev = levels_done[z + step]
            if sum(f.bytes for f in prev.files) < _DRIVER_SIDE_BYTES:
                import pyarrow.parquet as pq

                local_table = pq.read_table(mani.level_dir(out_dir, z + step))
        if local_table is not None:
            partials = _partials_fn(local_table)
            merged_t = rasterize._merge_bucket_table(
                partials, merge_kernel, j, pix_f, parent_px
            )
            if spec.is_conv:
                merged_t = rasterize.finalize_conv_tiles(
                    merged_t, spec.resampling, base_b
                )
            elif spec.is_rms:
                merged_t = rasterize.finalize_rms_tiles(merged_t, base_b)
            entry = _write_level_table(
                merged_t, out_dir, z, decimation=base_b**j, codec=codec,
            )
            local_table = merged_t
        else:
            child = read_level(out_dir, z + step)
            partials = child.map_batches(_partials_fn, batch_format="pyarrow")
            merged = rasterize.merge_sparse_tiles(
                partials, merge_kernel, level=j, base=pix_f,
                tile_px=parent_px, n_buckets=n_buckets,
            )
            if spec.is_conv:
                merged = merged.map_batches(
                    lambda t: rasterize.finalize_conv_tiles(t, spec.resampling, base_b),
                    batch_format="pyarrow",
                )
            elif spec.is_rms:
                merged = merged.map_batches(
                    lambda t: rasterize.finalize_rms_tiles(t, base_b),
                    batch_format="pyarrow",
                )
            _write_level(merged, out_dir, z, codec=codec)
            entry = _level_stats(out_dir, z, decimation=base_b**j)
        entry.src_fingerprint = src_fp
        entry.build_wall_s = round(time.monotonic() - _t_level, 3)
        if entry.build_wall_s > 0:
            entry.pages_per_sec = round(entry.pages / entry.build_wall_s, 1)
        mani.write_level_marker(out_dir, entry)
        levels_done[z] = entry

    # ---- manifest (IFD analog: base level first) -------------------------
    base_pages = levels_done[base_z].pages
    if total_rows is None:
        count_cols = {"pages": ["url"], "lonlat": ["lon"]}.get(source, ["doc_id"])
        src_for_count = _read_input(src, count_cols)
        total_rows = src_for_count.count()
    m = mani.Manifest(
        spec={
            **{
                k: v
                for k, v in asdict(spec).items()
                if k not in ("geocode",)
            },
            "geocode_boxes": list(map(list, spec.geocode.boxes)),
            "geocode_invalid_per_65536": spec.geocode.invalid_per_65536,
            "source": source,
            "weight_col": weight_col,
        },
        levels=[levels_done[z] for z in zooms],
        tags=dict(tags or {}),
        band_tags=dict(band_tags or {}),
        band_scales=dict(band_scales or {}),
        band_offsets=dict(band_offsets or {}),
        colormap={str(k): str(v) for k, v in (colormap or {}).items()},
        # 'mask' counts geocode-invalid pages in the manifest; 'drop'
        # silently discards them — they leave no manifest trace, the
        # no-nodata-tracking analog (reference NodataParamType
        # nil/none tokens, scripts/cli.py:46-63)
        total_pages=int(total_rows) if spec.invalid_policy == "mask" else base_pages,
        invalid_pages=(int(total_rows) - base_pages)
        if spec.invalid_policy == "mask"
        else 0,
    )
    mani.write_manifest(out_dir, m)
    _write_tile_index(out_dir, m)
    return m


def _write_tile_index(out_dir: str, m: mani.Manifest) -> None:
    """Tile index sorted (z desc, y, x) — the ordered-layout analog the
    validator asserts (cogeo.py:586-679). Uses a Ray sort over the small
    per-tile rows (grids excluded)."""
    zooms = [lv.z for lv in m.levels]
    cols = ["tile_key", "z", "x", "y", "page_count"]
    idx_dir = os.path.join(mani.manifest_dir(out_dir), "tiles_index")
    tmp = idx_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(idx_dir, ignore_errors=True)
    total_bytes = sum(f.bytes for lv in m.levels for f in lv.files)
    if total_bytes < _DRIVER_SIDE_BYTES:
        import pyarrow.parquet as pq

        t = pa.concat_tables(
            [pq.read_table(mani.level_dir(out_dir, z), columns=cols) for z in zooms]
        )
        t = t.sort_by([("z", "descending"), ("y", "ascending"), ("x", "ascending")])
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(t, os.path.join(tmp, "index.parquet"))
    else:
        parts = [read_level(out_dir, z, columns=cols) for z in zooms]
        ds = parts[0]
        for p in parts[1:]:
            ds = ds.union(p)
        ds = ds.sort(["z", "y", "x"], descending=[True, False, False])
        ds.write_parquet(tmp)
    os.replace(tmp, idx_dir)


def find_tile(out_dir: str, z: int, x: int, y: int) -> Optional[pa.Table]:
    """Locate one tile's row in a pyramid output — the get_data_offset
    analog (cogeo.py:706-727): returns the single-row table (sparse grid
    + counts) or None when the tile is absent/sparse (the reference
    returns offset 0 for sparse tiles)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    key = int(tms.pack_tile_key(z, x, y))
    d = mani.level_dir(out_dir, z)
    if not os.path.isdir(d):
        return None
    t = pq.read_table(d, filters=[("tile_key", "==", key)])
    return t if t.num_rows else None


def export_dense(
    out_dir: str,
    z: int,
    lossy: bool = False,
    dtype: Optional[str] = None,
):
    """Yield (tile_key, dense G×G grid) for one level — the raster-side
    export. ``lossy`` quantizes counts into uint8 with per-tile max
    scaling (the jpeg/webp/lerc profile analog; the stored pyramid stays
    exact int64 — only this export loses precision). ``dtype`` overrides
    the output data type (the reference's cog_translate ``dtype`` param,
    cogeo.py:120-122): default float32, or any numpy dtype name —
    e.g. 'float64' for exactness headroom, 'int64' to truncate back to
    integer counts."""
    import pyarrow.parquet as pq

    from rio_cogeo_ray.stages.rasterize import tiles_to_dense

    m = mani.load_manifest(out_dir)
    spec = m.spec
    G = int(spec["tile_px"])
    b = int(spec.get("decimation_base", 2))
    level_j = (int(spec["zoom"]) - z) // tms.ladder_step(b)
    t = pq.read_table(mani.level_dir(out_dir, z))
    dense = tiles_to_dense(t, G, spec.get("resampling", "sum"), level_j, base=b)
    for key, grid in dense.items():
        if lossy:
            mx = float(grid.max())
            if mx > 0:
                grid = np.round(grid * (255.0 / mx)).astype(np.uint8)
            else:
                grid = grid.astype(np.uint8)
        elif dtype is not None:
            grid = grid.astype(np.dtype(dtype))
        yield key, grid


#: File-metadata keys of a single-file export (export_cog).
COG_MANIFEST_KEY = b"rcr:manifest"
COG_LAYOUT_KEY = b"rcr:layout"
COG_LAYOUT = b"z_asc;y,x;level-aligned-row-groups"


def export_cog(out_dir: str, dst_path: str, row_group_tiles: int = 4096) -> str:
    """Single-FILE export of the whole pyramid — the ``use_cog_driver``
    alternate-writer analog (rio_cogeo/cogeo.py:442-464: GDAL's COG
    driver emits one file, headers first, overview data before base
    data). Engine layout, same doctrine re-expressed for parquet:

    - the manifest JSON rides in the parquet FILE metadata (the
      header-first / ghost-area analog — a reader learns the full level
      chain without touching row data);
    - levels are written COARSEST FIRST (z ascending) and sorted (y, x)
      within each level, so a range reader streaming from byte 0
      renders previews before the base level arrives;
    - each level starts its own row group(s) (``row_group_tiles`` rows
      max), so :func:`read_cog_level` prunes to one level via row-group
      z statistics — the HTTP-range-request analog.

    Scale: each level streams through the writer in sorted batches (a
    Ray sort per level, never a whole-pyramid materialization); the
    single-file sink is serial by the user's own choice, exactly like
    the reference's one-COG output. Atomic: writes ``dst_path + '.tmp'``
    then renames."""
    import json

    import pyarrow.parquet as pq

    m = mani.load_manifest(out_dir)
    zooms = sorted(lv.z for lv in m.levels)
    tmp = dst_path + ".tmp"
    if os.path.exists(tmp):
        os.remove(tmp)
    os.makedirs(os.path.dirname(os.path.abspath(dst_path)), exist_ok=True)
    writer = None
    try:
        for z in zooms:
            lv = next(l for l in m.levels if l.z == z)
            lv_bytes = sum(f.bytes for f in lv.files)
            if lv_bytes < _DRIVER_SIDE_BYTES:
                t = pq.read_table(mani.level_dir(out_dir, z)).sort_by(
                    [("y", "ascending"), ("x", "ascending")]
                )
                batches = [t]
            else:
                ds = read_level(out_dir, z).sort(["y", "x"])
                # iter_batches(batch_format="pyarrow") yields Tables on
                # Ray 2.49 (RecordBatch on some older versions) — accept both
                batches = (
                    b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
                    for b in ds.iter_batches(
                        batch_format="pyarrow", batch_size=row_group_tiles
                    )
                )
            for t in batches:
                if writer is None:
                    arrow_schema = t.schema.with_metadata(
                        {
                            COG_MANIFEST_KEY: json.dumps(
                                asdict_manifest(m), sort_keys=True
                            ).encode(),
                            COG_LAYOUT_KEY: COG_LAYOUT,
                        }
                    )
                    writer = pq.ParquetWriter(tmp, arrow_schema)
                writer.write_table(
                    t.replace_schema_metadata(arrow_schema.metadata),
                    row_group_size=row_group_tiles,
                )
    finally:
        if writer is not None:
            writer.close()
    os.replace(tmp, dst_path)
    return dst_path


def asdict_manifest(m: mani.Manifest) -> dict:
    from dataclasses import asdict

    return asdict(m)


def read_cog_level(
    dst_path: str, z: int, columns: Optional[List[str]] = None
) -> pa.Table:
    """Read ONE level out of a single-file export touching only its row
    groups (pruned via the z column's row-group statistics — the
    range-read analog)."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(dst_path)
    zi = pf.schema_arrow.names.index("z")
    keep = []
    for rg in range(pf.metadata.num_row_groups):
        st = pf.metadata.row_group(rg).column(zi).statistics
        if st is None or (st.min <= z <= st.max):
            keep.append(rg)
    if not keep:
        return pf.schema_arrow.empty_table().select(
            columns or pf.schema_arrow.names
        )
    t = pf.read_row_groups(keep, columns=columns and list(set(columns) | {"z"}))
    t = t.filter(pa.compute.equal(t["z"], z))
    return t.select(columns) if columns else t


def spec_from_manifest(m: mani.Manifest) -> TilingSpec:
    """Reconstruct the TilingSpec an output was built with (manifest
    stores the full plan, geocode included)."""
    d = m.spec
    return TilingSpec(
        zoom=int(d["zoom"]),
        min_zoom=int(d["min_zoom"]),
        aligned_levels=int(d.get("aligned_levels", 0)),
        tile_px=int(d["tile_px"]),
        decimation_base=int(d.get("decimation_base", 2)),
        resampling=d.get("resampling", "sum"),
        geocode=GeoSpec(
            boxes=[tuple(b) for b in d.get("geocode_boxes", [])]
            or GeoSpec().boxes,
            invalid_per_65536=int(d.get("geocode_invalid_per_65536", 0)),
        ),
        invalid_policy=d.get("invalid_policy", "mask"),
        tile_cover=tuple(d["tile_cover"]) if d.get("tile_cover") else None,
        tms=d.get("tms"),
        overview_blocksize=d.get("overview_blocksize"),
    )


def append(
    src_new: Union[str, Sequence[str], rd.Dataset],
    out_dir: str,
    batch_size: int = 8192,
    n_buckets: int = 64,
    codec: Optional[str] = None,
) -> mani.Manifest:
    """Incrementally ingest NEW pages into an existing pyramid — the
    daily-crawl delta path. Valid only for ADDITIVE kernels
    (sum/average): existing base tiles are themselves valid partial
    rows, so the delta merge is ``merge(existing ∪ new_partials)`` —
    no reprocessing of the old corpus — and coarser levels rebuild
    from the merged base (geometrically cheap). The result is
    BIT-IDENTICAL to a from-scratch create() over the union corpus
    (pinned by test_append_equals_full_create).

    Markers are rewritten with a None source fingerprint (the output no
    longer corresponds to any single input), so a later create(resume=
    True) over either corpus alone will rebuild rather than resume.
    """
    m = mani.load_manifest(out_dir)
    spec = spec_from_manifest(m)
    if spec.resampling not in ("sum", "average"):
        raise errors.IncompatibleOptions(
            f"append requires an additive kernel (sum/average), the "
            f"output was built with {spec.resampling!r}"
        )
    source = m.spec.get("source", "pages")
    weight_col = m.spec.get("weight_col")
    step = spec.zoom_step
    base_z = spec.zoom

    id_cols = {"pages": ["url"], "lonlat": ["lon", "lat"]}.get(source, ["doc_id"])
    cols = id_cols + ([weight_col] if weight_col else [])
    ds = _read_input(src_new, cols)
    new_rows = ds.count()
    prepare = assign.make_prepare_fn(
        spec.geocode, base_z, extract=False, source=source, tms_def=spec.tms
    )
    prepared = ds.map_batches(prepare, batch_format="pyarrow", batch_size=batch_size)
    if spec.tile_cover is not None:
        min_x, min_y, max_x, max_y = spec.tile_cover

        def _clip(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            keep = pc.and_(
                pc.and_(pc.greater_equal(t["x"], min_x), pc.less_equal(t["x"], max_x)),
                pc.and_(pc.greater_equal(t["y"], min_y), pc.less_equal(t["y"], max_y)),
            )
            return t.filter(pc.fill_null(keep, False))

        prepared = prepared.map_batches(_clip, batch_format="pyarrow")
    new_partials = prepared.map_batches(
        lambda t: rasterize.density_partials(
            t, spec.tile_px, weight_col, tms_def=spec.tms
        ),
        batch_format="pyarrow",
        # floor 16384: see create() — the fused chain's task granularity
        # follows this batch_size; 131072 starves a single node
        batch_size=max(batch_size, 16384),
    )
    existing = read_level(out_dir, base_z)  # final tiles ARE partials
    merged = rasterize.merge_sparse_tiles(
        existing.union(new_partials), spec.resampling, level=0,
        base=spec.decimation_base, tile_px=spec.tile_px, n_buckets=n_buckets,
    )
    # the pipeline READS the current base level while writing the new
    # one: stream into a temp dir first, swap only after the read is
    # fully consumed (unlike _write_level, which pre-deletes the target)
    final = mani.level_dir(out_dir, base_z)
    tmp = os.path.join(out_dir, "tiles", f".tmp-append-z={base_z}")
    shutil.rmtree(tmp, ignore_errors=True)
    if codec:
        merged.write_parquet(tmp, compression=codec)
    else:
        merged.write_parquet(tmp)
    shutil.rmtree(final, ignore_errors=True)
    os.replace(tmp, final)
    entry = _level_stats(out_dir, base_z, decimation=1)
    mani.write_level_marker(out_dir, entry)

    # pyramid rebuild from the merged base (same path as create())
    local_table: Optional[pa.Table] = None
    base_b = spec.decimation_base
    zooms = spec.zooms
    levels_done = {base_z: entry}
    for j, z in enumerate(zooms[1:], start=1):
        # per-level grids mirror create(): overview levels may run
        # --overview-blocksize's grid (append kernels are sum/average,
        # so only the additive path needs the f/parent_px threading)
        ob = spec.overview_blocksize
        child_px = spec.tile_px if (ob is None or j == 1) else ob
        parent_px = ob if ob is not None else spec.tile_px
        pix_f = (base_b * child_px) // parent_px
        if local_table is None:
            prev = levels_done[z + step]
            if sum(f.bytes for f in prev.files) < _DRIVER_SIDE_BYTES:
                import pyarrow.parquet as pq

                local_table = pq.read_table(mani.level_dir(out_dir, z + step))
        if local_table is not None:
            partials = rasterize.pyramid_partials(
                local_table, child_px, spec.resampling, base_b,
                parent_px=parent_px,
            )
            merged_t = rasterize._merge_bucket_table(
                partials, spec.resampling, j, pix_f, parent_px
            )
            entry = _write_level_table(
                merged_t, out_dir, z, decimation=base_b**j, codec=codec
            )
            local_table = merged_t
        else:
            child = read_level(out_dir, z + step)
            partials = child.map_batches(
                lambda t, _cpx=child_px, _ppx=parent_px: rasterize.pyramid_partials(
                    t, _cpx, spec.resampling, base_b, parent_px=_ppx
                ),
                batch_format="pyarrow",
            )
            merged_l = rasterize.merge_sparse_tiles(
                partials, spec.resampling, level=j, base=pix_f,
                tile_px=parent_px, n_buckets=n_buckets,
            )
            _write_level(merged_l, out_dir, z, codec=codec)
            entry = _level_stats(out_dir, z, decimation=base_b**j)
        mani.write_level_marker(out_dir, entry)
        levels_done[z] = entry

    base_pages = levels_done[base_z].pages
    policy = m.spec.get("invalid_policy", "mask")
    total = int(m.total_pages) + int(new_rows)
    m2 = mani.Manifest(
        spec=m.spec,
        levels=[levels_done[z] for z in zooms],
        tags=m.tags,
        band_tags=m.band_tags,
        band_scales=m.band_scales,
        band_offsets=m.band_offsets,
        colormap=m.colormap,
        total_pages=total if policy == "mask" else base_pages,
        invalid_pages=(total - base_pages) if policy == "mask" else 0,
    )
    mani.write_manifest(out_dir, m2)
    _write_tile_index(out_dir, m2)
    return m2
