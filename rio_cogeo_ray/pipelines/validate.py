"""``validate`` — structural validation of a tile-pyramid output.

The engine analog of cog_validate (rio_cogeo/cogeo.py:470-703): a
single pass over the output's manifest + tile index (small metadata,
like the reference's tag/IFD reads — no grid payload is touched except
optional spot checks), returning ``(is_valid, errors, warnings)`` with
the same strict-mode semantics (strict ⇒ warnings are errors,
cogeo.py:701).

Check → reference-analog map:

- manifest present/parseable            → "is a GTiff" (cogeo.py:513-519)
- no unlisted files under tiles/        → external .ovr ban (cogeo.py:521-524)
- level zs strictly decreasing, base first → IFD offset chain increasing
  main→smallest (cogeo.py:586-608)
- decimations == base**j, each >1, ascending → overview checks
  (cogeo.py:573-584)
- ladder depth ≥ expected for the cover → "image has overviews"
  recommendation warning (cogeo.py:533-537)
- extent spans >1 tile at base zoom     → tiled-ness check
  (cogeo.py:526-531): base level must actually be tile-partitioned
- tile index sorted (z desc, y, x), keys unique → data-block offset
  ordering (cogeo.py:610-679)
- cells within [0, G²), counts > 0      → block structure sanity
- page conservation across levels (sum/average kernels) → decimation
  correctness
- manifest stats == index stats         → ghost-header consistency
  (cogeo.py:563-571 analog: metadata must match the bytes on disk)
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np
import pyarrow.parquet as pq

from rio_cogeo_ray.functions import tms
from rio_cogeo_ray.state import manifest as mani


def _index_table(out_dir: str):
    p = os.path.join(mani.manifest_dir(out_dir), "tiles_index")
    if not os.path.isdir(p):
        return None
    return pq.read_table(p)


def validate(
    out_dir: str, strict: bool = False, spot_check: bool = True
) -> Tuple[bool, List[str], List[str]]:
    errors: List[str] = []
    warnings: List[str] = []

    try:
        m = mani.load_manifest(out_dir)
    except Exception as e:  # noqa: BLE001 - any load failure = not an output
        return False, [f"The following is not a rio_cogeo_ray output: {e}"], []

    spec = m.spec
    base = spec.get("zoom")
    decim_base = int(spec.get("decimation_base", 2))
    step = tms.ladder_step(decim_base)

    # ---- level chain (IFD order analog) ---------------------------------
    zs = [lv.z for lv in m.levels]
    if not zs:
        errors.append("manifest lists no levels")
        return False, errors, warnings
    if zs[0] != base:
        errors.append(f"base level first expected z={base}, manifest starts at z={zs[0]}")
    if any(a - b != step for a, b in zip(zs[:-1], zs[1:])):
        errors.append(f"level zooms not strictly decreasing by {step}: {zs}")

    decims = [lv.decimation for lv in m.levels]
    expect = [int(spec.get("decimation_base", 2)) ** j for j in range(len(zs))]
    if decims != expect:
        errors.append(f"decimations {decims} != expected ladder {expect}")
    if any(d <= 1 for d in decims[1:]):
        # cogeo.py:576-584: each overview decimation must be > 1
        errors.append(f"overview decimations must be > 1: {decims[1:]}")
    if decims[1:] != sorted(decims[1:]):
        # cogeo.py:573-574: overviews sorted ascending
        errors.append(f"decimations not sorted: {decims[1:]}")

    # ---- files on disk == manifest (external-overview ban) --------------
    for lv in m.levels:
        on_disk = {f.path for f in mani.scan_level_files(out_dir, lv.z)}
        listed = {f.path for f in lv.files}
        extra = on_disk - listed
        missing = listed - on_disk
        if extra:
            errors.append(f"z={lv.z}: unlisted (external) files {sorted(extra)[:3]}")
        if missing:
            errors.append(f"z={lv.z}: manifest files missing on disk {sorted(missing)[:3]}")
    tiles_root = os.path.join(out_dir, "tiles")
    if os.path.isdir(tiles_root):
        known = {f"z={lv.z}" for lv in m.levels}
        for d in os.listdir(tiles_root):
            if d not in known and not d.startswith("."):
                errors.append(f"external level directory tiles/{d} not in manifest")

    # ---- ladder depth recommendation (overview warning analog) ----------
    cover = spec.get("tile_cover")
    idx = _index_table(out_dir)
    extent = cover
    if extent is None and idx is not None:
        zcol = idx["z"].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = zcol == base
        if sel.any():
            xs = idx["x"].to_numpy(zero_copy_only=False)[sel]
            ys = idx["y"].to_numpy(zero_copy_only=False)[sel]
            extent = (int(xs.min()), int(ys.min()), int(xs.max()), int(ys.max()))
    if extent:
        w_px = (extent[2] - extent[0] + 1) * int(spec["tile_px"])
        h_px = (extent[3] - extent[1] + 1) * int(spec["tile_px"])
        want = tms.get_maximum_overview_level(w_px, h_px, minsize=int(spec["tile_px"]))
        have = len(zs) - 1
        if have == 0 and want > 0:
            warnings.append(
                "The pyramid has no overview levels but its extent warrants "
                f"{want} (image-without-overviews analog)"
            )
        # tiled-ness: extent >1 tile but base level single-tile output
        if (extent[2] > extent[0] or extent[3] > extent[1]) and m.levels[0].tiles <= 1:
            errors.append(
                "extent spans multiple tiles but base level is not tiled "
                "(greater-than-512px-not-tiled analog)"
            )

    # ---- tile index ordering (block offset ordering analog) -------------
    if idx is None:
        errors.append("missing manifest/tiles_index")
    else:
        z = idx["z"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = idx["x"].to_numpy(zero_copy_only=False)
        y = idx["y"].to_numpy(zero_copy_only=False)
        key = idx["tile_key"].to_numpy(zero_copy_only=False)
        order = np.lexsort((x, y, -z))
        if not (np.array_equal(z, z[order]) and np.array_equal(y, y[order]) and np.array_equal(x, x[order])):
            errors.append("tile index not sorted (z desc, y, x) — ordering invariant")
        if len(np.unique(key)) != len(key):
            errors.append("duplicate tile keys in index")
        # manifest stats vs index stats (ghost-header consistency analog)
        for lv in m.levels:
            sel = z == lv.z
            n = int(sel.sum())
            pages = int(idx["page_count"].to_numpy(zero_copy_only=False)[sel].sum())
            if n != lv.tiles:
                errors.append(f"z={lv.z}: manifest tiles={lv.tiles} but index has {n}")
            if pages != lv.pages:
                errors.append(f"z={lv.z}: manifest pages={lv.pages} but index sums {pages}")
        if cover:
            sel = z == base
            if sel.any():
                if (
                    x[sel].min() < cover[0] or x[sel].max() > cover[2]
                    or y[sel].min() < cover[1] or y[sel].max() > cover[3]
                ):
                    errors.append("base-level tiles outside the aligned cover")

    # ---- page conservation (every kernel: child pages are attributed
    # to exactly one parent tile, so totals are invariant per level) ----
    resampling = spec.get("resampling", "sum")
    if len(m.levels) > 1:
        base_pages = m.levels[0].pages
        for lv in m.levels[1:]:
            if lv.pages != base_pages:
                errors.append(
                    f"z={lv.z}: page_count {lv.pages} != base {base_pages} "
                    f"(decimation attributes pages exactly once under {resampling})"
                )

    # ---- spot check grid payloads ---------------------------------------
    if spot_check and not errors:
        ob = spec.get("overview_blocksize")
        for lv in m.levels[:2]:
            # overview levels may run a different grid (--overview-blocksize)
            g_lv = int(spec["tile_px"]) if lv.z == base else int(ob or spec["tile_px"])
            G2 = g_lv ** 2
            t = pq.read_table(mani.level_dir(out_dir, lv.z), columns=["cells", "counts"])
            cells = t["cells"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
            counts = t["counts"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
            limit = G2 if not (resampling == "mode") else G2  # cells always pixel ids at rest
            if len(cells) and (cells.min() < 0 or cells.max() >= limit):
                errors.append(f"z={lv.z}: cell index outside [0, G²)")
            if len(counts) and counts.min() <= 0 and resampling in ("sum", "average"):
                errors.append(f"z={lv.z}: non-positive grid count")

    if strict:
        errors.extend(warnings)
        warnings = []
    return (len(errors) == 0, errors, warnings)


def validate_cog(dst_path: str, strict: bool = False) -> Tuple[bool, List[str], List[str]]:
    """Validate a single-FILE export (create.export_cog — the
    ``use_cog_driver`` alternate-writer analog): manifest present in
    file metadata, levels stored coarsest-first (z ascending), (y, x)
    sorted within each level, row groups never spanning levels, and
    per-level tile counts matching the embedded manifest — the
    single-file mirror of the directory validator's IFD-order checks
    (reference cogeo.py:586-679)."""
    import json

    import numpy as np

    from rio_cogeo_ray.pipelines.create import COG_LAYOUT, COG_LAYOUT_KEY, COG_MANIFEST_KEY

    errors: List[str] = []
    warnings: List[str] = []
    try:
        pf = pq.ParquetFile(dst_path)
    except Exception as e:  # noqa: BLE001
        return False, [f"The following is not a rio_cogeo_ray single-file export: {e}"], []

    meta = pf.schema_arrow.metadata or {}
    if COG_MANIFEST_KEY not in meta:
        return False, ["file metadata lacks the embedded manifest (header-first contract)"], []
    if meta.get(COG_LAYOUT_KEY) != COG_LAYOUT:
        warnings.append(
            f"layout tag {meta.get(COG_LAYOUT_KEY)!r} != {COG_LAYOUT!r}"
        )
    mdict = json.loads(meta[COG_MANIFEST_KEY].decode())
    man_tiles = {int(lv["z"]): int(lv["tiles"]) for lv in mdict.get("levels", [])}

    zi = pf.schema_arrow.names.index("z")
    prev_zmax = None
    for rg in range(pf.metadata.num_row_groups):
        st = pf.metadata.row_group(rg).column(zi).statistics
        if st is None:
            warnings.append(f"row group {rg}: no z statistics (pruned reads degrade)")
            continue
        if st.min != st.max:
            errors.append(f"row group {rg}: spans levels z∈[{st.min},{st.max}]")
        if prev_zmax is not None and st.min < prev_zmax:
            errors.append(
                f"row group {rg}: z={st.min} after z={prev_zmax} — "
                "overview-first (z ascending) order violated"
            )
        prev_zmax = max(st.max, prev_zmax) if prev_zmax is not None else st.max

    t = pf.read(columns=["z", "y", "x"])
    zs = t["z"].to_numpy(zero_copy_only=False)
    ys = t["y"].to_numpy(zero_copy_only=False)
    xs = t["x"].to_numpy(zero_copy_only=False)
    if len(zs) and np.any(np.diff(zs) < 0):
        errors.append("tile rows not z-ascending")
    for z in np.unique(zs):
        sel = zs == z
        key = ys[sel].astype(np.int64) * (2**32) + xs[sel].astype(np.int64)
        if np.any(np.diff(key) < 0):
            errors.append(f"z={z}: (y, x) order violated")
        n = int(sel.sum())
        if man_tiles and man_tiles.get(int(z)) not in (None, n):
            errors.append(
                f"z={z}: {n} tiles in file != {man_tiles[int(z)]} in manifest"
            )
    missing = sorted(set(man_tiles) - set(int(z) for z in np.unique(zs)))
    if missing:
        errors.append(f"manifest levels missing from file: {missing}")

    if strict:
        errors.extend(warnings)
        warnings = []
    return (len(errors) == 0, errors, warnings)
