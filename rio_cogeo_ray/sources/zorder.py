"""Z-order (Morton) clustered parquet layout: 2-D pruned range scans.

sources/zonemap.py prunes range scans on ONE sort key; a second
predicate column prunes nothing there, because sorting by key A
scatters key B uniformly across every zone. Z-ordering fixes that the
way Delta Lake's ``OPTIMIZE ZORDER BY`` and Databricks liquid
clustering do: bin BOTH columns into 2^bits quantile buckets,
interleave the bin bits into a Morton cell id, and partition the
layout by cell. Each cell is a RECTANGLE in (binA, binB) space, so a
range predicate on EITHER column (or both) overlaps only the cells
whose rectangle intersects it — ~sqrt-fraction of the layout instead
of all of it.

Pruning correctness never depends on the curve: the manifest records
each cell directory's exact per-column min/max harvested from parquet
FOOTER stats (the zonemap doctrine), and the reader applies the exact
row filter after pruning — results are identical to a full scan +
filter, the curve only decides HOW MUCH I/O pruning removes.

This is the same Morton interleave the engine's S2-style
``cell_encode`` uses for spatial tiles (functions/tms.py:371),
re-aimed at arbitrary numeric key pairs; the reference analog is
rio-cogeo's requirement that tiles cluster spatially contiguous bytes
so range readers touch few ranges (cogeo.py's ordered final copy +
validate's offset-ordering checks, cogeo.py:586-679).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from rio_cogeo_ray.functions.tms import _part1by1

MANIFEST = "zorder.json"


def _quantile_cuts(ds, col: str, n_bins: int) -> np.ndarray:
    from rio_cogeo_ray.stages.sketch import quantile_sketch

    qs = [i / n_bins for i in range(1, n_bins)]
    qt = quantile_sketch(ds, col, qs)
    return np.unique(qt["value"].to_numpy(zero_copy_only=False))


def write_zordered(
    ds, out_dir: str, cols: Sequence[str], bits: int = 4
) -> str:
    """Write ``ds`` as ``out_dir/data/__zcell=<morton>/*.parquet``:
    each of the two numeric ``cols`` is bucketed into ``2**bits``
    quantile bins (one-pass mergeable quantile sketch — no extra
    shuffle), bin indices are Morton-interleaved per batch (pure
    numpy, map-side), and ``write_parquet(partition_cols=...)`` groups
    rows by cell. The manifest records each cell's exact per-column
    min/max from the parquet footers. Atomic replace (tmp dir +
    os.replace) like every engine sink."""
    if len(cols) != 2:
        raise ValueError("z-order layout takes exactly two columns")
    c0, c1 = cols
    cuts0 = _quantile_cuts(ds, c0, 1 << bits)
    cuts1 = _quantile_cuts(ds, c1, 1 << bits)

    def _assign(t: pa.Table) -> pa.Table:
        v0 = t[c0].combine_chunks().cast(pa.float64()).to_numpy(zero_copy_only=False)
        v1 = t[c1].combine_chunks().cast(pa.float64()).to_numpy(zero_copy_only=False)
        b0 = np.searchsorted(cuts0, v0, side="right").astype(np.uint64)
        b1 = np.searchsorted(cuts1, v1, side="right").astype(np.uint64)
        z = (_part1by1(b0) << np.uint64(1)) | _part1by1(b1)
        return t.append_column("__zcell", pa.array(z.astype(np.int64), pa.int64()))

    os.makedirs(out_dir, exist_ok=True)
    data_dir = os.path.join(out_dir, "data")
    tmp_dir = os.path.join(out_dir, ".data.tmp")
    shutil.rmtree(tmp_dir, ignore_errors=True)
    ds.map_batches(_assign, batch_format="pyarrow").write_parquet(
        tmp_dir, partition_cols=["__zcell"]
    )
    os.makedirs(tmp_dir, exist_ok=True)
    shutil.rmtree(data_dir, ignore_errors=True)
    os.replace(tmp_dir, data_dir)

    # per-cell exact min/max for BOTH columns, footer stats only
    cells: Dict[str, Dict[str, List[float]]] = {}
    for name in sorted(os.listdir(data_dir)):
        if not name.startswith("__zcell="):
            continue
        cdir = os.path.join(data_dir, name)
        bounds: Dict[str, List[float]] = {}
        for f in sorted(os.listdir(cdir)):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(cdir, f)).metadata
            sch = md.schema.to_arrow_schema()
            for col in (c0, c1):
                ci = sch.get_field_index(col)
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(ci).statistics
                    if st is None or not st.has_min_max:
                        continue
                    if col not in bounds:
                        bounds[col] = [st.min, st.max]
                    else:
                        bounds[col][0] = min(bounds[col][0], st.min)
                        bounds[col][1] = max(bounds[col][1], st.max)
        if bounds:
            cells[name] = bounds
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump({"cols": [c0, c1], "cells": cells}, f)
    return out_dir


def select_cells(
    out_dir: str, ranges: Dict[str, Tuple[float, float]]
) -> Tuple[List[str], int]:
    """(overlapping cell dirs, total cell count) for the conjunction of
    per-column ranges — any subset of the layout's columns may be
    constrained; unconstrained columns never prune."""
    with open(os.path.join(out_dir, MANIFEST)) as f:
        man = json.load(f)
    unknown = set(ranges) - set(man["cols"])
    if unknown:
        raise KeyError(f"not z-order columns: {sorted(unknown)}")
    dirs = []
    for name, bounds in sorted(man["cells"].items()):
        ok = True
        for col, (lo, hi) in ranges.items():
            cmin, cmax = bounds[col]
            if cmax < lo or cmin > hi:
                ok = False
                break
        if ok:
            dirs.append(os.path.join(out_dir, "data", name))
    return dirs, len(man["cells"])


def read_zordered(
    out_dir: str,
    ranges: Dict[str, Tuple[float, float]],
    columns: Optional[Sequence[str]] = None,
):
    """Conjunctive range scan over a :func:`write_zordered` layout:
    lists only the cells whose (min,max) rectangle intersects every
    constrained range, then applies the EXACT row filter — identical
    results to a full scan + filter, minus the pruned I/O."""
    import pyarrow.dataset as pads
    import ray.data as rd

    dirs, _ = select_cells(out_dir, ranges)
    files = [
        os.path.join(d, f)
        for d in dirs
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    if not files:
        data_dir = os.path.join(out_dir, "data")
        any_file = next(
            (
                os.path.join(r, f)
                for r, _, fs in os.walk(data_dir)
                for f in sorted(fs)
                if f.endswith(".parquet")
            ),
            None,
        )
        if any_file is not None:
            sch = pq.read_schema(any_file)
            names = list(columns) if columns else list(sch.names)
            t = pa.table({n: pa.array([], sch.field(n).type) for n in names})
        else:
            t = pa.table({n: pa.array([], pa.null()) for n in (columns or [])})
        return rd.from_arrow(t)
    flt = None
    for col, (lo, hi) in ranges.items():
        c = (pads.field(col) >= lo) & (pads.field(col) <= hi)
        flt = c if flt is None else (flt & c)
    return rd.read_parquet(
        files, columns=list(columns) if columns else None, filter=flt
    )
