"""Per-group top-k / kNN — skew-proof two-stage reduction.

North-rule operator (kNN page lookup per tile centroid). The engine
pattern generalizes the density pipeline's partial→final trick to ANY
per-group top-k: a vectorized per-BATCH local top-k first (no shuffle;
bounds each group's shuffled rows to k per batch — this is the skew
handling, no salting needed because top-k is a decomposable reduce),
then ``groupby(...).map_groups`` for the final exact top-k.

Determinism: the sort order always ends with a unique id column, so
ties break identically everywhere (FIXTURES.md `pages_knn` tie rule:
distance ties broken by url/doc_id).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from rio_cogeo_ray.functions import tms


def _sort_keys(order_cols: Sequence[Tuple[str, bool]]):
    return [(c, "ascending" if asc else "descending") for c, asc in order_cols]


def _batch_group_topk(
    batch: pa.Table,
    group_col: str,
    order_cols: Sequence[Tuple[str, bool]],
    k: int,
) -> pa.Table:
    """Vectorized within-batch per-group top-k (rank via cumcount after
    a lexsort — no Python per group)."""
    if len(batch) == 0:
        return batch
    batch = batch.sort_by([(group_col, "ascending")] + _sort_keys(order_cols))
    g = batch[group_col].combine_chunks().to_numpy(zero_copy_only=False)
    new_group = np.concatenate(([True], g[1:] != g[:-1]))
    starts = np.flatnonzero(new_group)
    pos = np.arange(len(g), dtype=np.int64) - np.repeat(starts, np.diff(np.append(starts, len(g))))
    return batch.filter(pa.array(pos < k))


def per_group_topk(
    ds,
    group_col: str,
    order_cols: Sequence[Tuple[str, bool]],
    k: int,
    batch_size: int = 16384,
    rank_col: Optional[str] = None,
):
    """Exact distributed per-group top-k: batch-local top-k →
    groupby(group).map_groups final top-k. ``rank_col`` adds a 1-based
    rank (the ROW_NUMBER() OVER (PARTITION BY group ORDER BY ...)
    mirror)."""
    local = ds.map_batches(
        lambda t: _batch_group_topk(t, group_col, order_cols, k),
        batch_format="pyarrow",
        batch_size=batch_size,
    )

    def _final(group: pa.Table) -> pa.Table:
        out = group.sort_by(_sort_keys(order_cols))
        out = out.slice(0, k)
        if rank_col:
            out = out.append_column(
                rank_col, pa.array(np.arange(1, len(out) + 1, dtype=np.int64), pa.int64())
            )
        return out

    return local.groupby(group_col).map_groups(_final, batch_format="pyarrow")


def add_centroid_distance(batch: pa.Table, col: str = "centroid_d2") -> pa.Table:
    """+ squared mercator distance from each page to its tile's centroid
    (pure arithmetic over already-computed mx/my/x/y; no transcendentals,
    so bit-stable across engines)."""
    if len(batch) == 0:
        return batch.append_column(col, pa.array([], pa.float64()))
    valid = batch["geo_valid"].combine_chunks().to_numpy(zero_copy_only=False)
    key = batch["tile_key"].combine_chunks().fill_null(0).to_numpy(zero_copy_only=False)
    z, x, y = tms.unpack_tile_key(key)
    zz = int(z[np.argmax(valid)]) if valid.any() else 0
    cx, cy = tms.tile_centroid(zz, x, y)
    mx = batch["mx"].combine_chunks().fill_null(0.0).to_numpy(zero_copy_only=False)
    my = batch["my"].combine_chunks().fill_null(0.0).to_numpy(zero_copy_only=False)
    dx = mx - cx
    dy = my - cy
    d2 = dx * dx + dy * dy
    return batch.append_column(col, pa.array(d2, pa.float64(), mask=~valid))


def knn_per_tile(
    ds,
    k: int,
    id_col: str = "url",
    batch_size: int = 16384,
):
    """k nearest pages to each tile's centroid (north-rule kNN): distance
    stage (stateless vectorized) + skew-proof per-group top-k. Ties break
    by ``id_col``. Input must be a prepared dataset (assign stage)."""
    withd = ds.map_batches(
        lambda t: add_centroid_distance(t.filter(t["geo_valid"].combine_chunks())),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    return per_group_topk(
        withd, "tile_key", [("centroid_d2", True), (id_col, True)], k,
        batch_size=batch_size,
    )
