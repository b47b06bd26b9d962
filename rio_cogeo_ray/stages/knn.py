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
    rank_col: Optional[str] = None,
) -> pa.Table:
    """Vectorized within-batch per-group top-k (rank via cumcount after
    a lexsort — no Python per group)."""
    if len(batch) == 0:
        if rank_col:
            batch = batch.append_column(rank_col, pa.array([], pa.int64()))
        return batch
    batch = batch.sort_by([(group_col, "ascending")] + _sort_keys(order_cols))
    g = batch[group_col].combine_chunks().to_numpy(zero_copy_only=False)
    new_group = np.concatenate(([True], g[1:] != g[:-1]))
    starts = np.flatnonzero(new_group)
    pos = np.arange(len(g), dtype=np.int64) - np.repeat(starts, np.diff(np.append(starts, len(g))))
    keep = pos < k
    out = batch.filter(pa.array(keep))
    if rank_col:
        out = out.append_column(rank_col, pa.array(pos[keep] + 1, pa.int64()))
    return out


def per_group_topk(
    ds,
    group_col: str,
    order_cols: Sequence[Tuple[str, bool]],
    k: int,
    batch_size: int = 16384,
    rank_col: Optional[str] = None,
    n_buckets: int = 64,
):
    """Exact distributed per-group top-k: batch-local top-k (bounds each
    group's shuffled rows to k per batch) → BUCKETED final top-k: groups
    hash into ``n_buckets``, one vectorized map_groups call per bucket —
    per-group Python overhead is O(buckets), independent of group count
    (same pattern as rasterize.merge_sparse_tiles). ``rank_col`` adds a
    1-based rank (ROW_NUMBER() OVER (PARTITION BY group ORDER BY ...)
    mirror)."""
    from rio_cogeo_ray.functions.hashing import hash_columns

    local = ds.map_batches(
        lambda t: _batch_group_topk(t, group_col, order_cols, k),
        batch_format="pyarrow",
        batch_size=batch_size,
    )

    def _bucket(t: pa.Table) -> pa.Table:
        # hash_columns handles any group dtype (ints, strings, …)
        b = (hash_columns(t, [group_col]) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("__bucket", pa.array(b, pa.int64()))

    bucketed = local.map_batches(_bucket, batch_format="pyarrow")
    return bucketed.groupby("__bucket").map_groups(
        lambda g: _batch_group_topk(
            g.drop_columns(["__bucket"]), group_col, order_cols, k, rank_col
        ),
        batch_format="pyarrow",
    )


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


def radius_pairs(
    ds,
    radius_m: float,
    id_col: str = "doc_id",
    x_col: str = "mx",
    y_col: str = "my",
    n_buckets: int = 64,
):
    """Spatial SELF-JOIN within a radius: every unordered point pair
    with integer-meter distance² ≤ radius² — the point-point
    counterpart of pip_join (point-polygon) and knn_per_tile (nearest
    k). Returns (a_id, b_id, d2) with a_id < b_id, d2 in m².

    Grid partitioning (the classic distributed spatial join): cell
    size = radius, so every qualifying pair is in the same or an
    adjacent cell. Each point emits its HOME copy plus 8 ghost copies
    map-side (9×, bounded); one hash(cell) exchange; per bucket a
    vectorized home×all pair pass per cell run. A pair is reported
    exactly once via the orientation rule "a is HOME and a_id < b_id"
    (for cross-cell pairs exactly one endpoint's home cell sees the
    other as a ghost with the right id order).

    Coordinates quantize to floor-integer meters BEFORE the distance
    test so the comparison is integer-exact and SQL-mirrorable; dense
    cells are the quadratic hazard (|cell|² pairs) — radius is the
    knob, same caveat as ranking_overlap_join's hot items."""
    from rio_cogeo_ray.functions.hashing import splitmix64

    D = int(radius_m)
    if D <= 0:
        raise ValueError("radius_m must be a positive number of meters")
    D2 = np.int64(D) * np.int64(D)
    OFF = np.int64(1 << 20)
    SCALE = np.int64(1 << 21)

    def _emit(t: pa.Table) -> pa.Table:
        ids = (
            t[id_col].combine_chunks().cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        qx = np.floor(
            t[x_col].combine_chunks().fill_null(np.nan)
            .to_numpy(zero_copy_only=False)
        )
        qy = np.floor(
            t[y_col].combine_chunks().fill_null(np.nan)
            .to_numpy(zero_copy_only=False)
        )
        ok = np.isfinite(qx) & np.isfinite(qy)
        ids, qx, qy = ids[ok], qx[ok].astype(np.int64), qy[ok].astype(np.int64)
        n = len(ids)
        if n == 0:
            return pa.table(
                {
                    "cell": pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    "qx": pa.array([], pa.int64()),
                    "qy": pa.array([], pa.int64()),
                    "home": pa.array([], pa.int8()),
                    "__bucket": pa.array([], pa.int64()),
                }
            )
        cx, cy = qx // D, qy // D
        reps = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                cell = (cx + dx + OFF) * SCALE + (cy + dy + OFF)
                reps.append(
                    (cell, ids, qx, qy, np.full(n, 1 if dx == 0 and dy == 0 else 0, np.int8))
                )
        cell = np.concatenate([r[0] for r in reps])
        out = pa.table(
            {
                "cell": pa.array(cell, pa.int64()),
                id_col: pa.array(np.concatenate([r[1] for r in reps]), pa.int64()),
                "qx": pa.array(np.concatenate([r[2] for r in reps]), pa.int64()),
                "qy": pa.array(np.concatenate([r[3] for r in reps]), pa.int64()),
                "home": pa.array(np.concatenate([r[4] for r in reps]), pa.int8()),
            }
        )
        b = (splitmix64(cell.view(np.uint64)) % np.uint64(n_buckets)).astype(np.int64)
        return out.append_column("__bucket", pa.array(b, pa.int64()))

    empty_pairs = pa.table(
        {
            "a_id": pa.array([], pa.int64()),
            "b_id": pa.array([], pa.int64()),
            "d2": pa.array([], pa.int64()),
        }
    )

    def _pairs(g: pa.Table) -> pa.Table:
        if len(g) < 2:
            return empty_pairs
        g = g.sort_by([("cell", "ascending"), (id_col, "ascending")])
        cell = g["cell"].combine_chunks().to_numpy(zero_copy_only=False)
        ids = g[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        qx = g["qx"].combine_chunks().to_numpy(zero_copy_only=False)
        qy = g["qy"].combine_chunks().to_numpy(zero_copy_only=False)
        home = g["home"].combine_chunks().to_numpy(zero_copy_only=False).astype(bool)
        idx = np.arange(len(g), dtype=np.int64)
        new = np.ones(len(g), dtype=bool)
        new[1:] = cell[1:] != cell[:-1]
        run = np.cumsum(new) - 1
        run_start = np.maximum.accumulate(np.where(new, idx, 0))
        run_len = np.bincount(run)
        h_idx = idx[home]
        cnt = run_len[run[h_idx]]
        total = int(cnt.sum())
        if total == 0:
            return empty_pairs
        a_idx = np.repeat(h_idx, cnt)
        excl = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        offs = np.arange(total, dtype=np.int64) - np.repeat(excl, cnt)
        b_idx = np.repeat(run_start[h_idx], cnt) + offs
        keep = ids[a_idx] < ids[b_idx]
        a_idx, b_idx = a_idx[keep], b_idx[keep]
        dx = qx[a_idx] - qx[b_idx]
        dy = qy[a_idx] - qy[b_idx]
        d2 = dx * dx + dy * dy
        close = d2 <= D2
        return pa.table(
            {
                "a_id": pa.array(ids[a_idx][close], pa.int64()),
                "b_id": pa.array(ids[b_idx][close], pa.int64()),
                "d2": pa.array(d2[close], pa.int64()),
            }
        )

    return (
        ds.map_batches(_emit, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(
            lambda g: _pairs(g.drop_columns(["__bucket"])),
            batch_format="pyarrow",
        )
    )
