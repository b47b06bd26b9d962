"""Point-in-polygon join — stateful actor-pool stage.

North-rule operator (no raster ancestor in the reference; the broadcast
pattern mirrors the reference's colormap forwarding, cogeo.py:345-360:
a small lookup shipped once, applied everywhere): AOI polygons are the
small join side, broadcast via ``ray.put`` once and materialized once
per actor in ``__init__`` — never re-shipped per batch, including a
uniform grid index over polygon bboxes (``_GridIndex``). Per batch,
points gather candidate polygons from their grid cell and only those
pairs run the vectorized ray-casting edge test, so cost scales with
O(points · candidates · edges), not O(points · polygons · edges).

Tie rule (pinned by FIXTURES.md `pages_aoi` and the oracle SQL's
inclusive BETWEEN): a point exactly ON a polygon edge is INSIDE.

Join flavors: ``inner`` (one output row per (point, aoi) match, aoi_id
appended), ``semi`` (points with ≥1 match), ``anti`` (points with no
match) — the semi/anti pattern from the north rule.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import numpy as np
import pyarrow as pa

import ray


class _Polygon:
    __slots__ = ("aoi_id", "x1", "y1", "x2", "y2", "minx", "maxx", "miny", "maxy")

    def __init__(self, aoi_id: int, lons: np.ndarray, lats: np.ndarray):
        self.aoi_id = aoi_id
        self.x1 = lons
        self.y1 = lats
        self.x2 = np.roll(lons, -1)
        self.y2 = np.roll(lats, -1)
        self.minx, self.maxx = float(lons.min()), float(lons.max())
        self.miny, self.maxy = float(lats.min()), float(lats.max())

    def contains(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """Vectorized even-odd ray casting + explicit on-edge ⇒ inside."""
        # cheap bbox prefilter
        cand = (px >= self.minx) & (px <= self.maxx) & (py >= self.miny) & (py <= self.maxy)
        if not cand.any():
            return cand
        x, y = px[cand], py[cand]
        inside = np.zeros(len(x), dtype=bool)
        on_edge = np.zeros(len(x), dtype=bool)
        for x1, y1, x2, y2 in zip(self.x1, self.y1, self.x2, self.y2):
            crosses = (y1 > y) != (y2 > y)
            if y2 != y1:
                xint = (x2 - x1) * (y - y1) / (y2 - y1) + x1
                inside ^= crosses & (x < xint)
            # on-segment: zero cross product and within the edge bbox
            cross = (x2 - x1) * (y - y1) - (y2 - y1) * (x - x1)
            within = (
                (x >= min(x1, x2)) & (x <= max(x1, x2))
                & (y >= min(y1, y2)) & (y <= max(y1, y2))
            )
            on_edge |= (cross == 0.0) & within
        out = np.zeros(len(px), dtype=bool)
        out[cand] = inside | on_edge
        return out


def _build_polygons(aois: pa.Table) -> List[_Polygon]:
    ids = aois["aoi_id"].to_pylist()
    lons = aois["ring_lon"].to_pylist()
    lats = aois["ring_lat"].to_pylist()
    return [
        _Polygon(i, np.asarray(lo, dtype=np.float64), np.asarray(la, dtype=np.float64))
        for i, lo, la in zip(ids, lons, lats)
    ]


class _GridIndex:
    """Uniform grid over polygon bboxes (built once per actor): points
    map to a cell, cells list candidate polygons (CSR layout), so the
    per-batch edge test runs on O(points · candidates) pairs instead of
    O(points · polygons) — the spatial-index step that keeps a
    10^5-polygon AOI layer sub-quadratic."""

    def __init__(self, polys: List[_Polygon]):
        self.polys = polys
        P = len(polys)
        self.x0 = min(p.minx for p in polys)
        self.y0 = min(p.miny for p in polys)
        x1 = max(p.maxx for p in polys)
        y1 = max(p.maxy for p in polys)
        # ~2 cells per polygon per axis-pair; clamp for degenerate layers
        self.g = g = int(min(256, max(1, np.ceil(np.sqrt(2.0 * max(P, 1))))))
        self.cw = max((x1 - self.x0) / g, 1e-12)
        self.ch = max((y1 - self.y0) / g, 1e-12)
        self.x1, self.y1 = x1, y1
        buckets: List[List[int]] = [[] for _ in range(g * g)]
        for j, p in enumerate(polys):
            cx0 = int(np.clip((p.minx - self.x0) // self.cw, 0, g - 1))
            cx1 = int(np.clip((p.maxx - self.x0) // self.cw, 0, g - 1))
            cy0 = int(np.clip((p.miny - self.y0) // self.ch, 0, g - 1))
            cy1 = int(np.clip((p.maxy - self.y0) // self.ch, 0, g - 1))
            for cy in range(cy0, cy1 + 1):
                base = cy * g
                for cx in range(cx0, cx1 + 1):
                    buckets[base + cx].append(j)
        counts = np.array([len(b) for b in buckets], dtype=np.int64)
        self.cell_off = np.concatenate(([0], np.cumsum(counts)))
        self.cell_polys = np.array(
            [j for b in buckets for j in b], dtype=np.int64
        )

    def candidate_pairs(self, px: np.ndarray, py: np.ndarray):
        """(point_idx, poly_idx) candidate pairs via the grid (CSR gather,
        fully vectorized)."""
        in_bbox = (px >= self.x0) & (px <= self.x1) & (py >= self.y0) & (py <= self.y1)
        pts = np.flatnonzero(in_bbox)
        if len(pts) == 0:
            z = np.zeros(0, dtype=np.int64)
            return z, z
        g = self.g
        cx = np.clip(((px[pts] - self.x0) // self.cw).astype(np.int64), 0, g - 1)
        cy = np.clip(((py[pts] - self.y0) // self.ch).astype(np.int64), 0, g - 1)
        cell = cy * g + cx
        n = self.cell_off[cell + 1] - self.cell_off[cell]
        total = int(n.sum())
        if total == 0:
            z = np.zeros(0, dtype=np.int64)
            return z, z
        rep = np.repeat(np.arange(len(pts), dtype=np.int64), n)
        excl = np.concatenate(([0], np.cumsum(n)[:-1]))
        within = np.arange(total, dtype=np.int64) - np.repeat(excl, n)
        poly_idx = self.cell_polys[self.cell_off[cell][rep] + within]
        return pts[rep], poly_idx


class PIPJoin:
    """Actor-pool callable: ``map_batches(PIPJoin, fn_constructor_args=
    (aois_ref, mode), concurrency=N, batch_format="pyarrow")``.

    ``aois`` may be a pyarrow Table or a ``ray.ObjectRef`` to one
    (broadcast once with ray.put); the polygon index is built ONCE per
    actor here in ``__init__``, not per batch.
    """

    def __init__(
        self,
        aois: Union[pa.Table, "ray.ObjectRef"],
        mode: str = "inner",
        lon_col: str = "lon",
        lat_col: str = "lat",
    ):
        if isinstance(aois, ray.ObjectRef):
            aois = ray.get(aois)
        if mode not in ("inner", "semi", "anti"):
            raise ValueError(f"mode must be inner/semi/anti, got {mode!r}")
        self.polys = _build_polygons(aois)
        self.index = _GridIndex(self.polys) if self.polys else None
        self.mode = mode
        self.lon_col = lon_col
        self.lat_col = lat_col

    #: below this many polygons, a plain per-polygon vectorized sweep
    #: beats the grid (candidate gather + pair argsort overhead exceeds
    #: P bbox-prefiltered edge tests when P is tiny)
    _BRUTE_MAX_POLYS = 32

    def _hit_pairs_brute(self, px: np.ndarray, py: np.ndarray):
        """Small-layer fast path: one vectorized contains() per polygon
        over the whole batch (bbox prefilter inside)."""
        idx_parts, aoi_parts = [], []
        for p in self.polys:
            hits = np.flatnonzero(p.contains(px, py))
            if len(hits):
                idx_parts.append(hits)
                aoi_parts.append(np.full(len(hits), p.aoi_id, dtype=np.int32))
        if not idx_parts:
            return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int32)
        return np.concatenate(idx_parts), np.concatenate(aoi_parts)

    def _hit_pairs(self, px: np.ndarray, py: np.ndarray):
        """(point_idx, aoi_id) pairs of contained points: grid candidates
        first, then the exact edge test per candidate polygon (the
        per-batch cost is O(pairs · edges), not O(polygons · points))."""
        if len(self.polys) <= self._BRUTE_MAX_POLYS:
            return self._hit_pairs_brute(px, py)
        pi, pj = self.index.candidate_pairs(px, py)
        if len(pi) == 0:
            return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int32)
        order = np.argsort(pj, kind="stable")
        pi, pj = pi[order], pj[order]
        starts = np.flatnonzero(np.concatenate(([True], pj[1:] != pj[:-1])))
        ends = np.concatenate((starts[1:], [len(pj)]))
        idx_parts, aoi_parts = [], []
        for s, e in zip(starts, ends):
            p = self.polys[pj[s]]
            sub = pi[s:e]
            m = p.contains(px[sub], py[sub])
            hits = sub[m]
            if len(hits):
                idx_parts.append(hits)
                aoi_parts.append(np.full(len(hits), p.aoi_id, dtype=np.int32))
        if not idx_parts:
            return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int32)
        return np.concatenate(idx_parts), np.concatenate(aoi_parts)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if "geo_valid" in batch.column_names:
            batch = batch.filter(batch["geo_valid"].combine_chunks())
        if len(batch) == 0 or self.index is None:
            if self.mode == "inner":
                return batch.take(pa.array([], pa.int64())).append_column(
                    "aoi_id", pa.array([], pa.int32())
                )
            if self.mode == "semi":
                return batch.take(pa.array([], pa.int64()))
            return batch  # anti: nothing matches, keep all
        px = batch[self.lon_col].combine_chunks().to_numpy(zero_copy_only=False)
        py = batch[self.lat_col].combine_chunks().to_numpy(zero_copy_only=False)
        idx, aoi = self._hit_pairs(px, py)
        if self.mode == "inner":
            order = np.lexsort((aoi, idx))  # deterministic (row, aoi) order
            idx, aoi = idx[order], aoi[order]
            out = batch.take(pa.array(idx, pa.int64()))
            return out.append_column("aoi_id", pa.array(aoi, pa.int32()))
        any_hit = np.zeros(len(batch), dtype=bool)
        any_hit[idx] = True
        keep = any_hit if self.mode == "semi" else ~any_hit
        return batch.filter(pa.array(keep))


def pip_join(
    ds,
    aois: pa.Table,
    mode: str = "inner",
    concurrency: Optional[int] = None,
    batch_size: int = 8192,
    lon_col: str = "lon",
    lat_col: str = "lat",
    use_actors: Optional[bool] = None,
):
    """Attach the PIP join stage to a prepared Dataset.

    Actor pool vs stateless tasks: an actor pool amortizes EXPENSIVE
    per-worker state, but each actor pays a process spawn + imports —
    for a small polygon set that startup dominates. Default: actors when
    the AOI table is big enough to matter (≥256 polygons), stateless
    tasks (broadcast ref + cached index per worker process) otherwise.
    """
    aois_ref = ray.put(aois)
    if use_actors is None:
        use_actors = len(aois) >= 256
    if use_actors:
        return ds.map_batches(
            PIPJoin,
            fn_constructor_args=(aois_ref, mode, lon_col, lat_col),
            batch_format="pyarrow",
            batch_size=batch_size,
            # callable class ⇒ actor pool; Ray requires an explicit size
            concurrency=concurrency or 4,
        )

    # stateless path: build (and cache) the joiner once per worker
    # process — tasks reuse Ray's already-warm workers, no pool spin-up
    cache = {}

    def _fn(batch: pa.Table) -> pa.Table:
        j = cache.get("j")
        if j is None:
            j = PIPJoin(ray.get(aois_ref), mode, lon_col, lat_col)
            cache["j"] = j
        return j(batch)

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=batch_size)
