"""Point-in-polygon join — stateful actor-pool stage.

North-rule operator (no raster ancestor in the reference; the broadcast
pattern mirrors the reference's colormap forwarding, cogeo.py:345-360:
a small lookup shipped once, applied everywhere): AOI polygons are the
small join side, broadcast via ``ray.put`` once and materialized once
per actor in ``__init__`` — never re-shipped per batch. The per-batch
kernel is vectorized ray-casting over all points × all polygon edges
(edge counts are tiny; points are the long axis).

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
        self.mode = mode
        self.lon_col = lon_col
        self.lat_col = lat_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if "geo_valid" in batch.column_names:
            batch = batch.filter(batch["geo_valid"].combine_chunks())
        if len(batch) == 0:
            out = batch
            if self.mode == "inner":
                out = out.append_column("aoi_id", pa.array([], pa.int32()))
            return out
        px = batch[self.lon_col].combine_chunks().to_numpy(zero_copy_only=False)
        py = batch[self.lat_col].combine_chunks().to_numpy(zero_copy_only=False)
        masks = [p.contains(px, py) for p in self.polys]
        if self.mode == "inner":
            idx_parts, aoi_parts = [], []
            for p, m in zip(self.polys, masks):
                hits = np.flatnonzero(m)
                idx_parts.append(hits)
                aoi_parts.append(np.full(len(hits), p.aoi_id, dtype=np.int32))
            if idx_parts:
                idx = np.concatenate(idx_parts)
                aoi = np.concatenate(aoi_parts)
                order = np.lexsort((aoi, idx))  # deterministic (row, aoi) order
                idx, aoi = idx[order], aoi[order]
            else:
                idx = np.zeros(0, dtype=np.int64)
                aoi = np.zeros(0, dtype=np.int32)
            out = batch.take(pa.array(idx, pa.int64()))
            return out.append_column("aoi_id", pa.array(aoi, pa.int32()))
        any_hit = np.zeros(len(batch), dtype=bool)
        for m in masks:
            any_hit |= m
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
