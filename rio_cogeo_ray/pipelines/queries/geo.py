"""Tile / pyramid / raster / spatial-join queries (the reference-parity surface).

Mechanically split from the former pipelines/queries.py (scripts/
split_queries.py); node order preserved.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd

from rio_cogeo_ray import fixtures
from rio_cogeo_ray.functions import tms
from rio_cogeo_ray.stages import agg, ann, assign, dedup, knn, rasterize, text, window
from rio_cogeo_ray.stages import join as join_mod
from rio_cogeo_ray.pipelines.queries._common import CRS84_Z, CUSTOM_TMS_Z, DENSITY_Z, GROUP_QUANTILE_QS, KNN_K, KNN_TILE_K, NTILE_N, QUANTILE_QS, RADIUS_M, RASTER_G, RASTER_Z, TILE_Z, _CT_NX, _CT_NY, _CUSTOM_TMS, _LL_LAT, _LL_LON, _MX, _MY, _O, _S5, _aoi_values_sql, _conv_level_query, _docs, _geo_cte, _morton_spread_sql, _prepared_docs, _quadkey_sql_expr, _read, _span_sql, _sql_conv_level, _sql_pyramid_counts, _tile_sql, _valid_only, pip_stage


def q_tile_assign(sf_dir: str):
    """Per-doc tile assignment at z=6 (assign_tiles op)."""
    ds = _valid_only(_prepared_docs(sf_dir, TILE_Z))
    return ds.map_batches(
        lambda t: t.select(["doc_id", "x", "y", "tile_key"]), batch_format="pyarrow"
    )


SQL_TILE_ASSIGN = (
    _geo_cte() + f", t AS ({_tile_sql(TILE_Z)}) "
    f"SELECT doc_id, x, y, "
    f"({TILE_Z} * 288230376151711744 + x * 536870912 + y) AS tile_key FROM t"
)


def q_tile_assign_tms(sf_dir: str):
    """Tile assignment under a USER-DEFINED tile matrix set
    (functions/tms.py:quad_tile — the reference's custom-TMS JSON
    parameter generalized to any origin/span/base-grid quad): a 3×2
    base grid over plain degrees at z=4. Pure arithmetic, mirrored
    literally in SQL."""
    ds = _valid_only(_prepared_docs(sf_dir, TILE_Z))

    def _assign(t: pa.Table) -> pa.Table:
        lon = t["lon"].combine_chunks().to_numpy(zero_copy_only=False)
        lat = t["lat"].combine_chunks().to_numpy(zero_copy_only=False)
        x, y = tms.quad_tile(lon, lat, CUSTOM_TMS_Z, _CUSTOM_TMS)
        return pa.table(
            {
                "doc_id": t["doc_id"].combine_chunks(),
                "x": pa.array(x, pa.int64()),
                "y": pa.array(y, pa.int64()),
            }
        )

    return ds.map_batches(_assign, batch_format="pyarrow")


SQL_TILE_ASSIGN_TMS = (
    _geo_cte() + f" SELECT doc_id, "
    f"CAST(LEAST(GREATEST(FLOOR((lon - (-180.0)) / (360.0 / {_CT_NX})), 0), {_CT_NX - 1}) AS BIGINT) AS x, "
    f"CAST(LEAST(GREATEST(FLOOR((90.0 - lat) / (180.0 / {_CT_NY})), 0), {_CT_NY - 1}) AS BIGINT) AS y "
    f"FROM m"
)


def q_tile_density(sf_dir: str):
    """Per-tile page count + char sum at z=4 (windowed block copy /
    density aggregate analog, with partial pre-agg before the shuffle)."""
    ds = _valid_only(_prepared_docs(sf_dir, DENSITY_Z, columns=("doc_id", "n_chars")))
    return agg.partial_group_agg(
        ds, keys=["x", "y"], sum_cols=["n_chars"], count_as="pages"
    )


SQL_TILE_DENSITY = (
    _geo_cte() + f", t AS ({_tile_sql(DENSITY_Z)}) "
    f"SELECT x, y, CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars, "
    f"CAST(COUNT(*) AS BIGINT) AS pages FROM t GROUP BY x, y"
)


def q_pyramid_counts(sf_dir: str):
    """Tile page counts for the whole pyramid z=4..0 (overview build,
    cogeo.py:381-390 analog): each level derived from the previous by
    integer parent shift + re-aggregation."""
    base = q_tile_density(sf_dir).drop_columns(["sum_n_chars"])

    def _with_z(t: pa.Table, z: int) -> pa.Table:
        return pa.table(
            {
                "z": pa.array(np.full(len(t), z, dtype=np.int64), pa.int64()),
                "x": t["x"].combine_chunks().cast(pa.int64()),
                "y": t["y"].combine_chunks().cast(pa.int64()),
                "pages": t["pages"].combine_chunks().cast(pa.int64()),
            }
        )

    levels = [base.map_batches(lambda t: _with_z(t, DENSITY_Z), batch_format="pyarrow")]
    cur = levels[0]
    for z in range(DENSITY_Z - 1, -1, -1):
        def _shift(t: pa.Table, _z=z) -> pa.Table:
            return pa.table(
                {
                    "x": pa.compute.shift_right(t["x"], 1),
                    "y": pa.compute.shift_right(t["y"], 1),
                    "pages": t["pages"],
                }
            )

        shifted = cur.map_batches(_shift, batch_format="pyarrow")
        agged = agg.partial_group_agg(shifted, keys=["x", "y"], sum_cols=["pages"], count_as=None)
        cur = agged.map_batches(
            lambda t, _z=z: pa.table(
                {
                    "z": pa.array(np.full(len(t), _z, dtype=np.int64), pa.int64()),
                    "x": t["x"].combine_chunks().cast(pa.int64()),
                    "y": t["y"].combine_chunks().cast(pa.int64()),
                    "pages": t["sum_pages"].combine_chunks().cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        levels.append(cur)
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


SQL_PYRAMID_COUNTS = _sql_pyramid_counts()


def q_pip_inner(sf_dir: str):
    """Point-in-polygon inner join vs the rectangular AOI set (broadcast
    small side; actor pool builds the polygon index once per actor)."""
    ds = _valid_only(_prepared_docs(sf_dir, TILE_Z))
    joined = pip_stage(ds, mode="inner")
    return joined.map_batches(
        lambda t: t.select(["doc_id", "aoi_id"]), batch_format="pyarrow"
    )


def q_pip_sample(sf_dir: str):
    """Random sample OVER a spatial join (the sampling-over-range-join
    shape — PAPERS.md, ICDE 2025): the deterministic Bernoulli filter
    applies to the join OUTPUT stream map-side, so the sample never
    materializes the full join beyond each streamed batch. Keyed on
    the composite (doc_id, aoi_id) so pairs — not docs — are sampled."""
    from rio_cogeo_ray.stages.sketch import hash_sample_batch

    ds = _valid_only(_prepared_docs(sf_dir, TILE_Z))
    joined = pip_stage(ds, mode="inner")

    def _sample(t: pa.Table) -> pa.Table:
        # composite pair key, then the ONE canonical Bernoulli filter
        # (sketch.hash_sample_batch — the predicate the SQL mirrors)
        t = t.select(["doc_id", "aoi_id"])
        did = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        aid = t["aoi_id"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        keyed = t.append_column("__pair", pa.array(did * np.int64(64) + aid, pa.int64()))
        return hash_sample_batch(keyed, "__pair", 1, 4).drop_columns(["__pair"])

    return joined.map_batches(_sample, batch_format="pyarrow")


SQL_PIP_INNER = (
    _geo_cte() + " SELECT m.doc_id, CAST(a.aoi_id AS INTEGER) AS aoi_id "
    f"FROM m JOIN {_aoi_values_sql()} ON m.lon >= a.w AND m.lon <= a.e "
    "AND m.lat >= a.s AND m.lat <= a.n"
)


SQL_PIP_SAMPLE = (
    "WITH j AS (" + SQL_PIP_INNER + ") "
    "SELECT doc_id, aoi_id FROM j "
    # HUGEINT: the composite key amplifies the multiplicand 64x (same
    # wraparound-equivalence note as SQL_CORPUS_TO_SHARDS)
    "WHERE ((CAST(doc_id * 64 + aoi_id AS HUGEINT) * 2654435761) % 4294967296) % 4 < 1"
)


def q_pip_anti(sf_dir: str):
    ds = _valid_only(_prepared_docs(sf_dir, TILE_Z))
    joined = pip_stage(ds, mode="anti")
    return joined.map_batches(lambda t: t.select(["doc_id"]), batch_format="pyarrow")


SQL_PIP_ANTI = (
    _geo_cte() + " SELECT m.doc_id FROM m WHERE NOT EXISTS ("
    f"SELECT 1 FROM {_aoi_values_sql()} WHERE m.lon >= a.w AND m.lon <= a.e "
    "AND m.lat >= a.s AND m.lat <= a.n)"
)


def q_knn_bin(sf_dir: str):
    """k nearest docs to each lon/lat bin centroid (kNN-per-tile op in
    its SQL-exact lon/lat-grid form; the mercator-TMS form is pinned by
    pytest against the oracle tiler)."""

    def _bins(t: pa.Table) -> pa.Table:
        lon = t["lon"].combine_chunks().to_numpy(zero_copy_only=False)
        lat = t["lat"].combine_chunks().to_numpy(zero_copy_only=False)
        lon_bin = np.floor((lon + 180.0) / 30.0).astype(np.int64)
        lat_bin = np.floor((lat + 85.0) / 34.0).astype(np.int64)
        cx = (lon_bin + 0.5) * 30.0 - 180.0
        cy = (lat_bin + 0.5) * 34.0 - 85.0
        dx = lon - cx
        dy = lat - cy
        d2 = dx * dx + dy * dy
        return pa.table(
            {
                "doc_id": t["doc_id"].combine_chunks(),
                "bin_key": pa.array(lon_bin * 64 + lat_bin, pa.int64()),
                "lon_bin": pa.array(lon_bin, pa.int64()),
                "lat_bin": pa.array(lat_bin, pa.int64()),
                "d2": pa.array(d2, pa.float64()),
            }
        )

    ds = _valid_only(_prepared_docs(sf_dir, 1)).map_batches(_bins, batch_format="pyarrow")
    topk = knn.per_group_topk(
        ds, "bin_key", [("d2", True), ("doc_id", True)], KNN_K, rank_col="rnk"
    )
    return topk.map_batches(
        lambda t: t.select(["lon_bin", "lat_bin", "doc_id", "rnk"]), batch_format="pyarrow"
    )


SQL_KNN_BIN = (
    _geo_cte() + ", b AS (SELECT doc_id, "
    "CAST(FLOOR((lon + 180.0) / 30.0) AS BIGINT) AS lon_bin, "
    "CAST(FLOOR((lat + 85.0) / 34.0) AS BIGINT) AS lat_bin, lon, lat FROM m), "
    "d AS (SELECT doc_id, lon_bin, lat_bin, "
    "(lon - ((lon_bin + 0.5) * 30.0 - 180.0)) * (lon - ((lon_bin + 0.5) * 30.0 - 180.0)) + "
    "(lat - ((lat_bin + 0.5) * 34.0 - 85.0)) * (lat - ((lat_bin + 0.5) * 34.0 - 85.0)) AS d2 "
    "FROM b) "
    "SELECT lon_bin, lat_bin, doc_id, rnk FROM ("
    "SELECT lon_bin, lat_bin, doc_id, CAST(ROW_NUMBER() OVER ("
    "PARTITION BY lon_bin, lat_bin ORDER BY d2, doc_id) AS BIGINT) AS rnk FROM d) "
    f"WHERE rnk <= {KNN_K}"
)


def q_knn_tile(sf_dir: str):
    """k nearest docs per TMS tile centroid at z=5 (the north-rule kNN
    operator, SQL-exact: centroid/distance are pure arithmetic over the
    already-mirrored mercator columns; ranking gaps dwarf the my-column
    ulp noise)."""
    ds = _valid_only(_prepared_docs(sf_dir, RASTER_Z))
    withd = ds.map_batches(knn.add_centroid_distance, batch_format="pyarrow")
    topk = knn.per_group_topk(
        withd, "tile_key", [("centroid_d2", True), ("doc_id", True)],
        KNN_TILE_K, rank_col="rnk",
    )
    return topk.map_batches(
        lambda t: t.select(["x", "y", "doc_id", "rnk"]), batch_format="pyarrow"
    )


SQL_KNN_TILE = (
    _geo_cte() + f", t AS ({_tile_sql(RASTER_Z)}), "
    f"d AS (SELECT doc_id, x, y, "
    f"(mx - ((x + 0.5) * {_S5} - {_O})) * (mx - ((x + 0.5) * {_S5} - {_O})) + "
    f"(my - ({_O} - (y + 0.5) * {_S5})) * (my - ({_O} - (y + 0.5) * {_S5})) AS d2 "
    f"FROM t) "
    "SELECT x, y, doc_id, rnk FROM (SELECT x, y, doc_id, "
    "CAST(ROW_NUMBER() OVER (PARTITION BY x, y ORDER BY d2, doc_id) AS BIGINT) AS rnk "
    f"FROM d) WHERE rnk <= {KNN_TILE_K}"
)


def q_raster_cells(sf_dir: str):
    """Exploded density-grid cells at z=5, G=64 (rasterize_density op —
    the raster↔vector bridge, SQL-checked down to each pixel count)."""
    ds = _valid_only(_prepared_docs(sf_dir, RASTER_Z))
    partials = ds.map_batches(
        lambda t: rasterize.density_partials(t, RASTER_G), batch_format="pyarrow"
    )
    merged = rasterize.merge_sparse_tiles(partials, "sum", level=0, tile_px=RASTER_G)

    def _explode(t: pa.Table) -> pa.Table:
        cells = t["cells"].combine_chunks()
        lens = np.diff(cells.offsets.to_numpy(zero_copy_only=False))
        rep = np.repeat(np.arange(len(t), dtype=np.int64), lens)
        return pa.table(
            {
                "x": t["x"].combine_chunks().take(pa.array(rep)),
                "y": t["y"].combine_chunks().take(pa.array(rep)),
                "cell": cells.flatten().cast(pa.int64()),
                "cnt": t["counts"].combine_chunks().flatten(),
            }
        )

    return merged.map_batches(_explode, batch_format="pyarrow")


SQL_RASTER_CELLS = (
    _geo_cte() + f", t AS ({_tile_sql(RASTER_Z)}), "
    f"p AS (SELECT x, y, "
    f"LEAST(GREATEST(CAST(FLOOR((mx - (x * {_S5} - {_O})) / ({_S5} / {float(RASTER_G)!r})) AS BIGINT), 0), {RASTER_G - 1}) AS px, "
    f"LEAST(GREATEST(CAST(FLOOR((({_O} - y * {_S5}) - my) / ({_S5} / {float(RASTER_G)!r})) AS BIGINT), 0), {RASTER_G - 1}) AS py "
    f"FROM t) "
    f"SELECT x, y, (py * {RASTER_G} + px) AS cell, CAST(COUNT(*) AS BIGINT) AS cnt "
    f"FROM p GROUP BY x, y, cell"
)


def q_cell_assign(sf_dir: str):
    """S2-style Morton cell ids at level 8 (cell_encode op; bit math has
    no SQL mirror — pinned by pytest against tms.cell_to_tile instead)."""
    ds = _valid_only(_prepared_docs(sf_dir, TILE_Z))

    def _cells(t: pa.Table) -> pa.Table:
        t = assign.add_cell(t, 8)
        return t.select(["doc_id", "cell"])

    return ds.map_batches(_cells, batch_format="pyarrow")


def q_radius_pairs(sf_dir: str):
    """Spatial self-join within 500 km (stages/knn.py:radius_pairs):
    cell size = radius ⇒ every qualifying pair co-locates with ≤8
    ghost replicas; one hash(cell) exchange, per-bucket vectorized
    home×all pair pass, exactly-once orientation rule. Distances on
    floor-integer meters so the comparison is integer-exact."""
    from rio_cogeo_ray.stages.knn import radius_pairs

    ds = _valid_only(_prepared_docs(sf_dir, TILE_Z))
    return radius_pairs(ds, RADIUS_M)


SQL_RADIUS_PAIRS = (
    _geo_cte()
    + ", q AS (SELECT doc_id, CAST(FLOOR(mx) AS BIGINT) AS qx, "
    "CAST(FLOOR(my) AS BIGINT) AS qy FROM m) "
    "SELECT a.doc_id AS a_id, b.doc_id AS b_id, "
    "((a.qx - b.qx) * (a.qx - b.qx) + (a.qy - b.qy) * (a.qy - b.qy)) AS d2 "
    "FROM q a JOIN q b ON a.doc_id < b.doc_id "
    f"AND ((a.qx - b.qx) * (a.qx - b.qx) + (a.qy - b.qy) * (a.qy - b.qy)) "
    f"<= {RADIUS_M}::BIGINT * {RADIUS_M}::BIGINT"
)


#: cell_encode at level 8 has 8-bit x/y — the Morton interleave unrolls
#: into plain integer arithmetic, so even the bit-math op is SQL-exact.
SQL_CELL_ASSIGN = (
    _geo_cte() + ", t AS (" + (
        f"SELECT doc_id, "
        f"LEAST(GREATEST(CAST(FLOOR((mx + {_O}) / {_span_sql(8)}) AS BIGINT), 0), 255) AS x, "
        f"LEAST(GREATEST(CAST(FLOOR(({_O} - my) / {_span_sql(8)}) AS BIGINT), 0), 255) AS y FROM m"
    ) + ") "
    f"SELECT doc_id, (({_morton_spread_sql('x', 8)} * 2 + "
    f"{_morton_spread_sql('y', 8)}) * 32 + 8) AS cell FROM t"
)


def q_pyramid_bilinear(sf_dir: str):
    """Bilinear overview decimation (cogeo.py:48-60; tests/test_cli.py:203)."""
    return _conv_level_query(sf_dir, "bilinear")


def q_pyramid_lanczos(sf_dir: str):
    """Lanczos overview decimation — negative lobes exercise the signed
    floor-division normalize path."""
    return _conv_level_query(sf_dir, "lanczos")


SQL_PYRAMID_BILINEAR = _sql_conv_level("bilinear")


SQL_PYRAMID_LANCZOS = _sql_conv_level("lanczos")


def q_pyramid_rms(sf_dir: str):
    """One ROOT-MEAN-SQUARE pyramid step (z=5 n_chars-weighted grid →
    z=4; reference enum slot rio_cogeo/cogeo.py:57) exploded to
    per-pixel rows: child cells squared map-side
    (rasterize.square_tile_values), Σc² through the ordinary additive
    merge, floor-sqrt normalized exactly once per level
    (rasterize.finalize_rms_tiles) — the lossy sqrt never enters the
    distributed aggregation."""
    ds = _valid_only(_prepared_docs(sf_dir, RASTER_Z, columns=("doc_id", "n_chars")))
    partials = ds.map_batches(
        lambda t: rasterize.density_partials(t, RASTER_G, "n_chars"),
        batch_format="pyarrow",
    )
    merged = rasterize.merge_sparse_tiles(partials, "sum", level=0, tile_px=RASTER_G)
    sq = merged.map_batches(
        lambda t: rasterize.pyramid_partials(
            rasterize.square_tile_values(t), RASTER_G, "sum", 2
        ),
        batch_format="pyarrow",
    )
    smerged = rasterize.merge_sparse_tiles(sq, "sum", level=1, tile_px=RASTER_G)
    final = smerged.map_batches(
        lambda t: rasterize.finalize_rms_tiles(t, 2), batch_format="pyarrow"
    )

    def _explode(t: pa.Table) -> pa.Table:
        cells = t["cells"].combine_chunks()
        lens = np.diff(cells.offsets.to_numpy(zero_copy_only=False))
        rep = np.repeat(np.arange(len(t), dtype=np.int64), lens)
        return pa.table(
            {
                "x": t["x"].combine_chunks().take(pa.array(rep)),
                "y": t["y"].combine_chunks().take(pa.array(rep)),
                "cell": cells.flatten().cast(pa.int64()),
                "cnt": t["counts"].combine_chunks().flatten(),
            }
        )

    return final.map_batches(_explode, batch_format="pyarrow")


# IEEE double division and sqrt are correctly rounded in both numpy and
# DuckDB, and Σv² stays far below 2^53 at test scale, so FLOOR(SQRT(.))
# mirrors finalize_rms_tiles bit-for-bit.
SQL_PYRAMID_RMS = (
    _geo_cte() + f", t AS ({_tile_sql(RASTER_Z)}), "
    f"p AS (SELECT x, y, n_chars, "
    f"LEAST(GREATEST(CAST(FLOOR((mx - (x * {_S5} - {_O})) / ({_S5} / {float(RASTER_G)!r})) AS BIGINT), 0), {RASTER_G - 1}) AS px, "
    f"LEAST(GREATEST(CAST(FLOOR((({_O} - y * {_S5}) - my) / ({_S5} / {float(RASTER_G)!r})) AS BIGINT), 0), {RASTER_G - 1}) AS py "
    f"FROM t), "
    f"base AS (SELECT x * {RASTER_G} + px AS gx, y * {RASTER_G} + py AS gy, "
    f"CAST(SUM(n_chars) AS BIGINT) AS v FROM p GROUP BY gx, gy), "
    f"par AS (SELECT gx // 2 AS pgx, gy // 2 AS pgy, "
    f"CAST(FLOOR(SQRT(CAST(SUM(v * v) AS DOUBLE) / 4.0)) AS BIGINT) AS cnt "
    f"FROM base GROUP BY pgx, pgy) "
    f"SELECT pgx // {RASTER_G} AS x, pgy // {RASTER_G} AS y, "
    f"(pgy % {RASTER_G}) * {RASTER_G} + (pgx % {RASTER_G}) AS cell, cnt "
    f"FROM par WHERE cnt <> 0"
)


def q_tile_assign_lonlat(sf_dir: str):
    """Tile assignment over a PRE-GEOREFERENCED corpus (lon/lat columns
    already present — the GCP-georeferenced-source analog,
    rio_cogeo/cogeo.py:267-274): the hash geocode is skipped entirely;
    assign.make_prepare_fn(source='lonlat') validates + projects only."""
    ds = _read(os.path.join(sf_dir, "customer.parquet"), ["c_custkey"])

    def _derive(t: pa.Table) -> pa.Table:
        k = t["c_custkey"].combine_chunks().to_numpy(zero_copy_only=False)
        lon = (k * 7919 % 36000).astype(np.float64) / 100.0 - 180.0
        lat = (k * 104729 % 16000).astype(np.float64) / 100.0 - 80.0
        return pa.table(
            {
                "c_custkey": t["c_custkey"].combine_chunks(),
                "lon": pa.array(lon, pa.float64()),
                "lat": pa.array(lat, pa.float64()),
            }
        )

    derived = ds.map_batches(_derive, batch_format="pyarrow")
    fn = assign.make_prepare_fn(None, TILE_Z, extract=False, source="lonlat")
    prepared = derived.map_batches(fn, batch_format="pyarrow")
    return _valid_only(prepared).map_batches(
        lambda t: t.select(["c_custkey", "x", "y", "tile_key"]), batch_format="pyarrow"
    )


SQL_TILE_ASSIGN_LONLAT = (
    f"WITH g AS (SELECT c_custkey, {_LL_LON} AS lon, {_LL_LAT} AS lat FROM customer), "
    f"m AS (SELECT c_custkey, {_MX} AS mx, {_MY} AS my FROM g), "
    f"t AS (SELECT c_custkey, "
    f"LEAST(GREATEST(CAST(FLOOR((mx + {_O}) / {_span_sql(TILE_Z)}) AS BIGINT), 0), {(1 << TILE_Z) - 1}) AS x, "
    f"LEAST(GREATEST(CAST(FLOOR(({_O} - my) / {_span_sql(TILE_Z)}) AS BIGINT), 0), {(1 << TILE_Z) - 1}) AS y FROM m) "
    f"SELECT c_custkey, x, y, "
    f"({TILE_Z} * 288230376151711744 + x * 536870912 + y) AS tile_key FROM t"
)


def q_pyramid_base3(sf_dir: str):
    """One BASE-3 decimation step of the z=5 density grid (the
    arbitrary-decimation-base ladder, cogeo.py:196-203; reference
    tests/test_cogeo.py:818-835) exploded to per-pixel rows —
    SQL-checked via global-pixel floor division by 3."""
    ds = _valid_only(_prepared_docs(sf_dir, RASTER_Z))
    partials = ds.map_batches(
        lambda t: rasterize.density_partials(t, RASTER_G), batch_format="pyarrow"
    )
    merged = rasterize.merge_sparse_tiles(partials, "sum", level=0, tile_px=RASTER_G)
    p3 = merged.map_batches(
        lambda t: rasterize.pyramid_partials(t, RASTER_G, "sum", base=3),
        batch_format="pyarrow",
    )
    m3 = rasterize.merge_sparse_tiles(p3, "sum", level=1, base=3, tile_px=RASTER_G)

    def _explode(t: pa.Table) -> pa.Table:
        cells = t["cells"].combine_chunks()
        lens = np.diff(cells.offsets.to_numpy(zero_copy_only=False))
        rep = np.repeat(np.arange(len(t), dtype=np.int64), lens)
        return pa.table(
            {
                "x": t["x"].combine_chunks().take(pa.array(rep)),
                "y": t["y"].combine_chunks().take(pa.array(rep)),
                "cell": cells.flatten().cast(pa.int64()),
                "cnt": t["counts"].combine_chunks().flatten(),
            }
        )

    return m3.map_batches(_explode, batch_format="pyarrow")


SQL_PYRAMID_BASE3 = (
    _geo_cte() + f", t AS ({_tile_sql(RASTER_Z)}), "
    f"p AS (SELECT x, y, "
    f"LEAST(GREATEST(CAST(FLOOR((mx - (x * {_S5} - {_O})) / ({_S5} / {float(RASTER_G)!r})) AS BIGINT), 0), {RASTER_G - 1}) AS px, "
    f"LEAST(GREATEST(CAST(FLOOR((({_O} - y * {_S5}) - my) / ({_S5} / {float(RASTER_G)!r})) AS BIGINT), 0), {RASTER_G - 1}) AS py "
    f"FROM t), "
    f"g3 AS (SELECT (x * {RASTER_G} + px) // 3 AS pgx, (y * {RASTER_G} + py) // 3 AS pgy "
    f"FROM p) "
    f"SELECT pgx // {RASTER_G} AS x, pgy // {RASTER_G} AS y, "
    f"(pgy % {RASTER_G}) * {RASTER_G} + (pgx % {RASTER_G}) AS cell, "
    f"CAST(COUNT(*) AS BIGINT) AS cnt FROM g3 GROUP BY x, y, cell"
)


def q_price_quantiles(sf_dir: str):
    """EXACT distributed quantiles of o_totalprice (two-pass histogram +
    refine — no full sort, driver sees one histogram + a few bins'
    distinct values; stages/sketch.py:exact_quantiles). Lower/type-1
    quantile over cents-quantized values, mirrored by a window-cumsum
    SQL."""
    from rio_cogeo_ray.stages import sketch

    ds = _read(os.path.join(sf_dir, "orders.parquet"), ["o_totalprice"])
    res = sketch.exact_quantiles(ds, "o_totalprice", QUANTILE_QS, scale=100)
    return pa.table(
        {
            "q": pa.array(list(QUANTILE_QS), pa.float64()),
            "value": pa.array([res[q] for q in QUANTILE_QS], pa.float64()),
        }
    )


SQL_PRICE_QUANTILES = (
    "WITH c AS (SELECT CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS qv FROM orders), "
    "g AS (SELECT qv, COUNT(*) AS cnt FROM c GROUP BY qv), "
    "w AS (SELECT qv, SUM(cnt) OVER (ORDER BY qv) AS cum FROM g), "
    "n AS (SELECT COUNT(*) AS nn FROM c) "
    "SELECT p.q AS q, CAST(MIN(w.qv) AS DOUBLE) / 100.0 AS value "
    "FROM (VALUES (0.5), (0.9), (0.99)) AS p(q), w, n "
    "WHERE w.cum >= CAST(CEIL(p.q * n.nn) AS BIGINT) GROUP BY p.q"
)


def q_tile_assign_crs84(sf_dir: str):
    """Tile assignment in a SECOND tile matrix set — WorldCRS84Quad
    (plain-degree quad grid, 2×1 tiles at level 0; tms.crs84_tile) —
    the reference's custom-``tms`` parameter axis (cogeo.py:86,
    cli.py:214-218). Pure arithmetic, hash-exact."""
    ds = _valid_only(_prepared_docs(sf_dir, TILE_Z))

    def _assign(t: pa.Table) -> pa.Table:
        lon = t["lon"].combine_chunks().to_numpy(zero_copy_only=False)
        lat = t["lat"].combine_chunks().to_numpy(zero_copy_only=False)
        x, y = tms.crs84_tile(lon, lat, CRS84_Z)
        return pa.table(
            {
                "doc_id": t["doc_id"].combine_chunks(),
                "x": pa.array(x, pa.int64()),
                "y": pa.array(y, pa.int64()),
            }
        )

    return ds.map_batches(_assign, batch_format="pyarrow")


SQL_TILE_ASSIGN_CRS84 = (
    _geo_cte() + " "
    f"SELECT doc_id, "
    f"LEAST(GREATEST(CAST(FLOOR((lon + 180.0) / {180.0 / (1 << CRS84_Z)!r}) AS BIGINT), 0), {(2 << CRS84_Z) - 1}) AS x, "
    f"LEAST(GREATEST(CAST(FLOOR((90.0 - lat) / {180.0 / (1 << CRS84_Z)!r}) AS BIGINT), 0), {(1 << CRS84_Z) - 1}) AS y "
    f"FROM m"
)


def q_focal_density(sf_dir: str):
    """3×3 focal sum over the z=4 tile-density grid (stages/rasterize.py:
    focal_scatter — raster smoothing as distributed scatter-gather).
    Scatter runs on the ALREADY-AGGREGATED per-tile counts (sum is
    associative), so the 9× fan-out touches one row per occupied tile,
    not one per page."""
    ds = _valid_only(_prepared_docs(sf_dir, DENSITY_Z))
    dens = agg.partial_group_agg(ds, keys=["x", "y"], count_as="pages")
    scattered = dens.map_batches(
        lambda t: rasterize.focal_scatter(t, DENSITY_Z, "pages"),
        batch_format="pyarrow",
    )
    out = agg.partial_group_agg(
        scattered, keys=["x", "y"], sum_cols=["pages"], count_as=None
    )
    return out.map_batches(
        lambda t: pa.table(
            {"x": t["x"], "y": t["y"], "focal_pages": t["sum_pages"]}
        ),
        batch_format="pyarrow",
    )


SQL_FOCAL_DENSITY = (
    _geo_cte() + f", t AS ({_tile_sql(DENSITY_Z)}), "
    "d AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS pages FROM t GROUP BY x, y), "
    "o(dx, dy) AS (VALUES (-1,-1), (-1,0), (-1,1), (0,-1), (0,0), (0,1), (1,-1), (1,0), (1,1)) "
    f"SELECT d.x + o.dx AS x, d.y + o.dy AS y, CAST(SUM(d.pages) AS BIGINT) AS focal_pages "
    "FROM d CROSS JOIN o "
    f"WHERE d.x + o.dx BETWEEN 0 AND {(1 << DENSITY_Z) - 1} "
    f"AND d.y + o.dy BETWEEN 0 AND {(1 << DENSITY_Z) - 1} "
    "GROUP BY d.x + o.dx, d.y + o.dy"
)


def q_zonal_stats(sf_dir: str):
    """Zonal statistics (raster↔vector bridge completing pip_join):
    per-AOI page count + char sum via the broadcast point-in-polygon
    join, then a partial→final aggregate on aoi_id. Points inside
    overlapping AOIs contribute to each."""
    ds = _valid_only(
        _prepared_docs(sf_dir, TILE_Z, columns=("doc_id", "n_chars"))
    )
    joined = pip_stage(ds, mode="inner")
    return agg.partial_group_agg(
        joined.map_batches(
            lambda t: t.select(["aoi_id", "n_chars"]), batch_format="pyarrow"
        ),
        keys=["aoi_id"],
        sum_cols=["n_chars"],
        count_as="pages",
    )


SQL_ZONAL_STATS = (
    _geo_cte() + " SELECT CAST(a.aoi_id AS INTEGER) AS aoi_id, "
    "CAST(SUM(m.n_chars) AS BIGINT) AS sum_n_chars, CAST(COUNT(*) AS BIGINT) AS pages "
    f"FROM m JOIN {_aoi_values_sql()} ON m.lon >= a.w AND m.lon <= a.e "
    "AND m.lat >= a.s AND m.lat <= a.n GROUP BY a.aoi_id"
)


def q_value_quantiles_by_type(sf_dir: str):
    """Per-event_type EXACT median/p90 of value (stages/sketch.py:
    grouped_quantile — grouped order statistic with pre-shuffle
    duplicate collapse + bucketed per-group rank resolution)."""
    from rio_cogeo_ray.stages import sketch

    ds = _read(os.path.join(sf_dir, "events.parquet"), ["event_type", "value"])
    return sketch.grouped_quantile(
        ds, "event_type", "value", GROUP_QUANTILE_QS, scale=100
    )


SQL_VALUE_QUANTILES_BY_TYPE = (
    "WITH c AS (SELECT event_type, CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS qv FROM events), "
    "g AS (SELECT event_type, qv, COUNT(*) AS cnt FROM c GROUP BY event_type, qv), "
    "w AS (SELECT event_type, qv, SUM(cnt) OVER (PARTITION BY event_type ORDER BY qv) AS cum FROM g), "
    "n AS (SELECT event_type, COUNT(*) AS nn FROM c GROUP BY event_type) "
    "SELECT w.event_type, p.q AS q, CAST(MIN(w.qv) AS DOUBLE) / 100.0 AS value "
    f"FROM (VALUES {', '.join(f'({q!r})' for q in GROUP_QUANTILE_QS)}) AS p(q), "
    "w JOIN n ON w.event_type = n.event_type "
    "WHERE w.cum >= CAST(CEIL(p.q * n.nn) AS BIGINT) "
    "GROUP BY w.event_type, p.q"
)


def q_quantile_sketch(sf_dir: str):
    """Mergeable compressed-summary quantiles over l_extendedprice —
    the one-pass shuffle-free scale path beside the exact two-pass
    histogram (q_price_quantiles). Approximate (rank error ≤ ~5n/k) ⇒
    rows-only driver check; the rank bound is pinned in pytest
    (test_ops.py::test_quantile_sketch_rank_bound)."""
    from rio_cogeo_ray.stages import sketch

    ds = _read(os.path.join(sf_dir, "lineitem.parquet"), ["l_extendedprice"])
    return sketch.quantile_sketch(
        ds, "l_extendedprice", qs=(0.01, 0.25, 0.5, 0.75, 0.99), k=2048
    )


def q_ntile_assign(sf_dir: str):
    """Per-language NTILE(4) quartile labels over doc length
    (stages/sketch.py: grouped_ntile) — the "keep the top quality
    quartile per language" binning primitive. Permutation-exact via the
    (value, doc_id) unique tiebreak; one hash(lang) exchange, one
    vectorized lexsort per bucket, zero driver state."""
    ds = _docs(sf_dir, ["doc_id", "lang", "n_chars"])
    from rio_cogeo_ray.stages import sketch as sketch_mod

    return sketch_mod.grouped_ntile(ds, "lang", "n_chars", "doc_id", NTILE_N)


SQL_NTILE_ASSIGN = f"""
SELECT doc_id, lang, n_chars,
       CAST(NTILE({NTILE_N}) OVER (PARTITION BY lang ORDER BY n_chars, doc_id)
            AS BIGINT) AS tile
FROM documents
"""


def q_quadkey(sf_dir: str):
    """Bing-maps quadkey per assigned tile (functions/tms.py:
    tile_quadkey_int — the classic web-tile string id of the
    reference's TMS ecosystem): integer decimal packing keeps the
    kernel vectorized and the SQL mirror plain arithmetic + LPAD."""
    ds = _valid_only(_prepared_docs(sf_dir, TILE_Z))

    def _qk(t: pa.Table) -> pa.Table:
        x = t["x"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        y = t["y"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        qk = tms.tile_quadkey_int(x, y, TILE_Z)
        s = pc.utf8_lpad(
            pc.cast(pa.array(qk, pa.int64()), pa.string()), TILE_Z, "0"
        )
        return pa.table(
            {
                "doc_id": t["doc_id"].combine_chunks(),
                "x": pa.array(x, pa.int64()),
                "y": pa.array(y, pa.int64()),
                "quadkey": s,
            }
        )

    return ds.map_batches(_qk, batch_format="pyarrow")


SQL_QUADKEY = (
    _geo_cte()
    + f", t AS ({_tile_sql(TILE_Z)}) "
    + f"SELECT doc_id, x, y, "
    f"LPAD(CAST(({_quadkey_sql_expr(TILE_Z)}) AS VARCHAR), {TILE_Z}, '0') "
    f"AS quadkey FROM t"
)

