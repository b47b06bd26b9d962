"""Pin the tile-grid math to reference-derived constants.

Mirrors the reference's grid-conformance suite (tests/test_web.py,
tests/test_cogeo.py:72,357-380) re-expressed over the engine's pure-numpy
TMS implementation.
"""

import numpy as np
import pytest

from rio_cogeo_ray.functions import tms


def test_canonical_constants():
    assert tms.ORIGIN_SHIFT == pytest.approx(20037508.342789244)
    assert tms.cell_size(0) == pytest.approx(156543.03392804097)
    # well-known z=18 resolution
    assert tms.cell_size(18) == pytest.approx(0.5971642834779395)
    assert tms.tile_span(0) == pytest.approx(2 * tms.ORIGIN_SHIFT)


def test_maximum_overview_level_pins():
    # reference pins: 512px, blocksize 64 → overviews [2, 4, 8]
    # (tests/test_cogeo.py:72); 171px/128 → [2] (…:370); 51px/512 → none (…:380)
    assert tms.get_maximum_overview_level(512, 512, 64) == 3
    assert tms.overview_decimations(3) == [2, 4, 8]
    assert tms.get_maximum_overview_level(171, 171, 128) == 1
    assert tms.overview_decimations(1) == [2]
    assert tms.get_maximum_overview_level(51, 51, 512) == 0
    assert tms.overview_decimations(0) == []
    # non-square
    assert tms.get_maximum_overview_level(800, 100, 100) == 3
    # decimation base 3 (cogeo.py:196-203 validates base >= 2)
    assert tms.overview_decimations(3, base=3) == [3, 9, 27]


def test_zoom_for_res_strategies():
    # exact match at every zoom
    for z in (0, 5, 9, 18):
        assert tms.zoom_for_res(tms.cell_size(z)) == z
    # between z=8 and z=9: auto picks the closer ratio; lower steps coarser;
    # upper keeps finer — the maxzoom-9-vs-8 situation pinned by
    # tests/test_web.py:56-71.
    res8, res9 = tms.cell_size(8), tms.cell_size(9)
    just_above_9 = res9 * 1.10  # much closer to z9 than z8
    assert tms.zoom_for_res(just_above_9, zoom_level_strategy="auto") == 9
    assert tms.zoom_for_res(just_above_9, zoom_level_strategy="lower") == 8
    assert tms.zoom_for_res(just_above_9, zoom_level_strategy="upper") == 9
    just_below_8 = res8 * 0.95  # closer to z8
    assert tms.zoom_for_res(just_below_8, zoom_level_strategy="auto") == 8
    assert tms.zoom_for_res(just_below_8, zoom_level_strategy="upper") == 9
    # 1e-8 relative tolerance counts as equal
    assert tms.zoom_for_res(tms.cell_size(9) * (1 + 1e-9)) == 9
    # resolution coarser than z0
    assert tms.zoom_for_res(1e9) == 0
    with pytest.raises(ValueError):
        tms.zoom_for_res(10.0, zoom_level_strategy="bogus")


def test_tile_assignment_known_points():
    # (0,0) is the exact center: at z=1 the floor/tie rule puts it in tile (1,1)
    assert tms.tile(0.0, 0.0, 1) == (1, 1)
    # z=0 everything is tile (0,0)
    assert tms.tile(-179.9, 80.0, 0) == (0, 0)
    assert tms.tile(179.9, -80.0, 0) == (0, 0)
    # corners clamp into range
    assert tms.tile(180.0, -85.06, 2) == (3, 3)
    assert tms.tile(-180.0, 85.06, 2) == (0, 0)
    # known city: Paris (2.3522E, 48.8566N) at z=10 → tile (518, 352)
    # (standard OSM slippy-map tile, public knowledge)
    assert tms.tile(2.3522, 48.8566, 10) == (518, 352)
    # vectorized matches scalar
    lon = np.array([2.3522, 0.0, -179.9])
    lat = np.array([48.8566, 0.0, 80.0])
    tx, ty = tms.tile(lon, lat, 10)
    assert (tx[0], ty[0]) == (518, 352)


def test_xy_bounds_roundtrip():
    for z in (1, 5, 12):
        x, y = tms.tile(11.3, 47.1, z)
        w, s, e, n = tms.xy_bounds(z, x, y)
        mx, my = tms.lonlat_to_mercator(11.3, 47.1)
        assert w <= mx < e
        assert s < my <= n
        assert e - w == pytest.approx(tms.tile_span(z))
    # tile edge: a point exactly on the west/north edge belongs to the tile
    w, s, e, n = tms.xy_bounds(3, 2, 5)
    assert tms.mercator_tile(w, n, 3) == (2, 5)
    # … and the east/south edge belongs to the NEXT tile
    assert tms.mercator_tile(e, s, 3) == (3, 6)


def test_mercator_roundtrip():
    lon = np.linspace(-179.0, 179.0, 37)
    lat = np.linspace(-84.0, 84.0, 37)
    mx, my = tms.lonlat_to_mercator(lon, lat)
    lon2, lat2 = tms.mercator_to_lonlat(mx, my)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_tile_key_packing():
    z = np.array([0, 12, 29])
    x = np.array([0, 2049, (1 << 29) - 1])
    y = np.array([0, 1023, (1 << 29) - 1])
    key = tms.pack_tile_key(z, x, y)
    z2, x2, y2 = tms.unpack_tile_key(key)
    np.testing.assert_array_equal(z2, z)
    np.testing.assert_array_equal(x2, x)
    np.testing.assert_array_equal(y2, y)
    # SQL formula equivalence
    sql_key = z * 288230376151711744 + x * 536870912 + y
    np.testing.assert_array_equal(key, sql_key)
    # parent = one-level coarser
    parent = tms.parent_tile_key(tms.pack_tile_key(12, 2049, 1023))
    assert tms.unpack_tile_key(parent) == (11, 1024, 511)


def test_cell_encode_hierarchy():
    lon = np.array([2.3522, -73.99, 139.7, 0.0])
    lat = np.array([48.8566, 40.73, 35.68, 0.0])
    cell = tms.cell_encode(lon, lat, 14)
    lvl, x, y = tms.cell_to_tile(cell)
    tx, ty = tms.tile(lon, lat, 14)
    np.testing.assert_array_equal(x, tx)
    np.testing.assert_array_equal(y, ty)
    assert (lvl == 14).all()
    # parent at level 10 == direct encode at level 10
    parent = tms.cell_parent(cell, 10)
    direct = tms.cell_encode(lon, lat, 10)
    np.testing.assert_array_equal(parent, direct)
    # z-order locality: nearby points at same level share id prefixes
    assert len(np.unique(cell)) == 4


def test_get_zooms():
    # a web-mercator-native raster: bounds spanning ~1 tile at z=8 with
    # resolution exactly cell_size(8) → max_zoom 8
    span = tms.tile_span(8)
    bounds = (0.0, 0.0, span * 2, span * 2)
    minz, maxz = tms.get_zooms(bounds, float(tms.cell_size(8)), tilesize=256)
    assert maxz == 8
    # 512x512 grid, minsize 256 → 1 overview → minzoom = maxzoom-1
    assert minz == 7


def test_web_optimized_params_alignment():
    # unaligned bbox (pages_web recipe) at zoom 8, 3 aligned levels:
    # output must be a multiple of 256*2**3 cells and cover whole base tiles
    w, s = tms.lonlat_to_mercator(3.7, 41.3)
    e, n = tms.lonlat_to_mercator(19.9, 52.8)
    p = tms.web_optimized_params(
        (float(w), float(s), float(e), float(n)), zoom_level=8, aligned_levels=3
    )
    assert p.zoom == 8 and p.base_zoom == 5
    assert p.width % (256 * 8) == 0 and p.height % (256 * 8) == 0
    # origin is a tile corner at base_zoom
    ox, oy = tms.mercator_tile(p.origin_mx + 1e-3, p.origin_my - 1e-3, 5)
    ow, _, _, on = tms.xy_bounds(5, ox, oy)
    assert p.origin_mx == pytest.approx(ow)
    assert p.origin_my == pytest.approx(on)
    # cover bounds contain the input bbox
    min_x, min_y, max_x, max_y = p.tile_cover
    tx0, ty0 = tms.mercator_tile(w, n, 8)
    tx1, ty1 = tms.mercator_tile(e, s, 8)
    assert min_x <= tx0 and max_x >= tx1
    assert min_y <= ty0 and max_y >= ty1
    # aligned_levels=0 degenerates to snapping at max_zoom itself
    p0 = tms.web_optimized_params(
        (float(w), float(s), float(e), float(n)), zoom_level=8, aligned_levels=0
    )
    assert p0.base_zoom == 8
    assert p0.width % 256 == 0
    # resolution-driven zoom selection
    p1 = tms.web_optimized_params(
        (float(w), float(s), float(e), float(n)), resolution=float(tms.cell_size(9))
    )
    assert p1.zoom == 9


# ---------------------------------------------------------------------------
# Property-based conformance (hypothesis) — the engine analog of the
# reference's grid-alignment conformance suite (tests/test_web.py).
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_lons = st.floats(min_value=-179.999, max_value=179.999, allow_nan=False)
_lats = st.floats(min_value=-84.999, max_value=84.999, allow_nan=False)
_zooms = st.integers(min_value=0, max_value=18)


@settings(max_examples=200, deadline=None)
@given(lon=_lons, lat=_lats, z=_zooms)
def test_point_always_inside_assigned_tile(lon, lat, z):
    """tile(p, z) must contain p's mercator coords (utils.py:125-137
    semantics: half-open [w, e) x (s, n] except at the grid edge).
    Tolerance 1e-6 m: the floor((mx+O)/span) boundary can flip by one
    ulp of the 2e7-m mercator frame (~4e-9 m) — the documented
    boundary-rounding caveat (queries.py exactness doctrine), which is
    picometres, not a wrong tile."""
    import numpy as np
    x, y = tms.tile(np.array([lon]), np.array([lat]), z)
    w, s, e, n = tms.xy_bounds(z, int(x[0]), int(y[0]))
    mx, my = tms.lonlat_to_mercator(np.array([lon]), np.array([lat]))
    eps = 1e-6
    assert w - eps <= mx[0] <= e + eps
    assert s - eps <= my[0] <= n + eps


@settings(max_examples=200, deadline=None)
@given(lon=_lons, lat=_lats, z=st.integers(min_value=1, max_value=18))
def test_tile_parent_is_child_shift(lon, lat, z):
    """The tile at z-1 is the >>1 parent of the tile at z (the pyramid
    decimation invariant, cogeo.py:389 analog)."""
    import numpy as np
    x1, y1 = tms.tile(np.array([lon]), np.array([lat]), z)
    x0, y0 = tms.tile(np.array([lon]), np.array([lat]), z - 1)
    assert int(x0[0]) == int(x1[0]) >> 1
    assert int(y0[0]) == int(y1[0]) >> 1


@settings(max_examples=100, deadline=None)
@given(z=st.integers(min_value=0, max_value=24))
def test_zoom_for_res_inverts_cell_size(z):
    """zoom_for_res(cellSize(z)) == z for EVERY strategy at exact
    resolutions: morecantile (the reference's delegate, utils.py:74-78)
    applies the strategy only when the resolution is NOT an exact matrix
    match (relative tolerance 1e-8) — an exact 'lower' stays put."""
    res = tms.cell_size(z)
    assert tms.zoom_for_res(res, zoom_level_strategy="auto") == z
    assert tms.zoom_for_res(res, zoom_level_strategy="upper") == z
    assert tms.zoom_for_res(res, zoom_level_strategy="lower") == z
    # off-exact: 'lower' steps one coarser (the maxzoom-9-vs-8 pin,
    # tests/test_web.py:55-71)
    if z > 0:
        off = res * 1.01
        assert tms.zoom_for_res(off, zoom_level_strategy="lower") == max(z - 1, 0)
        # invalid strategy raises only when the strategy is consulted
        with pytest.raises(ValueError):
            tms.zoom_for_res(off, zoom_level_strategy="bogus")
    # exact match: invalid strategy passes through silently (morecantile)
    assert tms.zoom_for_res(res, zoom_level_strategy="bogus") == z


@settings(max_examples=200, deadline=None)
@given(lon=_lons, lat=_lats, z=st.integers(min_value=0, max_value=26))
def test_cell_encode_tile_consistency(lon, lat, z):
    """Morton cell at level z unpacks to the same (z, x, y) as direct
    tile assignment (H3/S2-style hierarchy == TMS grid)."""
    import numpy as np
    cell = tms.cell_encode(np.array([lon]), np.array([lat]), z)
    cz, cx, cy = tms.cell_to_tile(cell)
    x, y = tms.tile(np.array([lon]), np.array([lat]), z)
    assert (int(cz[0]), int(cx[0]), int(cy[0])) == (z, int(x[0]), int(y[0]))


def test_crs84_tile_grid():
    """WorldCRS84Quad: 2×1 tiles at z0; degree-grid floors; boundary →
    next tile; world edge clamps."""
    lon = np.array([-180.0, -0.0001, 0.0, 179.9999, 180.0])
    lat = np.array([90.0, 0.0001, 0.0, -89.9999, -90.0])
    x0, y0 = tms.crs84_tile(lon, lat, 0)
    assert x0.tolist() == [0, 0, 1, 1, 1]
    assert y0.tolist() == [0, 0, 0, 0, 0]
    # z=1: 4×2 grid, 90° cells
    x1, y1 = tms.crs84_tile(np.array([-91.0, -90.0, 89.0, 90.0]),
                            np.array([1.0, -1.0, 89.0, -89.0]), 1)
    assert x1.tolist() == [0, 1, 2, 3]
    assert y1.tolist() == [0, 1, 0, 1]
    # agreement with plain formula at a deeper level
    rng = np.random.default_rng(3)
    lo = rng.uniform(-180, 180, 500)
    la = rng.uniform(-90, 90, 500)
    x, y = tms.crs84_tile(lo, la, 6)
    span = 180.0 / 64
    np.testing.assert_array_equal(
        x, np.clip(np.floor((lo + 180.0) / span), 0, 127).astype(np.int64)
    )
    np.testing.assert_array_equal(
        y, np.clip(np.floor((90.0 - la) / span), 0, 63).astype(np.int64)
    )


def test_quad_tile_generalizes_builtin_grids():
    """quad_tile with the built-in grids' parameters reproduces
    mercator_tile and crs84_tile exactly (boundaries, clamps, ties);
    load_tms_json validates."""
    import json

    import numpy as np
    import pytest

    from rio_cogeo_ray.functions import tms

    rng = np.random.default_rng(6)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-85, 85, 500)
    # include exact boundary points
    lon[:4] = [-180.0, 0.0, 180.0, 179.999999]
    lat[:4] = [85.0, 0.0, -85.0, -84.999999]
    mx, my = tms.lonlat_to_mercator(lon, lat)
    O = 20037508.342789244
    merc_tms = {"origin_x": -O, "origin_y": O, "span_x": 2 * O,
                "span_y": 2 * O, "cols0": 1, "rows0": 1}
    crs84_tms = {"origin_x": -180.0, "origin_y": 90.0, "span_x": 360.0,
                 "span_y": 180.0, "cols0": 2, "rows0": 1}
    for z in (0, 3, 7):
        x1, y1 = tms.mercator_tile(mx, my, z)
        x2, y2 = tms.quad_tile(mx, my, z, merc_tms)
        np.testing.assert_array_equal(x1, x2)
        np.testing.assert_array_equal(y1, y2)
        a1, b1 = tms.crs84_tile(lon, lat, z)
        a2, b2 = tms.quad_tile(lon, lat, z, crs84_tms)
        np.testing.assert_array_equal(a1, a2)
        np.testing.assert_array_equal(b1, b2)

    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.json")
        with open(p, "w") as f:
            json.dump(merc_tms, f)
        assert tms.load_tms_json(p)["cols0"] == 1
        with open(p, "w") as f:
            json.dump({"origin_x": 0}, f)
        with pytest.raises(ValueError, match="missing"):
            tms.load_tms_json(p)


def test_quadkey_roundtrip_and_hierarchy():
    """functions/tms.py quadkeys: the Bing documentation pin
    (tile x=3, y=5, level=3 -> "213"), exact string roundtrip for
    random tiles, and the parent-prefix property."""
    rng = np.random.RandomState(5)
    z = 9
    x = rng.randint(0, 1 << z, 200).astype(np.int64)
    y = rng.randint(0, 1 << z, 200).astype(np.int64)
    qk = tms.tile_quadkey_int(x, y, z)
    for i in range(len(x)):
        s = str(qk[i]).zfill(z)
        assert tms.quadkey_to_tile(s) == (int(x[i]), int(y[i]), z)
    # Bing pin
    assert str(tms.tile_quadkey_int(np.array([3]), np.array([5]), 3)[0]).zfill(3) == "213"
    # parent quadkey is the child's string prefix
    pqk = tms.tile_quadkey_int(x >> 1, y >> 1, z - 1)
    for i in range(len(x)):
        assert str(qk[i]).zfill(z)[: z - 1] == str(pqk[i]).zfill(z - 1)
    with pytest.raises(ValueError):
        tms.tile_quadkey_int(x, y, 19)
    with pytest.raises(ValueError):
        tms.quadkey_to_tile("12a")
