"""End-to-end: distributed create() vs single-node oracle, bit-for-bit.

The engine analog of the reference's byte-identical internal-tile checks
(tests/test_web.py:158-238) and GDAL cross-validation
(tests/test_web.py:303-405): every pyramid level produced by the Ray
pipeline must equal the oracle tiler exactly — same tile set, same
sparse cells, same int64 counts, same page counts.
"""

import os
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from rio_cogeo_ray import fixtures, oracle
from rio_cogeo_ray.pipelines import create as create_mod
from rio_cogeo_ray.pipelines.spec import TilingSpec, plan
from rio_cogeo_ray.state import manifest as mani


def _spec_for(name: str, zoom: int = 7, **kw) -> TilingSpec:
    return plan(zoom=zoom, geocode=fixtures.scenario_spec(name), **kw)


def _load_level(out_dir: str, z: int):
    t = pq.read_table(mani.level_dir(out_dir, z))
    rows = {}
    for i in range(t.num_rows):
        rows[t["tile_key"][i].as_py()] = (
            np.array(t["cells"][i].as_py(), dtype=np.int64),
            np.array(t["counts"][i].as_py(), dtype=np.int64),
            t["page_count"][i].as_py(),
        )
    return rows


def _assert_levels_equal(out_dir: str, spec, oracle_levels):
    for z, otiles in oracle_levels.items():
        etiles = _load_level(out_dir, z)
        assert set(etiles) == set(otiles), f"tile set mismatch at z={z}"
        for k in otiles:
            oc, ow, op = otiles[k]
            ec, ew, ep = etiles[k]
            np.testing.assert_array_equal(ec, oc, err_msg=f"cells z={z} key={k}")
            np.testing.assert_array_equal(ew, ow, err_msg=f"counts z={z} key={k}")
            assert ep == op, f"page_count z={z} key={k}"


@pytest.mark.parametrize(
    "scenario,resampling",
    [
        ("pages_rgb", "sum"),
        ("pages_nodata", "sum"),
        ("pages_web", "average"),
        ("pages_skew", "sum"),
        ("pages_tiny", "nearest"),
        ("pages_north", "mode"),
        # interpolating kernels (the remaining reference resampling enum,
        # rio_cogeo/cogeo.py:48-60; exercised by tests/test_cli.py:203,489)
        ("pages_rgb", "bilinear"),
        ("pages_web", "cubic"),
        ("pages_nodata", "cubic_spline"),
        ("pages_north", "lanczos"),
        ("pages_tiny", "gauss"),
        # root-mean-square (reference enum slot cogeo.py:57): squared
        # child values through the additive merge, floor-sqrt per level
        ("pages_rgb", "rms"),
        ("pages_skew", "rms"),
    ],
)
def test_create_matches_oracle(ray_session, tmp_path, scenario, resampling):
    path = fixtures.scenario_path(scenario)
    spec = _spec_for(scenario, zoom=7, resampling=resampling, overview_levels=4)
    out = str(tmp_path / f"out_{scenario}")

    m = create_mod.create(path, out, spec, source="pages", batch_size=512)
    table = pq.read_table(path)
    oracle_levels = oracle.pyramid(table, spec, source="pages")
    _assert_levels_equal(out, spec, oracle_levels)

    # manifest bookkeeping
    base = m.levels[0]
    assert base.z == spec.zoom
    assert m.total_pages == table.num_rows
    assert base.pages == sum(p for (_, _, p) in oracle_levels[spec.zoom].values())
    assert m.invalid_pages == m.total_pages - base.pages
    # pyramid conservation for summable kernels: pages identical per level
    for lv in m.levels[1:]:
        assert lv.pages == base.pages


@pytest.mark.parametrize(
    "base,resampling",
    [
        # arbitrary decimation bases (reference tests/test_cogeo.py:818-835,
        # validation cogeo.py:196-203): non-power-of-two ladders run on
        # pseudo-zoom ordinals over iterated ceil-div world grids; base 4
        # stays a real TMS ladder (2 zooms per step).
        (3, "sum"),
        (3, "bilinear"),
        (3, "rms"),
        (5, "mode"),
        (4, "sum"),
        (4, "cubic"),
    ],
)
def test_create_decimation_bases(ray_session, tmp_path, base, resampling):
    path = fixtures.scenario_path("pages_rgb")
    spec = _spec_for(
        "pages_rgb", zoom=7, resampling=resampling,
        decimation_base=base, overview_levels=3,
    )
    assert spec.decimations == [base**j for j in range(1, spec.n_levels + 1)]
    out = str(tmp_path / f"out_base{base}_{resampling}")
    m = create_mod.create(path, out, spec, source="pages", batch_size=512)
    table = pq.read_table(path)
    oracle_levels = oracle.pyramid(table, spec, source="pages")
    _assert_levels_equal(out, spec, oracle_levels)
    # page conservation holds for every kernel (attribution is exact-once)
    for lv in m.levels[1:]:
        assert lv.pages == m.levels[0].pages
    from rio_cogeo_ray.pipelines import validate as validate_mod

    ok, errs, _ = validate_mod.validate(out)
    assert ok, errs


def test_create_conv_aligned_cover(ray_session, tmp_path):
    """Interpolating kernel + web-optimized cover: ringing is clipped to
    the aligned cover at every level; engine matches oracle exactly."""
    path = fixtures.scenario_path("pages_web")
    spec = plan(
        zoom=8, geocode=fixtures.scenario_spec("pages_web"),
        aligned_levels=2, overview_levels=3, resampling="bilinear",
    )
    out = str(tmp_path / "out_conv_aligned")
    m = create_mod.create(path, out, spec, source="pages", batch_size=512)
    import dataclasses

    spec_c = dataclasses.replace(spec, tile_cover=tuple(m.spec["tile_cover"]))
    table = pq.read_table(path)
    oracle_levels = oracle.pyramid(table, spec_c, source="pages")
    _assert_levels_equal(out, spec_c, oracle_levels)


def test_create_aligned_cover(ray_session, tmp_path):
    """Web-optimized alignment: measured bounds snapped at base_zoom
    (utils.py:88-147 analog); all tiles inside the aligned cover."""
    path = fixtures.scenario_path("pages_web")
    spec = plan(
        zoom=8, geocode=fixtures.scenario_spec("pages_web"),
        aligned_levels=2, overview_levels=3,
    )
    out = str(tmp_path / "out_aligned")
    m = create_mod.create(path, out, spec, source="pages", batch_size=512)
    # spec in manifest got a cover; cover is aligned to base_zoom grid
    cover = m.spec["tile_cover"]
    assert cover is not None
    min_x, min_y, max_x, max_y = cover
    factor = 1 << 2
    assert min_x % factor == 0 and min_y % factor == 0
    assert (max_x + 1) % factor == 0 and (max_y + 1) % factor == 0
    idx = pq.read_table(os.path.join(mani.manifest_dir(out), "tiles_index"))
    base_rows = idx.filter(
        np.equal(idx["z"].to_numpy(zero_copy_only=False), 8)
    ) if False else None
    xs = idx["x"].to_numpy(zero_copy_only=False)
    ys = idx["y"].to_numpy(zero_copy_only=False)
    zs = idx["z"].to_numpy(zero_copy_only=False)
    at_base = zs == 8
    assert xs[at_base].min() >= min_x and xs[at_base].max() <= max_x
    assert ys[at_base].min() >= min_y and ys[at_base].max() <= max_y


def test_resume_skips_completed_levels(ray_session, tmp_path):
    """Checkpoint-resume: a second run with intact markers recomputes
    nothing (level dirs untouched); a corrupted level is detected."""
    path = fixtures.scenario_path("pages_rgb")
    spec = _spec_for("pages_rgb", zoom=6, overview_levels=3)
    out = str(tmp_path / "out_resume")
    create_mod.create(path, out, spec, source="pages", batch_size=512)

    mtimes = {
        z: os.path.getmtime(mani.level_dir(out, z)) for z in spec.zooms
    }
    create_mod.create(path, out, spec, source="pages", batch_size=512)
    for z in spec.zooms:
        assert os.path.getmtime(mani.level_dir(out, z)) == mtimes[z], z

    # corrupt one level → that level (only) is rebuilt
    victim = spec.zooms[1]
    d = mani.level_dir(out, victim)
    for f in os.listdir(d):
        os.remove(os.path.join(d, f))
    create_mod.create(path, out, spec, source="pages", batch_size=512)
    t = pq.read_table(d)
    assert t.num_rows > 0


def test_resume_rejects_changed_input(ray_session, tmp_path):
    """Level markers record a source fingerprint: rerunning create() over
    a CHANGED src rebuilds everything instead of mixing stale levels
    with fresh totals (the stale-resume hazard)."""
    import pyarrow.parquet as pq2

    table = fixtures.scenario_table("pages_rgb")
    src = str(tmp_path / "src.parquet")
    pq2.write_table(table, src)
    spec = _spec_for("pages_rgb", zoom=6, overview_levels=2)
    out = str(tmp_path / "out_fp")
    create_mod.create(src, out, spec, source="pages", batch_size=512)
    mtimes = {z: os.path.getmtime(mani.level_dir(out, z)) for z in spec.zooms}

    # same input → nothing rebuilt
    create_mod.create(src, out, spec, source="pages", batch_size=512)
    assert all(os.path.getmtime(mani.level_dir(out, z)) == mtimes[z] for z in spec.zooms)

    # shrink the input → fingerprint mismatch → all levels rebuilt and
    # manifest totals consistent with the new corpus
    pq2.write_table(table.slice(0, 2000), src)
    m = create_mod.create(src, out, spec, source="pages", batch_size=512)
    assert all(os.path.getmtime(mani.level_dir(out, z)) != mtimes[z] for z in spec.zooms)
    assert m.total_pages == 2000
    assert 0 <= m.invalid_pages <= 2000


def test_resume_rejects_changed_spec(ray_session, tmp_path):
    """A rerun with a DIFFERENT plan (resampling kernel) over the same
    input must rebuild — not relabel sum-kernel tiles as bilinear."""
    path = fixtures.scenario_path("pages_rgb")
    out = str(tmp_path / "out_specfp")
    spec_sum = _spec_for("pages_rgb", zoom=5, overview_levels=1, resampling="sum")
    create_mod.create(path, out, spec_sum, source="pages", batch_size=512)
    mtimes = {z: os.path.getmtime(mani.level_dir(out, z)) for z in spec_sum.zooms}

    spec_bil = _spec_for("pages_rgb", zoom=5, overview_levels=1, resampling="bilinear")
    create_mod.create(path, out, spec_bil, source="pages", batch_size=512)
    assert all(
        os.path.getmtime(mani.level_dir(out, z)) != mtimes[z] for z in spec_bil.zooms
    )
    # the rebuilt output matches the bilinear oracle (not stale sum tiles)
    table = pq.read_table(path)
    oracle_levels = oracle.pyramid(table, spec_bil, source="pages")
    _assert_levels_equal(out, spec_bil, oracle_levels)


def test_extract_invariant_on_fixture():
    """Per-row invariant: stored text == extract_text(html) everywhere."""
    t = fixtures.scenario_table("pages_rgb")
    assert oracle.verify_text_invariant(t) == 0


def test_weighted_density_matches_oracle(ray_session, tmp_path):
    """Integer weight channel (band-value analog) through the shuffle."""
    import pyarrow as pa
    import pyarrow.compute as pc

    path = fixtures.scenario_path("pages_rgb")
    table = pq.read_table(path)
    # weight = text length in bytes (int64, deterministic)
    w = pc.binary_length(table["text"]).cast(pa.int64())
    table = table.append_column("text_len", w)
    wpath = str(tmp_path / "pages_w.parquet")
    pq.write_table(table, wpath)

    spec = _spec_for("pages_rgb", zoom=6, overview_levels=2)
    out = str(tmp_path / "out_w")
    create_mod.create(wpath, out, spec, source="pages", weight_col="text_len", batch_size=512)
    oracle_levels = oracle.pyramid(table, spec, source="pages", weight_col="text_len")
    _assert_levels_equal(out, spec, oracle_levels)


def test_nan_weight_channel(ray_session, tmp_path):
    """pages_nan (image_nan analog): a float weight channel with NaNs —
    NaN-weight pages are nodata (dropped from grid + page counts);
    finite weights quantize to 1/256 fixed point; engine == oracle."""
    path = fixtures.scenario_path("pages_nan")
    table = pq.read_table(path)
    assert "score" in table.column_names
    import numpy as np2

    scores = table["score"].to_numpy(zero_copy_only=False)
    n_nan = int(np2.isnan(scores).sum())
    assert n_nan > 0

    spec = _spec_for("pages_nan", zoom=6, overview_levels=2)
    out = str(tmp_path / "out_nan")
    m = create_mod.create(
        path, out, spec, source="pages", weight_col="score", batch_size=512
    )
    oracle_levels = oracle.pyramid(table, spec, source="pages", weight_col="score")
    _assert_levels_equal(out, spec, oracle_levels)
    # NaN pages count as invalid alongside geocode-invalid ones
    assert m.invalid_pages >= n_nan


def test_pages_big_validator_paths(ray_session, tmp_path):
    """pages_big (image_2000px analog): built without overviews → the
    overviews-recommended warning (strict ⇒ error); a base level
    claiming a single tile over a multi-tile extent → the not-tiled
    error (cogeo.py:526-531 analog)."""
    from rio_cogeo_ray.pipelines import validate as validate_mod

    path = fixtures.scenario_path("pages_big")
    spec = _spec_for("pages_big", zoom=6, overview_levels=0)
    out = str(tmp_path / "out_big")
    create_mod.create(path, out, spec, source="pages", batch_size=512)

    ok, errs, warns = validate_mod.validate(out)
    assert ok and any("overview" in w for w in warns)
    ok_strict, errs_strict, _ = validate_mod.validate(out, strict=True)
    assert not ok_strict

    # not-tiled analog: manifest says ONE base tile, extent spans many
    m = mani.load_manifest(out)
    m.levels[0].tiles = 1
    mani.write_manifest(out, m)
    ok2, errs2, _ = validate_mod.validate(out)
    assert not ok2 and any("not tiled" in e for e in errs2)


def test_colormap_user_supplied(ray_session, tmp_path):
    """pages_colormap (image_colormap analog): a user-supplied colormap
    drives the categorical broadcast join; create() forwards the
    colormap into the manifest and info() surfaces it."""
    from rio_cogeo_ray.pipelines import info as info_mod
    from rio_cogeo_ray.pipelines.queries import q_lang_categories

    cmap = {"en": (10, "#111111"), "de": (20, "#222222"), "fr": (20, "#222222"),
            "es": (30, "#333333"), "zh": (30, "#333333")}
    got = q_lang_categories("/root/testdata/sf0.001", colormap=cmap).to_pandas()
    import duckdb

    ref = duckdb.sql(
        "SELECT c.category, c.color, CAST(SUM(d.n_chars) AS BIGINT) AS sum_n_chars, "
        "CAST(COUNT(*) AS BIGINT) AS n "
        "FROM read_parquet('/root/testdata/sf0.001/documents.parquet') d "
        "JOIN (VALUES ('en',10,'#111111'),('de',20,'#222222'),('fr',20,'#222222'),"
        "('es',30,'#333333'),('zh',30,'#333333')) AS c(lang, category, color) "
        "ON d.lang = c.lang GROUP BY c.category, c.color"
    ).df()
    g = got.sort_values(["category", "color"]).reset_index(drop=True)
    r = ref.sort_values(["category", "color"]).reset_index(drop=True)
    assert g["category"].astype(int).tolist() == r["category"].astype(int).tolist()
    assert g["sum_n_chars"].tolist() == r["sum_n_chars"].tolist()
    assert g["n"].tolist() == r["n"].tolist()

    path = fixtures.scenario_path("pages_colormap")
    spec = _spec_for("pages_colormap", zoom=5, overview_levels=1)
    out = str(tmp_path / "out_cmap")
    create_mod.create(
        path, out, spec, source="pages", batch_size=512,
        colormap={1: "#ff0000", 2: "#00ff00"},
    )
    inf = info_mod.info(out)
    assert inf.Colormap == {"1": "#ff0000", "2": "#00ff00"}


def test_band_metadata_roundtrip(ray_session, tmp_path):
    """pages_tags (image_tags/cog_band_tags analog): dataset tags, band
    tags and scales/offsets forward create() → manifest → info()."""
    from rio_cogeo_ray.pipelines import info as info_mod

    path = fixtures.scenario_path("pages_tags")
    spec = _spec_for("pages_tags", zoom=5, overview_levels=1)
    out = str(tmp_path / "out_tags")
    create_mod.create(
        path, out, spec, source="pages", batch_size=512,
        tags={"OVR_RESAMPLING_ALG": "SUM", "origin": "unit-test"},
        band_tags={"count": {"DESCRIPTION": "page density"}},
        band_scales={"count": 2.0},
        band_offsets={"count": 0.5},
    )
    inf = info_mod.info(out)
    assert inf.Tags["origin"] == "unit-test"
    bands = {b.Name: b for b in inf.Bands}
    assert bands["count"].Tags == {"DESCRIPTION": "page density"}
    assert bands["count"].Scale == 2.0
    assert bands["count"].Offset == 0.5


def test_export_dense_matches_oracle_grids(ray_session, tmp_path):
    """export_dense (the raster export path): exact float grids equal
    the oracle's scattered counts; lossy export quantizes to uint8 with
    per-tile max scaling."""
    path = fixtures.scenario_path("pages_rgb")
    spec = _spec_for("pages_rgb", zoom=5, overview_levels=1, resampling="average")
    out = str(tmp_path / "out_export")
    create_mod.create(path, out, spec, source="pages", batch_size=512)
    table = pq.read_table(path)
    oracle_levels = oracle.pyramid(table, spec, source="pages")

    # base level exact export
    got = dict(create_mod.export_dense(out, spec.zoom))
    base = oracle_levels[spec.zoom]
    assert set(got) == set(base)
    for k, (cells, counts, _p) in base.items():
        g = np.zeros(spec.tile_px * spec.tile_px, dtype=np.float32)
        g[cells] = counts.astype(np.float32)
        np.testing.assert_array_equal(got[k], g.reshape(spec.tile_px, spec.tile_px))

    # overview level: 'average' divides by base**(2*level) at export
    z1 = spec.zooms[1]
    got1 = dict(create_mod.export_dense(out, z1))
    ov = oracle_levels[z1]
    for k, (cells, counts, _p) in ov.items():
        g = np.zeros(spec.tile_px * spec.tile_px, dtype=np.float32)
        g[cells] = counts.astype(np.float32) / 4.0
        np.testing.assert_array_equal(got1[k], g.reshape(spec.tile_px, spec.tile_px))

    # lossy export: uint8, max-scaled per tile
    lossy = dict(create_mod.export_dense(out, spec.zoom, lossy=True))
    for k, grid in lossy.items():
        assert grid.dtype == np.uint8
        if got[k].max() > 0:
            assert grid.max() == 255


def test_measure_bounds_and_extract_stage(ray_session):
    """measure_bounds == direct min/max of the prepared mercator coords;
    assign.verify_extract_invariant counts zero mismatches on fixtures
    and detects an injected corruption."""
    import pyarrow as pa

    import ray.data as rd

    from rio_cogeo_ray.stages import assign

    path = fixtures.scenario_path("pages_tiny")
    spec = _spec_for("pages_tiny", zoom=6)
    w, s, e, n = create_mod.measure_bounds(path, spec, source="pages")

    table = pq.read_table(path)
    prep = oracle.prepare(table, spec, source="pages")
    mx = prep["mx"].to_pandas().dropna()
    my = prep["my"].to_pandas().dropna()
    assert (w, s, e, n) == (mx.min(), my.min(), mx.max(), my.max())

    ok = assign.verify_extract_invariant(table)
    assert ok["mismatches"][0].as_py() == 0
    bad = table.set_column(
        table.column_names.index("text"), "text",
        pa.array(["CORRUPT"] + table["text"].to_pylist()[1:], pa.string()),
    )
    assert assign.verify_extract_invariant(bad)["mismatches"][0].as_py() == 1


def test_export_dense_dtype_override(ray_session, tmp_path):
    """dtype override on export (cog_translate dtype param analog)."""
    path = fixtures.scenario_path("pages_tiny")
    spec = _spec_for("pages_tiny", zoom=5, overview_levels=0)
    out = str(tmp_path / "out_dtype")
    create_mod.create(path, out, spec, source="pages", batch_size=512)
    f32 = dict(create_mod.export_dense(out, 5))
    i64 = dict(create_mod.export_dense(out, 5, dtype="int64"))
    f64 = dict(create_mod.export_dense(out, 5, dtype="float64"))
    for k in f32:
        assert f32[k].dtype == np.float32
        assert i64[k].dtype == np.int64
        assert f64[k].dtype == np.float64
        np.testing.assert_array_equal(i64[k], f32[k].astype(np.int64))


def test_append_equals_full_create(ray_session, tmp_path):
    """Incremental append (delta ingest): create(A) + append(B) is
    BIT-IDENTICAL to create(A ∪ B) — tiles, counts, pages, manifest
    totals (additive kernels only; others refuse)."""
    import pyarrow.parquet as pq2

    from rio_cogeo_ray import errors as errors_mod

    table = fixtures.scenario_table("pages_rgb")
    half = table.num_rows // 2
    a_path = str(tmp_path / "a.parquet")
    b_path = str(tmp_path / "b.parquet")
    pq2.write_table(table.slice(0, half), a_path)
    pq2.write_table(table.slice(half), b_path)
    full_path = str(tmp_path / "full.parquet")
    pq2.write_table(table, full_path)

    spec = _spec_for("pages_rgb", zoom=6, overview_levels=2)
    out_inc = str(tmp_path / "out_inc")
    out_full = str(tmp_path / "out_full")
    create_mod.create(a_path, out_inc, spec, source="pages", batch_size=512)
    m_inc = create_mod.append(b_path, out_inc, batch_size=512)
    m_full = create_mod.create(full_path, out_full, spec, source="pages", batch_size=512)

    assert m_inc.total_pages == m_full.total_pages == table.num_rows
    assert m_inc.invalid_pages == m_full.invalid_pages
    for z in spec.zooms:
        inc = _load_level(out_inc, z)
        ful = _load_level(out_full, z)
        assert set(inc) == set(ful), z
        for k in ful:
            np.testing.assert_array_equal(inc[k][0], ful[k][0])
            np.testing.assert_array_equal(inc[k][1], ful[k][1])
            assert inc[k][2] == ful[k][2]

    from rio_cogeo_ray.pipelines import validate as validate_mod

    ok, errs, _ = validate_mod.validate(out_inc)
    assert ok, errs

    # non-additive kernels refuse at plan time
    out_mode = str(tmp_path / "out_mode")
    spec_mode = _spec_for("pages_rgb", zoom=5, overview_levels=1, resampling="mode")
    create_mod.create(a_path, out_mode, spec_mode, source="pages", batch_size=512)
    import pytest as _pytest

    with _pytest.raises(errors_mod.IncompatibleOptions):
        create_mod.append(b_path, out_mode)


def test_resume_after_simulated_mid_write_crash(ray_session, tmp_path):
    """Crash-mid-write: kill between the level-dir rmtree and the
    tmp→final rename — the worst interleaving the atomic sink allows
    (a stale .tmp-z dir exists, the final level dir does not). Resume
    must rebuild that level, clear the stale tmp, and converge to the
    same tiles as an uninterrupted run."""
    import shutil

    path = fixtures.scenario_path("pages_rgb")
    spec = _spec_for("pages_rgb", zoom=6, overview_levels=3)
    ref_out = str(tmp_path / "out_ref")
    create_mod.create(path, ref_out, spec, source="pages", batch_size=512)

    out = str(tmp_path / "out_crash")
    create_mod.create(path, out, spec, source="pages", batch_size=512)
    victim = spec.zooms[1]
    # simulate the crash window: final level gone, half-written tmp left
    shutil.rmtree(mani.level_dir(out, victim))
    tmp = os.path.join(out, "tiles", f".tmp-z={victim}")
    os.makedirs(tmp, exist_ok=True)
    with open(os.path.join(tmp, "partial.parquet"), "wb") as f:
        f.write(b"not a parquet file")

    create_mod.create(path, out, spec, source="pages", batch_size=512)
    assert not os.path.exists(tmp)
    got = pq.read_table(mani.level_dir(out, victim))
    want = pq.read_table(mani.level_dir(ref_out, victim))
    key = ["z", "x", "y"]
    assert got.sort_by([(k, "ascending") for k in key]).equals(
        want.sort_by([(k, "ascending") for k in key])
    )


def test_web_prep_checkpoint_resume(ray_session, tmp_path):
    """Kill/restart the flagship FILTER→DEDUP→SCORE chain: a run killed
    after the survivors boundary resumes from it (gates never
    recompute), a completed run resumes from the dedup boundary, and
    output is bit-identical to an uninterrupted run. Config changes
    invalidate downstream boundaries (no silent relabeling)."""
    import pandas as pd
    import pytest as _pytest

    from rio_cogeo_ray.pipelines import prep
    from rio_cogeo_ray.stages import text as text_mod

    src = "/root/testdata/sf0.001/documents.parquet"

    def _norm(ds):
        return (
            ds.to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
            [["doc_id", "text_clean", "n_kept", "surprisal_bits", "n_tokens"]]
        )

    ref = _norm(prep.web_prep(src, str(tmp_path / "clean")))
    assert len(ref) > 0

    def boom(*a, **k):
        raise RuntimeError("killed")

    # run killed BETWEEN stages: survivors boundary persists, dedup dies
    w = str(tmp_path / "resumed")
    with _pytest.MonkeyPatch.context() as mp:
        mp.setattr(text_mod, "segment_dedup", boom)
        with _pytest.raises(RuntimeError):
            prep.web_prep(src, w).count()
    import os

    assert os.path.exists(os.path.join(w, "survivors.marker.json"))
    assert not os.path.exists(os.path.join(w, "deduped.marker.json"))

    # restart: the gate stage must NOT recompute (poisoned) — resume
    # reads the survivors boundary, runs dedup, output bit-identical
    with _pytest.MonkeyPatch.context() as mp:
        mp.setattr(text_mod, "gopher_repetition", boom)
        out = _norm(prep.web_prep(src, w))
    pd.testing.assert_frame_equal(out, ref)

    # restart after completion: NEITHER stage recomputes
    with _pytest.MonkeyPatch.context() as mp:
        mp.setattr(text_mod, "gopher_repetition", boom)
        mp.setattr(text_mod, "segment_dedup", boom)
        out2 = _norm(prep.web_prep(src, w))
    pd.testing.assert_frame_equal(out2, ref)

    # config change invalidates the dedup boundary but not survivors:
    # the (poisoned) dedup stage is reached again
    with _pytest.MonkeyPatch.context() as mp:
        mp.setattr(text_mod, "gopher_repetition", boom)
        mp.setattr(text_mod, "segment_dedup", boom)
        with _pytest.raises(RuntimeError):
            prep.web_prep(src, w, seg_words=11).count()

    # resume=False always rebuilds end to end, same bits
    out3 = _norm(prep.web_prep(src, w, resume=False))
    pd.testing.assert_frame_equal(out3, ref)


def test_corpus_to_shards_checkpoint_resume(ray_session, tmp_path):
    """Kill/restart the corpus->shards chain: a run killed after the
    chunks boundary resumes from it (prep never recomputes), the shard
    write is idempotent via its manifest fingerprint, and shard bytes
    are identical to an uninterrupted run. A chunking-config change
    invalidates everything downstream."""
    import glob
    import hashlib
    import os

    import pytest as _pytest

    from rio_cogeo_ray.pipelines import prep
    from rio_cogeo_ray.stages import shard as shard_mod
    from rio_cogeo_ray.stages import text as text_mod

    src = "/root/testdata/sf0.001/documents.parquet"

    def shard_digest(wd):
        out = {}
        for d in sorted(glob.glob(os.path.join(wd, "shards", "shard=*"))):
            h = hashlib.sha256()
            for f in sorted(glob.glob(os.path.join(d, "*.parquet"))):
                import pyarrow.parquet as pq

                t = pq.read_table(f)
                h.update(str(t.sort_by([("cid", "ascending")]).to_pydict()).encode())
            out[os.path.basename(d)] = h.hexdigest()
        return out

    ref_wd = str(tmp_path / "clean")
    m_ref = prep.corpus_to_shards(src, ref_wd, num_shards=3)
    assert sum(m_ref["shard_rows"].values()) > 0
    ref_digest = shard_digest(ref_wd)

    def boom(*a, **k):
        raise RuntimeError("killed")

    # killed between boundary and shard write
    w = str(tmp_path / "resumed")
    with _pytest.MonkeyPatch.context() as mp:
        mp.setattr(shard_mod, "write_shards", boom)
        with _pytest.raises(RuntimeError):
            prep.corpus_to_shards(src, w, num_shards=3)
    assert os.path.exists(os.path.join(w, "chunks.marker.json"))
    assert not os.path.exists(os.path.join(w, "shards", "_manifest.json"))

    # restart: prep must NOT recompute (poisoned QualityScore) — the
    # chunks boundary reads back and only the shard write runs
    with _pytest.MonkeyPatch.context() as mp:
        mp.setattr(text_mod, "QualityScore", boom)
        m = prep.corpus_to_shards(src, w, num_shards=3)
    assert m["shard_rows"] == m_ref["shard_rows"]
    assert shard_digest(w) == ref_digest

    # full restart after completion: the write is skipped too (the
    # manifest fingerprint matches; rows unchanged)
    with _pytest.MonkeyPatch.context() as mp:
        mp.setattr(text_mod, "QualityScore", boom)
        m2 = prep.corpus_to_shards(src, w, num_shards=3)
    assert m2["shard_rows"] == m_ref["shard_rows"]
    assert shard_digest(w) == ref_digest

    # chunk-config change invalidates the boundary AND the shard
    # fingerprint: the (poisoned) prep stage is reached again — boom
    # runs as a remote map UDF here, so the RuntimeError arrives
    # wrapped in RayTaskError
    with _pytest.MonkeyPatch.context() as mp:
        mp.setattr(text_mod, "QualityScore", boom)
        with _pytest.raises(Exception, match="killed"):
            prep.corpus_to_shards(src, w, num_shards=3, window=100)


def _kill_worker_once(sentinel_path):
    """Identity map stage whose FIRST claimant hard-kills its worker
    process (os._exit — a SYSTEM failure, so Ray's task retry kicks in,
    unlike an application exception). The O_EXCL sentinel guarantees
    exactly one death across all workers and retries."""

    def f(t):
        import os as _os

        try:
            fd = _os.open(sentinel_path, _os.O_CREAT | _os.O_EXCL | _os.O_WRONLY)
        except FileExistsError:
            return t
        _os.close(fd)
        _os._exit(1)

    return f


def _level_signature(out_dir):
    sig = {}
    m = mani.load_manifest(out_dir)
    for lv in m.levels:
        t = pq.read_table(mani.level_dir(out_dir, lv.z))
        t = t.sort_by([("tile_key", "ascending")])
        sig[lv.z] = (lv.tiles, lv.pages, t.to_pydict())
    return sig


def test_create_survives_worker_death(ray_session, tmp_path):
    """A worker hard-killed mid-create (first claimant of the sentinel
    exits) is retried by Ray and the pyramid comes out bit-identical to
    an uninjected run — the idempotent-sink + task-retry claim of the
    100x-cluster design, finally exercised against a REAL worker death
    (the kill/restart pytests only ever killed the driver)."""
    import ray.data as rd

    src = "/root/testdata/sf0.001/documents.parquet"
    spec = plan(zoom=4, overview_levels=2, tile_px=32)

    clean = str(tmp_path / "clean")
    create_mod.create(src, clean, spec, source="documents")

    sentinel = str(tmp_path / "killed.flag")
    injected = str(tmp_path / "injected")
    ds = rd.read_parquet(src, columns=["doc_id"]).map_batches(
        _kill_worker_once(sentinel), batch_format="pyarrow"
    )
    create_mod.create(ds, injected, spec, source="documents")
    assert os.path.exists(sentinel), "injection never fired"
    assert _level_signature(injected) == _level_signature(clean)


def test_web_prep_survives_worker_death(ray_session, tmp_path, monkeypatch):
    """Same worker-death injection through web_prep's corpus read: one
    worker dies on its first batch, Ray retries, and the scored output
    is bit-identical to the uninjected chain."""
    import ray.data as rd

    from rio_cogeo_ray.pipelines import prep

    src = "/root/testdata/sf0.001/documents.parquet"
    clean = (
        prep.web_prep(src, str(tmp_path / "wp_clean"))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    sentinel = str(tmp_path / "killed.flag")
    real_read = rd.read_parquet

    def wrapped_read(*args, **kwargs):
        return real_read(*args, **kwargs).map_batches(
            _kill_worker_once(sentinel), batch_format="pyarrow"
        )

    monkeypatch.setattr(rd, "read_parquet", wrapped_read)
    injected = (
        prep.web_prep(src, str(tmp_path / "wp_injected"))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    monkeypatch.undo()
    assert os.path.exists(sentinel), "injection never fired"
    assert injected.equals(clean)


def test_overview_blocksize(ray_session, tmp_path):
    """--overview-blocksize analog (GDAL_TIFF_OVR_BLOCKSIZE, reference
    cli.py:141-144): overview levels run their own grid. Hand-computed:
    z1 base at G=4 over 2x2 world tiles, one overview at ob=2 -> pixel
    decimation f = 2*4/2 = 4, so each z0 cell is the sum of one full z1
    tile quadrant. Plus the option guards."""
    import pyarrow as pa
    import pyarrow.parquet as pq_mod

    from rio_cogeo_ray import errors as rerrors

    pts = pa.table(
        {
            "lon": pa.array([-90.0, -91.0, -92.0, 90.0, 91.0]),
            "lat": pa.array([40.0, 41.0, 42.0, -40.0, -41.0]),
        }
    )
    src = str(tmp_path / "pts.parquet")
    pq_mod.write_table(pts, src)
    out = str(tmp_path / "ovr")
    spec = plan(zoom=1, overview_levels=1, tile_px=4, overview_blocksize=2)
    create_mod.create(src, out, spec, source="lonlat")

    t = pq.read_table(mani.level_dir(out, 0))
    assert t.num_rows == 1
    cells = dict(zip(t["cells"][0].as_py(), t["counts"][0].as_py()))
    # NW quadrant (cell 0) holds 3 pages, SE (cell 3) holds 2
    assert cells == {0: 3, 3: 2}
    assert t["page_count"][0].as_py() == 5

    # validate accepts the mixed-grid pyramid (per-level G spot check)
    from rio_cogeo_ray.pipelines.validate import validate as _v

    ok, errs, _ = _v(out, strict=True)
    assert ok, errs

    # round-trips through the manifest
    spec2 = create_mod.spec_from_manifest(mani.load_manifest(out))
    assert spec2.overview_blocksize == 2

    # guards: incompatible kernel, non-divisible grid, non-pow2
    with pytest.raises(rerrors.IncompatibleOptions, match="sum/nearest/mode"):
        plan(zoom=1, tile_px=4, overview_blocksize=2, resampling="average")
    with pytest.raises(rerrors.IncompatibleOptions, match="evenly divide"):
        plan(zoom=1, tile_px=4, overview_blocksize=16)
    with pytest.raises(rerrors.IncompatibleOptions, match="power of two"):
        plan(zoom=1, tile_px=4, overview_blocksize=3)


def test_append_with_overview_blocksize(ray_session, tmp_path):
    """append() onto an --overview-blocksize pyramid rebuilds the
    overviews at the OVERRIDE grid (it previously would have used the
    base grid): append two more NW points; the z0 quadrant sums grow
    accordingly and validate stays green."""
    import pyarrow as pa
    import pyarrow.parquet as pq_mod

    pts = pa.table(
        {
            "lon": pa.array([-90.0, -91.0, 90.0]),
            "lat": pa.array([40.0, 41.0, -40.0]),
        }
    )
    src = str(tmp_path / "pts.parquet")
    pq_mod.write_table(pts, src)
    out = str(tmp_path / "ovr")
    spec = plan(zoom=1, overview_levels=1, tile_px=4, overview_blocksize=2)
    create_mod.create(src, out, spec, source="lonlat")

    more = pa.table(
        {"lon": pa.array([-93.0, -94.0]), "lat": pa.array([43.0, 44.0])}
    )
    src2 = str(tmp_path / "more.parquet")
    pq_mod.write_table(more, src2)
    create_mod.append(src2, out)

    t = pq.read_table(mani.level_dir(out, 0))
    assert t.num_rows == 1
    cells = dict(zip(t["cells"][0].as_py(), t["counts"][0].as_py()))
    assert cells == {0: 4, 3: 1}  # NW grew 2 -> 4, SE unchanged
    from rio_cogeo_ray.pipelines.validate import validate as _v

    ok, errs, _ = _v(out, strict=True)
    assert ok, errs
