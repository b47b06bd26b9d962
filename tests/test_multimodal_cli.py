"""Multimodal plumbing (stubbed decode, real Ray wiring) + CLI e2e
(tests/test_cli.py analog, argparse instead of click)."""

import json
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from rio_cogeo_ray.stages import multimodal


def test_synth_media_deterministic():
    a = multimodal.synth_media(50)
    b = multimodal.synth_media(50)
    assert a.equals(b)
    assert a.schema.equals(multimodal.MEDIA_SCHEMA)


def test_image_features_pipeline(ray_session):
    t = multimodal.synth_media(100)
    ds = rd.from_arrow(t).repartition(4)
    out = multimodal.image_features(ds, concurrency=2, batch_size=32).to_pandas()
    assert len(out) == 100
    feats = np.stack(out.sort_values("media_id")["features"].to_numpy())
    assert feats.shape == (100, 16)
    # deterministic across runs
    out2 = multimodal.image_features(
        rd.from_arrow(t).repartition(2), concurrency=1, batch_size=64
    ).to_pandas()
    feats2 = np.stack(out2.sort_values("media_id")["features"].to_numpy())
    np.testing.assert_array_equal(feats, feats2)


def test_audio_frames_explode(ray_session):
    t = multimodal.synth_media(30)
    ds = rd.from_arrow(t)
    out = multimodal.audio_frames(ds, concurrency=1, batch_size=16).to_pandas()
    assert (out["frame_idx"] >= 0).all()
    assert set(out["media_id"]).issubset(set(t["media_id"].to_pylist()))
    assert out["frame"].map(len).max() <= 512


def _run_cli(*args):
    return subprocess.run(
        [sys.executable, "-m", "rio_cogeo_ray.cli", *args],
        capture_output=True, text=True, cwd="/root/repo",
    )


@pytest.mark.slow
def test_cli_create_validate_info(tmp_path):
    from rio_cogeo_ray import fixtures

    src = fixtures.scenario_path("pages_rgb")
    out = str(tmp_path / "cli_out")
    r = _run_cli(
        "create", src, out, "--zoom", "6", "--overview-level", "2",
        "--geocode-boxes", "0,40,11.25,48", "--threads", "4",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    created = json.loads(r.stdout.strip().splitlines()[-1])
    assert created["total_pages"] == 4000

    r = _run_cli("validate", out, "--strict")
    assert r.returncode == 0, r.stderr
    assert "valid tile pyramid" in r.stdout

    r = _run_cli("info", out, "--json")
    assert r.returncode == 0
    info = json.loads(r.stdout)
    assert info["GEO"]["MaxZoom"] == 6
    assert len(info["IFDs"]) == 3

    # corrupt → validate fails
    import os
    import shutil

    os.makedirs(os.path.join(out, "tiles", "z=42"))
    r = _run_cli("validate", out)
    assert r.returncode == 1


def test_cli_param_parsers():
    from rio_cogeo_ray.cli import _parse_boxes, _parse_threads

    assert _parse_threads("all_cpus") >= 1
    assert _parse_threads("3") == 3
    with pytest.raises(Exception):
        _parse_threads("-1")
    boxes = _parse_boxes("0,40,11.25,48;1,2,3,4,7")
    assert boxes[0] == (0.0, 40.0, 11.25, 48.0, 1)
    assert boxes[1][4] == 7
    with pytest.raises(Exception):
        _parse_boxes("1,2,3")


def test_multimodal_features_feed_ann(ray_session):
    """End-to-end: binary media payloads → actor-pool feature extraction
    → cosine kNN over the extracted feature vectors (the multimodal →
    similarity-search wiring), verified against a numpy oracle."""
    import numpy as np

    from rio_cogeo_ray.stages import ann
    from rio_cogeo_ray.stages.multimodal import ImageFeatures, image_features, synth_media

    t = synth_media(300, seed=7)
    # chained actor pools must leave CPU slots for the final sort: at
    # the 4-cpu test cluster, 2+2 actors starve it (pool sizing rule,
    # multimodal.py doc) — concurrency=1 per stage here
    feats_ds = image_features(rd.from_arrow(t).repartition(3), concurrency=1)
    # query = media 0's own features -> must rank itself first
    q = ImageFeatures()._fake_features(t["payload"].combine_chunks())[:1].astype(np.float64)
    got = ann.knn_cosine(
        feats_ds, q, k=5, id_col="media_id", emb_col="features", concurrency=1
    ).to_pandas().sort_values("score", ascending=False)
    assert got.iloc[0]["media_id"] == 0
    # oracle: full matmul
    all_f = ImageFeatures()._fake_features(t["payload"].combine_chunks()).astype(np.float64)
    an = all_f / np.linalg.norm(all_f, axis=1, keepdims=True)
    qn = (q / np.linalg.norm(q))[0]
    order = np.lexsort((np.arange(len(an)), -(an @ qn)))[:5]
    assert sorted(got["media_id"].tolist()) == sorted(order.tolist())


def test_audio_frames_matches_row_loop(ray_session):
    """Vectorized frame explode == naive per-row python oracle, exactly."""
    t = multimodal.synth_media(40, payload_bytes=3000)
    af = multimodal.AudioFrames(frame_bytes=512, stride=1024, max_frames=3)
    got = af(t)
    ids, idxs, frames = [], [], []
    for mid, payload in zip(t["media_id"].to_pylist(), t["payload"].to_pylist()):
        n = min(3, max(0, (len(payload) - 512) // 1024 + 1))
        for fi in range(n):
            ids.append(mid)
            idxs.append(fi)
            frames.append(payload[fi * 1024 : fi * 1024 + 512])
    assert got["media_id"].to_pylist() == ids
    assert got["frame_idx"].to_pylist() == idxs
    assert got["frame"].to_pylist() == frames
    # empty batch round-trips
    assert len(af(t.slice(0, 0))) == 0


def test_image_features_real_codec_path():
    """The real decode path (PIL-shaped module injected) produces bucket
    means of the resized raster; undecodable payloads per-row fall back
    to the byte-fold stub instead of crashing."""

    class _FakeImg:
        def __init__(self, arr):
            self.arr = arr

        def convert(self, mode):
            assert mode == "L"
            return self

        def resize(self, size):
            return np.full((size[1], size[0]), 7.0, dtype=np.float32)

    class _FakePIL:
        @staticmethod
        def open(fp):
            data = fp.read()
            if data[:1] == b"\xff":
                raise ValueError("undecodable")
            return _FakeImg(None)

    imf = multimodal.ImageFeatures(feature_dim=16)
    imf.pil = _FakePIL()
    t = pa.table(
        {
            "media_id": pa.array([0, 1], pa.int64()),
            "media_type": pa.array(["image/png"] * 2),
            "payload": pa.array([b"\x00" * 64, b"\xff" + b"\x00" * 63], pa.binary()),
        }
    )
    out = imf(t)
    feats = np.stack(out["features"].to_pandas().to_numpy())
    # row 0 decoded: every bucket mean == 7.0
    np.testing.assert_allclose(feats[0], np.full(16, 7.0), rtol=0)
    # row 1 fell back to the byte-fold stub (all-zero payload → zeros)
    stub = multimodal.ImageFeatures(feature_dim=16)
    stub.pil = None
    ref = stub(t)
    np.testing.assert_array_equal(
        feats[1], np.stack(ref["features"].to_pandas().to_numpy())[1]
    )


def test_media_stats_query_oracle(ray_session):
    """queries()['media_stats'] == driver-side single-table oracle."""
    from rio_cogeo_ray.pipelines import queries as Q

    got = Q.q_media_stats("unused").to_pandas().sort_values("media_type")

    t = multimodal.synth_media(2000)
    feats_t = multimodal.ImageFeatures()(t)
    vals = (
        feats_t["features"].combine_chunks().flatten()
        .to_numpy(zero_copy_only=False).reshape(len(t), -1)
    )
    q = np.floor(vals.astype(np.float64) * 1024.0 + 0.5).astype(np.int64).sum(axis=1)
    import pandas as pd

    ref = (
        pd.DataFrame({"media_type": t["media_type"].to_pylist(), "qsum": q})
        .groupby("media_type", as_index=False)
        .agg(sum_qsum=("qsum", "sum"), n=("qsum", "size"))
        .sort_values("media_type")
    )
    assert got["media_type"].tolist() == ref["media_type"].tolist()
    assert got["sum_qsum"].tolist() == ref["sum_qsum"].tolist()
    assert got["n"].tolist() == ref["n"].tolist()


def test_media_frames_query_oracle(ray_session):
    """queries()['media_frames'] == driver-side single-table stats."""
    from rio_cogeo_ray.pipelines import queries as Q

    got = Q.q_media_frames("unused")
    t = multimodal.synth_media(2000)
    ref = multimodal.AudioFrames()(t)
    assert got["n_frames"][0].as_py() == len(ref)
    assert got["frame_bytes"][0].as_py() == sum(len(f) for f in ref["frame"].to_pylist())
    assert got["max_frame_idx"][0].as_py() == max(ref["frame_idx"].to_pylist())


def test_video_frames_vs_row_loop_oracle(ray_session):
    """VideoFrames vectorized sampling == per-row python oracle."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from rio_cogeo_ray.stages import multimodal as mm

    t = mm.synth_video(150, payload_bytes=2048)
    got = (
        mm.video_frames(rd.from_arrow(t).repartition(4), concurrency=2, batch_size=32)
        .to_pandas()
        .sort_values(["media_id", "frame_idx"])
        .reset_index(drop=True)
    )
    k_max, fb = 4, 256
    rows = []
    for r in range(t.num_rows):
        pay = t["payload"][r].as_py()
        nf = t["n_frames"][r].as_py()
        fps = t["fps"][r].as_py()
        k = min(k_max, max(nf, 1))
        for j in range(k):
            idx = (j * (nf - 1)) // max(k - 1, 1) if k > 1 else 0
            span = max(len(pay) - fb + 1, 1)
            start = (idx * fb) % span
            rows.append(
                (t["media_id"][r].as_py(), idx, idx * 1000 // max(fps, 1),
                 pay[start : start + fb])
            )
    import pandas as pd

    exp = pd.DataFrame(rows, columns=["media_id", "frame_idx", "ts_ms", "frame"]) \
        .sort_values(["media_id", "frame_idx"]).reset_index(drop=True)
    assert got["media_id"].tolist() == exp["media_id"].tolist()
    assert got["frame_idx"].tolist() == exp["frame_idx"].tolist()
    assert got["ts_ms"].tolist() == exp["ts_ms"].tolist()
    assert [bytes(b) for b in got["frame"]] == exp["frame"].tolist()
    # first and last frame always sampled when n_frames > 1
    per = got.groupby("media_id")["frame_idx"].agg(["min", "max"])
    nf_by_id = {t["media_id"][r].as_py(): t["n_frames"][r].as_py() for r in range(t.num_rows)}
    assert (per["min"] == 0).all()
    for mid, mx in per["max"].items():
        assert mx == nf_by_id[mid] - 1


def test_video_frames_short_payload_no_bleed(ray_session):
    """Payloads shorter than frame_bytes emit NO frames (never bytes
    from a neighboring row, never an out-of-bounds read)."""
    import pyarrow as pa

    import ray.data as rd

    from rio_cogeo_ray.stages import multimodal as mm

    t = pa.table(
        {
            "media_id": pa.array([0, 1, 2], pa.int64()),
            "payload": pa.array([b"A" * 300, b"B" * 40, b"C" * 300], pa.binary()),
            "n_frames": pa.array([10, 10, 10], pa.int32()),
            "fps": pa.array([24, 24, 24], pa.int32()),
        }
    )
    got = mm.video_frames(rd.from_arrow(t), concurrency=2, batch_size=8).to_pandas()
    assert set(got["media_id"]) == {0, 2}
    for _, r in got.iterrows():
        b = bytes(r["frame"])
        assert b == (b"A" if r["media_id"] == 0 else b"C") * 256


def test_image_resize_stub_and_real_path(ray_session):
    import numpy as np

    from rio_cogeo_ray.stages import multimodal

    # stub path: byte-exact stride-sample / repeat contract
    rz = multimodal.ImageResize(target_size=(4, 4))
    rz.pil = None
    big = bytes(range(64))
    idx = (np.arange(16, dtype=np.int64) * 64) // 16
    assert rz._resize_stub(big) == bytes(np.frombuffer(big, np.uint8)[idx])
    small = b"ab"
    assert rz._resize_stub(small) == (b"ab" * 8)[:16]
    assert rz._resize_stub(b"") == b"\x00" * 16
    t = pa.table(
        {
            "media_id": pa.array([1, 2], pa.int64()),
            "media_type": pa.array(["image", "image"], pa.string()),
            "payload": pa.array([big, small], pa.binary()),
        }
    )
    out = rz(t)
    assert out.column_names == ["media_id", "media_type", "payload", "width", "height"]
    assert out["width"].to_pylist() == [4, 4]
    assert out.schema.field("width").type == pa.int32()  # MEDIA_SCHEMA contract
    assert all(len(p) == 16 for p in out["payload"].to_pylist())
    # composability: the resized output feeds ImageFeatures directly
    feats = multimodal.ImageFeatures(feature_dim=4)
    feats.pil = None
    assert "features" in feats(out).column_names

    # real path: a fake PIL module proves decode/resize/encode wiring;
    # a row that fails decode falls back to the stub for THAT row
    class _FakeImg:
        def convert(self, mode):
            return self

        def resize(self, size):
            self._size = size
            return self

        def save(self, buf, format=None):
            buf.write(b"PNG" + bytes(self._size))

    class _FakePIL:
        @staticmethod
        def open(b):
            if b.getvalue().startswith(b"BAD"):
                raise ValueError("corrupt")
            return _FakeImg()

    rz2 = multimodal.ImageResize(target_size=(4, 4))
    rz2.pil = _FakePIL()
    t2 = pa.table(
        {
            "media_id": pa.array([1, 2], pa.int64()),
            "media_type": pa.array(["image", "image"], pa.string()),
            "payload": pa.array([big, b"BADxyz"], pa.binary()),
        }
    )
    out2 = rz2(t2)
    imgs = out2["payload"].to_pylist()
    assert imgs[0] == b"PNG\x04\x04"               # real path
    assert imgs[1] == rz._resize_stub(b"BADxyz")  # per-row fallback


def test_cli_param_parsers_round4():
    """--bidx / --invalid-policy parser parity (reference
    scripts/cli.py:27-43 BdxParamType, 46-63 NodataParamType)."""
    from rio_cogeo_ray.cli import _parse_bidx, _parse_invalid_policy

    assert _parse_bidx("1,2,3") == [1, 2, 3]
    assert _parse_bidx("2") == [2]
    for bad in ("0", "a", "1,-2", ""):
        with pytest.raises(Exception):
            _parse_bidx(bad)

    assert _parse_invalid_policy("mask") == "mask"
    assert _parse_invalid_policy("DROP") == "drop"
    assert _parse_invalid_policy("NaN") == "mask"      # nan nodata → masked
    assert _parse_invalid_policy("nil") == "drop"      # no nodata tracking
    assert _parse_invalid_policy("None") == "drop"
    assert _parse_invalid_policy("nada") == "drop"
    assert _parse_invalid_policy("-3.5") == "mask"     # float nodata value
    with pytest.raises(Exception):
        _parse_invalid_policy("bogus")


@pytest.mark.slow
def test_cli_zoom_strategy_and_invalid_policy(tmp_path):
    """--resolution + --zoom-level-strategy picks the bracketing zoom
    (reference tests/test_cli.py:560-595 analog: 6000 m/px sits between
    z4≈9784 and z5≈4892) and --invalid-policy drop leaves no manifest
    trace of geocode-invalid pages — exercised end-to-end
    create → validate → info."""
    from rio_cogeo_ray import fixtures

    src = fixtures.scenario_path("pages_nodata")  # ~15% geocode-invalid
    out_lo = str(tmp_path / "lower")
    r = _run_cli(
        "create", src, out_lo, "--resolution", "6000",
        "--zoom-level-strategy", "LOWER", "--invalid-policy", "nil",
        "--geocode-boxes", "0,40,11.25,48", "--geocode-invalid", "9830",
        "--overview-level", "2", "--threads", "4",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    created = json.loads(r.stdout.strip().splitlines()[-1])
    # drop (via the 'nil' token): invalid pages leave no manifest trace
    assert created["invalid_pages"] == 0
    assert 0 < created["total_pages"] < 4000

    r = _run_cli("validate", out_lo, "--strict")
    assert r.returncode == 0, r.stderr
    r = _run_cli("info", out_lo, "--json")
    assert r.returncode == 0
    info = json.loads(r.stdout)
    assert info["GEO"]["MaxZoom"] == 4           # lower → coarser bracket
    assert info["Profile"]["InvalidPolicy"] == "drop"

    out_hi = str(tmp_path / "upper")
    r = _run_cli(
        "create", src, out_hi, "--resolution", "6000",
        "--zoom-level-strategy", "upper",
        "--geocode-boxes", "0,40,11.25,48", "--geocode-invalid", "9830",
        "--overview-level", "2", "--threads", "4",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    created = json.loads(r.stdout.strip().splitlines()[-1])
    # default mask policy: the ~15% invalid pages are counted
    assert created["total_pages"] == 4000
    assert created["invalid_pages"] > 400
    r = _run_cli("info", out_hi, "--json")
    assert json.loads(r.stdout)["GEO"]["MaxZoom"] == 5   # upper → finer


@pytest.mark.slow
def test_cli_bidx_channel_selection(tmp_path):
    """--bidx selects which derived channels to build: band 1 = count,
    bands 2.. = --weight-col entries; multiple indexes build one
    independently valid pyramid per channel under DST/band_<i>."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rio_cogeo_ray import fixtures

    t = fixtures.gen_pages(0, 1500)
    wa = pa.array([(i % 7) + 1 for i in range(1500)], pa.int64())
    wb = pa.array([(i % 3) + 1 for i in range(1500)], pa.int64())
    t = t.append_column("wa", wa).append_column("wb", wb)
    src = str(tmp_path / "pages_w.parquet")
    pq.write_table(t, src)

    # selecting a weight band without declaring the column → usage error
    r = _run_cli("create", src, str(tmp_path / "x"), "--bidx", "2",
                 "--zoom", "4", "--threads", "4")
    assert r.returncode == 2
    assert "out of range" in r.stderr

    out = str(tmp_path / "multi")
    r = _run_cli(
        "create", src, out, "--zoom", "4", "--overview-level", "1",
        "--weight-col", "wa,wb", "--bidx", "1,3", "--threads", "4",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    created = json.loads(r.stdout.strip().splitlines()[-1])
    assert [b["band"] for b in created["bands"]] == ["count", "wb"]
    for b in created["bands"]:
        rv = _run_cli("validate", b["out"], "--strict")
        assert rv.returncode == 0, rv.stderr
    # count band sums pages, wb band sums the weight column: the wb
    # pyramid's base-level grid mass must be sum(wb of valid pages) —
    # strictly more than its page count (weights are 1..3)
    info_count = json.loads(_run_cli("info", created["bands"][0]["out"], "--json").stdout)
    info_wb = json.loads(_run_cli("info", created["bands"][1]["out"], "--json").stdout)
    assert info_count["GEO"]["MaxZoom"] == info_wb["GEO"]["MaxZoom"] == 4


# ---------------------------------------------------------------------------
# round 4: REAL in-sandbox decode (functions/imagecodec.py) — no fake-PIL
# monkeypatch anywhere below; this container has no PIL, so these tests
# prove the mini codec IS the executing real path.
# ---------------------------------------------------------------------------


def test_imagecodec_png_roundtrip_and_filters():
    from rio_cogeo_ray.functions import imagecodec as ic

    rng = np.random.RandomState(11)
    for shape in ((9, 13), (9, 13, 3), (5, 4, 4)):
        arr = rng.randint(0, 256, size=shape, dtype=np.uint8)
        dec = ic.png_decode(ic.png_encode(arr))
        np.testing.assert_array_equal(dec, arr)
    # netpbm round-trip (P5 + P6)
    for shape in ((7, 5), (7, 5, 3)):
        arr = rng.randint(0, 256, size=shape, dtype=np.uint8)
        np.testing.assert_array_equal(ic._pnm_decode(ic.pnm_encode(arr)), arr)

    # all five scanline filters decode: forward-filter a known raster
    # with an independent per-spec reference, then assemble a PNG
    import struct
    import zlib

    arr = rng.randint(0, 256, size=(5, 6, 3), dtype=np.uint8)
    h, w, ch = arr.shape
    stride = w * ch
    flat = arr.reshape(h, stride).astype(np.int64)
    lines = []
    for y, ft in enumerate([0, 1, 2, 3, 4]):
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, np.int64)
        filt = np.zeros(stride, np.int64)
        for x in range(stride):
            a = cur[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if ft == 0:
                p = 0
            elif ft == 1:
                p = a
            elif ft == 2:
                p = b
            elif ft == 3:
                p = (a + b) >> 1
            else:
                pa_, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                p = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
            filt[x] = (cur[x] - p) & 0xFF
        lines.append(bytes([ft]) + bytes(filt.astype(np.uint8)))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        ic.PNG_MAGIC
        + ic._chunk(b"IHDR", ihdr)
        + ic._chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + ic._chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(ic.png_decode(png), arr)

    # luma + nearest-resize contracts
    rgb = rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
    img = ic.MiniImage(rgb).convert("L")
    exp = (
        (299 * rgb[..., 0].astype(np.uint32)
         + 587 * rgb[..., 1].astype(np.uint32)
         + 114 * rgb[..., 2].astype(np.uint32)) // 1000
    ).astype(np.uint8)
    np.testing.assert_array_equal(np.asarray(img), exp)
    rs = ic.MiniImage(rgb).resize((3, 5))
    yi = (np.arange(5) * 8) // 5
    xi = (np.arange(3) * 8) // 3
    np.testing.assert_array_equal(np.asarray(rs), rgb[yi][:, xi])

    with pytest.raises(ValueError):
        ic.open(io_bytes(b"GIF89a notsupported"))


def io_bytes(b):
    import io

    return io.BytesIO(b)


def test_image_features_real_decode_no_monkeypatch(ray_session):
    """Default-constructed ImageFeatures decodes REAL PNG/PPM payloads
    in this PIL-less container (the mini codec path), stubbing only the
    garbage rows — end-to-end through the Ray actor pool."""
    from rio_cogeo_ray.functions import imagecodec as ic
    from rio_cogeo_ray.stages import multimodal as mm

    imf = mm.ImageFeatures(feature_dim=16)
    assert imf.pil is not None  # the mini codec resolved as the real path

    flat7 = np.full((32, 32), 7, np.uint8)          # uniform gray PNG
    ppm = ic.pnm_encode(np.full((16, 16, 3), 200, np.uint8))
    garbage = b"\xff\x00" * 100
    t = pa.table(
        {
            "media_id": pa.array([0, 1, 2], pa.int64()),
            "media_type": pa.array(["image/png", "image/ppm", "image/png"]),
            "payload": pa.array([ic.png_encode(flat7), ppm, garbage], pa.binary()),
        }
    )
    out = (
        mm.image_features(rd.from_arrow(t), concurrency=1, batch_size=2)
        .to_pandas().sort_values("media_id")
    )
    feats = np.stack(out["features"].to_numpy())
    np.testing.assert_allclose(feats[0], np.full(16, 7.0), rtol=0)   # decoded
    # PPM: all-200 RGB → luma (299+587+114)*200//1000 = 200 everywhere
    np.testing.assert_allclose(feats[1], np.full(16, 200.0), rtol=0)
    # garbage fell back to the byte-fold stub for that row only (the
    # stub folds the BATCH buffer, so the oracle uses the same batch
    # composition: batch_size=2 puts row 2 alone in the second batch)
    stub = mm.ImageFeatures(feature_dim=16)
    stub.pil = None
    exp2 = np.stack(stub(t.slice(2))["features"].to_pandas())[0]
    np.testing.assert_array_equal(feats[2], exp2)


def test_image_resize_real_decode_no_monkeypatch():
    """ImageResize re-encodes a REAL decodable PNG at target dims whose
    raster is the documented nearest-neighbor resample."""
    from rio_cogeo_ray.functions import imagecodec as ic
    from rio_cogeo_ray.stages import multimodal as mm

    rng = np.random.RandomState(5)
    src = rng.randint(0, 256, size=(10, 12, 3), dtype=np.uint8)
    rz = mm.ImageResize(target_size=(4, 6))
    assert rz.pil is not None
    t = pa.table(
        {
            "media_id": pa.array([1], pa.int64()),
            "media_type": pa.array(["image/png"]),
            "payload": pa.array([ic.png_encode(src)], pa.binary()),
        }
    )
    out = rz(t)
    got = ic.png_decode(out["payload"][0].as_py())
    yi = (np.arange(6) * 10) // 6
    xi = (np.arange(4) * 12) // 4
    np.testing.assert_array_equal(got, src[yi][:, xi])
    assert out["width"].to_pylist() == [4] and out["height"].to_pylist() == [6]


def test_synth_real_images_pipeline(ray_session):
    """synth_real_images payloads all decode through the real path and
    compose resize → features in one pipeline."""
    from rio_cogeo_ray.functions import imagecodec as ic
    from rio_cogeo_ray.stages import multimodal as mm

    payloads = ic.synth_real_images(30)
    assert payloads == ic.synth_real_images(30)  # deterministic
    t = pa.table(
        {
            "media_id": pa.array(np.arange(30), pa.int64()),
            "media_type": pa.array(["image"] * 30),
            "payload": pa.array(payloads, pa.binary()),
        }
    )
    chained = mm.image_features(
        mm.image_resize(rd.from_arrow(t), target_size=(8, 8), concurrency=1),
        concurrency=1,
    ).to_pandas().sort_values("media_id")
    feats = np.stack(chained["features"].to_numpy())
    assert feats.shape == (30, 16)
    # oracle for row 0 (gray PNG): decode → resize(8,8) → L → 32x32 →
    # bucket means, all with the documented mini-codec contracts
    r0 = ic.png_decode(payloads[0])
    r0 = ic.MiniImage(r0).resize((8, 8))
    r0 = ic.png_decode(ic.png_encode(np.asarray(r0)))  # resize stage re-encodes
    px = np.asarray(
        ic.MiniImage(r0).convert("L").resize((32, 32)), np.float32
    ).reshape(-1)
    exp = px.reshape(16, -1).mean(axis=1)
    np.testing.assert_allclose(feats[0], exp, rtol=0)


@pytest.mark.slow
def test_cli_prep_resumable(tmp_path):
    """CLI prep runs the checkpoint-resumable chain end-to-end; a rerun
    of the completed job is pure marker verification with identical
    output bytes."""
    import os

    src = "/root/testdata/sf0.001/documents.parquet"
    w = str(tmp_path / "prep")
    r = _run_cli("prep", src, w, "--threads", "4")
    assert r.returncode == 0, r.stderr[-2000:]
    first = json.loads(r.stdout.strip().splitlines()[-1])
    assert first["rows"] > 0
    out_dir = first["out"]
    sig = sorted((f, os.path.getsize(os.path.join(out_dir, f)))
                 for f in os.listdir(out_dir))
    mtimes = {f: os.path.getmtime(os.path.join(out_dir, f))
              for f, _ in sig}

    r2 = _run_cli("prep", src, w, "--threads", "4")
    assert r2.returncode == 0, r2.stderr[-2000:]
    again = json.loads(r2.stdout.strip().splitlines()[-1])
    assert again == first
    # resume read the boundary: files untouched (same mtimes, sizes)
    sig2 = sorted((f, os.path.getsize(os.path.join(out_dir, f)))
                  for f in os.listdir(out_dir))
    assert sig2 == sig
    for f, _ in sig2:
        assert os.path.getmtime(os.path.join(out_dir, f)) == mtimes[f]


def test_cli_shards_resumable(tmp_path):
    """CLI shards runs the resumable corpus->shards chain end-to-end; a
    rerun of the completed job skips both the boundary and the shard
    write (manifest fingerprint) leaving shard files untouched."""
    import glob
    import os

    src = "/root/testdata/sf0.001/documents.parquet"
    w = str(tmp_path / "sh")
    r = _run_cli("shards", src, w, "--num-shards", "3", "--threads", "4")
    assert r.returncode == 0, r.stderr[-2000:]
    first = json.loads(r.stdout.strip().splitlines()[-1])
    assert first["rows"] > 0 and len(first["shard_rows"]) == 3
    files = sorted(glob.glob(os.path.join(w, "shards", "shard=*", "*.parquet")))
    assert files
    mtimes = {f: os.path.getmtime(f) for f in files}

    r2 = _run_cli("shards", src, w, "--num-shards", "3", "--threads", "4")
    assert r2.returncode == 0, r2.stderr[-2000:]
    again = json.loads(r2.stdout.strip().splitlines()[-1])
    assert again == first
    for f in files:
        assert os.path.getmtime(f) == mtimes[f]


@pytest.mark.slow
def test_cli_custom_tms_end_to_end(tmp_path, ray_session):
    """--tms custom.json (reference cli.py:214-218): create -> validate
    -> info run a full pyramid on a user 2x1 quad grid over (lon, lat);
    info reports the custom CRS and the grid's world bounds; the spec
    round-trips through the manifest. Value-level pin: a lonlat source
    with hand-placed points rasterizes into the exact custom-grid tiles
    and pixels."""
    import pyarrow.parquet as pq_mod

    tms_path = str(tmp_path / "tms.json")
    with open(tms_path, "w") as f:
        json.dump(
            {"origin_x": -180.0, "origin_y": 90.0, "span_x": 360.0,
             "span_y": 180.0, "cols0": 2, "rows0": 1}, f,
        )

    src = "/root/testdata/sf0.001/documents.parquet"
    out = str(tmp_path / "tms_out")
    r = _run_cli(
        "create", src, out, "--source", "documents", "--zoom", "3",
        "--tms", tms_path, "--threads", "4",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    created = json.loads(r.stdout.strip().splitlines()[-1])
    # z=0 of a 2x1 quad grid is exactly two tiles
    assert created["levels"][-1][0] == 0 and created["levels"][-1][1] == 2

    r = _run_cli("validate", out, "--strict")
    assert r.returncode == 0, r.stderr
    assert "valid tile pyramid" in r.stdout

    r = _run_cli("info", out, "--json")
    assert r.returncode == 0
    info = json.loads(r.stdout)
    assert "custom quad TMS (2x1" in info["GEO"]["CRS"]
    assert info["GEO"]["BoundsWGS84"] == [-180.0, -90.0, 180.0, 90.0]

    # spec round-trips through the manifest
    from rio_cogeo_ray.pipelines import create as create_mod
    from rio_cogeo_ray.state import manifest as mani

    spec2 = create_mod.spec_from_manifest(mani.load_manifest(out))
    assert spec2.tms == {"origin_x": -180.0, "origin_y": 90.0,
                         "span_x": 360.0, "span_y": 180.0,
                         "cols0": 2, "rows0": 1}

    # incompatible-options pins (mirror the reference's option errors)
    from rio_cogeo_ray import errors as rerrors
    from rio_cogeo_ray.pipelines.spec import plan

    tdef = spec2.tms
    with pytest.raises(rerrors.IncompatibleOptions, match="non-interpolating"):
        plan(zoom=3, resampling="bilinear", tms_def=tdef)
    with pytest.raises(rerrors.IncompatibleOptions, match="power-of-two"):
        plan(zoom=3, decimation_base=3, tms_def=tdef)
    with pytest.raises(rerrors.IncompatibleOptions, match="aligned_levels"):
        plan(zoom=3, aligned_levels=1, tms_def=tdef)
    with pytest.raises(ValueError, match="missing keys"):
        plan(zoom=3, tms_def={"origin_x": 0})

    # value-level pin: lonlat source, z=1 (4x2 grid of 45x45-degree
    # quads at lon in [-180,180], lat [90,-90] y-down), tile_px=2 ->
    # each tile is 2x2 pixels of 22.5 degrees. Points placed mid-pixel.
    pts = pa.table(
        {
            "lon": pa.array([-170.0, -170.0, -100.0, 100.0, 100.0, 100.0]),
            "lat": pa.array([80.0, 80.0, 80.0, -80.0, -80.0, -10.0]),
        }
    )
    src2 = str(tmp_path / "pts.parquet")
    pq_mod.write_table(pts, src2)
    out2 = str(tmp_path / "tms_pts")
    from rio_cogeo_ray.pipelines.spec import plan as plan2

    spec3 = plan2(zoom=1, overview_levels=0, tile_px=2, tms_def=tdef)
    create_mod.create(src2, out2, spec3, source="lonlat")
    t = pq_mod.read_table(mani.level_dir(out2, 1))
    got = {}
    from rio_cogeo_ray.functions import tms as tms_mod

    for row in range(t.num_rows):
        z, x, y = (int(v[0]) for v in tms_mod.unpack_tile_key(
            np.array([t["tile_key"][row].as_py()])))
        cells = t["cells"][row].as_py()
        counts = t["counts"][row].as_py()
        got[(x, y)] = dict(zip(cells, counts))
    # (-170, 80): x = floor((−170+180)/90) = 0, y = floor((90−80)/90) = 0
    #   pixel: px = floor((−170 − (−180))/45) = 0, py = floor((90−80)/45)=0
    # (-100, 80): x=0, y=0, px=1, py=0 -> cell 1
    # (100, -80): x=3, y=1, px=0 (floor((100-90)/45)=0), py=1
    #   (floor((0−(−80))/45) with north=0 for y=1 -> floor(80/45)=1) ->
    #   cell py*2+px = 2
    # (100, -10): x=3, y=1, px=0, py=0 -> cell 0
    assert got[(0, 0)] == {0: 2, 1: 1}
    assert got[(3, 1)] == {2: 2, 0: 1}


def test_cli_quiet_and_config(tmp_path):
    """Global --quiet/--config parity (reference cli.py:200-230):
    --quiet silences the LossyCompression warning a lossy profile
    emits; --config K=V lands in the child environment (the GDAL
    config passthrough analog); malformed --config errors cleanly."""
    src = "/root/testdata/sf0.001/documents.parquet"

    out1 = str(tmp_path / "loud")
    r = _run_cli("create", src, out1, "--source", "documents", "--zoom", "2",
                 "-p", "jpeg", "--threads", "4")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "lossy" in (r.stderr or "")

    out2 = str(tmp_path / "quiet")
    r = _run_cli("--quiet", "--config", "RCR_IN_MEMORY_THRESHOLD=1",
                 "create", src, out2, "--source", "documents", "--zoom", "2",
                 "-p", "jpeg", "--threads", "4")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "lossy" not in (r.stderr or "")

    r = _run_cli("--config", "NOT_A_PAIR", "info", out2)
    assert r.returncode == 2 and "K=V" in r.stderr
