"""Unit tests for extract/geocode/hashing/fixtures pure functions."""

import numpy as np
import pyarrow as pa
import pytest

from rio_cogeo_ray import fixtures
from rio_cogeo_ray.functions.extract import extract_text
from rio_cogeo_ray.functions.geocode import (
    GeoSpec,
    fnv1a64,
    geocode_id,
    geocode_url,
    url_doc_id,
)
from rio_cogeo_ray.functions.hashing import splitmix64, weighted_pick


def test_extract_text_semantics():
    html = pa.array(
        [
            "<html><head><title>A B</title></head><body><p>hello world</p></body></html>",
            "<html><head><title>T</title><script>var x=1;</script></head>"
            "<body><style>p{}</style><p>keep &amp; this &lt;tag&gt;</p></body></html>",
            "<p>  spaced   </p><p>lines</p>",
            "",
        ]
    )
    out = extract_text(html).to_pylist()
    assert out[0] == "A B\nhello world"
    assert out[1] == "T\nkeep & this <tag>"
    assert out[2] == "spaced\nlines"
    assert out[3] == ""


def test_extract_text_binary_input():
    b = pa.array([b"<p>x</p>"], type=pa.binary())
    assert extract_text(b).to_pylist() == ["x"]


def test_extract_entity_order():
    # &amp;lt; decodes to the literal text "&lt;", not "<"
    out = extract_text(pa.array(["<p>&amp;lt;</p>"])).to_pylist()
    assert out == ["&lt;"]


def test_fnv1a64_known_vectors():
    # public FNV-1a test vectors
    h = fnv1a64(pa.array(["", "a", "hello"]))
    assert h[0] == np.uint64(14695981039346656037)
    assert h[1] == np.uint64(0xAF63DC4C8601EC8C)
    # vectorized equals per-row reference implementation
    def ref(s):
        x = 14695981039346656037
        for c in s.encode():
            x = ((x ^ c) * 1099511628211) % (1 << 64)
        return x

    assert h[2] == np.uint64(ref("hello"))


def test_fnv1a64_sliced_array():
    arr = pa.array(["aa", "bb", "cc", "dd"])
    full = fnv1a64(arr)
    sl = fnv1a64(arr.slice(1, 2))
    np.testing.assert_array_equal(sl, full[1:3])


def test_geocode_id_bounds_and_sql_parity():
    ids = np.arange(5000)
    lon, lat, valid = geocode_id(ids)
    assert lon.min() >= -180 and lon.max() < 180
    assert lat.min() >= -85 and lat.max() < 85
    # ~1/97 invalid
    assert 0.003 < (1 - valid.mean()) < 0.03
    # parity with the documented SQL formula evaluated in DuckDB
    import duckdb

    rows = duckdb.sql(
        """
        SELECT ((id * 2654435761) % 4294967296) / 4294967296.0 * 360.0 - 180.0 AS lon,
               (((id + 1) * 2246822519) % 4294967296) / 4294967296.0 * 170.0 - 85.0 AS lat,
               (((id * 2654435761) % 4294967296) % 97 <> 0) AS valid
        FROM range(5000) t(id) ORDER BY id
        """
    ).fetchnumpy()
    np.testing.assert_array_equal(rows["lon"], lon)
    np.testing.assert_array_equal(rows["lat"], lat)
    np.testing.assert_array_equal(rows["valid"], valid)


def test_geocode_url_spec():
    t = fixtures.gen_pages(0, 2000)
    urls = t["url"].combine_chunks()
    spec = GeoSpec(boxes=[(0.0, 40.0, 10.0, 50.0, 1)], invalid_per_65536=6553)
    lon, lat, valid = geocode_url(urls, spec)
    assert lon[valid].min() >= 0.0 and lon[valid].max() <= 10.0
    assert lat[valid].min() >= 40.0 and lat[valid].max() <= 50.0
    assert 0.05 < (1 - valid.mean()) < 0.15
    # pure function of url: independent of table order
    perm = np.random.default_rng(0).permutation(len(urls))
    lon2, _, _ = geocode_url(urls.take(pa.array(perm)), spec)
    np.testing.assert_array_equal(lon2, lon[perm])


def test_url_doc_id():
    t = fixtures.gen_pages(7, 10, sort_by_url=False)
    ids = url_doc_id(t["url"].combine_chunks())
    np.testing.assert_array_equal(ids, np.arange(7, 17))
    assert url_doc_id(pa.array(["https://x/nope"])) is None


def test_weighted_pick_distribution():
    h = splitmix64(np.arange(20000))
    idx = weighted_pick(h, [45, 10, 10, 8, 7, 5, 5, 4, 3, 3])
    frac = np.bincount(idx, minlength=10) / 20000
    assert abs(frac[0] - 0.45) < 0.02
    assert (idx >= 0).all() and (idx <= 9).all()


def test_gen_pages_invariants():
    t = fixtures.gen_pages(0, 300)
    assert t.schema.equals(fixtures.PAGES_SCHEMA)
    # byte-identical extraction invariant (the input_hint contract)
    assert extract_text(t["html"].combine_chunks()).equals(t["text"].combine_chunks())
    # urls unique + sorted
    urls = t["url"].to_pylist()
    assert urls == sorted(urls) and len(set(urls)) == len(urls)
    # shard-parallel determinism
    a = fixtures.gen_pages(0, 50, sort_by_url=False)
    b = fixtures.gen_pages(50, 50, sort_by_url=False)
    assert pa.concat_tables([a, b]).equals(fixtures.gen_pages(0, 100, sort_by_url=False))


def test_scenario_tables():
    for name in ("pages_rgb", "pages_skew"):
        t = fixtures.scenario_table(name, n=200)
        assert t.num_rows == 200
        spec = fixtures.scenario_spec(name)
        lon, lat, valid = geocode_url(t["url"].combine_chunks(), spec)
        assert np.isfinite(lon).all()


def test_aois_table():
    t = fixtures.aois_table(fixtures.RECT_AOIS + fixtures.HEX_AOIS)
    assert t.num_rows == 8
    assert t.schema.names == ["aoi_id", "name", "ring_lon", "ring_lat"]


def test_kernel_taps_properties():
    """Integer tap tables: symmetric, correct signs, exact polynomial
    quantization for power-of-two bases (stages/rasterize.kernel_taps)."""
    from rio_cogeo_ray.stages.rasterize import CONV_KERNELS, kernel_taps

    for kernel in CONV_KERNELS:
        for base in (2, 3, 4, 5):
            offs, ws, wsum = kernel_taps(kernel, base)
            assert wsum == ws.sum() > 0
            # symmetric about the kernel center (base-1)/2
            assert np.array_equal(ws, ws[::-1])
            assert np.array_equal(offs + offs[::-1], np.full(len(offs), base - 1))
            if kernel in ("bilinear", "gauss", "cubic_spline"):
                assert (ws > 0).all()  # non-negative kernels
            if kernel in ("cubic", "lanczos"):
                assert (ws < 0).any()  # interpolating kernels ring
    # pinned exact base-2 tables (polynomial kernels quantize exactly)
    assert kernel_taps("bilinear", 2)[1].tolist() == [1024, 3072, 3072, 1024]
    assert kernel_taps("cubic", 2)[1].tolist() == [
        -96, -288, 928, 3552, 3552, 928, -288, -96,
    ]


def test_geocode_lonlat_source():
    """source='lonlat' (GCP analog, cogeo.py:267-274): pre-georeferenced
    rows skip the hash geocode; tile assignment matches assigning the
    same coordinates through the pages path; bad rows are invalid."""
    from rio_cogeo_ray.stages import assign

    spec = fixtures.scenario_spec("pages_rgb")
    pages = fixtures.gen_pages(0, 256)
    prep_pages = assign.make_prepare_fn(spec, 7, extract=False, source="pages")
    ref = prep_pages(pages)

    lon = ref["lon"].combine_chunks()
    lat = ref["lat"].combine_chunks()
    t = pa.table({"url": pages["url"], "lon": lon, "lat": lat})
    prep_ll = assign.make_prepare_fn(None, 7, extract=False, source="lonlat")
    out = prep_ll(t)
    # valid rows agree exactly (null lon/lat from invalid geocode rows
    # become geo_valid=False in the lonlat path too)
    assert out["geo_valid"].to_pylist() == ref["geo_valid"].to_pylist()
    assert out["tile_key"].to_pylist() == ref["tile_key"].to_pylist()

    bad = pa.table(
        {
            "lon": pa.array([181.0, float("nan"), 10.0, None], pa.float64()),
            "lat": pa.array([0.0, 0.0, -91.0, 5.0], pa.float64()),
        }
    )
    outb = prep_ll(bad)
    assert outb["geo_valid"].to_pylist() == [False, False, False, False]


def test_conv_kernels_dc_gain():
    """Unit DC gain: decimating a CONSTANT dense field with any conv
    kernel reproduces the constant (up to the floor), because taps are
    normalized by their own sum — checked through the real partials →
    merge → finalize path on a fully-dense single-tile world."""
    from rio_cogeo_ray.functions import tms
    from rio_cogeo_ray.stages import rasterize

    G = 16
    C = 1000  # constant cell value
    z = 1  # 2×2 tiles of G×G, world grid 32×32
    keys, offs, cells, counts, pages = [], [0], [], [], []
    for x in (0, 1):
        for y in (0, 1):
            keys.append(int(tms.pack_tile_key(z, x, y)))
            cells.extend(range(G * G))
            counts.extend([C] * (G * G))
            pages.append(1)
            offs.append(len(cells))
    import numpy as np

    t = rasterize._tiles_table(
        np.array(keys, dtype=np.int64), np.array(offs, dtype=np.int64),
        np.array(cells, dtype=np.int64), np.array(counts, dtype=np.int64),
        np.array(pages, dtype=np.int64),
    )
    for kernel in rasterize.CONV_KERNELS:
        # parent level is z=0: one G×G tile over the 2×2 children
        p = rasterize.pyramid_partials_conv(t, G, kernel, 2, G)
        m = rasterize._merge_bucket_table(p, "sum", 1, 2, G)
        f = rasterize.finalize_conv_tiles(m, kernel, 2)
        xs = np.asarray(f["x"].combine_chunks())
        ys = np.asarray(f["y"].combine_chunks())
        cl = f["cells"].combine_chunks()
        lens = np.diff(cl.offsets.to_numpy(zero_copy_only=False))
        rep = np.repeat(np.arange(len(f), dtype=np.int64), lens)
        cells_f = np.asarray(cl.flatten(), dtype=np.int64)
        vals = np.asarray(f["counts"].combine_chunks().flatten())
        pgx = xs[rep] * G + cells_f % G
        pgy = ys[rep] * G + cells_f // G
        # world edge attenuates by design (out-of-world taps read 0,
        # divisor stays (Σw)²); interior pixels reproduce C to the floor
        r = 4
        interior = (pgx >= r) & (pgx < G - r) & (pgy >= r) & (pgy < G - r)
        assert interior.sum() > 0
        iv = vals[interior]
        assert np.all((iv >= C - 1) & (iv <= C)), (kernel, iv.min(), iv.max())
        if kernel in ("bilinear", "gauss", "cubic_spline"):
            # non-negative kernels never exceed the constant anywhere;
            # cubic/lanczos CAN overshoot at the world edge (their
            # negative lobes fall outside the grid while the divisor
            # stays (Σw)²) — that asymmetry is the documented edge rule
            assert vals.max() <= C


def test_spec_from_manifest_roundtrip(tmp_path):
    """create() → manifest → spec_from_manifest reconstructs the plan."""
    import dataclasses

    from rio_cogeo_ray.pipelines.spec import plan

    spec = plan(
        zoom=6, overview_levels=2, tile_px=128, decimation_base=4,
        resampling="cubic", geocode=fixtures.scenario_spec("pages_rgb"),
    )
    # round-trip through the manifest dict shape without running create
    from dataclasses import asdict

    from rio_cogeo_ray.pipelines.create import spec_from_manifest
    from rio_cogeo_ray.state.manifest import Manifest

    d = {
        **{k: v for k, v in asdict(spec).items() if k != "geocode"},
        "geocode_boxes": list(map(list, spec.geocode.boxes)),
        "geocode_invalid_per_65536": spec.geocode.invalid_per_65536,
        "source": "pages",
        "weight_col": None,
    }
    got = spec_from_manifest(Manifest(spec=d))
    assert got == spec


def test_kernel_taps_dc_sum_any_base():
    """Tap sums are positive and taps symmetric for bases 2..7 — the
    normalization denominator is always well-defined."""
    from rio_cogeo_ray.stages.rasterize import CONV_KERNELS, kernel_taps

    for k in CONV_KERNELS:
        for b in range(2, 8):
            offs, ws, wsum = kernel_taps(k, b)
            assert wsum > 0
            assert np.array_equal(ws, ws[::-1])
            # offsets cover at least one full child block
            assert offs.min() <= 0 and offs.max() >= b - 1


# Property-based checks for the round-2 text kernels (no Ray needed).
from hypothesis import given, settings
from hypothesis import strategies as st

import pyarrow as pa

from rio_cogeo_ray.stages import text as text_mod


@settings(max_examples=150, deadline=None)
@given(
    tokens=st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=80),
    budget=st.integers(min_value=1, max_value=600),
)
def test_greedy_pack_matches_sequential_reference(tokens, budget):
    got = text_mod._greedy_pack(np.asarray(tokens, dtype=np.int64), budget).tolist()
    # sequential reference with the engine/SQL semantics: the stream's
    # first doc never opens a new bin; after that, a doc whose addition
    # would overflow the budget starts a new bin containing itself
    # (this matters for zero-token docs at a bin start — acc can be 0
    # while the bin is non-empty).
    seq, acc, want = 0, 0, []
    for i, t in enumerate(tokens):
        if i and acc + t > budget:
            seq += 1
            acc = 0
        acc += t
        want.append(seq)
    assert got == want


@settings(max_examples=100, deadline=None)
@given(
    doc=st.text(min_size=0, max_size=400),
    window=st.integers(min_value=1, max_value=50),
    stride_frac=st.integers(min_value=1, max_value=50),
)
def test_chunk_texts_covers_and_reconstructs(doc, window, stride_frac):
    stride = min(stride_frac, window)  # stride <= window (overlap >= 0)
    t = pa.table({"doc_id": pa.array([0], pa.int64()), "text": [doc]})
    out = text_mod.chunk_texts(t, window=window, stride=stride).to_pandas()
    out = out.sort_values("chunk_id").reset_index(drop=True)
    L = len(doc)
    expect_n = 1 if L <= window else -(-(L - window) // stride) + 1
    assert len(out) == expect_n
    for _, r in out.iterrows():
        s = int(r.chunk_id) * stride
        assert r.chunk_text == doc[s : s + window]
    # stride-prefix concatenation reconstructs the doc
    recon = "".join(
        r.chunk_text[:stride] if k < len(out) - 1 else r.chunk_text
        for k, (_, r) in enumerate(out.iterrows())
    )
    assert recon == doc


# ---------------------------------------------------------------------------
# Property-based: compressed quantile summary kernel (stages/sketch.py)
# ---------------------------------------------------------------------------


@given(
    st.lists(st.integers(min_value=-10_000, max_value=10_000), min_size=1, max_size=400),
    st.integers(min_value=4, max_value=64),
)
@settings(max_examples=120, deadline=None)
def test_q_compress_invariants(xs, k):
    """One compress step: output ≤ k rows, total weight EXACTLY
    preserved, values a sorted subset of the input, and any rank query
    answered within W/k of the truth."""
    import numpy as np

    from rio_cogeo_ray.stages.sketch import _q_compress

    vals = np.asarray(xs, dtype=np.float64)
    w = np.ones(len(vals), dtype=np.int64)
    v2, w2 = _q_compress(vals, w, k)
    assert len(v2) <= max(k, len(vals))
    assert w2.sum() == len(vals)
    assert (np.diff(v2) >= 0).all()
    assert np.isin(v2, vals).all()
    if len(vals) > k:
        s = np.sort(vals)
        cw = np.cumsum(w2)
        n = len(vals)
        for q in (0.25, 0.5, 0.9):
            target = max(int(np.ceil(q * n)), 1)
            est = v2[min(np.searchsorted(cw, target), len(v2) - 1)]
            true_rank_hi = np.searchsorted(s, est, side="right")
            true_rank_lo = np.searchsorted(s, est, side="left") + 1
            # est's true rank interval must come within W/k of target
            tol = n / k + 1
            assert true_rank_lo - tol <= target <= true_rank_hi + tol


@given(
    st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=8), min_size=1, max_size=40
    ),
    st.integers(min_value=1, max_value=30),
)
@settings(max_examples=60, deadline=None)
def test_bpe_trainer_incremental_equals_recount(words, n_merges):
    """The incremental pair-index trainer equals a from-scratch recount
    trainer on arbitrary corpora (same merges, same order)."""
    from rio_cogeo_ray.stages.tokenizer import train_bpe_merges

    freqs = {}
    for w in words:
        freqs[w] = freqs.get(w, 0) + 1
    wf = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))

    # naive recount reference (mirrors tests/test_tokenizer.py)
    vocab = {w: (list(w) + ["</w>"], f) for w, f in wf}
    exp = []
    for _ in range(n_merges):
        counts = {}
        for syms, f in vocab.values():
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + f
        if not counts or max(counts.values()) <= 0:
            break
        best_n = max(counts.values())
        best = min(p for p, n in counts.items() if n == best_n)
        exp.append(best)
        a, b = best
        for w, (syms, f) in list(vocab.items()):
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = (out, f)

    assert train_bpe_merges(wf, n_merges) == exp


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),   # band
            st.integers(0, 2),   # band_hash
            st.integers(0, 1),   # side
            st.integers(0, 40),  # id
        ),
        min_size=0,
        max_size=60,
    )
)
def test_bucket_cross_pairs_matches_brute_force(rows):
    """The vectorized per-run cartesian emits exactly the cross-side
    pairs sharing a (band, band_hash) key — multiset-equal to brute
    force (same (L,R) pair via two bands appears twice; dedup is the
    downstream groupby's job)."""
    import collections

    import pyarrow as pa

    from rio_cogeo_ray.stages.dedup import _bucket_cross_pairs

    enc = [i * 2 + s for (_, _, s, i) in rows]
    t = pa.table(
        {
            "enc": pa.array(enc, pa.int64()),
            "band": pa.array([r[0] for r in rows], pa.int64()),
            "band_hash": pa.array([r[1] for r in rows], pa.int64()),
            "side": pa.array([r[2] for r in rows], pa.int8()),
        }
    )
    got = _bucket_cross_pairs(t)
    got_pairs = collections.Counter(
        zip(got["src"].to_pylist(), got["dst"].to_pylist())
    )
    exp = collections.Counter()
    for (b1, h1, s1, i1) in rows:
        for (b2, h2, s2, i2) in rows:
            if b1 == b2 and h1 == h2 and s1 == 0 and s2 == 1:
                exp[(i1 * 2, i2 * 2 + 1)] += 1
    assert got_pairs == exp
