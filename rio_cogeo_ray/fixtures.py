"""Deterministic synthetic `pages` corpus + AOI tables (FIXTURES.md).

Mirrors the reference's golden fixture corpus (tests/fixtures/*.tif →
scenario pages tables; see FIXTURES.md for the mapping). Generation is
seeded, order-deterministic, and fully vectorized (numpy + pyarrow list
joins — no per-row Python), so the same ids produce the same bytes on
every worker; the ``text`` column is literally ``extract_text(html)``,
establishing the byte-identical-extraction invariant by construction.

The generator doubles as the bench-scale input source: ``gen_pages`` is
called shard-by-shard inside ``map_batches`` to synthesize millions of
rows in parallel (each shard depends only on its id range).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from rio_cogeo_ray.functions.extract import extract_text
from rio_cogeo_ray.functions.geocode import GeoSpec, GLOBAL_UNIFORM
from rio_cogeo_ray.functions.hashing import hash2, splitmix64, weighted_pick

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

LANGS = ["en", "de", "fr", "es", "zh", "ar", "ru", "pt", "ja", "hi"]
LANG_WEIGHTS = [45, 10, 10, 8, 7, 5, 5, 4, 3, 3]

_HOSTS = [
    "alpha.example.org",
    "beta.example.net",
    "gamma.example.com",
    "delta.example.io",
    "epsilon.example.dev",
]

# --------------------------------------------------------------------------
# Per-language vocabularies (deterministic, built once at import).
# --------------------------------------------------------------------------

_EN_STOP = (
    "the and of to a in is it you that he was for on are as with his they at "
    "be this have from or one had by but not what all were when your can said"
).split()

_LATIN_C = "bcdfghjklmnprstvz"
_LATIN_V = "aeiou"


def _syllable_words(n: int, salt: int, alphabet: Optional[str] = None) -> List[str]:
    """n deterministic pseudo-words; latin CV syllables or plain chars from
    ``alphabet`` for non-latin scripts."""
    out = []
    for i in range(n):
        h = int(splitmix64(np.uint64(salt * 100003 + i)))
        if alphabet is None:
            k = 2 + h % 3  # 2-4 syllables
            w = []
            for j in range(k):
                hj = h >> (7 * j)
                w.append(_LATIN_C[hj % len(_LATIN_C)] + _LATIN_V[(hj >> 5) % len(_LATIN_V)])
            out.append("".join(w))
        else:
            k = 1 + h % 3
            out.append("".join(alphabet[(h >> (9 * j)) % len(alphabet)] for j in range(k)))
    return out


def _alphabet(start: int, count: int) -> str:
    return "".join(chr(start + i) for i in range(count))


def _build_vocabs() -> Dict[str, np.ndarray]:
    latin = {"en": 1, "de": 2, "fr": 3, "es": 4, "pt": 5}
    nonlatin = {
        "zh": _alphabet(0x4E00, 64),
        "ar": _alphabet(0x0627, 24),
        "ru": _alphabet(0x0430, 30),
        "ja": _alphabet(0x3042, 40),
        "hi": _alphabet(0x0905, 40),
    }
    vocabs = {}
    for lang, salt in latin.items():
        words = list(_EN_STOP) if lang == "en" else _syllable_words(24, salt * 7 + 1)
        words += _syllable_words(200, salt)
        # a few entity-bearing tokens exercise the unescape path
        words += ["q&amp;a", "x&lt;y", "&quot;quote&quot;"]
        vocabs[lang] = np.array(words, dtype=object)
    for lang, ab in nonlatin.items():
        vocabs[lang] = np.array(_syllable_words(160, 97, ab), dtype=object)
    return vocabs


_VOCABS = _build_vocabs()

# Flat vocabulary as ONE Arrow string array + per-lang (offset, size): word
# lookup is a single vectorized `take`, never a Python-object gather.
_VOCAB_FLAT = pa.array(
    [w for lang in LANGS for w in _VOCABS[lang]], type=pa.string()
)
_VOCAB_SIZES = np.array([len(_VOCABS[lang]) for lang in LANGS], dtype=np.uint64)
_VOCAB_OFFSETS = np.concatenate(([0], np.cumsum(_VOCAB_SIZES))).astype(np.int64)[:-1]
_HOSTS_ARR = pa.array(_HOSTS, type=pa.string())
_LANGS_ARR = pa.array(LANGS, type=pa.string())

_TS_BASE_US = 1704067200_000000  # 2024-01-01T00:00:00Z in microseconds
_YEAR_US = 365 * 24 * 3600 * 1000000


def gen_pages(
    start_id: int,
    n: int,
    seed: int = 42,
    sort_by_url: bool = True,
) -> pa.Table:
    """Generate rows for ids [start_id, start_id+n) of the pages corpus.

    Row content depends only on (id, seed): shard-parallel generation is
    exact. ``text`` = extract_text(html) by construction.
    """
    ids = np.arange(start_id, start_id + n, dtype=np.int64)
    return gen_pages_ids(ids, seed=seed, sort_by_url=sort_by_url)


def gen_pages_ids(
    ids: np.ndarray,
    seed: int = 42,
    sort_by_url: bool = True,
) -> pa.Table:
    """Generate rows for an arbitrary id array (shard-parallel source)."""
    ids = np.asarray(ids, dtype=np.int64)
    n = len(ids)
    h0 = hash2(ids, seed)
    h1 = splitmix64(h0)
    h2 = splitmix64(h1)

    host_idx = (h0 % np.uint64(len(_HOSTS))).astype(np.int64)
    hosts = _HOSTS_ARR.take(pa.array(host_idx))
    url = pc.binary_join_element_wise(
        pa.scalar("https://"),
        hosts,
        pa.scalar("/p/"),
        pa.array(ids.astype(str), type=pa.string()),
        "",
    )

    warc_ts = pa.array(
        (_TS_BASE_US + (h1 % np.uint64(_YEAR_US)).astype(np.int64)),
        type=pa.timestamp("us", tz="UTC"),
    )

    lang_idx = weighted_pick(h2, LANG_WEIGHTS)
    lang = _LANGS_ARR.take(pa.array(lang_idx))

    # ---- document structure counts (per row) -----------------------------
    title_len = (2 + (h0 >> np.uint64(17)) % np.uint64(3)).astype(np.int64)  # 2-4
    n_paras = (1 + (h0 >> np.uint64(23)) % np.uint64(3)).astype(np.int64)  # 1-3
    # words per paragraph: flat over all paragraphs
    para_doc = np.repeat(np.arange(n, dtype=np.int64), n_paras)  # doc idx per para
    para_pos = _pos_within(n_paras)
    wpp = (8 + hash2(ids[para_doc], para_pos * 7 + 11) % np.uint64(40)).astype(np.int64)

    # ---- flat word streams ----------------------------------------------
    def words_for(
        doc_idx: np.ndarray,
        counts: np.ndarray,
        stream_salt: int,
        pos_offset: Optional[np.ndarray] = None,
    ) -> pa.Array:
        """Gather per-doc word tokens from the doc's language vocab."""
        flat_doc = np.repeat(doc_idx, counts)
        flat_pos = _pos_within(counts)
        if pos_offset is not None:
            flat_pos = flat_pos + np.repeat(pos_offset, counts)
        hw = hash2(ids[flat_doc] * np.int64(3), flat_pos * 131 + stream_salt)
        li = lang_idx[flat_doc]
        # vocab sizes differ per lang: global index into the flat vocab
        widx = (hw % _VOCAB_SIZES[li]).astype(np.int64) + _VOCAB_OFFSETS[li]
        return _VOCAB_FLAT.take(pa.array(widx))

    title_words = words_for(np.arange(n, dtype=np.int64), title_len, 5)
    title_off = np.concatenate(([0], np.cumsum(title_len))).astype(np.int32)
    title = pc.binary_join(pa.ListArray.from_arrays(pa.array(title_off), title_words), " ")

    # word positions must be unique within the DOC (not the paragraph) so
    # consecutive paragraphs differ: offset each paragraph by the number of
    # words its doc already emitted.
    wpp_excl = np.concatenate(([0], np.cumsum(wpp)))[:-1]
    doc_first_para = np.concatenate(([0], np.cumsum(n_paras)))[:-1]
    para_start_in_doc = wpp_excl - np.repeat(wpp_excl[doc_first_para], n_paras)
    para_words = words_for(para_doc, wpp, 9, pos_offset=para_start_in_doc)
    para_off = np.concatenate(([0], np.cumsum(wpp))).astype(np.int32)
    paras = pc.binary_join(pa.ListArray.from_arrays(pa.array(para_off), para_words), " ")
    doc_off = np.concatenate(([0], np.cumsum(n_paras))).astype(np.int32)
    body = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(doc_off), paras), "</p>\n<p>"
    )

    html_str = pc.binary_join_element_wise(
        pa.scalar("<html><head><title>"),
        title,
        pa.scalar("</title></head>\n<body>\n<p>"),
        body,
        pa.scalar("</p>\n</body></html>"),
        "",
    )
    text = extract_text(html_str)
    html = html_str.cast(pa.binary())

    table = pa.Table.from_arrays(
        [url, warc_ts, html, text, lang], schema=PAGES_SCHEMA
    )
    if sort_by_url:
        table = table.sort_by("url")
    return table


def _pos_within(counts: np.ndarray) -> np.ndarray:
    """[0..c0-1, 0..c1-1, ...] — position index within each group."""
    counts = np.asarray(counts, dtype=np.int64)
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    ends = np.cumsum(counts)
    starts = ends - counts
    return np.arange(total, dtype=np.int64) - np.repeat(starts, counts)


# --------------------------------------------------------------------------
# AOI polygons — the small join side (FIXTURES.md `aois`).
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class Aoi:
    aoi_id: int
    name: str
    #: lon/lat vertex ring, implicitly closed; edge points count as inside.
    ring: Tuple[Tuple[float, float], ...]


def _rect(aoi_id: int, name: str, w: float, s: float, e: float, n: float) -> Aoi:
    return Aoi(aoi_id, name, ((w, s), (e, s), (e, n), (w, n)))


def _hexagon(aoi_id: int, name: str, cx: float, cy: float, r: float) -> Aoi:
    pts = tuple(
        (cx + r * float(np.cos(np.pi / 3 * k)), cy + r * float(np.sin(np.pi / 3 * k)))
        for k in range(6)
    )
    return Aoi(aoi_id, name, pts)


#: Rectangle AOIs used by the SQL-checkable point-in-polygon queries
#: (a rectangle's PIP is expressible as BETWEEN predicates in ANSI SQL).
RECT_AOIS: List[Aoi] = [
    _rect(0, "aoi-0", -10.0, 35.0, 30.0, 60.0),  # "europe"
    _rect(1, "aoi-1", -125.0, 25.0, -65.0, 50.0),  # "conus"
    _rect(2, "aoi-2", 95.0, -10.0, 145.0, 35.0),  # "east-asia"
    _rect(3, "aoi-3", -20.0, -35.0, 52.0, 35.0),  # "africa" (overlaps aoi-0 edge zone)
    _rect(4, "aoi-4", 160.0, 70.0, 175.0, 80.0),  # empty-ish of pages
]

#: General convex AOIs exercising the real ray-casting PIP path in tests.
HEX_AOIS: List[Aoi] = [
    _hexagon(10, "hex-10", 5.0, 48.0, 6.0),
    _hexagon(11, "hex-11", -100.0, 38.0, 9.0),
    _hexagon(12, "hex-12", 120.0, 10.0, 7.5),
]


def aois_table(aois: List[Aoi]) -> pa.Table:
    """AOIs as an Arrow table with list<struct> rings (WKB-free: the
    engine's polygon model is an explicit vertex ring)."""
    return pa.table(
        {
            "aoi_id": pa.array([a.aoi_id for a in aois], pa.int32()),
            "name": pa.array([a.name for a in aois], pa.string()),
            "ring_lon": pa.array([[p[0] for p in a.ring] for a in aois], pa.list_(pa.float64())),
            "ring_lat": pa.array([[p[1] for p in a.ring] for a in aois], pa.list_(pa.float64())),
        }
    )


# --------------------------------------------------------------------------
# Scenario fixtures (FIXTURES.md table) — cached parquet under /tmp.
# --------------------------------------------------------------------------

#: scenario → (rows, GeoSpec). Box weights shape the spatial situation.
SCENARIOS: Dict[str, Tuple[int, GeoSpec]] = {
    # dense mid-latitude bbox spanning a few tiles (image_rgb analog)
    "pages_rgb": (4000, GeoSpec(boxes=[(0.0, 40.0, 11.25, 48.0, 1)])),
    # 15%-ish geocode-invalid (image_nodata analog)
    "pages_nodata": (4000, GeoSpec(boxes=[(0.0, 40.0, 11.25, 48.0, 1)], invalid_per_65536=9830)),
    # bbox deliberately NOT aligned to the tile grid (image_web analog)
    "pages_web": (6000, GeoSpec(boxes=[(3.7, 41.3, 19.9, 52.8, 1)])),
    # high-latitude cluster (image_north analog)
    "pages_north": (3000, GeoSpec(boxes=[(10.0, 72.0, 40.0, 79.0, 1)])),
    # extent smaller than one tile (image_171px/51px analog)
    "pages_tiny": (800, GeoSpec(boxes=[(12.30, 45.40, 12.36, 45.44, 1)])),
    # skew: ~80% of pages in 3 tiny urban boxes (north-rule addition)
    "pages_skew": (
        12000,
        GeoSpec(
            boxes=[
                (2.2, 48.8, 2.5, 48.95, 30),  # paris-ish
                (-74.05, 40.65, -73.9, 40.85, 30),  # nyc-ish
                (139.6, 35.5, 139.9, 35.75, 20),  # tokyo-ish
                (-180.0, -85.0, 180.0, 85.0, 20),  # background
            ]
        ),
    ),
    # points straddling AOI boundaries (pages_aoi)
    "pages_aoi": (8000, GeoSpec(boxes=[(-130.0, 20.0, 150.0, 65.0, 1)])),
    # kNN layout around two tile centroids
    "pages_knn": (2000, GeoSpec(boxes=[(8.0, 44.0, 14.0, 50.0, 1)])),
    # global uniform — generic
    "pages_global": (6000, GLOBAL_UNIFORM),
    # NaN-capable float weight channel (image_nan analog,
    # tests/test_cogeo.py:236-255): ~5% of scores are NaN → nodata pages
    "pages_nan": (3000, GeoSpec(boxes=[(0.0, 40.0, 11.25, 48.0, 1)])),
    # wide extent spanning many tiles (image_2000px analog,
    # tests/test_validate.py:20,47) — built without overviews in tests
    # to drive the overview-recommended / not-tiled validator paths
    "pages_big": (5000, GeoSpec(boxes=[(-120.0, -60.0, 120.0, 60.0, 1)])),
    # lang column drives a categorical channel via a user-supplied
    # colormap (image_colormap analog, tests/test_cogeo.py:491-554)
    "pages_colormap": (3000, GeoSpec(boxes=[(3.7, 41.3, 19.9, 52.8, 1)])),
    # dataset/band metadata forwarding (image_tags/cog_band_tags analog,
    # tests/test_cogeo.py:326-354,778-816)
    "pages_tags": (1000, GeoSpec(boxes=[(12.0, 45.0, 13.0, 46.0, 1)])),
}


def scenario_spec(name: str) -> GeoSpec:
    return SCENARIOS[name][1]


def scenario_table(name: str, n: Optional[int] = None, seed: int = 42) -> pa.Table:
    rows, _spec = SCENARIOS[name]
    t = gen_pages(0, n or rows, seed=seed)
    if name == "pages_nan":
        # deterministic float 'score' channel with ~5% NaN (nodata pages)
        from rio_cogeo_ray.functions.hashing import splitmix64

        ids = np.arange(len(t), dtype=np.uint64)
        h = splitmix64(ids + np.uint64(0xA5A5))
        score = (h % np.uint64(1 << 20)).astype(np.float64) / float(1 << 12)
        score[(h >> np.uint64(40)) % np.uint64(20) == 0] = np.nan
        t = t.append_column("score", pa.array(score, pa.float64()))
    return t


def scenario_path(name: str, tmp_root: str = "/tmp/rcr_fixtures") -> str:
    """Write-once cache of a scenario pages table as parquet."""
    os.makedirs(tmp_root, exist_ok=True)
    path = os.path.join(tmp_root, f"{name}.parquet")
    if not os.path.exists(path):
        tmp = path + ".tmp"
        pq.write_table(scenario_table(name), tmp)
        os.replace(tmp, path)
    return path
