"""Shared helpers, SQL fragments and tuning constants for the query registry.

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


# ---------------------------------------------------------------------------
# Shared SQL fragments (mirror functions/geocode.py + stages/assign.py)
# ---------------------------------------------------------------------------

_LON = "(((doc_id * 2654435761) % 4294967296) / 4294967296.0 * 360.0 - 180.0)"


_LAT = "((((doc_id + 1) * 2246822519) % 4294967296) / 4294967296.0 * 170.0 - 85.0)"


_VALID = "(((doc_id * 2654435761) % 4294967296) % 97 <> 0)"


_MX = "(lon * 111319.49079327358)"


_MY = "(6378137.0 * LN(TAN(PI() / 4.0 + (lat * PI() / 180.0) / 2.0)))"


_O = "20037508.342789244"


def _span_sql(z: int) -> str:
    return f"((2.0 * {_O}) / {float(1 << z)!r})"


def _geo_cte() -> str:
    return (
        f"WITH g AS (SELECT doc_id, n_chars, {_LON} AS lon, {_LAT} AS lat "
        f"FROM documents WHERE {_VALID}), "
        f"m AS (SELECT doc_id, n_chars, lon, lat, {_MX} AS mx, {_MY} AS my FROM g)"
    )


def _tile_sql(z: int) -> str:
    n = (1 << z) - 1
    s = _span_sql(z)
    return (
        f"SELECT doc_id, n_chars, lon, lat, mx, my, "
        f"LEAST(GREATEST(CAST(FLOOR((mx + {_O}) / {s}) AS BIGINT), 0), {n}) AS x, "
        f"LEAST(GREATEST(CAST(FLOOR(({_O} - my) / {s}) AS BIGINT), 0), {n}) AS y FROM m"
    )


def _read(path: str, columns):
    """read_parquet with a size-aware block count: ~8 MiB of file per
    block, clamped to [1, 64]. Ray's default splits even a 5 MiB table
    into 2×cpus blocks, and every downstream sort/groupby exchange then
    pays one map+merge task PER BLOCK — on small-to-medium tables the
    scheduling dwarfs the compute. Above the clamp (≫512 MiB) Ray's own
    heuristic takes over (None), which is the 100 TB path."""
    n = max(1, os.path.getsize(path) // (8 << 20))
    return rd.read_parquet(
        path, columns=columns, override_num_blocks=int(n) if n <= 64 else None
    )


def _docs(sf_dir: str, columns):
    return _read(os.path.join(sf_dir, "documents.parquet"), columns)


def _prepared_docs(sf_dir: str, zoom: int, columns=("doc_id",)):
    ds = _docs(sf_dir, list(columns))
    fn = assign.make_prepare_fn(None, zoom, extract=False, source="documents")
    return ds.map_batches(fn, batch_format="pyarrow")


def _valid_only(ds):
    return ds.map_batches(assign.drop_invalid, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Query implementations
# ---------------------------------------------------------------------------

TILE_Z = 6


DENSITY_Z = 4


RASTER_Z = 5


RASTER_G = 64


KNN_K = 8


ANN_K = 10


ANN_QUERY_IDS = [0, 1, 2]


#: User-defined TMS for q_tile_assign_tms (the reference's --tms
#: custom.json axis): a 3×2 base quad grid over the plain-degree world.
_CUSTOM_TMS = {
    "origin_x": -180.0, "origin_y": 90.0,
    "span_x": 360.0, "span_y": 180.0,
    "cols0": 3, "rows0": 2,
}


CUSTOM_TMS_Z = 4


_CT_NX = _CUSTOM_TMS["cols0"] << CUSTOM_TMS_Z


_CT_NY = _CUSTOM_TMS["rows0"] << CUSTOM_TMS_Z


def _sql_pyramid_counts() -> str:
    base = (
        _geo_cte() + f", t AS ({_tile_sql(DENSITY_Z)}), "
        f"base AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS pages FROM t GROUP BY x, y)"
    )
    parts = [f"SELECT CAST({DENSITY_Z} AS BIGINT) AS z, x, y, pages FROM base"]
    for z in range(DENSITY_Z - 1, -1, -1):
        k = DENSITY_Z - z
        d = 1 << k
        parts.append(
            f"SELECT CAST({z} AS BIGINT) AS z, x // {d} AS x, y // {d} AS y, "
            f"CAST(SUM(pages) AS BIGINT) AS pages FROM base GROUP BY x // {d}, y // {d}"
        )
    return base + " " + " UNION ALL ".join(parts)


def _aoi_values_sql() -> str:
    rows = []
    for a in fixtures.RECT_AOIS:
        (w, s), (e, n) = a.ring[0], a.ring[2]
        rows.append(f"({a.aoi_id}, {w!r}, {s!r}, {e!r}, {n!r})")
    return "(VALUES " + ", ".join(rows) + ") AS a(aoi_id, w, s, e, n)"


def pip_stage(ds, mode: str):
    from rio_cogeo_ray.stages import pip as pip_mod

    return pip_mod.pip_join(ds, fixtures.aois_table(fixtures.RECT_AOIS), mode=mode, concurrency=2)


_S5 = _span_sql(RASTER_Z)


KNN_TILE_K = 4


#: Deterministic prior/new split of the documents table for the
#: incremental-dedup scenario: knuth32(doc_id) % 10 < 3 is "the prior
#: crawl snapshot" (~30%), the rest is "the new crawl" — mirrored
#: literally in the oracle SQL.
_PRIOR_PRED_SQL = "((doc_id * 2654435761) % 4294967296) % 10 < 3"


COPURCHASE_K = 25


_TR_H = 3_600_000_000


_TR_LVL = (
    "SELECT {i} AS level, event_type, "
    "(epoch_us(ts) // {u}) * {u} AS window_start_us, "
    "CAST(SUM(CAST(FLOOR(value * 1000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_q, "
    "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY event_type, window_start_us"
)


TIME_BAND_US = 30 * 60 * 1_000_000


RADIUS_M = 500_000


SESSIONS_LATE_GAP_US = 30 * 60 * 1_000_000


SESSIONS_LATE_LATENESS_US = 24 * 3_600_000_000


K_ANON_K, K_ANON_BIN = 5, 500


TREND_HOUR_US = 3_600_000_000


GROWTH_HOUR_US = 3_600_000_000


CONC_TOPK = 10


RESAMPLE_GRID_US = 3_600_000_000


def _morton_spread_sql(col: str, bits: int) -> str:
    terms = [f"(({col} // {1 << b}) % 2) * {1 << (2 * b)}" for b in range(bits)]
    return "(" + " + ".join(terms) + ")"


#: lang → category/color lookup (colormap analog, cogeo.py:345-360):
#: tiny dimension broadcast with ray.put, VALUES join in the oracle.
LANG_CATEGORIES = [
    ("en", 0, "#1f77b4"), ("de", 1, "#ff7f0e"), ("fr", 2, "#2ca02c"),
    ("es", 3, "#d62728"), ("zh", 4, "#9467bd"),
]


# ---------------------------------------------------------------------------
# Sampling + sketches (stages/sketch.py)
# ---------------------------------------------------------------------------

SAMPLE_NUM, SAMPLE_DEN = 1, 20  # 5%


BOTTOMK_K = 100


_SLIDE_Q = "CAST(FLOOR(value * 1000 + 0.5) AS BIGINT)"


TOPK_TOKENS = 50


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------


def _conv_level_query(sf_dir: str, kernel: str):
    """One interpolating-kernel pyramid step (z=5 density grid → z=4)
    exploded to per-pixel rows — the SQL-checked path for the conv
    resampling kernels (reference enum rio_cogeo/cogeo.py:48-60).
    The grid is n_chars-weighted (band-value analog) so values are large
    enough to survive the (Σw)² floor normalization."""
    ds = _valid_only(_prepared_docs(sf_dir, RASTER_Z, columns=("doc_id", "n_chars")))
    partials = ds.map_batches(
        lambda t: rasterize.density_partials(t, RASTER_G, "n_chars"),
        batch_format="pyarrow",
    )
    merged = rasterize.merge_sparse_tiles(partials, "sum", level=0, tile_px=RASTER_G)
    parent_dim = (1 << (RASTER_Z - 1)) * RASTER_G
    conv = merged.map_batches(
        lambda t: rasterize.pyramid_partials_conv(t, RASTER_G, kernel, 2, parent_dim),
        batch_format="pyarrow",
    )
    cmerged = rasterize.merge_sparse_tiles(conv, "sum", level=1, tile_px=RASTER_G)
    final = cmerged.map_batches(
        lambda t: rasterize.finalize_conv_tiles(t, kernel, 2), batch_format="pyarrow"
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


def _sql_conv_level(kernel: str) -> str:
    """DuckDB mirror of one conv pyramid step: the SAME integer taps
    (from rasterize.kernel_taps, embedded as a VALUES table), the same
    separable two-pass expansion, the same floor division by (Σw)²."""
    offs, ws, wsum = rasterize.kernel_taps(kernel, 2)
    taps = ", ".join(f"({int(o)}, {int(w)})" for o, w in zip(offs, ws))
    w2 = wsum * wsum
    pdim = (1 << (RASTER_Z - 1)) * RASTER_G
    return (
        _geo_cte() + f", t AS ({_tile_sql(RASTER_Z)}), "
        f"p AS (SELECT x, y, n_chars, "
        f"LEAST(GREATEST(CAST(FLOOR((mx - (x * {_S5} - {_O})) / ({_S5} / {float(RASTER_G)!r})) AS BIGINT), 0), {RASTER_G - 1}) AS px, "
        f"LEAST(GREATEST(CAST(FLOOR((({_O} - y * {_S5}) - my) / ({_S5} / {float(RASTER_G)!r})) AS BIGINT), 0), {RASTER_G - 1}) AS py "
        f"FROM t), "
        f"base AS (SELECT x * {RASTER_G} + px AS gx, y * {RASTER_G} + py AS gy, "
        f"CAST(SUM(n_chars) AS BIGINT) AS v FROM p GROUP BY gx, gy), "
        f"taps(o, w) AS (VALUES {taps}), "
        f"cx AS (SELECT CAST((b.gx - tx.o) / 2 AS BIGINT) AS pgx, b.gy AS gy, "
        f"b.v * tx.w AS v FROM base b, taps tx "
        f"WHERE (b.gx - tx.o) >= 0 AND (b.gx - tx.o) % 2 = 0 AND (b.gx - tx.o) < {2 * pdim}), "
        f"cy AS (SELECT cx.pgx AS pgx, CAST((cx.gy - ty.o) / 2 AS BIGINT) AS pgy, "
        f"cx.v * ty.w AS v FROM cx, taps ty "
        f"WHERE (cx.gy - ty.o) >= 0 AND (cx.gy - ty.o) % 2 = 0 AND (cx.gy - ty.o) < {2 * pdim}), "
        f"num AS (SELECT pgx, pgy, CAST(SUM(v) AS BIGINT) AS s FROM cy GROUP BY pgx, pgy), "
        f"fin AS (SELECT pgx, pgy, "
        f"CAST((s - ((s % {w2}) + {w2}) % {w2}) / {w2} AS BIGINT) AS cnt FROM num) "
        f"SELECT pgx // {RASTER_G} AS x, pgy // {RASTER_G} AS y, "
        f"(pgy % {RASTER_G}) * {RASTER_G} + (pgx % {RASTER_G}) AS cell, cnt "
        f"FROM fin WHERE cnt <> 0"
    )


# lon/lat derived as EXACT integer-arithmetic floats from c_custkey so
# the Ray pipeline and the SQL mirror agree bit-for-bit.
_LL_LON = "((CAST((c_custkey * 7919) % 36000 AS DOUBLE) / 100.0) - 180.0)"


_LL_LAT = "((CAST((c_custkey * 104729) % 16000 AS DOUBLE) / 100.0) - 80.0)"


#: [lo, hi) price bands for the broadcast range join (band, lo, hi)
PRICE_BANDS = [
    ("small", 0.0, 50_000.0),
    ("mid", 50_000.0, 150_000.0),
    ("large", 150_000.0, 300_000.0),
    ("jumbo", 300_000.0, 1e18),
]


QUANTILE_QS = (0.5, 0.9, 0.99)


STRATIFIED_K = 20


TOPK_PER_LANG = 5


CRS84_Z = 5


_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


_PII_PHONE = r"\+?[0-9][0-9()\-\s]{7,}[0-9]"


_PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def _synth_url_col(t: pa.Table) -> pa.Table:
    """Deterministic synthetic url per doc_id — the host_stats literal
    (the corpus has no url column; the SQL mirrors this expression
    character-for-character)."""
    import pyarrow.compute as pc

    did = t["doc_id"]
    if isinstance(did, pa.ChunkedArray):
        did = did.combine_chunks()
    d = did.to_numpy(zero_copy_only=False)
    h = d % 53
    scheme = pc.if_else(
        pc.equal(pc.bit_wise_and(did, 1), pa.scalar(0, pa.int64())),
        pa.scalar("http"),
        pa.scalar("https"),
    )
    extra = pa.array(["", "/x", "/x/x"]).take(pa.array(d % 3))
    url = pc.binary_join_element_wise(
        scheme, "://w", pa.array(h.astype(str)), ".site",
        pa.array((h % 7).astype(str)), ".",
        pa.array(["com", "org", "net", "io"]).take(pa.array(h % 4)),
        "/p/", pa.array((d % 16).astype(str)), extra, "",
    )
    return pa.table({"doc_id": did, "url": url})


#: Wildcard-subdomain blocklist for q_blocklist: "site0.com" blocks the
#: domain and every subdomain; "org" blocks a whole TLD; the exact-host
#: entries hit single hosts; "w5.site5.org" is REDUNDANT under "org"
#: (exercises the prefix-free canonicalization).
_BLOCK_DOMAINS = ["site0.com", "org", "w3.site3.io", "w10.site3.net", "w5.site5.org"]


_BLOCK_SQL_VALUES = ", ".join(f"('{d}')" for d in _BLOCK_DOMAINS)


_URL_SQL_PAT = "^(https?)://([^/]+?)\\.([a-z]+)(/.*)?$"


_DOMAIN_SUFFIX_CHOICES = (
    "com", "org", "net", "io", "co.uk", "github.io", "com.au",
    "s3.amazonaws.com",
)


def _sql_domain_rollup() -> str:
    from rio_cogeo_ray.stages.text import PUBLIC_SUFFIXES_2, PUBLIC_SUFFIXES_3

    suf2 = ", ".join(f"'{s}'" for s in PUBLIC_SUFFIXES_2)
    suf3 = ", ".join(f"'{s}'" for s in PUBLIC_SUFFIXES_3)
    sufx_case = " ".join(
        f"WHEN {i} THEN '{s}'" for i, s in enumerate(_DOMAIN_SUFFIX_CHOICES[:-1])
    )
    seg = r"[^.]+"
    pats = {k: r"(" + r"\.".join([seg] * k) + r")$" for k in (2, 3, 4)}
    return (
        "WITH base AS (SELECT doc_id, doc_id % 53 AS h, "
        "(CASE doc_id % 3 WHEN 0 THEN '' WHEN 1 THEN 'www.' ELSE 'a.b.' END) AS sub, "
        f"(CASE (doc_id % 53) % 8 {sufx_case} "
        f"ELSE '{_DOMAIN_SUFFIX_CHOICES[-1]}' END) AS sufx FROM documents), "
        "hosts AS (SELECT CASE WHEN doc_id % 97 = 0 THEN sufx "
        "ELSE sub || 'site' || CAST(h AS VARCHAR) || '.' || sufx END AS host "
        "FROM base), "
        f"lab AS (SELECT host, regexp_extract(host, '{pats[2]}', 1) AS l2, "
        f"regexp_extract(host, '{pats[3]}', 1) AS l3, "
        f"regexp_extract(host, '{pats[4]}', 1) AS l4 FROM hosts), "
        f"dom AS (SELECT host, CASE WHEN l3 IN ({suf3}) THEN l4 "
        f"WHEN l2 IN ({suf2}) THEN l3 ELSE l2 END AS domain FROM lab), "
        "ph AS (SELECT domain, host, CAST(COUNT(*) AS BIGINT) AS pages "
        "FROM dom GROUP BY domain, host) "
        "SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_hosts, "
        "CAST(SUM(pages) AS BIGINT) AS n_pages FROM ph GROUP BY domain"
    )


_BADWORDS = ("spark", "dup", "slow")


def _sql_gopher() -> str:
    from rio_cogeo_ray.stages.text import _GOPHER_STOPWORDS

    stop_sum = " + ".join(
        rf"(CASE WHEN regexp_matches(t, '\b{w}\b') THEN 1 ELSE 0 END)"
        for w in _GOPHER_STOPWORDS
    )
    return (
        "WITH s AS (SELECT doc_id, COALESCE(text, '') AS t FROM documents), "
        "c AS (SELECT doc_id, "
        r"CAST(len(regexp_extract_all(t, '\S+')) AS BIGINT) AS words, "
        r"CAST(length(regexp_replace(t, '\s+', '', 'g')) AS BIGINT) AS tok_chars, "
        "CAST(length(t) - length(replace(t, '#', '')) AS BIGINT) AS n_hash, "
        "CAST(length(t) - length(replace(t, '…', '')) AS BIGINT) AS n_ell, "
        r"CAST(len(regexp_extract_all(t, '\S*[^\p{L}\s]\S*')) AS BIGINT) AS nonalpha, "
        "CAST(len(string_split(t, chr(10))) AS BIGINT) AS n_lines, "
        "CAST(len(list_filter(string_split(t, chr(10)), "
        r"x -> regexp_matches(x, '^\s*[-*•]'))) AS BIGINT) AS n_bullet, "
        "CAST(len(list_filter(string_split(t, chr(10)), "
        r"x -> regexp_matches(x, '(\.\.\.|…)\s*$'))) AS BIGINT) AS n_ell_end, "
        f"({stop_sum}) AS stop_present FROM s) "
        "SELECT doc_id, "
        "CAST(CASE WHEN words >= 50 AND words <= 100000 THEN 1 ELSE 0 END AS BIGINT) AS r_words, "
        "CAST(CASE WHEN 3 * words <= tok_chars AND tok_chars <= 10 * words THEN 1 ELSE 0 END AS BIGINT) AS r_wordlen, "
        "CAST(CASE WHEN 10 * (n_hash + n_ell) <= words THEN 1 ELSE 0 END AS BIGINT) AS r_symbol, "
        "CAST(CASE WHEN 10 * n_bullet <= 9 * n_lines THEN 1 ELSE 0 END AS BIGINT) AS r_bullet, "
        "CAST(CASE WHEN 10 * n_ell_end <= 3 * n_lines THEN 1 ELSE 0 END AS BIGINT) AS r_ellipsis, "
        "CAST(CASE WHEN 5 * (words - nonalpha) >= 4 * words THEN 1 ELSE 0 END AS BIGINT) AS r_alpha, "
        "CAST(CASE WHEN stop_present >= 2 THEN 1 ELSE 0 END AS BIGINT) AS r_stop, "
        "CAST(CASE WHEN words >= 50 AND words <= 100000 "
        "AND 3 * words <= tok_chars AND tok_chars <= 10 * words "
        "AND 10 * (n_hash + n_ell) <= words "
        "AND 10 * n_bullet <= 9 * n_lines "
        "AND 10 * n_ell_end <= 3 * n_lines "
        "AND 5 * (words - nonalpha) >= 4 * words "
        "AND stop_present >= 2 THEN 1 ELSE 0 END AS BIGINT) AS gopher_ok "
        "FROM c"
    )


def _sql_gopher_repetition() -> str:
    from rio_cogeo_ray.stages.text import _GOPHER_REP_DUP, _GOPHER_REP_TOP

    gram_ctes, joins, flags = [], [], []
    for gn, pct in {**_GOPHER_REP_TOP, **_GOPHER_REP_DUP}.items():
        agg = (
            "MAX(c * l)"
            if gn in _GOPHER_REP_TOP
            else "SUM(CASE WHEN c >= 2 THEN c * l ELSE 0 END)"
        )
        gram_ctes.append(
            f"a{gn} AS (SELECT doc_id, CAST({agg} AS BIGINT) AS mass FROM "
            f"(SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS c, "
            f"CAST(length(g) AS BIGINT) AS l FROM "
            f"(SELECT doc_id, array_to_string(list_slice(toks, i, i + {gn - 1}), ' ') AS g "
            f"FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - {gn} + 2)) AS i "
            f"FROM base)) GROUP BY doc_id, g) GROUP BY doc_id)"
        )
        joins.append(f"LEFT JOIN a{gn} ON base.doc_id = a{gn}.doc_id")
        kind = "top" if gn in _GOPHER_REP_TOP else "dup"
        flags.append(
            f"CAST(CASE WHEN 100 * COALESCE(a{gn}.mass, 0) <= {pct} * base.total_chars "
            f"THEN 1 ELSE 0 END AS BIGINT) AS r_{kind}{gn}"
        )
    unit = (
        "{k} AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_units, "
        "CAST(SUM(c - 1) AS BIGINT) AS dup_units, "
        "CAST(SUM(c * l) AS BIGINT) AS unit_chars, "
        "CAST(SUM((c - 1) * l) AS BIGINT) AS dup_chars FROM "
        "(SELECT doc_id, u, CAST(COUNT(*) AS BIGINT) AS c, "
        "CAST(length(u) AS BIGINT) AS l FROM "
        "(SELECT doc_id, unnest(string_split(t, {sep})) AS u FROM s) "
        "GROUP BY doc_id, u) GROUP BY doc_id)"
    )
    rule_names = (
        ["r_dline", "r_dpara", "r_dline_char", "r_dpara_char"]
        + [f"r_top{g}" for g in _GOPHER_REP_TOP]
        + [f"r_dup{g}" for g in _GOPHER_REP_DUP]
    )
    ok = " * ".join(rule_names)
    return (
        "WITH s AS (SELECT doc_id, COALESCE(text, '') AS t FROM documents), "
        "base AS (SELECT doc_id, CAST(length(t) AS BIGINT) AS total_chars, "
        r"regexp_extract_all(t, '\S+') AS toks FROM s), "
        + unit.format(k="lsum", sep="chr(10)") + ", "
        + unit.format(k="psum", sep="chr(10) || chr(10)") + ", "
        + ", ".join(gram_ctes)
        + " SELECT base.doc_id, "
        "CAST(CASE WHEN 10 * lsum.dup_units <= 3 * lsum.n_units THEN 1 ELSE 0 END AS BIGINT) AS r_dline, "
        "CAST(CASE WHEN 10 * psum.dup_units <= 3 * psum.n_units THEN 1 ELSE 0 END AS BIGINT) AS r_dpara, "
        "CAST(CASE WHEN 5 * lsum.dup_chars <= lsum.unit_chars THEN 1 ELSE 0 END AS BIGINT) AS r_dline_char, "
        "CAST(CASE WHEN 5 * psum.dup_chars <= psum.unit_chars THEN 1 ELSE 0 END AS BIGINT) AS r_dpara_char, "
        + ", ".join(flags)
        + f", CAST({ok} AS BIGINT) AS repetition_ok "
        "FROM base JOIN lsum ON base.doc_id = lsum.doc_id "
        "JOIN psum ON base.doc_id = psum.doc_id "
        + " ".join(joins)
    )


#: Overlapping value tiers for the fan-out interval join (events.value
#: spans ~[0, 500]); mirrored literally in SQL_EVENTS_IN_RANGES.
EVENT_TIERS = (
    ("any", 0.0, 500.0),
    ("low", 0.0, 50.0),
    ("mid", 25.0, 200.0),
    ("high", 150.0, 500.0),
    ("hot", 400.0, 500.0),
)


#: quantiles for the per-group order-statistic query
GROUP_QUANTILE_QS = (0.5, 0.9)


WEIGHTED_K = 50


CHUNK_W, CHUNK_S = 120, 80


PACK_BUDGET = 200


PIVOT_LANGS = ["en", "de", "fr", "es", "zh"]


SPLITS = (("train", 90), ("val", 5), ("test", 5))


EXACT_SPLIT_PCT = 5


LPM_RULES = [
    "https://h1",                 # broad: matches h1 AND h10..h19 hosts
    "https://h12.example.com/",   # shadows the broad rule for h12
    "https://h2",
    "https://h2.example.com/p3",  # path-specific beats host-broad
    "https://h7.example.com/",
    "https://h19.example.com/p1",
]


def _sql_lpm_rules() -> str:
    values = ", ".join(f"('{r}')" for r in LPM_RULES)
    return f"""
WITH u AS (SELECT doc_id,
                  'https://h' || doc_id % 23 || '.example.com/p' || doc_id % 11
                    AS url
           FROM documents),
r(prefix) AS (VALUES {values}),
j AS (SELECT u.doc_id, u.url, r.prefix
      FROM u LEFT JOIN r ON starts_with(u.url, r.prefix)),
b AS (SELECT doc_id, url, prefix,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY length(prefix) DESC) AS rk
      FROM j)
SELECT doc_id, url, prefix AS rule FROM b WHERE rk = 1
"""


def _bpe_merges(sf_dir: str, max_words: int = 4000, n_merges: int = 200):
    """Train the corpus BPE once per (sf_dir, params) per process —
    distributed word-frequency reduction + driver-side merge learning
    over the bounded table (stages/tokenizer.py doctrine)."""
    from rio_cogeo_ray.stages import tokenizer

    key = (sf_dir, max_words, n_merges)
    cached = _BPE_CACHE.get(key)
    if cached is None:
        wf = tokenizer.word_frequencies(
            _docs(sf_dir, ["text"]), "text", max_words=max_words
        )
        cached = tokenizer.train_bpe_merges(wf, n_merges)
        _BPE_CACHE[key] = cached
    return cached


_BPE_CACHE: Dict[tuple, list] = {}


SHARD_N = 8


RANKJOIN_K = 5


RANKJOIN_T = 4


def _simgraph_edges(sf_dir: str, min_overlap: int):
    """Shared doc-similarity graph: each doc's top-5 tokens (by in-doc
    frequency, token tie-break) pairwise-joined on set overlap ≥
    ``min_overlap`` → (a, b) edges with a < b. The ONE definition
    consumed by ranking_simjoin, triangles and pagerank (and mirrored
    by their SQL CTEs)."""
    from rio_cogeo_ray.stages.knn import per_group_topk

    docs = _docs(sf_dir, ["doc_id", "text"])
    counts = docs.map_batches(
        lambda t: text.doc_token_counts(t), batch_format="pyarrow"
    )
    top = per_group_topk(
        counts, "doc_id", [("n", False), ("token", True)], RANKJOIN_K
    ).map_batches(lambda t: t.select(["doc_id", "token"]), batch_format="pyarrow")
    return dedup.ranking_overlap_join(top, "doc_id", "token", min_overlap=min_overlap)


UPSAMPLE_NUM, UPSAMPLE_DEN = 5, 2


TRI_T = 3


def _text_index_dir(sf_dir: str) -> str:
    """Build (or reuse) the inverted text index for this sf_dir."""
    import hashlib

    from rio_cogeo_ray.stages import search

    doc_path = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(doc_path)
    tag = hashlib.sha256(f"{doc_path}:{st.st_size}:{st.st_mtime_ns}".encode()).hexdigest()[:12]
    idx_dir = f"/tmp/rcr_textindex/{tag}"
    if not os.path.exists(os.path.join(idx_dir, search.MANIFEST)):
        search.build_text_index(_docs(sf_dir, ["doc_id", "text"]), idx_dir)
    return idx_dir


# chosen to have matches at BOTH graded scales (sf0.001 and sf0.01):
# a 0-row Dataset loses its schema in Ray's to_pandas, so a legitimate
# empty result would schema-mismatch the oracle compare
PHRASE_TERMS = ("table", "value", "fast")


def _pos_index_dir(sf_dir: str) -> str:
    """Build (or reuse) the POSITIONAL text index for this sf_dir."""
    import hashlib

    from rio_cogeo_ray.stages import search

    doc_path = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(doc_path)
    tag = hashlib.sha256(
        f"pos:{doc_path}:{st.st_size}:{st.st_mtime_ns}".encode()
    ).hexdigest()[:12]
    idx_dir = f"/tmp/rcr_posindex/{tag}"
    if not os.path.exists(os.path.join(idx_dir, search.MANIFEST)):
        search.build_positional_index(_docs(sf_dir, ["doc_id", "text"]), idx_dir)
    return idx_dir


SUBSTRING_NEEDLE = "merge batch"


def _trigram_index_dir(sf_dir: str) -> str:
    """Build (or reuse) the character-trigram index for this sf_dir."""
    import hashlib

    from rio_cogeo_ray.stages import search

    doc_path = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(doc_path)
    tag = hashlib.sha256(
        f"tri:{doc_path}:{st.st_size}:{st.st_mtime_ns}".encode()
    ).hexdigest()[:12]
    idx_dir = f"/tmp/rcr_triindex/{tag}"
    if not os.path.exists(os.path.join(idx_dir, search.MANIFEST)):
        search.build_trigram_index(_docs(sf_dir, ["doc_id", "text"]), idx_dir)
    return idx_dir


SEG_W = 10


ENTROPY_MAXLEN = 8191


SEARCH_TERMS = ("dup", "vector")


NTILE_N = 4


INTRA_W = 2


HOST_CAP_K = 3


LANG_BALANCE_CAP = 60


DECONTAM_N = 5


SKIPGRAM_W, SKIPGRAM_K, SKIPGRAM_MIN_N = 3, 30, 2


KEYNESS_K, KEYNESS_SMOOTH = 15, 1


NOVELTY_N = 3


BITEXT_MAX_DF, BITEXT_MIN_SHARED = 4, 2


CONTAM_REPORT_N = 4


LM_MIN_COUNT = 4


_CANON_SQL = (
    "regexp_replace(regexp_replace(lower(regexp_replace(regexp_replace("
    "url, '#.*$', ''), '\\?.*$', '')), '^https?://', ''), '/$', '')"
)


HIST_BINS = 16


def _quadkey_sql_expr(z: int) -> str:
    terms = []
    for i in range(z):
        b = z - 1 - i
        terms.append(
            f"(((x // {1 << b}) % 2) + 2 * ((y // {1 << b}) % 2)) "
            f"* {10 ** (z - 1 - i)}"
        )
    return " + ".join(terms)


EVENT_GAP_US = 2 * 3600 * 1_000_000


JACCARD_TAU_PPM = 800_000


def _sql_script_mix() -> str:
    from rio_cogeo_ray.stages.text import SCRIPT_CLASSES

    cnt = ",\n    ".join(
        rf"CAST(len(regexp_extract_all(COALESCE(text, ''), '\p{{{s}}}')) AS BIGINT)"
        rf" AS n_{s.lower()}"
        for s in SCRIPT_CLASSES
    )
    cols = [f"n_{s.lower()}" for s in SCRIPT_CLASSES]
    greatest = "GREATEST(" + ", ".join(cols) + ")"
    tot = " + ".join(cols)
    dom = " ".join(
        f"WHEN {c} = top_c THEN '{s}'" for s, c in zip(SCRIPT_CLASSES, cols)
    )
    return f"""
WITH s AS (SELECT doc_id,
    {cnt}
  FROM documents),
g AS (SELECT *, {greatest} AS top_c, {tot} AS tot FROM s)
SELECT doc_id, {', '.join(cols)},
  CASE WHEN top_c = 0 THEN '' {dom} END AS dominant_script,
  CAST(CASE WHEN tot = 0 THEN 0 ELSE ((tot - top_c) * 1000000) // tot END
       AS BIGINT) AS mixed_ppm
FROM g
"""


#: claimed language → the Unicode script its text should dominate in.
#: Shared constant between the engine map and the generated SQL CASE.
LANG_EXPECTED_SCRIPT = {
    "en": "Latin", "de": "Latin", "es": "Latin", "fr": "Latin",
    "pt": "Latin", "ru": "Cyrillic", "zh": "Han", "ar": "Arabic",
    "el": "Greek", "ko": "Hangul",
}


def _sql_script_lang_mismatch() -> str:
    from rio_cogeo_ray.stages.text import SCRIPT_CLASSES

    cnt = ", ".join(
        rf"CAST(len(regexp_extract_all(COALESCE(text, ''), '\p{{{s}}}')) AS BIGINT)"
        rf" AS n_{s.lower()}"
        for s in SCRIPT_CLASSES
    )
    cols = [f"n_{s.lower()}" for s in SCRIPT_CLASSES]
    greatest = "GREATEST(" + ", ".join(cols) + ")"
    dom = " ".join(
        f"WHEN {c} = top_c THEN '{s}'" for s, c in zip(SCRIPT_CLASSES, cols)
    )
    exp = " ".join(
        f"WHEN lang = '{l}' THEN '{s}'"
        for l, s in LANG_EXPECTED_SCRIPT.items()
    )
    return f"""
WITH s AS (SELECT doc_id, lang, {cnt} FROM documents),
g AS (SELECT doc_id, lang, {greatest} AS top_c, * EXCLUDE (doc_id, lang) FROM s),
d AS (SELECT doc_id, lang,
        CASE WHEN top_c = 0 THEN '' {dom} END AS dominant_script,
        CASE {exp} ELSE '' END AS expected_script
      FROM g)
SELECT doc_id, lang, expected_script, dominant_script
FROM d
WHERE expected_script <> '' AND dominant_script <> ''
  AND expected_script <> dominant_script
"""


def _sql_mutual_hosts() -> str:
    return r"""
WITH h AS (SELECT doc_id,
  '<html><body><a href="https://h' || (doc_id % 23 + 1) % 23
    || '.example.com/a">x</a><a href="https://h' || (doc_id % 23 + 22) % 23
    || '.example.com/b">y</a>'
    || CASE WHEN doc_id % 3 = 0
            THEN '<a href="https://h' || (2 * (doc_id % 23)) % 23
                 || '.example.com/t">z</a>'
            ELSE '' END
    || '</body></html>' AS html
  FROM documents),
p AS (SELECT doc_id, unnest(str_split(html, 'href="')[2:]) AS piece FROM h),
l AS (SELECT doc_id, str_split(piece, '"')[1] AS outlink
      FROM p WHERE contains(piece, '"')),
edges AS (SELECT 'h' || doc_id % 23 || '.example.com' AS src_host,
       COALESCE(regexp_extract(outlink, '^https?://([^/]+)', 1), '') AS dst_host,
       CAST(COUNT(*) AS BIGINT) AS n_links
      FROM l GROUP BY 1, 2),
c AS (SELECT CASE WHEN src_host < dst_host THEN src_host ELSE dst_host END AS host_a,
             CASE WHEN src_host < dst_host THEN dst_host ELSE src_host END AS host_b,
             SUM(CASE WHEN src_host < dst_host THEN n_links ELSE 0 END) AS ab,
             SUM(CASE WHEN src_host > dst_host THEN n_links ELSE 0 END) AS ba
      FROM edges WHERE src_host <> dst_host GROUP BY 1, 2)
SELECT host_a, host_b, CAST(ab AS BIGINT) AS n_ab, CAST(ba AS BIGINT) AS n_ba
FROM c WHERE ab > 0 AND ba > 0
"""


WEB_PREP_BAD_DENSITY = 5


KWIC_NEEDLE = "dup"


KWIC_CONTEXT = 30

