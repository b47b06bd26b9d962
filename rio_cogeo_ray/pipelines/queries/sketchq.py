"""Sketches and exact statistics: HLL, KMV, quantiles, correlation, NTILE.

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
from rio_cogeo_ray.pipelines.queries._common import BOTTOMK_K, K_ANON_BIN, K_ANON_K, SAMPLE_DEN, SAMPLE_NUM, STRATIFIED_K, WEIGHTED_K, _docs, _read


def q_k_anon_risk(sf_dir: str):
    """k-anonymity audit (the privacy complement of pii_scrub): every
    quasi-identifier combination (lang, source, length bin) carried by
    FEWER than k=5 docs — rows whose attribute combo could re-identify
    them. One partial→final count over the bounded combo domain, then
    a map-side threshold filter; raw docs never shuffle."""
    ds = _docs(sf_dir, ["lang", "source", "n_chars"])

    def _combo(t: pa.Table) -> pa.Table:
        nc = t["n_chars"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "lang": t["lang"].combine_chunks().cast(pa.string()),
                "source": t["source"].combine_chunks().cast(pa.string()),
                "len_bin": pa.array(nc // K_ANON_BIN, pa.int64()),
            }
        )

    counts = agg.partial_group_agg(
        ds.map_batches(_combo, batch_format="pyarrow"),
        keys=["lang", "source", "len_bin"],
        count_as="n",
        n_buckets=16,
    )
    return counts.map_batches(
        lambda t: t.filter(
            pc.less(t["n"].combine_chunks(), pa.scalar(K_ANON_K, pa.int64()))
        ),
        batch_format="pyarrow",
    )


SQL_K_ANON_RISK = f"""
SELECT lang, source, n_chars // {K_ANON_BIN} AS len_bin,
       CAST(COUNT(*) AS BIGINT) AS n
FROM documents GROUP BY 1, 2, 3 HAVING COUNT(*) < {K_ANON_K}
"""


def q_sample_hash(sf_dir: str):
    """Deterministic 5% Bernoulli sample by id hash — pure per-batch
    filter, zero shuffle; same knuth32 hash mirrored literally in SQL."""
    from rio_cogeo_ray.stages import sketch

    ds = _docs(sf_dir, ["doc_id", "lang", "n_chars"])
    return sketch.hash_sample(ds, "doc_id", SAMPLE_NUM, SAMPLE_DEN)


SQL_SAMPLE_HASH = (
    "SELECT doc_id, lang, n_chars FROM documents "
    f"WHERE ((doc_id * 2654435761) % 4294967296) % {SAMPLE_DEN} < {SAMPLE_NUM}"
)


def q_sample_bottomk(sf_dir: str):
    """Exactly-k uniform sample as an order statistic (bottom-k by
    hash): partial top-k per batch → tiny final sort+limit."""
    from rio_cogeo_ray.stages import sketch

    ds = _docs(sf_dir, ["doc_id", "lang"])
    out = sketch.bottomk_sample(ds, "doc_id", BOTTOMK_K)
    return out.map_batches(
        lambda t: t.select(["doc_id", "lang", "__h"]).rename_columns(
            ["doc_id", "lang", "h"]
        ),
        batch_format="pyarrow",
    )


SQL_SAMPLE_BOTTOMK = (
    "SELECT doc_id, lang, (doc_id * 2654435761) % 4294967296 AS h "
    f"FROM documents ORDER BY h, doc_id LIMIT {BOTTOMK_K}"
)


def q_hll_distinct(sf_dir: str):
    """HyperLogLog approximate COUNT(DISTINCT lang || text-prefix key):
    approximate ⇒ rows-only driver check; ±3σ accuracy pinned vs exact
    in pytest (test_ops.py)."""
    from rio_cogeo_ray.stages import sketch

    ds = _docs(sf_dir, ["doc_id", "text"])
    est = sketch.hll_count_distinct(ds, "text", p=12)
    return pa.table(
        {"column": pa.array(["text"]), "approx_distinct": pa.array([int(round(est))], pa.int64())}
    )


def q_hll_by_lang(sf_dir: str):
    """Grouped HLL: approximate distinct texts PER LANGUAGE with no
    exact-distinct shuffle (register blobs per (group, batch) merge in
    a bucketed groupby). Approximate ⇒ rows-only driver check; ±3σ
    per-group accuracy pinned in pytest (test_ops.py)."""
    from rio_cogeo_ray.stages import sketch

    ds = _docs(sf_dir, ["lang", "text"])
    return sketch.grouped_hll_distinct(ds, "lang", "text", p=12)


def q_sample_stratified(sf_dir: str):
    """Stratified sample: exactly K docs per lang, uniform without
    replacement via the per-stratum (knuth32(id), id) order statistic
    (sketch.py:stratified_sample) — SQL mirror is a ROW_NUMBER window."""
    from rio_cogeo_ray.stages import sketch

    ds = _docs(sf_dir, ["doc_id", "lang"])
    return sketch.stratified_sample(ds, "lang", "doc_id", STRATIFIED_K)


SQL_SAMPLE_STRATIFIED = (
    "SELECT doc_id, lang FROM ("
    "SELECT doc_id, lang, ROW_NUMBER() OVER (PARTITION BY lang "
    "ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS rn FROM documents"
    f") WHERE rn <= {STRATIFIED_K}"
)


def q_sample_weighted(sf_dir: str):
    """Weighted sample w/o replacement, k orders ∝ o_totalprice
    (stages/sketch.py:weighted_sample — Efraimidis–Spirakis A-ES with a
    deterministic SQL-mirrorable uniform)."""
    from rio_cogeo_ray.stages import sketch

    ds = _read(os.path.join(sf_dir, "orders.parquet"), ["o_orderkey", "o_totalprice"])
    picked = sketch.weighted_sample(ds, "o_orderkey", "o_totalprice", WEIGHTED_K)
    # the float key is selection-only: numpy and DuckDB LN() can differ
    # in the LAST ulp near u→1, which is harmless for ranking (key gaps
    # are ~1e11 ulps) but would fail the bit-exact value compare — so
    # both sides emit the selected (id, weight) rows without the key.
    return picked.map_batches(
        lambda t: t.select(["o_orderkey", "o_totalprice"]), batch_format="pyarrow"
    )


SQL_SAMPLE_WEIGHTED = (
    "WITH h AS (SELECT o_orderkey, o_totalprice, "
    "(((o_orderkey * 2654435761) % 4294967296) + 1) / 4294967296.0 AS u FROM orders) "
    "SELECT o_orderkey, o_totalprice FROM h "
    f"ORDER BY LN(u) / o_totalprice DESC, o_orderkey LIMIT {WEIGHTED_K}"
)


def q_join_sample_weighted(sf_dir: str):
    """Weighted sampling OVER A JOIN (PAPERS.md EDBT 2023 shape):
    A-ES k-sample of lineitem ⋈ orders rows ∝ l_extendedprice. The
    sample keys derive from the composite lineitem id map-side AFTER
    the join, so each joined batch forwards only its local top-k —
    the full join result is never collected or sorted globally."""
    from rio_cogeo_ray.stages import sketch

    li = _read(
        os.path.join(sf_dir, "lineitem.parquet"),
        ["l_orderkey", "l_linenumber", "l_extendedprice"],
    )
    orders = _read(
        os.path.join(sf_dir, "orders.parquet"), ["o_orderkey", "o_orderpriority"]
    ).map_batches(
        lambda t: t.rename_columns(["l_orderkey", "o_orderpriority"]),
        batch_format="pyarrow",
    )
    joined = join_mod.bucketed_hash_join(li, orders, on="l_orderkey", n_buckets=16)

    def _lkey(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].combine_chunks().to_numpy(zero_copy_only=False)
        ln = t["l_linenumber"].combine_chunks().to_numpy(zero_copy_only=False)
        return t.append_column(
            "lkey", pa.array(ok * np.int64(8) + ln, pa.int64())
        )

    keyed = joined.map_batches(_lkey, batch_format="pyarrow")
    picked = sketch.weighted_sample(keyed, "lkey", "l_extendedprice", WEIGHTED_K)
    return picked.map_batches(
        lambda t: t.select(["lkey", "l_extendedprice", "o_orderpriority"]),
        batch_format="pyarrow",
    )


SQL_JOIN_SAMPLE_WEIGHTED = (
    "WITH j AS (SELECT l_orderkey * 8 + l_linenumber AS lkey, l_extendedprice, "
    "o_orderpriority FROM lineitem JOIN orders ON l_orderkey = o_orderkey), "
    # HUGEINT: lkey amplifies the knuth32 multiplicand 8x (see
    # SQL_CORPUS_TO_SHARDS note)
    "h AS (SELECT lkey, l_extendedprice, o_orderpriority, "
    "(((CAST(lkey AS HUGEINT) * 2654435761) % 4294967296) + 1) / 4294967296.0 AS u FROM j) "
    "SELECT lkey, l_extendedprice, o_orderpriority FROM h "
    f"ORDER BY LN(u) / l_extendedprice DESC, lkey LIMIT {WEIGHTED_K}"
)


def q_token_mg(sf_dir: str):
    """Approximate heavy hitters (stages/sketch.py: misra_gries_topk)
    — the 100 TB scale path beside the exact token_topk: mergeable MG
    summaries (≤k rows per batch, shuffle-free tree merge). Rows-only
    (under-estimates are sketch-defined); the ±n/(k+1) guarantee is
    pinned by pytest."""
    import pyarrow.compute as pc

    from rio_cogeo_ray.stages import sketch

    ds = _docs(sf_dir, ["text"])

    def _toks(t: pa.Table) -> pa.Table:
        lists = pc.ascii_split_whitespace(t["text"].combine_chunks().cast(pa.string()))
        toks = lists.flatten()
        return pa.table({"token": toks.filter(pc.not_equal(toks, ""))})

    return sketch.misra_gries_topk(ds.map_batches(_toks, batch_format="pyarrow"), "token", k=32)


def q_token_cm(sf_dir: str):
    """Count-Min point-frequency estimates (stages/sketch.py:
    cm_sketch — Cormode & Muthukrishnan 2005), completing the
    mergeable-sketch family: per-batch count-matrix blobs sum through
    fan-in levels with NO key shuffle; the driver probes the exact
    top-50 tokens against the sketch. Over-estimate ⇒ rows-only; the
    est ≥ true guarantee and the 2n/w error bound are pinned in pytest
    (test_ops.py::test_cm_sketch_guarantees)."""
    from rio_cogeo_ray.stages import sketch

    ds = _docs(sf_dir, ["text"])
    tok = ds.map_batches(
        lambda t: text.token_value_counts(t), batch_format="pyarrow"
    )
    cm = sketch.cm_sketch(tok, col="token", weight_col="n")
    import ray as _ray

    topk = text.token_topk(_docs(sf_dir, ["text"]), k=50).materialize()
    blocks = [b for b in _ray.get(topk.to_arrow_refs()) if b.num_rows]
    probes = (
        pa.concat_tables(blocks)["token"].combine_chunks()
        if blocks
        else pa.array([], pa.string())  # empty corpus: nothing to probe
    )
    est = cm.estimate(probes)
    return pa.table(
        {
            "token": probes,
            "est_count": pa.array(est.astype(np.int64), pa.int64()),
        }
    )


def q_mad_filter(sf_dir: str):
    """Robust outlier gate: keep docs within 3 MADs of their
    language's median length (median absolute deviation — the
    outlier-resistant z-score). Two distributed exact-median passes
    (stages/sketch.py: grouped_quantile — one distinct-pair exchange
    each, thresholds bounded by #langs), both broadcast via ray.put;
    the corpus itself streams through ONE stateless filter map."""
    import ray as _ray

    from rio_cogeo_ray.stages import sketch as sketch_mod

    docs = _docs(sf_dir, ["doc_id", "lang", "n_chars"])

    def _qdict(ds_q, val_col):
        blocks = [b for b in _ray.get(ds_q.materialize().to_arrow_refs()) if b.num_rows]
        if not blocks:  # empty corpus: no per-lang medians
            return {}
        t = pa.concat_tables(blocks)
        return {l: int(v) for l, v in zip(t["lang"].to_pylist(), t["value"].to_pylist())}

    med = _qdict(
        sketch_mod.grouped_quantile(
            _docs(sf_dir, ["lang", "n_chars"]), "lang", "n_chars", (0.5,), scale=1
        ),
        "n_chars",
    )
    med_ref = _ray.put(med)

    def _dev(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table(
                {"lang": pa.array([], pa.string()), "dev": pa.array([], pa.int64())}
            )
        m = _ray.get(med_ref)
        langs = t["lang"].combine_chunks()
        x = t["n_chars"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        mv = np.array([m[l] for l in langs.to_pylist()], dtype=np.int64)
        return pa.table({"lang": langs, "dev": pa.array(np.abs(x - mv), pa.int64())})

    mad = _qdict(
        sketch_mod.grouped_quantile(
            _docs(sf_dir, ["lang", "n_chars"]).map_batches(_dev, batch_format="pyarrow"),
            "lang",
            "dev",
            (0.5,),
            scale=1,
        ),
        "dev",
    )
    mad_ref = _ray.put(mad)

    def _keep(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return t
        m, md = _ray.get(med_ref), _ray.get(mad_ref)
        langs = t["lang"].to_pylist()
        x = t["n_chars"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        mv = np.array([m[l] for l in langs], dtype=np.int64)
        dv = np.array([md[l] for l in langs], dtype=np.int64)
        return t.filter(pa.array(np.abs(x - mv) <= 3 * dv))

    return docs.map_batches(_keep, batch_format="pyarrow")


SQL_MAD_FILTER = """
WITH g AS (SELECT lang, n_chars AS qv, COUNT(*) AS cnt FROM documents GROUP BY lang, n_chars),
w AS (SELECT lang, qv, SUM(cnt) OVER (PARTITION BY lang ORDER BY qv) AS cum FROM g),
n AS (SELECT lang, COUNT(*) AS nn FROM documents GROUP BY lang),
med AS (SELECT w.lang, MIN(w.qv) AS m FROM w JOIN n ON w.lang = n.lang
        WHERE w.cum >= CAST(CEIL(0.5 * n.nn) AS BIGINT) GROUP BY w.lang),
dev AS (SELECT d.lang, ABS(d.n_chars - med.m) AS dv
        FROM documents d JOIN med ON d.lang = med.lang),
g2 AS (SELECT lang, dv, COUNT(*) AS cnt FROM dev GROUP BY lang, dv),
w2 AS (SELECT lang, dv, SUM(cnt) OVER (PARTITION BY lang ORDER BY dv) AS cum FROM g2),
mad AS (SELECT w2.lang, MIN(w2.dv) AS md FROM w2 JOIN n ON w2.lang = n.lang
        WHERE w2.cum >= CAST(CEIL(0.5 * n.nn) AS BIGINT) GROUP BY w2.lang)
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d
JOIN med ON d.lang = med.lang
JOIN mad ON d.lang = mad.lang
WHERE ABS(d.n_chars - med.m) <= 3 * mad.md
"""


def q_lang_moments(sf_dir: str):
    """Per-language doc-length moments as exact integer sums (n, Σx,
    Σx²) — the variance/stddev inputs, shipped as associative int64
    partials so results are bit-identical at any parallelism
    (consumers divide; float aggregation never enters the exchange).
    Overflow headroom: Σx² < 2^63 holds to ~10^12 docs of 10^4 chars
    — int128-summing buckets would be the next step beyond."""
    ds = _docs(sf_dir, ["doc_id", "lang", "n_chars"])

    def _sq(t: pa.Table) -> pa.Table:
        x = t["n_chars"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("len_sq", pa.array(x * x, pa.int64()))

    from rio_cogeo_ray.stages.agg import partial_group_agg

    return partial_group_agg(
        ds.map_batches(_sq, batch_format="pyarrow"),
        keys=["lang"],
        sum_cols=["n_chars", "len_sq"],
        count_as="n_docs",
    )


SQL_LANG_MOMENTS = """
SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars,
       CAST(SUM(n_chars * n_chars) AS BIGINT) AS sum_len_sq,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents GROUP BY lang
"""


def q_chi2_lang_source(sf_dir: str):
    """Chi-squared lang × source contingency audit (stages/sketch.py:
    contingency_chi2): the independence test behind "does the crawl
    source predict the language mix?" — exact integer micro-chi² per
    cell over the FULL domain grid, zero-observed cells included. One
    bounded count exchange; driver state = cells, Python-bignum exact."""
    from rio_cogeo_ray.stages import sketch

    ds = _docs(sf_dir, ["lang", "source"])
    return sketch.contingency_chi2(ds, "lang", "source")


SQL_CHI2_LANG_SOURCE = """
WITH c AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
           FROM documents GROUP BY 1, 2),
r AS (SELECT lang, SUM(o) AS rl FROM c GROUP BY 1),
s AS (SELECT source, SUM(o) AS cs FROM c GROUP BY 1),
n AS (SELECT SUM(o) AS nn FROM c),
grid AS (SELECT r.lang, s.source, COALESCE(c.o, 0) AS o, r.rl, s.cs, n.nn
         FROM r CROSS JOIN s CROSS JOIN n
         LEFT JOIN c ON c.lang IS NOT DISTINCT FROM r.lang
                    AND c.source IS NOT DISTINCT FROM s.source)
SELECT lang, source, CAST(o AS BIGINT) AS o,
       CAST(((CAST(o AS HUGEINT) * nn - rl * cs)
             * (CAST(o AS HUGEINT) * nn - rl * cs) * 1000000)
            // (nn * rl * cs) AS BIGINT) AS chi2_micro
FROM grid
"""


def q_lang_pearson(sf_dir: str):
    """Per-language Pearson correlation between doc length (n_chars)
    and whitespace token count — exact-integer bivariate statistics
    completing the moments/Spearman family (reference analog: the
    per-band statistics surface of cog_info, rio_cogeo/models.py).

    Sqrt-free exactness device: instead of r (whose sqrt denominator is
    irrational), report the SIGNED SQUARED correlation in ppm,
    ``corr2s_ppm = sign(num) * (1e6 * num²) // (dx * dy)`` with
    num = n·Σxy − Σx·Σy, dx = n·Σx² − (Σx)², dy = n·Σy² − (Σy)² — every
    operand an exact integer, mirrored in DuckDB HUGEINT (overflow
    bound: 1e6·num² < 1.7e38 holds to ~1e5 rows/group of 1e4-char docs;
    beyond that, per-group mean-centering in a first pass shrinks num).
    Constant columns (dx·dy = 0) yield NULL, like SQL. The six moment
    partials ship as associative int64 sums (partial_group_agg), so the
    corpus never shuffles raw rows and the finalize touches only one
    bounded row per language."""
    ds = _docs(sf_dir, ["lang", "n_chars", "text"])

    def _mo(t: pa.Table) -> pa.Table:
        x = t["n_chars"].combine_chunks().cast(pa.int64())
        y = text.token_count(t["text"].combine_chunks())
        return pa.table(
            {
                "lang": t["lang"].combine_chunks(),
                "x": x,
                "y": y,
                "xy": pc.multiply_checked(x, y),
                "x2": pc.multiply_checked(x, x),
                "y2": pc.multiply_checked(y, y),
            }
        )

    from rio_cogeo_ray.stages.agg import partial_group_agg

    agged = partial_group_agg(
        ds.map_batches(_mo, batch_format="pyarrow"),
        keys=["lang"],
        sum_cols=["x", "y", "xy", "x2", "y2"],
        count_as="n_docs",
    )

    def _fin(t: pa.Table) -> pa.Table:
        out_lang, out_n, out_c = [], [], []
        for r in t.to_pylist():  # bounded: one row per language
            n = r["n_docs"]
            sx, sy, sxy, sx2, sy2 = (
                r["sum_x"], r["sum_y"], r["sum_xy"], r["sum_x2"], r["sum_y2"]
            )
            out_lang.append(r["lang"])
            out_n.append(n)
            if None in (sx, sy, sxy, sx2, sy2):
                out_c.append(None)
                continue
            num = n * sxy - sx * sy
            dx = n * sx2 - sx * sx
            dy = n * sy2 - sy * sy
            if dx == 0 or dy == 0:
                out_c.append(None)
            else:
                q = (1_000_000 * num * num) // (dx * dy)
                out_c.append(q if num >= 0 else -q)
        return pa.table(
            {
                "lang": pa.array(out_lang, pa.string()),
                "n_docs": pa.array(out_n, pa.int64()),
                "corr2s_ppm": pa.array(out_c, pa.int64()),
            }
        )

    return agged.map_batches(_fin, batch_format="pyarrow")


def q_lang_regression(sf_dir: str):
    """Per-language OLS regression of token count on doc length —
    slope and intercept in exact integer ppm from the same six int64
    moment partials as lang_pearson (one associative exchange, no raw
    rows): slope_ppm = 1e6·num // dx, intercept_ppm =
    (1e6·(Σy·Σx² − Σx·Σxy)) // dx — both truncating toward zero,
    DuckDB's // semantics. The grouped-model primitive
    behind per-stratum calibration curves; degenerate groups (dx = 0)
    yield NULL like SQL."""
    ds = _docs(sf_dir, ["lang", "n_chars", "text"])

    def _mo(t: pa.Table) -> pa.Table:
        x = t["n_chars"].combine_chunks().cast(pa.int64())
        y = text.token_count(t["text"].combine_chunks())
        return pa.table(
            {
                "lang": t["lang"].combine_chunks(),
                "x": x,
                "y": y,
                "xy": pc.multiply_checked(x, y),
                "x2": pc.multiply_checked(x, x),
            }
        )

    from rio_cogeo_ray.stages.agg import partial_group_agg

    agged = partial_group_agg(
        ds.map_batches(_mo, batch_format="pyarrow"),
        keys=["lang"],
        sum_cols=["x", "y", "xy", "x2"],
        count_as="n_docs",
    )

    def _fin(t: pa.Table) -> pa.Table:
        out_lang, out_n, out_s, out_i = [], [], [], []
        for r in t.to_pylist():  # bounded: one row per language
            n = r["n_docs"]
            sx, sy, sxy, sx2 = r["sum_x"], r["sum_y"], r["sum_xy"], r["sum_x2"]
            out_lang.append(r["lang"])
            out_n.append(n)
            if None in (sx, sy, sxy, sx2) or n * sx2 - sx * sx == 0:
                out_s.append(None)
                out_i.append(None)
                continue
            dx = n * sx2 - sx * sx
            num = n * sxy - sx * sy
            inum = sy * sx2 - sx * sxy

            def _trunc_div(a: int, b: int) -> int:
                # DuckDB // truncates toward zero; Python // floors —
                # mirror DuckDB exactly (b > 0 here)
                q = abs(a) // b
                return -q if a < 0 else q

            out_s.append(_trunc_div(1_000_000 * num, dx))
            out_i.append(_trunc_div(1_000_000 * inum, dx))
        return pa.table(
            {
                "lang": pa.array(out_lang, pa.string()),
                "n_docs": pa.array(out_n, pa.int64()),
                "slope_ppm": pa.array(out_s, pa.int64()),
                "intercept_ppm": pa.array(out_i, pa.int64()),
            }
        )

    return agged.map_batches(_fin, batch_format="pyarrow")


SQL_LANG_REGRESSION = r"""
WITH t AS (SELECT lang, CAST(n_chars AS HUGEINT) AS x,
                  CAST(len(regexp_extract_all(text, '\S+')) AS HUGEINT) AS y
           FROM documents),
m AS (SELECT lang, CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy, SUM(x * x) AS sx2
      FROM t GROUP BY lang)
SELECT lang, CAST(n AS BIGINT) AS n_docs,
       CAST(CASE WHEN n * sx2 - sx * sx = 0 THEN NULL
            ELSE (1000000 * (n * sxy - sx * sy)) // (n * sx2 - sx * sx)
            END AS BIGINT) AS slope_ppm,
       CAST(CASE WHEN n * sx2 - sx * sx = 0 THEN NULL
            ELSE (1000000 * (sy * sx2 - sx * sxy)) // (n * sx2 - sx * sx)
            END AS BIGINT) AS intercept_ppm
FROM m
"""


SQL_LANG_PEARSON = r"""
WITH t AS (SELECT lang, CAST(n_chars AS HUGEINT) AS x,
                  CAST(len(regexp_extract_all(text, '\S+')) AS HUGEINT) AS y
           FROM documents),
m AS (SELECT lang, CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
             SUM(x * x) AS sx2, SUM(y * y) AS sy2
      FROM t GROUP BY lang)
SELECT lang, CAST(n AS BIGINT) AS n_docs,
       CAST(CASE WHEN (n * sx2 - sx * sx) = 0 OR (n * sy2 - sy * sy) = 0
                 THEN NULL
            ELSE (CASE WHEN n * sxy - sx * sy >= 0 THEN 1 ELSE -1 END)
                 * ((1000000 * (n * sxy - sx * sy) * (n * sxy - sx * sy))
                    // ((n * sx2 - sx * sx) * (n * sy2 - sy * sy)))
            END AS BIGINT) AS corr2s_ppm
FROM m
"""


def q_pctl_rank(sf_dir: str):
    """Per-language percentile rank of doc length in exact ppm
    (stages/sketch.py: percentile_rank — histogram-CDF broadcast, one
    distinct-pair shuffle, no global sort): the normalization step for
    'keep the top X% per language' corpus filters."""
    ds = _docs(sf_dir, ["doc_id", "lang", "n_chars"])
    from rio_cogeo_ray.stages import sketch as sketch_mod

    return sketch_mod.percentile_rank(ds, "lang", "n_chars", "doc_id")


SQL_PCTL_RANK = """
SELECT doc_id,
       CAST((COUNT(*) OVER (PARTITION BY lang ORDER BY n_chars) * 1000000)
            // COUNT(*) OVER (PARTITION BY lang) AS BIGINT) AS pctl_ppm
FROM documents
"""


def q_kmv_vocab_overlap(sf_dir: str):
    """Cross-corpus vocabulary overlap via KMV/theta sketches
    (stages/sketch.py: kmv_overlap): estimated distinct-token counts
    of the en and de slices plus their estimated COMMON vocabulary and
    Jaccard — the set-intersection estimate HLL cannot produce. Two
    zero-shuffle sketch passes; driver state O(k)."""
    import pyarrow.dataset as pads

    path = os.path.join(sf_dir, "documents.parquet")

    def _toks(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(
            pc.ascii_split_whitespace(t["text"].combine_chunks().cast(pa.string()))
        )
        flat = flat.filter(pc.greater(pc.utf8_length(flat), 0))
        return pa.table({"tok": flat})

    from rio_cogeo_ray.stages import sketch as sketch_mod

    a = rd.read_parquet(
        path, columns=["text"], filter=pads.field("lang") == "en"
    ).map_batches(_toks, batch_format="pyarrow")
    b = rd.read_parquet(
        path, columns=["text"], filter=pads.field("lang") == "de"
    ).map_batches(_toks, batch_format="pyarrow")
    return sketch_mod.kmv_overlap(a, b, "tok", k=1024)


def q_lang_spearman(sf_dir: str):
    """Per-language Spearman rank correlation between doc length and
    whitespace token count (stages/sketch.py:grouped_spearman).
    ROW_NUMBER-over-(value, doc_id) ranks — a deterministic unique
    tiebreak that makes the statistic permutation-exact and
    SQL-mirrorable; rho in integer ppm."""
    ds = _docs(sf_dir, ["doc_id", "lang", "n_chars", "text"])

    def _tok(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"].combine_chunks(),
                "lang": t["lang"].combine_chunks(),
                "n_chars": t["n_chars"].combine_chunks(),
                "tokens": text.token_count(t["text"].combine_chunks()),
            }
        )

    from rio_cogeo_ray.stages import sketch

    return sketch.grouped_spearman(
        ds.map_batches(_tok, batch_format="pyarrow"),
        group_col="lang",
        col_a="n_chars",
        col_b="tokens",
        id_col="doc_id",
    )


SQL_LANG_SPEARMAN = (
    r"WITH t AS (SELECT lang, doc_id, n_chars, "
    r"CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS tokens FROM documents), "
    "r AS (SELECT lang, "
    "ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS ra, "
    "ROW_NUMBER() OVER (PARTITION BY lang ORDER BY tokens, doc_id) AS rb FROM t) "
    "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n, "
    "CAST(SUM((ra - rb) * (ra - rb)) AS BIGINT) AS sum_d2, "
    "CAST(1000000 - (6000000 * SUM((ra - rb) * (ra - rb))) "
    "// (COUNT(*) * (COUNT(*) * COUNT(*) - 1)) AS BIGINT) AS rho_ppm "
    "FROM r GROUP BY lang HAVING COUNT(*) >= 2"
)

