"""Text quality / scoring / token-statistics queries over the documents table.

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
from rio_cogeo_ray.pipelines.queries._common import ENTROPY_MAXLEN, KEYNESS_K, KEYNESS_SMOOTH, LANG_BALANCE_CAP, LANG_CATEGORIES, LANG_EXPECTED_SCRIPT, LM_MIN_COUNT, NOVELTY_N, PIVOT_LANGS, RANKJOIN_K, RANKJOIN_T, SKIPGRAM_K, SKIPGRAM_MIN_N, SKIPGRAM_W, TOPK_PER_LANG, TOPK_TOKENS, _BADWORDS, _DOMAIN_SUFFIX_CHOICES, _PII_EMAIL, _PII_IPV4, _PII_PHONE, _bpe_merges, _docs, _read, _simgraph_edges, _sql_domain_rollup, _sql_gopher, _sql_gopher_repetition, _sql_script_lang_mismatch


def q_props_stats(sf_dir: str):
    """Semi-structured side-data aggregate (functions/jsonx.py): the
    flat-JSON ``props`` payload's integer field extracts in ONE RE2
    pass (no per-row json.loads), then the standard partial→final
    grouped aggregate. Oracle uses DuckDB's NATIVE ->> JSON operator,
    so the regex kernel is held to real JSON semantics."""
    from rio_cogeo_ray.functions import jsonx

    ev = _read(os.path.join(sf_dir, "events.parquet"), ["event_type", "props"])

    def _k(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "k": jsonx.extract_int(t["props"], "k"),
            }
        )

    return agg.partial_group_agg(
        ev.map_batches(_k, batch_format="pyarrow"),
        keys=["event_type"],
        sum_cols=["k"],
        min_cols=["k"],
        max_cols=["k"],
        count_as="n",
    )


SQL_PROPS_STATS = """
SELECT event_type,
       CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(props->>'$.k' AS BIGINT)) AS min_k,
       MAX(CAST(props->>'$.k' AS BIGINT)) AS max_k,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY event_type
"""


def q_bigram_lift(sf_dir: str):
    """Top collocations by exact integer lift (stages/text.py:
    bigram_lift): Zipf-collapsed bigram partials → bucketed merge →
    bounded top-k, then ONE more corpus pass gathers candidate unigram
    counts + corpus totals map-side against the broadcast candidate
    set — no vocab-wide unigram shuffle anywhere."""
    ds = _docs(sf_dir, ["text"])
    return text.bigram_lift(ds, k=30, min_n=3)


SQL_BIGRAM_LIFT = r"""
WITH w AS (SELECT regexp_extract_all(text, '\S+') AS l FROM documents),
bi AS (SELECT l[i] AS w1, l[i+1] AS w2
       FROM w, LATERAL (SELECT unnest(range(1, len(l))) AS i)
       WHERE len(l) >= 2),
bc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n
       FROM bi GROUP BY 1, 2 HAVING COUNT(*) >= 3),
tb AS (SELECT SUM(CASE WHEN len(l) > 0 THEN len(l) - 1 ELSE 0 END)::HUGEINT AS t_bi,
              SUM(len(l))::HUGEINT AS t_uni FROM w),
uc AS (SELECT unnest(l) AS tok FROM w),
u AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM uc GROUP BY 1),
top AS (SELECT w1, w2, n FROM bc ORDER BY n DESC, w1, w2 LIMIT 30)
SELECT top.w1, top.w2, top.n,
       CAST((top.n::HUGEINT * t_uni * t_uni * 1000000)
            // (t_bi * u1.n::HUGEINT * u2.n::HUGEINT) AS BIGINT) AS lift_ppm
FROM top, tb
JOIN u u1 ON u1.tok = top.w1
JOIN u u2 ON u2.tok = top.w2
ORDER BY lift_ppm DESC, w1, w2
"""


def q_lang_stats(sf_dir: str):
    """Grouped aggregate over lang (colormap/categorical channel analog)."""
    ds = _docs(sf_dir, ["lang", "n_chars", "doc_id"])
    return agg.partial_group_agg(
        ds, keys=["lang"], sum_cols=["n_chars"], min_cols=["doc_id"],
        max_cols=["doc_id"], count_as="n",
    )


SQL_LANG_STATS = (
    "SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars, "
    "MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id, "
    "CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang"
)


def q_lang_stats_jsonl(sf_dir: str):
    """Same aggregate as lang_stats, but ingested through the JSONL
    source path (sources/textio.py): the parquet table is exported to
    JSONL once per sf_dir (cached under /tmp), read back with
    read_documents(format='jsonl'), and must hash-match the parquet
    oracle — format-equivalence of the source layer."""
    import hashlib

    from rio_cogeo_ray.sources import textio

    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    tag = hashlib.sha256(f"{src}:{st.st_size}:{st.st_mtime_ns}".encode()).hexdigest()[:16]
    jdir = f"/tmp/rcr_jsonl/{tag}"
    done = jdir + ".done"  # marker OUTSIDE the dir (read_json scans it all)
    if not os.path.exists(done):
        import shutil

        shutil.rmtree(jdir, ignore_errors=True)
        textio.write_jsonl(
            _read(src, ["doc_id", "lang", "n_chars"]), jdir
        )
        with open(done, "w") as f:
            f.write("ok")
    ds = textio.read_documents(jdir, format="jsonl", columns=["lang", "n_chars", "doc_id"])
    return agg.partial_group_agg(
        ds, keys=["lang"], sum_cols=["n_chars"], min_cols=["doc_id"],
        max_cols=["doc_id"], count_as="n",
    )


def q_token_counts(sf_dir: str):
    """Per-doc whitespace token count (RE2 \\S+ both sides)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def _tok(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"].combine_chunks(),
                "tokens": text.token_count(t["text"].combine_chunks()),
            }
        )

    return ds.map_batches(_tok, batch_format="pyarrow")


SQL_TOKEN_COUNTS = (
    r"SELECT doc_id, CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS tokens "
    "FROM documents"
)


def q_quality(sf_dir: str):
    """Quality-score components (all integer counts, SQL-mirrored)."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    scored = ds.map_batches(
        text.QualityScore, batch_format="pyarrow", concurrency=2, batch_size=4096
    )
    return scored.map_batches(
        lambda t: t.select(
            ["doc_id", "n_chars_m", "tokens", "alpha_tokens", "stop_hits", "quality_ok"]
        ),
        batch_format="pyarrow",
    )


SQL_QUALITY = (
    r"SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_m, "
    r"CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS tokens, "
    r"CAST(len(regexp_extract_all(text, '\S+')) - "
    r"len(regexp_extract_all(text, '\S*[^\p{L}\s]\S*')) AS BIGINT) AS alpha_tokens, "
    r"CAST(len(regexp_extract_all(text, '\b(the|and|of|to|is|in|that|it|was|for)\b')) AS BIGINT) AS stop_hits, "
    r"(CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) >= 5 "
    r"AND 2 * length(text) >= 4 * len(regexp_extract_all(text, '\S+')) "
    r"AND 2 * length(text) <= 24 * len(regexp_extract_all(text, '\S+'))) AS quality_ok "
    "FROM documents"
)


def q_langid(sf_dir: str):
    """Heuristic language-ID over documents (script ranges + function
    words; rows-only driver check, accuracy pinned in pytest)."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    scored = ds.map_batches(text.LangId, batch_format="pyarrow", concurrency=2)
    return scored.map_batches(
        lambda t: t.select(["doc_id", "lang_pred"]), batch_format="pyarrow"
    )


def q_lang_categories(sf_dir: str, colormap=None):
    """Categorical channel via a broadcast colormap join. ``colormap``
    overrides the default lang→(category, color) table — the
    user-supplied-colormap hook (cogeo.py:99 analog); the SQL oracle
    mirrors the DEFAULT mapping only."""
    cat = join_mod.colormap_table(
        colormap if colormap is not None
        else {l: (i, c) for l, i, c in LANG_CATEGORIES}
    )
    ds = _docs(sf_dir, ["doc_id", "lang", "n_chars"])
    joined = join_mod.broadcast_join(ds, cat, on="lang", concurrency=2)
    return agg.partial_group_agg(
        joined, keys=["category", "color"], sum_cols=["n_chars"], count_as="n"
    )


SQL_LANG_CATEGORIES = (
    "SELECT CAST(c.category AS INTEGER) AS category, c.color, "
    "CAST(SUM(d.n_chars) AS BIGINT) AS sum_n_chars, CAST(COUNT(*) AS BIGINT) AS n "
    "FROM documents d JOIN (VALUES "
    + ", ".join(f"('{l}', {i}, '{col}')" for l, i, col in LANG_CATEGORIES)
    + ") AS c(lang, category, color) ON d.lang = c.lang "
    "GROUP BY c.category, c.color"
)


def q_distinct_langs(sf_dir: str):
    """DISTINCT as a degenerate grouped aggregate: per-batch unique →
    bucketed merge with no measures (set-op; shuffle carries one row
    per distinct value per batch)."""
    ds = _docs(sf_dir, ["lang"])
    out = agg.partial_group_agg(ds, keys=["lang"], count_as=None)
    return out.map_batches(lambda t: t.select(["lang"]), batch_format="pyarrow")


SQL_DISTINCT_LANGS = "SELECT DISTINCT lang FROM documents"


def q_token_topk(sf_dir: str):
    """Corpus heavy hitters: top-50 whitespace tokens by count.
    Per-batch value_counts partials collapse Zipfian mass before the
    shuffle; exact bucketed merge; deterministic (n desc, token) order."""
    ds = _docs(sf_dir, ["text"])
    return text.token_topk(ds, "text", k=TOPK_TOKENS)


SQL_TOKEN_TOPK = (
    r"SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM "
    r"(SELECT unnest(regexp_extract_all(text, '\S+')) AS token FROM documents) "
    f"GROUP BY token ORDER BY n DESC, token LIMIT {TOPK_TOKENS}"
)


def q_token_topk_lang(sf_dir: str):
    """Heavy hitters PER STRATUM: top-5 tokens within each lang
    (text.token_topk_per_group — partial counts collapse Zipf mass
    pre-shuffle, then bucketed per-group top-k). ROW_NUMBER mirror."""
    ds = _docs(sf_dir, ["lang", "text"])
    return text.token_topk_per_group(ds, "lang", "text", k=TOPK_PER_LANG)


SQL_TOKEN_TOPK_LANG = (
    "SELECT lang, token, n, rank FROM ("
    "SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS n, "
    "ROW_NUMBER() OVER (PARTITION BY lang ORDER BY COUNT(*) DESC, token) AS rank "
    "FROM (SELECT lang, unnest(regexp_extract_all(text, '\\S+')) AS token "
    "FROM documents) GROUP BY lang, token"
    f") WHERE rank <= {TOPK_PER_LANG}"
)


def q_pii_scrub(sf_dir: str):
    """PII redaction (stages/text.py:scrub_pii): deterministic synthetic
    PII (email / phone / IPv4 derived from doc_id) is injected into each
    document — mirrored literally in the SQL — then redacted by the
    RE2 kernel chain. Both engines run RE2, so counts and redacted text
    are bit-identical; the injection makes the oracle actually exercise
    every pattern (the synthetic corpus contains no organic PII)."""
    import pyarrow.compute as pc

    docs = _read(os.path.join(sf_dir, "documents.parquet"), ["doc_id", "text"])

    def _aug_and_scrub(t: pa.Table) -> pa.Table:
        did = t["doc_id"]
        if isinstance(did, pa.ChunkedArray):
            did = did.combine_chunks()
        s = pc.cast(did, pa.string())
        aug = pc.binary_join_element_wise(
            t["text"],
            " contact doc",
            s,
            "@mail.example tel +1 (555) 010-",
            pc.utf8_lpad(pc.cast(pc.bit_wise_and(did, 8191), pa.string()), 4, "0"),
            " ip 192.168.",
            pc.cast(pc.bit_wise_and(did, 255), pa.string()),
            ".",
            pc.cast(pc.bit_wise_and(did, 63), pa.string()),
            "",
        )
        out = pa.table({"doc_id": did, "text": aug})
        return text.scrub_pii(out).drop_columns(["text"])

    return docs.map_batches(_aug_and_scrub, batch_format="pyarrow")


SQL_PII_SCRUB = (
    "WITH aug AS (SELECT doc_id, text || ' contact doc' || CAST(doc_id AS VARCHAR) "
    "|| '@mail.example tel +1 (555) 010-' "
    "|| lpad(CAST((doc_id & 8191) AS VARCHAR), 4, '0') "
    "|| ' ip 192.168.' || CAST((doc_id & 255) AS VARCHAR) || '.' "
    "|| CAST((doc_id & 63) AS VARCHAR) AS t0 FROM documents), "
    f"s1 AS (SELECT doc_id, CAST(len(regexp_extract_all(t0, '{_PII_EMAIL}')) AS BIGINT) AS n_email, "
    f"regexp_replace(t0, '{_PII_EMAIL}', '<EMAIL>', 'g') AS t1 FROM aug), "
    f"s2 AS (SELECT doc_id, n_email, CAST(len(regexp_extract_all(t1, '{_PII_PHONE}')) AS BIGINT) AS n_phone, "
    f"regexp_replace(t1, '{_PII_PHONE}', '<PHONE>', 'g') AS t2 FROM s1) "
    f"SELECT doc_id, n_email, n_phone, CAST(len(regexp_extract_all(t2, '{_PII_IPV4}')) AS BIGINT) AS n_ipv4, "
    f"regexp_replace(t2, '{_PII_IPV4}', '<IPV4>', 'g') AS text_redacted FROM s2"
)


def q_domain_rollup(sf_dir: str):
    """Registrable-domain (eTLD+1) rollup (stages/text.py:
    registrable_domains — the Public Suffix List longest-match
    algorithm over an embedded PSL subset): deterministic synthetic
    hosts derived from doc_id mix subdomain depths 0-2, single- and
    multi-label public suffixes, and planted hosts that ARE a public
    suffix (doc_id % 97 == 0 → registrable domain ''). Per-domain
    distinct-host count + page count via the two-level
    partial→final aggregate (the host_stats COUNT(DISTINCT)
    pattern). The 3 last-k-label RE2 extracts and the suffix CASE are
    mirrored character-for-character in the SQL."""
    import pyarrow.compute as pc

    docs = _docs(sf_dir, ["doc_id"])
    sufx_choices = pa.array(list(_DOMAIN_SUFFIX_CHOICES), pa.string())

    def _synth_domains(t: pa.Table) -> pa.Table:
        did = t["doc_id"]
        if isinstance(did, pa.ChunkedArray):
            did = did.combine_chunks()
        d = did.to_numpy(zero_copy_only=False)
        h = d % 53
        sub = pa.array(["", "www.", "a.b."], pa.string()).take(pa.array(d % 3))
        sufx = sufx_choices.take(pa.array(h % 8))
        full = pc.binary_join_element_wise(
            sub, "site", pa.array(h.astype(str)), ".", sufx, ""
        )
        host = pc.if_else(pa.array(d % 97 == 0), sufx, full)
        out = text.registrable_domains(pa.table({"host": host}))
        return out.select(["domain", "host"])

    per_host = agg.partial_group_agg(
        docs.map_batches(_synth_domains, batch_format="pyarrow"),
        keys=["domain", "host"],
        count_as="pages",
    )
    per_domain = agg.partial_group_agg(
        per_host, keys=["domain"], sum_cols=["pages"], count_as="n_hosts"
    )
    return per_domain.map_batches(
        lambda t: pa.table(
            {
                "domain": t["domain"],
                "n_hosts": t["n_hosts"],
                "n_pages": t["sum_pages"],
            }
        ),
        batch_format="pyarrow",
    )


SQL_DOMAIN_ROLLUP = _sql_domain_rollup()


def q_badword_filter(sf_dir: str):
    """C4-style dirty-word document filter signal (stages/text.py:
    word_blocklist_counts — Raffel et al. 2020 §2.2): per-doc count of
    lowercased whitespace tokens in the blocklist, rows only for
    flagged docs. Pure map, zero shuffle; the word set rides the task
    closure. The blocklist here is a synthetic stand-in (the corpus
    has no profanity); the mechanism is list-content-independent."""
    docs = _docs(sf_dir, ["doc_id", "text"])
    return text.word_blocklist_counts(docs, _BADWORDS)


SQL_BADWORD_FILTER = (
    r"WITH tok AS (SELECT doc_id, "
    r"unnest(regexp_extract_all(text, '\S+')) AS tok FROM documents) "
    "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_blocked FROM tok "
    f"WHERE lower(tok) IN ({', '.join(repr(w) for w in _BADWORDS)}) "
    "GROUP BY doc_id"
)


def q_c4_clean(sf_dir: str):
    """C4 line-level cleaner (stages/text.py:c4_line_clean — Raffel et
    al. 2020 §2.2: terminal-punctuation lines only, ≥5 words per line,
    no 'javascript' lines, drop docs with <3 surviving lines). The
    corpus text is single-line, so a deterministic 5-line document is
    synthesized from character slices of each text — one passing '.',
    one too-short, one passing '?', one 'javascript.' (always
    dropped), one passing '!' — mirrored character-for-character in
    the SQL (ASCII corpus ⇒ utf8_slice_codeunits ≡ substring, the
    doc_chunks contract). Zero shuffle; output rows ∝ survivors."""
    docs = _docs(sf_dir, ["doc_id", "text"])

    def _mk(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        txt = pc.fill_null(txt.cast(pa.string()), "")
        s1 = pc.utf8_slice_codeunits(txt, 0, 40)
        s2 = pc.utf8_slice_codeunits(txt, 40, 80)
        s3 = pc.utf8_slice_codeunits(txt, 80, 120)
        s4 = pc.utf8_slice_codeunits(txt, 120, 165)
        l1 = pc.binary_join_element_wise(s1, ".", "")
        l3 = pc.binary_join_element_wise(s2, "?", "")
        l4 = pc.binary_join_element_wise(s3, " javascript.", "")
        l5 = pc.binary_join_element_wise(s4, "!", "")
        multi = pc.binary_join_element_wise(
            l1, pa.scalar("short"), l3, l4, l5, "\n"
        )
        return pa.table({"doc_id": t["doc_id"], "text": multi})

    return text.c4_line_clean(docs.map_batches(_mk, batch_format="pyarrow"))


SQL_C4_CLEAN = r"""
WITH m AS (SELECT doc_id,
    substring(COALESCE(text, ''), 1, 40) || '.' || chr(10) ||
    'short' || chr(10) ||
    substring(COALESCE(text, ''), 41, 40) || '?' || chr(10) ||
    substring(COALESCE(text, ''), 81, 40) || ' javascript.' || chr(10) ||
    substring(COALESCE(text, ''), 121, 45) || '!' AS text
  FROM documents),
l AS (SELECT doc_id,
    list_filter(string_split(text, chr(10)), x ->
        regexp_matches(x, '[.!?"]$')
        AND len(regexp_extract_all(x, '\S+')) >= 5
        AND NOT contains(lower(x), 'javascript')) AS keep
  FROM m)
SELECT doc_id, array_to_string(keep, chr(10)) AS text_clean,
       CAST(len(keep) AS BIGINT) AS n_kept
FROM l WHERE len(keep) >= 3
"""


def q_gopher_quality(sf_dir: str):
    """Full Gopher quality-rule battery (stages/text.py:gopher_rules —
    Rae et al. 2021 appendix A1.1): seven per-doc integer flags
    (word-count bounds, mean word length, symbol ratio, bullet /
    ellipsis line ratios, alpha-word fraction, distinct-stopword
    presence) + the AND. All rules are integer cross-multiplications,
    so every flag is hash-exact; pure map, zero shuffle."""
    docs = _docs(sf_dir, ["doc_id", "text"])
    return text.gopher_rules(docs)


SQL_GOPHER_QUALITY = _sql_gopher()


def q_gopher_repetition(sf_dir: str):
    """Gopher repetition-rule battery (stages/text.py:
    gopher_repetition — Rae et al. 2021 A1.1, the within-doc
    companion): duplicate line/paragraph occurrence + char fractions,
    top-2/3/4-gram char mass, repeated-5..10-gram char mass, all as
    integer cross-multiplication flags. Pure map, zero shuffle; nine
    rolling-hash gram passes per batch."""
    docs = _docs(sf_dir, ["doc_id", "text"])
    return text.gopher_repetition(docs)


SQL_GOPHER_REPETITION = _sql_gopher_repetition()


def q_repetition(sf_dir: str):
    """Per-doc token repetition stats (stages/text.py:repetition_stats
    — the Gopher-style duplicate-token quality signal)."""
    docs = _docs(sf_dir, ["doc_id", "text"])
    return docs.map_batches(
        lambda t: text.repetition_stats(t).drop_columns(["text"]),
        batch_format="pyarrow",
    )


SQL_REPETITION = (
    r"SELECT doc_id, CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens, "
    r"CAST(len(list_distinct(regexp_extract_all(text, '\S+'))) AS BIGINT) AS n_distinct "
    "FROM documents"
)


def q_tfidf_top(sf_dir: str):
    """Top-3 distinctive terms per doc by tf·idf (stages/text.py:
    tfidf_topk — the inverted-index pipeline). Ranking is over the
    ppm-quantized integer score in BOTH engines, so order (incl. the
    token tie-break) is bit-identical; ln() agrees to the last ulp
    (same libm doctrine as the mercator mirror)."""
    path = os.path.join(sf_dir, "documents.parquet")
    n_docs = pq.read_metadata(path).num_rows
    ds = _read(path, ["doc_id", "text"])
    return text.tfidf_topk(ds, n_docs, k=3)


SQL_TFIDF_TOP = (
    r"WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS token FROM documents), "
    "tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY doc_id, token), "
    "df AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token), "
    "n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nn FROM documents), "
    "s AS (SELECT tf.doc_id, tf.token, "
    "CAST(FLOOR(CAST(tf.tf AS DOUBLE) * LN(n.nn / CAST(df.df AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS score_ppm "
    "FROM tf JOIN df USING (token), n), "
    "r AS (SELECT doc_id, token, score_ppm, "
    "ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score_ppm DESC, token) AS rk FROM s) "
    "SELECT doc_id, token, score_ppm, CAST(rk AS BIGINT) AS rank FROM r WHERE rk <= 3"
)


def q_lang_pivot(sf_dir: str):
    """Crosstab (stages/agg.py: pivot_counts): one row per source,
    one int64 count column per language (+ other). The wide schema is
    fixed up front (caller-supplied domain), so the reshape is a plain
    partial→final aggregate over one-hot counts — one partial row per
    (source, batch) through the shuffle. SQL mirror: the explicit
    SUM(CASE WHEN ...) list."""
    ds = _docs(sf_dir, ["source", "lang"])
    return agg.pivot_counts(ds, row_key="source", col_key="lang", col_values=PIVOT_LANGS)


SQL_LANG_PIVOT = (
    "SELECT source, "
    + ", ".join(
        f"CAST(SUM(CASE WHEN lang = '{v}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{v}"
        for v in PIVOT_LANGS
    )
    + ", CAST(SUM(CASE WHEN lang NOT IN ("
    + ", ".join(f"'{v}'" for v in PIVOT_LANGS)
    + ") OR lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_other "
    "FROM documents GROUP BY source"
)


def q_running_total(sf_dir: str):
    """Per-user running cumulative spend (stages/window.py:
    running_total) — the analytic-window operator: SUM() OVER
    (PARTITION BY user ORDER BY ts, id). One bucket sort + one global
    cumsum minus per-key segment offsets computes every user's series
    vectorized."""
    ds = _read(
        os.path.join(sf_dir, "events.parquet"),
        ["user_id", "ts", "event_id", "value"],
    )
    out = window.running_total(ds, "user_id", "ts", "event_id", "value", scale=100)
    return out.map_batches(
        lambda t: t.select(["user_id", "ts", "event_id", "running"]),
        batch_format="pyarrow",
    )


SQL_RUNNING_TOTAL = (
    "SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS ts, event_id, "
    "CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) OVER ("
    "PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running "
    "FROM events"
)


def q_bpe_tokens(sf_dir: str):
    """Trainable-BPE token counts per document (Sennrich et al. 2016,
    subword units): merges learned from THIS corpus's word-frequency
    table, encode as an actor-pool stage with per-actor word cache.
    Iterative merge learning is not SQL-expressible ⇒ rows-only;
    exactness pinned vs a naive reimplementation in
    tests/test_tokenizer.py."""
    from rio_cogeo_ray.stages import tokenizer

    merges = _bpe_merges(sf_dir)
    return tokenizer.bpe_token_counts(_docs(sf_dir, ["doc_id", "text"]), merges)


def q_bpe_pack(sf_dir: str):
    """Tokenizer-aware sequence packing: BPE token counts (actor-pool
    encode) → per-lang greedy packing into 1024-token training
    sequences (text.pack_counted). Rows-only (BPE upstream)."""
    from rio_cogeo_ray.stages import tokenizer

    merges = _bpe_merges(sf_dir)
    counted = tokenizer.bpe_token_counts(
        _docs(sf_dir, ["doc_id", "lang", "text"]), merges, keep_cols=("lang",)
    )
    return text.pack_counted(
        counted, 1024, group_col="lang", order_col="doc_id",
        count_col="n_bpe_tokens",
    )


def q_quality_filter_pct(sf_dir: str):
    """Per-group quantile-threshold filter — the 'keep docs above their
    language's median length' corpus gate: thresholds computed
    DISTRIBUTED (stages/sketch.py: grouped_quantile, exact integer
    order statistic), collected (one row per lang — bounded), broadcast
    via ray.put, and applied map-side with zero extra shuffle of the
    corpus."""
    import ray as _ray

    from rio_cogeo_ray.stages import sketch

    docs = _docs(sf_dir, ["doc_id", "lang", "n_chars"])
    thr_ds = sketch.grouped_quantile(
        _docs(sf_dir, ["lang", "n_chars"]), "lang", "n_chars", (0.5,), scale=1
    ).materialize()
    thr_blocks = [b for b in _ray.get(thr_ds.to_arrow_refs()) if b.num_rows]
    if thr_blocks:
        thr_tbl = pa.concat_tables(thr_blocks)
        langs = thr_tbl["lang"].to_pylist()
        vals = thr_tbl["value"].to_pylist()
    else:  # empty corpus: no per-lang thresholds, filter passes nothing
        langs, vals = [], []
    thr_ref = _ray.put({l: int(v) for l, v in zip(langs, vals)})

    def _filter(t: pa.Table) -> pa.Table:
        if not len(t):
            return t
        thr = _ray.get(thr_ref)
        # vectorized lookup: dictionary-encode lang (distinct values per
        # batch are few), map the SMALL dictionary through the threshold
        # dict once, then one numpy gather + compare over all rows
        lang = t["lang"].combine_chunks().dictionary_encode()
        # sentinel slot 0-threshold for NULL lang (null dictionary index)
        tvals = np.array(
            [thr.get(v, 0) for v in lang.dictionary.to_pylist()] + [0],
            dtype=np.int64,
        )
        idx = (
            pc.fill_null(lang.indices, len(tvals) - 1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        nc = t["n_chars"].combine_chunks().to_numpy(zero_copy_only=False)
        return t.filter(pa.array(nc >= tvals[idx]))

    return docs.map_batches(_filter, batch_format="pyarrow")


SQL_QUALITY_FILTER_PCT = """
WITH g AS (SELECT lang, n_chars AS qv, COUNT(*) AS cnt FROM documents GROUP BY lang, n_chars),
w AS (SELECT lang, qv, SUM(cnt) OVER (PARTITION BY lang ORDER BY qv) AS cum FROM g),
n AS (SELECT lang, COUNT(*) AS nn FROM documents GROUP BY lang),
thr AS (SELECT w.lang, MIN(w.qv) AS t FROM w JOIN n ON w.lang = n.lang
        WHERE w.cum >= CAST(CEIL(0.5 * n.nn) AS BIGINT) GROUP BY w.lang)
SELECT d.doc_id, d.lang, d.n_chars FROM documents d JOIN thr ON d.lang = thr.lang
WHERE d.n_chars >= thr.t
"""


def q_lang_source_join(sf_dir: str):
    """Composite-key bucketed join (stages/join.py: bucketed_hash_join
    with on=[lang, source]): every doc annotated with its (lang,
    source) stratum size — the partial→final aggregate joins back to
    the corpus through ONE hash-chained composite-bucket exchange."""
    from rio_cogeo_ray.stages.agg import partial_group_agg

    docs = _docs(sf_dir, ["doc_id", "lang", "source"])
    sizes = partial_group_agg(
        _docs(sf_dir, ["lang", "source"]), keys=["lang", "source"],
        sum_cols=[], count_as="group_n",
    )
    return join_mod.bucketed_hash_join(
        docs, sizes, on=["lang", "source"], how="inner"
    )


SQL_LANG_SOURCE_JOIN = """
SELECT d.lang, d.source, d.doc_id, g.group_n FROM documents d
JOIN (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS group_n
      FROM documents GROUP BY lang, source) g
ON d.lang = g.lang AND d.source = g.source
"""


def q_ranking_simjoin(sf_dir: str):
    """Similarity join over top-k rankings (stages/dedup.py:
    ranking_overlap_join — PAPERS.md EDBT 2020): each doc's top-5
    tokens (by in-doc frequency, token tie-break) joined pairwise on
    set overlap ≥ 4. Exact two-shuffle sum path; hot-item caveat and
    the prefix-filter scale variant documented at the operator."""
    return _simgraph_edges(sf_dir, RANKJOIN_T)


SQL_RANKING_SIMJOIN = rf"""
WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok FROM documents),
cnt AS (SELECT doc_id, tok, COUNT(*) AS n FROM toks GROUP BY doc_id, tok),
rk AS (SELECT doc_id, tok, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY n DESC, tok) AS r FROM cnt),
top AS (SELECT doc_id, tok FROM rk WHERE r <= {RANKJOIN_K}),
pairs AS (SELECT a.doc_id AS ua, b.doc_id AS ub, COUNT(*) AS ov
          FROM top a JOIN top b ON a.tok = b.tok AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id)
SELECT ua, ub, CAST(ov AS BIGINT) AS overlap FROM pairs WHERE ov >= {RANKJOIN_T}
"""


def q_char_entropy(sf_dir: str):
    """Per-doc character-distribution entropy in integer floor-bits
    (stages/text.py: char_entropy — the Gopher gibberish signal):
    histogram is per-doc ⇒ pure map, zero shuffle. Integer-exact
    (≡ SQL LENGTH(bin(n // cnt)) - 1), so hash-exact anywhere."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    return text.char_entropy(ds)


SQL_CHAR_ENTROPY = f"""
WITH ch AS (SELECT doc_id, substring(text, g, 1) AS c
            FROM documents CROSS JOIN generate_series(1, {ENTROPY_MAXLEN}) gs(g)
            WHERE g <= LENGTH(text)),
cnt AS (SELECT doc_id, c, CAST(COUNT(*) AS BIGINT) AS n FROM ch GROUP BY doc_id, c),
tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nn FROM ch GROUP BY doc_id)
SELECT cnt.doc_id,
       CAST(SUM(cnt.n * (LENGTH(bin(tot.nn // cnt.n)) - 1)) AS BIGINT) AS entropy_bits,
       MIN(tot.nn) AS n_chars_tot
FROM cnt JOIN tot ON cnt.doc_id = tot.doc_id
GROUP BY cnt.doc_id
"""


def q_surprisal(sf_dir: str):
    """Unigram surprisal quality scoring (stages/text.py:
    surprisal_score — the CCNet perplexity-filter analog): each token
    occurrence contributes floor(log2(N // cf(token))) bits; docs
    return (surprisal_bits, n_tokens). Integer-exact (frexp exponent ≡
    SQL LENGTH(bin(x))-1), so it lands hash-exact at any parallelism."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    return text.surprisal_score(ds)


SQL_SURPRISAL = r"""
WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok
             FROM documents),
cf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY tok),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tok)
SELECT t.doc_id,
       CAST(SUM(LENGTH(bin((SELECT n FROM tot) // c.c)) - 1) AS BIGINT)
         AS surprisal_bits,
       CAST(COUNT(*) AS BIGINT) AS n_tokens
FROM tok t JOIN cf c ON t.tok = c.tok
GROUP BY t.doc_id
"""


def q_ccnet_buckets(sf_dir: str):
    """CCNet-style per-language perplexity bucketing (stages/text.py:
    ccnet_buckets — Wenzek et al. 2020): integer millibits/token
    surprisal scores, exact per-lang 1/3 and 2/3 order-statistic
    thresholds, docs labeled head/middle/tail; output is the audit
    table (lang, bucket, n_docs, total_tokens). Every step is
    integer-exact (the surprisal + grouped_quantile contracts), so it
    lands hash-exact at any parallelism. NULL lang coalesces to ''
    on both sides."""
    ds = _docs(sf_dir, ["doc_id", "text", "lang"])
    return text.ccnet_buckets(ds)


SQL_CCNET_BUCKETS = r"""
WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok
             FROM documents),
cf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY tok),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tok),
bits AS (SELECT t.doc_id,
                CAST(SUM(LENGTH(bin((SELECT n FROM tot) // c.c)) - 1) AS BIGINT)
                  AS b,
                CAST(COUNT(*) AS BIGINT) AS ntok
         FROM tok t JOIN cf c ON t.tok = c.tok GROUP BY t.doc_id),
score AS (SELECT COALESCE(d.lang, '') AS lang, b.doc_id,
                 (1000 * b.b) // b.ntok AS s, b.ntok
          FROM bits b JOIN documents d ON b.doc_id = d.doc_id),
ranked AS (SELECT lang, s,
                  ROW_NUMBER() OVER (PARTITION BY lang ORDER BY s) AS rn,
                  COUNT(*) OVER (PARTITION BY lang) AS n
           FROM score),
thr AS (SELECT lang,
               MAX(CASE WHEN rn = CAST(CEIL(n / 3.0) AS BIGINT) THEN s END)
                 AS t33,
               MAX(CASE WHEN rn = CAST(CEIL(2 * n / 3.0) AS BIGINT) THEN s END)
                 AS t67
        FROM ranked GROUP BY lang)
SELECT sc.lang,
       CASE WHEN sc.s <= th.t33 THEN 'head'
            WHEN sc.s <= th.t67 THEN 'middle'
            ELSE 'tail' END AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(sc.ntok) AS BIGINT) AS total_tokens
FROM score sc JOIN thr th ON sc.lang = th.lang
GROUP BY 1, 2
"""


def q_dsir(sf_dir: str):
    """DSIR importance-weight scoring (stages/text.py:dsir_score — Xie
    et al. 2023 data-selection recipe): every document scored by
    log(p_target / p_raw) under Laplace-1-smoothed hashed-unigram
    models, target = the English slice of the corpus, raw = the whole
    corpus. Integer floor-log2 bits (≡ SQL LENGTH(bin(x))-1) keep it
    hash-exact at any parallelism."""
    ds = _docs(sf_dir, ["doc_id", "text", "lang"])

    def _mask(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "text": t["text"],
                "is_en": pc.equal(t["lang"], "en"),
            }
        )

    # fused path: target = mask-true subset ⇒ one tokenize pass and
    # ONE vocab shuffle count both models (text.py:_hash_vocab_counts_dual)
    return text.dsir_score(
        ds.map_batches(_mask, batch_format="pyarrow"),
        target_mask_col="is_en",
    )


SQL_DSIR = r"""
WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok
             FROM documents),
ttok AS (SELECT t.tok FROM tok t JOIN documents d USING (doc_id)
         WHERE d.lang = 'en'),
cfr AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY tok),
cft AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM ttok GROUP BY tok),
-- target slice is a subset of the raw corpus, so the union vocab IS cfr
s AS (SELECT CAST((SELECT COUNT(*) FROM cfr) AS BIGINT) AS v,
             CAST(COALESCE((SELECT SUM(c) FROM cfr), 0) AS BIGINT) AS nr,
             CAST(COALESCE((SELECT SUM(c) FROM cft), 0) AS BIGINT) AS nt)
SELECT t.doc_id,
       CAST(SUM((LENGTH(bin((s.nr + s.v) // (r.c + 1))) - 1)
              - (LENGTH(bin((s.nt + s.v) // (COALESCE(tg.c, 0) + 1))) - 1))
            AS BIGINT) AS dsir_bits,
       CAST(COUNT(*) AS BIGINT) AS n_tokens
FROM tok t
JOIN cfr r ON t.tok = r.tok
LEFT JOIN cft tg ON t.tok = tg.tok
CROSS JOIN s
GROUP BY t.doc_id
"""


def q_lang_balance(sf_dir: str):
    """Balanced per-language downsampling (corpus balancing for
    multilingual training mixes): keep at most CAP docs per lang,
    chosen by the deterministic knuth32(doc_id) pseudo-random order
    (doc_id tie-break) so the subsample is unbiased, reproducible, and
    identical at any parallelism. Same associative top-k machinery as
    host_cap — each batch forwards ≤CAP candidates per lang, the raw
    corpus never shuffles."""
    from rio_cogeo_ray.stages.agg import top_rows_by
    from rio_cogeo_ray.stages.sketch import knuth32

    ds = _docs(sf_dir, ["doc_id", "lang", "n_chars"])

    def _h(t: pa.Table) -> pa.Table:
        d = (
            t["doc_id"].combine_chunks().cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        return t.append_column(
            "h", pa.array(knuth32(d).astype(np.int64), pa.int64())
        )

    capped = top_rows_by(
        ds.map_batches(_h, batch_format="pyarrow"),
        keys=["lang"],
        order_by=[("h", "ascending"), ("doc_id", "ascending")],
        k=LANG_BALANCE_CAP,
    )
    return capped.map_batches(
        lambda t: t.select(["lang", "doc_id", "n_chars"]),
        batch_format="pyarrow",
    )


SQL_LANG_BALANCE = f"""
WITH d AS (SELECT lang, doc_id, n_chars,
           (doc_id * 2654435761) % 4294967296 AS h FROM documents),
r AS (SELECT lang, doc_id, n_chars,
      ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn FROM d)
SELECT lang, doc_id, n_chars FROM r WHERE rn <= {LANG_BALANCE_CAP}
"""


def q_normalize(sf_dir: str):
    """Corpus text normalization (stages/text.py: normalize_text):
    lowercase + whitespace collapse + trim — the pre-hash/pre-shingle
    canonicalization pass, stateless Arrow kernels only."""
    import pyarrow.compute as pc

    ds = _docs(sf_dir, ["doc_id", "text"])
    out = ds.map_batches(
        lambda t: text.normalize_text(t), batch_format="pyarrow"
    )

    def _proj(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        norm = t["text_norm"].combine_chunks()
        return pa.table(
            {
                "doc_id": t["doc_id"].combine_chunks(),
                "text_norm": norm,
                "n_chars_norm": _pc.utf8_length(norm).cast(pa.int64()),
            }
        )

    return out.map_batches(_proj, batch_format="pyarrow")


SQL_NORMALIZE = r"""
SELECT doc_id,
       trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS text_norm,
       CAST(length(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS BIGINT) AS n_chars_norm
FROM documents
"""


def q_skipgram_pairs(sf_dir: str):
    """Top-k windowed co-occurrence counts (stages/text.py:
    skipgram_topk — the word2vec/PMI skip-gram input, window=3):
    per-batch Zipf-collapsed pair partials → one bucketed exact merge
    → associative local top-k → bounded driver sort. Deterministic
    (n desc, w1, w2) order, exact integer counts."""
    ds = _docs(sf_dir, ["text"])
    return text.skipgram_topk(
        ds, window=SKIPGRAM_W, k=SKIPGRAM_K, min_n=SKIPGRAM_MIN_N
    )


SQL_SKIPGRAM_PAIRS = rf"""
WITH tk AS (SELECT regexp_extract_all(text, '\S+') AS toks FROM documents),
e AS (SELECT toks, unnest(range(1, len(toks) + 1)) AS i FROM tk),
p AS (SELECT toks, i,
             unnest(range(i + 1, LEAST(i + {SKIPGRAM_W}, len(toks)) + 1)) AS j
      FROM e)
SELECT toks[i] AS w1, toks[j] AS w2, CAST(COUNT(*) AS BIGINT) AS n
FROM p GROUP BY 1, 2
HAVING COUNT(*) >= {SKIPGRAM_MIN_N}
ORDER BY n DESC, w1, w2 LIMIT {SKIPGRAM_K}
"""


def q_lang_keyness(sf_dir: str):
    """Per-language distinctive terms (stages/text.py: lang_keyness):
    integer keyness ratio — token rate in the language vs rate in the
    REST of the corpus, smoothed, in ppm — top-15 per lang. One corpus
    pass builds the (lang, w) table; totals reduce from that bounded
    table and broadcast; the cut is the associative per-lang top-k."""
    ds = _docs(sf_dir, ["text", "lang"])
    return text.lang_keyness(ds, k=KEYNESS_K, smoothing=KEYNESS_SMOOTH)


SQL_LANG_KEYNESS = rf"""
WITH tok AS (SELECT lang, unnest(regexp_extract_all(text, '\S+')) AS w
             FROM documents),
lt AS (SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY 1, 2),
l AS (SELECT lang, SUM(n) AS tl FROM lt GROUP BY 1),
tt AS (SELECT w, SUM(n) AS nt FROM lt GROUP BY 1),
tot AS (SELECT SUM(n) AS t FROM lt),
s AS (SELECT lt.lang, lt.w, lt.n,
        CAST((CAST(lt.n AS HUGEINT) * (tot.t - l.tl) * 1000000)
             // (CAST(tt.nt - lt.n + {KEYNESS_SMOOTH} AS HUGEINT) * l.tl)
             AS BIGINT) AS keyness_ppm
      FROM lt CROSS JOIN tot
      JOIN l ON lt.lang IS NOT DISTINCT FROM l.lang
      JOIN tt USING (w)),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
          ORDER BY keyness_ppm DESC, w) AS rk FROM s)
SELECT lang, w, n, keyness_ppm FROM r WHERE rk <= {KEYNESS_K}
"""


def q_doc_novelty(sf_dir: str):
    """First-occurrence novelty audit (stages/text.py: doc_novelty):
    per doc, the ppm fraction of its distinct word 3-grams whose first
    owner (min doc_id corpus-wide) is the doc itself — syndicated /
    boilerplate-heavy pages score low. Two linear shuffles (gram-hash
    buckets emit novel+total partials in ONE pass, then a doc-keyed
    sum); text never shuffles."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    return text.doc_novelty(ds, n=NOVELTY_N)


SQL_DOC_NOVELTY = rf"""
WITH tk AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
            FROM documents),
e AS (SELECT doc_id, toks,
             unnest(range(1, len(toks) - {NOVELTY_N} + 2)) AS i
      FROM tk WHERE len(toks) >= {NOVELTY_N}),
g AS (SELECT DISTINCT doc_id,
             toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS gram
      FROM e),
own AS (SELECT gram, MIN(doc_id) AS doc_id FROM g GROUP BY 1),
novel AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS novel
          FROM own GROUP BY 1),
tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams FROM g GROUP BY 1)
SELECT t.doc_id, COALESCE(v.novel, 0) AS novel, t.n_grams,
       CAST(COALESCE(v.novel, 0) * 1000000 // t.n_grams AS BIGINT)
         AS novelty_ppm
FROM tot t LEFT JOIN novel v ON v.doc_id = t.doc_id
"""


def q_source_text_overlap(sf_dir: str):
    """Cross-source duplicate-content audit: the exact Jaccard matrix
    of DISTINCT DOC TEXTS between crawl sources — which feeds are
    re-syndicating the same pages (the dedup-planning view: a high
    overlap pair means one source is nearly redundant). Reuses
    vocab_jaccard's bitmask-histogram machinery by collapsing each doc
    to ONE token — its 128-bit text hash rendered as a hex word (the
    repo hash-identity contract; SQL compares raw texts directly). The
    fixture corpus has no cross-source duplicates, so every 7th doc is
    REWRITTEN to one of three boilerplate pages in both engines (the
    planted-synthesis doctrine) — syndicated templates recurring across
    feeds."""
    ds = _docs(sf_dir, ["doc_id", "source", "text"])

    def _hash_tok(t: pa.Table) -> pa.Table:
        import polars as pl

        from rio_cogeo_ray.functions.hashing import splitmix64

        d = t["doc_id"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        txt = pc.fill_null(t["text"].combine_chunks().cast(pa.string()), "")
        boiler = pc.binary_join_element_wise(
            pa.scalar("boilerplate page "),
            pc.cast(pa.array(d % 3, pa.int64()), pa.string()),
            "",
        )
        txt = pc.if_else(pa.array(d % 7 == 0), boiler, txt)
        h1 = pl.from_arrow(txt.cast(pa.large_string())).hash(seed=101).to_numpy().astype(np.uint64)
        h2 = splitmix64(h1 ^ np.uint64(0xD1B54A32D192ED03))
        tok = pc.binary_join_element_wise(
            pc.cast(pa.array(h1.astype(np.int64), pa.int64()), pa.string()),
            pc.cast(pa.array(h2.astype(np.int64), pa.int64()), pa.string()),
            "_",
        )
        return pa.table(
            {
                "lang": t["source"].combine_chunks().cast(pa.string()),
                "text": tok,
            }
        )

    out = text.vocab_jaccard(
        ds.map_batches(_hash_tok, batch_format="pyarrow"), max_groups=32
    )
    return out.rename_columns(["source_a", "source_b", "inter", "jaccard_ppm"])


SQL_SOURCE_TEXT_OVERLAP = """
WITH d0 AS (SELECT source,
                   CASE WHEN doc_id % 7 = 0
                        THEN 'boilerplate page ' || doc_id % 3
                        ELSE COALESCE(text, '') END AS text
            FROM documents),
d AS (SELECT DISTINCT source, text FROM d0 WHERE source IS NOT NULL),
c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS nv FROM d GROUP BY 1),
i AS (SELECT a.source AS source_a, b.source AS source_b,
             CAST(COUNT(*) AS BIGINT) AS inter
      FROM d a JOIN d b USING (text) WHERE a.source < b.source GROUP BY 1, 2)
SELECT source_a, source_b, inter,
       CAST((inter * 1000000) // (ca.nv + cb.nv - inter) AS BIGINT)
         AS jaccard_ppm
FROM i JOIN c ca ON ca.source = i.source_a JOIN c cb ON cb.source = i.source_b
"""


def q_ttr(sf_dir: str):
    """Per-doc type-token ratio (stages/text.py: type_token_ratio —
    lexical diversity in exact ppm; template spam scores low). Pure
    map, zero shuffle; token distinctness under the repo's 2×64-bit
    hash contract."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(text.type_token_ratio, batch_format="pyarrow")


SQL_TTR = r"""
WITH tk AS (SELECT doc_id, regexp_extract_all(COALESCE(text, ''), '\S+') AS toks
            FROM documents)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS BIGINT) AS n_types,
       CAST(CASE WHEN len(toks) = 0 THEN NULL
            ELSE len(list_distinct(toks)) * 1000000 // len(toks)
            END AS BIGINT) AS ttr_ppm
FROM tk
"""


def q_vocab_overlap_exact(sf_dir: str):
    """EXACT pairwise vocabulary Jaccard between languages (stages/
    text.py: vocab_jaccard — the exact small-group counterpart of
    kmv_vocab_overlap's sketch): one distinct-(lang, token) pass, one
    int64 bitmask per token, and a ≤2^langs mask histogram as the only
    driver state. Pairs are (group_a < group_b); empty intersections
    omitted."""
    ds = _docs(sf_dir, ["text", "lang"])
    return text.vocab_jaccard(ds)


SQL_VOCAB_OVERLAP_EXACT = r"""
WITH tok AS (SELECT lang, unnest(regexp_extract_all(text, '\S+')) AS w
             FROM documents),
d AS (SELECT DISTINCT lang, w FROM tok WHERE lang IS NOT NULL AND w <> ''),
c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS nv FROM d GROUP BY 1),
i AS (SELECT a.lang AS group_a, b.lang AS group_b,
             CAST(COUNT(*) AS BIGINT) AS inter
      FROM d a JOIN d b USING (w) WHERE a.lang < b.lang GROUP BY 1, 2)
SELECT group_a, group_b, inter,
       CAST((inter * 1000000) // (ca.nv + cb.nv - inter) AS BIGINT)
         AS jaccard_ppm
FROM i JOIN c ca ON ca.lang = i.group_a JOIN c cb ON cb.lang = i.group_b
"""


def q_lm_coverage(sf_dir: str):
    """Trained-model quality scoring (stages/text.py: lm_coverage —
    the CCNet perplexity-filter shape with the "LM" trained on-cluster):
    the source='src0' slice trains a character-trigram vocabulary
    (count ≥ 4) distributed; the bounded vocab broadcasts once; every
    doc is scored in-vocabulary ppm by an actor pool. Integer ppm keeps
    the whole train→broadcast→score chain SQL-exact."""
    import pyarrow.dataset as pads

    path = os.path.join(sf_dir, "documents.parquet")
    docs = rd.read_parquet(path, columns=["doc_id", "text"])
    ref = rd.read_parquet(path, columns=["text"], filter=pads.field("source") == "src0")
    return text.lm_coverage(docs, ref, min_count=LM_MIN_COUNT)


SQL_LM_COVERAGE = f"""
WITH rt AS (SELECT substring(text, g, 3) AS tri FROM documents
            CROSS JOIN generate_series(1, 2048) gs(g)
            WHERE source = 'src0' AND g <= length(text) - 2),
vocab AS (SELECT tri FROM rt GROUP BY tri HAVING COUNT(*) >= {LM_MIN_COUNT}),
dt AS (SELECT doc_id, substring(text, g, 3) AS tri FROM documents
       CROSS JOIN generate_series(1, 2048) gs(g)
       WHERE g <= length(text) - 2)
SELECT dt.doc_id, CAST(COUNT(*) AS BIGINT) AS tri_total,
       CAST((1000000 * COUNT(v.tri)) // COUNT(*) AS BIGINT) AS in_vocab_ppm
FROM dt LEFT JOIN vocab v USING (tri)
GROUP BY dt.doc_id
"""


def q_lang_temperature(sf_dir: str):
    """Language-temperature mixing (stages/shard.py:mix_temperature —
    the mT5 recipe, alpha=0.5): low-resource languages up-sample by
    sqrt(n_max/n_lang) so realized shares follow n^alpha. One bounded
    per-lang count aggregate, broadcast rates, map-side explode with
    the id-addressed credit rule — the corpus never shuffles. The
    sqrt boost is float64-IEEE in both engines ⇒ hash-exact."""
    from rio_cogeo_ray.stages.shard import mix_temperature

    ds = _docs(sf_dir, ["doc_id", "lang"])
    # max_copies pins the engine to the SQL mirror's generate_series
    # bound (0..63) so the two agree by construction at any skew
    return mix_temperature(
        ds, group_col="lang", id_col="doc_id", alpha=0.5, max_copies=64
    )


SQL_LANG_TEMPERATURE = """
WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang),
m AS (SELECT MAX(n) AS nmax FROM c),
r AS (SELECT lang,
             CAST(FLOOR(SQRT(1000000000000.0 * nmax / n)) AS BIGINT) AS num
      FROM c, m),
d AS (SELECT doc_id, documents.lang, num,
             num // 1000000
             + CASE WHEN ((doc_id + 0) * 2654435761) % 4294967296 % 1000000
                         < num % 1000000 THEN 1 ELSE 0 END AS nc
      FROM documents JOIN r USING (lang))
SELECT doc_id, lang, CAST(g AS BIGINT) AS copy_idx
FROM d CROSS JOIN generate_series(0, 63) gs(g)
WHERE g < nc
"""


def q_script_lang_mismatch(sf_dir: str):
    """Wrong-language-metadata audit (the CCNet-family data-quality
    gate: a page CLAIMING lang=zh whose text is dominantly Latin is
    mislabeled or spam): script_profile's dominant script compared
    against the claimed lang's expected script — one row per
    mismatching doc with both sides. Pure map chain, zero shuffle;
    langs with no expectation ('' mapping) never flag."""
    ds = _docs(sf_dir, ["doc_id", "lang", "text"])

    def _audit(t: pa.Table) -> pa.Table:
        # the script_profile counting kernel inline, with lang riding
        # the same batch — no id re-join (the web_prep gate doctrine)
        from rio_cogeo_ray.stages.text import SCRIPT_CLASSES

        texts = t["text"].combine_chunks().cast(pa.string())
        n = t.num_rows
        counts = np.zeros((len(SCRIPT_CLASSES), n), dtype=np.int64)
        for i, sname in enumerate(SCRIPT_CLASSES):
            c = pc.count_substring_regex(texts, r"\p{%s}" % sname)
            counts[i] = np.nan_to_num(
                c.cast(pa.float64()).to_numpy(zero_copy_only=False)
            ).astype(np.int64)
        top = counts.max(axis=0)
        dom_idx = counts.argmax(axis=0)
        dom = np.where(
            top > 0, np.array(SCRIPT_CLASSES, dtype=object)[dom_idx], ""
        )
        lang = t["lang"].combine_chunks().to_pylist()
        exp = np.array(
            [LANG_EXPECTED_SCRIPT.get(v or "", "") for v in lang], dtype=object
        )
        bad = (exp != "") & (dom != "") & (exp != dom)
        sel = pa.array(bad)
        return pa.table(
            {
                "doc_id": t["doc_id"].combine_chunks().cast(pa.int64()).filter(sel),
                "lang": t["lang"].combine_chunks().cast(pa.string()).filter(sel),
                "expected_script": pa.array(exp[bad].tolist(), pa.string()),
                "dominant_script": pa.array(dom[bad].tolist(), pa.string()),
            }
        )

    return ds.map_batches(_audit, batch_format="pyarrow")


SQL_SCRIPT_LANG_MISMATCH = _sql_script_lang_mismatch()


def q_bigram_surprisal(sf_dir: str):
    """Bigram conditional surprisal (stages/text.py: bigram_surprisal
    — the order-2 CCNet/KenLM analog): integer-exact -log2 p(w2|w1)
    bits summed per doc over the corpus's own pair counts. One
    model-bounded shuffle + broadcast (pair-hash → bits) scoring —
    zero doc-token shuffle (the surprisal broadcast doctrine, one
    order higher)."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    return text.bigram_surprisal(ds)


SQL_BIGRAM_SURPRISAL = r"""
WITH tok AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
             FROM documents),
pr AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
       FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM tok)),
cb AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c FROM pr GROUP BY w1, w2),
cp AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS p FROM cb GROUP BY w1)
SELECT pr.doc_id,
       CAST(SUM(LENGTH(bin(cp.p // cb.c)) - 1) AS BIGINT) AS bigram_bits,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM pr
JOIN cb ON pr.w1 = cb.w1 AND pr.w2 = cb.w2
JOIN cp ON pr.w1 = cp.w1
GROUP BY pr.doc_id
"""


def q_bigram_pruned(sf_dir: str):
    """Bounded bigram surprisal (stages/text.py: bigram_surprisal with
    ``min_count=2`` — the web-scale broadcast bound): pairs seen once
    are pruned from the broadcast model and fall back to unigram bits
    floor(log2(T // cu(w2))) — the order-0 backoff. Kept pairs still
    score with the FULL prefix totals. Count-threshold (not top-N)
    keeps the cut deterministic and string-mirrorable in SQL."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    return text.bigram_surprisal(ds, min_count=2)


SQL_BIGRAM_PRUNED = r"""
WITH tok AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
             FROM documents),
pr AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
       FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM tok)),
cb AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c FROM pr GROUP BY w1, w2),
cp AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS p FROM cb GROUP BY w1),
cu AS (SELECT w2, CAST(SUM(c) AS BIGINT) AS u FROM cb GROUP BY w2),
tt AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM cb)
SELECT pr.doc_id,
       CAST(SUM(CASE WHEN cb.c >= 2 THEN LENGTH(bin(cp.p // cb.c)) - 1
                     ELSE LENGTH(bin(tt.t // cu.u)) - 1 END) AS BIGINT)
         AS bigram_bits,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM pr
JOIN cb ON pr.w1 = cb.w1 AND pr.w2 = cb.w2
JOIN cp ON pr.w1 = cp.w1
JOIN cu ON pr.w2 = cu.w2
CROSS JOIN tt
GROUP BY pr.doc_id
"""


def q_page_meta(sf_dir: str):
    """Page metadata extraction (stages/text.py: page_meta): <title>
    text by the full-split device + robots-meta noindex/nofollow
    exclusion flags (the crawl-politeness gate). Pure map, zero
    shuffle; html synthesized identically in both engines (every 7th
    doc plants noindex, every 11th nofollow)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def _html(t: pa.Table) -> pa.Table:
        d = t["doc_id"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        txt = pc.fill_null(t["text"].combine_chunks().cast(pa.string()), "")
        ni = pc.if_else(
            pa.array(d % 7 == 0),
            pa.scalar('<meta name="robots" content="noindex">'),
            pa.scalar(""),
        )
        nf = pc.if_else(
            pa.array(d % 11 == 0),
            pa.scalar('<meta name="robots" content="nofollow,noarchive">'),
            pa.scalar(""),
        )
        html = pc.binary_join_element_wise(
            pa.scalar("<html><head><title>T"),
            pc.cast(pa.array(d % 13, pa.int64()), pa.string()),
            pa.scalar(" page</title>"),
            ni,
            nf,
            pa.scalar("</head><body>"),
            txt,
            pa.scalar("</body></html>"),
            "",
        )
        return pa.table({"doc_id": pa.array(d, pa.int64()), "html": html})

    return text.page_meta(ds.map_batches(_html, batch_format="pyarrow"))


SQL_PAGE_META = r"""
WITH h AS (SELECT doc_id,
  '<html><head><title>T' || doc_id % 13 || ' page</title>'
    || CASE WHEN doc_id % 7 = 0
            THEN '<meta name="robots" content="noindex">' ELSE '' END
    || CASE WHEN doc_id % 11 = 0
            THEN '<meta name="robots" content="nofollow,noarchive">' ELSE '' END
    || '</head><body>' || COALESCE(text, '') || '</body></html>' AS html
  FROM documents)
SELECT doc_id,
       str_split(str_split(html || '<title>', '<title>')[2] || '</title>',
                 '</title>')[1] AS title,
       CAST(regexp_matches(html, '<meta[^>]*noindex') AS BIGINT) AS has_noindex,
       CAST(regexp_matches(html, '<meta[^>]*nofollow') AS BIGINT) AS has_nofollow
FROM h
"""


def q_compression_ratio(sf_dir: str):
    """zlib compression-ratio quality signal (stages/text.py:
    compression_ratio — the RedPajama-v2 repetitiveness heuristic,
    integer ppm). Pure map, zero shuffle; rows-only (the oracle has no
    codec) — pinned by a direct-zlib pytest."""
    return text.compression_ratio(_docs(sf_dir, ["doc_id", "text"]))

