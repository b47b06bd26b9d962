"""Corpus shaping: shards, mixes, splits, sampling, packing, prep chains.

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
from rio_cogeo_ray.pipelines.queries._common import CHUNK_S, CHUNK_W, HOST_CAP_K, LPM_RULES, PACK_BUDGET, SEG_W, SHARD_N, SPLITS, UPSAMPLE_DEN, UPSAMPLE_NUM, WEB_PREP_BAD_DENSITY, _BADWORDS, _BLOCK_DOMAINS, _BLOCK_SQL_VALUES, _docs, _read, _sql_script_mix, _synth_url_col
from rio_cogeo_ray.pipelines.queries.dedupq import SQL_SEG_DEDUP
from rio_cogeo_ray.pipelines.queries.textq import SQL_BADWORD_FILTER, SQL_GOPHER_REPETITION


def q_corpus_card(sf_dir: str):
    """One-row corpus 'dataset card' (the training-data reporting
    staple): doc count, language count, char total, exact median doc
    length, and exact duplicate count — composed entirely from
    existing exact distributed passes (per-lang aggregate, two-pass
    exact quantile, hash-based distinct), each of which keeps the
    driver at O(bounded) rows."""
    from rio_cogeo_ray.stages import sketch

    langs_blocks = [
        b
        for b in __import__("ray").get(
            agg.partial_group_agg(
                _docs(sf_dir, ["lang", "n_chars"]),
                keys=["lang"], sum_cols=["n_chars"], count_as="n",
            ).to_arrow_refs()
        )
        if b.num_rows and "lang" in b.column_names
    ]
    if langs_blocks:
        lt = pa.concat_tables(langs_blocks).combine_chunks()
        n_docs = int(pc.sum(lt["n"]).as_py() or 0)
        n_langs = lt.num_rows
        total_chars = int(pc.sum(lt["sum_n_chars"]).as_py() or 0)
    else:
        n_docs = n_langs = total_chars = 0
    if n_docs:
        med = sketch.exact_quantiles(
            _docs(sf_dir, ["n_chars"]), "n_chars", (0.5,), scale=1
        )
        median_chars = int(med[0.5])
        distinct = dedup.exact_dedup(
            _docs(sf_dir, ["doc_id", "text"]), "text", "doc_id"
        ).count()
    else:
        median_chars = 0
        distinct = 0
    return pa.table(
        {
            "n_docs": pa.array([n_docs], pa.int64()),
            "n_langs": pa.array([n_langs], pa.int64()),
            "total_chars": pa.array([total_chars], pa.int64()),
            "median_chars": pa.array([median_chars], pa.int64()),
            "dup_docs": pa.array([n_docs - distinct], pa.int64()),
        }
    )


SQL_CORPUS_CARD = """
WITH m AS (
  SELECT n_chars, CAST(COUNT(*) AS BIGINT) AS c FROM documents GROUP BY n_chars
), r AS (
  SELECT n_chars, SUM(c) OVER (ORDER BY n_chars) AS cum,
         (SELECT SUM(c) FROM m) AS tot FROM m
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
       (SELECT CAST(COUNT(DISTINCT lang) AS BIGINT) FROM documents) AS n_langs,
       (SELECT CAST(SUM(n_chars) AS BIGINT) FROM documents) AS total_chars,
       (SELECT CAST(MIN(n_chars) AS BIGINT) FROM r
        WHERE cum >= CAST(CEIL(0.5 * tot) AS BIGINT)) AS median_chars,
       (SELECT CAST(COUNT(*) - COUNT(DISTINCT text) AS BIGINT) FROM documents)
       AS dup_docs
"""


def q_corpus_checksum(sf_dir: str):
    """Order-independent exact corpus checksum (stages/sketch.py:
    checksum_int): each row contributes knuth32(doc_id) · (n_chars + 1
    + len(lang)); per-batch int64 partials, driver sums Python ints —
    the one-pass corpus-equality audit (snapshot_diff says WHICH rows
    changed; this says IF anything changed, in O(#blocks) driver
    bytes)."""
    import pyarrow.compute as pc

    from rio_cogeo_ray.stages.sketch import checksum_int

    ds = _docs(sf_dir, ["doc_id", "n_chars", "lang"])

    def _contrib(t: pa.Table) -> pa.Table:
        from rio_cogeo_ray.stages.sketch import knuth32

        did = (
            t["doc_id"].combine_chunks().cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        h = pa.array(knuth32(did).astype(np.int64), pa.int64())
        w = pc.add(
            pc.add(
                t["n_chars"].combine_chunks().cast(pa.int64()),
                pa.scalar(1, pa.int64()),
            ),
            pc.utf8_length(t["lang"].combine_chunks()).cast(pa.int64()),
        )
        return pa.table({"c": pc.multiply_checked(h, w)})

    return checksum_int(ds.map_batches(_contrib, batch_format="pyarrow"), "c")


SQL_CORPUS_CHECKSUM = (
    "SELECT CAST(SUM(((doc_id * 2654435761) % 4294967296)::HUGEINT "
    "* (n_chars + 1 + length(lang))) % 9223372036854775807 AS BIGINT) "
    "AS checksum, CAST(COUNT(*) AS BIGINT) AS n_rows FROM documents"
)


def q_blocklist(sf_dir: str):
    """Host-blocklist filtering with wildcard-subdomain semantics
    (stages/text.py:HostBlocklist): blocklist broadcast once, each
    actor builds a sorted prefix-free reversed-label byte index in
    __init__; per batch ONE searchsorted + startswith over fixed-width
    bytes — log2(blocklist) memcmp probes per row, scales to millions
    of entries."""
    ds = _docs(sf_dir, ["doc_id"]).map_batches(
        _synth_url_col, batch_format="pyarrow"
    )
    flagged = text.host_blocklist_flag(ds, _BLOCK_DOMAINS)
    return flagged.select_columns(["doc_id", "host", "blocked"])


SQL_BLOCKLIST = (
    "WITH u AS (SELECT doc_id, "
    "(CASE WHEN (doc_id & 1) = 0 THEN 'http' ELSE 'https' END) || '://w' || "
    "CAST(doc_id % 53 AS VARCHAR) || '.site' || CAST((doc_id % 53) % 7 AS VARCHAR) || '.' || "
    "(CASE (doc_id % 53) % 4 WHEN 0 THEN 'com' WHEN 1 THEN 'org' WHEN 2 THEN 'net' ELSE 'io' END) || "
    "'/p/' || CAST(doc_id % 16 AS VARCHAR) || "
    "(CASE doc_id % 3 WHEN 0 THEN '' WHEN 1 THEN '/x' ELSE '/x/x' END) AS url FROM documents), "
    "b(d) AS (VALUES " + _BLOCK_SQL_VALUES + "), "
    "p AS (SELECT doc_id, regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host FROM u) "
    "SELECT doc_id, host, CAST(CASE WHEN EXISTS ("
    "SELECT 1 FROM b WHERE p.host = b.d OR p.host LIKE '%.' || b.d"
    ") THEN 1 ELSE 0 END AS BIGINT) AS blocked FROM p"
)


def q_doc_chunks(sf_dir: str):
    """Overlapping character-window chunking (stages/text.py:
    chunk_texts) — the RAG/context-packing explode every LLM data
    pipeline needs. Pure map-side flat explode (no shuffle); chunk i
    covers [i*stride, i*stride+window) code points and the last chunk
    always reaches end-of-doc. Mirrored exactly by a lateral
    generate_series + substring (both engines count code points)."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(
        lambda t: text.chunk_texts(t, window=CHUNK_W, stride=CHUNK_S),
        batch_format="pyarrow",
    )


SQL_DOC_CHUNKS = (
    f"WITH d AS (SELECT doc_id, text, length(text) AS L FROM documents), "
    f"n AS (SELECT doc_id, text, CASE WHEN L <= {CHUNK_W} THEN 1 "
    f"ELSE CAST(CEIL((L - {CHUNK_W}) / {CHUNK_S}.0) AS BIGINT) + 1 END AS n_chunks FROM d) "
    f"SELECT n.doc_id, CAST(g - 1 AS BIGINT) AS chunk_id, "
    f"substring(n.text, CAST((g - 1) * {CHUNK_S} + 1 AS BIGINT), {CHUNK_W}) AS chunk_text, "
    f"CAST(length(substring(n.text, CAST((g - 1) * {CHUNK_S} + 1 AS BIGINT), {CHUNK_W})) AS BIGINT) AS chunk_len "
    # series bound: this DuckDB build rejects lateral generate_series
    # (column arg), so the series is fixed and filtered; 8192 covers
    # docs up to stride*8191 + window = 655,400 code points — far above
    # the corpus max (577) — while keeping the cross join small.
    f"FROM n CROSS JOIN generate_series(1, 8192) AS gs(g) WHERE g <= n.n_chunks"
)


def q_pack_sequences(sf_dir: str):
    """Context-window sequence packing (stages/text.py:
    pack_sequences): greedily pack docs into <=200-token training
    sequences per source shard, in doc_id order. Engine kernel is
    O(n_sequences·log n) searchsorted over the cumsum (verified
    against a pure sequential reference); SQL mirror is the literal
    sequential recursion (recursive CTE)."""
    ds = _docs(sf_dir, ["doc_id", "source", "text"])
    return text.pack_sequences(ds, budget=PACK_BUDGET)


SQL_PACK_SEQUENCES = (
    "WITH RECURSIVE d AS (SELECT source, doc_id, "
    "CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS toks, "
    "row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn FROM documents), "
    "r AS (SELECT source, doc_id, toks, rn, CAST(0 AS BIGINT) AS seq_id, toks AS acc "
    "FROM d WHERE rn = 1 "
    "UNION ALL "
    f"SELECT d.source, d.doc_id, d.toks, d.rn, "
    f"CASE WHEN r.acc + d.toks > {PACK_BUDGET} THEN r.seq_id + 1 ELSE r.seq_id END, "
    f"CASE WHEN r.acc + d.toks > {PACK_BUDGET} THEN d.toks ELSE r.acc + d.toks END "
    "FROM r JOIN d ON d.source = r.source AND d.rn = r.rn + 1) "
    "SELECT source, doc_id, toks, seq_id FROM r"
)


def q_corpus_prep(sf_dir: str):
    """Composed end-to-end training-corpus prep — the flagship LLM
    data pipeline chaining four operators: quality filter
    (text.QualityScore) → exact dedup keepers (dedup.exact_dedup)
    → bloom-prefiltered semi join back to the text
    (join_mod.bloom_semi_join on doc_id) → overlapping-window
    chunking (text.chunk_texts). Every stage is the production
    operator; the SQL mirrors the whole chain."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    scored = ds.map_batches(
        text.QualityScore, batch_format="pyarrow", concurrency=2, batch_size=4096
    )

    def _keep(t: pa.Table) -> pa.Table:
        return t.filter(t["quality_ok"].combine_chunks()).select(["doc_id", "text"])

    q = scored.map_batches(_keep, batch_format="pyarrow")
    keepers = dedup.exact_dedup(q, key_col="text", id_col="doc_id")
    # recover the keeper rows' text: exact semi join on doc_id with a
    # bloom prefilter (keeper ids are NOT broadcast-small at 100 TB);
    # reusing q re-executes its lineage for this branch — same cost as
    # a second read, no duplicated code
    kept = join_mod.bloom_semi_join(q, keepers, on="doc_id", m_bits=1 << 20)
    return kept.map_batches(
        lambda t: text.chunk_texts(t, window=CHUNK_W, stride=CHUNK_S),
        batch_format="pyarrow",
    )


SQL_CORPUS_PREP = (
    r"WITH q AS (SELECT doc_id, text FROM documents WHERE "
    r"CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) >= 5 "
    r"AND 2 * length(text) >= 4 * len(regexp_extract_all(text, '\S+')) "
    r"AND 2 * length(text) <= 24 * len(regexp_extract_all(text, '\S+'))), "
    "k AS (SELECT MIN(doc_id) AS doc_id FROM q GROUP BY text), "
    "kept AS (SELECT q.doc_id, q.text FROM q WHERE EXISTS "
    "(SELECT 1 FROM k WHERE k.doc_id = q.doc_id)), "
    "d AS (SELECT doc_id, text, length(text) AS L FROM kept), "
    f"n AS (SELECT doc_id, text, CASE WHEN L <= {CHUNK_W} THEN 1 "
    f"ELSE CAST(CEIL((L - {CHUNK_W}) / {CHUNK_S}.0) AS BIGINT) + 1 END AS n_chunks FROM d) "
    f"SELECT n.doc_id, CAST(g - 1 AS BIGINT) AS chunk_id, "
    f"substring(n.text, CAST((g - 1) * {CHUNK_S} + 1 AS BIGINT), {CHUNK_W}) AS chunk_text, "
    f"CAST(length(substring(n.text, CAST((g - 1) * {CHUNK_S} + 1 AS BIGINT), {CHUNK_W})) AS BIGINT) AS chunk_len "
    f"FROM n CROSS JOIN generate_series(1, 8192) AS gs(g) WHERE g <= n.n_chunks"
)


def q_corpus_to_shards(sf_dir: str):
    """The FULL training-data flagship, end to end: corpus prep
    (quality filter → exact dedup → bloom semi join → chunking)
    → deterministic 90/5/5 split on the chunk id → seeded global
    shuffle of the train split into 4 shards with per-shard positions.
    Seven production operators in one streaming chain; the SQL mirrors
    the whole thing in one statement."""
    from rio_cogeo_ray.stages import shard as shard_mod
    from rio_cogeo_ray.stages import sketch

    chunks = q_corpus_prep(sf_dir)

    def _cid(t: pa.Table) -> pa.Table:
        d = t["doc_id"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        c = t["chunk_id"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "doc_id": t["doc_id"].combine_chunks(),
                "chunk_id": t["chunk_id"].combine_chunks(),
                "chunk_len": t["chunk_len"].combine_chunks(),
                "cid": pa.array(d * 8192 + c, pa.int64()),
            }
        )

    keyed = chunks.map_batches(_cid, batch_format="pyarrow")
    split = sketch.split_assign(keyed, "cid", SPLITS)

    def _train(t: pa.Table) -> pa.Table:
        return t.filter(
            pa.compute.equal(t["split"].combine_chunks(), "train")
        ).drop_columns(["split"])

    train = split.map_batches(_train, batch_format="pyarrow")
    sh = shard_mod.shard_shuffle(train, "cid", 4)
    return sh.map_batches(
        lambda t: t.select(["doc_id", "chunk_id", "chunk_len", "shard", "pos"]),
        batch_format="pyarrow",
    )


SQL_CORPUS_TO_SHARDS = (
    "WITH c AS (" + SQL_CORPUS_PREP + "), "
    # cid = doc_id*8192 + chunk_id amplifies the hash multiplicand, so the
    # knuth32 mirror runs in HUGEINT ((x·K mod 2^64) mod 2^32 == x·K mod 2^32,
    # matching the engine's uint64 wraparound) — BIGINT would overflow at
    # cid ≥ ~3.47e9 (doc_id ≥ ~424k)
    "w AS (SELECT doc_id, chunk_id, chunk_len, doc_id * 8192 + chunk_id AS cid FROM c), "
    "tr AS (SELECT * FROM w WHERE ((CAST(cid AS HUGEINT) * 2654435761) % 4294967296) % 100 < 90), "
    "s AS (SELECT doc_id, chunk_id, chunk_len, cid, "
    "CAST(((CAST(cid AS HUGEINT) * 2654435761) % 4294967296) % 4 AS BIGINT) AS shard, "
    "((CAST(cid + 1 AS HUGEINT) * 2654435761) % 4294967296) AS h2 FROM tr) "
    "SELECT doc_id, chunk_id, chunk_len, shard, "
    "CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h2, cid) - 1 AS BIGINT) AS pos "
    "FROM s"
)


def q_lpm_rules(sf_dir: str):
    """Longest-prefix-match rule routing (stages/join.py:
    broadcast_lpm_join — robots.txt / URL-routing semantics: the most
    SPECIFIC matching rule wins): urls synthesized from doc_id match a
    6-rule table where broad host rules are shadowed by longer
    host/path rules; unmatched urls keep NULL. Pure map, zero shuffle,
    one is_in probe per distinct rule length."""
    ds = _docs(sf_dir, ["doc_id"])

    def _urls(t: pa.Table) -> pa.Table:
        d = t["doc_id"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )

        def _s(a):
            return pc.cast(pa.array(a, pa.int64()), pa.string())

        url = pc.binary_join_element_wise(
            pa.scalar("https://h"),
            _s(d % 23),
            pa.scalar(".example.com/p"),
            _s(d % 11),
            "",
        )
        return pa.table({"doc_id": pa.array(d, pa.int64()), "url": url})

    rules = pa.table({"prefix": pa.array(LPM_RULES, pa.string())})
    return join_mod.broadcast_lpm_join(
        ds.map_batches(_urls, batch_format="pyarrow"), rules
    )


def q_shard_shuffle(sf_dir: str):
    """Deterministic seeded global shuffle → training-shard layout
    (the step after corpus_prep in any real training-data pipeline):
    shard = knuth32(id) % 8, within-shard order = the salt-1 hash
    permutation. One all-to-all (the shard groupby); per-shard rank is
    a local vectorized sort."""
    from rio_cogeo_ray.stages import shard as shard_mod

    ds = _docs(sf_dir, ["doc_id", "lang"])
    return shard_mod.shard_shuffle(ds, "doc_id", SHARD_N)


SQL_SHARD_SHUFFLE = (
    "WITH h AS (SELECT doc_id, lang, "
    f"((doc_id * 2654435761) % 4294967296) % {SHARD_N} AS shard, "
    "(((doc_id + 1) * 2654435761) % 4294967296) AS h2 FROM documents) "
    "SELECT doc_id, lang, shard, "
    "CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h2, doc_id) - 1 "
    "AS BIGINT) AS pos FROM h"
)


def q_corpus_mix(sf_dir: str):
    """Weighted multi-corpus mixing (three text sources blended at
    1/2 : 1/4 : 1/8 deterministic Bernoulli credits, shared interleave
    key) — zero shuffle: per-source map-side hash filters + a
    metadata-only union."""
    from rio_cogeo_ray.stages import shard as shard_mod

    docs = _docs(sf_dir, ["doc_id", "text"])
    orders = _read(os.path.join(sf_dir, "orders.parquet"), ["o_orderkey", "o_orderpriority"])
    li = _read(
        os.path.join(sf_dir, "lineitem.parquet"),
        ["l_orderkey", "l_linenumber", "l_returnflag"],
    )

    def _li_id(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        ln = t["l_linenumber"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "li_id": pa.array(ok * 8 + ln, pa.int64()),
                "l_returnflag": t["l_returnflag"].combine_chunks(),
            }
        )

    li_keyed = li.map_batches(_li_id, batch_format="pyarrow")
    return shard_mod.corpus_mix(
        [
            ("docs", docs, 1, 2, 0),
            ("orders", orders, 1, 4, 1),
            ("lineitem", li_keyed, 1, 8, 2),
        ]
    )


SQL_CORPUS_MIX = (
    "WITH u AS ("
    "SELECT 'docs' AS source, doc_id AS rid, text FROM documents "
    "WHERE ((doc_id * 2654435761) % 4294967296) % 2 < 1 "
    "UNION ALL "
    "SELECT 'orders', o_orderkey, o_orderpriority FROM orders "
    "WHERE (((o_orderkey + 1) * 2654435761) % 4294967296) % 4 < 1 "
    "UNION ALL "
    "SELECT 'lineitem', l_orderkey * 8 + l_linenumber, l_returnflag FROM lineitem "
    "WHERE ((((l_orderkey * 8 + l_linenumber) + 2) * 2654435761) % 4294967296) % 8 < 1"
    ") SELECT source, rid, text, "
    "((rid + 7) * 2654435761) % 4294967296 AS h2 FROM u"
)


def q_corpus_upsample(sf_dir: str):
    """Deterministic over-sampling for epoch weighting (stages/
    shard.py: repeat_weighted — the rate>1 side of corpus mixing):
    each doc emits floor(5/2)=2 copies plus a knuth32-credit third,
    expected 2.5 epochs, decided by id alone. Map-side explode, zero
    shuffle."""
    from rio_cogeo_ray.stages import shard

    ds = _docs(sf_dir, ["doc_id", "lang"])
    return shard.repeat_weighted(ds, "doc_id", UPSAMPLE_NUM, UPSAMPLE_DEN)


SQL_CORPUS_UPSAMPLE = f"""
WITH d AS (SELECT doc_id, lang,
  {UPSAMPLE_NUM // UPSAMPLE_DEN} + CASE WHEN ((doc_id + 0) * 2654435761) % 4294967296 % {UPSAMPLE_DEN} < {UPSAMPLE_NUM % UPSAMPLE_DEN} THEN 1 ELSE 0 END AS nc
  FROM documents)
SELECT doc_id, lang, CAST(g AS BIGINT) AS copy_idx
FROM d CROSS JOIN generate_series(0, {UPSAMPLE_NUM // UPSAMPLE_DEN}) gs(g) WHERE g < nc
"""


def q_host_cap(sf_dir: str):
    """Per-host corpus cap (stages/agg.py: top_rows_by): keep at most
    3 docs per host (longest n_chars first, doc_id tie-break) so no
    single site dominates the training mix. Host is the deterministic
    doc_id % 53 synthesis (the corpus has no url column — same doctrine
    as q_host_stats). Partial top-k per batch collapses the exchange to
    ≤k rows per host per batch."""
    ds = _docs(sf_dir, ["doc_id", "n_chars"])

    def _host(t: pa.Table) -> pa.Table:
        d = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        return t.append_column("host", pa.array(d % 53, pa.int64()))

    from rio_cogeo_ray.stages.agg import top_rows_by

    capped = top_rows_by(
        ds.map_batches(_host, batch_format="pyarrow"),
        keys=["host"],
        order_by=[("n_chars", "descending"), ("doc_id", "ascending")],
        k=HOST_CAP_K,
    )
    return capped.map_batches(
        lambda t: t.select(["host", "doc_id", "n_chars"]), batch_format="pyarrow"
    )


SQL_HOST_CAP = f"""
WITH d AS (SELECT doc_id % 53 AS host, doc_id, n_chars FROM documents),
r AS (SELECT host, doc_id, n_chars,
      ROW_NUMBER() OVER (PARTITION BY host ORDER BY n_chars DESC, doc_id) AS rn FROM d)
SELECT host, doc_id, n_chars FROM r WHERE rn <= {HOST_CAP_K}
"""


def q_polite_order(sf_dir: str):
    """Crawl-politeness interleave (stages/shard.py: polite_interleave):
    a deterministic global fetch order where round r emits each host's
    r-th doc — same-host requests maximally spread (the Mercator-style
    frontier discipline). Two rank exchanges + one bounded per-round
    count broadcast; mirrors two SQL window ranks exactly."""
    ds = _docs(sf_dir, ["doc_id", "source"])

    def _host(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"].combine_chunks(),
                "host": t["source"].combine_chunks().cast(pa.string()),
            }
        )

    from rio_cogeo_ray.stages import shard as shard_mod

    return shard_mod.polite_interleave(
        ds.map_batches(_host, batch_format="pyarrow"), "host", "doc_id"
    )


SQL_POLITE_ORDER = """
WITH r AS (SELECT doc_id, source AS host,
                  ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rr
           FROM documents)
SELECT doc_id, host, CAST(rr AS BIGINT) AS rr,
       CAST(ROW_NUMBER() OVER (ORDER BY rr, host, doc_id) AS BIGINT) AS pos
FROM r
"""


def q_script_mix(sf_dir: str):
    """Per-document Unicode script mix (stages/text.py:
    script_profile): one count per RE2 script class, dominant script
    (ties to earlier class), and the integer-ppm share of scripted
    codepoints outside the dominant script — the wrong-script /
    mixed-script spam signal beside langid. Pure map, zero shuffle;
    pyarrow and DuckDB both run RE2 so the script tables agree
    codepoint for codepoint."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    return text.script_profile(ds)


SQL_SCRIPT_MIX = _sql_script_mix()


def q_web_prep(sf_dir: str):
    """The composed web-corpus preparation chain (the FineWeb/CCNet
    shape: FILTER → DEDUP → SCORE), every stage a production operator:
    (1) Gopher repetition gate (repetition_ok = 1, one semi join of
    ids only), (2) dirty-word DENSITY gate (≥ {density} blocklist hits
    drops the doc — the C4 rule with a density threshold; anti join of
    ids only), (3) corpus-wide segment dedup over the survivors,
    (4) unigram surprisal scored over the DEDUPED corpus (its own
    counts), text and stats riding the scoring map via carry_cols —
    no final join, no extra corpus pass. Output: (doc_id, text_clean,
    n_kept, surprisal_bits, n_tokens)."""
    docs = _docs(sf_dir, ["doc_id", "text"])

    # both gates are PURE-MAP predicates: compute the flags inline and
    # filter in place — the corpus never pays an id re-join (gate joins
    # measured 60 s vs ~7 s of map gating on the 600k-page bench)
    gated = text.gopher_repetition(docs, carry_cols=("text",)).map_batches(
        lambda t: t.filter(
            pc.equal(t["repetition_ok"].combine_chunks(), 1)
        ).select(["doc_id", "text"]),
        batch_format="pyarrow",
    )
    surv = text.word_blocklist_filter(
        gated, _BADWORDS, max_hits=WEB_PREP_BAD_DENSITY
    )
    # the downstream stages are MULTI-PASS (segment_dedup re-joins by
    # hash, surprisal builds a vocab then scores): materialize the
    # stage boundaries so each pass reads the object store instead of
    # re-executing the whole upstream per pass
    seg = text.segment_dedup(surv.materialize(), seg_words=SEG_W).materialize()
    return text.surprisal_score(
        seg, text_col="text_clean", carry_cols=("text_clean", "n_kept")
    )


def _sql_web_prep() -> str:
    seg_over_surv = SQL_SEG_DEDUP.replace("FROM documents", "FROM surv")
    return f"""
WITH rep AS ({SQL_GOPHER_REPETITION}),
bad AS ({SQL_BADWORD_FILTER}),
surv AS (SELECT d.doc_id, d.text FROM documents d
         JOIN rep ON rep.doc_id = d.doc_id AND rep.repetition_ok = 1
         WHERE NOT EXISTS (SELECT 1 FROM bad
                           WHERE bad.doc_id = d.doc_id
                             AND bad.n_blocked >= {WEB_PREP_BAD_DENSITY})),
seg AS ({seg_over_surv}),
tok2 AS (SELECT doc_id, unnest(regexp_extract_all(text_clean, '\\S+')) AS tok
         FROM seg),
cf2 AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM tok2 GROUP BY tok),
tot2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tok2),
sc AS (SELECT t.doc_id,
              CAST(SUM(LENGTH(bin((SELECT n FROM tot2) // c.c)) - 1) AS BIGINT)
                AS surprisal_bits,
              CAST(COUNT(*) AS BIGINT) AS n_tokens
       FROM tok2 t JOIN cf2 c ON t.tok = c.tok GROUP BY t.doc_id)
SELECT seg.doc_id, seg.text_clean, seg.n_kept, sc.surprisal_bits, sc.n_tokens
FROM seg JOIN sc ON seg.doc_id = sc.doc_id
"""


SQL_WEB_PREP = _sql_web_prep()

