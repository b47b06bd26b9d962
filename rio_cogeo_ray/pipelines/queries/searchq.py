"""Retrieval queries: inverted/positional/trigram index probes, BM25, hybrid.

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
from rio_cogeo_ray.pipelines.queries._common import KWIC_CONTEXT, KWIC_NEEDLE, PHRASE_TERMS, SEARCH_TERMS, SUBSTRING_NEEDLE, _docs, _pos_index_dir, _read, _text_index_dir, _trigram_index_dir


def q_phrase_search(sf_dir: str):
    """Exact PHRASE query over the positional inverted index
    (stages/search.py: phrase_search): probes only the phrase terms'
    shards, routes the candidate postings by hash(doc), and verifies
    token adjacency per bucket vectorized (every occurrence of slot i
    at position p votes for alignment base p−i; a doc matches iff some
    base collects all slots)."""
    from rio_cogeo_ray.stages import search

    return search.phrase_search(_pos_index_dir(sf_dir), list(PHRASE_TERMS))


SQL_PHRASE_SEARCH = rf"""
SELECT doc_id FROM documents
WHERE ' ' || array_to_string(regexp_extract_all(text, '\S+'), ' ') || ' '
      LIKE '% {' '.join(PHRASE_TERMS)} %'
"""


def q_substring_search(sf_dir: str):
    """Exact substring search (LIKE '%…%') without a full text scan
    (stages/search.py: substring_search — the pg_trgm doctrine): the
    needle's collision-free packed trigrams prune candidates through
    the sharded trigram index, one corpus pass over the broadcast
    candidate set verifies with exact match_substring — zero false
    positives or negatives."""
    from rio_cogeo_ray.stages import search

    return search.substring_search(
        _trigram_index_dir(sf_dir),
        SUBSTRING_NEEDLE,
        _docs(sf_dir, ["doc_id", "text"]),
    )


SQL_SUBSTRING_SEARCH = (
    f"SELECT doc_id FROM documents WHERE strpos(text, '{SUBSTRING_NEEDLE}') > 0"
)


def q_bm25_rank(sf_dir: str):
    """BM25 ranked retrieval (stages/search.py: bm25_search) over the
    shard-pruned inverted index: idf from matched-posting df, doc
    lengths denormalized on postings (no doc join), per-posting scores
    quantized to int64 ppm BEFORE the exchange so ranking is
    parallelism-invariant. SQL-exact since round 5: every float step
    (LN idf, k1/b norm, ×1e6 floor) is mirrored term-for-term in
    SQL_BM25_RANK — the tfidf_top FLOOR(LN·1e6) doctrine; glibc log/
    pow are correctly rounded, so numpy and DuckDB agree bit-for-bit.
    Brute-force oracle additionally pinned in pytest
    (test_bm25_vs_bruteforce)."""
    from rio_cogeo_ray.stages import search

    return search.bm25_search(_text_index_dir(sf_dir), list(SEARCH_TERMS), k=20)


# mirror of bm25_search's arithmetic, expression for expression:
#   idf  = LN((N - df + 0.5) / (df + 0.5) + 1.0)          [doubles]
#   norm = (tf·(k1+1)) / (tf + k1·(1 − b + b·dl/avgdl))   [k1=1.2 b=.75]
#   s    = FLOOR(idf · norm · 1e6 + 0.5)  per (term, doc), then Σ per doc
# N = docs with ≥1 token (empty docs contribute no postings), dl = \S+
# token count, avgdl = Σdl / N — all exactly as the index manifest
# records them (search.py: build_text_index / _harvest_sentinel).
SQL_BM25_RANK = rf"""
WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS w
             FROM documents),
dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd,
             CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
      FROM dl),
tf AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
       WHERE w IN ('{SEARCH_TERMS[0]}', '{SEARCH_TERMS[1]}') GROUP BY 1, 2),
df AS (SELECT w, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
s AS (SELECT tf.doc_id,
             CAST(FLOOR(LN((n.nd - df.df + 0.5) / (df.df + 0.5) + 1.0)
                  * ((CAST(tf.tf AS DOUBLE) * (1200000.0 / 1000000.0 + 1.0))
                     / (CAST(tf.tf AS DOUBLE)
                        + (1200000.0 / 1000000.0)
                          * (1.0 - 750000.0 / 1000000.0
                             + 750000.0 / 1000000.0
                               * CAST(dl.dl AS DOUBLE) / n.avgdl)))
                  * 1000000.0 + 0.5) AS BIGINT) AS s
      FROM tf JOIN dl USING (doc_id) JOIN df ON tf.w = df.w CROSS JOIN n)
SELECT doc_id, CAST(SUM(s) AS BIGINT) AS score_ppm FROM s GROUP BY 1
ORDER BY score_ppm DESC, doc_id LIMIT 20
"""


def q_text_search(sf_dir: str):
    """Boolean search over a persisted inverted index (stages/search.py):
    posting lists (token-hash, doc_id) partitioned by hash shard; the
    query reads ONLY the shards its terms hash into (probed-bucket
    pruning), then one per-doc count — AND = contains every term.
    Index built once per sf_dir under /tmp (IVF caching doctrine)."""
    from rio_cogeo_ray.stages import search

    return search.search_index(
        _text_index_dir(sf_dir), list(SEARCH_TERMS), mode="and"
    )


SQL_TEXT_SEARCH = rf"""
SELECT doc_id FROM documents
WHERE list_contains(regexp_extract_all(text, '\S+'), '{SEARCH_TERMS[0]}')
  AND list_contains(regexp_extract_all(text, '\S+'), '{SEARCH_TERMS[1]}')
"""


def q_hybrid_search(sf_dir: str):
    """Hybrid lexical+semantic retrieval (stages/search.py:
    hybrid_search): BM25 over the shard-pruned inverted index fused
    with exact cosine top-k over the embeddings table by integer
    reciprocal-rank fusion (Cormack SIGIR'09). Query = SEARCH_TERMS +
    the vec_id=0 embedding. Float cosine leg ⇒ rows-only; exact RRF
    arithmetic pinned in pytest."""
    import pyarrow.parquet as pq_mod

    from rio_cogeo_ray.stages import search

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qt = pq_mod.read_table(emb_path, columns=["vec_id", "embedding"])
    qrows = qt.filter(pc.equal(qt["vec_id"], 0))["embedding"].to_pylist()
    if not qrows:  # empty/degenerate corpus: no query vector exists
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "rrf_nano": pa.array([], pa.int64()),
                "bm25_rank": pa.array([], pa.int64()),
                "cosine_rank": pa.array([], pa.int64()),
            }
        )
    qvec = np.asarray(qrows[0], dtype=np.float64)
    emb_ds = _read(emb_path, ["vec_id", "embedding"])
    return search.hybrid_search(
        _text_index_dir(sf_dir), list(SEARCH_TERMS), emb_ds, qvec, k=20
    )


def q_rrf_fusion(sf_dir: str):
    """Reciprocal-rank fusion of two EXACT lexical rankings
    (stages/search.py: rrf_fuse — Cormack et al. SIGIR'09): the BM25
    top-30 fused with the tf·idf top-30 over the same shard-pruned
    inverted index, contribution of rank r = 1e9 // (60 + r). Every
    step is integer (both legs ppm-floor per posting before their
    exchanges; the fusion is pure integer arithmetic over two ≤30-row
    driver lists), which is what makes a ranked FUSION SQL-mirrorable
    at all — hybrid_search's cosine leg stays rows-only by contrast."""
    from rio_cogeo_ray.stages import search

    idx = _text_index_dir(sf_dir)
    lex = search.bm25_search(idx, list(SEARCH_TERMS), k=30)
    tfi = search.bm25_search(idx, list(SEARCH_TERMS), k=30, scoring="tfidf")
    fused = search.rrf_fuse(
        [lex.select(["doc_id"]), tfi.select(["doc_id"])], k_const=60, topk=20
    )
    return fused.rename_columns(["doc_id", "rrf_nano", "bm25_rank", "tfidf_rank"])


# the two leg CTEs replicate SQL_BM25_RANK's arithmetic (bm25) and
# SQL_TFIDF_TOP's idf (tfidf) over the same tokenization; ranks are
# ROW_NUMBER in (score DESC, doc_id) order, fusion is pure integer //
SQL_RRF_FUSION = rf"""
WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS w
             FROM documents),
dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd,
             CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
      FROM dl),
tf AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
       WHERE w IN ('{SEARCH_TERMS[0]}', '{SEARCH_TERMS[1]}') GROUP BY 1, 2),
df AS (SELECT w, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
bm AS (SELECT tf.doc_id,
              CAST(FLOOR(LN((n.nd - df.df + 0.5) / (df.df + 0.5) + 1.0)
                   * ((CAST(tf.tf AS DOUBLE) * (1200000.0 / 1000000.0 + 1.0))
                      / (CAST(tf.tf AS DOUBLE)
                         + (1200000.0 / 1000000.0)
                           * (1.0 - 750000.0 / 1000000.0
                              + 750000.0 / 1000000.0
                                * CAST(dl.dl AS DOUBLE) / n.avgdl)))
                   * 1000000.0 + 0.5) AS BIGINT) AS s
       FROM tf JOIN dl USING (doc_id) JOIN df ON tf.w = df.w CROSS JOIN n),
ti AS (SELECT tf.doc_id,
              CAST(FLOOR(LN(n.nd / df.df)
                   * CAST(tf.tf AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS s
       FROM tf JOIN df ON tf.w = df.w CROSS JOIN n),
bmr AS (SELECT doc_id, ROW_NUMBER() OVER
            (ORDER BY SUM(s) DESC, doc_id) AS r
        FROM bm GROUP BY doc_id QUALIFY r <= 30),
tir AS (SELECT doc_id, ROW_NUMBER() OVER
            (ORDER BY SUM(s) DESC, doc_id) AS r
        FROM ti GROUP BY doc_id QUALIFY r <= 30),
f AS (SELECT COALESCE(bmr.doc_id, tir.doc_id) AS doc_id,
             COALESCE(1000000000 // (60 + bmr.r), 0)
               + COALESCE(1000000000 // (60 + tir.r), 0) AS rrf_nano,
             COALESCE(bmr.r, 0) AS bm25_rank,
             COALESCE(tir.r, 0) AS tfidf_rank
      FROM bmr FULL OUTER JOIN tir ON bmr.doc_id = tir.doc_id)
SELECT doc_id, CAST(rrf_nano AS BIGINT) AS rrf_nano,
       CAST(bm25_rank AS BIGINT) AS bm25_rank,
       CAST(tfidf_rank AS BIGINT) AS tfidf_rank
FROM f ORDER BY rrf_nano DESC, doc_id LIMIT 20
"""


def q_hybrid_exact(sf_dir: str):
    """SQL-exact HYBRID lexical+semantic retrieval — the promotion of
    hybrid_search's shape to full exactness: the BM25 top-30 over the
    documents index fused with the INTEGER-QUANTIZED cosine top-30
    over the embeddings table (stages/ann.py: knn_cosine_quantized —
    the ann_exact_topk device) by integer RRF. Embedding vec_ids share
    the document id space by fixture contract (as in hybrid_search);
    the float-cosine hybrid_search stays rows-only as the production
    baseline."""
    from rio_cogeo_ray.stages import ann as ann_mod
    from rio_cogeo_ray.stages import search

    idx = _text_index_dir(sf_dir)
    lex = search.bm25_search(idx, list(SEARCH_TERMS), k=30)

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qt = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    qrows = qt.filter(pc.equal(qt["vec_id"], 0))["embedding"].to_pylist()
    if not qrows:
        sem = pa.table({"vec_id": pa.array([], pa.int64())})
    else:
        sem = ann_mod.knn_cosine_quantized(
            _read(emb_path, ["vec_id", "embedding"]),
            np.asarray(qrows[0], dtype=np.float64),
            k=30,
        )
    sem_ids = pa.table({"doc_id": sem["vec_id"]})
    fused = search.rrf_fuse(
        [lex.select(["doc_id"]), sem_ids], k_const=60, topk=20
    )
    return fused.rename_columns(["doc_id", "rrf_nano", "bm25_rank", "cosine_rank"])


# bm leg = SQL_BM25_RANK's CTEs; cosine leg = SQL_ANN_EXACT_TOPK's
# quantized dot/norm ranking; fusion = SQL_RRF_FUSION's integer //
SQL_HYBRID_EXACT = rf"""
WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS w
             FROM documents),
dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd,
             CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
      FROM dl),
tf AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
       WHERE w IN ('{SEARCH_TERMS[0]}', '{SEARCH_TERMS[1]}') GROUP BY 1, 2),
df AS (SELECT w, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
bm AS (SELECT tf.doc_id,
              CAST(FLOOR(LN((n.nd - df.df + 0.5) / (df.df + 0.5) + 1.0)
                   * ((CAST(tf.tf AS DOUBLE) * (1200000.0 / 1000000.0 + 1.0))
                      / (CAST(tf.tf AS DOUBLE)
                         + (1200000.0 / 1000000.0)
                           * (1.0 - 750000.0 / 1000000.0
                              + 750000.0 / 1000000.0
                                * CAST(dl.dl AS DOUBLE) / n.avgdl)))
                   * 1000000.0 + 0.5) AS BIGINT) AS s
       FROM tf JOIN dl USING (doc_id) JOIN df ON tf.w = df.w CROSS JOIN n),
bmr AS (SELECT doc_id, ROW_NUMBER() OVER
            (ORDER BY SUM(s) DESC, doc_id) AS r
        FROM bm GROUP BY doc_id QUALIFY r <= 30),
e AS (SELECT vec_id, unnest(embedding) AS v,
             unnest(range(1, len(embedding) + 1)) AS pos
      FROM embeddings),
q AS (SELECT pos, CAST(FLOOR(CAST(v AS DOUBLE) * 16384.0 + 0.5) AS BIGINT) AS qv
      FROM e WHERE vec_id = 0),
eq AS (SELECT vec_id, pos,
              CAST(FLOOR(CAST(v AS DOUBLE) * 16384.0 + 0.5) AS BIGINT) AS ev
       FROM e),
sc AS (SELECT eq.vec_id, CAST(SUM(ev * qv) AS BIGINT) AS dot_q,
              CAST(SUM(ev * ev) AS BIGINT) AS norm_q
       FROM eq JOIN q USING (pos) GROUP BY 1),
qn AS (SELECT CAST(SUM(qv * qv) AS BIGINT) AS nq FROM q),
cor AS (SELECT vec_id AS doc_id, ROW_NUMBER() OVER
            (ORDER BY CAST(dot_q AS DOUBLE)
                      / SQRT(CAST(norm_q AS DOUBLE) * CAST(qn.nq AS DOUBLE))
                      DESC, vec_id) AS r
        FROM sc CROSS JOIN qn WHERE norm_q > 0 QUALIFY r <= 30),
f AS (SELECT COALESCE(bmr.doc_id, cor.doc_id) AS doc_id,
             COALESCE(1000000000 // (60 + bmr.r), 0)
               + COALESCE(1000000000 // (60 + cor.r), 0) AS rrf_nano,
             COALESCE(bmr.r, 0) AS bm25_rank,
             COALESCE(cor.r, 0) AS cosine_rank
      FROM bmr FULL OUTER JOIN cor ON bmr.doc_id = cor.doc_id)
SELECT doc_id, CAST(rrf_nano AS BIGINT) AS rrf_nano,
       CAST(bm25_rank AS BIGINT) AS bm25_rank,
       CAST(cosine_rank AS BIGINT) AS cosine_rank
FROM f ORDER BY rrf_nano DESC, doc_id LIMIT 20
"""


def q_kwic(sf_dir: str):
    """Keyword-in-context snippets (stages/search.py: kwic_snippets —
    search-result rendering): 1-based char position of the first
    occurrence + a ±30-codepoint window. Pure map, zero shuffle;
    char-exact via the split/utf8_length position device and the
    reverse-slice-reverse window (pyarrow find_substring is
    byte-indexed and cannot mirror SQL strpos)."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    from rio_cogeo_ray.stages import search

    return search.kwic_snippets(ds, KWIC_NEEDLE, context=KWIC_CONTEXT)


SQL_KWIC = f"""
WITH m AS (SELECT doc_id, strpos(text, '{KWIC_NEEDLE}') AS p, text
           FROM documents WHERE strpos(text, '{KWIC_NEEDLE}') > 0)
SELECT doc_id, CAST(p AS BIGINT) AS pos,
       substr(text, GREATEST(p - {KWIC_CONTEXT}, 1),
              (p - GREATEST(p - {KWIC_CONTEXT}, 1))
                + {len(KWIC_NEEDLE)} + {KWIC_CONTEXT}) AS snippet
FROM m
"""

