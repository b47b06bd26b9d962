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
    parallelism-invariant. Float idf ⇒ rows-only; exact brute-force
    oracle pinned in pytest (test_bm25_vs_bruteforce)."""
    from rio_cogeo_ray.stages import search

    return search.bm25_search(_text_index_dir(sf_dir), list(SEARCH_TERMS), k=20)


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

