"""Deduplication, decontamination and similarity-join queries.

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
from rio_cogeo_ray.pipelines.queries._common import BITEXT_MAX_DF, BITEXT_MIN_SHARED, CONTAM_REPORT_N, DECONTAM_N, EXACT_SPLIT_PCT, INTRA_W, JACCARD_TAU_PPM, SEG_W, SPLITS, _CANON_SQL, _PRIOR_PRED_SQL, _docs, _read


def q_dedup_keepers(sf_dir: str):
    """Exact dedup: min doc_id per distinct text (hash128 shuffle —
    equivalence to GROUP BY text modulo 2^-128 collisions)."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    return dedup.exact_dedup(ds, key_col="text", id_col="doc_id")


SQL_DEDUP_KEEPERS = "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text"


def q_dedup_stats(sf_dir: str):
    keep = dedup.exact_dedup(_docs(sf_dir, ["doc_id", "text"]), "text", "doc_id")
    distinct = keep.count()
    total = _docs(sf_dir, ["doc_id"]).count()
    return pa.table(
        {
            "distinct_texts": pa.array([distinct], pa.int64()),
            "total": pa.array([total], pa.int64()),
        }
    )


def q_dedup_incremental(sf_dir: str):
    """Incremental crawl dedup: keepers of the NEW crawl's distinct
    texts that are absent from the PRIOR snapshot (bloom of the new
    side prunes the prior side map-side; one bucketed exchange does
    the anti-membership check + within-new min-id dedup)."""
    from rio_cogeo_ray.stages.sketch import knuth32

    def _split(keep_prior: bool):
        def _fn(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
            is_prior = knuth32(ids) % np.uint64(10) < np.uint64(3)
            return t.filter(pa.array(is_prior if keep_prior else ~is_prior))

        return _fn

    docs = _docs(sf_dir, ["doc_id", "text"])
    new_ds = docs.map_batches(_split(False), batch_format="pyarrow")
    prior_ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _split(True), batch_format="pyarrow"
    )
    return dedup.incremental_dedup(new_ds, prior_ds, "text", "doc_id")


SQL_DEDUP_INCREMENTAL = f"""
WITH prior AS (SELECT text FROM documents WHERE {_PRIOR_PRED_SQL}),
     fresh AS (SELECT doc_id, text FROM documents WHERE NOT ({_PRIOR_PRED_SQL}))
SELECT MIN(doc_id) AS doc_id FROM fresh
WHERE text NOT IN (SELECT text FROM prior)
GROUP BY text
"""


def q_dup_ngrams(sf_dir: str):
    """Cross-document duplicated 5-grams per doc (Lee et al. 2021
    exact-substring signal): two linear shuffles, 128-bit rolling
    token-sequence hashes — text never enters the exchange."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    return text.cross_doc_ngrams(ds, n=5, min_docs=2)


SQL_DUP_NGRAMS = r"""
WITH w AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks FROM documents),
e AS (SELECT doc_id, toks, unnest(range(1, len(toks) - 3)) AS i FROM w),
g AS (SELECT DISTINCT doc_id, array_to_string(list_slice(toks, i, i + 4), ' ') AS gram FROM e),
d AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2)
SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS dup_ngrams
FROM g JOIN d USING (gram)
GROUP BY g.doc_id
"""


SQL_DEDUP_STATS = (
    "SELECT CAST(COUNT(DISTINCT text) AS BIGINT) AS distinct_texts, "
    "CAST(COUNT(*) AS BIGINT) AS total FROM documents"
)


def q_minhash_clusters(sf_dir: str):
    """MinHash-LSH near-dup clusters (shingle→minhash→band→bucket
    groupby→label propagation). No SQL mirror (iterative); pinned by
    pytest with planted near-duplicates."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    edges = dedup.lsh_candidate_edges(ds)
    return dedup.connected_components(edges, max_rounds=4)


def q_neardup_verified(sf_dir: str):
    """MinHash-LSH candidates + EXACT shingle-Jaccard verification
    before clustering (stages/dedup.py:text_neardup_verified — the full
    dedup-verify pipeline). No SQL mirror (iterative + LSH); pinned by
    pytest with a planted banding false positive that verification
    must prune."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    return dedup.text_neardup_verified(ds, threshold=0.5)


def q_simhash(sf_dir: str):
    """64-bit SimHash fingerprints + bands (deterministic; rows-only
    driver check, bit-level pins in pytest)."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(
        lambda t: dedup.simhash_band_rows(t), batch_format="pyarrow"
    )


def q_fingerprint(sf_dir: str):
    """Whitespace-normalized rolling-hash content fingerprints."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def _fp(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"].combine_chunks(),
                "fp": text.fingerprint64(t["text"].combine_chunks()),
            }
        )

    return ds.map_batches(_fp, batch_format="pyarrow")


def q_embed_neardup(sf_dir: str):
    """Embedding-cosine near-dup clusters (SRP-LSH → exact cosine
    verify ≥ 0.95 → connected components) over the embeddings table
    PLUS deterministic planted near-copies of the first 20 vectors
    (the driver embeddings are mutually distant, so the planted pairs
    are the known signal). Approximate/iterative ⇒ rows-only driver
    check; recall pinned in pytest (test_embedding_neardup_planted)."""
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    emb = _read(emb_path, ["vec_id", "embedding"])

    head = pq.read_table(emb_path, columns=["vec_id", "embedding"]).slice(0, 20)
    ids = head["vec_id"].to_numpy(zero_copy_only=False) + 10_000_000
    dup = pa.table({"vec_id": pa.array(ids, pa.int64()),
                    "embedding": head["embedding"]})
    both = emb.union(rd.from_arrow(dup))
    return dedup.embedding_neardup(both, threshold=0.95)


def q_decontam(sf_dir: str):
    """Benchmark decontamination (stages/dedup.py: decontaminate):
    drop training docs (source <> 'src0') whose 16-code-point text
    prefix appears in the eval set (source = 'src0'). Broadcast
    anti-join — eval keys ship once via ray.put; the training side is
    filtered in place with zero shuffle. SQL mirror: NOT EXISTS on the
    same substring key."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    path = os.path.join(sf_dir, "documents.parquet")
    train = rd.read_parquet(
        path, columns=["doc_id", "source", "text"], filter=pads.field("source") != "src0"
    )
    ev = rd.read_parquet(path, columns=["text"], filter=pads.field("source") == "src0")

    def _key(t: pa.Table) -> pa.Array:
        return pc.utf8_slice_codeunits(t["text"].combine_chunks(), start=0, stop=16)

    kept = dedup.decontaminate(train, ev, key_fn=_key)
    return kept.map_batches(
        lambda t: t.select(["doc_id", "source"]), batch_format="pyarrow"
    )


SQL_DECONTAM = (
    "SELECT d.doc_id, d.source FROM documents d WHERE d.source <> 'src0' "
    "AND NOT EXISTS (SELECT 1 FROM documents e WHERE e.source = 'src0' "
    "AND substring(e.text, 1, 16) = substring(d.text, 1, 16))"
)


def q_dedup_keep_best(sf_dir: str):
    """Quality-aware dedup: ONE representative per (lang, source)
    family — the longest document (n_chars desc, doc_id asc tie) — via
    the hash128 + map-side-argmax-partial path (dedup.exact_dedup_best:
    content never shuffles, ≤1 candidate row per group per batch)."""
    ds = _docs(sf_dir, ["doc_id", "lang", "source", "n_chars"])

    def _key(t: pa.Table) -> pa.Table:
        k = pa.compute.binary_join_element_wise(
            t["lang"].combine_chunks().cast(pa.string()),
            t["source"].combine_chunks().cast(pa.string()),
            "\x1f",
        )
        return pa.table(
            {
                "doc_id": t["doc_id"].combine_chunks(),
                "n_chars": t["n_chars"].combine_chunks(),
                "key": k,
            }
        )

    keyed = ds.map_batches(_key, batch_format="pyarrow")
    return dedup.exact_dedup_best(
        keyed, key_col="key", id_col="doc_id", score_cols=["n_chars"]
    )


SQL_DEDUP_KEEP_BEST = (
    "SELECT doc_id, n_chars FROM ("
    "SELECT doc_id, n_chars, ROW_NUMBER() OVER "
    "(PARTITION BY lang, source ORDER BY n_chars DESC, doc_id) AS rn "
    "FROM documents) WHERE rn = 1"
)


def q_exact_split(sf_dir: str):
    """Per-language EXACT-proportion eval split (stages/sketch.py:
    exact_group_split): exactly floor(n_lang·5%) docs per language go
    to eval, selected by knuth-hash rank — the per-group quota
    guarantee split_assign's pure-map threshold can't give. One slim
    hash(lang) exchange; payloads never move."""
    from rio_cogeo_ray.stages import sketch

    ds = _docs(sf_dir, ["doc_id", "lang"])
    return sketch.exact_group_split(ds, "lang", "doc_id", pct_eval=EXACT_SPLIT_PCT)


SQL_EXACT_SPLIT = f"""
WITH r AS (SELECT doc_id, lang,
            ROW_NUMBER() OVER (PARTITION BY lang
              ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS rk,
            COUNT(*) OVER (PARTITION BY lang) AS cnt
           FROM documents)
SELECT doc_id, lang,
       CASE WHEN rk <= cnt * {EXACT_SPLIT_PCT} // 100
            THEN 'eval' ELSE 'train' END AS split
FROM r
"""


def q_split_assign(sf_dir: str):
    """Deterministic train/val/test split (90/5/5 by id hash) — pure
    map-side, zero shuffle; no example ever migrates between splits
    under re-partitioning or re-runs."""
    from rio_cogeo_ray.stages import sketch

    ds = _docs(sf_dir, ["doc_id", "lang"])
    return sketch.split_assign(ds, "doc_id", SPLITS)


SQL_SPLIT_ASSIGN = (
    "SELECT doc_id, lang, CASE "
    "WHEN ((doc_id * 2654435761) % 4294967296) % 100 < 90 THEN 'train' "
    "WHEN ((doc_id * 2654435761) % 4294967296) % 100 < 95 THEN 'val' "
    "ELSE 'test' END AS split FROM documents"
)


def q_neardup_keepers(sf_dir: str):
    """Near-dup dedup in its consumable form (stages/dedup.py:
    neardup_keepers): corpus minus non-representative cluster members
    (verified LSH clusters collapse to min-id reps). Rows-only (LSH
    recall approximate); planted-dup keeper semantics pinned in pytest
    (test_ops.py::test_neardup_keepers_planted)."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    kept = dedup.neardup_keepers(ds, threshold=0.7, max_rounds=4, keep_cols=["doc_id"])
    return kept


def q_semantic_dedup(sf_dir: str):
    """SemDeDup (stages/ann.py: semantic_dedup — Abbas et al. 2023):
    k-means clusters the embeddings table, each cluster thinned by
    within-cluster cosine ≥ 0.99 with lower-id priority. Iterative fit
    + float cosine ⇒ rows-only; planted-duplicate keeper semantics and
    cross-partitioning determinism pinned in pytest."""
    ds = _read(
        os.path.join(sf_dir, "embeddings.parquet"), ["vec_id", "embedding"]
    )
    return ann.semantic_dedup(ds, n_clusters=16, threshold=0.99)


def q_semantic_decontam(sf_dir: str):
    """Semantic benchmark decontamination (stages/ann.py:
    semantic_decontam): every 97th embedding plays the eval set; the
    normalized eval matrix broadcasts once and the 'training' side
    streams through one stateless cosine filter (zero shuffle). The
    planted eval rows ARE in the corpus (cosine 1 with themselves) so
    they all drop at τ=0.999. Float cosine ⇒ rows-only; exact numpy
    brute-force equality pinned in pytest."""
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qt = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    mask = qt["vec_id"].to_numpy() % 97 == 0
    eval_vecs = np.array(
        qt.filter(pa.array(mask))["embedding"].to_pylist(), dtype=np.float64
    )
    ds = _read(emb_path, ["vec_id", "embedding"])
    kept = ann.semantic_decontam(ds, eval_vecs, threshold=0.999)
    return kept.map_batches(lambda t: t.select(["vec_id"]), batch_format="pyarrow")


def q_seg_dedup(sf_dir: str):
    """Corpus-wide segment-level dedup scrub (stages/text.py:
    segment_dedup — the CCNet/C4 "drop duplicated lines across the
    corpus" step over fixed 10-word windows): every segment keeps only
    its first (doc_id, sidx) occurrence, docs are reassembled from
    surviving segments. Text crosses the wire once (the re-join);
    winner selection exchanges 16-byte hashes only."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    return text.segment_dedup(ds, seg_words=SEG_W)


SQL_SEG_DEDUP = rf"""
WITH w AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks FROM documents),
n AS (SELECT doc_id, toks, CAST(CEIL(len(toks) / {SEG_W}.0) AS BIGINT) AS nseg FROM w),
s AS (SELECT doc_id, g AS sidx,
      array_to_string(list_slice(toks, g * {SEG_W} + 1, g * {SEG_W} + {SEG_W}), ' ') AS seg
      FROM n CROSS JOIN generate_series(0, 1023) gs(g) WHERE g < nseg),
k AS (SELECT doc_id, sidx, seg,
      ROW_NUMBER() OVER (PARTITION BY seg ORDER BY doc_id, sidx) AS rn FROM s)
SELECT doc_id, string_agg(seg, ' ' ORDER BY sidx) AS text_clean,
       CAST(COUNT(*) AS BIGINT) AS n_kept
FROM k WHERE rn = 1 GROUP BY doc_id
"""


def q_intradoc_dedup(sf_dir: str):
    """Within-document window dedup (stages/text.py: intra_doc_dedup —
    the C4 "span seen before in this doc" scrub): a 2-word window
    survives iff its token sequence did not occur earlier in the SAME
    doc. Pure map stage — zero shuffle at any corpus size (the
    duplicate test is row-local), unlike seg_dedup's global winner."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    return text.intra_doc_dedup(ds, seg_words=INTRA_W)


SQL_INTRADOC_DEDUP = rf"""
WITH w AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks FROM documents),
n AS (SELECT doc_id, toks, CAST(CEIL(len(toks) / {INTRA_W}.0) AS BIGINT) AS nseg FROM w),
s AS (SELECT doc_id, g AS sidx,
      array_to_string(list_slice(toks, g * {INTRA_W} + 1, g * {INTRA_W} + {INTRA_W}), ' ') AS seg
      FROM n CROSS JOIN generate_series(0, 1023) gs(g) WHERE g < nseg),
k AS (SELECT doc_id, sidx, seg,
      ROW_NUMBER() OVER (PARTITION BY doc_id, seg ORDER BY sidx) AS rn FROM s)
SELECT doc_id, string_agg(seg, ' ' ORDER BY sidx) AS text_clean,
       CAST(COUNT(*) AS BIGINT) AS n_kept
FROM k WHERE rn = 1 GROUP BY doc_id
"""


def q_decontam_ngram(sf_dir: str):
    """N-gram-overlap decontamination (stages/dedup.py:
    decontaminate_ngrams — the GPT-3/PaLM 13-gram recipe, n=5 here to
    bite on the short synthetic docs): drop training docs (source <>
    'src0') sharing ANY word 5-gram with the eval slice (source =
    'src0'). Eval grams reduce distributed → broadcast once; zero
    shuffle of the training side."""
    import pyarrow.dataset as pads

    path = os.path.join(sf_dir, "documents.parquet")
    train = rd.read_parquet(
        path, columns=["doc_id", "source", "text"], filter=pads.field("source") != "src0"
    )
    ev = rd.read_parquet(
        path, columns=["doc_id", "text"], filter=pads.field("source") == "src0"
    )
    kept = dedup.decontaminate_ngrams(train, ev, n=DECONTAM_N)
    return kept.map_batches(
        lambda t: t.select(["doc_id", "source"]), batch_format="pyarrow"
    )


SQL_DECONTAM_NGRAM = rf"""
WITH ew AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
            FROM documents WHERE source = 'src0'),
ee AS (SELECT toks, unnest(range(1, len(toks) - {DECONTAM_N - 2})) AS i FROM ew),
eg AS (SELECT DISTINCT array_to_string(list_slice(toks, i, i + {DECONTAM_N - 1}), ' ') AS gram FROM ee),
tw AS (SELECT doc_id, source, regexp_extract_all(text, '\S+') AS toks
       FROM documents WHERE source <> 'src0'),
te AS (SELECT doc_id, toks, unnest(range(1, len(toks) - {DECONTAM_N - 2})) AS i FROM tw),
tg AS (SELECT DISTINCT doc_id, array_to_string(list_slice(toks, i, i + {DECONTAM_N - 1}), ' ') AS gram FROM te),
bad AS (SELECT DISTINCT tg.doc_id FROM tg JOIN eg USING (gram))
SELECT d.doc_id, d.source FROM documents d
WHERE d.source <> 'src0' AND d.doc_id NOT IN (SELECT doc_id FROM bad)
"""


def q_bitext_candidates(sf_dir: str):
    """Bitext / comparable-corpus candidate mining (stages/simjoin.py:
    bitext_candidates): cross-language doc pairs sharing ≥ 2 rare
    tokens (df ≤ 4) — the Resnik & Smith web-as-parallel-corpus first
    stage. The fixture corpus has a tiny all-common vocabulary (every
    token's df ≫ max_df), so named entities are PLANTED
    deterministically from doc_id in both engines (the outlink-graph
    synthesis doctrine): docs congruent mod 331 share both entities and
    become candidates. Rare-token postings co-locate by token hash;
    bounded triangular pairs; one pair-keyed count."""
    from rio_cogeo_ray.stages import simjoin

    ds = _docs(sf_dir, ["doc_id", "lang", "text"])

    def _entities(t: pa.Table) -> pa.Table:
        d = t["doc_id"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )

        def _s(a):
            return pc.cast(pa.array(a, pa.int64()), pa.string())

        txt = pc.binary_join_element_wise(
            pc.fill_null(t["text"].combine_chunks().cast(pa.string()), ""),
            pa.scalar(" ent"),
            _s((d * 3) % 331),
            pa.scalar(" ent"),
            _s((d * 7) % 331),
            "",
        )
        return pa.table(
            {
                "doc_id": pa.array(d, pa.int64()),
                "lang": t["lang"].combine_chunks().cast(pa.string()),
                "text": txt,
            }
        )

    return simjoin.bitext_candidates(
        ds.map_batches(_entities, batch_format="pyarrow"),
        max_df=BITEXT_MAX_DF,
        min_shared=BITEXT_MIN_SHARED,
    )


SQL_BITEXT_CANDIDATES = rf"""
WITH d2 AS (SELECT doc_id, lang,
                   COALESCE(text, '') || ' ent' || (doc_id * 3) % 331
                     || ' ent' || (doc_id * 7) % 331 AS text
            FROM documents),
tok AS (SELECT DISTINCT doc_id, lang,
                    unnest(regexp_extract_all(text, '\S+')) AS w
             FROM d2),
df AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tok GROUP BY 1),
p AS (SELECT t.doc_id, t.lang, t.w FROM tok t JOIN df USING (w)
      WHERE df.df BETWEEN 2 AND {BITEXT_MAX_DF}),
pairs AS (SELECT CASE WHEN a.lang < b.lang
                   THEN a.doc_id ELSE b.doc_id END AS doc_a,
                 CASE WHEN a.lang < b.lang THEN b.doc_id ELSE a.doc_id END AS doc_b,
                 CASE WHEN a.lang < b.lang THEN a.lang ELSE b.lang END AS lang_a,
                 CASE WHEN a.lang < b.lang THEN b.lang ELSE a.lang END AS lang_b,
                 CAST(COUNT(*) AS BIGINT) AS shared
          FROM p a JOIN p b
            ON a.w = b.w AND a.lang <> b.lang AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4)
SELECT doc_a, doc_b, lang_a, lang_b, shared
FROM pairs WHERE shared >= {BITEXT_MIN_SHARED}
"""


def q_dup_rate_by_source(sf_dir: str):
    """Per-source duplicate-rate audit — WHERE is the redundancy coming
    from (the dedup-planning drill-down beside source_text_overlap's
    pair matrix): a doc is REDUNDANT iff its text occurs ≥2 times
    corpus-wide and the doc is not the min-id owner; report each
    source's doc count, redundant count, and exact ppm rate. Same
    boilerplate planting as source_text_overlap (every 7th doc).

    Scale shape: one hash(text)-keyed exchange of (hash128, doc,
    source) slim rows — all copies of a text co-locate, so owner and
    count are run-local — then one bounded per-source sum; text never
    shuffles (the doc_novelty shape with gram = whole doc)."""
    import polars as pl

    from rio_cogeo_ray.functions.hashing import splitmix64

    ds = _docs(sf_dir, ["doc_id", "source", "text"])

    def _rows(t: pa.Table) -> pa.Table:
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
        b = (splitmix64(h1) % np.uint64(16)).astype(np.int64)
        return pa.table(
            {
                "doc": pa.array(d, pa.int64()),
                "source": t["source"].combine_chunks().cast(pa.string()),
                "h1": pa.array(h1.astype(np.int64), pa.int64()),
                "h2": pa.array(h2.astype(np.int64), pa.int64()),
                "__bucket": pa.array(b, pa.int64()),
            }
        )

    def _flags(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "source": pa.array([], pa.string()),
                "red": pa.array([], pa.int64()),
            }
        )
        if not g.num_rows or "h1" not in g.column_names:
            return empty
        g = g.sort_by(
            [("h1", "ascending"), ("h2", "ascending"), ("doc", "ascending")]
        )
        h1 = g["h1"].combine_chunks().to_numpy(zero_copy_only=False)
        h2 = g["h2"].combine_chunks().to_numpy(zero_copy_only=False)
        doc = g["doc"].combine_chunks().to_numpy(zero_copy_only=False)
        start = np.r_[True, (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])]
        run = np.cumsum(start) - 1
        cnt = np.bincount(run)
        owner = doc[np.flatnonzero(start)]
        red = ((cnt[run] > 1) & (doc != owner[run])).astype(np.int64)
        return pa.table(
            {
                "source": g["source"].combine_chunks(),
                "red": pa.array(red, pa.int64()),
            }
        )

    flags = (
        ds.map_batches(_rows, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda g: _flags(g.drop_columns(["__bucket"])), batch_format="pyarrow")
    )
    aggd = agg.partial_group_agg(
        flags, keys=["source"], sum_cols=["red"], count_as="n_docs", n_buckets=8
    )

    def _fin(t: pa.Table) -> pa.Table:
        red = t["sum_red"].combine_chunks().to_numpy(zero_copy_only=False)
        n = t["n_docs"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "source": t["source"].combine_chunks(),
                "n_docs": pa.array(n.astype(np.int64), pa.int64()),
                "n_redundant": pa.array(red.astype(np.int64), pa.int64()),
                "dup_ppm": pa.array(
                    red.astype(np.int64) * 1_000_000 // np.maximum(n, 1),
                    pa.int64(),
                ),
            }
        )

    return aggd.map_batches(_fin, batch_format="pyarrow")


SQL_DUP_RATE_BY_SOURCE = """
WITH d0 AS (SELECT doc_id, source,
                   CASE WHEN doc_id % 7 = 0
                        THEN 'boilerplate page ' || doc_id % 3
                        ELSE COALESCE(text, '') END AS text
            FROM documents),
o AS (SELECT text, MIN(doc_id) AS owner, COUNT(*) AS cnt FROM d0 GROUP BY 1),
f AS (SELECT d0.source,
             CASE WHEN o.cnt > 1 AND d0.doc_id <> o.owner THEN 1 ELSE 0 END AS red
      FROM d0 JOIN o USING (text))
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(red) AS BIGINT) AS n_redundant,
       CAST(SUM(red) * 1000000 // COUNT(*) AS BIGINT) AS dup_ppm
FROM f GROUP BY source
"""


def q_editdist_pairs(sf_dir: str):
    """Edit-distance-1 fuzzy label self-join (stages/fuzzy.py:
    editdist1_self_join — exact deletion-neighborhood blocking, the
    FastSS/SymSpell device distributed): all pairs of distinct
    lang-source labels one typo apart, with each side's doc count.
    Zero false negatives (the blocking is exact for k=1), so the
    DuckDB levenshtein(a,b)=1 brute-force self-join mirrors it
    hash-exact. Labels distinct-collapse first — every stage after the
    first exchange is vocabulary-bounded."""
    ds = _docs(sf_dir, ["lang", "source"])

    def _label(t: pa.Table) -> pa.Table:
        lab = pc.binary_join_element_wise(
            t["lang"].combine_chunks().cast(pa.string()),
            t["source"].combine_chunks().cast(pa.string()),
            "-",
        )
        return pa.table({"k": lab})

    from rio_cogeo_ray.stages import fuzzy

    return fuzzy.editdist1_self_join(
        ds.map_batches(_label, batch_format="pyarrow"), "k"
    )


SQL_EDITDIST_PAIRS = """
WITH lbl AS (SELECT lang || '-' || source AS k, CAST(COUNT(*) AS BIGINT) AS n
             FROM documents GROUP BY 1)
SELECT x.k AS a, y.k AS b, x.n AS n_a, y.n AS n_b
FROM lbl x JOIN lbl y ON x.k < y.k AND levenshtein(x.k, y.k) = 1
"""


def q_contam_report(sf_dir: str):
    """Contamination COVERAGE report (stages/dedup.py:
    contamination_report — the GPT-3 appendix-C analysis companion to
    decontam_ngram's removal): for each eval doc (source = 'src0'),
    the fraction of its distinct word 4-grams that appear anywhere in
    the training split (source <> 'src0'), in exact integer ppm.
    Training side streams through a broadcast membership probe with
    ZERO shuffle; driver state is O(eval grams)."""
    import pyarrow.dataset as pads

    path = os.path.join(sf_dir, "documents.parquet")
    train = rd.read_parquet(
        path, columns=["doc_id", "text"], filter=pads.field("source") != "src0"
    )
    ev = rd.read_parquet(
        path, columns=["doc_id", "text"], filter=pads.field("source") == "src0"
    )
    return dedup.contamination_report(train, ev, n=CONTAM_REPORT_N)


SQL_CONTAM_REPORT = rf"""
WITH ew AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
            FROM documents WHERE source = 'src0'),
ee AS (SELECT doc_id, toks, unnest(range(1, len(toks) - {CONTAM_REPORT_N - 2})) AS i FROM ew),
eg AS (SELECT DISTINCT doc_id, array_to_string(list_slice(toks, i, i + {CONTAM_REPORT_N - 1}), ' ') AS gram FROM ee),
tw AS (SELECT regexp_extract_all(text, '\S+') AS toks
       FROM documents WHERE source <> 'src0'),
te AS (SELECT toks, unnest(range(1, len(toks) - {CONTAM_REPORT_N - 2})) AS i FROM tw),
tg AS (SELECT DISTINCT array_to_string(list_slice(toks, i, i + {CONTAM_REPORT_N - 1}), ' ') AS gram FROM te)
SELECT eg.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(COUNT(t.gram) AS BIGINT) AS n_hit,
       CAST(COUNT(t.gram) * 1000000 // COUNT(*) AS BIGINT) AS coverage_ppm
FROM eg LEFT JOIN tg t USING (gram)
GROUP BY eg.doc_id
"""


def q_url_dedup(sf_dir: str):
    """Canonical-URL crawl dedup (stages/text.py:canonicalize_urls —
    the C4/CC URL-frontier rule): deterministic synthetic urls derived
    from doc_id (mirrored literally in SQL; the corpus has no url
    column) carry scheme / host-case / query / fragment / trailing-
    slash noise; canonicalization is a stateless map, then ONE bucketed
    exchange of (canon, partial-min, partial-count) rows keeps the
    smallest doc_id per canonical key — urls themselves never shuffle
    beyond the per-batch partial reduce."""
    docs = _docs(sf_dir, ["doc_id"])
    junk_choices = pa.array(["", "/", "?utm=1", "#frag", "?a=1#b"])

    def _synth_canon(t: pa.Table) -> pa.Table:
        did = t["doc_id"]
        if isinstance(did, pa.ChunkedArray):
            did = did.combine_chunks()
        d = did.to_numpy(zero_copy_only=False)
        k = d % 97
        scheme = pc.if_else(
            pc.equal(pc.bit_wise_and(did, 1), pa.scalar(0, pa.int64())),
            pa.scalar("http"),
            pa.scalar("https"),
        )
        wcase = pa.array(np.where(d % 4 < 2, "w", "W"))
        url = pc.binary_join_element_wise(
            scheme,
            "://",
            wcase,
            pa.array(k.astype(str)),
            ".site.com/p",
            pa.array((k % 7).astype(str)),
            junk_choices.take(pa.array(d % 5)),
            "",
        )
        out = text.canonicalize_urls(pa.table({"doc_id": did, "url": url}))
        return out.drop_columns(["url"])

    canon = docs.map_batches(_synth_canon, batch_format="pyarrow")
    per_key = agg.partial_group_agg(
        canon, keys=["canon"], min_cols=["doc_id"], count_as="n_dups"
    )
    return per_key.map_batches(
        lambda t: pa.table(
            {
                "canon": t["canon"],
                "keeper_id": t["min_doc_id"],
                "n_dups": t["n_dups"],
            }
        ),
        batch_format="pyarrow",
    )


SQL_URL_DEDUP = (
    "WITH u AS (SELECT doc_id, "
    "(CASE WHEN (doc_id & 1) = 0 THEN 'http' ELSE 'https' END) || '://' || "
    "(CASE WHEN doc_id % 4 < 2 THEN 'w' ELSE 'W' END) || "
    "CAST(doc_id % 97 AS VARCHAR) || '.site.com/p' || "
    "CAST((doc_id % 97) % 7 AS VARCHAR) || "
    "(CASE doc_id % 5 WHEN 0 THEN '' WHEN 1 THEN '/' WHEN 2 THEN '?utm=1' "
    "WHEN 3 THEN '#frag' ELSE '?a=1#b' END) AS url FROM documents), "
    f"c AS (SELECT doc_id, {_CANON_SQL} AS canon FROM u) "
    "SELECT canon, CAST(MIN(doc_id) AS BIGINT) AS keeper_id, "
    "CAST(COUNT(*) AS BIGINT) AS n_dups FROM c GROUP BY canon"
)


def q_dup_span_scrub(sf_dir: str):
    """Exact duplicated-span scrub (stages/text.py:dup_span_scrub — the
    removal half of Lee et al. 2021's exact substring dedup; dup_ngrams
    is the signal half): every token covered by a 5-gram that appears
    in ≥2 documents is removed, except in the gram's keeper (min
    doc_id). Dup-gram discovery is cross_doc_ngrams' bucketed exchange;
    the bounded (gram, keeper) table broadcasts once and ONE corpus
    pass rebuilds the scrubbed text map-side."""
    from rio_cogeo_ray.stages.text import dup_span_scrub

    ds = _docs(sf_dir, ["doc_id", "text"])
    return dup_span_scrub(ds, n=5, min_docs=2)


SQL_DUP_SPAN_SCRUB = r"""
WITH w AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks FROM documents),
e AS (SELECT doc_id, toks, unnest(range(1, len(toks) - 3)) AS i FROM w),
g AS (SELECT doc_id, i, array_to_string(list_slice(toks, i, i + 4), ' ') AS gram FROM e),
d AS (SELECT gram, MIN(doc_id) AS keeper
      FROM (SELECT DISTINCT doc_id, gram FROM g)
      GROUP BY gram HAVING COUNT(*) >= 2),
cov AS (SELECT DISTINCT g.doc_id, g.i + u.off AS p
        FROM g JOIN d USING (gram)
        CROSS JOIN (SELECT unnest(range(0, 5)) AS off) u
        WHERE g.doc_id <> d.keeper),
t1 AS (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS pos FROM w),
tok AS (SELECT doc_id, pos, toks[pos] AS tok FROM t1),
res AS (SELECT tok.doc_id,
               string_agg(tok.tok, ' ' ORDER BY tok.pos) FILTER (cov.p IS NULL) AS text,
               CAST(COUNT(*) FILTER (cov.p IS NOT NULL) AS BIGINT) AS n_removed
        FROM tok LEFT JOIN cov ON cov.doc_id = tok.doc_id AND cov.p = tok.pos
        GROUP BY tok.doc_id)
SELECT d0.doc_id, COALESCE(res.text, '') AS text,
       COALESCE(res.n_removed, 0) AS n_removed
FROM (SELECT doc_id FROM documents) d0 LEFT JOIN res USING (doc_id)
"""


def q_bitext_align(sf_dir: str):
    """Sentence alignment over the bitext CANDIDATE pairs (stages/
    simjoin.py: align_candidate_pairs — the Gale-Church-core step
    after q_bitext_candidates): per candidate doc pair, the monotone
    1-1 sentence alignments by Needleman-Wunsch over raw sentence
    lengths (insertions/deletions skip; see the raw-vs-ratio cost
    note). Iterative DP ⇒ rows-only; semantics pinned in pytest."""
    from rio_cogeo_ray.stages.simjoin import align_candidate_pairs

    pairs = q_bitext_candidates(sf_dir)
    docs = _docs(sf_dir, ["doc_id", "text"])
    return align_candidate_pairs(pairs, docs)


def q_jaccard_pairs(sf_dir: str):
    """EXACT set-similarity self-join (stages/simjoin.py — prefix
    filtering, AllPairs/PPJoin family): every doc pair whose distinct
    whitespace-token sets have Jaccard >= 0.8, with integer-exact
    (inter, uni, jac_ppm). Unlike minhash_clusters this has zero false
    negatives, which is what makes it SQL-mirrorable. Subset to
    doc_id % 4 == 0 so the quadratic pair set inside planted duplicate
    clusters stays test-sized (the operator itself takes the full
    corpus)."""
    from rio_cogeo_ray.stages import simjoin

    def _subset(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        return t.filter(pa.array((ids % 4) == 0))

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _subset, batch_format="pyarrow"
    )
    return simjoin.jaccard_self_join(ds, tau_ppm=JACCARD_TAU_PPM)


SQL_JACCARD_PAIRS = (
    r"WITH tok AS (SELECT DISTINCT doc_id, unnest(regexp_extract_all(text, '\S+')) AS token "
    "FROM documents WHERE doc_id % 4 = 0), "
    "sz AS (SELECT doc_id, COUNT(*) AS size FROM tok GROUP BY doc_id), "
    "i AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter "
    "FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id GROUP BY 1, 2) "
    "SELECT id_a, id_b, inter, sa.size + sb.size - inter AS uni, "
    "(1000000 * inter) // (sa.size + sb.size - inter) AS jac_ppm "
    "FROM i JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b "
    f"WHERE 1000000 * inter >= {JACCARD_TAU_PPM} * (sa.size + sb.size - inter)"
)


def q_neardup_ingest(sf_dir: str):
    """Incremental near-dup crawl ingest (stages/dedup.py:
    build_band_index + neardup_ingest): the even-doc_id half of the
    corpus is the persisted band index; the odd half arrives as a
    crawl delta and reports (new_id, dup_of, n_band_hits) for every
    delta doc sharing an LSH bucket with the index. Rows-only (LSH
    banding is not SQL-expressible); the planted-dup pytest pins exact
    match behavior across generations."""
    import hashlib

    from rio_cogeo_ray.stages import dedup as dedup_mod

    ds = _docs(sf_dir, ["doc_id", "text"])

    def _half(par: int):
        def _f(t: pa.Table) -> pa.Table:
            d = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
            return t.filter(pa.array(d % 2 == par))

        return _f

    # deterministic per-sf_dir cache (the _text_index_dir doctrine):
    # repeated driver/selfcheck/fuzz calls reuse one index instead of
    # leaking a fresh mkdtemp tree per invocation
    doc_path = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(doc_path)
    tag = hashlib.sha256(
        f"{doc_path}:{st.st_size}:{st.st_mtime_ns}".encode()
    ).hexdigest()[:12]
    idx = f"/tmp/rcr_bandidx/{tag}"
    if not os.path.exists(os.path.join(idx, dedup_mod.BAND_INDEX_MANIFEST)):
        # build ASIDE into a per-process dir and promote atomically —
        # two concurrent builders must never interleave inside one
        # fixed tmp path (the check-then-build race would poison the
        # stat-keyed cache permanently); the race loser discards its
        # own build
        import shutil
        import uuid

        build = f"/tmp/rcr_bandidx/.build-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        dedup_mod.build_band_index(
            ds.map_batches(_half(0), batch_format="pyarrow"), build
        )
        try:
            os.replace(build, idx)
        except OSError:
            shutil.rmtree(build, ignore_errors=True)  # lost the race
    return dedup_mod.neardup_ingest(
        ds.map_batches(_half(1), batch_format="pyarrow"),
        idx,
        "delta1",
        append=False,
    )

