"""Embedding / ANN / clustering / classifier / multimodal queries.

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
from rio_cogeo_ray.pipelines.queries._common import ANN_K, ANN_QUERY_IDS, _docs, _read


def q_similarity_join(sf_dir: str):
    """R–S set-similarity join (PAPERS.md ICDE 2020 shape): near-dup
    pairs ACROSS the even-doc_id and odd-doc_id halves of the corpus
    at shingle-Jaccard ≥ 0.6. LSH candidate recall is approximate ⇒
    rows-only; zero false positives (exact verify) and planted-pair
    recall pinned in pytest (test_ops.py)."""

    def _half(parity: int):
        def _fn(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
            return t.filter(pa.array((ids % 2) == parity))

        return _fn

    left = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _half(0), batch_format="pyarrow"
    )
    right = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _half(1), batch_format="pyarrow"
    )
    return dedup.text_similarity_join(left, right, threshold=0.6)


def q_ann_cosine(sf_dir: str):
    """Brute-force cosine top-10 per query vector (queries = embeddings
    of vec_id 0..2, broadcast; one matmul per batch + exact merge)."""
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qt = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    mask = np.isin(qt["vec_id"].to_numpy(), ANN_QUERY_IDS)
    qrows = qt.filter(pa.array(mask)).sort_by("vec_id")
    queries = np.array(qrows["embedding"].to_pylist(), dtype=np.float64)
    ds = _read(emb_path, ["vec_id", "embedding"])
    # query row index == vec_id because ANN_QUERY_IDS are 0..2 sorted
    res = ann.knn_cosine(ds, queries, k=ANN_K, concurrency=2)
    ranked = knn.per_group_topk(
        res, "query_id", [("score", False), ("vec_id", True)], ANN_K, rank_col="rnk"
    )
    return ranked.map_batches(
        lambda t: t.select(["query_id", "vec_id", "rnk"]), batch_format="pyarrow"
    )


def q_ann_exact_topk(sf_dir: str):
    """SQL-exact similarity search (stages/ann.py:
    knn_cosine_quantized): cosine top-10 for the vec_id=0 query over
    INTEGER-QUANTIZED embeddings — both engines floor every float to
    int(v·2^14 + 0.5) first, so dot/norm are exact integer sums and the
    ranking key dot/sqrt(norm·qnorm) is the same double from the same
    integers (the engine's promote-to-SQL-exact doctrine applied to
    ANN; ann_cosine stays the float rows-only baseline)."""
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qt = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    qrows = qt.filter(pc.equal(qt["vec_id"], 0))["embedding"].to_pylist()
    if not qrows:
        return pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "dot_q": pa.array([], pa.int64()),
                "norm_q": pa.array([], pa.int64()),
            }
        )
    qvec = np.asarray(qrows[0], dtype=np.float64)
    ds = _read(emb_path, ["vec_id", "embedding"])
    return ann.knn_cosine_quantized(ds, qvec, k=10)


SQL_ANN_EXACT_TOPK = """
WITH e AS (SELECT vec_id, unnest(embedding) AS v,
                  unnest(range(1, len(embedding) + 1)) AS pos
           FROM embeddings),
q AS (SELECT pos, CAST(FLOOR(CAST(v AS DOUBLE) * 16384.0 + 0.5) AS BIGINT) AS qv
      FROM e WHERE vec_id = 0),
eq AS (SELECT vec_id, pos,
              CAST(FLOOR(CAST(v AS DOUBLE) * 16384.0 + 0.5) AS BIGINT) AS ev
       FROM e),
s AS (SELECT eq.vec_id, CAST(SUM(ev * qv) AS BIGINT) AS dot_q,
             CAST(SUM(ev * ev) AS BIGINT) AS norm_q
      FROM eq JOIN q USING (pos) GROUP BY 1),
qn AS (SELECT CAST(SUM(qv * qv) AS BIGINT) AS n FROM q)
SELECT vec_id, dot_q, norm_q FROM s, qn WHERE norm_q > 0
ORDER BY CAST(dot_q AS DOUBLE) / SQRT(CAST(norm_q AS DOUBLE) * CAST(qn.n AS DOUBLE)) DESC,
         vec_id
LIMIT 10
"""


def q_kmeans_clusters(sf_dir: str):
    """Distributed spherical k-means over the embeddings table (the
    corpus never leaves Ray: per-batch partial sums → bounded tree
    merge → k×d driver update per iteration), then cluster sizes.
    Iterative/approximate ⇒ rows-only; planted-cluster recovery and
    determinism pinned in pytest (test_ops.py)."""
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    ds = _read(emb_path, ["vec_id", "embedding"])
    c = ann.kmeans_fit(ds, k=8, iters=5, sample_n=512)
    assigned = ann.ivf_assign(_read(emb_path, ["vec_id", "embedding"]), c, concurrency=2)
    from rio_cogeo_ray.stages.agg import partial_group_agg

    return partial_group_agg(
        assigned.select_columns(["bucket"]), keys=["bucket"], count_as="n"
    )


def q_ann_pq(sf_dir: str):
    """Product-quantized ANN (Jégou et al. 2011): 64-dim floats →
    8 uint8 codes per row; search is per-query LUT gathers over the
    coded rows. Approximate ⇒ rows-only; recall vs exact pinned in
    pytest (test_ops.py)."""
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qt = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    emb = np.array(qt["embedding"].to_pylist(), dtype=np.float64)
    books = ann.train_pq_codebooks(emb[: min(len(emb), 2000)], n_sub=8)
    mask = np.isin(qt["vec_id"].to_numpy(), ANN_QUERY_IDS)
    queries = np.array(
        qt.filter(pa.array(mask)).sort_by("vec_id")["embedding"].to_pylist(),
        dtype=np.float64,
    )
    ds = _read(emb_path, ["vec_id", "embedding"])
    res = ann.knn_cosine_pq(ds, queries, books, k=ANN_K, concurrency=2, rerank=4)
    ranked = knn.per_group_topk(
        res, "query_id", [("score", False), ("vec_id", True)], ANN_K, rank_col="rnk"
    )
    return ranked.map_batches(
        lambda t: t.select(["query_id", "vec_id", "rnk"]), batch_format="pyarrow"
    )


SQL_ANN_COSINE = (
    f"WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings "
    f"WHERE vec_id IN (0, 1, 2)) "
    "SELECT query_id, vec_id, rnk FROM ("
    "SELECT q.query_id, e.vec_id, CAST(ROW_NUMBER() OVER (PARTITION BY q.query_id "
    "ORDER BY list_cosine_similarity(e.embedding, q.qe) DESC, e.vec_id) AS BIGINT) AS rnk "
    "FROM embeddings e CROSS JOIN q) "
    f"WHERE rnk <= {ANN_K}"
)


def q_ann_ivf(sf_dir: str):
    """IVF-bucketed approximate cosine kNN (the ANN scale path): k-means
    centroids on a sample, probe the top-3 buckets. Approximate ⇒
    rows-only driver check; recall pinned vs brute force in pytest."""
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qt = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    emb = np.array(qt["embedding"].to_pylist(), dtype=np.float64)
    cents = ann.train_centroids(emb[: min(len(emb), 1000)], 8)
    queries_m = emb[:3]
    ds = _read(emb_path, ["vec_id", "embedding"])
    return ann.knn_cosine_ivf(ds, queries_m, cents, k=ANN_K, n_probe=3, concurrency=2)


def q_ann_ivf_indexed(sf_dir: str):
    """ANN over a PERSISTED bucket-partitioned IVF index (the I/O-level
    pruning path — only probed bucket directories are read). Index built
    once per sf_dir under /tmp (cached); same centroids protocol as
    q_ann_ivf. Approximate ⇒ rows-only; layout equivalence to the filter
    path pinned by test_ann_ivf_indexed_matches_filter_path."""
    import hashlib

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qt = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    emb = np.array(qt["embedding"].to_pylist(), dtype=np.float64)
    cents = ann.train_centroids(emb[: min(len(emb), 1000)], 8)
    queries_m = emb[:3]

    st = os.stat(emb_path)
    tag = hashlib.sha256(
        f"{emb_path}:{st.st_size}:{st.st_mtime_ns}".encode()
    ).hexdigest()[:12]
    idx_dir = f"/tmp/rcr_ivf_index/{tag}"
    if not os.path.isdir(os.path.join(idx_dir, "vectors")):
        ann.build_ivf_index(
            _read(emb_path, ["vec_id", "embedding"]), idx_dir, cents, concurrency=2
        )
    return ann.knn_cosine_ivf_indexed(
        idx_dir, queries_m, k=ANN_K, n_probe=3, concurrency=2
    )


def q_media_stats(sf_dir: str):
    """Multimodal feature extraction as a first-class pipeline: synth
    media corpus → ImageFeatures actor pool (PIL when present, byte-fold
    stub otherwise — identical output here since the container has no
    PIL) → per-media-type quantized feature sums. Deterministic int64
    output; no SQL oracle (binary codec) — pinned by a pytest oracle
    (tests/test_multimodal_cli.py::test_media_stats_query_oracle)."""
    from rio_cogeo_ray.stages import multimodal

    t = multimodal.synth_media(2000)
    ds = rd.from_arrow(t).repartition(8)
    feats = multimodal.image_features(ds, concurrency=2, batch_size=128)

    def _quant(tb: pa.Table) -> pa.Table:
        f = tb["features"].combine_chunks()
        vals = f.flatten().to_numpy(zero_copy_only=False).reshape(len(tb), -1)
        q = np.floor(vals.astype(np.float64) * 1024.0 + 0.5).astype(np.int64).sum(axis=1)
        return pa.table(
            {
                "media_type": tb["media_type"].combine_chunks(),
                "qsum": pa.array(q, pa.int64()),
            }
        )

    qd = feats.map_batches(_quant, batch_format="pyarrow")
    return agg.partial_group_agg(qd, keys=["media_type"], sum_cols=["qsum"], count_as="n")


def q_media_frames(sf_dir: str):
    """Audio frame-sampling pipeline (vectorized binary-window explode,
    stages/multimodal.py:AudioFrames) → per-media frame counts summed —
    deterministic ints; no SQL oracle (binary payloads); the explode
    kernel itself is pinned by a row-loop oracle pytest."""
    from ray.data.aggregate import Max, Sum

    from rio_cogeo_ray.stages import multimodal

    t = multimodal.synth_media(2000)
    ds = rd.from_arrow(t).repartition(8)
    frames = multimodal.audio_frames(ds, concurrency=2, batch_size=128)

    def _stats(tb: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "frames": pa.array([len(tb)], pa.int64()),
                "bytes": pa.array(
                    [int(pc.sum(pc.binary_length(tb["frame"])).as_py() or 0)],
                    pa.int64(),
                ),
                "max_idx": pa.array(
                    [int(pc.max(tb["frame_idx"]).as_py() or 0)], pa.int64()
                ),
            }
        )

    agged = frames.map_batches(_stats, batch_format="pyarrow").aggregate(
        Sum("frames"), Sum("bytes"), Max("max_idx")
    )
    return pa.table(
        {
            "n_frames": pa.array([int(agged["sum(frames)"])], pa.int64()),
            "frame_bytes": pa.array([int(agged["sum(bytes)"])], pa.int64()),
            "max_frame_idx": pa.array([int(agged["max(max_idx)"])], pa.int64()),
        }
    )


def q_video_frames(sf_dir: str):
    """Video frame-sampling pipeline (stages/multimodal.py:
    VideoFrames — uniform temporal indices over opaque binary payloads,
    decode stubbed, plumbing real): per-media sampled-frame count + max
    timestamp. Deterministic ints; no SQL oracle (binary payloads);
    the sampling kernel is pinned by a row-loop oracle pytest."""
    from ray.data.aggregate import Count, Max

    from rio_cogeo_ray.stages import multimodal

    t = multimodal.synth_video(2000)
    ds = rd.from_arrow(t).repartition(8)
    frames = multimodal.video_frames(ds, concurrency=2, batch_size=128)
    out = frames.groupby("media_id").aggregate(
        Count(), Max("ts_ms")
    )
    return out


def q_quality_classifier(sf_dir: str):
    """Hashed bag-of-words ridge quality classifier (stages/
    classifier.py — the CCNet/GPT-3 seed-classifier corpus filter):
    fit on deterministic seed labels (label 1 ⟺ lang = 'en': a
    learnable vocabulary signal in the synthetic corpus), then score
    EVERY doc with the broadcast weights in one zero-shuffle map.
    Float margins (reduction-order ulps) ⇒ rows-only; exact numpy
    normal-equations oracle pinned in pytest
    (test_ridge_fit_matches_numpy)."""
    from rio_cogeo_ray.stages import classifier

    docs = _docs(sf_dir, ["doc_id", "text", "lang"])

    def _label(t: pa.Table) -> pa.Table:
        lab = pc.cast(pc.equal(t["lang"], "en"), pa.float64())
        return t.drop_columns(["lang"]).append_column("label", lab)

    seed = docs.map_batches(_label, batch_format="pyarrow")
    w = classifier.ridge_fit(seed, "label", n_features=128)
    return classifier.score(
        _docs(sf_dir, ["doc_id", "text"]), w, id_col="doc_id"
    )


def q_media_phash(sf_dir: str):
    """Perceptual-hash image near-dup clusters (stages/multimodal.py:
    image_phash_neardup): decode/feature actor pool → 64-bit aHash →
    4×16-bit pigeonhole bands → exact hamming ≤ 3 verify → connected
    components. Synth corpus with planted exact dups (ids 5000+i copy
    payload of i·7, i<24) so the pipeline provably clusters. Binary
    codec ⇒ rows-only; planted-dup semantics pinned in pytest."""
    from rio_cogeo_ray.stages import multimodal

    t = multimodal.synth_media(2000)
    src = [int(i * 7) for i in range(24)]
    pays = [t["payload"][s].as_py() for s in src]
    extra = pa.table(
        {
            "media_id": pa.array([5000 + i for i in range(24)], pa.int64()),
            "media_type": pa.array(["image/png"] * 24, pa.string()),
            "payload": pa.array(pays, pa.binary()),
            "width": pa.array([64] * 24, pa.int32()),
            "height": pa.array([64] * 24, pa.int32()),
            "sample_rate": pa.array([0] * 24, pa.int32()),
        }
    )
    ds = rd.from_arrow(pa.concat_tables([t, extra])).repartition(8)
    return multimodal.image_phash_neardup(ds)


def q_pca_embed(sf_dir: str):
    """Distributed PCA (stages/ann.py: pca_fit/pca_project): exact
    covariance from one streaming pass of d²-sized moment partials →
    driver eigh → broadcast projection onto the top-4 components.
    Float eigendecomposition ⇒ rows-only; numpy full-matrix oracle
    pinned in pytest (fit AND projected values to 1e-6)."""
    ds = _read(
        os.path.join(sf_dir, "embeddings.parquet"), ["vec_id", "embedding"]
    )
    mean, w, _ = ann.pca_fit(ds, k=4)
    return ann.pca_project(ds, mean, w)


def q_embed_dim_stats(sf_dir: str):
    """Per-(label, dimension) embedding feature stats (stages/ann.py:
    embedding_dim_stats): exact micro-unit n/sum/min/max per dim — the
    feature-drift audit and the FIRST SQL-exact surface over the
    embeddings table (the ann family is rows-only by nature). Map-side
    64× collapse → one bounded merge."""
    from rio_cogeo_ray.stages import ann

    ds = _read(
        os.path.join(sf_dir, "embeddings.parquet"), ["label", "embedding"]
    )
    return ann.embedding_dim_stats(ds)


SQL_EMBED_DIM_STATS = """
WITH e AS (SELECT label, embedding,
                  unnest(range(1, len(embedding) + 1)) AS dim
           FROM embeddings),
u AS (SELECT CAST(label AS BIGINT) AS label, dim,
             CAST(floor(CAST(embedding[dim] AS DOUBLE) * 1000000) AS BIGINT) AS q
      FROM e)
SELECT label, dim, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(q) AS BIGINT) AS sum_q, MIN(q) AS min_q, MAX(q) AS max_q
FROM u GROUP BY 1, 2
"""


def q_lang_wmedian(sf_dir: str):
    """Exact weighted median per language (stages/sketch.py:
    grouped_weighted_median): the median TOKEN COUNT weighted by each
    doc's character mass — "the length of the doc the average
    CHARACTER lives in", the size-biased statistic an unweighted
    median understates. One slim hash(lang) exchange, lexsort +
    segmented cumsum, lower-median (value, doc_id) tiebreak."""
    ds = _docs(sf_dir, ["doc_id", "lang", "text", "n_chars"])

    def _vw(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t["text"].combine_chunks().cast(pa.string()), "")
        return pa.table(
            {
                "lang": t["lang"].combine_chunks().cast(pa.string()),
                "v": text.token_count(txt),
                "w": t["n_chars"].combine_chunks().cast(pa.int64()),
                "doc_id": t["doc_id"].combine_chunks().cast(pa.int64()),
            }
        )

    from rio_cogeo_ray.stages import sketch

    return sketch.grouped_weighted_median(
        ds.map_batches(_vw, batch_format="pyarrow"),
        group_col="lang",
        value_col="v",
        weight_col="w",
        id_col="doc_id",
    )


SQL_LANG_WMEDIAN = r"""
WITH d AS (SELECT lang, doc_id,
                  CAST(len(regexp_extract_all(COALESCE(text, ''), '\S+'))
                       AS BIGINT) AS v,
                  CAST(n_chars AS BIGINT) AS w
           FROM documents),
o AS (SELECT lang, v, w,
             SUM(w) OVER (PARTITION BY lang ORDER BY v, doc_id
                          ROWS UNBOUNDED PRECEDING) AS cw,
             SUM(w) OVER (PARTITION BY lang) AS tw
      FROM d)
SELECT lang, MIN(v) AS wmedian, CAST(MAX(tw) AS BIGINT) AS tot_w
FROM o WHERE 2 * cw >= tw GROUP BY lang
"""


def q_media_resize(sf_dir: str):
    """Payload→payload image resize (stages/multimodal.py: ImageResize
    actor pool — the thumbnailing/normalization stage; PIL decode →
    resize → PNG when present, deterministic byte-resample stub in
    this container): synth media corpus → resized (id, payload, width,
    height) rows → per-type byte totals. Rows-only (binary codec);
    byte-exact pytest pins both paths."""
    from rio_cogeo_ray.stages import multimodal
    from rio_cogeo_ray.stages.agg import partial_group_agg

    t = multimodal.synth_media(2000)
    ds = rd.from_arrow(t).repartition(8)
    resized = multimodal.image_resize(ds, target_size=(32, 32),
                                      concurrency=2, batch_size=128)

    def _bytes(tb: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return pa.table(
            {
                "media_type": tb["media_type"].combine_chunks(),
                "nbytes": _pc.binary_length(
                    tb["payload"].combine_chunks()
                ).cast(pa.int64()),
            }
        )

    return partial_group_agg(
        resized.map_batches(_bytes, batch_format="pyarrow"),
        keys=["media_type"],
        sum_cols=["nbytes"],
        count_as="n_items",
    )

