"""Similarity search over an embedding column (list<float>).

- :func:`knn_cosine` — brute-force cosine top-k: the query matrix is
  broadcast (``ray.put`` once, materialized per actor in ``__init__``),
  each batch does ONE numpy matmul against it and keeps a local top-k
  per query, and a final tiny per-query merge produces exact results.
  Shuffled volume is k rows per (query, batch) — independent of corpus
  size.
- :func:`ivf_assign` / :func:`knn_cosine_ivf` — the scale path: k-means
  centroids (trained on a driver-side sample) bucket the corpus; a query
  probes only the nearest ``n_probe`` buckets, pruning the scan with a
  row filter pushed into the batch kernel. Approximate by construction;
  recall controlled by n_probe (documented, not silent).

Determinism: scores are float64 with a fixed kernel; ranking ties break
by vec_id everywhere.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from rio_cogeo_ray.stages.knn import per_group_topk


def _matrix(batch_col: pa.ChunkedArray) -> np.ndarray:
    """(n, d) float64 from a list<float> OR fixed_size_list<float>
    column (the latter is what multimodal feature extraction emits)."""
    arr = batch_col.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    if pa.types.is_fixed_size_list(arr.type):
        d = arr.type.list_size
    else:
        lens = np.diff(arr.offsets.to_numpy(zero_copy_only=False))
        d = int(lens[0]) if len(lens) else 0
    return flat.reshape(-1, d)


def _normalize(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m)
    if m.ndim == 1 and m.size == 0:
        # an empty vector list arrives 1-D: keep it a (0, 0) matrix so
        # downstream shape logic (matmuls never run on zero rows) holds
        m = m.reshape(0, 0)
    n = np.sqrt((m * m).sum(axis=1, keepdims=True))
    n[n == 0] = 1.0
    return m / n


class CosineTopK:
    """Actor callable: per batch, cosine of all rows × all queries (one
    matmul), emit each query's local top-k."""

    def __init__(
        self,
        queries: Union[np.ndarray, "ray.ObjectRef"],
        k: int,
        id_col: str = "vec_id",
        emb_col: str = "embedding",
    ):
        if isinstance(queries, ray.ObjectRef):
            queries = ray.get(queries)
        self.q = _normalize(np.asarray(queries, dtype=np.float64))  # (Q, d)
        self.k = k
        self.id_col = id_col
        self.emb_col = emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    self.id_col: pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        m = _normalize(_matrix(batch[self.emb_col]))  # (n, d)
        ids = batch[self.id_col].combine_chunks().to_numpy(zero_copy_only=False)
        sims = m @ self.q.T  # (n, Q)
        k = min(self.k, len(ids))
        # local top-k per query; ties by vec_id ascending
        order = np.lexsort((np.broadcast_to(ids[:, None], sims.shape), -sims), axis=0)[:k]
        qid = np.repeat(np.arange(self.q.shape[0], dtype=np.int64), k)
        rows = order.T.reshape(-1)
        return pa.table(
            {
                "query_id": pa.array(qid, pa.int64()),
                self.id_col: pa.array(ids[rows], pa.int64()),
                "score": pa.array(sims[rows, np.repeat(np.arange(self.q.shape[0]), k)], pa.float64()),
            }
        )


def knn_cosine(
    ds,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    concurrency: int = 4,
    batch_size: int = 4096,
):
    """Exact brute-force cosine top-k per query (the ANN baseline)."""
    q_ref = ray.put(np.asarray(queries, dtype=np.float64))
    local = ds.map_batches(
        CosineTopK,
        fn_constructor_args=(q_ref, k, id_col, emb_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    return per_group_topk(local, "query_id", [("score", False), (id_col, True)], k)


def knn_cosine_quantized(
    ds,
    query_vec: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    scale: int = 16_384,
    batch_size: int = 4096,
):
    """EXACT cosine top-k over INTEGER-QUANTIZED embeddings — the
    device that makes a similarity search SQL-mirrorable at all: both
    engines floor every float to ``floor(v·scale + 0.5)`` int64 first,
    so dot products and norms are exact integer sums (order-invariant),
    and the ranking key ``dot / sqrt(norm · qnorm)`` is then the SAME
    double computed from the SAME integers in numpy and DuckDB
    (correctly-rounded IEEE ops). Returns the top-k
    ``(id, dot_q, norm_q)`` rows ordered by that key (ties → id asc);
    the float never leaves the ORDER BY, so the output hashes on
    integers only.

    vs :func:`knn_cosine`: same answer-quality family (quantization
    error ~1/scale), but bit-reproducible across engines/parallelism —
    the float path float-sums in matmul order and cannot be mirrored.

    Scale shape: one pure-map pass (per-batch quantize + integer dot)
    → per-batch local top-k (bounded rows ∝ #batches·k) → driver
    final sort. Guards: |v|·scale must stay << 2^31 so the int64 dot
    of d terms cannot wrap (checked per batch, loud)."""
    q = np.asarray(query_vec, dtype=np.float64)
    qq = np.floor(q * float(scale) + 0.5).astype(np.int64)
    qn = int((qq.astype(object) ** 2).sum())  # Python int — exact
    if qn == 0:
        return pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "dot_q": pa.array([], pa.int64()),
                "norm_q": pa.array([], pa.int64()),
            }
        )
    qq_ref = ray.put(qq)

    def _score(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "dot_q": pa.array([], pa.int64()),
                "norm_q": pa.array([], pa.int64()),
            }
        )
        if not t.num_rows:
            return empty
        qv = ray.get(qq_ref)
        m = _matrix(t[emb_col]).astype(np.float64)
        e = np.floor(m * float(scale) + 0.5).astype(np.int64)
        amax = int(np.abs(e).max()) if e.size else 0
        d = e.shape[1]
        if amax and int(max(amax, np.abs(qv).max())) ** 2 * d >= 2**62:
            raise ValueError(
                "knn_cosine_quantized: |v|·scale too large — the integer "
                "dot would overflow int64; lower scale"
            )
        dot = e @ qv
        norm = (e * e).sum(axis=1)
        ids = t[id_col].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        keep = norm > 0
        dot, norm, ids = dot[keep], norm[keep], ids[keep]
        # per-batch local top-k on the exact ranking key (bounded rows)
        cos = dot.astype(np.float64) / np.sqrt(
            norm.astype(np.float64) * float(qn)
        )
        order = np.lexsort((ids, -cos))[:k]
        return pa.table(
            {
                id_col: pa.array(ids[order], pa.int64()),
                "dot_q": pa.array(dot[order], pa.int64()),
                "norm_q": pa.array(norm[order], pa.int64()),
            }
        )

    local = ds.map_batches(_score, batch_format="pyarrow", batch_size=batch_size)
    rows = [b for b in ray.get(local.to_arrow_refs()) if b.num_rows]
    if not rows:
        return _score(pa.table({id_col: pa.array([], pa.int64()), emb_col: pa.array([], pa.list_(pa.float32()))}))
    t = pa.concat_tables(rows, promote_options="default").combine_chunks()
    dot = t["dot_q"].to_numpy(zero_copy_only=False)
    norm = t["norm_q"].to_numpy(zero_copy_only=False)
    ids = t[id_col].to_numpy(zero_copy_only=False)
    cos = dot.astype(np.float64) / np.sqrt(norm.astype(np.float64) * float(qn))
    order = np.lexsort((ids, -cos))[:k]
    return t.take(pa.array(order, pa.int64()))


# ---------------------------------------------------------------------------
# IVF (inverted-file) bucketing — the 100 TB path
# ---------------------------------------------------------------------------


def train_centroids(sample: np.ndarray, n_centroids: int, iters: int = 8, seed: int = 42) -> np.ndarray:
    """Plain Lloyd k-means on a driver-side sample (numpy only). The
    sample is small by contract — the corpus itself never leaves Ray."""
    rng = np.random.RandomState(seed)
    sample = np.asarray(sample, dtype=np.float64)
    if sample.size == 0:
        # empty corpus: no centroids to train (callers broadcast the
        # empty (0, d) matrix; assignment stages never run — zero blocks)
        return sample.reshape(0, sample.shape[1] if sample.ndim == 2 else 0)
    sample = _normalize(sample)
    c = sample[rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)]
    for _ in range(iters):
        sims = sample @ c.T
        a = sims.argmax(axis=1)
        for j in range(len(c)):
            m = a == j
            if m.any():
                v = sample[m].mean(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    c[j] = v / nv
    return c


class IVFAssign:
    """+ bucket = argmax cosine(centroid) per row (one matmul/batch)."""

    def __init__(self, centroids, emb_col: str = "embedding"):
        if isinstance(centroids, ray.ObjectRef):
            centroids = ray.get(centroids)
        self.c = _normalize(np.asarray(centroids, dtype=np.float64))
        self.emb_col = emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column("bucket", pa.array([], pa.int64()))
        m = _normalize(_matrix(batch[self.emb_col]))
        b = (m @ self.c.T).argmax(axis=1).astype(np.int64)
        return batch.append_column("bucket", pa.array(b, pa.int64()))


def ivf_assign(ds, centroids: np.ndarray, emb_col: str = "embedding",
               concurrency: int = 4, batch_size: int = 4096):
    c_ref = ray.put(np.asarray(centroids, dtype=np.float64))
    return ds.map_batches(
        IVFAssign,
        fn_constructor_args=(c_ref, emb_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def knn_cosine_ivf(
    ds,
    queries: np.ndarray,
    centroids: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    concurrency: int = 4,
):
    """IVF-pruned cosine top-k: rows outside every query's probed buckets
    are dropped inside the batch kernel BEFORE the matmul. Approximate:
    recall depends on n_probe (scale path; the brute-force baseline is
    the exactness oracle)."""
    q = _normalize(np.asarray(queries, dtype=np.float64))
    c = _normalize(np.asarray(centroids, dtype=np.float64))
    probes = np.argsort(-(q @ c.T), axis=1)[:, :n_probe]  # (Q, n_probe)
    probe_set = np.unique(probes)

    with_bucket = ivf_assign(ds, c, emb_col, concurrency=concurrency)

    def _prune(t: pa.Table) -> pa.Table:
        b = t["bucket"].combine_chunks().to_numpy(zero_copy_only=False)
        return t.filter(pa.array(np.isin(b, probe_set)))

    pruned = with_bucket.map_batches(_prune, batch_format="pyarrow")
    return knn_cosine(pruned, q, k, id_col, emb_col, concurrency=concurrency)


# ---------------------------------------------------------------------------
# Persisted IVF index: bucket-partitioned layout → I/O-level pruning
# ---------------------------------------------------------------------------


def build_ivf_index(
    ds,
    index_dir: str,
    centroids: np.ndarray,
    emb_col: str = "embedding",
    concurrency: int = 4,
):
    """Materialize an IVF index as BUCKET-PARTITIONED parquet
    (``index_dir/vectors/bucket=<i>/``) plus the centroid matrix.
    Unlike :func:`knn_cosine_ivf` (a post-read row filter), a search
    against this layout reads ONLY the probed buckets' files — the
    pruning happens at I/O, which is what matters when the corpus is
    100 TB and n_probe/n_centroids is 3/64ths of it."""
    import json
    import os

    import shutil

    c = _normalize(np.asarray(centroids, dtype=np.float64))
    os.makedirs(index_dir, exist_ok=True)
    vec_dir = os.path.join(index_dir, "vectors")
    tmp_dir = os.path.join(index_dir, ".vectors.tmp")
    # rebuilds replace, never append: stale part files next to new ones
    # would return duplicate / outdated vectors from a search
    shutil.rmtree(tmp_dir, ignore_errors=True)
    with_bucket = ivf_assign(ds, c, emb_col, concurrency=concurrency)
    with_bucket.write_parquet(tmp_dir, partition_cols=["bucket"])
    # an empty corpus writes no fragments (and possibly no directory)
    os.makedirs(tmp_dir, exist_ok=True)
    shutil.rmtree(vec_dir, ignore_errors=True)
    os.replace(tmp_dir, vec_dir)
    with open(os.path.join(index_dir, "centroids.json"), "w") as f:
        json.dump({"centroids": c.tolist()}, f)
    return index_dir


def knn_cosine_ivf_indexed(
    index_dir: str,
    queries: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    concurrency: int = 4,
):
    """Search a :func:`build_ivf_index` layout: pick the ``n_probe``
    nearest centroid buckets per query and ``read_parquet`` ONLY those
    partition directories — unprobed buckets never leave storage."""
    import json
    import os

    import ray.data as rd

    with open(os.path.join(index_dir, "centroids.json")) as f:
        c = np.asarray(json.load(f)["centroids"], dtype=np.float64)
    q = _normalize(np.asarray(queries, dtype=np.float64))
    if c.size == 0 or q.size == 0:
        # empty index (or no queries): zero candidates by construction
        return rd.from_arrow(
            pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        )
    probes = np.argsort(-(q @ c.T), axis=1)[:, :n_probe]
    probe_set = np.unique(probes)
    files = []
    for b in probe_set:
        d = os.path.join(index_dir, "vectors", f"bucket={b}")
        if os.path.isdir(d):
            files += [
                os.path.join(d, f)
                for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            ]
    if not files:
        raise FileNotFoundError(f"no probed bucket partitions under {index_dir}")
    pruned = rd.read_parquet(files, columns=[id_col, emb_col])
    return knn_cosine(pruned, q, k, id_col, emb_col, concurrency=concurrency)


# ---------------------------------------------------------------------------
# Product quantization (PQ) — compressed-domain ANN (Jégou et al. 2011,
# "Product Quantization for Nearest Neighbor Search")
# ---------------------------------------------------------------------------


def train_pq_codebooks(
    sample: np.ndarray,
    n_sub: int = 8,
    n_codes: int = 256,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """(n_sub, n_codes, d/n_sub) sub-codebooks: plain L2 Lloyd k-means
    per subspace over a driver-side sample of NORMALIZED vectors (the
    corpus never leaves Ray; the sample is small by the same contract
    as train_centroids). Cosine decomposes exactly over subspaces —
    cos(q, x) = Σ_s q_s·x_s — so quantizing each x_s to its nearest
    sub-centroid gives cos(q, x) ≈ Σ_s q_s·c[s, code_s(x)], a table
    lookup at search time."""
    sample = _normalize(np.asarray(sample, dtype=np.float64))
    n, d = sample.shape
    if n == 0:
        # empty corpus: no sub-codebooks (encode stages never run)
        return np.zeros((n_sub, 0, max(d // n_sub, 0)), dtype=np.float64)
    if d % n_sub:
        raise ValueError(f"dim {d} not divisible by n_sub {n_sub}")
    dsub = d // n_sub
    rng = np.random.RandomState(seed)
    books = np.zeros((n_sub, min(n_codes, n), dsub), dtype=np.float64)
    for s in range(n_sub):
        x = sample[:, s * dsub : (s + 1) * dsub]
        c = x[rng.choice(n, size=min(n_codes, n), replace=False)]
        for _ in range(iters):
            # nearest centroid under L2: argmin |x|² - 2x·c + |c|²
            d2 = (c * c).sum(axis=1)[None, :] - 2.0 * (x @ c.T)
            a = d2.argmin(axis=1)
            for j in range(len(c)):
                m = a == j
                if m.any():
                    c[j] = x[m].mean(axis=0)
        books[s, : len(c)] = c
    return books


class PQEncode:
    """Actor stage: normalized vector → n_sub uint8 codes (one binary
    blob per row). Codebooks resolve once per actor from the broadcast
    ref; per batch = n_sub small matmuls (vectorized argmin)."""

    def __init__(self, books, id_col: str = "vec_id", emb_col: str = "embedding"):
        if isinstance(books, ray.ObjectRef):
            books = ray.get(books)
        self.books = np.asarray(books, dtype=np.float64)
        self.c2 = (self.books * self.books).sum(axis=2)  # (n_sub, n_codes)
        self.id_col = id_col
        self.emb_col = emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {self.id_col: pa.array([], pa.int64()), "codes": pa.array([], pa.binary())}
            )
        m = _normalize(_matrix(batch[self.emb_col]))
        n_sub, n_codes, dsub = self.books.shape
        codes = np.empty((len(m), n_sub), dtype=np.uint8)
        for s in range(n_sub):
            x = m[:, s * dsub : (s + 1) * dsub]
            d2 = self.c2[s][None, :] - 2.0 * (x @ self.books[s].T)
            codes[:, s] = d2.argmin(axis=1).astype(np.uint8)
        # build the fixed-width binary column from raw buffers (no
        # per-row Python): offsets are just arange * n_sub
        offs = (np.arange(len(codes) + 1, dtype=np.int32) * n_sub).tobytes()
        col = pa.Array.from_buffers(
            pa.binary(), len(codes), [None, pa.py_buffer(offs), pa.py_buffer(codes.tobytes())]
        )
        return pa.table(
            {self.id_col: batch[self.id_col].combine_chunks(), "codes": col}
        )


class PQTopK:
    """Actor stage over CODED rows: per batch, per-query scores by
    lookup-table gather (no float vectors touched) → local top-k.
    LUT[s] = q_s @ books[s].T computed once per actor per query set."""

    def __init__(self, queries, books, k: int, id_col: str = "vec_id"):
        if isinstance(queries, ray.ObjectRef):
            queries = ray.get(queries)
        if isinstance(books, ray.ObjectRef):
            books = ray.get(books)
        q = _normalize(np.asarray(queries, dtype=np.float64))  # (Q, d)
        books = np.asarray(books, dtype=np.float64)
        n_sub, n_codes, dsub = books.shape
        self.lut = np.stack(
            [q[:, s * dsub : (s + 1) * dsub] @ books[s].T for s in range(n_sub)],
            axis=1,
        )  # (Q, n_sub, n_codes)
        self.k = k
        self.id_col = id_col
        self.n_sub = n_sub

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    self.id_col: pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        blob = batch["codes"].combine_chunks()
        # zero-copy: fixed-width blobs are contiguous in the data buffer
        off = np.frombuffer(blob.buffers()[1], dtype=np.int32)
        start = int(off[blob.offset])
        data = np.frombuffer(blob.buffers()[2], dtype=np.uint8)
        codes = data[start : start + len(blob) * self.n_sub].reshape(
            len(blob), self.n_sub
        )
        ids = batch[self.id_col].combine_chunks().to_numpy(zero_copy_only=False)
        Q = self.lut.shape[0]
        sims = np.zeros((len(codes), Q), dtype=np.float64)
        for s in range(self.n_sub):
            sims += self.lut[:, s, codes[:, s]].T
        k = min(self.k, len(ids))
        order = np.lexsort((np.broadcast_to(ids[:, None], sims.shape), -sims), axis=0)[:k]
        qid = np.repeat(np.arange(Q, dtype=np.int64), k)
        rows = order.T.reshape(-1)
        return pa.table(
            {
                "query_id": pa.array(qid, pa.int64()),
                self.id_col: pa.array(ids[rows], pa.int64()),
                "score": pa.array(sims[rows, np.repeat(np.arange(Q), k)], pa.float64()),
            }
        )


def knn_cosine_pq(
    ds,
    queries: np.ndarray,
    books: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    concurrency: int = 4,
    batch_size: int = 4096,
    rerank: int = 0,
):
    """Approximate cosine top-k over PQ-compressed vectors: encode
    (float d×4 bytes → n_sub bytes per row, e.g. 32× smaller) then
    search the coded rows with per-query lookup tables.

    ``rerank > 0`` runs the standard retrieve-then-rerank contract
    (Jégou et al. §V): retrieve ``rerank·k`` candidates in the coded
    domain (where quantization error can shuffle near-ties), then
    re-rank ONLY those against the float vectors — a targeted,
    broadcast-filtered second pass over ``Q·rerank·k`` ids, never a
    full float scan. At 100 TB the coded corpus is what you persist
    and scan (a ~3 TB code table replaces a 100 TB float scan); the
    re-rank reads a bounded candidate set."""
    b_ref = ray.put(np.asarray(books, dtype=np.float64))
    q_ref = ray.put(np.asarray(queries, dtype=np.float64))
    coded = ds.map_batches(
        PQEncode,
        fn_constructor_args=(b_ref, id_col, emb_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    k_ret = k * rerank if rerank else k
    local = coded.map_batches(
        PQTopK,
        fn_constructor_args=(q_ref, b_ref, k_ret, id_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    cand = per_group_topk(local, "query_id", [("score", False), (id_col, True)], k_ret)
    if not rerank:
        return cand
    # bounded driver collect: Q × rerank·k ids (the candidate set, by
    # contract small), broadcast as a filter for the exact pass
    ids = set()
    for row in cand.select_columns([id_col]).take_all():
        ids.add(row[id_col])
    ids_ref = ray.put(np.array(sorted(ids), dtype=np.int64))

    def _keep(t: pa.Table) -> pa.Table:
        wanted = ray.get(ids_ref)
        if not len(wanted):
            return t.slice(0, 0)
        col = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.searchsorted(wanted, col)
        pos[pos >= len(wanted)] = 0
        return t.filter(pa.array(wanted[pos] == col))

    sub = ds.map_batches(_keep, batch_format="pyarrow", batch_size=batch_size)
    return knn_cosine(
        sub, np.asarray(queries, dtype=np.float64), k=k,
        id_col=id_col, emb_col=emb_col,
        concurrency=concurrency, batch_size=batch_size,
    )


# ---------------------------------------------------------------------------
# Distributed k-means — iterative fit where the corpus never leaves Ray
# ---------------------------------------------------------------------------


def kmeans_fit(
    ds,
    k: int,
    iters: int = 8,
    emb_col: str = "embedding",
    seed: int = 42,
    batch_size: int = 4096,
    sample_n: int = 1024,
):
    """Distributed spherical k-means over a Dataset of embeddings.

    Each iteration is ONE streaming pass: a stateless ``map_batches``
    assigns rows to the broadcast centroids and emits k partial rows
    (per-centroid vector sums + counts — a (k, d+1) table per batch,
    independent of batch rows); partials tree-merge through two
    bounded fan-in levels; the driver holds only the (k, d) centroid
    matrix, renormalizes, and broadcasts it for the next pass. The
    corpus itself is re-read per iteration (streaming, nothing
    materialized) — at 100 TB pin the input to parquet and let the
    object store cache hot blocks, or sub-sample for the fit.

    Initialization: driver-side Lloyd on a small ``take`` sample (the
    train_centroids contract). Returns the (k, d) centroid matrix;
    compose with :class:`IVFAssign` / :func:`ivf_assign` to label rows.
    """
    rows = ds.select_columns([emb_col]).take(sample_n)
    sample = np.array([r[emb_col] for r in rows], dtype=np.float64)
    c = train_centroids(sample, k, iters=4, seed=seed)
    if len(c) == 0:
        return c

    for _ in range(iters):
        c_ref = ray.put(c)

        def _partial(t: pa.Table) -> pa.Table:
            cc = ray.get(c_ref)
            if not len(t):
                d = cc.shape[1]
                return pa.table(
                    {
                        "cid": pa.array([], pa.int64()),
                        "vsum": pa.array([], pa.large_binary()),
                        "n": pa.array([], pa.int64()),
                    }
                )
            m = _normalize(_matrix(t[emb_col]))
            a = (m @ cc.T).argmax(axis=1)
            sums = np.zeros_like(cc)
            np.add.at(sums, a, m)
            cnt = np.bincount(a, minlength=len(cc)).astype(np.int64)
            live = cnt > 0
            return pa.table(
                {
                    "cid": pa.array(np.flatnonzero(live), pa.int64()),
                    "vsum": pa.array([sums[i].tobytes() for i in np.flatnonzero(live)], pa.large_binary()),
                    "n": pa.array(cnt[live], pa.int64()),
                }
            )

        def _merge(t: pa.Table) -> pa.Table:
            if not len(t):
                return t
            cid = t["cid"].combine_chunks().to_numpy(zero_copy_only=False)
            n = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
            blobs = t["vsum"].combine_chunks()
            mat = np.vstack(
                [np.frombuffer(blobs[i].as_buffer(), dtype=np.float64) for i in range(len(blobs))]
            )
            order = np.argsort(cid, kind="stable")
            cs, ns, ms = cid[order], n[order], mat[order]
            starts = np.r_[0, np.flatnonzero(cs[1:] != cs[:-1]) + 1]
            msum = np.add.reduceat(ms, starts, axis=0)
            nsum = np.add.reduceat(ns, starts)
            return pa.table(
                {
                    "cid": pa.array(cs[starts], pa.int64()),
                    "vsum": pa.array([r.tobytes() for r in msum], pa.large_binary()),
                    "n": pa.array(nsum, pa.int64()),
                }
            )

        parts = ds.map_batches(_partial, batch_format="pyarrow", batch_size=batch_size)
        for _lvl in range(2):
            parts = parts.map_batches(_merge, batch_format="pyarrow", batch_size=256)
        new_c = c.copy()
        seen = np.zeros(len(c), dtype=bool)
        for row in parts.take_all():  # ≤ k rows after the fan-in levels
            i = int(row["cid"])
            v = np.frombuffer(row["vsum"], dtype=np.float64)
            if seen[i]:
                v = v + new_c[i]  # centroid rows split across final blocks
                new_c[i] = v
            else:
                new_c[i] = v
                seen[i] = True
        nv = np.linalg.norm(new_c, axis=1, keepdims=True)
        nv[nv == 0] = 1.0
        c = np.where(seen[:, None], new_c / nv, c)
    return c


# ---------------------------------------------------------------------------
# SemDeDup — semantic dedup via cluster-then-thin (Abbas et al. 2023,
# "SemDeDup: Data-efficient learning at web-scale through semantic
# deduplication")
# ---------------------------------------------------------------------------


def semantic_dedup(
    ds,
    n_clusters: int = 16,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    kmeans_iters: int = 4,
    concurrency: int = 4,
):
    """Semantic (embedding-space) dedup, the SemDeDup shape: k-means
    clusters the corpus (distributed fit — stages/ann.py:kmeans_fit),
    then each cluster is thinned INDEPENDENTLY: a point is dropped iff
    an earlier point (lower id — deterministic priority) in ITS cluster
    sits within cosine ≥ ``threshold``. Returns the kept (id, bucket)
    rows.

    vs embedding_neardup (SRP-LSH): LSH recalls near-dup PAIRS at any
    distance scale; SemDeDup trades pair recall for a bounded
    quadratic — pairwise similarity is computed only WITHIN a cluster,
    so the cost is Σ|cluster|² and the knob is ``n_clusters``
    (Abbas et al. run k≈11k for 100M embeddings; size clusters to the
    worker heap). Points near a cluster boundary can miss a cross-
    cluster duplicate — the documented SemDeDup approximation.

    Scale shape: one iterative fit (k·d driver state only), one
    stateless assign pass, ONE groupby(cluster) exchange, one
    vectorized gram-matrix pass per cluster. The thinning rule is
    order-free (drop iff ANY lower-id ε-neighbor exists), so results
    are identical at any parallelism."""
    cents = kmeans_fit(
        ds, n_clusters, iters=kmeans_iters, emb_col=emb_col
    )
    labeled = ivf_assign(ds, cents, emb_col, concurrency=concurrency)

    def _thin(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {id_col: pa.array([], pa.int64()), "bucket": pa.array([], pa.int64())}
        )
        if not g.num_rows:
            return empty
        g = g.sort_by([(id_col, "ascending")])
        E = _normalize(_matrix(g[emb_col]))
        sims = E @ E.T
        drop = (np.tril(sims >= threshold, k=-1)).any(axis=1)
        keep = pa.array(~drop)
        return pa.table(
            {
                id_col: g[id_col].combine_chunks().cast(pa.int64()),
                "bucket": g["bucket"].combine_chunks().cast(pa.int64()),
            }
        ).filter(keep)

    return labeled.groupby("bucket").map_groups(_thin, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Distributed PCA (dimensionality reduction over an embedding column)
# ---------------------------------------------------------------------------


def _pca_partial(t: pa.Table, emb_col: str) -> pa.Table:
    """One (n, Σx, XᵀX) moment row per batch — the whole corpus
    collapses to d²-sized partials before anything leaves a worker."""
    m = _matrix(t[emb_col])
    if m.size == 0:
        return pa.table(
            {
                "n": pa.array([], pa.int64()),
                "d": pa.array([], pa.int64()),
                "s": pa.array([], pa.binary()),
                "g": pa.array([], pa.binary()),
            }
        )
    return pa.table(
        {
            "n": pa.array([m.shape[0]], pa.int64()),
            "d": pa.array([m.shape[1]], pa.int64()),
            "s": pa.array([m.sum(axis=0).tobytes()], pa.binary()),
            "g": pa.array([(m.T @ m).tobytes()], pa.binary()),
        }
    )


def _pca_merge(t: pa.Table) -> pa.Table:
    """Sum moment rows into one — the fan-in level between the map
    pass and the driver (same doctrine as sketch.py's HLL tree)."""
    if not t.num_rows:
        return t
    d = int(t["d"][0].as_py())
    s = np.zeros(d, dtype=np.float64)
    g = np.zeros((d, d), dtype=np.float64)
    for row in range(t.num_rows):
        s += np.frombuffer(t["s"][row].as_py(), dtype=np.float64)
        g += np.frombuffer(t["g"][row].as_py(), dtype=np.float64).reshape(d, d)
    n = int(pc.sum(t["n"]).as_py())
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "d": pa.array([d], pa.int64()),
            "s": pa.array([s.tobytes()], pa.binary()),
            "g": pa.array([g.tobytes()], pa.binary()),
        }
    )


def pca_fit(ds, k: int = 8, emb_col: str = "embedding"):
    """Exact PCA fit in ONE streaming pass: per-batch moment partials
    (n, Σx, XᵀX — d² floats each, independent of corpus size) →
    fan-in merge (≤1 row per 1024 partials) → exact covariance and
    ``np.linalg.eigh`` on the driver (d×d, trivially small).

    Returns (mean (d,), components (d, k), explained_var (k,)) with
    components ordered by descending eigenvalue and sign-fixed (the
    largest-|w| coordinate of every component is positive), so the
    basis is deterministic up to float reduction order.

    Scale: the driver sees O(#batches/1024) rows of d² bytes — at 100
    TB and d=1024 that is a few MB; no embedding ever leaves its
    worker. The projection (``pca_project``) is a stateless broadcast
    map."""
    parts = ds.map_batches(
        lambda t: _pca_partial(t, emb_col), batch_format="pyarrow"
    ).map_batches(_pca_merge, batch_format="pyarrow", batch_size=1024)
    blocks = [b for b in ray.get(parts.to_arrow_refs()) if b.num_rows]
    if not blocks:
        raise ValueError("pca_fit: empty dataset")
    top = _pca_merge(pa.concat_tables(blocks).combine_chunks())
    if not top.num_rows:
        raise ValueError("pca_fit: empty dataset")
    n = int(top["n"][0].as_py())
    d = int(top["d"][0].as_py())
    s = np.frombuffer(top["s"][0].as_py(), dtype=np.float64)
    g = np.frombuffer(top["g"][0].as_py(), dtype=np.float64).reshape(d, d)
    mean = s / n
    cov = (g - n * np.outer(mean, mean)) / max(n - 1, 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    w = evecs[:, order]  # (d, k)
    flip = w[np.abs(w).argmax(axis=0), np.arange(w.shape[1])] < 0
    w[:, flip] *= -1.0
    return mean, w, evals[order]


class _PCAProject:
    """Actor callable: (X - mean) @ W per batch; fit state resolved
    once per actor from the broadcast ref."""

    def __init__(self, fit_ref, emb_col: str, id_col: str, out_prefix: str):
        mean, w = ray.get(fit_ref) if isinstance(fit_ref, ray.ObjectRef) else fit_ref
        self.mean, self.w = mean, w
        self.emb_col, self.id_col, self.out_prefix = emb_col, id_col, out_prefix

    def __call__(self, t: pa.Table) -> pa.Table:
        k = self.w.shape[1]
        cols = {self.id_col: pa.array([], pa.int64())}
        if not t.num_rows:
            for j in range(k):
                cols[f"{self.out_prefix}{j}"] = pa.array([], pa.float64())
            return pa.table(cols)
        y = (_matrix(t[self.emb_col]) - self.mean) @ self.w  # (n, k)
        cols = {self.id_col: t[self.id_col].combine_chunks().cast(pa.int64())}
        for j in range(k):
            cols[f"{self.out_prefix}{j}"] = pa.array(y[:, j], pa.float64())
        return pa.table(cols)


def pca_project(
    ds,
    mean: np.ndarray,
    components: np.ndarray,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    out_prefix: str = "pc",
    concurrency=(1, 4),
    batch_size: int = 4096,
):
    """Project every row onto the fitted basis: (id, pc0..pc{k-1}).
    The (mean, W) pair ships once via ``ray.put``; the pass is a
    stateless actor-pool map (zero shuffle)."""
    fit_ref = ray.put((np.asarray(mean, np.float64), np.asarray(components, np.float64)))
    return ds.map_batches(
        _PCAProject,
        fn_constructor_args=(fit_ref, emb_col, id_col, out_prefix),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def semantic_decontam(
    train,
    eval_vecs: np.ndarray,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    keep_scores: bool = False,
    batch_size: int = 4096,
):
    """Embedding-space benchmark decontamination: drop every TRAINING
    row whose embedding is cosine-similar (``>= threshold``) to ANY
    eval embedding — the semantic sibling of the exact-key filter
    (stages/dedup.py:decontaminate) and the n-gram-overlap filter
    (dedup.py:decontaminate_ngrams), for paraphrased/translated eval
    leakage that key and token matching both miss.

    Scale contract (the decontaminate doctrine): eval sets are SMALL
    by definition, so the L2-normalized eval matrix ships once via
    ``ray.put`` and the corpus streams through one stateless filter —
    ZERO shuffle of the training side at any corpus size. Per batch:
    one (n, d)×(d, Q) matmul + row max. An empty eval set keeps
    everything. ``keep_scores`` appends ``max_sim`` (float64) for
    threshold tuning."""
    q = np.asarray(eval_vecs, dtype=np.float64)
    q = _normalize(q) if q.size else q.reshape(0, q.shape[1] if q.ndim == 2 else 0)
    q_ref = ray.put(np.ascontiguousarray(q.T) if q.size else q)

    def _filter(batch: pa.Table) -> pa.Table:
        qt = ray.get(q_ref)  # zero-copy plasma view
        if qt.size == 0 or batch.num_rows == 0:
            # keep_scores must add max_sim on EVERY path (incl. empty
            # batches) or blocks disagree on schema
            if keep_scores:
                return batch.append_column(
                    "max_sim",
                    pa.array(np.full(batch.num_rows, -1.0), pa.float64()),
                )
            return batch
        m = _normalize(_matrix(batch[emb_col]))
        sims = (m @ qt).max(axis=1)
        kept = batch.filter(pa.array(sims < threshold))
        if keep_scores:
            kept = kept.append_column(
                "max_sim", pa.array(sims[sims < threshold], pa.float64())
            )
        return kept

    return train.map_batches(_filter, batch_format="pyarrow", batch_size=batch_size)


def embedding_dim_stats(ds, label_col: str = "label", emb_col: str = "embedding",
                        n_buckets: int = 8):
    """Per-(label, dimension) feature statistics over an embedding
    column — the feature-drift / cluster-profile audit (which
    dimensions separate the classes; has a source's feature
    distribution shifted between crawls): n, sum, min, max of each
    dimension quantized to exact integer micro-units (float32→float64
    is exact and ``floor(v·10^6)`` is deterministic IEEE, so both
    engines produce identical integers — the first SQL-exact surface
    over the embeddings table).

    Scale shape: per batch, ONE vectorized np.add.at/min.at/max.at
    pass collapses the 64× dim explosion to (labels × dims) partial
    rows BEFORE the exchange (the Zipf-collapse contract); one bounded
    partial→final merge finishes. Driver never sees vectors.

    Returns (label, dim, n, sum_q, min_q, max_q), dim 1-based (SQL
    list-index mirror).
    """
    from rio_cogeo_ray.stages.agg import partial_group_agg

    def _partial(t: pa.Table) -> pa.Table:
        lab = t[label_col].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        emb = t[emb_col].combine_chunks()
        d = len(emb[0]) if len(emb) else 0
        if not len(lab) or not d:
            return pa.table(
                {
                    label_col: pa.array([], pa.int64()),
                    "dim": pa.array([], pa.int64()),
                    "n_part": pa.array([], pa.int64()),
                    "sum_part": pa.array([], pa.int64()),
                    "min_part": pa.array([], pa.int64()),
                    "max_part": pa.array([], pa.int64()),
                }
            )
        m = (
            emb.flatten()
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
            .reshape(len(lab), d)
        )
        q = np.floor(m * 1_000_000.0).astype(np.int64)
        uniq, inv = np.unique(lab, return_inverse=True)
        L = len(uniq)
        sums = np.zeros((L, d), dtype=np.int64)
        np.add.at(sums, inv, q)
        mins = np.full((L, d), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(mins, inv, q)
        maxs = np.full((L, d), np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(maxs, inv, q)
        cnt = np.bincount(inv, minlength=L).astype(np.int64)
        return pa.table(
            {
                label_col: pa.array(np.repeat(uniq, d), pa.int64()),
                "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), L), pa.int64()),
                "n_part": pa.array(np.repeat(cnt, d), pa.int64()),
                "sum_part": pa.array(sums.ravel(), pa.int64()),
                "min_part": pa.array(mins.ravel(), pa.int64()),
                "max_part": pa.array(maxs.ravel(), pa.int64()),
            }
        )

    merged = partial_group_agg(
        ds.map_batches(_partial, batch_format="pyarrow"),
        keys=[label_col, "dim"],
        sum_cols=["n_part", "sum_part"],
        min_cols=["min_part"],
        max_cols=["max_part"],
        count_as=None,
        n_buckets=n_buckets,
    )
    return merged.map_batches(
        lambda t: pa.table(
            {
                label_col: t[label_col].combine_chunks(),
                "dim": t["dim"].combine_chunks(),
                "n": t["sum_n_part"].combine_chunks(),
                "sum_q": t["sum_sum_part"].combine_chunks(),
                "min_q": t["min_min_part"].combine_chunks(),
                "max_q": t["max_max_part"].combine_chunks(),
            }
        ),
        batch_format="pyarrow",
    )
