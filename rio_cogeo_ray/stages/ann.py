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


# ---------------------------------------------------------------------------
# IVF (inverted-file) bucketing — the 100 TB path
# ---------------------------------------------------------------------------


def train_centroids(sample: np.ndarray, n_centroids: int, iters: int = 8, seed: int = 42) -> np.ndarray:
    """Plain Lloyd k-means on a driver-side sample (numpy only). The
    sample is small by contract — the corpus itself never leaves Ray."""
    rng = np.random.RandomState(seed)
    sample = _normalize(np.asarray(sample, dtype=np.float64))
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
