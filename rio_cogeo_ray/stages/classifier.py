"""Distributed linear quality classifier over hashed bag-of-words
features — the CCNet / GPT-3 "train a quality model on seed labels,
then score the whole corpus" step of a webtext pipeline (Wenzek et al.
2020 §4.3; Brown et al. 2020 App. A). No analog exists in the
reference (rio_cogeo has no model stage); the engine treats it as a
first-class operator because corpus-quality filtering is the most
common consumer of the text-analysis signals (quality/langid/
surprisal) this engine already computes.

Three pieces, each reusing an established doctrine:

- :func:`hash_features` — tokenize (the shared ``\\S+`` kernel of
  stages/text.py) → 64-bit polars token hash → feature index
  ``h % n_features`` → per-doc ``log1p(count)`` dense row + a bias
  column. PURE MAP; the feature dimension is fixed and small
  (hundreds), so a batch's matrix is a few MB regardless of corpus
  size.
- :func:`ridge_fit` — closed-form ridge regression via normal
  equations, the pca_fit moment-partial doctrine (stages/ann.py:691):
  per-batch partials (n, XᵀX, Xᵀy) are (d+1)²-sized blobs independent
  of corpus size → ≤1024-fan-in merge → one tiny
  ``np.linalg.solve((XᵀX + λ·n·I), Xᵀy)`` on the driver. ONE streaming
  pass over the labeled seed; no feature row ever leaves its worker.
- :func:`score` — broadcast the weight vector once (``ray.put``),
  stateless TASK map (zero-copy plasma view per batch — the
  segment_dedup bloom doctrine) emitting the margin ``x·w`` per doc.

Determinism: feature extraction is bit-exact everywhere (integer
counts, per-row log1p). The fitted ``w`` is deterministic up to
float64 partial-sum reduction order (same contract as pca_fit); the
pytest oracle therefore solves the SAME normal equations with numpy
on materialized features and compares to ~1e-8.

100 TB shape: fitting reads only the labeled SEED corpus (small by
definition — quality labels are human/model-annotated); scoring
streams the full corpus through one map stage with no exchange at
all. The d² partial blobs bound driver traffic at
O(#batches/1024 · d²) bytes.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pyarrow as pa

#: polars token-hash seed — distinct from surprisal (11) / tfidf (101)
#: so classifier buckets are decorrelated from those pipelines.
_HASH_SEED = 23


def _feature_matrix(
    batch: pa.Table, text_col: str, n_features: int
) -> np.ndarray:
    """(n_rows, n_features+1) float64: log1p hashed-token counts plus a
    trailing bias column of ones. Empty docs get a bias-only row."""
    import polars as pl

    from rio_cogeo_ray.stages.text import _tokenize_with_positions

    n = batch.num_rows
    x = np.zeros((n, n_features + 1), dtype=np.float64)
    x[:, n_features] = 1.0
    if not n:
        return x
    toks, row, _ = _tokenize_with_positions(batch, "__unused", text_col)
    if len(row):
        h = (
            pl.from_arrow(toks.cast(pa.large_string()))
            .hash(seed=_HASH_SEED)
            .to_numpy()
            .astype(np.uint64)
        )
        idx = (h % np.uint64(n_features)).astype(np.int64)
        np.add.at(x, (row, idx), 1.0)
        x[:, :n_features] = np.log1p(x[:, :n_features])
    return x


def _fit_partial(batch: pa.Table, text_col: str, label_col: str, d: int) -> pa.Table:
    x = _feature_matrix(batch, text_col, d)
    y = (
        batch[label_col]
        .combine_chunks()
        .cast(pa.float64())
        .to_numpy(zero_copy_only=False)
    )
    return pa.table(
        {
            "n": pa.array([batch.num_rows], pa.int64()),
            "g": pa.array([(x.T @ x).tobytes()], pa.binary()),
            "b": pa.array([(x.T @ y).tobytes()], pa.binary()),
        }
    )


def _fit_merge(t: pa.Table) -> pa.Table:
    if not t.num_rows:
        return t
    n = int(np.sum(t["n"].to_numpy(zero_copy_only=False)))
    g = np.sum(
        [np.frombuffer(v.as_py(), dtype=np.float64) for v in t["g"]], axis=0
    )
    b = np.sum(
        [np.frombuffer(v.as_py(), dtype=np.float64) for v in t["b"]], axis=0
    )
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "g": pa.array([g.tobytes()], pa.binary()),
            "b": pa.array([b.tobytes()], pa.binary()),
        }
    )


def ridge_fit(
    ds,
    label_col: str,
    text_col: str = "text",
    n_features: int = 256,
    l2: float = 1e-3,
) -> np.ndarray:
    """Fit ``w`` (n_features+1,) minimizing ‖Xw − y‖² + λ·n·‖w‖² over
    the labeled seed dataset in ONE streaming pass (bias column is not
    regularized). Labels are any numeric column (0/1 for quality)."""
    import ray

    d = int(n_features)
    parts = ds.map_batches(
        lambda t: _fit_partial(t, text_col, label_col, d),
        batch_format="pyarrow",
    ).map_batches(_fit_merge, batch_format="pyarrow", batch_size=1024)
    top = _fit_merge(
        pa.concat_tables(
            ray.get(parts.to_arrow_refs()), promote_options="default"
        ).combine_chunks()
    )
    if not top.num_rows:
        raise ValueError("ridge_fit: empty dataset")
    n = int(top["n"][0].as_py())
    g = np.frombuffer(top["g"][0].as_py(), dtype=np.float64).reshape(d + 1, d + 1)
    b = np.frombuffer(top["b"][0].as_py(), dtype=np.float64)
    reg = np.eye(d + 1) * (l2 * n)
    reg[d, d] = 0.0  # bias unregularized
    return np.linalg.solve(g + reg, b)


def score(
    ds,
    w: np.ndarray,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "quality_margin",
):
    """Score every doc with the fitted weights: margin = x·w (higher =
    more seed-like). Stateless broadcast task map — zero shuffle."""
    import ray

    d = len(w) - 1
    w_ref = ray.put(np.asarray(w, dtype=np.float64))

    def _score(batch: pa.Table) -> pa.Table:
        wv = ray.get(w_ref)  # zero-copy plasma view
        m = _feature_matrix(batch, text_col, d) @ wv
        return pa.table(
            {
                id_col: batch[id_col].combine_chunks().cast(pa.int64()),
                out_col: pa.array(m, pa.float64()),
            }
        )

    return ds.map_batches(_score, batch_format="pyarrow")
