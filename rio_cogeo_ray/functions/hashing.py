"""Deterministic vectorized integer hashing (splitmix64) + helpers.

Used for seeded fixture generation and for content fingerprints. All
operations are numpy uint64 with wraparound — identical on every worker,
independent of execution order.
"""

from __future__ import annotations

import numpy as np

# Import polars EAGERLY and touch a lazily-registered attribute: Ray can
# run two UDF threads in one worker process, and a first-use `import
# polars` racing across threads surfaces as partially-initialized
# submodules ("polars._reexport has no attribute 'Series'", observed in
# a fused map_groups→map_batches task). Importing here runs under this
# module's import lock, so polars is fully initialized before any UDF
# thread calls hash_columns.
try:
    import polars as _pl

    _ = _pl.Series
except Exception:  # pragma: no cover - polars is a hard dep in practice
    _pl = None

_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer — a strong, cheap 64-bit mix (public domain
    algorithm, Steele et al.)."""
    with np.errstate(over="ignore"):
        z = np.asarray(x).astype(np.uint64) + _SM_GAMMA
        z = (z ^ (z >> np.uint64(30))) * _SM_M1
        z = (z ^ (z >> np.uint64(27))) * _SM_M2
        return z ^ (z >> np.uint64(31))


def hash2(a: np.ndarray, b) -> np.ndarray:
    """Mix two integer streams into one hash."""
    with np.errstate(over="ignore"):
        return splitmix64(
            np.asarray(a).astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            ^ (np.asarray(b).astype(np.uint64) + np.uint64(0x165667B19E3779F9))
        )


def weighted_pick(h: np.ndarray, weights) -> np.ndarray:
    """Deterministically map hashes to category indices with the given
    integer/float weights (16-bit resolution)."""
    w = np.asarray(weights, dtype=np.float64)
    thresholds = np.floor(np.cumsum(w) / w.sum() * 65536.0).astype(np.int64)
    u = (np.asarray(h, dtype=np.uint64) & np.uint64(0xFFFF)).astype(np.int64)
    return np.clip(np.searchsorted(thresholds, u, side="right"), 0, len(w) - 1)


def hash_columns(table, cols) -> np.ndarray:
    """One uint64 hash per row over arbitrary key columns (int-like
    columns via splitmix64 chaining; strings via polars' native
    vectorized hash). Used to route rows to reduce buckets."""
    import pyarrow as pa

    h = np.zeros(len(table), dtype=np.uint64)
    for c in cols:
        col = table[c]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            v = _pl.from_arrow(col.cast(pa.large_string())).hash(seed=17).to_numpy().astype(np.uint64)
        else:
            v = col.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.uint64)
        h = hash2(h, v)
    return h
