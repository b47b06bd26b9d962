"""Sketches + sampling — HyperLogLog distinct-count, deterministic
hash sampling, distributed bottom-k (order-statistic) sampling.

Training-data-pipeline operators (the reference has no sketches or
sampling — SURVEY.md §2.1 note; these are north-rule scale additions).
All three are content/id-addressed and deterministic: any parallelism,
any batch boundaries, same result.

Scale notes (the 100 TB story):

- `hash_sample` is a pure per-batch filter — zero shuffle, zero state;
  the sample decision is a function of the row alone, so a resumed or
  re-sharded run selects the same rows.
- `bottomk_sample` ships at most k rows per batch into the final
  reduce (the classic distributed top-k: partial top-k → merge), so
  the driver never sees more than O(k · batches) rows and the network
  carries O(k) per block, independent of corpus size.
- `hll_count_distinct` moves one 2^p-byte register row per BLOCK
  through a union — a 10^12-row corpus reduces to a few thousand 4 KiB
  rows; the merge is an elementwise max. Standard error ≈ 1.04/√2^p
  (p=12 → ~1.6%).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

_KNUTH = np.uint64(2654435761)
_M32 = np.uint64(4294967296)


def knuth32(ids: np.ndarray, salt: int = 0) -> np.ndarray:
    """The engine's SQL-mirrorable 32-bit multiplicative hash:
    ``((id + salt) * 2654435761) mod 2^32`` — exactly expressible in
    ANSI SQL over BIGINT/HUGEINT, mirrored literally in every sampling
    oracle (same pattern as the geocode mirrors, queries.py:_LON)."""
    with np.errstate(over="ignore"):
        return ((ids.astype(np.uint64) + np.uint64(salt)) * _KNUTH) % _M32


def hash_sample_batch(
    batch: pa.Table, id_col: str, rate_num: int, rate_den: int, salt: int = 0
) -> pa.Table:
    """Deterministic Bernoulli sample: keep rows with
    ``knuth32(id) mod rate_den < rate_num``. Pure filter, no state."""
    ids = batch[id_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
    keep = (knuth32(ids, salt) % np.uint64(rate_den)) < np.uint64(rate_num)
    return batch.filter(pa.array(keep))


def hash_sample(ds, id_col: str, rate_num: int, rate_den: int, salt: int = 0):
    """Sample ``rate_num/rate_den`` of rows by id hash (SQL-exact)."""
    return ds.map_batches(
        lambda t: hash_sample_batch(t, id_col, rate_num, rate_den, salt),
        batch_format="pyarrow",
    )


def bottomk_sample(ds, id_col: str, k: int, salt: int = 0):
    """Uniform-without-replacement sample of exactly k rows: the k rows
    with the smallest ``(knuth32(id), id)`` — an order statistic, so
    the result set is unique and SQL-mirrorable (ORDER BY h, id LIMIT k).

    Distributed as partial top-k per batch (each batch forwards ≤ k
    rows) → one tiny final sort+limit.
    """

    def _partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        h = knuth32(ids, salt).astype(np.int64)
        t = t.append_column("__h", pa.array(h, pa.int64()))
        order = np.lexsort((ids, h))[:k]
        return t.take(pa.array(order, pa.int64()))

    partials = ds.map_batches(_partial, batch_format="pyarrow")
    return partials.sort(["__h", id_col]).limit(k)


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def _hll_rho(h: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rank) per hash: index = top p bits; rank =
    1 + leading zeros of the LOW 32 bits (exact in float64 via frexp —
    32-bit values have no rounding), capped at 33 for v == 0."""
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    v = (h & np.uint64(0xFFFFFFFF)).astype(np.int64)
    bl = np.frexp(v.astype(np.float64))[1]  # bit_length; exact for < 2^32
    rho = np.where(v == 0, 33, 33 - bl).astype(np.int8)
    return idx, rho


def _hash_col(col: pa.ChunkedArray) -> np.ndarray:
    import polars as pl

    from rio_cogeo_ray.functions.hashing import splitmix64

    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        return pl.from_arrow(col.cast(pa.large_string())).hash(seed=7).to_numpy().astype(np.uint64)
    return splitmix64(col.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.uint64))


def hll_register_rows(batch: pa.Table, col: str, p: int) -> pa.Table:
    """One (registers) row per batch: the 2^p max-rank registers of the
    batch's values, as a binary blob (int8 array bytes)."""
    regs = np.zeros(1 << p, dtype=np.int8)
    if len(batch):
        idx, rho = _hll_rho(_hash_col(batch[col]), p)
        np.maximum.at(regs, idx, rho)
    return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})


def hll_estimate(regs: np.ndarray) -> float:
    """Bias-corrected HLL estimate (Flajolet et al. 2007) with the
    small-range linear-counting correction."""
    m = float(len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    r = regs.astype(np.float64)
    e = alpha * m * m / np.sum(np.power(2.0, -r))
    if e <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            e = m * np.log(m / zeros)
    return float(e)


def merge_register_rows(batch: pa.Table) -> pa.Table:
    """Elementwise-max many register rows into ONE row (the distributed
    HLL union step). All blobs are the same 2^p length, so the whole
    batch reduces with a single reshape + max — no Python loop."""
    if len(batch) <= 1:
        return batch
    buf = batch["regs"].combine_chunks()
    off = np.frombuffer(buf.buffers()[1], dtype=np.int32)
    start = int(off[buf.offset])
    m = int(off[buf.offset + 1]) - start
    data = np.frombuffer(buf.buffers()[2], dtype=np.int8)
    regs = data[start : start + len(buf) * m].reshape(len(buf), m).max(axis=0)
    return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})


def hll_count_distinct(ds, col: str, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT col) over a Dataset: per-batch
    register rows (one small row per batch leaves each worker), then
    TWO distributed register-max re-reduce levels (≤1024-row fan-in
    each, so even a 10^9-block corpus leaves ≲10^3 rows), and a final
    driver merge of the handful of survivors — the driver never holds
    O(#blocks) rows."""
    rows = ds.map_batches(
        lambda t: hll_register_rows(t, col, p), batch_format="pyarrow", batch_size=65536
    )
    for _ in range(2):
        rows = rows.map_batches(
            merge_register_rows, batch_format="pyarrow", batch_size=1024
        )
    regs = np.zeros(1 << p, dtype=np.int8)
    for row in rows.take_all():
        regs = np.maximum(regs, np.frombuffer(row["regs"], dtype=np.int8))
    return hll_estimate(regs)
