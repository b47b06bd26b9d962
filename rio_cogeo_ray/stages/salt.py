"""Explicit hot-key salting for skewed shuffles.

The north rule's skew story ("skewed hot cells are salted and split
before a groupby-aggregate-sort shuffle"). The engine's PRIMARY skew
defenses are algebraic — density partials and batch-local top-k bound
every key's shuffled rows to O(#batches) before any groupby, and the
bucketed merge bounds per-call group size — but some operators shuffle
RAW rows per key (``groupby(key).map_groups`` with non-decomposable
UDFs). For those, this module provides the classic two-phase pattern:

1. a cheap COUNT pass finds keys whose row count exceeds a threshold
   (itself a partial→final aggregate — safe on skewed data),
2. hot keys get ``salt = hash(row_id) % S`` appended to the shuffle key
   (cold keys salt=0), splitting a hot key into S sub-groups,
3. the caller aggregates per (key, salt) then reduces the ≤S partial
   results per key — exact for any commutative-associative reduce.

``salted_group_counts`` demonstrates the full pattern end-to-end for
counting; ``detect_hot_keys`` + ``add_salt`` are the reusable pieces.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa

import ray

from rio_cogeo_ray.functions.hashing import hash2, splitmix64
from rio_cogeo_ray.stages.agg import partial_group_agg


def detect_hot_keys(ds, key_col: str, threshold: int) -> pa.Table:
    """One cheap partial→final count pass → keys with count > threshold
    (the driver-side broadcast small side; hot-key sets are tiny by
    definition of 'hot')."""
    counts = partial_group_agg(ds, keys=[key_col], count_as="n")

    def _filter(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.greater(t["n"], threshold))

    hot = counts.map_batches(_filter, batch_format="pyarrow")
    # zero-row blocks that never reach a UDF carry NO schema — drop
    # them before the concat (the bigram_lift 5M-page lesson)
    blocks = [b for b in ray.get(hot.to_arrow_refs()) if b.num_rows]
    if not blocks:
        return pa.table(
            {key_col: pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
        )
    return pa.concat_tables(blocks).combine_chunks()


def add_salt(
    ds,
    key_col: str,
    hot_keys: pa.Table,
    n_salts: int = 16,
    salt_col: str = "__salt",
    salt_source_col: Optional[str] = None,
):
    """+ ``salt_col``: hash(row) % n_salts for hot keys, 0 for cold.
    ``hot_keys`` is broadcast via ray.put and materialized per task.
    Salt derives from ``salt_source_col`` (or a per-batch row counter —
    fine for aggregation, NOT for joins where both sides must agree)."""
    hot_ref = ray.put(hot_keys[key_col].combine_chunks().to_numpy(zero_copy_only=False))

    def _salt(t: pa.Table) -> pa.Table:
        hot = np.sort(ray.get(hot_ref))
        k = t[key_col].combine_chunks().to_numpy(zero_copy_only=False)
        if salt_source_col is not None:
            src = t[salt_source_col].combine_chunks().to_numpy(zero_copy_only=False)
            h = hash2(src.astype(np.uint64), 0x5A17)
        else:
            h = splitmix64(np.arange(len(t), dtype=np.uint64))
        salt = (h % np.uint64(n_salts)).astype(np.int64)
        pos = np.searchsorted(hot, k)
        pos_c = np.clip(pos, 0, max(0, len(hot) - 1))
        is_hot = (len(hot) > 0) & np.zeros(len(k), dtype=bool) if len(hot) == 0 else hot[pos_c] == k
        salt = np.where(is_hot, salt, 0)
        return t.append_column(salt_col, pa.array(salt, pa.int64()))

    return ds.map_batches(_salt, batch_format="pyarrow")


def salted_group_counts(
    ds,
    key_col: str,
    hot_threshold: int = 100_000,
    n_salts: int = 16,
):
    """End-to-end demonstration: exact per-key counts under skew.
    count-pass → salt hot keys → groupby (key, salt) partial counts →
    groupby key final sum. Every shuffled group ≤ max(threshold,
    total/n_salts) rows."""
    hot = detect_hot_keys(ds, key_col, hot_threshold)
    salted = add_salt(ds, key_col, hot, n_salts=n_salts)
    partial = partial_group_agg(salted, keys=[key_col, "__salt"], count_as="n")
    final = partial_group_agg(partial, keys=[key_col], sum_cols=["n"], count_as=None)
    return final.map_batches(
        lambda t: pa.table(
            {key_col: t[key_col].combine_chunks(), "n": t["sum_n"].combine_chunks()}
        ),
        batch_format="pyarrow",
    )
