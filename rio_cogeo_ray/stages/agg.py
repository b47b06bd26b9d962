"""Generic partial→final grouped aggregation.

The scalable-groupby building block used by every counting query: a
vectorized within-batch combine (``map_batches`` emitting ≤1 row per key
per batch) followed by a small ``groupby().aggregate`` over the partials
— so the all-to-all shuffle moves pre-aggregated rows, not raw data, and
hot keys cost O(#batches), not O(#rows) (the skew story for counts).

Integer-only sums by design: int64 addition is associative, so results
are bit-identical at any parallelism — float accumulations are refused
(callers quantize or use min/max, which are exact selections).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pyarrow as pa

from ray.data.aggregate import Max, Min, Sum


def _batch_partial(
    batch: pa.Table,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    min_cols: Sequence[str],
    max_cols: Sequence[str],
    count_as: Optional[str],
) -> pa.Table:
    if len(batch) == 0:
        fields = [(k, batch.schema.field(k).type) for k in keys]
        fields += [(f"sum_{c}", pa.int64()) for c in sum_cols]
        fields += [(f"min_{c}", batch.schema.field(c).type) for c in min_cols]
        fields += [(f"max_{c}", batch.schema.field(c).type) for c in max_cols]
        if count_as:
            fields += [(count_as, pa.int64())]
        return pa.schema(fields).empty_table()
    sort_keys = [(k, "ascending") for k in keys]
    batch = batch.sort_by(sort_keys)
    karrs = [batch[k].combine_chunks().to_numpy(zero_copy_only=False) for k in keys]
    new = np.zeros(len(batch), dtype=bool)
    new[0] = True
    for ka in karrs:
        new[1:] |= ka[1:] != ka[:-1]
    starts = np.flatnonzero(new)
    ends = np.append(starts[1:], len(batch))
    cols, names = [], []
    for k, ka in zip(keys, karrs):
        cols.append(pa.array(ka[starts], batch.schema.field(k).type))
        names.append(k)
    for c in sum_cols:
        v = batch[c].combine_chunks().to_numpy(zero_copy_only=False)
        if not np.issubdtype(v.dtype, np.integer):
            raise TypeError(
                f"partial_group_agg sums must be integer columns (got {v.dtype} "
                f"for {c!r}); quantize floats explicitly or use min/max"
            )
        cols.append(pa.array(np.add.reduceat(v.astype(np.int64), starts), pa.int64()))
        names.append(f"sum_{c}")
    for c in min_cols:
        v = batch[c].combine_chunks().to_numpy(zero_copy_only=False)
        cols.append(pa.array(np.minimum.reduceat(v, starts), batch.schema.field(c).type))
        names.append(f"min_{c}")
    for c in max_cols:
        v = batch[c].combine_chunks().to_numpy(zero_copy_only=False)
        cols.append(pa.array(np.maximum.reduceat(v, starts), batch.schema.field(c).type))
        names.append(f"max_{c}")
    if count_as:
        cols.append(pa.array((ends - starts).astype(np.int64), pa.int64()))
        names.append(count_as)
    return pa.Table.from_arrays(cols, names=names)


def partial_group_agg(
    ds,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
    count_as: Optional[str] = "n",
    batch_size: int = 65536,
):
    """groupby(keys) with int sums / exact min / exact max / count,
    pre-combined per batch. Output column names: sum_<c>, min_<c>,
    max_<c>, <count_as> — name them identically in the oracle SQL."""
    keys = list(keys)
    partial = ds.map_batches(
        lambda t: _batch_partial(t, keys, sum_cols, min_cols, max_cols, count_as),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    aggs: List = []
    for c in sum_cols:
        aggs.append(Sum(f"sum_{c}", alias_name=f"sum_{c}"))
    for c in min_cols:
        aggs.append(Min(f"min_{c}", alias_name=f"min_{c}"))
    for c in max_cols:
        aggs.append(Max(f"max_{c}", alias_name=f"max_{c}"))
    if count_as:
        aggs.append(Sum(count_as, alias_name=count_as))
    return partial.groupby(keys).aggregate(*aggs)
