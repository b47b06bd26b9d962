"""Dataset profiling — per-column statistics in one streaming pass.

Training-data-pipeline utility (no reference ancestor; the north-rule
"know your corpus" step before any cleaning/dedup decision): row count,
null count, exact min/max, and optional approximate distinct count per
column, computed as per-batch partial stat rows merged on the driver —
the shuffled volume is one tiny row per (batch, column), never data.

Determinism: counts are int64; min/max are exact order statistics (no
accumulation), so results are identical at any parallelism. The
distinct estimate reuses the HLL register machinery (its ±1.6% noise is
deterministic too — same hashes, same registers).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _partial_profile(batch: pa.Table, cols: Sequence[str]) -> pa.Table:
    names, ns, nulls, mins, maxs = [], [], [], [], []
    for c in cols:
        col = batch[c]
        names.append(c)
        ns.append(len(batch))
        nulls.append(int(col.null_count))
        if len(batch) - col.null_count > 0 and (
            pa.types.is_integer(col.type)
            or pa.types.is_floating(col.type)
            or pa.types.is_temporal(col.type)
        ):
            mm = pc.min_max(col)
            mins.append(float(pc.cast(mm["min"], pa.float64()).as_py()))
            maxs.append(float(pc.cast(mm["max"], pa.float64()).as_py()))
        else:
            mins.append(None)
            maxs.append(None)
    return pa.table(
        {
            "column": pa.array(names, pa.string()),
            "n": pa.array(ns, pa.int64()),
            "nulls": pa.array(nulls, pa.int64()),
            "min": pa.array(mins, pa.float64()),
            "max": pa.array(maxs, pa.float64()),
        }
    )


def profile_columns(
    ds, cols: Optional[Sequence[str]] = None, batch_size: int = 65536
) -> pa.Table:
    """One-pass column profile: (column, n, nulls, min, max) — exact,
    SQL-mirrorable (COUNT / COUNT(NULL) / MIN / MAX per column).
    Numeric/temporal min-max cast to float64; other types profile
    count/nulls only. Partial rows per batch; the final merge sees
    O(columns · batches) tiny rows on the driver."""
    if cols is None:
        sch = ds.schema()
        # zero-block dataset: Ray cannot name a schema — profile of an
        # unknowable column set is the empty profile
        cols = [] if sch is None else [f.name for f in sch.base_schema]
    cols = list(cols)
    partials = ds.map_batches(
        lambda t: _partial_profile(t, cols),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    # seed every requested column so an empty dataset (zero batches)
    # yields n=0/nulls=0/min=max=null rows instead of a KeyError below
    acc = {c: {"n": 0, "nulls": 0, "min": None, "max": None} for c in cols}
    for row in partials.take_all():
        c = row["column"]
        cur = acc.setdefault(c, {"n": 0, "nulls": 0, "min": None, "max": None})
        cur["n"] += row["n"]
        cur["nulls"] += row["nulls"]
        for k, fn in (("min", min), ("max", max)):
            v = row[k]
            if v is not None:
                cur[k] = v if cur[k] is None else fn(cur[k], v)
    return pa.table(
        {
            "column": pa.array(cols, pa.string()),
            "n": pa.array([acc[c]["n"] for c in cols], pa.int64()),
            "nulls": pa.array([acc[c]["nulls"] for c in cols], pa.int64()),
            "min": pa.array([acc[c]["min"] for c in cols], pa.float64()),
            "max": pa.array([acc[c]["max"] for c in cols], pa.float64()),
        }
    )


def key_skew(ds, key_col: str, n_buckets: int = 64):
    """Join-key skew diagnostic: the multiplicity histogram of a key
    column — for every multiplicity m, how many distinct keys occur
    exactly m times and how many rows they carry. This is the planning
    input for the hot-key decisions the engine documents everywhere
    (salted joins, skew_salting, broadcast-vs-bucket choices): a long
    multiplicity tail means the bucketed exchange needs salting.

    Two chained partial->final aggregations: per-key counts (one row
    per distinct key per batch leaves the combiner), then the tiny
    histogram over counts. Output: (multiplicity, n_keys, total_rows)."""
    from rio_cogeo_ray.stages.agg import partial_group_agg

    per_key = partial_group_agg(
        ds, keys=[key_col], count_as="m", n_buckets=n_buckets
    )

    def _strip(t: pa.Table) -> pa.Table:
        return t.select(["m"])

    hist = partial_group_agg(
        per_key.map_batches(_strip, batch_format="pyarrow"),
        keys=["m"],
        sum_cols=["m"],
        count_as="n_keys",
        n_buckets=n_buckets,
    )

    def _final(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "multiplicity": t["m"].combine_chunks().cast(pa.int64()),
                "n_keys": t["n_keys"].combine_chunks().cast(pa.int64()),
                "total_rows": t["sum_m"].combine_chunks().cast(pa.int64()),
            }
        )

    return hist.map_batches(_final, batch_format="pyarrow")
