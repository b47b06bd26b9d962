"""Generic partial→final grouped aggregation, bucketed.

The scalable-groupby building block used by every counting query:

1. a vectorized within-batch combine (``map_batches`` emitting ≤1 row
   per key per batch) so the shuffle moves pre-aggregated rows, not raw
   data — hot keys cost O(#batches), not O(#rows);
2. partials hash into ``n_buckets`` reduce buckets and ONE vectorized
   merge runs per bucket (``groupby('__bucket').map_groups``) — Ray's
   built-in per-group aggregation costs ~45µs of Python per group on
   this box, which at 10^6+ distinct keys dominates everything; the
   bucketed merge makes per-group cost O(buckets) instead.

Integer-only sums by design: int64 addition is associative, so results
are bit-identical at any parallelism — float accumulations are refused
(callers quantize or use min/max, which are exact selections).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from rio_cogeo_ray.functions.hashing import hash_columns

#: (input column, output column, op) — op in {sum, min, max, count}
_Spec = Tuple[str, str, str]


def _reduce_table(batch: pa.Table, keys: Sequence[str], specs: Sequence[_Spec]) -> pa.Table:
    """Vectorized multi-key reduce of a table: one sort + reduceat pass.
    ``count`` op sums an EXISTING count column (merge) — the initial
    count is produced by the `_initial_specs` wrapper as sum of ones."""
    if len(batch) == 0:
        fields = [(k, batch.schema.field(k).type) for k in keys]
        for src, dst, op in specs:
            typ = pa.int64() if op in ("sum", "count") else batch.schema.field(src).type
            fields.append((dst, typ))
        return pa.schema(fields).empty_table()
    batch = batch.sort_by([(k, "ascending") for k in keys])
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
    for src, dst, op in specs:
        if op == "rows":
            cols.append(pa.array((ends - starts).astype(np.int64), pa.int64()))
            names.append(dst)
            continue
        if op in ("sum", "count"):
            arr = batch[src].combine_chunks()
            if not pa.types.is_integer(arr.type):
                raise TypeError(
                    f"grouped sums must be integer columns (got {arr.type} for "
                    f"{src!r}); quantize floats explicitly or use min/max"
                )
            if arr.null_count:
                # NULL-SKIPPING sum (SQL semantics): nulls contribute 0,
                # an all-null group yields null. Nullable int columns
                # arrive as a float64 numpy view — refill from Arrow to
                # stay int64-exact past 2^53. Null partials re-merge
                # through this same branch, so the rule is recursive.
                valid = pc.is_valid(arr).to_numpy(zero_copy_only=False)
                vi = arr.fill_null(0).to_numpy(zero_copy_only=False)
                out = np.add.reduceat(vi.astype(np.int64), starts)
                n_valid = np.add.reduceat(valid.astype(np.int64), starts)
                cols.append(
                    pa.array(
                        np.where(n_valid > 0, out, 0),
                        pa.int64(),
                        mask=n_valid == 0,
                    )
                )
            else:
                v = arr.to_numpy(zero_copy_only=False)
                out = np.add.reduceat(v.astype(np.int64), starts)
                cols.append(pa.array(out, pa.int64()))
        elif op in ("min", "max"):
            typ = batch.schema.field(src).type
            arr = batch[src].combine_chunks()
            v = arr.to_numpy(zero_copy_only=False)
            if arr.null_count and np.issubdtype(v.dtype, np.floating):
                # nulls surface as NaN in the numpy view: NaN-IGNORING
                # reduce (SQL MIN/MAX skip nulls), all-null group → null.
                # Integer columns ride a float64 view here, exact to
                # 2^53 — fine for ids/counts; columns without nulls
                # never enter this branch and stay int64-exact.
                red = (np.fmin if op == "min" else np.fmax).reduceat(v, starts)
                cols.append(pa.array(red, typ, from_pandas=True))
            else:
                red = (np.minimum if op == "min" else np.maximum).reduceat(v, starts)
                cols.append(pa.array(red, typ))
        else:  # pragma: no cover
            raise ValueError(op)
        names.append(dst)
    return pa.Table.from_arrays(cols, names=names)


def partial_group_agg(
    ds,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
    count_as: Optional[str] = "n",
    batch_size: int = 65536,
    n_buckets: int = 64,
    coalesce: Optional[int] = None,
):
    """groupby(keys) with int sums / exact min / exact max / count.
    Output column names: sum_<c>, min_<c>, max_<c>, <count_as> — name
    them identically in the oracle SQL.

    ``coalesce``: merge partials into this many blocks before the
    groupby. The sort exchange costs one map+merge task per input
    block, so hundreds of small partial blocks dominate wall time;
    callers that know the input size should pass ``≈ bytes / 8 MiB``
    (clamped to [1, n_buckets]). Off by default — coalescing SPLITS
    when the input has fewer blocks than the target, which hurts tiny
    inputs (reduce parallelism is capped at n_buckets groups anyway).
    """
    keys = list(keys)
    init_specs: List[_Spec] = (
        [(c, f"sum_{c}", "sum") for c in sum_cols]
        + [(c, f"min_{c}", "min") for c in min_cols]
        + [(c, f"max_{c}", "max") for c in max_cols]
        + ([(count_as, count_as, "rows")] if count_as else [])
    )
    merge_specs: List[_Spec] = (
        [(f"sum_{c}", f"sum_{c}", "sum") for c in sum_cols]
        + [(f"min_{c}", f"min_{c}", "min") for c in min_cols]
        + [(f"max_{c}", f"max_{c}", "max") for c in max_cols]
        + ([(count_as, count_as, "sum")] if count_as else [])
    )

    partial = ds.map_batches(
        lambda t: _reduce_table(t, keys, init_specs),
        batch_format="pyarrow",
        batch_size=batch_size,
    )

    def _bucket(t: pa.Table) -> pa.Table:
        b = (hash_columns(t, keys) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("__bucket", pa.array(b, pa.int64()))

    bucketed = partial.map_batches(_bucket, batch_format="pyarrow")
    if coalesce is not None:
        bucketed = bucketed.repartition(min(coalesce, n_buckets))
    return bucketed.groupby("__bucket").map_groups(
        lambda g: _reduce_table(g.drop_columns(["__bucket"]), keys, merge_specs),
        batch_format="pyarrow",
    )


def _argmax_rows(batch: pa.Table, keys: Sequence[str], order_by: Sequence[str]) -> pa.Table:
    """One surviving ROW per key group: the lexicographic max of the
    ``order_by`` columns (each compared descending). Deterministic iff
    ``order_by`` ends in a unique column (callers append the row id)."""
    if len(batch) == 0:
        return batch
    batch = batch.sort_by(
        [(k, "ascending") for k in keys] + [(c, "descending") for c in order_by]
    )
    karrs = [batch[k].combine_chunks().to_numpy(zero_copy_only=False) for k in keys]
    new = np.zeros(len(batch), dtype=bool)
    new[0] = True
    for ka in karrs:
        new[1:] |= ka[1:] != ka[:-1]
    return batch.take(pa.array(np.flatnonzero(new), pa.int64()))


def latest_by(
    ds,
    keys: Sequence[str],
    order_by: Sequence[str],
    batch_size: int = 65536,
    n_buckets: int = 64,
):
    """Keep exactly one row per key: the argmax of ``order_by`` — the
    snapshot-dedup staple (newest crawl per url, last event per user).

    Same partial→final shape as :func:`partial_group_agg` (argmax is an
    associative selection, so it combines per batch first): the shuffle
    moves ≤1 candidate row per key per batch, never the raw stream, and
    the final per-bucket argmax is one vectorized sort+mask — per-group
    Python cost O(buckets), not O(keys). Equivalent to SQL
    ``ROW_NUMBER() OVER (PARTITION BY keys ORDER BY order_by DESC...) = 1``.
    """
    keys = list(keys)
    order_by = list(order_by)
    partial = ds.map_batches(
        lambda t: _argmax_rows(t, keys, order_by),
        batch_format="pyarrow",
        batch_size=batch_size,
    )

    def _bucket(t: pa.Table) -> pa.Table:
        b = (hash_columns(t, keys) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("__bucket", pa.array(b, pa.int64()))

    bucketed = partial.map_batches(_bucket, batch_format="pyarrow")
    return bucketed.groupby("__bucket").map_groups(
        lambda g: _argmax_rows(g.drop_columns(["__bucket"]), keys, order_by),
        batch_format="pyarrow",
    )


def pivot_counts(
    ds,
    row_key: str,
    col_key: str,
    col_values: Sequence[str],
    prefix: str = "n_",
    n_buckets: int = 16,
):
    """Crosstab / pivot: one output row per ``row_key`` value with one
    int64 count column per listed ``col_key`` value (``prefix`` +
    value), plus ``other`` for values outside the list.

    The column domain is CALLER-SUPPLIED (a pivot's schema must be
    known up front — the SQL equivalent is the explicit
    SUM(CASE WHEN ...) list), so the wide schema is fixed and the
    whole reshape is just a partial_group_agg over per-batch
    one-hot-expanded counts: shuffle volume is one partial row per
    (row_key, batch), never raw rows, regardless of fan-in.
    """
    cols = list(col_values)
    if "other" in cols:
        raise ValueError(
            "col_values may not contain the literal 'other' — it names the "
            "catch-all column; rename the category or change prefix"
        )
    out_names = [prefix + str(v) for v in cols] + [prefix + "other"]
    if row_key in out_names or len(set(out_names)) != len(out_names):
        raise ValueError(f"pivot output column collision in {out_names!r}")

    def _expand(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cv = t[col_key].combine_chunks()
        arrs = {row_key: t[row_key].combine_chunks()}
        hit_any = np.zeros(len(t), dtype=bool)
        for v, name in zip(cols, out_names):
            # null col_key counts as non-match (lands in "other")
            m = pc.fill_null(pc.equal(cv, v), False).to_numpy(zero_copy_only=False)
            arrs[name] = pa.array(m.astype(np.int64), pa.int64())
            hit_any |= m
        arrs[out_names[-1]] = pa.array((~hit_any).astype(np.int64), pa.int64())
        return pa.table(arrs)

    agged = partial_group_agg(
        ds.map_batches(_expand, batch_format="pyarrow"),
        keys=[row_key],
        sum_cols=out_names,
        count_as=None,
        n_buckets=n_buckets,
    )

    def _rename(t: pa.Table) -> pa.Table:
        return t.rename_columns([row_key] + out_names)

    return agged.map_batches(_rename, batch_format="pyarrow")


def melt(
    ds,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "metric",
    value_name: str = "val",
):
    """Unpivot (wide → long, the inverse of pivot_counts): each input
    row explodes into one (id_cols..., metric, val) row per listed
    value column. Pure map-side reshape — no shuffle, fan-out =
    len(value_cols) — built from one sub-table concat per metric (no
    per-row Python). All value columns must share one type (the long
    ``val`` column's type); the SQL equivalent is the UNION ALL list.
    """
    ids = list(id_cols)
    vals = list(value_cols)

    def _melt(t: pa.Table) -> pa.Table:
        parts = []
        for v in vals:
            cols = {c: t[c] for c in ids}
            cols[var_name] = pa.repeat(pa.scalar(v, pa.string()), len(t))
            cols[value_name] = t[v]
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.map_batches(_melt, batch_format="pyarrow")


def _topk_rows(
    batch: pa.Table, keys: Sequence[str], order_by: Sequence[Tuple[str, str]], k: int
) -> pa.Table:
    """Top-``k`` surviving ROWS per key group under the (col, dir)
    ``order_by`` spec — the k-generalization of :func:`_argmax_rows`
    (k=1 reduces to it). Deterministic iff ``order_by`` ends in a
    unique column. One vectorized sort + run-rank mask, no per-group
    Python."""
    if len(batch) == 0:
        return batch
    batch = batch.sort_by(
        [(c, "ascending") for c in keys] + [(c, d) for c, d in order_by]
    )
    karrs = [batch[c].combine_chunks().to_numpy(zero_copy_only=False) for c in keys]
    new = np.zeros(len(batch), dtype=bool)
    new[0] = True
    for ka in karrs:
        new[1:] |= ka[1:] != ka[:-1]
    idx = np.arange(len(batch), dtype=np.int64)
    run_start = np.maximum.accumulate(np.where(new, idx, 0))
    rank = idx - run_start
    return batch.take(pa.array(np.flatnonzero(rank < k), pa.int64()))


def top_rows_by(
    ds,
    keys: Sequence[str],
    order_by: Sequence[Tuple[str, str]],
    k: int,
    batch_size: int = 65536,
    n_buckets: int = 64,
):
    """Keep at most ``k`` rows per key — the per-domain/per-host corpus
    cap every web-crawl pipeline applies so no single site dominates
    the training mix (and the generic per-key-top-k rows primitive:
    newest k crawls per url, best k candidates per query, ...).

    Same partial→final shape as :func:`latest_by`: per-key top-k is an
    associative selection, so each input batch collapses to ≤k
    candidate rows per key BEFORE the exchange — the shuffle moves
    O(k · keys_per_batch) rows, never the raw stream — and the final
    per-bucket pass is one vectorized sort + run-rank mask. Equivalent
    to SQL ``ROW_NUMBER() OVER (PARTITION BY keys ORDER BY order_by)
    <= k``. ``order_by`` entries are (column, 'ascending'|'descending')
    and must end in a unique column for a deterministic result.

    100 TB contract: output ≤ k rows per distinct key by construction;
    hot keys (a host with 10^8 pages) cost one ≤k-row partial per
    input batch, so the reduce bucket sees O(k · n_batches) rows for
    that key, not 10^8 — no salting needed.
    """
    keys = list(keys)
    order_by = [(c, d) for c, d in order_by]
    partial = ds.map_batches(
        lambda t: _topk_rows(t, keys, order_by, k),
        batch_format="pyarrow",
        batch_size=batch_size,
    )

    def _bucket(t: pa.Table) -> pa.Table:
        b = (hash_columns(t, keys) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("__bucket", pa.array(b, pa.int64()))

    bucketed = partial.map_batches(_bucket, batch_format="pyarrow")
    return bucketed.groupby("__bucket").map_groups(
        lambda g: _topk_rows(g.drop_columns(["__bucket"]), keys, order_by, k),
        batch_format="pyarrow",
    )


def grouping_sets_agg(
    leaf: pa.Table,
    keys: Sequence[str],
    sets: Sequence[Sequence[str]],
    specs: Sequence[Tuple[str, str]],
    all_label: str = "ALL",
) -> pa.Table:
    """GROUPING SETS / CUBE over a BOUNDED leaf aggregate: ``leaf`` is
    the finest-granularity result of the ONE distributed shuffle
    (partial_group_agg over all ``keys``); every coarser grouping set
    is an exact re-reduction of that small table on the driver — int64
    sums of int64 leaf sums, min of leaf mins — so no second corpus
    pass, no extra exchange, and every level stays order-independent.
    This is the q_lineitem_rollup doctrine generalized to arbitrary
    grouping sets (CUBE = all subsets). Rolled-up key columns surface
    as ``all_label`` (keys must be strings; mirror with
    ``COALESCE(col, 'ALL')`` + ``GROUP BY CUBE/GROUPING SETS``)."""
    import pyarrow.compute as pc

    keys = list(keys)
    for s in sets:
        unknown = set(s) - set(keys)
        if unknown:
            raise KeyError(f"grouping set {s} not a subset of keys: {unknown}")
    measure_names = [c for c, _ in specs]
    parts = []
    for s in sets:
        s = list(s)
        if s:
            g = leaf.group_by(s).aggregate(list(specs))
            g = g.rename_columns(s + measure_names)
        else:
            g = pa.table(
                {
                    c: pa.array(
                        [getattr(pc, op)(leaf[c]).as_py()],
                        leaf.schema.field(c).type if op != "sum" else pa.int64(),
                    )
                    for c, op in specs
                }
            )
        cols = {}
        for k in keys:
            cols[k] = (
                g[k] if k in s else pa.array([all_label] * len(g), pa.string())
            )
        for c in measure_names:
            cols[c] = g[c]
        parts.append(pa.table(cols))
    return pa.concat_tables(parts)


def combine_aggregates(
    agg_dses,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
    count_as: Optional[str] = "n",
    n_buckets: int = 64,
):
    """Incremental aggregate maintenance (the materialized-view merge):
    combine ALREADY-AGGREGATED tables — yesterday's persisted groupby
    result plus today's delta aggregate — into the aggregate of the
    union WITHOUT rescanning either input corpus. Sound because every
    partial_group_agg measure is associative and self-mergeable
    (int64 sums re-sum, mins re-min, counts re-sum); inputs union as
    Datasets and ride the standard bucketed merge, so the cost is
    O(Σ aggregate rows), independent of the corpus sizes that produced
    them. Inputs must share the partial_group_agg output schema
    (``sum_<c>``/``min_<c>``/``max_<c>``/``<count_as>``)."""
    keys = list(keys)
    merge_specs: List[_Spec] = (
        [(f"sum_{c}", f"sum_{c}", "sum") for c in sum_cols]
        + [(f"min_{c}", f"min_{c}", "min") for c in min_cols]
        + [(f"max_{c}", f"max_{c}", "max") for c in max_cols]
        + ([(count_as, count_as, "sum")] if count_as else [])
    )
    ds = agg_dses[0]
    for other in agg_dses[1:]:
        ds = ds.union(other)

    def _bucket(t: pa.Table) -> pa.Table:
        b = (hash_columns(t, keys) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("__bucket", pa.array(b, pa.int64()))

    return (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(
            lambda g: _reduce_table(g.drop_columns(["__bucket"]), keys, merge_specs),
            batch_format="pyarrow",
        )
    )


# ---------------------------------------------------------------------------
# Skyline (Pareto front)
# ---------------------------------------------------------------------------


def _skyline_table(t: pa.Table, dims: Sequence[str], signs: Sequence[int]) -> pa.Table:
    """Rows not dominated on the given dimensions. Row b dominates row
    a iff b is >= a on every (sign-adjusted) dim and > on at least one.
    Ties on all dims: both survive (neither strictly dominates).

    Kernel: sort by dim-sum descending — domination implies a STRICTLY
    greater sum, so every row's potential dominators precede it — then
    one pass comparing each row against the kept set (vectorized per
    row; the kept set is the running skyline, small in practice)."""
    if len(t) == 0:
        return t
    X = np.stack(
        [
            s * t[d].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
            for d, s in zip(dims, signs)
        ],
        axis=1,
    )
    order = np.argsort(-X.sum(axis=1), kind="stable")
    Xs = X[order]
    kept_rows: list = []
    kept = np.empty((0, X.shape[1]), dtype=np.int64)
    for i in range(len(Xs)):
        x = Xs[i]
        if len(kept_rows):
            dominated = np.any(np.all(kept >= x, axis=1) & np.any(kept > x, axis=1))
            if dominated:
                continue
        kept_rows.append(order[i])
        kept = np.vstack((kept, x[None, :]))
    idx = np.sort(np.asarray(kept_rows, dtype=np.int64))
    return t.take(pa.array(idx, pa.int64()))


def skyline(ds, dims: Sequence[str], maximize: Sequence[bool] | None = None):
    """Distributed skyline (Pareto front) over integer dimension
    columns: the rows not dominated by any other row. ``maximize[i]``
    False flips dim i to minimize (default: maximize every dim).

    Two-level combiner reduction — the skyline operator is idempotent
    and distributive (a globally non-dominated row is non-dominated in
    any subset containing it, so skyline(∪ local skylines) is exact):
    a per-batch local skyline prunes the stream map-side, survivors
    collapse to one block for the final pass. The final block is
    bounded by the sum of local skyline sizes — small for correlated
    dims; for adversarially anti-correlated data where the true
    skyline itself is huge, the operator's output is inherently that
    large and no algorithm shrinks it.

    Dims must be integer-valued (quantize floats first — same doctrine
    as every exact aggregate in this engine)."""
    dims = list(dims)
    if maximize is None:
        maximize = [True] * len(dims)
    signs = [1 if m else -1 for m in maximize]

    def _final(t: pa.Table) -> pa.Table:
        out = _skyline_table(t, dims, signs)
        # deterministic output order regardless of the block-concat
        # order repartition(1) happened to produce: sort by every
        # column (dims first, then the rest by name)
        rest = [c for c in out.column_names if c not in dims]
        return out.sort_by([(c, "ascending") for c in list(dims) + sorted(rest)])

    local = ds.map_batches(
        lambda t: _skyline_table(t, dims, signs), batch_format="pyarrow"
    )
    return local.repartition(1).map_batches(
        _final,
        batch_format="pyarrow",
        batch_size=None,
    )
