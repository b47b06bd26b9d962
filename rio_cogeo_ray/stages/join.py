"""Joins — broadcast (small side) and bucketed hash (both sides large).

The Ray-Data-first join split (ray_guide.md):

- :func:`broadcast_join` — dimension-table pattern: the small side is
  ``ray.put`` once and each actor materializes a hash index in
  ``__init__``; per batch it's a vectorized ``searchsorted`` lookup. No
  shuffle at all (the engine analog of the reference's colormap
  broadcast, cogeo.py:345-360).
- :func:`bucketed_hash_join` — explicit partitioned hash join: both
  sides get ``bucket = hash(key) % B``, matching buckets meet in ONE
  ``groupby("bucket").map_groups`` over the union (side-tagged), and
  each bucket joins via pyarrow's native hash join. B sizes buckets to worker heaps;
  deterministic output via per-bucket sort. Ray 2.49 has no
  ``Dataset.join``, so this IS the large-large join primitive here.
  Skew: a hot KEY still lands in one bucket — for known-skewed keys use
  ``broadcast_join`` on the hot subset (documented partitioning
  assumption).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import numpy as np
import pyarrow as pa

import ray

from rio_cogeo_ray.functions.hashing import splitmix64


def colormap_table(mapping) -> "pa.Table":
    """User-supplied categorical colormap → broadcastable lookup table —
    the engine's API hook for the reference's external colormap param
    (rio_cogeo/cogeo.py:99, tests/test_cogeo.py:503-543). ``mapping``:
    {key: (category:int, color:str)} or {key: color} (categories then
    enumerate keys in sorted order, deterministic)."""
    keys = sorted(mapping)
    vals = [mapping[k] for k in keys]
    if vals and not isinstance(vals[0], (tuple, list)):
        vals = [(i, v) for i, v in enumerate(vals)]
    return pa.table(
        {
            "lang": pa.array([str(k) for k in keys], pa.string()),
            "category": pa.array([int(v[0]) for v in vals], pa.int32()),
            "color": pa.array([str(v[1]) for v in vals], pa.string()),
        }
    )


class BroadcastLookup:
    """Actor callable: left batch + broadcast right table → joined batch.

    ``right`` is sorted by key once per actor; per batch the join is one
    ``np.searchsorted``. inner ('semi'/'anti' variants filter only)."""

    def __init__(
        self,
        right: Union[pa.Table, "ray.ObjectRef"],
        on: str,
        right_cols: Optional[Sequence[str]] = None,
        mode: str = "inner",
    ):
        if isinstance(right, ray.ObjectRef):
            right = ray.get(right)
        self.on = on
        self.mode = mode
        keys = right[on].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        self.keys = keys[order]
        if len(self.keys) > 1 and np.any(self.keys[1:] == self.keys[:-1]):
            # the searchsorted lookup resolves ONE right row per key; a
            # duplicate-keyed right side would silently drop fan-out
            # matches — the broadcast contract is a dimension table.
            raise ValueError(
                f"BroadcastLookup right side has duplicate {on!r} keys; "
                "dedupe it or use hash_join for one-to-many joins"
            )
        cols = [c for c in (right_cols or right.column_names) if c != on]
        self.right = right.select(cols).take(pa.array(order))

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.on].combine_chunks()
        valid = ~col.is_null().to_numpy(zero_copy_only=False)
        lk = col.to_numpy(zero_copy_only=False)
        if len(self.keys) == 0:
            hit = np.zeros(len(lk), dtype=bool)
            pos_c = np.zeros(len(lk), dtype=np.int64)
        else:
            # a NULL probe never matches (SQL join semantics); swap in
            # a sentinel so searchsorted never compares against None
            safe = np.where(valid, lk, self.keys[0])
            pos = np.searchsorted(self.keys, safe)
            pos_c = np.clip(pos, 0, len(self.keys) - 1)
            hit = (self.keys[pos_c] == safe) & valid
        if self.mode == "semi":
            return batch.filter(pa.array(hit))
        if self.mode == "anti":
            return batch.filter(pa.array(~hit))
        out = batch.filter(pa.array(hit))
        take = pa.array(pos_c[hit], pa.int64())
        for name in self.right.column_names:
            out = out.append_column(name, self.right[name].take(take))
        return out


def broadcast_join(
    ds,
    right: pa.Table,
    on: str,
    right_cols: Optional[Sequence[str]] = None,
    mode: str = "inner",
    concurrency: int = 4,
    batch_size: int = 65536,
):
    right_ref = ray.put(right)
    return ds.map_batches(
        BroadcastLookup,
        fn_constructor_args=(right_ref, on, right_cols, mode),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class RangeLookup:
    """Actor callable: left batch + broadcast INTERVAL table → joined
    batch. The right side is a set of [lo, hi) intervals with payload
    columns; each left row's ``value_col`` resolves to the containing
    interval via one ``np.searchsorted`` over the sorted interval
    starts + an upper-bound check — the broadcast range-join pattern
    (small dimension of bands/buckets/tiers against a large fact side;
    no shuffle). Intervals must be non-overlapping (asserted)."""

    def __init__(
        self,
        right: Union[pa.Table, "ray.ObjectRef"],
        value_col: str,
        lo_col: str = "lo",
        hi_col: str = "hi",
        mode: str = "inner",
    ):
        if isinstance(right, ray.ObjectRef):
            right = ray.get(right)
        if mode not in ("inner", "semi", "anti"):
            raise ValueError(f"mode must be inner/semi/anti, got {mode!r}")
        self.value_col = value_col
        self.mode = mode
        lo = right[lo_col].combine_chunks().to_numpy(zero_copy_only=False)
        hi = right[hi_col].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(lo, kind="stable")
        self.lo, self.hi = lo[order], hi[order]
        if np.any(self.hi[:-1] > self.lo[1:]) or np.any(self.hi <= self.lo):
            raise ValueError(
                "RangeLookup intervals must be non-empty and non-overlapping"
            )
        cols = [c for c in right.column_names if c not in (lo_col, hi_col)]
        self.right = right.select(cols).take(pa.array(order))

    def __call__(self, batch: pa.Table) -> pa.Table:
        v = batch[self.value_col].combine_chunks().to_numpy(zero_copy_only=False)
        if len(self.lo) == 0:
            hit = np.zeros(len(v), dtype=bool)
            pos = np.zeros(len(v), dtype=np.int64)
        else:
            pos = np.searchsorted(self.lo, v, side="right") - 1
            inb = pos >= 0
            hit = inb.copy()
            hit[inb] = v[inb] < self.hi[pos[inb]]
            pos = np.clip(pos, 0, len(self.lo) - 1)
        if self.mode == "semi":
            return batch.filter(pa.array(hit))
        if self.mode == "anti":
            return batch.filter(pa.array(~hit))
        out = batch.filter(pa.array(hit))
        take = pa.array(pos[hit], pa.int64())
        for name in self.right.column_names:
            out = out.append_column(name, self.right[name].take(take))
        return out


def broadcast_range_join(
    ds,
    right: pa.Table,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    mode: str = "inner",
    concurrency: int = 4,
    batch_size: int = 65536,
):
    """Join each row to the [lo, hi) interval containing ``value_col``
    (banding/tiering — the range-join flavor Ray Data lacks natively).
    Small interval side broadcast once via ``ray.put``."""
    right_ref = ray.put(right)
    return ds.map_batches(
        RangeLookup,
        fn_constructor_args=(right_ref, value_col, lo_col, hi_col, mode),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class IntervalLookup:
    """Broadcast interval join with OVERLAPPING intervals: each left
    row fans out to EVERY interval whose ``[lo, hi)`` contains its
    ``value_col`` (the general range-join flavor — ``RangeLookup`` is
    the non-overlapping fast path). Built once per actor: elementary
    segment decomposition of the interval endpoints + a CSR
    segment→interval-ids index, so a batch resolves via ONE
    ``searchsorted`` against the segment boundaries + a vectorized CSR
    gather — per-batch cost O(rows + output), no per-interval scan."""

    def __init__(
        self,
        right: Union[pa.Table, "ray.ObjectRef"],
        value_col: str,
        lo_col: str = "lo",
        hi_col: str = "hi",
    ):
        if isinstance(right, ray.ObjectRef):
            right = ray.get(right)
        self.value_col = value_col
        lo = right[lo_col].combine_chunks().to_numpy(zero_copy_only=False)
        hi = right[hi_col].combine_chunks().to_numpy(zero_copy_only=False)
        if np.any(hi <= lo):
            raise ValueError("IntervalLookup intervals must be non-empty (lo < hi)")
        # elementary segments between consecutive sorted endpoints; a
        # value in segment s is inside interval i iff lo[i] <= B[s] and
        # B[s+1] <= hi[i] (containment is constant within a segment).
        bounds = np.unique(np.concatenate((lo, hi)))
        # empty right table: len(bounds)==0 would make n_seg == -1 and
        # np.zeros(-1) raise; clamp so __call__'s empty-bounds path is live
        n_seg = max(len(bounds) - 1, 0)
        seg_ids: list = []
        offsets = np.zeros(n_seg + 1, dtype=np.int64)
        s_lo = np.searchsorted(bounds, lo, side="left")
        s_hi = np.searchsorted(bounds, hi, side="left")
        counts = np.zeros(n_seg, dtype=np.int64)
        for i in range(len(lo)):
            counts[s_lo[i]:s_hi[i]] += 1
        offsets[1:] = np.cumsum(counts)
        fill = offsets[:-1].copy()
        members = np.empty(int(offsets[-1]), dtype=np.int64)
        for i in range(len(lo)):
            a, b = s_lo[i], s_hi[i]
            for s in range(a, b):
                members[fill[s]] = i
                fill[s] += 1
        self.bounds = bounds
        self.offsets = offsets
        self.members = members
        cols = [c for c in right.column_names if c not in (lo_col, hi_col)]
        self.right = right.select(cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        v = batch[self.value_col].combine_chunks().to_numpy(zero_copy_only=False)
        if len(self.bounds) == 0:
            seg = np.full(len(v), -1, dtype=np.int64)
        else:
            seg = np.searchsorted(self.bounds, v, side="right") - 1
        inb = (seg >= 0) & (seg < len(self.offsets) - 1)
        seg_c = np.where(inb, seg, 0)
        counts = np.where(inb, self.offsets[seg_c + 1] - self.offsets[seg_c], 0)
        total = int(counts.sum())
        row_take = np.repeat(np.arange(len(v), dtype=np.int64), counts)
        # CSR gather: position-within-run arange trick (no Python loop)
        ends = np.cumsum(counts)
        pos = np.arange(total, dtype=np.int64) - np.repeat(ends - counts, counts)
        ividx = self.members[np.repeat(self.offsets[seg_c], counts) + pos]
        out = batch.take(pa.array(row_take, pa.int64()))
        take = pa.array(ividx, pa.int64())
        for name in self.right.column_names:
            out = out.append_column(name, self.right[name].take(take))
        return out


def broadcast_interval_join(
    ds,
    right: pa.Table,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    concurrency: int = 4,
    batch_size: int = 65536,
):
    """Fan-out join of each row to ALL overlapping ``[lo, hi)``
    intervals containing ``value_col``. Small interval side broadcast
    once via ``ray.put``; the segment index builds once per actor in
    ``__init__``."""
    right_ref = ray.put(right)
    return ds.map_batches(
        IntervalLookup,
        fn_constructor_args=(right_ref, value_col, lo_col, hi_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# Bucketed hash join (both sides large)
# ---------------------------------------------------------------------------


def _empty_join_like(lsch, rsch, key_cols, suffix: str, include_right: bool):
    """Empty join result when a side's schema is unknowable (a dataset
    with zero blocks — Ray erases schema downstream of transforms on
    all-empty input): an empty Dataset carrying every KNOWN column,
    with the shared-column suffix rule applied when both sides are
    known. Keeps empty-input pipelines flowing instead of crashing on
    ``schema().base_schema``."""
    import ray.data as rd

    cols: dict = {}
    if lsch is not None:
        for f in lsch.base_schema:
            cols[f.name] = pa.array([], f.type)
    if include_right and rsch is not None:
        for f in rsch.base_schema:
            name = f.name
            if name in key_cols:
                if name in cols:
                    continue
            elif name in cols:
                name = name + suffix
            cols[name] = pa.array([], f.type)
    return rd.from_arrow(pa.table(cols))


def _with_bucket(t: pa.Table, on, n_buckets: int, side: int) -> pa.Table:
    """ONE bucket-hash path for every key shape: hash_columns chains
    int keys through splitmix64 and hashes string keys natively, so a
    single string key, a single int key and composite keys all route
    identically (bucket choice only — matching keys co-locate under
    any hash)."""
    from rio_cogeo_ray.functions.hashing import hash_columns

    cols = [on] if isinstance(on, str) else list(on)
    b = (hash_columns(t, cols) % np.uint64(n_buckets)).astype(np.int64)
    t = t.append_column("__bucket", pa.array(b, pa.int64()))
    return t.append_column("__side", pa.array(np.full(len(t), side, dtype=np.int8), pa.int8()))


def bucketed_hash_join(
    left,
    right,
    on: str,
    n_buckets: int = 64,
    how: str = "inner",
    suffix: str = "_r",
    coalesce: Optional[int] = None,
):
    """Partitioned hash join of two Datasets on an int64 key column.

    Both sides are tagged and bucketed by ``hash(key) % n_buckets``; one
    ``groupby('__bucket')`` co-locates matching keys; each bucket joins
    via pyarrow's native multithreaded hash join.

    ``coalesce``: merge the tagged union into this many blocks before
    the groupby (see stages/agg.py:partial_group_agg — same trade-off:
    big win when both sides arrive as many small blocks, a SPLIT and a
    loss on tiny inputs, so off by default).

    ``how='semi'`` / ``'anti'`` return LEFT columns only (existence
    filter against the right side) — the large-large counterpart of
    ``BroadcastLookup(mode='semi'/'anti')`` for when the filter side is
    too big to broadcast; duplicate right keys are fine (presence test).

    ``on`` may be a single column name or a list (composite key): the
    bucket hash chains every key column (functions/hashing.py:
    hash_columns) and pyarrow's hash join receives the full key list.
    """
    on_cols = [on] if isinstance(on, str) else list(on)
    if how in ("semi", "anti"):
        # existence filter: only right KEYS shuffle, payload never moves
        right = right.select_columns(on_cols)
    # Schema-resolution doctrine (the jaccard super-linearity lesson):
    # the schema fetch below PARTIALLY executes a lazy side — cheap for
    # map-only chains (first block), but a side whose upstream contains
    # an ALL-TO-ALL stage (groupby/partial_group_agg/another join) pays
    # the full shuffle for the fetch and then AGAIN for the join
    # itself. Callers must .materialize() such inputs at the callsite
    # (see simjoin.jaccard_self_join); a blanket materialize here was
    # measured 40× WORSE on iterative map-chain loops (k_core
    # 12 s → 510 s), so the join does not decide for you.
    lsch, rsch = left.schema(), right.schema()
    if lsch is None or rsch is None:
        if how in ("anti", "left", "outer") and rsch is None and lsch is not None:
            # empty right side: anti keeps everything; left/outer keep
            # all left rows (the unknowable right columns are
            # necessarily empty)
            return left
        if how in ("right", "outer") and lsch is None and rsch is not None:
            # empty left side: right/outer keep all right rows
            return right
        return _empty_join_like(
            lsch, rsch, set(on_cols), suffix, how not in ("semi", "anti")
        )
    lcols = [f.name for f in lsch.base_schema]
    rcols = [f.name for f in rsch.base_schema]
    shared = (set(lcols) & set(rcols)) - set(on_cols)

    lt = left.map_batches(lambda t: _with_bucket(t, on_cols, n_buckets, 0), batch_format="pyarrow")
    rt = right.map_batches(lambda t: _with_bucket(t, on_cols, n_buckets, 1), batch_format="pyarrow")

    r_only = [c for c in rcols if c not in on_cols]
    r_types = [right.schema().base_schema.field(c).type for c in r_only]
    l_only = [c for c in lcols if c not in on_cols]
    l_types = [left.schema().base_schema.field(c).type for c in l_only]
    out_r_cols = [c if c not in shared else c + suffix for c in r_only]
    # union requires one exact schema: canonical column order, other
    # side's columns padded with nulls
    canonical = on_cols + l_only + out_r_cols + ["__bucket", "__side"]

    def _pad_left(t: pa.Table) -> pa.Table:
        for name, typ in zip(out_r_cols, r_types):
            t = t.append_column(name, pa.nulls(len(t), typ))
        return t.select(canonical)

    def _pad_right(t: pa.Table) -> pa.Table:
        names = [c if c not in shared else c + suffix for c in t.column_names]
        t = t.rename_columns(names)
        for name, typ in zip(l_only, l_types):
            t = t.append_column(name, pa.nulls(len(t), typ))
        return t.select(canonical)

    lt = lt.map_batches(_pad_left, batch_format="pyarrow")
    rt = rt.map_batches(_pad_right, batch_format="pyarrow")
    both = lt.union(rt)
    if coalesce is not None:
        both = both.repartition(min(coalesce, n_buckets))

    arrow_how = {"inner": "inner", "left": "left outer", "right": "right outer",
                 "outer": "full outer", "semi": "left semi", "anti": "left anti"}[how]
    out_cols = on_cols + l_only if how in ("semi", "anti") else on_cols + l_only + out_r_cols

    def _join_bucket(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        side = g["__side"].combine_chunks()
        lg = g.filter(pc.equal(side, 0)).select(on_cols + l_only)
        rg = g.filter(pc.equal(side, 1)).select(on_cols + out_r_cols)
        # padded typed nulls keep Arrow types exact through the union, so
        # the native multithreaded hash join needs no re-casting
        if how in ("semi", "anti"):
            # existence filter: only the right KEYS matter
            m = lg.join(rg.select(on_cols), keys=on_cols, join_type=arrow_how)
        else:
            m = lg.join(rg, keys=on_cols, join_type=arrow_how)
        return m.sort_by([(c, "ascending") for c in on_cols]).select(out_cols)

    return both.groupby("__bucket").map_groups(_join_bucket, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# As-of join (time-series lookup)
# ---------------------------------------------------------------------------


def asof_join(
    left,
    right,
    on: str,
    by: str,
    direction: str = "backward",
    n_buckets: int = 32,
    suffix: str = "_r",
    coalesce: Optional[int] = None,
):
    """As-of join: for each left row, the nearest right row with
    ``right.on <= left.on`` (backward) within the same ``by`` key.

    Both sides bucket by ``hash(by) % n_buckets`` (co-locates each key's
    full history); each bucket runs a pure Arrow/numpy lexsort-merge
    kernel (no pandas round-trip — see ``_asof_bucket``). Inner
    semantics: left rows with no match are dropped (DuckDB ASOF JOIN).
    """
    lsch, rsch = left.schema(), right.schema()
    if lsch is None or rsch is None:
        # inner asof semantics: an all-empty side (schema erased by
        # zero blocks) means zero matches
        return _empty_join_like(lsch, rsch, {by}, suffix, True)
    lcols = [f.name for f in lsch.base_schema]
    rcols = [f.name for f in rsch.base_schema]
    shared = (set(lcols) & set(rcols)) - {on, by}

    lt = left.map_batches(lambda t: _with_bucket(t, by, n_buckets, 0), batch_format="pyarrow")
    rt = right.map_batches(lambda t: _with_bucket(t, by, n_buckets, 1), batch_format="pyarrow")

    r_only = [c for c in rcols if c not in (on, by)]
    r_types = [right.schema().base_schema.field(c).type for c in r_only]
    l_only = [c for c in lcols if c not in (on, by)]
    l_types = [left.schema().base_schema.field(c).type for c in l_only]
    out_r_cols = [c if c not in shared else c + suffix for c in r_only]
    r_on = on + suffix  # right's timestamp kept for the caller
    canonical = [by, on, r_on] + l_only + out_r_cols + ["__bucket", "__side"]

    def _pad_left(t: pa.Table) -> pa.Table:
        t = t.append_column(r_on, pa.nulls(len(t), t.schema.field(on).type))
        for name, typ in zip(out_r_cols, r_types):
            t = t.append_column(name, pa.nulls(len(t), typ))
        return t.select(canonical)

    def _pad_right(t: pa.Table) -> pa.Table:
        names = [c if c not in shared else c + suffix for c in t.column_names]
        t = t.rename_columns(names)
        t = t.append_column(r_on, t[on])
        for name, typ in zip(l_only, l_types):
            t = t.append_column(name, pa.nulls(len(t), typ))
        return t.select(canonical)

    both = lt.map_batches(_pad_left, batch_format="pyarrow").union(
        rt.map_batches(_pad_right, batch_format="pyarrow")
    )
    if coalesce is not None:
        both = both.repartition(min(coalesce, n_buckets))

    cols_out = [by, on, r_on] + l_only + out_r_cols
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"asof_join supports backward/forward, got {direction!r} "
            "(DuckDB ASOF has no 'nearest' either)"
        )

    def _asof_bucket(g: pa.Table) -> pa.Table:
        """Pure Arrow/numpy as-of kernel (no pandas round-trip): one
        lexsort over both sides interleaved (right rows before left rows
        at equal timestamps → inclusive tie rule), then a cumulative
        right-row counter — the most recent right row at-or-before each
        left probe is counter-1, valid iff it carries the same ``by``
        key (keys are contiguous in the sort, so an earlier-key right
        row simply fails the equality check)."""
        empty = (
            g.take(pa.array([], pa.int64()))
            .select([by, on] + l_only)
        )
        side = g["__side"].combine_chunks().to_numpy(zero_copy_only=False)
        lsel = np.flatnonzero(side == 0)
        rsel = np.flatnonzero(side == 1)
        if len(lsel) == 0 or len(rsel) == 0:
            out = empty
            out = out.append_column(
                r_on, pa.array([], g.schema.field(on).type)
            )
            for name, typ in zip(out_r_cols, r_types):
                out = out.append_column(name, pa.array([], typ))
            return out.select(cols_out)
        byv = g[by].combine_chunks().to_numpy(zero_copy_only=False)
        onv = g[on].combine_chunks().to_numpy(zero_copy_only=False)
        lb, lt_ = byv[lsel], onv[lsel]
        rb, rt_ = byv[rsel], onv[rsel]
        if direction == "forward":
            lt_, rt_ = -lt_, -rt_  # forward == backward on negated time
        order_l = np.lexsort((lt_, lb))
        order_r = np.lexsort((rt_, rb))
        n_r, n_l = len(rsel), len(lsel)
        keys = np.concatenate((rb[order_r], lb[order_l]))
        times = np.concatenate((rt_[order_r], lt_[order_l]))
        flag = np.concatenate(
            (np.zeros(n_r, dtype=np.int8), np.ones(n_l, dtype=np.int8))
        )
        pos = np.concatenate(
            (np.arange(n_r, dtype=np.int64), np.arange(n_l, dtype=np.int64))
        )
        order = np.lexsort((flag, times, keys))
        k_o, f_o, p_o = keys[order], flag[order], pos[order]
        rcount = np.cumsum(f_o == 0)
        at_left = f_o == 1
        cand = rcount[at_left] - 1  # ordinal into right-sorted rows
        l_ord = p_o[at_left]  # ordinal into left-sorted rows
        valid = cand >= 0
        valid[valid] &= rb[order_r][cand[valid]] == k_o[at_left][valid]
        l_rows = lsel[order_l[l_ord[valid]]]
        r_rows = rsel[order_r[cand[valid]]]
        # deterministic output order regardless of bucket row order
        # (lexsort: LAST key is primary → sort by (by, on, row))
        fin = np.lexsort((l_rows, onv[l_rows], byv[l_rows]))
        l_rows, r_rows = l_rows[fin], r_rows[fin]
        out = g.take(pa.array(l_rows, pa.int64())).select([by, on] + l_only)
        rtab = g.take(pa.array(r_rows, pa.int64()))
        out = out.append_column(r_on, rtab[on].combine_chunks())
        for name in out_r_cols:
            out = out.append_column(name, rtab[name].combine_chunks())
        return out.select(cols_out)

    return both.groupby("__bucket").map_groups(_asof_bucket, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Bloom-prefiltered semi join (large-large, shuffle-avoiding)
# ---------------------------------------------------------------------------


def build_bloom(ds, key_col: str, m_bits: int = 1 << 23, k_hashes: int = 4) -> bytes:
    """Bloom filter of a Dataset's int64 key column, built distributed:
    each batch emits ONE m_bits/8-byte bitmap row; rows tree-OR-merge
    in two ≤256-row fan-in levels (the HLL register-reduce shape), so
    the driver receives a handful of bitmaps, never O(#blocks) rows.
    Hash family: splitmix64(key + odd seed_i) % m (k independent
    probes). 1 MiB default (2^23 bits) holds ~10^6 keys at ~2% FP with
    k=4; scale m_bits with the right side. The merge fan-in shrinks as
    m_bits grows (capped at ~64 MiB of bitmaps per merge task) so a
    big filter never concentrates GiBs in one reducer."""
    if m_bits % 8 or m_bits <= 0:
        # BloomProbe recovers m from the blob's BYTE length, so a
        # non-multiple-of-8 m_bits would silently change the modulus
        # and break the exact-semi-join contract (false negatives).
        raise ValueError(f"m_bits must be a positive multiple of 8, got {m_bits}")
    m = np.uint64(m_bits)

    def _partial(t: pa.Table) -> pa.Table:
        keys = t[key_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        set_bloom_bits(bits, keys, k_hashes)
        return pa.table({"bloom": pa.array([bits.tobytes()], pa.binary())})

    def _merge(t: pa.Table) -> pa.Table:
        acc = np.zeros(m_bits // 8, dtype=np.uint8)
        col = t["bloom"].combine_chunks()
        for i in range(len(col)):
            # zero-copy view of the binary scalar's buffer (no bytes copy)
            acc |= np.frombuffer(col[i].as_buffer(), dtype=np.uint8)
        return pa.table({"bloom": pa.array([acc.tobytes()], pa.binary())})

    # fan-in sized so one merge task holds <= ~64 MiB of bitmaps
    fan_in = max(2, min(256, (64 << 20) // max(1, m_bits // 8)))
    rows = ds.map_batches(_partial, batch_format="pyarrow", batch_size=65536)
    for _ in range(2):
        rows = rows.map_batches(_merge, batch_format="pyarrow", batch_size=fan_in)
    acc = np.zeros(m_bits // 8, dtype=np.uint8)
    for row in rows.take_all():
        acc |= np.frombuffer(row["bloom"], dtype=np.uint8)
    return acc.tobytes()


def set_bloom_bits(bits: np.ndarray, keys: np.ndarray, k_hashes: int = 4) -> None:
    """In-place bit-set twin of :func:`bloom_hits` — the ONE copy of
    the build loop, so build and probe can never desync on the hash
    family ``splitmix64(key + 2i+1) % m`` or the probe count. Every
    builder (build_bloom, sources/bloomidx.py) goes through here."""
    m = np.uint64(len(bits) * 8)
    for i in range(k_hashes):
        h = (splitmix64(keys.astype(np.uint64) + np.uint64(2 * i + 1)) % m).astype(np.int64)
        np.bitwise_or.at(bits, h >> 3, np.uint8(1) << (h & 7).astype(np.uint8))


def bloom_hits(bits: np.ndarray, keys: np.ndarray, k_hashes: int = 4) -> np.ndarray:
    """Vectorized membership probe for a build_bloom bitmap — the ONE
    copy of the probe loop (build and probe must share the hash family
    ``splitmix64(key + 2i+1) % m`` and the SAME k, or false negatives
    appear). Every consumer (BloomProbe, text's segment-dedup split)
    goes through here."""
    m = np.uint64(len(bits) * 8)
    hit = np.ones(len(keys), dtype=bool)
    for i in range(k_hashes):
        h = (splitmix64(keys.astype(np.uint64) + np.uint64(2 * i + 1)) % m).astype(np.int64)
        hit &= (bits[h >> 3] & (np.uint8(1) << (h & 7).astype(np.uint8))) != 0
    return hit


class BloomProbe:
    """Actor stage: keep only rows whose key MIGHT be in the broadcast
    bloom (false positives pass — pair with an exact join after)."""

    def __init__(self, bloom_ref, key_col: str, k_hashes: int = 4):
        blob = ray.get(bloom_ref) if isinstance(bloom_ref, ray.ObjectRef) else bloom_ref
        self.bits = np.frombuffer(blob, dtype=np.uint8)
        self.key_col = key_col
        self.k = k_hashes

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = (
            batch[self.key_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        )
        return batch.filter(pa.array(bloom_hits(self.bits, keys, self.k)))


def bloom_semi_join(
    left,
    right,
    on: str,
    m_bits: int = 1 << 23,
    k_hashes: int = 4,
    n_buckets: int = 64,
    concurrency: int = 2,
):
    """EXACT large-large semi join with a bloom prefilter: the right
    side's keys summarize into one broadcast bitmap (built distributed,
    see build_bloom), the left streams through a BloomProbe actor pool
    (non-matching rows — the vast majority in a selective semi join —
    never enter the shuffle), and the survivors (matches + ~2% false
    positives) go through the exact bucketed semi join. Result is
    IDENTICAL to ``bucketed_hash_join(how='semi')``; the bloom only
    cuts shuffle volume. Anti joins cannot prefilter this way (a false
    positive would wrongly drop a row) — use the exact path."""
    bloom = build_bloom(right, on, m_bits, k_hashes)
    bloom_ref = ray.put(bloom)
    pref = left.map_batches(
        BloomProbe,
        fn_constructor_args=(bloom_ref, on, k_hashes),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    return bucketed_hash_join(pref, right, on=on, how="semi", n_buckets=n_buckets)


def salted_hash_join(
    left,
    right,
    on: str,
    salt_source_col: str,
    how: str = "inner",
    hot_threshold: int = 100_000,
    n_salts: int = 16,
    n_buckets: int = 64,
    suffix: str = "_r",
):
    """Bucketed hash join with HOT-KEY SALTING — the skew mitigation
    the plain bucketed join documents but leaves to the caller: a key
    carrying 10^8 rows floods one reduce bucket; salting splits it
    across ``n_salts`` buckets while cold keys pay nothing.

    Mechanics: one cheap count pass finds keys with > ``hot_threshold``
    left rows (stages/salt.py:detect_hot_keys — broadcast small by
    definition of hot). Left rows of hot keys get a DETERMINISTIC salt
    ``hash(salt_source_col) % n_salts`` (stable under retries/resume);
    right rows of hot keys REPLICATE once per salt (cold keys salt 0 on
    both sides — no replication). The join then runs as the ordinary
    composite-key bucketed join on ``(on, __salt)`` and the salt column
    drops from the output. Exactly the unsalted result for inner /
    left / semi / anti: each (left row, right row) key match meets in
    exactly one salt.

    Cost model: right-side replication is ``n_salts × hot-key right
    rows`` — use when the LEFT side is the skewed big side and hot
    keys' right rows are few (the fact⋈dim shape); for two skewed big
    sides range-partition instead."""
    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(f"salted_hash_join does not support how={how!r}")
    import ray

    from rio_cogeo_ray.functions.hashing import hash2
    from rio_cogeo_ray.stages.salt import detect_hot_keys

    hot = detect_hot_keys(left, on, hot_threshold)
    hot_ref = ray.put(
        np.sort(hot[on].combine_chunks().to_numpy(zero_copy_only=False))
    )

    def _is_hot(keys: np.ndarray, hotk: np.ndarray) -> np.ndarray:
        if len(hotk) == 0:
            return np.zeros(len(keys), dtype=bool)
        pos = np.clip(np.searchsorted(hotk, keys), 0, len(hotk) - 1)
        return hotk[pos] == keys

    def _salt_left(t: pa.Table) -> pa.Table:
        hotk = ray.get(hot_ref)
        k = t[on].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        src = (
            t[salt_source_col].combine_chunks().cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        s = (hash2(src.astype(np.uint64), 0x5A17) % np.uint64(n_salts)).astype(
            np.int64
        )
        s = np.where(_is_hot(k, hotk), s, 0)
        return t.append_column("__salt", pa.array(s, pa.int64()))

    def _replicate_right(t: pa.Table) -> pa.Table:
        hotk = ray.get(hot_ref)
        k = t[on].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        ih = _is_hot(k, hotk)
        reps = np.where(ih, n_salts, 1).astype(np.int64)
        idx = np.repeat(np.arange(len(t), dtype=np.int64), reps)
        excl = np.concatenate(([0], np.cumsum(reps)[:-1]))
        salt = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(excl, reps)
        out = t.take(pa.array(idx, pa.int64()))
        return out.append_column("__salt", pa.array(salt, pa.int64()))

    l_s = left.map_batches(_salt_left, batch_format="pyarrow")
    r_s = right.map_batches(_replicate_right, batch_format="pyarrow")
    joined = bucketed_hash_join(
        l_s, r_s, on=[on, "__salt"], how=how, n_buckets=n_buckets, suffix=suffix
    )

    def _drop(t: pa.Table) -> pa.Table:
        return t.drop_columns([c for c in ("__salt",) if c in t.column_names])

    return joined.map_batches(_drop, batch_format="pyarrow")


def plan_join(
    left,
    right,
    on: str,
    how: str = "inner",
    broadcast_max_rows: int = 2_000_000,
    hot_threshold: int = 100_000,
) -> dict:
    """Cost-based join strategy decision — the planning half of
    :func:`auto_join`, reusable standalone for EXPLAIN-style output.

    Two bounded probe aggregates (the key_skew diagnostic run on each
    side's key column — output rows = distinct multiplicities, never
    corpus-sized):

    - right side: total rows + whether keys are unique (the broadcast
      dimension-table contract BroadcastLookup enforces);
    - left side: maximum key multiplicity (the salting trigger).

    Decision: BROADCAST when the right side fits the threshold, has
    unique keys, and the mode is lookup-shaped (inner/semi/anti);
    else SALTED when some left key exceeds hot_threshold rows; else
    the plain BUCKETED hash join. Returns the decision plus the probe
    stats so callers can log the why."""
    from rio_cogeo_ray.stages.profile import key_skew

    r_rows = key_skew(right, on).take_all()
    n_right = sum(r["total_rows"] for r in r_rows)
    right_unique = all(r["multiplicity"] == 1 for r in r_rows)
    l_rows = key_skew(left, on).take_all()
    left_max_mult = max((r["multiplicity"] for r in l_rows), default=0)

    if how in ("inner", "semi", "anti") and right_unique and n_right <= broadcast_max_rows:
        strategy = "broadcast"
    elif left_max_mult > hot_threshold and how in ("inner", "left", "semi", "anti"):
        strategy = "salted"
    else:
        strategy = "bucketed"
    return {
        "strategy": strategy,
        "n_right": int(n_right),
        "right_unique": bool(right_unique),
        "left_max_multiplicity": int(left_max_mult),
    }


def auto_join(
    left,
    right,
    on: str,
    how: str = "inner",
    salt_source_col: str = None,
    broadcast_max_rows: int = 2_000_000,
    hot_threshold: int = 100_000,
    n_buckets: int = 64,
    suffix: str = "_r",
):
    """Join with an automatically chosen physical strategy — broadcast
    (small unique right side: zero shuffle), salted (hot left keys:
    the flooding key splits across salt buckets), or plain bucketed.
    All three produce identical rows (pytest-pinned), so the choice is
    purely physical; returns ``(dataset, plan)`` with the plan dict
    from :func:`plan_join` so pipelines can record the decision in
    their manifests.

    Planning costs two bounded aggregate passes over the key columns
    (the key_skew diagnostic); at 100 TB those are column-pruned scans
    — pay them when the join itself is expensive enough to care, or
    call the specific join directly when the shape is known. The
    salted path needs ``salt_source_col`` (a deterministic per-row
    value, e.g. the row id) — without one, a hot-key left side falls
    back to bucketed (documented in the returned plan)."""
    plan = plan_join(
        left, right, on, how,
        broadcast_max_rows=broadcast_max_rows, hot_threshold=hot_threshold,
    )
    if plan["strategy"] == "salted" and salt_source_col is None:
        plan = {**plan, "strategy": "bucketed", "note": "no salt_source_col"}
    if plan["strategy"] == "broadcast":
        mat = right.materialize()
        blocks = [b for b in ray.get(mat.to_arrow_refs()) if b.num_rows]
        if blocks:
            r_tab = pa.concat_tables(blocks).combine_chunks()
        else:
            sch = mat.schema()
            r_tab = pa.table(
                {f.name: pa.array([], f.type) for f in sch.base_schema}
            ) if sch is not None else pa.table({on: pa.array([], pa.int64())})
        # leave headroom for upstream tasks: a pool sized to ALL cpus
        # starves the producing stage (observed deadlock at 4 cpus)
        cpus = int(ray.cluster_resources().get("CPU", 4))
        out = broadcast_join(
            left, r_tab, on=on, mode=how, concurrency=max(2, min(4, cpus - 2))
        )
    elif plan["strategy"] == "salted":
        out = salted_hash_join(
            left, right, on=on, salt_source_col=salt_source_col, how=how,
            hot_threshold=hot_threshold, n_buckets=n_buckets, suffix=suffix,
        )
    else:
        out = bucketed_hash_join(
            left, right, on=on, how=how, n_buckets=n_buckets, suffix=suffix
        )
    return out, plan


def broadcast_lpm_join(
    ds,
    rules: "pa.Table",
    key_col: str = "url",
    rule_col: str = "prefix",
    out_col: str = "rule",
    max_rules: int = 1_000_000,
):
    """Longest-prefix-match join — the robots.txt / URL-routing rule
    semantics (the most SPECIFIC matching rule wins): each row's
    ``key_col`` string matches the longest entry of ``rules`` that is
    its prefix; non-matching rows keep a NULL ``out_col``. LPM is
    unique by construction (two equal-length prefixes of one string are
    identical), so the result is deterministic with no tiebreak.

    Scale shape: rules are SMALL by contract (a routing table, not a
    corpus — ``max_rules`` guards); they ride the task closure grouped
    by length, and matching is one vectorized utf8-slice + is_in hash
    probe per DISTINCT rule length, longest first, already-matched rows
    masked out — a pure map, zero shuffle, passes ∝ distinct rule
    lengths (not rules).

    SQL mirror: ``LEFT JOIN rules ON starts_with(key, prefix)`` +
    ``ROW_NUMBER() OVER (PARTITION BY row ORDER BY length(prefix)
    DESC) = 1``.
    """
    import pyarrow.compute as pc

    vals = rules[rule_col].combine_chunks().cast(pa.string())
    if len(vals) > max_rules:
        raise ValueError(
            f"broadcast_lpm_join: {len(vals)} rules > max_rules={max_rules}; "
            "a corpus-sized rule table needs a bucketed join, not a broadcast"
        )
    by_len: dict = {}
    for v in vals.to_pylist():
        if v is None:
            # NULL prefix matches nothing in SQL too
            # (starts_with(key, NULL) is NULL) — safe to skip
            continue
        if v == "":
            # the SQL mirror (LEFT JOIN ON starts_with(key, prefix))
            # would match EVERY row with an empty prefix; silently
            # skipping it would be an undocumented divergence — refuse
            raise ValueError(
                "broadcast_lpm_join: empty-string prefix rule — it would "
                "match every row under the starts_with mirror; drop it or "
                "make the catch-all explicit in the rule table"
            )
        by_len.setdefault(len(v), set()).add(v)
    lengths = sorted(by_len, reverse=True)

    def _match(t: pa.Table) -> pa.Table:
        k = t[key_col].combine_chunks().cast(pa.string())
        out = np.full(len(k), None, dtype=object)
        unmatched = np.ones(len(k), dtype=bool)
        # codepoint slice mirrors SQL starts_with on codepoints; rules
        # and urls here are single-byte-safe either way because the
        # probe compares full strings of exactly the rule's length
        for L in lengths:
            if not unmatched.any():
                break
            pref = pc.utf8_slice_codeunits(k, 0, L)
            hit = pc.is_in(
                pref, value_set=pa.array(sorted(by_len[L]), pa.string())
            ).to_numpy(zero_copy_only=False)
            hit = hit & unmatched
            if hit.any():
                pv = pref.to_numpy(zero_copy_only=False)
                out[hit] = pv[hit]
                unmatched &= ~hit
        return t.append_column(out_col, pa.array(out, pa.string()))

    return ds.map_batches(_match, batch_format="pyarrow")
