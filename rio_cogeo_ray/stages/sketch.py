"""Sketches + sampling — HyperLogLog distinct-count, deterministic
hash sampling, distributed bottom-k (order-statistic) sampling.

Training-data-pipeline operators (the reference has no sketches or
sampling — SURVEY.md §2.1 note; these are north-rule scale additions).
The sampling/split operators are content/id-addressed and
deterministic: any parallelism, any batch boundaries, same result. The
sketch family (HLL distinct, Misra-Gries heavy hitters, compressed
quantile summaries) trades exactness for one-pass shuffle-free merges
with documented, pytest-pinned error bounds.

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
import pyarrow.compute as pc

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


def stratified_sample(ds, group_col: str, id_col: str, k: int, salt: int = 0):
    """Exactly k rows per group (fewer if the group is smaller), uniform
    without replacement: the k rows with the smallest ``(knuth32(id),
    id)`` WITHIN each group — the per-stratum order statistic, so the
    sample set is unique and SQL-mirrorable (ROW_NUMBER() OVER
    (PARTITION BY group ORDER BY h, id) <= k).

    Distribution: per-batch partial per-group top-k (each batch forwards
    ≤ k rows per touched group) → bucketed final per-group top-k
    (stages/knn.py:per_group_topk) — shuffled volume is O(k · groups ·
    batches) worst case, never the corpus."""
    from rio_cogeo_ray.stages.knn import per_group_topk

    def _h(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        return t.append_column(
            "__h", pa.array(knuth32(ids, salt).astype(np.int64), pa.int64())
        )

    withh = ds.map_batches(_h, batch_format="pyarrow")
    out = per_group_topk(withh, group_col, [("__h", True), (id_col, True)], k)
    return out.map_batches(
        lambda t: t.drop_columns(["__h"]), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# Exact distributed quantiles (two-pass histogram + refine)
# ---------------------------------------------------------------------------


def exact_quantiles(ds, col: str, qs, scale: int = 100, n_bins: int = 4096):
    """EXACT quantiles of ``col`` over a Dataset, at any size, in two
    full passes plus a tiny bounds pass — no full sort, no driver
    materialization of the data:

    1. bounds: ``aggregate(Min, Max)`` on the quantized int64 values.
    2. histogram: each batch emits ONE ``n_bins``-cell int64 histogram
       row; rows tree-merge elementwise (same shape as the HLL register
       reduce) so the driver receives a single histogram → locate the
       bin holding each requested quantile rank.
    3. refine: filter to values in the target bins (a tiny fraction of
       the corpus), exact value counts via partial→final groupby, and
       finish on the driver over that bounded set.

    Values are quantized ``floor(v·scale + 0.5)`` (int64) first, so the
    result is deterministic and SQL-mirrorable. Quantile definition:
    the smallest quantized value whose cumulative count ≥ ``ceil(q·n)``
    (the lower / type-1 quantile — mirrored in SQL with a window
    cumsum). Returns ``{q: value/scale}``.

    Partitioning contract: a single histogram bin's distinct values fit
    the refine groupby (bins are uniform over the observed range; raise
    ``n_bins`` for pathologically spiky distributions).
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min, Sum

    from rio_cogeo_ray.stages.agg import partial_group_agg

    qs = list(qs)

    def _quant(t: pa.Table) -> pa.Table:
        v = t[col].combine_chunks().to_numpy(zero_copy_only=False)
        qv = np.floor(v * float(scale) + 0.5).astype(np.int64)
        return pa.table({"qv": pa.array(qv, pa.int64())})

    quantized = ds.map_batches(_quant, batch_format="pyarrow")
    b = quantized.aggregate(Min("qv"), Max("qv"))
    if b is None or b.get("min(qv)") is None:
        return {q: None for q in qs}  # empty dataset
    lo, hi = int(b["min(qv)"]), int(b["max(qv)"])
    span = max(hi - lo + 1, 1)
    # ceil-div bin width so bin index < n_bins always
    width = -(-span // n_bins)

    def _hist(t: pa.Table) -> pa.Table:
        qv = t["qv"].combine_chunks().to_numpy(zero_copy_only=False)
        h = np.bincount((qv - lo) // width, minlength=n_bins).astype(np.int64)
        return pa.table({"hist": pa.array([h.tobytes()], pa.binary()), "n": [len(t)]})

    def _merge_hist(t: pa.Table) -> pa.Table:
        buf = t["hist"].combine_chunks()
        off = np.frombuffer(buf.buffers()[1], dtype=np.int32)
        start = int(off[buf.offset])
        m = int(off[buf.offset + 1]) - start
        data = np.frombuffer(buf.buffers()[2], dtype=np.int64)
        s0 = start // 8
        h = data[s0 : s0 + len(buf) * (m // 8)].reshape(len(buf), m // 8).sum(axis=0)
        n = int(np.sum(t["n"].combine_chunks().to_numpy(zero_copy_only=False)))
        return pa.table({"hist": pa.array([h.tobytes()], pa.binary()), "n": [n]})

    rows = quantized.map_batches(_hist, batch_format="pyarrow")
    for _ in range(2):
        rows = rows.map_batches(_merge_hist, batch_format="pyarrow", batch_size=1024)
    hist = np.zeros(n_bins, dtype=np.int64)
    n_total = 0
    for row in rows.take_all():
        hist += np.frombuffer(row["hist"], dtype=np.int64)
        n_total += int(row["n"])
    if n_total == 0:
        return {q: None for q in qs}

    cum = np.cumsum(hist)
    # rank = ceil(q·n), clamped into [1, n]
    ranks = {q: max(1, min(int(np.ceil(q * n_total)), n_total)) for q in qs}
    target_bins = sorted({int(np.searchsorted(cum, ranks[q])) for q in qs})

    # pass 2: exact counts for values inside the target bins only
    tb = np.array(target_bins, dtype=np.int64)

    def _in_bins(t: pa.Table) -> pa.Table:
        qv = t["qv"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = np.isin((qv - lo) // width, tb)
        return t.filter(pa.array(keep))

    fine = partial_group_agg(
        quantized.map_batches(_in_bins, batch_format="pyarrow"),
        keys=["qv"], count_as="cnt",
    )
    fine_rows = fine.take_all()  # bounded: distinct values of a few bins
    vals = np.array([r["qv"] for r in fine_rows], dtype=np.int64)
    cnts = np.array([r["cnt"] for r in fine_rows], dtype=np.int64)
    order = np.argsort(vals)
    vals, cnts = vals[order], cnts[order]
    # cumulative count BEFORE each bin = cum[bin-1]
    out = {}
    for q in qs:
        r = ranks[q]
        bin_i = int(np.searchsorted(cum, r))
        below = int(cum[bin_i - 1]) if bin_i > 0 else 0
        in_bin = (vals - lo) // width == bin_i
        bv, bc = vals[in_bin], cnts[in_bin]
        c = below + np.cumsum(bc)
        pick = int(np.searchsorted(c, r))
        out[q] = float(bv[pick]) / float(scale)
    return out


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


def grouped_hll_distinct(ds, group_col: str, col: str, p: int = 12, n_buckets: int = 64):
    """Per-group approximate COUNT(DISTINCT col) — the grouped form of
    :func:`hll_count_distinct` (e.g. distinct URLs per domain, distinct
    texts per language) with NO exact-distinct shuffle:

    - per batch, ONE register blob row per group PRESENT in the batch
      (duplicate value mass collapses map-side into the registers, so
      the exchange moves ``groups-per-batch`` 2^p-byte rows, never
      value rows);
    - bucketed ``groupby(hash(group) % n_buckets)`` (O(n_buckets)
      Python tasks, not O(groups)); inside a bucket every group's
      registers max-merge in one vectorized ``maximum.reduceat`` over
      the sorted blob matrix;
    - the standard bias-corrected estimate per group.

    Partitioning contract: one group's register blobs across batches
    land in one reduce bucket — bounded by 2^p bytes × batches, and
    the per-batch collapse makes the count of blob rows per group at
    most the block count, independent of row volume. Standard error is
    ~1.04/sqrt(2^p) per group (pytest-pinned at ±3σ).
    """
    m = 1 << p

    def _partials(t: pa.Table) -> pa.Table:
        if not len(t):
            # preserve the column's NATIVE type (string/large_string/int)
            # so empty blocks unify with non-empty ones
            return pa.table(
                {
                    group_col: t[group_col].combine_chunks().slice(0, 0),
                    "regs": pa.array([], pa.binary()),
                }
            )
        codes = t[group_col].combine_chunks().dictionary_encode()
        gidx = np.asarray(codes.indices)
        uniq = codes.dictionary
        idx, rho = _hll_rho(_hash_col(t[col]), p)
        flat = np.zeros(len(uniq) * m, dtype=np.int8)
        np.maximum.at(flat, gidx.astype(np.int64) * m + idx, rho)
        blobs = flat.reshape(len(uniq), m)
        return pa.table(
            {
                group_col: uniq,
                "regs": pa.array([b.tobytes() for b in blobs], pa.binary()),
            }
        )

    rows = ds.map_batches(_partials, batch_format="pyarrow", batch_size=65536)

    def _route(t: pa.Table) -> pa.Table:
        import polars as pl

        g = t[group_col].combine_chunks()
        h = pl.from_arrow(g.cast(pa.large_string())).hash(seed=11).to_numpy()
        b = (h % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("__bucket", pa.array(b, pa.int64()))

    def _bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__bucket"])
        if not g.num_rows:
            return pa.table(
                {
                    group_col: g[group_col].combine_chunks().slice(0, 0),
                    "approx_distinct": pa.array([], pa.float64()),
                }
            )
        keys = g[group_col].combine_chunks()
        blobs = g["regs"].combine_chunks()
        mat = np.vstack(
            [np.frombuffer(blobs[i].as_buffer(), dtype=np.int8) for i in range(len(blobs))]
        )
        order = pa.compute.sort_indices(keys).to_numpy(zero_copy_only=False)
        ks = keys.take(pa.array(order))
        mats = mat[order]
        karr = ks.to_numpy(zero_copy_only=False)
        starts = np.r_[0, np.flatnonzero(karr[1:] != karr[:-1]) + 1]
        merged = np.maximum.reduceat(mats, starts, axis=0)
        ests = [hll_estimate(merged[i]) for i in range(len(starts))]
        return pa.table(
            {
                group_col: ks.take(pa.array(starts, pa.int64())),
                "approx_distinct": pa.array(ests, pa.float64()),
            }
        )

    return (
        rows.map_batches(_route, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(_bucket, batch_format="pyarrow")
    )


def grouped_quantile(
    ds, group_col: str, col: str, qs, scale: int = 100, n_buckets: int = 64
):
    """Per-group EXACT lower (type-1) quantiles — the grouped
    order-statistic operator:

    1. quantize ``floor(v·scale + 0.5)`` (int64, deterministic).
    2. (group, qv) partial→final counts — duplicate value mass
       collapses inside ``map_batches`` BEFORE the shuffle, so the
       exchange moves one row per distinct (group, value), not per row.
    3. per-group order statistic inside a bucketed ``map_groups``
       (hash(group) → ``n_buckets`` reduce buckets — O(n_buckets)
       Python, not O(groups)): sort by (group, qv), one global cumsum,
       and a single ``searchsorted`` per quantile resolves EVERY
       group's rank at once (the global cumsum is strictly increasing
       because counts are positive, so each group's threshold lands
       inside its own run).

    Quantile definition mirrors ``exact_quantiles``: smallest quantized
    value with cumulative count ≥ ``ceil(q·n)`` (SQL: window cumsum
    partitioned by group). Returns rows (group, q, value=qv/scale).

    Partitioning contract: one group's distinct VALUES (not rows) fit a
    reduce task; hot groups with pathological value cardinality would
    need the histogram-refine path of ``exact_quantiles`` per group.
    """
    from rio_cogeo_ray.functions.hashing import hash_columns
    from rio_cogeo_ray.stages.agg import partial_group_agg

    qs = [float(q) for q in qs]

    def _quant(t: pa.Table) -> pa.Table:
        g = t[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        v = t[col].combine_chunks().to_numpy(zero_copy_only=False)
        qv = np.floor(v * float(scale) + 0.5).astype(np.int64)
        return pa.table({group_col: g, "qv": pa.array(qv, pa.int64())})

    counts = partial_group_agg(
        ds.map_batches(_quant, batch_format="pyarrow"),
        keys=[group_col, "qv"],
        count_as="cnt",
    )

    def _bucket(t: pa.Table) -> pa.Table:
        b = (hash_columns(t, [group_col]) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("__bucket", pa.array(b, pa.int64()))

    def _per_group(t: pa.Table) -> pa.Table:
        t = t.sort_by([(group_col, "ascending"), ("qv", "ascending")])
        grp = t[group_col].combine_chunks()
        qv = t["qv"].combine_chunks().to_numpy(zero_copy_only=False)
        cnt = t["cnt"].combine_chunks().to_numpy(zero_copy_only=False)
        first = np.ones(len(t), dtype=bool)
        if len(t) > 1:
            first[1:] = np.asarray(
                pa.compute.not_equal(grp.slice(1), grp.slice(0, len(t) - 1))
            )
        rs = np.flatnonzero(first)
        C = np.cumsum(cnt)
        c_before = C[rs] - cnt[rs]
        re = np.append(rs[1:], len(t)) - 1
        tot = C[re] - c_before
        out_g, out_q, out_v = [], [], []
        for q in qs:
            # clamp rank to [1, tot] (mirrors exact_quantiles): q=0 would
            # make thr == c_before and searchsorted land on the PREVIOUS
            # group's last cumsum entry, returning a wrong group's value
            rank = np.clip(np.ceil(q * tot).astype(np.int64), 1, tot)
            thr = c_before + rank
            pos = np.searchsorted(C, thr, side="left")
            out_g.append(grp.take(pa.array(rs, pa.int64())))
            out_q.append(np.full(len(rs), q))
            out_v.append(qv[pos].astype(np.float64) / float(scale))
        return pa.table(
            {
                group_col: pa.concat_arrays(
                    [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in out_g]
                ),
                "q": pa.array(np.concatenate(out_q), pa.float64()),
                "value": pa.array(np.concatenate(out_v), pa.float64()),
            }
        )

    return (
        counts.map_batches(_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(_per_group, batch_format="pyarrow")
    )


def weighted_sample(ds, id_col: str, weight_col: str, k: int, salt: int = 0):
    """Weighted sample WITHOUT replacement of exactly k rows —
    Efraimidis–Spirakis A-ES (the training-data importance-sampling
    op): each row gets the deterministic uniform
    ``u = (knuth32(id) + 1) / 2^32`` ∈ (0, 1] and sort key
    ``ln(u) / w`` (weights must be > 0); the k LARGEST keys are the
    sample, with inclusion probability proportional to weight. The key
    is the same expression in SQL; libm LN can differ in the LAST ulp
    between engines, which cannot flip the selected SET (key gaps are
    ~1e11 ulps) but means callers should compare the selected rows,
    not the raw key. Ties fall through to id, so the result SET is
    deterministic.

    Distributed exactly like ``bottomk_sample``: partial top-k per
    batch (each batch forwards ≤ k rows) → one tiny final sort+limit —
    shuffle volume O(k·batches), no full sort."""

    def _partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        w = t[weight_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        u = (knuth32(ids, salt).astype(np.float64) + 1.0) / 4294967296.0
        key = np.log(u) / w
        t = t.append_column("skey", pa.array(key, pa.float64()))
        order = np.lexsort((ids, -key))[:k]
        return t.take(pa.array(order, pa.int64()))

    partials = ds.map_batches(_partial, batch_format="pyarrow")
    return partials.sort(["skey", id_col], descending=[True, False]).limit(k)


def _mg_prune(tokens: pa.Array, counts: np.ndarray, k: int):
    """Keep at most k (token, count) pairs by subtracting the (k+1)-th
    largest count from every counter and dropping the non-positive —
    the Misra-Gries decrement step, vectorized."""
    if len(counts) <= k:
        return tokens, counts
    thr = np.partition(counts, len(counts) - k - 1)[len(counts) - k - 1]
    dec = counts - thr
    keep = dec > 0
    return tokens.filter(pa.array(keep)), dec[keep]


def misra_gries_topk(ds, col: str, k: int = 64, fan_in: int = 256):
    """Approximate heavy hitters via MERGEABLE Misra-Gries summaries
    (Agarwal et al., "Mergeable Summaries"): each batch reduces to an
    exact value_counts pruned to k counters; summaries then tree-merge
    (concat → sum per token → prune) through ≤``fan_in``-row fan-in
    levels with NO key-partitioned shuffle — the HLL register-reduce
    shape. The driver receives one ≤k-row summary.

    Guarantee: every value with true frequency > n/(k+1) survives, and
    each reported count is an UNDER-estimate within n/(k+1) of truth.
    This is the 100 TB scale path beside the exact ``text.topk_tokens``
    (which shuffles every distinct token): MG moves O(k) rows per batch
    regardless of cardinality. Returns a pa.Table (token, est_count)
    sorted by est_count desc, token asc.
    """
    import pyarrow.compute as pc

    def _batch_summary(t: pa.Table) -> pa.Table:
        vc = t[col].combine_chunks().value_counts()
        toks = vc.field("values")
        cnts = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
        toks, cnts = _mg_prune(toks, cnts, k)
        return pa.table({"token": toks, "cnt": pa.array(cnts, pa.int64())})

    def _merge(t: pa.Table) -> pa.Table:
        g = t.group_by("token").aggregate([("cnt", "sum")])
        toks = g["token"].combine_chunks()
        cnts = g["cnt_sum"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        toks, cnts = _mg_prune(toks, cnts, k)
        return pa.table({"token": toks, "cnt": pa.array(cnts, pa.int64())})

    rows = ds.map_batches(_batch_summary, batch_format="pyarrow", batch_size=65536)
    # fan-in is denominated in SUMMARIES (each up to k rows), so each
    # merge level really coalesces fan_in summaries; three levels give
    # fan_in^3 (~10^7 batches) reduction before the driver sees rows
    for _ in range(3):
        rows = rows.map_batches(_merge, batch_format="pyarrow", batch_size=fan_in * k)
    import ray as _ray

    blocks = _ray.get(rows.materialize().to_arrow_refs())
    blocks = [b for b in blocks if b.num_rows]
    if not blocks:
        return pa.table({"token": pa.array([], pa.string()), "est_count": pa.array([], pa.int64())})
    final = _merge(pa.concat_tables(blocks))
    return final.sort_by([("cnt", "descending"), ("token", "ascending")]).rename_columns(
        ["token", "est_count"]
    )


def _q_compress(vals: np.ndarray, wts: np.ndarray, k: int):
    """Compress a weighted multiset to ≤k (value, weight) rows while
    preserving cumulative-rank structure (the Manku–Rajagopalan–Lindsay
    compressed-summary step): sort by value, pick boundary rows at
    equal cumulative-weight spacing, each kept row absorbing the weight
    of the run it terminates. Total weight is preserved EXACTLY; each
    compress shifts any rank by ≤ W/k (W = summary weight), so a
    d-level merge tree answers quantiles within d·n/k ranks.
    Deterministic — no sampling."""
    order = np.argsort(vals, kind="stable")
    v = vals[order]
    w = wts[order]
    if len(v) <= k:
        return v, w
    cw = np.cumsum(w)
    total = cw[-1]
    targets = total * (np.arange(1, k + 1, dtype=np.float64) / k)
    idx = np.unique(np.minimum(np.searchsorted(cw, targets, side="left"), len(v) - 1))
    seg_cw = cw[idx]
    segw = np.diff(np.concatenate(([np.int64(0)], seg_cw)))
    return v[idx], segw


def quantile_sketch(ds, col: str, qs, k: int = 2048, fan_in: int = 64):
    """Approximate quantiles via MERGEABLE compressed summaries — the
    one-pass, shuffle-FREE scale path beside :func:`exact_quantiles`
    (whose two passes re-read the column). Same tree shape as
    :func:`misra_gries_topk`: each batch compresses to ≤k (value,
    weight) rows; summaries tree-merge (concat → re-compress) through
    summary-denominated fan-in levels; the driver receives one bounded
    summary and reads quantiles off its cumulative weights.

    Guarantee: with 3 merge levels + the driver merge, any reported
    quantile's true rank is within ≈ 5·n/k of the requested rank, for
    ANY batching (no randomness; summaries do depend on batch
    boundaries, so two partitionings may return slightly different —
    equally valid — values). Returns pa.Table (q, value, n).
    """

    def _batch_summary(t: pa.Table) -> pa.Table:
        x = t[col].combine_chunks()
        x = x.drop_null()
        vals = x.to_numpy(zero_copy_only=False).astype(np.float64)
        if len(vals) == 0:
            return pa.table({"v": pa.array([], pa.float64()), "w": pa.array([], pa.int64())})
        v, w = _q_compress(vals, np.ones(len(vals), dtype=np.int64), k)
        return pa.table({"v": pa.array(v, pa.float64()), "w": pa.array(w, pa.int64())})

    def _merge(t: pa.Table) -> pa.Table:
        v = t["v"].combine_chunks().to_numpy(zero_copy_only=False)
        w = t["w"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        if len(v) == 0:
            return t
        v2, w2 = _q_compress(v, w, k)
        return pa.table({"v": pa.array(v2, pa.float64()), "w": pa.array(w2, pa.int64())})

    rows = ds.map_batches(_batch_summary, batch_format="pyarrow", batch_size=65536)
    for _ in range(3):
        rows = rows.map_batches(_merge, batch_format="pyarrow", batch_size=fan_in * k)
    import ray as _ray

    blocks = [
        b for b in _ray.get(rows.materialize().to_arrow_refs()) if b.num_rows
    ]
    if not blocks:
        return pa.table(
            {
                "q": pa.array([], pa.float64()),
                "value": pa.array([], pa.float64()),
                "n": pa.array([], pa.int64()),
            }
        )
    final = _merge(pa.concat_tables(blocks))
    v = final["v"].to_numpy(zero_copy_only=False)
    w = final["w"].to_numpy(zero_copy_only=False).astype(np.int64)
    cw = np.cumsum(w)
    total = int(cw[-1])
    qs = np.asarray(list(qs), dtype=np.float64)
    ranks = np.maximum(np.ceil(qs * total).astype(np.int64), 1)
    pick = np.searchsorted(cw, ranks, side="left")
    pick = np.minimum(pick, len(v) - 1)
    return pa.table(
        {
            "q": pa.array(qs, pa.float64()),
            "value": pa.array(v[pick], pa.float64()),
            "n": pa.array(np.full(len(qs), total, dtype=np.int64), pa.int64()),
        }
    )


def split_assign(ds, id_col: str, splits, den: int = 100, salt: int = 0):
    """Deterministic train/val/test split assignment: ``splits`` is an
    ordered list of (name, share) with shares summing to ``den``; a row
    lands in the split whose cumulative range contains
    ``knuth32(id, salt) % den``. Pure map-side (zero shuffle), stable
    under any re-partitioning and across runs — the property a training
    pipeline needs so no example ever migrates between train and eval.
    SQL mirror: a CASE over the same hash expression."""
    names = [n for n, _ in splits]
    shares = np.cumsum([s for _, s in splits])
    if shares[-1] != den:
        raise ValueError(f"split shares {list(shares)} must sum to den={den}")

    def _assign(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        b = (knuth32(ids, salt) % np.uint64(den)).astype(np.int64)
        idx = np.searchsorted(shares, b, side="right")
        arr = np.array(names, dtype=object)[idx]
        return t.append_column("split", pa.array(arr, pa.string()))

    return ds.map_batches(_assign, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005) — point-frequency
# estimates, completing the mergeable-sketch family (HLL = distinct,
# Misra-Gries = heavy hitters UNDER-estimate, quantile_sketch = ranks,
# CM = per-key frequency OVER-estimate).
# ---------------------------------------------------------------------------

_CM_SEEDS = (
    0x9E3779B97F4A7C15,
    0xC2B2AE3D27D4EB4F,
    0x165667B19E3779F9,
    0xD6E8FEB86659FD93,
    0xA0761D6478BD642F,
    0xE7037ED1A0B428DB,
)


def _cm_indices(h: np.ndarray, w: int, d: int) -> np.ndarray:
    """(d, n) bucket indices: d independent hash rows derived from the
    base 64-bit value hash by seeded splitmix re-mixes."""
    from rio_cogeo_ray.functions.hashing import splitmix64

    out = np.empty((d, len(h)), dtype=np.int64)
    for i in range(d):
        out[i] = (splitmix64(h ^ np.uint64(_CM_SEEDS[i])) % np.uint64(w)).astype(np.int64)
    return out


def cm_register_rows(
    batch: pa.Table, col: str, w: int, d: int, weight_col: "str | None" = None
) -> pa.Table:
    """One (d·w)-cell int64 count-matrix blob per BATCH: every value's
    weight adds into d buckets (one per hash row). Duplicate value mass
    collapses map-side — the exchange moves one ~d·w·8-byte row per
    batch, never value rows. ``weight_col`` lets pre-counted streams
    (value_counts output) feed the sketch without re-expansion."""
    h = _hash_col(batch[col])
    if weight_col is not None:
        wts = batch[weight_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        wts = np.ones(len(h), dtype=np.int64)
    mat = np.zeros((d, w), dtype=np.int64)
    if len(h):
        idx = _cm_indices(h, w, d)
        for i in range(d):
            # np.add.at keeps the accumulation in int64 — a float64
            # bincount would round once a batch's weighted mass passes
            # 2^53 and could break the est >= true guarantee
            np.add.at(mat[i], idx[i], wts)
    return pa.table(
        {
            "cm": pa.array([mat.tobytes()], pa.binary()),
            "n": pa.array([int(wts.sum())], pa.int64()),
        }
    )


def merge_cm_rows(batch: pa.Table) -> pa.Table:
    """Elementwise SUM of count-matrix blobs (counts are additive —
    the CM merge rule), keeping the total weight alongside."""
    if not len(batch):
        return batch
    mats = np.stack(
        [np.frombuffer(b.as_py(), dtype=np.int64) for b in batch["cm"].combine_chunks()]
    )
    total = batch["n"].combine_chunks().to_numpy(zero_copy_only=False).sum()
    return pa.table(
        {
            "cm": pa.array([mats.sum(axis=0).tobytes()], pa.binary()),
            "n": pa.array([int(total)], pa.int64()),
        }
    )


class CountMinSketch:
    """Driver-side handle: the merged (d, w) matrix + total weight.
    ``estimate(values)`` returns the min-over-rows count per value —
    an OVER-estimate: est ≥ true always; P[est − true > 2n/w] < 2^−d
    per query (Cormode & Muthukrishnan Thm 1)."""

    def __init__(self, mat: np.ndarray, n: int, w: int, d: int):
        self.mat, self.n, self.w, self.d = mat, n, w, d

    def estimate(self, values) -> np.ndarray:
        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        if not isinstance(values, pa.Array):
            values = pa.array(values)
        h = _hash_col(values)
        if not len(h):
            return np.zeros(0, dtype=np.int64)
        idx = _cm_indices(h, self.w, self.d)
        ests = np.stack([self.mat[i, idx[i]] for i in range(self.d)])
        return ests.min(axis=0)


def cm_sketch(
    ds,
    col: str,
    w: int = 8192,
    d: int = 4,
    fan_in: int = 64,
    weight_col: "str | None" = None,
) -> CountMinSketch:
    """Build a Count-Min sketch of a column distributed: per-batch
    count-matrix blobs → TWO summary-denominated fan-in sum levels
    (the HLL register-reduce shape — NO key shuffle anywhere) → one
    final driver sum over the ≤fan_in survivors. At 10^9 blocks the
    driver still receives ≲fan_in rows of d·w·8 bytes.

    Sizing: error ≤ 2n/w per query with prob 1 − 2^−d; w=8192, d=4
    → ≤0.025% of stream mass, 256 KiB per blob. ``d`` ≤ 6 (seed table).
    """
    if d > len(_CM_SEEDS):
        raise ValueError(f"d must be <= {len(_CM_SEEDS)}")
    rows = ds.map_batches(
        lambda t: cm_register_rows(t, col, w, d, weight_col),
        batch_format="pyarrow",
        batch_size=65536,
    )
    for _ in range(2):
        rows = rows.map_batches(merge_cm_rows, batch_format="pyarrow", batch_size=fan_in)
    mat = np.zeros(d * w, dtype=np.int64)
    n = 0
    for row in rows.take_all():
        mat = mat + np.frombuffer(row["cm"], dtype=np.int64)
        n += row["n"]
    return CountMinSketch(mat.reshape(d, w), int(n), w, d)


def percentile_rank(
    ds,
    group_col: str,
    val_col: str,
    id_col: str,
    out_col: str = "pctl_ppm",
    n_buckets: int = 64,
):
    """Per-group percentile rank of an integer feature, in exact ppm:
    ``floor(1e6 · |rows in group with value ≤ v| / |group|)`` — the
    quality-score normalization step of a corpus filter ("keep the top
    30% per language" without per-language thresholds). Integer-exact,
    so hash-identical at any parallelism; mirrors SQL
    ``(COUNT(*) OVER (PARTITION BY g ORDER BY v) * 1000000) //
    COUNT(*) OVER (PARTITION BY g)``.

    Scale shape (the exact_quantiles doctrine — histogram CDF, not a
    global sort): ONE partial→final count shuffle over the DISTINCT
    (group, value) pairs (bounded by feature cardinality, not corpus
    rows — the contract is an integer feature like a length, a token
    count, a quantized score), the CDF cumsums on the driver (tiny),
    and a broadcast vectorized lookup maps every row. No all-to-all
    over data rows, no per-group sort."""
    import ray as _ray

    from rio_cogeo_ray.stages.agg import partial_group_agg

    hist = partial_group_agg(
        ds, keys=[group_col, val_col], count_as="c", n_buckets=n_buckets
    )
    hblocks = [b for b in _ray.get(hist.to_arrow_refs()) if b.num_rows]
    if not hblocks:  # empty input: no histogram, no rows to rank
        return ds
    ht = pa.concat_tables(hblocks, promote_options="default")
    ht = ht.sort_by([(group_col, "ascending"), (val_col, "ascending")])
    groups = ht[group_col].combine_chunks()
    vals = ht[val_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
    cnts = ht["c"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
    uniq = groups.unique()
    gi = pc.index_in(groups, value_set=uniq).to_numpy(zero_copy_only=False).astype(np.int64)
    # per-group inclusive cumsum + totals
    cum = np.cumsum(cnts)
    starts = np.flatnonzero(np.r_[True, gi[1:] != gi[:-1]])
    base = np.zeros(len(cnts), dtype=np.int64)
    base[starts[1:]] = cum[starts[1:] - 1]
    np.maximum.accumulate(base, out=base)
    cle = cum - base  # inclusive count within group
    ends = np.append(starts[1:] - 1, len(cnts) - 1)
    tots = cle[ends]  # one total per group (indexed by group rank)
    assert vals.max(initial=0) < (1 << 40) and vals.min(initial=0) >= 0, (
        "percentile_rank: val_col must be a non-negative integer < 2^40"
    )
    comp = gi * (np.int64(1) << np.int64(40)) + vals
    state = _ray.put((uniq, comp, cle, tots))

    class _Rank:
        def __init__(self, ref):
            self.uniq, self.comp, self.cle, self.tots = (
                _ray.get(ref) if isinstance(ref, _ray.ObjectRef) else ref
            )

        def __call__(self, t: pa.Table) -> pa.Table:
            if not t.num_rows:
                return pa.table(
                    {
                        id_col: pa.array([], pa.int64()),
                        out_col: pa.array([], pa.int64()),
                    }
                )
            g = pc.index_in(
                t[group_col].combine_chunks(), value_set=self.uniq
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            v = t[val_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
            rc = g * (np.int64(1) << np.int64(40)) + v
            idx = np.searchsorted(self.comp, rc, side="right") - 1
            ppm = self.cle[idx] * np.int64(1_000_000) // self.tots[g]
            return pa.table(
                {
                    id_col: t[id_col].combine_chunks().cast(pa.int64()),
                    out_col: pa.array(ppm, pa.int64()),
                }
            )

    return ds.map_batches(
        _Rank,
        fn_constructor_args=(state,),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


def checksum_int(ds, col: str, modulus: int = (1 << 63) - 1):
    """Order- and partitioning-independent EXACT checksum of an int64
    column: per-batch int64 partial sums (one tiny row per batch — the
    driver never sees data rows) → arbitrary-precision Python-int sum →
    one modulo at the very end. Addition is commutative, so any
    parallelism / any block order / any resume produces the identical
    checksum — the cheap corpus-equality audit that complements
    queries' snapshot_diff (which tells you WHICH rows changed; this
    tells you IF anything changed, in one streaming pass and O(#blocks)
    driver bytes).

    Contract: each BATCH's sum must fit int64 (values ≤ ~2^45 at 64k
    rows — derive the column as a bounded hash expression); the
    cross-batch total is exact at any corpus size because the driver
    sums Python ints. Null values contribute nothing (SQL SUM
    semantics); rows are counted regardless."""
    import pyarrow.compute as pc

    import ray as _ray

    def _partial(t: pa.Table) -> pa.Table:
        s = pc.sum(t[col]).as_py()
        return pa.table(
            {
                "s": pa.array([int(s or 0)], pa.int64()),
                "n": pa.array([len(t)], pa.int64()),
            }
        )

    blocks = [
        b
        for b in _ray.get(
            ds.map_batches(_partial, batch_format="pyarrow").to_arrow_refs()
        )
        # an empty input yields schema-less zero-row blocks without the
        # partial columns — they contribute nothing
        if b.num_rows and "s" in b.column_names
    ]
    total = sum(int(x) for b in blocks for x in b["s"].to_pylist())
    n = sum(int(x) for b in blocks for x in b["n"].to_pylist())
    return pa.table(
        {
            "checksum": pa.array([total % modulus], pa.int64()),
            "n_rows": pa.array([n], pa.int64()),
        }
    )


def grouped_spearman(
    ds,
    group_col: str,
    col_a: str,
    col_b: str,
    id_col: str,
    n_buckets: int = 64,
):
    """Per-group Spearman rank correlation with a deterministic unique
    tiebreak: ranks are ROW_NUMBER over (value, id) — permutation-exact
    and therefore SQL-mirrorable (no averaged tie ranks).

    Output per group: (group, n, sum_d2, rho_ppm) with
    rho_ppm = 1e6 - (6e6 * Σd²) // (n(n²-1)); the quotient is computed
    in arbitrary-precision Python ints at finalize (one row per group).
    Σd² itself accumulates in int64 via reduceat: Σd² ≤ n³/3, exact up
    to ~3M rows per group — beyond that, chunk-split the reduce (the
    int128-bucket step the moments query documents). Groups of n < 2
    drop.

    Partitioning contract: one group's rows must co-locate (hash(group)
    buckets — same as grouped quantiles); inside a bucket both rank
    passes are vectorized lexsorts over all its groups at once."""
    from rio_cogeo_ray.functions.hashing import hash_columns

    def _route(t: pa.Table) -> pa.Table:
        b = (hash_columns(t, [group_col]) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("__b", pa.array(b, pa.int64()))

    def _bucket(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                group_col: pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "sum_d2": pa.array([], pa.int64()),
                "rho_ppm": pa.array([], pa.int64()),
            }
        )
        if len(g) == 0:
            return empty
        grp = g[group_col].combine_chunks()
        # dictionary_encode handles NULL group values (np.unique would
        # raise comparing None to str); nulls become their own group
        # code, mirroring SQL's NULL partition
        enc = grp.dictionary_encode()
        gcode = (
            enc.indices.fill_null(-1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        a = g[col_a].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        b = g[col_b].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        i = g[id_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(g)

        def _ranks(v: np.ndarray) -> np.ndarray:
            order = np.lexsort((i, v, gcode))
            gs = gcode[order]
            new = np.ones(n, dtype=bool)
            new[1:] = gs[1:] != gs[:-1]
            seg_start = np.repeat(np.flatnonzero(new), np.diff(np.append(np.flatnonzero(new), n)))
            r = np.empty(n, dtype=np.int64)
            r[order] = np.arange(n, dtype=np.int64) - seg_start + 1
            return r

        d = _ranks(a) - _ranks(b)
        order = np.argsort(gcode, kind="stable")
        gs = gcode[order]
        new = np.ones(n, dtype=bool)
        new[1:] = gs[1:] != gs[:-1]
        starts = np.flatnonzero(new)
        cnt = np.diff(np.append(starts, n))
        d2 = (d * d)[order]
        sum_d2 = np.add.reduceat(d2, starts)
        keep = cnt >= 2
        rows_grp, rows_n, rows_s, rows_r = [], [], [], []
        gvals = grp.to_numpy(zero_copy_only=False)[order]
        for s_, c_, sd in zip(starts[keep], cnt[keep], sum_d2[keep]):
            nn, sdi = int(c_), int(sd)
            rho = 1_000_000 - (6_000_000 * sdi) // (nn * (nn * nn - 1))
            rows_grp.append(gvals[s_])
            rows_n.append(nn)
            rows_s.append(sdi)
            rows_r.append(rho)
        if not rows_grp:
            return empty
        return pa.table(
            {
                group_col: pa.array([str(x) for x in rows_grp], pa.string()),
                "n": pa.array(rows_n, pa.int64()),
                "sum_d2": pa.array(rows_s, pa.int64()),
                "rho_ppm": pa.array(rows_r, pa.int64()),
            }
        )

    return (
        ds.map_batches(_route, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(lambda g: _bucket(g.drop_columns(["__b"])), batch_format="pyarrow")
    )


def _kmv_blob_row(mins: np.ndarray) -> pa.Table:
    return pa.table({"mins": pa.array([np.sort(mins).astype(np.uint64).tobytes()], pa.binary())})


def kmv_partial_rows(batch: pa.Table, col: str, k: int) -> pa.Table:
    """One (mins) blob row per batch: the k smallest 64-bit hashes of
    the batch's DISTINCT values (duplicate mass collapses map-side,
    like every mergeable-sketch partial here)."""
    if not len(batch):
        return _kmv_blob_row(np.empty(0, dtype=np.uint64))
    h = np.unique(_hash_col(batch[col]))
    return _kmv_blob_row(h[:k])


def merge_kmv_rows(batch: pa.Table, k: int) -> pa.Table:
    """Merge = union of the blobs' hash sets, truncated back to the k
    smallest — the KMV merge is associative and idempotent, so any
    fan-in tree yields the same sketch."""
    blobs = batch["mins"].combine_chunks()
    if not len(blobs):
        return _kmv_blob_row(np.empty(0, dtype=np.uint64))
    allv = np.concatenate(
        [np.frombuffer(blobs[i].as_buffer(), dtype=np.uint64) for i in range(len(blobs))]
    )
    return _kmv_blob_row(np.unique(allv)[:k])


def kmv_sketch(ds, col: str, k: int = 1024) -> np.ndarray:
    """K-minimum-values distinct sketch (Bar-Yossef et al. 2002 /
    theta-sketch family): the sorted k smallest 64-bit value hashes.
    Unlike HLL it supports SET INTERSECTION estimates (kmv_overlap) —
    the sketch IS a uniform sample of the distinct-value hash space.
    Per-batch partials (one ≤8k-byte blob per batch) → two bounded
    fan-in merge levels → one driver merge; driver state is O(k)."""
    rows = ds.map_batches(
        lambda t: kmv_partial_rows(t, col, k), batch_format="pyarrow", batch_size=65536
    )
    for _ in range(2):
        rows = rows.map_batches(
            lambda t: merge_kmv_rows(t, k), batch_format="pyarrow", batch_size=1024
        )
    mins = np.empty(0, dtype=np.uint64)
    for row in rows.take_all():
        mins = np.unique(
            np.concatenate([mins, np.frombuffer(row["mins"], dtype=np.uint64)])
        )[:k]
    return mins


_KMV_SPACE = float(2**64)


def kmv_estimate(mins: np.ndarray, k: int) -> float:
    """Distinct-count estimate: exact when the sketch isn't full, else
    the classic (k-1) / theta with theta = kth-min / 2^64."""
    if len(mins) < k:
        return float(len(mins))
    return (k - 1) * _KMV_SPACE / float(mins[k - 1])


def kmv_overlap(ds_a, ds_b, col: str, k: int = 1024) -> pa.Table:
    """Distinct-set OVERLAP estimates between two datasets' value sets
    from two KMV sketches (the theta-sketch intersection): one row
    (distinct_a, distinct_b, distinct_common, jaccard_ppm).

    theta = min of the two sketches' thresholds; below theta both
    sketches hold EVERY hash, so the truncated sets are exact uniform
    samples and |Sa ∩ Sb| / theta_frac estimates the true overlap;
    jaccard = |Sa ∩ Sb| / |Sa ∪ Sb| over the same window. Standard
    error ~1/sqrt(k). Estimates round to int64 (rows-only surface —
    the pytest oracle pins the ±5 sigma band against exact counts)."""
    ka = kmv_sketch(ds_a, col, k)
    kb = kmv_sketch(ds_b, col, k)
    na, nb = kmv_estimate(ka, k), kmv_estimate(kb, k)
    th_a = float(ka[k - 1]) if len(ka) >= k else _KMV_SPACE
    th_b = float(kb[k - 1]) if len(kb) >= k else _KMV_SPACE
    theta = min(th_a, th_b)
    sa = ka[ka.astype(np.float64) < theta]
    sb = kb[kb.astype(np.float64) < theta]
    inter = len(np.intersect1d(sa, sb))
    union = len(np.union1d(sa, sb))
    n_common = inter * _KMV_SPACE / theta if theta > 0 else 0.0
    jac_ppm = (1_000_000 * inter) // union if union else 0
    # union estimated DIRECTLY from the merged bottom-k window (the
    # union theta-sketch: merge the two sketches, truncate to the k
    # smallest, classic (k-1)/theta) — standard KMV variance, rather
    # than inclusion-exclusion over three independently-estimated
    # terms, which compounds variance in the saturated regime. The
    # one-sided differences derive from the union (only_a = union − b),
    # clamped at zero so noise can never push them negative.
    merged = np.unique(np.concatenate([ka, kb]))[:k]
    n_union = kmv_estimate(merged, k)
    only_a = max(n_union - nb, 0.0)
    only_b = max(n_union - na, 0.0)
    return pa.table(
        {
            "distinct_a": pa.array([int(round(na))], pa.int64()),
            "distinct_b": pa.array([int(round(nb))], pa.int64()),
            "distinct_common": pa.array([int(round(n_common))], pa.int64()),
            "distinct_union": pa.array([int(round(n_union))], pa.int64()),
            "only_a": pa.array([int(round(only_a))], pa.int64()),
            "only_b": pa.array([int(round(only_b))], pa.int64()),
            "jaccard_ppm": pa.array([int(jac_ppm)], pa.int64()),
        }
    )


def grouped_ntile(
    ds,
    group_col: str,
    value_col: str,
    id_col: str,
    n_tiles: int,
    n_buckets: int = 64,
):
    """Per-group NTILE(n) equal-frequency binning — the normalization
    primitive behind "train on quality quartiles" corpus splits (and the
    windowed companion to percentile_rank, which emits ppm ranks
    instead of bin labels).

    Semantics are exactly SQL ``NTILE(n) OVER (PARTITION BY group ORDER
    BY value, id)``: with c rows and q = c // n, rem = c % n, the first
    rem tiles take q+1 rows and the rest take q (larger tiles first).
    The unique-id tiebreak makes the assignment permutation-exact and
    therefore SQL-mirrorable (the grouped_spearman rank doctrine).

    Partitioning contract: one hash(group) exchange co-locates each
    group; inside a bucket the rank pass is ONE lexsort over all the
    bucket's groups at once and the tile formula is a vectorized
    two-branch select — no per-group Python. Output rows = input rows
    (id, group, value, tile); driver state is zero."""
    if n_tiles < 1:
        raise ValueError("n_tiles must be >= 1")
    from rio_cogeo_ray.functions.hashing import hash_columns

    def _route(t: pa.Table) -> pa.Table:
        b = (hash_columns(t, [group_col]) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("__b", pa.array(b, pa.int64()))

    def _bucket(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                group_col: pa.array([], pa.string()),
                value_col: pa.array([], pa.int64()),
                "tile": pa.array([], pa.int64()),
            }
        )
        if len(g) == 0:
            return empty
        grp = g[group_col].combine_chunks()
        enc = grp.dictionary_encode()
        gcode = (
            enc.indices.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        v = g[value_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        i = g[id_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(g)
        order = np.lexsort((i, v, gcode))
        gs = gcode[order]
        new = np.ones(n, dtype=bool)
        new[1:] = gs[1:] != gs[:-1]
        starts = np.flatnonzero(new)
        cnt = np.diff(np.append(starts, n))
        seg = np.repeat(np.arange(len(starts)), cnt)
        rank1 = np.arange(n, dtype=np.int64) - starts[seg] + 1  # 1-based in group
        c = cnt[seg].astype(np.int64)
        q, rem = c // n_tiles, c % n_tiles
        thresh = rem * (q + 1)
        big = rank1 <= thresh
        tile_sorted = np.where(
            big,
            (rank1 - 1) // np.maximum(q + 1, 1) + 1,
            rem + (rank1 - 1 - thresh) // np.maximum(q, 1) + 1,
        )
        tile = np.empty(n, dtype=np.int64)
        tile[order] = tile_sorted
        return pa.table(
            {
                id_col: g[id_col].combine_chunks(),
                group_col: grp,
                value_col: g[value_col].combine_chunks(),
                "tile": pa.array(tile, pa.int64()),
            }
        )

    return (
        ds.map_batches(_route, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(lambda g: _bucket(g.drop_columns(["__b"])), batch_format="pyarrow")
    )


def contingency_chi2(ds, row_col: str, col_col: str, n_buckets: int = 16):
    """Chi-squared contingency table over two CATEGORICAL columns — the
    independence test behind "does source predict language?" corpus
    audits: per cell, the exact integer micro-chi² contribution

        chi2_micro = ((O·N − R·C)² · 10^6) // (N·R·C)

    (O observed, R row total, C column total, N grand total — the
    identity (O−E)²/E with E = R·C/N cleared of fractions). Every cell
    of the FULL row-domain × col-domain grid is emitted, zero-observed
    cells included (they contribute E): both engines build the same
    grid, so the table is hash-exact.

    Scale shape: ONE partial→final count exchange over the (row, col)
    pairs; the driver sees only the cell table — bounded by the product
    of the two categorical domains, never by corpus size (this op is
    for enum-like columns; don't point it at open domains like url).
    Driver arithmetic is Python bignums, so web-scale N never overflows
    (the SQL mirror computes in HUGEINT, exact to 2^127).

    Returns (row_col, col_col, o, chi2_micro) with int64 columns.
    """
    import ray as _ray

    from rio_cogeo_ray.stages.agg import partial_group_agg

    cells: dict = {}
    for b in _ray.get(
        partial_group_agg(
            ds.map_batches(
                lambda t: t.select([row_col, col_col]), batch_format="pyarrow"
            ),
            keys=[row_col, col_col],
            count_as="o",
            n_buckets=n_buckets,
        ).to_arrow_refs()
    ):
        if not b.num_rows or row_col not in b.column_names:
            continue  # schema-less empty block (zero-row input)
        for r, c, o in zip(
            b[row_col].to_pylist(), b[col_col].to_pylist(), b["o"].to_pylist()
        ):
            cells[(r, c)] = cells.get((r, c), 0) + int(o)
    out_schema = pa.schema(
        [
            (row_col, pa.string()),
            (col_col, pa.string()),
            ("o", pa.int64()),
            ("chi2_micro", pa.int64()),
        ]
    )
    if not cells:
        return out_schema.empty_table()
    row_tot: dict = {}
    col_tot: dict = {}
    for (r, c), o in cells.items():
        row_tot[r] = row_tot.get(r, 0) + o
        col_tot[c] = col_tot.get(c, 0) + o
    grand = sum(row_tot.values())
    rows = {row_col: [], col_col: [], "o": [], "chi2_micro": []}
    for r in sorted(row_tot, key=str):
        for c in sorted(col_tot, key=str):
            o = cells.get((r, c), 0)
            d = o * grand - row_tot[r] * col_tot[c]
            rows[row_col].append(r)
            rows[col_col].append(c)
            rows["o"].append(o)
            rows["chi2_micro"].append(
                (d * d * 10**6) // (grand * row_tot[r] * col_tot[c])
            )
    return pa.table(
        {
            row_col: pa.array(rows[row_col], pa.string()),
            col_col: pa.array(rows[col_col], pa.string()),
            "o": pa.array(rows["o"], pa.int64()),
            "chi2_micro": pa.array(rows["chi2_micro"], pa.int64()),
        }
    )


def exact_group_split(
    ds,
    group_col: str,
    id_col: str,
    pct_eval: int = 5,
    eval_name: str = "eval",
    train_name: str = "train",
    salt: int = 0,
    n_buckets: int = 64,
):
    """Per-group EXACT-proportion split: exactly ``floor(n_g·pct/100)``
    rows of every group land in the eval split, chosen by hash order —
    the guarantee :func:`split_assign`'s pure-map hash threshold cannot
    give (its per-group share only CONVERGES to pct; a small language
    can end up with zero eval docs). Selection is by
    ``(knuth32(id, salt), id)`` rank inside the group, so it is
    deterministic, resume-stable, and SQL-mirrorable as
    ``ROW_NUMBER() OVER (PARTITION BY g ORDER BY hash, id) <=
    n_g·pct//100``.

    Scale shape: one hash(group) exchange of SLIM (group, id, hash)
    rows — each group co-locates in one bucket, so group counts AND
    ranks fall out of ONE per-bucket lexsort (no count pre-pass, no
    broadcast); payload columns never move (re-join by id downstream,
    the carry-nothing doctrine). Hot groups bound a bucket at the
    group's row count — the irreducible cost of an exact per-group
    quota.

    Returns (id_col, group_col, split) rows for every input row.
    """
    from rio_cogeo_ray.functions.hashing import hash_columns

    def _slim(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().cast(pa.int64())
        g = t[group_col].combine_chunks().cast(pa.string())
        h = knuth32(
            ids.to_numpy(zero_copy_only=False), salt
        ).astype(np.int64)
        slim = pa.table({id_col: ids, group_col: g, "__h": pa.array(h, pa.int64())})
        b = (hash_columns(slim, [group_col]) % np.uint64(n_buckets)).astype(np.int64)
        return slim.append_column("__bucket", pa.array(b, pa.int64()))

    def _rank(t: pa.Table) -> pa.Table:
        empty = pa.schema(
            [
                (id_col, pa.int64()),
                (group_col, pa.string()),
                ("split", pa.string()),
            ]
        ).empty_table()
        if not t.num_rows or id_col not in t.column_names:
            return empty
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        garr = t[group_col].combine_chunks()
        # dictionary codes sort NULL groups as their own partition
        # (SQL PARTITION BY semantics) without object-vs-None compares
        enc = pc.dictionary_encode(garr)
        codes = enc.indices.to_numpy(zero_copy_only=False)
        if codes.dtype.kind == "f":  # nulls surface as NaN indices
            codes = np.where(np.isnan(codes), -1.0, codes)
        codes = codes.astype(np.int64)
        g = garr.to_numpy(zero_copy_only=False)
        h = t["__h"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h, codes))
        gs, ids_s, cs = g[order], ids[order], codes[order]
        new = np.r_[True, cs[1:] != cs[:-1]]
        idx = np.arange(len(gs), dtype=np.int64)
        run_start = np.maximum.accumulate(np.where(new, idx, 0))
        rank1 = idx - run_start + 1  # 1-based rank within group
        starts = np.flatnonzero(new)
        counts = np.diff(np.r_[starts, len(gs)])
        quota = counts * pct_eval // 100
        is_eval = rank1 <= np.repeat(quota, counts)
        split = np.where(is_eval, eval_name, train_name).astype(object)
        return pa.table(
            {
                id_col: pa.array(ids_s, pa.int64()),
                group_col: pa.array(gs, pa.string()),
                "split": pa.array(split, pa.string()),
            }
        )

    return (
        ds.map_batches(_slim, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(
            lambda t: _rank(t.drop_columns(["__bucket"])), batch_format="pyarrow"
        )
    )


def grouped_weighted_median(
    ds,
    group_col: str,
    value_col: str,
    weight_col: str,
    id_col: str,
    n_buckets: int = 32,
):
    """Exact LOWER weighted median per group — the weighted order
    statistic :func:`grouped_quantile` (unweighted) can't express: the
    smallest value whose cumulative weight reaches half the group's
    total (e.g. the median document LENGTH weighted by how much text
    each doc contributes — long docs pull harder). Deterministic via
    the (value, id) unique tiebreak.

    Partitioning contract: ONE hash(group) exchange of slim (group,
    value, weight, id) rows; per bucket one lexsort + segmented
    cumsum, then the first row per group with ``2·cumw ≥ totw`` —
    all-groups-at-once vectorized, output one row per group.

    SQL mirror: windowed SUM cumulative weight + windowed total +
    ``MIN(value) WHERE 2·cw ≥ tw`` per group.

    Null contract (SQL-mirrored): NULL weights count 0 (SUM skips
    them); NULL-value rows are dropped before ranking (mirror with
    ``WHERE value IS NOT NULL`` + ``COALESCE(weight, 0)``) — a null
    must never NaN-poison the bucket cumsum.
    """
    from rio_cogeo_ray.functions.hashing import hash_columns

    def _slim(t: pa.Table) -> pa.Table:
        slim = pa.table(
            {
                group_col: t[group_col].combine_chunks().cast(pa.string()),
                value_col: t[value_col].combine_chunks().cast(pa.int64()),
                weight_col: pc.fill_null(
                    t[weight_col].combine_chunks().cast(pa.int64()), 0
                ),
                id_col: t[id_col].combine_chunks().cast(pa.int64()),
            }
        )
        slim = slim.filter(pc.is_valid(slim[value_col]))
        b = (hash_columns(slim, [group_col]) % np.uint64(n_buckets)).astype(
            np.int64
        )
        return slim.append_column("__bucket", pa.array(b, pa.int64()))

    out_schema = pa.schema(
        [
            (group_col, pa.string()),
            ("wmedian", pa.int64()),
            ("tot_w", pa.int64()),
        ]
    )

    def _median(t: pa.Table) -> pa.Table:
        if not t.num_rows or value_col not in t.column_names:
            return out_schema.empty_table()
        t = t.sort_by(
            [
                (group_col, "ascending"),
                (value_col, "ascending"),
                (id_col, "ascending"),
            ]
        )
        g = t[group_col].combine_chunks().to_numpy(zero_copy_only=False)
        v = t[value_col].combine_chunks().to_numpy(zero_copy_only=False)
        w = t[weight_col].combine_chunks().to_numpy(zero_copy_only=False)
        new = np.r_[True, g[1:] != g[:-1]]
        seg = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        cw = np.cumsum(w)
        base = np.r_[0, cw[starts[1:] - 1]] if len(starts) > 1 else np.array([0])
        cumw = cw - base[seg]
        ends = np.r_[starts[1:], len(g)]
        totw = cumw[ends - 1]
        hit = 2 * cumw >= totw[seg]
        # one row per group: the FIRST hit row of each segment (hits
        # are suffix-contiguous per group since cumw is nondecreasing)
        sel = np.zeros(len(starts), dtype=np.int64)
        found = np.zeros(len(starts), dtype=bool)
        hits = np.flatnonzero(hit)
        if len(hits):
            firsts = np.unique(seg[hits], return_index=True)[1]
            sel_idx = hits[firsts]
            sel[seg[sel_idx]] = sel_idx
            found[seg[sel_idx]] = True
        keep = np.flatnonzero(found)
        return pa.table(
            {
                group_col: pa.array(g[starts][keep].astype(object), pa.string()),
                "wmedian": pa.array(v[sel[keep]], pa.int64()),
                "tot_w": pa.array(totw[keep], pa.int64()),
            }
        )

    return (
        ds.map_batches(_slim, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(
            lambda t: _median(t.drop_columns(["__bucket"])), batch_format="pyarrow"
        )
    )
