"""Deduplication operators — exact, MinHash+LSH, SimHash, n-gram
Jaccard verify, embedding-cosine near-dup.

Training-data-pipeline operators (north-rule additions; the reference
has no record-level set ops — SURVEY.md §2.1 note). All engine-side
hashing is content-addressed and deterministic, so any parallelism
produces the same result sets.

Scale notes (the 100 TB story):

- Exact dedup ships (hash128, id) pairs — never the text — through the
  shuffle; the probability of a 128-bit collision over 10^12 docs is
  ~10^-14, documented as the equivalence assumption vs the oracle's
  GROUP BY text.
- MinHash/SimHash candidate generation emits (band, band_hash, id)
  rows (explode ≤ n_bands per doc) and groups by band bucket — the
  LSH shuffle key is uniform by construction, no salting needed.
- Connected components runs distributed min-label propagation with a
  bounded round count; each round is a pair of small groupbys over
  (node, label) — no driver-side union-find over big data.
- Incremental crawl dedup (incremental_dedup) checks only the DELTA
  against the history: a bloom of the new side prunes the prior side
  map-side (false positives are harmless under anti semantics).
- The R–S set-similarity join (text_similarity_join) bands BOTH tables
  with the same permutations and verifies every cross-side candidate
  by exact Jaccard — zero false positives, recall set by bands.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa

from ray.data.aggregate import Count, Min

from rio_cogeo_ray.functions.hashing import splitmix64

_H1_SEED = 0x51_C0DE
_H2_SEED = 0xFACE_FEED


def _hash128_batch(batch: pa.Table, key_col: str, id_col: str) -> pa.Table:
    """(id, h1, h2) per row — polars' vectorized 64-bit string hash at
    two seeds (native speed; no per-row Python)."""
    import polars as pl

    s = pl.from_arrow(batch[key_col].combine_chunks().cast(pa.large_string()))
    h1 = s.hash(seed=_H1_SEED).to_numpy().astype(np.int64)
    h2 = s.hash(seed=_H2_SEED).to_numpy().astype(np.int64)
    return pa.table(
        {
            id_col: batch[id_col].combine_chunks(),
            "h1": pa.array(h1, pa.int64()),
            "h2": pa.array(h2, pa.int64()),
        }
    )


def exact_dedup(ds, key_col: str = "text", id_col: str = "doc_id", with_counts: bool = False):
    """Keepers of exact duplicate groups: min(id) per distinct content.

    map_batches(hash128, drop content) → bucketed partial→final min(id)
    per (h1, h2) (stages/agg.py — per-group Python cost O(buckets), not
    O(distinct texts)). Equivalent to SQL ``GROUP BY <content>`` modulo
    128-bit collisions (assumption documented in the module doc).
    """
    from rio_cogeo_ray.stages.agg import partial_group_agg

    hashed = ds.map_batches(
        lambda t: _hash128_batch(t, key_col, id_col), batch_format="pyarrow"
    )
    agged = partial_group_agg(
        hashed, keys=["h1", "h2"], min_cols=[id_col],
        count_as="dups" if with_counts else None,
    )
    keep = [f"min_{id_col}"] + (["dups"] if with_counts else [])

    def _rename(t: pa.Table) -> pa.Table:
        t = t.select(keep)
        return t.rename_columns([id_col] + (["dups"] if with_counts else []))

    return agged.map_batches(_rename, batch_format="pyarrow")


def exact_dedup_best(
    ds,
    key_col: str = "text",
    id_col: str = "doc_id",
    score_cols: "list[str]" = ("score",),
):
    """Keep the BEST row per exact-duplicate group instead of min(id):
    the argmax of ``score_cols`` (each descending), ties broken by the
    smallest id — the quality-aware representative selection a webtext
    pipeline runs after scoring (keep the highest-quality copy of each
    duplicated page).

    Same scale shape as :func:`exact_dedup`: content leaves the map
    stage as a 128-bit hash, the shuffle moves ≤1 candidate row per
    group per batch (argmax partials combine map-side via
    agg.latest_by), and the final per-bucket argmax is one vectorized
    sort+mask. SQL mirror: ``ROW_NUMBER() OVER (PARTITION BY <content>
    ORDER BY score DESC, id) = 1``.
    """
    from rio_cogeo_ray.stages.agg import latest_by

    score_cols = list(score_cols)

    def _hash_scored(t: pa.Table) -> pa.Table:
        out = _hash128_batch(t, key_col, id_col)
        for c in score_cols:
            out = out.append_column(c, t[c].combine_chunks())
        nid = pa.compute.negate(
            t[id_col].combine_chunks().cast(pa.int64())
        )
        return out.append_column("__negid", nid)

    hashed = ds.map_batches(_hash_scored, batch_format="pyarrow")
    best = latest_by(hashed, keys=["h1", "h2"], order_by=score_cols + ["__negid"])
    return best.map_batches(
        lambda t: t.select([id_col] + score_cols), batch_format="pyarrow"
    )


def incremental_dedup(
    new_ds,
    prior_ds,
    key_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 1 << 23,
    n_buckets: int = 64,
    concurrency: int = 2,
):
    """Dedup a NEW crawl against a PRIOR corpus snapshot, then within
    itself: keepers = min(id) per distinct new content whose content is
    absent from the prior snapshot. This is the recurring-crawl pattern
    at 100 TB — the history is never re-deduped; only the delta is
    checked against it.

    Scale design (ONE exchange total):

    - Both sides leave their map stage as (h1, h2) 128-bit content
      hashes; text never shuffles (same contract as exact_dedup).
    - A bloom filter of the NEW side's h1 hashes (built distributed,
      stages/join.py:build_bloom, broadcast once via ray.put)
      map-side-prunes the PRIOR side: a prior row can only affect the
      result if its content collides with some new row, so the
      overwhelmingly larger history contributes ~|new ∩ prior| plus
      ~2% false positives to the exchange instead of all of it.
      False positives are harmless under anti semantics — a surviving
      prior row drops a new row only on an exact (h1, h2) match,
      which IS the membership rule. (Contrast bloom_semi_join's note:
      pruning the PROBE side of an anti join is unsound; pruning the
      MEMBERSHIP side, as here, is exact.)
    - One groupby over splitmix64(h1) % n_buckets then performs BOTH
      steps vectorized per bucket: lexsort the (h1, h2) runs, drop new
      rows whose run contains a prior row, min-id per surviving run
      via np.minimum.reduceat.

    The new side is traversed twice (bloom build + exchange feed); it
    is the delta, orders of magnitude smaller than the history. When
    even that matters, persist its hashed stage as the crawl's content
    index (16 B/row parquet) and feed both passes from it — the same
    index next crawl's run reads as ITS prior side.

    SQL mirror: ``SELECT MIN(id) FROM new WHERE content NOT IN
    (SELECT content FROM prior) GROUP BY content`` (modulo the
    module-level 128-bit collision assumption).
    """
    import ray

    from rio_cogeo_ray.stages.join import BloomProbe, build_bloom

    new_h = new_ds.map_batches(
        lambda t: _hash128_batch(t, key_col, id_col), batch_format="pyarrow"
    )
    prior_h = prior_ds.map_batches(
        lambda t: _hash128_batch(t, key_col, id_col).drop_columns([id_col]),
        batch_format="pyarrow",
    )
    bloom_ref = ray.put(build_bloom(new_h, "h1", m_bits))
    prior_pref = prior_h.map_batches(
        BloomProbe,
        fn_constructor_args=(bloom_ref, "h1"),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def _tag(t: pa.Table, src: int) -> pa.Table:
        h1 = t["h1"].combine_chunks()
        ids = (
            t[id_col].combine_chunks().cast(pa.int64())
            if src
            else pa.array(np.zeros(t.num_rows, np.int64))
        )
        b = (
            splitmix64(h1.to_numpy(zero_copy_only=False).astype(np.uint64))
            % np.uint64(n_buckets)
        ).astype(np.int64)
        return pa.table(
            {
                "h1": h1,
                "h2": t["h2"].combine_chunks(),
                id_col: ids,
                "__src": pa.array(np.full(t.num_rows, src, np.int8)),
                "__bucket": pa.array(b, pa.int64()),
            }
        )

    both = new_h.map_batches(
        lambda t: _tag(t, 1), batch_format="pyarrow"
    ).union(prior_pref.map_batches(lambda t: _tag(t, 0), batch_format="pyarrow"))

    def _bucket(g: pa.Table) -> pa.Table:
        h1 = g["h1"].combine_chunks().to_numpy(zero_copy_only=False)
        h2 = g["h2"].combine_chunks().to_numpy(zero_copy_only=False)
        src = g["__src"].combine_chunks().to_numpy(zero_copy_only=False)
        ids = g[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        if len(h1) == 0:
            return pa.table({id_col: pa.array([], pa.int64())})
        order = np.lexsort((h2, h1))
        h1s, h2s = h1[order], h2[order]
        srcs, idss = src[order], ids[order]
        starts_mask = np.r_[True, (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])]
        run = np.cumsum(starts_mask) - 1
        has_prior = np.zeros(run[-1] + 1, dtype=bool)
        has_prior[run[srcs == 0]] = True
        keep = (srcs == 1) & ~has_prior[run]
        if not keep.any():
            return pa.table({id_col: pa.array([], pa.int64())})
        kept_run, kept_ids = run[keep], idss[keep]
        starts = np.r_[0, np.flatnonzero(kept_run[1:] != kept_run[:-1]) + 1]
        mins = np.minimum.reduceat(kept_ids, starts)
        return pa.table({id_col: pa.array(mins, pa.int64())})

    return both.groupby("__bucket").map_groups(_bucket, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Shingling + MinHash
# ---------------------------------------------------------------------------


def _char_shingle_hashes(texts: pa.Array, k: int) -> Tuple[np.ndarray, np.ndarray]:
    """All k-char shingle hashes per document, vectorized over the Arrow
    values buffer (one rolling pass over bytes, no per-row Python).
    Returns (doc_idx, shingle_hash) flat arrays."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    # branch on the offset width rather than casting large_string down:
    # a batch holding > 2 GiB of text would make the int32 cast raise
    off_dt = np.int64 if pa.types.is_large_string(texts.type) else np.int32
    off = np.frombuffer(texts.buffers()[1], dtype=off_dt)
    off = off[texts.offset : texts.offset + len(texts) + 1].astype(np.int64)
    values = np.frombuffer(texts.buffers()[2], dtype=np.uint8)
    lens = np.diff(off)
    n_sh = np.maximum(lens - k + 1, 0)
    doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), n_sh)
    lo, hi = int(off[0]), int(off[-1])
    span = hi - lo
    if span < k:
        return doc_idx, np.zeros(0, dtype=np.uint64)
    # polynomial hash at EVERY byte position of the contiguous values
    # span via shifted slices (sequential reads, no gather), then keep
    # only positions where a whole shingle fits inside one document
    # one byte->u64 widening for the whole span (k slices share it),
    # not one widening copy per rolling step
    v = values[lo:hi].astype(np.uint64)
    h_all = np.zeros(span - k + 1, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            h_all *= np.uint64(1099511628211)
            h_all += v[j : span - k + 1 + j]
        h_all = splitmix64(h_all)
    starts = np.repeat(off[:-1], n_sh) + _pos_within(n_sh)
    return doc_idx, h_all[starts - lo]


def _pos_within(counts: np.ndarray) -> np.ndarray:
    counts = np.asarray(counts, dtype=np.int64)
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    ends = np.cumsum(counts)
    starts = ends - counts
    return np.arange(total, dtype=np.int64) - np.repeat(starts, counts)


def minhash_signatures(
    texts: pa.Array, num_perm: int = 64, shingle_k: int = 5
) -> np.ndarray:
    """(n_docs, num_perm) uint64 MinHash signatures. Permutations are the
    classic (a*x + b) universal family with fixed seeded constants."""
    doc_idx, sh = _char_shingle_hashes(texts, shingle_k)
    n = len(texts) if not isinstance(texts, pa.ChunkedArray) else texts.length()
    sig = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(sh) == 0:
        return sig
    a = splitmix64(np.arange(1, num_perm + 1, dtype=np.uint64) * np.uint64(0x9E37)) | np.uint64(1)
    b = splitmix64(np.arange(num_perm, dtype=np.uint64) + np.uint64(0xB0B))
    # doc_idx is sorted (shingles laid out doc by doc) → per-doc minima
    # via minimum.reduceat, far faster than np.minimum.at scatter.
    # The perm loop is memory-bandwidth-bound, so it runs over cache-
    # resident CHUNKS of shingles (~4 MB) split on doc boundaries: each
    # chunk is read from L3, not DRAM, for all num_perm passes.
    run_starts = np.flatnonzero(np.concatenate(([True], doc_idx[1:] != doc_idx[:-1])))
    docs_with = doc_idx[run_starts]
    chunk_sh = 1 << 19
    cut = np.searchsorted(run_starts, np.arange(chunk_sh, len(sh), chunk_sh))
    bounds = np.unique(np.concatenate(([0], cut, [len(run_starts)])))
    with np.errstate(over="ignore"):
        for ci in range(len(bounds) - 1):
            r0, r1 = bounds[ci], bounds[ci + 1]
            if r0 == r1:
                continue
            s0 = run_starts[r0]
            s1 = run_starts[r1] if r1 < len(run_starts) else len(sh)
            shc = sh[s0:s1]
            rsc = run_starts[r0:r1] - s0
            dwc = docs_with[r0:r1]
            hp = np.empty_like(shc)  # one buffer reused across perms
            for p in range(num_perm):
                np.multiply(shc, a[p], out=hp)
                hp += b[p]
                sig[dwc, p] = np.minimum.reduceat(hp, rsc)
    return sig


def minhash_signatures_oph(
    texts: pa.Array, num_perm: int = 64, shingle_k: int = 5
) -> np.ndarray:
    """(n_docs, num_perm) uint64 signatures via One-Permutation Hashing
    (Li, Owen, Zhang; NIPS 2012) with rotation densification
    (Shrivastava & Li; ICML 2014): ONE hash pass over the shingles —
    bin = hash mod num_perm, value = min hash per (doc, bin) through a
    single ``np.minimum.at`` scatter — instead of ``num_perm``
    multiply+reduce passes. Same estimator family (per-bin collision
    probability ≈ Jaccard), ~num_perm× fewer element-ops, so this is
    the default scheme on the banding hot path. Empty bins borrow the
    value of the nearest non-empty bin to the right (circular), which
    keeps signatures deterministic and identical shingle sets
    identical; docs with zero shingles stay all-MAX (classic
    behavior)."""
    doc_idx, sh = _char_shingle_hashes(texts, shingle_k)
    n = len(texts) if not isinstance(texts, pa.ChunkedArray) else texts.length()
    k = num_perm
    sig = np.full(n * k, np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(sh) == 0:
        return sig.reshape(n, k)
    bins = (sh % np.uint64(k)).astype(np.int64)
    np.minimum.at(sig, doc_idx * k + bins, sh)
    sig = sig.reshape(n, k)
    mx = np.iinfo(np.uint64).max
    empty = sig == mx
    # rotation densification: ≤ k cheap column passes over (n, k).
    # Zero-shingle docs (all bins MAX) are excluded up front — they can
    # never fill, and without the exclusion one such row would force
    # every batch through all k-1 passes.
    need = empty & ~empty.all(axis=1)[:, None]
    if need.any():
        filled = sig.copy()
        for s in range(1, k):
            src = np.roll(filled, -s, axis=1)
            take = need & (src != mx)
            if take.any():
                sig[take] = src[take]
                need[take] = False
            if not need.any():
                break
    return sig


def minhash_band_rows(
    batch: pa.Table,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    carry_cols: tuple = (),
    scheme: str = "oph",
) -> pa.Table:
    """Explode each doc into (id, band, band_hash) LSH bucket rows —
    the shingle→minhash→band map stage. ``carry_cols`` replicates
    payload columns onto every band row (bands× shuffle volume — use
    only when downstream in-bucket verification needs the payload;
    re-join by id instead when the payload dominates). ``scheme``:
    ``"oph"`` (default — one-permutation hashing, one pass over the
    shingles) or ``"classic"`` (num_perm independent (a·x+b) minima;
    lower variance on very sparse shingle sets)."""
    rows_per_band = num_perm // bands
    sig_fn = minhash_signatures_oph if scheme == "oph" else minhash_signatures
    sig = sig_fn(batch[text_col].combine_chunks(), num_perm)
    n = len(batch)
    ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
    band_ids = np.tile(np.arange(bands, dtype=np.int64), n)
    doc_rep = np.repeat(ids, bands)
    with np.errstate(over="ignore"):
        bh = np.zeros((n, bands), dtype=np.uint64)
        for r in range(rows_per_band):
            bh = bh * np.uint64(1099511628211) ^ sig[:, r::rows_per_band][:, :bands]
        bh = splitmix64(bh)
    out = pa.table(
        {
            id_col: pa.array(doc_rep),
            "band": pa.array(band_ids, pa.int64()),
            "band_hash": pa.array(bh.reshape(-1).astype(np.int64), pa.int64()),
        }
    )
    if carry_cols:
        rep = pa.array(np.repeat(np.arange(n, dtype=np.int64), bands), pa.int64())
        for c in carry_cols:
            out = out.append_column(c, batch[c].combine_chunks().take(rep))
    return out


def _bucket_edges_vec(group: pa.Table, id_col: str) -> pa.Table:
    """MANY LSH buckets (one reduce bucket) → star edges member →
    bucket-min, fully vectorized (sort + run boundaries). Star edges
    keep connectivity while avoiding quadratic pair explosion in hot
    buckets."""
    if len(group) == 0:
        return pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    group = group.sort_by(
        [("band", "ascending"), ("band_hash", "ascending"), (id_col, "ascending")]
    )
    b = group["band"].combine_chunks().to_numpy(zero_copy_only=False)
    h = group["band_hash"].combine_chunks().to_numpy(zero_copy_only=False)
    ids = group[id_col].combine_chunks().to_numpy(zero_copy_only=False)
    new = np.concatenate(([True], (b[1:] != b[:-1]) | (h[1:] != h[:-1])))
    starts = np.flatnonzero(new)
    lens = np.diff(np.append(starts, len(b)))
    first = np.repeat(ids[starts], lens)
    member = ~new  # every non-first member gets an edge to the bucket min
    return pa.table(
        {
            "src": pa.array(ids[member], pa.int64()),
            "dst": pa.array(first[member], pa.int64()),
        }
    )


def lsh_candidate_edges(ds, id_col: str = "doc_id", text_col: str = "text",
                        num_perm: int = 64, bands: int = 16, n_buckets: int = 64):
    """documents → candidate-duplicate edges via banded MinHash LSH.
    LSH buckets hash into ``n_buckets`` reduce buckets (the bucketed
    map_groups pattern — millions of LSH buckets, O(n_buckets) Python)."""
    from rio_cogeo_ray.functions.hashing import hash_columns

    band_rows = ds.map_batches(
        lambda t: minhash_band_rows(t, id_col, text_col, num_perm, bands),
        batch_format="pyarrow",
    )

    def _route(t: pa.Table) -> pa.Table:
        rb = (hash_columns(t, ["band", "band_hash"]) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("__bucket", pa.array(rb, pa.int64()))

    edges = band_rows.map_batches(_route, batch_format="pyarrow").groupby(
        "__bucket"
    ).map_groups(
        lambda g: _bucket_edges_vec(g.drop_columns(["__bucket"]), id_col),
        batch_format="pyarrow",
    )
    return edges


def connected_components(edges, max_rounds: "int | None" = None, round_cap: int = 256):
    """Distributed min-label propagation over (src, dst) edges — no
    joins, no driver materialization of node rows: each round is
    ``union(edges-as-messages, labels) → groupby(node).map_groups`` that
    re-emits every node's current min label to its neighbors, then a
    ``groupby(node).min`` to absorb messages.

    Returns (node, label) with label = min reachable node id.

    Two execution modes:
    - ``max_rounds=None`` (default): run to FIXPOINT. Labels only ever
      decrease, so an unchanged Σlabel between rounds proves no label
      moved and the loop exits (costs one materialize + tiny Sum per
      round; ``round_cap`` is a runaway backstop only). Correct for any
      topology — a length-L chain converges after L rounds.
    - ``max_rounds=k``: exactly k LAZY rounds, executed as ONE streaming
      pipeline with no per-round barrier — cheaper when the topology
      bounds the diameter by construction (LSH star edges: 2-4 rounds).
    """
    # undirected: symmetrize once (reused every round)
    def _sym(t: pa.Table) -> pa.Table:
        node = pa.concat_arrays(
            [t["src"].combine_chunks().cast(pa.int64()), t["dst"].combine_chunks().cast(pa.int64())]
        )
        nbr = pa.concat_arrays(
            [t["dst"].combine_chunks().cast(pa.int64()), t["src"].combine_chunks().cast(pa.int64())]
        )
        return pa.table({"node": node, "nbr": nbr, "label": pa.nulls(len(node), pa.int64())})

    sym = edges.map_batches(_sym, batch_format="pyarrow").materialize()

    from rio_cogeo_ray.functions.hashing import splitmix64 as _sm
    from rio_cogeo_ray.stages.agg import partial_group_agg

    _SENTINEL = np.iinfo(np.int64).max

    def _min_labels(msgs):
        """(node, label) messages → min label per node, bucketed."""
        agged = partial_group_agg(msgs, keys=["node"], min_cols=["label"], count_as=None)
        return agged.map_batches(
            lambda t: t.rename_columns(["node", "label"]), batch_format="pyarrow"
        )

    # initial labels: min(node, neighbors)
    def _init_msgs(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lab = pc.min_element_wise(t["node"], t["nbr"])
        return pa.table({"node": t["node"], "label": lab})

    labels = _min_labels(sym.map_batches(_init_msgs, batch_format="pyarrow"))

    def _spread_bucket(group: pa.Table) -> pa.Table:
        """MANY nodes (one reduce bucket): per node, min label over its
        label rows and itself, broadcast to self + neighbors —
        vectorized (sort + reduceat)."""
        if len(group) == 0:
            return pa.table({"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())})
        group = group.sort_by([("node", "ascending")])
        node = group["node"].combine_chunks().to_numpy(zero_copy_only=False)
        lab = group["label"].combine_chunks().fill_null(_SENTINEL).to_numpy(zero_copy_only=False)
        import pyarrow.compute as pc

        nbr_arr = group["nbr"].combine_chunks()
        nbr_valid = pc.is_valid(nbr_arr).to_numpy(zero_copy_only=False)
        nbr = nbr_arr.fill_null(0).to_numpy(zero_copy_only=False)
        new = np.concatenate(([True], node[1:] != node[:-1]))
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(node)))
        run_min = np.minimum(np.minimum.reduceat(lab, starts), node[starts])
        # targets: each valid nbr entry + one self row per node
        lab_per_row = np.repeat(run_min, lens)
        t_nodes = np.concatenate((nbr[nbr_valid], node[starts]))
        t_labels = np.concatenate((lab_per_row[nbr_valid], run_min))
        return pa.table(
            {
                "node": pa.array(t_nodes, pa.int64()),
                "label": pa.array(t_labels, pa.int64()),
            }
        )

    from ray.data.aggregate import Sum as _Sum

    def _pointer_jump(labels):
        """Path halving: label(n) ← label(label(n)) via one bucketed
        hash join of the label table against itself (every label value
        IS a node id with its own row, so the inner join is total and
        1:1). Propagation alone moves the component min ONE hop per
        round — O(diameter) rounds on a chain; contracting label chains
        each round makes the fixpoint mode O(log diameter). Labels stay
        monotone non-increasing (label(label(n)) ≤ label(n)), so the
        Σlabel convergence check is unaffected."""
        from rio_cogeo_ray.stages import join as join_mod

        right = labels.map_batches(
            lambda t: t.rename_columns(["label", "label2"]), batch_format="pyarrow"
        )
        joined = join_mod.bucketed_hash_join(labels, right, on="label", how="inner")
        return joined.map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"].combine_chunks().cast(pa.int64()),
                    "label": t["label2"].combine_chunks().cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )

    n_buckets = 64
    prev_sum = None
    fixpoint = max_rounds is None
    for _ in range(round_cap if fixpoint else max_rounds):
        def _as_msg_schema(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": t["node"].combine_chunks().cast(pa.int64()),
                    "nbr": pa.nulls(len(t), pa.int64()),
                    "label": t["label"].combine_chunks().cast(pa.int64()),
                }
            )

        combined = sym.union(labels.map_batches(_as_msg_schema, batch_format="pyarrow"))

        def _route(t: pa.Table) -> pa.Table:
            n = t["node"].combine_chunks().to_numpy(zero_copy_only=False)
            b = (_sm(n.astype(np.uint64)) % np.uint64(n_buckets)).astype(np.int64)
            return t.append_column("__bucket", pa.array(b, pa.int64()))

        msgs = combined.map_batches(_route, batch_format="pyarrow").groupby(
            "__bucket"
        ).map_groups(
            lambda g: _spread_bucket(g.drop_columns(["__bucket"])),
            batch_format="pyarrow",
        )
        labels = _min_labels(msgs)
        if fixpoint:
            # contract label chains (see _pointer_jump) then check the
            # monotone Σlabel: unchanged Σ means no label moved anywhere
            # in EITHER step — converged.
            labels = _pointer_jump(labels.materialize()).materialize()
            cur = labels.aggregate(_Sum("label"))["sum(label)"]
            if cur == prev_sum:
                break
            prev_sum = cur
    return labels


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(texts: pa.Array, shingle_k: int = 4) -> np.ndarray:
    """64-bit SimHash over k-char shingle hashes (unweighted): bit i of
    the fingerprint = majority vote of shingle-hash bit i."""
    doc_idx, sh = _char_shingle_hashes(texts, shingle_k)
    n = texts.length() if isinstance(texts, pa.ChunkedArray) else len(texts)
    votes = np.zeros((n, 64), dtype=np.int64)
    if len(sh):
        counts = np.bincount(doc_idx, minlength=n)
        for bit in range(64):
            ones = np.bincount(
                doc_idx, weights=((sh >> np.uint64(bit)) & np.uint64(1)).astype(np.float64),
                minlength=n,
            )
            votes[:, bit] = (2 * ones > counts).astype(np.int64)
    fp = np.zeros(n, dtype=np.uint64)
    for bit in range(64):
        fp |= votes[:, bit].astype(np.uint64) << np.uint64(bit)
    return fp.astype(np.int64)


def simhash_band_rows(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """(id, fingerprint, band, band_bits): 4 bands × 16 bits — pigeonhole
    guarantee: hamming distance ≤ 3 ⇒ at least one identical band."""
    fp = simhash64(batch[text_col].combine_chunks())
    ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
    n = len(batch)
    band = np.tile(np.arange(4, dtype=np.int64), n)
    rep = np.repeat(np.arange(n), 4)
    bits = (fp.astype(np.uint64)[rep] >> (band.astype(np.uint64) * np.uint64(16))) & np.uint64(0xFFFF)
    return pa.table(
        {
            id_col: pa.array(np.repeat(ids, 4)),
            "fingerprint": pa.array(fp[rep].astype(np.int64), pa.int64()),
            "band": pa.array(band, pa.int64()),
            "band_bits": pa.array(bits.astype(np.int64), pa.int64()),
        }
    )


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (np.asarray(a).astype(np.uint64)) ^ (np.asarray(b).astype(np.uint64))
    cnt = np.zeros(len(x) if x.ndim else 1, dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return cnt


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicates (random-hyperplane LSH + exact verify)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=16)
def _srp_hyperplanes(d: int, n_bits: int, seed: int) -> np.ndarray:
    """SRP hyperplane matrix — a pure function of (dim, n_bits, seed),
    built ONCE PER WORKER PROCESS via lru_cache (never per batch, never
    shipped through the object store)."""
    return np.random.RandomState(seed).standard_normal((d, n_bits))


def embedding_band_rows(
    batch: pa.Table,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_bits: int = 64,
    bands: int = 8,
    seed: int = 7,
    carry_payload: bool = True,
) -> pa.Table:
    """(id, band, band_hash[, embedding]) LSH rows for cosine similarity:
    sign bits of projections onto ``n_bits`` seeded random hyperplanes
    (the classic SRP-LSH — collision probability 1 - θ/π per bit),
    packed into ``bands`` band hashes. The hyperplane matrix is a pure
    function of (dim, n_bits, seed), cached per worker process — tiny,
    never shipped. ``carry_payload=True`` replicates the normalized
    embedding onto every band row (bands× payload through the shuffle
    but no second join); ``False`` emits only (id, band, band_hash) —
    the 100 TB path, with embeddings re-joined by id before verify."""
    from rio_cogeo_ray.stages.ann import _matrix, _normalize

    X = _normalize(_matrix(batch[emb_col]))
    n, d = X.shape
    H = _srp_hyperplanes(d, n_bits, seed)
    bits = (X @ H) >= 0.0
    per = n_bits // bands
    weights = (np.int64(1) << np.arange(per, dtype=np.int64))
    hashes = np.zeros((n, bands), dtype=np.int64)
    for b in range(bands):
        hashes[:, b] = bits[:, b * per : (b + 1) * per] @ weights
    rep = np.repeat(np.arange(n, dtype=np.int64), bands)
    ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
    out = pa.table(
        {
            id_col: pa.array(ids[rep], pa.int64()),
            "band": pa.array(np.tile(np.arange(bands, dtype=np.int64), n), pa.int64()),
            "band_hash": pa.array(hashes.reshape(-1), pa.int64()),
        }
    )
    if carry_payload:
        emb = pa.FixedSizeListArray.from_arrays(
            pa.array(X[rep].reshape(-1), pa.float32()), d
        )
        out = out.append_column("emb", emb)
    return out


def _bucket_star_edges_emb(group: pa.Table, id_col: str) -> pa.Table:
    """LSH buckets → star edges (member, bucket-min) carrying BOTH
    normalized embeddings, vectorized (sort + run boundaries) — the
    embedding analog of :func:`_bucket_edges_vec`."""
    empty = pa.table(
        {
            "src": pa.array([], pa.int64()),
            "dst": pa.array([], pa.int64()),
            "cos": pa.array([], pa.float64()),
        }
    )
    if len(group) == 0:
        return empty
    group = group.sort_by(
        [("band", "ascending"), ("band_hash", "ascending"), (id_col, "ascending")]
    )
    b = group["band"].combine_chunks().to_numpy(zero_copy_only=False)
    h = group["band_hash"].combine_chunks().to_numpy(zero_copy_only=False)
    ids = group[id_col].combine_chunks().to_numpy(zero_copy_only=False)
    emb = group["emb"].combine_chunks()
    d = emb.type.list_size
    X = emb.flatten().to_numpy(zero_copy_only=False).reshape(-1, d)
    new = np.concatenate(([True], (b[1:] != b[:-1]) | (h[1:] != h[:-1])))
    starts = np.flatnonzero(new)
    lens = np.diff(np.append(starts, len(b)))
    first_id = np.repeat(ids[starts], lens)
    first_row = np.repeat(starts, lens)
    member = ~new
    if not member.any():
        return empty
    # exact cosine verify per (member, bucket-min) pair — one rowwise dot
    cos = (X[member] * X[first_row[member]]).sum(axis=1)
    return pa.table(
        {
            "src": pa.array(ids[member], pa.int64()),
            "dst": pa.array(first_id[member], pa.int64()),
            "cos": pa.array(cos, pa.float64()),
        }
    )


def embedding_neardup(
    ds,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    threshold: float = 0.9,
    n_bits: int = 64,
    bands: int = 8,
    n_buckets: int = 64,
    seed: int = 7,
    max_rounds: "int | None" = None,
    carry_payload: bool = False,
):
    """Embedding-cosine near-duplicate clusters: SRP-LSH banding →
    bucketed star edges → EXACT cosine verify (edges below ``threshold``
    are dropped before clustering) → distributed connected components.
    Returns (node, label) rows for every id that appears in a verified
    near-dup edge; label = min reachable id (cluster representative).
    Pair semantics: members verify against their bucket minimum (the
    standard star compromise — a pair sharing no band with a common
    representative may be missed; raise ``bands`` for recall).

    ``carry_payload=False`` (default, the 100 TB path): band rows ship
    only (id, band, band_hash); candidate pair embeddings are
    re-joined by id through a bloom-prefiltered bucketed join before
    the exact cosine verify. ``True`` replicates the normalized
    embedding onto every band row (bands× payload, one fewer join).
    Both paths verify the identical candidate-pair set and yield
    identical clusters."""
    from rio_cogeo_ray.functions.hashing import hash_columns

    def _route(t: pa.Table) -> pa.Table:
        rb = (hash_columns(t, ["band", "band_hash"]) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("__bucket", pa.array(rb, pa.int64()))

    if carry_payload:
        rows = ds.map_batches(
            lambda t: embedding_band_rows(
                t, id_col, emb_col, n_bits, bands, seed, carry_payload=True
            ),
            batch_format="pyarrow",
        )
        cand = rows.map_batches(_route, batch_format="pyarrow").groupby(
            "__bucket"
        ).map_groups(
            lambda g: _bucket_star_edges_emb(g.drop_columns(["__bucket"]), id_col),
            batch_format="pyarrow",
        )

        def _verify(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            keep = pc.greater_equal(t["cos"], pa.scalar(threshold, pa.float64()))
            return t.filter(keep).select(["src", "dst"])

        edges = cand.map_batches(_verify, batch_format="pyarrow")
    else:
        rows = ds.map_batches(
            lambda t: embedding_band_rows(
                t, id_col, emb_col, n_bits, bands, seed, carry_payload=False
            ),
            batch_format="pyarrow",
        )
        cand = rows.map_batches(_route, batch_format="pyarrow").groupby(
            "__bucket"
        ).map_groups(
            lambda g: _bucket_edges_vec(g.drop_columns(["__bucket"]), id_col),
            batch_format="pyarrow",
        )
        edges = _rejoin_and_verify(
            cand, ds, id_col, [emb_col],
            lambda g: _verify_emb_pairs_bucket(g, emb_col, threshold),
            n_buckets,
            encode_fn=lambda t: _encode_emb_binary(t, emb_col),
        )
        if edges is None:  # zero candidate pairs: nothing to verify
            import ray.data as _rd

            return _rd.from_arrow(_EMPTY_LABELS)
    # default max_rounds=None → fixpoint-detected convergence (clusters
    # chained across bands can exceed any fixed round bound)
    return connected_components(edges, max_rounds=max_rounds)


# ---------------------------------------------------------------------------
# n-gram Jaccard verification
# ---------------------------------------------------------------------------


def jaccard_shingles(text_a: str, text_b: str, k: int = 5) -> float:
    """Exact k-char shingle Jaccard of two texts (verification kernel
    applied to candidate pairs, not the corpus)."""
    sa = {text_a[i : i + k] for i in range(max(0, len(text_a) - k + 1))}
    sb = {text_b[i : i + k] for i in range(max(0, len(text_b) - k + 1))}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def _row_shingle_sets(texts: pa.Array, k: int):
    """Per-row sorted-unique shingle-hash arrays (verification support).
    One vectorized shingle pass for the whole bucket; per-row np.unique
    only for rows that actually participate in a candidate pair."""
    doc_idx, sh = _char_shingle_hashes(texts, k)
    n = len(texts)
    bounds = np.searchsorted(doc_idx, np.arange(n + 1))
    cache: dict = {}

    def get(row: int) -> np.ndarray:
        s = cache.get(row)
        if s is None:
            s = np.unique(sh[bounds[row]:bounds[row + 1]])
            cache[row] = s
        return s

    return get


def _bucket_star_edges_verified(
    group: pa.Table, id_col: str, text_col: str, shingle_k: int, threshold: float
) -> pa.Table:
    """Star edges member → bucket-min, kept only when the EXACT k-char
    shingle Jaccard of the pair meets ``threshold``. Candidate pairs
    are deduplicated across bands FIRST (np.unique over packed id
    pairs) so each pair's set intersection runs once; the per-pair
    kernel is numpy ``intersect1d`` over pre-hashed sorted shingle
    sets — Python cost O(candidate pairs), which LSH banding keeps a
    vanishing fraction of the corpus."""
    empty = pa.table(
        {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
    )
    if len(group) == 0:
        return empty
    group = group.sort_by(
        [("band", "ascending"), ("band_hash", "ascending"), (id_col, "ascending")]
    )
    b = group["band"].combine_chunks().to_numpy(zero_copy_only=False)
    h = group["band_hash"].combine_chunks().to_numpy(zero_copy_only=False)
    ids = group[id_col].combine_chunks().to_numpy(zero_copy_only=False)
    new = np.concatenate(([True], (b[1:] != b[:-1]) | (h[1:] != h[:-1])))
    starts = np.flatnonzero(new)
    lens = np.diff(np.append(starts, len(b)))
    first_row = np.repeat(starts, lens)
    member = ~new
    m_rows = np.flatnonzero(member)
    f_rows = first_row[m_rows]
    if len(m_rows) == 0:
        return empty
    # drop self-pairs (same doc in one bucket twice) and dedup across bands
    pair_ids = np.column_stack((ids[m_rows], ids[f_rows]))
    ok = pair_ids[:, 0] != pair_ids[:, 1]
    m_rows, f_rows, pair_ids = m_rows[ok], f_rows[ok], pair_ids[ok]
    if len(m_rows) == 0:
        return empty
    packed = np.ascontiguousarray(pair_ids).view("V16").ravel()
    _, keep_idx = np.unique(packed, return_index=True)
    m_rows, f_rows = m_rows[keep_idx], f_rows[keep_idx]
    sets = _row_shingle_sets(group[text_col].combine_chunks(), shingle_k)
    src_out, dst_out = [], []
    for m, f in zip(m_rows.tolist(), f_rows.tolist()):
        sa, sb_ = sets(m), sets(f)
        union = len(sa) + len(sb_) - len(np.intersect1d(sa, sb_, assume_unique=True))
        jac = 1.0 if union == 0 else (len(sa) + len(sb_) - union) / union
        if jac >= threshold:
            src_out.append(ids[m])
            dst_out.append(ids[f])
    return pa.table(
        {
            "src": pa.array(np.asarray(src_out, dtype=np.int64), pa.int64()),
            "dst": pa.array(np.asarray(dst_out, dtype=np.int64), pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Payload-free candidate verification (re-join payloads by id)
# ---------------------------------------------------------------------------


class _ExactIdFilter:
    """Map-side EXACT membership filter against a broadcast sorted
    int64 id array (ray.put once, fetched once per actor)."""

    def __init__(self, ref, key_col: str = "probe"):
        import ray

        self.ids = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        self.key_col = key_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        p = batch[self.key_col].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        if len(self.ids) == 0:
            return batch.slice(0, 0)
        pos = np.clip(np.searchsorted(self.ids, p), 0, len(self.ids) - 1)
        return batch.filter(pa.array(self.ids[pos] == p))


class _AttachAndVerify:
    """Map stage over DISTINCT candidate pairs: attach both members'
    payloads from a broadcast payload table (sorted by probe id), emit
    the (probe, src, dst, payload…) layout the verify kernels expect,
    and verify IN PLACE — zero shuffle. Used when the candidate payload
    set is small enough to broadcast (the common LSH case)."""

    def __init__(self, pay_ref, payload_cols, verify_bucket):
        import ray

        tbl = ray.get(pay_ref) if isinstance(pay_ref, ray.ObjectRef) else pay_ref
        self.tbl = tbl
        self.probe = tbl["probe"].to_numpy(zero_copy_only=False).astype(np.int64)
        self.payload_cols = list(payload_cols)
        self.verify_bucket = verify_bucket

    def __call__(self, t: pa.Table) -> pa.Table:
        s = t["src"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        d = t["dst"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        if len(self.probe) == 0 or len(s) == 0:
            return _EMPTY_EDGES
        ps = np.clip(np.searchsorted(self.probe, s), 0, len(self.probe) - 1)
        pd_ = np.clip(np.searchsorted(self.probe, d), 0, len(self.probe) - 1)
        ok = (self.probe[ps] == s) & (self.probe[pd_] == d)
        s, d, ps, pd_ = s[ok], d[ok], ps[ok], pd_[ok]
        if len(s) == 0:
            return _EMPTY_EDGES
        take = np.empty(2 * len(s), dtype=np.int64)
        take[0::2] = pd_  # probe == dst first (the runs-of-two layout)
        take[1::2] = ps
        pay = self.tbl.take(pa.array(take, pa.int64()))
        cols = {
            "probe": pay["probe"],
            "src": pa.array(np.repeat(s, 2), pa.int64()),
            "dst": pa.array(np.repeat(d, 2), pa.int64()),
        }
        for c in self.payload_cols:
            cols[c] = pay[c]
        return self.verify_bucket(pa.table(cols))


def _rejoin_and_verify(
    cand,
    ds,
    id_col: str,
    payload_cols,
    verify_bucket,
    n_buckets: int = 64,
    m_bits: int = 1 << 23,
    concurrency: int = 2,
    encode_fn=None,
    gather_max: int = 262_144,
):
    """UNVERIFIED candidate edges (src, dst) → VERIFIED edges, with
    payloads re-joined from the corpus by id — the 100 TB alternative
    to carrying payload on every band row (bands× payload through the
    LSH shuffle). Tiered by candidate volume, because under LSH
    candidates are a vanishing fraction of the corpus:

    - **zero pairs** → return None without touching the corpus;
    - **≤ gather_max pairs** (the common case): broadcast the distinct
      candidate-id set, filter the corpus EXACTLY map-side (one scan,
      no bloom FPs), broadcast the resulting bounded payload table, and
      attach+verify per pair batch — ZERO shuffles after the scan;
    - **beyond**: bloom-prefilter the corpus (bitmap tree-merge), exact
      bucketed hash join on the probe id, bucketed verify — shuffle
      volume is candidate payloads ×1 (plus bloom FPs), never the
      corpus.

    ``encode_fn``: optional map over the renamed (probe, payload…)
    corpus table BEFORE joining/broadcasting — Arrow's hash join
    rejects list-typed non-key columns (encode lists to binary; decode
    in the verify kernel). ``verify_bucket``: kernel over (probe, src,
    dst, payload…) rows returning verified (src, dst) edges."""
    import ray

    from rio_cogeo_ray.stages import join as join_mod
    from rio_cogeo_ray.stages.agg import partial_group_agg

    payload_cols = list(payload_cols)
    pairs = partial_group_agg(
        cand, keys=["src", "dst"], count_as=None
    ).materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return None

    def _prep(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["probe"] + payload_cols)
        return encode_fn(t) if encode_fn is not None else t

    corpus = ds.select_columns([id_col] + payload_cols).map_batches(
        _prep, batch_format="pyarrow"
    )

    if n_pairs <= gather_max:
        pt = pa.concat_tables(
            [b for b in ray.get(pairs.to_arrow_refs()) if b.num_rows]
        )
        ids = np.unique(
            np.concatenate(
                [
                    pt["src"].to_numpy(zero_copy_only=False).astype(np.int64),
                    pt["dst"].to_numpy(zero_copy_only=False).astype(np.int64),
                ]
            )
        )
        pref = corpus.map_batches(
            _ExactIdFilter,
            fn_constructor_args=(ray.put(ids),),
            batch_format="pyarrow",
            concurrency=concurrency,
        )
        blocks = [
            b for b in ray.get(pref.materialize().to_arrow_refs()) if b.num_rows
        ]
        if not blocks:
            return None
        ptbl = pa.concat_tables(blocks).combine_chunks().sort_by(
            [("probe", "ascending")]
        )
        return pairs.map_batches(
            _AttachAndVerify,
            fn_constructor_args=(ray.put(ptbl), payload_cols, verify_bucket),
            batch_format="pyarrow",
            concurrency=concurrency,
        )

    def _explode(t: pa.Table) -> pa.Table:
        s = t["src"].combine_chunks().cast(pa.int64())
        d = t["dst"].combine_chunks().cast(pa.int64())
        return pa.table(
            {
                "src": pa.concat_arrays([s, s]),
                "dst": pa.concat_arrays([d, d]),
                "probe": pa.concat_arrays([s, d]),
            }
        )

    # materialized: probes feeds the bloom build AND the verify join,
    # and `pairs` carries an all-to-all upstream — without the boundary
    # each consumer re-executes it (join.py schema-resolution doctrine)
    probes = pairs.map_batches(_explode, batch_format="pyarrow").materialize()
    bloom_ref = ray.put(join_mod.build_bloom(probes, "probe", m_bits=m_bits))
    pref = corpus.map_batches(
        join_mod.BloomProbe,
        fn_constructor_args=(bloom_ref, "probe"),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    paired = join_mod.bucketed_hash_join(
        probes, pref, on="probe", how="inner", n_buckets=n_buckets
    )
    return _verify_pairs_rejoined(paired, verify_bucket, n_buckets)


def _pair_runs_of_two(g: pa.Table):
    """Sorted (src, dst, probe) pair rows → (row index of first member,
    row index of second member) for every pair that re-joined BOTH
    payloads. probe==dst sorts first (dst < src by construction)."""
    src = g["src"].combine_chunks().to_numpy(zero_copy_only=False)
    dst = g["dst"].combine_chunks().to_numpy(zero_copy_only=False)
    new = np.concatenate(([True], (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])))
    starts = np.flatnonzero(new)
    lens = np.diff(np.append(starts, len(src)))
    ok = lens == 2
    return starts[ok], starts[ok] + 1


def _verify_pairs_rejoined(
    paired, verify_bucket, n_buckets: int = 64
):
    """(probe, src, dst, payload…) rows → verified (src, dst) edges via
    a bucketed per-pair exact-verify kernel (hash(src,dst) routing)."""
    from rio_cogeo_ray.functions.hashing import hash_columns

    def _route(t: pa.Table) -> pa.Table:
        rb = (hash_columns(t, ["src", "dst"]) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("__bucket", pa.array(rb, pa.int64()))

    return (
        paired.map_batches(_route, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(
            lambda g: verify_bucket(g.drop_columns(["__bucket"])),
            batch_format="pyarrow",
        )
    )


_EMPTY_EDGES = pa.table(
    {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
)

#: connected_components output schema, for zero-candidate short-circuits
_EMPTY_LABELS = pa.table(
    {"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())}
)


def _verify_text_pairs_bucket(
    g: pa.Table, text_col: str, shingle_k: int, threshold: float
) -> pa.Table:
    """Exact k-char shingle Jaccard over re-joined candidate pairs."""
    if len(g) == 0:
        return _EMPTY_EDGES
    g = g.sort_by(
        [("src", "ascending"), ("dst", "ascending"), ("probe", "ascending")]
    )
    a_rows, b_rows = _pair_runs_of_two(g)
    if len(a_rows) == 0:
        return _EMPTY_EDGES
    src = g["src"].combine_chunks().to_numpy(zero_copy_only=False)
    dst = g["dst"].combine_chunks().to_numpy(zero_copy_only=False)
    sets = _row_shingle_sets(g[text_col].combine_chunks(), shingle_k)
    src_out, dst_out = [], []
    for a, b in zip(a_rows.tolist(), b_rows.tolist()):
        sa, sb_ = sets(a), sets(b)
        union = len(sa) + len(sb_) - len(np.intersect1d(sa, sb_, assume_unique=True))
        jac = 1.0 if union == 0 else (len(sa) + len(sb_) - union) / union
        if jac >= threshold:
            src_out.append(src[a])
            dst_out.append(dst[a])
    return pa.table(
        {
            "src": pa.array(np.asarray(src_out, dtype=np.int64), pa.int64()),
            "dst": pa.array(np.asarray(dst_out, dtype=np.int64), pa.int64()),
        }
    )


def _encode_emb_binary(t: pa.Table, emb_col: str) -> pa.Table:
    """list<float> embedding column → raw little-endian float64 binary
    (Arrow's hash join rejects list-typed non-key columns)."""
    from rio_cogeo_ray.stages.ann import _matrix

    X = _matrix(t[emb_col])
    n, d = X.shape
    flat = np.ascontiguousarray(X, dtype="<f8")
    offsets = (np.arange(n + 1, dtype=np.int32) * np.int32(d * 8))
    arr = pa.BinaryArray.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(flat.tobytes())],
    )
    return t.set_column(t.schema.get_field_index(emb_col), emb_col, arr)


def _decode_emb_binary(col: pa.ChunkedArray) -> np.ndarray:
    """Inverse of :func:`_encode_emb_binary` — zero-copy reshape over
    the values buffer (binary value regions are contiguous in offset
    order by construction)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    off = np.frombuffer(arr.buffers()[1], dtype=np.int32)
    off = off[arr.offset : arr.offset + len(arr) + 1].astype(np.int64)
    widths = np.diff(off)
    if len(widths) == 0:
        return np.zeros((0, 0), dtype=np.float64)
    d = int(widths[0]) // 8
    flat = np.frombuffer(
        arr.buffers()[2], dtype="<f8",
        count=(int(off[-1]) - int(off[0])) // 8, offset=int(off[0]),
    )
    return flat.reshape(len(arr), d)


def _verify_emb_pairs_bucket(
    g: pa.Table, emb_col: str, threshold: float
) -> pa.Table:
    """Exact cosine over re-joined candidate pairs (embeddings are raw
    from the corpus here — normalize before the rowwise dot)."""
    from rio_cogeo_ray.stages.ann import _matrix, _normalize

    if len(g) == 0:
        return _EMPTY_EDGES
    g = g.sort_by(
        [("src", "ascending"), ("dst", "ascending"), ("probe", "ascending")]
    )
    a_rows, b_rows = _pair_runs_of_two(g)
    if len(a_rows) == 0:
        return _EMPTY_EDGES
    src = g["src"].combine_chunks().to_numpy(zero_copy_only=False)
    dst = g["dst"].combine_chunks().to_numpy(zero_copy_only=False)
    col = g[emb_col].combine_chunks()
    if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
        X = _normalize(_decode_emb_binary(col))
    else:
        X = _normalize(_matrix(col))
    cos = (X[a_rows] * X[b_rows]).sum(axis=1)
    ok = cos >= threshold
    return pa.table(
        {
            "src": pa.array(src[a_rows[ok]].astype(np.int64), pa.int64()),
            "dst": pa.array(dst[a_rows[ok]].astype(np.int64), pa.int64()),
        }
    )


def text_neardup_verified(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.7,
    n_buckets: int = 64,
    max_rounds: "int | None" = None,
    carry_payload: bool = False,
):
    """Text near-duplicate clusters with EXACT verification — the full
    dedup-verify pipeline: shingle→minhash→band rows → bucketed star
    candidates → exact k-char-shingle Jaccard filter (candidates below
    ``threshold`` are dropped BEFORE clustering, so LSH false positives
    never merge clusters) → distributed connected components. Returns
    (node, label) rows for ids in verified edges.

    ``carry_payload=False`` (default, the 100 TB path): band rows ship
    only (id, band, band_hash); candidate pair payloads are re-joined
    by id through a bloom-prefiltered bucketed join before the exact
    verify — the LSH shuffle moves hashes, never text. ``True``
    replicates the text onto every band row (bands× payload through
    the shuffle; one fewer join — fine for small corpora). Both paths
    verify the identical candidate-pair set and yield identical
    clusters."""
    from rio_cogeo_ray.functions.hashing import hash_columns

    if carry_payload:
        rows = ds.map_batches(
            lambda t: minhash_band_rows(
                t, id_col, text_col, num_perm, bands, carry_cols=(text_col,)
            ),
            batch_format="pyarrow",
        )

        def _route(t: pa.Table) -> pa.Table:
            rb = (
                hash_columns(t, ["band", "band_hash"]) % np.uint64(n_buckets)
            ).astype(np.int64)
            return t.append_column("__bucket", pa.array(rb, pa.int64()))

        edges = (
            rows.map_batches(_route, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(
                lambda g: _bucket_star_edges_verified(
                    g.drop_columns(["__bucket"]), id_col, text_col, shingle_k, threshold
                ),
                batch_format="pyarrow",
            )
        )
    else:
        cand = lsh_candidate_edges(
            ds, id_col=id_col, text_col=text_col,
            num_perm=num_perm, bands=bands, n_buckets=n_buckets,
        )
        edges = _rejoin_and_verify(
            cand, ds, id_col, [text_col],
            lambda g: _verify_text_pairs_bucket(g, text_col, shingle_k, threshold),
            n_buckets,
        )
        if edges is None:  # zero candidate pairs: nothing to verify
            import ray.data as _rd

            return _rd.from_arrow(_EMPTY_LABELS)
    return connected_components(edges, max_rounds=max_rounds)


# ---------------------------------------------------------------------------
# Decontamination (benchmark-overlap removal)
# ---------------------------------------------------------------------------


def collect_eval_keys(eval_ds, key_col: str = "__key") -> "pa.Array":
    """Distinct key values of the (SMALL) eval/benchmark side, collected
    to the driver. Contract: eval sets are benchmark-sized (10^3–10^6
    rows), so the distinct-key array fits in one object — the big
    training side never leaves the cluster. Dedup happens distributed
    (partial per-batch unique → final) so the driver receives distinct
    values only."""
    import pyarrow.compute as pc

    def _uniq(t: pa.Table) -> pa.Table:
        return pa.table({key_col: pc.unique(t[key_col].combine_chunks())})

    rows = eval_ds.map_batches(_uniq, batch_format="pyarrow", batch_size=65536)
    # one more fan-in level so the driver sees near-distinct rows
    rows = rows.map_batches(_uniq, batch_format="pyarrow", batch_size=4096)
    # single execution, blocks fetched as Arrow (no per-row Python);
    # key type follows whatever key_fn produced (string, int hash, ...).
    # Null keys are dropped: a null contamination key never matches
    # anything (SQL NULL = NULL semantics — see DecontamFilter).
    import ray as _ray

    mat = rows.materialize()
    blocks = [b for b in _ray.get(mat.to_arrow_refs()) if b.num_rows]
    if not blocks:
        sch = mat.schema()
        if sch is None:
            # fully empty eval chain: Ray cannot even name a schema —
            # an untyped empty set (callers treat len()==0 as "skip")
            return pa.array([], pa.null())
        # typed empty set (key type follows key_fn even when no rows)
        key_type = sch.base_schema.field(key_col).type
        return pa.array([], key_type)
    tbl = pa.concat_tables(blocks, promote_options="default")
    return pc.unique(pc.drop_null(tbl[key_col].combine_chunks()))


class DecontamFilter:
    """Actor stage: drop training rows whose contamination key appears
    in the broadcast eval-key set (`ray.put` once, shared zero-copy by
    every actor on a node). Vectorized membership via pc.is_in."""

    def __init__(self, keys_ref, key_fn):
        import ray as _ray

        self.keys = _ray.get(keys_ref) if isinstance(keys_ref, _ray.ObjectRef) else keys_ref
        self.key_fn = key_fn

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        k = self.key_fn(batch)
        # null keys never match (SQL NULL = NULL is not true): the
        # value_set is null-free (collect_eval_keys drops nulls) and a
        # null probe's is_in result is nulled out to "no hit".
        hit = pc.fill_null(pc.and_(pc.is_in(k, value_set=self.keys), pc.is_valid(k)), False)
        return batch.filter(pc.invert(hit))


def neardup_keepers(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    n_buckets: int = 64,
    max_rounds: "int | None" = None,
    keep_cols=None,
):
    """The CONSUMABLE form of near-dup dedup: the corpus with every
    verified near-duplicate cluster collapsed to its representative
    (min id = the CC label), plus every unclustered doc — i.e. what a
    training pipeline actually feeds downstream, where
    :func:`text_neardup_verified` returns the cluster labels
    themselves. Returns the kept docs' ``keep_cols`` (default
    (id, text)).

    Scale shape: the drop set is the non-representative members
    (node ≠ label — bounded by the duplicate mass, same size class as
    segment_dedup's losers); the corpus anti-joins against it through
    the bucketed exchange (stages/join.py) — id rows on the drop side,
    one text-bearing pass on the corpus side. LSH recall caveats are
    text_neardup_verified's; representatives are deterministic (min
    reachable id)."""
    from rio_cogeo_ray.stages.join import bucketed_hash_join

    if keep_cols is None:
        keep_cols = [id_col, text_col]
    labels = text_neardup_verified(
        ds,
        id_col=id_col,
        text_col=text_col,
        threshold=threshold,
        n_buckets=n_buckets,
        max_rounds=max_rounds,
    )

    def _drops(t: pa.Table) -> pa.Table:
        node = t["node"].combine_chunks().to_numpy(zero_copy_only=False)
        lab = t["label"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = node != lab
        return pa.table({id_col: pa.array(node[keep], pa.int64())})

    drops = labels.map_batches(_drops, batch_format="pyarrow")

    def _proj(t: pa.Table) -> pa.Table:
        return t.select(keep_cols)

    return bucketed_hash_join(
        ds.map_batches(_proj, batch_format="pyarrow"),
        drops,
        on=id_col,
        how="anti",
        n_buckets=n_buckets,
    )


def _bucket_item_pair_counts(g: pa.Table, entity_col: str, item_col: str) -> pa.Table:
    """Per (item) run inside one bucket: every unordered entity pair
    sharing that item, collapsed to (ua, ub, cnt) partials — fully
    vectorized triangular pair generation (repeat/offset arithmetic,
    no per-run Python)."""
    empty = pa.table(
        {
            "ua": pa.array([], pa.int64()),
            "ub": pa.array([], pa.int64()),
            "cnt": pa.array([], pa.int64()),
        }
    )
    if not g.num_rows:
        return empty
    g = g.sort_by([(item_col, "ascending"), (entity_col, "ascending")])
    ent = g[entity_col].combine_chunks().to_numpy(zero_copy_only=False)
    items = g[item_col]
    if isinstance(items, pa.ChunkedArray):
        items = items.combine_chunks()
    # run detection over the (already sorted) item column — works for
    # string or int items via Arrow equality on adjacent slices
    import pyarrow.compute as pc

    neq = pc.not_equal(items.slice(1), items.slice(0, len(items) - 1))
    new = np.r_[True, pc.fill_null(neq, True).to_numpy(zero_copy_only=False)]
    run = np.cumsum(new) - 1
    idx = np.arange(len(ent), dtype=np.int64)
    run_start = np.maximum.accumulate(np.where(new, idx, 0))
    q = idx - run_start                      # position within run
    run_len = np.bincount(run)
    L = run_len[run]
    a_rep = (L - 1 - q)                      # each elem pairs with all later elems
    total = int(a_rep.sum())
    if total == 0:
        return empty
    ua = np.repeat(ent, a_rep)
    excl = np.concatenate(([0], np.cumsum(a_rep)[:-1]))
    offs = np.arange(total, dtype=np.int64) - np.repeat(excl, a_rep)
    ub = ent[np.repeat(idx, a_rep) + offs + 1]
    lo = np.minimum(ua, ub)
    hi = np.maximum(ua, ub)
    order = np.lexsort((hi, lo))
    lo, hi = lo[order], hi[order]
    first = np.r_[True, (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])]
    starts = np.flatnonzero(first)
    cnt = np.diff(np.r_[starts, len(lo)])
    return pa.table(
        {
            "ua": pa.array(lo[starts], pa.int64()),
            "ub": pa.array(hi[starts], pa.int64()),
            "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
        }
    )


def ranking_overlap_join(
    ranked_ds,
    entity_col: str,
    item_col: str,
    min_overlap: int,
    n_buckets: int = 64,
):
    """Similarity join over top-k RANKINGS (PAPERS.md EDBT 2020 shape):
    given each entity's top-k item list (rows ``(entity, item)``),
    return every entity pair sharing at least ``min_overlap`` items —
    the set-overlap similarity join on ranked lists. EXACT: overlap is
    the SUM of per-item pair contributions (each shared item lives in
    exactly one item bucket), so no candidate/verify round is needed.

    Scale shape — two linear shuffles:

    1. bucket by hash(item): one vectorized triangular pair pass per
       bucket collapses to (ua, ub, cnt) partials;
    2. partial→final sum per (ua, ub) (stages/agg.py), filter ≥ t.

    Hot items are the quadratic hazard (an item in every entity's
    top-k contributes |entities|²/2 pairs — same boilerplate caveat as
    text_similarity_join's shared bands). At 100 TB apply the paper's
    prefix filter upstream: order items by ascending global frequency
    and index only each list's first k−t+1 items for CANDIDATE
    generation, then verify by re-joining full lists — the sum path
    here stays the exact small/medium-cardinality engine."""
    from rio_cogeo_ray.functions.hashing import hash_columns
    from rio_cogeo_ray.stages.agg import partial_group_agg

    def _route(t: pa.Table) -> pa.Table:
        b = (hash_columns(t, [item_col]) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("__bucket", pa.array(b, pa.int64()))

    partials = (
        ranked_ds.map_batches(_route, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(
            lambda g: _bucket_item_pair_counts(
                g.drop_columns(["__bucket"]), entity_col, item_col
            ),
            batch_format="pyarrow",
        )
    )
    summed = partial_group_agg(partials, keys=["ua", "ub"], sum_cols=["cnt"], count_as=None)

    def _final(t: pa.Table) -> pa.Table:
        ov = t["sum_cnt"].combine_chunks()
        keep = pa.compute.greater_equal(ov, min_overlap)
        t = t.filter(keep)
        return pa.table(
            {
                "ua": t["ua"].combine_chunks(),
                "ub": t["ub"].combine_chunks(),
                "overlap": t["sum_cnt"].combine_chunks(),
            }
        )

    return summed.map_batches(_final, batch_format="pyarrow")


def _doc_gram64_keys(batch: pa.Table, n: int, id_col: str, text_col: str) -> pa.Table:
    """(id, __key) rows: each doc's DISTINCT word n-grams folded to one
    64-bit key (splitmix64(g1) ^ g2 over text.py's 128-bit rolling
    gram hash). 64 bits suffice for the decontam MEMBERSHIP test:
    a collision (≈ n_train_grams · n_eval_grams / 2^64) drops one
    extra training doc — decontamination errs on the safe side by
    construction, unlike dedup where collisions must stay 2^-128."""
    from rio_cogeo_ray.functions.hashing import splitmix64
    from rio_cogeo_ray.stages.text import _doc_ngram_hashes

    g = _doc_ngram_hashes(batch, n, id_col, text_col)
    g1 = g["g1"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.uint64)
    g2 = g["g2"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.uint64)
    key = (splitmix64(g1) ^ g2).astype(np.int64)
    return pa.table(
        {id_col: g[id_col].combine_chunks(), "__key": pa.array(key, pa.int64())}
    )


class NgramDecontamFilter:
    """Actor stage: drop training docs sharing ANY word n-gram with the
    broadcast eval gram-key set (sorted int64 array, resolved once per
    actor; per batch one searchsorted membership + one bincount)."""

    def __init__(self, keys_ref, n: int, id_col: str, text_col: str):
        import ray as _ray

        keys = _ray.get(keys_ref) if isinstance(keys_ref, _ray.ObjectRef) else keys_ref
        self.keys = np.sort(np.asarray(keys, dtype=np.int64))
        self.n, self.id_col, self.text_col = n, id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not len(batch) or not len(self.keys):
            return batch
        g = _doc_gram64_keys(batch, self.n, self.id_col, self.text_col)
        if not g.num_rows:
            return batch  # every doc shorter than n tokens: no grams, keep all
        k = g["__key"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(self.keys, k), len(self.keys) - 1)
        hit = self.keys[pos] == k
        if not hit.any():
            return batch
        bad = np.unique(g[self.id_col].combine_chunks().to_numpy(zero_copy_only=False)[hit])
        ids = batch[self.id_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        p = np.minimum(np.searchsorted(bad, ids), len(bad) - 1)
        return batch.filter(pa.array(bad[p] != ids))


def decontaminate_ngrams(
    train_ds,
    eval_ds,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency: int = 2,
):
    """N-gram-overlap benchmark decontamination (the GPT-3/PaLM recipe:
    drop any training doc sharing an n-gram — canonically 13 tokens —
    with an eval document), the stronger companion to the prefix-key
    :func:`decontaminate`.

    Same broadcast contract: eval docs reduce DISTRIBUTED to distinct
    gram keys (bounded by eval size × doc length — benchmark-sized by
    definition), ship once via ``ray.put``; the training side filters
    in place with ZERO shuffle. Docs shorter than ``n`` tokens carry no
    grams and are always kept (the standard convention)."""
    import ray as _ray

    def _eval_keys(t: pa.Table) -> pa.Table:
        return _doc_gram64_keys(t, n, id_col, text_col).select(["__key"])

    keys = collect_eval_keys(eval_ds.map_batches(_eval_keys, batch_format="pyarrow"))
    if len(keys) == 0:
        return train_ds  # empty eval set: nothing can be contaminated
    keys_ref = _ray.put(keys.to_numpy(zero_copy_only=False).astype(np.int64))
    return train_ds.map_batches(
        NgramDecontamFilter,
        fn_constructor_args=(keys_ref, n, id_col, text_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


class _MatchedGramKeys:
    """Actor stage: per training batch, emit the DISTINCT gram keys that
    are also in the broadcast eval key set — output rows are bounded by
    the eval gram count, never by the batch (searchsorted membership,
    same probe as NgramDecontamFilter)."""

    def __init__(self, keys_ref, n: int, id_col: str, text_col: str):
        import ray as _ray

        keys = _ray.get(keys_ref) if isinstance(keys_ref, _ray.ObjectRef) else keys_ref
        self.keys = np.sort(np.asarray(keys, dtype=np.int64))
        self.n, self.id_col, self.text_col = n, id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table({"__key": pa.array([], pa.int64())})
        if not len(batch) or not len(self.keys):
            return empty
        g = _doc_gram64_keys(batch, self.n, self.id_col, self.text_col)
        if not g.num_rows:
            return empty
        k = g["__key"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(self.keys, k), len(self.keys) - 1)
        hit = np.unique(k[self.keys[pos] == k])
        return pa.table({"__key": pa.array(hit, pa.int64())})


def contamination_report(
    train_ds,
    eval_ds,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency: int = 2,
):
    """Per-eval-doc n-gram overlap coverage against a training corpus —
    the REPORT half of decontamination (GPT-3 appendix C / PaLM
    contamination analysis: "X% of eval doc Y's n-grams appear in
    training"), where :func:`decontaminate_ngrams` is the removal half.

    Output one row per eval doc that carries at least one n-gram:
    (id, n_grams, n_hit, coverage_ppm = 1e6 * n_hit // n_grams). Docs
    shorter than ``n`` tokens have no grams and are omitted (the same
    convention as the filter).

    Scale contract: the eval side is benchmark-sized by definition, so
    its distinct (doc, gram-key) pairs collect bounded; the gram-key
    SET broadcasts once (ray.put) and the training corpus streams
    through a ZERO-shuffle membership probe whose emitted rows are
    bounded by |eval grams| per batch, tree-reduced to one distinct
    matched set. The training side never shuffles and never leaves the
    cluster; driver state is O(eval grams). 64-bit folded gram keys:
    a collision adds one phantom hit (≈ n_train · n_eval / 2^64 —
    negligible; errs toward reporting MORE contamination, the safe
    side, same argument as _doc_gram64_keys)."""
    import ray as _ray

    def _pairs(t: pa.Table) -> pa.Table:
        return _doc_gram64_keys(t, n, id_col, text_col)

    # eval side: bounded distinct (id, key) pairs to the driver
    mat = eval_ds.map_batches(_pairs, batch_format="pyarrow").materialize()
    blocks = [b for b in _ray.get(mat.to_arrow_refs()) if b.num_rows]
    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "n_grams": pa.array([], pa.int64()),
            "n_hit": pa.array([], pa.int64()),
            "coverage_ppm": pa.array([], pa.int64()),
        }
    )
    if not blocks:
        return empty
    pairs = pa.concat_tables(blocks)
    eids = pairs[id_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
    ekeys = pairs["__key"].combine_chunks().to_numpy(zero_copy_only=False)
    keys = np.unique(ekeys)
    keys_ref = _ray.put(keys.astype(np.int64))

    matched_ds = train_ds.map_batches(
        _MatchedGramKeys,
        fn_constructor_args=(keys_ref, n, id_col, text_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    matched = collect_eval_keys(matched_ds)  # distinct-reduced, bounded
    m = np.sort(matched.to_numpy(zero_copy_only=False).astype(np.int64))

    # finalize per eval doc (bounded rows): hits = grams present in m
    if len(m):
        pos = np.minimum(np.searchsorted(m, ekeys), len(m) - 1)
        is_hit = (m[pos] == ekeys).astype(np.int64)
    else:
        is_hit = np.zeros(len(ekeys), dtype=np.int64)
    order = np.argsort(eids, kind="stable")
    es, hs = eids[order], is_hit[order]
    new = np.ones(len(es), dtype=bool)
    new[1:] = es[1:] != es[:-1]
    starts = np.flatnonzero(new)
    n_grams = np.diff(np.append(starts, len(es)))
    n_hit = np.add.reduceat(hs, starts)
    cov = 1_000_000 * n_hit // n_grams
    return pa.table(
        {
            id_col: pa.array(es[starts], pa.int64()),
            "n_grams": pa.array(n_grams.astype(np.int64), pa.int64()),
            "n_hit": pa.array(n_hit.astype(np.int64), pa.int64()),
            "coverage_ppm": pa.array(cov.astype(np.int64), pa.int64()),
        }
    )


def decontaminate(train_ds, eval_ds, key_fn, eval_key_fn=None, concurrency: int = 2):
    """Benchmark decontamination: remove training rows whose key
    (e.g. a normalized text prefix or fingerprint) collides with any
    eval-set row's key — the standard pre-training hygiene step.

    Broadcast anti-join: eval keys (small side) collect → `ray.put`
    once → every DecontamFilter actor filters its batches locally.
    ZERO shuffle of the training side. `key_fn(batch) -> pa.Array`
    computes the contamination key; eval_key_fn defaults to key_fn.
    """
    import ray as _ray

    ekf = eval_key_fn or key_fn

    def _keys(t: pa.Table) -> pa.Table:
        return pa.table({"__key": ekf(t)})

    keys = collect_eval_keys(eval_ds.map_batches(_keys, batch_format="pyarrow"))
    keys_ref = _ray.put(keys)
    return train_ds.map_batches(
        DecontamFilter,
        fn_constructor_args=(keys_ref, key_fn),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# R–S set-similarity join (two-table; PAPERS.md "Distributed Streaming
# Set Similarity Join", ICDE 2020 shape)
# ---------------------------------------------------------------------------


def _bucket_cross_pairs(g: pa.Table) -> pa.Table:
    """(enc, band, band_hash, side) bucket rows → ALL cross-side
    candidate pairs per (band, band_hash) run, fully vectorized
    (repeat/offset arithmetic — no per-run Python loop)."""
    empty = pa.table(
        {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
    )
    if len(g) == 0:
        return empty
    g = g.sort_by(
        [
            ("band", "ascending"),
            ("band_hash", "ascending"),
            ("side", "ascending"),
            ("enc", "ascending"),
        ]
    )
    b = g["band"].combine_chunks().to_numpy(zero_copy_only=False)
    h = g["band_hash"].combine_chunks().to_numpy(zero_copy_only=False)
    s = g["side"].combine_chunks().to_numpy(zero_copy_only=False)
    e = g["enc"].combine_chunks().to_numpy(zero_copy_only=False)
    new = np.r_[True, (b[1:] != b[:-1]) | (h[1:] != h[:-1])]
    run = np.cumsum(new) - 1
    nruns = run[-1] + 1
    l_mask = s == 0
    l_cnt = np.bincount(run[l_mask], minlength=nruns)
    r_cnt = np.bincount(run[~l_mask], minlength=nruns)
    run_starts = np.flatnonzero(new)
    r_start = run_starts + l_cnt  # rights follow lefts inside each run
    li = np.flatnonzero(l_mask)
    rc = r_cnt[run[li]]  # rights available to each left row
    total = int(rc.sum())
    if total == 0:
        return empty
    out_l = np.repeat(li, rc)
    seg_start = np.cumsum(rc) - rc
    within = np.arange(total, dtype=np.int64) - np.repeat(seg_start, rc)
    out_r = np.repeat(r_start[run[li]], rc) + within
    return pa.table(
        {
            "src": pa.array(e[out_l], pa.int64()),
            "dst": pa.array(e[out_r], pa.int64()),
        }
    )


def text_similarity_join(
    left,
    right,
    threshold: float = 0.7,
    left_id: str = "doc_id",
    right_id: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    n_buckets: int = 64,
):
    """R–S set-similarity JOIN: pairs (left_id, right_id) whose k-char
    shingle Jaccard ≥ ``threshold``, across TWO datasets. Candidates
    come from shared MinHash LSH bands (both sides banded with the
    SAME permutations — a pair sharing no band is missed; recall rises
    with ``bands``); every candidate is verified by EXACT Jaccard, so
    the output has NO false positives. Scale shape:

    - band rows carry only (enc_id, band, band_hash, side): text never
      enters the LSH exchange; payloads re-join by id through the
      tiered :func:`_rejoin_and_verify` path;
    - per (band, band_hash) run, ALL cross-side pairs emit via
      vectorized repeat/offset arithmetic — a hot band (boilerplate
      shared by both corpora) quadratically inflates ITS run only;
      cap/stopword such bands upstream if one key dominates;
    - pair dedup (a pair sharing many bands) collapses in the
      partial→final groupby inside the re-join.

    ids are disambiguated by side (enc = 2·id / 2·id+1), so the two
    tables may share id values. PRECONDITION: ids are unique WITHIN
    each side (the primary-key contract every id-addressed operator
    here assumes) — a duplicated id makes pair verification
    ill-defined (the payload re-join would attach an arbitrary copy of
    that id's text, or drop the pair on the bucketed tier); dedup by
    id first if the input can violate it.
    """
    import ray.data as _rd

    def _enc_rows(side: int, id_name: str):
        def _fn(t: pa.Table) -> pa.Table:
            ids = t[id_name].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
            enc = ids * np.int64(2) + np.int64(side)
            t2 = pa.table(
                {"enc": pa.array(enc, pa.int64()), text_col: t[text_col].combine_chunks()}
            )
            out = minhash_band_rows(t2, "enc", text_col, num_perm, bands)
            return out.append_column(
                "side", pa.array(np.full(out.num_rows, side, np.int8))
            )

        return _fn

    rows = left.map_batches(_enc_rows(0, left_id), batch_format="pyarrow").union(
        right.map_batches(_enc_rows(1, right_id), batch_format="pyarrow")
    )

    from rio_cogeo_ray.functions.hashing import hash_columns

    def _route(t: pa.Table) -> pa.Table:
        rb = (hash_columns(t, ["band", "band_hash"]) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("__bucket", pa.array(rb, pa.int64()))

    cand = (
        rows.map_batches(_route, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(
            lambda g: _bucket_cross_pairs(g.drop_columns(["__bucket"])),
            batch_format="pyarrow",
        )
    )

    enc_union = left.map_batches(
        lambda t: pa.table(
            {
                "enc": pa.array(
                    t[left_id].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
                    * np.int64(2),
                    pa.int64(),
                ),
                text_col: t[text_col].combine_chunks(),
            }
        ),
        batch_format="pyarrow",
    ).union(
        right.map_batches(
            lambda t: pa.table(
                {
                    "enc": pa.array(
                        t[right_id].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
                        * np.int64(2)
                        + np.int64(1),
                        pa.int64(),
                    ),
                    text_col: t[text_col].combine_chunks(),
                }
            ),
            batch_format="pyarrow",
        )
    )

    edges = _rejoin_and_verify(
        cand,
        enc_union,
        "enc",
        [text_col],
        lambda g: _verify_text_pairs_bucket(g, text_col, shingle_k, threshold),
        n_buckets,
    )
    if edges is None:
        return _rd.from_arrow(
            pa.table(
                {
                    "left_id": pa.array([], pa.int64()),
                    "right_id": pa.array([], pa.int64()),
                }
            )
        )

    def _decode(t: pa.Table) -> pa.Table:
        src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        dst = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "left_id": pa.array(src // 2, pa.int64()),
                "right_id": pa.array(dst // 2, pa.int64()),
            }
        )

    return edges.map_batches(_decode, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Persisted LSH band index + incremental near-dup ingest
# ---------------------------------------------------------------------------

BAND_INDEX_MANIFEST = "band_index.json"


def _band_roots(index_dir: str) -> List[str]:
    """Every band-row root: the base build plus appended generations
    (the search.py _posting_roots doctrine)."""
    import os

    roots = [os.path.join(index_dir, "bands")]
    for name in sorted(os.listdir(index_dir)):
        if name.startswith("bands.gen-"):
            roots.append(os.path.join(index_dir, name))
    return [r for r in roots if os.path.isdir(r)]


def _band_shard_files(index_dir: str, shards, exclude_gen: str = None) -> List[str]:
    """Parquet leafs of the probed band shards across ALL generations.
    ``exclude_gen`` skips one generation — neardup_ingest excludes its
    OWN fingerprint so a crash-retry of the same delta matches against
    the identical index state (not its own prior append)."""
    import os

    files: List[str] = []
    skip = None if exclude_gen is None else f"bands.gen-{exclude_gen}"
    for root in _band_roots(index_dir):
        if skip is not None and os.path.basename(root) == skip:
            continue
        for s in shards:
            sdir = os.path.join(root, f"shard={int(s)}")
            if os.path.isdir(sdir):
                files.extend(
                    os.path.join(sdir, f)
                    for f in sorted(os.listdir(sdir))
                    if f.endswith(".parquet")
                )
    return files


def _band_key(band: np.ndarray, band_hash: np.ndarray) -> np.ndarray:
    """One uint64 per (band, band_hash) LSH bucket — the probe key."""
    return splitmix64(
        band.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        ^ band_hash.astype(np.int64).view(np.uint64)
    )


def _band_rows_sharded(ds, id_col, text_col, num_perm, bands, scheme, n_shards):
    from rio_cogeo_ray.functions.hashing import hash_columns

    def _rows(t: pa.Table) -> pa.Table:
        r = minhash_band_rows(
            t, id_col, text_col, num_perm, bands, scheme=scheme
        )
        sh = (hash_columns(r, ["band", "band_hash"]) % np.uint64(n_shards)).astype(
            np.int64
        )
        return r.append_column("shard", pa.array(sh, pa.int64()))

    return ds.map_batches(_rows, batch_format="pyarrow")


def build_band_index(
    ds,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    n_shards: int = 64,
    scheme: str = "oph",
) -> str:
    """Materialize a PERSISTED MinHash band index under
    ``index_dir/bands/shard=<k>/`` — the standing near-dup registry a
    continuous crawl ingests against (the build_text_index layout
    doctrine: hash-sharded parquet, atomic rename, manifest carrying
    the signature params so every future delta bands IDENTICALLY).
    Rows are (id, band, band_hash) — 24 B/band-row, text never
    persisted. A rebuild wipes appended generations: the index is
    whole again from this corpus alone."""
    import json
    import os
    import shutil

    os.makedirs(index_dir, exist_ok=True)
    tmp = os.path.join(index_dir, ".bands.tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    _band_rows_sharded(
        ds, id_col, text_col, num_perm, bands, scheme, n_shards
    ).write_parquet(tmp, partition_cols=["shard"])
    os.makedirs(tmp, exist_ok=True)  # empty corpus writes nothing
    for root in _band_roots(index_dir):
        shutil.rmtree(root, ignore_errors=True)
    os.replace(tmp, os.path.join(index_dir, "bands"))
    man = {
        "id_col": id_col,
        "num_perm": num_perm,
        "bands": bands,
        "n_shards": n_shards,
        "scheme": scheme,
        "generations": [],
    }
    mtmp = os.path.join(index_dir, BAND_INDEX_MANIFEST + ".tmp")
    with open(mtmp, "w") as f:
        json.dump(man, f)
    os.replace(mtmp, os.path.join(index_dir, BAND_INDEX_MANIFEST))
    return index_dir


def neardup_ingest(
    ds_new,
    index_dir: str,
    fingerprint: str,
    text_col: str = "text",
    append: bool = True,
):
    """Incremental near-dup check of a crawl DELTA against the
    persisted band index: returns (new_id, dup_of, n_band_hits) — one
    row per delta doc sharing ≥ 1 LSH bucket with an indexed doc
    (dup_of = the smallest matching indexed id). With ``append=True``
    the UNMATCHED delta docs' band rows land as a sibling generation
    ``bands.gen-<fingerprint>/`` (idempotent per fingerprint; prior
    rows are never rewritten), so successive crawl increments dedup
    against everything before them.

    Scale contract (delta ≪ index, the incremental_dedup doctrine):
    the delta's band rows are bounded (bands × delta docs) and
    materialize once; its distinct bucket keys broadcast via
    ``ray.put``; the INDEX side is read shard-PRUNED (only shards the
    delta probes, across all generations — I/O-level pruning) and
    streams through ONE stateless membership filter with ZERO
    shuffle — only colliding index rows (≈ true near-dups) enter the
    one bucketed join. New doc ids must be disjoint from indexed ids
    (append_text_index contract)."""
    import json
    import os
    import shutil

    import ray as _ray

    import ray.data as rd

    from rio_cogeo_ray.stages.agg import partial_group_agg
    from rio_cogeo_ray.stages.join import bucketed_hash_join

    with open(os.path.join(index_dir, BAND_INDEX_MANIFEST)) as f:
        man = json.load(f)
    id_col = man["id_col"]
    n_shards = int(man["n_shards"])

    new_rows = _band_rows_sharded(
        ds_new, id_col, text_col, int(man["num_perm"]), int(man["bands"]),
        man["scheme"], n_shards,
    ).materialize()

    # delta probe keys + probed shards (bounded by bands × delta docs)
    blocks = [
        b
        for b in _ray.get(new_rows.to_arrow_refs())
        if b.num_rows
    ]
    empty = pa.table(
        {
            "new_id": pa.array([], pa.int64()),
            "dup_of": pa.array([], pa.int64()),
            "n_band_hits": pa.array([], pa.int64()),
        }
    )
    if not blocks:
        return rd.from_arrow(empty)
    delta = pa.concat_tables(blocks, promote_options="default").combine_chunks()
    keys = np.unique(
        _band_key(
            delta["band"].to_numpy(zero_copy_only=False),
            delta["band_hash"].to_numpy(zero_copy_only=False),
        )
    )
    probed = np.unique(
        delta["shard"].to_numpy(zero_copy_only=False)
    )
    keys_ref = _ray.put(keys)

    files = _band_shard_files(index_dir, probed, exclude_gen=fingerprint)
    matches = None
    if files:
        old = rd.read_parquet(files, columns=[id_col, "band", "band_hash"])

        def _collide(t: pa.Table) -> pa.Table:
            ks = _ray.get(keys_ref)
            bk = _band_key(
                t["band"].combine_chunks().to_numpy(zero_copy_only=False),
                t["band_hash"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            pos = np.searchsorted(ks, bk)
            pos[pos >= len(ks)] = len(ks) - 1
            hit = ks[pos] == bk
            return t.filter(pa.array(hit)).rename_columns(
                ["old_id", "band", "band_hash"]
            )

        survivors = old.map_batches(_collide, batch_format="pyarrow")
        new_side = new_rows.map_batches(
            lambda t: pa.table(
                {
                    "new_id": t[id_col].combine_chunks().cast(pa.int64()),
                    "band": t["band"].combine_chunks(),
                    "band_hash": t["band_hash"].combine_chunks(),
                }
            ),
            batch_format="pyarrow",
        )
        paired = bucketed_hash_join(
            new_side, survivors, on=["band", "band_hash"]
        )
        matches = partial_group_agg(
            paired,
            keys=["new_id"],
            min_cols=["old_id"],
            count_as="n_band_hits",
        ).map_batches(
            lambda t: pa.table(
                {
                    "new_id": t["new_id"].combine_chunks().cast(pa.int64()),
                    "dup_of": t["min_old_id"].combine_chunks().cast(pa.int64()),
                    "n_band_hits": t["n_band_hits"].combine_chunks().cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ).materialize()

    if append:
        gen_root = os.path.join(index_dir, f"bands.gen-{fingerprint}")
        if not os.path.isdir(gen_root):
            if matches is not None and matches.count():
                mt = pa.concat_tables(
                    _ray.get(matches.to_arrow_refs()), promote_options="default"
                )
                matched_ids = np.sort(
                    mt["new_id"].combine_chunks().to_numpy(zero_copy_only=False)
                )
                ids_ref = _ray.put(matched_ids)

                def _unmatched(t: pa.Table) -> pa.Table:
                    mi = _ray.get(ids_ref)
                    ids = (
                        t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
                    )
                    pos = np.searchsorted(mi, ids)
                    pos[pos >= len(mi)] = len(mi) - 1
                    return t.filter(pa.array(mi[pos] != ids))

                to_append = new_rows.map_batches(
                    _unmatched, batch_format="pyarrow"
                )
            else:
                to_append = new_rows
            tmp = os.path.join(index_dir, f".gen-{fingerprint}.tmp")
            shutil.rmtree(tmp, ignore_errors=True)
            to_append.write_parquet(tmp, partition_cols=["shard"])
            os.makedirs(tmp, exist_ok=True)
            os.replace(tmp, gen_root)
            man.setdefault("generations", []).append(fingerprint)
            mtmp = os.path.join(index_dir, BAND_INDEX_MANIFEST + ".tmp")
            with open(mtmp, "w") as f:
                json.dump(man, f)
            os.replace(mtmp, os.path.join(index_dir, BAND_INDEX_MANIFEST))

    # a 0-row materialized Dataset loses its schema in Ray — return the
    # TYPED empty on every no-match path, not just the no-files one
    if matches is None or matches.count() == 0:
        return rd.from_arrow(empty)
    return matches
