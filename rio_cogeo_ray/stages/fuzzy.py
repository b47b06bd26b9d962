"""Edit-distance-1 fuzzy key self-join — exact deletion-neighborhood
blocking (the FastSS / SymSpell family, public algorithm), distributed.

The string-similarity companion to the token-set joins in
stages/simjoin.py (Jaccard) and stages/dedup.py (MinHash): finds all
unordered pairs of DISTINCT key strings within Levenshtein distance 1 —
the "host typo / near-identical label" merge primitive.

Blocking is EXACT for k = 1: for a string ``s``, let ``D(s)`` be ``s``
itself plus every single-character deletion of ``s``. Then
``ed(a, b) <= 1  ⟺  D(a) ∩ D(b) ≠ ∅`` (substitution: both delete the
mismatch position; insertion/deletion: the shorter string IS a member
of the longer one's deletion set). Sharing a variant only bounds
``ed <= 2``, so a cheap exact verify pass removes the false candidates;
there are NO false negatives, which is what makes the DuckDB
``levenshtein() = 1`` mirror hash-exact.

Verify uses the prefix/suffix criterion (no DP): with ``p = lcp(a,b)``,
``s = lcs(a,b)`` and ``|len(a) - len(b)| <= 1``,
``ed(a, b) <= 1 ⟺ p + s >= max(len) - 1`` — both sides vectorize as
one argmin over padded codepoint matrices per candidate bucket.

Reference analog: rio_cogeo has no string ops; this generalizes the
north-rule's dedup mandate to typo-distance keys (C4/CC host
canonicalization, text.py:canonicalize_urls, leaves exactly these
near-identical labels behind).

Scale contract: keys are distinct-collapsed FIRST (one exchange, the
url_dedup doctrine), so every later stage is vocabulary-bounded, not
corpus-bounded. Variant rows = Σ(len+1) over distinct keys. A variant
shared by r keys yields r·(r-1)/2 candidates — degenerate vocabularies
(thousands of length-1 keys all sharing the empty deletion) raise
loudly via ``max_run`` instead of going quadratic, the simjoin guard
doctrine.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from rio_cogeo_ray.functions.hashing import hash_columns

_PAIR_SCHEMA = {
    "a": pa.string(),
    "b": pa.string(),
    "n_a": pa.int64(),
    "n_b": pa.int64(),
}


def _empty_pairs() -> pa.Table:
    return pa.table({k: pa.array([], t) for k, t in _PAIR_SCHEMA.items()})


def _variant_rows(t: pa.Table, key_col: str, count_col: str) -> pa.Table:
    """(vh, key, n) rows: one per deletion variant (plus the identity)
    of each DISTINCT key. Vectorized per deletion INDEX: round d slices
    every key longer than d once (utf8 codepoint semantics, matching
    SQL levenshtein's per-character model). Null keys carry no variants
    (SQL: NULL never joins)."""
    keys = t[key_col].combine_chunks()
    valid = pc.is_valid(keys)
    if not pc.any(valid).as_py():
        return pa.table(
            {
                "vh": pa.array([], pa.int64()),
                key_col: pa.array([], pa.string()),
                count_col: pa.array([], pa.int64()),
            }
        )
    keys = keys.filter(valid)
    cnt = t[count_col].combine_chunks().filter(valid)
    lens = pc.utf8_length(keys).to_numpy(zero_copy_only=False).astype(np.int64)
    max_len = int(lens.max()) if len(lens) else 0

    hs: List[np.ndarray] = []
    ks: List[pa.Array] = []
    ns: List[pa.Array] = []
    # identity variant
    hs.append(hash_columns(pa.table({"v": keys}), ["v"]).astype(np.int64))
    ks.append(keys)
    ns.append(cnt)
    big = np.int64(1) << np.int64(30)
    for d in range(max_len):
        mask = pa.array(lens > d)
        sub = keys.filter(mask)
        var = pc.binary_join_element_wise(
            pc.utf8_slice_codeunits(sub, 0, d),
            pc.utf8_slice_codeunits(sub, d + 1, int(big)),
            "",
        )
        hs.append(hash_columns(pa.table({"v": var}), ["v"]).astype(np.int64))
        ks.append(sub)
        ns.append(cnt.filter(mask))
    return pa.table(
        {
            "vh": pa.array(np.concatenate(hs), pa.int64()),
            key_col: pa.concat_arrays([a.cast(pa.string()) for a in ks]),
            count_col: pa.concat_arrays([a.cast(pa.int64()) for a in ns]),
        }
    )


def _lcp_lcs(a_strs: np.ndarray, b_strs: np.ndarray) -> Tuple[np.ndarray, ...]:
    """Vectorized longest-common-prefix/-suffix lengths (codepoints) for
    candidate pairs: two argmins over padded uint32 codepoint matrices.
    Distinct pad sentinels per side guarantee a mismatch column exists
    for every non-identical pair."""
    m = len(a_strs)
    la = np.array([len(s) for s in a_strs], dtype=np.int64)
    lb = np.array([len(s) for s in b_strs], dtype=np.int64)
    w = int(max(la.max(), lb.max())) + 1 if m else 1
    A = np.full((m, w), 0xFFFFFFF1, dtype=np.uint32)
    B = np.full((m, w), 0xFFFFFFF2, dtype=np.uint32)
    Ar = np.full((m, w), 0xFFFFFFF1, dtype=np.uint32)
    Br = np.full((m, w), 0xFFFFFFF2, dtype=np.uint32)
    for i in range(m):  # bounded: candidate pairs, not corpus rows
        ca = np.frombuffer(a_strs[i].encode("utf-32-le"), dtype=np.uint32)
        cb = np.frombuffer(b_strs[i].encode("utf-32-le"), dtype=np.uint32)
        A[i, : len(ca)] = ca
        B[i, : len(cb)] = cb
        Ar[i, : len(ca)] = ca[::-1]
        Br[i, : len(cb)] = cb[::-1]
    lcp = np.argmin(A == B, axis=1)
    lcs = np.argmin(Ar == Br, axis=1)
    return lcp.astype(np.int64), lcs.astype(np.int64), la, lb


def ed1_mask(a_strs: np.ndarray, b_strs: np.ndarray) -> np.ndarray:
    """True where ed(a, b) <= 1, for pairs of NON-IDENTICAL strings with
    any lengths (pairs differing by 2+ in length are auto-false)."""
    if len(a_strs) == 0:
        return np.zeros(0, dtype=bool)
    lcp, lcs, la, lb = _lcp_lcs(a_strs, b_strs)
    return (np.abs(la - lb) <= 1) & (lcp + lcs >= np.maximum(la, lb) - 1)


def editdist1_self_join(
    ds,
    key_col: str,
    n_buckets: int = 64,
    max_run: int = 4096,
):
    """All unordered pairs of distinct values of ``key_col`` with
    Levenshtein distance exactly 1, plus each side's row count:
    ``(a, b, n_a, n_b)`` with ``a < b`` (string order).

    Stages: (1) distinct-collapse keys with counts (ONE corpus
    exchange; everything after is vocabulary-bounded); (2) map-side
    deletion-variant explode; (3) hash(variant) exchange → per-run
    triangular candidate pairs (runs over ``max_run`` raise — a
    degenerate vocabulary means this operator is the wrong tool);
    (4) hash(pair) exchange dedups candidates (a pair may share several
    variants) and the exact prefix+suffix verify keeps ed == 1 only."""
    from rio_cogeo_ray.stages.agg import partial_group_agg

    distinct = partial_group_agg(ds, keys=[key_col], count_as="__n")

    variants = distinct.map_batches(
        lambda t: _variant_rows(t, key_col, "__n"), batch_format="pyarrow"
    )

    def _route_vh(t: pa.Table) -> pa.Table:
        b = (
            t["vh"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.uint64)
            % np.uint64(n_buckets)
        ).astype(np.int64)
        return t.append_column("__b", pa.array(b, pa.int64()))

    def _pairs_bucket(g: pa.Table) -> pa.Table:
        empty = _empty_pairs()
        if len(g) < 2:
            return empty
        vh = g["vh"].combine_chunks().to_numpy(zero_copy_only=False)
        key = g[key_col].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["__n"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(vh, kind="stable")
        vhs, keys_s, ns = vh[order], key[order], n[order]
        new = np.ones(len(vhs), dtype=bool)
        new[1:] = vhs[1:] != vhs[:-1]
        starts = np.flatnonzero(new)
        cnt = np.diff(np.append(starts, len(vhs)))
        if int(cnt.max()) > max_run:
            raise ValueError(
                f"deletion-variant run of {int(cnt.max())} keys exceeds "
                f"max_run={max_run}: the key vocabulary is degenerate for "
                "ed-1 blocking (e.g. thousands of length-1 keys); use the "
                "LSH near-dup path (stages/dedup.py) instead"
            )
        # triangular pairs per run, all runs at once: each element pairs
        # with every LATER element of its run (the repeat/offset device
        # of dedup._bucket_item_pair_counts)
        idx = np.arange(len(vhs), dtype=np.int64)
        run = np.cumsum(new) - 1
        run_start = starts[run]
        q = idx - run_start
        a_rep = cnt[run] - 1 - q
        total = int(a_rep.sum())
        if total == 0:
            return empty
        excl = np.concatenate(([0], np.cumsum(a_rep)[:-1]))
        offs = np.arange(total, dtype=np.int64) - np.repeat(excl, a_rep)
        gi = np.repeat(idx, a_rep)
        gj = gi + offs + 1
        a_k, b_k = keys_s[gi], keys_s[gj]
        a_n, b_n = ns[gi], ns[gj]
        swap = a_k > b_k
        a_k2 = np.where(swap, b_k, a_k)
        b_k2 = np.where(swap, a_k, b_k)
        a_n2 = np.where(swap, b_n, a_n)
        b_n2 = np.where(swap, a_n, b_n)
        same = a_k2 == b_k2  # identical key via two variant routes
        keep = ~same
        return pa.table(
            {
                "a": pa.array(a_k2[keep], pa.string()),
                "b": pa.array(b_k2[keep], pa.string()),
                "n_a": pa.array(a_n2[keep].astype(np.int64), pa.int64()),
                "n_b": pa.array(b_n2[keep].astype(np.int64), pa.int64()),
            }
        )

    cand = (
        variants.map_batches(_route_vh, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(
            lambda g: _pairs_bucket(g.drop_columns(["__b"])), batch_format="pyarrow"
        )
    )

    def _route_pair(t: pa.Table) -> pa.Table:
        b = (hash_columns(t, ["a", "b"]) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("__b", pa.array(b, pa.int64()))

    def _verify_bucket(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return _empty_pairs()
        a = g["a"].combine_chunks().to_numpy(zero_copy_only=False)
        b = g["b"].combine_chunks().to_numpy(zero_copy_only=False)
        na = g["n_a"].combine_chunks().to_numpy(zero_copy_only=False)
        nb = g["n_b"].combine_chunks().to_numpy(zero_copy_only=False)
        # dedup pairs that arrived via several shared variants
        joined = np.char.add(np.char.add(a.astype(str), "\x00"), b.astype(str))
        _, first = np.unique(joined, return_index=True)
        a, b, na, nb = a[first], b[first], na[first], nb[first]
        keep = ed1_mask(a, b)
        return pa.table(
            {
                "a": pa.array(a[keep], pa.string()),
                "b": pa.array(b[keep], pa.string()),
                "n_a": pa.array(na[keep].astype(np.int64), pa.int64()),
                "n_b": pa.array(nb[keep].astype(np.int64), pa.int64()),
            }
        )

    return (
        cand.map_batches(_route_pair, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(
            lambda g: _verify_bucket(g.drop_columns(["__b"])), batch_format="pyarrow"
        )
    )
