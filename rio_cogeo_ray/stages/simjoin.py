"""Exact set-similarity self-join via prefix filtering (AllPairs /
PPJoin family, Bayardo et al. WWW'07; Xiao et al. WWW'08 Lemma 1).

Unlike the LSH-banded near-dup joins in stages/dedup.py (probabilistic
recall, tuned by band count), this operator is EXACT: it returns every
document pair whose whitespace-token-set Jaccard similarity is >= a
threshold, with zero false negatives — which also makes it
SQL-mirrorable (DuckDB computes the same pairs by brute-force token
self-join at test scale).

Scale story (the 100 TB question):

- Token rows ship as (doc_id, token, set_size) — one row per DISTINCT
  token per doc, the same volume as the inverted-index build
  (stages/search.py); the text itself never shuffles.
- The global token order is document-frequency ascending (rare tokens
  first, ties on the token string). Prefix tokens are therefore the
  RAREST tokens of each doc, so the candidate-generation groupby's
  buckets are small by construction — the stopword hot keys that would
  melt a naive token self-join never appear in any prefix.
- A doc of n distinct tokens contributes a prefix of only
  n - ceil(tau*n) + 1 rows to the candidate exchange (~(1-tau)*n).
- Candidate pairs are verified by exact intersection counting through
  two bucketed hash joins keyed on (doc_id) then (doc_id, token) —
  standard partitioned exchanges, no all-pairs stage anywhere.

Everything is integer-exact: the threshold is a ppm (parts-per-million)
integer and the emitted similarity is (1e6 * |A∩B|) // |A∪B|, so the
DuckDB oracle matches hash-exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from rio_cogeo_ray.functions.hashing import hash_columns


def _doc_token_sets(
    batch: pa.Table, id_col: str, text_col: str, hash_tokens: bool = False
) -> pa.Table:
    """(id, token, size) rows — the DISTINCT whitespace tokens of each
    doc with the doc's distinct-token count attached to every row.
    Tokens are the RE2 ``\\S+`` matches (same mirror as
    stages/text.py:token_value_counts). A doc lives entirely in one
    row, so both the de-dup and the size are exact map-side — no
    shuffle.

    ``hash_tokens``: emit the 64-bit token hash instead of the string
    (the engine's 2×64-bit token-identity doctrine): every downstream
    exchange (df groupby, attach join, prefix order, candidate
    buckets, verify semi join) then moves fixed-width int64 keys
    instead of strings. Set intersections/sizes are unchanged modulo
    the standard astronomically-unlikely hash-collision contract."""
    ids = batch[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    t = batch[text_col]
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    lists = pc.ascii_split_whitespace(t.cast(pa.string()))
    lens = (
        pc.fill_null(pc.list_value_length(lists), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    flat = pc.list_flatten(lists)
    rep = np.repeat(np.arange(len(batch), dtype=np.int64), lens)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    pairs = pa.table(
        {
            id_col: ids.take(pa.array(rep[keep], pa.int64())),
            "token": flat.filter(pa.array(keep)),
        }
    )
    d = pairs.group_by([id_col, "token"]).aggregate([]).combine_chunks()
    tok_type = pa.int64() if hash_tokens else pa.string()
    if len(d) == 0:
        return pa.table(
            {
                id_col: pa.array([], ids.type),
                "token": pa.array([], tok_type),
                "size": pa.array([], pa.int64()),
            }
        )
    idv = d[id_col].combine_chunks().to_numpy(zero_copy_only=False)
    _, inv, counts = np.unique(idv, return_inverse=True, return_counts=True)
    tok_col = d["token"].combine_chunks().cast(pa.string())
    if hash_tokens:
        import polars as pl

        tok_col = pa.array(
            pl.from_arrow(tok_col.cast(pa.large_string()))
            .hash(seed=17)
            .to_numpy()
            .astype(np.uint64)
            .view(np.int64),
            pa.int64(),
        )
    return pa.table(
        {
            id_col: d[id_col].combine_chunks(),
            "token": tok_col,
            "size": pa.array(counts[inv].astype(np.int64), pa.int64()),
        }
    )


def _prefix_len(sizes: np.ndarray, tau_ppm: int) -> np.ndarray:
    """Prefix length n - ceil(tau*n) + 1 per doc, integer-exact."""
    ceil_tau_n = (sizes * tau_ppm + 999_999) // 1_000_000
    return sizes - ceil_tau_n + 1


def _pairs_within_segments(seg_counts: np.ndarray):
    """All (i, j) index pairs with i < j inside each contiguous segment
    of the given lengths — fully vectorized (no Python loop over
    segments). Returns (L, R) global row indices."""
    starts = np.concatenate(([0], np.cumsum(seg_counts)))[:-1]
    n = int(seg_counts.sum())
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    seg_of = np.repeat(np.arange(len(seg_counts), dtype=np.int64), seg_counts)
    pos = np.arange(n, dtype=np.int64) - starts[seg_of]
    # row at (seg, pos k) pairs with the c-k-1 rows after it
    left_rep = seg_counts[seg_of] - pos - 1
    L = np.repeat(np.arange(n, dtype=np.int64), left_rep)
    run_start = np.concatenate(([0], np.cumsum(left_rep)))[:-1]
    R = L + 1 + (np.arange(len(L), dtype=np.int64) - np.repeat(run_start, left_rep))
    return L, R


def jaccard_self_join(
    ds,
    tau_ppm: int = 500_000,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    max_pairs_per_bucket: "int | None" = 50_000_000,
):
    """Every pair (id_a < id_b) whose distinct-whitespace-token sets
    have Jaccard >= tau_ppm/1e6, with exact integer similarity:

        (id_a, id_b, inter, uni, jac_ppm = (1e6*inter)//uni)

    Docs with zero tokens never pair (their token sets are empty; the
    SQL mirror's token CTE drops them identically).

    Stages: tokenize map-side → df groupby → df attach (bucketed join
    on token) → per-doc prefix (bucketed by id) → candidate pairs
    (bucketed by prefix token) → pair distinct → exact intersection
    count (two bucketed joins) → threshold filter.

    DATA ASSUMPTION (the prefix-filter contract): the corpus has a
    heavy-tailed (Zipfian) vocabulary, so each doc's prefix holds
    genuinely rare tokens and candidate groups stay small. On a corpus
    whose distinct-token count is tiny relative to its doc count (e.g.
    tiny-vocab synthetic text), EVERY token is frequent and candidate
    generation degrades toward all-pairs — exact set-similarity join
    is then inherently quadratic and the LSH path
    (dedup.text_similarity_join) is the right tool.
    ``max_pairs_per_bucket`` turns that degradation into a loud
    ValueError instead of a silent near-hang.
    """
    from rio_cogeo_ray.stages.agg import partial_group_agg
    from rio_cogeo_ray.stages.join import bucketed_hash_join

    # MATERIALIZED: tok feeds THREE consumers (df count, the df attach
    # join, and both verify sides) and every bucketed join additionally
    # resolves schemas, which executes a lazy upstream chain — without
    # this boundary the tokenize pass re-runs 4+ times and the whole
    # pipeline goes super-linear (measured: 960k docs 124 s → 51.5 s
    # with all four boundaries in place).
    # Size is corpus×distinct-tokens — the object store spills it like
    # any shuffle input at 100 TB scale.
    tok = ds.map_batches(
        lambda t: _doc_token_sets(t, id_col, text_col, hash_tokens=True),
        batch_format="pyarrow",
    ).materialize()

    # global document frequency per token (rare-first order). One row
    # per distinct token per batch leaves the combiner.
    def _df_partial(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t["token"].combine_chunks())
        return pa.table(
            {
                "token": vc.field("values").cast(pa.int64()),
                "dfp": vc.field("counts").cast(pa.int64()),
            }
        )

    # MATERIALIZED: the attach join's schema fetch would otherwise run
    # this all-to-all aggregate once for the fetch and once for the
    # join (the join.py schema-resolution doctrine)
    df = partial_group_agg(
        tok.map_batches(_df_partial, batch_format="pyarrow"),
        keys=["token"],
        sum_cols=["dfp"],
        count_as=None,
        n_buckets=n_buckets,
    ).map_batches(
        lambda t: t.rename_columns(["token", "df"]), batch_format="pyarrow"
    ).materialize()

    with_df = bucketed_hash_join(tok, df, on="token", n_buckets=n_buckets)

    # per-doc prefix under the global (df, token) order
    def _route_id(t: pa.Table) -> pa.Table:
        b = (hash_columns(t, [id_col]) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("__b", pa.array(b, pa.int64()))

    def _prefix_bucket(g: pa.Table) -> pa.Table:
        g = g.sort_by(
            [(id_col, "ascending"), ("df", "ascending"), ("token", "ascending")]
        )
        idv = g[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        sizes = g["size"].combine_chunks().to_numpy(zero_copy_only=False)
        n = len(g)
        new = np.ones(n, dtype=bool)
        if n > 1:
            new[1:] = idv[1:] != idv[:-1]
        starts = np.flatnonzero(new)
        seg_start = np.repeat(starts, np.diff(np.append(starts, n)))
        rank = np.arange(n, dtype=np.int64) - seg_start
        keep = rank < _prefix_len(sizes, tau_ppm)
        kept = g.filter(pa.array(keep)).select([id_col, "token", "size"])
        return kept

    prefix = (
        with_df.map_batches(_route_id, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(_prefix_bucket, batch_format="pyarrow")
    )

    # candidate pairs: docs sharing a prefix token, length-compatible
    def _route_token(t: pa.Table) -> pa.Table:
        b = (hash_columns(t, ["token"]) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("__b", pa.array(b, pa.int64()))

    def _cand_bucket(g: pa.Table) -> pa.Table:
        g = g.sort_by(
            [("token", "ascending"), ("size", "ascending"), (id_col, "ascending")]
        )
        tokv = g["token"].combine_chunks()
        n = len(g)
        new = np.ones(n, dtype=bool)
        if n > 1:
            new[1:] = pc.not_equal(tokv.slice(1), tokv.slice(0, n - 1)).to_numpy(
                zero_copy_only=False
            )
        seg_counts = np.diff(np.append(np.flatnonzero(new), n))
        est = int((seg_counts * (seg_counts - 1) // 2).sum())
        if max_pairs_per_bucket is not None and est > max_pairs_per_bucket:
            raise ValueError(
                f"jaccard_self_join: candidate generation would emit {est} "
                f"pairs in one token bucket (> max_pairs_per_bucket="
                f"{max_pairs_per_bucket}). The corpus vocabulary is too "
                "small for prefix filtering to prune (see the DATA "
                "ASSUMPTION note) — use the LSH near-dup path "
                "(dedup.text_similarity_join) or raise the cap explicitly."
            )
        L, R = _pairs_within_segments(seg_counts)
        idv = g[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        sz = g["size"].combine_chunks().to_numpy(zero_copy_only=False)
        # J >= tau needs tau * |larger| <= |smaller|; rows sorted size
        # ascending within each token so sz[L] <= sz[R]
        ok = 1_000_000 * sz[L] >= tau_ppm * sz[R]
        L, R = L[ok], R[ok]
        a, b = idv[L], idv[R]
        sa, sb = sz[L], sz[R]
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        sa2 = np.where(swap, sb, sa)
        sb2 = np.where(swap, sa, sb)
        return pa.table(
            {
                "id_a": pa.array(a2, pa.int64()),
                "id_b": pa.array(b2, pa.int64()),
                "size_a": pa.array(sa2, pa.int64()),
                "size_b": pa.array(sb2, pa.int64()),
            }
        )

    cand = (
        prefix.map_batches(_route_token, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(_cand_bucket, batch_format="pyarrow")
    )

    # global pair-distinct (a pair may share several prefix tokens).
    # MATERIALIZED: bounded by the candidate-pair count (linear under
    # the Zipf DATA ASSUMPTION); the verify join would otherwise
    # re-execute the whole prefix→candidate chain for its schema pass.
    pairs = partial_group_agg(
        cand,
        keys=["id_a", "id_b"],
        min_cols=["size_a", "size_b"],
        count_as=None,
        n_buckets=n_buckets,
    ).map_batches(
        lambda t: t.rename_columns(["id_a", "id_b", "size_a", "size_b"]),
        batch_format="pyarrow",
    ).materialize()

    # exact verify: |A∩B| by re-joining the token sets. The candidate
    # pair set is SMALL (bounded by the prefix filter), so its distinct
    # doc ids broadcast via ray.put and prefilter tok MAP-SIDE — the
    # two verify joins then exchange only candidate docs' tokens
    # instead of the whole corpus token table (two full-table shuffles
    # saved; the engine's broadcast-small-side doctrine).
    import ray as _ray

    _pt = pa.concat_tables(
        [b for b in _ray.get(pairs.to_arrow_refs()) if b.num_rows]
        or [pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())})],
        promote_options="default",
    )
    cand_ids = np.unique(
        np.concatenate(
            [
                _pt["id_a"].combine_chunks().to_numpy(zero_copy_only=False)
                if _pt.num_rows
                else np.empty(0, np.int64),
                _pt["id_b"].combine_chunks().to_numpy(zero_copy_only=False)
                if _pt.num_rows
                else np.empty(0, np.int64),
            ]
        )
    )
    ids_ref = _ray.put(cand_ids)

    def _only_cands(t: pa.Table) -> pa.Table:
        ids = _ray.get(ids_ref)
        v = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return t.slice(0, 0)
        pos_c = np.clip(np.searchsorted(ids, v), 0, len(ids) - 1)
        return t.filter(pa.array(ids[pos_c] == v))

    tok_c = tok.map_batches(_only_cands, batch_format="pyarrow")
    tok_a = tok_c.map_batches(
        lambda t: t.select([id_col, "token"]).rename_columns(["id_a", "token"]),
        batch_format="pyarrow",
    )
    tok_b = tok_c.map_batches(
        lambda t: t.select([id_col, "token"]).rename_columns(["id_b", "token"]),
        batch_format="pyarrow",
    )
    # MATERIALIZED: rows = pairs × tokens (the verify workload itself);
    # the semi join's schema pass would otherwise run the expl join twice
    expl = bucketed_hash_join(
        pairs, tok_a, on="id_a", n_buckets=n_buckets
    ).materialize()
    shared = bucketed_hash_join(
        expl, tok_b, on=["id_b", "token"], how="semi", n_buckets=n_buckets
    )
    inter = partial_group_agg(
        shared,
        keys=["id_a", "id_b"],
        min_cols=["size_a", "size_b"],
        count_as="inter",
        n_buckets=n_buckets,
    ).map_batches(
        lambda t: t.rename_columns(["id_a", "id_b", "size_a", "size_b", "inter"]),
        batch_format="pyarrow",
    )

    def _finalize(t: pa.Table) -> pa.Table:
        ia = t["inter"].combine_chunks().to_numpy(zero_copy_only=False)
        uni = (
            t["size_a"].combine_chunks().to_numpy(zero_copy_only=False)
            + t["size_b"].combine_chunks().to_numpy(zero_copy_only=False)
            - ia
        )
        keep = 1_000_000 * ia >= tau_ppm * uni
        out = pa.table(
            {
                "id_a": t["id_a"].combine_chunks(),
                "id_b": t["id_b"].combine_chunks(),
                "inter": pa.array(ia, pa.int64()),
                "uni": pa.array(uni, pa.int64()),
                "jac_ppm": pa.array(
                    np.where(uni > 0, (1_000_000 * ia) // np.maximum(uni, 1), 0),
                    pa.int64(),
                ),
            }
        )
        return out.filter(pa.array(keep))

    return inter.map_batches(_finalize, batch_format="pyarrow")


def bitext_candidates(
    ds,
    id_col: str = "doc_id",
    lang_col: str = "lang",
    text_col: str = "text",
    max_df: int = 4,
    min_shared: int = 2,
    n_buckets: int = 64,
):
    """Comparable-corpus / bitext candidate mining (the first stage of
    parallel-text harvesting, Resnik & Smith 2003 "The Web as a
    Parallel Corpus"): CROSS-LANGUAGE doc pairs sharing at least
    ``min_shared`` RARE tokens — names, numbers and cognates that
    survive translation make rare-token co-occurrence a cheap
    translation-pair signal.

    Scale shape: one map pass emits distinct (id, lang, token) rows;
    routing by hash(token) co-locates every posting of a token, so the
    bucket-local run length IS the global document frequency — only
    runs with ``2 ≤ df ≤ max_df`` explode into triangular pairs
    (quadratic bounded by max_df², the radius_pairs doctrine), oriented
    lang_a < lang_b (same-language pairs drop); ONE pair-keyed count
    exchange then filters to ``shared ≥ min_shared``. Stopwords never
    pair (their df exceeds max_df by definition) — the rare-token gate
    IS the hot-key guard.

    Returns (doc_a, doc_b, lang_a, lang_b, shared).
    """
    from rio_cogeo_ray.functions.hashing import splitmix64
    from rio_cogeo_ray.stages.agg import partial_group_agg

    def _postings(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().cast(pa.int64())
        lang = t[lang_col].combine_chunks().cast(pa.string())
        lists = pc.ascii_split_whitespace(
            t[text_col].combine_chunks().cast(pa.string())
        )
        lens = (
            pc.fill_null(pc.list_value_length(lists), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        flat = pc.list_flatten(lists)
        rep = np.repeat(np.arange(len(t), dtype=np.int64), lens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        take = pa.array(rep[keep], pa.int64())
        rows = pa.table(
            {
                "doc": ids.take(take),
                "lang": lang.take(take),
                "token": flat.filter(pa.array(keep)),
            }
        )
        # NULL-lang docs can never satisfy the SQL mirror's lang
        # comparisons (NULL <> x is NULL) - drop their postings here
        rows = rows.filter(pc.is_valid(rows["lang"]))
        return rows.group_by(["doc", "lang", "token"]).aggregate([])

    empty_pairs = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "lang_a": pa.array([], pa.string()),
            "lang_b": pa.array([], pa.string()),
        }
    )

    def _route(t: pa.Table) -> pa.Table:
        h = hash_columns(t, ["token"])
        b = (h % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("__bucket", pa.array(b, pa.int64()))

    def _pairs(g: pa.Table) -> pa.Table:
        if not g.num_rows or "token" not in g.column_names:
            return empty_pairs
        g = g.sort_by(
            [("token", "ascending"), ("lang", "ascending"), ("doc", "ascending")]
        )
        tok = g["token"].combine_chunks().to_numpy(zero_copy_only=False)
        doc = g["doc"].combine_chunks().to_numpy(zero_copy_only=False)
        lang = g["lang"].combine_chunks().to_numpy(zero_copy_only=False)
        start = np.r_[True, tok[1:] != tok[:-1]]
        run = np.cumsum(start) - 1
        df = np.bincount(run)
        ok = (df[run] >= 2) & (df[run] <= max_df)
        if not ok.any():
            return empty_pairs
        doc, lang, run = doc[ok], lang[ok], run[ok]
        seg_counts = np.bincount(np.unique(run, return_inverse=True)[1])
        L, R = _pairs_within_segments(seg_counts)
        if not len(L):
            return empty_pairs
        la, lb = lang[L], lang[R]
        cross = la != lb
        L, R, la, lb = L[cross], R[cross], la[cross], lb[cross]
        swap = la > lb
        doc_a = np.where(swap, doc[R], doc[L])
        doc_b = np.where(swap, doc[L], doc[R])
        lang_a = np.where(swap, lb, la)
        lang_b = np.where(swap, la, lb)
        return pa.table(
            {
                "doc_a": pa.array(doc_a, pa.int64()),
                "doc_b": pa.array(doc_b, pa.int64()),
                "lang_a": pa.array(lang_a.astype(object), pa.string()),
                "lang_b": pa.array(lang_b.astype(object), pa.string()),
            }
        )

    pairs = (
        ds.map_batches(_postings, batch_format="pyarrow")
        .map_batches(_route, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda g: _pairs(g.drop_columns(["__bucket"])), batch_format="pyarrow")
    )
    counted = partial_group_agg(
        pairs,
        keys=["doc_a", "doc_b", "lang_a", "lang_b"],
        count_as="shared",
        n_buckets=n_buckets,
    )
    return counted.map_batches(
        lambda t: t.filter(
            pc.greater_equal(
                t["shared"].combine_chunks(), pa.scalar(min_shared, pa.int64())
            )
        ),
        batch_format="pyarrow",
    )


def _align_pair(sents_a, sents_b):
    """Monotone sentence alignment of ONE candidate doc pair — a
    Needleman-Wunsch DP over sentence LENGTH vectors with 1-1 match
    and 1-0 / 0-1 skip moves (Gale & Church 1993 reduced to its
    length-ratio core; the 2-1/1-2 merge moves are deliberately
    omitted — with corpus-ratio scaling an adversarial insertion
    distorts the ratio and mismatched merges go artificially cheap, so
    merged sentences surface as skips and simply don't contribute 1-1
    training pairs). Each row update is vectorized numpy except the
    ordered 0-1 sweep; cost is O(sa) row passes of O(sb) work.

    Cost model (deterministic integers, no floats): matching costs
    2·|la − lb| on RAW lengths; a skip costs the skipped length + PEN
    (PEN = mean sentence length + 1). Raw lengths, NOT corpus-ratio
    scaling: an inserted boilerplate sentence inflates the corpus
    total, and ratio-scaled costs then make matching the insertion
    look cheap (measured: a 30-char spam "matched" a 19-char sentence
    at cost 84 vs 1140 for the true pair). The raw model assumes the
    two sides are length-comparable — true for the candidate pairs
    this feeds on; strongly length-skewed language pairs need a
    caller-supplied ratio upstream.
    Returns [(ai, bi)] 1-1 aligned index pairs, strictly monotone in
    both coordinates.
    """
    la = np.array([len(s) for s in sents_a], dtype=np.int64)
    lb = np.array([len(s) for s in sents_b], dtype=np.int64)
    na, nb = len(la), len(lb)
    if not na or not nb:
        return []
    PEN = (int(la.sum()) + int(lb.sum())) // (na + nb) + 1
    BIG = np.int64(2**60)
    prev = np.full(nb + 1, BIG, dtype=np.int64)
    prev[0] = 0
    for j in range(1, nb + 1):
        prev[j] = prev[j - 1] + lb[j - 1] + PEN
    back = np.zeros((na + 1, nb + 1), dtype=np.int8)  # move code per cell
    back[0, 1:] = 2  # 0-1
    for i in range(1, na + 1):
        cur = np.full(nb + 1, BIG, dtype=np.int64)
        cur[0] = prev[0] + la[i - 1] + PEN
        bk = np.zeros(nb + 1, dtype=np.int8)
        bk[0] = 1  # 1-0
        c11 = prev[:-1] + 2 * np.abs(la[i - 1] - lb)
        c10 = prev[1:] + la[i - 1] + PEN
        best = np.minimum(c11, c10)
        # tie preference: 1-1 beats 1-0 (deterministic)
        code = np.where(best == c11, 3, 1)
        cur[1:] = best
        bk[1:] = code.astype(np.int8)
        # 0-1 depends on cur[j-1]: one ordered left-to-right sweep
        for jj in range(1, nb + 1):
            c01 = cur[jj - 1] + lb[jj - 1] + PEN
            if c01 < cur[jj]:
                cur[jj] = c01
                bk[jj] = 2
        back[i] = bk
        prev = cur
    # traceback
    out = []
    i, j = na, nb
    while i > 0 or j > 0:
        mv = back[i, j]
        if mv == 3:  # 1-1
            out.append((i - 1, j - 1))
            i, j = i - 1, j - 1
        elif mv == 1:  # 1-0
            i -= 1
        elif mv == 2:  # 0-1
            j -= 1
        else:  # defensive: should not happen
            break
    out.reverse()
    return out


def align_candidate_pairs(
    pairs_ds,
    docs_ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_sents: int = 512,
    n_buckets: int = 32,
):
    """Sentence-align bitext CANDIDATE pairs (the Gale-Church step
    after :func:`bitext_candidates`): for each (doc_a, doc_b) pair,
    split both texts into sentences ('.'-terminated runs, the
    SQL-splittable convention) and emit the monotone 1-1 alignments
    (doc_a, doc_b, sent_a, sent_b, len_a, len_b).

    Scale shape: texts attach to the PAIR list (small by the
    candidate contract) via two bucketed joins keyed on the doc ids —
    the corpus streams, candidates never broadcast; each pair's DP is
    numpy row-vectorized, quadratic ONLY in its own sentence counts
    (``max_sents`` caps a pathological doc, truncating with a
    documented bias toward the doc head). Iterative DP ⇒ rows-only
    (pytest oracle), like BPE/k-means.
    """
    from rio_cogeo_ray.stages.join import bucketed_hash_join

    texts = docs_ds.map_batches(
        lambda t: pa.table(
            {
                id_col: t[id_col].combine_chunks().cast(pa.int64()),
                text_col: pc.fill_null(
                    t[text_col].combine_chunks().cast(pa.string()), ""
                ),
            }
        ),
        batch_format="pyarrow",
    )

    def _ren(frm, to):
        def _f(t: pa.Table) -> pa.Table:
            return t.rename_columns(
                [to if c == frm else c for c in t.column_names]
            )

        return _f

    pa_side = pairs_ds.map_batches(
        lambda t: t.select(["doc_a", "doc_b"]), batch_format="pyarrow"
    )
    j1 = bucketed_hash_join(
        pa_side,
        texts.map_batches(_ren(id_col, "doc_a"), batch_format="pyarrow").map_batches(
            _ren(text_col, "text_a"), batch_format="pyarrow"
        ),
        on="doc_a",
        n_buckets=n_buckets,
    ).materialize()  # j2's schema fetch would re-run this corpus join
    j2 = bucketed_hash_join(
        j1,
        texts.map_batches(_ren(id_col, "doc_b"), batch_format="pyarrow").map_batches(
            _ren(text_col, "text_b"), batch_format="pyarrow"
        ),
        on="doc_b",
        n_buckets=n_buckets,
    )

    empty = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "sent_a": pa.array([], pa.int64()),
            "sent_b": pa.array([], pa.int64()),
            "len_a": pa.array([], pa.int64()),
            "len_b": pa.array([], pa.int64()),
        }
    )

    def _split_sents(s: str):
        return [x.strip() for x in s.split(".") if x.strip()][:max_sents]

    def _align(t: pa.Table) -> pa.Table:
        if not t.num_rows or "text_a" not in t.column_names:
            return empty
        rows = {k: [] for k in empty.column_names}
        for da, db, ta, tb in zip(
            t["doc_a"].to_pylist(),
            t["doc_b"].to_pylist(),
            t["text_a"].to_pylist(),
            t["text_b"].to_pylist(),
        ):
            sa, sb = _split_sents(ta or ""), _split_sents(tb or "")
            for ai, bi in _align_pair(sa, sb):
                rows["doc_a"].append(da)
                rows["doc_b"].append(db)
                rows["sent_a"].append(ai)
                rows["sent_b"].append(bi)
                rows["len_a"].append(len(sa[ai]))
                rows["len_b"].append(len(sb[bi]))
        return pa.table(
            {
                "doc_a": pa.array(rows["doc_a"], pa.int64()),
                "doc_b": pa.array(rows["doc_b"], pa.int64()),
                "sent_a": pa.array(rows["sent_a"], pa.int64()),
                "sent_b": pa.array(rows["sent_b"], pa.int64()),
                "len_a": pa.array(rows["len_a"], pa.int64()),
                "len_b": pa.array(rows["len_b"], pa.int64()),
            }
        )

    return j2.map_batches(_align, batch_format="pyarrow", batch_size=256)
