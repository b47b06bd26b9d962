"""Inverted text index: build posting lists, search with I/O pruning.

The text-retrieval sibling of the IVF vector index (stages/ann.py:210)
and the zone-mapped layout (sources/zonemap.py): posting lists —
(token-hash, doc_id) pairs, distinct per doc — persist as parquet
partitioned by ``shard = token_hash % n_shards``, and a boolean query
reads ONLY the shards its terms hash into, pruning the scan at I/O.
Token strings never enter the index: the 64-bit polars hash stands for
the token (the segment_dedup contract — equal hash ⟺ equal token
modulo documented 2^-64-per-pair odds; a collision can only ADD a
false posting, surfaced by the exact re-verify option upstream
pipelines can apply).

Build shape: ONE pure-map pass over the corpus (per-batch tokenize →
np.unique per doc → (th, doc_id) rows) → ``write_parquet
(partition_cols)``. The shuffle-free analog of a log-structured index
build; rebuilds replace atomically (tmp dir + os.replace). Corpus
stats (N docs, Σ doc length) ride ALONG the same pass as one sentinel
row per batch in partition ``shard=-1`` (th hashes to [0, n_shards),
so no query ever probes it): the build tokenizes exactly once, and
harvesting stats is a driver-side read of that one tiny directory —
NOT a scan of the thousands of per-task × per-shard posting files.

Search shape: read the probed shards with a pushed-down ``th ∈ terms``
filter, then one partial→final count per doc — AND = count equals
|terms| (postings are distinct per doc), OR = any posting.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import List, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MANIFEST = "index.json"


def _term_hash(terms: Sequence[str]) -> np.ndarray:
    import polars as pl

    arr = pa.array(list(terms), pa.large_string())
    return pl.from_arrow(arr).hash(seed=11).to_numpy().astype(np.uint64).view(np.int64)


def _make_postings_fn(id_col: str, text_col: str, n_shards: int):
    """The ONE postings map kernel, shared by build_text_index and
    append_text_index (same tokenizer, hash seed, shard routing and
    stats-sentinel convention — a drifted copy would silently split
    the index)."""
    import polars as pl

    from rio_cogeo_ray.stages.text import _tokenize_with_positions

    def _postings(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "th": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
                "tf": pa.array([], pa.int64()),
                "dl": pa.array([], pa.int64()),
                "shard": pa.array([], pa.int64()),
            }
        )
        toks, row, _ = _tokenize_with_positions(batch, id_col, text_col)
        if len(row) == 0:
            return empty
        th = (
            pl.from_arrow(toks.cast(pa.large_string()))
            .hash(seed=11)
            .to_numpy()
            .astype(np.uint64)
            .view(np.int64)
        )
        ids = batch[id_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        dls = np.bincount(row, minlength=batch.num_rows).astype(np.int64)
        order = np.lexsort((th, row))
        r_s, t_s = row[order], th[order]
        new = np.r_[True, (r_s[1:] != r_s[:-1]) | (t_s[1:] != t_s[:-1])]
        starts = np.flatnonzero(new)
        tf = np.diff(np.append(starts, len(r_s))).astype(np.int64)
        t_u, r_u = t_s[new], r_s[new]
        out = pa.table(
            {
                "th": pa.array(t_u, pa.int64()),
                id_col: pa.array(ids[r_u], pa.int64()),
                "tf": pa.array(tf, pa.int64()),
                # doc length denormalized onto every posting (the
                # impact-ordered-index trick): BM25 needs no doc join
                "dl": pa.array(dls[r_u], pa.int64()),
                "shard": pa.array(
                    (t_u.view(np.uint64) % np.uint64(n_shards)).astype(np.int64),
                    pa.int64(),
                ),
            }
        )
        # corpus-stats sentinel row, routed to partition shard=-1 (no
        # term hashes there): id_col carries the batch's tokenized doc
        # count, tf its token total — stats ride the SAME single pass
        stats_row = pa.table(
            {
                "th": pa.array([0], pa.int64()),
                id_col: pa.array([int(len(np.unique(row)))], pa.int64()),
                "tf": pa.array([int(len(row))], pa.int64()),
                "dl": pa.array([0], pa.int64()),
                "shard": pa.array([-1], pa.int64()),
            }
        )
        return pa.concat_tables([out, stats_row])

    return _postings


def _harvest_sentinel(tmp_dir: str, id_col: str) -> "tuple[int, int]":
    """Pop the shard=-1 stats partition from a freshly-written postings
    dir: (n docs with tokens, Σ doc length). The sentinel rows rode the
    SAME single tokenize pass that built the postings."""
    import pyarrow.parquet as pq

    os.makedirs(tmp_dir, exist_ok=True)  # empty corpus writes nothing
    n_docs, total_dl = 0, 0
    sent_dir = os.path.join(tmp_dir, "shard=-1")
    if os.path.isdir(sent_dir):
        st = pq.read_table(sent_dir, columns=[id_col, "tf"])
        n_docs = int(pa.compute.sum(st[id_col]).as_py() or 0)
        total_dl = int(pa.compute.sum(st["tf"]).as_py() or 0)
        shutil.rmtree(sent_dir, ignore_errors=True)
    return n_docs, total_dl


def _posting_roots(index_dir: str) -> List[str]:
    """Every postings root: the base build plus appended generations."""
    roots = [os.path.join(index_dir, "postings")]
    for name in sorted(os.listdir(index_dir)):
        if name.startswith("postings.gen-"):
            roots.append(os.path.join(index_dir, name))
    return [r for r in roots if os.path.isdir(r)]


def _shard_files(index_dir: str, shards) -> List[str]:
    """Parquet leafs of the probed shards across ALL generations."""
    files: List[str] = []
    for root in _posting_roots(index_dir):
        for s in shards:
            sdir = os.path.join(root, f"shard={int(s)}")
            if os.path.isdir(sdir):
                files.extend(
                    os.path.join(sdir, f)
                    for f in sorted(os.listdir(sdir))
                    if f.endswith(".parquet")
                )
    return files


def build_text_index(
    ds,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 64,
) -> str:
    """Materialize the inverted index under ``index_dir/postings/
    shard=<k>/``. Postings are (th, doc_id), DISTINCT per doc."""
    _postings = _make_postings_fn(id_col, text_col, n_shards)

    os.makedirs(index_dir, exist_ok=True)
    post_dir = os.path.join(index_dir, "postings")
    tmp_dir = os.path.join(index_dir, ".postings.tmp")
    shutil.rmtree(tmp_dir, ignore_errors=True)
    ds.map_batches(_postings, batch_format="pyarrow").write_parquet(
        tmp_dir, partition_cols=["shard"]
    )

    # corpus stats (N docs with tokens, Σ doc length): driver-side sum
    # over the shard=-1 sentinel rows — one tiny partition directory
    # (one row per map batch), NOT a scan of the per-task × per-shard
    # posting files; the corpus text was tokenized exactly ONCE above
    n_docs, total_dl = _harvest_sentinel(tmp_dir, id_col)

    # a rebuild removes every appended generation too — the index is
    # whole again from this corpus alone
    for root in _posting_roots(index_dir):
        shutil.rmtree(root, ignore_errors=True)
    os.replace(tmp_dir, post_dir)
    _write_manifest(
        index_dir,
        {
            "n_shards": n_shards,
            "id_col": id_col,
            "n_docs": n_docs,
            "total_dl": total_dl,
            "generations": [],
        },
    )
    return index_dir


def _write_manifest(index_dir: str, man: dict) -> None:
    tmp = os.path.join(index_dir, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, os.path.join(index_dir, MANIFEST))


def append_text_index(
    ds_new,
    index_dir: str,
    text_col: str = "text",
    fingerprint: str = "gen1",
) -> dict:
    """Incremental index growth (the append_shards doctrine for
    retrieval): new documents land as a sibling postings GENERATION
    ``postings.gen-<fingerprint>/shard=<k>/`` — prior postings are
    never rewritten or re-tokenized, queries read every generation's
    probed shards (``_shard_files``), and corpus stats (n_docs,
    total_dl) accumulate in the manifest so BM25's idf/avgdl stay
    exact over the union.

    Contract: new doc ids must be DISJOINT from already-indexed ones
    (run dedup.incremental_dedup upstream) — a re-indexed id would
    double its postings. Idempotent per fingerprint: an existing
    generation directory makes the call a no-op (the crash-safe
    rename happens after the sentinel harvest, so a half-built
    generation is invisible). Returns the updated manifest."""
    with open(os.path.join(index_dir, MANIFEST)) as f:
        man = json.load(f)
    gen_root = os.path.join(index_dir, f"postings.gen-{fingerprint}")
    if os.path.isdir(gen_root):
        return man  # this delta is already in — no-op
    id_col, n_shards = man["id_col"], man["n_shards"]
    _postings = _make_postings_fn(id_col, text_col, n_shards)
    tmp_dir = os.path.join(index_dir, f".gen-{fingerprint}.tmp")
    shutil.rmtree(tmp_dir, ignore_errors=True)
    ds_new.map_batches(_postings, batch_format="pyarrow").write_parquet(
        tmp_dir, partition_cols=["shard"]
    )
    d_docs, d_dl = _harvest_sentinel(tmp_dir, id_col)
    os.replace(tmp_dir, gen_root)  # atomic: generation appears whole
    man["n_docs"] = int(man["n_docs"]) + d_docs
    man["total_dl"] = int(man["total_dl"]) + d_dl
    man.setdefault("generations", []).append(fingerprint)
    _write_manifest(index_dir, man)
    return man


def search_index(index_dir: str, terms: Sequence[str], mode: str = "and"):
    """Boolean term search over a :func:`build_text_index` layout:
    reads ONLY the shards the query terms hash into (the probed-bucket
    doctrine), pushes ``th ∈ terms`` into the parquet scan, then one
    partial→final per-doc count. Returns a Dataset of matching doc ids
    (one ``<id_col>`` column, AND: docs containing every term)."""
    import pyarrow.dataset as pads
    import ray.data as rd

    from rio_cogeo_ray.stages.agg import partial_group_agg

    if mode not in ("and", "or"):
        raise ValueError(f"mode must be 'and' or 'or', got {mode!r}")
    with open(os.path.join(index_dir, MANIFEST)) as f:
        man = json.load(f)
    n_shards, id_col = man["n_shards"], man["id_col"]
    th = _term_hash(terms)
    shards = np.unique(th.view(np.uint64) % np.uint64(n_shards))
    files = _shard_files(index_dir, shards)
    empty = pa.table({id_col: pa.array([], pa.int64())})
    if not files:
        return rd.from_arrow(empty)
    flt = pads.field("th").isin([int(v) for v in th])
    hits = rd.read_parquet(files, columns=["th", id_col], filter=flt)
    counted = partial_group_agg(hits, keys=[id_col], count_as="c")
    need = 1 if mode == "or" else len(set(int(v) for v in th))

    def _sel(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_rows == 0 or "c" not in t.column_names:
            # an all-empty partial agg loses its schema
            return empty
        return t.filter(pc.greater_equal(t["c"], need)).select([id_col])

    return counted.map_batches(_sel, batch_format="pyarrow")


def bm25_search(
    index_dir: str,
    terms: Sequence[str],
    k: int = 10,
    k1_ppm: int = 1_200_000,
    b_ppm: int = 750_000,
    scoring: str = "bm25",
):
    """BM25 ranked retrieval over the index (Robertson/Spärck Jones):
    reads ONLY the probed shards, computes idf from the df of the
    matched postings, scores every candidate posting in one vectorized
    pass, sums per doc through partial→final int64 aggregation, and
    returns the top-k (doc_id, score_ppm) table.

    Determinism: per-posting scores quantize to int64 ppm BEFORE the
    exchange (the tfidf_topk doctrine) — floor(idf · tfnorm · 1e6 +
    0.5) — so ranking is bit-identical at any parallelism; ties break
    by doc_id ascending. k1/b arrive as ppm ints for the same reason.

    Scale: candidates are bounded by the query terms' posting lists
    (never the corpus); df reduces to ≤|terms| driver rows; doc
    lengths ride denormalized on postings so no doc-side join exists.
    The final top-k is a driver sort over ≤ candidate-doc rows — cap
    queries with huge posting lists upstream (stopword caveat).

    ``scoring="tfidf"`` swaps the per-posting kernel for plain
    tf·ln(N/df) (same ×1e6 floor, same exchange) — the second exact
    lexical leg rrf_fuse needs for an all-integer fusion."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    import ray as _ray
    import ray.data as rd

    from rio_cogeo_ray.stages.agg import partial_group_agg

    with open(os.path.join(index_dir, MANIFEST)) as f:
        man = json.load(f)
    n_shards, id_col = man["n_shards"], man["id_col"]
    n_docs, total_dl = man["n_docs"], man["total_dl"]
    empty = pa.table(
        {id_col: pa.array([], pa.int64()), "score_ppm": pa.array([], pa.int64())}
    )
    if n_docs == 0:
        return empty
    avgdl = total_dl / n_docs
    th = _term_hash(terms)
    th_set = sorted(set(int(v) for v in th))
    shards = np.unique(np.array(th_set, dtype=np.int64).view(np.uint64) % np.uint64(n_shards))
    files = _shard_files(index_dir, shards)
    if not files:
        return empty
    flt = pads.field("th").isin(th_set)
    hits = rd.read_parquet(files, columns=["th", id_col, "tf", "dl"], filter=flt)
    # df per term: postings are distinct per doc, so df = row count
    dft = pa.concat_tables(
        _ray.get(
            partial_group_agg(hits, keys=["th"], count_as="df").to_arrow_refs()
        ),
        promote_options="default",
    )
    if dft.num_rows == 0 or "th" not in dft.column_names:
        # no query term has postings in any probed shard: zero candidates
        # (an all-empty partial agg loses its schema, so guard both ways)
        return empty
    df_map = dict(zip(dft["th"].to_pylist(), dft["df"].to_pylist()))
    th_arr = np.array(th_set, dtype=np.int64)
    df_arr = np.array([df_map.get(t, 0) for t in th_set], dtype=np.float64)
    if scoring == "tfidf":
        # df==0 terms have no postings and are never looked up; keep
        # the array finite so no spurious divide/log warnings fire
        idf_arr = np.log(np.where(df_arr > 0, n_docs / df_arr, 1.0))
    else:
        idf_arr = np.log((n_docs - df_arr + 0.5) / (df_arr + 0.5) + 1.0)
    idf_ref = _ray.put((th_arr, idf_arr))
    k1 = k1_ppm / 1e6
    bb = b_ppm / 1e6

    def _score(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table(
                {id_col: pa.array([], pa.int64()), "s": pa.array([], pa.int64())}
            )
        th_a, idf_a = _ray.get(idf_ref)
        thv = t["th"].combine_chunks().to_numpy(zero_copy_only=False)
        tf = t["tf"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        dl = t["dl"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        w = idf_a[np.searchsorted(th_a, thv)]
        if scoring == "tfidf":
            norm = tf
        else:
            norm = tf * (k1 + 1.0) / (tf + k1 * (1.0 - bb + bb * dl / avgdl))
        s = np.floor(w * norm * 1e6 + 0.5).astype(np.int64)
        return pa.table(
            {
                id_col: t[id_col].combine_chunks().cast(pa.int64()),
                "s": pa.array(s, pa.int64()),
            }
        )

    scored = partial_group_agg(
        hits.map_batches(_score, batch_format="pyarrow"),
        keys=[id_col],
        sum_cols=["s"],
        count_as=None,
    )
    res = pa.concat_tables(
        _ray.get(scored.to_arrow_refs()), promote_options="default"
    ).rename_columns([id_col, "score_ppm"])
    res = res.sort_by([("score_ppm", "descending"), (id_col, "ascending")])
    return res.slice(0, k)


def build_positional_index(
    ds,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 64,
) -> str:
    """Positional inverted index for PHRASE queries: postings are
    (th, doc_id, pos) — one row per token OCCURRENCE (word position
    within the doc), partitioned by ``shard = th % n_shards`` like the
    boolean index. Build is the same ONE pure-map pass + partitioned
    write (no shuffle); the index is larger than the boolean one (one
    row per token, not per distinct (term, doc)) — that is the
    standard positional-index trade, paid at build time so phrase
    queries stay probe-only."""
    import polars as pl

    from rio_cogeo_ray.stages.text import _tokenize_with_positions

    def _postings(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "th": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
                "pos": pa.array([], pa.int64()),
                "shard": pa.array([], pa.int64()),
            }
        )
        toks, row, wpos = _tokenize_with_positions(batch, id_col, text_col)
        if len(row) == 0:
            return empty
        th = (
            pl.from_arrow(toks.cast(pa.large_string()))
            .hash(seed=11)
            .to_numpy()
            .astype(np.uint64)
            .view(np.int64)
        )
        ids = (
            batch[id_col].combine_chunks().cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "th": pa.array(th, pa.int64()),
                id_col: pa.array(ids[row], pa.int64()),
                "pos": pa.array(wpos, pa.int64()),
                "shard": pa.array(
                    (th.view(np.uint64) % np.uint64(n_shards)).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    os.makedirs(index_dir, exist_ok=True)
    post_dir = os.path.join(index_dir, "postings")
    tmp_dir = os.path.join(index_dir, ".postings.tmp")
    shutil.rmtree(tmp_dir, ignore_errors=True)
    ds.map_batches(_postings, batch_format="pyarrow").write_parquet(
        tmp_dir, partition_cols=["shard"]
    )
    os.makedirs(tmp_dir, exist_ok=True)
    shutil.rmtree(post_dir, ignore_errors=True)
    os.replace(tmp_dir, post_dir)
    with open(os.path.join(index_dir, MANIFEST), "w") as f:
        json.dump(
            {"n_shards": n_shards, "id_col": id_col, "positional": True}, f
        )
    return index_dir


def phrase_search(index_dir: str, phrase: Sequence[str], n_buckets: int = 16):
    """Exact phrase query over a :func:`build_positional_index` layout
    — token adjacency, the retrieval op booleans can't express. Reads
    ONLY the shards the phrase's distinct terms hash into with a
    pushed-down ``th ∈ terms`` filter, routes the probed postings by
    ``hash(doc)`` (ONE bounded exchange over candidate postings, never
    the corpus), and verifies adjacency per bucket fully vectorized:
    every occurrence of phrase term i at position p votes for
    alignment base p−i, and a doc matches iff some base collects all
    len(phrase) distinct term slots. Returns a Dataset of matching doc
    ids. Token-hash collision contract as the boolean index (a
    collision can only ADD a candidate, and it must then align)."""
    import pyarrow.dataset as pads
    import ray.data as rd

    from rio_cogeo_ray.functions.hashing import splitmix64

    phrase = list(phrase)
    if not phrase:
        raise ValueError("phrase must have at least one term")
    with open(os.path.join(index_dir, MANIFEST)) as f:
        man = json.load(f)
    if not man.get("positional"):
        raise ValueError(f"{index_dir} is not a positional index")
    n_shards, id_col = man["n_shards"], man["id_col"]
    k = len(phrase)
    th = _term_hash(phrase)  # per slot, repeats allowed
    uniq = np.unique(th)
    shards = np.unique(uniq.view(np.uint64) % np.uint64(n_shards))
    files: List[str] = []
    for s in shards:
        sdir = os.path.join(index_dir, "postings", f"shard={int(s)}")
        if os.path.isdir(sdir):
            files.extend(
                os.path.join(sdir, f)
                for f in sorted(os.listdir(sdir))
                if f.endswith(".parquet")
            )
    empty = pa.table({id_col: pa.array([], pa.int64())})
    if not files:
        return rd.from_arrow(empty)
    flt = pads.field("th").isin([int(v) for v in uniq])
    hits = rd.read_parquet(files, columns=["th", id_col, "pos"], filter=flt)
    # slot table: term hash -> phrase positions it occupies (repeats ok)
    slot_th = th.astype(np.int64)
    slot_i = np.arange(k, dtype=np.int64)

    def _route(t: pa.Table) -> pa.Table:
        d = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        b = (splitmix64(d.astype(np.uint64)) % np.uint64(n_buckets)).astype(
            np.int64
        )
        return t.append_column("__bucket", pa.array(b, pa.int64()))

    def _verify(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return empty
        gth = g["th"].combine_chunks().to_numpy(zero_copy_only=False)
        gd = g[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        gp = g["pos"].combine_chunks().to_numpy(zero_copy_only=False)
        # explode each occurrence into every phrase slot its term fills
        rows = []
        for i in range(k):
            m = gth == slot_th[i]
            if not m.any():
                return empty  # a slot with zero occurrences kills all
            base = gp[m] - slot_i[i]
            ok = base >= 0
            rows.append(
                np.column_stack(
                    (gd[m][ok], base[ok], np.full(int(ok.sum()), i, np.int64))
                )
            )
        tri = np.unique(np.concatenate(rows), axis=0)  # distinct (d, b, i)
        key = tri[:, 0] * np.int64(1 << 22) + tri[:, 1]  # pos < 2^22
        uk, cnt = np.unique(key, return_counts=True)
        hit_docs = np.unique((uk >> 22)[cnt == k])
        return pa.table({id_col: pa.array(hit_docs, pa.int64())})

    return (
        hits.map_batches(_route, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(
            lambda g: _verify(g.drop_columns(["__bucket"])),
            batch_format="pyarrow",
        )
    )


def build_trigram_index(
    ds,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 64,
) -> str:
    """Character-TRIGRAM inverted index for substring search (the
    pg_trgm doctrine): postings are (th, doc_id) with th the 3×21-bit
    collision-FREE packed codepoint window (text.py:_doc_trigram_keys
    — key equality ⟺ 3-char substring equality, no hash odds at all),
    DISTINCT per doc, partitioned by ``th % n_shards``. Build is ONE
    pure-map pass + partitioned write, no shuffle."""
    from rio_cogeo_ray.stages.text import _doc_trigram_keys

    def _postings(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "th": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
                "shard": pa.array([], pa.int64()),
            }
        )
        keys, rows = _doc_trigram_keys(batch, text_col)
        if len(keys) == 0:
            return empty
        ids = (
            batch[id_col].combine_chunks().cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        pair = np.unique(
            np.column_stack((keys.view(np.int64), ids[rows])), axis=0
        )
        th = pair[:, 0]
        return pa.table(
            {
                "th": pa.array(th, pa.int64()),
                id_col: pa.array(pair[:, 1], pa.int64()),
                "shard": pa.array(
                    (th.view(np.uint64) % np.uint64(n_shards)).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    os.makedirs(index_dir, exist_ok=True)
    post_dir = os.path.join(index_dir, "postings")
    tmp_dir = os.path.join(index_dir, ".postings.tmp")
    shutil.rmtree(tmp_dir, ignore_errors=True)
    ds.map_batches(_postings, batch_format="pyarrow").write_parquet(
        tmp_dir, partition_cols=["shard"]
    )
    os.makedirs(tmp_dir, exist_ok=True)
    shutil.rmtree(post_dir, ignore_errors=True)
    os.replace(tmp_dir, post_dir)
    with open(os.path.join(index_dir, MANIFEST), "w") as f:
        json.dump({"n_shards": n_shards, "id_col": id_col, "trigram": True}, f)
    return index_dir


def substring_search(
    index_dir: str,
    needle: str,
    docs_ds,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Exact SUBSTRING search (``LIKE '%needle%'``) without a full text
    scan: the needle's trigrams prune candidates through the trigram
    index (a doc can contain the needle only if it contains EVERY
    needle trigram — the packed keys are collision-free, so the filter
    is a true superset), then ONE corpus pass over the broadcast
    candidate-id set verifies with an exact match_substring. Zero
    false positives and zero false negatives; needle must be ≥3
    codepoints (shorter needles have no trigram and would demand the
    full scan this operator exists to avoid)."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    import ray as _ray
    import ray.data as rd

    from rio_cogeo_ray.stages.agg import partial_group_agg

    cps = [ord(c) for c in needle]
    if len(cps) < 3:
        raise ValueError("substring_search needs a needle of ≥3 characters")
    with open(os.path.join(index_dir, MANIFEST)) as f:
        man = json.load(f)
    if not man.get("trigram"):
        raise ValueError(f"{index_dir} is not a trigram index")
    n_shards = man["n_shards"]
    c = np.array(cps, dtype=np.uint64)
    th = np.unique(
        ((c[:-2] << np.uint64(42)) | (c[1:-1] << np.uint64(21)) | c[2:]).view(
            np.int64
        )
    )
    shards = np.unique(th.view(np.uint64) % np.uint64(n_shards))
    files: List[str] = []
    for s in shards:
        sdir = os.path.join(index_dir, "postings", f"shard={int(s)}")
        if os.path.isdir(sdir):
            files.extend(
                os.path.join(sdir, f)
                for f in sorted(os.listdir(sdir))
                if f.endswith(".parquet")
            )
    empty = pa.table({id_col: pa.array([], pa.int64())})
    if not files:
        return rd.from_arrow(empty)
    flt = pads.field("th").isin([int(v) for v in th])
    hits = rd.read_parquet(files, columns=["th", id_col], filter=flt)
    counted = partial_group_agg(hits, keys=[id_col], count_as="c")
    need = len(th)
    cand_blocks = [
        b
        for b in _ray.get(counted.to_arrow_refs())
        if b.num_rows and "c" in b.column_names
    ]
    if not cand_blocks:
        return rd.from_arrow(empty)
    cand_t = pa.concat_tables(cand_blocks).combine_chunks()
    cand = cand_t.filter(pc.equal(cand_t["c"], need))[id_col]
    if len(cand) == 0:
        return rd.from_arrow(empty)
    cand_ref = _ray.put(
        np.sort(cand.to_numpy(zero_copy_only=False).astype(np.int64))
    )

    def _verify(t: pa.Table) -> pa.Table:
        cs = _ray.get(cand_ref)
        ids = (
            t[id_col].combine_chunks().cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        pos = np.clip(np.searchsorted(cs, ids), 0, len(cs) - 1)
        m = cs[pos] == ids
        t = t.filter(pa.array(m))
        if t.num_rows == 0:
            return empty
        hit = pc.fill_null(
            pc.match_substring(t[text_col].combine_chunks().cast(pa.string()), needle),
            False,
        )
        return pa.table({id_col: t[id_col].combine_chunks().cast(pa.int64()).filter(hit)})

    return docs_ds.map_batches(_verify, batch_format="pyarrow")


def rrf_fuse(legs, k_const: int = 60, topk: int = 10, id_col: str = "doc_id"):
    """Reciprocal-rank fusion (Cormack et al. SIGIR'09) of ranked
    retrieval legs. ``legs``: small tables ALREADY in rank order (row i
    = rank i+1) each holding ``id_col``. Integer-exact scoring —
    contribution of rank r is 1_000_000_000 // (k_const + r) — so the
    fused ordering is bit-identical everywhere; ties break by id.

    Driver-side by contract: each leg is a top-k output (bounded),
    never a corpus. The distributed work lives in the legs."""
    scores: dict = {}
    ranks: list = []
    for li, t in enumerate(legs):
        ids = t[id_col].to_pylist() if t.num_rows else []
        rmap = {}
        for r, i in enumerate(ids, start=1):
            rmap[i] = r
            scores[i] = scores.get(i, 0) + 1_000_000_000 // (k_const + r)
        ranks.append(rmap)
    order = sorted(scores, key=lambda i: (-scores[i], i))[:topk]
    return pa.table(
        {
            id_col: pa.array(order, pa.int64()),
            "rrf_nano": pa.array([scores[i] for i in order], pa.int64()),
            **{
                f"rank_{li}": pa.array(
                    [ranks[li].get(i, 0) for i in order], pa.int64()
                )
                for li in range(len(legs))
            },
        }
    )


def hybrid_search(
    index_dir: str,
    terms,
    emb_ds,
    query_vec: np.ndarray,
    k: int = 10,
    pool: int = 50,
    k_const: int = 60,
    id_col: str = "doc_id",
    emb_id_col: str = "vec_id",
):
    """Hybrid lexical+semantic retrieval: BM25 over the shard-pruned
    inverted index fused with exact cosine top-k over the embedding
    table by reciprocal-rank fusion. Both legs are distributed,
    bounded-output retrievals; the fusion is a driver-side merge of two
    ≤pool-row lists. Embedding ids must share the document id space."""
    import ray as _ray

    from rio_cogeo_ray.stages.ann import knn_cosine

    lex = bm25_search(index_dir, terms, k=pool)
    sem_ds = knn_cosine(emb_ds, np.asarray(query_vec)[None, :], k=pool, id_col=emb_id_col)
    sem = pa.concat_tables(
        [t for t in _ray.get(sem_ds.to_arrow_refs()) if t.num_rows > 0]
        or [pa.table({emb_id_col: pa.array([], pa.int64()), "score": pa.array([], pa.float64())})],
        promote_options="default",
    )
    sem = sem.sort_by([("score", "descending"), (emb_id_col, "ascending")])
    sem = sem.rename_columns(
        [id_col if c == emb_id_col else c for c in sem.column_names]
    ).select([id_col])
    fused = rrf_fuse([lex.select([id_col]), sem], k_const=k_const, topk=k, id_col=id_col)
    return fused.rename_columns(
        [id_col, "rrf_nano", "bm25_rank", "cosine_rank"]
    )


def kwic_snippets(
    ds,
    needle: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    context: int = 30,
):
    """Keyword-in-context snippet extraction (search-result rendering
    over the corpus): for every doc containing ``needle`` (literal
    substring), the 1-based CHARACTER position of its first occurrence
    and a snippet of ``context`` codepoints either side.

    Pure map, ZERO shuffle; output rows ∝ matching docs. Character
    positions come from ``utf8_length`` of the pre-match piece of one
    ``max_splits=1`` split (pyarrow's ``find_substring`` is
    byte-indexed — unusable against char-indexed SQL ``strpos``), and
    slicing is ``utf8_slice_codeunits`` ≡ SQL ``substr`` (both
    codepoint-based, end-clamped) — so the whole row is hash-exact
    against the strpos/substr mirror."""

    def _kwic(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "pos": pa.array([], pa.int64()),
                "snippet": pa.array([], pa.string()),
            }
        )
        if not batch.num_rows:
            return empty
        t = batch[text_col]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        t = t.cast(pa.string())
        parts = pc.split_pattern(t, needle, max_splits=1)
        hit = pc.equal(pc.list_value_length(parts), 2)
        hit = pc.fill_null(hit, False)
        hit_np = hit.to_numpy(zero_copy_only=False)
        if not hit_np.any():
            return empty
        sel = pa.array(hit_np)
        hit_parts = parts.filter(sel)
        pre = pc.list_element(hit_parts, 0)
        post = pc.list_element(hit_parts, 1)
        pos0 = (
            pc.utf8_length(pre).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        # per-row slice windows with SCALAR kernels: the last `context`
        # codepoints of pre are the first `context` of its reverse
        # (utf8_slice_codeunits takes scalar offsets only)
        pre_tail = pc.utf8_reverse(
            pc.utf8_slice_codeunits(pc.utf8_reverse(pre), 0, context)
        )
        post_head = pc.utf8_slice_codeunits(post, 0, context)
        snip = pc.binary_join_element_wise(
            pre_tail, pa.scalar(needle), post_head, ""
        )
        ids = batch[id_col].combine_chunks().cast(pa.int64()).filter(sel)
        return pa.table(
            {
                id_col: ids,
                "pos": pa.array(pos0 + 1, pa.int64()),  # 1-based ≡ strpos
                "snippet": snip,
            }
        )

    return ds.map_batches(_kwic, batch_format="pyarrow")
