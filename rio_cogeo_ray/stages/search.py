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

Build shape: one pure-map pass over the corpus (per-batch tokenize →
np.unique per doc → (th, doc_id) rows) → ``write_parquet
(partition_cols)``. The shuffle-free analog of a log-structured index
build; rebuilds replace atomically (tmp dir + os.replace).

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

MANIFEST = "index.json"


def _term_hash(terms: Sequence[str]) -> np.ndarray:
    import polars as pl

    arr = pa.array(list(terms), pa.large_string())
    return pl.from_arrow(arr).hash(seed=11).to_numpy().astype(np.uint64).view(np.int64)


def build_text_index(
    ds,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 64,
) -> str:
    """Materialize the inverted index under ``index_dir/postings/
    shard=<k>/``. Postings are (th, doc_id), DISTINCT per doc."""
    import polars as pl

    from rio_cogeo_ray.stages.text import _tokenize_with_positions

    def _postings(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "th": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
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
        order = np.lexsort((th, row))
        r_s, t_s = row[order], th[order]
        new = np.r_[True, (r_s[1:] != r_s[:-1]) | (t_s[1:] != t_s[:-1])]
        t_u, r_u = t_s[new], r_s[new]
        return pa.table(
            {
                "th": pa.array(t_u, pa.int64()),
                id_col: pa.array(ids[r_u], pa.int64()),
                "shard": pa.array(
                    (t_u.view(np.uint64) % np.uint64(n_shards)).astype(np.int64),
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
    shutil.rmtree(post_dir, ignore_errors=True)
    os.replace(tmp_dir, post_dir)
    with open(os.path.join(index_dir, MANIFEST), "w") as f:
        json.dump({"n_shards": n_shards, "id_col": id_col}, f)
    return index_dir


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
    need = 1 if mode == "or" else len(set(int(v) for v in th))

    def _sel(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.greater_equal(t["c"], need)).select([id_col])

    return counted.map_batches(_sel, batch_format="pyarrow")
