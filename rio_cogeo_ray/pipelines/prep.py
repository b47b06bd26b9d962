"""Resumable web-corpus preparation — the flagship FILTER → DEDUP →
SCORE chain (q_web_prep's production form) with checkpointed stage
boundaries.

The query-surface version (pipelines/queries.py: q_web_prep) already
materializes its two multi-pass boundaries to the object store; a
killed run restarts from scratch. This pipeline persists those SAME
boundaries as parquet checkpoints (state/checkpoint.py), so a
restarted job resumes from the last completed boundary with
bit-identical output — the ``create()`` level-marker contract
(pipelines/create.py:233-244) extended to the LLM-data chain the
north rule calls checkpoint-resumable.

Stage layout under ``work_dir``:

- ``stage=survivors``: Gopher-repetition gate + dirty-word density
  gate, both pure-map (never an id re-join — the 60 s-vs-7 s lesson).
- ``stage=deduped``:   corpus-wide segment dedup of the survivors.
- scoring (unigram surprisal over the deduped corpus's own counts)
  streams from the last boundary; it is cheap relative to dedup and
  its model derives from the boundary bytes, so re-running it on
  restart is already deterministic.

At 100 TB each boundary is partitioned parquet (one file per block),
so resume skips exactly the finished stages; fingerprints chain from
the source identity + per-stage config and any upstream change
invalidates every downstream boundary (no silent relabeling).
"""

from __future__ import annotations

from typing import Sequence, Union

import pyarrow.compute as pc

import ray.data as rd

from rio_cogeo_ray.stages import text
from rio_cogeo_ray.state import checkpoint as ckpt

DEFAULT_BADWORDS = ("spark", "dup", "slow")
DEFAULT_BAD_DENSITY = 5
DEFAULT_SEG_WORDS = 10


def web_prep(
    src: Union[str, Sequence[str]],
    work_dir: str,
    badwords: Sequence[str] = DEFAULT_BADWORDS,
    bad_density: int = DEFAULT_BAD_DENSITY,
    seg_words: int = DEFAULT_SEG_WORDS,
    id_col: str = "doc_id",
    text_col: str = "text",
    resume: bool = True,
) -> rd.Dataset:
    """FILTER → DEDUP → SCORE with checkpoint-resume. Returns the
    scored Dataset (id, text_clean, n_kept, surprisal_bits, n_tokens).

    Kill/restart contract: a rerun with the same ``src`` + config
    reuses every boundary whose marker verifies and recomputes only
    what follows — output is bit-identical to an uninterrupted run
    (pinned by pytest)."""
    fp0 = ckpt.src_fingerprint(src)
    fp_surv = ckpt.chain_fingerprint(
        fp0,
        "survivors",
        {
            "badwords": list(badwords),
            "bad_density": bad_density,
            "id_col": id_col,
            "text_col": text_col,
        },
    )
    fp_dedup = ckpt.chain_fingerprint(fp_surv, "deduped", {"seg_words": seg_words})

    def _survivors() -> rd.Dataset:
        docs = rd.read_parquet(src, columns=[id_col, text_col])
        gated = text.gopher_repetition(
            docs, id_col=id_col, text_col=text_col, carry_cols=(text_col,)
        ).map_batches(
            lambda t: t.filter(
                pc.equal(t["repetition_ok"].combine_chunks(), 1)
            ).select([id_col, text_col]),
            batch_format="pyarrow",
        )
        return text.word_blocklist_filter(
            gated, tuple(badwords), max_hits=bad_density,
            id_col=id_col, text_col=text_col,
        )

    surv = ckpt.stage_boundary(_survivors, work_dir, "survivors", fp_surv, resume)

    def _deduped() -> rd.Dataset:
        return text.segment_dedup(surv, seg_words=seg_words, id_col=id_col,
                                  text_col=text_col)

    seg = ckpt.stage_boundary(_deduped, work_dir, "deduped", fp_dedup, resume)
    return text.surprisal_score(
        seg, id_col=id_col, text_col="text_clean",
        carry_cols=("text_clean", "n_kept"),
    )


DEFAULT_SPLITS = (("train", 90), ("val", 5), ("test", 5))
DEFAULT_CHUNK_W, DEFAULT_CHUNK_S = 120, 80
_CID_SHIFT = 8192  # max chunks per doc in the packed chunk id


def corpus_to_shards(
    src: Union[str, Sequence[str]],
    work_dir: str,
    num_shards: int = 4,
    window: int = DEFAULT_CHUNK_W,
    stride: int = DEFAULT_CHUNK_S,
    splits: Sequence = DEFAULT_SPLITS,
    id_col: str = "doc_id",
    text_col: str = "text",
    resume: bool = True,
) -> dict:
    """Resumable corpus → training-shards chain (q_corpus_to_shards'
    production form): quality filter → exact dedup → bloom semi join →
    chunking land at ONE checkpointed boundary (``stage=chunks``); the
    deterministic split + seeded shard shuffle then writes through
    :func:`stages.shard.write_shards`, whose own manifest-fingerprint
    resume makes the WRITE idempotent too — a killed run re-enters at
    the last completed boundary on either side of the shuffle.

    Fingerprints chain source → chunks → shards, so a changed corpus
    or any upstream config change rewrites everything downstream and
    nothing stale survives (the create() ResumeMismatch doctrine).
    Returns the shard manifest dict.
    """
    import os

    import pyarrow as pa

    from rio_cogeo_ray.stages import dedup as dedup_mod
    from rio_cogeo_ray.stages import shard as shard_mod
    from rio_cogeo_ray.stages import sketch
    from rio_cogeo_ray.stages.join import bloom_semi_join

    fp0 = ckpt.src_fingerprint(src)
    fp_chunks = ckpt.chain_fingerprint(
        fp0,
        "chunks",
        {
            "window": window,
            "stride": stride,
            "id_col": id_col,
            "text_col": text_col,
        },
    )

    def _chunks() -> rd.Dataset:
        # pool sizing: TWO actor pools live in this chain (QualityScore
        # + BloomProbe); each reserves a CPU, so size them to leave
        # task headroom — a pool pair = cluster CPUs deadlocks at 4
        # cpus (the plan_join broadcast-pool doctrine)
        import ray as _ray

        pool = max(1, int(_ray.cluster_resources().get("CPU", 8)) // 4)
        docs = rd.read_parquet(src, columns=[id_col, text_col])
        scored = docs.map_batches(
            text.QualityScore, batch_format="pyarrow", concurrency=pool,
            batch_size=4096,
        )

        def _keep(t):
            return t.filter(t["quality_ok"].combine_chunks()).select(
                [id_col, text_col]
            )

        q = scored.map_batches(_keep, batch_format="pyarrow")
        keepers = dedup_mod.exact_dedup(q, key_col=text_col, id_col=id_col)
        kept = bloom_semi_join(
            q, keepers, on=id_col, m_bits=1 << 20, concurrency=pool
        )
        chunked = kept.map_batches(
            lambda t: text.chunk_texts(t, window=window, stride=stride),
            batch_format="pyarrow",
        )

        def _cid(t):
            import numpy as np

            d = t[id_col].combine_chunks().cast("int64").to_numpy(
                zero_copy_only=False
            )
            c = t["chunk_id"].combine_chunks().cast("int64").to_numpy(
                zero_copy_only=False
            )
            # cid packs (doc, chunk) into one int64; a doc with >= CID
            # chunks would collide with its neighbour's id space -
            # refuse loudly rather than corrupt shard determinism
            if len(c) and int(c.max()) >= _CID_SHIFT:
                raise ValueError(
                    f"corpus_to_shards: a document produced {int(c.max()) + 1} "
                    f"chunks >= CID_SHIFT={_CID_SHIFT}; raise window/stride or "
                    "widen _CID_SHIFT (cid = doc_id * shift + chunk_id)"
                )
            # the doc side of the pack must fit too: d * shift wraps
            # int64 silently for |doc_id| >= 2^63/shift (hash-derived
            # ids reach there) — same refuse-loudly doctrine as above
            lim = (1 << 63) // _CID_SHIFT
            if len(d) and (int(d.max()) >= lim or int(d.min()) <= -lim):
                raise ValueError(
                    f"corpus_to_shards: |{id_col}| >= 2^63/CID_SHIFT "
                    f"({lim}) would overflow the packed cid; remap ids "
                    "to a dense range or widen the cid packing"
                )
            return t.append_column(
                "cid", pa.array(d * _CID_SHIFT + c, pa.int64())
            )

        return chunked.map_batches(_cid, batch_format="pyarrow")

    chunks = ckpt.stage_boundary(_chunks, work_dir, "chunks", fp_chunks, resume)

    fp_shards = ckpt.chain_fingerprint(
        fp_chunks, "shards", {"num_shards": num_shards, "splits": list(splits)}
    )
    split = sketch.split_assign(chunks, "cid", list(splits))

    def _train(t):
        return t.filter(
            pc.equal(t["split"].combine_chunks(), "train")
        ).drop_columns(["split"])

    train = split.map_batches(_train, batch_format="pyarrow")
    shards_dir = os.path.join(work_dir, "shards")
    if not resume:
        # --no-resume means REBUILD: write_shards' own fingerprint
        # short-circuit must not preserve possibly-corrupt output
        import shutil

        shutil.rmtree(shards_dir, ignore_errors=True)
    return shard_mod.write_shards(
        train,
        shards_dir,
        id_col="cid",
        num_shards=num_shards,
        src_fingerprint=fp_shards,
    )
