"""Training-shard output operators: deterministic global shuffle →
fixed shard layout, and weighted multi-corpus mixing.

The step every training-data pipeline runs AFTER corpus prep (filter →
dedup → decontam → chunk/pack, see queries.q_corpus_prep): randomize
example order globally, split into equal-ish shards sized for one data
loader worker, and optionally blend several corpora at fixed sampling
weights. No analog exists in the reference (rio_cogeo stops at the COG
file); semantics follow the standard webtext-pipeline recipe.

Determinism doctrine: every random choice is a knuth32 hash of the
row id (sketch.knuth32 — ``((id + salt) * 2654435761) mod 2^32``), so
results are bit-identical at any parallelism AND expressible in ANSI
SQL, keeping all three operators oracle-checkable:

- shard id      = knuth32(id, salt)      % num_shards
- within-shard  = ORDER BY knuth32(id, salt+1), id   (decorrelated)
- source keep   = knuth32(id, salt_i) % den_i < num_i (Bernoulli)

Partitioning contract (100 TB): a global shuffle is inherently one
all-to-all exchange — the design keeps it to EXACTLY one. Shard
assignment and order keys are pure map-side; the single
``groupby(shard)`` co-locates each shard, and each shard sorts
independently (O(rows/shard · log) per group, no global sort). Size
``num_shards`` so corpus_bytes / num_shards fits a worker heap (at
100 TB with 1 GiB shards that is ~100k groups — far above any hot-key
skew threshold, since knuth32 spreads ids uniformly). ``corpus_mix``
is shuffle-FREE: per-source Bernoulli filters are stateless map
stages and the union is a metadata concatenation; feed its output to
``shard_shuffle`` for the final randomized layout.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from rio_cogeo_ray.stages.sketch import hash_sample_batch, knuth32


def shard_keys_batch(
    batch: pa.Table, id_col: str, num_shards: int, salt: int = 0
) -> pa.Table:
    """Map-side shard assignment: append ``shard`` (hash-partition id)
    and ``__h2`` (the within-shard permutation key, salt+1 so it is
    decorrelated from the shard choice). Pure, stateless."""
    ids = batch[id_col].combine_chunks().cast(pa.int64()).to_numpy(
        zero_copy_only=False
    )
    shard = (knuth32(ids, salt) % np.uint64(num_shards)).astype(np.int64)
    h2 = knuth32(ids, salt + 1).astype(np.int64)
    return batch.append_column(
        "shard", pa.array(shard, pa.int64())
    ).append_column("__h2", pa.array(h2, pa.int64()))


def shard_shuffle(ds, id_col: str, num_shards: int, salt: int = 0):
    """Deterministic seeded global shuffle: every row gets a ``shard``
    in [0, num_shards) and a ``pos`` (0-based rank inside its shard
    under the seeded permutation ORDER BY knuth32(id, salt+1), id).

    SQL mirror: ``ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h2,
    id) - 1``. One all-to-all (the groupby) — the minimum any global
    shuffle can do; per-shard sort is local and vectorized.
    """

    def _rank(g: pa.Table) -> pa.Table:
        g = g.sort_by([("__h2", "ascending"), (id_col, "ascending")])
        pos = pa.array(np.arange(len(g), dtype=np.int64), pa.int64())
        return g.drop_columns(["__h2"]).append_column("pos", pos)

    keyed = ds.map_batches(
        lambda t: shard_keys_batch(t, id_col, num_shards, salt),
        batch_format="pyarrow",
    )
    return keyed.groupby("shard").map_groups(_rank, batch_format="pyarrow")


def write_shards(
    ds,
    out_dir: str,
    id_col: str,
    num_shards: int,
    salt: int = 0,
    src_fingerprint: "str | None" = None,
) -> dict:
    """Materialize the shuffled corpus as ``out_dir/shard=K/*.parquet``
    (one directory per shard — the resumable layout doctrine of
    pipelines/create.py: a re-run can skip finished shard dirs).
    Returns a small manifest dict (shard → rows) written alongside as
    ``_manifest.json``.

    Resume guards INPUT identity like create() does, not just the
    parameters: pass ``src_fingerprint`` (e.g. source path + size +
    mtime) and a re-run skips the write only when the stored
    fingerprint matches. Without one, the fallback check counts ``ds``
    and requires it to equal the manifest's row total — weaker
    (content could change at equal cardinality) but still catching the
    common regenerated-input case."""
    import json

    mpath = os.path.join(out_dir, "_manifest.json")
    if os.path.exists(mpath):
        with open(mpath) as f:
            prev = json.load(f)
        same = (
            prev.get("num_shards") == int(num_shards)
            and prev.get("salt") == int(salt)
            and prev.get("id_col") == id_col
        )
        # cheap directory-existence check FIRST: the no-fingerprint
        # fallback below executes the full upstream chain (ds.count()),
        # which would be wasted when a missing shard dir forces a
        # rewrite anyway
        same = same and all(
            os.path.isdir(os.path.join(out_dir, f"shard={k}"))
            for k in prev.get("shard_rows", {})
        )
        if same:
            if src_fingerprint is not None or prev.get("src_fingerprint"):
                same = prev.get("src_fingerprint") == src_fingerprint
            else:
                # compare against the INITIAL write's rows: appended
                # generations (append_shards) grow prev["rows"], and a
                # mismatch there must NOT nuke the appended deltas
                same = prev.get("base_rows", prev.get("rows")) == ds.count()
        if same:
            return prev

    # stale or parameter-mismatched output: clear before rewriting
    # (write_parquet appends into existing directories)
    if os.path.isdir(out_dir):
        import shutil

        shutil.rmtree(out_dir)

    shuffled = shard_shuffle(ds, id_col, num_shards, salt)
    shuffled.write_parquet(out_dir, partition_cols=["shard"])
    import pyarrow.dataset as pads

    counts: dict = {}
    dset = pads.dataset(out_dir, format="parquet", partitioning="hive")
    tbl = dset.to_table(columns=["shard"])
    vals, cnts = np.unique(
        tbl["shard"].to_numpy(zero_copy_only=False).astype(np.int64),
        return_counts=True,
    )
    # string keys: identical before and after the JSON round-trip
    counts = {str(int(v)): int(c) for v, c in zip(vals, cnts)}
    manifest = {
        "num_shards": int(num_shards),
        "salt": int(salt),
        "id_col": id_col,
        "src_fingerprint": src_fingerprint,
        "rows": int(sum(counts.values())),
        "base_rows": int(sum(counts.values())),
        "shard_rows": counts,
    }
    with open(os.path.join(out_dir, "_manifest.json"), "w") as f:
        json.dump(manifest, f, sort_keys=True)
    return manifest


def bernoulli_tag_batch(
    batch: pa.Table,
    id_col: str,
    source: str,
    rate_num: int,
    rate_den: int,
    salt: int,
    order_salt: int,
) -> pa.Table:
    """Per-source mixing filter: keep ``rate_num/rate_den`` of rows by
    id hash, tag with the source name, and append the shared interleave
    key ``h2`` (one salt for ALL sources, so sorting the union by
    (h2, source, id) yields the deterministic blended order)."""
    # the keep-filter IS the sampling oracle's predicate — reuse it so
    # the SQL-mirrorable contract lives in exactly one place
    kept = hash_sample_batch(batch, id_col, rate_num, rate_den, salt)
    kids = kept[id_col].combine_chunks().cast(pa.int64())
    h2 = knuth32(
        kids.to_numpy(zero_copy_only=False), order_salt
    ).astype(np.int64)
    return pa.table(
        {
            "source": pa.array([source] * len(kept), pa.string()),
            "rid": kids,
            "text": kept["text"].combine_chunks().cast(pa.string()),
            "h2": pa.array(h2, pa.int64()),
        }
    )


def corpus_mix(
    sources: Sequence[Tuple[str, "object", int, int, int]],
    id_col: str = "rid",
    order_salt: int = 7,
):
    """Weighted multi-corpus mix: each source is (name, dataset with
    columns (id, text), rate_num, rate_den, salt). Every source is
    independently Bernoulli-thinned by its own id hash (deterministic
    credit: expected share = num/den of ITS corpus), tagged, and
    unioned with a shared interleave key ``h2``.

    Zero shuffle — filters are map-side, union is metadata-only.
    Downstream consumers read in (h2, source, rid) order (or feed to
    shard_shuffle) for the blended stream. SQL mirror: UNION ALL of
    per-source WHERE hash-filters.
    """
    parts = []
    for name, ds, num, den, salt in sources:

        def _one(t: pa.Table, _name=name, _num=num, _den=den, _salt=salt):
            # normalize: first col is the id, second is the text
            id_c, text_c = t.schema.names[0], t.schema.names[1]
            t2 = pa.table(
                {
                    "rid": t[id_c].combine_chunks().cast(pa.int64()),
                    "text": t[text_c].combine_chunks().cast(pa.string()),
                }
            )
            return bernoulli_tag_batch(
                t2, "rid", _name, _num, _den, _salt, order_salt
            )

        parts.append(ds.map_batches(_one, batch_format="pyarrow"))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def repeat_weighted_batch(
    batch: pa.Table, id_col: str, rate_num: int, rate_den: int, salt: int = 0
) -> pa.Table:
    """Deterministic OVER-sampling (the epochs-per-source side of
    corpus mixing, where :func:`corpus_mix` covers rates ≤ 1): each
    row emits ``floor(num/den)`` copies plus one more iff
    ``knuth32(id, salt) % den < num % den`` — expected copies =
    num/den exactly, decided by the row id alone (same credit rule as
    the Bernoulli filter, so any parallelism and any resume yields the
    same multiset). Appends ``copy_idx`` (0-based) so downstream
    shuffles can keep copies distinguishable. Pure map-side explode,
    zero shuffle. SQL mirror: CROSS JOIN generate_series bounded by
    the per-row copy count."""
    if rate_num < 0 or rate_den <= 0:
        raise ValueError("rate must be non-negative with positive denominator")
    base, rem = divmod(rate_num, rate_den)
    ids = batch[id_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
    extra = (knuth32(ids, salt) % np.uint64(rate_den)) < np.uint64(rem)
    reps = np.full(len(ids), base, dtype=np.int64) + extra
    total = int(reps.sum())
    if total == 0:
        out = batch.slice(0, 0)
        return out.append_column("copy_idx", pa.array([], pa.int64()))
    row_idx = np.repeat(np.arange(len(ids), dtype=np.int64), reps)
    excl = np.concatenate(([0], np.cumsum(reps)[:-1]))
    copy_idx = np.arange(total, dtype=np.int64) - np.repeat(excl, reps)
    out = batch.take(pa.array(row_idx, pa.int64()))
    return out.append_column("copy_idx", pa.array(copy_idx, pa.int64()))


def repeat_weighted(ds, id_col: str, rate_num: int, rate_den: int, salt: int = 0):
    """Dataset form of :func:`repeat_weighted_batch` — feed the output
    to ``shard_shuffle`` (keyed by a (id, copy_idx)-derived id) for the
    final randomized layout of a multi-epoch mix."""
    return ds.map_batches(
        lambda t: repeat_weighted_batch(t, id_col, rate_num, rate_den, salt),
        batch_format="pyarrow",
    )


def append_shards(
    ds_new,
    out_dir: str,
    id_col: str,
    src_fingerprint: "str | None" = None,
) -> dict:
    """Incremental corpus growth into an EXISTING shard layout (the
    output-side companion of dedup.incremental_dedup's input-side
    anti-join): new rows hash into the SAME shards under the manifest's
    recorded (num_shards, salt, id_col) — no reshuffle of prior data —
    and land as a new GENERATION: ``shard=K/gen=G/*.parquet``. Within a
    generation, positions follow the same seeded permutation rank as
    the initial shuffle, so the global deterministic order is
    ``(gen, pos)`` and any re-run of the same delta is a no-op (the
    per-generation fingerprint is recorded in the manifest).

    Raises if ``out_dir`` has no manifest (write_shards creates the
    initial layout). Returns the updated manifest dict."""
    import json

    mpath = os.path.join(out_dir, "_manifest.json")
    if not os.path.exists(mpath):
        raise FileNotFoundError(
            f"{out_dir} has no shard manifest — run write_shards first"
        )
    with open(mpath) as f:
        man = json.load(f)
    num_shards = int(man["num_shards"])
    salt = int(man["salt"])
    if man.get("id_col") != id_col:
        raise ValueError(
            f"id_col mismatch: manifest has {man.get('id_col')!r}, got {id_col!r}"
        )
    gens = man.setdefault("generations", [])
    if src_fingerprint is not None:
        for g in gens:
            if g.get("src_fingerprint") == src_fingerprint:
                return man  # this delta is already appended — no-op

    gen_id = len(gens) + 1
    # crash safety: a prior attempt may have died AFTER writing data
    # but BEFORE recording the generation — its orphan gen dirs would
    # otherwise double the delta on retry (write_parquet appends)
    import glob as _glob
    import shutil as _shutil

    for orphan in _glob.glob(os.path.join(out_dir, "shard=*", f"gen={gen_id}")):
        _shutil.rmtree(orphan)

    # materialize ONCE: the same shuffled delta feeds both the write
    # and the per-shard counts — O(delta), never a rescan of the
    # corpus (the whole point of an incremental append)
    shuffled = shard_shuffle(ds_new, id_col, num_shards, salt).materialize()

    def _tag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "gen", pa.array(np.full(len(t), gen_id, dtype=np.int64), pa.int64())
        )

    shuffled.map_batches(_tag, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["shard", "gen"]
    )

    def _shard_counts(t: pa.Table) -> pa.Table:
        v, c = np.unique(
            t["shard"].combine_chunks().to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {"shard": pa.array(v, pa.int64()), "c": pa.array(c.astype(np.int64), pa.int64())}
        )

    import ray as _ray

    parts = [
        b
        for b in _ray.get(
            shuffled.map_batches(_shard_counts, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        if b.num_rows
    ]
    counts = dict(man.get("shard_rows", {}))
    new_rows = 0
    if parts:
        agg = pa.concat_tables(parts)
        sv = agg["shard"].combine_chunks().to_numpy(zero_copy_only=False)
        cv = agg["c"].combine_chunks().to_numpy(zero_copy_only=False)
        for shard_id in np.unique(sv):
            add = int(cv[sv == shard_id].sum())
            counts[str(int(shard_id))] = counts.get(str(int(shard_id)), 0) + add
            new_rows += add
    gens.append(
        {"gen": gen_id, "rows": new_rows, "src_fingerprint": src_fingerprint}
    )
    man["rows"] = int(man.get("rows", 0)) + new_rows
    man["shard_rows"] = counts
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(man, f, sort_keys=True)
    os.replace(tmp, mpath)
    return man


def _shard_part_tables(shard_dir: str, columns=None):
    """(ordered list of pa.Tables) for one shard: base generation
    (files directly under ``shard=K/``) first, then ``gen=G`` dirs
    ascending — each part sorted by ``pos``. The deterministic global
    order is their concatenation."""
    import pyarrow.parquet as pq

    parts = []
    base_files = sorted(
        os.path.join(shard_dir, f)
        for f in os.listdir(shard_dir)
        if f.endswith(".parquet")
    )
    if base_files:
        t = pa.concat_tables(pq.read_table(f, columns=columns) for f in base_files)
        parts.append(t.sort_by([("pos", "ascending")]))
    gen_dirs = sorted(
        (
            int(d.split("=", 1)[1]),
            os.path.join(shard_dir, d),
        )
        for d in os.listdir(shard_dir)
        if d.startswith("gen=") and os.path.isdir(os.path.join(shard_dir, d))
    )
    for _, gd in gen_dirs:
        files = sorted(
            os.path.join(gd, f) for f in os.listdir(gd) if f.endswith(".parquet")
        )
        if files:
            t = pa.concat_tables(pq.read_table(f, columns=columns) for f in files)
            parts.append(t.sort_by([("pos", "ascending")]))
    return parts


def read_shard(out_dir: str, shard_id: int, columns=None) -> pa.Table:
    """One shard's rows in the deterministic global training order
    ``(generation, pos)`` — the reader contract write_shards /
    append_shards promise."""
    shard_dir = os.path.join(out_dir, f"shard={int(shard_id)}")
    _repair_interrupted_compaction(shard_dir)
    if not os.path.isdir(shard_dir):
        return pa.table({})
    parts = _shard_part_tables(shard_dir, columns)
    if not parts:
        return pa.table({})
    return pa.concat_tables(parts, promote_options="default")


def _repair_interrupted_compaction(shard_dir: str) -> None:
    """A compaction crash between the two renames leaves
    ``shard=K.old`` behind; restore it if the final dir is missing,
    else it is a completed swap's leftover — drop it."""
    import shutil

    old = shard_dir + ".old"
    if os.path.isdir(old):
        if not os.path.isdir(shard_dir):
            os.rename(old, shard_dir)
        else:
            shutil.rmtree(old)


def compact_shards(out_dir: str) -> dict:
    """Merge every shard's generations back into the base layout (the
    lakehouse compaction that completes the write_shards →
    append_shards lifecycle): per shard, read the deterministic
    ``(gen, pos)`` order and rewrite the shard as ONE base file with
    contiguous ``pos`` — the global row order is PRESERVED exactly, so
    a training job reading before and after compaction sees the same
    sequence. Shard-LOCAL by construction (rows never change shard):
    no cross-shard exchange at any corpus size; shards compact in
    parallel as raw Ray tasks (a per-directory rewrite the Dataset API
    cannot express). Crash-safe per shard via rename-swap + the
    ``.old`` repair protocol; re-running is a no-op (no generations
    left). Returns the updated manifest."""
    import json

    import ray

    mpath = os.path.join(out_dir, "_manifest.json")
    if not os.path.exists(mpath):
        raise FileNotFoundError(f"{out_dir} has no shard manifest")
    with open(mpath) as f:
        man = json.load(f)

    @ray.remote
    def _compact_one(shard_dir: str) -> int:
        import shutil

        import pyarrow.parquet as pq

        _repair_interrupted_compaction(shard_dir)
        if not os.path.isdir(shard_dir):
            return 0
        has_gens = any(d.startswith("gen=") for d in os.listdir(shard_dir))
        base_files = [
            f for f in os.listdir(shard_dir) if f.endswith(".parquet")
        ]
        if not has_gens and len(base_files) <= 1:
            return -1  # already compact — no rewrite
        parts = _shard_part_tables(shard_dir)
        t = pa.concat_tables(parts, promote_options="default")
        pos = np.arange(t.num_rows, dtype=np.int64)
        t = t.set_column(
            t.schema.get_field_index("pos"), "pos", pa.array(pos, pa.int64())
        )
        new_dir = shard_dir + ".compact"
        shutil.rmtree(new_dir, ignore_errors=True)
        os.makedirs(new_dir)
        pq.write_table(t, os.path.join(new_dir, "data-0.parquet"))
        old_dir = shard_dir + ".old"
        shutil.rmtree(old_dir, ignore_errors=True)
        os.rename(shard_dir, old_dir)
        os.rename(new_dir, shard_dir)
        shutil.rmtree(old_dir)
        return t.num_rows

    shard_dirs = sorted(
        os.path.join(out_dir, d)
        for d in os.listdir(out_dir)
        if d.startswith("shard=") and os.path.isdir(os.path.join(out_dir, d))
        and not (d.endswith(".old") or d.endswith(".compact"))
    )
    ray.get([_compact_one.remote(d) for d in shard_dirs])
    man["generations"] = []
    man["base_rows"] = int(man.get("rows", 0))
    man["compacted"] = man.get("compacted", 0) + 1
    with open(mpath, "w") as f:
        json.dump(man, f, sort_keys=True)
    return man


def mix_temperature(
    ds,
    group_col: str,
    id_col: str,
    alpha: float = 0.5,
    scale: int = 1_000_000,
    salt: int = 0,
    max_copies: Optional[int] = None,
):
    """Temperature-balanced multi-source mixing — the T5/mT5 recipe:
    low-resource groups (languages, domains) are up-sampled so realized
    shares follow ``n_s^alpha`` instead of the raw ``n_s``. Each group's
    boost is ``(n_max / n_s)^(1-alpha)`` (the largest group stays at
    rate 1.0), quantized to ``scale`` ppm and realized with
    :func:`repeat_weighted_batch`'s id-addressed credit rule, so any
    parallelism / resume yields the same multiset.

    Scale shape: ONE bounded per-group count aggregate (partial→final,
    O(groups) driver rows), the (group → rate) pair broadcast in the
    map closure, then a pure map-side explode — the corpus itself never
    shuffles. ``alpha=0.5`` (the default) computes the boost as a
    float64 ``sqrt`` — IEEE-correctly-rounded in both numpy and SQL, so
    the mix is SQL-mirrorable; other alphas use ``pow`` (libm-specific
    rounding: engine-exact, oracle-approximate).

    Output: input columns + ``copy_idx`` (0-based per-row copy)."""
    import ray as _ray

    from rio_cogeo_ray.stages.agg import partial_group_agg

    counts = partial_group_agg(
        ds.select_columns([group_col]), keys=[group_col], count_as="n"
    )
    blocks = [
        b
        for b in _ray.get(counts.to_arrow_refs())
        if b.num_rows and {group_col, "n"} <= set(b.column_names)
    ]
    if blocks:
        ct = pa.concat_tables(blocks).combine_chunks()
        groups = ct[group_col]
        n = ct["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        n_max = float(n.max())
        if alpha == 0.5:
            boosts = np.sqrt((float(scale) ** 2 * n_max) / n)
        else:
            boosts = float(scale) * np.power(n_max / n, 1.0 - alpha)
        nums = np.floor(boosts).astype(np.int64)
    else:
        groups, nums = None, np.zeros(0, dtype=np.int64)
    pair_ref = _ray.put((groups, nums))

    def _explode(batch: pa.Table) -> pa.Table:
        g, rate_nums = _ray.get(pair_ref)
        if g is None or batch.num_rows == 0:
            out = batch.slice(0, 0)
            return out.append_column("copy_idx", pa.array([], pa.int64()))
        idx = pc.index_in(batch[group_col].combine_chunks(), value_set=g)
        # every group was seen by the count pass (same dataset); a null
        # here would mean a nondeterministic source — rate 1.0 fallback
        idxn = idx.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
        num = np.where(idxn >= 0, rate_nums[idxn], scale)
        ids = batch[id_col].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        reps = num // scale + (
            (knuth32(ids, salt) % np.uint64(scale)) < (num % scale).view(np.uint64)
        )
        if max_copies is not None:
            # hard per-row ceiling: callers with a bounded SQL mirror
            # (generate_series) or an epoch budget pin the same cap here
            # so engine and oracle agree by construction
            reps = np.minimum(reps, max_copies)
        total = int(reps.sum())
        if total == 0:
            out = batch.slice(0, 0)
            return out.append_column("copy_idx", pa.array([], pa.int64()))
        row_idx = np.repeat(np.arange(len(ids), dtype=np.int64), reps)
        excl = np.concatenate(([0], np.cumsum(reps)[:-1]))
        copy_idx = np.arange(total, dtype=np.int64) - np.repeat(excl, reps)
        out = batch.take(pa.array(row_idx, pa.int64()))
        return out.append_column("copy_idx", pa.array(copy_idx, pa.int64()))

    return ds.map_batches(_explode, batch_format="pyarrow")


def polite_interleave(ds, host_col: str, id_col: str, n_buckets: int = 64):
    """Crawl-politeness interleave ordering: a deterministic global
    position for every row such that same-host rows are maximally
    spread — round r of the output emits each host's r-th document
    (hosts ordered lexically within a round), the classic crawl-frontier
    / fetch-scheduler discipline (Mercator-style per-host queues,
    public design). The scheduling companion to shard_shuffle's seeded
    randomization: politeness wants ANTI-clustering, not uniformity.

    Semantics are exactly two SQL window ranks, so the operator is
    hash-exact vs DuckDB: rr = ROW_NUMBER() OVER (PARTITION BY host
    ORDER BY id), pos = ROW_NUMBER() OVER (ORDER BY rr, host, id).

    Plan: exchange 1 hashes on host (one lexsort per bucket ranks all
    its hosts at once → rr); a bounded per-round count aggregate gives
    the driver one int64 per round (rounds = max docs per host — the
    skyline of the host histogram, not the corpus), whose exclusive
    cumsum broadcasts as round offsets; exchange 2 hashes on rr and
    ranks (host, id) within each round, adding the offset. Raw text
    should NOT ride through this (project to ids first, re-join by id
    — the dedup carry doctrine)."""
    import ray as _ray

    from rio_cogeo_ray.functions.hashing import hash_columns
    from rio_cogeo_ray.stages.agg import partial_group_agg

    def _route_host(t: pa.Table) -> pa.Table:
        b = (hash_columns(t, [host_col]) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("__b", pa.array(b, pa.int64()))

    def _rank_in_host(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__b"])
        if not g.num_rows:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    host_col: pa.array([], pa.string()),
                    "rr": pa.array([], pa.int64()),
                }
            )
        host = g[host_col].combine_chunks()
        enc = host.dictionary_encode()
        hcode = enc.indices.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
        ids = g[id_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = len(g)
        order = np.lexsort((ids, hcode))
        hs = hcode[order]
        new = np.ones(n, dtype=bool)
        new[1:] = hs[1:] != hs[:-1]
        starts = np.flatnonzero(new)
        seg = np.cumsum(new) - 1
        rr = np.empty(n, dtype=np.int64)
        rr[order] = np.arange(n, dtype=np.int64) - starts[seg] + 1
        return pa.table(
            {
                id_col: g[id_col].combine_chunks(),
                host_col: host.cast(pa.string()),
                "rr": pa.array(rr, pa.int64()),
            }
        )

    ranked = (
        ds.map_batches(_route_host, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(_rank_in_host, batch_format="pyarrow")
        .materialize()  # consumed twice: round counts + final ranking
    )

    counts = partial_group_agg(
        ranked.map_batches(lambda t: t.select(["rr"]), batch_format="pyarrow"),
        keys=["rr"],
        count_as="c",
    ).take_all()  # bounded: one row per round (max docs per host)
    rr_sorted = np.array(sorted(r["rr"] for r in counts), dtype=np.int64)
    by_rr = {r["rr"]: r["c"] for r in counts}
    csum = np.concatenate(
        ([0], np.cumsum([by_rr[r] for r in rr_sorted], dtype=np.int64)[:-1])
    ) if len(rr_sorted) else np.empty(0, dtype=np.int64)
    off_ref = _ray.put((rr_sorted, csum))

    def _route_rr(t: pa.Table) -> pa.Table:
        b = (
            t["rr"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.uint64)
            % np.uint64(n_buckets)
        ).astype(np.int64)
        return t.append_column("__b", pa.array(b, pa.int64()))

    def _rank_in_round(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__b"])
        if not g.num_rows:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    host_col: pa.array([], pa.string()),
                    "rr": pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                }
            )
        rrs, offs = _ray.get(off_ref)
        rr = g["rr"].combine_chunks().to_numpy(zero_copy_only=False)
        ids = g[id_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        host = g[host_col].combine_chunks()
        hcode = host.dictionary_encode().indices.fill_null(-1).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        # dictionary codes are batch-local: rank by (rr, host VALUE, id)
        # via a code remap in lexical value order
        dic = host.dictionary_encode().dictionary
        val_order = pa.compute.sort_indices(dic).to_numpy(zero_copy_only=False)
        rankmap = np.empty(len(val_order), dtype=np.int64)
        rankmap[val_order] = np.arange(len(val_order))
        # NULL hosts sort LAST (DuckDB ORDER BY default: NULLS LAST)
        hlex = np.where(hcode >= 0, rankmap[np.maximum(hcode, 0)], len(val_order))
        n = len(g)
        order = np.lexsort((ids, hlex, rr))
        rs = rr[order]
        new = np.ones(n, dtype=bool)
        new[1:] = rs[1:] != rs[:-1]
        starts = np.flatnonzero(new)
        seg = np.cumsum(new) - 1
        within = np.arange(n, dtype=np.int64) - starts[seg]
        base = offs[np.searchsorted(rrs, rs)]
        pos_sorted = base + within + 1
        pos = np.empty(n, dtype=np.int64)
        pos[order] = pos_sorted
        return pa.table(
            {
                id_col: g[id_col].combine_chunks(),
                host_col: host.cast(pa.string()),
                "rr": g["rr"].combine_chunks(),
                "pos": pa.array(pos, pa.int64()),
            }
        )

    return (
        ranked.map_batches(_route_rr, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(_rank_in_round, batch_format="pyarrow")
    )
