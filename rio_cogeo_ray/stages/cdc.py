"""Change-data-capture MERGE: apply a delta stream to a snapshot.

The lakehouse ``MERGE INTO`` staple (Delta/Iceberg/Hudi upsert
semantics) as a Ray Data composition: every key touched by the delta
loses its snapshot row; the per-key WINNING delta row (highest
``seq_col``) is re-inserted iff its op is an upsert. Deletes on absent
keys are no-ops; upserts on absent keys are inserts — exactly SQL's

    SELECT cols FROM snapshot WHERE key NOT IN (SELECT key FROM delta)
    UNION ALL
    SELECT cols FROM winners WHERE op = 'U'

Scale shape: CDC deltas are small next to the snapshot they amend (a
day's churn vs years of state), so the default path BROADCASTS the
winner key set (``ray.put`` once, ``pc.is_in`` per batch) and the
snapshot never enters an exchange — one streaming anti-filter pass,
zero shuffle of the big side (the decontam doctrine, stages/dedup.py).
``broadcast=False`` switches to a bucketed anti join for deltas too
large to hold in one object (both sides shuffle by key hash once).

No reference analog (rio-cogeo snapshots are immutable COGs); this is
the corpus-maintenance op the incremental shard appender
(stages/shard.py: append_shards) needs when a re-crawl REPLACES pages
instead of only adding them.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray


class _AntiFilter:
    """Actor callable: drop rows whose key is in the broadcast set."""

    def __init__(self, keys_ref, on: str):
        self.keys = ray.get(keys_ref) if isinstance(keys_ref, ray.ObjectRef) else keys_ref
        self.on = on

    def __call__(self, t: pa.Table) -> pa.Table:
        if not t.num_rows or not len(self.keys):
            return t
        hit = pc.is_in(t[self.on].combine_chunks(), value_set=self.keys)
        return t.filter(pc.invert(hit))


def merge_upsert(
    snapshot,
    delta,
    on: str,
    op_col: str = "op",
    seq_col: Optional[str] = None,
    upsert_op: str = "U",
    broadcast: bool = True,
    n_buckets: int = 64,
):
    """MERGE a delta of (key, op, [seq], payload…) rows into a snapshot.

    ``delta`` must carry ``on``, ``op_col`` and (same-named) payload
    columns for every snapshot column; ``seq_col`` orders multiple
    delta rows per key (highest wins — callers make it unique per key,
    e.g. a monotone change-log offset, or the winner is ambiguous).
    Returns a Dataset with exactly the snapshot's schema.
    """
    from rio_cogeo_ray.stages.agg import latest_by

    out_cols = snapshot.schema().names
    win = latest_by(delta, [on], [seq_col]) if seq_col is not None else delta

    if broadcast:
        # winners are ≤ one row per touched key — the small side by
        # contract; distinct-reduced already, gathered once
        wblocks = [b for b in ray.get(win.to_arrow_refs()) if b.num_rows]
        if wblocks:
            wt = pa.concat_tables(wblocks, promote_options="default").combine_chunks()
            keys = wt[on].combine_chunks()
        else:  # empty delta: no touched keys, the snapshot passes whole
            return snapshot
        keys_ref = ray.put(keys)
        # autoscaling pool (min 1): a fixed-size pool can reserve every
        # CPU of a small cluster and starve its own upstream tasks
        survivors = snapshot.map_batches(
            _AntiFilter,
            fn_constructor_args=(keys_ref, on),
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
        ups = wt.filter(pc.equal(wt[op_col], upsert_op)).select(out_cols)
        return survivors.union(ray.data.from_arrow(ups))

    from rio_cogeo_ray.stages.join import bucketed_hash_join

    keys_ds = win.map_batches(
        lambda t: t.select([on]), batch_format="pyarrow"
    )
    survivors = bucketed_hash_join(
        snapshot, keys_ds, on=on, how="anti", n_buckets=n_buckets
    )
    ups = win.map_batches(
        lambda t: t.filter(pc.equal(t[op_col], upsert_op)).select(out_cols),
        batch_format="pyarrow",
    )
    return survivors.union(ups)
