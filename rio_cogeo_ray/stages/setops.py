"""Distributed set operations: INTERSECT / EXCEPT (DISTINCT semantics).

SQL's bag-free set operators reduce to compositions the engine already
owns: collapse each side to its distinct key rows map-side (the
``DISTINCT``-as-degenerate-groupby doctrine — one row per distinct
value per batch crosses the wire, never the raw rows), then one
bucketed existence join decides membership:

    INTERSECT = semi(distinct(left), distinct(right))
    EXCEPT    = anti(distinct(left), distinct(right))

Both sides may be arbitrarily large: nothing is broadcast, the only
exchange is the bucketed join over the already-collapsed distinct
rows, and duplicate input rows never leave their source block.

Reference analog: rio-cogeo has no record set ops (SURVEY.md §2.1
"categories the reference does NOT have"); this fills the north-rule
generalization alongside the join family in stages/join.py.
"""

from __future__ import annotations

from typing import Sequence, Union


def distinct_rows(ds, cols: Union[str, Sequence[str]], batch_size: int = 65536):
    """Distinct rows of ``cols``: per-batch unique (map-side collapse)
    → bucketed merge with no measures. Output columns = ``cols``."""
    from rio_cogeo_ray.stages.agg import partial_group_agg

    cols = [cols] if isinstance(cols, str) else list(cols)
    out = partial_group_agg(ds, keys=cols, count_as=None, batch_size=batch_size)
    return out.map_batches(lambda t: t.select(cols), batch_format="pyarrow")


def set_op(
    left,
    right,
    on: Union[str, Sequence[str]],
    op: str,
    n_buckets: int = 64,
):
    """``INTERSECT`` / ``EXCEPT`` of two Datasets over key columns
    ``on`` (single name or composite list; int or string typed — the
    bucket hash chains both, functions/hashing.py:hash_columns).

    ``op='intersect'``: distinct keys present in BOTH sides.
    ``op='except'``: distinct LEFT keys absent from the right side.

    Left and right key columns must share names (rename upstream with
    a map_batches, as SQL renames with aliases). Returns a Dataset of
    the distinct key rows, columns = ``on``.
    """
    from rio_cogeo_ray.stages.join import bucketed_hash_join

    if op not in ("intersect", "except"):
        raise ValueError(f"op must be 'intersect' or 'except', got {op!r}")
    on_cols = [on] if isinstance(on, str) else list(on)
    dl = distinct_rows(left, on_cols)
    # the semi/anti join only ships right KEYS — but collapsing to
    # distinct first still wins: the join's shuffle sees one row per
    # distinct right key per *source batch* instead of per input row
    dr = distinct_rows(right, on_cols)
    how = "semi" if op == "intersect" else "anti"
    return bucketed_hash_join(dl, dr, on=on_cols, how=how, n_buckets=n_buckets)
