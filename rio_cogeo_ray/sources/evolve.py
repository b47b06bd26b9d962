"""Schema-evolution reader: UNION BY NAME across parquet generations.

A long-lived corpus is written by many pipeline versions: later crawls
add columns (quality scores, token counts), early ones lack them, and
column ORDER drifts with every writer. Positional union (``ds.union``)
requires one exact schema, so the engine aligns by NAME first:

- unified schema = fields in order of FIRST appearance across sources;
- a source missing a field contributes typed nulls (exactly DuckDB's
  ``UNION ALL BY NAME`` rule);
- same-name fields with different but loss-free-promotable numeric
  types widen (int8→…→int64, float32→float64); anything else raises
  loudly — silent coercion across string/binary/int is how corpora rot.

Alignment is a per-batch map (append typed null columns + cast +
reorder — zero-copy for the already-conforming fast path), so the
union streams: no source is materialized and block boundaries are
preserved. Reference analog: rio-cogeo forwards band metadata across
dataset generations in ``cog_translate`` (cogeo.py:395-437) rather
than demanding identical profiles.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import pyarrow as pa
import pyarrow.parquet as pq

_INT_ORDER = {pa.int8(): 0, pa.int16(): 1, pa.int32(): 2, pa.int64(): 3}
_FLOAT_ORDER = {pa.float32(): 0, pa.float64(): 1}


def _promote(a: pa.DataType, b: pa.DataType, name: str) -> pa.DataType:
    if a.equals(b):
        return a
    if a in _INT_ORDER and b in _INT_ORDER:
        return a if _INT_ORDER[a] >= _INT_ORDER[b] else b
    if a in _FLOAT_ORDER and b in _FLOAT_ORDER:
        return a if _FLOAT_ORDER[a] >= _FLOAT_ORDER[b] else b
    raise TypeError(
        f"column {name!r}: incompatible types across sources ({a} vs {b}); "
        "union-by-name only widens loss-free numerics"
    )


def unified_schema(paths: Sequence[str]) -> pa.Schema:
    """Union of the sources' schemas, field order = first appearance."""
    import ray.data as rd  # noqa: F401  (kept: module is a Ray source)

    names: List[str] = []
    types: dict = {}
    for p in paths:
        sch = pq.read_schema(_first_leaf(p))
        for f in sch:
            if f.name not in types:
                names.append(f.name)
                types[f.name] = f.type
            else:
                types[f.name] = _promote(types[f.name], f.type, f.name)
    return pa.schema([(n, types[n]) for n in names])


def _first_leaf(path: str) -> str:
    import os

    if os.path.isdir(path):
        for root, _dirs, files in sorted(os.walk(path)):
            for f in sorted(files):
                if f.endswith(".parquet"):
                    return os.path.join(root, f)
        raise FileNotFoundError(f"no parquet files under {path}")
    return path


def read_union_by_name(
    paths: Sequence[str],
    columns: Optional[Sequence[str]] = None,
):
    """One streaming Dataset over every source, aligned to the unified
    schema (missing columns → typed nulls, promotable numerics widened,
    first-appearance column order). ``columns`` prunes each source's
    READ to the requested fields it actually has."""
    import ray.data as rd

    target = unified_schema(paths)
    if columns is not None:
        target = pa.schema([target.field(c) for c in columns])
    t_names = [f.name for f in target]

    parts = []
    for p in paths:
        have = set(pq.read_schema(_first_leaf(p)).names)
        cols = [c for c in t_names if c in have]

        def _align(t: pa.Table, _target=target, _names=t_names) -> pa.Table:
            out = {}
            for f in _target:
                if f.name in t.column_names:
                    col = t[f.name]
                    out[f.name] = (
                        col if col.type.equals(f.type) else col.cast(f.type)
                    )
                else:
                    out[f.name] = pa.nulls(len(t), f.type)
            return pa.table(out)

        parts.append(
            rd.read_parquet(p, columns=cols).map_batches(
                _align, batch_format="pyarrow"
            )
        )
    ds = parts[0]
    for other in parts[1:]:
        ds = ds.union(other)
    return ds
