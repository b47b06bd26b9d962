"""Page-corpus sources — the engine's analog of opening the source raster
(rio_cogeo/cogeo.py:211-216).

Two sources:

- :func:`read_pages` — ``ray.data.read_parquet`` over an on-disk corpus,
  with schema validation against the mandated input shape
  (BASELINE.json input_hint) and column pruning pushed to the read.
- :func:`synth_pages` — distributed deterministic synthesis: a
  ``ray.data.range`` of ids fanned through ``map_batches(gen_pages_ids)``
  so bench-scale corpora are generated shard-parallel with zero driver
  memory (each shard depends only on its id range).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import numpy as np
import pyarrow as pa

import ray.data as rd

from rio_cogeo_ray import errors
from rio_cogeo_ray.fixtures import PAGES_SCHEMA, gen_pages_ids

#: Columns a pipeline may ask for; anything else is a schema violation.
PAGES_COLUMNS = tuple(PAGES_SCHEMA.names)


def validate_pages_schema(schema: pa.Schema, columns: Optional[Sequence[str]] = None) -> None:
    """Assert the corpus matches the mandated input shape (fixed +
    validated schema, the engine analog of the reference's pydantic
    models rio_cogeo/models.py:18-85)."""
    want = PAGES_SCHEMA
    names = columns or want.names
    for name in names:
        if schema.field(name) is None:  # pragma: no cover - field() raises
            raise errors.IncompatibleOptions(f"pages corpus missing column {name!r}")
        got = schema.field(name).type
        exp = want.field(name).type
        # accept large_* widenings of the declared types
        ok = got == exp or (
            pa.types.is_large_string(got) and pa.types.is_string(exp)
        ) or (pa.types.is_large_binary(got) and pa.types.is_binary(exp))
        if not ok:
            raise errors.IncompatibleOptions(
                f"pages column {name!r} has type {got}, expected {exp}"
            )


def read_pages(
    paths: Union[str, List[str]],
    columns: Optional[Sequence[str]] = None,
    validate: bool = True,
    **read_kwargs,
) -> rd.Dataset:
    """Open a pages corpus with column pruning pushed into the Parquet
    read (only requested columns/row-groups leave storage)."""
    ds = rd.read_parquet(paths, columns=list(columns) if columns else None, **read_kwargs)
    if validate:
        validate_pages_schema(ds.schema().base_schema, columns)
    return ds


def synth_pages(
    n: int,
    seed: int = 42,
    rows_per_block: int = 8192,
    columns: Optional[Sequence[str]] = None,
) -> rd.Dataset:
    """Deterministically synthesize an ``n``-row pages corpus as a
    streaming Dataset. Content depends only on (id, seed); any two runs,
    at any parallelism, produce the same multiset of rows."""
    parallelism = max(1, (n + rows_per_block - 1) // rows_per_block)

    def _gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = gen_pages_ids(ids, seed=seed, sort_by_url=False)
        if columns:
            t = t.select(list(columns))
        return t

    return rd.range(n, override_num_blocks=parallelism).map_batches(
        _gen, batch_format="pyarrow", batch_size=rows_per_block
    )
