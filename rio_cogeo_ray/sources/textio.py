"""Multi-format document ingestion / export — the source-format layer
beside the parquet reader (sources/pages.py), for corpora that arrive
as JSONL or CSV (the common interchange shapes of webtext dumps).

Scale notes:

- Parquet is the performance path: column pruning and row-group
  filters push into the read. JSONL/CSV have no column pushdown — the
  whole record is parsed, then pruned immediately after (documented,
  and the reason ``to_parquet`` conversion is the first step of any
  recurring pipeline over text dumps).
- All readers return the same Arrow schema for the same logical table,
  so every downstream operator is format-agnostic.
- Export (``write_jsonl``) streams block-parallel via the Dataset
  sink; one file per block, resumable at the directory level.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Union

import pyarrow as pa

import ray.data as rd

#: Canonical dtypes for the documents table (TESTDATA.md); readers cast
#: lossless-parseable columns (CSV int widths etc.) to these.
DOCUMENTS_TYPES = {
    "doc_id": pa.int64(),
    "text": pa.string(),
    "lang": pa.string(),
    "source": pa.string(),
    "n_chars": pa.int64(),
}


def _normalize(ds: rd.Dataset, columns: Optional[Sequence[str]]) -> rd.Dataset:
    """Prune + cast to the canonical documents schema (format-agnostic
    downstream contract)."""
    cols = list(columns) if columns else None

    def _cast(t: pa.Table) -> pa.Table:
        if cols:
            t = t.select(cols)
        arrays, names = [], []
        for f in t.schema:
            want = DOCUMENTS_TYPES.get(f.name)
            col = t[f.name]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if want is not None and col.type != want:
                col = col.cast(want)
            arrays.append(col)
            names.append(f.name)
        return pa.table(dict(zip(names, arrays)))

    return ds.map_batches(_cast, batch_format="pyarrow")


def read_documents(
    paths: Union[str, List[str]],
    format: str = "parquet",
    columns: Optional[Sequence[str]] = None,
    **read_kwargs,
) -> rd.Dataset:
    """Open a documents corpus in any supported format with one schema
    contract. ``parquet`` prunes at the read (the scale path); ``jsonl``
    and ``csv`` parse whole records then prune (convert recurring
    inputs to parquet first)."""
    if format == "parquet":
        return rd.read_parquet(
            paths, columns=list(columns) if columns else None, **read_kwargs
        )
    if format in ("jsonl", "csv"):
        # a directory with no data files (e.g. the export of an empty
        # dataset) reads as an empty untyped corpus instead of crashing
        if isinstance(paths, str) and os.path.isdir(paths) and not any(
            fs for _, _, fs in os.walk(paths)
        ):
            return rd.from_arrow(
                pa.table({c: pa.array([], pa.null()) for c in (columns or [])})
            )
    if format == "jsonl":
        return _normalize(rd.read_json(paths, **read_kwargs), columns)
    if format == "csv":
        return _normalize(rd.read_csv(paths, **read_kwargs), columns)
    raise ValueError(f"unknown format {format!r} (parquet|jsonl|csv)")


def write_jsonl(ds: rd.Dataset, path: str) -> None:
    """Block-parallel JSONL export (one file per block under ``path``).
    An empty dataset still yields a readable (empty) directory."""
    ds.write_json(path)
    os.makedirs(path, exist_ok=True)
