"""Metadata-only table statistics from parquet FOOTERS.

``COUNT(*)``, ``MIN(key)``, ``MAX(key)`` and byte totals answered
without a single data page leaving storage: every parquet footer
already records per-row-group row counts and exact column min/max
statistics (for integer/float physical types), so the engine lists the
files, fans the FOOTER reads out as a Ray Dataset over the file list
(one small metadata GET per file — at 100 TB that is thousands of
footers, not terabytes of pages), and reduces the per-file rows with
the ordinary partial→final aggregate.

This is the read-side twin of sources/zonemap.py (which HARVESTS the
same footer stats at write time): zonemap proves writes can record
pruning metadata for free; footer_stats proves whole-table aggregates
can be served from it. Reference analog: rio-cogeo's ``cog_info``
reads only TIFF IFD metadata to report size/zoom/IFD stats
(/root/reference/rio_cogeo/cogeo.py:730-853) — never the pixel data.

Exactness contract: parquet min/max statistics are EXACT for integer
physical types (no truncation), so the oracle comparison against SQL
``MIN``/``MAX`` is exact; files missing statistics raise loudly rather
than silently degrading to a scan.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import pyarrow as pa
import pyarrow.parquet as pq


def _expand(path: str) -> List[str]:
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    return [path]


def _file_stats(table: str, path: str, key_col: Optional[str]) -> dict:
    """One footer read → (rows, bytes, exact key min/max)."""
    md = pq.ParquetFile(path).metadata
    kmin = kmax = None
    if key_col is not None:
        j = next(
            (
                i
                for i in range(md.num_columns)
                if md.schema.column(i).name == key_col
            ),
            None,
        )
        if j is None:
            raise KeyError(f"{path}: no column {key_col!r} in footer schema")
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            if rg.num_rows == 0:
                # a zero-row row group legitimately has no statistics
                # and contributes nothing to min/max
                continue
            st = rg.column(j).statistics
            if st is None or not st.has_min_max:
                raise ValueError(
                    f"{path} row group {g}: no min/max statistics for "
                    f"{key_col!r} — footer-only aggregate would be wrong"
                )
            kmin = st.min if kmin is None else min(kmin, st.min)
            kmax = st.max if kmax is None else max(kmax, st.max)
    return {
        "tbl": table,
        "n_rows": int(md.num_rows),
        "n_bytes": int(
            sum(
                md.row_group(g).total_byte_size
                for g in range(md.num_row_groups)
            )
        ),
        "key_min": kmin,
        "key_max": kmax,
    }


def footer_stats(
    specs: Sequence[Tuple[str, str, Optional[str]]],
    n_buckets: int = 8,
):
    """Per-table (n_rows, n_bytes, key_min, key_max) from footers only.

    ``specs``: (table_name, path_or_dir, key_col) triples; ``key_col``
    None skips min/max for that table. Each FILE is one Ray work item
    (from_items → map_batches), so a 100 TB table with 50k files fans
    its 50k footer GETs across the cluster; the reduce is the standard
    partial→final aggregate over table names (bounded rows). Returns a
    Dataset with one row per table, sorted by table name.
    """
    import ray.data as rd

    from rio_cogeo_ray.stages.agg import partial_group_agg

    items = [
        {"tbl": t, "path": f, "key": k}
        for (t, p, k) in specs
        for f in _expand(p)
    ]

    def _stats_batch(batch: pa.Table) -> pa.Table:
        rows = [
            _file_stats(t, p, k)
            for t, p, k in zip(
                batch["tbl"].to_pylist(),
                batch["path"].to_pylist(),
                batch["key"].to_pylist(),
            )
        ]
        return pa.table(
            {
                "tbl": pa.array([r["tbl"] for r in rows], pa.string()),
                "n_rows": pa.array([r["n_rows"] for r in rows], pa.int64()),
                "n_bytes": pa.array([r["n_bytes"] for r in rows], pa.int64()),
                "key_min": pa.array([r["key_min"] for r in rows], pa.int64()),
                "key_max": pa.array([r["key_max"] for r in rows], pa.int64()),
            }
        )

    per_file = rd.from_items(items).map_batches(
        _stats_batch, batch_format="pyarrow"
    )
    out = partial_group_agg(
        per_file,
        keys=["tbl"],
        sum_cols=["n_rows", "n_bytes"],
        min_cols=["key_min"],
        max_cols=["key_max"],
        count_as="n_files",
        n_buckets=n_buckets,
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "tbl": t["tbl"],
                "n_rows": t["sum_n_rows"],
                "n_bytes": t["sum_n_bytes"],
                "key_min": t["min_key_min"],
                "key_max": t["max_key_max"],
                "n_files": t["n_files"],
            }
        ),
        batch_format="pyarrow",
    ).sort("tbl")
