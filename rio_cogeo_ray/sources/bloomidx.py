"""Per-file bloom-filter index: point-lookup pruning on a NON-layout key.

Zone maps (sources/zonemap.py) and z-order cells (sources/zorder.py)
prune RANGE predicates when the layout was chosen around the query key.
They are useless for point lookups on a column the layout neither sorts
nor partitions by — every file's min/max spans the whole domain. The
lakehouse answer (Delta/Iceberg bloom filters, ClickHouse skip indexes)
is a small per-FILE bloom filter of the lookup column: an ``IN``-list
query probes each file's bloom and reads only files that MIGHT contain
a key. False positives cost one extra file read; false negatives cannot
happen (build and probe share stages/join.py's splitmix64 hash family
through the ONE probe implementation, ``join.bloom_hits``).

Unlike zonemap/zorder, the index attaches to an EXISTING layout: build
is one distributed metadata-sized pass — the file list fans out as a
Ray Dataset (one task per file reads ONLY the key column), each task
emits a (file, bloom-bytes) row, and the driver persists the bounded
manifest (n_files × m_bits/8 bytes; at 100 TB that is thousands of
8 KiB blobs, not data). The data files are never rewritten or moved.

Reference analog: ``get_data_offset`` / the IFD tile-offset chain
(/root/reference/rio_cogeo/cogeo.py:706-727) — a tiny side structure
that lets a reader fetch exactly the blocks it needs.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST = "bloom_index.json"


def _leaf_files(data_dir: str) -> List[str]:
    out: List[str] = []
    for root, _dirs, files in os.walk(data_dir):
        for f in files:
            if f.endswith(".parquet"):
                out.append(os.path.join(root, f))
    return sorted(out)


def build_bloom_index(
    data_dir: str,
    key_col: str,
    m_bits: int = 1 << 16,
    k_hashes: int = 4,
) -> str:
    """Index every parquet leaf under ``data_dir``: one ``m_bits``-bit
    bloom of ``key_col`` per file, persisted as ``bloom_index.json``
    (file-relative path → hex blob). One distributed pass over the key
    column only; returns the manifest path."""
    import ray.data as rd

    from rio_cogeo_ray.stages.join import set_bloom_bits

    if m_bits % 8 or m_bits <= 0:
        # the probe recovers m from the blob's byte length — a
        # non-multiple-of-8 silently changes the modulus (false negatives)
        raise ValueError(f"m_bits must be a positive multiple of 8, got {m_bits}")
    files = _leaf_files(data_dir)
    if not files:
        raise FileNotFoundError(f"no parquet files under {data_dir}")

    def _one_file(batch: pa.Table) -> pa.Table:
        paths, blobs = [], []
        for p in batch["path"].to_pylist():
            keys = (
                pq.read_table(p, columns=[key_col])[key_col]
                .combine_chunks()
                .cast(pa.int64())
                .to_numpy(zero_copy_only=False)
            )
            bits = np.zeros(m_bits // 8, dtype=np.uint8)
            # the ONE build kernel (shared with join.build_bloom) —
            # probe goes through join.bloom_hits, same hash family
            set_bloom_bits(bits, keys, k_hashes)
            paths.append(p)
            blobs.append(bits.tobytes())
        return pa.table({"path": pa.array(paths, pa.string()), "bloom": pa.array(blobs, pa.binary())})

    rows = (
        rd.from_items([{"path": p} for p in files])
        .map_batches(_one_file, batch_format="pyarrow", batch_size=1)
        .take_all()
    )  # bounded: one row per FILE
    manifest = {
        "key_col": key_col,
        "m_bits": m_bits,
        "k_hashes": k_hashes,
        "files": {
            os.path.relpath(r["path"], data_dir): bytes(r["bloom"]).hex() for r in rows
        },
    }
    path = os.path.join(data_dir, MANIFEST)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, path)
    return path


def probe_files(data_dir: str, keys: Sequence[int]) -> List[str]:
    """Files that MIGHT contain any of ``keys`` (bloom union probe) —
    a true superset of the files that do. Exposed separately so tests
    and callers can observe the pruning decision."""
    from rio_cogeo_ray.stages.join import bloom_hits

    with open(os.path.join(data_dir, MANIFEST)) as f:
        man = json.load(f)
    ks = np.asarray(list(keys), dtype=np.int64)
    keep = []
    for rel, hexblob in sorted(man["files"].items()):
        bits = np.frombuffer(bytes.fromhex(hexblob), dtype=np.uint8)
        if bloom_hits(bits, ks, k_hashes=man["k_hashes"]).any():
            keep.append(os.path.join(data_dir, rel))
    return keep


def read_point_lookup(
    data_dir: str,
    keys: Sequence[int],
    columns: Optional[Sequence[str]] = None,
):
    """``WHERE key IN (...)`` over a bloom-indexed layout: probe the
    manifest, read ONLY the candidate files (column-pruned), then apply
    the exact ``is_in`` filter that removes bloom false positives.
    Results are identical to a full scan + filter — the index only
    removes I/O."""
    import pyarrow.compute as pc

    import ray.data as rd

    with open(os.path.join(data_dir, MANIFEST)) as f:
        man = json.load(f)
    key_col = man["key_col"]
    cols = list(columns) if columns is not None else None
    if cols is not None and key_col not in cols:
        cols = cols + [key_col]
    files = probe_files(data_dir, keys)
    key_arr = pa.array(np.asarray(list(keys), dtype=np.int64), pa.int64())
    if not files:
        # no candidate file: empty result with the real schema
        any_file = next(iter(sorted(man["files"])))
        sch = pq.read_schema(os.path.join(data_dir, any_file))
        names = cols if cols is not None else sch.names
        return rd.from_arrow(
            pa.table({n: pa.array([], sch.field(n).type) for n in names})
        )

    def _exact(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t[key_col].combine_chunks(), value_set=key_arr))

    return rd.read_parquet(files, columns=cols).map_batches(
        _exact, batch_format="pyarrow"
    )
