"""WebDataset-style tar shard sink for multimodal training corpora.

Sample-per-file tar shards are the standard loader format for
large-scale multimodal training (WebDataset / torchdata): each shard is
a plain ``shard-NNNNN.tar`` whose members are ``<key>.<ext>`` (the raw
binary payload) and ``<key>.json`` (the sample's metadata row), so any
tar-aware reader streams samples sequentially with zero index lookups.

Determinism contract (the shard_shuffle discipline): a sample's shard
is ``knuth32(id, salt) % num_shards`` and members are ordered by the
decorrelated within-shard rank ``knuth32(id, salt+1)`` (ties by id) —
both decided by the row id alone, so ANY parallelism level, block
layout, or resume produces byte-identical shard files. Tar metadata
(mtime/uid/gid) is pinned to zero for the same reason.

Scale shape: one hash(shard) exchange co-locates each shard's samples
(exactly the all-to-all any sharding semantics requires — shard count
is the granularity knob); each reduce group writes its tar
sequentially and atomically (tmp + rename), and a bounded manifest row
per shard returns to the driver. Payload bytes cross the wire once.

Stdlib ``tarfile`` only — no optional deps.
"""

from __future__ import annotations

import io
import json
import os
import tarfile
from typing import List, Optional, Sequence

import numpy as np
import pyarrow as pa

MANIFEST = "_tar_manifest.json"


def write_tar_shards(
    ds,
    out_dir: str,
    id_col: str,
    payload_col: str,
    ext: str = "bin",
    meta_cols: Optional[Sequence[str]] = None,
    num_shards: int = 8,
    salt: int = 0,
) -> dict:
    """Materialize ``ds`` as ``out_dir/shard-NNNNN.tar`` WebDataset
    shards (+ a JSON manifest). ``meta_cols`` rows are serialized as
    the per-sample ``<key>.json`` member; the key is the zero-padded
    decimal id. Returns the manifest dict."""
    from rio_cogeo_ray.stages.sketch import knuth32

    meta_cols = list(meta_cols or [])
    os.makedirs(out_dir, exist_ok=True)

    def _assign(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        sh = (knuth32(ids, salt) % np.uint64(num_shards)).astype(np.int64)
        rk = knuth32(ids, salt + 1).astype(np.int64)
        t = t.append_column("__shard", pa.array(sh, pa.int64()))
        return t.append_column("__rank", pa.array(rk, pa.int64()))

    def _write_shard(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "shard": pa.array([], pa.int64()),
                "n_samples": pa.array([], pa.int64()),
                "bytes": pa.array([], pa.int64()),
                "path": pa.array([], pa.string()),
            }
        )
        if not g.num_rows:
            return empty
        shard = int(g["__shard"][0].as_py())
        g = g.sort_by([("__rank", "ascending"), (id_col, "ascending")])
        ids = g[id_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        payloads = g[payload_col].combine_chunks()
        metas = {c: g[c].to_pylist() for c in meta_cols}
        path = os.path.join(out_dir, f"shard-{shard:05d}.tar")
        tmp = path + ".tmp"
        with tarfile.open(tmp, "w") as tf:
            for i, sid in enumerate(ids):
                key = f"{sid:016d}"
                payload = payloads[i].as_buffer().to_pybytes()
                info = tarfile.TarInfo(name=f"{key}.{ext}")
                info.size = len(payload)
                info.mtime = 0  # determinism: no wall-clock in the bytes
                tf.addfile(info, io.BytesIO(payload))
                meta = {c: metas[c][i] for c in meta_cols}
                meta[id_col] = int(sid)
                mb = json.dumps(meta, sort_keys=True).encode()
                minfo = tarfile.TarInfo(name=f"{key}.json")
                minfo.size = len(mb)
                minfo.mtime = 0
                tf.addfile(minfo, io.BytesIO(mb))
        os.replace(tmp, path)
        return pa.table(
            {
                "shard": pa.array([shard], pa.int64()),
                "n_samples": pa.array([len(ids)], pa.int64()),
                "bytes": pa.array([os.path.getsize(path)], pa.int64()),
                "path": pa.array([path], pa.string()),
            }
        )

    rows = (
        ds.map_batches(_assign, batch_format="pyarrow")
        .groupby("__shard")
        .map_groups(_write_shard, batch_format="pyarrow")
        .take_all()
    )  # bounded: one row per shard
    shards = sorted(
        (
            {
                "shard": int(r["shard"]),
                "n_samples": int(r["n_samples"]),
                "bytes": int(r["bytes"]),
                "path": os.path.basename(r["path"]),
            }
            for r in rows
        ),
        key=lambda r: r["shard"],
    )
    man = {
        "num_shards": num_shards,
        "salt": salt,
        "id_col": id_col,
        "ext": ext,
        "shards": shards,
    }
    tmp = os.path.join(out_dir, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(man, f, indent=1)
    os.replace(tmp, os.path.join(out_dir, MANIFEST))
    return man


def read_tar_shard(out_dir: str, shard: int) -> List[dict]:
    """Stream one shard back as [{'key', 'payload', 'meta'}] in stored
    order — the loader-side contract check (tests + local debugging;
    a training loader would consume the tar directly)."""
    path = os.path.join(out_dir, f"shard-{shard:05d}.tar")
    out: List[dict] = []
    with tarfile.open(path, "r") as tf:
        cur: Optional[dict] = None
        for m in tf:
            key, dot, kind = m.name.partition(".")
            data = tf.extractfile(m).read()
            if cur is None or cur["key"] != key:
                cur = {"key": key, "payload": None, "meta": None}
                out.append(cur)
            if kind == "json":
                cur["meta"] = json.loads(data)
            else:
                cur["payload"] = data
    return out
