"""Checkpointed stage boundaries — create()-style resume for chains.

``create()`` already fingerprints and markers every pyramid level
(state/manifest.py: write_level_marker / verify_level_marker); this
module generalizes that contract to ANY pipeline whose stages already
materialize (the web-prep FILTER → DEDUP → SCORE chain, corpus →
shards): each boundary persists as partitioned parquet under a work
dir with an atomic tmp-then-rename and a marker recording the stage
fingerprint + file inventory. A restart verifies the marker and READS
the boundary instead of recomputing everything upstream — the same
semantics as resuming a pyramid at the first stale level.

Fingerprints CHAIN: a stage's fingerprint hashes its own config onto
its upstream fingerprint, which bottoms out at the source identity
(file names + sizes, mirroring create.py:_run_fingerprint). A changed
source or any upstream config change therefore invalidates every
downstream boundary — resume never silently relabels stale data
(the ResumeMismatch doctrine, state/manifest.py:140).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from typing import Callable, Optional, Sequence, Union

import ray.data as rd


def src_fingerprint(src: Union[str, Sequence[str]]) -> str:
    """Source-corpus identity: relative file names + sizes (the
    create.py:_run_fingerprint file walk, without the spec half)."""
    paths = [src] if isinstance(src, str) else list(src)
    items = []
    for p in paths:
        if os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                for f in sorted(files):
                    fp = os.path.join(root, f)
                    items.append((os.path.relpath(fp, p), os.path.getsize(fp)))
        elif os.path.exists(p):
            items.append((os.path.basename(p), os.path.getsize(p)))
    blob = json.dumps(sorted(items), sort_keys=True)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def chain_fingerprint(upstream_fp: str, stage: str, params: dict) -> str:
    """Fingerprint of a stage = hash(upstream fp, stage name, config)."""
    blob = json.dumps([upstream_fp, stage, params], sort_keys=True, default=str)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def stage_dir(work_dir: str, stage: str) -> str:
    return os.path.join(work_dir, f"stage={stage}")


def _marker_path(work_dir: str, stage: str) -> str:
    return os.path.join(work_dir, f"{stage}.marker.json")


def verify_stage(work_dir: str, stage: str, fingerprint: str) -> Optional[dict]:
    """Marker valid ⇔ fingerprint matches AND every recorded file still
    exists with its recorded size. Returns the marker dict, else None."""
    mp = _marker_path(work_dir, stage)
    if not os.path.exists(mp):
        return None
    try:
        with open(mp) as f:
            m = json.load(f)
    except (OSError, json.JSONDecodeError):
        return None
    if m.get("fingerprint") != fingerprint:
        return None
    d = stage_dir(work_dir, stage)
    for name, size in m.get("files", []):
        fp = os.path.join(d, name)
        if not os.path.exists(fp) or os.path.getsize(fp) != size:
            return None
    return m


def stage_boundary(
    thunk: Callable[[], rd.Dataset],
    work_dir: str,
    stage: str,
    fingerprint: str,
    resume: bool = True,
) -> rd.Dataset:
    """Materialize ``thunk()`` at a checkpointed boundary.

    Valid marker + resume → the thunk NEVER runs; the boundary is read
    back from parquet (bit-stable across restarts — downstream passes
    consume identical bytes whether this run or a prior one produced
    them). Otherwise: compute, write to ``.tmp-<stage>``, atomic
    rename, write the marker, and return a read of the written files
    (reading back also FREES the upstream lineage — the boundary is
    the new read root, exactly the multi-pass materialization the
    web-prep chain needs anyway)."""
    d = stage_dir(work_dir, stage)
    if resume and verify_stage(work_dir, stage, fingerprint) is not None:
        return rd.read_parquet(d)
    t0 = time.monotonic()
    ds = thunk()
    tmp = os.path.join(work_dir, f".tmp-{stage}")
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(work_dir, exist_ok=True)
    ds.write_parquet(tmp)
    os.replace(tmp, d)
    files = sorted(
        (f, os.path.getsize(os.path.join(d, f)))
        for f in os.listdir(d)
        if not f.startswith(".")
    )
    marker = {
        "stage": stage,
        "fingerprint": fingerprint,
        "files": files,
        "wall_s": round(time.monotonic() - t0, 3),
    }
    mp = _marker_path(work_dir, stage)
    with open(mp + ".tmp", "w") as f:
        json.dump(marker, f)
    os.replace(mp + ".tmp", mp)
    return rd.read_parquet(d)
