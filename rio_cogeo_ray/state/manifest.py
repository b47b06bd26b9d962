"""Per-partition lineage manifests + checkpoint-resume.

The engine analog of the reference's ordered single-file layout and its
temp-file/atomic-rename staging (rio_cogeo/cogeo.py:29-43,442-467): every
pipeline stage writes its output under ``out_dir/tiles/z={z}/`` as
Parquet, then records a manifest row per level (row counts, page totals,
file list with sizes) plus a ``level_{z}.done.json`` marker written
atomically (tmp + os.replace). A rerun verifies each marker against the
files on disk and skips completed levels — that is what
"checkpoint-resumable with per-partition lineage" means for a batch
pipeline.

The main manifest (``manifest/manifest.json``) plays the role of the
COG's IFD structure: levels listed base-zoom first (main IFD first,
cogeo.py:586-608 analog), per-level decimation factors, and the tile
index sorted ``(z desc, y, x)`` mirroring the strict offset ordering
that cog_validate asserts (cogeo.py:610-679).
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field
from typing import Dict, List, Optional

from rio_cogeo_ray import errors


@dataclass
class FileEntry:
    path: str  # relative to out_dir
    rows: int
    bytes: int


@dataclass
class LevelEntry:
    z: int
    decimation: int  # base**j relative to max zoom (1 for the base level)
    tiles: int
    pages: int
    cells: int
    files: List[FileEntry] = field(default_factory=list)
    #: fingerprint of the SOURCE corpus this level was built from (path
    #: names + sizes); a resume against a changed input must rebuild,
    #: not silently mix stale levels with fresh counts. None = unknown
    #: (in-memory Dataset input) — fingerprint check skipped.
    src_fingerprint: Optional[str] = None
    #: per-partition build METRICS (north-rule "lineage + metrics"):
    #: wall seconds this level's build took and the resulting pages/s
    #: throughput. None on markers written by older runs — resume
    #: verification ignores metrics (they describe, never gate).
    build_wall_s: Optional[float] = None
    pages_per_sec: Optional[float] = None


@dataclass
class Manifest:
    spec: Dict  # TilingSpec as a plain dict
    levels: List[LevelEntry] = field(default_factory=list)  # base zoom FIRST
    tags: Dict[str, str] = field(default_factory=dict)
    #: per-band metadata forwarding (the reference's band tags +
    #: scales/offsets, rio_cogeo/cogeo.py:395-437; pinned by reference
    #: tests/test_cogeo.py:472-488). Bands here are the grid channels:
    #: 'count' always, plus the weight column when one is configured.
    band_tags: Dict[str, Dict[str, str]] = field(default_factory=dict)
    band_scales: Dict[str, float] = field(default_factory=dict)
    band_offsets: Dict[str, float] = field(default_factory=dict)
    #: user-supplied categorical colormap (value → color), forwarded
    #: verbatim like the reference's colormap param (cogeo.py:99,345-360;
    #: tests/test_cogeo.py:503-543)
    colormap: Dict[str, str] = field(default_factory=dict)
    total_pages: int = 0
    invalid_pages: int = 0
    engine: str = "rio_cogeo_ray"
    version: int = 1

    def level(self, z: int) -> Optional[LevelEntry]:
        for lv in self.levels:
            if lv.z == z:
                return lv
        return None


def _atomic_write_json(path: str, obj: dict) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest")


def level_dir(out_dir: str, z: int) -> str:
    return os.path.join(out_dir, "tiles", f"z={z}")


def _marker_path(out_dir: str, z: int) -> str:
    return os.path.join(manifest_dir(out_dir), f"level_{z}.done.json")


def scan_level_files(out_dir: str, z: int) -> List[FileEntry]:
    """List the parquet part files of one level with row counts."""
    import pyarrow.parquet as pq

    d = level_dir(out_dir, z)
    out = []
    for name in sorted(os.listdir(d)) if os.path.isdir(d) else []:
        if not name.endswith(".parquet"):
            continue
        p = os.path.join(d, name)
        out.append(
            FileEntry(
                path=os.path.relpath(p, out_dir),
                rows=pq.ParquetFile(p).metadata.num_rows,
                bytes=os.path.getsize(p),
            )
        )
    return out


def write_level_marker(out_dir: str, entry: LevelEntry) -> None:
    _atomic_write_json(_marker_path(out_dir, entry.z), asdict(entry))


def load_level_marker(out_dir: str, z: int) -> Optional[LevelEntry]:
    p = _marker_path(out_dir, z)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        d = json.load(f)
    d["files"] = [FileEntry(**fe) for fe in d.get("files", [])]
    return LevelEntry(**d)


def verify_level_marker(
    out_dir: str, z: int, src_fingerprint: Optional[str] = None
) -> Optional[LevelEntry]:
    """Marker + on-disk files agree → the level is resumable; any
    mismatch → ResumeMismatch (caller decides to rebuild). When both
    the marker and the caller carry a source fingerprint, they must
    match — resuming over a CHANGED input corpus is a mismatch, not a
    skip (the stale-levels hazard)."""
    entry = load_level_marker(out_dir, z)
    if entry is None:
        return None
    if (
        src_fingerprint is not None
        and entry.src_fingerprint is not None
        and entry.src_fingerprint != src_fingerprint
    ):
        raise errors.ResumeMismatch(
            f"level z={z}: built from a different source corpus "
            f"({entry.src_fingerprint} != {src_fingerprint})"
        )
    on_disk = {fe.path: fe for fe in scan_level_files(out_dir, z)}
    for fe in entry.files:
        got = on_disk.get(fe.path)
        if got is None or got.rows != fe.rows:
            raise errors.ResumeMismatch(
                f"level z={z}: manifest row {fe} does not match disk {got}"
            )
    if len(on_disk) != len(entry.files):
        raise errors.ResumeMismatch(
            f"level z={z}: {len(on_disk)} files on disk, manifest lists {len(entry.files)}"
        )
    return entry


def write_manifest(out_dir: str, manifest: Manifest) -> str:
    p = os.path.join(manifest_dir(out_dir), "manifest.json")
    _atomic_write_json(p, asdict(manifest))
    return p


def load_manifest(out_dir: str) -> Manifest:
    p = os.path.join(manifest_dir(out_dir), "manifest.json")
    if not os.path.exists(p):
        raise errors.ValidationFailure(f"no manifest at {p}")
    with open(p) as f:
        d = json.load(f)
    levels = []
    for lv in d.get("levels", []):
        lv["files"] = [FileEntry(**fe) for fe in lv.get("files", [])]
        levels.append(LevelEntry(**lv))
    d["levels"] = levels
    return Manifest(**d)
