"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json). Implementations live in
``rio_cogeo_ray/pipelines/queries.py``; this module only delegates.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (nor in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline: full tile-pyramid create() over the sf0.001
    documents table (geocode → assign → density rasterize → overview
    pyramid → manifest), returning the IFD-ordered tile index."""
    import ray.data as rd

    from rio_cogeo_ray.pipelines import create as create_mod
    from rio_cogeo_ray.pipelines.spec import plan
    from rio_cogeo_ray.state import manifest as mani

    out_dir = "/tmp/rcr_entry/pyramid"
    shutil.rmtree(out_dir, ignore_errors=True)
    spec = plan(zoom=6, overview_levels=6, tile_px=64)
    create_mod.create(
        os.path.join(SF_SMOKE, "documents.parquet"),
        out_dir,
        spec,
        source="documents",
    )
    return rd.read_parquet(os.path.join(mani.manifest_dir(out_dir), "tiles_index"))


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from rio_cogeo_ray.pipelines import queries as q

    return q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL mirrors (same column names, same op
    order) for every SQL-expressible query; see queries.py for the
    exactness doctrine and the list of rows-only ops."""
    from rio_cogeo_ray.pipelines import queries as q

    return q.oracle_sql()
