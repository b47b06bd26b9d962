"""Zone-mapped parquet layout: range-partitioned writes + pruned reads.

The lakehouse min/max-pruning pattern (Snowflake micro-partitions,
Delta/Iceberg file stats) for this engine's sinks: a corpus written
sorted-ish by a key is laid out as one directory per key RANGE, a
manifest records each zone's exact min/max (harvested from the parquet
FOOTERS — no data scan), and a range query lists only the overlapping
zone directories. Pruning happens at I/O: files outside the predicate
never leave storage, which is the difference between scanning 100 TB
and scanning the one-day slice a query actually wants.

Same doctrine as stages/ann.py's IVF index (bucket-partitioned
vectors, probed buckets only are read — ann.py:210) generalized to any
numeric sort key. Zone boundaries come from the one-pass mergeable
quantile sketch (stages/sketch.py: quantile_sketch), so the write adds
NO extra shuffle — rows map to zones with a broadcast searchsorted and
``write_parquet(partition_cols=...)`` groups them.

Reference analog: rio-cogeo's overview/IFD layout puts coarse levels
first so range readers touch few bytes (cogeo.py's ordered final
copy); a zone map is that idea for key-range scans over tables.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST = "zonemap.json"


def write_zonemapped(
    ds,
    out_dir: str,
    col: str,
    n_zones: int = 16,
    cuts: Optional[np.ndarray] = None,
) -> str:
    """Write ``ds`` as ``out_dir/data/__zone=<i>/*.parquet`` plus a
    min/max manifest. ``col`` must be an integer or float column (the
    zone key). Rebuilds replace atomically (tmp dir + os.replace) —
    the resume/append doctrine of pipelines/create.py.

    ``cuts``: explicit zone boundaries instead of the sketched
    quantiles — pass another layout's recorded cuts (``layout_cuts``)
    to CO-PARTITION two tables on the same key ranges, which makes
    :func:`zone_join` a zero-shuffle storage-partitioned join."""
    from rio_cogeo_ray.stages.sketch import quantile_sketch

    if cuts is None:
        qs = [i / n_zones for i in range(1, n_zones)]
        qt = quantile_sketch(ds, col, qs)
        cuts = np.unique(qt["value"].to_numpy(zero_copy_only=False))
    else:
        cuts = np.asarray(cuts, dtype=np.float64)

    def _assign(t: pa.Table) -> pa.Table:
        v = t[col].combine_chunks().cast(pa.float64()).to_numpy(zero_copy_only=False)
        z = np.searchsorted(cuts, v, side="right").astype(np.int64)
        return t.append_column("__zone", pa.array(z, pa.int64()))

    os.makedirs(out_dir, exist_ok=True)
    data_dir = os.path.join(out_dir, "data")
    tmp_dir = os.path.join(out_dir, ".data.tmp")
    shutil.rmtree(tmp_dir, ignore_errors=True)
    ds.map_batches(_assign, batch_format="pyarrow").write_parquet(
        tmp_dir, partition_cols=["__zone"]
    )
    # an empty input writes no fragments (and possibly no directory)
    os.makedirs(tmp_dir, exist_ok=True)
    shutil.rmtree(data_dir, ignore_errors=True)
    os.replace(tmp_dir, data_dir)

    # zone min/max from parquet FOOTER stats — metadata-only, no scan
    zones = {}
    for name in sorted(os.listdir(data_dir)):
        if not name.startswith("__zone="):
            continue
        zdir = os.path.join(data_dir, name)
        zmin, zmax = None, None
        for f in os.listdir(zdir):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(zdir, f)).metadata
            ci = md.schema.to_arrow_schema().get_field_index(col)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    continue
                zmin = st.min if zmin is None else min(zmin, st.min)
                zmax = st.max if zmax is None else max(zmax, st.max)
        if zmin is not None:
            zones[name] = [zmin, zmax]
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(
            {"col": col, "zones": zones, "cuts": [float(c) for c in cuts]}, f
        )
    return out_dir


def layout_cuts(out_dir: str) -> np.ndarray:
    """A layout's recorded zone boundaries — feed to write_zonemapped
    to co-partition a second table for :func:`zone_join`."""
    with open(os.path.join(out_dir, MANIFEST)) as f:
        return np.asarray(json.load(f)["cuts"], dtype=np.float64)


def zone_join(
    a_dir: str,
    b_dir: str,
    a_columns: Optional[Sequence[str]] = None,
    b_columns: Optional[Sequence[str]] = None,
    suffix: str = "_r",
):
    """Storage-partitioned inner join of two CO-PARTITIONED zonemap
    layouts (Iceberg/Spark's storage-partitioned join): both sides were
    written with IDENTICAL cuts (enforced from the manifests), so equal
    keys live in the same ``__zone=<i>`` directory on both sides and
    the join is a per-zone task-local pyarrow hash join over pruned
    reads — ZERO shuffle: no bucket exchange, no sort, no repartition.
    The right key column is renamed to the left's; shared non-key
    columns take ``suffix``. Zones missing on either side prune
    entirely (inner semantics)."""
    import ray.data as rd

    with open(os.path.join(a_dir, MANIFEST)) as f:
        man_a = json.load(f)
    with open(os.path.join(b_dir, MANIFEST)) as f:
        man_b = json.load(f)
    if (
        "cuts" not in man_a
        or "cuts" not in man_b
        or man_a["cuts"] != man_b["cuts"]
    ):
        # a manifest without recorded cuts (legacy layout) can never
        # prove co-partitioning — None == None must NOT pass the guard
        raise ValueError(
            "zone_join requires co-partitioned layouts: write the second "
            "table with cuts=layout_cuts(first_layout) (and rebuild any "
            "layout whose manifest predates recorded cuts)"
        )
    key_a, key_b = man_a["col"], man_b["col"]

    def _zdirs(base: str) -> dict:
        d = os.path.join(base, "data")
        return {
            name: os.path.join(d, name)
            for name in os.listdir(d)
            if name.startswith("__zone=")
        }
    za, zb = _zdirs(a_dir), _zdirs(b_dir)
    common = sorted(set(za) & set(zb))  # inner join: one-sided zones prune

    def _join_zone(batch: pa.Table) -> pa.Table:
        outs = []
        for name in batch["zone"].to_pylist():
            ta = pq.read_table(za[name], columns=list(a_columns) if a_columns else None)
            tb = pq.read_table(zb[name], columns=list(b_columns) if b_columns else None)
            if key_b != key_a:
                tb = tb.rename_columns(
                    [key_a if c == key_b else c for c in tb.column_names]
                )
            shared = (set(ta.column_names) & set(tb.column_names)) - {key_a}
            if shared:
                tb = tb.rename_columns(
                    [c + suffix if c in shared else c for c in tb.column_names]
                )
            outs.append(ta.join(tb, keys=[key_a], join_type="inner"))
        if not outs:
            return pa.table({})
        return pa.concat_tables(outs)

    if not common:
        # typed empty: derive the join schema from any file pair so
        # downstream aggregates keep their columns
        def _any_leaf(zdirs: dict) -> Optional[str]:
            for name in sorted(zdirs):
                for f in sorted(os.listdir(zdirs[name])):
                    if f.endswith(".parquet"):
                        return os.path.join(zdirs[name], f)
            return None

        fa, fb = _any_leaf(za), _any_leaf(zb)
        cols: dict = {}
        if fa is not None:
            sa = pq.read_schema(fa)
            for n in (a_columns if a_columns else sa.names):
                cols[n] = pa.array([], sa.field(n).type)
        if fb is not None:
            sb = pq.read_schema(fb)
            for n in (b_columns if b_columns else sb.names):
                out_n = key_a if n == key_b else n
                if out_n in cols:
                    out_n = out_n if out_n == key_a else out_n + suffix
                    if out_n in cols:
                        continue
                cols[out_n] = pa.array([], sb.field(n).type)
        return rd.from_arrow(pa.table(cols))
    return rd.from_items([{"zone": z} for z in common]).map_batches(
        _join_zone, batch_format="pyarrow", batch_size=1
    )


def select_zones(out_dir: str, lo, hi) -> Tuple[List[str], int]:
    """(overlapping zone dirs, total zone count) for [lo, hi] — the
    pruning decision, exposed for tests and stats logging."""
    with open(os.path.join(out_dir, MANIFEST)) as f:
        man = json.load(f)
    dirs = [
        os.path.join(out_dir, "data", name)
        for name, (zmin, zmax) in sorted(man["zones"].items())
        if zmax >= lo and zmin <= hi
    ]
    return dirs, len(man["zones"])


def read_zonemapped(
    out_dir: str, lo, hi, columns: Optional[Sequence[str]] = None
):
    """Range scan [lo, hi] over a :func:`write_zonemapped` layout:
    lists ONLY the overlapping zone directories (manifest pruning),
    then applies the exact row filter — results are identical to a
    full scan + filter, minus the I/O for non-overlapping zones."""
    import pyarrow.dataset as pads
    import ray.data as rd

    with open(os.path.join(out_dir, MANIFEST)) as f:
        col = json.load(f)["col"]
    dirs, _ = select_zones(out_dir, lo, hi)
    files = [
        os.path.join(d, f)
        for d in dirs
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    if not files:
        # nothing overlaps [lo, hi] (or the layout is empty): an EMPTY
        # Dataset, typed from any zone file when one exists so
        # downstream aggregations keep a schema
        data_dir = os.path.join(out_dir, "data")
        any_file = next(
            (
                os.path.join(r, f)
                for r, _, fs in os.walk(data_dir)
                for f in sorted(fs)
                if f.endswith(".parquet")
            ),
            None,
        )
        if any_file is not None:
            sch = pq.read_schema(any_file)
            names = list(columns) if columns else [n for n in sch.names]
            t = pa.table({n: pa.array([], sch.field(n).type) for n in names})
        else:
            t = pa.table(
                {n: pa.array([], pa.null()) for n in (columns or [])}
            )
        return rd.from_arrow(t)
    flt = (pads.field(col) >= lo) & (pads.field(col) <= hi)
    return rd.read_parquet(files, columns=list(columns) if columns else None, filter=flt)
