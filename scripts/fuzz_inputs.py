"""Degenerate-input fuzz for every queries() entry — the robustness
gate behind the round-3 "survive zero-row inputs" pass.

Builds three derived table sets from a source sf dir and runs ALL
queries against each, reporting crashes (row counts are NOT compared —
degenerate inputs have no oracle; the point is that the engine flows):

- empty:  zero-row copies of every table (the empty-shard case; a
          transformed empty Dataset has NO schema in Ray)
- nulls:  10% NULL text/lang in documents (web corpora carry nulls)
- one:    single-row tables (the boundary between empty and plural)

Expected failures (deliberate contracts, counted separately): fit ops
raise a named ValueError on empty input — pca_embed, quality_classifier.

Usage: python scripts/fuzz_inputs.py [src_sf_dir] [mode ...]
       modes default to: empty nulls one
"""

from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXPECTED_EMPTY_FAILS = {"pca_embed", "quality_classifier"}


def build(mode: str, src: str, dst: str) -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)
    for f in glob.glob(os.path.join(src, "*.parquet")):
        name = os.path.basename(f)
        if mode == "empty":
            t = pq.read_schema(f).empty_table()
        elif mode == "one":
            t = pq.read_table(f).slice(0, 1)
        elif mode == "nulls":
            t = pq.read_table(f)
            if name == "documents.parquet":
                rng = np.random.RandomState(7)
                mask = rng.rand(t.num_rows) < 0.1
                for col in ("text", "lang"):
                    if col in t.column_names:
                        arr = t[col].combine_chunks()
                        arr = pc.if_else(
                            pa.array(~mask), arr, pa.nulls(t.num_rows, arr.type)
                        )
                        t = t.set_column(t.schema.get_field_index(col), col, arr)
        else:
            raise ValueError(mode)
        pq.write_table(t, os.path.join(dst, name))
    return dst


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    modes = sys.argv[2:] or ["empty", "nulls", "one"]

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    import __ray_entry__ as entry

    qs = entry.queries()
    rc = 0
    for mode in modes:
        dst = build(mode, src, f"/tmp/rcr_fuzz_{mode}")
        unexpected, expected = [], []
        for name, fn in qs.items():
            try:
                r = fn(dst)
                try:
                    r.count()
                except AttributeError:
                    _ = getattr(r, "num_rows", None) or len(r)
            except Exception as ex:
                row = (name, type(ex).__name__, str(ex).splitlines()[0][:120])
                if mode == "empty" and name in EXPECTED_EMPTY_FAILS:
                    expected.append(row)
                else:
                    unexpected.append(row)
        print(
            f"[{mode}] {len(qs)} queries: "
            f"{len(unexpected)} unexpected failures, "
            f"{len(expected)} expected (named fit-op errors)"
        )
        for row in unexpected:
            print("  FAIL", *row)
        rc |= bool(unexpected)
    ray.shutdown()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
