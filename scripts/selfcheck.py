"""Side-by-side check of every queries() entry against its oracle_sql()
via DuckDB at a given sf — the same comparison the grading driver runs
(row count + schema + order-insensitive value equality).

Usage: python scripts/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _to_pandas(res):
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    raise TypeError(type(res))


def _canon(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, ray_df, sql_df) -> str:
    import pandas as pd

    if len(ray_df) != len(sql_df):
        return f"ROWS ray={len(ray_df)} sql={len(sql_df)}"
    a, b = _canon(ray_df), _canon(sql_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA ray={list(a.columns)} sql={list(b.columns)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            if av.dtype.kind in "fc" or bv.dtype.kind in "fc":
                same = (av.astype("float64").fillna(-1e308) == bv.astype("float64").fillna(-1e308)).all()
            else:
                same = (av.astype(str) == bv.astype(str)).all()
        except Exception as e:  # noqa: BLE001
            return f"COMPARE-ERROR col={c}: {e}"
        if not same:
            bad = (av.astype(str) != bv.astype(str)) if av.dtype.kind not in "fc" else (
                av.astype("float64").fillna(-1e308) != bv.astype("float64").fillna(-1e308)
            )
            i = bad.idxmax()
            return f"VALUES col={c} first-diff row {i}: ray={av[i]!r} sql={bv[i]!r}"
    return "OK"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    qs, oq = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = 0
    for name in sorted(qs):
        if only and name not in only:
            continue
        import time

        t0 = time.time()
        try:
            ray_df = _to_pandas(qs[name](sf_dir))
        except Exception as ex:  # noqa: BLE001
            print(f"{name:20s} RAY-ERROR {type(ex).__name__}: {ex}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oq:
            print(f"{name:20s} rows-only rows={len(ray_df)} ({dt:.1f}s)")
            continue
        try:
            sql_arrow = con.execute(oq[name]).arrow()
            sql_df = sql_arrow.to_pandas()
        except Exception as ex:  # noqa: BLE001
            print(f"{name:20s} SQL-ERROR {type(ex).__name__}: {ex}")
            failures += 1
            continue
        # Driver-hash hazard the pandas compare below forgives: DuckDB
        # SUM(BIGINT) silently widens to HUGEINT (arrow decimal128),
        # which the grading driver's value-hash does NOT equate with
        # the engine's int64 (r4 pareto_customers red row). Fail loudly
        # here so the oracle SQL gets an explicit outer CAST.
        huge = [f.name for f in sql_arrow.schema if str(f.type) == "decimal128(38, 0)"]
        small_dec = [
            f.name
            for f in sql_arrow.schema
            if "decimal" in str(f.type) and str(f.type) != "decimal128(38, 0)"
        ]
        if huge:
            print(f"{name:20s} FAIL oracle emits HUGEINT (add outer CAST AS BIGINT): {huge}")
            failures += 1
            continue
        if small_dec:
            # driver-green precedent exists (price_quantiles) but note it
            print(f"{name:20s} NOTE small-decimal oracle columns: {small_dec}")
        verdict = compare(name, ray_df, sql_df)
        status = "ok" if verdict == "OK" else "FAIL"
        print(f"{name:20s} {status} rows={len(ray_df)} ({dt:.1f}s) {verdict if verdict != 'OK' else ''}")
        if verdict != "OK":
            failures += 1
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
