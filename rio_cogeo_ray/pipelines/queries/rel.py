"""Relational (TPC-H-style) queries: joins, rollups, CDC, storage-layout scans.

Mechanically split from the former pipelines/queries.py (scripts/
split_queries.py); node order preserved.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd

from rio_cogeo_ray import fixtures
from rio_cogeo_ray.functions import tms
from rio_cogeo_ray.stages import agg, ann, assign, dedup, knn, rasterize, text, window
from rio_cogeo_ray.stages import join as join_mod
from rio_cogeo_ray.pipelines.queries._common import COPURCHASE_K, PRICE_BANDS, _docs, _read


def q_zorder_scan(sf_dir: str):
    """Z-order-pruned 2-D range scan (sources/zorder.py): lineitem
    laid out by Morton-interleaved quantile bins of (l_extendedprice,
    l_quantity) — built once per sf_dir under /tmp — then a
    conjunctive range predicate on BOTH columns reads only the cells
    whose footer-stats rectangle intersects it (a 1-D zonemap can
    prune on one of the two at best). Exact row filter on top: results
    identical to a full scan + filter."""
    import hashlib

    from rio_cogeo_ray.sources import zorder
    from rio_cogeo_ray.stages.agg import partial_group_agg

    li_path = os.path.join(sf_dir, "lineitem.parquet")
    st = os.stat(li_path)
    tag = hashlib.sha256(
        f"{li_path}:{st.st_size}:{st.st_mtime_ns}".encode()
    ).hexdigest()[:12]
    zdir = f"/tmp/rcr_zorder/{tag}"
    if not os.path.exists(os.path.join(zdir, zorder.MANIFEST)):
        zorder.write_zordered(
            _read(li_path, ["l_extendedprice", "l_quantity", "l_returnflag"]),
            zdir,
            ["l_extendedprice", "l_quantity"],
            bits=3,
        )
    ds = zorder.read_zordered(
        zdir,
        {"l_extendedprice": (20000, 40000), "l_quantity": (10, 20)},
        columns=["l_extendedprice", "l_quantity", "l_returnflag"],
    )
    out = partial_group_agg(
        ds.map_batches(
            lambda t: pa.table(
                {
                    "l_returnflag": t["l_returnflag"],
                    "qty": t["l_quantity"].combine_chunks().cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ),
        keys=["l_returnflag"],
        sum_cols=["qty"],
        count_as="n",
    )
    return out


SQL_ZORDER_SCAN = """
SELECT l_returnflag, CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
WHERE l_extendedprice BETWEEN 20000 AND 40000
  AND l_quantity BETWEEN 10 AND 20
GROUP BY l_returnflag
"""


def q_salted_join(sf_dir: str):
    """Hot-key SALTED hash join (stages/join.py:salted_hash_join): a
    deliberately skewed key (80 % of docs share key 0) would flood one
    reduce bucket in the plain bucketed join; the salted join detects
    hot keys with one count pass, salts left rows deterministically,
    replicates the hot keys' right rows once per salt, and joins on
    the composite (key, salt) — result identical to the unsalted
    join."""
    from rio_cogeo_ray.stages.join import salted_hash_join

    ds = _docs(sf_dir, ["doc_id"])

    def _skew(t: pa.Table) -> pa.Table:
        d = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        k = np.where(d % 5 < 4, 0, d % 53).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"].combine_chunks(),
                "k": pa.array(k, pa.int64()),
            }
        )

    left = ds.map_batches(_skew, batch_format="pyarrow")
    dim = rd.from_arrow(
        pa.table(
            {
                "k": pa.array(np.arange(53, dtype=np.int64), pa.int64()),
                "weight": pa.array(
                    np.arange(53, dtype=np.int64) * 7 + 1, pa.int64()
                ),
            }
        )
    )
    return salted_hash_join(
        left, dim, on="k", salt_source_col="doc_id", hot_threshold=50,
        n_salts=8,
    )


SQL_SALTED_JOIN = """
WITH d AS (SELECT doc_id,
           CASE WHEN doc_id % 5 < 4 THEN 0 ELSE doc_id % 53 END AS k
           FROM documents),
dim AS (SELECT range AS k, range * 7 + 1 AS weight FROM range(0, 53))
SELECT d.doc_id, d.k, dim.weight FROM d JOIN dim ON d.k = dim.k
"""


def q_copurchase(sf_dir: str):
    """Frequent co-purchased part pairs (market-basket mining): parts
    sharing ≥2 orders, top-25 by shared-order count. Pure reuse of the
    EXACT set-overlap machinery (stages/dedup.py:ranking_overlap_join
    — entity=part, item=order): one item-bucket pass generates
    triangular pairs per order run, partial→final pair sums, filter,
    bounded sort. Baskets are small so the per-run quadratic is
    bounded by basket size, never corpus size."""
    from rio_cogeo_ray.stages.dedup import ranking_overlap_join

    li = _read(
        os.path.join(sf_dir, "lineitem.parquet"), ["l_partkey", "l_orderkey"]
    )
    # distinct (part, order): a part may appear on several lines of one
    # order and must count once
    distinct = agg.partial_group_agg(
        li, keys=["l_partkey", "l_orderkey"], count_as=None
    )
    pairs = ranking_overlap_join(
        distinct, entity_col="l_partkey", item_col="l_orderkey", min_overlap=2
    )
    return pairs.sort(
        ["overlap", "ua", "ub"], descending=[True, False, False]
    ).limit(COPURCHASE_K)


SQL_COPURCHASE = f"""
WITH d AS (SELECT DISTINCT l_partkey AS p, l_orderkey AS o FROM lineitem),
pr AS (SELECT a.p AS ua, b.p AS ub, CAST(COUNT(*) AS BIGINT) AS overlap
       FROM d a JOIN d b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2)
SELECT ua, ub, overlap FROM pr WHERE overlap >= 2
ORDER BY overlap DESC, ua, ub LIMIT {COPURCHASE_K}
"""


def q_incr_agg(sf_dir: str):
    """Incremental aggregate maintenance (stages/agg.py:
    combine_aggregates — the materialized-view merge): a 'prior
    snapshot' aggregate (doc_id < median split) combines with the
    'new crawl' delta aggregate into the aggregate of the union — no
    corpus rescan, cost O(aggregate rows). The oracle is simply the
    full-corpus aggregate, so the merge is held to exactness."""
    ds = _docs(sf_dir, ["doc_id", "lang", "n_chars"])
    cut = 250  # deterministic split: 'yesterday' vs 'today'
    prior = agg.partial_group_agg(
        ds.filter(expr=f"doc_id < {cut}"),
        keys=["lang"], sum_cols=["n_chars"], min_cols=["doc_id"],
        max_cols=["doc_id"], count_as="n",
    )
    delta = agg.partial_group_agg(
        ds.filter(expr=f"doc_id >= {cut}"),
        keys=["lang"], sum_cols=["n_chars"], min_cols=["doc_id"],
        max_cols=["doc_id"], count_as="n",
    )
    return agg.combine_aggregates(
        [prior, delta],
        keys=["lang"], sum_cols=["n_chars"], min_cols=["doc_id"],
        max_cols=["doc_id"], count_as="n",
    )


SQL_INCR_AGG = (
    "SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars, "
    "MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id, "
    "CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang"
)


def q_footer_stats(sf_dir: str):
    """Whole-table COUNT/MIN/MAX served from parquet FOOTERS only
    (sources/footers.py): one metadata GET per file fanned out as a
    Ray Dataset over the file list — no data page is ever read. At
    100 TB this is thousands of footer reads, not terabytes of scan;
    exact because parquet integer min/max statistics are exact."""
    from rio_cogeo_ray.sources.footers import footer_stats

    specs = [
        ("documents", os.path.join(sf_dir, "documents.parquet"), "doc_id"),
        ("events", os.path.join(sf_dir, "events.parquet"), "event_id"),
        ("lineitem", os.path.join(sf_dir, "lineitem.parquet"), "l_orderkey"),
    ]
    return footer_stats(specs).select_columns(
        ["tbl", "n_rows", "key_min", "key_max"]
    )


SQL_FOOTER_STATS = (
    "SELECT 'documents' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows, "
    "MIN(doc_id) AS key_min, MAX(doc_id) AS key_max FROM documents "
    "UNION ALL SELECT 'events', CAST(COUNT(*) AS BIGINT), "
    "MIN(event_id), MAX(event_id) FROM events "
    "UNION ALL SELECT 'lineitem', CAST(COUNT(*) AS BIGINT), "
    "MIN(l_orderkey), MAX(l_orderkey) FROM lineitem"
)


def q_lineitem_stats(sf_dir: str):
    """TPC-H Q1-shaped grouped aggregate (generic shuffle plumbing)."""
    ds = _read(
        os.path.join(sf_dir, "lineitem.parquet"),
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def _prep(t: pa.Table) -> pa.Table:
        q = t["l_quantity"].combine_chunks().to_numpy(zero_copy_only=False)
        return t.append_column("qty", pa.array(q.astype(np.int64), pa.int64()))

    return agg.partial_group_agg(
        ds.map_batches(_prep, batch_format="pyarrow"),
        keys=["l_returnflag", "l_linestatus"],
        sum_cols=["qty"],
        min_cols=["l_extendedprice"],
        max_cols=["l_extendedprice"],
        count_as="n",
    )


SQL_LINEITEM_STATS = (
    "SELECT l_returnflag, l_linestatus, "
    "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, "
    "MIN(l_extendedprice) AS min_l_extendedprice, "
    "MAX(l_extendedprice) AS max_l_extendedprice, "
    "CAST(COUNT(*) AS BIGINT) AS n "
    "FROM lineitem GROUP BY l_returnflag, l_linestatus"
)


def q_orders_by_segment(sf_dir: str):
    """Broadcast dimension join: orders ⋈ customer (small side shipped
    once via ray.put, index built per actor)."""
    orders = _read(os.path.join(sf_dir, "orders.parquet"), ["o_custkey", "o_totalprice"])
    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_mktsegment"]
    ).rename_columns(["o_custkey", "c_mktsegment"])
    joined = join_mod.broadcast_join(orders, cust, on="o_custkey", concurrency=2)
    return agg.partial_group_agg(
        joined, keys=["c_mktsegment"], min_cols=["o_totalprice"],
        max_cols=["o_totalprice"], count_as="n",
    )


SQL_ORDERS_BY_SEGMENT = (
    "SELECT c_mktsegment, MIN(o_totalprice) AS min_o_totalprice, "
    "MAX(o_totalprice) AS max_o_totalprice, CAST(COUNT(*) AS BIGINT) AS n "
    "FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment"
)


def q_lineitem_orders(sf_dir: str):
    """Large-large bucketed hash join: lineitem ⋈ orders on orderkey."""
    li = _read(os.path.join(sf_dir, "lineitem.parquet"), ["l_orderkey", "l_linenumber"])
    orders = _read(os.path.join(sf_dir, "orders.parquet"), ["o_orderkey", "o_orderpriority"]).map_batches(
        lambda t: t.rename_columns(["l_orderkey", "o_orderpriority"]),
        batch_format="pyarrow",
    )
    joined = join_mod.bucketed_hash_join(li, orders, on="l_orderkey", n_buckets=16)
    return agg.partial_group_agg(joined, keys=["o_orderpriority"], count_as="n")


SQL_LINEITEM_ORDERS = (
    "SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n "
    "FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY o_orderpriority"
)


def q_asof_purchase_view(sf_dir: str):
    """As-of join: for each purchase event, the most recent view event
    (same user, view_ts <= purchase ts). Bucketed-by-user merge_asof —
    the time-series lookup operator; DuckDB ASOF JOIN is the oracle."""
    ev = os.path.join(sf_dir, "events.parquet")

    def _typed(kind):
        def _f(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            t = t.filter(pc.equal(t["event_type"], kind))
            return pa.table(
                {
                    "user_id": t["user_id"].combine_chunks(),
                    "ts": t["ts"].combine_chunks().cast(pa.int64()),
                    "event_id": t["event_id"].combine_chunks(),
                }
            )

        return _f

    base_cols = ["event_id", "user_id", "ts", "event_type"]
    purchases = _read(ev, base_cols).map_batches(
        _typed("purchase"), batch_format="pyarrow"
    )
    views = _read(ev, base_cols).map_batches(
        _typed("view"), batch_format="pyarrow"
    ).drop_columns(["event_id"])
    joined = join_mod.asof_join(purchases, views, on="ts", by="user_id")

    def _out(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"].combine_chunks().cast(pa.int64()),
                "user_id": t["user_id"].combine_chunks().cast(pa.int64()),
                "view_ts": t["ts_r"].combine_chunks().cast(pa.int64()),
            }
        )

    return joined.map_batches(_out, batch_format="pyarrow")


SQL_ASOF_PURCHASE_VIEW = (
    "WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts FROM events "
    "WHERE event_type = 'purchase'), "
    "v AS (SELECT user_id, epoch_us(ts) AS ts FROM events WHERE event_type = 'view') "
    "SELECT p.event_id, p.user_id, v.ts AS view_ts "
    "FROM p ASOF JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts"
)


def q_price_bands(sf_dir: str):
    """Broadcast RANGE join (interval containment — the join flavor Ray
    Data lacks natively): each order resolves to its [lo, hi) price band
    via one searchsorted against the broadcast band table, then a
    partial→final aggregate per band. Cents quantized pre-shuffle so the
    sum is exact int64."""
    bands = pa.table(
        {
            "band": pa.array([b[0] for b in PRICE_BANDS], pa.string()),
            "lo": pa.array([b[1] for b in PRICE_BANDS], pa.float64()),
            "hi": pa.array([b[2] for b in PRICE_BANDS], pa.float64()),
        }
    )
    ds = _read(os.path.join(sf_dir, "orders.parquet"), ["o_totalprice"])

    def _cents(t: pa.Table) -> pa.Table:
        p = t["o_totalprice"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_totalprice": t["o_totalprice"].combine_chunks(),
                "cents": pa.array(
                    np.floor(p * 100.0 + 0.5).astype(np.int64), pa.int64()
                ),
            }
        )

    joined = join_mod.broadcast_range_join(
        ds.map_batches(_cents, batch_format="pyarrow"),
        bands, value_col="o_totalprice", concurrency=2,
    )
    agged = agg.partial_group_agg(
        joined, keys=["band"], sum_cols=["cents"], count_as="n"
    )
    return agged


SQL_PRICE_BANDS = (
    "SELECT b.band, CAST(SUM(CAST(FLOOR(o.o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents, "
    "CAST(COUNT(*) AS BIGINT) AS n FROM orders o JOIN (VALUES "
    + ", ".join(f"('{b}', {lo!r}, {hi!r})" for b, lo, hi in PRICE_BANDS)
    + ") AS b(band, lo, hi) ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi "
    "GROUP BY b.band"
)


def q_profile_lineitem(sf_dir: str):
    """One-pass column profile of lineitem numerics (stages/profile.py):
    row count, null count, exact min/max per column — the know-your-
    corpus step. SQL mirror: per-column COUNT / MIN / MAX."""
    from rio_cogeo_ray.stages.profile import profile_columns

    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    ds = _read(os.path.join(sf_dir, "lineitem.parquet"), cols)
    return profile_columns(ds, cols)


SQL_PROFILE_LINEITEM = " UNION ALL ".join(
    f"SELECT '{c}' AS column, CAST(COUNT(*) AS BIGINT) AS n, "
    f"CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS nulls, "
    f"CAST(MIN({c}) AS DOUBLE) AS min, CAST(MAX({c}) AS DOUBLE) AS max "
    f"FROM lineitem"
    for c in ("l_quantity", "l_extendedprice", "l_discount")
)


def q_revenue_by_nation(sf_dir: str):
    """TPC-H-Q5-flavored COMPOSED pipeline — the full warehouse join-chain
    shape, expressed Ray-Data-first with exactly one all-to-all exchange:

      lineitem (fact; pruned to 3 columns at the read; revenue quantized
      to exact int64 PRE-shuffle, so only (orderkey, rev) ever moves)
      ⋈ orders (fact) via ``bucketed_hash_join`` on orderkey — the one
      shuffle — then customer→nation resolved by two CHAINED broadcast
      lookups (each dimension shipped once via ``ray.put``, indexed once
      per actor, never re-shipped per batch), then a partial→final
      grouped sum by nation name.

    Revenue = cents(l_extendedprice) · (100 − pct(l_discount)): an exact
    integer in price-cents × discount-complement-percent units, so the
    distributed sum is order-independent and hash-exact vs DuckDB.

    Scale note: nation (25 rows) is always broadcastable; customer is
    broadcast here because at bench scale it is the small side — at a
    scale where customers outgrow worker heaps, swap that hop for a
    second ``bucketed_hash_join`` on custkey (same output, one more
    exchange). The fact⋈fact hop is bucketed from the start.
    """
    li = _read(
        os.path.join(sf_dir, "lineitem.parquet"),
        ["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def _rev(t: pa.Table) -> pa.Table:
        p = t["l_extendedprice"].combine_chunks().to_numpy(zero_copy_only=False)
        d = t["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        cents = np.floor(p * 100.0 + 0.5).astype(np.int64)
        pct = np.floor(d * 100.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"].combine_chunks(),
                "rev": pa.array(cents * (np.int64(100) - pct), pa.int64()),
            }
        )

    orders = _read(
        os.path.join(sf_dir, "orders.parquet"), ["o_orderkey", "o_custkey"]
    ).map_batches(
        lambda t: t.rename_columns(["l_orderkey", "o_custkey"]),
        batch_format="pyarrow",
    )
    joined = join_mod.bucketed_hash_join(
        li.map_batches(_rev, batch_format="pyarrow"),
        orders,
        on="l_orderkey",
        n_buckets=16,
    )
    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_nationkey"]
    ).rename_columns(["o_custkey", "c_nationkey"])
    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    ).rename_columns(["c_nationkey", "n_name"])
    j2 = join_mod.broadcast_join(joined, cust, on="o_custkey", concurrency=2)
    j3 = join_mod.broadcast_join(j2, nation, on="c_nationkey", concurrency=2)
    return agg.partial_group_agg(j3, keys=["n_name"], sum_cols=["rev"], count_as="n")


SQL_REVENUE_BY_NATION = (
    "SELECT n_name, "
    "CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) "
    "* (100 - CAST(FLOOR(l_discount * 100.0 + 0.5) AS BIGINT))) AS BIGINT) AS sum_rev, "
    "CAST(COUNT(*) AS BIGINT) AS n "
    "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
    "JOIN customer ON o_custkey = c_custkey "
    "JOIN nation ON c_nationkey = n_nationkey "
    "GROUP BY n_name"
)


def q_customers_no_urgent(sf_dir: str):
    """Large-large ANTI join (NOT EXISTS): customers with no URGENT
    order, via ``bucketed_hash_join(how='anti')`` — the existence-filter
    flavor for when the filter side is too big to broadcast. The urgency
    predicate is pushed into the parquet read (row-group-level filter),
    and only order KEYS enter the exchange (the join prunes right
    payload before bucketing); each bucket runs pyarrow's native
    left-anti join."""
    import pyarrow.dataset as pads

    cust = _read(
        os.path.join(sf_dir, "customer.parquet"), ["c_custkey", "c_mktsegment"]
    )
    urgent = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey"],
        filter=pads.field("o_orderpriority") == "1-URGENT",
    ).map_batches(lambda t: t.rename_columns(["c_custkey"]), batch_format="pyarrow")
    return join_mod.bucketed_hash_join(cust, urgent, on="c_custkey", n_buckets=16, how="anti")


SQL_CUSTOMERS_NO_URGENT = (
    "SELECT c_custkey, c_mktsegment FROM customer "
    "WHERE NOT EXISTS (SELECT 1 FROM orders "
    "WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')"
)


def q_lineitem_rollup(sf_dir: str):
    """Multi-level (GROUP BY ROLLUP) aggregate from ONE shuffle: the
    leaf (returnflag × linestatus) partial→final aggregate is the only
    distributed pass; the coarser levels are exact re-reductions of the
    tiny leaf table on the driver (int64 sums of int64 leaf sums, min of
    leaf mins), so every level stays order-independent and hash-exact.
    Rolled-up key columns surface as 'ALL'."""
    import pyarrow.compute as pc

    leaf_ds = q_lineitem_stats(sf_dir)
    leaf = pa.Table.from_pylist(
        leaf_ds.take_all(),
        schema=pa.schema(
            [
                ("l_returnflag", pa.string()),
                ("l_linestatus", pa.string()),
                ("sum_qty", pa.int64()),
                ("min_l_extendedprice", pa.float64()),
                ("max_l_extendedprice", pa.float64()),
                ("n", pa.int64()),
            ]
        ),
    )
    aggs = [
        ("sum_qty", "sum"),
        ("min_l_extendedprice", "min"),
        ("max_l_extendedprice", "max"),
        ("n", "sum"),
    ]
    out_names = ["sum_qty", "min_l_extendedprice", "max_l_extendedprice", "n"]

    def _level(keys):
        g = leaf.group_by(keys).aggregate(aggs) if keys else pa.table(
            {
                "sum_qty": pa.array([pc.sum(leaf["sum_qty"]).as_py()], pa.int64()),
                "min_l_extendedprice": pa.array(
                    [pc.min(leaf["min_l_extendedprice"]).as_py()], pa.float64()
                ),
                "max_l_extendedprice": pa.array(
                    [pc.max(leaf["max_l_extendedprice"]).as_py()], pa.float64()
                ),
                "n": pa.array([pc.sum(leaf["n"]).as_py()], pa.int64()),
            }
        )
        if keys:
            g = g.rename_columns(keys + out_names)
        cols = {}
        for k in ("l_returnflag", "l_linestatus"):
            cols[k] = (
                g[k]
                if k in (keys or [])
                else pa.array(["ALL"] * len(g), pa.string())
            )
        for c in out_names:
            cols[c] = g[c]
        return pa.table(cols)

    levels = [
        _level(["l_returnflag", "l_linestatus"]),
        _level(["l_returnflag"]),
        _level([]),
    ]
    return pa.concat_tables(levels)


def q_lineitem_cube(sf_dir: str):
    """GROUP BY CUBE from ONE distributed shuffle (stages/agg.py:
    grouping_sets_agg): the leaf (returnflag × linestatus) aggregate is
    the only corpus pass; all four grouping sets are exact driver-side
    re-reductions of that bounded leaf table — the rollup doctrine
    generalized to arbitrary grouping sets."""
    leaf_ds = q_lineitem_stats(sf_dir)
    leaf = pa.Table.from_pylist(
        leaf_ds.take_all(),
        schema=pa.schema(
            [
                ("l_returnflag", pa.string()),
                ("l_linestatus", pa.string()),
                ("sum_qty", pa.int64()),
                ("min_l_extendedprice", pa.float64()),
                ("max_l_extendedprice", pa.float64()),
                ("n", pa.int64()),
            ]
        ),
    )
    return agg.grouping_sets_agg(
        leaf,
        keys=["l_returnflag", "l_linestatus"],
        sets=[
            ["l_returnflag", "l_linestatus"],
            ["l_returnflag"],
            ["l_linestatus"],
            [],
        ],
        specs=[
            ("sum_qty", "sum"),
            ("min_l_extendedprice", "min"),
            ("max_l_extendedprice", "max"),
            ("n", "sum"),
        ],
    )


SQL_LINEITEM_CUBE = (
    "SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag, "
    "COALESCE(l_linestatus, 'ALL') AS l_linestatus, "
    "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, "
    "MIN(l_extendedprice) AS min_l_extendedprice, "
    "MAX(l_extendedprice) AS max_l_extendedprice, "
    "CAST(COUNT(*) AS BIGINT) AS n "
    "FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)"
)


SQL_LINEITEM_ROLLUP = (
    "SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag, "
    "COALESCE(l_linestatus, 'ALL') AS l_linestatus, "
    "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, "
    "MIN(l_extendedprice) AS min_l_extendedprice, "
    "MAX(l_extendedprice) AS max_l_extendedprice, "
    "CAST(COUNT(*) AS BIGINT) AS n "
    "FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"
)


def q_bloom_semi(sf_dir: str):
    """Bloom-prefiltered large-large SEMI join (stages/join.py:
    bloom_semi_join): lineitems of high-value orders. The right side's
    keys tree-OR-merge into ONE broadcast bitmap; non-matching left
    rows never enter the shuffle; an exact bucketed semi join removes
    the bloom's false positives, so the result is identical to the
    plain semi join (and to the EXISTS SQL). Aggregated output keeps
    the compare small."""
    import pyarrow.dataset as pads

    li = _read(
        os.path.join(sf_dir, "lineitem.parquet"), ["l_orderkey", "l_quantity"]
    )
    big = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey"],
        filter=pads.field("o_totalprice") > 400000.0,
    ).map_batches(lambda t: t.rename_columns(["l_orderkey"]), batch_format="pyarrow")
    kept = join_mod.bloom_semi_join(li, big, on="l_orderkey", m_bits=1 << 20)

    def _q(t: pa.Table) -> pa.Table:
        v = t["l_quantity"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"].combine_chunks(),
                "qty": pa.array(np.floor(v + 0.5).astype(np.int64), pa.int64()),
            }
        )

    return agg.partial_group_agg(
        kept.map_batches(_q, batch_format="pyarrow"),
        keys=["l_orderkey"],
        sum_cols=["qty"],
        count_as="items",
    )


SQL_BLOOM_SEMI = (
    "SELECT l_orderkey, CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty, "
    "CAST(COUNT(*) AS BIGINT) AS items FROM lineitem "
    "WHERE EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey "
    "AND o_totalprice > 400000.0) GROUP BY l_orderkey"
)


def q_customer_urgent_profile(sf_dir: str):
    """LEFT OUTER flavor of the large-large bucketed join
    (stages/join.py: bucketed_hash_join how='left'): every customer
    row survives; customers with no urgent orders carry null-padded
    right columns, coalesced to 0 — exercising the outer-join
    null-extension path the semi/anti queries never touch."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    cust = _read(os.path.join(sf_dir, "customer.parquet"), ["c_custkey"])
    urgent = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_totalprice"],
        filter=pads.field("o_orderpriority") == "1-URGENT",
    )

    def _cents(t: pa.Table) -> pa.Table:
        v = t["o_totalprice"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "c_custkey": t["o_custkey"].combine_chunks(),
                "cents": pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64), pa.int64()),
            }
        )

    per_cust = agg.partial_group_agg(
        urgent.map_batches(_cents, batch_format="pyarrow"),
        keys=["c_custkey"],
        sum_cols=["cents"],
        count_as="n_urgent",
    )
    joined = join_mod.bucketed_hash_join(cust, per_cust, on="c_custkey", how="left", n_buckets=16)

    def _fill(t: pa.Table) -> pa.Table:
        # an all-empty right side may surface the left table verbatim
        # (its columns are unknowable then) — synthesize the aggregates
        def col(name):
            if name in t.column_names:
                return pc.fill_null(t[name].combine_chunks(), 0)
            return pa.nulls(t.num_rows, pa.int64()).fill_null(0)

        return pa.table(
            {
                "c_custkey": t["c_custkey"].combine_chunks(),
                "n_urgent": col("n_urgent"),
                "urgent_cents": col("sum_cents"),
            }
        )

    return joined.map_batches(_fill, batch_format="pyarrow")


SQL_CUSTOMER_URGENT_PROFILE = (
    "SELECT c.c_custkey, COALESCE(o.n_urgent, 0) AS n_urgent, "
    "COALESCE(o.sum_cents, 0) AS urgent_cents FROM customer c LEFT JOIN ("
    "SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_urgent, "
    "CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents "
    "FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey) o "
    "ON o.o_custkey = c.c_custkey"
)


def q_lineitem_melt(sf_dir: str):
    """Unpivot (stages/agg.py: melt — the inverse of pivot_counts):
    each lineitem explodes into one (orderkey, linenumber, metric,
    val) row per quantized metric. Pure map-side reshape, no shuffle.
    SQL mirror: the UNION ALL list."""
    ds = _read(
        os.path.join(sf_dir, "lineitem.parquet"),
        ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def _q(t: pa.Table) -> pa.Table:
        q = t["l_quantity"].combine_chunks().to_numpy(zero_copy_only=False)
        p = t["l_extendedprice"].combine_chunks().to_numpy(zero_copy_only=False)
        d = t["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"].combine_chunks(),
                "l_linenumber": t["l_linenumber"].combine_chunks(),
                "qty": pa.array(np.floor(q + 0.5).astype(np.int64), pa.int64()),
                "price_cents": pa.array(np.floor(p * 100 + 0.5).astype(np.int64), pa.int64()),
                "disc_bp": pa.array(np.floor(d * 10000 + 0.5).astype(np.int64), pa.int64()),
            }
        )

    return agg.melt(
        ds.map_batches(_q, batch_format="pyarrow"),
        id_cols=["l_orderkey", "l_linenumber"],
        value_cols=["qty", "price_cents", "disc_bp"],
    )


SQL_LINEITEM_MELT = (
    "SELECT l_orderkey, l_linenumber, 'qty' AS metric, "
    "CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS val FROM lineitem "
    "UNION ALL SELECT l_orderkey, l_linenumber, 'price_cents' AS metric, "
    "CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS val FROM lineitem "
    "UNION ALL SELECT l_orderkey, l_linenumber, 'disc_bp' AS metric, "
    "CAST(FLOOR(l_discount * 10000 + 0.5) AS BIGINT) AS val FROM lineitem"
)


def q_snapshot_diff(sf_dir: str):
    """Corpus snapshot diff (the delta-audit op between two dataset
    versions): OLD = docs with doc_id % 7 <> 0 keyed by the first 50
    code points of text, NEW = docs with doc_id % 11 <> 0 keyed by
    full text — per doc_id status added / removed / changed / same.
    Engine: both sides reduce map-side to (id, fingerprint64) — text
    never shuffles — then ONE bucketed outer join + a CASE map.
    Fingerprint equality stands in for text equality (64-bit, same
    collision doctrine as decontam's membership keys: a collision
    miscategorizes one row as 'same')."""
    import pyarrow.compute as pc

    def _side(pred_mod: int, prefix: "int | None"):
        ds = _docs(sf_dir, ["doc_id", "text"])

        def _fp(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
            keep = (ids % pred_mod) != 0
            t = t.filter(pa.array(keep))
            txt = t["text"].combine_chunks()
            if prefix is not None:
                txt = pc.utf8_slice_codeunits(txt, start=0, stop=prefix)
            # fingerprint64 whitespace-normalizes before hashing — an
            # equality-preserving step on this single-spaced corpus, so
            # fp equality ⇔ the SQL mirror's raw substring equality
            return pa.table(
                {
                    "doc_id": t["doc_id"].combine_chunks(),
                    "fp": text.fingerprint64(txt).cast(pa.int64()),
                }
            )

        return ds.map_batches(_fp, batch_format="pyarrow")

    old = _side(7, 50).map_batches(
        lambda t: t.rename_columns(["doc_id", "fp_old"]), batch_format="pyarrow"
    )
    new = _side(11, None).map_batches(
        lambda t: t.rename_columns(["doc_id", "fp_new"]), batch_format="pyarrow"
    )
    both = join_mod.bucketed_hash_join(old, new, on="doc_id", how="outer")

    def _status(t: pa.Table) -> pa.Table:
        fo = t["fp_old"].combine_chunks()
        fn = t["fp_new"].combine_chunks()
        import pyarrow.compute as _pc

        status = _pc.if_else(
            _pc.is_null(fo),
            pa.scalar("added"),
            _pc.if_else(
                _pc.is_null(fn),
                pa.scalar("removed"),
                _pc.if_else(_pc.equal(fo, fn), pa.scalar("same"), pa.scalar("changed")),
            ),
        )
        return pa.table(
            {"doc_id": t["doc_id"].combine_chunks(), "status": status}
        )

    return both.map_batches(_status, batch_format="pyarrow")


SQL_SNAPSHOT_DIFF = """
WITH old AS (SELECT doc_id, substring(text, 1, 50) AS v FROM documents WHERE doc_id % 7 <> 0),
new AS (SELECT doc_id, text AS v FROM documents WHERE doc_id % 11 <> 0)
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
  CASE WHEN o.doc_id IS NULL THEN 'added'
       WHEN n.doc_id IS NULL THEN 'removed'
       WHEN o.v = n.v THEN 'same' ELSE 'changed' END AS status
FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
"""


def q_zonemap_scan(sf_dir: str):
    """Zone-map-pruned range scan (sources/zonemap.py): events laid
    out as range-partitioned parquet with a footer-stats manifest
    (built once per sf_dir under /tmp, like the IVF index); the query
    reads ONLY zone dirs overlapping event_id ∈ [max/4, max/2], then
    exact-filters and aggregates per event_type. Results are identical
    to a full scan + filter — the manifest only removes I/O."""
    import hashlib

    from rio_cogeo_ray.sources import zonemap
    from rio_cogeo_ray.stages.agg import partial_group_agg

    ev_path = os.path.join(sf_dir, "events.parquet")
    st = os.stat(ev_path)
    tag = hashlib.sha256(f"{ev_path}:{st.st_size}:{st.st_mtime_ns}".encode()).hexdigest()[:12]
    zdir = f"/tmp/rcr_zonemap/{tag}"
    if not os.path.exists(os.path.join(zdir, zonemap.MANIFEST)):
        zonemap.write_zonemapped(
            _read(ev_path, ["event_id", "event_type"]), zdir, "event_id", n_zones=16
        )
    max_id = 0
    md = pq.ParquetFile(ev_path).metadata
    ci = md.schema.to_arrow_schema().get_field_index("event_id")
    for rg in range(md.num_row_groups):
        s = md.row_group(rg).column(ci).statistics
        if s is not None and s.has_min_max:
            max_id = max(max_id, s.max)
    lo, hi = max_id // 4, max_id // 2
    ds = zonemap.read_zonemapped(zdir, lo, hi, columns=["event_id", "event_type"])
    return partial_group_agg(
        ds,
        keys=["event_type"],
        min_cols=["event_id"],
        max_cols=["event_id"],
        count_as="n_events",
    )


SQL_ZONEMAP_SCAN = """
SELECT event_type, MIN(event_id) AS min_event_id,
       MAX(event_id) AS max_event_id, CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
WHERE event_id BETWEEN (SELECT MAX(event_id) // 4 FROM events)
                   AND (SELECT MAX(event_id) // 2 FROM events)
GROUP BY event_type
"""


def q_cdc_merge(sf_dir: str):
    """CDC MERGE INTO (stages/cdc.py: merge_upsert): apply a change
    log to the customer snapshot. The delta is synthesized from
    orders — each order is a change record for its customer
    (op = D when o_orderkey % 11 = 0 else U, seq = o_orderkey,
    payload name/acctbal from the order); the highest-seq record per
    customer wins. Broadcast path: winner keys ship once via
    ray.put, the snapshot streams through one anti-filter pass with
    ZERO shuffle."""
    from rio_cogeo_ray.stages import cdc

    snap = _read(
        os.path.join(sf_dir, "customer.parquet"),
        ["c_custkey", "c_name", "c_acctbal"],
    )

    def _delta(t: pa.Table) -> pa.Table:
        ok = t["o_orderkey"].combine_chunks()
        is_del = ok.to_numpy(zero_copy_only=False) % 11 == 0
        op = pc.if_else(pa.array(is_del), pa.scalar("D"), pa.scalar("U"))
        name = pc.binary_join_element_wise(
            pa.scalar("cdc-"), pc.cast(ok, pa.string()), pa.scalar("")
        )
        return pa.table(
            {
                "c_custkey": t["o_custkey"].combine_chunks(),
                "op": op,
                "seq": ok,
                "c_name": name,
                "c_acctbal": t["o_totalprice"].combine_chunks(),
            }
        )

    delta = _read(
        os.path.join(sf_dir, "orders.parquet"),
        ["o_orderkey", "o_custkey", "o_totalprice"],
    ).map_batches(_delta, batch_format="pyarrow")
    return cdc.merge_upsert(snap, delta, on="c_custkey", seq_col="seq")


SQL_CDC_MERGE = """
WITH delta AS (
  SELECT o_custkey AS c_custkey,
         CASE WHEN o_orderkey % 11 = 0 THEN 'D' ELSE 'U' END AS op,
         o_orderkey AS seq,
         'cdc-' || CAST(o_orderkey AS VARCHAR) AS c_name,
         o_totalprice AS c_acctbal
  FROM orders),
win AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY seq DESC) AS rn
        FROM delta)
SELECT c_custkey, c_name, c_acctbal FROM customer
WHERE c_custkey NOT IN (SELECT c_custkey FROM delta)
UNION ALL
SELECT c_custkey, c_name, c_acctbal FROM win WHERE rn = 1 AND op = 'U'
"""


def q_custkey_setops(sf_dir: str):
    """SQL set operators as distributed compositions (stages/setops.py):
    INTERSECT = semi(distinct, distinct), EXCEPT = anti(distinct,
    distinct). Customers WITH at least one order ('both') and customers
    with NO orders ('left_only') — the classic TPC-H ~1/3-never-ordered
    split. Each side collapses to distinct keys map-side before the one
    bucketed existence join; raw rows never shuffle."""
    from rio_cogeo_ray.stages import setops

    def _rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["custkey"])

    cust = _read(os.path.join(sf_dir, "customer.parquet"), ["c_custkey"]).map_batches(
        _rename, batch_format="pyarrow"
    )
    ords = _read(os.path.join(sf_dir, "orders.parquet"), ["o_custkey"]).map_batches(
        _rename, batch_format="pyarrow"
    )
    both = setops.set_op(cust, ords, on="custkey", op="intersect", n_buckets=16)
    only = setops.set_op(cust, ords, on="custkey", op="except", n_buckets=16)

    def _tag(label: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column("op", pa.array([label] * len(t), pa.string()))

        return fn

    return both.map_batches(_tag("both"), batch_format="pyarrow").union(
        only.map_batches(_tag("left_only"), batch_format="pyarrow")
    )


SQL_CUSTKEY_SETOPS = """
SELECT custkey, 'both' AS op
FROM (SELECT c_custkey AS custkey FROM customer
      INTERSECT SELECT o_custkey FROM orders)
UNION ALL
SELECT custkey, 'left_only' AS op
FROM (SELECT c_custkey AS custkey FROM customer
      EXCEPT SELECT o_custkey FROM orders)
"""


def q_bloom_lookup(sf_dir: str):
    """Bloom-file-index point lookup (sources/bloomidx.py): documents
    are laid out by a key the lookup does NOT use (hash(doc_id)%16
    hive files — every file's doc_id min/max spans the domain, so
    zone maps cannot prune), and a per-FILE bloom of doc_id is built
    once as a side manifest. The IN-list query probes the blooms,
    reads ONLY candidate files, and exact-filters away false
    positives — identical to a full scan + filter, minus the I/O."""
    import hashlib

    from rio_cogeo_ray.sources import bloomidx
    from rio_cogeo_ray.stages.sketch import knuth32

    doc_path = os.path.join(sf_dir, "documents.parquet")
    if pq.ParquetFile(doc_path).metadata.num_rows == 0:
        # an empty dataset writes NO parquet files — no layout to index
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "lang": pa.array([], pa.string()),
                    "source": pa.array([], pa.string()),
                    "n_chars": pa.array([], pa.int64()),
                }
            )
        )
    st = os.stat(doc_path)
    tag = hashlib.sha256(
        f"{doc_path}:{st.st_size}:{st.st_mtime_ns}".encode()
    ).hexdigest()[:12]
    bdir = f"/tmp/rcr_bloomidx/{tag}"
    if not os.path.exists(os.path.join(bdir, bloomidx.MANIFEST)):

        def _bfile(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].combine_chunks().cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            b = (knuth32(ids) % np.uint64(16)).astype(np.int64)
            return t.append_column("bfile", pa.array(b, pa.int64()))

        # atomic build (zonemap doctrine): Ray write_parquet APPENDS, so
        # a crashed half-build must never be appended into — build aside,
        # replace on success
        import shutil

        build = bdir + ".build"
        shutil.rmtree(build, ignore_errors=True)
        _read(doc_path, ["doc_id", "lang", "source", "n_chars"]).map_batches(
            _bfile, batch_format="pyarrow"
        ).write_parquet(build, partition_cols=["bfile"])
        bloomidx.build_bloom_index(build, "doc_id")
        shutil.rmtree(bdir, ignore_errors=True)
        os.replace(build, bdir)

    # max doc_id from the ORIGINAL table's footer stats (metadata-only)
    md = pq.ParquetFile(doc_path).metadata
    ci = md.schema.to_arrow_schema().get_field_index("doc_id")
    mx = 0
    for rg in range(md.num_row_groups):
        s = md.row_group(rg).column(ci).statistics
        if s is not None and s.has_min_max:
            mx = max(mx, s.max)
    keys = [0, mx // 7, mx // 3, mx // 2, mx - mx // 5, mx]
    ds = bloomidx.read_point_lookup(
        bdir, keys, columns=["doc_id", "lang", "source", "n_chars"]
    )
    return ds.map_batches(
        lambda t: t.select(["doc_id", "lang", "source", "n_chars"]),
        batch_format="pyarrow",
    )


SQL_BLOOM_LOOKUP = """
WITH m AS (SELECT MAX(doc_id) AS mx FROM documents)
SELECT doc_id, lang, source, n_chars
FROM documents, m
WHERE doc_id IN (0, mx // 7, mx // 3, mx // 2, mx - mx // 5, mx)
"""


def q_union_evolved(sf_dir: str):
    """Schema-evolution union (sources/evolve.py): the documents table
    split into two writer generations under /tmp — v1 (even doc_ids)
    predates the n_chars column and stores (lang, doc_id) in drifted
    order; v2 (odd doc_ids) has the full (doc_id, lang, n_chars)
    schema. read_union_by_name aligns by NAME (missing column → typed
    nulls, DuckDB's UNION ALL BY NAME rule) and the per-lang aggregate
    runs over the streamed union — sum_n_chars counts only v2 rows
    because v1's nulls never enter the SUM, exactly as in SQL."""
    import hashlib

    from rio_cogeo_ray.sources import evolve

    doc_path = os.path.join(sf_dir, "documents.parquet")
    if pq.ParquetFile(doc_path).metadata.num_rows == 0:
        # an empty dataset writes NO parquet files — no generations exist
        return rd.from_arrow(
            pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "sum_n_chars": pa.array([], pa.int64()),
                    "n_docs": pa.array([], pa.int64()),
                }
            )
        )
    st = os.stat(doc_path)
    tag = hashlib.sha256(
        f"{doc_path}:{st.st_size}:{st.st_mtime_ns}".encode()
    ).hexdigest()[:12]
    base = f"/tmp/rcr_evolve/{tag}"
    if not os.path.exists(os.path.join(base, ".done")):
        # atomic build: Ray write_parquet APPENDS into existing dirs, so
        # a crashed half-build would double rows forever under the same
        # stat-keyed tag — build aside, replace on success
        import shutil

        final_base, base = base, base + ".build"
        shutil.rmtree(base, ignore_errors=True)
        docs = _read(doc_path, ["doc_id", "lang", "n_chars"])

        def _v1(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].combine_chunks()
            m = pc.equal(pc.bit_wise_and(ids, pa.scalar(1, pa.int64())), 0)
            return t.filter(m).select(["lang", "doc_id"])  # drifted order

        def _v2(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].combine_chunks()
            m = pc.equal(pc.bit_wise_and(ids, pa.scalar(1, pa.int64())), 1)
            return t.filter(m)

        docs.map_batches(_v1, batch_format="pyarrow").write_parquet(f"{base}/v1")
        docs.map_batches(_v2, batch_format="pyarrow").write_parquet(f"{base}/v2")
        # a generation with zero matching rows writes NO files (Ray):
        # materialize its schema explicitly so the union still sees it
        for sub, sch in (
            ("v1", pa.schema([("lang", pa.string()), ("doc_id", pa.int64())])),
            (
                "v2",
                pa.schema(
                    [
                        ("doc_id", pa.int64()),
                        ("lang", pa.string()),
                        ("n_chars", pa.int64()),
                    ]
                ),
            ),
        ):
            d = f"{base}/{sub}"
            os.makedirs(d, exist_ok=True)
            if not any(f.endswith(".parquet") for f in os.listdir(d)):
                pq.write_table(sch.empty_table(), os.path.join(d, "empty.parquet"))
        with open(os.path.join(base, ".done"), "w") as f:
            f.write("ok")
        shutil.rmtree(final_base, ignore_errors=True)
        os.replace(base, final_base)
        base = final_base

    ds = evolve.read_union_by_name([f"{base}/v1", f"{base}/v2"])
    out = agg.partial_group_agg(
        ds, keys=["lang"], sum_cols=["n_chars"], count_as="n_docs"
    )
    return out.map_batches(
        lambda t: t.select(["lang", "sum_n_chars", "n_docs"]),
        batch_format="pyarrow",
    )


SQL_UNION_EVOLVED = """
SELECT lang,
       CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS BIGINT)
           AS sum_n_chars,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents
GROUP BY lang
"""


def q_zone_join(sf_dir: str):
    """Storage-partitioned join (sources/zonemap.py:zone_join — the
    Iceberg/Spark SPJ shape): orders is zone-mapped on o_orderkey and
    lineitem is CO-PARTITIONED on l_orderkey with orders' recorded
    cuts, so equal keys share a __zone directory and the join runs as
    per-zone task-local pyarrow hash joins over pruned reads — ZERO
    shuffle (no bucket exchange, no sort). Aggregated per priority."""
    import hashlib

    from rio_cogeo_ray.sources import zonemap

    o_path = os.path.join(sf_dir, "orders.parquet")
    l_path = os.path.join(sf_dir, "lineitem.parquet")
    if (
        pq.ParquetFile(o_path).metadata.num_rows == 0
        or pq.ParquetFile(l_path).metadata.num_rows == 0
    ):
        return rd.from_arrow(
            pa.table(
                {
                    "o_orderpriority": pa.array([], pa.string()),
                    "min_o_orderkey": pa.array([], pa.int64()),
                    "max_o_orderkey": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        )
    so, sl = os.stat(o_path), os.stat(l_path)
    tag = hashlib.sha256(
        f"{o_path}:{so.st_size}:{so.st_mtime_ns}:{sl.st_size}:{sl.st_mtime_ns}".encode()
    ).hexdigest()[:12]
    base = f"/tmp/rcr_zonejoin/{tag}"
    odir, ldir = f"{base}/orders", f"{base}/lineitem"
    if not os.path.exists(os.path.join(base, ".done")):
        zonemap.write_zonemapped(
            _read(o_path, ["o_orderkey", "o_orderpriority"]),
            odir,
            "o_orderkey",
            n_zones=16,
        )
        zonemap.write_zonemapped(
            _read(l_path, ["l_orderkey", "l_linenumber"]),
            ldir,
            "l_orderkey",
            cuts=zonemap.layout_cuts(odir),
        )
        with open(os.path.join(base, ".done"), "w") as f:
            f.write("ok")
    joined = zonemap.zone_join(
        odir,
        ldir,
        a_columns=["o_orderkey", "o_orderpriority"],
        b_columns=["l_orderkey", "l_linenumber"],
    )
    out = agg.partial_group_agg(
        joined,
        keys=["o_orderpriority"],
        min_cols=["o_orderkey"],
        max_cols=["o_orderkey"],
        count_as="n",
    )
    return out.map_batches(
        lambda t: t.select(
            ["o_orderpriority", "min_o_orderkey", "max_o_orderkey", "n"]
        ),
        batch_format="pyarrow",
    )


SQL_ZONE_JOIN = """
SELECT o_orderpriority, MIN(o_orderkey) AS min_o_orderkey,
       MAX(o_orderkey) AS max_o_orderkey, CAST(COUNT(*) AS BIGINT) AS n
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def q_key_skew(sf_dir: str):
    """Join-key skew diagnostic (stages/profile.py:key_skew): the
    multiplicity histogram of lineitem.l_orderkey — the planning input
    for salting / broadcast decisions. Two chained partial→final
    aggregations; the histogram is O(distinct multiplicities) rows."""
    from rio_cogeo_ray.stages import profile

    ds = _read(os.path.join(sf_dir, "lineitem.parquet"), ["l_orderkey"])
    return profile.key_skew(ds, "l_orderkey")


SQL_KEY_SKEW = (
    "WITH k AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS m "
    "FROM lineitem GROUP BY 1) "
    "SELECT m AS multiplicity, CAST(COUNT(*) AS BIGINT) AS n_keys, "
    "CAST(SUM(m) AS BIGINT) AS total_rows FROM k GROUP BY m"
)


def q_pareto_customers(sf_dir: str):
    """Distributed skyline (Pareto front — stages/agg.py:skyline):
    customers not dominated on (order count, total spend, max order).
    Two-level combiner reduction: per-batch local skyline prunes
    map-side, survivors collapse once for the exact final pass. Spend
    quantized to integer cents (the engine's exact-sum doctrine)."""
    ds = _read(os.path.join(sf_dir, "orders.parquet"), ["o_custkey", "o_totalprice"])

    def _cents(t: pa.Table) -> pa.Table:
        # explicit float64 cast: robust to a source column stored as
        # float32 or decimal (numpy would otherwise compute v*100 in
        # the narrower type and quantize differently than the oracle)
        v = (
            t["o_totalprice"].combine_chunks().cast(pa.float64()).to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "custkey": t["o_custkey"].combine_chunks(),
                "cents": pa.array(np.floor(v * 100 + 0.5).astype(np.int64), pa.int64()),
            }
        )

    per = agg.partial_group_agg(
        ds.map_batches(_cents, batch_format="pyarrow"),
        keys=["custkey"],
        sum_cols=["cents"],
        max_cols=["cents"],
        count_as="n_orders",
    )
    return agg.skyline(per, dims=["n_orders", "sum_cents", "max_cents"])


SQL_PARETO_CUSTOMERS = (
    "WITH c AS (SELECT o_custkey AS custkey, "
    # outer CAST matters: DuckDB SUM(BIGINT) returns HUGEINT
    # (decimal128), which the driver's value-hash treats differently
    # from the engine's int64 — root cause of the r4 red row.
    "CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents, "
    "MAX(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS max_cents, "
    "CAST(COUNT(*) AS BIGINT) AS n_orders FROM orders GROUP BY 1) "
    "SELECT custkey, sum_cents, max_cents, n_orders FROM c a "
    "WHERE NOT EXISTS (SELECT 1 FROM c b WHERE "
    "b.n_orders >= a.n_orders AND b.sum_cents >= a.sum_cents AND "
    "b.max_cents >= a.max_cents AND (b.n_orders > a.n_orders OR "
    "b.sum_cents > a.sum_cents OR b.max_cents > a.max_cents))"
)


def q_scd2(sf_dir: str):
    """SCD Type-2 dimension build (stages/window.py: scd2_intervals):
    compress the event change log into per-user validity intervals of
    ``event_type`` — consecutive same-value runs collapse, valid_to is
    the next change (NULL = current version). One hash(user) exchange,
    one vectorized lexsort+diff pass per bucket; the (ts, event_id)
    unique tiebreak makes intervals permutation-exact."""
    ds = _read(os.path.join(sf_dir, "events.parquet"),
               ["event_id", "ts", "user_id", "event_type"])
    from rio_cogeo_ray.stages import window as window_mod

    return window_mod.scd2_intervals(ds)


SQL_SCD2 = """
WITH o AS (SELECT user_id, epoch_us(ts) AS t, event_id, event_type,
           LAG(event_type) OVER
             (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev,
           ROW_NUMBER() OVER
             (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn
           FROM events),
f AS (SELECT *, CASE WHEN rn = 1 OR prev IS DISTINCT FROM event_type
                     THEN 1 ELSE 0 END AS brk FROM o),
i AS (SELECT *, SUM(brk) OVER
        (PARTITION BY user_id ORDER BY t, event_id ROWS UNBOUNDED PRECEDING)
        AS isl FROM f),
g AS (SELECT user_id, isl,
             MIN(t) AS valid_from_us,
             ANY_VALUE(event_type) AS event_type,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM i GROUP BY user_id, isl)
SELECT user_id, event_type, valid_from_us,
       LEAD(valid_from_us) OVER
         (PARTITION BY user_id ORDER BY valid_from_us) AS valid_to_us,
       n_events
FROM g
"""

