"""Event-time queries: windows, sessions, funnels, intervals, resampling.

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
from rio_cogeo_ray.pipelines.queries._common import EVENT_GAP_US, EVENT_TIERS, GROWTH_HOUR_US, HIST_BINS, RESAMPLE_GRID_US, SESSIONS_LATE_GAP_US, SESSIONS_LATE_LATENESS_US, TIME_BAND_US, TREND_HOUR_US, _SLIDE_Q, _TR_H, _TR_LVL, _read


def q_user_activity(sf_dir: str):
    """Per-user exponentially time-decayed activity score at each
    user's last event (half-life 1 day) — the recency-weighted feature
    pass. SQL-exact since round 5: per-event contributions floor to
    int64 ppm BEFORE the per-key sum (decayed_sum(quantize_ppm=True) —
    integer summation is order-invariant, and glibc exp2/pow are
    correctly rounded so numpy and DuckDB floor identical doubles).
    Float variant + underflow-robustness stay pinned in pytest."""
    from rio_cogeo_ray.stages import window as window_mod

    ds = _read(os.path.join(sf_dir, "events.parquet"), ["user_id", "ts", "value"])
    return window_mod.decayed_sum(ds, half_life=86_400e6, quantize_ppm=True)


SQL_USER_ACTIVITY = """
WITH e AS (SELECT user_id, epoch_us(ts) AS t, CAST(value AS DOUBLE) AS v
           FROM events),
l AS (SELECT user_id, MAX(t) AS last_ts FROM e GROUP BY 1)
SELECT e.user_id, l.last_ts,
       CAST(SUM(CAST(FLOOR(e.v
            * POWER(2.0, (0.0 - CAST(l.last_ts - e.t AS DOUBLE))
                          / 86400000000.0)
            * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS decayed_ppm
FROM e JOIN l USING (user_id) GROUP BY 1, 2
"""


def q_time_rollup(sf_dir: str):
    """Multi-resolution time pyramid (stages/window.py:time_rollup):
    hour/day/week aggregates from ONE corpus pass — every coarser
    level re-reduces the previous level's bounded table (the
    reference's overview-pyramid doctrine, cogeo.py:381-390, on the
    time axis)."""
    ev = _read(
        os.path.join(sf_dir, "events.parquet"), ["event_type", "ts", "value"]
    )
    return window.time_rollup(ev)


SQL_TIME_ROLLUP = " UNION ALL ".join(
    _TR_LVL.format(i=i, u=u)
    for i, u in enumerate((_TR_H, 24 * _TR_H, 7 * 24 * _TR_H))
)


def q_time_band_join(sf_dir: str):
    """Stream-stream time-band self-join (stages/window.py:
    time_band_join — the bounded Flink-style interval join): every
    ordered same-user event pair within 30 min. One hash(user)
    exchange; per bucket a collision-free monotone segment key turns
    the whole multi-user band lookup into ONE vectorized searchsorted
    pair + repeat/offset pair explode."""
    ev = _read(
        os.path.join(sf_dir, "events.parquet"), ["user_id", "ts", "event_id"]
    )
    return window.time_band_join(ev, TIME_BAND_US)


SQL_TIME_BAND_JOIN = f"""
SELECT a.user_id, a.event_id AS a_event, b.event_id AS b_event,
       epoch_us(b.ts) - epoch_us(a.ts) AS dt_us
FROM events a JOIN events b
  ON a.user_id = b.user_id AND b.ts > a.ts
 AND epoch_us(b.ts) <= epoch_us(a.ts) + {TIME_BAND_US}
"""


def q_cohort_retention(sf_dir: str):
    """Weekly cohort retention (stages/window.py:cohort_retention):
    batches collapse to distinct (user, week) pairs map-side, ONE
    user-keyed exchange, per-bucket vectorized cohort/offset counts,
    tiny final merge over the bounded retention matrix."""
    ev = _read(os.path.join(sf_dir, "events.parquet"), ["user_id", "ts"])
    return window.cohort_retention(ev)


SQL_COHORT_RETENTION = """
WITH p AS (SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS wk
           FROM events),
c AS (SELECT user_id, MIN(wk) AS cohort FROM p GROUP BY user_id)
SELECT c.cohort AS cohort_week, p.wk - c.cohort AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS active_users
FROM p JOIN c ON p.user_id = c.user_id
GROUP BY 1, 2
"""


def q_funnel(sf_dir: str):
    """Ordered funnel (view → click → purchase) with first-touch
    strictly-after semantics (stages/window.py:funnel): one bucketed
    exchange co-locates each user's events; per bucket the whole
    multi-user funnel is 3 vectorized masked-reduceat passes."""
    ev = _read(
        os.path.join(sf_dir, "events.parquet"),
        ["user_id", "ts", "event_type"],
    )
    return window.funnel(ev, ["view", "click", "purchase"])


SQL_FUNNEL = """
WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY user_id),
s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
       JOIN s1 ON e.user_id = s1.user_id
       WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
       JOIN s2 ON e.user_id = s2.user_id
       WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
SELECT s1.user_id,
       CAST(1 + (s2.user_id IS NOT NULL)::INT + (s3.user_id IS NOT NULL)::INT
            AS BIGINT) AS stages
FROM s1
LEFT JOIN s2 ON s1.user_id = s2.user_id
LEFT JOIN s3 ON s1.user_id = s3.user_id
"""


def q_events_hourly(sf_dir: str):
    """Tumbling 1h windows per event_type (streaming-shaped aggregate)."""
    ds = _read(os.path.join(sf_dir, "events.parquet"), ["event_type", "ts", "value"])
    return window.tumbling_aggregate(ds)


SQL_EVENTS_HOURLY = (
    "SELECT event_type, epoch_us(ts) // 3600000000 AS window_id, "
    "CAST(SUM(CAST(FLOOR(value * 1000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_q, "
    "MIN(value) AS min_value, MAX(value) AS max_value, "
    "CAST(COUNT(*) AS BIGINT) AS n "
    "FROM events GROUP BY event_type, window_id"
)


def q_sessions(sf_dir: str):
    """Gap-based sessionization per user (30 min gap)."""
    ds = _read(os.path.join(sf_dir, "events.parquet"), ["user_id", "ts"])
    return window.sessionize(ds)


SQL_SESSIONS = (
    "WITH o AS (SELECT user_id, epoch_us(ts) AS tus, "
    "CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER "
    "(PARTITION BY user_id ORDER BY epoch_us(ts)) > 1800000000 THEN 1 ELSE 0 END AS new_s "
    "FROM events), "
    "s AS (SELECT user_id, SUM(new_s) OVER (PARTITION BY user_id ORDER BY tus "
    "ROWS UNBOUNDED PRECEDING) AS sid FROM o), "
    "per AS (SELECT user_id, sid, COUNT(*) AS c FROM s GROUP BY user_id, sid) "
    "SELECT user_id, CAST(SUM(c) AS BIGINT) AS n_events, "
    "CAST(COUNT(*) AS BIGINT) AS n_sessions, CAST(MAX(c) AS BIGINT) AS longest_session "
    "FROM per GROUP BY user_id"
)


def q_sessions_late(sf_dir: str):
    """Event-time session WINDOWS with allowed lateness (stages/
    window.py: session_windows — the streaming-depth shape beyond
    per-user sessionize summaries): per-session rows finalized only
    once the lateness-lagged watermark (max event time − 24 h) passes
    session_end + gap; later sessions stay open (is_final = 0) because
    a late event within the allowance could still extend them.
    Deterministic in the data, never in arrival order (the
    watermark_filter doctrine); SQL mirror = LAG-gap islands + a
    scalar-subquery watermark."""
    ds = _read(os.path.join(sf_dir, "events.parquet"), ["user_id", "ts"])
    return window.session_windows(
        ds, gap_us=SESSIONS_LATE_GAP_US,
        allowed_lateness_us=SESSIONS_LATE_LATENESS_US,
    )


SQL_SESSIONS_LATE = f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
o AS (SELECT user_id, t,
             CASE WHEN t - LAG(t) OVER (PARTITION BY user_id ORDER BY t)
                    > {SESSIONS_LATE_GAP_US}
                  OR LAG(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
                  THEN 1 ELSE 0 END AS brk FROM e),
i AS (SELECT user_id, t, SUM(brk) OVER (PARTITION BY user_id ORDER BY t
        ROWS UNBOUNDED PRECEDING) AS sid FROM o),
g AS (SELECT user_id, MIN(t) AS session_start_us, MAX(t) AS session_end_us,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM i GROUP BY user_id, sid)
SELECT user_id, session_start_us, session_end_us, n_events,
       CAST(CASE WHEN session_end_us + {SESSIONS_LATE_GAP_US}
                      <= (SELECT MAX(t) - {SESSIONS_LATE_LATENESS_US} FROM e)
                 THEN 1 ELSE 0 END AS BIGINT) AS is_final
FROM g
"""


def q_locf_fill(sf_dir: str):
    """LOCF forward-fill imputation (stages/window.py: forward_fill):
    error events carry a NULL reading (synthesized: cents are NULL when
    event_type = 'error'); each NULL takes the user's latest non-null
    reading at or before it in (ts, event_id) order; rows before a
    user's first reading stay NULL. One hash(user) exchange, one
    segmented-cummax pass per bucket."""
    ds = _read(
        os.path.join(sf_dir, "events.parquet"),
        ["user_id", "ts", "event_id", "event_type", "value"],
    )

    def _prep(t: pa.Table) -> pa.Table:
        v = t["value"].combine_chunks().to_numpy(zero_copy_only=False)
        cents = pa.array(
            np.floor(v * 100.0 + 0.5).astype(np.int64), pa.int64()
        )
        is_err = pc.equal(
            t["event_type"].combine_chunks().cast(pa.string()), "error"
        )
        return pa.table(
            {
                "user_id": t["user_id"].combine_chunks().cast(pa.int64()),
                "ts_us": t["ts"].combine_chunks().cast(pa.int64()),
                "event_id": t["event_id"].combine_chunks().cast(pa.int64()),
                "cents": pc.if_else(is_err, pa.scalar(None, pa.int64()), cents),
            }
        )

    return window.forward_fill(
        ds.map_batches(_prep, batch_format="pyarrow"),
        key_col="user_id",
        ts_col="ts_us",
        id_col="event_id",
        val_col="cents",
    )


SQL_LOCF_FILL = """
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                  CASE WHEN event_type = 'error' THEN NULL
                       ELSE CAST(floor(value * 100 + 0.5) AS BIGINT) END AS cents
           FROM events)
SELECT user_id, ts_us, event_id, cents,
       last_value(cents IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts_us, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cents_filled
FROM e
"""


def q_type_trend(sf_dir: str):
    """Hour-over-hour trend ratio per event type — the "trending"
    analytic (burst detection's ratio core) expressed WITHOUT a window
    engine via the shift-union trick: the hourly count table emits
    itself twice map-side, once at (hour, n_cur=n) and once shifted to
    (hour+1, n_prev=n); ONE more bounded grouped sum re-aligns current
    and previous, and consecutive-hour pairs finalize
    ``trend_ppm = n_cur·10^6 // n_prev``. Both exchanges move only the
    (hours × types)-bounded count table, never events. SQL mirror: LAG
    over hours restricted to adjacent hours."""
    ds = _read(os.path.join(sf_dir, "events.parquet"), ["ts", "event_type"])

    def _hour(t: pa.Table) -> pa.Table:
        h = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "hour": pa.array(h // TREND_HOUR_US, pa.int64()),
                "event_type": t["event_type"].combine_chunks().cast(pa.string()),
            }
        )

    counts = agg.partial_group_agg(
        ds.map_batches(_hour, batch_format="pyarrow"),
        keys=["hour", "event_type"],
        count_as="n",
        n_buckets=16,
    )

    def _shift_union(t: pa.Table) -> pa.Table:
        h = t["hour"].combine_chunks().to_numpy(zero_copy_only=False)
        n = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        et = t["event_type"].combine_chunks()
        zero = np.zeros(len(h), dtype=np.int64)
        cur = pa.table(
            {
                "hour": pa.array(h, pa.int64()),
                "event_type": et,
                "n_cur": pa.array(n, pa.int64()),
                "n_prev": pa.array(zero, pa.int64()),
            }
        )
        prv = pa.table(
            {
                "hour": pa.array(h + 1, pa.int64()),
                "event_type": et,
                "n_cur": pa.array(zero, pa.int64()),
                "n_prev": pa.array(n, pa.int64()),
            }
        )
        return pa.concat_tables([cur, prv])

    aligned = agg.partial_group_agg(
        counts.map_batches(_shift_union, batch_format="pyarrow"),
        keys=["hour", "event_type"],
        sum_cols=["n_cur", "n_prev"],
        count_as=None,
        n_buckets=16,
    )

    def _fin(t: pa.Table) -> pa.Table:
        cur = t["sum_n_cur"].combine_chunks().to_numpy(zero_copy_only=False)
        prv = t["sum_n_prev"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = (cur > 0) & (prv > 0)
        out = pa.table(
            {
                "hour": t["hour"].combine_chunks(),
                "event_type": t["event_type"].combine_chunks(),
                "n_cur": pa.array(cur, pa.int64()),
                "n_prev": pa.array(prv, pa.int64()),
                "trend_ppm": pa.array(
                    cur * 1_000_000 // np.maximum(prv, 1), pa.int64()
                ),
            }
        )
        return out.filter(pa.array(keep))

    return aligned.map_batches(_fin, batch_format="pyarrow")


SQL_TYPE_TREND = f"""
WITH c AS (SELECT epoch_us(ts) // {TREND_HOUR_US} AS hour, event_type,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
p AS (SELECT hour, event_type, n,
             LAG(n) OVER (PARTITION BY event_type ORDER BY hour) AS pn,
             LAG(hour) OVER (PARTITION BY event_type ORDER BY hour) AS ph
      FROM c)
SELECT hour, event_type, n AS n_cur, pn AS n_prev,
       CAST(n * 1000000 // pn AS BIGINT) AS trend_ppm
FROM p WHERE ph = hour - 1
"""


def q_interval_cover(sf_dir: str):
    """Per-user interval-union coverage (stages/window.py:
    interval_flatten): each event spans [ts, ts + ~value×1000 s];
    overlapping-or-touching spans of one user merge into covering
    islands — the crawl-coverage / span-union half of gaps-and-islands
    (scd2 compresses change runs, sessionize cuts point gaps; this
    merges true intervals via a segmented running-max). ONE hash(user)
    exchange, output rows ∝ islands."""
    ds = _read(os.path.join(sf_dir, "events.parquet"), ["user_id", "ts", "value"])

    def _spans(t: pa.Table) -> pa.Table:
        s = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = t["value"].combine_chunks().to_numpy(zero_copy_only=False)
        dur = np.floor(v * 1000.0).astype(np.int64) * 1_000_000
        return pa.table(
            {
                "user_id": t["user_id"].combine_chunks().cast(pa.int64()),
                "start_us": pa.array(s, pa.int64()),
                "end_us": pa.array(s + dur, pa.int64()),
            }
        )

    return window.interval_flatten(
        ds.map_batches(_spans, batch_format="pyarrow")
    )


SQL_INTERVAL_COVER = """
WITH iv AS (SELECT user_id, epoch_us(ts) AS s,
                   epoch_us(ts) + CAST(floor(value * 1000) AS BIGINT) * 1000000 AS e
            FROM events),
w AS (SELECT user_id, s, e,
             MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
      FROM iv),
b AS (SELECT *, CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS brk FROM w),
g AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY s, e
                               ROWS UNBOUNDED PRECEDING) AS isl FROM b)
SELECT user_id, MIN(s) AS cover_start_us, MAX(e) AS cover_end_us,
       CAST(COUNT(*) AS BIGINT) AS n_intervals
FROM g GROUP BY user_id, isl
"""


def q_coverage_gaps(sf_dir: str):
    """Per-user coverage-gap audit — the complement of interval_cover:
    from the merged islands (stages/window.py: interval_flatten), one
    bounded per-user aggregate derives covered time, total span, and
    the UNCOVERED time between islands (span − covered) — the
    monitoring-blind-spot / crawl-gap metric. Islands are already ∝
    merged rows, so the second aggregate is corpus-independent."""
    islands = q_interval_cover(sf_dir)

    def _len(t: pa.Table) -> pa.Table:
        s = t["cover_start_us"].combine_chunks().to_numpy(zero_copy_only=False)
        e = t["cover_end_us"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": t["user_id"].combine_chunks(),
                "len_us": pa.array(e - s, pa.int64()),
                "s": pa.array(s, pa.int64()),
                "e": pa.array(e, pa.int64()),
            }
        )

    aggd = agg.partial_group_agg(
        islands.map_batches(_len, batch_format="pyarrow"),
        keys=["user_id"],
        sum_cols=["len_us"],
        min_cols=["s"],
        max_cols=["e"],
        count_as="n_islands",
        n_buckets=8,
    )

    def _fin(t: pa.Table) -> pa.Table:
        cov = t["sum_len_us"].combine_chunks().to_numpy(zero_copy_only=False)
        lo = t["min_s"].combine_chunks().to_numpy(zero_copy_only=False)
        hi = t["max_e"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": t["user_id"].combine_chunks(),
                "n_islands": t["n_islands"].combine_chunks(),
                "covered_us": pa.array(cov, pa.int64()),
                "span_us": pa.array(hi - lo, pa.int64()),
                "uncovered_us": pa.array(hi - lo - cov, pa.int64()),
            }
        )

    return aggd.map_batches(_fin, batch_format="pyarrow")


def _sql_coverage_gaps() -> str:
    return f"""
WITH islands AS ({SQL_INTERVAL_COVER})
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(SUM(cover_end_us - cover_start_us) AS BIGINT) AS covered_us,
       CAST(MAX(cover_end_us) - MIN(cover_start_us) AS BIGINT) AS span_us,
       CAST(MAX(cover_end_us) - MIN(cover_start_us)
            - SUM(cover_end_us - cover_start_us) AS BIGINT) AS uncovered_us
FROM islands GROUP BY user_id
"""


def q_user_growth(sf_dir: str):
    """Cumulative-distinct growth curve (the DAU/adoption analytic):
    per hour, how many users appeared for the FIRST time and the
    running total of distinct users ever seen. Distinct-over-time is
    windowed COUNT(DISTINCT) — inexpressible as one aggregate — but
    first-touch reduction makes it two bounded exchanges: min(ts) per
    user (user-bounded rows) → count per hour (calendar-bounded rows)
    → one driver cumsum over ≤ calendar-hours rows. Never shuffles the
    raw stream twice, never holds more than bucket-count rows on the
    driver."""
    import ray as _ray

    ds = _read(os.path.join(sf_dir, "events.parquet"), ["user_id", "ts"])

    def _us(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"].combine_chunks().cast(pa.int64()),
                "ts_us": t["ts"].combine_chunks().cast(pa.int64()),
            }
        )

    firsts = agg.partial_group_agg(
        ds.map_batches(_us, batch_format="pyarrow"),
        keys=["user_id"],
        min_cols=["ts_us"],
    )

    def _hour(t: pa.Table) -> pa.Table:
        ts = t["min_ts_us"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({"hour": pa.array(ts // GROWTH_HOUR_US, pa.int64())})

    hourly = agg.partial_group_agg(
        firsts.map_batches(_hour, batch_format="pyarrow"),
        keys=["hour"],
        count_as="new_users",
    )
    blocks = [
        b
        for b in _ray.get(hourly.to_arrow_refs())
        if b.num_rows and {"hour", "new_users"} <= set(b.column_names)
    ]
    if not blocks:
        return pa.schema(
            [("hour", pa.int64()), ("new_users", pa.int64()), ("cum_users", pa.int64())]
        ).empty_table()
    t = pa.concat_tables(blocks).combine_chunks().sort_by([("hour", "ascending")])
    cum = np.cumsum(t["new_users"].to_numpy(zero_copy_only=False))
    return t.append_column("cum_users", pa.array(cum, pa.int64()))


SQL_USER_GROWTH = f"""
WITH f AS (SELECT user_id, MIN(epoch_us(ts)) AS first_ts FROM events GROUP BY user_id),
d AS (SELECT first_ts // {GROWTH_HOUR_US} AS hour, CAST(COUNT(*) AS BIGINT) AS new_users
      FROM f GROUP BY 1)
SELECT hour, new_users,
       CAST(SUM(new_users) OVER (ORDER BY hour ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_users
FROM d
"""


def q_sessions_keyed_wm(sf_dir: str):
    """Event-time sessions under PER-KEY watermarks (stages/window.py:
    session_windows(per_key_watermark=True) — the Flink keyed-source
    shape): each user's watermark is their OWN max event time −
    lateness, derived bucket-locally with zero global aggregates; an
    idle user's last session faithfully never finalizes. SQL mirror
    swaps the scalar-subquery watermark for a windowed per-user MAX."""
    ds = _read(os.path.join(sf_dir, "events.parquet"), ["user_id", "ts"])
    return window.session_windows(
        ds,
        gap_us=SESSIONS_LATE_GAP_US,
        allowed_lateness_us=SESSIONS_LATE_LATENESS_US,
        per_key_watermark=True,
    )


SQL_SESSIONS_KEYED_WM = f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
o AS (SELECT user_id, t,
             CASE WHEN t - LAG(t) OVER (PARTITION BY user_id ORDER BY t)
                    > {SESSIONS_LATE_GAP_US}
                  OR LAG(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
                  THEN 1 ELSE 0 END AS brk,
             MAX(t) OVER (PARTITION BY user_id) AS umax FROM e),
i AS (SELECT user_id, t, umax, SUM(brk) OVER (PARTITION BY user_id ORDER BY t
        ROWS UNBOUNDED PRECEDING) AS sid FROM o),
g AS (SELECT user_id, MIN(t) AS session_start_us, MAX(t) AS session_end_us,
             CAST(COUNT(*) AS BIGINT) AS n_events, MAX(umax) AS umax
      FROM i GROUP BY user_id, sid)
SELECT user_id, session_start_us, session_end_us, n_events,
       CAST(CASE WHEN session_end_us + {SESSIONS_LATE_GAP_US}
                      <= umax - {SESSIONS_LATE_LATENESS_US}
                 THEN 1 ELSE 0 END AS BIGINT) AS is_final
FROM g
"""


def q_user_mode_type(sf_dir: str):
    """Per-group MODE with deterministic tie-break (the categorical
    summary statistic): each user's most frequent event type, ties to
    the lexically smaller type. One bounded (user, type) count
    exchange, then top_rows_by's associative k=1 selection — the
    shuffle never sees raw events twice."""
    from rio_cogeo_ray.stages.agg import top_rows_by

    ds = _read(os.path.join(sf_dir, "events.parquet"), ["user_id", "event_type"])
    counts = agg.partial_group_agg(
        ds, keys=["user_id", "event_type"], count_as="n", n_buckets=16
    )
    return top_rows_by(
        counts,
        keys=["user_id"],
        order_by=[("n", "descending"), ("event_type", "ascending")],
        k=1,
        n_buckets=16,
    )


SQL_USER_MODE_TYPE = """
WITH c AS (SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY n DESC, event_type) AS rk
      FROM c)
SELECT user_id, event_type, n FROM r WHERE rk = 1
"""


def q_resample_hourly(sf_dir: str):
    """Regular-grid resampling with exact linear interpolation
    (stages/window.py: resample_interp — the time-series alignment op
    that changes the time INDEX): per user, the milli-value at every
    whole hour inside their observation span, interpolated between
    neighbouring events with TRUNC integer division (the DuckDB `//`
    mirror). One hash(user) exchange; prev/next are two global
    searchsorted calls on a per-key remapped monotone axis."""
    ds = _read(
        os.path.join(sf_dir, "events.parquet"),
        ["user_id", "ts", "event_id", "value"],
    )

    def _q(t: pa.Table) -> pa.Table:
        v = t["value"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": t["user_id"].combine_chunks(),
                "ts_us": t["ts"].combine_chunks().cast(pa.int64()),
                "event_id": t["event_id"].combine_chunks(),
                "vq": pa.array(np.floor(v * 1000 + 0.5).astype(np.int64), pa.int64()),
            }
        )

    return window.resample_interp(
        ds.map_batches(_q, batch_format="pyarrow"), grid_us=RESAMPLE_GRID_US
    )


SQL_RESAMPLE_HOURLY = f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_id,
                  CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v FROM events),
b AS (SELECT user_id, MIN(t) AS mn, MAX(t) AS mx FROM e GROUP BY 1),
gr AS (SELECT user_id,
              unnest(range(((mn + {RESAMPLE_GRID_US} - 1) // {RESAMPLE_GRID_US})
                             * {RESAMPLE_GRID_US},
                           mx + 1, {RESAMPLE_GRID_US})) AS gt
       FROM b),
u AS (SELECT user_id, t, event_id, v, 0 AS is_grid, NULL AS gt FROM e
      UNION ALL
      SELECT user_id, gt, NULL, NULL, 1, gt FROM gr),
w AS (SELECT *,
        last_value(v IGNORE NULLS) OVER wp AS vp,
        last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER wp AS tp,
        first_value(v IGNORE NULLS) OVER wf AS vn,
        first_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER wf AS tn
      FROM u
      WINDOW wp AS (PARTITION BY user_id ORDER BY t, is_grid, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY user_id ORDER BY t, is_grid, event_id
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
SELECT user_id, CAST(gt AS BIGINT) AS grid_us,
       CAST(CASE WHEN tn > tp THEN vp + ((vn - vp) * (gt - tp)) // (tn - tp)
                 ELSE vp END AS BIGINT) AS v_interp
FROM w WHERE is_grid = 1
"""


def q_events_sliding(sf_dir: str):
    """Sliding 2h windows every 1h per event_type (overlap factor 2:
    per-batch explode → partial agg; each event lands in exactly two
    windows, mirrored as UNION ALL of two shifted groupbys in SQL)."""
    ds = _read(os.path.join(sf_dir, "events.parquet"), ["event_type", "ts", "value"])
    return window.sliding_aggregate(ds)


SQL_EVENTS_SLIDING = (
    "WITH e AS (SELECT event_type, epoch_us(ts) // 3600000000 AS base, "
    f"{_SLIDE_Q} AS q FROM events) "
    "SELECT event_type, window_id, CAST(SUM(q) AS BIGINT) AS sum_value_q, "
    "CAST(COUNT(*) AS BIGINT) AS n FROM ("
    "SELECT event_type, base AS window_id, q FROM e "
    "UNION ALL SELECT event_type, base - 1 AS window_id, q FROM e"
    ") GROUP BY event_type, window_id"
)


def q_events_watermark(sf_dir: str):
    """Watermark late-event drop: keep events within 24h of the global
    max event time (tiny Max aggregate → broadcast scalar filter)."""
    ds = _read(os.path.join(sf_dir, "events.parquet"), ["event_id", "ts"])
    out = window.watermark_filter(ds, delay_us=24 * 3_600_000_000)
    return out.map_batches(
        lambda t: pa.table(
            {
                "event_id": t["event_id"].combine_chunks().cast(pa.int64()),
                "ts_us": t["ts"].combine_chunks().cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


SQL_EVENTS_WATERMARK = (
    "SELECT event_id, epoch_us(ts) AS ts_us FROM events "
    "WHERE epoch_us(ts) >= (SELECT MAX(epoch_us(ts)) FROM events) - 86400000000"
)


def q_latest_event(sf_dir: str):
    """Snapshot dedup (keep-latest row per key) via ``agg.latest_by``:
    per-batch argmax combine → bucketed final argmax, so the shuffle
    carries ≤1 candidate row per user per batch. Tie-break on the
    unique event_id keeps it deterministic (and SQL-mirrorable)."""
    ev = _read(
        os.path.join(sf_dir, "events.parquet"),
        ["user_id", "ts", "event_id", "event_type", "value"],
    )
    return agg.latest_by(ev, keys=["user_id"], order_by=["ts", "event_id"])


SQL_LATEST_EVENT = (
    "SELECT user_id, ts, event_id, event_type, value FROM ("
    "SELECT user_id, ts, event_id, event_type, value, "
    "ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn "
    "FROM events) WHERE rn = 1"
)


def q_events_in_ranges(sf_dir: str):
    """Fan-out OVERLAPPING-interval join (stages/join.py:
    broadcast_interval_join): every event joins ALL tiers whose
    [lo, hi) contains its value — the general range join RangeLookup's
    non-overlapping contract refuses — then a per-tier partial→final
    aggregate. Cents quantized pre-shuffle so sums are exact int64."""
    import pyarrow.compute as pc

    tiers = pa.table(
        {
            "tier": pa.array([t[0] for t in EVENT_TIERS], pa.string()),
            "lo": pa.array([t[1] for t in EVENT_TIERS], pa.float64()),
            "hi": pa.array([t[2] for t in EVENT_TIERS], pa.float64()),
        }
    )
    ds = _read(os.path.join(sf_dir, "events.parquet"), ["value"])

    def _cents(t: pa.Table) -> pa.Table:
        v = t["value"].combine_chunks().to_numpy(zero_copy_only=False)
        return t.append_column(
            "cents", pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64), pa.int64())
        )

    joined = join_mod.broadcast_interval_join(
        ds.map_batches(_cents, batch_format="pyarrow"), tiers, value_col="value"
    )
    return agg.partial_group_agg(
        joined.map_batches(
            lambda t: t.select(["tier", "cents"]), batch_format="pyarrow"
        ),
        keys=["tier"],
        sum_cols=["cents"],
        count_as="n",
    )


SQL_EVENTS_IN_RANGES = (
    "WITH tiers(tier, lo, hi) AS (VALUES "
    + ", ".join(f"('{n}', {lo!r}, {hi!r})" for n, lo, hi in EVENT_TIERS)
    + ") SELECT t.tier, CAST(SUM(CAST(floor(e.value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents, "
    "CAST(COUNT(*) AS BIGINT) AS n "
    "FROM events e JOIN tiers t ON e.value >= t.lo AND e.value < t.hi "
    "GROUP BY t.tier"
)


def q_event_transitions(sf_dir: str):
    """Per-user event-type transition (Markov bigram) counts
    (stages/window.py:event_transitions)."""
    ds = _read(
        os.path.join(sf_dir, "events.parquet"),
        ["event_id", "ts", "user_id", "event_type"],
    )
    return window.event_transitions(ds)


SQL_EVENT_TRANSITIONS = (
    "WITH o AS (SELECT user_id, event_type, "
    "LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type "
    "FROM events) "
    "SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n "
    "FROM o WHERE prev_type IS NOT NULL GROUP BY prev_type, event_type"
)


def q_user_paths(sf_dir: str):
    """Per-user event journey (stages/window.py: path_agg) — ordered
    string_agg, built at the O(output-chars) floor with two Arrow
    kernels (ListArray over group offsets + binary_join)."""
    ds = _read(
        os.path.join(sf_dir, "events.parquet"),
        ["user_id", "ts", "event_id", "event_type"],
    )
    return window.path_agg(ds, "user_id", "ts", "event_id", "event_type")


SQL_USER_PATHS = (
    "SELECT user_id, string_agg(event_type, '>' ORDER BY ts, event_id) AS path "
    "FROM events GROUP BY user_id"
)


def q_value_histogram(sf_dir: str):
    """Distributed two-pass exact numeric histogram over lineitem
    prices: pass 1 = global min/max via per-batch partials (the driver
    sees ONE row); pass 2 = vectorized bin index
    ``floor((x − min)·B / (max − min))`` clamped to B−1, then partial
    per-bin counts → bucketed final sum (≤B rows ever exchanged per
    batch). Bit-identical to the SQL mirror because the bin expression
    keeps the same IEEE-double operand order in both engines; a
    degenerate min==max input collapses to bin 0 in both."""
    li = _read(os.path.join(sf_dir, "lineitem.parquet"), ["l_extendedprice"])
    empty = pa.table(
        {"bin": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
    )
    ext = agg.partial_group_agg(
        li.map_batches(
            lambda t: t.append_column(
                "g", pa.array(np.zeros(len(t), np.int64))
            ),
            batch_format="pyarrow",
        ),
        keys=["g"],
        min_cols=["l_extendedprice"],
        max_cols=["l_extendedprice"],
        count_as=None,
    ).take_all()
    if not ext:
        return rd.from_arrow(empty)
    mn = ext[0]["min_l_extendedprice"]
    mx = ext[0]["max_l_extendedprice"]
    nb = HIST_BINS

    def _bin(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"bin": pa.array([], pa.int64())})
        x = t["l_extendedprice"].combine_chunks().to_numpy(zero_copy_only=False)
        if mx == mn:
            b = np.zeros(len(x), np.int64)
        else:
            b = np.minimum(
                np.floor((x - mn) * nb / (mx - mn)), nb - 1
            ).astype(np.int64)
        return pa.table({"bin": pa.array(b, pa.int64())})

    return agg.partial_group_agg(
        li.map_batches(_bin, batch_format="pyarrow"), keys=["bin"], count_as="n"
    )


SQL_VALUE_HISTOGRAM = f"""
WITH ext AS (SELECT MIN(l_extendedprice) AS mn, MAX(l_extendedprice) AS mx
             FROM lineitem)
SELECT CAST(CASE WHEN mx = mn THEN 0
            ELSE LEAST(FLOOR((l_extendedprice - mn) * {HIST_BINS} / (mx - mn)),
                       {HIST_BINS - 1}) END AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem, ext
GROUP BY 1
"""


def q_rolling_value(sf_dir: str):
    """Per-user trailing row window (stages/window.py:rolling_sum):
    sum/count of the last 4 events (3 PRECEDING + current) ordered by
    (ts, event_id) — the unique tiebreak makes the frame
    permutation-exact. Value quantized to milli-units (exact-sum
    doctrine)."""
    ds = _read(
        os.path.join(sf_dir, "events.parquet"),
        ["user_id", "ts", "event_id", "value"],
    )

    def _q(t: pa.Table) -> pa.Table:
        v = t["value"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": t["user_id"].combine_chunks(),
                "ts": t["ts"].combine_chunks(),
                "event_id": t["event_id"].combine_chunks(),
                "vq": pa.array(np.floor(v * 1000 + 0.5).astype(np.int64), pa.int64()),
            }
        )

    return window.rolling_sum(
        ds.map_batches(_q, batch_format="pyarrow"), preceding=3
    )


SQL_ROLLING_VALUE = (
    "WITH q AS (SELECT user_id, event_id, epoch_us(ts) AS t_us, "
    "CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS vq FROM events) "
    "SELECT user_id, event_id, t_us, "
    "CAST(SUM(vq) OVER w AS BIGINT) AS roll_sum_q, "
    "CAST(COUNT(*) OVER w AS BIGINT) AS n_win FROM q "
    "WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id "
    "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)"
)


def q_rolling_peak(sf_dir: str):
    """Per-user trailing-row MAX (stages/window.py: rolling_max — the
    extreme-value sibling of rolling_sum; max doesn't telescope, so
    the kernel is preceding+1 masked shifted-compare passes): peak
    milli-value over the last 4 events ordered by (ts, event_id)."""
    ds = _read(
        os.path.join(sf_dir, "events.parquet"),
        ["user_id", "ts", "event_id", "value"],
    )

    def _q(t: pa.Table) -> pa.Table:
        v = t["value"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": t["user_id"].combine_chunks(),
                "ts": t["ts"].combine_chunks(),
                "event_id": t["event_id"].combine_chunks(),
                "vq": pa.array(np.floor(v * 1000 + 0.5).astype(np.int64), pa.int64()),
            }
        )

    return window.rolling_max(
        ds.map_batches(_q, batch_format="pyarrow"), preceding=3
    )


SQL_ROLLING_PEAK = (
    "WITH q AS (SELECT user_id, event_id, epoch_us(ts) AS t_us, "
    "CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS vq FROM events) "
    "SELECT user_id, event_id, t_us, "
    "CAST(MAX(vq) OVER w AS BIGINT) AS roll_max_q, "
    "CAST(COUNT(*) OVER w AS BIGINT) AS n_win FROM q "
    "WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id "
    "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)"
)


def q_event_gaps(sf_dir: str):
    """Gaps-and-islands (gap half — stages/window.py:event_gaps): per
    user, consecutive-event pairs >= 2h apart. LEAD() mirror; equal
    timestamps are tie-order-proof (consecutive pairs of a sorted
    multiset are unique)."""
    ds = _read(os.path.join(sf_dir, "events.parquet"), ["user_id", "ts"])
    return window.event_gaps(ds, min_gap_us=EVENT_GAP_US)


SQL_EVENT_GAPS = (
    "WITH s AS (SELECT user_id, epoch_us(ts) AS t, "
    "LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS nxt "
    "FROM events) "
    "SELECT user_id, t AS gap_start_us, nxt AS gap_end_us, nxt - t AS gap_us "
    f"FROM s WHERE nxt - t >= {EVENT_GAP_US}"
)

