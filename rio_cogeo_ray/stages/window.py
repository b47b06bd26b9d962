"""Stream-shaped operators over the `events` log — tumbling windows and
gap sessionization.

Ray Data is a (streaming-)batch engine with no event-time watermarks;
stream-shaped semantics are expressed over the ordered, partitioned log
(ray_guide.md pattern): tumbling windows are a pure key derivation
(window id = ts // size) followed by the generic partial→final grouped
aggregate; session windows hash users into reduce buckets and cut on
gaps in one vectorized pass per bucket; sliding windows explode per
batch; the watermark filter broadcasts a global Max.

Ordering assumption: sessionize sees ALL events of one user in one
bucket (guaranteed by the hash route + groupby shuffle), sorted inside
the bucket kernel, so input order never matters.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from rio_cogeo_ray.stages.agg import partial_group_agg

US_PER_HOUR = 3_600_000_000


def add_tumbling_window(batch: pa.Table, ts_col: str = "ts", size_us: int = US_PER_HOUR) -> pa.Table:
    """+ window_id = floor(epoch_us / size) (int64; SQL: epoch_us(ts) //
    size). Integer floor division — identical everywhere."""
    ts = batch[ts_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
    win = ts // size_us
    return batch.append_column("window_id", pa.array(win, pa.int64()))


def tumbling_aggregate(
    ds,
    key_col: str = "event_type",
    ts_col: str = "ts",
    size_us: int = US_PER_HOUR,
    value_col: str = "value",
    value_scale: int = 1000,
):
    """Per (key, window): count + exact min/max of value + int sum of
    round(value*scale) (float sums are order-dependent, so the engine
    quantizes — mirrored literally in the oracle SQL)."""

    def _prep(t: pa.Table) -> pa.Table:
        t = add_tumbling_window(t, ts_col, size_us)
        v = t[value_col].combine_chunks().to_numpy(zero_copy_only=False)
        # floor(x*scale + 0.5), NOT np.round: banker's rounding differs
        # from SQL ROUND; this literal op order is mirrored in the oracle
        q = np.floor(v * value_scale + 0.5).astype(np.int64)
        return t.append_column("value_q", pa.array(q, pa.int64()))

    prepped = ds.map_batches(_prep, batch_format="pyarrow")
    return partial_group_agg(
        prepped,
        keys=[key_col, "window_id"],
        sum_cols=["value_q"],
        min_cols=[value_col],
        max_cols=[value_col],
        count_as="n",
    )


def _sessionize_bucket(group: pa.Table, ts_col: str, gap_us: int) -> pa.Table:
    """MANY users (one reduce bucket) → one summary row each, fully
    vectorized: sort (user, ts); session starts = user boundary OR gap
    > gap_us; per-session lengths via reduceat over start indices;
    per-user session count / longest via a second reduceat level.
    O(bucket) numpy, zero per-user Python — the bucketed map_groups
    pattern (stages/agg.py doc)."""
    if len(group) == 0:
        return pa.schema(
            [("user_id", pa.int64()), ("n_events", pa.int64()),
             ("n_sessions", pa.int64()), ("longest_session", pa.int64())]
        ).empty_table()
    group = group.sort_by([("user_id", "ascending"), (ts_col, "ascending")])
    uid = group["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
    ts = group[ts_col].combine_chunks().to_numpy(zero_copy_only=False)
    new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
    sess_start = new_user | np.concatenate(([True], (ts[1:] - ts[:-1]) > gap_us))
    s_starts = np.flatnonzero(sess_start)
    sess_len = np.diff(np.append(s_starts, len(uid)))
    # sessions per user: reduce session rows by their owning user
    u_starts_rows = np.flatnonzero(new_user)
    u_first_sess = np.searchsorted(s_starts, u_starts_rows)  # new_user ⇒ sess_start
    n_sessions = np.diff(np.append(u_first_sess, len(s_starts)))
    longest = np.maximum.reduceat(sess_len, u_first_sess)
    n_events = np.diff(np.append(u_starts_rows, len(uid)))
    return pa.table(
        {
            "user_id": pa.array(uid[u_starts_rows], pa.int64()),
            "n_events": pa.array(n_events.astype(np.int64), pa.int64()),
            "n_sessions": pa.array(n_sessions.astype(np.int64), pa.int64()),
            "longest_session": pa.array(longest.astype(np.int64), pa.int64()),
        }
    )


def sessionize(ds, ts_col: str = "ts", gap_us: int = 30 * 60 * 1_000_000, n_buckets: int = 64):
    """Gap-based session windows per user. Users hash into ``n_buckets``
    reduce buckets (every event of one user lands in one bucket, the
    only partitioning assumption); each bucket sessionizes ALL its
    users in one vectorized pass, so per-group Python cost is
    O(n_buckets), not O(users)."""
    from rio_cogeo_ray.functions.hashing import splitmix64

    def _cast(t: pa.Table) -> pa.Table:
        u = t["user_id"].combine_chunks().cast(pa.int64())
        b = (splitmix64(u.to_numpy(zero_copy_only=False).astype(np.uint64))
             % np.uint64(n_buckets)).astype(np.int64)
        return pa.table(
            {
                "user_id": u,
                ts_col: t[ts_col].combine_chunks().cast(pa.int64()),
                "__bucket": pa.array(b, pa.int64()),
            }
        )

    slim = ds.map_batches(_cast, batch_format="pyarrow")
    return slim.groupby("__bucket").map_groups(
        lambda g: _sessionize_bucket(g.drop_columns(["__bucket"]), ts_col, gap_us),
        batch_format="pyarrow",
    )


def session_windows(
    ds,
    ts_col: str = "ts",
    gap_us: int = 30 * 60 * 1_000_000,
    allowed_lateness_us: int = US_PER_HOUR,
    n_buckets: int = 64,
    per_key_watermark: bool = False,
):
    """Event-time session windows with ALLOWED LATENESS — per-session
    rows (user_id, session_start_us, session_end_us, n_events,
    is_final), the streaming-depth shape beyond :func:`sessionize`'s
    per-user summaries.

    Semantics (the batch analog of a lateness-lagged watermark,
    deterministic in the data, never in arrival order — the
    :func:`watermark_filter` doctrine): the watermark is
    ``max(event time) − allowed_lateness``; a session window FINALIZES
    (``is_final = 1``) once the watermark passes its close, i.e.
    ``session_end + gap ≤ watermark`` — until then a late event within
    the allowed lateness could still extend it, so it is emitted as an
    open window (``is_final = 0``). Session assignment itself is the
    LAG-gap rule over event time (ties collapse: equal timestamps give
    zero gaps, so tie order never moves a boundary).

    Scale shape: a tiny Max aggregate (one int per block) feeds the
    watermark; events then shuffle once into hash(user) buckets (the
    sessionize partitioning contract) and each bucket emits all its
    sessions in one vectorized pass — O(n_buckets) Python, output rows
    ∝ sessions. SQL mirror: LAG-gap islands + GROUP BY + a scalar
    subquery watermark.

    ``per_key_watermark=True`` switches to KEYED watermarks (the Flink
    keyed-source shape): each user's watermark is that user's OWN
    ``max(ts) − lateness``, computed bucket-locally (every event of a
    user co-locates, so no global aggregate and no materialize at
    all). Caveat, faithfully reproduced from the streaming world: an
    idle key's watermark never advances, so each user's LAST session
    can only finalize if the user kept emitting past it — with a
    positive gap + lateness the final session of every user stays
    open. SQL mirror: the windowed MAX(ts) OVER (PARTITION BY user)
    replaces the scalar subquery."""
    import pyarrow.compute as pc  # noqa: F401 (parity with sibling ops)

    from ray.data.aggregate import Max

    from rio_cogeo_ray.functions.hashing import splitmix64

    def _cast(t: pa.Table) -> pa.Table:
        u = t["user_id"].combine_chunks().cast(pa.int64())
        b = (splitmix64(u.to_numpy(zero_copy_only=False).astype(np.uint64))
             % np.uint64(n_buckets)).astype(np.int64)
        return pa.table(
            {
                "user_id": u,
                ts_col: t[ts_col].combine_chunks().cast(pa.int64()),
                "__bucket": pa.array(b, pa.int64()),
            }
        )

    schema = pa.schema(
        [("user_id", pa.int64()), ("session_start_us", pa.int64()),
         ("session_end_us", pa.int64()), ("n_events", pa.int64()),
         ("is_final", pa.int64())]
    )
    if per_key_watermark:
        slim = ds.map_batches(_cast, batch_format="pyarrow")
        wm = None  # per-user, derived inside each bucket
    else:
        slim = ds.map_batches(_cast, batch_format="pyarrow").materialize()
        mx = slim.aggregate(Max(ts_col))[f"max({ts_col})"]
        if mx is None:  # empty stream
            return slim.map_batches(
                lambda t: schema.empty_table(), batch_format="pyarrow"
            )
        wm = int(mx) - allowed_lateness_us

    def _bucket(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return schema.empty_table()
        group = group.sort_by(
            [("user_id", "ascending"), (ts_col, "ascending")]
        )
        uid = group["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = group[ts_col].combine_chunks().to_numpy(zero_copy_only=False)
        new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
        sess_start = new_user | np.concatenate(
            ([True], (ts[1:] - ts[:-1]) > gap_us)
        )
        s_starts = np.flatnonzero(sess_start)
        s_ends = np.append(s_starts[1:], len(uid)) - 1
        n = np.diff(np.append(s_starts, len(uid)))
        end_ts = ts[s_ends]
        if per_key_watermark:
            # user's own max ts: sessions are sorted per user, so the
            # LAST session's end of each user run is that user's max
            run_of_sess = np.cumsum(new_user[s_starts]) - 1
            user_max = np.maximum.reduceat(end_ts, np.flatnonzero(new_user[s_starts]))
            wm_sess = user_max[run_of_sess] - allowed_lateness_us
        else:
            wm_sess = wm
        return pa.table(
            {
                "user_id": pa.array(uid[s_starts], pa.int64()),
                "session_start_us": pa.array(ts[s_starts], pa.int64()),
                "session_end_us": pa.array(end_ts, pa.int64()),
                "n_events": pa.array(n.astype(np.int64), pa.int64()),
                "is_final": pa.array(
                    (end_ts + gap_us <= wm_sess).astype(np.int64), pa.int64()
                ),
            }
        )

    return slim.groupby("__bucket").map_groups(
        lambda g: _bucket(g.drop_columns(["__bucket"])),
        batch_format="pyarrow",
    )


def add_sliding_windows(
    batch: pa.Table,
    ts_col: str = "ts",
    size_us: int = 2 * US_PER_HOUR,
    slide_us: int = US_PER_HOUR,
) -> pa.Table:
    """Explode each event into every sliding window containing it
    (size/slide windows per event; window_id = start // slide).
    Requires size % slide == 0. A pure per-batch flat-map — the
    overlap factor multiplies shuffle rows, so keep size/slide small
    (2 here) and pre-aggregate after exploding, never before."""
    k = size_us // slide_us
    if size_us % slide_us:
        raise ValueError("size_us must be a multiple of slide_us")
    ts = batch[ts_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
    base = ts // slide_us  # last window whose span contains ts
    rep = np.repeat(np.arange(len(batch), dtype=np.int64), k)
    offs = np.tile(np.arange(k, dtype=np.int64), len(batch))
    win = base[rep] - offs
    out = batch.take(pa.array(rep, pa.int64()))
    return out.append_column("window_id", pa.array(win, pa.int64()))


def sliding_aggregate(
    ds,
    key_col: str = "event_type",
    ts_col: str = "ts",
    size_us: int = 2 * US_PER_HOUR,
    slide_us: int = US_PER_HOUR,
    value_col: str = "value",
    value_scale: int = 1000,
):
    """Per (key, sliding window): count + int sum of round(value*scale).
    Same quantization doctrine as tumbling_aggregate."""

    def _prep(t: pa.Table) -> pa.Table:
        t = add_sliding_windows(t, ts_col, size_us, slide_us)
        v = t[value_col].combine_chunks().to_numpy(zero_copy_only=False)
        q = np.floor(v * value_scale + 0.5).astype(np.int64)
        return t.append_column("value_q", pa.array(q, pa.int64()))

    prepped = ds.map_batches(_prep, batch_format="pyarrow")
    return partial_group_agg(
        prepped, keys=[key_col, "window_id"], sum_cols=["value_q"], count_as="n"
    )


def watermark_filter(ds, ts_col: str = "ts", delay_us: int = US_PER_HOUR):
    """Drop events older than (global max event time − delay) — the
    batch analog of a watermark late-event drop. Two passes, both
    streaming: a tiny Max aggregate (one int per block reaches the
    driver), then a broadcast scalar filter. The watermark is a
    deterministic function of the data, not of arrival order."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Max

    def _as_us(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index(ts_col), ts_col,
            t[ts_col].combine_chunks().cast(pa.int64()),
        )

    slim = ds.map_batches(_as_us, batch_format="pyarrow")
    mx = slim.aggregate(Max(ts_col))[f"max({ts_col})"]
    if mx is None:  # empty stream: no watermark, nothing to filter
        return slim
    wm = mx - delay_us
    return slim.map_batches(
        lambda t: t.filter(pc.greater_equal(t[ts_col], pa.scalar(wm, pa.int64()))),
        batch_format="pyarrow",
    )


def event_transitions(
    ds,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    n_buckets: int = 64,
):
    """Per-user consecutive-event TRANSITION counts (the sequence /
    Markov-bigram operator): for each user's events ordered by
    (ts, id) — the id tie-break makes exact-timestamp ties
    deterministic in both engines — count (prev_type → type) pairs
    over the whole corpus.

    Partitioning: every event of one user lands in one reduce bucket
    (``hash(user) % n_buckets``, the sessionize contract); each bucket
    sorts and shifts ALL its users in one vectorized pass (pair exists
    only where the shifted row is the same user), collapses pairs with
    an in-memory Arrow group-count, and a final partial→final group-sum
    merges buckets. Python cost O(n_buckets), shuffle rows bounded by
    distinct (bucket, pair) counts. SQL mirror: LAG() OVER (PARTITION
    BY user ORDER BY ts, id)."""
    from rio_cogeo_ray.functions.hashing import splitmix64
    from rio_cogeo_ray.stages.agg import partial_group_agg

    def _cast(t: pa.Table) -> pa.Table:
        u = t[user_col].combine_chunks().cast(pa.int64())
        b = (
            splitmix64(u.to_numpy(zero_copy_only=False).astype(np.uint64))
            % np.uint64(n_buckets)
        ).astype(np.int64)
        return pa.table(
            {
                user_col: u,
                ts_col: t[ts_col].combine_chunks().cast(pa.int64()),
                id_col: t[id_col].combine_chunks().cast(pa.int64()),
                type_col: t[type_col].combine_chunks(),
                "__bucket": pa.array(b, pa.int64()),
            }
        )

    def _pairs(g: pa.Table) -> pa.Table:
        g = g.sort_by(
            [(user_col, "ascending"), (ts_col, "ascending"), (id_col, "ascending")]
        )
        if len(g) < 2:
            return pa.table(
                {
                    "prev_type": pa.array([], pa.string()),
                    type_col: pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        u = g[user_col].combine_chunks().to_numpy(zero_copy_only=False)
        ty = g[type_col].combine_chunks()
        same = u[1:] == u[:-1]
        idx = np.flatnonzero(same)
        pairs = pa.table(
            {
                "prev_type": ty.take(pa.array(idx, pa.int64())),
                type_col: ty.take(pa.array(idx + 1, pa.int64())),
            }
        )
        counted = pairs.group_by(["prev_type", type_col]).aggregate(
            [([], "count_all")]
        )
        return counted.rename_columns(["prev_type", type_col, "n"]).set_column(
            2, "n", counted["count_all"].cast(pa.int64())
        )

    slim = ds.map_batches(_cast, batch_format="pyarrow")
    per_bucket = slim.groupby("__bucket").map_groups(
        lambda g: _pairs(g.drop_columns(["__bucket"])), batch_format="pyarrow"
    )
    out = partial_group_agg(
        per_bucket, keys=["prev_type", type_col], sum_cols=["n"], count_as=None
    )
    return out.map_batches(
        lambda t: pa.table(
            {"prev_type": t["prev_type"], type_col: t[type_col], "n": t["sum_n"]}
        ),
        batch_format="pyarrow",
    )


def running_total(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    scale: int = 100,
    n_buckets: int = 64,
):
    """Per-key running cumulative sum ordered by (ts, id) — the
    analytic-window operator (SQL ``SUM() OVER (PARTITION BY key
    ORDER BY ts, id)``). Values quantize to int64 (``floor(v*scale +
    0.5)``) so the running sums are associative and bit-exact at any
    parallelism.

    Partitioning: one key's FULL history co-locates in one reduce
    bucket (``hash(key) % n_buckets`` — the sessionize contract); the
    bucket sorts once and computes EVERY key's cumsum in one
    vectorized pass (global cumsum minus the per-key segment offset),
    so Python cost is O(n_buckets), not O(keys).
    """
    from rio_cogeo_ray.functions.hashing import splitmix64

    def _cast(t: pa.Table) -> pa.Table:
        k = t[key_col].combine_chunks().cast(pa.int64())
        v = t[value_col].combine_chunks().to_numpy(zero_copy_only=False)
        b = (
            splitmix64(k.to_numpy(zero_copy_only=False).astype(np.uint64))
            % np.uint64(n_buckets)
        ).astype(np.int64)
        return pa.table(
            {
                key_col: k,
                ts_col: t[ts_col].combine_chunks().cast(pa.int64()),
                id_col: t[id_col].combine_chunks().cast(pa.int64()),
                "v_q": pa.array(np.floor(v * scale + 0.5).astype(np.int64), pa.int64()),
                "__bucket": pa.array(b, pa.int64()),
            }
        )

    def _cumsum_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__bucket"]).sort_by(
            [(key_col, "ascending"), (ts_col, "ascending"), (id_col, "ascending")]
        )
        keys = g[key_col].combine_chunks().to_numpy(zero_copy_only=False)
        vals = g["v_q"].combine_chunks().to_numpy(zero_copy_only=False)
        c = np.cumsum(vals)
        new = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            new[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(new)
        # cumsum BEFORE each key's first row, repeated over its run
        seg_off = np.repeat(
            np.where(starts > 0, c[starts - 1], 0),
            np.diff(np.append(starts, len(g))),
        )
        return g.append_column("running", pa.array(c - seg_off, pa.int64()))

    return (
        ds.map_batches(_cast, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(_cumsum_bucket, batch_format="pyarrow")
    )


def path_agg(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "event_type",
    sep: str = ">",
    n_buckets: int = 64,
):
    """Ordered per-key string aggregation (SQL ``string_agg(value, sep
    ORDER BY ts, id)``) — the journey/path operator. Output size IS the
    concatenated strings, so the per-key cost floor is O(output chars);
    the implementation hits that floor fully vectorized: one bucket
    sort, then ``pa.ListArray.from_arrays`` over the group offsets +
    ``pc.binary_join`` build every key's path in two Arrow kernel
    calls (no per-key Python).

    Partitioning: one key's events co-locate in one reduce bucket
    (``hash(key) % n_buckets``); a key's full path must fit a worker —
    cap pathological keys upstream if value counts are unbounded.
    """
    import pyarrow.compute as pc

    from rio_cogeo_ray.functions.hashing import splitmix64

    def _cast(t: pa.Table) -> pa.Table:
        k = t[key_col].combine_chunks().cast(pa.int64())
        b = (
            splitmix64(k.to_numpy(zero_copy_only=False).astype(np.uint64))
            % np.uint64(n_buckets)
        ).astype(np.int64)
        return pa.table(
            {
                key_col: k,
                ts_col: t[ts_col].combine_chunks().cast(pa.int64()),
                id_col: t[id_col].combine_chunks().cast(pa.int64()),
                value_col: t[value_col].combine_chunks(),
                "__bucket": pa.array(b, pa.int64()),
            }
        )

    def _join_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__bucket"]).sort_by(
            [(key_col, "ascending"), (ts_col, "ascending"), (id_col, "ascending")]
        )
        keys = g[key_col].combine_chunks().to_numpy(zero_copy_only=False)
        new = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            new[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(new)
        # int64 offsets + large_string values: a bucket may legitimately
        # hold > 2^31 bytes of path data at scale — no 32-bit ceiling
        offsets = pa.array(np.append(starts, len(g)).astype(np.int64), pa.int64())
        vals = g[value_col].combine_chunks().cast(pa.large_string())
        lists = pa.LargeListArray.from_arrays(offsets, vals)
        joined = pc.binary_join(lists, pa.scalar(sep, pa.large_string()))
        # Downcast to string only when it provably fits: a bucket holding
        # > 2^31 total path bytes must stay large_string or the cast
        # itself re-imposes the 32-bit offset ceiling the large path
        # exists to avoid.
        total = pc.sum(pc.binary_length(joined)).as_py() or 0
        if total < (1 << 31):
            joined = joined.cast(pa.string())
        return pa.table(
            {
                key_col: pa.array(keys[starts], pa.int64()),
                "path": joined,
            }
        )

    return (
        ds.map_batches(_cast, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(_join_bucket, batch_format="pyarrow")
    )


def decayed_sum(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    half_life: float = 3600.0,
    n_buckets: int = 64,
    quantize_ppm: bool = False,
):
    """Per-key exponentially time-decayed activity score at the key's
    LAST event: ``score = Σ_j v_j · 2^(−(t_last − t_j)/half_life)`` —
    the standard recency-weighted feature (user activity, domain
    freshness) a training-data pipeline attaches before sampling.

    Numerically total by construction: exponents are always ≤ 0, so an
    arbitrarily long history can only UNDERFLOW ancient events to zero
    (their true contribution), never overflow — no rebasing or blocked
    recurrence needed.

    Partitioning: one key's history co-locates in one reduce bucket
    (the running_total contract); inside a bucket every key computes in
    one vectorized pass (sort → segment boundaries → exp2 → reduceat).
    Returns (key, last_ts, decayed) rows, one per key.

    ``quantize_ppm=True`` floors each event's contribution to int64
    ppm BEFORE the per-key sum (the bm25/tfidf per-term doctrine):
    integer summation is order-invariant, which makes the result
    SQL-mirrorable — FLOOR(v · POWER(2, −Δt/hl) · 1e6 + 0.5); glibc
    exp2/pow are correctly rounded, so numpy and DuckDB floor the same
    doubles. Output column becomes ``decayed_ppm`` (int64).
    """
    from rio_cogeo_ray.functions.hashing import splitmix64

    def _cast(t: pa.Table) -> pa.Table:
        k = t[key_col].combine_chunks().cast(pa.int64())
        b = (
            splitmix64(k.to_numpy(zero_copy_only=False).astype(np.uint64))
            % np.uint64(n_buckets)
        ).astype(np.int64)
        return pa.table(
            {
                key_col: k,
                ts_col: t[ts_col].combine_chunks().cast(pa.int64()),
                value_col: t[value_col].combine_chunks().cast(pa.float64()),
                "__bucket": pa.array(b, pa.int64()),
            }
        )

    out_col = "decayed_ppm" if quantize_ppm else "decayed"
    out_type = pa.int64() if quantize_ppm else pa.float64()

    def _decay_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__bucket"])
        if not g.num_rows:
            return pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    "last_ts": pa.array([], pa.int64()),
                    out_col: pa.array([], out_type),
                }
            )
        g = g.sort_by([(key_col, "ascending"), (ts_col, "ascending")])
        k = g[key_col].combine_chunks().to_numpy(zero_copy_only=False)
        t = g[ts_col].combine_chunks().to_numpy(zero_copy_only=False)
        v = g[value_col].combine_chunks().to_numpy(zero_copy_only=False)
        starts = np.r_[0, np.flatnonzero(k[1:] != k[:-1]) + 1]
        ends = np.r_[starts[1:], len(k)] - 1
        last_t = np.repeat(t[ends], np.diff(np.r_[starts, len(k)]))
        contrib = v * np.exp2(-(last_t - t).astype(np.float64) / float(half_life))
        if quantize_ppm:
            contrib = np.floor(contrib * 1e6 + 0.5).astype(np.int64)
            dec = np.add.reduceat(contrib, starts)
        else:
            dec = np.add.reduceat(contrib, starts)
        return pa.table(
            {
                key_col: pa.array(k[starts], pa.int64()),
                "last_ts": pa.array(t[ends], pa.int64()),
                out_col: pa.array(dec, out_type),
            }
        )

    return (
        ds.map_batches(_cast, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(_decay_bucket, batch_format="pyarrow")
    )


def funnel(
    ds,
    steps,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    n_buckets: int = 64,
):
    """Ordered funnel analysis (view → cart → purchase): per user,
    stage k is reached iff an event of type ``steps[k]`` occurs
    STRICTLY AFTER the time stage k−1 was reached, with first-touch
    semantics (each stage time is the minimal one satisfying the
    chain). Returns (user, stages) for users who reached stage 1.

    Partitioning: ONE bucketed exchange co-locates each user's events
    (``hash(user) % n_buckets``, the sessionize contract); inside a
    bucket the whole multi-user funnel is ``len(steps)`` vectorized
    masked minimum.reduceat passes over the user segments — Python
    cost O(n_buckets · len(steps)), never per user. Unreached stages
    propagate as an int64 +inf sentinel, so a broken chain can never
    resurrect at a later stage. SQL mirror: chained
    ``JOIN … WHERE ts > t_prev GROUP BY user`` CTEs."""
    from rio_cogeo_ray.functions.hashing import splitmix64

    steps = list(steps)
    if not steps:
        raise ValueError("funnel needs at least one step")
    _SENTINEL = np.iinfo(np.int64).max

    def _cast(t: pa.Table) -> pa.Table:
        u = t[user_col].combine_chunks().cast(pa.int64())
        b = (
            splitmix64(u.to_numpy(zero_copy_only=False).astype(np.uint64))
            % np.uint64(n_buckets)
        ).astype(np.int64)
        return pa.table(
            {
                user_col: u,
                ts_col: t[ts_col].combine_chunks().cast(pa.int64()),
                type_col: t[type_col].combine_chunks().cast(pa.string()),
                "__bucket": pa.array(b, pa.int64()),
            }
        )

    empty = pa.table(
        {
            user_col: pa.array([], pa.int64()),
            "stages": pa.array([], pa.int64()),
        }
    )

    def _funnel_bucket(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if len(g) == 0:
            return empty
        g = g.sort_by([(user_col, "ascending"), (ts_col, "ascending")])
        u = g[user_col].combine_chunks().to_numpy(zero_copy_only=False)
        ts = g[ts_col].combine_chunks().to_numpy(zero_copy_only=False)
        ty = g[type_col].combine_chunks()
        new = np.ones(len(g), dtype=bool)
        new[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(new)
        seg = np.cumsum(new) - 1
        reached = np.zeros(len(starts), dtype=np.int64)
        prev_time = np.full(len(starts), -(1 << 62), dtype=np.int64)
        for s in steps:
            is_step = pc.equal(ty, s).to_numpy(zero_copy_only=False)
            mask = is_step & (ts > prev_time[seg])
            masked = np.where(mask, ts, _SENTINEL)
            step_time = np.minimum.reduceat(masked, starts)
            hit = step_time < _SENTINEL
            reached += hit.astype(np.int64)
            prev_time = np.where(hit, step_time, _SENTINEL)
        keep = reached >= 1
        return pa.table(
            {
                user_col: pa.array(u[starts][keep], pa.int64()),
                "stages": pa.array(reached[keep], pa.int64()),
            }
        )

    return (
        ds.map_batches(_cast, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(
            lambda g: _funnel_bucket(g.drop_columns(["__bucket"])),
            batch_format="pyarrow",
        )
    )


def cohort_retention(
    ds,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_us: int = 7 * 24 * 3600 * 1_000_000,
    n_buckets: int = 64,
):
    """Cohort retention (the product-analytics staple): cohort(user) =
    first activity period; for every (cohort, period-offset) count the
    DISTINCT users active. Returns (cohort_week, week_offset,
    active_users).

    Scale shape — ONE user-keyed exchange end to end:

    1. map-side, each batch collapses to its distinct (user, period)
       pairs (events in the same period collapse before the shuffle);
    2. pairs route by ``hash(user)`` so every user's full history lands
       in one bucket; the bucket kernel is pure vectorized numpy —
       global distinct mask, per-user first period via the sorted
       segment starts (sorted ascending ⇒ first = min = cohort),
       offsets, then an in-bucket (cohort, offset) count;
    3. bucket outputs are partial counts over a BOUNDED key space
       (cohorts × offsets), merged by the standard tiny partial→final
       aggregate.

    The raw event stream never shuffles, per-user Python cost is zero
    (O(n_buckets) kernels), and the driver only ever sees the bounded
    retention matrix."""
    from rio_cogeo_ray.functions.hashing import splitmix64
    from rio_cogeo_ray.stages.agg import partial_group_agg

    def _pairs(t: pa.Table) -> pa.Table:
        u = (
            t[user_col].combine_chunks().cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        w = (
            t[ts_col].combine_chunks().cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        ) // np.int64(period_us)
        pairs = np.unique(
            np.ascontiguousarray(np.column_stack((u, w))).view("V16")
        ).view(np.int64).reshape(-1, 2)
        b = (
            splitmix64(pairs[:, 0].astype(np.uint64)) % np.uint64(n_buckets)
        ).astype(np.int64)
        return pa.table(
            {
                "u": pa.array(pairs[:, 0], pa.int64()),
                "w": pa.array(pairs[:, 1], pa.int64()),
                "__bucket": pa.array(b, pa.int64()),
            }
        )

    empty = pa.table(
        {
            "cohort_week": pa.array([], pa.int64()),
            "week_offset": pa.array([], pa.int64()),
            "c": pa.array([], pa.int64()),
        }
    )

    def _bucket_kernel(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return empty
        g = g.sort_by([("u", "ascending"), ("w", "ascending")])
        u = g["u"].combine_chunks().to_numpy(zero_copy_only=False)
        w = g["w"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = np.ones(len(g), dtype=bool)
        keep[1:] = (u[1:] != u[:-1]) | (w[1:] != w[:-1])
        u, w = u[keep], w[keep]
        new = np.ones(len(u), dtype=bool)
        new[1:] = u[1:] != u[:-1]
        seg = np.cumsum(new) - 1
        cohort = w[np.flatnonzero(new)][seg]
        off = w - cohort
        key = cohort * np.int64(1 << 21) + off  # offsets < 2^21 periods
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "cohort_week": pa.array(uk >> 21, pa.int64()),
                "week_offset": pa.array(uk & ((1 << 21) - 1), pa.int64()),
                "c": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    partials = (
        ds.map_batches(_pairs, batch_format="pyarrow", batch_size=65536)
        .groupby("__bucket")
        .map_groups(
            lambda g: _bucket_kernel(g.drop_columns(["__bucket"])),
            batch_format="pyarrow",
        )
    )
    out = partial_group_agg(
        partials,
        keys=["cohort_week", "week_offset"],
        sum_cols=["c"],
        count_as=None,
        n_buckets=8,
    )
    return out.map_batches(
        lambda t: t.rename_columns(["cohort_week", "week_offset", "active_users"]),
        batch_format="pyarrow",
    )


def time_band_join(
    ds,
    delta_us: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    n_buckets: int = 64,
):
    """Stream-stream TIME-BAND self-join: every ordered pair of events
    of the same key with ``0 < ts_b − ts_a ≤ delta_us`` — the bounded
    stream-stream join (Flink interval join) that asof_join (nearest
    ONE match) and the broadcast interval join (static ranges) don't
    cover. Returns (user, a_event, b_event, dt_us).

    Partitioning: ONE hash(user) exchange; per bucket the whole
    multi-user join is vectorized — rows sort by (user, ts, id), each
    user segment maps onto a collision-free monotone key
    ``seg·(span+Δ+1) + (ts − seg_start)`` so ONE global searchsorted
    pair finds every row's band window (segment bleed impossible by
    construction), and pairs explode via repeat/offset arithmetic.
    Python cost O(n_buckets). Output volume is the true join size —
    bounded by events-per-key × band density, the caller's Δ knob."""
    from rio_cogeo_ray.functions.hashing import splitmix64

    def _cast(t: pa.Table) -> pa.Table:
        u = t[user_col].combine_chunks().cast(pa.int64())
        b = (
            splitmix64(u.to_numpy(zero_copy_only=False).astype(np.uint64))
            % np.uint64(n_buckets)
        ).astype(np.int64)
        return pa.table(
            {
                user_col: u,
                ts_col: t[ts_col].combine_chunks().cast(pa.int64()),
                id_col: t[id_col].combine_chunks().cast(pa.int64()),
                "__bucket": pa.array(b, pa.int64()),
            }
        )

    empty = pa.table(
        {
            user_col: pa.array([], pa.int64()),
            "a_event": pa.array([], pa.int64()),
            "b_event": pa.array([], pa.int64()),
            "dt_us": pa.array([], pa.int64()),
        }
    )

    def _band_bucket(g: pa.Table) -> pa.Table:
        if len(g) < 2:
            return empty
        g = g.sort_by(
            [(user_col, "ascending"), (ts_col, "ascending"), (id_col, "ascending")]
        )
        u = g[user_col].combine_chunks().to_numpy(zero_copy_only=False)
        ts = g[ts_col].combine_chunks().to_numpy(zero_copy_only=False)
        eid = g[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        new = np.ones(len(g), dtype=bool)
        new[1:] = u[1:] != u[:-1]
        seg = np.cumsum(new) - 1
        idx = np.arange(len(g), dtype=np.int64)
        seg_start = np.maximum.accumulate(np.where(new, idx, 0))
        ts_local = ts - ts[seg_start]
        span = np.int64(int(ts_local.max()) + int(delta_us) + 1)
        if (int(seg.max()) + 1) * int(span) >= (1 << 63):
            # monotone-key headroom: segments-per-bucket × (max key
            # span + Δ) must fit int64 — raise n_buckets to shrink it
            raise ValueError(
                "time_band_join: bucket too dense for the monotone key "
                f"(segments={int(seg.max()) + 1}, span={int(span)}); "
                "increase n_buckets"
            )
        key = seg * span + ts_local
        lo = np.searchsorted(key, key, side="right")
        hi = np.searchsorted(key, key + np.int64(delta_us), side="right")
        cnt = hi - lo
        total = int(cnt.sum())
        if total == 0:
            return empty
        a_idx = np.repeat(idx, cnt)
        excl = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        offs = np.arange(total, dtype=np.int64) - np.repeat(excl, cnt)
        b_idx = np.repeat(lo, cnt) + offs
        return pa.table(
            {
                user_col: pa.array(u[a_idx], pa.int64()),
                "a_event": pa.array(eid[a_idx], pa.int64()),
                "b_event": pa.array(eid[b_idx], pa.int64()),
                "dt_us": pa.array(ts[b_idx] - ts[a_idx], pa.int64()),
            }
        )

    return (
        ds.map_batches(_cast, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(
            lambda g: _band_bucket(g.drop_columns(["__bucket"])),
            batch_format="pyarrow",
        )
    )


def time_rollup(
    ds,
    levels_us=(US_PER_HOUR, 24 * US_PER_HOUR, 7 * 24 * US_PER_HOUR),
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    value_scale: int = 1000,
):
    """Multi-resolution time pyramid (hour → day → week) from ONE
    corpus pass — the reference's overview-pyramid doctrine
    (cogeo.py:381-390: each coarser level reduces the previous level,
    never the source) applied to the time axis: level 0 is the only
    pass over raw events; every coarser level re-reduces the PREVIOUS
    level's bounded aggregate (int64 sums of sums, counts of counts),
    exact because each coarser window is a whole multiple of the finer
    one. Returns (level, key, window_start_us, sum_value_q, n) for all
    levels unioned."""
    for a, b in zip(levels_us, levels_us[1:]):
        if b % a:
            raise ValueError(
                f"each rollup level must be a multiple of the previous "
                f"({b} % {a} != 0)"
            )
    from rio_cogeo_ray.stages.agg import combine_aggregates

    def _prep(t: pa.Table) -> pa.Table:
        ts = t[ts_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = t[value_col].combine_chunks().to_numpy(zero_copy_only=False)
        q = np.floor(v * value_scale + 0.5).astype(np.int64)
        return pa.table(
            {
                key_col: t[key_col].combine_chunks(),
                "win": pa.array(ts // levels_us[0], pa.int64()),
                "value_q": pa.array(q, pa.int64()),
            }
        )

    lvl = partial_group_agg(
        ds.map_batches(_prep, batch_format="pyarrow"),
        keys=[key_col, "win"],
        sum_cols=["value_q"],
        count_as="n",
    )

    def _decorate(i: int, unit: int):
        def _d(t: pa.Table) -> pa.Table:
            w = t["win"].combine_chunks().to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "level": pa.array(np.full(len(t), i, np.int64), pa.int64()),
                    key_col: t[key_col].combine_chunks(),
                    "window_start_us": pa.array(w * np.int64(unit), pa.int64()),
                    "sum_value_q": t["sum_value_q"].combine_chunks(),
                    "n": t["n"].combine_chunks(),
                }
            )

        return _d

    outs = [lvl.map_batches(_decorate(0, levels_us[0]), batch_format="pyarrow")]
    prev = lvl
    for i in range(1, len(levels_us)):
        ratio = levels_us[i] // levels_us[i - 1]

        def _rekey(t: pa.Table, r=ratio) -> pa.Table:
            w = t["win"].combine_chunks().to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    key_col: t[key_col].combine_chunks(),
                    "win": pa.array(w // np.int64(r), pa.int64()),
                    "sum_value_q": t["sum_value_q"].combine_chunks(),
                    "n": t["n"].combine_chunks(),
                }
            )

        prev = combine_aggregates(
            [prev.map_batches(_rekey, batch_format="pyarrow")],
            keys=[key_col, "win"],
            sum_cols=["value_q"],
            count_as="n",
            n_buckets=16,
        )
        outs.append(prev.map_batches(_decorate(i, levels_us[i]), batch_format="pyarrow"))

    u = outs[0]
    for o in outs[1:]:
        u = u.union(o)
    return u


def event_gaps(
    ds,
    ts_col: str = "ts",
    min_gap_us: int = 2 * US_PER_HOUR,
    n_buckets: int = 64,
):
    """Gaps half of gaps-and-islands: per user, every pair of
    CONSECUTIVE events separated by >= min_gap_us, as
    (user_id, gap_start_us, gap_end_us, gap_us).

    Same partitioning contract as sessionize: users hash into
    n_buckets, one vectorized diff pass per bucket — per-group Python
    cost O(n_buckets). Equal timestamps are tie-order-proof: the
    multiset of consecutive pairs of a sorted multiset is unique, so
    any parallel order (and the SQL LEAD mirror) yields the same rows.
    """
    from rio_cogeo_ray.functions.hashing import splitmix64

    def _cast(t: pa.Table) -> pa.Table:
        u = t["user_id"].combine_chunks().cast(pa.int64())
        b = (
            splitmix64(u.to_numpy(zero_copy_only=False).astype(np.uint64))
            % np.uint64(n_buckets)
        ).astype(np.int64)
        return pa.table(
            {
                "user_id": u,
                ts_col: t[ts_col].combine_chunks().cast(pa.int64()),
                "__bucket": pa.array(b, pa.int64()),
            }
        )

    def _gaps_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "gap_start_us": pa.array([], pa.int64()),
                "gap_end_us": pa.array([], pa.int64()),
                "gap_us": pa.array([], pa.int64()),
            }
        )
        if len(g) < 2:
            return empty
        g = g.sort_by([("user_id", "ascending"), (ts_col, "ascending")])
        u = g["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        t = g[ts_col].combine_chunks().to_numpy(zero_copy_only=False)
        same = u[1:] == u[:-1]
        gaps = t[1:] - t[:-1]
        keep = same & (gaps >= min_gap_us)
        if not np.any(keep):
            return empty
        return pa.table(
            {
                "user_id": pa.array(u[1:][keep], pa.int64()),
                "gap_start_us": pa.array(t[:-1][keep], pa.int64()),
                "gap_end_us": pa.array(t[1:][keep], pa.int64()),
                "gap_us": pa.array(gaps[keep], pa.int64()),
            }
        )

    slim = ds.map_batches(_cast, batch_format="pyarrow")
    return slim.groupby("__bucket").map_groups(
        lambda g: _gaps_bucket(g.drop_columns(["__bucket"])),
        batch_format="pyarrow",
    )


def rolling_sum(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "vq",
    preceding: int = 3,
    n_buckets: int = 64,
):
    """Per-key trailing row window: for every event, the sum and count
    over ROWS BETWEEN ``preceding`` PRECEDING AND CURRENT ROW ordered
    by (ts, id) — the unique id tiebreak makes the frame
    permutation-exact (SQL WINDOW mirror).

    Same contract as sessionize: keys hash into buckets, and each
    bucket computes ALL its keys in one vectorized pass — a global
    cumsum minus the frame-start prefix, with per-key segment floors
    (the running_total kernel generalized to a bounded frame).
    ``value_col`` must be int64 (quantize first)."""
    from rio_cogeo_ray.functions.hashing import splitmix64

    def _route(t: pa.Table) -> pa.Table:
        u = t[key_col].combine_chunks().cast(pa.int64())
        b = (
            splitmix64(u.to_numpy(zero_copy_only=False).astype(np.uint64))
            % np.uint64(n_buckets)
        ).astype(np.int64)
        return pa.table(
            {
                key_col: u,
                ts_col: t[ts_col].combine_chunks().cast(pa.int64()),
                id_col: t[id_col].combine_chunks().cast(pa.int64()),
                value_col: t[value_col].combine_chunks().cast(pa.int64()),
                "__b": pa.array(b, pa.int64()),
            }
        )

    def _bucket(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    "t_us": pa.array([], pa.int64()),
                    "roll_sum_q": pa.array([], pa.int64()),
                    "n_win": pa.array([], pa.int64()),
                }
            )
        g = g.sort_by(
            [(key_col, "ascending"), (ts_col, "ascending"), (id_col, "ascending")]
        )
        u = g[key_col].combine_chunks().to_numpy(zero_copy_only=False)
        t = g[ts_col].combine_chunks().to_numpy(zero_copy_only=False)
        i = g[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        v = g[value_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(g)
        new = np.ones(n, dtype=bool)
        new[1:] = u[1:] != u[:-1]
        seg_start = np.repeat(np.flatnonzero(new), np.diff(np.append(np.flatnonzero(new), n)))
        idx = np.arange(n, dtype=np.int64)
        lo = np.maximum(seg_start, idx - preceding)
        cs = np.concatenate(([0], np.cumsum(v)))  # cs[k] = sum of v[:k]
        roll = cs[idx + 1] - cs[lo]
        return pa.table(
            {
                key_col: pa.array(u, pa.int64()),
                id_col: pa.array(i, pa.int64()),
                "t_us": pa.array(t, pa.int64()),
                "roll_sum_q": pa.array(roll, pa.int64()),
                "n_win": pa.array(idx - lo + 1, pa.int64()),
            }
        )

    return (
        ds.map_batches(_route, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(lambda g: _bucket(g.drop_columns(["__b"])), batch_format="pyarrow")
    )


def scd2_intervals(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    attr_col="event_type",
    id_col: str = "event_id",
    n_buckets: int = 64,
):
    """SCD Type-2 dimension build (the lakehouse change-history op):
    compress a change log into validity intervals — per key, runs of
    CONSECUTIVE rows with the same ``attr_col`` value(s) collapse into
    one (key, values…, valid_from_us, valid_to_us, n_events) row
    (``attr_col`` may be a list: a change in ANY tracked column starts
    a new version — the standard multi-attribute dimension contract);
    ``valid_to_us`` is the next differing change's timestamp and NULL
    for the current (open) version. Ordering is (ts, id) with the
    unique ``id_col`` tiebreak, so intervals are permutation-exact at
    any parallelism (the rolling_sum doctrine).

    Partitioning contract: keys hash into ``n_buckets``; per bucket
    ONE vectorized lexsort + one diff pass builds every key's islands
    together — no per-key Python. One exchange total; output rows ∝
    version changes, not corpus size.

    SQL mirror: LAG(value) breaks + windowed SUM island ids +
    GROUP BY island + LEAD(valid_from) — the standard gaps-and-islands
    SCD2 statement."""
    from rio_cogeo_ray.functions.hashing import splitmix64

    attr_cols = [attr_col] if isinstance(attr_col, str) else list(attr_col)

    def _cast(t: pa.Table) -> pa.Table:
        k = t[key_col].combine_chunks().cast(pa.int64())
        b = (
            splitmix64(k.to_numpy(zero_copy_only=False).astype(np.uint64))
            % np.uint64(n_buckets)
        ).astype(np.int64)
        cols = {
            key_col: k,
            "__ts": t[ts_col].combine_chunks().cast(pa.int64()),
            "__id": t[id_col].combine_chunks().cast(pa.int64()),
            "__bucket": pa.array(b, pa.int64()),
        }
        for i, c in enumerate(attr_cols):
            cols[f"__val{i}"] = t[c].combine_chunks().cast(pa.string())
        return pa.table(cols)

    def _islands(g: pa.Table) -> pa.Table:
        empty_cols = {key_col: pa.array([], pa.int64())}
        for c in attr_cols:
            empty_cols[c] = pa.array([], pa.string())
        empty_cols["valid_from_us"] = pa.array([], pa.int64())
        empty_cols["valid_to_us"] = pa.array([], pa.int64())
        empty_cols["n_events"] = pa.array([], pa.int64())
        empty = pa.table(empty_cols)
        if not g.num_rows:
            return empty
        g = g.sort_by(
            [(key_col, "ascending"), ("__ts", "ascending"), ("__id", "ascending")]
        )
        k = g[key_col].combine_chunks().to_numpy(zero_copy_only=False)
        t = g["__ts"].combine_chunks().to_numpy(zero_copy_only=False)
        vals = [g[f"__val{i}"].combine_chunks() for i in range(len(attr_cols))]
        new_key = np.r_[True, k[1:] != k[:-1]]
        # value break: ANY tracked column differing from the previous
        # row starts a new version; NULL == NULL is same (SQL mirror
        # uses IS NOT DISTINCT FROM)
        same_val = np.ones(max(len(k) - 1, 0), dtype=bool)
        for v in vals:
            eq = pc.fill_null(
                pc.equal(v.slice(1), v.slice(0, len(v) - 1)), False
            ).to_numpy(zero_copy_only=False)
            both_null = pc.and_(
                pc.is_null(v.slice(1)), pc.is_null(v.slice(0, len(v) - 1))
            ).to_numpy(zero_copy_only=False)
            same_val &= eq | both_null
        brk = new_key | np.r_[False, ~same_val]
        starts = np.flatnonzero(brk)
        counts = np.diff(np.r_[starts, len(k)])
        key_out = k[starts]
        vf = t[starts]
        # valid_to = next island's valid_from within the SAME key
        nxt_vf = np.r_[vf[1:], 0]
        nxt_key = np.r_[key_out[1:], np.int64(-1)]
        open_end = nxt_key != key_out
        vt = pc.if_else(
            pa.array(~open_end),
            pa.array(nxt_vf, pa.int64()),
            pa.scalar(None, pa.int64()),
        )
        take = pa.array(starts, pa.int64())
        cols = {key_col: pa.array(key_out, pa.int64())}
        for c, v in zip(attr_cols, vals):
            cols[c] = v.take(take)
        cols["valid_from_us"] = pa.array(vf, pa.int64())
        cols["valid_to_us"] = vt
        cols["n_events"] = pa.array(counts, pa.int64())
        return pa.table(cols)

    slim = ds.map_batches(_cast, batch_format="pyarrow")
    return slim.groupby("__bucket").map_groups(
        lambda g: _islands(g.drop_columns(["__bucket"])),
        batch_format="pyarrow",
    )


def interval_flatten(
    ds,
    key_col: str = "user_id",
    start_col: str = "start_us",
    end_col: str = "end_us",
    n_buckets: int = 64,
):
    """Flatten per-key intervals into their covering islands (the
    interval-union half of gaps-and-islands that :func:`scd2_intervals`'
    change-run compression and sessionize's point-gap cut both skirt):
    overlapping-OR-TOUCHING ``[start, end]`` intervals of one key merge
    into one (key, cover_start_us, cover_end_us, n_intervals) row — the
    crawl-coverage / span-union primitive (e.g. merging dup spans or
    fetch windows before measuring covered time).

    Island rule: after sorting a key's intervals by (start, end), a new
    island starts where ``start > max(end of all earlier intervals)``;
    ties in start can never open an island (the running max is already
    ≥ that start), so the cut is deterministic in the DATA at any
    parallelism and needs no id tiebreak.

    Partitioning contract: keys hash into ``n_buckets``; ONE exchange;
    per bucket one lexsort + one segmented running-max pass builds every
    key's islands together. The segmented cummax is the offset trick
    (disjoint per-key value ranges under np.maximum.accumulate); when
    ``n_keys × value_range`` would overflow int64 it falls back to a
    per-key slice loop bounded by distinct keys in the bucket. Output
    rows ∝ islands, never corpus size.

    SQL mirror: MAX(end) OVER (PARTITION BY key ORDER BY start, end
    ROWS UNBOUNDED PRECEDING AND 1 PRECEDING) < start breaks + windowed
    SUM island ids + GROUP BY — the standard interval-merge statement.
    """
    from rio_cogeo_ray.functions.hashing import splitmix64

    out_schema = pa.schema(
        [
            (key_col, pa.int64()),
            ("cover_start_us", pa.int64()),
            ("cover_end_us", pa.int64()),
            ("n_intervals", pa.int64()),
        ]
    )

    def _cast(t: pa.Table) -> pa.Table:
        k = t[key_col].combine_chunks().cast(pa.int64())
        b = (
            splitmix64(k.to_numpy(zero_copy_only=False).astype(np.uint64))
            % np.uint64(n_buckets)
        ).astype(np.int64)
        return pa.table(
            {
                key_col: k,
                "__s": t[start_col].combine_chunks().cast(pa.int64()),
                "__e": t[end_col].combine_chunks().cast(pa.int64()),
                "__bucket": pa.array(b, pa.int64()),
            }
        )

    def _cover(g: pa.Table) -> pa.Table:
        if not g.num_rows:
            return out_schema.empty_table()
        g = g.sort_by(
            [(key_col, "ascending"), ("__s", "ascending"), ("__e", "ascending")]
        )
        k = g[key_col].combine_chunks().to_numpy(zero_copy_only=False)
        s = g["__s"].combine_chunks().to_numpy(zero_copy_only=False)
        e = g["__e"].combine_chunks().to_numpy(zero_copy_only=False)
        new_key = np.r_[True, k[1:] != k[:-1]]
        seg = np.cumsum(new_key) - 1  # 0-based key-segment id
        lo = min(int(s.min()), int(e.min()))
        rng = max(int(s.max()), int(e.max())) - lo + 1
        n_seg = int(seg[-1]) + 1
        if n_seg * rng < 2**62:  # offset trick stays in int64
            run_max = np.maximum.accumulate(e - lo + seg * rng) - seg * rng + lo
        else:  # per-key fallback, loop bounded by distinct keys in bucket
            run_max = np.empty_like(e)
            for a, b_ in zip(
                np.flatnonzero(new_key), np.r_[np.flatnonzero(new_key)[1:], len(k)]
            ):
                run_max[a:b_] = np.maximum.accumulate(e[a:b_])
        # island opens at a key change or where start clears every
        # earlier end of the same key (prev running max)
        brk = new_key.copy()
        brk[1:] |= (~new_key[1:]) & (s[1:] > run_max[:-1])
        starts = np.flatnonzero(brk)
        counts = np.diff(np.r_[starts, len(k)])
        cover_end = np.maximum.reduceat(e, starts)
        return pa.table(
            {
                key_col: pa.array(k[starts], pa.int64()),
                "cover_start_us": pa.array(s[starts], pa.int64()),
                "cover_end_us": pa.array(cover_end, pa.int64()),
                "n_intervals": pa.array(counts, pa.int64()),
            }
        )

    slim = ds.map_batches(_cast, batch_format="pyarrow")
    return slim.groupby("__bucket").map_groups(
        lambda g: _cover(g.drop_columns(["__bucket"])),
        batch_format="pyarrow",
    )


def forward_fill(
    ds,
    key_col: str = "user_id",
    ts_col: str = "__ts",
    id_col: str = "__id",
    val_col: str = "v",
    n_buckets: int = 64,
):
    """Last-observation-carried-forward (LOCF) imputation — the
    data-cleaning staple for sparse sensor/attribute streams: per key,
    each NULL ``val_col`` takes the latest non-null value at or before
    it in (ts, id) order; rows before a key's first observation stay
    NULL. Deterministic at any parallelism via the unique ``id_col``
    tiebreak (the rolling_sum doctrine).

    Partitioning contract: ONE hash(key) exchange; per bucket one
    lexsort + one segmented cummax over OBSERVATION POSITIONS (the
    interval_flatten offset trick with an n+2 multiplier so the "no
    observation yet" −1 marker can never collide with a previous key's
    positions — cross-key leaks are structurally impossible). Values
    themselves are never compared, so any column type rides along.

    Input columns must be (key, ts, id, val) int64 (cast upstream);
    returns (key, ts, id, val, val_filled).
    """
    from rio_cogeo_ray.functions.hashing import splitmix64

    def _bucket(t: pa.Table) -> pa.Table:
        k = t[key_col].combine_chunks().cast(pa.int64())
        b = (
            splitmix64(k.to_numpy(zero_copy_only=False).astype(np.uint64))
            % np.uint64(n_buckets)
        ).astype(np.int64)
        return t.append_column("__bucket", pa.array(b, pa.int64()))

    def _fill(g: pa.Table) -> pa.Table:
        empty = pa.schema(
            [
                (key_col, pa.int64()),
                (ts_col, pa.int64()),
                (id_col, pa.int64()),
                (val_col, pa.int64()),
                (f"{val_col}_filled", pa.int64()),
            ]
        ).empty_table()
        if not g.num_rows:
            return empty
        g = g.sort_by(
            [(key_col, "ascending"), (ts_col, "ascending"), (id_col, "ascending")]
        )
        k = g[key_col].combine_chunks().to_numpy(zero_copy_only=False)
        v = g[val_col].combine_chunks()
        n = len(k)
        valid = pc.is_valid(v).to_numpy(zero_copy_only=False)
        if n > 2**31:  # seg*mult ~ n^2 must stay inside int64
            raise ValueError(
                "forward_fill bucket exceeds 2^31 rows; raise n_buckets"
            )
        seg = np.cumsum(np.r_[True, k[1:] != k[:-1]]) - 1
        pos = np.arange(n, dtype=np.int64)
        src = np.where(valid, pos, np.int64(-1))
        mult = np.int64(n + 2)
        carried = np.maximum.accumulate(src + seg * mult) - seg * mult
        take = pa.array(
            np.where(carried >= 0, carried, 0), pa.int64()
        )
        filled = pc.if_else(
            pa.array(carried >= 0), v.take(take), pa.scalar(None, v.type)
        )
        return pa.table(
            {
                key_col: pa.array(k, pa.int64()),
                ts_col: g[ts_col].combine_chunks(),
                id_col: g[id_col].combine_chunks(),
                val_col: v,
                f"{val_col}_filled": filled,
            }
        )

    return (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda g: _fill(g.drop_columns(["__bucket"])), batch_format="pyarrow")
    )


def rolling_max(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "vq",
    preceding: int = 3,
    n_buckets: int = 64,
):
    """Per-key trailing-row MAX: for every event, the max over ROWS
    BETWEEN ``preceding`` PRECEDING AND CURRENT ROW ordered by
    (ts, id) — the extreme-value sibling of :func:`rolling_sum`
    (peak-rate / high-water-mark analytics). Max has no cumsum
    telescoping, so the kernel takes ``preceding + 1`` vectorized
    shifted-compare passes per bucket (the frame is a SMALL constant
    by contract — a 10k-row frame wants a different algorithm);
    key-boundary shifts mask out, so frames never cross keys.
    ``value_col`` must be int64 (quantize first)."""
    from rio_cogeo_ray.functions.hashing import splitmix64

    def _route(t: pa.Table) -> pa.Table:
        u = t[key_col].combine_chunks().cast(pa.int64())
        b = (
            splitmix64(u.to_numpy(zero_copy_only=False).astype(np.uint64))
            % np.uint64(n_buckets)
        ).astype(np.int64)
        return pa.table(
            {
                key_col: u,
                ts_col: t[ts_col].combine_chunks().cast(pa.int64()),
                id_col: t[id_col].combine_chunks().cast(pa.int64()),
                value_col: t[value_col].combine_chunks().cast(pa.int64()),
                "__b": pa.array(b, pa.int64()),
            }
        )

    def _bucket(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    "t_us": pa.array([], pa.int64()),
                    "roll_max_q": pa.array([], pa.int64()),
                    "n_win": pa.array([], pa.int64()),
                }
            )
        g = g.sort_by(
            [(key_col, "ascending"), (ts_col, "ascending"), (id_col, "ascending")]
        )
        u = g[key_col].combine_chunks().to_numpy(zero_copy_only=False)
        t = g[ts_col].combine_chunks().to_numpy(zero_copy_only=False)
        i = g[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        v = g[value_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(g)
        new = np.ones(n, dtype=bool)
        new[1:] = u[1:] != u[:-1]
        seg_start = np.repeat(
            np.flatnonzero(new), np.diff(np.append(np.flatnonzero(new), n))
        )
        idx = np.arange(n, dtype=np.int64)
        lo = np.maximum(seg_start, idx - preceding)
        roll = v.copy()
        for off in range(1, preceding + 1):
            src = idx - off
            ok = src >= lo
            np.maximum(
                roll, np.where(ok, v[np.maximum(src, 0)], np.iinfo(np.int64).min),
                out=roll,
            )
        return pa.table(
            {
                key_col: pa.array(u, pa.int64()),
                id_col: pa.array(i, pa.int64()),
                "t_us": pa.array(t, pa.int64()),
                "roll_max_q": pa.array(roll, pa.int64()),
                "n_win": pa.array(idx - lo + 1, pa.int64()),
            }
        )

    return (
        ds.map_batches(_route, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(lambda g: _bucket(g.drop_columns(["__b"])), batch_format="pyarrow")
    )


def resample_interp(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
    id_col: str = "event_id",
    val_col: str = "vq",
    grid_us: int = US_PER_HOUR,
    n_buckets: int = 64,
):
    """Regular-grid RESAMPLING with linear interpolation — the
    time-series alignment op completing the family (rolling windows,
    sessions, LOCF; this one changes the time INDEX itself): per key,
    emit one row per grid point ``g`` (multiples of ``grid_us`` inside
    the key's [min ts, max ts]) with the value linearly interpolated
    between the neighbouring observations,

        v(g) = v_prev + (v_next − v_prev)·(g − t_prev) // (t_next − t_prev)

    — exact integer floor interpolation, so both engines agree bit for
    bit. A grid point ON an observation takes it exactly; ties on ts
    resolve by (ts, id) order (prev = last, next = first).

    Partitioning contract: ONE hash(key) exchange; per bucket every
    key's events AND grid points live on one monotone remapped time
    axis (per-key offset trick, the interval_flatten device), so prev
    and next are TWO global searchsorted calls — no per-key Python.
    Output rows ∝ grid points (span // grid per key).

    SQL mirror: grid via range-unnest + two asof-shaped windowed
    IGNORE-NULLS passes over the event∪grid union (LOCF in both
    directions) + the same integer interpolation formula.
    """
    from rio_cogeo_ray.functions.hashing import splitmix64

    out_schema = pa.schema(
        [
            (key_col, pa.int64()),
            ("grid_us", pa.int64()),
            ("v_interp", pa.int64()),
        ]
    )

    def _route(t: pa.Table) -> pa.Table:
        u = t[key_col].combine_chunks().cast(pa.int64())
        b = (
            splitmix64(u.to_numpy(zero_copy_only=False).astype(np.uint64))
            % np.uint64(n_buckets)
        ).astype(np.int64)
        return pa.table(
            {
                key_col: u,
                ts_col: t[ts_col].combine_chunks().cast(pa.int64()),
                id_col: t[id_col].combine_chunks().cast(pa.int64()),
                val_col: t[val_col].combine_chunks().cast(pa.int64()),
                "__b": pa.array(b, pa.int64()),
            }
        )

    def _bucket(g: pa.Table) -> pa.Table:
        if not g.num_rows or ts_col not in g.column_names:
            return out_schema.empty_table()
        g = g.sort_by(
            [(key_col, "ascending"), (ts_col, "ascending"), (id_col, "ascending")]
        )
        u = g[key_col].combine_chunks().to_numpy(zero_copy_only=False)
        t = g[ts_col].combine_chunks().to_numpy(zero_copy_only=False)
        v = g[val_col].combine_chunks().to_numpy(zero_copy_only=False)
        new = np.r_[True, u[1:] != u[:-1]]
        seg = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(u)]
        mn, mx = t[starts], t[ends - 1]
        # per-key grid points: first multiple of grid_us >= mn .. <= mx
        g0 = -(-mn // grid_us) * grid_us
        cnt = np.maximum((mx - g0) // grid_us + 1, 0)
        cnt = np.where(g0 > mx, 0, cnt)
        total = int(cnt.sum())
        if total == 0:
            return out_schema.empty_table()
        rep = np.repeat(np.arange(len(starts), dtype=np.int64), cnt)
        run_start = np.r_[0, np.cumsum(cnt)][:-1]
        pos = np.arange(total, dtype=np.int64) - run_start[rep]
        gp = g0[rep] + pos * grid_us
        # monotone per-key remap: both axes offset by seg * SPAN
        span = int(mx.max() - min(int(t.min()), int(gp.min()))) + 2
        base = np.int64(span)
        if (len(starts)) * span >= 2**62:
            raise ValueError("resample_interp: key span × keys exceeds int64")
        t_m = t - t.min() + seg * base
        gp_m = gp - t.min() + rep * base
        # prev: last event index with t <= g (side='right' - 1);
        # next: first event index with t >= g (side='left')
        ip = np.searchsorted(t_m, gp_m, side="right") - 1
        inx = np.searchsorted(t_m, gp_m, side="left")
        # both indexes stay inside the key's own run by construction
        # (grid points lie within [mn, mx])
        tp, vp = t[ip], v[ip]
        tn, vn = t[np.minimum(inx, len(t) - 1)], v[np.minimum(inx, len(t) - 1)]
        dt = tn - tp
        # checked multiply: the interpolation product below is plain
        # numpy int64 and would WRAP silently for a large value delta
        # times a wide event gap, while the DuckDB mirror errors loudly
        # on BIGINT overflow — fail together, never diverge silently
        # (Python-int arithmetic so the bound check itself can't wrap;
        # gp - tp <= dt by construction, so |dv|·dt bounds the product)
        if len(dt):
            dv_max = int(np.abs(vn - vp).max())
            dt_max = int(dt.max())
            if dv_max and dt_max and dv_max * dt_max >= 2**62:
                raise ValueError(
                    "resample_interp: value delta × event gap "
                    f"({dv_max} × {dt_max}) exceeds int64 — rescale the "
                    "value column or densify the series"
                )
        num = (vn - vp) * (gp - tp)
        # TRUNC-toward-zero division mirrors DuckDB `//` exactly
        # (numpy // floors - the lang_regression negative-slope lesson)
        d = np.maximum(dt, 1)
        q = np.where(num >= 0, num // d, -((-num) // d))
        interp = np.where(dt > 0, vp + q, vp)
        return pa.table(
            {
                key_col: pa.array(u[starts][rep], pa.int64()),
                "grid_us": pa.array(gp, pa.int64()),
                "v_interp": pa.array(interp, pa.int64()),
            }
        )

    return (
        ds.map_batches(_route, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(lambda g: _bucket(g.drop_columns(["__b"])), batch_format="pyarrow")
    )
