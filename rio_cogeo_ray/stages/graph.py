"""Graph analytics over edge Datasets — triangle counting.

Complements the iterative graph family (connected components in
stages/dedup.py, k-means in stages/ann.py) with the classic two-round
wedge-check algorithm (Suri & Vassilvitskii, "Counting Triangles and
the Curse of the Last Reducer", WWW 2011): orient every edge toward
the higher-(degree, id) endpoint so each node's OUT-degree is bounded
(hubs never enumerate their full neighborhoods), generate wedges from
out-neighbor pairs, and confirm each wedge against the edge set with
one bucketed join.

Scale shape: degrees are one partial→final count; orientation is two
hash-joins of the edge list against the degree table (edges never
amplify); wedge generation is the per-run triangular kernel (bounded
by out-degree² ≤ O(m) total under degree orientation — THE point of
the algorithm); the wedge⋈edge check is a composite-key bucketed join.
No driver-side adjacency, no broadcast of O(nodes) state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from rio_cogeo_ray.functions.hashing import hash_columns, splitmix64


def _edge_degrees(edges, n_buckets: int = 64):
    """(node, deg) from an (a, b) edge Dataset — both endpoints count."""
    from rio_cogeo_ray.stages.agg import partial_group_agg

    def _both(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks().cast(pa.int64())
        b = t["b"].combine_chunks().cast(pa.int64())
        return pa.table({"node": pa.concat_arrays([a, b])})

    ends = edges.map_batches(_both, batch_format="pyarrow")
    deg = partial_group_agg(ends, keys=["node"], sum_cols=[], count_as="deg")
    return deg


def triangle_counts(edges, n_buckets: int = 64):
    """Per-node triangle participation counts over an undirected simple
    edge Dataset with columns (a, b), a < b, no duplicates. Returns
    (node, triangles) for every node in at least one triangle.

    SQL mirror: the three-way self-join e1(a,b) ⋈ e2(b,c) ⋈ e3(a,c)
    with a < b < c, each triangle crediting its three vertices.
    """
    from rio_cogeo_ray.stages.join import bucketed_hash_join

    deg = _edge_degrees(edges, n_buckets).materialize()

    # attach deg(a) and deg(b); orient src -> dst toward higher (deg, id)
    def _ren(col_from, col_to):
        def _f(t: pa.Table) -> pa.Table:
            return t.rename_columns(
                [col_to if c == col_from else c for c in t.column_names]
            )

        return _f

    # materialized: the nested join's schema fetch would re-run this
    # whole all-to-all join (join.py schema-resolution doctrine)
    da = bucketed_hash_join(
        edges, deg.map_batches(_ren("node", "a"), batch_format="pyarrow"),
        on="a", n_buckets=n_buckets,
    ).map_batches(_ren("deg", "deg_a"), batch_format="pyarrow").materialize()
    dab = bucketed_hash_join(
        da, deg.map_batches(_ren("node", "b"), batch_format="pyarrow"),
        on="b", n_buckets=n_buckets,
    ).map_batches(_ren("deg", "deg_b"), batch_format="pyarrow")

    def _orient(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks().to_numpy(zero_copy_only=False)
        b = t["b"].combine_chunks().to_numpy(zero_copy_only=False)
        da_ = t["deg_a"].combine_chunks().to_numpy(zero_copy_only=False)
        db_ = t["deg_b"].combine_chunks().to_numpy(zero_copy_only=False)
        a_first = (da_ < db_) | ((da_ == db_) & (a < b))
        src = np.where(a_first, a, b)
        dst = np.where(a_first, b, a)
        return pa.table(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
        )

    oriented = dab.map_batches(_orient, batch_format="pyarrow")

    # wedges: per src, every unordered pair of out-neighbors
    def _route_src(t: pa.Table) -> pa.Table:
        bkt = (
            splitmix64(t["src"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.uint64))
            % np.uint64(n_buckets)
        ).astype(np.int64)
        return t.append_column("__bucket", pa.array(bkt, pa.int64()))

    def _wedges(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__bucket"])
        empty = pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "center": pa.array([], pa.int64()),
            }
        )
        if not g.num_rows:
            return empty
        # same triangular pair arithmetic as dedup._bucket_item_pair_counts
        # (item = src, entity = dst) regenerated locally because the
        # wedge must CARRY its center node
        g = g.sort_by([("src", "ascending"), ("dst", "ascending")])
        src = g["src"].combine_chunks().to_numpy(zero_copy_only=False)
        dst = g["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        new = np.r_[True, src[1:] != src[:-1]]
        idx = np.arange(len(src), dtype=np.int64)
        run_start = np.maximum.accumulate(np.where(new, idx, 0))
        q = idx - run_start
        run = np.cumsum(new) - 1
        L = np.bincount(run)[run]
        a_rep = L - 1 - q
        total = int(a_rep.sum())
        if total == 0:
            return empty
        x = np.repeat(dst, a_rep)
        excl = np.concatenate(([0], np.cumsum(a_rep)[:-1]))
        offs = np.arange(total, dtype=np.int64) - np.repeat(excl, a_rep)
        y = dst[np.repeat(idx, a_rep) + offs + 1]
        c = np.repeat(src, a_rep)
        lo = np.minimum(x, y)
        hi = np.maximum(x, y)
        return pa.table(
            {
                "a": pa.array(lo, pa.int64()),
                "b": pa.array(hi, pa.int64()),
                "center": pa.array(c, pa.int64()),
            }
        )

    wedges = (
        oriented.map_batches(_route_src, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(_wedges, batch_format="pyarrow")
    )

    # wedge (a, b, center) closes a triangle iff (a, b) is an edge —
    # one composite-key bucketed join (edges carry a < b already)
    tri = bucketed_hash_join(wedges, edges, on=["a", "b"], how="semi",
                             n_buckets=n_buckets)

    # credit all three vertices, then one partial→final count
    def _credit(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks().cast(pa.int64())
        b = t["b"].combine_chunks().cast(pa.int64())
        c = t["center"].combine_chunks().cast(pa.int64())
        return pa.table({"node": pa.concat_arrays([a, b, c])})

    from rio_cogeo_ray.stages.agg import partial_group_agg

    counted = partial_group_agg(
        tri.map_batches(_credit, batch_format="pyarrow"),
        keys=["node"], sum_cols=[], count_as="triangles",
    )
    return counted


RANK_UNIT = 10**12  # integer micro-rank units: deterministic int64 sums


def pagerank(edges, damping_num: int = 85, damping_den: int = 100,
             iters: int = 10, n_buckets: int = 64):
    """PageRank over an undirected (a, b) edge Dataset, state fully
    DISTRIBUTED — the third iterative pattern beside k-means (small
    broadcast state) and connected components (label messages): the
    rank vector never leaves the cluster; each iteration is one
    bucketed join (ranks ⋈ out-edges, keyed by source) plus one
    partial→final sum (contributions keyed by destination).

    All arithmetic is int64 micro-units (RANK_UNIT = 10^12 per unit of
    probability mass): per-edge contribution = rank // out_degree, so
    sums are associative and results are bit-identical at any
    parallelism (the repo's integer-aggregation doctrine). Floor
    division leaks ≤ out_degree units per node per iteration — ~10^-12
    relative, pinned against a float oracle in pytest. Returns
    (node, rank_ppt) with rank in units of 10^-12.

    100 TB contract: no O(nodes) driver or broadcast state; per
    iteration the edge list shuffles once (join) and contributions
    once (sum). Degree-0 isolates cannot appear (every node comes from
    an edge). Dangling mass: undirected graphs have none (every node
    has out-degree ≥ 1)."""
    from rio_cogeo_ray.stages.agg import partial_group_agg
    from rio_cogeo_ray.stages.join import bucketed_hash_join

    # directed both ways + out-degrees
    def _both_dir(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks().cast(pa.int64())
        b = t["b"].combine_chunks().cast(pa.int64())
        return pa.table(
            {
                "src": pa.concat_arrays([a, b]),
                "dst": pa.concat_arrays([b, a]),
            }
        )

    directed = edges.map_batches(_both_dir, batch_format="pyarrow").materialize()
    outdeg = partial_group_agg(
        directed.map_batches(
            lambda t: t.select(["src"]), batch_format="pyarrow"
        ),
        keys=["src"], sum_cols=[], count_as="outdeg",
    ).materialize()
    n_nodes = outdeg.count()
    if n_nodes == 0:
        return outdeg

    # edges annotated with the source's out-degree, reused every round
    ed = bucketed_hash_join(directed, outdeg, on="src", n_buckets=n_buckets).materialize()

    init = RANK_UNIT // n_nodes
    base = ((damping_den - damping_num) * (RANK_UNIT // n_nodes)) // damping_den

    ranks = outdeg.map_batches(
        lambda t: pa.table(
            {
                "src": t["src"].combine_chunks(),
                "rank": pa.array(
                    np.full(len(t), init, dtype=np.int64), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iters):
        joined = bucketed_hash_join(ed, ranks, on="src", n_buckets=n_buckets)

        def _contrib(t: pa.Table) -> pa.Table:
            r = t["rank"].combine_chunks().to_numpy(zero_copy_only=False)
            d = t["outdeg"].combine_chunks().to_numpy(zero_copy_only=False)
            c = (r // np.maximum(d, 1)) * np.int64(damping_num) // np.int64(damping_den)
            return pa.table(
                {
                    "src": t["dst"].combine_chunks(),  # next round's key
                    "c": pa.array(c, pa.int64()),
                }
            )

        summed = partial_group_agg(
            joined.map_batches(_contrib, batch_format="pyarrow"),
            keys=["src"], sum_cols=["c"], count_as=None,
        )

        def _finish(t: pa.Table) -> pa.Table:
            s = t["sum_c"].combine_chunks().to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "src": t["src"].combine_chunks(),
                    "rank": pa.array(s + np.int64(base), pa.int64()),
                }
            )

        ranks = summed.map_batches(_finish, batch_format="pyarrow").materialize()

    return ranks.map_batches(
        lambda t: pa.table(
            {"node": t["src"].combine_chunks(), "rank_ppt": t["rank"].combine_chunks()}
        ),
        batch_format="pyarrow",
    )


def k_core(edges, k: int, max_rounds: int = 64, n_buckets: int = 64):
    """The k-core of an undirected (a, b) edge Dataset: iteratively
    peel nodes of degree < k until fixpoint; returns the surviving
    (node, deg) rows (degrees within the core).

    Distributed peeling — state stays on-cluster like pagerank's
    ranks: each round is one degree count (partial→final) and two
    bucketed SEMI joins filtering the edge list to rows whose BOTH
    endpoints survive. The driver sees only the scalar edge count per
    round (the fixpoint test). Rounds are bounded by ``max_rounds``
    (peeling converges in ≤ nodes rounds; real graphs take few —
    raise the cap for adversarial chains, same doctrine as
    connected_components' round_cap)."""
    from rio_cogeo_ray.stages.agg import partial_group_agg
    from rio_cogeo_ray.stages.join import bucketed_hash_join

    cur = edges.materialize()
    prev_edges = cur.count()
    for _ in range(max_rounds):
        if prev_edges == 0:
            break
        deg = _edge_degrees(cur, n_buckets)
        keep = deg.map_batches(
            lambda t: t.filter(
                pc.greater_equal(t["deg"].combine_chunks(), k)
            ).select(["node"]),
            batch_format="pyarrow",
        ).materialize()
        if keep.count() == 0:
            prev_edges = 0
            break
        # edges survive iff BOTH endpoints kept: two semi joins (keys
        # only shuffle — the keep side has no payload at all)
        ren_a = keep.map_batches(
            lambda t: t.rename_columns(["a"]), batch_format="pyarrow"
        )
        ren_b = keep.map_batches(
            lambda t: t.rename_columns(["b"]), batch_format="pyarrow"
        )
        nxt = bucketed_hash_join(cur, ren_a, on="a", how="semi", n_buckets=n_buckets)
        nxt = bucketed_hash_join(nxt, ren_b, on="b", how="semi", n_buckets=n_buckets)
        nxt = nxt.materialize()
        n = nxt.count()
        if n == prev_edges:
            break
        cur, prev_edges = nxt, n
    if prev_edges == 0:
        return pa.table(
            {"node": pa.array([], pa.int64()), "deg": pa.array([], pa.int64())}
        )
    return _edge_degrees(cur, n_buckets)


def mutual_edges(
    ds,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    weight_col: str = "n_links",
    n_buckets: int = 32,
):
    """Reciprocal-link detection over a weighted directed edge table —
    the link-exchange / mutual-citation audit of the host web graph
    (rings of sites that all link each other are a classic spam
    signal): emit (host_a, host_b, n_ab, n_ba) for every unordered pair
    linked in BOTH directions, host_a < host_b. Self-loops never pair
    (SQL mirror: ``src <> dst``); one-way links are dropped.

    Scale shape: a pure map canonicalizes each edge to its unordered
    pair with the weight routed into the matching direction column;
    ONE partial→final sum per (host_a, host_b) then a zero-free filter
    — rows ∝ mutually-linked pairs, never edges².
    """
    from rio_cogeo_ray.stages.agg import partial_group_agg

    def _canon(t: pa.Table) -> pa.Table:
        s = t[src_col].combine_chunks().cast(pa.string())
        d = t[dst_col].combine_chunks().cast(pa.string())
        w = t[weight_col].combine_chunks().cast(pa.int64())
        fwd = pc.less(s, d)
        keep = pc.or_(fwd, pc.greater(s, d))  # drops self-loops and null cmp
        s, d, w, fwd = (a.filter(keep) for a in (s, d, w, fwd))
        zero = pa.scalar(0, pa.int64())
        return pa.table(
            {
                "host_a": pc.if_else(fwd, s, d),
                "host_b": pc.if_else(fwd, d, s),
                "n_ab": pc.if_else(fwd, w, zero),
                "n_ba": pc.if_else(fwd, zero, w),
            }
        )

    summed = partial_group_agg(
        ds.map_batches(_canon, batch_format="pyarrow"),
        keys=["host_a", "host_b"],
        sum_cols=["n_ab", "n_ba"],
        count_as=None,
        n_buckets=n_buckets,
    )

    def _mutual(t: pa.Table) -> pa.Table:
        ab = t["sum_n_ab"].combine_chunks()
        ba = t["sum_n_ba"].combine_chunks()
        out = pa.table(
            {
                "host_a": t["host_a"].combine_chunks(),
                "host_b": t["host_b"].combine_chunks(),
                "n_ab": ab,
                "n_ba": ba,
            }
        )
        zero = pa.scalar(0, pa.int64())
        return out.filter(
            pc.and_(pc.greater(ab, zero), pc.greater(ba, zero))
        )

    return summed.map_batches(_mutual, batch_format="pyarrow")


def degree_assortativity(edges, src_col: str = "src_host", dst_col: str = "dst_host",
                         n_buckets: int = 32):
    """Out-in degree assortativity of a directed edge table — the
    graph-level "do prolific linkers point at popular targets?"
    statistic (Newman 2002): the Pearson correlation, over EDGES, of
    x = outdeg(src) with y = indeg(dst), reported sqrt-free as the
    SIGNED SQUARED correlation in ppm (the lang_pearson exactness
    device: every operand an exact integer, SQL mirror in HUGEINT;
    driver finalize uses Python bignums so web-scale sums never
    overflow). Returns one row (n_edges, assort2s_ppm); a degenerate
    graph (constant degrees) yields NULL like SQL.

    Scale shape: two bounded degree aggregates (rows ∝ distinct
    hosts), two bucketed hash joins attaching degrees to SLIM
    (src, dst) edge rows, then associative per-batch moment partials —
    the driver sees one 6-integer row per block, never edges.
    """
    import ray as _ray

    from rio_cogeo_ray.stages.agg import partial_group_agg
    from rio_cogeo_ray.stages.join import bucketed_hash_join

    # slim feeds THREE consumers (both degree aggregates + the join);
    # the aggregates and the inner join are all-to-all inputs to joins
    # — materialize per the join.py schema-resolution doctrine
    slim = edges.map_batches(
        lambda t: t.select([src_col, dst_col]), batch_format="pyarrow"
    ).materialize()
    outd = partial_group_agg(
        slim.map_batches(lambda t: t.select([src_col]), batch_format="pyarrow"),
        keys=[src_col],
        count_as="outd",
        n_buckets=n_buckets,
    ).materialize()
    ind = partial_group_agg(
        slim.map_batches(lambda t: t.select([dst_col]), batch_format="pyarrow"),
        keys=[dst_col],
        count_as="ind",
        n_buckets=n_buckets,
    ).materialize()
    both = bucketed_hash_join(
        bucketed_hash_join(
            slim, outd, on=src_col, n_buckets=n_buckets
        ).materialize(),
        ind,
        on=dst_col,
        n_buckets=n_buckets,
    )

    def _exact_sum(v: np.ndarray) -> int:
        """Overflow-proof sum of an int64 array: slice so each partial
        stays under 2^62, accumulate the slices in Python bignums."""
        if not len(v):
            return 0
        m = int(np.abs(v).max())
        if m == 0:
            return 0
        step = max(1, (2**62) // m)
        return sum(int(v[i : i + step].sum()) for i in range(0, len(v), step))

    def _moments(t: pa.Table) -> pa.Table:
        # per-element products are checked (loud on overflow); the
        # ACCUMULATION is chunk-safe and ships as decimal strings so a
        # hub-heavy batch can never silently wrap an int64 partial
        x = t["outd"].combine_chunks().cast(pa.int64())
        y = t["ind"].combine_chunks().cast(pa.int64())
        xn = x.to_numpy(zero_copy_only=False)
        yn = y.to_numpy(zero_copy_only=False)
        xy = pc.multiply_checked(x, y).to_numpy(zero_copy_only=False)
        x2 = pc.multiply_checked(x, x).to_numpy(zero_copy_only=False)
        y2 = pc.multiply_checked(y, y).to_numpy(zero_copy_only=False)
        vals = [len(t)] + [_exact_sum(a) for a in (xn, yn, xy, x2, y2)]
        return pa.table(
            {
                k: pa.array([str(v)], pa.string())
                for k, v in zip(("n", "sx", "sy", "sxy", "sx2", "sy2"), vals)
            }
        )

    n = sx = sy = sxy = sx2 = sy2 = 0
    for b in _ray.get(
        both.map_batches(_moments, batch_format="pyarrow").to_arrow_refs()
    ):
        if not b.num_rows or "n" not in b.column_names:
            continue
        for r in b.to_pylist():
            n += int(r["n"]); sx += int(r["sx"]); sy += int(r["sy"])
            sxy += int(r["sxy"]); sx2 += int(r["sx2"]); sy2 += int(r["sy2"])
    if n == 0:
        a = None
    else:
        num = n * sxy - sx * sy
        dx = n * sx2 - sx * sx
        dy = n * sy2 - sy * sy
        if dx == 0 or dy == 0:
            a = None
        else:
            q = (1_000_000 * num * num) // (dx * dy)
            a = q if num >= 0 else -q
    return pa.table(
        {
            "n_edges": pa.array([n], pa.int64()),
            "assort2s_ppm": pa.array([a], pa.int64()),
        }
    )
