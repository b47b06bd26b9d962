"""Link-graph queries: outlinks, PageRank, triangles, host statistics.

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
from rio_cogeo_ray.pipelines.queries._common import CONC_TOPK, RANKJOIN_K, TRI_T, _URL_SQL_PAT, _docs, _simgraph_edges


def q_host_concentration(sf_dir: str):
    """Corpus concentration curve — what share of all pages the top-k
    hosts hold (the Gini-flavoured governance metric behind host_cap's
    per-domain quota: a corpus where 10 hosts carry half the pages
    needs capping): rank hosts by page count desc, cumulative share in
    exact ppm at ranks 1..10. Host counts reduce distributed
    (host-bounded rows); the top-k cut is top_rows_by's associative
    selection; the driver cumsums k rows."""
    import ray as _ray

    from rio_cogeo_ray.stages.agg import top_rows_by

    ds = _docs(sf_dir, ["doc_id"])

    def _host(t: pa.Table) -> pa.Table:
        d = t["doc_id"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        host = pc.binary_join_element_wise(
            pa.scalar("h"),
            pc.cast(pa.array(d % 23, pa.int64()), pa.string()),
            pa.scalar(".example.com"),
            "",
        )
        return pa.table({"host": host})

    counts = agg.partial_group_agg(
        ds.map_batches(_host, batch_format="pyarrow"),
        keys=["host"],
        count_as="n",
        n_buckets=8,
    ).map_batches(
        lambda t: t.append_column("__one", pa.repeat(pa.scalar(1, pa.int64()), len(t))),
        batch_format="pyarrow",
    ).materialize()  # two consumers (top-k + total) - don't re-run the count
    top = top_rows_by(
        counts,
        keys=["__one"],
        order_by=[("n", "descending"), ("host", "ascending")],
        k=CONC_TOPK,
        n_buckets=2,
    )
    total = 0
    rows = []
    for b in _ray.get(counts.to_arrow_refs()):
        if b.num_rows and "n" in b.column_names:
            total += int(pc.sum(b["n"]).as_py() or 0)
    for b in _ray.get(top.to_arrow_refs()):
        if b.num_rows and "host" in b.column_names:
            rows.extend(zip(b["host"].to_pylist(), b["n"].to_pylist()))
    rows.sort(key=lambda r: (-r[1], r[0]))
    out = {"rk": [], "host": [], "n": [], "cum_share_ppm": []}
    cum = 0
    for i, (h, n) in enumerate(rows[:CONC_TOPK], 1):
        cum += int(n)
        out["rk"].append(i)
        out["host"].append(h)
        out["n"].append(int(n))
        out["cum_share_ppm"].append(cum * 1_000_000 // max(total, 1))
    return pa.table(
        {
            "rk": pa.array(out["rk"], pa.int64()),
            "host": pa.array(out["host"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            "cum_share_ppm": pa.array(out["cum_share_ppm"], pa.int64()),
        }
    )


SQL_HOST_CONCENTRATION = f"""
WITH h AS (SELECT 'h' || doc_id % 23 || '.example.com' AS host FROM documents),
c AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS n FROM h GROUP BY 1),
r AS (SELECT host, n,
             ROW_NUMBER() OVER (ORDER BY n DESC, host) AS rk,
             SUM(n) OVER () AS tot,
             SUM(n) OVER (ORDER BY n DESC, host
                          ROWS UNBOUNDED PRECEDING) AS cum
      FROM c)
SELECT CAST(rk AS BIGINT) AS rk, host, n,
       CAST(cum * 1000000 // tot AS BIGINT) AS cum_share_ppm
FROM r WHERE rk <= {CONC_TOPK}
"""


def q_host_stats(sf_dir: str):
    """Per-TLD web-corpus stats via URL parsing (stages/text.py:
    parse_urls). Deterministic synthetic urls derived from doc_id
    (mirrored literally in the SQL — the corpus has no url column) are
    parsed with the anchored RE2 URL_PATTERN in BOTH engines, then a
    two-level partial→final aggregate: per-host rollup first (so the
    tld-level DISTINCT-host count is an exact COUNT over the per-host
    rows), then per-tld totals — the distributed COUNT(DISTINCT)
    pattern (no global distinct shuffle of raw rows)."""
    import pyarrow.compute as pc

    docs = _docs(sf_dir, ["doc_id"])
    tld_choices = pa.array(["com", "org", "net", "io"])

    def _synth_parse(t: pa.Table) -> pa.Table:
        did = t["doc_id"]
        if isinstance(did, pa.ChunkedArray):
            did = did.combine_chunks()
        d = did.to_numpy(zero_copy_only=False)
        h = d % 53
        scheme = pc.if_else(
            pc.equal(pc.bit_wise_and(did, 1), pa.scalar(0, pa.int64())),
            pa.scalar("http"),
            pa.scalar("https"),
        )
        extra = pa.array(["", "/x", "/x/x"]).take(pa.array(d % 3))
        url = pc.binary_join_element_wise(
            scheme,
            "://w",
            pa.array(h.astype(str)),
            ".site",
            pa.array((h % 7).astype(str)),
            ".",
            tld_choices.take(pa.array(h % 4)),
            "/p/",
            pa.array((d % 16).astype(str)),
            extra,
            "",
        )
        parsed = text.parse_urls(pa.table({"url": url}))
        is_https = pc.cast(pc.equal(parsed["scheme"], "https"), pa.int64())
        return pa.table(
            {
                "tld": parsed["tld"],
                "host": parsed["host"],
                "is_https": is_https,
                "path_depth": parsed["path_depth"],
            }
        )

    per_host = agg.partial_group_agg(
        docs.map_batches(_synth_parse, batch_format="pyarrow"),
        keys=["tld", "host"],
        sum_cols=["is_https", "path_depth"],
        count_as="pages",
    )
    per_tld = agg.partial_group_agg(
        per_host,
        keys=["tld"],
        sum_cols=["pages", "sum_is_https", "sum_path_depth"],
        count_as="hosts",
    )
    return per_tld.map_batches(
        lambda t: pa.table(
            {
                "tld": t["tld"],
                "hosts": t["hosts"],
                "pages": t["sum_pages"],
                "n_https": t["sum_sum_is_https"],
                "total_depth": t["sum_sum_path_depth"],
            }
        ),
        batch_format="pyarrow",
    )


SQL_HOST_STATS = (
    "WITH u AS (SELECT doc_id, "
    "(CASE WHEN (doc_id & 1) = 0 THEN 'http' ELSE 'https' END) || '://w' || "
    "CAST(doc_id % 53 AS VARCHAR) || '.site' || CAST((doc_id % 53) % 7 AS VARCHAR) || '.' || "
    "(CASE (doc_id % 53) % 4 WHEN 0 THEN 'com' WHEN 1 THEN 'org' WHEN 2 THEN 'net' ELSE 'io' END) || "
    "'/p/' || CAST(doc_id % 16 AS VARCHAR) || "
    "(CASE doc_id % 3 WHEN 0 THEN '' WHEN 1 THEN '/x' ELSE '/x/x' END) AS url FROM documents), "
    f"p AS (SELECT regexp_extract(url, '{_URL_SQL_PAT}', 1) AS scheme, "
    f"regexp_extract(url, '{_URL_SQL_PAT}', 2) AS host, "
    f"regexp_extract(url, '{_URL_SQL_PAT}', 3) AS tld, "
    f"regexp_extract(url, '{_URL_SQL_PAT}', 4) AS path FROM u), "
    "h AS (SELECT tld, host, CAST(COUNT(*) AS BIGINT) AS pages, "
    "CAST(SUM(CASE WHEN scheme = 'https' THEN 1 ELSE 0 END) AS BIGINT) AS n_https, "
    "CAST(SUM(length(path) - length(replace(path, '/', ''))) AS BIGINT) AS depth "
    "FROM p GROUP BY tld, host) "
    "SELECT tld, CAST(COUNT(*) AS BIGINT) AS hosts, CAST(SUM(pages) AS BIGINT) AS pages, "
    "CAST(SUM(n_https) AS BIGINT) AS n_https, CAST(SUM(depth) AS BIGINT) AS total_depth "
    "FROM h GROUP BY tld"
)


def q_triangles(sf_dir: str):
    """Distributed triangle counting (stages/graph.py: triangle_counts
    — Suri & Vassilvitskii degree-oriented wedge-check) over the
    doc-similarity graph (edges = top-5-token overlap ≥ 3 pairs from
    ranking_overlap_join): per-node triangle participation. Exact;
    mirrored by the three-way SQL self-join."""
    from rio_cogeo_ray.stages import graph

    edges = _simgraph_edges(sf_dir, TRI_T).map_batches(
        lambda t: pa.table(
            {"a": t["ua"].combine_chunks(), "b": t["ub"].combine_chunks()}
        ),
        batch_format="pyarrow",
    )
    return graph.triangle_counts(edges)


SQL_TRIANGLES = rf"""
WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok FROM documents),
cnt AS (SELECT doc_id, tok, COUNT(*) AS n FROM toks GROUP BY doc_id, tok),
rk AS (SELECT doc_id, tok, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY n DESC, tok) AS r FROM cnt),
top AS (SELECT doc_id, tok FROM rk WHERE r <= {RANKJOIN_K}),
e AS (SELECT a.doc_id AS a, b.doc_id AS b
      FROM top a JOIN top b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id HAVING COUNT(*) >= {TRI_T}),
t AS (SELECT e1.a AS a, e1.b AS b, e2.b AS c
      FROM e e1 JOIN e e2 ON e1.b = e2.a
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
n AS (SELECT a AS node FROM t UNION ALL SELECT b FROM t UNION ALL SELECT c FROM t)
SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles FROM n GROUP BY node
"""


def q_clustering_coeff(sf_dir: str):
    """Local clustering coefficient (Watts–Strogatz) per node of the
    doc-similarity graph: cc_ppm = 2·triangles·10^6 // (deg·(deg−1)) —
    how close each node's neighbourhood is to a clique (link-farm
    rings score ~10^6). Composes triangle_counts (degree-oriented
    wedges) with the bounded degree table via one bucketed join; nodes
    outside any triangle are omitted (inner mirror)."""
    from rio_cogeo_ray.stages import graph
    from rio_cogeo_ray.stages.graph import _edge_degrees

    edges = _simgraph_edges(sf_dir, TRI_T).map_batches(
        lambda t: pa.table(
            {"a": t["ua"].combine_chunks(), "b": t["ub"].combine_chunks()}
        ),
        batch_format="pyarrow",
    ).materialize()
    tri = graph.triangle_counts(edges)
    deg = _edge_degrees(edges)
    joined = join_mod.bucketed_hash_join(tri, deg, on="node")

    def _cc(t: pa.Table) -> pa.Table:
        tr = t["triangles"].combine_chunks().to_numpy(zero_copy_only=False)
        dg = t["deg"].combine_chunks().to_numpy(zero_copy_only=False)
        cc = tr * 2_000_000 // np.maximum(dg * (dg - 1), 1)
        return pa.table(
            {
                "node": t["node"].combine_chunks(),
                "triangles": pa.array(tr, pa.int64()),
                "deg": pa.array(dg.astype(np.int64), pa.int64()),
                "cc_ppm": pa.array(cc, pa.int64()),
            }
        )

    return joined.map_batches(_cc, batch_format="pyarrow")


SQL_CLUSTERING_COEFF = rf"""
WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok FROM documents),
cnt AS (SELECT doc_id, tok, COUNT(*) AS n FROM toks GROUP BY doc_id, tok),
rk AS (SELECT doc_id, tok, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY n DESC, tok) AS r FROM cnt),
top AS (SELECT doc_id, tok FROM rk WHERE r <= {RANKJOIN_K}),
e AS (SELECT a.doc_id AS a, b.doc_id AS b
      FROM top a JOIN top b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id HAVING COUNT(*) >= {TRI_T}),
t AS (SELECT e1.a AS a, e1.b AS b, e2.b AS c
      FROM e e1 JOIN e e2 ON e1.b = e2.a
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
n AS (SELECT a AS node FROM t UNION ALL SELECT b FROM t UNION ALL SELECT c FROM t),
tr AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles FROM n GROUP BY node),
d AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
      FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e) GROUP BY 1)
SELECT t.node, t.triangles, d.deg,
       CAST(t.triangles * 2000000 // (d.deg * (d.deg - 1)) AS BIGINT) AS cc_ppm
FROM tr t JOIN d USING (node)
"""


def q_pagerank(sf_dir: str):
    """PageRank over the doc-similarity graph (stages/graph.py:
    pagerank — distributed-state iterative pattern: rank vector stays
    a Dataset; per iteration one bucketed join + one partial→final
    sum; int64 micro-units keep results bit-identical at any
    parallelism). SQL-exact since round 5: the engine's arithmetic was
    ALWAYS integer ((rank // outdeg) * 85 // 100 per edge, Σ + base),
    and a FIXED iteration count unrolls into chained CTEs — the
    'iterative ⇒ rows-only' claim held only for unbounded fixpoints.
    Float-oracle + partitioning-invariance stay pinned in pytest."""
    from rio_cogeo_ray.stages import graph

    edges = _simgraph_edges(sf_dir, TRI_T).map_batches(
        lambda t: pa.table(
            {"a": t["ua"].combine_chunks(), "b": t["ub"].combine_chunks()}
        ),
        batch_format="pyarrow",
    )
    return graph.pagerank(edges, iters=5)


def _sql_pagerank() -> str:
    """5 unrolled integer-exact PageRank iterations over the
    similarity-graph edges (same CTE as SQL_TRIANGLES), mirroring
    graph.pagerank's floor-division order exactly:
    contribution = ((rank // outdeg) * 85) // 100 per directed edge;
    rank' = SUM(contribution) + ((15 * (10^12 // N)) // 100)."""
    head = rf"""
WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok FROM documents),
cnt AS (SELECT doc_id, tok, COUNT(*) AS n FROM toks GROUP BY doc_id, tok),
rk AS (SELECT doc_id, tok, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY n DESC, tok) AS r FROM cnt),
top AS (SELECT doc_id, tok FROM rk WHERE r <= {RANKJOIN_K}),
e AS (SELECT a.doc_id AS a, b.doc_id AS b
      FROM top a JOIN top b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id HAVING COUNT(*) >= {TRI_T}),
dir AS (SELECT a AS src, b AS dst FROM e UNION ALL SELECT b, a FROM e),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM dir GROUP BY 1),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg),
ed AS (SELECT d.src, d.dst, g.outdeg FROM dir d JOIN deg g USING (src)),
r0 AS (SELECT src AS node, CAST(1000000000000 // n AS BIGINT) AS rank
       FROM deg CROSS JOIN nn)"""
    it = (
        ", r{i} AS (SELECT e.dst AS node, "
        "CAST(SUM(((r.rank // e.outdeg) * 85) // 100) "
        "+ ((15 * (1000000000000 // nn.n)) // 100) AS BIGINT) AS rank "
        "FROM ed e JOIN r{p} r ON r.node = e.src CROSS JOIN nn "
        "GROUP BY e.dst, nn.n)"
    )
    body = "".join(it.format(i=i, p=i - 1) for i in range(1, 6))
    return head + body + " SELECT node, rank AS rank_ppt FROM r5"


SQL_PAGERANK = _sql_pagerank()


def q_kcore(sf_dir: str):
    """k-core of the doc-similarity graph (stages/graph.py: k_core —
    distributed peeling: per round one degree count + two key-only
    semi joins; driver sees scalar counts only). Iterative fixpoint ⇒
    rows-only; python peeling oracle pinned in pytest."""
    from rio_cogeo_ray.stages import graph

    edges = _simgraph_edges(sf_dir, TRI_T).map_batches(
        lambda t: pa.table(
            {"a": t["ua"].combine_chunks(), "b": t["ub"].combine_chunks()}
        ),
        batch_format="pyarrow",
    )
    return graph.k_core(edges, k=8)


def q_outlink_graph(sf_dir: str):
    """Host-level web-graph construction from raw page HTML
    (stages/text.py: extract_outlinks + host_link_edges — the
    Common-Crawl outlink pipeline feeding graph.py's pagerank /
    k_core): href values by the documented split-device contract,
    destination hosts by anchored RE2, ONE partial→final count per
    (src_host, dst_host). The corpus has no html column, so pages are
    synthesized deterministically from doc_id/text IDENTICALLY in both
    engines (the host_cap doctrine): each doc links to h((7·id)%23)
    and every third doc also to h((13·id)%23); src host is h(id%23).
    Everything downstream of the synthesis is the production kernel
    chain."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def _html(t: pa.Table) -> pa.Table:
        d = t["doc_id"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        txt = pc.fill_null(t["text"].combine_chunks().cast(pa.string()), "")

        def _s(a):
            return pc.cast(pa.array(a, pa.int64()), pa.string())

        second = pc.if_else(
            pa.array(d % 3 == 0),
            pc.binary_join_element_wise(
                pa.scalar('<a href="https://h'),
                _s((d * 13) % 23),
                pa.scalar('.example.com/q">y</a>'),
                "",
            ),
            pa.scalar(""),
        )
        html = pc.binary_join_element_wise(
            pa.scalar("<html><body><p>"),
            txt,
            pa.scalar('</p><a href="https://h'),
            _s((d * 7) % 23),
            pa.scalar(".example.com/p"),
            _s(d % 11),
            pa.scalar('">x</a>'),
            second,
            pa.scalar("</body></html>"),
            "",
        )
        return pa.table({"doc_id": pa.array(d, pa.int64()), "html": html})

    pages = ds.map_batches(_html, batch_format="pyarrow")
    links = text.extract_outlinks(pages, id_col="doc_id", html_col="html")
    # re-attach src_host: it is derivable from doc_id alone, so derive
    # it map-side instead of carrying it through the explode
    def _src(t: pa.Table) -> pa.Table:
        d = t["doc_id"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        src = pc.binary_join_element_wise(
            pa.scalar("h"),
            pc.cast(pa.array(d % 23, pa.int64()), pa.string()),
            pa.scalar(".example.com"),
            "",
        )
        return t.append_column("src_host", src)

    return text.host_link_edges(
        links.map_batches(_src, batch_format="pyarrow")
    )


SQL_OUTLINK_GRAPH = r"""
WITH h AS (SELECT doc_id,
  '<html><body><p>' || COALESCE(text, '') || '</p><a href="https://h'
    || (doc_id * 7) % 23 || '.example.com/p' || doc_id % 11 || '">x</a>'
    || CASE WHEN doc_id % 3 = 0
            THEN '<a href="https://h' || (doc_id * 13) % 23 || '.example.com/q">y</a>'
            ELSE '' END
    || '</body></html>' AS html
  FROM documents),
p AS (SELECT doc_id, unnest(str_split(html, 'href="')[2:]) AS piece FROM h),
l AS (SELECT doc_id, str_split(piece, '"')[1] AS outlink
      FROM p WHERE contains(piece, '"')),
e AS (SELECT 'h' || doc_id % 23 || '.example.com' AS src_host,
             COALESCE(regexp_extract(outlink, '^https?://([^/]+)', 1), '') AS dst_host
      FROM l)
SELECT src_host, dst_host, CAST(COUNT(*) AS BIGINT) AS n_links
FROM e GROUP BY src_host, dst_host
"""


def q_mutual_hosts(sf_dir: str):
    """Reciprocal-link audit (stages/graph.py: mutual_edges) over a
    synthesized host web graph with genuine reciprocity: host k links
    its ring neighbours (k+1)%23 and (k+22)%23 — mutual by construction
    — and every third doc adds a mostly one-way (2k)%23 link (the
    outlink-graph 7×/13× multiplier maps admit NO mutual pairs, so this
    query uses its own deterministic synthesis, mirrored in SQL). The
    production chain downstream — extract_outlinks → host_link_edges →
    mutual_edges — is unchanged kernels."""
    from rio_cogeo_ray.stages import graph as graph_mod

    ds = _docs(sf_dir, ["doc_id"])

    def _html(t: pa.Table) -> pa.Table:
        d = t["doc_id"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        k = d % 23

        def _s(a):
            return pc.cast(pa.array(a, pa.int64()), pa.string())

        third = pc.if_else(
            pa.array(d % 3 == 0),
            pc.binary_join_element_wise(
                pa.scalar('<a href="https://h'),
                _s((2 * k) % 23),
                pa.scalar('.example.com/t">z</a>'),
                "",
            ),
            pa.scalar(""),
        )
        html = pc.binary_join_element_wise(
            pa.scalar('<html><body><a href="https://h'),
            _s((k + 1) % 23),
            pa.scalar('.example.com/a">x</a><a href="https://h'),
            _s((k + 22) % 23),
            pa.scalar('.example.com/b">y</a>'),
            third,
            pa.scalar("</body></html>"),
            "",
        )
        return pa.table({"doc_id": pa.array(d, pa.int64()), "html": html})

    pages = ds.map_batches(_html, batch_format="pyarrow")
    links = text.extract_outlinks(pages, id_col="doc_id", html_col="html")

    def _src(t: pa.Table) -> pa.Table:
        d = t["doc_id"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        src = pc.binary_join_element_wise(
            pa.scalar("h"),
            pc.cast(pa.array(d % 23, pa.int64()), pa.string()),
            pa.scalar(".example.com"),
            "",
        )
        return t.append_column("src_host", src)

    edges = text.host_link_edges(links.map_batches(_src, batch_format="pyarrow"))
    return graph_mod.mutual_edges(edges)


def q_host_assortativity(sf_dir: str):
    """Degree assortativity of the synthesized host web graph
    (stages/graph.py: degree_assortativity): edge-level Pearson of
    outdeg(src) vs indeg(dst), sqrt-free signed-squared ppm — do
    prolific linkers point at popular targets? Two bounded degree
    aggregates + two bucketed joins over slim edges; driver sees six
    integers."""
    from rio_cogeo_ray.stages import graph as graph_mod

    return graph_mod.degree_assortativity(q_outlink_graph(sf_dir))


def _sql_host_assortativity() -> str:
    return f"""
WITH edges AS ({SQL_OUTLINK_GRAPH}),
od AS (SELECT src_host, CAST(COUNT(*) AS BIGINT) AS outd FROM edges GROUP BY 1),
idg AS (SELECT dst_host, CAST(COUNT(*) AS BIGINT) AS ind FROM edges GROUP BY 1),
p AS (SELECT CAST(od.outd AS HUGEINT) AS x, CAST(idg.ind AS HUGEINT) AS y
      FROM edges e JOIN od USING (src_host) JOIN idg USING (dst_host)),
m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sx2, SUM(y * y) AS sy2
      FROM p)
SELECT CAST(n AS BIGINT) AS n_edges,
       CAST(CASE WHEN n = 0 OR (n * sx2 - sx * sx) = 0
                      OR (n * sy2 - sy * sy) = 0 THEN NULL
            ELSE (CASE WHEN n * sxy - sx * sy >= 0 THEN 1 ELSE -1 END)
                 * ((1000000 * (n * sxy - sx * sy) * (n * sxy - sx * sy))
                    // ((n * sx2 - sx * sx) * (n * sy2 - sy * sy)))
            END AS BIGINT) AS assort2s_ppm
FROM m
"""


def q_anchor_text(sf_dir: str):
    """Anchor-text aggregation per target host (the classic web-search
    relevance signal: anchor text describes the TARGET page): outlinks
    extracted with their anchor's leading text run (inner markup
    truncates — documented split contract), contracted to one
    partial→final count per (dst_host, anchor). HTML synthesized
    deterministically in both engines (the outlink_graph doctrine);
    every 5th doc plants inner <b> markup to exercise truncation."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def _html(t: pa.Table) -> pa.Table:
        d = t["doc_id"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )

        def _s(a):
            return pc.cast(pa.array(a, pa.int64()), pa.string())

        tail = pc.if_else(
            pa.array(d % 5 == 0),
            pa.scalar(" <b>bold</b>"),
            pa.scalar(" plain"),
        )
        html = pc.binary_join_element_wise(
            pa.scalar('<html><body><a href="https://h'),
            _s((d * 7) % 23),
            pa.scalar(".example.com/p"),
            _s(d % 11),
            pa.scalar('">w'),
            _s(d % 7),
            tail,
            pa.scalar("</a></body></html>"),
            "",
        )
        return pa.table({"doc_id": pa.array(d, pa.int64()), "html": html})

    pages = ds.map_batches(_html, batch_format="pyarrow")
    links = text.extract_outlinks(
        pages, id_col="doc_id", html_col="html", with_anchor=True
    )

    def _dst(t: pa.Table) -> pa.Table:
        u = t["outlink"].combine_chunks()
        ex = pc.extract_regex(u, r"^https?://(?P<host>[^/]+)")
        return pa.table(
            {
                "dst_host": pc.fill_null(ex.field("host"), "").cast(pa.string()),
                "anchor": t["anchor"].combine_chunks().cast(pa.string()),
            }
        )

    from rio_cogeo_ray.stages.agg import partial_group_agg

    return partial_group_agg(
        links.map_batches(_dst, batch_format="pyarrow"),
        keys=["dst_host", "anchor"],
        sum_cols=[],
        count_as="n",
    )


SQL_ANCHOR_TEXT = r"""
WITH h AS (SELECT doc_id,
  '<html><body><a href="https://h' || (doc_id * 7) % 23 || '.example.com/p'
    || doc_id % 11 || '">w' || doc_id % 7
    || CASE WHEN doc_id % 5 = 0 THEN ' <b>bold</b>' ELSE ' plain' END
    || '</a></body></html>' AS html
  FROM documents),
p AS (SELECT doc_id, unnest(str_split(html, 'href="')[2:]) AS piece FROM h),
l AS (SELECT str_split(piece, '"')[1] AS outlink,
             str_split(str_split(piece || '>', '>')[2] || '<', '<')[1] AS anchor
      FROM p WHERE contains(piece, '"')),
e AS (SELECT COALESCE(regexp_extract(outlink, '^https?://([^/]+)', 1), '') AS dst_host,
             anchor FROM l)
SELECT dst_host, anchor, CAST(COUNT(*) AS BIGINT) AS n
FROM e GROUP BY dst_host, anchor
"""


def q_host_rank(sf_dir: str):
    """The full Common-Crawl web-graph story composed from production
    kernels: html (synthesized as in outlink_graph) → extract_outlinks
    → host_link_edges → graph.pagerank over the host graph (5
    iterations, int64 micro-units, rank state fully distributed).
    Rows-only: the iterative fixpoint is not one SQL statement; the
    component kernels are each SQL-pinned (`outlink_graph`) or
    float-oracle-pinned (pagerank pytest)."""
    from rio_cogeo_ray.stages import graph
    from rio_cogeo_ray.stages.sketch import _hash_col

    edges = q_outlink_graph(sf_dir)

    def _nodes(t: pa.Table) -> pa.Table:
        s = t["src_host"].combine_chunks()
        d = t["dst_host"].combine_chunks()
        keep = pc.and_(
            pc.not_equal(s, d), pc.not_equal(d, pa.scalar(""))
        ).to_numpy(zero_copy_only=False)
        tt = t.filter(pa.array(keep))
        a = _hash_col(tt["src_host"]).astype(np.int64)
        b = _hash_col(tt["dst_host"]).astype(np.int64)
        return pa.table(
            {"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())}
        )

    return graph.pagerank(
        edges.map_batches(_nodes, batch_format="pyarrow"), iters=5
    )

