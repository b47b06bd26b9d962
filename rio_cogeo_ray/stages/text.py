"""Text analysis — language-ID, quality scoring, token counting,
document fingerprinting.

Training-data-pipeline operators over the `documents`/`pages` text
column. All kernels are vectorized (pyarrow RE2 / numpy over codepoint
buffers); the regex-holding stages are actor classes so patterns
compile once per actor (``__init__``), not per batch.

SQL mirror notes: ``token_count`` uses RE2 ``\\S+`` — DuckDB's regexes
are RE2 too, so ``len(regexp_extract_all(text, '\\S+'))`` matches
exactly. Quality components are integers (counts) so cross-engine
comparison is exact.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from rio_cogeo_ray.functions.hashing import splitmix64

#: Unicode script ranges → language families for the n-gram-free
#: heuristic language ID (deterministic, no model).
_SCRIPTS = {
    "zh": (0x4E00, 0x9FFF),
    "ar": (0x0600, 0x06FF),
    "ru": (0x0400, 0x04FF),
    "ja": (0x3040, 0x30FF),
    "hi": (0x0900, 0x097F),
}

_LATIN_MARKERS: Dict[str, List[str]] = {
    # high-frequency function words per latin-script language
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "de", "que", "los"],
    "pt": ["o", "de", "que", "em", "uma"],
}


def token_count(texts: pa.Array) -> pa.Array:
    """Whitespace tokens per doc: count of RE2 ``\\S+`` matches (int64).
    SQL mirror: len(regexp_extract_all(text, '\\S+'))."""
    return pc.count_substring_regex(texts, r"\S+").cast(pa.int64())


def add_token_count(batch: pa.Table, text_col: str = "text") -> pa.Table:
    return batch.append_column("tokens", token_count(batch[text_col].combine_chunks()))


class QualityScore:
    """Actor: per-doc quality components (all integer counts):

    - ``n_chars``: utf-8 code points
    - ``tokens``: \\S+ runs
    - ``alpha_tokens``: tokens that are purely alphabetic
    - ``stop_hits``: occurrences of the english stopword set
    - ``max_word_len``: longest token (boilerplate/garbage detector)

    plus ``quality_ok``: the C4-style keep heuristic
    (tokens >= min_tokens AND mean word length in [2, 12] — integer
    arithmetic: 2*n_chars in [4*tokens, 24*tokens]).
    """

    def __init__(self, min_tokens: int = 5):
        self.min_tokens = min_tokens
        self.stop_re = r"\b(the|and|of|to|is|in|that|it|was|for)\b"
        # RE2 has no lookahead: count tokens containing a non-letter and
        # subtract from the token count to get pure-alphabetic tokens
        self.nonalpha_tok_re = r"\S*[^\p{L}\s]\S*"
        self.word_re = r"\S+"

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = batch["text"].combine_chunks()
        n_chars = pc.utf8_length(t).cast(pa.int64())
        tokens = pc.count_substring_regex(t, self.word_re).cast(pa.int64())
        nonalpha = pc.count_substring_regex(t, self.nonalpha_tok_re).cast(pa.int64())
        alpha = pc.subtract(tokens, nonalpha)
        stop = pc.count_substring_regex(t, self.stop_re).cast(pa.int64())
        nc = n_chars.to_numpy(zero_copy_only=False)
        tk = tokens.to_numpy(zero_copy_only=False)
        ok = (tk >= self.min_tokens) & (2 * nc >= 4 * tk) & (2 * nc <= 24 * tk)
        out = batch.append_column("n_chars_m", n_chars)
        out = out.append_column("tokens", tokens)
        out = out.append_column("alpha_tokens", alpha)
        out = out.append_column("stop_hits", stop)
        out = out.append_column("quality_ok", pa.array(ok))
        return out


def _codepoints(texts: pa.Array):
    """(doc_idx, codepoint) flat arrays via utf32 cast — one vectorized
    pass, no per-row Python."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    enc = texts.cast(pa.string())
    # decode utf-8 manually: use python-level only on the buffer via numpy
    off = np.frombuffer(enc.buffers()[1], dtype=np.int32)
    off = off[enc.offset : enc.offset + len(enc) + 1].astype(np.int64)
    data = np.frombuffer(enc.buffers()[2], dtype=np.uint8)
    # utf-8 lead bytes mark codepoint starts
    is_start = (data & 0xC0) != 0x80
    doc_of_byte = np.zeros(len(data), dtype=np.int64)
    if len(off) > 1:
        np.add.at(doc_of_byte, off[1:-1][off[1:-1] < len(data)], 1)
        doc_of_byte = np.cumsum(doc_of_byte)
    starts = np.flatnonzero(is_start)
    doc_idx = doc_of_byte[starts] if len(data) else np.zeros(0, dtype=np.int64)
    # decode codepoint values at starts (up to 4 bytes)
    b0 = data[starts].astype(np.int64)
    cp = np.where(b0 < 0x80, b0, 0)
    m2 = (b0 & 0xE0) == 0xC0
    m3 = (b0 & 0xF0) == 0xE0
    m4 = (b0 & 0xF8) == 0xF0
    nxt = lambda k: data[np.minimum(starts + k, len(data) - 1)].astype(np.int64) & 0x3F
    cp = np.where(m2, ((b0 & 0x1F) << 6) | nxt(1), cp)
    cp = np.where(m3, ((b0 & 0x0F) << 12) | (nxt(1) << 6) | nxt(2), cp)
    cp = np.where(m4, ((b0 & 0x07) << 18) | (nxt(1) << 12) | (nxt(2) << 6) | nxt(3), cp)
    return doc_idx, cp


class LangId:
    """Actor: heuristic language ID.

    Script vote first (codepoint-range histogram per doc, vectorized
    bincount); latin-script docs fall back to function-word marker hits
    (RE2 count per language, compiled patterns held by the actor)."""

    def __init__(self):
        self.marker_res = {
            lang: r"\b(" + "|".join(ws) + r")\b" for lang, ws in _LATIN_MARKERS.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = batch["text"].combine_chunks()
        n = len(batch)
        doc_idx, cp = _codepoints(t)
        script_votes = np.zeros((n, len(_SCRIPTS)), dtype=np.int64)
        for j, (lang, (lo, hi)) in enumerate(_SCRIPTS.items()):
            in_range = (cp >= lo) & (cp <= hi)
            if in_range.any():
                script_votes[:, j] = np.bincount(doc_idx[in_range], minlength=n)
        total = np.bincount(doc_idx, minlength=n) if len(doc_idx) else np.zeros(n, np.int64)
        script_langs = list(_SCRIPTS)
        best_script = script_votes.argmax(axis=1)
        script_frac_ok = script_votes[np.arange(n), best_script] * 5 > total * 1  # >20%

        marker_hits = np.zeros((n, len(_LATIN_MARKERS)), dtype=np.int64)
        for j, (lang, pat) in enumerate(self.marker_res.items()):
            marker_hits[:, j] = (
                pc.count_substring_regex(t, pat).cast(pa.int64()).to_numpy(zero_copy_only=False)
            )
        latin_langs = list(_LATIN_MARKERS)
        best_latin = marker_hits.argmax(axis=1)

        pred = np.where(
            script_frac_ok,
            np.array([script_langs[i] for i in best_script], dtype=object),
            np.where(
                marker_hits[np.arange(n), best_latin] > 0,
                np.array([latin_langs[i] for i in best_latin], dtype=object),
                np.array(["und"] * n, dtype=object),
            ),
        )
        return batch.append_column("lang_pred", pa.array(pred.tolist(), pa.string()))


def fingerprint64(texts: pa.Array) -> pa.Array:
    """Rolling-hash content fingerprint of whitespace-normalized text:
    deterministic 64-bit id for exact-content identity after whitespace
    variation (document fingerprinting op)."""
    norm = pc.replace_substring_regex(texts, r"\s+", " ")
    norm = pc.utf8_trim_whitespace(norm)
    if isinstance(norm, pa.ChunkedArray):
        norm = norm.combine_chunks()
    off = np.frombuffer(norm.buffers()[1], dtype=np.int32)
    off = off[norm.offset : norm.offset + len(norm) + 1].astype(np.int64)
    data = np.frombuffer(norm.buffers()[2], dtype=np.uint8)
    h = np.full(len(norm), np.uint64(1469598103934665603), dtype=np.uint64)
    lens = np.diff(off)
    max_len = int(lens.max()) if len(lens) else 0
    with np.errstate(over="ignore"):
        for j in range(max_len):
            m = lens > j
            b = data[off[:-1][m] + j].astype(np.uint64)
            h[m] = (h[m] ^ b) * np.uint64(1099511628211)
        h = splitmix64(h)
    return pa.array(h.astype(np.int64), pa.int64())


#: (tag, RE2 pattern, replacement) applied IN ORDER — each tag counts
#: matches in the text as left by the previous redactions, so the
#: sequence is deterministic and mirrorable in any RE2-based SQL engine
#: (DuckDB regexp_* is RE2 too; identical patterns ⇒ identical matches).
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?[0-9][0-9()\-\s]{7,}[0-9]", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IPV4>"),
)


def scrub_pii(batch: pa.Table, text_col: str = "text", out_col: str = "text_redacted") -> pa.Table:
    """PII redaction map stage: replace emails / phone numbers / IPv4
    literals with typed placeholders and emit per-document match counts
    (``n_email``/``n_phone``/``n_ipv4``). Pure Arrow RE2 kernels — one
    vectorized pass per pattern, no Python per row; stateless, so it
    runs as a plain ``map_batches`` task (no actor pool needed)."""
    t = batch[text_col]
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    for tag, pat, repl in PII_PATTERNS:
        batch = batch.append_column(
            f"n_{tag}", pc.count_substring_regex(t, pat).cast(pa.int64())
        )
        t = pc.replace_substring_regex(t, pat, repl)
    return batch.append_column(out_col, t)


#: Anchored URL-structure pattern. Anchoring matters for cross-engine
#: parity: unanchored, a lazy ``[^/]+?`` host lets DuckDB's
#: ``regexp_extract`` return the shortest prefix match while Arrow's
#: ``extract_regex`` (also RE2) sees the same — but ``^...$`` forces
#: both to the identical full-string parse.
URL_PATTERN = r"^(?P<scheme>https?)://(?P<host>[^/]+?)\.(?P<tld>[a-z]+)(?P<path>/.*)?$"


def parse_urls(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """URL structure extraction (the web-corpus domain/TLD analyzer):
    append ``scheme`` / ``host`` / ``tld`` / ``path`` / ``path_depth``
    parsed with one anchored RE2 ``extract_regex`` pass — no Python per
    row. Non-matching urls yield empty-string fields (same as DuckDB's
    ``regexp_extract`` no-match convention; unmatched optional groups
    come back null and are filled to ``''``);
    ``path_depth`` counts ``/`` separators, mirrored in SQL as
    ``length(path) - length(replace(path, '/', ''))``."""
    u = batch[url_col]
    if isinstance(u, pa.ChunkedArray):
        u = u.combine_chunks()
    ex = pc.extract_regex(u, URL_PATTERN)
    path = pc.fill_null(ex.field("path"), "")
    return (
        batch.append_column("scheme", ex.field("scheme"))
        .append_column("host", ex.field("host"))
        .append_column("tld", ex.field("tld"))
        .append_column("path", path)
        .append_column("path_depth", pc.count_substring(path, "/").cast(pa.int64()))
    )


def canonicalize_urls(
    batch: pa.Table, url_col: str = "url", out_col: str = "canon"
) -> pa.Table:
    """Canonical-URL key for crawl URL-level dedup (the C4/CC
    crawl-frontier rule): strip the fragment, strip the query string,
    lowercase, merge http/https by stripping the scheme, and strip one
    trailing slash. Pure RE2/utf8 Arrow kernels — a stateless map with
    zero shuffle at any corpus size; the chain is mirrored literally in
    SQL (each pattern matches at most once, so DuckDB's first-match
    ``regexp_replace`` equals Arrow's replace-all)."""
    u = batch[url_col]
    if isinstance(u, pa.ChunkedArray):
        u = u.combine_chunks()
    c = pc.replace_substring_regex(u, r"#.*$", "")
    c = pc.replace_substring_regex(c, r"\?.*$", "")
    c = pc.utf8_lower(c)
    c = pc.replace_substring_regex(c, r"^https?://", "")
    c = pc.replace_substring_regex(c, r"/$", "")
    return batch.append_column(out_col, c)


def canonical_blocklist(domains) -> np.ndarray:
    """Canonicalize a domain blocklist into a sorted, PREFIX-FREE array
    of reversed-label prefixes: ``"site3.com"`` → ``b"com.site3."``.
    A host matches the list iff some entry blocks it exactly or as a
    parent domain (``host == d`` or ``host`` ends with ``"." + d``),
    which in reversed-label space is exactly "some prefix ending at a
    label boundary". Entries already covered by a shorter kept entry
    (``"w8.site1.org"`` under ``"org"``) are dropped, making the set
    prefix-free — so for any reversed host the ONLY possible matching
    entry is its searchsorted floor, one memcmp per row."""
    revs = sorted(
        ".".join(reversed(d.strip().strip(".").lower().split("."))) + "."
        for d in domains
        if d and d.strip().strip(".")
    )
    kept: List[str] = []
    for r in revs:
        if not kept or not r.startswith(kept[-1]):
            kept.append(r)
    return np.array(kept, dtype="S")


_HOST_PATTERN = r"^[A-Za-z][A-Za-z0-9+.-]*://(?P<bhost>[^/?#]+)"


class HostBlocklist:
    """Actor stage: flag rows whose URL host is blocked by a domain
    blocklist with wildcard-subdomain semantics (``"site3.com"`` blocks
    ``site3.com`` AND every ``*.site3.com``). The blocklist is
    broadcast ONCE (`ray.put`), canonicalized to a sorted prefix-free
    reversed-label byte array in ``__init__`` (once per actor, never
    per batch); per batch the host is extracted with one anchored RE2
    pass, label-reversed with vectorized offset arithmetic, and probed
    with ONE ``np.searchsorted`` + ``np.char.startswith`` over fixed-
    width bytes — C memcmp loops, no Python per row. Scales to
    millions of blocklist entries (log₂ probes each)."""

    def __init__(self, domains_ref, url_col: str = "url", out_col: str = "blocked"):
        import ray as _ray

        dom = (
            _ray.get(domains_ref)
            if isinstance(domains_ref, _ray.ObjectRef)
            else domains_ref
        )
        self.pref = canonical_blocklist(dom)
        self.width = max((len(p) for p in self.pref), default=1)
        self.url_col = url_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        u = batch[self.url_col]
        if isinstance(u, pa.ChunkedArray):
            u = u.combine_chunks()
        host = pc.extract_regex(u.cast(pa.string()), _HOST_PATTERN).field("bhost")
        host = pc.utf8_lower(pc.fill_null(host, ""))
        n = len(host)
        if n == 0 or len(self.pref) == 0:
            return batch.append_column(
                "host", host
            ).append_column(self.out_col, pa.array(np.zeros(n, np.int64)))
        # reverse the dot-separated labels: "w1.site3.com" -> "com.site3.w1."
        labels = pc.split_pattern(host, ".")
        off = labels.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        off = off - off[0]
        lens = np.diff(off)
        within = np.arange(int(off[-1]), dtype=np.int64) - np.repeat(off[:-1], lens)
        gather = np.repeat(off[1:] - 1, lens) - within
        flat = labels.flatten()
        rev_lists = pa.ListArray.from_arrays(
            pa.array(off, pa.int32()).cast(pa.int32()), flat.take(pa.array(gather))
        )
        rev = pc.binary_join_element_wise(
            pc.binary_join(rev_lists, "."), "", "."
        )
        rv = rev.to_numpy(zero_copy_only=False).astype(f"S{self.width + 256}")
        idx = np.searchsorted(self.pref, rv, side="right") - 1
        ok = idx >= 0
        hit = np.zeros(n, dtype=bool)
        if ok.any():
            hit[ok] = np.char.startswith(rv[ok], self.pref[idx[ok]])
        return batch.append_column("host", host).append_column(
            self.out_col, pa.array(hit.astype(np.int64), pa.int64())
        )


def host_blocklist_flag(ds, domains, url_col: str = "url", concurrency: int = 8):
    """Apply :class:`HostBlocklist` as an actor pool over a Dataset:
    the domain list ships to the object store once, each actor builds
    its canonical index once."""
    import ray as _ray

    return ds.map_batches(
        HostBlocklist,
        fn_constructor_args=(_ray.put(list(domains)), url_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def repetition_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher-style repetition signal: per-doc whitespace-token total vs
    DISTINCT count (``n_tokens`` / ``n_distinct``, both int64; the
    duplicate fraction is ``1 - n_distinct/n_tokens``). Vectorized:
    split → flatten with row ids → 64-bit token hashes (polars' native
    string hash) → one ``np.unique`` over packed (row, hash) pairs.
    Collision odds are the documented hash128-dedup class (~1e-14 per
    corpus). SQL mirror: ``len(regexp_extract_all(text, '\\S+'))`` and
    ``len(list_distinct(regexp_extract_all(text, '\\S+')))``."""
    import polars as pl

    t = batch[text_col]
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    lists = pc.ascii_split_whitespace(t.cast(pa.string()))
    # null text rows split to null lists: length must read 0, not NaN
    # (a NaN→int64 cast produces garbage repeat counts)
    lens = (
        pc.fill_null(pc.list_value_length(lists), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    flat = pc.list_flatten(lists)
    row = np.repeat(np.arange(len(batch), dtype=np.uint64), lens)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat = flat.filter(pa.array(keep))
    row = row[keep]
    n_tokens = np.bincount(row.astype(np.int64), minlength=len(batch)).astype(np.int64)
    h = pl.from_arrow(flat.cast(pa.large_string())).hash(seed=17).to_numpy().astype(np.uint64)
    pairs = np.ascontiguousarray(np.column_stack((row, h))).view("V16").ravel()
    uniq = np.unique(pairs).view(np.uint64).reshape(-1, 2)
    n_distinct = np.bincount(uniq[:, 0].astype(np.int64), minlength=len(batch)).astype(np.int64)
    return batch.append_column("n_tokens", pa.array(n_tokens, pa.int64())).append_column(
        "n_distinct", pa.array(n_distinct, pa.int64())
    )


def token_value_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-batch (token, n) partial counts of whitespace tokens — the
    heavy-hitters combiner. Splitting on RE2 ``\\s+`` and dropping empty
    strings selects exactly the ``\\S+`` matches (the token_count /
    regexp_extract_all mirror), and the within-batch value_counts means
    the shuffle moves one row per DISTINCT token per batch — Zipfian
    token mass (the/of/and...) collapses before it touches the network."""
    toks = pc.list_flatten(
        pc.ascii_split_whitespace(batch[text_col].combine_chunks().cast(pa.string()))
    )
    toks = toks.filter(pc.not_equal(toks, ""))
    vc = pc.value_counts(toks)
    return pa.table(
        {
            "token": vc.field("values").cast(pa.string()),
            "n": vc.field("counts").cast(pa.int64()),
        }
    )


def token_topk(ds, text_col: str = "text", k: int = 50):
    """Top-k most frequent whitespace tokens over a corpus (heavy
    hitters): per-batch value_counts partials → bucketed exact merge
    (stages/agg.py) → one tiny sort+limit. Deterministic tie-break on
    the token string. SQL mirror: unnest(regexp_extract_all(text,
    '\\S+')) GROUP BY ORDER BY n DESC, token LIMIT k."""
    from rio_cogeo_ray.stages.agg import partial_group_agg

    partials = ds.map_batches(
        lambda t: token_value_counts(t, text_col), batch_format="pyarrow"
    )
    merged = partial_group_agg(partials, keys=["token"], sum_cols=["n"], count_as=None)
    merged = merged.map_batches(
        lambda t: t.rename_columns(["token", "n"]), batch_format="pyarrow"
    )
    return merged.sort(["n", "token"], descending=[True, False]).limit(k)


_EMPTY_BIGRAMS = pa.table(
    {
        "w1": pa.array([], pa.string()),
        "w2": pa.array([], pa.string()),
        "n": pa.array([], pa.int64()),
    }
)


def bigram_value_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-batch (w1, w2, n) partial counts of ADJACENT whitespace-token
    pairs — bigrams never cross a document boundary (adjacency is
    checked on the per-row ownership vector, not the flat token
    stream). Same Zipf-collapse property as
    :func:`token_value_counts`: the shuffle moves one row per DISTINCT
    bigram per batch, so high-frequency collocations ("of the", …)
    collapse before they touch the network."""
    lists = pc.ascii_split_whitespace(
        batch[text_col].combine_chunks().cast(pa.string())
    )
    lens = np.diff(lists.offsets.to_numpy(zero_copy_only=False))
    rep = np.repeat(np.arange(len(batch), dtype=np.int64), lens)
    toks = lists.flatten()
    keep = pc.not_equal(toks, "")
    toks = toks.filter(keep)
    rep = rep[keep.to_numpy(zero_copy_only=False)]
    if len(rep) < 2:
        return _EMPTY_BIGRAMS
    adj = pa.array(rep[1:] == rep[:-1])
    pair = pa.table(
        {
            "w1": toks.slice(0, len(toks) - 1).filter(adj),
            "w2": toks.slice(1).filter(adj),
        }
    )
    if pair.num_rows == 0:
        return _EMPTY_BIGRAMS
    aggd = pair.group_by(["w1", "w2"]).aggregate([([], "count_all")])
    return aggd.rename_columns(["w1", "w2", "n"]).cast(_EMPTY_BIGRAMS.schema)


def skipgram_value_counts(
    batch: pa.Table, text_col: str = "text", window: int = 3
) -> pa.Table:
    """Per-batch (w1, w2, n) partial counts of ORDERED token pairs
    within ``window`` positions inside one document — the word2vec /
    PMI co-occurrence input that :func:`bigram_value_counts` is the
    window=1 special case of. One vectorized shifted-slice pass per
    offset d (pairs = token stream vs itself shifted by d, masked to
    same-document rows), then one Arrow group_by collapses the batch's
    pair mass before the exchange (the Zipf-collapse contract)."""
    lists = pc.ascii_split_whitespace(
        batch[text_col].combine_chunks().cast(pa.string())
    )
    lens = np.diff(lists.offsets.to_numpy(zero_copy_only=False))
    rep = np.repeat(np.arange(len(batch), dtype=np.int64), lens)
    toks = lists.flatten()
    keep = pc.not_equal(toks, "")
    toks = toks.filter(keep)
    rep = rep[keep.to_numpy(zero_copy_only=False)]
    if len(rep) < 2:
        return _EMPTY_BIGRAMS
    parts = []
    for d in range(1, window + 1):
        if len(rep) <= d:
            break
        adj = pa.array(rep[d:] == rep[:-d])
        w1 = toks.slice(0, len(toks) - d).filter(adj)
        if not len(w1):
            continue
        parts.append(pa.table({"w1": w1, "w2": toks.slice(d).filter(adj)}))
    if not parts:
        return _EMPTY_BIGRAMS
    pair = pa.concat_tables(parts)
    aggd = pair.group_by(["w1", "w2"]).aggregate([([], "count_all")])
    return aggd.rename_columns(["w1", "w2", "n"]).cast(_EMPTY_BIGRAMS.schema)


def skipgram_topk(
    ds,
    text_col: str = "text",
    window: int = 3,
    k: int = 30,
    min_n: int = 2,
    batch_size: int = 32768,
):
    """Top-k windowed co-occurrence pairs by exact count — the bounded
    consumable view of the skip-gram table (full pair tables approach
    vocab² and belong in a shuffle only when a model build needs them;
    the bigram_lift candidate doctrine). Plan: per-batch collapsed
    partials → ONE bucketed exact merge → associative local top-k per
    merged block (each global top-k row lives in exactly one block) →
    driver sorts the ≤ blocks·k survivors. Returns a pyarrow Table
    (w1, w2, n) ordered (n desc, w1, w2)."""
    import ray as _ray

    from rio_cogeo_ray.stages.agg import partial_group_agg

    out_schema = pa.schema(
        [("w1", pa.string()), ("w2", pa.string()), ("n", pa.int64())]
    )
    sg = partial_group_agg(
        ds.map_batches(
            lambda t: skipgram_value_counts(t, text_col, window),
            batch_format="pyarrow",
            batch_size=batch_size,
        ),
        keys=["w1", "w2"],
        sum_cols=["n"],
        count_as=None,
    ).map_batches(
        lambda t: t.rename_columns(["w1", "w2", "n"]), batch_format="pyarrow"
    )

    def _local_top(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["n"], pa.scalar(min_n, pa.int64())))
        if t.num_rows > k:
            t = t.sort_by(
                [("n", "descending"), ("w1", "ascending"), ("w2", "ascending")]
            ).slice(0, k)
        return t

    blocks = [
        b
        for b in _ray.get(
            sg.map_batches(_local_top, batch_format="pyarrow").to_arrow_refs()
        )
        if b.num_rows and {"w1", "w2", "n"} <= set(b.column_names)
    ]
    if not blocks:
        return out_schema.empty_table()
    top = pa.concat_tables(blocks).combine_chunks()
    return top.sort_by(
        [("n", "descending"), ("w1", "ascending"), ("w2", "ascending")]
    ).slice(0, k)


def bigram_lift(
    ds,
    text_col: str = "text",
    k: int = 30,
    min_n: int = 2,
    batch_size: int = 32768,
):
    """Top-k collocations by exact integer LIFT (the PMI numerator in
    ratio form): ``lift_ppm = floor(n_ab · T_uni² · 10⁶ /
    (T_bi · n_a · n_b))`` where n_ab is the bigram count, n_a/n_b the
    unigram counts and T_uni/T_bi the corpus token/bigram totals.

    Scale shape (the token_topk doctrine, twice):

    1. bigram partial counts (Zipf-collapsed per batch) → bucketed
       exact merge → ``HAVING n ≥ min_n`` → tiny sort+limit ⇒ the
       candidate set is BOUNDED (k rows) before anything touches the
       driver.
    2. ONE more corpus pass computes, map-side against the broadcast
       candidate-token set, the ≤2k unigram counts AND the two corpus
       totals (T_bi = T_uni − nonempty docs, so no bigram re-pass) —
       no vocab-wide unigram shuffle exists anywhere.
    3. lift is evaluated driver-side over the k candidates in
       arbitrary-precision Python ints (the SQL mirror uses HUGEINT;
       exact up to ~10³⁸ intermediate — fine for any oracle-checkable
       scale, and the engine side never overflows at all).

    Order: lift_ppm desc, w1, w2 (deterministic). Returns a k-row
    pyarrow Table (w1, w2, n, lift_ppm)."""
    import ray as _ray

    from rio_cogeo_ray.stages.agg import partial_group_agg

    out_schema = pa.schema(
        [
            ("w1", pa.string()),
            ("w2", pa.string()),
            ("n", pa.int64()),
            ("lift_ppm", pa.int64()),
        ]
    )
    # LARGE partial batches are the whole ballgame here: bigram vocab
    # per batch saturates toward the corpus-distinct count, so at the
    # default ~1k-row batches the per-batch value-counts collapse does
    # NOTHING (measured 24.4M partial rows from 24.4M bigrams at 600k
    # pages) while 32k-row batches collapse 3.3× and cut the exchange
    # from ~12 s to ~3.7 s on the same corpus.
    bi = partial_group_agg(
        ds.map_batches(
            lambda t: bigram_value_counts(t, text_col),
            batch_format="pyarrow",
            batch_size=batch_size,
        ),
        keys=["w1", "w2"],
        sum_cols=["n"],
        count_as=None,
    ).map_batches(
        lambda t: t.rename_columns(["w1", "w2", "n"]), batch_format="pyarrow"
    )
    # top-k is an ASSOCIATIVE selection: each merged block keeps its
    # local top-k (the global top-k rows each live in exactly one
    # block), the driver sorts the ≤ blocks·k survivors — replacing
    # the Dataset filter+sort stages, which cost ~5 s on a 351k-row
    # merged table at 600k pages (an all-to-all for 30 rows)
    def _local_top(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["n"], pa.scalar(min_n, pa.int64())))
        if t.num_rows > k:
            t = t.sort_by(
                [("n", "descending"), ("w1", "ascending"), ("w2", "ascending")]
            ).slice(0, k)
        return t

    cand_blocks = [
        b
        for b in _ray.get(
            bi.map_batches(_local_top, batch_format="pyarrow").to_arrow_refs()
        )
        # zero-row blocks that never reached a UDF carry NO schema
        if b.num_rows and {"w1", "w2", "n"} <= set(b.column_names)
    ]
    if not cand_blocks:
        return out_schema.empty_table()
    top = pa.concat_tables(cand_blocks).combine_chunks()
    if top.num_rows == 0:
        return out_schema.empty_table()
    top = top.sort_by(
        [("n", "descending"), ("w1", "ascending"), ("w2", "ascending")]
    ).slice(0, k)

    cand = pa.array(
        np.unique(
            np.concatenate(
                (
                    top["w1"].to_numpy(zero_copy_only=False),
                    top["w2"].to_numpy(zero_copy_only=False),
                )
            )
        ),
        pa.string(),
    )
    cand_ref = _ray.put(cand)

    def _uni_partial(batch: pa.Table) -> pa.Table:
        """(token, n) counts for the bounded candidate set (pc.index_in
        — vectorized C++ hash lookup, never a per-token Python
        compare), plus ONE summary row (token=NULL) carrying this
        batch's token total and nonempty-doc count — the corpus totals
        ride the same pass."""
        cand_s = _ray.get(cand_ref)
        lists = pc.ascii_split_whitespace(
            batch[text_col].combine_chunks().cast(pa.string())
        )
        lens = np.diff(lists.offsets.to_numpy(zero_copy_only=False))
        toks = lists.flatten()
        keep = pc.not_equal(toks, "")
        toks = toks.filter(keep)
        n_tok = len(toks)
        # nonempty docs: rows with ≥1 nonempty token (one O(n) bincount)
        rep = np.repeat(np.arange(len(batch), dtype=np.int64), lens)
        rep = rep[keep.to_numpy(zero_copy_only=False)]
        nonempty = int(
            np.count_nonzero(np.bincount(rep, minlength=len(batch)))
        ) if len(rep) else 0
        idx = pc.index_in(toks, value_set=cand_s).drop_null()
        cnt = np.bincount(
            idx.to_numpy(zero_copy_only=False).astype(np.int64),
            minlength=len(cand_s),
        ).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "token": pa.concat_arrays(
                    [cand_s.take(pa.array(nz)), pa.array([None], pa.string())]
                ),
                "n": pa.array(np.append(cnt[nz], [0]), pa.int64()),
                "tot": pa.array(
                    np.append(np.zeros(len(nz), np.int64), [n_tok]), pa.int64()
                ),
                "docs": pa.array(
                    np.append(np.zeros(len(nz), np.int64), [nonempty]),
                    pa.int64(),
                ),
            }
        )

    uni_blocks = [
        b
        for b in _ray.get(
            ds.map_batches(
                _uni_partial, batch_format="pyarrow", batch_size=batch_size
            ).to_arrow_refs()
        )
        if b.num_rows and "token" in b.column_names
    ]
    rows = pa.concat_tables(uni_blocks).combine_chunks()
    t_uni = int(pc.sum(rows["tot"]).as_py() or 0)
    t_bi = t_uni - int(pc.sum(rows["docs"]).as_py() or 0)
    uni: Dict[str, int] = {}
    for tok, n in zip(
        rows["token"].to_pylist(), rows["n"].to_pylist()
    ):
        if tok is not None:
            uni[tok] = uni.get(tok, 0) + int(n)

    w1s = top["w1"].to_pylist()
    w2s = top["w2"].to_pylist()
    ns = top["n"].to_pylist()
    lifts = [
        (int(n) * t_uni * t_uni * 1_000_000) // (t_bi * uni[a] * uni[b])
        for a, b, n in zip(w1s, w2s, ns)
    ]
    out = pa.table(
        {
            "w1": pa.array(w1s, pa.string()),
            "w2": pa.array(w2s, pa.string()),
            "n": pa.array([int(x) for x in ns], pa.int64()),
            "lift_ppm": pa.array(lifts, pa.int64()),
        }
    )
    return out.sort_by(
        [("lift_ppm", "descending"), ("w1", "ascending"), ("w2", "ascending")]
    )


def grouped_token_value_counts(
    batch: pa.Table, group_col: str, text_col: str = "text"
) -> pa.Table:
    """Per-batch (group, token, n) partial counts — the per-stratum
    heavy-hitters combiner. Same Zipf-collapse property as
    :func:`token_value_counts`, one row per distinct (group, token)
    per batch."""
    groups = batch[group_col].combine_chunks()
    lists = pc.ascii_split_whitespace(
        batch[text_col].combine_chunks().cast(pa.string())
    )
    lens = np.diff(lists.offsets.to_numpy(zero_copy_only=False))
    rep = np.repeat(np.arange(len(batch), dtype=np.int64), lens)
    toks = lists.flatten()
    keep = pc.not_equal(toks, "")
    toks = toks.filter(keep)
    rep = rep[keep.to_numpy(zero_copy_only=False)]
    pair = pa.table({group_col: groups.take(pa.array(rep)), "token": toks})
    # within-batch (group, token) counts via arrow group_by (native)
    agg = pair.group_by([group_col, "token"]).aggregate([([], "count_all")])
    return agg.rename_columns([group_col, "token", "n"])


def token_topk_per_group(ds, group_col: str, text_col: str = "text", k: int = 10):
    """Top-k tokens WITHIN each group (heavy hitters per stratum —
    e.g. per language): per-batch (group, token) partial counts →
    bucketed exact merge → bucketed per-group top-k
    (stages/knn.py:per_group_topk). Deterministic ties: higher n first,
    then token ascending. SQL mirror: ROW_NUMBER() OVER (PARTITION BY
    group ORDER BY n DESC, token)."""
    from rio_cogeo_ray.stages.agg import partial_group_agg
    from rio_cogeo_ray.stages.knn import per_group_topk

    partials = ds.map_batches(
        lambda t: grouped_token_value_counts(t, group_col, text_col),
        batch_format="pyarrow",
    )
    merged = partial_group_agg(
        partials, keys=[group_col, "token"], sum_cols=["n"], count_as=None
    )
    merged = merged.map_batches(
        lambda t: t.rename_columns([group_col, "token", "n"]),
        batch_format="pyarrow",
    )
    return per_group_topk(
        merged, group_col, [("n", False), ("token", True)], k, rank_col="rank"
    )


def doc_token_counts(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Per-batch (doc, token, n) partial term frequencies — the
    inverted-index combiner. Tokens are the ``\\S+`` matches (same
    mirror as token_value_counts); the in-batch Arrow group-count
    collapses repeated terms before the shuffle."""
    ids = batch[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    t = batch[text_col]
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    lists = pc.ascii_split_whitespace(t.cast(pa.string()))
    # null text rows split to null lists: length must read 0, not NaN
    # (a NaN→int64 cast produces garbage repeat counts)
    lens = (
        pc.fill_null(pc.list_value_length(lists), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    flat = pc.list_flatten(lists)
    rep = np.repeat(np.arange(len(batch), dtype=np.int64), lens)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    pairs = pa.table(
        {
            id_col: ids.take(pa.array(rep[keep], pa.int64())),
            "token": flat.filter(pa.array(keep)),
        }
    )
    counted = pairs.group_by([id_col, "token"]).aggregate([([], "count_all")])
    return counted.set_column(
        2, "n", counted["count_all"].cast(pa.int64())
    ).rename_columns([id_col, "token", "n"])


def tfidf_topk(ds, n_docs: int, id_col: str = "doc_id", text_col: str = "text",
               k: int = 3, n_buckets: int = 64):
    """Top-k distinctive terms per document by tf·idf — the
    inverted-index pipeline as THREE linear shuffle stages (no
    self-join, no double consumption of the index):

    1. (doc, token) partial→final term frequencies (combiner above).
    2. bucket by hash(token): every posting of one term lands in one
       reduce bucket, so document frequency is a per-bucket bincount
       over the dictionary-encoded term column; the idf score attaches
       to each posting in place — this replaces the classic tf⋈df
       self-join (which would either re-execute or materialize the
       index twice).
    3. bucket by hash(doc): per-doc rank by (score desc, token asc) —
       an integer sort, because the score is quantized to ppm
       (``floor(tf·ln(N/df)·1e6 + 0.5)``, int64) BEFORE ranking, so
       rank order is bit-identical to the SQL mirror's.

    ``n_docs`` is the corpus document count (an O(1) parquet-metadata
    read on the driver). Python cost O(n_buckets) per stage."""
    from rio_cogeo_ray.functions.hashing import hash_columns
    from rio_cogeo_ray.stages.agg import partial_group_agg

    tf = partial_group_agg(
        ds.map_batches(
            lambda t: doc_token_counts(t, id_col, text_col), batch_format="pyarrow"
        ),
        keys=[id_col, "token"],
        sum_cols=["n"],
        count_as=None,
    )

    def _bucket_by(col):
        def _b(t: pa.Table) -> pa.Table:
            b = (hash_columns(t, [col]) % np.uint64(n_buckets)).astype(np.int64)
            return t.append_column("__bucket", pa.array(b, pa.int64()))
        return _b

    n_f = float(n_docs)

    def _score_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__bucket"])
        tok = g["token"].combine_chunks()
        de = tok.dictionary_encode()
        idx = de.indices.to_numpy(zero_copy_only=False)
        df = np.bincount(idx)[idx].astype(np.float64)  # postings per term == df (rows are distinct (doc, token))
        tf_v = g["sum_n"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        score = np.floor(tf_v * np.log(n_f / df) * 1e6 + 0.5).astype(np.int64)
        return pa.table(
            {
                id_col: g[id_col],
                "token": tok,
                "score_ppm": pa.array(score, pa.int64()),
            }
        )

    def _rank_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__bucket"]).sort_by(
            [(id_col, "ascending"), ("score_ppm", "descending"), ("token", "ascending")]
        )
        ids = g[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        new = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            new[1:] = ids[1:] != ids[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(g)))
        rank = np.arange(len(g), dtype=np.int64) - np.repeat(starts, lens) + 1
        keep = rank <= k
        out = g.filter(pa.array(keep))
        return out.append_column("rank", pa.array(rank[keep], pa.int64()))

    scored = (
        tf.map_batches(_bucket_by("token"), batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(_score_bucket, batch_format="pyarrow")
    )
    return (
        scored.map_batches(_bucket_by(id_col), batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(_rank_bucket, batch_format="pyarrow")
    )


def char_entropy(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document character-distribution entropy in INTEGER floor-bits
    — the gibberish/boilerplate signal of the Gopher-style quality
    suite: ``entropy_bits = Σ_c cnt_c · floor(log2(n / cnt_c))`` over
    the doc's codepoint histogram (low for single-char spam, high for
    diverse text). Integer-exact (float64-exponent floor-log2 ≡ SQL
    ``LENGTH(bin(n // cnt)) - 1`` — the surprisal_score contract), so
    hash-identical at any parallelism.

    Scale shape: the histogram is per-doc ⇒ PURE MAP stage, zero
    shuffle: one vectorized codepoint decode (+ lexsort runs) per
    batch. Returns (id, entropy_bits, n_chars_tot); zero-char docs
    drop out."""

    def _ent(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "entropy_bits": pa.array([], pa.int64()),
                "n_chars_tot": pa.array([], pa.int64()),
            }
        )
        if not batch.num_rows:
            return empty
        doc_idx, cp = _codepoints(batch[text_col])
        if not len(doc_idx):
            return empty
        n = batch.num_rows
        tot = np.bincount(doc_idx, minlength=n).astype(np.int64)
        order = np.lexsort((cp, doc_idx))
        d_s, c_s = doc_idx[order], cp[order]
        new = np.r_[True, (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])]
        starts = np.flatnonzero(new)
        cnt = np.diff(np.append(starts, len(d_s))).astype(np.int64)
        d_run = d_s[starts]
        ratio = tot[d_run] // cnt
        bits = (np.frexp(ratio.astype(np.float64))[1] - 1).astype(np.int64)
        ent = np.zeros(n, dtype=np.int64)
        np.add.at(ent, d_run, cnt * bits)
        nz = tot > 0
        ids = batch[id_col].combine_chunks().cast(pa.int64())
        return pa.table(
            {
                id_col: ids.filter(pa.array(nz)),
                "entropy_bits": pa.array(ent[nz], pa.int64()),
                "n_chars_tot": pa.array(tot[nz], pa.int64()),
            }
        )

    return ds.map_batches(_ent, batch_format="pyarrow")


def surprisal_score(ds, id_col: str = "doc_id", text_col: str = "text",
                    n_buckets: int = 64, broadcast_vocab: bool = True,
                    carry_cols: tuple = ()):
    """Unigram surprisal quality score per document — the CCNet/KenLM
    perplexity-filter analog with an INTEGER-EXACT surprisal unit:
    each token occurrence contributes ``floor(log2(N // cf(token)))``
    bits, where cf is the corpus-wide count of that token and N the
    corpus token total. Rare-token-heavy (gibberish-ish) docs score
    high bits/token; stopword soup scores near zero. Returns
    (id, surprisal_bits, n_tokens) — callers divide or threshold.

    Exactness: floor-log2 of an int64 is computed via the float64
    exponent (``np.frexp``), exact for N ≤ 2^53 (≳ 10^15 tokens — an
    order beyond 100 TB of text), and mirrors SQL
    ``LENGTH(bin(N // cf)) - 1`` bit-for-bit, so the whole score is
    shuffle-order-independent.

    Scale shape: token strings never enter an exchange — they collapse
    to 64-bit polars hashes map-side (the segment_dedup contract:
    equal hash stands for equal token, with documented 2^-64-per-pair
    collision odds — a collision merges two tokens' cf counts,
    shifting a doc's bits only if the merged count crosses a power of
    two). Two execution shapes:

    - ``broadcast_vocab=True`` (default, the lm_coverage doctrine):
      ONE vocab-bounded shuffle (per-batch np.unique collapses token
      mass before the exchange: rows ∝ distinct-tokens-per-batch, not
      doc-token pairs), the (hash → bits) table broadcasts once via
      ``ray.put``, and scoring is a stateless actor map with ZERO
      doc-token shuffle. Memory contract: the vocab fits one object
      (~16 B/term — 10^8 terms ≈ 1.6 GB; web-scale vocabs pass a
      min_count upstream or use the fallback).
    - ``broadcast_vocab=False``: tfidf_topk's three linear stages —
      (doc, token-hash, tf) combiner → bucket by token hash, cf and
      bits attach in place per bucket → partial→final sum per doc.
      Unbounded vocab, but the exchange moves doc-token pair rows.

    ``carry_cols``: extra input columns forwarded onto the scored rows
    (zero-token docs drop with their carried values). Only the
    broadcast path supports it — the fallback's per-doc partial→final
    sum cannot carry non-key columns; consumers there re-join by id.
    This is what lets ccnet_buckets avoid an O(docs)-row join AND a
    third corpus read just to recover the language column."""
    import polars as pl

    import ray as _ray

    from rio_cogeo_ray.functions.hashing import splitmix64
    from rio_cogeo_ray.stages.agg import partial_group_agg

    carry_cols = tuple(carry_cols)
    if carry_cols and not broadcast_vocab:
        raise ValueError(
            "carry_cols requires broadcast_vocab=True (the fallback's "
            "per-doc partial aggregate cannot carry non-key columns; "
            "re-join by id instead)"
        )

    def _th(toks: pa.Array) -> np.ndarray:
        return (
            pl.from_arrow(toks.cast(pa.large_string()))
            .hash(seed=11)
            .to_numpy()
            .astype(np.uint64)
            .view(np.int64)
        )

    def _empty_out(batch=None) -> pa.Table:
        cols = {
            id_col: pa.array([], pa.int64()),
            "surprisal_bits": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
        }
        for c in carry_cols:
            cols[c] = (
                batch[c].combine_chunks().slice(0, 0)
                if batch is not None
                else pa.array([], pa.string())
            )
        return pa.table(cols)

    _EMPTY_OUT = _empty_out()

    if broadcast_vocab:
        def _vocab_partial(batch: pa.Table) -> pa.Table:
            toks, row, _ = _tokenize_with_positions(batch, id_col, text_col)
            if len(row) == 0:
                return pa.table(
                    {"th": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
                )
            uniq, cnt = np.unique(_th(toks), return_counts=True)
            return pa.table(
                {
                    "th": pa.array(uniq, pa.int64()),
                    "n": pa.array(cnt.astype(np.int64), pa.int64()),
                }
            )

        vocab = partial_group_agg(
            ds.map_batches(_vocab_partial, batch_format="pyarrow"),
            keys=["th"],
            sum_cols=["n"],
            count_as=None,
        )
        vt = pa.concat_tables(
            _ray.get(vocab.to_arrow_refs()), promote_options="default"
        ).combine_chunks()
        if not vt.num_rows:
            return ds.map_batches(_empty_out, batch_format="pyarrow")
        th_v = vt["th"].to_numpy(zero_copy_only=False)
        cf_v = vt["sum_n"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(th_v)
        th_sorted, cf_sorted = th_v[order], cf_v[order]
        n_total = int(cf_sorted.sum())
        ratio = n_total // cf_sorted
        bits_v = (np.frexp(ratio.astype(np.float64))[1] - 1).astype(np.int64)
        state = _ray.put((th_sorted, bits_v))

        # stateless TASK map, not an actor pool: ray.get of the numpy
        # pair from a task is a ZERO-COPY plasma view (the segment_dedup
        # bloom doctrine), so the broadcast costs nothing per batch and
        # the tokenize+hash kernel scales to every core instead of a
        # bounded pool
        def _score(batch: pa.Table) -> pa.Table:
            th_s, bits_s = _ray.get(state)
            toks, row, _ = _tokenize_with_positions(batch, id_col, text_col)
            if len(row) == 0:
                return _empty_out(batch)
            b = bits_s[np.searchsorted(th_s, _th(toks))]
            n = batch.num_rows
            # float64 sums are exact here: bits ≤ 63, ≤ 2^53 tokens/doc
            sums = np.bincount(row, weights=b.astype(np.float64), minlength=n)
            cnts = np.bincount(row, minlength=n)
            nz = cnts > 0
            ids = batch[id_col].combine_chunks().cast(pa.int64())
            nz_mask = pa.array(nz)
            cols = {
                id_col: ids.filter(nz_mask),
                "surprisal_bits": pa.array(sums[nz].astype(np.int64), pa.int64()),
                "n_tokens": pa.array(cnts[nz].astype(np.int64), pa.int64()),
            }
            for c in carry_cols:
                cols[c] = batch[c].combine_chunks().filter(nz_mask)
            return pa.table(cols)

        return ds.map_batches(_score, batch_format="pyarrow")

    def _ntok(t: pa.Table) -> pa.Table:
        c = token_count(t[text_col])
        tot = int(pc.sum(c).as_py() or 0)
        return pa.table({"n": pa.array([tot], pa.int64())})

    ntok_blocks = [
        b
        for b in _ray.get(
            ds.map_batches(_ntok, batch_format="pyarrow").to_arrow_refs()
        )
        if b.num_rows and "n" in b.column_names
    ]
    n_total = sum(
        int(pc.sum(b["n"]).as_py() or 0) for b in ntok_blocks
    )
    if n_total == 0:
        return ds.map_batches(_empty_out, batch_format="pyarrow")

    def _hash_counts(batch: pa.Table) -> pa.Table:
        """(id, th, n) in-batch combined token-hash frequencies — one
        vectorized sort+reduceat, no string group-by, no string rows
        downstream."""
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "th": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        toks, row, _ = _tokenize_with_positions(batch, id_col, text_col)
        if len(row) == 0:
            return empty
        th = (
            pl.from_arrow(toks.cast(pa.large_string()))
            .hash(seed=11)
            .to_numpy()
            .astype(np.uint64)
            .view(np.int64)
        )
        ids = batch[id_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((th, row))
        r_s, t_s = row[order], th[order]
        new = np.r_[True, (r_s[1:] != r_s[:-1]) | (t_s[1:] != t_s[:-1])]
        starts = np.flatnonzero(new)
        cnt = np.diff(np.append(starts, len(r_s)))
        return pa.table(
            {
                id_col: pa.array(ids[r_s[starts]], pa.int64()),
                "th": pa.array(t_s[starts], pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    tf = partial_group_agg(
        ds.map_batches(_hash_counts, batch_format="pyarrow"),
        keys=[id_col, "th"],
        sum_cols=["n"],
        count_as=None,
    )

    def _route_token(t: pa.Table) -> pa.Table:
        b = (
            splitmix64(t["th"].combine_chunks().to_numpy(zero_copy_only=False).view(np.uint64))
            % np.uint64(n_buckets)
        ).astype(np.int64)
        return t.append_column("__bucket", pa.array(b, pa.int64()))

    def _bits_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__bucket"])
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "bits_part": pa.array([], pa.int64()),
                "n_part": pa.array([], pa.int64()),
            }
        )
        if not g.num_rows:
            return empty
        th = g["th"].combine_chunks().to_numpy(zero_copy_only=False)
        n_v = g["sum_n"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, idx = np.unique(th, return_inverse=True)
        cf = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(cf, idx, n_v)
        ratio = n_total // cf[idx]
        bits = (np.frexp(ratio.astype(np.float64))[1] - 1).astype(np.int64)
        return pa.table(
            {
                id_col: g[id_col].combine_chunks().cast(pa.int64()),
                "bits_part": pa.array(n_v * bits, pa.int64()),
                "n_part": pa.array(n_v, pa.int64()),
            }
        )

    scored = (
        tf.map_batches(_route_token, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(_bits_bucket, batch_format="pyarrow")
    )
    agg = partial_group_agg(
        scored, keys=[id_col], sum_cols=["bits_part", "n_part"], count_as=None
    )
    return agg.map_batches(
        lambda t: t.rename_columns([id_col, "surprisal_bits", "n_tokens"]),
        batch_format="pyarrow",
    )


def _hash_vocab_counts(ds, id_col: str, text_col: str):
    """Corpus-wide token-hash frequency table, collected driver-side as
    (th_sorted, cf_sorted) int64 arrays. Per-batch ``np.unique``
    collapses token mass BEFORE the exchange (rows ∝ distinct tokens
    per batch, not doc-token pairs); one vocab-bounded
    partial_group_agg finishes. The collect is bounded by vocab size —
    the surprisal_score/lm_coverage broadcast-vocab memory contract."""
    import polars as pl

    import ray as _ray

    from rio_cogeo_ray.stages.agg import partial_group_agg

    def _vocab_partial(batch: pa.Table) -> pa.Table:
        toks, row, _ = _tokenize_with_positions(batch, id_col, text_col)
        if len(row) == 0:
            return pa.table(
                {"th": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        th = (
            pl.from_arrow(toks.cast(pa.large_string()))
            .hash(seed=11)
            .to_numpy()
            .astype(np.uint64)
            .view(np.int64)
        )
        uniq, cnt = np.unique(th, return_counts=True)
        return pa.table(
            {
                "th": pa.array(uniq, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    vocab = partial_group_agg(
        ds.map_batches(_vocab_partial, batch_format="pyarrow"),
        keys=["th"],
        sum_cols=["n"],
        count_as=None,
    )
    vt = pa.concat_tables(
        _ray.get(vocab.to_arrow_refs()), promote_options="default"
    ).combine_chunks()
    if not vt.num_rows:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    th_v = vt["th"].to_numpy(zero_copy_only=False)
    cf_v = vt["sum_n"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(th_v)
    return th_v[order], cf_v[order]


def _hash_vocab_counts_dual(ds, id_col: str, text_col: str, mask_col: str):
    """One-pass variant of :func:`_hash_vocab_counts` for the common
    DSIR case where the target corpus is a FILTERED SUBSET of the raw
    corpus (e.g. the en-language slice): tokenize once, count each
    token's raw occurrences AND its occurrences in mask-true rows in
    the same per-batch collapse, one vocab-bounded shuffle total —
    instead of tokenizing the corpus twice and shuffling two vocab
    tables. Returns (th_sorted, cf_all, cf_masked)."""
    import polars as pl

    import ray as _ray

    from rio_cogeo_ray.stages.agg import partial_group_agg

    def _vocab_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "th": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "nm": pa.array([], pa.int64()),
            }
        )
        toks, row, _ = _tokenize_with_positions(batch, id_col, text_col)
        if len(row) == 0:
            return empty
        th = (
            pl.from_arrow(toks.cast(pa.large_string()))
            .hash(seed=11)
            .to_numpy()
            .astype(np.uint64)
            .view(np.int64)
        )
        m = (
            pc.fill_null(batch[mask_col].combine_chunks().cast(pa.bool_()), False)
            .to_numpy(zero_copy_only=False)
        )
        tok_m = m[row]
        uniq, inv, cnt = np.unique(th, return_inverse=True, return_counts=True)
        cnt_m = np.bincount(inv[tok_m], minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                "th": pa.array(uniq, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
                "nm": pa.array(cnt_m, pa.int64()),
            }
        )

    vocab = partial_group_agg(
        ds.map_batches(_vocab_partial, batch_format="pyarrow"),
        keys=["th"],
        sum_cols=["n", "nm"],
        count_as=None,
    )
    vt = pa.concat_tables(
        _ray.get(vocab.to_arrow_refs()), promote_options="default"
    ).combine_chunks()
    z = np.zeros(0, dtype=np.int64)
    if not vt.num_rows:
        return z, z, z
    th_v = vt["th"].to_numpy(zero_copy_only=False)
    cf_v = vt["sum_n"].to_numpy(zero_copy_only=False).astype(np.int64)
    cm_v = vt["sum_nm"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(th_v)
    return th_v[order], cf_v[order], cm_v[order]


def dsir_score(
    raw_ds,
    target_ds=None,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_mask_col: str = None,
):
    """DSIR hashed-unigram importance weight (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling",
    NeurIPS 2023) with an INTEGER-EXACT bit unit. Each token occurrence
    in a raw document contributes

        bits_raw(tok) - bits_tgt(tok),  where
        bits_X(tok)  = floor(log2((N_X + V) // (cf_X(tok) + 1)))

    — the Laplace-1-smoothed unigram surprisal under the raw model
    minus the surprisal under the target model, over the UNION vocab
    of size V (so every count, including cf = 0 for target-absent
    tokens, stays defined and positive). Positive ``dsir_bits`` means
    the document is more probable under the target distribution than
    under the raw distribution — the paper's log importance weight
    log(p_tgt / p_raw) in floor-log2 units, mirroring SQL
    ``LENGTH(bin(x)) - 1`` bit-for-bit (surprisal_score's exactness
    contract: np.frexp exponents are exact for x ≤ 2^53), so the score
    is shuffle-order- and parallelism-invariant. Downstream selection
    composes with existing operators: threshold via
    sketch.percentile_rank / grouped_quantile, or resample via
    sample_weighted.

    Scale shape (the surprisal/lm_coverage doctrine): each corpus pays
    ONE vocab-bounded shuffle (np.unique partials collapse token mass
    map-side); the merged (hash -> delta-bits) pair broadcasts once via
    ``ray.put``; scoring is a stateless TASK map over the raw corpus
    with ZERO doc-token shuffle (zero-copy plasma view per task).
    Token strings never enter an exchange — 64-bit polars hashes stand
    in, with the documented 2^-64-per-pair collision contract.

    Returns (id, dsir_bits, n_tokens); empty raw corpus returns the
    empty typed table.
    """
    import polars as pl

    import ray as _ray

    _EMPTY = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "dsir_bits": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
        }
    )

    if (target_ds is None) == (target_mask_col is None):
        raise ValueError(
            "dsir_score takes exactly one of target_ds (separate target "
            "corpus) or target_mask_col (target = mask-true subset of raw)"
        )
    if target_mask_col is not None:
        # fused path: target ⊆ raw ⇒ union vocab = raw vocab; one
        # tokenize pass and ONE vocab shuffle count both models
        th_u, cf_r_u, cf_t_u = _hash_vocab_counts_dual(
            raw_ds, id_col, text_col, target_mask_col
        )
        v = len(th_u)
        if v == 0:
            return raw_ds.map_batches(lambda t: _EMPTY, batch_format="pyarrow")
        cf_r, cf_t = cf_r_u, cf_t_u
    else:
        th_r, cf_r = _hash_vocab_counts(raw_ds, id_col, text_col)
        th_t, cf_t = _hash_vocab_counts(target_ds, id_col, text_col)
        th_u = np.union1d(th_r, th_t)
        v = len(th_u)
        if v == 0:
            return raw_ds.map_batches(lambda t: _EMPTY, batch_format="pyarrow")
        cf_r_u = np.zeros(v, dtype=np.int64)
        cf_r_u[np.searchsorted(th_u, th_r)] = cf_r
        cf_t_u = np.zeros(v, dtype=np.int64)
        cf_t_u[np.searchsorted(th_u, th_t)] = cf_t
    n_r = int(cf_r.sum())
    n_t = int(cf_t.sum())
    # (N + V) // (cf + 1) >= 1 always (cf <= N, V >= 1), so floor-log2
    # stays defined even for an empty target model (uniform over V)
    bits_r = (
        np.frexp(((n_r + v) // (cf_r_u + 1)).astype(np.float64))[1] - 1
    ).astype(np.int64)
    bits_t = (
        np.frexp(((n_t + v) // (cf_t_u + 1)).astype(np.float64))[1] - 1
    ).astype(np.int64)
    state = _ray.put((th_u, bits_r - bits_t))

    def _score(batch: pa.Table) -> pa.Table:
        th_s, delta_s = _ray.get(state)
        toks, row, _ = _tokenize_with_positions(batch, id_col, text_col)
        if len(row) == 0:
            return _EMPTY
        th = (
            pl.from_arrow(toks.cast(pa.large_string()))
            .hash(seed=11)
            .to_numpy()
            .astype(np.uint64)
            .view(np.int64)
        )
        d = delta_s[np.searchsorted(th_s, th)]
        n = batch.num_rows
        # float64 sums exact: |delta| <= 63 bits, <= 2^53 tokens/doc
        sums = np.bincount(row, weights=d.astype(np.float64), minlength=n)
        cnts = np.bincount(row, minlength=n)
        nz = cnts > 0
        ids = batch[id_col].combine_chunks().cast(pa.int64())
        return pa.table(
            {
                id_col: ids.filter(pa.array(nz)),
                "dsir_bits": pa.array(sums[nz].astype(np.int64), pa.int64()),
                "n_tokens": pa.array(cnts[nz].astype(np.int64), pa.int64()),
            }
        )

    return raw_ds.map_batches(_score, batch_format="pyarrow")


def chunk_texts(
    batch: pa.Table,
    text_col: str = "text",
    window: int = 120,
    stride: int = 80,
) -> pa.Table:
    """Explode each row into overlapping character-window chunks — the
    standard LLM-pipeline chunker (RAG indexing / context packing).

    Chunk i of a doc with L code points covers [i*stride, i*stride +
    window); n_chunks = 1 if L <= window else ceil((L-window)/stride)+1,
    so the last chunk always reaches the end of the doc (it may be
    shorter than ``window``). Pure map-side explode: no shuffle, output
    fan-out bounded by ceil(L/stride) per row, carries every non-text
    column through unchanged.

    SQL mirror (exact): lateral ``generate_series(1, n_chunks)`` +
    ``substring(text, (g-1)*stride + 1, window)`` — both engines count
    Unicode code points.
    """
    # null text produces ZERO chunks (mirrors the SQL: g <= NULL is
    # never true) — and keeps the NaN length out of the int64 cast.
    batch = batch.filter(pc.is_valid(batch[text_col].combine_chunks()))
    texts = batch[text_col].combine_chunks()
    lens = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.int64)
    n_chunks = np.where(
        lens <= window, 1, -(-(lens - window) // stride) + 1
    ).astype(np.int64)
    keep_cols = [c for c in batch.column_names if c != text_col]
    out_schema = pa.schema(
        [batch.schema.field(c) for c in keep_cols]
        + [("chunk_id", pa.int64()), ("chunk_text", pa.string()), ("chunk_len", pa.int64())]
    )
    # Fully Arrow-native explode: one filter + utf8_slice_codeunits call
    # per distinct chunk index (<= ceil(max_len/stride) iterations, each
    # a vectorized kernel over every row having that chunk) — chunk text
    # never round-trips through Python objects. NOTE utf8_slice_codeunits
    # counts code POINTS (arrow kernel semantics), matching SQL substring.
    parts = []
    max_n = int(n_chunks.max()) if len(batch) else 0
    for ci in range(max_n):
        sel = n_chunks > ci
        sub = batch.filter(pa.array(sel))
        chunk = pc.utf8_slice_codeunits(
            sub[text_col].combine_chunks(), start=ci * stride, stop=ci * stride + window
        )
        cols = [sub[c] for c in keep_cols] + [
            pa.array(np.full(len(sub), ci, dtype=np.int64), pa.int64()),
            chunk,
            pc.utf8_length(chunk).cast(pa.int64()),
        ]
        parts.append(pa.table(dict(zip(out_schema.names, cols))).cast(out_schema))
    if not parts:
        return out_schema.empty_table()
    return pa.concat_tables(parts)


def _greedy_pack(tokens: np.ndarray, budget: int) -> np.ndarray:
    """Sequential greedy packing: walk the (ordered) token counts,
    opening a new sequence whenever adding the next doc would overflow
    ``budget`` (a doc larger than the budget gets its own sequence).
    O(n_bins * log n) via searchsorted on the cumsum — NOT a per-row
    Python loop; the iteration count is the number of output sequences.
    Returns int64 seq ids (0-based) per input row."""
    n = len(tokens)
    out = np.empty(n, dtype=np.int64)
    c = np.cumsum(tokens.astype(np.int64))
    s = 0
    seq = 0
    while s < n:
        offset = c[s - 1] if s else 0
        j = int(np.searchsorted(c, offset + budget, side="right"))
        j = max(j, s + 1)  # an oversized doc still occupies one sequence
        out[s:j] = seq
        seq += 1
        s = j
    return out


def pack_sequences(
    ds,
    budget: int,
    group_col: str = "source",
    order_col: str = "doc_id",
    text_col: str = "text",
):
    """Context-window sequence packing — group docs into training
    sequences of at most ``budget`` tokens (whitespace tokens), greedily
    in ``order_col`` order WITHIN each ``group_col`` shard.

    Per-shard packing keeps the operator embarrassingly parallel at
    100 TB: the only shuffle is the groupby on the shard key (which a
    sharded layout already satisfies — at scale, read each shard as its
    own dataset and skip the shuffle entirely). Deterministic: same
    input → same sequence ids regardless of parallelism.

    Output: (group_col, order_col, toks, seq_id) rows.
    """

    def _toks(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                group_col: t[group_col].combine_chunks(),
                order_col: t[order_col].combine_chunks(),
                "toks": token_count(t[text_col].combine_chunks()),
            }
        )

    return pack_counted(
        ds.map_batches(_toks, batch_format="pyarrow"),
        budget,
        group_col=group_col,
        order_col=order_col,
        count_col="toks",
    )


def pack_counted(
    ds,
    budget: int,
    group_col: str = "source",
    order_col: str = "doc_id",
    count_col: str = "toks",
):
    """Sequence packing over PRECOMPUTED token counts (``count_col``) —
    the tokenizer-aware variant: feed it stages/tokenizer.py
    bpe_token_counts output instead of whitespace counts. Same
    per-shard greedy kernel and partitioning contract as
    :func:`pack_sequences`."""

    def _pack_group(g: pa.Table) -> pa.Table:
        g = g.sort_by([(order_col, "ascending")])
        toks = g[count_col].combine_chunks().to_numpy(zero_copy_only=False)
        return g.append_column(
            "seq_id", pa.array(_greedy_pack(toks, budget), pa.int64())
        )

    return ds.groupby(group_col).map_groups(_pack_group, batch_format="pyarrow")


def _doc_ngram_hashes(
    batch: "pa.Table", n: int, id_col: str, text_col: str
) -> "pa.Table":
    """Per-batch (doc_id, g1, g2) rows: the DISTINCT word n-grams of
    each document as 128-bit rolling combinations of per-token hashes.
    Two grams collide only if their token sequences collide under both
    64-bit seeds — the same collision contract as dedup's hash128.
    Tokens are the ``\\S+`` matches (the repo-wide SQL mirror)."""
    import polars as pl

    from rio_cogeo_ray.functions.hashing import splitmix64

    ids = batch[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    t = batch[text_col]
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    lists = pc.ascii_split_whitespace(t.cast(pa.string()))
    # null text rows split to null lists: length must read 0, not NaN
    # (a NaN→int64 cast produces garbage repeat counts)
    lens = (
        pc.fill_null(pc.list_value_length(lists), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    flat = pc.list_flatten(lists)
    rep = np.repeat(np.arange(len(batch), dtype=np.int64), lens)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    toks = flat.filter(pa.array(keep))
    rep = rep[keep]
    m = len(rep)
    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "g1": pa.array([], pa.int64()),
            "g2": pa.array([], pa.int64()),
        }
    )
    if m < n:
        return empty
    h1 = pl.from_arrow(toks.cast(pa.large_string())).hash(seed=101).to_numpy().astype(np.uint64)
    h2 = splitmix64(h1 ^ np.uint64(0xD1B54A32D192ED03))
    nw = m - n + 1
    g1 = np.zeros(nw, dtype=np.uint64)
    g2 = np.zeros(nw, dtype=np.uint64)
    for j in range(n):
        g1 = splitmix64(g1 + h1[j : j + nw])
        g2 = splitmix64(g2 + h2[j : j + nw])
    valid = rep[:nw] == rep[n - 1 :]  # gram must not span documents
    if not valid.any():
        return empty
    doc = rep[:nw][valid]
    g1v = g1[valid].astype(np.int64)
    g2v = g2[valid].astype(np.int64)
    # distinct grams WITHIN each doc (one vote per doc per gram)
    order = np.lexsort((g2v, g1v, doc))
    ds_, g1s, g2s = doc[order], g1v[order], g2v[order]
    first = np.r_[
        True,
        (ds_[1:] != ds_[:-1]) | (g1s[1:] != g1s[:-1]) | (g2s[1:] != g2s[:-1]),
    ]
    return pa.table(
        {
            id_col: ids.cast(pa.int64()).take(pa.array(ds_[first], pa.int64())),
            "g1": pa.array(g1s[first], pa.int64()),
            "g2": pa.array(g2s[first], pa.int64()),
        }
    )


def cross_doc_ngrams(
    ds,
    n: int = 5,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
):
    """Per-document count of word n-grams SHARED with other documents —
    the cross-document duplicated-span signal (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better":
    boilerplate / near-dup / contamination all surface as n-grams with
    document frequency ≥ 2). Returns (id, dup_ngrams) for documents
    with at least one such gram.

    Scale shape — two LINEAR shuffles, tfidf_topk's doctrine:

    1. map: per-doc DISTINCT gram hashes (128-bit token-sequence
       rolling hash; text never leaves the map stage; within-doc
       duplicate grams collapse BEFORE the exchange).
    2. bucket by hash(g1): every posting of one gram lands in one
       reduce bucket; doc-frequency is a run-length over the sorted
       (g1, g2) column; qualifying rows collapse to per-(bucket, doc)
       partial counts — the bucket emits O(docs) rows, not O(grams).
    3. partial→final sum per doc (stages/agg.py).

    Hot grams (boilerplate shared by millions of docs) concentrate
    postings in one bucket — same caveat as tf·idf's stopword note;
    the per-bucket work stays one vectorized pass.
    """
    from rio_cogeo_ray.functions.hashing import splitmix64
    from rio_cogeo_ray.stages.agg import partial_group_agg

    rows = ds.map_batches(
        lambda t: _doc_ngram_hashes(t, n, id_col, text_col),
        batch_format="pyarrow",
        batch_size=8192,
    )

    def _route(t: pa.Table) -> pa.Table:
        b = (
            splitmix64(t["g1"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.uint64))
            % np.uint64(n_buckets)
        ).astype(np.int64)
        return t.append_column("__bucket", pa.array(b, pa.int64()))

    def _bucket(g: pa.Table) -> pa.Table:
        if not g.num_rows:
            return pa.table(
                {id_col: pa.array([], pa.int64()), "dup_partial": pa.array([], pa.int64())}
            )
        g1 = g["g1"].combine_chunks().to_numpy(zero_copy_only=False)
        g2 = g["g2"].combine_chunks().to_numpy(zero_copy_only=False)
        doc = g[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((g2, g1))
        g1s, g2s, docs_ = g1[order], g2[order], doc[order]
        start = np.r_[True, (g1s[1:] != g1s[:-1]) | (g2s[1:] != g2s[:-1])]
        run = np.cumsum(start) - 1
        df = np.bincount(run)  # rows per gram == doc frequency (rows are per-doc distinct)
        hit = df[run] >= min_docs
        if not hit.any():
            return pa.table(
                {id_col: pa.array([], pa.int64()), "dup_partial": pa.array([], pa.int64())}
            )
        hit_docs = docs_[hit]
        uniq, cnt = np.unique(hit_docs, return_counts=True)
        return pa.table(
            {
                id_col: pa.array(uniq, pa.int64()),
                "dup_partial": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    partials = (
        rows.map_batches(_route, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda g: _bucket(g.drop_columns(["__bucket"])), batch_format="pyarrow")
    )
    summed = partial_group_agg(partials, keys=[id_col], sum_cols=["dup_partial"], count_as=None)
    return summed.map_batches(
        lambda t: pa.table(
            {id_col: t[id_col].combine_chunks(), "dup_ngrams": t["sum_dup_partial"].combine_chunks()}
        ),
        batch_format="pyarrow",
    )


def normalize_text(
    batch: pa.Table, text_col: str = "text", out_col: str = "text_norm"
) -> pa.Table:
    """Standard corpus normalization pass (the step before hashing /
    shingling in every web pipeline): lowercase, collapse whitespace
    runs to single spaces, trim ends. Pure Arrow kernel chain
    (utf8_lower → RE2 replace → trim) — stateless map, zero shuffle,
    and exactly mirrored by SQL ``trim(regexp_replace(lower(text),
    '\s+', ' ', 'g'))``."""
    t = batch[text_col]
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    s = pc.utf8_lower(t.cast(pa.string()))
    s = pc.replace_substring_regex(s, pattern=r"\s+", replacement=" ")
    s = pc.utf8_trim_whitespace(s)
    return batch.append_column(out_col, s)


# ---------------------------------------------------------------------------
# Segment-level dedup scrub (CCNet / C4 line-dedup analog)
# ---------------------------------------------------------------------------


def _tokenize_with_positions(batch: pa.Table, id_col: str, text_col: str):
    """Shared tokenizer kernel: ``\\S+`` tokens of every doc with
    (row-index, word-position-within-doc) arrays. Returns
    (toks: pa.Array, row: np.ndarray, wpos: np.ndarray) — empty docs
    contribute nothing."""
    t = batch[text_col]
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    # ascii_split_whitespace ≡ RE2 \s+ split (ASCII \s — verified
    # incl. the NBSP non-split case) at ~6× the regex kernel's speed;
    # the empty-token filter below absorbs the only boundary-artifact
    # difference, so the \S+ SQL-mirror contract is unchanged
    lists = pc.ascii_split_whitespace(t.cast(pa.string()))
    # null text rows split to null lists: length must read 0, not NaN
    # (a NaN→int64 cast produces garbage repeat counts)
    lens = (
        pc.fill_null(pc.list_value_length(lists), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    flat = pc.list_flatten(lists)
    row = np.repeat(np.arange(len(batch), dtype=np.int64), lens)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    toks = flat.filter(pa.array(keep))
    row = row[keep]
    m = len(row)
    if m == 0:
        return toks, row, np.zeros(0, dtype=np.int64)
    idx = np.arange(m, dtype=np.int64)
    first = np.r_[True, row[1:] != row[:-1]]
    doc_start = np.maximum.accumulate(np.where(first, idx, 0))
    return toks, row, idx - doc_start


def _doc_segment_rows(
    batch: pa.Table, seg_words: int, id_col: str, text_col: str
) -> pa.Table:
    """(id, sidx, s1, s2) rows: each doc split into consecutive
    non-overlapping ``seg_words``-word windows (the last one may be
    shorter), hashed as a 128-bit token-SEQUENCE rolling hash — the
    same collision contract as dedup's hash128 and cross_doc_ngrams:
    equal hash ⟺ equal token sequence (mod 2^-128 odds), and equal
    token sequence ⟺ equal single-space-joined segment text, so the
    hash stands in exactly for SQL's PARTITION BY segment-string."""
    import polars as pl

    from rio_cogeo_ray.functions.hashing import splitmix64

    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "sidx": pa.array([], pa.int64()),
            "s1": pa.array([], pa.int64()),
            "s2": pa.array([], pa.int64()),
        }
    )
    ids = batch[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    toks, row, wpos = _tokenize_with_positions(batch, id_col, text_col)
    if len(row) == 0:
        return empty
    th1 = pl.from_arrow(toks.cast(pa.large_string())).hash(seed=101).to_numpy().astype(np.uint64)
    th2 = splitmix64(th1 ^ np.uint64(0xD1B54A32D192ED03))
    starts = np.flatnonzero(wpos % seg_words == 0)
    words_per_doc = np.bincount(row, minlength=len(batch))
    seg_len = np.minimum(seg_words, words_per_doc[row[starts]] - wpos[starts])
    n = len(starts)
    h1 = np.zeros(n, dtype=np.uint64)
    h2 = np.zeros(n, dtype=np.uint64)
    for j in range(seg_words):
        msk = seg_len > j
        if not msk.any():
            break
        ii = starts[msk] + j
        h1[msk] = splitmix64(h1[msk] + th1[ii])
        h2[msk] = splitmix64(h2[msk] + th2[ii])
    return pa.table(
        {
            id_col: ids.cast(pa.int64()).take(pa.array(row[starts], pa.int64())),
            "sidx": pa.array(wpos[starts] // seg_words, pa.int64()),
            "s1": pa.array(h1.astype(np.int64), pa.int64()),
            "s2": pa.array(h2.astype(np.int64), pa.int64()),
        }
    )


def _emit_joined_docs(
    docs: pa.Table, id_col: str, text_col: str, seg_words: int, drop_keys=None
) -> pa.Table:
    """Rebuild (id, text_clean, n_kept) from a doc table, optionally
    dropping the segments whose (doc-row-local key) appears in
    ``drop_keys`` (int64 ``word_row * 2^32 + sidx`` keys, SORTED).
    Fully Arrow/numpy: token lists re-join via ``binary_join`` over a
    rebuilt ListArray — no per-row Python, no dataframe round-trip."""
    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "text_clean": pa.array([], pa.string()),
            "n_kept": pa.array([], pa.int64()),
        }
    )
    if not docs.num_rows:
        return empty
    toks, row, wpos = _tokenize_with_positions(docs, id_col, text_col)
    if len(row) == 0:
        return empty
    sidx = wpos // seg_words
    if drop_keys is not None and len(drop_keys):
        wkey = (row << np.int64(32)) | sidx
        pos = np.searchsorted(drop_keys, wkey)
        pos = np.minimum(pos, len(drop_keys) - 1)
        keep = drop_keys[pos] != wkey
        toks = toks.filter(pa.array(keep))
        row_k, wpos_k = row[keep], wpos[keep]
    else:
        row_k, wpos_k = row, wpos
    if len(row_k) == 0:
        return empty
    n = docs.num_rows
    counts = np.bincount(row_k, minlength=n)
    nz = counts > 0
    n_kept = np.bincount(row_k[wpos_k % seg_words == 0], minlength=n)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    # int64 offsets: a reduce bucket may hold >2^31 bytes of text
    lists = pa.LargeListArray.from_arrays(
        pa.array(offsets, pa.int64()), toks.cast(pa.large_string())
    )
    joined = pc.binary_join(lists, pa.scalar(" ", pa.large_string()))
    out = pa.table(
        {
            id_col: docs[id_col].combine_chunks().cast(pa.int64()),
            "text_clean": joined,
            "n_kept": pa.array(n_kept.astype(np.int64), pa.int64()),
        }
    ).filter(pa.array(nz))
    # stable output schema: stay below the int32-offset ceiling per
    # batch (callers bound batch/bucket text bytes), cast for schema
    # parity with the clean path
    return out.set_column(1, "text_clean", out["text_clean"].cast(pa.string()))


def _seg_bloom_hits(batch: pa.Table, bits: np.ndarray, id_col: str) -> np.ndarray:
    """Bloom membership over the id column — delegates to
    join.bloom_hits so build and probe can never desync on the hash
    family or probe count."""
    from rio_cogeo_ray.stages.join import bloom_hits

    keys = batch[id_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
    return bloom_hits(bits, keys)


def segment_dedup(
    ds,
    seg_words: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    m_bits: int = 1 << 23,
    broadcast_losers: int = 4_000_000,
):
    """Corpus-wide SEGMENT-level dedup scrub (the CCNet / C4 "drop
    duplicated lines across the corpus" step, adapted to fixed
    ``seg_words``-word windows since the synthetic corpus has no
    newlines): every segment keeps only its FIRST occurrence
    (min (doc_id, sidx) lexicographic), every later copy is scrubbed,
    and docs are reassembled from their surviving segments in order.
    Docs left with zero segments drop out. Returns
    (id, text_clean, n_kept).

    SQL mirror: ROW_NUMBER() OVER (PARTITION BY segment ORDER BY
    doc_id, sidx) = 1 → string_agg(segment, ' ' ORDER BY sidx).

    Scale shape — clean docs NEVER enter an exchange (the
    incremental_dedup bloom doctrine; web corpora are ~90% clean at
    the segment level):

    1. map: docs → (id, sidx, s1, s2) segment-hash rows; text never
       enters this exchange (~16 B/segment vs ~60 B/segment of text).
    2. losers: bucket by hash(s1) → one vectorized sort + run-mask per
       bucket → LOSER rows (id, sidx) — every occurrence EXCEPT the
       first. Output is bounded by the duplicate mass, not the corpus.
    3. a bloom of loser doc ids (join.build_bloom — distributed
       bitmap, tree-OR fan-in, broadcast once) splits the corpus
       map-side: bloom-negative docs (no FN possible) rebuild their
       normalized text locally and SKIP the shuffle; bloom-positive
       docs (dups + ~2% FPs) co-bucket with their loser rows by
       hash(id) and drop lost segments in one vectorized anti pass
       (FPs carry no loser rows → reassemble unchanged — harmless).

    At 100 TB with a 10% dirty rate the exchange moves ~10% of corpus
    bytes + the loser-row hash stream; the clean 90% streams straight
    from read to output. Cost: the corpus is SCANNED three times (the
    seg-hash pass, then one pass per split side — clean emit and dirty
    forward are independent consumers of ``ds``); pruned columnar
    re-reads beat one full-text all-to-all, which is why the split is
    two stateless scans rather than a materialized tagged intermediate.

    ADAPTIVE BROADCAST: the loser table is materialized anyway, so its
    row count is known before the scrub side is planned. When it fits
    under ``broadcast_losers`` rows (16 B/row ⇒ the 4M default is a
    64 MB blob — the broadcast-small-side doctrine), the bloom split,
    the dirty forward scan AND the reassembly exchange are all skipped:
    ONE corpus scan scrubs every doc map-side against the
    ``ray.put``-shared sorted (id, sidx) loser arrays. At bench scale
    this halves the pipeline; at 100 TB (billions of loser rows) the
    count trips the threshold and the bloom-split shuffle path runs."""
    import ray as _ray

    from rio_cogeo_ray.functions.hashing import splitmix64
    from rio_cogeo_ray.stages.join import build_bloom

    seg_rows = ds.map_batches(
        lambda t: _doc_segment_rows(t, seg_words, id_col, text_col),
        batch_format="pyarrow",
        batch_size=8192,
    )

    def _route_seg(t: pa.Table) -> pa.Table:
        b = (
            splitmix64(t["s1"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.uint64))
            % np.uint64(n_buckets)
        ).astype(np.int64)
        return t.append_column("__bucket", pa.array(b, pa.int64()))

    def _losers(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__bucket"])
        if not g.num_rows:
            return pa.table(
                {id_col: pa.array([], pa.int64()), "sidx": pa.array([], pa.int64())}
            )
        g = g.sort_by(
            [("s1", "ascending"), ("s2", "ascending"), (id_col, "ascending"), ("sidx", "ascending")]
        )
        s1 = g["s1"].combine_chunks().to_numpy(zero_copy_only=False)
        s2 = g["s2"].combine_chunks().to_numpy(zero_copy_only=False)
        loser = ~np.r_[True, (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])]
        return g.take(pa.array(np.flatnonzero(loser), pa.int64())).select([id_col, "sidx"])

    # small side (duplicate mass only) — materialized once, consumed
    # twice (bloom build + the anti exchange) without re-running the
    # whole seg-hash pipeline
    losers = (
        seg_rows.map_batches(_route_seg, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(_losers, batch_format="pyarrow")
    ).materialize()

    if losers.count() <= broadcast_losers:
        lblocks = [b for b in _ray.get(losers.to_arrow_refs()) if b.num_rows]
        if lblocks:
            ltab = pa.concat_tables(lblocks, promote_options="default")
            lid = ltab[id_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
            lsx = ltab["sidx"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        else:  # no duplicated segments anywhere (or empty corpus)
            lid = np.zeros(0, np.int64)
            lsx = np.zeros(0, np.int64)
        order = np.lexsort((lsx, lid))
        losers_ref = _ray.put((lid[order], lsx[order]))

        def _scrub_bcast(batch: pa.Table) -> pa.Table:
            lid_s, lsx_s = _ray.get(losers_ref)  # zero-copy plasma view
            if not batch.num_rows or not len(lid_s):
                return _emit_joined_docs(batch, id_col, text_col, seg_words)
            ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
            lo = np.searchsorted(lid_s, ids, side="left")
            hi = np.searchsorted(lid_s, ids, side="right")
            cnt = hi - lo
            total = int(cnt.sum())
            if total == 0:
                return _emit_joined_docs(batch, id_col, text_col, seg_words)
            # vectorized range-concat: loser positions per doc row
            rows = np.repeat(np.arange(len(ids), dtype=np.int64), cnt)
            csum = np.concatenate(([0], np.cumsum(cnt)[:-1]))
            pos = np.arange(total, dtype=np.int64) - np.repeat(csum, cnt) + np.repeat(lo, cnt)
            drop_keys = np.unique((rows << np.int64(32)) | lsx_s[pos])
            return _emit_joined_docs(
                batch, id_col, text_col, seg_words, drop_keys=drop_keys
            )

        return ds.map_batches(_scrub_bcast, batch_format="pyarrow")

    # the bloom ships as a numpy blob: ray.get from a task is a
    # ZERO-COPY plasma view, so stateless task-based map stages (which
    # scale to every core, unlike a bounded actor pool) pay nothing
    # per batch for the broadcast
    bloom_ref = _ray.put(
        np.frombuffer(build_bloom(losers, id_col, m_bits=m_bits), dtype=np.uint8)
    )

    def _emit_clean(batch: pa.Table) -> pa.Table:
        bits = _ray.get(bloom_ref)
        hit = _seg_bloom_hits(batch, bits, id_col)
        return _emit_joined_docs(
            batch.filter(pa.array(~hit)), id_col, text_col, seg_words
        )

    def _forward_dirty(batch: pa.Table) -> pa.Table:
        bits = _ray.get(bloom_ref)
        hit = _seg_bloom_hits(batch, bits, id_col)
        t = batch.filter(pa.array(hit))
        return pa.table(
            {
                id_col: t[id_col].combine_chunks().cast(pa.int64()),
                "sidx": pa.array(np.full(len(t), -1, dtype=np.int64), pa.int64()),
                text_col: t[text_col].combine_chunks().cast(pa.string()),
            }
        )

    clean = ds.map_batches(_emit_clean, batch_format="pyarrow")
    dirty_docs = ds.map_batches(_forward_dirty, batch_format="pyarrow")

    def _tag_loser(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: t[id_col].combine_chunks(),
                "sidx": t["sidx"].combine_chunks(),
                text_col: pa.nulls(len(t), pa.string()),
            }
        )

    def _route_id(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (splitmix64(ids) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("__bucket", pa.array(b, pa.int64()))

    def _reassemble(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__bucket"])
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "text_clean": pa.array([], pa.string()),
                "n_kept": pa.array([], pa.int64()),
            }
        )
        if not g.num_rows:
            return empty
        sidx = g["sidx"].combine_chunks().to_numpy(zero_copy_only=False)
        docs = g.filter(pa.array(sidx < 0)).select([id_col, text_col])
        lose = g.filter(pa.array(sidx >= 0)).select([id_col, "sidx"])
        if not docs.num_rows:
            return empty
        if not lose.num_rows:
            return _emit_joined_docs(docs, id_col, text_col, seg_words)
        # map loser (id, sidx) → (doc-row, sidx) keys in THIS bucket
        dids = docs[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(dids, kind="stable")
        dids_sorted = dids[order]
        lids = lose[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        lpos = np.searchsorted(dids_sorted, lids)
        lpos_c = np.minimum(lpos, len(dids_sorted) - 1)
        present = dids_sorted[lpos_c] == lids  # loser doc may be absent (id uniqueness)
        lrow = order[lpos_c[present]].astype(np.int64)
        lsx = lose["sidx"].combine_chunks().to_numpy(zero_copy_only=False)[present]
        drop_keys = np.unique((lrow << np.int64(32)) | lsx)
        return _emit_joined_docs(docs, id_col, text_col, seg_words, drop_keys=drop_keys)

    tagged = losers.map_batches(_tag_loser, batch_format="pyarrow").union(dirty_docs)
    scrubbed = (
        tagged.map_batches(_route_id, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(_reassemble, batch_format="pyarrow")
    )
    return scrubbed.union(clean)


def intra_doc_dedup(
    ds, seg_words: int = 10, id_col: str = "doc_id", text_col: str = "text"
):
    """WITHIN-document segment dedup (the C4 "span seen before in this
    document" scrub — Raffel et al. 2020 §2.2 — over fixed
    ``seg_words``-word windows, since the synthetic corpus has no
    sentence boundaries): a segment survives iff its exact token
    sequence did not already occur at a smaller ``sidx`` of the SAME
    doc; docs reassemble from survivors in order. Returns
    (id, text_clean, n_kept); zero-token docs drop out.

    Scale shape: duplicate detection is row-local, so this is a PURE
    MAP stage — zero shuffle, zero actor state, one streaming pass at
    any corpus size (contrast :func:`segment_dedup`, whose
    first-occurrence winner is a global property and needs the
    loser/bloom exchange). Same hash-equality contract as
    ``_doc_segment_rows``: equal 128-bit hash ⟺ equal token sequence.

    SQL mirror: ROW_NUMBER() OVER (PARTITION BY doc_id, segment ORDER
    BY sidx) = 1 → string_agg(segment, ' ' ORDER BY sidx)."""

    def _scrub(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if not n:
            return _emit_joined_docs(batch, id_col, text_col, seg_words)
        local = batch.set_column(
            batch.schema.get_field_index(id_col),
            id_col,
            pa.array(np.arange(n, dtype=np.int64), pa.int64()),
        )
        seg = _doc_segment_rows(local, seg_words, id_col, text_col)
        row = seg[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        sidx = seg["sidx"].combine_chunks().to_numpy(zero_copy_only=False)
        s1 = seg["s1"].combine_chunks().to_numpy(zero_copy_only=False)
        s2 = seg["s2"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((sidx, s2, s1, row))
        r, a, b = row[order], s1[order], s2[order]
        first = np.r_[True, (r[1:] != r[:-1]) | (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        losers = order[~first]
        if not len(losers):
            return _emit_joined_docs(batch, id_col, text_col, seg_words)
        drop = np.sort((row[losers] << np.int64(32)) | sidx[losers])
        return _emit_joined_docs(batch, id_col, text_col, seg_words, drop_keys=drop)

    return ds.map_batches(_scrub, batch_format="pyarrow", batch_size=8192)


# ---------------------------------------------------------------------------
# Character-trigram LM coverage scoring (CCNet perplexity-filter analog)
# ---------------------------------------------------------------------------


def _doc_trigram_keys(batch: pa.Table, text_col: str):
    """(keys, rows): every overlapping 3-codepoint window of every doc
    packed COLLISION-FREE into one uint64 (3 × 21 bits — Unicode code
    points are < 2^21), plus the owning row index. Exactness contract:
    key equality ⟺ 3-char substring equality, so the packed int
    stands in for SQL ``substring(text, g, 3)`` literally."""
    doc_idx, cp = _codepoints(batch[text_col])
    if len(cp) < 3:
        return np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.int64)
    c = cp.astype(np.uint64)
    keys = (c[:-2] << np.uint64(42)) | (c[1:-1] << np.uint64(21)) | c[2:]
    valid = doc_idx[:-2] == doc_idx[2:]  # window must not span docs
    return keys[valid], doc_idx[:-2][valid]


def train_trigram_vocab(ds, text_col: str = "text", min_count: int = 2, n_buckets: int = 64):
    """Train the character-trigram "language model" on a reference
    corpus: the vocabulary of trigrams occurring ≥ ``min_count`` times.
    Distributed shape: per-batch ``np.unique`` partial counts (the
    Zipf-collapse doctrine of token_value_counts) → bucket by
    hash(key) → one sort+reduceat sum per bucket → threshold filter.
    Output rows (tri int64) are BOUNDED by the codepoint-alphabet cube
    (natural-language corpora: ~10^5–10^6 rows), not by corpus size —
    that is what makes the model broadcastable at 100 TB."""
    from rio_cogeo_ray.functions.hashing import splitmix64

    def _partial(t: pa.Table) -> pa.Table:
        keys, _ = _doc_trigram_keys(t, text_col)
        uniq, cnt = np.unique(keys, return_counts=True)
        return pa.table(
            {
                "tri": pa.array(uniq.astype(np.int64), pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
                "__bucket": pa.array(
                    (splitmix64(uniq) % np.uint64(n_buckets)).astype(np.int64), pa.int64()
                ),
            }
        )

    def _sum_bucket(g: pa.Table) -> pa.Table:
        if not g.num_rows:
            return pa.table({"tri": pa.array([], pa.int64())})
        tri = g["tri"].combine_chunks().to_numpy(zero_copy_only=False)
        cnt = g["cnt"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(tri, kind="stable")
        tri_s, cnt_s = tri[order], cnt[order]
        first = np.r_[True, tri_s[1:] != tri_s[:-1]]
        starts = np.flatnonzero(first)
        sums = np.add.reduceat(cnt_s, starts)
        keep = sums >= min_count
        return pa.table({"tri": pa.array(tri_s[starts][keep], pa.int64())})

    return (
        ds.map_batches(_partial, batch_format="pyarrow", batch_size=8192)
        .groupby("__bucket")
        .map_groups(lambda g: _sum_bucket(g.drop_columns(["__bucket"])), batch_format="pyarrow")
    )


class TrigramCoverage:
    """Actor: score every doc against the broadcast trigram vocabulary
    — in-vocabulary ratio in ppm (integer, so the score is exact and
    SQL-mirrorable; the float-perplexity variant would be rows-only).
    Vocabulary resolves ONCE per actor in ``__init__`` (``ray.get`` of
    the shared object-store ref + one sort); per batch the work is one
    packed-trigram pass + one ``searchsorted`` membership + two
    ``bincount``s."""

    def __init__(self, vocab_ref, id_col: str = "doc_id", text_col: str = "text"):
        import ray as _ray

        self.vocab = np.sort(_ray.get(vocab_ref).astype(np.uint64))
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                self.id_col: pa.array([], pa.int64()),
                "tri_total": pa.array([], pa.int64()),
                "in_vocab_ppm": pa.array([], pa.int64()),
            }
        )
        keys, rows = _doc_trigram_keys(batch, self.text_col)
        if not len(keys):
            return empty
        pos = np.searchsorted(self.vocab, keys)
        pos_c = np.minimum(pos, len(self.vocab) - 1) if len(self.vocab) else pos
        hit = (
            self.vocab[pos_c] == keys if len(self.vocab) else np.zeros(len(keys), dtype=bool)
        )
        n = len(batch)
        total = np.bincount(rows, minlength=n)
        hits = np.bincount(rows[hit], minlength=n)
        nz = total > 0
        ids = batch[self.id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        ppm = (np.int64(1_000_000) * hits[nz]) // total[nz]
        return pa.table(
            {
                self.id_col: ids.cast(pa.int64()).take(pa.array(np.flatnonzero(nz), pa.int64())),
                "tri_total": pa.array(total[nz].astype(np.int64), pa.int64()),
                "in_vocab_ppm": pa.array(ppm.astype(np.int64), pa.int64()),
            }
        )


def lm_coverage(
    docs_ds,
    ref_ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
    concurrency: int = 2,
):
    """Model-train → broadcast → score: the CCNet-style quality pass
    with the "LM" trained ON-CLUSTER from a reference slice instead of
    imported. ``ref_ds`` (e.g. the curated/wiki-like subset) trains the
    trigram vocabulary distributed (:func:`train_trigram_vocab`); the
    bounded vocab ships once via ``ray.put``; every doc gets its
    in-vocab ppm from an actor-pool map — ZERO shuffle of the corpus
    side, the same broadcast discipline as dedup.decontaminate."""
    import ray as _ray

    vt = train_trigram_vocab(ref_ds, text_col=text_col, min_count=min_count)
    parts = [pa.table(b) if not isinstance(b, pa.Table) else b for b in
             vt.iter_batches(batch_format="pyarrow", batch_size=None)]
    if parts:
        vocab = pa.concat_tables(parts)["tri"].combine_chunks().to_numpy(zero_copy_only=False)
    else:
        vocab = np.zeros(0, dtype=np.int64)
    ref = _ray.put(vocab.astype(np.uint64))
    return docs_ds.map_batches(
        TrigramCoverage,
        fn_constructor_args=(ref, id_col, text_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# Exact duplicated-SPAN scrub (Lee et al. 2021, the removal half)
# ---------------------------------------------------------------------------


def _pack128(g1: np.ndarray, g2: np.ndarray) -> np.ndarray:
    """(g1, g2) int64 pairs as big-endian 16-byte 'S16' keys: numpy
    bytes compare lexicographically, which on big-endian equals the
    unsigned numeric pair order — so ONE vectorized searchsorted probes
    the full 128-bit gram space with no collision-prone 64-bit fold
    (the HostBlocklist fixed-width-bytes discipline)."""
    m = len(g1)
    buf = np.empty((m, 2), dtype=">u8")
    buf[:, 0] = g1.astype(np.int64, copy=False).view(np.uint64)
    buf[:, 1] = g2.astype(np.int64, copy=False).view(np.uint64)
    return np.ascontiguousarray(buf).view("S16").reshape(m)


def _dup_gram_keepers(
    g: pa.Table, id_col: str, min_docs: int
) -> pa.Table:
    """Reduce one gram bucket: grams with doc frequency ≥ min_docs →
    (g1, g2, keeper = min doc_id). Input rows are per-doc DISTINCT."""
    empty = pa.table(
        {
            "g1": pa.array([], pa.int64()),
            "g2": pa.array([], pa.int64()),
            "keeper": pa.array([], pa.int64()),
        }
    )
    if not g.num_rows:
        return empty
    g1 = g["g1"].combine_chunks().to_numpy(zero_copy_only=False)
    g2 = g["g2"].combine_chunks().to_numpy(zero_copy_only=False)
    doc = g[id_col].combine_chunks().to_numpy(zero_copy_only=False)
    order = np.lexsort((g2, g1))
    g1s, g2s, docs_ = g1[order], g2[order], doc[order]
    start = np.r_[True, (g1s[1:] != g1s[:-1]) | (g2s[1:] != g2s[:-1])]
    starts = np.flatnonzero(start)
    df = np.diff(np.append(starts, len(g1s)))
    hit = df >= min_docs
    if not hit.any():
        return empty
    keepers = np.minimum.reduceat(docs_, starts)[hit]
    return pa.table(
        {
            "g1": pa.array(g1s[starts[hit]], pa.int64()),
            "g2": pa.array(g2s[starts[hit]], pa.int64()),
            "keeper": pa.array(keepers.astype(np.int64), pa.int64()),
        }
    )


def dup_span_scrub(
    ds,
    n: int = 5,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    max_broadcast: int = 1 << 24,
):
    """Remove cross-document duplicated token SPANS — the scrub half of
    Lee et al. 2021's exact substring dedup (cross_doc_ngrams is the
    signal half): a token is removed from a document iff it is covered
    by an occurrence of an n-gram that appears in ≥ ``min_docs``
    distinct documents AND this document is not the gram's keeper (min
    doc_id) — the keeper retains one copy of every duplicated span.
    Returns one row per input document: (id, text, n_removed), kept
    tokens re-joined by single spaces (the repo-wide string_agg
    contract).

    Scale shape, the segment_dedup discipline:

    1. dup-gram discovery = cross_doc_ngrams' two linear stages (per-doc
       distinct 128-bit gram hashes → one gram-bucket exchange), but
       each bucket emits (gram, keeper) rows — BOUNDED by the corpus's
       duplicated-gram mass, and materialized regardless for the gate.
    2. the bounded table broadcasts once via ``ray.put`` as a sorted
       16-byte-packed key array + aligned keeper ids; ONE corpus pass
       recomputes gram hashes WITH positions map-side, probes by
       searchsorted, expands hits to a token coverage mask (diff +
       cumsum), and rebuilds text via Arrow binary_join — the corpus
       text never enters any shuffle.

    ``max_broadcast`` gates step 2 (default 16M grams ≈ 384 MiB of
    keys+keepers): above it, raise loudly — the documented alternative
    is the segment_dedup bloom-split route (co-bucket dirty docs with
    their gram hits), which trades the broadcast for one text exchange
    of the dirty fraction."""
    import ray as _ray

    from rio_cogeo_ray.functions.hashing import splitmix64

    rows = ds.map_batches(
        lambda t: _doc_ngram_hashes(t, n, id_col, text_col),
        batch_format="pyarrow",
        batch_size=8192,
    )

    def _route(t: pa.Table) -> pa.Table:
        b = (
            splitmix64(
                t["g1"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.uint64)
            )
            % np.uint64(n_buckets)
        ).astype(np.int64)
        return t.append_column("__bucket", pa.array(b, pa.int64()))

    dup_blocks = [
        b
        for b in _ray.get(
            rows.map_batches(_route, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(
                lambda g: _dup_gram_keepers(g.drop_columns(["__bucket"]), id_col, min_docs),
                batch_format="pyarrow",
            )
            .to_arrow_refs()
        )
        if b.num_rows and {"g1", "g2", "keeper"} <= set(b.column_names)
    ]
    if dup_blocks:
        dup = pa.concat_tables(dup_blocks).combine_chunks()
    else:
        dup = pa.table(
            {
                "g1": pa.array([], pa.int64()),
                "g2": pa.array([], pa.int64()),
                "keeper": pa.array([], pa.int64()),
            }
        )
    if dup.num_rows > max_broadcast:
        raise ValueError(
            f"{dup.num_rows} duplicated grams exceed max_broadcast="
            f"{max_broadcast}; use the segment_dedup bloom-split route "
            "(co-bucket dirty docs with their gram hits) for this corpus"
        )
    packed = _pack128(
        dup["g1"].to_numpy(zero_copy_only=False),
        dup["g2"].to_numpy(zero_copy_only=False),
    )
    order = np.argsort(packed)
    pair_ref = _ray.put(
        (packed[order], dup["keeper"].to_numpy(zero_copy_only=False)[order])
    )

    def _scrub(batch: pa.Table) -> pa.Table:
        import polars as pl

        packed_s, keepers = _ray.get(pair_ref)
        ids = batch[id_col].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        nrows = batch.num_rows
        toks, row, _wpos = _tokenize_with_positions(batch, id_col, text_col)
        m = len(row)
        total = np.bincount(row, minlength=nrows).astype(np.int64)
        cover = np.zeros(m, dtype=bool)
        if m >= n and len(packed_s):
            h1 = (
                pl.from_arrow(toks.cast(pa.large_string()))
                .hash(seed=101)
                .to_numpy()
                .astype(np.uint64)
            )
            h2 = splitmix64(h1 ^ np.uint64(0xD1B54A32D192ED03))
            nw = m - n + 1
            g1 = np.zeros(nw, dtype=np.uint64)
            g2 = np.zeros(nw, dtype=np.uint64)
            for j in range(n):
                g1 = splitmix64(g1 + h1[j : j + nw])
                g2 = splitmix64(g2 + h2[j : j + nw])
            valid = row[:nw] == row[n - 1 :]
            starts_flat = np.flatnonzero(valid)
            probes = _pack128(
                g1[valid].astype(np.int64), g2[valid].astype(np.int64)
            )
            pos = np.searchsorted(packed_s, probes)
            pos_c = np.minimum(pos, len(packed_s) - 1)
            hit = packed_s[pos_c] == probes
            not_keeper = ids[row[:nw][valid]] != keepers[pos_c]
            s = starts_flat[hit & not_keeper]
            if len(s):
                delta = np.zeros(m + 1, dtype=np.int64)
                np.add.at(delta, s, 1)
                np.add.at(delta, s + n, -1)
                cover = np.cumsum(delta[:m]) > 0
        keep = ~cover
        kept_toks = toks.filter(pa.array(keep))
        kept_cnt = np.bincount(row[keep], minlength=nrows).astype(np.int64)
        offsets = np.zeros(nrows + 1, dtype=np.int64)
        np.cumsum(kept_cnt, out=offsets[1:])
        lists = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), kept_toks.cast(pa.large_string())
        )
        joined = pc.binary_join(lists, pa.scalar(" ", pa.large_string()))
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                text_col: joined.cast(pa.string()),
                "n_removed": pa.array(total - kept_cnt, pa.int64()),
            }
        )

    return ds.map_batches(_scrub, batch_format="pyarrow", batch_size=8192)


_CCNET_EMPTY = pa.table(
    {
        "lang": pa.array([], pa.string()),
        "bucket": pa.array([], pa.string()),
        "n_docs": pa.array([], pa.int64()),
        "total_tokens": pa.array([], pa.int64()),
    }
)


def ccnet_buckets(ds, id_col: str = "doc_id", text_col: str = "text",
                  lang_col: str = "lang", n_buckets: int = 64):
    """CCNet-style per-language perplexity bucketing (Wenzek et al.
    2020, arXiv:1911.00359): score every document with the integer
    unigram surprisal (:func:`surprisal_score` — the KenLM-perplexity
    analog), cut each language's score distribution at its exact 1/3
    and 2/3 order statistics, and label documents head (cleanest
    third), middle, tail — CCNet trains on head+middle. Returns the
    audit table (lang, bucket, n_docs, total_tokens).

    Exactness: scores are integer millibits/token
    (``1000·bits // n_tokens``); thresholds are exact type-1 order
    statistics (grouped_quantile, rank = ceil(q·n) — the SQL
    ROW_NUMBER mirror), so the recipe is hash-exact at any
    parallelism. NULL lang coalesces to '' on BOTH engine and oracle
    sides (web corpora carry nulls); zero-token documents drop (no
    score exists), mirroring the SQL tokenizer CTE.

    Scale shape — ONE corpus-scale pipeline, streaming end to end: the
    language column rides the surprisal stage itself (``carry_cols``),
    so there is NO re-join-by-id and NO extra corpus read; the per-doc
    scores collapse map-side into a per-(lang, millibits) HISTOGRAM
    whose size is corpus-independent (s ≤ 1000·log2(N) ≲ 60k distinct
    values per lang), because the audit table needs only distribution
    mass, never per-doc rows. Thresholds AND bucket rollups both
    derive from that one bounded histogram driver-side (the
    histogram-bin doctrine — same class as exact_quantiles' bins), so
    there is no second pass, no broadcast, no materialize. A per-doc
    labeling variant is the documented composition: surprisal_score →
    this function's thresholds → a stateless ``s <= t`` map."""
    import ray as _ray

    from rio_cogeo_ray.stages.agg import partial_group_agg

    def _prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: t[id_col].combine_chunks().cast(pa.int64()),
                text_col: t[text_col].combine_chunks().cast(pa.string()),
                lang_col: pc.fill_null(
                    t[lang_col].combine_chunks().cast(pa.string()), ""
                ),
            }
        )

    scored = surprisal_score(
        ds.map_batches(_prep, batch_format="pyarrow"),
        id_col=id_col,
        text_col=text_col,
        n_buckets=n_buckets,
        carry_cols=(lang_col,),
    )

    def _s(t: pa.Table) -> pa.Table:
        bits = t["surprisal_bits"].combine_chunks().to_numpy(zero_copy_only=False)
        ntok = t["n_tokens"].combine_chunks().to_numpy(zero_copy_only=False)
        # surprisal_score never emits n_tokens == 0 rows; // is exact
        s = (1000 * bits) // ntok
        return pa.table(
            {
                lang_col: t[lang_col].combine_chunks().cast(pa.string()),
                "s": pa.array(s.astype(np.int64), pa.int64()),
                "n_tokens": pa.array(ntok.astype(np.int64), pa.int64()),
            }
        )

    hist = partial_group_agg(
        scored.map_batches(_s, batch_format="pyarrow"),
        keys=[lang_col, "s"],
        sum_cols=["n_tokens"],
        count_as="n_docs",
        n_buckets=n_buckets,
    )
    blocks = [
        b
        for b in _ray.get(hist.to_arrow_refs())
        if b.num_rows and "n_docs" in b.column_names
    ]
    if not blocks:
        return _CCNET_EMPTY
    h = pa.concat_tables(blocks, promote_options="default").combine_chunks()
    lang_v = h[lang_col].to_numpy(zero_copy_only=False)
    s_v = h["s"].to_numpy(zero_copy_only=False).astype(np.int64)
    nd_v = h["n_docs"].to_numpy(zero_copy_only=False).astype(np.int64)
    nt_v = h["sum_n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((s_v, lang_v))
    lang_v, s_v, nd_v, nt_v = lang_v[order], s_v[order], nd_v[order], nt_v[order]

    out = {"lang": [], "bucket": [], "n_docs": [], "total_tokens": []}
    starts = np.flatnonzero(
        np.concatenate(([True], lang_v[1:] != lang_v[:-1]))
    )
    ends = np.append(starts[1:], len(lang_v))
    for a, b in zip(starts, ends):
        cnt, tok, sv = nd_v[a:b], nt_v[a:b], s_v[a:b]
        cum = np.cumsum(cnt)
        n = int(cum[-1])
        # type-1 order statistic: smallest s with cumcount >= ceil(q*n)
        # — identical to grouped_quantile's rank and the SQL ROW_NUMBER
        # mirror (rank clamped to >= 1)
        r33 = max(int(np.ceil(n / 3)), 1)
        r67 = max(int(np.ceil(2 * n / 3)), 1)
        t33 = sv[np.searchsorted(cum, r33)]
        t67 = sv[np.searchsorted(cum, r67)]
        head = sv <= t33
        mid = (~head) & (sv <= t67)
        tail = sv > t67
        for bucket, m in (("head", head), ("middle", mid), ("tail", tail)):
            if m.any():
                out["lang"].append(lang_v[a])
                out["bucket"].append(bucket)
                out["n_docs"].append(int(cnt[m].sum()))
                out["total_tokens"].append(int(tok[m].sum()))
    return pa.table(
        {
            "lang": pa.array([str(x) for x in out["lang"]], pa.string()),
            "bucket": pa.array(out["bucket"], pa.string()),
            "n_docs": pa.array(out["n_docs"], pa.int64()),
            "total_tokens": pa.array(out["total_tokens"], pa.int64()),
        }
    )


# Multi-label public suffixes — a documented SUBSET of the Mozilla
# Public Suffix List (publicsuffix.org; ICANN + private sections).
# The PSL algorithm: the host's public suffix is its LONGEST matching
# entry (any unlisted final label is implicitly a single-label
# suffix), and the registrable domain is the suffix plus exactly one
# more label. The full list is ~10k entries maintained out-of-band;
# the engine mechanism is list-size-independent (set membership over
# the last-k-label strings), so swapping in the full list is a
# constant change. Entries here cover the common ccTLD second-level
# registries plus two private-section hosts to exercise both tiers.
PUBLIC_SUFFIXES_2 = (
    "ac.uk", "blogspot.com", "co.in", "co.jp", "co.kr", "co.uk",
    "co.za", "com.ar", "com.au", "com.br", "com.cn", "com.mx",
    "com.tr", "github.io", "gov.uk", "ne.jp", "net.au", "or.jp",
    "org.au", "org.uk",
)
PUBLIC_SUFFIXES_3 = ("s3.amazonaws.com",)


def registrable_domains(
    batch: pa.Table, host_col: str = "host", out_col: str = "domain"
) -> pa.Table:
    """Registrable-domain (eTLD+1) extraction — the crawl-pipeline
    grouping unit (per-site caps, per-site dedup policy, robots scope):
    ``a.b.example.co.uk`` → ``example.co.uk``, ``www.example.com`` →
    ``example.com``, while a host that IS a public suffix (or has too
    few labels) yields ``''`` (the PSL "no registrable domain" case).

    Vectorized and shuffle-free: the last-2/3/4 label strings come from
    three anchored RE2 ``extract_regex`` passes (DuckDB
    ``regexp_extract`` mirrors them literally — both return '' on no
    match), suffix tier is ``pc.is_in`` against the embedded PSL
    subset, longest tier wins. No Python per row; the whole kernel is
    a stateless map at any corpus size."""
    h = batch[host_col]
    if isinstance(h, pa.ChunkedArray):
        h = h.combine_chunks()
    h = h.cast(pa.string())
    seg = r"[^.]+"

    def _last(k: int) -> pa.Array:
        pat = r"(?P<m>" + r"\.".join([seg] * k) + r")$"
        return pc.fill_null(pc.extract_regex(h, pat).field("m"), "")

    l2, l3, l4 = _last(2), _last(3), _last(4)
    in3 = pc.is_in(l3, value_set=pa.array(PUBLIC_SUFFIXES_3, pa.string()))
    in2 = pc.is_in(l2, value_set=pa.array(PUBLIC_SUFFIXES_2, pa.string()))
    dom = pc.if_else(in3, l4, pc.if_else(in2, l3, l2))
    return batch.append_column(out_col, dom)


def word_blocklist_counts(
    ds,
    words,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """C4-style dirty-word DOCUMENT filter signal (Raffel et al. 2020,
    §2.2 — C4 drops any page containing a word from the "List of
    Dirty, Naughty, Obscene or Otherwise Bad Words"; the list itself
    is a runtime input here): per-document count of whitespace tokens
    whose LOWERCASED form is in the blocklist, one row per flagged
    document (docs with zero hits emit nothing — at web scale the
    overwhelming majority — so the output is proportional to the
    flagged set, not the corpus). Filtering is the trivial
    composition: anti-semi-join doc ids against this, or invert the
    predicate map-side.

    Scale shape: pure map, ZERO shuffle — the word set broadcasts in
    the task closure (the list is small by contract: C4's is ~400
    entries/language); per batch one tokenize + one ``utf8_lower`` +
    one ``pc.is_in`` (vectorized C++ hash probe) + one bincount.
    SQL mirror: unnest(regexp_extract_all(text, '\\S+')) …
    WHERE lower(tok) IN (...) GROUP BY doc_id."""
    words = sorted({w.lower() for w in words})
    word_set = pa.array(words, pa.string())

    def _flag(batch: pa.Table) -> pa.Table:
        toks, row, _ = _tokenize_with_positions(batch, id_col, text_col)
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "n_blocked": pa.array([], pa.int64()),
            }
        )
        if len(row) == 0:
            return empty
        hit = pc.is_in(
            pc.utf8_lower(toks), value_set=word_set
        ).to_numpy(zero_copy_only=False)
        if not hit.any():
            return empty
        n = batch.num_rows
        cnt = np.bincount(row[hit], minlength=n).astype(np.int64)
        nz = cnt > 0
        ids = batch[id_col].combine_chunks().cast(pa.int64())
        return pa.table(
            {
                id_col: ids.filter(pa.array(nz)),
                "n_blocked": pa.array(cnt[nz], pa.int64()),
            }
        )

    return ds.map_batches(_flag, batch_format="pyarrow")


def c4_line_clean(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 5,
    min_lines: int = 3,
    drop_tokens: tuple = ("javascript",),
):
    """C4 line-level cleaner (Raffel et al. 2020 §2.2): keep only lines
    that end in a terminal punctuation mark ``. ! ? "`` AND contain at
    least ``min_words`` whitespace tokens AND do not mention any of
    ``drop_tokens`` (case-insensitive substring — C4 drops lines with
    the word "Javascript"); then drop documents with fewer than
    ``min_lines`` surviving lines (C4's "fewer than 3 sentences"
    rule). Returns (id, text_clean, n_kept) for surviving documents —
    text_clean is the kept lines rejoined with ``\\n``.

    Scale shape: pure map, ZERO shuffle — one ``split_pattern('\\n')``
    explode per batch, three vectorized line predicates
    (``match_substring_regex`` / ``count_substring_regex`` /
    lowercased ``match_substring``), and an offsets-rebuild +
    ``binary_join`` to reassemble each document's kept lines. No
    Python per row or per line; dropped documents emit nothing, so
    output ∝ survivors."""

    def _clean(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "text_clean": pa.array([], pa.string()),
                "n_kept": pa.array([], pa.int64()),
            }
        )
        n = batch.num_rows
        if n == 0:
            return empty
        t = batch[text_col]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        lists = pc.split_pattern(t.cast(pa.string()), "\n")
        lens = (
            pc.fill_null(pc.list_value_length(lists), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        flat = pc.list_flatten(lists)
        row = np.repeat(np.arange(n, dtype=np.int64), lens)
        if len(row) == 0:
            return empty
        keep = pc.match_substring_regex(flat, r'[.!?"]$')
        keep = pc.and_(
            keep,
            pc.greater_equal(
                pc.count_substring_regex(flat, r"\S+"),
                pa.scalar(min_words, pa.int32()),
            ),
        )
        low = pc.utf8_lower(flat)
        for tok in drop_tokens:
            keep = pc.and_(keep, pc.invert(pc.match_substring(low, tok)))
        keep_np = keep.to_numpy(zero_copy_only=False)
        kept_rows = row[keep_np]
        cnt = np.bincount(kept_rows, minlength=n).astype(np.int64)
        doc_ok = cnt >= min_lines
        if not doc_ok.any():
            return empty
        # flatten preserves (row, line) order, so the survivors are
        # already grouped by row: rebuild list offsets from the counts
        line_sel = doc_ok[kept_rows]
        lines2 = flat.filter(pa.array(keep_np)).filter(pa.array(line_sel))
        counts2 = cnt[doc_ok]
        offsets = np.concatenate(([0], np.cumsum(counts2)))
        la = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), lines2.combine_chunks()
            if isinstance(lines2, pa.ChunkedArray) else lines2
        )
        text_clean = pc.binary_join(la, pa.scalar("\n", pa.string()))
        ids = batch[id_col].combine_chunks().cast(pa.int64())
        return pa.table(
            {
                id_col: ids.filter(pa.array(doc_ok)),
                "text_clean": text_clean,
                "n_kept": pa.array(counts2, pa.int64()),
            }
        )

    return ds.map_batches(_clean, batch_format="pyarrow")


_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """The full Gopher quality-rule battery (Rae et al. 2021, appendix
    A1.1) as per-document integer flags — the reference doc-level
    filter set for web-scale LM corpora. Every rule is an INTEGER
    cross-multiplication (no float ratios), so the output is
    hash-exact at any parallelism and SQL-mirrorable:

    - r_words:    50 ≤ word count ≤ 100000
    - r_wordlen:  mean word length in [3, 10]  (3·w ≤ Σlen ≤ 10·w)
    - r_symbol:   (#count('#') + count('…')) / words ≤ 0.1
    - r_bullet:   lines starting with a bullet (- * •) ≤ 90%
    - r_ellipsis: lines ending in … or ... ≤ 30%
    - r_alpha:    ≥ 80% of words contain ≥ 1 alphabetic character
    - r_stop:     ≥ 2 DISTINCT stopwords of {the be to of and that
                  have with} present
    - gopher_ok:  AND of all seven

    Scale shape: pure map, ZERO shuffle — everything is
    count_substring / count_substring_regex / split-explode kernels
    per batch; line rules explode on '\\n' and bincount per doc, no
    per-line Python."""

    def _rules(batch: pa.Table) -> pa.Table:
        t = batch[text_col]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        t = pc.fill_null(t.cast(pa.string()), "")
        n = batch.num_rows

        words = pc.count_substring_regex(t, r"\S+").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        tok_chars = (
            pc.utf8_length(pc.replace_substring_regex(t, r"\s+", ""))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        n_hash = pc.count_substring(t, "#").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        n_ell = pc.count_substring(t, "…").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        # words containing a non-letter, subtracted from the word count
        # (RE2 has no lookahead — the QualityScore device)
        nonalpha = (
            pc.count_substring_regex(t, r"\S*[^\p{L}\s]\S*")
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        alpha_words = words - nonalpha

        # line rules: one split-explode, two line predicates, bincounts
        lists = pc.split_pattern(t, "\n")
        lens = (
            pc.fill_null(pc.list_value_length(lists), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        flat = pc.list_flatten(lists)
        row = np.repeat(np.arange(n, dtype=np.int64), lens)
        n_lines = np.maximum(lens, 1)  # '' splits to one empty line
        bullet = pc.match_substring_regex(
            flat, r"^\s*[-*•]"
        ).to_numpy(zero_copy_only=False)
        ell_end = pc.match_substring_regex(
            flat, r"(\.\.\.|…)\s*$"
        ).to_numpy(zero_copy_only=False)
        n_bullet = np.bincount(row[bullet], minlength=n).astype(np.int64)
        n_ell_end = np.bincount(row[ell_end], minlength=n).astype(np.int64)

        stop_present = np.zeros(n, dtype=np.int64)
        for w in _GOPHER_STOPWORDS:
            hit = pc.match_substring_regex(t, rf"\b{w}\b").to_numpy(
                zero_copy_only=False
            )
            stop_present += hit.astype(np.int64)

        r_words = (words >= 50) & (words <= 100_000)
        r_wordlen = (3 * words <= tok_chars) & (tok_chars <= 10 * words)
        r_symbol = 10 * (n_hash + n_ell) <= words
        r_bullet = 10 * n_bullet <= 9 * n_lines
        r_ellipsis = 10 * n_ell_end <= 3 * n_lines
        r_alpha = 5 * alpha_words >= 4 * words
        r_stop = stop_present >= 2
        ok = (
            r_words & r_wordlen & r_symbol & r_bullet & r_ellipsis
            & r_alpha & r_stop
        )
        flags = {
            "r_words": r_words, "r_wordlen": r_wordlen,
            "r_symbol": r_symbol, "r_bullet": r_bullet,
            "r_ellipsis": r_ellipsis, "r_alpha": r_alpha,
            "r_stop": r_stop, "gopher_ok": ok,
        }
        cols = {id_col: batch[id_col].combine_chunks().cast(pa.int64())}
        for k, v in flags.items():
            cols[k] = pa.array(v.astype(np.int64), pa.int64())
        return pa.table(cols)

    # batch_size=1024: the nine gram passes keep ~60 tokens/doc of
    # hash/len temporaries live; at 1024 docs they stay L2-resident.
    # Whole 30k-row blocks measured 2.5x the CPU at 6M pages
    # (2066 s -> 877 s total remote CPU; flags are per-doc, so the
    # result is batch-size-invariant by construction).
    return ds.map_batches(_rules, batch_format="pyarrow", batch_size=1024)


_GOPHER_REP_TOP = {2: 20, 3: 18, 4: 16}      # top-n-gram char %, Rae A1.1
_GOPHER_REP_DUP = {5: 15, 6: 14, 7: 13, 8: 12, 9: 11, 10: 10}


def gopher_repetition(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: tuple = (),
):
    """Gopher repetition-rule battery (Rae et al. 2021 appendix A1.1)
    as per-document integer flags — the within-document companion of
    :func:`gopher_rules`:

    - r_dline / r_dpara:            duplicate line / paragraph
                                    OCCURRENCES ≤ 30% of units
    - r_dline_char / r_dpara_char:  chars in duplicate occurrences
                                    ≤ 20% of unit chars
    - r_top2 / r_top3 / r_top4:     char mass of the heaviest n-gram
                                    (max over grams of count·len) ≤
                                    20% / 18% / 16% of doc chars
    - r_dup5 … r_dup10:             char mass of ALL repeated n-grams
                                    (Σ count·len over count ≥ 2) ≤
                                    15% … 10% of doc chars
    - repetition_ok:                AND of all thirteen

    Exactness contract: "top gram" is the MAXIMUM of count·char_len
    (not an arbitrary tie-broken argmax — deterministic under count
    ties), and the dup-gram mass counts every occurrence's chars
    (Σ count·len), a documented upper-bound reading of Gopher's
    character-coverage fraction (exact position-coverage needs an
    interval union; the proxy is deterministic, SQL-mirrorable, and
    monotone in the same signal). Gram char len = token chars +
    (n−1) separators ≡ SQL ``length(array_to_string(gram, ' '))``;
    denominators are raw doc chars. All thresholds are integer
    cross-multiplications. Units/grams compare by two-seed 64-bit
    hashes (the hash128 collision contract).

    Scale shape: pure map, ZERO shuffle — one line + one paragraph
    explode and nine vectorized rolling-hash gram passes per batch;
    per-doc reductions are lexsort+reduceat, no per-row Python."""
    import polars as pl

    from rio_cogeo_ray.functions.hashing import splitmix64

    def _unit_dup(strs, row: np.ndarray, n: int):
        """Per-row (n_units, dup_occurrences, unit_chars, dup_chars)
        over string units — duplicate = any occurrence past the first
        of an equal unit within the same row."""
        z = np.zeros(n, np.int64)
        if len(row) == 0:
            return z, z.copy(), z.copy(), z.copy()
        if isinstance(strs, pa.ChunkedArray):
            strs = strs.combine_chunks()
        h1 = (
            pl.from_arrow(strs.cast(pa.large_string()))
            .hash(seed=131).to_numpy().astype(np.uint64)
        )
        h2 = splitmix64(h1 ^ np.uint64(0x9E3779B97F4A7C15))
        ln = pc.utf8_length(strs).cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((h2, h1, row))
        r, a, b, l = row[order], h1[order], h2[order], ln[order]
        first = np.r_[
            True, (r[1:] != r[:-1]) | (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        ]
        starts = np.flatnonzero(first)
        cnt = np.diff(np.append(starts, len(r))).astype(np.int64)
        rl, rr = l[starts], r[starts]
        n_units = np.bincount(row, minlength=n).astype(np.int64)
        # float64 bincount weights: char sums per doc ≪ 2^53, exact
        dup_units = np.bincount(rr, weights=cnt - 1, minlength=n).astype(np.int64)
        unit_chars = np.bincount(rr, weights=cnt * rl, minlength=n).astype(np.int64)
        dup_chars = np.bincount(
            rr, weights=(cnt - 1) * rl, minlength=n
        ).astype(np.int64)
        return n_units, dup_units, unit_chars, dup_chars

    def _rules(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        t = batch[text_col]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        t = pc.fill_null(t.cast(pa.string()), "")
        total_chars = pc.utf8_length(t).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )

        def _explode(sep: str):
            lists = pc.split_pattern(t, sep)
            lens = (
                pc.fill_null(pc.list_value_length(lists), 0)
                .to_numpy(zero_copy_only=False).astype(np.int64)
            )
            return pc.list_flatten(lists), np.repeat(
                np.arange(n, dtype=np.int64), lens
            )

        lu = _unit_dup(*_explode("\n"), n)
        pu = _unit_dup(*_explode("\n\n"), n)

        # token stream once; nine rolling gram passes reuse it
        lists = pc.ascii_split_whitespace(t)
        lens = (
            pc.fill_null(pc.list_value_length(lists), 0)
            .to_numpy(zero_copy_only=False).astype(np.int64)
        )
        flat = pc.list_flatten(lists)
        rep = np.repeat(np.arange(n, dtype=np.int64), lens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        toks = flat.filter(pa.array(keep))
        rep = rep[keep]
        m = len(rep)
        tl = pc.utf8_length(toks).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        ) if m else np.zeros(0, np.int64)
        cs = np.concatenate(([0], np.cumsum(tl)))
        if m:
            h1 = (
                pl.from_arrow(toks.cast(pa.large_string()))
                .hash(seed=101).to_numpy().astype(np.uint64)
            )
            h2 = splitmix64(h1 ^ np.uint64(0xD1B54A32D192ED03))

        top_mass = {k: np.zeros(n, np.int64) for k in _GOPHER_REP_TOP}
        dup_mass = {k: np.zeros(n, np.int64) for k in _GOPHER_REP_DUP}
        # incremental gram-hash chains: C_k[i] = splitmix64(C_{k-1}[i]
        # + h[i+k-1]) equals the old per-gn from-scratch loop value
        # bit-for-bit (same recurrence, prefix-sliced), but the nine
        # gram lengths share ONE chain build — 9 hash passes per seed
        # instead of Σgn = 54
        gram_lens = sorted({*_GOPHER_REP_TOP, *_GOPHER_REP_DUP})

        def _consume(gn: int, g1: np.ndarray, g2: np.ndarray) -> None:
            nw = m - gn + 1
            valid = rep[:nw] == rep[gn - 1 :]
            if not valid.any():
                return
            doc = rep[:nw][valid]
            glen = (cs[gn:] - cs[:-gn])[valid] + (gn - 1)
            a, b = g1[valid], g2[valid]
            order = np.lexsort((b, a, doc))
            d_, a_, b_, l_ = doc[order], a[order], b[order], glen[order]
            first = np.r_[
                True,
                (d_[1:] != d_[:-1]) | (a_[1:] != a_[:-1]) | (b_[1:] != b_[:-1]),
            ]
            starts = np.flatnonzero(first)
            cnt = np.diff(np.append(starts, len(d_))).astype(np.int64)
            mass = cnt * l_[starts]
            docs_ = d_[starts]
            if gn in top_mass:
                np.maximum.at(top_mass[gn], docs_, mass)
            else:
                dup = cnt >= 2
                dup_mass[gn] += np.bincount(
                    docs_[dup], weights=mass[dup], minlength=n
                ).astype(np.int64)

        # each gram length is consumed AT its chain step, so only the
        # current c1/c2 stay live (~32 B/token peak, not 9 chains' worth)
        if m:
            c1 = np.zeros(m, dtype=np.uint64)
            c2 = np.zeros(m, dtype=np.uint64)
            with np.errstate(over="ignore"):
                for k in range(1, gram_lens[-1] + 1):
                    w = m - k + 1
                    if w <= 0:
                        break
                    c1 = splitmix64(c1[:w] + h1[k - 1 :])
                    c2 = splitmix64(c2[:w] + h2[k - 1 :])
                    if k in gram_lens:
                        _consume(k, c1, c2)

        flags = {
            "r_dline": 10 * lu[1] <= 3 * lu[0],
            "r_dpara": 10 * pu[1] <= 3 * pu[0],
            "r_dline_char": 5 * lu[3] <= lu[2],
            "r_dpara_char": 5 * pu[3] <= pu[2],
        }
        for gn, pct in _GOPHER_REP_TOP.items():
            flags[f"r_top{gn}"] = 100 * top_mass[gn] <= pct * total_chars
        for gn, pct in _GOPHER_REP_DUP.items():
            flags[f"r_dup{gn}"] = 100 * dup_mass[gn] <= pct * total_chars
        ok = np.ones(n, dtype=bool)
        for v in flags.values():
            ok &= v
        cols = {id_col: batch[id_col].combine_chunks().cast(pa.int64())}
        for k, v in flags.items():
            cols[k] = pa.array(v.astype(np.int64), pa.int64())
        cols["repetition_ok"] = pa.array(ok.astype(np.int64), pa.int64())
        # carry_cols: forward input columns 1:1 so a downstream filter
        # can gate the corpus MAP-SIDE instead of re-joining by id
        # (gate joins measured 60 s vs ~7 s map gating, 600k pages)
        for c in carry_cols:
            cols[c] = batch[c].combine_chunks()
        return pa.table(cols)

    # batch_size=1024: the nine gram passes keep ~60 tokens/doc of
    # hash/len temporaries live; at 1024 docs they stay L2-resident.
    # Whole 30k-row blocks measured 2.5x the CPU at 6M pages
    # (2066 s -> 877 s total remote CPU; flags are per-doc, so the
    # result is batch-size-invariant by construction).
    return ds.map_batches(_rules, batch_format="pyarrow", batch_size=1024)


#: Unicode scripts profiled by ``script_profile`` — RE2 script classes,
#: identical tables in pyarrow and DuckDB (both RE2), so per-script
#: counts are hash-exact cross-engine. Order matters: dominant-script
#: ties break toward the EARLIER entry.
SCRIPT_CLASSES = ("Latin", "Cyrillic", "Arabic", "Han", "Greek", "Hangul")


def script_profile(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    scripts=SCRIPT_CLASSES,
):
    """Per-document Unicode script mix (the webtext signal behind
    "wrong-script for the claimed language" and mixed-script spam
    filters, cf. CCNet's language-ID gate): per doc one count per
    script class, the dominant script (most codepoints, ties to the
    earlier ``scripts`` entry, '' when no scripted codepoints), and
    ``mixed_ppm`` — the integer ppm share of scripted codepoints NOT
    in the dominant script (0 = pure single-script).

    Scale shape: pure map, ZERO shuffle — one vectorized RE2
    ``count_substring_regex`` pass per script class per batch (k ≤ 6
    passes over the buffer; no per-row Python, no explode). Output is
    one row per document.

    SQL mirror: ``len(regexp_extract_all(text, '\\p{Latin}'))`` etc. —
    DuckDB's regexes are RE2, so the script tables agree codepoint for
    codepoint; dominance and mixed_ppm are integer arithmetic over
    those counts (greatest + CASE chain in list order)."""
    scripts = tuple(scripts)

    def _profile(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].combine_chunks()
        n = batch.num_rows
        counts = np.zeros((len(scripts), n), dtype=np.int64)
        for i, s in enumerate(scripts):
            c = pc.count_substring_regex(texts, r"\p{%s}" % s)
            counts[i] = np.nan_to_num(
                c.cast(pa.float64()).to_numpy(zero_copy_only=False)
            ).astype(np.int64)
        total = counts.sum(axis=0)
        top = counts.max(axis=0) if len(scripts) else np.zeros(n, np.int64)
        # first index reaching the max — ties break to earlier entry
        dom_idx = counts.argmax(axis=0) if len(scripts) else np.zeros(n, np.int64)
        dom = np.where(
            top > 0, np.array(scripts, dtype=object)[dom_idx], ""
        )
        mixed = np.zeros(n, dtype=np.int64)
        nz = total > 0
        mixed[nz] = ((total[nz] - top[nz]) * 1_000_000) // total[nz]
        cols = {id_col: batch[id_col].combine_chunks().cast(pa.int64())}
        for i, s in enumerate(scripts):
            cols[f"n_{s.lower()}"] = pa.array(counts[i], pa.int64())
        cols["dominant_script"] = pa.array(dom.tolist(), pa.string())
        cols["mixed_ppm"] = pa.array(mixed, pa.int64())
        return pa.table(cols)

    return ds.map_batches(_profile, batch_format="pyarrow")


def extract_outlinks(
    ds,
    id_col: str = "doc_id",
    html_col: str = "html",
    out_col: str = "outlink",
    with_anchor: bool = False,
):
    """Outgoing-link extraction from raw page HTML (the Common-Crawl
    web-graph builder — outlinks feed host-graph PageRank / spam-rank
    pipelines): one (id, outlink) row per ``href="…"`` attribute value.

    Extraction contract is SPLIT-DEVICE semantics, not regex-match
    semantics, and is documented as such: pieces between literal
    ``href="`` delimiters, each truncated at its first ``"``;
    pieces with no terminating quote (truncated/malformed html) are
    dropped. This is exactly DuckDB
    ``str_split(html, 'href=\"')[2:]`` + ``str_split(piece,'\"')[1]``
    filtered on ``contains(piece, '\"')`` — both engines scan the same
    literal delimiters, so results are hash-exact. (A nested
    ``href=`` inside an attribute VALUE attributes to the outer link
    in both engines alike.)

    Scale shape: pure map, ZERO shuffle — one ``split_pattern``
    explode per batch plus one bounded ``max_splits=1`` split for the
    terminating quote; no Python per row; output rows ∝ links. Binary
    html is cast to utf8 (the corpus contract; invalid utf8 raises
    loudly rather than silently corrupting links)."""

    def _anchor(pieces: pa.Array) -> pa.Array:
        # anchor text contract (``with_anchor``): the run between the
        # FIRST and SECOND '>' of the href piece, truncated at its
        # first '<' — the anchor's leading text; inner markup (<b>…)
        # truncates. A sentinel delimiter appended before each split
        # guarantees the element exists (no '>' after the url → ''),
        # mirroring SQL str_split(piece || '>', '>')[2] then
        # str_split(x || '<', '<')[1] element-for-element.
        after_gt = pc.list_element(
            pc.split_pattern(
                pc.binary_join_element_wise(pieces, pa.scalar(">"), ""), ">"
            ),
            1,
        )
        return pc.list_element(
            pc.split_pattern(
                pc.binary_join_element_wise(after_gt, pa.scalar("<"), ""), "<"
            ),
            0,
        )

    def _links(batch: pa.Table) -> pa.Table:
        cols = {
            id_col: pa.array([], pa.int64()),
            out_col: pa.array([], pa.string()),
        }
        if with_anchor:
            cols["anchor"] = pa.array([], pa.string())
        empty = pa.table(cols)
        n = batch.num_rows
        if n == 0:
            return empty
        h = batch[html_col]
        if isinstance(h, pa.ChunkedArray):
            h = h.combine_chunks()
        if pa.types.is_binary(h.type) or pa.types.is_large_binary(h.type):
            h = h.cast(pa.string() if pa.types.is_binary(h.type) else pa.large_string())
        h = pc.fill_null(h, "")
        lists = pc.split_pattern(h, 'href="')
        lens = (
            pc.list_value_length(lists)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        flat = pc.list_flatten(lists)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        row = np.repeat(np.arange(n, dtype=np.int64), lens)
        if len(row) == 0:
            return empty
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        pos = np.arange(len(row), dtype=np.int64) - np.repeat(starts, lens)
        keep = (pos > 0) & pc.match_substring(flat, '"').to_numpy(
            zero_copy_only=False
        )
        if not keep.any():
            return empty
        pieces = flat.filter(pa.array(keep))
        links = pc.list_element(pc.split_pattern(pieces, '"', max_splits=1), 0)
        ids = (
            batch[id_col]
            .combine_chunks()
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        out = {
            id_col: pa.array(ids[row[keep]], pa.int64()),
            out_col: links.cast(pa.string()),
        }
        if with_anchor:
            out["anchor"] = _anchor(pieces).cast(pa.string())
        return pa.table(out)

    return ds.map_batches(_links, batch_format="pyarrow")


def host_link_edges(
    links,
    id_col: str = "doc_id",
    link_col: str = "outlink",
    src_host_col: str = "src_host",
):
    """Host-level web-graph edge counts from an (id, src_host,
    outlink) Dataset: destination host via one anchored RE2 extract
    (`^https?://([^/]+)` — relative/malformed links yield '' exactly
    like DuckDB's no-match ``regexp_extract`` convention), then ONE
    partial→final count per (src_host, dst_host) — the standard
    web-graph contraction feeding pagerank/k-core in stages/graph.py.
    Edge rows are bounded by distinct host pairs, not by corpus
    size."""
    from rio_cogeo_ray.stages.agg import partial_group_agg

    def _dst(batch: pa.Table) -> pa.Table:
        u = batch[link_col]
        if isinstance(u, pa.ChunkedArray):
            u = u.combine_chunks()
        ex = pc.extract_regex(u, r"^https?://(?P<host>[^/]+)")
        return pa.table(
            {
                src_host_col: batch[src_host_col].combine_chunks().cast(pa.string()),
                "dst_host": pc.fill_null(ex.field("host"), "").cast(pa.string()),
            }
        )

    hosts = links.map_batches(_dst, batch_format="pyarrow")
    return partial_group_agg(
        hosts, keys=[src_host_col, "dst_host"], sum_cols=[], count_as="n_links"
    )


def bigram_surprisal(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: Optional[int] = None,
):
    """Bigram CONDITIONAL surprisal per document — the order-2
    extension of ``surprisal_score`` (KenLM-without-backoff over the
    corpus's own counts): each adjacent token pair (w1, w2)
    contributes ``floor(log2(cp(w1) // cb(w1, w2)))`` bits, where cb
    is the corpus-wide count of the pair and cp(w1) = Σ_w cb(w1, w)
    the count of w1 as a pair prefix — i.e. integer-exact
    -log2 p(w2 | w1). Text that keeps surprising its own corpus
    (incoherent word salad) scores high bits/pair; boilerplate scores
    near zero even when its unigrams are rare. Returns
    (id, bigram_bits, n_pairs) for docs with ≥ 2 tokens.

    Exactness: the floor-log2-via-float64-exponent device of
    surprisal_score (exact to 2^53); SQL mirror is
    ``LENGTH(bin(cp // cb)) - 1`` over string-keyed counts. Tokens
    collapse to 64-bit polars hashes map-side and pairs to one
    splitmix64 combine — equal hash stands for equal pair with the
    documented 2^-64-per-pair collision odds (segment_dedup contract).

    Scale shape (the broadcast-vocab doctrine): ONE model-bounded
    shuffle — per-batch np.unique collapses pair mass before the
    exchange, so rows ∝ distinct pairs per batch — then the
    (pair-hash → bits) table broadcasts once via ``ray.put`` and
    scoring is a stateless task map with ZERO doc-token shuffle.
    Memory contract: the bigram model fits one object (~16 B/pair;
    10^8 distinct pairs ≈ 1.6 GB). ``min_count`` is the web-scale
    bound: pairs with corpus count < min_count are PRUNED from the
    broadcast model and their occurrences fall back to unigram bits
    ``floor(log2(T // cu(w2)))`` (T = total pairs, cu = count of w2
    as a pair second element — the order-0 backoff of p(w2|w1) =
    p(w2)). The fallback table is vocab-bounded (≪ pairs), so the
    broadcast shrinks from O(distinct pairs) to O(kept pairs +
    vocab). Count-threshold pruning (not top-N) keeps the result
    deterministic and SQL-mirrorable — a top-N cut would need a
    tie-break on the opaque 64-bit pair hash, which no string-keyed
    oracle can reproduce. Kept-pair bits still use the FULL prefix
    totals cp(w1) (pruning changes which pairs carry conditional
    bits, never the probabilities of the ones that do).
    min_count<=1 keeps every observed pair — bit-identical to the
    unpruned path (pinned by pytest at the boundary)."""
    import polars as pl

    import ray as _ray

    from rio_cogeo_ray.functions.hashing import splitmix64
    from rio_cogeo_ray.stages.agg import partial_group_agg

    def _th(toks: pa.Array) -> np.ndarray:
        return (
            pl.from_arrow(toks.cast(pa.large_string()))
            .hash(seed=11)
            .to_numpy()
            .astype(np.uint64)
        )

    def _pairs(batch: pa.Table):
        toks, row, _ = _tokenize_with_positions(batch, id_col, text_col)
        if len(row) < 2:
            z = np.zeros(0, dtype=np.uint64)
            return z, z, z, np.zeros(0, dtype=np.int64)
        h = _th(toks)
        adj = row[1:] == row[:-1]
        u1 = h[:-1][adj]
        u2 = h[1:][adj]
        prow = row[:-1][adj]
        ph = splitmix64(u1 * np.uint64(0x9E3779B97F4A7C15) + u2)
        return ph, u1, u2, prow

    def _empty_out(batch=None) -> pa.Table:
        return pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "bigram_bits": pa.array([], pa.int64()),
                "n_pairs": pa.array([], pa.int64()),
            }
        )

    prune = min_count is not None

    def _model_partial(batch: pa.Table) -> pa.Table:
        ph, u1, u2, _ = _pairs(batch)
        if len(ph) == 0:
            cols = {
                "ph": pa.array([], pa.int64()),
                "h1": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
            if prune:
                cols["h2"] = pa.array([], pa.int64())
            return pa.table(cols)
        uniq, first_idx, cnt = np.unique(ph, return_index=True, return_counts=True)
        cols = {
            "ph": pa.array(uniq.view(np.int64), pa.int64()),
            "h1": pa.array(u1[first_idx].view(np.int64), pa.int64()),
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
        }
        if prune:
            # h2 rides the partials only when the unigram fallback
            # table is needed (h2 is functionally dependent on ph)
            cols["h2"] = pa.array(u2[first_idx].view(np.int64), pa.int64())
        return pa.table(cols)

    # big batches are what make the map-side collapse real: pair rows
    # ∝ tokens, distinct pairs ∝ vocab² ∩ corpus — at 65536 docs/batch
    # the per-batch np.unique collapses ~7× before anything moves
    # (measured 24.4M pair rows → ~3.5M partial rows, 600k-page bench)
    partials = ds.map_batches(
        _model_partial, batch_format="pyarrow", batch_size=65536
    ).materialize()
    # decide the merge path from METADATA — fetching the blocks first
    # would defeat the very driver-memory bound the fallback protects
    total_partial = partials.count()
    if total_partial == 0:
        return ds.map_batches(_empty_out, batch_format="pyarrow")
    if total_partial <= 32_000_000:
        blocks = [b for b in _ray.get(partials.to_arrow_refs()) if b.num_rows]
        # the model is BOUNDED (it broadcasts afterwards anyway), so
        # merge the per-batch partials driver-side: one lexsort +
        # reduceat over ≤32M rows replaces the groupby sort exchange
        # (12 s → ~4 s on the 600k-page bench). Above the cap — only
        # when the model itself approaches the broadcast limit — fall
        # back to the distributed exchange.
        mt = pa.concat_tables(blocks, promote_options="default").combine_chunks()
        ph_r = mt["ph"].to_numpy(zero_copy_only=False).view(np.uint64)
        h1_r = mt["h1"].to_numpy(zero_copy_only=False).view(np.uint64)
        n_r = mt["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.argsort(ph_r, kind="stable")
        ph_s, h1_s, n_s = ph_r[o], h1_r[o], n_r[o]
        first = np.r_[True, ph_s[1:] != ph_s[:-1]]
        idx = np.flatnonzero(first)
        ph_v = ph_s[idx]
        h1_v = h1_s[idx]
        cb_v = np.add.reduceat(n_s, idx)
        if prune:
            h2_v = mt["h2"].to_numpy(zero_copy_only=False).view(np.uint64)[o][idx]
    else:
        model = partial_group_agg(
            partials,
            keys=["ph", "h1"] + (["h2"] if prune else []),
            sum_cols=["n"],
            count_as=None,
            coalesce=16,
        )
        mt = pa.concat_tables(
            _ray.get(model.to_arrow_refs()), promote_options="default"
        ).combine_chunks()
        if not mt.num_rows:
            return ds.map_batches(_empty_out, batch_format="pyarrow")
        ph_v = mt["ph"].to_numpy(zero_copy_only=False).view(np.uint64)
        h1_v = mt["h1"].to_numpy(zero_copy_only=False).view(np.uint64)
        cb_v = mt["sum_n"].to_numpy(zero_copy_only=False).astype(np.int64)
        if prune:
            h2_v = mt["h2"].to_numpy(zero_copy_only=False).view(np.uint64)
    # prefix totals: cp(w1) = Σ cb over pairs sharing h1 (one lexsort)
    o1 = np.argsort(h1_v, kind="stable")
    h1_s, cb_s = h1_v[o1], cb_v[o1]
    starts = np.r_[True, h1_s[1:] != h1_s[:-1]]
    seg = np.cumsum(starts) - 1
    cp_per_seg = np.add.reduceat(cb_s, np.flatnonzero(starts))
    cp_back = np.empty_like(cb_v)
    cp_back[o1] = cp_per_seg[seg]
    ratio = cp_back // cb_v
    bits = (np.frexp(ratio.astype(np.float64))[1] - 1).astype(np.int64)
    if prune:
        # web-scale bound: broadcast only pairs with cb >= min_count;
        # pruned occurrences fall back to unigram bits over the
        # vocab-bounded (h2 -> cu) table (order-0 backoff of p(w2|w1))
        T = int(cb_v.sum())
        o2 = np.argsort(h2_v, kind="stable")
        h2_s2, cb_s2 = h2_v[o2], cb_v[o2]
        starts2 = np.r_[True, h2_s2[1:] != h2_s2[:-1]]
        h2_u = h2_s2[starts2]
        cu_u = np.add.reduceat(cb_s2, np.flatnonzero(starts2))
        fb_bits = (np.frexp((T // cu_u).astype(np.float64))[1] - 1).astype(np.int64)
        keep = cb_v >= int(min_count)
        ph_v, bits = ph_v[keep], bits[keep]
    else:
        h2_u = fb_bits = None
    order = np.argsort(ph_v)
    state = _ray.put((ph_v[order], bits[order], h2_u, fb_bits))

    def _score(batch: pa.Table) -> pa.Table:
        ph_s, bits_s, h2_s, fb_s = _ray.get(state)
        ph, _, u2, prow = _pairs(batch)
        if len(ph) == 0:
            return _empty_out(batch)
        if h2_s is None:
            b = bits_s[np.searchsorted(ph_s, ph)]
        else:
            pos = np.searchsorted(ph_s, ph)
            pos_c = np.minimum(pos, max(len(ph_s) - 1, 0))
            hit = (ph_s[pos_c] == ph) if len(ph_s) else np.zeros(len(ph), bool)
            b = np.where(
                hit,
                bits_s[pos_c] if len(ph_s) else 0,
                fb_s[np.searchsorted(h2_s, u2)],
            )
        n = batch.num_rows
        sums = np.bincount(prow, weights=b.astype(np.float64), minlength=n)
        cnts = np.bincount(prow, minlength=n)
        nz = cnts > 0
        ids = batch[id_col].combine_chunks().cast(pa.int64())
        return pa.table(
            {
                id_col: ids.filter(pa.array(nz)),
                "bigram_bits": pa.array(sums[nz].astype(np.int64), pa.int64()),
                "n_pairs": pa.array(cnts[nz].astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(_score, batch_format="pyarrow")


def page_meta(
    ds,
    id_col: str = "doc_id",
    html_col: str = "html",
):
    """Page-level HTML metadata for crawl filtering: the <title> text
    (split-device contract — the run between the first ``<title>`` and
    the next ``</title>``, '' when absent; sentinel-append guarantees
    the element exists, ≡ SQL ``str_split(html ‖ '</title>', …)``) and
    the robots-meta exclusion flags ``has_noindex`` / ``has_nofollow``
    (RE2 ``<meta[^>]*noindex`` — the standard crawl-politeness gate;
    literal-lowercase contract documented, normalize upstream for
    shouting-case html). Pure map, ZERO shuffle, one row per page."""

    def _meta(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "title": pa.array([], pa.string()),
                "has_noindex": pa.array([], pa.int64()),
                "has_nofollow": pa.array([], pa.int64()),
            }
        )
        if not batch.num_rows:
            return empty
        h = batch[html_col]
        if isinstance(h, pa.ChunkedArray):
            h = h.combine_chunks()
        if pa.types.is_binary(h.type) or pa.types.is_large_binary(h.type):
            h = h.cast(pa.string() if pa.types.is_binary(h.type) else pa.large_string())
        h = pc.fill_null(h, "").cast(pa.string())
        # FULL splits (not max_splits) so every element position means
        # the same thing as DuckDB str_split's 1-based indexing — the
        # anchor-text parity rule
        after = pc.list_element(
            pc.split_pattern(
                pc.binary_join_element_wise(h, pa.scalar("<title>"), ""),
                "<title>",
            ),
            1,
        )
        title = pc.list_element(
            pc.split_pattern(
                pc.binary_join_element_wise(after, pa.scalar("</title>"), ""),
                "</title>",
            ),
            0,
        )
        noindex = pc.match_substring_regex(h, r"<meta[^>]*noindex")
        nofollow = pc.match_substring_regex(h, r"<meta[^>]*nofollow")
        return pa.table(
            {
                id_col: batch[id_col].combine_chunks().cast(pa.int64()),
                "title": title.cast(pa.string()),
                "has_noindex": noindex.cast(pa.int64()),
                "has_nofollow": nofollow.cast(pa.int64()),
            }
        )

    return ds.map_batches(_meta, batch_format="pyarrow")


def word_blocklist_filter(
    ds,
    words,
    max_hits: int,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Map-side corpus gate on dirty-word DENSITY: keep rows with
    FEWER than ``max_hits`` blocklist tokens (C4's any-hit rule is
    ``max_hits=1``; larger values express a density threshold). Same
    kernel as :func:`word_blocklist_counts` but applied as an inline
    predicate — the corpus streams through with ALL its columns and
    ZERO shuffle, instead of paying an id re-join against the flagged
    set."""
    words = sorted({w.lower() for w in words})
    word_set = pa.array(words, pa.string())

    def _gate(batch: pa.Table) -> pa.Table:
        if not batch.num_rows:
            return batch
        toks, row, _ = _tokenize_with_positions(batch, id_col, text_col)
        n = batch.num_rows
        if len(row) == 0:
            return batch
        hit = pc.is_in(pc.utf8_lower(toks), value_set=word_set).to_numpy(
            zero_copy_only=False
        )
        cnt = np.bincount(row[hit], minlength=n).astype(np.int64)
        return batch.filter(pa.array(cnt < max_hits))

    return ds.map_batches(_gate, batch_format="pyarrow")


def compression_ratio(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
):
    """Per-document zlib compression ratio in integer ppm — the
    RedPajama-v2 / Gopher-family repetitiveness signal (highly
    compressible text ⇒ boilerplate / template spam; ratio_ppm =
    compressed_bytes · 10^6 // raw_bytes, so LOW values are the
    suspicious ones). Deterministic for a fixed zlib level ⇒
    parallelism/resume-invariant, but NOT SQL-expressible (no codec in
    the oracle) — pinned by pytest against direct zlib calls.

    Scale shape: pure map, ZERO shuffle; the per-row zlib call IS the
    work (a codec, like the multimodal decode stages — not a
    vectorizable kernel), runs at C speed on utf-8 bytes. Empty/null
    docs report ratio_ppm = 0 with raw_bytes = 0."""
    import zlib

    def _ratio(batch: pa.Table) -> pa.Table:
        t = batch[text_col]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        t = pc.fill_null(t.cast(pa.string()), "")
        raw = pc.binary_length(t).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        comp = np.zeros(batch.num_rows, dtype=np.int64)
        # the Arrow string buffer already IS the utf-8 bytes zlib
        # wants: a zero-copy binary view avoids the str decode +
        # re-encode round-trip per row
        for i, b in enumerate(t.cast(pa.binary()).to_pylist()):
            if b:
                comp[i] = len(zlib.compress(b, level))
        ratio = np.zeros(batch.num_rows, dtype=np.int64)
        nz = raw > 0
        ratio[nz] = (comp[nz] * 1_000_000) // raw[nz]
        return pa.table(
            {
                id_col: batch[id_col].combine_chunks().cast(pa.int64()),
                "raw_bytes": pa.array(raw, pa.int64()),
                "compressed_bytes": pa.array(comp, pa.int64()),
                "ratio_ppm": pa.array(ratio, pa.int64()),
            }
        )

    return ds.map_batches(_ratio, batch_format="pyarrow")


def _keyness_scores(
    n: np.ndarray, nt: np.ndarray, tl: np.ndarray, grand: int, smoothing: int
) -> np.ndarray:
    """keyness_ppm = (n·(grand−tl)·10^6) // ((nt−n+s)·tl), exact: the
    int64 fast path hands off to Python bignums when the numerator
    could overflow (web-scale token totals) — the SQL mirror computes
    in HUGEINT, so both paths are the same exact integers."""
    if not len(n):
        return np.array([], dtype=np.int64)
    rest = grand - tl
    num_max = int(n.max()) * int(rest.max() if len(rest) else 0) * 10**6
    den_max = int((nt - n).max() + smoothing) * int(tl.max() if len(tl) else 0)
    if 0 <= num_max < 2**63 and 0 <= den_max < 2**63:
        return (n * rest * 10**6) // ((nt - n + smoothing) * tl)
    return np.array(
        [
            (int(a) * (grand - int(c)) * 10**6)
            // ((int(b) - int(a) + smoothing) * int(c))
            for a, b, c in zip(n, nt, tl)
        ],
        dtype=np.int64,
    )


def lang_keyness(
    ds,
    text_col: str = "text",
    lang_col: str = "lang",
    k: int = 20,
    smoothing: int = 1,
    batch_size: int = 32768,
    n_buckets: int = 64,
):
    """Per-group distinctive terms by integer keyness ratio — the
    corpus-linguistics "keywords of group G vs the rest" signal (the
    group-level complement of per-doc tf·idf): for token w in lang L,

        keyness_ppm = (n_Lw · (T − T_L) · 10^6) // ((n_w − n_Lw + s) · T_L)

    i.e. rate-in-L vs rate-in-REST with additive smoothing ``s`` on the
    rest count — every operand an exact integer (HUGEINT-mirrored in
    SQL), so ties and order are engine-independent.

    Scale shape: ONE corpus pass builds the (lang, w) count table
    (per-batch Zipf-collapsed partials → bucketed exact merge); token
    and lang totals REDUCE from that vocab-bounded table, never from
    the corpus; totals broadcast once via ray.put (tf·idf's df-map
    doctrine — sorted token array + counts, np.searchsorted per batch);
    scoring is a stateless map over the vocab-bounded table; the final
    cut is top_rows_by's associative per-lang top-k. Driver holds
    vocab-bounded arrays, never documents. Python-int scoring kicks in
    per batch only when int64 could overflow (web-scale totals), still
    over vocab-bounded rows.

    Returns (lang, w, n, keyness_ppm), top ``k`` per lang by
    (keyness_ppm desc, w asc).
    """
    import ray as _ray

    from rio_cogeo_ray.stages.agg import partial_group_agg, top_rows_by

    def _counts(t: pa.Table) -> pa.Table:
        lists = pc.ascii_split_whitespace(
            t[text_col].combine_chunks().cast(pa.string())
        )
        lens = np.diff(lists.offsets.to_numpy(zero_copy_only=False))
        lang = t[lang_col].combine_chunks().cast(pa.string())
        rep = pa.array(
            np.repeat(np.arange(len(t), dtype=np.int64), lens), pa.int64()
        )
        toks = lists.flatten()
        keep = pc.not_equal(toks, "")
        pair = pa.table(
            {"lang": lang.take(rep.filter(keep)), "w": toks.filter(keep)}
        )
        aggd = pair.group_by(["lang", "w"]).aggregate([([], "count_all")])
        return aggd.rename_columns(["lang", "w", "n"])

    lt = partial_group_agg(
        ds.map_batches(_counts, batch_format="pyarrow", batch_size=batch_size),
        keys=["lang", "w"],
        sum_cols=["n"],
        count_as=None,
        n_buckets=n_buckets,
    ).map_batches(
        lambda t: t.rename_columns(["lang", "w", "n"]), batch_format="pyarrow"
    )
    # Reuse the merged (lang, w) table for BOTH total reductions and the
    # scoring pass - multi-consumer, so materialize the vocab-bounded stage.
    lt = lt.materialize()

    tt_blocks = [
        b
        for b in _ray.get(
            partial_group_agg(
                lt, keys=["w"], sum_cols=["n"], count_as=None, n_buckets=n_buckets
            ).to_arrow_refs()
        )
        if b.num_rows
    ]
    if not tt_blocks:
        return pa.schema(
            [
                ("lang", pa.string()),
                ("w", pa.string()),
                ("n", pa.int64()),
                ("keyness_ppm", pa.int64()),
            ]
        ).empty_table()
    tt = (
        pa.concat_tables(tt_blocks).combine_chunks().sort_by([("w", "ascending")])
    )
    tok_sorted = tt["w"].combine_chunks().to_numpy(zero_copy_only=False)
    tok_counts = tt["sum_n"].to_numpy(zero_copy_only=False).astype(np.int64)
    lang_tot: dict = {}
    for b in _ray.get(
        partial_group_agg(
            lt, keys=["lang"], sum_cols=["n"], count_as=None, n_buckets=8
        ).to_arrow_refs()
    ):
        for la, n in zip(b["lang"].to_pylist(), b["sum_n"].to_pylist()):
            lang_tot[la] = lang_tot.get(la, 0) + int(n)
    grand = sum(lang_tot.values())
    tok_ref = _ray.put((tok_sorted, tok_counts))

    def _score(t: pa.Table) -> pa.Table:
        toks_b, counts_b = _ray.get(tok_ref)
        w = t["w"].combine_chunks()
        n = t["n"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        # vocab-bounded binary search against the broadcast total table
        idx = np.searchsorted(toks_b, w.to_numpy(zero_copy_only=False).astype(object))
        nt = counts_b[idx]
        langs = t["lang"].to_pylist()
        tl = np.array([lang_tot[la] for la in langs], dtype=np.int64)
        score = _keyness_scores(n, nt, tl, grand, smoothing)
        return pa.table(
            {
                "lang": t["lang"],
                "w": w,
                "n": pa.array(n, pa.int64()),
                "keyness_ppm": pa.array(score, pa.int64()),
            }
        )

    scored = lt.map_batches(_score, batch_format="pyarrow")
    return top_rows_by(
        scored,
        keys=["lang"],
        order_by=[("keyness_ppm", "descending"), ("w", "ascending")],
        k=k,
        n_buckets=8,
    )


def vocab_jaccard(
    ds,
    text_col: str = "text",
    group_col: str = "lang",
    max_groups: int = 16,
    n_buckets: int = 64,
):
    """EXACT pairwise vocabulary Jaccard between groups — the exact
    small-group counterpart of the KMV/theta sketch (sketch.py:
    kmv_overlap estimates the same numbers when groups outgrow this
    op's bitmask): for groups A, B over their distinct token sets,
    ``jaccard_ppm = 10^6·|A∩B| // (|A|+|B|−|A∩B|)``.

    Scale shape: ONE corpus pass builds the distinct (group, w) table
    (per-batch distinct collapse → bucketed exact merge); each token
    then reduces to ONE int64 bitmask row (each distinct (group, w)
    appears exactly once post-merge, so SUM of per-group bits == OR);
    the mask HISTOGRAM (≤ 2^groups rows, hence ``max_groups``) is the
    only thing the driver sees — pair algebra over it is O(4^groups)
    worst case, corpus-independent. Groups beyond ``max_groups`` must
    use kmv_overlap; this op raises rather than degrade.

    Null group values never pair (mirrors SQL ``a.g < b.g``); pairs
    with an empty intersection are omitted (inner-join mirror).
    Returns (group_a, group_b, inter, jaccard_ppm), group_a < group_b.
    """
    import ray as _ray

    from rio_cogeo_ray.stages.agg import partial_group_agg

    out_schema = pa.schema(
        [
            ("group_a", pa.string()),
            ("group_b", pa.string()),
            ("inter", pa.int64()),
            ("jaccard_ppm", pa.int64()),
        ]
    )

    def _distinct(t: pa.Table) -> pa.Table:
        lists = pc.ascii_split_whitespace(
            t[text_col].combine_chunks().cast(pa.string())
        )
        lens = np.diff(lists.offsets.to_numpy(zero_copy_only=False))
        g = t[group_col].combine_chunks().cast(pa.string())
        rep = pa.array(
            np.repeat(np.arange(len(t), dtype=np.int64), lens), pa.int64()
        )
        toks = lists.flatten()
        keep = pc.not_equal(toks, "")
        pair = pa.table({"g": g.take(rep.filter(keep)), "w": toks.filter(keep)})
        pair = pair.filter(pc.is_valid(pair["g"]))
        return pair.group_by(["g", "w"]).aggregate([])

    dist = partial_group_agg(
        ds.map_batches(_distinct, batch_format="pyarrow"),
        keys=["g", "w"],
        count_as=None,
        n_buckets=n_buckets,
    ).materialize()

    groups: set = set()
    for b in _ray.get(
        partial_group_agg(dist, keys=["g"], count_as=None, n_buckets=4).to_arrow_refs()
    ):
        if not b.num_rows or "g" not in b.column_names:
            continue  # schema-less empty block (zero-row input)
        groups.update(x for x in b["g"].to_pylist() if x is not None)
    groups = sorted(groups)
    if not groups:
        return out_schema.empty_table()
    if len(groups) > max_groups:
        raise ValueError(
            f"vocab_jaccard: {len(groups)} groups > max_groups={max_groups}; "
            "the mask histogram would not stay driver-bounded - use "
            "sketch.kmv_overlap for wide group domains"
        )
    bit_of = {g: 1 << i for i, g in enumerate(groups)}

    def _bits(t: pa.Table) -> pa.Table:
        if not t.num_rows or "g" not in t.column_names:
            return pa.table(
                {"w": pa.array([], pa.string()), "bit": pa.array([], pa.int64())}
            )
        bits = np.array([bit_of[g] for g in t["g"].to_pylist()], dtype=np.int64)
        return pa.table({"w": t["w"], "bit": pa.array(bits, pa.int64())})

    masks = partial_group_agg(
        dist.map_batches(_bits, batch_format="pyarrow"),
        keys=["w"],
        sum_cols=["bit"],
        count_as=None,
        n_buckets=n_buckets,
    )
    hist: dict = {}
    for b in _ray.get(
        partial_group_agg(
            masks.map_batches(
                lambda t: pa.table(
                    {"mask": t["sum_bit"]}
                    if "sum_bit" in t.column_names
                    else {"mask": pa.array([], pa.int64())}
                ),
                batch_format="pyarrow",
            ),
            keys=["mask"],
            count_as="cnt",
            n_buckets=4,
        ).to_arrow_refs()
    ):
        if not b.num_rows or "mask" not in b.column_names:
            continue
        for m, c in zip(b["mask"].to_pylist(), b["cnt"].to_pylist()):
            hist[int(m)] = hist.get(int(m), 0) + int(c)

    mk = np.array(list(hist.keys()), dtype=np.int64)
    ct = np.array(list(hist.values()), dtype=np.int64)
    has = [((mk >> i) & 1).astype(bool) for i in range(len(groups))]
    size = [int(ct[h].sum()) for h in has]
    rows = {"group_a": [], "group_b": [], "inter": [], "jaccard_ppm": []}
    for i in range(len(groups)):
        for j in range(i + 1, len(groups)):
            inter = int(ct[has[i] & has[j]].sum())
            if not inter:
                continue
            rows["group_a"].append(groups[i])
            rows["group_b"].append(groups[j])
            rows["inter"].append(inter)
            rows["jaccard_ppm"].append(
                (inter * 10**6) // (size[i] + size[j] - inter)
            )
    return pa.table(
        {
            "group_a": pa.array(rows["group_a"], pa.string()),
            "group_b": pa.array(rows["group_b"], pa.string()),
            "inter": pa.array(rows["inter"], pa.int64()),
            "jaccard_ppm": pa.array(rows["jaccard_ppm"], pa.int64()),
        }
    )


def doc_novelty(
    ds,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
):
    """First-occurrence novelty score — the dataset-curation audit
    "how much NEW text does each document add?": per doc, the fraction
    of its distinct word ``n``-grams whose FIRST owner (min doc id over
    the whole corpus) is the doc itself, in exact integer ppm. Crawl
    snapshots full of syndicated/boilerplate text score low; original
    content scores high (the additive complement of cross_doc_ngrams'
    shared-span count).

    Scale shape — two LINEAR shuffles, cross_doc_ngrams' doctrine:

    1. map: per-doc DISTINCT gram hashes (128-bit rolling token-hash
       combinations, text never leaves the map stage).
    2. bucket by hash(g1): all postings of a gram land in one bucket,
       so the bucket-local ``min(doc)`` per gram IS the global owner.
       ONE pass emits BOTH per-doc partials: novel (grams this doc
       owns) and total (distinct grams seen) — rows ∝ docs per bucket.
    3. one partial→final sum per doc finalizes ``novelty_ppm =
       novel·10^6 // n_grams``.

    Docs with fewer than ``n`` tokens have no grams and no output row
    (the SQL mirror's inner gram derivation drops them identically).
    Same 2×64-bit collision contract as decontam/dup-span grams.
    Returns (id, novel, n_grams, novelty_ppm).
    """
    from rio_cogeo_ray.functions.hashing import splitmix64
    from rio_cogeo_ray.stages.agg import partial_group_agg

    rows = ds.map_batches(
        lambda t: _doc_ngram_hashes(t, n, id_col, text_col),
        batch_format="pyarrow",
        batch_size=8192,
    )

    def _route(t: pa.Table) -> pa.Table:
        b = (
            splitmix64(
                t["g1"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.uint64)
            )
            % np.uint64(n_buckets)
        ).astype(np.int64)
        return t.append_column("__bucket", pa.array(b, pa.int64()))

    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "novel_partial": pa.array([], pa.int64()),
            "total_partial": pa.array([], pa.int64()),
        }
    )

    def _bucket(g: pa.Table) -> pa.Table:
        if not g.num_rows:
            return empty
        g1 = g["g1"].combine_chunks().to_numpy(zero_copy_only=False)
        g2 = g["g2"].combine_chunks().to_numpy(zero_copy_only=False)
        doc = g[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        # sort doc WITHIN gram runs so each run's first row is its owner
        order = np.lexsort((doc, g2, g1))
        g1s, g2s, docs_ = g1[order], g2[order], doc[order]
        start = np.r_[True, (g1s[1:] != g1s[:-1]) | (g2s[1:] != g2s[:-1])]
        owners = docs_[start]
        nov_doc, nov_cnt = np.unique(owners, return_counts=True)
        tot_doc, tot_cnt = np.unique(docs_, return_counts=True)
        return pa.table(
            {
                id_col: pa.array(np.r_[nov_doc, tot_doc], pa.int64()),
                "novel_partial": pa.array(
                    np.r_[nov_cnt, np.zeros(len(tot_doc), dtype=np.int64)].astype(
                        np.int64
                    ),
                    pa.int64(),
                ),
                "total_partial": pa.array(
                    np.r_[np.zeros(len(nov_doc), dtype=np.int64), tot_cnt].astype(
                        np.int64
                    ),
                    pa.int64(),
                ),
            }
        )

    partials = (
        rows.map_batches(_route, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(
            lambda g: _bucket(g.drop_columns(["__bucket"])), batch_format="pyarrow"
        )
    )
    summed = partial_group_agg(
        partials,
        keys=[id_col],
        sum_cols=["novel_partial", "total_partial"],
        count_as=None,
    )

    def _final(t: pa.Table) -> pa.Table:
        novel = t["sum_novel_partial"].combine_chunks().to_numpy(zero_copy_only=False)
        tot = t["sum_total_partial"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: t[id_col].combine_chunks(),
                "novel": pa.array(novel, pa.int64()),
                "n_grams": pa.array(tot, pa.int64()),
                "novelty_ppm": pa.array(novel * 1_000_000 // tot, pa.int64()),
            }
        )

    return summed.map_batches(_final, batch_format="pyarrow")


def type_token_ratio(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Per-doc lexical diversity: distinct whitespace tokens over total
    tokens in exact integer ppm (the type-token ratio — template spam
    and keyword-stuffed pages score LOW; the per-doc complement of the
    corpus-level vocab ops). Pure map, zero shuffle: one tokenize +
    one lexsort-by-(doc, h1, h2) first-occurrence count per batch;
    token identity is the repo's 2×64-bit hash contract (same as the
    gram kernels). Zero-token docs emit NULL ttr (SQL division mirror).
    Returns (id, n_tokens, n_types, ttr_ppm)."""
    import polars as pl

    from rio_cogeo_ray.functions.hashing import splitmix64

    ids = batch[id_col].combine_chunks().cast(pa.int64())
    t = pc.fill_null(batch[text_col].combine_chunks().cast(pa.string()), "")
    lists = pc.ascii_split_whitespace(t)
    lens = np.diff(lists.offsets.to_numpy(zero_copy_only=False))
    flat = lists.flatten()
    rep = np.repeat(np.arange(len(batch), dtype=np.int64), lens)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    toks = flat.filter(pa.array(keep))
    rep = rep[keep]
    n_tok = np.bincount(rep, minlength=len(batch)).astype(np.int64)
    if len(rep):
        h1 = pl.from_arrow(toks.cast(pa.large_string())).hash(seed=101).to_numpy().astype(np.uint64)
        h2 = splitmix64(h1 ^ np.uint64(0xD1B54A32D192ED03))
        order = np.lexsort((h2, h1, rep))
        rs, h1s, h2s = rep[order], h1[order], h2[order]
        first = np.r_[
            True,
            (rs[1:] != rs[:-1]) | (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1]),
        ]
        n_typ = np.bincount(rs[first], minlength=len(batch)).astype(np.int64)
    else:
        n_typ = np.zeros(len(batch), dtype=np.int64)
    ttr = pa.array(
        np.where(n_tok > 0, n_typ * 1_000_000 // np.maximum(n_tok, 1), 0),
        pa.int64(),
    )
    ttr = pc.if_else(pa.array(n_tok > 0), ttr, pa.scalar(None, pa.int64()))
    return pa.table(
        {
            id_col: ids,
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_types": pa.array(n_typ, pa.int64()),
            "ttr_ppm": ttr,
        }
    )
