"""Deterministic HTML → text extraction (vectorized, Arrow-native).

The input contract (BASELINE.json input_hint) pins a per-row invariant:
byte-identical extracted ``text`` per ``url``. This module defines THE
extractor; the fixture generator calls the same function when it writes
the ``text`` column, and tests re-verify ``extract_text(html) == text``
for every row of every table the engine touches.

The whole transform is pyarrow.compute (RE2) kernels — no per-row Python
— so it runs at full speed inside ``map_batches(batch_format="pyarrow")``.

Extraction semantics (fixed, documented, order matters):

1. decode utf-8,
2. drop ``<script>…</script>`` and ``<style>…</style>`` blocks,
3. replace every remaining tag ``<…>`` with a newline,
4. unescape the five basic entities (&amp; &lt; &gt; &quot; &#39;),
5. collapse whitespace runs around newlines, strip leading/trailing
   whitespace, drop empty lines, join with a single ``\n``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def extract_text(html: pa.Array) -> pa.Array:
    """binary/string array of HTML → string array of extracted text."""
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    s = html
    if pa.types.is_binary(s.type) or pa.types.is_large_binary(s.type):
        s = s.cast(pa.string())
    # 2. script/style blocks (non-greedy, case-sensitive: the corpus
    # contract is lowercase tags).
    s = pc.replace_substring_regex(s, r"<script[^>]*>.*?</script>", "")
    s = pc.replace_substring_regex(s, r"<style[^>]*>.*?</style>", "")
    # 3. tags → newline
    s = pc.replace_substring_regex(s, r"<[^>]*>", "\n")
    # 4. entities (amp LAST so &amp;lt; decodes to &lt; not <)
    s = pc.replace_substring(s, "&lt;", "<")
    s = pc.replace_substring(s, "&gt;", ">")
    s = pc.replace_substring(s, "&quot;", '"')
    s = pc.replace_substring(s, "&#39;", "'")
    s = pc.replace_substring(s, "&amp;", "&")
    # 5. line normalize: strip around newlines, collapse newline runs,
    # trim ends, drop empties.
    s = pc.replace_substring_regex(s, r"[ \t\r]*\n[ \t\r\n]*", "\n")
    s = pc.replace_substring_regex(s, r"^[ \t\r\n]+|[ \t\r\n]+$", "")
    return s
