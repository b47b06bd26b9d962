"""Vectorized JSON field extraction over string columns.

Web-event logs carry semi-structured side data (the `events.props`
column here: flat JSON objects like ``{"k": 87}``); pipelines need a
scalar extractor that runs as an Arrow kernel, never a per-row
``json.loads``. For FLAT objects with scalar values, one anchored RE2
``extract_regex`` pass is exact: the pattern matches the quoted key
followed by a scalar token, which cannot be confused by nesting when
none exists.

Scope contract (documented, enforced by the pattern): flat objects,
string keys without regex metacharacters beyond what we escape, scalar
int/float/string values. Nested objects/arrays need a real parser —
out of scope for the hot path (the oracle mirrors with DuckDB's native
``->>`` JSON operator, so any divergence from real JSON semantics
would fail the hash check).
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc


def _key_pattern(key: str, value_pat: str) -> str:
    return '"' + re.escape(key) + r'"\s*:\s*(?P<v>' + value_pat + ")"


def extract_int(arr: pa.Array, key: str) -> pa.Array:
    """int64 value of ``key`` in a flat-JSON string column; null where
    the key is absent, the value is not an integer, or the row is
    null. One RE2 pass, no per-row Python."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    ex = pc.extract_regex(
        arr.cast(pa.string()), _key_pattern(key, r"-?\d+")
    )
    # struct_field (not .field): propagates the no-match struct nulls
    return pc.cast(pc.struct_field(ex, "v"), pa.int64())


def extract_str(arr: pa.Array, key: str) -> pa.Array:
    """String value of ``key`` (no escape handling — flat contract);
    null where absent."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    ex = pc.extract_regex(
        arr.cast(pa.string()), _key_pattern(key, r'"[^"]*"')
    )
    return pc.utf8_trim(pc.struct_field(ex, "v"), '"')
