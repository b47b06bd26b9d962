"""Trainable byte-pair-encoding tokenizer as a Ray-Data two-phase
operator: distributed word-frequency reduction → driver-side merge
learning over the BOUNDED frequency table → actor-pool encode.

Algorithm: Sennrich, Haddow & Birch 2016 ("Neural Machine Translation
of Rare Words with Subword Units" — the public BPE-for-subwords
recipe): start from characters (plus an end-of-word marker), then
repeatedly merge the most frequent adjacent symbol pair. Merge order
IS the vocabulary; encoding replays merges by rank.

Scale contract (100 TB): the only corpus-size-proportional work is the
word-frequency aggregation — the same partial value_counts → bucketed
merge path as text.token_topk (one shuffle whose volume is distinct
words per batch, Zipf-collapsed before the network). Training itself
runs on the top-``max_words`` rows of that table (driver-side, bounded,
independent of corpus size — standard practice: the frequency table's
head carries virtually all pair mass). Encoding is an actor-pool map
stage: the merge table ships once per actor via the class constructor,
and a per-actor word→tokens cache exploits the same Zipf law (most
batch tokens are cache hits after warmup).

No SQL oracle is possible (iterative merge learning is not
SQL-expressible) ⇒ rows-only driver check; exactness is pinned in
pytest against an independent naive reimplementation
(tests/test_tokenizer.py).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_EOW = "</w>"


def word_frequencies(ds, text_col: str = "text", max_words: int = 10_000):
    """Distributed (word, freq) table, top ``max_words`` by (freq desc,
    word) — the bounded training input. One Zipf-collapsed shuffle."""
    from rio_cogeo_ray.stages.agg import partial_group_agg
    from rio_cogeo_ray.stages.text import token_value_counts

    partials = ds.map_batches(
        lambda t: token_value_counts(t, text_col), batch_format="pyarrow"
    )
    merged = partial_group_agg(partials, keys=["token"], sum_cols=["n"], count_as=None)
    merged = merged.map_batches(
        lambda t: t.rename_columns(["word", "freq"]), batch_format="pyarrow"
    )
    top = merged.sort(["freq", "word"], descending=[True, False]).limit(max_words)
    refs = top.to_arrow_refs()
    import ray

    tables = [t for t in (ray.get(r) for r in refs) if t.num_rows]
    if not tables:
        return []
    tbl = pa.concat_tables(tables)
    return list(zip(tbl["word"].to_pylist(), tbl["freq"].to_pylist()))


def train_bpe_merges(
    word_freqs: Sequence[Tuple[str, int]], n_merges: int
) -> List[Tuple[str, str]]:
    """Learn ``n_merges`` merges from a (word, freq) table. Driver-side
    over the bounded table; incremental pair-index updates (only words
    containing the merged pair are re-scanned per round, the fastBPE
    refinement of the published algorithm). Deterministic: best pair =
    max count, ties broken by the lexicographically smallest pair."""
    words: List[List[str]] = []
    freqs: List[int] = []
    for w, f in word_freqs:
        if not w:
            continue
        words.append(list(w) + [_EOW])
        freqs.append(int(f))

    pair_counts: Dict[Tuple[str, str], int] = {}
    pair_words: Dict[Tuple[str, str], set] = {}

    def _add_word_pairs(wi: int, sign: int) -> None:
        syms = words[wi]
        f = freqs[wi] * sign
        for a, b in zip(syms, syms[1:]):
            p = (a, b)
            pair_counts[p] = pair_counts.get(p, 0) + f
            if sign > 0:
                pair_words.setdefault(p, set()).add(wi)

    for wi in range(len(words)):
        _add_word_pairs(wi, +1)

    merges: List[Tuple[str, str]] = []
    for _ in range(n_merges):
        best: Tuple[str, str] | None = None
        best_n = 0
        for p, n in pair_counts.items():
            if n > best_n or (n == best_n and best is not None and p < best):
                best, best_n = p, n
        if best is None or best_n <= 0:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        for wi in sorted(pair_words.get(best, ())):
            syms = words[wi]
            if len(syms) < 2:
                continue
            _add_word_pairs(wi, -1)
            out: List[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = out
            _add_word_pairs(wi, +1)
        # fully consumed pairs drop out of the index
        pair_counts = {p: n for p, n in pair_counts.items() if n > 0}
    return merges


def encode_word(word: str, ranks: Dict[Tuple[str, str], int]) -> Tuple[str, ...]:
    """Encode ONE word by replaying merges in rank order (lowest rank
    first) until no adjacent pair is mergeable."""
    syms = list(word) + [_EOW]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return tuple(syms)


class BPEEncoder:
    """Actor-pool encode stage: merges table built into ranks ONCE per
    actor in ``__init__``; ``__call__`` tokenizes a batch and returns
    (id, n_tokens). Per-batch work: split → np.unique over the words →
    encode DISTINCT words only (per-actor cache persists across
    batches) → scatter counts back per doc."""

    def __init__(
        self,
        merges: Sequence[Tuple[str, str]],
        id_col: str = "doc_id",
        text_col: str = "text",
        keep_cols: Sequence[str] = (),
    ):
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        self.id_col = id_col
        self.text_col = text_col
        self.keep_cols = tuple(keep_cols)
        self._cache: Dict[str, int] = {}

    def _word_len(self, w: str) -> int:
        n = self._cache.get(w)
        if n is None:
            n = len(encode_word(w, self.ranks))
            self._cache[w] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        lists = pc.ascii_split_whitespace(
            batch[self.text_col].combine_chunks().cast(pa.string())
        )
        lens = np.diff(lists.offsets.to_numpy(zero_copy_only=False))
        flat = lists.flatten()
        # C++ hash-based distinct (first-appearance dictionary) — far
        # cheaper than a numpy string sort; Python touches DISTINCT
        # words only, and the per-actor cache absorbs those across
        # batches (Zipf ⇒ steady-state hit rate ≈ 1)
        enc = pc.dictionary_encode(flat)
        inv = enc.indices.to_numpy(zero_copy_only=False)
        uniq = enc.dictionary.to_pylist()
        per_uniq = np.fromiter(
            (self._word_len(w) if w else 0 for w in uniq),
            dtype=np.int64,
            count=len(uniq),
        )
        per_word = per_uniq[inv]
        doc_of = np.repeat(np.arange(len(batch), dtype=np.int64), lens)
        n_tok = np.bincount(doc_of, weights=per_word, minlength=len(batch)).astype(
            np.int64
        )
        cols = {self.id_col: batch[self.id_col].combine_chunks()}
        for c in self.keep_cols:
            cols[c] = batch[c].combine_chunks()
        cols["n_bpe_tokens"] = pa.array(n_tok, pa.int64())
        return pa.table(cols)


def bpe_token_counts(
    ds,
    merges: Sequence[Tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: Sequence[str] = (),
    concurrency: int = 4,
    batch_size: int = 4096,
):
    """Per-document BPE token counts with a trained merge table — the
    tokenizer-aware input to text.pack_counted."""
    return ds.map_batches(
        BPEEncoder,
        fn_constructor_kwargs={
            "merges": [tuple(m) for m in merges],
            "id_col": id_col,
            "text_col": text_col,
            "keep_cols": tuple(keep_cols),
        },
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )
