"""BPE tokenizer (stages/tokenizer.py) vs an independent naive
reimplementation of the published algorithm (Sennrich et al. 2016) —
the pytest oracle standing in for the impossible SQL mirror."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from rio_cogeo_ray.stages import tokenizer

_EOW = "</w>"


# -- naive reference: recount every pair from scratch each round ------------


def _naive_train(word_freqs, n_merges):
    vocab = {w: (list(w) + [_EOW], int(f)) for w, f in word_freqs if w}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for syms, f in vocab.values():
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best_n = max(counts.values())
        if best_n <= 0:
            break
        best = min(p for p, n in counts.items() if n == best_n)
        merges.append(best)
        a, b = best
        for w, (syms, f) in list(vocab.items()):
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = (out, f)
    return merges


def _naive_encode(word, merges):
    syms = list(word) + [_EOW]
    for a, b in merges:  # replay every merge in training order
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


_CORPUS = [
    "the lowest lower low",
    "newest newer new news",
    "the newest widest wide",
    "low lower lowest newest the the the",
    "wide wider widest newer",
]


def test_train_matches_naive_reference():
    freqs = {}
    for line in _CORPUS:
        for w in line.split():
            freqs[w] = freqs.get(w, 0) + 1
    wf = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))
    got = tokenizer.train_bpe_merges(wf, 40)
    exp = _naive_train(wf, 40)
    assert got == exp
    assert ("s", "t") in got  # the -est suffix family must merge


def test_encode_matches_naive_replay():
    freqs = {}
    for line in _CORPUS:
        for w in line.split():
            freqs[w] = freqs.get(w, 0) + 1
    wf = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))
    merges = tokenizer.train_bpe_merges(wf, 25)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in list(freqs) + ["unseenword", "zzz", "a"]:
        got = list(tokenizer.encode_word(w, ranks))
        exp = _naive_encode(w, merges)
        assert got == exp, (w, got, exp)


def test_distributed_counts_match_and_deterministic(ray_session):
    """End-to-end: word_frequencies → train → actor-pool encode equals
    the driver-side naive pipeline, at two different partitionings."""
    rng = np.random.RandomState(11)
    base = ("the quick brown fox jumps over the lazy dog "
            "pack my box with five dozen liquor jugs").split()
    docs = [
        " ".join(rng.choice(base, rng.randint(3, 30))) for _ in range(300)
    ]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(300, dtype=np.int64)),
            "text": pa.array(docs, pa.string()),
        }
    )

    freqs = {}
    for d in docs:
        for w in d.split():
            freqs[w] = freqs.get(w, 0) + 1
    wf_exp = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))

    ds = rd.from_arrow(t).repartition(5)
    wf_got = tokenizer.word_frequencies(ds, "text", max_words=1000)
    assert wf_got == wf_exp

    merges = tokenizer.train_bpe_merges(wf_got, 60)
    out = {}
    for parts in (3, 8):
        got = (
            tokenizer.bpe_token_counts(
                rd.from_arrow(t).repartition(parts), merges, concurrency=2
            )
            .to_pandas()
            .set_index("doc_id")["n_bpe_tokens"]
        )
        out[parts] = got.sort_index()
    assert (out[3] == out[8]).all()

    exp = {
        i: sum(len(_naive_encode(w, merges)) for w in d.split())
        for i, d in enumerate(docs)
    }
    for i in range(300):
        assert out[3][i] == exp[i], i


def test_empty_and_degenerate_inputs(ray_session):
    assert tokenizer.train_bpe_merges([], 10) == []
    # single-char words still terminate (char + </w> merges once at most)
    m = tokenizer.train_bpe_merges([("a", 5)], 10)
    assert m == [("a", _EOW)]
    ranks = {p: i for i, p in enumerate(m)}
    assert tokenizer.encode_word("a", ranks) == ("a" + _EOW,)
