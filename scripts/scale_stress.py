"""One-order-up scale stress (VERDICT r3 item 8): run the two flagship
LLM chains at sf1 (6M pages, 10× the per-round bench corpus) and record
wall times plus object-store spill, proving the stage-boundary
materializations stay bounded.

- web_prep: Gopher-repetition gate → dirty-word density gate →
  corpus-wide segment dedup → unigram surprisal over the deduped
  stream (the bench_web_prep chain at 10× scale).
- corpus_to_shards: quality filter → exact dedup → bloom semi join →
  chunking → 90/5/5 split → seeded shuffle into 4 shards, over a
  documents-shaped projection of the same corpus.

Spill is read from Ray's memory summary (cumulative "Spilled N MiB");
results print as one JSON line and append to BENCH_LOCAL_sf1.json.

Usage: python scripts/scale_stress.py  [env: RCR_STRESS_PAGES=6000000,
RAY_GRAFT_CPUS=32]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PAGES = int(os.environ.get("RCR_STRESS_PAGES", "6000000"))
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
PAGES_DIR = f"/tmp/rcr_bench/pages_{N_PAGES}"
DOCS_DIR = f"/tmp/rcr_stress/docs_{N_PAGES}"


def ensure_corpora():
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray.data as rd

    from rio_cogeo_ray.sources.pages import synth_pages
    from rio_cogeo_ray.stages.sketch import _hash_col

    done = os.path.join(PAGES_DIR, ".done")
    if not os.path.exists(done):
        import shutil

        shutil.rmtree(PAGES_DIR, ignore_errors=True)
        synth_pages(N_PAGES).write_parquet(PAGES_DIR)
        with open(done, "w") as f:
            f.write("ok")
    ddone = os.path.join(DOCS_DIR, ".done")
    if not os.path.exists(ddone):
        import shutil

        shutil.rmtree(DOCS_DIR, ignore_errors=True)
        os.makedirs(os.path.join(DOCS_DIR, "documents.parquet"), exist_ok=True)

        def _to_doc(t: pa.Table) -> pa.Table:
            h = np.abs(_hash_col(t["url"]).astype(np.int64))
            txt = t["text"].combine_chunks().cast(pa.string())
            return pa.table(
                {
                    "doc_id": pa.array(h, pa.int64()),
                    "text": txt,
                    "lang": t["lang"].combine_chunks().cast(pa.string()),
                    "source": pa.array(["cc"] * len(t), pa.string()),
                    "n_chars": pc.cast(pc.utf8_length(txt), pa.int64()),
                }
            )

        rd.read_parquet(PAGES_DIR, columns=["url", "text", "lang"]).map_batches(
            _to_doc, batch_format="pyarrow"
        ).write_parquet(os.path.join(DOCS_DIR, "documents.parquet"))
        with open(ddone, "w") as f:
            f.write("ok")


def spilled_mib() -> int:
    """Cumulative object-store spill. The grpc-backed memory_summary is
    unavailable in this container, so read the raylet's own log (it
    prints cumulative "Spilled N MiB" lines) and fall back to sizing
    the session spill directory."""
    import glob

    best = 0
    for log in glob.glob("/tmp/ray/session_latest/logs/raylet.out"):
        try:
            with open(log, "rb") as f:
                f.seek(max(f.seek(0, 2) - 1_000_000, 0))
                tail = f.read().decode("utf-8", "replace")
            for m in re.finditer(r"Spilled (\d+) MiB", tail):
                best = max(best, int(m.group(1)))
        except OSError:
            pass
    if best:
        return best
    total = 0
    for d in glob.glob("/tmp/ray/session_latest/*spill*"):
        for root, _dirs, files in os.walk(d):
            for fn in files:
                try:
                    total += os.path.getsize(os.path.join(root, fn))
                except OSError:
                    pass
    return total // (1024 * 1024)


def run_web_prep() -> int:
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray.data as rd

    from rio_cogeo_ray.stages import text as text_mod
    from rio_cogeo_ray.stages.sketch import _hash_col

    def _pid(t: pa.Table) -> pa.Table:
        h = _hash_col(t["url"]).astype(np.int64)
        return pa.table(
            {
                "pid": pa.array(h, pa.int64()),
                "text": t["text"].combine_chunks().cast(pa.string()),
            }
        )

    docs = rd.read_parquet(PAGES_DIR, columns=["url", "text"]).map_batches(
        _pid, batch_format="pyarrow"
    )
    gated = text_mod.gopher_repetition(
        docs, id_col="pid", carry_cols=("text",)
    ).map_batches(
        lambda t: t.filter(
            pc.equal(t["repetition_ok"].combine_chunks(), 1)
        ).select(["pid", "text"]),
        batch_format="pyarrow",
    )
    surv = text_mod.word_blocklist_filter(
        gated, ("vikaripu", "kafade", "zaraze"), max_hits=3, id_col="pid"
    )
    seg = text_mod.segment_dedup(
        surv.materialize(), seg_words=10, id_col="pid"
    ).materialize()
    return text_mod.surprisal_score(
        seg, id_col="pid", text_col="text_clean", carry_cols=("n_kept",)
    ).count()


def run_corpus_to_shards() -> int:
    from rio_cogeo_ray.pipelines import queries as q

    return q.q_corpus_to_shards(DOCS_DIR).count()


JDOCS_DIR = f"/tmp/rcr_stress/jdocs_{N_PAGES}"


def ensure_jdocs():
    """Diversified corpus for the EXACT set-similarity stress: the
    synth_pages texts are template-generated, so their distinct token
    SETS collapse onto a handful of vocabularies and the TRUE Jaccard
    self-join output is quadratic in corpus size — that is the
    operator's answer, not an engine pathology, but it makes an unfit
    stress workload. Here every doc draws 30 tokens from a 200k-word
    hashed vocab (expected pairwise overlap ~0), and every 50th doc is
    a near-copy of its neighbour (one token changed) — planted pairs
    LINEAR in corpus size, so wall time measures the prefix-filter
    machinery, not an unbounded result set. Vocabulary is the Zipf-ish
    mixture the operator's DATA ASSUMPTION requires: 10 tokens/doc from
    a 5k common head (high df — never in a prefix) + 20 from a rare
    tail sized 20x the corpus (df ~ 1-2, so prefix candidate groups
    stay tiny); a uniform small vocab would make every prefix token
    frequent and candidate generation quadratic by design."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    done = os.path.join(JDOCS_DIR, ".done")
    if os.path.exists(done):
        return
    import shutil

    shutil.rmtree(JDOCS_DIR, ignore_errors=True)

    def _gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].combine_chunks().to_numpy(zero_copy_only=False)
        base = np.where(ids % 50 == 1, ids - 1, ids)  # near-copy partner
        k = np.arange(30, dtype=np.uint64)
        h = (base[:, None].astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
             + (k + 1) * np.uint64(0xBF58476D1CE4E5B9))
        h ^= h >> np.uint64(31)
        tail_v = np.uint64(20 * N_PAGES)
        w = np.where(
            k[None, :] < np.uint64(10),
            (h % np.uint64(5_000)).astype(np.int64),            # common head
            5_000 + (h % tail_v).astype(np.int64),               # rare tail
        )
        # the near-copy differs in exactly one RARE token (stays >= tau)
        w[:, 10] = np.where(
            ids % 50 == 1, 5_000 + ((w[:, 10] + 7) % int(tail_v)), w[:, 10]
        )
        texts = [" ".join(f"w{v}" for v in row) for row in w]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )

    rd.range(N_PAGES).map_batches(_gen, batch_format="pyarrow").write_parquet(
        JDOCS_DIR
    )
    with open(done, "w") as f:
        f.write("ok")


def run_jaccard_pairs() -> int:
    import ray.data as rd

    from rio_cogeo_ray.stages import simjoin

    ensure_jdocs()
    ds = rd.read_parquet(JDOCS_DIR, columns=["doc_id", "text"])
    return simjoin.jaccard_self_join(ds, tau_ppm=800_000).count()


def _bench_stage(name):
    """Reuse bench.py's pipeline verbatim at stress scale: bench reads
    RCR_BENCH_PAGES at import, which main() pins to N_PAGES before the
    first import, so bench.PAGES_DIR IS the stress corpus."""

    def run() -> int:
        import bench

        assert bench.N_PAGES == N_PAGES, (bench.N_PAGES, N_PAGES)
        return int(bench.BENCHES[name]() or 0)

    run.__name__ = f"run_{name}"
    return run


STAGES = {
    "web_prep": run_web_prep,
    "corpus_to_shards": run_corpus_to_shards,
    "jaccard_pairs": run_jaccard_pairs,
    "dup_span": _bench_stage("dup_span"),
    "bigram_surprisal": _bench_stage("bigram_surprisal"),
    "text_index": _bench_stage("text_index"),
    "bigram_lift": _bench_stage("bigram_lift"),
    "ccnet_buckets": _bench_stage("ccnet_buckets"),
    "gopher_filters": _bench_stage("gopher_filters"),
    "skew_salted": _bench_stage("skew_salted"),
}


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=NUM_CPUS, include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    ensure_corpora()

    os.environ["RCR_BENCH_PAGES"] = str(N_PAGES)  # before any bench import
    sel = [
        n.strip()
        for n in os.environ.get(
            "RCR_STRESS_STAGES", "web_prep,corpus_to_shards"
        ).split(",")
        if n.strip()
    ]
    if "jaccard_pairs" in sel:
        ensure_jdocs()  # corpus generation is setup, not timed work
    out = {"pages": N_PAGES, "num_cpus": NUM_CPUS, "stages": {}}
    for name in sel:
        fn = STAGES[name]
        s0 = spilled_mib()
        t0 = time.time()
        rows = fn()
        wall = round(time.time() - t0, 2)
        out["stages"][name] = {
            "rows": rows,
            "wall_s": wall,
            "pages_per_sec": round(N_PAGES / wall, 1),
            "spilled_mib_delta": spilled_mib() - s0,
        }
    print(json.dumps(out))
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_LOCAL_sf1.json",
    )
    hist = []
    if os.path.exists(path):
        with open(path) as f:
            hist = json.load(f)
    hist.append(out)
    with open(path, "w") as f:
        json.dump(hist, f, indent=1)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
