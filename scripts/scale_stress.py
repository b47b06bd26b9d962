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

    out = {"pages": N_PAGES, "num_cpus": NUM_CPUS, "stages": {}}
    for name, fn in (("web_prep", run_web_prep),
                     ("corpus_to_shards", run_corpus_to_shards)):
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
