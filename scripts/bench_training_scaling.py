#!/usr/bin/env python
"""Two-parallelism-level scaling evidence for the TRAINING pipeline
(plans/training.py) — the second job measured under the north rule's
N-vs-4N criterion (the headline crawl pass is bench.py's job).

Same protocol as bench.py's crawl scaling: real executor JVMs via
local-cluster (1×4 vs 4×4), lo/hi sessions INTERLEAVED per round so both
levels sample the same host window, first run per session discarded as
warm-up, efficiency = median of per-round adjacent pair ratios.

Two modes (TRAIN_SCALE_MODE):

* ``strong`` (default): SAME corpus at both levels; efficiency =
  t_lo / (4 · t_hi).  Penalized by the pipeline's fixed serial floor
  (driver job scheduling, AQE stage barriers, the one-task CC finish)
  whenever the corpus is small enough that the floor is a visible
  fraction of the wall — the floor is constant per job, so strong-scaling
  efficiency RISES with corpus size toward the floor-free limit.
* ``weak`` (Gustafson scaled speedup): lo runs N/4 docs on 4 cores, hi
  runs N docs on 16 cores — 4× the cluster carries 4× the corpus;
  efficiency = t_lo / t_hi (1.0 = perfect).  This is the criterion that
  matches the 100 TB design point: cluster size is grown BECAUSE the
  data grew, and per-round work dominates the fixed floor.

The corpus is deterministic (generated DISTRIBUTED via mapInPandas —
doc text is a pure function of doc_id): ~55 tokens per doc, with planted
exact-duplicate groups (20%) and near-duplicate edits (20%) so every
stage (quality gate → lang ID → fp keep-min → MinHash-LSH → connected
components → canonical) does real work.  Prints ONE summary JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
N_DOCS = int(os.environ.get("TRAIN_SCALE_DOCS", "60000"))
MODE = os.environ.get("TRAIN_SCALE_MODE", "strong")

# the generator itself lives in the package so its mapInPandas closure is
# importable by executor workers from the shipped pyFiles zip — defined here
# it pickles by reference to this scripts/ module, which workers cannot
# import (the cold-cache failure recorded in BENCH_r06.json)
from pcrawler_spark.sources.trainingdocs import (  # noqa: E402,F401
    _doc_text, generate_training_docs)


def corpus_path(n_docs: int) -> str:
    return os.path.join(REPO, ".bench", f"training_docs_{n_docs}")


def ensure_corpus(spark, n_docs: int) -> str:
    path = corpus_path(n_docs)
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    generate_training_docs(spark, n_docs).write.mode("overwrite").parquet(path)
    return path


def run_level(n_executors: int, n_docs: int, runs: int = 2) -> tuple[list[float], int]:
    from pcrawler_spark.plans.training import training_pipeline
    from pcrawler_spark.session import get_spark

    # shuffle partitions sized by DATA, not cores: 4 partitions of a 480k-doc
    # LSH/groupBy shuffle OOM a 6 GB executor — the spill-aware rule is
    # partitions ≈ data/size-budget, identical at both levels (strong mode)
    # so the comparison measures executors, not partitioning
    shuffle = max(32, n_docs // 15_000)
    spark = get_spark(
        app_name=f"training_scaling_{n_executors}x4",
        master=f"local-cluster[{n_executors},4,6144]",
        shuffle_partitions=shuffle,
        extra_conf={
            "spark.locality.wait": "0",
            "spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(256 * 1024),
            # AQE's parallelismFirst coalesces post-shuffle partitions to
            # the level's CORE COUNT — at 1×4 the shingle explode lands in
            # ~5 partitions and OOMs the 6 GB heap, while 4×4 gets 16+ (an
            # asymmetric advantage).  Size by DATA instead, identically at
            # both levels.
            "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
        },
    )
    walls = []
    try:
        docs = spark.read.parquet(corpus_path(n_docs))
        # warm-up (workers import the zip, codegen JITs): quality gate only
        training_pipeline(docs, quality_min=0, near_dedup=False).count()
        for _ in range(runs):
            # GC debt from the previous pass otherwise leaks into this one
            # (bench.py's run_throughput: 2-3x wall variance without it)
            spark._jvm.System.gc()
            time.sleep(0.5)
            t0 = time.time()
            out = training_pipeline(docs, quality_min=0)
            n = out.count()
            walls.append(round(time.time() - t0, 3))
            # each pass persists its own gated-corpus copy; the pipeline
            # documents that callers own the cache lifetime
            out.training_persist_handle.unpersist()
        return walls, n
    finally:
        spark.stop()


def _raw_minhash_work(texts) -> int:
    """The pipeline's dominant kernel with NO Spark: 3-gram shingles, one
    md5 per shingle, 8 affine minhashes (operators/simdedup.py math,
    verbatim).  Pure-Python + hashlib — whatever efficiency THIS loses
    going 4→16 procs is the host's shared-memory/bandwidth ceiling for
    hash-and-string work, not engine overhead."""
    import hashlib

    P = 2147483647
    A = [((s + 1) * 2654435761) % P for s in range(8)]
    B = [(s * 40503 + 7) % P for s in range(8)]
    acc = 0
    for t in texts:
        words = t.split(" ")
        n = max(len(words) - 2, 1)
        mins = [P] * 8
        seen = set()
        for i in range(n):
            sh = " ".join(words[i:i + 3])
            if sh in seen:
                continue
            seen.add(sh)
            h0 = int(hashlib.md5(sh.encode()).hexdigest()[:8], 16) % P
            for s in range(8):
                v = (A[s] * h0 + B[s]) % P
                if v < mins[s]:
                    mins[s] = v
        acc += mins[0]
    return acc


def raw_control(texts, procs: int, reps: int = 2) -> float:
    import multiprocessing as mp

    k = procs * 8
    step = (len(texts) + k - 1) // k
    chunks = [texts[i:i + step] for i in range(0, len(texts), step)]
    walls = []
    for _ in range(reps):
        with mp.Pool(procs) as pool:
            t0 = time.time()
            sum(pool.map(_raw_minhash_work, chunks))
            walls.append(time.time() - t0)
    return min(walls)


def main() -> None:
    from pcrawler_spark.session import get_spark

    lo_docs = N_DOCS // 4 if MODE == "weak" else N_DOCS
    gen = get_spark(app_name="training_scaling_gen")
    ensure_corpus(gen, N_DOCS)
    if lo_docs != N_DOCS:
        ensure_corpus(gen, lo_docs)
    gen.stop()

    import pyarrow.parquet as pq

    hi_texts = pq.read_table(corpus_path(N_DOCS),
                             columns=["text"]).column("text").to_pylist()
    lo_texts = (hi_texts if lo_docs == N_DOCS else
                pq.read_table(corpus_path(lo_docs),
                              columns=["text"]).column("text").to_pylist())

    # raw control INTERLEAVED per round (the host ceiling drifts with the
    # same windows the engine samples): engine_vs_ceiling pairs each
    # round's engine ratio with the same round's raw ratio.  In weak mode
    # the lo control runs the lo (quarter) corpus — same data each proc
    # count carries as the engine comparison.
    denom = 4 if MODE == "strong" else 1
    rounds, raw_rounds = [], []
    lo_all, hi_all = [], []
    for _ in range(2):
        lo, n_lo = run_level(1, lo_docs)
        raw_lo = raw_control(lo_texts, 4)
        hi, n_hi = run_level(4, N_DOCS)
        raw_hi = raw_control(hi_texts, 16)
        lo_all += lo
        hi_all += hi
        rounds.append(round(min(lo) / (denom * min(hi)), 3))
        raw_rounds.append(round(raw_lo / (denom * raw_hi), 3))
    eff = sorted(rounds)[len(rounds) // 2]
    raw_eff = sorted(raw_rounds)[len(raw_rounds) // 2]
    print(json.dumps({
        "job": "training_pipeline (quality->langid->fp-dedup->LSH->CC->canonical)",
        "mode": MODE,
        "n_docs_hi": N_DOCS, "n_docs_lo": lo_docs,
        "n_canonical": n_hi,
        "lo_walls_s": lo_all, "hi_walls_s": hi_all,
        "lo_docs_per_sec": round(lo_docs / min(lo_all), 1),
        "hi_docs_per_sec": round(N_DOCS / min(hi_all), 1),
        "round_pair_efficiencies": rounds,
        "efficiency": eff,
        "raw_minhash_ceiling_rounds": raw_rounds,
        "raw_minhash_ceiling": raw_eff,
        "engine_vs_ceiling": round(eff / raw_eff, 3) if raw_eff else None,
        "engine_vs_ceiling_rounds": [
            round(e / r, 3) for e, r in zip(rounds, raw_rounds)
        ],
    }))


if __name__ == "__main__":
    main()
