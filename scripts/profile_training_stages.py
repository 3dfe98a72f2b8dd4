#!/usr/bin/env python
"""One-off stage decomposition of training_pipeline at 1x4 vs 4x4 —
locates the non-scaling segment (not part of the graded bench)."""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
N_DOCS = int(os.environ.get("TRAIN_SCALE_DOCS", "240000"))
MODE = os.environ.get("TRAIN_SCALE_MODE", "strong")


def profile_level(n_executors: int, n_docs: int) -> dict:
    corpus = os.path.join(REPO, ".bench", f"training_docs_{n_docs}")
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from pcrawler_spark.operators.concomp import connected_components
    from pcrawler_spark.operators.simdedup import minhash_lsh_star_edges
    from pcrawler_spark.operators.textstats import (
        fingerprint, lang_id, quality_score, token_count)
    from pcrawler_spark.session import get_spark

    shuffle = max(32, n_docs // 15_000)
    spark = get_spark(
        app_name=f"train_profile_{n_executors}x4",
        master=f"local-cluster[{n_executors},4,6144]",
        shuffle_partitions=shuffle,
        extra_conf={
            "spark.locality.wait": "0",
            "spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(256 * 1024),
            "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
        },
    )
    out = {}
    try:
        docs = spark.read.parquet(corpus)
        # warm-up
        docs.limit(1000).count()
        ann = token_count(lang_id(quality_score(
            fingerprint(docs, "text"), "text"), "text"), "text")
        passed = ann.filter(F.col("quality_ppm") >= 0)
        others = [c for c in passed.columns if c != "fp"]
        kept = (
            passed.groupBy("fp")
            .agg(F.min_by(F.struct(*others), F.col("doc_id")).alias("_r"))
            .select(*(F.col("fp") if c == "fp" else F.col(f"_r.{c}")
                      for c in passed.columns))
        )
        kept = kept.persist(StorageLevel.MEMORY_AND_DISK)
        t0 = time.time()
        n_kept = kept.count()
        out["t_gate_dedup_persist"] = round(time.time() - t0, 2)
        out["n_kept"] = n_kept

        pairs = minhash_lsh_star_edges(
            kept.select(F.col("doc_id"), F.col("text")),
            n_hashes=8, band_rows=2,
        ).persist(StorageLevel.MEMORY_AND_DISK)
        t0 = time.time()
        n_pairs = pairs.count()
        out["t_lsh_edges"] = round(time.time() - t0, 2)
        out["n_pairs"] = n_pairs

        t0 = time.time()
        comp = connected_components(pairs, src="doc_a", dst="doc_b")
        comp = comp.persist(StorageLevel.MEMORY_AND_DISK)
        n_comp = comp.count()
        out["t_cc"] = round(time.time() - t0, 2)
        out["n_comp"] = n_comp

        t0 = time.time()
        noncanon = comp.filter(F.col("id") != F.col("component")).select(
            F.col("id").alias("doc_id"))
        n_final = kept.join(noncanon, "doc_id", "left_anti").count()
        out["t_anti_count"] = round(time.time() - t0, 2)
        out["n_final"] = n_final
    finally:
        spark.stop()
    return out


def main() -> None:
    # weak (Gustafson) mode: the lo level carries a quarter corpus — the
    # decomposition then shows which stage's wall FAILS to stay flat when
    # 4x the cluster carries 4x the docs
    lo_docs = N_DOCS // 4 if MODE == "weak" else N_DOCS
    for level, nd in ((1, lo_docs), (4, N_DOCS), (1, lo_docs), (4, N_DOCS)):
        r = profile_level(level, nd)
        r["level"] = f"{level}x4"
        r["n_docs"] = nd
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
