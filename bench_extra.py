#!/usr/bin/env python
"""Per-query isolation bench (round 7) — NOT the graded artifact.

bench.py is frozen for measurement; this harness exists for guide-§1
noop-sink isolation: it times individual `queries()` entries with the
noop sink (every column of every row computed, output discarded),
best-of-N to reject this host's documented 2-3x window drift, and can
dump `.explain("formatted")` to plans/r07/.

Usage:
  python bench_extra.py q53_pq_rerank_topk q61_repeated_spans   # time some
  python bench_extra.py --all                                   # time headline set
  python bench_extra.py --explain q53_pq_rerank_topk [suffix]   # dump plan

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS,
     BENCH_EXTRA_REPS (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("BENCH_EXTRA_REPS", "3"))

HEADLINE = [
    "q01_pricing_summary", "q03_join_topk_revenue", "q13_topk_per_group",
    "q17_explode_tokens", "q22_token_count_stats", "q26_ngram_jaccard",
    "q43_near_pair_family", "q29_knn_bruteforce", "q51_dedup_clusters",
    "q53_pq_rerank_topk", "q61_repeated_spans", "q62_token_budget_mix",
]


def main() -> None:
    from pcrawler_spark.session import get_spark
    import __spark_entry__ as entry_mod

    args = sys.argv[1:]
    explain = False
    if args and args[0] == "--explain":
        explain = True
        args = args[1:]
    names = HEADLINE if (not args or args[0] == "--all") else args

    spark = get_spark(app_name="bench_extra", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    queries = entry_mod.queries()

    if explain:
        name = names[0]
        suffix = names[1] if len(names) > 1 else "plan"
        os.makedirs(os.path.join(REPO, "plans", "r07"), exist_ok=True)
        df = queries[name](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        out = os.path.join(REPO, "plans", "r07", f"{name}_{suffix}.txt")
        with open(out, "w") as f:
            f.write(txt)
        print(out)
        spark.stop()
        return

    # warm-up (JVM, parquet footers)
    queries["q01_pricing_summary"](spark, SF_DIR).count()
    results = {}
    for name in names:
        walls = []
        for _ in range(REPS):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            queries[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite").save()
            walls.append(round(time.time() - t0, 3))
        results[name] = {"best": min(walls), "walls": walls}
        print(name, results[name], flush=True)
    print(json.dumps({n: r["best"] for n, r in results.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
