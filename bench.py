#!/usr/bin/env python
"""Benchmark harness: headline queries + crawl throughput + scaling evidence.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>,
   "urls_per_sec": ..., "scaling": {...}}

and writes BENCH.md with the scaling-efficiency table (the in-sandbox
evidence for the north_rule's N→4N executor criterion: the same fused
schedule+extract job at local[8] vs local[32] on identical input).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
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
SMALL_PAR = max(2, CPUS // 4)

# headline testdata queries (one per cost family: scan-agg, join, window,
# explode, text, shingle-join, minhash, knn)
BENCH_QUERIES = [
    "q01_pricing_summary",
    "q03_join_topk_revenue",
    "q13_topk_per_group",
    "q17_explode_tokens",
    "q22_token_count_stats",
    "q26_ngram_jaccard",
    "q27_minhash_lsh",
    "q29_knn_bruteforce",
]


def _sf_value(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.0


# bump when the synthetic generator changes — stale cached corpora otherwise
# silently survive (_SUCCESS marker says nothing about generator content)
_CORPUS_VERSION = 2


def _bench_corpus_path(n_companies: int) -> str:
    return os.path.join(REPO, ".bench", f"pages_{n_companies}_v{_CORPUS_VERSION}")


def ensure_corpus(spark, n_companies: int) -> str:
    """Generate (once, cached as parquet) the bench crawl corpus.

    Written as ~4 files per core: the CPU-bound Arrow extraction stage wants
    several task waves so the last-wave straggler tail stays short — one
    file split per core means one wave whose slowest task IS the wall."""
    from pcrawler_spark.sources.synthetic import SyntheticCrawlConfig, pages_spark_df

    path = _bench_corpus_path(n_companies)
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        cfg = SyntheticCrawlConfig(
            n_companies=n_companies,
            n_industries=88,
            n_hosts=max(50, n_companies // 500),
        )
        pages_spark_df(spark, cfg, num_files=128).write.mode("overwrite").parquet(path)
    return path


def hosts_df(spark, n_companies: int):
    from pcrawler_spark.sources.synthetic import SyntheticCrawlConfig, _hosts_rows
    import pandas as pd

    cfg = SyntheticCrawlConfig(
        n_companies=n_companies, n_industries=88, n_hosts=max(50, n_companies // 500)
    )
    return spark.createDataFrame(
        pd.DataFrame(_hosts_rows(cfg)),
        "host string, crawl_delay_s double, robots_disallow array<string>, max_parallel int",
    )


def run_throughput(n_executors: int, corpus_path: str, n_companies: int,
                   cores_per_executor: int = 4, runs: int = 3,
                   warm_frac_mod: int | None = 4) -> dict:
    """Fused schedule+extract pass on a local-cluster of real executor JVMs
    (separate heaps + python worker pools — the honest stand-in for N
    executors; local[N] threads share one JVM and understate scaling).

    ``warm_frac_mod``: warm the session (Python workers import the shipped
    zip, codegen JITs, parquet footers cache) on a hash-sampled ~1/mod of
    the corpus — a distributed subset pass that touches every executor
    (``limit()`` would collapse the warm-up to one task on one worker);
    None = full-corpus warm-up."""
    from pcrawler_spark.session import get_spark
    from pcrawler_spark.plans.singlepass import schedule_and_extract

    spark = get_spark(
        app_name=f"bench_scaling_{n_executors}x{cores_per_executor}",
        master=f"local-cluster[{n_executors},{cores_per_executor},6144]",
        shuffle_partitions=n_executors * cores_per_executor,
        extra_conf={
            # parquet splits have no locality in local-cluster; the default
            # 3 s locality wait idles task slots between waves
            "spark.locality.wait": "0",
            # CPU-bound splits: ~2 MB keeps the extract stage several waves
            # wide (straggler tail << wall); at the 10^10 design point real
            # row-group sizes make this irrelevant
            "spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(256 * 1024),
        },
    )
    try:
        from pyspark.sql import functions as F

        pages = spark.read.parquet(corpus_path)
        hosts = hosts_df(spark, n_companies)
        warm = pages if warm_frac_mod is None else pages.filter(
            F.pmod(F.xxhash64("url"), F.lit(warm_frac_mod)) == 0
        )
        schedule_and_extract(spark, warm, hosts).count()
        walls = []
        for _ in range(runs):
            # GC debt from the previous pass otherwise leaks into this one
            # (observed 2-3x wall variance without it)
            spark._jvm.System.gc()
            time.sleep(0.5)
            t0 = time.time()
            n = schedule_and_extract(spark, pages, hosts).count()
            walls.append(time.time() - t0)
        return {"executors": n_executors, "cores": n_executors * cores_per_executor,
                "urls": n, "walls_s": [round(w, 3) for w in walls]}
    finally:
        spark.stop()


def raw_python_control(corpus_path: str, procs_levels=(4, 16), limit: int = 120_000,
                       reps: int = 3) -> dict:
    """No-Spark control: the SAME extraction kernels over the SAME pages via
    multiprocessing.Pool at both core counts.  Whatever efficiency THIS loses
    going N→4N is the host's shared-memory-bandwidth ceiling, not engine
    overhead — a real 4N-executor cluster multiplies memory bandwidth with
    nodes.  Emitted into the bench JSON so the ceiling claim is measured
    inside the harness, not asserted."""
    import multiprocessing as mp

    import pyarrow.parquet as pq

    t = pq.read_table(corpus_path, columns=["url", "html"])
    urls = t.column("url").to_pylist()[:limit]
    htmls = t.column("html").to_pylist()[:limit]
    kinds = [
        "detail" if "-tong-quan" in u else ("listing" if "/cong-ty-nganh-" in u else "contact")
        for u in urls
    ]
    out = {}
    for procs in procs_levels:
        k = procs * 8
        step = (len(urls) + k - 1) // k
        chunks = [
            (urls[i:i + step], htmls[i:i + step], kinds[i:i + step])
            for i in range(0, len(urls), step)
        ]
        walls = []
        for _ in range(reps):
            with mp.Pool(procs) as pool:
                t0 = time.time()
                total = sum(pool.map(_raw_work, chunks))
                walls.append(time.time() - t0)
        best = min(walls)
        out[f"procs_{procs}"] = {
            "procs": procs, "urls": total, "wall_s": round(best, 3),
            "walls_s": [round(w, 3) for w in walls],
            "urls_per_sec": round(total / best, 1),
        }
    lo, hi = (out[f"procs_{p}"] for p in procs_levels)
    ratio = hi["urls_per_sec"] / lo["urls_per_sec"] if lo["urls_per_sec"] else 0.0
    out["efficiency"] = round(ratio / (procs_levels[1] / procs_levels[0]), 3)
    return out


def _raw_work(args):
    urls, htmls, kinds = args
    from pcrawler_spark.html import parse_html
    from pcrawler_spark.kernels import (
        extract_company_details, extract_company_links, extract_emails, extract_text)
    from pcrawler_spark.kernels.links import extract_pagination_links

    n = 0
    for url, html, kind in zip(urls, htmls, kinds):
        root = parse_html(html)
        if kind == "detail":
            extract_company_details(html, company_url=url, root=root)
        elif kind == "contact":
            extract_emails(html, "website")
        else:
            extract_company_links(html, root=root)
            extract_pagination_links(html, root=root)
        extract_text(html, root=root)
        n += 1
    return n


def main() -> None:
    sf = _sf_value(SF_DIR)
    # sized so steady-state work dominates fixed per-job cost (~4 s) while
    # staying inside stable-memory territory (bigger corpora regress: the
    # scheduled-keys broadcast build grows into the fixed cost)
    n_companies = max(1000, int(1_500_000 * sf))

    from pcrawler_spark.session import get_spark
    import __spark_entry__ as entry_mod

    results: dict[str, float] = {}
    spark = get_spark(app_name="bench_queries", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    queries = entry_mod.queries()
    # warm-up (JVM, parquet footer cache)
    queries["q01_pricing_summary"](spark, SF_DIR).count()
    for name in BENCH_QUERIES:
        t0 = time.time()
        queries[name](spark, SF_DIR).count()
        results[name] = round(time.time() - t0, 3)
    corpus_path = ensure_corpus(spark, n_companies)
    spark.stop()

    # scaling evidence: same job, N vs 4N executor JVMs (1×4 vs 4×4 cores —
    # the high level deliberately leaves machine headroom so shared memory
    # bandwidth doesn't masquerade as engine overhead; see BENCH.md).
    # lo/hi rounds are INTERLEAVED: this host's throughput drifts over
    # minutes (shared hardware), and measuring all-lo-then-all-hi bakes the
    # drift straight into the ratio (observed 0.62 vs 0.88 across two
    # back-to-back uninterleaved invocations); with alternating rounds the
    # min walls of both levels sample the same host windows
    rounds = []
    lo_walls, hi_walls = [], []
    raw_runs = []
    n_urls = 0
    for rnd in range(3):
        lo_r = run_throughput(1, corpus_path, n_companies, runs=3)
        hi_r = run_throughput(4, corpus_path, n_companies, runs=3)
        n_urls = hi_r["urls"]
        # a session's FIRST measured run still carries residual cold state
        # (subset warm-up covers ~25% of the corpus) — treat it as extended
        # warm-up and measure on the remaining runs
        lo_m, hi_m = lo_r["walls_s"][1:], hi_r["walls_s"][1:]
        lo_walls += lo_m
        hi_walls += hi_m
        raw_runs.append(raw_python_control(corpus_path, reps=1))
        rounds.append({
            "lo_walls_s": lo_r["walls_s"], "hi_walls_s": hi_r["walls_s"],
            "pair_efficiency": round(min(lo_m) / (4 * min(hi_m)), 3),
            "raw_efficiency": raw_runs[-1]["efficiency"],
        })
    lo = {"executors": 1, "cores": 4, "urls": n_urls,
          "wall_s": round(min(lo_walls), 3),
          "wall_spread_s": round(max(lo_walls) - min(lo_walls), 3),
          "walls_s": lo_walls,
          "urls_per_sec": round(n_urls / min(lo_walls), 1)}
    hi = {"executors": 4, "cores": 16, "urls": n_urls,
          "wall_s": round(min(hi_walls), 3),
          "wall_spread_s": round(max(hi_walls) - min(hi_walls), 3),
          "walls_s": hi_walls,
          "urls_per_sec": round(n_urls / min(hi_walls), 1)}
    ratio = hi["urls_per_sec"] / lo["urls_per_sec"] if lo["urls_per_sec"] else 0.0
    # headline = MEDIAN of the per-round pair efficiencies: each pair's lo
    # and hi walls are adjacent in time, so the ratio is drift-free, and the
    # median rejects a single disturbed round; the min-walls cross-ratio is
    # kept as a secondary signal (it can pair walls from different host
    # windows)
    pair_effs = sorted(r["pair_efficiency"] for r in rounds)
    efficiency = pair_effs[len(pair_effs) // 2]
    efficiency_min_walls = round(ratio / 4, 3)
    # no-Spark control (interleaved once per round): the host's own ceiling,
    # estimated the SAME way as the engine number — median of the per-round
    # efficiencies (mixing best walls across rounds would overstate the
    # ceiling exactly when the host drifts)
    best = {p: min(r[p]["wall_s"] for r in raw_runs) for p in ("procs_4", "procs_16")}
    raw = {
        p: {**next(r[p] for r in raw_runs if r[p]["wall_s"] == best[p]),
            "walls_s": [r[p]["wall_s"] for r in raw_runs]}
        for p in ("procs_4", "procs_16")
    }
    raw_round_effs = sorted(r["efficiency"] for r in raw_runs)
    raw["efficiency"] = raw_round_effs[len(raw_round_effs) // 2]
    raw["efficiency_estimator"] = "median of per-round raw efficiencies"
    scaling = {"low": lo, "high": hi, "speedup": round(ratio, 3),
               "executor_ratio": 4,
               "efficiency": efficiency,
               "efficiency_estimator": "median of per-round adjacent lo/hi pairs",
               "efficiency_min_walls": efficiency_min_walls,
               "interleaved_rounds": rounds,
               "raw_control": raw,
               "efficiency_vs_raw_ceiling": round(efficiency / raw["efficiency"], 3)
               if raw.get("efficiency") else None,
               # engine throughput as a fraction of the no-Spark kernels at
               # the same core count: ~1.0 at both levels means the measured
               # efficiency IS the host ceiling, not engine overhead
               "engine_vs_raw_throughput": {
                   "low_4_cores": round(lo["urls_per_sec"] / raw["procs_4"]["urls_per_sec"], 3),
                   "high_16_cores": round(hi["urls_per_sec"] / raw["procs_16"]["urls_per_sec"], 3),
               }}

    total = round(sum(results.values()) + hi["wall_s"], 3)
    payload = {
        "metric": "headline queries + fused crawl schedule+extract pass",
        "value": total,
        "unit": "sec",
        "queries": {**results, "crawl_singlepass": hi["wall_s"]},
        "sf": sf,
        "urls_per_sec": hi["urls_per_sec"],
        "scaling": scaling,
    }

    raw_lo = raw["procs_4"]
    raw_hi = raw["procs_16"]
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(
            "# BENCH — engine-side numbers (written by bench.py)\n\n"
            f"Input: `{SF_DIR}` (sf={sf}); crawl corpus {n_companies} companies "
            f"({hi['urls']} scheduled URLs after dedup+robots).\n\n"
            "## Scaling evidence (north_rule: ≥0.8 efficiency N→4N)\n\n"
            "Same fused schedule→politeness→extract job, identical input, N vs 4N\n"
            "REAL executor JVMs (local-cluster mode: separate heaps, shuffles over\n"
            "netty, per-executor Python worker pools).  The lo/hi sessions are\n"
            "INTERLEAVED over 3 rounds (this shared host's throughput drifts over\n"
            "minutes; un-interleaved invocations measured 0.62 and 0.88 back to\n"
            "back) — min walls of both levels sample the same host windows; all\n"
            "per-run walls are in BENCH_r{N}.json:\n\n"
            "| executors | cores | wall (s) | spread (s) | URLs/s |\n|---|---|---|---|---|\n"
            f"| {lo['executors']}×4 | {lo['cores']} | {lo['wall_s']} | {lo['wall_spread_s']} | {lo['urls_per_sec']} |\n"
            f"| {hi['executors']}×4 | {hi['cores']} | {hi['wall_s']} | {hi['wall_spread_s']} | {hi['urls_per_sec']} |\n\n"
            f"**Measured scaling efficiency {efficiency}** — the median of the\n"
            "per-round adjacent lo/hi pair ratios "
            f"({', '.join(str(r['pair_efficiency']) for r in rounds)}); the\n"
            f"min-walls cross-ratio is {efficiency_min_walls} "
            f"(speedup {scaling['speedup']}× over a 4× executor ratio).\n\n"
            "### Host ceiling — measured, not asserted\n\n"
            "Raw-Python no-Spark control (same kernels, same pages,\n"
            "multiprocessing.Pool) at the same two core counts, run by this\n"
            "same bench invocation:\n\n"
            "| procs | wall (s) | URLs/s |\n|---|---|---|\n"
            f"| 4 | {raw_lo['wall_s']} | {raw_lo['urls_per_sec']} |\n"
            f"| 16 | {raw_hi['wall_s']} | {raw_hi['urls_per_sec']} |\n\n"
            f"Raw 4→16 efficiency **{raw['efficiency']}** — the host's own\n"
            "shared-memory-bandwidth ceiling with zero engine overhead; a real\n"
            "4N-executor cluster multiplies memory bandwidth with nodes.\n"
            f"Engine efficiency / raw ceiling = **{scaling['efficiency_vs_raw_ceiling']}**.\n"
            "Engine throughput vs raw kernels at the SAME core count: "
            f"{scaling['engine_vs_raw_throughput']['low_4_cores']}× at 4 cores, "
            f"{scaling['engine_vs_raw_throughput']['high_16_cores']}× at 16.\n"
            "(The engine additionally schedules, dedups, applies politeness and\n"
            "moves Arrow batches; the raw loop only extracts.  The ratio being\n"
            "the SAME at both core counts is the point: the overhead is flat,\n"
            "so the scaling number measures the host, not the plan.)\n\n"
            "Remaining engine-side fixed cost per pass: the one-exchange scheduling\n"
            "chain + scheduled-key broadcast (~2-3 s) — amortizes with epoch size;\n"
            "at the 10^10-URL design point an epoch is minutes long (<1%).\n\n"
            "Reference comparison (BASELINE.md): pcrawler extracts ~3-5 rec/s/worker "
            f"(per-row Python); this engine sustains **{hi['urls_per_sec']} URLs/s** "
            "scheduled+extracted on one machine.\n\n"
            "## Headline query timings\n\n"
            "| query | sec |\n|---|---|\n"
            + "".join(f"| {k} | {v} |\n" for k, v in payload["queries"].items())
        )

    print(json.dumps(payload))


if __name__ == "__main__":
    main()
