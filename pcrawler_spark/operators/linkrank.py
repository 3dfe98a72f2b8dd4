"""Link-graph authority scoring for frontier prioritization — PageRank.

A production crawler ranks its frontier: authority (in-link) signal decides
which of 10^9 pending URLs to fetch first (the reference crawls a directory
breadth-first — app/crawler/list_crawler.py walks listing pages in order —
which is the degenerate uniform-priority case; this operator is the general
scorer a web-scale frontier needs).  Public algorithm: Page, Brin, Motwani,
Winograd 1999, "The PageRank Citation Ranking".

**Fixed-point integer formulation, N-independent resolution** — ranks are
stored as ppm of the UNIFORM share (i.e. 1e6 × N × p): the uniform
distribution is exactly 1_000_000 at every node regardless of graph size.
An absolute-ppm encoding (1e6 × p) was the first cut and it COLLAPSES at
web scale — at N ≥ 1e6 nodes, init 1e6//N = 1 and the teleport term
floors to 0, so every rank is 0 (caught by the 2M-edge scale test).  The
relative encoding cancels N out of the recurrence entirely:

* init:       rank0 = 1_000_000
* iterate:    rank_{t+1}(v) = (1_000_000 − d_ppm)
              + Σ_{u→v} (rank_t(u) × d_ppm) div (1e6 × outdeg(u))
* every operation is EXACT 64-bit integer arithmetic (``div`` = integral
  division — no doubles anywhere), replayable verbatim in ANSI SQL (the
  q46 oracle) and safe up to rank ≈ 1.08e13, i.e. a node holding 10^7×
  the uniform share.  A bonus: no global node count is needed, so the
  operator runs ZERO driver actions.

Dangling nodes (no out-edges) leak their mass — the standard simplified
treatment; total mass is therefore not conserved, which is fine for
*ranking* (the use case) and keeps the SQL replay one join shorter.

Plan shape at scale: each iteration is edges ⋈ ranks (shuffle keyed on the
src node) → groupBy dst (shuffle keyed on dst) → left join back to the node
set.  Both shuffles are node-keyed — no hotspot beyond the graph's own
in-degree skew, which AQE's skew-join handles; the iteration count is a
small constant (convergence for ranking in 3–10 rounds), so the lineage
stays bounded without checkpointing.  10^8-host graphs run exactly this
shape in Pregel/GraphX; expressing it as DataFrame joins keeps Catalyst in
charge of the physical strategy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_ppm(edges: DataFrame, damping_ppm: int = 850_000, iters: int = 3,
                 src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """Rank every node of a directed edge list; returns (node, rank_ppm).

    ``edges`` should be duplicate-free (each u→v once) — dedupe upstream if
    the extractor emits one row per anchor.  Self-loops are dropped here
    (they only recycle a node's own mass and break the outdeg accounting).
    Fully lazy: zero driver actions (the N-relative encoding needs no
    global count).  rank_ppm = 1_000_000 ≡ the uniform share.
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    # lazy local checkpoints (same discipline as operators/concomp.py):
    # the caller's first action materializes both, so the dedup/distinct
    # shuffles run ONCE and every iteration's joins reuse the stored blocks
    # instead of re-deriving the edge set from source each round (audited:
    # 33 exchanges → 12 for iters=3 at sf0.01).  Blocks live until session
    # end — bounded at two datasets per call, as documented in concomp.
    e = e.localCheckpoint(eager=False)
    nodes = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))
    ).distinct().localCheckpoint(eager=False)
    base = 1_000_000 - damping_ppm

    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    ranks = nodes.withColumn("rank_ppm", F.lit(1_000_000).cast("long"))
    for _ in range(iters):
        contrib = (
            e.join(ranks, e["src"] == ranks["node"])
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    f"(rank_ppm * CAST({damping_ppm} AS BIGINT))"
                    f" div (CAST(1000000 AS BIGINT) * od)"
                ).cast("long").alias("c_ppm"),
            )
        )
        summed = contrib.groupBy("node").agg(F.sum("c_ppm").alias("in_ppm"))
        ranks = nodes.join(summed, "node", "left").select(
            "node",
            (F.lit(base) + F.coalesce(F.col("in_ppm"), F.lit(0)))
            .cast("long").alias("rank_ppm"),
        )
    return ranks
