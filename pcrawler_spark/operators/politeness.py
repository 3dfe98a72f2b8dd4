"""Politeness scheduler + host-skew salting (SURVEY.md §2.10, §4).

The reference's politeness is wall-clock sleeps inside each Celery worker
(random 1-4s between requests, detail_crawler.py:28, contact_crawler.py:420;
waves of 4 industries, main.py:96-110).  In a batch engine that becomes a
*per-epoch per-host URL budget*: if an epoch models ``epoch_seconds`` of
crawling, a host with ``crawl_delay_s`` and ``max_parallel`` fetch slots
admits at most ``floor(epoch_seconds / crawl_delay_s) * max_parallel`` URLs;
the rest stay in the frontier for later epochs.  Robots rules are path-prefix
disallows on the broadcast host table (FIXTURES.md §3) — disallowed URLs are
dropped permanently, never fetched.

Ordering parity with the reference: within a host, URLs are ranked by
(priority, retry_count, warc_order) — the deterministic analogue of the
reference's FIFO ``ORDER BY crawled_at`` batches (db_manager.py:176-178)
with retry-demotion (tasks.py:204-268).

Host skew: a Zipf frontier concentrates on mega-hosts.  The fetch/extract
stage is repartitioned on a *salted* host key so one host's URLs spread over
several partitions while small hosts stay co-located (single shuffle; salt
factor derived from observed per-host counts, adapting each epoch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_CRAWL_DELAY_S = 2.0
DEFAULT_MAX_PARALLEL = 1


def politeness_schedule(
    frontier: DataFrame,
    hosts: DataFrame,
    epoch_seconds: float = 60.0,
    order_cols=("priority", "retry_count", "url_hash"),
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Split a pending frontier into (scheduled, deferred, disallowed).

    ``hosts`` is small (one row per host) → broadcast join, no shuffle of the
    frontier for the policy lookup.  The per-host ranking is one shuffle on
    host; budget filtering happens map-side after the rank.
    """
    policy = F.broadcast(
        hosts.select(
            "host",
            F.coalesce("crawl_delay_s", F.lit(DEFAULT_CRAWL_DELAY_S)).alias("crawl_delay_s"),
            F.coalesce("max_parallel", F.lit(DEFAULT_MAX_PARALLEL)).alias("max_parallel"),
            "robots_disallow",
        )
    )
    df = frontier.join(policy, on="host", how="left")
    df = df.withColumn(
        "_path", F.regexp_extract(F.col("canon_url"), r"^https?://[^/]+(/.*)$", 1)
    ).withColumn(
        "_disallowed",
        F.when(F.col("robots_disallow").isNull(), F.lit(False)).otherwise(
            F.exists("robots_disallow", lambda p: F.col("_path").startswith(p))
        ),
    )
    disallowed = df.filter(F.col("_disallowed"))
    allowed = df.filter(~F.col("_disallowed"))

    budget = (
        F.greatest(
            F.lit(1),
            F.floor(
                F.lit(float(epoch_seconds))
                / F.coalesce(F.col("crawl_delay_s"), F.lit(DEFAULT_CRAWL_DELAY_S))
            )
            * F.coalesce(F.col("max_parallel"), F.lit(DEFAULT_MAX_PARALLEL)),
        )
    ).cast("long")
    allowed = allowed.withColumn("_budget", budget)

    # Fast path: a host whose pending count fits its budget needs no ranking
    # at all.  Only over-budget hosts pay the per-host sort — crucial on a
    # Zipf frontier where the mega-host's window would otherwise be one
    # serial multi-hundred-MB sort task regardless of cluster size.
    host_counts = allowed.groupBy("host").agg(F.count("*").alias("_n_pending"))
    # no broadcast hint: AQE broadcasts when the distinct-host count is small
    # and falls back to a shuffle join at 10^7-host scale
    allowed = allowed.join(host_counts, on="host", how="left")
    under = allowed.filter(F.col("_n_pending") <= F.col("_budget"))
    over = allowed.filter(F.col("_n_pending") > F.col("_budget"))
    w = Window.partitionBy("host").orderBy(*[F.col(c).asc() for c in order_cols])
    ranked = over.withColumn("_rank", F.row_number().over(w))
    drop = ["_path", "_disallowed", "_rank", "_budget", "_n_pending",
            "crawl_delay_s", "max_parallel", "robots_disallow"]
    scheduled = under.drop(*drop).unionByName(
        ranked.filter(F.col("_rank") <= F.col("_budget")).drop(*drop)
    )
    deferred = ranked.filter(F.col("_rank") > F.col("_budget")).drop(*drop)
    return scheduled, deferred, disallowed.drop(*drop)


def salted_repartition(
    df: DataFrame,
    host_col: str = "host",
    target_rows_per_partition: int = 20_000,
    num_partitions: int | None = None,
) -> DataFrame:
    """Repartition on (host, salt) where hot hosts get a per-host salt
    fan-out proportional to their row count — defusing Zipf skew with a
    single extra aggregate (cheap: count per host) + broadcast join."""
    spark = df.sparkSession
    counts = df.groupBy(host_col).count()
    factors = counts.select(
        host_col,
        F.greatest(
            F.lit(1), F.ceil(F.col("count") / F.lit(target_rows_per_partition))
        ).cast("int").alias("_salt_factor"),
    )
    n = num_partitions or spark.sparkContext.defaultParallelism
    out = (
        df.join(F.broadcast(factors), on=host_col, how="left")
        .withColumn(
            "_salt",
            F.pmod(F.xxhash64(F.col("url_hash"), F.lit(17)), F.coalesce("_salt_factor", F.lit(1))),
        )
        .repartition(n, F.col(host_col), F.col("_salt"))
        .drop("_salt_factor", "_salt")
    )
    return out
