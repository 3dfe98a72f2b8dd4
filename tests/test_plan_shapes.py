"""Physical-plan shape assertions: the optimizations we rely on at scale
must actually appear in the plans (pushed filters, column pruning,
broadcast joins, whole-stage codegen, no Python UDFs in relational paths).
"""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"


import contextlib
import io


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_and_pruning(spark):
    df = entry_mod.q02_filter_project(spark, SF_DIR)
    plan = plan_of(df)
    assert "PushedFilters:" in plan and "l_shipdate" in plan.split("PushedFilters:")[1][:300]
    # only the needed columns are read
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    for col in ("l_orderkey", "l_partkey", "l_extendedprice", "l_discount"):
        assert col in read_schema
    assert "l_comment" not in read_schema and "l_returnflag" not in read_schema


def test_broadcast_dims(spark):
    plan = plan_of(entry_mod.q04_broadcast_dims_count(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # all dims must broadcast


def test_whole_stage_codegen_in_agg(spark):
    df = entry_mod.q01_pricing_summary(spark, SF_DIR)
    df.collect()  # finalize the AQE plan so codegen ids are visible
    plan = plan_of(df)
    assert "codegen id" in plan and "HashAggregate" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_scheduling_chain_is_jvm_only(spark):
    """The frontier scheduling path must contain no Python stage and must
    never carry the html column through an exchange."""
    from pcrawler_spark.functions.udfs import with_url_hash
    from pcrawler_spark.operators.dedup import dedup_keep_first_agg
    from pcrawler_spark.operators.politeness import politeness_schedule
    from pcrawler_spark.plans.singlepass import classify_urls
    from pcrawler_spark.sources.synthetic import SyntheticCrawlConfig, generate_crawl_corpus

    corpus = generate_crawl_corpus(SyntheticCrawlConfig(n_companies=30, n_industries=3, n_hosts=5))
    pages = spark.createDataFrame(
        corpus["pages"], "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    hosts = spark.createDataFrame(
        corpus["hosts"],
        "host string, crawl_delay_s double, robots_disallow array<string>, max_parallel int",
    )
    idx = with_url_hash(pages, "url")
    meta = idx.select("url_hash", "canon_url", "host", "warc_ts")
    winners = dedup_keep_first_agg(meta, "url_hash", ["warc_ts", "canon_url"], ["host"])
    frontier = classify_urls(winners).withColumn("priority", F.lit(1)).withColumn("retry_count", F.lit(0))
    sched, _, _ = politeness_schedule(frontier, hosts)
    plan = plan_of(sched)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # html never enters the scheduling exchanges
    for frag in plan.split("Exchange")[1:]:
        assert "html" not in frag.split("\n")[0]


def test_dedup_agg_is_partial(spark):
    """keep-first aggregation must plan as partial+final HashAggregate
    (map-side combine), not a window sort."""
    from pcrawler_spark.operators.dedup import dedup_keep_first_agg

    df = spark.createDataFrame(
        [(1, "a", 1.0), (1, "b", 2.0), (2, "c", 3.0)], "k long, v string, o double"
    )
    out = dedup_keep_first_agg(df, "k", ["o"], ["v"])
    plan = plan_of(out)
    # min(struct) is sort-based, but still partial+final around one exchange
    assert "partial_min" in plan  # map-side combine before the shuffle
    assert "Window" not in plan
