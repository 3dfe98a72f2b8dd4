"""Quality-gate operators (F6/F7/X5), circuit breaker, CSV sink."""

import pytest
from pyspark.sql import functions as F

from pcrawler_spark.operators.qualitygate import (
    na_density_filter,
    sanitize_name_col,
    sequence_gaps,
)
from pcrawler_spark.plans import CrawlEngine, CrawlRunConfig
from pcrawler_spark.sources.synthetic import SyntheticCrawlConfig, generate_crawl_corpus

CFG = SyntheticCrawlConfig(n_companies=40, n_industries=4, n_hosts=6)


def test_na_density_filter(spark):
    df = spark.createDataFrame(
        [("a", "b", "c"), ("a", None, "N/A"), (None, "", "N/A"), ("x", "y", None)],
        "c1 string, c2 string, c3 string",
    )
    kept = na_density_filter(df, ["c1", "c2", "c3"], threshold=0.5).collect()
    # row2 (2/3 NA) and row3 (3/3 NA) dropped
    assert sorted(r.c1 or "?" for r in kept) == ["a", "x"]
    dropped = na_density_filter(df, ["c1", "c2", "c3"], 0.5, keep="sparse").count()
    assert dropped == 2


def test_sequence_gaps(spark):
    df = spark.createDataFrame(
        [("i1", 1), ("i1", 2), ("i1", 4), ("i2", 1), ("i2", 2), ("i3", 3)],
        "industry string, page int",
    )
    gaps = {(r.industry, r.missing) for r in sequence_gaps(df, "industry", "page").collect()}
    assert gaps == {("i1", 3), ("i3", 1), ("i3", 2)}


def test_sanitize_name(spark):
    df = spark.createDataFrame(
        [("Nhà hàng / Khách sạn!",), ("  - spa & wellness -  ",), ("plain",)],
        "name string",
    )
    got = [r.s for r in df.select(sanitize_name_col(F.col("name")).alias("s")).collect()]
    # oracle: the reference's exact python (re.sub chain + strip('_'),
    # tasks.py:104-107) applied to the same inputs
    assert got == ["Nhà_hàng___Khách_sạn", "spa___wellness", "plain"]


@pytest.fixture(scope="module")
def spark_corpus(spark):
    corpus = generate_crawl_corpus(CFG)
    pages = spark.createDataFrame(
        corpus["pages"], "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    hosts = spark.createDataFrame(
        corpus["hosts"],
        "host string, crawl_delay_s double, robots_disallow array<string>, max_parallel int",
    )
    seeds = spark.createDataFrame(corpus["seeds"], "url string, priority int, industry string")
    return pages, hosts, seeds


def test_breaker_trips_and_recovers(spark, spark_corpus, tmp_path):
    """With a high flaky rate and threshold 1, failing hosts are skipped for
    the cooldown epoch, then retried — and the crawl still completes."""
    pages, hosts, seeds = spark_corpus
    engine = CrawlEngine(
        spark, pages, hosts,
        CrawlRunConfig(
            state_dir=str(tmp_path / "st"), epoch_seconds=120.0,
            simulate_flaky_rate=0.5, breaker_threshold=1,
            breaker_cooldown_epochs=1, max_epochs=30,
        ),
    )
    metrics = engine.run(seeds)
    assert sum(m["failed_flaky"] for m in metrics) > 0
    assert sum(m.get("breaker_deferred", 0) for m in metrics) > 0, "breaker never tripped"
    assert engine._pending().count() == 0  # still drains to completion
    assert engine.catalog.read("breaker") is not None


def test_export_csv_sink(spark, spark_corpus, tmp_path):
    pages, hosts, seeds = spark_corpus
    engine = CrawlEngine(spark, pages, hosts,
                         CrawlRunConfig(state_dir=str(tmp_path / "st2"), epoch_seconds=120.0))
    engine.run(seeds)
    out = str(tmp_path / "export_csv")
    engine.export_csv(out)
    back = spark.read.option("header", True).csv(out)
    assert back.count() > 0
    assert "email" in back.columns and "industry_name" in back.columns
