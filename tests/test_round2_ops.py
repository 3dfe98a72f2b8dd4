"""Round-2 operator tests: SimHash exact-recall banding, Jaccard hot-shingle
cap, the F5 html-length gate, and the X11 error-URL heuristic."""

import itertools

from pyspark.sql import functions as F

from pcrawler_spark.operators.simdedup import (
    ngram_jaccard_pairs,
    simhash,
    simhash_blocks,
    simhash_near_pairs,
)
from pcrawler_spark.operators.qualitygate import error_url_filter


# deterministic corpus with engineered near-duplicates: pairs of docs that
# differ in exactly one token out of many shared ones tend to land within a
# few Hamming bits; unrelated docs are far apart
_BASE = "the quick brown fox jumps over the lazy dog near the river bank today"
_DOCS = (
    [(i, _BASE + f" variant{i % 7}") for i in range(28)]
    + [(100 + i, " ".join(f"tok{i}x{j}" for j in range(20))) for i in range(12)]
)


def _brute_force_pairs(spark, docs, max_hamming):
    sh = {r["doc"]: r["simhash"] for r in simhash(
        spark.createDataFrame(docs, "doc_id long, text string")
    ).collect()}
    out = set()
    for a, b in itertools.combinations(sorted(sh), 2):
        h = bin(sh[a] ^ sh[b]).count("1")
        if h <= max_hamming:
            out.add((a, b, h))
    return out


def test_simhash_blocks_cover_all_bits():
    for bits, mh in [(32, 4), (32, 6), (64, 3)]:
        blocks = simhash_blocks(bits, mh)
        assert len(blocks) == mh + 1
        covered = []
        for off, w in blocks:
            covered.extend(range(off, off + w))
        assert covered == list(range(bits))


def test_simhash_near_pairs_exact_recall_vs_bruteforce(spark):
    """Pigeonhole banding must find EVERY pair within the Hamming budget —
    the round-1 prefix bucket silently missed pairs whose differing bits
    fell in the top 16."""
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    for max_hamming in (2, 4):
        got = {
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in simhash_near_pairs(df, max_hamming=max_hamming).collect()
        }
        want = _brute_force_pairs(spark, _DOCS, max_hamming)
        assert got == want
        assert len(want) > 0, "corpus must actually contain near pairs"


def test_simhash_no_duplicate_pairs(spark):
    """A pair agreeing on several blocks appears exactly once."""
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    rows = simhash_near_pairs(df, max_hamming=4).collect()
    pairs = [(r["doc_a"], r["doc_b"]) for r in rows]
    assert len(pairs) == len(set(pairs))


def test_ngram_jaccard_hot_shingle_cap(spark):
    """A shingle above the document-frequency cap is dropped from the
    inverted index: pairs supported only by hot shingles disappear."""
    shared = "alpha beta gamma"  # one trigram shingle shared by ALL docs
    docs = [(i, shared + f" unique{i} tail{i} end{i}") for i in range(6)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    uncapped = ngram_jaccard_pairs(df, threshold=0.01)
    assert uncapped.count() == 15  # all C(6,2) pairs share 'alpha beta gamma'
    capped = ngram_jaccard_pairs(df, threshold=0.01, max_shingle_df=3)
    assert capped.count() == 0  # the only common shingle has df=6 > 3


def test_html_length_gate_excludes_tiny_pages(spark):
    """F5 (detail_crawler.py:39): pages with ≤100 bytes of html never reach
    extraction in the fused pass."""
    import pandas as pd

    from pcrawler_spark.plans.singlepass import schedule_and_extract
    from pcrawler_spark.sources.synthetic import SyntheticCrawlConfig, generate_crawl_corpus, _hosts_rows

    cfg = SyntheticCrawlConfig(n_companies=10, n_industries=2, n_hosts=4)
    corpus = generate_crawl_corpus(cfg)
    pages = spark.createDataFrame(
        corpus["pages"], "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    tiny = spark.createDataFrame(
        [("https://tiny.example.vn/a-tong-quan",
          corpus["pages"].warc_ts.iloc[0].to_pydatetime().replace(tzinfo=None),
          b"<html></html>", "", "vi")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    hosts = spark.createDataFrame(
        pd.DataFrame(_hosts_rows(cfg)),
        "host string, crawl_delay_s double, robots_disallow array<string>, max_parallel int",
    )
    out = schedule_and_extract(spark, pages.unionByName(tiny), hosts)
    urls = [r["canon_url"] for r in out.select("canon_url").collect()]
    assert "https://tiny.example.vn/a-tong-quan" not in urls
    assert len(urls) > 0


def test_error_url_filter(spark):
    df = spark.createDataFrame(
        [(1, "https://x.vn/ok"), (2, "https://x.vn/404"), (3, "https://x.vn/page?e=TIMEOUT"),
         (4, "https://x.vn/not-found"), (5, "https://x.vn/felled"), (6, "https://x.vn/failed/x"),
         (7, "https://x.vn/error.html"), (8, "https://x.vn/4o4")],
        "id int, url string",
    )
    errors = {r["id"] for r in error_url_filter(df, "url", keep="errors").collect()}
    assert errors == {2, 3, 4, 6, 7}
    clean = {r["id"] for r in error_url_filter(df, "url", keep="clean").collect()}
    assert clean == {1, 5, 8}
