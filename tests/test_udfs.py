"""Parity between the JVM-expression canonicalizer and the Python kernel."""

import pytest
from pyspark.sql import functions as F

from pcrawler_spark.functions.udfs import canon_url_col
from pcrawler_spark.kernels import canonicalize_url
from pcrawler_spark.sources.synthetic import SyntheticCrawlConfig, generate_crawl_corpus

TRICKY = [
    None, "", "N/A", "n/a", "  ",
    "www.x.vn/a", "HTTPS://X.VN:443/a#frag", "http://x.vn:8080/",
    "https://x.vn", "http://x.vn:80/b?q=1#z", " https://x.vn/a?q=1 ",
    "ftp://x.vn/a", "https://", "host.vn", "host.vn/path?a=1&b=2",
    "HTTP://UPPER.HOST.VN/MixedPath", "https://h.vn/päth/ü?q=v",
    "https://h.vn:65000/x", "https://h.vn?onlyquery=1",
    # userinfo URLs: rejected (null) on BOTH paths — never divergent keys
    "https://user@h.vn/x", "http://a:b@h.vn/", "user@h.vn/contact",
    "https://h.vn/path@with@at", "https://@h.vn/",
]


def test_jvm_canonicalizer_matches_kernel(spark):
    corpus = generate_crawl_corpus(SyntheticCrawlConfig(n_companies=80, n_industries=4, n_hosts=8))
    urls = list(corpus["pages"].url) + TRICKY
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r.c for r in df.select(canon_url_col("url").alias("c")).collect()]
    want = [canonicalize_url(u) for u in urls]
    bad = [(u, g, w) for u, g, w in zip(urls, got, want) if g != w]
    assert not bad, f"{len(bad)} mismatches, first 5: {bad[:5]}"
